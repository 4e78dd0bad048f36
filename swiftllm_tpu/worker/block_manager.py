"""Host-side paged-KV block manager.

The reference keeps allocator state in GPU tensors and mutates it with Triton
kernels to avoid host↔device syncs (swiftllm/worker/block_manager.py:13-41,
swiftllm/worker/kernels/block_mgmt.py). On TPU the idiomatic split is the
opposite: allocation is trivially cheap on the host in numpy, and only the
dense per-batch page table is shipped to the device each step alongside the
rest of the batch metadata. No device kernels are involved in bookkeeping.

One instance manages one memory tier ("hbm" for the device cache, "cpu" for
the host swap space), mirroring the reference's two BlockManagers
(model.py:160-175).
"""

from __future__ import annotations

import numpy as np

from swiftllm_tpu.utils import cdiv


class BlockManager:
    def __init__(self, tier: str, num_blocks: int, block_size: int,
                 max_seqs: int, max_blocks_per_seq: int):
        self.tier = tier
        self.num_blocks = num_blocks
        self.block_size = block_size
        self.max_seqs = max_seqs
        self.max_blocks_per_seq = max_blocks_per_seq

        # Free pages kept as a LIFO stack for O(1) alloc/free.
        self._free_stack = list(range(num_blocks - 1, -1, -1))
        # Dense table: row = seq_id, cols = that sequence's page ids in order.
        self.block_table = np.zeros((max_seqs, max_blocks_per_seq), dtype=np.int32)
        self.num_seq_allocated_blocks = np.zeros(max_seqs, dtype=np.int32)

    # --- queries -------------------------------------------------------------
    @property
    def num_free_blocks(self) -> int:
        return len(self._free_stack)

    def get_num_allocated_blocks(self, seq_id: int) -> int:
        return int(self.num_seq_allocated_blocks[seq_id])

    def seq_block_ids(self, seq_id: int) -> np.ndarray:
        return self.block_table[seq_id, : self.num_seq_allocated_blocks[seq_id]]

    def blocks_needed_for_len(self, seq_len: int) -> int:
        return cdiv(seq_len, self.block_size)

    # --- mutation --------------------------------------------------------------
    def allocate_for_seq(self, seq_id: int, target_len: int):
        """Grow seq_id's page list so it can hold ``target_len`` tokens.

        Monotonic like the reference (block_manager.py:70-73): a sequence's page
        count never shrinks except via :meth:`free_seq`.
        """
        have = int(self.num_seq_allocated_blocks[seq_id])
        need = self.blocks_needed_for_len(target_len)
        grow = need - have
        if grow <= 0:
            return
        if grow > len(self._free_stack):
            raise RuntimeError(
                f"[{self.tier}] out of KV pages: need {grow}, free {len(self._free_stack)} "
                f"(seq {seq_id}, target_len {target_len})")
        if need > self.max_blocks_per_seq:
            raise RuntimeError(
                f"[{self.tier}] seq {seq_id} needs {need} pages > max_blocks_per_seq "
                f"{self.max_blocks_per_seq}")
        for i in range(have, need):
            self.block_table[seq_id, i] = self._free_stack.pop()
        self.num_seq_allocated_blocks[seq_id] = need

    def free_seq(self, seq_id: int) -> np.ndarray:
        """Release all of seq_id's pages; returns the freed page ids in order."""
        n = int(self.num_seq_allocated_blocks[seq_id])
        ids = self.block_table[seq_id, :n].copy()
        self._free_stack.extend(int(b) for b in ids)
        self.num_seq_allocated_blocks[seq_id] = 0
        return ids

    def gather_and_free(self, seq_id: int) -> np.ndarray:
        """Swap-out half: emit the page-id list and free it (reference
        block_manager.py:81-96)."""
        return self.free_seq(seq_id)

    def allocate_fresh_for_seq(self, seq_id: int, seq_len: int) -> np.ndarray:
        """Swap-in half: allocate pages for a sequence arriving from the other
        tier; returns the new page ids in order."""
        assert self.num_seq_allocated_blocks[seq_id] == 0
        self.allocate_for_seq(seq_id, seq_len)
        return self.seq_block_ids(seq_id).copy()
