"""Multi-host bring-up: process groups, global meshes, and control-plane
broadcast for SPMD serving.

The reference is single-GPU with no distributed backend (SURVEY.md §2.5); here
multi-host runs are first-class:

- every host runs the SAME jitted SPMD step over a global ("dp","tp") mesh
  (collectives ride ICI within a slice, DCN across slices — XLA picks from
  the mesh device order);
- the scheduler runs on process 0 only, and each step's packed batch buffer
  (worker/batch_builder.pack_step_batch — already ONE flat i32 array) is
  broadcast to all hosts so every process enters the same program with the
  same shapes and metadata.

Single-process use is the degenerate case: ``initialize()`` is a no-op
without a coordinator, and ``broadcast_step`` is the identity.
"""

from __future__ import annotations

import os

import numpy as np

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up the JAX process group (jax.distributed.initialize wrapper).

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID); on single-host TPU VMs with no
    coordinator configured this is a no-op.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        return   # single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)


def is_primary() -> bool:
    """True on the process that runs the control plane (scheduler/API)."""
    return jax.process_index() == 0


def global_mesh(dp_size: int, tp_size: int):
    """A ("dp","tp") mesh over ALL processes' devices.

    Device order follows jax.devices() (globally consistent), so tp groups
    land on physically adjacent chips (ICI) and dp splits across hosts (DCN)
    when dp_size is a multiple of the process count.
    """
    from swiftllm_tpu.parallel.mesh import make_mesh
    return make_mesh(dp_size, tp_size, devices=jax.devices())


# --- SPMD control channel ---------------------------------------------------------
# Every host must enter the SAME jitted program with the SAME shapes each
# step (a pjit over a multi-host mesh requires every process to execute the
# call). The primary announces each device-touching op over this channel in
# program order; followers replay them in ``follower_loop``.

OP_STEP = 0          # one serving step (header carries the bucket key)
OP_STEP_LOGITS = 1   # a step with return_logits=True (debug/eval path)
OP_STOP = 2          # shut the followers down
OP_SWAP_OUT = 3      # KV host-offload out (header[1] = payload length)
OP_SWAP_IN = 4       # KV host-offload in  (header[1] = payload length)
OP_SWAP_FREE = 5     # free host swap pages of dead swapped-out seqs

_SWAP_OPS = (OP_SWAP_OUT, OP_SWAP_IN, OP_SWAP_FREE)

def _header_len() -> int:
    """[op] + every BucketKey field (derived, so a new bucket-variant field
    can never silently truncate the broadcast)."""
    import dataclasses

    from swiftllm_tpu.worker.batch_builder import BucketKey
    return 1 + len(dataclasses.fields(BucketKey))


_HEADER_LEN = _header_len()   # [op, tokens, rows, pages, q_len, sampling, spec]


def exchange_op(op: int = OP_STEP, bucket_key=None,
                flat_batch: np.ndarray | None = None, dp: int = 1):
    """One control-channel round: the primary passes (op, key, flat); followers
    pass nothing and receive the primary's values. Returns (op, key, flat)."""
    import dataclasses

    from jax.experimental import multihost_utils
    header = np.zeros(_HEADER_LEN, np.int32)
    if is_primary():
        header[0] = op
        if op in _SWAP_OPS:
            header[1] = 0 if flat_batch is None else flat_batch.shape[0]
        elif bucket_key is not None:
            header[1:] = dataclasses.astuple(bucket_key)
    header = multihost_utils.broadcast_one_to_all(header)
    op = int(header[0])
    if op == OP_STOP:
        return op, None, None
    if op in _SWAP_OPS:
        # Swap ops carry a flat i32 payload (header[1] = its length) instead
        # of a step batch: [per request: dp_group, seq_id, n_tokens, n_pages,
        # page ids...] — every host replays the op so its host swap pool and
        # its shard of the staged page data stay in lockstep with process 0.
        n = int(header[1])
        if flat_batch is None:
            flat_batch = np.zeros(n, np.int32)
        assert flat_batch.shape[0] == n
        flat_batch = multihost_utils.broadcast_one_to_all(flat_batch)
        return op, None, np.asarray(flat_batch)
    from swiftllm_tpu.worker.batch_builder import BucketKey, packed_len
    bkey = BucketKey(*[int(x) for x in header[1:]])
    # The batch buffer's length is derived from the key via the packer's own
    # formula on every host (a hand-copied formula went stale once already).
    n = packed_len(bkey, dp)
    if flat_batch is None:
        flat_batch = np.zeros(n, np.int32)   # non-primary: receive-only
    assert flat_batch.shape[0] == n, \
        f"primary packed batch is {flat_batch.shape[0]} i32s, key implies {n}"
    flat_batch = multihost_utils.broadcast_one_to_all(flat_batch)
    return op, bkey, np.asarray(flat_batch)


def broadcast_step(flat_batch: np.ndarray | None, bucket_key=None, dp: int = 1,
                   return_logits: bool = False):
    """Broadcast process 0's packed step batch (+ bucket key) to every host.

    Non-primary processes pass flat_batch=None and receive process 0's data.
    Single-process: returns the inputs unchanged."""
    if jax.process_count() == 1:
        return flat_batch, bucket_key
    op = OP_STEP_LOGITS if return_logits else OP_STEP
    _, bkey, flat = exchange_op(op, bucket_key, flat_batch, dp)
    return flat, bkey


def broadcast_swap(op: int, payload: np.ndarray) -> None:
    """Primary: announce a swap op (+ its flat i32 payload) to every host.

    Single-process: no-op — the caller applies the payload locally either way.
    The payload encoding is worker/model.py's ``_encode_swap_payload``."""
    if jax.process_count() > 1 and is_primary():
        exchange_op(op, flat_batch=np.ascontiguousarray(payload, np.int32))


def stop_followers():
    """Primary: release every follower from its loop (idempotent enough for
    shutdown paths — followers exit after the first STOP they see)."""
    if jax.process_count() > 1 and is_primary():
        exchange_op(OP_STOP)


def follower_loop(model) -> None:
    """Non-primary serving loop: replay the primary's broadcast steps on this
    host's shard of the global mesh until OP_STOP.

    The reference has no multi-host anything (SURVEY §2.5); this is the
    "per-host engine with broadcasted batch metadata" the blueprint calls for
    (SURVEY §7 step 7): scheduler/API run on process 0 only, every host runs
    the same SPMD step."""
    while True:
        op, key, flat = exchange_op(dp=model.dp)   # receive-only
        if op == OP_STOP:
            return
        if op == OP_SWAP_OUT:
            model.apply_swap_out(flat)
        elif op == OP_SWAP_IN:
            model.apply_swap_in(flat)
        elif op == OP_SWAP_FREE:
            model.apply_swap_free(flat)
        else:
            model.execute_packed(flat, key, return_logits=(op == OP_STEP_LOGITS))


def agree_num_blocks(num_blocks: int) -> int:
    """All hosts must size the KV cache identically; take process 0's count
    (memory profiling can differ slightly across hosts)."""
    if jax.process_count() == 1:
        return num_blocks
    from jax.experimental import multihost_utils
    out = multihost_utils.broadcast_one_to_all(
        np.asarray([num_blocks], np.int32))
    return int(out[0])
