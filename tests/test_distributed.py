"""Single-process exercises of the multi-host helpers (the degenerate cases
the primitives must handle; true multi-host needs a pod)."""

import numpy as np

import tests.conftest  # noqa: F401

from swiftllm_tpu.parallel import distributed
from swiftllm_tpu.worker.batch_builder import BucketKey, packed_len


def test_initialize_noop_single_process():
    distributed.initialize()   # no coordinator configured → no-op
    assert distributed.is_primary()


def test_global_mesh_shapes():
    mesh = distributed.global_mesh(2, 4)
    assert mesh.shape == {"dp": 2, "tp": 4}
    mesh = distributed.global_mesh(1, 1)
    assert mesh.shape == {"dp": 1, "tp": 1}


def test_broadcast_step_identity_single_process():
    flat = np.arange(10, dtype=np.int32)
    key = BucketKey(tokens=16, rows=4, pages=8, q_len=1)
    out, okey = distributed.broadcast_step(flat, key)
    np.testing.assert_array_equal(out, flat)
    assert okey == key


def test_packed_len_matches_packer():
    """broadcast_step derives buffer length from packed_len; it MUST equal what
    pack_step_batch actually emits for every bucket/dp combination (a stale
    hand-copied formula here would broadcast a wrongly-sized buffer — r1 bug)."""
    from swiftllm_tpu.config import EngineConfig
    from swiftllm_tpu.server.scheduler import ScheduledSeq
    from swiftllm_tpu.server.structs import RawRequest, Request
    from swiftllm_tpu.worker.batch_builder import build_step_batch, pack_step_batch
    from swiftllm_tpu.worker.block_manager import BlockManager

    for dp in (1, 2):
        cfg = EngineConfig(model_path="", use_dummy=True, block_size=16,
                           max_tokens_in_batch=256, max_blocks_per_seq=16,
                           num_hbm_blocks=64, num_cpu_blocks=0,
                           max_batch_size=8, prefill_chunk_size=32,
                           max_seqs_in_block_table=32)
        mgrs = [BlockManager(f"hbm{g}", 64, 16, 32, 16) for g in range(dp)]
        groups = []
        for g in range(dp):
            reqs = []
            for i in range(2):
                r = Request(RawRequest("", 4))
                r.set_prompt_token_ids(list(range(5 + 3 * i)))
                r.seq_id = g * 2 + i
                reqs.append(r)
            groups.append([ScheduledSeq(r, r.prompt_len) for r in reqs])
        batch, key, _ = build_step_batch(groups, mgrs, cfg)
        flat = pack_step_batch(batch, dp)
        assert flat.shape[0] == packed_len(key, dp), (key, dp)
