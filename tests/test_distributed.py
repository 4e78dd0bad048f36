"""Single-process exercises of the multi-host helpers (the degenerate cases
the primitives must handle; true multi-host needs a pod)."""

import numpy as np

import tests.conftest  # noqa: F401

from swiftllm_tpu.parallel import distributed
from swiftllm_tpu.worker.batch_builder import BucketKey


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
