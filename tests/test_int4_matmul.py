"""Fused INT4 dequant-matmul kernel: parity vs the XLA path (worker/quant.py
proj), which is itself gated against full precision in test_quant.py.

Interpret mode on CPU in CI; `python bench.py --selftest` reruns this matrix
Mosaic-compiled on the real chip.
"""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax
import jax.numpy as jnp

from swiftllm_tpu.ops.int4_matmul import _pick_tiles, int4_proj_stacked
from swiftllm_tpu.worker.quant import proj, quantize_int4

ON_TPU = jax.devices()[0].platform != "cpu"
INTERPRET = not ON_TPU


def _case(T, N, K, L=3, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((T, K), np.float32)
    w = rng.standard_normal((L, N, K), np.float32)
    qw = quantize_int4(w)
    return (jnp.asarray(x, dtype), jnp.asarray(qw["q4"]),
            jnp.asarray(qw["s"]), qw)


@pytest.mark.parametrize("T,N,K", [
    (16, 256, 512),      # aligned, multi-chunk
    (8, 128, 256),       # minimum tiles
    (5, 256, 256),       # T below the sublane tile (pad path)
    (64, 384, 768),      # non-pow2 N (TILE_N=128... 384%128==0)
])
def test_parity_vs_xla_proj(T, N, K):
    x, q4, s, qw = _case(T, N, K)
    for layer in (0, q4.shape[0] - 1):
        got = int4_proj_stacked(x, q4, s, jnp.int32(layer),
                                interpret=INTERPRET)
        assert got is not None
        ref = proj(x, {"q4": qw["q4"][layer], "s": qw["s"][layer]})
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-3, rtol=2e-3)


def test_bf16_activation():
    x, q4, s, qw = _case(16, 256, 512, dtype=jnp.bfloat16, seed=1)
    got = int4_proj_stacked(x, q4, s, jnp.int32(1), interpret=INTERPRET)
    ref = proj(x, {"q4": qw["q4"][1], "s": qw["s"][1]})
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=0.15, rtol=0.05)


def test_untileable_shapes_return_none():
    # K not 2*KH-consistent / N with no 32-multiple divisor → None (XLA path).
    x, q4, s, _ = _case(4, 96, 256)
    assert _pick_tiles(96, 128, 4) in (None, (32, 128), (96, 128))
    x2 = jnp.ones((4, 200), jnp.float32)    # K != 2*KH
    assert int4_proj_stacked(x2, q4, s, jnp.int32(0),
                             interpret=INTERPRET) is None
