"""Fused INT4 dequant-matmul — Pallas TPU kernel for the decode hot path.

Why a kernel: the XLA int4 path (worker/quant.py:proj) contracts the packed
bytes TWICE — one dot per nibble half — so each weight byte is read from HBM
twice and the effective traffic equals INT8's. Decode is weight-bandwidth
bound, so INT4 measured *slower* than INT8 absolute (r2: 1,039 vs 1,249
tok/s at 8B dims). This kernel streams each packed byte ONCE into VMEM,
sign-extends both nibbles in-register, and feeds both half-contractions from
the same block — restoring the 2x weight-bytes advantage.

Contract: y[T, N] = x[T, K] @ dequant(q4[layer])^T * s[layer], with q4
[L, N, K//2] int8 split-half packed (byte j = column j low nibble, column
K//2+j high nibble — worker/quant.py:quantize_int4) and s [L, N] f32
per-output-channel scales.

The LAYER is a scalar-prefetched operand and the weights stay the full
stacked [L, N, K//2] HBM array: feeding a lax.scan xs slice to a custom call
would materialize the slice — an extra read+write of exactly the bytes the
kernel exists to stream once (measured as the scatter-adjacent-to-custom-call
pathology on the KV cache in r1). Block pipelining (grid over N tiles x K
chunks) double-buffers the weight DMAs behind the MXU.

The reference has no quantization (README.md:34 lists it as future work);
BASELINE.md makes INT4-beats-INT8 a north-star requirement here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tiles(N: int, KH: int, itemsize_x: int) -> tuple[int, int] | None:
    """(TILE_N, CHUNK_KH) honoring int8 memref tiling ((32, 128)) and a
    ~1 MiB double-buffered weight block budget; None if the shape doesn't
    tile (caller falls back to the XLA path)."""
    chunk = 0
    for c in (2048, 1024, 512, 256, 128):
        if KH % c == 0:
            chunk = c
            break
    if chunk == 0:
        return None
    tile = 0
    budget = 1 << 20
    for t in (512, 384, 256, 128, 96, 64, 32):
        # The scales block's minor dim is TILE_N: Mosaic needs it lane-tile
        # divisible unless the block spans the whole N dimension.
        if N % t == 0 and t * chunk <= budget and (t % 128 == 0 or t == N):
            tile = t
            break
    if tile == 0:
        return None
    return tile, chunk


def _kernel(layer_ref, x_lo_ref, x_hi_ref, q4_ref, s_ref, o_ref, acc_ref,
            *, out_dtype):
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q4_ref[0].astype(jnp.int32)                     # [TN, CKH]
    cd = x_lo_ref.dtype
    lo = jnp.right_shift(jnp.left_shift(q, 28), 28).astype(cd)
    hi = jnp.right_shift(jnp.left_shift(q, 24), 28).astype(cd)
    contract = (((1,), (1,)), ((), ()))
    acc_ref[...] += (
        jax.lax.dot_general(x_lo_ref[...], lo, contract,
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(x_hi_ref[...], hi, contract,
                              preferred_element_type=jnp.float32))

    @pl.when(k == nk - 1)
    def _():
        o_ref[...] = (acc_ref[...] * s_ref[0].astype(jnp.float32)
                      ).astype(out_dtype)


def int4_proj_stacked(x: jax.Array, q4: jax.Array, s: jax.Array,
                      layer: jax.Array, *,
                      interpret: bool | None = None) -> jax.Array | None:
    """x [T, K] @ dequant(q4[layer]) → [T, N]; returns None when the shapes
    don't satisfy the kernel's tiling (caller must fall back)."""
    from swiftllm_tpu.ops.paged_attention import _interpret_default
    if interpret is None:
        interpret = _interpret_default()
    T, K = x.shape
    L, N, KH = q4.shape
    if K != 2 * KH:
        return None
    tiles = _pick_tiles(N, KH, jnp.dtype(x.dtype).itemsize)
    if tiles is None:
        return None
    TILE_N, CHUNK_KH = tiles
    if KH % CHUNK_KH or N % TILE_N:
        return None
    # Sublane-pad the token rows to the dtype's tile (16 bf16 / 8 f32).
    sub = 16 if jnp.dtype(x.dtype).itemsize == 2 else 8
    Tp = ((T + sub - 1) // sub) * sub
    xp = jnp.pad(x, ((0, Tp - T), (0, 0))) if Tp != T else x

    nK = KH // CHUNK_KH
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // TILE_N, nK),
        in_specs=[
            pl.BlockSpec((Tp, CHUNK_KH), lambda n, k, lr: (0, k)),   # x lo half
            pl.BlockSpec((Tp, CHUNK_KH), lambda n, k, lr, nk=nK: (0, nk + k)),
            pl.BlockSpec((1, TILE_N, CHUNK_KH),
                         lambda n, k, lr: (lr[0], n, k)),            # packed w
            # Scales ride as [L, 1, N] so the BLOCK's last two dims are
            # (1, TILE_N) with the 1 spanning its whole (size-1) array dim —
            # a [L, N] block (1, TILE_N) puts the size-1 over L and violates
            # Mosaic's (8, 128) block-tiling rule.
            pl.BlockSpec((1, 1, TILE_N), lambda n, k, lr: (lr[0], 0, n)),
        ],
        out_specs=pl.BlockSpec((Tp, TILE_N), lambda n, k, lr: (0, n)),
        scratch_shapes=[pltpu.VMEM((Tp, TILE_N), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, out_dtype=x.dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tp, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.reshape(layer.astype(jnp.int32), (1,)), xp, xp, q4,
      s.reshape(L, 1, N))
    return out[:T]
