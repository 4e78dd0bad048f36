"""Weight-only quantization: INT8 and packed INT4 with per-output-channel scales.

Not present in the reference (its README.md:34 lists quantization as future
work); a north-star requirement here (BASELINE.md). Design:

- Quantize at load time (host numpy), store ``q`` (int8, with two int4 values
  per byte for "int4") + per-output-channel fp32 ``s``.
- Dequantize inside the matmul: ``x @ dequant(w) == (x @ q) * s`` since the
  scale is constant along the contraction axis. XLA fuses the int8→bf16
  convert into the dot's operand load, so the weight's HBM traffic is the
  quantized bytes — the point of weight-only quant for decode, which is
  weight-bandwidth-bound.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def quantize_int8(w: np.ndarray) -> dict:
    """w: [..., in, out] float → {"q": int8[..., in, out], "s": f32[..., out]}."""
    w32 = np.asarray(w, np.float32)
    s = np.max(np.abs(w32), axis=-2) / 127.0           # [..., out]
    s = np.maximum(s, 1e-12)
    q = np.clip(np.rint(w32 / s[..., None, :]), -127, 127).astype(np.int8)
    return {"q": q, "s": s.astype(np.float32)}


def quantize_int4(w: np.ndarray) -> dict:
    """w: [..., in, out] float → {"q4": int8[..., in//2, out] (two nibbles/byte),
    "s": f32[..., out]}. in must be even. Values in [-7, 7]; nibble pair
    (even_row, odd_row) packed little-end (even in the low nibble)."""
    w32 = np.asarray(w, np.float32)
    assert w32.shape[-2] % 2 == 0, "int4 packing needs an even contraction dim"
    s = np.max(np.abs(w32), axis=-2) / 7.0
    s = np.maximum(s, 1e-12)
    q = np.clip(np.rint(w32 / s[..., None, :]), -7, 7).astype(np.int8)
    lo = q[..., 0::2, :] & 0xF
    hi = q[..., 1::2, :] & 0xF
    packed = (lo | (hi << 4)).astype(np.int8)
    return {"q4": packed, "s": s.astype(np.float32)}


def quantize_weight(w: np.ndarray, quant: str):
    if quant == "none":
        return w
    if quant == "int8":
        return quantize_int8(w)
    if quant == "int4":
        return quantize_int4(w)
    raise ValueError(f"unknown quant mode {quant!r}")


def _unpack_int4(packed: jax.Array) -> jax.Array:
    """int8[in//2, out] packed nibbles → int8[in, out], sign-extended."""
    lo = jnp.left_shift(packed, 4)          # low nibble → high bits
    lo = jnp.right_shift(lo, 4)             # arithmetic shift sign-extends
    hi = jnp.right_shift(packed, 4)
    # interleave: rows 0,2,4,.. from lo; 1,3,5,.. from hi
    stacked = jnp.stack([lo, hi], axis=-2)  # [in//2, 2, out]
    return stacked.reshape(lo.shape[:-2] + (2 * lo.shape[-2],) + lo.shape[-1:])


def is_quantized(w) -> bool:
    return isinstance(w, dict)


def out_features(w) -> int:
    if is_quantized(w):
        key = "q" if "q" in w else "q4"
        return w[key].shape[-1]
    return w.shape[-1]


def proj(x: jax.Array, w) -> jax.Array:
    """x[T, in] @ weight[in, out], where weight is a plain array or a
    quantize_* dict. Output dtype = x.dtype."""
    if not is_quantized(w):
        return x @ w
    if "q" in w:
        y = x @ w["q"].astype(x.dtype)
    else:
        y = x @ _unpack_int4(w["q4"]).astype(x.dtype)
    return (y.astype(jnp.float32) * w["s"]).astype(x.dtype)


def spec_for_quantized(p_spec, quant: str):
    """Map a [L, in, out] PartitionSpec to the spec tree of the quantized form."""
    from jax.sharding import PartitionSpec as P
    if quant == "none":
        return p_spec
    l_ax, in_ax, out_ax = (tuple(p_spec) + (None, None, None))[:3]
    q_key = "q" if quant == "int8" else "q4"
    return {q_key: p_spec, "s": P(l_ax, out_ax)}
