"""Weight-only quantization: INT8 and packed INT4 with per-output-channel scales.

Not present in the reference (its README.md:34 lists quantization as future
work); a north-star requirement here (BASELINE.md). Design:

- Weights live in [out, in] GEMM layout (torch-native; contraction on lanes —
  see worker/weights.py gemm()). Quantize at load time (host numpy), store
  ``q`` (int8, with two int4 values per byte for "int4") + per-output-channel
  fp32 ``s``.
- Dequantize inside the matmul: ``x @ dequant(w)^T == (x @ q^T) * s`` since
  the scale is constant along the contraction axis. XLA fuses the int8→bf16
  convert into the dot's operand load, so the weight's HBM traffic is the
  quantized bytes — the point of weight-only quant for decode, which is
  weight-bandwidth-bound.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def quantize_int8(w: np.ndarray) -> dict:
    """w: [..., out, in] float → {"q": int8[..., out, in], "s": f32[..., out]}."""
    w32 = np.asarray(w, np.float32)
    s = np.max(np.abs(w32), axis=-1) / 127.0           # [..., out]
    s = np.maximum(s, 1e-12)
    q = np.clip(np.rint(w32 / s[..., None]), -127, 127).astype(np.int8)
    return {"q": q, "s": s.astype(np.float32)}


def quantize_int4(w: np.ndarray) -> dict:
    """w: [..., out, in] float → {"q4": int8[..., out, in//2] (two nibbles/byte),
    "s": f32[..., out]}. in must be even. Values in [-7, 7].

    SPLIT-HALF packing: byte j holds column j (low nibble) and column
    in//2 + j (high nibble). Unpacking is then two shifts and ONE lane
    concat — no interleave, which XLA lowers as an expensive stack+reshape
    relayout of the whole weight."""
    w32 = np.asarray(w, np.float32)
    assert w32.shape[-1] % 2 == 0, "int4 packing needs an even contraction dim"
    s = np.max(np.abs(w32), axis=-1) / 7.0
    s = np.maximum(s, 1e-12)
    q = np.clip(np.rint(w32 / s[..., None]), -7, 7).astype(np.int8)
    half = q.shape[-1] // 2
    lo = q[..., :half] & 0xF
    hi = q[..., half:] & 0xF
    packed = (lo | (hi << 4)).astype(np.int8)
    return {"q4": packed, "s": s.astype(np.float32)}


def quantize_weight_jax(w: jax.Array, quant: str):
    """Device-side twin of quantize_weight (same packing/layout). Used by the
    on-device dummy-weight generator; kept numerically aligned with the host
    version so dummy quantized runs quantize the same underlying values the
    unquantized dummy run uses."""
    if quant == "none":
        return w
    w32 = w.astype(jnp.float32)
    if quant == "int8":
        s = jnp.maximum(jnp.max(jnp.abs(w32), axis=-1) / 127.0, 1e-12)
        q = jnp.clip(jnp.round(w32 / s[..., None]), -127, 127).astype(jnp.int8)
        return {"q": q, "s": s}
    if quant == "int4":
        s = jnp.maximum(jnp.max(jnp.abs(w32), axis=-1) / 7.0, 1e-12)
        q = jnp.clip(jnp.round(w32 / s[..., None]), -7, 7).astype(jnp.int8)
        half = q.shape[-1] // 2
        packed = (q[..., :half] & 0xF) | (q[..., half:] << 4)
        return {"q4": packed.astype(jnp.int8), "s": s}
    raise ValueError(f"unknown quant mode {quant!r}")


def quantize_weight(w: np.ndarray, quant: str):
    if quant == "none":
        return w
    if quant == "int8":
        return quantize_int8(w)
    if quant == "int4":
        return quantize_int4(w)
    raise ValueError(f"unknown quant mode {quant!r}")


def _unpack_int4(packed: jax.Array) -> jax.Array:
    """int8[..., out, in//2] split-half nibbles → int8[..., out, in],
    sign-extended (see quantize_int4 for the layout)."""
    lo = jnp.left_shift(packed, 4)          # low nibble → high bits
    lo = jnp.right_shift(lo, 4)             # arithmetic shift sign-extends
    hi = jnp.right_shift(packed, 4)
    return jnp.concatenate([lo, hi], axis=-1)


def is_quantized(w) -> bool:
    return isinstance(w, dict)


def out_features(w) -> int:
    if is_quantized(w):
        key = "q" if "q" in w else "q4"
        return w[key].shape[-2]
    return w.shape[-2]


def proj(x: jax.Array, w) -> jax.Array:
    """x[T, in] @ weight[out, in]^T → [T, out]; weight is a plain array or a
    quantize_* dict. Output dtype = x.dtype."""
    contract = (((1,), (1,)), ((), ()))
    if not is_quantized(w):
        return jax.lax.dot_general(x, w, contract)
    if "q" in w:
        y = jax.lax.dot_general(x, w["q"].astype(x.dtype), contract)
    else:
        # Split-half int4: TWO half-contraction matmuls, one per nibble.
        # The shifts are elementwise on the packed bytes, so XLA can fuse
        # them into the dot's operand load the same way it fuses the
        # int8→bf16 convert — no unpacked weight is ever materialized
        # (an unpack+concat before the dot measured 10x slower at 8B dims).
        q4 = w["q4"]
        half = x.shape[1] // 2
        lo = jnp.right_shift(jnp.left_shift(q4, 4), 4)   # sign-extended
        hi = jnp.right_shift(q4, 4)
        y = (jax.lax.dot_general(x[:, :half], lo.astype(x.dtype), contract)
             + jax.lax.dot_general(x[:, half:], hi.astype(x.dtype), contract))
    return (y.astype(jnp.float32) * w["s"]).astype(x.dtype)


def spec_for_quantized(p_spec, quant: str):
    """Map a [L, out, in] PartitionSpec to the spec tree of the quantized form."""
    from jax.sharding import PartitionSpec as P
    if quant == "none":
        return p_spec
    l_ax, out_ax, in_ax = (tuple(p_spec) + (None, None, None))[:3]
    q_key = "q" if quant == "int8" else "q4"
    return {q_key: p_spec, "s": P(l_ax, out_ax)}
