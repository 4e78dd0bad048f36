"""Llama-family forward pass, TPU-native.

Design (vs reference swiftllm/worker/model.py + layers/*):

- ONE jitted SPMD program per step instead of ~10 kernel launches per layer
  from Python (reference model.py:238-246): embedding → ``lax.scan`` over
  stacked layer weights → final norm → sampling, all inside ``jax.shard_map``
  over a ("dp", "tp") mesh. On one chip the mesh is 1x1 and every collective
  is a no-op.

- The step consumes ONE flat token batch: prefill chunks and decode tokens
  mixed (SARATHI piggybacking — the reference's two-stream event dance,
  transformer_layer.py:78-114, disappears into a single dispatch).

- The paged KV cache is an HBM-resident array ``[L, S, 2, n_kv, head_dim]``
  (S = flat KV slots = (num_pages+1) * page_size, the +1 a garbage page that
  padding tokens write into; axis 2 is K/V). It is donated to the jit and
  updated with one scatter per layer, which XLA performs in place.

- All shapes are static: the host pads tokens/rows/pages to buckets
  (worker/batch_builder.py), so XLA compiles one program per bucket tuple.

Numerics match HF ``LlamaForCausalLM``: RMSNorm variance in fp32 with cast
back before the weight multiply, rotary in half-split (rotate_half) layout,
fp32 attention softmax, fp32 logits.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from swiftllm_tpu.config import LlamaModelConfig
from swiftllm_tpu.parallel.mesh import AXIS_DP, AXIS_TP


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StepBatch:
    """Device-side descriptor of one step's flat token batch. All arrays are
    padded to static bucket sizes (T tokens, B rows, P pages-per-seq).

    Replaces the reference's LlamaInferState (swiftllm/worker/infer_state.py:4-29).
    """

    token_ids: jax.Array    # i32[T]   flat new tokens (pad 0)
    positions: jax.Array    # i32[T]   position of each token in its sequence (pad 0)
    kv_slots: jax.Array     # i32[T]   flat cache slot each token's KV is written to
                            #          (pad → the garbage page)
    q_starts: jax.Array     # i32[B]   first flat-token index of each row (pad T)
    q_lens: jax.Array       # i32[B]   tokens fed for each row this step (pad 0)
    seq_lens: jax.Array     # i32[B]   total KV length of each row AFTER this step (pad 0)
    page_table: jax.Array   # i32[B,P] page ids per row (pad 0, masked via seq_lens)
    sample_mask: jax.Array  # bool[B]  row produces a sampled token this step
    # Sampling params (defaults = greedy; scalars only valid where the sampler
    # is not reached — the batch builder always provides full [B] arrays).
    temperature: jax.Array = 0.0  # f32[B]   <= 0 → greedy
    top_p: jax.Array = 1.0        # f32[B]   nucleus threshold (1.0 → off)
    top_k: jax.Array = 0          # i32[B]   top-k cutoff (0 → off)
    seeds: jax.Array = 0          # u32[B]   per-row PRNG seed for this step
    # On-device token feedback: lets step N+1 consume step N's sampled tokens
    # without a host round-trip (the host fetches token values asynchronously,
    # off the critical path — essential when the host↔chip link is slow).
    feedback_read: jax.Array = -1   # i32[T] feedback slot to read the token id
                                    #        from; -1 → use token_ids[t]
    feedback_write: jax.Array = 0   # i32[B] feedback slot to write row b's
                                    #        sampled token (pad rows → garbage)
    # Multi-LoRA: adapter SLOT of each token's request (0 = base model,
    # s >= 1 = stacked-adapter index s-1). Per-token (not per-row) so the
    # layer math needs no row→token expansion.
    lora_ids: jax.Array = 0         # i32[T]
    # True-SARATHI mixed steps: 1-token rows ("decode kind") are packed first
    # (flat token t == row index, the decode kernel's contract) and handled by
    # the fused-update decode kernel; multi-token rows go through the tile
    # kernel with an XLA scatter for their KV.
    decode_row: jax.Array = False   # bool[B] row is decode-kind (n_tokens == 1)
    kv_slots_scatter: jax.Array = 0  # i32[T] scatter destination per token:
                                     #        real slot for prefill-kind tokens,
                                     #        the garbage slot for decode-kind
                                     #        (their write is fused in-kernel)


def unpack_step_batch(flat: jax.Array, T: int, B: int, Pg: int, *,
                      page_size: int, garbage_slot: int) -> StepBatch:
    """Inverse of worker.batch_builder.pack_step_batch for ONE dp shard's
    slice (static offsets — free under jit).

    The per-token fields (positions, kv_slots, kv_slots_scatter,
    feedback_read, lora_ids) are DERIVED here from the row fields + page
    table instead of shipped over the host link: the wire carries only
    token_ids, 12 [B] row fields and the page table (~5x smaller — the
    tunneled h2d path moves ~30 MB/s, so [T]-sized fields cost real
    milliseconds per prefill step). Derivation is a handful of [T] integer
    ops + one searchsorted over the (ascending) q_starts."""
    off = 0

    def take(n):
        nonlocal off
        out = jax.lax.slice(flat, (off,), (off + n,))
        off += n
        return out

    token_ids = take(T)
    q_starts = take(B)
    q_lens = take(B)
    seq_lens = take(B)
    sample_mask = take(B) != 0
    temperature = jax.lax.bitcast_convert_type(take(B), jnp.float32)
    top_p = jax.lax.bitcast_convert_type(take(B), jnp.float32)
    top_k = take(B)
    seeds = jax.lax.bitcast_convert_type(take(B), jnp.uint32)
    feedback_write = take(B)
    decode_row = take(B) != 0
    frd_row = take(B)
    lora_row = take(B)
    page_table = take(B * Pg).reshape(B, Pg)

    # --- derive the per-token fields -------------------------------------
    # Row of token t: q_starts ascend (builder packs rows in cursor order,
    # pad rows at T), so the owning row is the last start <= t. Tokens in
    # tile-alignment gaps and pad tokens resolve to `valid == False`.
    t_iota = jnp.arange(T, dtype=jnp.int32)
    row = jnp.clip(jnp.searchsorted(q_starts, t_iota, side="right") - 1,
                   0, B - 1).astype(jnp.int32)
    start = q_starts[row]
    qlen = q_lens[row]
    o = t_iota - start
    valid = (o >= 0) & (o < qlen)
    pos = jnp.where(valid, seq_lens[row] - qlen + o, 0)
    pidx = jnp.clip(pos // page_size, 0, Pg - 1)
    slot = page_table[row, pidx] * page_size + pos % page_size
    kv_slots = jnp.where(valid, slot, garbage_slot)
    kv_slots_scatter = jnp.where(valid & ~decode_row[row], slot, garbage_slot)
    feedback_read = jnp.where(valid & (o == qlen - 1), frd_row[row], -1)
    lora_ids = jnp.where(valid, lora_row[row], 0)

    return StepBatch(token_ids=token_ids, positions=pos, kv_slots=kv_slots,
                     q_starts=q_starts, q_lens=q_lens, seq_lens=seq_lens,
                     page_table=page_table, sample_mask=sample_mask,
                     temperature=temperature, top_p=top_p, top_k=top_k,
                     seeds=seeds, feedback_read=feedback_read,
                     feedback_write=feedback_write, decode_row=decode_row,
                     kv_slots_scatter=kv_slots_scatter, lora_ids=lora_ids)


# ---------------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------------

def compute_inv_freq(cfg: LlamaModelConfig) -> np.ndarray:
    """Rotary inverse frequencies with Llama-3 / linear scaling applied.

    The reference builds full cos/sin tables on the GPU (model.py:177-225);
    on TPU cos/sin are cheap to compute in-program from positions, so only
    the [head_dim//2] inv_freq vector is kept. Scaling semantics follow HF:
    - "linear": inv_freq / factor
    - "llama3": per-frequency low/high-band smoothing (model.py:193-217)
    """
    hd = cfg.head_dim
    inv_freq = 1.0 / (cfg.rope_theta ** (np.arange(0, hd, 2, dtype=np.float64) / hd))
    scaling = cfg.rope_scaling
    if scaling is None:
        pass
    elif isinstance(scaling, (int, float)):
        inv_freq = inv_freq / float(scaling)
    elif isinstance(scaling, dict):
        rope_type = scaling.get("rope_type", scaling.get("type", "default"))
        if rope_type == "linear":
            inv_freq = inv_freq / float(scaling["factor"])
        elif rope_type == "llama3":
            factor = float(scaling["factor"])
            low = float(scaling["low_freq_factor"])
            high = float(scaling["high_freq_factor"])
            orig = float(scaling["original_max_position_embeddings"])
            wavelen = 2 * np.pi / inv_freq
            low_wl = orig / low
            high_wl = orig / high
            smooth = (orig / wavelen - low) / (high - low)
            scaled = np.where(
                wavelen > low_wl, inv_freq / factor,
                np.where(wavelen < high_wl, inv_freq,
                         (1 - smooth) / factor * inv_freq + smooth * inv_freq))
            inv_freq = scaled
        elif rope_type == "default":
            pass
        else:
            raise NotImplementedError(f"rope_scaling type {rope_type!r}")
    return inv_freq.astype(np.float32)


def rope_tables(positions: jax.Array, inv_freq: jax.Array, dtype):
    """cos/sin [T, 1, hd/2] for apply_rope. Layer-invariant: computed ONCE
    per step and closed over by the layer scan (the trig on [T, hd/2] is
    pure VPU transcendental work — recomputing it per layer for q AND k
    showed up as a per-layer fusion in the decode step profile)."""
    angles = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]   # [T, hd/2]
    return (jnp.cos(angles).astype(dtype)[:, None, :],
            jnp.sin(angles).astype(dtype)[:, None, :])


def apply_rope(x: jax.Array, positions, inv_freq, tables=None) -> jax.Array:
    """Half-split (rotate_half) rotary embedding, HF convention.

    x: [T, n_heads, head_dim]; positions: i32[T]; inv_freq: f32[head_dim//2];
    tables: optional precomputed (cos, sin) from rope_tables.
    """
    cos, sin = (tables if tables is not None
                else rope_tables(positions, inv_freq, x.dtype))
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


FP8_SCALE_LANES = 128   # one lane tile appended to the per-shard cache lanes
                        # when kv_quant == "fp8": lane 0 = K scale, lane 1 = V
                        # scale (per token; remaining lanes zero). One tile is
                        # the minimum DMA-able lane width, and riding the KV
                        # lanes means scales move in the SAME page DMAs — no
                        # extra copies, no extra scalar-core work.


def fp8_scales(x_max: jax.Array) -> jax.Array:
    """Per-token power-of-2 scale s with |x|*s ≲ 224 (e4m3 max is 448).

    Power-of-2 scales are EXACTLY representable in fp8, so storing them in
    the cache's scale lanes loses nothing; quantization granularity vs an
    optimal scale is ≤ 2x, which e4m3's mantissa dominates anyway. Replaces
    round 1's single global kv_scale knob (an accuracy hazard on real
    checkpoints with K/V outliers — VERDICT r1)."""
    e = jnp.floor(jnp.log2(224.0 / jnp.maximum(x_max, 1e-20)))
    # Low clip covers e4m3's exact subnormal powers of two (down to 2^-9), so
    # outlier tokens up to |x| ≈ 224*2^9 still get a representable scale; the
    # writer additionally clamps scaled values to ±448 (e4m3fn has no inf —
    # an overflowing cast would produce NaN and corrupt that token).
    return jnp.exp2(jnp.clip(e, -9.0, 8.0))


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """HF LlamaRMSNorm: fp32 variance, cast back BEFORE the weight multiply."""
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    normed = (x32 * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return normed * weight


# ---------------------------------------------------------------------------------
# Attention over the paged cache — pure-jnp reference path.
# The Pallas kernels (swiftllm_tpu/ops/) implement the same contract.
# ---------------------------------------------------------------------------------

def _ragged_paged_attention_jnp(
    q: jax.Array,           # [T, n_q_local, hd]
    cache_l: jax.Array,     # [S_local, 2, n_kv_local, hd] — this layer, this shard
    batch: StepBatch,
    *,
    page_size: int,
    sm_scale: float,
    q_bucket: int,
    window: int = 0,
) -> jax.Array:             # [T, n_q_local, hd]
    """Gather-based attention: every row attends over its own paged KV.

    Correctness reference for the Pallas kernel; materializes the gathered KV
    in HBM, so it is only used for tests/fallback (``use_pallas=False``).

    ``q_bucket`` is the static max new-tokens-per-row this step (1 for
    decode-only buckets, the prefill chunk size for mixed buckets).
    """
    T, n_q, hd = q.shape
    B, Pg = batch.page_table.shape
    n_kv = cache_l.shape[2]
    group = n_q // n_kv
    K = Pg * page_size

    # [B, K] flat slot ids of every row's KV positions.
    slot_ids = (batch.page_table[:, :, None] * page_size
                + jnp.arange(page_size, dtype=jnp.int32)[None, None, :]).reshape(B, K)
    kv = cache_l[slot_ids].astype(q.dtype)          # [B, K, 2, n_kv, hd]
    k, v = kv[:, :, 0], kv[:, :, 1]                 # [B, K, n_kv, hd]

    # Dense query view: [B, Q] flat-token indices (pad → extra zero row at T).
    # Row b's queries are flat tokens q_starts[b] .. q_starts[b]+q_lens[b]-1.
    Q = q_bucket
    q_iota = jnp.arange(Q, dtype=jnp.int32)
    q_tok = jnp.where(q_iota[None, :] < batch.q_lens[:, None],
                      batch.q_starts[:, None] + q_iota[None, :], T)        # [B, Q]
    q_pad = jnp.concatenate([q, jnp.zeros((1, n_q, hd), q.dtype)], axis=0)
    qd = q_pad[q_tok]                                # [B, Q, n_q, hd]
    q_pos_pad = jnp.concatenate([batch.positions, jnp.zeros((1,), jnp.int32)])
    q_pos = q_pos_pad[q_tok]                         # [B, Q]

    # scores [B, n_kv, g, Q, K] in fp32
    qd = qd.reshape(B, Q, n_kv, group, hd)
    scores = jnp.einsum("bqngd,bknd->bngqk", qd, k,
                        preferred_element_type=jnp.float32) * sm_scale
    key_pos = jnp.arange(K, dtype=jnp.int32)
    valid = ((key_pos[None, None, :] <= q_pos[:, :, None])
             & (key_pos[None, None, :] < batch.seq_lens[:, None, None]))   # [B, Q, K]
    if window:
        # Sliding window: only the last `window` positions are visible
        # (key_pos in (q_pos - window, q_pos]).
        valid &= key_pos[None, None, :] > q_pos[:, :, None] - window
    scores = jnp.where(valid[:, None, None, :, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bngqk,bknd->bqngd", probs, v.astype(jnp.float32))
    out = out.reshape(B, Q, n_q, hd).astype(q.dtype)

    # Scatter dense rows back to the flat token layout.
    o_flat = jnp.zeros((T + 1, n_q, hd), q.dtype).at[q_tok].set(out)
    return o_flat[:T]


# ---------------------------------------------------------------------------------
# The transformer
# ---------------------------------------------------------------------------------

def _attention_and_store(q, kv_new, cache3, layer, batch, *, n_kv,
                         page_size, sm_scale, use_pallas, q_bucket,
                         window=0, fused_tile=False,
                         kv_pend=None, npend=None):
    """Store this layer's fresh K‖V (kv_new [T, W], W = per-shard cache lane
    width, already cast to the cache dtype — including the per-token fp8
    scale lanes when kv_quant is on) into the 3-D cache [L, S, W] and run
    attention. Returns (attn [T, n_q, hd], cache3).

    Decode buckets on the Pallas path fuse the store INTO the kernel (cache
    aliased in/out) — an XLA scatter adjacent to a custom call forces
    whole-cache copies every layer. Other paths scatter first, then attend."""
    T, n_q, hd = q.shape
    if use_pallas:
        # Per-SHARD head shapes must satisfy the kernel's 128-lane tiling
        # contract; small models at high tp can violate it (n_q_local*hd or
        # the shard's cache lane width under 128). Shapes are static, so this
        # resolves at trace time: such shards take the jnp path instead of
        # failing Mosaic layout checks.
        from swiftllm_tpu.ops.paged_attention import kernel_supports
        use_pallas = kernel_supports(n_q, n_kv, hd,
                                     cache3.shape[2] - 2 * n_kv * hd)
    if kv_pend is not None:
        # Deferred-commit decode (multi-step windows): the kernel reads the
        # window's fresh tokens from kv_pend and does NOT touch the cache;
        # decode_multi_step commits the whole window once after the scan.
        # The gate in decode_multi_step guarantees the Pallas path applies
        # (the jnp fallback has no pending-token semantics).
        assert use_pallas and q_bucket == 1, \
            "deferred KV commit requires the Pallas decode path"
        from swiftllm_tpu.ops.paged_attention import ragged_paged_attention
        attn = ragged_paged_attention(
            q, cache3, layer, batch, n_kv=n_kv,
            page_size=page_size, sm_scale=sm_scale, q_bucket=1,
            kv_new=kv_new, kv_pend=kv_pend, npend=npend, window=window)
        return attn, cache3
    if use_pallas:
        from swiftllm_tpu.ops.paged_attention import ragged_paged_attention
        if q_bucket == 1:
            attn, cache3 = ragged_paged_attention(
                q, cache3, layer, batch, n_kv=n_kv,
                page_size=page_size, sm_scale=sm_scale, q_bucket=q_bucket,
                kv_new=kv_new, window=window)
        else:
            # True-SARATHI mixed step: the fused-update decode kernel writes
            # the decode-kind rows' KV (packed first, flat token == row), the
            # tile kernel writes the prefill-kind rows' spans in-kernel
            # (fused_tile; an XLA token scatter cost 0.197 ms/layer at T=2048
            # — 9% of a whole prefill step). Spec-verify buckets, whose span
            # starts are not page-aligned, keep the scatter (fused_tile off).
            q_lens_dec = jnp.where(batch.decode_row, batch.q_lens, 0)
            q_lens_pre = jnp.where(batch.decode_row, 0, batch.q_lens)
            dec_batch = dataclasses.replace(batch, q_lens=q_lens_dec)
            pre_batch = dataclasses.replace(batch, q_lens=q_lens_pre)
            if not fused_tile:
                cache3 = cache3.at[layer, batch.kv_slots_scatter].set(kv_new)
            dec_out, cache3 = ragged_paged_attention(
                q, cache3, layer, dec_batch, n_kv=n_kv, page_size=page_size,
                sm_scale=sm_scale, q_bucket=1, kv_new=kv_new, window=window)
            if fused_tile:
                pre_out, cache3 = ragged_paged_attention(
                    q, cache3, layer, pre_batch, n_kv=n_kv,
                    page_size=page_size, sm_scale=sm_scale, q_bucket=q_bucket,
                    kv_new=kv_new, window=window)
            else:
                pre_out = ragged_paged_attention(
                    q, cache3, layer, pre_batch, n_kv=n_kv,
                    page_size=page_size, sm_scale=sm_scale, q_bucket=q_bucket,
                    window=window)
            n_dec = jnp.sum(batch.decode_row.astype(jnp.int32))
            tok_iota = jnp.arange(T, dtype=jnp.int32)[:, None, None]
            attn = jnp.where(tok_iota < n_dec, dec_out, pre_out)
    else:
        cache3 = cache3.at[layer, batch.kv_slots].set(kv_new)
        s_local = cache3.shape[1]
        KH = n_kv * hd
        cl = cache3[layer]
        if cl.shape[1] > 2 * KH:    # fp8 scale lanes: un-scale to a plain view
            clf = cl.astype(jnp.float32)
            ks = jnp.maximum(clf[:, 2 * KH:2 * KH + 1], 1e-20)
            vs = jnp.maximum(clf[:, 2 * KH + 1:2 * KH + 2], 1e-20)
            cache_l = jnp.stack([clf[:, :KH] / ks, clf[:, KH:2 * KH] / vs],
                                axis=1).reshape(s_local, 2, n_kv, hd)
        else:
            cache_l = cl.reshape(s_local, 2, n_kv, hd)
        attn = _ragged_paged_attention_jnp(q, cache_l, batch,
                                           page_size=page_size,
                                           sm_scale=sm_scale,
                                           q_bucket=q_bucket,
                                           window=window)
    return attn, cache3


def forward_shard(
    params: dict[str, Any],
    kv_cache: jax.Array,     # [L, S_local, 2*n_kv_local, hd]
    feedback: jax.Array,     # i32[F_local] last sampled token per seq slot
    batch: StepBatch,        # per-dp-shard slices
    *,
    cfg: LlamaModelConfig,
    page_size: int,
    q_bucket: int,
    use_pallas: bool,
    return_logits: bool = False,
    use_sampler: bool = True,
    fp8_scaled: bool = False,
    return_logprobs: bool = False,
    sample_span: int = 0,
    kv_pend=None,            # [L, P, B, W] deferred-commit pending buffer
    npend=None,              # traced scalar: live pending tokens (inner s+1)
):
    """Per-shard SPMD body. Runs inside shard_map; collectives over "tp".

    Returns (sampled_tokens i32[B_local], new kv_cache, new feedback
    [, logprobs f32[B_local]][, logits f32[B_local, V]]).

    ``sample_span`` > 0 (speculative verify steps): the head reads EVERY one
    of the first ``sample_span`` positions of each row's span (pad positions
    → the zero row) instead of only the last, and the token/logprob outputs
    become [B_local * sample_span], row-major. The engine's accept loop
    compares drafts against these per-position values (server/engine.py).
    """
    T = batch.token_ids.shape[0]
    hd = cfg.head_dim
    sm_scale = 1.0 / float(np.sqrt(hd))
    eps = cfg.rms_norm_eps
    inv_freq = params["inv_freq"]

    tp_size = jax.lax.axis_size(AXIS_TP)
    tp_rank = jax.lax.axis_index(AXIS_TP)

    def psum_tp(x):
        return jax.lax.psum(x, AXIS_TP) if tp_size > 1 else x

    # --- resolve device-fed tokens (step N reads step N-1's samples) ---
    f_local = feedback.shape[0]
    fed = feedback[jnp.clip(batch.feedback_read, 0, f_local - 1)]
    token_ids = jnp.where(batch.feedback_read >= 0, fed, batch.token_ids)

    # --- embedding (vocab-sharded): mask + gather + psum ---
    embed = params["embed"]                      # [V_local, D]
    v_local = embed.shape[0]
    local_ids = token_ids - tp_rank * v_local
    in_range = (local_ids >= 0) & (local_ids < v_local)
    x = jnp.where(in_range[:, None],
                  embed[jnp.clip(local_ids, 0, v_local - 1)], 0)
    x = psum_tp(x)                               # [T, D]

    # --- layer scan over the 3-D cache [L, S, W] --------------------------------
    # The cache is STORED in this shape and carried through the scan with no
    # reshape at either boundary: a boundary reshape breaks XLA's carry
    # aliasing and costs two full-cache copies per step (measured on v5e).
    # W = 2*n_kv*hd, plus one trailing scale-lane tile under fp8 KV quant.
    L = kv_cache.shape[0]
    cache2 = kv_cache
    # RoPE trig once per step, closed over by every scanned layer.
    rope_cs = rope_tables(batch.positions, inv_freq, x.dtype)

    # Fused tile KV write (prefill/mixed buckets): the tile kernel writes its
    # own spans' fresh KV, replacing the XLA token scatter. Requires
    # page-aligned span starts — guaranteed by the scheduler's page-multiple
    # chunk sizing for ordinary prefill, but NOT for spec-verify spans (which
    # start mid-sequence), so those buckets keep the scatter.
    fused_tile = (use_pallas and q_bucket > 1 and sample_span == 0
                  and q_bucket % page_size == 0 and page_size <= 128)

    # Fused-INT4 path (decode-size buckets): stream each packed weight byte
    # ONCE through ops/int4_matmul instead of the XLA two-half-dot path that
    # reads it twice. Such weights move OUT of the scan xs into closure
    # captures — a scan slice fed to a custom call materializes a per-layer
    # copy of exactly the bytes the kernel exists to stream once — and the
    # kernel indexes the stacked [L, N, K/2] array by the scalar-prefetched
    # layer id. Static per-weight decision (shapes must tile).
    layers_all = params["layers"]
    int4_full: dict[str, Any] = {}
    if use_pallas and T <= 256:
        from swiftllm_tpu.ops.int4_matmul import _pick_tiles
        for name, wmat in layers_all.items():
            if isinstance(wmat, dict) and "q4" in wmat:
                _, N_w, KH_w = wmat["q4"].shape
                if _pick_tiles(N_w, KH_w, 2) is not None:
                    int4_full[name] = wmat
    layers_scanned = {k_: v_ for k_, v_ in layers_all.items()
                      if k_ not in int4_full}

    deferred = kv_pend is not None

    def layer_step(carry, scanned):
        x, cache = carry
        l, w = scanned
        from swiftllm_tpu.worker.quant import out_features, proj

        def wfor(name):
            return int4_full[name] if name in int4_full else w[name]

        def mproj(h_, name):
            if name in int4_full:
                from swiftllm_tpu.ops.int4_matmul import int4_proj_stacked
                y = int4_proj_stacked(h_, int4_full[name]["q4"],
                                      int4_full[name]["s"], l)
                assert y is not None, name   # _pick_tiles pre-validated
                return y
            return proj(h_, w[name])

        h = rms_norm(x, w["attn_norm"], eps)
        n_q_l = out_features(wfor("wq")) // hd
        n_kv_l = out_features(wfor("wk")) // hd
        def biased(y, bias_name):
            """Qwen2-style projection bias (sharded with the output axis)."""
            if bias_name in w:
                y = y + w[bias_name].astype(y.dtype)[None, :]
            return y

        def lora_add(y, x_in, name):
            """Multi-LoRA dense-gather: every adapter's low-rank update for
            every token (two einsums over the stacked n_lora axis), then a
            one-hot select by the token's adapter slot — static shapes, no
            per-adapter program. For in-sharded projections (wo, w_down) A's
            contraction axis is tp-sharded, so the per-shard partial folds
            into the projection's existing psum (see mesh.param_specs)."""
            lw = w.get("lora_" + name)
            if lw is None:
                return y
            A, Bm = lw["A"], lw["B"]            # [n, r, in], [n, out, r]
            nl = A.shape[0]
            z = jnp.einsum("td,nrd->tnr", x_in, A.astype(x_in.dtype),
                           preferred_element_type=jnp.float32)
            yl = jnp.einsum("tnr,nor->tno", z.astype(x_in.dtype),
                            Bm.astype(x_in.dtype),
                            preferred_element_type=jnp.float32)
            sel = (batch.lora_ids[:, None]
                   == (1 + jnp.arange(nl, dtype=jnp.int32))[None, :])
            sel = sel.astype(jnp.float32) * params["lora_scale"][None, :]
            return y + jnp.einsum("tno,tn->to", yl, sel).astype(y.dtype)

        q_flat = biased(lora_add(mproj(h, "wq"), h, "wq"), "bq")
        k_flat = biased(lora_add(mproj(h, "wk"), h, "wk"), "bk")
        v_flat = biased(lora_add(mproj(h, "wv"), h, "wv"), "bv")
        if T <= 256 and os.environ.get("SWIFTLLM_QKV_BARRIER", "1") == "1":
            # Decode-size buckets: without this barrier XLA folds the
            # head-reshape + RoPE into the projection GEMMs and satisfies the
            # layout by RELAYOUTING THE WEIGHT — a materialized
            # [1, D, D] dynamic-slice copy of wq per LAYER per STEP (8 MB at
            # 1B dims, ~0.24 ms/step, measured in the r5 decode profile as
            # constant_dynamic-slice_fusion). The barrier pins the GEMM
            # output to its natural [T, D] form (256 KB — the cheap side) so
            # rope runs as its own fusion and the weights stream untouched.
            # Prefill buckets (large T) already choose activation-side
            # layouts (the r4 flat-q finding); the barrier there would only
            # block useful fusion.
            q_flat, k_flat, v_flat = jax.lax.optimization_barrier(
                (q_flat, k_flat, v_flat))
        q = q_flat.reshape(T, n_q_l, hd)
        k = k_flat.reshape(T, n_kv_l, hd)
        v = v_flat.reshape(T, n_kv_l, hd)
        q = apply_rope(q, batch.positions, inv_freq, tables=rope_cs)
        k = apply_rope(k, batch.positions, inv_freq, tables=rope_cs)

        # Per-shard lane layout [K_all ‖ V_all (‖ scales)] (each shard writes
        # only its own lane slice, so the layout is shard-local), cast to the
        # cache dtype here (fp8 when kv_quant is on, with per-token power-of-2
        # scales in the trailing lane tile).
        kf = k.reshape(T, n_kv_l * hd)
        vf = v.reshape(T, n_kv_l * hd)
        if fp8_scaled:
            ks = fp8_scales(jnp.max(jnp.abs(kf.astype(jnp.float32)),
                                    axis=1, keepdims=True))         # [T, 1]
            vs = fp8_scales(jnp.max(jnp.abs(vf.astype(jnp.float32)),
                                    axis=1, keepdims=True))
            lane = jnp.arange(FP8_SCALE_LANES, dtype=jnp.int32)[None, :]
            scale_lanes = jnp.where(lane == 0, ks,
                                    jnp.where(lane == 1, vs, 0.0))  # [T, 128]
            kv_new = jnp.concatenate(
                [jnp.clip(kf.astype(jnp.float32) * ks, -448.0, 448.0),
                 jnp.clip(vf.astype(jnp.float32) * vs, -448.0, 448.0),
                 scale_lanes], axis=1)
        else:
            kv_new = jnp.concatenate([kf, vf], axis=1)
        kv_new = kv_new.astype(cache.dtype)
        # Deferred commit: the kernel reads the window's COMPLETED pending
        # tokens straight from kv_pend (closed over, read-only, layer-indexed
        # by BlockSpec inside the kernel) and this step's fresh token from
        # kv_new as usual — but writes nothing; the layer's fresh rows leave
        # as scan outputs and decode_multi_step merges them into the pending
        # buffer ONCE per inner step (a per-layer carry update here measured
        # ~1.6 ms/step of copy traffic at 1B b64 on v5e — worse than the RMW
        # cost it replaced).
        attn, cache = _attention_and_store(
            q, kv_new, cache, l, batch, n_kv=n_kv_l,
            page_size=page_size, sm_scale=sm_scale, use_pallas=use_pallas,
            q_bucket=q_bucket, window=cfg.sliding_window or 0,
            fused_tile=fused_tile, kv_pend=kv_pend, npend=npend)
        attn = attn.reshape(T, n_q_l * hd)
        x = x + psum_tp(lora_add(mproj(attn, "wo"), attn, "wo"))

        h = rms_norm(x, w["ffn_norm"], eps)
        gate = jax.nn.silu(lora_add(mproj(h, "w_gate"), h, "w_gate")
                           .astype(jnp.float32)).astype(x.dtype)
        gu = gate * lora_add(mproj(h, "w_up"), h, "w_up")
        ffn = lora_add(mproj(gu, "w_down"), gu, "w_down")
        x = x + psum_tp(ffn)
        if deferred:
            return (x, cache), kv_new[:batch.q_lens.shape[0]]
        return (x, cache), None

    (x, kv_cache), kv_rows = jax.lax.scan(
        layer_step, (x, cache2),
        (jnp.arange(L, dtype=jnp.int32), layers_scanned))

    x = rms_norm(x, params["final_norm"], eps)

    # --- sampling head (greedy argmax over the vocab-sharded lm_head) ---
    B = batch.q_starts.shape[0]
    last_tok = jnp.where(batch.q_lens > 0,
                         batch.q_starts + batch.q_lens - 1, T)              # [B]
    x_pad = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)
    if sample_span:
        # Spec-verify head: all span positions, [B*S1] row-major.
        S1 = sample_span
        sp_iota = jnp.arange(S1, dtype=jnp.int32)
        sel_tok = jnp.where(sp_iota[None, :] < batch.q_lens[:, None],
                            batch.q_starts[:, None] + sp_iota[None, :],
                            T).reshape(-1)                                  # [B*S1]
        h_last = x_pad[sel_tok]                                             # [B*S1, D]
    else:
        h_last = x_pad[last_tok]                                            # [B, D]
    lm_head = params["lm_head"]
    if isinstance(lm_head, dict):   # quantized [V_local, D] ([out, in]) layout
        from swiftllm_tpu.worker.quant import proj as _qproj
        logits = _qproj(h_last, lm_head).astype(jnp.float32)                # [B, V_local]
    else:
        logits = (h_last @ lm_head.T.astype(h_last.dtype)
                  ).astype(jnp.float32)                                     # [B, V_local]
    # Mask vocab-padding rows (vocab padded to a multiple of tp in the loader).
    vocab_ids = tp_rank * v_local + jnp.arange(v_local, dtype=jnp.int32)
    logits = jnp.where(vocab_ids[None, :] < cfg.vocab_size, logits, -jnp.inf)

    from swiftllm_tpu.models.sampling import exact_greedy, sample_tokens
    if sample_span:
        # Per-position sampling params: repeat each row's knobs over its span
        # (spec rows are greedy by the scheduler's gate; temp>0 rows in the
        # same step are single-position, so only their position 0 is read).
        rep = lambda v: jnp.repeat(v, sample_span)  # noqa: E731
        s_temp, s_tp, s_tk = (rep(batch.temperature), rep(batch.top_p),
                              rep(batch.top_k))
        s_seeds = rep(batch.seeds) + jnp.tile(
            jnp.arange(sample_span, dtype=jnp.uint32), B)
    else:
        s_temp, s_tp, s_tk, s_seeds = (batch.temperature, batch.top_p,
                                       batch.top_k, batch.seeds)
    if use_sampler:
        tokens = sample_tokens(
            logits, temperature=s_temp, top_p=s_tp,
            top_k=s_tk, seeds=s_seeds, v_local=v_local,
            tp_axis=AXIS_TP, tp_size=tp_size, tp_rank=tp_rank)
    else:
        # All-greedy batch: the bucket key selects this variant so greedy
        # serving never pays the sampling machinery.
        tokens = exact_greedy(logits, v_local, AXIS_TP, tp_size)

    # Publish samples to the feedback buffer (pad rows target the garbage slot).
    if sample_span:
        # Each row's LAST VALID position (host-side resolve picks the real
        # accepted token; this write only keeps the buffer well-defined).
        tok2 = tokens.reshape(B, sample_span)
        fb_val = jnp.take_along_axis(
            tok2, jnp.clip(batch.q_lens - 1, 0, sample_span - 1)[:, None],
            axis=1)[:, 0]
    else:
        fb_val = tokens
    feedback = feedback.at[batch.feedback_write].set(fb_val, mode="drop")

    if return_logprobs:
        # Raw log-softmax of the chosen token (temperature-independent, like
        # vLLM's default). logsumexp over the tp-sharded vocab: one pmax +
        # one psum of [B] scalars — noise next to the lm_head GEMM.
        local_max = jnp.max(logits, axis=-1)                        # [B]
        gmax = (jax.lax.pmax(local_max, AXIS_TP) if tp_size > 1
                else local_max)
        sumexp = jnp.sum(jnp.exp(logits - gmax[:, None]), axis=-1)  # -inf→0
        if tp_size > 1:
            sumexp = jax.lax.psum(sumexp, AXIS_TP)
        lse = gmax + jnp.log(sumexp)
        local_ids = tokens - tp_rank * v_local
        in_shard = (local_ids >= 0) & (local_ids < v_local)
        picked = jnp.take_along_axis(
            logits, jnp.clip(local_ids, 0, v_local - 1)[:, None], axis=1)[:, 0]
        chosen = jnp.where(in_shard, picked, 0.0)
        if tp_size > 1:
            chosen = jax.lax.psum(chosen, AXIS_TP)
        logprobs = chosen - lse                                     # [B]

    # Replicate the sampled tokens over dp (a [dp*B] i32 all-gather — bytes,
    # not bandwidth): every host in a multi-host run can then read ALL groups'
    # tokens from its own addressable shard, and the engine's resolve path
    # never needs a cross-process fetch.
    if jax.lax.axis_size(AXIS_DP) > 1:
        tokens = jax.lax.all_gather(tokens, AXIS_DP, tiled=True)
        if return_logprobs:
            logprobs = jax.lax.all_gather(logprobs, AXIS_DP, tiled=True)

    out = (tokens, kv_cache, feedback)
    if return_logprobs:
        out += (logprobs,)
    if return_logits:
        full = (jax.lax.all_gather(logits, AXIS_TP, axis=1, tiled=True)
                if tp_size > 1 else logits)
        out += (full,)
    if kv_pend is not None:
        out += (kv_rows,)      # [L, B, W]: this step's fresh rows per layer
    return out



def advance_decode_batch(batch: StepBatch, s: jax.Array, *, page_size: int,
                         garbage_slot: int) -> StepBatch:
    """Shift a pure-decode StepBatch ``s`` decode steps forward, ON DEVICE.

    Used by the multi-step decode program: the host builds the batch for the
    first step only; inner step ``s`` derives its positions / KV slots /
    sequence lengths / PRNG seeds here, and reads its input tokens from the
    feedback buffer (where inner step ``s-1`` wrote its samples). Pad tokens
    keep writing to the garbage slot. Pages for all S steps were allocated by
    the batch builder, so the page table is already complete.
    """
    T = batch.token_ids.shape[0]
    B = batch.q_lens.shape[0]
    Pg = batch.page_table.shape[1]
    live_row = batch.q_lens > 0                                    # [B]
    t_iota = jnp.arange(T, dtype=jnp.int32)
    row_of_t = jnp.clip(t_iota, 0, B - 1)   # decode contract: token t == row t
    live_t = (t_iota < B) & live_row[row_of_t]
    pos = batch.positions + s
    pidx = jnp.clip(pos // page_size, 0, Pg - 1)
    page = batch.page_table[row_of_t, pidx]                        # [T]
    slots = jnp.where(live_t, page * page_size + pos % page_size,
                      garbage_slot)
    # After the first inner step every live row's token comes from its OWN
    # feedback slot (multi-step batches sample every row — builder asserts).
    fw_t = jnp.where(batch.sample_mask[row_of_t],
                     batch.feedback_write[row_of_t], -1)
    feedback_read = jnp.where(s == 0, batch.feedback_read,
                              jnp.where(live_t, fw_t, -1))
    return dataclasses.replace(
        batch,
        positions=jnp.where(live_t, pos, 0),
        kv_slots=slots,
        seq_lens=jnp.where(live_row, batch.seq_lens + s, 0),
        feedback_read=feedback_read,
        seeds=batch.seeds + s.astype(jnp.uint32),
    )


def _defer_commit_ok(cfg, *, use_pallas: bool, fp8_scaled: bool,
                     multi_step: int) -> bool:
    """Whether multi-step decode can run in deferred-commit mode: the Pallas
    decode kernel must apply to EVERY shard (the jnp fallback has no
    pending-token semantics), the cache must hold unscaled rows (no fp8),
    and a sliding window must not be narrower than the pending window."""
    import os
    from swiftllm_tpu.ops.paged_attention import kernel_supports
    from swiftllm_tpu.worker.weights import effective_num_kv_heads
    if not use_pallas or fp8_scaled:
        return False
    if os.environ.get("SWIFTLLM_DEFER_KV", "0") != "1":
        # Default OFF — measured on v5e (r5, b64/c128/ms8): the fused
        # per-step RMW write-back it removes was ALREADY hidden behind the
        # next group's compute (throughput with write-back disabled entirely:
        # +1%), while the window-commit scatter cost 17% (XLA copies the
        # donated cache around a scatter adjacent to the aliased kernel) and
        # ~300 s of extra XLA:TPU compile. Kept behind the env flag as a
        # measured negative result; see docs/RESULTS_r5.md.
        return False
    if cfg.sliding_window and cfg.sliding_window < multi_step:
        return False
    tp = jax.lax.axis_size(AXIS_TP)          # static under shard_map trace
    n_q_l = cfg.num_q_heads // tp
    n_kv_l = effective_num_kv_heads(cfg, tp) // tp
    return kernel_supports(n_q_l, n_kv_l, cfg.head_dim, 0)


def decode_multi_step(params, kv_cache, feedback, batch: StepBatch, *,
                      multi_step: int, page_size: int,
                      return_logprobs: bool = False, **fwd_kwargs):
    """Run S pure-decode steps in ONE program: ``lax.scan`` over
    ``forward_shard`` with (kv_cache, feedback) as carry.

    Per-dispatch overhead — program launch, the H2D packed-batch transfer and
    the D2H token fetch, ~1 ms total on a tunneled v5e — is paid once per S
    tokens instead of per token. Tokens come out [B_local * S] row-major
    (row b's inner step s at ``b*S + s``), the same layout as spec-verify
    spans, so the host resolve path is shared.

    Deferred KV commit (when the Pallas decode path applies): inner steps do
    NOT write the cache. Each layer's fresh K‖V rows accumulate in a pending
    buffer [L, S, B, W] carried through the scan; the kernel folds the live
    pending tokens from VMEM, and the whole window commits with ONE scatter
    after the scan. This removes the kernel's per-grid-step read-modify-write
    page write-back — measured ~3.7 µs x B/R grid steps per LAYER on v5e,
    the dominant fixed cost of short-context decode (docs/RESULTS_r4.md) —
    and replaces L*S tiny RMW rounds with one bulk scatter per window.
    """
    cfg = fwd_kwargs["cfg"]
    deferred = _defer_commit_ok(
        cfg, use_pallas=fwd_kwargs.get("use_pallas", False),
        fp8_scaled=fwd_kwargs.get("fp8_scaled", False),
        multi_step=multi_step)
    L, S_slots, W = kv_cache.shape
    B = batch.q_lens.shape[0]
    P = multi_step
    if deferred:
        from swiftllm_tpu.ops.paged_attention import decode_group_geometry
        R, Bp, GB = decode_group_geometry(B)
        RW = R * W
        # Pending buffer in the KERNEL's group-major lane layout (slot j of
        # group g at lanes j*RW): zero relayout on the hot path — the kernel
        # block-reads it per layer, and this scan updates ONE [L, GB, 1, RW]
        # slice per inner step.
        pend0 = jnp.zeros((L, GB, P, RW), kv_cache.dtype)

    def body(carry, s):
        if deferred:
            cache, fb, pendbuf = carry
        else:
            cache, fb = carry
        bs = advance_decode_batch(batch, s, page_size=page_size,
                                  garbage_slot=cache.shape[1] - page_size)
        out = forward_shard(params, cache, fb, bs, page_size=page_size,
                            return_logprobs=return_logprobs,
                            kv_pend=(pendbuf.reshape(L, GB, P * RW)
                                     if deferred else None),
                            npend=(s + 1) if deferred else None,
                            **fwd_kwargs)
        tokens, cache, fb = out[0], out[1], out[2]
        ys = (tokens,) + ((out[3],) if return_logprobs else ())
        if deferred:
            rows = out[-1]                                   # [L, B, W]
            if Bp != B:
                rows = jnp.pad(rows, ((0, 0), (0, Bp - B), (0, 0)))
            pendbuf = jax.lax.dynamic_update_slice(
                pendbuf, rows.reshape(L, GB, 1, RW), (0, 0, s, 0))
            return (cache, fb, pendbuf), ys
        return (cache, fb), ys

    if deferred:
        (kv_cache, feedback, pend), ys = jax.lax.scan(
            body, (kv_cache, feedback, pend0),
            jnp.arange(multi_step, dtype=jnp.int32))
        # --- commit the window: one scatter of L*B*P rows ------------------
        live = batch.q_lens > 0                                        # [B]
        pos0 = batch.positions[:B]            # decode contract: token b=row b
        sidx = jnp.arange(P, dtype=jnp.int32)
        pos = pos0[:, None] + sidx[None, :]                         # [B, P]
        Pg = batch.page_table.shape[1]
        page = jnp.take_along_axis(
            batch.page_table, jnp.clip(pos // page_size, 0, Pg - 1), axis=1)
        slots = jnp.where(live[:, None],
                          page * page_size + pos % page_size,
                          S_slots - page_size)                      # garbage
        # [L, GB, P, R, W] -> row (g*R+r)*P + j == slots' b*P + j order.
        vals = (pend.reshape(L, GB, P, R, W).transpose(0, 1, 3, 2, 4)
                .reshape(L, Bp * P, W)[:, :B * P])
        kv_cache = kv_cache.at[:, slots.reshape(-1)].set(vals)
    else:
        (kv_cache, feedback), ys = jax.lax.scan(
            body, (kv_cache, feedback),
            jnp.arange(multi_step, dtype=jnp.int32))
    tokens = jnp.swapaxes(ys[0], 0, 1).reshape(-1)        # [B*S] row-major
    out = (tokens, kv_cache, feedback)
    if return_logprobs:
        out += (jnp.swapaxes(ys[1], 0, 1).reshape(-1),)
    return out


def make_step_fn(mesh, cfg: LlamaModelConfig, *, page_size: int, q_bucket: int,
                 use_pallas: bool, T: int, B: int, Pg: int,
                 return_logits: bool = False, quant: str = "none",
                 use_sampler: bool = True, fp8_scaled: bool = False,
                 return_logprobs: bool = False,
                 lora_targets: tuple[str, ...] = (),
                 sample_span: int = 0, multi_step: int = 1):
    """Build the jitted SPMD step. KV cache and feedback buffer are donated.
    The batch arrives as ONE packed i32 buffer (see pack_step_batch) — a
    single host→device transfer per step."""
    from swiftllm_tpu.parallel.mesh import (FEEDBACK_SPEC, KV_CACHE_SPEC,
                                            param_specs)

    quantized_lm_head = quant != "none" and not cfg.tie_word_embeddings

    PARAM_SPECS = param_specs(quant, quantized_lm_head=quantized_lm_head,
                              qkv_bias=cfg.qkv_bias,
                              lora_targets=lora_targets)
    # Tokens come out replicated (all-gathered over dp inside forward_shard).
    out_specs = ((P(), KV_CACHE_SPEC, FEEDBACK_SPEC)
                 + ((P(),) if return_logprobs else ())
                 + ((P(AXIS_DP, None),) if return_logits else ()))

    assert multi_step <= 1 or (sample_span == 0 and not return_logits), \
        "multi_step is a pure-decode variant (no spec spans, no logits)"

    def step(params, kv_cache, feedback, flat_batch):
        batch = unpack_step_batch(
            flat_batch, T, B, Pg, page_size=page_size,
            garbage_slot=kv_cache.shape[1] - page_size)
        if multi_step > 1:
            return decode_multi_step(
                params, kv_cache, feedback, batch, multi_step=multi_step,
                cfg=cfg, page_size=page_size, q_bucket=q_bucket,
                use_pallas=use_pallas, use_sampler=use_sampler,
                fp8_scaled=fp8_scaled, return_logprobs=return_logprobs)
        return forward_shard(params, kv_cache, feedback, batch, cfg=cfg,
                             page_size=page_size, q_bucket=q_bucket,
                             use_pallas=use_pallas,
                             return_logits=return_logits,
                             use_sampler=use_sampler, fp8_scaled=fp8_scaled,
                             return_logprobs=return_logprobs,
                             sample_span=sample_span)

    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(PARAM_SPECS, KV_CACHE_SPEC, FEEDBACK_SPEC, P(AXIS_DP)),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(1, 2))
