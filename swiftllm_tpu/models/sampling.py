"""Token sampling over vocab-sharded logits.

The reference is greedy-only (``argmax`` at post_layer.py:33-40, SURVEY.md §2.2
D7); here temperature / top-k / top-p sampling are first-class, designed for a
tp-sharded lm_head:

- Greedy rows stay EXACT over the full vocab: per-shard (max, argmax) followed
  by a tiny [tp, B] all-gather and a cross-shard compare.
- Sampling rows draw from the global top-``MAX_CAND`` candidates: each shard
  takes its local top-MAX_CAND, one [tp, B, MAX_CAND] all-gather builds the
  global candidate set, then temperature scaling, top-k/top-p masking and a
  Gumbel-max draw happen redundantly on every shard (same seeds → same token,
  SPMD-safe). Probability mass beyond the top-256 logits is dropped — for real
  LLMs this tail is numerically negligible, and it keeps the collective
  O(B·256) instead of O(B·V).

All rows share one code path; ``temperature <= 0`` selects the greedy result.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

MAX_CAND = 256

# The candidate search uses jax.lax.approx_max_k (recall_target=0.99): a true
# top candidate can occasionally be missed, so sampled outputs are an
# APPROXIMATION of the exact temperature/top-k/top-p distribution (greedy rows
# are always exact). The drift is deterministic for a fixed compiled program
# but may differ from exact-top-k builds. Set SWIFTLLM_EXACT_TOPK=1 to compile
# the exact lax.top_k path instead (full-vocab sort, ~1.2 ms/step at 32k vocab
# on v5e — used by parity tests).
EXACT_TOPK = os.environ.get("SWIFTLLM_EXACT_TOPK", "0") == "1"


def exact_greedy(logits: jax.Array, v_local: int, tp_axis: str,
                 tp_size: int) -> jax.Array:
    """Exact argmax over the tp-sharded vocab. logits: f32[B, V_local]."""
    local_max = jnp.max(logits, axis=-1)
    local_arg = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if tp_size == 1:
        return local_arg
    maxes = jax.lax.all_gather(local_max, tp_axis)          # [tp, B]
    args = jax.lax.all_gather(local_arg, tp_axis)           # [tp, B]
    win = jnp.argmax(maxes, axis=0)                         # [B]
    return (jnp.take_along_axis(args, win[None, :], axis=0)[0]
            + win.astype(jnp.int32) * v_local)


def sample_tokens(
    logits: jax.Array,        # f32[B, V_local] (padding vocab rows already -inf)
    *,
    temperature: jax.Array,   # f32[B]  (<= 0 → greedy)
    top_p: jax.Array,         # f32[B]  (1.0 → off)
    top_k: jax.Array,         # i32[B]  (0 → off)
    seeds: jax.Array,         # u32[B]  per-row PRNG seed for this step
    v_local: int,
    tp_axis: str,
    tp_size: int,
    tp_rank,
) -> jax.Array:
    """Returns i32[B] sampled token ids (global vocab ids)."""
    B = logits.shape[0]
    greedy = exact_greedy(logits, v_local, tp_axis, tp_size)

    k_cand = min(MAX_CAND, v_local)
    # approx_max_k is the TPU-native top-k (PartialReduce custom call): it
    # avoids the full-vocab sort lax.top_k lowers to. aggregate_to_topk
    # exact-sorts the found candidates, so only recall of the deep tail is
    # approximate — mass the sampler drops by design anyway.
    if EXACT_TOPK:
        vals, idx = jax.lax.top_k(logits, k_cand)             # exact (full sort)
    else:
        vals, idx = jax.lax.approx_max_k(logits, k_cand,
                                         recall_target=0.99,
                                         aggregate_to_topk=True)  # [B, k], local ids
    gids = idx.astype(jnp.int32) + tp_rank * v_local
    if tp_size > 1:
        vals = jax.lax.all_gather(vals, tp_axis, axis=1, tiled=True)   # [B, tp*k]
        gids = jax.lax.all_gather(gids, tp_axis, axis=1, tiled=True)
        vals, pos = jax.lax.top_k(vals, min(MAX_CAND, vals.shape[1]))  # global top
        gids = jnp.take_along_axis(gids, pos, axis=1)
    C = vals.shape[1]                                       # candidates, descending

    # temperature
    t = jnp.maximum(temperature, 1e-6)[:, None]
    scaled = vals / t

    # top-k mask (candidate list is sorted descending, so rank == position)
    ranks = jnp.arange(C, dtype=jnp.int32)[None, :]
    k_eff = jnp.where(top_k > 0, jnp.minimum(top_k, C), C)[:, None]
    masked = jnp.where(ranks < k_eff, scaled, -jnp.inf)

    # top-p (nucleus): keep the smallest prefix with cumulative prob >= top_p.
    probs = jax.nn.softmax(masked, axis=-1)
    cum_prev = jnp.cumsum(probs, axis=-1) - probs           # mass strictly before
    masked = jnp.where(cum_prev < top_p[:, None], masked, -jnp.inf)

    # Gumbel-max draw, identical on every shard (same seeds).
    def row_gumbel(seed):
        return jax.random.gumbel(jax.random.key(seed), (C,), jnp.float32)
    gumbel = jax.vmap(row_gumbel)(seeds)
    choice = jnp.argmax(masked + gumbel, axis=-1)           # [B]
    sampled = jnp.take_along_axis(gids, choice[:, None], axis=1)[:, 0]

    return jnp.where(temperature > 0, sampled, greedy).astype(jnp.int32)
