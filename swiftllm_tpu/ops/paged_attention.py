"""Ragged paged attention — Pallas TPU kernel.

Contract (same as models.llama._ragged_paged_attention_jnp): each batch row
attends its q_lens[b] query tokens (flat tokens q_starts[b]..+q_lens[b]) over
its own paged KV (page_table[b], valid length seq_lens[b]), causally by
position. Subsumes both the reference's prefill flash attention
(swiftllm/worker/kernels/prefill_attn.py) and its two-phase flash-decoding
paged attention (swiftllm/worker/kernels/paged_attn.py) in ONE kernel, which
is what lets the scheduler piggyback prefill chunks on decode batches.

Placeholder: delegates to the jnp reference path until the Pallas kernel lands.
"""

from __future__ import annotations

import jax


def ragged_paged_attention(q, cache_l, batch, *, page_size: int, sm_scale: float,
                           q_bucket: int) -> jax.Array:
    from swiftllm_tpu.models.llama import _ragged_paged_attention_jnp
    return _ragged_paged_attention_jnp(q, cache_l, batch, page_size=page_size,
                                       sm_scale=sm_scale, q_bucket=q_bucket)
