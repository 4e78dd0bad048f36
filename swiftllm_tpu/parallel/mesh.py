"""Device mesh and sharding layout.

The reference is single-GPU with no collectives (SURVEY.md §2.5). Here
parallelism is first-class: the whole forward step runs SPMD under
``jax.shard_map`` over a 2-D mesh:

- axis ``"dp"`` (data): shards *sequences* — each dp group owns a slice of the
  KV page pool, of the batch rows, and of the flat token stream. Single-step
  continuous batching across dp groups, one compiled program for all.
- axis ``"tp"`` (tensor): shards attention heads / FFN channels / vocab. The
  only cross-chip traffic is two psums per layer plus a tiny sampling
  all-gather, all riding ICI.

A single chip is the degenerate 1x1 mesh: the same program, with every psum a
no-op, so multi-chip is a config change, not a rewrite.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DP = "dp"
AXIS_TP = "tp"


def make_mesh(dp_size: int = 1, tp_size: int = 1, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = dp_size * tp_size
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(dp_size, tp_size)
    return Mesh(arr, (AXIS_DP, AXIS_TP))


# --- PartitionSpecs --------------------------------------------------------------
# Weights: replicated over dp, head/channel-sharded over tp.
PARAM_SPECS = {
    "embed": P(AXIS_TP, None),            # [V, D] vocab-sharded
    "lm_head": P(AXIS_TP, None),          # [V, D] vocab-sharded
    "final_norm": P(),                    # [D]
    "inv_freq": P(),                      # [head_dim//2]
    # GEMM weights are stored [L, out, in] (torch-native; contraction on
    # lanes — see worker/weights.py gemm()).
    "layers": {
        "attn_norm": P(),                 # [L, D]
        "wq": P(None, AXIS_TP, None),     # [L, n_q*hd, D]    out-sharded (column)
        "wk": P(None, AXIS_TP, None),     # [L, n_kv*hd, D]
        "wv": P(None, AXIS_TP, None),
        "wo": P(None, None, AXIS_TP),     # [L, D, n_q*hd]    in-sharded (row)
        "ffn_norm": P(),
        "w_gate": P(None, AXIS_TP, None), # [L, F, D]
        "w_up": P(None, AXIS_TP, None),
        "w_down": P(None, None, AXIS_TP), # [L, D, F]
    },
}

# KV cache [L, S, n_kv*2*hd]: flat slots sharded over dp (each dp group owns
# its page pool), the lane axis sharded over tp at head granularity. Each tp
# shard's lane slice is laid out as [K_all ‖ V_all]: its n_kv_local K heads
# contiguous, then its V heads (shard-local halves — each shard only touches
# its own slice, so tp sharding is unaffected).
# 3-D with no K/V axis so the jitted step NEVER reshapes the cache —
# a reshape at the scan boundary breaks XLA's carry aliasing and costs two
# full-cache copies per step (measured on v5e).
KV_CACHE_SPEC = P(None, AXIS_DP, AXIS_TP)

GEMM_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def param_specs(quant: str = "none", quantized_lm_head: bool = False,
                qkv_bias: bool = False,
                lora_targets: tuple[str, ...] = ()) -> dict:
    """PARAM_SPECS adjusted for the weight-quantization storage format.

    quantized_lm_head: the untied lm_head is stored quantized in its [V, D]
    ([out, in]) layout (vocab stays the tp-sharded axis); tied-embedding
    models keep the plain [V, D] embedding for both roles.
    qkv_bias: Qwen2-style [L, out] additive biases, sharded like their
    projections' output axes (kept in the activation dtype under quant).
    lora_targets: projection keys carrying stacked LoRA adapters
    (layers["lora_<key>"] = {"A": [L, n_lora, r, in], "B": [L, n_lora, out, r]}
    + top-level "lora_scale" [n_lora]). Out-sharded projections shard B's out
    axis (A replicated, small); in-sharded ones (wo, w_down) shard A's
    contraction axis so the per-shard LoRA partial folds into the projection's
    existing psum."""
    if quant == "none" and not qkv_bias and not lora_targets:
        return PARAM_SPECS
    specs = dict(PARAM_SPECS)
    layers = dict(PARAM_SPECS["layers"])
    if quant != "none":
        from swiftllm_tpu.worker.quant import spec_for_quantized
        layers = {k: (spec_for_quantized(v, quant) if k in GEMM_KEYS else v)
                  for k, v in layers.items()}
    if qkv_bias:
        layers.update(bq=P(None, AXIS_TP), bk=P(None, AXIS_TP),
                      bv=P(None, AXIS_TP))
    for key in lora_targets:
        if key in ("wo", "w_down"):     # in-sharded base projection
            layers["lora_" + key] = {"A": P(None, None, None, AXIS_TP),
                                     "B": P()}
        else:                           # out-sharded base projection
            layers["lora_" + key] = {"A": P(),
                                     "B": P(None, None, AXIS_TP, None)}
    specs["layers"] = layers
    if lora_targets:
        specs["lora_scale"] = P()
    if quantized_lm_head:
        q_key = "q" if quant == "int8" else "q4"
        specs["lm_head"] = {q_key: P(AXIS_TP, None), "s": P(AXIS_TP)}
    return specs

# Batch descriptor: token-axis and seq-row-axis arrays shard over dp.
BATCH_SPECS = {
    "token_ids": P(AXIS_DP),
    "positions": P(AXIS_DP),
    "kv_slots": P(AXIS_DP),
    "q_starts": P(AXIS_DP),
    "q_lens": P(AXIS_DP),
    "seq_lens": P(AXIS_DP),
    "page_table": P(AXIS_DP, None),
    "sample_mask": P(AXIS_DP),
    "temperature": P(AXIS_DP),
    "top_p": P(AXIS_DP),
    "top_k": P(AXIS_DP),
    "seeds": P(AXIS_DP),
    "feedback_read": P(AXIS_DP),
    "feedback_write": P(AXIS_DP),
    "decode_row": P(AXIS_DP),
    "kv_slots_scatter": P(AXIS_DP),
    "lora_ids": P(AXIS_DP),
}

# On-device last-sampled-token buffer, one slot per seq id per dp group
# (+1 garbage slot). Lets decode steps chain without host round-trips.
FEEDBACK_SPEC = P(AXIS_DP)

OUT_TOKEN_SPEC = P()     # sampled tokens [dp*B], replicated (dp all-gathered
                         # in-step so every host can read every group's tokens)


def named(mesh: Mesh, spec_tree):
    """Map a PartitionSpec pytree to NamedShardings on `mesh`."""
    return jax.tree.map(lambda s: NamedSharding(mesh, s), spec_tree,
                        is_leaf=lambda x: isinstance(x, P))
