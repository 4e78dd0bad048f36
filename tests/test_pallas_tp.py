"""Pallas kernels inside a tp>1 shard_map.

The kernel parity matrix (test_paged_attention) runs the kernels standalone;
these tests run them through the FULL model path — shard_map over a ("dp",
"tp") mesh with per-shard head counts — in interpret mode on the CPU backend
(SWIFTLLM_PALLAS_INTERPRET=1), so sharded-kernel shape constraints are
exercised in CI without a multi-chip TPU.

Also covers the static fallback: shards whose head shapes violate the
kernel's 128-lane tiling contract (ops.paged_attention.kernel_supports) must
take the jnp path instead of failing at trace time.
"""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

from swiftllm_tpu.config import EngineConfig, LlamaModelConfig
from swiftllm_tpu.server.scheduler import ScheduledSeq
from swiftllm_tpu.server.structs import RawRequest, Request
from swiftllm_tpu.worker.model import LlamaModel


def _forward_logits(mc, *, tp_size, use_pallas, monkeypatch, n_decode=3,
                    interpret=True):
    if interpret:
        monkeypatch.setenv("SWIFTLLM_PALLAS_INTERPRET", "1")
    ec = EngineConfig(model_path="", use_dummy=True, dtype="float32",
                      block_size=16, num_hbm_blocks=32, num_cpu_blocks=0,
                      max_blocks_per_seq=8, max_batch_size=8,
                      max_tokens_in_batch=64, prefill_chunk_size=32,
                      max_seqs_in_block_table=16,
                      tp_size=tp_size, use_pallas=use_pallas)
    model = LlamaModel(ec, mc)
    model.load_weights()
    model.init_kvcache_and_swap()
    r = Request(RawRequest("", n_decode + 1))
    r.set_prompt_token_ids([(i * 13) % mc.vocab_size for i in range(20)])
    r.seq_id = 0

    tokens, rows, logits = model.forward([ScheduledSeq(r, 20)],
                                         return_logits=True)
    all_logits = [logits[0]]
    r.output_token_ids.append(int(tokens[0]))
    r.num_cached_tokens += 20
    toks = [int(tokens[0])]
    for _ in range(n_decode):
        tokens, rows, logits = model.forward([ScheduledSeq(r, 1)],
                                             return_logits=True)
        all_logits.append(logits[0])
        toks.append(int(tokens[0]))
        r.output_token_ids.append(int(tokens[0]))
        r.num_cached_tokens += 1
    return np.stack(all_logits), toks


# Per-shard at tp=2: n_q=4 (4*32=128 lanes), W = 2*2*32 = 128 — exactly at
# the kernel's alignment floor, the tightest legal sharded configuration.
ALIGNED = LlamaModelConfig(num_layers=2, num_q_heads=8, num_kv_heads=4,
                           hidden_size=256, head_dim=32, ffn_inter_dim=512,
                           vocab_size=256, max_position_embeddings=2048,
                           rms_norm_eps=1e-5)

# Per-shard at tp=2: n_q=2, 2*16=32 lanes — BELOW the 128-lane tile. The
# model must statically fall back to the jnp path for these shards.
MISALIGNED = LlamaModelConfig(num_layers=2, num_q_heads=4, num_kv_heads=2,
                              hidden_size=64, head_dim=16, ffn_inter_dim=128,
                              vocab_size=128, max_position_embeddings=2048,
                              rms_norm_eps=1e-5)


def test_pallas_under_tp2_matches_jnp(monkeypatch):
    """Decode + prefill kernels execute inside a tp=2 shard_map (interpret
    mode) and match the jnp path bit-for-bit-ish on fp32 dummy weights."""
    got, toks = _forward_logits(ALIGNED, tp_size=2, use_pallas=True,
                                monkeypatch=monkeypatch)
    ref, ref_toks = _forward_logits(ALIGNED, tp_size=2, use_pallas=False,
                                    monkeypatch=monkeypatch)
    assert toks == ref_toks
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_int4_fused_model_path_tp2(monkeypatch):
    """quant=int4 + use_pallas routes every projection through the fused
    dequant-matmul kernel (ops/int4_matmul) inside a tp=2 shard_map; logits
    must match the XLA two-half-dot path on the same quantized weights."""
    mc = ALIGNED
    def run(use_pallas):
        monkeypatch.setenv("SWIFTLLM_PALLAS_INTERPRET", "1")
        ec = EngineConfig(model_path="", use_dummy=True, dtype="float32",
                          quant="int4",
                          block_size=16, num_hbm_blocks=32, num_cpu_blocks=0,
                          max_blocks_per_seq=8, max_batch_size=8,
                          max_tokens_in_batch=64, prefill_chunk_size=32,
                          max_seqs_in_block_table=16,
                          tp_size=2, use_pallas=use_pallas)
        model = LlamaModel(ec, mc)
        model.load_weights()
        model.init_kvcache_and_swap()
        r = Request(RawRequest("", 3))
        r.set_prompt_token_ids([(i * 13) % mc.vocab_size for i in range(20)])
        r.seq_id = 0
        tokens, rows, logits = model.forward([ScheduledSeq(r, 20)],
                                             return_logits=True)
        out = [logits[0]]
        r.output_token_ids.append(int(tokens[0]))
        r.num_cached_tokens += 20
        for _ in range(2):
            tokens, rows, logits = model.forward([ScheduledSeq(r, 1)],
                                                 return_logits=True)
            out.append(logits[0])
            r.output_token_ids.append(int(tokens[0]))
            r.num_cached_tokens += 1
        return np.stack(out)

    got = run(True)
    ref = run(False)
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=5e-4)


def test_pallas_misaligned_shard_falls_back(monkeypatch):
    """Head shapes below the 128-lane tile at tp=2: use_pallas=True must
    still work (static jnp fallback), and agree with the explicit jnp run."""
    from swiftllm_tpu.ops.paged_attention import kernel_supports
    assert not kernel_supports(2, 1, 16)   # the per-shard shape of MISALIGNED
    got, toks = _forward_logits(MISALIGNED, tp_size=2, use_pallas=True,
                                monkeypatch=monkeypatch)
    ref, ref_toks = _forward_logits(MISALIGNED, tp_size=2, use_pallas=False,
                                    monkeypatch=monkeypatch)
    assert toks == ref_toks
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)
