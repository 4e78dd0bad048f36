"""FP8 KV-cache tests: logits stay close to the bf16-cache model, and the
fused decode path agrees with the jnp fallback when the cache is fp8."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401

import jax.numpy as jnp

from swiftllm_tpu.config import EngineConfig, LlamaModelConfig
from swiftllm_tpu.server.scheduler import ScheduledSeq
from swiftllm_tpu.server.structs import RawRequest, Request
from swiftllm_tpu.worker.model import LlamaModel


def _run(kv_quant: str, n_decode=4):
    mc = LlamaModelConfig(num_layers=2, num_q_heads=4, num_kv_heads=2,
                          hidden_size=64, head_dim=16, ffn_inter_dim=128,
                          vocab_size=128, max_position_embeddings=2048,
                          rms_norm_eps=1e-5)
    # Dummy weights produce tiny K/V (~1e-4), far below e4m3's subnormal
    # floor; kv_scale moves them into range (real models sit near 1.0).
    ec = EngineConfig(model_path="", use_dummy=True, dtype="float32",
                      kv_quant=kv_quant, kv_scale=4096.0 if kv_quant == "fp8" else 1.0,
                      block_size=32, num_hbm_blocks=32,
                      num_cpu_blocks=0, max_blocks_per_seq=8,
                      max_tokens_in_batch=64, prefill_chunk_size=32,
                      max_seqs_in_block_table=16, use_pallas=False)
    model = LlamaModel(ec, mc)
    model.load_weights()
    model.init_kvcache_and_swap()
    r = Request(RawRequest("", n_decode + 1))
    r.set_prompt_token_ids([(i * 13) % 128 for i in range(20)])
    r.seq_id = 0

    _, rows, logits = model.forward([ScheduledSeq(r, 20)], return_logits=True)
    all_logits = [logits[0]]
    toks = []
    tokens, rows = np.argmax(logits, -1), rows
    r.output_token_ids.append(int(tokens[0]))
    r.num_cached_tokens += 20
    for _ in range(n_decode):
        tokens, rows, logits = model.forward([ScheduledSeq(r, 1)],
                                             return_logits=True)
        all_logits.append(logits[0])
        toks.append(int(tokens[0]))
        r.output_token_ids.append(int(tokens[0]))
        r.num_cached_tokens += 1
    return np.stack(all_logits), toks, model


def test_fp8_cache_dtype_and_size():
    _, _, model = _run("fp8", n_decode=1)
    assert model.kv_cache.dtype == jnp.float8_e4m3fn
    _, _, base = _run("none", n_decode=1)
    assert model.kv_cache.nbytes * 4 == base.kv_cache.nbytes  # fp8 vs f32


def test_fp8_logits_close_to_full_precision():
    base, _, _ = _run("none")
    fp8, _, _ = _run("fp8")
    for i in range(base.shape[0]):
        a = base[i].astype(np.float64)
        b = fp8[i].astype(np.float64)
        cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos > 0.98, f"step {i}: cosine {cos}"


def test_fp8_requires_32_aligned_pages():
    with pytest.raises(AssertionError):
        EngineConfig(model_path="", kv_quant="fp8", block_size=16)
