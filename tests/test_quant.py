"""Weight-only quantization tests: pack/unpack roundtrips and end-to-end
closeness of the quantized model's logits to the unquantized model's."""

import numpy as np
import pytest

import jax.numpy as jnp

from swiftllm_tpu.config import EngineConfig, LlamaModelConfig
from swiftllm_tpu.server.scheduler import ScheduledSeq
from swiftllm_tpu.server.structs import RawRequest, Request
from swiftllm_tpu.worker.quant import (_unpack_int4, proj, quantize_int4,
                                       quantize_int8)


def test_int8_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(3, 32, 16)).astype(np.float32)   # [.., out, in]
    qd = quantize_int8(w)
    deq = qd["q"].astype(np.float32) * qd["s"][..., None]
    err = np.abs(deq - w)
    assert np.all(err <= qd["s"][..., None] * 0.5 + 1e-6)


def test_int4_pack_unpack():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(4, 16, 8)).astype(np.float32)   # [.., out, in]
    qd = quantize_int4(w)
    unpacked = np.asarray(_unpack_int4(jnp.asarray(qd["q4"])))
    # rebuild the expected int4 values directly
    s = qd["s"]
    expect = np.clip(np.rint(w / s[..., None]), -7, 7).astype(np.int8)
    np.testing.assert_array_equal(unpacked, expect)


def test_proj_matches_dequantized_matmul():
    rng = np.random.default_rng(2)
    w = rng.normal(size=(32, 64)).astype(np.float32)   # [out, in]
    x = rng.normal(size=(5, 64)).astype(np.float32)
    qd = quantize_int8(w)
    deq = qd["q"].astype(np.float32) * qd["s"][:, None]
    got = np.asarray(proj(jnp.asarray(x), {k: jnp.asarray(v) for k, v in qd.items()}))
    np.testing.assert_allclose(got, x @ deq.T, rtol=1e-5, atol=1e-5)


def _forward_logits(quant: str):
    from swiftllm_tpu.worker.model import LlamaModel
    mc = LlamaModelConfig(num_layers=2, num_q_heads=4, num_kv_heads=2,
                          hidden_size=64, head_dim=16, ffn_inter_dim=128,
                          vocab_size=128, max_position_embeddings=2048,
                          rms_norm_eps=1e-5)
    ec = EngineConfig(model_path="", use_dummy=True, dtype="float32", quant=quant,
                      block_size=16, num_hbm_blocks=32, num_cpu_blocks=0,
                      max_blocks_per_seq=8, max_tokens_in_batch=64,
                      prefill_chunk_size=32, max_seqs_in_block_table=16,
                      use_pallas=False)
    model = LlamaModel(ec, mc)
    model.load_weights()
    model.init_kvcache_and_swap()
    r = Request(RawRequest("", 1))
    r.set_prompt_token_ids([(i * 13) % 128 for i in range(20)])
    r.seq_id = 0
    _, rows, logits = model.forward([ScheduledSeq(r, 20)], return_logits=True)
    return logits[0]


@pytest.mark.parametrize("quant,min_cos", [("int8", 0.999), ("int4", 0.97)])
def test_quantized_model_logits_close(quant, min_cos):
    base = _forward_logits("none")
    q = _forward_logits(quant)
    cos = float(np.dot(base, q) / (np.linalg.norm(base) * np.linalg.norm(q)))
    assert cos > min_cos, f"{quant}: cosine {cos}"


@pytest.fixture(scope="module")
def real_tiny_ckpt(tmp_path_factory):
    # SWIFTLLM_PPL_MODEL=<hf-llama-dir> runs the gate on a REAL checkpoint
    # (BASELINE.md's absolute <=0.1-ppl north star; this environment has no
    # checkpoints or egress, so CI uses a local random-init tiny model with
    # relative thresholds instead).
    import os
    ext = os.environ.get("SWIFTLLM_PPL_MODEL")
    if ext:
        return ext
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    path = tmp_path_factory.mktemp("ppl_llama")
    cfg = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=256,
                      rms_norm_eps=1e-5, tie_word_embeddings=False)
    torch.manual_seed(3)
    LlamaForCausalLM(cfg).eval().save_pretrained(path, safe_serialization=True)
    return str(path)


def _perplexity(path, quant, token_ids):
    """Stepwise next-token perplexity of our model on a fixed sequence."""
    from swiftllm_tpu.worker.model import LlamaModel
    ec = EngineConfig(model_path=path, dtype="float32", quant=quant,
                      block_size=4, num_hbm_blocks=64, num_cpu_blocks=0,
                      max_blocks_per_seq=32, max_tokens_in_batch=64,
                      prefill_chunk_size=16, max_seqs_in_block_table=8,
                      use_pallas=False)
    model = LlamaModel(ec)
    model.load_weights()
    model.init_kvcache_and_swap()

    r = Request(RawRequest("", 1))
    nll, count = 0.0, 0
    r.set_prompt_token_ids(token_ids[:1])
    r.seq_id = 0
    sched = [ScheduledSeq(r, 1)]
    for t in range(1, len(token_ids)):
        _, _, logits = model.forward(sched, return_logits=True)
        logp = logits[0] - np.log(np.sum(np.exp(logits[0] - logits[0].max()))) \
            - logits[0].max()
        nll -= float(logp[token_ids[t]])
        count += 1
        r.output_token_ids.append(token_ids[t])
        r.num_cached_tokens += sched[0].n_tokens
        sched = [ScheduledSeq(r, 1)]
    return float(np.exp(nll / count))


@pytest.mark.parametrize("quant,max_rel", [("int8", 0.001), ("int4", 0.01)])
def test_quant_perplexity_gate(real_tiny_ckpt, quant, max_rel):
    """BASELINE.md north star: quantization costs <= 0.1 perplexity at the
    same bit-width. The random-init checkpoint sits at ppl ≈ vocab (≈128),
    so the gate is expressed relative to base ppl — 0.1 on a real ~7-ppl
    model ≈ 1.4% relative; we gate int4 at 1% and int8 at 0.1%."""
    import os
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 128, 48).tolist()
    base = _perplexity(real_tiny_ckpt, "none", tokens)
    q = _perplexity(real_tiny_ckpt, quant, tokens)
    if os.environ.get("SWIFTLLM_PPL_MODEL"):
        # Real checkpoint: the ABSOLUTE north-star gate.
        assert abs(q - base) <= 0.1, f"{quant}: ppl {base} -> {q}"
    else:
        assert abs(q - base) / base < max_rel, f"{quant}: ppl {base} -> {q}"
