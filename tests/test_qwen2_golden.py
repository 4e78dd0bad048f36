"""Qwen2 / Mistral model-family numerics vs HF transformers (torch, fp32).

The reference framework is Llama-only (swiftllm/model_config.py:5-46); here
the same TPU-first data plane serves the whole llama-architecture family.
Qwen2 adds additive q/k/v projection biases (and commonly tied embeddings at
small sizes); Mistral v0.3+ is llama-shaped exactly. Tiny random HF models
are built locally (no network), saved as real safetensors checkpoints, and
loaded through our loader — exercising config parsing (model_type dispatch,
qkv_bias), bias loading/sharding, and greedy-token agreement on the virtual
CPU mesh, including tp=2 with KV-head replication over the bias tensors.
"""

import numpy as np
import pytest

import tests.conftest  # noqa: F401  (forces cpu backend before jax use)

from tests.test_llama_golden import hf_greedy, make_model, run_ours

PROMPTS = [[1, 5, 9, 13, 2, 7], [1, 99, 42, 17]]


@pytest.fixture(scope="module")
def tiny_qwen2(tmp_path_factory):
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    path = tmp_path_factory.mktemp("tiny_qwen2")
    cfg = Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=True)   # Qwen2-0.5B-style tied embeddings
    torch.manual_seed(7)
    model = Qwen2ForCausalLM(cfg).eval()
    model.save_pretrained(path, safe_serialization=True)
    return str(path), model


@pytest.fixture(scope="module")
def tiny_mistral(tmp_path_factory):
    import torch
    from transformers import MistralConfig, MistralForCausalLM

    path = tmp_path_factory.mktemp("tiny_mistral")
    cfg = MistralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5, rope_theta=10000.0,
        sliding_window=None, tie_word_embeddings=False)
    torch.manual_seed(11)
    model = MistralForCausalLM(cfg).eval()
    model.save_pretrained(path, safe_serialization=True)
    return str(path), model


def test_qwen2_config_parses(tiny_qwen2):
    from swiftllm_tpu.config import LlamaModelConfig
    mc = LlamaModelConfig.load_from_model_path(tiny_qwen2[0])
    assert mc.qkv_bias and mc.tie_word_embeddings


def test_qwen2_greedy_tokens_match_hf(tiny_qwen2):
    path, hf_model = tiny_qwen2
    m = make_model(path)
    ours = run_ours(m, PROMPTS, 8)
    for p, o in zip(PROMPTS, ours):
        assert o == hf_greedy(hf_model, p, 8), f"prompt {p}: {o}"


def test_qwen2_prefill_logits_match_hf(tiny_qwen2):
    import torch

    from swiftllm_tpu.server.scheduler import ScheduledSeq
    from swiftllm_tpu.server.structs import RawRequest, Request
    path, hf_model = tiny_qwen2
    m = make_model(path)
    p = PROMPTS[0]
    r = Request(RawRequest("", 1))
    r.set_prompt_token_ids(list(p))
    r.seq_id = 0
    tokens, rows, logits = m.forward([ScheduledSeq(r, len(p))],
                                     return_logits=True)
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor([p])).logits[0, -1].numpy()
    np.testing.assert_allclose(logits[0][: len(hf_logits)], hf_logits,
                               atol=2e-4, rtol=2e-3)


def test_qwen2_tensor_parallel_matches(tiny_qwen2):
    # tp=4 > num_kv_heads=2 also exercises KV-head (and bias) replication.
    path, hf_model = tiny_qwen2
    m = make_model(path, tp=4)
    ours = run_ours(m, PROMPTS, 6)
    for p, o in zip(PROMPTS, ours):
        assert o == hf_greedy(hf_model, p, 6), f"prompt {p}: {o}"


def test_mistral_greedy_tokens_match_hf(tiny_mistral):
    path, hf_model = tiny_mistral
    m = make_model(path)
    ours = run_ours(m, PROMPTS, 8)
    for p, o in zip(PROMPTS, ours):
        assert o == hf_greedy(hf_model, p, 8), f"prompt {p}: {o}"


def test_sliding_window_config_parses():
    from swiftllm_tpu.config import LlamaModelConfig
    base = {"hidden_size": 64, "num_attention_heads": 4,
            "num_hidden_layers": 2, "intermediate_size": 128,
            "vocab_size": 128, "max_position_embeddings": 8192}
    # Mistral v0.1: sliding_window applies whenever set.
    mc = LlamaModelConfig.from_hf_dict(
        dict(base, model_type="mistral", sliding_window=4096))
    assert mc.sliding_window == 4096
    # Qwen2 only honors it under use_sliding_window (HF semantics).
    mc = LlamaModelConfig.from_hf_dict(
        dict(base, model_type="qwen2", sliding_window=4096))
    assert mc.sliding_window is None
    mc = LlamaModelConfig.from_hf_dict(
        dict(base, model_type="qwen2", sliding_window=4096,
             use_sliding_window=True))
    assert mc.sliding_window == 4096


@pytest.fixture(scope="module")
def tiny_mistral_swa(tmp_path_factory):
    """Mistral v0.1-style model with a sliding window SMALLER than the
    prompts, so windowed and full-causal attention genuinely diverge."""
    import torch
    from transformers import MistralConfig, MistralForCausalLM

    path = tmp_path_factory.mktemp("tiny_mistral_swa")
    cfg = MistralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5, rope_theta=10000.0,
        sliding_window=5, tie_word_embeddings=False,
        attn_implementation="eager")
    torch.manual_seed(13)
    model = MistralForCausalLM(cfg).eval()
    model.save_pretrained(path, safe_serialization=True)
    return str(path), model


SWA_PROMPTS = [[1, 5, 9, 13, 2, 7, 31, 64, 3, 77, 12, 50],
               [1, 99, 42, 17, 8, 23, 61]]


def test_mistral_sliding_window_greedy_matches_hf(tiny_mistral_swa):
    path, hf_model = tiny_mistral_swa
    from swiftllm_tpu.config import LlamaModelConfig
    assert LlamaModelConfig.load_from_model_path(path).sliding_window == 5
    m = make_model(path)
    ours = run_ours(m, SWA_PROMPTS, 8)
    for p, o in zip(SWA_PROMPTS, ours):
        assert o == hf_greedy(hf_model, p, 8), f"prompt {p}: {o}"


def test_mistral_sliding_window_chunked_prefill(tiny_mistral_swa):
    # chunked prefill (window boundary crosses chunk edges) vs HF
    path, hf_model = tiny_mistral_swa
    m = make_model(path)
    ours = run_ours(m, SWA_PROMPTS, 6, chunked=True)
    for p, o in zip(SWA_PROMPTS, ours):
        assert o == hf_greedy(hf_model, p, 6), f"prompt {p}: {o}"
