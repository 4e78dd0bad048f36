"""End-to-end numerics: our TPU-native forward vs HF transformers (torch, fp32).

A tiny random LlamaForCausalLM is built locally (no network), saved as a real
safetensors checkpoint, and loaded through our loader — exercising config
parsing, weight loading/transposition, RoPE, paged KV, mixed batches, chunked
prefill, and tensor/data sharding on the virtual CPU mesh.
"""

import json

import numpy as np
import pytest

import tests.conftest  # noqa: F401  (forces cpu backend before jax use)

from swiftllm_tpu.config import EngineConfig, LlamaModelConfig
from swiftllm_tpu.server.scheduler import ScheduledSeq
from swiftllm_tpu.server.structs import RawRequest, Request


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    path = tmp_path_factory.mktemp("tiny_llama")
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False)
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg).eval()
    model.save_pretrained(path, safe_serialization=True)
    return str(path), model, cfg


def make_model(path, tp=1, dp=1, **kw):
    from swiftllm_tpu.worker.model import LlamaModel
    kw.setdefault("block_size", 4)
    kw.setdefault("max_blocks_per_seq", 16)
    kw.setdefault("max_tokens_in_batch", 64)
    kw.setdefault("num_hbm_blocks", 32)
    kw.setdefault("num_cpu_blocks", 32)
    kw.setdefault("prefill_chunk_size", 8)
    ec = EngineConfig(model_path=path, dtype="float32", tp_size=tp, dp_size=dp,
                      use_pallas=False, **kw)
    m = LlamaModel(ec)
    m.load_weights()
    m.init_kvcache_and_swap()
    return m


def hf_greedy(model, prompt_ids, n_steps):
    import torch
    ids = torch.tensor([prompt_ids])
    with torch.no_grad():
        out = model.generate(ids, max_new_tokens=n_steps, do_sample=False,
                             temperature=None, top_p=None, top_k=None)
    return out[0, len(prompt_ids):].tolist()


def run_ours(m, prompts, n_steps, chunked=False, chunk=4):
    reqs = []
    for i, p in enumerate(prompts):
        r = Request(RawRequest("", n_steps))
        r.set_prompt_token_ids(list(p))
        r.seq_id = i
        reqs.append(r)

    def apply(tokens, rows):
        for i, s in enumerate(rows):
            if s is None:
                continue
            if s.samples_token:
                s.request.output_token_ids.append(int(tokens[i]))
            s.request.num_cached_tokens += s.n_tokens

    # prefill (whole or chunked)
    if chunked:
        while any(r.is_prefill_stage() for r in reqs):
            sched = []
            for r in reqs:
                if r.num_uncached_tokens() > 0:
                    sched.append(ScheduledSeq(r, min(chunk, r.num_uncached_tokens())))
            tokens, rows = m.forward(sched)
            apply(tokens, rows)
    else:
        tokens, rows = m.forward([ScheduledSeq(r, r.prompt_len) for r in reqs])
        apply(tokens, rows)

    while any(not r.is_finished() for r in reqs):
        sched = [ScheduledSeq(r, 1) for r in reqs if not r.is_finished()]
        tokens, rows = m.forward(sched)
        apply(tokens, rows)
    return [r.output_token_ids for r in reqs]


PROMPTS = [[1, 5, 9, 13, 2, 7], [1, 99, 42, 17], [1, 3, 3, 7, 100, 101, 55, 23, 11]]


def test_greedy_tokens_match_hf(tiny_ckpt):
    path, hf_model, _ = tiny_ckpt
    m = make_model(path)
    ours = run_ours(m, PROMPTS, 8)
    for p, o in zip(PROMPTS, ours):
        assert o == hf_greedy(hf_model, p, 8), f"prompt {p}: {o}"


def test_prefill_logits_match_hf(tiny_ckpt):
    import torch
    path, hf_model, _ = tiny_ckpt
    m = make_model(path)
    p = PROMPTS[0]
    r = Request(RawRequest("", 1))
    r.set_prompt_token_ids(list(p))
    r.seq_id = 0
    tokens, rows, logits = m.forward([ScheduledSeq(r, len(p))], return_logits=True)
    with torch.no_grad():
        hf_logits = hf_model(torch.tensor([p])).logits[0, -1].numpy()
    got = logits[0][: len(hf_logits)]
    np.testing.assert_allclose(got, hf_logits, atol=2e-4, rtol=2e-3)


def test_chunked_prefill_matches_whole(tiny_ckpt):
    path, hf_model, _ = tiny_ckpt
    m = make_model(path)
    ours = run_ours(m, PROMPTS, 6, chunked=True, chunk=4)
    for p, o in zip(PROMPTS, ours):
        assert o == hf_greedy(hf_model, p, 6), f"prompt {p}: {o}"


@pytest.mark.parametrize("tp", [2, 4])
def test_tensor_parallel_matches(tiny_ckpt, tp):
    path, hf_model, _ = tiny_ckpt
    m = make_model(path, tp=tp)
    ours = run_ours(m, PROMPTS[:2], 6)
    for p, o in zip(PROMPTS[:2], ours):
        assert o == hf_greedy(hf_model, p, 6), f"tp={tp} prompt {p}: {o}"


def test_data_parallel_matches(tiny_ckpt):
    path, hf_model, _ = tiny_ckpt
    m = make_model(path, dp=2)
    reqs = []
    for i, p in enumerate(PROMPTS[:2]):
        r = Request(RawRequest("", 6))
        r.set_prompt_token_ids(list(p))
        r.seq_id = i
        reqs.append(r)

    def step(groups):
        sched = [s for g in groups for s in g]
        tokens, rows = m.forward(sched, groups=groups)
        for i, s in enumerate(rows):
            if s is None:
                continue
            if s.samples_token:
                s.request.output_token_ids.append(int(tokens[i]))
            s.request.num_cached_tokens += s.n_tokens

    # each request pinned to its own dp group
    step([[ScheduledSeq(reqs[0], reqs[0].prompt_len)],
          [ScheduledSeq(reqs[1], reqs[1].prompt_len)]])
    for _ in range(5):
        step([[ScheduledSeq(reqs[0], 1)], [ScheduledSeq(reqs[1], 1)]])
    for p, r in zip(PROMPTS[:2], reqs):
        assert r.output_token_ids == hf_greedy(hf_model, p, 6)


def test_swap_out_in_preserves_generation(tiny_ckpt):
    path, hf_model, _ = tiny_ckpt
    m = make_model(path)
    p = PROMPTS[0]
    r = Request(RawRequest("", 8))
    r.set_prompt_token_ids(list(p))
    r.seq_id = 0

    def apply(tokens, rows):
        for i, s in enumerate(rows):
            if s is not None and s.samples_token:
                s.request.output_token_ids.append(int(tokens[i]))
                s.request.num_cached_tokens += s.n_tokens

    tokens, rows = m.forward([ScheduledSeq(r, r.prompt_len)])
    apply(tokens, rows)
    for i in range(7):
        if i == 3:   # swap the sequence out and straight back in mid-generation
            m.swap_out_seqs([r])
            m.swap_in_seqs([r])
        tokens, rows = m.forward([ScheduledSeq(r, 1)])
        apply(tokens, rows)
    assert r.output_token_ids == hf_greedy(hf_model, p, 8)


@pytest.fixture(scope="module")
def llama3_ckpt(tmp_path_factory):
    """Tiny model with llama3-style rope scaling + tied embeddings (the
    reference's 'llama3.2' special-casing, weight.py:157-213)."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    path = tmp_path_factory.mktemp("tiny_llama3")
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5, rope_theta=50000.0,
        tie_word_embeddings=True,
        rope_scaling={"rope_type": "llama3", "factor": 2.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 128})
    torch.manual_seed(1)
    model = LlamaForCausalLM(cfg).eval()
    model.save_pretrained(path, safe_serialization=True)
    return str(path), model, cfg


def test_llama3_rope_and_tied_embeddings_match_hf(llama3_ckpt):
    path, hf, cfg = llama3_ckpt
    m = make_model(path)
    prompt = [(7 * i + 3) % 128 for i in range(20)]
    want = hf_greedy(hf, prompt, 8)

    r = Request(RawRequest("", 8))
    r.set_prompt_token_ids(list(prompt))
    r.seq_id = 0
    sched = [ScheduledSeq(r, len(prompt))]
    got = []
    for _ in range(8):
        tokens, rows = m.forward(sched)
        tok = int(tokens[0])
        got.append(tok)
        r.output_token_ids.append(tok)
        r.num_cached_tokens += sched[0].n_tokens
        sched = [ScheduledSeq(r, 1)]
    assert got == want
