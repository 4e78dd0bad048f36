"""Automatic prefix caching (beyond the reference — swiftllm has none).

Block-manager level: radix match/register, refcounts, LRU retire/revive/evict,
and leak-freedom. Engine level: identical outputs with caching on vs off, and
the second same-prefix request actually SHARES the first one's pages. Golden
level: cached-prefix generation still matches HF greedy exactly.
"""

import asyncio

import numpy as np
import pytest

import tests.conftest  # noqa: F401

from swiftllm_tpu.worker.block_manager import BlockManager

PS = 4  # block size for the unit tests


def mk(num_blocks=16, **kw):
    return BlockManager("hbm0", num_blocks, PS, max_seqs=8,
                        max_blocks_per_seq=8, enable_prefix_caching=True, **kw)


def toks(n, base=0):
    return [base + i for i in range(n)]


def test_match_register_roundtrip():
    m = mk()
    prompt = toks(11)   # 2 full pages + tail
    m.allocate_for_seq(0, 11)
    m.register_prefix(0, prompt, 11)
    # A new seq with the same prompt matches the 2 full pages.
    got = m.match_prefix(1, prompt)
    assert got == 2 * PS
    assert m.seq_block_ids(1).tolist() == m.seq_block_ids(0)[:2].tolist()
    # Divergent second page: only the first page matches.
    other = prompt[:PS] + [99] * 7
    got = m.match_prefix(2, other)
    assert got == PS
    assert m.seq_block_ids(2).tolist() == m.seq_block_ids(0)[:1].tolist()


def test_never_matches_whole_prompt():
    m = mk()
    prompt = toks(2 * PS)   # exactly 2 pages
    m.allocate_for_seq(0, len(prompt))
    m.register_prefix(0, prompt, len(prompt))
    # At least one token must remain for prefill: only page 1 matches.
    assert m.match_prefix(1, prompt) == PS


def test_refcounts_and_leak_freedom():
    m = mk()
    free0 = m.num_free_blocks
    prompt = toks(9)
    m.allocate_for_seq(0, 9)
    m.register_prefix(0, prompt, 9)
    m.match_prefix(1, prompt)
    shared = m.seq_block_ids(1).tolist()
    m.free_seq(0)          # seq 1 still holds the shared pages
    m.match_prefix(2, prompt)
    assert m.seq_block_ids(2).tolist() == shared
    m.free_seq(1)
    m.free_seq(2)
    # Retired pages stay matchable but count as free.
    assert m.num_free_blocks == free0
    assert m.match_prefix(3, prompt) == 2 * PS   # revived from the LRU
    m.free_seq(3)
    assert m.num_free_blocks == free0


def test_eviction_invalidates_descendants():
    m = mk(num_blocks=4)
    prompt = toks(3 * PS + 1)   # 3 full pages
    m.allocate_for_seq(0, len(prompt))
    m.register_prefix(0, prompt, len(prompt))
    m.free_seq(0)   # all 4 pages retired/free, 3 matchable
    # Exhaust the free stack, forcing eviction of the oldest retired page.
    m.allocate_for_seq(1, 4 * PS)
    # The evicted chain must no longer match (no stale-page matches).
    m.free_seq(1)
    got = m.match_prefix(2, prompt)
    assert got == 0
    m.free_seq(2)
    assert m.num_free_blocks == 4


def test_engine_prefix_caching_shares_and_matches_uncached():
    from tests.test_engine import (make_engine, run_engine,
                                   tiny_engine_config, tiny_model_config)
    from swiftllm_tpu.server.structs import RawRequest

    prompt = "the quick brown fox jumps over the lazy dog " * 3

    async def run_with(enable):
        engine = make_engine(
            tiny_engine_config(enable_prefix_caching=enable))
        await engine.initialize(tokenizer_backend="inline")

        async def clients():
            out1 = await engine.add_request_and_wait(RawRequest(prompt, 6))
            out2 = await engine.add_request_and_wait(RawRequest(prompt, 6))
            out3 = await engine.add_request_and_wait(
                RawRequest(prompt + " tail", 6))
            return out1[1], out2[1], out3[1], engine

        return await run_engine(engine, clients())

    async def body():
        t1, t2, t3, eng_on = await run_with(True)
        u1, u2, u3, eng_off = await run_with(False)
        assert t1 == u1 and t2 == u2 and t3 == u3
        # The cached run actually shared pages: the manager's prefix map is
        # populated and fewer prompt tokens were prefilled for requests 2/3.
        assert eng_on.model.hbm_block_mgrs[0]._prefix_map
        assert (eng_on.stats.num_prompt_tokens
                < eng_off.stats.num_prompt_tokens)

    asyncio.run(body())


def test_recompute_preemption_rides_prefix_cache():
    # Preempt-by-recompute victims re-prefill on re-admission; with prefix
    # caching on, their full prompt pages are usually still resident, so the
    # re-prefill matches them instead of recomputing. Outputs must equal an
    # unpreempted run either way.
    from tests.test_engine import (make_engine, run_engine,
                                   tiny_engine_config)
    from swiftllm_tpu.server.structs import RawRequest

    async def run_with(**cfg):
        engine = make_engine(tiny_engine_config(
            prefill_chunk_size=16, max_tokens_in_batch=64, **cfg))
        await engine.initialize(tokenizer_backend="inline")

        async def clients():
            return await asyncio.gather(*[
                engine.add_request_and_wait(
                    RawRequest("", 40, prompt_token_ids=[(i + j) % 256
                                                         for j in range(40)]))
                for i in range(2)])

        outs = await run_engine(engine, clients(), timeout=300)
        return [t for _, t in outs], engine

    async def body():
        tight, eng = await run_with(num_hbm_blocks=8, max_blocks_per_seq=8,
                                    preemption_mode="recompute",
                                    enable_prefix_caching=True)
        assert eng.stats.num_preemptions >= 1
        roomy, eng2 = await run_with(enable_prefix_caching=True)
        assert eng2.stats.num_preemptions == 0
        assert tight == roomy
    asyncio.run(body())


def test_prefix_caching_matches_hf_golden(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from tests.test_llama_golden import hf_greedy, make_model, run_ours

    path = tmp_path_factory.mktemp("tiny_llama_apc")
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5)
    torch.manual_seed(3)
    hf = LlamaForCausalLM(cfg).eval()
    hf.save_pretrained(path, safe_serialization=True)

    m = make_model(str(path), enable_prefix_caching=True)
    prompt = [1, 7, 3, 9, 11, 5, 2, 8, 6, 4]
    # First pass populates the cache (via the builder's register hook).
    first = run_ours(m, [prompt], 5)[0]
    assert first == hf_greedy(hf, prompt, 5)
    # Second pass: match the cached pages by hand (run_ours drives the model
    # directly, bypassing the scheduler hook), then generate from the tail.
    from swiftllm_tpu.server.scheduler import ScheduledSeq
    from swiftllm_tpu.server.structs import RawRequest, Request
    r = Request(RawRequest("", 5))
    r.set_prompt_token_ids(list(prompt))
    r.seq_id = 1
    matched = m.match_prefix(r)
    assert matched == 8   # (10-1)//4 = 2 full pages at block_size 4
    outs = []

    def apply(tokens, rows):
        for i, s in enumerate(rows):
            if s is None:
                continue
            if s.samples_token:   # evaluate BEFORE mutating num_cached_tokens
                outs.append(int(tokens[i]))
                s.request.output_token_ids.append(int(tokens[i]))
            s.request.num_cached_tokens += s.n_tokens

    apply(*m.forward([ScheduledSeq(r, r.num_uncached_tokens())]))
    while len(outs) < 5:
        apply(*m.forward([ScheduledSeq(r, 1)]))
    assert outs == first
