"""Speculative decoding (prompt-lookup drafts + in-step verification).

The property under test is LOSSLESSNESS: greedy output with speculation on is
bit-identical to plain greedy decoding — speculation may only change how many
tokens each step confirms. (The reference has no speculative decoding; its
engine emits strictly one token per step, swiftllm/server/engine.py:110-181.)
"""

import asyncio

import numpy as np
import pytest

import tests.conftest  # noqa: F401

from swiftllm_tpu.config import EngineConfig, LlamaModelConfig
from swiftllm_tpu.server.engine import Engine
from swiftllm_tpu.server.spec import SpecState, propose, sync_state
from swiftllm_tpu.server.structs import RawRequest

from tests.test_engine import (run_engine, tiny_engine_config,
                               tiny_model_config)


# --------------------------- draft proposer unit tests ---------------------------

def test_propose_basic_repeat():
    toks = np.array([1, 2, 3, 9, 1, 2, 3], np.int32)
    # suffix 3-gram [1,2,3] matched at pos 0 → continuation [9, 1, 2, 3][:k]
    assert propose(toks, k=2, ngram_max=3, ngram_min=2) == [9, 1]


def test_propose_prefers_longest_ngram():
    # 2-gram [2,3] occurs at 1 (→4) and via 3-gram [1,2,3] at 0 (→9): the
    # 3-gram match wins even though a 2-gram match exists elsewhere.
    toks = np.array([1, 2, 3, 9, 8, 2, 3, 4, 1, 2, 3], np.int32)
    assert propose(toks, k=1, ngram_max=3, ngram_min=2) == [9]


def test_propose_most_recent_occurrence():
    toks = np.array([5, 6, 1, 5, 6, 2, 5, 6], np.int32)
    # 2-gram [5,6]: occurrences at 0 (→1) and 3 (→2); most recent wins.
    assert propose(toks, k=1, ngram_max=2, ngram_min=2) == [2]


def test_propose_no_match():
    toks = np.array([1, 2, 3, 4, 5], np.int32)
    assert propose(toks, k=4, ngram_max=3, ngram_min=2) == []


def test_propose_short_context():
    assert propose(np.array([7], np.int32), k=4) == []
    assert propose(np.array([], np.int32), k=4) == []


def test_spec_state_growth_and_sync():
    st = SpecState(capacity=4)
    st.extend([1, 2, 3])
    st.extend([4, 5, 6, 7, 8])        # forces regrow
    assert st.view().tolist() == [1, 2, 3, 4, 5, 6, 7, 8]

    class R:
        prompt_len = 3
        prompt_token_ids = [9, 8, 7]
        output_token_ids = [1, None]
    r = R()
    assert sync_state(r) is None       # unresolved value → no drafting
    r.output_token_ids = [1, 2]
    st = sync_state(r)
    assert st is not None and st.view().tolist() == [9, 8, 7, 1, 2]


# --------------------------- end-to-end losslessness ---------------------------

def _spec_cfg(**kw):
    return tiny_engine_config(enable_spec_decode=True, spec_k=3,
                              spec_ngram_max=3, spec_ngram_min=2, **kw)


REP_PROMPTS = [
    [5, 6, 7, 5, 6, 7, 5, 6],          # strongly periodic → drafts accept
    [1, 2, 3, 4, 9, 9, 1, 2, 3],
    [42] * 12,
    [3, 1, 4, 1, 5, 9, 2, 6],          # aperiodic → drafts mostly miss
]


def _generate_all(ec, n_out=12):
    async def body():
        engine = Engine(ec, tiny_model_config())
        await engine.initialize(tokenizer_backend="inline")

        async def clients():
            outs = await asyncio.gather(*[
                engine.add_request_and_wait(
                    RawRequest("", n_out, prompt_token_ids=list(p)))
                for p in REP_PROMPTS])
            return [toks for _, toks in outs], engine.stats.snapshot()

        return await run_engine(engine, clients())
    return asyncio.run(body())


def test_spec_matches_plain_greedy():
    plain, _ = _generate_all(tiny_engine_config())
    spec, stats = _generate_all(_spec_cfg())
    for p, a, b in zip(REP_PROMPTS, plain, spec):
        assert a == b, f"prompt {p}: plain {a} vs spec {b}"
        assert len(a) == 12
    assert 0 <= stats["num_spec_accepted"] <= stats["num_spec_drafted"]


def _oracle_propose(plain_outputs, offset=0):
    """A proposer that continues any context it recognizes with the true
    (plain-greedy) continuation shifted by `offset` — offset 0 → drafts always
    accept; non-zero → always reject (it can never equal the greedy argmax)."""
    seqs = [list(p) + list(o) for p, o in zip(REP_PROMPTS, plain_outputs)]

    def fake(tokens, k, ngram_max=3, ngram_min=2):
        ctx = tokens.tolist()
        for s in seqs:
            if len(ctx) < len(s) and s[: len(ctx)] == ctx:
                cont = s[len(ctx) : len(ctx) + k]
                return [(t + offset) % 256 for t in cont]
        return []

    return fake


@pytest.mark.parametrize("offset", [0, 1])
def test_spec_forced_accept_and_reject(offset, monkeypatch):
    plain, plain_stats = _generate_all(tiny_engine_config())
    import swiftllm_tpu.server.spec as spec_mod
    monkeypatch.setattr(spec_mod, "propose", _oracle_propose(plain, offset))
    spec, stats = _generate_all(_spec_cfg())
    assert spec == plain                      # lossless either way
    assert stats["num_spec_drafted"] > 0      # the machinery really ran
    if offset == 0:
        # Every draft matches the greedy continuation → full acceptance,
        # and multi-token steps must beat one-token-per-step decoding.
        assert stats["num_spec_accepted"] == stats["num_spec_drafted"]
        assert stats["num_steps"] < plain_stats["num_steps"]
    else:
        # Shifted drafts can never equal the argmax → zero acceptance, but
        # every step still confirms its one real token.
        assert stats["num_spec_accepted"] == 0


def test_spec_respects_output_len():
    outs, _ = _generate_all(_spec_cfg(), n_out=5)
    for toks in outs:
        assert len(toks) == 5


def test_spec_with_sampled_rows_mixed():
    """temperature>0 rows never draft but may share steps with spec rows;
    greedy rows stay lossless."""
    async def body():
        engine = Engine(_spec_cfg(), tiny_model_config())
        await engine.initialize(tokenizer_backend="inline")

        async def clients():
            greedy = engine.add_request_and_wait(
                RawRequest("", 10, prompt_token_ids=[5, 6, 7, 5, 6, 7, 5, 6]))
            sampled = engine.add_request_and_wait(
                RawRequest("", 10, prompt_token_ids=[8, 1, 8, 1, 8],
                           temperature=0.8, seed=7))
            return await asyncio.gather(greedy, sampled)

        return await run_engine(engine, clients())

    (r_g, toks_g), (r_s, toks_s) = asyncio.run(body())
    assert len(toks_g) == 10 and len(toks_s) == 10
    plain, _ = _generate_all(tiny_engine_config())
    # greedy request matches the plain-greedy run of the same prompt
    assert toks_g == plain[0][:10]


def test_spec_with_prefix_caching():
    plain, _ = _generate_all(tiny_engine_config(enable_prefix_caching=True))
    spec, _ = _generate_all(_spec_cfg(enable_prefix_caching=True))
    assert plain == spec


def test_spec_under_page_pressure():
    """Tiny pool: drafting must never over-allocate; outputs stay lossless."""
    ec_kw = dict(num_hbm_blocks=10, num_cpu_blocks=0, max_batch_size=4,
                 preemption_mode="recompute")
    plain, _ = _generate_all(tiny_engine_config(**ec_kw))
    spec, _ = _generate_all(_spec_cfg(**ec_kw))
    assert plain == spec


def test_spec_warmup_compiles_spec_buckets():
    """Engine warmup with spec enabled drives the span-head bucket(s) so the
    first real spec step hits a warm program."""
    async def body():
        engine = Engine(_spec_cfg(spec_max_rows=2), tiny_model_config())
        await engine.initialize(tokenizer_backend="inline")
        await engine.warmup()
        keys = {k[0] for k in engine.model._step_fns}
        assert any(k.spec for k in keys), f"no spec bucket warmed: {keys}"

        async def client():
            return await engine.add_request_and_wait(
                RawRequest("", 6, prompt_token_ids=[5, 6, 7, 5, 6, 7]))

        _, toks = await run_engine(engine, client())
        assert len(toks) == 6
    asyncio.run(body())
