"""Acceptance-adaptive speculative decoding (scheduler policy).

A spec step costs a pipeline flush (drafting needs resolved token values), so
the scheduler scales each request's draft budget to its REALIZED acceptance
and suppresses drafting (with periodic probes) for requests whose drafts keep
missing. Policy unit tests + an engine e2e losslessness check with the
adaptive path active. (Capability delta vs the reference, which is strictly
one token per step — swiftllm/server/engine.py:16-181.)
"""

import tests.conftest  # noqa: F401

from swiftllm_tpu.config import EngineConfig, LlamaModelConfig
from swiftllm_tpu.server.scheduler import Scheduler
from swiftllm_tpu.server.structs import RawRequest, Request


def _sched(**kw):
    mc = LlamaModelConfig(num_layers=1, num_q_heads=2, num_kv_heads=1,
                          hidden_size=32, head_dim=16, ffn_inter_dim=64,
                          vocab_size=64, max_position_embeddings=512,
                          rms_norm_eps=1e-5)
    ec = EngineConfig(model_path="", use_dummy=True, block_size=16,
                      num_hbm_blocks=32, num_cpu_blocks=0,
                      max_batch_size=4, max_tokens_in_batch=256,
                      enable_spec_decode=True, spec_k=4, **kw)
    return Scheduler(mc, ec, num_hbm_blocks=32)


def _req():
    r = Request(RawRequest("", 64))
    r.set_prompt_token_ids([1] * 8)
    return r


def test_optimistic_until_history():
    s = _sched()
    r = _req()
    assert s._adaptive_spec_cap(r) == 4        # no history → full budget
    r.spec_drafted, r.spec_accepted = 7, 0     # still under 2*spec_k
    assert s._adaptive_spec_cap(r) == 4


def test_budget_scales_with_acceptance():
    s = _sched()
    r = _req()
    r.spec_drafted, r.spec_accepted = 20, 20   # perfect acceptance
    assert s._adaptive_spec_cap(r) == 4
    r.spec_drafted, r.spec_accepted = 20, 10   # 50%
    assert s._adaptive_spec_cap(r) == 2
    r.spec_drafted, r.spec_accepted = 20, 9    # 45% (>= min 0.4) → ceil(1.8)
    assert s._adaptive_spec_cap(r) == 2


def test_low_acceptance_suppresses_with_probes():
    s = _sched(spec_probe_interval=8)
    r = _req()
    r.spec_drafted, r.spec_accepted = 20, 2    # 10% — below the 0.4 floor
    caps = [s._adaptive_spec_cap(r) for _ in range(16)]
    assert caps.count(0) == 14                 # suppressed almost always
    assert caps.count(2) == 2                  # probes at every 8th try
    # each probe halved the history, so a few probes fully rehabilitate
    assert r.spec_drafted < 20


def test_probe_recovery_after_regime_change():
    s = _sched(spec_probe_interval=4)
    r = _req()
    r.spec_drafted, r.spec_accepted = 32, 0    # hopeless text so far
    # simulate: every probe's drafts now ACCEPT (text turned repetitive)
    for _ in range(64):
        cap = s._adaptive_spec_cap(r)
        if cap > 0:
            r.spec_drafted += cap
            r.spec_accepted += cap             # full acceptance from now on
        if r.spec_drafted and r.spec_accepted / r.spec_drafted >= 0.4:
            break
    assert s._adaptive_spec_cap(r) >= 1        # drafting re-enabled


def test_adaptive_engine_lossless_and_saves_wasted_drafts(monkeypatch):
    """End-to-end through the engine with oracle drafts (the forced-accept /
    forced-reject pattern from test_spec_decode): adaptive drafting must stay
    lossless, keep full-budget drafting when acceptance is 100%, and draft
    LESS than the static policy when acceptance is 0% (suppression)."""
    import swiftllm_tpu.server.spec as spec_mod
    from tests.test_spec_decode import (_generate_all, _oracle_propose,
                                        _spec_cfg, tiny_engine_config)
    plain, _ = _generate_all(tiny_engine_config(), n_out=24)

    # 100% acceptance: adaptive keeps the full budget (no suppression).
    monkeypatch.setattr(spec_mod, "propose", _oracle_propose(plain, 0))
    accept, st_a = _generate_all(_spec_cfg(), n_out=24)
    assert accept == plain
    assert st_a["num_spec_accepted"] == st_a["num_spec_drafted"] > 0

    # 0% acceptance: adaptive suppresses after 2*spec_k history; static keeps
    # wasting a verify step on every token.
    monkeypatch.setattr(spec_mod, "propose", _oracle_propose(plain, 1))
    rej_static, st_s = _generate_all(
        _spec_cfg(spec_adaptive=False), n_out=24)
    monkeypatch.setattr(spec_mod, "propose", _oracle_propose(plain, 1))
    rej_adapt, st_d = _generate_all(
        _spec_cfg(spec_probe_interval=8), n_out=24)
    assert rej_static == plain and rej_adapt == plain   # lossless either way
    assert st_d["num_spec_drafted"] < st_s["num_spec_drafted"] // 2
