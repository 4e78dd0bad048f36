"""Engine-level multi-step decode (config.multi_step_decode).

The scheduler qualifies pure-decode steps for S-chained execution in one
program (scheduler._multi_step_for); the engine advances counts by S at
dispatch and resolves S token values per row. Outputs must be identical to
single-step serving — multi-step only changes how many tokens each dispatch
carries (reference decodes strictly 1 token/step, swiftllm/server/engine.py).
"""

import asyncio

from swiftllm_tpu.server.structs import RawRequest

from test_engine import make_engine, run_engine, tiny_engine_config, tiny_model_config


def _serve(ec=None, mc=None, requests=(), timeout=120):
    """Run a list of RawRequests through a fresh engine; returns
    (engine, [(req, token_ids), ...]) in submission order."""
    async def body():
        engine = make_engine(ec, mc)
        await engine.initialize(tokenizer_backend="inline")

        async def clients():
            return await asyncio.gather(
                *[engine.add_request_and_wait(r) for r in requests])

        outs = await run_engine(engine, clients(), timeout)
        return engine, outs
    return asyncio.run(body())


def _reqs(lens=(8, 10, 3), temperature=0.0):
    return [RawRequest("", n, temperature=temperature, seed=123 + i,
                       prompt_token_ids=[(i * 11 + j) % 256 for j in range(12)])
            for i, n in enumerate(lens)]


def test_engine_multi_step_matches_single_greedy():
    # Output lens deliberately not multiples of S: rows with < S budget left
    # force the scheduler back to single steps for the tail.
    _, base = _serve(tiny_engine_config(), requests=_reqs())
    eng, ms = _serve(tiny_engine_config(multi_step_decode=4), requests=_reqs())
    for (_, a), (_, b) in zip(base, ms):
        assert a == b, "multi-step decode changed greedy output"
    # Amortization evidence: fewer dispatches than tokens generated.
    assert eng.stats.num_steps < eng.stats.num_tokens_generated


def test_engine_multi_step_matches_single_sampled():
    _, base = _serve(tiny_engine_config(),
                     requests=_reqs(lens=(8, 8, 8), temperature=0.8))
    _, ms = _serve(tiny_engine_config(multi_step_decode=4),
                   requests=_reqs(lens=(8, 8, 8), temperature=0.8))
    for (_, a), (_, b) in zip(base, ms):
        assert a == b, "multi-step decode changed seeded-sampling output"


def test_engine_multi_step_eos_mid_span():
    # Learn the dummy model's second output token, declare it EOS, and check
    # the multi-step engine truncates mid-span exactly like single-step.
    reqs = lambda: [RawRequest("", 8, prompt_token_ids=list(range(5)))]
    _, outs = _serve(mc=tiny_model_config(eos_token_id=None), requests=reqs())
    full = outs[0][1]
    eos = full[1]

    mc = tiny_model_config(eos_token_id=eos)
    _, outs = _serve(tiny_engine_config(multi_step_decode=4), mc,
                     requests=reqs())
    req, got = outs[0]
    assert req.stopped_on_eos
    assert got == full[:2]


def test_engine_multi_step_page_pressure_falls_back():
    # Pool too small to cover S extra tokens per row: the scheduler must fall
    # back to single steps (never crash the allocator) and still finish.
    ec = tiny_engine_config(multi_step_decode=4, num_hbm_blocks=6,
                            num_cpu_blocks=16, max_blocks_per_seq=4,
                            block_size=16)
    reqs = [RawRequest("", 16, prompt_token_ids=[(i * 7 + j) % 256
                                                 for j in range(30)])
            for i in range(3)]
    base_ec = tiny_engine_config(num_hbm_blocks=6, num_cpu_blocks=16,
                                 max_blocks_per_seq=4, block_size=16)
    _, base = _serve(base_ec, requests=reqs)
    _, ms = _serve(ec, requests=reqs)
    for (_, a), (_, b) in zip(base, ms):
        assert a == b
