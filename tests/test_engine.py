"""End-to-end engine tests on the CPU backend with dummy weights.

Covers the reference's online lifecycle (SURVEY.md §3.2): submit → tokenize →
schedule → step → stream/finish, plus chunked prefill, EOS stop, preemptive
swap-out/in under page pressure, and abort.
"""

import asyncio

import pytest

from swiftllm_tpu.config import EngineConfig, LlamaModelConfig
from swiftllm_tpu.server.engine import Engine
from swiftllm_tpu.server.structs import RawRequest


def tiny_model_config(**kw):
    d = dict(num_layers=2, num_q_heads=4, num_kv_heads=2, hidden_size=64,
             head_dim=16, ffn_inter_dim=128, vocab_size=256,
             max_position_embeddings=2048, rms_norm_eps=1e-5)
    d.update(kw)
    return LlamaModelConfig(**d)


def tiny_engine_config(**kw):
    d = dict(model_path="", use_dummy=True, block_size=16, num_hbm_blocks=64,
             num_cpu_blocks=64, max_blocks_per_seq=16, max_batch_size=8,
             max_tokens_in_batch=128, prefill_chunk_size=32,
             max_seqs_in_block_table=32, use_pallas=False)
    d.update(kw)
    return EngineConfig(**d)


async def run_engine(engine, coro, timeout=120):
    loops = asyncio.create_task(engine.start_all_event_loops())
    try:
        return await asyncio.wait_for(coro, timeout)
    finally:
        loops.cancel()


def make_engine(ec=None, mc=None):
    engine = Engine(ec or tiny_engine_config(), mc or tiny_model_config())
    return engine


def test_engine_basic_completion():
    async def body():
        engine = make_engine()
        await engine.initialize(tokenizer_backend="inline")

        async def clients():
            outs = await asyncio.gather(*[
                engine.add_request_and_wait(RawRequest(f"hello world {i} foo bar", 8))
                for i in range(4)])
            return outs

        outs = await run_engine(engine, clients())
        for req, token_ids in outs:
            assert len(token_ids) == 8
            assert req.is_finished()
            assert all(0 <= t < 256 for t in token_ids)
        assert engine.stats.num_requests_finished == 4
    asyncio.run(body())


def test_engine_streaming_and_determinism():
    async def body():
        engine = make_engine()
        await engine.initialize(tokenizer_backend="inline")
        prompt_ids = list(range(10, 30))

        async def stream_once():
            toks = []
            async for so in engine.add_request_and_stream(
                    RawRequest("", 6, prompt_token_ids=prompt_ids)):
                toks.append(so.token_id)
            return toks

        a = await run_engine(engine, stream_once())
        loops = asyncio.create_task(engine.start_all_event_loops())
        b = await asyncio.wait_for(stream_once(), 120)
        loops.cancel()
        assert len(a) == 6
        assert a == b, "greedy decode must be deterministic across runs"
    asyncio.run(body())


def test_engine_chunked_prefill_long_prompt():
    async def body():
        # prompt longer than prefill_chunk_size forces multi-step prefill
        ec = tiny_engine_config(prefill_chunk_size=16, max_tokens_in_batch=32)
        engine = make_engine(ec)
        await engine.initialize(tokenizer_backend="inline")
        prompt_ids = [(i * 7) % 256 for i in range(70)]
        req, out = await run_engine(
            engine, engine.add_request_and_wait(
                RawRequest("", 5, prompt_token_ids=prompt_ids)))
        assert len(out) == 5
        assert req.num_cached_tokens == 70 + 4   # all but the last sampled token
    asyncio.run(body())


def test_engine_eos_stop():
    async def body():
        mc = tiny_model_config(eos_token_id=None)
        engine = make_engine(mc=mc)
        await engine.initialize(tokenizer_backend="inline")
        # First run one request to learn what token the dummy model emits,
        # then declare that token EOS and check early stop.
        req, out = await run_engine(
            engine, engine.add_request_and_wait(
                RawRequest("", 8, prompt_token_ids=list(range(5)))))
        eos = out[1]

        mc2 = tiny_model_config(eos_token_id=eos)
        engine2 = make_engine(mc=mc2)
        await engine2.initialize(tokenizer_backend="inline")
        req2, out2 = await run_engine(
            engine2, engine2.add_request_and_wait(
                RawRequest("", 8, prompt_token_ids=list(range(5)))))
        assert req2.stopped_on_eos
        assert len(out2) == 2
        assert out2 == out[:2]
    asyncio.run(body())


def test_engine_preemption_swap():
    async def body():
        # Tiny page pool: 8 pages, two long-output requests each eventually
        # needing >4 pages ⇒ the FCFS tail must be preempted to CPU and resumed.
        ec = tiny_engine_config(num_hbm_blocks=8, num_cpu_blocks=16,
                                max_blocks_per_seq=8, prefill_chunk_size=16,
                                max_tokens_in_batch=64)
        engine = make_engine(ec)
        await engine.initialize(tokenizer_backend="inline")

        async def clients():
            return await asyncio.gather(*[
                engine.add_request_and_wait(
                    RawRequest("", 40, prompt_token_ids=[(i + j) % 256
                                                         for j in range(40)]))
                for i in range(2)])

        outs = await run_engine(engine, clients(), timeout=300)
        for req, token_ids in outs:
            assert len(token_ids) == 40
        assert engine.stats.num_preemptions >= 1, \
            "page pressure should have forced at least one swap-out"
    asyncio.run(body())


@pytest.mark.parametrize("mode_cfg", [dict(preemption_mode="recompute"),
                                      dict(num_cpu_blocks=0)])
def test_engine_preemption_recompute(mode_cfg):
    # Same page pressure as the swap test, but victims free their pages and
    # re-prefill prompt+generated on re-admission — no host offload at all.
    # num_cpu_blocks=0 must force the same behavior (there is no swap space).
    async def body():
        ec = tiny_engine_config(num_hbm_blocks=8, max_blocks_per_seq=8,
                                prefill_chunk_size=16, max_tokens_in_batch=64,
                                **mode_cfg)
        engine = make_engine(ec)
        await engine.initialize(tokenizer_backend="inline")

        async def clients():
            return await asyncio.gather(*[
                engine.add_request_and_wait(
                    RawRequest("", 40, prompt_token_ids=[(i + j) % 256
                                                         for j in range(40)]))
                for i in range(2)])

        outs = await run_engine(engine, clients(), timeout=300)
        for req, token_ids in outs:
            assert len(token_ids) == 40
        assert engine.stats.num_preemptions >= 1

        # Determinism: a roomy engine (no preemption) yields the same tokens.
        engine2 = make_engine(tiny_engine_config(prefill_chunk_size=16,
                                                 max_tokens_in_batch=64))
        await engine2.initialize(tokenizer_backend="inline")

        async def clients2():
            return await asyncio.gather(*[
                engine2.add_request_and_wait(
                    RawRequest("", 40, prompt_token_ids=[(i + j) % 256
                                                         for j in range(40)]))
                for i in range(2)])

        outs2 = await run_engine(engine2, clients2(), timeout=300)
        assert engine2.stats.num_preemptions == 0
        assert [t for _, t in outs] == [t for _, t in outs2]
    asyncio.run(body())


def test_engine_abort():
    async def body():
        engine = make_engine()
        await engine.initialize(tokenizer_backend="inline")

        async def client():
            gen = engine.add_request_and_stream(
                RawRequest("", 200, prompt_token_ids=list(range(8))))
            req = None
            async for so in gen:
                req = so.request
                if len(req.output_token_ids) >= 3:
                    engine.abort_request(req)
                    break
            await asyncio.wait_for(req.finished_event.wait(), 60)
            return req

        req = await run_engine(engine, client())
        assert req.aborted and req.is_finished()
        # all pages must have been released
        mgr = engine.model.hbm_block_mgrs[0]
        assert mgr.num_free_blocks == mgr.num_blocks
    asyncio.run(body())


def test_engine_dummy_tokenizer_path():
    async def body():
        engine = make_engine()
        await engine.initialize(tokenizer_backend="inline")
        req, out = await run_engine(
            engine, engine.add_request_and_wait(RawRequest("a b c d", 4)))
        assert req.prompt_len == 4   # whitespace dummy tokenizer
        assert len(out) == 4
    asyncio.run(body())


def test_engine_rejects_overlong_request():
    async def body():
        ec = tiny_engine_config(max_blocks_per_seq=4)   # 64-token sequences max
        engine = make_engine(ec)
        await engine.initialize(tokenizer_backend="inline")

        async def client():
            req, out = await engine.add_request_and_wait(
                RawRequest("", 60, prompt_token_ids=list(range(30))))
            return req, out

        req, out = await run_engine(engine, client())
        assert req.aborted and out == []
    asyncio.run(body())


def test_engine_rejects_pool_overflow_request():
    """A request that fits max_seq_len but can never fit the page POOL must be
    rejected at admission (not deadlock the FCFS queue head forever)."""
    async def body():
        # pool = 8 pages = 128 tokens < max_seq_len = 256 tokens
        ec = tiny_engine_config(num_hbm_blocks=8, num_cpu_blocks=0)
        engine = make_engine(ec)
        await engine.initialize(tokenizer_backend="inline")

        async def clients():
            big = engine.add_request_and_wait(
                RawRequest("", 60, prompt_token_ids=list(range(100))))
            small = engine.add_request_and_wait(
                RawRequest("", 4, prompt_token_ids=list(range(10))))
            return await asyncio.gather(big, small)

        (big_req, big_out), (small_req, small_out) = \
            await run_engine(engine, clients())
        assert big_req.aborted and big_out == []
        assert len(small_out) == 4, "request behind the oversized one must run"
    asyncio.run(body())


def test_engine_dp_serving():
    """dp=2 x tp=2 on the virtual device mesh: the engine pins requests to dp
    groups at admission (sticky — each group owns its own page pool and id
    space), builds per-group batches, and one SPMD program serves both."""
    async def body():
        ec = tiny_engine_config(dp_size=2, tp_size=2, num_hbm_blocks=32,
                                num_cpu_blocks=0, max_batch_size=4)
        engine = make_engine(ec)
        await engine.initialize(tokenizer_backend="inline")

        async def clients():
            return await asyncio.gather(*[
                engine.add_request_and_wait(
                    RawRequest("", 6, prompt_token_ids=[(3 * i + j) % 256
                                                        for j in range(10 + i)]))
                for i in range(6)])

        outs = await run_engine(engine, clients(), timeout=300)
        for r, out in outs:
            assert len(out) == 6
        assert {r.dp_group for r, _ in outs} == {0, 1}, \
            "admission should spread requests across both dp groups"
        # every page in every group's pool must be back
        for mgr in engine.model.hbm_block_mgrs:
            assert mgr.num_free_blocks == mgr.num_blocks
        # per-group id spaces fully recycled
        for mgr in engine.scheduler.id_managers:
            assert len(mgr.available_ids) == ec.max_seqs_in_block_table
    asyncio.run(body())
