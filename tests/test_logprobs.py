"""Per-token logprobs (beyond the reference — its API returns token ids only).

Golden: with --enable-logprobs, greedy generation's logprobs equal HF's raw
log-softmax of the chosen tokens. Engine: StepOutput/request carry values and
the API-facing list lines up with output_token_ids; off by default (None-free
fast path untouched).
"""

import asyncio

import numpy as np
import pytest

import tests.conftest  # noqa: F401

from swiftllm_tpu.server.scheduler import ScheduledSeq
from swiftllm_tpu.server.structs import RawRequest, Request


def test_logprobs_match_hf_golden(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from tests.test_llama_golden import make_model

    path = tmp_path_factory.mktemp("tiny_llama_lp")
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5)
    torch.manual_seed(5)
    hf = LlamaForCausalLM(cfg).eval()
    hf.save_pretrained(path, safe_serialization=True)

    m = make_model(str(path), tp=2, enable_logprobs=True)
    prompt = [1, 9, 4, 2, 17, 33]
    r = Request(RawRequest("", 4))
    r.set_prompt_token_ids(list(prompt))
    r.seq_id = 0

    ids, lps = list(prompt), []
    n = r.prompt_len
    for step in range(4):
        sched = ScheduledSeq(r, n if step == 0 else 1)
        tokens, rows = m.forward([sched])
        r.num_cached_tokens += sched.n_tokens
        tok = int(tokens[0])
        r.output_token_ids.append(tok)
        lps.append(float(np.asarray(m.last_logprobs)[0]))
        ids.append(tok)

    import torch.nn.functional as F
    with torch.no_grad():
        logits = hf(torch.tensor([ids[:-1]])).logits[0]      # [T-1, V]
    for step in range(4):
        pos = len(prompt) - 1 + step
        want = float(F.log_softmax(logits[pos], dim=-1)[ids[pos + 1]])
        assert abs(lps[step] - want) < 2e-3, (step, lps[step], want)


def test_engine_logprobs_exposed():
    from tests.test_engine import make_engine, run_engine, tiny_engine_config

    async def body():
        engine = make_engine(tiny_engine_config(enable_logprobs=True))
        await engine.initialize(tokenizer_backend="inline")

        async def client():
            return await engine.add_request_and_wait(
                RawRequest("hello there world foo", 6, temperature=0.8))

        req, token_ids = await run_engine(engine, client())
        assert len(token_ids) == 6
        assert len(req.output_logprobs) == len(token_ids)
        assert all(lp is not None and lp <= 1e-6 for lp in req.output_logprobs)

    asyncio.run(body())


def test_engine_logprobs_off_by_default():
    from tests.test_engine import make_engine, run_engine

    async def body():
        engine = make_engine()
        await engine.initialize(tokenizer_backend="inline")

        async def client():
            return await engine.add_request_and_wait(RawRequest("hi you", 3))

        req, token_ids = await run_engine(engine, client())
        assert req.output_logprobs == [None] * len(token_ids)

    asyncio.run(body())
