"""OpenAI-compatible route tests: real HTTP, dummy weights.

/v1/completions (JSON + SSE streaming, logprobs, usage accounting) and
/v1/models — the adapter surface a vLLM/OpenAI-client user lands on.
"""

import asyncio
import json

import pytest

aiohttp = pytest.importorskip("aiohttp")
from aiohttp.test_utils import TestClient, TestServer  # noqa: E402

from swiftllm_tpu.server.api_server import build_app  # noqa: E402
from swiftllm_tpu.server.engine import Engine  # noqa: E402
from tests.test_engine import tiny_engine_config, tiny_model_config  # noqa: E402


async def _with_server(body, **cfg):
    engine = Engine(tiny_engine_config(**cfg), tiny_model_config())
    await engine.initialize(tokenizer_backend="inline")
    loops = asyncio.create_task(engine.start_all_event_loops())
    client = TestClient(TestServer(build_app(engine)))
    await client.start_server()
    try:
        await body(client)
    finally:
        await client.close()
        loops.cancel()


def test_completions_non_streaming():
    async def body(client):
        resp = await client.post("/v1/completions", json={
            "model": "m", "prompt": "one two three", "max_tokens": 5,
            "temperature": 0})
        assert resp.status == 200
        data = await resp.json()
        assert data["object"] == "text_completion"
        choice = data["choices"][0]
        assert choice["finish_reason"] in ("stop", "length")
        assert isinstance(choice["text"], str)
        assert data["usage"]["completion_tokens"] == 5
        assert (data["usage"]["total_tokens"]
                == data["usage"]["prompt_tokens"] + 5)

        ms = await (await client.get("/v1/models")).json()
        assert ms["object"] == "list" and ms["data"]
    asyncio.run(_with_server(body))


def test_completions_token_id_prompt_and_logprobs():
    async def body(client):
        resp = await client.post("/v1/completions", json={
            "prompt": list(range(10)), "max_tokens": 4, "temperature": 0,
            "logprobs": 1})
        data = await resp.json()
        lp = data["choices"][0]["logprobs"]
        assert len(lp["token_logprobs"]) == 4
        assert all(v is not None and v <= 1e-6 for v in lp["token_logprobs"])
    asyncio.run(_with_server(body, enable_logprobs=True))


def test_chat_completions():
    async def body(client):
        resp = await client.post("/v1/chat/completions", json={
            "messages": [{"role": "system", "content": "be brief"},
                         {"role": "user", "content": "hi there"}],
            "max_tokens": 4, "temperature": 0})
        assert resp.status == 200
        data = await resp.json()
        assert data["object"] == "chat.completion"
        msg = data["choices"][0]["message"]
        assert msg["role"] == "assistant" and isinstance(msg["content"], str)
        assert data["usage"]["completion_tokens"] == 4
    asyncio.run(_with_server(body))


def test_chat_completions_streaming():
    async def body(client):
        resp = await client.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": "a b c"}],
            "max_tokens": 3, "stream": True})
        chunks, done = [], False
        async for line in resp.content:
            line = line.decode().strip()
            if line == "data: [DONE]":
                done = True
                break
            if line.startswith("data: "):
                chunks.append(json.loads(line[len("data: "):]))
        assert done
        assert chunks[0]["choices"][0]["delta"].get("role") == "assistant"
        assert chunks[-1]["choices"][0]["finish_reason"] in ("stop", "length")
    asyncio.run(_with_server(body))


def test_completions_streaming_sse():
    async def body(client):
        resp = await client.post("/v1/completions", json={
            "prompt": "a b c d", "max_tokens": 4, "stream": True})
        assert resp.status == 200
        assert resp.headers["Content-Type"].startswith("text/event-stream")
        chunks, done = [], False
        async for line in resp.content:
            line = line.decode().strip()
            if not line.startswith("data: "):
                continue
            if line == "data: [DONE]":
                done = True
                break
            chunks.append(json.loads(line[len("data: "):]))
        assert done
        # 4 token chunks + 1 finish chunk
        assert len(chunks) == 5
        assert chunks[-1]["choices"][0]["finish_reason"] in ("stop", "length")
    asyncio.run(_with_server(body))
