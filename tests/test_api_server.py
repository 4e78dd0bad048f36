"""API-server integration tests: real HTTP over a local socket, dummy weights.

Mirrors the reference's POST /generate surface (api_server.py:16-84): streaming
and non-streaming, plus the /stats and /health additions.
"""

import asyncio
import json

import pytest

aiohttp = pytest.importorskip("aiohttp")
from aiohttp.test_utils import TestClient, TestServer  # noqa: E402

from swiftllm_tpu.server.api_server import build_app  # noqa: E402
from swiftllm_tpu.server.engine import Engine  # noqa: E402
from tests.test_engine import tiny_engine_config, tiny_model_config  # noqa: E402


async def _with_server(body):
    engine = Engine(tiny_engine_config(), tiny_model_config())
    await engine.initialize(tokenizer_backend="inline")
    loops = asyncio.create_task(engine.start_all_event_loops())
    client = TestClient(TestServer(build_app(engine)))
    await client.start_server()
    try:
        await body(client)
    finally:
        await client.close()
        loops.cancel()


def test_generate_non_streaming():
    async def body(client):
        resp = await client.post("/generate", json={
            "prompt": "a b c", "output_len": 6, "decode": True})
        assert resp.status == 200
        data = await resp.json()
        assert len(data["output_token_ids"]) == 6
        assert isinstance(data["output"], str)

        health = await client.get("/health")
        assert health.status == 200
        stats = await (await client.get("/stats")).json()
        assert stats["num_requests_finished"] == 1
        prom = await (await client.get("/metrics")).text()
        assert "swiftllm_num_requests_finished 1" in prom
        assert "# TYPE swiftllm_running_requests gauge" in prom
    asyncio.run(_with_server(body))


def test_generate_streaming():
    async def body(client):
        resp = await client.post("/generate", json={
            "prompt_token_ids": list(range(8)), "output_len": 5,
            "stream": True, "decode": False})
        assert resp.status == 200
        events = []
        async for line in resp.content:
            if line.strip():
                events.append(json.loads(line))
        assert len(events) == 5
        assert all("token_id" in e for e in events)
    asyncio.run(_with_server(body))


def test_streaming_matches_non_streaming():
    async def body(client):
        ids = list(range(20, 35))
        r1 = await (await client.post("/generate", json={
            "prompt_token_ids": ids, "output_len": 6, "decode": False})).json()
        resp = await client.post("/generate", json={
            "prompt_token_ids": ids, "output_len": 6,
            "stream": True, "decode": False})
        streamed = []
        async for line in resp.content:
            if line.strip():
                streamed.append(json.loads(line)["token_id"])
        assert streamed == r1["output_token_ids"]
    asyncio.run(_with_server(body))


def test_streaming_decode_matches_full():
    """Concatenated incremental text == one-shot decode of all output ids."""
    async def body(client):
        ids = list(range(40, 52))
        r1 = await (await client.post("/generate", json={
            "prompt_token_ids": ids, "output_len": 6, "decode": True})).json()
        resp = await client.post("/generate", json={
            "prompt_token_ids": ids, "output_len": 6,
            "stream": True, "decode": True})
        text = ""
        async for line in resp.content:
            if line.strip():
                text += json.loads(line)["text"]
        assert text == r1["output"]
    asyncio.run(_with_server(body))


def test_incremental_decoder_utf8_merge():
    """Multi-byte chars split across tokens are held until complete, then
    emitted whole — and the total equals the one-shot decode."""
    from swiftllm_tpu.server.tokenization import _incremental_decode

    class ByteTok:   # each token id is one raw byte
        def decode(self, ids, skip_special_tokens=True):
            return bytes(ids).decode("utf-8", errors="replace")

    tok = ByteTok()
    ids = list("héllo →".encode())   # é and → are multi-byte
    out, prefix, read = "", 0, 0
    for i, b in enumerate(ids):
        delta, committed = _incremental_decode(
            tok, ids[prefix:i + 1], read - prefix, True)
        out += delta
        if committed:
            read = i + 1
            prefix = max(prefix, read - 5)
    assert out == "héllo →"


def test_profile_endpoints(tmp_path):
    async def body(client):
        r = await client.post("/profile/start", json={"dir": str(tmp_path)})
        assert r.status == 200
        # generate something while tracing
        await client.post("/generate", json={"prompt_token_ids": [1, 2, 3],
                                             "output_len": 2, "decode": False})
        r = await client.post("/profile/stop")
        assert r.status == 200
        import os
        assert any(os.scandir(tmp_path)), "trace directory should not be empty"
    asyncio.run(_with_server(body))
