"""Multi-step decode: S decode steps scanned inside ONE program
(models.llama.decode_multi_step) must be bit-identical to S sequential
single-step dispatches — greedy and seeded-sampling, across page boundaries.

The reference has no analog (it dispatches per step and eats a .tolist()
sync, swiftllm/worker/model.py:359); on a tunneled TPU the per-dispatch
overhead (~1 ms) makes batching decode steps into one program the single
biggest decode-throughput lever at small step times.
"""

import tests.conftest  # noqa: F401

from swiftllm_tpu.config import EngineConfig, LlamaModelConfig
from swiftllm_tpu.server.scheduler import ScheduledSeq
from swiftllm_tpu.server.structs import RawRequest, Request
from swiftllm_tpu.worker.model import LlamaModel

B_BUCKET = 4   # = next_power_of_2(max_batch_size) below

PROMPTS = [[(i * 13 + j) % 128 for i in range(14 + 3 * j)] for j in range(3)]


def _make_model(block_size=16):
    mc = LlamaModelConfig(num_layers=2, num_q_heads=4, num_kv_heads=2,
                          hidden_size=64, head_dim=16, ffn_inter_dim=128,
                          vocab_size=128, max_position_embeddings=2048,
                          rms_norm_eps=1e-5)
    ec = EngineConfig(model_path="", use_dummy=True, dtype="float32",
                      block_size=block_size, num_hbm_blocks=64,
                      num_cpu_blocks=0, max_blocks_per_seq=8,
                      max_batch_size=B_BUCKET,
                      max_tokens_in_batch=256, prefill_chunk_size=64,
                      max_seqs_in_block_table=16, use_pallas=False)
    model = LlamaModel(ec, mc)
    model.load_weights()
    model.init_kvcache_and_swap()
    return model


def _prefill_reqs(model, **sampling):
    reqs = []
    for i, p in enumerate(PROMPTS):
        r = Request(RawRequest("", 64, **sampling))
        r.set_prompt_token_ids(p)
        r.seq_id = i
        reqs.append(r)
    tokens, rows = model.forward([ScheduledSeq(r, len(r.prompt_token_ids))
                                  for r in reqs])
    for i, s in enumerate(rows):
        if s is not None and s.samples_token:
            s.request.output_token_ids.append(int(tokens[i]))
            s.request.num_cached_tokens += s.n_tokens
    return reqs


def _decode_sequential(model, reqs, n):
    out = [[] for _ in reqs]
    for _ in range(n):
        tokens, rows = model.forward([ScheduledSeq(r, 1) for r in reqs])
        for i, s in enumerate(rows):
            if s is None:
                continue
            t = int(tokens[i])
            out[reqs.index(s.request)].append(t)
            s.request.output_token_ids.append(t)
            s.request.num_cached_tokens += 1
    return out


def _decode_multi(model, reqs, S, n_dispatch):
    out = [[] for _ in reqs]
    for _ in range(n_dispatch):
        tokens, rows = model.forward([ScheduledSeq(r, 1) for r in reqs],
                                     multi_step=S)
        assert len(tokens) == B_BUCKET * S
        for i, s in enumerate(rows):
            if s is None:
                continue
            toks = [int(tokens[i * S + j]) for j in range(S)]
            out[reqs.index(s.request)].extend(toks)
            s.request.output_token_ids.extend(toks)
            s.request.num_cached_tokens += S
    return out


def test_multi_step_matches_sequential_greedy():
    m1 = _make_model()
    seq = _decode_sequential(m1, _prefill_reqs(m1), 8)
    m2 = _make_model()
    mult = _decode_multi(m2, _prefill_reqs(m2), S=4, n_dispatch=2)
    assert mult == seq


def test_multi_step_crosses_page_boundary():
    # block_size 16, prompt lens 14/17/20 (+1 prefill sample): the inner
    # steps of the dispatches cross a page boundary for every row.
    m1 = _make_model(block_size=16)
    seq = _decode_sequential(m1, _prefill_reqs(m1), 12)
    m2 = _make_model(block_size=16)
    mult = _decode_multi(m2, _prefill_reqs(m2), S=4, n_dispatch=3)
    assert mult == seq


def test_multi_step_matches_sequential_sampled():
    # Seeded temperature sampling: per-(request, position) seeds advance by
    # +1 per decode step on the host path and by +s on the device path, so
    # the streams must match bit-exactly.
    kw = dict(temperature=0.8, top_k=20, seed=7)
    m1 = _make_model()
    seq = _decode_sequential(m1, _prefill_reqs(m1, **kw), 8)
    m2 = _make_model()
    mult = _decode_multi(m2, _prefill_reqs(m2, **kw), S=4, n_dispatch=2)
    assert mult == seq


def test_multi_step_feedback_chains_across_dispatches():
    # Leave the last sampled token unresolved (None) between dispatches, as
    # the engine's async pipeline does: the builder must route the next
    # dispatch's first token read through the feedback buffer.
    m1 = _make_model()
    seq = _decode_sequential(m1, _prefill_reqs(m1), 8)
    m2 = _make_model()
    reqs = _prefill_reqs(m2)
    held = {}
    mult = [[] for _ in reqs]
    for _ in range(2):
        tokens, rows = m2.forward([ScheduledSeq(r, 1) for r in reqs],
                                  multi_step=4)
        for i, s in enumerate(rows):
            if s is None:
                continue
            r = s.request
            toks = [int(tokens[i * 4 + j]) for j in range(4)]
            mult[reqs.index(r)].extend(toks)
            # withhold the final token's VALUE (count advances regardless)
            r.output_token_ids.extend(toks[:-1] + [None])
            r.num_cached_tokens += 4
            held[r.seq_id] = (r, toks[-1])
    for r, t in held.values():
        r.output_token_ids[-1] = t
    assert mult == seq


def _make_pallas_model(monkeypatch, defer: str):
    """Kernel-compatible dims (n_q*hd = 128, W = 2*n_kv*hd = 128) so the
    deferred-commit gate passes; interpret mode runs the Pallas kernels on
    the CPU backend."""
    monkeypatch.setenv("SWIFTLLM_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("SWIFTLLM_DEFER_KV", defer)
    mc = LlamaModelConfig(num_layers=2, num_q_heads=2, num_kv_heads=1,
                          hidden_size=128, head_dim=64, ffn_inter_dim=256,
                          vocab_size=128, max_position_embeddings=2048,
                          rms_norm_eps=1e-5)
    ec = EngineConfig(model_path="", use_dummy=True, dtype="float32",
                      block_size=16, num_hbm_blocks=64,
                      num_cpu_blocks=0, max_blocks_per_seq=8,
                      max_batch_size=B_BUCKET,
                      max_tokens_in_batch=256, prefill_chunk_size=64,
                      max_seqs_in_block_table=16, use_pallas=True)
    model = LlamaModel(ec, mc)
    model.load_weights()
    model.init_kvcache_and_swap()
    return model


def test_multi_step_deferred_commit_matches_sequential(monkeypatch):
    """Deferred KV commit (multi-step windows skip per-step cache writes,
    one scatter after the scan) must be token-identical to sequential
    single-step decode (fused per-step writes), across page boundaries."""
    m1 = _make_pallas_model(monkeypatch, defer="1")
    seq = _decode_sequential(m1, _prefill_reqs(m1), 8)
    m2 = _make_pallas_model(monkeypatch, defer="1")
    mult = _decode_multi(m2, _prefill_reqs(m2), S=4, n_dispatch=2)
    assert mult == seq
    # And the deferred/non-deferred multi-step paths agree with each other.
    m3 = _make_pallas_model(monkeypatch, defer="0")
    mult_nd = _decode_multi(m3, _prefill_reqs(m3), S=4, n_dispatch=2)
    assert mult == mult_nd
