import pytest

from swiftllm_tpu.config import EngineConfig, LlamaModelConfig
from swiftllm_tpu.server.scheduler import Scheduler
from swiftllm_tpu.server.structs import RawRequest, Request


def tiny_model_config():
    return LlamaModelConfig(
        num_layers=2, num_q_heads=4, num_kv_heads=2, hidden_size=64, head_dim=16,
        ffn_inter_dim=128, vocab_size=100, max_position_embeddings=512,
        rms_norm_eps=1e-5)


def make_sched(num_blocks=64, **kw):
    kw.setdefault("block_size", 4)
    kw.setdefault("max_batch_size", 4)
    kw.setdefault("max_tokens_in_batch", 32)
    kw.setdefault("prefill_chunk_size", 8)
    kw.setdefault("num_cpu_blocks", 64)
    kw.setdefault("max_seqs_in_block_table", 16)
    cfg = EngineConfig(model_path="", use_dummy=True, **kw)
    return Scheduler(tiny_model_config(), cfg, num_blocks)


def make_req(prompt_len: int, output_len: int = 4) -> Request:
    r = Request(RawRequest("x", output_len))
    r.set_prompt_token_ids(list(range(prompt_len)))
    return r


def simulate_step(decision):
    """Pretend the model ran the batch: advance cached counters, append tokens."""
    for s in decision.batch:
        r = s.request
        if s.samples_token:
            r.output_token_ids.append(1)
        r.num_cached_tokens += s.n_tokens


def test_short_prompt_prefills_whole():
    sched = make_sched()
    r = make_req(6, output_len=2)
    sched.on_requests_arrival([r])
    d = sched.get_next_batch()
    assert len(d.batch) == 1
    assert d.batch[0].n_tokens == 6
    assert d.batch[0].samples_token
    assert r.seq_id >= 0


def test_chunked_prefill_spans_steps():
    sched = make_sched()
    r = make_req(20, output_len=1)   # chunk size 8 → 3 prefill steps
    sched.on_requests_arrival([r])
    chunks = []
    for _ in range(3):
        d = sched.get_next_batch()
        chunks.append(d.batch[0].n_tokens)
        simulate_step(d)
        sched.on_batch_finish(d.batch)
    assert chunks == [8, 8, 4]
    assert r.is_finished()           # last chunk sampled the single output token


def test_decode_piggybacks_with_prefill():
    """True SARATHI: a decode token and a prefill chunk share one step."""
    sched = make_sched()
    a = make_req(4, output_len=8)
    sched.on_requests_arrival([a])
    d = sched.get_next_batch()
    simulate_step(d)
    sched.on_batch_finish(d.batch)
    # a is now decoding; a long prompt arrives
    b = make_req(16, output_len=1)
    sched.on_requests_arrival([b])
    d = sched.get_next_batch()
    per_req = {s.request: s.n_tokens for s in d.batch}
    assert per_req == {a: 1, b: 8}   # decode token rides with b's first chunk


def test_token_budget_respected():
    sched = make_sched(max_tokens_in_batch=10, prefill_chunk_size=8)
    reqs = [make_req(8) for _ in range(3)]
    sched.on_requests_arrival(reqs)
    d = sched.get_next_batch()
    assert d.total_tokens <= 10


def test_fcfs_no_skip_ahead():
    # A huge prompt at the queue head must not be bypassed by a small one.
    sched = make_sched(num_blocks=4)   # 16 tokens of KV total
    big = make_req(64)
    small = make_req(4)
    sched.on_requests_arrival([big, small])
    d = sched.get_next_batch()
    admitted = [s.request for s in d.batch]
    assert small not in admitted


def test_preemption_swaps_out_tail():
    sched = make_sched(num_blocks=8, max_tokens_in_batch=64, prefill_chunk_size=64)
    a = make_req(16, output_len=64)   # 4 pages
    b = make_req(12, output_len=64)   # 3 pages
    sched.on_requests_arrival([a, b])
    d = sched.get_next_batch()
    simulate_step(d)
    sched.on_batch_finish(d.batch)
    # both decoding now: 7 pages of 8 used. Decode steps grow them past capacity.
    for _ in range(8):
        d = sched.get_next_batch()
        if d.swap_out:
            assert d.swap_out == [b]          # FCFS tail preempted
            assert all(s.request is a for s in d.batch)
            sched.on_swap_out_done(d.swap_out)
            return
        simulate_step(d)
        sched.on_batch_finish(d.batch)
    pytest.fail("expected a preemption")


def test_swap_in_after_finish():
    sched = make_sched(num_blocks=8, max_tokens_in_batch=64, prefill_chunk_size=64)
    a = make_req(16, output_len=3)
    b = make_req(12, output_len=3)
    sched.on_requests_arrival([a, b])
    swapped_back = False
    for _ in range(30):
        if not sched.has_pending():
            break
        d = sched.get_next_batch()
        if d.swap_out:
            sched.on_swap_out_done(d.swap_out)
        if d.swap_in:
            sched.on_swap_in_done(d.swap_in)
            swapped_back = True
        simulate_step(d)
        sched.on_batch_finish(d.batch)
    assert a.is_finished() and b.is_finished()
    # b must have been preempted and later resumed
    assert swapped_back


def test_reference_style_mode():
    sched = make_sched(enable_chunked_prefill=False)
    a = make_req(6, output_len=2)
    b = make_req(4, output_len=2)
    sched.on_requests_arrival([a, b])
    d = sched.get_next_batch()
    # whole-prompt prefill batch for both
    assert sorted(s.n_tokens for s in d.batch) == [4, 6]
    simulate_step(d)
    sched.on_batch_finish(d.batch)
    d = sched.get_next_batch()
    # pure decode batch
    assert [s.n_tokens for s in d.batch] == [1, 1]


def test_seq_ids_recycled():
    sched = make_sched()
    r1 = make_req(4, output_len=1)
    sched.on_requests_arrival([r1])
    d = sched.get_next_batch()
    simulate_step(d)
    sched.on_batch_finish(d.batch)
    assert r1.is_finished()
    free_before = len(sched.request_id_manager.available_ids)
    r2 = make_req(4, output_len=1)
    sched.on_requests_arrival([r2])
    sched.get_next_batch()
    assert len(sched.request_id_manager.available_ids) == free_before - 1
