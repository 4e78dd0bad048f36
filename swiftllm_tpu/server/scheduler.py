"""Iteration-level scheduler.

Capability parity with the reference's strict-FCFS scheduler with preemptive
swap-out (swiftllm/server/scheduler.py:33-144), with the SARATHI piggybacking
the reference left as a comment (scheduler.py:92-99) actually enabled: every
step builds ONE mixed token batch — one decode token for every running
sequence, plus prefill chunks from in-flight and newly admitted prompts, under
a flat-token budget. This matches the TPU data plane, which consumes a single
flattened token batch per step.

Set ``enable_chunked_prefill=False`` for the reference's exact policy shape
(whole-prompt prefill-only batches take priority; otherwise pure decode batches).
"""

from __future__ import annotations

import dataclasses
from collections import deque

from swiftllm_tpu.config import EngineConfig, LlamaModelConfig
from swiftllm_tpu.server.structs import Request
from swiftllm_tpu.utils import cdiv


class RequestIdManager:
    """Recycles sequence ids in [0, max_id) — each id doubles as the request's
    row in the KV block table (reference scheduler.py:8-30)."""

    def __init__(self, max_id: int):
        self.max_id = max_id
        self.available_ids = list(range(max_id - 1, -1, -1))

    def get_id(self) -> int:
        if not self.available_ids:
            raise RuntimeError(
                "No more available request ids; increase `max_seqs_in_block_table`")
        return self.available_ids.pop()

    def free_id(self, req_id: int):
        self.available_ids.append(req_id)

    def free_ids(self, req_ids: list[int]):
        self.available_ids.extend(req_ids)


@dataclasses.dataclass
class ScheduledSeq:
    """One sequence's share of a step: feed `n_tokens` new tokens to the model."""
    request: Request
    n_tokens: int

    @property
    def samples_token(self) -> bool:
        """Whether this step's last fed token is the sequence's current end, i.e.
        this step produces a sampled token for the request."""
        r = self.request
        return r.num_cached_tokens + self.n_tokens == r.total_len


@dataclasses.dataclass
class ScheduleDecision:
    batch: list[ScheduledSeq]
    swap_in: list[Request]
    swap_out: list[Request]

    @property
    def total_tokens(self) -> int:
        return sum(s.n_tokens for s in self.batch)


class Scheduler:
    def __init__(self, model_config: LlamaModelConfig, engine_config: EngineConfig,
                 num_hbm_blocks: int):
        self.model_config = model_config
        self.engine_config = engine_config
        self.num_hbm_blocks = num_hbm_blocks

        self.waiting_q: deque[Request] = deque()
        self.running_q: list[Request] = []      # FCFS order
        self.swapped_q: deque[Request] = deque()
        self.num_free_cpu_blocks = engine_config.num_cpu_blocks
        self.request_id_manager = RequestIdManager(engine_config.max_seqs_in_block_table)

    # --- helpers ---------------------------------------------------------------
    def _blocks_for_len(self, n_tokens: int) -> int:
        return cdiv(n_tokens, self.engine_config.block_size)

    def _blocks_held(self, req: Request) -> int:
        """Pages currently held in HBM by a running request."""
        return self._blocks_for_len(req.num_cached_tokens)

    def _blocks_after(self, req: Request, n_new: int) -> int:
        return self._blocks_for_len(req.num_cached_tokens + n_new)

    # --- event hooks (reference scheduler.py:62-66,131-144) ---------------------
    def on_requests_arrival(self, requests: list[Request]):
        self.waiting_q.extend(requests)

    def on_batch_finish(self, batch: list[ScheduledSeq]):
        finished = [s.request for s in batch if s.request.is_finished()]
        self.request_id_manager.free_ids([r.seq_id for r in finished])
        self.running_q = [r for r in self.running_q if not r.is_finished()]

    def on_swap_out_done(self, requests: list[Request]):
        for r in requests:
            self.num_free_cpu_blocks -= self._blocks_held(r)
        assert self.num_free_cpu_blocks >= 0, "CPU swap space exhausted"

    def on_swap_in_done(self, requests: list[Request]):
        for r in requests:
            self.num_free_cpu_blocks += self._blocks_held(r)

    def has_pending(self) -> bool:
        return bool(self.waiting_q or self.running_q or self.swapped_q)

    # --- the policy --------------------------------------------------------------
    def get_next_batch(self) -> ScheduleDecision:
        cfg = self.engine_config
        swap_out: list[Request] = []

        # 1. Preempt (swap out) the FCFS tail while the running set cannot even
        #    decode one token each within the HBM page / batch-row budget
        #    (reference scheduler.py:105-114).
        def running_blocks_needed():
            return sum(self._blocks_after(r, 1) for r in self.running_q)

        while self.running_q and (
                len(self.running_q) > cfg.max_batch_size
                or running_blocks_needed() > self.num_hbm_blocks):
            victim = self.running_q.pop()
            swap_out.append(victim)
        if swap_out:
            self.swapped_q.extendleft(reversed(swap_out))
            # Oldest-preempted-first for the engine's copy loop, matching the
            # reference's reversed() return (scheduler.py:129).
            swap_out = list(reversed(swap_out))

        blocks_used = running_blocks_needed()

        # 2. If nothing was just preempted, try to swap requests back in, FCFS
        #    (reference scheduler.py:116-127).
        swap_in: list[Request] = []
        if not swap_out:
            while self.swapped_q:
                cand = self.swapped_q[0]
                need = self._blocks_after(cand, 1)
                if (len(self.running_q) + 1 <= cfg.max_batch_size
                        and blocks_used + need <= self.num_hbm_blocks):
                    self.swapped_q.popleft()
                    self.running_q.append(cand)
                    swap_in.append(cand)
                    blocks_used += need
                else:
                    break

        # 3. Build the token batch.
        if cfg.enable_chunked_prefill:
            batch = self._build_mixed_batch(blocks_used, allow_admission=not self.swapped_q
                                            and not swap_out)
        else:
            batch = self._build_reference_style_batch(blocks_used,
                                                      allow_admission=not self.swapped_q
                                                      and not swap_out and not swap_in)
        return ScheduleDecision(batch=batch, swap_in=swap_in, swap_out=swap_out)

    def _build_mixed_batch(self, blocks_used: int, allow_admission: bool) -> list[ScheduledSeq]:
        """TRUE SARATHI mixed batch: one decode token per running decode-stage
        seq PLUS prefill chunks, in one step. The data plane routes 1-token
        rows through the fused decode kernel and multi-token rows through the
        prefill tile kernel within the same jitted program, so decodes never
        stall behind prefill steps (the reference left this piggybacking as a
        comment, scheduler.py:92-99)."""
        cfg = self.engine_config
        batch: list[ScheduledSeq] = []
        token_budget = cfg.max_tokens_in_batch

        # Decode tokens first: TPOT is latency-critical; prefill fills the rest.
        decode_rows = [r for r in self.running_q if not r.is_prefill_stage()]
        for r in decode_rows:
            batch.append(ScheduledSeq(r, 1))
            token_budget -= 1

        # (a) grow in-flight prefill chunks, FCFS.
        for r in self.running_q:
            if not r.is_prefill_stage() or token_budget <= 1:
                continue
            n = min(r.num_uncached_tokens(), cfg.prefill_chunk_size, token_budget)
            extra = self._blocks_after(r, n) - self._blocks_after(r, 1)
            if blocks_used + extra > self.num_hbm_blocks:
                # Shrink the chunk to what fits in the pages we can actually get.
                avail_pages = (self._blocks_after(r, 1)
                               + max(0, self.num_hbm_blocks - blocks_used))
                n = min(n, avail_pages * cfg.block_size - r.num_cached_tokens)
                if n <= 0:
                    continue
                extra = self._blocks_after(r, n) - self._blocks_after(r, 1)
            batch.append(ScheduledSeq(r, n))
            token_budget -= n
            blocks_used += extra

        # (b) admit new requests, FCFS, while rows/tokens/pages remain.
        if allow_admission:
            while self.waiting_q and token_budget > 0:
                cand = self.waiting_q[0]
                n = min(cand.prompt_len, cfg.prefill_chunk_size, token_budget)
                need = self._blocks_for_len(n)
                # The whole prompt (+1 for the first sampled token) must be able to
                # fit in HBM *alone*, else the request can never run to a sample.
                ever_fits = self._blocks_for_len(cand.prompt_len + 1) <= self.num_hbm_blocks
                if (not ever_fits
                        or len(self.running_q) + 1 > cfg.max_batch_size
                        or len(batch) + 1 > cfg.max_batch_size
                        or blocks_used + need > self.num_hbm_blocks
                        or n < min(cand.prompt_len, cfg.prefill_chunk_size)):
                    break   # strict FCFS: don't skip ahead
                self.waiting_q.popleft()
                cand.seq_id = self.request_id_manager.get_id()
                self.running_q.append(cand)
                batch.append(ScheduledSeq(cand, n))
                token_budget -= n
                blocks_used += need

        return batch

    def _build_reference_style_batch(self, blocks_used: int,
                                     allow_admission: bool) -> list[ScheduledSeq]:
        """Reference policy shape (scheduler.py:73-129): a batch is either whole-prompt
        prefills for newly admitted requests, or one decode token per running seq."""
        cfg = self.engine_config
        if allow_admission and self.waiting_q:
            cur: list[ScheduledSeq] = []
            cur_blocks = 0
            cur_tokens = 0
            while self.waiting_q:
                cand = self.waiting_q[0]
                need = self._blocks_for_len(cand.prompt_len)
                if (len(cur) + 1 <= cfg.max_batch_size
                        and len(self.running_q) + len(cur) + 1 <= cfg.max_batch_size
                        and blocks_used + cur_blocks + need <= self.num_hbm_blocks
                        and cur_tokens + cand.prompt_len <= cfg.max_tokens_in_batch):
                    self.waiting_q.popleft()
                    cand.seq_id = self.request_id_manager.get_id()
                    cur.append(ScheduledSeq(cand, cand.prompt_len))
                    cur_blocks += need
                    cur_tokens += cand.prompt_len
                else:
                    break
            if cur:
                self.running_q.extend(s.request for s in cur)
                return cur
        return [ScheduledSeq(r, 1) for r in self.running_q if not r.is_prefill_stage()]
