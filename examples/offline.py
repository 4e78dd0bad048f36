"""Offline inference example — data plane only (reference examples/offline.py:39-84).

Drives LlamaModel directly: one prefill step over a batch of prompts, then a
greedy decode loop. With --use-dummy it runs without a checkpoint or tokenizer.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from swiftllm_tpu.config import EngineConfig, LlamaModelConfig
from swiftllm_tpu.server.scheduler import ScheduledSeq
from swiftllm_tpu.server.structs import RawRequest, Request


def main():
    parser = argparse.ArgumentParser()
    EngineConfig.add_cli_args(parser)
    parser.add_argument("--num-decode-steps", type=int, default=20)
    parser.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = parser.parse_args()
    engine_config = EngineConfig.from_cli_args(args)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
        engine_config.use_pallas = False   # Mosaic kernels need a real TPU

    from swiftllm_tpu.worker.model import LlamaModel

    if engine_config.use_dummy and not engine_config.model_path:
        model_config = LlamaModelConfig(
            num_layers=4, num_q_heads=8, num_kv_heads=4, hidden_size=256, head_dim=32,
            ffn_inter_dim=512, vocab_size=1000, max_position_embeddings=2048,
            rms_norm_eps=1e-5)
        tokenizer = None
        # Shrink serving knobs the user left at their production defaults to
        # match the toy model — the default 128-row/2048-token buckets compile
        # for minutes on a 1-core CPU backend.
        defaults = {f: parser.get_default(f.replace("-", "_"))
                    for f in ("max_batch_size", "max_tokens_in_batch",
                              "max_blocks_per_seq", "max_seqs_in_block_table",
                              "prefill_chunk_size")}
        small = dict(max_batch_size=8, max_tokens_in_batch=256,
                     max_blocks_per_seq=64, max_seqs_in_block_table=16,
                     prefill_chunk_size=64)
        for name, small_val in small.items():
            if getattr(engine_config, name) == defaults[name]:
                setattr(engine_config, name, small_val)
        engine_config.token_buckets = ()
        engine_config.page_buckets = ()
        engine_config.__post_init__()   # re-derive the bucket ladders
    else:
        model_config = LlamaModelConfig.load_from_model_path(engine_config.model_path)
        from transformers import AutoTokenizer
        tokenizer = AutoTokenizer.from_pretrained(engine_config.model_path)

    t0 = time.perf_counter()
    model = LlamaModel(engine_config, model_config)
    model.load_weights()
    model.init_kvcache_and_swap()
    print(f"model ready in {time.perf_counter() - t0:.1f}s; "
          f"KV pages/shard: {model.num_hbm_blocks}")

    prompts = [
        "Life blooms like a flower. Far away or by the road. Waiting",
        "A quick brown fox",
        "Artificial intelligence is",
        "To be or not to be,",
    ]
    requests = []
    for i, p in enumerate(prompts):
        r = Request(RawRequest(p, args.num_decode_steps))
        if tokenizer is not None:
            r.set_prompt_token_ids(tokenizer(p)["input_ids"])
        else:
            r.set_prompt_token_ids([(7 * (i + 1) + j) % model_config.vocab_size
                                    for j in range(8 + i)])
        r.seq_id = i
        requests.append(r)

    # prefill
    t0 = time.perf_counter()
    scheduled = [ScheduledSeq(r, r.prompt_len) for r in requests]
    tokens, rows = model.forward(scheduled)
    for i, s in enumerate(rows):
        if s is not None and s.samples_token:
            s.request.output_token_ids.append(int(tokens[i]))
            s.request.num_cached_tokens += s.n_tokens
    print(f"prefill ({sum(r.prompt_len for r in requests)} tokens): "
          f"{time.perf_counter() - t0 :.3f}s (incl. compile)")

    # decode loop
    t0 = time.perf_counter()
    for _ in range(args.num_decode_steps - 1):
        scheduled = [ScheduledSeq(r, 1) for r in requests]
        tokens, rows = model.forward(scheduled)
        for i, s in enumerate(rows):
            if s is not None and s.samples_token:
                s.request.output_token_ids.append(int(tokens[i]))
                s.request.num_cached_tokens += 1
    dt = time.perf_counter() - t0
    n_steps = args.num_decode_steps - 1
    if n_steps:
        print(f"decode: {n_steps} steps x {len(requests)} seqs in {dt:.3f}s "
              f"({len(requests) * n_steps / dt:.1f} tok/s incl. first-step compile)")

    for r in requests:
        if tokenizer is not None:
            print(f"  prompt: {r.prompt!r}")
            print(f"  output: {tokenizer.decode(r.output_token_ids)!r}")
        else:
            print(f"  seq {r.seq_id}: {r.output_token_ids}")


if __name__ == "__main__":
    main()
