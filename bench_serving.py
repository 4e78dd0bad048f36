"""Online serving benchmark: Poisson arrivals against the in-process Engine.

Methodology follows the reference's online experiments (README.md:105-109):
requests with ShareGPT-like length distributions arrive as a Poisson process
at a given rate; we report TTFT (time to first token) and TPOT (per output
token) percentiles plus sustained throughput. Prints ONE JSON line per rate.

``vs_baseline`` compares our TPOT p50 against the reference's published
per-output-token latency curve on an A100 80G (BASELINE.md: ~15 ms at
1 req/s rising to ~105 ms at 7.2 req/s, read off its chart) at the same
request rate: values > 1 mean lower latency than the reference system on its
own GPU. Different hardware — a context number, not a controlled comparison.

Run on the chip:   python bench_serving.py --model 1b --rate 4 --num-requests 64
Rate sweep (knee): python bench_serving.py --model 1b --sweep 1,2,4,6 --num-requests 48
Hermetic (CPU):    python bench_serving.py --cpu --model tiny --rate 8 --num-requests 16
"""

import argparse
import asyncio
import json
import time

import numpy as np

from swiftllm_tpu.config import EngineConfig, LlamaModelConfig


def reference_tpot_ms(rate: float) -> float:
    """Reference per-output-token latency at `rate` req/s (A100 80G, chart at
    docs/assets/online-llama-3-7b-a100.png; BASELINE.md row 6): ~15 ms at
    1 req/s to ~105 ms at 7.2 req/s, interpolated linearly."""
    return max(15.0, 15.0 + (105.0 - 15.0) * (rate - 1.0) / (7.2 - 1.0))

MODEL_DIMS = {
    # name: (layers, hidden, n_q, n_kv, head_dim, ffn, vocab)
    "tiny": (2, 64, 4, 2, 16, 128, 256),
    "1b": (22, 2048, 32, 4, 64, 5632, 32000),
    "7b": (32, 4096, 32, 32, 128, 11008, 32000),
    "8b": (32, 4096, 32, 8, 128, 14336, 128256),
}


async def run_client(engine, raw, arrival_s, t0, results):
    from swiftllm_tpu.server.structs import RawRequest
    await asyncio.sleep(max(0.0, arrival_s - (time.perf_counter() - t0)))
    t_submit = time.perf_counter()
    stamps = []
    async for _ in engine.add_request_and_stream(raw):
        stamps.append(time.perf_counter())
    if not stamps:
        return
    ttft = stamps[0] - t_submit
    tpot = ((stamps[-1] - stamps[0]) / max(len(stamps) - 1, 1)
            if len(stamps) > 1 else 0.0)
    results.append({"ttft": ttft, "tpot": tpot, "n_tokens": len(stamps),
                    "finish": stamps[-1]})


async def main_async(args):
    from swiftllm_tpu.server.engine import Engine
    from swiftllm_tpu.server.structs import RawRequest

    L, D, nq, nkv, hd, F, V = MODEL_DIMS[args.model]
    mc = LlamaModelConfig(
        num_layers=L, num_q_heads=nq, num_kv_heads=nkv, hidden_size=D,
        head_dim=hd, ffn_inter_dim=F, vocab_size=V,
        max_position_embeddings=131072, rms_norm_eps=1e-5)
    ec = EngineConfig(
        model_path="", use_dummy=True, block_size=args.block_size,
        num_hbm_blocks=args.num_hbm_blocks, num_cpu_blocks=args.num_cpu_blocks,
        max_blocks_per_seq=args.max_blocks_per_seq,
        max_batch_size=args.max_batch_size,
        max_tokens_in_batch=args.max_tokens_in_batch,
        prefill_chunk_size=args.prefill_chunk_size,
        max_seqs_in_block_table=max(args.max_batch_size * 4, 64),
        enable_prefix_caching=args.enable_prefix_caching,
        multi_step_decode=args.multi_step,
        use_pallas=not args.cpu)

    engine = Engine(ec, mc)
    await engine.initialize(tokenizer_backend="inline")
    # Compile the full serving working set up front (pages are bucket-pinned,
    # so this is exactly three programs); measured TTFT then reflects
    # steady-state serving, not XLA compilation.
    await engine.warmup()
    loops = asyncio.create_task(engine.start_all_event_loops())

    rng = np.random.default_rng(args.seed)
    # ShareGPT-like: lognormal prompt/output lengths clipped to sane ranges.
    prompt_lens = np.clip(rng.lognormal(np.log(args.mean_prompt), 0.6,
                                        args.num_requests), 8, 2048).astype(int)
    output_lens = np.clip(rng.lognormal(np.log(args.mean_output), 0.6,
                                        args.num_requests), 4, 1024).astype(int)

    # --shared-prefix N: every request opens with the same N tokens (a system
    # prompt). With --enable-prefix-caching the engine prefills those pages
    # once; TTFT for every later request drops by ~N/prefill-throughput.
    shared = (rng.integers(0, V, args.shared_prefix).tolist()
              if args.shared_prefix else [])

    def make_raws():
        return [RawRequest("", int(output_lens[i]),
                           prompt_token_ids=shared + rng.integers(
                               0, V, int(prompt_lens[i])).tolist())
                for i in range(args.num_requests)]

    # Warmup pass: populate the per-bucket compile caches so measured TTFTs
    # reflect steady-state serving, not XLA compilation.
    if args.warmup:
        warm: list[dict] = []
        t0 = time.perf_counter()
        await asyncio.gather(*[
            run_client(engine, r, 0.0, t0, warm) for r in make_raws()[:8]])

    rates = ([float(r) for r in args.sweep.split(",")] if args.sweep
             else [args.rate])
    for rate in rates:
        inter = rng.exponential(1.0 / rate, args.num_requests)
        arrivals = np.cumsum(inter)
        results: list[dict] = []
        t0 = time.perf_counter()
        raws = make_raws()
        await asyncio.gather(*[
            run_client(engine, raws[i], float(arrivals[i]), t0, results)
            for i in range(args.num_requests)])
        wall = max(r["finish"] for r in results) - t0

        ttfts = sorted(r["ttft"] for r in results)
        tpots = sorted(r["tpot"] for r in results if r["n_tokens"] > 1)
        total_tokens = sum(r["n_tokens"] for r in results)

        def pct(xs, p):
            return (float(xs[min(int(len(xs) * p / 100), len(xs) - 1)])
                    if xs else 0.0)

        tpot_p50_ms = pct(tpots, 50) * 1e3
        print(json.dumps({
            "metric": f"online_{args.model}_rate{rate:g}",
            "value": round(total_tokens / wall, 2),
            "unit": "tokens/s",
            "vs_baseline": (round(reference_tpot_ms(rate) / tpot_p50_ms, 3)
                            if tpot_p50_ms else 0.0),
            "detail": {
                "num_requests": len(results),
                "ttft_p50_ms": round(pct(ttfts, 50) * 1e3, 1),
                "ttft_p90_ms": round(pct(ttfts, 90) * 1e3, 1),
                "tpot_p50_ms": round(tpot_p50_ms, 1),
                "tpot_p90_ms": round(pct(tpots, 90) * 1e3, 1),
                "ref_tpot_p50_ms": round(reference_tpot_ms(rate), 1),
                "preemptions": engine.stats.num_preemptions,
                "steps": engine.stats.num_steps,
                # With prefix caching, matched prompt pages never prefill:
                # this counter falls below the submitted prompt-token total.
                "prompt_tokens_prefilled": engine.stats.num_prompt_tokens,
            },
        }), flush=True)
    loops.cancel()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="1b", choices=sorted(MODEL_DIMS))
    p.add_argument("--rate", type=float, default=4.0, help="requests/s (Poisson)")
    p.add_argument("--sweep", type=str, default="",
                   help="comma-separated rates; one JSON line each (knee sweep)")
    p.add_argument("--num-requests", type=int, default=64)
    p.add_argument("--mean-prompt", type=float, default=160)
    p.add_argument("--mean-output", type=float, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--block-size", type=int, default=32)
    p.add_argument("--num-hbm-blocks", type=int, default=4096)
    p.add_argument("--num-cpu-blocks", type=int, default=1024)
    p.add_argument("--max-blocks-per-seq", type=int, default=128)
    p.add_argument("--max-batch-size", type=int, default=64)
    p.add_argument("--max-tokens-in-batch", type=int, default=2048)
    p.add_argument("--prefill-chunk-size", type=int, default=512)
    p.add_argument("--shared-prefix", type=int, default=0,
                   help="tokens of common prompt prefix across all requests")
    p.add_argument("--enable-prefix-caching",
                   type=lambda s: s.lower() in ("1", "true"), default=False)
    p.add_argument("--multi-step", type=int, default=1,
                   help="scan S decode steps per dispatch (pure-decode "
                        "batches; amortizes per-dispatch host/link cost — "
                        "essential on a high-RTT tunneled chip)")
    p.add_argument("--warmup", type=lambda s: s.lower() in ("1", "true"),
                   default=True)
    args = p.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    asyncio.run(main_async(args))


if __name__ == "__main__":
    main()
