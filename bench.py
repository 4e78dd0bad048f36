"""Benchmarks, printed as JSON lines (one object per line).

Default (no args): the RECORDED SUITE — every headline number the framework
claims, measured fresh. All configs run in ONE process (the tunneled chip
stalls ~3.5 min on each process's first device→host transfer, so subprocess
isolation would pay that stall per config; in-process it is paid once,
overlapped with the first config's weight upload by a warmup thread):

  1.  decode  8B-dims INT8  b16 c128    (BASELINE.md north-star config)
  2.  decode  1B-dims bf16  b64 c128
  3.  decode  1B-dims bf16  b8  c8192   (long context)
  4.  prefill 1B-dims bf16  b8  c2048
  5.  decode  8B-dims INT4  b16 c128
  6.  decode  1B-dims bf16  b1  c131072 (reference's 131Ki-token chart point,
                                         docs/assets/offline-llama-3-7b-a100.png)
  7.  decode  1B-dims bf16  b8  c128 spec-k4 (speculative-verify span steps,
                                         full-acceptance upper bound)
  8.  decode  1B-dims bf16  b128 c128   (reference chart-grid extreme)
  9.  prefill 1B-dims bf16  b1  c16384  (single-sequence long prefill)
  10. SARATHI mixed-step cost (decode TPOT with a concurrent chunk stream
      vs pure decode + pure chunks run separately)
  11. fp8 KV capacity (profiled pages bf16 vs fp8 at fixed HBM)
  12. REALIZED speculative decoding through the full engine (lookup-friendly
      workload; reports measured acceptance and tok/s spec-on vs spec-off)

``vs_baseline`` is the fraction of the chip's roofline ("speed of light")
achieved. For decode that is HBM bandwidth: a step at batch B must at minimum
stream all weights plus the batch's KV once, so

    tokens/s(SoL) = B * BW / (weight_bytes + B * kv_bytes_per_seq)

For prefill it is MXU compute with standard MFU accounting:
tokens/s(SoL) = peak_flops / (2 * n_params + causal-attention FLOPs/token);
the r1-r3 GEMM-only ratio is also printed as ``vs_gemm_roofline``.
This keeps the number hardware-honest (the reference's published baselines
are vs vLLM on NVIDIA GPUs and not comparable chip-for-chip; see BASELINE.md).

Single runs:  python bench.py --model 8b --quant int8 --batch 16
On-chip kernel selftest (Mosaic-compiled parity vs the jnp reference):
              python bench.py --selftest
"""

import argparse
import gc
import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

MODEL_DIMS = {
    # name: (layers, hidden, n_q, n_kv, head_dim, ffn, vocab)
    "tiny": (4, 512, 8, 4, 64, 1024, 8192),
    "1b": (22, 2048, 32, 4, 64, 5632, 32000),      # TinyLlama-1.1B dims
    "7b": (32, 4096, 32, 32, 128, 11008, 32000),   # Llama-2-7B dims
    "8b": (32, 4096, 32, 8, 128, 14336, 128256),   # Llama-3-8B dims
}

HBM_BW = {"v5e": 819e9, "v5 lite": 819e9, "v5litepod": 819e9,
          "v5p": 2765e9, "v4": 1228e9, "v6": 1640e9, "cpu": 100e9}

SUITE = [
    # multi-step 16 + 64-token pages: the tuned offline-throughput config
    # (multi-step decode is engine-integrated and lossless; ms16 measured
    # +9% relative over ms8 in r5 — docs/RESULTS_r5.md; serving uses ms8
    # for TPOT granularity).
    ["--model", "1b", "--batch", "64", "--context", "128", "--skip-prefill",
     "--multi-step", "16", "--block-size", "64"],
    # --profile-blocks: this entry sizes its cache via profile_num_blocks()
    # (the real-serving default path, VERDICT r2 weak #6) instead of an
    # explicit page count. ms16 + 64-token pages measured 2.1x the plain
    # single-step config within-session (0.36 -> 0.77; chunk size neutral
    # once pages are 64) — the long-context decode analog of the b64 tuning.
    ["--model", "1b", "--batch", "8", "--context", "8192", "--steps", "32",
     "--skip-prefill", "--profile-blocks", "--multi-step", "16",
     "--block-size", "64"],
    # --max-tokens 4096: 2 chunks/step measured best on chip (r4 sweep:
    # 0.471 vs 0.426 at 2048/step; 8192+ regressed).
    ["--model", "1b", "--batch", "8", "--context", "2048", "--mode", "prefill",
     "--max-tokens", "4096"],
    # ms16 + 64-token pages: same lossless multi-step as the INT8 flagship
    # (measured 0.698 vs 0.443 single-step within-session; INT4 stays ~34%
    # faster than INT8 in absolute tok/s).
    ["--model", "8b", "--batch", "16", "--context", "128", "--quant", "int4",
     "--skip-prefill", "--multi-step", "16", "--block-size", "64"],
    ["--model", "1b", "--batch", "1", "--context", "131072", "--steps", "16",
     "--skip-prefill", "--multi-step", "16"],
    # Speculative-verify span steps at full acceptance (upper bound; realized
    # serving speedup = (1+accepted)/(1+K) of this value).
    ["--model", "1b", "--batch", "8", "--context", "128", "--spec-k", "4",
     "--skip-prefill"],
    # Reference chart-grid extremes (README.md:93-103 axes): batch 128
    # decode, and a single-sequence long prefill.
    ["--model", "1b", "--batch", "128", "--context", "128", "--skip-prefill",
     "--multi-step", "16", "--block-size", "64"],
    ["--model", "1b", "--batch", "1", "--context", "16384", "--mode",
     "prefill", "--prefill-chunk", "4096", "--max-tokens", "4096"],
    # SARATHI mixed-step cost: decode TPOT with a concurrent chunk stream.
    ["--model", "1b", "--batch", "64", "--context", "128", "--mode", "mixed",
     "--steps", "16", "--block-size", "64"],
    # fp8 KV capacity (v5e has no fp8 datapath; capacity is the benefit).
    ["--model", "8b", "--quant", "int8", "--kv-capacity"],
    # REALIZED spec decoding through the full engine on a lookup-friendly
    # (periodic) workload: tok/s spec-on vs spec-off + measured acceptance.
    # (Loses ~10x on a high-RTT tunneled chip — drafting needs resolved
    # tokens, so every spec step drains the async pipeline; wins 1.10x on a
    # local-link host. See docs/RESULTS_r4.md.)
    ["--model", "1b", "--batch", "8", "--context", "120", "--steps", "24",
     "--spec-realized"],
    # Flagship last: the driver records the final JSON line as the round's
    # headline metric. ms16 (the same lossless engine-integrated multi-step
    # the 1B entries use) measured 0.887 vs 0.853 single-step on chip; the
    # 64-token pages match the tuned 1B decode entries.
    ["--model", "8b", "--batch", "16", "--context", "128", "--quant", "int8",
     "--skip-prefill", "--multi-step", "16", "--block-size", "64"],
]


def _log(msg: str):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _warm_reverse_channel():
    """The tunneled chip stalls minutes on a process's FIRST device→host
    transfer (reverse-channel dial); later gets are instant. Trigger the dial
    in a daemon thread at t=0 so the stall overlaps uploads and compiles."""
    def poke():
        try:
            import jax
            t0 = time.perf_counter()
            a = jax.device_put(np.zeros((8,), np.float32))
            np.asarray(jax.device_get(a))
            _log(f"reverse channel warm in {time.perf_counter() - t0:.0f}s")
        except Exception as e:   # pragma: no cover
            _log(f"reverse-channel warmup failed: {e}")
    th = threading.Thread(target=poke, daemon=True)
    th.start()
    return th


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=None, choices=sorted(MODEL_DIMS))
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--context", type=int, default=128, help="prefill length per seq")
    p.add_argument("--steps", type=int, default=64, help="timed decode steps")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--block-size", type=int, default=32,
                   help="KV page size in tokens (larger = fewer DMAs per row)")
    p.add_argument("--mode", default="decode",
                   choices=("decode", "prefill", "mixed"),
                   help="mixed: SARATHI piggyback cost — decode TPOT with a "
                        "concurrent prefill-chunk stream vs pure decode and "
                        "pure chunks run separately")
    p.add_argument("--quant", default="none", choices=("none", "int8", "int4"))
    p.add_argument("--kv-quant", default="none", choices=("none", "fp8"))
    p.add_argument("--use-pallas", default=None, type=lambda s: s.lower() in ("1", "true"))
    p.add_argument("--max-tokens", type=int, default=None,
                   help="per-step flat token budget (default max(2048, batch))")
    p.add_argument("--prefill-chunk", type=int, default=512,
                   help="prefill chunk per row per step; with --max-tokens "
                        "this sets tokens/step = min(batch*chunk, max_tokens)")
    p.add_argument("--skip-prefill", action="store_true",
                   help="seed KV pages directly (cache zeros) instead of "
                        "running prefill — decode timing is identical, setup "
                        "is O(1) instead of O(context)")
    p.add_argument("--multi-step", type=int, default=1,
                   help="decode mode: scan S decode steps inside one "
                        "program (on-device feedback feeds tokens between "
                        "inner steps) — amortizes per-dispatch overhead")
    p.add_argument("--spec-k", type=int, default=0,
                   help="decode mode: verify K drafts per row per step "
                        "(speculative-decoding span steps at full acceptance; "
                        "realized speedup = (1+accepted)/(1+K) of the printed "
                        "upper bound)")
    p.add_argument("--lora", type=int, default=0,
                   help="serve N stacked dummy LoRA adapters, requests "
                        "assigned round-robin (base + N-1 adapters) — "
                        "measures the dense-gather adapter overhead")
    p.add_argument("--spec-realized", action="store_true",
                   help="REALIZED speculative-decoding throughput through the "
                        "full engine on a lookup-friendly workload (periodic "
                        "prompt; greedy random-init models also cycle), spec "
                        "on vs off; reports measured acceptance")
    p.add_argument("--kv-capacity", action="store_true",
                   help="measure KV-cache CAPACITY (profiled pages at fixed "
                        "HBM) with bf16 vs fp8 KV and report the ratio — the "
                        "honest fp8 pitch on v5e, which has no fp8 datapath")
    p.add_argument("--profile-blocks", action="store_true",
                   help="size the cache via profile_num_blocks() (the real-"
                        "serving default path) instead of an explicit count")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--selftest", action="store_true")
    p.add_argument("--isolate", action="store_true",
                   help="run the suite one subprocess per config (debugging)")
    return p


def _config_cost_estimate(extra: list[str]) -> float:
    """Worst-case seconds a suite config may take on the tunneled chip
    (compiles + weight fill + timed steps), from r2 measurements. The suite
    skips (and SAYS it skipped) any config whose estimate exceeds the
    remaining budget, so the process exits rc=0 within the driver's window
    instead of being killed mid-config (the r2 artifact failure mode)."""
    cost = 45.0                                   # compile + setup floor
    if "8b" in extra:
        cost += 60.0                              # bigger weights + programs
    if "--mode" in extra:
        cost += 30.0                              # prefill re-runs per trial
    if "mixed" in extra:
        cost += 60.0                              # three timed regimes
    if "--kv-capacity" in extra:
        cost += 120.0                             # two model builds + probes
    if "--spec-realized" in extra:
        cost += 120.0                             # two engine builds + runs
    if "131072" in extra or "16384" in extra or "--profile-blocks" in extra:
        cost += 60.0                              # cache alloc / AOT profile
    return cost + 45.0                            # timed steps + margin
    # (r3 actuals: ~50 s per entry in-process; the watchdog at budget+240 s
    # hard-exits 0 anyway, so estimates only need to be roughly right.)


def _device_reachable(timeout_s: float = 600.0) -> bool:
    """Probe device init in a SUBPROCESS with a deadline: a dead tunnel hangs
    jax.devices() inside C++ (unkillable from Python), which would turn the
    whole suite into a silent driver timeout (the r2 rc=124 artifact)."""
    try:
        p = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=timeout_s)
        return p.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _arm_watchdog(deadline_s: float):
    """Hard-exit 0 if the suite overruns its budget: a tunnel that dies
    MID-suite hangs device transfers inside C++ (uninterruptible from
    Python), which would otherwise surface as the driver's rc=124. JSON
    lines already printed stay in the artifact; the watchdog just bounds
    the tail."""
    def _fire():
        # Diagnostic goes to STDERR: the driver parses the LAST stdout JSON
        # line as the round's headline metric, and a value-0 watchdog line
        # there would replace a real result (observed in the r5 rehearsal).
        _log("suite watchdog: hard-exit after budget overrun (slow or hung "
             "device); metrics printed so far are complete and valid")
        sys.stdout.flush()
        os._exit(0)
    t = threading.Timer(deadline_s, _fire)
    t.daemon = True
    t.start()
    return t


def run_suite(isolate: bool = False):
    budget = float(os.environ.get("SWIFTLLM_BENCH_BUDGET", 1500))
    t_start = time.monotonic()
    # Tail covers the flagship (which is never budget-skipped): a flagship
    # that STARTS must be allowed to finish before the hard-exit.
    watchdog = _arm_watchdog(budget + 240.0
                             + _config_cost_estimate(SUITE[-1]))
    if not _device_reachable():
        for extra in SUITE:
            print(json.dumps({"metric": "suite_" + "_".join(extra),
                              "value": 0, "unit": "NO_DEVICE",
                              "vs_baseline": 0.0,
                              "detail": "device init timed out (tunnel down)"}),
                  flush=True)
        watchdog.cancel()
        return
    if not isolate:
        _warm_reverse_channel()
    # The LAST suite entry is the flagship (the driver records the final
    # JSON line as the round's headline): reserve its cost so a slow tunnel
    # skips MIDDLE entries rather than the headline.
    flagship_cost = _config_cost_estimate(SUITE[-1])
    for i, extra in enumerate(SUITE):
        left = budget - (time.monotonic() - t_start)
        tag = "suite_" + "_".join(extra)
        last = i == len(SUITE) - 1
        # The flagship itself is never skipped (the watchdog bounds the tail
        # if the device is truly dead; a slow-but-alive run records it).
        if not last and left - flagship_cost < _config_cost_estimate(extra):
            print(json.dumps({"metric": tag, "value": 0,
                              "unit": "SKIPPED_BUDGET", "vs_baseline": 0.0}),
                  flush=True)
            continue
        if isolate:
            cmd = [sys.executable, os.path.abspath(__file__)] + extra
            try:
                out = subprocess.run(cmd, capture_output=True, text=True,
                                     timeout=left, cwd=os.path.dirname(
                                         os.path.abspath(__file__)))
                lines = [ln for ln in out.stdout.splitlines()
                         if ln.startswith("{")]
                if lines:
                    print(lines[-1], flush=True)
                else:
                    print(json.dumps({"metric": tag, "value": 0,
                                      "unit": "FAILED", "vs_baseline": 0.0,
                                      "stderr": out.stderr[-400:]}), flush=True)
            except subprocess.TimeoutExpired:
                print(json.dumps({"metric": tag, "value": 0, "unit": "TIMEOUT",
                                  "vs_baseline": 0.0}), flush=True)
            continue
        args = build_parser().parse_args(extra)
        try:
            run_one(args)
        except Exception as e:
            print(json.dumps({"metric": tag, "value": 0, "unit": "FAILED",
                              "vs_baseline": 0.0, "error": repr(e)[:2000]}),
                  flush=True)
        gc.collect()
    watchdog.cancel()


def run_selftest():
    """Run the full kernel case matrix with interpret=False on the real chip
    (Mosaic-compiled parity vs the pure-jnp reference)."""
    env = dict(os.environ, SWIFTLLM_KEEP_PLATFORM="1")
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_paged_attention.py",
         "-q", "-p", "no:cacheprovider"],
        capture_output=True, text=True, timeout=1500, env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    tail = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
    passed = 0
    for tok in tail.split():
        if tok.isdigit():
            passed = int(tok)
            break
    print(json.dumps({
        "metric": "onchip_kernel_selftest",
        "value": passed,
        "unit": "tests_passed",
        "vs_baseline": 1.0 if out.returncode == 0 else 0.0,
        "detail": tail,
    }))


def run_one(args):
    import jax

    from swiftllm_tpu.config import EngineConfig, LlamaModelConfig
    from swiftllm_tpu.server.scheduler import ScheduledSeq
    from swiftllm_tpu.server.structs import RawRequest, Request

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    use_pallas = args.use_pallas if args.use_pallas is not None else on_tpu

    L, D, nq, nkv, hd, F, V = MODEL_DIMS[args.model]
    mc = LlamaModelConfig(
        num_layers=L, num_q_heads=nq, num_kv_heads=nkv, hidden_size=D, head_dim=hd,
        ffn_inter_dim=F, vocab_size=V, max_position_embeddings=131072,
        rms_norm_eps=1e-5, rope_theta=10000.0)

    # Each timed step appends multi_step tokens per row — or 1+spec_k for
    # speculative-verify spans (every draft is force-accepted at full-
    # acceptance benchmarking, so the sequence grows by the whole span).
    per_step = max(args.multi_step, 1) * (1 + args.spec_k)
    total_len = args.context + args.steps * per_step + 8
    from swiftllm_tpu.utils import cdiv, next_power_of_2
    pages_per_seq = next_power_of_2(cdiv(total_len, args.block_size))
    rider_pages = 0
    if args.mode == "mixed":
        # The prefill rider sequence holds chunk*(steps+1) tokens by the end.
        rider_pages = next_power_of_2(
            cdiv(args.prefill_chunk * (args.steps + 1), args.block_size))
    ec_kw = dict(
        model_path="", use_dummy=True, dtype=args.dtype, block_size=args.block_size,
        quant=args.quant, kv_quant=args.kv_quant,
        num_hbm_blocks=(None if args.profile_blocks
                        else args.batch * pages_per_seq + rider_pages),
        num_cpu_blocks=0,
        max_blocks_per_seq=max(pages_per_seq, rider_pages),
        max_batch_size=args.batch,
        max_tokens_in_batch=args.max_tokens or max(2048, args.batch),
        prefill_chunk_size=args.prefill_chunk,
        max_seqs_in_block_table=max(args.batch + 1, 16),
        lora_paths=("dummy:" + ",".join(f"l{i}" for i in range(args.lora))
                    if args.lora else ""),
        use_pallas=use_pallas)
    ec = EngineConfig(**ec_kw)

    if args.spec_realized:
        # VERDICT r3 weak #3: the full-accept bound said nothing about real
        # text. This drives the ENGINE end-to-end (drafting, verify spans,
        # accept loop, page bookkeeping) on a lookup-friendly workload and
        # reports realized tok/s spec-on vs spec-off plus the measured
        # acceptance rate. Workload: periodic prompts (the n-gram proposer's
        # home turf — summarization/code-edit-like repetition); random-init
        # greedy models also fall into cycles, keeping acceptance high.
        import asyncio

        from swiftllm_tpu.server.engine import Engine
        from swiftllm_tpu.server.structs import RawRequest

        out_len = max(args.steps * 2, 64)
        rng_s = np.random.default_rng(0)
        prompts = []
        for i in range(args.batch):
            base = rng_s.integers(0, V, 12).tolist()
            prompts.append((base * (args.context // 12 + 1))[:args.context])

        def run_engine_once(spec_on: bool):
            ec2 = EngineConfig(**{**ec_kw, "enable_spec_decode": spec_on,
                                  "spec_k": args.spec_k or 4,
                                  "num_hbm_blocks": args.batch
                                  * next_power_of_2(cdiv(
                                      args.context + out_len + 8,
                                      args.block_size)),
                                  "max_blocks_per_seq": next_power_of_2(cdiv(
                                      args.context + out_len + 8,
                                      args.block_size))})
            engine = Engine(ec2, mc)

            async def body():
                await engine.initialize(tokenizer_backend="inline")
                loops = asyncio.create_task(engine.start_all_event_loops())
                # warm: one short request compiles the buckets off the clock
                await asyncio.wait_for(engine.add_request_and_wait(
                    RawRequest("", 8, prompt_token_ids=prompts[0])), 900)
                t0 = time.perf_counter()
                outs = await asyncio.wait_for(asyncio.gather(*[
                    engine.add_request_and_wait(
                        RawRequest("", out_len, prompt_token_ids=p))
                    for p in prompts]), 900)
                dt = time.perf_counter() - t0
                loops.cancel()
                n_out = sum(len(t) for _, t in outs)
                return n_out / dt, engine.stats

            return asyncio.run(body())

        tok_spec, stats = run_engine_once(True)
        acc = (stats.num_spec_accepted / stats.num_spec_drafted
               if stats.num_spec_drafted else 0.0)
        _log("spec-on engine run done")
        tok_plain, _ = run_engine_once(False)
        _log("spec-off engine run done")
        print(json.dumps({
            "metric": f"spec_realized_{args.model}_b{args.batch}_c{args.context}",
            "value": round(tok_spec, 2),
            "unit": "tokens/s/chip",
            "vs_baseline": round(tok_spec / max(tok_plain, 1e-9), 4),
            "detail": f"plain {tok_plain:.1f} tok/s; realized acceptance "
                      f"{acc:.2%} ({stats.num_spec_accepted}/"
                      f"{stats.num_spec_drafted} drafts)",
        }), flush=True)
        return

    if args.kv_capacity:
        # fp8 KV capacity: pages that fit the chip's HBM at each KV dtype,
        # via the real serving path (profile_num_blocks). v5e has no fp8
        # datapath, so CAPACITY (bigger batch/context at equal HBM) is the
        # honest benefit; theoretical ceiling = bf16_lane_bytes / fp8_lane
        # bytes (the per-token scale-lane tile dilutes narrow-KV models).
        from swiftllm_tpu.worker.model import LlamaModel
        counts = {}
        for kvq in ("none", "fp8"):
            m = LlamaModel(EngineConfig(**{**ec_kw, "kv_quant": kvq,
                                           "num_hbm_blocks": None}), mc)
            m.load_weights()
            counts[kvq] = m.profile_num_blocks()
            _log(f"kv_capacity[{kvq}] = {counts[kvq]} pages")
            del m
            gc.collect()
        ratio = counts["fp8"] / max(counts["none"], 1)
        lanes_bf16 = 2 * nkv * hd
        ceiling = 2 * lanes_bf16 / (lanes_bf16 + 128)
        qt = "" if args.quant == "none" else f"_{args.quant}"
        print(json.dumps({
            "metric": f"kv_capacity_fp8_vs_bf16_{args.model}{qt}",
            "value": round(ratio, 4),
            "unit": "x_pages",
            "vs_baseline": round(ratio / ceiling, 4),
            "detail": f"bf16={counts['none']} fp8={counts['fp8']} pages; "
                      f"dtype ceiling {ceiling:.2f}x",
        }), flush=True)
        return

    tprev = [time.perf_counter()]

    def t(label):
        now = time.perf_counter()
        _log(f"{args.model}/{args.mode}: {label} {now - tprev[0]:.1f}s")
        tprev[0] = now

    from swiftllm_tpu.worker.model import LlamaModel
    model = LlamaModel(ec, mc)
    model.load_weights()
    t("load_weights")
    model.init_kvcache_and_swap()
    if args.profile_blocks:
        _log(f"profiled num_hbm_blocks = {model.num_hbm_blocks}")
    t("init_kvcache")

    reqs = []
    rng = np.random.default_rng(0)
    for i in range(args.batch):
        r = Request(RawRequest("", args.steps + 4))
        r.set_prompt_token_ids(rng.integers(0, V, args.context).tolist())
        r.seq_id = i
        if args.lora:
            # round-robin over base (slot 0) + the N adapters
            r.lora_slot = i % (args.lora + 1)
        reqs.append(r)

    ms = max(args.multi_step, 1)

    def apply(tokens_dev, rows):
        """Count-level effects only; token values stay on device (the feedback
        buffer feeds them to the next step — no host sync in the loop)."""
        for i, s in enumerate(rows):
            if s is None:
                continue
            if s.drafts:
                # Spec span at simulated FULL acceptance: all span tokens
                # confirmed (token values are irrelevant to step timing).
                s.request.output_token_ids.extend([0] * s.n_tokens)
                s.request.num_cached_tokens += s.n_tokens
                continue
            if s.samples_token and ms > 1:
                # Multi-step decode: S tokens sampled per dispatch.
                s.request.output_token_ids.extend([None] * ms)
                s.request.num_cached_tokens += ms
                continue
            if s.samples_token:
                s.request.output_token_ids.append(None)
            s.request.num_cached_tokens += s.n_tokens
        return tokens_dev

    def run_prefill():
        last = None
        while any(r.is_prefill_stage() for r in reqs):
            sched = [ScheduledSeq(r, min(ec.prefill_chunk_size,
                                         r.num_uncached_tokens()))
                     for r in reqs if r.is_prefill_stage()]
            budget, batch = ec.max_tokens_in_batch, []
            for s in sched:
                if budget - s.n_tokens < 0:
                    break
                batch.append(s)
                budget -= s.n_tokens
            last = apply(*model.forward_async(batch))
        return last

    def seed_context():
        """Decode-only benches: allocate the context's KV pages directly (the
        zero-initialized cache is valid attention input) instead of running a
        full prefill — O(1) setup, identical decode timing."""
        for r in reqs:
            model.hbm_block_mgrs[0].allocate_fresh_for_seq(
                r.seq_id, len(r.prompt_token_ids))
            r.num_cached_tokens = len(r.prompt_token_ids)
            r.output_token_ids.append(0)   # decode stage; feedback slot is 0

    quant_tag = "" if args.quant == "none" else f"_{args.quant}"
    kv_tag = "" if args.kv_quant == "none" else f"_kv{args.kv_quant}"

    if args.mode == "prefill":
        # warmup (compile) on one cohort, then time a fresh identical cohort.
        jax.block_until_ready(run_prefill())
        t("prefill warmup/compile")
        for r in reqs:
            model.free_seqs_resources([r])
            r.num_cached_tokens = 0
            r.output_token_ids.clear()
        t0 = time.perf_counter()
        jax.block_until_ready(run_prefill())
        dt = time.perf_counter() - t0
        t("prefill timed")
        tok_per_s = args.batch * args.context / dt
        # Prefill roofline: compute-bound. FLOPs/token = 2*params (GEMMs) +
        # the causal attention matmuls (2 matmuls x 2 FLOP/MAC x n_q*hd x
        # avg context/2 per layer) — standard MFU accounting; at 16Ki
        # context attention is ~40% of the mandatory work and a
        # GEMM-only roofline overstates the gap ~1.7x.
        n_params = (V * D * 2 + L * D * (nq * hd + 2 * nkv * hd + hd * nq + 3 * F))
        attn_flops = 2 * nq * hd * L * args.context   # = 4 * nq*hd * L * ctx/2
        kind = dev.device_kind.lower()
        peak_flops = 197e12 if ("v5" in kind and "lite" in kind) else 100e12
        sol = peak_flops / (2 * n_params + attn_flops)
        print(json.dumps({
            "metric": f"prefill_throughput_{args.model}_b{args.batch}_c{args.context}{quant_tag}",
            "value": round(tok_per_s, 2),
            "unit": "tokens/s/chip",
            "vs_baseline": round(tok_per_s / sol, 4),
            # r1-r3 used a GEMM-only denominator; kept for cross-round
            # comparability (the headline vs_baseline is the standard
            # attention-inclusive MFU).
            "vs_gemm_roofline": round(tok_per_s * 2 * n_params / peak_flops, 4),
        }), flush=True)
        return

    if args.mode == "mixed":
        # SARATHI piggyback cost: (batch-1) decode rows + ONE prefill chunk
        # per step, vs pure decode and pure chunks run as separate steps.
        # vs_baseline = (t_dec + t_pre) / t_mixed — > 1 means the mixed step
        # beats running the two workloads back-to-back (the whole point of
        # piggybacking; the reference left it as a comment,
        # swiftllm/server/scheduler.py:92-99).
        ndec = args.batch - 1
        reqs = reqs[:ndec]
        seed_context()
        chunk = ec.prefill_chunk_size
        n_chunks = args.steps

        def rider():
            r = Request(RawRequest("", 4))
            r.set_prompt_token_ids(
                rng.integers(0, V, chunk * (n_chunks + 1)).tolist())
            r.seq_id = ndec
            return r

        dec = lambda: [ScheduledSeq(r, 1) for r in reqs]  # noqa: E731

        def timed(make_sched, n, warm=1):
            for _ in range(warm):
                jax.block_until_ready(apply(*model.forward_async(make_sched())))
            t0 = time.perf_counter()
            last = None
            for _ in range(n):
                last = apply(*model.forward_async(make_sched()))
            jax.block_until_ready(last)
            return (time.perf_counter() - t0) / n

        t_dec = timed(dec, args.steps)
        t("pure decode timed")
        pr = rider()
        mix = lambda: dec() + [ScheduledSeq(                   # noqa: E731
            pr, min(chunk, pr.num_uncached_tokens()))]
        t_mixed = timed(mix, n_chunks - 1)
        t("mixed timed")
        model.free_seqs_resources([pr])
        pr2 = rider()
        pre = lambda: [ScheduledSeq(                            # noqa: E731
            pr2, min(chunk, pr2.num_uncached_tokens()))]
        t_pre = timed(pre, n_chunks - 1)
        t("pure chunk timed")
        print(json.dumps({
            "metric": f"sarathi_mixed_step_{args.model}_b{args.batch}_c{args.context}",
            "value": round(t_mixed * 1e3, 3),
            "unit": "ms/step",
            "vs_baseline": round((t_dec + t_pre) / t_mixed, 4),
            "detail": f"pure decode {t_dec*1e3:.3f} ms + pure chunk "
                      f"{t_pre*1e3:.3f} ms vs mixed {t_mixed*1e3:.3f} ms "
                      f"({ndec} decode rows + one {chunk}-token chunk)",
        }), flush=True)
        return

    if args.skip_prefill:
        seed_context()
    else:
        run_prefill()
    t("prefill/seed")

    # warmup decode (compile)
    spec_k = args.spec_k

    def decode_sched():
        if spec_k:
            return [ScheduledSeq(r, 1 + spec_k, drafts=(0,) * spec_k)
                    for r in reqs]
        return [ScheduledSeq(r, 1) for r in reqs]

    jax.block_until_ready(apply(*model.forward_async(decode_sched(),
                                                     multi_step=ms)))
    t("decode compile")

    t0 = time.perf_counter()
    last = None
    for _ in range(args.steps):
        last = apply(*model.forward_async(decode_sched(), multi_step=ms))
    jax.block_until_ready(last)
    dt = time.perf_counter() - t0
    t("decode timed")
    tok_per_s = args.batch * args.steps * (1 + spec_k) * ms / dt

    # speed-of-light roofline
    weight_bytes = sum(x.nbytes for x in jax.tree.leaves(model.params))
    kv_per_seq = (2 * L * model.num_kv_eff * hd * model.kv_dtype.itemsize
                  * (args.context + args.steps * ms // 2))
    kind = dev.device_kind.lower()
    bw = next((v for k, v in HBM_BW.items() if k in kind), HBM_BW["cpu"])
    if not on_tpu:
        bw = HBM_BW["cpu"]
    sol_tok_per_s = args.batch * bw / (weight_bytes + args.batch * kv_per_seq)
    if spec_k:
        # A spec step still streams the weights ONCE but can confirm up to
        # 1+K tokens: the speed of light scales accordingly, so vs_baseline
        # stays a step-efficiency number. Realized serving speedup is
        # acceptance-dependent: (1 + accepted) / (1 + K) of this bound.
        sol_tok_per_s *= (1 + spec_k)

    lora_tag = f"_lora{args.lora}" if args.lora else ""
    spec_tag = f"_speck{spec_k}" if spec_k else ""
    if ms > 1:
        spec_tag += f"_ms{ms}"
    print(json.dumps({
        "metric": f"decode_throughput_{args.model}_b{args.batch}_c{args.context}{quant_tag}{kv_tag}{lora_tag}{spec_tag}",
        "value": round(tok_per_s, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": round(tok_per_s / sol_tok_per_s, 4),
    }), flush=True)


def main():
    args = build_parser().parse_args()
    if args.selftest:
        run_selftest()
        return
    if args.model is None:
        run_suite(isolate=args.isolate)   # bare `python bench.py` records the suite
        # Hard-exit after a complete suite: tearing down the JAX client over
        # a degraded tunnel can abort() in C++ AFTER every metric printed,
        # which would turn a fully-recorded run into a nonzero exit code.
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)
    run_one(args)


if __name__ == "__main__":
    main()
