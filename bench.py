"""Benchmarks, printed as JSON lines (one object per line).

Default (no args): the RECORDED SUITE — every headline number the framework
claims, measured fresh, one subprocess per config so HBM is returned between
models:

  1. decode  8B-dims INT8  b16 c128   (BASELINE.md north-star config)
  2. decode  1B-dims bf16  b64 c128
  3. decode  1B-dims bf16  b8  c8192  (long context)
  4. prefill 1B-dims bf16  b8  c2048
  5. decode  8B-dims INT4  b16 c128

``vs_baseline`` is the fraction of the chip's roofline ("speed of light")
achieved. For decode that is HBM bandwidth: a step at batch B must at minimum
stream all weights plus the batch's KV once, so

    tokens/s(SoL) = B * BW / (weight_bytes + B * kv_bytes_per_seq)

For prefill it is MXU compute: tokens/s(SoL) = peak_flops / (2 * n_params).
This keeps the number hardware-honest (the reference's published baselines
are vs vLLM on NVIDIA GPUs and not comparable chip-for-chip; see BASELINE.md).

Single runs:  python bench.py --model 8b --quant int8 --batch 16
On-chip kernel selftest (Mosaic-compiled parity vs the jnp reference):
              python bench.py --selftest
"""

import argparse
import json
import os
import subprocess
import sys
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
    ["--model", "8b", "--batch", "16", "--context", "128", "--quant", "int8"],
    ["--model", "1b", "--batch", "64", "--context", "128"],
    ["--model", "1b", "--batch", "8", "--context", "8192", "--steps", "32"],
    ["--model", "1b", "--batch", "8", "--context", "2048", "--mode", "prefill"],
    ["--model", "8b", "--batch", "16", "--context", "128", "--quant", "int4"],
]


def run_suite():
    for extra in SUITE:
        cmd = [sys.executable, os.path.abspath(__file__)] + extra
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=1800, cwd=os.path.dirname(
                                     os.path.abspath(__file__)))
            lines = [ln for ln in out.stdout.splitlines()
                     if ln.startswith("{")]
            if lines:
                print(lines[-1], flush=True)
            else:
                print(json.dumps({"metric": "suite_" + "_".join(extra),
                                  "value": 0, "unit": "FAILED",
                                  "vs_baseline": 0.0,
                                  "stderr": out.stderr[-400:]}), flush=True)
        except subprocess.TimeoutExpired:
            print(json.dumps({"metric": "suite_" + "_".join(extra),
                              "value": 0, "unit": "TIMEOUT",
                              "vs_baseline": 0.0}), flush=True)


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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=None, choices=sorted(MODEL_DIMS))
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--context", type=int, default=128, help="prefill length per seq")
    p.add_argument("--steps", type=int, default=64, help="timed decode steps")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--block-size", type=int, default=32,
                   help="KV page size in tokens (larger = fewer DMAs per row)")
    p.add_argument("--mode", default="decode", choices=("decode", "prefill"))
    p.add_argument("--quant", default="none", choices=("none", "int8", "int4"))
    p.add_argument("--kv-quant", default="none", choices=("none", "fp8"))
    p.add_argument("--use-pallas", default=None, type=lambda s: s.lower() in ("1", "true"))
    p.add_argument("--max-tokens", type=int, default=None,
                   help="per-step flat token budget (default max(2048, batch))")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--selftest", action="store_true")
    args = p.parse_args()

    if args.selftest:
        run_selftest()
        return
    if args.model is None:
        run_suite()          # bare `python bench.py` records the whole suite
        return

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

    total_len = args.context + args.steps + 8
    from swiftllm_tpu.utils import cdiv, next_power_of_2
    pages_per_seq = next_power_of_2(cdiv(total_len, args.block_size))
    ec = EngineConfig(
        model_path="", use_dummy=True, dtype=args.dtype, block_size=args.block_size,
        quant=args.quant, kv_quant=args.kv_quant,
        num_hbm_blocks=args.batch * pages_per_seq,
        num_cpu_blocks=0,
        max_blocks_per_seq=pages_per_seq,
        max_batch_size=args.batch,
        max_tokens_in_batch=args.max_tokens or max(2048, args.batch),
        prefill_chunk_size=512,
        max_seqs_in_block_table=max(args.batch, 16),
        use_pallas=use_pallas)

    from swiftllm_tpu.worker.model import LlamaModel
    model = LlamaModel(ec, mc)
    model.load_weights()
    model.init_kvcache_and_swap()

    reqs = []
    rng = np.random.default_rng(0)
    for i in range(args.batch):
        r = Request(RawRequest("", args.steps + 4))
        r.set_prompt_token_ids(rng.integers(0, V, args.context).tolist())
        r.seq_id = i
        reqs.append(r)

    def apply(tokens_dev, rows):
        """Count-level effects only; token values stay on device (the feedback
        buffer feeds them to the next step — no host sync in the loop)."""
        for i, s in enumerate(rows):
            if s is None:
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

    quant_tag = "" if args.quant == "none" else f"_{args.quant}"
    kv_tag = "" if args.kv_quant == "none" else f"_kv{args.kv_quant}"

    if args.mode == "prefill":
        # warmup (compile) on one cohort, then time a fresh identical cohort.
        jax.block_until_ready(run_prefill())
        for r in reqs:
            model.free_seqs_resources([r])
            r.num_cached_tokens = 0
            r.output_token_ids.clear()
        t0 = time.perf_counter()
        jax.block_until_ready(run_prefill())
        dt = time.perf_counter() - t0
        tok_per_s = args.batch * args.context / dt
        # Prefill roofline: compute-bound. FLOPs/token ≈ 2 * params.
        n_params = (V * D * 2 + L * D * (nq * hd + 2 * nkv * hd + hd * nq + 3 * F))
        kind = dev.device_kind.lower()
        peak_flops = 197e12 if ("v5" in kind and "lite" in kind) else 100e12
        sol = peak_flops / (2 * n_params)
        print(json.dumps({
            "metric": f"prefill_throughput_{args.model}_b{args.batch}_c{args.context}{quant_tag}",
            "value": round(tok_per_s, 2),
            "unit": "tokens/s/chip",
            "vs_baseline": round(tok_per_s / sol, 4),
        }))
        return

    run_prefill()

    # warmup decode (compile)
    jax.block_until_ready(apply(*model.forward_async(
        [ScheduledSeq(r, 1) for r in reqs])))

    t0 = time.perf_counter()
    last = None
    for _ in range(args.steps):
        last = apply(*model.forward_async([ScheduledSeq(r, 1) for r in reqs]))
    jax.block_until_ready(last)
    dt = time.perf_counter() - t0
    tok_per_s = args.batch * args.steps / dt

    # speed-of-light roofline
    weight_bytes = sum(x.nbytes for x in jax.tree.leaves(model.params))
    kv_per_seq = (2 * L * model.num_kv_eff * hd * model.kv_dtype.itemsize
                  * (args.context + args.steps // 2))
    kind = dev.device_kind.lower()
    bw = next((v for k, v in HBM_BW.items() if k in kind), HBM_BW["cpu"])
    if not on_tpu:
        bw = HBM_BW["cpu"]
    sol_tok_per_s = args.batch * bw / (weight_bytes + args.batch * kv_per_seq)

    print(json.dumps({
        "metric": f"decode_throughput_{args.model}_b{args.batch}_c{args.context}{quant_tag}{kv_tag}",
        "value": round(tok_per_s, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": round(tok_per_s / sol_tok_per_s, 4),
    }))


if __name__ == "__main__":
    main()
