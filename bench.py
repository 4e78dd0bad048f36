"""Benchmark: decode throughput (tokens/s/chip), printed as ONE JSON line.

``vs_baseline`` is the fraction of the chip's HBM-bandwidth roofline ("speed
of light") achieved: a decode step at batch B must at minimum stream all
weights plus the batch's KV once from HBM, so

    tokens/s(SoL) = B * BW / (weight_bytes + B * kv_bytes_per_seq)

This makes the number hardware-honest (the reference's baselines are vs vLLM
on NVIDIA GPUs and not comparable chip-for-chip; see BASELINE.md).
"""

import argparse
import json
import time

import numpy as np

import jax

from swiftllm_tpu.config import EngineConfig, LlamaModelConfig
from swiftllm_tpu.server.scheduler import ScheduledSeq
from swiftllm_tpu.server.structs import RawRequest, Request

MODEL_DIMS = {
    # name: (layers, hidden, n_q, n_kv, head_dim, ffn, vocab)
    "tiny": (4, 512, 8, 4, 64, 1024, 8192),
    "1b": (22, 2048, 32, 4, 64, 5632, 32000),      # TinyLlama-1.1B dims
    "7b": (32, 4096, 32, 32, 128, 11008, 32000),   # Llama-2-7B dims
    "8b": (32, 4096, 32, 8, 128, 14336, 128256),   # Llama-3-8B dims
}

HBM_BW = {"v5e": 819e9, "v5 lite": 819e9, "v5litepod": 819e9,
          "v5p": 2765e9, "v4": 1228e9, "v6": 1640e9, "cpu": 100e9}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="1b", choices=sorted(MODEL_DIMS))
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--context", type=int, default=128, help="prefill length per seq")
    p.add_argument("--steps", type=int, default=64, help="timed decode steps")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--block-size", type=int, default=32,
                   help="KV page size in tokens (larger = fewer DMAs per row)")
    p.add_argument("--mode", default="decode", choices=("decode", "prefill"))
    p.add_argument("--quant", default="none", choices=("none", "int8", "int4"))
    p.add_argument("--kv-quant", default="none", choices=("none", "fp8"))
    p.add_argument("--kv-scale", type=float, default=1.0)
    p.add_argument("--use-pallas", default=None, type=lambda s: s.lower() in ("1", "true"))
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

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
        quant=args.quant, kv_quant=args.kv_quant, kv_scale=args.kv_scale,
        num_hbm_blocks=args.batch * pages_per_seq,
        num_cpu_blocks=0,
        max_blocks_per_seq=pages_per_seq,
        max_batch_size=args.batch,
        max_tokens_in_batch=max(2048, args.batch),
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
                     for r in reqs if r.num_uncached_tokens() > 0]
            budget, batch = ec.max_tokens_in_batch, []
            for s in sched:
                if budget - s.n_tokens < 0:
                    break
                batch.append(s)
                budget -= s.n_tokens
            last = apply(*model.forward_async(batch))
        return last

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
            "metric": f"prefill_throughput_{args.model}_b{args.batch}_c{args.context}",
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
        "metric": f"decode_throughput_{args.model}_b{args.batch}_c{args.context}",
        "value": round(tok_per_s, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": round(tok_per_s / sol_tok_per_s, 4),
    }))


if __name__ == "__main__":
    main()
