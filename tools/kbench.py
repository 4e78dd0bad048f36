"""Microbenchmark the attention kernels in isolation (µs per pallas call).

Times ragged_paged_attention directly on synthetic inputs at bench-suite
shapes, so kernel edits are evaluated in seconds instead of via a full bench
run. Prints one JSON line per config.

    python tools/kbench.py               # tile (prefill) + decode configs
    python tools/kbench.py tile          # tile kernel only
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax
import jax.numpy as jnp

from swiftllm_tpu.models.llama import StepBatch
from swiftllm_tpu.ops.paged_attention import ragged_paged_attention


def make_batch(B, T, Pg, page_size, q_lens, seq_lens):
    q_starts = np.full(B, T, np.int32)
    start = 0
    for i, n in enumerate(q_lens):
        q_starts[i] = start
        start += int(np.ceil(n / 128) * 128) if n else 0
    pt = np.zeros((B, Pg), np.int32)
    # Distinct (non-contiguous) pages per row: stride rows apart.
    for b in range(B):
        pt[b] = b + np.arange(Pg, dtype=np.int32) * B
    return StepBatch(
        token_ids=jnp.zeros((T,), jnp.int32),
        positions=jnp.zeros((T,), jnp.int32),
        kv_slots=jnp.zeros((T,), jnp.int32),
        q_starts=jnp.asarray(q_starts),
        q_lens=jnp.asarray(np.asarray(q_lens, np.int32)),
        seq_lens=jnp.asarray(np.asarray(seq_lens, np.int32)),
        page_table=jnp.asarray(pt),
        sample_mask=jnp.zeros((B,), bool),
    )


def bench_tile(name, B, q_lens, seq_lens, *, n_q=32, n_kv=4, hd=64,
               page_size=32, q_bucket=2048, L=1, iters=50):
    T = q_bucket
    Pg = int(np.ceil(max(seq_lens) / page_size))
    Pg = max(Pg, 4)
    S = (B * Pg + 1) * page_size
    batch = make_batch(B, T, Pg, page_size, q_lens, seq_lens)
    q = jnp.asarray(np.random.default_rng(0).standard_normal(
        (T, n_q, hd), np.float32), jnp.bfloat16)
    cache = jnp.asarray(np.random.default_rng(1).standard_normal(
        (L, S, n_kv * 2 * hd), np.float32), jnp.bfloat16)

    CHAIN = 8   # kernel calls per dispatch: hides the ~1 ms tunnel latency

    @jax.jit
    def run(q, cache):
        out = q
        for _ in range(CHAIN):   # chained: out feeds the next call's q
            out = ragged_paged_attention(
                out.astype(q.dtype), cache, jnp.int32(0), batch, n_kv=n_kv,
                page_size=page_size, sm_scale=hd ** -0.5, q_bucket=q_bucket)
        return out

    out = run(q, cache)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(q, cache)
    jax.block_until_ready(out)
    us = (time.perf_counter() - t0) / (iters * CHAIN) * 1e6
    print(json.dumps({"kbench": name, "us_per_call": round(us, 1)}),
          flush=True)
    return us


def bench_decode(name, B, hist, *, n_q=32, n_kv=4, hd=64, page_size=64,
                 iters=50, contiguous=True, R=None):
    """Decode kernel: B rows, 1 token each, history `hist` tokens/row."""
    import os
    if R is not None:
        os.environ["SWIFTLLM_DECODE_R"] = str(R)
    T = B
    Pg = max(4, int(np.ceil((hist + 1) / page_size)))
    S = (B * Pg + 1) * page_size
    q_lens = [1] * B
    seq_lens = [hist + 1] * B
    batch = make_batch(B, T, Pg, page_size, q_lens, seq_lens)
    if contiguous:   # rows own consecutive pages (the fast-path layout)
        pt = np.stack([b * Pg + np.arange(Pg, dtype=np.int32)
                       for b in range(B)])
        import dataclasses
        batch = dataclasses.replace(
            batch, page_table=jnp.asarray(pt),
            q_starts=jnp.arange(B, dtype=jnp.int32),
            kv_slots=jnp.asarray((pt[:, 0] * page_size
                                  + hist % page_size).astype(np.int32)))
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((T, n_q, hd), np.float32),
                    jnp.bfloat16)
    kv_new = jnp.asarray(rng.standard_normal((T, n_kv * 2 * hd), np.float32),
                         jnp.bfloat16)
    cache = jnp.asarray(rng.standard_normal((1, S, n_kv * 2 * hd), np.float32),
                        jnp.bfloat16)

    CHAIN = 8   # kernel calls per dispatch: hides the ~1 ms tunnel latency

    @jax.jit
    def run(q, cache, kv_new):
        out = None
        for _ in range(CHAIN):   # chained on the aliased cache
            out, cache = ragged_paged_attention(
                q, cache, jnp.int32(0), batch, n_kv=n_kv,
                page_size=page_size, sm_scale=hd ** -0.5, q_bucket=1,
                kv_new=kv_new)
        return out, cache

    out, cache = run(q, cache, kv_new)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out, cache = run(q, cache, kv_new)
    jax.block_until_ready((out, cache))
    us = (time.perf_counter() - t0) / (iters * CHAIN) * 1e6
    print(json.dumps({"kbench": name, "us_per_call": round(us, 1)}),
          flush=True)
    if R is not None:
        os.environ.pop("SWIFTLLM_DECODE_R", None)
    return us


def main():
    import bench
    bench._warm_reverse_channel()   # overlap the tunnel's first-get stall
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "tile"):
        # bench prefill step shapes: 4 rows x 512-token chunks, growing hist.
        bench_tile("tile_4x512_hist512", 8, [512] * 4 + [0] * 4,
                   [512] * 4 + [0] * 4)
        bench_tile("tile_4x512_hist2048", 8, [512] * 4 + [0] * 4,
                   [2048] * 4 + [0] * 4)
        # 8 x 512-token spans need a 4096-token bucket (8*512 > 2048; an
        # undersized bucket DMAs q out of bounds and ABORTS the backend).
        bench_tile("tile_8x512_hist2048", 8, [512] * 8, [2048] * 8,
                   q_bucket=4096)
        bench_tile("tile_1x2048_hist2048", 8, [2048] + [0] * 7,
                   [2048] + [0] * 7)
        # Skipped-grid-step overhead probe: 1 active span of 63 grid steps.
        bench_tile("tile_1x256_hist256", 8, [256] + [0] * 7,
                   [256] + [0] * 7)
    if which in ("all", "decode"):
        # bench decode-suite shape: b64 c128 after ~200 generated tokens.
        for R in (2, 4, 8):
            bench_decode(f"decode_b64_hist320_R{R}", 64, 320, R=R)
        bench_decode("decode_b64_hist320_frag", 64, 320, contiguous=False)
        bench_decode("decode_b16_hist8k", 16, 8192)


if __name__ == "__main__":
    main()
