"""On-chip sweep for the weakest recorded decode point: 1B b8 c8192 (0.545).

Candidates: multi-step 16 (amortizes per-step head + grid-pipeline latency),
bigger KV chunks (SWIFTLLM_DECODE_CHUNK raises the 256-token floor so the
VMEM-capped ceiling is reached), R=8 (one grid group instead of two), and
64-token pages (fewer page-table entries / bigger contiguous DMAs).

Runs IN ONE PROCESS (the tunneled chip pays its reverse-channel stall once).

    python tools/sweep_b8long.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

BASE = ["--model", "1b", "--batch", "8", "--context", "8192",
        "--skip-prefill", "--steps", "16"]


def run(extra, env=None):
    env = env or {}
    tag = "_".join(extra) + "|" + ",".join(f"{k}={v}" for k, v in env.items())
    for k in ("SWIFTLLM_DECODE_R", "SWIFTLLM_DECODE_CHUNK"):
        os.environ.pop(k, None)
    os.environ.update(env)
    args = bench.build_parser().parse_args(BASE + extra)
    t0 = time.monotonic()
    try:
        bench.run_one(args)
        print(json.dumps({"sweep": tag, "dt": round(time.monotonic() - t0, 1)}),
              flush=True)
    except Exception as e:  # keep sweeping
        print(json.dumps({"sweep": tag, "error": repr(e)[:300]}), flush=True)


def main():
    run([])                                           # control (suite config)
    run(["--multi-step", "16"])
    run([], env={"SWIFTLLM_DECODE_CHUNK": "1024"})
    run(["--multi-step", "16"], env={"SWIFTLLM_DECODE_CHUNK": "1024"})
    run(["--multi-step", "16"], env={"SWIFTLLM_DECODE_R": "8"})
    run(["--multi-step", "16", "--block-size", "64"],
        env={"SWIFTLLM_DECODE_CHUNK": "1024"})


if __name__ == "__main__":
    main()
