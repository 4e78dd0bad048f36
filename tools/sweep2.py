"""Focused on-chip sweep: 1B b64 c128 decode — R x block-size cross, plus the
XLA (no-Pallas) attention path as a floor/ceiling probe."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def run(extra, R=None):
    tag = ("R" + str(R) + "_" if R else "") + "_".join(extra)
    if R is not None:
        os.environ["SWIFTLLM_DECODE_R"] = str(R)
    else:
        os.environ.pop("SWIFTLLM_DECODE_R", None)
    args = bench.build_parser().parse_args(extra)
    t0 = time.monotonic()
    try:
        bench.run_one(args)
        print(json.dumps({"sweep": tag, "dt": round(time.monotonic() - t0, 1)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"sweep": tag, "error": repr(e)[:300]}), flush=True)


BASE = ["--model", "1b", "--batch", "64", "--context", "128",
        "--skip-prefill", "--steps", "48"]

run(BASE + ["--use-pallas", "false"])
run(BASE + ["--block-size", "64"], R=4)
run(BASE + ["--block-size", "64"], R=2)
run(BASE + ["--block-size", "128"], R=4)
run(BASE + ["--block-size", "64", "--kv-quant", "fp8"], R=4)
