"""On-chip prefill sweep: tokens/step (max-tokens x prefill-chunk).

Bigger steps = bigger GEMMs (better MXU) and fewer per-step host dispatches.

    python tools/sweep_prefill.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def run(extra):
    tag = "_".join(extra)
    args = bench.build_parser().parse_args(extra)
    t0 = time.monotonic()
    try:
        bench.run_one(args)
        print(json.dumps({"sweep": tag, "dt": round(time.monotonic() - t0, 1)}),
              flush=True)
    except Exception as e:  # keep sweeping
        print(json.dumps({"sweep": tag, "error": repr(e)[:300]}), flush=True)


P = ["--model", "1b", "--batch", "8", "--context", "2048", "--mode", "prefill"]

bench._warm_reverse_channel()
run(P)                                                    # baseline (2048/step)
run(P + ["--max-tokens", "4096"])                         # 8 rows x 512
run(P + ["--max-tokens", "4096", "--prefill-chunk", "1024"])
run(P + ["--max-tokens", "8192", "--prefill-chunk", "1024"])
run(P + ["--max-tokens", "8192", "--prefill-chunk", "2048"])
run(P + ["--max-tokens", "16384", "--prefill-chunk", "2048"])
