"""On-chip sweep: multi-step decode (S) x block size x decode-R.

One process (the tunneled chip pays its first device->host stall once).
Each bench line prints as JSON; pick winners for bench.py suite defaults.

    python tools/sweep_ms.py
"""

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
    except Exception as e:  # keep sweeping
        print(json.dumps({"sweep": tag, "error": repr(e)[:300]}), flush=True)


B64 = ["--model", "1b", "--batch", "64", "--context", "128", "--skip-prefill",
       "--steps", "48"]
LC = ["--model", "1b", "--batch", "1", "--context", "131072", "--steps", "16",
      "--skip-prefill"]
SPEC = ["--model", "1b", "--batch", "8", "--context", "128", "--spec-k", "4",
        "--skip-prefill", "--steps", "32"]
I8 = ["--model", "8b", "--batch", "16", "--context", "128", "--quant", "int8",
      "--skip-prefill", "--steps", "48"]

bench._warm_reverse_channel()
run(B64)                                                  # baseline re-measure
run(B64 + ["--multi-step", "8"])
run(B64 + ["--multi-step", "8", "--block-size", "64"])
run(B64 + ["--multi-step", "16", "--block-size", "64"])
run(B64 + ["--multi-step", "8", "--block-size", "64"], R=8)
run(LC + ["--multi-step", "16"])
run(SPEC)                                                 # page-sizing fix check
run(I8 + ["--multi-step", "8"])
