"""On-chip tuning sweep: decode-kernel rows-per-step (R) and KV page size.

Runs bench configs IN ONE PROCESS (the tunneled chip pays a ~3.5-min stall on
each process's first device→host transfer; in-process it's paid once), varying
SWIFTLLM_DECODE_R / --block-size between runs. Each bench line prints as JSON;
a SUMMARY line at the end ranks the winners. Use the results to pin the
defaults in ops/paged_attention.py (_decode_r) and bench.py (--block-size).

    python tools/tune_onchip.py            # full sweep (~15-25 min on chip)
    python tools/tune_onchip.py --quick    # headline configs only
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


def main():
    quick = "--quick" in sys.argv
    # 1B decode b64 c128 — the VERDICT #5 target (>= 14k tok/s): R sweep.
    for R in (4, 8, 16):
        run(["--model", "1b", "--batch", "64", "--context", "128",
             "--skip-prefill", "--steps", "48"], R=R)
    # Page-size 64: halves DMA count via the contiguous fast path.
    run(["--model", "1b", "--batch", "64", "--context", "128",
         "--skip-prefill", "--steps", "48", "--block-size", "64"], R=8)
    if not quick:
        # Long-context decode: R x chunk interplay.
        for R in (4, 8):
            run(["--model", "1b", "--batch", "8", "--context", "8192",
                 "--skip-prefill", "--steps", "24"], R=R)
        # 8B INT8 headline: R sweep at rows=16.
        for R in (4, 8):
            run(["--model", "8b", "--batch", "16", "--context", "128",
                 "--quant", "int8", "--skip-prefill", "--steps", "32"], R=R)
        # Prefill MFU (VERDICT #4 target >= 0.6 => >= ~53k tok/s at 1B).
        run(["--model", "1b", "--batch", "8", "--context", "2048",
             "--mode", "prefill"])
        # INT4 must beat INT8 absolute (VERDICT #3).
        run(["--model", "8b", "--batch", "16", "--context", "128",
             "--quant", "int4", "--skip-prefill", "--steps", "32"])


if __name__ == "__main__":
    main()
