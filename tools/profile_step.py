"""Profile one bench config and print a device-time breakdown by XLA op.

Runs the same model/step loop as bench.py under jax.profiler.trace, then
parses the emitted perfetto trace (plugins/profile/*/\*.trace.json.gz) and
aggregates device-lane op durations — fusions, custom calls (Pallas kernels),
collectives — so kernel-level optimization is measurement-driven rather than
guessed. No tensorboard required.

    python tools/profile_step.py --model 1b --batch 64 --context 128 \
        --skip-prefill --steps 8
"""
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def summarize(trace_dir: str, top: int = 28):
    files = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not files:
        print("no trace files under", trace_dir, file=sys.stderr)
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Op-level lanes only: threads named "XLA Ops" (module/step lanes would
    # double-count every nested op).
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    op_lanes = {k for k, n in tid_names.items() if "XLA Ops" in n}
    if not op_lanes:   # fall back: any lane mentioning Ops
        op_lanes = {k for k, n in tid_names.items()
                    if re.search(r"ops", n, re.I)}
    total = 0.0
    agg = {}
    count = {}
    longname = {}
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_lanes:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # ms
        agg[name] = agg.get(name, 0.0) + dur
        count[name] = count.get(name, 0) + 1
        total += dur
        # HLO long_name: shapes + operands — what turns an anonymous
        # "fusion.N" into "8 MB dynamic-slice copy of the wq weight" (the r5
        # decode weight-copy find came straight from this field).
        if name not in longname:
            ln = e.get("args", {}).get("long_name", "")
            if ln:
                longname[name] = ln
    print(f"\n== device op time (total {total:.2f} ms across trace) ==")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{v:10.2f} ms  {100 * v / max(total, 1e-9):5.1f}%  "
              f"x{count[k]:<5d} {k[:110]}")
        ln = longname.get(k, "")
        if ln:
            print(f"{'':24s}{ln[:150]}")


def main():
    p = bench.build_parser()
    p.add_argument("--trace-dir", default=None)
    args = p.parse_args()
    tdir = args.trace_dir or tempfile.mkdtemp(prefix="swtpu_prof_")
    import jax
    bench._warm_probe = lambda *a, **k: None  # no-op if defined

    # Monkey-patch: wrap the timed section of run_one in a profiler trace by
    # pre-seeding profiler start/stop around it via the steps loop. Simpler:
    # run_one twice is wasteful — instead trace the WHOLE run (compile noise
    # lands in host lanes, device lanes stay clean per-op).
    with jax.profiler.trace(tdir):
        bench.run_one(args)
    summarize(tdir)
    print("trace dir:", tdir)


if __name__ == "__main__":
    main()
