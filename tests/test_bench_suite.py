"""Suite budgeting behavior that the round driver depends on.

The driver records the LAST stdout JSON line of `python bench.py` as the
round's headline metric, so the suite must (a) keep the flagship entry last
and NEVER budget-skip it, and (b) never let a value-0 diagnostic (skip /
watchdog) be the final stdout line when the device is alive. Verified here
with a fake runner and a 0-second budget — no device needed.
"""

import io
import json
import contextlib

import tests.conftest  # noqa: F401

import bench


def test_flagship_runs_even_with_zero_budget(monkeypatch):
    ran = []
    monkeypatch.setenv("SWIFTLLM_BENCH_BUDGET", "0")
    monkeypatch.setattr(bench, "_device_reachable", lambda *a, **k: True)
    monkeypatch.setattr(bench, "_warm_reverse_channel", lambda: None)

    def fake_run_one(args):
        ran.append(args)
        print(json.dumps({"metric": "flagship", "value": 123.0,
                          "unit": "tokens/s/chip", "vs_baseline": 0.85}))

    monkeypatch.setattr(bench, "run_one", fake_run_one)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.run_suite()
    lines = [json.loads(l) for l in buf.getvalue().splitlines()
             if l.startswith("{")]
    # Every middle entry skipped (honest zero lines), flagship still ran...
    assert len(ran) == 1
    assert [l for l in lines if l.get("unit") == "SKIPPED_BUDGET"]
    # ...and the LAST stdout JSON line is the real flagship metric.
    assert lines[-1]["metric"] == "flagship"
    assert lines[-1]["value"] == 123.0


def test_watchdog_diagnostic_not_on_stdout(monkeypatch):
    fired = {}

    class FakeTimer:
        def __init__(self, deadline, fn):
            fired["fn"] = fn
        daemon = True
        def start(self): pass
        def cancel(self): fired["cancelled"] = True

    monkeypatch.setenv("SWIFTLLM_BENCH_BUDGET", "0")
    monkeypatch.setattr(bench, "_device_reachable", lambda *a, **k: True)
    monkeypatch.setattr(bench, "_warm_reverse_channel", lambda: None)
    monkeypatch.setattr(bench, "run_one", lambda args: None)
    monkeypatch.setattr(bench.threading, "Timer", FakeTimer)
    monkeypatch.setattr(bench.os, "_exit", lambda code: None)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.run_suite()
        fired["fn"]()          # simulate the watchdog firing
    for line in buf.getvalue().splitlines():
        if line.startswith("{"):
            assert "watchdog" not in line, "watchdog JSON leaked to stdout"
