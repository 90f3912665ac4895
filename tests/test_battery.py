"""State-labeled measurement harness (benchmarks/battery.py) — the pure
parts: state bracketing and the best-per-config report merge."""

import importlib.util
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_battery():
    spec = importlib.util.spec_from_file_location(
        "battery", os.path.join(ROOT, "benchmarks", "battery.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_state_brackets():
    """PERF.md #30's three observed states map onto the anchor brackets."""
    b = _load_battery()
    assert b._state_of(0.40) == "unthrottled"   # the measured ceiling
    assert b._state_of(0.65) == "unthrottled"
    assert b._state_of(1.0) == "burst"          # r3's partially-throttled
    assert b._state_of(2.5) == "burst"
    assert b._state_of(6.9) == "sustained"      # zero-credit state
    assert b._state_of(100.0) == "sustained"


def test_report_keeps_best_per_config(tmp_path, monkeypatch):
    b = _load_battery()
    results = tmp_path / "results.jsonl"
    rows = [
        {"config": "nee_1080", "ms_per_frame": 218.3, "state": "sustained",
         "ts": "t1"},
        {"config": "nee_1080", "ms_per_frame": 31.9, "state": "unthrottled",
         "ts": "t2"},
        {"config": "nee_1080", "ms_per_frame": 210.0, "state": "sustained",
         "ts": "t3"},
        {"phase": "compile"},          # non-measurement lines are skipped
        {"config": "di_1080", "ms_per_frame": 140.0, "state": "sustained",
         "ts": "t1"},
    ]
    with open(results, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        f.write("not json\n")           # tolerated
    monkeypatch.setattr(b, "RESULTS", str(results))
    best = b.report()
    assert best["nee_1080"]["ms_per_frame"] == 31.9
    assert best["nee_1080"]["state"] == "unthrottled"
    assert best["di_1080"]["ms_per_frame"] == 140.0


def test_priority_order_flagship_first_in_good_window():
    """When the anchor says the window is good, the flagship 1080p rows
    (gi first — the BASELINE.md:39 config) jump the queue; in a sustained
    window the given order is kept."""
    b = _load_battery()
    names = ["nee_1080", "di_1080", "gi_1080", "stress_nee", "di_256"]
    assert b._priority_order(names, False) == names
    good = b._priority_order(names, True)
    assert good[:3] == ["gi_1080", "nee_1080", "di_1080"]
    assert sorted(good) == sorted(names)          # nothing dropped
    # mid-run requeue: only the remaining configs are considered
    assert b._priority_order(["stress_nee", "gi_fast_1080"], True) == \
        ["gi_fast_1080", "stress_nee"]
