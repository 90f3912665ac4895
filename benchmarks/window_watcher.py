"""Continuous service-window watcher — the highest-catch-probability way
to get a full-rate 1080p measurement (VERDICT r4 task #3).

The battery (battery.py) samples the service state once per ~15-min run;
the good states (unthrottled / burst, PERF.md #29-30) flap on a
minutes-to-hours scale, so discrete runs mostly miss them.  This watcher
inverts the duty cycle: precompile the anchor + every 1080p config ONCE,
then probe the cheap anchor every ``interval`` seconds; the moment the
anchor brackets non-sustained, measure all 1080p rows inside the open
window (each is a single ~0.1-3 s dispatch) and append them, state-
labeled, to the same battery_results.jsonl the battery and its
``--report`` use.  Every anchor reading also goes to
benchmarks/state_history.jsonl — a service-state time series.

The anchor itself costs ~0.44 s of device work per probe, which eats any
sub-500 ms residual burst credit — deliberate: partial credit must not
masquerade as a state change (PERF.md #33); true good STATES (rate
un-metered for minutes) survive the probe and are what we're fishing for.

Run:  python -u benchmarks/window_watcher.py     (until WATCH_SECONDS)
Env:  WATCH_SECONDS=3600   total watch budget (default 3300)
      WATCH_INTERVAL=90    seconds between anchor probes
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HISTORY = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "state_history.jsonl")

WATCH_ROWS = ("gi_1080", "gi_fast_1080", "nee_1080", "di_1080")


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from benchmarks.battery import (ANCHOR_FRAMES, BATTERY, _append, _fence,
                                    _make, _state_of, _timed)

    budget = float(os.environ.get("WATCH_SECONDS", "3300"))
    interval = float(os.environ.get("WATCH_INTERVAL", "90"))
    t_end = time.time() + budget

    anchor = _make("cornell", "nee", (256, 256))
    print(json.dumps({"phase": "compile", "config": "anchor"}), flush=True)
    _fence(anchor.render_many(ANCHOR_FRAMES))
    mks = {}
    for name in WATCH_ROWS:
        scene_name, tech, wh, frames, extra = BATTERY[name]
        print(json.dumps({"phase": "compile", "config": name}), flush=True)
        mks[name] = _make(scene_name, tech, wh, **extra)
        _fence(mks[name].render_many(frames))

    probes = 0
    catches = 0
    while time.time() < t_end:
        a = _timed(anchor, ANCHOR_FRAMES)[0] / ANCHOR_FRAMES * 1000.0
        state = _state_of(a)
        probes += 1
        with open(HISTORY, "a") as f:
            f.write(json.dumps({"anchor_ms": round(a, 3), "state": state,
                                "ts": time.strftime("%Y-%m-%dT%H:%M:%S")})
                    + "\n")
        print(json.dumps({"probe": probes, "anchor_ms": round(a, 3),
                          "state": state}), flush=True)
        if state != "sustained":
            # open window: measure every 1080p row inside it, flagship
            # (GI, the BASELINE.md:39 config) first
            catches += 1
            for name in WATCH_ROWS:
                _, _, wh, frames, _ = BATTERY[name]
                ms, wall = _timed(mks[name], frames)
                ms = ms / frames * 1000.0
                wall = wall / frames * 1000.0
                a2 = _timed(anchor, ANCHOR_FRAMES)[0] / ANCHOR_FRAMES * 1e3
                _append({"config": name, "ms_per_frame": round(ms, 2),
                         "wall_ms_per_frame": round(wall, 2),
                         "short_dispatch": bool(wall * frames < 150.0),
                         "state": _state_of(a2), "anchor_ms": round(a2, 3),
                         "frames": frames, "wh": list(wh), "watcher": True,
                         "device": jax.devices()[0].device_kind})
                if _state_of(a2) == "sustained":
                    break      # window closed mid-burst; back to watching
        else:
            time.sleep(interval)
    print(json.dumps({"done": True, "probes": probes, "catches": catches}),
          flush=True)


if __name__ == "__main__":
    main()
