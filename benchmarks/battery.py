"""Multi-config measurement battery with service-state labeling.

The axon-tunneled TPU flaps between >=3 rate states on a minutes-to-hours
scale (PERF.md #29-30: unthrottled ~0.4 ms/frame on the cornell anchor,
burst+sustained ~1.0, sustained-only ~6.9).  A single session therefore
cannot promise a full-rate number for the big configs (1080p, stress) —
this battery is built to be run REPEATEDLY across a round: each run
probes a cheap anchor config to classify the current state, measures the
battery configs, re-probes the anchor after each, and appends one JSON
line per measurement to ``benchmarks/battery_results.jsonl``.  A later
run that lands in a good window upgrades the per-config best.

Protocol per config (same discipline as bench.py): fenced dispatch, net
of host/tunnel overhead measured by RE-FENCING the resident result (never
a baked-in constant), min over idle-laddered reps.  State is the anchor's
ms/frame bracketing, measured immediately after the config so the label
reflects the window the number was taken in.

Run:  python -u benchmarks/battery.py             (~10-30 min warm-cache)
Env:  BATTERY_CONFIGS=nee_1080,gi_1080  (subset)
      BATTERY_REPS=3                    (idle-laddered reps per config)
Report: python benchmarks/battery.py --report   (best per config, state)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "battery_results.jsonl")

# anchor: the flagship cornell NEE 256² 64-frame dispatch — its per-frame
# rate brackets the service state (PERF.md #30 measured all three states
# on exactly this kernel)
ANCHOR_FRAMES = 64
STATE_BRACKETS = (      # anchor ms/frame upper bounds
    (0.65, "unthrottled"),       # ~0.40 measured in the open window
    (2.5, "burst"),              # ~1.0 = the r3 partially-throttled state
    (float("inf"), "sustained"),  # ~6.9 = zero-credit state
)

# (name, scene, technique, WxH, frames/dispatch, extra)
BATTERY = {
    "nee_1080":   ("cornell", "nee", (1920, 1088), 8, {}),
    "di_1080":    ("cornell", "restir-di", (1920, 1088), 8, {}),
    # flagship (BASELINE.md:39): ReSTIR GI spatiotemporal 1080p — measured
    # in BOTH visibility modes (reference semantics = default since r5)
    "gi_1080":    ("cornell", "restir-gi", (1920, 1088), 8, {}),
    "gi_fast_1080": ("cornell", "restir-gi", (1920, 1088), 8,
                     {"gi_fast": True}),
    "stress_nee": ("stress", "nee", (256, 256), 8, {}),
    # 256² ReSTIR rows: cheap cross-round trackers (r4 sustained refs:
    # DI 2.6-4.4, GI-fast 6.4-7.0, GI-ref 12.0 ms/frame)
    "di_256": ("cornell", "restir-di", (256, 256), 8, {}),
    "gi_256": ("cornell", "restir-gi", (256, 256), 8, {}),
    "gi_fast_256": ("cornell", "restir-gi", (256, 256), 8,
                    {"gi_fast": True}),
}


def _fence(x):
    import jax

    return float(jax.jit(lambda v: v.ravel()[0])(x))


def _timed(mk, frames):
    """(net, wall) seconds for one fenced dispatch — net subtracts the
    re-fence host cost.  When the device work is comparable to the host
    overhead (short 256² dispatches) the subtraction can overshoot (the
    r3 '0.21 ms DI' artifact class, PERF.md #29) — callers must keep the
    wall time alongside and treat tiny nets as noise (PERF.md #33)."""
    t0 = time.perf_counter()
    out = mk.render_many(frames)
    _fence(out)
    wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    _fence(out)
    host = time.perf_counter() - t0
    return max(wall - host, 1e-6), wall


def _state_of(anchor_ms):
    for bound, name in STATE_BRACKETS:
        if anchor_ms <= bound:
            return name
    return "sustained"


# good-window measurement priority: the flagship GI 1080p row first (the
# BASELINE.md:39 config that has never had a full-rate direct
# measurement), then the other 1080p rows
FLAGSHIP_PRIORITY = ("gi_1080", "gi_fast_1080", "nee_1080", "di_1080")


def _priority_order(names, good_window):
    """Measurement order for the remaining configs.  Service windows flap
    on a minutes scale (PERF.md #29-30), so when the anchor says the
    CURRENT window is good (non-sustained), spend it on the flagship
    1080p rows before it closes; otherwise keep the given order."""
    names = list(names)
    if not good_window:
        return names
    head = [n for n in FLAGSHIP_PRIORITY if n in names]
    return head + [n for n in names if n not in head]


def _make(scene_name, tech, wh, gi_fast=False):
    from fypraytracer_tpu.app.cli import _make_megakernel_renderer
    from fypraytracer_tpu.config import RenderSettings, SamplingTechnique
    from fypraytracer_tpu.scene.sceneio import builtin_scene

    w, h = wh
    builder, cam = builtin_scene(scene_name, w, h)
    scene = builder.compile()
    tmap = {"nee": SamplingTechnique.NEE_MIS,
            "restir-di": SamplingTechnique.RESTIR_DI,
            "restir-gi": SamplingTechnique.RESTIR_GI}
    settings = RenderSettings(technique=tmap[tech], bounces=2, samples=1,
                              sky_color=(0.05, 0.06, 0.08))
    return _make_megakernel_renderer(scene, cam, settings, gi_fast=gi_fast)


def _append(row):
    row["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    with open(RESULTS, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def report():
    best = {}
    if os.path.exists(RESULTS):
        for line in open(RESULTS):
            try:
                r = json.loads(line)
            except ValueError:
                continue
            if "config" not in r:
                continue
            if r.get("short_dispatch"):
                # net time on a tiny dispatch is over-subtraction noise
                # (PERF.md #33) — never let it become the recorded best
                continue
            cur = best.get(r["config"])
            if cur is None or r["ms_per_frame"] < cur["ms_per_frame"]:
                best[r["config"]] = r
    for name, r in sorted(best.items()):
        print(json.dumps({"config": name, "best_ms_per_frame":
                          r["ms_per_frame"], "state": r["state"],
                          "anchor_ms": r.get("anchor_ms"), "ts": r["ts"]}))
    return best


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    names = os.environ.get("BATTERY_CONFIGS",
                           ",".join(BATTERY)).split(",")
    reps = int(os.environ.get("BATTERY_REPS", "3"))

    # build + warm (compile) everything FIRST so a good service window is
    # spent measuring, not compiling
    anchor = _make("cornell", "nee", (256, 256))
    print(json.dumps({"phase": "compile", "config": "anchor"}), flush=True)
    _fence(anchor.render_many(ANCHOR_FRAMES))
    mks = {}
    for name in names:
        scene_name, tech, wh, frames, extra = BATTERY[name]
        print(json.dumps({"phase": "compile", "config": name}), flush=True)
        t0 = time.perf_counter()
        mks[name] = _make(scene_name, tech, wh, **extra)
        _fence(mks[name].render_many(frames))
        print(json.dumps({"phase": "compiled", "config": name,
                          "s": round(time.perf_counter() - t0, 1)}),
              flush=True)

    def probe_anchor():
        time.sleep(2.5)
        return _timed(anchor, ANCHOR_FRAMES)[0] / ANCHOR_FRAMES * 1000.0

    a0 = probe_anchor()
    _append({"config": "anchor", "ms_per_frame": round(a0, 3),
             "state": _state_of(a0), "frames": ANCHOR_FRAMES})

    queue = _priority_order(names, _state_of(a0) != "sustained")
    while queue:
        name = queue.pop(0)
        _, _, wh, frames, _ = BATTERY[name]
        best_ms, best_wall, best_anchor = float("inf"), None, None
        for rep in range(reps):
            time.sleep(2.5 * (rep + 1))
            ms, wall = _timed(mks[name], frames)
            ms = ms / frames * 1000.0
            wall = wall / frames * 1000.0
            a = probe_anchor()        # state label for THIS window
            if ms < best_ms:
                best_ms, best_wall, best_anchor = ms, wall, a
        # short dispatches: the host-overhead subtraction is the same
        # order as the device work, so the net can overshoot (PERF.md
        # #33) — flag them; report() excludes flagged rows from "best"
        short = best_wall * frames < 150.0
        _append({"config": name, "ms_per_frame": round(best_ms, 2),
                 "wall_ms_per_frame": round(best_wall, 2),
                 "short_dispatch": bool(short),
                 "state": _state_of(best_anchor),
                 "anchor_ms": round(best_anchor, 3),
                 "frames": frames, "wh": list(wh),
                 "device": jax.devices()[0].device_kind})
        # the window can open mid-run: if the latest anchor reading says
        # it just did, jump the flagship rows to the front of what's left
        queue = _priority_order(queue, _state_of(best_anchor) != "sustained")

    report()


if __name__ == "__main__":
    if "--report" in sys.argv:
        report()
    else:
        main()
