"""Equal-device-work resolution-scaling probe — is 1080p genuinely less
efficient per pixel than 256², or is the gap service calibration error?

Motivation (PERF.md #32 open item): the unthrottled cornell-NEE 256²
catch (0.40 ms/frame, #30) linearly extrapolated to 1080p predicts
~12.8 ms/frame true, but the battery's calibrated 1080p row is ~31 true
(211 sustained ÷ 6.9) — a 2.4× per-ray gap.  Either the megakernel loses
per-pixel efficiency at high resolution (a real optimization target:
raygen row math, accumulation epilogue, pixel-row DMA) or the sustained
dilation factor itself differs between the 256²-dispatch and
1080p-dispatch regimes (service weather; the same explanation would
retro-explain r4's unreproducible DI "102 ms" row).

Design: one technique at a time, cornell scene, per-frame work scaled so
EVERY dispatch performs the same total device work (equal pixel·frames),
all dispatches far past any burst window — per-pixel rates are then
directly comparable under a uniform sustained dilation and immune to the
short-dispatch partial-credit artifact (PERF.md #33):

    256²   × 256 frames  = 16.78M pixel-frames
    512²   ×  64 frames  = 16.78M
    1920×1088 ×  8 frames ≈ 16.71M  (within 0.4%)

Interleaved round-robin reps (state-fair, the #26/#31 discipline) with
the 64-frame cornell anchor probed around each measurement.  If the
per-Mpixel-frame cost is flat across rows, the 1080p "true" gap is
calibration error and the open item closes; if 1080p is ≥1.5× worse,
the kernel has a real resolution-scaling defect worth hunting.

Run:  python -u benchmarks/probe_res_scaling.py          (TPU, ~15 min)
Env:  PROBE_TECH=nee|restir-di|restir-gi   (default nee)
      PROBE_REPS=3
Results append to benchmarks/res_scaling_results.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "res_scaling_results.jsonl")

# (name, WxH, frames) — equal pixel·frames per dispatch (~16.7M)
ROWS = [
    ("256sq", (256, 256), 256),
    ("512sq", (512, 512), 64),
    ("1080p", (1920, 1088), 8),
]
ANCHOR_FRAMES = 64


def _fence(x):
    import jax

    return float(jax.jit(lambda v: v.ravel()[0])(x))


def _timed(mk, frames):
    t0 = time.perf_counter()
    out = mk.render_many(frames)
    _fence(out)
    wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    _fence(out)
    host = time.perf_counter() - t0
    return max(wall - host, 1e-6)


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from benchmarks.battery import STATE_BRACKETS, _make

    tech = os.environ.get("PROBE_TECH", "nee")
    reps = int(os.environ.get("PROBE_REPS", "3"))

    def state_of(ms):
        for bound, name in STATE_BRACKETS:
            if ms <= bound:
                return name
        return "sustained"

    anchor = _make("cornell", "nee", (256, 256))
    print(json.dumps({"phase": "compile", "row": "anchor"}), flush=True)
    _fence(anchor.render_many(ANCHOR_FRAMES))

    mks = {}
    for name, wh, frames in ROWS:
        print(json.dumps({"phase": "compile", "row": name}), flush=True)
        t0 = time.perf_counter()
        mks[name] = _make("cornell", tech, wh)
        _fence(mks[name].render_many(frames))
        print(json.dumps({"phase": "compiled", "row": name,
                          "s": round(time.perf_counter() - t0, 1)}),
              flush=True)

    def probe_anchor():
        time.sleep(2.5)
        return _timed(anchor, ANCHOR_FRAMES) / ANCHOR_FRAMES * 1000.0

    results = {name: [] for name, _, _ in ROWS}
    anchors = {name: [] for name, _, _ in ROWS}
    for rep in range(reps):
        for name, wh, frames in ROWS:          # interleaved: state-fair
            time.sleep(2.5)
            s = _timed(mks[name], frames)
            a = probe_anchor()
            results[name].append(s)
            anchors[name].append(a)
            print(json.dumps({"rep": rep, "row": name,
                              "dispatch_s": round(s, 3),
                              "anchor_ms": round(a, 2)}), flush=True)

    out_rows = []
    for name, wh, frames in ROWS:
        best = min(results[name])
        a = anchors[name][results[name].index(best)]
        mpixf = wh[0] * wh[1] * frames / 1e6
        row = {"probe": "res_scaling", "tech": tech, "row": name,
               "wh": list(wh), "frames": frames,
               "dispatch_s": round(best, 3),
               "ms_per_frame": round(best / frames * 1000.0, 2),
               "ms_per_mpix_frame": round(best * 1000.0 / mpixf, 3),
               "anchor_ms": round(a, 2), "state": state_of(a),
               "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
               "device": jax.devices()[0].device_kind}
        out_rows.append(row)
        with open(RESULTS, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    base = out_rows[0]["ms_per_mpix_frame"]
    for row in out_rows:
        print(json.dumps({"row": row["row"],
                          "per_pixel_vs_256sq":
                          round(row["ms_per_mpix_frame"] / base, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
