"""On-TPU smoke/golden regression harness.

The CPU test suite runs every kernel in interpret mode and can NOT see
Mosaic-level divergences (the round-2 bf16 one-hot-fetch bug rendered the
reference's room scene black on hardware while every CPU test passed).
This script is the hardware gate: it renders a small set of configs on
the REAL TPU, asserts PSNR against committed golden images, and prints
one JSON line for the round log.

Protocol mirrors the reference's golden-image benchmark path
(MisUtils.cpp:118-157 — 8-bit post-tonemap MSE/PSNR) on its own authored
scene (WalnutApp.cpp:43-521, `room`) plus the cornell flagship.

Bootstrap: when a golden is missing the render is saved as
``goldens/<name>.candidate.png`` and the config FAILS — inspect the
candidate visually (and against the CPU-interpret render), then rename it
to ``<name>.png`` and commit.

Run:  python -u benchmarks/tpu_smoke.py          (~2-10 min, compile-bound)
Env:  SMOKE_CONFIGS=room_nee,room_di             (subset)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
FRAMES = 8
PSNR_FLOOR = 35.0   # deterministic seeds -> near-identical; 35 dB tolerates
                    # compiler-version numeric drift, not correctness bugs
MEAN_FLOOR = 3.0    # rgb8 mean; a black/speckled render sits near 0


def _build(name):
    from fypraytracer_tpu.config import RenderSettings, SamplingTechnique
    from fypraytracer_tpu.scene.sceneio import builtin_scene

    scene_name, tech = {
        "cornell_nee": ("cornell", SamplingTechnique.NEE_MIS),
        "room_nee": ("room", SamplingTechnique.NEE_MIS),
        "room_di": ("room", SamplingTechnique.RESTIR_DI),
        # round-4 additions (VERDICT r3 #6): the GI kernel family (both
        # visibility modes) and the sparse/HBM big-scene path — the two
        # newest code paths with hardware-only failure modes (Mosaic
        # lane alignment, final_vis estimator)
        "room_gi": ("room", SamplingTechnique.RESTIR_GI),
        "room_gi_ref": ("room", SamplingTechnique.RESTIR_GI),
        "stress_nee": ("stress", SamplingTechnique.NEE_MIS),
        # round-5 addition (ADVICE r4): the ReSTIR sparse/HBM DMA windows
        # were hardware-untested — interpret mode does not check Mosaic
        # lane alignment (PERF.md #23)
        "stress_di": ("stress", SamplingTechnique.RESTIR_DI),
    }[name]
    res = 128 if scene_name == "stress" else 256   # keep the sparse/HBM
    # config inside the burst window (~190 ms/frame at 256²)
    builder, cam = builtin_scene(scene_name, res, res)
    scene = builder.compile()
    settings = RenderSettings(technique=tech, bounces=2, samples=1,
                              sky_color=(0.05, 0.06, 0.08))
    if tech == SamplingTechnique.RESTIR_DI:
        from fypraytracer_tpu.render.megakernel_restir import MegakernelReSTIRDI
        return MegakernelReSTIRDI(scene, cam, settings)
    if tech == SamplingTechnique.RESTIR_GI:
        from fypraytracer_tpu.render.megakernel_restir_gi import (
            MegakernelReSTIRGI)
        return MegakernelReSTIRGI(scene, cam, settings,
                                  final_vis=(name != "room_gi_ref"))
    from fypraytracer_tpu.render.megakernel import MegakernelRenderer
    return MegakernelRenderer(scene, cam, settings)


def run_config(name):
    import numpy as np

    from fypraytracer_tpu.core.color import finalize_pixels, to_uint8_rgb
    from fypraytracer_tpu.utils import metrics
    from fypraytracer_tpu.utils.image import load_png, save_png

    mk = _build(name)
    t0 = time.perf_counter()
    avg = np.asarray(mk.render_many(FRAMES))          # compile + run
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(mk.render_many(FRAMES))                # steady-state timing
    # includes the ~0.4 s single-dispatch tunnel round-trip (8 frames is
    # too few to amortize it) — informational only; bench.py owns perf
    frame_ms = (time.perf_counter() - t0) / FRAMES * 1000.0

    rgb8 = np.asarray(to_uint8_rgb(finalize_pixels(avg, np.float32(1.0))))
    row = {"config": name, "mean8": round(float(rgb8.mean()), 2),
           "frame_ms": round(frame_ms, 2), "compile_s": round(compile_s, 1)}

    golden_path = os.path.join(GOLDEN_DIR, name + ".png")
    if not os.path.exists(golden_path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        save_png(os.path.join(GOLDEN_DIR, name + ".candidate.png"), rgb8)
        row.update(ok=False, reason="no golden; candidate written")
        return row

    golden = load_png(golden_path)
    m = metrics.mse_8bit(rgb8, golden)
    row["psnr"] = round(metrics.psnr(m), 2)
    row["ok"] = bool(row["psnr"] >= PSNR_FLOOR and row["mean8"] >= MEAN_FLOOR)
    if not row["ok"]:
        save_png(os.path.join(GOLDEN_DIR, name + ".failed.png"), rgb8)
    return row


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    names = os.environ.get(
        "SMOKE_CONFIGS",
        "cornell_nee,room_nee,room_di,room_gi,room_gi_ref,stress_nee,"
        "stress_di"
    ).split(",")
    rows, ok = [], True
    for name in names:
        try:
            row = run_config(name)
        except Exception as exc:  # a crash on one config must not hide others
            row = {"config": name, "ok": False,
                   "reason": f"{type(exc).__name__}: {exc}"}
        rows.append(row)
        ok = ok and row.get("ok", False)
        print(json.dumps(row), flush=True)
    print(json.dumps({"smoke": "tpu", "ok": ok,
                      "device": jax.devices()[0].device_kind,
                      "rows": rows}), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
