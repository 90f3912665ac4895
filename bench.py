"""Benchmark harness — one JSON line for the driver.

Measures the flagship config (Cornell box, NEE+MIS with light tree) on the
default JAX platform (the real TPU chip under the driver) and reports
rays/second.  Protocol follows the reference's equal-time measurement
(frame time around Renderer::Render, WalnutApp.cpp:880-897) plus the
rays/s derivation BASELINE.md requires:
rays/frame = W·H·samples·(1 primary + bounces·(1 shadow + 1 continuation)).

``vs_baseline``: ratio against the best previous round's recorded value
(BENCH_r*.json), 1.0 on the first measurement (the reference publishes no
numbers, BASELINE.md).
"""

from __future__ import annotations

import glob
import json
import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fypraytracer_tpu.config import RenderSettings, SamplingTechnique
    from fypraytracer_tpu.render.renderer import Renderer
    from fypraytracer_tpu.scene.procedural import cornell_box

    width = height = 256
    bounces = 2
    samples = 1
    builder, cam = cornell_box(width=width, height=height)
    scene = builder.compile()
    settings = RenderSettings(technique=SamplingTechnique.NEE_MIS,
                              bounces=bounces, samples=samples,
                              sky_color=(0.05, 0.06, 0.08))
    r = Renderer(scene, cam, settings)

    # fence via a 1-element host fetch: block_until_ready through the axon
    # tunnel does NOT reliably wait for device completion
    def fence(x):
        return float(jax.jit(lambda v: v.ravel()[0])(x))

    # Offline-accumulation protocol: render a frame batch per dispatch
    # (render_many) so fixed per-dispatch runtime overhead — tens of ms
    # through the axon tunnel — is amortized as it would be in a real
    # fixed-budget render (WalnutApp.cpp:900-905).
    frames = 64
    fence(r.render_many(frames))  # warmup/compile
    r.reset()

    t0 = time.perf_counter()
    out = r.render_many(frames)
    fence(out)
    dt = (time.perf_counter() - t0) / frames

    rays_per_frame = width * height * samples * (1 + bounces * 2)
    rays_per_s = rays_per_frame / dt

    prev = 0.0
    for f in sorted(glob.glob("BENCH_r*.json")):
        try:
            rec = json.load(open(f))
            if rec.get("metric") == "rays_per_second":
                prev = max(prev, float(rec.get("value", 0.0)))
        except Exception:
            pass
    vs_baseline = (rays_per_s / prev) if prev > 0 else 1.0

    print(json.dumps({
        "metric": "rays_per_second",
        "value": round(rays_per_s, 1),
        "unit": f"rays/s (cornell {width}x{height}, NEE+MIS, {bounces} bounces, "
                f"{samples} spp, frame {dt*1000:.1f} ms, {jax.devices()[0].device_kind})",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
