"""Fixed-vs-marginal dispatch cost decomposition (round 4).

The round-3 token-bucket model (PERF.md #26) predicts net dispatch time
T = W + max(W-63ms, 0)*6.9 for true device work W.  Round-4 burst
measurements contradict it on some kernels: ReSTIR GI 256² nets ~57 ms
at BOTH 8 and 64 frames — a ~50 ms FIXED per-dispatch cost with tiny
marginal per-frame work — while cornell NEE 64/256/1024-frame points fit
the bucket.  This probe fits net(frames) per kernel family with multiple
frame counts and back-to-back (no-sleep) reps to separate:
  - fixed per-dispatch device cost (program admission/load),
  - marginal per-frame cost (true kernel speed),
  - the idle-refill bucket.

Usage: probe_fixed.py {nee|gi|gi_ref|di} [res] [frames_csv] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "gi"
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    frames_list = [int(v) for v in
                   (sys.argv[3] if len(sys.argv) > 3 else "8,24,64").split(",")]
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fypraytracer_tpu.config import RenderSettings, SamplingTechnique
    from fypraytracer_tpu.scene.sceneio import builtin_scene

    tech = {"nee": SamplingTechnique.NEE_MIS,
            "gi": SamplingTechnique.RESTIR_GI,
            "gi_ref": SamplingTechnique.RESTIR_GI,
            "di": SamplingTechnique.RESTIR_DI}[kind]
    builder, cam = builtin_scene("cornell", res, res)
    scene = builder.compile()
    settings = RenderSettings(technique=tech, bounces=2, samples=1,
                              sky_color=(0.05, 0.06, 0.08))
    fence = jax.jit(lambda x: x.ravel()[0])

    for frames in frames_list:
        if tech == SamplingTechnique.RESTIR_GI:
            from fypraytracer_tpu.render.megakernel_restir_gi import (
                MegakernelReSTIRGI)
            mk = MegakernelReSTIRGI(scene, cam, settings,
                                    final_vis=(kind != "gi_ref"))
        elif tech == SamplingTechnique.RESTIR_DI:
            from fypraytracer_tpu.render.megakernel_restir import (
                MegakernelReSTIRDI)
            mk = MegakernelReSTIRDI(scene, cam, settings)
        else:
            from fypraytracer_tpu.render.megakernel import MegakernelRenderer
            mk = MegakernelRenderer(scene, cam, settings)
        float(fence(mk.render_many(frames)))          # compile + warm
        for idle in (2.5, 0.0):
            for rep in range(reps):
                if idle:
                    time.sleep(idle)
                t0 = time.perf_counter()
                avg = mk.render_many(frames)
                float(fence(avg))
                wall = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(fence(avg))
                host = time.perf_counter() - t0
                net = max(wall - host, 0.0)
                print(f"{kind} res={res} frames={frames} idle={idle} "
                      f"rep={rep} net={net*1000:.1f} ms "
                      f"({net*1000/frames:.3f} ms/frame, host "
                      f"{host*1000:.0f})", flush=True)


if __name__ == "__main__":
    main()
