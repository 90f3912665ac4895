"""Compile + time the ReSTIR DI/GI megakernels on the real TPU (cornell
256x256, reference-default parameters).  Usage: probe_restir.py [frames]
[di|gi]"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 64

    mode = sys.argv[2] if len(sys.argv) > 2 else "di"

    from fypraytracer_tpu.config import RenderSettings, SamplingTechnique
    from fypraytracer_tpu.render.megakernel_restir import MegakernelReSTIRDI
    from fypraytracer_tpu.render.megakernel_restir_gi import MegakernelReSTIRGI
    from fypraytracer_tpu.scene.procedural import cornell_box

    res_arg = os.environ.get("PROBE_RES", "256")
    if "x" in res_arg:
        res_w, res_h = (int(v) for v in res_arg.split("x"))
    else:
        res_w = res_h = int(res_arg)
    builder, cam = cornell_box(width=res_w, height=res_h)
    scene = builder.compile()
    print(f"res={res_w}x{res_h}", flush=True)
    spatial = os.environ.get("PROBE_SPATIAL", "1") == "1"
    temporal = os.environ.get("PROBE_TEMPORAL", "1") == "1"
    bounces = int(os.environ.get("PROBE_BOUNCES", "2"))
    nbrs = int(os.environ.get("PROBE_NBRS", "5"))
    if mode == "gi":
        settings = RenderSettings(technique=SamplingTechnique.RESTIR_GI,
                                  bounces=bounces, spatial_reuse=spatial,
                                  temporal_reuse=temporal,
                                  spatial_neighbors=nbrs,
                                  sky_color=(0.05, 0.06, 0.08))
        cull_env = os.environ.get("PROBE_CULL")  # unset -> auto
        mk = MegakernelReSTIRGI(
            scene, cam, settings,
            cull=None if cull_env is None else cull_env == "1",
            probe_split_vis=os.environ.get("FYP_GI_SPLIT_VIS", "0") == "1",
            probe_fake_vis=os.environ.get("FYP_GI_FAKE_VIS", "0") == "1",
            probe_no_vis=os.environ.get("FYP_GI_NO_VIS", "0") == "1",
            probe_closest_vis=os.environ.get("FYP_GI_CLOSEST_VIS",
                                             "0") == "1",
            final_vis=(None if os.environ.get("FYP_GI_FINAL_VIS") is None
                       else os.environ["FYP_GI_FINAL_VIS"] == "1"))
        print(f"gi cull={mk.cull} mono={mk.mono}", flush=True)
    else:
        settings = RenderSettings(technique=SamplingTechnique.RESTIR_DI,
                                  sky_color=(0.05, 0.06, 0.08))
        mk = MegakernelReSTIRDI(scene, cam, settings)

    t0 = time.perf_counter()
    out = mk.render_many(frames)
    v = float(jax.jit(lambda x: x.ravel()[0])(out))
    t1 = time.perf_counter()
    print(f"COMPILE+RUN OK frames={frames} first={v:.4f} "
          f"wall={t1 - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    out = mk.render_many(frames)
    float(jax.jit(lambda x: x.ravel()[0])(out))
    dt = time.perf_counter() - t0 - 0.4
    print(f"steady: {dt*1000:.1f} ms total, {dt*1000/frames:.2f} ms/frame",
          flush=True)
    # (a 1-vs-3-call "marginal" readout was tried here and removed: each
    # render_many call pays ~0.4 s of EAGER tunnel ops, so the difference
    # measures per-call overhead, not per-frame cost)
    print("mean:", float(jnp.mean(out)), flush=True)


if __name__ == "__main__":
    main()
