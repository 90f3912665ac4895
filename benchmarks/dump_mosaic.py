"""Dump the Mosaic (TPU MLIR) lowering of the megakernels for diffing.

PERF.md #18a: the GI visibility traces cost ~1.25 ms EACH while
byte-identical trace code in NEE/DI contexts costs ~0.1 ms — every
structural hypothesis was eliminated by measurement, so the remaining
explanation is compiler scheduling.  This dumps the Mosaic module of a
chosen kernel via AOT lowering (client-side; no remote compile, no
execution — safe to run while the TPU is busy).

Usage: python -u benchmarks/dump_mosaic.py {nee|gi_mono|gi|di} 2> /tmp/x.mlir
(the Mosaic debug print goes to stderr/stdout during lowering)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# axon (TPU) for the lowering target, cpu for eager scene-prep arrays
jax.config.update("jax_platforms", "axon,cpu")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "nee"

    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def patched(*args, **kw):
        kw["debug"] = True
        return orig(*args, **kw)

    pl.pallas_call = patched
    import fypraytracer_tpu.render.megakernel as MK
    import fypraytracer_tpu.render.megakernel_restir as MKDI
    import fypraytracer_tpu.render.megakernel_restir_gi as MKGI
    for m in (MK, MKDI, MKGI):
        m.pl.pallas_call = patched

    from fypraytracer_tpu.config import RenderSettings, SamplingTechnique
    from fypraytracer_tpu.scene.procedural import cornell_box

    builder, cam = cornell_box(width=256, height=256)
    scene = builder.compile()

    cpu = jax.devices("cpu")[0]
    sds = lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype)

    with jax.default_device(cpu):
        if which == "nee":
            settings = RenderSettings(technique=SamplingTechnique.NEE_MIS,
                                      bounces=2, samples=1,
                                      sky_color=(0.05, 0.06, 0.08))
            mk = MK.MegakernelRenderer(scene, cam, settings)
            fn = mk._renderer(64)
            P, AT = mk.tables
            cam_mats = jnp.concatenate([jnp.asarray(cam.inv_projection),
                                        jnp.asarray(cam.inv_view)], axis=0)
            frame0 = jnp.asarray([[1]], jnp.int32)
            args = (sds(cam_mats), sds(P), sds(AT), sds(frame0))
            kw = dict(L=sds(mk.light_table), TAABB=sds(mk.taabb))
        elif which in ("gi_mono", "gi"):
            settings = RenderSettings(technique=SamplingTechnique.RESTIR_GI,
                                      bounces=2, sky_color=(0.05, 0.06, 0.08))
            mk = MKGI.MegakernelReSTIRGI(scene, cam, settings,
                                         mono=(which == "gi_mono"))
            fn = mk._renderer(64)
            P, AT = mk.tables
            cam_mats = jnp.concatenate([jnp.asarray(cam.inv_projection),
                                        jnp.asarray(cam.inv_view)], axis=0)
            kw = dict(ppv0=sds(jnp.asarray(cam.prev_proj_view)),
                      ppv1=sds(jnp.asarray(cam.proj_view)),
                      TAABB=sds(mk.taabb))
            if which == "gi_mono":
                args = (sds(cam_mats), sds(P), sds(AT),
                        jax.ShapeDtypeStruct((), jnp.uint32),
                        sds(mk.state), sds(mk.stage))
            else:
                args = (sds(cam_mats), sds(P), sds(AT),
                        jax.ShapeDtypeStruct((), jnp.uint32), sds(mk.state))
        else:
            settings = RenderSettings(technique=SamplingTechnique.RESTIR_DI,
                                      sky_color=(0.05, 0.06, 0.08))
            mk = MKDI.MegakernelReSTIRDI(scene, cam, settings)
            fn = mk._renderer(64)
            P, AT = mk.tables
            cam_mats = jnp.concatenate([jnp.asarray(cam.inv_projection),
                                        jnp.asarray(cam.inv_view)], axis=0)
            args = (sds(cam_mats), sds(P), sds(AT), sds(mk.em_table),
                    jax.ShapeDtypeStruct((), jnp.uint32), sds(mk.state))
            kw = dict(ppv0=sds(jnp.asarray(cam.prev_proj_view)),
                      ppv1=sds(jnp.asarray(cam.proj_view)))

    lowered = fn.lower(*args, **kw)
    print("LOWERED OK (Mosaic modules printed above)", file=sys.stderr)


if __name__ == "__main__":
    main()
