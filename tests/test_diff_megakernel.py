"""Fused differentiable kernel: loss + albedo gradient must match
``jax.grad`` of the wavefront cosine estimator at matched seeds, and the
fast step must actually optimize (inverse-rendering recovery)."""

import dataclasses

import numpy as np
import pytest

from fypraytracer_tpu.config import RenderSettings, SamplingTechnique
from fypraytracer_tpu.scene.procedural import cornell_box


@pytest.fixture(scope="module")
def setup():
    builder, cam = cornell_box(width=32, height=32, sphere_res=(6, 10))
    scene = builder.compile()
    settings = RenderSettings(technique=SamplingTechnique.COSINE, bounces=2,
                              samples=1, sky_color=(0.05, 0.06, 0.08))
    return scene, cam, settings


def _wavefront_loss(dscene, cam, settings, tgt, frame):
    import jax.numpy as jnp

    from fypraytracer_tpu.core.camera import generate_rays
    from fypraytracer_tpu.ops.dense import pick_tracer
    from fypraytracer_tpu.render.integrators import radiance_hemisphere

    B = cam.width * cam.height

    def loss_fn(albedo):
        mats = dataclasses.replace(dscene.materials, albedo=albedo)
        sc = dataclasses.replace(dscene, materials=mats)
        o, d = generate_rays(cam.inv_projection, cam.inv_view,
                             cam.width, cam.height, xp=jnp)
        pix = jnp.arange(B, dtype=jnp.uint32)
        tr = pick_tracer(sc, settings.tracer)
        hdr = radiance_hemisphere(sc, tr, o, d, pix, jnp.uint32(frame),
                                  settings, "cosine")
        e = hdr - tgt
        return jnp.sum(e * e) / (B * 3)

    return loss_fn


def test_diff_kernel_matches_autodiff(setup):
    import jax

    from fypraytracer_tpu.render.megakernel_diff import DiffRenderer

    scene, cam, settings = setup
    dscene = scene.device_put()
    B = cam.width * cam.height
    tgt = np.zeros((B, 3), np.float32) + 0.1

    loss_fn = _wavefront_loss(dscene, cam, settings, tgt, 3)
    ref_loss, ref_grad = jax.value_and_grad(loss_fn)(dscene.materials.albedo)

    dr = DiffRenderer(scene, cam, bounces=2, sky_color=settings.sky_color,
                      interpret=True)
    loss, grad = dr.loss_and_grad(dscene.materials.albedo, tgt, 3)

    assert abs(float(loss) - float(ref_loss)) / float(ref_loss) < 1e-4
    rg, kg = np.asarray(ref_grad), np.asarray(grad)
    assert np.abs(rg - kg).max() / max(np.abs(rg).max(), 1e-9) < 1e-3


def test_diff_kernel_recovers_albedo(setup):
    """Inverse rendering with the fast step: perturb albedos, descend,
    error shrinks (the train demo's loop on the fused kernel)."""
    import jax

    from fypraytracer_tpu.render.megakernel_diff import DiffRenderer

    scene, cam, settings = setup
    dscene = scene.device_put()
    dr = DiffRenderer(scene, cam, bounces=2, sky_color=settings.sky_color,
                      interpret=True)

    # target: true-albedo render of frames 1..3 (use the wavefront fwd)
    import jax.numpy as jnp

    from fypraytracer_tpu.core.camera import generate_rays
    from fypraytracer_tpu.ops.dense import pick_tracer
    from fypraytracer_tpu.render.integrators import radiance_hemisphere

    B = cam.width * cam.height
    o, d = generate_rays(cam.inv_projection, cam.inv_view,
                         cam.width, cam.height, xp=jnp)
    pix = jnp.arange(B, dtype=jnp.uint32)
    tr = pick_tracer(dscene, settings.tracer)
    tgts = {f: radiance_hemisphere(dscene, tr, o, d, pix, jnp.uint32(f),
                                   settings, "cosine") for f in (1, 2, 3)}

    true_alb = dscene.materials.albedo
    key = jax.random.PRNGKey(0)
    alb = jnp.clip(true_alb + 0.2 * jax.random.normal(key, true_alb.shape),
                   0.05, 0.95)
    err0 = float(jnp.abs(alb - true_alb).mean())
    losses = []
    for i in range(9):
        f = 1 + (i % 3)
        alb, loss = dr.step(alb, tgts[f], f, lr=3.0)
        alb = jnp.clip(alb, 0.0, 1.0)
        losses.append(float(loss))
    err1 = float(jnp.abs(alb - true_alb).mean())
    assert err1 < 0.6 * err0, (err0, err1, losses)
    assert losses[-1] < losses[0]
