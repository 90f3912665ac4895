"""Differentiability: autodiff gradients vs finite differences
(SURVEY.md §7 step 7: gradient tests vs finite differences), plus
texture-fetch gradients and inverse-rendering convergence."""

import dataclasses

import numpy as np
import pytest


@pytest.fixture(scope="module")
def setup():
    import jax
    import jax.numpy as jnp

    from fypraytracer_tpu.config import RenderSettings, SamplingTechnique
    from fypraytracer_tpu.core.camera import generate_rays
    from fypraytracer_tpu.ops.dense import pick_tracer
    from fypraytracer_tpu.render.integrators import radiance_hemisphere
    from fypraytracer_tpu.scene.procedural import cornell_box

    builder, cam = cornell_box(width=16, height=16, with_spheres=False)
    scene = builder.compile()
    settings = RenderSettings(technique=SamplingTechnique.COSINE, bounces=1,
                              samples=1)
    o_np, d_np = generate_rays(cam.inv_projection, cam.inv_view, 16, 16, xp=np)
    o = jnp.asarray(o_np, jnp.float32)
    d = jnp.asarray(d_np, jnp.float32)
    pix = jnp.arange(16 * 16, dtype=jnp.uint32)

    def loss_of_materials(materials):
        s = dataclasses.replace(scene, materials=materials)
        trace = pick_tracer(s, "dense")
        hdr = radiance_hemisphere(s, trace, o, d, pix, jnp.uint32(1),
                                  settings, "cosine")
        return jnp.mean(hdr)

    return scene, loss_of_materials


@pytest.mark.parametrize("field", ["albedo", "emission_power", "roughness", "metallic"])
def test_material_grads_match_finite_differences(setup, field):
    import jax
    import jax.numpy as jnp

    scene, loss_fn = setup
    mats = scene.materials
    grads = jax.grad(loss_fn, allow_int=True)(
        jax.tree_util.tree_map(jnp.asarray, mats))
    g = np.asarray(getattr(grads, field))

    eps = 1e-3
    # probe a few entries with central differences
    flat_idx = [0, 1, min(3, g.size - 1)]
    base = np.asarray(getattr(mats, field), np.float64)
    for fi in flat_idx:
        idx = np.unravel_index(fi, base.shape)
        for sign, store in ((1, "hi"), (-1, "lo")):
            pert = base.copy()
            pert[idx] += sign * eps
            m2 = dataclasses.replace(mats, **{field: pert.astype(np.float32)})
            m2 = jax.tree_util.tree_map(jnp.asarray, m2)
            val = float(loss_fn(m2))
            if sign == 1:
                hi = val
            else:
                lo = val
        fd = (hi - lo) / (2 * eps)
        ad = float(g[idx])
        assert abs(fd - ad) <= 2e-3 * max(abs(fd), abs(ad), 1.0), (field, idx, fd, ad)


def test_sky_color_gradient():
    """Gradient w.r.t. the TRACED sky color through the integrator's miss
    path (primary miss + bounce miss + NEE shadow-ray escape), validated
    against central finite differences.  The sky enters as a traced array
    via ``settings.replace`` — the backend-generic integrators read it
    with ``xp.asarray`` so the tracer flows through."""
    import jax
    import jax.numpy as jnp

    from fypraytracer_tpu.config import RenderSettings, SamplingTechnique
    from fypraytracer_tpu.core.camera import generate_rays
    from fypraytracer_tpu.ops.dense import pick_tracer
    from fypraytracer_tpu.render.integrators import radiance_nee_mis
    from fypraytracer_tpu.scene.procedural import cornell_box

    # open-ceiling view: remove spheres, point the camera so some primary
    # and bounce rays escape (cornell's open front at z>2.8)
    builder, cam = cornell_box(width=16, height=16, with_spheres=False)
    scene = builder.compile()
    base_settings = RenderSettings(technique=SamplingTechnique.NEE_MIS,
                                   bounces=2, samples=1)
    o_np, d_np = generate_rays(cam.inv_projection, cam.inv_view, 16, 16,
                               xp=np)
    o = jnp.asarray(o_np, jnp.float32)
    # flip half the rays backwards so the primary-miss path is exercised
    d_np2 = d_np.copy()
    d_np2[::2] = -d_np2[::2]
    d = jnp.asarray(d_np2, jnp.float32)
    pix = jnp.arange(16 * 16, dtype=jnp.uint32)
    dscene = jax.tree_util.tree_map(jnp.asarray, scene)
    trace = pick_tracer(dscene, "dense")

    def loss(sky):
        s = base_settings.replace(sky_color=sky)
        hdr = radiance_nee_mis(dscene, trace, o, d, pix, jnp.uint32(1), s)
        return jnp.mean(hdr)

    sky0 = jnp.asarray([0.3, 0.5, 0.7], jnp.float32)
    g = np.asarray(jax.grad(loss)(sky0))
    assert np.isfinite(g).all() and (g > 0).all(), g  # sky is visible

    eps = 1e-3
    for ch in range(3):
        hi = float(loss(sky0.at[ch].add(eps)))
        lo = float(loss(sky0.at[ch].add(-eps)))
        fd = (hi - lo) / (2 * eps)
        assert abs(fd - g[ch]) <= 0.01 * max(abs(fd), abs(g[ch])), \
            (ch, fd, g[ch])


def test_nee_mis_grads_match_finite_differences():
    """FD validation on the NEE+MIS differentiable path — the estimator
    `cli train`, the fused diff kernel's wavefront reference, and
    `dryrun_multichip` actually optimize through (light-tree pick +
    shadow rays + balance-heuristic MIS weights), at 2 bounces
    (VERDICT r4 weak #3: this path had no FD check)."""
    import jax
    import jax.numpy as jnp

    from fypraytracer_tpu.config import RenderSettings, SamplingTechnique
    from fypraytracer_tpu.core.camera import generate_rays
    from fypraytracer_tpu.ops.dense import pick_tracer
    from fypraytracer_tpu.render.integrators import radiance_nee_mis
    from fypraytracer_tpu.scene.procedural import cornell_box

    builder, cam = cornell_box(width=16, height=16, with_spheres=False)
    scene = builder.compile()
    settings = RenderSettings(technique=SamplingTechnique.NEE_MIS,
                              bounces=2, samples=1)
    o_np, d_np = generate_rays(cam.inv_projection, cam.inv_view, 16, 16,
                               xp=np)
    o = jnp.asarray(o_np, jnp.float32)
    d = jnp.asarray(d_np, jnp.float32)
    pix = jnp.arange(16 * 16, dtype=jnp.uint32)

    def loss(materials):
        s = dataclasses.replace(scene, materials=materials)
        trace = pick_tracer(s, "dense")
        hdr = radiance_nee_mis(s, trace, o, d, pix, jnp.uint32(1), settings)
        return jnp.mean(hdr)

    mats = jax.tree_util.tree_map(jnp.asarray, scene.materials)
    grads = jax.grad(loss, allow_int=True)(mats)

    ep = np.asarray(scene.materials.emission_power)
    light = int(np.argmax(ep))
    probes = [("albedo", (0, 0)), ("albedo", (1, 1)),
              ("emission_power", (light,))]
    for field, idx in probes:
        base = np.asarray(getattr(scene.materials, field), np.float64)
        eps = 1e-3 if field == "albedo" else 1e-2
        vals = {}
        for sign in (1, -1):
            pert = base.copy()
            pert[idx] += sign * eps
            m2 = dataclasses.replace(scene.materials,
                                     **{field: pert.astype(np.float32)})
            vals[sign] = float(loss(jax.tree_util.tree_map(jnp.asarray, m2)))
        fd = (vals[1] - vals[-1]) / (2 * eps)
        ad = float(np.asarray(getattr(grads, field))[idx])
        assert abs(fd - ad) <= 0.01 * max(abs(fd), abs(ad), 1e-4), \
            (field, idx, fd, ad)


@pytest.fixture(scope="module")
def di_setup():
    """Differentiable ReSTIR DI context (SURVEY §7 hard-part #4): a fixed
    seed/frame DI estimator as a function of the material table.  The
    discrete reservoir machinery (candidate indices, accept/merge
    decisions, neighbor picks, M/Z counts) is integer/boolean and carries
    no gradient; the continuous factors (target-pdf p̂ -> RIS weight sums
    -> W, final shade x W) differentiate."""
    import jax
    import jax.numpy as jnp

    from fypraytracer_tpu.config import RenderSettings, SamplingTechnique
    from fypraytracer_tpu.core.camera import generate_rays
    from fypraytracer_tpu.ops.dense import pick_tracer
    from fypraytracer_tpu.render import restir_di
    from fypraytracer_tpu.scene.procedural import cornell_box

    W = H = 16
    builder, cam = cornell_box(width=W, height=H, with_spheres=False)
    scene = builder.compile()
    settings = RenderSettings(technique=SamplingTechnique.RESTIR_DI,
                              light_candidates=4, spatial_neighbors=3,
                              spatial_radius=6)
    o_np, d_np = generate_rays(cam.inv_projection, cam.inv_view, W, H, xp=np)
    o = jnp.asarray(o_np, jnp.float32)
    d = jnp.asarray(d_np, jnp.float32)
    pix = jnp.arange(W * H, dtype=jnp.uint32)
    ppv = jnp.asarray(cam.prev_proj_view)
    state0 = jax.tree_util.tree_map(jnp.asarray, restir_di.init_state(W * H))

    def hdr_of(materials, frame=1, state=state0):
        s = dataclasses.replace(scene, materials=materials)
        trace = pick_tracer(s, "dense")
        return restir_di.render_restir_di(s, trace, o, d, pix,
                                          jnp.uint32(frame), settings, state,
                                          W, H, ppv)

    return scene, hdr_of


def test_restir_di_grads_match_finite_differences(di_setup):
    """Pixel gradients THROUGH the ReSTIR DI reservoir estimator
    (BASELINE.md:39 flagship criterion; estimator being differentiated:
    Renderer.cu:1628-2041).  Frame 2 with live temporal state (stop-grad),
    so candidates + temporal merge + spatial reuse + final shade are all
    on the differentiated path.  <= 1% relative vs central FD."""
    import jax
    import jax.numpy as jnp

    scene, hdr_of = di_setup
    mats = jax.tree_util.tree_map(jnp.asarray, scene.materials)
    _, st1 = hdr_of(mats, frame=1)
    st1 = jax.lax.stop_gradient(st1)

    def loss(materials):
        hdr, _ = hdr_of(materials, frame=2, state=st1)
        return jnp.mean(hdr)

    grads = jax.grad(loss, allow_int=True)(mats)
    for field in ("albedo", "emission_power", "roughness", "metallic"):
        assert np.isfinite(np.asarray(getattr(grads, field))).all(), field

    ep = np.asarray(scene.materials.emission_power)
    light = int(np.argmax(ep))
    probes = [("albedo", (0, 0)), ("albedo", (1, 1)), ("albedo", (2, 2)),
              ("emission_power", (light,))]
    for field, idx in probes:
        base = np.asarray(getattr(scene.materials, field), np.float64)
        eps = 1e-3 if field == "albedo" else 1e-2
        vals = {}
        for sign in (1, -1):
            pert = base.copy()
            pert[idx] += sign * eps
            m2 = dataclasses.replace(scene.materials,
                                     **{field: pert.astype(np.float32)})
            vals[sign] = float(loss(jax.tree_util.tree_map(jnp.asarray, m2)))
        fd = (vals[1] - vals[-1]) / (2 * eps)
        ad = float(np.asarray(getattr(grads, field))[idx])
        assert abs(fd - ad) <= 0.01 * max(abs(fd), abs(ad), 1e-4), \
            (field, idx, fd, ad)


def test_restir_di_pixel_grads_match_finite_differences(di_setup):
    """PER-PIXEL gradients (not just a scalar loss): the (B,3) jacobian of
    the DI image w.r.t. the light's emission power, allclose vs FD on
    every pixel (the flagship row's 'pixel-grads allclose')."""
    import jax
    import jax.numpy as jnp

    scene, hdr_of = di_setup
    mats = jax.tree_util.tree_map(jnp.asarray, scene.materials)
    _, st1 = hdr_of(mats, frame=1)
    st1 = jax.lax.stop_gradient(st1)
    light = int(np.argmax(np.asarray(scene.materials.emission_power)))
    p0 = float(np.asarray(scene.materials.emission_power)[light])

    def img(p):
        m2 = dataclasses.replace(
            mats, emission_power=mats.emission_power.at[light].set(p))
        hdr, _ = hdr_of(m2, frame=2, state=st1)
        return hdr

    jac = np.asarray(jax.jacfwd(img)(jnp.float32(p0)))          # (B, 3)
    eps = 1e-2
    fd = (np.asarray(img(jnp.float32(p0 + eps)))
          - np.asarray(img(jnp.float32(p0 - eps)))) / (2 * eps)
    denom = np.maximum(np.abs(fd), 1e-6)
    rel = np.abs(fd - jac) / denom
    assert (rel > 0.01).mean() == 0.0, (rel.max(), (rel > 0.01).mean())
    assert np.abs(jac).sum() > 1e-3  # gradients actually flow


def test_restir_gi_grads_match_finite_differences():
    """Pixel gradients through the ReSTIR GI estimator (path samples +
    reconnection-Jacobian spatial reuse + visibility re-trace,
    Renderer.cu:2043-2387): same detached-discrete design as DI — the
    continuous factors (path throughput, radiance, p̂ = ‖L‖, W, final
    f·cosθ·L·W shade) differentiate w.r.t. materials; validated <= 1%
    vs central FD at matched seeds."""
    import jax
    import jax.numpy as jnp

    from fypraytracer_tpu.config import RenderSettings, SamplingTechnique
    from fypraytracer_tpu.core.camera import generate_rays
    from fypraytracer_tpu.ops.dense import pick_tracer
    from fypraytracer_tpu.render import restir_gi
    from fypraytracer_tpu.scene.procedural import cornell_box

    W = H = 16
    builder, cam = cornell_box(width=W, height=H, with_spheres=False)
    scene = builder.compile()
    settings = RenderSettings(technique=SamplingTechnique.RESTIR_GI,
                              bounces=2, spatial_neighbors=2,
                              spatial_radius=4)
    o_np, d_np = generate_rays(cam.inv_projection, cam.inv_view, W, H, xp=np)
    o = jnp.asarray(o_np, jnp.float32)
    d = jnp.asarray(d_np, jnp.float32)
    pix = jnp.arange(W * H, dtype=jnp.uint32)
    ppv = jnp.asarray(cam.prev_proj_view)
    state0 = jax.tree_util.tree_map(jnp.asarray,
                                    restir_gi.init_state(W * H))

    def loss(materials):
        s = dataclasses.replace(scene, materials=materials)
        trace = pick_tracer(s, "dense")
        hdr, _ = restir_gi.render_restir_gi(s, trace, o, d, pix,
                                            jnp.uint32(1), settings, state0,
                                            W, H, ppv)
        return jnp.mean(hdr)

    mats = jax.tree_util.tree_map(jnp.asarray, scene.materials)
    grads = jax.grad(loss, allow_int=True)(mats)
    for field in ("albedo", "emission_power", "roughness", "metallic"):
        assert np.isfinite(np.asarray(getattr(grads, field))).all(), field

    light = int(np.argmax(np.asarray(scene.materials.emission_power)))
    probes = [("albedo", (0, 0), 1e-3), ("albedo", (1, 1), 1e-3),
              ("emission_power", (light,), 1e-2)]
    for field, idx, eps in probes:
        base = np.asarray(getattr(scene.materials, field), np.float64)
        vals = {}
        for sign in (1, -1):
            pert = base.copy()
            pert[idx] += sign * eps
            m2 = dataclasses.replace(scene.materials,
                                     **{field: pert.astype(np.float32)})
            vals[sign] = float(loss(jax.tree_util.tree_map(jnp.asarray, m2)))
        fd = (vals[1] - vals[-1]) / (2 * eps)
        ad = float(np.asarray(getattr(grads, field))[idx])
        assert abs(fd - ad) <= 0.01 * max(abs(fd), abs(ad), 1e-4), \
            (field, idx, fd, ad)


def test_restir_di_inverse_rendering_recovers_albedo():
    """End-to-end north star: recover perturbed wall albedos by SGD
    through the SHARDED differentiable ReSTIR DI estimator (reservoirs +
    temporal/spatial halo exchange on a 4-device mesh)."""
    import jax
    import jax.numpy as jnp

    from fypraytracer_tpu.config import RenderSettings, SamplingTechnique
    from fypraytracer_tpu.parallel.restir_shard import (
        make_restir_di_sharded, make_restir_di_train_step)
    from fypraytracer_tpu.parallel.shard import make_pixel_mesh, replicate_scene
    from fypraytracer_tpu.scene.procedural import cornell_box

    W = H = 16
    builder, cam = cornell_box(width=W, height=H, with_spheres=False)
    scene = builder.compile()
    mesh = make_pixel_mesh(jax.devices()[:4])
    scene_d = replicate_scene(scene, mesh)
    settings = RenderSettings(technique=SamplingTechnique.RESTIR_DI,
                              light_candidates=4, spatial_neighbors=2,
                              spatial_radius=3)
    ip = jnp.asarray(cam.inv_projection)
    iv = jnp.asarray(cam.inv_view)
    ppv = jnp.asarray(cam.prev_proj_view)

    # target: DI render with TRUE materials (2 frames in, state warm)
    render, init_state = make_restir_di_sharded(scene_d, mesh, W, H, settings)
    st = init_state()
    target, st_t = render(ip, iv, ppv, jnp.uint32(1), st)

    true_albedo = np.asarray(scene.materials.albedo)
    params = dataclasses.replace(
        scene_d.materials,
        albedo=jnp.asarray(np.clip(true_albedo + 0.3, 0.0, 1.0)))

    step, init_state2 = make_restir_di_train_step(scene_d, mesh, W, H,
                                                  settings, lr=150.0,
                                                  fields=("albedo",))
    state0 = init_state2()
    losses = []
    # the 4-shard estimator realization is more ill-conditioned across
    # albedo channels than the single-device one — needs more steps
    for i in range(60):
        # fixed frame + fresh state: each step differentiates exactly the
        # deterministic estimator realization the target was rendered with
        params, _, loss = step(params, ip, iv, ppv, jnp.uint32(1), state0,
                               target)
        params = dataclasses.replace(params,
                                     albedo=jnp.clip(params.albedo, 0.0, 1.0))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.2, losses[:3] + losses[-3:]
    # the perturbed walls moved toward the truth
    err0 = np.abs(np.clip(true_albedo + 0.3, 0, 1) - true_albedo).mean()
    err1 = np.abs(np.asarray(params.albedo) - true_albedo).mean()
    assert err1 < 0.5 * err0, (err0, err1)


def test_texture_fetch_gradient():
    """Bilinear atlas fetch is a lerp — gradients flow to texel values."""
    import jax
    import jax.numpy as jnp

    from fypraytracer_tpu.ops.texture import sample_bilinear
    from fypraytracer_tpu.scene.types import TextureAtlas

    pages = jnp.ones((1, 8, 8, 3), jnp.float32) * 0.5
    atlas = TextureAtlas(pages=pages, size=jnp.asarray([[8, 8]], jnp.int32))
    tid = jnp.zeros((4,), jnp.int32)
    u = jnp.asarray([0.1, 0.4, 0.6, 0.9])
    v = jnp.asarray([0.2, 0.5, 0.7, 0.3])

    def f(p):
        a = TextureAtlas(pages=p, size=atlas.size)
        return jnp.sum(sample_bilinear(a, tid, u, v))

    g = jax.grad(f)(pages)
    # bilinear weights sum to 1 per sample -> total gradient mass = 4 * 3
    np.testing.assert_allclose(float(jnp.sum(g)), 12.0, rtol=1e-5)
    assert float(jnp.max(g)) <= 3.0 + 1e-5


def test_inverse_rendering_recovers_albedo():
    """End-to-end: perturb one wall's albedo, recover it by SGD."""
    import jax
    import jax.numpy as jnp

    from fypraytracer_tpu.config import RenderSettings, SamplingTechnique
    from fypraytracer_tpu.parallel.shard import (
        make_pixel_mesh, make_train_step, replicate_scene)
    from fypraytracer_tpu.scene.procedural import cornell_box
    from fypraytracer_tpu.parallel.shard import sharded_render

    builder, cam = cornell_box(width=16, height=16, with_spheres=False)
    scene = builder.compile()
    mesh = make_pixel_mesh(jax.devices()[:4])
    scene_d = replicate_scene(scene, mesh)
    settings = RenderSettings(technique=SamplingTechnique.COSINE, bounces=1,
                              samples=2)

    render = sharded_render(scene_d, mesh, 16, 16, settings, "cosine")
    ip, iv = jnp.asarray(cam.inv_projection), jnp.asarray(cam.inv_view)
    target = render(ip, iv, jnp.uint32(1))

    true_albedo = np.asarray(scene.materials.albedo)
    params = dataclasses.replace(
        scene_d.materials,
        albedo=jnp.asarray(np.clip(true_albedo + 0.3, 0, 1)))

    step = make_train_step(scene_d, mesh, 16, 16, settings, lr=1.0,
                           technique="cosine")
    losses = []
    for i in range(25):
        params, loss = step(params, ip, iv, jnp.uint32(1), target)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.2, losses[:3] + losses[-3:]


def test_train_step_with_optax_adam():
    """make_train_step composes with an optax optimizer (adam): the int
    albedo_map leaves are float-masked, opt state is replicated over the
    mesh, and convergence beats plain SGD's fixed step."""
    import jax
    import jax.numpy as jnp
    import optax

    from fypraytracer_tpu.config import RenderSettings, SamplingTechnique
    from fypraytracer_tpu.parallel.shard import (
        make_pixel_mesh, make_train_step, replicate_scene, sharded_render)
    from fypraytracer_tpu.scene.procedural import cornell_box

    builder, cam = cornell_box(width=16, height=16, with_spheres=False)
    scene = builder.compile()
    mesh = make_pixel_mesh(jax.devices()[:4])
    scene_d = replicate_scene(scene, mesh)
    settings = RenderSettings(technique=SamplingTechnique.COSINE, bounces=1,
                              samples=2)
    render = sharded_render(scene_d, mesh, 16, 16, settings, "cosine")
    ip, iv = jnp.asarray(cam.inv_projection), jnp.asarray(cam.inv_view)
    target = render(ip, iv, jnp.uint32(1))

    true_albedo = np.asarray(scene.materials.albedo)
    params = dataclasses.replace(
        scene_d.materials,
        albedo=jnp.asarray(np.clip(true_albedo + 0.3, 0, 1)))
    step, init_opt = make_train_step(scene_d, mesh, 16, 16, settings,
                                     technique="cosine",
                                     optimizer=optax.adam(0.05))
    opt = init_opt(params)
    losses = []
    for _ in range(30):
        params, opt, loss = step(params, opt, ip, iv, jnp.uint32(1), target)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.1, losses[:2] + losses[-2:]
    # int leaves untouched
    np.testing.assert_array_equal(np.asarray(params.albedo_map),
                                  np.asarray(scene.materials.albedo_map))


def test_restir_gi_inverse_rendering_recovers_albedo():
    """Inverse rendering through the SHARDED differentiable ReSTIR GI
    estimator (path-sample reservoirs + reconnection + halo exchange on a
    4-device mesh) — the GI counterpart of the DI north-star test."""
    import jax
    import jax.numpy as jnp

    from fypraytracer_tpu.config import RenderSettings, SamplingTechnique
    from fypraytracer_tpu.parallel.restir_shard import (
        make_restir_gi_sharded, make_restir_gi_train_step)
    from fypraytracer_tpu.parallel.shard import make_pixel_mesh, replicate_scene
    from fypraytracer_tpu.scene.procedural import cornell_box

    W = H = 16
    builder, cam = cornell_box(width=W, height=H, with_spheres=False)
    scene = builder.compile()
    mesh = make_pixel_mesh(jax.devices()[:4])
    scene_d = replicate_scene(scene, mesh)
    settings = RenderSettings(technique=SamplingTechnique.RESTIR_GI,
                              bounces=2, spatial_neighbors=2,
                              spatial_radius=3)
    ip = jnp.asarray(cam.inv_projection)
    iv = jnp.asarray(cam.inv_view)
    ppv = jnp.asarray(cam.prev_proj_view)

    render, init_state = make_restir_gi_sharded(scene_d, mesh, W, H, settings)
    target, _ = render(ip, iv, ppv, jnp.uint32(1), init_state())

    true_albedo = np.asarray(scene.materials.albedo)
    params = dataclasses.replace(
        scene_d.materials,
        albedo=jnp.asarray(np.clip(true_albedo + 0.3, 0.0, 1.0)))

    step, init_tr = make_restir_gi_train_step(scene_d, mesh, W, H, settings,
                                              lr=5.0, fields=("albedo",))
    state0 = init_tr()
    losses = []
    for _ in range(25):
        params, _, loss = step(params, ip, iv, ppv, jnp.uint32(1), state0,
                               target)
        params = dataclasses.replace(params,
                                     albedo=jnp.clip(params.albedo, 0.0, 1.0))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.2, losses[:3] + losses[-3:]
