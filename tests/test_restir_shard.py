"""Sharded ReSTIR DI (halo exchange over the device mesh) must match the
single-chip renderer at matched seeds.

The single-chip reference is computed with the same in-jit ray generation
as the sharded body (host-computed rays differ in final-ulp rounding,
which reservoir accept decisions amplify chaotically across frames)."""

import os

import numpy as np
import pytest

from fypraytracer_tpu.config import RenderSettings, SamplingTechnique
from fypraytracer_tpu.scene.procedural import cornell_box


@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_megakernel_matches_single_chip(n_devices):
    """The multi-chip FAST path (Pallas megakernel inside shard_map, one
    pixel-row slab per device, scene replicated) must be bit-identical
    to the single-device megakernel."""
    import jax
    import jax.numpy as jnp

    from fypraytracer_tpu.parallel.shard import (
        make_pixel_mesh, sharded_megakernel_render)
    from fypraytracer_tpu.render import megakernel as MK

    builder, cam = cornell_box(width=64, height=64)
    scene = builder.compile()
    settings = RenderSettings(technique=SamplingTechnique.NEE_MIS,
                              bounces=2, samples=1,
                              sky_color=(0.05, 0.06, 0.08))
    cam_mats = jnp.concatenate([jnp.asarray(cam.inv_projection),
                                jnp.asarray(cam.inv_view)], axis=0)
    frame0 = jnp.asarray([[1]], jnp.int32)

    mesh = make_pixel_mesh(jax.devices()[:n_devices])
    render = sharded_megakernel_render(scene, mesh, 64, 64, settings,
                                       n_frames=8, interpret=True)
    sharded = np.asarray(render(cam_mats, frame0))

    # single-device reference (unchunked)
    mscene, _ = MK.morton_permuted_scene(scene)
    dscene = jax.tree_util.tree_map(jnp.asarray, mscene)
    P, AT = MK.prepare_scene_tables(dscene)
    L, depth = MK.prepare_light_table(dscene)
    ref = np.asarray(MK.make_megakernel(
        64, 64, bounces=2, samples=1, sky_color=(0.05, 0.06, 0.08),
        n_frames=8, n_tris=scene.geometry.tri_v.shape[0], sampler="nee",
        n_light_nodes=L.shape[1], light_depth=depth, frame_group=8,
        ray_lanes=512, interpret=True)(cam_mats, P, AT, frame0, L=L))
    assert ref.mean() > 0.01
    np.testing.assert_array_equal(sharded, ref)


def test_sharded_megakernel_sparse_big_scene():
    """Sharded fast path composes with the big-scene sparse/HBM trace:
    a 37k-tri scene over a 2-device mesh renders finite and non-black
    through shard_map + chunked sparse megakernel."""
    import jax
    import jax.numpy as jnp

    from fypraytracer_tpu.parallel.shard import (
        make_pixel_mesh, sharded_megakernel_render)
    from fypraytracer_tpu.scene.procedural import stress

    b, cam = stress(width=32, height=32, grid=3)
    scene = b.compile()
    settings = RenderSettings(technique=SamplingTechnique.COSINE,
                              bounces=1, samples=1,
                              sky_color=(0.05, 0.06, 0.08))
    cam_mats = jnp.concatenate([jnp.asarray(cam.inv_projection),
                                jnp.asarray(cam.inv_view)], axis=0)
    mesh = make_pixel_mesh(jax.devices()[:2])
    render = sharded_megakernel_render(scene, mesh, 32, 32, settings,
                                       n_frames=8, interpret=True)
    out = np.asarray(render(cam_mats, jnp.asarray([[1]], jnp.int32)))
    assert out.shape == (1024, 3)
    assert np.isfinite(out).all() and out.mean() > 1e-3


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/FYPRayTracer/Assets/3D Models/Test")
    and not os.environ.get("FYP_ASSETS"),
    reason="room scene assets unavailable")
def test_sharded_megakernel_room_cull_textured():
    """Mid-size dense scenes (>= 8 intersection tiles) auto-enable the
    in-kernel tile cull, and the room is textured — the sharded path must
    thread the TAABB + texture tables through and match the single-device
    textured megakernel bit-for-bit (ADVICE r4: this band crashed with a
    pallas_call pytree mismatch and, texture-wise, silently rendered
    flat-albedo)."""
    import jax
    import jax.numpy as jnp

    from fypraytracer_tpu.parallel.shard import (
        make_pixel_mesh, sharded_megakernel_render)
    from fypraytracer_tpu.render import megakernel as MK
    from fypraytracer_tpu.scene.procedural import room

    builder, cam = room(width=64, height=64)
    scene = builder.compile()
    settings = RenderSettings(technique=SamplingTechnique.NEE_MIS,
                              bounces=2, samples=1,
                              sky_color=(0.05, 0.06, 0.08))
    cam_mats = jnp.concatenate([jnp.asarray(cam.inv_projection),
                                jnp.asarray(cam.inv_view)], axis=0)
    frame0 = jnp.asarray([[1]], jnp.int32)

    mesh = make_pixel_mesh(jax.devices()[:2])
    render = sharded_megakernel_render(scene, mesh, 64, 64, settings,
                                       n_frames=8, interpret=True)
    sharded = np.asarray(render(cam_mats, frame0))

    mk = MK.MegakernelRenderer(scene, cam, settings, interpret=True)
    mk.render_many(8)
    ref = np.asarray(mk.accum)
    assert ref.mean() > 0.01
    np.testing.assert_array_equal(sharded, ref)


@pytest.mark.parametrize("n_devices", [2, 4, 8])
def test_sharded_restir_di_matches_single_chip(n_devices):
    import jax
    import jax.numpy as jnp

    from fypraytracer_tpu.core.camera import generate_rays
    from fypraytracer_tpu.ops.dense import pick_tracer
    from fypraytracer_tpu.parallel.restir_shard import make_restir_di_sharded
    from fypraytracer_tpu.parallel.shard import make_pixel_mesh, replicate_scene
    from fypraytracer_tpu.render import restir_di

    width = height = 64
    builder, cam = cornell_box(width=width, height=height, with_spheres=False)
    scene = builder.compile()
    settings = RenderSettings(technique=SamplingTechnique.RESTIR_DI,
                              light_candidates=4, spatial_neighbors=3,
                              spatial_radius=height // n_devices - 1)

    dscene = scene.device_put()
    ip = jnp.asarray(cam.inv_projection)
    iv = jnp.asarray(cam.inv_view)
    ppv = jnp.asarray(cam.prev_proj_view)

    @jax.jit
    def ref_step(frame, state):
        pix = jnp.arange(width * height, dtype=jnp.int32)
        o, d = generate_rays(ip, iv, width, height, xp=jnp,
                             pixel_x=pix % width, pixel_y=pix // width)
        trace = pick_tracer(dscene, settings.tracer)
        return restir_di.render_restir_di(dscene, trace, o, d,
                                          pix.astype(jnp.uint32), frame,
                                          settings, state, width, height, ppv)

    st = jax.tree_util.tree_map(jnp.asarray,
                                restir_di.init_state(width * height))
    ref_acc = np.zeros((width * height, 3), np.float32)
    for f in (1, 2, 3):
        hdr, st = ref_step(jnp.uint32(f), st)
        ref_acc += np.asarray(hdr)

    mesh = make_pixel_mesh(jax.devices()[:n_devices])
    scene_r = replicate_scene(scene, mesh)
    step, init_state = make_restir_di_sharded(scene_r, mesh, width, height,
                                              settings)
    state = init_state()
    got_acc = np.zeros((width * height, 3), np.float32)
    for f in (1, 2, 3):
        hdr, state = step(ip, iv, ppv, jnp.uint32(f), state)
        got_acc += np.asarray(hdr)

    diff = np.abs(got_acc - ref_acc)
    assert float(np.median(diff)) < 1e-6
    # fusion-level float reassociation can still flip razor-thin accepts
    # on isolated pixels; require statistical + overwhelming agreement
    assert (diff.max(axis=-1) > 1e-3).mean() < 0.03, diff.max()
    assert abs(got_acc.mean() - ref_acc.mean()) / ref_acc.mean() < 0.01


@pytest.mark.parametrize("n_devices", [4])
def test_sharded_restir_gi_matches_single_chip(n_devices):
    import jax
    import jax.numpy as jnp

    from fypraytracer_tpu.core.camera import generate_rays
    from fypraytracer_tpu.ops.dense import pick_tracer
    from fypraytracer_tpu.parallel.restir_shard import make_restir_gi_sharded
    from fypraytracer_tpu.parallel.shard import make_pixel_mesh, replicate_scene
    from fypraytracer_tpu.render import restir_gi

    width = height = 64
    builder, cam = cornell_box(width=width, height=height, with_spheres=False)
    scene = builder.compile()
    settings = RenderSettings(technique=SamplingTechnique.RESTIR_GI,
                              bounces=2, spatial_neighbors=3,
                              spatial_radius=height // n_devices - 1)

    dscene = scene.device_put()
    ip = jnp.asarray(cam.inv_projection)
    iv = jnp.asarray(cam.inv_view)
    ppv = jnp.asarray(cam.prev_proj_view)

    @jax.jit
    def ref_step(frame, state):
        pix = jnp.arange(width * height, dtype=jnp.int32)
        o, d = generate_rays(ip, iv, width, height, xp=jnp,
                             pixel_x=pix % width, pixel_y=pix // width)
        trace = pick_tracer(dscene, settings.tracer)
        return restir_gi.render_restir_gi(dscene, trace, o, d,
                                          pix.astype(jnp.uint32), frame,
                                          settings, state, width, height, ppv)

    st = jax.tree_util.tree_map(jnp.asarray,
                                restir_gi.init_state(width * height))
    ref_acc = np.zeros((width * height, 3), np.float32)
    for f in (1, 2):
        hdr, st = ref_step(jnp.uint32(f), st)
        ref_acc += np.asarray(hdr)

    mesh = make_pixel_mesh(jax.devices()[:n_devices])
    scene_r = replicate_scene(scene, mesh)
    step, init_state = make_restir_gi_sharded(scene_r, mesh, width, height,
                                              settings)
    state = init_state()
    got_acc = np.zeros((width * height, 3), np.float32)
    for f in (1, 2):
        hdr, state = step(ip, iv, ppv, jnp.uint32(f), state)
        got_acc += np.asarray(hdr)

    diff = np.abs(got_acc - ref_acc)
    assert float(np.median(diff)) < 1e-6
    assert (diff.max(axis=-1) > 1e-3).mean() < 0.03, diff.max()
    assert abs(got_acc.mean() - ref_acc.mean()) / max(ref_acc.mean(), 1e-9) < 0.02


def test_sharded_restir_di_moving_camera_matches_single_chip():
    """Moving camera: temporal reprojection crosses shard boundaries; the
    temporal state halo must make the sharded result match the
    single-chip one for motion within `radius` rows (VERDICT r1 #6)."""
    import jax
    import jax.numpy as jnp

    from fypraytracer_tpu.core.camera import Camera, generate_rays
    from fypraytracer_tpu.ops.dense import pick_tracer
    from fypraytracer_tpu.parallel.restir_shard import make_restir_di_sharded
    from fypraytracer_tpu.parallel.shard import make_pixel_mesh, replicate_scene
    from fypraytracer_tpu.render import restir_di

    width = height = 64
    n_devices = 4
    builder, cam = cornell_box(width=width, height=height, with_spheres=False)
    scene = builder.compile()
    settings = RenderSettings(technique=SamplingTechnique.RESTIR_DI,
                              light_candidates=4, spatial_neighbors=3,
                              spatial_radius=12)

    # per-frame camera poses: pan up slightly each frame (sub-halo motion)
    poses = []
    c = Camera(position=(0.0, 1.0, 2.6), forward=(0.0, 0.0, -1.0),
               vfov_deg=45.0, width=width, height=height)
    for f in range(3):
        c2 = Camera(position=(0.0, 1.0 + 0.05 * f, 2.6),
                    forward=(0.0, 0.0, -1.0), vfov_deg=45.0,
                    width=width, height=height)
        poses.append((jnp.asarray(c2.inv_projection),
                      jnp.asarray(c2.inv_view),
                      jnp.asarray(c2.proj_view)))
    # frame f renders pose f with ppv = pose f-1 (frame 0's ppv unused:
    # fresh reservoirs have m == 0)
    frames = [(poses[f][0], poses[f][1],
               poses[max(f - 1, 0)][2]) for f in range(3)]

    dscene = scene.device_put()

    @jax.jit
    def ref_step(ip, iv, ppv, frame, state):
        pix = jnp.arange(width * height, dtype=jnp.int32)
        o, d = generate_rays(ip, iv, width, height, xp=jnp,
                             pixel_x=pix % width, pixel_y=pix // width)
        trace = pick_tracer(dscene, settings.tracer)
        return restir_di.render_restir_di(dscene, trace, o, d,
                                          pix.astype(jnp.uint32), frame,
                                          settings, state, width, height, ppv)

    st = jax.tree_util.tree_map(jnp.asarray,
                                restir_di.init_state(width * height))
    ref_acc = np.zeros((width * height, 3), np.float32)
    for f, (ip, iv, ppv) in enumerate(frames, start=1):
        hdr, st = ref_step(ip, iv, ppv, jnp.uint32(f), st)
        ref_acc += np.asarray(hdr)

    mesh = make_pixel_mesh(jax.devices()[:n_devices])
    scene_r = replicate_scene(scene, mesh)
    step, init_state = make_restir_di_sharded(scene_r, mesh, width, height,
                                              settings)
    state = init_state()
    got_acc = np.zeros((width * height, 3), np.float32)
    for f, (ip, iv, ppv) in enumerate(frames, start=1):
        hdr, state = step(ip, iv, ppv, jnp.uint32(f), state)
        got_acc += np.asarray(hdr)

    diff = np.abs(got_acc - ref_acc)
    assert float(np.median(diff)) < 1e-6
    assert (diff.max(axis=-1) > 1e-3).mean() < 0.03, diff.max()
    assert abs(got_acc.mean() - ref_acc.mean()) / ref_acc.mean() < 0.01
