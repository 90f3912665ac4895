"""ReSTIR DI megakernel (interpret mode): unbiasedness + state carry."""

import numpy as np

from fypraytracer_tpu.config import RenderSettings, SamplingTechnique
from fypraytracer_tpu.scene.procedural import cornell_box


def test_megakernel_restir_di_unbiased_vs_light_sampling():
    from fypraytracer_tpu.oracle.cpu_renderer import accumulate_oracle
    from fypraytracer_tpu.render.megakernel_restir import MegakernelReSTIRDI

    builder, cam = cornell_box(width=32, height=32, with_spheres=False)
    scene = builder.compile()
    settings = RenderSettings(technique=SamplingTechnique.RESTIR_DI,
                              light_candidates=4, spatial_neighbors=3,
                              spatial_radius=8)
    frames = 40
    mk = MegakernelReSTIRDI(scene, cam, settings, interpret=True)
    avg = np.asarray(mk.render_many(frames))
    assert np.isfinite(avg).all()
    assert mk.frame_index == frames + 1

    ref = accumulate_oracle(scene, cam, RenderSettings(
        technique=SamplingTechnique.LIGHT_SOURCE, samples=4), frames)
    rel = abs(avg.mean() - ref.mean()) / ref.mean()
    assert rel < 0.05, (avg.mean(), ref.mean())


def test_megakernel_restir_di_sparse_hbm_parity():
    """The big-scene ReSTIR DI path (sparse bundle-interval trace +
    HBM-resident P/AT tables, forced here at cornell size) must be
    bit-identical to the dense VMEM kernel — same contract as the NEE
    megakernel's test_room_hbm_sparse_parity."""
    import jax
    import jax.numpy as jnp

    from fypraytracer_tpu.render import megakernel as MK
    from fypraytracer_tpu.render import megakernel_restir as MR

    builder, cam = cornell_box(width=32, height=32)
    scene = builder.compile()
    settings = RenderSettings(technique=SamplingTechnique.RESTIR_DI,
                              light_candidates=4, spatial_neighbors=3,
                              spatial_radius=8)
    mscene, _ = MK.morton_permuted_scene(scene)
    dscene = jax.tree_util.tree_map(jnp.asarray, mscene)
    P, AT = MK.prepare_scene_tables(dscene)
    EM, n_em = MR.prepare_emissive_table(dscene)
    tbox = MK.prepare_tile_boxes_lanes(mscene, MK.TRI_TILE)
    cam_m = jnp.concatenate([jnp.asarray(cam.inv_projection),
                             jnp.asarray(cam.inv_view)], axis=0)
    T = scene.geometry.tri_v.shape[0]
    B = 32 * 32
    C = MR._pick_ray_lanes(B)
    state0 = jnp.zeros((B // C * MR._ST_ROWS, C), jnp.float32)
    common = dict(tex_shapes=None, interpret=True)
    outs = []
    for kw in (dict(sparse=False, hbm_tables=False, cull=False),
               dict(sparse=True, hbm_tables=False),
               dict(sparse=True, hbm_tables=True)):
        fn = MR.make_restir_di_megakernel(
            32, 32, settings, T, n_em, EM.shape[1], 4, **common, **kw)
        hdr, st = fn(cam_m, P, AT, EM, jnp.uint32(1), state0,
                     TBOX=tbox if kw.get("sparse") else None)
        outs.append((np.asarray(hdr), np.asarray(st)))
    assert outs[0][0].mean() > 0.01
    for hdr, st in outs[1:]:
        np.testing.assert_array_equal(outs[0][0], hdr)
        np.testing.assert_array_equal(outs[0][1], st)


def test_megakernel_restir_gi_sparse_hbm_parity():
    """Big-scene ReSTIR GI (mono kernel, sparse trace + sparse shadow
    visibility + HBM tables, forced at cornell size) is bit-identical to
    the dense mono kernel."""
    import jax
    import jax.numpy as jnp

    from fypraytracer_tpu.render import megakernel as MK
    from fypraytracer_tpu.render import megakernel_restir_gi as MG

    builder, cam = cornell_box(width=32, height=32)
    scene = builder.compile()
    settings = RenderSettings(technique=SamplingTechnique.RESTIR_GI,
                              bounces=2, spatial_neighbors=3,
                              spatial_radius=8)
    mscene, _ = MK.morton_permuted_scene(scene)
    dscene = jax.tree_util.tree_map(jnp.asarray, mscene)
    P, AT = MK.prepare_scene_tables(dscene)
    tbox = MK.prepare_tile_boxes_lanes(mscene, MK.TRI_TILE)
    cam_m = jnp.concatenate([jnp.asarray(cam.inv_projection),
                             jnp.asarray(cam.inv_view)], axis=0)
    T = scene.geometry.tri_v.shape[0]
    B = 32 * 32
    C = MG._pick_ray_lanes(B)
    state0 = jnp.zeros((B // C * MG._GST_ROWS, C), jnp.float32)
    stage0 = jnp.zeros((B // C * MG._GS_ROWS, C), jnp.float32)
    outs = []
    for kw in (dict(sparse=False, hbm_tables=False),
               dict(sparse=True, hbm_tables=True)):
        fn = MG.make_restir_gi_mono(32, 32, settings, T, 4,
                                    interpret=True, **kw)
        hdr, st, sg = fn(cam_m, P, AT, jnp.uint32(1), state0, stage0,
                         TBOX=tbox if kw.get("sparse") else None)
        outs.append((np.asarray(hdr), np.asarray(st), np.asarray(sg)))
    assert outs[0][0].mean() > 0.001
    for a, b in zip(outs[0], outs[1]):
        np.testing.assert_array_equal(a, b)


def test_megakernel_restir_di_chunked_matches_monolithic_after_move():
    """When dispatch planning splits a frame budget, chunks after the
    first must reproject from the CURRENT pose (their actual previous
    frame), not the pre-move pose — a split render after a camera move
    must be bit-identical to the monolithic dispatch."""
    from fypraytracer_tpu.render.megakernel_restir import MegakernelReSTIRDI

    settings = RenderSettings(technique=SamplingTechnique.RESTIR_DI,
                              light_candidates=4, spatial_neighbors=3,
                              spatial_radius=8)

    def run(plan):
        builder, cam = cornell_box(width=32, height=32, with_spheres=False)
        scene = builder.compile()
        mk = MegakernelReSTIRDI(scene, cam, settings, interpret=True)
        mk.render_many(2)                      # warm history at pose 0
        mk.camera.move_to((0.15, 1.0, 2.6))    # move -> reprojection case
        if plan is not None:
            mk.dispatch_plan = lambda n: plan
        return np.asarray(mk.render_many(4))

    mono = run(None)            # single 4-frame dispatch
    split = run([2, 2])         # forced chunking
    assert np.isfinite(mono).all() and mono.mean() > 0.001
    # 1-ulp accumulation-order slack only ((a+s2)+s2 vs a+s4); a stale
    # pre-move ppv0 in chunk 2 produces O(1) pixel differences
    np.testing.assert_allclose(mono, split, atol=1e-6, rtol=1e-5)


def test_megakernel_restir_di_batches_continue_state():
    from fypraytracer_tpu.render.megakernel_restir import MegakernelReSTIRDI

    builder, cam = cornell_box(width=32, height=32, with_spheres=False)
    scene = builder.compile()
    settings = RenderSettings(technique=SamplingTechnique.RESTIR_DI,
                              light_candidates=2, spatial_neighbors=2,
                              spatial_radius=6)
    mk = MegakernelReSTIRDI(scene, cam, settings, interpret=True)
    a = np.asarray(mk.render_many(4))
    b = np.asarray(mk.render_many(4))   # resumes reservoir state
    assert mk.frame_index == 9
    assert np.isfinite(b).all()
    # accumulation average changes but stays in the same regime
    assert abs(b.mean() - a.mean()) / max(a.mean(), 1e-9) < 0.3


def test_megakernel_restir_gi_unbiased_vs_brdf_path():
    from fypraytracer_tpu.oracle.cpu_renderer import accumulate_oracle
    from fypraytracer_tpu.render.megakernel_restir_gi import MegakernelReSTIRGI

    builder, cam = cornell_box(width=32, height=32, with_spheres=False)
    scene = builder.compile()
    settings = RenderSettings(technique=SamplingTechnique.RESTIR_GI,
                              bounces=2, spatial_neighbors=3,
                              spatial_radius=8)
    frames = 50
    mk = MegakernelReSTIRGI(scene, cam, settings, interpret=True)
    avg = np.asarray(mk.render_many(frames))
    assert np.isfinite(avg).all()

    ref = accumulate_oracle(scene, cam, RenderSettings(
        technique=SamplingTechnique.BRDF, bounces=2, samples=4), frames)
    rel = abs(avg.mean() - ref.mean()) / max(ref.mean(), 1e-9)
    assert rel < 0.06, (avg.mean(), ref.mean())
    # per-quadrant means too: a spatially localized bias (e.g. a wrong
    # reconnection-Jacobian convention brightening edges / darkening the
    # center) could cancel in the image-wide mean and slip through
    h, w = avg.shape[:2]
    ref = np.asarray(ref).reshape(h, w, -1)
    for ys in (slice(0, h // 2), slice(h // 2, h)):
        for xs in (slice(0, w // 2), slice(w // 2, w)):
            a, r = avg[ys, xs].mean(), ref[ys, xs].mean()
            assert abs(a - r) / max(r, 1e-9) < 0.15, (ys, xs, a, r)


def test_megakernel_restir_gi_state_carry():
    from fypraytracer_tpu.render.megakernel_restir_gi import MegakernelReSTIRGI

    builder, cam = cornell_box(width=32, height=32, with_spheres=False)
    scene = builder.compile()
    settings = RenderSettings(technique=SamplingTechnique.RESTIR_GI,
                              bounces=2, spatial_neighbors=2,
                              spatial_radius=6)
    mk = MegakernelReSTIRGI(scene, cam, settings, interpret=True)
    a = np.asarray(mk.render_many(4))
    b = np.asarray(mk.render_many(4))
    assert mk.frame_index == 9
    assert np.isfinite(b).all()
    assert abs(b.mean() - a.mean()) / max(a.mean(), 1e-9) < 0.3


def test_megakernel_restir_di_moving_camera_unbiased():
    """Camera moves between dispatches: temporal reprojection must keep
    the estimator unbiased at the NEW pose (history either reprojects
    exactly or restarts fresh — never reads same-pixel garbage)."""
    from fypraytracer_tpu.core.camera import Camera
    from fypraytracer_tpu.oracle.cpu_renderer import accumulate_oracle
    from fypraytracer_tpu.render.megakernel_restir import MegakernelReSTIRDI

    builder, _ = cornell_box(width=32, height=32, with_spheres=False)
    scene = builder.compile()
    settings = RenderSettings(technique=SamplingTechnique.RESTIR_DI,
                              light_candidates=4, spatial_neighbors=3,
                              spatial_radius=8)
    cam = Camera(position=(0.0, 1.0, 2.6), forward=(0.0, 0.0, -1.0),
                 vfov_deg=45.0, width=32, height=32)
    mk = MegakernelReSTIRDI(scene, cam, settings, interpret=True)
    mk.render_many(8)                     # pose A: builds history
    acc_a = np.asarray(mk.accum).copy()
    mk.camera.move_to((0.0, 1.08, 2.6))   # pan up ~1 px rows
    mk.render_many(24)                    # pose B, history reprojected
    pose_b = (np.asarray(mk.accum) - acc_a).reshape(32, 32, 3) / 24

    cam_b = Camera(position=(0.0, 1.08, 2.6), forward=(0.0, 0.0, -1.0),
                   vfov_deg=45.0, width=32, height=32)
    ref = accumulate_oracle(scene, cam_b, RenderSettings(
        technique=SamplingTechnique.LIGHT_SOURCE, samples=4), 24)
    rel = abs(pose_b.mean() - ref.mean()) / ref.mean()
    assert np.isfinite(pose_b).all()
    assert rel < 0.08, (pose_b.mean(), ref.mean())


def test_megakernel_restir_gi_mono_unbiased():
    """Single-kernel GI (lagged spatial reuse) stays unbiased vs the BRDF
    path tracer — per-quadrant, like the 3-kernel variant's test."""
    from fypraytracer_tpu.oracle.cpu_renderer import accumulate_oracle
    from fypraytracer_tpu.render.megakernel_restir_gi import MegakernelReSTIRGI

    builder, cam = cornell_box(width=32, height=32, with_spheres=False)
    scene = builder.compile()
    settings = RenderSettings(technique=SamplingTechnique.RESTIR_GI,
                              bounces=2, spatial_neighbors=3,
                              spatial_radius=8)
    frames = 40
    mk = MegakernelReSTIRGI(scene, cam, settings, interpret=True, mono=True)
    avg = np.asarray(mk.render_many(frames)).reshape(32, 32, 3)
    assert np.isfinite(avg).all()
    ref = accumulate_oracle(scene, cam, RenderSettings(
        technique=SamplingTechnique.BRDF, bounces=2, samples=4), frames)
    rel = abs(avg.mean() - ref.mean()) / ref.mean()
    assert rel < 0.06, (avg.mean(), ref.mean())
    for qy in (slice(0, 16), slice(16, 32)):
        for qx in (slice(0, 16), slice(16, 32)):
            a = avg[qy, qx].mean()
            b = ref[qy, qx].mean()
            assert abs(a - b) / max(b, 1e-9) < 0.15, (qy, qx, a, b)


def test_megakernel_restir_gi_final_vis_matches_per_neighbor():
    """final_vis (one winner-visibility sweep, the original RIS form)
    deviates from the reference's per-neighbor rejection only by the
    documented visibility-darkening tradeoff — bounded here."""
    from fypraytracer_tpu.render.megakernel_restir_gi import MegakernelReSTIRGI

    builder, cam = cornell_box(width=32, height=32, with_spheres=True)
    scene = builder.compile()
    settings = RenderSettings(technique=SamplingTechnique.RESTIR_GI,
                              bounces=2, spatial_neighbors=3,
                              spatial_radius=8)
    frames = 32
    a = np.asarray(MegakernelReSTIRGI(
        scene, cam, settings, interpret=True, mono=True,
        final_vis=True).render_many(frames)).reshape(32, 32, 3)
    b = np.asarray(MegakernelReSTIRGI(
        scene, cam, settings, interpret=True, mono=True,
        final_vis=False).render_many(frames)).reshape(32, 32, 3)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    rel = abs(a.mean() - b.mean()) / max(b.mean(), 1e-9)
    assert rel < 0.05, (a.mean(), b.mean())
    # occlusion-heavy quadrants (spheres) must stay close too
    for qy in (slice(0, 16), slice(16, 32)):
        for qx in (slice(0, 16), slice(16, 32)):
            qa = a[qy, qx].mean()
            qb = b[qy, qx].mean()
            assert abs(qa - qb) / max(qb, 1e-9) < 0.12, (qy, qx, qa, qb)
