"""Chunked dispatch (PERF.md #26): a big frame rendered as sequential
sub-launches of <=144 grid rows must be bit-identical to the monolithic
launch.  The chunk split is an execution-schedule change only — per-pixel
accumulation is chunk-local, RNG keys are global-pixel-derived — so any
difference is a bug in the pixel-offset plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fypraytracer_tpu.render import megakernel as MK
from fypraytracer_tpu.scene.procedural import cornell_box


@pytest.fixture(scope="module")
def tables():
    builder, cam = cornell_box(width=64, height=64)
    scene = builder.compile()
    T = scene.geometry.tri_v.shape[0]
    mscene, _ = MK.morton_permuted_scene(scene)
    dscene = jax.tree_util.tree_map(jnp.asarray, mscene)
    P, AT = MK.prepare_scene_tables(dscene)
    L, depth = MK.prepare_light_table(dscene)
    cam_mats = jnp.concatenate([jnp.asarray(cam.inv_projection),
                                jnp.asarray(cam.inv_view)], axis=0)
    return T, P, AT, L, depth, cam_mats


@pytest.mark.parametrize("sampler", ["nee", "cosine"])
def test_chunked_bit_identical(tables, sampler):
    T, P, AT, L, depth, cam_mats = tables
    frame0 = jnp.asarray([[1]], jnp.int32)
    outs = []
    for ch in (None, 2, 4):
        render = MK.make_megakernel(
            64, 64, bounces=2, samples=1, sky_color=(0.05, 0.06, 0.08),
            n_frames=8, n_tris=T, sampler=sampler,
            n_light_nodes=L.shape[1], light_depth=depth, frame_group=8,
            ray_lanes=512, chunk_rows=ch, interpret=True)
        kw = {"L": L} if sampler == "nee" else {}
        outs.append(np.asarray(render(cam_mats, P, AT, frame0, **kw)))
    assert np.array_equal(outs[0], outs[1])
    assert np.array_equal(outs[0], outs[2])
    assert np.isfinite(outs[0]).all() and outs[0].mean() > 0.0


def test_explicit_row_groups_with_chunking_raises(tables):
    """chunk_rows forces row_groups=1; an explicitly requested row_groups
    must error instead of being silently discarded (ADVICE r3)."""
    T, P, AT, L, depth, cam_mats = tables
    with pytest.raises(ValueError, match="row_groups"):
        MK.make_megakernel(
            64, 64, bounces=2, samples=1, sky_color=(0.05, 0.06, 0.08),
            n_frames=8, n_tris=T, sampler="cosine", frame_group=8,
            ray_lanes=512, chunk_rows=2, row_groups=4, interpret=True)


def test_dispatch_plan_policy():
    """render_many's frames-per-dispatch cap (VERDICT r3 #5): the stress
    scene's 64-frame budget must split into several dispatches, each with
    estimated device time below the watchdog budget."""
    est = MK.estimate_frame_ms(256 * 256, 512, 200_712)
    assert est > 100.0          # stress-class: ~190 ms/frame measured
    plan = MK.plan_dispatch_frames(64, est)
    assert sum(plan) == 64 and len(plan) > 1
    assert max(plan) * est <= 8000.0
    assert len(set(plan)) == 1  # one chunk size -> one compiled kernel
    assert all(f % 8 == 0 for f in plan)

    # small configs stay a single dispatch (no overhead regression)
    assert MK.plan_dispatch_frames(64, MK.estimate_frame_ms(
        256 * 256, 512, 1208)) == [64]
    # non-dividing budgets still sum exactly
    assert sum(MK.plan_dispatch_frames(100, 300.0)) == 100


def test_renderer_auto_sparse_big_scene():
    """MegakernelRenderer flips to the sparse/HBM-table path past the
    VMEM threshold so big scenes render through the PRODUCT path (the
    probes were the only sparse users before, VERDICT r3 weak #4)."""
    from fypraytracer_tpu.config import RenderSettings, SamplingTechnique
    from fypraytracer_tpu.scene.procedural import stress

    b, cam = stress(width=16, height=16, grid=3)   # 18 spheres ~ 37k tris
    scene = b.compile()
    assert scene.geometry.tri_v.shape[0] >= 32768
    mk = MK.MegakernelRenderer(
        scene, cam, RenderSettings(technique=SamplingTechnique.COSINE,
                                   bounces=1, samples=1), interpret=True)
    assert mk.sparse and mk.tbox is not None
    hdr = np.asarray(mk.render_many(8))
    assert np.isfinite(hdr).all() and hdr.mean() > 1e-3

    # small scenes keep the dense path
    from fypraytracer_tpu.scene.procedural import cornell_box
    b2, cam2 = cornell_box(width=64, height=64)
    mk2 = MK.MegakernelRenderer(
        b2.compile(), cam2, RenderSettings(
            technique=SamplingTechnique.COSINE, bounces=1, samples=1),
        interpret=True)
    assert not mk2.sparse
