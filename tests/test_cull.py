"""Per-tile AABB culling: the culled trace must be BIT-identical to the
dense sweep (the cull is a pure skip of provably-missing tiles), and the
Morton permutation must preserve estimator semantics end-to-end."""

import numpy as np
import pytest

from fypraytracer_tpu.config import RenderSettings, SamplingTechnique
from fypraytracer_tpu.scene.procedural import cornell_box


@pytest.fixture(scope="module")
def multi_tile():
    import jax
    import jax.numpy as jnp

    from fypraytracer_tpu.render import megakernel as MK

    builder, cam = cornell_box(width=32, height=32, sphere_res=(16, 24))
    scene = builder.compile()
    mscene, perm = MK.morton_permuted_scene(scene)
    taabb = MK.prepare_tile_aabbs(mscene, MK.TRI_TILE)
    dscene = jax.tree_util.tree_map(jnp.asarray, mscene)
    P, AT = MK.prepare_scene_tables(dscene)
    L, depth = MK.prepare_light_table(dscene)
    return scene, mscene, perm, taabb, (P, AT, L, depth), cam


def test_morton_permutation_consistent(multi_tile):
    scene, mscene, perm, taabb, _, _ = multi_tile
    assert taabb.shape[0] >= 2, "fixture must span multiple tiles"
    # permuted triangles are the same set
    assert np.array_equal(np.sort(perm), np.arange(len(perm)))
    np.testing.assert_array_equal(np.asarray(scene.geometry.tri_v)[perm],
                                  np.asarray(mscene.geometry.tri_v))
    # light-tree leaves still point at the same geometric triangles
    lt_old = np.asarray(scene.light_tree.tri)
    lt_new = np.asarray(mscene.light_tree.tri)
    old_ids = lt_old[lt_old >= 0]
    new_ids = lt_new[lt_new >= 0]
    np.testing.assert_array_equal(
        np.asarray(scene.geometry.tri_v)[old_ids],
        np.asarray(mscene.geometry.tri_v)[new_ids])
    # emissive list maps to the same triangles
    np.testing.assert_array_equal(
        np.asarray(scene.geometry.tri_v)[np.asarray(scene.emissive_tris)],
        np.asarray(mscene.geometry.tri_v)[np.asarray(mscene.emissive_tris)])


def test_culled_trace_bit_identical(multi_tile):
    import jax.numpy as jnp

    from fypraytracer_tpu.render import megakernel as MK

    _, mscene, _, taabb, (P, AT, L, depth), cam = multi_tile
    T = mscene.geometry.tri_v.shape[0]
    common = dict(width=32, height=32, bounces=2, samples=1,
                  sky_color=(0.05, 0.06, 0.08), n_frames=2, n_tris=T,
                  sampler="nee", n_light_nodes=L.shape[1],
                  light_depth=depth, frame_group=2, ray_lanes=128,
                  interpret=True)
    cm = jnp.concatenate([jnp.asarray(cam.inv_projection),
                          jnp.asarray(cam.inv_view)], axis=0)
    f0 = jnp.asarray([[1]], jnp.int32)
    a = np.asarray(MK.make_megakernel(cull=False, **common)(
        cm, P, AT, f0, L=L))
    b = np.asarray(MK.make_megakernel(cull=True, **common)(
        cm, P, AT, f0, L=L, TAABB=taabb))
    np.testing.assert_array_equal(a, b)


def test_chunked_lookup_parity():
    """Scenes past the lookup chunk size (2048 entries) exercise the
    chunk-accumulated one-hot fetch; output must still match the
    wavefront at matched seeds."""
    from fypraytracer_tpu.render.megakernel import MegakernelRenderer
    from fypraytracer_tpu.render.renderer import Renderer

    builder, cam = cornell_box(width=32, height=32, sphere_res=(26, 44))
    scene = builder.compile()
    assert scene.geometry.tri_v.shape[0] > 2048
    settings = RenderSettings(technique=SamplingTechnique.COSINE, bounces=1,
                              samples=1, sky_color=(0.1, 0.15, 0.2))
    r = Renderer(scene, cam, settings)
    for _ in range(2):
        ref = r.render_hdr()
    mk = MegakernelRenderer(scene, cam, settings, interpret=True)
    got = np.asarray(mk.render_many(2))
    diff = np.abs(got - np.asarray(ref))
    assert float(np.median(diff)) < 1e-5
    assert (diff.max(axis=-1) > 1e-3).mean() < 0.02


def test_renderer_with_morton_matches_wavefront():
    """End-to-end: MegakernelRenderer (now Morton-permuted) still matches
    the wavefront renderer at matched seeds (tie-flips at shared edges are
    the only tolerated difference)."""
    from fypraytracer_tpu.render.megakernel import MegakernelRenderer
    from fypraytracer_tpu.render.renderer import Renderer

    builder, cam = cornell_box(width=32, height=32, sphere_res=(16, 24))
    scene = builder.compile()
    settings = RenderSettings(technique=SamplingTechnique.NEE_MIS, bounces=2,
                              samples=1, sky_color=(0.05, 0.06, 0.08))
    r = Renderer(scene, cam, settings)
    for _ in range(2):
        ref = r.render_hdr()
    mk = MegakernelRenderer(scene, cam, settings, interpret=True)
    got = np.asarray(mk.render_many(2))
    diff = np.abs(got - np.asarray(ref))
    assert float(np.median(diff)) < 1e-5
    assert (diff.max(axis=-1) > 1e-3).mean() < 0.02
