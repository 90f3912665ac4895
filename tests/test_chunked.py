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
