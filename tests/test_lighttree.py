"""Light-tree builder invariants, descent/PMF consistency, and parity of
the light-sampling integrators vs the oracle."""

import numpy as np
import pytest

from fypraytracer_tpu.config import RenderSettings, SamplingTechnique
from fypraytracer_tpu.core import rng
from fypraytracer_tpu.ops.lighttree import emitter_pmf, pick_light
from fypraytracer_tpu.scene.procedural import cornell_box
from fypraytracer_tpu.scene.build import SceneBuilder, empty_light_tree
from fypraytracer_tpu.scene.procedural import quad


@pytest.fixture(scope="module")
def multi_light_scene():
    """Room with several emissive panels of very different power."""
    b = SceneBuilder()
    white = b.add_material(albedo=(0.7, 0.7, 0.7))
    strong = b.add_material(emission_color=(1, 1, 1), emission_power=20.0)
    weak = b.add_material(emission_color=(1, 0.5, 0.2), emission_power=0.5)
    q = quad(2.0, 2.0)
    b.add_mesh(*q, material=white, position=(0, 0, 0))
    lq = quad(0.4, 0.4)
    b.add_mesh(*lq, material=strong, position=(-1, 2, 0), rotation=(180, 0, 0))
    b.add_mesh(*lq, material=weak, position=(1, 2, 0), rotation=(180, 0, 0))
    b.add_mesh(*lq, material=weak, position=(0, 2, 1), rotation=(180, 0, 0))
    return b.compile()


def test_tree_structure(multi_light_scene):
    lt = multi_light_scene.light_tree
    n = lt.energy.shape[0]
    leaves = np.nonzero(lt.tri >= 0)[0]
    inner = np.nonzero(lt.tri < 0)[0]
    # binary: #leaves = #inner + 1; every emissive tri has a leaf
    assert len(leaves) == len(inner) + 1
    assert len(leaves) == multi_light_scene.num_emissive
    # parent/child consistency + energy conservation
    for i in inner:
        l, r = lt.left[i], lt.right[i]
        assert lt.parent[l] == i and lt.parent[r] == i
        np.testing.assert_allclose(lt.energy[i], lt.energy[l] + lt.energy[r], rtol=1e-5)
        assert np.all(lt.box_lo[i] <= lt.box_lo[l] + 1e-6)
        assert np.all(lt.box_hi[i] >= lt.box_hi[r] - 1e-6)
    # leaf_of_tri inverts leaves
    for leaf in leaves:
        assert lt.leaf_of_tri[lt.tri[leaf]] == leaf


def test_descent_pmf_matches_replay(multi_light_scene):
    lt = multi_light_scene.light_tree
    B = 4096
    point = np.tile(np.float32([0.2, 0.5, 0.1]), (B, 1))
    key = rng.path_key(np.arange(B, dtype=np.uint32), 9, 0)
    _, u = rng.next_uniform(key)
    tri, pmf = pick_light(lt, point, u)
    assert np.all(tri >= 0)
    replay = emitter_pmf(lt, tri, point)
    np.testing.assert_allclose(pmf, replay, rtol=1e-4, atol=1e-7)


def test_descent_distribution_matches_pmf(multi_light_scene):
    """Empirical pick frequency ≈ pmf, and pmfs sum to 1 over emitters."""
    lt = multi_light_scene.light_tree
    scene = multi_light_scene
    B = 200_000
    point = np.tile(np.float32([0.0, 0.2, 0.0]), (B, 1))
    key = rng.path_key(np.arange(B, dtype=np.uint32), 3, 1)
    _, u = rng.next_uniform(key)
    tri, pmf = pick_light(lt, point, u)

    emitters = np.asarray(scene.emissive_tris)
    one_point = point[:1]
    pmfs = np.array([float(emitter_pmf(lt, np.int32([e]), one_point)[0]) for e in emitters])
    np.testing.assert_allclose(pmfs.sum(), 1.0, atol=1e-4)

    for e, p in zip(emitters, pmfs):
        freq = (tri == e).mean()
        assert abs(freq - p) < 0.01, (e, freq, p)
    # the strong panel (power 20) must dominate the weak ones (power 0.5)
    mats = np.asarray(scene.geometry.tri_mat)[emitters]
    strong_mass = pmfs[mats == 1].sum()
    assert strong_mass > 2.0 * pmfs[mats != 1].sum()


def test_empty_tree_returns_invalid():
    lt = empty_light_tree(10)
    point = np.zeros((4, 3), np.float32)
    tri, pmf = pick_light(lt, point, np.float32([0.1, 0.4, 0.6, 0.9]))
    assert np.all(tri == -1)
    assert np.all(emitter_pmf(lt, np.int32([0, 5, -1, 3]), point) == 0.0)


@pytest.mark.parametrize("technique", [SamplingTechnique.LIGHT_SOURCE,
                                       SamplingTechnique.NEE_MIS])
def test_light_techniques_parity(technique):
    from fypraytracer_tpu.oracle.cpu_renderer import render_oracle
    from fypraytracer_tpu.render.renderer import Renderer

    builder, cam = cornell_box(width=48, height=48, with_spheres=True,
                               sphere_res=(5, 8))
    scene = builder.compile()
    settings = RenderSettings(technique=technique, bounces=2, samples=2,
                              sky_color=(0.05, 0.05, 0.08))
    want = render_oracle(scene, cam, settings, frame=1)
    r = Renderer(scene, cam, settings)
    got = np.asarray(r.render_hdr())
    diff = np.abs(got - want)
    frac_bad = (diff.max(axis=-1) > 1e-2).mean()
    assert frac_bad < 0.02, f"{frac_bad:.3%} differ"
    assert float(np.median(diff)) < 1e-4


def test_nee_converges_to_cosine_reference():
    """Equal-expectation check: NEE and cosine sampling estimate the same
    integral; long-run averages must agree (the reference's convergence-by-
    accumulation oracle, SURVEY §4.4)."""
    from fypraytracer_tpu.oracle.cpu_renderer import accumulate_oracle

    builder, cam = cornell_box(width=24, height=24, with_spheres=False)
    scene = builder.compile()
    frames = 60
    nee = accumulate_oracle(scene, cam, RenderSettings(
        technique=SamplingTechnique.NEE_MIS, bounces=2, samples=1), frames)
    cos = accumulate_oracle(scene, cam, RenderSettings(
        technique=SamplingTechnique.COSINE, bounces=2, samples=4), frames)
    # compare means over the image (noise-tolerant)
    assert abs(nee.mean() - cos.mean()) / max(cos.mean(), 1e-9) < 0.15
