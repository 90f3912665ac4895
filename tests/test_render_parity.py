"""Seed-matched parity: jitted BVH wavefront vs NumPy linear-intersection
oracle (SURVEY.md §7 step 4 acceptance: forward image allclose at matched
seeds)."""

import numpy as np
import pytest

from fypraytracer_tpu.config import RenderSettings, SamplingTechnique
from fypraytracer_tpu.oracle.cpu_renderer import render_oracle
from fypraytracer_tpu.scene.procedural import cornell_box


@pytest.fixture(scope="module")
def small_scene():
    builder, cam = cornell_box(width=64, height=64, with_spheres=True,
                               sphere_res=(6, 10))
    return builder.compile(light_tree=False), cam


@pytest.mark.parametrize("technique", [
    SamplingTechnique.BRUTE_FORCE,
    SamplingTechnique.UNIFORM,
    SamplingTechnique.COSINE,
    SamplingTechnique.GGX,
    SamplingTechnique.BRDF,
])
def test_forward_parity(small_scene, technique):
    from fypraytracer_tpu.render.renderer import Renderer

    scene, cam = small_scene
    settings = RenderSettings(technique=technique, bounces=2, samples=2,
                              sky_color=(0.1, 0.15, 0.2))

    oracle_hdr = render_oracle(scene, cam, settings, frame=1)

    r = Renderer(scene, cam, settings)
    got_hdr = np.asarray(r.render_hdr())

    # identical RNG streams ⇒ same paths; tolerate float-order differences
    # and rare triangle-edge tie flips (isolated pixels)
    diff = np.abs(got_hdr - oracle_hdr)
    frac_bad = (diff.max(axis=-1) > 1e-2).mean()
    assert frac_bad < 0.01, f"{frac_bad:.3%} pixels differ"
    assert float(np.median(diff)) < 1e-4


def test_accumulation_matches_oracle(small_scene):
    from fypraytracer_tpu.render.renderer import Renderer

    scene, cam = small_scene
    settings = RenderSettings(technique=SamplingTechnique.COSINE, bounces=1,
                              samples=1)
    r = Renderer(scene, cam, settings)
    for _ in range(3):
        avg = r.render_hdr()
    want = np.mean([render_oracle(scene, cam, settings, f) for f in (1, 2, 3)], axis=0)
    diff = np.abs(np.asarray(avg) - want)
    assert (diff.max(axis=-1) > 1e-2).mean() < 0.01


def test_render_many_matches_frame_loop(small_scene):
    """Multi-frame single-dispatch accumulation == frame-by-frame loop."""
    from fypraytracer_tpu.render.renderer import Renderer

    scene, cam = small_scene
    settings = RenderSettings(technique=SamplingTechnique.COSINE, bounces=1,
                              samples=1)
    r1 = Renderer(scene, cam, settings)
    for _ in range(4):
        loop_avg = r1.render_hdr()

    r2 = Renderer(scene, cam, settings)
    many_avg = r2.render_many(4)
    assert r2.frame_index == 5
    np.testing.assert_allclose(np.asarray(many_avg), np.asarray(loop_avg),
                               atol=1e-5)


def test_render_many_restir(small_scene):
    from fypraytracer_tpu.render.renderer import Renderer

    scene, cam = small_scene
    settings = RenderSettings(technique=SamplingTechnique.RESTIR_DI,
                              light_candidates=2, spatial_neighbors=2,
                              spatial_radius=4)
    r1 = Renderer(scene, cam, settings)
    for _ in range(3):
        loop_avg = r1.render_hdr()
    r2 = Renderer(scene, cam, settings)
    many_avg = r2.render_many(3)
    np.testing.assert_allclose(np.asarray(many_avg), np.asarray(loop_avg),
                               atol=1e-4)


def test_megakernel_matches_wavefront_cosine():
    """Fused Pallas megakernel (interpret mode) vs the wavefront renderer
    at matched RNG seeds."""
    from fypraytracer_tpu.render.megakernel import MegakernelRenderer
    from fypraytracer_tpu.render.renderer import Renderer
    from fypraytracer_tpu.scene.procedural import cornell_box

    builder, cam = cornell_box(width=32, height=32, sphere_res=(6, 10))
    scene = builder.compile()
    settings = RenderSettings(technique=SamplingTechnique.COSINE, bounces=2,
                              samples=2, sky_color=(0.1, 0.15, 0.2))
    r = Renderer(scene, cam, settings)
    for _ in range(3):
        ref = r.render_hdr()
    mk = MegakernelRenderer(scene, cam, settings, interpret=True)
    got = np.asarray(mk.render_many(3))
    diff = np.abs(got - np.asarray(ref))
    assert float(np.median(diff)) < 1e-5
    assert (diff.max(axis=-1) > 1e-3).mean() < 0.01
    assert abs(got.mean() - np.asarray(ref).mean()) / np.asarray(ref).mean() < 0.01


def test_megakernel_matches_wavefront_nee():
    """NEE+MIS megakernel (in-kernel light tree) vs wavefront at matched
    seeds."""
    from fypraytracer_tpu.render.megakernel import MegakernelRenderer
    from fypraytracer_tpu.render.renderer import Renderer
    from fypraytracer_tpu.scene.procedural import cornell_box

    builder, cam = cornell_box(width=32, height=32, sphere_res=(6, 10))
    scene = builder.compile()
    settings = RenderSettings(technique=SamplingTechnique.NEE_MIS, bounces=2,
                              samples=1, sky_color=(0.05, 0.06, 0.08))
    r = Renderer(scene, cam, settings)
    for _ in range(3):
        ref = r.render_hdr()
    mk = MegakernelRenderer(scene, cam, settings, interpret=True)
    got = np.asarray(mk.render_many(3))
    diff = np.abs(got - np.asarray(ref))
    assert float(np.median(diff)) < 1e-5
    assert (diff.max(axis=-1) > 1e-3).mean() < 0.01
    assert abs(got.mean() - np.asarray(ref).mean()) / np.asarray(ref).mean() < 0.01


def test_megakernel_matches_wavefront_light():
    """Light-source-sampling megakernel (one-bounce direct, light-tree
    pick, sky-through-shadow quirk) vs wavefront at matched seeds
    (PerPixel_LightSourceSampling, Renderer.cu:1287-1408)."""
    from fypraytracer_tpu.render.megakernel import MegakernelRenderer
    from fypraytracer_tpu.render.renderer import Renderer
    from fypraytracer_tpu.scene.procedural import cornell_box

    builder, cam = cornell_box(width=32, height=32, sphere_res=(6, 10))
    scene = builder.compile()
    settings = RenderSettings(technique=SamplingTechnique.LIGHT_SOURCE,
                              bounces=2, samples=2,
                              sky_color=(0.05, 0.06, 0.08))
    r = Renderer(scene, cam, settings)
    for _ in range(3):
        ref = r.render_hdr()
    mk = MegakernelRenderer(scene, cam, settings, interpret=True)
    got = np.asarray(mk.render_many(3))
    diff = np.abs(got - np.asarray(ref))
    assert float(np.median(diff)) < 1e-5
    assert (diff.max(axis=-1) > 1e-3).mean() < 0.01
    assert abs(got.mean() - np.asarray(ref).mean()) / np.asarray(ref).mean() < 0.01


@pytest.mark.parametrize("technique", [SamplingTechnique.GGX,
                                       SamplingTechnique.BRDF,
                                       SamplingTechnique.UNIFORM])
def test_megakernel_matches_wavefront_samplers(technique):
    """Remaining hemisphere samplers through the megakernel."""
    from fypraytracer_tpu.render.megakernel import MegakernelRenderer
    from fypraytracer_tpu.render.renderer import Renderer
    from fypraytracer_tpu.scene.procedural import cornell_box

    builder, cam = cornell_box(width=32, height=32, sphere_res=(6, 10))
    scene = builder.compile()
    settings = RenderSettings(technique=technique, bounces=1, samples=2,
                              sky_color=(0.1, 0.15, 0.2))
    r = Renderer(scene, cam, settings)
    for _ in range(2):
        ref = r.render_hdr()
    mk = MegakernelRenderer(scene, cam, settings, interpret=True)
    got = np.asarray(mk.render_many(2))
    diff = np.abs(got - np.asarray(ref))
    assert float(np.median(diff)) < 1e-5
    assert (diff.max(axis=-1) > 1e-3).mean() < 0.02
