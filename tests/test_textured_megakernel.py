"""In-kernel texture fetch: megakernel paths vs wavefront on a textured
scene (Renderer.cu:609-621 semantics through the atlas tables).

The test textures are <= KERNEL_TEX_PAGE so the megakernel's primary-level
table is bit-identical to the wavefront's mip 0 and parity is exact up to
float ordering (larger textures are box-filtered for the kernel — a
documented fast-path deviation)."""

import numpy as np
import pytest

from fypraytracer_tpu.config import RenderSettings, SamplingTechnique
from fypraytracer_tpu.scene.procedural import cornell_box, quad


def textured_cornell(width=32, height=32):
    builder, cam = cornell_box(width=width, height=height, sphere_res=(6, 10))
    h = w = 64
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    checker = ((xx // 8 + yy // 8) % 2).astype(np.float32)
    tex = np.stack([checker, 0.5 + 0.3 * checker, 1.0 - checker], axis=-1)
    tid = builder.add_texture(tex)
    tmat = builder.add_material(albedo=(0.2, 0.2, 0.2), roughness=0.8,
                                albedo_map=tid)
    builder.add_mesh(*quad(1.0, 1.0), material=tmat, position=(0.0, 0.01, 0.3))
    return builder.compile(), cam


@pytest.fixture(scope="module")
def tex_scene():
    return textured_cornell()


@pytest.mark.parametrize("technique", [SamplingTechnique.COSINE,
                                       SamplingTechnique.NEE_MIS])
def test_textured_megakernel_parity(tex_scene, technique):
    from fypraytracer_tpu.render.megakernel import MegakernelRenderer
    from fypraytracer_tpu.render.renderer import Renderer

    scene, cam = tex_scene
    settings = RenderSettings(technique=technique, bounces=2, samples=1,
                              sky_color=(0.1, 0.15, 0.2))
    r = Renderer(scene, cam, settings)
    for _ in range(2):
        ref = r.render_hdr()
    mk = MegakernelRenderer(scene, cam, settings, interpret=True)
    assert mk.tex_tables is not None, "texture tables not engaged"
    got = np.asarray(mk.render_many(2))
    diff = np.abs(got - np.asarray(ref))
    assert float(np.median(diff)) < 1e-5
    assert (diff.max(axis=-1) > 1e-3).mean() < 0.01


def test_textured_restir_di_unbiased(tex_scene):
    """Textured DI megakernel mean matches the light-source estimator."""
    from fypraytracer_tpu.render.megakernel_restir import MegakernelReSTIRDI
    from fypraytracer_tpu.render.renderer import Renderer

    scene, cam = tex_scene
    sdi = RenderSettings(technique=SamplingTechnique.RESTIR_DI,
                         light_candidates=4, spatial_neighbors=2,
                         spatial_radius=6)
    mk = MegakernelReSTIRDI(scene, cam, sdi, interpret=True)
    img = np.asarray(mk.render_many(6))

    sl = RenderSettings(technique=SamplingTechnique.LIGHT_SOURCE, samples=4)
    r = Renderer(scene, cam, sl)
    for _ in range(6):
        ref = r.render_hdr()
    ref = np.asarray(ref).reshape(img.shape)
    assert np.isfinite(img).all()
    assert abs(img.mean() - ref.mean()) / ref.mean() < 0.05


def test_textured_restir_gi_runs(tex_scene):
    """Textured GI megakernel produces finite, plausibly-lit output."""
    from fypraytracer_tpu.render.megakernel_restir_gi import MegakernelReSTIRGI

    scene, cam = tex_scene
    sgi = RenderSettings(technique=SamplingTechnique.RESTIR_GI, bounces=2,
                         spatial_neighbors=2, spatial_radius=6)
    mk = MegakernelReSTIRGI(scene, cam, sgi, interpret=True)
    img = np.asarray(mk.render_many(4))
    assert np.isfinite(img).all()
    assert img.mean() > 0.01
