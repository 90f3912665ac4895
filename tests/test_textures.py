"""Texture pipeline: atlas packing, samplers, end-to-end textured render,
Morton utilities, camera fly controls."""

import numpy as np

from fypraytracer_tpu.config import RenderSettings, SamplingTechnique
from fypraytracer_tpu.scene.build import SceneBuilder, pack_atlas
from fypraytracer_tpu.scene.procedural import quad


def _checker(n=16):
    y, x = np.mgrid[0:n, 0:n]
    c = ((x // 2 + y // 2) % 2).astype(np.float32)
    return np.stack([c, 1.0 - c, np.full_like(c, 0.5)], axis=-1)


def test_atlas_pack_and_samplers():
    from fypraytracer_tpu.ops.texture import sample_bilinear, sample_nearest

    tex = _checker(16)
    atlas = pack_atlas([tex])
    # page=None keeps native resolution (mip 0 untouched)
    assert atlas.pages.shape == (1, 16, 16, 3)
    np.testing.assert_allclose(atlas.pages[0], tex)
    assert atlas.bounce_pages.shape == (1, 16, 16, 3)
    tid = np.zeros(4, np.int32)
    u = np.float32([0.03, 0.97, 0.5, 0.25])
    v = np.float32([0.03, 0.03, 0.5, 0.75])
    near = sample_nearest(atlas, tid, u, v)
    bil = sample_bilinear(atlas, tid, u, v)
    # corner texel of the checker is class 0 -> red=0, green=1
    assert near[0, 1] == 1.0 and near[0, 0] == 0.0
    assert np.all((bil >= 0.0) & (bil <= 1.0))


def test_atlas_mip_levels():
    """Explicit page forcing + the prefiltered bounce level: the bounce
    page of a fine checker converges to the 0.5 mean (box filter), and a
    mixed-size pack upsamples the small texture to the shared page."""
    tex = _checker(64)
    atlas = pack_atlas([tex], bounce_page=16)
    assert atlas.bounce_pages.shape == (1, 16, 16, 3)
    np.testing.assert_allclose(atlas.bounce_pages[0, :, :, 0].mean(), 0.5,
                               atol=1e-6)
    forced = pack_atlas([tex], page=32)
    assert forced.pages.shape == (1, 32, 32, 3)

    mixed = pack_atlas([_checker(64), _checker(16)])
    assert mixed.pages.shape == (2, 64, 64, 3)
    assert mixed.size.tolist() == [[64, 64], [16, 16]]


def test_textured_render_end_to_end():
    """Albedo-map path through the full renderer: a textured quad viewed
    head-on shows the checker pattern (Renderer.cu:609-621 equivalent)."""
    from fypraytracer_tpu.core.camera import Camera
    from fypraytracer_tpu.render.renderer import Renderer

    b = SceneBuilder()
    tex_id = b.add_texture(_checker(8))
    lit = b.add_material(albedo=(1, 1, 1), albedo_map=tex_id)
    light = b.add_material(emission_color=(1, 1, 1), emission_power=8.0)
    q = quad(2.0, 2.0)
    b.add_mesh(*q, material=lit, position=(0, 0, 0))
    b.add_mesh(*quad(4.0, 4.0), material=light, position=(0, 3, 0),
               rotation=(180, 0, 0))
    scene = b.compile()
    # note: forward exactly anti-parallel to world up degenerates lookAt
    cam = Camera(position=(0, 1.6, 0.9), forward=(0, -0.85, -0.55), width=32,
                 height=32)
    r = Renderer(scene, cam, RenderSettings(
        technique=SamplingTechnique.LIGHT_SOURCE, samples=4))
    img = np.asarray(r.render_hdr()).reshape(32, 32, 3)
    lit_px = img[img.sum(-1) > 0.01]
    assert len(lit_px) > 200
    # checker: red-dominant and green-dominant pixel populations both exist
    assert (lit_px[:, 0] > lit_px[:, 1]).any()
    assert (lit_px[:, 1] > lit_px[:, 0]).any()


def test_morton_codes():
    from fypraytracer_tpu.accel.morton import morton3d, morton_order

    pts = np.float32([[0, 0, 0], [0.01, 0.01, 0.01], [29, 29, 29], [-29, -29, -29]])
    codes = morton3d(pts)
    assert codes.dtype == np.uint32
    # nearby points get nearby codes; extremes are ordered
    assert codes[3] < codes[0] <= codes[1] < codes[2]
    order = morton_order(np.random.default_rng(0).random((100, 3)).astype(np.float32) * 10)
    assert sorted(order.tolist()) == list(range(100))

    import jax.numpy as jnp
    jcodes = np.asarray(morton3d(jnp.asarray(pts)))
    np.testing.assert_array_equal(codes, jcodes)


def test_camera_fly():
    from fypraytracer_tpu.core.camera import Camera

    cam = Camera(position=(0, 0, 0), forward=(0, 0, -1), width=8, height=8)
    moved = cam.fly(0.1, forward=1.0)
    assert moved
    assert cam.position[2] < -0.4
    v0 = cam.forward.copy()
    cam.fly(0.1, yaw_delta=0.5)
    assert not np.allclose(cam.forward, v0)
    np.testing.assert_allclose(np.linalg.norm(cam.forward), 1.0, atol=1e-6)
    assert not cam.fly(0.1)  # no input -> unchanged