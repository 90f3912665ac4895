"""Camera matrix + ray-generation semantics (Camera.cpp parity)."""

import numpy as np

from fypraytracer_tpu.core.camera import Camera, generate_rays


def test_center_ray_points_forward():
    cam = Camera(position=(1, 2, 3), forward=(0, 0, -1), width=101, height=101)
    o, d = generate_rays(cam.inv_projection, cam.inv_view, cam.width, cam.height, xp=np)
    # pixel grid: reference maps x/W*2-1, so exact center is between pixels;
    # pixel (50,50) maps to ndc (-1 + 100/101, ...) ≈ -0.0099 — near center
    center = d[50 * 101 + 50]
    center = center / np.linalg.norm(center)
    assert center[2] < -0.99
    np.testing.assert_allclose(o[0], [1, 2, 3], atol=1e-6)


def test_fov_edges():
    cam = Camera(position=(0, 0, 0), forward=(0, 0, -1), vfov_deg=90.0,
                 width=100, height=100)
    o, d = generate_rays(cam.inv_projection, cam.inv_view, cam.width, cam.height, xp=np)
    top_left = d[0]  # row 0 = ndc y -1 (bottom in camera space)
    # vfov 90 → |y/z| at ndc edge = tan(45°) = 1
    assert abs(abs(top_left[1] / top_left[2]) - 1.0) < 0.05


def test_rays_are_unit_and_rotate_with_view():
    cam = Camera(position=(0, 0, 0), forward=(1, 0, 0), width=32, height=32)
    _, d = generate_rays(cam.inv_projection, cam.inv_view, 32, 32, xp=np)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    center = d[16 * 32 + 16]
    assert center[0] > 0.95


def test_prev_matrix_latching():
    cam = Camera(position=(0, 0, 0), forward=(0, 0, -1), width=8, height=8)
    v0 = cam.view.copy()
    cam.move_to((1, 0, 0))
    assert np.allclose(cam.prev_view, v0)          # not yet committed
    cam.commit_frame()
    assert np.allclose(cam.prev_view, cam.view)
