"""Procedural geometry + canonical test scenes.

Replaces the reference's hard-coded scene constructor (WalnutApp.cpp:43-521
builds a Cornell-box-like room from inline vertex lists + OBJ imports) and
its procedural UV sphere (Mesh.cpp:7-95) with parametric builders.
"""

from __future__ import annotations

import numpy as np

from fypraytracer_tpu.core.camera import Camera
from fypraytracer_tpu.scene.build import SceneBuilder


def quad(size_x: float = 1.0, size_z: float = 1.0):
    """Unit quad in the XZ plane facing +Y, centered at origin."""
    hx, hz = size_x / 2.0, size_z / 2.0
    positions = np.array(
        [[-hx, 0, -hz], [hx, 0, -hz], [hx, 0, hz], [-hx, 0, hz]], np.float32)
    tri_v = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    normals = np.tile(np.float32([0, 1, 0]), (4, 1))
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    return positions, tri_v, normals, uvs


def box(size=(1.0, 1.0, 1.0)):
    """Axis-aligned box centered at origin, outward normals, 12 triangles."""
    sx, sy, sz = np.asarray(size, np.float32) / 2.0
    faces = []
    # (axis, sign): plane at axis=sign*half, normal = sign*axis
    for axis in range(3):
        for sign in (-1.0, 1.0):
            n = np.zeros(3, np.float32)
            n[axis] = sign
            u = np.zeros(3, np.float32)
            u[(axis + 1) % 3] = 1.0
            v = np.cross(n, u)
            half = np.float32([sx, sy, sz])
            c = n * half
            ue = u * half
            ve = v * half
            quad_pts = [c - ue - ve, c + ue - ve, c + ue + ve, c - ue + ve]
            faces.append((np.asarray(quad_pts, np.float32), n))
    positions, tri_v, normals, uvs = [], [], [], []
    for i, (pts, n) in enumerate(faces):
        base = 4 * i
        positions.append(pts)
        normals.append(np.tile(n, (4, 1)))
        uvs.append(np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32))
        tri_v.append(np.array([[base, base + 1, base + 2], [base, base + 2, base + 3]], np.int32))
    return (np.concatenate(positions), np.concatenate(tri_v),
            np.concatenate(normals), np.concatenate(uvs))


def uv_sphere(radius: float = 1.0, rows: int = 16, cols: int = 32):
    """UV sphere with analytic normals (Mesh::GenerateSphereMesh semantics,
    Mesh.cpp:7-95: latitude rings × longitude segments, pole caps)."""
    positions, normals, uvs = [], [], []
    for r in range(rows + 1):
        theta = np.pi * r / rows
        for c in range(cols + 1):
            phi = 2.0 * np.pi * c / cols
            n = np.float32([np.sin(theta) * np.cos(phi), np.cos(theta),
                            np.sin(theta) * np.sin(phi)])
            positions.append(n * radius)
            normals.append(n)
            uvs.append(np.float32([c / cols, r / rows]))
    tri_v = []
    stride = cols + 1
    for r in range(rows):
        for c in range(cols):
            a = r * stride + c
            b = a + stride
            tri_v.append([a, b, a + 1])
            tri_v.append([a + 1, b, b + 1])
    return (np.asarray(positions, np.float32), np.asarray(tri_v, np.int32),
            np.asarray(normals, np.float32), np.asarray(uvs, np.float32))


def cornell_box(width: int = 256, height: int = 256, light_power: float = 5.0,
                with_spheres: bool = True, sphere_res: tuple = (12, 24)):
    """The flagship benchmark scene: Cornell-box room + area light + two
    spheres (one rough diffuse, one metallic) — the structural analog of
    the reference's hard-coded room with area-light planes
    (WalnutApp.cpp:127-503).

    Returns ``(SceneBuilder, Camera)`` — call ``builder.compile()``.
    """
    b = SceneBuilder()
    white = b.add_material(albedo=(0.73, 0.73, 0.73), roughness=1.0)
    red = b.add_material(albedo=(0.65, 0.05, 0.05), roughness=1.0)
    green = b.add_material(albedo=(0.12, 0.45, 0.15), roughness=1.0)
    light = b.add_material(albedo=(0.0, 0.0, 0.0),
                           emission_color=(1.0, 1.0, 1.0),
                           emission_power=light_power)

    q = quad(2.0, 2.0)
    # floor (y=0, up), ceiling (y=2, down), back wall (z=-1), left red, right green
    b.add_mesh(*q, material=white, position=(0, 0, 0))
    b.add_mesh(*q, material=white, position=(0, 2, 0), rotation=(180, 0, 0))
    b.add_mesh(*q, material=white, position=(0, 1, -1), rotation=(90, 0, 0))
    b.add_mesh(*q, material=red, position=(-1, 1, 0), rotation=(0, 0, -90))
    b.add_mesh(*q, material=green, position=(1, 1, 0), rotation=(0, 0, 90))
    # area light just under the ceiling, facing down
    lq = quad(0.6, 0.6)
    b.add_mesh(*lq, material=light, position=(0, 1.98, 0), rotation=(180, 0, 0))

    if with_spheres:
        rough = b.add_material(albedo=(0.8, 0.6, 0.2), roughness=0.4, metallic=0.0)
        metal = b.add_material(albedo=(0.9, 0.9, 0.9), roughness=0.15, metallic=1.0)
        s = uv_sphere(0.35, *sphere_res)
        b.add_mesh(*s, material=rough, position=(-0.4, 0.35, -0.3))
        b.add_mesh(*s, material=metal, position=(0.45, 0.35, 0.25))

    cam = Camera(position=(0.0, 1.0, 2.6), forward=(0.0, 0.0, -1.0),
                 vfov_deg=45.0, width=width, height=height)
    return b, cam


def single_triangle():
    """Minimal scene for unit tests: one emissive-lit diffuse triangle."""
    b = SceneBuilder()
    mat = b.add_material(albedo=(1.0, 0.0, 0.0), roughness=1.0)
    positions = np.float32([[-1, -1, 0], [1, -1, 0], [0, 1, 0]])
    tri_v = np.int32([[0, 1, 2]])
    normals = np.tile(np.float32([0, 0, 1]), (3, 1))
    b.add_mesh(positions, tri_v, normals, material=mat)
    cam = Camera(position=(0, 0, 3), forward=(0, 0, -1), width=64, height=64)
    return b, cam
