"""Morton codes + linear-BVH ordering.

The reference ships 30-bit Morton encoding and a software CLZ for a GPU
LBVH (Karras) builder that was never enabled (MortonCode.cuh:11-38,
BitManipulation.cuh:7-17, dead kernels BVH.cu:1-279).  Here the utilities
are *live*, vectorized, and backend-generic: Morton-sorting primitives is
used to order rays/primitives for memory coherence, and provides the
groundwork for a device-side LBVH build (dynamic scenes without host
round trips).

Scene bounds quantization matches the reference's SceneSettings ±30 box
(Scene.h:17-21) when ``lo``/``hi`` are omitted.
"""

from __future__ import annotations

import numpy as np

from fypraytracer_tpu.core.mathutils import _xp

SCENE_BOUND = 30.0  # Scene.h:17-21


def expand_bits(v):
    """Spread the low 10 bits of each element to every 3rd bit
    (MortonCode.cuh:11-24 semantics, vectorized)."""
    xp = _xp(v)
    v = v.astype(np.uint32) & np.uint32(0x3FF)
    v = (v | (v << np.uint32(16))) & np.uint32(0x030000FF)
    v = (v | (v << np.uint32(8))) & np.uint32(0x0300F00F)
    v = (v | (v << np.uint32(4))) & np.uint32(0x030C30C3)
    v = (v | (v << np.uint32(2))) & np.uint32(0x09249249)
    return v


def morton3d(points, lo=None, hi=None):
    """30-bit Morton codes for (..., 3) points (MortonCode.cuh:26-38)."""
    xp = _xp(points)
    if lo is None:
        lo = -SCENE_BOUND
    if hi is None:
        hi = SCENE_BOUND
    q = xp.clip((points - lo) / (hi - lo), 0.0, 1.0)
    g = xp.minimum((q * 1024.0), 1023.0).astype(np.uint32)
    return (expand_bits(g[..., 0]) << np.uint32(2)) \
        | (expand_bits(g[..., 1]) << np.uint32(1)) \
        | expand_bits(g[..., 2])


def morton_order(points, lo=None, hi=None):
    """Permutation sorting points along the Z-order curve — used to sort
    primitives (or rays by hit position) for gather coherence."""
    xp = _xp(points)
    return xp.argsort(morton3d(points, lo, hi))
