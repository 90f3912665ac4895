"""Color conversion, tonemapping, and pixel packing.

Re-implements ``ColorUtils.cuh:14-41`` (float4 ↔ packed ABGR) and the
accumulate→average→tonemap→clamp→pack epilogue shared by every shading
kernel in the reference (pattern at Renderer.cu:2448-2465), vectorized for
whole image tensors.  Works with numpy or jax.numpy inputs.
"""

from __future__ import annotations

import numpy as np

from fypraytracer_tpu.core.mathutils import _xp


def tonemap_reinhard(color):
    """Reinhard-style ``c / (c + 1)`` tonemap (Renderer.cu:2456)."""
    return color / (color + 1.0)


def finalize_pixels(accum_rgb, frame_index):
    """Average accumulated HDR by ``frame_index``, scrub NaN/Inf, tonemap,
    clamp — returns float RGB in [0,1].

    Mirrors the per-kernel epilogue (Renderer.cu:2448-2461): NaN/Inf pixels
    are zeroed (the reference's de-facto fault tolerance, SURVEY.md §5).
    """
    xp = _xp(accum_rgb)
    avg = accum_rgb / xp.maximum(frame_index, 1).astype(accum_rgb.dtype)
    avg = xp.where(xp.isfinite(avg), avg, 0.0)
    return xp.clip(tonemap_reinhard(avg), 0.0, 1.0)


def pack_abgr(rgb, alpha=1.0):
    """float RGB [0,1] -> packed uint32 ABGR (ColorUtils.cuh:14-32)."""
    xp = _xp(rgb)
    q = (xp.clip(rgb, 0.0, 1.0) * 255.0).astype(xp.uint32)
    a = xp.full(rgb.shape[:-1], int(alpha * 255.0) & 0xFF, dtype=xp.uint32)
    return (a << 24) | (q[..., 2] << 16) | (q[..., 1] << 8) | q[..., 0]


def unpack_abgr(packed):
    """packed uint32 ABGR -> float RGBA [0,1] (ColorUtils.cuh:34-41)."""
    xp = _xp(packed)
    r = (packed & 0xFF).astype(xp.float32)
    g = ((packed >> 8) & 0xFF).astype(xp.float32)
    b = ((packed >> 16) & 0xFF).astype(xp.float32)
    a = ((packed >> 24) & 0xFF).astype(xp.float32)
    return xp.stack([r, g, b, a], axis=-1) / 255.0


def to_uint8_rgb(rgb01):
    """float RGB [0,1] -> uint8, for image files and 8-bit MSE/PSNR."""
    xp = _xp(rgb01)
    return (xp.clip(rgb01, 0.0, 1.0) * 255.0).astype(xp.uint8)
