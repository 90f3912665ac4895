"""Legacy rays-in-sublanes megakernel helpers ((C, 1) per-ray scalars).

render/megakernel.py moved to the rays-in-lanes layout (per-ray scalars as
(R, 128) blocks — see its docstring); the ReSTIR DI megakernel still uses
the original layout because its HBM stage-buffer windows are DMA'd at
dynamic PIXEL offsets, which map to sublane (row) offsets only in this
layout.  This module keeps the original shared pieces until the ReSTIR
kernel is ported.

Shapes: per-ray scalars are (C, 1) blocks; trace intermediates are (C, T)
lane-major.  Table layouts: wn/wu/wv are (4, T) plane rows, A is
(T, _A_COLS) with megakernel._A_* column indices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from fypraytracer_tpu.render.megakernel import (
    _A_ALBEDO,
    _A_AREA,
    _A_E1,
    _A_E2,
    _A_EMISSION,
    _A_LEAF,
    _A_METAL,
    _A_N0,
    _A_N1,
    _A_N2,
    _A_P0,
    _A_ROUGH,
    _BIG,
    _PI,
    _norm3,
    build_attr_matrix,
)
from fypraytracer_tpu.scene.types import Scene

RAY_TILE = 256
TRI_TILE = 512

_A_COLS = 32


def prepare_scene_tables(scene: Scene):
    """Old-layout dense tables: wn/wu/wv (4, T) Baldwin–Weber plane rows,
    A (T, _A_COLS) attribute columns."""
    wn, wu, wv, A = build_attr_matrix(scene, TRI_TILE)
    return wn.T, wu.T, wv.T, A


def _make_raygen(cam, width, height, C):
    """Per-tile camera ray components from the (8,4) matrix block."""
    ip = cam[0:4]
    iv = cam[4:8]

    def raygen(pix):
        pxf = (pix % width).astype(jnp.float32)
        pyf = (pix // width).astype(jnp.float32)
        ndc_x = (pxf / width) * 2.0 - 1.0
        ndc_y = 1.0 - (pyf / height) * 2.0
        tx = ip[0, 0] * ndc_x + ip[0, 1] * ndc_y + ip[0, 2] + ip[0, 3]
        ty = ip[1, 0] * ndc_x + ip[1, 1] * ndc_y + ip[1, 2] + ip[1, 3]
        tz = ip[2, 0] * ndc_x + ip[2, 1] * ndc_y + ip[2, 2] + ip[2, 3]
        tw = ip[3, 0] * ndc_x + ip[3, 1] * ndc_y + ip[3, 2] + ip[3, 3]
        tx, ty, tz = _norm3(tx / tw, ty / tw, tz / tw)
        dx = iv[0, 0] * tx + iv[0, 1] * ty + iv[0, 2] * tz
        dy = iv[1, 0] * tx + iv[1, 1] * ty + iv[1, 2] * tz
        dz = iv[2, 0] * tx + iv[2, 1] * ty + iv[2, 2] * tz
        ox = jnp.zeros_like(dx) + iv[0, 3]
        oy = jnp.zeros_like(dx) + iv[1, 3]
        oz = jnp.zeros_like(dx) + iv[2, 3]
        return ox, oy, oz, dx, dy, dz

    return raygen


def _make_trace(wn_ref, wu_ref, wv_ref, onehot_ref, C, n_tri_tiles):
    """Dense closest-hit over triangle tiles; fills onehot_ref (C, T) with
    the winner row; returns (t, hitmask, u, v), all (C, 1)."""

    def trace(ox, oy, oz, dx, dy, dz):
        t_best = jnp.full((C, 1), _BIG, jnp.float32)
        u_best = jnp.zeros((C, 1), jnp.float32)
        v_best = jnp.zeros((C, 1), jnp.float32)
        t_tiles = []
        for k in range(n_tri_tiles):
            sl = slice(k * TRI_TILE, (k + 1) * TRI_TILE)
            wn = wn_ref[:, sl]
            wu = wu_ref[:, sl]
            wv = wv_ref[:, sl]
            o_n = ox * wn[0:1] + oy * wn[1:2] + oz * wn[2:3] + wn[3:4]
            d_n = dx * wn[0:1] + dy * wn[1:2] + dz * wn[2:3]
            o_u = ox * wu[0:1] + oy * wu[1:2] + oz * wu[2:3] + wu[3:4]
            d_u = dx * wu[0:1] + dy * wu[1:2] + dz * wu[2:3]
            o_v = ox * wv[0:1] + oy * wv[1:2] + oz * wv[2:3] + wv[3:4]
            d_v = dx * wv[0:1] + dy * wv[1:2] + dz * wv[2:3]

            okp = jnp.abs(d_n) > 1e-12
            t = -o_n / jnp.where(okp, d_n, 1.0)
            uu = o_u + t * d_u
            vv = o_v + t * d_v
            hit = okp & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0) \
                & (t > 1e-4)
            t = jnp.where(hit, t, _BIG)
            t_tiles.append((t, uu, vv))
            t_best = jnp.minimum(t_best, jnp.min(t, axis=1, keepdims=True))

        found_before = jnp.zeros((C, 1), jnp.bool_)
        for k in range(n_tri_tiles):
            t, uu, vv = t_tiles[k]
            is_min = (t == t_best) & (t_best < _BIG)
            col = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
            kk = jnp.min(jnp.where(is_min, col, 2 ** 30), axis=1,
                         keepdims=True)
            first = is_min & (col == kk) & ~found_before
            onehot_ref[:, k * TRI_TILE:(k + 1) * TRI_TILE] = \
                first.astype(jnp.float32)
            any_first = jnp.any(first, axis=1, keepdims=True)
            u_best = jnp.where(any_first,
                               jnp.sum(jnp.where(first, uu, 0.0), axis=1,
                                       keepdims=True), u_best)
            v_best = jnp.where(any_first,
                               jnp.sum(jnp.where(first, vv, 0.0), axis=1,
                                       keepdims=True), v_best)
            found_before = found_before | any_first

        return t_best, t_best < _BIG, u_best, v_best

    return trace


def _make_lookup(onehot_ref, a_ref):
    """One-hot matmul attribute lookup; returns (attrs, nx, ny, nz)."""

    def lookup(u, v):
        attrs = jnp.dot(onehot_ref[:], a_ref[:],
                        preferred_element_type=jnp.float32)
        w = 1.0 - u - v
        nx = (w * attrs[:, _A_N0:_A_N0 + 1] + u * attrs[:, _A_N1:_A_N1 + 1]
              + v * attrs[:, _A_N2:_A_N2 + 1])
        ny = (w * attrs[:, _A_N0 + 1:_A_N0 + 2]
              + u * attrs[:, _A_N1 + 1:_A_N1 + 2]
              + v * attrs[:, _A_N2 + 1:_A_N2 + 2])
        nz = (w * attrs[:, _A_N0 + 2:_A_N0 + 3]
              + u * attrs[:, _A_N1 + 2:_A_N1 + 3]
              + v * attrs[:, _A_N2 + 2:_A_N2 + 3])
        return (attrs,) + _norm3(nx, ny, nz)

    return lookup


def _cook_torrance_attrs(nx, ny, nz, vx, vy, vz, lx, ly, lz, attrs):
    """Per-channel Cook-Torrance (MathUtils.cuh:276-317) on (C,1) lanes."""
    alb = attrs[:, _A_ALBEDO:_A_ALBEDO + 3]
    rough = attrs[:, _A_ROUGH:_A_ROUGH + 1]
    metal = attrs[:, _A_METAL:_A_METAL + 1]
    hx, hy, hz = _norm3(vx + lx, vy + ly, vz + lz)
    ndl = jnp.maximum(nx * lx + ny * ly + nz * lz, 0.0)
    ndv = jnp.maximum(nx * vx + ny * vy + nz * vz, 0.0)
    ndh = jnp.maximum(nx * hx + ny * hy + nz * hz, 0.0)
    vdh = jnp.maximum(vx * hx + vy * hy + vz * hz, 0.0)
    a = rough * rough
    a2 = a * a
    k = rough * 0.5
    g = (ndv / jnp.maximum(ndv * (1.0 - k) + k, 1e-12)) \
        * (ndl / jnp.maximum(ndl * (1.0 - k) + k, 1e-12))
    den = ndh * ndh * (a2 - 1.0) + 1.0
    d = a2 * (1.0 / _PI) / jnp.maximum(den * den, 1e-12)
    spec_s = d * g / jnp.maximum(4.0 * ndv * ndl, 1e-12)
    s5 = (1.0 - vdh) ** 5
    live = (ndl > 0.0) & (ndv > 0.0)
    out = []
    for c in range(3):
        f0 = 0.04 * (1.0 - metal) + alb[:, c:c + 1] * metal
        fr = f0 + (1.0 - f0) * s5
        diff = (1.0 - fr) * alb[:, c:c + 1] * (1.0 / _PI)
        out.append(jnp.where(live, diff + spec_s * fr, 0.0))
    return out
