"""Pallas TPU kernel: dense ray×triangle closest-hit intersection.

The XLA version (ops/dense.py) materializes its (C, 3T) projection
matrices in HBM between the matmul and the epilogue; at 65k rays × ~1k
triangles that is gigabytes of HBM traffic per trace.  This kernel keeps
the whole tile pipeline in VMEM: per grid step it loads a (RAY_TILE, 4)
ray block and a (4, TRI_TILE) slab of per-triangle affine rows (the
Baldwin–Weber constants, see ops/dense.py), runs the two MXU products and
the VPU hit-test epilogue entirely on-chip, and folds a running
closest-hit (t, triangle id, u, v) across triangle tiles.  HBM traffic
drops to rays-in + results-out.

Grid: (ray_tiles, tri_tiles); the output block is revisited across the
triangle axis (accumulation pattern), initialized at tri-tile 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fypraytracer_tpu.ops.intersect import T_EPSILON
from fypraytracer_tpu.scene.types import Geometry

_BIG = 3.0e38  # python float: jnp scalars would be captured consts in the kernel

RAY_TILE = 256
TRI_TILE = 512


def _intersect_kernel(o4_ref, d4_ref, tmax_ref, wn_ref, wu_ref, wv_ref,
                      t_ref, tri_ref, u_ref, v_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        t_ref[:] = jnp.full_like(t_ref, _BIG)
        tri_ref[:] = jnp.full_like(tri_ref, -1)
        u_ref[:] = jnp.zeros_like(u_ref)
        v_ref[:] = jnp.zeros_like(v_ref)

    o4 = o4_ref[:]                       # (C, 4)
    d4 = d4_ref[:]
    o_n = jnp.dot(o4, wn_ref[:], preferred_element_type=jnp.float32)  # (C, Tt)
    d_n = jnp.dot(d4, wn_ref[:], preferred_element_type=jnp.float32)
    o_u = jnp.dot(o4, wu_ref[:], preferred_element_type=jnp.float32)
    d_u = jnp.dot(d4, wu_ref[:], preferred_element_type=jnp.float32)
    o_v = jnp.dot(o4, wv_ref[:], preferred_element_type=jnp.float32)
    d_v = jnp.dot(d4, wv_ref[:], preferred_element_type=jnp.float32)

    parallel_ok = jnp.abs(d_n) > 1e-12
    t = -o_n / jnp.where(parallel_ok, d_n, 1.0)
    u = o_u + t * d_u
    v = o_v + t * d_v
    tmax = tmax_ref[:]                   # (C, 1)
    hit = parallel_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) \
        & (t > T_EPSILON) & (t < tmax)
    t = jnp.where(hit, t, _BIG)

    t_min = jnp.min(t, axis=1, keepdims=True)            # (C, 1)
    best = (t == t_min) & (t_min < _BIG)
    # smallest column index among ties (cumsum is not lowerable on TPU)
    col = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
    k = jnp.min(jnp.where(best, col, 2 ** 30), axis=1, keepdims=True)
    first = best & (col == k)
    u_best = jnp.sum(jnp.where(first, u, 0.0), axis=1, keepdims=True)
    v_best = jnp.sum(jnp.where(first, v, 0.0), axis=1, keepdims=True)

    closer = t_min < t_ref[:]
    t_ref[:] = jnp.where(closer, t_min, t_ref[:])
    tri_ref[:] = jnp.where(closer, j * TRI_TILE + k, tri_ref[:])
    u_ref[:] = jnp.where(closer, u_best, u_ref[:])
    v_ref[:] = jnp.where(closer, v_best, v_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_trace(o4, d4, tmax, wn, wu, wv, *, interpret=False):
    B = o4.shape[0]
    T3 = wn.shape[1]
    grid = (B // RAY_TILE, T3 // TRI_TILE)

    out_shape = [
        jax.ShapeDtypeStruct((B, 1), jnp.float32),   # t
        jax.ShapeDtypeStruct((B, 1), jnp.int32),     # tri
        jax.ShapeDtypeStruct((B, 1), jnp.float32),   # u
        jax.ShapeDtypeStruct((B, 1), jnp.float32),   # v
    ]
    ray_spec = pl.BlockSpec((RAY_TILE, 4), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((4, TRI_TILE), lambda i, j: (0, j),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((RAY_TILE, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)

    t, tri, u, v = pl.pallas_call(
        _intersect_kernel,
        grid=grid,
        in_specs=[ray_spec, ray_spec,
                  pl.BlockSpec((RAY_TILE, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
                  w_spec, w_spec, w_spec],
        out_specs=[out_spec] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(o4, d4, tmax, wn, wu, wv)
    return t[:, 0], tri[:, 0], u[:, 0], v[:, 0]


def trace_rays_pallas(geometry: Geometry, origins, directions, t_max=None,
                      interpret: bool = False):
    """Same contract as ops.dense.trace_rays_dense, Pallas-backed."""
    origins = jax.lax.stop_gradient(origins)
    directions = jax.lax.stop_gradient(directions)

    tv = geometry.tri_v
    p0 = geometry.positions[tv[:, 0]]
    e1 = geometry.positions[tv[:, 1]] - p0
    e2 = geometry.positions[tv[:, 2]] - p0

    n = jnp.cross(e1, e2)
    denom = (n * n).sum(-1)
    valid_tri = denom > 1e-18
    inv_denom = 1.0 / jnp.where(valid_tri, denom, 1.0)
    # zero rows for degenerate tris -> d_n == 0 -> parallel -> miss
    n = jnp.where(valid_tri[:, None], n, 0.0)
    u3 = jnp.cross(e2, n) * inv_denom[:, None]
    v3 = jnp.cross(n, e1) * inv_denom[:, None]
    wn = jnp.concatenate([n, -(n * p0).sum(-1, keepdims=True)], axis=-1).T
    wu = jnp.concatenate([u3, -(u3 * p0).sum(-1, keepdims=True)], axis=-1).T
    wv = jnp.concatenate([v3, -(v3 * p0).sum(-1, keepdims=True)], axis=-1).T

    B = origins.shape[0]
    T = tv.shape[0]
    pad_b = (-B) % RAY_TILE
    pad_t = (-T) % TRI_TILE

    o4 = jnp.concatenate([origins, jnp.ones((B, 1), origins.dtype)], axis=-1)
    d4 = jnp.concatenate([directions, jnp.zeros((B, 1), directions.dtype)], axis=-1)
    tmax = (origins[:, :1] + directions[:, :1]) * 0.0 + _BIG if t_max is None \
        else jnp.asarray(t_max, jnp.float32)[:, None]

    if pad_b:
        o4 = jnp.pad(o4, ((0, pad_b), (0, 0)))
        d4 = jnp.pad(d4, ((0, pad_b), (0, 0)), constant_values=1.0)
        tmax = jnp.pad(tmax, ((0, pad_b), (0, 0)))
    if pad_t:
        wn = jnp.pad(wn, ((0, 0), (0, pad_t)))
        wu = jnp.pad(wu, ((0, 0), (0, pad_t)))
        wv = jnp.pad(wv, ((0, 0), (0, pad_t)))

    t, tri, u, v = _pallas_trace(o4, d4, tmax, wn, wu, wv, interpret=interpret)
    t, tri, u, v = t[:B], tri[:B], u[:B], v[:B]
    miss = tri < 0
    return dict(tri=tri, t=jnp.where(miss, -1.0, t), u=u, v=v)
