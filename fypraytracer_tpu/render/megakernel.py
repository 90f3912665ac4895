"""Fused Pallas megakernel renderer — the speed-of-light path for small
scenes.

Motivation: on TPU (and especially through remote runtimes) a frame built
from hundreds of XLA ops pays per-op dispatch/HBM-materialization costs
that dwarf the actual FLOPs.  This kernel fuses the ENTIRE frame loop —
ray generation, dense Baldwin–Weber intersection, hit-attribute lookup,
sampling, emission accumulation, and multi-frame accumulation — into ONE
``pallas_call`` whose working set lives in VMEM.

Layout (v2, the TPU-native answer to the reference's per-thread megakernel
Renderer.cu:565-701 — designed around the (8, 128) f32 vreg):

  * **rays-in-lanes** — per-ray scalars are ``(R, 128)`` blocks (ray index
    in the LANE dimension), so every VPU shading op runs at full lane
    occupancy.  The previous layout kept per-ray scalars as (C, 1) columns
    and wasted 127/128 lanes of every op; shading dominated frame time
    (PERF.md).
  * **frames-in-sublanes** — the R sublane rows of each block hold R
    consecutive FRAMES of the same 128 pixels.  RNG keys are
    (pixel, frame)-counter-derived, so rows are independent streams and a
    whole frame group shades in one set of full (8, 128) vregs.  The frame
    sum is a sublane reduction.
  * **trace transposed** — intersection intermediates are
    (triangle-tile, ray-lane) blocks; the closest hit is an in-loop argmin
    that yields a per-ray TRIANGLE INDEX.  Attribute fetch is the one-hot
    matmul ``A_T (K, T) @ onehot (T, 128)`` on the MXU — no per-lane
    gathers, which Mosaic lowers poorly.
  * **primary-ray hoisting** — the camera is static within a dispatch, so
    the primary hit of each pixel is traced ONCE per kernel instance and
    reused by every frame/sample (the estimator is unchanged: the primary
    trace is deterministic; the reference retraces it per frame only
    because each CUDA launch starts cold).
  * the RNG is the framework's counter-based PCG implemented with in-
    kernel uint32 vector ops, bit-identical to core/rng.py, so the
    megakernel matches the wavefront renderer at equal seeds;
  * the frame-group loop is a ``fori_loop`` *inside* the kernel: N frames
    of a pixel tile cost one kernel launch and zero HBM round trips.

Supports the hemisphere-sampler family and NEE+MIS (in-kernel light tree)
on textured or untextured scenes (albedo maps are fetched in-kernel from
VMEM-resident atlas tables — see ``build_tex_lookup``); the general
wavefront (render/integrators.py) remains the fallback for big scenes and
odd configurations.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# unroll factor of the trace fori (perf experiment knob; 1 = no unroll)
_TRACE_UNROLL = int(os.environ.get("FYP_TRACE_UNROLL", "1"))

from fypraytracer_tpu.scene.types import Scene

# Rays per lane block / triangles per intersection tile.  Wider lane
# blocks amortize fori_loop per-iteration overhead, which dominates this
# runtime (measured NEE ms/frame at (C, TT): (128,512)→9.2, (256,256)→2.9,
# (512,256)→0.92); the ceiling is the ~16 MB VMEM scoped stack.
RAY_LANES = 512
TRI_TILE = 256

_BIG = 3.0e38
_PI = 3.1415926535

# PCG constants (core/rng.py — keep bit-identical)
_MUL1 = 747796405
_INC = 2891336453
_MUL2 = 277803737
_GOLDEN = 0x9E3779B9
_INV_24 = float(np.float32(1.0) / np.float32(16777216.0))


def _u32(x):
    return jnp.uint32(x)


def _pcg(x):
    state = x * _u32(_MUL1) + _u32(_INC)
    word = ((state >> ((state >> _u32(28)) + _u32(4))) ^ state) * _u32(_MUL2)
    return (word >> _u32(22)) ^ word


def _fold(key, data):
    return _pcg(key ^ (data * _u32(_GOLDEN) + _u32(_INC)))


def _next_uniform(key):
    """Matches core/rng.py::next_uniform: top 24 bits × 2⁻²⁴ (the int32
    detour exists because Mosaic lowers int32→f32 but not uint32→f32)."""
    nk = _pcg(key)
    bits = pltpu.bitcast(nk >> _u32(8), jnp.int32)
    return nk, bits.astype(jnp.float32) * _INV_24


# attribute table rows (A_T is (K=_A_COLS, T): one row per attribute,
# triangle id in the lane dimension)
_A_ALBEDO = 0   # 0:3
_A_EMISSION = 3  # 3:6
_A_ROUGH = 6
_A_METAL = 7
_A_N0 = 8       # 8:11
_A_N1 = 11      # 11:14
_A_N2 = 14      # 14:17
_A_P0 = 17      # 17:20 triangle vertex 0 (world)
_A_E1 = 20      # 20:23 edge 1
_A_E2 = 23      # 23:26 edge 2
_A_AREA = 26
_A_LEAF = 27    # light-tree leaf id of this triangle (-1 none)
_A_NS = 28      # 28:31 unnormalized n0+n1+n2 (area-light facet normal)
_A_UV0 = 31     # 31:33 vertex uvs (in-kernel texture fetch)
_A_UV1 = 33     # 33:35
_A_UV2 = 35     # 35:37
_A_TEXPAGE = 37  # atlas page id (albedo_map), -1 untextured
_A_COLS = 40    # padded

# packed light-tree node table rows (from scene/types.py::LightTreeArrays;
# L_T is (_P_COLS, N_nodes)).  Each node's row carries BOTH children's
# importance attributes so one lookup serves a whole descent level — the
# descent is lookup-bound, not math-bound (PERF.md).  Importance-attribute
# order within a 14-row block: box_lo(3), box_hi(3), axis(3), cos_o,
# sin_o, cos_e, sin_e, energy.
_P_LIMP = 0     # 0:14  left child importance attributes
_P_RIMP = 14    # 14:28 right child importance attributes
_P_LID = 28     # left child id (-1 leaf)
_P_RID = 29     # right child id
_P_TRI = 30     # global triangle id at leaves (-1 inner)
_P_PAR = 31     # parent id (-1 root)
# PMF-replay block: the PARENT's children importance attributes + which
# side this node is, so the bottom-up replay is also ONE lookup per level
_P_PLIMP = 32   # 32:46
_P_PRIMP = 46   # 46:60
_P_ISL = 60     # 1.0 if this node is its parent's left child
_P_COLS = 64

_DESC_ROWS = list(range(30))  # one descent level: both imps + child ids
_PMF_ROWS = list(range(_P_PLIMP, _P_PLIMP + 28)) + [_P_ISL, _P_PAR]

# ---- bf16-exact residual rows -------------------------------------------
# The MXU's default f32 matmul rounds both operands to bf16, which mangles
# every fetched VALUE-AS-ID >= 256 (light-tree leaf triangle ids — the
# room's ~7500 never matched the shadow identity check -> black image) and
# quantizes fetched light geometry (~8e-3 at room scale; the lights sit
# 1e-4 below the ceiling).  Rather than fetching at Precision.HIGHEST
# (6 MXU passes — it cost 2.2x on the round-2 flagship bench), id- and
# geometry-valued table rows are stored as a bf16-ROUNDED main row plus a
# bf16-rounded RESIDUAL row appended past the original table height; a
# fetch reads both in the SAME one-hot matmul (the extra rows are free:
# the output height stays under the 128-wide MXU tile) and sums them.
# main + residual == f32 value exactly for ids < 2^16 and to ~4e-6
# relative for geometry — and both rows pass through the MXU's operand
# rounding unchanged because they are already bf16 values.
_A_EXACT = list(range(_A_P0, _A_NS + 3))       # P0,E1,E2,AREA,LEAF,NS
_A_LO = {r: _A_COLS + i for i, r in enumerate(_A_EXACT)}
_A_ROWS_TOT = _A_COLS + len(_A_EXACT) + (-(_A_COLS + len(_A_EXACT))) % 8

_P_EXACT = [_P_LID, _P_RID, _P_TRI, _P_PAR]    # node/triangle links
_P_LO = {r: _P_COLS + i for i, r in enumerate(_P_EXACT)}
_P_ROWS_TOT = _P_COLS + len(_P_EXACT) + (-(_P_COLS + len(_P_EXACT))) % 8


def append_residual_rows(tbl, exact_cols, rows_tot):
    """Split ``tbl[:, exact_cols]`` into bf16-exact (main, residual) pairs.

    ``tbl`` is (N, k) with attributes in columns.  Returns (N, rows_tot):
    the exact columns replaced by their bf16 rounding and the bf16-rounded
    residuals appended at ``k + i`` (the ``*_LO`` map layout), zero-padded
    to ``rows_tot``."""
    hi = tbl[:, exact_cols].astype(jnp.bfloat16).astype(jnp.float32)
    lo = (tbl[:, exact_cols] - hi).astype(jnp.bfloat16).astype(jnp.float32)
    tbl = tbl.at[:, exact_cols].set(hi)
    k = tbl.shape[1]
    out = jnp.zeros((tbl.shape[0], rows_tot), jnp.float32)
    out = out.at[:, :k].set(tbl)
    return out.at[:, k:k + len(exact_cols)].set(lo)

_SURF_ROWS = list(range(_A_ALBEDO, _A_ALBEDO + 3)) \
    + list(range(_A_EMISSION, _A_EMISSION + 3)) + [_A_ROUGH, _A_METAL] \
    + list(range(_A_N0, _A_N0 + 9)) + [_A_AREA, _A_LEAF]

# textured variant adds the interpolated-UV inputs + page id (26 <= _NR_MAX)
_SURF_TEX_ROWS = _SURF_ROWS + list(range(_A_UV0, _A_UV0 + 6)) + [_A_TEXPAGE]

_LIGHT_ROWS = list(range(_A_P0, _A_P0 + 3)) + list(range(_A_E1, _A_E1 + 3)) \
    + list(range(_A_E2, _A_E2 + 3)) + list(range(_A_NS, _A_NS + 3)) \
    + list(range(_A_EMISSION, _A_EMISSION + 3)) + [_A_AREA]


def build_attr_matrix(scene: Scene, tri_tile: int = TRI_TILE):
    """Baldwin–Weber plane coefficients + dense attribute table.

    Returns ``(wn, wu, wv, A)`` with wn/wu/wv of shape (T, 4) (rows =
    triangles, columns = plane coefficients) and A of shape (T, _A_COLS),
    T padded to ``tri_tile``.  Semantics of the per-triangle data follow
    the reference scene SoA (Scene.h:27-37, Triangle.cuh:36-51)."""
    g = scene.geometry
    tv = g.tri_v
    p0 = g.positions[tv[:, 0]]
    e1 = g.positions[tv[:, 1]] - p0
    e2 = g.positions[tv[:, 2]] - p0

    n = jnp.cross(e1, e2)
    denom = (n * n).sum(-1)
    valid = denom > 1e-18
    n = jnp.where(valid[:, None], n, 0.0)
    inv_denom = 1.0 / jnp.where(valid, denom, 1.0)
    u3 = jnp.cross(e2, n) * inv_denom[:, None]
    v3 = jnp.cross(n, e1) * inv_denom[:, None]
    wn = jnp.concatenate([n, -(n * p0).sum(-1, keepdims=True)], axis=-1)
    wu = jnp.concatenate([u3, -(u3 * p0).sum(-1, keepdims=True)], axis=-1)
    wv = jnp.concatenate([v3, -(v3 * p0).sum(-1, keepdims=True)], axis=-1)

    m = scene.materials
    mat = g.tri_mat
    T = tv.shape[0]
    area = 0.5 * jnp.sqrt(jnp.maximum((n * n).sum(-1), 0.0))
    lt = scene.light_tree
    n0 = g.normals[tv[:, 0]]
    n1 = g.normals[tv[:, 1]]
    n2 = g.normals[tv[:, 2]]
    A = jnp.zeros((T, _A_COLS), jnp.float32)
    A = A.at[:, _A_ALBEDO:_A_ALBEDO + 3].set(m.albedo[mat])
    A = A.at[:, _A_EMISSION:_A_EMISSION + 3].set(
        m.emission_color[mat] * m.emission_power[mat][:, None])
    A = A.at[:, _A_ROUGH].set(m.roughness[mat])
    A = A.at[:, _A_METAL].set(m.metallic[mat])
    A = A.at[:, _A_N0:_A_N0 + 3].set(n0)
    A = A.at[:, _A_N1:_A_N1 + 3].set(n1)
    A = A.at[:, _A_N2:_A_N2 + 3].set(n2)
    A = A.at[:, _A_P0:_A_P0 + 3].set(p0)
    A = A.at[:, _A_E1:_A_E1 + 3].set(e1)
    A = A.at[:, _A_E2:_A_E2 + 3].set(e2)
    A = A.at[:, _A_AREA].set(area)
    A = A.at[:, _A_LEAF].set(lt.leaf_of_tri.astype(jnp.float32))
    A = A.at[:, _A_NS:_A_NS + 3].set(n0 + n1 + n2)
    A = A.at[:, _A_UV0:_A_UV0 + 2].set(g.uvs[tv[:, 0]])
    A = A.at[:, _A_UV1:_A_UV1 + 2].set(g.uvs[tv[:, 1]])
    A = A.at[:, _A_UV2:_A_UV2 + 2].set(g.uvs[tv[:, 2]])
    A = A.at[:, _A_TEXPAGE].set(m.albedo_map[mat].astype(jnp.float32))

    pad_t = (-T) % tri_tile
    if pad_t:
        wn = jnp.pad(wn, ((0, pad_t), (0, 0)))
        wu = jnp.pad(wu, ((0, pad_t), (0, 0)))
        wv = jnp.pad(wv, ((0, pad_t), (0, 0)))
        A = jnp.pad(A, ((0, pad_t), (0, 0)), constant_values=0.0)
        A = A.at[T:, _A_LEAF].set(-1.0)
        A = A.at[T:, _A_TEXPAGE].set(-1.0)
    return wn, wu, wv, append_residual_rows(A, _A_EXACT, _A_ROWS_TOT)


def prepare_scene_tables(scene: Scene):
    """Flatten the scene into the megakernel's tables (host/jit).

    Returns ``(P, A_T)``: P (T, 16) plane coefficients
    [wn(4) | wu(4) | wv(4) | pad], A_T (_A_ROWS_TOT, T) transposed
    attribute table for ``A_T @ onehot`` lane-layout lookups (rows past
    _A_COLS are the bf16 residuals of the ``_A_EXACT`` rows)."""
    wn, wu, wv, A = build_attr_matrix(scene, TRI_TILE)
    T = A.shape[0]
    P = jnp.concatenate([wn, wu, wv, jnp.zeros((T, 4), jnp.float32)], axis=1)
    return P, A.T


def morton_permuted_scene(scene: Scene):
    """Reorder triangles along the Z-order curve of their centroids so
    ``TRI_TILE``-sized intersection tiles are spatially compact (the
    precondition for per-tile AABB culling).  Returns ``(scene', perm)``
    with every triangle-id-valued field remapped: the permuted scene is
    self-consistent, so all megakernel tables can be built from it
    directly.  Triangle ids the kernels emit live in the permuted space
    and never escape the renderer (outputs are HDR images)."""
    import dataclasses

    g = scene.geometry
    tv = np.asarray(g.tri_v)
    if tv.shape[0] == 0:
        return scene, np.zeros((0,), np.int64)
    pos = np.asarray(g.positions)
    cent = (pos[tv[:, 0]] + pos[tv[:, 1]] + pos[tv[:, 2]]) / 3.0
    from fypraytracer_tpu.accel.morton import morton3d
    code = morton3d(cent, lo=cent.min(axis=0), hi=cent.max(axis=0) + 1e-6)
    perm = np.argsort(code, kind="stable")
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.shape[0])

    lt = scene.light_tree
    lt_tri = np.asarray(lt.tri)
    new_lt = dataclasses.replace(
        lt,
        tri=np.where(lt_tri >= 0, inv[np.maximum(lt_tri, 0)],
                     -1).astype(np.int32),
        leaf_of_tri=np.asarray(lt.leaf_of_tri)[perm])
    new_g = dataclasses.replace(
        g, tri_v=tv[perm], tri_mat=np.asarray(g.tri_mat)[perm])
    # keep the BVH consistent too (prim_idx holds triangle ids): the
    # megakernels never walk it, but the permuted scene is stored on the
    # renderer objects and must stay self-consistent for any BVH-based
    # consumer (e.g. a wavefront fallback)
    pidx = np.asarray(scene.bvh.prim_idx)
    new_bvh = dataclasses.replace(
        scene.bvh,
        prim_idx=np.where(pidx >= 0, inv[np.maximum(pidx, 0)],
                          -1).astype(np.int32))
    new_scene = dataclasses.replace(
        scene, geometry=new_g, light_tree=new_lt, bvh=new_bvh,
        emissive_tris=inv[np.asarray(scene.emissive_tris)].astype(np.int32))
    return new_scene, perm


def prepare_tile_aabbs(scene: Scene, tri_tile: int = TRI_TILE):
    """Per-intersection-tile AABBs for the in-kernel slab cull.

    Returns (n_tiles, 8) f32 rows [lo(3) | hi(3) | valid | pad]; tiles
    holding only padding triangles get valid = 0.  Meaningful only on a
    Morton-permuted scene (tiles must be spatially compact)."""
    g = scene.geometry
    tv = np.asarray(g.tri_v)
    pos = np.asarray(g.positions)
    T = tv.shape[0]
    n_tiles = (T + tri_tile - 1) // tri_tile
    out = np.zeros((max(n_tiles, 1), 8), np.float32)
    tri_lo = np.minimum(np.minimum(pos[tv[:, 0]], pos[tv[:, 1]]),
                        pos[tv[:, 2]])
    tri_hi = np.maximum(np.maximum(pos[tv[:, 0]], pos[tv[:, 1]]),
                        pos[tv[:, 2]])
    for k in range(n_tiles):
        sl = slice(k * tri_tile, min((k + 1) * tri_tile, T))
        out[k, 0:3] = tri_lo[sl].min(axis=0)
        out[k, 3:6] = tri_hi[sl].max(axis=0)
        out[k, 6] = 1.0
    return jnp.asarray(out)


def prepare_light_table(scene: Scene, n_pad: int = 128):
    """Light-tree nodes as one dense packed (_P_COLS, N) table (node id
    in the lane dim): each node row holds BOTH children's importance
    attributes (cos/sin of the cone angles precomputed) + child/tri/
    parent links, so a descent level is ONE one-hot lookup."""
    lt = scene.light_tree
    n = lt.energy.shape[0]
    NP = max(((max(n, 1) + n_pad - 1) // n_pad) * n_pad, n_pad)

    def imp_block(ids):
        return jnp.concatenate([
            lt.box_lo[ids], lt.box_hi[ids], lt.axis[ids],
            jnp.cos(lt.theta_o[ids])[:, None],
            jnp.sin(lt.theta_o[ids])[:, None],
            jnp.cos(lt.theta_e[ids])[:, None],
            jnp.sin(lt.theta_e[ids])[:, None],
            lt.energy[ids][:, None]], axis=1)

    li = jnp.maximum(lt.left, 0)
    ri = jnp.maximum(lt.right, 0)
    par = jnp.maximum(lt.parent, 0)
    me = jnp.arange(n, dtype=lt.left.dtype)
    L = jnp.zeros((NP, _P_COLS), jnp.float32)
    L = L.at[:n, _P_LIMP:_P_LIMP + 14].set(imp_block(li))
    L = L.at[:n, _P_RIMP:_P_RIMP + 14].set(imp_block(ri))
    L = L.at[:n, _P_LID].set(lt.left.astype(jnp.float32))
    L = L.at[:n, _P_RID].set(lt.right.astype(jnp.float32))
    L = L.at[:n, _P_TRI].set(lt.tri.astype(jnp.float32))
    L = L.at[:n, _P_PAR].set(lt.parent.astype(jnp.float32))
    L = L.at[:n, _P_PLIMP:_P_PLIMP + 14].set(imp_block(li[par]))
    L = L.at[:n, _P_PRIMP:_P_PRIMP + 14].set(imp_block(ri[par]))
    L = L.at[:n, _P_ISL].set((lt.left[par] == me).astype(jnp.float32))
    if n < NP:
        for col in (_P_LID, _P_RID, _P_TRI, _P_PAR):
            L = L.at[n:, col].set(-1.0)
    return append_residual_rows(L, _P_EXACT, _P_ROWS_TOT).T, lt.max_depth


# in-kernel texture level for primary-surface fetches; bounce-surface
# fetches use the atlas's prefiltered bounce level (TextureAtlas policy).
# 256^2 keeps the VMEM table at K x 768 KB while matching the ~1:1
# texel:pixel footprint of a 256^2 render.
KERNEL_TEX_PAGE = 256


def _tex_table(pages: np.ndarray):
    """Lay one mip level out as the kernel's fetch table: TX[c·w + x,
    k·h + y] = pages[k, y, x, c], lane dim padded to 128.  A bilinear fetch
    is then ONE ``TX @ weighted-one-hot`` MXU matmul (y-lerp in the one-hot
    weights) + a weighted lane-select reduce (x-lerp) — no per-lane
    gathers (texture policy: Renderer.cu:609-621, Texture.cu:94-139)."""
    pages = np.asarray(pages, np.float32)
    k, h, w = pages.shape[:3]
    tx = pages.transpose(3, 2, 0, 1).reshape(3 * w, k * h)
    pad_l = (-tx.shape[1]) % 128
    pad_r = (-tx.shape[0]) % 8
    if pad_l or pad_r:
        tx = np.pad(tx, ((0, pad_r), (0, pad_l)))
    return jnp.asarray(tx), (tx.shape[1], h, w)


def prepare_texture_tables(atlas, kernel_page: int = KERNEL_TEX_PAGE):
    """Build the megakernel's two texture tables.

    Returns ``(TXP, TXB, shapes)`` — primary-level and bounce-level fetch
    tables plus ``((khp, hp, wp), (khb, hb, wb))`` static dims.  The
    primary level is the atlas mip 0 box-filtered down to ``kernel_page``
    if larger (mip 0 at native resolution does not fit VMEM)."""
    from fypraytracer_tpu.scene.build import _box_downsample

    pages = np.asarray(atlas.pages, np.float32)
    k, h, w = pages.shape[:3]
    ph, pw = min(h, kernel_page), min(w, kernel_page)
    if (ph, pw) != (h, w):
        pages = np.stack([_box_downsample(p, ph, pw) for p in pages])
    bounce = atlas.bounce_pages if atlas.bounce_pages is not None else pages
    txp, dp = _tex_table(pages)
    txb, db = _tex_table(np.asarray(bounce, np.float32))
    return txp, txb, (dp, db)


# ---------------------------------------------------------------------------
# Component-wise math helpers (shape-generic over (R, C) lane blocks;
# mirror core/mathutils.py)
# ---------------------------------------------------------------------------


def _stack(parts):
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _norm3(x, y, z):
    inv = jax.lax.rsqrt(x * x + y * y + z * z + 1e-20)
    return x * inv, y * inv, z * inv


def _onb(nx, ny, nz):
    """BuildOrthonormalBasis (MathUtils.cuh:61-71)."""
    use_a = nx * nx > nz * nz
    ax = jnp.where(use_a, -ny, 0.0)
    ay = jnp.where(use_a, nx, -nz)
    az = jnp.where(use_a, 0.0, ny)
    tx, ty, tz = _norm3(ax, ay, az)
    bx = ny * tz - nz * ty
    by = nz * tx - nx * tz
    bz = nx * ty - ny * tx
    bx, by, bz = _norm3(bx, by, bz)
    return tx, ty, tz, bx, by, bz


def _to_world(nx, ny, nz, lx, ly, lz):
    tx, ty, tz, bx, by, bz = _onb(nx, ny, nz)
    wx = tx * lx + bx * ly + nx * lz
    wy = ty * lx + by * ly + ny * lz
    wz = tz * lx + bz * ly + nz * lz
    return _norm3(wx, wy, wz)


def _cosine_dir(u1, u2, nx, ny, nz):
    r = jnp.sqrt(u1)
    th = 2.0 * _PI * u2
    return _to_world(nx, ny, nz, r * jnp.cos(th), r * jnp.sin(th),
                     jnp.sqrt(jnp.maximum(0.0, 1.0 - u1)))


def _uniform_dir(u1, u2, nx, ny, nz):
    phi = 2.0 * _PI * u1
    ct = u2
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
    return _to_world(nx, ny, nz, st * jnp.cos(phi), st * jnp.sin(phi), ct)


def _ggx_sample(u1, u2, nx, ny, nz, vx, vy, vz, rough):
    """MathUtils.cuh:118-174; returns (lx, ly, lz, pdf)."""
    alpha = rough * rough
    a2 = alpha * alpha
    phi = 2.0 * _PI * u2
    ct = jnp.sqrt(jnp.clip((1.0 - u1) / jnp.maximum(1.0 + (a2 - 1.0) * u1, 1e-12), 0.0, 1.0))
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
    hx, hy, hz = _to_world(nx, ny, nz, st * jnp.cos(phi), st * jnp.sin(phi), ct)
    idoth = -(vx * hx + vy * hy + vz * hz)
    lx = -vx - 2.0 * idoth * hx
    ly = -vy - 2.0 * idoth * hy
    lz = -vz - 2.0 * idoth * hz
    ndl = nx * lx + ny * ly + nz * lz
    ndh = nx * hx + ny * hy + nz * hz
    vdh = vx * hx + vy * hy + vz * hz
    den = ndh * ndh * (a2 - 1.0) + 1.0
    d = a2 / jnp.maximum(_PI * den * den, 1e-20)
    # grazing guard bit-identical to mathutils.ggx_sample_hemisphere
    den4 = 4.0 * vdh
    valid = (ndl > 0.0) & (den4 > 1e-6) & (ndh > 0.0)
    pdf = jnp.where(valid, d * ndh / jnp.where(valid, den4, 1.0), 0.0)
    z = jnp.zeros_like(pdf)
    return (jnp.where(valid, lx, z), jnp.where(valid, ly, z),
            jnp.where(valid, lz, z), pdf)


def _ggx_pdf(nx, ny, nz, vx, vy, vz, lx, ly, lz, rough):
    hx, hy, hz = _norm3(vx + lx, vy + ly, vz + lz)
    ndh = jnp.maximum(nx * hx + ny * hy + nz * hz, 0.0)
    vdh = jnp.maximum(vx * hx + vy * hy + vz * hz, 0.0)
    alpha = rough * rough
    a2 = alpha * alpha
    den = ndh * ndh * (a2 - 1.0) + 1.0
    d = a2 / jnp.maximum(_PI * den * den, 1e-20)
    # grazing guard bit-identical to mathutils.ggx_hemisphere_pdf
    den4 = 4.0 * vdh
    valid = (ndh > 0.0) & (den4 > 1e-6)
    return jnp.where(valid, d * ndh / jnp.where(valid, den4, 1.0), 0.0)


def _spec_weight(nx, ny, nz, vx, vy, vz, alb, metal):
    """Mean-Fresnel lobe weight (MathUtils.cuh:201-218); ``alb`` is a
    3-tuple of per-channel lane blocks."""
    ndv = jnp.maximum(nx * vx + ny * vy + nz * vz, 0.0)
    s = (1.0 - ndv) ** 5
    w = 0.0
    for c in range(3):
        f0 = 0.04 * (1.0 - metal) + alb[c] * metal
        w = w + (f0 + (1.0 - f0) * s)
    w = w * (1.0 / 3.0)
    return jnp.where(metal >= 1.0, 1.0, jnp.where(metal <= 0.0, 0.0, w))


def _mixture_sample(u_sel, u1, u2, nx, ny, nz, vx, vy, vz, alb, rough, metal):
    """brdf_sample_hemisphere parity (core/mathutils.py)."""
    w_spec = _spec_weight(nx, ny, nz, vx, vy, vz, alb, metal)
    gx, gy, gz, pdf_g = _ggx_sample(u1, u2, nx, ny, nz, vx, vy, vz, rough)
    cx, cy, cz = _cosine_dir(u1, u2, nx, ny, nz)
    take = u_sel <= w_spec
    lx = jnp.where(take, gx, cx)
    ly = jnp.where(take, gy, cy)
    lz = jnp.where(take, gz, cz)
    cos_t = jnp.maximum(nx * lx + ny * ly + nz * lz, 0.0)
    pdf_d = cos_t * (1.0 / _PI)
    pdf_spec = jnp.where(take, pdf_g,
                         _ggx_pdf(nx, ny, nz, vx, vy, vz, lx, ly, lz, rough))
    pdf = w_spec * pdf_spec + (1.0 - w_spec) * pdf_d
    return lx, ly, lz, pdf


def _mixture_pdf(nx, ny, nz, vx, vy, vz, lx, ly, lz, alb, rough, metal):
    w_spec = _spec_weight(nx, ny, nz, vx, vy, vz, alb, metal)
    pdf_spec = _ggx_pdf(nx, ny, nz, vx, vy, vz, lx, ly, lz, rough)
    cos_t = jnp.maximum(nx * lx + ny * ly + nz * lz, 0.0)
    return w_spec * pdf_spec + (1.0 - w_spec) * cos_t * (1.0 / _PI)


def _cook_torrance(nx, ny, nz, vx, vy, vz, lx, ly, lz, alb, rough, metal):
    """Per-channel Cook-Torrance (MathUtils.cuh:276-317) on lane blocks."""
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
        f0 = 0.04 * (1.0 - metal) + alb[c] * metal
        fr = f0 + (1.0 - f0) * s5
        diff = (1.0 - fr) * alb[c] * (1.0 / _PI)
        out.append(jnp.where(live, diff + spec_s * fr, 0.0))
    return out



_NR_MAX = 30     # widest row fetch (len(_DESC_ROWS) > len(_SURF_ROWS))
_RS = 8          # scratch row geometry (one full sublane tile), >= frame rows


def _rot_block(block):
    return jnp.concatenate([block[1:], block[0:1]], axis=0)


def build_raygen(cam, width, height):
    """Camera-ray components from the (8, 4) [inv_proj; inv_view] block
    (core/camera.py::generate_rays semantics, top-down rows)."""
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


def _safe_inv(d):
    """Sign-preserving reciprocal for slab tests (no inf/NaN lanes)."""
    s = jnp.where(d >= 0.0, 1.0, -1.0)
    return s / jnp.maximum(jnp.abs(d), 1e-12)


def build_trace(p_ref, rayin, trout, trouti, C, TT, T, RS=_RS,
                taabb=None, trst=None, trsti=None):
    """Closest-hit builder over the Baldwin-Weber plane table ``p_ref``
    ((T, 16) rows).  VMEM-frugal: the whole (frame-row x triangle-tile)
    sweep is ONE ``fori_loop`` body, so the (TT, C) intersection
    intermediates are allocated once -- Mosaic's scoped-vmem stack does
    NOT reuse slots across unrolled trace bodies (measured: 8 unrolled
    rows demanded 80 MB against the ~16 MB budget).  Ray rows rotate
    through the ``rayin`` scratch so all slicing is static; the only
    dynamic slice is the tile-aligned triangle load.

    ``taabb``/``trst``/``trsti`` enable per-tile AABB culling: taabb is an
    SMEM (n_tiles, 8) [lo hi valid] table (prepare_tile_aabbs over a
    Morton-permuted scene), trst (8, C) f32 / trsti (8, C) i32 hold the
    per-row closest-hit state so a whole tile body can be skipped with
    ``@pl.when`` when no lane's ray enters the tile box closer than its
    current hit — this breaks the O(B·T) dense wall for mid-size scenes
    (reference hierarchical-traversal role: Renderer.cu:460-561).

    Returns ``trace(ox, oy, oz, dx, dy, dz) -> (t, hit, u, v, tri)`` on
    (R', C) blocks; tri = -1 on miss; tie-break = lowest triangle id
    (oracle scan order)."""
    n_tri_tiles = T // TT
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (TT, C), 0)
    culled = taabb is not None

    def trace_culled(ox, oy, oz, dx, dy, dz):
        ox, oy, oz, dx, dy, dz = jnp.broadcast_arrays(ox, oy, oz,
                                                      dx, dy, dz)
        rr = ox.shape[0]
        assert rr <= RS
        for ci, val in enumerate((ox, oy, oz, dx, dy, dz)):
            rayin[ci * RS:ci * RS + rr, :] = val

        def body(i, _):
            k = i % n_tri_tiles
            fresh = k == 0
            rox = rayin[0 * RS:0 * RS + 1, :]
            roy = rayin[1 * RS:1 * RS + 1, :]
            roz = rayin[2 * RS:2 * RS + 1, :]
            rdx = rayin[3 * RS:3 * RS + 1, :]
            rdy = rayin[4 * RS:4 * RS + 1, :]
            rdz = rayin[5 * RS:5 * RS + 1, :]

            @pl.when(fresh)
            def _reset():
                trst[0:3, :] = jnp.concatenate(
                    [jnp.full((1, C), _BIG, jnp.float32),
                     jnp.zeros((2, C), jnp.float32)], axis=0)
                trsti[0:1, :] = jnp.full((1, C), -1, jnp.int32)

            t_c = trst[0:1, :]
            # slab test vs the tile box (IntersectRayAABB role,
            # BVH.cuh:124-165) + ordered-entry prune vs the current hit
            ix = _safe_inv(rdx)
            iy = _safe_inv(rdy)
            iz = _safe_inv(rdz)
            x0 = (taabb[k, 0] - rox) * ix
            x1 = (taabb[k, 3] - rox) * ix
            y0 = (taabb[k, 1] - roy) * iy
            y1 = (taabb[k, 4] - roy) * iy
            z0 = (taabb[k, 2] - roz) * iz
            z1 = (taabb[k, 5] - roz) * iz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(x0, x1),
                                         jnp.minimum(y0, y1)),
                             jnp.maximum(jnp.minimum(z0, z1), 0.0))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(x0, x1),
                                         jnp.maximum(y0, y1)),
                             jnp.maximum(z0, z1))
            poss = (tf >= tn) & (tn < t_c)
            anyp = (jnp.max(poss.astype(jnp.float32)) > 0.0) \
                & (taabb[k, 6] > 0.0)

            @pl.when(anyp)
            def _tile():
                pt = p_ref[pl.ds(k * TT, TT), :]

                def pc(j):
                    return pt[:, j:j + 1]

                o_n = pc(0) * rox + pc(1) * roy + pc(2) * roz + pc(3)
                d_n = pc(0) * rdx + pc(1) * rdy + pc(2) * rdz
                o_u = pc(4) * rox + pc(5) * roy + pc(6) * roz + pc(7)
                d_u = pc(4) * rdx + pc(5) * rdy + pc(6) * rdz
                o_v = pc(8) * rox + pc(9) * roy + pc(10) * roz + pc(11)
                d_v = pc(8) * rdx + pc(9) * rdy + pc(10) * rdz

                okp = jnp.abs(d_n) > 1e-12
                t = -o_n / jnp.where(okp, d_n, 1.0)
                uu = o_u + t * d_u
                vv = o_v + t * d_v
                hit = okp & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0) \
                    & (t > 1e-4)
                t = jnp.where(hit, t, _BIG)
                t_min = jnp.min(t, axis=0, keepdims=True)
                at_min = (t == t_min) & (t_min < _BIG)
                ridx = jnp.min(jnp.where(at_min, row_iota, 2 ** 30),
                               axis=0, keepdims=True)
                first = at_min & (row_iota == ridx)
                u_k = jnp.sum(jnp.where(first, uu, 0.0), axis=0,
                              keepdims=True)
                v_k = jnp.sum(jnp.where(first, vv, 0.0), axis=0,
                              keepdims=True)

                tc = trst[0:1, :]
                uc = trst[1:2, :]
                vc = trst[2:3, :]
                tric = trsti[0:1, :]
                better = t_min < tc
                trst[0:3, :] = jnp.concatenate(
                    [jnp.where(better, t_min, tc),
                     jnp.where(better, u_k, uc),
                     jnp.where(better, v_k, vc)], axis=0)
                trsti[0:1, :] = jnp.where(better, ridx + k * TT, tric)

            @pl.when(k == n_tri_tiles - 1)
            def _append():
                trout[:] = jnp.concatenate(
                    [trout[1:RS], trst[0:1, :], trout[RS + 1:2 * RS],
                     trst[1:2, :], trout[2 * RS + 1:], trst[2:3, :]],
                    axis=0)
                trouti[:] = jnp.concatenate([trouti[1:], trsti[0:1, :]],
                                            axis=0)
                rayin[:] = jnp.concatenate(
                    [_rot_block(rayin[ci * RS:(ci + 1) * RS])
                     for ci in range(6)], axis=0)

            return 0

        jax.lax.fori_loop(0, rr * n_tri_tiles, body, 0, unroll=False)
        t = trout[RS - rr:RS, :]
        u = trout[2 * RS - rr:2 * RS, :]
        v = trout[3 * RS - rr:3 * RS, :]
        tri = trouti[RS - rr:RS, :]
        return t, t < _BIG, u, v, tri

    def trace(ox, oy, oz, dx, dy, dz):
        ox, oy, oz, dx, dy, dz = jnp.broadcast_arrays(ox, oy, oz,
                                                      dx, dy, dz)
        rr = ox.shape[0]
        assert rr <= RS, (
            f"trace called with {rr} ray rows but only {RS} scratch rows; "
            "writes would spill into the next component's block")
        for ci, val in enumerate((ox, oy, oz, dx, dy, dz)):
            rayin[ci * RS:ci * RS + rr, :] = val

        def tile_step(i, carry):
            t_c, u_c, v_c, tri_c = carry
            k = i % n_tri_tiles
            fresh = k == 0
            rox = rayin[0 * RS:0 * RS + 1, :]
            roy = rayin[1 * RS:1 * RS + 1, :]
            roz = rayin[2 * RS:2 * RS + 1, :]
            rdx = rayin[3 * RS:3 * RS + 1, :]
            rdy = rayin[4 * RS:4 * RS + 1, :]
            rdz = rayin[5 * RS:5 * RS + 1, :]
            pt = p_ref[pl.ds(k * TT, TT), :]     # (TT, 16)

            def pc(j):
                return pt[:, j:j + 1]

            o_n = pc(0) * rox + pc(1) * roy + pc(2) * roz + pc(3)
            d_n = pc(0) * rdx + pc(1) * rdy + pc(2) * rdz
            o_u = pc(4) * rox + pc(5) * roy + pc(6) * roz + pc(7)
            d_u = pc(4) * rdx + pc(5) * rdy + pc(6) * rdz
            o_v = pc(8) * rox + pc(9) * roy + pc(10) * roz + pc(11)
            d_v = pc(8) * rdx + pc(9) * rdy + pc(10) * rdz

            okp = jnp.abs(d_n) > 1e-12
            t = -o_n / jnp.where(okp, d_n, 1.0)
            uu = o_u + t * d_u
            vv = o_v + t * d_v
            hit = okp & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0) \
                & (t > 1e-4)
            t = jnp.where(hit, t, _BIG)
            t_min = jnp.min(t, axis=0, keepdims=True)        # (1, C)
            at_min = (t == t_min) & (t_min < _BIG)
            ridx = jnp.min(jnp.where(at_min, row_iota, 2 ** 30),
                           axis=0, keepdims=True)
            first = at_min & (row_iota == ridx)
            u_k = jnp.sum(jnp.where(first, uu, 0.0), axis=0,
                          keepdims=True)
            v_k = jnp.sum(jnp.where(first, vv, 0.0), axis=0,
                          keepdims=True)

            eff_t = jnp.where(fresh, _BIG, t_c)
            eff_tri = jnp.where(fresh, -1, tri_c)
            better = t_min < eff_t
            t_n = jnp.where(better, t_min, eff_t)
            u_n = jnp.where(better, u_k, jnp.where(fresh, 0.0, u_c))
            v_n = jnp.where(better, v_k, jnp.where(fresh, 0.0, v_c))
            tri_n = jnp.where(better, ridx + k * TT, eff_tri)

            @pl.when(k == n_tri_tiles - 1)
            def _append():
                trout[:] = jnp.concatenate(
                    [trout[1:RS], t_n, trout[RS + 1:2 * RS], u_n,
                     trout[2 * RS + 1:], v_n], axis=0)
                trouti[:] = jnp.concatenate([trouti[1:], tri_n], axis=0)
                rayin[:] = jnp.concatenate(
                    [_rot_block(rayin[ci * RS:(ci + 1) * RS])
                     for ci in range(6)], axis=0)

            return t_n, u_n, v_n, tri_n

        total = rr * n_tri_tiles
        U = _TRACE_UNROLL if (_TRACE_UNROLL > 1
                              and total % _TRACE_UNROLL == 0) else 1

        def body(i, carry):
            # manual partial unroll: Mosaic's scan lowering only supports
            # full-or-no unroll, so U tile-steps ride one fori iteration
            for uu in range(U):
                carry = tile_step(i * U + uu, carry)
            return carry

        z1 = jnp.zeros((1, C), jnp.float32)
        jax.lax.fori_loop(0, total // U, body,
                          (z1, z1, z1, jnp.zeros((1, C), jnp.int32)),
                          unroll=False)
        t = trout[RS - rr:RS, :]
        u = trout[2 * RS - rr:2 * RS, :]
        v = trout[3 * RS - rr:3 * RS, :]
        tri = trouti[RS - rr:RS, :]
        return t, t < _BIG, u, v, tri

    return trace_culled if culled else trace


def build_shadow_trace(p_ref, rayin, distst, occst, occout, C, TT, T,
                       RS=_RS, taabb=None):
    """Occlusion-only trace for fixed-length visibility segments.

    Returns ``visible(ox, oy, oz, dx, dy, dz, dist) -> (R', C) bool``:
    true when the segment's target surface is the first thing hit — no hit
    with t < dist−tol AND some hit with |t − dist| ≤ tol, where tol =
    max(1e-4, dist·1e-3).  Exactly the wavefront ReSTIR GI acceptance
    (|t_closest − dist| ≤ tol) in shadow form, but cheaper than a
    closest-hit trace: no argmin/uv/id bookkeeping, and with ``taabb``
    tiles are skipped when beyond the segment, off the ray, or once every
    lane is already occluded (per-lane early-out).
    Scratches: distst (RS, C) f32, occst (8, C) f32 (rows: blocked,
    reached; culled variant only), occout (RS, C) f32 rotating results.

    PERF.md #18b: the (blocked, reached) state rides ``fori_loop``
    CARRIES in the uncull variant — memory-carried loop state (scratch
    stores/loads per tile iteration) is what made the GI visibility
    traces cost ~1.9 us/tile-iteration vs ~0.1-0.3 us for the
    register-carried closest-hit loops in the very same kernels."""
    n_tri_tiles = T // TT
    culled = taabb is not None

    def visible(ox, oy, oz, dx, dy, dz, dist):
        ox, oy, oz, dx, dy, dz, dist = jnp.broadcast_arrays(
            ox, oy, oz, dx, dy, dz, dist)
        rr = ox.shape[0]
        assert rr <= RS
        for ci, val in enumerate((ox, oy, oz, dx, dy, dz)):
            rayin[ci * RS:ci * RS + rr, :] = val
        distst[0:rr, :] = dist

        def body(i, carry):
            blk_c, rch_c = carry
            k = i % n_tri_tiles
            fresh = k == 0
            rox = rayin[0 * RS:0 * RS + 1, :]
            roy = rayin[1 * RS:1 * RS + 1, :]
            roz = rayin[2 * RS:2 * RS + 1, :]
            rdx = rayin[3 * RS:3 * RS + 1, :]
            rdy = rayin[4 * RS:4 * RS + 1, :]
            rdz = rayin[5 * RS:5 * RS + 1, :]
            dr = distst[0:1, :]
            tol = jnp.maximum(1e-4, dr * 1e-3)
            lim_lo = dr - tol
            lim_hi = dr + tol
            blk_c = jnp.where(fresh, 0.0, blk_c)
            rch_c = jnp.where(fresh, 0.0, rch_c)

            def tile_scan():
                pt = p_ref[pl.ds(k * TT, TT), :]

                def pc(j):
                    return pt[:, j:j + 1]

                o_n = pc(0) * rox + pc(1) * roy + pc(2) * roz + pc(3)
                d_n = pc(0) * rdx + pc(1) * rdy + pc(2) * rdz
                o_u = pc(4) * rox + pc(5) * roy + pc(6) * roz + pc(7)
                d_u = pc(4) * rdx + pc(5) * rdy + pc(6) * rdz
                o_v = pc(8) * rox + pc(9) * roy + pc(10) * roz + pc(11)
                d_v = pc(8) * rdx + pc(9) * rdy + pc(10) * rdz
                okp = jnp.abs(d_n) > 1e-12
                t = -o_n / jnp.where(okp, d_n, 1.0)
                uu = o_u + t * d_u
                vv = o_v + t * d_v
                hit = okp & (uu >= 0.0) & (vv >= 0.0) & (uu + vv <= 1.0) \
                    & (t > 1e-4)
                blk = jnp.max(jnp.where(hit & (t < lim_lo), 1.0, 0.0),
                              axis=0, keepdims=True)
                rch = jnp.max(jnp.where(hit & (t >= lim_lo) & (t <= lim_hi),
                                        1.0, 0.0), axis=0, keepdims=True)
                return blk, rch

            if culled:
                # tile skip needs a scalar branch, so this variant keeps
                # the (blocked, reached) state in the occst scratch — the
                # pl.when region cannot feed loop carries
                @pl.when(fresh)
                def _reset():
                    occst[0:2, :] = jnp.concatenate([blk_c, rch_c], axis=0)

                blocked = occst[0:1, :]
                ix = _safe_inv(rdx)
                iy = _safe_inv(rdy)
                iz = _safe_inv(rdz)
                x0 = (taabb[k, 0] - rox) * ix
                x1 = (taabb[k, 3] - rox) * ix
                y0 = (taabb[k, 1] - roy) * iy
                y1 = (taabb[k, 4] - roy) * iy
                z0 = (taabb[k, 2] - roz) * iz
                z1 = (taabb[k, 5] - roz) * iz
                tn = jnp.maximum(jnp.maximum(jnp.minimum(x0, x1),
                                             jnp.minimum(y0, y1)),
                                 jnp.maximum(jnp.minimum(z0, z1), 0.0))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(x0, x1),
                                             jnp.maximum(y0, y1)),
                                 jnp.maximum(z0, z1))
                poss = (tf >= tn) & (tn <= lim_hi) & (blocked < 0.5)
                anyp = (jnp.max(poss.astype(jnp.float32)) > 0.0) \
                    & (taabb[k, 6] > 0.0)

                @pl.when(anyp)
                def _scan():
                    blk, rch = tile_scan()
                    occst[0:2, :] = jnp.concatenate(
                        [jnp.maximum(occst[0:1, :], blk),
                         jnp.maximum(occst[1:2, :], rch)], axis=0)

                blk_n = occst[0:1, :]
                rch_n = occst[1:2, :]
            else:
                blk, rch = tile_scan()
                blk_n = jnp.maximum(blk_c, blk)
                rch_n = jnp.maximum(rch_c, rch)

            @pl.when(k == n_tri_tiles - 1)
            def _append():
                vis = jnp.where((blk_n < 0.5) & (rch_n > 0.5), 1.0, 0.0)
                occout[:] = jnp.concatenate([occout[1:RS], vis], axis=0)
                rayin[:] = jnp.concatenate(
                    [_rot_block(rayin[ci * RS:(ci + 1) * RS])
                     for ci in range(6)], axis=0)
                distst[:] = _rot_block(distst[:])

            return blk_n, rch_n

        z1 = jnp.zeros((1, C), jnp.float32)
        jax.lax.fori_loop(0, rr * n_tri_tiles, body, (z1, z1),
                          unroll=False)
        return occout[RS - rr:RS, :] > 0.5

    return visible


def prepare_tile_boxes_lanes(scene: Scene, tri_tile: int = TRI_TILE,
                             lane_pad: int = 128):
    """Tile AABBs in lane-major layout for the SPARSE trace: (8, NT) f32
    with rows [lo.x lo.y lo.z hi.x hi.y hi.z valid pad], NT = n_tiles
    padded to a lane-tile multiple.  Same data as prepare_tile_aabbs,
    laid out so the per-tile bundle slab test is a handful of (1, NT)
    vector ops instead of n_tiles scalar iterations."""
    aabb = np.asarray(prepare_tile_aabbs(scene, tri_tile))  # (n_tiles, 8)
    n_tiles = aabb.shape[0]
    NT = max(((n_tiles + lane_pad - 1) // lane_pad) * lane_pad, lane_pad)
    out = np.zeros((8, NT), np.float32)
    out[:, :n_tiles] = aabb.T
    return jnp.asarray(out)


def _make_bundle_compactor(tbox_ref, candst, C):
    """Shared sparse-trace candidate machinery: conservative ray-bundle
    interval vs all tile AABBs -> compacted candidate tile list in
    ``candst`` + count.  See build_trace_sparse's docstring."""
    NT = tbox_ref.shape[1]
    lane_nt = jax.lax.broadcasted_iota(jnp.int32, (1, NT), 1)

    def _sane_minmax(v):
        fin = jnp.isfinite(v)
        lo = jnp.min(jnp.where(fin, v, _BIG))
        hi = jnp.max(jnp.where(fin, v, -_BIG))
        return lo, hi

    def _axis_interval(flo, fhi, o_lo, o_hi, d_lo, d_hi):
        # conservative [LB, UB] of slab-crossing t over the whole bundle
        mixed = (d_lo <= 0.0) & (d_hi >= 0.0)
        da = jnp.where(jnp.abs(d_lo) < 1e-12, 1e-12, d_lo)
        db = jnp.where(jnp.abs(d_hi) < 1e-12, 1e-12, d_hi)
        ia = 1.0 / da
        ib = 1.0 / db
        i_lo = jnp.minimum(ia, ib)
        i_hi = jnp.maximum(ia, ib)
        lbs, ubs = [], []
        for f in (flo, fhi):
            u_lo = f - o_hi
            u_hi = f - o_lo
            p1 = u_lo * i_lo
            p2 = u_lo * i_hi
            p3 = u_hi * i_lo
            p4 = u_hi * i_hi
            lbs.append(jnp.minimum(jnp.minimum(p1, p2),
                                   jnp.minimum(p3, p4)))
            ubs.append(jnp.maximum(jnp.maximum(p1, p2),
                                   jnp.maximum(p3, p4)))
        lb = jnp.minimum(lbs[0], lbs[1])
        ub = jnp.maximum(ubs[0], ubs[1])
        lb = jnp.where(mixed, -_BIG, lb)
        ub = jnp.where(mixed, _BIG, ub)
        return lb, ub

    def mask_and_compact(rox, roy, roz, rdx, rdy, rdz, seg_lim=None):
        """(1, NT) candidate mask -> candst + scalar count."""
        o_lox, o_hix = _sane_minmax(rox)
        o_loy, o_hiy = _sane_minmax(roy)
        o_loz, o_hiz = _sane_minmax(roz)
        d_lox, d_hix = _sane_minmax(rdx)
        d_loy, d_hiy = _sane_minmax(rdy)
        d_loz, d_hiz = _sane_minmax(rdz)
        lbx, ubx = _axis_interval(tbox_ref[0:1, :], tbox_ref[3:4, :],
                                  o_lox, o_hix, d_lox, d_hix)
        lby, uby = _axis_interval(tbox_ref[1:2, :], tbox_ref[4:5, :],
                                  o_loy, o_hiy, d_loy, d_hiy)
        lbz, ubz = _axis_interval(tbox_ref[2:3, :], tbox_ref[5:6, :],
                                  o_loz, o_hiz, d_loz, d_hiz)
        entry = jnp.maximum(jnp.maximum(lbx, lby), jnp.maximum(lbz, 0.0))
        exit_ = jnp.minimum(jnp.minimum(ubx, uby), ubz)
        mask = (exit_ >= entry) & (tbox_ref[6:7, :] > 0.0)
        if seg_lim is not None:
            mask = mask & (entry <= seg_lim)
        maskf = mask.astype(jnp.float32)
        # exclusive prefix sum along lanes (log-shift adds)
        inc = maskf
        sh = 1
        while sh < NT:
            inc = inc + jnp.where(lane_nt >= sh,
                                  pltpu.roll(inc, sh, axis=1), 0.0)
            sh *= 2
        slot = inc - maskf                                   # (1, NT)
        cnt = jnp.sum(maskf).astype(jnp.int32)
        # scatter tile -> slot: one-hot row reduce (exact in f32),
        # chunked over sublane blocks so the scoped (SC, NT) stays small
        # (a monolithic (NT, NT) sel at NT=896 was 3.2 MB per call site
        # and OOMed the 16 MB scoped-vmem stack on the stress scene);
        # only slot blocks below cnt are ever read -> dynamic trip
        SC = 128
        lanes_f = lane_nt.astype(jnp.float32)

        def sbody(sc, _):
            s0 = sc * SC
            s_iota = (jax.lax.broadcasted_iota(jnp.int32, (SC, NT), 0)
                      + s0).astype(jnp.float32)
            sel = (slot == s_iota) & mask                    # (SC, NT)
            cand_c = jnp.sum(jnp.where(sel, lanes_f, 0.0),
                             axis=1, keepdims=True)          # (SC, 1)
            candst[pl.ds(s0, SC), :] = cand_c
            return 0

        jax.lax.fori_loop(0, (cnt + SC - 1) // SC, sbody, 0,
                          unroll=False)
        return cnt

    return mask_and_compact


def build_trace_sparse(p_ref, tbox_ref, rayin, trout, trouti, candst,
                       C, TT, T, RS=_RS, p_hbm=None):
    """Closest-hit trace that visits ONLY the triangle tiles whose AABB
    a conservative ray-bundle interval can reach — the TPU-idiomatic
    stand-in for the reference's hierarchical TLAS/BLAS descent
    (Renderer.cu:460-561).  Per ray row:

      1. bundle interval: lane min/max of origins and directions (NaN
         lanes sanitized); axes whose direction interval spans 0 pass
         conservatively;
      2. vectorized slab test of the interval against ALL tile boxes at
         once ((1, NT) lane-major ops over ``tbox_ref``);
      3. stream compaction of the hit mask into a candidate tile list
         (log-shift prefix sum + one-hot row reduce, no MXU);
      4. the usual Baldwin-Weber tile sweep as a fori_loop with a
         DYNAMIC trip count = candidate count — skipped tiles cost
         nothing at all (vs ~0.1-0.3 us/iteration for a @pl.when skip).

    The test is conservative per ROW (512 rays): coherent rows (primary
    bundles on Morton-ordered pixels, short shadow segments) visit few
    tiles; fully incoherent rows degrade to the dense sweep plus ~2-4 us
    of mask/compaction overhead.  Correctness never depends on
    coherence.  Scratch ``candst`` is (NT, 1) f32 (tile ids as exact
    floats).  Same rayin/trout/trouti rotation contract as build_trace.

    ``p_hbm``: (win0, win1, sem0, sem1) — TWO (TT, 128) VMEM windows +
    DMA semaphores for HBM-resident plane tables (big scenes): candidate
    tiles are processed in pairs with the next tile's rows streaming into
    the other window while the current one is intersected, so VMEM holds
    only the two working tiles and scene size is bounded by HBM."""
    NT = tbox_ref.shape[1]
    n_tri_tiles = T // TT
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (TT, C), 0)
    _mask_and_compact = _make_bundle_compactor(tbox_ref, candst, C)

    def trace(ox, oy, oz, dx, dy, dz):
        ox, oy, oz, dx, dy, dz = jnp.broadcast_arrays(ox, oy, oz,
                                                      dx, dy, dz)
        rr = ox.shape[0]
        assert rr <= RS
        for ci, val in enumerate((ox, oy, oz, dx, dy, dz)):
            rayin[ci * RS:ci * RS + rr, :] = val

        def row_body(r, _):
            rox = rayin[0 * RS:0 * RS + 1, :]
            roy = rayin[1 * RS:1 * RS + 1, :]
            roz = rayin[2 * RS:2 * RS + 1, :]
            rdx = rayin[3 * RS:3 * RS + 1, :]
            rdy = rayin[4 * RS:4 * RS + 1, :]
            rdz = rayin[5 * RS:5 * RS + 1, :]
            cnt = _mask_and_compact(rox, roy, roz, rdx, rdy, rdz)

            def cand_k(j):
                """Tile id of candidate j, clamped for speculative reads
                (prefetch indices may run past cnt; results are masked)."""
                jc = jnp.clip(j, 0, NT - 1)
                k = jnp.sum(candst[pl.ds(jc, 1), :]).astype(jnp.int32)
                return jnp.clip(k, 0, n_tri_tiles - 1)

            def isect(pt_col, k, valid, carry):
                """One tile intersection; ``pt_col(jj)`` yields plane
                column jj; ``valid`` masks speculative iterations."""
                t_c, u_c, v_c, tri_c = carry
                pc = pt_col

                o_n = pc(0) * rox + pc(1) * roy + pc(2) * roz + pc(3)
                d_n = pc(0) * rdx + pc(1) * rdy + pc(2) * rdz
                o_u = pc(4) * rox + pc(5) * roy + pc(6) * roz + pc(7)
                d_u = pc(4) * rdx + pc(5) * rdy + pc(6) * rdz
                o_v = pc(8) * rox + pc(9) * roy + pc(10) * roz + pc(11)
                d_v = pc(8) * rdx + pc(9) * rdy + pc(10) * rdz
                okp = jnp.abs(d_n) > 1e-12
                t = -o_n / jnp.where(okp, d_n, 1.0)
                uu = o_u + t * d_u
                vv = o_v + t * d_v
                hit = okp & (uu >= 0.0) & (vv >= 0.0) \
                    & (uu + vv <= 1.0) & (t > 1e-4)
                t = jnp.where(hit, t, _BIG)
                t_min = jnp.min(t, axis=0, keepdims=True)
                at_min = (t == t_min) & (t_min < _BIG)
                ridx = jnp.min(jnp.where(at_min, row_iota, 2 ** 30),
                               axis=0, keepdims=True)
                first = at_min & (row_iota == ridx)
                u_k = jnp.sum(jnp.where(first, uu, 0.0), axis=0,
                              keepdims=True)
                v_k = jnp.sum(jnp.where(first, vv, 0.0), axis=0,
                              keepdims=True)
                # candidates are emitted in ascending tile order, so the
                # strict < keeps the dense sweep's cross-tile tie-break
                # (earliest tile wins) bit-identically
                better = (t_min < t_c) & valid
                return (jnp.where(better, t_min, t_c),
                        jnp.where(better, u_k, u_c),
                        jnp.where(better, v_k, v_c),
                        jnp.where(better, ridx + k * TT, tri_c))

            z1 = jnp.zeros((1, C), jnp.float32)
            init = (jnp.full((1, C), _BIG, jnp.float32), z1, z1,
                    jnp.full((1, C), -1, jnp.int32))

            if p_hbm is None:
                def tile_step(j, carry):
                    k = cand_k(j)
                    pt = p_ref[pl.ds(k * TT, TT), :]
                    return isect(lambda jj: pt[:, jj:jj + 1], k,
                                 jnp.bool_(True), carry)

                t_n, u_n, v_n, tri_n = jax.lax.fori_loop(
                    0, cnt, tile_step, init, unroll=False)
            else:
                # Double-buffered window prefetch: candidate j+1's (TT,
                # 128) plane rows stream into the other window while tile
                # j is intersected, hiding the HBM DMA latency behind the
                # VPU sweep (the old start();wait() per tile serialized
                # them).  Candidates are processed in PAIRS so the two
                # windows alternate with static refs; the odd tail runs a
                # masked (valid=False) iteration on stale window data.
                w0, w1, s0, s1 = p_hbm

                def start(win, sem, k):
                    pltpu.make_async_copy(
                        p_ref.at[pl.ds(k * TT, TT), :], win, sem).start()

                @pl.when(cnt > 0)
                def _():
                    start(w0, s0, cand_k(0))

                def pair_step(p, carry):
                    j0 = 2 * p
                    j1 = j0 + 1
                    k0 = cand_k(j0)
                    k1 = cand_k(j1)

                    @pl.when(j1 < cnt)
                    def _():
                        start(w1, s1, k1)

                    pltpu.make_async_copy(
                        p_ref.at[pl.ds(k0 * TT, TT), :], w0, s0).wait()
                    carry = isect(lambda jj: w0[:, jj:jj + 1], k0,
                                  jnp.bool_(True), carry)

                    @pl.when(j0 + 2 < cnt)
                    def _():
                        start(w0, s0, cand_k(j0 + 2))

                    @pl.when(j1 < cnt)
                    def _():
                        pltpu.make_async_copy(
                            p_ref.at[pl.ds(k1 * TT, TT), :], w1, s1).wait()
                    carry = isect(lambda jj: w1[:, jj:jj + 1], k1,
                                  j1 < cnt, carry)
                    return carry

                t_n, u_n, v_n, tri_n = jax.lax.fori_loop(
                    0, (cnt + 1) // 2, pair_step, init, unroll=False)

            trout[:] = jnp.concatenate(
                [trout[1:RS], t_n, trout[RS + 1:2 * RS], u_n,
                 trout[2 * RS + 1:], v_n], axis=0)
            trouti[:] = jnp.concatenate([trouti[1:], tri_n], axis=0)
            rayin[:] = jnp.concatenate(
                [_rot_block(rayin[ci * RS:(ci + 1) * RS])
                 for ci in range(6)], axis=0)
            return 0

        jax.lax.fori_loop(0, rr, row_body, 0, unroll=False)
        t = trout[RS - rr:RS, :]
        u = trout[2 * RS - rr:2 * RS, :]
        v = trout[3 * RS - rr:3 * RS, :]
        tri = trouti[RS - rr:RS, :]
        return t, t < _BIG, u, v, tri

    return trace


def build_shadow_trace_sparse(p_ref, tbox_ref, rayin, distst, occout,
                              candst, C, TT, T, RS=_RS, p_hbm=None):
    """Occlusion-only sparse trace: build_shadow_trace's acceptance
    semantics (no hit with t < dist−tol AND a hit within tol of dist,
    tol = max(1e-4, dist·1e-3)) over ONLY the candidate tiles the
    bundle's segment can reach — the compaction's ``seg_lim`` prunes
    tiles whose conservative entry lies beyond every lane's segment, so
    results are bit-identical to the dense shadow sweep.  Same rotation
    contract as build_shadow_trace; shares the candidate machinery and
    double-buffered HBM windows with build_trace_sparse."""
    n_tri_tiles = T // TT
    NT = tbox_ref.shape[1]
    mask_and_compact = _make_bundle_compactor(tbox_ref, candst, C)

    def visible(ox, oy, oz, dx, dy, dz, dist):
        ox, oy, oz, dx, dy, dz, dist = jnp.broadcast_arrays(
            ox, oy, oz, dx, dy, dz, dist)
        rr = ox.shape[0]
        assert rr <= RS
        for ci, val in enumerate((ox, oy, oz, dx, dy, dz)):
            rayin[ci * RS:ci * RS + rr, :] = val
        distst[0:rr, :] = dist

        def row_body(r, _):
            rox = rayin[0 * RS:0 * RS + 1, :]
            roy = rayin[1 * RS:1 * RS + 1, :]
            roz = rayin[2 * RS:2 * RS + 1, :]
            rdx = rayin[3 * RS:3 * RS + 1, :]
            rdy = rayin[4 * RS:4 * RS + 1, :]
            rdz = rayin[5 * RS:5 * RS + 1, :]
            dr = distst[0:1, :]
            tol = jnp.maximum(1e-4, dr * 1e-3)
            lim_lo = dr - tol
            lim_hi = dr + tol
            seg = jnp.max(jnp.where(jnp.isfinite(lim_hi), lim_hi, 0.0))
            cnt = mask_and_compact(rox, roy, roz, rdx, rdy, rdz,
                                   seg_lim=seg)

            def cand_k(j):
                jc = jnp.clip(j, 0, NT - 1)
                k = jnp.sum(candst[pl.ds(jc, 1), :]).astype(jnp.int32)
                return jnp.clip(k, 0, n_tri_tiles - 1)

            def scan(pt_col, valid, carry):
                blk_c, rch_c = carry
                pc = pt_col
                o_n = pc(0) * rox + pc(1) * roy + pc(2) * roz + pc(3)
                d_n = pc(0) * rdx + pc(1) * rdy + pc(2) * rdz
                o_u = pc(4) * rox + pc(5) * roy + pc(6) * roz + pc(7)
                d_u = pc(4) * rdx + pc(5) * rdy + pc(6) * rdz
                o_v = pc(8) * rox + pc(9) * roy + pc(10) * roz + pc(11)
                d_v = pc(8) * rdx + pc(9) * rdy + pc(10) * rdz
                okp = jnp.abs(d_n) > 1e-12
                t = -o_n / jnp.where(okp, d_n, 1.0)
                uu = o_u + t * d_u
                vv = o_v + t * d_v
                hit = okp & (uu >= 0.0) & (vv >= 0.0) \
                    & (uu + vv <= 1.0) & (t > 1e-4)
                blk = jnp.max(jnp.where(hit & (t < lim_lo) & valid,
                                        1.0, 0.0), axis=0, keepdims=True)
                rch = jnp.max(jnp.where(
                    hit & (t >= lim_lo) & (t <= lim_hi) & valid,
                    1.0, 0.0), axis=0, keepdims=True)
                return (jnp.maximum(blk_c, blk), jnp.maximum(rch_c, rch))

            z1 = jnp.zeros((1, C), jnp.float32)
            if p_hbm is None:
                def tile_step(j, carry):
                    k = cand_k(j)
                    pt = p_ref[pl.ds(k * TT, TT), :]
                    return scan(lambda jj: pt[:, jj:jj + 1],
                                jnp.bool_(True), carry)

                blk_n, rch_n = jax.lax.fori_loop(0, cnt, tile_step,
                                                 (z1, z1), unroll=False)
            else:
                w0, w1, s0, s1 = p_hbm

                def start(win, sem, k):
                    pltpu.make_async_copy(
                        p_ref.at[pl.ds(k * TT, TT), :], win, sem).start()

                @pl.when(cnt > 0)
                def _():
                    start(w0, s0, cand_k(0))

                def pair_step(p, carry):
                    j0 = 2 * p
                    j1 = j0 + 1
                    k0 = cand_k(j0)
                    k1 = cand_k(j1)

                    @pl.when(j1 < cnt)
                    def _():
                        start(w1, s1, k1)

                    pltpu.make_async_copy(
                        p_ref.at[pl.ds(k0 * TT, TT), :], w0, s0).wait()
                    carry = scan(lambda jj: w0[:, jj:jj + 1],
                                 jnp.bool_(True), carry)

                    @pl.when(j0 + 2 < cnt)
                    def _():
                        start(w0, s0, cand_k(j0 + 2))

                    @pl.when(j1 < cnt)
                    def _():
                        pltpu.make_async_copy(
                            p_ref.at[pl.ds(k1 * TT, TT), :], w1, s1).wait()
                    carry = scan(lambda jj: w1[:, jj:jj + 1],
                                 j1 < cnt, carry)
                    return carry

                blk_n, rch_n = jax.lax.fori_loop(
                    0, (cnt + 1) // 2, pair_step, (z1, z1), unroll=False)

            vis = jnp.where((blk_n < 0.5) & (rch_n > 0.5), 1.0, 0.0)
            occout[:] = jnp.concatenate([occout[1:RS], vis], axis=0)
            rayin[:] = jnp.concatenate(
                [_rot_block(rayin[ci * RS:(ci + 1) * RS])
                 for ci in range(6)], axis=0)
            distst[:] = _rot_block(distst[:])
            return 0

        jax.lax.fori_loop(0, rr, row_body, 0, unroll=False)
        return occout[RS - rr:RS, :] > 0.5

    return visible


def _lookup_chunk(n_entries: int, chunk: int = 0):
    """(n_chunks, csz) for the chunked one-hot fetch: csz is the largest
    128-multiple divisor of n_entries not exceeding the budget."""
    eff_chunk = chunk if chunk else (4096 if n_entries > 4096 else 0)
    if eff_chunk and n_entries > eff_chunk:
        assert n_entries % 128 == 0, n_entries
        m_max = max(eff_chunk // 128, 1)
        units = n_entries // 128
        m = 1
        for cand in range(1, m_max + 1):
            if units % cand == 0:
                m = cand
        csz = 128 * m
        return n_entries // csz, csz
    return 1, n_entries


def build_rows_lookup(lkin, bank, C, RS=_RS, nr_max=_NR_MAX,
                      chunk: int = 0):
    """One-hot MXU table-row fetch builder.  Returns
    ``lookup(table_ref, n_entries, idx, rows) -> {row: (R', C)}``;
    id = -1 fetches zeros.  One frame row's one-hot is live at a time
    (fori body + rotating bank -- see build_trace VMEM note).  All
    concatenation is along dim 0 (sublanes): lane-axis concat of row
    slices with differing sublane offsets does not lower in Mosaic.

    ``chunk`` > 0 accumulates the matmul over lane-tile chunks so the
    scoped one-hot stays at (chunk, C); with chunk=0, tables past 4096
    entries auto-chunk (a monolithic one-hot at T=7680 is 15.7 MB and
    overflows the 16 MB scoped-vmem budget alongside the trace
    intermediates).  Measured on v5e (probe_lookup): monolithic
    0.018 ms/fetch at T=1280, 0.50 ms at T=7680; 2048-chunks 1.35 ms."""

    def bank_append(pieces):
        segs = []
        for j in range(nr_max):
            segs.append(bank[j * RS + 1:(j + 1) * RS])
            segs.append(pieces[j] if j < len(pieces)
                        else bank[j * RS:j * RS + 1])
        bank[:] = jnp.concatenate(segs, axis=0)

    def lookup(table_ref, n_entries, idx, rows, lo_map=None, hbm=None):
        """Fetch at DEFAULT precision (one MXU pass).  The MXU rounds f32
        operands to bf16; id- and geometry-valued rows therefore carry a
        residual row (``lo_map``: main row -> residual row, built by
        ``append_residual_rows``) which this fetch sums back in — the
        residual rides the SAME one-hot matmul, so exactness is free
        (output height stays within one 128-wide MXU tile).  Fetched
        values for mapped rows are f32-exact for ids < 2^16 and ~4e-6
        relative for geometry; unmapped rows (colors, normals, importance
        weights) see plain bf16 rounding, which every probability ratio
        tolerates because both of its sides fetch the same way."""
        rr = idx.shape[0]
        lkin[0:rr, :] = idx
        k_rows = table_ref.shape[0]
        # bound the scoped one-hot: a monolithic (T, C) one-hot at T=7680
        # is 15.7 MB and overflows the 16 MB scoped-vmem budget alongside
        # the trace intermediates (measured compile OOM)
        n_chunks, csz = _lookup_chunk(n_entries, chunk)
        if hbm is not None and n_chunks == 1:
            # small table forced onto the HBM path (tests force hbm at
            # cornell size): the single "chunk" is the whole table
            assert hbm[0].shape[1] >= csz, (hbm[0].shape, csz)

        def piece(at, r):
            p = at[r:r + 1, :]
            if lo_map and r in lo_map:
                lr = lo_map[r]
                p = p + at[lr:lr + 1, :]
            return p

        def body(g, _):
            idxg = lkin[0:1, :]
            if n_chunks == 1:
                iota_t = jax.lax.broadcasted_iota(jnp.int32, (csz, C), 0)
                oh = (iota_t == idxg).astype(jnp.float32)
                if hbm is None:
                    tw = table_ref[:]
                else:
                    win, sem = hbm
                    dma = pltpu.make_async_copy(
                        table_ref.at[:, pl.ds(0, csz)],
                        win.at[:, pl.ds(0, csz)] if win.shape[1] > csz
                        else win, sem)
                    dma.start()
                    dma.wait()
                    tw = win[:, :csz]
                at = jnp.dot(tw, oh,
                             preferred_element_type=jnp.float32)
            else:
                def cbody(q, acc):
                    iota_t = jax.lax.broadcasted_iota(
                        jnp.int32, (csz, C), 0) + q * csz
                    oh = (iota_t == idxg).astype(jnp.float32)
                    if hbm is None:
                        tw = table_ref[:, pl.ds(q * csz, csz)]
                    else:
                        win, sem = hbm
                        dma = pltpu.make_async_copy(
                            table_ref.at[:, pl.ds(q * csz, csz)],
                            win, sem)
                        dma.start()
                        dma.wait()
                        tw = win[:]
                    return acc + jnp.dot(
                        tw, oh, preferred_element_type=jnp.float32)

                # visit only the chunks the row's index RANGE touches:
                # Morton-ordered rays hit Morton-ordered triangles, so a
                # row's ids cluster into 1-2 chunks; misses (id = -1)
                # are excluded from the range and fetch zeros as before
                # (an all-miss row gives q_lo > q_hi -> zero iterations)
                live = idxg >= 0
                q_lo = jnp.min(jnp.where(live, idxg,
                                         jnp.int32(2 ** 30))) // csz
                q_hi = jnp.max(jnp.where(live, idxg, -1)) // csz
                at = jax.lax.fori_loop(
                    q_lo, q_hi + 1, cbody,
                    jnp.zeros((k_rows, C), jnp.float32), unroll=False)
            bank_append([piece(at, r) for r in rows])
            lkin[:] = jnp.concatenate([lkin[1:], lkin[0:1]], axis=0)
            return 0

        jax.lax.fori_loop(0, rr, body, 0, unroll=False)
        return {r: bank[j * RS + RS - rr:(j + 1) * RS, :]
                for j, r in enumerate(rows)}

    return lookup


def build_tex_lookup(txin, txbank, C, RS=_RS):
    """Bilinear atlas fetch builder over a ``_tex_table`` layout.

    Returns ``fetch(table_ref, kh_pad, h, w, page, u, v) -> (r, g, b)`` on
    (R', C) blocks.  The y-lerp rides a WEIGHTED one-hot ((1-ay) at row
    page·h+y0, ay at row page·h+y1) so one (3w, khp) @ (khp, C) MXU matmul
    returns the y-interpolated x-row per lane; the x-lerp is a weighted
    masked sublane reduce.  page < 0 yields zeros (negative row index
    matches nothing) — callers select flat albedo on those lanes.  Same
    rotating-scratch discipline as build_rows_lookup (one row's one-hot
    live at a time)."""

    def fetch(table_ref, kh_pad, h, w, page, u, v):
        page, u, v = jnp.broadcast_arrays(page, u, v)
        rr = u.shape[0]
        txin[0 * RS:0 * RS + rr, :] = u
        txin[1 * RS:1 * RS + rr, :] = v
        txin[2 * RS:2 * RS + rr, :] = page

        def body(g, _):
            ug = txin[0:1, :]
            vg = txin[RS:RS + 1, :]
            pgi = txin[2 * RS:2 * RS + 1, :].astype(jnp.int32)
            fx = (ug % 1.0) * float(w - 1)
            fy = (vg % 1.0) * float(h - 1)
            x0f = jnp.floor(fx)
            y0f = jnp.floor(fy)
            ax = fx - x0f
            ay = fy - y0f
            x0 = x0f.astype(jnp.int32)
            y0 = y0f.astype(jnp.int32)
            x1 = jnp.minimum(x0 + 1, w - 1)
            y1 = jnp.minimum(y0 + 1, h - 1)
            r0 = pgi * h + y0
            r1 = pgi * h + y1

            iota_kh = jax.lax.broadcasted_iota(jnp.int32, (kh_pad, C), 0)
            oh = jnp.where(iota_kh == r0, 1.0 - ay, 0.0) \
                + jnp.where(iota_kh == r1, ay, 0.0)
            blk = jnp.dot(table_ref[:], oh,
                          preferred_element_type=jnp.float32)
            n_rows = blk.shape[0]     # 3w rounded up to a sublane multiple
            iota_r = jax.lax.broadcasted_iota(jnp.int32, (n_rows, C), 0)
            outs = []
            for c in range(3):
                wm = jnp.where(iota_r == c * w + x0, 1.0 - ax, 0.0) \
                    + jnp.where(iota_r == c * w + x1, ax, 0.0)
                outs.append(jnp.sum(wm * blk, axis=0, keepdims=True))
            txbank[:] = jnp.concatenate(
                [txbank[0 * RS + 1:1 * RS], outs[0],
                 txbank[1 * RS + 1:2 * RS], outs[1],
                 txbank[2 * RS + 1:3 * RS], outs[2]], axis=0)
            txin[:] = jnp.concatenate(
                [_rot_block(txin[ci * RS:(ci + 1) * RS]) for ci in range(3)],
                axis=0)
            return 0

        jax.lax.fori_loop(0, rr, body, 0, unroll=False)
        return (txbank[1 * RS - rr:1 * RS, :],
                txbank[2 * RS - rr:2 * RS, :],
                txbank[3 * RS - rr:3 * RS, :])

    return fetch


def build_surf_lookup(tri_rows, tex=None):
    """Hit-surface attributes + interpolated shading normal from a
    ``tri_rows(idx, rows)`` fetcher.

    ``tex``: optional dict(fetch, txp, txb, shapes) built from
    ``build_tex_lookup``/``prepare_texture_tables`` — when given, lanes
    whose material has an albedo map get a bilinear atlas fetch at the
    interpolated hit UV, reading the primary level (``bounce=False``) or
    the prefiltered bounce level (TextureAtlas policy; matches the
    wavefront's fetch_albedo, Renderer.cu:609-621)."""
    textured = tex is not None

    def surf_lookup(tri_idx, u, v, bounce=False):
        rw = tri_rows(tri_idx, _SURF_TEX_ROWS if textured else _SURF_ROWS)
        w = 1.0 - u - v
        nx = w * rw[_A_N0] + u * rw[_A_N1] + v * rw[_A_N2]
        ny = w * rw[_A_N0 + 1] + u * rw[_A_N1 + 1] + v * rw[_A_N2 + 1]
        nz = w * rw[_A_N0 + 2] + u * rw[_A_N1 + 2] + v * rw[_A_N2 + 2]
        nx, ny, nz = _norm3(nx, ny, nz)
        alb = (rw[_A_ALBEDO], rw[_A_ALBEDO + 1], rw[_A_ALBEDO + 2])
        if textured:
            uvx = w * rw[_A_UV0] + u * rw[_A_UV1] + v * rw[_A_UV2]
            uvy = w * rw[_A_UV0 + 1] + u * rw[_A_UV1 + 1] + v * rw[_A_UV2 + 1]
            page = rw[_A_TEXPAGE]
            ref, (kh, h, tw) = ((tex["txb"], tex["shapes"][1]) if bounce
                                else (tex["txp"], tex["shapes"][0]))
            tr, tg, tb = tex["fetch"](ref, kh, h, tw, page, uvx, uvy)
            has = page >= 0.0
            alb = (jnp.where(has, tr, alb[0]), jnp.where(has, tg, alb[1]),
                   jnp.where(has, tb, alb[2]))
        return dict(
            alb=alb,
            em=(rw[_A_EMISSION], rw[_A_EMISSION + 1], rw[_A_EMISSION + 2]),
            rough=rw[_A_ROUGH], metal=rw[_A_METAL], area=rw[_A_AREA],
            leaf=rw[_A_LEAF].astype(jnp.int32), nx=nx, ny=ny, nz=nz)

    return surf_lookup


def _node_importance(nd, px, py, pz):
    """ComputeClusterImportance in cosine space (ops/lighttree.py) from a
    14-list of node-attribute lane rows in _P_LIMP block order."""
    blo = nd[0:3]
    bhi = nd[3:6]
    cx = [(blo[c] + bhi[c]) * 0.5 for c in range(3)]
    axx, axy, axz = _norm3(cx[0] - px, cx[1] - py, cx[2] - pz)

    min_cos = None
    for i in range(8):
        corner = [blo[c] if (i >> c) & 1 == 0 else bhi[c] for c in range(3)]
        dx, dy, dz = _norm3(corner[0] - px, corner[1] - py, corner[2] - pz)
        cc = jnp.clip(axx * dx + axy * dy + axz * dz, -1.0, 1.0)
        min_cos = cc if min_cos is None else jnp.minimum(min_cos, cc)
    cos_u = min_cos
    sin_u = jnp.sqrt(jnp.maximum(1.0 - cos_u * cos_u, 0.0))

    dx, dy, dz = px - cx[0], py - cx[1], pz - cx[2]
    dist2 = jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-12)
    dx, dy, dz = _norm3(dx, dy, dz)
    cos_t = jnp.clip(nd[6] * dx + nd[7] * dy + nd[8] * dz, -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))

    cos_o = nd[9]
    sin_o = nd[10]
    cos_e = nd[11]
    sin_e = nd[12]

    cos_a = cos_o * cos_u - sin_o * sin_u
    sin_a = sin_o * cos_u + cos_o * sin_u
    cos_diff = cos_t * cos_a + sin_t * jnp.abs(sin_a)
    a_gt_pi = sin_a < 0.0
    clamp_low = a_gt_pi | (cos_t >= cos_a)
    b_ge_pi = a_gt_pi | (cos_e <= -cos_a)
    cos_b = cos_a * cos_e - sin_a * sin_e
    clamp_high = (~b_ge_pi) & (cos_t <= cos_b)
    val = jnp.where(clamp_low, 1.0, jnp.where(clamp_high, cos_e, cos_diff))
    return nd[13] * val / dist2


def make_megakernel(width: int, height: int, bounces: int, samples: int,
                    sky_color, n_frames: int, n_tris: int,
                    sampler: str = "cosine", n_light_nodes: int = 0,
                    light_depth: int = 1, frame_group: int = 1,
                    ray_lanes: int = RAY_LANES, tri_tile: int = TRI_TILE,
                    tex_shapes=None, cull: bool | None = None,
                    sparse: bool = False, hbm_tables: bool | None = None,
                    row_groups: int | None = None,
                    chunk_rows: int | None = None,
                    tiled_pixels: bool | None = None,
                    interpret: bool = False):
    """Build the jitted megakernel renderer for a fixed configuration.

    ``sampler``: 'uniform' | 'cosine' | 'ggx' | 'brdf' (hemisphere family,
    Renderer.cu:565-1284) or 'nee' (NEE+MIS with in-kernel light tree,
    Renderer.cu:1411-1626).  For 'nee', ``n_light_nodes``/``light_depth``
    size the node table and the static descent depth.  ``frame_group`` =
    frames per sublane block R (must divide ``n_frames``; 8 = full vreg).
    ``tex_shapes``: the static dims pair from ``prepare_texture_tables``
    to enable in-kernel albedo maps (None = untextured scene).
    ``cull``: per-tile AABB culling in the trace loop; requires tables
    built from a Morton-permuted scene + a ``prepare_tile_aabbs`` table.
    None = auto (on when the scene spans >= 8 intersection tiles).

    Returns ``render(cam_mats, P, AT, frame0[, L][, TXP, TXB][, TAABB])
    -> (B, 3)``: HDR summed over ``n_frames``;
    cam_mats = stack([inv_proj, inv_view]).
    """
    B = width * height
    C = ray_lanes
    TT = tri_tile
    R = frame_group
    assert B % C == 0, "pixel count must divide ray_lanes"
    assert n_frames % R == 0, "frame_group must divide n_frames"
    T = n_tris + ((-n_tris) % TT)
    sky = tuple(float(c) for c in sky_color)
    nee = sampler == "nee"
    light = sampler == "light"
    use_lt = nee or light           # techniques that read the light tree
    textured = tex_shapes is not None
    n_tri_tiles = T // TT
    if sparse:
        cull = False    # sparse supersedes the @pl.when tile cull
    elif cull is None:
        cull = n_tri_tiles >= 8
    NT = max(((n_tri_tiles + 127) // 128) * 128, 128)
    NL = max(((n_light_nodes + 127) // 128) * 128, 128)
    # big scenes: P (T,16) + AT (56,T) can exceed VMEM (43 MB at 200k
    # tris) -> keep them in HBM and DMA per-tile / per-chunk windows
    if hbm_tables is None:
        hbm_tables = T >= 32768
    if hbm_tables:
        assert sparse, "HBM-resident tables require the sparse trace"
    _, lk_csz = _lookup_chunk(T)

    # Tiled pixel->lane mapping: each C-lane row covers a BX x BY pixel
    # BLOCK (32 x C/32) instead of C/width scanlines.  Compact blocks
    # shrink the sparse trace's per-row ray-bundle footprint — measured
    # on the stress scene (benchmarks/probe_octant_sim.py): primary-row
    # candidate tiles 95 -> 43 mean, shadow segments likewise.  Pure
    # scheduling change: the TRUE pixel id (and thus RNG stream, image
    # value) is preserved; render() inverts the permutation on output.
    BX = 32
    BY = C // BX
    if tiled_pixels is None:
        tiled_pixels = sparse and width % BX == 0 and height % BY == 0
    if tiled_pixels:
        assert width % BX == 0 and height % BY == 0, (width, height, C)

    # row groups per grid step: per-grid-step cost cliffs ~6-7x once the
    # grid exceeds a few hundred steps at FIXED per-step work (PERF.md
    # #25, the 1080p inefficiency) — loop RG pixel row-groups inside each
    # step so the grid stays ~128-255 steps at any resolution.  RG=1
    # (small grids) traces the exact pre-row-group kernel.
    S = B // C
    if row_groups is None:
        RG = 1
        for d in range(2, 65):
            if S % d == 0 and S // d >= 128:
                RG = d
    else:
        RG = row_groups
    assert S % RG == 0, (S, RG)

    # Chunked dispatch: a big frame rendered as S//CH sequential
    # sub-launches of CH<=144 rows inside lax.map, all sharing ONE
    # compiled kernel via an SMEM pixel offset.  Bit-identical to the
    # monolithic launch (per-pixel accumulation is chunk-local).  The
    # benefit is NOT throughput — PERF.md #26(c) measured zero effect;
    # the large-frame slowdown is runtime sustained-rate throttling —
    # but WATCHDOG SAFETY: each pallas_call's device time stays bounded,
    # so very long launches (the stress scene's ~45 s single kernel,
    # PERF.md #24) can't trip the runtime's single-op limit.
    # Auto-chunking only engages when row_groups was not explicitly
    # requested: CH forces RG=1 (each sub-launch IS a row group), which
    # would silently discard an explicit row_groups (ADVICE r3).
    if chunk_rows is None:
        CH = 0
        if S > 144 and row_groups is None:
            for d in range(64, 145):
                if S % d == 0:
                    CH = d
    else:
        CH = chunk_rows
    if CH:
        assert S % CH == 0, (S, CH)
        if row_groups is not None and row_groups != 1:
            raise ValueError(
                f"chunk_rows={CH} forces row_groups=1 but row_groups="
                f"{row_groups} was explicitly requested — pass only one")
        RG = 1

    RS = 8           # scratch row geometry (one full sublane tile), ≥ R
    assert 1 <= R <= RS, (
        f"frame_group={R} exceeds the {RS}-row rotating scratch blocks; "
        "larger groups would silently overrun into the next component")
    NR_MAX = 30      # widest row fetch (len(_DESC_ROWS) > len(_SURF_ROWS))

    def kernel(*refs):
        refs = list(refs)
        cam_ref = refs.pop(0)
        frame_ref = refs.pop(0)
        pix0_ref = refs.pop(0) if CH else None
        p_ref = refs.pop(0)
        a_ref = refs.pop(0)
        l_ref = refs.pop(0) if use_lt else None
        txp_ref = refs.pop(0) if textured else None
        txb_ref = refs.pop(0) if textured else None
        taabb_ref = refs.pop(0) if cull else None
        tbox_ref = refs.pop(0) if sparse else None
        out_ref = refs.pop(0)
        rayin, trout, trouti, lkin, bank = refs[:5]
        refs = refs[5:]
        txin, txbank = ((refs.pop(0), refs.pop(0)) if textured
                        else (None, None))
        trst, trsti = ((refs.pop(0), refs.pop(0)) if cull
                       else (None, None))
        candst = refs.pop(0) if sparse else None
        if hbm_tables:
            ptile0 = refs.pop(0)
            ptile1 = refs.pop(0)
            atwin = refs.pop(0)
            psem0 = refs.pop(0)
            psem1 = refs.pop(0)
            asem = refs.pop(0)
            p_hbm, a_hbm = (ptile0, ptile1, psem0, psem1), (atwin, asem)
        else:
            p_hbm = a_hbm = None
        tile = pl.program_id(0)
        cam = cam_ref[:]                   # (8, 4): inv_proj rows, inv_view rows
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        raygen = build_raygen(cam, width, height)

        if sparse:
            trace = build_trace_sparse(p_ref, tbox_ref, rayin, trout,
                                       trouti, candst, C, TT, T, RS,
                                       p_hbm=p_hbm)
        else:
            trace = build_trace(p_ref, rayin, trout, trouti, C, TT, T,
                                RS, taabb=taabb_ref, trst=trst,
                                trsti=trsti)
        _rows_lookup = build_rows_lookup(lkin, bank, C, RS, NR_MAX)

        def tri_rows(tri_idx, rows):
            return _rows_lookup(a_ref, T, tri_idx, rows, lo_map=_A_LO,
                                hbm=a_hbm)

        tex = None
        if textured:
            tex = dict(fetch=build_tex_lookup(txin, txbank, C, RS),
                       txp=txp_ref, txb=txb_ref, shapes=tex_shapes)
        surf_lookup = build_surf_lookup(tri_rows, tex=tex)

        def scatter(key, surf, vx, vy, vz):
            """Draws + sampler dispatch (render/integrators.py::_scatter)."""
            nx, ny, nz = surf["nx"], surf["ny"], surf["nz"]
            rough = surf["rough"]
            if sampler == "uniform":
                key, u1 = _next_uniform(key)
                key, u2 = _next_uniform(key)
                lx, ly, lz = _uniform_dir(u1, u2, nx, ny, nz)
                pdf = jnp.full_like(lx, 1.0 / (2.0 * _PI))
            elif sampler == "cosine":
                key, u1 = _next_uniform(key)
                key, u2 = _next_uniform(key)
                lx, ly, lz = _cosine_dir(u1, u2, nx, ny, nz)
                cos_t = jnp.maximum(nx * lx + ny * ly + nz * lz, 0.0)
                pdf = cos_t * (1.0 / _PI)
            elif sampler == "ggx":
                key, u1 = _next_uniform(key)
                key, u2 = _next_uniform(key)
                lx, ly, lz, pdf = _ggx_sample(u1, u2, nx, ny, nz, vx, vy, vz,
                                              rough)
            else:  # brdf mixture (also the NEE continuation)
                key, u_sel = _next_uniform(key)
                key, u1 = _next_uniform(key)
                key, u2 = _next_uniform(key)
                lx, ly, lz, pdf = _mixture_sample(
                    u_sel, u1, u2, nx, ny, nz, vx, vy, vz,
                    surf["alb"], rough, surf["metal"])
            return key, lx, ly, lz, pdf

        # ---- light tree (NEE + light-source sampling) ----------------------
        if use_lt:

            def node_rows(idx, rows):
                """Packed light-tree node fetch; shares the lkin/bank
                scratches with tri_rows (calls are sequential)."""
                return _rows_lookup(l_ref, NL, idx, rows, lo_map=_P_LO)

            def level_probs(nd, px, py, pz, base=_P_LIMP):
                """p(go left) from ONE packed node row (both children's
                importance attributes ride the row — no child fetches)."""
                i_l = _node_importance([nd[base + j] for j in range(14)],
                                       px, py, pz)
                i_r = _node_importance([nd[base + 14 + j] for j in range(14)],
                                       px, py, pz)
                s = i_l + i_r
                p_left = jnp.where(s > 0.0, i_l / jnp.where(s > 0.0, s, 1.0),
                                   0.5)
                return jnp.clip(p_left, 1e-6, 1.0 - 1e-6)

            def pick_light(u, px, py, pz):
                """ops/lighttree.py::pick_light parity."""
                rr = u.shape[0]
                idx0 = jnp.zeros((rr, C), jnp.int32)
                pmf0 = jnp.ones((rr, C), jnp.float32)
                rand0 = jnp.clip(u, 0.0, 0.9999999)

                def level(_, st):
                    idx, pmf, rand = st
                    nd = node_rows(idx, _DESC_ROWS)
                    at_leaf = nd[_P_LID] < 0.0
                    li = jnp.maximum(nd[_P_LID], 0.0).astype(jnp.int32)
                    ri = jnp.maximum(nd[_P_RID], 0.0).astype(jnp.int32)
                    p_left = level_probs(nd, px, py, pz)
                    go_left = rand < p_left
                    new_pmf = pmf * jnp.where(go_left, p_left, 1.0 - p_left)
                    new_rand = jnp.where(go_left, rand / p_left,
                                         (rand - p_left) / (1.0 - p_left))
                    new_idx = jnp.where(go_left, li, ri)
                    idx = jnp.where(at_leaf, idx, new_idx)
                    pmf = jnp.where(at_leaf, pmf, new_pmf)
                    rand = jnp.where(at_leaf, rand,
                                     jnp.clip(new_rand, 0.0, 0.9999999))
                    return idx, pmf, rand

                idx, pmf, _ = jax.lax.fori_loop(0, light_depth, level,
                                                (idx0, pmf0, rand0))
                tri_sel = node_rows(idx, [_P_TRI])[_P_TRI].astype(jnp.int32)
                return tri_sel, pmf

            def emitter_pmf(leaf, px, py, pz):
                """ops/lighttree.py::emitter_pmf parity (bottom-up replay)."""
                in_tree = leaf >= 0
                idx0 = jnp.maximum(leaf, 0)
                pmf0 = jnp.ones_like(px) + jnp.zeros_like(
                    leaf, jnp.float32)  # (R', C) ones

                def level(_, st):
                    idx, pmf = st
                    nd = node_rows(idx, _PMF_ROWS)
                    par = nd[_P_PAR]
                    valid = par >= 0.0
                    parc = jnp.maximum(par, 0.0).astype(jnp.int32)
                    p_left = level_probs(nd, px, py, pz, base=_P_PLIMP)
                    went_left = nd[_P_ISL] > 0.5
                    step = jnp.where(went_left, p_left, 1.0 - p_left)
                    pmf = pmf * jnp.where(valid, step, 1.0)
                    idx = jnp.where(valid, parc, idx)
                    return idx, pmf

                _, pmf = jax.lax.fori_loop(0, light_depth, level, (idx0, pmf0))
                return jnp.where(in_tree, pmf, 0.0)

        # ---- row-group loop: several C-lane pixel blocks per grid step
        # (PERF.md #25: per-grid-step cost cliffs ~6-7x once the grid
        # exceeds ~128-512 steps at fixed per-step work; looping RG
        # row-groups inside the step keeps the grid short at 1080p).
        # RG == 1 inlines the body so small-grid kernels are unchanged.
        def rg_body(rg, _):
            pix = (tile * RG + rg) * C + lane      # (1, C) int32
            if CH:
                pix = pix + pix0_ref[0, 0]         # chunk pixel offset
            if tiled_pixels:
                # lane-linear index -> true pixel id of the BX x BY block
                blk = pix // C
                lx = lane % BX
                ly = lane // BX
                bw = width // BX
                pix = ((blk // bw) * BY + ly) * width + (blk % bw) * BX + lx
            ox0, oy0, oz0, dx0, dy0, dz0 = raygen(pix)
            # ---- hoisted primary hit (camera static within a dispatch) --------
            t0, hit0, u0, v0, tri0 = trace(ox0, oy0, oz0, dx0, dy0, dz0)  # (1, C)
            prim = surf_lookup(tri0, u0, v0)
            em0 = prim["em"]
            prim_emissive = hit0 & ((em0[0] * em0[0] + em0[1] * em0[1]
                                     + em0[2] * em0[2]) > 0.0)
            path_lane = hit0 & ~prim_emissive
            hx0 = ox0 + dx0 * t0
            hy0 = oy0 + dy0 * t0
            hz0 = oz0 + dz0 * t0

            sub = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
            frame_base = frame_ref[0, 0]
            pix_key = _pcg(pix.astype(jnp.uint32))

            # ---- frame-group bodies (R frames in sublanes) ---------------------
            # Every repeated region (samples, bounces) is a fori_loop — unrolled
            # copies multiply the Mosaic scoped-vmem stack (see trace docstring).
            def hemisphere_group(fi, acc):
                frames = (frame_base + fi * R + sub).astype(jnp.uint32)  # (R, 1)
                keyb = _fold(pix_key, frames)                            # (R, C)

                def sample_body(s, rad):
                    key = _fold(keyb, s.astype(jnp.uint32))
                    key = _fold(key, _u32(0))

                    active = jnp.zeros((R, C), jnp.bool_) | path_lane
                    thr = [jnp.ones((R, C), jnp.float32) for _ in range(3)]

                    key, sx, sy, sz, pdf = scatter(key, prim, -dx0, -dy0, -dz0)
                    cos_t = jnp.maximum(sx * prim["nx"] + sy * prim["ny"]
                                        + sz * prim["nz"], 0.0)
                    ok = pdf > 0.0
                    f = _cook_torrance(prim["nx"], prim["ny"], prim["nz"],
                                       -dx0, -dy0, -dz0, sx, sy, sz,
                                       prim["alb"], prim["rough"], prim["metal"])
                    scale = cos_t / jnp.where(ok, pdf, 1.0)
                    for c in range(3):
                        thr[c] = thr[c] * f[c] * scale
                    active = active & ok
                    cox, coy, coz = (jnp.zeros_like(sx) + hx0,
                                     jnp.zeros_like(sx) + hy0,
                                     jnp.zeros_like(sx) + hz0)
                    cdx, cdy, cdz = sx, sy, sz

                    def bounce_body(_b, st):
                        # the active mask rides the carry as f32 0/1 — i1
                        # vector loop carries fail Mosaic's scf.for legalization
                        (key, act_f, thr, rad, cox, coy, coz,
                         cdx, cdy, cdz) = st
                        active = act_f > 0.5
                        rad = list(rad)
                        thr = list(thr)
                        t, hit, uu, vv, tri = trace(cox, coy, coz, cdx, cdy, cdz)
                        surf = surf_lookup(tri, uu, vv, bounce=True)
                        miss = ~hit
                        for c in range(3):
                            rad[c] = rad[c] + jnp.where(active & miss,
                                                        thr[c] * sky[c], 0.0)
                        active = active & hit
                        em = surf["em"]
                        em_hit = (em[0] * em[0] + em[1] * em[1]
                                  + em[2] * em[2]) > 0.0
                        for c in range(3):
                            rad[c] = rad[c] + jnp.where(active & em_hit,
                                                        thr[c] * em[c], 0.0)
                        active = active & ~em_hit

                        key, sx, sy, sz, pdf = scatter(key, surf,
                                                       -cdx, -cdy, -cdz)
                        cos_t = jnp.maximum(sx * surf["nx"] + sy * surf["ny"]
                                            + sz * surf["nz"], 0.0)
                        ok = pdf > 0.0
                        f = _cook_torrance(surf["nx"], surf["ny"], surf["nz"],
                                           -cdx, -cdy, -cdz, sx, sy, sz,
                                           surf["alb"], surf["rough"],
                                           surf["metal"])
                        scale = cos_t / jnp.where(ok, pdf, 1.0)
                        for c in range(3):
                            thr[c] = thr[c] * f[c] * scale
                        active = active & ok
                        cox = cox + cdx * t
                        coy = coy + cdy * t
                        coz = coz + cdz * t
                        return (key, active.astype(jnp.float32), tuple(thr),
                                tuple(rad), cox, coy, coz, sx, sy, sz)

                    st = jax.lax.fori_loop(
                        0, bounces, bounce_body,
                        (key, active.astype(jnp.float32), tuple(thr), tuple(rad),
                         cox, coy, coz, cdx, cdy, cdz), unroll=False)
                    return st[3]

                rad0 = tuple(jnp.zeros((R, C), jnp.float32) for _ in range(3))
                rad = jax.lax.fori_loop(0, samples, sample_body, rad0,
                                        unroll=False)
                inv_s = 1.0 / float(samples)
                return tuple(acc[c] + jnp.sum(rad[c], axis=0, keepdims=True)
                             * inv_s for c in range(3))

            def _nee_direct(key, surf, hx, hy, hz, vx, vy, vz, thr, rad, active,
                            use_mis):
                """One NEE direct-light sample + shadow ray (Renderer.cu:
                1480-1541); returns (key, rad)."""
                nx, ny, nz = surf["nx"], surf["ny"], surf["nz"]
                key, u_pick = _next_uniform(key)
                key, lu1 = _next_uniform(key)
                key, lu2 = _next_uniform(key)
                lt_tri, pmf = pick_light(u_pick, hx, hy, hz)
                # light geometry feeds the shadow-ray identity check — the
                # _LIGHT_ROWS are all in _A_EXACT, so this fetch is f32-exact
                # (see build_rows_lookup precision note)
                lat = tri_rows(lt_tri, _LIGHT_ROWS)
                su = jnp.sqrt(lu1)
                b1 = su * (1.0 - lu2)
                b2 = su * lu2
                ptx = lat[_A_P0] + lat[_A_E1] * b1 + lat[_A_E2] * b2
                pty = lat[_A_P0 + 1] + lat[_A_E1 + 1] * b1 + lat[_A_E2 + 1] * b2
                ptz = lat[_A_P0 + 2] + lat[_A_E1 + 2] * b1 + lat[_A_E2 + 2] * b2
                lnx, lny, lnz = _norm3(lat[_A_NS], lat[_A_NS + 1],
                                       lat[_A_NS + 2])
                tlx, tly, tlz = ptx - hx, pty - hy, ptz - hz
                dist = jnp.sqrt(jnp.maximum(
                    tlx * tlx + tly * tly + tlz * tlz, 1e-20))
                ldx, ldy, ldz = tlx / dist, tly / dist, tlz / dist

                _, _, _, _, sh_tri = trace(hx + nx * 1e-12, hy + ny * 1e-12,
                                           hz + nz * 1e-12, ldx, ldy, ldz)
                visible = (sh_tri == lt_tri) & (lt_tri >= 0)

                fd = _cook_torrance(nx, ny, nz, vx, vy, vz, ldx, ldy, ldz,
                                    surf["alb"], surf["rough"], surf["metal"])
                cos_x = jnp.maximum(ldx * nx + ldy * ny + ldz * nz, 0.0)
                cos_y = jnp.maximum(-(ldx * lnx + ldy * lny + ldz * lnz), 1e-12)
                area = jnp.maximum(lat[_A_AREA], 1e-20)
                pdf_direct = pmf * (1.0 / area) * dist * dist / cos_y
                if use_mis:
                    pdf_brdf_l = _mixture_pdf(nx, ny, nz, vx, vy, vz,
                                              ldx, ldy, ldz, surf["alb"],
                                              surf["rough"], surf["metal"])
                    w_direct = pdf_direct / jnp.maximum(
                        pdf_brdf_l + pdf_direct, 1e-12)
                else:
                    w_direct = jnp.ones_like(pdf_direct)
                dscale = w_direct / jnp.maximum(pdf_direct, 1e-20) * cos_x
                lane_ok = active & visible & (pmf > 0.0)
                rad = tuple(
                    rad[c] + jnp.where(lane_ok,
                                       thr[c] * dscale * fd[c]
                                       * lat[_A_EMISSION + c], 0.0)
                    for c in range(3))
                return key, rad

            def nee_group(fi, acc):
                """radiance_nee_mis parity (render/integrators.py)."""
                frames = (frame_base + fi * R + sub).astype(jnp.uint32)
                keyb = _fold(pix_key, frames)
                single = bounces == 1
                zR = jnp.zeros((R, C), jnp.float32)
                prim_b = dict(
                    nx=zR + prim["nx"], ny=zR + prim["ny"], nz=zR + prim["nz"],
                    alb=tuple(zR + prim["alb"][c] for c in range(3)),
                    rough=zR + prim["rough"], metal=zR + prim["metal"])

                def sample_body(s, rad):
                    key = _fold(keyb, s.astype(jnp.uint32))
                    key = _fold(key, _u32(0))

                    active = jnp.zeros((R, C), jnp.bool_) | path_lane
                    thr = tuple(jnp.ones((R, C), jnp.float32) for _ in range(3))
                    hx, hy, hz = zR + hx0, zR + hy0, zR + hz0
                    cdx, cdy, cdz = zR + dx0, zR + dy0, zR + dz0

                    if single:
                        key, rad = _nee_direct(key, prim_b, hx, hy, hz,
                                               -cdx, -cdy, -cdz, thr, rad,
                                               active, use_mis=False)
                        return rad

                    def bounce_body(_b, st):
                        # f32 0/1 active mask: see hemisphere bounce_body
                        (key, act_f, thr, rad, surf, hx, hy, hz,
                         cdx, cdy, cdz) = st
                        active = act_f > 0.5
                        vx, vy, vz = -cdx, -cdy, -cdz
                        nx, ny, nz = surf["nx"], surf["ny"], surf["nz"]
                        key, rad = _nee_direct(key, surf, hx, hy, hz,
                                               vx, vy, vz, thr, rad, active,
                                               use_mis=True)

                        # ---- BRDF continuation ---------------------------------
                        key, sx, sy, sz, pdf_brdf = scatter(key, surf, vx, vy, vz)
                        fc = _cook_torrance(nx, ny, nz, vx, vy, vz, sx, sy, sz,
                                            surf["alb"], surf["rough"],
                                            surf["metal"])
                        cos_t = jnp.maximum(sx * nx + sy * ny + sz * nz, 0.0)
                        ok = pdf_brdf > 0.0
                        cscale = cos_t / jnp.maximum(pdf_brdf, 1e-12)
                        thr = tuple(thr[c] * fc[c] * cscale for c in range(3))
                        active = active & ok

                        nox = hx + nx * 1e-12
                        noy = hy + ny * 1e-12
                        noz = hz + nz * 1e-12
                        t, hit, uu, vv, tri = trace(nox, noy, noz, sx, sy, sz)
                        surf2 = surf_lookup(tri, uu, vv, bounce=True)
                        miss = ~hit
                        rad = tuple(rad[c] + jnp.where(active & miss,
                                                       thr[c] * sky[c], 0.0)
                                    for c in range(3))
                        active = active & hit

                        em = surf2["em"]
                        em_hit = (em[0] * em[0] + em[1] * em[1]
                                  + em[2] * em[2]) > 0.0
                        # MIS with light pdf at the ACTUAL hit point
                        cos_y2 = jnp.maximum(
                            -(sx * surf2["nx"] + sy * surf2["ny"]
                              + sz * surf2["nz"]), 1e-12)
                        area2 = jnp.maximum(surf2["area"], 1e-20)
                        pmf2 = emitter_pmf(surf2["leaf"], hx, hy, hz)
                        dist2 = jnp.maximum(t, 0.0)
                        pdf_direct2 = pmf2 * (1.0 / area2) * dist2 * dist2 / cos_y2
                        w_brdf = pdf_brdf / jnp.maximum(pdf_brdf + pdf_direct2,
                                                        1e-12)
                        rad = tuple(rad[c] + jnp.where(active & em_hit,
                                                       thr[c] * em[c] * w_brdf,
                                                       0.0)
                                    for c in range(3))
                        active = active & ~em_hit

                        surf = dict(nx=surf2["nx"], ny=surf2["ny"],
                                    nz=surf2["nz"], alb=surf2["alb"],
                                    rough=surf2["rough"], metal=surf2["metal"])
                        return (key, active.astype(jnp.float32), thr, rad, surf,
                                nox + sx * t, noy + sy * t, noz + sz * t,
                                sx, sy, sz)

                    st = jax.lax.fori_loop(
                        0, bounces, bounce_body,
                        (key, active.astype(jnp.float32), thr, rad, prim_b,
                         hx, hy, hz, cdx, cdy, cdz), unroll=False)
                    return st[3]

                rad0 = tuple(jnp.zeros((R, C), jnp.float32) for _ in range(3))
                rad = jax.lax.fori_loop(0, samples, sample_body, rad0,
                                        unroll=False)
                inv_s = 1.0 / float(samples)
                return tuple(acc[c] + jnp.sum(rad[c], axis=0, keepdims=True)
                             * inv_s for c in range(3))

            def light_group(fi, acc):
                """radiance_light_source parity (render/integrators.py:246-304;
                PerPixel_LightSourceSampling, Renderer.cu:1287-1408): one-bounce
                direct light only — emitter via light-tree descent, uniform
                point on the triangle, area pdf with both geometry cosines,
                visibility by shadow-trace identity check.  Shadow rays that
                escape to the sky contribute ``contrib * sky``
                (Renderer.cu:1388-1392 quirk, kept)."""
                frames = (frame_base + fi * R + sub).astype(jnp.uint32)
                keyb = _fold(pix_key, frames)
                zR = jnp.zeros((R, C), jnp.float32)
                nx, ny, nz = zR + prim["nx"], zR + prim["ny"], zR + prim["nz"]
                alb = tuple(zR + prim["alb"][c] for c in range(3))
                rough, metal = zR + prim["rough"], zR + prim["metal"]
                hx, hy, hz = zR + hx0, zR + hy0, zR + hz0
                vx, vy, vz = zR - dx0, zR - dy0, zR - dz0
                active = jnp.zeros((R, C), jnp.bool_) | path_lane

                def sample_body(s, rad):
                    key = _fold(keyb, s.astype(jnp.uint32))
                    key = _fold(key, _u32(0))
                    key, u_pick = _next_uniform(key)
                    key, lu1 = _next_uniform(key)
                    key, lu2 = _next_uniform(key)
                    lt_tri, pmf = pick_light(u_pick, hx, hy, hz)
                    lat = tri_rows(lt_tri, _LIGHT_ROWS)   # f32-exact (_A_EXACT)
                    su = jnp.sqrt(lu1)
                    b1 = su * (1.0 - lu2)
                    b2 = su * lu2
                    ptx = lat[_A_P0] + lat[_A_E1] * b1 + lat[_A_E2] * b2
                    pty = lat[_A_P0 + 1] + lat[_A_E1 + 1] * b1 \
                        + lat[_A_E2 + 1] * b2
                    ptz = lat[_A_P0 + 2] + lat[_A_E1 + 2] * b1 \
                        + lat[_A_E2 + 2] * b2
                    lnx, lny, lnz = _norm3(lat[_A_NS], lat[_A_NS + 1],
                                           lat[_A_NS + 2])
                    tlx, tly, tlz = ptx - hx, pty - hy, ptz - hz
                    dist = jnp.sqrt(jnp.maximum(
                        tlx * tlx + tly * tly + tlz * tlz, 1e-20))
                    ldx, ldy, ldz = tlx / dist, tly / dist, tlz / dist

                    _, sh_hit, _, _, sh_tri = trace(
                        hx + nx * 1e-12, hy + ny * 1e-12, hz + nz * 1e-12,
                        ldx, ldy, ldz)
                    visible = (sh_tri == lt_tri) & (lt_tri >= 0)

                    fd = _cook_torrance(nx, ny, nz, vx, vy, vz, ldx, ldy, ldz,
                                        alb, rough, metal)
                    cos_x = jnp.maximum(ldx * nx + ldy * ny + ldz * nz, 0.0)
                    cos_y = jnp.maximum(-(ldx * lnx + ldy * lny + ldz * lnz),
                                        0.0)
                    pdf = pmf * (1.0 / jnp.maximum(lat[_A_AREA], 1e-20)) \
                        * dist * dist
                    gscale = cos_x * cos_y / jnp.maximum(pdf, 1e-20)
                    lane_ok = active & visible & (pmf > 0.0)
                    sky_lane = active & ~sh_hit
                    return tuple(
                        rad[c]
                        + jnp.where(lane_ok,
                                    gscale * fd[c] * lat[_A_EMISSION + c], 0.0)
                        + jnp.where(sky_lane, gscale * fd[c] * sky[c], 0.0)
                        for c in range(3))

                rad0 = tuple(jnp.zeros((R, C), jnp.float32) for _ in range(3))
                rad = jax.lax.fori_loop(0, samples, sample_body, rad0,
                                        unroll=False)
                inv_s = 1.0 / float(samples)
                return tuple(acc[c] + jnp.sum(rad[c], axis=0, keepdims=True)
                             * inv_s for c in range(3))

            group_fn = nee_group if nee else (
                light_group if light else hemisphere_group)

            acc0 = (jnp.zeros((1, C), jnp.float32),) * 3
            accs = jax.lax.fori_loop(0, n_frames // R, group_fn, acc0)
            nf = float(n_frames)
            rows = []
            for c in range(3):
                r = jnp.where(hit0, accs[c], nf * sky[c])
                rows.append(jnp.where(prim_emissive, nf * em0[c], r))
            # the (8, C) output block keeps sublane tiling aligned (Mosaic
            # requires 8-divisible block rows); rows 3:8 are dead padding
            out_ref[pl.ds(rg * 8, 8), :] = jnp.concatenate(
                rows + [jnp.zeros((5, C), jnp.float32)], axis=0)
            return 0

        if RG == 1:
            rg_body(0, 0)
        else:
            jax.lax.fori_loop(0, RG, rg_body, 0, unroll=False)

    grid = ((CH,) if CH else (B // (C * RG),))
    full = lambda i: (0, 0)

    table_spec = (pl.BlockSpec(memory_space=pl.ANY) if hbm_tables
                  else None)
    in_specs = [
        pl.BlockSpec((8, 4), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), full, memory_space=pltpu.SMEM),
    ] + ([pl.BlockSpec((1, 1), full, memory_space=pltpu.SMEM)]
         if CH else []) + [
        table_spec or pl.BlockSpec((T, 16), full,
                                   memory_space=pltpu.VMEM),
        table_spec or pl.BlockSpec((_A_ROWS_TOT, T), full,
                                   memory_space=pltpu.VMEM),
    ]
    if use_lt:
        in_specs.append(pl.BlockSpec((_P_ROWS_TOT, NL), full,
                                     memory_space=pltpu.VMEM))
    if textured:
        (khp, hp, wp), (khb, hb, wb) = tex_shapes
        in_specs.append(pl.BlockSpec((3 * wp + (-3 * wp) % 8, khp), full,
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((3 * wb + (-3 * wb) % 8, khb), full,
                                     memory_space=pltpu.VMEM))
    if cull:
        in_specs.append(pl.BlockSpec((n_tri_tiles, 8), full,
                                     memory_space=pltpu.SMEM))
    if sparse:
        in_specs.append(pl.BlockSpec((8, NT), full,
                                     memory_space=pltpu.VMEM))

    scratch_shapes = [
        pltpu.VMEM((6 * RS, C), jnp.float32),       # rayin
        pltpu.VMEM((3 * RS, C), jnp.float32),       # trout
        pltpu.VMEM((RS, C), jnp.int32),             # trouti
        pltpu.VMEM((RS, C), jnp.int32),             # lkin
        pltpu.VMEM((NR_MAX * RS, C), jnp.float32),  # bank
    ]
    if textured:
        scratch_shapes += [
            pltpu.VMEM((3 * RS, C), jnp.float32),   # txin (u, v, page)
            pltpu.VMEM((3 * RS, C), jnp.float32),   # txbank (r, g, b)
        ]
    if cull:
        scratch_shapes += [
            pltpu.VMEM((RS, C), jnp.float32),       # trst (t, u, v)
            pltpu.VMEM((RS, C), jnp.int32),         # trsti (tri)
        ]
    if sparse:
        scratch_shapes += [
            pltpu.VMEM((NT, 1), jnp.float32),       # candst (tile ids)
        ]
    if hbm_tables:
        scratch_shapes += [
            # (TT, 128): the HBM->VMEM DMA must be lane-aligned (Mosaic
            # rejects a 16-wide lane slice of a (1,128)-tiled memref on
            # real TPU — interpret mode does not check this), so the HBM
            # plane table is padded to 128 lanes and whole rows are
            # windowed; compute still reads columns 0..15
            pltpu.VMEM((TT, 128), jnp.float32),           # ptile window 0
            pltpu.VMEM((TT, 128), jnp.float32),           # ptile window 1
            pltpu.VMEM((_A_ROWS_TOT, lk_csz), jnp.float32),  # at window
            pltpu.SemaphoreType.DMA(()),                  # psem 0
            pltpu.SemaphoreType.DMA(()),                  # psem 1
            pltpu.SemaphoreType.DMA(()),                  # asem
        ]

    @jax.jit
    def render(cam_mats, P, AT, frame0, L=None, TXP=None, TXB=None,
               TAABB=None, TBOX=None, pix0=None):
        """``pix0`` (chunked builds only): render exactly ONE CH-row slab
        starting at that pixel offset, returning (CH*C, 3) — the
        device-sharding entry point (parallel/shard.py wraps it in
        shard_map with pix0 = axis_index * slab size; the lax.map path
        below runs the same slabs sequentially on one device)."""
        if hbm_tables and P.shape[1] < 128:
            # lane-align the HBM plane table for the per-tile DMA window
            P = jnp.pad(P, ((0, 0), (0, 128 - P.shape[1])))
        args = [cam_mats, frame0, P, AT]
        if use_lt:
            Lp = L
            if Lp.shape[1] < NL:
                Lp = jnp.pad(Lp, ((0, 0), (0, NL - Lp.shape[1])))
            args.append(Lp)
        if textured:
            args.extend([TXP, TXB])
        if cull:
            args.append(TAABB)
        if sparse:
            TB = TBOX
            if TB.shape[1] < NT:
                TB = jnp.pad(TB, ((0, 0), (0, NT - TB.shape[1])))
            args.append(TB)
        # Mosaic's default scoped-VMEM budget is ~16 MB on v5e (128 MB
        # physical); FYP_MK_VMEM_MB raises it (perf experiments for the
        # large-B slowdown, PERF.md #25/#26).
        vmem_mb = int(os.environ.get("FYP_MK_VMEM_MB", "0"))
        cparams = (pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024) if vmem_mb else None)
        rows_out = CH if CH else B // C
        call = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((8 * RG, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8 * rows_out, C), jnp.float32),
            scratch_shapes=scratch_shapes,
            compiler_params=cparams,
            interpret=interpret,
        )
        if CH and pix0 is not None:
            assert not tiled_pixels, "sharded slabs use the linear map"
            out = call(args[0], args[1],
                       pix0.reshape(1, 1).astype(jnp.int32), *args[2:])
            out = out.reshape(CH, 8, C)[:, :3, :]
            return out.transpose(0, 2, 1).reshape(CH * C, 3)
        if CH:
            tail = args[2:]

            def one_chunk(c):
                pix0 = (c * (CH * C)).reshape(1, 1).astype(jnp.int32)
                return call(args[0], args[1], pix0, *tail)

            out = jax.lax.map(one_chunk, jnp.arange(S // CH))
            out = out.reshape(8 * S, C)
        else:
            out = call(*args)
        out = out.reshape(B // C, 8, C)[:, :3, :]
        out = out.transpose(0, 2, 1).reshape(B, 3)
        if tiled_pixels:
            # invert the block permutation: row i's lane l rendered true
            # pixel order[i*C+l]; scatter back to linear pixel order
            i = np.arange(B)
            blk, lane_i = i // C, i % C
            bw = width // BX
            order = (((blk // bw) * BY + lane_i // BX) * width
                     + (blk % bw) * BX + lane_i % BX)
            inv = np.argsort(order)
            out = out[jnp.asarray(inv, jnp.int32)]
        return out

    return render


def _pick_frame_group(n_frames: int) -> int:
    """Largest of 8/4/2 dividing ``n_frames`` (frames ride the sublanes;
    8 = one full vreg).  An odd budget degrades to frame_group=1 and loses
    the 8x sublane occupancy — warn so callers round their budget to a
    multiple of 8 (rendering a few extra frames is harmless: the result
    is an average)."""
    for r in (8, 4, 2):
        if n_frames % r == 0:
            return r
    if n_frames > 1:
        import warnings
        warnings.warn(
            f"n_frames={n_frames} is odd -> frame_group=1 (8x sublane "
            "occupancy lost); round the frame budget to a multiple of 8",
            stacklevel=2)
    return 1


@jax.jit
def _finish_avg(accum, n):
    """Jitted running-average (an eager divide costs a tunnel round-trip
    on the axon runtime)."""
    return accum / n


def estimate_frame_ms(num_pixels: int, ray_lanes: int, n_tris: int,
                      tri_tile: int = TRI_TILE, sweeps: float = 5.0) -> float:
    """Crude per-frame device-time model for dispatch planning: the trace
    sweeps dominate, at ~0.4 µs per (ray row × triangle tile × sweep)
    iteration.  ``sweeps`` = trace sweeps per frame — the NEE flagship
    (2 bounces, 1 spp: primary + 2 shadow + 2 bounce = 5) is the
    calibration point: cornell 256² ≈ 1 ms, room 256² ≈ 5, cornell
    1080p ≈ 32, stress 256² ≈ 190 (BASELINE.md round 3).  Callers scale
    ``sweeps`` with their technique/bounces/samples so heavy configs
    don't under-plan (the watchdog budget has ~5× headroom on top)."""
    s_rows = max(num_pixels // ray_lanes, 1)
    t_pad = n_tris + ((-n_tris) % tri_tile)
    return 0.0004 * s_rows * max(t_pad // tri_tile, 1) * max(sweeps, 1.0)


def make_dispatch_plan(camera, n_tris: int, n_frames: int,
                       sweeps: float = 5.0) -> list:
    """Shared frames-per-dispatch planner for every megakernel renderer
    class (one implementation — a missed copy of the estimator would
    leave a renderer family under-planning, ADVICE-class risk)."""
    est = estimate_frame_ms(
        camera.width * camera.height,
        _pick_ray_lanes(camera.width * camera.height), n_tris,
        sweeps=sweeps)
    return plan_dispatch_frames(n_frames, est)


def _split_sublane_chunks(n: int) -> list:
    """Decompose ``n`` into a multiple-of-8 head plus a power-of-two tail
    ([8k, 4?, 2?, 1?]) so every chunk gets its best frame_group (frames
    ride the sublanes; 8 = one full vreg).  Planning around odd budgets
    beats warning about them (VERDICT r4 weak #7): the tail kernels are
    tiny and their compiles are cache-shared."""
    out = []
    if n >= 8 and n - n % 8 > 0:
        out.append(n - n % 8)
        n %= 8
    for p in (4, 2, 1):
        if n >= p:
            out.append(p)
            n -= p
    return out


def plan_dispatch_frames(n_frames: int, est_ms_per_frame: float,
                         budget_ms: float = 8000.0) -> list:
    """Split an ``n_frames`` accumulation into dispatch-sized chunks whose
    ESTIMATED device time stays well under the runtime's single-dispatch
    watchdog (a ~45 s stress-scene dispatch crashed the TPU worker after a
    successful compile, PERF.md #24 / VERDICT r3 weak #4).  Returns chunk
    sizes summing to ``n_frames``; prefers one chunk size that divides
    ``n_frames`` (one compiled kernel) and keeps every chunk a multiple
    of 8 (full sublane occupancy) with a power-of-two tail for odd
    budgets."""
    if n_frames * est_ms_per_frame <= budget_ms:
        if n_frames % 8 and n_frames % 4 and n_frames % 2 and n_frames > 1:
            return _split_sublane_chunks(n_frames)
        return [n_frames]
    f_max = max(int(budget_ms / est_ms_per_frame), 1)
    if f_max >= 8:
        f_max -= f_max % 8
        for f in range(f_max, 7, -8):
            if n_frames % f == 0:
                return [f] * (n_frames // f)
    chunks = [f_max] * (n_frames // f_max)
    if n_frames % f_max:
        chunks.extend(_split_sublane_chunks(n_frames % f_max))
    return chunks


def scene_is_textured(scene: Scene) -> bool:
    """True when any material actually references an atlas page."""
    amap = np.asarray(scene.materials.albedo_map)
    return bool((amap >= 0).any())


def _pick_ray_lanes(num_pixels: int) -> int:
    for c in (RAY_LANES, 256, 128):
        if num_pixels % c == 0:
            return c
    raise ValueError(f"pixel count {num_pixels} not divisible by 128")


class MegakernelRenderer:
    """Drop-in fast renderer: cosine-family techniques + NEE, textured or
    untextured scenes.

    Usage::
        mk = MegakernelRenderer(scene, camera, settings)
        avg_hdr = mk.render_many(64)   # one kernel launch
    """

    SAMPLER_OF = {0: "uniform", 1: "uniform", 2: "cosine", 3: "ggx",
                  4: "brdf", 5: "light", 6: "nee"}

    def __init__(self, scene: Scene, camera, settings, interpret: bool = False):
        self.scene = scene
        self.camera = camera
        self.settings = settings
        self.frame_index = 1
        self.interpret = interpret
        # Morton-permuted triangle order: tiles become spatially compact
        # so the in-kernel per-tile AABB cull can skip most of the scene
        mscene, _ = morton_permuted_scene(scene)
        self.taabb = prepare_tile_aabbs(mscene, TRI_TILE)
        dscene = jax.tree_util.tree_map(jnp.asarray, mscene)
        self.tables = prepare_scene_tables(dscene)
        # big scenes: dense VMEM tables don't fit past ~32k tris — switch
        # to the sparse trace + HBM-resident tables (make_megakernel's
        # hbm_tables threshold) so e.g. the 200k-tri stress scene renders
        # through the product path, not just the probes (VERDICT r3 #4)
        n_tris = scene.geometry.tri_v.shape[0]
        self.sparse = n_tris + ((-n_tris) % TRI_TILE) >= 32768
        self.tbox = (prepare_tile_boxes_lanes(mscene, TRI_TILE)
                     if self.sparse else None)
        self.sampler = self.SAMPLER_OF[int(settings.technique)]
        self.light_table, self.light_depth = prepare_light_table(dscene)
        self.tex_tables = self.tex_shapes = None
        if scene_is_textured(scene):
            txp, txb, self.tex_shapes = prepare_texture_tables(scene.textures)
            self.tex_tables = (txp, txb)
        self.accum = jnp.zeros((camera.height * camera.width, 3), jnp.float32)
        self._render_cache = {}

    def _renderer(self, n_frames: int):
        key = n_frames
        if key not in self._render_cache:
            # brute force traces exactly 1 path/frame regardless of the
            # sample count (Renderer.cu:565-701)
            samples = 1 if int(self.settings.technique) == 0 else self.settings.samples
            fn = make_megakernel(
                self.camera.width, self.camera.height, self.settings.bounces,
                samples, self.settings.sky_color, n_frames,
                self.scene.geometry.tri_v.shape[0], sampler=self.sampler,
                n_light_nodes=self.light_table.shape[1],
                light_depth=self.light_depth,
                frame_group=_pick_frame_group(n_frames),
                ray_lanes=_pick_ray_lanes(
                    self.camera.width * self.camera.height),
                tex_shapes=self.tex_shapes, sparse=self.sparse,
                interpret=self.interpret)

            # ONE jitted dispatch per batch: render + accumulate.  Eager
            # jnp ops (the old `accum + summed`, the table pads inside
            # render()) each cost a tunnel round-trip on the axon runtime
            # — they dominated short-dispatch timings (burst protocol).
            def step(cam_mats, P, AT, frame0, accum, L, TXP, TXB,
                     TAABB, TBOX):
                summed = fn(cam_mats, P, AT, frame0, L=L, TXP=TXP,
                            TXB=TXB, TAABB=TAABB, TBOX=TBOX)
                return accum + summed

            self._render_cache[key] = jax.jit(step)
        return self._render_cache[key]

    def dispatch_plan(self, n_frames: int) -> list:
        """Frames-per-dispatch plan for ``render_many`` — bounded by the
        estimated per-dispatch device time so no frame budget can trip
        the runtime's single-dispatch watchdog (PERF.md #24)."""
        samples = 1 if int(self.settings.technique) == 0 \
            else self.settings.samples
        sweeps = 1 + samples * 2 * max(self.settings.bounces, 1)
        return make_dispatch_plan(self.camera,
                                  self.scene.geometry.tri_v.shape[0],
                                  n_frames, sweeps=sweeps)

    def render_many(self, n_frames: int):
        cam_mats = jnp.concatenate([
            jnp.asarray(self.camera.inv_projection),
            jnp.asarray(self.camera.inv_view)], axis=0)
        P, AT = self.tables
        txp, txb = self.tex_tables if self.tex_tables else (None, None)
        for f in self.dispatch_plan(n_frames):
            frame0 = jnp.asarray([[self.frame_index]], jnp.int32)
            self.accum = self._renderer(f)(
                cam_mats, P, AT, frame0, self.accum, self.light_table,
                txp, txb, self.taabb, self.tbox)
            self.frame_index += f
        h, w = self.camera.height, self.camera.width
        return _finish_avg(self.accum,
                           jnp.float32(self.frame_index - 1)).reshape(h, w, 3)
