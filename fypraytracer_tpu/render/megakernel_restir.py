"""Fused Pallas ReSTIR DI renderer — two in-program kernels per frame.

The wavefront ReSTIR DI frame (render/restir_di.py) spends most of its
time in per-XLA-op dispatch (PERF.md); this module runs the whole frame as
TWO pallas kernels inside one jit — stage 1 (candidates + temporal) and
stage 2 (spatial + shade) — with the frame loop in the surrounding
``fori_loop`` so N frames cost a single dispatch.  Mirrors the reference's
two-kernel split (Renderer.cu:166-224).

Layout: rays-in-lanes (render/megakernel.py v2) — per-pixel scalars are
(1, C) lane rows; the stage buffer and reservoir state are per-tile
(rows = attributes, lanes = pixels) blocks.  Spatial-neighbor windows are
assembled from TWO lane-aligned stage tiles DMA'd from HBM plus a dynamic
``pltpu.roll`` by the in-tile lane offset (validated by
benchmarks/probe_transpose.py) — no unaligned lane slicing, no per-lane
gathers.

Design deviations from the wavefront path (all documented — the wavefront
renderer remains the general one):
  * temporal reprojection (prev proj@view, Renderer.cu:1750-1765) fetches
    the prev-state window at the TILE-SHARED mean reprojection offset (two
    aligned HBM tiles + a lane roll); lanes whose exact reprojected pixel
    is not the one fetched drop history (fresh restart, unbiased).  Static
    cameras reproject to the same tile and keep full reuse; slow motion
    keeps most lanes;
  * spatial neighbor offsets are drawn PER FRAME, shared by all pixels
    (instead of per pixel).  Out-of-image neighbors are rejected per lane
    (the wavefront clamps coordinates instead); the 1/Z accounting keeps
    the estimator unbiased under both conventions;
  * the normal G-buffer skips octahedral quantization (raw normals ride
    the stage buffer).

Validated statistically against the light-sampling estimator
(tests/test_megakernel_restir.py), like the wavefront ReSTIR tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fypraytracer_tpu.core import rng as host_rng
from fypraytracer_tpu.render.megakernel import (
    _A_LO,
    _A_ROWS_TOT,
    _NR_MAX,
    _RS,
    TRI_TILE,
    _cook_torrance,
    _fold,
    _next_uniform,
    _norm3,
    _pcg,
    _pick_ray_lanes,
    _u32,
    append_residual_rows,
    build_raygen,
    build_rows_lookup,
    build_surf_lookup,
    _lookup_chunk,
    build_tex_lookup,
    build_trace,
    build_trace_sparse,
    morton_permuted_scene,
    prepare_scene_tables,
    prepare_texture_tables,
    prepare_tile_aabbs,
    prepare_tile_boxes_lanes,
    scene_is_textured,
)
from fypraytracer_tpu.scene.types import Scene

# emissive-triangle table rows (E_T is (_E_ROWS, E_pad), emissive-list
# index in the lane dim)
_E_P0 = 0      # 0:3
_E_E1 = 3      # 3:6
_E_E2 = 6      # 6:9
_E_AREA = 9
_E_N = 10      # 10:13 averaged normal
_E_EMIT = 13   # 13:16 emission
_E_CENT = 16   # 16:19 centroid
_E_TRI = 19    # global triangle id
_E_ROWS = 20

_PHAT_ROWS = [_E_CENT, _E_CENT + 1, _E_CENT + 2, _E_N, _E_N + 1, _E_N + 2,
              _E_AREA, _E_EMIT, _E_EMIT + 1, _E_EMIT + 2]
_SHADE_ROWS = [_E_P0, _E_P0 + 1, _E_P0 + 2, _E_E1, _E_E1 + 1, _E_E1 + 2,
               _E_E2, _E_E2 + 1, _E_E2 + 2, _E_N, _E_N + 1, _E_N + 2,
               _E_AREA, _E_EMIT, _E_EMIT + 1, _E_EMIT + 2, _E_TRI]

# bf16-exact residual rows (megakernel.append_residual_rows): light
# geometry feeds the shadow-ray identity check and _E_TRI is a global
# triangle id (>= 256 on real scenes — mangled by the MXU's bf16 operand
# rounding without the residual; see megakernel.py precision note)
_E_EXACT = list(range(_E_P0, _E_E2 + 3)) + [_E_AREA, _E_TRI]
_E_LO = {r: _E_ROWS + i for i, r in enumerate(_E_EXACT)}
_E_ROWS_TOT = _E_ROWS + len(_E_EXACT) + (-(_E_ROWS + len(_E_EXACT))) % 8

# stage buffer (K1 -> K2) rows; HBM layout (G * _S_ROWS, C) tile blocks
_S_POS = 0     # 0:3
_S_NRM = 3     # 3:6
_S_ALB = 6     # 6:9
_S_ROUGH = 9
_S_METAL = 10
_S_T = 11
_S_SHADE = 12  # 1.0 when the lane path-traces (hit, non-emissive)
_S_EMIT = 13   # 13:16 primary-hit emission (early-out value)
_S_HIT = 16    # 1.0 when primary hit
_S_RIDX = 17   # reservoir: emissive-list index (f32)
_S_RW = 18     # W
_S_RPDF = 19   # p̂ of selected
_S_RWSUM = 20
_S_RM = 21     # M (f32)
_S_ROWS = 24   # padded to a sublane tile multiple

# persistent state (K2 -> next K1) rows; (G * _ST_ROWS, C)
_ST_RIDX = 0
_ST_RW = 1
_ST_RPDF = 2
_ST_RWSUM = 3
_ST_RM = 4
_ST_NRM = 5   # 5:8
_ST_T = 8
_ST_ROWS = 16


def prepare_emissive_table(scene: Scene, e_pad: int = 128):
    """Dense per-emissive-triangle table (transposed: attribute rows,
    emissive-list index in lanes) for one-hot candidate lookups."""
    g = scene.geometry
    em_tris = scene.emissive_tris
    e = em_tris.shape[0]
    tv = g.tri_v[em_tris]
    p0 = g.positions[tv[:, 0]]
    p1 = g.positions[tv[:, 1]]
    p2 = g.positions[tv[:, 2]]
    n = jnp.cross(p1 - p0, p2 - p0)
    area = 0.5 * jnp.sqrt(jnp.maximum((n * n).sum(-1), 1e-20))
    navg = g.normals[tv[:, 0]] + g.normals[tv[:, 1]] + g.normals[tv[:, 2]]
    navg = navg / jnp.linalg.norm(navg, axis=-1, keepdims=True)
    mat = g.tri_mat[em_tris]
    emission = scene.materials.emission_color[mat] \
        * scene.materials.emission_power[mat][:, None]

    n_rows = max(((max(e, 1) + e_pad - 1) // e_pad) * e_pad, e_pad)
    E = jnp.zeros((n_rows, _E_ROWS), jnp.float32)
    E = E.at[:e, _E_P0:_E_P0 + 3].set(p0)
    E = E.at[:e, _E_E1:_E_E1 + 3].set(p1 - p0)
    E = E.at[:e, _E_E2:_E_E2 + 3].set(p2 - p0)
    E = E.at[:e, _E_AREA].set(area)
    E = E.at[:e, _E_N:_E_N + 3].set(navg)
    E = E.at[:e, _E_EMIT:_E_EMIT + 3].set(emission)
    E = E.at[:e, _E_CENT:_E_CENT + 3].set((p0 + p1 + p2) / 3.0)
    E = E.at[:e, _E_TRI].set(em_tris.astype(jnp.float32))
    E = E.at[e:, _E_TRI].set(-1.0)
    return append_residual_rows(E, _E_EXACT, _E_ROWS_TOT).T, int(e)


def _res_update(res, cand, weight, count, pdf, u, active):
    """Streaming RIS update (ReSTIR_DI_Reservoir.cu:22-37), masked."""
    idx, w, p, wsum, m = res
    wsum2 = wsum + jnp.where(active, weight, 0.0)
    m2 = m + jnp.where(active, count, 0.0)
    accept = active & (wsum2 > 0.0) \
        & (u < weight / jnp.where(wsum2 > 0.0, wsum2, 1.0))
    return (jnp.where(accept, cand, idx), w,
            jnp.where(accept, pdf, p), wsum2, m2)


def make_restir_di_megakernel(width: int, height: int, settings, n_tris: int,
                              n_emissive: int, e_pad: int, n_frames: int,
                              tex_shapes=None, cull: bool = False,
                              sparse: bool | None = None,
                              hbm_tables: bool | None = None,
                              interpret: bool = False):
    """Build ``render(cam, P, AT, EM, frame0, state[, TXP][, TAABB]
    [, TBOX]) -> (summed hdr (B, 3), new_state)``.

    ``tex_shapes``: primary-level dims from ``prepare_texture_tables`` —
    DI fetches albedo maps only at the primary hit (K1, mip 0); K2 reads
    the fetched albedo back from the stage buffer.
    ``cull``: per-tile AABB trace culling (Morton-permuted tables +
    ``prepare_tile_aabbs`` TAABB required).
    ``sparse``/``hbm_tables``: big-scene path — the bundle-interval
    sparse trace over HBM-resident plane/attribute tables (same design
    as megakernel.py's, auto past 32k tris), so ReSTIR DI runs on scenes
    whose tables exceed VMEM.  Requires a ``prepare_tile_boxes_lanes``
    TBOX.  NOTE: the ReSTIR pixel->lane mapping stays LINEAR (spatial
    neighbor indexing depends on it), so sparse DI doesn't get the
    tiled-pixel-row candidate tightening."""
    B = width * height
    C = _pick_ray_lanes(B)
    TT = TRI_TILE
    T = n_tris + ((-n_tris) % TT)
    G = B // C
    RS = _RS
    n_tiles = T // TT
    if sparse is None:
        sparse = T >= 32768
    if hbm_tables is None:
        hbm_tables = T >= 32768
    if hbm_tables:
        assert sparse, "HBM-resident tables require the sparse trace"
    if sparse:
        cull = False   # sparse supersedes the @pl.when tile cull
    NT = max(((n_tiles + 127) // 128) * 128, 128)
    _, lk_csz = _lookup_chunk(T)
    textured = tex_shapes is not None
    sky = tuple(float(c) for c in settings.sky_color)
    M = settings.light_candidates
    N_NBR = settings.spatial_neighbors
    radius = float(settings.spatial_radius)
    hist = float(settings.temporal_history_limit)
    use_temporal = settings.temporal_reuse
    use_spatial = settings.spatial_reuse

    def p_hat(em, px, py, pz, nx, ny, nz, vx, vy, vz, alb, rough, metal):
        """‖brdf · cosx · cosy / (dist²/area) · emission‖ at the emitter
        CENTROID (restir_di.target_pdf_centroid parity); ``em`` is a
        _PHAT_ROWS dict of (1, C) lane rows."""
        tlx = em[_E_CENT] - px
        tly = em[_E_CENT + 1] - py
        tlz = em[_E_CENT + 2] - pz
        dist2 = jnp.maximum(tlx * tlx + tly * tly + tlz * tlz, 1e-20)
        inv_d = jax.lax.rsqrt(dist2)
        lx, ly, lz = tlx * inv_d, tly * inv_d, tlz * inv_d
        f = _cook_torrance(nx, ny, nz, vx, vy, vz, lx, ly, lz,
                           alb, rough, metal)
        cos_x = jnp.maximum(lx * nx + ly * ny + lz * nz, 0.0)
        cos_y = jnp.maximum(-(lx * em[_E_N] + ly * em[_E_N + 1]
                              + lz * em[_E_N + 2]), 0.0)
        area = jnp.maximum(em[_E_AREA], 1e-20)
        scale = cos_x * cos_y * area / dist2
        acc = 0.0
        for c in range(3):
            r = f[c] * scale * em[_E_EMIT + c]
            acc = acc + r * r
        return jnp.sqrt(jnp.maximum(acc, 0.0))

    # ------------------------------------------------------------------ K1
    def k1(*refs):
        refs = list(refs)
        cam_ref, frame_ref, ppv_ref, p_ref, a_ref, e_ref = refs[:6]
        refs = refs[6:]
        txp_ref = refs.pop(0) if textured else None
        taabb_ref = refs.pop(0) if cull else None
        tbox_ref = refs.pop(0) if sparse else None
        state_full_ref, stage_ref, rayin, trout, trouti, lkin, bank = refs[:7]
        refs = refs[7:]
        txin, txbank = ((refs.pop(0), refs.pop(0)) if textured
                        else (None, None))
        trst, trsti = ((refs.pop(0), refs.pop(0)) if cull
                       else (None, None))
        candst = refs.pop(0) if sparse else None
        if hbm_tables:
            p_hbm = (refs.pop(0), refs.pop(0), refs.pop(0), refs.pop(0))
            a_hbm = (refs.pop(0), refs.pop(0))
        else:
            p_hbm = a_hbm = None
        win_t0, win_t1, t_sem = ((refs.pop(0), refs.pop(0), refs.pop(0))
                                 if use_temporal else (None, None, None))
        tile = pl.program_id(0)
        cam = cam_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        pix = tile * C + lane
        ox, oy, oz, dx, dy, dz = build_raygen(cam, width, height)(pix)

        if sparse:
            trace = build_trace_sparse(p_ref, tbox_ref, rayin, trout,
                                       trouti, candst, C, TT, T, RS,
                                       p_hbm=p_hbm)
        else:
            trace = build_trace(p_ref, rayin, trout, trouti, C, TT, T, RS,
                                taabb=taabb_ref, trst=trst, trsti=trsti)
        rows_lookup = build_rows_lookup(lkin, bank, C, RS, _NR_MAX)
        tex = None
        if textured:
            tex = dict(fetch=build_tex_lookup(txin, txbank, C, RS),
                       txp=txp_ref, txb=txp_ref,
                       shapes=(tex_shapes, tex_shapes))
        surf_lookup = build_surf_lookup(
            lambda idx, rows: rows_lookup(a_ref, T, idx, rows,
                                          lo_map=_A_LO, hbm=a_hbm), tex=tex)

        t0, hit0, u0, v0, tri0 = trace(ox, oy, oz, dx, dy, dz)
        surf = surf_lookup(tri0, u0, v0)
        em0 = surf["em"]
        prim_emissive = hit0 & ((em0[0] * em0[0] + em0[1] * em0[1]
                                 + em0[2] * em0[2]) > 0.0)
        shade = hit0 & ~prim_emissive
        px_ = ox + dx * t0
        py_ = oy + dy * t0
        pz_ = oz + dz * t0
        nx, ny, nz = surf["nx"], surf["ny"], surf["nz"]
        vx, vy, vz = -dx, -dy, -dz

        frame = frame_ref[0, 0].astype(jnp.uint32)
        key = _pcg(pix.astype(jnp.uint32))
        key = _fold(key, frame)
        key = _fold(key, _u32(0))
        key = _fold(key, _u32(7001))

        def em_lookup(cand, rows=_PHAT_ROWS):
            return rows_lookup(e_ref, e_pad, cand, rows, lo_map=_E_LO)

        def cand_p_hat(cand):
            return p_hat(em_lookup(cand), px_, py_, pz_, nx, ny, nz,
                         vx, vy, vz, surf["alb"], surf["rough"],
                         surf["metal"])

        res = (jnp.zeros((1, C), jnp.float32),) * 5  # idx, w, pdf, wsum, m
        for _ in range(M):
            key, u_sel = _next_uniform(key)
            key, u_acc = _next_uniform(key)
            cand = jnp.minimum((u_sel * n_emissive).astype(jnp.int32),
                               n_emissive - 1)
            ph = cand_p_hat(cand)
            res = _res_update(res, cand.astype(jnp.float32),
                              ph * float(n_emissive), 1.0, ph, u_acc, shade)
        idx, _, p, wsum, m = res
        w = jnp.where(p > 0.0, (wsum / jnp.maximum(m, 1.0))
                      / jnp.where(p > 0.0, p, 1.0), 0.0)
        res = (idx, w, p, wsum, m)

        if use_temporal:
            # temporal reprojection via prev proj@view (Renderer.cu:
            # 1750-1765): per-lane prev pixel; the PREV-frame state window
            # is fetched at the tile-shared (mean) offset — two aligned
            # DMA tiles + a lane roll — and lanes whose exact reprojected
            # pixel is not the fetched one reject history (fresh restart,
            # unbiased; static cameras reproject to the same tile and
            # keep full reuse)
            pv = ppv_ref[0:4, :]
            cx_ = pv[0, 0] * px_ + pv[0, 1] * py_ + pv[0, 2] * pz_ + pv[0, 3]
            cy_ = pv[1, 0] * px_ + pv[1, 1] * py_ + pv[1, 2] * pz_ + pv[1, 3]
            cw_ = pv[3, 0] * px_ + pv[3, 1] * py_ + pv[3, 2] * pz_ + pv[3, 3]
            wok = jnp.abs(cw_) >= 1e-20
            inv_w = 1.0 / jnp.where(wok, cw_, 1.0)
            u_ = jnp.where(wok, cx_ * inv_w, 0.0) * 0.5 + 0.5
            v_ = jnp.where(wok, cy_ * inv_w, 0.0) * 0.5 + 0.5
            ppx = jnp.clip((u_ * width).astype(jnp.int32), 0, width - 1)
            ppy = jnp.clip(((1.0 - v_) * height).astype(jnp.int32), 0,
                           height - 1)
            prev_pix = ppx + ppy * width

            shade_f = shade.astype(jnp.float32)
            cnt = jnp.maximum(jnp.sum(shade_f), 1.0)
            off = jnp.round(
                jnp.sum((prev_pix - pix).astype(jnp.float32) * shade_f)
                / cnt).astype(jnp.int32)
            s = tile * C + off
            sc = jnp.clip(s, 0, B - C)
            q0 = sc // C
            r_sh = sc - q0 * C
            q1 = jnp.minimum(q0 + 1, G - 1)

            def read_state(q, win):
                dma = pltpu.make_async_copy(
                    state_full_ref.at[pl.ds(q * _ST_ROWS, _ST_ROWS), :],
                    win, t_sem)
                dma.start()
                dma.wait()
                return win[:]

            b0 = pltpu.roll(read_state(q0, win_t0), (C - r_sh) % C, axis=1)
            b1 = pltpu.roll(read_state(q1, win_t1), (C - r_sh) % C, axis=1)
            st = jnp.where(lane < C - r_sh, b0, b1)
            exact = (sc + lane) == prev_pix

            pn_x = st[_ST_NRM:_ST_NRM + 1, :]
            pn_y = st[_ST_NRM + 1:_ST_NRM + 2, :]
            pn_z = st[_ST_NRM + 2:_ST_NRM + 3, :]
            p_m = st[_ST_RM:_ST_RM + 1, :]
            valid = ((pn_x * nx + pn_y * ny + pn_z * nz) >= 0.99) \
                & (p_m > 0.0) & shade & exact
            cap = hist * res[4]
            prev_m = jnp.minimum(p_m, cap)
            prev_idx = st[_ST_RIDX:_ST_RIDX + 1, :]
            prev_w = st[_ST_RW:_ST_RW + 1, :]

            tmp = (jnp.zeros((1, C), jnp.float32),) * 5
            z = jnp.zeros((1, C), jnp.float32)
            key, u1 = _next_uniform(key)
            key, u2 = _next_uniform(key)
            tmp = _res_update(tmp, res[0], res[2] * res[1] * res[4], res[4],
                              res[2], u1, valid)
            z = z + jnp.where(valid & (res[2] > 0.0), res[4], 0.0)
            p_prev = cand_p_hat(prev_idx.astype(jnp.int32))
            tmp = _res_update(tmp, prev_idx, p_prev * prev_w * prev_m,
                              prev_m, p_prev, u2, valid)
            z = z + jnp.where(valid & (p_prev > 0.0), prev_m, 0.0)
            m_inv = 1.0 / jnp.maximum(z, 1.0)
            t_idx, _, t_p, t_wsum, t_m = tmp
            t_w = jnp.where(t_p > 0.0, (m_inv * t_wsum)
                            / jnp.where(t_p > 0.0, t_p, 1.0), 0.0)
            res = tuple(jnp.where(valid, a, b) for a, b in
                        zip((t_idx, t_w, t_p, t_wsum, t_m), res))

        # row order must follow the _S_* indices (dim-0 concat only)
        stage_ref[:] = jnp.concatenate([
            px_, py_, pz_,                                   # _S_POS
            nx, ny, nz,                                      # _S_NRM
            surf["alb"][0], surf["alb"][1], surf["alb"][2],  # _S_ALB
            surf["rough"],                                   # _S_ROUGH
            surf["metal"],                                   # _S_METAL
            jnp.where(hit0, t0, -1.0),                       # _S_T
            shade.astype(jnp.float32),                       # _S_SHADE
            em0[0], em0[1], em0[2],                          # _S_EMIT
            hit0.astype(jnp.float32),                        # _S_HIT
            res[0], res[1], res[2], res[3], res[4],          # reservoir
            jnp.zeros((_S_ROWS - 22, C), jnp.float32),       # pad
        ], axis=0)

    # ------------------------------------------------------------------ K2
    def k2(*refs):
        refs = list(refs)
        cam_ref, frame_ref, offs_ref, p_ref, e_ref = refs[:5]
        refs = refs[5:]
        taabb_ref = refs.pop(0) if cull else None
        tbox_ref = refs.pop(0) if sparse else None
        (stage_full_ref, hdr_ref, state_ref, rayin, trout, trouti,
         lkin, bank, win0, win1, dma_sem) = refs[:11]
        refs = refs[11:]
        trst, trsti = ((refs.pop(0), refs.pop(0)) if cull
                       else (None, None))
        candst = refs.pop(0) if sparse else None
        p_hbm = ((refs.pop(0), refs.pop(0), refs.pop(0), refs.pop(0))
                 if hbm_tables else None)
        tile = pl.program_id(0)
        cam = cam_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        pix = tile * C + lane
        px_i = pix % width
        py_i = pix // width
        if sparse:
            trace = build_trace_sparse(p_ref, tbox_ref, rayin, trout,
                                       trouti, candst, C, TT, T, RS,
                                       p_hbm=p_hbm)
        else:
            trace = build_trace(p_ref, rayin, trout, trouti, C, TT, T, RS,
                                taabb=taabb_ref, trst=trst, trsti=trsti)
        rows_lookup = build_rows_lookup(lkin, bank, C, RS, _NR_MAX)

        def read_stage(q, win):
            """DMA one lane-aligned (_S_ROWS, C) stage tile from HBM."""
            dma = pltpu.make_async_copy(
                stage_full_ref.at[pl.ds(q * _S_ROWS, _S_ROWS), :], win,
                dma_sem)
            dma.start()
            dma.wait()
            return win[:]

        own = read_stage(tile, win0)

        def row(r):
            return own[r:r + 1, :]

        pxp, pyp, pzp = row(_S_POS), row(_S_POS + 1), row(_S_POS + 2)
        nx, ny, nz = row(_S_NRM), row(_S_NRM + 1), row(_S_NRM + 2)
        alb = (row(_S_ALB), row(_S_ALB + 1), row(_S_ALB + 2))
        rough = row(_S_ROUGH)
        metal = row(_S_METAL)
        shade = row(_S_SHADE) > 0.5
        t_own = row(_S_T)
        own_res = (row(_S_RIDX), row(_S_RW), row(_S_RPDF), row(_S_RWSUM),
                   row(_S_RM))
        own_hit = row(_S_HIT)
        own_emit = (row(_S_EMIT), row(_S_EMIT + 1), row(_S_EMIT + 2))

        ox, oy, oz, dx, dy, dz = build_raygen(cam, width, height)(pix)
        vx, vy, vz = -dx, -dy, -dz

        frame = frame_ref[0, 0].astype(jnp.uint32)
        key = _pcg(pix.astype(jnp.uint32))
        key = _fold(key, frame)
        key = _fold(key, _u32(0))
        key = _fold(key, _u32(7002))

        def em_lookup(cand, rows=_PHAT_ROWS):
            return rows_lookup(e_ref, e_pad, cand, rows, lo_map=_E_LO)

        def nb_p_hat(cand):
            return p_hat(em_lookup(cand), pxp, pyp, pzp, nx, ny, nz,
                         vx, vy, vz, alb, rough, metal)

        res = own_res
        if use_spatial and N_NBR > 0:
            sp = (jnp.zeros((1, C), jnp.float32),) * 5
            z = jnp.zeros((1, C), jnp.float32)
            key, u_acc = _next_uniform(key)
            sp = _res_update(sp, res[0], res[2] * res[1] * res[4], res[4],
                             res[2], u_acc, shade)
            z = z + jnp.where(shade & (res[2] > 0.0), res[4], 0.0)

            for nidx in range(N_NBR):
                d_x = offs_ref[nidx, 0]
                d_y = offs_ref[nidx, 1]
                off = d_y * width + d_x
                s = tile * C + off
                sc = jnp.clip(s, 0, B - C)
                q0 = sc // C
                r_sh = sc - q0 * C
                q1 = jnp.minimum(q0 + 1, G - 1)
                # neighbor window = two aligned tiles + dynamic lane roll
                b0 = pltpu.roll(read_stage(q0, win0), (C - r_sh) % C, axis=1)
                b1 = pltpu.roll(read_stage(q1, win1), (C - r_sh) % C, axis=1)
                nb = jnp.where(lane < C - r_sh, b0, b1)

                # in-image validity of the un-clamped neighbor coordinates
                ox_i = px_i + d_x
                oy_i = py_i + d_y
                in_img = (ox_i >= 0) & (ox_i < width) & (oy_i >= 0) \
                    & (oy_i < height)
                # the clamp of `s` shifts which lane we actually read;
                # require the read lane to be the intended one
                intended = s == sc

                def nrow(r):
                    return nb[r:r + 1, :]

                n_t = nrow(_S_T)
                depth_ok = (n_t <= 1.1 * t_own) & (n_t >= 0.9 * t_own)
                normal_ok = (nrow(_S_NRM) * nx + nrow(_S_NRM + 1) * ny
                             + nrow(_S_NRM + 2) * nz) >= 0.906
                ok = shade & in_img & intended & depth_ok & normal_ok \
                    & (nrow(_S_SHADE) > 0.5)

                nb_idx = nrow(_S_RIDX)
                nb_w = nrow(_S_RW)
                nb_m = nrow(_S_RM)
                key, u_acc = _next_uniform(key)
                p_n = nb_p_hat(nb_idx.astype(jnp.int32))
                sp = _res_update(sp, nb_idx, p_n * nb_w * nb_m, nb_m, p_n,
                                 u_acc, ok)
                z = z + jnp.where(ok & (p_n > 0.0), nb_m, 0.0)

            m_inv = 1.0 / jnp.maximum(z, 1.0)
            s_idx, _, s_p, s_wsum, s_m = sp
            s_w = jnp.where(s_p > 0.0, (m_inv * s_wsum)
                            / jnp.where(s_p > 0.0, s_p, 1.0), 0.0)
            res = tuple(jnp.where(shade, a, b) for a, b in
                        zip((s_idx, s_w, s_p, s_wsum, s_m), res))

        # final shade (Renderer.cu:1957-2031)
        key, up1 = _next_uniform(key)
        key, up2 = _next_uniform(key)
        # emitter geometry feeds the shadow-ray identity check — every
        # _SHADE_ROWS geometry/id row is in _E_EXACT, so the fetch is exact
        em = rows_lookup(e_ref, e_pad, res[0].astype(jnp.int32),
                         _SHADE_ROWS, lo_map=_E_LO)
        su = jnp.sqrt(up1)
        b1_ = su * (1.0 - up2)
        b2_ = su * up2
        ptx = em[_E_P0] + em[_E_E1] * b1_ + em[_E_E2] * b2_
        pty = em[_E_P0 + 1] + em[_E_E1 + 1] * b1_ + em[_E_E2 + 1] * b2_
        ptz = em[_E_P0 + 2] + em[_E_E1 + 2] * b1_ + em[_E_E2 + 2] * b2_
        tlx, tly, tlz = ptx - pxp, pty - pyp, ptz - pzp
        dist2 = jnp.maximum(tlx * tlx + tly * tly + tlz * tlz, 1e-20)
        inv_d = jax.lax.rsqrt(dist2)
        lx, ly, lz = tlx * inv_d, tly * inv_d, tlz * inv_d

        f = _cook_torrance(nx, ny, nz, vx, vy, vz, lx, ly, lz,
                           alb, rough, metal)
        cos_x = jnp.maximum(lx * nx + ly * ny + lz * nz, 0.0)
        cos_y = jnp.maximum(-(lx * em[_E_N] + ly * em[_E_N + 1]
                              + lz * em[_E_N + 2]), 0.0)
        area = jnp.maximum(em[_E_AREA], 1e-20)
        thr_s = cos_x * cos_y * area / dist2

        _, sh_hit, _, _, sh_tri = trace(pxp + nx * 1e-12, pyp + ny * 1e-12,
                                        pzp + nz * 1e-12, lx, ly, lz)
        sel_tri = em[_E_TRI].astype(jnp.int32)
        visible = (sh_tri == sel_tri) & (sel_tri >= 0)

        lane_ok = shade & visible
        sky_lane = shade & ~sh_hit
        miss = own_hit < 0.5
        prim_em = (~shade) & ~miss
        rows_hdr = []
        for c in range(3):
            lit = f[c] * thr_s * em[_E_EMIT + c] * res[1]
            v = jnp.where(lane_ok, lit, 0.0)
            v = v + jnp.where(sky_lane, f[c] * thr_s * sky[c], 0.0)
            v = jnp.where(miss, sky[c], v)
            v = jnp.where(prim_em, own_emit[c], v)
            rows_hdr.append(v)
        hdr_ref[:] = jnp.concatenate(
            rows_hdr + [jnp.zeros((5, C), jnp.float32)], axis=0)

        state_ref[:] = jnp.concatenate([
            res[0], res[1], res[2], res[3], res[4],          # _ST_R*
            nx, ny, nz,                                      # _ST_NRM
            t_own,                                           # _ST_T
            jnp.zeros((_ST_ROWS - 9, C), jnp.float32),       # pad
        ], axis=0)

    # ------------------------------------------------------------- driver
    grid = (G,)
    full = lambda i: (0, 0)
    blocked = lambda rows: pl.BlockSpec((rows, C), lambda i: (i, 0),
                                        memory_space=pltpu.VMEM)
    scratches = [
        pltpu.VMEM((6 * RS, C), jnp.float32),        # rayin
        pltpu.VMEM((3 * RS, C), jnp.float32),        # trout
        pltpu.VMEM((RS, C), jnp.int32),              # trouti
        pltpu.VMEM((RS, C), jnp.int32),              # lkin
        pltpu.VMEM((_NR_MAX * RS, C), jnp.float32),  # bank
    ]

    # big-scene scratch set: sparse candidate list + double-buffered HBM
    # plane windows (+ attribute window for K1's surface lookups); order
    # must match the kernels' pop order
    sparse_scratches = ([pltpu.VMEM((NT, 1), jnp.float32)]  # candst
                        if sparse else [])
    p_hbm_scratches = ([
        pltpu.VMEM((TT, 128), jnp.float32),               # ptile window 0
        pltpu.VMEM((TT, 128), jnp.float32),               # ptile window 1
        pltpu.SemaphoreType.DMA(()),                      # psem 0
        pltpu.SemaphoreType.DMA(()),                      # psem 1
    ] if hbm_tables else [])
    a_hbm_scratches = ([
        pltpu.VMEM((_A_ROWS_TOT, lk_csz), jnp.float32),   # at window
        pltpu.SemaphoreType.DMA(()),                      # asem
    ] if hbm_tables else [])
    p_spec = (pl.BlockSpec(memory_space=pl.ANY) if hbm_tables
              else pl.BlockSpec((T, 16), full, memory_space=pltpu.VMEM))
    a_spec = (pl.BlockSpec(memory_space=pl.ANY) if hbm_tables
              else pl.BlockSpec((_A_ROWS_TOT, T), full,
                                memory_space=pltpu.VMEM))

    def k1_call(cam, frame_arr, ppv, P, AT, EM, state, TXP=None, TAABB=None,
                TBOX=None):
        in_specs = [
            pl.BlockSpec((8, 4), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), full, memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 4), full, memory_space=pltpu.VMEM),
            p_spec,
            a_spec,
            pl.BlockSpec((_E_ROWS_TOT, e_pad), full,
                         memory_space=pltpu.VMEM),
        ]
        args = [cam, frame_arr, ppv, P, AT, EM]
        k1_scratches = list(scratches)
        if textured:
            khp, hp, wp = tex_shapes
            in_specs.append(pl.BlockSpec((3 * wp + (-3 * wp) % 8, khp),
                                         full, memory_space=pltpu.VMEM))
            args.append(TXP)
            k1_scratches += [
                pltpu.VMEM((3 * RS, C), jnp.float32),   # txin
                pltpu.VMEM((3 * RS, C), jnp.float32),   # txbank
            ]
        if cull:
            in_specs.append(pl.BlockSpec((n_tiles, 8), full,
                                         memory_space=pltpu.SMEM))
            args.append(TAABB)
            k1_scratches += [
                pltpu.VMEM((RS, C), jnp.float32),       # trst
                pltpu.VMEM((RS, C), jnp.int32),         # trsti
            ]
        if sparse:
            in_specs.append(pl.BlockSpec((8, NT), full,
                                         memory_space=pltpu.VMEM))
            args.append(TBOX)
            k1_scratches += sparse_scratches + p_hbm_scratches \
                + a_hbm_scratches
        if use_temporal:
            k1_scratches += [
                pltpu.VMEM((_ST_ROWS, C), jnp.float32),  # win_t0
                pltpu.VMEM((_ST_ROWS, C), jnp.float32),  # win_t1
                pltpu.SemaphoreType.DMA(()),
            ]
        # prev-frame state stays in HBM (reprojection reads a DMA window)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(state)
        return pl.pallas_call(
            k1, grid=grid,
            in_specs=in_specs,
            out_specs=blocked(_S_ROWS),
            out_shape=jax.ShapeDtypeStruct((G * _S_ROWS, C), jnp.float32),
            scratch_shapes=k1_scratches,
            interpret=interpret,
        )(*args)

    def k2_call(cam, frame_arr, offs, P, EM, stage, TAABB=None, TBOX=None):
        in_specs = [
            pl.BlockSpec((8, 4), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), full, memory_space=pltpu.SMEM),
            pl.BlockSpec((max(N_NBR, 1), 2), full,
                         memory_space=pltpu.SMEM),
            p_spec,
            pl.BlockSpec((_E_ROWS_TOT, e_pad), full,
                         memory_space=pltpu.VMEM),
        ]
        args = [cam, frame_arr, offs, P, EM]
        k2_scratches = list(scratches) + [
            pltpu.VMEM((_S_ROWS, C), jnp.float32),   # win0
            pltpu.VMEM((_S_ROWS, C), jnp.float32),   # win1
            pltpu.SemaphoreType.DMA(()),
        ]
        if cull:
            in_specs.append(pl.BlockSpec((n_tiles, 8), full,
                                         memory_space=pltpu.SMEM))
            args.append(TAABB)
            k2_scratches += [
                pltpu.VMEM((RS, C), jnp.float32),    # trst
                pltpu.VMEM((RS, C), jnp.int32),      # trsti
            ]
        if sparse:
            in_specs.append(pl.BlockSpec((8, NT), full,
                                         memory_space=pltpu.VMEM))
            args.append(TBOX)
            k2_scratches += sparse_scratches + p_hbm_scratches
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # stage (HBM)
        args.append(stage)
        return pl.pallas_call(
            k2, grid=grid,
            in_specs=in_specs,
            out_specs=[blocked(8), blocked(_ST_ROWS)],
            out_shape=[jax.ShapeDtypeStruct((G * 8, C), jnp.float32),
                       jax.ShapeDtypeStruct((G * _ST_ROWS, C), jnp.float32)],
            scratch_shapes=k2_scratches,
            interpret=interpret,
        )(*args)

    @jax.jit
    def render(cam, P, AT, EM, frame0, state, ppv0=None, ppv1=None,
               TXP=None, TAABB=None, TBOX=None):
        if hbm_tables and P.shape[1] < 128:
            # lane-align the HBM plane table for the per-tile DMA window
            P = jnp.pad(P, ((0, 0), (0, 128 - P.shape[1])))
        if sparse and TBOX.shape[1] < NT:
            TBOX = jnp.pad(TBOX, ((0, 0), (0, NT - TBOX.shape[1])))
        # ppv0 = proj@view of the dispatch BEFORE this one, ppv1 = this
        # dispatch's (the camera is static within a dispatch, so frames
        # past the first reproject into the current pose)
        if ppv0 is None:
            ppv0 = jnp.eye(4, dtype=jnp.float32)
        if ppv1 is None:
            ppv1 = ppv0

        def body(fi, carry):
            accum, st = carry
            frame = (frame0 + fi).astype(jnp.uint32)
            frame_arr = frame.reshape(1, 1).astype(jnp.int32)
            ppv = jnp.where(fi == 0, ppv0, ppv1)
            ppv_pad = jnp.concatenate(
                [ppv, jnp.zeros((4, 4), jnp.float32)], axis=0)
            stage = k1_call(cam, frame_arr, ppv_pad, P, AT, EM, st, TXP,
                            TAABB, TBOX)
            # frame-shared spatial offsets (see module docstring)
            okey = host_rng.path_key(jnp.uint32(0xD1CE), frame, 0,
                                     stream=7002)
            offs = []
            for _ in range(max(N_NBR, 1)):
                okey, ux = host_rng.next_uniform(okey)
                okey, uy = host_rng.next_uniform(okey)
                offs.append(((ux * 2.0 - 1.0) * radius).astype(jnp.int32))
                offs.append(((uy * 2.0 - 1.0) * radius).astype(jnp.int32))
            offs = jnp.stack(offs).reshape(max(N_NBR, 1), 2)
            hdr, st2 = k2_call(cam, frame_arr, offs, P, EM, stage, TAABB,
                               TBOX)
            return accum + hdr, st2

        accum0 = jnp.zeros((G * 8, C), jnp.float32)
        accum, state = jax.lax.fori_loop(0, n_frames, body, (accum0, state))
        hdr = accum.reshape(G, 8, C)[:, :3, :].transpose(0, 2, 1)
        return hdr.reshape(B, 3), state

    return render


class MegakernelReSTIRDI:
    """Offline static-camera ReSTIR DI fast path."""

    def __init__(self, scene: Scene, camera, settings, interpret: bool = False):
        mscene, _ = morton_permuted_scene(scene)
        self.taabb = prepare_tile_aabbs(mscene, TRI_TILE)
        self.cull = self.taabb.shape[0] >= 8
        # big scenes: dense VMEM tables don't fit past ~32k tris — switch
        # to the sparse trace + HBM-resident tables (same threshold as
        # MegakernelRenderer) so ReSTIR DI runs on e.g. the stress scene
        n_tris = scene.geometry.tri_v.shape[0]
        self.sparse = n_tris + ((-n_tris) % TRI_TILE) >= 32768
        self.tbox = (prepare_tile_boxes_lanes(mscene, TRI_TILE)
                     if self.sparse else None)
        if self.sparse:
            self.cull = False
        self.scene = jax.tree_util.tree_map(jnp.asarray, mscene)
        self.camera = camera
        self.settings = settings
        self.interpret = interpret
        self.frame_index = 1
        self.tables = prepare_scene_tables(self.scene)
        self.em_table, self.n_emissive = prepare_emissive_table(self.scene)
        self.tex_table = self.tex_shapes = None
        if scene_is_textured(scene):
            txp, _, shapes = prepare_texture_tables(scene.textures)
            self.tex_table, self.tex_shapes = txp, shapes[0]
        B = camera.width * camera.height
        C = _pick_ray_lanes(B)
        self.state = jnp.zeros((B // C * _ST_ROWS, C), jnp.float32)
        self.accum = jnp.zeros((B, 3), jnp.float32)
        self._cache = {}

    def _renderer(self, n_frames):
        if n_frames not in self._cache:
            fn = make_restir_di_megakernel(
                self.camera.width, self.camera.height, self.settings,
                self.scene.geometry.tri_v.shape[0], self.n_emissive,
                self.em_table.shape[1], n_frames,
                tex_shapes=self.tex_shapes, cull=self.cull,
                sparse=self.sparse, interpret=self.interpret)

            # one jitted dispatch per batch (render + accumulate): eager
            # jnp ops cost tunnel round-trips on axon and dominated
            # short-dispatch (burst) timings
            def step(cam, P, AT, EM, f0, state, accum, ppv0, ppv1, TXP,
                     TAABB, TBOX):
                summed, st = fn(cam, P, AT, EM, f0, state, ppv0=ppv0,
                                ppv1=ppv1, TXP=TXP, TAABB=TAABB, TBOX=TBOX)
                return accum + summed, st

            self._cache[n_frames] = jax.jit(step)
        return self._cache[n_frames]

    def dispatch_plan(self, n_frames) -> list:
        """Frames-per-dispatch plan bounded by estimated device time so no
        frame budget trips the runtime watchdog (PERF.md #24).  DI traces
        ~2 sweeps/frame (primary + final shadow)."""
        from fypraytracer_tpu.render.megakernel import make_dispatch_plan

        return make_dispatch_plan(self.camera,
                                  self.scene.geometry.tri_v.shape[0],
                                  n_frames, sweeps=2.0)

    def render_many(self, n_frames):
        from fypraytracer_tpu.render.megakernel import _finish_avg

        cam = jnp.concatenate([jnp.asarray(self.camera.inv_projection),
                               jnp.asarray(self.camera.inv_view)], axis=0)
        P, AT = self.tables
        ppv_prev = jnp.asarray(self.camera.prev_proj_view)
        ppv_cur = jnp.asarray(self.camera.proj_view)
        for i, f in enumerate(self.dispatch_plan(n_frames)):
            # chunks after the first rendered their previous frame at the
            # CURRENT pose — reprojection must use it, not the pre-move
            # pose (only chunk 1's first frame looks back across the move)
            self.accum, self.state = self._renderer(f)(
                cam, P, AT, self.em_table, jnp.uint32(self.frame_index),
                self.state, self.accum,
                ppv_prev if i == 0 else ppv_cur, ppv_cur, self.tex_table,
                self.taabb if self.cull else None, self.tbox)
            self.frame_index += f
        self.camera.commit_frame()
        h, w = self.camera.height, self.camera.width
        return _finish_avg(self.accum,
                           jnp.float32(self.frame_index - 1)).reshape(h, w, 3)
