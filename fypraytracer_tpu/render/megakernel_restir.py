"""Fused Pallas ReSTIR DI renderer — two in-program kernels per frame.

The wavefront ReSTIR DI frame (render/restir_di.py) spends most of its
time in per-XLA-op dispatch (PERF.md); this module runs the whole frame as
TWO pallas kernels inside one jit — stage 1 (candidates + temporal) and
stage 2 (spatial + shade) — with the frame loop in the surrounding
``fori_loop`` so N frames cost a single dispatch.  Mirrors the reference's
two-kernel split (Renderer.cu:166-224).

Design deviations from the wavefront path (all documented, offline
static-camera fast path — the wavefront renderer remains the general one):
  * temporal reprojection is same-pixel (static camera), so the previous
    frame's reservoir block is tile-local;
  * spatial neighbor offsets are drawn PER FRAME, shared by all pixels
    (instead of per pixel).  Neighbor reads then become dynamic-slice
    reads of the stage buffer at a scalar offset — no per-lane gathers.
    Out-of-image neighbors are rejected per lane (the wavefront clamps
    coordinates instead); the 1/Z accounting keeps the estimator unbiased
    under both conventions;
  * the normal G-buffer skips octahedral quantization (raw normals ride
    the stage buffer).

Validated statistically against the light-sampling estimator
(tests/test_megakernel_restir.py), like the wavefront ReSTIR tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fypraytracer_tpu.core import rng as host_rng
from fypraytracer_tpu.render.megakernel import (
    _A_ALBEDO,
    _A_METAL,
    _A_ROUGH,
    _fold,
    _next_uniform,
    _pcg,
    _u32,
)
from fypraytracer_tpu.render._mk_legacy import (
    RAY_TILE,
    TRI_TILE,
    _cook_torrance_attrs,
    _make_lookup,
    _make_raygen,
    _make_trace,
    prepare_scene_tables,
)
from fypraytracer_tpu.scene.types import Scene

# emissive-triangle table columns (per entry of the emissive list)
_E_P0 = 0      # 0:3
_E_E1 = 3     # 3:6
_E_E2 = 6     # 6:9
_E_AREA = 9
_E_N = 10     # 10:13 averaged normal
_E_EMIT = 13  # 13:16 emission
_E_CENT = 16  # 16:19 centroid
_E_TRI = 19   # global triangle id
_E_COLS = 24

# stage buffer (K1 -> K2) columns
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
# padded to a full lane tile: HBM<->VMEM DMA slices need 128-aligned lanes
_S_COLS = 128

# persistent state (K2 -> next K1) columns
_ST_RIDX = 0
_ST_RW = 1
_ST_RPDF = 2
_ST_RWSUM = 3
_ST_RM = 4
_ST_NRM = 5   # 5:8
_ST_T = 8
_ST_COLS = 16


def prepare_emissive_table(scene: Scene, e_pad: int = 128):
    """Dense per-emissive-triangle table for one-hot candidate lookups."""
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

    n_rows = max(e_pad, e)
    E = jnp.zeros((n_rows, _E_COLS), jnp.float32)
    E = E.at[:e, _E_P0:_E_P0 + 3].set(p0)
    E = E.at[:e, _E_E1:_E_E1 + 3].set(p1 - p0)
    E = E.at[:e, _E_E2:_E_E2 + 3].set(p2 - p0)
    E = E.at[:e, _E_AREA].set(area)
    E = E.at[:e, _E_N:_E_N + 3].set(navg)
    E = E.at[:e, _E_EMIT:_E_EMIT + 3].set(emission)
    E = E.at[:e, _E_CENT:_E_CENT + 3].set((p0 + p1 + p2) / 3.0)
    E = E.at[:e, _E_TRI].set(em_tris.astype(jnp.float32))
    E = E.at[e:, _E_TRI].set(-1.0)
    return E, int(e)


def make_restir_di_megakernel(width: int, height: int, settings, n_tris: int,
                              n_emissive: int, e_pad: int,
                              n_frames: int, interpret: bool = False):
    """Build ``render(cam, wn, wu, wv, A, EM, frame0, state) ->
    (summed hdr (B,3), new_state (B,_ST_COLS))``."""
    B = width * height
    C = RAY_TILE
    assert B % C == 0
    T = n_tris + ((-n_tris) % TRI_TILE)
    n_tri_tiles = T // TRI_TILE
    sky = tuple(float(c) for c in settings.sky_color)
    M = settings.light_candidates
    N_NBR = settings.spatial_neighbors
    radius = float(settings.spatial_radius)
    hist = float(settings.temporal_history_limit)
    use_temporal = settings.temporal_reuse
    use_spatial = settings.spatial_reuse

    def p_hat(em_row, pos, nx, ny, nz, vx, vy, vz, surf_attrs):
        """‖brdf · cosx · cosy / (dist²/area) · emission‖ at the emitter
        CENTROID (restir_di.target_pdf_centroid parity)."""
        cx = em_row[:, _E_CENT:_E_CENT + 1]
        cy = em_row[:, _E_CENT + 1:_E_CENT + 2]
        cz = em_row[:, _E_CENT + 2:_E_CENT + 3]
        tlx, tly, tlz = cx - pos[0], cy - pos[1], cz - pos[2]
        dist2 = jnp.maximum(tlx * tlx + tly * tly + tlz * tlz, 1e-20)
        inv_d = jax.lax.rsqrt(dist2)
        lx, ly, lz = tlx * inv_d, tly * inv_d, tlz * inv_d
        f = _cook_torrance_attrs(nx, ny, nz, vx, vy, vz, lx, ly, lz, surf_attrs)
        cos_x = jnp.maximum(lx * nx + ly * ny + lz * nz, 0.0)
        lnx = em_row[:, _E_N:_E_N + 1]
        lny = em_row[:, _E_N + 1:_E_N + 2]
        lnz = em_row[:, _E_N + 2:_E_N + 3]
        cos_y = jnp.maximum(-(lx * lnx + ly * lny + lz * lnz), 0.0)
        area = jnp.maximum(em_row[:, _E_AREA:_E_AREA + 1], 1e-20)
        scale = cos_x * cos_y * area / dist2
        acc = 0.0
        for c in range(3):
            r = f[c] * scale * em_row[:, _E_EMIT + c:_E_EMIT + c + 1]
            acc = acc + r * r
        return jnp.sqrt(jnp.maximum(acc, 0.0))

    iota_e = None  # built inside kernels

    def res_update(res, cand, weight, count, pdf, u, active):
        """Streaming RIS update (ReSTIR_DI_Reservoir.cu:22-37)."""
        idx, w, p, wsum, m = res
        wsum2 = wsum + jnp.where(active, weight, 0.0)
        m2 = m + jnp.where(active, count, 0.0)
        accept = active & (wsum2 > 0.0) & (u < weight / jnp.where(wsum2 > 0.0, wsum2, 1.0))
        return (jnp.where(accept, cand, idx), w,
                jnp.where(accept, pdf, p), wsum2, m2)

    # ------------------------------------------------------------------ K1
    def k1(cam_ref, frame_ref, wn_ref, wu_ref, wv_ref, a_ref, em_ref,
           state_ref, stage_ref, onehot_ref):
        tile = pl.program_id(0)
        cam = cam_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
        pix = tile * C + lane
        raygen = _make_raygen(cam, width, height, C)
        trace = _make_trace(wn_ref, wu_ref, wv_ref, onehot_ref, C, n_tri_tiles)
        lookup = _make_lookup(onehot_ref, a_ref)

        ox, oy, oz, dx, dy, dz = raygen(pix)
        t0, hit0, u0, v0 = trace(ox, oy, oz, dx, dy, dz)
        attrs0, nx, ny, nz = lookup(u0, v0)
        em0 = attrs0[:, 3:6]  # _A_EMISSION
        prim_emissive = hit0 & (jnp.sum(em0 * em0, axis=1, keepdims=True) > 0.0)
        shade = hit0 & ~prim_emissive
        px_ = ox + dx * t0
        py_ = oy + dy * t0
        pz_ = oz + dz * t0
        vx, vy, vz = -dx, -dy, -dz
        pos = (px_, py_, pz_)

        frame = frame_ref[0, 0].astype(jnp.uint32)
        key = _pcg(pix.astype(jnp.uint32))
        key = _fold(key, frame)
        key = _fold(key, _u32(0))
        key = _fold(key, _u32(7001))

        iota = jax.lax.broadcasted_iota(jnp.int32, (C, e_pad), 1)

        def em_lookup(cand):
            onehot = (iota == cand).astype(jnp.float32)
            return jnp.dot(onehot, em_ref[:], preferred_element_type=jnp.float32)

        res = (jnp.zeros((C, 1), jnp.float32),) * 5  # idx, w, pdf, wsum, m
        for _ in range(M):
            key, u_sel = _next_uniform(key)
            key, u_acc = _next_uniform(key)
            cand = jnp.minimum((u_sel * n_emissive).astype(jnp.int32),
                               n_emissive - 1)
            ph = p_hat(em_lookup(cand), pos, nx, ny, nz, vx, vy, vz, attrs0)
            res = res_update(res, cand.astype(jnp.float32),
                             ph * float(n_emissive), 1.0, ph, u_acc, shade)
        idx, _, p, wsum, m = res
        w = jnp.where(p > 0.0, (wsum / jnp.maximum(m, 1.0))
                      / jnp.where(p > 0.0, p, 1.0), 0.0)
        res = (idx, w, p, wsum, m)

        if use_temporal:
            st = state_ref[:]           # (C, _ST_COLS) tile-local (static cam)
            pn_x = st[:, _ST_NRM:_ST_NRM + 1]
            pn_y = st[:, _ST_NRM + 1:_ST_NRM + 2]
            pn_z = st[:, _ST_NRM + 2:_ST_NRM + 3]
            p_m = st[:, _ST_RM:_ST_RM + 1]
            valid = ((pn_x * nx + pn_y * ny + pn_z * nz) >= 0.99) \
                & (p_m > 0.0) & shade
            cap = hist * res[4]
            prev_m = jnp.minimum(p_m, cap)
            prev_idx = st[:, _ST_RIDX:_ST_RIDX + 1]
            prev_w = st[:, _ST_RW:_ST_RW + 1]

            tmp = (jnp.zeros((C, 1), jnp.float32),) * 5
            z = jnp.zeros((C, 1), jnp.float32)
            key, u1 = _next_uniform(key)
            key, u2 = _next_uniform(key)
            tmp = res_update(tmp, res[0], res[2] * res[1] * res[4], res[4],
                             res[2], u1, valid)
            z = z + jnp.where(valid & (res[2] > 0.0), res[4], 0.0)
            p_prev = p_hat(em_lookup(prev_idx.astype(jnp.int32)), pos,
                           nx, ny, nz, vx, vy, vz, attrs0)
            tmp = res_update(tmp, prev_idx, p_prev * prev_w * prev_m, prev_m,
                             p_prev, u2, valid)
            z = z + jnp.where(valid & (p_prev > 0.0), prev_m, 0.0)
            m_inv = 1.0 / jnp.maximum(z, 1.0)
            t_idx, _, t_p, t_wsum, t_m = tmp
            t_w = jnp.where(t_p > 0.0, (m_inv * t_wsum)
                            / jnp.where(t_p > 0.0, t_p, 1.0), 0.0)
            res = tuple(jnp.where(valid, a, b) for a, b in
                        zip((t_idx, t_w, t_p, t_wsum, t_m), res))

        # column layout must follow the _S_* indices (scatter doesn't
        # lower in Mosaic, so the block is assembled by concatenation)
        stage_ref[:] = jnp.concatenate([
            px_, py_, pz_,                                   # _S_POS
            nx, ny, nz,                                      # _S_NRM
            attrs0[:, _A_ALBEDO:_A_ALBEDO + 3],              # _S_ALB
            attrs0[:, _A_ROUGH:_A_ROUGH + 1],                # _S_ROUGH
            attrs0[:, _A_METAL:_A_METAL + 1],                # _S_METAL
            jnp.where(hit0, t0, -1.0),                       # _S_T
            shade.astype(jnp.float32),                       # _S_SHADE
            em0,                                             # _S_EMIT
            hit0.astype(jnp.float32),                        # _S_HIT
            res[0], res[1], res[2], res[3], res[4],          # reservoir
            jnp.zeros((C, _S_COLS - 22), jnp.float32),       # pad
        ], axis=1)

    # ------------------------------------------------------------------ K2
    def k2(cam_ref, frame_ref, offs_ref, wn_ref, wu_ref, wv_ref, em_ref,
           stage_full_ref, hdr_ref, state_ref, onehot_ref, stage_vmem, dma_sem):
        tile = pl.program_id(0)
        cam = cam_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
        pix = tile * C + lane
        px_i = pix % width
        py_i = pix // width
        trace = _make_trace(wn_ref, wu_ref, wv_ref, onehot_ref, C, n_tri_tiles)

        def read_stage(start):
            """DMA a (C, _S_COLS) window of the HBM stage buffer to VMEM
            (the full buffer tile-pads to 128 lanes — far too big for a
            resident VMEM copy)."""
            dma = pltpu.make_async_copy(
                stage_full_ref.at[pl.ds(start, C), :], stage_vmem, dma_sem)
            dma.start()
            dma.wait()
            return stage_vmem[:]

        own = read_stage(tile * C)
        pos = (own[:, _S_POS:_S_POS + 1], own[:, _S_POS + 1:_S_POS + 2],
               own[:, _S_POS + 2:_S_POS + 3])
        nx = own[:, _S_NRM:_S_NRM + 1]
        ny = own[:, _S_NRM + 1:_S_NRM + 2]
        nz = own[:, _S_NRM + 2:_S_NRM + 3]
        shade = own[:, _S_SHADE:_S_SHADE + 1] > 0.5
        t_own = own[:, _S_T:_S_T + 1]

        raygen = _make_raygen(cam, width, height, C)
        ox, oy, oz, dx, dy, dz = raygen(pix)
        vx, vy, vz = -dx, -dy, -dz
        # attrs layout: albedo @0:3, rough @6, metal @7 (megakernel _A_*)
        surf_attrs = jnp.concatenate([
            own[:, _S_ALB:_S_ALB + 3],
            jnp.zeros((C, 3), jnp.float32),
            own[:, _S_ROUGH:_S_ROUGH + 1],
            own[:, _S_METAL:_S_METAL + 1],
            jnp.zeros((C, 24), jnp.float32),
        ], axis=1)

        frame = frame_ref[0, 0].astype(jnp.uint32)
        key = _pcg(pix.astype(jnp.uint32))
        key = _fold(key, frame)
        key = _fold(key, _u32(0))
        key = _fold(key, _u32(7002))

        iota = jax.lax.broadcasted_iota(jnp.int32, (C, e_pad), 1)

        def em_lookup(cand):
            onehot = (iota == cand).astype(jnp.float32)
            return jnp.dot(onehot, em_ref[:], preferred_element_type=jnp.float32)

        res = (own[:, _S_RIDX:_S_RIDX + 1], own[:, _S_RW:_S_RW + 1],
               own[:, _S_RPDF:_S_RPDF + 1], own[:, _S_RWSUM:_S_RWSUM + 1],
               own[:, _S_RM:_S_RM + 1])

        if use_spatial and N_NBR > 0:
            sp = (jnp.zeros((C, 1), jnp.float32),) * 5
            z = jnp.zeros((C, 1), jnp.float32)
            key, u_acc = _next_uniform(key)
            sp = res_update(sp, res[0], res[2] * res[1] * res[4], res[4],
                            res[2], u_acc, shade)
            z = z + jnp.where(shade & (res[2] > 0.0), res[4], 0.0)

            for nidx in range(N_NBR):
                d_x = offs_ref[nidx, 0]
                d_y = offs_ref[nidx, 1]
                off = d_y * width + d_x
                start = jnp.clip(tile * C + off, 0, B - C)
                nb = read_stage(start)

                # in-image validity of the un-clamped neighbor coordinates
                ox_i = px_i + d_x
                oy_i = py_i + d_y
                in_img = (ox_i >= 0) & (ox_i < width) & (oy_i >= 0) & (oy_i < height)
                # the clamp of `start` shifts which lane we actually read;
                # require the read lane to be the intended one
                intended = (tile * C + off) == start

                n_t = nb[:, _S_T:_S_T + 1]
                nnx = nb[:, _S_NRM:_S_NRM + 1]
                nny = nb[:, _S_NRM + 1:_S_NRM + 2]
                nnz = nb[:, _S_NRM + 2:_S_NRM + 3]
                depth_ok = (n_t <= 1.1 * t_own) & (n_t >= 0.9 * t_own)
                normal_ok = (nnx * nx + nny * ny + nnz * nz) >= 0.906
                ok = shade & in_img & intended & depth_ok & normal_ok \
                    & (nb[:, _S_SHADE:_S_SHADE + 1] > 0.5)

                nb_idx = nb[:, _S_RIDX:_S_RIDX + 1]
                nb_w = nb[:, _S_RW:_S_RW + 1]
                nb_m = nb[:, _S_RM:_S_RM + 1]
                key, u_acc = _next_uniform(key)
                p_n = p_hat(em_lookup(nb_idx.astype(jnp.int32)), pos,
                            nx, ny, nz, vx, vy, vz, surf_attrs)
                sp = res_update(sp, nb_idx, p_n * nb_w * nb_m, nb_m, p_n,
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
        em_row = em_lookup(res[0].astype(jnp.int32))
        su = jnp.sqrt(up1)
        b1 = su * (1.0 - up2)
        b2 = su * up2
        ptx = em_row[:, _E_P0:_E_P0 + 1] + em_row[:, _E_E1:_E_E1 + 1] * b1 \
            + em_row[:, _E_E2:_E_E2 + 1] * b2
        pty = em_row[:, _E_P0 + 1:_E_P0 + 2] + em_row[:, _E_E1 + 1:_E_E1 + 2] * b1 \
            + em_row[:, _E_E2 + 1:_E_E2 + 2] * b2
        ptz = em_row[:, _E_P0 + 2:_E_P0 + 3] + em_row[:, _E_E1 + 2:_E_E1 + 3] * b1 \
            + em_row[:, _E_E2 + 2:_E_E2 + 3] * b2
        tlx, tly, tlz = ptx - pos[0], pty - pos[1], ptz - pos[2]
        dist2 = jnp.maximum(tlx * tlx + tly * tly + tlz * tlz, 1e-20)
        inv_d = jax.lax.rsqrt(dist2)
        lx, ly, lz = tlx * inv_d, tly * inv_d, tlz * inv_d

        f = _cook_torrance_attrs(nx, ny, nz, vx, vy, vz, lx, ly, lz, surf_attrs)
        cos_x = jnp.maximum(lx * nx + ly * ny + lz * nz, 0.0)
        lnx = em_row[:, _E_N:_E_N + 1]
        lny = em_row[:, _E_N + 1:_E_N + 2]
        lnz = em_row[:, _E_N + 2:_E_N + 3]
        cos_y = jnp.maximum(-(lx * lnx + ly * lny + lz * lnz), 0.0)
        area = jnp.maximum(em_row[:, _E_AREA:_E_AREA + 1], 1e-20)
        thr_s = cos_x * cos_y * area / dist2

        sh_t, sh_hit, _, _ = trace(pos[0] + nx * 1e-12, pos[1] + ny * 1e-12,
                                   pos[2] + nz * 1e-12, lx, ly, lz)
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (C, T), 1)
        sel_tri = em_row[:, _E_TRI:_E_TRI + 1].astype(jnp.int32)
        sel_onehot = (iota_t == sel_tri).astype(jnp.float32)
        visible = jnp.sum(onehot_ref[:] * sel_onehot, axis=1,
                          keepdims=True) > 0.5

        lane_ok = shade & visible
        sky_lane = shade & ~sh_hit
        miss = own[:, _S_HIT:_S_HIT + 1] < 0.5
        prim_em = (own[:, _S_SHADE:_S_SHADE + 1] < 0.5) & ~miss
        cols = []
        for c in range(3):
            lit = f[c] * thr_s * em_row[:, _E_EMIT + c:_E_EMIT + c + 1] * res[1]
            v = jnp.where(lane_ok, lit, 0.0)
            v = v + jnp.where(sky_lane, f[c] * thr_s * sky[c], 0.0)
            v = jnp.where(miss, sky[c], v)
            v = jnp.where(prim_em, own[:, _S_EMIT + c:_S_EMIT + c + 1], v)
            cols.append(v)
        hdr_ref[:] = jnp.concatenate(cols, axis=1)

        state_ref[:] = jnp.concatenate([
            res[0], res[1], res[2], res[3], res[4],          # _ST_R*
            nx, ny, nz,                                      # _ST_NRM
            t_own,                                           # _ST_T
            jnp.zeros((C, _ST_COLS - 9), jnp.float32),       # pad
        ], axis=1)

    # ------------------------------------------------------------- driver
    grid = (B // C,)
    full = lambda i: (0, 0)
    blocked = lambda cols: pl.BlockSpec((C, cols), lambda i: (i, 0),
                                        memory_space=pltpu.VMEM)

    def k1_call(cam, frame_arr, wn, wu, wv, A, EM, state):
        return pl.pallas_call(
            k1, grid=grid,
            in_specs=[
                pl.BlockSpec((8, 4), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), full, memory_space=pltpu.SMEM),
                pl.BlockSpec((4, T), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((4, T), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((4, T), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((T, 32), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((e_pad, _E_COLS), full, memory_space=pltpu.VMEM),
                blocked(_ST_COLS),
            ],
            out_specs=blocked(_S_COLS),
            out_shape=jax.ShapeDtypeStruct((B, _S_COLS), jnp.float32),
            scratch_shapes=[pltpu.VMEM((C, T), jnp.float32)],
            interpret=interpret,
        )(cam, frame_arr, wn, wu, wv, A, EM, state)

    def k2_call(cam, frame_arr, offs, wn, wu, wv, EM, stage):
        return pl.pallas_call(
            k2, grid=grid,
            in_specs=[
                pl.BlockSpec((8, 4), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), full, memory_space=pltpu.SMEM),
                pl.BlockSpec((max(N_NBR, 1), 2), full, memory_space=pltpu.SMEM),
                pl.BlockSpec((4, T), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((4, T), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((4, T), full, memory_space=pltpu.VMEM),
                pl.BlockSpec((e_pad, _E_COLS), full, memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),  # stage stays in HBM
            ],
            out_specs=[blocked(3), blocked(_ST_COLS)],
            out_shape=[jax.ShapeDtypeStruct((B, 3), jnp.float32),
                       jax.ShapeDtypeStruct((B, _ST_COLS), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((C, T), jnp.float32),
                            pltpu.VMEM((C, _S_COLS), jnp.float32),
                            pltpu.SemaphoreType.DMA(())],
            interpret=interpret,
        )(cam, frame_arr, offs, wn, wu, wv, EM, stage)

    @jax.jit
    def render(cam, wn, wu, wv, A, EM, frame0, state):
        def body(fi, carry):
            accum, st = carry
            frame = (frame0 + fi).astype(jnp.uint32)
            frame_arr = frame.reshape(1, 1).astype(jnp.int32)
            stage = k1_call(cam, frame_arr, wn, wu, wv, A, EM, st)
            # frame-shared spatial offsets (see module docstring)
            okey = host_rng.path_key(jnp.uint32(0xD1CE), frame, 0, stream=7002)
            offs = []
            for _ in range(max(N_NBR, 1)):
                okey, ux = host_rng.next_uniform(okey)
                okey, uy = host_rng.next_uniform(okey)
                offs.append(((ux * 2.0 - 1.0) * radius).astype(jnp.int32))
                offs.append(((uy * 2.0 - 1.0) * radius).astype(jnp.int32))
            offs = jnp.stack(offs).reshape(max(N_NBR, 1), 2)
            hdr, st2 = k2_call(cam, frame_arr, offs, wn, wu, wv, EM, stage)
            return accum + hdr, st2

        accum0 = jnp.zeros((B, 3), jnp.float32)
        return jax.lax.fori_loop(0, n_frames, body, (accum0, state))

    return render


class MegakernelReSTIRDI:
    """Offline static-camera ReSTIR DI fast path."""

    def __init__(self, scene: Scene, camera, settings, interpret: bool = False):
        self.scene = jax.tree_util.tree_map(jnp.asarray, scene)
        self.camera = camera
        self.settings = settings
        self.interpret = interpret
        self.frame_index = 1
        self.tables = prepare_scene_tables(self.scene)
        self.em_table, self.n_emissive = prepare_emissive_table(self.scene)
        B = camera.width * camera.height
        self.state = jnp.zeros((B, _ST_COLS), jnp.float32)
        self.accum = jnp.zeros((B, 3), jnp.float32)
        self._cache = {}

    def _renderer(self, n_frames):
        if n_frames not in self._cache:
            self._cache[n_frames] = make_restir_di_megakernel(
                self.camera.width, self.camera.height, self.settings,
                self.scene.geometry.tri_v.shape[0], self.n_emissive,
                self.em_table.shape[0], n_frames, interpret=self.interpret)
        return self._cache[n_frames]

    def render_many(self, n_frames):
        cam = jnp.concatenate([jnp.asarray(self.camera.inv_projection),
                               jnp.asarray(self.camera.inv_view)], axis=0)
        wn, wu, wv, A = self.tables
        summed, self.state = self._renderer(n_frames)(
            cam, wn, wu, wv, A, self.em_table,
            jnp.uint32(self.frame_index), self.state)
        self.accum = self.accum + summed
        self.frame_index += n_frames
        h, w = self.camera.height, self.camera.width
        return (self.accum / jnp.float32(self.frame_index - 1)).reshape(h, w, 3)
