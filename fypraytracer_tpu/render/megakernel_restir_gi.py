"""Fused Pallas ReSTIR GI renderer — two in-program kernels per frame.

Lane-layout megakernel counterpart of render/restir_gi.py (Ouyang et al.
2021; reference kernels PerPixel_ReSTIR_GI_Part1/2, Renderer.cu:2043-2387)
with the same estimator semantics as the wavefront path, including its
documented fixes of the reference's defects (radiance stored WITHOUT the
visible-point BRDF; W = wsum/(Z·p̂); sky-only first bounces shaded outside
the reservoir — see render/restir_gi.py docstring).

Structure mirrors render/megakernel_restir.py: stage 1 traces the initial
BRDF path sample + temporal reuse (same-pixel, static-camera fast path),
stage 2 does spatial reuse with the path-reconnection Jacobian and a
visibility re-trace, then shades.  Spatial-neighbor stage windows are two
lane-aligned HBM tiles + a dynamic ``pltpu.roll``.  Frame loop in the
surrounding ``fori_loop`` — N frames per dispatch.

Deviations (same as the DI megakernel, documented there): tile-shared
temporal reprojection offset (moving cameras keep history where the
per-lane reprojection matches the shared window; others restart fresh),
frame-shared spatial offsets, raw (non-octahedral) normals in the
stage/state buffers.

Validated statistically against the BRDF path tracer
(tests/test_megakernel_restir.py), like the wavefront GI tests.
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
    _mixture_sample,
    _next_uniform,
    _norm3,
    _pcg,
    _pick_ray_lanes,
    _u32,
    _lookup_chunk,
    build_raygen,
    build_rows_lookup,
    build_shadow_trace,
    build_shadow_trace_sparse,
    build_surf_lookup,
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

# stage buffer rows (K1 -> K2), HBM layout (G * _GS_ROWS, C)
_GS_POS = 0      # 0:3   visible point
_GS_NRM = 3      # 3:6   visible normal
_GS_ALB = 6      # 6:9
_GS_ROUGH = 9
_GS_METAL = 10
_GS_T = 11
_GS_SHADE = 12
_GS_EMIT = 13    # 13:16 primary-hit emission
_GS_HIT = 16
_GS_SKY = 17     # 17:20 non-reusable first-bounce sky term (pre-shaded)
_GS_SP = 20      # 20:23 sample point
_GS_SN = 23      # 23:26 sample normal
_GS_RAD = 26     # 26:29 outgoing radiance from the sample point
_GS_PHAT = 29
_GS_W = 30
_GS_M = 31
_GS_WSUM = 32
_GS_ROWS = 40

# persistent state rows (K2 -> next K1), (G * _GST_ROWS, C)
_GT_SP = 0       # 0:3
_GT_SN = 3       # 3:6
_GT_RAD = 6      # 6:9
_GT_PHAT = 9
_GT_W = 10
_GT_M = 11
_GT_WSUM = 12
_GT_NRM = 13     # 13:16
_GST_ROWS = 16

_EPS = 1e-12    # ray-origin offset (integrators.ORIGIN_EPS parity)


def _gi_res_update(res, cand, weight, count, pdf, u, active):
    """Streaming PathSample reservoir update (ReSTIR_GI_Reservoir.cu:5-33,
    restir_gi.reservoir_update parity).  ``res``/``cand`` are dicts with
    sp/sn/rad 3-tuples; res additionally carries phat/w/m/wsum."""
    wsum2 = res["wsum"] + jnp.where(active, weight, 0.0)
    m2 = res["m"] + jnp.where(active, count, 0.0)
    accept = active & (wsum2 > 0.0) \
        & (u < weight / jnp.where(wsum2 > 0.0, wsum2, 1.0))

    def sel(a, b):
        return jnp.where(accept, a, b)

    return dict(
        sp=tuple(sel(cand["sp"][c], res["sp"][c]) for c in range(3)),
        sn=tuple(sel(cand["sn"][c], res["sn"][c]) for c in range(3)),
        rad=tuple(sel(cand["rad"][c], res["rad"][c]) for c in range(3)),
        phat=sel(pdf, res["phat"]), w=res["w"], m=m2, wsum=wsum2)


def _w_of(res):
    """W = wsum / (M · p̂) (restir_gi._w_of parity)."""
    p = res["phat"]
    return jnp.where(p > 0.0,
                     res["wsum"] / (jnp.maximum(res["m"], 1.0)
                                    * jnp.where(p > 0.0, p, 1.0)),
                     0.0)


def _rad_norm(rad):
    return jnp.sqrt(jnp.maximum(
        rad[0] * rad[0] + rad[1] * rad[1] + rad[2] * rad[2], 0.0))


def make_restir_gi_megakernel(width: int, height: int, settings, n_tris: int,
                              n_frames: int, tex_shapes=None,
                              cull: bool = False,
                              interpret: bool = False,
                              probe_split_vis: bool = False):
    """Build ``render(cam, P, AT, frame0, state[, TXP, TXB][, TAABB]) ->
    (summed hdr (B, 3), new_state)``.

    ``tex_shapes``: dims pair from ``prepare_texture_tables`` — K1 fetches
    albedo maps at the visible point (mip 0) and at sample-point/bounce
    hits (bounce level), matching the wavefront restir_gi; K2 reads the
    visible-point albedo back from the stage buffer.

    ``cull``: per-tile AABB culling (tables must come from a
    Morton-permuted scene; pass ``prepare_tile_aabbs`` as TAABB).  K2b's
    visibility re-traces use a SHADOW trace either way (occlusion-only,
    per-lane early-out) — the GI frame is visibility-trace-bound
    (PERF.md), and shadow rays are short segments the cull prunes hard."""
    B = width * height
    C = _pick_ray_lanes(B)
    TT = TRI_TILE
    T = n_tris + ((-n_tris) % TT)
    G = B // C
    RS = _RS
    n_tiles = T // TT
    textured = tex_shapes is not None
    sky = tuple(float(c) for c in settings.sky_color)
    bounces = settings.bounces
    N_NBR = settings.spatial_neighbors
    radius = float(settings.spatial_radius)
    hist = float(settings.temporal_history_limit)
    use_temporal = settings.temporal_reuse
    use_spatial = settings.spatial_reuse

    # ------------------------------------------------------------------ K1
    def k1(*refs):
        refs = list(refs)
        cam_ref, frame_ref, ppv_ref, p_ref, a_ref = refs[:5]
        refs = refs[5:]
        txp_ref = refs.pop(0) if textured else None
        txb_ref = refs.pop(0) if textured else None
        taabb_ref = refs.pop(0) if cull else None
        state_full_ref, stage_ref, rayin, trout, trouti, lkin, bank = refs[:7]
        refs = refs[7:]
        txin, txbank = ((refs.pop(0), refs.pop(0)) if textured
                        else (None, None))
        trst, trsti = ((refs.pop(0), refs.pop(0)) if cull
                       else (None, None))
        win_t0, win_t1, t_sem = ((refs.pop(0), refs.pop(0), refs.pop(0))
                                 if use_temporal else (None, None, None))
        tile = pl.program_id(0)
        cam = cam_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        pix = tile * C + lane
        ox, oy, oz, dx, dy, dz = build_raygen(cam, width, height)(pix)

        trace = build_trace(p_ref, rayin, trout, trouti, C, TT, T, RS,
                            taabb=taabb_ref, trst=trst, trsti=trsti)
        rows_lookup = build_rows_lookup(lkin, bank, C, RS, _NR_MAX)
        tex = None
        if textured:
            tex = dict(fetch=build_tex_lookup(txin, txbank, C, RS),
                       txp=txp_ref, txb=txb_ref, shapes=tex_shapes)
        surf_lookup = build_surf_lookup(
            lambda idx, rows: rows_lookup(a_ref, T, idx, rows,
                                          lo_map=_A_LO), tex=tex)

        t0, hit0, u0, v0, tri0 = trace(ox, oy, oz, dx, dy, dz)
        surf0 = surf_lookup(tri0, u0, v0)
        em0 = surf0["em"]
        prim_emissive = hit0 & ((em0[0] * em0[0] + em0[1] * em0[1]
                                 + em0[2] * em0[2]) > 0.0)
        shade = hit0 & ~prim_emissive
        px_ = ox + dx * t0
        py_ = oy + dy * t0
        pz_ = oz + dz * t0
        nx, ny, nz = surf0["nx"], surf0["ny"], surf0["nz"]
        vx, vy, vz = -dx, -dy, -dz

        frame = frame_ref[0, 0].astype(jnp.uint32)
        key = _pcg(pix.astype(jnp.uint32))
        key = _fold(key, frame)
        key = _fold(key, _u32(0))
        key = _fold(key, _u32(8001))

        # ---- initial BRDF path sample (restir_gi._trace_sample_path) ----
        key, u_sel = _next_uniform(key)
        key, u1 = _next_uniform(key)
        key, u2 = _next_uniform(key)
        sx, sy, sz, pdf0 = _mixture_sample(u_sel, u1, u2, nx, ny, nz,
                                           vx, vy, vz, surf0["alb"],
                                           surf0["rough"], surf0["metal"])
        f0 = _cook_torrance(nx, ny, nz, vx, vy, vz, sx, sy, sz,
                            surf0["alb"], surf0["rough"], surf0["metal"])
        cos0 = jnp.maximum(sx * nx + sy * ny + sz * nz, 0.0)

        t1, hit1, uu1, vv1, tri1 = trace(px_ + nx * _EPS, py_ + ny * _EPS,
                                         pz_ + nz * _EPS, sx, sy, sz)
        surf1 = surf_lookup(tri1, uu1, vv1, bounce=True)
        reconnect = hit1 & (pdf0 > 0.0)

        # sky contribution of non-reusable paths, shaded now
        fterm = cos0 / jnp.maximum(pdf0, 1e-12)
        sky_direct = tuple(
            jnp.where(~hit1 & (pdf0 > 0.0), f0[c] * fterm * sky[c], 0.0)
            for c in range(3))

        spx = px_ + nx * _EPS + sx * t1
        spy = py_ + ny * _EPS + sy * t1
        spz = pz_ + nz * _EPS + sz * t1

        # path continues from the sample point with unit throughput
        rad = [jnp.zeros((1, C), jnp.float32) for _ in range(3)]
        em1 = surf1["em"]
        em1_hit = (em1[0] * em1[0] + em1[1] * em1[1]
                   + em1[2] * em1[2]) > 0.0
        active = reconnect
        for c in range(3):
            rad[c] = rad[c] + jnp.where(active & em1_hit, em1[c], 0.0)
        active = active & ~em1_hit

        if bounces > 1:
            zc = jnp.zeros((1, C), jnp.float32)

            def bounce_body(_b, st):
                (key, act_f, thr, rad, surf, hx, hy, hz,
                 cdx, cdy, cdz) = st
                act = act_f > 0.5
                bvx, bvy, bvz = -cdx, -cdy, -cdz
                bnx, bny, bnz = surf["nx"], surf["ny"], surf["nz"]
                key, s1 = _next_uniform(key)
                key, s2 = _next_uniform(key)
                key, s3 = _next_uniform(key)
                lx, ly, lz, pdf = _mixture_sample(
                    s1, s2, s3, bnx, bny, bnz, bvx, bvy, bvz,
                    surf["alb"], surf["rough"], surf["metal"])
                f = _cook_torrance(bnx, bny, bnz, bvx, bvy, bvz, lx, ly, lz,
                                   surf["alb"], surf["rough"], surf["metal"])
                cos_t = jnp.maximum(lx * bnx + ly * bny + lz * bnz, 0.0)
                ok = pdf > 0.0
                scale = cos_t / jnp.maximum(pdf, 1e-12)
                thr = tuple(thr[c] * f[c] * scale for c in range(3))
                act = act & ok

                nox = hx + bnx * _EPS
                noy = hy + bny * _EPS
                noz = hz + bnz * _EPS
                t, hit, uu, vv, tri = trace(nox, noy, noz, lx, ly, lz)
                surf2 = surf_lookup(tri, uu, vv, bounce=True)
                miss = ~hit
                rad = tuple(rad[c] + jnp.where(act & miss,
                                               thr[c] * sky[c], 0.0)
                            for c in range(3))
                act = act & hit
                em = surf2["em"]
                em_hit = (em[0] * em[0] + em[1] * em[1]
                          + em[2] * em[2]) > 0.0
                rad = tuple(rad[c] + jnp.where(act & em_hit,
                                               thr[c] * em[c], 0.0)
                            for c in range(3))
                act = act & ~em_hit
                surf_n = dict(nx=surf2["nx"], ny=surf2["ny"], nz=surf2["nz"],
                              alb=surf2["alb"], rough=surf2["rough"],
                              metal=surf2["metal"])
                return (key, act.astype(jnp.float32), thr, rad, surf_n,
                        nox + lx * t, noy + ly * t, noz + lz * t,
                        lx, ly, lz)

            surf1c = dict(nx=surf1["nx"], ny=surf1["ny"], nz=surf1["nz"],
                          alb=surf1["alb"], rough=surf1["rough"],
                          metal=surf1["metal"])
            st = jax.lax.fori_loop(
                0, bounces - 1, bounce_body,
                (key, active.astype(jnp.float32),
                 (zc + 1.0, zc + 1.0, zc + 1.0), tuple(rad), surf1c,
                 spx, spy, spz, sx, sy, sz), unroll=False)
            key, rad = st[0], list(st[3])

        rad = [jnp.where(reconnect, rad[c], 0.0) for c in range(3)]
        src_pdf = jnp.where(reconnect, pdf0, 0.0)
        sample = dict(sp=(spx, spy, spz),
                      sn=(surf1["nx"], surf1["ny"], surf1["nz"]),
                      rad=tuple(rad))

        p_hat = _rad_norm(rad)
        z1 = jnp.zeros((1, C), jnp.float32)
        res = dict(sp=(z1,) * 3, sn=(z1,) * 3, rad=(z1,) * 3,
                   phat=z1, w=z1, m=z1, wsum=z1)
        key, u0_ = _next_uniform(key)
        w_ris = jnp.where(src_pdf > 0.0,
                          p_hat / jnp.maximum(src_pdf, 1e-12), 0.0)
        res = _gi_res_update(res, sample, w_ris, 1.0, p_hat, u0_, shade)
        res["w"] = _w_of(res)

        if use_temporal:
            # temporal reprojection via prev proj@view — same windowed
            # prev-state fetch as the DI megakernel (see its K1 comment)
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
                    state_full_ref.at[pl.ds(q * _GST_ROWS, _GST_ROWS), :],
                    win, t_sem)
                dma.start()
                dma.wait()
                return win[:]

            b0 = pltpu.roll(read_state(q0, win_t0), (C - r_sh) % C, axis=1)
            b1 = pltpu.roll(read_state(q1, win_t1), (C - r_sh) % C, axis=1)
            st_ = jnp.where(lane < C - r_sh, b0, b1)
            exact = (sc + lane) == prev_pix

            def srow(r):
                return st_[r:r + 1, :]

            prev = dict(sp=(srow(_GT_SP), srow(_GT_SP + 1), srow(_GT_SP + 2)),
                        sn=(srow(_GT_SN), srow(_GT_SN + 1), srow(_GT_SN + 2)),
                        rad=(srow(_GT_RAD), srow(_GT_RAD + 1),
                             srow(_GT_RAD + 2)),
                        phat=srow(_GT_PHAT), w=srow(_GT_W), m=srow(_GT_M),
                        wsum=srow(_GT_WSUM))
            pn = (srow(_GT_NRM), srow(_GT_NRM + 1), srow(_GT_NRM + 2))
            valid = ((pn[0] * nx + pn[1] * ny + pn[2] * nz) >= 0.99) \
                & (prev["m"] > 0.0) & shade & exact
            cap = hist * jnp.maximum(res["m"], 1.0)
            prev_m = jnp.minimum(prev["m"], cap)
            key, ut = _next_uniform(key)
            merged = _gi_res_update(res, prev,
                                    prev["phat"] * prev["w"] * prev_m,
                                    prev_m, prev["phat"], ut, valid)
            merged["w"] = _w_of(merged)

            def vsel(a, b):
                return jnp.where(valid, a, b)

            res = dict(
                sp=tuple(vsel(merged["sp"][c], res["sp"][c])
                         for c in range(3)),
                sn=tuple(vsel(merged["sn"][c], res["sn"][c])
                         for c in range(3)),
                rad=tuple(vsel(merged["rad"][c], res["rad"][c])
                          for c in range(3)),
                phat=vsel(merged["phat"], res["phat"]),
                w=vsel(merged["w"], res["w"]),
                m=vsel(merged["m"], res["m"]),
                wsum=vsel(merged["wsum"], res["wsum"]))

        # row order must follow the _GS_* indices (dim-0 concat only)
        stage_ref[:] = jnp.concatenate([
            px_, py_, pz_,                                    # _GS_POS
            nx, ny, nz,                                       # _GS_NRM
            surf0["alb"][0], surf0["alb"][1], surf0["alb"][2],
            surf0["rough"], surf0["metal"],
            jnp.where(hit0, t0, -1.0),                        # _GS_T
            shade.astype(jnp.float32),
            em0[0], em0[1], em0[2],                           # _GS_EMIT
            hit0.astype(jnp.float32),
            sky_direct[0], sky_direct[1], sky_direct[2],      # _GS_SKY
            res["sp"][0], res["sp"][1], res["sp"][2],         # _GS_SP
            res["sn"][0], res["sn"][1], res["sn"][2],         # _GS_SN
            res["rad"][0], res["rad"][1], res["rad"][2],      # _GS_RAD
            res["phat"], res["w"], res["m"], res["wsum"],
            jnp.zeros((_GS_ROWS - 33, C), jnp.float32),       # pad
        ], axis=0)

    # ------------------------------------------------------------------ K2
    # K2 is SPLIT: K2a does the neighbor-window DMAs + reconnection math
    # (straight-line, no loops), K2b does the batched visibility trace +
    # reservoir merges + shade (loops, no DMAs).  Measured: fori_loop
    # iterations cost ~1.7 us in a kernel that also issues manual DMAs vs
    # ~0.3 us without (PERF.md) — keeping the trace loops and the DMAs in
    # separate kernels recovers the fast loops.

    # nbuf rows (K2a -> K2b), ATTRIBUTE-MAJOR: attribute r's values for
    # all neighbors live at rows [r*_NBP, r*_NBP + N_NBR) — K2b's batched
    # visibility trace then reads each ray component as ONE contiguous
    # 8-aligned (N_NBR, C) slice instead of concatenating strided rows
    _NB_O = 0      # 0:3  visibility-ray origin
    _NB_D = 3      # 3:6  visibility-ray direction
    _NB_DIST = 6   # |sample point -> our visible point|
    _NB_PN = 7     # p̂ after Jacobian (pre-visibility)
    _NB_OK = 8     # geometric acceptance
    _NB_W = 9
    _NB_M = 10
    _NB_SP = 11    # 11:14
    _NB_SN = 14    # 14:17
    _NB_RAD = 17   # 17:20
    _NB_ROWS = 20
    # neighbors padded up to a sublane-tile multiple (>= N_NBR, so large
    # settings.spatial_neighbors doesn't underflow the pad row count)
    _NBP = max(8, -(-N_NBR // 8) * 8)

    def k2a(offs_ref, own_ref, stage_full_ref, nbuf_ref, win0, win1,
            dma_sem):
        tile = pl.program_id(0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        pix = tile * C + lane
        px_i = pix % width
        py_i = pix // width

        def read_stage(q, win):
            dma = pltpu.make_async_copy(
                stage_full_ref.at[pl.ds(q * _GS_ROWS, _GS_ROWS), :], win,
                dma_sem)
            dma.start()
            dma.wait()
            return win[:]

        def row(r):
            return own_ref[r:r + 1, :]

        pxp, pyp, pzp = row(_GS_POS), row(_GS_POS + 1), row(_GS_POS + 2)
        nx, ny, nz = row(_GS_NRM), row(_GS_NRM + 1), row(_GS_NRM + 2)
        shade = row(_GS_SHADE) > 0.5
        t_own = row(_GS_T)

        blocks = []
        for nidx in range(N_NBR):
            d_x = offs_ref[nidx, 0]
            d_y = offs_ref[nidx, 1]
            off = d_y * width + d_x
            s = tile * C + off
            sc = jnp.clip(s, 0, B - C)
            q0 = sc // C
            r_sh = sc - q0 * C
            q1 = jnp.minimum(q0 + 1, G - 1)
            b0 = pltpu.roll(read_stage(q0, win0), (C - r_sh) % C, axis=1)
            b1 = pltpu.roll(read_stage(q1, win1), (C - r_sh) % C, axis=1)
            nb = jnp.where(lane < C - r_sh, b0, b1)

            ox_i = px_i + d_x
            oy_i = py_i + d_y
            in_img = (ox_i >= 0) & (ox_i < width) & (oy_i >= 0) \
                & (oy_i < height)
            intended = s == sc

            def nrow(r):
                return nb[r:r + 1, :]

            n_t = nrow(_GS_T)
            depth_ok = (n_t <= 1.1 * t_own) & (n_t >= 0.9 * t_own)
            normal_ok = (nrow(_GS_NRM) * nx + nrow(_GS_NRM + 1) * ny
                         + nrow(_GS_NRM + 2) * nz) >= 0.906
            ok = shade & in_img & intended & depth_ok & normal_ok \
                & (nrow(_GS_SHADE) > 0.5) & (nrow(_GS_M) > 0.0)

            spn = (nrow(_GS_SP), nrow(_GS_SP + 1), nrow(_GS_SP + 2))
            snn = (nrow(_GS_SN), nrow(_GS_SN + 1), nrow(_GS_SN + 2))
            radn = (nrow(_GS_RAD), nrow(_GS_RAD + 1), nrow(_GS_RAD + 2))

            # Jacobian of path reconnection (eq. 11, Renderer.cu:2343-2353)
            dqx = nrow(_GS_POS) - spn[0]
            dqy = nrow(_GS_POS + 1) - spn[1]
            dqz = nrow(_GS_POS + 2) - spn[2]
            drx = pxp - spn[0]
            dry = pyp - spn[1]
            drz = pzp - spn[2]
            dist_q = jnp.sqrt(jnp.maximum(
                dqx * dqx + dqy * dqy + dqz * dqz, 1e-20))
            dist_r = jnp.sqrt(jnp.maximum(
                drx * drx + dry * dry + drz * drz, 1e-20))
            cos_q = (snn[0] * dqx + snn[1] * dqy + snn[2] * dqz) / dist_q
            cos_r = (snn[0] * drx + snn[1] * dry + snn[2] * drz) / dist_r
            jac = jnp.where(cos_q > 0.0,
                            cos_r / jnp.maximum(cos_q, 1e-12), 0.0) \
                * (dist_q * dist_q) / jnp.maximum(dist_r * dist_r, 1e-20)
            p_n = jnp.where(jac > 0.0,
                            _rad_norm(radn) / jnp.maximum(jac, 1e-12), 0.0)

            blocks.append([
                spn[0] + snn[0] * _EPS, spn[1] + snn[1] * _EPS,
                spn[2] + snn[2] * _EPS,                       # _NB_O
                drx / dist_r, dry / dist_r, drz / dist_r,     # _NB_D
                dist_r, p_n, ok.astype(jnp.float32),
                nrow(_GS_W), nrow(_GS_M),
                spn[0], spn[1], spn[2],
                snn[0], snn[1], snn[2],
                radn[0], radn[1], radn[2],
            ])
        # attribute-major emit: rows [r*_NBP, r*_NBP+N_NBR) = attribute r
        # across neighbors (pad rows keep (N_NBR, C) slices 8-aligned)
        pad = jnp.zeros((_NBP - N_NBR, C), jnp.float32)
        out_rows = []
        for r in range(_NB_ROWS):
            out_rows.extend([b[r] for b in blocks])
            if _NBP > N_NBR:
                out_rows.append(pad)
        nbuf_ref[:] = jnp.concatenate(out_rows, axis=0)

    def k2b(*refs):
        refs = list(refs)
        cam_ref, frame_ref, p_ref = refs[:3]
        refs = refs[3:]
        taabb_ref = refs.pop(0) if cull else None
        stage_full_ref = refs.pop(0)               # HBM (pl.ANY)
        nbuf_full_ref = (refs.pop(0)
                         if use_spatial and N_NBR > 0 else None)  # HBM
        (hdr_ref, state_ref, rayin, distst, occst, occout,
         own_win, nb_win, dma_sem) = refs
        tile = pl.program_id(0)
        cam = cam_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        pix = tile * C + lane
        shadow_visible = build_shadow_trace(p_ref, rayin, distst, occst,
                                            occout, C, TT, T, RS,
                                            taabb=taabb_ref)

        # stage + neighbor tiles arrive via TWO manual DMAs instead of
        # blocked in_specs: per-grid-step blocked-buffer overhead was the
        # dominant ReSTIR megakernel cost (measured: the DI K1 state
        # blocked->ANY conversion alone took DI 0.71 -> 0.21 ms/frame)
        own_dma = pltpu.make_async_copy(
            stage_full_ref.at[pl.ds(tile * _GS_ROWS, _GS_ROWS), :],
            own_win, dma_sem)
        own_dma.start()
        own_dma.wait()
        if nbuf_full_ref is not None:
            nb_rows = _NB_ROWS * _NBP
            nb_dma = pltpu.make_async_copy(
                nbuf_full_ref.at[pl.ds(tile * nb_rows, nb_rows), :],
                nb_win, dma_sem)
            nb_dma.start()
            nb_dma.wait()

        def row(r):
            return own_win[r:r + 1, :]

        pxp, pyp, pzp = row(_GS_POS), row(_GS_POS + 1), row(_GS_POS + 2)
        nx, ny, nz = row(_GS_NRM), row(_GS_NRM + 1), row(_GS_NRM + 2)
        alb = (row(_GS_ALB), row(_GS_ALB + 1), row(_GS_ALB + 2))
        rough = row(_GS_ROUGH)
        metal = row(_GS_METAL)
        shade = row(_GS_SHADE) > 0.5
        own_hit = row(_GS_HIT)
        own_emit = (row(_GS_EMIT), row(_GS_EMIT + 1), row(_GS_EMIT + 2))
        sky_direct = (row(_GS_SKY), row(_GS_SKY + 1), row(_GS_SKY + 2))
        res = dict(sp=(row(_GS_SP), row(_GS_SP + 1), row(_GS_SP + 2)),
                   sn=(row(_GS_SN), row(_GS_SN + 1), row(_GS_SN + 2)),
                   rad=(row(_GS_RAD), row(_GS_RAD + 1), row(_GS_RAD + 2)),
                   phat=row(_GS_PHAT), w=row(_GS_W), m=row(_GS_M),
                   wsum=row(_GS_WSUM))

        ox, oy, oz, dx, dy, dz = build_raygen(cam, width, height)(pix)
        vx, vy, vz = -dx, -dy, -dz

        frame = frame_ref[0, 0].astype(jnp.uint32)
        key = _pcg(pix.astype(jnp.uint32))
        key = _fold(key, frame)
        key = _fold(key, _u32(0))
        key = _fold(key, _u32(8002))

        if use_spatial and N_NBR > 0:
            def nbrow(nidx, r):
                return nb_win[r * _NBP + nidx:r * _NBP + nidx + 1, :]

            # perf-probe A/B (benchmarks/probe_restir.py passes this
            # explicitly; never read from the environment at trace time)
            split_vis = probe_split_vis

            z = jnp.where(shade, res["m"], 0.0)
            vis_rows = None
            if split_vis:
                # A/B experiment: N one-row shadow traces instead of one
                # rr=N batch (rr=1 traces measure near-free, rr>=5 don't)
                vis_rows = [shadow_visible(
                    nbrow(n, _NB_O), nbrow(n, _NB_O + 1), nbrow(n, _NB_O + 2),
                    nbrow(n, _NB_D), nbrow(n, _NB_D + 1), nbrow(n, _NB_D + 2),
                    nbrow(n, _NB_DIST)) for n in range(N_NBR)]
            for base in range(0, N_NBR, RS):
                grp = list(range(base, min(base + RS, N_NBR)))
                # attribute-major nbuf: each ray component is ONE aligned
                # contiguous (len(grp), C) slice
                cat = lambda r: nb_win[r * _NBP + base:
                                       r * _NBP + base + len(grp), :]
                # batched visibility re-trace: neighbor sample point ->
                # our visible point (Renderer.cu:2356-2366) — shadow
                # trace (occlusion-only, |t-dist|<=tol acceptance)
                if not split_vis:
                    vis = shadow_visible(cat(_NB_O), cat(_NB_O + 1),
                                         cat(_NB_O + 2), cat(_NB_D),
                                         cat(_NB_D + 1), cat(_NB_D + 2),
                                         cat(_NB_DIST))
                for gi_, n in enumerate(grp):
                    visible = (vis_rows[n] if split_vis
                               else vis[gi_:gi_ + 1, :])
                    p_n = jnp.where(visible, nbrow(n, _NB_PN), 0.0)
                    ok = nbrow(n, _NB_OK) > 0.5
                    nb_w = nbrow(n, _NB_W)
                    nb_m = nbrow(n, _NB_M)
                    ns = dict(sp=(nbrow(n, _NB_SP), nbrow(n, _NB_SP + 1),
                                  nbrow(n, _NB_SP + 2)),
                              sn=(nbrow(n, _NB_SN), nbrow(n, _NB_SN + 1),
                                  nbrow(n, _NB_SN + 2)),
                              rad=(nbrow(n, _NB_RAD), nbrow(n, _NB_RAD + 1),
                                   nbrow(n, _NB_RAD + 2)))
                    z = z + jnp.where(ok, nb_m, 0.0)
                    key, u_acc = _next_uniform(key)
                    res = _gi_res_update(res, ns, p_n * nb_w * nb_m, nb_m,
                                         p_n, u_acc, ok)

            # paper eq. 7 with Z (restir_gi parity)
            p_sel = res["phat"]
            res["w"] = jnp.where(
                p_sel > 0.0,
                res["wsum"] / (jnp.maximum(z, 1.0)
                               * jnp.where(p_sel > 0.0, p_sel, 1.0)),
                0.0)

        # ---- shade (restir_gi._shade parity) -------------------------------
        tsx = res["sp"][0] - pxp
        tsy = res["sp"][1] - pyp
        tsz = res["sp"][2] - pzp
        dist = jnp.sqrt(jnp.maximum(tsx * tsx + tsy * tsy + tsz * tsz,
                                    1e-20))
        sdx, sdy, sdz = tsx / dist, tsy / dist, tsz / dist
        f = _cook_torrance(nx, ny, nz, vx, vy, vz, sdx, sdy, sdz,
                           alb, rough, metal)
        cos_t = jnp.maximum(sdx * nx + sdy * ny + sdz * nz, 0.0)
        lane_ok = shade & (res["w"] > 0.0)

        miss = own_hit < 0.5
        prim_em = (~shade) & ~miss
        rows_hdr = []
        for c in range(3):
            gi = jnp.where(lane_ok,
                           f[c] * cos_t * res["w"] * res["rad"][c], 0.0)
            v = gi + jnp.where(shade, sky_direct[c], 0.0)
            v = jnp.where(miss, sky[c], v)
            v = jnp.where(prim_em, own_emit[c], v)
            rows_hdr.append(v)
        hdr_ref[:] = jnp.concatenate(
            rows_hdr + [jnp.zeros((5, C), jnp.float32)], axis=0)

        state_ref[:] = jnp.concatenate([
            res["sp"][0], res["sp"][1], res["sp"][2],
            res["sn"][0], res["sn"][1], res["sn"][2],
            res["rad"][0], res["rad"][1], res["rad"][2],
            res["phat"], res["w"], res["m"], res["wsum"],
            nx, ny, nz,
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

    def k1_call(cam, frame_arr, ppv, P, AT, state, TXP=None, TXB=None,
                TAABB=None):
        in_specs = [
            pl.BlockSpec((8, 4), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), full, memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 4), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 16), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((_A_ROWS_TOT, T), full, memory_space=pltpu.VMEM),
        ]
        args = [cam, frame_arr, ppv, P, AT]
        k1_scratches = list(scratches)
        if textured:
            (khp, hp, wp), (khb, hb, wb) = tex_shapes
            in_specs.append(pl.BlockSpec((3 * wp + (-3 * wp) % 8, khp),
                                         full, memory_space=pltpu.VMEM))
            in_specs.append(pl.BlockSpec((3 * wb + (-3 * wb) % 8, khb),
                                         full, memory_space=pltpu.VMEM))
            args.extend([TXP, TXB])
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
        if use_temporal:
            k1_scratches += [
                pltpu.VMEM((_GST_ROWS, C), jnp.float32),  # win_t0
                pltpu.VMEM((_GST_ROWS, C), jnp.float32),  # win_t1
                pltpu.SemaphoreType.DMA(()),
            ]
        # prev-frame state stays in HBM (reprojection reads a DMA window)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        args.append(state)
        return pl.pallas_call(
            k1, grid=grid,
            in_specs=in_specs,
            out_specs=blocked(_GS_ROWS),
            out_shape=jax.ShapeDtypeStruct((G * _GS_ROWS, C), jnp.float32),
            scratch_shapes=k1_scratches,
            interpret=interpret,
        )(*args)

    def k2a_call(offs, stage):
        return pl.pallas_call(
            k2a, grid=grid,
            in_specs=[
                pl.BlockSpec((max(N_NBR, 1), 2), full,
                             memory_space=pltpu.SMEM),
                blocked(_GS_ROWS),                   # own tile
                pl.BlockSpec(memory_space=pl.ANY),   # stage stays in HBM
            ],
            out_specs=blocked(_NB_ROWS * _NBP),
            out_shape=jax.ShapeDtypeStruct((G * _NB_ROWS * _NBP, C),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((_GS_ROWS, C), jnp.float32),   # win0
                pltpu.VMEM((_GS_ROWS, C), jnp.float32),   # win1
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=interpret,
        )(offs, stage, stage)

    def k2b_call(cam, frame_arr, P, stage, nbuf, TAABB=None):
        spatial = use_spatial and N_NBR > 0
        in_specs = [
            pl.BlockSpec((8, 4), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), full, memory_space=pltpu.SMEM),
            pl.BlockSpec((T, 16), full, memory_space=pltpu.VMEM),
        ]
        args = [cam, frame_arr, P]
        if cull:
            in_specs.append(pl.BlockSpec((n_tiles, 8), full,
                                         memory_space=pltpu.SMEM))
            args.append(TAABB)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # stage (HBM)
        args.append(stage)
        if spatial:
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # nbuf
            args.append(nbuf)
        return pl.pallas_call(
            k2b, grid=grid,
            in_specs=in_specs,
            out_specs=[blocked(8), blocked(_GST_ROWS)],
            out_shape=[jax.ShapeDtypeStruct((G * 8, C), jnp.float32),
                       jax.ShapeDtypeStruct((G * _GST_ROWS, C),
                                            jnp.float32)],
            scratch_shapes=[
                pltpu.VMEM((6 * RS, C), jnp.float32),   # rayin
                pltpu.VMEM((RS, C), jnp.float32),       # distst
                pltpu.VMEM((8, C), jnp.float32),        # occst
                pltpu.VMEM((RS, C), jnp.float32),       # occout
                pltpu.VMEM((_GS_ROWS, C), jnp.float32),          # own_win
                pltpu.VMEM((_NB_ROWS * _NBP, C), jnp.float32),   # nb_win
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=interpret,
        )(*args)

    @jax.jit
    def render(cam, P, AT, frame0, state, ppv0=None, ppv1=None, TXP=None,
               TXB=None, TAABB=None):
        # ppv0/ppv1: see the DI megakernel driver
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
            stage = k1_call(cam, frame_arr, ppv_pad, P, AT, st, TXP, TXB,
                            TAABB)
            okey = host_rng.path_key(jnp.uint32(0xD1CE), frame, 0,
                                     stream=8002)
            offs = []
            for _ in range(max(N_NBR, 1)):
                okey, ux = host_rng.next_uniform(okey)
                okey, uy = host_rng.next_uniform(okey)
                offs.append(((ux * 2.0 - 1.0) * radius).astype(jnp.int32))
                offs.append(((uy * 2.0 - 1.0) * radius).astype(jnp.int32))
            offs = jnp.stack(offs).reshape(max(N_NBR, 1), 2)
            nbuf = None
            if use_spatial and N_NBR > 0:
                nbuf = k2a_call(offs, stage)
            hdr, st2 = k2b_call(cam, frame_arr, P, stage, nbuf, TAABB)
            return accum + hdr, st2

        accum0 = jnp.zeros((G * 8, C), jnp.float32)
        accum, state = jax.lax.fori_loop(0, n_frames, body, (accum0, state))
        hdr = accum.reshape(G, 8, C)[:, :3, :].transpose(0, 2, 1)
        return hdr.reshape(B, 3), state

    return render


def make_restir_gi_mono(width: int, height: int, settings, n_tris: int,
                        n_frames: int, tex_shapes=None, cull: bool = False,
                        sparse: bool | None = None,
                        hbm_tables: bool | None = None,
                        interpret: bool = False, final_vis: bool = False,
                        probe_fake_vis: bool = False,
                        probe_no_vis: bool = False,
                        probe_closest_vis: bool = False):
    """MONO ReSTIR GI: the whole frame in ONE heavy kernel.

    Estimator deviation vs the 3-kernel pipeline (documented): spatial
    neighbors are merged from the PREVIOUS frame's stage-1 reservoirs
    (lagged spatiotemporal reuse — standard in real-time ReSTIR; the
    sequential Pallas grid cannot give same-frame cross-tile reads inside
    one kernel).  1/Z bias accounting is unchanged, so the estimator
    stays unbiased; frame 1 simply has no spatial neighbors.

    ``final_vis=False`` (default): the reference's per-neighbor
    visibility rejection (Renderer.cu:2356-2366), batched into one rr=N
    sweep.  ``final_vis=True`` is the OPT-IN speed mode: spatial
    neighbors merge with the no-visibility target pdf — the original
    ReSTIR RIS formulation (Bitterli et al. 2020, Alg. 3) — and ONE
    visibility sweep on the SELECTED sample gates the final shade.
    Tradeoff: occluded winners are discarded instead of never entering
    the reservoir (the standard ReSTIR visibility-darkening bias, mean
    <= 6% on the room scene, tests/test_room.py); cost drops from 5
    sweeps to 1 (~1.7x cheaper per frame true on v5e, BASELINE.md r4).

    Measured cost anatomy (PERF.md #18, #18b-c): rr=1 trace loops inside
    the K1 section run at ~full VPU speed; any sweep in the spatial
    section costs ~1.2-1.4 ms/frame regardless of builder, batching,
    carries, code size, or DMA structure — hence exactly one there.

    Returns ``render(cam, P, AT, frame0, state, stage, ppv0, ppv1,
    [TXP, TXB], [TAABB]) -> (summed hdr, new_state, new_stage)``.
    """
    B = width * height
    C = _pick_ray_lanes(B)
    TT = TRI_TILE
    T = n_tris + ((-n_tris) % TT)
    G = B // C
    RS = _RS
    n_tiles = T // TT
    textured = tex_shapes is not None
    sky = tuple(float(c) for c in settings.sky_color)
    bounces = settings.bounces
    N_NBR = settings.spatial_neighbors if settings.spatial_reuse else 0
    radius = float(settings.spatial_radius)
    hist = float(settings.temporal_history_limit)
    use_temporal = settings.temporal_reuse
    # big-scene path (same thresholds/design as megakernel.py): sparse
    # bundle-interval traces over HBM-resident P/AT tables
    if sparse is None:
        sparse = T >= 32768
    if hbm_tables is None:
        hbm_tables = T >= 32768
    if hbm_tables:
        assert sparse, "HBM-resident tables require the sparse trace"
    if sparse:
        cull = False
    NT = max(((n_tiles + 127) // 128) * 128, 128)
    _, lk_csz = _lookup_chunk(T)

    def kernel(*refs):
        refs = list(refs)
        cam_ref, frame_ref, ppv_ref, offs_ref, p_ref, a_ref = refs[:6]
        refs = refs[6:]
        txp_ref = refs.pop(0) if textured else None
        txb_ref = refs.pop(0) if textured else None
        taabb_ref = refs.pop(0) if cull else None
        tbox_ref = refs.pop(0) if sparse else None
        state_prev_ref = refs.pop(0)     # ANY (HBM)
        stage_prev_ref = refs.pop(0)     # ANY (HBM)
        (hdr_ref, state_ref, stage_ref, rayin, trout, trouti, lkin,
         bank) = refs[:8]
        refs = refs[8:]
        txin, txbank = ((refs.pop(0), refs.pop(0)) if textured
                        else (None, None))
        trst, trsti = ((refs.pop(0), refs.pop(0)) if cull
                       else (None, None))
        (distst, occst, occout, nwin, nb_sems, win_t0, win_t1,
         dma_sem) = refs[:8]
        refs = refs[8:]
        candst = refs.pop(0) if sparse else None
        if hbm_tables:
            p_hbm = (refs.pop(0), refs.pop(0), refs.pop(0), refs.pop(0))
            a_hbm = (refs.pop(0), refs.pop(0))
        else:
            p_hbm = a_hbm = None

        tile = pl.program_id(0)
        cam = cam_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        pix = tile * C + lane
        px_i = pix % width
        py_i = pix // width
        ox, oy, oz, dx, dy, dz = build_raygen(cam, width, height)(pix)

        if sparse:
            trace = build_trace_sparse(p_ref, tbox_ref, rayin, trout,
                                       trouti, candst, C, TT, T, RS,
                                       p_hbm=p_hbm)
            shadow_visible = build_shadow_trace_sparse(
                p_ref, tbox_ref, rayin, distst, occout, candst, C, TT, T,
                RS, p_hbm=p_hbm)
        else:
            trace = build_trace(p_ref, rayin, trout, trouti, C, TT, T, RS,
                                taabb=taabb_ref, trst=trst, trsti=trsti)
            shadow_visible = build_shadow_trace(p_ref, rayin, distst,
                                                occst, occout, C, TT, T,
                                                RS, taabb=taabb_ref)
        rows_lookup = build_rows_lookup(lkin, bank, C, RS, _NR_MAX)
        tex = None
        if textured:
            tex = dict(fetch=build_tex_lookup(txin, txbank, C, RS),
                       txp=txp_ref, txb=txb_ref, shapes=tex_shapes)
        surf_lookup = build_surf_lookup(
            lambda idx, rows: rows_lookup(a_ref, T, idx, rows,
                                          lo_map=_A_LO, hbm=a_hbm), tex=tex)

        # ---- primary + initial path sample (as K1) ----------------------
        t0, hit0, u0, v0, tri0 = trace(ox, oy, oz, dx, dy, dz)
        surf0 = surf_lookup(tri0, u0, v0)
        em0 = surf0["em"]
        prim_emissive = hit0 & ((em0[0] * em0[0] + em0[1] * em0[1]
                                 + em0[2] * em0[2]) > 0.0)
        shade = hit0 & ~prim_emissive
        px_ = ox + dx * t0
        py_ = oy + dy * t0
        pz_ = oz + dz * t0
        nx, ny, nz = surf0["nx"], surf0["ny"], surf0["nz"]
        vx, vy, vz = -dx, -dy, -dz

        frame = frame_ref[0, 0].astype(jnp.uint32)
        key = _pcg(pix.astype(jnp.uint32))
        key = _fold(key, frame)
        key = _fold(key, _u32(0))
        key = _fold(key, _u32(8001))

        key, u_sel = _next_uniform(key)
        key, u1 = _next_uniform(key)
        key, u2 = _next_uniform(key)
        sx, sy, sz, pdf0 = _mixture_sample(u_sel, u1, u2, nx, ny, nz,
                                           vx, vy, vz, surf0["alb"],
                                           surf0["rough"], surf0["metal"])
        f0 = _cook_torrance(nx, ny, nz, vx, vy, vz, sx, sy, sz,
                            surf0["alb"], surf0["rough"], surf0["metal"])
        cos0 = jnp.maximum(sx * nx + sy * ny + sz * nz, 0.0)
        t1, hit1, uu1, vv1, tri1 = trace(px_ + nx * _EPS, py_ + ny * _EPS,
                                         pz_ + nz * _EPS, sx, sy, sz)
        surf1 = surf_lookup(tri1, uu1, vv1, bounce=True)
        reconnect = hit1 & (pdf0 > 0.0)
        fterm = cos0 / jnp.maximum(pdf0, 1e-12)
        sky_direct = tuple(
            jnp.where(~hit1 & (pdf0 > 0.0), f0[c] * fterm * sky[c], 0.0)
            for c in range(3))
        spx = px_ + nx * _EPS + sx * t1
        spy = py_ + ny * _EPS + sy * t1
        spz = pz_ + nz * _EPS + sz * t1

        rad = [jnp.zeros((1, C), jnp.float32) for _ in range(3)]
        em1 = surf1["em"]
        em1_hit = (em1[0] * em1[0] + em1[1] * em1[1]
                   + em1[2] * em1[2]) > 0.0
        active = reconnect
        for c in range(3):
            rad[c] = rad[c] + jnp.where(active & em1_hit, em1[c], 0.0)
        active = active & ~em1_hit

        if bounces > 1:
            zc = jnp.zeros((1, C), jnp.float32)

            def bounce_body(_b, st):
                (key, act_f, thr, rad, surf, hx, hy, hz,
                 cdx, cdy, cdz) = st
                act = act_f > 0.5
                bvx, bvy, bvz = -cdx, -cdy, -cdz
                bnx, bny, bnz = surf["nx"], surf["ny"], surf["nz"]
                key, s1 = _next_uniform(key)
                key, s2 = _next_uniform(key)
                key, s3 = _next_uniform(key)
                lx, ly, lz, pdf = _mixture_sample(
                    s1, s2, s3, bnx, bny, bnz, bvx, bvy, bvz,
                    surf["alb"], surf["rough"], surf["metal"])
                f = _cook_torrance(bnx, bny, bnz, bvx, bvy, bvz, lx, ly, lz,
                                   surf["alb"], surf["rough"], surf["metal"])
                cos_t = jnp.maximum(lx * bnx + ly * bny + lz * bnz, 0.0)
                ok = pdf > 0.0
                scale = cos_t / jnp.maximum(pdf, 1e-12)
                thr = tuple(thr[c] * f[c] * scale for c in range(3))
                act = act & ok
                nox = hx + bnx * _EPS
                noy = hy + bny * _EPS
                noz = hz + bnz * _EPS
                t, hit, uu, vv, tri = trace(nox, noy, noz, lx, ly, lz)
                surf2 = surf_lookup(tri, uu, vv, bounce=True)
                miss = ~hit
                rad = tuple(rad[c] + jnp.where(act & miss,
                                               thr[c] * sky[c], 0.0)
                            for c in range(3))
                act = act & hit
                em = surf2["em"]
                em_hit = (em[0] * em[0] + em[1] * em[1]
                          + em[2] * em[2]) > 0.0
                rad = tuple(rad[c] + jnp.where(act & em_hit,
                                               thr[c] * em[c], 0.0)
                            for c in range(3))
                act = act & ~em_hit
                surf_n = dict(nx=surf2["nx"], ny=surf2["ny"], nz=surf2["nz"],
                              alb=surf2["alb"], rough=surf2["rough"],
                              metal=surf2["metal"])
                return (key, act.astype(jnp.float32), thr, rad, surf_n,
                        nox + lx * t, noy + ly * t, noz + lz * t,
                        lx, ly, lz)

            surf1c = dict(nx=surf1["nx"], ny=surf1["ny"], nz=surf1["nz"],
                          alb=surf1["alb"], rough=surf1["rough"],
                          metal=surf1["metal"])
            st = jax.lax.fori_loop(
                0, bounces - 1, bounce_body,
                (key, active.astype(jnp.float32),
                 (zc + 1.0, zc + 1.0, zc + 1.0), tuple(rad), surf1c,
                 spx, spy, spz, sx, sy, sz), unroll=False)
            key, rad = st[0], list(st[3])

        rad = [jnp.where(reconnect, rad[c], 0.0) for c in range(3)]
        src_pdf = jnp.where(reconnect, pdf0, 0.0)
        sample = dict(sp=(spx, spy, spz),
                      sn=(surf1["nx"], surf1["ny"], surf1["nz"]),
                      rad=tuple(rad))
        p_hat = _rad_norm(rad)
        z1 = jnp.zeros((1, C), jnp.float32)
        res = dict(sp=(z1,) * 3, sn=(z1,) * 3, rad=(z1,) * 3,
                   phat=z1, w=z1, m=z1, wsum=z1)
        key, u0_ = _next_uniform(key)
        w_ris = jnp.where(src_pdf > 0.0,
                          p_hat / jnp.maximum(src_pdf, 1e-12), 0.0)
        res = _gi_res_update(res, sample, w_ris, 1.0, p_hat, u0_, shade)
        res["w"] = _w_of(res)

        # ---- temporal reuse (reprojected prev-state window) --------------
        if use_temporal:
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
            s_ = jnp.clip(tile * C + off, 0, B - C)
            q0 = s_ // C
            r_sh = s_ - q0 * C
            q1 = jnp.minimum(q0 + 1, G - 1)

            def read_state(q, win):
                dma = pltpu.make_async_copy(
                    state_prev_ref.at[pl.ds(q * _GST_ROWS, _GST_ROWS), :],
                    win, dma_sem)
                dma.start()
                dma.wait()
                return win[:]

            b0 = pltpu.roll(read_state(q0, win_t0), (C - r_sh) % C, axis=1)
            b1 = pltpu.roll(read_state(q1, win_t1), (C - r_sh) % C, axis=1)
            st_ = jnp.where(lane < C - r_sh, b0, b1)
            exact = (s_ + lane) == prev_pix

            def srow(r):
                return st_[r:r + 1, :]

            prev = dict(sp=(srow(_GT_SP), srow(_GT_SP + 1), srow(_GT_SP + 2)),
                        sn=(srow(_GT_SN), srow(_GT_SN + 1), srow(_GT_SN + 2)),
                        rad=(srow(_GT_RAD), srow(_GT_RAD + 1),
                             srow(_GT_RAD + 2)),
                        phat=srow(_GT_PHAT), w=srow(_GT_W), m=srow(_GT_M),
                        wsum=srow(_GT_WSUM))
            pn = (srow(_GT_NRM), srow(_GT_NRM + 1), srow(_GT_NRM + 2))
            valid = ((pn[0] * nx + pn[1] * ny + pn[2] * nz) >= 0.99) \
                & (prev["m"] > 0.0) & shade & exact
            cap = hist * jnp.maximum(res["m"], 1.0)
            prev_m = jnp.minimum(prev["m"], cap)
            key, ut = _next_uniform(key)
            merged = _gi_res_update(res, prev,
                                    prev["phat"] * prev["w"] * prev_m,
                                    prev_m, prev["phat"], ut, valid)
            merged["w"] = _w_of(merged)

            def vsel(a, b):
                return jnp.where(valid, a, b)

            res = dict(
                sp=tuple(vsel(merged["sp"][c], res["sp"][c])
                         for c in range(3)),
                sn=tuple(vsel(merged["sn"][c], res["sn"][c])
                         for c in range(3)),
                rad=tuple(vsel(merged["rad"][c], res["rad"][c])
                          for c in range(3)),
                phat=vsel(merged["phat"], res["phat"]),
                w=vsel(merged["w"], res["w"]),
                m=vsel(merged["m"], res["m"]),
                wsum=vsel(merged["wsum"], res["wsum"]))

        # stage OUT = this frame's pre-spatial reservoirs (what neighbors
        # merge NEXT frame) — k1's output semantics
        stage_ref[:] = jnp.concatenate([
            px_, py_, pz_, nx, ny, nz,
            surf0["alb"][0], surf0["alb"][1], surf0["alb"][2],
            surf0["rough"], surf0["metal"],
            jnp.where(hit0, t0, -1.0),
            shade.astype(jnp.float32),
            em0[0], em0[1], em0[2],
            hit0.astype(jnp.float32),
            sky_direct[0], sky_direct[1], sky_direct[2],
            res["sp"][0], res["sp"][1], res["sp"][2],
            res["sn"][0], res["sn"][1], res["sn"][2],
            res["rad"][0], res["rad"][1], res["rad"][2],
            res["phat"], res["w"], res["m"], res["wsum"],
            jnp.zeros((_GS_ROWS - 33, C), jnp.float32),
        ], axis=0)

        # ---- lagged spatial reuse from stage_prev ------------------------
        key = _fold(key, _u32(8002))
        if N_NBR > 0:
            z = jnp.where(shade, res["m"], 0.0)
            # PERF.md #18c: issue ALL neighbor-window DMAs before waiting
            # on any — a dma.start()/wait() pair interleaved between two
            # trace sweeps cost ~1.2 ms per sweep on v5e while the sweeps
            # and the DMAs were each ~free in isolation.  Per-copy
            # semaphore slots avoid wait aliasing.
            copies = []
            for nidx in range(N_NBR):
                d_x = offs_ref[nidx, 0]
                d_y = offs_ref[nidx, 1]
                off2 = d_y * width + d_x
                s2 = jnp.clip(tile * C + off2, 0, B - C)
                q0 = s2 // C
                r_sh = s2 - q0 * C
                q1 = jnp.minimum(q0 + 1, G - 1)
                for j, q in enumerate((q0, q1)):
                    slot = 2 * nidx + j
                    dma = pltpu.make_async_copy(
                        stage_prev_ref.at[pl.ds(q * _GS_ROWS, _GS_ROWS), :],
                        nwin.at[slot * _GS_ROWS:(slot + 1) * _GS_ROWS, :],
                        nb_sems.at[slot])
                    dma.start()
                    copies.append(dma)
            for dma in copies:
                dma.wait()

            # ---- batched visibility (PERF.md #18c) -----------------------
            # (skipped in final_vis mode: neighbors merge with the
            # no-visibility target pdf — the original ReSTIR RIS form,
            # Bitterli 2020 — and ONE sweep on the selected winner gates
            # the final shade.  5x fewer sweeps; the standard visibility
            # darkening tradeoff, documented in the module docstring.)
            # A trace sweep placed PER NEIGHBOR in this merge section
            # costs ~1.2-1.4 ms/frame on v5e regardless of builder
            # (shadow or closest-hit), loop carries, unrolling, code
            # size, DMA interleaving, or ray provenance — measured nbr
            # sweep 0/1/2/5 -> ~0/0.61/2.03/6.32 ms/frame.  So assemble
            # every neighbor's segment ray first (cheap row math), run
            # the sweeps BATCHED rr<=RS (the NEE kernel's fast shape),
            # and merge afterwards with the vis rows extracted by index.
            def nbr_rows_static(nidx):   # noqa: used when not final_vis
                # rolls + row extraction for one neighbor, static nidx
                d_x = offs_ref[nidx, 0]
                d_y = offs_ref[nidx, 1]
                off2 = d_y * width + d_x
                s2 = jnp.clip(tile * C + off2, 0, B - C)
                r_sh = s2 - (s2 // C) * C
                b0 = pltpu.roll(
                    nwin[2 * nidx * _GS_ROWS:(2 * nidx + 1) * _GS_ROWS, :],
                    (C - r_sh) % C, axis=1)
                b1 = pltpu.roll(
                    nwin[(2 * nidx + 1) * _GS_ROWS:
                         (2 * nidx + 2) * _GS_ROWS, :],
                    (C - r_sh) % C, axis=1)
                return jnp.where(lane < C - r_sh, b0, b1)

            rows_o = ([], [], [])
            rows_d = ([], [], [])
            rows_dist = []
            for nidx in ([] if final_vis else range(N_NBR)):
                nbA = nbr_rows_static(nidx)
                spA = (nbA[_GS_SP:_GS_SP + 1, :],
                       nbA[_GS_SP + 1:_GS_SP + 2, :],
                       nbA[_GS_SP + 2:_GS_SP + 3, :])
                snA = (nbA[_GS_SN:_GS_SN + 1, :],
                       nbA[_GS_SN + 1:_GS_SN + 2, :],
                       nbA[_GS_SN + 2:_GS_SN + 3, :])
                drA = (px_ - spA[0], py_ - spA[1], pz_ - spA[2])
                dist_A = jnp.sqrt(jnp.maximum(
                    drA[0] * drA[0] + drA[1] * drA[1] + drA[2] * drA[2],
                    1e-20))
                for c in range(3):
                    rows_o[c].append(spA[c] + snA[c] * _EPS)
                    rows_d[c].append(drA[c] / dist_A)
                rows_dist.append(dist_A)
            if probe_fake_vis:
                # PERF PROBE ONLY (wrong image): synthetic register-
                # derived rays of the same count (PERF.md #18a)
                rows_o = ([px_] * N_NBR, [py_] * N_NBR, [pz_] * N_NBR)
                rows_d = ([nx] * N_NBR, [ny] * N_NBR, [nz] * N_NBR)
                rows_dist = [jnp.full((1, C), 0.5, jnp.float32) + 0.01 * n
                             for n in range(N_NBR)]

            vis_rows = []
            for base in ([] if final_vis else range(0, N_NBR, RS)):
                sl = slice(base, min(base + RS, N_NBR))
                bo = [jnp.concatenate(rows_o[c][sl], axis=0)
                      for c in range(3)]
                bd = [jnp.concatenate(rows_d[c][sl], axis=0)
                      for c in range(3)]
                bdist = jnp.concatenate(rows_dist[sl], axis=0)
                if probe_no_vis:
                    # PERF PROBE ONLY (wrong image): no sweep at all
                    vis_rows.append(jnp.ones_like(bdist))
                elif probe_closest_vis:
                    # PERF PROBE (same image): closest-hit builder in the
                    # shadow builder's role
                    tolB = jnp.maximum(1e-4, bdist * 1e-3)
                    tB, hB, _, _, _ = trace(*bo, *bd)
                    vis_rows.append(
                        (hB & (jnp.abs(tB - bdist) <= tolB))
                        .astype(jnp.float32))
                else:
                    vis_rows.append(
                        shadow_visible(*bo, *bd, bdist)
                        .astype(jnp.float32))
            if not final_vis:
                vis_f = jnp.concatenate(vis_rows, axis=0)  # (N_NBR, C) 0/1
                nbr_iota = jax.lax.broadcasted_iota(jnp.int32,
                                                    (N_NBR, C), 0)

            def nbr_body(nidx, carry):
                z, key, res = carry
                d_x = offs_ref[nidx, 0]
                d_y = offs_ref[nidx, 1]
                off2 = d_y * width + d_x
                s2 = jnp.clip(tile * C + off2, 0, B - C)
                q0 = s2 // C
                r_sh = s2 - q0 * C
                b0 = pltpu.roll(
                    nwin[pl.ds(2 * nidx * _GS_ROWS, _GS_ROWS), :],
                    (C - r_sh) % C, axis=1)
                b1 = pltpu.roll(
                    nwin[pl.ds((2 * nidx + 1) * _GS_ROWS, _GS_ROWS), :],
                    (C - r_sh) % C, axis=1)
                nb = jnp.where(lane < C - r_sh, b0, b1)

                ox_i = px_i + d_x
                oy_i = py_i + d_y
                in_img = (ox_i >= 0) & (ox_i < width) & (oy_i >= 0) \
                    & (oy_i < height)
                intended = (tile * C + off2) == s2

                def nrow(r):
                    return nb[r:r + 1, :]

                n_t = nrow(_GS_T)
                t_own = jnp.where(hit0, t0, -1.0)
                depth_ok = (n_t <= 1.1 * t_own) & (n_t >= 0.9 * t_own)
                normal_ok = (nrow(_GS_NRM) * nx + nrow(_GS_NRM + 1) * ny
                             + nrow(_GS_NRM + 2) * nz) >= 0.906
                ok = shade & in_img & intended & depth_ok & normal_ok \
                    & (nrow(_GS_SHADE) > 0.5) & (nrow(_GS_M) > 0.0)

                spn = (nrow(_GS_SP), nrow(_GS_SP + 1), nrow(_GS_SP + 2))
                snn = (nrow(_GS_SN), nrow(_GS_SN + 1), nrow(_GS_SN + 2))
                radn = (nrow(_GS_RAD), nrow(_GS_RAD + 1), nrow(_GS_RAD + 2))
                dqx = nrow(_GS_POS) - spn[0]
                dqy = nrow(_GS_POS + 1) - spn[1]
                dqz = nrow(_GS_POS + 2) - spn[2]
                drx = px_ - spn[0]
                dry = py_ - spn[1]
                drz = pz_ - spn[2]
                dist_q = jnp.sqrt(jnp.maximum(
                    dqx * dqx + dqy * dqy + dqz * dqz, 1e-20))
                dist_r = jnp.sqrt(jnp.maximum(
                    drx * drx + dry * dry + drz * drz, 1e-20))
                cos_q = (snn[0] * dqx + snn[1] * dqy + snn[2] * dqz) / dist_q
                cos_r = (snn[0] * drx + snn[1] * dry + snn[2] * drz) / dist_r
                jac = jnp.where(cos_q > 0.0,
                                cos_r / jnp.maximum(cos_q, 1e-12), 0.0) \
                    * (dist_q * dist_q) / jnp.maximum(dist_r * dist_r, 1e-20)
                p_n = jnp.where(jac > 0.0,
                                _rad_norm(radn) / jnp.maximum(jac, 1e-12),
                                0.0)
                if not final_vis:
                    vis = jnp.sum(jnp.where(nbr_iota == nidx, vis_f, 0.0),
                                  axis=0, keepdims=True) > 0.5
                    p_n = jnp.where(vis, p_n, 0.0)
                nb_w = nrow(_GS_W)
                nb_m = nrow(_GS_M)
                ns = dict(sp=spn, sn=snn, rad=radn)
                z = z + jnp.where(ok, nb_m, 0.0)
                key, u_acc = _next_uniform(key)
                res = _gi_res_update(res, ns, p_n * nb_w * nb_m, nb_m,
                                     p_n, u_acc, ok)
                return z, key, res

            z, key, res = jax.lax.fori_loop(0, N_NBR, nbr_body,
                                            (z, key, res), unroll=False)

            p_sel = res["phat"]
            res["w"] = jnp.where(
                p_sel > 0.0,
                res["wsum"] / (jnp.maximum(z, 1.0)
                               * jnp.where(p_sel > 0.0, p_sel, 1.0)),
                0.0)

        # ---- shade -------------------------------------------------------
        tsx = res["sp"][0] - px_
        tsy = res["sp"][1] - py_
        tsz = res["sp"][2] - pz_
        dist = jnp.sqrt(jnp.maximum(tsx * tsx + tsy * tsy + tsz * tsz,
                                    1e-20))
        sdx, sdy, sdz = tsx / dist, tsy / dist, tsz / dist
        f = _cook_torrance(nx, ny, nz, vx, vy, vz, sdx, sdy, sdz,
                           surf0["alb"], surf0["rough"], surf0["metal"])
        cos_t = jnp.maximum(sdx * nx + sdy * ny + sdz * nz, 0.0)
        lane_ok = shade & (res["w"] > 0.0)
        if final_vis and N_NBR > 0:
            # one sweep on the selected sample (sample point -> visible
            # point), replacing the per-neighbor sweeps
            vis_sel = shadow_visible(
                res["sp"][0] + res["sn"][0] * _EPS,
                res["sp"][1] + res["sn"][1] * _EPS,
                res["sp"][2] + res["sn"][2] * _EPS,
                -sdx, -sdy, -sdz, dist)
            lane_ok = lane_ok & vis_sel
        miss = ~hit0
        prim_em = prim_emissive
        rows_hdr = []
        for c in range(3):
            gi = jnp.where(lane_ok,
                           f[c] * cos_t * res["w"] * res["rad"][c], 0.0)
            v = gi + jnp.where(shade, sky_direct[c], 0.0)
            v = jnp.where(miss, sky[c], v)
            v = jnp.where(prim_em, em0[c], v)
            rows_hdr.append(v)
        hdr_ref[:] = jnp.concatenate(
            rows_hdr + [jnp.zeros((5, C), jnp.float32)], axis=0)

        state_ref[:] = jnp.concatenate([
            res["sp"][0], res["sp"][1], res["sp"][2],
            res["sn"][0], res["sn"][1], res["sn"][2],
            res["rad"][0], res["rad"][1], res["rad"][2],
            res["phat"], res["w"], res["m"], res["wsum"],
            nx, ny, nz,
        ], axis=0)

    grid = (G,)
    full = lambda i: (0, 0)
    blocked = lambda rows: pl.BlockSpec((rows, C), lambda i: (i, 0),
                                        memory_space=pltpu.VMEM)

    p_spec = (pl.BlockSpec(memory_space=pl.ANY) if hbm_tables
              else pl.BlockSpec((T, 16), full, memory_space=pltpu.VMEM))
    a_spec = (pl.BlockSpec(memory_space=pl.ANY) if hbm_tables
              else pl.BlockSpec((_A_ROWS_TOT, T), full,
                                memory_space=pltpu.VMEM))

    def k_call(cam, frame_arr, ppv, offs, P, AT, state, stage,
               TXP=None, TXB=None, TAABB=None, TBOX=None):
        in_specs = [
            pl.BlockSpec((8, 4), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), full, memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 4), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((max(N_NBR, 1), 2), full, memory_space=pltpu.SMEM),
            p_spec,
            a_spec,
        ]
        args = [cam, frame_arr, ppv, offs, P, AT]
        scr = [
            pltpu.VMEM((6 * RS, C), jnp.float32),        # rayin
            pltpu.VMEM((3 * RS, C), jnp.float32),        # trout
            pltpu.VMEM((RS, C), jnp.int32),              # trouti
            pltpu.VMEM((RS, C), jnp.int32),              # lkin
            pltpu.VMEM((_NR_MAX * RS, C), jnp.float32),  # bank
        ]
        if textured:
            (khp, hp, wp), (khb, hb, wb) = tex_shapes
            in_specs.append(pl.BlockSpec((3 * wp + (-3 * wp) % 8, khp),
                                         full, memory_space=pltpu.VMEM))
            in_specs.append(pl.BlockSpec((3 * wb + (-3 * wb) % 8, khb),
                                         full, memory_space=pltpu.VMEM))
            args.extend([TXP, TXB])
            scr += [pltpu.VMEM((3 * RS, C), jnp.float32),
                    pltpu.VMEM((3 * RS, C), jnp.float32)]
        if cull:
            in_specs.append(pl.BlockSpec((n_tiles, 8), full,
                                         memory_space=pltpu.SMEM))
            args.append(TAABB)
            scr += [pltpu.VMEM((RS, C), jnp.float32),
                    pltpu.VMEM((RS, C), jnp.int32)]
        if sparse:
            in_specs.append(pl.BlockSpec((8, NT), full,
                                         memory_space=pltpu.VMEM))
            args.append(TBOX)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))   # state_prev
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))   # stage_prev
        args.extend([state, stage])
        scr += [
            pltpu.VMEM((RS, C), jnp.float32),            # distst
            pltpu.VMEM((8, C), jnp.float32),             # occst
            pltpu.VMEM((RS, C), jnp.float32),            # occout
            # all neighbor windows in one scratch (2 per neighbor), so
            # every DMA can be issued before any is waited on
            pltpu.VMEM((2 * max(N_NBR, 1) * _GS_ROWS, C), jnp.float32),
            pltpu.SemaphoreType.DMA((2 * max(N_NBR, 1),)),
            pltpu.VMEM((_GST_ROWS, C), jnp.float32),     # win_t0
            pltpu.VMEM((_GST_ROWS, C), jnp.float32),     # win_t1
            pltpu.SemaphoreType.DMA(()),
        ]
        if sparse:
            scr += [pltpu.VMEM((NT, 1), jnp.float32)]    # candst
        if hbm_tables:
            scr += [
                pltpu.VMEM((TT, 128), jnp.float32),      # ptile window 0
                pltpu.VMEM((TT, 128), jnp.float32),      # ptile window 1
                pltpu.SemaphoreType.DMA(()),             # psem 0
                pltpu.SemaphoreType.DMA(()),             # psem 1
                pltpu.VMEM((_A_ROWS_TOT, lk_csz), jnp.float32),  # at win
                pltpu.SemaphoreType.DMA(()),             # asem
            ]
        return pl.pallas_call(
            kernel, grid=grid,
            in_specs=in_specs,
            out_specs=[blocked(8), blocked(_GST_ROWS), blocked(_GS_ROWS)],
            out_shape=[jax.ShapeDtypeStruct((G * 8, C), jnp.float32),
                       jax.ShapeDtypeStruct((G * _GST_ROWS, C), jnp.float32),
                       jax.ShapeDtypeStruct((G * _GS_ROWS, C), jnp.float32)],
            scratch_shapes=scr,
            interpret=interpret,
        )(*args)

    @jax.jit
    def render(cam, P, AT, frame0, state, stage, ppv0=None, ppv1=None,
               TXP=None, TXB=None, TAABB=None, TBOX=None):
        if ppv0 is None:
            ppv0 = jnp.eye(4, dtype=jnp.float32)
        if ppv1 is None:
            ppv1 = ppv0
        if hbm_tables and P.shape[1] < 128:
            # lane-align the HBM plane table for the per-tile DMA window
            P = jnp.pad(P, ((0, 0), (0, 128 - P.shape[1])))
        if sparse and TBOX.shape[1] < NT:
            TBOX = jnp.pad(TBOX, ((0, 0), (0, NT - TBOX.shape[1])))

        def body(fi, carry):
            accum, st, sg = carry
            frame = (frame0 + fi).astype(jnp.uint32)
            frame_arr = frame.reshape(1, 1).astype(jnp.int32)
            ppv = jnp.where(fi == 0, ppv0, ppv1)
            ppv_pad = jnp.concatenate(
                [ppv, jnp.zeros((4, 4), jnp.float32)], axis=0)
            okey = host_rng.path_key(jnp.uint32(0xD1CE), frame, 0,
                                     stream=8002)
            offs = []
            for _ in range(max(N_NBR, 1)):
                okey, ux = host_rng.next_uniform(okey)
                okey, uy = host_rng.next_uniform(okey)
                offs.append(((ux * 2.0 - 1.0) * radius).astype(jnp.int32))
                offs.append(((uy * 2.0 - 1.0) * radius).astype(jnp.int32))
            offs = jnp.stack(offs).reshape(max(N_NBR, 1), 2)
            hdr, st2, sg2 = k_call(cam, frame_arr, ppv_pad, offs, P, AT,
                                   st, sg, TXP, TXB, TAABB, TBOX)
            return accum + hdr, st2, sg2

        accum0 = jnp.zeros((G * 8, C), jnp.float32)
        accum, state, stage = jax.lax.fori_loop(
            0, n_frames, body, (accum0, state, stage))
        hdr = accum.reshape(G, 8, C)[:, :3, :].transpose(0, 2, 1)
        return hdr.reshape(B, 3), state, stage

    return render


class MegakernelReSTIRGI:
    """Offline static-camera ReSTIR GI fast path."""

    def __init__(self, scene: Scene, camera, settings, interpret: bool = False,
                 mono: bool | None = None, cull: bool | None = None,
                 final_vis: bool | None = None,
                 probe_split_vis: bool = False,
                 probe_fake_vis: bool = False,
                 probe_no_vis: bool = False,
                 probe_closest_vis: bool = False):
        import os

        # perf probes (benchmarks/probe_restir.py) — fake_vis bakes a WRONG
        # visibility term; make it impossible to miss in any output
        self.probe_split_vis = probe_split_vis
        self.probe_fake_vis = probe_fake_vis
        self.probe_no_vis = probe_no_vis
        self.probe_closest_vis = probe_closest_vis
        # final_vis (mono only): single winner-visibility sweep instead
        # of per-neighbor sweeps — an OPT-IN speed mode (~1.7x).  The
        # DEFAULT is the reference's per-neighbor visibility semantics
        # (Renderer.cu:2356-2366); select the speed mode with
        # final_vis=True / FYP_GI_FINAL_VIS=1 / `cli ... --gi-fast`.
        env_fv = os.environ.get("FYP_GI_FINAL_VIS")
        if final_vis is None:
            final_vis = bool(int(env_fv)) if env_fv is not None else False
        self.final_vis = final_vis
        if probe_fake_vis or probe_no_vis:
            print("WARNING: probe_fake_vis/no_vis — image is a PERF PROBE, "
                  "visibility term is synthetic/WRONG", flush=True)

        mscene, _ = morton_permuted_scene(scene)
        n_tris = mscene.geometry.tri_v.shape[0]
        n_tiles = (n_tris + TRI_TILE - 1) // TRI_TILE
        # big scenes: sparse trace + HBM tables (mono kernel only; the
        # 3-kernel pipeline stays dense) — same threshold as the other
        # megakernel renderers
        self.sparse = n_tris + ((-n_tris) % TRI_TILE) >= 32768
        self.tbox = (prepare_tile_boxes_lanes(mscene, TRI_TILE)
                     if self.sparse else None)
        # cull default mirrors make_megakernel: the culled trace variant
        # carries hit state through VMEM scratch (pl.when-skippable tile
        # bodies force memory-carried loops in the Mosaic lowering, see
        # PERF.md #18b) — only worth it once the scene has enough tiles
        # for skips to pay for the serialization.
        self.cull = (n_tiles >= 8) if cull is None else cull
        self.taabb = prepare_tile_aabbs(mscene, TRI_TILE)
        self.scene = jax.tree_util.tree_map(jnp.asarray, mscene)
        self.camera = camera
        self.settings = settings
        self.interpret = interpret
        # mono = single-kernel frame with LAGGED spatial reuse (see
        # make_restir_gi_mono).  Mono is the DEFAULT fast path since the
        # final_vis rework (0.89 vs 6.9+ ms/frame, PERF.md #18c); the
        # reference-faithful 3-kernel pipeline stays selectable via
        # mono=False / FYP_GI_MONO=0.
        env_mono = os.environ.get("FYP_GI_MONO")
        self.mono = ((bool(int(env_mono)) if env_mono is not None else True)
                     if mono is None else mono)
        if self.sparse and not self.mono:
            raise ValueError(
                "big-scene (sparse/HBM) ReSTIR GI requires the mono "
                "kernel; the 3-kernel pipeline only supports VMEM tables")
        self.frame_index = 1
        self.tables = prepare_scene_tables(self.scene)
        self.tex_tables = self.tex_shapes = None
        if scene_is_textured(scene):
            txp, txb, self.tex_shapes = prepare_texture_tables(scene.textures)
            self.tex_tables = (txp, txb)
        B = camera.width * camera.height
        C = _pick_ray_lanes(B)
        self.state = jnp.zeros((B // C * _GST_ROWS, C), jnp.float32)
        self.stage = jnp.zeros((B // C * _GS_ROWS, C), jnp.float32)
        self.accum = jnp.zeros((B, 3), jnp.float32)
        self._cache = {}

    def _renderer(self, n_frames):
        if n_frames not in self._cache:
            if self.mono:
                make = make_restir_gi_mono
                probes = dict(probe_fake_vis=self.probe_fake_vis,
                              probe_no_vis=self.probe_no_vis,
                              probe_closest_vis=self.probe_closest_vis,
                              final_vis=self.final_vis,
                              sparse=self.sparse)
            else:
                make = make_restir_gi_megakernel
                probes = dict(probe_split_vis=self.probe_split_vis)
            fn = make(
                self.camera.width, self.camera.height, self.settings,
                self.scene.geometry.tri_v.shape[0], n_frames,
                tex_shapes=self.tex_shapes, cull=self.cull,
                interpret=self.interpret, **probes)

            # one jitted dispatch per batch (render + accumulate): eager
            # jnp ops cost tunnel round-trips on axon and dominated
            # short-dispatch (burst) timings
            if self.mono:
                def step(cam, P, AT, f0, state, stage, accum, ppv0, ppv1,
                         TXP, TXB, TAABB, TBOX):
                    summed, st, sg = fn(cam, P, AT, f0, state, stage,
                                        ppv0=ppv0, ppv1=ppv1, TXP=TXP,
                                        TXB=TXB, TAABB=TAABB, TBOX=TBOX)
                    return accum + summed, st, sg
            else:
                def step(cam, P, AT, f0, state, stage, accum, ppv0, ppv1,
                         TXP, TXB, TAABB, TBOX):
                    summed, st = fn(cam, P, AT, f0, state, ppv0=ppv0,
                                    ppv1=ppv1, TXP=TXP, TXB=TXB,
                                    TAABB=TAABB)
                    return accum + summed, st, stage

            self._cache[n_frames] = jax.jit(step)
        return self._cache[n_frames]

    def dispatch_plan(self, n_frames) -> list:
        """Frames-per-dispatch plan bounded by estimated device time so no
        frame budget trips the runtime watchdog (PERF.md #24).  GI mono
        traces primary + path bounces + light shadow + per-neighbor (or
        single final) visibility sweeps per frame."""
        from fypraytracer_tpu.render.megakernel import make_dispatch_plan

        vis = (1 if self.final_vis
               else max(self.settings.spatial_neighbors, 1))
        sweeps = 2 + max(self.settings.bounces, 1) + vis
        return make_dispatch_plan(self.camera,
                                  self.scene.geometry.tri_v.shape[0],
                                  n_frames, sweeps=float(sweeps))

    def render_many(self, n_frames):
        from fypraytracer_tpu.render.megakernel import _finish_avg

        cam = jnp.concatenate([jnp.asarray(self.camera.inv_projection),
                               jnp.asarray(self.camera.inv_view)], axis=0)
        P, AT = self.tables
        txp, txb = self.tex_tables if self.tex_tables else (None, None)
        ppv_prev = jnp.asarray(self.camera.prev_proj_view)
        ppv_cur = jnp.asarray(self.camera.proj_view)
        for i, f in enumerate(self.dispatch_plan(n_frames)):
            # chunks after the first rendered their previous frame at the
            # CURRENT pose — reprojection must use it, not the pre-move
            # pose (only chunk 1's first frame looks back across the move)
            self.accum, self.state, self.stage = self._renderer(f)(
                cam, P, AT, jnp.uint32(self.frame_index), self.state,
                self.stage, self.accum,
                ppv_prev if i == 0 else ppv_cur, ppv_cur,
                txp, txb, self.taabb, self.tbox)
            self.frame_index += f
        self.camera.commit_frame()
        h, w = self.camera.height, self.camera.width
        return _finish_avg(self.accum,
                           jnp.float32(self.frame_index - 1)).reshape(h, w, 3)
