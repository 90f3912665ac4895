"""ReSTIR DI — reservoir-based spatiotemporal direct-light resampling.

Backend-generic (numpy / jax.numpy) re-implementation of the reference's
two-kernel pipeline (PerPixel_ReSTIR_DI_Part1/2, Renderer.cu:1628-2041)
as two pjit-able stages with all state device-resident and double-buffered
(the reference's cur/prev reservoir + G-buffers, Renderer.h:33-39).

Estimator structure (per the ReSTIR DI paper, Bitterli et al. 2020):
  * Part 1 — M candidate emitters drawn uniformly from the emissive list,
    target p̂ = ‖unshadowed radiance‖ evaluated at the triangle *centroid*
    (the reference's deliberate approximation: candidates use the centroid
    via the mis-named GetBarycentricCoords, final shading uses a random
    point — Renderer.cu:1691 vs :1970; kept, as it halves candidate cost);
    streaming RIS with weight p̂·E (Renderer.cu:1733); temporal reuse via
    reprojection with the previous frame's matrices, normal-dot ≥ 0.99
    history validation, history clamp limit·M, and the unbiased 1/Z
    combination of Algorithm 6 (Renderer.cu:1747-1869).
  * Part 2 — spatial reuse over N random neighbors in a pixel radius with
    depth ±10% / normal-dot ≥ 0.906 rejection (Renderer.cu:1913-1941),
    then final shade: random point on the selected emitter, visibility
    ray, radiance × W (Renderer.cu:1957-2031).

Documented fixes vs the reference (SURVEY.md appendix):
  * candidate pick uses ``floor(u·E)`` instead of ``round(u·(E-1))``
    (endpoints half-weighted at Renderer.cu:1675-1677);
  * spatial merge re-evaluates the neighbor's sample target p̂ at the
    *current* pixel (the reference reuses the neighbor's stored p̂,
    Renderer.cu:1938-1941, which biases Algorithm 6's Z count).

The kernel-launch barrier between Part1 and Part2 becomes two separate
jitted calls (SURVEY.md §5 race-analysis note).
"""

from __future__ import annotations

import numpy as np

from fypraytracer_tpu.core import rng
from fypraytracer_tpu.core.mathutils import (
    _xp,
    cook_torrance_brdf,
    decode_octahedral,
    dot3,
    encode_octahedral,
    ndc_to_uv,
    world_to_ndc,
)
from fypraytracer_tpu.ops.hit import hit_payload
from fypraytracer_tpu.render.integrators import (
    ORIGIN_EPS,
    _normalize,
    _sample_point_on_triangle,
    fetch_albedo,
    material_emission,
)
from fypraytracer_tpu.scene.types import Scene

_NORMAL_TEMPORAL = 0.99    # Renderer.cu:1772
_NORMAL_SPATIAL = 0.906    # Renderer.cu:1935
_DEPTH_TOL = 0.1           # ±10%, Renderer.cu:1928-1929


def reservoir_zeros(xp, shape):
    """Fresh reservoirs (ResetReservoir, ReSTIR_DI_Reservoir.cu:39-47)."""
    return dict(
        index=xp.zeros(shape, np.int32),     # index into emissive list
        w=xp.zeros(shape, np.float32),       # weightEmissive (W)
        pdf=xp.zeros(shape, np.float32),     # target p̂ of selected sample
        wsum=xp.zeros(shape, np.float32),
        m=xp.zeros(shape, np.int32),         # emissiveProcessedCount
    )


def reservoir_update(res, cand_index, weight, count, pdf, u, active):
    """Streaming RIS update (ReSTIR_DI_Reservoir.cu:22-37), masked.

    ``active`` lanes update; others pass through unchanged.
    """
    xp = _xp(weight)
    wsum = res["wsum"] + xp.where(active, weight, 0.0)
    m = res["m"] + xp.where(active, count, 0)
    accept = active & (u < weight / xp.where(wsum > 0.0, wsum, 1.0)) & (wsum > 0.0)
    return dict(
        index=xp.where(accept, cand_index, res["index"]),
        w=res["w"],
        pdf=xp.where(accept, pdf, res["pdf"]),
        wsum=wsum,
        m=m,
    )


def target_pdf_centroid(scene: Scene, emissive_slot, shade_pos, shade_normal,
                        view, albedo, metal, rough):
    """p̂(x) = ‖brdf · cosθ_x · cosθ_y / (areaPDF⁻¹·dist²)· emission‖ at the
    emitter centroid (Renderer.cu:1684-1731)."""
    xp = _xp(shade_pos)
    tri = scene.emissive_tris[xp.clip(emissive_slot, 0, scene.emissive_tris.shape[0] - 1)]
    tv = scene.geometry.tri_v[tri]
    p0 = scene.geometry.positions[tv[..., 0]]
    p1 = scene.geometry.positions[tv[..., 1]]
    p2 = scene.geometry.positions[tv[..., 2]]
    centroid = (p0 + p1 + p2) / 3.0

    to_l = centroid - shade_pos
    dist2 = xp.maximum(dot3(to_l, to_l, keepdims=False), 1e-20)
    dist = xp.sqrt(dist2)
    ldir = to_l / dist[..., None]

    n0 = scene.geometry.normals[tv[..., 0]]
    n1 = scene.geometry.normals[tv[..., 1]]
    n2 = scene.geometry.normals[tv[..., 2]]
    lnormal = _normalize(n0 + n1 + n2)

    brdf = cook_torrance_brdf(shade_normal, view, ldir, albedo, metal, rough)
    cos_x = xp.maximum(dot3(ldir, shade_normal, keepdims=False), 0.0)
    cos_y = xp.maximum(dot3(-ldir, lnormal, keepdims=False), 0.0)

    cr = _xp(p0).cross(p1 - p0, p2 - p0)
    area = 0.5 * xp.sqrt(xp.maximum(dot3(cr, cr, keepdims=False), 1e-20))
    solid_pdf = (1.0 / area) * dist2

    emission = material_emission(scene, scene.geometry.tri_mat[tri])
    radiance = brdf * (cos_x * cos_y / xp.maximum(solid_pdf, 1e-20))[..., None] * emission
    # double-where norm: d/dθ √(r·r) at r = 0 is inf; p̂ feeds the RIS
    # weight sums, which ARE differentiated (pixel gradients w.r.t.
    # materials, SURVEY §7 hard-part #4) — the guard pins the zero-lane
    # gradient to exactly 0 instead of 0·inf = NaN
    sq = dot3(radiance, radiance, keepdims=False)
    return xp.where(sq > 0.0, xp.sqrt(xp.where(sq > 0.0, sq, 1.0)), 0.0)


def _finalize_w(res, m_inv=None):
    """W = (1/p̂) · (weightSum/M)   — or Algorithm 6's (1/p̂)·(m·weightSum)
    when ``m_inv`` (= 1/Z) is given (Renderer.cu:1744,1862-1865)."""
    xp = _xp(res["w"])
    if m_inv is None:
        scale = res["wsum"] / xp.maximum(res["m"].astype(res["wsum"].dtype), 1.0)
    else:
        scale = m_inv * res["wsum"]
    w = xp.where(res["pdf"] > 0.0, scale / xp.where(res["pdf"] > 0.0, res["pdf"], 1.0), 0.0)
    return dict(res, w=w)


def _prim_setup(scene, origins, directions, prim):
    """Shared per-pixel shading context from the primary payload."""
    xp = _xp(origins)
    prim_miss = prim["t"] < 0.0
    prim_emission = material_emission(scene, prim["mat"])
    prim_emissive = dot3(prim_emission, prim_emission, keepdims=False) > 0.0
    shade_lanes = ~(prim_miss | prim_emissive)
    albedo = fetch_albedo(scene, prim["mat"], prim["uv"])
    mclamp = xp.maximum(prim["mat"], 0)
    rough = scene.materials.roughness[mclamp]
    metal = scene.materials.metallic[mclamp]
    return dict(miss=prim_miss, emission=prim_emission, emissive=prim_emissive,
                shade=shade_lanes, albedo=albedo, rough=rough, metal=metal,
                view=-directions)


def restir_di_part1(scene, trace_fn, origins, directions, pixel_ids, frame,
                    settings, state, width, height, prev_proj_view):
    """Stage 1: primary trace + M candidates (RIS) + temporal reuse
    (PerPixel_ReSTIR_DI_Part1, Renderer.cu:1628-1873).  Chunk-local except
    the temporal gather, which reads the full previous-frame state."""
    xp = _xp(origins)
    num_emissive = max(scene.emissive_tris.shape[0], 1)

    prim_tri = trace_fn(origins, directions)
    prim = hit_payload(scene.geometry, origins, directions, prim_tri)
    ctx = _prim_setup(scene, origins, directions, prim)

    key = rng.path_key(pixel_ids, frame, 0, stream=7001)
    res = reservoir_zeros(xp, pixel_ids.shape)
    for _ in range(settings.light_candidates):
        key, (u_sel, u_acc) = rng.uniforms(key, 2)
        cand = xp.minimum((u_sel * num_emissive).astype(np.int32), num_emissive - 1)
        p_hat = target_pdf_centroid(scene, cand, prim["position"], prim["normal"],
                                    ctx["view"], ctx["albedo"], ctx["metal"], ctx["rough"])
        weight = p_hat * float(num_emissive)
        res = reservoir_update(res, cand, weight, 1, p_hat, u_acc, ctx["shade"])
    res = _finalize_w(res)

    if settings.temporal_reuse:
        uv_prev = ndc_to_uv(world_to_ndc(prev_proj_view, prim["position"]))
        px = xp.clip((uv_prev[..., 0] * width).astype(np.int32), 0, width - 1)
        py = xp.clip(((1.0 - uv_prev[..., 1]) * height).astype(np.int32), 0, height - 1)
        prev_idx = px + py * width

        prev_n = decode_octahedral(state["normal_oct"][prev_idx])
        prev_res = {k: v[prev_idx] for k, v in state["reservoir"].items()}
        valid_hist = (dot3(prev_n, prim["normal"], keepdims=False) >= _NORMAL_TEMPORAL) \
            & (prev_res["m"] > 0) & ctx["shade"]

        hist_cap = settings.temporal_history_limit * res["m"]
        prev_m = xp.minimum(prev_res["m"], hist_cap)

        tmp = reservoir_zeros(xp, pixel_ids.shape)
        z = xp.zeros(pixel_ids.shape, np.int32)
        key, (u1, u2) = rng.uniforms(key, 2)
        tmp = reservoir_update(tmp, res["index"], res["pdf"] * res["w"] * res["m"].astype(np.float32),
                               res["m"], res["pdf"], u1, valid_hist)
        z = z + xp.where(valid_hist & (res["pdf"] > 0.0), res["m"], 0)

        p_prev = target_pdf_centroid(scene, prev_res["index"], prim["position"],
                                     prim["normal"], ctx["view"], ctx["albedo"],
                                     ctx["metal"], ctx["rough"])
        tmp = reservoir_update(tmp, prev_res["index"],
                               p_prev * prev_res["w"] * prev_m.astype(np.float32),
                               prev_m, p_prev, u2, valid_hist)
        z = z + xp.where(valid_hist & (p_prev > 0.0), prev_m, 0)

        m_inv = 1.0 / xp.maximum(z.astype(np.float32), 1.0)
        tmp = _finalize_w(tmp, m_inv)
        res = {k: xp.where(valid_hist, tmp[k], res[k]) for k in res}

    # flat arrays crossing the stage barrier (the reference's G-buffers +
    # reservoir buffers between kernel launches)
    return dict(index=res["index"], w=res["w"], pdf=res["pdf"],
                wsum=res["wsum"], m=res["m"],
                t=prim["t"], mat=prim["mat"],
                position=prim["position"], normal=prim["normal"],
                uv=prim["uv"])


def restir_di_part2(scene, trace_fn, origins, directions, pixel_ids, frame,
                    settings, g, full_g, width, height):
    """Stage 2: spatial reuse + final shade (PerPixel_ReSTIR_DI_Part2,
    Renderer.cu:1875-2041).  ``g`` holds this chunk's stage-1 arrays,
    ``full_g`` the full-image ones for neighbor gathers."""
    xp = _xp(origins)
    num_emissive = max(scene.emissive_tris.shape[0], 1)

    prim = dict(t=g["t"], mat=g["mat"], position=g["position"],
                normal=g["normal"], uv=g["uv"])
    ctx = _prim_setup(scene, origins, directions, prim)
    res = dict(index=g["index"], w=g["w"], pdf=g["pdf"], wsum=g["wsum"], m=g["m"])

    key2 = rng.path_key(pixel_ids, frame, 0, stream=7002)
    if settings.spatial_reuse:
        px_self = (pixel_ids % width).astype(np.int32)
        py_self = (pixel_ids // width).astype(np.int32)
        radius = float(settings.spatial_radius)

        sp = reservoir_zeros(xp, pixel_ids.shape)
        z = xp.zeros(pixel_ids.shape, np.int32)
        key2, (u_acc,) = rng.uniforms(key2, 1)
        sp = reservoir_update(sp, res["index"], res["pdf"] * res["w"] * res["m"].astype(np.float32),
                              res["m"], res["pdf"], u_acc, ctx["shade"])
        z = z + xp.where(ctx["shade"] & (res["pdf"] > 0.0), res["m"], 0)

        for _n in range(settings.spatial_neighbors):
            key2, (ux, uy, u_acc) = rng.uniforms(key2, 3)
            ox = (px_self + ((ux * 2.0 - 1.0) * radius).astype(np.int32))
            oy = (py_self + ((uy * 2.0 - 1.0) * radius).astype(np.int32))
            ox = xp.clip(ox, 0, width - 1)
            oy = xp.clip(oy, 0, height - 1)
            nidx = ox + oy * width

            n_depth = full_g["t"][nidx]
            # reference reads the oct-encoded normal G-buffer: quantize
            n_normal = decode_octahedral(encode_octahedral(full_g["normal"][nidx]))
            depth_ok = (n_depth <= (1.0 + _DEPTH_TOL) * prim["t"]) & \
                       (n_depth >= (1.0 - _DEPTH_TOL) * prim["t"])
            normal_ok = dot3(prim["normal"], n_normal, keepdims=False) >= _NORMAL_SPATIAL
            ok = ctx["shade"] & depth_ok & normal_ok

            n_res = {k: full_g[k][nidx] for k in ("index", "w", "pdf", "wsum", "m")}
            # re-evaluate p̂ of the neighbor's sample at THIS pixel (fix)
            p_n = target_pdf_centroid(scene, n_res["index"], prim["position"],
                                      prim["normal"], ctx["view"], ctx["albedo"],
                                      ctx["metal"], ctx["rough"])
            sp = reservoir_update(sp, n_res["index"],
                                  p_n * n_res["w"] * n_res["m"].astype(np.float32),
                                  n_res["m"], p_n, u_acc, ok)
            z = z + xp.where(ok & (p_n > 0.0), n_res["m"], 0)

        m_inv = 1.0 / xp.maximum(z.astype(np.float32), 1.0)
        sp = _finalize_w(sp, m_inv)
        res = {k: xp.where(ctx["shade"], sp[k], res[k]) for k in res}

    # ---- final shade (Renderer.cu:1957-2031) ------------------------------
    key2, (up1, up2) = rng.uniforms(key2, 2)
    sel_tri = scene.emissive_tris[xp.clip(res["index"], 0, num_emissive - 1)]
    point, lnormal, area = _sample_point_on_triangle(scene.geometry, sel_tri, up1, up2)
    to_l = point - prim["position"]
    dist2 = xp.maximum(dot3(to_l, to_l, keepdims=False), 1e-20)
    dist = xp.sqrt(dist2)
    ldir = to_l / dist[..., None]

    brdf = cook_torrance_brdf(prim["normal"], ctx["view"], ldir, ctx["albedo"],
                              ctx["metal"], ctx["rough"])
    cos_x = xp.maximum(dot3(ldir, prim["normal"], keepdims=False), 0.0)
    cos_y = xp.maximum(dot3(-ldir, lnormal, keepdims=False), 0.0)
    solid_pdf = (1.0 / xp.maximum(area, 1e-20)) * dist2
    thr = brdf * (cos_x * cos_y / xp.maximum(solid_pdf, 1e-20))[..., None]

    shadow_o = prim["position"] + prim["normal"] * ORIGIN_EPS
    vis_tri = trace_fn(shadow_o, ldir)
    visible = vis_tri == sel_tri
    sky = xp.asarray(settings.sky_color, dtype=origins.dtype)

    emission = material_emission(scene, scene.geometry.tri_mat[sel_tri])
    lit = xp.where((ctx["shade"] & visible)[..., None],
                   thr * emission * res["w"][..., None], 0.0)
    lit = lit + xp.where((ctx["shade"] & (vis_tri < 0))[..., None], thr * sky, 0.0)

    out = xp.where(ctx["miss"][..., None], sky, lit)
    out = xp.where(ctx["emissive"][..., None], ctx["emission"], out)
    return out, res


def render_restir_di(scene: Scene, trace_fn, origins, directions, pixel_ids,
                     frame, settings, state, width: int, height: int,
                     prev_proj_view):
    """Full ReSTIR DI frame = part1 barrier part2, chunked over pixels.

    Args:
      state: dict with ``reservoir`` (prev frame's final reservoirs),
        ``depth`` (B,), ``normal_oct`` (B, 2) — from the previous frame.
      prev_proj_view: (4, 4) previous frame projection @ view.
    Returns (hdr (B,3), new_state).
    """
    from fypraytracer_tpu.utils.chunking import map_chunks

    xp = _xp(origins)
    g = map_chunks(
        lambda o, d, p: restir_di_part1(scene, trace_fn, o, d, p, frame,
                                        settings, state, width, height,
                                        prev_proj_view),
        (origins, directions, pixel_ids))

    g_keys = sorted(g.keys())

    def part2_chunk(o, d, p, *chunk_g):
        cg = dict(zip(g_keys, chunk_g))
        return restir_di_part2(scene, trace_fn, o, d, p, frame, settings,
                               cg, g, width, height)

    out, res = map_chunks(part2_chunk,
                          (origins, directions, pixel_ids)
                          + tuple(g[k] for k in g_keys))

    new_state = dict(
        reservoir=dict(index=res["index"], w=res["w"], pdf=res["pdf"],
                       wsum=res["wsum"], m=res["m"]),
        depth=g["t"],
        normal_oct=encode_octahedral(g["normal"]),
    )
    return out, new_state


def init_state(num_pixels: int, xp=np):
    """Zero-initialized double-buffer state (Renderer.cu:286-356)."""
    return dict(
        reservoir=reservoir_zeros(xp, (num_pixels,)),
        depth=xp.zeros((num_pixels,), np.float32),
        normal_oct=xp.zeros((num_pixels, 2), np.float32),
    )
