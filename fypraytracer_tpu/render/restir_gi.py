"""ReSTIR GI — spatiotemporal path-sample resampling for global
illumination (Ouyang et al. 2021).

Backend-generic two-stage pipeline mirroring the reference's kernel pair
(PerPixel_ReSTIR_GI_Part1/2, Renderer.cu:2043-2387) and its PathSample
payload {visiblePoint, visibleNormal(oct), samplePoint, sampleNormal(oct),
outgoingRadiance, samplePDF} (ReSTIR_GI_Reservoir.cuh:11-22):

  * Part 1 — one BRDF-sampled full path per pixel from the primary hit;
    the first bounce's hit is the reconnectable *sample point*; temporal
    reuse via reprojection with normal-dot ≥ 0.99 validation and history
    clamping (Renderer.cu:2230-2289).
  * Part 2 — spatial reuse over N neighbors (depth ±10% / normal ≥ 0.906
    rejection) with the path-reconnection Jacobian of paper eq. 11
    (Renderer.cu:2343-2353) and a visibility re-trace from the neighbor's
    sample point to this pixel's visible point (Renderer.cu:2356-2366);
    1/Z bias correction.

Documented deviations — the reference's GI estimator has defects we fix
rather than reproduce (SURVEY.md §7 "decide fix-vs-reproduce"):
  * the reference bakes the visible-point BRDF into ``outgoingRadiance``
    (Renderer.cu:2131-2136), which is invalid under reuse at a different
    pixel; we store radiance *arriving from the sample point* (path traced
    with unit initial throughput) and re-apply f(visible)·cosθ at shade
    time, per the paper;
  * the reference's final W collapses to 1/Z (Renderer.cu:2371-2372,
    ``p̂/(Z·p̂)``) and is left 0 when spatial reuse is off; we use the
    paper's W = weightSum / (Z · p̂(selected));
  * sky-only paths (first bounce misses) are not reconnectable; their sky
    contribution is added directly to the pixel, outside the reservoir
    (the reference stores a garbage sample point, Renderer.cu:2145-2150).
"""

from __future__ import annotations

import numpy as np

from fypraytracer_tpu.core import rng
from fypraytracer_tpu.core.mathutils import (
    _xp,
    brdf_sample_hemisphere,
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
    fetch_albedo,
    material_emission,
)
from fypraytracer_tpu.scene.types import Scene

_NORMAL_TEMPORAL = 0.99
_NORMAL_SPATIAL = 0.906
_DEPTH_TOL = 0.1


def sample_zeros(xp, n):
    """PathSample SoA (ReSTIR_GI_Reservoir.cuh:11-22)."""
    return dict(
        vis_point=xp.zeros((n, 3), np.float32),
        vis_normal=xp.zeros((n, 2), np.float32),     # octahedral
        sample_point=xp.zeros((n, 3), np.float32),
        sample_normal=xp.zeros((n, 2), np.float32),  # octahedral
        radiance=xp.zeros((n, 3), np.float32),       # L_o from sample point
        pdf=xp.zeros((n,), np.float32),              # target p̂ of sample
    )


def reservoir_zeros(xp, n):
    return dict(sample=sample_zeros(xp, n),
                w=xp.zeros((n,), np.float32),
                m=xp.zeros((n,), np.int32),
                wsum=xp.zeros((n,), np.float32))


def _select_sample(dst, src, accept):
    out = {}
    for k, v in dst.items():
        a = accept[..., None] if v.ndim == 2 else accept
        out[k] = _xp(v).where(a, src[k], v)
    return out


def reservoir_update(res, cand_sample, weight, count, p_hat, u, active):
    """Streaming update (ReSTIR_GI_Reservoir.cu:5-33), masked lanes."""
    xp = _xp(weight)
    wsum = res["wsum"] + xp.where(active, weight, 0.0)
    m = res["m"] + xp.where(active, count, 0)
    accept = active & (wsum > 0.0) & (u < weight / xp.where(wsum > 0.0, wsum, 1.0))
    sample = _select_sample(res["sample"], dict(cand_sample, pdf=p_hat), accept)
    return dict(sample=sample, w=res["w"], m=m, wsum=wsum)


def _luminance_norm(radiance):
    # double-where: d/dθ √(r·r) at r = 0 is inf, and zero-radiance samples
    # are the COMMON case (non-reconnectable / dark paths); p̂ feeds the
    # differentiated RIS weights (pixel gradients, SURVEY §7 hard-part #4)
    xp = _xp(radiance)
    sq = dot3(radiance, radiance, keepdims=False)
    return xp.where(sq > 0.0, xp.sqrt(xp.where(sq > 0.0, sq, 1.0)), 0.0)


def _trace_sample_path(scene, trace_fn, prim, view, key, settings):
    """One BRDF path from the primary hit (Renderer.cu:2087-2216).

    Returns (key, sample dict, sky_direct (B,3), src_pdf (B,)):
      * sample.radiance = radiance arriving at the visible point FROM the
        sample point (visible-point BRDF NOT included — see module doc);
      * src_pdf = solid-angle pdf of the initial BRDF direction;
      * sky_direct = first-bounce sky contribution (not reusable), WITH
        the visible-point BRDF applied, pre-divided by src_pdf.
    """
    xp = _xp(view)
    sky = xp.asarray(settings.sky_color, dtype=view.dtype)
    mats = scene.materials
    m0 = xp.maximum(prim["mat"], 0)
    albedo0 = fetch_albedo(scene, prim["mat"], prim["uv"])

    key, (u_sel, u1, u2) = rng.uniforms(key, 3)
    dir0, pdf0 = brdf_sample_hemisphere(prim["normal"], view, albedo0,
                                        mats.metallic[m0], mats.roughness[m0],
                                        u_sel, u1, u2)
    f0 = cook_torrance_brdf(prim["normal"], view, dir0, albedo0,
                            mats.metallic[m0], mats.roughness[m0])
    cos0 = xp.maximum(dot3(dir0, prim["normal"], keepdims=False), 0.0)

    ray_o = prim["position"] + prim["normal"] * ORIGIN_EPS
    ray_d = dir0

    tri1 = trace_fn(ray_o, ray_d)
    pay1 = hit_payload(scene.geometry, ray_o, ray_d, tri1)
    first_miss = pay1["t"] < 0.0
    reconnectable = ~first_miss & (pdf0 > 0.0)

    # sky contribution of non-reconnectable paths, shaded now
    f_term = f0 * (cos0 / xp.maximum(pdf0, 1e-12))[..., None]
    sky_direct = xp.where((first_miss & (pdf0 > 0.0))[..., None], f_term * sky, 0.0)

    # path continues from the sample point with unit throughput
    radiance = xp.zeros_like(view)
    throughput = xp.ones_like(view)
    active = reconnectable
    pay = pay1

    emission1 = material_emission(scene, pay1["mat"])
    em1 = dot3(emission1, emission1, keepdims=False) > 0.0
    radiance = radiance + xp.where((active & em1)[..., None], emission1, 0.0)
    active = active & ~em1

    for _b in range(max(settings.bounces - 1, 0)):
        view_b = -ray_d
        mb = xp.maximum(pay["mat"], 0)
        albedo_b = fetch_albedo(scene, pay["mat"], pay["uv"], bounce=True)
        key, (s1, s2, s3) = rng.uniforms(key, 3)
        l, pdf = brdf_sample_hemisphere(pay["normal"], view_b, albedo_b,
                                        mats.metallic[mb], mats.roughness[mb],
                                        s1, s2, s3)
        f = cook_torrance_brdf(pay["normal"], view_b, l, albedo_b,
                               mats.metallic[mb], mats.roughness[mb])
        cos_t = xp.maximum(dot3(l, pay["normal"]), 0.0)
        ok = pdf > 0.0
        throughput = throughput * f * cos_t / xp.maximum(pdf, 1e-12)[..., None]
        active = active & ok

        ray_o = pay["position"] + pay["normal"] * ORIGIN_EPS
        ray_d = l
        tri = trace_fn(ray_o, ray_d)
        pay = hit_payload(scene.geometry, ray_o, ray_d, tri)
        miss = pay["t"] < 0.0
        radiance = radiance + xp.where((active & miss)[..., None], throughput * sky, 0.0)
        active = active & ~miss
        emission = material_emission(scene, pay["mat"])
        em = dot3(emission, emission, keepdims=False) > 0.0
        radiance = radiance + xp.where((active & em)[..., None], throughput * emission, 0.0)
        active = active & ~em

    radiance = xp.where(reconnectable[..., None], radiance, 0.0)
    sample = dict(
        vis_point=prim["position"],
        vis_normal=encode_octahedral(prim["normal"]),
        sample_point=pay1["position"],
        sample_normal=encode_octahedral(pay1["normal"]),
        radiance=radiance,
    )
    return key, sample, sky_direct, xp.where(reconnectable, pdf0, 0.0)


def _shade(scene, prim, view, res, shade_lanes):
    """f(visible → sample dir)·cosθ·L_o·W (paper shade step)."""
    xp = _xp(view)
    s = res["sample"]
    to_s = s["sample_point"] - prim["position"]
    dist = xp.sqrt(xp.maximum(dot3(to_s, to_s, keepdims=False), 1e-20))
    d = to_s / dist[..., None]
    m0 = xp.maximum(prim["mat"], 0)
    albedo = fetch_albedo(scene, prim["mat"], prim["uv"])
    f = cook_torrance_brdf(prim["normal"], view, d, albedo,
                           scene.materials.metallic[m0],
                           scene.materials.roughness[m0])
    cos_t = xp.maximum(dot3(d, prim["normal"], keepdims=False), 0.0)
    lane = shade_lanes & (res["w"] > 0.0)
    return xp.where(lane[..., None],
                    f * (cos_t * res["w"])[..., None] * s["radiance"], 0.0)


def restir_gi_part1(scene, trace_fn, origins, directions, pixel_ids, frame,
                    settings, state, width, height, prev_proj_view):
    """Stage 1: primary trace, initial BRDF path, temporal reuse
    (PerPixel_ReSTIR_GI_Part1, Renderer.cu:2043-2293)."""
    xp = _xp(origins)

    prim_tri = trace_fn(origins, directions)
    prim = hit_payload(scene.geometry, origins, directions, prim_tri)
    prim_miss = prim["t"] < 0.0
    prim_emission = material_emission(scene, prim["mat"])
    prim_emissive = dot3(prim_emission, prim_emission, keepdims=False) > 0.0
    shade_lanes = ~(prim_miss | prim_emissive)
    view = -directions

    key = rng.path_key(pixel_ids, frame, 0, stream=8001)
    key, sample, sky_direct, src_pdf = _trace_sample_path(
        scene, trace_fn, prim, view, key, settings)

    p_hat = _luminance_norm(sample["radiance"])
    res = reservoir_zeros(xp, pixel_ids.shape[0])
    key, (u0,) = rng.uniforms(key, 1)
    w_ris = xp.where(src_pdf > 0.0, p_hat / xp.maximum(src_pdf, 1e-12), 0.0)
    res = reservoir_update(res, sample, w_ris, 1, p_hat, u0, shade_lanes)
    res["w"] = _w_of(res)

    if settings.temporal_reuse:
        uv_prev = ndc_to_uv(world_to_ndc(prev_proj_view, prim["position"]))
        px = xp.clip((uv_prev[..., 0] * width).astype(np.int32), 0, width - 1)
        py = xp.clip(((1.0 - uv_prev[..., 1]) * height).astype(np.int32), 0, height - 1)
        prev_idx = px + py * width

        prev_n = decode_octahedral(state["normal_oct"][prev_idx])
        pr = state["reservoir"]
        prev_res = dict(sample={k: v[prev_idx] for k, v in pr["sample"].items()},
                        w=pr["w"][prev_idx], m=pr["m"][prev_idx],
                        wsum=pr["wsum"][prev_idx])
        # Geometric validity only: a zero-radiance history sample is still a
        # valid sample ("this path found nothing") and must be counted in M,
        # else lucky paths are overweighted — the reference's CheckIfValid
        # gate (radiance² > 0, ReSTIR_GI_Reservoir.cu:66-68) biases bright.
        valid = (dot3(prev_n, prim["normal"], keepdims=False) >= _NORMAL_TEMPORAL) \
            & (prev_res["m"] > 0) & shade_lanes

        cap = settings.temporal_history_limit * xp.maximum(res["m"], 1)
        prev_m = xp.minimum(prev_res["m"], cap)

        p_prev = prev_res["sample"]["pdf"]
        key, (ut,) = rng.uniforms(key, 1)
        merged = reservoir_update(res, prev_res["sample"],
                                  p_prev * prev_res["w"] * prev_m.astype(np.float32),
                                  prev_m, p_prev, ut, valid)
        merged["w"] = _w_of(merged)
        res = _where_res(valid, merged, res)

    # flat stage-barrier arrays (sample fields prefixed s_)
    out = dict(w=res["w"], m=res["m"], wsum=res["wsum"],
               t=prim["t"], mat=prim["mat"], position=prim["position"],
               normal=prim["normal"], uv=prim["uv"], sky_direct=sky_direct)
    for k, v in res["sample"].items():
        out["s_" + k] = v
    return out


def restir_gi_part2(scene, trace_fn, origins, directions, pixel_ids, frame,
                    settings, g, full_g, width, height):
    """Stage 2: spatial reuse with Jacobian reconnection + shade
    (PerPixel_ReSTIR_GI_Part2, Renderer.cu:2295-2387)."""
    xp = _xp(origins)
    sky = xp.asarray(settings.sky_color, dtype=origins.dtype)

    prim = dict(t=g["t"], mat=g["mat"], position=g["position"],
                normal=g["normal"], uv=g["uv"])
    prim_miss = prim["t"] < 0.0
    prim_emission = material_emission(scene, prim["mat"])
    prim_emissive = dot3(prim_emission, prim_emission, keepdims=False) > 0.0
    shade_lanes = ~(prim_miss | prim_emissive)
    view = -directions
    sky_direct = g["sky_direct"]

    sample_keys = [k[2:] for k in g if k.startswith("s_")]
    res = dict(sample={k: g["s_" + k] for k in sample_keys},
               w=g["w"], m=g["m"], wsum=g["wsum"])

    key2 = rng.path_key(pixel_ids, frame, 0, stream=8002)
    if settings.spatial_reuse:
        px_self = (pixel_ids % width).astype(np.int32)
        py_self = (pixel_ids // width).astype(np.int32)
        radius = float(settings.spatial_radius)

        # own M always counts (see zero-radiance note in part1)
        z = xp.where(shade_lanes, res["m"], 0)
        for _n in range(settings.spatial_neighbors):
            key2, (ux, uy, u_acc) = rng.uniforms(key2, 3)
            ox = xp.clip(px_self + ((ux * 2.0 - 1.0) * radius).astype(np.int32), 0, width - 1)
            oy = xp.clip(py_self + ((uy * 2.0 - 1.0) * radius).astype(np.int32), 0, height - 1)
            nidx = ox + oy * width

            n_depth = full_g["t"][nidx]
            # reference reads the oct-encoded normal G-buffer: quantize
            n_normal = decode_octahedral(encode_octahedral(full_g["normal"][nidx]))
            nr = dict(sample={k: full_g["s_" + k][nidx] for k in sample_keys},
                      w=full_g["w"][nidx], m=full_g["m"][nidx],
                      wsum=full_g["wsum"][nidx])
            n_rad_len = _luminance_norm(nr["sample"]["radiance"])
            # geometric acceptance only — zero-radiance neighbors still
            # count in Z (merge weight is 0, the M accounting is not)
            ok = shade_lanes \
                & (n_depth <= (1.0 + _DEPTH_TOL) * prim["t"]) \
                & (n_depth >= (1.0 - _DEPTH_TOL) * prim["t"]) \
                & (dot3(prim["normal"], n_normal, keepdims=False) >= _NORMAL_SPATIAL) \
                & (nr["m"] > 0)

            # Jacobian of path reconnection (eq. 11, Renderer.cu:2343-2353)
            ns = nr["sample"]
            n_sn = decode_octahedral(ns["sample_normal"])
            d_q = ns["vis_point"] - ns["sample_point"]
            d_r = prim["position"] - ns["sample_point"]
            dist_q = xp.sqrt(xp.maximum(dot3(d_q, d_q, keepdims=False), 1e-20))
            dist_r = xp.sqrt(xp.maximum(dot3(d_r, d_r, keepdims=False), 1e-20))
            cos_q = dot3(n_sn, d_q / dist_q[..., None], keepdims=False)
            cos_r = dot3(n_sn, d_r / dist_r[..., None], keepdims=False)
            jac = xp.where(cos_q > 0.0, cos_r / xp.maximum(cos_q, 1e-12), 0.0) \
                * (dist_q * dist_q) / xp.maximum(dist_r * dist_r, 1e-20)
            p_n = xp.where(jac > 0.0, n_rad_len / xp.maximum(jac, 1e-12), 0.0)

            # visibility re-trace: neighbor sample point → current visible pt
            vis_o = ns["sample_point"] + n_sn * ORIGIN_EPS
            vis_d = d_r / dist_r[..., None]  # sample point -> pixel's visible point
            vis_tri = trace_fn(vis_o, vis_d)
            vis_pay = hit_payload(scene.geometry, vis_o, vis_d, vis_tri)
            tol = xp.maximum(1e-4, dist_r * 1e-3)
            visible = xp.abs(vis_pay["t"] - dist_r) <= tol
            p_n = xp.where(visible, p_n, 0.0)

            z = z + xp.where(ok, nr["m"], 0)
            res = reservoir_update(res, ns,
                                   p_n * nr["w"] * nr["m"].astype(np.float32),
                                   nr["m"], p_n, u_acc, ok)

        # paper eq. 7 with Z (fixes Renderer.cu:2371-2372, see module doc)
        p_sel = res["sample"]["pdf"]
        res["w"] = xp.where(p_sel > 0.0,
                            res["wsum"] / (xp.maximum(z.astype(np.float32), 1.0)
                                           * xp.where(p_sel > 0.0, p_sel, 1.0)),
                            0.0)

    # ---- shade ------------------------------------------------------------
    gi = _shade(scene, prim, view, res, shade_lanes)
    out = gi + xp.where(shade_lanes[..., None], sky_direct, 0.0)
    out = xp.where(prim_miss[..., None], sky, out)
    out = xp.where(prim_emissive[..., None], prim_emission, out)

    flat_res = dict(w=res["w"], m=res["m"], wsum=res["wsum"])
    for k, v in res["sample"].items():
        flat_res["s_" + k] = v
    return out, flat_res


def render_restir_gi(scene: Scene, trace_fn, origins, directions, pixel_ids,
                     frame, settings, state, width: int, height: int,
                     prev_proj_view):
    """Full ReSTIR GI frame = part1 barrier part2, chunked over pixels."""
    from fypraytracer_tpu.utils.chunking import map_chunks

    g = map_chunks(
        lambda o, d, p: restir_gi_part1(scene, trace_fn, o, d, p, frame,
                                        settings, state, width, height,
                                        prev_proj_view),
        (origins, directions, pixel_ids))

    g_keys = sorted(g.keys())

    def part2_chunk(o, d, p, *chunk_g):
        cg = dict(zip(g_keys, chunk_g))
        return restir_gi_part2(scene, trace_fn, o, d, p, frame, settings,
                               cg, g, width, height)

    out, flat_res = map_chunks(part2_chunk,
                               (origins, directions, pixel_ids)
                               + tuple(g[k] for k in g_keys))

    sample = {k[2:]: v for k, v in flat_res.items() if k.startswith("s_")}
    new_state = dict(
        reservoir=dict(sample=sample, w=flat_res["w"], m=flat_res["m"],
                       wsum=flat_res["wsum"]),
        depth=g["t"],
        normal_oct=encode_octahedral(g["normal"]))
    return out, new_state


def _w_of(res):
    """W = weightSum / (M · p̂) (standard RIS weight)."""
    xp = _xp(res["wsum"])
    p = res["sample"]["pdf"]
    return xp.where(p > 0.0,
                    res["wsum"] / (xp.maximum(res["m"].astype(res["wsum"].dtype), 1.0)
                                   * xp.where(p > 0.0, p, 1.0)),
                    0.0)


def _where_res(cond, a, b):
    xp = _xp(a["w"])
    out = dict(sample=_select_sample(b["sample"], a["sample"], cond),
               w=xp.where(cond, a["w"], b["w"]),
               m=xp.where(cond, a["m"], b["m"]),
               wsum=xp.where(cond, a["wsum"], b["wsum"]))
    return out


def init_state(num_pixels: int, xp=np):
    return dict(reservoir=reservoir_zeros(xp, num_pixels),
                depth=xp.zeros((num_pixels,), np.float32),
                normal_oct=xp.zeros((num_pixels, 2), np.float32))
