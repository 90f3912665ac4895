"""Offline (CPU) analysis for the log-scaling trace design (VERDICT r3 #1).

The sparse trace culls triangle tiles with a conservative per-row
bundle-interval slab test (megakernel.py::build_trace_sparse).  Its known
failure mode is incoherent bounce rays: a 512-lane bundle whose
directions span the sphere has mixed-sign direction intervals on every
axis, so every tile passes and the sweep degrades to dense.

This probe measures, on the REAL stress scene (200k tris, 785 tiles) at
256², how many tile sweeps per ray row each candidate strategy costs:

  A. current: one interval per row (all 512 lanes);
  B. per-octant: split lanes by direction sign octant, one masked
     interval per non-empty octant (sign-definite dirs -> finite
     entry/exit, tiles behind the bundle culled);
  C. B + front-to-back early termination: visit candidates in ascending
     bundle-entry order, stop when entry > max over the octant's lanes
     of their true closest-hit t (misses capped at the scene diameter);
  D. C with the stop criterion additionally ignoring miss lanes
     (optimistic bound — what a per-lane 'done' mask would buy).

Output: mean/median tiles visited per row for primary and bounce rows,
plus the implied per-frame sweep-iteration totals.  Pure NumPy/CPU —
run anywhere, no TPU.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from fypraytracer_tpu.core.camera import generate_rays
from fypraytracer_tpu.ops.traverse import trace_rays
from fypraytracer_tpu.render import megakernel as MK
from fypraytracer_tpu.scene.sceneio import builtin_scene

C = int(os.environ.get("SIM_C", "512"))
_BIG = 1e30


def interval_entries(tbox, o, d, mask):
    """Bundle-interval slab test of masked lanes against all tiles.

    tbox: (n_tiles, 8) rows [lo3|hi3|valid|pad]; o, d: (C, 3);
    mask: (C,) bool.  Returns (hit (n_tiles,), entry (n_tiles,))."""
    sel = mask & np.isfinite(d).all(1) & np.isfinite(o).all(1)
    if not sel.any():
        return np.zeros(len(tbox), bool), np.full(len(tbox), _BIG)
    o_lo, o_hi = o[sel].min(0), o[sel].max(0)
    d_lo, d_hi = d[sel].min(0), d[sel].max(0)
    lb = np.full(len(tbox), -_BIG)
    ub = np.full(len(tbox), _BIG)
    lbs = np.zeros((len(tbox), 3))
    ubs = np.zeros((len(tbox), 3))
    for ax in range(3):
        mixed = (d_lo[ax] <= 0.0) and (d_hi[ax] >= 0.0)
        if mixed:
            lbs[:, ax] = -_BIG
            ubs[:, ax] = _BIG
            continue
        da = d_lo[ax] if abs(d_lo[ax]) >= 1e-12 else 1e-12
        db = d_hi[ax] if abs(d_hi[ax]) >= 1e-12 else 1e-12
        inv = np.array([1.0 / da, 1.0 / db])
        i_lo, i_hi = inv.min(), inv.max()
        cand = []
        for f in (tbox[:, ax], tbox[:, 3 + ax]):
            u_lo = f - o_hi[ax]
            u_hi = f - o_lo[ax]
            cand.append(np.stack([u_lo * i_lo, u_lo * i_hi,
                                  u_hi * i_lo, u_hi * i_hi]))
        allc = np.concatenate(cand, axis=0)
        lbs[:, ax] = allc.min(0)
        ubs[:, ax] = allc.max(0)
    entry = np.maximum(lbs.max(1), 0.0)
    exit_ = ubs.min(1)
    hit = (exit_ >= entry) & (tbox[:, 6] > 0)
    return hit, entry


def analyze_rows(tbox, o, d, t_true, label, t_cap):
    """Per-row candidate counts for strategies A-D."""
    n_rows = o.shape[0] // C
    res = {k: [] for k in "ABCD"}
    for r in range(n_rows):
        ro = o[r * C:(r + 1) * C]
        rd = d[r * C:(r + 1) * C]
        rt = t_true[r * C:(r + 1) * C].copy()
        alive = np.isfinite(rd).all(1)
        hitA, _ = interval_entries(tbox, ro, rd, alive)
        res["A"].append(int(hitA.sum()))
        octs = ((rd[:, 0] < 0) * 1 + (rd[:, 1] < 0) * 2
                + (rd[:, 2] < 0) * 4)
        nB = nC = nD = 0
        for q in range(8):
            m = alive & (octs == q)
            if not m.any():
                continue
            hq, eq = interval_entries(tbox, ro, rd, m)
            cand = np.nonzero(hq)[0]
            nB += len(cand)
            order = cand[np.argsort(eq[cand])]
            # C: stop when entry > max lane t (misses capped at t_cap)
            tq = np.where(np.isfinite(rt[m]) & (rt[m] < _BIG), rt[m], t_cap)
            tmax = tq.max() if len(tq) else 0.0
            stop = np.searchsorted(eq[order], tmax, side="right")
            nC += min(int(stop) + 1, len(order))
            # D: ignore miss lanes entirely
            th = rt[m]
            th = th[np.isfinite(th) & (th < _BIG)]
            tmaxd = th.max() if len(th) else 0.0
            stopd = np.searchsorted(eq[order], tmaxd, side="right")
            nD += min(int(stopd) + 1, len(order))
        res["B"].append(nB)
        res["C"].append(nC)
        res["D"].append(nD)
    out = {}
    for k, v in res.items():
        v = np.array(v)
        out[k] = (v.mean(), np.median(v), v.sum())
    print(f"{label}: rows={n_rows}")
    for k in "ABCD":
        m, md, s = out[k]
        print(f"  {k}: mean {m:7.1f}  median {md:7.1f}  total/frame {s:8d}")
    return out


def morton_pixel_order(res):
    """Pixel permutation: linear id -> Morton (Z-order), so each C-lane
    row is a compact 2D block (32x16 at C=512) instead of 2 scanlines."""
    xs = np.arange(res)
    def spread(v):
        v = v.astype(np.uint64)
        v = (v | (v << 16)) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v << 8)) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << 4)) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << 2)) & np.uint64(0x3333333333333333)
        v = (v | (v << 1)) & np.uint64(0x5555555555555555)
        return v
    yy, xx = np.meshgrid(xs, xs, indexing="ij")
    code = spread(xx.ravel()) | (spread(yy.ravel()) << np.uint64(1))
    return np.argsort(code, kind="stable")


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    b, cam = builtin_scene("stress", res, res)
    scene = b.compile()
    T = scene.geometry.tri_v.shape[0]
    mscene, _ = MK.morton_permuted_scene(scene)
    tbox = np.asarray(MK.prepare_tile_aabbs(mscene, MK.TRI_TILE))
    print(f"stress T={T} tiles={len(tbox)} res={res}")
    diag = np.linalg.norm(tbox[:, 3:6].max(0) - tbox[:, 0:3].min(0))

    o, d = generate_rays(cam.inv_projection, cam.inv_view, res, res, xp=jnp)
    o = np.asarray(o, np.float64)
    d = np.asarray(d, np.float64)
    tr = jax.jit(lambda o, d: trace_rays(scene.bvh, scene.geometry, o, d))
    h = tr(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32))
    tri = np.asarray(h["tri"])
    t = np.asarray(h["t"], np.float64)
    analyze_rows(tbox, o, d, t, "primary", diag)

    # bounce rays: cosine-sample around the geometric normal at each hit
    g = scene.geometry
    tv = np.asarray(g.tri_v)
    pos = np.asarray(g.positions)
    hitm = tri >= 0
    p_hit = o + t[:, None] * d / np.linalg.norm(d, axis=1, keepdims=True)
    # recompute hit point with unnormalized d as the kernel does
    p_hit = o + t[:, None] * d
    n = np.zeros_like(o)
    e1 = pos[tv[tri[hitm], 1]] - pos[tv[tri[hitm], 0]]
    e2 = pos[tv[tri[hitm], 2]] - pos[tv[tri[hitm], 0]]
    nn = np.cross(e1, e2)
    nn /= np.maximum(np.linalg.norm(nn, axis=1, keepdims=True), 1e-20)
    # face toward the incoming ray
    flip = (nn * d[hitm]).sum(1) > 0
    nn[flip] *= -1
    n[hitm] = nn
    rng = np.random.default_rng(0)
    u1 = rng.random(len(o))
    u2 = rng.random(len(o))
    r_ = np.sqrt(u1)
    phi = 2 * np.pi * u2
    local = np.stack([r_ * np.cos(phi), r_ * np.sin(phi),
                      np.sqrt(np.maximum(1 - u1, 0))], 1)
    # ONB
    up = np.where(np.abs(n[:, 2:3]) < 0.999, np.float64([[0, 0, 1]]),
                  np.float64([[1, 0, 0]]))
    tx = np.cross(up, n)
    tx /= np.maximum(np.linalg.norm(tx, axis=1, keepdims=True), 1e-20)
    ty = np.cross(n, tx)
    bd = (local[:, 0:1] * tx + local[:, 1:2] * ty + local[:, 2:3] * n)
    bo = p_hit + n * 1e-3
    bd[~hitm] = np.nan                     # dead lanes
    h2 = tr(jnp.asarray(np.nan_to_num(bo), jnp.float32),
            jnp.asarray(np.nan_to_num(bd, nan=1.0), jnp.float32))
    t2 = np.asarray(h2["t"], np.float64)
    t2[~hitm] = np.inf
    analyze_rows(tbox, bo, bd, t2, "bounce1", diag)

    # Morton pixel->lane order: each row becomes a compact 32x16 block,
    # shrinking bounce-origin spread (the killer per the linear rows)
    perm = morton_pixel_order(res)
    analyze_rows(tbox, o[perm], d[perm], t[perm], "primary/morton", diag)
    analyze_rows(tbox, bo[perm], bd[perm], t2[perm], "bounce1/morton", diag)

    # E: RAY SORTING between bounces — regroup bounce rays across rows by
    # (origin cell Morton, direction octant).  Dead lanes (primary miss)
    # sort to the end and compact away.
    lo = tbox[:, 0:3].min(0)
    hi = tbox[:, 3:6].max(0)
    for cells, label in ((16, "bounce1/sort16"), (32, "bounce1/sort32"),
                         (64, "bounce1/sort64")):
        cell = np.clip(((bo - lo) / (hi - lo) * cells).astype(np.int64),
                       0, cells - 1)
        def spread3(v):
            v = v.astype(np.uint64)
            v = (v | (v << 32)) & np.uint64(0x1F00000000FFFF)
            v = (v | (v << 16)) & np.uint64(0x1F0000FF0000FF)
            v = (v | (v << 8)) & np.uint64(0x100F00F00F00F00F)
            v = (v | (v << 4)) & np.uint64(0x10C30C30C30C30C3)
            v = (v | (v << 2)) & np.uint64(0x1249249249249249)
            return v
        morton3 = (spread3(cell[:, 0]) | (spread3(cell[:, 1]) << np.uint64(1))
                   | (spread3(cell[:, 2]) << np.uint64(2)))
        octs = ((bd[:, 0] < 0) * 1 + (bd[:, 1] < 0) * 2
                + (bd[:, 2] < 0) * 4).astype(np.uint64)
        key = (morton3 << np.uint64(3)) | octs
        key[~hitm] = np.uint64(0xFFFFFFFFFFFFFFFF)   # dead lanes last
        sperm = np.argsort(key, kind="stable")
        live = int(hitm.sum()) // C * C               # whole live rows
        analyze_rows(tbox, bo[sperm][:live], bd[sperm][:live],
                     t2[sperm][:live], label, diag)

    # G: distance-ordered sweep with per-lane completion, NO sorting —
    # candidates from the row's interval test, visited in ascending
    # ball-distance from the row origin centroid; the row stops when all
    # lanes' REACH (max distance from centroid to their segment end,
    # capped at scene exit) is below the frontier.  Implementable inside
    # the existing kernel (distance thresholds as sweep passes).
    def scene_exit_t(o_, d_):
        """Per-lane slab exit from the scene bounds (unnormalized d)."""
        with np.errstate(divide="ignore", invalid="ignore"):
            t1 = (lo[None] - o_) / d_
            t2_ = (hi[None] - o_) / d_
        tex = np.minimum(t1, t2_)
        tfar = np.maximum(t1, t2_)
        return np.maximum(np.nanmin(tfar, axis=1), 0.0)

    c_tile = (tbox[:, 0:3] + tbox[:, 3:6]) * 0.5
    rad = np.linalg.norm(tbox[:, 3:6] - tbox[:, 0:3], axis=1) * 0.5

    def analyze_dist(o_, d_, t_, label):
        n_rows = len(o_) // C
        tot = 0
        per = []
        for r in range(n_rows):
            ro = o_[r * C:(r + 1) * C]
            rd = d_[r * C:(r + 1) * C]
            rt = t_[r * C:(r + 1) * C].copy()
            alive = np.isfinite(rd).all(1)
            if not alive.any():
                per.append(0)
                continue
            hq, _ = interval_entries(tbox, ro, rd, alive)
            cand = np.nonzero(hq)[0]
            c_row = ro[alive].mean(0)
            dist = np.maximum(
                np.linalg.norm(c_tile[cand] - c_row, axis=1) - rad[cand], 0.0)
            order = cand[np.argsort(dist)]
            dsort = np.sort(dist)
            texit = scene_exit_t(ro[alive], rd[alive])
            tseg = np.minimum(np.where(np.isfinite(rt[alive]), rt[alive],
                                       np.inf), texit)
            dn = np.linalg.norm(rd[alive], axis=1)
            end = ro[alive] + (tseg * 0.999)[:, None] * rd[alive]
            reach = np.maximum(np.linalg.norm(ro[alive] - c_row, axis=1),
                               np.linalg.norm(end - c_row, axis=1))
            frontier = reach.max()
            n_swept = int(np.searchsorted(dsort, frontier, side="right"))
            # NOTE: assumes the sweep's running t catches up with the true
            # t by the time the frontier passes it (distance order makes
            # this hold up to the ball-bound slack)
            tot += n_swept
            per.append(n_swept)
        per = np.array(per)
        print(f"{label}: mean {per.mean():7.1f} median "
              f"{np.median(per):7.1f} total/frame {tot:8d}")

    analyze_dist(bo[perm], bd[perm], t2[perm], "bounce1/morton+dist(G)")

    okey = (((bd[:, 0] < 0) * 1 + (bd[:, 1] < 0) * 2
             + (bd[:, 2] < 0) * 4).astype(np.uint64) << np.uint64(45))
    cell = np.clip(((bo - lo) / (hi - lo) * 32).astype(np.int64), 0, 31)
    m3 = ((cell[:, 0] * 32 + cell[:, 1]) * 32 + cell[:, 2]).astype(np.uint64)
    okey = okey | m3
    okey[~hitm] = np.uint64(1) << np.uint64(60)
    op_ = np.argsort(okey, kind="stable")
    live = int(hitm.sum()) // C * C
    analyze_dist(bo[op_][:live], bd[op_][:live], t2[op_][:live],
                 "bounce1/octsort+dist(E2)")

    # F2: survival compaction with ball-distance frontiers — octant-major
    # sorted rows; each round a row sweeps its K nearest candidate tiles
    # (ball distance from the row origin centroid) past the row's
    # frontier; a lane is DONE when its segment ball (capped at its
    # scene-box exit) lies inside the frontier; survivors re-compact.
    texit_all = scene_exit_t(np.nan_to_num(bo),
                             np.nan_to_num(bd, nan=1.0))
    # H: two-level tiles — each 256-tri tile carries 8 sub-boxes of 32
    # tris; a candidate tile's sweep covers only the sub-boxes the row's
    # interval reaches.  Composes multiplicatively with any candidate
    # strategy; measured here as mean passing sub-boxes per candidate.
    g = scene.geometry  # NOTE: must match mscene's triangle order
    mtv = np.asarray(mscene.geometry.tri_v)
    mpos = np.asarray(mscene.geometry.positions)
    t_lo = np.minimum(np.minimum(mpos[mtv[:, 0]], mpos[mtv[:, 1]]),
                      mpos[mtv[:, 2]])
    t_hi = np.maximum(np.maximum(mpos[mtv[:, 0]], mpos[mtv[:, 1]]),
                      mpos[mtv[:, 2]])
    TT_, SUB = 256, 32
    n_tiles = len(tbox)
    nsub = TT_ // SUB
    sub_lo = np.full((n_tiles * nsub, 3), 1e30)
    sub_hi = np.full((n_tiles * nsub, 3), -1e30)
    Tn = len(mtv)
    for k in range(n_tiles * nsub):
        sl = slice(k * SUB, min((k + 1) * SUB, Tn))
        if sl.start >= Tn:
            sub_lo[k] = 0
            sub_hi[k] = -1            # empty
            continue
        sub_lo[k] = t_lo[sl].min(0)
        sub_hi[k] = t_hi[sl].max(0)
    subbox = np.concatenate([sub_lo, sub_hi,
                             (sub_hi >= sub_lo).all(1, keepdims=True) * 1.0,
                             np.zeros((n_tiles * nsub, 1))], 1)

    def analyze_subtiles(o_, d_, label):
        n_rows = len(o_) // C
        tot_tiles = 0
        tot_subs = 0
        for r in range(n_rows):
            ro = o_[r * C:(r + 1) * C]
            rd = d_[r * C:(r + 1) * C]
            alive = np.isfinite(rd).all(1)
            if not alive.any():
                continue
            hq, _ = interval_entries(tbox, ro, rd, alive)
            cand = np.nonzero(hq)[0]
            hs, _ = interval_entries(subbox, ro, rd, alive)
            hs = hs.reshape(n_tiles, nsub)
            tot_tiles += len(cand)
            tot_subs += int(hs[cand].sum())
        print(f"{label}: cand tiles/frame {tot_tiles:8d}  passing "
              f"sub-boxes {tot_subs:8d}  ({tot_subs / max(tot_tiles, 1):.2f}"
              f"/8 per tile -> sweep-cost x{tot_subs / max(tot_tiles, 1) / 8:.2f})")

    analyze_subtiles(o[perm], d[perm], "primary/morton/subtiles")
    analyze_subtiles(bo[perm], bd[perm], "bounce1/morton/subtiles")
    analyze_subtiles(bo[op_][:live], bd[op_][:live],
                     "bounce1/octsort/subtiles")

    # L: two-level per-lane-scheduled sweep (in-kernel design candidate).
    # Supergroups (SG) of 32 Morton-contiguous tiles; per-lane EXACT slab
    # entries to each SG box (cheap: ~25x20 vector ops/row); SGs visited
    # in ascending min-lane entry with per-lane completion (t_seg <= min
    # entry over unswept SGs); inside an SG, tile candidates come from
    # the interval of the lanes still NEEDING that SG — intervals tighten
    # as lanes finish, so far SGs are swept only for the few survivors.
    SGT = 32
    n_sg = (len(tbox) + SGT - 1) // SGT
    sg_lo = np.stack([tbox[s * SGT:(s + 1) * SGT, 0:3].min(0)
                      for s in range(n_sg)])
    sg_hi = np.stack([tbox[s * SGT:(s + 1) * SGT, 3:6].max(0)
                      for s in range(n_sg)])

    def lane_entries(o_, d_, blo, bhi, tlim):
        """Per-lane slab entry to each box; inf when missed/beyond."""
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = 1.0 / np.where(np.abs(d_) < 1e-20, 1e-20, d_)
        t1 = (blo[None] - o_[:, None]) * inv[:, None]
        t2_ = (bhi[None] - o_[:, None]) * inv[:, None]
        tn = np.maximum(np.minimum(t1, t2_).max(2), 0.0)   # (C, n_box)
        tf = np.maximum(t1, t2_).min(2)
        ok = (tf >= tn) & (tn <= tlim[:, None])
        return np.where(ok, tn, np.inf)

    def analyze_two_level(o_, d_, t_, label):
        texit = scene_exit_t(np.nan_to_num(o_), np.nan_to_num(d_, nan=1.0))
        n_rows = len(o_) // C
        tot_tiles = 0
        tot_sg_steps = 0
        for r in range(n_rows):
            ro = np.nan_to_num(o_[r * C:(r + 1) * C])
            rd_raw = d_[r * C:(r + 1) * C]
            rd = np.nan_to_num(rd_raw, nan=0.0)
            alive0 = np.isfinite(rd_raw).all(1)
            tlim = np.where(alive0, texit[r * C:(r + 1) * C], -1.0)
            ent = lane_entries(ro, rd, sg_lo, sg_hi, tlim)   # (C, n_sg)
            # per-lane true segment length (param t units)
            tseg = np.where(np.isfinite(t_[r * C:(r + 1) * C]),
                            t_[r * C:(r + 1) * C],
                            texit[r * C:(r + 1) * C]) * 1.0001
            tseg = np.where(alive0, tseg, -1.0)
            unswept = np.ones(n_sg, bool)
            done = ~alive0 | ~np.isfinite(ent).any(1)
            order = np.argsort(np.where(np.isfinite(ent), ent, np.inf)
                               .min(0))
            for s in order:
                need = ~done & np.isfinite(ent[:, s]) & (ent[:, s] <= tseg)
                unswept[s] = False
                if not need.any():
                    continue
                tot_sg_steps += 1
                # tile candidates inside SG s from the NEEDING lanes only
                sl = slice(s * SGT, min((s + 1) * SGT, len(tbox)))
                hq, _ = interval_entries(tbox[sl], ro[need], rd[need],
                                         np.ones(int(need.sum()), bool))
                tot_tiles += int(hq.sum())
                # lanes complete when no unswept SG can contain a closer hit
                rem = np.where(np.isfinite(ent[:, unswept]),
                               ent[:, unswept], np.inf)
                min_rem = rem.min(1) if rem.shape[1] else np.full(C, np.inf)
                done |= tseg <= min_rem
            per_pre = 8  # per-lane SG-entry pre-pass ~ 8 tile-step units
            tot_tiles += per_pre
        print(f"{label}: tiles/frame {tot_tiles:8d}  sg_steps {tot_sg_steps:7d}"
              f" (+{n_rows * 8} pre-pass units incl.)")

    analyze_two_level(o[perm], d[perm], t[perm], "primary/morton/2LVL")
    analyze_two_level(bo[perm], bd[perm], t2[perm], "bounce1/morton/2LVL")
    analyze_two_level(bo[op_][:live], bd[op_][:live], t2[op_][:live],
                      "bounce1/octsort/2LVL")

    # I: the FLOOR for row-granularity sweeps — tiles that ANY lane's true
    # segment [origin, hit] (or [origin, scene exit] for misses) actually
    # intersects.  No row-level scheduler can sweep fewer tiles and stay
    # exact; the gap between a strategy and this floor is its headroom.
    def analyze_floor(o_, d_, t_, label):
        texit = scene_exit_t(np.nan_to_num(o_), np.nan_to_num(d_, nan=1.0))
        tlim = np.minimum(np.where(np.isfinite(t_), t_ * 1.0001, np.inf),
                          texit)
        n_rows = len(o_) // C
        tot = 0
        per = []
        for r in range(n_rows):
            ro = o_[r * C:(r + 1) * C]
            rd = np.nan_to_num(d_[r * C:(r + 1) * C], nan=0.0)
            rl = tlim[r * C:(r + 1) * C]
            alive = np.isfinite(d_[r * C:(r + 1) * C]).all(1)
            rl = np.where(alive, rl, -1.0)
            with np.errstate(divide="ignore", invalid="ignore"):
                inv = 1.0 / np.where(np.abs(rd) < 1e-20, 1e-20, rd)
            t1 = (tbox[None, :, 0:3] - ro[:, None]) * inv[:, None]  # (C,NT,3)
            t2_ = (tbox[None, :, 3:6] - ro[:, None]) * inv[:, None]
            tn = np.maximum(np.minimum(t1, t2_).max(2), 0.0)
            tf = np.maximum(t1, t2_).min(2)
            hit = (tf >= tn) & (tn <= rl[:, None]) & (tbox[None, :, 6] > 0)
            n_t = int(hit.any(0).sum())
            tot += n_t
            per.append(n_t)
        per = np.array(per)
        print(f"{label}: mean {per.mean():7.1f} median "
              f"{np.median(per):7.1f} total/frame {tot:8d}")

    analyze_floor(o[perm], d[perm], t[perm], "primary/morton/FLOOR")
    analyze_floor(bo[perm], bd[perm], t2[perm], "bounce1/morton/FLOOR")
    analyze_floor(bo[op_][:live], bd[op_][:live], t2[op_][:live],
                  "bounce1/octsort/FLOOR")

    dn_all = np.linalg.norm(np.nan_to_num(bd, nan=1.0), axis=1)
    tseg_all = np.minimum(np.where(np.isfinite(t2), t2, np.inf),
                          texit_all) * dn_all      # segment length, world units
    for K in (16, 32, 64):
        idx = op_[:int(hitm.sum())].copy()
        rho = np.zeros(len(bo))                     # per-lane covered radius
        total = 0
        rounds = 0
        while len(idx) and rounds < 48:
            rounds += 1
            n_rows = (len(idx) + C - 1) // C
            surv = []
            for r in range(n_rows):
                ri = idx[r * C:(r + 1) * C]
                hq, _ = interval_entries(tbox, bo[ri], bd[ri],
                                         np.ones(len(ri), bool))
                cand = np.nonzero(hq)[0]
                c_row = bo[ri].mean(0)
                dist = np.maximum(np.linalg.norm(
                    c_tile[cand] - c_row, axis=1) - rad[cand], 0.0)
                off = np.linalg.norm(bo[ri] - c_row, axis=1)
                f0 = max((rho[ri] - off).min(), 0.0)
                dwin = np.sort(dist[dist >= f0])
                n_sw = min(K, len(dwin))
                total += n_sw
                th = dwin[n_sw - 1] if n_sw and n_sw == K else np.inf
                rho[ri] = np.maximum(rho[ri], th - off)
                done = tseg_all[ri] <= rho[ri]
                surv.append(ri[~done])
            idx = (np.concatenate(surv) if surv
                   else np.array([], np.int64))
        print(f"bounce1/ballcompactK{K}: total/frame {total:8d} "
              f"rounds={rounds} leftover={len(idx)}")

    # F: survival compaction — sorted rows sweep their K nearest candidate
    # tiles (by bundle entry); lanes whose best t is below the next
    # unswept tile's entry are DONE; survivors re-compact into fresh rows
    # each round.  Per-ray occlusion is what makes per-ray work small in
    # a dense scene; this is the bundle-granularity way to harvest it.
    cell = np.clip(((bo - lo) / (hi - lo) * 32).astype(np.int64), 0, 31)
    key = ((cell[:, 0] * 32 + cell[:, 1]) * 32 + cell[:, 2]) * 8 + (
        (bd[:, 0] < 0) * 1 + (bd[:, 1] < 0) * 2 + (bd[:, 2] < 0) * 4)
    key[~hitm] = 1 << 60
    sperm = np.argsort(key, kind="stable")
    live = int(hitm.sum())
    for K in (8, 16, 32):
        idx = sperm[:live].copy()
        total = 0
        rounds = 0
        while len(idx) and rounds < 64:
            rounds += 1
            n_rows = (len(idx) + C - 1) // C
            survivors = []
            for r in range(n_rows):
                ri = idx[r * C:(r + 1) * C]
                hq, eq = interval_entries(
                    tbox, bo[ri], bd[ri], np.ones(len(ri), bool))
                cand = np.nonzero(hq)[0]
                order = cand[np.argsort(eq[cand])]
                swept = order[:K]
                total += len(swept)
                next_e = eq[order[K]] if len(order) > K else np.inf
                # per-lane done: true hit below the unswept frontier
                # (the sim uses the oracle t as the sweep's result — the
                # kernel gets the same t from actually testing the tiles)
                tq = t2[ri]
                done = (tq <= next_e + 1e-6)
                survivors.append(ri[~done])
            idx = np.concatenate(survivors) if survivors else np.array([], np.int64)
        print(f"bounce1/compactK{K}: total/frame {total:8d} rounds={rounds}")


if __name__ == "__main__":
    main()
