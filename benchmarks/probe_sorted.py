"""On-hardware A/B of the E2 sorted-trace design (VERDICT r4 task #6).

PERF.md #27 settled the log-scaling question with SIMULATION counts on the
real stress scene: sorting bounce rays by (origin cell, octant) before the
sparse sweep would cut candidate tile-visits from ~84k (shipped Morton
pixel rows) to ~48.7k per bounce — predicted <= 1.3x end-to-end, shelved
as below the complexity bar.  This probe buys that conclusion its missing
evidence: a TPU timing of the EXACT proxy the verdict asked for —
presorted ray order fed to the existing sparse kernel.

Method: generate the stress scene's real first-bounce rays on CPU
(identical to probe_octant_sim.py: primary trace + cosine sample around
the geometric normal, seed 0), then time a trace-only Pallas kernel
(build_trace_sparse over the HBM-resident plane table — the shipped
big-scene trace, verbatim) on the SAME ray set in two orders:

  morton — rays grouped by Morton-ordered pixel id (what the shipped
           tiled_pixels row mapping produces for bounce rays);
  e2     — rays sorted by (origin-cell-32 Morton, direction octant),
           dead lanes (primary miss) compacted to the tail (their rays
           are replaced by a common out-of-scene stub so both orders
           trace the same lane count).

Equal-frames A/B interleaved in one session => fair in any single service
state (PERF.md #26); the anchorless ratio is the deliverable.

Run: python -u benchmarks/probe_sorted.py [frames=8] [reps=3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fence(x):
    return float(jax.jit(lambda v: v.ravel()[0])(x))


def make_bounce_rays(res: int = 256):
    """Stress-scene first-bounce rays (cosine around the geometric normal)
    — the exact generation of benchmarks/probe_octant_sim.py:161-207."""
    from fypraytracer_tpu.core.camera import generate_rays
    from fypraytracer_tpu.ops.traverse import trace_rays
    from fypraytracer_tpu.scene.sceneio import builtin_scene

    b, cam = builtin_scene("stress", res, res)
    scene = b.compile()
    o, d = generate_rays(cam.inv_projection, cam.inv_view, res, res, xp=np)
    o = np.asarray(o, np.float64)
    d = np.asarray(d, np.float64)
    tr = jax.jit(lambda o, d: trace_rays(scene.bvh, scene.geometry, o, d))
    h = tr(jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32))
    tri = np.asarray(h["tri"])
    t = np.asarray(h["t"], np.float64)

    g = scene.geometry
    tv = np.asarray(g.tri_v)
    pos = np.asarray(g.positions)
    hitm = tri >= 0
    p_hit = o + t[:, None] * d
    n = np.zeros_like(o)
    e1 = pos[tv[tri[hitm], 1]] - pos[tv[tri[hitm], 0]]
    e2 = pos[tv[tri[hitm], 2]] - pos[tv[tri[hitm], 0]]
    nn = np.cross(e1, e2)
    nn /= np.maximum(np.linalg.norm(nn, axis=1, keepdims=True), 1e-20)
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
    up = np.where(np.abs(n[:, 2:3]) < 0.999, np.float64([[0, 0, 1]]),
                  np.float64([[1, 0, 0]]))
    tx = np.cross(up, n)
    tx /= np.maximum(np.linalg.norm(tx, axis=1, keepdims=True), 1e-20)
    ty = np.cross(n, tx)
    bd = local[:, 0:1] * tx + local[:, 1:2] * ty + local[:, 2:3] * n
    bo = p_hit + n * 1e-3
    return scene, bo, bd, hitm


def morton_pixel_order(res):
    yy, xx = np.divmod(np.arange(res * res), res)

    def spread(v):
        v = v.astype(np.uint64)
        v = (v | (v << 16)) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v << 8)) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << 4)) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << 2)) & np.uint64(0x3333333333333333)
        v = (v | (v << 1)) & np.uint64(0x5555555555555555)
        return v

    return np.argsort(spread(xx) | (spread(yy) << np.uint64(1)),
                      kind="stable")


def e2_order(bo, bd, hitm, tbox, cells=32):
    """(origin cell Morton, direction octant) sort, dead lanes last —
    probe_octant_sim.py's E2 keys (its best sorted design)."""
    lo = tbox[:, 0:3].min(0)
    hi = tbox[:, 3:6].max(0)
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
    key[~hitm] = np.uint64(0xFFFFFFFFFFFFFFFF)
    return np.argsort(key, kind="stable")


def build_probe(T, NT, n_frames, C=512, interpret=False):
    """Trace-only sparse/HBM kernel: per grid step, one (1, C) ray row
    swept ``n_frames`` times through build_trace_sparse (the shipped
    big-scene closest-hit trace, megakernel.py:1087)."""
    from fypraytracer_tpu.render.megakernel import (
        _RS, TRI_TILE, build_trace_sparse)

    TT = TRI_TILE

    def kernel(ray_ref, p_ref, tbox_ref, out_ref, rayin, trout, trouti,
               candst, ptile0, ptile1, psem0, psem1):
        trace = build_trace_sparse(p_ref, tbox_ref, rayin, trout, trouti,
                                   candst, C, TT, T, _RS,
                                   p_hbm=(ptile0, ptile1, psem0, psem1))

        def frame_body(fi, acc):
            wob = fi.astype(jnp.float32) * 1e-12   # defeat hoisting only
            t, _, _, _, _ = trace(ray_ref[0:1, :], ray_ref[1:2, :],
                                  ray_ref[2:3, :], ray_ref[3:4, :] + wob,
                                  ray_ref[4:5, :], ray_ref[5:6, :])
            return acc + jnp.minimum(t, 1e6)

        acc = jax.lax.fori_loop(0, n_frames, frame_body,
                                jnp.zeros((1, C), jnp.float32))
        out_ref[:] = jnp.concatenate(
            [acc, jnp.zeros((7, C), jnp.float32)], axis=0)

    full = lambda i: (0, 0)

    def run(rays, P, TBOX):
        G = rays.shape[0] // 8
        if P.shape[1] < 128:
            P = jnp.pad(P, ((0, 0), (0, 128 - P.shape[1])))
        if TBOX.shape[1] < NT:
            TBOX = jnp.pad(TBOX, ((0, 0), (0, NT - TBOX.shape[1])))
        return pl.pallas_call(
            kernel, grid=(G,),
            in_specs=[
                pl.BlockSpec((8, C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((8, NT), full, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rays.shape[0], C), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((6 * _RS, C), jnp.float32),
                pltpu.VMEM((3 * _RS, C), jnp.float32),
                pltpu.VMEM((_RS, C), jnp.int32),
                pltpu.VMEM((NT, 1), jnp.float32),
                pltpu.VMEM((TT, 128), jnp.float32),
                pltpu.VMEM((TT, 128), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=interpret,
        )(rays, P, TBOX)

    return run


def pack_rays(bo, bd, C=512):
    """(B,) rays -> (8*G, C) blocks: rows 0-5 = ox..dz, 6-7 zero pad."""
    B = len(bo)
    G = B // C
    comps = [bo[:, 0], bo[:, 1], bo[:, 2], bd[:, 0], bd[:, 1], bd[:, 2]]
    out = np.zeros((G, 8, C), np.float32)
    for ci, v in enumerate(comps):
        out[:, ci, :] = v.reshape(G, C)
    return out.reshape(8 * G, C)


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    interpret = bool(int(os.environ.get("PROBE_INTERPRET", "0")))
    res = int(os.environ.get("PROBE_RES", "256"))

    from fypraytracer_tpu.render import megakernel as MK

    scene, bo, bd, hitm = make_bounce_rays(res)
    mscene, _ = MK.morton_permuted_scene(scene)
    dscene = jax.tree_util.tree_map(jnp.asarray, mscene)
    P, _ = MK.prepare_scene_tables(dscene)
    tbox_lanes = MK.prepare_tile_boxes_lanes(mscene, MK.TRI_TILE)
    tbox = np.asarray(MK.prepare_tile_aabbs(mscene, MK.TRI_TILE))
    n_tris = scene.geometry.tri_v.shape[0]
    T = n_tris + ((-n_tris) % MK.TRI_TILE)
    NT = max((((T // MK.TRI_TILE) + 127) // 128) * 128, 128)

    # dead lanes: common out-of-scene stub so both orders trace the same
    # lane count and dead-only rows compact to ~zero candidates
    lo = tbox[:, 0:3].min(0)
    stub_o = lo - 1000.0
    stub_d = np.float64([0.0, 0.0, 1e-6])
    bo2, bd2 = bo.copy(), bd.copy()
    bo2[~hitm] = stub_o
    bd2[~hitm] = stub_d

    orders = {
        "morton": morton_pixel_order(res),
        "e2": e2_order(bo2, bd2, hitm, tbox),
    }
    ray_packs = {k: jnp.asarray(pack_rays(bo2[p], bd2[p]))
                 for k, p in orders.items()}

    run = build_probe(T, NT, frames, interpret=interpret)
    fj = jax.jit(run)
    if int(os.environ.get("PROBE_VALIDATE", "0")):
        # the probe's sparse trace must agree with the oracle on hit t
        from fypraytracer_tpu.ops.traverse import trace_rays

        p = orders["morton"]
        out = np.asarray(fj(ray_packs["morton"], P, tbox_lanes))
        t_probe = out.reshape(-1, 8, 512)[:, 0, :].ravel() / frames
        h = jax.jit(lambda o, d: trace_rays(scene.bvh, scene.geometry,
                                            o, d))(
            jnp.asarray(bo2[p], jnp.float32), jnp.asarray(bd2[p], jnp.float32))
        t_ref = np.minimum(np.where(np.asarray(h["t"]) < 0, 1e6,
                                    np.asarray(h["t"])), 1e6)
        rel = np.abs(t_probe - t_ref) / np.maximum(np.abs(t_ref), 1e-3)
        print(f"validate: {float((rel > 1e-3).mean()):.5f} frac mismatched, "
              f"median {float(np.median(rel)):.2e}", flush=True)
        assert (rel > 1e-3).mean() < 0.005, "sparse probe disagrees w/ oracle"
    results = {k: [] for k in orders}
    for k, rays in ray_packs.items():           # compile + warm
        _fence(fj(rays, P, tbox_lanes))
    for rep in range(reps):
        for k, rays in ray_packs.items():       # interleaved = state-fair
            time.sleep(2.5)
            t0 = time.perf_counter()
            out = fj(rays, P, tbox_lanes)
            _fence(out)
            wall = time.perf_counter() - t0
            t0 = time.perf_counter()
            _fence(out)
            host = time.perf_counter() - t0
            results[k].append(max(wall - host, 1e-9))
            print(f"rep {rep} {k}: {results[k][-1]*1000/frames:.2f} ms/frame",
                  flush=True)
    best = {k: min(v) / frames * 1000.0 for k, v in results.items()}
    print(f"BEST morton {best['morton']:.2f} ms/frame | "
          f"e2 {best['e2']:.2f} | speedup {best['morton']/best['e2']:.3f}x "
          f"(sim predicted ~1.7x on this trace-only slice, ~1.3x end-to-end)",
          flush=True)


if __name__ == "__main__":
    main()
