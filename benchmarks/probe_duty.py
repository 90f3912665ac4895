"""Throttling probe (PERF.md #26): same compiled kernel, varying total
device-busy duration.  If per-frame cost rises with run length (not with
resolution/grid/launch structure), the large-B '1080p inefficiency' is a
sustained-rate limit of the device/service, not a compiler regime.

Usage: probe_duty.py [res] [frames_list_csv] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    res = sys.argv[1] if len(sys.argv) > 1 else "256"
    frames_list = [int(v) for v in
                   (sys.argv[2] if len(sys.argv) > 2 else "64,512").split(",")]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    res_w, res_h = ((int(v) for v in res.split("x")) if "x" in res
                    else (int(res), int(res)))

    from fypraytracer_tpu.render import megakernel as MK
    from fypraytracer_tpu.scene.sceneio import builtin_scene

    scene_name = os.environ.get("PROBE_SCENE", "cornell")
    builder, cam = builtin_scene(scene_name, res_w, res_h)
    scene = builder.compile()
    T = scene.geometry.tri_v.shape[0]
    mscene, _ = MK.morton_permuted_scene(scene)
    taabb = MK.prepare_tile_aabbs(mscene, MK.TRI_TILE)
    dscene = jax.tree_util.tree_map(jnp.asarray, mscene)
    P, AT = MK.prepare_scene_tables(dscene)
    L, depth = MK.prepare_light_table(dscene)
    tex_on = MK.scene_is_textured(scene)
    txp = txb = tex_shapes = None
    if tex_on:
        txp, txb, tex_shapes = MK.prepare_texture_tables(scene.textures)
    cull = T // MK.TRI_TILE >= 8
    cam_mats = jnp.concatenate([jnp.asarray(cam.inv_projection),
                                jnp.asarray(cam.inv_view)], axis=0)
    frame0 = jnp.asarray([[1]], jnp.int32)
    fence = jax.jit(lambda x: x.ravel()[0])
    kw = dict(L=L, TXP=txp, TXB=txb)
    if cull:
        kw["TAABB"] = taabb

    for frames in frames_list:
        render = MK.make_megakernel(
            res_w, res_h, bounces=2, samples=1,
            sky_color=(0.05, 0.06, 0.08), n_frames=frames, n_tris=T,
            sampler="nee", n_light_nodes=L.shape[1], light_depth=depth,
            frame_group=min(8, frames), ray_lanes=512,
            tex_shapes=tex_shapes, cull=cull)
        out = render(cam_mats, P, AT, frame0, **kw)
        float(fence(out))                      # compile + warm
        for rep in range(reps):
            t0 = time.perf_counter()
            out = render(cam_mats, P, AT, frame0, **kw)
            float(fence(out))
            wall = time.perf_counter() - t0
            # per-run host/tunnel overhead: an empty fenced dispatch
            # (replaces the old baked-in 0.4 s constant, ADVICE r3 —
            # short dispatches could print negative "totals")
            t0 = time.perf_counter()
            float(fence(frame0))
            host = time.perf_counter() - t0
            dev = max(wall - host, 0.0)
            print(f"res={res_w}x{res_h} frames={frames} rep={rep} "
                  f"wall={wall*1000:.1f} ms  host_fence={host*1000:.1f} ms "
                  f"device~{dev*1000:.1f} ms  {dev*1000/frames:.3f} ms/frame",
                  flush=True)


def multi():
    """Async-pipelined multi-dispatch: N calls of F frames, fence ONCE.
    If the grace window is per host request, total ~= N * F * burst_rate;
    if device-busy-continuous, total ~= the monolithic throttled time."""
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    F = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    N = int(sys.argv[4]) if len(sys.argv) > 4 else 16

    from fypraytracer_tpu.render import megakernel as MK
    from fypraytracer_tpu.scene.sceneio import builtin_scene

    builder, cam = builtin_scene("cornell", res, res)
    scene = builder.compile()
    T = scene.geometry.tri_v.shape[0]
    mscene, _ = MK.morton_permuted_scene(scene)
    dscene = jax.tree_util.tree_map(jnp.asarray, mscene)
    P, AT = MK.prepare_scene_tables(dscene)
    L, depth = MK.prepare_light_table(dscene)
    cam_mats = jnp.concatenate([jnp.asarray(cam.inv_projection),
                                jnp.asarray(cam.inv_view)], axis=0)
    fence = jax.jit(lambda x: x.ravel()[0])
    add = jax.jit(lambda a, b: a + b)
    render = MK.make_megakernel(
        res, res, bounces=2, samples=1, sky_color=(0.05, 0.06, 0.08),
        n_frames=F, n_tris=T, sampler="nee", n_light_nodes=L.shape[1],
        light_depth=depth, frame_group=8, ray_lanes=512)

    def run_once():
        acc = None
        for k in range(N):
            f0 = jnp.asarray([[1 + k * F]], jnp.int32)
            out = render(cam_mats, P, AT, f0, L=L)
            acc = out if acc is None else add(acc, out)
        return float(fence(acc))

    run_once()                                  # compile + warm
    t0 = time.perf_counter()
    run_once()
    dt = time.perf_counter() - t0
    tot = N * F
    print(f"multi res={res} {N}x{F}f total={dt*1000:.1f} ms "
          f"({dt*1000/tot:.3f} ms/frame incl host)", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "multi":
        multi()
    else:
        main()
