"""Does the sustained-rate credit (PERF.md #26) scale with idle length?

One compiled kernel (cornell NEE, R=8), one dispatch per rep, with
geometrically growing idle sleeps before each rep.  If the bucket has a
hard ~63 ms cap, wall time is flat in idle; if credit accumulates with
idle, wall time falls toward the true device time — which would make
"sleep long, dispatch once" a valid burst-measurement protocol for
dispatches larger than 63 ms.

Usage: probe_idle.py [res] [frames] [idles_csv_seconds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    res = sys.argv[1] if len(sys.argv) > 1 else "1920x1088"
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    idles = [float(v) for v in
             (sys.argv[3] if len(sys.argv) > 3 else "0.5,2,8,30").split(",")]
    res_w, res_h = ((int(v) for v in res.split("x")) if "x" in res
                    else (int(res), int(res)))

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from fypraytracer_tpu.render import megakernel as MK
    from fypraytracer_tpu.scene.sceneio import builtin_scene

    builder, cam = builtin_scene("cornell", res_w, res_h)
    scene = builder.compile()
    T = scene.geometry.tri_v.shape[0]
    mscene, _ = MK.morton_permuted_scene(scene)
    dscene = jax.tree_util.tree_map(jnp.asarray, mscene)
    P, AT = MK.prepare_scene_tables(dscene)
    L, depth = MK.prepare_light_table(dscene)
    render = MK.make_megakernel(
        res_w, res_h, bounces=2, samples=1, sky_color=(0.05, 0.06, 0.08),
        n_frames=frames, n_tris=T, sampler="nee", n_light_nodes=L.shape[1],
        light_depth=depth, frame_group=min(8, frames), ray_lanes=512)
    cam_mats = jnp.concatenate([jnp.asarray(cam.inv_projection),
                                jnp.asarray(cam.inv_view)], axis=0)
    frame0 = jnp.asarray([[1]], jnp.int32)
    fence = jax.jit(lambda x: x.ravel()[0])
    out = render(cam_mats, P, AT, frame0, L=L)
    float(fence(out))                             # compile + warm
    for idle in idles:
        for rep in range(2):
            time.sleep(idle)
            t0 = time.perf_counter()
            out = render(cam_mats, P, AT, frame0, L=L)
            float(fence(out))
            wall = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(fence(out))
            host = time.perf_counter() - t0
            print(f"res={res_w}x{res_h} frames={frames} idle={idle}s rep={rep} "
                  f"wall={wall*1000:.1f} ms host={host*1000:.1f} "
                  f"net={1000*(wall-host):.1f} ms "
                  f"({1000*(wall-host)/frames:.2f} ms/frame)", flush=True)


if __name__ == "__main__":
    main()
