"""TPU benchmark: megakernel on a chosen builtin scene with the new
texture + tile-cull paths.

Usage: probe_room.py <scene> <sampler> [frames] [res]
Env: PROBE_CULL=0|1|auto (default auto), PROBE_TEX=0|1 (default auto)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "room"
    sampler = sys.argv[2] if len(sys.argv) > 2 else "nee"
    frames = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    res_arg = sys.argv[4] if len(sys.argv) > 4 else "256"
    if "x" in res_arg:
        res_w, res_h = (int(v) for v in res_arg.split("x"))
    else:
        res_w = res_h = int(res_arg)

    from fypraytracer_tpu.render import megakernel as MK
    from fypraytracer_tpu.scene.sceneio import builtin_scene

    builder, cam = builtin_scene(scene_name, res_w, res_h)
    scene = builder.compile()
    T = scene.geometry.tri_v.shape[0]

    mscene, _ = MK.morton_permuted_scene(scene)
    taabb = MK.prepare_tile_aabbs(mscene, MK.TRI_TILE)
    dscene = jax.tree_util.tree_map(jnp.asarray, mscene)
    P, AT = MK.prepare_scene_tables(dscene)
    L, depth = MK.prepare_light_table(dscene)

    cull_env = os.environ.get("PROBE_CULL", "auto")
    cull = None if cull_env == "auto" else bool(int(cull_env))
    sparse = bool(int(os.environ.get("PROBE_SPARSE", "0")))
    tiled_env = os.environ.get("PROBE_TILED", "auto")
    tiled = None if tiled_env == "auto" else bool(int(tiled_env))
    tbox = MK.prepare_tile_boxes_lanes(mscene, MK.TRI_TILE) if sparse \
        else None
    tex_on = bool(int(os.environ.get("PROBE_TEX", "1"))) \
        and MK.scene_is_textured(scene)
    txp = txb = tex_shapes = None
    if tex_on:
        txp, txb, tex_shapes = MK.prepare_texture_tables(scene.textures)

    lanes = int(os.environ.get("PROBE_LANES", "0")) \
        or MK._pick_ray_lanes(res_w * res_h)
    rg_env = os.environ.get("PROBE_RG")
    ch_env = os.environ.get("PROBE_CH")
    render = MK.make_megakernel(
        res_w, res_h, bounces=2, samples=1, sky_color=(0.05, 0.06, 0.08),
        n_frames=frames, n_tris=T, sampler=sampler,
        n_light_nodes=L.shape[1], light_depth=depth, frame_group=8,
        ray_lanes=lanes, tex_shapes=tex_shapes,
        cull=cull, sparse=sparse, tiled_pixels=tiled,
        row_groups=int(rg_env) if rg_env else None,
        chunk_rows=int(ch_env) if ch_env else None)
    cam_mats = jnp.concatenate([jnp.asarray(cam.inv_projection),
                                jnp.asarray(cam.inv_view)], axis=0)
    frame0 = jnp.asarray([[1]], jnp.int32)
    kw = dict(L=L, TXP=txp, TXB=txb, TAABB=taabb, TBOX=tbox)
    t0 = time.perf_counter()
    out = render(cam_mats, P, AT, frame0, **kw)
    v = float(jax.jit(lambda x: x.ravel()[0])(out))
    t1 = time.perf_counter()
    print(f"COMPILE+RUN OK scene={scene_name} sampler={sampler} T={T} "
          f"tiles={taabb.shape[0]} cull={cull} sparse={sparse} "
          f"tex={tex_on} res={res_w}x{res_h} lanes={lanes} "
          f"first={v:.4f} wall={t1 - t0:.1f}s", flush=True)
    fence = jax.jit(lambda x: x.ravel()[0])
    t0 = time.perf_counter()
    out = render(cam_mats, P, AT, frame0, **kw)
    float(fence(out))
    wall = time.perf_counter() - t0
    # per-run host/tunnel overhead measured with an empty fenced dispatch
    # (not the old baked-in 0.4 s constant, ADVICE r3)
    t0 = time.perf_counter()
    float(fence(frame0))
    host = time.perf_counter() - t0
    dt = max(wall - host, 0.0)
    rays = res_w * res_h * (1 + 2 * 2) if sampler == "nee" \
        else res_w * res_h * 3
    print(f"steady: wall={wall*1000:.1f} ms, host_fence={host*1000:.1f} ms, "
          f"device~{dt*1000:.1f} ms, {dt*1000/frames:.2f} ms/frame, "
          f"{rays / (dt / frames) / 1e6:.1f} M rays/s", flush=True)


if __name__ == "__main__":
    main()
