"""Compile-probe megakernel variants on the real TPU to isolate VMEM
scoped-stack pressure.  Usage: python probe_mk.py <sampler> <R> [frames]"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    sampler = sys.argv[1] if len(sys.argv) > 1 else "cosine"
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    frames = int(sys.argv[3]) if len(sys.argv) > 3 else R

    from fypraytracer_tpu.config import RenderSettings, SamplingTechnique
    from fypraytracer_tpu.render.megakernel import (MegakernelRenderer,
                                                    make_megakernel,
                                                    prepare_scene_tables,
                                                    prepare_light_table)
    from fypraytracer_tpu.scene.sceneio import builtin_scene

    res = os.environ.get("PROBE_RES", "256x256")  # WxH
    W, H = (int(v) for v in res.split("x"))
    builder, cam = builtin_scene(os.environ.get("PROBE_SCENE", "cornell"),
                                 W, H)
    # PROBE_DUP=k duplicates every mesh k-1 extra times: same geometry
    # density / shading work / light tree as the base scene but k x the
    # table sizes + tile count — isolates "per-iteration cost grows with
    # T" (PERF.md #19) from scene content
    dup = int(os.environ.get("PROBE_DUP", "1"))
    if dup > 1:
        import copy
        base = list(builder.meshes)
        for _ in range(dup - 1):
            for m in base:
                builder.meshes.append(copy.deepcopy(m))
    scene = builder.compile()

    from fypraytracer_tpu.render import megakernel as mkmod
    bounces = int(os.environ.get("PROBE_BOUNCES", "2"))
    lanes = int(os.environ.get("PROBE_LANES", str(mkmod.RAY_LANES)))
    tt = int(os.environ.get("PROBE_TT", str(mkmod.TRI_TILE)))
    cull_env = os.environ.get("PROBE_CULL", "auto")
    cull = None if cull_env == "auto" else bool(int(cull_env))

    mscene, _ = mkmod.morton_permuted_scene(scene)
    taabb = mkmod.prepare_tile_aabbs(mscene, tt)
    dscene = jax.tree_util.tree_map(jnp.asarray, mscene)
    wn, wu, wv, A = mkmod.build_attr_matrix(dscene, tt)
    P = jnp.concatenate([wn, wu, wv,
                         jnp.zeros((A.shape[0], 4), jnp.float32)], axis=1)
    AT = A.T
    L, depth = prepare_light_table(dscene)
    depth = int(os.environ.get("PROBE_DEPTH", str(depth)))
    render = make_megakernel(W, H, bounces=bounces, samples=1,
                             sky_color=(0.05, 0.06, 0.08), n_frames=frames,
                             n_tris=scene.geometry.tri_v.shape[0],
                             sampler=sampler, n_light_nodes=L.shape[1],
                             light_depth=depth, frame_group=R,
                             ray_lanes=lanes, tri_tile=tt, cull=cull)
    cam_mats = jnp.concatenate([jnp.asarray(cam.inv_projection),
                                jnp.asarray(cam.inv_view)], axis=0)
    frame0 = jnp.asarray([[1]], jnp.int32)
    t0 = time.perf_counter()
    out = render(cam_mats, P, AT, frame0, L=L, TAABB=taabb)
    v = float(jax.jit(lambda x: x.ravel()[0])(out))
    t1 = time.perf_counter()
    print(f"COMPILE+RUN OK sampler={sampler} R={R} frames={frames} "
          f"first={v:.4f} wall={t1 - t0:.1f}s", flush=True)
    # steady-state timing
    t0 = time.perf_counter()
    out = render(cam_mats, P, AT, frame0, L=L, TAABB=taabb)
    float(jax.jit(lambda x: x.ravel()[0])(out))
    dt = time.perf_counter() - t0 - 0.4
    print(f"steady: {dt*1000:.1f} ms total, {dt*1000/frames:.2f} ms/frame",
          flush=True)


if __name__ == "__main__":
    main()
