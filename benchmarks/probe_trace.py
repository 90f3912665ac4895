"""Micro-benchmark: cost of build_trace calls in a minimal kernel.

Usage: probe_trace.py <reps> <rr> [frames]
Times `reps` batched traces of `rr` ray rows per frame over the cornell
256x256 scene; marginal cost per trace = slope between reps values.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    rr = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    frames = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    from fypraytracer_tpu.render.megakernel import (
        _RS, TRI_TILE, _pick_ray_lanes, build_raygen, build_trace,
        prepare_scene_tables)
    tt_env = int(os.environ.get("PROBE_TT", "0"))
    from fypraytracer_tpu.scene.procedural import cornell_box

    builder, cam = cornell_box(width=256, height=256)
    scene = builder.compile()
    dscene = jax.tree_util.tree_map(jnp.asarray, scene)
    P, AT = prepare_scene_tables(dscene)
    width = height = 256
    B = width * height
    C = _pick_ray_lanes(B)
    TT = tt_env or TRI_TILE
    n_tris = scene.geometry.tri_v.shape[0]
    T = n_tris + ((-n_tris) % TT)
    G = B // C

    def kernel(cam_ref, frame_ref, p_ref, out_ref, rayin, trout, trouti):
        tile = pl.program_id(0)
        cam = cam_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        pix = tile * C + lane
        ox, oy, oz, dx, dy, dz = build_raygen(cam, width, height)(pix)
        trace = build_trace(p_ref, rayin, trout, trouti, C, TT, T, _RS)

        def frame_body(fi, acc):
            wob = fi.astype(jnp.float32) * 1e-6
            accv = acc
            for rep in range(reps):
                oxs = jnp.concatenate([ox] * rr, axis=0)
                oys = jnp.concatenate([oy] * rr, axis=0)
                ozs = jnp.concatenate([oz] * rr, axis=0)
                dxs = jnp.concatenate([dx + wob + rep * 1e-6] * rr, axis=0)
                dys = jnp.concatenate([dy] * rr, axis=0)
                dzs = jnp.concatenate([dz] * rr, axis=0)
                t, _, _, _, _ = trace(oxs, oys, ozs, dxs, dys, dzs)
                accv = accv + jnp.sum(jnp.minimum(t, 1e6), axis=0,
                                      keepdims=True)
            return accv

        acc = jax.lax.fori_loop(0, frame_ref[0, 0], frame_body,
                                jnp.zeros((1, C), jnp.float32))
        out_ref[:] = jnp.concatenate(
            [acc, jnp.zeros((7, C), jnp.float32)], axis=0)

    full = lambda i: (0, 0)
    f = pl.pallas_call(
        kernel, grid=(G,),
        in_specs=[
            pl.BlockSpec((8, 4), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), full, memory_space=pltpu.SMEM),
            pl.BlockSpec((T, 16), full, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8 * G, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((6 * _RS, C), jnp.float32),
            pltpu.VMEM((3 * _RS, C), jnp.float32),
            pltpu.VMEM((_RS, C), jnp.int32),
        ],
    )
    cam_mats = jnp.concatenate([jnp.asarray(cam.inv_projection),
                                jnp.asarray(cam.inv_view)], axis=0)
    fj = jax.jit(f)
    n_arr = jnp.asarray([[frames]], jnp.int32)
    out = fj(cam_mats, n_arr, P)
    float(jax.jit(lambda x: x.ravel()[0])(out))
    t0 = time.perf_counter()
    out = fj(cam_mats, n_arr, P)
    float(jax.jit(lambda x: x.ravel()[0])(out))
    dt = time.perf_counter() - t0 - 0.4
    print(f"reps={reps} rr={rr} TT={TT} frames={frames}: {dt*1000:.1f} ms total, "
          f"{dt*1000/frames:.3f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
