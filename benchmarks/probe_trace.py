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
    from fypraytracer_tpu.scene.sceneio import builtin_scene

    scene_name = os.environ.get("PROBE_SCENE", "cornell")
    builder, cam = builtin_scene(scene_name, 256, 256)
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

    loopreps = bool(int(os.environ.get("PROBE_LOOPREPS", "0")))
    bcast = bool(int(os.environ.get("PROBE_BCAST", "0")))
    # add a K2b-style blocked per-tile VMEM input (pipelined DMA per grid
    # step) to test whether block-input pipelining slows the trace loops
    blocked_rows = int(os.environ.get("PROBE_BLOCKED", "0"))
    # frames as an OUTER fori of one-pallas_call-per-frame (the ReSTIR
    # K2b shape) instead of an in-kernel frame loop (the NEE shape)
    outer = bool(int(os.environ.get("PROBE_OUTER", "0")))
    # feed the previous trace's t back into the next rays — forces real
    # serial execution (no hoisting/DCE of "loop-invariant" rays), the
    # shape real kernels have
    feedback = bool(int(os.environ.get("PROBE_FEEDBACK", "0")))

    def kernel(*krefs):
        if blocked_rows:
            (cam_ref, frame_ref, p_ref, nb_ref, out_ref,
             rayin, trout, trouti) = krefs
        else:
            (cam_ref, frame_ref, p_ref, out_ref,
             rayin, trout, trouti) = krefs
        tile = pl.program_id(0)
        cam = cam_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        pix = tile * C + lane
        ox, oy, oz, dx, dy, dz = build_raygen(cam, width, height)(pix)
        if blocked_rows:
            ox = ox + nb_ref[0:1, :] * 1e-20   # keep the block input live
        trace = build_trace(p_ref, rayin, trout, trouti, C, TT, T, _RS)

        def one_rep(wob, accv):
            if bcast:
                # native (rr, C) blocks via broadcast — probes whether the
                # sublane CONCAT of rr (1, C) rows (not the trace) is what
                # makes wide-rr traces slow
                z = jnp.zeros((rr, C), jnp.float32)
                oxs, oys, ozs = z + ox, z + oy, z + oz
                dxs, dys, dzs = z + dx + wob, z + dy, z + dz
            else:
                oxs = jnp.concatenate([ox] * rr, axis=0)
                oys = jnp.concatenate([oy] * rr, axis=0)
                ozs = jnp.concatenate([oz] * rr, axis=0)
                dxs = jnp.concatenate([dx + wob] * rr, axis=0)
                dys = jnp.concatenate([dy] * rr, axis=0)
                dzs = jnp.concatenate([dz] * rr, axis=0)
            t, _, _, _, _ = trace(oxs, oys, ozs, dxs, dys, dzs)
            return accv + jnp.sum(jnp.minimum(t, 1e6), axis=0,
                                  keepdims=True)

        if outer:
            wob0 = frame_ref[0, 0].astype(jnp.float32) * 1e-6
            acc = jnp.zeros((1, C), jnp.float32)
            for rep in range(reps):
                acc = one_rep(wob0 + rep * 1e-6, acc)
            out_ref[:] = jnp.concatenate(
                [acc, jnp.zeros((7, C), jnp.float32)], axis=0)
            return

        if feedback:
            def fb_body(fi, acc):
                a = acc
                for rep in range(reps):
                    z = jnp.zeros((rr, C), jnp.float32)
                    fb = a * 1e-9
                    t, _, _, _, _ = trace(z + ox, z + oy, z + oz,
                                          z + dx + fb, z + dy, z + dz)
                    a = a + jnp.sum(jnp.minimum(t, 1e6), axis=0,
                                    keepdims=True)
                return a

            accf = jax.lax.fori_loop(0, frame_ref[0, 0], fb_body,
                                     jnp.zeros((1, C), jnp.float32))
            out_ref[:] = jnp.concatenate(
                [accf, jnp.zeros((7, C), jnp.float32)], axis=0)
            return

        def frame_body(fi, acc):
            wob = fi.astype(jnp.float32) * 1e-6
            if loopreps:
                # ONE trace instance, reps as a fori_loop — probes whether
                # per-iteration trace cost scales with kernel code size
                # (instruction-fetch pressure) rather than work
                return jax.lax.fori_loop(
                    0, reps,
                    lambda r, a: one_rep(wob + r.astype(jnp.float32) * 1e-6,
                                         a),
                    acc, unroll=False)
            accv = acc
            for rep in range(reps):
                accv = one_rep(wob + rep * 1e-6, accv)
            return accv

        acc = jax.lax.fori_loop(0, frame_ref[0, 0], frame_body,
                                jnp.zeros((1, C), jnp.float32))
        out_ref[:] = jnp.concatenate(
            [acc, jnp.zeros((7, C), jnp.float32)], axis=0)

    full = lambda i: (0, 0)
    in_specs = [
        pl.BlockSpec((8, 4), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), full, memory_space=pltpu.SMEM),
        pl.BlockSpec((T, 16), full, memory_space=pltpu.VMEM),
    ]
    if blocked_rows:
        in_specs.append(pl.BlockSpec((blocked_rows, C), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
    f = pl.pallas_call(
        kernel, grid=(G,),
        in_specs=in_specs,
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
    if outer:
        def many(cam_mats, n_arr, P, *rest):
            def body(fi, acc):
                fr = jnp.asarray(fi, jnp.int32).reshape(1, 1)
                return acc + f(cam_mats, fr, P, *rest)
            return jax.lax.fori_loop(0, frames, body,
                                     jnp.zeros((8 * G, C), jnp.float32))
        fj = jax.jit(many)
    else:
        fj = jax.jit(f)
    n_arr = jnp.asarray([[frames]], jnp.int32)
    args = [cam_mats, n_arr, P]
    if blocked_rows:
        args.append(jnp.zeros((G * blocked_rows, C), jnp.float32))
    out = fj(*args)
    float(jax.jit(lambda x: x.ravel()[0])(out))
    t0 = time.perf_counter()
    out = fj(*args)
    float(jax.jit(lambda x: x.ravel()[0])(out))
    dt = time.perf_counter() - t0 - 0.4
    print(f"reps={reps} rr={rr} TT={TT} blocked={blocked_rows} "
          f"frames={frames}: {dt*1000:.1f} ms total, "
          f"{dt*1000/frames:.3f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
