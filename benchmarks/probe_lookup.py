"""Microbenchmark: one-hot attribute row-fetch cost vs table size.

Usage: probe_lookup.py <T> [fetches_per_frame] [frames] [chunk]
Times a kernel that does N ``rows_lookup`` fetches (rr=8 rows each) per
frame over a synthetic (40, T) table.  ``chunk`` > 0 uses the chunked
one-hot (bounded VMEM) variant.
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
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 7680
    nfetch = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    frames = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    chunk = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    from fypraytracer_tpu.render.megakernel import (_NR_MAX, _RS, _SURF_ROWS,
                                                    build_rows_lookup)
    C = 512
    G = 128
    RS = _RS

    def kernel(frame_ref, a_ref, out_ref, lkin, bank):
        lane = jax.lax.broadcasted_iota(jnp.int32, (RS, C), 1)
        rows_lookup = build_rows_lookup(lkin, bank, C, RS, _NR_MAX,
                                        chunk=chunk)

        def frame_body(fi, acc):
            idx = (lane * 37 + fi) % T
            a = acc
            for j in range(nfetch):
                rw = rows_lookup(a_ref, T, (idx + j) % T, _SURF_ROWS)
                a = a + rw[_SURF_ROWS[0]]
            return a

        acc = jax.lax.fori_loop(0, frame_ref[0, 0], frame_body,
                                jnp.zeros((RS, C), jnp.float32))
        out_ref[:] = acc

    full = lambda i: (0, 0)
    f = pl.pallas_call(
        kernel, grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 1), full, memory_space=pltpu.SMEM),
            pl.BlockSpec((40, T), full, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RS, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((RS * G, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((RS, C), jnp.int32),
            pltpu.VMEM((_NR_MAX * RS, C), jnp.float32),
        ],
    )
    fj = jax.jit(f)
    A = jnp.ones((40, T), jnp.float32)
    n_arr = jnp.asarray([[frames]], jnp.int32)
    out = fj(n_arr, A)
    float(jax.jit(lambda x: x.ravel()[0])(out))
    t0 = time.perf_counter()
    out = fj(n_arr, A)
    float(jax.jit(lambda x: x.ravel()[0])(out))
    dt = time.perf_counter() - t0 - 0.4
    per = dt * 1000 / frames / nfetch
    print(f"T={T} fetches={nfetch} chunk={chunk} frames={frames}: "
          f"{dt*1000:.1f} ms total, {per:.3f} ms per rr=8 fetch", flush=True)


if __name__ == "__main__":
    main()
