"""Probe Mosaic lowering of two candidate stage-buffer access mechanisms
for the lane-layout ReSTIR megakernel:

  1. ``pltpu.roll`` with a DYNAMIC (SMEM scalar) lane shift — needed to
     assemble an unaligned neighbor window from two aligned stage tiles;
  2. in-kernel (128, 128) transpose — fallback if roll doesn't lower.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def roll_kernel(s_ref, x_ref, o_ref):
    o_ref[:] = pltpu.roll(x_ref[:], s_ref[0, 0], axis=1)


def transpose_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:].T + 1.0


def main():
    x = jnp.arange(16 * 128, dtype=jnp.float32).reshape(16, 128)
    s = jnp.asarray([[37]], jnp.int32)
    f = pl.pallas_call(
        roll_kernel,
        in_specs=[pl.BlockSpec((1, 1), lambda: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((16, 128), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, 128), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
    )
    y = jax.jit(f)(s, x)
    want = jnp.roll(x, 37, axis=1)
    print("dynamic roll:", "OK" if bool(jnp.all(y == want)) else "WRONG",
          flush=True)

    x2 = jnp.arange(128 * 128, dtype=jnp.float32).reshape(128, 128)
    g = pl.pallas_call(
        transpose_kernel,
        in_specs=[pl.BlockSpec((128, 128), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((128, 128), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
    )
    y2 = jax.jit(g)(x2)
    print("transpose-in-kernel:",
          "OK" if bool(jnp.all(y2 == x2.T + 1.0)) else "WRONG", flush=True)


if __name__ == "__main__":
    main()
