"""RNG: PCG hash semantics + numpy/jax bit-parity (the foundation of every
seed-matched oracle test)."""

import numpy as np

from fypraytracer_tpu.core import rng


def _pcg_ref(x: int) -> int:
    """Pure-python uint32 reference of MathUtils.cuh:47-52."""
    mask = 0xFFFFFFFF
    state = (x * 747796405 + 2891336453) & mask
    word = (((state >> ((state >> 28) + 4)) ^ state) * 277803737) & mask
    return ((word >> 22) ^ word) & mask


def test_pcg_hash_matches_reference_semantics():
    xs = np.array([0, 1, 42, 123456789, 0xFFFFFFFF], np.uint32)
    got = rng.pcg_hash(xs)
    want = np.array([_pcg_ref(int(x)) for x in xs], np.uint32)
    np.testing.assert_array_equal(got, want)


def test_numpy_jax_bit_parity():
    import jax.numpy as jnp

    xs = np.arange(1000, dtype=np.uint32) * np.uint32(2654435761)
    np_hash = rng.pcg_hash(xs)
    jx_hash = np.asarray(rng.pcg_hash(jnp.asarray(xs)))
    np.testing.assert_array_equal(np_hash, jx_hash)

    key = rng.path_key(xs, 7, 3)
    jkey = np.asarray(rng.path_key(jnp.asarray(xs), jnp.uint32(7), jnp.uint32(3)))
    np.testing.assert_array_equal(key, jkey)

    k2, u = rng.next_uniform(key)
    jk2, ju = rng.next_uniform(jnp.asarray(key))
    np.testing.assert_array_equal(k2, np.asarray(jk2))
    np.testing.assert_array_equal(u, np.asarray(ju))


def test_uniform_distribution():
    key = rng.path_key(np.arange(200_000, dtype=np.uint32), 1, 0)
    _, u = rng.next_uniform(key)
    assert 0.0 <= u.min() and u.max() <= 1.0
    assert abs(u.mean() - 0.5) < 2e-3
    # counter-based keys decorrelate adjacent pixels
    assert abs(np.corrcoef(u[:-1], u[1:])[0, 1]) < 0.01


def test_key_streams_independent():
    pix = np.arange(1000, dtype=np.uint32)
    k1 = rng.path_key(pix, 1, 0)
    k2 = rng.path_key(pix, 2, 0)
    k3 = rng.path_key(pix, 1, 1)
    assert (k1 != k2).mean() > 0.999
    assert (k1 != k3).mean() > 0.999
