"""RNG layer tests: cipher correctness, distribution quality, reproducibility."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from montecarlo_tpu.rng import (
    categorical_draw,
    normal_draw,
    normal_matrix,
    random_bits,
    threefry2x32,
    uniform_draw,
    uniform_from_bits,
)


def test_threefry_matches_jax_reference():
    """Our Threefry-2x32 must agree bit-for-bit with JAX's own implementation."""
    prng = pytest.importorskip("jax._src.prng")
    rng = np.random.default_rng(0)
    k = rng.integers(0, 2**32, size=2, dtype=np.uint32)
    c0 = rng.integers(0, 2**32, size=128, dtype=np.uint32)
    c1 = rng.integers(0, 2**32, size=128, dtype=np.uint32)

    ours0, ours1 = threefry2x32(k[0], k[1], c0, c1)
    theirs = prng.threefry_2x32(jnp.asarray(k), jnp.concatenate(
        [jnp.asarray(c0), jnp.asarray(c1)]))
    theirs0, theirs1 = theirs[:128], theirs[128:]
    np.testing.assert_array_equal(np.asarray(ours0), np.asarray(theirs0))
    np.testing.assert_array_equal(np.asarray(ours1), np.asarray(theirs1))


def test_threefry_known_answer_vectors():
    """Random123 published known-answer tests for Threefry-2x32, 20 rounds."""
    # counter=(0,0), key=(0,0)
    x0, x1 = threefry2x32(0, 0, 0, 0)
    assert (int(x0), int(x1)) == (0x6B200159, 0x99BA4EFE)
    # counter=(0xffffffff, 0xffffffff), key=(0xffffffff, 0xffffffff)
    x0, x1 = threefry2x32(0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF)
    assert (int(x0), int(x1)) == (0x1CB996FC, 0xBB002BE7)
    # counter=(0x243f6a88, 0x85a308d3), key=(0x13198a2e, 0x03707344)
    x0, x1 = threefry2x32(0x13198A2E, 0x03707344, 0x243F6A88, 0x85A308D3)
    assert (int(x0), int(x1)) == (0xC4923A9C, 0x483DF7A0)


def test_uniform_open_interval():
    bits = jnp.array([0, 1, 2**32 - 1, 2**31], dtype=jnp.uint32)
    u = uniform_from_bits(bits)
    assert np.all(np.asarray(u) > 0.0)
    assert np.all(np.asarray(u) < 1.0)


def test_normal_moments():
    n = 1 << 20
    ids = jnp.arange(n, dtype=jnp.uint32)
    z = np.asarray(normal_draw(seed=42, stream=0, path_ids=ids, draw_index=0))
    se = 1.0 / np.sqrt(n)
    assert abs(z.mean()) < 5 * se
    assert abs(z.std() - 1.0) < 5 * se
    # Excess kurtosis of a standard normal is 0; std-err ~ sqrt(24/n).
    kurt = ((z - z.mean()) ** 4).mean() / z.var() ** 2 - 3.0
    assert abs(kurt) < 5 * np.sqrt(24.0 / n)


def test_consecutive_draws_consume_both_halves():
    """Draws m and m+1 (even m) come from one cipher call but must differ."""
    ids = jnp.arange(1024, dtype=jnp.uint32)
    z0 = np.asarray(normal_draw(7, 0, ids, 0))
    z1 = np.asarray(normal_draw(7, 0, ids, 1))
    z2 = np.asarray(normal_draw(7, 0, ids, 2))
    assert not np.allclose(z0, z1)
    assert not np.allclose(z0, z2)
    # Correlation between the Box-Muller cos/sin halves should be tiny.
    assert abs(np.corrcoef(z0, z1)[0, 1]) < 0.1


def test_streams_are_independent():
    ids = jnp.arange(4096, dtype=jnp.uint32)
    a = np.asarray(normal_draw(3, 0, ids, 5))
    b = np.asarray(normal_draw(3, 1, ids, 5))
    assert not np.allclose(a, b)
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.1


def test_draws_shard_invariant():
    """Splitting the path axis must not change any draw (counter-based)."""
    ids = jnp.arange(8192, dtype=jnp.uint32)
    full = np.asarray(normal_draw(11, 0, ids, 3))
    parts = [
        np.asarray(normal_draw(11, 0, ids[i : i + 1024], 3))
        for i in range(0, 8192, 1024)
    ]
    np.testing.assert_array_equal(full, np.concatenate(parts))


def test_normal_matrix_convention():
    """normal_matrix(t, D) must equal elementwise normal_draw at m = t*D + d."""
    ids = jnp.arange(128, dtype=jnp.uint32)
    D, t = 3, 7
    mat = np.asarray(normal_matrix(99, 0, ids, t=t, n_draws=D))
    for d in range(D):
        ref = np.asarray(normal_draw(99, 0, ids, t * D + d))
        np.testing.assert_array_equal(mat[:, d], ref)


def test_categorical_uniformity():
    n_cat = 17
    ids = jnp.arange(1 << 16, dtype=jnp.uint32)
    idx = np.asarray(categorical_draw(5, 2, ids, 0, n_cat))
    assert idx.min() >= 0 and idx.max() < n_cat
    counts = np.bincount(idx, minlength=n_cat)
    expected = len(idx) / n_cat
    # chi-square-ish sanity: each bin within 5 sigma of expectation
    assert np.all(np.abs(counts - expected) < 5 * np.sqrt(expected))


def test_jit_and_eager_agree():
    ids = jnp.arange(2048, dtype=jnp.uint32)
    eager = normal_draw(1, 0, ids, 4)
    jitted = jax.jit(lambda i: normal_draw(1, 0, i, 4))(ids)
    np.testing.assert_array_equal(np.asarray(eager), np.asarray(jitted))


def test_uniform_draw_moments():
    ids = jnp.arange(1 << 18, dtype=jnp.uint32)
    u = np.asarray(uniform_draw(21, 0, ids, 0))
    n = len(u)
    assert abs(u.mean() - 0.5) < 5 / np.sqrt(12 * n)
    assert abs(u.var() - 1 / 12) < 5e-3


def test_random_bits_shapes_broadcast():
    b0, b1 = random_bits(0, 0, jnp.zeros((4, 8), jnp.uint32), jnp.uint32(3))
    assert b0.shape == (4, 8) and b1.shape == (4, 8)
