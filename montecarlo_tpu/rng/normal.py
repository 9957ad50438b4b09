"""Uniform and normal variates from Threefry counters.

Everything here is pure `jnp` (traces inside Pallas kernels and in plain JAX)
and keyed only by (seed, stream, global path id, draw index), which is what
makes estimates bitwise reproducible under any sharding — unlike the
reference's unseeded global-RNG draws (reference app.py:620).
"""

from __future__ import annotations

import jax.numpy as jnp

from montecarlo_tpu.rng.threefry import random_bits, threefry2x32

_TWO_PI = 6.283185307179586


def uniform_from_bits(bits, dtype=jnp.float32):
    """Map uint32 bits to a uniform in the *open* interval (0, 1).

    float32 uses the top 23 bits so every value (and the arithmetic producing
    it) is exact: u = ((bits >> 9) + 0.5) * 2^-23  ∈  [2^-24, 1 - 2^-24].
    float64 uses all 32 bits.  Never returns 0 or 1, so log(u) and inverse
    CDFs are always finite.
    """
    dtype = jnp.dtype(dtype)
    if dtype == jnp.float64:
        # Split so each half fits in int32 (Mosaic has no uint32->float cast).
        hi = (bits >> jnp.uint32(1)).astype(jnp.int32).astype(jnp.float64)
        lo = (bits & jnp.uint32(1)).astype(jnp.int32).astype(jnp.float64)
        return (hi * 2.0 + lo + 0.5) * (2.0 ** -32)
    # Top 23 bits -> non-negative int32 -> float32 is exact.
    hi = (bits >> jnp.uint32(9)).astype(jnp.int32).astype(dtype)
    return (hi + dtype.type(0.5)) * dtype.type(2.0 ** -23)


def boxmuller_pair(b0, b1, dtype=jnp.float32):
    """Two independent standard normals from two uint32 bit arrays."""
    u1 = uniform_from_bits(b0, dtype)
    u2 = uniform_from_bits(b1, dtype)
    r = jnp.sqrt(dtype(-2.0) * jnp.log(u1))
    theta = dtype(_TWO_PI) * u2
    return r * jnp.cos(theta), r * jnp.sin(theta)


def normal_pair(seed: int, stream: int, c0, c1, dtype=jnp.float32):
    """The canonical Box-Muller pair for counter (c0, c1)."""
    b0, b1 = random_bits(seed, stream, c0, c1)
    return boxmuller_pair(b0, b1, dtype)


def normal_draw(seed: int, stream: int, path_ids, draw_index, dtype=jnp.float32):
    """One standard normal per (global path id, draw index).

    Draw ``m`` of path ``i`` is component ``m & 1`` of the Box-Muller pair
    generated from counter ``(i, m >> 1)``; consecutive draw indices consume
    both halves of each cipher call so no bits are wasted.

    ``draw_index`` may be a scalar or an array broadcastable with
    ``path_ids``.  For a process with ``D`` draws per step the caller passes
    ``draw_index = t * D + d``.
    """
    m = jnp.asarray(draw_index, jnp.uint32)
    z0, z1 = normal_pair(seed, stream, path_ids, m >> jnp.uint32(1), dtype)
    return jnp.where((m & jnp.uint32(1)) == 0, z0, z1)


def normal_matrix(seed: int, stream: int, path_ids, t: int, n_draws: int,
                  dtype=jnp.float32):
    """``n_draws`` standard normals per path for time step ``t``.

    Returns an array of shape ``path_ids.shape + (n_draws,)``.  Uses the
    draw-index convention ``m = t * n_draws + d`` so the stream is identical
    no matter how paths or steps are blocked.
    """
    d = jnp.arange(n_draws, dtype=jnp.uint32)
    m = jnp.asarray(t).astype(jnp.uint32) * jnp.uint32(n_draws) + d  # (n_draws,)
    ids = jnp.asarray(path_ids, jnp.uint32)[..., None]
    return normal_draw(seed, stream, ids, m, dtype)


def uniform_draw(seed: int, stream: int, path_ids, draw_index,
                 dtype=jnp.float32):
    """One uniform(0,1) per (global path id, draw index) — same convention
    as :func:`normal_draw` (component ``m & 1`` of the 64-bit cipher output
    for counter ``(i, m >> 1)``)."""
    m = jnp.asarray(draw_index, jnp.uint32)
    b0, b1 = random_bits(seed, stream, path_ids, m >> jnp.uint32(1))
    bits = jnp.where((m & jnp.uint32(1)) == 0, b0, b1)
    return uniform_from_bits(bits, dtype)


def categorical_draw(seed: int, stream: int, path_ids, draw_index, n: int):
    """A uniform integer index in [0, n) per (path, draw) — used for the
    GARCH bootstrap's resampling of historical shocks (the TPU-native
    replacement for `np.random.choice`, reference app.py:620)."""
    u = uniform_draw(seed, stream, path_ids, draw_index, jnp.float32)
    idx = jnp.floor(u * jnp.float32(n)).astype(jnp.int32)
    return jnp.minimum(idx, jnp.int32(n - 1))
