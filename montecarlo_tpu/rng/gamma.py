"""Exact branch-free Gamma variates for Pallas kernels (f32 inverse CDF).

The variance-gamma subordinator needs Gamma(a, scale=nu) increments with
a = dt/nu typically *far* below 1 (daily grid, nu ~ 0.2 -> a ~ 0.02).
Rejection samplers (Marsaglia-Tsang, numpy, `jax.random.gamma`) use
data-dependent while-loops — unusable inside a fused Pallas time loop and
incompatible with the (seed, stream, path, t) counter contract (draw count
per step must be static).  This module samples by CDF inversion instead,
split by the boost identity (Devroye 1986, IX.3; numpy uses it for
shape < 1)::

    Gamma(a)  =d  Gamma(1 + a) * U^(1/a),        a in (0, 1]

so the hard inversion happens only at shape b = 1 + a in (1, 2] — where
the density is bounded, unimodal, and Newton converges fast — and the
small-shape singularity is carried by the *algebraically exact* power
``U^(1/a) = exp(log(U)/a)``.

All pieces are fixed-iteration compositions of f32 mul/add plus the
repo's accurate `exp32`/`log32` (DEVNOTES "TPU transcendental accuracy"),
so they are Mosaic-safe (no captured constant arrays, no data-dependent
control flow) and bitwise identical across CPU/XLA/Pallas — the same
contract as `ndtri32`.

Accuracy (tested against scipy.special.gammaincinv / stats.gamma in
tests/test_gamma_rng.py): quantile relative error <= 1.6e-6 over
u in [1e-6, 1 - 6e-8], b in (1, 2]; sample moments and KS pass at both
moderate and tiny shapes.  Underflow: U^(1/a) for tiny a underflows f32
below exp(-88) — those increments round to 0 (relative error of the
*sum* over a path is ~1e-7; the affected quantiles are <= 1e-38 where
f64 scipy itself is within a few hundred ULPs of underflow).
"""

from __future__ import annotations

import jax.numpy as jnp

from montecarlo_tpu.rng.normal import exp32, log32, ndtri32

# Iteration counts tuned to the f32 floor (max quantile error 1.6e-6 vs
# f64 scipy over u in [1e-6, 1-6e-8] x b in (1, 2] — identical to the
# 26/26/6 "safe" setting, ~2x cheaper; re-run the sweep in
# tests/test_gamma_rng.py when touching these).
_N_SERIES = 20   # lower-gamma series terms (x <= b+1 <= 3: term_20 ~ 1e-9)
_N_CF = 18       # upper-gamma Lentz iterations (x >= b+1)
_N_NEWTON = 4    # log-Newton quantile steps (WH / small-u seeded)


def gamma1p32(a):
    """Gamma(1 + a) for a in [0, 1] — Abramowitz-Stegun 6.1.36 minimax
    polynomial (|error| <= 3e-7, below f32 round-off at these magnitudes).
    Scalar python constants only (Pallas-safe)."""
    a = jnp.asarray(a, jnp.float32)
    p = jnp.float32(0.035868343)
    p = p * a + jnp.float32(-0.193527818)
    p = p * a + jnp.float32(0.482199394)
    p = p * a + jnp.float32(-0.756704078)
    p = p * a + jnp.float32(0.918206857)
    p = p * a + jnp.float32(-0.897056937)
    p = p * a + jnp.float32(0.988205891)
    p = p * a + jnp.float32(-0.577191652)
    return p * a + jnp.float32(1.0)


def expneg_wide32(x):
    """exp(x) for x in [-88, 0] — extends `exp32` (domain |x| <= 20) to the
    full f32 underflow range by squaring: exp(x) = exp32(x/8)^8.  Relative
    error ~8x exp32's (~1e-7); below exp(-87.3) the result underflows to 0
    (subnormals flush on TPU), the correct graceful limit for the boost
    factor U^(1/a) at tiny shapes."""
    x = jnp.asarray(x, jnp.float32)
    x = jnp.clip(x, jnp.float32(-88.0), jnp.float32(0.0))
    e = exp32(x * jnp.float32(0.125))
    e2 = e * e
    e4 = e2 * e2
    return e4 * e4


def _lower_series(b, x):
    """Sum of the lower-incomplete-gamma series: P(b, x) = prefactor *
    sum_{n>=0} x^n / ((b+1)...(b+n)), accurate for x <= b + 1."""
    term = jnp.ones_like(x)
    acc = jnp.ones_like(x)
    for n in range(1, _N_SERIES):
        term = term * x / (b + jnp.float32(n))
        acc = acc + term
    return acc


def _upper_cf(b, x):
    """Lentz continued fraction for the upper tail: Q(b, x) = prefactor *
    cf, accurate for x >= b + 1 (Numerical Recipes gcf form)."""
    tiny = jnp.float32(1e-30)
    bb = x + jnp.float32(1.0) - b
    c = jnp.full_like(x, jnp.float32(1e30))
    d = jnp.float32(1.0) / jnp.maximum(bb, tiny)
    h = d
    for i in range(1, _N_CF):
        an = -jnp.float32(i) * (jnp.float32(i) - b)
        bb = bb + jnp.float32(2.0)
        d = an * d + bb
        d = jnp.where(jnp.abs(d) < tiny, tiny, d)
        c = bb + an / c
        c = jnp.where(jnp.abs(c) < tiny, tiny, c)
        d = jnp.float32(1.0) / d
        h = h * d * c
    return h


def gamma_icdf_boost32(b, u):
    """Quantile x = P^{-1}(b, u) of Gamma(b, 1) for shape b in (1, 2].

    Newton on the regularized incomplete gamma, branch-free: the residual
    uses the lower series where x < b+1 and the upper continued fraction
    beyond (evaluating the tail as (1-u) - Q avoids the 1-P cancellation
    exactly where it matters), with one shared prefactor x^b e^{-x}.
    Seeds: Wilson-Hilferty in the body, the exact small-x expansion
    (u * Gamma(b+1))^(1/b) below it; 4 damped log-Newton steps land at the
    f32 rounding floor for u in [1e-6, 1 - 6e-8] (tested vs scipy)."""
    u = jnp.asarray(u, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    g1p = gamma1p32(b - jnp.float32(1.0))       # Gamma(b)
    gb1 = b * g1p                               # Gamma(b+1)
    inv_gb = jnp.float32(1.0) / g1p
    inv_gb1 = jnp.float32(1.0) / gb1

    # Wilson-Hilferty seed (clipped positive), small-u seed below it.
    z = ndtri32(jnp.clip(u, jnp.float32(6e-8), jnp.float32(1.0 - 6e-8)))
    c = jnp.float32(1.0) / (jnp.float32(9.0) * b)
    wh = b * (jnp.float32(1.0) - c + z * jnp.sqrt(c)) ** 3
    x_small = exp32(log32(u * gb1) / b)
    x = jnp.where(u < jnp.float32(0.02), x_small,
                  jnp.clip(wh, jnp.float32(1e-8), jnp.float32(40.0)))

    uq = jnp.float32(1.0) - u
    log_u = log32(u)
    log_uq = log32(uq)
    for _ in range(_N_NEWTON):
        logx = log32(jnp.maximum(x, jnp.float32(1e-30)))
        pref = expneg_wide32(jnp.clip(b * logx - x,
                                      jnp.float32(-88.0), jnp.float32(0.0)))
        use_series = x < b + jnp.float32(1.0)
        # Unselected branch still evaluates: keep both finite everywhere.
        p_low = pref * inv_gb1 * _lower_series(b, jnp.minimum(x, b + 1.0))
        q_high = pref * inv_gb * _upper_cf(b, jnp.maximum(x, b + 1.0))
        pdf = pref * inv_gb / jnp.maximum(x, jnp.float32(1e-30))
        # Newton in LOG probability — near-linear in both tails, so no
        # body/tail oscillation (plain Newton overshoots back and forth in
        # the strongly convex upper tail; measured 1.5% residuals there).
        # Residuals: log P - log u (series side), log Q - log uq (CF side,
        # sign flipped since Q decreases in x).
        step = jnp.where(
            use_series,
            (log32(jnp.maximum(p_low, jnp.float32(1e-35))) - log_u)
            * p_low / jnp.maximum(pdf, jnp.float32(1e-35)),
            -(log32(jnp.maximum(q_high, jnp.float32(1e-35))) - log_uq)
            * q_high / jnp.maximum(pdf, jnp.float32(1e-35)))
        # Damp: never move more than a factor of 2 down or +8 up per step.
        step = jnp.clip(step, -jnp.float32(8.0), x * jnp.float32(0.5))
        x = jnp.clip(x - step, jnp.float32(1e-12), jnp.float32(44.0))
    return x


def gamma_from_uniforms32(a, u_w, u_boost):
    """One Gamma(a, 1) variate from two independent uniforms, a in (0, 1]:
    W * U^(1/a) with W = Gamma(1+a) by CDF inversion (exact boost
    identity).  Branch-free, Pallas-safe; returns 0 where the boost factor
    underflows f32 (quantiles <= ~1e-38)."""
    a = jnp.asarray(a, jnp.float32)
    w = gamma_icdf_boost32(a + jnp.float32(1.0), u_w)
    return w * expneg_wide32(log32(u_boost) / a)


__all__ = ["gamma1p32", "expneg_wide32", "gamma_icdf_boost32",
           "gamma_from_uniforms32"]
