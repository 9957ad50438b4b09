"""Packed MXU basket kernel: layout invariances, oracle parity, moments."""

import jax.numpy as jnp
import numpy as np
import pytest

from montecarlo_tpu.ops.basket_kernel import (
    packed_basket_terminal_pallas,
    packed_basket_terminal_reference,
)
from montecarlo_tpu.processes.basket import BasketGBM


def _basket(a_n, seed=0, dt=1.0 / 64.0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(a_n, a_n))
    corr = q @ q.T
    d = np.sqrt(np.diag(corr))
    corr = corr / np.outer(d, d)
    return BasketGBM.create(
        s0=rng.uniform(50, 150, a_n), mu=rng.uniform(0.0, 0.06, a_n),
        sigma=rng.uniform(0.1, 0.4, a_n), corr=corr,
        weights=np.full(a_n, 1.0 / a_n), dt=dt)


@pytest.mark.parametrize("a_n", [4, 16, 20, 64])
def test_kernel_matches_reference_oracle(a_n):
    basket = _basket(a_n)
    n, steps = 2048, 7
    got = packed_basket_terminal_pallas(basket, n, steps, seed=3,
                                        sub_rows=64, interpret=True)
    want = packed_basket_terminal_reference(basket, n, steps, seed=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=0)


def test_block_size_and_offset_invariance():
    basket = _basket(16)
    n, steps = 4096, 8
    a = packed_basket_terminal_pallas(basket, n, steps, seed=5,
                                      sub_rows=64, interpret=True)
    b = packed_basket_terminal_pallas(basket, n, steps, seed=5,
                                      sub_rows=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Second half recomputed alone via path_offset — shard invariance.
    half = packed_basket_terminal_pallas(basket, n // 2, steps, seed=5,
                                         path_offset=n // 2, sub_rows=64,
                                         interpret=True)
    np.testing.assert_array_equal(np.asarray(a)[n // 2:], np.asarray(half))


@pytest.mark.parametrize("a_n", [16, 32])
def test_basket_moments_match_lognormal_closed_form(a_n):
    """E[basket_T] and Var[basket_T] have closed forms for correlated GBM —
    the kernel must match within MC error (validates the correlation
    matmul, drift/scale tiling, and padding)."""
    basket = _basket(a_n, seed=1)
    steps, n = 16, 1 << 16
    t = float(basket.dt) * steps
    vals = np.asarray(packed_basket_terminal_pallas(
        basket, n, steps, seed=11, sub_rows=128, interpret=True))

    s0 = np.asarray(basket.s0, np.float64)
    mu = np.asarray(basket.mu, np.float64)
    sig = np.asarray(basket.sigma, np.float64)
    w = np.asarray(basket.weights, np.float64)
    chol = np.asarray(basket.chol_flat, np.float64).reshape(a_n, a_n)
    corr = chol @ chol.T

    mean_s = s0 * np.exp(mu * t)
    exact_mean = float(w @ mean_s)
    cov = np.outer(mean_s, mean_s) * (
        np.exp(np.outer(sig, sig) * corr * t) - 1.0)
    exact_var = float(w @ cov @ w)

    se = vals.std(ddof=1) / np.sqrt(n)
    assert abs(vals.mean() - exact_mean) < 4 * se + 1e-6
    # Variance of the sample variance ~ 2 var^2 / n for near-normal sums.
    var_se = exact_var * np.sqrt(2.0 / n)
    assert abs(vals.var(ddof=1) - exact_var) < 6 * var_se


def test_padded_assets_are_inert():
    """A=20 pads to 32: the 12 phantom assets must not move the basket."""
    b20 = _basket(20, seed=2)
    vals = np.asarray(packed_basket_terminal_pallas(
        b20, 4096, 8, seed=7, sub_rows=64, interpret=True))
    assert np.all(np.isfinite(vals)) and np.all(vals > 0)
    # Weighted reference oracle with explicit a_pad math agrees exactly.
    ref = np.asarray(packed_basket_terminal_reference(b20, 4096, 8, seed=7))
    np.testing.assert_allclose(vals, ref, rtol=2e-6)
