"""Variance swaps vs closed forms; counterparty exposure profiles (EPE/PFE/
CVA) for a Vasicek swap."""

import math

import numpy as np
import jax.numpy as jnp

from montecarlo_tpu.engine.exposure import exposure_profile, swap_value_fn
from montecarlo_tpu.engine.functionals import variance_swap_strike_mc
from montecarlo_tpu.processes import GBM, Heston, Vasicek


def test_variance_swap_strike_gbm():
    """Under GBM: E[sum (dlog S)^2] = n (m^2 dt^2 + sigma^2 dt), exactly."""
    sigma, mu, T, n = 0.2, 0.05, 1.0, 252
    dt = T / n
    proc = GBM.create(100.0, mu, sigma, dt, dtype=jnp.float64)
    est = variance_swap_strike_mc(proc, 1 << 16, n, T=T, seed=3,
                                  dtype=jnp.float64)
    m = mu - 0.5 * sigma**2
    want = n * (m * m * dt * dt + sigma * sigma * dt) / T
    assert abs(float(est["strike"]) - want) < 4 * float(est["std_err"])


def test_variance_swap_strike_heston():
    """Under Heston: E[int v dt]/T = theta + (v0-theta)(1-e^{-kT})/(kT)."""
    v0, kappa, theta, T, n = 0.09, 2.0, 0.04, 1.0, 256
    proc = Heston.create(s0=100.0, v0=v0, mu=0.0, kappa=kappa, theta=theta,
                         xi=0.3, rho=-0.5, dt=T / n, dtype=jnp.float64)
    est = variance_swap_strike_mc(proc, 1 << 16, n, T=T, seed=5,
                                  dtype=jnp.float64)
    want = theta + (v0 - theta) * (1 - math.exp(-kappa * T)) / (kappa * T)
    # O(dt) Euler bias allowance on top of MC error
    assert abs(float(est["strike"]) - want) < 4 * float(est["std_err"]) \
        + 0.003, (est, want)


R0, KAPPA, THETA, SIG = 0.03, 0.6, 0.04, 0.012
T, N_STEPS = 2.0, 64


def _profile(hazard=0.0):
    model = Vasicek.create(R0, KAPPA, THETA, SIG, T / N_STEPS,
                           dtype=jnp.float64)
    pay_times = np.arange(1, 5) * 0.5  # semiannual over 2y
    vfn = swap_value_fn(model, strike=0.035, payment_times=pay_times,
                        pay_dt=0.5)
    return model, vfn, exposure_profile(
        model, vfn, 1 << 14, N_STEPS, T=T, seed=7, hazard_rate=hazard)


def test_epe_profile_shape():
    model, vfn, prof = _profile()
    epe = np.asarray(prof["epe"])
    pfe = np.asarray(prof["pfe"])
    # t=0 exposure is deterministic: EPE(0) = max(V_0, 0)
    r0 = jnp.full((16,), R0, jnp.float64)
    v0 = float(vfn(r0, jnp.float64(0.0))[0])
    assert abs(epe[0] - max(v0, 0.0)) < 1e-12
    # all payments past at T: exposure dies
    assert epe[-1] < 1e-12
    # PFE dominates EPE where exposure probability is material (the 95th
    # percentile is legitimately 0 when P(V>0) < 5%, while the mean isn't)
    peak = int(np.argmax(epe))
    assert pfe[peak] >= epe[peak]
    assert np.all(pfe >= 0)
    # effective EPE is the running max
    eepe = np.asarray(prof["eepe"])
    assert np.all(np.diff(eepe) >= -1e-15)
    assert abs(eepe.max() - epe.max()) < 1e-15


def test_cva_scales_with_hazard():
    _, _, p0 = _profile(hazard=0.0)
    _, _, p1 = _profile(hazard=0.01)
    _, _, p2 = _profile(hazard=0.02)
    assert float(p0["cva"]) == 0.0
    assert 0.0 < float(p1["cva"]) < float(p2["cva"])
    # small-hazard linearity: cva(2l) ~ 2 cva(l) within 5%
    assert abs(float(p2["cva"]) / float(p1["cva"]) - 2.0) < 0.1
