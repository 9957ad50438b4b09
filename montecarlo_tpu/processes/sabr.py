"""SABR stochastic-volatility model (Hagan et al. 2002).

    dF     = sigma_t F^beta dW1        (forward, Euler with absorption guard)
    dsigma = nu sigma_t dW2            (lognormal vol leg, stepped *exactly*)
    d<W1, W2> = rho dt

The desk-standard smile model for rates/FX forwards.  The vol leg is a GBM
so it is stepped by its exact lognormal solution; only the forward leg is
Euler-discretized (full truncation at F=0, the absorbing boundary for
beta < 1).  Two correlated draws per step, tuple state of 2-D arrays —
exactly the Heston layout, so the process is fused-Pallas-kernel eligible.

Validated against the Hagan lognormal implied-vol expansion
(:func:`sabr_hagan_iv`), the industry quoting convention.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from montecarlo_tpu.processes.base import NormalDrawsMixin


class SABRState(NamedTuple):
    f: jnp.ndarray      # forward
    sigma: jnp.ndarray  # instantaneous vol


class SABR(NormalDrawsMixin, NamedTuple("SABRFields", [
        ("f0", jnp.ndarray),
        ("alpha", jnp.ndarray),  # initial vol sigma_0
        ("beta", jnp.ndarray),   # CEV exponent in [0, 1]
        ("nu", jnp.ndarray),     # vol-of-vol
        ("rho", jnp.ndarray),    # corr(forward, vol)
        ("dt", jnp.ndarray),
])):
    """SABR under the forward measure (the forward is driftless)."""

    n_draws = 2

    @classmethod
    def create(cls, f0, alpha, beta, nu, rho, dt, dtype=jnp.float32):
        as_ = lambda v: jnp.asarray(v, dtype)
        return cls(f0=as_(f0), alpha=as_(alpha), beta=as_(beta), nu=as_(nu),
                   rho=as_(rho), dt=as_(dt))

    def init_state(self, path_ids, dtype=jnp.float32) -> SABRState:
        shape = path_ids.shape
        return SABRState(
            f=jnp.full(shape, jnp.asarray(self.f0, dtype), dtype),
            sigma=jnp.full(shape, jnp.asarray(self.alpha, dtype), dtype))

    def step(self, state: SABRState, eps, t) -> SABRState:
        z1, z2 = eps
        dtype = state.f.dtype
        rho = self.rho.astype(dtype)
        w2 = rho * z1 + jnp.sqrt(1.0 - jnp.square(rho)) * z2
        sqdt = jnp.sqrt(self.dt).astype(dtype)
        nu = self.nu.astype(dtype)
        # Forward leg: Euler, absorbed at zero (beta < 1 boundary).
        f_plus = jnp.maximum(state.f, 0.0)
        df = state.sigma * jnp.power(f_plus, self.beta.astype(dtype)) \
            * sqdt * z1
        f_new = jnp.maximum(f_plus + df, 0.0)
        # Vol leg: exact lognormal transition.
        sig_new = state.sigma * jnp.exp(
            nu * sqdt * w2 - 0.5 * jnp.square(nu) * self.dt.astype(dtype))
        return SABRState(f=f_new, sigma=sig_new)

    def prices(self, state: SABRState):
        return state.f


def sabr_hagan_iv(f0, strike, T, alpha, beta, nu, rho):
    """Hagan et al. (2002) lognormal (Black) implied-vol expansion.

    The standard quoting approximation, accurate to O(nu^2 T) for moderate
    parameters — the validation oracle for the MC process (tests price the
    smile both ways and compare).  Broadcasts over strike arrays.
    """
    import numpy as np

    f0, k = np.asarray(f0, np.float64), np.asarray(strike, np.float64)
    one_m_b = 1.0 - beta
    fk_mid = (f0 * k) ** (one_m_b / 2.0)
    log_fk = np.log(f0 / k)
    z = (nu / alpha) * fk_mid * log_fk
    x = np.log((np.sqrt(1.0 - 2.0 * rho * z + z * z) + z - rho)
               / (1.0 - rho))
    z_over_x = np.where(np.abs(z) < 1e-8, 1.0 - rho * z / 2.0,
                        z / np.where(np.abs(x) < 1e-300, 1.0, x))
    denom = fk_mid * (1.0 + one_m_b**2 / 24.0 * log_fk**2
                      + one_m_b**4 / 1920.0 * log_fk**4)
    correction = (1.0 + (one_m_b**2 / 24.0 * alpha**2 / fk_mid**2
                         + 0.25 * rho * beta * nu * alpha / fk_mid
                         + (2.0 - 3.0 * rho**2) / 24.0 * nu**2) * T)
    return alpha / denom * z_over_x * correction
