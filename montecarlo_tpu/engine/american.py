"""American option pricing by Longstaff-Schwartz least-squares Monte Carlo.

Backward induction over simulated paths with a polynomial regression of the
continuation value on in-the-money paths (Longstaff & Schwartz 2001).  The
whole algorithm is one jitted program: the backward pass is a `lax.scan`
over time, each step solving a tiny (degree+1)^2 weighted normal-equation
system — TPU-friendly static shapes throughout (ITM selection is a weight
mask, not a gather).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from montecarlo_tpu.engine.simulate import simulate


def _basis(s, degree: int):
    """Polynomial basis on normalized prices: [1, x, x^2, ...]."""
    cols = [jnp.ones_like(s)]
    for p in range(1, degree + 1):
        cols.append(cols[-1] * s)
    return jnp.stack(cols, axis=1)  # (n, degree+1)


@partial(jax.jit, static_argnames=("payoff_fn", "n_paths", "n_steps",
                                   "seed", "degree", "dtype"))
def lsm_price(process, payoff_fn, n_paths: int, n_steps: int, *, seed: int,
              rate, dt, degree: int = 2, dtype=jnp.float32):
    """Price an American-exercise payoff via LSM.

    Args:
      payoff_fn: immediate-exercise payoff of the price array.
      rate, dt: per-unit-time discount rate and step size (discount per
        step = exp(-rate*dt)).

    Returns ``{"price", "std_err", "n_paths"}``.  The estimate carries the
    usual small low bias of plain LSM (suboptimal regressed policy).
    """
    paths = simulate(process, n_paths, n_steps, seed=seed, mode="paths",
                     dtype=dtype)  # (T+1, N)
    df = jnp.exp(jnp.asarray(-rate * dt, dtype))
    scale = 1.0 / jnp.mean(paths[0])  # normalize basis conditioning

    cashflow = payoff_fn(paths[-1])  # value realized if never exercised

    def step(cashflow, s_t):
        disc = df * cashflow
        exercise = payoff_fn(s_t)
        itm = exercise > 0
        w = itm.astype(dtype)
        x = _basis(s_t * scale, degree)
        xw = x * w[:, None]
        a = xw.T @ x + 1e-6 * jnp.eye(degree + 1, dtype=dtype)
        b = xw.T @ disc
        beta = jnp.linalg.solve(a, b)
        continuation = x @ beta
        take = itm & (exercise >= continuation)
        return jnp.where(take, exercise, disc), None

    # Backward over t = T-1 .. 1 (no exercise at t=0 or forced at T).
    inner = paths[1:-1][::-1]
    cashflow, _ = jax.lax.scan(step, cashflow, inner)
    value = df * cashflow  # discount from t=1 back to 0
    n = jnp.asarray(n_paths, dtype)
    return {
        "price": jnp.mean(value),
        "std_err": jnp.std(value, ddof=1) / jnp.sqrt(n),
        "n_paths": n_paths,
    }


def binomial_american_put(s0, strike, r, sigma, T, n_steps: int = 1000):
    """CRR binomial-tree American put — the validation oracle."""
    import numpy as np

    dt = T / n_steps
    u = np.exp(sigma * np.sqrt(dt))
    d = 1.0 / u
    p = (np.exp(r * dt) - d) / (u - d)
    disc = np.exp(-r * dt)
    j = np.arange(n_steps + 1)
    prices = s0 * u ** (n_steps - j) * d ** j
    values = np.maximum(strike - prices, 0.0)
    for step in range(n_steps - 1, -1, -1):
        prices = prices[:-1] / u  # prices at this layer
        values = disc * (p * values[:-1] + (1 - p) * values[1:])
        values = np.maximum(values, strike - prices)
    return float(values[0])
