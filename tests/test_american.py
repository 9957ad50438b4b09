"""Longstaff-Schwartz American pricing vs a binomial-tree oracle."""

import numpy as np

from montecarlo_tpu.engine import black_scholes_call, black_scholes_put
from montecarlo_tpu.engine.american import binomial_american_put, lsm_price
from montecarlo_tpu.processes import GBM
import jax.numpy as jnp

R, SIGMA, T = 0.06, 0.2, 1.0
N_EX = 50  # exercise dates (Longstaff-Schwartz 2001 setup)


def _gbm(s0):
    return GBM.create(s0=s0, mu=R, sigma=SIGMA, dt=T / N_EX)


def test_american_put_matches_binomial():
    for s0 in (36.0, 40.0, 44.0):
        out = lsm_price(
            _gbm(s0), lambda s: jnp.maximum(40.0 - s, 0.0),
            1 << 17, N_EX, seed=11, rate=R, dt=T / N_EX, degree=3)
        tree = binomial_american_put(s0, 40.0, R, SIGMA, T, n_steps=1000)
        err = abs(float(out["price"]) - tree)
        assert err < 4 * float(out["std_err"]) + 0.05, (s0, float(out["price"]), tree)


def test_american_put_dominates_european():
    s0 = 36.0
    out = lsm_price(_gbm(s0), lambda s: jnp.maximum(40.0 - s, 0.0),
                    1 << 16, N_EX, seed=3, rate=R, dt=T / N_EX)
    euro = float(black_scholes_put(s0, 40.0, R, SIGMA, T))
    assert float(out["price"]) > euro + 0.1  # early exercise premium


def test_american_call_no_dividends_equals_european():
    """Without dividends, early exercise of a call is never optimal."""
    s0 = 100.0
    out = lsm_price(_gbm(s0), lambda s: jnp.maximum(s - 105.0, 0.0),
                    1 << 16, N_EX, seed=5, rate=R, dt=T / N_EX)
    euro = float(black_scholes_call(s0, 105.0, R, SIGMA, T))
    assert abs(float(out["price"]) - euro) < 4 * float(out["std_err"]) + 0.03
