"""GARCH(1,1) parameter estimation by Gaussian quasi-MLE, in JAX.

The reference hardcodes omega=1e-5, alpha=0.10, beta=0.85 ("simplified
estimation", reference app.py:600-603).  This module actually fits them:
the Gaussian quasi-likelihood

    var_t = omega + alpha r_{t-1}^2 + beta var_{t-1}
    -2 logL = sum_t [ log var_t + r_t^2 / var_t ]

is evaluated with a `lax.scan` and maximized with Adam on an unconstrained
reparameterization (softplus for positivity, sigmoid for alpha+beta < 1 —
covariance stationarity).  Autodiff supplies exact gradients through the
variance recurrence; the whole fit is one jitted program.

QMLE consistency holds even for non-Gaussian shocks (Bollerslev-Wooldridge),
which matches the engine's bootstrap innovations.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class GARCHParams(NamedTuple):
    omega: float
    alpha: float
    beta: float


def _constrain(raw):
    """Unconstrained R^3 -> (omega > 0, alpha > 0, beta > 0, alpha+beta < 1)."""
    omega = jax.nn.softplus(raw[0]) * 1e-5
    # alpha + beta = persistence in (0, 1); alpha = share * persistence.
    persistence = jax.nn.sigmoid(raw[1])
    share = jax.nn.sigmoid(raw[2])
    alpha = persistence * share
    beta = persistence * (1.0 - share)
    return omega, alpha, beta


def _neg_log_likelihood(raw, returns, var0):
    omega, alpha, beta = _constrain(raw)

    def step(var, r):
        nll_t = jnp.log(var) + jnp.square(r) / var
        var_next = omega + alpha * jnp.square(r) + beta * var
        return var_next, nll_t

    _, nll = jax.lax.scan(step, var0, returns)
    return jnp.mean(nll)


@partial(jax.jit, static_argnames=("n_iters",))
def _fit(returns, var0, n_iters: int = 500, lr: float = 0.05):
    import optax

    raw0 = jnp.asarray([1.0, 2.0, 0.0], jnp.float32)  # ~ (1e-5, .44, .44)
    opt = optax.adam(lr)
    grad_fn = jax.value_and_grad(_neg_log_likelihood)

    def step(carry, _):
        raw, opt_state = carry
        loss, g = grad_fn(raw, returns, var0)
        updates, opt_state = opt.update(g, opt_state)
        return (optax.apply_updates(raw, updates), opt_state), loss

    (raw, _), losses = jax.lax.scan(step, (raw0, opt.init(raw0)),
                                    None, length=n_iters)
    return raw, losses


def fit_garch(returns, n_iters: int = 500) -> GARCHParams:
    """Estimate (omega, alpha, beta) from a log-return history.

    Initial variance is the sample variance (standard QMLE practice).
    """
    r = np.asarray(returns, np.float64)
    r = r[~np.isnan(r)]
    r = r - r.mean()  # de-mean, as GARCH models the innovation variance
    var0 = jnp.asarray(r.var(), jnp.float32)
    raw, _ = _fit(jnp.asarray(r, jnp.float32), var0, n_iters=n_iters)
    omega, alpha, beta = (float(v) for v in _constrain(raw))
    return GARCHParams(omega=omega, alpha=alpha, beta=beta)
