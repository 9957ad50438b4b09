"""Monte Carlo estimators over simulated terminal prices."""

from __future__ import annotations

import jax.numpy as jnp

from montecarlo_tpu.stats.welford import (
    MomentState,
    moments_from_array,
    std_error,
)


def mc_estimate(payoffs, discount=1.0) -> dict:
    """Mean estimator with standard error.

    Returns ``{"price", "std_err", "n_paths"}`` — ``std_err`` is the
    discounted standard error of the mean, the convergence criterion of the
    driver's wall-clock-to-1e-3 benchmark metric.
    """
    payoffs = jnp.asarray(payoffs)
    st: MomentState = moments_from_array(payoffs, axis=0)
    d = jnp.asarray(discount, payoffs.dtype)
    return {
        "price": d * st.mean,
        "std_err": d * std_error(st),
        "n_paths": st.count,
    }
