"""StandardScaler — sklearn-compatible semantics, in JAX.

The reference scales features with a fresh `StandardScaler` per CV fold /
retrain (reference app.py:475-477, 729-730).  sklearn uses the population
std (ddof=0) and leaves constant columns unscaled (std == 0 -> divide by 1).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class ScalerState(NamedTuple):
    mean: jnp.ndarray   # (n_features,)
    scale: jnp.ndarray  # (n_features,) — std with zeros replaced by 1


def scaler_fit(x, weights=None) -> ScalerState:
    """Fit on (n_samples, n_features).

    ``weights`` (optional, (n_samples,) 0/1) supports masked fitting so
    variable-length training windows stay static-shaped under jit (the
    walk-forward backtester's trick).
    """
    x = jnp.asarray(x)
    if weights is None:
        mean = jnp.mean(x, axis=0)
        var = jnp.mean(jnp.square(x - mean), axis=0)
    else:
        w = jnp.asarray(weights, x.dtype)[:, None]
        n = jnp.maximum(jnp.sum(w), 1.0)
        mean = jnp.sum(x * w, axis=0) / n
        var = jnp.sum(jnp.square(x - mean) * w, axis=0) / n
    std = jnp.sqrt(var)
    scale = jnp.where(std > 0, std, 1.0)
    return ScalerState(mean=mean, scale=scale)


def scaler_transform(state: ScalerState, x):
    return (jnp.asarray(x) - state.mean) / state.scale


def scaler_fit_transform(x, weights=None):
    state = scaler_fit(x, weights)
    return state, scaler_transform(state, x)
