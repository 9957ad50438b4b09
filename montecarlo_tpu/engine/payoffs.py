"""Payoff functions and closed forms for validation."""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.stats import norm


def european_call(s_t, strike):
    return jnp.maximum(s_t - strike, 0.0)


def european_put(s_t, strike):
    return jnp.maximum(strike - s_t, 0.0)


def basket_call(prices, weights, strike):
    """Call on a weighted basket: prices (n_paths, n_assets)."""
    w = jnp.asarray(weights, prices.dtype)
    basket = prices @ w
    return jnp.maximum(basket - strike, 0.0)


def max_call(prices, strike):
    """Call on the best of several assets: prices (..., n_assets).

    The Bermudan max-call benchmark payoff (Longstaff-Schwartz 2001 §8.1,
    Andersen-Broadie 2004 Table 2/3)."""
    return jnp.maximum(jnp.max(prices, axis=-1) - strike, 0.0)


def discount_factor(r, T, dtype=jnp.float32):
    return jnp.exp(jnp.asarray(-r * T, dtype))


def black_scholes_call(s0, strike, r, sigma, T):
    """Black-Scholes closed form — the absolute oracle for GBM calls."""
    s0, strike, r, sigma, T = map(jnp.asarray, (s0, strike, r, sigma, T))
    sqrt_t = jnp.sqrt(T)
    d1 = (jnp.log(s0 / strike) + (r + 0.5 * sigma**2) * T) / (sigma * sqrt_t)
    d2 = d1 - sigma * sqrt_t
    return s0 * norm.cdf(d1) - strike * jnp.exp(-r * T) * norm.cdf(d2)


def black_scholes_put(s0, strike, r, sigma, T):
    s0, strike, r, sigma, T = map(jnp.asarray, (s0, strike, r, sigma, T))
    call = black_scholes_call(s0, strike, r, sigma, T)
    return call - s0 + strike * jnp.exp(-r * T)


def quanto_drift(r_foreign, sigma_asset, sigma_fx, rho):
    """Risk-neutral drift of a FOREIGN asset under the DOMESTIC measure for
    quanto payoffs (paid in domestic currency at a fixed conversion rate):

        mu_quanto = r_f - rho * sigma_S * sigma_FX

    (Girsanov drift correction from the asset/FX covariance).  Build the
    usual GBM with this ``mu`` and discount at the DOMESTIC rate — a
    quanto option is then just that GBM's vanilla, and the closed form is
    ``black_scholes_quanto_call`` (tested against the MC engine)."""
    return r_foreign - rho * sigma_asset * sigma_fx


def black_scholes_quanto_call(s0, strike, r_dom, r_for, sigma, sigma_fx,
                              rho, T):
    """Closed-form quanto call (fixed FX conversion, unit notional):
    e^{-r_d T} E^d[(S_T - K)^+] with S drifting at `quanto_drift`."""
    mu = quanto_drift(r_for, sigma, sigma_fx, rho)
    s0, strike, mu, sigma, T = map(jnp.asarray, (s0, strike, mu, sigma, T))
    sqrt_t = jnp.sqrt(T)
    fwd = s0 * jnp.exp(mu * T)
    d1 = (jnp.log(fwd / strike) + 0.5 * sigma**2 * T) / (sigma * sqrt_t)
    d2 = d1 - sigma * sqrt_t
    return jnp.exp(-jnp.asarray(r_dom) * T) * (fwd * norm.cdf(d1)
                                               - strike * norm.cdf(d2))
