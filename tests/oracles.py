"""Closed-form / semi-analytic pricing oracles for validation tests."""

from __future__ import annotations

import numpy as np
from scipy.integrate import quad


def heston_call_price(s0, k, T, r, v0, kappa, theta, xi, rho) -> float:
    """Semi-analytic Heston European call via the characteristic function
    ('little Heston trap' formulation, Albrecher et al. 2007)."""

    def phi(u, j):
        a = kappa * theta
        if j == 1:
            b = kappa - rho * xi
            uu = 0.5
        else:
            b = kappa
            uu = -0.5
        d = np.sqrt((rho * xi * 1j * u - b) ** 2
                    - xi**2 * (2 * uu * 1j * u - u**2))
        g = (b - rho * xi * 1j * u + d) / (b - rho * xi * 1j * u - d)
        big_g = 1.0 / g
        c = r * 1j * u * T + a / xi**2 * (
            (b - rho * xi * 1j * u - d) * T
            - 2.0 * np.log((1 - big_g * np.exp(-d * T)) / (1 - big_g)))
        dd = (b - rho * xi * 1j * u - d) / xi**2 * (
            (1 - np.exp(-d * T)) / (1 - big_g * np.exp(-d * T)))
        return np.exp(c + dd * v0 + 1j * u * np.log(s0))

    def pj(j):
        def integrand(u):
            return (np.exp(-1j * u * np.log(k)) * phi(u, j) / (1j * u)).real
        return 0.5 + quad(integrand, 1e-8, 200, limit=400)[0] / np.pi

    return s0 * pj(1) - k * np.exp(-r * T) * pj(2)
