"""Generic fused Pallas engine vs the scan engine (interpret mode)."""

import numpy as np
import pytest

from montecarlo_tpu.engine import simulate
from montecarlo_tpu.ops.fused_engine import fused_terminal_pallas
from montecarlo_tpu.processes import GBM, GARCHBootstrap, Heston

N = 128 * 128


def _procs():
    return {
        "gbm": GBM.create(s0=100.0, mu=0.03, sigma=0.2, dt=1 / 252),
        "heston": Heston.create(s0=100.0, v0=0.04, mu=0.03, kappa=2.0,
                                theta=0.04, xi=0.5, rho=-0.7, dt=1 / 252),
        "garch": GARCHBootstrap.create(
            np.random.default_rng(0).normal(0, 0.02, 1260),
            s0=100.0, var0=4e-4),
    }


@pytest.mark.parametrize("name", ["gbm", "heston", "garch"])
@pytest.mark.parametrize("n_steps", [1, 16, 17])
def test_fused_matches_scan_engine_bitwise(name, n_steps):
    proc = _procs()[name]
    ref = np.asarray(simulate(proc, N, n_steps, seed=5))
    ker = np.asarray(fused_terminal_pallas(proc, N, n_steps, seed=5,
                                           block_rows=128, interpret=True))
    np.testing.assert_array_equal(ker, ref)


def test_fused_path_offset_invariance():
    proc = _procs()["garch"]
    full = np.asarray(fused_terminal_pallas(proc, N, 8, seed=3,
                                            block_rows=64, interpret=True))
    halves = [np.asarray(fused_terminal_pallas(
        proc, N // 2, 8, seed=3, path_offset=o, block_rows=64,
        interpret=True)) for o in (0, N // 2)]
    np.testing.assert_array_equal(full, np.concatenate(halves))


def test_draws_pair_matches_draws():
    import jax.numpy as jnp

    for name, proc in _procs().items():
        ids = jnp.arange(256, dtype=jnp.uint32)
        for j in (0, 3):
            e0, e1 = proc.draws_pair(7, 0, ids, j)
            d0 = proc.draws(7, 0, ids, 2 * j)
            d1 = proc.draws(7, 0, ids, 2 * j + 1)
            for a, b in zip(e0 + e1, d0 + d1):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                              err_msg=name)


def test_fused_antithetic_matches_scan_sampler():
    from montecarlo_tpu.samplers import AntitheticSampler

    proc = _procs()["gbm"]
    ref = np.asarray(simulate(proc, N, 9, seed=5,
                              sampler=AntitheticSampler()))
    ker = np.asarray(fused_terminal_pallas(proc, N, 9, seed=5,
                                           block_rows=128, interpret=True,
                                           antithetic=True))
    np.testing.assert_array_equal(ker, ref)


def test_basket_fused_matches_multigbm():
    """BasketGBM (tuple state, unrolled Cholesky) vs MultiGBM (matmul)."""
    import jax.numpy as jnp

    from montecarlo_tpu.processes import BasketGBM, MultiGBM

    corr = np.array([[1.0, 0.5, 0.2], [0.5, 1.0, 0.4], [0.2, 0.4, 1.0]])
    kw = dict(s0=[100.0, 50.0, 75.0], mu=[0.03, 0.02, 0.04],
              sigma=[0.2, 0.3, 0.25], corr=corr, dt=1 / 252)
    w = np.array([0.5, 0.3, 0.2])
    basket = BasketGBM.create(weights=w, **kw)
    multi = MultiGBM.create(**kw)

    n, T = 128 * 128, 16
    b_scan = np.asarray(simulate(basket, n, T, seed=5))
    m_term = np.asarray(simulate(multi, n, T, seed=5))
    np.testing.assert_allclose(b_scan, m_term @ w, rtol=2e-5)

    b_fused = np.asarray(fused_terminal_pallas(basket, n, T, seed=5,
                                               block_rows=128,
                                               interpret=True))
    np.testing.assert_array_equal(b_fused, b_scan)
