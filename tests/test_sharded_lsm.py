"""Pod-scale American pricing (`parallel/sharded.py::sharded_lsm_price`):
bitwise mesh-shape invariance, statistical parity with the single-chip LSM
on the SAME paths, and the binomial-oracle accuracy gate."""

import numpy as np
import jax.numpy as jnp
import pytest

from montecarlo_tpu.engine import binomial_american_put, lsm_price
from montecarlo_tpu.parallel import make_mesh, sharded_lsm_price
from montecarlo_tpu.processes import GBM

S0, K, R, SIG, T = 36.0, 40.0, 0.06, 0.2, 1.0
STEPS = 50
DT = T / STEPS
N_PATHS = 1 << 16
BLOCK = 2048


def _put(s):
    return jnp.maximum(K - s, 0.0)


def _proc():
    return GBM.create(s0=S0, mu=R, sigma=SIG, dt=DT)


def _price(n_dev):
    mesh = make_mesh(n_dev)
    res = sharded_lsm_price(_proc(), _put, N_PATHS, STEPS, seed=7, rate=R,
                            dt=DT, mesh=mesh, degree=3, block_size=BLOCK)
    return float(res["price"]), float(res["std_err"])


def test_bitwise_mesh_shape_invariance():
    """1/2/4/8-device meshes produce the identical price bit for bit —
    the same contract as sharded_mc_estimate."""
    p1, se1 = _price(1)
    for n in (2, 4, 8):
        pn, sen = _price(n)
        assert pn == p1 and sen == se1, (n, pn, p1)


def test_matches_single_chip_lsm():
    """Same seed -> same global paths; only the regression arithmetic
    differs (block-ordered one-pass sums), so the two engines' prices
    agree far inside the MC error."""
    p8, _ = _price(8)
    single = lsm_price(_proc(), _put, N_PATHS, STEPS, seed=7, rate=R,
                       dt=DT, degree=3)
    assert abs(p8 - float(single["price"])) < \
        0.5 * float(single["std_err"]), (p8, single)


def test_accuracy_vs_binomial():
    oracle = binomial_american_put(S0, K, R, SIG, T, n_steps=1000)
    p, se = _price(8)
    assert abs(p - oracle) < 4 * se + 0.05, (p, oracle)


def test_multislice_two_level_matches_flat():
    """(2 slices x 4 shards) == (8 flat shards), bitwise — the DCN-aware
    gather must not change the block order the fixed reduction sees."""
    p8, se8 = _price(8)
    mesh2 = make_mesh(n_path_shards=4, n_slices=2)
    res = sharded_lsm_price(_proc(), _put, N_PATHS, STEPS, seed=7, rate=R,
                            dt=DT, mesh=mesh2, degree=3, block_size=BLOCK)
    assert float(res["price"]) == p8
    assert float(res["std_err"]) == se8


def test_indivisible_rejected():
    with pytest.raises(ValueError):
        sharded_lsm_price(_proc(), _put, 1000, STEPS, seed=7, rate=R,
                          dt=DT, mesh=make_mesh(8), block_size=BLOCK)
