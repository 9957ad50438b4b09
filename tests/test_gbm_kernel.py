"""Pallas GBM kernel vs the scan engine (interpret mode on CPU).

On real TPU hardware the same checks run compiled (see bench.py / the
driver's compile check); interpret mode validates the kernel logic itself.
"""

import numpy as np
import pytest

from montecarlo_tpu.engine import simulate
from montecarlo_tpu.ops import gbm_terminal_pallas
from montecarlo_tpu.processes import GBM

S0 = 100.0
N = 128 * 256  # one (256, 128) block


def _gbm():
    return GBM.create(s0=S0, mu=0.03, sigma=0.2, dt=1 / 252)


@pytest.mark.parametrize("n_steps", [1, 2, 16, 17, 252])
def test_kernel_matches_engine(n_steps):
    ref = np.asarray(simulate(_gbm(), N, n_steps, seed=5))
    ker = np.asarray(gbm_terminal_pallas(_gbm(), N, n_steps, seed=5,
                                         block_rows=256, interpret=True))
    # Identical draws; only FMA-fusion round-off may differ.
    np.testing.assert_allclose(ker, ref, rtol=3e-6)


def test_kernel_invariant_to_block_size():
    n = 128 * 512
    a = np.asarray(gbm_terminal_pallas(_gbm(), n, 32, seed=9, block_rows=256,
                                       interpret=True))
    b = np.asarray(gbm_terminal_pallas(_gbm(), n, 32, seed=9, block_rows=128,
                                       interpret=True))
    np.testing.assert_array_equal(a, b)


def test_kernel_path_offset_shard_invariance():
    n = 128 * 512
    full = np.asarray(gbm_terminal_pallas(_gbm(), n, 16, seed=3,
                                          block_rows=256, interpret=True))
    lo = np.asarray(gbm_terminal_pallas(_gbm(), n // 2, 16, seed=3,
                                        path_offset=0, block_rows=256,
                                        interpret=True))
    hi = np.asarray(gbm_terminal_pallas(_gbm(), n // 2, 16, seed=3,
                                        path_offset=n // 2, block_rows=256,
                                        interpret=True))
    np.testing.assert_array_equal(full, np.concatenate([lo, hi]))


def test_kernel_rejects_bad_path_count():
    with pytest.raises(ValueError):
        gbm_terminal_pallas(_gbm(), 1000, 8, seed=0, interpret=True)
