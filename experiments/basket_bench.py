#!/usr/bin/env python
"""Packed MXU basket kernel vs tuple-state kernel (run on the real chip)."""

import jax
import jax.numpy as jnp
import numpy as np

from montecarlo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache("_bench")

from montecarlo_tpu.ops.basket_kernel import packed_basket_terminal_pallas
from montecarlo_tpu.ops.fused_engine import fused_terminal_pallas
from montecarlo_tpu.processes.basket import BasketGBM
from montecarlo_tpu.utils.profiling import throughput_path_steps


def basket(a_n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(a_n, a_n))
    corr = q @ q.T
    d = np.sqrt(np.diag(corr))
    return BasketGBM.create(
        s0=rng.uniform(50, 150, a_n), mu=rng.uniform(0.0, 0.06, a_n),
        sigma=rng.uniform(0.1, 0.4, a_n), corr=corr / np.outer(d, d),
        weights=np.full(a_n, 1.0 / a_n), dt=1.0 / 252.0)


if __name__ == "__main__":
    print(f"platform: {jax.devices()[0].platform}")
    n_paths, n_steps = 1 << 18, 512

    for a_n in (8, 16, 32, 64, 128):
        b = basket(a_n)

        def fn(n, s, *, seed):
            return packed_basket_terminal_pallas(b, n, s, seed=seed,
                                                 sub_rows=256)
        tp = throughput_path_steps(fn, n_paths, n_steps, reps=4)
        print(f"packed A={a_n:3d}: {tp/1e9:6.1f}e9 path-steps/s "
              f"= {a_n*tp/1e9:7.1f}e9 asset-steps/s")

    for a_n in (5, 8, 16):
        b = basket(a_n)

        def fn2(n, s, *, seed):
            return fused_terminal_pallas(b, n, s, seed=seed, block_rows=128)
        tp = throughput_path_steps(fn2, n_paths, n_steps, reps=4)
        print(f"tuple  A={a_n:3d}: {tp/1e9:6.1f}e9 path-steps/s "
              f"= {a_n*tp/1e9:7.1f}e9 asset-steps/s")
