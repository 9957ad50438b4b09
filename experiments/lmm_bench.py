#!/usr/bin/env python
"""LMM scan-engine throughput (fetched REPS-slope; run on the chip).

The LMM is not a fused-Pallas process (its state is an (N, K) matrix and
the step is two (N, K) @ (K, K) HIGHEST-precision matmuls — XLA's native
shape, not a scalar-lane kernel); the honest number is the scan engine's.
A full simulation is K steps (the grid is the reset calendar), so runs
are short: throughput is reported in forward-rate updates/s
(paths x steps x live forwards).

    PYTHONPATH=/root/repo:$PYTHONPATH python experiments/lmm_bench.py
"""

import time

import jax
import jax.numpy as jnp

from montecarlo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache("_bench")

from montecarlo_tpu.engine.simulate import simulate  # noqa: E402
from montecarlo_tpu.processes.lmm import LMM  # noqa: E402

REPS_LO, REPS_HI = 2, 10


def slope(fn):
    times = {}
    for reps in (REPS_LO, REPS_HI):
        @jax.jit
        def chained(s0, reps=reps):
            def body(i, acc):
                return acc + fn(s0 + i).ravel()[0]
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        float(chained(jnp.int32(0)))
        t0 = time.perf_counter()
        float(chained(jnp.int32(1000)))
        times[reps] = time.perf_counter() - t0
    return (times[REPS_HI] - times[REPS_LO]) / (REPS_HI - REPS_LO)


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform)
    for k, n_paths in ((16, 1 << 19), (32, 1 << 18), (64, 1 << 17)):
        m = LMM.create([0.03] * k, [0.2] * k, 0.25, corr_beta=0.1,
                       dtype=jnp.float32)
        s = slope(lambda seed, m=m, n=n_paths, k=k:
                  simulate(m, n, k, seed=seed, mode="terminal",
                           observe=lambda p, st: p.exposure_obs(st)))
        # Triangular aliveness: step t updates (K - 1 - t) live forwards.
        updates = n_paths * k * (k - 1) // 2
        print(f"K={k:3d} paths=2^{n_paths.bit_length() - 1} "
              f"{updates / s / 1e9:6.2f}e9 live-forward-updates/s "
              f"({s * 1e3:.1f} ms/run)")
