#!/usr/bin/env python
"""Bates QE-M fused-kernel throughput (fetched REPS-slope; run on chip).

Round-5 measurement (TPU v5e, 2^20 paths x 1024 steps, 64-row blocks):
7.08e9 path-steps/s — was 6.6e9 before the shared QE-core algebra rewrite
(`experiments/qe_profile.py` variant E: psi-free branch algebra + ONE
branch-selected log32 in the martingale correction).

    PYTHONPATH=/root/repo:$PYTHONPATH python experiments/bates_qe_slope.py
"""

import time

import jax
import jax.numpy as jnp

from montecarlo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache("_bench")

from montecarlo_tpu.ops.fused_engine import fused_terminal_pallas
from montecarlo_tpu.processes import BatesQE

N_PATHS, N_STEPS = 1 << 20, 1024
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
    proc = BatesQE.create(s0=100.0, v0=0.04, mu=0.0, kappa=0.5, theta=0.04,
                          xi=1.0, rho=-0.9, lam=1.0, jump_mean=-0.05,
                          jump_std=0.1, dt=1.0 / N_STEPS)
    s = slope(lambda seed: fused_terminal_pallas(proc, N_PATHS, N_STEPS,
                                                 seed=seed, block_rows=64))
    print(f"BatesQE {N_PATHS * N_STEPS / s / 1e9:6.2f}e9 path-steps/s "
          f"({s * 1e3:.1f} ms/run)")
