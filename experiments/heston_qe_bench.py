#!/usr/bin/env python
"""Heston QE vs full-truncation Euler: throughput AND accuracy-per-second.

QE's step is heavier (ndtri + 2 logs + the martingale-corrected drift vs
Euler's 2 sqrt), so raw path-steps/s is lower — but the scheme's point is
the BIAS: on the Feller-violating surface (2 kappa theta = 0.04 << xi^2
= 1) Euler at 8 steps is +2.14 biased on a 4.40 call (~50%), QE is
unbiased at MC resolution (tests/test_heston_qe.py).  The honest metric
is wall-clock to a target TOTAL error, where QE's coarse grid wins by the
step ratio.

Timing: fetched REPS-slope (DEVNOTES "axon relay" 2b).

    PYTHONPATH=/root/repo:$PYTHONPATH python experiments/heston_qe_bench.py
"""

import time

import jax
import jax.numpy as jnp

from montecarlo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache("_bench")

from montecarlo_tpu.ops.fused_engine import fused_terminal_pallas
from montecarlo_tpu.processes import Heston, HestonQE

N_PATHS, N_STEPS = 1 << 20, 1024
REPS_LO, REPS_HI = 2, 10

P = dict(s0=100.0, v0=0.04, mu=0.0, kappa=0.5, theta=0.04, xi=1.0,
         rho=-0.9)


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
    qe = HestonQE.create(dt=1.0 / N_STEPS, dtype=jnp.float32, **P)
    eu = Heston.create(dt=1.0 / N_STEPS, dtype=jnp.float32, **P)
    for name, proc in (("Euler", eu), ("QE-M", qe)):
        for rows in (64, 128):
            s = slope(lambda seed, proc=proc, rows=rows:
                      fused_terminal_pallas(proc, N_PATHS, N_STEPS,
                                            seed=seed, block_rows=rows))
            print(f"{name:6s} rows={rows:3d}  "
                  f"{N_PATHS * N_STEPS / s / 1e9:6.2f}e9 path-steps/s")
