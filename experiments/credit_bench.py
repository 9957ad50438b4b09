#!/usr/bin/env python
"""Portfolio-credit engine wall-clock on the real chip.

The Gaussian-copula engine is one copula draw + per-date indicator
matmuls, so the natural rate is name-date-paths/s.  Timing:
fetched-REPS-slope (DEVNOTES "axon relay" 2b) — rho is perturbed per rep
so XLA cannot hoist the loop-invariant price.

    PYTHONPATH=/root/repo:$PYTHONPATH python experiments/credit_bench.py
"""

import time

import jax
import jax.numpy as jnp

from montecarlo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache("_bench")

from montecarlo_tpu.engine.credit import credit_legs_pathwise

N_PATHS, N_STEPS, T = 1 << 17, 20, 5.0
REPS_LO, REPS_HI = 1, 5


def _legs_scalar(rho, n_names):
    haz = jnp.full((n_names,), 0.02, jnp.float32)
    w = jnp.full((n_names,), 0.6 / n_names, jnp.float32)
    prot, prem = credit_legs_pathwise(
        haz, w, rho, product="tranche", attach=0.03, detach=0.10, k=1,
        recovery=0.4, n_paths=N_PATHS, n_steps=N_STEPS, T=T, seed=7,
        rate=0.03, dtype=jnp.float32)
    return jnp.mean(prot) / jnp.mean(prem)


def bench(n_names):
    def make_chained(reps):
        @jax.jit
        def chained(rho):
            def body(i, acc):
                return acc + _legs_scalar(
                    rho + 1e-6 * i.astype(jnp.float32), n_names)
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        return chained

    times = {}
    for reps in (REPS_LO, REPS_HI):
        fn = make_chained(reps)
        float(fn(jnp.float32(0.3)))           # warm/compile
        t0 = time.perf_counter()
        float(fn(jnp.float32(0.301)))
        times[reps] = time.perf_counter() - t0
    s = (times[REPS_HI] - times[REPS_LO]) / (REPS_HI - REPS_LO)
    nd = n_names * (N_STEPS + 1) * N_PATHS
    print(f"tranche legs, N={n_names:4d}: {s * 1e3:6.1f} ms/price  "
          f"({nd / s / 1e9:6.1f}e9 name-date-paths/s)")
    return s


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    print(f"{N_PATHS} paths x {N_STEPS + 1} dates, tranche [3%, 10%], f32")
    for n in (25, 125, 500):
        bench(n)
