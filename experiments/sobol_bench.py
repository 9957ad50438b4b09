#!/usr/bin/env python
"""Device-Sobol throughput: fused Pallas kernel vs the lax.scan engine.

QMC needs orders of magnitude fewer paths than plain MC for the same error,
so absolute path-step rates matter less than for the Threefry kernels — but
the fused variant removes the per-step HBM round trips.  Run on the real
chip:

    PYTHONPATH=/root/repo:$PYTHONPATH python experiments/sobol_bench.py
"""

import jax
import jax.numpy as jnp

from montecarlo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache("_bench")

from montecarlo_tpu.engine import simulate
from montecarlo_tpu.ops.fused_engine import fused_terminal_pallas
from montecarlo_tpu.processes import GBM
from montecarlo_tpu.rng.sobol import (SobolBridgeDeviceSampler,
                                      SobolBridgeKernelSampler,
                                      SobolDeviceSampler)
from montecarlo_tpu.utils.profiling import throughput_path_steps

N_PATHS, N_STEPS = 1 << 20, 256


def main():
    print("platform:", jax.devices()[0].platform)
    proc = GBM.create(s0=100.0, mu=0.03, sigma=0.2, dt=1.0 / 252.0)
    sob = SobolDeviceSampler.create(N_STEPS, 1)
    bridge = SobolBridgeDeviceSampler.create(N_STEPS)
    bridge_k = SobolBridgeKernelSampler.create(N_STEPS)

    def fused(n_paths, n_steps, *, seed):
        return fused_terminal_pallas(proc, n_paths, n_steps, seed=seed,
                                     block_rows=128, sampler=sob)

    def fused_bridge(n_paths, n_steps, *, seed):
        # Scratch budget: dispatch would cap rows at 4MB/(T*512) = 32
        # for T=256; use the same here.
        return fused_terminal_pallas(proc, n_paths, n_steps, seed=seed,
                                     block_rows=32, sampler=bridge_k)

    def scan_with(sampler):
        # Raw scan body so the chained harness can trace the seed
        # (`simulate` pins seed static for its public contract).
        from montecarlo_tpu.engine.simulate import path_ids_for

        def fn(n_paths, n_steps, *, seed):
            ids = path_ids_for(n_paths, 0)
            state = proc.init_state(ids, jnp.float32)

            def body(st, t):
                eps = sampler.draws(proc, seed, 0, ids, t, jnp.float32)
                return proc.step(st, eps, t), None

            state, _ = jax.lax.scan(
                body, state, jnp.arange(n_steps, dtype=jnp.int32))
            return proc.prices(state)

        return fn

    for name, fn, (np_, ns) in (
            ("fused sobol kernel", fused, (N_PATHS, N_STEPS)),
            ("fused bridge kernel", fused_bridge, (N_PATHS, N_STEPS)),
            ("scan sobol", scan_with(sob), (N_PATHS, N_STEPS)),
            ("scan sobol-bridge", scan_with(bridge), (N_PATHS // 4,
                                                      N_STEPS))):
        tp = throughput_path_steps(fn, np_, ns, reps=3)
        print(f"{name:20s} {tp / 1e9:7.2f}e9 path-steps/s")


if __name__ == "__main__":
    main()
