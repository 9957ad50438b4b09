#!/usr/bin/env python
"""Fused path-functional kernel vs the scan engine (Asian workload).

Chained-single-jit methodology; run on the real chip:

    PYTHONPATH=/root/repo:$PYTHONPATH python experiments/functional_bench.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_mctpu_bench")

from montecarlo_tpu.engine.functionals import (ARITH_MEAN, RUNNING_MAX,
                                               _simulate_functionals)
from montecarlo_tpu.ops.fused_engine import fused_functionals_pallas
from montecarlo_tpu.processes import GBM

N_PATHS, N_STEPS, REPS = 1 << 20, 1024, 4
FUNCS = (("avg", ARITH_MEAN), ("mx", RUNNING_MAX))


def bench(fn, label):
    @jax.jit
    def chained(seed0):
        def body(i, acc):
            out = fn(seed0 + i)
            return acc + out["avg"][0] + out["terminal"][0]
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    jax.block_until_ready(chained(jnp.int32(0)))
    t0 = time.perf_counter()
    jax.block_until_ready(chained(jnp.int32(1000)))
    dt = (time.perf_counter() - t0) / REPS
    rate = N_PATHS * N_STEPS / dt
    print(f"{label:22s} {rate / 1e9:6.1f}e9 path-steps/s")
    return rate


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform)
    proc = GBM.create(s0=100., mu=.03, sigma=.2, dt=1 / 252)

    bench(lambda s: fused_functionals_pallas(
        proc, N_PATHS, N_STEPS, seed=s, functional_items=FUNCS),
        "fused functionals")

    # Scan engine with a traced seed (the jitted wrapper's seed is static,
    # so the chained-timing body inlines the same scan).
    from montecarlo_tpu.engine.simulate import path_ids_for

    def scan_engine(seed):
        ids = path_ids_for(N_PATHS, 0)
        state = proc.init_state(ids, jnp.float32)
        p0 = proc.prices(state)
        accs = tuple(f.init(p0) for _, f in FUNCS)

        def body(carry, t):
            st, ac = carry
            eps = proc.draws(seed, 0, ids, t, jnp.float32)
            st = proc.step(st, eps, t)
            pr = proc.prices(st)
            ac = tuple(f.update(a, pr, t + 1)
                       for (_, f), a in zip(FUNCS, ac))
            return (st, ac), None

        (state, accs), _ = jax.lax.scan(
            body, (state, accs), jnp.arange(N_STEPS, dtype=jnp.int32))
        out = {"terminal": proc.prices(state)}
        for (name, f), a in zip(FUNCS, accs):
            out[name] = f.finalize(a, float(N_STEPS))
        return out

    bench(scan_engine, "scan engine")
