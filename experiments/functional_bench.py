#!/usr/bin/env python
"""Fused path-functional kernel vs the scan engine.

Two workloads:
- Asian (ARITH_MEAN + RUNNING_MAX): needs per-step prices, so it pays one
  exp32 per step (DEVNOTES "TPU transcendental accuracy").
- Lookback (RUNNING_MAX + RUNNING_MIN): log-space functionals — the fold
  observes the state's native log prices and exp32 runs ONCE at finalize,
  so the per-step loop is exp-free.

Chained-single-jit methodology; run on the real chip:

    PYTHONPATH=/root/repo:$PYTHONPATH python experiments/functional_bench.py
"""

import time

import jax
import jax.numpy as jnp

from montecarlo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache("_bench")

from montecarlo_tpu.engine.functionals import (ARITH_MEAN, RUNNING_MAX,
                                               RUNNING_MIN,
                                               functional_observables)
from montecarlo_tpu.engine.simulate import path_ids_for
from montecarlo_tpu.ops.fused_engine import fused_functionals_pallas
from montecarlo_tpu.processes import GBM

N_PATHS, N_STEPS, REPS = 1 << 20, 1024, 4
WORKLOADS = {
    "asian": (("avg", ARITH_MEAN), ("mx", RUNNING_MAX)),
    "lookback": (("mx", RUNNING_MAX), ("mn", RUNNING_MIN)),
}


def bench(fn, label, probe):
    @jax.jit
    def chained(seed0):
        def body(i, acc):
            out = fn(seed0 + i)
            return acc + out[probe][0] + out["terminal"][0]
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    jax.block_until_ready(chained(jnp.int32(0)))
    t0 = time.perf_counter()
    jax.block_until_ready(chained(jnp.int32(1000)))
    dt = (time.perf_counter() - t0) / REPS
    rate = N_PATHS * N_STEPS / dt
    print(f"{label:28s} {rate / 1e9:6.1f}e9 path-steps/s")
    return rate


def scan_engine(proc, funcs, seed):
    """The scan engine's exact fold with a traced seed (the public
    entry takes seeds statically through its jit wrapper, which would
    recompile per chained iteration)."""
    fns = [f for _, f in funcs]
    ids = path_ids_for(N_PATHS, 0)
    state = proc.init_state(ids, jnp.float32)
    accs = tuple(f.init(o) for f, o in
                 zip(fns, functional_observables(proc, state, fns)))

    def body(carry, t):
        st, ac = carry
        eps = proc.draws(seed, 0, ids, t, jnp.float32)
        st = proc.step(st, eps, t)
        obs = functional_observables(proc, st, fns)
        ac = tuple(f.update(a, o, t + 1)
                   for f, a, o in zip(fns, ac, obs))
        return (st, ac), None

    (state, accs), _ = jax.lax.scan(
        body, (state, accs), jnp.arange(N_STEPS, dtype=jnp.int32))
    out = {"terminal": proc.prices(state)}
    for (name, _), f, a in zip(funcs, fns, accs):
        out[name] = f.finalize(a, float(N_STEPS))
    return out


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform)
    proc = GBM.create(s0=100., mu=.03, sigma=.2, dt=1 / 252)

    for name, funcs in WORKLOADS.items():
        probe = funcs[0][0]
        bench(lambda s, fu=funcs: fused_functionals_pallas(
            proc, N_PATHS, N_STEPS, seed=s, functional_items=fu),
            f"fused functionals [{name}]", probe)
        bench(lambda s, fu=funcs: scan_engine(proc, fu, s),
              f"scan engine [{name}]", probe)
