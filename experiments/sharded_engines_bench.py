#!/usr/bin/env python
"""Overhead of the sharded engines at mesh=1 on the real chip.

Round-4 methodology upgrade: fetched-REPS-slope (DEVNOTES "axon relay"
2b).  Each engine is chained REPS times inside ONE jit — reps differ by a
1e-6 sigma perturbation (a traced process leaf, so nothing recompiles and
every rep really runs) — the scalar is fetched with ``float(...)``, and
the per-rep time is the slope between two rep counts.  This cancels the
~0.3-1 s fixed shard_map dispatch that made round-3's per-call marginals
dispatch-dominated (the old rows printed [UNRELIABLE] whenever the
difference fell under 20% of the total).

    PYTHONPATH=/root/repo:$PYTHONPATH python experiments/sharded_engines_bench.py
"""

import time

import jax
import jax.numpy as jnp

from montecarlo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache("_bench")

from montecarlo_tpu.engine import (ARITH_MEAN, asian_call, lsm_price,
                                   mc_estimate, simulate_functionals)
from montecarlo_tpu.engine.american import (andersen_broadie_bound,
                                            lsm_policy)
from montecarlo_tpu.parallel import (make_mesh,
                                     sharded_andersen_broadie_bound,
                                     sharded_functional_estimate,
                                     sharded_lsm_price)
from montecarlo_tpu.processes import GBM

REPS_LO, REPS_HI = 2, 8


def slope_rate(run, n_paths, n_steps, label):
    """Per-rep path-steps/s of ``run(gbm) -> scalar`` by fetched slope."""
    times = {}
    for reps in (REPS_LO, REPS_HI):
        @jax.jit
        def chained(sig0, reps=reps):
            def body(i, acc):
                gbm = GBM.create(100.0, 0.03,
                                 sig0 + 1e-6 * i.astype(jnp.float32),
                                 1.0 / n_steps)
                return acc + run(gbm)
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        float(chained(jnp.float32(0.2)))   # warm/compile
        t0 = time.perf_counter()
        float(chained(jnp.float32(0.201)))
        times[reps] = time.perf_counter() - t0
    per = (times[REPS_HI] - times[REPS_LO]) / (REPS_HI - REPS_LO)
    rate = n_paths * n_steps / per
    print(f"{label:55s} {rate / 1e9:6.1f}e9 path-steps/s "
          f"({per * 1e3:.1f} ms/rep)")
    return rate


def main():
    print("platform:", jax.devices()[0].platform)
    mesh1 = make_mesh(1)

    n_paths, steps = 1 << 20, 512

    def raw_functional(gbm):
        out = simulate_functionals(gbm, n_paths, steps, seed=3,
                                   functionals={"avg": ARITH_MEAN})
        return mc_estimate(asian_call(out["avg"], 100.0), 1.0)["price"]

    def sh_functional(gbm):
        return sharded_functional_estimate(
            gbm, {"avg": ARITH_MEAN}, lambda o: asian_call(o["avg"], 100.0),
            n_paths, steps, seed=3, mesh=mesh1)["price"]

    r_raw = slope_rate(raw_functional, n_paths, steps,
                       "functional kernel (Asian), unsharded")
    r_sh = slope_rate(sh_functional, n_paths, steps,
                      "sharded_functional_estimate, mesh=1")
    print(f"  -> sharded overhead {100 * (r_raw / r_sh - 1.0):+.1f}%\n")

    lsm_paths, lsm_steps = 1 << 19, 128
    put = lambda s: jnp.maximum(105.0 - s, 0.0)

    def raw_lsm(gbm):
        return lsm_price(gbm, put, lsm_paths, lsm_steps, seed=5, rate=0.03,
                         dt=1.0 / lsm_steps, degree=3)["price"]

    def sh_lsm(gbm):
        return sharded_lsm_price(gbm, put, lsm_paths, lsm_steps, seed=5,
                                 rate=0.03, dt=1.0 / lsm_steps, mesh=mesh1,
                                 degree=3)["price"]

    r_raw = slope_rate(raw_lsm, lsm_paths, lsm_steps,
                       "lsm_price (single-chip LSM)")
    r_sh = slope_rate(sh_lsm, lsm_paths, lsm_steps,
                      "sharded_lsm_price, mesh=1")
    print(f"  -> sharded overhead {100 * (r_raw / r_sh - 1.0):+.1f}%\n")

    ab_outer, ab_inner, ab_steps = 1 << 15, 32, 128
    gbm0 = GBM.create(100.0, 0.03, 0.2, 1.0 / ab_steps)
    _, policy = lsm_policy(gbm0, put, 1 << 16, ab_steps, seed=2, rate=0.03,
                           dt=1.0 / ab_steps, degree=3)

    def raw_dual(gbm):
        return andersen_broadie_bound(
            gbm, put, policy, ab_outer, ab_inner, ab_steps, seed=5,
            rate=0.03, dt=1.0 / ab_steps, degree=3)["upper"]

    def sh_dual(gbm):
        return sharded_andersen_broadie_bound(
            gbm, put, policy, ab_outer, ab_inner, ab_steps, seed=5,
            rate=0.03, dt=1.0 / ab_steps, mesh=mesh1, degree=3)["upper"]

    r_raw = slope_rate(raw_dual, ab_outer * ab_inner, ab_steps,
                       "andersen_broadie_bound (unsharded dual)")
    r_sh = slope_rate(sh_dual, ab_outer * ab_inner, ab_steps,
                      "sharded_andersen_broadie_bound, mesh=1")
    print(f"  -> sharded overhead {100 * (r_raw / r_sh - 1.0):+.1f}%")


if __name__ == "__main__":
    main()
