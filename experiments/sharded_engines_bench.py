#!/usr/bin/env python
"""Overhead of the round-3 sharded engines at mesh=1 on the real chip.

Chained-single-jit methodology (DEVNOTES "axon relay"):

    PYTHONPATH=/root/repo:$PYTHONPATH python experiments/sharded_engines_bench.py

Dispatching a shard_map program through this relay costs ~1 s of fixed
latency per call regardless of content (measured: the established
sharded_mc_estimate and the new sharded_functional_estimate both take
~1.0 s per call at shapes whose device work is ~10-50 ms).  Naive
per-call timing therefore says nothing about the engines; every row
below reports the MARGINAL throughput between two step counts,
N*(T2-T1)/(t2-t1), which cancels the fixed dispatch cost.

Rows:
- sharded_functional_estimate (Asian, fused functional kernel per shard)
  vs the raw `simulate_functionals` kernel path;
- sharded_lsm_price vs the single-chip `lsm_price`;
- SLV scan-engine pricing (two-level one-hot leverage interpolation).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from montecarlo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache("_bench")

from montecarlo_tpu.engine import (ARITH_MEAN, asian_call, lsm_price,
                                   mc_estimate, simulate,
                                   simulate_functionals)
from montecarlo_tpu.parallel import (make_mesh, sharded_functional_estimate,
                                     sharded_lsm_price)
from montecarlo_tpu.processes import GBM

N_PATHS, N_STEPS = 1 << 20, 256


def marginal(label, make_fn, n_paths, t1, t2, *args):
    """Marginal throughput between step counts t1 < t2: time each twice
    (after a compile call), take the best, difference away the fixed
    relay dispatch."""
    best = {}
    for steps in (t1, t2):
        fn = make_fn(steps)
        fn(*args)  # compile
        b = float("inf")
        for _ in range(4):
            t0 = time.time()
            fn(*args)
            b = min(b, time.time() - t0)
        best[steps] = b
    rate = n_paths * (t2 - t1) / max(best[t2] - best[t1], 1e-9)
    note = ""
    if best[t2] - best[t1] < 0.2 * best[t2]:
        # Relay dispatch dominates both step counts: the difference is
        # noise and the marginal says nothing (observed ~1.1-1.3 s fixed
        # dispatch on some shard_map programs).
        note = "  [UNRELIABLE: dispatch-dominated]"
    print(f"{label:55s} marginal {rate/1e9:6.1f}e9 path-steps/s "
          f"(t{t1}={best[t1]:.3f}s t{t2}={best[t2]:.3f}s){note}")
    return rate


def main():
    print("platform:", jax.devices()[0].platform)
    mesh1 = make_mesh(1)
    n_paths = 1 << 20

    def make_raw_functional(steps):
        gbm = GBM.create(100.0, 0.03, 0.2, 1.0 / steps)

        def run(seed):
            out = simulate_functionals(gbm, n_paths, steps, seed=seed,
                                       functionals={"avg": ARITH_MEAN})
            return float(mc_estimate(asian_call(out["avg"], 100.0),
                                     1.0)["price"])
        return run

    def make_sharded_functional(steps):
        gbm = GBM.create(100.0, 0.03, 0.2, 1.0 / steps)

        def run(seed):
            est = sharded_functional_estimate(
                gbm, {"avg": ARITH_MEAN},
                lambda o: asian_call(o["avg"], 100.0),
                n_paths, steps, seed=seed, mesh=mesh1)
            return float(est["price"])
        return run

    r_raw = marginal("functional kernel (Asian), unsharded",
                     make_raw_functional, n_paths, 256, 1024, 3)
    r_sh = marginal("sharded_functional_estimate, mesh=1",
                    make_sharded_functional, n_paths, 256, 1024, 3)
    print(f"  -> sharded marginal overhead {100 * (r_raw / r_sh - 1.0):+.1f}%\n")

    lsm_paths = 1 << 19
    put = lambda s: jnp.maximum(105.0 - s, 0.0)

    def make_raw_lsm(steps):
        gbm = GBM.create(100.0, 0.03, 0.2, 1.0 / steps)

        def run(seed):
            return float(lsm_price(gbm, put, lsm_paths, steps, seed=seed,
                                   rate=0.03, dt=1.0 / steps,
                                   degree=3)["price"])
        return run

    def make_sharded_lsm(steps):
        gbm = GBM.create(100.0, 0.03, 0.2, 1.0 / steps)

        def run(seed):
            return float(sharded_lsm_price(gbm, put, lsm_paths, steps,
                                           seed=seed, rate=0.03,
                                           dt=1.0 / steps, mesh=mesh1,
                                           degree=3)["price"])
        return run

    r_raw = marginal("lsm_price (single-chip LSM)", make_raw_lsm,
                     lsm_paths, 64, 256, 5)
    r_sh = marginal("sharded_lsm_price, mesh=1", make_sharded_lsm,
                    lsm_paths, 64, 256, 5)
    print(f"  -> sharded marginal overhead {100 * (r_raw / r_sh - 1.0):+.1f}%\n")

    # Andersen-Broadie dual: unsharded vs mesh=1 sharded (round 4).
    from montecarlo_tpu.engine.american import (andersen_broadie_bound,
                                                lsm_policy)
    from montecarlo_tpu.parallel import sharded_andersen_broadie_bound

    ab_outer, ab_inner = 1 << 15, 32

    def make_raw_dual(steps):
        gbm = GBM.create(100.0, 0.03, 0.2, 1.0 / steps)
        _, policy = lsm_policy(gbm, put, 1 << 16, steps, seed=2, rate=0.03,
                               dt=1.0 / steps, degree=3)

        def run(seed):
            return float(andersen_broadie_bound(
                gbm, put, policy, ab_outer, ab_inner, steps, seed=seed,
                rate=0.03, dt=1.0 / steps, degree=3)["upper"])
        return run

    def make_sharded_dual(steps):
        gbm = GBM.create(100.0, 0.03, 0.2, 1.0 / steps)
        _, policy = lsm_policy(gbm, put, 1 << 16, steps, seed=2, rate=0.03,
                               dt=1.0 / steps, degree=3)

        def run(seed):
            return float(sharded_andersen_broadie_bound(
                gbm, put, policy, ab_outer, ab_inner, steps, seed=seed,
                rate=0.03, dt=1.0 / steps, mesh=mesh1,
                degree=3)["upper"])
        return run

    r_raw = marginal("andersen_broadie_bound (unsharded dual)",
                     make_raw_dual, ab_outer * ab_inner, 64, 256, 5)
    r_sh = marginal("sharded_andersen_broadie_bound, mesh=1",
                    make_sharded_dual, ab_outer * ab_inner, 64, 256, 5)
    print(f"  -> sharded marginal overhead {100 * (r_raw / r_sh - 1.0):+.1f}%\n")

    # SLV scan throughput (demo surface).
    from montecarlo_tpu.processes import LocalVolGBM, calibrate_slv
    from montecarlo_tpu.processes.dupire import local_vol_fn_from_ivs

    ks = np.linspace(0.7, 1.4, 15) * 100.0
    mats = np.array([0.5, 1.0])
    ivs = (0.2 - 0.1 * np.log(ks / 100.0))[None, :].repeat(2, 0)
    vol_fn = local_vol_fn_from_ivs(ks, mats, ivs, s0=100.0, rate=0.03)
    slv_paths = 1 << 19

    def make_slv(steps):
        lv = LocalVolGBM.create(100.0, 0.03, 1.0 / steps, steps, vol_fn,
                                x_min=-0.9, x_max=0.9)
        slv = calibrate_slv(lv, v0=0.04, kappa=2.0, theta=0.04, xi=0.8,
                            rho=-0.6, n_steps=steps,
                            n_particles=1 << 16, seed=0)

        def run(seed):
            term = simulate(slv, slv_paths, steps, seed=seed)
            return float(mc_estimate(jnp.maximum(term - 100.0, 0.0),
                                     float(np.exp(-0.03)))["price"])
        return run

    marginal("SLV pricing (scan engine, 2-level one-hot leverage)",
             make_slv, slv_paths, 128, 512, 7)


if __name__ == "__main__":
    main()
