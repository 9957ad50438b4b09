#!/usr/bin/env python
"""Overhead of the round-3 sharded engines at mesh=1 on the real chip.

Chained-single-jit methodology (DEVNOTES "axon relay"):

    PYTHONPATH=/root/repo:$PYTHONPATH python experiments/sharded_engines_bench.py

Rows:
- sharded_functional_estimate (Asian, fused functional kernel per shard)
  vs the raw `simulate_functionals` kernel path — the pod-scale exotics
  engine's single-chip overhead;
- sharded_lsm_price vs the single-chip `lsm_price` (both scan-engine
  simulations; the sharded one adds block-sum gathers per exercise date);
- SLV scan-engine pricing throughput (the per-step leverage row indexing
  keeps SLV off the fused kernels — documented, not hidden).
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


def timed(label, fn, n_paths, n_steps, *args):
    """These engines are multi-second programs, so the ~0.25 s per-call
    relay tax (DEVNOTES) is <5% of each measurement — run 2 warm calls
    after the compile call and report the best."""
    fn(*args)  # compile
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn(*args)
        best = min(best, time.time() - t0)
    rate = n_paths * n_steps / best
    print(f"{label:55s} {best:6.3f} s  {rate/1e9:6.1f}e9 path-steps/s")
    return best


def main():
    print("platform:", jax.devices()[0].platform)
    gbm = GBM.create(100.0, 0.03, 0.2, 1.0 / N_STEPS)
    mesh1 = make_mesh(1)

    def raw_functional(seed):
        out = simulate_functionals(gbm, N_PATHS, N_STEPS, seed=seed,
                                   functionals={"avg": ARITH_MEAN})
        est = mc_estimate(asian_call(out["avg"], 100.0), 1.0)
        return float(est["price"])

    def sharded_functional(seed):
        est = sharded_functional_estimate(
            gbm, {"avg": ARITH_MEAN},
            lambda o: asian_call(o["avg"], 100.0),
            N_PATHS, N_STEPS, seed=seed, mesh=mesh1)
        return float(est["price"])

    t_raw = timed("functional kernel (Asian), unsharded", raw_functional,
                  N_PATHS, N_STEPS, 3)
    t_sh = timed("sharded_functional_estimate, mesh=1", sharded_functional,
                 N_PATHS, N_STEPS, 3)
    print(f"  -> sharded overhead {100 * (t_sh / t_raw - 1.0):+.1f}%\n")

    # LSM: memory-bound paths mode — smaller path count.
    lsm_paths, lsm_steps = 1 << 18, 64
    put = lambda s: jnp.maximum(105.0 - s, 0.0)

    def raw_lsm(seed):
        return float(lsm_price(gbm, put, lsm_paths, lsm_steps, seed=seed,
                               rate=0.03, dt=1.0 / lsm_steps,
                               degree=3)["price"])

    def sharded_lsm(seed):
        return float(sharded_lsm_price(gbm, put, lsm_paths, lsm_steps,
                                       seed=seed, rate=0.03,
                                       dt=1.0 / lsm_steps, mesh=mesh1,
                                       degree=3)["price"])

    t_raw = timed("lsm_price (single-chip LSM)", raw_lsm, lsm_paths,
                  lsm_steps, 5)
    t_sh = timed("sharded_lsm_price, mesh=1", sharded_lsm, lsm_paths,
                 lsm_steps, 5)
    print(f"  -> sharded overhead {100 * (t_sh / t_raw - 1.0):+.1f}%\n")

    # SLV scan throughput (demo surface).
    from montecarlo_tpu.processes import LocalVolGBM, calibrate_slv
    from montecarlo_tpu.processes.dupire import local_vol_fn_from_ivs

    ks = np.linspace(0.7, 1.4, 15) * 100.0
    mats = np.array([0.5, 1.0])
    ivs = (0.2 - 0.1 * np.log(ks / 100.0))[None, :].repeat(2, 0)
    vol_fn = local_vol_fn_from_ivs(ks, mats, ivs, s0=100.0, rate=0.03)
    slv_steps = 128
    lv = LocalVolGBM.create(100.0, 0.03, 1.0 / slv_steps, slv_steps,
                            vol_fn, x_min=-0.9, x_max=0.9)
    slv = calibrate_slv(lv, v0=0.04, kappa=2.0, theta=0.04, xi=0.8,
                        rho=-0.6, n_steps=slv_steps,
                        n_particles=1 << 16, seed=0)
    slv_paths = 1 << 19

    def slv_price(seed):
        term = simulate(slv, slv_paths, slv_steps, seed=seed)
        return float(mc_estimate(jnp.maximum(term - 100.0, 0.0),
                                 float(np.exp(-0.03)))["price"])

    timed("SLV pricing (scan engine, per-step leverage rows)", slv_price,
          slv_paths, slv_steps, 7)


if __name__ == "__main__":
    main()
