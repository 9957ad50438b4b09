#!/usr/bin/env python
"""Sharded-LSM overhead vs fixed block width (the VERDICT-r4 weak-#3
question: is there a path from +10-16% to <=5%?).

The round-4 ablation pinned the residual overhead on the fixed-block
partial-sum CONTRACT (XLA:TPU fuses flat elementwise+reduce chains
better than blocked ones), not on collectives.  The contract's one free
knob is the block width itself: any FIXED width is mesh-shape-invariant
(DEVNOTES determinism note), and wider blocks amortize the per-block
boundary — at the cost of the minimum shardable path count
(n_paths % (mesh * block) == 0, so block 2^16 still shards 2^20 paths
16 ways).  This sweep measures the mesh=1 marginal overhead per width
with the fetched-REPS-slope methodology (DEVNOTES "axon relay" 2b).

    PYTHONPATH=/root/repo:$PYTHONPATH python experiments/lsm_block_sweep.py
"""

import time

import jax
import jax.numpy as jnp

from montecarlo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache("_bench")

from montecarlo_tpu.engine import lsm_price
from montecarlo_tpu.parallel import make_mesh, sharded_lsm_price
from montecarlo_tpu.processes import GBM

REPS_LO, REPS_HI = 2, 8
N_PATHS, N_STEPS = 1 << 19, 128


def slope_time(run):
    times = {}
    for reps in (REPS_LO, REPS_HI):
        @jax.jit
        def chained(sig0, reps=reps):
            def body(i, acc):
                gbm = GBM.create(100.0, 0.03,
                                 sig0 + 1e-6 * i.astype(jnp.float32),
                                 1.0 / N_STEPS)
                return acc + run(gbm)
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        float(chained(jnp.float32(0.2)))       # warm/compile
        t0 = time.perf_counter()
        float(chained(jnp.float32(0.201)))
        times[reps] = time.perf_counter() - t0
    return (times[REPS_HI] - times[REPS_LO]) / (REPS_HI - REPS_LO)


def main():
    print("platform:", jax.devices()[0].platform)
    mesh1 = make_mesh(1)
    put = lambda s: jnp.maximum(105.0 - s, 0.0)

    def raw(gbm):
        return lsm_price(gbm, put, N_PATHS, N_STEPS, seed=5, rate=0.03,
                         dt=1.0 / N_STEPS, degree=3)["price"]

    t_raw = slope_time(raw)
    print(f"unsharded lsm_price                  {t_raw * 1e3:7.1f} ms/rep")

    for log2_block in (12, 13, 14, 15, 16, 17):
        block = 1 << log2_block

        def sh(gbm, block=block):
            return sharded_lsm_price(gbm, put, N_PATHS, N_STEPS, seed=5,
                                     rate=0.03, dt=1.0 / N_STEPS,
                                     mesh=mesh1, degree=3,
                                     block_size=block)["price"]

        t_sh = slope_time(sh)
        print(f"sharded block=2^{log2_block:<2d} ({N_PATHS // block:5d} "
              f"blocks)          {t_sh * 1e3:7.1f} ms/rep   overhead "
              f"{100 * (t_sh / t_raw - 1.0):+6.1f}%")


if __name__ == "__main__":
    main()
