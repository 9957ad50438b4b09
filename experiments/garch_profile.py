#!/usr/bin/env python
"""Where does the GARCH kernel's time go? (run on the real TPU chip)

Variants isolate the bootstrap gather cost:
  A. baseline           — pad 512 (4 table rows: 4 lane-gathers + selects)
  B. pad 128            — 1 table row (1 lane-gather)
  C. no-gather          — shock = uniform (skips the table entirely)
  D. normal-shock GARCH — Box-Muller shock + variance recurrence
  E. GBM reference      — the 34e9 headline kernel
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from montecarlo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache("_bench")

from montecarlo_tpu.ops.fused_engine import fused_terminal_pallas
from montecarlo_tpu.ops.gbm_kernel import gbm_terminal_pallas
from montecarlo_tpu.processes import GBM
from montecarlo_tpu.processes.garch import GARCHBootstrap
from montecarlo_tpu.rng.normal import boxmuller_pair, uniform_from_bits
from montecarlo_tpu.rng.threefry import random_bits
from montecarlo_tpu.utils.profiling import throughput_path_steps

N_PATHS, N_STEPS = 1 << 20, 1024
rng = np.random.default_rng(0)
returns = rng.normal(0, 0.02, size=500)


class NoGatherGARCH(GARCHBootstrap):
    """Shock = uniform (no table gather) — isolates the gather cost.
    (The gather lives in step() since the antithetic redesign, so the
    variant overrides step to consume the uniform directly.)"""

    def step(self, state, eps, t):
        shock = eps[0]
        vol = jnp.sqrt(state.var)
        r = shock * vol
        new_var = (self.omega.astype(r.dtype)
                   + self.alpha.astype(r.dtype) * jnp.square(r)
                   + self.beta.astype(r.dtype) * state.var)
        return type(state)(log_s=state.log_s + r, var=new_var)

    def step_pair(self, state, eps0, eps1, t0):
        # Override the base gather-sharing pair step: these variants must
        # NOT gather (that is the cost being isolated).
        st1 = self.step(state, eps0, t0)
        return st1, self.step(st1, eps1, t0 + 1)


class NormalGARCH(NoGatherGARCH):
    """Box-Muller normal shocks (GBM's draw cost + GARCH's recurrence)."""

    def draws_pair(self, seed, stream, path_ids, j, dtype=jnp.float32):
        j = jnp.asarray(j).astype(jnp.uint32)
        b0, b1 = random_bits(seed, stream, path_ids, j)
        z0, z1 = boxmuller_pair(b0, b1, dtype)
        return (z0,), (z1,)


def bench(name, proc):
    def fn(n_paths, n_steps, *, seed):
        return fused_terminal_pallas(proc, n_paths, n_steps, seed=seed,
                                     block_rows=128)
    tp = throughput_path_steps(fn, N_PATHS, N_STEPS, reps=4)
    print(f"{name:26s} {tp/1e9:7.1f}e9 path-steps/s")
    return tp


if __name__ == "__main__":
    print(f"platform: {jax.devices()[0].platform}")
    ret5y = rng.normal(0, 0.02, size=1260)  # 5y history, the reference default
    base = GARCHBootstrap.create(returns, s0=100.0, var0=0.0001)
    b128 = GARCHBootstrap.create(returns[:128], s0=100.0, var0=0.0001,
                                 pad_to=128)
    nog = NoGatherGARCH.create(returns, s0=100.0, var0=0.0001)
    nrm = NormalGARCH.create(returns, s0=100.0, var0=0.0001)
    g5y = GARCHBootstrap.create(ret5y, s0=100.0, var0=0.0001)        # 1280
    g5y_pow2 = GARCHBootstrap.create(ret5y, s0=100.0, var0=0.0001,
                                     pad_to=2048)                    # old pad

    bench("A 2y (pad 512, 4 rows)", base)
    bench("B pad 128 (1 row)", b128)
    bench("C no gather", nog)
    bench("D normal-shock garch", nrm)
    bench("F 5y (pad 1280, 10 rows)", g5y)
    bench("G 5y (pad 2048, 16 rows)", g5y_pow2)

    def gbm_fn(n_paths, n_steps, *, seed):
        proc = GBM.create(s0=100.0, mu=0.03, sigma=0.2, dt=1.0 / 252.0)
        return gbm_terminal_pallas(proc, n_paths, n_steps, seed=seed,
                                   block_rows=128)
    tp = throughput_path_steps(gbm_fn, N_PATHS, N_STEPS, reps=4)
    print(f"{'E gbm reference':26s} {tp/1e9:7.1f}e9 path-steps/s")
