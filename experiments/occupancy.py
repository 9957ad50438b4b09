#!/usr/bin/env python
"""Mosaic occupancy study (TODO perf item 4): compiler hints on the GBM
kernel — dimension_semantics, vmem limits, cost estimates."""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from montecarlo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache("_bench")

from montecarlo_tpu.ops.gbm_kernel import _gbm_kernel, LANES
from montecarlo_tpu.rng.threefry import key_from_seed_dynamic
from montecarlo_tpu.processes import GBM

N_PATHS, N_STEPS, REPS = 1 << 20, 1024, 8


def run_variant(name, block_rows, compiler_params=None, cost_estimate=None):
    proc = GBM.create(s0=100.0, mu=0.03, sigma=0.2, dt=1.0 / 252.0)
    block = block_rows * LANES
    num_blocks = N_PATHS // block
    drift = (proc.mu - 0.5 * jnp.square(proc.sigma)) * proc.dt
    scale = proc.sigma * jnp.sqrt(proc.dt)
    params = jnp.stack([drift.astype(jnp.float32), scale.astype(jnp.float32),
                        jnp.log(proc.s0).astype(jnp.float32)]).reshape(1, 3)

    kernel = functools.partial(_gbm_kernel, n_steps=N_STEPS,
                               block_rows=block_rows, rng="threefry")
    kw = {}
    if compiler_params is not None:
        kw["compiler_params"] = compiler_params
    if cost_estimate is not None:
        kw["cost_estimate"] = cost_estimate

    def call(scalars):
        return pl.pallas_call(
            kernel, grid=(num_blocks,),
            in_specs=[pl.BlockSpec((1, 3), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM)] * 2,
            out_specs=pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((num_blocks * block_rows, LANES),
                                           jnp.float32),
            **kw,
        )(params, scalars)

    @jax.jit
    def bench(seed0):
        def body(i, acc):
            k0, k1 = key_from_seed_dynamic(seed0 + i, 0)
            scalars = jnp.stack([jnp.int32(0), k0.astype(jnp.int32),
                                 k1.astype(jnp.int32)]).reshape(1, 3)
            return acc + call(scalars)[0, 0]
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    float(bench(jnp.int32(1)))
    t0 = time.time()
    float(bench(jnp.int32(1000)))
    dt = (time.time() - t0) / REPS
    print(f"{name:40s} {N_PATHS * N_STEPS / dt / 1e9:6.1f}e9 path-steps/s")


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform)
    run_variant("baseline 128 rows", 128)
    run_variant("dimension_semantics=parallel", 128,
                pltpu.CompilerParams(dimension_semantics=("parallel",)))
    run_variant("dimension_semantics=arbitrary", 128,
                pltpu.CompilerParams(dimension_semantics=("arbitrary",)))
    flops = 2 * N_PATHS * N_STEPS * 60
    run_variant("cost_estimate hint", 128,
                cost_estimate=pl.CostEstimate(
                    flops=flops, bytes_accessed=N_PATHS * 4,
                    transcendentals=N_PATHS * N_STEPS * 2))
    run_variant("64 rows + parallel", 64,
                pltpu.CompilerParams(dimension_semantics=("parallel",)))
    run_variant("vmem cap 64MB", 128,
                pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024))
