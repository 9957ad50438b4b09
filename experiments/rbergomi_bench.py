#!/usr/bin/env python
"""Rough-Bergomi sampler throughput, ablations, and the precision-fix cost.

The rBergomi sampler is one (2T, 2T) @ (2T, N) Cholesky matmul (MXU) plus
a Pallas bulk-normal draw matrix, elementwise v/exp and a price reduction
— not a per-step kernel, so it is benched here instead of
`new_process_bench.py`.

Timing: REPS-slope of a value-fetched chained jit — ``float(chained(...))``
at two rep counts, per-rep = slope.  On this relay `block_until_ready`
resolved EARLY (0.1 ms for 400 MB of pallas output) for some programs
while fencing others correctly; fetching the scalar and differencing rep
counts removes both the fixed ~35 ms relay round-trip and any readiness
ambiguity.  (The repo's headline GBM number reproduces under this
methodology: 35.8e9 vs bench.py's 34.7e9.)

    PYTHONPATH=/root/repo:$PYTHONPATH python experiments/rbergomi_bench.py
"""

import time

import jax
import jax.numpy as jnp

from montecarlo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache("_bench")

from montecarlo_tpu.processes.rough_bergomi import (RoughBergomi,
                                                    rbergomi_simulate)

N_PATHS, N_STEPS = 1 << 17, 256
REPS_LO, REPS_HI = 2, 10


def slope(fn):
    """Per-rep seconds of ``fn(off) -> array`` via the fetched-slope method."""
    times = {}
    for reps in (REPS_LO, REPS_HI):
        @jax.jit
        def chained(off0, reps=reps):
            def body(i, acc):
                return acc + fn(off0 + i * N_PATHS).ravel()[0]
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        float(chained(jnp.int32(0)))   # warm (compile)
        t0 = time.perf_counter()
        float(chained(jnp.int32(1000)))
        times[reps] = time.perf_counter() - t0
    return (times[REPS_HI] - times[REPS_LO]) / (REPS_HI - REPS_LO)


def rate(fn):
    return N_PATHS * N_STEPS / slope(fn) / 1e9


def ablations(model):
    """Cumulative pipeline stages, XLA draws vs the Pallas bulk kernel."""
    from montecarlo_tpu.engine.simulate import path_ids_for
    from montecarlo_tpu.ops.rng_kernel import normal_matrix_pallas
    from montecarlo_tpu.rng.normal import exp32, normal_draw

    T = model.n_steps
    cols = jnp.arange(3 * T, dtype=jnp.uint32)

    def z_xla(off):
        ids = path_ids_for(N_PATHS, off)
        return normal_draw(11, 0, ids[None, :], cols[:, None], jnp.float32)

    def z_kernel(off):
        return normal_matrix_pallas(11, 0, N_PATHS, 3 * T, path_offset=off)

    def stage_matmul(zfn):
        def fn(off):
            return jnp.matmul(model.chol, zfn(off)[:2 * T],
                              precision=jax.lax.Precision.HIGHEST)
        return fn

    def stage_v(zfn):
        def fn(off):
            j = stage_matmul(zfn)(off)
            t = model.t_grid
            return model.xi0 * exp32(model.eta * j[:T]
                                     - 0.5 * jnp.square(model.eta)
                                     * t[:, None] ** (2.0 * model.h))
        return fn

    for zname, zfn in (("xla", z_xla), ("kernel", z_kernel)):
        for name, fn in (("3T draws", zfn),
                         ("+ matmul", stage_matmul(zfn)),
                         ("+ v=exp32", stage_v(zfn))):
            print(f"  [{zname:6s}] {name:10s} {rate(fn):5.2f}e9 path-steps/s")


def main():
    print("platform:", jax.devices()[0].platform)
    m = RoughBergomi.create(100.0, 0.235 ** 2, 1.9, -0.9, 0.07,
                            n_steps=N_STEPS, T=1.0)
    ablations(m)

    def full(off):
        return rbergomi_simulate(m, N_PATHS, seed=11, path_offset=off)

    print(f"rBergomi full sampler ({N_PATHS} x {N_STEPS}): "
          f"{rate(full):5.2f}e9 path-steps/s")


if __name__ == "__main__":
    main()
