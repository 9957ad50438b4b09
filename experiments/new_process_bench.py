#!/usr/bin/env python
"""Fused-kernel throughput for the round-2 process additions.

Chained-single-jit methodology (DEVNOTES "axon relay"); run on the real
chip:

    PYTHONPATH=/root/repo:$PYTHONPATH python experiments/new_process_bench.py
"""

import jax
import numpy as np

from montecarlo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache("_bench")

from montecarlo_tpu.ops.fused_engine import fused_terminal_pallas
from montecarlo_tpu.processes import (CIR, NIG, SABR, Bates,
                                      EquityVasicekHybrid, EulerGBM,
                                      HullWhite, Kou, Merton,
                                      VarianceGamma, Vasicek)
from montecarlo_tpu.utils.profiling import throughput_path_steps

N_PATHS, N_STEPS = 1 << 20, 1024

PROCS = {
    "EulerGBM": EulerGBM.create(s0=100., mu=.03, sigma=.2, dt=1 / 252),
    "Bates": Bates.create(s0=100., v0=.04, mu=.03, kappa=2., theta=.04,
                          xi=.5, rho=-.7, lam=1., jump_mean=-.05,
                          jump_std=.1, dt=1 / 252),
    "Kou": Kou.create(s0=100., mu=.03, sigma=.2, lam=1., p_up=.4, eta1=10.,
                      eta2=5., dt=1 / 252),
    "Merton": Merton.create(s0=100., mu=.03, sigma=.2, lam=1.,
                            jump_mean=-.05, jump_std=.1, dt=1 / 252),
    "NIG": NIG.create(s0=100., mu=.03, alpha=15., beta=-5., delta=.5,
                      dt=1 / 252),
    "VG": VarianceGamma.create(s0=100., mu=.03, sigma=.2, theta=-.14,
                               nu=.2, dt=1 / 252),
    "SABR": SABR.create(f0=100., alpha=.2 * 100. ** .3, beta=.7, nu=.3,
                        rho=-.3, dt=1 / 252),
    "Vasicek": Vasicek.create(.03, .8, .05, .015, 1 / 252),
    "CIR": CIR.create(.03, .8, .05, .015, 1 / 252),
    "HullWhite": HullWhite.from_forward_curve(
        .02 + .005 * np.arange(N_STEPS + 1) / N_STEPS, a=.6, sigma=.012,
        dt=1 / 252),
    "Hybrid": EquityVasicekHybrid.create(100., .03, .8, .05, .015, .2,
                                         -.3, 1 / 252),
}


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform)
    for name, proc in PROCS.items():
        def run(n_paths, n_steps, seed):
            return fused_terminal_pallas(proc, n_paths, n_steps, seed=seed,
                                         block_rows=128)
        rate = throughput_path_steps(run, N_PATHS, N_STEPS)
        print(f"{name:10s} {rate / 1e9:6.1f}e9 path-steps/s")
