#!/usr/bin/env python
"""Per-replicate bridge-RQMC means, TPU vs CPU, exact tolerance_bench config.

bias_bisect.py showed a single replicate (Owen key 2) is near-unbiased on
TPU, yet the 8-replicate estimate (keys = golden-ratio strides of seed 2)
sits -1.8e-3 low with a 4.8e-6 spread -- every replicate equally low.
Print each replicate's mean on both platforms to see whether the bias is
(a) per-key and shared by the stride keys only, or (b) introduced by the
scanned-stacked-sampler program structure itself.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from montecarlo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache("_bench")


def main() -> None:
    from montecarlo_tpu.engine.pricing import (_replicate_shift_seeds,
                                               _rqmc_replicate_means,
                                               _stack_samplers)
    from montecarlo_tpu.processes import GBM
    from montecarlo_tpu.rng import SobolBridgeKernelSampler

    steps, n_per, reps = 252, 1 << 19, 8
    proc = GBM.create(s0=100.0, mu=0.03, sigma=0.2, dt=1.0 / steps)
    payoff = lambda s: jnp.maximum(s - 105.0, 0.0)
    disc = float(np.exp(-0.03))
    bs = 7.1280646692617395  # f64 Black-Scholes reference

    stacked = _stack_samplers([SobolBridgeKernelSampler.create(
        steps, scramble_seed=100 + r) for r in range(reps)])
    rep_seeds = _replicate_shift_seeds(2, reps)
    print("rep_seeds:", [hex(int(s)) for s in np.asarray(rep_seeds)])

    for backend in ("tpu", "cpu"):
        if backend == "cpu":
            dev = jax.devices("cpu")[0]
        else:
            dev = jax.devices()[0]
            if dev.platform == "cpu":
                continue
        with jax.default_device(dev):
            m = _rqmc_replicate_means(
                proc, payoff, jax.device_put(stacked, dev),
                jax.device_put(rep_seeds, dev), n_per=n_per, n_steps=steps)
            m = np.asarray(m, np.float64) * disc
        print(json.dumps({
            "backend": backend,
            "replicate_means_minus_bs": [round(float(v - bs), 7) for v in m],
            "mean_gap": round(float(m.mean() - bs), 7),
        }))


if __name__ == "__main__":
    main()
