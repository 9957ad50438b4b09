#!/usr/bin/env python
"""Localize the bridge-RQMC bias observed on the TPU kernel path.

Observed (tolerance_bench --bridge on the real chip): price ~1.8e-3 BELOW
Black-Scholes with a replicate-spread std-err of 4.9e-6 (~390 sigma), while
the SAME shapes/seeds on the CPU scan engine are unbiased (gap -7.7e-6).
Hypotheses:
  (a) Mosaic kernel lowering differs from the scan engine's XLA lowering
      (would show as kernel-vs-scan divergence ON TPU, same seeds);
  (b) TPU-wide arithmetic (e.g. transcendental exp/log precision over 252
      steps) shared by BOTH engines (kernel == scan on TPU, both below BS);
  (c) point-set/randomization defect at scale (would bias CPU too - already
      ruled out by the CPU run).

This probe runs the 8-replicate RQMC estimate compiled on the real TPU via
the fused kernel AND via the scan engine (forced by disabling the dispatch
gate), for both the bridge and flat device-Sobol samplers, and prints each
price, its replicate-spread std-err, and the gap to Black-Scholes in sigmas.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp

from montecarlo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache("_bench")


def main() -> None:
    from montecarlo_tpu.engine import black_scholes_call, rqmc_estimate
    from montecarlo_tpu.engine import dispatch
    from montecarlo_tpu.processes import GBM
    from montecarlo_tpu.rng import SobolBridgeKernelSampler
    from montecarlo_tpu.rng.sobol import SobolDeviceSampler

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    steps = 252 if on_tpu else 16
    n_per = (1 << 19) if on_tpu else (1 << 11)
    reps = 8

    proc = GBM.create(s0=100.0, mu=0.03, sigma=0.2, dt=1.0 / steps)
    payoff = lambda s: jnp.maximum(s - 105.0, 0.0)
    disc = float(jnp.exp(-0.03))
    bs = float(black_scholes_call(100.0, 105.0, 0.03, 0.2, 1.0))
    print(json.dumps({"platform": jax.devices()[0].platform, "bs": bs,
                      "steps": steps, "n_per_replicate": n_per}))

    factories = {
        "bridge": lambda r: SobolBridgeKernelSampler.create(
            steps, scramble_seed=100 + r),
        "flat": lambda r: SobolDeviceSampler.create(
            steps, 1, scramble_seed=100 + r),
    }

    real_gate = dispatch._fused_eligible
    for name, factory in factories.items():
        for engine in ("kernel", "scan"):
            dispatch._fused_eligible = (
                real_gate if engine == "kernel" else
                lambda *a, **k: None)
            try:
                out = rqmc_estimate(proc, payoff, n_paths=reps * n_per,
                                    n_steps=steps, seed=2,
                                    sampler_factory=factory,
                                    n_replicates=reps, discount=disc)
                price = float(out["price"])
                se = float(out["std_err"])
                print(json.dumps({
                    "sampler": name, "engine": engine, "price": price,
                    "std_err": se, "gap": round(price - bs, 8),
                    "gap_sigma": round((price - bs) / max(se, 1e-12), 1),
                }))
            finally:
                dispatch._fused_eligible = real_gate


if __name__ == "__main__":
    main()
