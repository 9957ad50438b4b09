#!/usr/bin/env python
"""Bisect the TPU-vs-CPU terminal divergence elementwise, same seeds.

bias_probe.py established: scan == kernel BITWISE on TPU, both ~-1.8e-3
below f64 Black-Scholes, while CPU at the same shapes/seeds is unbiased.
All f32 adds/muls are IEEE-identical across platforms, so the divergence
must enter through the approximated transcendentals.  This probe runs the
SAME one-replicate bridge-Sobol simulation on TPU and on CPU and compares:

  1. the step-0 draws elementwise (covers ndtri32 + Sobol + Owen hash);
  2. the terminal prices elementwise (adds log(s0) init + 252 f32 adds +
     final exp);
  3. direct additive error of jnp.log at s0=100 and relative error of
     jnp.exp over the terminal log-price range [4.0, 5.2], vs f64.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from montecarlo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache("_bench")


def main() -> None:
    from montecarlo_tpu.engine.dispatch import terminal_prices
    from montecarlo_tpu.processes import GBM
    from montecarlo_tpu.rng import SobolBridgeKernelSampler

    assert jax.devices()[0].platform not in ("cpu",), "run on the TPU image"
    cpu = jax.devices("cpu")[0]

    steps, n = 252, 1 << 19
    proc = GBM.create(s0=100.0, mu=0.03, sigma=0.2, dt=1.0 / steps)
    smp = SobolBridgeKernelSampler.create(steps, scramble_seed=100)

    def draws0(pids):
        return smp.draws(proc, jnp.uint32(2), jnp.uint32(0), pids, 0)[0]

    pids = jnp.arange(n, dtype=jnp.uint32)
    z_tpu = np.asarray(jax.jit(draws0)(pids))
    with jax.default_device(cpu):
        z_cpu = np.asarray(jax.jit(draws0, backend="cpu")(jnp.arange(
            n, dtype=jnp.uint32)))
    diff = z_tpu.astype(np.float64) - z_cpu.astype(np.float64)
    print(json.dumps({"z_bitwise_equal": bool((z_tpu == z_cpu).all()),
                      "z_mean_diff": float(diff.mean()),
                      "z_max_abs_diff": float(np.abs(diff).max())}))

    def term(seed):
        return terminal_prices(proc, n, steps, seed=seed, sampler=smp,
                               prefer_fused=False)

    s_tpu = np.asarray(jax.jit(term)(jnp.uint32(2)))
    with jax.default_device(cpu):
        s_cpu = np.asarray(jax.jit(term, backend="cpu")(jnp.uint32(2)))
    rel = (s_tpu.astype(np.float64) - s_cpu.astype(np.float64)) / s_cpu
    print(json.dumps({"terminal_bitwise_equal": bool((s_tpu == s_cpu).all()),
                      "terminal_mean_rel": float(rel.mean()),
                      "terminal_rms_rel": float(np.sqrt((rel ** 2).mean())),
                      "terminal_max_abs_rel": float(np.abs(rel).max())}))
    # Price impact of the terminal divergence alone:
    disc = np.exp(-0.03)
    p_tpu = disc * np.maximum(s_tpu.astype(np.float64) - 105.0, 0).mean()
    p_cpu = disc * np.maximum(s_cpu.astype(np.float64) - 105.0, 0).mean()
    print(json.dumps({"payoff_mean_tpu": p_tpu, "payoff_mean_cpu": p_cpu,
                      "gap": p_tpu - p_cpu}))

    # 3. The two transcendentals the log-space pipeline actually calls.
    lg = float(jax.jit(jnp.log)(jnp.float32(100.0)))
    print(json.dumps({"log100_tpu_add_err": lg - float(np.log(100.0)),
                      "log100_ulp": (lg - float(np.log(
                          np.float64(100.0)))) / np.spacing(
                          np.float32(4.60517), dtype=np.float32).item()}))
    x = np.linspace(4.0, 5.2, 1_000_001).astype(np.float32)
    ex = np.asarray(jax.jit(jnp.exp)(jnp.asarray(x)), np.float64)
    exact = np.exp(x.astype(np.float64))
    r = (ex - exact) / exact
    print(json.dumps({"exp_[4,5.2]_mean_rel": float(r.mean()),
                      "exp_rms_rel": float(np.sqrt((r ** 2).mean())),
                      "exp_max_abs_rel": float(np.abs(r).max())}))


if __name__ == "__main__":
    main()
