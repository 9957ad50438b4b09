#!/usr/bin/env python
"""Benchmark: GBM path-steps/sec/chip via the fused Pallas kernel.

The driver-set north-star metric (BASELINE.json): counter-based Threefry RNG
inside a fused Pallas path kernel, target >= 5e9 GBM path-steps/sec/chip on
TPU v5e.  Prints ONE JSON line.

Methodology: REPS kernel invocations (different seeds) chained by a data
dependency inside a single jit, timed with one host transfer at the end —
device-side throughput, free of host<->device relay latency.  The same
program also prices a 1-year European call (maturity folded into dt) as a
Black-Scholes sanity gate, so the whole benchmark is ONE compiled program
(cold Mosaic compiles through remote-compile relays are expensive).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

# Persistent compile cache: cold Mosaic compiles dominate a fresh run.
# Feature-scoped — a cache written on a different microarch can SIGSEGV on
# load (montecarlo_tpu/utils/compile_cache.py).
from montecarlo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache("_bench")

BASELINE_PATH_STEPS_PER_SEC = 5e9  # BASELINE.json north_star target


def sharded_main(mesh_devices: int = 1) -> None:
    """`bench.py --sharded [--mesh N]`: the full sharded estimator
    (shard_map -> fused kernel -> payoff -> block stats -> all_gather ->
    fixed-tree merge) on an N-device mesh, vs the raw-kernel headline —
    quantifies the collective / shard_map overhead the linear-scaling claim
    rides on (BASELINE.md row 3).

    ``--mesh N``: the scaling-readiness hook — on a multi-chip image this
    produces the scaling curve with zero code changes ("value" is the
    AGGREGATE mesh throughput; divide by N for per-chip).  If the live
    platform has fewer than N devices, an 8+ device virtual CPU mesh is
    bootstrapped (structure check only — CPU numbers are meaningless, which
    the emitted ``platform`` field makes explicit).

    Chained by path_offset (seed is static in the sharded API): REPS
    disjoint path ranges inside one jit, one host transfer at the end.
    """
    import jax.numpy as jnp

    from montecarlo_tpu.engine.payoffs import black_scholes_call
    from montecarlo_tpu.parallel import make_mesh, sharded_mc_estimate
    from montecarlo_tpu.processes import GBM

    if len(jax.devices()) < mesh_devices:
        from __graft_entry__ import _ensure_devices

        _ensure_devices(mesh_devices)
    devices_available = len(jax.devices())
    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)
    if on_tpu:
        n_paths, n_steps, reps = mesh_devices << 20, 1024, 8
    else:
        n_paths, n_steps, reps = mesh_devices << 15, 64, 2

    mesh = make_mesh(mesh_devices)
    proc = GBM.create(s0=100.0, mu=0.03, sigma=0.2, dt=1.0 / n_steps)
    strike = 105.0
    payoff = lambda s: jnp.maximum(s - strike, 0.0)

    @jax.jit
    def bench(_seed0):
        def body(i, acc):
            est = sharded_mc_estimate(
                proc, payoff, n_paths, n_steps, seed=7, mesh=mesh,
                path_offset=i * n_paths)
            return acc + est["price"]
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    float(bench(jnp.int32(1)))  # compile + warm
    t0 = time.time()
    total = float(bench(jnp.int32(2)))
    dt = (time.time() - t0) / reps
    sharded_tp = n_paths * n_steps / dt

    # Raw kernel reference (same shapes, same methodology).
    from montecarlo_tpu.ops.gbm_kernel import gbm_terminal_pallas

    @jax.jit
    def raw(seed0):
        def body(i, acc):
            terminal = gbm_terminal_pallas(
                proc, n_paths, n_steps, seed=seed0 + i, block_rows=128,
                interpret=not on_tpu)
            return acc + terminal[0]
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    float(raw(jnp.int32(1)))
    t0 = time.time()
    float(raw(jnp.int32(1000)))
    raw_tp = n_paths * n_steps / ((time.time() - t0) / reps)

    # Sanity: the chained prices average to the Black-Scholes value.
    # Tolerance scales with the estimator SE (payoff std ~12 over
    # reps*n_paths draws) — a fixed 0.05 sat at ~1 SE on the small CPU
    # fallback shapes, a statistical knife edge.
    bs = float(black_scholes_call(100.0, 105.0, 0.03, 0.2, 1.0))
    mean_price = total / reps * float(jnp.exp(-0.03))  # apply 1y discount
    se_est = 12.0 / (reps * n_paths) ** 0.5
    assert abs(mean_price - bs) < 5 * se_est + 1e-3, (mean_price, bs)

    print(json.dumps({
        "metric": ("sharded_gbm_path_steps_per_sec_per_chip"
                   if mesh_devices == 1
                   else "sharded_gbm_path_steps_per_sec_mesh"),
        "value": sharded_tp,
        "unit": "path_steps/s",
        "vs_baseline": sharded_tp / BASELINE_PATH_STEPS_PER_SEC,
        "overhead_vs_raw_kernel": 1.0 - sharded_tp / raw_tp,
        "mesh_devices": mesh_devices,
        "devices_available": devices_available,
        "platform": platform,
    }))


def main() -> None:
    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)
    if on_tpu:
        n_paths, n_steps, reps, block_rows = 1 << 20, 1024, 8, 128
        interpret = False
    else:  # CPU smoke fallback (interpret mode) — numbers not meaningful
        n_paths, n_steps, reps, block_rows = 1 << 15, 64, 2, 64
        interpret = True

    from montecarlo_tpu.ops.gbm_kernel import gbm_terminal_pallas
    from montecarlo_tpu.processes import GBM
    from montecarlo_tpu.engine.payoffs import black_scholes_call

    # Maturity T=1y folded into dt so the benchmark workload is also the
    # sanity-check workload (one program).
    proc = GBM.create(s0=100.0, mu=0.03, sigma=0.2, dt=1.0 / n_steps)
    strike = jnp.float32(105.0)
    discount = jnp.float32(jnp.exp(-0.03))

    @jax.jit
    def bench(seed0):
        # Kernel-only chained loop — the timed program.
        def body(i, acc):
            terminal = gbm_terminal_pallas(
                proc, n_paths, n_steps, seed=seed0 + i,
                block_rows=block_rows, interpret=interpret)
            return acc + terminal[0]
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    @jax.jit
    def sanity(seed0):
        terminal = gbm_terminal_pallas(
            proc, n_paths, n_steps, seed=seed0,
            block_rows=block_rows, interpret=interpret)
        payoff = jnp.maximum(terminal - strike, 0.0)
        return discount * jnp.mean(payoff), discount * jnp.std(payoff)

    # Compile + warm up (also smokes the kernel end to end).
    float(bench(jnp.int32(1)))

    t0 = time.time()
    float(bench(jnp.int32(1000)))
    dt = (time.time() - t0) / reps
    path_steps_per_sec = n_paths * n_steps / dt

    # Black-Scholes sanity gate — guards against benchmarking garbage.
    price, payoff_std = map(float, sanity(jnp.int32(7)))
    se = payoff_std / float(jnp.sqrt(n_paths * 1.0))
    bs = float(black_scholes_call(100.0, 105.0, 0.03, 0.2, 1.0))
    assert abs(price - bs) < 5 * se + 1e-3, (price, bs, se)

    print(json.dumps({
        "metric": "gbm_path_steps_per_sec_per_chip",
        "value": path_steps_per_sec,
        "unit": "path_steps/s",
        "vs_baseline": path_steps_per_sec / BASELINE_PATH_STEPS_PER_SEC,
    }))


if __name__ == "__main__":
    import sys

    if "--sharded" in sys.argv:
        n = 1
        if "--mesh" in sys.argv:
            n = int(sys.argv[sys.argv.index("--mesh") + 1])
        sharded_main(n)
    else:
        main()
