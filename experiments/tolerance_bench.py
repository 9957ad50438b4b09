#!/usr/bin/env python
"""Wall-clock to target std-err on the 1y European call (driver metric 2).

Compares the two on-device tolerance loops:
- plain iid chunked MC (`price_to_tolerance`, payoff+stats fused kernel)
- replicated-randomization RQMC (`price_to_tolerance_rqmc`, 8 scrambled
  device-Sobol replicates scanned inside one program)

Both are ONE jitted program with ONE host round-trip, so a plain wall-clock
around the call is honest through the axon relay (DEVNOTES: per-call timing
lies only when a loop of dispatches is involved).  Warm-up call compiles;
the timed call reuses the program with a different seed operand.

Usage: python experiments/tolerance_bench.py [--target 1e-3] [--rqmc-chunk N]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from montecarlo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache("_bench")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", type=float, default=1e-3)
    ap.add_argument("--steps", type=int, default=252)
    ap.add_argument("--plain-chunk", type=int, default=1 << 22)
    ap.add_argument("--rqmc-chunk", type=int, default=1 << 19)
    ap.add_argument("--replicates", type=int, default=8)
    ap.add_argument("--skip-plain", action="store_true")
    ap.add_argument("--bridge", action="store_true",
                    help="RQMC replicates use the Brownian-bridge kernel "
                         "sampler (terminal payoffs load all variance on "
                         "Sobol dim 0 -> far fewer points)")
    args = ap.parse_args()

    from montecarlo_tpu.engine import (price_to_tolerance,
                                       price_to_tolerance_rqmc)
    from montecarlo_tpu.processes import GBM

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    if not on_tpu:
        # CPU smoke shapes: correctness only, numbers meaningless.
        args.steps, args.plain_chunk, args.rqmc_chunk, args.target = (
            16, 1 << 14, 1 << 11, 5e-3)

    proc = GBM.create(s0=100.0, mu=0.03, sigma=0.2, dt=1.0 / args.steps)
    payoff = lambda s: jnp.maximum(s - 105.0, 0.0)
    disc = float(np.exp(-0.03))
    # The reference must be f64 host-side: an on-device f32 Black-Scholes
    # is only ~1e-4 accurate, which would dominate gap_sigma for the
    # bridge-RQMC rows (se ~5e-6).
    from scipy.stats import norm
    d1 = (np.log(100.0 / 105.0) + 0.03 + 0.02) / 0.2
    bs = float(100.0 * norm.cdf(d1)
               - 105.0 * np.exp(-0.03) * norm.cdf(d1 - 0.2))

    def run(fn, label, **kw):
        def once(seed):
            t0 = time.time()
            out = fn(proc, payoff, target_std_err=args.target, seed=seed,
                     n_steps=args.steps, discount=disc, **kw)
            price = float(out["price"])  # forces the single host transfer
            return time.time() - t0, price, out
        once(1)  # compile + warm
        dt, price, out = once(2)
        se = float(out["std_err"])
        rec = {
            "mode": label,
            "wall_s": round(dt, 4),
            "price": price,
            "std_err": se,
            "n_paths": float(out["n_paths"]),
            "n_chunks": int(out["n_chunks"]),
            "bs_gap_sigma": round(abs(price - bs) / max(se, 1e-12), 2),
        }
        print(json.dumps(rec))
        assert se <= args.target, rec
        return rec

    factory = None
    label = "rqmc"
    if args.bridge:
        from montecarlo_tpu.rng import SobolBridgeKernelSampler

        label = "rqmc-bridge"
        factory = (lambda r: SobolBridgeKernelSampler.create(
            args.steps, scramble_seed=100 + r))
    recs = {}
    recs[label] = run(price_to_tolerance_rqmc, label,
                      chunk_paths=args.rqmc_chunk,
                      n_replicates=args.replicates, max_chunks=1024,
                      sampler_factory=factory)
    recs["rqmc"] = recs[label]
    if not args.skip_plain:
        recs["plain"] = run(price_to_tolerance, "plain",
                            chunk_paths=args.plain_chunk)
        print(json.dumps({
            "speedup_rqmc_vs_plain":
                round(recs["plain"]["wall_s"] / recs["rqmc"]["wall_s"], 2),
            "path_ratio":
                round(recs["plain"]["n_paths"] / recs["rqmc"]["n_paths"], 1),
        }))


if __name__ == "__main__":
    main()
