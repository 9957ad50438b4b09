#!/usr/bin/env python
"""Netting-set xVA engine wall-clock on the real chip.

The xVA engine is not a per-step kernel — one simulation, then a per-date
mark/net/collateralize/reduce pipeline (lax.map over the exposure grid,
jvp-carried IM sensitivities, WWR Newton calibration, quantile PFE) — so
it gets its own bench: wall-clock per FULL profile (every profile array +
the whole adjustment set incl. greeks-free level run) and the derived
mark throughput paths x dates x trades / s.

Timing: fetched-REPS-slope (DEVNOTES "axon relay" 2b) — the model's r0 is
perturbed per rep so XLA cannot hoist the loop-invariant profile out of
the chained fori_loop.

    PYTHONPATH=/root/repo:$PYTHONPATH python experiments/xva_bench.py
"""

import time

import jax
import jax.numpy as jnp

from montecarlo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache("_bench")

import numpy as np

from montecarlo_tpu.engine.exposure import (CSA, _netting_body,
                                            swap_value_fn,
                                            swaption_value_fn)
from montecarlo_tpu.engine.rates import vasicek_zcb
from montecarlo_tpu.processes import Vasicek

N_PATHS, N_STEPS = 1 << 16, 64
T, PERIODS = 5.0, 10
KAPPA, THETA, SIG = 0.8, 0.05, 0.015
DT = T / N_STEPS
PAY_DT = T / PERIODS
TIMES_FULL = PAY_DT * np.arange(1, PERIODS + 1)
CSA_TERMS = CSA(threshold=0.002, own_threshold=0.002, mta=0.0,
                mpor=4 * DT)
REPS_LO, REPS_HI = 1, 4


def _par(r0):
    ps = [vasicek_zcb(r0, KAPPA, THETA, SIG, t) for t in TIMES_FULL]
    return (1.0 - ps[-1]) / (PAY_DT * sum(ps))


K_FULL = _par(0.03)
TIMES_BACK = tuple(float(t) for t in TIMES_FULL if t > T / 2 + 1e-9)


def _book(model, with_swaption: bool):
    trades = (
        swap_value_fn(model, K_FULL, TIMES_FULL, PAY_DT, dtype=jnp.float32),
        lambda r, t: -0.6 * swap_value_fn(
            model, K_FULL, TIMES_FULL[:5], PAY_DT, dtype=jnp.float32)(r, t),
        lambda r, t: 0.5 * swap_value_fn(
            model, 1.1 * K_FULL, TIMES_FULL, PAY_DT,
            dtype=jnp.float32)(r, t),
    )
    if with_swaption:
        trades += (swaption_value_fn(model, K_FULL, T / 2, TIMES_BACK,
                                     PAY_DT, dtype=jnp.float32),)
    return trades


def _profile_scalar(r0, with_swaption: bool, wwr_beta: float):
    model = Vasicek.create(r0, KAPPA, THETA, SIG, DT, dtype=jnp.float32)
    res = _netting_body(
        model, _book(model, with_swaption), N_PATHS, N_STEPS, T=T, seed=7,
        csa=CSA_TERMS, quantile=0.95, hazard_rate=0.02, recovery=0.4,
        own_hazard_rate=0.01, own_recovery=0.4, funding_spread=0.004,
        wwr_beta=wwr_beta, im_spread=0.003, im_quantile=0.99,
        im_mpor=10.0 / 252.0, kva_cost=0.10, kva_capital_ratio=0.112,
        flat_rate=None, dtype=jnp.float32)
    return (res["cva"] + res["dva"] + res["fva"] + res["mva"] + res["kva"]
            + res["cva_wwr"] + res["pfe"][-1])


def slope(make_chained):
    times = {}
    for reps in (REPS_LO, REPS_HI):
        fn = make_chained(reps)
        float(fn(jnp.float32(0.03)))          # warm/compile
        t0 = time.perf_counter()
        float(fn(jnp.float32(0.0301)))
        times[reps] = time.perf_counter() - t0
    return (times[REPS_HI] - times[REPS_LO]) / (REPS_HI - REPS_LO)


def bench_profile(label, with_swaption, wwr_beta):
    def make_chained(reps):
        @jax.jit
        def chained(r0):
            def body(i, acc):
                return acc + _profile_scalar(
                    r0 + 1e-7 * i.astype(jnp.float32), with_swaption,
                    wwr_beta)
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        return chained

    s = slope(make_chained)
    n_tr = 4 if with_swaption else 3
    marks = N_PATHS * (N_STEPS + 1) * n_tr
    print(f"{label}: {s * 1e3:.1f} ms/profile  "
          f"({marks / s / 1e9:.2f}e9 trade-marks/s, "
          f"{N_PATHS * N_STEPS / s / 1e9:.2f}e9 path-steps/s sim-equiv)")
    return s


def bench_greeks():
    """Values + 3-parameter greeks in one program, fetched-REPS-slope
    (naive per-call timing lies through the relay — CLAUDE.md)."""

    def greeks_scalar(r0):
        def scalars(p):
            model = Vasicek.create(p["r0"], KAPPA, THETA, p["sigma"], DT,
                                   dtype=jnp.float32)
            res = _netting_body(
                model, _book(model, False), N_PATHS, N_STEPS, T=T, seed=7,
                csa=CSA_TERMS, quantile=0.95,
                hazard_rate=p["hazard_rate"], recovery=0.4,
                own_hazard_rate=0.01, own_recovery=0.4,
                funding_spread=0.004, wwr_beta=0.0, im_spread=0.003,
                im_quantile=0.99, im_mpor=10.0 / 252.0, kva_cost=0.10,
                kva_capital_ratio=0.112, flat_rate=None,
                dtype=jnp.float32)
            return res["cva"] + res["fva"] + res["kva"]

        params = {"r0": r0, "sigma": jnp.float32(SIG),
                  "hazard_rate": jnp.float32(0.02)}
        val, lin = jax.linearize(scalars, params)
        tot = val
        zeros = {k: jnp.zeros_like(v) for k, v in params.items()}
        for k in params:
            tangent = dict(zeros)
            tangent[k] = jnp.ones_like(params[k])
            tot = tot + lin(tangent)
        return tot

    def make_chained(reps):
        @jax.jit
        def chained(r0):
            def body(i, acc):
                return acc + greeks_scalar(
                    r0 + 1e-7 * i.astype(jnp.float32))
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        return chained

    s = slope(make_chained)
    print(f"xva greeks (level + d/d(r0, sigma, hazard), same book): "
          f"{s * 1e3:.1f} ms/set")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    print(f"book: 3 swaps (+1 swaption), {N_PATHS} paths x {N_STEPS + 1} "
          f"dates, CSA on, IM+MVA+KVA+WWR on")
    base = bench_profile("netting profile (3 swaps, wwr_beta=0)", False,
                         0.0)
    bench_profile("netting profile (+ physical swaption)", True, 0.0)
    bench_profile("netting profile (3 swaps, wwr_beta=1)", False, 1.0)
    bench_greeks()
