#!/usr/bin/env python
"""Compiled-on-TPU smoke over every _FUSABLE process.

Interpret-mode tests cannot catch Mosaic lowering failures (the interpreter
supports primitives Mosaic does not — dynamic_slice bit the local-vol
process exactly this way).  Run this on the real chip after touching any
process or the fused engine:

    PYTHONPATH=/root/repo:$PYTHONPATH python experiments/tpu_compile_smoke.py
"""

import jax
import numpy as np

from montecarlo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache("_bench")

from montecarlo_tpu.engine.dispatch import terminal_prices
from montecarlo_tpu.processes import (CIR, G2PP, NIG, SABR, SLV,
                                      BasketGBM,
                                      Bates, BatesQE, CCCGarch, DCCGarch,
                                      EulerGBM,
                                      GBM, GARCHBootstrap, Heston, HestonQE,
                                      HullWhite, Kou, LocalVolGBM, Merton,
                                      TermBasketGBM, TermStructureGBM,
                                      VarianceGamma, Vasicek,
                                      slv_to_kernel)
import jax.numpy as jnp

# Short-rate observables may legitimately cross zero.
MAY_BE_NEGATIVE = {"Vasicek", "CIR", "HullWhite", "G2PP"}


def all_fusable_processes():
    rng = np.random.default_rng(0)
    corr3 = np.eye(3) * 0.5 + 0.5
    return {
        "GBM": GBM.create(s0=100., mu=.03, sigma=.2, dt=1 / 252),
        "GARCH": GARCHBootstrap.create(rng.normal(0, .02, 500), s0=100.,
                                       var0=1e-4),
        "Heston": Heston.create(s0=100., v0=.04, mu=.03, kappa=2.,
                                theta=.04, xi=.5, rho=-.7, dt=1 / 252),
        # Feller-violating surface: both QE branches exercised in 32 steps.
        "HestonQE": HestonQE.create(s0=100., v0=.04, mu=.03, kappa=.5,
                                    theta=.04, xi=1., rho=-.7, dt=1 / 252),
        "BatesQE": BatesQE.create(s0=100., v0=.04, mu=.03, kappa=.5,
                                  theta=.04, xi=1., rho=-.7, lam=1.,
                                  jump_mean=-.05, jump_std=.1, dt=1 / 252),
        "BasketGBM": BasketGBM.create(s0=[100., 50., 75.], mu=[.03] * 3,
                                      sigma=[.2, .3, .25], corr=corr3,
                                      weights=[1 / 3] * 3, dt=1 / 252),
        "Merton": Merton.create(s0=100., mu=.03, sigma=.2, lam=1.,
                                jump_mean=-.05, jump_std=.1, dt=1 / 252),
        "Bates": Bates.create(s0=100., v0=.04, mu=.03, kappa=2., theta=.04,
                              xi=.5, rho=-.7, lam=1., jump_mean=-.05,
                              jump_std=.1, dt=1 / 252),
        "CCC": CCCGarch.create(s0=[100., 50., 75.], var0=[2e-4] * 3,
                               omega=[1e-5] * 3, alpha=[.1] * 3,
                               beta=[.85] * 3, corr=corr3,
                               weights=[1 / 3] * 3),
        "DCC": DCCGarch.create(s0=[100., 50., 75.], var0=[2e-4] * 3,
                               omega=[1e-5] * 3, alpha=[.1] * 3,
                               beta=[.85] * 3, qbar=corr3,
                               weights=[1 / 3] * 3),
        "LocalVol": LocalVolGBM.create(
            100., .03, 1 / 64, 32,
            lambda t, s: np.clip(.2 * (s / 100) ** -.3, 1e-3, 2.)),
        "TermGBM": TermStructureGBM.from_curves(
            100., np.full(32, .03), np.full(32, .2), 1 / 64),
        "EulerGBM": EulerGBM.create(s0=100., mu=.03, sigma=.2, dt=1 / 252),
        "Kou": Kou.create(s0=100., mu=.03, sigma=.2, lam=1., p_up=.4,
                          eta1=10., eta2=5., dt=1 / 252),
        "Vasicek": Vasicek.create(.03, .8, .05, .015, 1 / 64),
        "G2PP": G2PP.create(.03, .8, .01, .1, .008, -.7, 1 / 64),
        "CIR": CIR.create(.03, .8, .05, .015, 1 / 64),
        "HullWhite": HullWhite.from_forward_curve(
            .02 + .005 * np.arange(33) / 16, a=.6, sigma=.012, dt=1 / 64),
        "SABR": SABR.create(f0=100., alpha=.2 * 100. ** .3, beta=.7, nu=.3,
                            rho=-.3, dt=1 / 64),
        "TermBasket": TermBasketGBM.create(
            np.array([100., 50., 75.]),
            np.tile([[.03], [.02], [.04]], (1, 32)),
            np.tile([[.2], [.3], [.25]], (1, 32)), corr3, [1 / 3] * 3,
            1 / 64),
        "NIG": NIG.create(s0=100., mu=.03, alpha=15., beta=-5., delta=.5,
                          dt=1 / 252),
        "VG": VarianceGamma.create(s0=100., mu=.03, sigma=.2, theta=-.14,
                                   nu=.2, dt=1 / 252),
        "SLV": _demo_slv(),
        "SLVKnots": slv_to_kernel(_demo_slv(), n_time_knots=8),
    }


def _demo_slv():
    rows = jnp.asarray(
        .2 + .05 * np.sin(np.linspace(0, 3, 32))[:, None]
        + .02 * np.cos(np.linspace(0, 2, 128))[None, :], jnp.float32)
    f32 = lambda v: jnp.asarray(v, jnp.float32)
    return SLV(s0=f32(100.), rate=f32(.03), v0=f32(.04), kappa=f32(2.),
               theta=f32(.04), xi=f32(.8), rho=f32(-.6), dt=f32(1 / 64),
               x0=f32(-.9), dx=f32(1.8 / 127), lev_rows=rows)


# Rate-process steps pick up different FMA contraction between the scan and
# kernel compilations (1-2 ULP), and DCC's per-path per-step Cholesky chain
# accumulates contraction differences to ~1e-6 relative when compiled;
# everything else must match bitwise.  Heston joined the class with the
# grouped step increment ((mu - v/2)*dt + sqrt(v*dt)*z1 is an FMA
# candidate — diverges on CPU interpret mode, DEVNOTES "Mosaic gotchas").
# NIG joined when the smoke first covered it: the IG-subordinator's
# sqrt/division chain is an FMA-contraction candidate when compiled
# (~1e-6 relative on <1% of paths; interpret mode matches bitwise).
ULP_TOLERANCE = {"Vasicek", "CIR", "HullWhite", "G2PP", "DCC", "Bates",
                 "Heston", "NIG", "HestonQE", "BatesQE"}


if __name__ == "__main__":
    from montecarlo_tpu.engine import simulate
    from montecarlo_tpu.engine.functionals import (ARITH_MEAN, RUNNING_MAX,
                                                   simulate_functionals)

    print("platform:", jax.devices()[0].platform)
    bad = []
    for name, p in all_fusable_processes().items():
        vals = np.asarray(terminal_prices(p, 1 << 15, 32, seed=3))
        ok = bool(np.isfinite(vals).all()) and (
            name in MAY_BE_NEGATIVE or vals.min() > 0)
        # Compiled-on-TPU engine parity: fused kernel vs lax.scan.
        ref = np.asarray(simulate(p, 1 << 15, 32, seed=3))
        if name in ULP_TOLERANCE:
            match = np.allclose(vals, ref, rtol=2e-6, atol=2e-8)
        else:
            match = (vals == ref).all()
        print(f"{name:10s} {'OK' if ok else 'BAD'} "
              f"median={np.median(vals):.2f} "
              f"parity={'OK' if match else 'FAIL'}")
        if not (ok and match):
            bad.append(name)

    # Fused path functionals (Asian mean / barrier max) compile too.
    f = simulate_functionals(all_fusable_processes()["GBM"], 1 << 15, 32,
                             seed=3, functionals={"avg": ARITH_MEAN,
                                                  "mx": RUNNING_MAX})
    ok_f = bool(np.isfinite(np.asarray(f["avg"])).all()
                and np.isfinite(np.asarray(f["mx"])).all())
    print(f"{'Functional':10s} {'OK' if ok_f else 'BAD'}")
    if not ok_f:
        bad.append("Functional")

    # Device-Sobol draws inside the kernel (one-hot table reads + ndtri32).
    from montecarlo_tpu.rng.sobol import SobolDeviceSampler

    procs = all_fusable_processes()
    for name, n_steps in (("GBM", 32), ("Heston", 32)):
        p = procs[name]
        smp = SobolDeviceSampler.create(n_steps, p.n_draws)
        vals = np.asarray(terminal_prices(p, 1 << 15, n_steps, seed=3,
                                          sampler=smp))
        ref = np.asarray(simulate(p, 1 << 15, n_steps, seed=3, sampler=smp))
        ok_s = bool(np.isfinite(vals).all()) and vals.min() > 0
        match = np.allclose(vals, ref, rtol=2e-6, atol=2e-8)
        print(f"{'Sobol-' + name:10s} {'OK' if ok_s else 'BAD'} "
              f"median={np.median(vals):.2f} "
              f"parity={'OK' if match else 'FAIL'}")
        if not (ok_s and match):
            bad.append("Sobol-" + name)
    raise SystemExit(1 if bad else 0)
