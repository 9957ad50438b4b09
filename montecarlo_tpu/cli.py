"""Command-line interface — flags mirror the reference's sidebar widgets.

Subcommands:
  analyze  — single-ticker deep dive (reference 'Single Stock' mode,
             app.py:1182-1257: horizon 5-60 default 20, sims 500-5000
             default 1000, backtest toggle, cv-folds/estimators/retrain)
  scan     — multi-ticker scanner (reference 'Scanner' mode,
             app.py:1262-1532: universe, max stocks, horizon, min accuracy,
             fast/balanced/full reliability, workers)
  price    — Monte Carlo option pricing on the TPU engine (GBM/CEV/Heston/
             Bates/Merton/Kou/SABR/rough-Bergomi; vanilla/Asian/lookback/
             barrier incl. knock-in + Brownian-bridge correction; American
             via LSM; MLMC; plain/antithetic/Sobol incl. device-native)
  greeks   — pathwise (autodiff) or likelihood-ratio sensitivities
  var      — portfolio VaR/CVaR at scale (streaming sketch, checkpointable)
  stress   — scenario grids / named stress P&L (common random numbers)
  calibrate— fit Heston / SABR / VG / NIG / Merton / Kou to an implied-
             vol surface (Adam on exact gradients; omitting --surface
             generates and recovers a known surface)
  xva      — exposure profiles (EPE/ENE/PFE) + CVA/DVA/FVA/MVA for a swap
             (Vasicek) or equity forward; --portfolio nets a multi-trade
             book with CSA collateral (threshold/MTA/MPoR)
  note     — structured notes: autocallables (worst-of capable), cliquets
  bench    — the headline GBM throughput benchmark

Usage: python -m montecarlo_tpu.cli <subcommand> [flags]
"""

from __future__ import annotations

import argparse
import json
import sys

from montecarlo_tpu.config import ModelConfig, RELIABILITY_MODES, TradingConfig


def _add_analyze(sub):
    p = sub.add_parser("analyze", help="single-ticker deep dive")
    p.add_argument("ticker", nargs="?", default="NVDA")
    p.add_argument("--horizon", type=int, default=20,
                   help="forecast horizon in days (5-60)")
    p.add_argument("--sims", type=int, default=1000,
                   help="Monte Carlo simulations (500-5000)")
    p.add_argument("--no-backtest", action="store_true")
    p.add_argument("--cv-folds", type=int, default=5)
    p.add_argument("--estimators", type=int, default=100)
    p.add_argument("--retrain-freq", type=int, default=60)
    p.add_argument("--period", default="5y")
    p.add_argument("--provider", default=None,
                   choices=[None, "yfinance", "synthetic", "csv"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fit-garch", action="store_true",
                   help="QMLE-fit GARCH omega/alpha/beta to the return "
                        "history instead of the reference's hardcoded "
                        "(1e-5, 0.10, 0.85)")
    p.add_argument("--json", action="store_true", help="JSON output")


def _add_scan(sub):
    p = sub.add_parser("scan", help="multi-ticker scanner")
    p.add_argument("--source", default="Popular Stocks",
                   help="universe: 'S&P 500', 'Nasdaq 100', "
                        "'Popular Stocks', 'Mega Caps Only', 'ETFs Only', "
                        "'All Combined'")
    p.add_argument("--tickers", default=None,
                   help="comma-separated custom list (overrides --source)")
    p.add_argument("--max-stocks", type=int, default=50)
    p.add_argument("--horizon", type=int, default=20)
    p.add_argument("--min-accuracy", type=float, default=52.0)
    p.add_argument("--mode", default="balanced",
                   choices=list(RELIABILITY_MODES))
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--timeout", type=float, default=120.0,
                   help="per-ticker deadline in seconds (reference: 120)")
    p.add_argument("--sequential", action="store_true")
    p.add_argument("--batched", action="store_true",
                   help="vmapped device batching over the ticker axis "
                        "(TPU fast path) instead of the thread pool")
    p.add_argument("--provider", default=None)
    p.add_argument("--json", action="store_true")


def _add_price(sub):
    p = sub.add_parser("price", help="Monte Carlo option pricing")
    p.add_argument("--process", default="gbm",
                   choices=["gbm", "cev", "heston", "bates", "merton",
                            "kou", "nig", "vg", "sabr", "rbergomi", "slv",
                            "hybrid"])
    p.add_argument("--s0", type=float, default=100.0)
    p.add_argument("--strike", type=float, default=105.0)
    p.add_argument("--rate", type=float, default=0.03)
    p.add_argument("--sigma", type=float, default=0.2)
    p.add_argument("--beta", type=float, default=0.7,
                   help="CEV elasticity (--process cev)")
    p.add_argument("--sigma-r", type=float, default=0.015,
                   help="hybrid: Vasicek rate vol (equity-rate corr via "
                        "--rho, mean reversion --kappa, level --theta)")
    p.add_argument("--skew", type=float, default=-0.1,
                   help="slv: demo-surface IV skew per unit log-moneyness "
                        "(iv = sigma + skew*log(K/S0))")
    p.add_argument("--maturity", type=float, default=1.0, help="years")
    p.add_argument("--paths", type=int, default=100_000)
    p.add_argument("--steps", type=int, default=252)
    p.add_argument("--sampler", default="plain",
                   choices=["plain", "antithetic", "sobol",
                            "sobol-device", "sobol-bridge"])
    p.add_argument("--payoff", default="call",
                   choices=["call", "put", "digital", "asian", "lookback",
                            "up-and-out", "up-and-in", "max-call"])
    # Multi-asset extras (--payoff max-call)
    p.add_argument("--n-assets", type=int, default=2,
                   help="max-call: number of (symmetric) assets")
    p.add_argument("--div", type=float, default=0.0,
                   help="max-call: continuous dividend yield (risk-neutral "
                        "drift = rate - div)")
    p.add_argument("--asset-corr", type=float, default=0.0,
                   help="max-call: common pairwise correlation")
    p.add_argument("--barrier", type=float, default=None,
                   help="barrier level for up-and-out (default 1.2*strike)")
    p.add_argument("--bridge", action="store_true",
                   help="up-and-out: Brownian-bridge continuous-barrier "
                        "correction (monitoring-frequency-unbiased; gbm)")
    p.add_argument("--american", action="store_true",
                   help="American exercise via Longstaff-Schwartz "
                        "(call/put payoffs)")
    p.add_argument("--american-bound", action="store_true",
                   help="with --american: also report the Andersen-Broadie "
                        "duality upper bound (brackets the true price)")
    p.add_argument("--mlmc", action="store_true",
                   help="multilevel Monte Carlo (Giles) over a geometric "
                        "step ladder — Euler-discretized gbm or heston, "
                        "European call/put; prices to --mlmc-rmse")
    p.add_argument("--mlmc-rmse", type=float, default=0.01,
                   help="total RMSE target for --mlmc (bias + statistical)")
    p.add_argument("--target-se", type=float, default=None,
                   help="price until the discounted std-err reaches this "
                        "target instead of a fixed --paths (on-device "
                        "adaptive loop; vanilla payoffs). --sampler plain "
                        "uses the iid chunked loop; sobol-device uses "
                        "replicated-randomization RQMC (typically ~10-30x "
                        "fewer paths)")
    p.add_argument("--seed", type=int, default=0)
    # Heston extras
    p.add_argument("--v0", type=float, default=0.04)
    p.add_argument("--kappa", type=float, default=2.0)
    p.add_argument("--theta", type=float, default=0.04)
    p.add_argument("--xi", type=float, default=0.5)
    p.add_argument("--rho", type=float, default=-0.7)
    # Merton/Kou extras
    p.add_argument("--jump-intensity", type=float, default=1.0)
    p.add_argument("--jump-mean", type=float, default=-0.05)
    p.add_argument("--jump-std", type=float, default=0.1)
    p.add_argument("--p-up", type=float, default=0.4,
                   help="Kou: probability a jump is upward")
    p.add_argument("--eta1", type=float, default=10.0,
                   help="Kou: up-jump decay (>1)")
    p.add_argument("--eta2", type=float, default=5.0,
                   help="Kou: down-jump decay")
    # NIG extras (pure-jump Levy; --sigma unused)
    p.add_argument("--nig-alpha", type=float, default=15.0,
                   help="NIG: tail heaviness (> |nig-beta + 1|)")
    p.add_argument("--nig-beta", type=float, default=-5.0,
                   help="NIG: skewness (< 0 skews the down-tail)")
    p.add_argument("--nig-delta", type=float, default=0.5,
                   help="NIG: scale per unit time")
    # Variance-gamma extras (--sigma is the subordinated BM scale)
    p.add_argument("--vg-theta", type=float, default=-0.14,
                   help="VG: subordinated drift (< 0 skews the down-tail)")
    p.add_argument("--vg-nu", type=float, default=0.2,
                   help="VG: subordinator variance rate (kurtosis; "
                        "needs dt <= nu)")
    # SABR extras (--sigma is alpha, --beta the CEV exponent, --rho the corr)
    p.add_argument("--nu", type=float, default=0.3,
                   help="SABR vol-of-vol")
    # rough Bergomi extras (--v0 is xi0, --rho the spot-vol corr)
    p.add_argument("--hurst", type=float, default=0.1,
                   help="rough Bergomi Hurst exponent (< 0.5 = rough)")
    p.add_argument("--eta", type=float, default=1.5,
                   help="rough Bergomi vol-of-vol")


def cmd_analyze(args) -> int:
    from montecarlo_tpu.api import analyze_ticker
    from montecarlo_tpu import report

    cfg = ModelConfig(cv_folds=args.cv_folds, n_estimators=args.estimators)
    out = analyze_ticker(
        args.ticker, forecast_horizon=args.horizon, n_sims=args.sims,
        run_backtest=not args.no_backtest,
        retrain_frequency=args.retrain_freq, period=args.period,
        model_config=cfg, trading_config=TradingConfig(),
        provider=args.provider, seed=args.seed,
        fit_garch_params=args.fit_garch,
        progress_callback=lambda m: print(f"  {m}", file=sys.stderr))
    if out is None:
        print(f"Could not analyze {args.ticker}: insufficient data or "
              "training failed", file=sys.stderr)
        return 1
    if args.json:
        res = {k: v for k, v in out["results"].items()
               if k != "fold_predictions"}
        mc = {k: v for k, v in (out["mc_results"] or {}).items()
              if k not in ("paths", "final_prices", "path_percentiles")}
        bt = (out["backtest_results"] or {}).get("metrics")
        print(json.dumps({"ticker": out["ticker"], "results": res,
                          "mc": mc, "backtest": bt}, default=float))
    else:
        print(report.analysis_report(out))
    return 0


def cmd_scan(args) -> int:
    from montecarlo_tpu.api import scan_tickers
    from montecarlo_tpu.data import get_ticker_list
    from montecarlo_tpu import report

    if args.tickers:
        tickers = [t.strip().upper() for t in args.tickers.replace(
            "\n", ",").split(",") if t.strip()]
    else:
        tickers = get_ticker_list(args.source)
    tickers = tickers[:args.max_stocks]
    cfg, period = RELIABILITY_MODES[args.mode]

    def progress(done, total, out):
        print(f"  scanned {done}/{total} | ok {len(out.results)} "
              f"| failed {len(out.failed)}", file=sys.stderr)

    if args.batched:
        from montecarlo_tpu.api import scan_tickers_batched

        res = scan_tickers_batched(
            tickers, forecast_horizon=args.horizon, config=cfg,
            period=period, provider=args.provider,
            progress_callback=progress)
    else:
        res = scan_tickers(
            tickers, forecast_horizon=args.horizon, config=cfg,
            period=period, provider=args.provider,
            parallel=not args.sequential, n_workers=args.workers,
            timeout=args.timeout, progress_callback=progress)
    if args.json:
        print(json.dumps({"results": res.results,
                          "failed": res.failed,
                          "summary": res.summary(len(tickers),
                                                 args.min_accuracy)},
                         default=float))
    else:
        print(report.scan_report(res, len(tickers), args.min_accuracy))
    return 0


def _sobol_replicate_factory(args, proc, n_per: int):
    """Per-replicate sampler factory for RQMC — a FRESH scramble per
    replicate (a digital shift alone understates the spread; see
    `rqmc_estimate`).  Maps the CLI's three ``--sampler sobol*`` variants."""
    if args.sampler == "sobol-bridge":
        # Kernel variant: scratch-cached bridge normals ride the fused
        # Pallas kernels on TPU (array leaves, so replicates stack);
        # scan-engine delegate elsewhere — identical streams.
        from montecarlo_tpu.rng import SobolBridgeKernelSampler

        return (lambda r: SobolBridgeKernelSampler.create(
            args.steps, scramble_seed=args.seed + r))
    if args.sampler == "sobol":
        # Host Owen-scrambled sampler, re-scrambled per replicate.
        from montecarlo_tpu.samplers import SobolSampler

        return (lambda r: SobolSampler.create(
            n_per, args.steps, proc.n_draws, seed=args.seed + r))
    from montecarlo_tpu.rng import SobolDeviceSampler

    return (lambda r: SobolDeviceSampler.create(
        args.steps, proc.n_draws, scramble_seed=args.seed + r))


def cmd_price(args) -> int:
    import jax.numpy as jnp
    from montecarlo_tpu.engine import (
        discount_factor, european_call, mc_estimate,
        black_scholes_call,
    )
    from montecarlo_tpu.processes import GBM, Heston, LocalVolGBM, Merton
    from montecarlo_tpu.samplers import (
        AntitheticSampler, PlainSampler, SobolSampler,
    )

    if args.target_se is not None and (
            args.american or args.mlmc
            or args.process in ("rbergomi", "hybrid")
            or args.payoff not in ("call", "put", "digital")):
        raise SystemExit(
            "--target-se applies to vanilla European payoffs "
            "(call/put/digital) without --american/--mlmc and outside the "
            "own-simulator processes (rbergomi/hybrid); for --mlmc the "
            "tolerance knob is --mlmc-rmse")
    dt = args.maturity / args.steps
    if args.process == "gbm":
        proc = GBM.create(s0=args.s0, mu=args.rate, sigma=args.sigma, dt=dt)
    elif args.process == "cev":
        # Constant elasticity of variance via the local-vol surface:
        # sigma_LN(S) = sigma * (S/S0)^(beta-1).
        import numpy as _np

        sigma, beta, s0 = args.sigma, args.beta, args.s0
        proc = LocalVolGBM.create(
            s0, args.rate, dt, args.steps,
            lambda t, s: _np.clip(sigma * (s / s0) ** (beta - 1.0),
                                  1e-4, 4.0))
    elif args.process == "merton":
        proc = Merton.create(s0=args.s0, mu=args.rate, sigma=args.sigma,
                             lam=args.jump_intensity,
                             jump_mean=args.jump_mean,
                             jump_std=args.jump_std, dt=dt)
    elif args.process == "kou":
        from montecarlo_tpu.processes import Kou

        proc = Kou.create(s0=args.s0, mu=args.rate, sigma=args.sigma,
                          lam=args.jump_intensity, p_up=args.p_up,
                          eta1=args.eta1, eta2=args.eta2, dt=dt)
    elif args.process == "nig":
        from montecarlo_tpu.processes import NIG

        proc = NIG.create(s0=args.s0, mu=args.rate, alpha=args.nig_alpha,
                          beta=args.nig_beta, delta=args.nig_delta, dt=dt)
    elif args.process == "vg":
        from montecarlo_tpu.processes import VarianceGamma

        proc = VarianceGamma.create(s0=args.s0, mu=args.rate,
                                    sigma=args.sigma, theta=args.vg_theta,
                                    nu=args.vg_nu, dt=dt)
    elif args.process == "sabr":
        import numpy as _np

        from montecarlo_tpu.processes import SABR

        # Forward-measure dynamics (driftless F): simulate the T-forward of
        # the spot, f0 = s0*e^{rT}, so discounting by --rate prices the same
        # risk-neutral spot as the gbm/heston branches (a bare f0 = s0 would
        # silently drop the forward growth — app.py's Derivatives Lab note).
        # --sigma is the lognormal ATM alpha, rescaled by F0^(1-beta) to CEV
        # units.
        f0 = args.s0 * float(_np.exp(args.rate * args.maturity))
        proc = SABR.create(f0=f0,
                           alpha=args.sigma * f0 ** (1.0 - args.beta),
                           beta=args.beta, nu=args.nu, rho=args.rho, dt=dt)
    elif args.process == "heston":
        proc = Heston.create(s0=args.s0, v0=args.v0, mu=args.rate,
                             kappa=args.kappa, theta=args.theta, xi=args.xi,
                             rho=args.rho, dt=dt)
    elif args.process == "slv":
        # Heston-SLV: leverage particle-calibrated (Gyongy) to a demo
        # skewed IV surface iv(K) = --sigma + --skew * log(K/S0), so the
        # model reprices those vanillas while --v0/--kappa/--theta/--xi/
        # --rho set the smile DYNAMICS (processes/slv.py).
        import numpy as _np

        from montecarlo_tpu.processes import LocalVolGBM as _LV
        from montecarlo_tpu.processes import calibrate_slv
        from montecarlo_tpu.processes.dupire import local_vol_fn_from_ivs

        ks = _np.linspace(0.7, 1.4, 15) * args.s0
        mats = _np.array([0.5, 1.0]) * args.maturity
        ivs = (args.sigma
               + args.skew * _np.log(ks / args.s0))[None, :].repeat(2, 0)
        vol_fn = local_vol_fn_from_ivs(ks, mats, ivs, s0=args.s0,
                                       rate=args.rate)
        lv = _LV.create(args.s0, args.rate, dt, args.steps, vol_fn,
                        x_min=-0.9, x_max=0.9)
        # Exact per-step leverage rows; rides the fused Pallas kernels at
        # ~11e9 path-steps/s via the KernelRows ref protocol
        # (ops/fused_engine.py) — slv_to_kernel's knot blend is the ~25%
        # faster documented approximation if ever needed.
        proc = calibrate_slv(
            lv, v0=args.v0, kappa=args.kappa, theta=args.theta, xi=args.xi,
            rho=args.rho, n_steps=args.steps,
            n_particles=min(args.paths, 1 << 17), seed=args.seed)
    elif args.process == "bates":
        from montecarlo_tpu.processes import Bates

        proc = Bates.create(s0=args.s0, v0=args.v0, mu=args.rate,
                            kappa=args.kappa, theta=args.theta,
                            xi=args.xi, rho=args.rho,
                            lam=args.jump_intensity,
                            jump_mean=args.jump_mean,
                            jump_std=args.jump_std, dt=dt)
    elif args.process in ("rbergomi", "hybrid"):
        proc = None  # dedicated branches below (own simulators/discounting)
    else:
        raise SystemExit(f"unknown process {args.process!r}")
    if args.process == "hybrid":
        # Equity x Vasicek hybrid, EXACT joint transition (zero
        # discretization error) with pathwise discounting — the closed
        # form prints alongside (processes/hybrid.py).
        from montecarlo_tpu.processes import (EquityVasicekHybrid,
                                              hybrid_call_closed_form,
                                              hybrid_price_mc)

        if args.american or args.payoff not in ("call", "put"):
            raise SystemExit("--process hybrid prices European call/put")
        if args.sampler != "plain":
            raise SystemExit("--process hybrid uses plain draws; remove "
                             "--sampler")
        hyb = EquityVasicekHybrid.create(
            args.s0, args.rate, args.kappa, args.theta, args.sigma_r,
            args.sigma, args.rho, dt)
        pay = ((lambda s: jnp.maximum(s - args.strike, 0.0))
               if args.payoff == "call"
               else (lambda s: jnp.maximum(args.strike - s, 0.0)))
        est = hybrid_price_mc(hyb, pay, args.paths, args.steps,
                              seed=args.seed)
        out = {"price": float(est["price"]),
               "std_err": float(est["std_err"]),
               "n_paths": int(est["n_paths"])}
        if args.payoff == "call":
            out["closed_form"] = hybrid_call_closed_form(
                args.s0, args.strike, args.maturity, args.rate,
                args.kappa, args.theta, args.sigma_r, args.sigma,
                args.rho)
        print(json.dumps(out))
        return 0
    if args.process == "rbergomi":
        from montecarlo_tpu.processes import RoughBergomi, rbergomi_simulate

        if args.american or args.payoff not in ("call", "put"):
            raise SystemExit("--process rbergomi prices European call/put")
        if args.sampler != "plain":
            raise SystemExit("--process rbergomi uses its own "
                             "exact-covariance sampler; --sampler has no "
                             "effect there (remove it)")
        # forward-measure dynamics (driftless); discount by --rate
        model = RoughBergomi.create(
            s0=args.s0, xi0=args.v0, eta=args.eta, rho=args.rho,
            h=args.hurst, n_steps=args.steps, T=args.maturity)
        s_t = rbergomi_simulate(model, args.paths, seed=args.seed)
        payoffs = (european_call(s_t, args.strike) if args.payoff == "call"
                   else jnp.maximum(args.strike - s_t, 0.0))
        est = mc_estimate(payoffs, discount_factor(args.rate,
                                                   args.maturity))
        print(json.dumps({"price": float(est["price"]),
                          "std_err": float(est["std_err"]),
                          "n_paths": int(est["n_paths"]),
                          "hurst": args.hurst}))
        return 0

    if args.mlmc:
        from montecarlo_tpu.engine.mlmc import mlmc_estimate
        from montecarlo_tpu.processes import EulerGBM

        if args.american or args.payoff not in ("call", "put"):
            raise SystemExit("--mlmc supports European call/put payoffs")
        if args.sampler != "plain":
            raise SystemExit("--mlmc uses its own coupled plain draws; "
                             "--sampler has no effect there (remove it)")
        if args.process == "gbm":
            def make(n):
                return EulerGBM.create(args.s0, args.rate, args.sigma,
                                       args.maturity / n)
        elif args.process == "heston":
            def make(n):
                return Heston.create(s0=args.s0, v0=args.v0, mu=args.rate,
                                     kappa=args.kappa, theta=args.theta,
                                     xi=args.xi, rho=args.rho,
                                     dt=args.maturity / n)
        else:
            raise SystemExit("--mlmc supports gbm (Euler scheme) and heston")
        payoff = ((lambda s: jnp.maximum(s - args.strike, 0.0))
                  if args.payoff == "call"
                  else (lambda s: jnp.maximum(args.strike - s, 0.0)))
        res = mlmc_estimate(make, payoff, target_rmse=args.mlmc_rmse,
                            seed=args.seed, n0_steps=4,
                            discount=float(discount_factor(args.rate,
                                                           args.maturity)))
        out = {"price": float(res["price"]),
               "std_err": float(res["std_err"]),
               "bias_est": float(res["bias_est"]),
               "rmse_est": float(res["rmse_est"]),
               "n_levels": res["n_levels"],
               "level_paths": [l.n_paths for l in res["levels"]],
               "cost_path_steps": res["cost_path_steps"],
               "vs_single_level_cost": res["single_level_cost_est"]
               / max(res["cost_path_steps"], 1.0)}
        if args.process == "gbm" and args.payoff == "call":
            out["black_scholes"] = float(black_scholes_call(
                args.s0, args.strike, args.rate, args.sigma, args.maturity))
        print(json.dumps(out))
        return 0

    if (args.sampler.startswith("sobol")
            and args.process in ("merton", "kou", "bates", "nig", "vg")):
        raise SystemExit(
            f"--sampler {args.sampler} substitutes normals for every draw, "
            f"but {args.process} consumes non-normal uniforms (jump counts "
            "/ subordinator inversions) — use plain or antithetic sampling")
    if args.sampler == "plain":
        sampler = PlainSampler()
    elif args.sampler == "antithetic":
        sampler = AntitheticSampler()
    elif args.sampler == "sobol-bridge":
        # Device-native randomized Sobol with Brownian-bridge ordering —
        # O(log T) on-the-fly dimension evaluations per step, no
        # (paths, steps) draw array (pod-scale QMC).
        from montecarlo_tpu.rng import SobolBridgeKernelSampler

        if proc.n_draws != 1:
            raise SystemExit("--sampler sobol-bridge requires a single-draw "
                             "process (gbm)")
        sampler = SobolBridgeKernelSampler.create(args.steps)
    elif args.sampler == "sobol-device":
        # Device-native randomized Sobol: no (paths, steps) draw array, and
        # on TPU the draws run *inside* the fused Pallas kernel.
        from montecarlo_tpu.rng import SobolDeviceSampler

        sampler = SobolDeviceSampler.create(args.steps, proc.n_draws)
    else:
        sampler = SobolSampler.create(args.paths, args.steps,
                                      proc.n_draws, seed=args.seed)

    disc = discount_factor(args.rate, args.maturity)
    if args.payoff == "max-call":
        # Best-of-A call (the Bermudan max-call benchmark family,
        # Andersen-Broadie 2004): symmetric assets, common correlation.
        import numpy as _np

        from montecarlo_tpu.engine import max_call, simulate
        from montecarlo_tpu.processes import MultiGBM

        if args.process != "gbm":
            raise SystemExit("--payoff max-call prices symmetric "
                             "multi-asset GBM (--process gbm)")
        if args.sampler != "plain":
            raise SystemExit("--payoff max-call uses plain Threefry "
                             "draws; --sampler has no effect there")
        a = args.n_assets
        corr = _np.full((a, a), args.asset_corr)
        _np.fill_diagonal(corr, 1.0)
        proc_m = MultiGBM.create(s0=[args.s0] * a,
                                 mu=[args.rate - args.div] * a,
                                 sigma=[args.sigma] * a, corr=corr, dt=dt)
        payoff_m = lambda p: max_call(p, args.strike)
        if args.american:
            from montecarlo_tpu.engine import (
                andersen_broadie_bound_multi, lsm_policy_multi)

            est, policy = lsm_policy_multi(
                proc_m, payoff_m, args.paths, args.steps, seed=args.seed,
                rate=args.rate, dt=dt, degree=3, value_degree=3,
                fit_value=args.american_bound)
            out = {"price": float(est["price"]),
                   "std_err": float(est["std_err"]),
                   "n_paths": int(est["n_paths"]), "n_assets": a}
            if args.american_bound:
                ab = andersen_broadie_bound_multi(
                    proc_m, payoff_m, policy, min(args.paths, 4096), 256,
                    args.steps, seed=args.seed + 1, rate=args.rate, dt=dt,
                    degree=3, value_degree=3)
                out["upper_bound"] = float(ab["upper"])
                out["upper_bound_std_err"] = float(ab["std_err"])
        else:
            terminal = simulate(proc_m, args.paths, args.steps,
                                seed=args.seed)
            est = mc_estimate(payoff_m(terminal), disc)
            out = {"price": float(est["price"]),
                   "std_err": float(est["std_err"]),
                   "n_paths": int(est["n_paths"]), "n_assets": a}
        print(json.dumps(out))
        return 0
    if args.american:
        from montecarlo_tpu.engine.american import (
            andersen_broadie_bound, lsm_policy)

        if args.sampler != "plain":
            raise SystemExit("--american uses plain Threefry draws; "
                             "--sampler has no effect there (remove it)")
        if args.payoff == "asian":
            # American average-price option: LSM on the joint (spot,
            # running average) state (Longstaff-Schwartz 2001 sec. 5).
            from montecarlo_tpu.engine import (ARITH_MEAN,
                                               lsm_price_path_dependent)

            if args.american_bound:
                raise SystemExit("--american-bound covers call/put only")
            est = lsm_price_path_dependent(
                proc, lambda s, a: jnp.maximum(a - args.strike, 0.0),
                ARITH_MEAN, args.paths, args.steps, seed=args.seed,
                rate=args.rate, dt=dt, degree=2)
            out = {"price": float(est["price"]),
                   "std_err": float(est["std_err"]),
                   "n_paths": int(est["n_paths"])}
            print(json.dumps(out))
            return 0
        if args.payoff not in ("call", "put"):
            raise SystemExit(
                f"--american supports call/put exercise (or asian via the "
                f"path-dependent LSM), not {args.payoff!r}")
        payoff = ((lambda s: jnp.maximum(s - args.strike, 0.0))
                  if args.payoff == "call"
                  else (lambda s: jnp.maximum(args.strike - s, 0.0)))
        if args.process in ("heston", "bates", "slv"):
            # Stochastic vol: regress the continuation on (S, v) jointly —
            # the spot-only policy cannot see the vol state and prices
            # strictly worse (engine/american.py::lsm_policy_sv).
            from montecarlo_tpu.engine.american import (
                andersen_broadie_bound_sv, lsm_policy_sv)

            est, policy = lsm_policy_sv(
                proc, payoff, args.paths, args.steps, seed=args.seed,
                rate=args.rate, dt=dt, degree=2, value_degree=5)
            if args.american_bound:
                ab = andersen_broadie_bound_sv(
                    proc, payoff, policy, min(args.paths, 2048), 256,
                    args.steps, seed=args.seed + 1, rate=args.rate, dt=dt,
                    degree=2, value_degree=5)
                est = dict(est)
                est["upper_bound"] = ab["upper"]
                est["upper_bound_std_err"] = ab["std_err"]
        else:
            est, policy = lsm_policy(proc, payoff, args.paths, args.steps,
                                     seed=args.seed, rate=args.rate, dt=dt,
                                     degree=3)
            if args.american_bound:
                ab = andersen_broadie_bound(
                    proc, payoff, policy, min(args.paths, 4096), 512,
                    args.steps, seed=args.seed + 1, rate=args.rate, dt=dt,
                    degree=3)
                est = dict(est)
                est["upper_bound"] = ab["upper"]
                est["upper_bound_std_err"] = ab["std_err"]
    elif args.payoff in ("asian", "lookback", "up-and-out", "up-and-in"):
        from montecarlo_tpu.engine import (
            ARITH_MEAN,
            RUNNING_MAX,
            RUNNING_MIN,
            asian_call,
            lookback_call_floating,
            simulate_functionals,
            up_and_out_call,
        )

        # Only the functionals the payoff actually reads (extra running
        # reductions are per-step work in the hot loop).
        if args.payoff == "asian":
            functionals = {"avg": ARITH_MEAN}
        elif args.payoff == "lookback":
            functionals = {"min": RUNNING_MIN}
        elif args.bridge:
            functionals = {}
        else:
            functionals = {"max": RUNNING_MAX}
        barrier = args.barrier or 1.2 * args.strike
        if args.payoff in ("up-and-out", "up-and-in") and args.bridge:
            if args.process != "gbm":
                raise SystemExit("--bridge requires --process gbm "
                                 "(constant vol for the bridge law)")
            from montecarlo_tpu.engine import barrier_survival_up

            functionals["surv"] = barrier_survival_up(barrier, args.sigma,
                                                      dt)
        if args.payoff == "asian":
            payoff_of = lambda o: asian_call(o["avg"], args.strike)
        elif args.payoff == "lookback":
            payoff_of = lambda o: lookback_call_floating(o["terminal"],
                                                         o["min"])
        elif args.bridge:
            # Knock-out and knock-in from the SAME survival probability
            # (in-out parity: KO + KI = vanilla, continuous barrier).
            def payoff_of(o):
                w = (o["surv"] if args.payoff == "up-and-out"
                     else 1.0 - o["surv"])
                return european_call(o["terminal"], args.strike) * w
        elif args.payoff == "up-and-in":
            payoff_of = lambda o: jnp.where(
                o["max"] >= barrier,
                european_call(o["terminal"], args.strike), 0.0)
        else:
            payoff_of = lambda o: up_and_out_call(
                o["terminal"], o["max"], args.strike, barrier)
        if args.sampler.startswith("sobol"):
            # Honest QMC error bars for path-dependent payoffs too: route
            # through replicated randomizations (the iid std_err the plain
            # path reports is meaningless for QMC — overstates ~30x).
            from montecarlo_tpu.engine import rqmc_estimate

            n_rep = 8
            paths = (args.paths // n_rep) * n_rep
            if paths < n_rep:
                raise SystemExit("QMC needs --paths >= 64 (8 replicated "
                                 "randomizations)")
            est = rqmc_estimate(
                proc, payoff_of, paths, args.steps, seed=args.seed,
                sampler_factory=_sobol_replicate_factory(args, proc,
                                                         paths // n_rep),
                n_replicates=n_rep, discount=disc, functionals=functionals)
        else:
            out_f = simulate_functionals(
                proc, args.paths, args.steps, seed=args.seed,
                sampler=sampler, functionals=functionals)
            est = mc_estimate(payoff_of(out_f), disc)
    else:
        # Vanilla terminal payoffs: call / put / digital.
        if args.payoff == "call":
            payoff = lambda s: european_call(s, args.strike)
        elif args.payoff == "put":
            payoff = lambda s: jnp.maximum(args.strike - s, 0.0)
        else:  # digital: cash-or-nothing call, pays 1 when S_T > K
            payoff = lambda s: (s > args.strike).astype(jnp.float32)
        if args.target_se is not None:
            # Adaptive tolerance pricing: one jitted on-device while_loop,
            # one host round-trip (per-iteration host orchestration costs
            # ~0.25 s/dispatch through the TPU relay — DEVNOTES).
            import jax as _jax

            on_tpu = _jax.devices()[0].platform not in ("cpu",)
            if args.sampler == "plain":
                from montecarlo_tpu.engine import price_to_tolerance

                est = price_to_tolerance(
                    proc, payoff, target_std_err=args.target_se,
                    seed=args.seed, n_steps=args.steps, discount=float(disc),
                    chunk_paths=(1 << 22) if on_tpu else (1 << 16))
            elif args.sampler == "sobol-device":
                from montecarlo_tpu.engine import price_to_tolerance_rqmc

                est = price_to_tolerance_rqmc(
                    proc, payoff, target_std_err=args.target_se,
                    seed=args.seed, n_steps=args.steps, discount=float(disc),
                    chunk_paths=(1 << 18) if on_tpu else (1 << 12))
            else:
                raise SystemExit(
                    "--target-se supports --sampler plain (iid chunked "
                    "loop) or sobol-device (replicated-randomization RQMC "
                    "loop)")
        elif args.sampler.startswith("sobol"):
            # Honest QMC error bars for EVERY Sobol variant: the iid
            # formula is meaningless for QMC (overstates ~30x); replicate
            # the randomization instead (rqmc_estimate).
            from montecarlo_tpu.engine import rqmc_estimate

            n_rep = 8
            paths = (args.paths // n_rep) * n_rep
            if paths < n_rep:
                raise SystemExit("QMC needs --paths >= 64 (8 replicated "
                                 "randomizations)")
            factory = _sobol_replicate_factory(args, proc, paths // n_rep)
            est = rqmc_estimate(
                proc, payoff, paths, args.steps, seed=args.seed,
                sampler_factory=factory, n_replicates=n_rep, discount=disc)
        else:
            from montecarlo_tpu.engine.dispatch import terminal_prices

            terminal = terminal_prices(proc, args.paths, args.steps,
                                       seed=args.seed, sampler=sampler)
            est = mc_estimate(payoff(terminal), disc)

    out = {"price": float(est["price"]), "std_err": float(est["std_err"]),
           "n_paths": int(est["n_paths"])}
    if "upper_bound" in est:
        out["upper_bound"] = float(est["upper_bound"])
        out["upper_bound_std_err"] = float(est["upper_bound_std_err"])
    if args.process == "gbm" and args.payoff == "call" and not args.american:
        out["black_scholes"] = float(black_scholes_call(
            args.s0, args.strike, args.rate, args.sigma, args.maturity))
    if (args.process == "gbm" and args.payoff == "digital"
            and not args.american):
        import numpy as _np
        from scipy.stats import norm as _norm

        d2 = ((_np.log(args.s0 / args.strike)
               + (args.rate - 0.5 * args.sigma**2) * args.maturity)
              / (args.sigma * _np.sqrt(args.maturity)))
        out["black_scholes"] = float(disc * _norm.cdf(d2))
    if args.process == "kou" and args.payoff == "call" and not args.american:
        import jax
        import math as _math

        from montecarlo_tpu.engine.cf_pricing import cf_call_price, kou_log_cf

        with jax.default_device(jax.devices("cpu")[0]):
            cf = float(cf_call_price(
                kou_log_cf(args.s0, args.rate, args.sigma,
                           args.jump_intensity, args.p_up, args.eta1,
                           args.eta2, args.maturity),
                args.s0, args.strike, args.maturity, args.rate))
        if _math.isfinite(cf):
            out["cf_price"] = cf
    if args.process == "nig" and args.payoff == "call" and not args.american:
        import jax
        import math as _math

        from montecarlo_tpu.engine.cf_pricing import cf_call_price, nig_log_cf

        with jax.default_device(jax.devices("cpu")[0]):
            cf = float(cf_call_price(
                nig_log_cf(args.s0, args.rate, args.nig_alpha,
                           args.nig_beta, args.nig_delta, args.maturity),
                args.s0, args.strike, args.maturity, args.rate))
        if _math.isfinite(cf):
            out["cf_price"] = cf
    if args.process == "vg" and args.payoff == "call" and not args.american:
        import jax
        import math as _math

        from montecarlo_tpu.engine.cf_pricing import cf_call_price, vg_log_cf

        with jax.default_device(jax.devices("cpu")[0]):
            cf = float(cf_call_price(
                vg_log_cf(args.s0, args.rate, args.sigma, args.vg_theta,
                          args.vg_nu, args.maturity),
                args.s0, args.strike, args.maturity, args.rate))
        if _math.isfinite(cf):
            out["cf_price"] = cf
    if (args.process == "bates" and args.payoff == "call"
            and not args.american):
        import jax
        import math as _math

        from montecarlo_tpu.engine.cf_pricing import cf_call_price
        from montecarlo_tpu.processes import bates_log_cf

        # The complex trap-form CF NaNs in complex64 on the TPU backend;
        # this scalar oracle runs on the CPU backend instead.
        with jax.default_device(jax.devices("cpu")[0]):
            cf = float(cf_call_price(
                bates_log_cf(args.s0, args.rate, v0=args.v0,
                             kappa=args.kappa, theta=args.theta,
                             xi=args.xi, rho=args.rho,
                             lam=args.jump_intensity,
                             jump_mean=args.jump_mean,
                             jump_std=args.jump_std, T=args.maturity),
                args.s0, args.strike, args.maturity, args.rate))
        if _math.isfinite(cf):
            out["cf_price"] = cf
    print(json.dumps(out))
    return 0


def _add_greeks(sub):
    p = sub.add_parser("greeks", help="option sensitivities")
    p.add_argument("--process", default="gbm", choices=["gbm", "heston"])
    p.add_argument("--s0", type=float, default=100.0)
    p.add_argument("--strike", type=float, default=105.0)
    p.add_argument("--rate", type=float, default=0.03)
    p.add_argument("--sigma", type=float, default=0.2)
    p.add_argument("--maturity", type=float, default=1.0)
    p.add_argument("--paths", type=int, default=200_000)
    p.add_argument("--steps", type=int, default=252)
    p.add_argument("--payoff", default="call", choices=["call", "put",
                                                        "digital"])
    p.add_argument("--method", default="pathwise",
                   choices=["pathwise", "lr", "second-order"],
                   help="pathwise autodiff (Lipschitz payoffs), "
                        "likelihood-ratio (any payoff, GBM only), or "
                        "second-order (gamma/vanna/volga via double "
                        "autodiff of a kernel-smoothed payoff)")
    p.add_argument("--smooth-width", type=float, default=2.0,
                   help="payoff smoothing width for --method second-order "
                        "(price units; bias O(w^2), gamma noise O(1/w))")
    p.add_argument("--american", action="store_true",
                   help="American-exercise Greeks by policy freezing: LSM "
                        "fits the exercise rule, then pathwise-"
                        "differentiates the frozen stopped value "
                        "(envelope theorem; call/put, pathwise method)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mesh", type=int, default=0, metavar="N",
                   help="pod-scale pathwise Greeks: shard over an N-device "
                        "paths mesh (sharded_price_and_greeks — bitwise "
                        "mesh-shape-invariant price, grads, and error "
                        "bars); pathwise method only")
    # Heston extras
    p.add_argument("--v0", type=float, default=0.04)
    p.add_argument("--kappa", type=float, default=2.0)
    p.add_argument("--theta", type=float, default=0.04)
    p.add_argument("--xi", type=float, default=0.5)
    p.add_argument("--rho", type=float, default=-0.7)


def cmd_greeks(args) -> int:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from montecarlo_tpu.engine.greeks import lr_greeks_gbm, price_and_greeks
    from montecarlo_tpu.processes import GBM, Heston

    if getattr(args, "mesh", 0) and (args.method != "pathwise"
                                     or args.american):
        # Reject rather than silently ignore (round-2 contract: flags that
        # would not apply must error).
        raise SystemExit("--mesh applies to the pathwise method only "
                         "(not --method lr/second-order, not --american)")

    dt = args.maturity / args.steps
    disc = float(np.exp(-args.rate * args.maturity))
    if args.payoff == "call":
        payoff = lambda s: jnp.maximum(s - args.strike, 0.0)
    elif args.payoff == "put":
        payoff = lambda s: jnp.maximum(args.strike - s, 0.0)
    else:
        payoff = lambda s: (s > args.strike).astype(jnp.float32)

    if args.process == "gbm":
        proc = GBM.create(s0=args.s0, mu=args.rate, sigma=args.sigma, dt=dt)
    else:
        proc = Heston.create(s0=args.s0, v0=args.v0, mu=args.rate,
                             kappa=args.kappa, theta=args.theta,
                             xi=args.xi, rho=args.rho, dt=dt)

    if args.american:
        from montecarlo_tpu.engine.american import (
            american_price_and_greeks, lsm_exercise_policy)

        if args.method != "pathwise" or args.payoff == "digital":
            raise SystemExit("--american greeks use the pathwise method "
                             "on call/put payoffs")
        policy = lsm_exercise_policy(
            proc, payoff, args.paths, args.steps, seed=args.seed,
            rate=args.rate, dt=dt, degree=3)
        price, g = american_price_and_greeks(
            proc, payoff, policy, args.paths, args.steps, seed=args.seed,
            rate=args.rate, dt=dt, degree=3)
        out = {"price": float(price), "delta": float(g.s0)}
        if args.process == "gbm":
            out["vega"] = float(g.sigma)
            out["drift_sens"] = float(g.mu)
        else:
            out["vega_v0"] = float(g.v0)
            out["xi_sens"] = float(g.xi)
        print(json.dumps(out))
        return 0

    if args.method == "lr":
        if args.process != "gbm":
            print("likelihood-ratio greeks support GBM only",
                  file=sys.stderr)
            return 2
        out = lr_greeks_gbm(proc, payoff, args.paths, args.steps,
                            seed=args.seed, discount=disc)
        print(json.dumps({k: float(v) for k, v in out.items()}))
        return 0

    if args.method == "second-order":
        from montecarlo_tpu.engine.greeks import (second_order_greeks,
                                                  smoothed_call)

        if args.payoff != "call":
            print("second-order greeks use the smoothed call payoff",
                  file=sys.stderr)
            return 2
        sfields = ("s0", "sigma") if args.process == "gbm" else ("s0", "v0")
        price, grad, hess = second_order_greeks(
            proc, smoothed_call(args.strike, args.smooth_width),
            args.paths, args.steps, seed=args.seed, fields=sfields,
            discount=disc)
        out = {"price": float(price),
               "delta": float(grad[0]),
               f"vega_{sfields[1]}": float(grad[1]),
               "gamma": float(hess[0, 0]),
               "vanna": float(hess[0, 1]),
               "volga": float(hess[1, 1])}
        print(json.dumps(out))
        return 0

    if args.payoff == "digital":
        print("note: pathwise gradients of a hard digital are ~0; use "
              "--method lr or a smoothed payoff", file=sys.stderr)
    if getattr(args, "mesh", 0):
        from montecarlo_tpu.parallel import (DEFAULT_BLOCK, make_mesh,
                                             sharded_price_and_greeks)

        n_dev = len(jax.devices())
        if args.mesh > n_dev:
            raise SystemExit(
                f"--mesh {args.mesh}: only {n_dev} device(s) available "
                "(multi-chip sharding is validated on virtual CPU meshes "
                "in the test suite)")
        unit = args.mesh * DEFAULT_BLOCK
        n_paths = -(-args.paths // unit) * unit
        if n_paths != args.paths:
            print(f"note: paths rounded up to {n_paths} "
                  f"(mesh x {DEFAULT_BLOCK}-path stat blocks)",
                  file=sys.stderr)
        res = sharded_price_and_greeks(
            proc, payoff, n_paths, args.steps, seed=args.seed,
            mesh=make_mesh(args.mesh), discount=disc)
        out = {"price": float(res["price"]),
               "std_err": float(res["std_err"]),
               "n_paths": int(res["n_paths"]), "mesh": args.mesh}
        out.update({f"d_{k}": float(v)
                    for k, v in res["grads"]._asdict().items()})
        out.update({f"d_{k}_std_err": float(v)
                    for k, v in res["grad_std_err"]._asdict().items()})
        print(json.dumps(out))
        return 0
    price, grads = price_and_greeks(proc, payoff, args.paths, args.steps,
                                    seed=args.seed, discount=disc)
    out = {"price": float(price)}
    out.update({f"d_{k}": float(v)
                for k, v in grads._asdict().items()})
    print(json.dumps(out))
    return 0


def _add_var(sub):
    p = sub.add_parser("var", help="portfolio VaR/CVaR at scale")
    p.add_argument("--paths", type=int, default=1 << 22)
    p.add_argument("--days", type=int, default=20)
    p.add_argument("--s0", type=float, default=100.0)
    p.add_argument("--mu", type=float, default=0.05)
    p.add_argument("--sigma", type=float, default=0.25)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bins", type=int, default=8192)
    p.add_argument("--chunk", type=int, default=None)
    p.add_argument("--checkpoint", default=None,
                   help="npz path for resume-able runs")
    p.add_argument("--on-device", action="store_true",
                   help="single device program (fastest; no checkpointing)")
    p.add_argument("--ticker", default=None,
                   help="use a ticker's GARCH-bootstrap process instead of "
                        "parametric GBM")
    p.add_argument("--period", default="5y")
    p.add_argument("--provider", default=None)


def cmd_var(args) -> int:
    import numpy as np
    from montecarlo_tpu.api import portfolio_var
    from montecarlo_tpu.processes import GBM, GARCHBootstrap

    if args.ticker:
        from montecarlo_tpu.data import get_stock_data

        data = get_stock_data(args.ticker, args.period,
                              provider=args.provider)
        if data is None:
            print(f"no data for {args.ticker}", file=sys.stderr)
            return 1
        s0 = float(data["Close"][-1])
        returns = np.asarray(data["log_ret"])
        proc = GARCHBootstrap.create(
            returns[~np.isnan(returns)], s0=s0,
            var0=float(data["rvol_20"][-1]) ** 2 / 252.0)
    else:
        s0 = args.s0
        proc = GBM.create(s0=s0, mu=args.mu, sigma=args.sigma, dt=1 / 252)

    if args.on_device:
        from montecarlo_tpu.api import portfolio_var_on_device

        out = portfolio_var_on_device(
            proc, args.paths, args.days, s0, seed=args.seed,
            bins=args.bins,
            chunk_paths=args.chunk or min(args.paths, 1 << 20))
    else:
        out = portfolio_var(
            proc, args.paths, args.days, s0, seed=args.seed, bins=args.bins,
            chunk_paths=args.chunk or min(args.paths, 1 << 20),
            checkpoint_path=args.checkpoint,
            progress_callback=lambda done, total, se: print(
                f"  {done:,}/{total:,} paths, std-err {se:.2e}",
                file=sys.stderr))
    print(json.dumps(out, default=float))
    return 0


def _add_stress(sub):
    p = sub.add_parser("stress", help="scenario grid / named stress P&L")
    p.add_argument("--process", default="gbm", choices=["gbm", "heston"])
    p.add_argument("--s0", type=float, default=100.0)
    p.add_argument("--strike", type=float, default=105.0)
    p.add_argument("--rate", type=float, default=0.03)
    p.add_argument("--sigma", type=float, default=0.2)
    p.add_argument("--maturity", type=float, default=1.0)
    p.add_argument("--paths", type=int, default=65536)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--payoff", default="call", choices=["call", "put"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--spot-range", type=float, default=0.2,
                   help="grid spans +-this relative spot bump")
    p.add_argument("--vol-range", type=float, default=0.5,
                   help="grid spans +-this relative vol bump")
    p.add_argument("--grid", type=int, default=5,
                   help="points per axis (0 = named scenarios only)")
    # Heston extras
    p.add_argument("--v0", type=float, default=0.04)
    p.add_argument("--kappa", type=float, default=2.0)
    p.add_argument("--theta", type=float, default=0.04)
    p.add_argument("--xi", type=float, default=0.5)
    p.add_argument("--rho", type=float, default=-0.7)


def cmd_stress(args) -> int:
    import numpy as np
    import jax.numpy as jnp

    from montecarlo_tpu.api.stress import ladder, stress_grid, stress_report
    from montecarlo_tpu.processes import GBM, Heston

    dt = args.maturity / args.steps
    disc = float(np.exp(-args.rate * args.maturity))
    payoff = ((lambda s: jnp.maximum(s - args.strike, 0.0))
              if args.payoff == "call"
              else (lambda s: jnp.maximum(args.strike - s, 0.0)))
    if args.process == "gbm":
        proc = GBM.create(s0=args.s0, mu=args.rate, sigma=args.sigma, dt=dt)
        fields = ("s0", "sigma")
    else:
        proc = Heston.create(s0=args.s0, v0=args.v0, mu=args.rate,
                             kappa=args.kappa, theta=args.theta,
                             xi=args.xi, rho=args.rho, dt=dt)
        fields = ("s0", "v0")

    out = stress_report(proc, payoff, args.paths, args.steps,
                        seed=args.seed, fields=fields, discount=disc)
    if args.grid > 0:
        ba = ladder(-args.spot_range, args.spot_range, args.grid)
        bb = ladder(-args.vol_range, args.vol_range, args.grid)
        g = stress_grid(proc, payoff, args.paths, args.steps,
                        bumps_a=ba, bumps_b=bb, seed=args.seed,
                        fields=fields, discount=disc)
        out["grid"] = {
            "spot_bumps": [float(v) for v in np.asarray(g["bumps_a"])],
            "vol_bumps": [float(v) for v in np.asarray(g["bumps_b"])],
            "prices": np.asarray(g["prices"]).round(6).tolist(),
            "pnl": np.asarray(g["pnl"]).round(6).tolist(),
        }
    print(json.dumps(out))
    return 0


def _add_calibrate(sub):
    p = sub.add_parser("calibrate",
                       help="fit Heston/SABR/VG/NIG/Merton/Kou to an "
                            "implied-vol surface")
    p.add_argument("--model", default="heston",
                   choices=["heston", "sabr", "vg", "nig", "merton",
                            "kou"])
    p.add_argument("--surface", default=None,
                   help="CSV with header strike,maturity,iv (long form); "
                        "omit for --demo behavior")
    p.add_argument("--s0", type=float, default=100.0,
                   help="spot (heston) / forward (sabr)")
    p.add_argument("--rate", type=float, default=0.03)
    p.add_argument("--beta", type=float, default=0.7,
                   help="SABR beta (fixed by convention)")
    p.add_argument("--maturity", type=float, default=1.0,
                   help="SABR smile maturity (single-expiry fit)")
    p.add_argument("--iters", type=int, default=800)


def cmd_calibrate(args) -> int:
    import numpy as np

    if args.surface:
        rows = np.genfromtxt(args.surface, delimiter=",", names=True)
        strikes = np.atleast_1d(rows["strike"]).astype(np.float64)
        mats = np.atleast_1d(rows["maturity"]).astype(np.float64)
        ivs = np.atleast_1d(rows["iv"]).astype(np.float64)
        demo = None
    else:
        # Demo: generate a surface from known parameters and recover them.
        import jax.numpy as jnp

        if args.model == "heston":
            from montecarlo_tpu.engine.heston_analytic import (HestonParams,
                                                               heston_call_cf)
            from montecarlo_tpu.engine.implied_vol import implied_vol_call

            demo = dict(v0=0.04, kappa=2.0, theta=0.04, xi=0.5, rho=-0.7)
            ks = np.array([80., 90., 100., 110., 120.] * 3)
            mats = np.repeat([0.25, 0.5, 1.0], 5)
            prices = heston_call_cf(
                args.s0, jnp.asarray(ks), jnp.asarray(mats), args.rate,
                HestonParams(**{k: jnp.asarray(v)
                                for k, v in demo.items()}))
            ivs = np.asarray(implied_vol_call(
                prices, args.s0, jnp.asarray(ks), args.rate,
                jnp.asarray(mats)))
            strikes = ks
        elif args.model in ("vg", "nig", "merton", "kou"):
            from montecarlo_tpu.engine.cf_pricing import (cf_call_price,
                                                          kou_log_cf,
                                                          merton_log_cf,
                                                          nig_log_cf,
                                                          vg_log_cf)
            from montecarlo_tpu.engine.implied_vol import implied_vol_call

            strikes = np.array([80., 90., 100., 110., 120.] * 3)
            mats = np.repeat([0.25, 0.5, 1.0], 5)
            demo_cfg = {
                "vg": (vg_log_cf, dict(sigma=0.18, theta=-0.12, nu=0.25)),
                "nig": (nig_log_cf, dict(alpha=12.0, beta=-4.0,
                                         delta=0.4)),
                "merton": (merton_log_cf, dict(sigma=0.15, lam=0.8,
                                               jump_mean=-0.08,
                                               jump_std=0.12)),
                "kou": (kou_log_cf, dict(sigma=0.15, lam=1.0, p_up=0.35,
                                         eta1=9.0, eta2=4.0)),
            }
            cf_fn, demo = demo_cfg[args.model]
            phi = cf_fn(args.s0, args.rate, *demo.values(),
                        jnp.asarray(mats))
            prices = cf_call_price(phi, args.s0, jnp.asarray(strikes),
                                   jnp.asarray(mats), args.rate)
            ivs = np.asarray(implied_vol_call(
                prices, args.s0, jnp.asarray(strikes), args.rate,
                jnp.asarray(mats)))
        else:
            from montecarlo_tpu.processes import sabr_hagan_iv

            # alpha in CEV units: 20%% lognormal ATM vol at f0.
            demo = dict(alpha=0.2 * args.s0 ** (1.0 - args.beta),
                        nu=0.35, rho=-0.4)
            strikes = np.linspace(0.8, 1.25, 10) * args.s0
            mats = np.full(10, args.maturity)
            ivs = np.asarray(sabr_hagan_iv(
                args.s0, jnp.asarray(strikes), args.maturity,
                demo["alpha"], args.beta, demo["nu"], demo["rho"]))

    if args.model == "heston":
        from montecarlo_tpu.engine.heston_analytic import (
            calibrate_heston_to_ivs)

        est = calibrate_heston_to_ivs(strikes, mats, ivs, s0=args.s0,
                                      r=args.rate, n_iters=args.iters)
        out = {k: round(float(v), 6) for k, v in est._asdict().items()}
    elif args.model in ("vg", "nig", "merton", "kou"):
        from montecarlo_tpu.engine.levy_calibration import (
            calibrate_levy_to_ivs)

        fit = calibrate_levy_to_ivs(args.model, strikes, mats, ivs,
                                    s0=args.s0, r=args.rate,
                                    n_iters=max(args.iters, 1500))
        out = {k: round(float(v), 6) for k, v in fit.items()}
    else:
        if not np.allclose(mats, mats[0]):
            raise SystemExit("SABR fits one expiry at a time; the surface "
                             "has mixed maturities")
        from montecarlo_tpu.processes import calibrate_sabr

        fit = calibrate_sabr(strikes, ivs, f0=args.s0, T=float(mats[0]),
                             beta=args.beta, n_iters=max(args.iters, 2000))
        out = {k: round(float(v), 6) for k, v in fit.items()}
    if demo is not None:
        out["demo_truth"] = demo
    print(json.dumps(out))
    return 0


def _add_bond(sub):
    p = sub.add_parser("bond", help="short-rate bond / bond-option pricing")
    p.add_argument("--model", default="vasicek",
                   choices=["vasicek", "cir", "hullwhite"])
    p.add_argument("--r0", type=float, default=0.03)
    p.add_argument("--kappa", type=float, default=0.8,
                   help="mean-reversion speed (a for hullwhite)")
    p.add_argument("--theta", type=float, default=0.05,
                   help="long-run level (vasicek/cir)")
    p.add_argument("--sigma", type=float, default=0.015)
    p.add_argument("--maturity", type=float, default=2.0, help="years")
    p.add_argument("--paths", type=int, default=1 << 16)
    p.add_argument("--steps", type=int, default=128)
    p.add_argument("--option", action="store_true",
                   help="European call on a bond: expiry --t1, bond "
                        "maturity --maturity (vasicek only)")
    p.add_argument("--t1", type=float, default=1.0)
    p.add_argument("--option-strike", type=float, default=None,
                   help="default: ATM forward bond price")
    p.add_argument("--fwd-slope", type=float, default=0.005,
                   help="hullwhite: slope of the synthetic forward curve")
    p.add_argument("--swaption", action="store_true",
                   help="Bermudan payer swaption by pathwise-discounted "
                        "LSM (vasicek; n_exercise=1 prints the Jamshidian "
                        "European closed form too)")
    p.add_argument("--swap-strike", type=float, default=None,
                   help="fixed rate (default: ~par)")
    p.add_argument("--periods", type=int, default=8,
                   help="swaption: quarterly payment count")
    p.add_argument("--n-exercise", type=int, default=4,
                   help="swaption: number of Bermudan exercise dates")
    p.add_argument("--seed", type=int, default=0)


def cmd_bond(args) -> int:
    import numpy as np

    from montecarlo_tpu.engine.rates import (
        bond_option_mc, cir_zcb, vasicek_bond_option, vasicek_zcb,
        zcb_price_mc)
    from montecarlo_tpu.processes import CIR, HullWhite, Vasicek

    T, n_steps = args.maturity, args.steps
    dt = T / n_steps
    if args.model == "vasicek":
        proc = Vasicek.create(args.r0, args.kappa, args.theta, args.sigma,
                              dt)
        cf = vasicek_zcb(args.r0, args.kappa, args.theta, args.sigma, T)
    elif args.model == "cir":
        proc = CIR.create(args.r0, args.kappa, args.theta, args.sigma, dt)
        cf = cir_zcb(args.r0, args.kappa, args.theta, args.sigma, T)
    else:
        t_grid = np.arange(n_steps + 1) * dt
        fwd = args.r0 + args.fwd_slope * t_grid
        proc = HullWhite.from_forward_curve(fwd, a=args.kappa,
                                            sigma=args.sigma, dt=dt)
        cf = float(np.exp(-np.trapezoid(fwd, t_grid)))

    if args.swaption:
        import jax.numpy as jnp

        from montecarlo_tpu.engine.bermudan import (
            bermudan_swaption_lsm, vasicek_swaption_jamshidian)
        from montecarlo_tpu.engine.rates import vasicek_zcb as _zcb

        if args.model != "vasicek":
            raise SystemExit("--swaption requires --model vasicek")
        delta, spp = 0.25, 16
        if args.swap_strike is None:
            # Forward par rate of the swap entered at the first reset t=delta
            # with payments at 2*delta..periods*delta:
            # K = (P(delta) - P(n*delta)) / (delta * sum P(i*delta), i>=2).
            # The annuity excludes P(delta) but the FLOAT leg starts there —
            # using P(2*delta) in the numerator understated K ~0.5pp.
            ps = [_zcb(args.r0, args.kappa, args.theta, args.sigma,
                       i * delta) for i in range(2, args.periods + 1)]
            p_start = _zcb(args.r0, args.kappa, args.theta, args.sigma,
                           delta)
            strike = (p_start - ps[-1]) / (delta * sum(ps)) if ps \
                else args.theta
        else:
            strike = args.swap_strike
        proc = Vasicek.create(args.r0, args.kappa, args.theta, args.sigma,
                              delta / spp, dtype=jnp.float64)
        res = bermudan_swaption_lsm(
            proc, strike, n_paths=args.paths, steps_per_period=spp,
            n_periods=args.periods, n_exercise=args.n_exercise,
            seed=args.seed)
        out = {"bermudan_swaption": float(res["price"]),
               "std_err": float(res["std_err"]),
               "strike": float(strike),
               "n_exercise": args.n_exercise}
        if args.n_exercise == 1:
            out["jamshidian_european"] = vasicek_swaption_jamshidian(
                (args.kappa, args.theta, args.sigma), strike, t0=delta,
                delta=delta, n_periods=args.periods - 1, r0=args.r0)
        print(json.dumps(out))
        return 0

    if args.option:
        if args.model != "vasicek":
            raise SystemExit("--option requires --model vasicek (affine "
                             "closed-form bond at expiry)")
        t1 = args.t1
        strike = args.option_strike or (
            vasicek_zcb(args.r0, args.kappa, args.theta, args.sigma, T)
            / vasicek_zcb(args.r0, args.kappa, args.theta, args.sigma, t1))
        proc = Vasicek.create(args.r0, args.kappa, args.theta, args.sigma,
                              t1 / n_steps)
        est = bond_option_mc(proc, t1, T, strike, n_steps, args.paths,
                             seed=args.seed)
        out = {"bond_option_price": float(est["price"]),
               "std_err": float(est["std_err"]),
               "strike": strike,
               "jamshidian": vasicek_bond_option(
                   args.r0, args.kappa, args.theta, args.sigma, t1, T,
                   strike)}
    else:
        est = zcb_price_mc(proc, T, n_steps, args.paths, seed=args.seed)
        out = {"zcb_price": float(est["price"]),
               "std_err": float(est["std_err"]),
               "closed_form": cf}
    print(json.dumps(out))
    return 0


def _add_xva(sub):
    p = sub.add_parser("xva", help="counterparty exposure profiles "
                                   "(EPE/ENE/PFE) and CVA/DVA/FVA/MVA for "
                                   "an interest-rate swap (Vasicek) or an "
                                   "equity forward (GBM)")
    p.add_argument("--underlying", default="rates",
                   choices=["rates", "equity"],
                   help="rates: Vasicek payer swap, pathwise discounting; "
                        "equity: GBM forward, flat discounting (CVA has a "
                        "Black-Scholes closed form, tested)")
    p.add_argument("--s0", type=float, default=100.0,
                   help="equity: spot")
    p.add_argument("--fwd-strike", type=float, default=None,
                   help="equity: forward strike (default: the par forward "
                        "s0*e^{rT})")
    p.add_argument("--equity-sigma", type=float, default=0.25,
                   help="equity: GBM volatility")
    p.add_argument("--r0", type=float, default=0.03)
    p.add_argument("--kappa", type=float, default=0.8)
    p.add_argument("--theta", type=float, default=0.05)
    p.add_argument("--sigma", type=float, default=0.015)
    p.add_argument("--maturity", type=float, default=5.0,
                   help="swap maturity, years")
    p.add_argument("--periods", type=int, default=10,
                   help="number of swap payments (semiannual default)")
    p.add_argument("--swap-strike", type=float, default=None,
                   help="fixed rate (default: the par-ish model yield)")
    p.add_argument("--paths", type=int, default=1 << 15)
    p.add_argument("--steps", type=int, default=100,
                   help="exposure grid resolution")
    p.add_argument("--hazard", type=float, default=0.02,
                   help="counterparty flat hazard rate (CVA)")
    p.add_argument("--recovery", type=float, default=0.4)
    p.add_argument("--own-hazard", type=float, default=0.01,
                   help="own flat hazard rate (DVA; 0 = unilateral)")
    p.add_argument("--own-recovery", type=float, default=0.4)
    p.add_argument("--funding-spread", type=float, default=0.005,
                   help="flat funding spread (FVA; 0 disables)")
    p.add_argument("--im-spread", type=float, default=0.0,
                   help="initial-margin funding spread (MVA; 0 disables)")
    p.add_argument("--mpor", type=float, default=10.0 / 252.0,
                   help="margin period of risk in years (MVA)")
    p.add_argument("--quantile", type=float, default=0.95,
                   help="PFE quantile")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--portfolio", action="store_true",
                   help="netting-set mode: a demo book of offsetting "
                        "trades (swaps on rates, forwards on equity) "
                        "netted against one counterparty, with CSA "
                        "variation margin (threshold/MTA/MPoR); reports "
                        "collateralized xVA plus the no-netting baseline")
    p.add_argument("--threshold", type=float, default=0.0,
                   help="portfolio: counterparty CSA threshold")
    p.add_argument("--own-threshold", type=float, default=0.0,
                   help="portfolio: own CSA threshold")
    p.add_argument("--mta", type=float, default=0.0,
                   help="portfolio: minimum transfer amount")
    p.add_argument("--no-csa", action="store_true",
                   help="portfolio: no collateral (netting only)")


def cmd_xva(args) -> int:
    import numpy as np

    from montecarlo_tpu.engine.exposure import (exposure_profile,
                                                swap_value_fn)
    from montecarlo_tpu.engine.rates import vasicek_zcb
    from montecarlo_tpu.processes import Vasicek

    import jax.numpy as jnp

    if args.portfolio:
        return _cmd_xva_portfolio(args)

    if args.underlying == "equity":
        from montecarlo_tpu.processes import GBM

        gbm = GBM.create(args.s0, args.r0, args.equity_sigma,
                         args.maturity / args.steps)
        k_fwd = args.fwd_strike or args.s0 * float(
            np.exp(args.r0 * args.maturity))
        t_mat = args.maturity
        vfn_eq = lambda s, t: s - k_fwd * jnp.exp(-args.r0 * (t_mat - t))
        prof = exposure_profile(
            gbm, vfn_eq, args.paths, args.steps, T=args.maturity,
            seed=args.seed, quantile=args.quantile,
            hazard_rate=args.hazard, recovery=args.recovery,
            own_hazard_rate=args.own_hazard,
            own_recovery=args.own_recovery,
            funding_spread=args.funding_spread, im_spread=args.im_spread,
            mpor=args.mpor, flat_rate=args.r0, dtype=jnp.float32)
        epe = np.asarray(prof["epe"])
        out = {"underlying": "equity", "fwd_strike": round(k_fwd, 4),
               "peak_epe": round(float(epe.max()), 6),
               "peak_pfe": round(float(np.asarray(prof["pfe"]).max()), 6),
               "peak_im": round(float(np.asarray(prof["im"]).max()), 6)}
        for k in ("cva", "dva", "bcva", "fca", "fba", "fva", "mva"):
            out[k] = round(float(prof[k]), 6)
        print(json.dumps(out))
        return 0

    pay_dt = args.maturity / args.periods
    payment_times = pay_dt * np.arange(1, args.periods + 1)
    model = Vasicek.create(args.r0, args.kappa, args.theta, args.sigma,
                           args.maturity / args.steps)
    if args.swap_strike is None:
        # Par rate of the spot-starting swap: (1 - P(T)) / (dt * sum P(ti)).
        ps = [vasicek_zcb(args.r0, args.kappa, args.theta, args.sigma, t)
              for t in payment_times]
        strike = (1.0 - ps[-1]) / (pay_dt * sum(ps))
    else:
        strike = args.swap_strike
    # f32 here: the engine defaults to f64 for the x64 test environment,
    # but the CLI runs without x64 — request f32 explicitly rather than
    # let JAX truncate with a warning per call site.
    value_fn = swap_value_fn(model, strike, payment_times, pay_dt,
                             dtype=jnp.float32)
    prof = exposure_profile(
        model, value_fn, args.paths, args.steps, T=args.maturity,
        seed=args.seed, quantile=args.quantile, hazard_rate=args.hazard,
        recovery=args.recovery, own_hazard_rate=args.own_hazard,
        own_recovery=args.own_recovery,
        funding_spread=args.funding_spread, im_spread=args.im_spread,
        mpor=args.mpor,
        fixing_times=payment_times - pay_dt, dtype=jnp.float32)
    epe = np.asarray(prof["epe"])
    out = {"strike": round(float(strike), 6),
           "peak_epe": round(float(epe.max()), 6),
           "peak_epe_time": round(float(np.asarray(prof["times"])
                                        [int(epe.argmax())]), 4),
           "peak_pfe": round(float(np.asarray(prof["pfe"]).max()), 6),
           "eepe": round(float(np.asarray(prof["eepe"])[-1]), 6)}
    out["peak_im"] = round(float(np.asarray(prof["im"]).max()), 6)
    for k in ("cva", "dva", "bcva", "fca", "fba", "fva", "mva"):
        out[k] = round(float(prof[k]), 6)
    print(json.dumps(out))
    return 0


def _cmd_xva_portfolio(args) -> int:
    """`xva --portfolio`: a netted, collateralized book on one simulation.

    Rates book (Vasicek): long payer par swap (full calendar), short 0.6x
    receiver-side on the front half, long 0.5x payer struck 10% over par.
    Equity book (GBM): long forward struck under par, short 0.6x over par,
    long 0.5x at par — same netting structure, flat discounting.
    """
    import numpy as np
    import jax.numpy as jnp

    from montecarlo_tpu.engine.exposure import (CSA, netting_set_profile,
                                                swap_value_fn)
    from montecarlo_tpu.engine.rates import vasicek_zcb
    from montecarlo_tpu.processes import GBM, Vasicek

    csa = None if args.no_csa else CSA(
        threshold=args.threshold, own_threshold=args.own_threshold,
        mta=args.mta, mpor=args.mpor)

    def scaled(fn, a):
        return lambda s, t: a * fn(s, t)

    if args.underlying == "equity":
        model = GBM.create(args.s0, args.r0, args.equity_sigma,
                           args.maturity / args.steps)
        k_par = args.s0 * float(np.exp(args.r0 * args.maturity))
        t_mat, r0 = args.maturity, args.r0

        def fwd(k):
            return lambda s, t: s - k * jnp.exp(-r0 * (t_mat - t))

        trades = (fwd(0.9 * k_par), scaled(fwd(1.05 * k_par), -0.6),
                  scaled(fwd(k_par), 0.5))
        flat_rate = args.r0
    else:
        model = Vasicek.create(args.r0, args.kappa, args.theta, args.sigma,
                               args.maturity / args.steps,
                               dtype=jnp.float32)
        pay_dt = args.maturity / args.periods
        times_full = pay_dt * np.arange(1, args.periods + 1)
        times_half = times_full[:max(args.periods // 2, 1)]

        def par(times):
            ps = [vasicek_zcb(args.r0, args.kappa, args.theta, args.sigma,
                              t) for t in times]
            return (1.0 - ps[-1]) / (pay_dt * sum(ps))

        k_full, k_half = par(times_full), par(times_half)
        trades = (
            swap_value_fn(model, k_full, times_full, pay_dt,
                          dtype=jnp.float32),
            scaled(swap_value_fn(model, k_half, times_half, pay_dt,
                                 dtype=jnp.float32), -0.6),
            scaled(swap_value_fn(model, 1.1 * k_full, times_full, pay_dt,
                                 dtype=jnp.float32), 0.5),
        )
        flat_rate = None

    prof = netting_set_profile(
        model, trades, args.paths, args.steps, T=args.maturity,
        seed=args.seed, csa=csa, quantile=args.quantile,
        hazard_rate=args.hazard, recovery=args.recovery,
        own_hazard_rate=args.own_hazard, own_recovery=args.own_recovery,
        funding_spread=args.funding_spread, flat_rate=flat_rate,
        dtype=jnp.float32)
    epe = np.asarray(prof["epe"])
    epe_u = np.asarray(prof["epe_uncollateralized"])
    out = {"underlying": args.underlying, "n_trades": len(trades),
           "csa": not args.no_csa,
           "peak_epe": round(float(epe.max()), 6),
           "peak_epe_uncollateralized": round(float(epe_u.max()), 6),
           "peak_pfe": round(float(np.asarray(prof["pfe"]).max()), 6)}
    for k in ("cva", "cva_no_netting", "dva", "bcva", "fca", "fba", "fva"):
        out[k] = round(float(prof[k]), 6)
    print(json.dumps(out))
    return 0


def _add_note(sub):
    p = sub.add_parser("note", help="structured notes: autocallable "
                                    "(Phoenix) and cliquet, single- or "
                                    "multi-asset (worst-of)")
    p.add_argument("--type", default="autocall",
                   choices=["autocall", "cliquet"])
    p.add_argument("--n-assets", type=int, default=1,
                   help="autocall: >1 prices the WORST-OF note")
    p.add_argument("--asset-corr", type=float, default=0.6,
                   help="common pairwise correlation (n-assets > 1)")
    p.add_argument("--s0", type=float, default=100.0)
    p.add_argument("--rate", type=float, default=0.03)
    p.add_argument("--div", type=float, default=0.0,
                   help="continuous dividend yield")
    p.add_argument("--sigma", type=float, default=0.2)
    p.add_argument("--maturity", type=float, default=1.0)
    p.add_argument("--observations", type=int, default=4,
                   help="autocall observations / cliquet resets per life")
    p.add_argument("--steps", type=int, default=252,
                   help="simulation steps (rounded to a multiple of "
                        "observations)")
    p.add_argument("--trigger", type=float, default=1.0,
                   help="autocall trigger as a fraction of s0")
    p.add_argument("--coupon", type=float, default=0.02,
                   help="autocall coupon per observation period")
    p.add_argument("--pdi-barrier", type=float, default=0.7,
                   help="down-and-in capital barrier as a fraction of s0")
    p.add_argument("--local-floor", type=float, default=-0.02,
                   help="cliquet per-period floor")
    p.add_argument("--local-cap", type=float, default=0.03,
                   help="cliquet per-period cap")
    p.add_argument("--global-floor", type=float, default=0.0,
                   help="cliquet floor on the summed leg")
    p.add_argument("--paths", type=int, default=1 << 17)
    p.add_argument("--seed", type=int, default=0)


def cmd_note(args) -> int:
    import numpy as np
    import jax.numpy as jnp

    from montecarlo_tpu.engine import mc_estimate, simulate_functionals
    from montecarlo_tpu.processes import GBM

    period = max(args.steps // args.observations, 1)
    n_steps = period * args.observations
    dt = args.maturity / n_steps
    r_dt = args.rate * dt

    if args.type == "cliquet":
        from montecarlo_tpu.engine import cliquet_sum

        proc = GBM.create(s0=args.s0, mu=args.rate - args.div,
                          sigma=args.sigma, dt=dt)
        out = simulate_functionals(
            proc, args.paths, n_steps, seed=args.seed,
            functionals={"leg": cliquet_sum(period, args.local_floor,
                                            args.local_cap)})
        pay = jnp.maximum(out["leg"], args.global_floor)
        est = mc_estimate(pay, float(np.exp(-args.rate * args.maturity)))
        print(json.dumps({"cliquet_leg": float(est["price"]),
                          "std_err": float(est["std_err"]),
                          "n_paths": int(est["n_paths"]),
                          "periods": args.observations}))
        return 0

    if args.n_assets == 1:
        from montecarlo_tpu.engine import autocallable

        proc = GBM.create(s0=args.s0, mu=args.rate - args.div,
                          sigma=args.sigma, dt=dt)
        fn = autocallable(period, args.trigger * args.s0, args.coupon,
                          r_dt, args.pdi_barrier * args.s0, args.s0)
    else:
        from montecarlo_tpu.engine import worst_of_autocallable
        from montecarlo_tpu.processes import MultiGBM

        a = args.n_assets
        corr = np.full((a, a), args.asset_corr)
        np.fill_diagonal(corr, 1.0)
        proc = MultiGBM.create(s0=[args.s0] * a,
                               mu=[args.rate - args.div] * a,
                               sigma=[args.sigma] * a, corr=corr, dt=dt)
        fn = worst_of_autocallable(period, args.trigger, args.coupon,
                                   r_dt, args.pdi_barrier,
                                   [args.s0] * a)
    out = simulate_functionals(proc, args.paths, n_steps, seed=args.seed,
                               functionals={"note": fn})
    # The functional returns the pathwise-DISCOUNTED payoff already.
    est = mc_estimate(out["note"], 1.0)
    print(json.dumps({"autocall_note": float(est["price"]),
                      "std_err": float(est["std_err"]),
                      "n_paths": int(est["n_paths"]),
                      "n_assets": args.n_assets,
                      "observations": args.observations}))
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="montecarlo_tpu",
        description="TPU-native quantitative Monte Carlo framework")
    parser.add_argument("--platform", default=None,
                        choices=[None, "tpu", "cpu"],
                        help="force a JAX platform (e.g. cpu for "
                             "host-latency-bound analyze/scan runs)")
    sub = parser.add_subparsers(dest="cmd", required=True)
    _add_analyze(sub)
    _add_scan(sub)
    _add_price(sub)
    _add_greeks(sub)
    _add_var(sub)
    _add_stress(sub)
    _add_calibrate(sub)
    _add_bond(sub)
    _add_xva(sub)
    _add_note(sub)
    sub.add_parser("bench", help="headline GBM throughput benchmark")
    args = parser.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    if args.cmd == "analyze":
        return cmd_analyze(args)
    if args.cmd == "scan":
        return cmd_scan(args)
    if args.cmd == "price":
        return cmd_price(args)
    if args.cmd == "greeks":
        return cmd_greeks(args)
    if args.cmd == "var":
        return cmd_var(args)
    if args.cmd == "stress":
        return cmd_stress(args)
    if args.cmd == "calibrate":
        return cmd_calibrate(args)
    if args.cmd == "bond":
        return cmd_bond(args)
    if args.cmd == "xva":
        return cmd_xva(args)
    if args.cmd == "note":
        return cmd_note(args)
    if args.cmd == "bench":
        import importlib.util
        import os

        bench_path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py")
        spec = importlib.util.spec_from_file_location("bench", bench_path)
        bench = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench)
        bench.main()
        return 0
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
