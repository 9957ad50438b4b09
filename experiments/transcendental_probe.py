#!/usr/bin/env python
"""Measure TPU f32 transcendental bias vs exact f64 references.

The bridge-RQMC estimate (se ~5e-6) sits -1.9e-3 below Black-Scholes on
TPU with kernel and scan engines agreeing BITWISE, while the same
shapes/seeds on CPU are unbiased -- so the defect is in TPU arithmetic
shared by both engines.  The GBM step applies exp() once per step; a
relative bias of b per exp compounds to ~252*b on the terminal.  This
probe quantifies, on the real chip:

  1. mean/max relative error of jnp.exp over the per-step increment range
     (+-5 sigma of sigma*sqrt(dt)*z ~ +-0.065), vs f64 numpy;
  2. same for jnp.log over (0, 1) (feeds ndtri32's tail branch);
  3. elementwise ndtri32 TPU-vs-CPU difference over the open unit interval;
  4. the terminal itself: 252-step compounded exp vs one exp of the
     f64-summed increments, both on TPU, same draws.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from montecarlo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache("_bench")


def rel_err_stats(approx, exact):
    r = (np.asarray(approx, np.float64) - exact) / np.abs(exact)
    return {"mean": float(r.mean()), "rms": float(np.sqrt((r ** 2).mean())),
            "max_abs": float(np.abs(r).max())}


def main() -> None:
    dev = jax.devices()[0]
    cpu = jax.devices("cpu")[0] if dev.platform == "cpu" else None
    print(json.dumps({"platform": dev.platform}))

    # 1M f32 inputs across the per-step increment range.
    x = np.linspace(-0.065, 0.065, 1_000_001).astype(np.float32)
    ex_tpu = jax.jit(jnp.exp)(jnp.asarray(x))
    print("exp  ", json.dumps(rel_err_stats(ex_tpu, np.exp(x.astype(np.float64)))))

    u = np.linspace(1e-6, 1.0 - 1e-6, 1_000_001).astype(np.float32)
    lg_tpu = jax.jit(jnp.log)(jnp.asarray(u))
    exact_log = np.log(u.astype(np.float64))
    print("log  ", json.dumps(rel_err_stats(lg_tpu, exact_log)))

    from montecarlo_tpu.rng.normal import ndtri32
    f = jax.jit(lambda v: ndtri32(v, jnp.float32))
    nd_dev = np.asarray(f(jnp.asarray(u)))
    try:
        from scipy.special import ndtri as ndtri_ref
        exact_nd = ndtri_ref(u.astype(np.float64))
        mask = np.abs(exact_nd) > 1e-3
        print("ndtri", json.dumps(rel_err_stats(nd_dev[mask], exact_nd[mask])))
        # z-bias matters additively near 0, not relatively:
        print("ndtri add-bias", json.dumps({
            "mean_z_err": float((nd_dev - exact_nd).mean()),
            "max_abs_z_err": float(np.abs(nd_dev - exact_nd).max())}))
    except ImportError:
        pass

    # 4. Compounded exp vs single exp of the exact sum, same normals.
    steps, n = 252, 1 << 20
    rng = np.random.default_rng(0)
    z = rng.standard_normal((steps, n)).astype(np.float32)
    sig, mu, dt = 0.2, 0.03, 1.0 / steps
    a = np.float32((mu - 0.5 * sig * sig) * dt)
    b = np.float32(sig * np.sqrt(dt))

    @jax.jit
    def compounded(z):
        def body(s, zt):
            return s * jnp.exp(a + b * zt), None
        s, _ = jax.lax.scan(body, jnp.full((n,), 100.0, jnp.float32), z)
        return s

    s_comp = np.asarray(compounded(jnp.asarray(z)))
    # Exact reference terminal in f64 from the same draws.
    incr = a.astype(np.float64) + b.astype(np.float64) * z.astype(np.float64)
    s_exact = 100.0 * np.exp(incr.sum(axis=0))
    print("terminal compounded-vs-exact",
          json.dumps(rel_err_stats(s_comp, s_exact)))

    # Same compounding on CPU for contrast.
    if dev.platform != "cpu":
        s_cpu = np.asarray(jax.jit(compounded, device=jax.devices("cpu")[0]
                                   if False else None,
                                   backend="cpu")(z))
        print("terminal CPU compounded-vs-exact",
              json.dumps(rel_err_stats(s_cpu, s_exact)))

    # Price impact of the compounding error alone: discounted mean call
    # payoff from s_comp vs s_exact.
    disc = np.exp(-mu)
    p_dev = disc * np.maximum(s_comp.astype(np.float64) - 105.0, 0).mean()
    p_exact = disc * np.maximum(s_exact - 105.0, 0).mean()
    print(json.dumps({"payoff_mean_dev": p_dev, "payoff_mean_exact": p_exact,
                      "gap": p_dev - p_exact}))


if __name__ == "__main__":
    main()
