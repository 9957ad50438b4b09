#!/usr/bin/env python
"""Where does the Heston QE-M kernel's time go? (run on the real chip)

The round-4 verdict's open question: QE-M ran at ~half its Euler twin
(8.9 vs 18.0 e9 path-steps/s) with an equal-ERROR defense but no
op-budget floor study like GARCH/Kou got.  Both schemes burn ONE threefry
cipher per path-step (Euler: a normal pair per step; QE: half a normal
pair + half a uniform pair), so the entire gap is transcendental algebra:
ndtri32 (variance quantile), log32 (exponential tail + the
martingale-correction MGFs), sqrt, divides.

Variants (all fused-kernel, 64-row blocks, fetched REPS-slope):
  A. QE-M shipped        — the kernel as shipped (round-5 optimized
                           algebra: the two branch-exclusive MGF logs
                           merged into ONE log32 on a selected argument,
                           sqrt(x)*sqrt(y) fused to sqrt(x*y), psi
                           eliminated — quad/inv2/p in (m^2, s2) form)
  B. draws-only floor    — same draw pattern, trivial state update:
                           the RNG + loop budget nothing can beat
  C. no martingale corr. — Andersen's plain central scheme (constant K0):
                           isolates the correction's log32 + divides
  D. no ndtri            — z_v = affine(u) (WRONG distribution, cost
                           probe only): isolates ndtri32
  E. textbook QE-M       — the pre-round-5 algebra (per-branch logs,
                           explicit psi, split sqrts): the form the
                           shipped kernel improved on

Round-5 measurements (TPU v5e, 2^20 paths x 1024 steps):
  A(=old E optimized) 9.80e9, B 28.35e9, C 11.11e9, D 10.48e9,
  old-A textbook 8.92e9, Euler Heston 18.05e9 path-steps/s.
=> the optimized algebra shipped (+10%); the remaining gap to B is the
   irreducible ndtri+log+select budget of the scheme itself.

    PYTHONPATH=/root/repo:$PYTHONPATH python experiments/qe_profile.py
"""

import time

import jax
import jax.numpy as jnp

from montecarlo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache("_bench")

from montecarlo_tpu.ops.fused_engine import fused_terminal_pallas
from montecarlo_tpu.processes import Heston, HestonQE
from montecarlo_tpu.processes.heston_qe import PSI_C, HestonQEState
from montecarlo_tpu.rng.normal import log32, ndtri32

N_PATHS, N_STEPS = 1 << 20, 1024
REPS_LO, REPS_HI = 2, 10
P = dict(s0=100.0, v0=0.04, mu=0.0, kappa=0.5, theta=0.04, xi=1.0,
         rho=-0.9)


class QEDrawsOnly(HestonQE):
    """The QE draw pattern (1 normal + 1 uniform per step, shared-cipher
    pairs) feeding a trivial state update — the RNG/loop floor."""

    def step(self, state, eps, t):
        d = state.log_s.dtype
        return HestonQEState(
            log_s=state.log_s + d.type(1e-4) * eps[0] + d.type(1e-7) * eps[1],
            v=state.v)


class QENoMartingale(HestonQE):
    """Andersen's uncorrected central scheme: constant K0 (drops the
    per-path MGF correction: log32 + divides + selects)."""

    def _k0_star(self, v, quad, a, b2, p, beta, dtype):
        return jnp.broadcast_to(self.k0.astype(dtype), v.shape)


class QETextbook(HestonQE):
    """The pre-round-5 textbook algebra: explicit psi, one log32 per MGF
    branch, split sqrts — what `_next_v`/`_k0_star` shipped before the
    variant-E optimization (kept here so the +10% stays reproducible)."""

    def _next_v(self, v, u, dtype):
        one = dtype.type(1.0)
        m = self.theta.astype(dtype) + (v - self.theta.astype(dtype)) \
            * self.e_kdt.astype(dtype)
        s2 = v * self.c1.astype(dtype) + self.c2.astype(dtype)
        psi = s2 / jnp.square(m)
        quad = psi <= dtype.type(PSI_C)
        inv2 = 2.0 / psi
        tw1 = jnp.maximum(inv2 - one, 0.0)
        b2 = jnp.maximum(inv2 - one + jnp.sqrt(inv2) * jnp.sqrt(tw1), 0.0)
        a = m / (one + b2)
        z_v = ndtri32(u, dtype)
        v_quad = a * jnp.square(jnp.sqrt(b2) + z_v)
        p = (psi - one) / (psi + one)
        beta = (one - p) / m
        tail = log32((one - p) / (one - u)) / beta
        v_exp = jnp.where(u <= p, 0.0, jnp.maximum(tail, 0.0))
        return jnp.where(quad, v_quad, v_exp), quad, a, b2, p, beta

    def _k0_star(self, v, quad, a, b2, p, beta, dtype):
        one = dtype.type(1.0)
        A = self.mgf_a.astype(dtype)
        den = one - 2.0 * A * a
        ok_q = den > 0.0
        den_s = jnp.where(ok_q, den, one)
        lm_quad = A * b2 * a / den_s - 0.5 * log32(den_s)
        gap = beta - A
        ok_e = gap > 0.0
        mgf_e = p + beta * (one - p) / jnp.where(ok_e, gap, one)
        lm_exp = log32(jnp.maximum(mgf_e, dtype.type(1e-30)))
        lm = jnp.where(quad, lm_quad, lm_exp)
        ok = jnp.logical_or(jnp.logical_and(quad, ok_q),
                            jnp.logical_and(jnp.logical_not(quad), ok_e))
        head = -(self.k1.astype(dtype) + 0.5 * self.k3.astype(dtype)) * v
        return jnp.where(ok, head - lm, self.k0.astype(dtype))


class QENoNdtri(QETextbook):
    """z_v = affine(u): WRONG distribution — isolates ndtri32's cost."""

    def _next_v(self, v, u, dtype):
        one = dtype.type(1.0)
        m = self.theta.astype(dtype) + (v - self.theta.astype(dtype)) \
            * self.e_kdt.astype(dtype)
        s2 = v * self.c1.astype(dtype) + self.c2.astype(dtype)
        psi = s2 / jnp.square(m)
        quad = psi <= dtype.type(PSI_C)
        inv2 = 2.0 / psi
        tw1 = jnp.maximum(inv2 - one, 0.0)
        b2 = jnp.maximum(inv2 - one + jnp.sqrt(inv2) * jnp.sqrt(tw1), 0.0)
        a = m / (one + b2)
        z_v = dtype.type(3.46) * (u - dtype.type(0.5))  # cost probe only
        v_quad = a * jnp.square(jnp.sqrt(b2) + z_v)
        p = (psi - one) / (psi + one)
        beta = (one - p) / m
        tail = log32((one - p) / (one - u)) / beta
        v_exp = jnp.where(u <= p, 0.0, jnp.maximum(tail, 0.0))
        return jnp.where(quad, v_quad, v_exp), quad, a, b2, p, beta


def slope(fn):
    times = {}
    for reps in (REPS_LO, REPS_HI):
        @jax.jit
        def chained(s0, reps=reps):
            def body(i, acc):
                return acc + fn(s0 + i).ravel()[0]
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        float(chained(jnp.int32(0)))
        t0 = time.perf_counter()
        float(chained(jnp.int32(1000)))
        times[reps] = time.perf_counter() - t0
    return (times[REPS_HI] - times[REPS_LO]) / (REPS_HI - REPS_LO)


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform)
    dt = 1.0 / N_STEPS
    variants = (
        ("A QE-M shipped", HestonQE.create(dt=dt, **P)),
        ("B draws-only floor", QEDrawsOnly.create(dt=dt, **P)),
        ("C no martingale", QENoMartingale.create(dt=dt, **P)),
        ("D no ndtri", QENoNdtri.create(dt=dt, **P)),
        ("E textbook QE-M", QETextbook.create(dt=dt, **P)),
        ("ref Euler Heston", Heston.create(dt=dt, **P)),
    )
    for name, proc in variants:
        s = slope(lambda seed, proc=proc:
                  fused_terminal_pallas(proc, N_PATHS, N_STEPS, seed=seed,
                                        block_rows=64))
        rate = N_PATHS * N_STEPS / s
        print(f"{name:22s} {rate / 1e9:6.2f}e9 path-steps/s "
              f"({s * 1e3:.1f} ms/run)")
