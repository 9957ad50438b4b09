#!/usr/bin/env python
"""DCC-GARCH kernel floor-or-lift study (round 4).

BENCHMARKS.md lists DCC-GARCH (3 assets) at 7.2e9 path-steps/s with no
documented ceiling argument — this measures where the time goes and
whether the correlation block can be cheapened without changing the
model:

  baseline   the round-3 step (normalize Q -> R, chol(R)) — kept here as
             the ablation; the cholq variant below measured +4% and now
             SHIPS in processes/dcc_garch.py
  cholq      algebraic identity chol(D^-1/2 Q D^-1/2) = D^-1/2 chol(Q):
             skip forming R entirely, scale the Cholesky rows by
             rsqrt(q_ii) instead (exact same matrix up to rounding)
  staticq    control — DCC recursion deleted, per-path chol of a FIXED
             Qbar each step (isolates the Q-update cost)
  staticchol control — trace-time constant Cholesky (CCC semantics):
             the no-correlation-machinery ceiling
  ccc        the real CCCGarch process for reference

Chained-single-jit methodology (DEVNOTES "axon relay"); run on the real
chip:

    PYTHONPATH=/root/repo:$PYTHONPATH python experiments/dcc_profile.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from montecarlo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache("_bench")

from montecarlo_tpu.ops.fused_engine import fused_terminal_pallas
from montecarlo_tpu.processes import CCCGarch, DCCGarch
from montecarlo_tpu.processes.dcc_garch import _EPS, _chol_unrolled
from montecarlo_tpu.utils.profiling import throughput_path_steps

N_PATHS, N_STEPS = 1 << 20, 1024

QBAR = np.array([[1.0, 0.5, 0.3], [0.5, 1.0, 0.4], [0.3, 0.4, 1.0]])
KW = dict(s0=(100.0, 50.0, 75.0), var0=(1e-4, 2e-4, 1.5e-4),
          omega=(1e-5, 2e-5, 1.5e-5), alpha=(0.08, 0.1, 0.09),
          beta=(0.88, 0.85, 0.86), qbar=QBAR,
          weights=(0.4, 0.3, 0.3))


class DCCNormalizeChol(DCCGarch):
    """The round-3 step: form R = D^-1/2 Q D^-1/2, then chol(R)."""

    def step(self, state, eps, t):
        log_s, var, q = state
        a_n = self.n_assets
        dtype = log_s[0].dtype
        ql = self._q_lists(q)

        dinv = [1.0 / jnp.sqrt(jnp.maximum(ql[i][i], _EPS))
                for i in range(a_n)]
        r = [[ql[i][j] * dinv[i] * dinv[j] for j in range(i + 1)]
             for i in range(a_n)]
        chol = _chol_unrolled(r, a_n, dtype)

        eta, new_log_s, new_var = [], [], []
        for a in range(a_n):
            zc = chol[a][0] * eps[0]
            for b in range(1, a + 1):
                zc = zc + chol[a][b] * eps[b]
            eta.append(zc)
            ret = jnp.sqrt(var[a]) * zc
            new_log_s.append(log_s[a] + ret)
            new_var.append(self.omega[a].astype(dtype)
                           + self.alpha[a].astype(dtype) * jnp.square(ret)
                           + self.beta[a].astype(dtype) * var[a])

        a_d = self.a_dcc.astype(dtype)
        b_d = self.b_dcc.astype(dtype)
        c_d = (1.0 - a_d - b_d)
        new_q = []
        for i in range(a_n):
            for j in range(i + 1):
                qbar_ij = self.qbar_flat[i * a_n + j].astype(dtype)
                new_q.append(c_d * qbar_ij + a_d * eta[i] * eta[j]
                             + b_d * ql[i][j])
        return (tuple(new_log_s), tuple(new_var), tuple(new_q))


class DCCStaticQ(DCCGarch):
    """Control: Q pinned at Qbar — per-path chol kept, recursion deleted."""

    def step(self, state, eps, t):
        log_s, var, q = state
        a_n = self.n_assets
        dtype = log_s[0].dtype
        ql = self._q_lists(q)
        dinv = [jax.lax.rsqrt(jnp.maximum(ql[i][i], _EPS))
                for i in range(a_n)]
        cq = _chol_unrolled(ql, a_n, dtype)
        chol = [[cq[i][j] * dinv[i] for j in range(i + 1)]
                for i in range(a_n)]
        new_log_s, new_var = [], []
        for a in range(a_n):
            zc = chol[a][0] * eps[0]
            for b in range(1, a + 1):
                zc = zc + chol[a][b] * eps[b]
            ret = jnp.sqrt(var[a]) * zc
            new_log_s.append(log_s[a] + ret)
            new_var.append(self.omega[a].astype(dtype)
                           + self.alpha[a].astype(dtype) * jnp.square(ret)
                           + self.beta[a].astype(dtype) * var[a])
        return (tuple(new_log_s), tuple(new_var), q)


class DCCStaticChol(DCCGarch):
    """Control: trace-time constant Cholesky (CCC semantics) — the
    no-per-path-correlation ceiling for this state layout."""

    def step(self, state, eps, t):
        log_s, var, q = state
        a_n = self.n_assets
        dtype = log_s[0].dtype
        lq = np.linalg.cholesky(QBAR)
        new_log_s, new_var = [], []
        for a in range(a_n):
            zc = jnp.asarray(lq[a, 0], dtype) * eps[0]
            for b in range(1, a + 1):
                zc = zc + jnp.asarray(lq[a, b], dtype) * eps[b]
            ret = jnp.sqrt(var[a]) * zc
            new_log_s.append(log_s[a] + ret)
            new_var.append(self.omega[a].astype(dtype)
                           + self.alpha[a].astype(dtype) * jnp.square(ret)
                           + self.beta[a].astype(dtype) * var[a])
        return (tuple(new_log_s), tuple(new_var), q)


def main():
    print("platform:", jax.devices()[0].platform)
    variants = {
        "baseline (round-3 normalize+chol)": DCCNormalizeChol.create(**KW),
        "cholq (chol(Q) row-scaled + rsqrt, SHIPPED)": DCCGarch.create(**KW),
        "staticq (no DCC recursion)": DCCStaticQ.create(**KW),
        "staticchol (trace-time chol)": DCCStaticChol.create(**KW),
        "ccc (real CCCGarch)": CCCGarch.create(
            s0=KW["s0"], var0=KW["var0"], omega=KW["omega"],
            alpha=KW["alpha"], beta=KW["beta"], corr=QBAR,
            weights=KW["weights"]),
    }
    # Semantic check first: cholq must match baseline tightly (same model,
    # different rounding) on CPU or chip.
    base = fused_terminal_pallas(
        variants["baseline (round-3 normalize+chol)"], 1 << 14, 128, seed=3)
    alt = fused_terminal_pallas(
        variants["cholq (chol(Q) row-scaled + rsqrt, SHIPPED)"], 1 << 14,
        128, seed=3)
    rel = float(jnp.max(jnp.abs(alt - base) / base))
    print(f"cholq vs baseline max rel diff (2^14 x 128): {rel:.3e}")

    for name, proc in variants.items():
        def run(n_paths, n_steps, seed):
            return fused_terminal_pallas(proc, n_paths, n_steps, seed=seed,
                                         block_rows=128)
        rate = throughput_path_steps(run, N_PATHS, N_STEPS)
        print(f"{name:38s} {rate / 1e9:6.1f}e9 path-steps/s")


if __name__ == "__main__":
    main()
