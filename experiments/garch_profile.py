#!/usr/bin/env python
"""Where does the GARCH kernel's time go? (run on the real TPU chip)

Variants isolate the bootstrap gather cost:
  A. baseline           — pad 512 (4 table rows: 4 lane-gathers + selects)
  B. pad 128            — 1 table row (1 lane-gather)
  C. no-gather          — shock = uniform (skips the table entirely)
  D. normal-shock GARCH — Box-Muller shock + variance recurrence
  E. GBM reference      — the 34e9 headline kernel
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from montecarlo_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache("_bench")

from montecarlo_tpu.ops.fused_engine import fused_terminal_pallas
from montecarlo_tpu.ops.gbm_kernel import gbm_terminal_pallas
from montecarlo_tpu.processes import GBM
from montecarlo_tpu.processes.garch import GARCHBootstrap
from montecarlo_tpu.rng.normal import boxmuller_pair, uniform_from_bits
from montecarlo_tpu.rng.threefry import random_bits
from montecarlo_tpu.utils.profiling import throughput_path_steps

N_PATHS, N_STEPS = 1 << 20, 1024
rng = np.random.default_rng(0)
returns = rng.normal(0, 0.02, size=500)


class NoGatherGARCH(GARCHBootstrap):
    """Shock = uniform (no table gather) — isolates the gather cost.
    (The gather lives in step() since the antithetic redesign, so the
    variant overrides step to consume the uniform directly.)"""

    def step(self, state, eps, t):
        shock = eps[0]
        vol = jnp.sqrt(state.var)
        r = shock * vol
        new_var = (self.omega.astype(r.dtype)
                   + self.alpha.astype(r.dtype) * jnp.square(r)
                   + self.beta.astype(r.dtype) * state.var)
        return type(state)(log_s=state.log_s + r, var=new_var)

    def step_pair(self, state, eps0, eps1, t0):
        # Override the base gather-sharing pair step: these variants must
        # NOT gather (that is the cost being isolated).
        st1 = self.step(state, eps0, t0)
        return st1, self.step(st1, eps1, t0 + 1)


class NormalGARCH(NoGatherGARCH):
    """Box-Muller normal shocks (GBM's draw cost + GARCH's recurrence)."""

    def draws_pair(self, seed, stream, path_ids, j, dtype=jnp.float32):
        j = jnp.asarray(j).astype(jnp.uint32)
        b0, b1 = random_bits(seed, stream, path_ids, j)
        z0, z1 = boxmuller_pair(b0, b1, dtype)
        return (z0,), (z1,)


class OneHotMXUGARCH(GARCHBootstrap):
    """Bootstrap table read via the two-level one-hot MXU contraction —
    the trick that beat XLA gather 23x in the SLV interpolation and XLA
    scatter 7.4x in the VaR histogram, tried here IN-KERNEL on the
    per-(path, step) shock read.

    Layout: Mosaic has no 3-D vector layouts, so the per-path one-hot over
    the 128 table lanes cannot exist for a whole (block_rows, 128) block at
    once — the contraction runs per SUBLANE SLICE (1, 128): a (128 table
    cols x 128 paths) one-hot built from a sublane iota (a cheap
    lane-aligned broadcast, no transposes), contracted against the
    (n_rows, 128) table on the MXU, then the table row selected by a
    second (n_rows x 128) one-hot and a cross-sublane sum.  ``precision``
    — HIGHEST by default: the MXU's default bf16 pass truncates the table
    VALUES (the 0.4% SLV trap); one-hot entries are exact either way.
    """

    precision = jax.lax.Precision.HIGHEST

    def _gather_many(self, idxs, dtype):
        table = self.table.astype(dtype)
        if idxs[0].ndim != 2:
            return tuple(table[idx] for idx in idxs)
        n_rows_tab = table.shape[0] // 128
        t2 = table.reshape(n_rows_tab, 128)
        n_sub = idxs[0].shape[0]
        iota_tcol = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        iota_trow = jax.lax.broadcasted_iota(jnp.int32, (n_rows_tab, 128), 0)
        outs = []
        for idx in idxs:
            rows = (idx >> 7).astype(jnp.int32)
            cols = (idx & 127).astype(jnp.int32)
            parts = []
            for i in range(n_sub):
                oh = (iota_tcol == cols[i:i + 1, :]).astype(dtype)
                # (n_rows, 128 tcols) @ (128 tcols, 128 paths) on the MXU.
                m = jax.lax.dot_general(
                    t2, oh, (((1,), (0,)), ((), ())),
                    precision=self.precision,
                    preferred_element_type=jnp.float32)
                ohr = (iota_trow == rows[i:i + 1, :]).astype(dtype)
                parts.append(jnp.sum(m * ohr, axis=0, keepdims=True))
            outs.append(jnp.concatenate(parts, axis=0))
        return tuple(outs)


class OneHotMXUDefaultPrec(OneHotMXUGARCH):
    """Same contraction at the MXU's default (bf16-truncating) precision —
    NOT semantics-exact (table values lose mantissa bits); measured only to
    isolate how much of the one-hot route's cost is the HIGHEST-precision
    multi-pass."""

    precision = None


def bench(name, proc, block_rows=128, n_steps=N_STEPS):
    def fn(n_paths, n_steps, *, seed):
        return fused_terminal_pallas(proc, n_paths, n_steps, seed=seed,
                                     block_rows=block_rows)
    tp = throughput_path_steps(fn, N_PATHS, n_steps, reps=4)
    print(f"{name:34s} {tp/1e9:7.1f}e9 path-steps/s")
    return tp


def onehot_suite():
    """The VERDICT-r3 question: does the two-level one-hot MXU contraction
    beat the 10-row lane gather on the 5y bootstrap table read, in-kernel
    and at highest matmul precision?"""
    ret5y = np.random.default_rng(1).normal(0, 0.02, size=1260)
    mk = lambda cls: cls.create(ret5y, s0=100.0, var0=0.0001)
    base, oh, ohd = mk(GARCHBootstrap), mk(OneHotMXUGARCH), \
        mk(OneHotMXUDefaultPrec)

    # Semantics check first: HIGHEST-precision one-hot must be BITWISE
    # equal to the lane gather (each output is exactly one table value).
    a = fused_terminal_pallas(base, 1 << 13, 32, seed=3, block_rows=8,
                              interpret=jax.devices()[0].platform == "cpu")
    b = fused_terminal_pallas(oh, 1 << 13, 32, seed=3, block_rows=8,
                              interpret=jax.devices()[0].platform == "cpu")
    bitwise = bool(jnp.all(a == b))
    print(f"one-hot HIGHEST bitwise == lane gather: {bitwise}")
    assert bitwise

    bench("lane gather 5y (rows=128)", base)
    bench("lane gather 5y (rows=8)", base, block_rows=8)
    for br in (8, 32):
        bench(f"one-hot MXU HIGHEST (rows={br})", oh, block_rows=br)
        bench(f"one-hot MXU bf16 (rows={br})", ohd, block_rows=br)


def xla_gather_suite():
    """The same table read as bare XLA programs (no Pallas): what the 23x
    SLV result actually compared — one-hot MXU vs XLA's native gather —
    plus the lane-gather decomposition, at 2^22 reads per call."""
    import time

    n = 1 << 22
    tab = jnp.asarray(np.random.default_rng(2).normal(size=1280), jnp.float32)
    t2 = tab.reshape(10, 128)

    def native(idx):
        return jnp.take(tab, idx)

    def lane(idx):
        rows = (idx >> 7).astype(jnp.int32)
        cols = (idx & 127).astype(jnp.int32)
        out = jnp.zeros(idx.shape, jnp.float32)
        for r in range(10):
            g = t2[r][cols]
            out = jnp.where(rows == r, g, out)
        return out

    def onehot(idx, precision):
        rows = (idx >> 7).astype(jnp.int32)
        cols = (idx & 127).astype(jnp.int32)
        ohc = jax.nn.one_hot(cols, 128, dtype=jnp.float32)      # (n,128)
        m = jax.lax.dot_general(ohc, t2, (((1,), (1,)), ((), ())),
                                precision=precision,
                                preferred_element_type=jnp.float32)  # (n,10)
        ohr = jax.nn.one_hot(rows, 10, dtype=jnp.float32)
        return jnp.sum(m * ohr, axis=1)

    def run(name, f):
        @jax.jit
        def chained(seed):
            def body(i, acc):
                bits = jax.random.bits(
                    jax.random.key(seed + i), (n,)).astype(jnp.uint32)
                idx = (bits % 1260).astype(jnp.int32)
                return acc + f(idx)[0]
            return jax.lax.fori_loop(0, 8, body, jnp.float32(0.0))

        jax.block_until_ready(chained(jnp.int32(0)))
        t0 = time.perf_counter()
        jax.block_until_ready(chained(jnp.int32(100)))
        dt = (time.perf_counter() - t0) / 8
        print(f"XLA {name:30s} {n / dt / 1e9:7.2f}e9 reads/s")

    run("native gather (jnp.take)", native)
    run("lane-gather decomposition", lane)
    run("one-hot MXU HIGHEST", lambda i: onehot(i, jax.lax.Precision.HIGHEST))
    run("one-hot MXU default", lambda i: onehot(i, None))


if __name__ == "__main__":
    import sys

    print(f"platform: {jax.devices()[0].platform}")
    if "--onehot" in sys.argv:
        onehot_suite()
        sys.exit(0)
    if "--xla-gather" in sys.argv:
        xla_gather_suite()
        sys.exit(0)
    ret5y = rng.normal(0, 0.02, size=1260)  # 5y history, the reference default
    base = GARCHBootstrap.create(returns, s0=100.0, var0=0.0001)
    b128 = GARCHBootstrap.create(returns[:128], s0=100.0, var0=0.0001,
                                 pad_to=128)
    nog = NoGatherGARCH.create(returns, s0=100.0, var0=0.0001)
    nrm = NormalGARCH.create(returns, s0=100.0, var0=0.0001)
    g5y = GARCHBootstrap.create(ret5y, s0=100.0, var0=0.0001)        # 1280
    g5y_pow2 = GARCHBootstrap.create(ret5y, s0=100.0, var0=0.0001,
                                     pad_to=2048)                    # old pad

    bench("A 2y (pad 512, 4 rows)", base)
    bench("B pad 128 (1 row)", b128)
    bench("C no gather", nog)
    bench("D normal-shock garch", nrm)
    bench("F 5y (pad 1280, 10 rows)", g5y)
    bench("G 5y (pad 2048, 16 rows)", g5y_pow2)

    def gbm_fn(n_paths, n_steps, *, seed):
        proc = GBM.create(s0=100.0, mu=0.03, sigma=0.2, dt=1.0 / 252.0)
        return gbm_terminal_pallas(proc, n_paths, n_steps, seed=seed,
                                   block_rows=128)
    tp = throughput_path_steps(gbm_fn, N_PATHS, N_STEPS, reps=4)
    print(f"{'E gbm reference':26s} {tp/1e9:7.1f}e9 path-steps/s")
