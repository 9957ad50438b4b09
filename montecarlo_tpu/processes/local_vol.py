"""Local-volatility process: sigma(t, S) from a device-resident surface.

The industry-standard generalization of GBM (Dupire 1994): the instantaneous
volatility is a deterministic function of time and spot,

    d log S = (r - sigma(t, S)^2 / 2) dt + sigma(t, S) dW.

TPU-native design:
- the surface lives as a small grid of **time-knot rows** (default 16
  pillars — market surfaces have ~10-20 expiries) x **128 log-moneyness
  knots** (one VPU lane vector per row);
- time interpolation selects rows with *static* indexing: the row at traced
  time t is a sum of hat-function weights over the (few, static) knots —
  Mosaic has no dynamic_slice, so a traced row index is not an option
  inside the fused kernel, but a weighted blend of statically-indexed rows
  lowers everywhere;
- strike interpolation is linear in log-moneyness via two same-shape lane
  gathers (the Mosaic-compatible gather the GARCH bootstrap uses), with
  flat extrapolation outside the knot range (market practice).

Runs in the scan engine and the fused Pallas kernel unchanged.  The
reference has only constant/GARCH vols (reference app.py:586-657); local
vol is what production equity-derivatives MC actually calibrates to.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from montecarlo_tpu.rng.normal import exp32, log32
import numpy as np

from montecarlo_tpu.processes.base import NormalDrawsMixin

KNOTS = 128
DEFAULT_TIME_KNOTS = 16


def interp_row_1d(row, x, x0, dx):
    """Linear interpolation of a (KNOTS,) row at 1-D coordinates x,
    edge-clamped (flat extrapolation, market practice).

    NOT a gather: XLA's TPU gather is catastrophically slow in a hot scan
    (measured ~100x on the SLV step, 7x slower than even a flat (N, 128)
    one-hot matmul).  Each bracketing read splits its index into
    (hi = i >> 3, lo = i & 7) and contracts two SMALL one-hots — a
    (N, 16) @ (16, 8) dot then a width-8 masked sum — the
    `stats/quantiles.histogram_counts` two-level trick run in reverse,
    with O(N x 16) intermediates instead of O(N x 128).
    """
    u = (x - x0) / dx
    i = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, KNOTS - 2)
    frac = jnp.clip(u - i.astype(x.dtype), 0.0, 1.0)
    tab = row.reshape(KNOTS // 8, 8)
    hi_cols = jnp.arange(KNOTS // 8, dtype=jnp.int32)
    lo_cols = jnp.arange(8, dtype=jnp.int32)

    def read(idx):
        oh_hi = (hi_cols[None, :] == (idx >> 3)[:, None]).astype(x.dtype)
        # precision=HIGHEST: the TPU MXU's default single-pass bf16 matmul
        # would TRUNCATE the table values to ~0.4% relative (caught by the
        # compile smoke: 5.9e-4 scan-vs-kernel divergence) — one-hot
        # weights are bf16-exact, the values are not.
        rows8 = jnp.dot(oh_hi, tab,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32).astype(x.dtype)
        oh_lo = (lo_cols[None, :] == (idx & 7)[:, None]).astype(x.dtype)
        return jnp.sum(rows8 * oh_lo, axis=-1)

    return read(i) * (1.0 - frac) + frac * read(i + 1)


class LocalVolState(NamedTuple):
    log_s: jnp.ndarray  # (n_paths,)


class LocalVolGBM(NormalDrawsMixin, NamedTuple("LocalVolFields", [
        ("s0", jnp.ndarray),
        ("rate", jnp.ndarray),
        ("dt", jnp.ndarray),
        ("x0", jnp.ndarray),        # first log-moneyness knot
        ("dx", jnp.ndarray),        # log-moneyness knot spacing
        ("dt_knot", jnp.ndarray),   # time-knot spacing (years)
        ("vol_flat", jnp.ndarray),  # (n_time_knots * 128,) row-major surface
])):
    """GBM with state-and-time-dependent volatility from a sampled surface."""

    n_draws = 1

    @classmethod
    def create(cls, s0, rate, dt, n_steps: int,
               vol_fn: Callable[[float, np.ndarray], np.ndarray],
               x_min: float = -1.5, x_max: float = 1.5,
               n_time_knots: int | None = None,
               dtype=jnp.float32) -> "LocalVolGBM":
        """Sample ``vol_fn(t, spots) -> vols`` onto the surface grid.

        ``vol_fn`` is evaluated host-side at ``n_time_knots`` uniform knot
        times spanning [0, n_steps * dt] over spots ``s0 * exp(x)`` for 128
        uniform log-moneyness knots x in [x_min, x_max].  Between knots the
        vol interpolates linearly in time (exact for surfaces linear in t);
        a surface needing finer time structure passes more knots.
        """
        n_tk = (min(max(n_steps, 2), DEFAULT_TIME_KNOTS)
                if n_time_knots is None else n_time_knots)
        if n_tk < 2:
            raise ValueError("need at least 2 time knots")
        horizon = n_steps * float(dt)
        dt_knot = horizon / (n_tk - 1)
        x = np.linspace(x_min, x_max, KNOTS)
        spots = float(s0) * np.exp(x)
        rows = np.stack([
            np.asarray(vol_fn(j * dt_knot, spots), np.float64)
            for j in range(n_tk)])
        if rows.shape != (n_tk, KNOTS):
            raise ValueError(f"vol_fn must return {KNOTS} vols per knot")
        if np.any(rows <= 0) or not np.all(np.isfinite(rows)):
            raise ValueError("vol surface must be positive and finite")
        as_ = lambda v: jnp.asarray(v, dtype)
        return cls(s0=as_(s0), rate=as_(rate), dt=as_(dt),
                   x0=as_(x[0]), dx=as_(x[1] - x[0]), dt_knot=as_(dt_knot),
                   vol_flat=as_(rows.reshape(-1)))

    @property
    def n_time_knots(self) -> int:
        return self.vol_flat.shape[0] // KNOTS

    def init_state(self, path_ids, dtype=jnp.float32) -> LocalVolState:
        return LocalVolState(log_s=jnp.full(
            path_ids.shape, log32(self.s0).astype(dtype), dtype))

    def _row(self, t, dtype):
        """Surface row at (traced) step t via static hat-weight blending —
        no dynamic_slice, so it lowers inside Mosaic kernels."""
        table = self.vol_flat.astype(dtype).reshape(self.n_time_knots, KNOTS)
        u = (jnp.asarray(t).astype(dtype) * self.dt.astype(dtype)
             / self.dt_knot.astype(dtype))
        u = jnp.clip(u, 0.0, self.n_time_knots - 1.0)
        row = jnp.zeros((KNOTS,), dtype)
        for j in range(self.n_time_knots):  # static unroll over knots
            w = jnp.maximum(1.0 - jnp.abs(u - j), 0.0)
            row = row + w * table[j]
        return row

    def local_vol(self, log_s, t, dtype=None):
        """sigma(t, S) by bilinear interpolation (time knots x log-moneyness,
        edge-clamped); works on (n,) scan arrays and (rows, 128) blocks."""
        dtype = dtype or log_s.dtype
        row = self._row(t, dtype)
        x = log_s - log32(self.s0).astype(dtype)
        u = (x - self.x0.astype(dtype)) / self.dx.astype(dtype)
        i = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, KNOTS - 2)
        frac = jnp.clip(u - i.astype(dtype), 0.0, 1.0)
        if log_s.ndim == 2:
            # Kernel block layout: same-shape lane gathers (see GARCH).
            vals = jnp.broadcast_to(row[None, :], log_s.shape)
            v_lo = jnp.take_along_axis(vals, i, axis=1)
            v_hi = jnp.take_along_axis(vals, jnp.minimum(i + 1, KNOTS - 1),
                                       axis=1)
        else:
            # Plain gathers, NOT `interp_row_1d`: this branch must stay
            # BITWISE equal to the kernel branch above (the LV fused/scan
            # contract), and the one-hot contraction differs by ~1 ULP per
            # step under XLA's FMA choices.  LV's scan path is only warm
            # in paths-mode callers (LSM under CEV); SLV, whose contract
            # is ULP-tight rather than bitwise, uses the fast read.
            v_lo = row[i]
            v_hi = row[jnp.minimum(i + 1, KNOTS - 1)]
        return v_lo * (1.0 - frac) + v_hi * frac

    def step(self, state: LocalVolState, eps, t) -> LocalVolState:
        z = eps[0]
        dtype = state.log_s.dtype
        sig = self.local_vol(state.log_s, t, dtype)
        dt = self.dt.astype(dtype)
        drift = (self.rate.astype(dtype) - 0.5 * jnp.square(sig)) * dt
        return LocalVolState(
            # Increment grouped before the add (see GBM.step).
            log_s=state.log_s + (drift + sig * jnp.sqrt(dt) * z))

    def prices(self, state: LocalVolState):
        return exp32(state.log_s)

    def log_prices(self, state):
        """Native log prices — the functional engines fold log-space
        functionals on these directly (no per-step exp/log)."""
        return state.log_s
