"""American Monte Carlo exposure: regression-marked trades for netting
sets.

Products without closed-form conditional values — Bermudan swaptions,
callables — enter an xVA netting set through the industry-standard AMC
technique: one backward Longstaff-Schwartz pass on the ENGINE'S OWN
simulation fits the exercise policy, then every exposure date gets a
cross-sectional regression of the policy's future discounted cashflows,
whose fitted value IS the trade's mark on still-alive paths; exercised
paths switch to the underlying's exact closed form.

This extends the framework's LSM family (`engine.american` for equity
payoffs, `engine.bermudan` for swaption PRICING) to exposure profiles —
the piece a desk needs to charge CVA on a Bermudan book.  The reference
app has nothing in this space (its risk surface stops at VaR/CVaR,
reference app.py:639-656).

Accuracy contract, stated rather than hidden:

- The conditional-value marks carry basis error (a cubic in the short
  rate here) and O(1/n_paths) regression noise, and fitting on the
  exposure paths themselves adds the standard AMC foresight bias (the
  regression "peeks" at each path's own future through the pooled fit;
  it vanishes at the 1/n_paths rate).  Tested: with ONE exercise date the
  whole profile must agree with the EXACT Jamshidian-marked European
  swaption trade — identical tails (the policies coincide), regression-
  tolerance option phase.
- Exercise is restricted to float-reset dates (real Bermudan swaption
  terms), which keeps the exercised tail's in-period fixing exact.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from montecarlo_tpu.engine.exposure import (SimulationMarkedTrade,
                                            swap_value_fn)
from montecarlo_tpu.processes.shortrate import Vasicek


class AMCSwaptionSpec(NamedTuple):
    """Structured description of a Bermudan-swaption AMC fit — what the
    SHARDED netting engines need to decompose the regression into
    gathered fixed-block Gram sums (`parallel.sharded._amc_fit_sharded`)
    instead of running the opaque `mark_fn` closure per shard.

    All fields are static (floats/tuples/closures), so the spec can ride
    the jit-static ``sets`` tuple.  ``swap`` is the remaining-swap
    valuation closure (`swap_value_fn`'s 2- and 4-argument forms);
    ``ex_dates``/``resets`` are absolute times; ``notional`` scales the
    returned marks (exercise decisions are scale-invariant).
    """

    swap: object
    sign: float
    notional: float
    ex_dates: tuple
    resets: tuple
    degree: int


def _weighted_polyfit(r, y, w, degree: int, dtype):
    """Weighted least-squares polynomial fit in standardized coordinates.

    Returns ``(beta, mean, std)`` with ``beta`` the coefficients on
    ``z^0..z^degree``, ``z = (r - mean)/std`` (the standardization keeps
    the Gram conditioned at any rate scale; same recipe as
    `engine.bermudan.bermudan_swaption_lsm`).
    """
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    m = jnp.sum(w * r) / wsum
    sd = jnp.sqrt(jnp.sum(w * jnp.square(r - m)) / wsum + 1e-12)
    z = (r - m) / sd
    cols = [jnp.ones_like(z)]
    for _ in range(degree):
        cols.append(cols[-1] * z)
    x = jnp.stack(cols, axis=-1)                       # (N, deg+1)
    xw = x * w[:, None]
    a = xw.T @ x / wsum + 1e-8 * jnp.eye(degree + 1, dtype=dtype)
    b = xw.T @ y / wsum
    return jnp.linalg.solve(a, b), m, sd


def _poly_and_slope(beta, r, m, sd, degree: int):
    z = (r - m) / sd
    val = jnp.zeros_like(r)
    slope = jnp.zeros_like(r)
    zp = jnp.ones_like(r)                              # z^i
    for i in range(degree + 1):
        val = val + beta[i] * zp
        if i + 1 <= degree:
            slope = slope + beta[i + 1] * (i + 1) * zp
        zp = zp * z
    return val, slope / sd


def bermudan_swaption_amc_trade(model: Vasicek, strike: float,
                                payment_times, pay_dt: float, *,
                                n_exercise: int, payer: bool = True,
                                notional: float = 1.0,
                                degree: int = 3, dtype=None):
    """Bermudan payer/receiver swaption as an AMC-marked netting trade.

    The holder may exercise into the REMAINING swap at the first
    ``n_exercise`` float-reset dates (``payment_times[j] - pay_dt``;
    ``n_exercise = 1`` is the European contract).  Returns a
    :class:`~montecarlo_tpu.engine.exposure.SimulationMarkedTrade`:

    - **Policy fit** (once, backward): at each exercise date, intrinsic =
      the remaining payer swap's exact affine value; continuation by
      ITM-weighted cubic LSM; exercise where intrinsic wins (exactly the
      `engine.bermudan.bermudan_swaption_lsm` recipe, so the t=0 mark
      converges to that engine's price — tested).
    - **Alive marks** (every exposure date): regress the policy's future
      cashflows, discounted to the date, on all still-alive paths; the
      clamped fit is the conditional value estimate.
    - **Exercised marks**: exact remaining-swap closed form with the
      in-period float fixing read from the path row at the latest reset
      (same machinery as `swaption_value_fn`'s physical tail).
    - ``dvalues`` for the delta-normal IM: the regression's analytic
      slope on alive paths (the fitted betas are FROZEN — standard
      delta-normal practice), the swap jvp on exercised ones.

    ``notional`` scales the returned marks and slopes (exercise
    decisions are scale-invariant, so a scaled trade has the same
    policy); ``dtype=None`` follows the model's parameter dtype (see
    `engine.exposure.swap_value_fn`).

    The returned trade carries an :class:`AMCSwaptionSpec` so the SHARDED
    netting engines can re-run the identical fit on gathered fixed-block
    Gram sums (`parallel.sharded._amc_fit_sharded`).
    """
    from montecarlo_tpu.engine.exposure import _model_dtype

    dtype = _model_dtype(model, dtype)
    times_np = [float(t) for t in payment_times]
    n_pay = len(times_np)
    if not 1 <= n_exercise <= n_pay:
        raise ValueError(f"n_exercise={n_exercise} not in [1, {n_pay}]")
    ex_dates = [times_np[j] - pay_dt for j in range(n_exercise)]
    if ex_dates[0] <= 1e-9:
        raise ValueError("first exercise date (first payment - pay_dt) "
                         "must be strictly positive")
    resets_np = [times_np[j] - pay_dt for j in range(n_pay)]
    sign = 1.0 if payer else -1.0
    scale = jnp.asarray(notional, dtype)
    swap = swap_value_fn(model, strike, times_np, pay_dt, dtype=dtype)

    def mark_fn(paths, times, T):
        n_steps = paths.shape[0] - 1
        n = paths.shape[1]
        dt = T / n_steps
        k_ex = [int(round(e / dt)) for e in ex_dates]
        for e, k in zip(ex_dates, k_ex):
            if abs(k * dt - e) > 1e-9:
                raise ValueError(
                    f"exercise date {e} does not lie on the exposure grid "
                    f"(dt={dt}); choose n_steps so resets are grid rows")
        # Pathwise discount factors, the engine's trapezoid convention.
        mid = 0.5 * (paths[:-1] + paths[1:]) * dt
        disc = jnp.exp(-jnp.concatenate(
            [jnp.zeros((1, n), dtype), jnp.cumsum(mid, axis=0)], axis=0))

        # --- backward LSM policy fit over the exercise dates ---------
        never = jnp.int32(n_steps + 1)
        k_last = k_ex[-1]
        ex_val = sign * swap(paths[k_last], jnp.asarray(ex_dates[-1],
                                                        dtype))
        take = ex_val > 0
        cash = jnp.where(take, ex_val, 0.0) * disc[k_last]   # disc to 0
        tau = jnp.where(take, jnp.int32(k_last), never)
        for j in range(n_exercise - 2, -1, -1):
            r_j = paths[k_ex[j]]
            ex_val = sign * swap(r_j, jnp.asarray(ex_dates[j], dtype))
            itm = ex_val > 0
            beta, m, sd = _weighted_polyfit(
                r_j, cash / jnp.maximum(disc[k_ex[j]], 1e-300),
                itm.astype(dtype), degree, dtype)
            cont, _ = _poly_and_slope(beta, r_j, m, sd, degree)
            take = itm & (ex_val >= cont)
            cash = jnp.where(take, ex_val * disc[k_ex[j]], cash)
            tau = jnp.where(take, jnp.int32(k_ex[j]), tau)

        # --- per-date marks -------------------------------------------
        resets = jnp.asarray(resets_np, dtype)
        k_resets_list = []
        for e in resets_np:
            k_r = int(round(e / dt))
            if e <= T + 1e-9 and abs(k_r * dt - e) > 1e-9:
                # A fixing row off the grid would silently accrue the
                # in-period coupon from the wrong date — same contract as
                # the exercise-date check above.
                raise ValueError(
                    f"reset {e} does not lie on the exposure grid "
                    f"(dt={dt}); choose n_steps so period starts are "
                    "grid rows")
            # Resets beyond the exposure horizon are never selected
            # (selection requires reset <= t <= T) — clip their indices
            # rather than rely on gather clamping.
            k_resets_list.append(min(max(k_r, 0), n_steps))
        k_resets = jnp.asarray(k_resets_list, jnp.int32)
        ones = jnp.ones((n,), dtype)

        def row(k):
            r = paths[k]
            t = times[k]
            alive = tau > k
            w = alive.astype(dtype)
            y = cash / jnp.maximum(disc[k], 1e-300)
            beta, m, sd = _weighted_polyfit(r, y, w, degree, dtype)
            fit, slope = _poly_and_slope(beta, r, m, sd, degree)
            v_alive = jnp.maximum(fit, 0.0)
            dv_alive = jnp.where(fit > 0, slope, 0.0)
            # Exercised tail: remaining swap with the in-period fixing.
            le = resets <= t + 1e-9
            idx = jnp.argmax(jnp.where(le, resets, -jnp.inf))
            t_fix = resets[idx]
            r_fix = paths[k_resets[idx]]
            v_sw, dv_sw = jax.jvp(
                lambda rr: sign * swap(rr, t, r_fix, t_fix), (r,), (ones,))
            exercised = ~alive
            return (scale * jnp.where(exercised, v_sw, v_alive),
                    scale * jnp.where(exercised, dv_sw, dv_alive))

        return jax.lax.map(row, jnp.arange(n_steps + 1))

    spec = AMCSwaptionSpec(swap=swap, sign=sign, notional=float(notional),
                           ex_dates=tuple(ex_dates),
                           resets=tuple(resets_np), degree=degree)
    return SimulationMarkedTrade(mark_fn, spec)


__all__ = ["AMCSwaptionSpec", "bermudan_swaption_amc_trade"]
