"""Pod-scale portfolio VaR/CVaR (BASELINE.json config 5).

10^9+-path risk runs: paths shard over the mesh, terminal values stream into
a psum-merged histogram sketch plus exact block moments — O(bins) memory per
device regardless of path count.  The sketch range is auto-calibrated with a
small pilot run so the interesting quantiles land well inside the grid.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from montecarlo_tpu.engine.simulate import simulate
from montecarlo_tpu.engine.streaming import streaming_estimate, risk_from_state
from montecarlo_tpu.parallel.sharded import sharded_terminal_sketch
from montecarlo_tpu.stats.quantiles import (
    sketch_cdf,
    sketch_quantile,
    sketch_tail_mean_below,
)
from montecarlo_tpu.stats.welford import std_error


def _pilot_range(process, n_steps: int, seed: int, margin: float = 0.5):
    pilot = np.asarray(simulate(process, 4096, n_steps, seed=seed,
                                stream=999))
    lo, hi = float(pilot.min()), float(pilot.max())
    span = hi - lo
    return lo - margin * span, hi + margin * span


def portfolio_var(process, n_paths: int, n_days: int, current_value: float,
                  *, seed: int = 0, mesh=None, bins: int = 8192,
                  lo: Optional[float] = None, hi: Optional[float] = None,
                  chunk_paths: Optional[int] = None,
                  block_size: int = 4096,
                  checkpoint_path: Optional[str] = None,
                  progress_callback=None) -> dict:
    """VaR/CVaR/percentile bands at arbitrary path counts.

    - With ``mesh`` and no chunking need (``n_paths`` fits per-device), one
      fused sharded pass (`sharded_terminal_sketch`): collectives are a psum
      of integer bin counts and an all_gather of tiny block moments.
    - Otherwise streams chunks (optionally sharded) with checkpoint/resume.

    Returns the reference's risk keys (percentiles, expected_return/vol,
    prob_profit, var_95, cvar_95; app.py:647-657) plus ``std_err`` and
    ``n_paths``.
    """
    if lo is None or hi is None:
        auto_lo, auto_hi = _pilot_range(process, n_days, seed)
        lo = auto_lo if lo is None else lo
        hi = auto_hi if hi is None else hi

    if mesh is not None and chunk_paths is None:
        sketch, moments = sharded_terminal_sketch(
            process, n_paths, n_days, seed=seed, mesh=mesh, lo=lo, hi=hi,
            bins=bins, block_size=block_size)
        s0 = float(current_value)
        p = {f"p{q}": float(sketch_quantile(sketch, float(q)))
             for q in (1, 5, 10, 25, 50, 75, 90, 95, 99)}
        tail = float(sketch_tail_mean_below(sketch, p["p5"]))
        mean = float(moments.mean)
        std = float(jnp.sqrt(moments.m2 / jnp.maximum(moments.count, 1)))
        cdf_at_s0 = float(sketch_cdf(sketch, s0))
        return {
            "percentiles": p,
            "expected_return": (mean / s0 - 1.0) * 100.0,
            "expected_vol": std / s0 * 100.0,
            "prob_profit": (1.0 - cdf_at_s0) * 100.0,
            "var_95": (s0 - p["p5"]) / s0 * 100.0,
            "cvar_95": (s0 - tail) / s0 * 100.0,
            "std_err": float(std_error(moments)),
            "n_paths": int(float(moments.count)),
        }

    chunk = chunk_paths or min(n_paths, 1 << 20)
    state = streaming_estimate(
        process, n_paths, n_days, seed=seed, chunk_paths=chunk,
        block_size=block_size, lo=lo, hi=hi, bins=bins, mesh=mesh,
        checkpoint_path=checkpoint_path, progress_callback=progress_callback)
    return risk_from_state(state, current_value)
