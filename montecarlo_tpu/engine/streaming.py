"""Streaming estimation with checkpoint/resume — the pod-scale path.

The reference materializes every path in memory and has no persistence at
all (its only cache is an in-memory 1h memo of fetched data, reference
app.py:887).  This module runs arbitrarily large path counts in fixed-size
chunks and keeps only O(blocks + sketch) state:

- per-block Welford moment states (block = ``DEFAULT_BLOCK`` consecutive
  global paths) — kept, not merged, so the final fixed-tree reduce is
  *identical* whether the run happened in one shot, in chunks, across
  resumes, or on different mesh shapes;
- a mergeable histogram sketch of terminal values for quantiles/VaR/CVaR;
- the RNG needs no state: counters are derived from global path ids, so a
  resumed run regenerates exactly the paths it would have had (seed-
  deterministic re-execution — failed shards are replayable for free).

Checkpoints are a single .npz (atomic rename); `resume=True` picks up a
partial estimate mid-flight and the result is bitwise identical to the
uninterrupted run.
"""

from __future__ import annotations

import os
import tempfile
from dataclasses import dataclass
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from montecarlo_tpu.engine.dispatch import terminal_prices
from montecarlo_tpu.stats.quantiles import (
    HistogramSketch,
    sketch_cdf,
    sketch_quantile,
    sketch_quantile_std_err,
    sketch_tail_mean_below,
)
from montecarlo_tpu.stats.welford import (
    MomentState,
    moments_from_array,
    moments_reduce,
    std_error,
)

# One constant shared with the sharded estimators: streamed/resumed and
# sharded runs must partition paths into the SAME fixed blocks or the
# bitwise-reproducibility contract (DEVNOTES) silently breaks.
from montecarlo_tpu.parallel.sharded import DEFAULT_BLOCK  # noqa: E402


@dataclass
class StreamingState:
    """Host-side accumulated state (all numpy; trivially serializable)."""

    seed: int
    n_steps: int
    block_size: int
    paths_done: int
    block_count: np.ndarray   # (n_blocks,)
    block_mean: np.ndarray
    block_m2: np.ndarray
    sketch: HistogramSketch   # numpy-leaved

    def save(self, path: str) -> None:
        """Checkpoint to ``path``: atomic .npz for ``*.npz`` paths (simple,
        single-file), orbax otherwise (directory; async-capable, the JAX
        ecosystem's standard checkpoint format)."""
        if path.endswith(".npz"):
            # mkstemp (not the race-prone mktemp): the temp file exists from
            # creation, so concurrent writers cannot collide on the name.
            fd, tmp = tempfile.mkstemp(
                suffix=".npz", dir=os.path.dirname(os.path.abspath(path)))
            try:
                with os.fdopen(fd, "wb") as fh:
                    np.savez(
                        fh, seed=self.seed, n_steps=self.n_steps,
                        block_size=self.block_size,
                        paths_done=self.paths_done,
                        block_count=self.block_count,
                        block_mean=self.block_mean,
                        block_m2=self.block_m2,
                        **{f"sk_{k}": np.asarray(v)
                           for k, v in self.sketch._asdict().items()},
                    )
                os.replace(tmp, path)
            except BaseException:
                if os.path.exists(tmp):
                    os.unlink(tmp)
                raise
            return
        import orbax.checkpoint as ocp

        tree = {
            "seed": self.seed, "n_steps": self.n_steps,
            "block_size": self.block_size, "paths_done": self.paths_done,
            "block_count": self.block_count, "block_mean": self.block_mean,
            "block_m2": self.block_m2,
            "sketch": {k: np.asarray(v)
                       for k, v in self.sketch._asdict().items()},
        }
        # Synchronous checkpointer: the save must be durable before the
        # next chunk runs (StandardCheckpointer is async under the hood and
        # may never finalize if the process moves on).
        with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ck:
            ck.save(os.path.abspath(path), args=ocp.args.StandardSave(tree),
                    force=True)

    @classmethod
    def load(cls, path: str) -> "StreamingState":
        if path.endswith(".npz"):
            z = np.load(path)
            sketch = HistogramSketch(**{k: z[f"sk_{k}"]
                                        for k in HistogramSketch._fields})
            return cls(
                seed=int(z["seed"]), n_steps=int(z["n_steps"]),
                block_size=int(z["block_size"]),
                paths_done=int(z["paths_done"]),
                block_count=z["block_count"], block_mean=z["block_mean"],
                block_m2=z["block_m2"], sketch=sketch,
            )
        import orbax.checkpoint as ocp

        with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ck:
            t = ck.restore(os.path.abspath(path))
        sketch = HistogramSketch(
            **{k: np.asarray(t["sketch"][k])
               for k in HistogramSketch._fields})
        return cls(
            seed=int(t["seed"]), n_steps=int(t["n_steps"]),
            block_size=int(t["block_size"]),
            paths_done=int(t["paths_done"]),
            block_count=np.asarray(t["block_count"]),
            block_mean=np.asarray(t["block_mean"]),
            block_m2=np.asarray(t["block_m2"]), sketch=sketch,
        )

    def moments(self) -> MomentState:
        return moments_reduce(MomentState(
            jnp.asarray(self.block_count), jnp.asarray(self.block_mean),
            jnp.asarray(self.block_m2)))


def streaming_estimate(
    process, total_paths: int, n_steps: int, *, seed: int,
    payoff_fn: Optional[Callable] = None, chunk_paths: int = 1 << 20,
    block_size: int = DEFAULT_BLOCK, lo: float = 0.0, hi: float = 1000.0,
    bins: int = 4096, dtype=jnp.float32, sampler=None,
    checkpoint_path: Optional[str] = None, resume: bool = True,
    checkpoint_every: int = 1, target_std_err: Optional[float] = None,
    mesh=None, progress_callback=None,
) -> StreamingState:
    """Estimate over ``total_paths`` in chunks, checkpointing along the way.

    ``payoff_fn`` feeds the moment accumulator (defaults to the terminal
    value itself); the sketch always ingests terminal values.  Stops early
    at a chunk boundary once ``target_std_err`` is reached (the driver
    metric's 'wall-clock to std-err 1e-3' mode).
    """
    if total_paths % chunk_paths or chunk_paths % block_size:
        raise ValueError("total_paths % chunk_paths % block_size != 0")
    payoff_fn = payoff_fn or (lambda s: s)

    state = None
    if checkpoint_path and resume and os.path.exists(checkpoint_path):
        state = StreamingState.load(checkpoint_path)
        if (state.seed, state.n_steps, state.block_size) != (
                seed, n_steps, block_size):
            raise ValueError("checkpoint does not match this run's config")
        if (state.sketch.counts.shape[0] != bins
                or float(state.sketch.lo) != float(lo)
                or float(state.sketch.hi) != float(hi)):
            raise ValueError(
                "checkpoint sketch grid (lo/hi/bins) does not match this "
                "run — merged quantiles would be silently wrong")
        if state.paths_done % chunk_paths:
            raise ValueError(
                f"resumed paths_done={state.paths_done} is not a multiple "
                f"of chunk_paths={chunk_paths}; resume with the original "
                "chunk size (or a divisor of paths_done)")
    if state is None:
        # Host-side np.float64 count carrier: exact adds to 2^53 regardless
        # of jax_enable_x64 (a jnp f64 sketch silently truncates to f32
        # without x64 — the 2^24-count wrongness this layer must never have).
        z64 = np.float64(0.0)
        state = StreamingState(
            seed=seed, n_steps=n_steps, block_size=block_size, paths_done=0,
            block_count=np.zeros((0,)), block_mean=np.zeros((0,)),
            block_m2=np.zeros((0,)),
            sketch=HistogramSketch(
                lo=np.float64(lo), hi=np.float64(hi),
                counts=np.zeros((bins,), np.float64), total=z64,
                underflow=z64, overflow=z64,
                vmin=np.float64(np.inf), vmax=np.float64(-np.inf)),
        )

    chunk_idx = state.paths_done // chunk_paths
    while state.paths_done < total_paths:
        offset = state.paths_done
        if mesh is not None:
            from montecarlo_tpu.parallel.sharded import sharded_terminal
            terminal = sharded_terminal(process, chunk_paths, n_steps,
                                        seed=seed, mesh=mesh, sampler=sampler,
                                        dtype=dtype, path_offset=offset)
            # Gather before accumulating: block statistics must be computed
            # with a device-layout-independent reduction order so chunked /
            # sharded / one-shot runs stay bitwise identical.  (The fully
            # on-device pod path is sharded_mc_estimate /
            # sharded_terminal_sketch, which all_gather per-block stats
            # instead.)
            terminal = jnp.asarray(np.asarray(terminal))
        else:
            terminal = terminal_prices(process, chunk_paths, n_steps,
                                       seed=seed, sampler=sampler,
                                       dtype=dtype, path_offset=offset)
        payoffs = payoff_fn(terminal)
        blocks = moments_from_array(
            jnp.reshape(payoffs, (-1, block_size)), axis=-1)
        state.block_count = np.concatenate(
            [state.block_count, np.asarray(blocks.count, np.float64)])
        state.block_mean = np.concatenate(
            [state.block_mean, np.asarray(blocks.mean, np.float64)])
        state.block_m2 = np.concatenate(
            [state.block_m2, np.asarray(blocks.m2, np.float64)])
        # Chunk binning + merge on host in np.float64: the f64 grid bins
        # identically whether x64 is on or off, and f64 count adds are exact
        # to 2^53 (a jnp f64 sketch would silently truncate to f32 without
        # x64 — the 2^24-count wrongness this layer must never have).  The
        # fully on-device pod path is sharded_terminal_sketch (int32 psum).
        term64 = np.asarray(terminal, np.float64)
        width = (np.float64(hi) - np.float64(lo)) / bins
        idx = np.floor((term64 - np.float64(lo)) / width).astype(np.int64)
        under = int(np.sum(idx < 0))
        over = int(np.sum(idx >= bins))
        cnts = np.bincount(idx[(idx >= 0) & (idx < bins)],
                           minlength=bins).astype(np.float64)
        s = state.sketch
        state.sketch = HistogramSketch(
            lo=s.lo, hi=s.hi,
            counts=s.counts + cnts,
            total=s.total + np.float64(term64.size),
            underflow=s.underflow + np.float64(under),
            overflow=s.overflow + np.float64(over),
            vmin=np.minimum(s.vmin, term64.min()),
            vmax=np.maximum(s.vmax, term64.max()),
        )
        state.paths_done += chunk_paths
        chunk_idx += 1

        if checkpoint_path and chunk_idx % checkpoint_every == 0:
            state.save(checkpoint_path)
        se = float(std_error(state.moments()))
        if progress_callback:
            progress_callback(state.paths_done, total_paths, se)
        if target_std_err is not None and se <= target_std_err:
            break

    if checkpoint_path:
        state.save(checkpoint_path)
    return state


def risk_from_state(state: StreamingState, current_price: float, *,
                    moments_are_prices: bool = True) -> dict:
    """The reference's risk statistics (app.py:647-657) from streamed state —
    sketch-based quantiles instead of exact sort (error <= one bin width).

    The sketch always holds terminal *prices*; the moment state holds
    whatever ``payoff_fn`` the stream ran with.  If the stream used a
    non-identity payoff, pass ``moments_are_prices=False`` — the price
    moments then come from the sketch (bin midpoints) so expected
    return/vol stay price-consistent, and the payoff moments are reported
    separately as ``payoff_mean``/``payoff_std_err``.
    """
    m = state.moments()
    s0 = float(current_price)
    # Explicit dtype: device reads use the widest float available so the
    # host f64 state doesn't trip implicit-downcast warnings without x64.
    vdt = jnp.result_type(float)
    sk = HistogramSketch(*(jnp.asarray(np.asarray(v, vdt))
                           for v in state.sketch))
    if moments_are_prices:
        mean = float(m.mean)
        std = float(jnp.sqrt(m.m2 / jnp.maximum(m.count, 1)))
    else:
        # Price mean/std from the sketch (bin-midpoint approximation) —
        # the moment state carries payoff values, not prices.
        bins = sk.counts.shape[0]
        width = (sk.hi - sk.lo) / bins
        mids = sk.lo + (jnp.arange(bins, dtype=vdt) + 0.5) * width
        w = sk.counts.astype(vdt)
        tot = jnp.maximum(jnp.sum(w), 1.0)
        mean = float(jnp.sum(w * mids) / tot)
        std = float(jnp.sqrt(jnp.maximum(
            jnp.sum(w * jnp.square(mids - mean)) / tot, 0.0)))
    out = risk_dict(sk, mean=mean, std=std, std_err=float(std_error(m)),
                    count=int(float(m.count)), current_price=s0)
    if not moments_are_prices:
        out["payoff_mean"] = float(m.mean)
        out["payoff_std_err"] = float(std_error(m))
        # std_err above refers to the payoff stream; make that explicit.
    return out


def risk_dict(sk: HistogramSketch, *, mean: float, std: float,
              std_err: float, count: int, current_price: float) -> dict:
    """Assemble the reference risk keys (app.py:647-657) from a sketch plus
    price moments — THE one place these formulas live (risk_from_state and
    both api/var.py branches all delegate here)."""
    import warnings

    s0 = float(current_price)
    p = {f"p{q}": float(sketch_quantile(sk, float(q)))
         for q in (1, 5, 10, 25, 50, 75, 90, 95, 99)}
    tail_mean = float(sketch_tail_mean_below(sk, p["p5"]))
    # Deterministic grid resolution of the sketch: every quantile is exact
    # only up to one bin width (stats.quantiles docstring), and CVaR adds
    # the bin-midpoint approximation (<= width/2) on top of the threshold's
    # own one-width uncertainty.  Reported in the same percent-of-spot
    # units as var_95_std_err so the two error sources compare directly:
    # at small path counts the sampling bar dominates; past roughly
    # n ~ q(1-q)/(f(x_q) * width)^2 paths the GRID floor dominates and more
    # paths stop helping — raise ``bins`` (or tighten lo/hi) instead.
    bins = sk.counts.shape[0]
    width = float(sk.hi - sk.lo) / bins
    var_grid_err = width / s0 * 100.0
    cvar_grid_err = 1.5 * width / s0 * 100.0
    var_std_err = float(sketch_quantile_std_err(sk, 5.0)) / s0 * 100.0
    if var_std_err < var_grid_err:
        warnings.warn(
            f"VaR sampling std-err ({var_std_err:.3g}% of spot) is below "
            f"the sketch's deterministic grid resolution "
            f"({var_grid_err:.3g}% = one bin width): the estimate is "
            "grid-limited — increase bins (or narrow the lo/hi range) "
            "rather than adding paths", stacklevel=3)
    return {
        "percentiles": p,
        "expected_return": (mean / s0 - 1.0) * 100.0,
        "expected_vol": std / s0 * 100.0,
        "prob_profit": 100.0 * (1.0 - float(sketch_cdf(sk, s0))),
        "var_95": (s0 - p["p5"]) / s0 * 100.0,
        "var_95_std_err": var_std_err,
        "var_95_grid_err": var_grid_err,
        "cvar_95": (s0 - tail_mean) / s0 * 100.0,
        "cvar_95_grid_err": cvar_grid_err,
        "std_err": std_err,
        "n_paths": count,
        # Fraction of samples outside the sketch grid: > 0 means tail
        # quantiles/CVaR approximate that mass at the grid edge.  The
        # api.var entry points auto-re-range when this is material; a
        # nonzero value here means an explicit lo/hi clipped the tail.
        "sketch_oob_fraction":
            (float(sk.underflow) + float(sk.overflow))
            / max(float(sk.total), 1.0),
    }

