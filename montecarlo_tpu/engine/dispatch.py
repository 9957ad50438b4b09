"""Engine dispatch: pick the fastest correct backend for a terminal run.

- On TPU, scalar-state processes (everything in _FUSABLE: GBM/GARCH/
  Heston (Euler + QE)/Bates/jump/Levy (NIG, VG)/rate/local-vol/
  term-structure families) with plain,
  antithetic, or device-Sobol sampling and kernel-compatible path counts
  run the fused Pallas kernel (~5-34e9 path-steps/s/chip on v5e).
- Everything else (CPU, paths mode, custom samplers, multi-asset states,
  odd path counts) runs the `lax.scan` engine — the two produce identical
  draw streams, and bitwise-identical paths in interpret mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from montecarlo_tpu.engine.simulate import simulate
from montecarlo_tpu.ops.fused_engine import LANES, fused_terminal_pallas
from montecarlo_tpu.processes.garch import GARCHBootstrap
from montecarlo_tpu.processes.gbm import GBM
from montecarlo_tpu.processes.heston import Heston
from montecarlo_tpu.processes.heston_qe import HestonQE
from montecarlo_tpu.processes.basket import BasketGBM
from montecarlo_tpu.processes.bates import Bates
from montecarlo_tpu.processes.bates_qe import BatesQE
from montecarlo_tpu.processes.merton import Merton
from montecarlo_tpu.processes.ccc_garch import CCCGarch
from montecarlo_tpu.processes.dcc_garch import DCCGarch
from montecarlo_tpu.processes.local_vol import LocalVolGBM
from montecarlo_tpu.processes.slv import SLV, SLVKnots
from montecarlo_tpu.processes.term_gbm import TermStructureGBM
from montecarlo_tpu.processes.euler_gbm import EulerGBM
from montecarlo_tpu.processes.kou import Kou
from montecarlo_tpu.processes.nig import NIG
from montecarlo_tpu.processes.vg import VarianceGamma
from montecarlo_tpu.processes.g2pp import G2PP
from montecarlo_tpu.processes.shortrate import CIR, HullWhite, Vasicek
from montecarlo_tpu.processes.sabr import SABR
from montecarlo_tpu.processes.term_basket import TermBasketGBM
from montecarlo_tpu.rng.sobol import (SobolBridgeKernelSampler,
                                      SobolDeviceSampler)
from montecarlo_tpu.samplers import AntitheticSampler, PlainSampler

_FUSABLE = (GBM, GARCHBootstrap, Heston, HestonQE, BasketGBM, Bates,
            BatesQE, Merton, CCCGarch,
            DCCGarch, LocalVolGBM, TermStructureGBM, EulerGBM, Kou, NIG,
            VarianceGamma, Vasicek, CIR, HullWhite, G2PP, SABR,
            TermBasketGBM, SLVKnots, SLV)


def _kernel_block_rows(n_paths: int, max_rows: int = 256,
                       prefer: int | None = None) -> int | None:
    """Best block_rows that divides the path count (128 is the measured
    v5e sweet spot; see README benchmarks).  ``max_rows`` caps the block
    for kernels with per-block VMEM scratch; ``prefer`` (a process's
    ``preferred_block_rows``) is tried first — transcendental-heavy
    kernels peak at smaller blocks (Kou: 8.1e9 at 64 rows vs 7.8e9 at
    128, measured)."""
    order = (128, 64, 256, 32, 16, 8)
    if prefer in order:
        order = (prefer,) + tuple(r for r in order if r != prefer)
    for rows in order:
        if rows <= max_rows and n_paths % (rows * LANES) == 0:
            return rows
    return None


#: VMEM budget for sampler scratch buffers (bytes) — conservative slice of
#: the ~16 MiB/core so process leaves + block buffers still fit.
_SCRATCH_BUDGET = 4 << 20


def _scratch_max_rows(sampler) -> int:
    """Largest block_rows whose sampler scratch fits the VMEM budget
    (bridge scratch is n_steps * block_rows * LANES f32)."""
    per_row = sampler.n_steps * LANES * 4
    return max(_SCRATCH_BUDGET // per_row, 1)


def _fusable_sampler(sampler, process, n_steps: int) -> bool:
    """Samplers the fused kernels can run: default Threefry (None or an
    explicit PlainSampler — identical pass-through streams, so the CLI's
    `--sampler plain` default rides the kernel too), antithetic mirroring,
    device Sobol (whose table must cover every dimension), or the
    statically-scheduled bridge Sobol (single-draw, plan must cover every
    step)."""
    if (sampler is None or isinstance(sampler, (PlainSampler,
                                                AntitheticSampler))):
        return True
    if isinstance(sampler, SobolBridgeKernelSampler):
        return process.n_draws == 1 and sampler.n_steps >= n_steps
    return (isinstance(sampler, SobolDeviceSampler)
            and sampler.n_dims >= n_steps * process.n_draws)


def _kernel_sampler(sampler):
    if isinstance(sampler, (SobolDeviceSampler, SobolBridgeKernelSampler)):
        return sampler
    return None


def _fused_eligible(process, sampler, n_paths: int, n_steps: int,
                    dtype) -> int | None:
    """THE fused-kernel eligibility gate, shared by terminal_prices,
    payoff_block_moments, and simulate_functionals (one place, or the
    entry points silently diverge).  Returns the block_rows to use, or
    None for the scan engine.  Includes the x64 guard: with
    jax_enable_x64 the Mosaic lowering of the draw pipeline recurses
    (convert_element_type loop) — fall back instead of crashing.
    """
    if jax.devices()[0].platform in ("cpu",):
        return None
    if jax.config.jax_enable_x64:
        return None
    if dtype != jnp.float32 or not isinstance(process, _FUSABLE):
        return None
    if not _fusable_sampler(sampler, process, n_steps):
        return None
    max_rows = (_scratch_max_rows(sampler)
                if getattr(sampler, "kernel_scratch", False) else 256)
    return _kernel_block_rows(n_paths, max_rows,
                              getattr(process, "preferred_block_rows",
                                      None))


def terminal_prices(process, n_paths: int, n_steps: int, *, seed,
                    stream=0, sampler=None, dtype=jnp.float32,
                    path_offset=0, prefer_fused: bool = True):
    """Terminal prices via the fused kernel when eligible, else the scan
    engine.  Identical draw streams either way."""
    rows = (_fused_eligible(process, sampler, n_paths, n_steps, dtype)
            if prefer_fused else None)
    if rows is not None:
        return fused_terminal_pallas(
            process, n_paths, n_steps, seed=seed, stream=stream,
            path_offset=path_offset, block_rows=rows,
            antithetic=isinstance(sampler, AntitheticSampler),
            sampler=_kernel_sampler(sampler))
    return simulate(process, n_paths, n_steps, seed=seed, stream=stream,
                    sampler=sampler, dtype=dtype, path_offset=path_offset)


def payoff_block_moments(process, payoff_fn, n_paths: int, n_steps: int, *,
                         seed, stream=0, sampler=None, path_offset=0,
                         stats_block: int = 4096,
                         prefer_fused: bool = True):
    """Per-block payoff moments, never materializing terminals when fused.

    On TPU for fusable processes this runs the payoff+stats kernel
    (`ops.fused_engine.fused_block_moments_pallas`): the HBM write per
    kernel block is (rows, 2) stats instead of (rows, 128) prices.
    Elsewhere it falls back to terminal simulation + `moments_from_array`
    (the bitwise-deterministic block contract).
    """
    from montecarlo_tpu.ops.fused_engine import fused_block_moments_pallas
    from montecarlo_tpu.stats.welford import moments_from_array

    rows = (_fused_eligible(process, sampler, n_paths, n_steps,
                            jnp.float32)
            if prefer_fused else None)
    if rows is not None and rows * LANES % stats_block == 0:
        return fused_block_moments_pallas(
            process, payoff_fn, n_paths, n_steps, seed=seed, stream=stream,
            path_offset=path_offset, block_rows=rows,
            stats_block=stats_block,
            antithetic=isinstance(sampler, AntitheticSampler),
            sampler=_kernel_sampler(sampler))
    terminal = simulate(process, n_paths, n_steps, seed=seed, stream=stream,
                        sampler=sampler, path_offset=path_offset)
    payoffs = payoff_fn(terminal)
    if n_paths % stats_block:
        # Path count not block-aligned: one state over the whole chunk
        # (any chunk size works, like the pre-fused estimator did).
        return moments_from_array(payoffs[None, :], axis=-1)
    return moments_from_array(
        jnp.reshape(payoffs, (-1, stats_block)), axis=-1)
