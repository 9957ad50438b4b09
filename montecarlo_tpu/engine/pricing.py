"""Monte Carlo estimators over simulated terminal prices."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from montecarlo_tpu.stats.welford import (
    MomentState,
    moments_from_array,
    moments_merge,
    std_error,
)


def mc_estimate(payoffs, discount=1.0) -> dict:
    """Mean estimator with standard error.

    Returns ``{"price", "std_err", "n_paths"}`` — ``std_err`` is the
    discounted standard error of the mean, the convergence criterion of the
    driver's wall-clock-to-1e-3 benchmark metric.
    """
    payoffs = jnp.asarray(payoffs)
    if not jnp.issubdtype(payoffs.dtype, jnp.floating):
        # Bool/int payoffs (digitals, indicators): casting the DISCOUNT to
        # their dtype would truncate it to True/0 and silently corrupt the
        # price; promote the payoffs to float instead.
        payoffs = payoffs.astype(jnp.float32)
    st: MomentState = moments_from_array(payoffs, axis=0)
    d = jnp.asarray(discount, payoffs.dtype)
    return {
        "price": d * st.mean,
        "std_err": d * std_error(st),
        "n_paths": st.count,
    }


@partial(jax.jit, static_argnames=("payoff_fn", "chunk_paths", "n_steps",
                                   "max_chunks", "use_fused"))
def price_to_tolerance(process, payoff_fn, *, target_std_err, seed,
                       chunk_paths: int = 1 << 22, n_steps: int = 252,
                       discount=1.0, max_chunks: int = 1024,
                       use_fused: bool = True):
    """Price until the (discounted) standard error reaches the target —
    entirely on device (`lax.while_loop` over path chunks), one host
    round-trip total.  This is the driver metric's 'wall-clock to std-err
    1e-3' mode; the checkpointable/bitwise-deterministic variant is
    `engine.streaming.streaming_estimate(target_std_err=...)`.

    Returns ``{"price", "std_err", "n_paths", "n_chunks"}``.
    """
    from montecarlo_tpu.engine.dispatch import payoff_block_moments
    from montecarlo_tpu.stats.welford import moments_reduce

    if chunk_paths * max_chunks > 1 << 32:
        # Path ids are uint32: offsets past 2^32 wrap and REPLAY earlier
        # chunks' draws — duplicates would be merged as independent samples
        # and the reported std_err silently understated.
        raise ValueError(
            f"chunk_paths*max_chunks = {chunk_paths}*{max_chunks} exceeds "
            "the 2^32 global path-id space; lower one of them or use "
            "streaming_estimate with distinct streams")
    d = jnp.asarray(discount, jnp.float32)
    target = jnp.asarray(target_std_err, jnp.float32)

    def chunk_stats(i):
        # Payoff + block stats fused into the path kernel when eligible —
        # the (chunk_paths,) terminal array never reaches HBM.
        blocks = payoff_block_moments(
            process, payoff_fn, chunk_paths, n_steps, seed=seed,
            path_offset=i * chunk_paths, prefer_fused=use_fused)
        return moments_reduce(blocks)

    def cond(carry):
        st, i = carry
        return (i < max_chunks) & ((i < 1) | (d * std_error(st) > target))

    def body(carry):
        st, i = carry
        return moments_merge(st, chunk_stats(i)), i + 1

    z = jnp.float32(0.0)
    st, n_chunks = jax.lax.while_loop(
        cond, body, (MomentState(count=z, mean=z, m2=z), jnp.int32(0)))
    return {
        "price": d * st.mean,
        "std_err": d * std_error(st),
        "n_paths": st.count,
        "n_chunks": n_chunks,
    }


def rqmc_estimate(process, payoff_fn, n_paths: int, n_steps: int, *,
                  seed: int, sampler_factory=None, n_replicates: int = 8,
                  discount=1.0, dtype=jnp.float32) -> dict:
    """Randomized-QMC estimate with an HONEST error bar.

    The iid std-err formula is meaningless for QMC (points are negatively
    dependent by construction; it overstates the true error ~30x on smooth
    payoffs).  The statistically sound estimate runs ``n_replicates``
    independent *randomizations* of the same point set — here the
    digital shift, keyed by the seed — and reports

        price   = mean of replicate means,
        std_err = std(replicate means) / sqrt(R).

    ``sampler_factory(replicate_index) -> sampler`` defaults to device
    Sobol samplers with a FRESH linear-matrix scramble per replicate: a
    digital shift alone leaves shift-invariant error components identical
    across replicates (the replicate spread then *under*states the true
    error — observed 8-sigma misses on the bridge sampler), so the
    scramble itself must re-randomize.  Each replicate uses
    ``n_paths // n_replicates`` paths; the direction tables are operands,
    so all replicates share one compiled program.
    """
    from montecarlo_tpu.engine.dispatch import terminal_prices
    from montecarlo_tpu.rng.sobol import SobolDeviceSampler

    if n_replicates < 2:
        raise ValueError("n_replicates must be >= 2 (the error bar is the "
                         "spread across replications)")
    if n_paths < n_replicates or n_paths % n_replicates:
        raise ValueError(
            f"n_paths={n_paths} must split into n_replicates="
            f"{n_replicates} equal non-empty QMC replications")
    n_per = n_paths // n_replicates
    if sampler_factory is None:
        sampler_factory = lambda r: SobolDeviceSampler.create(
            n_steps, process.n_draws, scramble_seed=seed + r)

    means = []
    for r in range(n_replicates):
        # Masked to 31 bits: the fused kernel takes the seed as a traced
        # int32 operand, and an unmasked golden-ratio stride overflows it
        # (the CPU scan path takes seeds statically and hid this).
        rep_seed = (seed + 0x9E3779B9 * (r + 1)) & 0x7FFFFFFF
        terminal = terminal_prices(process, n_per, n_steps, seed=rep_seed,
                                   sampler=sampler_factory(r), dtype=dtype)
        means.append(jnp.mean(payoff_fn(terminal)))
    m = jnp.stack(means)
    d = jnp.asarray(discount, m.dtype)
    price = d * jnp.mean(m)
    se = d * jnp.std(m, ddof=1) / jnp.sqrt(jnp.asarray(n_replicates,
                                                       m.dtype))
    return {"price": price, "std_err": se, "n_paths": n_paths,
            "n_replicates": n_replicates}
