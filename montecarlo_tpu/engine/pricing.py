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
