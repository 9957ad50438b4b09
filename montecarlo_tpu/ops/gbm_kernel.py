"""Fused Pallas TPU kernel for GBM path simulation.

One kernel invocation per block of ``block_rows x 128`` paths:

    VMEM state: logS (block_rows, 128) f32
    per 2 steps: Threefry-2x32 (counter = global path id, step pair)
                 -> Box-Muller pair -> two sequential log-Euler updates
    at the end: terminal prices written to HBM once

No HBM round-trips inside the time loop — the entire hot loop (RNG,
transform, SDE update) lives in vector registers / VMEM, which is what the
reference's NumPy loop cannot do (it materializes `paths[(n_days+1, n_sims)]`
through memory every step, reference app.py:612-633).

Draw convention is *identical* to the `lax.scan` engine (same Threefry
counters, same Box-Muller, same update order): the random draws agree
**bitwise** with the engine; the accumulated paths agree to float32
round-off (XLA may fuse the multiply-add chain into FMAs differently per
program). Within the kernel, results are bitwise reproducible across block
sizes, path offsets, and mesh shapes at a fixed seed.

Two RNG modes:
- ``"threefry"`` (default): portable counter-based stream, bitwise equal to
  the scan engine.
- ``"hw"``: the TPU core's hardware PRNG (`pltpu.prng_random_bits`), seeded
  per (seed, stream, block) — faster, still reproducible for a fixed block
  size, but a different stream than Threefry and TPU-only.

Path ids are uint32: the kernel supports up to 2^32 paths per (seed, stream);
beyond that, advance ``stream``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from montecarlo_tpu.rng.normal import boxmuller_pair
from montecarlo_tpu.rng.threefry import key_from_seed_dynamic, threefry2x32

LANES = 128


def _block_path_ids(block_idx, block_rows: int, path_offset):
    """Global path ids for grid block ``block_idx`` as a (rows, 128) matrix.

    Layout matches the flat `jnp.arange` ordering of the scan engine:
    id = offset + block * rows * 128 + row * 128 + lane.
    """
    rows = jax.lax.broadcasted_iota(jnp.uint32, (block_rows, LANES), 0)
    lanes = jax.lax.broadcasted_iota(jnp.uint32, (block_rows, LANES), 1)
    base = (jnp.asarray(path_offset).astype(jnp.uint32)
            + block_idx.astype(jnp.uint32) * jnp.uint32(block_rows * LANES))
    return base + rows * jnp.uint32(LANES) + lanes


def _gbm_kernel(params_ref, scalar_ref, out_ref, *, n_steps: int,
                block_rows: int, rng: str):
    drift = params_ref[0, 0]
    scale = params_ref[0, 1]
    log_s0 = params_ref[0, 2]

    b = pl.program_id(0)
    ids = _block_path_ids(b, block_rows, scalar_ref[0, 0])
    # Key words arrive as int32 SMEM scalars; reinterpret as uint32 (int32
    # -> uint32 astype is a bit-preserving reinterpret for negative values
    # in XLA's two's-complement semantics).
    k0 = scalar_ref[0, 1].astype(jnp.uint32)
    k1 = scalar_ref[0, 2].astype(jnp.uint32)

    if rng == "hw":
        # Distinct per-block seeding keyed by the block's first GLOBAL path
        # id (includes path_offset: offset shards must not replay another
        # shard's stream) with the two key words kept asymmetric — folding
        # them as k0^k1 made (seed=a, stream=b) collide with (seed=b,
        # stream=a) and ignored the offset entirely.  (Mosaic allows at
        # most two seed words.)
        first_id = (scalar_ref[0, 0]
                    + b * jnp.int32(block_rows * LANES))
        pltpu.prng_seed(scalar_ref[0, 1] ^ first_id, scalar_ref[0, 2])

    def draw_pair(j):
        if rng == "hw":
            shape = (block_rows, LANES)
            b0 = pltpu.prng_random_bits(shape).astype(jnp.uint32)
            b1 = pltpu.prng_random_bits(shape).astype(jnp.uint32)
            return boxmuller_pair(b0, b1)
        b0, b1 = threefry2x32(k0, k1, ids, j)
        return boxmuller_pair(b0, b1)

    def body(j, log_s):
        z0, z1 = draw_pair(j.astype(jnp.uint32))
        # Same associativity as GBM.step in the scan engine —
        # log_s + (drift + scale*z) — for bitwise parity.  The grouped
        # increment matters beyond parity: repeatedly adding the small
        # constant drift to the large accumulator has a systematic f32
        # rounding bias (~-2.6e-5 in log over 252 steps — see GBM.step).
        # The second update is masked to an exact +0.0 increment when
        # 2j+1 == n_steps (odd step counts).
        log_s = log_s + (drift + scale * z0)
        live = 2 * j + 1 < n_steps
        zero = jnp.float32(0.0)
        log_s = log_s + jnp.where(live, drift + scale * z1, zero)
        return log_s

    n_pairs = (n_steps + 1) // 2
    init = jnp.full((block_rows, LANES), log_s0, jnp.float32)
    log_s = jax.lax.fori_loop(0, n_pairs, body, init)
    out_ref[:] = jnp.exp(log_s)


@functools.partial(jax.jit, static_argnames=(
    "n_paths", "n_steps", "block_rows", "rng", "interpret"))
def gbm_terminal_pallas(process, n_paths: int, n_steps: int, *, seed,
                        stream=0, path_offset=0, block_rows: int = 128,
                        rng: str = "threefry", interpret: bool = False):
    """Terminal GBM prices via the fused Pallas kernel.

    ``seed``/``stream``/``path_offset`` are runtime values (no recompile when
    they change).  Returns (n_paths,) float32 with the same draws as
    ``simulate(process, ..., mode="terminal")`` for ``rng="threefry"``.
    """
    block = block_rows * LANES
    if n_paths % block != 0:
        raise ValueError(f"n_paths={n_paths} must be a multiple of "
                         f"block_rows*128={block}")
    num_blocks = n_paths // block

    drift = (process.mu - 0.5 * jnp.square(process.sigma)) * process.dt
    scale = process.sigma * jnp.sqrt(process.dt)
    params = jnp.stack([
        drift.astype(jnp.float32),
        scale.astype(jnp.float32),
        jnp.log(process.s0).astype(jnp.float32),
    ]).reshape(1, 3)
    k0, k1 = key_from_seed_dynamic(seed, stream)
    scalars = jnp.stack([
        jnp.asarray(path_offset).astype(jnp.int32),
        k0.astype(jnp.int32),  # bit-preserving reinterpret
        k1.astype(jnp.int32),
    ]).reshape(1, 3)

    kernel = functools.partial(
        _gbm_kernel, n_steps=n_steps, block_rows=block_rows, rng=rng)

    out = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_blocks * block_rows, LANES),
                                       jnp.float32),
        interpret=interpret,
    )(params, scalars)
    return out.reshape(-1)
