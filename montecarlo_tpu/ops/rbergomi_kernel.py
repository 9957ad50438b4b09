"""Fused rough-Bergomi price integral as a Pallas TPU kernel.

Consumes the exact-covariance joint matrix (W~ grid values + Brownian
increments, the MXU matmul's output) and produces terminal prices in ONE
pass: the perpendicular normals are generated IN-KERNEL from the same
counter convention (columns 2T..3T-1 of the draw matrix — they never
touch HBM), and v_t, the correlated increment, and the log-price
accumulation all stay in VMEM.  Replaces four XLA-level (T, N) elementwise
passes + a (T, N) normal materialization — measured ~1.9x on the full
sampler (`experiments/rbergomi_bench.py`).

Layout: ``joint`` is (2T, n_paths) reshaped to (2T, blocks*rows, 128);
each grid block reads its (2T, rows, 128) slab via the same
dynamic-`pl.dslice` row reads the SLV `KernelRows` protocol uses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from montecarlo_tpu.ops.gbm_kernel import LANES, _block_path_ids
from montecarlo_tpu.rng.normal import boxmuller_pair, exp32
from montecarlo_tpu.rng.threefry import key_from_seed_dynamic, threefry2x32


def _rbergomi_kernel(params_ref, scalar_ref, tpow_ref, joint_ref, out_ref,
                     *, n_steps: int, block_rows: int):
    xi0 = params_ref[0, 0]
    eta = params_ref[0, 1]
    rho = params_ref[0, 2]
    c_perp = params_ref[0, 3]          # sqrt(1 - rho^2) * sqrt(dt)
    half_dt = params_ref[0, 4]         # 0.5 * dt
    log_s0 = params_ref[0, 5]
    half_eta2 = params_ref[0, 6]       # 0.5 * eta^2

    b = pl.program_id(0)
    ids = _block_path_ids(b, block_rows, scalar_ref[0, 0])
    k0 = scalar_ref[0, 1].astype(jnp.uint32)
    k1 = scalar_ref[0, 2].astype(jnp.uint32)
    T = n_steps

    def substep(t, z_perp, carry):
        log_s, v_left = carry
        dw = joint_ref[pl.dslice(T + t, 1)][0]
        dws = rho * dw + c_perp * z_perp
        log_s = log_s + (jnp.sqrt(v_left) * dws - v_left * half_dt)
        w_t = joint_ref[pl.dslice(t, 1)][0]
        v_t = xi0 * exp32(eta * w_t - half_eta2 * tpow_ref[0, t])
        return (log_s, v_t)

    def pair(jp, carry):
        # Perpendicular normals are draw-matrix columns 2T + t: the pair
        # for (t=2jp, t=2jp+1) is counter (path id, T + jp) — one cipher
        # call per two steps, the exact `normal_draw` stream.
        zp0, zp1 = boxmuller_pair(*threefry2x32(
            k0, k1, ids, (T + jp).astype(jnp.uint32)))
        carry = substep(2 * jp, zp0, carry)
        return substep(2 * jp + 1, zp1, carry)

    init = (jnp.full((block_rows, LANES), log_s0, jnp.float32),
            jnp.full((block_rows, LANES), xi0, jnp.float32))
    log_s, _ = jax.lax.fori_loop(0, T // 2, pair, init)
    out_ref[:] = exp32(log_s)


@functools.partial(jax.jit, static_argnames=("n_steps", "block_rows",
                                             "interpret"))
def rbergomi_terminal_pallas(joint, tpow, params, seed, stream, *,
                             n_steps: int, path_offset=0,
                             block_rows: int = 16,
                             interpret: bool = False):
    """Terminal prices from the (2T, N) joint matrix.

    ``tpow``: (T,) grid times to the 2H power.  ``params``: 7-vector
    (xi0, eta, rho, sqrt(1-rho^2)*sqrt(dt), 0.5*dt, log32(s0),
    0.5*eta^2), f32.  ``block_rows`` sizes the per-block VMEM slab
    (2T * block_rows * 512 bytes: 4 MB at T=256, rows=16).
    """
    two_t, n_paths = joint.shape
    if two_t != 2 * n_steps or n_steps % 2:
        raise ValueError(f"joint {joint.shape} vs n_steps={n_steps} "
                         "(need 2T rows, even T)")
    block = block_rows * LANES
    if n_paths % block != 0:
        raise ValueError(f"n_paths={n_paths} must be a multiple of "
                         f"block_rows*128={block}")
    num_blocks = n_paths // block
    k0, k1 = key_from_seed_dynamic(seed, stream)
    scalars = jnp.stack([
        jnp.asarray(path_offset).astype(jnp.int32),
        k0.astype(jnp.int32),
        k1.astype(jnp.int32),
    ]).reshape(1, 3)

    kernel = functools.partial(_rbergomi_kernel, n_steps=n_steps,
                               block_rows=block_rows)
    out = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((1, 7), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n_steps), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((two_t, block_rows, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_blocks * block_rows, LANES),
                                       jnp.float32),
        interpret=interpret,
    )(params.reshape(1, 7), scalars,
      tpow.reshape(1, n_steps).astype(jnp.float32),
      joint.reshape(two_t, num_blocks * block_rows, LANES))
    return out.reshape(-1)


__all__ = ["rbergomi_terminal_pallas"]
