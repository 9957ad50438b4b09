"""Packed MXU basket kernel — correlated GBM for large asset counts.

The tuple-state :class:`~montecarlo_tpu.processes.basket.BasketGBM` kernel
unrolls the Cholesky correlation into A(A+1)/2 VPU mul-adds per step — fine
for A <= ~8, linear-in-A slowdown beyond (TODO perf item 3).  This kernel
keeps **paths on sublanes and assets on lanes**, so the correlation is one
(sub_rows, 128) x (128, 128) MXU matmul per step regardless of A:

    lane l = (g, a):  path-group g = l >> log2(A_pad), asset a = l & (A_pad-1)
    zc = z @ kron(I_groups, L_pad^T)        <- block-diagonal, one matmul
    log S += drift_lane + scale_lane * zc

Packing 128 / A_pad independent path-groups per lane row keeps every VPU
lane busy for any power-of-two asset count 2..128 (non-pow2 A pads to the
next power of two; the padded assets have sigma = weight = 0).

Draw convention (asset-major, distinct from MultiGBM's time-major one):
draw (path p, asset a, step t) is Box-Muller component ``t & 1`` of the
Threefry call ``c0 = p, c1 = a * n_pairs + (t >> 1)`` — both halves of each
cipher call feed two consecutive *time steps* of the same asset, so per
normal the cipher cost matches the scalar GBM kernel.  Use a dedicated
``stream`` if mixing with other draw conventions under one seed.

Replaces: the reference's multi-asset capability is absent (single-asset
NumPy MC only, reference app.py:586-657); this is BASELINE.json config 3
(correlated basket, 5-50 assets) built TPU-first.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from montecarlo_tpu.processes.basket import BasketGBM
from montecarlo_tpu.rng.normal import boxmuller_pair
from montecarlo_tpu.rng.threefry import key_from_seed_dynamic, threefry2x32

LANES = 128


def _a_pad(n_assets: int) -> int:
    p = 1
    while p < n_assets:
        p <<= 1
    if p > LANES:
        raise ValueError(f"n_assets={n_assets} exceeds {LANES}")
    return p


def _packed_constants(basket: BasketGBM, dtype=jnp.float32):
    """Lane-tiled parameter rows + the block-diagonal correlation matrix.

    Traceable (the basket leaves may be jit arguments); only shapes come
    from the static asset count.
    """
    a_n = basket.n_assets
    a_pad = _a_pad(a_n)
    groups = LANES // a_pad

    def tile(vec):
        v = jnp.asarray(vec, dtype)
        v = jnp.concatenate([v, jnp.zeros(a_pad - a_n, dtype)])
        return jnp.tile(v, groups)

    chol = jnp.asarray(basket.chol_flat, dtype).reshape(a_n, a_n)
    l_pad = jnp.zeros((a_pad, a_pad), dtype).at[:a_n, :a_n].set(chol)
    eye_g = jnp.eye(groups, dtype=dtype)
    corr_mat = jnp.kron(eye_g, l_pad.T)                   # zc = z @ corr_mat
    gsum = jnp.kron(eye_g, jnp.ones((a_pad, 1), dtype))   # lane -> group sum

    sigma = jnp.asarray(basket.sigma, dtype)
    dt = jnp.asarray(basket.dt, dtype)
    drift = tile((jnp.asarray(basket.mu, dtype) - 0.5 * jnp.square(sigma))
                 * dt)
    scale = tile(sigma * jnp.sqrt(dt))
    log_s0 = tile(jnp.log(jnp.asarray(basket.s0, dtype)))
    weights = tile(basket.weights)
    as2 = lambda v: jnp.reshape(v, (1, -1))
    return (as2(drift), as2(scale), as2(log_s0), as2(weights),
            corr_mat, gsum, a_pad, groups)


def _basket_kernel(drift_ref, scale_ref, logs0_ref, w_ref, corr_ref,
                   gsum_ref, scalar_ref, out_ref, *, n_steps: int,
                   sub_rows: int, a_pad: int, groups: int):
    b = pl.program_id(0)
    base = (scalar_ref[0, 0].astype(jnp.uint32)
            + b.astype(jnp.uint32) * jnp.uint32(sub_rows * groups))
    k0 = scalar_ref[0, 1].astype(jnp.uint32)
    k1 = scalar_ref[0, 2].astype(jnp.uint32)

    subs = jax.lax.broadcasted_iota(jnp.uint32, (sub_rows, LANES), 0)
    lanes = jax.lax.broadcasted_iota(jnp.uint32, (sub_rows, LANES), 1)
    log2a = int(np.log2(a_pad))
    ids = base + subs * jnp.uint32(groups) + (lanes >> jnp.uint32(log2a))
    asset = lanes & jnp.uint32(a_pad - 1)

    n_pairs = (n_steps + 1) // 2
    drift = drift_ref[0, :]
    scale = scale_ref[0, :]
    corr = corr_ref[:]

    def body(j, log_s):
        c1 = asset * jnp.uint32(n_pairs) + j.astype(jnp.uint32)
        b0, b1 = threefry2x32(k0, k1, ids, c1)
        z0, z1 = boxmuller_pair(b0, b1)
        zc0 = jnp.dot(z0, corr, preferred_element_type=jnp.float32)
        log_s = log_s + drift + scale * zc0
        live = 2 * j + 1 < n_steps
        zc1 = jnp.dot(z1, corr, preferred_element_type=jnp.float32)
        zero = jnp.float32(0.0)
        log_s = (log_s + jnp.where(live, drift, zero)
                 + jnp.where(live, scale * zc1, zero))
        return log_s

    init = jnp.broadcast_to(logs0_ref[0, :], (sub_rows, LANES))
    log_s = jax.lax.fori_loop(0, n_pairs, body, init)
    weighted = w_ref[0, :] * jnp.exp(log_s)
    # Basket value per (path-sublane, group): one MXU contraction.
    out_ref[:] = jnp.dot(weighted, gsum_ref[:],
                         preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=(
    "n_paths", "n_steps", "sub_rows", "interpret"))
def packed_basket_terminal_pallas(basket: BasketGBM, n_paths: int,
                                  n_steps: int, *, seed, stream=0,
                                  path_offset=0, sub_rows: int = 256,
                                  interpret: bool = False):
    """Terminal basket values (weights . S_T) as a flat (n_paths,) array.

    Path id ordering is ``offset + block*sub_rows*groups + sub*groups + g``
    (row-major over the packed layout), so results are independent of
    ``sub_rows`` and shard-invariant under path offsets.
    """
    (drift, scale, log_s0, weights, corr_mat, gsum, a_pad,
     groups) = _packed_constants(basket)
    block_paths = sub_rows * groups
    if n_paths % block_paths != 0:
        raise ValueError(f"n_paths={n_paths} must be a multiple of "
                         f"sub_rows*groups={block_paths}")
    num_blocks = n_paths // block_paths

    k0, k1 = key_from_seed_dynamic(seed, stream)
    scalars = jnp.stack([
        jnp.asarray(path_offset).astype(jnp.int32),
        k0.astype(jnp.int32), k1.astype(jnp.int32),
    ]).reshape(1, 3)

    kernel = functools.partial(_basket_kernel, n_steps=n_steps,
                               sub_rows=sub_rows, a_pad=a_pad, groups=groups)
    row = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(num_blocks,),
        in_specs=[row(drift), row(scale), row(log_s0), row(weights),
                  row(corr_mat), row(gsum),
                  pl.BlockSpec((1, 3), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((sub_rows, groups), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_blocks * sub_rows, groups),
                                       jnp.float32),
        interpret=interpret,
    )(drift, scale, log_s0, weights, corr_mat, gsum, scalars)
    return out.reshape(-1)


def packed_basket_terminal_reference(basket: BasketGBM, n_paths: int,
                                     n_steps: int, *, seed, stream=0,
                                     path_offset=0):
    """Plain-jnp oracle of the exact kernel math (same counters/layout),
    for bitwise interpret-mode checks and CPU execution."""
    a_n = basket.n_assets
    a_pad = _a_pad(a_n)
    (drift, scale, log_s0, weights, corr_mat, gsum, a_pad,
     groups) = _packed_constants(basket)
    k0, k1 = key_from_seed_dynamic(seed, stream)

    ids = (jnp.uint32(path_offset)
           + jnp.arange(n_paths, dtype=jnp.uint32)[:, None])
    asset = jnp.arange(a_pad, dtype=jnp.uint32)[None, :]
    n_pairs = (n_steps + 1) // 2
    log_s = jnp.broadcast_to(log_s0[0, :a_pad], (n_paths, a_pad))
    corr = corr_mat[:a_pad, :a_pad]

    def body(j, log_s):
        c1 = asset * jnp.uint32(n_pairs) + jnp.uint32(j)
        b0, b1 = threefry2x32(k0, k1, ids, c1)
        z0, z1 = boxmuller_pair(b0, b1)
        zc0 = jnp.dot(z0, corr, preferred_element_type=jnp.float32)
        log_s = log_s + drift[0, :a_pad] + scale[0, :a_pad] * zc0
        live = 2 * j + 1 < n_steps
        zc1 = jnp.dot(z1, corr, preferred_element_type=jnp.float32)
        zero = jnp.float32(0.0)
        log_s = (log_s + jnp.where(live, drift[0, :a_pad], zero)
                 + jnp.where(live, scale[0, :a_pad] * zc1, zero))
        return log_s

    log_s = jax.lax.fori_loop(0, n_pairs, body, log_s)
    return jnp.sum(weights[0, :a_pad] * jnp.exp(log_s), axis=1)
