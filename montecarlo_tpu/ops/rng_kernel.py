"""Bulk counter-based normal generation as a Pallas TPU kernel.

Samplers that need a *materialized* draw matrix (rough Bergomi's Volterra
factor matmul consumes (paths, 3T) normals at once) cannot ride the fused
per-step kernels — and XLA-level `normal_draw` generation measured ~0.10
ns/draw on v5e, 3x the Pallas kernels' per-draw budget
(`experiments/rbergomi_bench.py` ablations).  This kernel fills the matrix
at kernel speed with the SAME draw stream: entry (path i, column m) is
component ``m & 1`` of the Box–Muller pair for counter ``(i, m >> 1)``,
bitwise identical to ``rng.normal.normal_draw`` (tested).

Output layout is ``(n_cols, n_paths)`` — column-major in the draw index —
so each Box–Muller pair writes two contiguous (rows, 128) slabs and the
downstream factor contraction runs as ``chol @ Z`` without any transpose.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from montecarlo_tpu.ops.gbm_kernel import LANES, _block_path_ids
from montecarlo_tpu.rng.normal import boxmuller_pair
from montecarlo_tpu.rng.threefry import key_from_seed_dynamic, threefry2x32


def _normal_matrix_kernel(scalar_ref, out_ref, *, n_cols: int,
                          col_chunk: int, block_rows: int):
    b = pl.program_id(0)
    c = pl.program_id(1)
    ids = _block_path_ids(b, block_rows, scalar_ref[0, 0])
    k0 = scalar_ref[0, 1].astype(jnp.uint32)
    k1 = scalar_ref[0, 2].astype(jnp.uint32)
    pair0 = c * (col_chunk // 2)

    # Unrolled at trace time: col_chunk/2 cipher calls on full
    # (block_rows, 128) tiles — the same vector shapes as the fused path
    # kernels — each writing two contiguous column slabs.  Stores are
    # guarded only when a ragged final chunk exists (n_cols not a multiple
    # of col_chunk); the aligned case stays branch-free.
    ragged = n_cols % col_chunk != 0
    for jl in range(col_chunk // 2):
        j = (pair0 + jl).astype(jnp.uint32)
        z0, z1 = boxmuller_pair(*threefry2x32(k0, k1, ids, j))
        col = 2 * pair0 + 2 * jl

        if ragged:
            @pl.when(col < n_cols)
            def _(z0=z0, jl=jl):
                out_ref[2 * jl] = z0

            @pl.when(col + 1 < n_cols)
            def _(z1=z1, jl=jl):
                out_ref[2 * jl + 1] = z1
        else:
            out_ref[2 * jl] = z0
            out_ref[2 * jl + 1] = z1


@functools.partial(jax.jit, static_argnames=("n_paths", "n_cols",
                                             "block_rows", "col_chunk",
                                             "interpret"))
def normal_matrix_pallas(seed, stream, n_paths: int, n_cols: int, *,
                         path_offset=0, block_rows: int = 128,
                         col_chunk: int = 64, interpret: bool = False):
    """(n_cols, n_paths) float32 standard normals, `normal_draw` stream.

    ``normal_matrix_pallas(...)[m, i] == normal_draw(seed, stream,
    path_offset + i, m)`` bitwise.  The grid is 2-D (path blocks x column
    chunks) so each kernel invocation works on full (block_rows, 128)
    tiles — (cols, rows, 128) output blocks of
    ``col_chunk * block_rows * 512`` bytes VMEM (4 MB at the defaults).
    """
    block = block_rows * LANES
    if n_paths % block != 0:
        raise ValueError(f"n_paths={n_paths} must be a multiple of "
                         f"block_rows*128={block}")
    if col_chunk % 2:
        raise ValueError("col_chunk must be even (Box-Muller pairs)")
    num_blocks = n_paths // block
    num_chunks = -(-n_cols // col_chunk)
    pad_cols = num_chunks * col_chunk
    k0, k1 = key_from_seed_dynamic(seed, stream)
    scalars = jnp.stack([
        jnp.asarray(path_offset).astype(jnp.int32),
        k0.astype(jnp.int32),
        k1.astype(jnp.int32),
    ]).reshape(1, 3)

    kernel = functools.partial(_normal_matrix_kernel, n_cols=n_cols,
                               col_chunk=col_chunk, block_rows=block_rows)
    out = pl.pallas_call(
        kernel,
        grid=(num_blocks, num_chunks),
        in_specs=[pl.BlockSpec((1, 3), lambda i, c: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((col_chunk, block_rows, LANES),
                               lambda i, c: (c, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (pad_cols, num_blocks * block_rows, LANES), jnp.float32),
        interpret=interpret,
    )(scalars)
    return out.reshape(pad_cols, n_paths)[:n_cols]


__all__ = ["normal_matrix_pallas"]
