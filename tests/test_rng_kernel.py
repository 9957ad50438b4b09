"""Bulk-normal Pallas kernel: bitwise parity with `normal_draw` (the
framework's draw-stream contract) in interpret mode on the CPU mesh."""

import numpy as np
import jax.numpy as jnp

from montecarlo_tpu.ops.rng_kernel import normal_matrix_pallas
from montecarlo_tpu.rng.normal import normal_draw


def _reference(seed, stream, n, c, off):
    ids = jnp.arange(off, off + n, dtype=jnp.uint32)
    cols = jnp.arange(c, dtype=jnp.uint32)
    return np.asarray(normal_draw(seed, stream, ids[None, :],
                                  cols[:, None]))


def test_bitwise_parity_aligned():
    z = np.asarray(normal_matrix_pallas(5, 2, 2048, 64, path_offset=7000,
                                        block_rows=8, interpret=True))
    np.testing.assert_array_equal(z, _reference(5, 2, 2048, 64, 7000))


def test_bitwise_parity_ragged_and_odd():
    """Odd n_cols exercises the Box-Muller half-pair guard; 37 % 64 != 0
    exercises the ragged final column chunk."""
    z = np.asarray(normal_matrix_pallas(9, 0, 1024, 37, path_offset=123,
                                        block_rows=8, interpret=True))
    assert z.shape == (37, 1024)
    np.testing.assert_array_equal(z, _reference(9, 0, 1024, 37, 123))


def test_multi_chunk_columns():
    z = np.asarray(normal_matrix_pallas(3, 1, 1024, 24, path_offset=0,
                                        block_rows=8, col_chunk=8,
                                        interpret=True))
    np.testing.assert_array_equal(z, _reference(3, 1, 1024, 24, 0))


def test_rbergomi_cpu_path_unchanged():
    """On CPU the sampler takes the XLA draw branch; determinism holds and
    path_offset keeps the shard/replay contract."""
    from montecarlo_tpu.processes.rough_bergomi import (RoughBergomi,
                                                        rbergomi_simulate)

    m = RoughBergomi.create(100.0, 0.04, 1.5, -0.7, 0.1, n_steps=16, T=0.5)
    a = np.asarray(rbergomi_simulate(m, 512, seed=3))
    b = np.asarray(rbergomi_simulate(m, 512, seed=3))
    np.testing.assert_array_equal(a, b)


def test_rbergomi_fused_tail_matches_xla_tail():
    """The fused terminal kernel (interpret mode) reproduces the XLA tail
    from the same joint matrix to accumulation-order tolerance, including
    the in-kernel perpendicular normals (draw-matrix columns 2T..3T-1)."""
    import jax

    from montecarlo_tpu.ops.rbergomi_kernel import rbergomi_terminal_pallas
    from montecarlo_tpu.processes.rough_bergomi import (RoughBergomi,
                                                        rbergomi_simulate)
    from montecarlo_tpu.rng.normal import log32, normal_draw

    T, n = 16, 1024
    m = RoughBergomi.create(100.0, 0.04, 1.5, -0.7, 0.1, n_steps=T, T=0.5)
    ids = jnp.arange(n, dtype=jnp.uint32)
    cols = jnp.arange(2 * T, dtype=jnp.uint32)
    z = normal_draw(7, 0, ids[None, :], cols[:, None], jnp.float32)
    joint = jnp.matmul(m.chol.astype(jnp.float32), z,
                       precision=jax.lax.Precision.HIGHEST)
    params = jnp.stack([
        m.xi0, m.eta, m.rho,
        jnp.sqrt(1.0 - jnp.square(m.rho)) * jnp.sqrt(m.dt),
        0.5 * m.dt, log32(m.s0), 0.5 * jnp.square(m.eta),
    ]).astype(jnp.float32)
    got = np.asarray(rbergomi_terminal_pallas(
        joint, m.t_grid ** (2.0 * m.h), params, 7, 0, n_steps=T,
        block_rows=8, interpret=True))
    want = np.asarray(rbergomi_simulate(m, n, seed=7))  # CPU: XLA tail
    np.testing.assert_allclose(got, want, rtol=3e-5)
