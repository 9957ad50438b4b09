"""Device-native Sobol sequence generation.

The host-precomputed `SobolSampler` materializes an (n_paths, n_steps,
n_draws) array — fine for QMC studies, impossible at pod scale.  This module
generates Sobol points **on device, per step, from the global path id**:

    point(i, dim) = XOR_{k : bit k of gray(i)} V[dim, k]

where V are Joe-Kuo direction numbers (extracted once from scipy's table at
sampler construction) and gray(i) = i ^ (i >> 1).  Construction is verified
against `scipy.stats.qmc.Sobol` bit-for-bit in tests.

Randomization is a per-dimension *digital shift* (XOR with a Threefry-derived
30-bit word, keyed by (seed, stream, dim)): unbiased randomized QMC whose
replications (over seeds) estimate the error, and the stream stays a pure
function of (seed, stream, global path id, dimension) — the framework's
shard-invariance contract.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from jax.scipy.special import ndtri

from montecarlo_tpu.rng.threefry import random_bits

BITS = 30


def direction_numbers(n_dims: int) -> np.ndarray:
    """(n_dims, 30) uint32 Joe-Kuo direction numbers via scipy's table."""
    from scipy.stats import qmc

    eng = qmc.Sobol(d=n_dims, scramble=False, bits=BITS)
    return np.asarray(eng._sv, np.uint32)


def sobol_bits(sv_rows, path_ids):
    """Raw Sobol integers in [0, 2^30) for one dimension.

    Args:
      sv_rows: (30,) uint32 direction numbers of the dimension.
      path_ids: uint32 array of point indices (any shape).
    """
    g = path_ids ^ (path_ids >> jnp.uint32(1))  # Gray code
    x = jnp.zeros_like(path_ids)
    for k in range(BITS):
        bit = (g >> jnp.uint32(k)) & jnp.uint32(1)
        x = x ^ (sv_rows[k] * bit)
    return x


class SobolDeviceSampler(NamedTuple("SobolDeviceFields", [
        ("sv", jnp.ndarray),  # (n_dims, 30) uint32 direction numbers
])):
    """Drop-in sampler generating randomized Sobol normals on device.

    Dimension of (step t, draw d) is ``t * n_draws + d``; the digital-shift
    word comes from Threefry keyed by (seed, stream, dim), so different
    seeds give independent randomizations of the same point set.
    """

    def draws(self, process, seed, stream, path_ids, t, dtype=jnp.float32):
        D = process.n_draws
        out = []
        for d in range(D):
            dim = jnp.asarray(t).astype(jnp.int32) * D + d
            rows = self.sv[dim]  # (30,)
            x = sobol_bits(rows, path_ids)
            # Digital shift: one 30-bit word per dimension.
            s0, _ = random_bits(seed, stream, dim.astype(jnp.uint32),
                                jnp.uint32(0x50B0))
            x = x ^ (s0 & jnp.uint32((1 << BITS) - 1))
            # 30-bit values fit int32 exactly (Mosaic-safe cast path too).
            u = (x.astype(jnp.int32).astype(dtype) + 0.5) * (2.0 ** -BITS)
            out.append(ndtri(u).astype(dtype))
        return tuple(out)

    @classmethod
    def create(cls, n_steps: int, n_draws: int = 1) -> "SobolDeviceSampler":
        sv = direction_numbers(n_steps * n_draws)
        return cls(sv=jnp.asarray(sv))
