"""Draw providers: plain Monte Carlo, antithetic variates, Sobol QMC.

A *sampler* decides what innovations the engine feeds the process at each
step (BASELINE.json config 2).  All are drop-in: the engine calls
``sampler.draws(process, seed, stream, path_ids, t, dtype)``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class PlainSampler(NamedTuple("PlainFields", [])):
    """Process-native pseudo-random draws (counter-based Threefry)."""

    def draws(self, process, seed, stream, path_ids, t, dtype=jnp.float32):
        return process.draws(seed, stream, path_ids, t, dtype)


class AntitheticSampler(NamedTuple("AntitheticFields", [])):
    """Antithetic variates: paths (2k, 2k+1) share draws with mirrored sign.

    Path ``2k`` uses the innovations of logical pair ``k``; path ``2k+1``
    uses their mirror (``process.antithetic``, negation for symmetric
    innovations).  Keyed by the *global* pair id, so still shard-invariant.
    Use an even number of paths.
    """

    def draws(self, process, seed, stream, path_ids, t, dtype=jnp.float32):
        pair_ids = path_ids >> jnp.uint32(1)
        eps = process.draws(seed, stream, pair_ids, t, dtype)
        mirrored = process.antithetic(eps)
        odd = (path_ids & jnp.uint32(1)).astype(bool)
        return tuple(jnp.where(odd, m, e) for m, e in zip(mirrored, eps))


class SobolSampler(NamedTuple("SobolFields", [("z", jnp.ndarray)])):
    """Scrambled Sobol quasi-Monte Carlo draws.

    The low-discrepancy point set is generated host-side once (scipy's
    Joe-Kuo Sobol with Owen scrambling, seeded — deterministic), mapped to
    normals by the inverse CDF, and stored device-resident as
    ``z[(n_paths, n_steps, n_draws)]``; the engine gathers step slices by
    global path id.  QMC points are correlated across the whole path by
    construction, so unlike the PRNG they cannot be generated counter-wise
    per step.
    """

    def draws(self, process, seed, stream, path_ids, t, dtype=jnp.float32):
        step = self.z[path_ids.astype(jnp.int32), t].astype(dtype)
        return tuple(step[..., d] for d in range(self.z.shape[-1]))

    @classmethod
    def create(cls, n_paths: int, n_steps: int, n_draws: int, seed: int = 0,
               dtype=jnp.float32) -> "SobolSampler":
        from scipy.stats import qmc
        from scipy.special import ndtri

        dim = n_steps * n_draws
        eng = qmc.Sobol(d=dim, scramble=True, seed=seed)
        # Sobol balance: use the next power of two >= n_paths and truncate.
        m = max(1, int(np.ceil(np.log2(max(n_paths, 2)))))
        u = eng.random_base2(m=m)[:n_paths]
        z = ndtri(u).reshape(n_paths, n_steps, n_draws)
        return cls(z=jnp.asarray(z, dtype))
