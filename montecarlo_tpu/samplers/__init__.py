"""Draw providers: plain Monte Carlo, antithetic variates, Sobol QMC.

A *sampler* decides what innovations the engine feeds the process at each
step (BASELINE.json config 2).  All are drop-in: the engine calls
``sampler.draws(process, seed, stream, path_ids, t, dtype)``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
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


def _brownian_bridge_increments(z: np.ndarray) -> np.ndarray:
    """Map (n, T) i.i.d. normals to BM increments via the bridge ordering.

    Dimension 0 sets W_T, then each next dimension fills the midpoint of the
    widest remaining interval: W_m | (W_l, W_r) with the exact conditional
    mean and variance.  Returns (n, T) increments scaled back to unit
    variance — still i.i.d. N(0,1), but with the low-index (highest-quality)
    Sobol dimensions carrying the path's coarse structure.
    """
    n, T = z.shape
    w = np.zeros((n, T + 1))
    w[:, T] = np.sqrt(float(T)) * z[:, 0]
    k = 1
    segments = [(0, T)]
    while segments:
        nxt = []
        for (l, r) in segments:
            if r - l <= 1:
                continue
            mid = (l + r) // 2
            mean = ((r - mid) * w[:, l] + (mid - l) * w[:, r]) / (r - l)
            std = np.sqrt((mid - l) * (r - mid) / (r - l))
            w[:, mid] = mean + std * z[:, k]
            k += 1
            nxt += [(l, mid), (mid, r)]
        segments = nxt
    assert k == T, (k, T)
    return np.diff(w, axis=1)  # unit-time steps -> N(0,1) increments


class SobolSampler(NamedTuple("SobolFields", [("z", jnp.ndarray)])):
    """Scrambled Sobol quasi-Monte Carlo draws.

    NORMALS ONLY: every dimension maps through the inverse CDF, so this
    sampler is valid only for processes whose draws are all standard
    normals (NormalDrawsMixin) — feeding a normal into a slot a process
    consumes as a uniform (jump counts, bootstrap indices) silently
    corrupts the distribution; the engines reject the combination.

    The point set is generated host-side once (scipy's
    Joe-Kuo Sobol with Owen scrambling, seeded — deterministic), mapped to
    normals by the inverse CDF, and stored device-resident as
    ``z[(n_paths, n_steps, n_draws)]``; the engine gathers step slices by
    global path id.  QMC points are correlated across the whole path by
    construction, so unlike the PRNG they cannot be generated counter-wise
    per step.
    """

    normals_only = True

    def draws(self, process, seed, stream, path_ids, t, dtype=jnp.float32):
        step = self.z[path_ids.astype(jnp.int32), t].astype(dtype)
        return tuple(step[..., d] for d in range(self.z.shape[-1]))

    @classmethod
    def for_process(cls, process, n_paths: int, n_steps: int, seed: int = 0,
                    dtype=jnp.float32, bridge: bool = False):
        """The one entry point callers should use: all-normal processes get
        a plain :class:`SobolSampler`; processes with uniform slots
        (``draw_kinds``) get a :class:`MixedSobolSampler` whose uniform
        dimensions stay raw QMC uniforms."""
        kinds = tuple(getattr(process, "draw_kinds",
                              ("normal",) * process.n_draws))
        if all(k == "normal" for k in kinds):
            return cls.create(n_paths, n_steps, len(kinds), seed=seed,
                              dtype=dtype, bridge=bridge)
        if bridge:
            raise ValueError("the Brownian-bridge construction reorders "
                             "NORMAL increments; this process has uniform "
                             "draw slots")
        return MixedSobolSampler.create(process, n_paths, n_steps,
                                        seed=seed, dtype=dtype)

    @classmethod
    def create(cls, n_paths: int, n_steps: int, n_draws: int, seed: int = 0,
               dtype=jnp.float32, bridge: bool = False) -> "SobolSampler":
        """``bridge=True`` applies the Brownian-bridge construction (single
        draw dimension only): the best Sobol dimensions drive the coarse
        structure of the path (endpoint, then midpoints, ...), which is
        where most of the variance of path-dependent payoffs lives — the
        standard QMC effectiveness trick for long horizons.  The increments
        remain exactly i.i.d. standard normals."""
        from scipy.stats import qmc
        from scipy.special import ndtri

        dim = n_steps * n_draws
        eng = qmc.Sobol(d=dim, scramble=True, seed=seed)
        # Sobol balance: use the next power of two >= n_paths and truncate.
        m = max(1, int(np.ceil(np.log2(max(n_paths, 2)))))
        u = eng.random_base2(m=m)[:n_paths]
        z = ndtri(u)
        if bridge:
            if n_draws != 1:
                raise ValueError("bridge construction supports n_draws=1")
            z = _brownian_bridge_increments(z)
        z = z.reshape(n_paths, n_steps, n_draws)
        return cls(z=jnp.asarray(z, dtype))


@jax.tree_util.register_pytree_node_class
class MixedSobolSampler:
    """Scrambled Sobol QMC for processes with MIXED normal/uniform draw
    slots (jump counts, subordinator/bootstrap/QE-variance uniforms).

    Each (step, slot) gets its own Sobol dimension, exactly like
    :class:`SobolSampler`; normal slots map through the inverse CDF,
    uniform slots keep the raw scrambled point (clipped to the open
    interval so downstream logs / inverse CDFs stay finite) — inverse-
    transform sampling under QMC is unbiased for ANY marginal, so jump
    counts and bootstrap indices are as valid as normals.  The slot
    layout (``kinds``) rides the pytree as static aux data; the engine
    validates it against the process's ``draw_kinds`` at trace time, so
    a table built for one process cannot silently corrupt another.
    """

    def __init__(self, z, kinds):
        self.z = z
        self.kinds = tuple(kinds)

    def tree_flatten(self):
        return (self.z,), self.kinds

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)

    def validate(self, process, n_steps: int) -> None:
        want = tuple(getattr(process, "draw_kinds",
                             ("normal",) * getattr(process, "n_draws", 0)))
        if want != self.kinds:
            raise ValueError(
                f"MixedSobolSampler slot layout {self.kinds} does not "
                f"match {type(process).__name__}.draw_kinds {want} — "
                "build the sampler with SobolSampler.for_process(process)")
        if n_steps > self.z.shape[1]:
            raise ValueError(
                f"sampler table covers {self.z.shape[1]} steps, run asks "
                f"for {n_steps} — later steps would clamp-gather and "
                "silently reuse the last dimension")

    def draws(self, process, seed, stream, path_ids, t, dtype=jnp.float32):
        step = self.z[path_ids.astype(jnp.int32), t].astype(dtype)
        return tuple(step[..., d] for d in range(len(self.kinds)))

    @classmethod
    def create(cls, process, n_paths: int, n_steps: int, seed: int = 0,
               dtype=jnp.float32) -> "MixedSobolSampler":
        from scipy.special import ndtri
        from scipy.stats import qmc

        kinds = tuple(process.draw_kinds)
        d = len(kinds)
        eng = qmc.Sobol(d=n_steps * d, scramble=True, seed=seed)
        m = max(1, int(np.ceil(np.log2(max(n_paths, 2)))))
        u = eng.random_base2(m=m)[:n_paths].reshape(n_paths, n_steps, d)
        # Open interval, matching uniform_from_bits' guarantee: inverse
        # CDFs and the normal quantile must stay finite.
        u = np.clip(u, 2.0**-24, 1.0 - 2.0**-24)
        z = np.where(np.asarray([k == "normal" for k in kinds]),
                     ndtri(u), u)
        return cls(jnp.asarray(z, dtype), kinds)
