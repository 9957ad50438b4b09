"""The stochastic-process protocol.

A *process* is an immutable pytree (NamedTuple of jnp leaves) with pure
methods, so it can be closed over or passed through `jit` / `shard_map` /
`vmap` freely:

- ``n_draws``            — (static) innovations consumed per path per step
- ``init_state(path_ids, dtype)``   — state pytree for a block of paths
- ``draws(seed, stream, path_ids, t, dtype)`` — the innovations for step
  ``t`` (standard normals by default; the GARCH bootstrap overrides this
  with resampled historical shocks)
- ``step(state, eps, t)`` — one time-step of the SDE / recurrence
- ``prices(state)``       — current prices for observation
- ``antithetic(eps)``     — mirror an innovation block (for the antithetic
  sampler); default is negation, correct for symmetric innovations

Time stays *sequential* — a `lax.scan` (or an on-chip loop in the Pallas
fast path); parallelism comes from the path (and asset) axes, mirroring the
reference's NumPy vectorization over `n_sims` (reference app.py:612-633).
"""

from __future__ import annotations

import jax.numpy as jnp

from montecarlo_tpu.rng.normal import normal_matrix


class NormalDrawsMixin:
    """Default innovation source: i.i.d. standard normals, counter-keyed by
    (global path id, t * n_draws + d) so streams are shard-invariant."""

    def draws(self, seed: int, stream: int, path_ids, t, dtype=jnp.float32):
        return normal_matrix(seed, stream, path_ids, t, self.n_draws, dtype)

    def antithetic(self, eps):
        return -eps
