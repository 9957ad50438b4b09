"""Device-mesh construction helpers.

The framework's parallelism is data parallelism over *paths* (the TPU-native
analog of the reference's NumPy vectorization over `n_sims`, reference
app.py:612-633) with an optional second axis over *assets* for baskets.
Multi-slice (DCN) scaling is just a longer ``paths`` axis — the collectives
below are all simple reductions/gathers that ride ICI within a slice.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

#: Canonical mesh-axis names.
PATHS_AXIS = "paths"
ASSETS_AXIS = "assets"


def make_mesh(n_path_shards: int | None = None, n_asset_shards: int = 1,
              devices=None) -> Mesh:
    """Build a 1- or 2-D mesh: (paths[, assets]).

    Defaults to all addressable devices on the paths axis.
    """
    if devices is None:
        devices = jax.devices()
    if n_asset_shards < 1 or n_asset_shards > len(devices):
        raise ValueError(
            f"n_asset_shards={n_asset_shards} must be in "
            f"[1, {len(devices)}] (available devices)")
    if n_path_shards is None:
        if len(devices) % n_asset_shards:
            # Silent floor division would idle devices (and 0 path shards
            # would build an empty mesh that fails obscurely downstream).
            raise ValueError(
                f"{len(devices)} devices do not split evenly into "
                f"n_asset_shards={n_asset_shards}; pass n_path_shards "
                "explicitly to use a subset")
        n_path_shards = len(devices) // n_asset_shards
    if n_path_shards < 1:
        raise ValueError(f"n_path_shards={n_path_shards} must be >= 1")
    n = n_path_shards * n_asset_shards
    if n > len(devices):
        raise ValueError(
            f"mesh needs {n} devices, only {len(devices)} available"
        )
    dev_array = np.asarray(devices[:n]).reshape(n_path_shards, n_asset_shards)
    if n_asset_shards == 1:
        return Mesh(dev_array[:, 0], (PATHS_AXIS,))
    return Mesh(dev_array, (PATHS_AXIS, ASSETS_AXIS))
