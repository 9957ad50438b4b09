"""Test configuration.

Forces JAX onto a *virtual 8-device CPU mesh* so every sharding / collective
test (shard_map over the path axis, deterministic cross-device merges) runs on
one host without TPU hardware.  Must run before `jax` is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Allow float64 in tests (feature-engineering parity against pandas float64).
# All library code pins dtypes explicitly, so this does not change behavior.
jax.config.update("jax_enable_x64", True)
