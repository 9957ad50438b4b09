"""Test configuration.

Forces JAX onto a *virtual 8-device CPU mesh* so every sharding / collective
test (shard_map over the path axis, deterministic cross-device merges) runs on
one host without TPU hardware.

Note: this image's sitecustomize imports jax at interpreter startup (to
register the axon TPU backend), so env vars alone are too late — the platform
must be overridden through jax.config.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Allow float64 in tests (feature-engineering parity against pandas float64).
# All library code pins dtypes explicitly, so this does not change behavior.
jax.config.update("jax_enable_x64", True)

# NO persistent compilation cache here: the suite runs on the CPU backend,
# and XLA:CPU `deserialize_executable` SIGSEGVs on large multi-device/x64
# executables on this pool's hosts — three full runs died at 80-95% inside
# `compilation_cache.get_executable_and_time` (one with zero concurrent
# load) before the cache was pulled.  `utils/compile_cache.py` (used by
# bench.py and experiments/) centralizes the policy: cache on for TPU,
# off for CPU.  The suite therefore compiles cold every run.
