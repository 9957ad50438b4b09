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

# Persistent compilation cache — most test wall-clock is XLA compiles.
# Feature-scoped AND probed: on some pool hosts XLA's CPU executable
# (de)serialization SIGSEGVs, killing the suite mid-run; the helper
# exercises write+read in a throwaway subprocess and disables the cache
# where it would crash (DEVNOTES "persistent compile cache").  Loaded by
# file path so conftest does not import the whole package before the
# platform/x64 config above takes effect elsewhere.
import importlib.util as _ilu

_spec = _ilu.spec_from_file_location(
    "_mc_compile_cache",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "montecarlo_tpu", "utils", "compile_cache.py"))
_mod = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
_mod.enable_persistent_cache()
