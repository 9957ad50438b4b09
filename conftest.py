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
# The dir is scoped by jaxlib version + host CPU flags: XLA's CPU AOT
# executables bake in the compile machine's vector features, and loading
# one on a host with different features can SIGSEGV (observed when the
# pool migrates this workspace across microarchitectures — the loader
# warns "machine type ... doesn't match" right before the crash).


def _cache_dir() -> str:
    import hashlib

    import jaxlib

    tag = jaxlib.__version__
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    tag += line
                    break
    except OSError:
        pass
    return "/tmp/jax_cache_mctpu_" + hashlib.sha1(
        tag.encode()).hexdigest()[:10]


jax.config.update("jax_compilation_cache_dir", _cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
