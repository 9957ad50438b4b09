"""Feature-scoped persistent-compilation-cache helper.

XLA's persistent cache stores CPU AOT executables that bake in the COMPILE
machine's vector features; loading one on a host with different features
can SIGSEGV (observed when this workspace migrates across pool
microarchitectures — the loader warns "Machine type used for XLA:CPU
compilation doesn't match the machine type for execution" right before the
crash).  Scoping the cache directory by jaxlib version + host CPU flags
makes a migrated workspace start a fresh cache instead of deserializing a
foreign executable.
"""

from __future__ import annotations

import hashlib


def feature_scoped_cache_dir(tag: str = "") -> str:
    """A /tmp cache path unique to (jaxlib version, host CPU flags[, tag])."""
    import jaxlib

    key = jaxlib.__version__ + tag
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    key += line
                    break
    except OSError:
        pass
    suffix = hashlib.sha1(key.encode()).hexdigest()[:10]
    return f"/tmp/jax_cache_mctpu_{suffix}"


def enable_persistent_cache(tag: str = "") -> None:
    """Point JAX at the feature-scoped cache (call before first compile)."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      feature_scoped_cache_dir(tag))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


__all__ = ["enable_persistent_cache", "feature_scoped_cache_dir"]
