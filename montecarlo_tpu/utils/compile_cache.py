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


_PROBE_CODE = """
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", {backend!r})
jax.config.update("jax_compilation_cache_dir", {d!r})
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
f = jax.jit(lambda x: x @ x + 1.0)
f(jnp.ones((64, 64))).block_until_ready()   # compile + cache WRITE
jax.clear_caches()
f(jnp.ones((64, 64))).block_until_ready()   # cache READ + deserialize
print("cache-probe-ok")
"""


def _probe_cache_safe(cache_dir: str, backend: str) -> bool:
    """Exercise the persistent cache's write AND read paths in a THROWAWAY
    subprocess ON THE BACKEND THE CACHE WILL SERVE.  On some pool hosts
    XLA executable (de)serialization SIGSEGVs outright (observed in both
    `put_executable_and_time` and `get_executable_and_time` — DEVNOTES
    "persistent compile cache") — a crash that cannot be caught
    in-process, so the probe must die in a child.  Probing a different
    backend than the one the cache serves proves nothing (a healthy-CPU /
    broken-TPU host would pass and then crash in real use), so the probe
    pins `jax_platforms` to the caller's backend and the verdict marker is
    scoped per backend.  Memoized next to the (already host-feature-scoped)
    cache dir, so the probe runs once per (host, backend).
    """
    import os
    import subprocess
    import sys

    ok_marker = f"{cache_dir}.{backend}.probe_ok"
    bad_marker = f"{cache_dir}.{backend}.probe_bad"
    if os.path.exists(ok_marker):
        return True
    if os.path.exists(bad_marker):
        return False
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             _PROBE_CODE.format(d=cache_dir, backend=backend)],
            capture_output=True, timeout=300)
        safe = r.returncode == 0 and b"cache-probe-ok" in r.stdout
    except Exception:
        safe = False
    try:
        with open(ok_marker if safe else bad_marker, "w") as f:
            f.write("")
    except OSError:
        pass
    return safe


def enable_persistent_cache(tag: str = "") -> None:
    """Point JAX at the feature-scoped cache (call before first compile).

    CPU backends get NO persistent cache: on this pool's hosts, XLA:CPU
    `deserialize_executable` SIGSEGVs on large (multi-device / x64)
    executables — three full-suite runs died at 80-95% in
    `get_executable_and_time`, including one with zero concurrent load,
    while the small-program probe passes.  A cold compile beats a dead
    process.  TPU executables (de)serialize fine and cold Mosaic compiles
    through the remote relay are expensive, so the cache stays on there,
    still behind the write+read probe.
    """
    import jax

    backend = jax.default_backend()
    if backend == "cpu":
        return
    cache_dir = feature_scoped_cache_dir(tag)
    if not _probe_cache_safe(cache_dir, backend):
        return
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


__all__ = ["enable_persistent_cache", "feature_scoped_cache_dir"]
