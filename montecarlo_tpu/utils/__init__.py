"""Utilities: profiling/tracing hooks and timing helpers."""

from montecarlo_tpu.utils.compile_cache import (  # noqa: F401
    enable_persistent_cache,
    feature_scoped_cache_dir,
)
from montecarlo_tpu.utils.profiling import (  # noqa: F401
    Timer,
    throughput_path_steps,
    trace,
)
