"""Utilities: profiling/tracing hooks and timing helpers."""

from montecarlo_tpu.utils.profiling import (  # noqa: F401
    Timer,
    throughput_path_steps,
    trace,
)
