"""Pallas TPU kernels (the framework's 'native' layer — compiled through
XLA/Mosaic's C++ stack; the reference has no in-repo native code to mirror,
see SURVEY.md §2.2)."""

from montecarlo_tpu.ops.gbm_kernel import gbm_terminal_pallas  # noqa: F401
from montecarlo_tpu.ops.fused_engine import fused_terminal_pallas  # noqa: F401
