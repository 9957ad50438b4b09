"""Pallas TPU kernels (the framework's 'native' layer — compiled through
XLA/Mosaic's C++ stack; the reference has no in-repo native code to mirror,
see SURVEY.md §2.2)."""

from montecarlo_tpu.ops.gbm_kernel import gbm_terminal_pallas  # noqa: F401
from montecarlo_tpu.ops.fused_engine import (  # noqa: F401
    fused_block_moments_pallas,
    fused_functionals_pallas,
    fused_terminal_pallas,
)
from montecarlo_tpu.ops.basket_kernel import (  # noqa: F401
    packed_basket_terminal_pallas,
)
