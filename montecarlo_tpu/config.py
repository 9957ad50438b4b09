"""Configuration dataclasses.

Capability parity with the reference config system (reference app.py:22-50):
``TradingConfig`` (initial capital, commission, slippage, position sizing) and
``ModelConfig`` with the ``fast`` / ``balanced`` / ``full`` presets that the
reference's scanner "reliability mode" slider maps to (app.py:1303-1322).

Unlike the reference these are *frozen* dataclasses: hashable, so they can be
passed as static arguments to ``jax.jit``-compiled functions.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass


@dataclass(frozen=True)
class TradingConfig:
    """Backtest trading costs and sizing (reference app.py:22-27)."""

    initial_capital: float = 100_000.0
    commission_pct: float = 0.001   # 0.1% per trade
    slippage_pct: float = 0.0005    # 0.05% slippage
    max_position_pct: float = 0.10  # max 10% of portfolio per trade


@dataclass(frozen=True)
class ModelConfig:
    """Forecast-model hyperparameters and presets (reference app.py:29-50)."""

    n_estimators: int = 100
    max_depth: int = 3
    learning_rate: float = 0.05
    cv_folds: int = 5
    min_data_points: int = 504  # two trading years

    @classmethod
    def fast(cls) -> "ModelConfig":
        """Quick scans — less reliable but functional (app.py:37-40)."""
        return cls(n_estimators=50, cv_folds=3, min_data_points=252)

    @classmethod
    def balanced(cls) -> "ModelConfig":
        """Balanced speed/accuracy (app.py:42-45)."""
        return cls(n_estimators=75, cv_folds=4, min_data_points=378)

    @classmethod
    def full(cls) -> "ModelConfig":
        """Most reliable, the defaults (app.py:47-50)."""
        return cls(n_estimators=100, cv_folds=5, min_data_points=504)

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


#: Reliability presets as the reference scanner exposes them
#: (app.py:1303-1322): preset name -> (ModelConfig, data period).
RELIABILITY_MODES = {
    "fast": (ModelConfig.fast(), "2y"),
    "balanced": (ModelConfig.balanced(), "3y"),
    "full": (ModelConfig.full(), "5y"),
}
