"""Walk-forward backtesting (reference app.py:662-882 parity)."""

from montecarlo_tpu.backtest.engine import WalkForwardBacktester  # noqa: F401
from montecarlo_tpu.backtest.portfolio import backtest_tickers_batched  # noqa: F401
