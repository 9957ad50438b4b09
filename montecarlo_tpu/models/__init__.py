"""Model families — alias namespace.

The stochastic *market models* live in :mod:`montecarlo_tpu.processes`
(GBM, GARCH-bootstrap, correlated baskets, Heston) and the *forecasting
model* in :mod:`montecarlo_tpu.ml`; this package re-exports both so the
conventional `models/` entry point resolves.
"""

from montecarlo_tpu.processes import (  # noqa: F401
    BasketGBM,
    CCCGarch,
    GARCHBootstrap,
    GARCHParams,
    GBM,
    Heston,
    Merton,
    MultiGBM,
    fit_garch,
)
from montecarlo_tpu.ml import ForecastModel, GBTConfig, GBTModel  # noqa: F401
