"""TimeSeriesSplit — sklearn-compatible walk-forward CV splits.

Matches `sklearn.model_selection.TimeSeriesSplit(n_splits)` exactly
(verified against sklearn in tests): test folds are the last
``n_splits`` equal chunks of size ``n // (n_splits + 1)``; each train set is
everything before its test fold.  Used by the reference at app.py:461-467.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np


def time_series_split(n_samples: int, n_splits: int = 5
                      ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    if n_splits < 2:
        raise ValueError("n_splits must be >= 2")
    n_folds = n_splits + 1
    if n_folds > n_samples:
        raise ValueError(
            f"cannot have n_splits={n_splits} for n_samples={n_samples}")
    test_size = n_samples // n_folds
    test_starts = range(n_samples - n_splits * test_size, n_samples,
                        test_size)
    indices = np.arange(n_samples)
    for start in test_starts:
        yield indices[:start], indices[start:start + test_size]


def split_bounds(n_samples: int, n_splits: int = 5):
    """(train_end, test_end) pairs — the static-shape-friendly form used to
    build masks for a single batched (vmapped) CV compilation."""
    return [(int(tr[-1]) + 1, int(te[-1]) + 1)
            for tr, te in time_series_split(n_samples, n_splits)]
