"""Global + moving statistics bundle.

Contract of /root/reference/matrixprofile/algorithms/statistics.py:15-90.
In the Spark engine this bundle is what the rollup tiers materialize
(operators/rollup.py); the kernel remains for reference parity and for
in-kernel use by profile transforms.
"""

from __future__ import annotations

import numpy as np

from matrixprofile_spark.kernels.moving import (
    moving_avg_std,
    rolling_window,
)


def statistics(ts: np.ndarray, window_size: int) -> dict:
    ts = np.asarray(ts, dtype=np.float64)
    if ts.ndim != 1:
        raise ValueError("The time series must be 1D")
    if not isinstance(window_size, int):
        raise ValueError("Expecting int for window_size")
    if window_size > len(ts):
        raise ValueError("Window size cannot be greater than len(ts)")
    if window_size < 3:
        raise ValueError("Window size cannot be less than 3")
    mu, sig = moving_avg_std(ts, window_size)
    rw = rolling_window(ts, window_size)
    return {
        "ts": ts,
        "min": np.min(ts),
        "max": np.max(ts),
        "mean": np.mean(ts),
        "std": np.std(ts),
        "median": np.median(ts),
        "moving_min": np.min(rw, axis=1),
        "moving_max": np.max(rw, axis=1),
        "moving_mean": mu,
        "moving_std": sig,
        "moving_median": np.median(rw, axis=1),
        "window_size": window_size,
        "class": "Statistics",
    }
