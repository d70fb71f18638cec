"""MPDist family: whole-series distance measures (pure NumPy).

Contracts matched from /root/reference/matrixprofile/algorithms/mpdist.py:
- mpdist: AB-join profiles concatenated, k-th smallest with
  k = ceil(threshold·(len_a+len_b)) − 1 (mpdist.py:20-77)
- mass_distance_matrix (80-106), calculate_mpdist (109-142 — note its
  intentional off-by-one vs mpdist: profile_clean[dist_loc], no −1),
  mpdist_vector (145-184)
- pairwise_dist condensed-matrix ordering (pairwise_dist.py:36-101)
"""

from __future__ import annotations

import numpy as np

from matrixprofile_spark.kernels.mass import mass2
from matrixprofile_spark.kernels.moving import moving_min
from matrixprofile_spark.kernels.mpx import mpx_ab_join


def mpdist(
    ts: np.ndarray, ts_b: np.ndarray, w: int, threshold: float = 0.05
) -> float:
    """MPDist between two series (mpdist.py:20-77)."""
    ts = np.asarray(ts, dtype=np.float64)
    ts_b = np.asarray(ts_b, dtype=np.float64)
    if ts.ndim != 1 or ts_b.ndim != 1:
        raise ValueError("ts and ts_b must be one dimensional!")
    if not isinstance(threshold, float) or threshold <= 0 or threshold >= 1:
        raise ValueError(
            "threshold must be a float greater than 0 and less than 1"
        )
    mp, _, mpb, _ = mpx_ab_join(ts, ts_b, w)
    abba = np.concatenate((mp, mpb))
    abba_sorted = np.sort(abba[np.isfinite(abba)])
    if len(abba_sorted) == 0:
        return np.inf
    upper = int(np.ceil(threshold * (len(ts) + len(ts_b)))) - 1
    return float(abba_sorted[min(len(abba_sorted) - 1, upper)])


def mass_distance_matrix(ts: np.ndarray, query: np.ndarray, w: int) -> np.ndarray:
    """One MASS distance profile per query subsequence (mpdist.py:80-106)."""
    plq = len(query) - w + 1
    return np.array([np.real(mass2(ts, query[i : i + w])) for i in range(plq)])


def calculate_mpdist(profile: np.ndarray, threshold: float, data_length: int) -> float:
    """k-th order statistic pick used by mpdist_vector (mpdist.py:109-142)."""
    dist_loc = int(np.ceil(threshold * data_length))
    srt = np.sort(profile)
    clean = srt[np.isfinite(srt)]
    if len(clean) < 1:
        return np.inf
    if len(clean) >= dist_loc:
        return float(clean[dist_loc])
    return float(np.max(clean))


def mpdist_vector(ts: np.ndarray, ts_b: np.ndarray, w: int) -> np.ndarray:
    """Sliding MPDist of ts_b against every offset of ts (mpdist.py:145-184)."""
    matrix = mass_distance_matrix(ts, ts_b, w)
    rows = matrix.shape[0]
    all_right_hist = matrix.min(axis=0)
    mass_minimums = np.array([moving_min(row, rows) for row in matrix])
    mpdist_length = len(ts) - len(ts_b) + 1
    right_hist_length = len(ts_b) - w + 1
    out = np.empty(mpdist_length)
    for i in range(mpdist_length):
        right_hist = all_right_hist[i : right_hist_length + i]
        left_hist = mass_minimums[:, i]
        prof = np.concatenate((left_hist, right_hist))
        out[i] = calculate_mpdist(prof, 0.05, 2 * len(ts_b))
    return out


def pairwise_dist(
    X: list[np.ndarray], window_size: int, threshold: float = 0.05
) -> np.ndarray:
    """Condensed pairwise MPDist matrix in scipy pdist ordering
    (pairwise_dist.py:36-101): entry k corresponds to pair (i, j), i<j,
    enumerated row-major."""
    m = len(X)
    out = np.empty(m * (m - 1) // 2)
    k = 0
    for i in range(m - 1):
        for j in range(i + 1, m):
            out[k] = mpdist(X[i], X[j], window_size, threshold)
            k += 1
    return out
