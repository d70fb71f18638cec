"""Sliding dot products and MASS distance profiles (pure NumPy).

Contracts matched (not copied) from the reference:
- fft_convolve / sliding_dot_product: core.py:397-444
- distance_profile: core.py:447-478
- mass2 with constant-subsequence fixups: algorithms/mass2.py:14-96
- exclusion zone application: core.py:580-587
"""

from __future__ import annotations

import numpy as np

from matrixprofile_spark.kernels.moving import moving_avg_std


def fft_convolve(ts: np.ndarray, query: np.ndarray) -> np.ndarray:
    """Sliding dot product of query against every window of ts via FFT.

    Output[i] = Σ_j ts[i+j]·query[j], length n-m+1 (core.py:397-420).
    Uses rfft (real input) — same values, half the work of the
    reference's complex fft.
    """
    ts = np.asarray(ts, dtype=np.float64)
    query = np.asarray(query, dtype=np.float64)
    n, m = len(ts), len(query)
    X = np.fft.rfft(ts)
    Y = np.fft.rfft(np.concatenate((query[::-1], np.zeros(n - m))))
    z = np.fft.irfft(X * Y, n)
    return z[m - 1 : n]


def sliding_dot_product(ts: np.ndarray, query: np.ndarray) -> np.ndarray:
    """Direct-convolution variant (core.py:423-444)."""
    ts = np.asarray(ts, dtype=np.float64)
    query = np.asarray(query, dtype=np.float64)
    m, n = len(query), len(ts)
    dp = np.convolve(ts, query[::-1], mode="full")
    return np.real(dp[m - 1 : n])


def distance_profile(
    prod: np.ndarray,
    w: int,
    data_mu: np.ndarray,
    data_sig: np.ndarray,
    query_mu: float,
    query_sig: float,
) -> np.ndarray:
    """z-normalized Euclidean distance from dot products + moving stats.

    d = sqrt(2(w − (qt − w·μ_q·μ_t)/(σ_q·σ_t))) — core.py:447-478.

    Deliberate deviation from the reference: fp cancellation can push the
    squared distance a few ulp below zero for (near-)identical windows;
    the reference's sqrt then yields nan and the candidate is silently
    SKIPPED (profile value becomes fp-noise-dependent). We clamp to 0 —
    an exact-duplicate window has distance 0 by definition.
    """
    dp = 2 * (w - (prod - w * data_mu * query_mu) / (data_sig * query_sig))
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.sqrt(np.maximum(np.real(dp), 0.0))


def apply_exclusion_zone(
    exclusion_zone: int,
    is_join: bool,
    window_size: int,
    data_length: int,
    index: int,
    dist: np.ndarray,
) -> np.ndarray:
    """Mask the trivial-match zone around `index` with +inf (core.py:580-587)."""
    if exclusion_zone > 0 and not is_join:
        s = max(0, index - exclusion_zone)
        e = min(data_length - window_size + 1, index + exclusion_zone + 1)
        dist[s:e] = np.inf
    return dist


def mass2(ts: np.ndarray, query: np.ndarray, threshold: float = 1e-10) -> np.ndarray:
    """MASS: full distance profile of one query vs a series.

    Fixups for (near-)constant subsequences per mass2.py:76-84:
    σ_x < threshold → dist = m; both σ < threshold → dist = 0.
    """
    ts = np.asarray(ts, dtype=np.float64)
    query = np.asarray(query, dtype=np.float64)
    n, m = len(ts), len(query)
    meany = np.mean(query)
    sigmay = np.std(query)
    meanx, sigmax = moving_avg_std(ts, m)
    z = fft_convolve(ts, query)
    denom = sigmax * sigmay
    denom = np.where(denom == 0, 1e-12, denom)
    dist = 2 * (m - (z - m * meanx * meany) / denom)
    dist[sigmax < threshold] = m
    if sigmay < threshold:
        dist[sigmax < threshold] = 0
    # the reference pipeline is complex end-to-end (mass2.py:69-84):
    # sqrt(negative) yields an imaginary value whose REAL part (~0) is
    # what consumers read — NOT NaN. Reproduce via complex sqrt.
    return np.sqrt(dist.astype(np.complex128))
