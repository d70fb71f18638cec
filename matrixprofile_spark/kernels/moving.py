"""Moving statistics kernels (pure NumPy, vectorized).

Re-derivations of the reference's rolling-statistics operators with the
same numeric contracts:

- moving_avg_std — cumsum-based rolling mean + population std, negative
  variances clipped to 0 (behavioral contract of
  /root/reference/matrixprofile/cycore.pyx:105-155).
- muinvn — high-precision rolling mean + INVERSE std 1/sqrt(Σ(x-μ)²)
  (contract of cycore.pyx:24-100, which uses Neumaier-compensated sums).
  We achieve the required precision differently: longdouble cumsum for
  the mean and an exact windowed Σ(x-μ)² via sliding views — golden-
  tested to the same 4 decimals vs MATLAB as the reference's own test
  (tests/test_cycore.py:60-69).
- moving min/max/median and rolling_window (core.py:261-394).
"""

from __future__ import annotations

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view


def rolling_window(a: np.ndarray, w: int) -> np.ndarray:
    """Zero-copy view of all length-w subsequences (core.py:261-279)."""
    return sliding_window_view(np.ascontiguousarray(a, dtype=np.float64), w)


def moving_avg_std(a: np.ndarray, w: int) -> tuple[np.ndarray, np.ndarray]:
    """Rolling mean + population std via cumulative sums.

    Matches cycore.pyx:105-155 exactly: sig² = E[x²]−E[x]² computed in
    float64, negatives clipped to 0.
    """
    a = np.asarray(a, dtype=np.float64)
    n = a.shape[0]
    cs = np.empty(n + 1)
    cs2 = np.empty(n + 1)
    cs[0] = cs2[0] = 0.0
    np.cumsum(a, out=cs[1:])
    np.cumsum(a * a, out=cs2[1:])
    sums = cs[w:] - cs[:-w]
    sq_sums = cs2[w:] - cs2[:-w]
    mu = sums / w
    sig_sq = sq_sums / w - mu * mu
    sig = np.sqrt(np.where(sig_sq < 0, 0.0, sig_sq))
    return mu, sig


def muinvn(a: np.ndarray, w: int) -> tuple[np.ndarray, np.ndarray]:
    """High-precision rolling mean and inverse centered norm.

    Returns (mu, sig) with sig[i] = 1/sqrt(Σ_{j=i..i+w-1}(a_j − mu_i)²),
    0 where the window is constant — the quantity MPX multiplies dot
    products by (cycore.pyx:24-100). Precision strategy: 80-bit
    longdouble prefix sums for mu (≈ compensated float64), then the
    centered sum-of-squares from an explicit windowed reduction (pairwise
    float64), which is far better conditioned than the E[x²]−E[x]² form.
    """
    a = np.asarray(a, dtype=np.float64)
    n = a.shape[0]
    pl = n - w + 1
    cs = np.empty(n + 1, dtype=np.longdouble)
    cs[0] = 0.0
    np.cumsum(a.astype(np.longdouble), out=cs[1:])
    mu = np.asarray((cs[w:] - cs[:-w]) / w, dtype=np.float64)
    win = sliding_window_view(a, w)  # (pl, w) view, no copy
    # chunk to bound the (chunk, w) temporary at ~32 MB
    ssq = np.empty(pl)
    step = max(1, (4 << 20) // max(w, 1))
    for s in range(0, pl, step):
        e = min(s + step, pl)
        d = win[s:e] - mu[s:e, None]
        ssq[s:e] = np.einsum("ij,ij->i", d, d)
    with np.errstate(divide="ignore"):
        sig = np.where(ssq == 0, 0.0, 1.0 / np.sqrt(ssq))
    return mu, sig


def moving_min(a: np.ndarray, w: int) -> np.ndarray:
    """Rolling min (core.py:340-356)."""
    return np.min(rolling_window(a, w), axis=1)


def moving_max(a: np.ndarray, w: int) -> np.ndarray:
    """Rolling max (core.py:359-375)."""
    return np.max(rolling_window(a, w), axis=1)


def moving_median(a: np.ndarray, w: int) -> np.ndarray:
    """Rolling median (core.py:378-394)."""
    return np.median(rolling_window(a, w), axis=1)


def moving_average(a: np.ndarray, w: int) -> np.ndarray:
    """Rolling mean only (core.py:282-297)."""
    return moving_avg_std(a, w)[0]


def moving_std(a: np.ndarray, w: int) -> np.ndarray:
    """Rolling population std only (core.py:300-315)."""
    return moving_avg_std(a, w)[1]
