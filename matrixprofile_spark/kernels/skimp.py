"""SKIMP pan-matrix-profile, BFS window scheduling, window search.

Contracts matched from /root/reference/matrixprofile/algorithms/skimp.py:
- binary_split (46-94): BFS ordering of 0..n-1
- skimp (97-243): one MPX per window, BFS order, window reuse from a
  prior PMP, sample_pct prefix of the BFS order
- maximum_subsequence (246-384): doubling search on max Pearson corr ≥
  threshold, then stepwise refinement; NoSolutionPossible when nothing
  meets the threshold
and utils.py:45-100 (pick_mp, ez floor(w/4)).
"""

from __future__ import annotations

import math

import numpy as np

from matrixprofile_spark.kernels.mpx import mpx_self_join


class NoSolutionPossible(Exception):
    """Mirror of matrixprofile.exceptions.NoSolutionPossible."""


def binary_split(n: int) -> list[int]:
    """BFS ordering of indices 0..n-1 (skimp.py:46-94)."""
    if n < 2:
        return [0]
    index = [0]
    intervals = [(1, n - 1)]
    while intervals:
        lo, hi = intervals.pop(0)
        mid = int(math.floor((lo + hi) / 2))
        index.append(mid)
        if lo == hi:
            continue
        if lo != mid:
            intervals.append((lo, mid - 1))
        if hi != mid:
            intervals.append((mid + 1, hi))
    return index


def skimp(
    ts: np.ndarray,
    windows=None,
    cross_correlation: bool = False,
    pmp_obj: dict | None = None,
    sample_pct: float = 1.0,
) -> dict:
    """Pan matrix profile: one MPX row per window (skimp.py:97-243).

    The PMP matrix is width len(ts); rows are padded with +inf / -1 past
    each window's profile length.
    """
    ts = np.asarray(ts, dtype=np.float64)
    n = len(ts)
    if windows is None:
        windows = range(8, int(math.floor(n / 2)) + 1)
    windows = list(windows)
    if not isinstance(cross_correlation, bool):
        raise ValueError("cross_correlation must be a boolean!")
    if not isinstance(sample_pct, (int, float)) or sample_pct > 1 or sample_pct < 0:
        raise ValueError("sample_pct must be a decimal between 0 and 1")

    split_index = binary_split(len(windows))
    pmp = np.full((len(split_index), n), np.inf)
    pmpi = np.full((len(split_index), n), -1, dtype=np.int64)

    last_index = len(split_index)
    if sample_pct < 1:
        last_index = min(int(np.floor(len(split_index) * sample_pct)),
                         len(split_index))

    for i in range(last_index):
        w = windows[split_index[i]]
        if isinstance(pmp_obj, dict):
            cw = np.asarray(pmp_obj.get("windows"))
            hit = np.argwhere(cw == w)
            if len(hit) == 1:
                pmp[split_index[i], :] = pmp_obj["pmp"][hit[0][0], :]
                reused = np.asarray(pmp_obj["pmpi"][hit[0][0], :], dtype="d")
                pmpi[split_index[i], :] = np.where(
                    np.isfinite(reused), reused, -1
                ).astype(np.int64)
                continue
        mp, pi = mpx_self_join(ts, w, cross_correlation=cross_correlation)
        pmp[split_index[i], : len(mp)] = mp
        pmpi[split_index[i], : len(pi)] = pi

    return {
        "pmp": pmp,
        "pmpi": pmpi,
        "data": {"ts": ts},
        "windows": np.array(windows),
        "sample_pct": sample_pct,
        "metric": "pearson" if cross_correlation else "euclidean",
        "algorithm": "skimp",
        "class": "PMP",
    }


def maximum_subsequence(
    ts: np.ndarray,
    threshold: float = 0.95,
    refine_stepsize: float = 0.05,
    include_pmp: bool = False,
    lower_window: int = 8,
):
    """Doubling + refine search for the largest window whose best Pearson
    correlation stays ≥ threshold (skimp.py:246-384)."""
    ts = np.asarray(ts, dtype=np.float64)
    n = len(ts)
    windows = []
    pearson = []
    pmp, pmpi = [], []
    max_window = int(np.floor(n / 2))
    window_size = lower_window

    def run(w):
        mp, pi = mpx_self_join(ts, w, cross_correlation=True)
        corr = np.max(mp[~np.isinf(mp)])
        if include_pmp:
            euc = np.sqrt(2 * w * (1 - np.minimum(mp, 1.0)))
            euc[np.isinf(mp)] = np.inf
            pmp.append(np.concatenate((euc, np.full(n - len(euc), np.inf))))
            pmpi.append(np.concatenate((pi.astype("d"), np.full(n - len(pi), np.nan))))
        return corr

    while window_size <= max_window:
        corr = run(window_size)
        windows.append(window_size)
        pearson.append(corr)
        if corr < threshold:
            break
        window_size *= 2

    windows = np.array(windows, dtype=np.int64)
    pearson = np.array(pearson)
    mask = pearson > threshold
    windows_kept = windows[mask]
    if len(windows_kept) < 1:
        raise NoSolutionPossible(
            "Given the threshold {:.2f}, no window was found. Please try "
            "increasing your threshold.".format(threshold)
        )
    if include_pmp:
        pmp = [p for p, m in zip(pmp, mask) if m]
        pmpi = [p for p, m in zip(pmpi, mask) if m]
    windows = list(windows_kept)
    pearson = list(pearson[mask])
    window_size = windows[-1]

    test_windows = np.arange(refine_stepsize, 1, step=refine_stepsize) + 1
    test_windows = np.append(test_windows, 2)
    test_windows = np.floor(test_windows * window_size).astype("int")
    test_windows[test_windows % 2 == 1] += 1

    for window_size in test_windows:
        corr = run(int(window_size))
        windows.append(int(window_size))
        pearson.append(corr)
        if corr < threshold:
            break

    if include_pmp:
        return {
            "upper_window": int(window_size),
            "windows": np.array(windows),
            "pmp": np.vstack(pmp),
            "pmpi": np.vstack(pmpi),
        }
    return int(window_size)


def pick_mp(profile: dict, window: int) -> dict:
    """Extract one window's MP from a PMP (utils.py:45-100)."""
    if profile.get("class") != "PMP":
        raise ValueError("pluck_mp expects profile as a PMP data structure!")
    if not isinstance(window, int):
        raise ValueError("pluck_mp expects window to be an int!")
    windows = profile.get("windows")
    hit = np.argwhere(windows == window).flatten()
    if len(hit) < 1:
        raise RuntimeError(f"Unable to find window {window} in the provided PMP!")
    wi = hit[0]
    mp = profile["pmp"][wi]
    n = len(mp)
    return {
        "mp": mp[: n - window + 1],
        "pi": profile["pmpi"][wi][: n - window + 1],
        "rmp": None, "rpi": None, "lmp": None, "lpi": None,
        "metric": profile["metric"],
        "w": int(window),
        "ez": int(np.floor(windows[wi] / 4)),
        "join": False,
        "sample_pct": profile.get("sample_pct", 1),
        "data": {"ts": profile["data"]["ts"], "query": None},
        "class": "MatrixProfile",
        "algorithm": "mpx",
    }
