"""Preprocessing kernels: sequential sliding-window imputation + seeded
constant-subsequence noise.

Contracts from /root/reference/matrixprofile/preprocess.py:
- impute_missing (140-222): endpoints filled with first/last valid
  value; then a forward (or backward) pass over every window position —
  each window containing NaN/Inf fills them with mean/median/min/max of
  the window's VALID values, and later windows see earlier fills
  (sequential dependency → in-kernel loop, not a window function).
- add_noise_to_series (115-137) + is_subsequence_constant (91-112):
  uniform(0, 9e-7) noise on constant windows. The reference draws from
  the unseeded global RNG; this engine REQUIRES a seed for reproducible
  distributed runs (SURVEY.md §2.2 note).
- preprocess (225-270): impute then de-constant.
"""

from __future__ import annotations

import numpy as np

_METHODS = {"mean": np.mean, "median": np.median, "min": np.min, "max": np.max}
_DIRECTIONS = ("forward", "fwd", "f", "backward", "bwd", "b")


def is_subsequence_constant(subsequence: np.ndarray) -> bool:
    temp = np.asarray(subsequence)
    return bool(np.all(temp == temp[0]))


def add_noise_to_series(series: np.ndarray, seed: int = 0) -> np.ndarray:
    temp = np.array(series, dtype=np.float64)
    rng = np.random.RandomState(seed)
    return temp + rng.uniform(0, 0.0000009, size=len(temp))


def impute_missing(
    ts: np.ndarray, window: int, method: str = "mean", direction: str = "forward"
) -> np.ndarray:
    if method not in _METHODS:
        raise ValueError(
            "invalid imputation method! valid include options: "
            + ", ".join(_METHODS.keys())
        )
    if direction not in _DIRECTIONS:
        raise ValueError(
            "invalid imputation direction! valid include options: "
            + ", ".join(_DIRECTIONS)
        )
    if not isinstance(window, int):
        raise ValueError("window is not an integer!")
    temp = np.array(ts, dtype=np.float64)
    func = _METHODS[method]
    bad = ~np.isfinite(temp)
    if bad[0]:
        temp[0] = temp[~bad][0]
        bad = ~np.isfinite(temp)
    if bad[-1]:
        temp[-1] = temp[~bad][-1]
        bad = ~np.isfinite(temp)
    if direction.startswith("f"):
        order = range(len(temp) - window + 1)
    else:
        order = range(len(temp) - window + 1, 0, -1)
    for start in order:
        end = start + window
        sub_bad = bad[start:end]
        if sub_bad.any():
            stat = func(temp[start:end][~sub_bad])
            temp[start:end][sub_bad] = stat
            bad[start:end] = ~np.isfinite(temp[start:end])
    return temp


def preprocess(
    ts: np.ndarray,
    window: int,
    impute_method: str = "mean",
    impute_direction: str = "forward",
    add_noise: bool = True,
    seed: int = 0,
) -> np.ndarray:
    temp = impute_missing(ts, window, method=impute_method,
                          direction=impute_direction)
    if add_noise:
        for start in range(len(temp) - window + 1):
            sub = temp[start : start + window]
            if is_subsequence_constant(sub):
                # per-position derived seed keeps results deterministic
                temp[start : start + window] = add_noise_to_series(
                    sub, seed=(seed * 1_000_003 + start) & 0x7FFFFFFF
                )
    return temp
