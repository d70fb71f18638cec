"""Annotation vectors and corrected matrix profile.

Contracts from /root/reference/matrixprofile/transform.py:
- apply_av (15-87): cmp = mp + (1 − av)·max(mp)
- make_default_av (90-128), make_complexity_av (131-179, min-max scaled
  by the reference's asymmetric (av−min)/max formula), make_meanstd_av
  (182-227), make_clipping_av (230-285)
"""

from __future__ import annotations

import numpy as np

from matrixprofile_spark.kernels.moving import moving_std, rolling_window


def make_default_av(ts: np.ndarray, window: int) -> np.ndarray:
    ts = np.asarray(ts, dtype=np.float64)
    if ts.ndim != 1:
        raise ValueError("make_default_av expects ts to be one-dimensional")
    if not isinstance(window, int):
        raise ValueError("make_default_av expects window to be an integer")
    return np.ones(len(ts) - window + 1)


def make_complexity_av(ts: np.ndarray, window: int) -> np.ndarray:
    ts = np.asarray(ts, dtype=np.float64)
    if ts.ndim != 1:
        raise ValueError("make_complexity_av expects ts to be one-dimensional")
    if not isinstance(window, int):
        raise ValueError("make_complexity_av expects window to be an integer")
    # sqrt of windowed sum of squared diffs, vectorized via cumsum
    d2 = np.diff(ts) ** 2
    cs = np.concatenate(([0.0], np.cumsum(d2)))
    av = np.sqrt(cs[window - 1 :] - cs[: len(ts) - window + 1])
    max_val, min_val = np.max(av), np.min(av)
    if max_val == 0:
        return np.zeros(len(av))
    # reference quirk: scales by (x - min)/max, not (x - min)/(max - min)
    return (av - min_val) / max_val


def make_meanstd_av(ts: np.ndarray, window: int) -> np.ndarray:
    ts = np.asarray(ts, dtype=np.float64)
    if ts.ndim != 1:
        raise ValueError("make_meanstd_av expects ts to be one-dimensional")
    if not isinstance(window, int):
        raise ValueError("make_meanstd_av expects window to be an integer")
    std = moving_std(ts, window)
    return (std < np.mean(std)).astype(np.float64)


def make_clipping_av(ts: np.ndarray, window: int) -> np.ndarray:
    ts = np.asarray(ts, dtype=np.float64)
    if ts.ndim != 1:
        raise ValueError("make_clipping_av expects ts to be one-dimensional")
    if not isinstance(window, int):
        raise ValueError("make_clipping_av expects window to be an integer")
    clipped = (ts == np.max(ts)) | (ts == np.min(ts))
    av = np.sum(rolling_window(clipped.astype(np.float64), window), axis=1)
    av -= np.min(av)
    max_val = np.max(av)
    if max_val == 0:
        return np.zeros(len(av))
    return 1 - av / max_val


_AV_MAKERS = {
    "default": make_default_av,
    "complexity": make_complexity_av,
    "meanstd": make_meanstd_av,
    "clipping": make_clipping_av,
}


def apply_av(profile: dict, av: str = "default", custom_av=None) -> dict:
    """Corrected MP: cmp = mp + (1 − av)·max(mp) (transform.py:15-87)."""
    if profile.get("class") != "MatrixProfile":
        raise ValueError("apply_av expects profile as an MP data structure")
    if av == "custom":
        if custom_av is None or not hasattr(custom_av, "__len__"):
            raise ValueError("apply_av expects custom_av to be array-like")
        temp_av = np.asarray(custom_av, dtype=np.float64)
    elif av in _AV_MAKERS:
        temp_av = _AV_MAKERS[av](profile["data"]["ts"], profile["w"])
    else:
        raise ValueError("av parameter is invalid")
    if len(temp_av) != len(profile["mp"]):
        raise ValueError("Lengths of annotation vector and mp are different")
    if (temp_av < 0.0).any() or (temp_av > 1.0).any():
        raise ValueError("Annotation vector values must be between 0 and 1")
    max_val = np.max(profile["mp"])
    profile["cmp"] = profile["mp"] + (1 - temp_av) * max_val
    profile["av"] = temp_av
    profile["av_type"] = av
    return profile
