"""Kernel-level compute/analyze workflow dispatch (reference parity).

Mirrors /root/reference/matrixprofile/compute.py:29-145 and
analyze.py:25-272 over the engine's dict structures — the same dispatch
rules the Spark facade (plans/compute.py) applies to DataFrames:

- no windows + threshold → maximum_subsequence + SKIMP PMP
- multiple windows → SKIMP PMP (sample_pct forced to 1, query ignored)
- one window, sample_pct ≥ 1 → exact MPX
- one window, sample_pct < 1 → SCRIMP++
- analyze = compute + top-3 motifs + top-3 discords (no plotting)
"""

from __future__ import annotations

import numpy as np

from matrixprofile_spark.kernels import discover as D
from matrixprofile_spark.kernels.mpx import mpx_ab_join, mpx_self_join
from matrixprofile_spark.kernels.preprocess import preprocess
from matrixprofile_spark.kernels.scrimp import scrimp_plus_plus
from matrixprofile_spark.kernels.skimp import maximum_subsequence, skimp


def mpx_profile(ts, w, query=None, cross_correlation=False) -> dict:
    """MatrixProfile dict for MPX (mpx.py:82-100 shape, incl. the ez
    quirk: self-join reports ez=0, AB-join reports ceil(w/4))."""
    ts = np.asarray(ts, dtype=np.float64)
    is_join = query is not None and len(np.asarray(query)) > 0
    if is_join:
        query = np.asarray(query, dtype=np.float64)
        mp, mpi, mpb, mpib = mpx_ab_join(ts, query, w, cross_correlation)
    else:
        mp, mpi = mpx_self_join(ts, w, cross_correlation)
    return {
        "mp": mp, "pi": mpi,
        "rmp": None, "rpi": None, "lmp": None, "lpi": None,
        "metric": "cross_correlation" if cross_correlation else "euclidean",
        "w": w,
        "ez": int(np.ceil(w / 4.0)) if is_join else 0,
        "join": is_join,
        "sample_pct": 1,
        "data": {"ts": ts, "query": query if is_join else None},
        "class": "MatrixProfile",
        "algorithm": "mpx",
    }


def motifs(profile: dict, exclusion_zone=None, k=3, max_neighbors=10,
           radius=3, use_cmp=False) -> dict:
    """MP/PMP dispatch (top_k_motifs.py:317-393)."""
    cls = profile.get("class")
    if cls == "PMP":
        return D.pmp_top_k_motifs(profile, exclusion_zone=exclusion_zone,
                                  k=k, max_neighbors=max_neighbors, radius=radius)
    if cls != "MatrixProfile":
        raise ValueError("Expecting MP or PMP data structure!")
    mp = profile["cmp"] if use_cmp else profile["mp"]
    ez = exclusion_zone if exclusion_zone is not None else profile.get("ez")
    profile["motifs"] = D.top_k_motifs(
        profile["data"]["ts"], mp, profile["pi"], profile["w"],
        ez=ez, k=k, max_neighbors=max_neighbors, radius=radius,
    )
    return profile


def discords(profile: dict, exclusion_zone=None, k=3) -> dict:
    """MP/PMP dispatch (top_k_discords.py:158-201)."""
    cls = profile.get("class")
    if cls == "PMP":
        return D.pmp_top_k_discords(profile, exclusion_zone=exclusion_zone, k=k)
    if cls != "MatrixProfile":
        raise ValueError("Expecting MP or PMP data structure!")
    ez = exclusion_zone if exclusion_zone is not None else profile.get("ez")
    profile["discords"] = D.top_k_discords(profile["mp"], profile["w"], ez=ez, k=k)
    return profile


def compute(ts, windows=None, query=None, sample_pct=1.0, threshold=0.98,
            preprocessing_kwargs=None, seed: int = 0):
    """Dispatcher (compute.py:29-145 contract)."""
    ts = np.asarray(ts, dtype=np.float64)
    multiple_windows = hasattr(windows, "__len__") and len(windows) > 1
    no_windows = windows is None
    has_threshold = isinstance(threshold, float)

    if no_windows and not has_threshold:
        raise ValueError("compute requires a threshold or window(s) to be set!")
    if (isinstance(windows, int) and windows < 4) or (
        multiple_windows and np.any(np.unique(windows) < 4)
    ):
        raise ValueError("Compute requires all window sizes to be greater than 3!")
    if hasattr(windows, "__len__") and len(windows) == 1:
        windows = windows[0]

    if preprocessing_kwargs:
        ts = preprocess(
            ts,
            window=preprocessing_kwargs.get("window", 4),
            impute_method=preprocessing_kwargs.get("impute_method", "mean"),
            impute_direction=preprocessing_kwargs.get("impute_direction", "forward"),
            add_noise=preprocessing_kwargs.get("add_noise", True),
            seed=seed,
        )

    if no_windows and has_threshold:
        pmp_obj = maximum_subsequence(ts, threshold, include_pmp=True)
        windows = range(8, pmp_obj["upper_window"] + 1)
        return skimp(ts, windows=windows, sample_pct=sample_pct, pmp_obj=pmp_obj)
    if multiple_windows:
        return skimp(ts, windows=windows, sample_pct=1)
    if sample_pct >= 1:
        return mpx_profile(ts, windows, query=query)
    return scrimp_plus_plus(ts, windows, query=query, sample_pct=sample_pct,
                            random_state=seed)


def analyze(ts, query=None, windows=None, sample_pct=1.0, threshold=0.98,
            preprocessing_kwargs=None, seed: int = 0):
    """compute + motifs + discords (analyze.py:173-272, minus plots)."""
    profile = compute(ts, windows=windows, query=query, sample_pct=sample_pct,
                      threshold=threshold,
                      preprocessing_kwargs=preprocessing_kwargs, seed=seed)
    profile = motifs(profile)
    profile = discords(profile)
    return profile
