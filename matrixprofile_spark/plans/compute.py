"""Engine facade: compute / analyze dispatch.

Mirrors the reference's top-level workflow dispatch
(/root/reference/matrixprofile/compute.py:29-145 and analyze.py:173-272):

- single window + sample_pct == 1 → exact MPX profile
- single window + sample_pct < 1 → SCRIMP++ approximate profile
- multiple / no windows → SKIMP pan-matrix-profile over a window sweep
- analyze = compute + top-k motifs + top-k discords

Everything here is driver-side plan construction; the numeric work runs
distributed per (conv_id, metric, w) group via operators.profile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def compute(
    series: DataFrame,
    windows=None,
    sample_pct: float = 1.0,
    threshold: float = 0.98,
    seed: int = 0,
) -> DataFrame:
    """Matrix-profile computation over every (conv_id, metric) series.

    Returns the profile table (one row per conv_id, metric, w). Dispatch
    parity with compute.py:116-143; `threshold` drives the
    maximum_subsequence window search when windows is None.
    """
    from matrixprofile_spark.operators import profile as P

    if windows is None:
        return P.skimp_profiles(series, windows=None, threshold=threshold,
                                sample_pct=sample_pct, seed=seed)
    if isinstance(windows, int):
        windows = [windows]
    if len(windows) > 1:
        return P.skimp_profiles(series, windows=list(windows),
                                sample_pct=sample_pct, seed=seed)
    w = int(windows[0])
    if sample_pct >= 1.0:
        return P.mpx_profiles(series, w)
    return P.scrimp_profiles(series, w, sample_pct=sample_pct, seed=seed)


def analyze(
    series: DataFrame,
    windows=None,
    sample_pct: float = 1.0,
    k_motifs: int = 3,
    k_discords: int = 3,
    seed: int = 0,
    zero_eps: float | None = None,
) -> DataFrame:
    """compute + motifs + discords appended as array<struct> columns.

    Parity: analyze.py:87-125 (exact path). Plotting (visualize.py) is out
    of engine scope; use .toPandas() downstream. zero_eps passes through
    to the motif argmin clamp (kernels.discover.top_k_motifs)."""
    from matrixprofile_spark.operators import profile as P

    prof = compute(series, windows=windows, sample_pct=sample_pct, seed=seed)
    return P.with_discoveries(prof, series, k_motifs=k_motifs,
                              k_discords=k_discords, zero_eps=zero_eps)
