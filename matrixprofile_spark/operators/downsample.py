"""Visualization-exact series downsampling.

M4 (Jugel et al., VLDB 2014 — public literature): per time bucket keep
the four extremal points (first, last, min, max); a line rendering of
the downsampled series is pixel-identical to the full series when the
bucket width matches the pixel column. This is the *shape-preserving*
downsample the rollup tiers (which keep aggregates, not points)
deliberately don't provide — together they cover the two downsample
families a retention engine needs.

Pure one-pass groupBy aggregation: min/max over (ts, value) /
(value, ts) structs, so ties resolve lexicographically and the result
is deterministic regardless of partitioning — first = earliest ts
(smallest value on ts ties), min = smallest value at its earliest ts,
max = largest value at its latest ts, last = latest ts. One shuffle on
the bucket key with map-side partial min/max; everything stays in
whole-stage codegen (struct min/max are declarative aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def m4_downsample(series: DataFrame, bucket_s: int = 120) -> DataFrame:
    """One row per (conv_id, metric, bucket) with the M4 tuple:
    (t_first, v_first, t_min, v_min, t_max, v_max, t_last, v_last)."""
    bucket = (F.floor(F.col("ts_epoch") / bucket_s) * bucket_s).cast("bigint")
    by_ts = F.struct(F.col("ts_epoch"), F.col("value"))
    by_val = F.struct(F.col("value"), F.col("ts_epoch"))
    agg = (
        series.where(F.col("value").isNotNull())
        .groupBy("conv_id", "metric", bucket.alias("bucket_epoch"))
        .agg(
            F.min(by_ts).alias("__f"),
            F.max(by_ts).alias("__l"),
            F.min(by_val).alias("__mn"),
            F.max(by_val).alias("__mx"),
        )
    )
    return agg.select(
        "conv_id", "metric", "bucket_epoch",
        F.col("__f.ts_epoch").alias("t_first"),
        F.col("__f.value").alias("v_first"),
        F.col("__mn.ts_epoch").alias("t_min"),
        F.col("__mn.value").alias("v_min"),
        F.col("__mx.ts_epoch").alias("t_max"),
        F.col("__mx.value").alias("v_max"),
        F.col("__l.ts_epoch").alias("t_last"),
        F.col("__l.value").alias("v_last"),
    )


def lttb_select(ts, vs, k):
    """Largest-Triangle-Three-Buckets point selection (Steinarsson 2013,
    public literature) over one sorted series — returns the selected
    ORIGINAL indices, length min(k, n).

    Integer bucket bounds (j*m)//(k-2) instead of the paper's float
    `every` so the same split is reproducible in plain SQL; ties in
    triangle area resolve to the first index, matching the SQL twin's
    list_position-of-max. On integer-valued inputs every intermediate
    (sums, means, cross products) is either exact or the same IEEE-754
    op sequence on both sides, so the oracle comparison is bit-exact.
    """
    import numpy as np

    n = len(ts)
    if n <= k:
        return list(range(n))
    k2 = k - 2
    m = n - 2
    sel = [0]
    prev = 0
    for i in range(k2):
        lo = (i * m) // k2
        hi = ((i + 1) * m) // k2
        if i < k2 - 1:
            nlo = ((i + 1) * m) // k2
            nhi = ((i + 2) * m) // k2
            at = ts[nlo + 1:nhi + 1].sum() / (nhi - nlo)
            av = vs[nlo + 1:nhi + 1].sum() / (nhi - nlo)
        else:
            at = ts[n - 1]
            av = vs[n - 1]
        tj = ts[lo + 1:hi + 1]
        vj = vs[lo + 1:hi + 1]
        pt, pv = ts[prev], vs[prev]
        area = np.abs((pt - at) * (vj - pv) - (pt - tj) * (av - pv))
        prev = lo + 1 + int(np.argmax(area))
        sel.append(prev)
    sel.append(n - 1)
    return sel


def lttb_downsample(series, k: int = 20):
    """LTTB per (conv_id, metric) series: k shape-preserving points.

    The selection is inherently sequential (each bucket's pick depends
    on the previous pick), so it runs per-group through the Arrow
    bridge — the same grouped-kernel shape as mpx_profiles: one shuffle
    on the series key, then a narrow map. Output: one row per kept
    point with its selection ordinal ``s``.
    """
    import numpy as np

    def fn(key, pdf):
        import pandas as pd

        # (ts, value) sort: deterministic under ts ties, mirrored by the
        # SQL twin's ORDER BY ts_epoch, value list packing
        pdf = pdf.sort_values(["ts_epoch", "value"], kind="mergesort")
        ts = pdf["ts_epoch"].to_numpy(dtype="float64")
        vs = pdf["value"].to_numpy(dtype="float64")
        sel = lttb_select(ts, vs, k)
        return pd.DataFrame({
            "conv_id": key[0], "metric": key[1],
            "s": np.arange(len(sel), dtype="int64"),
            "ts_epoch": pdf["ts_epoch"].to_numpy()[sel],
            "value": vs[sel],
        })

    return (
        series.where(F.col("value").isNotNull())
        .groupBy("conv_id", "metric")
        .applyInPandas(
            fn,
            "conv_id string, metric string, s long, ts_epoch long, "
            "value double",
        )
    )
