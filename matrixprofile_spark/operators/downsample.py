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
