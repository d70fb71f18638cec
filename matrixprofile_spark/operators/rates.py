"""Counter and time-weighted aggregates over irregular series.

Two public-semantics operators every metrics store carries (PromQL
``increase``/``rate``, TimescaleDB ``counter_agg``/``time_weight``) —
the engine's rollup sketches cover gauge statistics; these cover the
other two series kinds, cumulative counters and duty-cycle averages:

- ``counter_increase`` — per-bucket increase of a cumulative counter
  that may RESET (process restart): a negative adjacent delta means the
  counter restarted from ~0, so the new value itself is the increase
  since the reset (PromQL's exact rule).
- ``time_weighted_avg`` — per-bucket average weighted by how LONG each
  value held (LOCF step interpolation), not by sample count: on
  irregular series the arithmetic mean over-weights bursts of samples.

Both are one window pass (lag over the series order, shared sort) + one
groupBy on the bucket — two exchanges, all codegen, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def counter_increase(series: DataFrame, bucket_s: int = 60) -> DataFrame:
    """Reset-aware per-bucket counter increase + per-second rate.

    Each adjacent delta is attributed to the bucket of the LATER sample
    (the instant the increase became visible). A series' first sample
    has no predecessor and contributes nothing. Output: conv_id,
    metric, bucket_epoch, increase, n_samples, rate_per_s.
    """
    # (ts, value) ordering: duplicate timestamps would otherwise make
    # the adjacent delta — and thus reset detection — nondeterministic
    w = Window.partitionBy("conv_id", "metric").orderBy("ts_epoch", "value")
    d = F.col("value") - F.lag("value").over(w)
    inc = (
        series.where(F.col("value").isNotNull())
        .select(
            "conv_id", "metric", "ts_epoch",
            # two explicit whens, NOT otherwise(): a NULL delta (the
            # series' first sample) must yield NULL inc and drop below,
            # but otherwise() would swallow it as a reset
            F.when(d >= 0, d).when(d < 0, F.col("value")).alias("inc"),
        )
        .where(F.col("inc").isNotNull())
    )
    bucket = (F.floor(F.col("ts_epoch") / bucket_s) * bucket_s).cast("bigint")
    return (
        inc.groupBy("conv_id", "metric", bucket.alias("bucket_epoch"))
        .agg(
            F.sum("inc").alias("increase"),
            F.count(F.lit(1)).alias("n_samples"),
        )
        .select(
            "conv_id", "metric", "bucket_epoch", "increase", "n_samples",
            (F.col("increase") / float(bucket_s)).alias("rate_per_s"),
        )
    )


def time_weighted_avg(series: DataFrame, bucket_s: int = 3600) -> DataFrame:
    """Per-bucket time-weighted average under LOCF step interpolation.

    Each sample's value holds from its timestamp to the NEXT sample in
    the same bucket (or the bucket end for the bucket's last sample);
    the bucket's first segment starts at the first sample, not the
    bucket edge (no cross-bucket carry — that variant needs the gap-fill
    grid, which fill_locf provides). Zero-duration buckets (single
    sample at the bucket's last second… still 1s+ here since segments
    extend to bucket end) cannot occur; the weight sum is
    bucket_end − first_ts > 0. Output: conv_id, metric, bucket_epoch,
    twa, n_samples.
    """
    bucket = (F.floor(F.col("ts_epoch") / bucket_s) * bucket_s).cast("bigint")
    src = series.where(F.col("value").isNotNull()).select(
        "conv_id", "metric", "ts_epoch", "value",
        bucket.alias("bucket_epoch"),
    )
    w = Window.partitionBy("conv_id", "metric", "bucket_epoch").orderBy(
        "ts_epoch", "value"
    )
    seg_end = F.coalesce(
        F.lead("ts_epoch").over(w),
        F.col("bucket_epoch") + bucket_s,
    )
    seg = src.select(
        "conv_id", "metric", "bucket_epoch", "value",
        (seg_end - F.col("ts_epoch")).cast("double").alias("dur"),
    )
    return (
        seg.groupBy("conv_id", "metric", "bucket_epoch")
        .agg(
            (F.sum(F.col("value") * F.col("dur")) / F.sum("dur")).alias("twa"),
            F.count(F.lit(1)).alias("n_samples"),
        )
    )
