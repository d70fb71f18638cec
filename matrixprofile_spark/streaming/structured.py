"""Structured Streaming driver for the raw→1m rollup stage.

The reference is a batch library (no streaming), and the engine's primary
incremental path is the manifest-based resumable rollup
(streaming/incremental.py) because its watermarks are deterministic. This
module is the Structured Streaming variant of the same stage for
deployments that want a continuously-running raw→1m job: file-source
stream → event-time window aggregation → sink. At scale the source would
be an Iceberg/Kafka stream and the sink an Iceberg table with
`trigger(availableNow)` micro-batches; here the source is a parquet
directory and the sink is validated through the in-memory table.

Semantics: identical to operators/rollup.rollup_from_raw for the
streaming-safe sketch columns. `first/last` (min_by/max_by) are kept out
of the streaming aggregate — they are not order-stable under streaming
retraction — and are recovered by the batch compactor when the 1m tier is
rolled into 1h (the cascade re-aggregates from the finer tier, so nothing
is lost).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SERIES_SCHEMA = (
    "conv_id string, metric string, idx long, ts_epoch long, value double"
)


def stream_stateful_stats(
    spark: SparkSession,
    src_path: str,
    query_name: str = "stream_stateful_stats",
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-series
    running statistics whose state (cnt/sum/min/max/sum_sq) carries
    ACROSS micro-batches — the engine's `statistics` operator
    (reference statistics.py:15-90) as a continuously-updating stream.

    The sketch is commutative/associative, so arbitrary file→batch
    ordering cannot change the final state (and integer-valued metrics
    make the float64 sums exact — the end state hash-matches the batch
    oracle). Every state update emits a snapshot tagged with a
    monotonically increasing `upd`; the caller keeps the last snapshot
    per key. A production job would use update-mode into an upsert sink
    keyed by (conv_id, metric)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "conv_id string, metric string, upd int, cnt long, vsum double, "
        "vmin double, vmax double, sum_sq double"
    )
    state_schema = (
        "cnt long, vsum double, vmin double, vmax double, sum_sq double, "
        "upd int"
    )

    def fn(key, pdfs, state):
        if state.exists:
            cnt, vsum, vmin, vmax, ssq, upd = state.get
        else:
            cnt, vsum, vmin, vmax, ssq, upd = 0, 0.0, None, None, 0.0, 0
        for pdf in pdfs:
            vals = pdf["value"].dropna()
            if not len(vals):
                continue
            cnt += int(len(vals))
            vsum += float(vals.sum())
            ssq += float((vals * vals).sum())
            bmin, bmax = float(vals.min()), float(vals.max())
            vmin = bmin if vmin is None else min(vmin, bmin)
            vmax = bmax if vmax is None else max(vmax, bmax)
        upd += 1
        state.update((cnt, vsum, vmin, vmax, ssq, upd))
        yield pd.DataFrame([{
            "conv_id": key[0], "metric": key[1], "upd": upd, "cnt": cnt,
            "vsum": vsum, "vmin": vmin, "vmax": vmax, "sum_sq": ssq,
        }])

    src = (
        spark.readStream.schema(SERIES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(src_path)
    )
    snapshots = (
        src.groupBy("conv_id", "metric")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "update",
            GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        snapshots.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    all_snaps = spark.table(query_name)
    w = F.row_number().over(
        Window.partitionBy("conv_id", "metric").orderBy(F.desc("upd"))
    )
    return (
        all_snaps.withColumn("_rn", w)
        .where(F.col("_rn") == 1)
        .select("conv_id", "metric", "cnt", "vsum", "vmin", "vmax",
                "sum_sq", (F.col("vsum") / F.col("cnt")).alias("mean"))
    )


def stream_rollup_1m(
    spark: SparkSession,
    src_path: str,
    query_name: str = "stream_rollup_1m",
    tier_s: int = 60,
) -> DataFrame:
    """Run the raw→1m rollup as a Structured Streaming job over a parquet
    file source, processing all available data (`availableNow`), and
    return the finalized result.

    `complete` output mode + in-memory sink: every window is emitted at
    end-of-stream (append mode would hold back windows newer than the
    final watermark — wrong for a drain-the-backlog run). A production
    continuous job would use append mode + watermark into Iceberg.
    """
    v = F.col("value")
    src = (
        spark.readStream.schema(SERIES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(src_path)
    )
    agg = (
        src.where(v.isNotNull())
        .withColumn("ts", F.timestamp_seconds(F.col("ts_epoch")))
        .withWatermark("ts", "1 hour")
        .groupBy(
            "conv_id",
            "metric",
            F.window("ts", f"{tier_s} seconds").alias("win"),
        )
        .agg(
            F.count(v).alias("cnt"),
            F.sum(v).alias("vsum"),
            F.min(v).alias("vmin"),
            F.max(v).alias("vmax"),
            F.sum(v * v).alias("sum_sq"),
        )
    )
    q = (
        agg.select(
            "conv_id",
            "metric",
            F.unix_timestamp(F.col("win.start")).alias("bucket_epoch"),
            "cnt",
            "vsum",
            "vmin",
            "vmax",
            "sum_sq",
        )
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
