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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SERIES_SCHEMA = (
    "conv_id string, metric string, idx long, ts_epoch long, value double"
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
