"""External ingestion into the transcripts schema.

Analog of the reference's dataset loader
(/root/reference/matrixprofile/datasets/datasets.py:48-219) minus the
HTTP fetch (no-external-data rule): files land in a lake, these readers
project them onto the engine's input table (BASELINE.json input_hint
schema) with explicit schemas — never inference, which would re-scan
the data and guess types per file.

At 100 TB the parquet path is the real one (partition-pruned,
column-pruned scans); CSV is the interchange on-ramp and is read with
an explicit schema + PERMISSIVE corrupt-row capture so one bad row
quarantines instead of failing the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPTS_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts_epoch long"
)


def _with_ts(df: DataFrame) -> DataFrame:
    return df.withColumn("ts", F.timestamp_seconds(F.col("ts_epoch")))


def read_transcripts_csv(
    spark: SparkSession, path: str, header: bool = True
) -> DataFrame:
    """CSV files → transcripts table (explicit schema, quoted text,
    corrupt rows captured in _corrupt instead of aborting)."""
    df = (
        spark.read.schema(TRANSCRIPTS_DDL + ", _corrupt string")
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(path)
    )
    return _with_ts(df.where(F.col("_corrupt").isNull()).drop("_corrupt"))


def write_transcripts_csv(transcripts: DataFrame, path: str) -> None:
    """Interchange export (quoted, headered) of the transcript columns."""
    (
        transcripts.select("conv_id", "turn_idx", "role", "text", "tool",
                           "ts_epoch")
        .write.mode("overwrite")
        .option("header", "true")
        .option("escape", '"')
        .csv(path)
    )


def read_transcripts_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet/lake → transcripts table; the scan prunes to exactly the
    requested columns and partitions (PLANS.md shows ReadSchema)."""
    return _with_ts(spark.read.schema(TRANSCRIPTS_DDL).parquet(path))
