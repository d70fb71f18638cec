"""Resumable incremental rollup with per-partition watermark manifest.

north_rule: "Every retention stage checkpoints per-partition watermarks
with lineage + row-count/byte metrics to a manifest so a killed job
resumes without recomputation."

Design (Iceberg-shaped, parquet-backed in this sandbox):
- the raw source and every tier table are partitioned by `day`
  (floor(ts_epoch/86400)) — the natural pruning column;
- stage X processes exactly the day-partitions whose day is NOT in the
  manifest for stage X; each day writes to `<table>/day=<d>` via a
  staging directory + atomic rename, then appends one manifest row
  (stage, partition_key, watermark_epoch, rows, bytes, snapshot_id);
- a crash between data-write and manifest-commit leaves an orphan dir —
  detected on resume and recomputed idempotently (rename overwrites);
- committed partitions are never reread or recomputed (the resume test
  asserts the second run's processed-set excludes them).

On a real cluster the manifest is an Iceberg table and the day commit is
an Iceberg snapshot; the control flow here is identical.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matrixprofile_spark.operators import rollup as R

DAY_S = 86_400

# the rollup sketch row every tier table stores (rollup_from_raw output)
TIER_SCHEMA = (
    "conv_id string, metric string, bucket_epoch bigint, cnt bigint, "
    "vsum double, vmin double, vmax double, sum_sq double, "
    "vfirst double, vlast double"
)

STAGES = {
    "1m": ("raw", 60),
    "1h": ("1m", 3600),
    "1d": ("1h", 86400),
}


def _manifest_path(workdir: str) -> str:
    return os.path.join(workdir, "manifest.json")


def load_manifest(workdir: str) -> list[dict]:
    p = _manifest_path(workdir)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return json.load(f)


def _append_manifest(workdir: str, entry: dict) -> None:
    entries = load_manifest(workdir)
    entries.append(entry)
    tmp = _manifest_path(workdir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(entries, f, indent=1)
    os.replace(tmp, _manifest_path(workdir))


def committed_days(workdir: str, stage: str) -> set[int]:
    return {
        int(e["partition_key"])
        for e in load_manifest(workdir)
        if e["stage"] == stage
    }


def manifest_df(spark: SparkSession, workdir: str) -> DataFrame:
    entries = load_manifest(workdir)
    schema = ("stage string, partition_key string, watermark_epoch long, "
              "rows long, bytes long, snapshot_id string")
    if not entries:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(entries, schema)


def write_series_source(series: DataFrame, workdir: str) -> str:
    """Materialize the raw series partitioned by day (the 10^12-turn
    source table stand-in)."""
    path = os.path.join(workdir, "raw")
    (
        series.withColumn("day", F.floor(F.col("ts_epoch") / DAY_S).cast("long"))
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(path)
    )
    return path


def _table_path(workdir: str, stage: str) -> str:
    return os.path.join(workdir, f"rollup_{stage}")


def _dir_size(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def _commit_days(
    spark: SparkSession, out: DataFrame, workdir: str, stage: str,
    todo: list[int],
) -> list[dict]:
    """Write ALL of a stage's uncommitted days in one partitioned job,
    then promote each day dir with an atomic rename + manifest append.

    One Spark job per stage instead of one per day (the per-day loop
    paid job-scheduling and a source re-scan per commit). Commit
    granularity is unchanged: a crash mid-promotion leaves later days
    as staging orphans only — they are recomputed on resume, while every
    day whose manifest row landed is never reread. Row counts come from
    the staged parquet footers (metadata-only), not a second execution
    of the rollup lineage."""
    table = _table_path(workdir, stage)
    os.makedirs(table, exist_ok=True)
    staging = os.path.join(workdir, f"_staging_{stage}")
    (
        out.withColumn(
            "day", F.floor(F.col("bucket_epoch") / DAY_S).cast("long")
        )
        .repartition(max(len(todo), 1), "day")
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(staging)
    )
    # an all-NULL-day batch writes no data files at all; reading an empty
    # staging dir would fail schema inference, so detect it and fall back
    # to zero counts (the manifest rows still record the days as done)
    has_part_files = any(
        f.endswith(".parquet")
        for _, _, files in os.walk(staging) for f in files
    )
    counts = {
        int(r["day"]): int(r["cnt"])
        for r in spark.read.parquet(staging)
        .groupBy("day").agg(F.count(F.lit(1)).alias("cnt")).collect()
    } if has_part_files else {}
    entries = []
    for day in todo:
        src_dir = os.path.join(staging, f"day={day}")
        final = os.path.join(table, f"day={day}")
        if os.path.exists(final):
            shutil.rmtree(final)  # orphan from a crashed run → recompute wins
        if os.path.isdir(src_dir):
            os.replace(src_dir, final)
        else:  # a day whose rows were all NULL-valued: empty partition
            os.makedirs(final, exist_ok=True)
        rows = counts.get(day, 0)
        entry = {
            "stage": stage,
            "partition_key": str(day),
            "watermark_epoch": (day + 1) * DAY_S,
            "rows": rows,
            "bytes": _dir_size(final),
            "snapshot_id": f"{stage}-{day}-{rows}",
        }
        _append_manifest(workdir, entry)
        entries.append(entry)
    shutil.rmtree(staging, ignore_errors=True)
    return entries


def _read_stage_input(spark: SparkSession, workdir: str, stage: str) -> DataFrame:
    src, _ = STAGES[stage]
    if src == "raw":
        return spark.read.parquet(os.path.join(workdir, "raw"))
    return spark.read.parquet(_table_path(workdir, src))


def _list_days(workdir: str, stage: str) -> list[int]:
    """Day partitions of a stage's INPUT table, from the partition
    directory names — the same listing an Iceberg manifest would serve,
    with no Spark job (the old distinct().collect() ran one full scan
    per stage per run)."""
    src, _ = STAGES[stage]
    path = (os.path.join(workdir, "raw") if src == "raw"
            else _table_path(workdir, src))
    if not os.path.isdir(path):
        return []
    days = []
    for name in os.listdir(path):
        if not name.startswith("day="):
            continue
        try:  # tolerate day=__HIVE_DEFAULT_PARTITION__ (NULL day)
            days.append(int(name.split("=", 1)[1]))
        except ValueError:
            continue
    return sorted(days)


def run_incremental_rollup(
    spark: SparkSession,
    workdir: str,
    stages=("1m", "1h", "1d"),
    max_days_per_stage: int | None = None,
) -> dict:
    """Process every uncommitted day partition per stage. Returns
    {stage: [processed day, ...]} — the resume test asserts committed
    days never reappear here. `max_days_per_stage` simulates a kill."""
    processed: dict[str, list[int]] = {}
    for stage in stages:
        src_name, tier_s = STAGES[stage]
        inp = _read_stage_input(spark, workdir, stage)
        have = committed_days(workdir, stage)
        days = _list_days(workdir, stage)
        todo = [d for d in days if d not in have]
        if max_days_per_stage is not None:
            todo = todo[:max_days_per_stage]
        processed[stage] = todo
        if todo:
            part = inp.where(F.col("day").isin(todo))  # partition-pruned
            if src_name == "raw":
                out = R.rollup_from_raw(part.drop("day"), tier_s)
            else:
                out = R.rollup_cascade(part.drop("day"), tier_s)
            _commit_days(spark, out, workdir, stage, todo)
    return processed


def read_tier(spark: SparkSession, workdir: str, stage: str) -> DataFrame:
    return spark.read.parquet(_table_path(workdir, stage)).drop("day")


def read_tier_as_of(
    spark: SparkSession, workdir: str, stage: str, snapshot_seq: int
) -> DataFrame:
    """Iceberg-style time travel: the tier table as of the
    ``snapshot_seq``-th manifest commit (1-based position across ALL
    stages — the sandbox twin of Iceberg's global sequence_number).

    The day-partition list comes from the manifest PREFIX, never from a
    directory listing: a day committed after the snapshot is invisible
    even though its files are on disk, which is exactly the isolation a
    reader pinned to an Iceberg snapshot gets. Committed days are
    immutable (resume recomputes only orphans that never got a manifest
    row), so prefix-visibility equals snapshot state. The read plans as
    a parquet scan over exactly the visible partitions — partition
    pruning by construction, no filter needed.
    """
    entries = load_manifest(workdir)[:snapshot_seq]
    days = [int(e["partition_key"]) for e in entries
            if e["stage"] == stage]
    base = _table_path(workdir, stage)
    if not days:
        # valid snapshot, table empty at that point: 0 rows, full
        # schema — from the declared sketch schema when the stage has
        # never committed (its directory may not even exist yet)
        if not os.path.isdir(base):
            return spark.createDataFrame([], TIER_SCHEMA)
        return spark.read.parquet(base).drop("day").limit(0)
    # a day visible at this snapshot but deleted by retention since:
    # refuse loudly (Iceberg's expired-snapshot behavior) — silently
    # returning the surviving subset would misrepresent the snapshot
    expired = [d for d in days
               if not os.path.isdir(os.path.join(base, f"day={d}"))]
    if expired:
        raise FileNotFoundError(
            f"snapshot {snapshot_seq} of stage '{stage}' includes day "
            f"partitions expired by retention since: {expired}")
    paths = [os.path.join(base, f"day={d}") for d in days]
    return (
        spark.read.option("basePath", base).parquet(*paths).drop("day")
    )


def _skimp_store_path(workdir: str) -> str:
    return os.path.join(workdir, "skimp_profiles")


def read_skimp_store(spark: SparkSession, workdir: str) -> DataFrame | None:
    path = _skimp_store_path(workdir)
    if not os.path.isdir(path):
        return None
    return spark.read.parquet(path)


def run_skimp_memo(
    spark: SparkSession, packed: DataFrame, workdir: str, windows,
    n_groups: int | None = None,
) -> int:
    """Memoized SKIMP sweep (the reference resumes a partially-computed
    pan-profile, skimp.py:195-206; here the profile table IS the memo).

    The requested work-list (packed series × windows) is anti-joined
    against the persisted profile store on (conv_id, metric, w); only
    missing keys reach the kernels, and their rows append to the store.
    Returns the number of newly computed profile rows — a clean re-run
    returns 0 (the resume test's no-recompute assertion). New windows OR
    new conversations both surface as missing keys, so widening the
    sweep and ingesting data share one code path."""
    from pyspark.sql import functions as F2

    from matrixprofile_spark.operators.profile import (
        skimp_profiles_from_worklist,
    )

    wdf = spark.createDataFrame([(int(x),) for x in windows], "w int")
    work = packed.join(F2.broadcast(wdf))
    store = read_skimp_store(spark, workdir)
    n_before = 0
    if store is not None:
        n_before = store.count()
        have = store.select("conv_id", "metric", "w")
        work = work.join(F2.broadcast(have), ["conv_id", "metric", "w"],
                         "left_anti")
    fresh = skimp_profiles_from_worklist(work, n_groups=n_groups)
    path = _skimp_store_path(workdir)
    fresh.write.mode("append").partitionBy("w").parquet(path)
    return spark.read.parquet(path).count() - n_before


def apply_retention(
    workdir: str, now_epoch: int, keep_raw_s: int, keep_1m_s: int, keep_1h_s: int
) -> dict[str, list[int]]:
    """Drop expired fine-tier day partitions (the maintenance DELETE).

    Day d of a tier expires when its newest point (d+1)*DAY_S is older
    than now − keep. Returns the dropped partitions per table. Each
    drop appends a ``retention`` manifest row (lineage: a reader can
    tell 'expired by policy' from 'never committed'; Iceberg's
    delete-snapshot analogue), and read_tier_as_of refuses expired days
    loudly instead of returning partial data."""
    dropped: dict[str, list[int]] = {}
    for table, keep in (("raw", keep_raw_s), ("rollup_1m", keep_1m_s),
                        ("rollup_1h", keep_1h_s)):
        path = os.path.join(workdir, table)
        if not os.path.isdir(path):
            continue
        gone = []
        for d in os.listdir(path):
            if not d.startswith("day="):
                continue
            day = int(d.split("=")[1])
            if (day + 1) * DAY_S < now_epoch - keep:
                shutil.rmtree(os.path.join(path, d))
                gone.append(day)
                _append_manifest(workdir, {
                    "stage": "retention",
                    "partition_key": f"{table}/day={day}",
                    "watermark_epoch": now_epoch,
                    "rows": 0,
                    "bytes": 0,
                    "snapshot_id": f"retention-{table}-{day}",
                })
        dropped[table] = sorted(gone)
    return dropped
