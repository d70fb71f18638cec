"""Deterministic synthetic transcript generator.

The engine's input table (per BASELINE.json ``input_hint``) is a table of
multi-turn conversation transcripts::

    transcripts(conv_id string, turn_idx int, role string, text string,
                tool string, ts timestamp)

The sandbox test data has no such table, so we synthesize it — with **pure
integer/string SQL arithmetic from range(n)**, no hash functions, no RNG —
so the *identical generator text* runs in Spark SQL and in the DuckDB
oracle. Every downstream rollup/gap-fill query is therefore
oracle-checkable end-to-end.

Properties (mirroring FIXTURES.md F1):
- mixed conversation lengths 16..500 turns, plus hot conversations
  (every HOT_EVERY-th conv gets +HOT_EXTRA turns) as skew hot-keys;
- ~3% of turns skipped entirely (holes in turn_idx → latency spikes and
  missing buckets for gap-fill);
- inter-turn gaps drawn deterministically from {1,2,5,30,300} s;
- text length varies per turn (drives the token_count series) and is an
  exact deterministic function of (i, j) → per-turn text equality after
  any round-trip is checkable bit-for-bit.

Replaces the reference's HTTP dataset loader
(/root/reference/matrixprofile/datasets/datasets.py:48-219) with a
deterministic source, per the no-external-data rule.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH0 = 1_600_000_000  # 2020-09-13T12:26:40Z, fixed engine epoch
CONV_SPACING_S = 977  # seconds between conversation starts
A_TURNS = 2_654_435_761  # Knuth multiplicative constant (public domain)
TURNS_BASE = 16
TURNS_MOD = 485
HOT_EVERY = 167  # every 167th conversation is a hot key
HOT_EXTRA = 2048
MAX_TURNS = TURNS_BASE + TURNS_MOD - 1 + HOT_EXTRA  # 2548
SKIP_MOD = 100
SKIP_LT = 3  # ~3% of turns skipped

_SF_RE = re.compile(r"sf([0-9.]+)")


def n_conv_for_sf(sf_dir: str) -> int:
    """Scale the synthetic conversation count with the driver's sf dir.

    sf0.001 → 50 convs (~13k turns)   — smoke
    sf0.01  → 500 convs (~130k turns) — correctness
    sf0.1   → 5000 convs (~1.3M turns)— bench
    """
    m = _SF_RE.search(sf_dir or "")
    sf = float(m.group(1)) if m else 0.01
    return max(10, int(round(sf * 50_000)))


def _range_src(alias: str, n: int, dialect: str) -> str:
    if dialect == "duckdb":
        return f"(SELECT range AS {alias} FROM range(0, {n}))"
    return f"(SELECT id AS {alias} FROM range(0, {n}))"


def transcripts_sql(n_conv: int, dialect: str = "spark") -> str:
    """Portable SQL (Spark + DuckDB) producing the transcript rows.

    Columns: conv_id string, turn_idx bigint, role string, text string,
    tool string, ts_epoch bigint. (The Spark-side table adds a real
    timestamp; oracle comparisons use the epoch BIGINT to avoid
    timezone-representation drift between engines.)
    """
    conv = _range_src("i", n_conv, dialect)
    if dialect == "duckdb":
        expl = "UNNEST(GENERATE_SERIES(0, nt - 1))"
    else:
        expl = "EXPLODE(SEQUENCE(0, nt - 1))"
    return f"""
WITH _conv AS (
  SELECT i, {TURNS_BASE} + ((i * {A_TURNS}) % {TURNS_MOD})
            + CASE WHEN i % {HOT_EVERY} = 0 THEN {HOT_EXTRA} ELSE 0 END AS nt
  FROM {conv} c
),
_all AS (SELECT i, {expl} AS j FROM _conv),
_raw AS (
  SELECT i, j FROM _all
  WHERE NOT (j > 0 AND (i * 53 + j * 19) % {SKIP_MOD} < {SKIP_LT})
),
_turns AS (
  SELECT i, j,
    CASE (i * 31 + j * 61) % 5
      WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 5 WHEN 3 THEN 30
      ELSE 300 END AS gap_s
  FROM _raw
),
_ts AS (
  -- the window exchange moves only (i, j, gap_s); text/role are built
  -- AFTER the shuffle so the exchange never carries the payload strings
  SELECT i, j,
    CAST({EPOCH0} + i * {CONV_SPACING_S}
         + SUM(gap_s) OVER (PARTITION BY i ORDER BY j
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS ts_epoch
  FROM _turns
)
SELECT
  'conv-' || lpad(CAST(i AS STRING), 5, '0') AS conv_id,
  CAST(j AS BIGINT) AS turn_idx,
  CASE WHEN (i + j) % 10 = 7 THEN 'tool'
       WHEN j % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
  trim(repeat('w' || CAST((i * 131 + j * 17) % 97 AS STRING) || ' ',
              CAST(1 + ((i * 7 + j * 13) % 120) AS INT))) AS text,
  CASE WHEN (i + j) % 10 = 7 THEN
    CASE (i + j) % 3 WHEN 0 THEN 'search' WHEN 1 THEN 'code' ELSE 'browse' END
  ELSE NULL END AS tool,
  ts_epoch
FROM _ts
""".strip()


def synth_transcripts(spark: SparkSession, n_conv: int) -> DataFrame:
    """The engine-facing transcript table (input_hint schema + ts_epoch).

    Built via spark.sql on the portable generator text, so Catalyst sees
    a fully declarative plan (range → filter → project → window). At real
    scale this table would be an Iceberg table partitioned by
    days(ts) + bucket(conv_id); here it materializes from the generator.
    """
    df = spark.sql(transcripts_sql(n_conv, "spark"))
    return df.withColumn("ts", F.timestamp_seconds(F.col("ts_epoch"))).withColumn(
        "turn_idx", F.col("turn_idx").cast("int")
    )
