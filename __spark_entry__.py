"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship: full transcripts → series → raw→1m→1h→1d
rollup cascade at sf0.001, returning the 1h tier with derived stats.

`queries()` / `oracle_sql()` — one entry per implemented operator from
SURVEY.md §2. The transcripts input table (BASELINE.json input_hint) is
synthesized from pure portable SQL arithmetic (matrixprofile_spark.
sources.synth), so the *same generator text* runs in Spark and in the
DuckDB oracle — every rollup/gap-fill/moving-stat query is checked
end-to-end including its input.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from matrixprofile_spark.sources.synth import (  # noqa: E402
    n_conv_for_sf,
    synth_transcripts,
    transcripts_sql,
)
from matrixprofile_spark.operators import gapfill, rollup, series as S  # noqa: E402

# The driver compares at sf=0.01 → 500 conversations in the oracle text.
_N_ORACLE = 500
_T = transcripts_sql(_N_ORACLE, "duckdb")

# retention policy used by the retention_view query (seconds)
_KEEP_RAW, _KEEP_1M, _KEEP_1H = 86_400, 3 * 86_400, 6 * 86_400


def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return synth_transcripts(spark, n_conv_for_sf(sf_dir))


def _series(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.project_series(_transcripts(spark, sf_dir))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: rollup cascade on sf0.001-scale transcripts, 1h tier."""
    ser = S.project_series(synth_transcripts(spark, n_conv_for_sf("sf0.001")))
    tiers = rollup.build_cascade(ser)
    return rollup.with_derived_stats(tiers["1h"])


# ----------------------------------------------------------------- queries


def _q_transcripts(spark, sf_dir):
    return _transcripts(spark, sf_dir).select(
        "conv_id", F.col("turn_idx").cast("bigint").alias("turn_idx"),
        "role", "text", "tool", "ts_epoch",
    )


def _q_series_latency(spark, sf_dir):
    return S.latency_series(_transcripts(spark, sf_dir))


def _q_series_token_count(spark, sf_dir):
    return S.token_count_series(_transcripts(spark, sf_dir))


def _q_turn_rate_1m(spark, sf_dir):
    return S.turn_rate_series(_transcripts(spark, sf_dir))


def _q_rollup(tier: str):
    def q(spark, sf_dir):
        ser = _series(spark, sf_dir)
        return rollup.build_cascade(ser)[tier]

    return q


def _q_rollup_1h_stats(spark, sf_dir):
    ser = _series(spark, sf_dir)
    return rollup.with_derived_stats(rollup.build_cascade(ser)["1h"])


def _q_gapfill_locf(spark, sf_dir):
    tok = S.token_count_series(_transcripts(spark, sf_dir))
    return gapfill.fill_locf(gapfill.to_grid(tok, 60), "forward")


def _q_moving_stats(spark, sf_dir):
    tok = S.token_count_series(_transcripts(spark, sf_dir))
    w = W.partitionBy("conv_id").orderBy("idx").rowsBetween(0, 7)
    out = tok.select(
        "conv_id",
        "idx",
        F.avg("value").over(w).alias("mov_avg"),
        F.min("value").over(w).alias("mov_min"),
        F.max("value").over(w).alias("mov_max"),
        F.count("value").over(w).alias("_n"),
    )
    return out.where(F.col("_n") == 8).drop("_n")


def _q_statistics_global(spark, sf_dir):
    ser = _series(spark, sf_dir)
    v = F.col("value")
    return (
        ser.where(v.isNotNull())
        .groupBy("conv_id", "metric")
        .agg(
            F.count(v).alias("cnt"),
            F.sum(v).alias("vsum"),
            F.min(v).alias("vmin"),
            F.max(v).alias("vmax"),
            F.sum(v * v).alias("sum_sq"),
            (F.sum(v) / F.count(v)).alias("mean"),
        )
    )


def _q_retention_view(spark, sf_dir):
    ser = _series(spark, sf_dir)
    now = ser.agg(F.max("ts_epoch")).collect()[0][0]
    tiers = rollup.build_cascade(ser)
    return rollup.retention_union(tiers, ser, now, _KEEP_RAW, _KEEP_1M, _KEEP_1H)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "transcripts": _q_transcripts,
        "series_latency": _q_series_latency,
        "series_token_count": _q_series_token_count,
        "turn_rate_1m": _q_turn_rate_1m,
        "rollup_1m": _q_rollup("1m"),
        "rollup_1h": _q_rollup("1h"),
        "rollup_1d": _q_rollup("1d"),
        "rollup_1h_stats": _q_rollup_1h_stats,
        "gapfill_locf": _q_gapfill_locf,
        "moving_stats_w8": _q_moving_stats,
        "statistics_global": _q_statistics_global,
        "retention_view": _q_retention_view,
    }


# ------------------------------------------------------------- oracle SQL

_SERIES_CTE = f"""
transcripts AS ({_T}),
series AS (
  SELECT conv_id, 'latency' AS metric, turn_idx AS idx, ts_epoch,
         CAST(ts_epoch - lag(ts_epoch) OVER
              (PARTITION BY conv_id ORDER BY turn_idx) AS DOUBLE) AS value
  FROM transcripts
  UNION ALL
  SELECT conv_id, 'token_count' AS metric, turn_idx AS idx, ts_epoch,
         CAST(length(text) AS DOUBLE) AS value
  FROM transcripts
)
""".strip()


def _rollup_oracle(tier_s: int) -> str:
    return f"""
WITH {_SERIES_CTE}
SELECT conv_id, metric,
       CAST(FLOOR(ts_epoch / {tier_s}.0) * {tier_s} AS BIGINT) AS bucket_epoch,
       count(value) AS cnt, sum(value) AS vsum, min(value) AS vmin,
       max(value) AS vmax, sum(value * value) AS sum_sq,
       min_by(value, ts_epoch) AS vfirst, max_by(value, ts_epoch) AS vlast
FROM series WHERE value IS NOT NULL
GROUP BY 1, 2, 3
""".strip()


def oracle_sql() -> dict[str, str]:
    return {
        "transcripts": f"WITH transcripts AS ({_T}) SELECT * FROM transcripts",
        "series_latency": f"""
WITH transcripts AS ({_T})
SELECT conv_id, 'latency' AS metric, turn_idx AS idx, ts_epoch,
       CAST(ts_epoch - lag(ts_epoch) OVER
            (PARTITION BY conv_id ORDER BY turn_idx) AS DOUBLE) AS value
FROM transcripts
""".strip(),
        "series_token_count": f"""
WITH transcripts AS ({_T})
SELECT conv_id, 'token_count' AS metric, turn_idx AS idx, ts_epoch,
       CAST(length(text) AS DOUBLE) AS value
FROM transcripts
""".strip(),
        "turn_rate_1m": f"""
WITH transcripts AS ({_T}),
b AS (
  SELECT conv_id, CAST(FLOOR(ts_epoch / 60.0) * 60 AS BIGINT) AS ts_epoch,
         CAST(count(*) AS DOUBLE) AS value
  FROM transcripts GROUP BY 1, 2
)
SELECT conv_id, 'turn_rate' AS metric,
       CAST(row_number() OVER (PARTITION BY conv_id ORDER BY ts_epoch) - 1
            AS BIGINT) AS idx,
       ts_epoch, value
FROM b
""".strip(),
        "rollup_1m": _rollup_oracle(60),
        "rollup_1h": _rollup_oracle(3600),
        "rollup_1d": _rollup_oracle(86400),
        "rollup_1h_stats": f"""
WITH {_SERIES_CTE},
r AS (
  SELECT conv_id, metric,
         CAST(FLOOR(ts_epoch / 3600.0) * 3600 AS BIGINT) AS bucket_epoch,
         count(value) AS cnt, sum(value) AS vsum, min(value) AS vmin,
         max(value) AS vmax, sum(value * value) AS sum_sq,
         min_by(value, ts_epoch) AS vfirst, max_by(value, ts_epoch) AS vlast
  FROM series WHERE value IS NOT NULL GROUP BY 1, 2, 3
)
SELECT *, vsum / cnt AS mean,
       sqrt(greatest(sum_sq / cnt - (vsum / cnt) * (vsum / cnt), 0.0)) AS std
FROM r
""".strip(),
        "gapfill_locf": f"""
WITH transcripts AS ({_T}),
tok AS (
  SELECT conv_id, 'token_count' AS metric, ts_epoch,
         CAST(length(text) AS DOUBLE) AS value
  FROM transcripts
),
b AS (
  SELECT conv_id, metric, CAST(FLOOR(ts_epoch / 60.0) * 60 AS BIGINT) AS ts_epoch,
         sum(value) / count(value) AS value
  FROM tok GROUP BY 1, 2, 3
),
spans AS (
  SELECT conv_id, metric, min(ts_epoch) AS t0, max(ts_epoch) AS t1
  FROM b GROUP BY 1, 2
),
grid AS (
  SELECT conv_id, metric,
         unnest(generate_series(t0, t1, 60)) AS ts_epoch
  FROM spans
),
j AS (
  SELECT g.conv_id, g.metric, g.ts_epoch, b.value
  FROM grid g LEFT JOIN b USING (conv_id, metric, ts_epoch)
)
SELECT conv_id, metric, ts_epoch,
       coalesce(value, last_value(value IGNORE NULLS) OVER
         (PARTITION BY conv_id, metric ORDER BY ts_epoch
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS value
FROM j
""".strip(),
        "moving_stats_w8": f"""
WITH transcripts AS ({_T}),
tok AS (
  SELECT conv_id, turn_idx AS idx, CAST(length(text) AS DOUBLE) AS value
  FROM transcripts
),
m AS (
  SELECT conv_id, idx,
         avg(value) OVER w AS mov_avg, min(value) OVER w AS mov_min,
         max(value) OVER w AS mov_max, count(value) OVER w AS _n
  FROM tok
  WINDOW w AS (PARTITION BY conv_id ORDER BY idx
               ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING)
)
SELECT conv_id, idx, mov_avg, mov_min, mov_max FROM m WHERE _n = 8
""".strip(),
        "statistics_global": f"""
WITH {_SERIES_CTE}
SELECT conv_id, metric, count(value) AS cnt, sum(value) AS vsum,
       min(value) AS vmin, max(value) AS vmax,
       sum(value * value) AS sum_sq, sum(value) / count(value) AS mean
FROM series WHERE value IS NOT NULL GROUP BY 1, 2
""".strip(),
        "retention_view": f"""
WITH {_SERIES_CTE},
now_t AS (SELECT max(ts_epoch) AS now FROM series),
r1m AS (
  SELECT conv_id, metric,
         CAST(FLOOR(ts_epoch / 60.0) * 60 AS BIGINT) AS bucket_epoch,
         count(value) AS cnt, sum(value) AS vsum
  FROM series WHERE value IS NOT NULL GROUP BY 1, 2, 3
),
r1h AS (
  SELECT conv_id, metric,
         CAST(FLOOR(ts_epoch / 3600.0) * 3600 AS BIGINT) AS bucket_epoch,
         count(value) AS cnt, sum(value) AS vsum
  FROM series WHERE value IS NOT NULL GROUP BY 1, 2, 3
),
r1d AS (
  SELECT conv_id, metric,
         CAST(FLOOR(ts_epoch / 86400.0) * 86400 AS BIGINT) AS bucket_epoch,
         count(value) AS cnt, sum(value) AS vsum
  FROM series WHERE value IS NOT NULL GROUP BY 1, 2, 3
)
SELECT s.conv_id, s.metric, s.ts_epoch AS bucket_epoch, 'raw' AS tier,
       CAST(1 AS BIGINT) AS cnt, s.value AS vsum
FROM series s, now_t
WHERE s.ts_epoch >= now - {_KEEP_RAW} AND s.value IS NOT NULL
UNION ALL
SELECT conv_id, metric, bucket_epoch, '1m' AS tier, cnt, vsum
FROM r1m, now_t
WHERE bucket_epoch < now - {_KEEP_RAW} AND bucket_epoch >= now - {_KEEP_1M}
UNION ALL
SELECT conv_id, metric, bucket_epoch, '1h' AS tier, cnt, vsum
FROM r1h, now_t
WHERE bucket_epoch < now - {_KEEP_1M} AND bucket_epoch >= now - {_KEEP_1H}
UNION ALL
SELECT conv_id, metric, bucket_epoch, '1d' AS tier, cnt, vsum
FROM r1d, now_t
WHERE bucket_epoch < now - {_KEEP_1H}
""".strip(),
    }
