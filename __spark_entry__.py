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
from matrixprofile_spark.operators import profile as P  # noqa: E402
from matrixprofile_spark.operators.salted import salted_mpx_profiles  # noqa: E402

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


# -------- matrix-profile queries (Arrow-bridged kernels per series) ------

_MPX_W = 16  # window for the oracle-checked MPX query
_MPX_MINLAG = 4  # ceil(w/4), diagonals start at minlag+1 (cympx.pyx:58,82)


def _chosen_token_series(spark, sf_dir):
    """token_count series of the 5 smallest-conv_id conversations with
    64..400 turns — small, deterministic kernel-query fixture."""
    tok = S.token_count_series(_transcripts(spark, sf_dir))
    packed = P.pack_series(tok)
    chosen = (
        packed.where((F.col("n") >= 64) & (F.col("n") <= 400))
        .orderBy("conv_id")
        .limit(5)
    )
    return chosen


def _q_mpx_w16(spark, sf_dir):
    """MPX profile, oracle-checked against a DuckDB brute-force
    z-normalized-distance self-join, rounded to 2 decimals."""
    chosen = _chosen_token_series(spark, sf_dir)
    prof = P.mpx_profiles(chosen, _MPX_W, packed=True)
    exploded = prof.select(
        "conv_id", F.posexplode("mp").alias("idx", "dist")
    )
    return exploded.select(
        "conv_id",
        F.col("idx").cast("bigint").alias("idx"),
        F.round("dist", 2).alias("dist_r2"),
    )


def _q_mass2_w16(spark, sf_dir):
    """MASS2 distance profile of each chosen conversation's first 16
    values against its own series; oracle = brute-force SQL."""
    import numpy as np
    import pandas as pd
    from matrixprofile_spark.kernels.mass import mass2

    chosen = _chosen_token_series(spark, sf_dir)

    def fn(key, pdf):
        values = np.asarray(pdf["values"].iloc[0], dtype="d")
        dp = np.real(mass2(values, values[:_MPX_W]))
        return pd.DataFrame({
            "conv_id": key[0],
            "idx": np.arange(len(dp), dtype="int64"),
            "dist_r2": np.round(np.maximum(dp, 0.0), 2),
        })

    return chosen.groupBy("conv_id", "metric").applyInPandas(
        fn, "conv_id string, idx bigint, dist_r2 double"
    )


def _q_discords(spark, sf_dir):
    chosen = _chosen_token_series(spark, sf_dir)
    prof = P.mpx_profiles(chosen, _MPX_W, packed=True)
    disc = P.with_discoveries(prof, chosen, packed=True)
    return disc.select(
        "conv_id", "metric",
        F.posexplode("discords").alias("rank", "idx"),
    ).select("conv_id", "metric", F.col("rank").cast("bigint").alias("rank"),
             F.col("idx").cast("bigint").alias("idx"))


def _q_motifs(spark, sf_dir):
    chosen = _chosen_token_series(spark, sf_dir)
    prof = P.mpx_profiles(chosen, _MPX_W, packed=True)
    disc = P.with_discoveries(prof, chosen, packed=True)
    return disc.select(
        "conv_id", "metric",
        F.posexplode("motif_pairs").alias("rank", "pair"),
    ).select(
        "conv_id", "metric", F.col("rank").cast("bigint").alias("rank"),
        F.element_at("pair", 1).alias("first_idx"),
        F.element_at("pair", 2).alias("second_idx"),
    )


def _q_regimes(spark, sf_dir):
    chosen = _chosen_token_series(spark, sf_dir)
    prof = P.mpx_profiles(chosen, _MPX_W, packed=True)
    disc = P.with_discoveries(prof, chosen, packed=True)
    return disc.select(
        "conv_id", "metric", F.posexplode("regimes").alias("rank", "idx")
    ).select("conv_id", "metric", F.col("rank").cast("bigint").alias("rank"),
             F.col("idx").cast("bigint").alias("idx"))


def _q_snippets(spark, sf_dir):
    chosen = _chosen_token_series(spark, sf_dir)
    return P.snippet_profiles(chosen, 32, window_size=16, packed=True).select(
        "conv_id", "metric", F.col("rank").cast("bigint").alias("rank"),
        "index", F.round("fraction", 6).alias("fraction_r6"),
        "neighbor_count",
    )


def _q_skimp_pmp(spark, sf_dir):
    chosen = _chosen_token_series(spark, sf_dir)
    prof = P.skimp_profiles(chosen, windows=[8, 16, 32], packed=True)
    return prof.select(
        "conv_id", "metric", "w",
        F.posexplode("mp").alias("idx", "dist"),
    ).select("conv_id", "metric", "w",
             F.col("idx").cast("bigint").alias("idx"),
             F.round("dist", 2).alias("dist_r2"))


def _q_pairwise_mpdist(spark, sf_dir):
    chosen = _chosen_token_series(spark, sf_dir)
    return P.pairwise_mpdist(chosen, 8, metric="token_count", packed=True) \
        .select("conv_id_a", "conv_id_b", "w",
                F.round("mpdist", 4).alias("mpdist_r4"))


def _q_salted_mpx(spark, sf_dir):
    """Salted (diagonal-band) MPX over the hot conversations — must be
    bit-identical to the plain kernel; output rounded for the driver."""
    tok = S.token_count_series(_transcripts(spark, sf_dir))
    packed = P.pack_series(tok).where(F.col("n") >= 1024)
    prof = salted_mpx_profiles(packed, 32, hot_threshold=1024, bands=8,
                               packed=True)
    return prof.select(
        "conv_id", F.posexplode("mp").alias("idx", "dist")
    ).select("conv_id", F.col("idx").cast("bigint").alias("idx"),
             F.round("dist", 2).alias("dist_r2"))


def _q_segment_roundtrip(spark, sf_dir):
    """decode(encode(series)) — the oracle is the raw series SQL itself,
    so the driver verifies bit-exact value recovery through the
    delta-of-delta + Gorilla codecs."""
    from matrixprofile_spark.operators import segments as SEG

    ser = _series(spark, sf_dir)
    seg = SEG.encode_segments(ser, chunk_points=4096)
    return SEG.decode_segments(seg).select("conv_id", "metric", "ts_epoch", "value")


def _q_segment_stats(spark, sf_dir):
    from matrixprofile_spark.operators import segments as SEG

    ser = _series(spark, sf_dir)
    seg = SEG.encode_segments(ser, chunk_points=4096)
    return seg.groupBy("conv_id", "metric").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.sum("n").alias("total_points"),
    )


def _q_incremental_manifest(spark, sf_dir):
    """Run the resumable rollup end-to-end (kill after 2 days, resume),
    return the manifest; oracle recomputes per-(stage, day) row counts
    in SQL. Proves watermark bookkeeping + no-recompute semantics."""
    import tempfile

    from matrixprofile_spark.streaming import incremental as INC

    ser = _series(spark, sf_dir).where(F.col("conv_id") < "conv-00100")
    wd = tempfile.mkdtemp(prefix="mp_spark_inc_")
    INC.write_series_source(ser, wd)
    INC.run_incremental_rollup(spark, wd, max_days_per_stage=2)  # "kill"
    INC.run_incremental_rollup(spark, wd)  # resume
    return INC.manifest_df(spark, wd).select(
        "stage", F.col("partition_key").cast("bigint").alias("day"),
        F.col("rows").alias("n_rows"), "watermark_epoch",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "segment_roundtrip": _q_segment_roundtrip,
        "segment_stats": _q_segment_stats,
        "incremental_manifest": _q_incremental_manifest,
        "mpx_w16": _q_mpx_w16,
        "mass2_w16": _q_mass2_w16,
        "discords_top3": _q_discords,
        "motifs_top3": _q_motifs,
        "regimes": _q_regimes,
        "snippets": _q_snippets,
        "skimp_pmp": _q_skimp_pmp,
        "pairwise_mpdist": _q_pairwise_mpdist,
        "salted_mpx_hot": _q_salted_mpx,
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


_CHOSEN_CTE = f"""
transcripts AS ({_T}),
tok AS (
  SELECT conv_id, turn_idx AS idx, CAST(length(text) AS DOUBLE) AS value
  FROM transcripts
),
sizes AS (SELECT conv_id, count(*) AS n FROM tok GROUP BY 1),
chosen AS (
  SELECT conv_id FROM sizes WHERE n BETWEEN 64 AND 400
  ORDER BY conv_id LIMIT 5
),
r AS (
  SELECT t.conv_id,
         CAST(row_number() OVER (PARTITION BY t.conv_id ORDER BY idx) - 1
              AS BIGINT) AS i,
         value
  FROM tok t JOIN chosen USING (conv_id)
),
st AS (
  SELECT conv_id, i,
         avg(value) OVER w AS mu,
         stddev_pop(value) OVER w AS sig,
         count(*) OVER w AS cnt
  FROM r
  WINDOW w AS (PARTITION BY conv_id ORDER BY i
               ROWS BETWEEN CURRENT ROW AND {_MPX_W - 1} FOLLOWING)
),
sub AS (SELECT conv_id, i, mu, sig FROM st WHERE cnt = {_MPX_W})
""".strip()


def oracle_sql() -> dict[str, str]:
    return {
        "segment_roundtrip": f"""
WITH {_SERIES_CTE}
SELECT conv_id, metric, ts_epoch, value FROM series
""".strip(),
        "segment_stats": f"""
WITH {_SERIES_CTE}
SELECT conv_id, metric,
       CAST(CEIL(count(*) / 4096.0) AS BIGINT) AS n_segments,
       count(*) AS total_points
FROM series GROUP BY 1, 2
""".strip(),
        "incremental_manifest": f"""
WITH {_SERIES_CTE},
pts AS (
  SELECT conv_id, metric, ts_epoch, value,
         CAST(FLOOR(ts_epoch / 86400.0) AS BIGINT) AS day
  FROM series WHERE value IS NOT NULL AND conv_id < 'conv-00100'
),
m1 AS (
  SELECT '1m' AS stage, day, count(*) AS n_rows,
         (day + 1) * 86400 AS watermark_epoch
  FROM (SELECT DISTINCT conv_id, metric, day,
               CAST(FLOOR(ts_epoch / 60.0) * 60 AS BIGINT) AS b FROM pts)
  GROUP BY day
),
m2 AS (
  SELECT '1h' AS stage, day, count(*) AS n_rows,
         (day + 1) * 86400 AS watermark_epoch
  FROM (SELECT DISTINCT conv_id, metric, day,
               CAST(FLOOR(ts_epoch / 3600.0) * 3600 AS BIGINT) AS b FROM pts)
  GROUP BY day
),
m3 AS (
  SELECT '1d' AS stage, day, count(*) AS n_rows,
         (day + 1) * 86400 AS watermark_epoch
  FROM (SELECT DISTINCT conv_id, metric, day,
               CAST(FLOOR(ts_epoch / 86400.0) * 86400 AS BIGINT) AS b FROM pts)
  GROUP BY day
)
SELECT * FROM m1 UNION ALL SELECT * FROM m2 UNION ALL SELECT * FROM m3
""".strip(),
        "mpx_w16": f"""
WITH {_CHOSEN_CTE},
dots AS (
  SELECT a.conv_id, a.i AS i, b.i AS j, sum(x.value * y.value) AS qt
  FROM sub a
  JOIN sub b ON a.conv_id = b.conv_id AND abs(a.i - b.i) > {_MPX_MINLAG}
  JOIN r x ON x.conv_id = a.conv_id AND x.i >= a.i AND x.i < a.i + {_MPX_W}
  JOIN r y ON y.conv_id = a.conv_id AND y.i = b.i + (x.i - a.i)
  GROUP BY 1, 2, 3
),
corr AS (
  SELECT d.conv_id, d.i,
    CASE WHEN sa.sig = 0 OR sb.sig = 0 THEN 0.0
         ELSE (d.qt - {_MPX_W} * sa.mu * sb.mu)
              / ({_MPX_W} * sa.sig * sb.sig) END AS c
  FROM dots d
  JOIN sub sa ON sa.conv_id = d.conv_id AND sa.i = d.i
  JOIN sub sb ON sb.conv_id = d.conv_id AND sb.i = d.j
),
best AS (SELECT conv_id, i AS idx, max(c) AS cmax FROM corr GROUP BY 1, 2)
SELECT conv_id, idx,
       round(sqrt(2 * {_MPX_W} * (1 - least(cmax, 1.0))), 2) AS dist_r2
FROM best
""".strip(),
        "mass2_w16": f"""
WITH {_CHOSEN_CTE},
q AS (
  SELECT conv_id,
         avg(value) AS muq,
         stddev_pop(value) AS sigq,
         count(*) AS nq
  FROM r WHERE i < {_MPX_W} GROUP BY 1
),
dots AS (
  SELECT a.conv_id, a.i AS i, sum(x.value * y.value) AS qt
  FROM sub a
  JOIN r x ON x.conv_id = a.conv_id AND x.i >= a.i AND x.i < a.i + {_MPX_W}
  JOIN r y ON y.conv_id = a.conv_id AND y.i = x.i - a.i
  GROUP BY 1, 2
),
dist AS (
  SELECT d.conv_id, d.i AS idx,
    CASE
      WHEN sa.sig < 1e-10 AND q.sigq < 1e-10 THEN 0.0
      WHEN sa.sig < 1e-10 THEN CAST({_MPX_W} AS DOUBLE)
      ELSE 2 * ({_MPX_W} - (d.qt - {_MPX_W} * sa.mu * q.muq)
                / (CASE WHEN sa.sig * q.sigq = 0 THEN 1e-12
                        ELSE sa.sig * q.sigq END)) END AS dsq
  FROM dots d
  JOIN sub sa ON sa.conv_id = d.conv_id AND sa.i = d.i
  JOIN q ON q.conv_id = d.conv_id
)
SELECT conv_id, idx, round(sqrt(greatest(dsq, 0.0)), 2) AS dist_r2
FROM dist
""".strip(),
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
