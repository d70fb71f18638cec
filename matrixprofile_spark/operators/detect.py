"""Sequential detection operators: rolling z-score anomalies, EWMA
smoothing, CUSUM change detection.

These complement the matrix-profile discord path (kernels/discover.py —
shape-based anomalies) with the classical statistical detectors an
operations pipeline runs FIRST, because they are pure Catalyst / exact
arithmetic and cost one window pass instead of an O(n²)-ish kernel.

Cross-engine determinism strategy (the repo-wide rule the r6 gap_report
failure taught): never emit `round(double, 6)` of a ratio — either the
output is an integer/boolean derived by integer arithmetic that both
engines evaluate exactly (anomaly_zscore), or it is the result of the
SAME IEEE-754 operation sequence on both sides so even the roundings
agree bit-for-bit (ewma / cusum left folds).

Scale notes (100 TB): anomaly_zscore is one window pass over
(conv_id, metric) — partition-local after a single hash exchange, all
whole-stage codegen. ewma/cusum pack each series into one row
(collect_list) and run a Catalyst `aggregate` fold — state is O(series
length); per-conversation series are bounded (a conversation has
thousands of turns, not billions), and the pack groupBy is the same
exchange the matrix-profile kernels already pay. No Python in any of
these paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def anomaly_zscore(series: DataFrame, w: int = 16,
                   z: int = 3) -> DataFrame:
    """Trailing-window z-score anomaly flags, integer-exact.

    For each point x with a FULL trailing window of the w previous
    values (current excluded): flag iff (x - μ)² > z²·σ² with μ, σ²
    the window sample mean/variance. On integer-valued metrics the
    inequality clears denominators exactly:

        (w·x − S)² · (w−1)  >  z² · w · (w·Q − S²)

    with S = Σ window values, Q = Σ window squares — every term an
    integer-valued double (exact in float64 far below 2^53 at
    conversation scale), so Spark and an ANSI oracle agree on the
    BOOLEAN with no float rounding anywhere. Rows without a full
    window are not emitted (no NULL-semantics divergence).
    """
    win = (
        Window.partitionBy("conv_id", "metric")
        .orderBy("idx")
        .rowsBetween(-w, -1)
    )
    x, s, q, n = (F.col("value"), F.col("_s"), F.col("_q"),
                  F.col("_n"))
    base = series.where(F.col("value").isNotNull()).select(
        "conv_id", "metric", "idx", "value",
        F.sum("value").over(win).alias("_s"),
        F.sum(F.col("value") * F.col("value")).over(win).alias("_q"),
        F.count("value").over(win).alias("_n"),
    )
    lhs = (w * x - s) * (w * x - s) * (w - 1)
    rhs = F.lit(z * z) * w * (w * q - s * s)
    return (
        base.where(n == w)
        .select(
            "conv_id", "metric", "idx", "value",
            (lhs > rhs).alias("is_anomaly"),
        )
    )


def _packed_fold(series: DataFrame, step_expr: str,
                 init_expr: str = "x[0].value") -> DataFrame:
    """Pack each (conv_id, metric) series in idx order and run a
    Catalyst `aggregate` left fold that APPENDS every step's state, so
    the running sequence explodes back to per-row output. `step_expr`
    sees `acc.s` (previous state) and `v` (current value); the fold is
    the same operation sequence any sequential oracle (recursive CTE)
    performs, so IEEE roundings agree bit-for-bit cross-engine."""
    packed = (
        series.where(F.col("value").isNotNull())
        .groupBy("conv_id", "metric")
        .agg(F.expr(
            "array_sort(collect_list(struct(idx, value)))").alias("x"))
    )
    fold = F.expr(f"""
        aggregate(
          slice(x, 2, size(x) - 1),
          struct(
            array(struct(x[0].idx AS idx, CAST({init_expr} AS DOUBLE) AS s)) AS hist,
            CAST({init_expr} AS DOUBLE) AS s),
          (acc, e) -> struct(
            array_append(acc.hist,
              struct(e.idx AS idx, CAST({step_expr} AS DOUBLE) AS s)) AS hist,
            CAST({step_expr} AS DOUBLE) AS s),
          acc -> acc.hist)
    """)
    return (
        packed.where(F.size("x") >= 1)
        .select("conv_id", "metric", F.explode(fold).alias("e"))
        .select("conv_id", "metric",
                F.col("e.idx").alias("idx"), F.col("e.s").alias("s"))
    )


def ewma(series: DataFrame, alpha_num: int = 1,
         alpha_den: int = 4) -> DataFrame:
    """Per-row exponentially weighted moving average,
    s_t = (a·x_t + (d−a)·s_{t−1}) / d with rational α = a/d (default
    1/4), seeded s_0 = x_0 — the standard operational smoother next to
    the centered seasonal_decompose trend. One pack exchange + one
    Catalyst fold; the per-step expression is identical to the
    recursive-CTE oracle's, so results match bit-exactly even where
    (d−a)·s rounds."""
    a, d = alpha_num, alpha_den
    step = f"({a} * e.value + {d - a} * acc.s) / {d}"
    out = _packed_fold(series, step)
    return out.select("conv_id", "metric", "idx",
                      F.col("s").alias("ewma"))


def cusum_flags(series: DataFrame, k_num: int = 1, k_den: int = 2,
                h: int = 8) -> DataFrame:
    """Two-sided CUSUM change detection against the series' FIRST value
    as reference (deterministic, no mean estimation): with drift
    allowance k = k_num/k_den (default 1/2),

        g⁺_t = max(0, g⁺_{t−1} + (x_t − x_0) − k)
        g⁻_t = max(0, g⁻_{t−1} − (x_t − x_0) − k)

    alarm when either exceeds h. Integer-valued metrics keep every
    state dyadic-exact; the fold order matches the recursive-CTE
    oracle, so booleans AND states hash bit-exactly. Both sides run in
    ONE fold over one packed input — the state struct carries
    (g⁺, g⁻) together, so the whole operator is a single pack
    exchange: no second fold, no re-join on (conv_id, metric, idx)."""
    ref = "x[0].value"
    k = f"({k_num} / CAST({k_den} AS DOUBLE))"
    step_pos = f"greatest(CAST(0 AS DOUBLE), acc.gp + (e.value - {ref}) - {k})"
    step_neg = f"greatest(CAST(0 AS DOUBLE), acc.gn - (e.value - {ref}) - {k})"
    packed = (
        series.where(F.col("value").isNotNull())
        .groupBy("conv_id", "metric")
        .agg(F.expr(
            "array_sort(collect_list(struct(idx, value)))").alias("x"))
    )
    fold = F.expr(f"""
        aggregate(
          slice(x, 2, size(x) - 1),
          struct(
            array(struct(x[0].idx AS idx,
                         CAST(0 AS DOUBLE) AS gp,
                         CAST(0 AS DOUBLE) AS gn)) AS hist,
            CAST(0 AS DOUBLE) AS gp,
            CAST(0 AS DOUBLE) AS gn),
          (acc, e) -> struct(
            array_append(acc.hist,
              struct(e.idx AS idx,
                     CAST({step_pos} AS DOUBLE) AS gp,
                     CAST({step_neg} AS DOUBLE) AS gn)) AS hist,
            CAST({step_pos} AS DOUBLE) AS gp,
            CAST({step_neg} AS DOUBLE) AS gn),
          acc -> acc.hist)
    """)
    return (
        packed.where(F.size("x") >= 1)
        .select("conv_id", "metric", F.explode(fold).alias("e"))
        .select(
            "conv_id", "metric",
            F.col("e.idx").alias("idx"),
            F.col("e.gp").alias("g_pos"),
            F.col("e.gn").alias("g_neg"),
            ((F.col("e.gp") > h) | (F.col("e.gn") > h)).alias("alarm"),
        )
    )


def holt_forecast(series: DataFrame, alpha_num: int = 1,
                  alpha_den: int = 4, beta_num: int = 1,
                  beta_den: int = 4) -> DataFrame:
    """Holt linear-trend exponential smoothing (level + trend), the
    forecasting companion to ewma: with rational α = an/ad, β = bn/bd,

        l_t = (an·x_t + (ad−an)·(l_{t−1} + b_{t−1})) / ad
        b_t = (bn·(l_t − l_{t−1}) + (bd−bn)·b_{t−1}) / bd

    seeded classically l_0 = x_0, b_0 = x_1 − x_0 (series shorter than
    2 points are dropped). Emits (level, trend, forecast_next =
    level + trend) per point. The per-step expressions are written ONCE
    and replayed textually by the recursive-CTE oracle, so every IEEE
    rounding agrees bit-for-bit cross-engine — the same contract as
    ewma/cusum. One pack exchange + one Catalyst fold, no Python."""
    a, ad, b, bd = alpha_num, alpha_den, beta_num, beta_den
    lv = f"({a} * e.value + {ad - a} * (acc.l + acc.b)) / {ad}"
    tr = f"({b} * (({lv}) - acc.l) + {bd - b} * acc.b) / {bd}"
    packed = (
        series.where(F.col("value").isNotNull())
        .groupBy("conv_id", "metric")
        .agg(F.expr(
            "array_sort(collect_list(struct(idx, value)))").alias("x"))
        .where(F.size("x") >= 2)
    )
    fold = F.expr(f"""
        aggregate(
          slice(x, 2, size(x) - 1),
          struct(
            array(struct(x[0].idx AS idx,
                         CAST(x[0].value AS DOUBLE) AS l,
                         CAST(x[1].value - x[0].value AS DOUBLE) AS b))
              AS hist,
            CAST(x[0].value AS DOUBLE) AS l,
            CAST(x[1].value - x[0].value AS DOUBLE) AS b),
          (acc, e) -> struct(
            array_append(acc.hist,
              struct(e.idx AS idx, CAST({lv} AS DOUBLE) AS l,
                     CAST({tr} AS DOUBLE) AS b)) AS hist,
            CAST({lv} AS DOUBLE) AS l, CAST({tr} AS DOUBLE) AS b),
          acc -> acc.hist)
    """)
    return (
        packed.select("conv_id", "metric", F.explode(fold).alias("e"))
        .select("conv_id", "metric",
                F.col("e.idx").alias("idx"),
                F.col("e.l").alias("level"),
                F.col("e.b").alias("trend"),
                (F.col("e.l") + F.col("e.b")).alias("forecast_next"))
    )
