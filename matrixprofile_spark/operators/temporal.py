"""Temporal joins and session detection over transcript streams.

Two operators every time-series store grows once series live in tables
rather than arrays (public kdb/QuestDB/TimescaleDB surface; the
reference's bare-array model has no table joins at all):

- ``asof_join`` — for each left row, the single right row with the
  greatest timestamp at-or-before (backward) / least at-or-after
  (forward) the left timestamp, per key.
- ``sessionize`` — split each conversation's turns into sessions
  wherever the inter-turn gap exceeds a threshold, and aggregate one
  row per session.

Both are pure DataFrame ops. The as-of join deliberately avoids the
naive range join (``l.ts >= r.ts`` non-equi join explodes to the full
per-key cross product before the per-row max — quadratic in points per
key at 100 TB). Instead it uses the union-merge shape: tag both sides,
union, one window pass ordered by (ts, side) carries the most recent
right payload forward onto every left row. Cost = one shuffle of
|L|+|R| rows keyed by the join keys + one sort — the same exchange a
sort-merge join would pay, with no candidate blow-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str = "ts_epoch",
    payload_cols: list[str] | None = None,
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every left row, plus the matching right row's
    ``payload_cols`` (renamed with ``suffix``) and its timestamp as
    ``<ts_col><suffix>``; NULLs where no right row exists on that side.

    Ties: several right rows on one (key, ts) would make the match
    nondeterministic (DuckDB's ASOF JOIN documents the same hazard);
    here the survivor is pinned INSIDE the window ordering — among
    equal-(key, ts) right rows the one with the greatest payload struct
    sorts adjacent to the left row, so the carried value is the
    lexicographic-max payload, deterministically, without the
    one-row-per-(key, ts) pre-aggregate (and its extra exchange) a
    groupBy dedup would cost. Payload columns must therefore be
    orderable types. ``direction='backward'`` matches the greatest
    right ts <= left ts; ``'forward'`` the least >=.
    """
    if payload_cols is None:
        payload_cols = [
            c for c in right.columns if c not in (*keys, ts_col)
        ]
    pay = F.struct(*[F.col(c) for c in payload_cols])
    r1 = right.select(*keys, F.col(ts_col), pay.alias("__pay"))

    # the matched timestamp keeps the RIGHT ts column's own type — a
    # fixed bigint cast would silently truncate fractional timestamps
    rts_type = right.schema[ts_col].dataType
    lside = left.withColumn("__is_left", F.lit(1)).withColumn(
        "__pay", F.lit(None).cast(r1.schema["__pay"].dataType)
    ).withColumn("__rts", F.lit(None).cast(rts_type))
    rside = r1.select(
        *keys,
        F.col(ts_col),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (*keys, ts_col)],
        F.lit(0).alias("__is_left"),
        "__pay",
        F.col(ts_col).alias("__rts"),
    ).select(*lside.columns)

    # backward: right rows sort BEFORE left rows at equal ts (side 0<1)
    # so "at-or-before" includes the same instant, and among tied right
    # rows the max payload sorts LAST (closest to the left row) so
    # last(ignorenulls) picks it; forward mirrors with desc ordering.
    if direction == "backward":
        w = Window.partitionBy(*keys).orderBy(
            F.col(ts_col).asc(), F.col("__is_left").asc(),
            F.col("__pay").asc(),
        ).rowsBetween(Window.unboundedPreceding, 0)
        carried_pay = F.last("__pay", ignorenulls=True).over(w)
        carried_ts = F.last("__rts", ignorenulls=True).over(w)
    elif direction == "forward":
        w = Window.partitionBy(*keys).orderBy(
            F.col(ts_col).asc(), F.col("__is_left").desc(),
            F.col("__pay").desc(),
        ).rowsBetween(0, Window.unboundedFollowing)
        carried_pay = F.first("__pay", ignorenulls=True).over(w)
        carried_ts = F.first("__rts", ignorenulls=True).over(w)
    else:
        raise ValueError(f"invalid asof direction: {direction}")

    merged = lside.unionByName(rside).select(
        "*", carried_pay.alias("__m"), carried_ts.alias(f"{ts_col}{suffix}")
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in payload_cols
    ] + [F.col(f"{ts_col}{suffix}")]
    return merged.where(F.col("__is_left") == 1).select(*out_cols)


def sessionize(
    transcripts: DataFrame, gap_s: int = 300
) -> DataFrame:
    """One row per session: a maximal run of turns in a conversation
    with inter-turn gaps <= gap_s (classic event sessionization;
    Structured Streaming's stateful flavor lives in streaming/, this is
    the batch table op).

    Output: conv_id, session_idx (0-based per conversation),
    start_ts, end_ts, n_turns, span_s. Two window passes over ONE
    (conv_id × turn order) sort — the lag flag and its running sum
    share the exchange — then the session groupBy.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gap = F.col("ts_epoch") - F.lag("ts_epoch").over(w)
    flagged = transcripts.select(
        "conv_id", "turn_idx", "ts_epoch",
        F.when(gap > gap_s, 1).otherwise(0).alias("__new"),
    ).select(
        "conv_id", "ts_epoch",
        F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("session_idx"),
    )
    return (
        flagged.groupBy("conv_id", "session_idx")
        .agg(
            F.min("ts_epoch").alias("start_ts"),
            F.max("ts_epoch").alias("end_ts"),
            F.count(F.lit(1)).alias("n_turns"),
        )
        .select(
            "conv_id", "session_idx", "start_ts", "end_ts", "n_turns",
            (F.col("end_ts") - F.col("start_ts")).alias("span_s"),
        )
    )


def funnel_counts(events: DataFrame, steps: tuple[str, ...],
                  user_col: str = "user_id", type_col: str = "event_type",
                  ts_col: str = "ts_us") -> DataFrame:
    """Ordered funnel: per step k, how many users performed steps
    1..k IN ORDER (each step's event strictly after the previous
    step's chosen event). The chosen event for step k is the EARLIEST
    occurrence after step k−1's — the standard greedy funnel, which is
    also the maximal one (earliest-feasible choice dominates).

    Plan shape: ONE groupBy(user) over events filtered to the funnel's
    event types, computing all steps in a single aggregation pass —
    min(ts where type=step1), then min(ts where type=step2 and
    ts > t1), … — expressible because Spark/ANSI conditional
    aggregates may reference other aggregates only via a two-layer
    select; here each t_k is a scalar subexpression of sorted arrays
    instead: per user we aggregate each step's ordered timestamp list
    once, then resolve the greedy chain with array lookups (filter +
    array_min) in the projection. One exchange on user, step count
    rows out — no self-joins, no windows.

    ts must be an integer column (microseconds) so the strict `>`
    chain is exact; ties across DIFFERENT steps at identical
    microseconds are treated as not-after (strict).
    """
    typed = events.where(F.col(type_col).isin(*steps))
    aggs = [
        F.sort_array(F.collect_list(
            F.when(F.col(type_col) == s, F.col(ts_col)))).alias(f"_ts{k}")
        for k, s in enumerate(steps)
    ]
    per_user = typed.groupBy(F.col(user_col).alias("user")).agg(*aggs)
    # greedy chain: t0 = min(_ts0); t_k = min of _tsk elements > t_{k-1}
    chain = per_user
    prev = None
    for k in range(len(steps)):
        if prev is None:
            expr = F.expr(f"if(size(_ts{k}) > 0, _ts{k}[0], NULL)")
        else:
            expr = F.expr(
                f"array_min(filter(_ts{k}, t -> t > _t{k - 1}))")
        chain = chain.withColumn(f"_t{k}", expr)
        prev = k
    counts = chain.agg(
        *[F.sum(F.when(F.col(f"_t{k}").isNotNull(), 1).otherwise(0))
          .alias(f"_n{k}")
          for k in range(len(steps))],
        # exact integer conversion-lag totals: Σ over users reaching
        # step k of (t_k − t_{k−1}); avg lag = sum/n is one division
        # away for the consumer (kept integer for cross-engine hashing)
        *[F.coalesce(
            F.sum(F.col(f"_t{k}") - F.col(f"_t{k - 1}")), F.lit(0))
          .cast("bigint").alias(f"_lag{k}")
          for k in range(1, len(steps))],
    )
    # single aggregation pass; unpivot the k counters via explode
    rows = F.array(*[
        F.struct(
            F.lit(k + 1).alias("step"),
            F.lit(steps[k]).alias("event_type"),
            F.col(f"_n{k}").cast("bigint").alias("n_users"),
            (F.col(f"_lag{k}").cast("bigint") if k else
             F.lit(0).cast("bigint")).alias("sum_lag"),
        )
        for k in range(len(steps))
    ])
    return (
        counts.select(F.explode(rows).alias("r"))
        .select("r.step", "r.event_type", "r.n_users", "r.sum_lag")
    )


def interval_join(intervals: DataFrame, points: DataFrame, keys,
                  start_col: str = "start_ts", end_col: str = "end_ts",
                  ts_col: str = "ts_epoch",
                  grid_s: int = 3600) -> DataFrame:
    """Interval-containment join: each point row joins every interval
    row with equal `keys` and ``start_col <= ts <= end_col``
    (inclusive) — the third temporal-join shape next to as-of and
    sessionize (public TimescaleDB/QuestDB/Flink interval-join
    surface; the reference's array model has no joins at all).

    Spark plans a raw non-equi ``l.start <= r.ts AND r.ts <= l.end``
    predicate as BroadcastNestedLoopJoin (or a per-key cross product
    under an equi-key) — candidate pairs quadratic in rows-per-key,
    the same trap asof_join avoids. This uses the grid-bucket shape
    instead: every interval explodes to the fixed-width grid cells it
    overlaps (``start DIV G .. end DIV G``), every point computes the
    ONE cell it lives in (``ts DIV G``), and the join becomes a plain
    hash equi-join on (keys…, cell) + a containment post-filter. A
    matching pair meets in exactly one cell — the point's own — so no
    dedup pass is needed. Cost: interval fan-out = span/G + 1 rows
    (pick ``grid_s`` near the typical interval span to keep it O(1));
    one shuffle of each side on (keys, cell); never a cross product.

    Both timestamp columns must be integral (epoch seconds); non-key
    column names must be disjoint across the two inputs.
    """
    keys = list(keys)
    iv = intervals.withColumn(
        "__cell",
        F.explode(F.expr(
            f"sequence({start_col} DIV {grid_s}, {end_col} DIV {grid_s})")))
    pt = points.withColumn("__cell", F.expr(f"{ts_col} DIV {grid_s}"))
    return (
        iv.join(pt, [*keys, "__cell"])
        .where((F.col(ts_col) >= F.col(start_col))
               & (F.col(ts_col) <= F.col(end_col)))
        .drop("__cell")
    )
