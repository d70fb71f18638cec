"""Physical-plan shape regressions for scale-critical operators.

These pin the plan PROPERTIES the 100-TB story depends on (exchange
counts, broadcast-vs-shuffle join choices), not the full plan text —
so a Spark upgrade can re-order operators without breaking them, but a
code change that silently reintroduces a shuffle or a cartesian fails
loudly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from matrixprofile_spark.operators import rollup, segments
from matrixprofile_spark.operators import series as S
from matrixprofile_spark.sources.synth import synth_transcripts


@pytest.fixture(scope="module")
def ser(spark):
    return S.project_series(synth_transcripts(spark, 40))


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_decode_segments_has_no_exchange(spark):
    """Chunks decode independently since the idx stream travels inside
    each chunk — decode over an already-materialized segments table must
    plan as scan → decode with ZERO exchanges."""
    pdf = pd.DataFrame({
        "conv_id": "c0", "metric": "m",
        "idx": np.arange(64, dtype=np.int64),
        "ts_epoch": 1_600_000_000 + 60 * np.arange(64, dtype=np.int64),
        "value": np.arange(64, dtype=float),
    })
    seg = segments.encode_segments(spark.createDataFrame(pdf), 16)
    seg_tbl = spark.createDataFrame(seg.toPandas(), schema=seg.schema)
    plan = _plan(segments.decode_segments(seg_tbl))
    assert "Exchange" not in plan, plan


def test_refresh_rollup_joins_are_broadcast(ser):
    """The invalidation key set must broadcast: base sheds invalidated
    buckets via a broadcast anti-join and the raw re-scan is a broadcast
    semi-join — a sort-merge join here would shuffle the base/raw tables
    on every refresh."""
    is_late = (F.abs(F.hash("conv_id", "idx")) % 10) == 0
    on_time, late = ser.where(~is_late), ser.where(is_late)
    base = rollup.rollup_from_raw(on_time, 60)
    plan = _plan(rollup.refresh_rollup(base, on_time, late, 60))
    lines = plan.splitlines()

    def joins(kind):
        return [ln for ln in lines if kind in ln and "Join" in ln]

    assert any("BroadcastHashJoin" in ln for ln in joins("LeftAnti")), plan
    assert any("BroadcastHashJoin" in ln for ln in joins("LeftSemi")), plan
    assert not any("SortMergeJoin" in ln
                   for ln in joins("LeftAnti") + joins("LeftSemi")), plan


def test_cascade_union_shares_one_raw_aggregation(ser):
    """The tier union's three branches must share the raw→1m subtree:
    only ONE partial aggregation keyed by the 1m bucket may appear (the
    1h/1d branches re-aggregate its sketch rows), or the raw table is
    scanned per tier at 100 TB. Count partial_min_by slots: raw→1m is
    the only stage aggregating over ts_epoch-derived first/last."""
    plan = _plan(rollup.cascade_union(ser))
    # one raw-keyed partial agg (floor(ts/60)) regardless of tier count
    assert plan.count("floor((ts_epoch") + plan.count("floor(ts_epoch") <= 2, plan


def test_dedup_lsh_has_no_cartesian(spark):
    """Candidate generation must stay an equi-join on the band hash —
    a cartesian/broadcast-nested-loop here is the n² trap."""
    from matrixprofile_spark.operators import dedup as DD

    docs = spark.createDataFrame(
        [(i, f"w{i % 7} x y z a b c") for i in range(50)],
        "doc_id int, text string",
    )
    sigs = DD.minhash_signatures(DD.shingles(docs, 3, distinct=False), 8)
    pairs = DD.lsh_candidate_pairs(sigs, bands=4)
    plan = _plan(DD.jaccard_pairs(DD.shingles(docs, 3, distinct=False), pairs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_is_single_exchange_no_join(spark):
    """The as-of join must plan as union → one hash exchange on the key
    → one window — never a (range) join: a non-equi ts join explodes to
    the per-key cross product before any per-row max at 100 TB."""
    from matrixprofile_spark.operators import temporal as T

    left = spark.createDataFrame(
        [("c", 1, 100)], "conv_id string, turn_idx long, ts_epoch long")
    right = spark.createDataFrame(
        [("c", 7, 100)], "conv_id string, turn_idx long, ts_epoch long")
    plan = _plan(T.asof_join(left, right, ["conv_id"]))
    assert "Join" not in plan
    assert plan.count("Exchange") == 1
    assert "Window" in plan


def test_rare_shingle_pairs_reuses_shingle_exchange(spark):
    """The df<=F frequency cut is a window over the same shingle key the
    candidate self-join shuffles on — the plan must not pay a separate
    groupBy+join-back round trip for the frequency, and must contain no
    cartesian product."""
    from matrixprofile_spark.operators import dedup as DD

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f")], "doc_id long, text string")
    plan = _plan(DD.rare_shingle_pairs(docs, n=3, max_shingle_freq=5))
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    # frequency via window on the join key, not an aggregate+join-back
    assert "count(1) windowspecdefinition(shingle" in plan


def test_round6_aggregate_operators_are_single_exchange(spark):
    """counter_increase, time_weighted_avg, m4_downsample,
    histogram_rollup and corpus_keep must each plan exactly ONE
    exchange: their groupBy keys are supersets of (or equal to) the
    window partition keys, so the window's hash partitioning already
    satisfies the aggregation's clustering requirement."""
    from matrixprofile_spark.operators.downsample import m4_downsample
    from matrixprofile_spark.operators.rates import (
        counter_increase, time_weighted_avg)
    from matrixprofile_spark.operators import rollup as RU
    from matrixprofile_spark.operators import textstats as TS

    ser = spark.createDataFrame(
        [("c", "m", 0, 100, 1.0)],
        "conv_id string, metric string, idx long, ts_epoch long, "
        "value double")
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    for df in (counter_increase(ser, 60), time_weighted_avg(ser, 3600),
               m4_downsample(ser, 120), RU.histogram_rollup(ser, 3600),
               TS.corpus_keep(docs)):
        plan = _plan(df)
        assert plan.count("Exchange") == 1 and "Join" not in plan


def test_minhash_sets_fuses_signature_and_set_aggregates(spark):
    """The fused LSH pipeline must aggregate the exploded shingle
    stream ONCE: minhash_sets computes the k min-hashes and the
    exact-Jaccard set in the same groupBy, and every consumer reuses
    that exchange. Two shingle explodes in the plan would mean the
    pipeline pays the md5 pass twice at 100 TB."""
    from matrixprofile_spark.operators import dedup as DD

    docs = spark.createDataFrame(
        [(i, f"w{i % 7} x y z a b c") for i in range(50)],
        "doc_id int, text string",
    )
    out = DD.lsh_jaccard_dedup(docs, n=3, num_hashes=8, bands=4)
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the shingle explode (concat_ws over token slices) must NOT appear
    # downstream of the checkpoint — every consumer reads the pinned
    # (sig, sh_set) table; only the banding explode over sig remains
    assert "slice(__toks" not in plan, plan
    assert "Scan ExistingRDD" in plan, plan  # the checkpoint boundary
    # and no per-consumer re-aggregation of shingles survives
    assert "partial_min(md5" not in plan, plan
    assert "partial_collect_set" not in plan, plan

    # the pre-checkpoint side: repartition(id) must be the ONLY
    # exchange — the per-doc groupBy's ClusteredDistribution(id) is
    # satisfied by hashpartitioning(id, any n), so the md5-heavy
    # shingle stage runs at cluster width with no extra shuffle
    from pyspark.sql import functions as F

    par = spark.sparkContext.defaultParallelism
    pre = DD.minhash_sets(
        DD.shingles(docs.repartition(par, F.col("doc_id")),
                    3, distinct=False), 8)
    pre_plan = _plan(pre)
    assert pre_plan.count("Exchange") == 1, pre_plan


def test_round7_sequential_folds_are_single_exchange(spark):
    """The detector family (EWMA, two-sided CUSUM, Holt) packs each
    series once and folds in-row: exactly ONE exchange each, and in
    particular NO re-join of fold outputs (cusum_flags carries both
    sides in one fold state). anomaly_zscore and rollup_quantiles are
    window ops whose rank/count share one hash partitioning — also a
    single exchange."""
    from matrixprofile_spark.operators.detect import (
        anomaly_zscore, cusum_flags, ewma, holt_forecast)
    from matrixprofile_spark.operators.rollup import rollup_quantiles

    ser = spark.createDataFrame(
        [("c", "m", 0, 100, 1.0)],
        "conv_id string, metric string, idx long, ts_epoch long, "
        "value double")
    for df in (ewma(ser), cusum_flags(ser, 1, 2, 8), holt_forecast(ser),
               anomaly_zscore(ser, w=4), rollup_quantiles(ser, 3600)):
        plan = _plan(df)
        assert plan.count("Exchange") == 1 and "Join" not in plan, plan


def test_round7_funnel_is_two_exchanges_no_join(spark):
    """funnel_counts: one groupBy(user) exchange + the final global
    single-partition aggregate — no self-joins, no windows, step count
    rows out regardless of input size."""
    from matrixprofile_spark.operators.temporal import funnel_counts

    ev = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 20)],
        "user_id long, event_type string, ts_us long")
    plan = _plan(funnel_counts(ev, ("a", "b")))
    assert plan.count("Exchange") == 2 and "Join" not in plan, plan


def test_parquet_scan_prunes_and_pushes_down(spark, tmp_path):
    """Filters and column pruning must reach the parquet scan: a
    token_stats projection over a filtered documents scan reads ONLY
    (doc_id, text) and ships the predicate into PushedFilters. A
    wrapper that breaks this (e.g. a Python-UDF pre-pass or a cache()
    boundary) would make every 100-TB scan a full-table read."""
    import re

    from matrixprofile_spark.operators import textstats as TS

    pq = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, f"text {i}", "en", i % 7) for i in range(200)],
        "doc_id long, text string, lang string, extra long",
    ).write.parquet(pq)

    docs = spark.read.parquet(pq).where(F.col("doc_id") < 100)
    plan = _plan(TS.token_stats(docs))
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    cols = re.search(r"FileScan parquet \[([^\]]*)\]", scan).group(1)
    names = {c.split("#")[0] for c in cols.split(",")}
    assert names == {"doc_id", "text"}, cols  # lang/extra pruned
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,100)]" \
        in scan, scan
