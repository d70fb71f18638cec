"""Hand-case and loop-parity tests for the round-7 sequential /
distributional operators: anomaly_zscore, ewma, cusum_flags,
rollup_quantiles, sax_symbols, rolling_corr, funnel_counts.

Every case is verifiable by hand or by a plain-Python replay of the
SAME arithmetic sequence (the cross-engine determinism contract these
operators advertise)."""

from __future__ import annotations

from matrixprofile_spark.operators import detect as DT
from matrixprofile_spark.operators import series as S
from matrixprofile_spark.operators.rollup import rollup_quantiles
from matrixprofile_spark.operators.temporal import funnel_counts

SERIES_SCHEMA = (
    "conv_id string, metric string, idx long, ts_epoch double, value double"
)


def _series(spark, vals, conv="c", metric="m", t0=0.0):
    rows = [(conv, metric, i, t0 + i, float(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, SERIES_SCHEMA)


def test_anomaly_zscore_flags_spike_only(spark):
    # 8 steady points, then a spike, then steady again (w=4, z=3).
    vals = [10, 10, 11, 10, 10, 11, 10, 10, 100, 10, 11, 10]
    out = (
        DT.anomaly_zscore(_series(spark, vals), w=4, z=3)
        .toPandas().sort_values("idx")
    )
    # rows 0..3 have no full window and are dropped
    assert out["idx"].tolist() == list(range(4, 12))
    flagged = out[out.is_anomaly]["idx"].tolist()
    # python replay of the cleared inequality
    expect = []
    for i in range(4, 12):
        win = vals[i - 4:i]
        s, q, x = sum(win), sum(v * v for v in win), vals[i]
        if (4 * x - s) ** 2 * 3 > 9 * 4 * (4 * q - s * s):
            expect.append(i)
    assert flagged == expect
    assert 8 in flagged  # the spike is caught
    # the return to baseline right after the spike inflates window
    # variance, so idx 9..11 legitimately un-flag
    assert 5 not in flagged


def test_ewma_matches_python_fold_bitexact(spark):
    vals = [3.0, 7.0, 1.0, 1.0, 9.0, 2.5]
    out = (
        DT.ewma(_series(spark, vals), alpha_num=1, alpha_den=4)
        .toPandas().sort_values("idx")["ewma"].to_numpy()
    )
    s, exp = vals[0], [vals[0]]
    for x in vals[1:]:
        s = (1 * x + 3 * s) / 4
        exp.append(s)
    assert out.tolist() == exp  # bit-exact, not allclose


def test_cusum_alarms_after_level_shift(spark):
    vals = [10.0] * 6 + [14.0] * 6  # +4 shift vs first value, k=1/2
    out = (
        DT.cusum_flags(_series(spark, vals), k_num=1, k_den=2, h=8)
        .toPandas().sort_values("idx")
    )
    gp, gn, exp_p, exp_n = 0.0, 0.0, [0.0], [0.0]
    for x in vals[1:]:
        gp = max(0.0, gp + (x - vals[0]) - 0.5)
        gn = max(0.0, gn - (x - vals[0]) - 0.5)
        exp_p.append(gp)
        exp_n.append(gn)
    assert out["g_pos"].tolist() == exp_p
    assert out["g_neg"].tolist() == exp_n
    # g_pos after shift: 3.5, 7, 10.5 → alarm from the 3rd shifted point
    assert out[out.alarm]["idx"].tolist() == [8, 9, 10, 11]


def test_rollup_quantiles_hand_case(spark):
    # one 1h bucket holding values 1..10: rank(p) = (p*10+99) DIV 100
    # → p50 rank 5 (value 5), p95 rank 10, p99 rank 10
    df = _series(spark, list(range(1, 11)))
    out = rollup_quantiles(df, bucket_s=3600, pcts=(50, 95, 99)).toPandas()
    got = {int(r.pct): r.q_value for r in out.itertuples()}
    assert got == {50: 5.0, 95: 10.0, 99: 10.0}
    assert set(out["n_obs"]) == {10}


def test_rollup_quantiles_tie_break_unique(spark):
    # duplicate values across two conversations: the rank window orders
    # by (value, conv_id, idx) so exactly ONE row matches each rank
    a = _series(spark, [5, 5, 5, 5], conv="a")
    b = _series(spark, [5, 5, 5, 5], conv="b")
    out = rollup_quantiles(a.union(b), 3600, (50,)).toPandas()
    assert len(out) == 1 and out.q_value[0] == 5.0 and out.n_obs[0] == 8


def test_sax_symbols_hand_case(spark):
    # values 1..8: quartile breakpoints at ranks (k*8+3) DIV 4 = 2,4,6
    # → t=(2,4,6); segments of 4: sums 10 (symbol 2), 26 (symbol 4)
    out = (
        S.sax_symbols(_series(spark, range(1, 9)), paa_w=4)
        .toPandas().sort_values("seg_idx")
    )
    assert out["symbol"].tolist() == [2, 4]
    assert out["n_points"].tolist() == [4, 4]


def test_sax_symbols_ragged_tail_kept(spark):
    out = S.sax_symbols(_series(spark, range(1, 11)), paa_w=4).toPandas()
    assert sorted(out["n_points"]) == [2, 4, 4]


def test_rolling_corr_perfect_linearity(spark):
    # text length = 2 * ts-gap + 5 → Pearson corr ≡ 1 on every window:
    # corr_num² == den2_x · den2_y exactly (integer-valued doubles)
    gaps = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3, 2, 3, 8, 4]
    rows = []
    t = 1000.0
    for i, g in enumerate([0] + gaps):
        t += g
        rows.append(("c", i, t, "x" * (2 * g + 5)))
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx long, ts_epoch double, text string"
    )
    out = S.rolling_corr(df, w=16).toPandas()
    assert len(out) == len(gaps) - 15
    for r in out.itertuples():
        assert r.corr_num * r.corr_num == r.den2_x * r.den2_y
        assert r.corr_num > 0


def test_funnel_counts_greedy_order(spark):
    # u1: full ordered funnel. u2: view BEFORE signup → stops at step 1.
    # u3: signup→view→click but no purchase. u4: never signs up.
    ev = [
        ("u1", "signup", 10), ("u1", "view", 20), ("u1", "click", 30),
        ("u1", "purchase", 40),
        ("u2", "view", 5), ("u2", "signup", 10), ("u2", "click", 15),
        ("u3", "signup", 1), ("u3", "view", 2), ("u3", "click", 3),
        ("u4", "view", 1), ("u4", "click", 2), ("u4", "purchase", 3),
    ]
    df = spark.createDataFrame(
        ev, "user_id string, event_type string, ts_us long"
    )
    out = funnel_counts(df, ("signup", "view", "click", "purchase"))
    got = {r.step: r.n_users for r in out.collect()}
    # u2's click IS after its (post-signup-missing) view? No: step2 needs
    # a view strictly after signup(10); u2 has none → u2 stops at step 1.
    assert got == {1: 3, 2: 2, 3: 2, 4: 1}


def test_funnel_strict_tie_not_after(spark):
    ev = [("u", "signup", 10), ("u", "view", 10)]  # tie → NOT after
    df = spark.createDataFrame(
        ev, "user_id string, event_type string, ts_us long"
    )
    out = funnel_counts(df, ("signup", "view"))
    got = {r.step: r.n_users for r in out.collect()}
    assert got == {1: 1, 2: 0}


def test_skimp_sampled_bfs_prefix(spark):
    # sample_pct=0.5 over 5 windows keeps the binary_split prefix
    # [0,2] → windows {8,32}, and each kept profile equals the full run
    import numpy as np

    from matrixprofile_spark.kernels.workflows import mpx_profile
    from matrixprofile_spark.operators import profile as P

    rng = np.random.default_rng(11)
    vals = (np.sin(np.arange(128) * 0.21) + rng.normal(0, 0.1, 128))
    ser = _series(spark, vals)
    out = P.skimp_profiles(
        ser, windows=[8, 16, 32, 48, 64], sample_pct=0.5
    ).toPandas()
    assert sorted(out["w"]) == [8, 32]
    for w in (8, 32):
        got = np.asarray(out[out.w == w]["mp"].iloc[0])
        np.testing.assert_allclose(got, mpx_profile(vals, w)["mp"], atol=1e-9)


def test_hist_quantiles_hand_case(spark):
    # bins 0(x5), 1(x4), 2(x1): n=10 → p50 rank 5 → bin0 (cum 5);
    # p95 rank 10 → bin2; p99 rank 10 → bin2
    from matrixprofile_spark.operators.rollup import hist_quantiles

    rows = [("c", "m", 0, 0, 5), ("c", "m", 0, 1, 4), ("c", "m", 0, 2, 1)]
    hist = spark.createDataFrame(
        rows, "conv_id string, metric string, bucket_epoch long, "
              "bin long, cnt long")
    out = hist_quantiles(hist, (50, 95, 99)).toPandas()
    got = {int(r.pct): int(r.q_bin) for r in out.itertuples()}
    assert got == {50: 0, 95: 2, 99: 2}
    assert len(out) == 3 and set(out["n_obs"]) == {10}


def test_holt_forecast_matches_python_fold_bitexact(spark):
    vals = [3.0, 7.0, 1.0, 1.0, 9.0, 2.5, 4.0]
    out = (
        DT.holt_forecast(_series(spark, vals), 1, 4, 1, 4)
        .toPandas().sort_values("idx")
    )
    l, b = vals[0], vals[1] - vals[0]
    exp = [(l, b)]
    for x in vals[1:]:
        ln = (x + 3 * (l + b)) / 4
        b = ((ln - l) + 3 * b) / 4
        l = ln
        exp.append((l, b))
    assert out["level"].tolist() == [e[0] for e in exp]  # bit-exact
    assert out["trend"].tolist() == [e[1] for e in exp]
    assert out["forecast_next"].tolist() == [e[0] + e[1] for e in exp]


def test_holt_forecast_tracks_linear_ramp(spark):
    # a pure ramp x_t = 5t: level converges to the line, trend to 5,
    # and the one-step forecast is exact from the seed onward
    vals = [float(5 * i) for i in range(40)]
    out = (
        DT.holt_forecast(_series(spark, vals), 1, 4, 1, 4)
        .toPandas().sort_values("idx")
    )
    assert abs(out["trend"].iloc[-1] - 5.0) < 1e-9
    assert abs(out["forecast_next"].iloc[-1]
               - (out["level"].iloc[-1] + 5.0)) < 1e-9
