"""Tier-1 Spark parity: Arrow-bridged kernels == pure-NumPy kernels,
golden series embedded as a single-conversation series table; plus
salted-vs-unsalted bit-parity (FIXTURES.md F6 invariant)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from matrixprofile_spark.kernels import workflows as W
from matrixprofile_spark.kernels.mpdist import mpdist
from matrixprofile_spark.operators import profile as P
from matrixprofile_spark.operators.salted import salted_mpx_profiles
from matrixprofile_spark.plans.compute import analyze, compute

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def sampledata():
    return np.loadtxt(os.path.join(GOLDEN, "sampledata.txt"))


@pytest.fixture(scope="module")
def golden_series(spark, sampledata):
    pdf = pd.DataFrame(
        {
            "conv_id": "golden",
            "metric": "value",
            "idx": np.arange(len(sampledata), dtype="int64"),
            "ts_epoch": 1_600_000_000 + 60 * np.arange(len(sampledata), dtype="int64"),
            "value": sampledata,
        }
    )
    return spark.createDataFrame(pdf).cache()


@pytest.fixture(scope="module")
def two_series(spark, sampledata):
    rng = np.random.RandomState(5)
    other = rng.uniform(size=400)
    frames = []
    for cid, vals in (("golden", sampledata), ("other", other)):
        frames.append(
            pd.DataFrame(
                {
                    "conv_id": cid,
                    "metric": "value",
                    "idx": np.arange(len(vals), dtype="int64"),
                    "ts_epoch": 1_600_000_000 + 60 * np.arange(len(vals), dtype="int64"),
                    "value": vals,
                }
            )
        )
    return spark.createDataFrame(pd.concat(frames)).cache()


def test_mpx_profiles_matches_kernel(golden_series, sampledata):
    row = P.mpx_profiles(golden_series, 32).collect()[0]
    prof = W.mpx_profile(sampledata, 32)
    np.testing.assert_allclose(np.array(row["mp"]), prof["mp"], atol=1e-12)
    np.testing.assert_array_equal(np.array(row["pi"]), prof["pi"])
    assert row["ez"] == 0 and row["algorithm"] == "mpx" and not row["join"]


def test_stomp_profiles_matches_kernel(golden_series, sampledata):
    row = P.stomp_profiles(golden_series, 32).collect()[0]
    prof = W.stomp(sampledata, 32) if hasattr(W, "stomp") else None
    from matrixprofile_spark.kernels.stomp import stomp

    prof = stomp(sampledata, 32)
    np.testing.assert_allclose(np.array(row["mp"]), prof["mp"], atol=1e-12)
    np.testing.assert_allclose(np.array(row["lmp"]), prof["lmp"])
    np.testing.assert_array_equal(np.array(row["rpi"]), prof["rpi"])


def test_scrimp_profiles_deterministic(golden_series):
    a = P.scrimp_profiles(golden_series, 32, sample_pct=1.0, seed=3).collect()[0]
    b = P.scrimp_profiles(golden_series, 32, sample_pct=1.0, seed=3).collect()[0]
    np.testing.assert_array_equal(np.array(a["mp"]), np.array(b["mp"]))
    assert a["algorithm"] == "scrimp++"


def test_skimp_profiles_window_sweep(two_series, sampledata):
    rows = P.skimp_profiles(two_series, windows=[16, 32]).collect()
    assert len(rows) == 4  # 2 series × 2 windows
    got = {(r["conv_id"], r["w"]): r for r in rows}
    prof = W.mpx_profile(sampledata, 32)
    np.testing.assert_allclose(
        np.array(got[("golden", 32)]["mp"]), prof["mp"], atol=1e-12
    )


def test_worklist_short_series_returns_empty(spark):
    """A worklist row whose series is too short for its window must be
    skipped (zero rows), not crash inside a w=4 kernel it was never
    going to keep (the pre-fix guard computed-then-sliced)."""
    wl = spark.createDataFrame(
        [("tiny", "value", [1.0, 2.0, 3.0, 4.0, 5.0], 16),
         ("ok", "value", [float(x % 7) for x in range(64)], 16)],
        "conv_id string, metric string, values array<double>, w int",
    )
    rows = P.skimp_profiles_from_worklist(wl).collect()
    assert [r["conv_id"] for r in rows] == ["ok"]


def test_mpx_profiles_short_series_returns_empty(spark):
    """n < w through mpx_profiles must skip, not crash: the pre-fix
    branch ran the kernel (negative profile length) before slicing."""
    df = spark.createDataFrame(
        [("tiny", "value", 0, 0.0, 1.0),
         ("tiny", "value", 1, 1.0, 2.0),
         ("tiny", "value", 2, 2.0, 3.0),
         ("tiny", "value", 3, 3.0, 4.0),
         ("tiny", "value", 4, 4.0, 5.0)],
        "conv_id string, metric string, idx long, ts_epoch double, value double",
    )
    assert P.mpx_profiles(df, 16).count() == 0


def test_discoveries_match_kernel(golden_series, sampledata):
    prof_df = P.mpx_profiles(golden_series, 32)
    disc = P.with_discoveries(prof_df, golden_series).collect()[0]
    mp, pi = W.mpx_self_join(sampledata, 32) if hasattr(W, "mpx_self_join") else (None, None)
    from matrixprofile_spark.kernels.mpx import mpx_self_join
    from matrixprofile_spark.kernels import discover as D

    mp, pi = mpx_self_join(sampledata, 32)
    ez = int(np.ceil(32 / 4.0))
    np.testing.assert_array_equal(
        np.array(disc["discords"]), D.top_k_discords(mp, 32, ez=ez)
    )
    np.testing.assert_array_equal(
        np.array(disc["regimes"]), D.extract_regimes(D.fluss(pi, 32), 32)
    )
    mot = D.top_k_motifs(sampledata, mp, pi, 32, ez=ez)
    assert [list(p) for p in disc["motif_pairs"]] == [m["motifs"] for m in mot]


def test_snippet_profiles(golden_series, sampledata):
    rows = P.snippet_profiles(golden_series, 64, window_size=32).collect()
    idx = sorted((r["rank"], r["index"]) for r in rows)
    assert idx == [(0, 384), (1, 704)]


def test_pairwise_mpdist(two_series, sampledata):
    rows = P.pairwise_mpdist(two_series, 16, metric="value").collect()
    assert len(rows) == 1
    r = rows[0]
    rng = np.random.RandomState(5)
    other = rng.uniform(size=400)
    np.testing.assert_almost_equal(
        r["mpdist"], mpdist(sampledata, other, 16), decimal=10
    )


def test_salted_equals_unsalted(two_series):
    plain = {
        r["conv_id"]: r
        for r in P.mpx_profiles(two_series, 32).collect()
    }
    salted = {
        r["conv_id"]: r
        for r in salted_mpx_profiles(two_series, 32, hot_threshold=300, bands=7).collect()
    }
    assert set(plain) == set(salted)
    for cid in plain:
        np.testing.assert_allclose(
            np.array(salted[cid]["mp"]), np.array(plain[cid]["mp"]), atol=1e-9
        )
        np.testing.assert_array_equal(
            np.array(salted[cid]["pi"]), np.array(plain[cid]["pi"])
        )


def test_facade_compute_and_analyze(golden_series, sampledata):
    prof = compute(golden_series, windows=32)
    assert prof.count() == 1
    multi = compute(golden_series, windows=[16, 32])
    assert multi.count() == 2
    disc = analyze(golden_series, windows=32)
    row = disc.collect()[0]
    assert len(row["discords"]) > 0


def test_global_top_discords(two_series):
    profs = P.mpx_profiles(two_series, 16)
    disc = P.with_discoveries(profs, two_series)
    top = P.global_top_discords(disc, profs, k=3).collect()
    assert len(top) == 3
    assert top[0]["distance"] >= top[-1]["distance"]
