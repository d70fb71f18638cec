"""Exact-value parity micro-tests lifted from the reference's own suite.

Each case reproduces a concrete expected array published in
/root/reference/tests/*.py, pinning our kernels to the reference's
numeric behavior on its own test inputs (beyond the MATLAB goldens,
which cover the long-series paths):

- pearson_to_euclidean 1d/2d   (tests/test_core.py:270-287)
- moving_min / moving_max      (tests/test_core.py:309-344)
- mass2 complex profile        (tests/test_mass2.py:20-32)
- top_k_discords suppression   (tests/test_top_k_discords.py:20-63)
- annotation vectors           (tests/test_annotation_vector.py:85-145)
- all-inf motif profile        (tests/test_top_k_motifs.py:19-33)
- constant-series pairwise     (tests/test_pairwise_dist.py:23-39)

The remaining reference expected values (binary_split, mpdist scalars,
regimes, snippets, MATLAB long-series goldens) were already asserted in
tests/test_kernels.py.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from matrixprofile_spark.kernels.discover import (
    pearson_to_euclidean,
    top_k_discords,
)
from matrixprofile_spark.kernels.mass import mass2
from matrixprofile_spark.kernels.moving import moving_max, moving_min


def test_pearson_to_euclidean_1d_reference_values():
    a = np.array([0.23, 0.5, 0.34, 0.67, 0.88])
    desired = np.array([2.48193473, 2, 2.29782506, 1.62480768, 0.9797959])
    np.testing.assert_almost_equal(pearson_to_euclidean(a, [4]), desired)


def test_pearson_to_euclidean_2d_reference_values():
    a = np.array([[0.23, 0.5, 0.34, 0.67, 0.88],
                  [0.23, 0.5, 0.34, 0.67, 0.88]])
    desired = np.array([[2.48193473, 2, 2.29782506, 1.62480768, 0.9797959],
                        [2.48193473, 2, 2.29782506, 1.62480768, 0.9797959]])
    np.testing.assert_almost_equal(pearson_to_euclidean(a, [4, 4]), desired)


def test_moving_min_reference_values():
    np.testing.assert_equal(
        moving_min(np.array([1, 1, 1, 2, 0, 2]), 4), np.array([1, 0, 0]))
    np.testing.assert_equal(
        moving_min(np.array([1, 0, 1, 2, 0, 2]), 4), np.array([0, 0, 0]))
    np.testing.assert_equal(
        moving_min(np.array([1, 1, 1, 2, 0, 2]), 2),
        np.array([1, 1, 1, 0, 0]))


def test_moving_max_reference_values():
    np.testing.assert_equal(
        moving_max(np.array([1, 1, 1, 2, 0, 2]), 4), np.array([2, 2, 2]))
    np.testing.assert_equal(
        moving_max(np.array([1, 0, 1, 2, 0, 2]), 4), np.array([2, 2, 2]))
    np.testing.assert_equal(
        moving_max(np.array([1, 1, 1, 2, 0, 2]), 2),
        np.array([1, 1, 2, 2, 2]))


def test_mass2_reference_values():
    ts = np.array([1, 1, 1, 2, 1, 1, 4, 5])
    query = np.array([2, 1, 1, 4])
    desired = np.array([
        0.67640791 - 1.37044402e-16j,
        3.43092352 + 0.00000000e+00j,
        3.43092352 + 1.02889035e-17j,
        0.0 + 0.00000000e+00j,
        1.85113597 + 1.21452707e-17j,
    ])
    np.testing.assert_almost_equal(mass2(ts, query), desired)


def test_discords_all_same_mp():
    # all-equal profile, ez=2: suppression walks 9 -> 6 -> 3
    out = top_k_discords(np.ones(10), w=4, ez=2, k=3)
    np.testing.assert_equal(out, np.array([9, 6, 3]))


def test_discords_no_exclusion():
    out = top_k_discords(np.array([1.0, 2, 3, 4]), w=4, ez=0, k=3)
    np.testing.assert_equal(out, np.array([3, 2, 1]))


def test_discords_no_exclusion_all():
    out = top_k_discords(np.array([1.0, 2, 3, 4]), w=4, ez=0, k=4)
    np.testing.assert_equal(out, np.array([3, 2, 1, 0]))


def test_discords_exclude_one():
    # ez=1: picking 3 masks 2; picking 1 masks 0 -> only [3, 1] remain
    out = top_k_discords(np.array([1.0, 2, 3, 4]), w=4, ez=1, k=4)
    np.testing.assert_equal(out, np.array([3, 1]))


def test_annotation_vectors_reference_values():
    """tests/test_annotation_vector.py:85-145 exact expected AVs."""
    from matrixprofile_spark.kernels import transform as T

    np.testing.assert_almost_equal(
        T.make_default_av(np.arange(6, dtype=float), 3), [1, 1, 1, 1])

    complexity_cases = [
        ([3., 3., 3., 3., 3., 3.], [0., 0., 0., 0.]),
        ([0., 1., 2., 3., 4., 5.], [0., 0., 0., 0.]),
        ([0., 3., 0., 2., 0., 1.],
         [0.47295372330527, 0.32279030890406757, 0.13962038997193682, 0.]),
    ]
    for ts, expect in complexity_cases:
        np.testing.assert_almost_equal(
            T.make_complexity_av(np.array(ts), 3), expect)

    meanstd_cases = [
        ([3., 3., 3., 3., 3., 3.], [0., 0., 0., 0.]),
        ([-10., 10., -10., 1., -1., 1.], [0., 0., 1., 1.]),
        ([0., 3., 0., 2., 0., 1.], [0., 0., 1., 1.]),
    ]
    for ts, expect in meanstd_cases:
        np.testing.assert_almost_equal(
            T.make_meanstd_av(np.array(ts), 3), expect)

    clipping_cases = [
        ([3., 3., 3., 3., 3., 3.], [0., 0., 0., 0.]),
        ([0., 1., 2., 3., 4., 5.], [0., 1., 1., 0.]),
        ([0., 3., 0., 2., 0., 1.], [0., 0.5, 0.5, 1.]),
    ]
    for ts, expect in clipping_cases:
        np.testing.assert_almost_equal(
            T.make_clipping_av(np.array(ts), 3), expect)


def test_motifs_all_inf_profile_empty():
    """tests/test_top_k_motifs.py:19-33 — an all-inf profile yields no
    motifs (our kernel signature is array-based, not profile-dict)."""
    from matrixprofile_spark.kernels.discover import top_k_motifs

    out = top_k_motifs(
        ts=np.ones(8, dtype=float),
        mp=np.full(5, np.inf),
        pi=np.zeros(5, dtype=np.int64),
        w=4,
    )
    assert out == []


def test_pairwise_dist_constant_series_reference_values():
    """tests/test_pairwise_dist.py:23-39 — identical series at distance
    0; constant (sigma=0) series at the w/2-capped distance 4."""
    from matrixprofile_spark.kernels.mpdist import pairwise_dist

    X = [np.arange(100, dtype=float), np.arange(100, dtype=float),
         np.ones(100), np.zeros(100)]
    np.testing.assert_equal(pairwise_dist(X, 8),
                            np.array([0.0, 4, 4, 4, 4, 4]))


@pytest.fixture(scope="module")
def sampledata():
    return np.loadtxt(
        os.path.join(os.path.dirname(__file__), "golden", "sampledata.txt"))


def test_compute_with_query_dispatches_ab_join(sampledata):
    """tests/test_compute.py:36-48 — query= selects the AB-join path:
    join=True, query embedded, still mpx."""
    from matrixprofile_spark.kernels import workflows as W

    query = sampledata[100:200]
    p = W.compute(sampledata, windows=32, query=query)
    assert p["algorithm"] == "mpx" and p["class"] == "MatrixProfile"
    assert p["join"] is True and p["w"] == 32 and p["sample_pct"] == 1
    np.testing.assert_equal(p["data"]["query"], query)


def test_compute_no_windows_runs_max_subsequence_then_skimp(sampledata):
    """tests/test_compute.py:85-106 — no windows: threshold drives
    maximum_subsequence, then skimp over the inferred window range."""
    from matrixprofile_spark.kernels import workflows as W

    p = W.compute(sampledata)
    assert p["algorithm"] == "skimp" and p["class"] == "PMP"
    assert p["sample_pct"] == 1
    p = W.compute(sampledata, sample_pct=0.1)
    assert p["algorithm"] == "skimp" and p["class"] == "PMP"
    assert p["sample_pct"] == 0.1


def test_analyze_branches_reference_dispatch(sampledata):
    """tests/test_analyze.py:39-100 (minus figures — plotting is
    descoped per SURVEY 2.1): query -> AB-join mpx with discoveries
    appended; no windows -> skimp PMP, sample_pct passed through."""
    from matrixprofile_spark.kernels import workflows as W

    query = sampledata[100:200]
    p = W.analyze(sampledata, windows=32, query=query)
    assert p["algorithm"] == "mpx" and p["join"] is True
    assert "motifs" in p and "discords" in p
    np.testing.assert_equal(p["data"]["query"], query)

    p = W.analyze(sampledata, sample_pct=0.1)
    assert p["algorithm"] == "skimp" and p["class"] == "PMP"
    assert p["sample_pct"] == 0.1
    assert "motifs" in p and "discords" in p
