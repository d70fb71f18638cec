"""Facade dispatch contracts — mirrors the reference's tests/test_compute.py
field assertions (algorithm / class / sample_pct discrimination) for both
the kernel-level workflow facade and the Spark plan facade."""

from __future__ import annotations

import numpy as np
import pytest

from matrixprofile_spark.kernels import workflows as W
from matrixprofile_spark.plans import compute as PC


@pytest.fixture(scope="module")
def ts():
    rng = np.random.default_rng(3)
    return np.sin(np.arange(300) * 0.2) + rng.normal(0, 0.1, 300)


def test_kernel_compute_single_window_exact(ts):
    prof = W.compute(ts, windows=32)
    assert prof["algorithm"] == "mpx" and prof["class"] == "MatrixProfile"
    assert prof["sample_pct"] == 1


def test_kernel_compute_single_window_approx(ts):
    prof = W.compute(ts, windows=32, sample_pct=0.5, seed=11)
    assert prof["algorithm"] == "scrimp++"
    assert prof["class"] == "MatrixProfile"
    assert prof["sample_pct"] == 0.5


def test_kernel_compute_multiple_windows_pmp(ts):
    prof = W.compute(ts, windows=[8, 16, 32])
    assert prof["class"] == "PMP"
    assert list(prof["windows"]) == [8, 16, 32]
    assert prof["pmp"].shape[0] == 3


def test_kernel_compute_window_too_small_raises(ts):
    with pytest.raises(ValueError):
        W.compute(ts, windows=3)


def test_kernel_analyze_appends_discoveries(ts):
    prof = W.analyze(ts, windows=32)
    assert "motifs" in prof and "discords" in prof
    assert len(prof["discords"]) > 0


def test_spark_compute_dispatch(spark, ts):
    rows = [("a", "m", i, float(i), float(x)) for i, x in enumerate(ts)]
    ser = spark.createDataFrame(
        rows,
        "conv_id string, metric string, idx long, ts_epoch double, value double",
    )
    exact = PC.compute(ser, windows=32).collect()
    assert len(exact) == 1 and exact[0]["algorithm"] == "mpx"
    pmp = PC.compute(ser, windows=[8, 16]).collect()
    assert sorted(r["w"] for r in pmp) == [8, 16]
    approx = PC.compute(ser, windows=32, sample_pct=0.5).collect()
    assert approx[0]["algorithm"] == "scrimp++"
    ana = PC.analyze(ser, windows=32).collect()
    assert len(ana) == 1 and len(ana[0]["discords"]) > 0
