"""`.mpf` proto3 wire codec: hand-computed golden bytes (derived from
the public protobuf encoding spec, independent of the codec under
test), reference-semantics round-trips, and the distributed
parquet-of-blobs table round-trip."""

import struct

import numpy as np
import pytest

from matrixprofile_spark.io import mpf as M


def _mp_profile(**over):
    base = {
        "class": "MatrixProfile",
        "algorithm": "mpx",
        "metric": "euclidean",
        "sample_pct": 1.0,
        "w": 4,
        "ez": 1,
        "join": False,
        "mp": np.array([1.5, 0.25, 3.0], dtype="d"),
        "pi": np.array([2, 0, 1], dtype="int64"),
        "lmp": None, "lpi": None, "rmp": None, "rpi": None,
        "data": {"ts": np.array([0.0, 1.0, 2.0, 1.0, 0.0, 1.0], dtype="d"),
                 "query": None},
    }
    base.update(over)
    return base


# ------------------------------------------------------------- goldens


def test_golden_varints():
    # spec examples: 1 -> 0x01, 300 -> 0xAC 0x02, -1 as int64 -> ten
    # bytes of 0xFF..0x01 (two's complement varint)
    assert M._varint(1) == b"\x01"
    assert M._varint(300) == b"\xac\x02"
    assert M._varint(-1) == b"\xff" * 9 + b"\x01"
    assert M._read_varint(b"\xac\x02", 0) == (300, 2)
    assert M._signed64(M._read_varint(b"\xff" * 9 + b"\x01", 0)[0]) == -1


def test_golden_double_matrix_bytes():
    """Hand-assembled DoubleMatrix{rows=2, data=[1.0, -2.5]} per the
    proto3 spec: field1 varint tag 0x08, field3 packed tag 0x1A."""
    expect = (
        b"\x08\x02"                      # rows = 2
        + b"\x1a\x10"                    # data: tag 3|wire2, len 16
        + struct.pack("<2d", 1.0, -2.5)  # packed little-endian doubles
    )
    assert M._enc_double_matrix(np.array([1.0, -2.5])) == expect
    back = M._dec_double_matrix(expect)
    assert back.ndim == 1 and np.array_equal(back, [1.0, -2.5])


def test_golden_mpf_output_prefix():
    """The full message must start with klass at field 1 wire 2:
    tag 0x0A, len 13, b'MatrixProfile' — byte-for-byte what the
    reference's generated pb2 serializer emits for that field."""
    blob = M.to_mpf(_mp_profile())
    assert blob[:15] == b"\x0a\x0dMatrixProfile"


def test_decoder_skips_unknown_fields():
    blob = M.to_mpf(_mp_profile())
    # splice an unknown field 15 (varint) and field 16 (len-delim)
    spliced = blob + b"\x78\x2a" + b"\x82\x01\x03abc"
    p = M.from_mpf(spliced)
    assert p["class"] == "MatrixProfile" and p["w"] == 4


# ---------------------------------------------------------- roundtrips


def test_mp_roundtrip_core_fields():
    p = M.from_mpf(M.to_mpf(_mp_profile()))
    assert p["class"] == "MatrixProfile"
    assert p["algorithm"] == "mpx"
    assert p["metric"] == "euclidean"
    assert p["sample_pct"] == 1.0
    assert p["w"] == 4 and p["ez"] == 1 and p["join"] is False
    assert np.array_equal(p["mp"], [1.5, 0.25, 3.0])
    assert np.array_equal(p["pi"], [2, 0, 1])
    assert p["lmp"] is None and p["rpi"] is None
    assert np.array_equal(p["data"]["ts"], [0, 1, 2, 1, 0, 1])
    assert p["data"]["query"] is None


def test_mp_roundtrip_negative_indices_and_sides():
    prof = _mp_profile(
        lmp=np.array([np.inf, 1.0, 2.0]),
        lpi=np.array([-1, 0, 1], dtype="int64"),
        rmp=np.array([1.0, 2.0, np.inf]),
        rpi=np.array([1, 2, -1], dtype="int64"),
        join=True, ez=0,
    )
    p = M.from_mpf(M.to_mpf(prof))
    assert p["join"] is True and p["ez"] == 0
    assert np.array_equal(p["lpi"], [-1, 0, 1])
    assert np.array_equal(p["rpi"], [1, 2, -1])
    assert np.isinf(p["lmp"][0]) and np.isinf(p["rmp"][2])


def test_mp_roundtrip_nan_bits_exact():
    prof = _mp_profile(mp=np.array([np.nan, 1.0, -0.0]))
    p = M.from_mpf(M.to_mpf(prof))
    assert np.isnan(p["mp"][0])
    assert np.signbit(p["mp"][2])  # -0.0 preserved bit-exactly


def test_mp_roundtrip_motifs_discords_cmp_av():
    prof = _mp_profile(
        motifs=[{"motifs": [0, 5], "neighbors": [2, 9]},
                {"motifs": [1, 7], "neighbors": []}],
        discords=np.array([8, 3, 0]),
        cmp=np.array([0.1, 0.2, 0.3]),
        av=np.array([1.0, 0.5, 1.0]),
        av_type="complexity",
    )
    p = M.from_mpf(M.to_mpf(prof))
    # 1-D mp => locations collapse to scalar rows (reference
    # protobuf_utils.py:344-369 semantics)
    assert p["motifs"] == [{"motifs": [0, 5], "neighbors": [2, 9]},
                           {"motifs": [1, 7], "neighbors": []}]
    assert np.array_equal(p["discords"], [8, 3, 0])
    assert np.allclose(p["cmp"], [0.1, 0.2, 0.3])
    assert np.allclose(p["av"], [1.0, 0.5, 1.0])
    assert p["av_type"] == "complexity"


def test_pmp_roundtrip_2d_and_multidim_locations():
    prof = {
        "class": "PMP",
        "algorithm": "skimp",
        "metric": "pearson",
        "sample_pct": 0.5,
        "windows": np.array([4, 8, 16], dtype="int64"),
        "pmp": np.arange(12, dtype="d").reshape(3, 4),
        "pmpi": np.arange(12, dtype="int64").reshape(3, 4) % 4,
        "data": {"ts": np.arange(8, dtype="d"), "query": None},
        "motifs": [{"motifs": [(0, 2), (1, 3)], "neighbors": [(2, 1)]}],
        "discords": np.array([(0, 3), (2, 0)]),
    }
    p = M.from_mpf(M.to_mpf(prof))
    assert p["class"] == "PMP"
    assert np.array_equal(p["windows"], [4, 8, 16])
    assert p["pmp"].shape == (3, 4) and p["pmpi"].shape == (3, 4)
    assert np.array_equal(p["pmp"], prof["pmp"])
    assert np.array_equal(p["pmpi"], prof["pmpi"])
    # 2-D profile => (row, col) tuples survive
    assert p["motifs"] == [{"motifs": [(0, 2), (1, 3)],
                            "neighbors": [(2, 1)]}]
    assert np.array_equal(p["discords"], [(0, 3), (2, 0)])


def test_query_roundtrip_ab_join():
    prof = _mp_profile(join=True)
    prof["data"]["query"] = np.array([9.0, 8.0, 7.0, 6.0])
    p = M.from_mpf(M.to_mpf(prof))
    assert np.array_equal(p["data"]["query"], [9.0, 8.0, 7.0, 6.0])


def test_bad_class_raises():
    with pytest.raises(ValueError):
        M.to_mpf({"class": "Statistics"})


# --------------------------------------------------- distributed table


def test_profiles_mpf_table_roundtrip(spark, tmp_path):
    from matrixprofile_spark.operators.profile import mpx_profiles

    rng = np.random.RandomState(7)
    ser = spark.createDataFrame(
        [(f"c{c}", "token_count", i, float(v))
         for c in range(3)
         for i, v in enumerate(rng.randn(40).cumsum())],
        "conv_id string, metric string, idx long, value double")

    prof = mpx_profiles(ser, 8)
    path = str(tmp_path / "profiles_mpf")
    M.write_profiles_mpf(prof, path)
    back = M.read_profiles_mpf(spark, path)

    a = {r["conv_id"]: r for r in prof.collect()}
    b = {r["conv_id"]: r for r in back.collect()}
    assert sorted(a) == sorted(b) == ["c0", "c1", "c2"]
    for cid in a:
        assert a[cid]["w"] == b[cid]["w"] == 8
        assert np.array_equal(np.asarray(a[cid]["mp"]),
                              np.asarray(b[cid]["mp"]))
        assert np.array_equal(np.asarray(a[cid]["pi"]),
                              np.asarray(b[cid]["pi"]))
        assert a[cid]["algorithm"] == b[cid]["algorithm"]


# -------------------------------------------------- disk facade parity


def test_disk_facade_roundtrip_both_formats(tmp_path):
    """io/__io.py:177-250 parity: to_disk/from_disk with json and mpf,
    extension appended when missing, format inferred on read."""
    from matrixprofile_spark.io import disk

    prof = _mp_profile()
    for fmt in ("json", "mpf"):
        path = str(tmp_path / f"prof_{fmt}")  # no extension on purpose
        disk.to_disk(prof, path, format=fmt)
        got = disk.from_disk(f"{path}.{fmt}")  # format='infer'
        assert got["class"] == "MatrixProfile"
        assert got["w"] == 4
        assert np.array_equal(got["mp"], [1.5, 0.25, 3.0])
        assert np.array_equal(got["pi"], [2, 0, 1])


def test_disk_facade_errors(tmp_path):
    from matrixprofile_spark.io import disk

    import pytest

    with pytest.raises(ValueError, match="MatrixProfile or PMP"):
        disk.to_disk({"class": "nope"}, str(tmp_path / "x"))
    with pytest.raises(ValueError, match="Unsupported file format"):
        disk.to_disk(_mp_profile(), str(tmp_path / "x"), format="csv")
    with pytest.raises(RuntimeError, match="Unsupported file type"):
        disk.infer_file_format("profile.parquet")
    with pytest.raises(ValueError, match="Unsupported file format"):
        disk.from_disk(str(tmp_path / "x.json"), format="csv")


def test_disk_facade_extension_not_doubled(tmp_path):
    from matrixprofile_spark.io import disk

    p = str(tmp_path / "already.mpf")
    disk.to_disk(_mp_profile(), p, format="mpf")
    assert (tmp_path / "already.mpf").exists()
    assert not (tmp_path / "already.mpf.mpf").exists()
    assert disk.from_disk(p)["algorithm"] == "mpx"


# ------------------------------------------------- property round-trips


from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays as np_arrays

_f64 = st.floats(allow_nan=True, allow_infinity=True,
                 allow_subnormal=True, width=64)


@settings(max_examples=100, deadline=None)
@given(
    n=st.integers(1, 40),
    data=st.data(),
)
def test_mpf_mp_roundtrip_property(n, data):
    """Durability property for the from-scratch proto3 wire codec: any
    MatrixProfile dict round-trips bit-exactly (NaN/inf/denormal mp
    values, negative pi, optional sides present or None)."""
    mp = data.draw(np_arrays(np.float64, n, elements=_f64))
    pi = data.draw(np_arrays(np.int64, n,
                             elements=st.integers(-1, 2**31)))
    sides = data.draw(st.booleans())
    prof = _mp_profile(
        mp=mp, pi=pi,
        w=data.draw(st.integers(4, 64)),
        ez=data.draw(st.integers(0, 8)),
        join=data.draw(st.booleans()),
        lmp=mp[::-1].copy() if sides else None,
        lpi=pi[::-1].copy() if sides else None,
        rmp=None, rpi=None,
    )
    got = M.from_mpf(M.to_mpf(prof))
    assert np.array_equal(got["mp"].view(np.uint64), mp.view(np.uint64))
    assert np.array_equal(got["pi"], pi)
    if sides:
        assert np.array_equal(got["lmp"].view(np.uint64),
                              mp[::-1].view(np.uint64))
        assert np.array_equal(got["lpi"], pi[::-1])
    else:
        assert got["lmp"] is None and got["lpi"] is None
    assert got["w"] == prof["w"] and got["ez"] == prof["ez"]
    assert got["join"] is prof["join"]


@settings(max_examples=50, deadline=None)
@given(
    rows=st.integers(1, 5), cols=st.integers(1, 30), data=st.data(),
)
def test_mpf_pmp_roundtrip_property(rows, cols, data):
    pmp = data.draw(np_arrays(np.float64, (rows, cols), elements=_f64))
    pmpi = data.draw(np_arrays(np.int64, (rows, cols),
                               elements=st.integers(-1, 2**31)))
    prof = {
        "class": "PMP", "algorithm": "skimp", "metric": "pearson",
        "sample_pct": 0.5,
        "windows": np.arange(8, 8 + rows, dtype="int64"),
        "pmp": pmp, "pmpi": pmpi,
        "data": {"ts": None, "query": None},
    }
    got = M.from_mpf(M.to_mpf(prof))
    assert got["class"] == "PMP"
    assert np.array_equal(got["pmp"].view(np.uint64), pmp.view(np.uint64))
    assert np.array_equal(got["pmpi"], pmpi)
    assert np.array_equal(got["windows"], prof["windows"])
