"""Property-based round-trip tests for the segment codecs (hypothesis).

The engine's durability story rests on decode(encode(x)) == x holding
bit-exactly for EVERY float64 payload (NaN bit patterns, ±0.0, infs,
denormals) and every timestamp shape (constant gaps, jumps, negatives).
Example-based tests can't sweep that space; these properties do.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from matrixprofile_spark.kernels.compression import (
    decode_timestamps_dod,
    decode_values_gorilla,
    encode_timestamps_dod,
    encode_values_gorilla,
)

_f64 = st.floats(
    allow_nan=True, allow_infinity=True, allow_subnormal=True, width=64
)


@settings(max_examples=200, deadline=None)
@given(arrays(np.float64, st.integers(0, 700), elements=_f64))
def test_value_codec_roundtrip_bitexact(v):
    got = decode_values_gorilla(encode_values_gorilla(v))
    assert got.shape == v.shape
    assert np.array_equal(got.view(np.uint64), v.view(np.uint64))


@settings(max_examples=200, deadline=None)
@given(
    arrays(
        np.int64,
        st.integers(0, 700),
        elements=st.integers(-(2**50), 2**50),
    )
)
def test_timestamp_codec_roundtrip(ts):
    got = decode_timestamps_dod(encode_timestamps_dod(ts))
    assert np.array_equal(got, ts)


@settings(max_examples=50, deadline=None)
@given(
    st.integers(1, 5000),  # n
    st.integers(0, 2**40),  # start
    st.integers(1, 10_000),  # gap
)
def test_constant_gap_timestamps_compress(n, start, gap):
    """Regular series (the common case) must compress far below 8 B/pt."""
    ts = start + gap * np.arange(n, dtype=np.int64)
    enc = encode_timestamps_dod(ts)
    assert np.array_equal(decode_timestamps_dod(enc), ts)
    if n >= 256:
        assert len(enc) < n  # < 1 byte/point on constant gaps


@settings(max_examples=50, deadline=None)
@given(st.integers(2, 5000), _f64)
def test_constant_values_compress(n, x):
    v = np.full(n, x)
    enc = encode_values_gorilla(v)
    got = decode_values_gorilla(enc)
    assert np.array_equal(got.view(np.uint64), v.view(np.uint64))
    if n >= 256:
        assert len(enc) < n  # XOR runs of zero pack to headers only
