"""Bit-exact time-series compression codecs (engine-new, per north_rule).

Replaces the reference's protobuf `.mpf` serialization
(/root/reference/matrixprofile/io/protobuf/proto_messages.proto:9-111)
with the codecs a 10^12-turn store actually needs:

- `encode_timestamps_dod` — delta-of-delta timestamps, zigzag-coded,
  bit-packed per 128-value subblock at that subblock's max bit width.
  Regular stretches (constant gaps → dod = 0) pack to 0 bits/point plus
  a 1-byte subblock header.
- `encode_values_gorilla` — Gorilla-style XOR float64 codec: each value
  XORed with its predecessor, common trailing zeros stripped per
  subblock, remainder bit-packed at the subblock's max significant
  width. Constant runs → 0 bits/point; NaN/±0.0/denormals round-trip
  bit-exactly (decode(encode(x)) == x at the uint64 level).

Design deviation from the Gorilla paper (T. Pelkonen et al., VLDB 2015 —
public spec): the paper's per-value variable-width control stream is
inherently bit-serial, which a Python-only engine cannot execute at
scale (~1 μs/value). This codec keeps the paper's two ideas that carry
the compression (delta-of-delta for timestamps, XOR-with-predecessor +
leading/trailing-zero stripping for floats) but quantizes the bit width
per 128-value subblock instead of per value — every encode/decode step
is then a whole-array NumPy operation (the only sequential step,
XOR-prefix reconstruction, is `np.bitwise_xor.accumulate`). The same
layout choice is what columnar formats make (Parquet bit-packed runs)
for the same vectorization reason.

These run inside Arrow UDFs per ≤4096-point chunk (operators/segments).
"""

from __future__ import annotations

import struct

import numpy as np

_SUB = 128  # values per fixed-width subblock
_U64 = np.uint64

_WBITS = [np.arange(w, dtype=_U64) for w in range(65)]


def _pack(vals: np.ndarray, w: int) -> bytes:
    """Bit-pack uint64 `vals` at fixed width `w`.

    Layout (unchanged wire format): a pure LSB-first bitstream — bit i of
    the stream is bit (i & 7) of byte (i >> 3) — padded with zeros to
    ((n*w + 63)//64 + 1) * 8 bytes (one pad word absorbs reader
    straddle). Expand to a (n, w) bit matrix and np.packbits it; the
    little-endian uint64-word layout of the previous stride-OR writer is
    bit-identical to this bitstream, so old blobs decode unchanged."""
    if w == 0 or len(vals) == 0:
        return b""
    n = len(vals)
    nwords = (n * w + 63) // 64 + 1
    bits = ((vals.astype(_U64)[:, None] >> _WBITS[w]) & _U64(1)).astype(
        np.uint8
    )
    buf = np.zeros(nwords * 64, dtype=np.uint8)
    buf[: n * w] = bits.ravel()
    return np.packbits(buf, bitorder="little").tobytes()


def _packed_nbytes(n: int, w: int) -> int:
    return 0 if (w == 0 or n == 0) else (((n * w + 63) // 64) + 1) * 8


def _unpack(data: bytes, n: int, w: int) -> np.ndarray:
    """Inverse of _pack."""
    if w == 0 or n == 0:
        return np.zeros(n, dtype=_U64)
    bits = np.unpackbits(
        np.frombuffer(data, dtype=np.uint8), bitorder="little", count=n * w
    )
    return np.bitwise_or.reduce(
        bits.reshape(n, w).astype(_U64) << _WBITS[w], axis=1
    )


def _zigzag(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64)
    return ((v << 1) ^ (v >> 63)).view(_U64)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    u = u.astype(_U64)
    return ((u >> _U64(1)) ^ (_U64(0) - (u & _U64(1)))).view(np.int64)


def _encode_subblocks(u: np.ndarray, strip_tz: bool) -> bytes:
    """Split `u` (uint64) into _SUB-sized subblocks, each packed at its
    own max width; header per subblock = [tz:u8][width:u8]."""
    parts = []
    for s in range(0, len(u), _SUB):
        blk = u[s : s + _SUB]
        # block OR carries both reductions as scalars: its lowest set bit
        # is the min trailing-zero count, its bit length the max width
        orv = int(np.bitwise_or.reduce(blk)) if len(blk) else 0
        if strip_tz:
            tz = min((orv & -orv).bit_length() - 1, 63) if orv else 63
            shifted = blk >> _U64(tz) if tz else blk
        else:
            tz = 0
            shifted = blk
        w = (orv >> tz).bit_length()
        parts.append(struct.pack("<BB", tz, w))
        parts.append(_pack(shifted, w))
    return b"".join(parts)


def _decode_subblocks(
    data: bytes, pos: int, n: int, strip_tz: bool
) -> tuple[np.ndarray, int]:
    out = np.empty(n, dtype=_U64)
    done = 0
    while done < n:
        cnt = min(_SUB, n - done)
        tz, w = struct.unpack_from("<BB", data, pos)
        pos += 2
        nb = _packed_nbytes(cnt, w)
        vals = _unpack(data[pos : pos + nb], cnt, w)
        pos += nb
        if strip_tz and tz:
            vals = vals << _U64(tz)
        out[done : done + cnt] = vals
        done += cnt
    return out, pos


def encode_timestamps_dod(ts: np.ndarray) -> bytes:
    """Delta-of-delta timestamp codec (subblock bit-packed zigzags)."""
    ts = np.ascontiguousarray(ts, dtype=np.int64)
    n = len(ts)
    head = struct.pack("<I", n)
    if n == 0:
        return head
    if n == 1:
        return head + struct.pack("<q", int(ts[0]))
    deltas = np.diff(ts)
    dod = np.diff(deltas)
    body = _encode_subblocks(_zigzag(dod), strip_tz=False)
    return head + struct.pack("<qq", int(ts[0]), int(deltas[0])) + body


def decode_timestamps_dod(data: bytes) -> np.ndarray:
    (n,) = struct.unpack_from("<I", data, 0)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    if n == 1:
        return np.array([struct.unpack_from("<q", data, 4)[0]], dtype=np.int64)
    t0, d0 = struct.unpack_from("<qq", data, 4)
    zz, _ = _decode_subblocks(data, 20, n - 2, strip_tz=False)
    dod = _unzigzag(zz)
    deltas = np.empty(n - 1, dtype=np.int64)
    deltas[0] = d0
    deltas[1:] = d0 + np.cumsum(dod)
    out = np.empty(n, dtype=np.int64)
    out[0] = t0
    out[1:] = t0 + np.cumsum(deltas)
    return out


def encode_values_gorilla(values: np.ndarray) -> bytes:
    """XOR float64 codec (subblock-width Gorilla variant, bit-exact)."""
    v = np.ascontiguousarray(values, dtype=np.float64).view(_U64)
    n = len(v)
    head = struct.pack("<I", n)
    if n == 0:
        return head
    xors = np.empty(n - 1, dtype=_U64)
    np.bitwise_xor(v[1:], v[:-1], out=xors)
    body = _encode_subblocks(xors, strip_tz=True)
    return head + struct.pack("<Q", int(v[0])) + body


def decode_values_gorilla(data: bytes) -> np.ndarray:
    (n,) = struct.unpack_from("<I", data, 0)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    (first,) = struct.unpack_from("<Q", data, 4)
    out = np.empty(n, dtype=_U64)
    out[0] = first
    if n > 1:
        xors, _ = _decode_subblocks(data, 12, n - 1, strip_tz=True)
        out[1:] = xors
        np.bitwise_xor.accumulate(out, out=out)
    return out.view(np.float64)
