"""Bit-exact time-series compression codecs (engine-new, per north_rule).

Replaces the reference's protobuf `.mpf` serialization
(/root/reference/matrixprofile/io/protobuf/proto_messages.proto:9-111)
with the codecs a 10^12-turn store actually needs:

- `encode_timestamps_dod` — delta-of-delta with the Gorilla paper's
  timestamp bucketing ('0' dod=0; '10'+7b; '110'+9b; '1110'+12b;
  '1111'+64b), zigzag-coded residuals. Irregular inter-turn gaps
  compress to ~1-2 bits/point on regular stretches.
- `encode_values_gorilla` — Gorilla XOR float64 codec ('0' identical;
  '10' reuse previous leading/length window; '11'+5b leading+6b
  sigbits+payload). Constant runs → 1 bit/point; NaN/±0.0/denormals
  round-trip bit-exactly (decode(encode(x)) == x at the uint64 level).

Sources: T. Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory
Time Series Database", VLDB 2015 (public paper — implementation here is
from the spec, not from any existing codebase).

These run inside Arrow UDFs per ≤4096-point chunk (operators/segments).
"""

from __future__ import annotations

import numpy as np


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def bytes(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            return bytes(self.buf) + bytes([(self.acc << pad) & 0xFF])
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, bits: int) -> int:
        out = 0
        remaining = bits
        while remaining > 0:
            byte_i, bit_i = divmod(self.pos, 8)
            avail = 8 - bit_i
            take = min(avail, remaining)
            chunk = (self.data[byte_i] >> (avail - take)) & ((1 << take) - 1)
            out = (out << take) | chunk
            self.pos += take
            remaining -= take
        return out


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def encode_timestamps_dod(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode int64 epoch values (seconds or any unit)."""
    ts = np.asarray(ts, dtype=np.int64)
    n = len(ts)
    w = _BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.bytes()
    w.write(int(ts[0]) & ((1 << 64) - 1), 64)
    if n == 1:
        return w.bytes()
    deltas = np.diff(ts)
    w.write(_zigzag(int(deltas[0])) & ((1 << 64) - 1), 64)
    dod = np.diff(deltas)
    for d in dod:
        d = int(d)
        if d == 0:
            w.write(0, 1)
            continue
        z = _zigzag(d)
        if z < (1 << 7):
            w.write(0b10, 2)
            w.write(z, 7)
        elif z < (1 << 9):
            w.write(0b110, 3)
            w.write(z, 9)
        elif z < (1 << 12):
            w.write(0b1110, 4)
            w.write(z, 12)
        else:
            w.write(0b1111, 4)
            w.write(z & ((1 << 64) - 1), 64)
    return w.bytes()


def decode_timestamps_dod(data: bytes) -> np.ndarray:
    r = _BitReader(data)
    n = r.read(32)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    first = r.read(64)
    out[0] = np.int64(np.uint64(first))
    if n == 1:
        return out
    delta = _unzigzag(r.read(64))
    out[1] = out[0] + delta
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        else:
            if r.read(1) == 0:
                dod = _unzigzag(r.read(7))
            elif r.read(1) == 0:
                dod = _unzigzag(r.read(9))
            elif r.read(1) == 0:
                dod = _unzigzag(r.read(12))
            else:
                v = r.read(64)
                dod = _unzigzag(v)
        delta += dod
        out[i] = out[i - 1] + delta
    return out


def encode_values_gorilla(values: np.ndarray) -> bytes:
    """Gorilla XOR-encode float64 values, bit-exact (NaN-safe)."""
    bits = np.ascontiguousarray(values, dtype=np.float64).view(np.uint64)
    n = len(bits)
    w = _BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.bytes()
    w.write(int(bits[0]), 64)
    prev = int(bits[0])
    lead, sig = 65, 0  # invalid window → first xor forces '11' path
    xors = np.bitwise_xor(bits[1:], bits[:-1])
    for x in xors:
        x = int(x)
        if x == 0:
            w.write(0, 1)
            continue
        l = _clz64(x)
        t = _ctz64(x)
        if l > 31:
            l = 31
        s = 64 - l - t
        if lead <= 64 and l >= lead and (64 - lead - sig) <= t and sig > 0:
            # reuse the previous window
            w.write(0b10, 2)
            w.write(x >> (64 - lead - sig), sig)
        else:
            lead, sig = l, s
            w.write(0b11, 2)
            w.write(lead, 5)
            w.write(sig - 1, 6)  # sig in 1..64 stored as 0..63
            w.write(x >> t, sig)
        prev = x
    return w.bytes()


def decode_values_gorilla(data: bytes) -> np.ndarray:
    r = _BitReader(data)
    n = r.read(32)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    cur = r.read(64)
    out[0] = cur
    lead, sig = 0, 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = cur
            continue
        if r.read(1) == 0:
            payload = r.read(sig)
            x = payload << (64 - lead - sig)
        else:
            lead = r.read(5)
            sig = r.read(6) + 1
            payload = r.read(sig)
            x = payload << (64 - lead - sig)
        cur ^= x
        out[i] = cur
    return out.view(np.float64)


def _clz64(x: int) -> int:
    return 64 - x.bit_length()


def _ctz64(x: int) -> int:
    return (x & -x).bit_length() - 1 if x else 64
