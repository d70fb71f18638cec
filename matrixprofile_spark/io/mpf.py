"""`.mpf` binary profile format — a from-scratch proto3 wire codec.

The reference persists MatrixProfile/PMP dicts as a protobuf `MPFOutput`
message (schema /root/reference/matrixprofile/io/protobuf/
proto_messages.proto:69-111, writer protobuf_utils.py:156-314, reader
411-476).  This module reimplements that FORMAT — not the reference's
generated-pb2 code — as a dependency-free proto3 wire encoder/decoder
(varints, fixed64 doubles, length-delimited packed arrays and
submessages per the public protobuf encoding spec), so the engine can
ingest a user's existing `.mpf` archives and emit files the reference's
own `from_mpf` parses, without google.protobuf installed.

Field map (proto_messages.proto):

  DoubleMatrix   rows=1 varint, cols=2 varint, data=3 packed double
  IntMatrix      rows=1 varint, cols=2 varint, data=3 packed int64
  Location       row=1 varint, col=2 varint
  Motif          motifs=1 rep Location, neighbors=2 rep Location
  MatrixProfile  mp=1 lmp=3 rmp=5 DoubleMatrix; pi=2 lpi=4 rpi=6
                 IntMatrix; ez=9 varint; join=10 bool
  PanMatrixProfile  pmp=1 DoubleMatrix, pmpi=2 IntMatrix
  MPFOutput      klass=1 algorithm=2 metric=3 str; sample_pct=4 double;
                 windows=5 packed uint64; ts=6 query=7 DoubleMatrix;
                 mp=8 MatrixProfile; pmp=9 PanMatrixProfile;
                 motifs=10 rep Motif; discords=11 rep Location;
                 cmp=12 av=13 DoubleMatrix; av_type=14 str

Writer conventions follow proto3: scalar fields at their default value
(0, "", false) are omitted; fields are emitted in field-number order;
repeated numeric fields are packed.  The reader is spec-lenient: it
accepts unknown fields (skipped by wire type), unpacked repeated
numerics, and out-of-order fields.

Table level: `write_profiles_mpf` / `read_profiles_mpf` store one
genuine `.mpf` message per profile row in a `binary` parquet column —
distributed encode/decode through Arrow-batched mapInPandas (the same
codec seam pattern as kernels.compression's Gorilla segments), never a
driver collect.
"""

from __future__ import annotations

import struct

import numpy as np

_U64 = 0xFFFFFFFFFFFFFFFF

# ---------------------------------------------------------------- wire


def _varint(n: int) -> bytes:
    """Unsigned LEB128 varint. Negative int64 is encoded two's-complement
    (10 bytes), matching protobuf's int64 scalar encoding."""
    n &= _U64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result & _U64, pos
        shift += 7
        if shift >= 70:
            raise ValueError("varint too long")


def _signed64(n: int) -> int:
    return n - (1 << 64) if n >= (1 << 63) else n


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _scalar_varint(field: int, value: int) -> bytes:
    return b"" if value == 0 else _tag(field, 0) + _varint(value)


def _scalar_double(field: int, value: float) -> bytes:
    if value == 0.0 and not np.signbit(value):
        return b""
    return _tag(field, 1) + struct.pack("<d", value)


def _scalar_string(field: int, value: str | None) -> bytes:
    if not value:
        return b""
    return _len_delim(field, value.encode("utf-8"))


def _iter_fields(buf: bytes):
    """Yield (field_no, wire_type, value) walking a message payload.
    value: int for wire 0, bytes for wire 1 (8B), bytes for wire 2."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 0x7
        if wire == 0:
            v, pos = _read_varint(buf, pos)
            yield field, wire, v
        elif wire == 1:
            if pos + 8 > n:
                raise ValueError("truncated fixed64")
            yield field, wire, buf[pos:pos + 8]
            pos += 8
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            if pos + ln > n:
                raise ValueError("truncated length-delimited field")
            yield field, wire, buf[pos:pos + ln]
            pos += ln
        elif wire == 5:
            if pos + 4 > n:
                raise ValueError("truncated fixed32")
            yield field, wire, buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")


# ------------------------------------------------------------ matrices


def _enc_double_matrix(arr: np.ndarray | None) -> bytes:
    """DoubleMatrix message bytes (b'' if arr is None/empty — caller
    skips emitting the submessage, mirroring protobuf_utils.py:190-193's
    has-data guard)."""
    if arr is None or np.size(arr) < 1:
        return b""
    a = np.asarray(arr, dtype="d")
    rows = a.shape[0]
    cols = a.shape[1] if a.ndim > 1 else 0
    flat = a.ravel()
    out = _scalar_varint(1, int(rows)) + _scalar_varint(2, int(cols))
    out += _len_delim(3, struct.pack(f"<{flat.size}d", *flat.tolist()))
    return out


def _enc_int_matrix(arr: np.ndarray | None) -> bytes:
    if arr is None or np.size(arr) < 1:
        return b""
    a = np.asarray(arr, dtype="int64")
    rows = a.shape[0]
    cols = a.shape[1] if a.ndim > 1 else 0
    payload = b"".join(_varint(int(v)) for v in a.ravel().tolist())
    out = _scalar_varint(1, int(rows)) + _scalar_varint(2, int(cols))
    out += _len_delim(3, payload)
    return out


def _shape(rows: int, cols: int, flat: np.ndarray) -> np.ndarray | None:
    """from_proto_to_array semantics (protobuf_utils.py:319-341): None
    when empty; reshape to (rows, cols) only when cols > 0, else 1-D."""
    if flat.size < 1:
        return None
    if cols > 0:
        return flat.reshape((rows, cols))
    return flat


def _dec_double_matrix(buf: bytes) -> np.ndarray | None:
    rows = cols = 0
    flat = np.empty(0, dtype="d")
    for field, wire, v in _iter_fields(buf):
        if field == 1 and wire == 0:
            rows = v
        elif field == 2 and wire == 0:
            cols = v
        elif field == 3 and wire == 2:  # packed
            flat = np.concatenate(
                [flat, np.frombuffer(v, dtype="<f8")])
        elif field == 3 and wire == 1:  # spec-lenient unpacked
            flat = np.concatenate(
                [flat, np.frombuffer(v, dtype="<f8")])
    return _shape(rows, cols, flat)


def _dec_int_matrix(buf: bytes) -> np.ndarray | None:
    rows = cols = 0
    vals: list[int] = []
    for field, wire, v in _iter_fields(buf):
        if field == 1 and wire == 0:
            rows = v
        elif field == 2 and wire == 0:
            cols = v
        elif field == 3 and wire == 2:  # packed varints
            pos = 0
            while pos < len(v):
                x, pos = _read_varint(v, pos)
                vals.append(_signed64(x))
        elif field == 3 and wire == 0:  # unpacked
            vals.append(_signed64(v))
    return _shape(rows, cols, np.asarray(vals, dtype="int64"))


# ----------------------------------------------------- locations/motifs


def _enc_location(loc) -> bytes:
    """Location from an int or an (row, col) pair
    (protobuf_utils.py:70-153's two accepted shapes)."""
    if np.ndim(loc) > 0:
        row, col = int(loc[0]), int(loc[1])
    else:
        row, col = int(loc), 0
    return _scalar_varint(1, row) + _scalar_varint(2, col)


def _dec_location(buf: bytes) -> tuple[int, int]:
    row = col = 0
    for field, wire, v in _iter_fields(buf):
        if field == 1 and wire == 0:
            row = v
        elif field == 2 and wire == 0:
            col = v
    return row, col


def _enc_motif(motif: dict) -> bytes:
    out = b""
    for m in motif.get("motifs", []):
        out += _len_delim(1, _enc_location(m))
    for nb in motif.get("neighbors", []):
        out += _len_delim(2, _enc_location(nb))
    return out


def _dec_motif(buf: bytes, one_d: bool) -> dict:
    out = {"motifs": [], "neighbors": []}
    for field, wire, v in _iter_fields(buf):
        if wire != 2:
            continue
        row, col = _dec_location(v)
        loc = row if one_d else (row, col)
        if field == 1:
            out["motifs"].append(loc)
        elif field == 2:
            out["neighbors"].append(loc)
    return out


# ------------------------------------------------------------- profile


def to_mpf(profile: dict) -> bytes:
    """Reference dict → `.mpf` bytes (protobuf_utils.py:156-314 writer
    semantics: klass-discriminated MP vs PMP envelope, optional query /
    motifs / discords / cmp / av / av_type)."""
    klass = profile.get("class")
    if klass not in ("MatrixProfile", "PMP"):
        raise ValueError("Expecting Pan-MatrixProfile or MatrixProfile!")

    out = _scalar_string(1, klass)
    out += _scalar_string(2, profile.get("algorithm"))
    out += _scalar_string(3, profile.get("metric"))
    out += _scalar_double(4, float(profile.get("sample_pct") or 0.0))

    if klass == "MatrixProfile":
        windows = [int(profile.get("w"))]
    else:
        windows = [int(w) for w in np.asarray(profile.get("windows"))]
    out += _len_delim(5, b"".join(_varint(w) for w in windows))

    data = profile.get("data") or {}
    ts = _enc_double_matrix(data.get("ts"))
    if ts:
        out += _len_delim(6, ts)
    query = _enc_double_matrix(data.get("query"))
    if query:
        out += _len_delim(7, query)

    if klass == "MatrixProfile":
        env = b""
        for field, key, enc in (
            (1, "mp", _enc_double_matrix), (2, "pi", _enc_int_matrix),
            (3, "lmp", _enc_double_matrix), (4, "lpi", _enc_int_matrix),
            (5, "rmp", _enc_double_matrix), (6, "rpi", _enc_int_matrix),
        ):
            sub = enc(profile.get(key))
            if sub:
                env += _len_delim(field, sub)
        env += _scalar_varint(9, int(profile.get("ez") or 0))
        env += _scalar_varint(10, 1 if profile.get("join") else 0)
        out += _len_delim(8, env)
    else:
        env = _len_delim(1, _enc_double_matrix(profile.get("pmp")))
        env += _len_delim(2, _enc_int_matrix(profile.get("pmpi")))
        out += _len_delim(9, env)

    for motif in profile.get("motifs") or []:
        out += _len_delim(10, _enc_motif(motif))
    for discord in (
        profile["discords"] if profile.get("discords") is not None else []
    ):
        out += _len_delim(11, _enc_location(discord))

    cmp_ = _enc_double_matrix(profile.get("cmp"))
    if cmp_:
        out += _len_delim(12, cmp_)
    av = _enc_double_matrix(profile.get("av"))
    if av:
        out += _len_delim(13, av)
    out += _scalar_string(14, profile.get("av_type"))
    return bytes(out)


def from_mpf(blob: bytes) -> dict:
    """`.mpf` bytes → reference dict (protobuf_utils.py:411-476 reader
    semantics, including 1-D motif/discord collapse when the stored mp
    is one-dimensional)."""
    klass = algorithm = metric = av_type = ""
    sample_pct = 0.0
    windows: list[int] = []
    ts = query = None
    mp_env = pmp_env = None
    motif_bufs: list[bytes] = []
    discord_bufs: list[bytes] = []
    cmp_ = av = None

    for field, wire, v in _iter_fields(blob):
        if field == 1 and wire == 2:
            klass = v.decode("utf-8")
        elif field == 2 and wire == 2:
            algorithm = v.decode("utf-8")
        elif field == 3 and wire == 2:
            metric = v.decode("utf-8")
        elif field == 4 and wire == 1:
            sample_pct = struct.unpack("<d", v)[0]
        elif field == 5 and wire == 2:  # packed uint64
            pos = 0
            while pos < len(v):
                w, pos = _read_varint(v, pos)
                windows.append(w)
        elif field == 5 and wire == 0:
            windows.append(v)
        elif field == 6 and wire == 2:
            ts = _dec_double_matrix(v)
        elif field == 7 and wire == 2:
            query = _dec_double_matrix(v)
        elif field == 8 and wire == 2:
            mp_env = v
        elif field == 9 and wire == 2:
            pmp_env = v
        elif field == 10 and wire == 2:
            motif_bufs.append(v)
        elif field == 11 and wire == 2:
            discord_bufs.append(v)
        elif field == 12 and wire == 2:
            cmp_ = _dec_double_matrix(v)
        elif field == 13 and wire == 2:
            av = _dec_double_matrix(v)
        elif field == 14 and wire == 2:
            av_type = v.decode("utf-8")
        # unknown fields: skipped (already consumed by _iter_fields)

    out: dict = {
        "class": klass,
        "algorithm": algorithm,
        "metric": metric,
        "sample_pct": sample_pct,
        "data": {"ts": ts, "query": query},
    }

    one_d = False
    if klass == "MatrixProfile":
        parts = {"ez": 0, "join": False}
        arrs = {}
        if mp_env is not None:
            for field, wire, v in _iter_fields(mp_env):
                if wire == 2 and field in (1, 3, 5):
                    arrs[{1: "mp", 3: "lmp", 5: "rmp"}[field]] = (
                        _dec_double_matrix(v))
                elif wire == 2 and field in (2, 4, 6):
                    arrs[{2: "pi", 4: "lpi", 6: "rpi"}[field]] = (
                        _dec_int_matrix(v))
                elif wire == 0 and field == 9:
                    parts["ez"] = v
                elif wire == 0 and field == 10:
                    parts["join"] = bool(v)
        for k in ("mp", "pi", "lmp", "lpi", "rmp", "rpi"):
            out[k] = arrs.get(k)
        out["ez"] = parts["ez"]
        out["join"] = parts["join"]
        out["w"] = windows[0]
        one_d = out["mp"] is not None and out["mp"].ndim == 1
    elif klass == "PMP":
        arrs = {}
        if pmp_env is not None:
            for field, wire, v in _iter_fields(pmp_env):
                if wire == 2 and field == 1:
                    arrs["pmp"] = _dec_double_matrix(v)
                elif wire == 2 and field == 2:
                    arrs["pmpi"] = _dec_int_matrix(v)
        out["pmp"] = arrs.get("pmp")
        out["pmpi"] = arrs.get("pmpi")
        out["windows"] = np.asarray(windows, dtype="int64")

    if discord_bufs:
        locs = [_dec_location(b) for b in discord_bufs]
        out["discords"] = np.array(
            [r for r, _ in locs] if one_d else locs, dtype=int)
    if motif_bufs:
        out["motifs"] = [_dec_motif(b, one_d) for b in motif_bufs]
    if cmp_ is not None:
        out["cmp"] = cmp_
    if av is not None:
        out["av"] = av
    if av_type:
        out["av_type"] = av_type
    return out

# ------------------------------------------------- distributed table io

MPF_TABLE_SCHEMA = "conv_id string, metric string, w int, mpf binary"


def write_profiles_mpf(profiles, path: str) -> None:
    """Distributed `.mpf` export of a profile table: one reference-
    parseable MPFOutput blob per (conv_id, metric, w) row, stored in a
    binary parquet column. Encoding runs inside Arrow-batched
    mapInPandas on the executors (the kernels.compression segment-codec
    pattern) — no driver collect, and the parquet layout keeps the
    blobs splittable/prunable in a way a directory of loose .mpf files
    is not."""
    import pandas as pd

    from matrixprofile_spark.io.json_io import profile_row_to_dict

    def encode(it):
        for pdf in it:
            rows = []
            for rec in pdf.to_dict("records"):
                prof = profile_row_to_dict(rec)
                rows.append((rec["conv_id"], rec["metric"],
                             int(rec["w"]), to_mpf(prof)))
            yield pd.DataFrame(
                rows, columns=["conv_id", "metric", "w", "mpf"])

    (profiles.mapInPandas(encode, MPF_TABLE_SCHEMA)
     .write.mode("overwrite").parquet(path))


def read_profiles_mpf(spark, path: str):
    """Inverse of write_profiles_mpf: parse each binary `.mpf` cell
    back to a profile-table row (executor-side, Arrow-batched)."""
    import pandas as pd

    from matrixprofile_spark.operators.profile import PROFILE_SCHEMA

    def decode(it):
        for pdf in it:
            rows = []
            for rec in pdf.to_dict("records"):
                p = from_mpf(bytes(rec["mpf"]))
                rows.append({
                    "conv_id": rec["conv_id"],
                    "metric": rec["metric"],
                    "w": int(p["w"]),
                    "mp": p["mp"], "pi": p["pi"],
                    "lmp": p.get("lmp"), "lpi": p.get("lpi"),
                    "rmp": p.get("rmp"), "rpi": p.get("rpi"),
                    "ez": int(p["ez"]), "join": bool(p["join"]),
                    "sample_pct": float(p["sample_pct"]),
                    "algorithm": p["algorithm"],
                })
            yield pd.DataFrame(rows, columns=[
                "conv_id", "metric", "w", "mp", "pi", "lmp", "lpi",
                "rmp", "rpi", "ez", "join", "sample_pct", "algorithm"])

    return spark.read.parquet(path).mapInPandas(decode, PROFILE_SCHEMA)
