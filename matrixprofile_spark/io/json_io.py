"""Profile (de)serialization compatible with the reference JSON format.

The reference serializes MatrixProfile/PMP dicts to JSON with ndarray
values as lists (/root/reference/matrixprofile/io/__io.py:109-126, reader
57-106). The engine's source of truth is the profile *table*; this module
is the thin compatibility layer:

- row-level: `profile_row_to_dict` / `dict_to_profile_row` convert between
  a profile-table row and the reference dict shape (`class`,
  `algorithm`, `mp`, `pi`, `lmp`/`rmp`, `ez`, `join`, `sample_pct`,
  `metric`, `w`) so goldens produced by the reference's `io.to_json`
  compare 1:1.
- table-level: `write_profiles_json` / `read_profiles_json` are plain
  distributed `df.write.json` / `spark.read.json` with the engine's
  profile schema — no driver collect; each row is one reference-shaped
  JSON document.

The `.mpf` protobuf format is intentionally not reproduced: its role
(compact binary persistence, proto_messages.proto:69-111) is superseded by
the engine's Gorilla/delta-of-delta segment structs and columnar Parquet.
"""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from matrixprofile_spark.operators.profile import PROFILE_SCHEMA


def profile_row_to_dict(row) -> dict:
    """Profile-table row → reference-shaped MatrixProfile dict."""
    def arr(x, dtype):
        return None if x is None else np.asarray(x, dtype=dtype)

    return {
        "class": "MatrixProfile",
        "algorithm": row["algorithm"],
        "metric": "euclidean",
        "w": int(row["w"]),
        "ez": int(row["ez"]),
        "join": bool(row["join"]),
        "sample_pct": float(row["sample_pct"]),
        "mp": arr(row["mp"], "d"),
        "pi": arr(row["pi"], "int64"),
        "lmp": arr(row["lmp"], "d"),
        "lpi": arr(row["lpi"], "int64"),
        "rmp": arr(row["rmp"], "d"),
        "rpi": arr(row["rpi"], "int64"),
    }


def to_json(profile: dict) -> str:
    """Reference-compatible JSON text (io/__io.py:109-126 semantics:
    ndarrays become lists; non-finite floats are emitted as-is the way
    json.dumps does for the reference too)."""
    out = {}
    for k, v in profile.items():
        if isinstance(v, np.ndarray):
            out[k] = v.tolist()
        elif isinstance(v, (np.integer,)):
            out[k] = int(v)
        elif isinstance(v, (np.floating,)):
            out[k] = float(v)
        else:
            out[k] = v
    # the reference reader dereferences dct['data']['ts'] unconditionally
    # (io/__io.py:57-106); emit the key so engine output loads there too
    # (the engine keeps series in the series table, not in the profile)
    out.setdefault("data", {"ts": None, "query": None})

    # nested ndarrays (data.ts/query, discovery sub-dicts) — the
    # reference handles these with its JSONSerializer default
    # (io/__io.py:21-38); mirror that for anything the top-level
    # conversion above didn't reach
    def _default(o):
        if isinstance(o, np.ndarray):
            return o.tolist()
        if isinstance(o, np.integer):
            return int(o)
        if isinstance(o, np.floating):
            return float(o)
        raise TypeError(f"not JSON serializable: {type(o)}")

    return json.dumps(out, default=_default)


def from_json(s: str) -> dict:
    """Inverse of to_json; array keys come back as float64/int64 ndarrays
    (io/__io.py:57-106 semantics)."""
    d = json.loads(s)
    for k in ("mp", "lmp", "rmp", "cmp", "av", "pmp"):
        if d.get(k) is not None:
            d[k] = np.asarray(d[k], dtype="d")
    for k in ("pi", "lpi", "rpi", "pmpi", "windows"):
        if d.get(k) is not None:
            d[k] = np.asarray(d[k], dtype="int64")
    return d


def write_profiles_json(profiles: DataFrame, path: str) -> None:
    """Distributed JSON export of a profile table (one document per
    series profile). Infinities are not valid JSON literals — Spark's
    writer emits them quoted; we stay bit-faithful by round-tripping
    through the engine reader below."""
    profiles.write.mode("overwrite").json(path)


def read_profiles_json(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.schema(PROFILE_SCHEMA).json(path)
    # a JSON-null mp row is a corrupt record, not a profile
    return df.where(F.col("mp").isNotNull())
