"""Chunked compressed segment structs (engine-new, per north_rule).

series(conv_id, metric, idx, ts_epoch, value)  ⇄  segments(conv_id,
metric, chunk_start_epoch, n, ts_codec, val_codec, ts_bytes, val_bytes)

Each ≤`chunk_points` run of a series becomes one row: delta-of-delta
compressed epochs + Gorilla-XOR compressed float64 values inside
BinaryType columns (SURVEY.md §1.2). decode(encode(x)) == x bit-exactly
(tests); NULL values travel as NaN payloads and come back as NULLs.

Transcript text segments: the raw transcript rows themselves chunk into
(conv_id, chunk_idx, n, ts_bytes, payload) where payload is a
zlib-compressed, length-prefixed concatenation of (turn_idx, role,
tool, text) in stable (conv_id, turn_idx) order — the per-turn text
equality invariant (input_hint) is asserted after round-trip in tests.

Scale: encoding is an applyInPandas per series — embarrassingly
parallel; a production build would register the codecs as native
Iceberg/Parquet encodings, this layer proves the semantics + layout.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from matrixprofile_spark.kernels.compression import (
    decode_timestamps_dod,
    decode_values_gorilla,
    encode_timestamps_dod,
    encode_values_gorilla,
)

SEGMENT_SCHEMA = (
    "conv_id string, metric string, chunk_start_epoch long, n long, "
    "ts_codec string, val_codec string, ts_bytes binary, val_bytes binary"
)

SERIES_SCHEMA = (
    "conv_id string, metric string, idx long, ts_epoch long, value double"
)

TEXT_SEGMENT_SCHEMA = (
    "conv_id string, chunk_idx int, n long, ts_bytes binary, payload binary"
)

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts_epoch long"
)


def encode_segments(series: DataFrame, chunk_points: int = 4096) -> DataFrame:
    """series rows → compressed segment rows, per (conv_id, metric)."""

    def fn(key, pdf):
        pdf = pdf.sort_values("idx")
        ts = pdf["ts_epoch"].to_numpy(dtype=np.int64)
        vals = pdf["value"].to_numpy(dtype=np.float64)  # NULL → NaN
        rows = []
        for s in range(0, len(pdf), chunk_points):
            e = min(s + chunk_points, len(pdf))
            rows.append(
                {
                    "conv_id": key[0],
                    "metric": key[1],
                    "chunk_start_epoch": int(ts[s]),
                    "n": e - s,
                    "ts_codec": "dod",
                    "val_codec": "gorilla",
                    "ts_bytes": encode_timestamps_dod(ts[s:e]),
                    "val_bytes": encode_values_gorilla(vals[s:e]),
                }
            )
        return pd.DataFrame(rows)

    return series.groupBy("conv_id", "metric").applyInPandas(fn, SEGMENT_SCHEMA)


def decode_segments(segments: DataFrame) -> DataFrame:
    """segment rows → series rows.

    Chunks decode independently, so this is mapInPandas over segment
    rows (one output frame per Arrow batch) — NOT a groupBy: a per-group
    decode would build one tiny DataFrame per series and the constant
    pandas/Arrow overhead would dominate (measured 13 s → ~2 s at sf0.1
    for 10k series). Each series' global point index is re-derived from
    a window prefix-sum over chunk sizes, which shuffles only the small
    segments table, never the points."""
    w = Window.partitionBy("conv_id", "metric").orderBy("chunk_start_epoch")
    seg = segments.withColumn(
        "idx0", (F.sum("n").over(w) - F.col("n")).cast("long")
    )

    def fn(it):
        for pdf in it:
            if not len(pdf):
                continue
            ts_parts, val_parts, n_parts = [], [], []
            for b_ts, b_val in zip(pdf["ts_bytes"], pdf["val_bytes"]):
                ts_parts.append(decode_timestamps_dod(bytes(b_ts)))
                val_parts.append(decode_values_gorilla(bytes(b_val)))
                n_parts.append(len(ts_parts[-1]))
            n_arr = np.asarray(n_parts, dtype=np.int64)
            ts = np.concatenate(ts_parts)
            vals = np.concatenate(val_parts)
            # idx = chunk base + position within chunk, vectorized
            base = np.repeat(pdf["idx0"].to_numpy(dtype=np.int64), n_arr)
            starts = np.repeat(np.cumsum(n_arr) - n_arr, n_arr)
            pos = np.arange(len(ts), dtype=np.int64) - starts
            out = pd.DataFrame({
                "conv_id": np.repeat(pdf["conv_id"].to_numpy(), n_arr),
                "metric": np.repeat(pdf["metric"].to_numpy(), n_arr),
                "idx": base + pos,
                "ts_epoch": ts,
                # NaN payloads back to SQL NULL via a masked float array
                "value": pd.arrays.FloatingArray(vals, np.isnan(vals)),
            })
            yield out

    return seg.mapInPandas(fn, SERIES_SCHEMA)


def encode_transcript_segments(
    transcripts: DataFrame, chunk_turns: int = 1024
) -> DataFrame:
    """transcript rows → text segment rows with per-turn payloads."""

    def fn(key, pdf):
        pdf = pdf.sort_values("turn_idx")
        ts = pdf["ts_epoch"].to_numpy(dtype=np.int64)
        rows = []
        for ci, s in enumerate(range(0, len(pdf), chunk_turns)):
            e = min(s + chunk_turns, len(pdf))
            parts = []
            for _, r in pdf.iloc[s:e].iterrows():
                tool = r["tool"] if r["tool"] is not None else "\x00"
                rec = f"{r['turn_idx']}\x1f{r['role']}\x1f{tool}\x1f{r['text']}"
                b = rec.encode("utf-8")
                parts.append(len(b).to_bytes(4, "big") + b)
            rows.append(
                {
                    "conv_id": key[0],
                    "chunk_idx": ci,
                    "n": e - s,
                    "ts_bytes": encode_timestamps_dod(ts[s:e]),
                    "payload": zlib.compress(b"".join(parts), 6),
                }
            )
        return pd.DataFrame(rows)

    return transcripts.groupBy("conv_id").applyInPandas(fn, TEXT_SEGMENT_SCHEMA)


def decode_transcript_segments(segments: DataFrame) -> DataFrame:
    """text segment rows → transcript rows in stable turn order."""

    def fn(key, pdf):
        pdf = pdf.sort_values("chunk_idx")
        rows = []
        for _, seg in pdf.iterrows():
            ts = decode_timestamps_dod(bytes(seg["ts_bytes"]))
            raw = zlib.decompress(bytes(seg["payload"]))
            pos = 0
            i = 0
            while pos < len(raw):
                ln = int.from_bytes(raw[pos : pos + 4], "big")
                pos += 4
                turn_idx, role, tool, text = (
                    raw[pos : pos + ln].decode("utf-8").split("\x1f", 3)
                )
                pos += ln
                rows.append(
                    {
                        "conv_id": key[0],
                        "turn_idx": int(turn_idx),
                        "role": role,
                        "text": text,
                        "tool": None if tool == "\x00" else tool,
                        "ts_epoch": int(ts[i]),
                    }
                )
                i += 1
        return pd.DataFrame(
            rows,
            columns=["conv_id", "turn_idx", "role", "text", "tool", "ts_epoch"],
        )

    return segments.groupBy("conv_id").applyInPandas(fn, TRANSCRIPT_SCHEMA)
