"""Chunked compressed segment structs (engine-new, per north_rule).

series(conv_id, metric, idx, ts_epoch, value)  ⇄  segments(conv_id,
metric, chunk_idx, chunk_start_epoch, n, ts_codec, val_codec,
idx_bytes, ts_bytes, val_bytes)

Each ≤`chunk_points` run of a series becomes one row: delta-of-delta
compressed point indices and epochs + Gorilla-XOR compressed float64
values inside BinaryType columns (SURVEY.md §1.2). decode(encode(x)) ==
x bit-exactly including idx (tests); NULL values travel as NaN payloads
and come back as NULLs. Carrying idx costs ~2 bits/point (dense idx is
constant-delta) and buys chunk-independent decode: no cross-chunk
prefix-sum, no exchange anywhere in the decode plan.

Transcript text segments: the raw transcript rows themselves chunk into
(conv_id, chunk_idx, n, ts_bytes, payload) where payload is a
zlib-compressed, length-prefixed concatenation of (turn_idx, role,
tool, text) in stable (conv_id, turn_idx) order — the per-turn text
equality invariant (input_hint) is asserted after round-trip in tests.

Scale: chunk ids live in the GROUP KEY (idx div chunk_points), so no
aggregate group ever exceeds chunk_points rows — one 10⁹-point
conversation parallelizes across chunks instead of becoming a single
unbounded packed row; a production build would register the codecs as
native Iceberg/Parquet encodings, this layer proves the semantics +
layout.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from matrixprofile_spark.kernels.compression import (
    decode_timestamps_dod,
    decode_values_gorilla,
    encode_timestamps_dod,
    encode_values_gorilla,
)

SEGMENT_SCHEMA = (
    "conv_id string, metric string, chunk_idx int, chunk_start_epoch long, "
    "n long, ts_codec string, val_codec string, idx_bytes binary, "
    "ts_bytes binary, val_bytes binary"
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
    """series rows → compressed segment rows, per (conv_id, metric).

    The chunk id is part of the GROUP KEY (``idx div chunk_points``), so
    the JVM-side pack (array_sort(collect_list) per group) never builds
    a group larger than ``chunk_points`` rows — per-group memory is
    bounded no matter how long one conversation's series grows (a
    whole-series pack would make a single 10⁹-point series a single
    aggregate row). For the dense 0-based ``idx`` the series operators
    produce, the resulting chunks are identical to sequential splitting.
    The aggregate's clustering is still satisfied by the upstream
    lag-window's hash(conv_id) partitioning (conv_id ⊆ group key → no
    extra exchange), and the codecs run via mapInPandas over the packed
    rows — one row per chunk. A grouped applyInPandas here would ship
    one Arrow batch per group — with thousands of sub-chunk-size series
    the per-batch Python round-trip dominates the actual codec work
    (measured ~2× on sf0.1)."""

    packed = (
        series.groupBy(
            "conv_id",
            "metric",
            F.expr(f"cast(idx div {int(chunk_points)} as int)")
            .alias("chunk_idx"),
        )
        .agg(
            F.expr(
                "array_sort(collect_list(struct(idx, ts_epoch, value)))"
            ).alias("pts")
        )
        .select(
            "conv_id",
            "metric",
            "chunk_idx",
            # the point indices travel as their own dod stream: dense
            # 0-based idx is constant-delta and packs to ~2 bits/point,
            # and carrying it makes decode a pure per-chunk map (no
            # cross-chunk prefix-sum) with original-idx fidelity even
            # when the series has index holes
            F.expr("transform(pts, x -> x.idx)").alias("idxs"),
            F.expr("transform(pts, x -> x.ts_epoch)").alias("ts"),
            # NULL → NaN payload (decode restores NULL)
            F.expr(
                "transform(pts, x -> coalesce(x.value, double('nan')))"
            ).alias("vals"),
        )
    )

    def fn(it):
        cols = [
            "conv_id", "metric", "chunk_idx", "chunk_start_epoch", "n",
            "ts_codec", "val_codec", "idx_bytes", "ts_bytes", "val_bytes",
        ]
        for pdf in it:
            if not len(pdf):
                continue
            rows = []
            for cid, met, ci, idx_l, ts_l, val_l in zip(
                pdf["conv_id"], pdf["metric"], pdf["chunk_idx"],
                pdf["idxs"], pdf["ts"], pdf["vals"]
            ):
                idxs = np.asarray(idx_l, dtype=np.int64)
                ts = np.asarray(ts_l, dtype=np.int64)
                vals = np.asarray(val_l, dtype=np.float64)
                rows.append(
                    (
                        cid, met, int(ci), int(ts[0]), len(ts),
                        "dod", "gorilla",
                        encode_timestamps_dod(idxs),
                        encode_timestamps_dod(ts),
                        encode_values_gorilla(vals),
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return packed.mapInPandas(fn, SEGMENT_SCHEMA)


def decode_segments(segments: DataFrame) -> DataFrame:
    """segment rows → series rows.

    Chunks decode fully independently — the point indices travel inside
    each chunk as their own dod stream — so this is a pure mapInPandas
    over segment rows with ZERO exchange: scan → decode, one stage. (An
    earlier build re-derived idx via a cross-chunk window prefix-sum,
    which shuffled the full binary payload and let AQE size the decode
    stage by COMPRESSED bytes — ~10× under-parallelized after the ~10×
    expansion.) mapInPandas, not a groupBy: a per-group decode would
    build one tiny DataFrame per series and the constant pandas/Arrow
    overhead would dominate (measured 13 s → ~2 s at sf0.1 for 10k
    series)."""

    def fn(it):
        for pdf in it:
            if not len(pdf):
                continue
            idx_parts, ts_parts, val_parts, n_parts = [], [], [], []
            for b_idx, b_ts, b_val in zip(
                pdf["idx_bytes"], pdf["ts_bytes"], pdf["val_bytes"]
            ):
                idx_parts.append(decode_timestamps_dod(bytes(b_idx)))
                ts_parts.append(decode_timestamps_dod(bytes(b_ts)))
                val_parts.append(decode_values_gorilla(bytes(b_val)))
                n_parts.append(len(ts_parts[-1]))
            n_arr = np.asarray(n_parts, dtype=np.int64)
            ts = np.concatenate(ts_parts)
            vals = np.concatenate(val_parts)
            out = pd.DataFrame({
                "conv_id": np.repeat(pdf["conv_id"].to_numpy(), n_arr),
                "metric": np.repeat(pdf["metric"].to_numpy(), n_arr),
                "idx": np.concatenate(idx_parts),
                "ts_epoch": ts,
                # NaN payloads back to SQL NULL via a masked float array
                "value": pd.arrays.FloatingArray(vals, np.isnan(vals)),
            })
            yield out

    return segments.mapInPandas(fn, SERIES_SCHEMA)


def encode_transcript_segments(
    transcripts: DataFrame, chunk_turns: int = 1024
) -> DataFrame:
    """transcript rows → text segment rows with per-turn payloads.

    Payload layout (before zlib): a block of n big-endian u32 record
    lengths, then the n records concatenated. A record is the \\x1f-join
    of (turn_idx, role, tool, text) where tool carries a presence
    prefix ('T' + value, or empty for NULL — NULs don't survive pandas
    fillna); text may contain any character — record boundaries come
    from the lengths block, never from scanning. All per-turn work is
    pandas/NumPy columnar: string concat + utf-8 encode + lengths are
    vectorized, a chunk's bytes assemble with one tobytes() and one
    join.

    The chunk id is part of the GROUP KEY (``turn_idx div chunk_turns``)
    so a single very long conversation never becomes one unbounded
    Arrow group — each group is ≤``chunk_turns`` turns. turn_idx itself
    travels inside the payload, so round-trip fidelity doesn't depend
    on how turns land in chunks."""

    def fn(key, pdf):
        pdf = pdf.sort_values("turn_idx")
        ts = pdf["ts_epoch"].to_numpy(dtype=np.int64)
        recs = (
            pdf["turn_idx"].astype("int64").astype("string")
            + "\x1f" + pdf["role"]
            + "\x1f" + ("T" + pdf["tool"]).fillna("")
            + "\x1f" + pdf["text"]
        ).str.encode("utf-8")
        lens = recs.str.len().to_numpy(dtype=">u4")
        blob = lens.tobytes() + b"".join(recs)
        return pd.DataFrame(
            [
                {
                    "conv_id": key[0],
                    "chunk_idx": int(key[1]),
                    "n": len(pdf),
                    "ts_bytes": encode_timestamps_dod(ts),
                    "payload": zlib.compress(blob, 6),
                }
            ]
        )

    return transcripts.groupBy(
        "conv_id",
        F.expr(f"cast(turn_idx div {int(chunk_turns)} as int)")
        .alias("chunk_idx"),
    ).applyInPandas(fn, TEXT_SEGMENT_SCHEMA)


def decode_transcript_segments(segments: DataFrame) -> DataFrame:
    """text segment rows → transcript rows.

    Chunks decode independently → mapInPandas over segment rows (the
    same reasoning as decode_segments: no tiny per-group frames). Record
    framing comes from the u32 lengths block (np.frombuffer + cumsum
    offsets); field split and utf-8 decode are vectorized pandas str
    ops over the whole batch."""

    def fn(it):
        for pdf in it:
            if not len(pdf):
                continue
            conv_parts, ts_parts, rec_parts, n_parts = [], [], [], []
            for conv_id, b_ts, b_pay, n in zip(
                pdf["conv_id"], pdf["ts_bytes"], pdf["payload"], pdf["n"]
            ):
                n = int(n)
                raw = zlib.decompress(bytes(b_pay))
                lens = np.frombuffer(raw, dtype=">u4", count=n).astype("int64")
                offs = 4 * n + np.concatenate(([0], np.cumsum(lens)))
                mv = memoryview(raw)
                rec_parts.extend(
                    bytes(mv[offs[i]:offs[i + 1]]) for i in range(n)
                )
                ts_parts.append(decode_timestamps_dod(bytes(b_ts)))
                conv_parts.append(conv_id)
                n_parts.append(n)
            fields = (
                pd.Series(rec_parts)
                .str.decode("utf-8")
                .str.split("\x1f", n=3, expand=True)
            )
            n_arr = np.asarray(n_parts, dtype="int64")
            tool = fields[2]
            yield pd.DataFrame({
                "conv_id": np.repeat(np.asarray(conv_parts, dtype=object), n_arr),
                "turn_idx": fields[0].astype("int64").astype("int32"),
                "role": fields[1],
                "text": fields[3],
                "tool": tool.str.slice(1).where(tool != "", None),
                "ts_epoch": np.concatenate(ts_parts) if ts_parts else [],
            })

    return segments.mapInPandas(fn, TRANSCRIPT_SCHEMA)
