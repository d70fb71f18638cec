"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The engine treats media exactly like its compressed series segments
(operators/segments.py): an opaque ``payload binary`` column plus typed
metadata columns the optimizer can prune/filter on WITHOUT touching the
bytes. Decode / feature-extract / frame-sample run as Arrow-batched
``mapInPandas`` stages — the pattern a 100 TB training-data pipeline
needs: metadata predicates push down to the parquet scan, payload bytes
only cross into Python for rows that survive them.

The actual codecs (PIL/libav/soundfile) are NOT in this container, so
``decode_payload`` is a deterministic fake (the payload bytes ARE the
sample/pixel stream) and ``decode_with_real_codecs`` is the clearly
marked real-codec seam. Everything Spark-side — schema, partitioning,
UDF signatures, Arrow batch shapes, the frame byte-layout — is real and
oracle-tested: media synthesized from the ``documents`` table has
payload == utf8(text), so DuckDB can recompute features and frame
slices character-wise and the driver hash-compares them bit-exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, kind string, width int, height int, n_frames int, "
    "sample_rate int, n_bytes int, payload binary"
)

FRAME_BYTES = 64  # fake-video frame stride (bytes per frame)


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Deterministic media table derived from ``documents`` — the
    sandbox stand-in for an ingested media lake. Pure Catalyst (zero
    Python): payload = utf8(text); kind cycles image/audio/video by
    doc_id; metadata is derived from the byte length the way a real
    ingest would persist decoder headers."""
    n = F.octet_length("text")
    return documents.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.lit(16).alias("width"),
        F.ceil(n / 16).cast("int").alias("height"),
        F.ceil(n / FRAME_BYTES).cast("int").alias("n_frames"),
        F.lit(8000).alias("sample_rate"),
        n.cast("int").alias("n_bytes"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def decode_payload(kind: str, payload: bytes) -> np.ndarray:
    """Deterministic fake decode: payload bytes AS the uint8
    sample/pixel stream. The Spark plumbing around this call (batching,
    schema, partitioning) is exactly what a real decoder plugs into."""
    return np.frombuffer(payload, dtype=np.uint8)


def decode_with_real_codecs(kind: str, payload: bytes) -> np.ndarray:
    """Real-codec seam. Swap-in point for PIL / libav / soundfile —
    none of which exist in this container."""
    try:
        if kind == "image":
            import PIL.Image  # noqa: F401
        elif kind == "audio":
            import soundfile  # noqa: F401
        else:
            import av  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real media codecs are not installed in this environment; "
            "use decode_payload (deterministic fake) or install "
            "PIL/soundfile/av and implement this seam"
        ) from e
    raise NotImplementedError("real-codec decode not implemented")


def media_features(media: DataFrame) -> DataFrame:
    """Per-media byte-level features via Arrow-batched mapInPandas.

    Metadata columns pass through untouched (no decode needed for
    them); only ``payload`` is decoded. Output is one row per input
    row, so the stage is a narrow map — no shuffle, safe to chain
    after a metadata filter that pruned the scan."""
    schema = (
        "doc_id bigint, kind string, width int, height int, n_bytes int, "
        "mean_byte double, sum_byte bigint, max_byte int"
    )

    def fn(it):
        for pdf in it:
            if not len(pdf):
                continue
            streams = [
                decode_payload(k, bytes(p))
                for k, p in zip(pdf["kind"], pdf["payload"])
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(),
                "kind": pdf["kind"].to_numpy(),
                "width": pdf["width"].to_numpy(),
                "height": pdf["height"].to_numpy(),
                "n_bytes": pdf["n_bytes"].to_numpy(),
                "mean_byte": [float(s.mean()) if len(s) else float("nan")
                              for s in streams],
                # integer-exact twin of mean_byte: hash-checked outputs
                # emit (sum, count), never a rounded ratio
                "sum_byte": [int(s.sum(dtype="int64")) if len(s) else 0
                             for s in streams],
                "max_byte": [int(s.max()) if len(s) else 0 for s in streams],
            })

    return media.mapInPandas(fn, schema)


def resize_images(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Nearest-neighbor resize of each image payload's byte grid.

    The fake decode views the payload as a row-major (height × width)
    uint8 grid (zero-padded tail, matching the metadata a real ingest
    persists); resize samples src_r = (r·H)//out_h, src_c = (c·W)//out_w
    — the standard nearest-neighbor index map, per-image NumPy within
    each Arrow batch (per-payload iteration is inherent to a decode
    seam; each image's resize is a vectorized ix_ gather). A real
    pipeline swaps ``decode_payload`` for
    the codec seam (``decode_with_real_codecs``) and keeps this stage's
    batching/schema unchanged. Narrow map: the image-kind filter and the
    metadata columns stay Catalyst-side, so non-image payload bytes
    never reach Python."""
    schema = "doc_id bigint, out_w int, out_h int, pixels array<int>"
    rr_base = np.arange(out_h, dtype=np.int64)
    cc_base = np.arange(out_w, dtype=np.int64)

    def fn(it):
        for pdf in it:
            if not len(pdf):
                continue
            ids, pix = [], []
            for d, w, h, p in zip(pdf["doc_id"], pdf["width"],
                                  pdf["height"], pdf["payload"]):
                w, h = int(w), int(h)
                g = decode_payload("image", bytes(p))
                # truncate BEFORE padding: a payload longer than w*h
                # would otherwise hand np.pad a negative pad width
                g = g[: w * h]
                g = np.pad(g, (0, w * h - len(g))).reshape(h, w)
                rr = (rr_base * h) // out_h
                cc = (cc_base * w) // out_w
                ids.append(int(d))
                pix.append(g[np.ix_(rr, cc)].ravel().astype("int32"))
            yield pd.DataFrame({
                "doc_id": ids, "out_w": out_w, "out_h": out_h,
                "pixels": pix,
            })

    return (
        media.where(F.col("kind") == "image")
        .where(F.octet_length("payload") > 0)
        .select("doc_id", "width", "height", "payload")
        .mapInPandas(fn, schema)
    )


def frame_sample(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Every k-th fixed-stride frame of each video payload.

    Pure Catalyst: the frame fan-out is ``explode(sequence(0,
    n_frames-1, k))`` and each frame is a byte-wise ``substring`` on the
    binary payload — zero Python, whole-stage codegen, no shuffle (the
    explode is a narrow map-side generator). A real-codec pipeline would
    swap the substring for a decode `mapInPandas` at the seam documented
    in ``decode_with_real_codecs``; the fan-out/filter shape stays.

    The video filter is Catalyst-side so non-video payloads are pruned
    before the generator."""
    n_frames = F.ceil(F.octet_length("payload") / FRAME_BYTES).cast("int")
    return (
        media.where(F.col("kind") == "video")
        .where(F.octet_length("payload") > 0)
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.explode(
                F.sequence(
                    F.lit(0).cast("int"), n_frames - 1,
                    F.lit(int(every_k)).cast("int"),
                )
            ).alias("frame_idx"),
            "payload",
        )
        .select(
            "doc_id", "frame_idx",
            F.expr(
                f"substring(payload, frame_idx * {FRAME_BYTES} + 1,"
                f" {FRAME_BYTES})"
            ).alias("frame"),
        )
    )
