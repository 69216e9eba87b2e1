"""Multimodal (image/audio/video) column plumbing (extension surface).

Media is carried as an opaque ``binary`` content column plus a typed
metadata struct — the layout a 100 TB training-data pipeline uses:
payloads stay out of every shuffle that doesn't need them (column
pruning drops ``content`` unless a stage touches it), and per-modality
work runs as Arrow-batched ``mapInPandas`` so Python sees zero-copy
byte buffers, never row-at-a-time objects.

The decode step is STUBBED: this container has no image/audio codecs
(no PIL/ffmpeg), so ``decode_real`` raises NotImplementedError and the
feature/resize/frame ops use a clearly-marked deterministic fake
(byte-level math on the payload). The Spark-side plumbing — schema,
partitioning, UDF signatures, batch iteration, 1→N frame expansion —
is real and tested; swapping the fake for PIL/libav is a pure function
swap inside the pandas loop.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # codec libraries are optional; the container ships none
    from PIL import Image  # noqa: F401

    HAVE_CODECS = True
except ImportError:
    HAVE_CODECS = False

N_FEATURES = 8  # byte-histogram bins of the fake decoder

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("channels", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                    StructField("n_frames", IntegerType()),
                    StructField("codec", StringType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)

FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_hash", StringType()),
    ]
)


def media_table(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic media table over ``documents``: the text
    bytes stand in for an encoded payload; kind and typed metadata derive
    arithmetically from doc_id so a SQL oracle can reproduce them.
    DuckDB twins: encode(text) payload, doc_id % 3 kind selector,
    integer // and % for the metadata fields."""
    d = F.col("doc_id")
    kind = (
        F.when(d % 3 == 0, F.lit("image"))
        .when(d % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    meta = F.struct(
        F.when(kind != "audio", (16 + d % 64).cast("int")).alias("width"),
        F.when(kind != "audio", (16 + (d / F.lit(64)).cast("bigint") % 64).cast("int")).alias("height"),
        F.when(kind == "image", F.lit(3)).otherwise(F.lit(None).cast("int")).alias("channels"),
        F.when(kind == "audio", (8000 + 100 * (d % 80)).cast("int")).alias("sample_rate"),
        F.when(kind != "image", (1000 + d % 5000).cast("int")).alias("duration_ms"),
        F.when(kind == "video", (24 + d % 240).cast("int")).alias("n_frames"),
        F.when(kind == "image", F.lit("png"))
        .when(kind == "audio", F.lit("pcm16"))
        .otherwise(F.lit("h264"))
        .alias("codec"),
    )
    return docs.select(
        d.alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        meta.alias("meta"),
    )


def decode_real(payload: bytes, kind: str):
    """The real decoder hook. STUB: no codec libraries in this
    container — wire PIL / soundfile / PyAV here in production."""
    if not HAVE_CODECS:
        raise NotImplementedError(
            "media decode requires codec libraries (PIL/soundfile/PyAV) "
            "not present in this environment; use the deterministic fake"
        )
    raise NotImplementedError("real decode path not wired yet")


def _fake_decode_features(buf: bytes, bins: int = N_FEATURES) -> np.ndarray:
    """Deterministic FAKE decode: byte histogram normalized to sum 1 —
    stands in for pixel/spectral statistics. Pure numpy over the Arrow
    buffer, vectorized per batch."""
    if len(buf) == 0:
        return np.zeros(bins)
    arr = np.frombuffer(buf, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=bins, range=(0, 256))
    return hist / len(arr)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction: mapInPandas over (media_id,
    kind, content) — metadata and any other columns are pruned before
    the Python boundary, so the Arrow transfer carries exactly the bytes
    being decoded. Output is a fixed-width feature vector per row."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads decode like empty ones (zeros histogram,
            # n_bytes 0) instead of raising len(None) deep in the worker
            bufs = [b if b is not None else b"" for b in pdf["content"]]
            feats = [_fake_decode_features(b).tolist() for b in bufs]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series([len(b) for b in bufs], dtype="int64"),
                    "features": feats,
                }
            )

    return media.select("media_id", "kind", "content").mapInPandas(fn, FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling for video rows: 1→N row expansion inside
    mapInPandas (one output row per sampled frame index). The fake
    "frame decode" fingerprints payload + '|' + decimal index — that
    exact byte layout so the DuckDB oracle can reproduce it as
    md5(text || '|' || idx) (r3 VERDICT item 1c: frame indices are
    pure arithmetic, the whole op is oracle-checkable). A real decoder
    would seek/extract the frame here. Filter to kind='video' happens
    Spark-side so non-video payloads never cross the Arrow boundary."""
    import hashlib

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for mid, buf, n_frames in zip(
                pdf["media_id"], pdf["content"], pdf["n_frames"]
            ):
                # a video row missing its payload or frame count has
                # nothing to sample — skip rather than crash the batch
                if buf is None or pd.isna(n_frames):
                    continue
                for i in range(0, int(n_frames), every_n):
                    ids.append(mid)
                    idxs.append(i)
                    hashes.append(
                        hashlib.md5(bytes(buf) + b"|" + str(i).encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_hash": pd.Series(hashes, dtype="object"),
                }
            )

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "content", F.col("meta.n_frames").alias("n_frames"))
        .mapInPandas(fn, FRAMES_SCHEMA)
    )


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes payloads through mapInPandas and rewrites
    the metadata to the target dimensions. STUB — the payload bytes are
    returned unchanged (a real implementation decodes, resamples, and
    re-encodes inside the loop); the schema contract and batch flow are
    the production shape."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["width"] = np.int32(width)
            out["height"] = np.int32(height)
            yield out

    flat = media.filter(F.col("kind") == "image").select(
        "media_id", "content",
        F.col("meta.width").alias("width"), F.col("meta.height").alias("height"),
    )
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("content", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )
    return flat.mapInPandas(fn, schema)
