"""Multimodal queries over the synthetic media table (extension surface).

The catalog projection is fully SQL-expressible (payload length, hash,
typed metadata) and oracle-checked; the decode-dependent ops
(feature extraction, frame sampling) run the real mapInPandas plumbing
with the deterministic fake decoder and get the driver's rows-only
check — the fake is byte-level numpy, not SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import extract_features, media_table, sample_frames
from ..sources.parquet_io import load_table
from .registry import query


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_table(load_table(spark, sf_dir, "documents"))


@query(
    "media_catalog",
    oracle="""
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_md5,
           CASE WHEN doc_id % 3 <> 1 THEN CAST(16 + doc_id % 64 AS INT) END AS width,
           CASE WHEN doc_id % 3 <> 1 THEN CAST(16 + (doc_id // 64) % 64 AS INT) END AS height,
           CASE WHEN doc_id % 3 = 1 THEN CAST(8000 + 100 * (doc_id % 80) AS INT) END AS sample_rate,
           CASE WHEN doc_id % 3 = 2 THEN CAST(24 + doc_id % 240 AS INT) END AS n_frames,
           CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'pcm16' ELSE 'h264' END AS codec
    FROM documents
    ORDER BY media_id
    """,
)
def media_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata catalog of the media table: payload size + hash +
    per-modality fields. ``content`` is touched only by length/md5 —
    at scale this projection never moves payload bytes through a
    shuffle."""
    m = _media(spark, sf_dir)
    return (
        m.select(
            "media_id",
            "kind",
            F.length("content").cast("bigint").alias("n_bytes"),
            F.md5("content").alias("content_md5"),
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.n_frames").alias("n_frames"),
            F.col("meta.codec").alias("codec"),
        )
        .orderBy("media_id")
    )


@query("media_feature_extract")  # decode is a Python stub — no SQL oracle
def media_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction (fake decoder:
    normalized byte histogram). The raw ``array<double>`` vector lives on
    the unregistered ``extract_features`` operator; the driver-checked
    projection flattens it to scalar columns f0..f7 (rounded 6dp) so the
    result canonicalizes in plain pandas — raw array columns are
    unhashable in the driver's sort/hash path."""
    from ..operators.multimodal import N_FEATURES

    feats = extract_features(_media(spark, sf_dir))
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        *[
            F.round(F.col("features").getItem(i), 6).alias(f"f{i}")
            for i in range(N_FEATURES)
        ],
    ).orderBy("media_id")


@query("media_frame_sample")  # decode is a Python stub — no SQL oracle
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: 1→N row expansion inside mapInPandas,
    every 10th frame, fingerprinted payload+index."""
    return sample_frames(_media(spark, sf_dir), every_n=10).orderBy(
        "media_id", "frame_idx"
    )
