"""Multimodal plumbing tests: schema contract, Arrow batch flow,
1→N frame expansion, deterministic fake decoder, stub gating."""

from __future__ import annotations

import pytest

from erathia_market_etl_spark.operators.multimodal import (
    FEATURES_SCHEMA,
    HAVE_CODECS,
    MEDIA_SCHEMA,
    _fake_decode_features,
    decode_real,
    extract_features,
    media_table,
    resize_stub,
    sample_frames,
)
from erathia_market_etl_spark.sources.parquet_io import load_table

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    return media_table(load_table(spark, SF_SMOKE, "documents"))


def test_media_schema(media):
    # names + types must match the contract; nullability is Catalyst's
    # inference (literals/derived exprs come out non-null) and not part of it
    assert media.schema.simpleString() == MEDIA_SCHEMA.simpleString()


def test_kinds_partition_the_table(media):
    counts = {r["kind"]: r["n"] for r in media.groupBy("kind").count().withColumnRenamed("count", "n").collect()}
    assert set(counts) == {"image", "audio", "video"}
    assert sum(counts.values()) == media.count()


def test_metadata_typed_per_modality(media):
    img = media.filter("kind = 'image'").select("meta.*").first()
    assert img["width"] is not None and img["channels"] == 3 and img["sample_rate"] is None
    aud = media.filter("kind = 'audio'").select("meta.*").first()
    assert aud["sample_rate"] is not None and aud["width"] is None
    vid = media.filter("kind = 'video'").select("meta.*").first()
    assert vid["n_frames"] is not None and vid["codec"] == "h264"


def test_extract_features_schema_and_determinism(media):
    out = extract_features(media)
    assert out.schema == FEATURES_SCHEMA
    rows1 = {r["media_id"]: r["features"] for r in out.collect()}
    rows2 = {r["media_id"]: r["features"] for r in out.collect()}
    assert rows1 == rows2  # byte-level fake is deterministic
    feats = next(iter(rows1.values()))
    assert len(feats) == 8 and abs(sum(feats) - 1.0) < 1e-9


def test_fake_decoder_empty_payload():
    assert list(_fake_decode_features(b"")) == [0.0] * 8


def test_sample_frames_expansion(spark, media):
    frames = sample_frames(media, every_n=10)
    per_doc = {r["media_id"]: r["n"] for r in
               frames.groupBy("media_id").count().withColumnRenamed("count", "n").collect()}
    vids = {r["media_id"]: r["n_frames"] for r in
            media.filter("kind='video'").select("media_id", "meta.n_frames").collect()}
    assert set(per_doc) == set(vids)
    for mid, nf in vids.items():
        assert per_doc[mid] == (nf + 9) // 10  # ceil(n_frames / 10)


def test_resize_stub_rewrites_metadata(media):
    out = resize_stub(media, 224, 224)
    r = out.first()
    assert r["width"] == 224 and r["height"] == 224
    assert out.count() == media.filter("kind='image'").count()


def test_decode_real_is_gated():
    if not HAVE_CODECS:
        with pytest.raises(NotImplementedError):
            decode_real(b"xx", "image")


def test_fixture_text_is_ascii_and_nonempty(spark):
    """The media_feature_extract oracle histograms per-CHARACTER ord()
    while Spark histograms utf-8 BYTES — identical only while the
    fixture payload is pure ASCII (r4 ADVICE: pin the vintage; a
    non-ASCII regeneration must fail loudly here, not drift silently).
    Empty text is separately safe (LEFT JOIN + COALESCE oracle twin of
    the decoder's zeros-histogram guard), so only ASCII-ness needs the
    live-fixture pin."""
    from pyspark.sql import functions as F

    from .conftest import SF_T2

    for sf in (SF_SMOKE, SF_T2):
        docs = load_table(spark, sf, "documents")
        non_ascii = docs.filter(F.col("text").rlike(r"[^\x00-\x7F]")).count()
        assert non_ascii == 0, f"non-ASCII text in {sf} breaks the ord() oracle"


def test_feature_extract_null_payload(spark):
    """NULL content decodes like empty bytes (zeros histogram, n_bytes
    0) instead of raising len(None) inside the Arrow worker."""
    from erathia_market_etl_spark.operators.multimodal import extract_features

    media = spark.createDataFrame(
        [(1, "image", None), (2, "image", bytearray(b"abc"))],
        "media_id long, kind string, content binary",
    )
    out = {r["media_id"]: r for r in extract_features(media).collect()}
    assert out[1]["n_bytes"] == 0
    assert out[1]["features"] == [0.0] * 8
    assert out[2]["n_bytes"] == 3


def test_sample_frames_null_rows_skipped(spark):
    """A video row with a NULL payload or NULL n_frames yields no
    frames (skipped) rather than crashing the whole batch."""
    from erathia_market_etl_spark.operators.multimodal import sample_frames

    media = spark.createDataFrame(
        [
            (1, "video", None, (None, None, None, None, None, 30, None)),
            (2, "video", bytearray(b"xyz"), (None, None, None, None, None, None, None)),
            (3, "video", bytearray(b"ok"), (None, None, None, None, None, 15, None)),
        ],
        "media_id long, kind string, content binary, "
        "meta struct<width:int,height:int,channels:int,sample_rate:int,"
        "duration_ms:int,n_frames:int,codec:string>",
    )
    rows = sample_frames(media, every_n=10).collect()
    assert {r["media_id"] for r in rows} == {3}
    assert sorted(r["frame_idx"] for r in rows) == [0, 10]
