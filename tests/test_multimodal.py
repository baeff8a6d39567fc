"""Multimodal binary-column plumbing: pack/decode roundtrip, resize,
frame sampling, real-codec stub behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nvd2mysqlloader_spark.multimodal.binary import (_decode_payload,
                                                     decode_media_features,
                                                     media_from_documents,
                                                     resize_images,
                                                     sample_frames)

from .conftest import SF_ORACLE


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    return media_from_documents(docs).cache()


def test_pack_decode_roundtrip(spark, media):
    feats = decode_media_features(media)
    joined = (feats.join(media.select("media_id",
                                      F.col("kind").alias("kind_src"),
                                      "n_bytes"), "media_id"))
    rows = joined.collect()
    assert len(rows) > 0
    for r in rows:
        assert r.kind == r.kind_src                  # header kind survives
        assert r.n_payload_bytes == r.n_bytes - 9    # 9-byte container header
        assert 0.0 <= r.mean_byte <= 255.0
        assert r.width >= 16 and r.height >= 16


def test_resize_clamps_dims(spark, media):
    resized = resize_images(media, max_side=20)
    feats = decode_media_features(resized).filter(F.col("kind") == "image")
    assert feats.count() > 0
    for r in feats.collect():
        assert max(r.width, r.height) <= 20


def test_frames_only_from_video(spark, media):
    frames = sample_frames(media, every_n_bytes=64, max_frames=4)
    ids = {r.media_id for r in frames.select("media_id").distinct().collect()}
    kinds = {r.media_id: r.kind for r in media.select("media_id", "kind").collect()}
    assert ids and all(kinds[i] == "video" for i in ids)
    per = frames.groupBy("media_id").count().agg(F.max("count")).first()[0]
    assert per <= 4


def test_real_codec_stubbed():
    with pytest.raises(NotImplementedError):
        _decode_payload(b"\x89PNG\r\n\x1a\n" + b"x" * 16)
    with pytest.raises(ValueError):
        _decode_payload(b"????garbage")
