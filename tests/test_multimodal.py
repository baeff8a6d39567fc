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
    df = media_from_documents(docs).cache()
    yield df
    df.unpersist()


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


def test_codec_gates():
    # JPEG genuinely needs a codec library -> still gated
    with pytest.raises(NotImplementedError):
        _decode_payload(b"\xff\xd8\xff\xe0" + b"x" * 16)
    # PNG decodes for REAL now (codecs.decode_png); a truncated one is
    # a data error, not a missing-codec error
    with pytest.raises(ValueError):
        _decode_payload(b"\x89PNG\r\n\x1a\n" + b"x" * 16)
    with pytest.raises(ValueError):
        _decode_payload(b"????garbage")


def test_png_roundtrip_all_color_types():
    import numpy as np

    from nvd2mysqlloader_spark.multimodal.codecs import (decode_png,
                                                         encode_png)
    rng = np.random.default_rng(3)
    for ch in (1, 2, 3, 4):
        img = rng.integers(0, 256, size=(13, 7, ch), dtype=np.uint8)
        back = decode_png(encode_png(img))
        assert back.shape == (13, 7, ch)
        assert (back == img).all()


def test_png_all_filters_decode():
    """Hand-encode each scanline filter (Sub/Up/Average/Paeth) and
    check the decoder inverts it — our encoder only emits filter 0,
    but real-world PNGs use all five."""
    import struct
    import zlib

    import numpy as np

    from nvd2mysqlloader_spark.multimodal.codecs import (PNG_MAGIC,
                                                         decode_png)
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    h, w, ch = img.shape
    stride = w * ch

    # forward-filter each row with filter type = row index % 5
    flat = img.reshape(h, stride).astype(np.int16)
    raw = bytearray()
    for y in range(h):
        f = y % 5
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int16)
        left = np.concatenate([np.zeros(ch, np.int16), cur[:-ch]])
        pleft = np.concatenate([np.zeros(ch, np.int16), prev[:-ch]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur - (left + prev) // 2
        else:
            p = left + prev - pleft
            pa, pb, pc = (abs(p - left), abs(p - prev), abs(p - pleft))
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, pleft))
            enc = cur - pred
        raw.append(f)
        raw += (enc & 0xFF).astype(np.uint8).tobytes()

    def chunk(ctype, payload):
        body = ctype + payload
        return struct.pack(">I", len(payload)) + body + \
            struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)

    png = (PNG_MAGIC
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(bytes(raw)))
           + chunk(b"IEND", b""))
    assert (decode_png(png) == img).all()


def test_wav_roundtrip_and_unsupported():
    import numpy as np
    import pytest

    from nvd2mysqlloader_spark.multimodal.codecs import (decode_wav,
                                                         encode_wav)
    rng = np.random.default_rng(5)
    stereo = rng.integers(-3000, 3000, size=(480, 2)).astype(np.int16)
    rate, ch, back = decode_wav(encode_wav(stereo, rate=8000))
    assert (rate, ch) == (8000, 2)
    assert (back == stereo).all()
    with pytest.raises(ValueError, match="not a WAV"):
        decode_wav(b"RIFFxxxxJUNK")


def test_decode_features_on_real_png_and_wav(spark):
    """The mapInPandas feature op handles REAL formats mixed with the
    SGM1 container in one table — kind/dims/means computed from the
    actual decoded pixels/samples."""
    import numpy as np

    from nvd2mysqlloader_spark.multimodal.binary import (
        decode_media_features, pack_media)
    from nvd2mysqlloader_spark.multimodal.codecs import (encode_png,
                                                         encode_wav)
    img = np.full((4, 6, 3), 7, dtype=np.uint8)
    aud = np.zeros((100, 1), dtype=np.int16)
    rows = [(1, "image", bytearray(encode_png(img))),
            (2, "audio", bytearray(encode_wav(aud, rate=16000))),
            (3, "image", bytearray(pack_media(0, 8, 2, b"\x07" * 16)))]
    media = spark.createDataFrame(rows, ["media_id", "kind", "content"])
    got = {r.media_id: r for r in decode_media_features(media).collect()}
    assert (got[1].kind, got[1].width, got[1].height) == ("image", 6, 4)
    assert got[1].n_payload_bytes == 4 * 6 * 3 and got[1].mean_byte == 7.0
    assert (got[2].kind, got[2].width, got[2].height) == ("audio", 16, 1)
    assert got[2].n_payload_bytes == 200 and got[2].mean_byte == 0.0
    assert (got[3].kind, got[3].width, got[3].height) == ("image", 8, 2)
