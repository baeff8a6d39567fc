"""Multimodal query surface — binary-column pipelines over the
synthetic media table derived from ``documents`` (see
``multimodal.binary`` for why decode is stubbed but the Spark plumbing
is real)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal.binary import (decode_media_features,
                                 media_from_documents, sample_frames)
from ..sources.tpch import load_table
from .registry import query


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return media_from_documents(
        docs.repartition(spark.sparkContext.defaultParallelism))


@query(
    "multimodal_inventory",
    oracle="""
    SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           count(*) AS n_media,
           CAST(sum(octet_length(encode(text))) AS BIGINT)
             AS total_payload_bytes
    FROM documents GROUP BY 1
    """,
    doc="binary-column inventory: pack → mapInPandas decode → per-kind totals; oracle checks the decoded sizes against the source bytes (multimodal north-star plumbing)",
)
def multimodal_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = decode_media_features(_media(spark, sf_dir))
    return (feats.groupBy("kind")
            .agg(F.count(F.lit(1)).alias("n_media"),
                 F.sum("n_payload_bytes").alias("total_payload_bytes")))


@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id AS media_id,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           CAST(16 + doc_id % 48 AS INT) AS width,
           CAST(16 + doc_id % 32 AS INT) AS height,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_payload_bytes,
           CASE WHEN length(text) = 0 THEN 0.0
                ELSE list_avg(list_transform(
                       range(1, length(text) + 1),
                       i -> CAST(unicode(text[i]) AS DOUBLE))) END
             AS mean_byte
    FROM documents
    """,
    doc=(
        "per-media decoded features (dims, payload bytes, mean byte) "
        "via Arrow mapInPandas. The corpus is ASCII, so the byte-level "
        "mean is SQL-replayable as a codepoint mean: integer sums are "
        "exact in float64 regardless of accumulation order, making the "
        "mapInPandas numpy mean and DuckDB's list_avg bit-equal."
    ),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_media_features(_media(spark, sf_dir))


@query(
    "video_frame_sample",
    oracle="""
    WITH v AS (
      SELECT doc_id AS media_id,
             octet_length(encode(text)) AS L
      FROM documents WHERE doc_id % 3 = 2
    )
    SELECT v.media_id, CAST(k.k AS INT) AS frame_idx,
           CAST(least(64, v.L - k.k * 64) AS INT) AS frame_bytes
    FROM v, (SELECT unnest(range(0, 8)) AS k) k
    WHERE k.k * 64 < least(8 * 64, v.L)
    """,
    doc=(
        "frame sampling: video binaries → one row per sampled frame "
        "(explode-shaped multimodal op over mapInPandas). The synthetic "
        "SGM1 container makes the decode SQL-replayable, so the frame "
        "inventory (id, index, byte-length) is fully oracle-checked — "
        "the payload slicing itself stays binary-side in Spark."
    ),
)
def video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = sample_frames(_media(spark, sf_dir))
    return frames.select("media_id", "frame_idx",
                         F.length("frame").alias("frame_bytes"))


@query(
    "image_resize_inventory",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id,
             CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                  WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             CAST(16 + doc_id % 48 AS INT) AS w,
             CAST(16 + doc_id % 32 AS INT) AS h,
             octet_length(encode(text)) AS L
      FROM documents
    ), r AS (
      SELECT media_id, kind, w, h, L,
             greatest(w, h) / 32.0 AS scale
      FROM m
    ), s AS (
      SELECT media_id, kind, L,
             CASE WHEN kind <> 'image' OR greatest(w, h) <= 32 THEN NULL
                  ELSE greatest(1, L // (greatest(1, CAST(trunc(w / scale) AS BIGINT))
                                         * greatest(1, CAST(trunc(h / scale) AS BIGINT))))
             END AS step
      FROM r
    )
    SELECT media_id, kind,
           CAST(CASE WHEN step IS NULL THEN 9 + L
                     ELSE 9 + (L + step - 1) // step END AS BIGINT)
             AS n_out_bytes
    FROM s
    """,
    doc=(
        "image resize inventory: mapInPandas 'resize' (dim clamp + "
        "payload stride subsample — a codec call in production, "
        "identical plan shape) and the resulting per-media byte sizes, "
        "hash-verified against a pure-SQL replay of the stride "
        "arithmetic (float64 scale division + truncation written "
        "identically in both engines). With this, every multimodal op "
        "(inventory, features, frames, resize) is oracle-checked."
    ),
)
def image_resize_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.binary import resize_images

    resized = resize_images(_media(spark, sf_dir), max_side=32)
    return resized.select(
        "media_id", "kind",
        F.length("content").cast("bigint").alias("n_out_bytes"))


@query(
    "codec_formats_verdict",
    oracle="""
    SELECT * FROM (VALUES
      (CAST(1 AS BIGINT), 'image', CAST(8 AS INT), CAST(5 AS INT),
       CAST(120 AS BIGINT), CAST(59.5 AS DOUBLE)),
      (CAST(2 AS BIGINT), 'image', CAST(6 AS INT), CAST(9 AS INT),
       CAST(162 AS BIGINT), CAST(80.5 AS DOUBLE)),
      (CAST(3 AS BIGINT), 'image', CAST(7 AS INT), CAST(4 AS INT),
       CAST(84 AS BIGINT), CAST(2650 AS DOUBLE) / 28),
      (CAST(4 AS BIGINT), 'audio', CAST(8 AS INT), CAST(1 AS INT),
       CAST(40 AS BIGINT), CAST(127.5 AS DOUBLE)),
      (CAST(5 AS BIGINT), 'image', CAST(8 AS INT), CAST(6 AS INT),
       CAST(48 AS BIGINT), CAST(128.0 AS DOUBLE)),
      (CAST(6 AS BIGINT), 'image', CAST(12 AS INT), CAST(10 AS INT),
       CAST(120 AS BIGINT), CAST(128.0 AS DOUBLE)),
      (CAST(7 AS BIGINT), 'video', CAST(16 AS INT), CAST(16 AS INT),
       CAST(768 AS BIGINT), CAST(128.0 AS DOUBLE)),
      (CAST(8 AS BIGINT), 'image', CAST(24 AS INT), CAST(16 AS INT),
       CAST(384 AS BIGINT), CAST(133.5 AS DOUBLE))
    ) AS t(media_id, kind, width, height, n_payload_bytes, mean_byte)
    """,
    doc=(
        "golden-bytes decode verdict for the REAL pure-Python codecs "
        "(multimodal/codecs.py, multimodal/jpeg.py): six "
        "deterministic blobs — PNG (zlib+filters), BMP (uncompressed "
        "DIB), GIF (pure-Python LZW with dict growth), WAV-PCM, "
        "baseline JPEG (Huffman + dequant + IDCT), and PROGRESSIVE "
        "JPEG (SOF2: interleaved DC scan + per-component AC band "
        "scans, coefficients accumulated across scans) — are built "
        "driver-side from fixed pixel/sample arrays, decoded through "
        "the SAME Arrow mapInPandas feature op production uses "
        "(decode_media_features -> _decode_payload), and the decoded "
        "kind/dims/payload-bytes/mean-byte are pinned against "
        "closed-form DuckDB literals (e.g. the GIF is 28 gray pixels "
        "of value 50*(i%5): mean 2650/28 exactly; the WAV is the "
        "int16 ramp -10..9 whose LE bytes sum to 5100: mean 127.5; "
        "both JPEGs are constant mid-gray, whose DC-only blocks "
        "quantize to zero so the lossy roundtrip is EXACT: mean "
        "128.0). The JPEG decoder is additionally pinned against "
        "externally-authored real-world files — baseline AND four "
        "progressive goldens incl. full successive approximation, "
        "cross-checked pixel-level against the JVM's javax.imageio "
        "decoder — in pytest (tests/test_multimodal.py); the 7th row "
        "is an MJPEG MP4 (three 16x16 constant-gray JPEG frames at "
        "96/128/160 in a real container): the feature op decodes the "
        "video track's samples to PIXELS through the same JPEG "
        "decoder, so n_payload_bytes = 3*256 decoded pixels and "
        "mean_byte = (96+128+160)/3 = 128.0 exactly (constant DC-only "
        "blocks roundtrip exactly). The 8th row is a "
        "successive-approximation progressive JPEG "
        "(encode_jpeg_progressive_sa, al=2: DC/AC first scans at "
        "Al=2 plus two full refinement passes with cross-block EOB "
        "runs): a 2x3 grid of constant 8x8 blocks whose values are "
        "128 + multiples of 3, so each block's lone DC coefficient "
        "dequantizes EXACTLY at quality 90 (quant[0]=3, DC=(v-128)*8 "
        "divisible by 3) and the decode reproduces the block values "
        "bit-exactly: mean_byte = (128+131+137+146+158+101)/6 = "
        "133.5. Only INTER-frame sample-bitstream "
        "decode (H.264/HEVC) remains gated — this pins that every "
        "format we CLAIM to decode really decodes, byte-exactly, "
        "executor-side."
    ),
)
def codec_formats_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from ..multimodal.binary import decode_media_features
    from ..multimodal.codecs import encode_bmp, encode_gif, encode_png, \
        encode_wav
    from ..multimodal.jpeg import (encode_jpeg, encode_jpeg_progressive,
                                   encode_jpeg_progressive_sa)
    from ..multimodal.mp4 import encode_mp4

    png = encode_png(np.arange(120, dtype=np.uint8).reshape(5, 8, 3))
    bmp = encode_bmp(np.arange(162, dtype=np.uint8).reshape(9, 6, 3))
    gif_vals = ((np.arange(28) % 5) * 50).astype(np.uint8).reshape(4, 7)
    gif = encode_gif(np.repeat(gif_vals[:, :, None], 3, axis=2))
    wav = encode_wav(np.arange(-10, 10, dtype=np.int16), rate=8000)
    jpg = encode_jpeg(np.full((6, 8), 128, dtype=np.uint8))
    jpgp = encode_jpeg_progressive(
        np.full((10, 12), 128, dtype=np.uint8))
    mjpeg = encode_mp4(
        [bytes(encode_jpeg(np.full((16, 16), v, dtype=np.uint8)))
         for v in (96, 128, 160)], width=16, height=16,
        codec=b"jpeg")
    sa_img = np.repeat(np.repeat(
        np.array([[128, 131, 137], [146, 158, 101]], dtype=np.uint8),
        8, axis=0), 8, axis=1)
    jpgsa = encode_jpeg_progressive_sa(sa_img, al=2)
    media = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(bmp)),
         (3, bytearray(gif)), (4, bytearray(wav)),
         (5, bytearray(jpg)), (6, bytearray(jpgp)),
         (7, bytearray(mjpeg)), (8, bytearray(jpgsa))],
        "media_id long, content binary")
    return decode_media_features(media).orderBy("media_id")


@query(
    "audio_features_verdict",
    oracle="""
    SELECT * FROM (VALUES
      (CAST(1 AS BIGINT), CAST(8000 AS INT), CAST(2048 AS BIGINT),
       CAST(2048 AS DOUBLE) / 8000, CAST(0.5 AS DOUBLE),
       CAST(1000.0 AS DOUBLE), CAST(511 AS DOUBLE) / 2047),
      (CAST(2 AS BIGINT), CAST(16000 AS INT), CAST(1000 AS BIGINT),
       CAST(1000 AS DOUBLE) / 16000, CAST(0.0 AS DOUBLE),
       CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE))
    ) AS t(media_id, sample_rate, n_samples, duration_s, rms,
           peak_freq_hz, zero_crossing_rate)
    """,
    doc=(
        "audio feature extraction over REAL decoded PCM "
        "(multimodal/binary.audio_features — numpy FFT inside "
        "mapInPandas, the audio leg of decode/feature-extract): a "
        "1 kHz ±16384 square wave at 8 kHz (2048 samples, exactly "
        "on-bin: 256 periods of 8 samples) must report rms EXACTLY "
        "0.5 (|x| is exactly 0.5 everywhere), dominant frequency "
        "EXACTLY 1000.0 Hz (bin 256 of a 2048-point rfft; the "
        "square's 1/k harmonic decay keeps the fundamental maximal), "
        "and zero-crossing rate exactly 511/2047 (two sign changes "
        "per period, no trailing pair); digital silence reports all "
        "zeros. Closed-form DuckDB literals; the WAVs are built "
        "driver-side from deterministic arrays and decoded "
        "executor-side through codecs.decode_wav."
    ),
)
def audio_features_verdict(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    import numpy as np

    from ..multimodal.binary import audio_features
    from ..multimodal.codecs import encode_wav

    period = np.array([16384] * 4 + [-16384] * 4, dtype=np.int16)
    square = encode_wav(np.tile(period, 256), rate=8000)
    silence = encode_wav(np.zeros(1000, dtype=np.int16), rate=16000)
    media = spark.createDataFrame(
        [(1, bytearray(square)), (2, bytearray(silence))],
        "media_id long, content binary")
    return audio_features(media).orderBy("media_id")


@query(
    "video_frame_decode",
    oracle="""
    SELECT * FROM (VALUES
      (CAST(1 AS BIGINT), CAST(0 AS INT), CAST(16 AS INT),
       CAST(16 AS INT), CAST(1 AS INT), CAST(96.0 AS DOUBLE), TRUE),
      (CAST(1 AS BIGINT), CAST(1 AS INT), CAST(16 AS INT),
       CAST(16 AS INT), CAST(1 AS INT), CAST(128.0 AS DOUBLE), TRUE),
      (CAST(1 AS BIGINT), CAST(2 AS INT), CAST(16 AS INT),
       CAST(16 AS INT), CAST(1 AS INT), CAST(160.0 AS DOUBLE), TRUE),
      (CAST(2 AS BIGINT), CAST(0 AS INT), CAST(24 AS INT),
       CAST(8 AS INT), CAST(1 AS INT), CAST(131.0 AS DOUBLE), TRUE),
      (CAST(2 AS BIGINT), CAST(1 AS INT), CAST(24 AS INT),
       CAST(8 AS INT), CAST(1 AS INT), CAST(134.0 AS DOUBLE), TRUE)
    ) AS t(media_id, frame_idx, width, height, n_channels, mean_px,
           matches_jpeg_decoder)
    """,
    doc=(
        "MJPEG-in-MP4 pixel decode (VERDICT r11 ask #1): real MP4 "
        "containers whose video track fourcc is an MJPEG variant "
        "('jpeg' and 'mjpg' here) have every sample decoded to "
        "PIXELS executor-side — mp4.decode_frame_pixels routes the "
        "track's own sample-entry fourcc through the repo's "
        "baseline+progressive JPEG decoder, closing the "
        "decode_frame_pixels gate for intra-frame video; only "
        "H.264/HEVC inter-frame decode stays NotImplementedError. "
        "Fixture: container 1 = three 16x16 constant-gray frames "
        "(96/128/160), container 2 = two 24x8 frames (131/134); "
        "constant planes quantize to DC-only blocks whose roundtrip "
        "is EXACT, so frame dims/channels/means are closed-form "
        "DuckDB literals. matches_jpeg_decoder pins, per frame, that "
        "the container-routed decode array-equals decode_jpeg run "
        "directly on the extracted sample bytes (the routing neither "
        "corrupts samples nor mis-reads the codec). The op is an "
        "Arrow mapInPandas narrow map — same no-shuffle plan shape "
        "as every other multimodal decode."
    ),
)
def video_frame_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from ..multimodal.binary import video_frame_pixels
    from ..multimodal.jpeg import encode_jpeg
    from ..multimodal.mp4 import encode_mp4

    m1 = encode_mp4(
        [bytes(encode_jpeg(np.full((16, 16), v, dtype=np.uint8)))
         for v in (96, 128, 160)], width=16, height=16, codec=b"jpeg")
    m2 = encode_mp4(
        [bytes(encode_jpeg(np.full((8, 24), v, dtype=np.uint8)))
         for v in (131, 134)], width=24, height=8, codec=b"mjpg")
    media = spark.createDataFrame(
        [(1, bytearray(m1)), (2, bytearray(m2))],
        "media_id long, content binary")
    return video_frame_pixels(media).orderBy("media_id", "frame_idx")
