"""Multimodal columns — image/audio/video as opaque ``binary`` with
typed metadata, processed by Arrow-batched ``mapInPandas`` operators.

North-star surface (BASELINE.json): at 100 TB, media rows dwarf text;
the engine treats payloads as binary columns co-partitioned with their
metadata so decode/feature/resize stages are ordinary narrow maps —
no shuffle, Arrow batches in and out, one Python worker per core.

PIL/ffmpeg/librosa are NOT in this container, so the codecs are
pure-Python/numpy (``codecs.py``, ``jpeg.py``, ``mp4.py``): PNG,
BMP, GIF, baseline+progressive JPEG, and WAV-PCM decode for REAL,
MP4 parses at the container level for real (track metadata + actual
frame byte ranges from the sample tables), and MJPEG video samples
decode to pixels for real (each sample is a bare JPEG →
``mp4.decode_frame_pixels`` routes it through ``jpeg.decode_jpeg``).
The ONE remaining gate is decoding an INTER-frame video bitstream to
pixels (H.264/HEVC — ``mp4.decode_frame_pixels`` raises
``NotImplementedError``), which genuinely needs an external codec
stack. A deterministic fake container format ("SGM1") remains the
bulk-test format that keeps every piece of Spark plumbing — schema,
binary handling, batch iteration, partitioning — testable at
volume. Swapping in libjpeg-turbo/ffmpeg in production changes no
plan shape.

Fake container layout (big-endian):
    magic   4s   b"SGM1"
    kind    1B   0=image 1=audio 2=video
    width   u16  (image/video) | sample-rate/1000 (audio)
    height  u16  (image/video) | channels        (audio)
    payload rest (pixel/sample bytes)
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"SGM1"
KINDS = ("image", "audio", "video")

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType()),
    T.StructField("content", T.BinaryType()),
    T.StructField("n_bytes", T.LongType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_payload_bytes", T.LongType()),
    T.StructField("mean_byte", T.DoubleType()),
])


def pack_media(kind_idx: int, width: int, height: int, payload: bytes) -> bytes:
    return MAGIC + struct.pack(">BHH", kind_idx, width, height) + payload


def _decode_payload(content: bytes) -> tuple[str, int, int, bytes]:
    """Parse one media blob into (kind, width, height, payload bytes).

    REAL decoders for every format that pure Python/numpy can carry:
    PNG (zlib + filters, ``codecs.decode_png``), BMP
    (``codecs.decode_bmp``), GIF (pure-Python LZW,
    ``codecs.decode_gif``), baseline JPEG (Huffman + dequant + IDCT,
    ``jpeg.decode_jpeg``, baseline + progressive — arithmetic raises
    with the reason) and WAV-PCM (``codecs.decode_wav`` — width
    carries sample-rate/1000, height channels, matching the SGM1
    convention). MP4 video whose track fourcc is MJPEG decodes its
    frames to pixels through the same JPEG decoder; other video
    codecs keep the raw sample bytes as payload. The SGM1 fake
    container remains the bulk-test format; the one decode that
    still genuinely requires an external codec stack (H.264/HEVC
    inter-frame) keeps raising — swapping in ffmpeg there changes no
    plan shape."""
    from . import codecs

    if content[:4] == MAGIC:
        kind_idx, width, height = struct.unpack(">BHH", content[4:9])
        return KINDS[kind_idx], width, height, content[9:]
    if content[:8] == codecs.PNG_MAGIC:
        img = codecs.decode_png(content)
        h, w, _ch = img.shape
        return "image", w, h, img.tobytes()
    if content[:2] == b"BM":
        img = codecs.decode_bmp(content)
        h, w, _ch = img.shape
        return "image", w, h, img.tobytes()
    if content[:6] in (b"GIF87a", b"GIF89a"):
        img = codecs.decode_gif(content)
        h, w, _ch = img.shape
        return "image", w, h, img.tobytes()
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        rate, ch, samples = codecs.decode_wav(content)
        return "audio", rate // 1000, ch, samples.tobytes()
    if content[:3] == b"\xff\xd8\xff":
        from .jpeg import decode_jpeg
        img = decode_jpeg(content)
        h, w = img.shape[:2]
        return "image", w, h, img.tobytes()
    if content[4:8] == b"ftyp":
        from .mp4 import _MJPEG_FOURCCS, decode_frame_pixels, parse_mp4
        info = parse_mp4(content)
        tracks = info["tracks"]
        # kind from the media HANDLER, not assumed: an .m4a is an
        # audio container with the same ftyp magic. Prefer the first
        # video track; else the first audio track; else whatever is
        # there (metadata-only containers stay "video" with 0 dims).
        t = next((x for x in tracks if x.get("handler") == "vide"),
                 None)
        kind = "video"
        if t is None:
            t = next((x for x in tracks
                      if x.get("handler") == "soun"), None)
            if t is not None:
                kind = "audio"
        if t is None:
            t = tracks[0] if tracks else {}
        if (kind == "video" and
                t.get("codec", "").strip().lower() in _MJPEG_FOURCCS):
            # MJPEG decodes to PIXELS for real (each sample is a bare
            # intra-coded JPEG → the repo's own decoder), so the
            # payload this feature op measures is the decoded raster,
            # exactly like the still-image branches above. Decode the
            # track ALREADY SELECTED above (the handler-preference
            # fallback can pick tracks[0] when no 'vide' handler
            # exists — re-selecting by handler inside a helper would
            # turn that decodable row into a ValueError, and would
            # re-parse the container besides)
            payload = b"".join(
                decode_frame_pixels(content[o:o + s], t["codec"])
                .astype(np.uint8).tobytes()
                for o, s in t.get("samples", []))
        else:
            payload = b"".join(content[o:o + s]
                               for o, s in t.get("samples", []))
        return (kind, t.get("width", 0), t.get("height", 0), payload)
    raise ValueError(f"unknown media container: {content[:4]!r}")


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic media table from ``documents``: the
    UTF-8 text bytes become the payload, kind/dims derived from doc_id
    — a stand-in for reading real blobs via
    ``spark.read.format('binaryFile')``."""
    kind_idx = (F.col("doc_id") % 3).cast("int")
    width = (F.lit(16) + F.col("doc_id") % 48).cast("int")
    height = (F.lit(16) + F.col("doc_id") % 32).cast("int")
    header = F.concat(
        F.lit(MAGIC),
        F.unhex(F.lpad(F.hex(kind_idx), 2, "0")),
        F.unhex(F.lpad(F.hex(width), 4, "0")),
        F.unhex(F.lpad(F.hex(height), 4, "0")),
    )
    content = F.concat(header, F.encode("text", "UTF-8"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(*[F.lit(k) for k in KINDS]), kind_idx + 1)
        .alias("kind"),
        content.alias("content"),
        F.length(content).cast("long").alias("n_bytes"))


def decode_media_features(media: DataFrame) -> DataFrame:
    """Binary → typed features via ``mapInPandas`` (narrow, no shuffle;
    one Arrow batch in, one out)."""
    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                kind, w, h, payload = _decode_payload(bytes(content))
                arr = np.frombuffer(payload, dtype=np.uint8)
                rows.append((mid, kind, w, h, len(payload),
                             float(arr.mean()) if len(arr) else 0.0))
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA])

    return media.select("media_id", "content").mapInPandas(
        decode, schema=FEATURE_SCHEMA)


_IMAGE_MAGICS = (b"\x89PNG", b"BM", b"GIF8", b"\xff\xd8\xff")


def _decode_image_array(content: bytes) -> np.ndarray | None:
    """(h, w, ch) uint8 array for a REAL image container, None for
    the SGM1 fake (whose payload is arbitrary bytes, not pixels)."""
    if not content.startswith(_IMAGE_MAGICS):
        return None
    kind, w, h, payload = _decode_payload(content)
    if kind != "image":
        return None
    ch = len(payload) // (w * h)
    return np.frombuffer(payload, dtype=np.uint8).reshape(h, w, ch)


def resize_images(media: DataFrame, max_side: int = 32) -> DataFrame:
    """Resize images to fit ``max_side``. REAL image containers
    (PNG/BMP/GIF/JPEG) are decoded to pixels, nearest-neighbor
    downsampled, and re-encoded as PNG (the canonical lossless
    output format — a resized JPEG must not be double-lossy); the
    SGM1 fake container keeps its SQL-replayable dim-clamp +
    byte-stride subsample. Plan shape either way: narrow map over
    binary, new binary out."""
    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import codecs

        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                content = bytes(content)
                img = _decode_image_array(content)
                if img is not None:
                    h, w = img.shape[:2]
                    if max(w, h) <= max_side:
                        out.append((mid, "image", content))
                        continue
                    scale = max(w, h) / max_side
                    nh = max(1, round(h / scale))
                    nw = max(1, round(w / scale))
                    ys = np.minimum((np.arange(nh) * h) // nh, h - 1)
                    xs = np.minimum((np.arange(nw) * w) // nw, w - 1)
                    small = img[ys][:, xs]
                    out.append((mid, "image",
                                codecs.encode_png(small)))
                    continue
                kind, w, h, payload = _decode_payload(content)
                if kind != "image" or max(w, h) <= max_side:
                    out.append((mid, kind, content))
                    continue
                scale = max(w, h) / max_side
                nw, nh = max(1, int(w / scale)), max(1, int(h / scale))
                step = max(1, len(payload) // max(1, nw * nh))
                out.append((mid, kind,
                            pack_media(0, nw, nh, payload[::step])))
            yield pd.DataFrame(out, columns=["media_id", "kind", "content"])

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ])
    return media.select("media_id", "content").mapInPandas(
        resize, schema=out_schema)


AUDIO_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("peak_freq_hz", T.DoubleType()),
    T.StructField("zero_crossing_rate", T.DoubleType()),
])


def audio_features(media: DataFrame) -> DataFrame:
    """Signal-level audio features via numpy FFT in ``mapInPandas``
    (narrow, no shuffle) — the audio leg of the decode/feature-extract
    north-star surface, over REAL decoded PCM:

    * ``rms`` of the [-1, 1]-normalized mono mix,
    * ``peak_freq_hz``: the dominant non-DC bin of the full-signal
      real FFT, in Hz (0.0 for silence),
    * ``zero_crossing_rate``: sign-change fraction over adjacent
      sample pairs.

    WAV-PCM rows decode through ``codecs.decode_wav``; non-audio rows
    and audio whose payload is not PCM (SGM1 fakes, m4a codec
    packets) are skipped — features over entropy-coded bytes would be
    noise dressed as signal. Closed-form pinned by the
    ``audio_features_verdict`` query (an on-bin square wave: rms
    exactly 0.5, peak exactly the fundamental, ZCR exactly
    2·periods−1 over n−1)."""
    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import codecs

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                content = bytes(content)
                if not (content[:4] == b"RIFF"
                        and content[8:12] == b"WAVE"):
                    continue
                rate, _ch, samples = codecs.decode_wav(content)
                mono = samples.astype(np.float64).mean(axis=1)
                # Full-scale parity across bit depths: uint8 PCM is
                # offset-binary centered at 128 with half-range 128
                # (0..255 → ±1.0), matching int16's 32768 divisor —
                # dividing by 255 would report ~2× lower rms for the
                # same waveform encoded at 8 bits.
                if samples.dtype == np.uint8:
                    mono = mono - 128.0
                    denom = 128.0
                else:
                    denom = 32768.0
                x = mono / denom
                n = len(x)
                rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
                if n and rms > 0.0:
                    mag = np.abs(np.fft.rfft(x))
                    k = 1 + int(np.argmax(mag[1:])) if len(mag) > 1 \
                        else 0
                    peak = k * rate / n
                else:
                    peak = 0.0
                # signbit-based (exact zeros count as positive): an
                # on-bin sine crosses zero EXACTLY at sample points,
                # where a strict product<0 test would count nothing
                zcr = (float(np.mean(np.signbit(x[:-1])
                                     != np.signbit(x[1:])))
                       if n > 1 else 0.0)
                rows.append((mid, rate, n, n / rate, rms, peak, zcr))
            yield pd.DataFrame(rows, columns=[
                f.name for f in AUDIO_FEATURE_SCHEMA])

    return media.select("media_id", "content").mapInPandas(
        feats, schema=AUDIO_FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64,
                  max_frames: int = 8) -> DataFrame:
    """Frame sampling for 'video' rows: one output row per sampled
    frame (media_id, frame_idx, frame binary) — the explode-shaped
    multimodal op (UNNEST of a decoded stream). Real MP4 containers
    emit their ACTUAL samples (frame payloads from the stsz/stsc/stco
    tables, ``mp4.extract_samples``); the SGM1 fake container keeps
    the fixed-stride slicing its oracle replays in SQL."""
    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                content = bytes(content)
                if content[4:8] == b"ftyp":
                    # frames come from the first VIDEO track only —
                    # an audio-only container (.m4a) contributes none
                    from .mp4 import parse_mp4
                    info = parse_mp4(content)
                    vt = next((x for x in info["tracks"]
                               if x.get("handler") == "vide"), None)
                    if vt is not None:
                        for i, (o, s) in enumerate(
                                vt["samples"][:max_frames]):
                            rows.append((mid, i, content[o:o + s]))
                    continue
                kind, w, h, payload = _decode_payload(content)
                if kind != "video":
                    continue
                for i in range(0, min(max_frames * every_n_bytes,
                                      len(payload)), every_n_bytes):
                    rows.append((mid, i // every_n_bytes,
                                 payload[i:i + every_n_bytes]))
            yield pd.DataFrame(rows,
                               columns=["media_id", "frame_idx", "frame"])

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ])
    return media.select("media_id", "content").mapInPandas(
        frames, schema=out_schema)


FRAME_PIXEL_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("mean_px", T.DoubleType()),
    T.StructField("matches_jpeg_decoder", T.BooleanType()),
])


def video_frame_pixels(media: DataFrame,
                       max_frames: int = 8) -> DataFrame:
    """Per-frame PIXEL decode of MJPEG MP4 rows — the decode leg the
    frame-sampling op stops short of (``sample_frames`` emits sample
    BYTES; this decodes them). One output row per decoded frame with
    dims/channels/mean over the decoded raster, all computed
    executor-side inside the Arrow batch (narrow map, no shuffle —
    identical plan shape to ``decode_media_features``).

    ``matches_jpeg_decoder`` re-decodes the extracted sample bytes
    through ``jpeg.decode_jpeg`` directly and pins array equality
    against the container-routed path
    (``mp4.decode_frame_pixels`` with the track's fourcc) — the
    routing must neither corrupt the sample bytes nor mis-read the
    codec. Non-MJPEG or non-MP4 rows contribute no rows (the decode
    for inter-frame codecs stays gated in
    ``mp4.decode_frame_pixels``)."""
    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .jpeg import decode_jpeg
        from .mp4 import _MJPEG_FOURCCS, decode_frame_pixels, parse_mp4
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                content = bytes(content)
                if content[4:8] != b"ftyp":
                    continue
                info = parse_mp4(content)
                vt = next((x for x in info["tracks"]
                           if x.get("handler") == "vide"), None)
                if vt is None:
                    continue
                codec = vt.get("codec", "")
                if codec.strip().lower() not in _MJPEG_FOURCCS:
                    continue
                for i, (o, s) in enumerate(vt["samples"][:max_frames]):
                    sample = content[o:o + s]
                    px = decode_frame_pixels(sample, codec)
                    direct = decode_jpeg(sample)
                    h, w = px.shape[:2]
                    ch = 1 if px.ndim == 2 else px.shape[2]
                    rows.append((mid, i, w, h, ch, float(px.mean()),
                                 bool(np.array_equal(px, direct))))
            yield pd.DataFrame(rows, columns=[
                f.name for f in FRAME_PIXEL_SCHEMA])

    return media.select("media_id", "content").mapInPandas(
        frames, schema=FRAME_PIXEL_SCHEMA)
