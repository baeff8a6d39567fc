"""Pure-stdlib/numpy codecs for self-describing formats.

PIL/ffmpeg aren't in this container, but PNG and WAV-PCM don't need
them: PNG is zlib + per-row filters, WAV is a RIFF header + raw PCM.
Implementing them here makes the multimodal decode path REAL for
these formats (``binary.py`` falls back to the SGM1 fake container
and keeps raising for formats that genuinely need a codec, e.g.
JPEG's DCT entropy coding).

Decoders are executor-side workhorses for ``mapInPandas`` operators:
bytes in → numpy out, no I/O, no global state — safe to call from any
Arrow batch on any worker.

Supported PNG subset: 8-bit depth, non-interlaced, color types 0
(gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA); all five scanline filters
(None/Sub/Up/Average/Paeth, RFC 2083 §6). Anything else raises
``ValueError`` with the reason.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (height, width, channels) uint8 array."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, width = 8, None
    idat = bytearray()
    while pos < len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        pos += 12 + length                      # len + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", chunk)
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color not in _CHANNELS:
                raise ValueError(f"unsupported color type {color}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    ch = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG payload size mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        row = np.frombuffer(raw, dtype=np.uint8,
                            count=stride, offset=y * (stride + 1) + 1).copy()
        ftype = raw[y * (stride + 1)]
        if ftype == 0:                          # None
            cur = row
        elif ftype == 1:                        # Sub
            cur = row
            for x in range(ch, stride):
                cur[x] = (int(cur[x]) + int(cur[x - ch])) & 0xFF
        elif ftype == 2:                        # Up
            cur = (row.astype(np.uint16) + prev) .astype(np.uint8)
        elif ftype == 3:                        # Average
            cur = row
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                cur[x] = (int(cur[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ftype == 4:                        # Paeth
            cur = row
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = cur
        prev = out[y]
    return out.reshape(height, width, ch)


def encode_png(img: np.ndarray) -> bytes:
    """(h, w, ch) or (h, w) uint8 array → PNG bytes (filter 0 rows)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = {1: 0, 3: 2, 2: 4, 4: 6}[ch]

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        body = ctype + payload
        return struct.pack(">I", len(payload)) + body + \
            struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """WAV bytes → (sample_rate, channels, samples[n, ch] int16/uint8).

    PCM (format 1) only; the RIFF chunks are walked explicitly so
    extra chunks (LIST, fact) don't break parsing."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, fmt, frames = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + clen]
        pos += 8 + clen + (clen & 1)            # chunks are word-aligned
        if cid == b"fmt ":
            audio_fmt, ch, rate, _br, _ba, bits = \
                struct.unpack("<HHIIHH", body[:16])
            if audio_fmt != 1:
                raise ValueError(f"non-PCM WAV (format {audio_fmt})")
            fmt = (ch, rate, bits)
        elif cid == b"data":
            frames = body
    if fmt is None or frames is None:
        raise ValueError("WAV missing fmt/data chunk")
    ch, rate, bits = fmt
    dtype = {8: np.uint8, 16: np.dtype("<i2")}.get(bits)
    if dtype is None:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    samples = np.frombuffer(frames, dtype=dtype)
    return rate, ch, samples.reshape(-1, ch)


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n, ch) int16 array → WAV-PCM bytes (via the stdlib writer)."""
    import io
    import wave

    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()
