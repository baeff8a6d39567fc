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
    # coerce, don't trust: numpy promotes uint8 arrays to int16 under
    # innocuous-looking scalar ops (u8 % 256), and a 2-byte-element
    # tobytes() silently doubles every row
    img = np.ascontiguousarray(img).astype(np.uint8, copy=False)
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


# ---------------------------------------------------------------------------
# BMP — uncompressed DIB; no codec library needed at all.

def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → (height, width, channels) uint8 array.

    Supported subset: BITMAPINFOHEADER (or larger) DIBs, BI_RGB
    (uncompressed) at 8 bpp (palettized → expanded through the
    palette), 24 bpp (BGR) and 32 bpp (BGRA); bottom-up and top-down
    (negative height) row orders; 4-byte row padding. Anything else
    raises ``ValueError`` with the reason."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (pix_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression != 0:
        raise ValueError(f"compressed BMP unsupported ({compression})")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    top_down = height < 0
    height = abs(height)
    ch = bpp // 8
    stride = (width * ch + 3) & ~3              # rows pad to 4 bytes
    need = pix_off + stride * height
    if len(data) < need:
        raise ValueError("BMP payload size mismatch")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * height,
                         offset=pix_off).reshape(height, stride)
    img = rows[:, :width * ch].reshape(height, width, ch)
    if not top_down:
        img = img[::-1]
    if bpp == 8:
        # palette: BGRA quads between header and pixels
        pal_n = (pix_off - 14 - hdr_size) // 4
        pal = np.frombuffer(data, dtype=np.uint8, count=pal_n * 4,
                            offset=14 + hdr_size).reshape(pal_n, 4)
        rgb = pal[img[:, :, 0]][:, :, [2, 1, 0]]     # BGRA → RGB
        return np.ascontiguousarray(rgb)
    # BGR(A) → RGB(A)
    order = [2, 1, 0] if ch == 3 else [2, 1, 0, 3]
    return np.ascontiguousarray(img[:, :, order])


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) RGB uint8 array → 24-bpp bottom-up BMP bytes."""
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w, ch = img.shape
    if ch != 3:
        raise ValueError("encode_bmp writes 24-bpp RGB only")
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = img[::-1, :, [2, 1, 0]].reshape(h, w * 3)
    pix = rows.tobytes()
    header = (b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(pix), 2835, 2835, 0, 0))
    return header + pix


# ---------------------------------------------------------------------------
# GIF — pure-Python LZW (the stretch codec): variable-width LSB-first
# codes, clear/end handling, dict growth to 12 bits.

def _lzw_decode(min_code_size: int, data: bytes,
                n_pixels: int) -> np.ndarray:
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    bitpos, total_bits = 0, len(data) * 8
    while bitpos + code_size <= total_bits and len(out) < n_pixels:
        byte_i = bitpos >> 3
        window = int.from_bytes(data[byte_i:byte_i + 3], "little")
        code = (window >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):                 # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        out += entry
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    if len(out) < n_pixels:
        raise ValueError("GIF pixel data truncated")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    """GIF-flavor LZW compressor (mirror of ``_lzw_decode``'s width
    schedule): emits CLEAR first, grows codes to 12 bits, re-clears
    when the table fills."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = bits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, bits
        acc |= code << bits
        bits += size
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code, code_size = end + 1, min_code_size + 1
    emit(clear, code_size)
    seq = b""
    for idx in bytes(np.asarray(indices, dtype=np.uint8)):
        cand = seq + bytes([idx])
        if cand in table:
            seq = cand
            continue
        emit(table[seq], code_size)
        table[cand] = next_code
        next_code += 1
        # decoder widens when ITS table hits 1<<code_size; its table
        # is one ahead of the last emitted code, so widen now if the
        # code just assigned filled this width
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        elif next_code - 1 == (1 << 12):
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code, code_size = end + 1, min_code_size + 1
        seq = bytes([idx])
    if seq:
        emit(table[seq], code_size)
    emit(end, code_size)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def decode_gif(data: bytes) -> np.ndarray:
    """GIF87a/89a bytes → (height, width, 3) uint8 RGB of the FIRST
    frame. Extensions are skipped; local color tables override the
    global one; interlaced images raise (subset honesty, like the
    PNG decoder's)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    _sw, _sh, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    palette = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        palette = np.frombuffer(data, dtype=np.uint8, count=n * 3,
                                offset=pos).reshape(n, 3)
        pos += n * 3
    while pos < len(data):
        block = data[pos]
        if block == 0x21:                        # extension: skip
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:                      # image descriptor
            _left, _top, w, h, iflags = struct.unpack(
                "<HHHHB", data[pos + 1:pos + 10])
            pos += 10
            if iflags & 0x40:
                raise ValueError("interlaced GIF unsupported")
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                palette = np.frombuffer(
                    data, dtype=np.uint8, count=n * 3,
                    offset=pos).reshape(n, 3)
                pos += n * 3
            if palette is None:
                raise ValueError("GIF image has no color table")
            min_code_size = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos]:
                ln = data[pos]
                lzw += data[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(min_code_size, bytes(lzw), w * h)
            if idx.max(initial=0) >= len(palette):
                raise ValueError("GIF index outside color table")
            return np.ascontiguousarray(
                palette[idx].reshape(h, w, 3))
        elif block == 0x3B:                      # trailer
            break
        else:
            raise ValueError(f"corrupt GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image")


def encode_gif(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB array → single-frame GIF89a bytes.

    The palette is built from the image's distinct colors (≤ 256
    required) and pixels are LZW-compressed with ``_lzw_encode`` —
    a real compressor, not a clear-per-pixel stub, so roundtrip
    tests exercise the decoder's dict growth and KwKwK path."""
    h, w, ch = img.shape
    if ch != 3:
        raise ValueError("encode_gif writes RGB only")
    flat = img.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif needs <= 256 distinct colors")
    pal_bits = max(1, int(len(colors) - 1).bit_length())
    pal_n = 1 << pal_bits
    pal = np.zeros((pal_n, 3), dtype=np.uint8)
    pal[:len(colors)] = colors
    min_code_size = max(2, pal_bits)
    lzw = _lzw_encode(min_code_size, inverse.astype(np.uint8))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (pal_bits - 1), 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(min_code_size)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
