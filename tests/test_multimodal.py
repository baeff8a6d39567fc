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
    # every container parses for REAL now — a truncated MP4/JPEG/PNG
    # is a data error, not a missing-codec error; the one remaining
    # NotImplementedError is sample-bitstream pixel decode
    # (mp4.decode_frame_pixels, pinned in the mp4 test)
    with pytest.raises(ValueError):
        _decode_payload(b"\x00\x00\x00\x18ftypisom" + b"x" * 16)
    with pytest.raises(ValueError):
        _decode_payload(b"\xff\xd8\xff\xe0" + b"x" * 16)
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


def test_bmp_roundtrip_and_variants():
    import struct

    import numpy as np
    import pytest

    from nvd2mysqlloader_spark.multimodal.codecs import (decode_bmp,
                                                         encode_bmp)
    rng = np.random.default_rng(13)
    # widths that exercise 4-byte row padding (w*3 % 4 != 0)
    for w in (5, 6, 7, 8):
        img = rng.integers(0, 256, size=(9, w, 3), dtype=np.uint8)
        back = decode_bmp(encode_bmp(img))
        assert back.shape == img.shape and (back == img).all()
    # top-down (negative height) decodes to the same array
    img = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    b = bytearray(encode_bmp(img))
    h = struct.unpack("<i", b[22:26])[0]
    struct.pack_into("<i", b, 22, -h)
    stride = 6 * 3 + 2  # 18 -> pad to 20
    pix = np.frombuffer(bytes(b[54:]), dtype=np.uint8).reshape(4, 20)
    flipped = pix[::-1].tobytes()
    assert (decode_bmp(bytes(b[:54]) + flipped) == img).all()
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"XX" + b"\x00" * 60)
    with pytest.raises(ValueError, match="compressed"):
        bad = bytearray(encode_bmp(img))
        struct.pack_into("<I", bad, 30, 1)       # BI_RLE8
        decode_bmp(bytes(bad))


def test_bmp_8bit_palette():
    import struct

    import numpy as np

    from nvd2mysqlloader_spark.multimodal.codecs import decode_bmp
    # hand-build a 2x3 8-bpp BMP with a 4-entry palette
    pal = [(10, 20, 30), (200, 100, 0), (0, 0, 255), (255, 255, 255)]
    idx = np.array([[0, 1, 2], [3, 2, 1]], dtype=np.uint8)
    stride = (3 + 3) & ~3                       # 3 -> 4
    rows = np.zeros((2, stride), dtype=np.uint8)
    rows[:, :3] = idx[::-1]                     # bottom-up
    pal_bytes = b"".join(bytes([b_, g, r, 0]) for r, g, b_ in pal)
    pix_off = 14 + 40 + len(pal_bytes)
    data = (b"BM" + struct.pack("<IHHI", pix_off + rows.size, 0, 0,
                                pix_off)
            + struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 8, 0,
                          rows.size, 0, 0, len(pal), 0)
            + pal_bytes + rows.tobytes())
    out = decode_bmp(data)
    assert out.shape == (2, 3, 3)
    want = np.array([[pal[0], pal[1], pal[2]],
                     [pal[3], pal[2], pal[1]]], dtype=np.uint8)
    assert (out == want).all()


def test_gif_roundtrip_golden_and_lzw_paths():
    import numpy as np
    import pytest

    from nvd2mysqlloader_spark.multimodal.codecs import (_lzw_decode,
                                                         _lzw_encode,
                                                         decode_gif,
                                                         encode_gif)
    # the canonical 43-byte 1x1 GIF89a (black pixel, 2-color table):
    # an EXTERNALLY-authored golden blob, so the decoder is pinned
    # against the real format, not just our own encoder
    golden = bytes.fromhex(
        "474946383961"                  # GIF89a
        "01000100800000"                # 1x1, 2-entry global table
        "000000ffffff"                  # palette black, white
        "21f9040100000000"              # graphic control extension
        "2c00000000010001000002024401003b")
    g = decode_gif(golden)
    assert g.shape == (1, 1, 3) and (g == 0).all()

    rng = np.random.default_rng(17)
    # few colors, long runs: dict growth beyond initial width
    img = np.repeat(((rng.integers(0, 5, size=(40, 33)) * 50)
                     .astype(np.uint8))[:, :, None], 3, axis=2)
    assert (decode_gif(encode_gif(img)) == img).all()
    # ~200 colors: multi-step code-size growth
    v = rng.integers(0, 200, size=(80, 90), dtype=np.uint8)
    img2 = np.stack([v, v // 2, 255 - v], axis=2)
    assert (decode_gif(encode_gif(img2)) == img2).all()
    # big low-entropy image: 12-bit table fill + mid-stream re-clear
    img3 = np.zeros((300, 300, 3), dtype=np.uint8)
    img3[::2, :, 0] = 255
    assert (decode_gif(encode_gif(img3)) == img3).all()
    # KwKwK: aaa... emits a code one past the table end
    seq = np.zeros(64, dtype=np.uint8)
    assert (_lzw_decode(2, _lzw_encode(2, seq), 64) == seq).all()
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOTGIF" + b"\x00" * 20)
    with pytest.raises(ValueError, match="truncated"):
        # keep min_code_size, drop the pixel sub-block entirely
        decode_gif(golden[:-5] + b"\x00\x3b")


def test_decode_features_on_bmp_and_gif(spark):
    """BMP and GIF rows decode for real through the SAME mapInPandas
    feature op as PNG/WAV/SGM1 — one mixed table, executor-side."""
    import numpy as np

    from nvd2mysqlloader_spark.multimodal.binary import \
        decode_media_features
    from nvd2mysqlloader_spark.multimodal.codecs import (encode_bmp,
                                                         encode_gif)
    bmp_img = np.arange(36, dtype=np.uint8).reshape(3, 4, 3)
    gif_img = np.repeat(
        ((np.arange(12) % 3) * 100).astype(np.uint8)
        .reshape(3, 4)[:, :, None], 3, axis=2)
    media = spark.createDataFrame(
        [(1, bytearray(encode_bmp(bmp_img))),
         (2, bytearray(encode_gif(gif_img)))],
        "media_id long, content binary")
    rows = {r["media_id"]: r for r in
            decode_media_features(media).collect()}
    assert (rows[1]["kind"], rows[1]["width"], rows[1]["height"],
            rows[1]["n_payload_bytes"]) == ("image", 4, 3, 36)
    assert rows[1]["mean_byte"] == 17.5
    assert (rows[2]["kind"], rows[2]["width"], rows[2]["height"],
            rows[2]["n_payload_bytes"]) == ("image", 4, 3, 36)
    assert rows[2]["mean_byte"] == 100.0


def test_jpeg_decodes_real_world_goldens():
    """The baseline JPEG decoder pinned against EXTERNALLY-authored
    files (not our own encoder): the 331-byte IPython test fixture
    ``2x2.jpg`` (baseline grayscale, standard Annex-K tables) and the
    543-byte CPython imghdr fixture ``python.jpg`` (16x16 color,
    4:2:0 chroma subsampling — exercises the multi-block MCU and
    upsample paths). The 2x2 expectation is analytic (a blank
    fixture: constant mid-gray); the python.jpg digest is a decoder
    snapshot guarding regressions."""
    import hashlib

    import numpy as np

    from nvd2mysqlloader_spark.multimodal.jpeg import decode_jpeg

    blank_2x2 = bytes.fromhex(
        "ffd8ffe000104a46494600010100000100010000ffdb0043000806060706"
        "05080707070909080a0c140d0c0b0b0c1912130f141d1a1f1e1d1a1c1c20"
        "242e2720222c231c1c2837292c30313434341f27393d38323c2e333432ff"
        "c0000b080002000201011100ffc4001f0000010501010101010100000000"
        "000000000102030405060708090a0bffc400b51000020103030204030505"
        "04040000017d01020300041105122131410613516107227114328191a108"
        "2342b1c11552d1f02433627282090a161718191a25262728292a34353637"
        "38393a434445464748494a535455565758595a636465666768696a737475"
        "767778797a838485868788898a92939495969798999aa2a3a4a5a6a7a8a9"
        "aab2b3b4b5b6b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae1e2"
        "e3e4e5e6e7e8e9eaf1f2f3f4f5f6f7f8f9faffda0008010100003f002bff"
        "d9")
    img = decode_jpeg(blank_2x2)
    assert img.shape == (2, 2) and img.dtype == np.uint8
    assert (img == 128).all()

    python_16 = bytes.fromhex(
        "ffd8ffe000104a46494600010101000100010000ffdb0043000302020202"
        "02030202020303030304060404040404080606050609080a0a090809090a"
        "0c0f0c0a0b0e0b09090d110d0e0f101011100a0c12131210130f101010ff"
        "db00430103030304030408040408100b090b101010101010101010101010"
        "101010101010101010101010101010101010101010101010101010101010"
        "1010101010101010ffc00011080010001003012200021101031101ffc400"
        "160001010100000000000000000000000000070405ffc400241000010401"
        "0402020300000000000000000102030406050708121311220014093132ff"
        "c4001501010100000000000000000000000000000006ffc4002311000102"
        "05030500000000000000000000010211030405062100123115166181e1ff"
        "da000c03010002110311003f0014a6d26a1b73c1e61312d4951cf31163e4"
        "2565beba5aec694540b1e520b254a51fd2cab8faf220ab963d976c9335e6"
        "9b77d7e66da71781a5571c7f1cea71e24b39d7e32253f21a69ded4714a38"
        "b482e84b892a71691ecd2d213bf1efb91a74aceea15a758ed548ac655b85"
        "8b81857b21299867a96b94b949654fb9c88529114b812af07ad9f23c807e"
        "55be0df662a140cce8e69a3d5cb743b3d77a6558b1d9512188bf64b8d3f1"
        "c3680429c0d0febb3c02e03c5407b4bdd97b54e627fb6edf946014826213"
        "8db8529828370589727960e432896fc3828ea7528cea208dbe78191f07ad"
        "7fffd9")
    img2 = decode_jpeg(python_16)
    assert img2.shape == (16, 16, 3)
    assert hashlib.sha256(img2.tobytes()).hexdigest().startswith(
        "2a250932a73d8418")
    assert 90 < float(img2.mean()) < 95


def test_jpeg_roundtrip_and_subset_gates():
    import numpy as np
    import pytest

    from nvd2mysqlloader_spark.multimodal.jpeg import (decode_jpeg,
                                                       encode_jpeg)

    def psnr(a, b):
        mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
        return 99.0 if mse == 0 else 10 * np.log10(255 ** 2 / mse)

    # constant gray: DC-only blocks quantize to zero -> EXACT
    img = np.full((24, 17), 128, dtype=np.uint8)
    assert (decode_jpeg(encode_jpeg(img)) == img).all()

    yy, xx = np.mgrid[0:64, 0:48]
    grad = (yy * 200 // 64 + xx * 50 // 48).astype(np.uint8)
    assert psnr(grad, decode_jpeg(encode_jpeg(grad, quality=90))) > 40

    rgb = np.stack([(yy * 255 // 64).astype(np.uint8),
                    (xx * 255 // 48).astype(np.uint8),
                    ((yy + xx) * 255 // 112).astype(np.uint8)], axis=2)
    back = decode_jpeg(encode_jpeg(rgb, quality=90))
    assert back.shape == rgb.shape and psnr(rgb, back) > 35

    # restart markers: DRI/RSTn stream decodes identically
    with_rst = decode_jpeg(encode_jpeg(grad, quality=90,
                                       restart_interval=3))
    without = decode_jpeg(encode_jpeg(grad, quality=90))
    assert (with_rst == without).all()

    # subset honesty: unsupported SOFs raise with the reason; a
    # baseline stream relabeled SOF2 is MALFORMED progressive (its
    # single scan spans Ss=0..Se=63, which progressive forbids) and
    # must be rejected loudly, not misdecoded
    blob = bytearray(encode_jpeg(grad))
    sof = blob.find(b"\xff\xc0")
    blob[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(blob))
    blob[sof + 1] = 0xC1
    with pytest.raises(ValueError, match="extended"):
        decode_jpeg(bytes(blob))
    # malformed-input rejection stays in THIS unconditional test (it
    # must run even on hosts without the progressive golden files)
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"NOPE" + b"\x00" * 32)


PROGRESSIVE_GOLDENS = [
    # externally-authored progressive (SOF2) files shipped in this
    # container, chosen to cover the whole §G feature matrix:
    # (path, expected shape, decoder-snapshot sha256 prefix,
    #  (mean_lo, mean_hi))
    # Spark's own mllib test image: 1-component, full successive
    # approximation (DC Al=1 + refinement, AC first Al=2 + two
    # refinement passes)
    ("/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/"
     "multi-channel/grayscale.jpg",
     (215, 300), "cadb16e7b0e2b902", (141.0, 143.5)),
    # 3-component 4:4:4, spectral selection only (per-component DC
    # scans, split AC bands, no successive approximation)
    ("/usr/share/doc/nodejs/thin-white-stripe.jpg",
     (58, 493, 3), "73ce8c019a427028", (232.0, 235.0)),
    # 3-component 4:4:4 with AC successive approximation (Al=1→0)
    ("/usr/share/doc/nodejs/full-white-stripe.jpg",
     (312, 493, 3), "330fe1cd3ed781f8", (248.5, 251.0)),
    # 4:2:2 subsampled with an INTERLEAVED 3-component DC scan and
    # full successive approximation — exercises the MCU-order DC
    # path AND the non-interleaved component block dims (chroma
    # scans traverse ceil(w/2/8) columns, smaller than the padded
    # coefficient array)
    ("/root/.rustup/toolchains/stable-x86_64-unknown-linux-gnu/"
     "share/doc/rust/html/embedded-book/assets/f3.jpg",
     (477, 720, 3), "12889f7e9ddd1821", (106.5, 109.0)),
]


def test_jpeg_progressive_decodes_real_world_goldens():
    """The progressive decoder pinned against EXTERNALLY-authored
    SOF2 files (never our own encoder — we only encode baseline).
    Digests are decoder snapshots guarding regressions; the mean
    bands are loose analytic anchors. Pixel-level ground truth is
    pinned separately against the JVM's javax.imageio decode in
    test_jpeg_progressive_matches_imageio."""
    import hashlib
    import os

    import numpy as np
    import pytest

    from nvd2mysqlloader_spark.multimodal.jpeg import decode_jpeg

    ran = 0
    for path, shape, digest, (lo, hi) in PROGRESSIVE_GOLDENS:
        if not os.path.isfile(path):
            continue
        img = decode_jpeg(open(path, "rb").read())
        assert img.shape == shape and img.dtype == np.uint8, path
        assert hashlib.sha256(img.tobytes()).hexdigest().startswith(
            digest), path
        assert lo < float(img.mean()) < hi, path
        ran += 1
    if not ran:
        pytest.skip("no progressive golden files present")


def test_jpeg_progressive_matches_imageio(spark):
    """Ground truth for the progressive path: decode the Spark mllib
    grayscale golden (full successive approximation) with BOTH this
    repo's pure-Python decoder and the JVM's independent
    javax.imageio decoder (raster samples, so Java's gray→sRGB
    colorspace conversion can't skew the comparison) — max abs pixel
    difference must be ≤ 1 (IDCT rounding).  Also cross-checks the
    4:4:4 color golden with AC refinement via getRGB (no chroma
    upsample ambiguity at 4:4:4) at ≤ 2."""
    import os

    import numpy as np
    import pytest

    from nvd2mysqlloader_spark.multimodal.jpeg import decode_jpeg

    jvm = spark.sparkContext._jvm

    gray = PROGRESSIVE_GOLDENS[0][0]
    color = PROGRESSIVE_GOLDENS[2][0]
    if not (os.path.isfile(gray) and os.path.isfile(color)):
        pytest.skip("progressive golden files not present")

    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(gray))
    w, h = img.getWidth(), img.getHeight()
    ref = np.array(
        img.getRaster().getSamples(0, 0, w, h, 0, None),
        dtype=np.int64).reshape(h, w)
    mine = decode_jpeg(open(gray, "rb").read()).astype(np.int64)
    assert int(np.abs(mine - ref).max()) <= 1

    img = jvm.javax.imageio.ImageIO.read(jvm.java.io.File(color))
    w, h = img.getWidth(), img.getHeight()
    a = np.array(img.getRGB(0, 0, w, h, None, 0, w),
                 dtype=np.int64).reshape(h, w)
    ref = np.stack([(a >> 16) & 0xFF, (a >> 8) & 0xFF, a & 0xFF],
                   axis=2)
    mine = decode_jpeg(open(color, "rb").read()).astype(np.int64)
    assert int(np.abs(mine - ref).max()) <= 2


def test_jpeg_idct_matches_naive_reference():
    """The matrix-sandwich IDCT equals the textbook O(n^4) IDCT-II
    double sum — the transform itself is pinned independently of the
    bitstream layer."""
    import numpy as np

    from nvd2mysqlloader_spark.multimodal.jpeg import _T

    rng = np.random.default_rng(23)
    F = rng.normal(0, 50, size=(8, 8))
    fast = _T.T @ F @ _T
    naive = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)
                    cv = np.sqrt(1 / 8) if v == 0 else np.sqrt(2 / 8)
                    s += (cu * cv * F[u, v]
                          * np.cos((2 * x + 1) * u * np.pi / 16)
                          * np.cos((2 * y + 1) * v * np.pi / 16))
            naive[x, y] = s
    assert np.allclose(fast, naive, atol=1e-10)


def test_jpeg_through_media_feature_op(spark):
    """JPEG rows decode for real through the SAME mapInPandas feature
    op as every other format — constant-gray JPEG gives closed-form
    features."""
    import numpy as np

    from nvd2mysqlloader_spark.multimodal.binary import \
        decode_media_features
    from nvd2mysqlloader_spark.multimodal.jpeg import encode_jpeg

    img = np.full((6, 8), 128, dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, bytearray(encode_jpeg(img)))],
        "media_id long, content binary")
    r = decode_media_features(media).first()
    assert (r["kind"], r["width"], r["height"],
            r["n_payload_bytes"], r["mean_byte"]) == \
        ("image", 8, 6, 48, 128.0)


def test_mp4_container_roundtrip_and_subset_gates():
    import struct

    import pytest

    from nvd2mysqlloader_spark.multimodal.mp4 import (decode_frame_pixels,
                                                      encode_mp4,
                                                      extract_samples,
                                                      parse_mp4)
    samples = [bytes([i]) * (10 + i * 7) for i in range(5)]
    blob = encode_mp4(samples, width=64, height=48, timescale=30)
    info = parse_mp4(blob)
    assert info["brand"] == "isom" and len(info["tracks"]) == 1
    t = info["tracks"][0]
    assert (t["handler"], t["codec"]) == ("vide", "raw ")
    assert (t["width"], t["height"]) == (64, 48)
    assert (t["timescale"], t["duration"]) == (30, 5)
    assert t["n_samples"] == 5
    assert extract_samples(blob) == samples

    # sample-table consistency check fires on a corrupted stsz count
    bad = bytearray(blob)
    p = bad.find(b"stsz")
    (declared,) = struct.unpack(">I", bad[p + 12:p + 16])
    struct.pack_into(">I", bad, p + 12, declared + 1)
    with pytest.raises(ValueError):
        parse_mp4(bytes(bad))

    with pytest.raises(ValueError, match="not an MP4"):
        parse_mp4(b"\x00" * 16)
    with pytest.raises(NotImplementedError, match="codec stack"):
        decode_frame_pixels(samples[0], "avc1")


def test_mp4_through_media_ops(spark):
    """A real MP4 container flows through the SAME mapInPandas ops:
    features report track dims + concatenated sample bytes, and
    sample_frames emits the ACTUAL stsz/stco frame payloads, not
    byte strides."""
    from nvd2mysqlloader_spark.multimodal.binary import (
        decode_media_features, sample_frames)
    from nvd2mysqlloader_spark.multimodal.mp4 import encode_mp4

    samples = [b"\x10" * 40, b"\x20" * 24, b"\x30" * 16]
    blob = encode_mp4(samples, width=32, height=24)
    media = spark.createDataFrame(
        [(7, bytearray(blob))], "media_id long, content binary")
    r = decode_media_features(media).first()
    assert (r["kind"], r["width"], r["height"]) == ("video", 32, 24)
    assert r["n_payload_bytes"] == 80
    assert r["mean_byte"] == (0x10 * 40 + 0x20 * 24 + 0x30 * 16) / 80
    frames = sample_frames(media, max_frames=8).collect()
    assert [bytes(f["frame"]) for f in
            sorted(frames, key=lambda f: f["frame_idx"])] == samples


def test_mp4_sample_containing_mdat_bytes_roundtrips():
    """Chunk offsets are computed structurally — a sample whose
    payload contains the byte sequence 'mdat' must not corrupt the
    layout."""
    from nvd2mysqlloader_spark.multimodal.mp4 import (encode_mp4,
                                                      extract_samples)
    samples = [b"xx" + b"mdat" + b"yy", b"second-frame", b"mdatmdat"]
    assert extract_samples(encode_mp4(samples)) == samples


def test_m4a_audio_container_classified_as_audio(spark):
    """An audio-only MP4 (.m4a: same ftyp magic, 'soun' handler) is
    kind=audio in features and contributes NO frames."""
    from nvd2mysqlloader_spark.multimodal.binary import (
        _decode_payload, decode_media_features, sample_frames)
    from nvd2mysqlloader_spark.multimodal.mp4 import encode_mp4

    pkts = [b"\x01" * 12, b"\x02" * 8]
    m4a = encode_mp4(pkts, width=0, height=0, handler=b"soun",
                     codec=b"mp4a")
    kind, _w, _h, payload = _decode_payload(m4a)
    assert kind == "audio" and payload == b"".join(pkts)
    media = spark.createDataFrame(
        [(1, bytearray(m4a))], "media_id long, content binary")
    assert decode_media_features(media).first()["kind"] == "audio"
    assert sample_frames(media).count() == 0


def test_resize_real_images_pixel_accurate(spark):
    """REAL image containers resize by decoded PIXELS (nearest
    neighbor), not byte strides, and re-encode losslessly as PNG —
    a resized JPEG must not be double-lossy."""
    import numpy as np

    from nvd2mysqlloader_spark.multimodal.binary import (
        _decode_payload, resize_images)
    from nvd2mysqlloader_spark.multimodal.codecs import (decode_png,
                                                         encode_png)
    from nvd2mysqlloader_spark.multimodal.jpeg import encode_jpeg

    rng = np.random.default_rng(29)
    big = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    small_src = rng.integers(0, 256, size=(10, 12, 3), dtype=np.uint8)
    jpeg_gray = np.full((40, 50), 128, dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, bytearray(encode_png(big))),
         (2, bytearray(encode_png(small_src))),     # under max_side
         (3, bytearray(encode_jpeg(jpeg_gray)))],
        "media_id long, content binary")
    out = {r["media_id"]: bytes(r["content"])
           for r in resize_images(media, max_side=32).collect()}

    got = decode_png(out[1])
    assert got.shape == (24, 32, 3)
    ys = np.minimum((np.arange(24) * 48) // 24, 47)
    xs = np.minimum((np.arange(32) * 64) // 32, 63)
    assert (got == big[ys][:, xs]).all()        # exact NN downsample
    assert out[2] == bytes(bytearray(encode_png(small_src)))  # passthrough
    kind, w, h, payload = _decode_payload(out[3])
    assert (kind, w, h) == ("image", 32, 26)
    # constant JPEG decodes exactly, so the resized PNG is exactly 128
    assert set(payload) == {128}


def test_audio_features_sine_and_silence(spark):
    """FFT features on decoded PCM: an on-bin sine reports its exact
    frequency; silence reports zeros; SGM1/non-audio rows are
    skipped."""
    import numpy as np

    from nvd2mysqlloader_spark.multimodal.binary import (audio_features,
                                                         pack_media)
    from nvd2mysqlloader_spark.multimodal.codecs import encode_wav

    n, rate, f = 4096, 16000, 500.0       # bin 128 exactly
    t = np.arange(n) / rate
    sine = (16384 * np.sin(2 * np.pi * f * t)).astype(np.int16)
    media = spark.createDataFrame(
        [(1, bytearray(encode_wav(sine, rate=rate))),
         (2, bytearray(encode_wav(np.zeros(100, dtype=np.int16)))),
         (3, bytearray(pack_media(1, 16, 1, b"\x00" * 64)))],
        "media_id long, content binary")
    rows = {r["media_id"]: r for r in audio_features(media).collect()}
    assert set(rows) == {1, 2}            # SGM1 audio skipped (not PCM)
    assert rows[1]["peak_freq_hz"] == 500.0
    assert abs(rows[1]["rms"] - 0.5 / np.sqrt(2)) < 1e-3
    assert abs(rows[1]["zero_crossing_rate"] - 2 * f / rate) < 1e-3
    assert rows[2]["rms"] == 0.0 and rows[2]["peak_freq_hz"] == 0.0


def test_audio_features_8bit_full_scale_parity(spark):
    """The same waveform encoded as 8-bit offset-binary and 16-bit
    signed PCM must report (near-)identical normalized features:
    uint8 divides by half-range 128 (not 255), so full scale maps to
    ~±1.0 under both encodings."""
    import io
    import wave

    import numpy as np

    from nvd2mysqlloader_spark.multimodal.binary import audio_features
    from nvd2mysqlloader_spark.multimodal.codecs import encode_wav

    n, rate, f = 2048, 8000, 1000.0
    period16 = np.array([16384] * 4 + [-16384] * 4, dtype=np.int16)
    sq16 = encode_wav(np.tile(period16, n // 8), rate=rate)
    # the same ±0.5-of-full-scale square in 8-bit offset binary:
    # 128 ± 64 (half-range 128 → amplitude 0.5, matching 16384/32768)
    period8 = np.array([192] * 4 + [64] * 4, dtype=np.uint8)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(rate)
        w.writeframes(np.tile(period8, n // 8).tobytes())
    sq8 = buf.getvalue()

    media = spark.createDataFrame(
        [(16, bytearray(sq16)), (8, bytearray(sq8))],
        "media_id long, content binary")
    rows = {r["media_id"]: r for r in audio_features(media).collect()}
    assert rows[16]["rms"] == 0.5
    assert rows[8]["rms"] == 0.5            # was ~0.251 under /255
    assert rows[8]["peak_freq_hz"] == rows[16]["peak_freq_hz"] == f
    assert rows[8]["zero_crossing_rate"] == \
        rows[16]["zero_crossing_rate"]


def test_jpeg_progressive_roundtrip_equals_baseline():
    """encode_jpeg_progressive shares _fdct_quant with the baseline
    encoder, so decoding the progressive encoding of an image must
    produce EXACTLY the same pixels as decoding its baseline encoding
    — a self-authored pin on the SOF2 scan assembly (interleaved DC
    scan + per-component AC band scans + coefficient accumulation)
    that is independent of the external goldens."""
    import numpy as np

    from nvd2mysqlloader_spark.multimodal.jpeg import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive)

    yy, xx = np.mgrid[0:33, 0:47]
    gray = ((yy * 7 + xx * 3) % 251).astype(np.uint8)
    assert (decode_jpeg(encode_jpeg_progressive(gray))
            == decode_jpeg(encode_jpeg(gray))).all()

    yy, xx = np.mgrid[0:24, 0:40]
    rgb = np.stack([(yy * 9 % 255).astype(np.uint8),
                    (xx * 5 % 255).astype(np.uint8),
                    ((yy + xx) * 3 % 255).astype(np.uint8)], axis=2)
    assert (decode_jpeg(encode_jpeg_progressive(rgb))
            == decode_jpeg(encode_jpeg(rgb))).all()

    # constant mid-gray quantizes to zero: progressive roundtrip EXACT
    flat = np.full((10, 12), 128, dtype=np.uint8)
    assert (decode_jpeg(encode_jpeg_progressive(flat)) == flat).all()

    # restart markers inside progressive scans: RSTn realignment +
    # DC-predictor reset + EOB-run discard per T.81 §G.1.2.2 — the
    # decode must be identical with and without them
    for ri in (3, 5):
        assert (decode_jpeg(encode_jpeg_progressive(
                    gray, restart_interval=ri))
                == decode_jpeg(encode_jpeg(gray))).all()
    assert (decode_jpeg(encode_jpeg_progressive(rgb,
                                                restart_interval=4))
            == decode_jpeg(encode_jpeg(rgb))).all()


def test_jpeg_progressive_sa_roundtrip_equals_baseline():
    """encode_jpeg_progressive_sa emits a FULL successive-approximation
    scan script (DC/AC first scans at Al>=1, then per-bit AC refinement
    + DC refinement scans) — the write-side twin of the decoder's
    refinement paths, which previously only external goldens exercised
    (VERDICT r11 ask #6). Refinement completes to Al=0 over the shared
    quantizer, so the decode must equal the baseline decode EXACTLY;
    al=2 additionally pins REPEATED refinement (two successive
    correction passes per coefficient)."""
    import numpy as np

    from nvd2mysqlloader_spark.multimodal.jpeg import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive_sa)

    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, (41, 53), dtype=np.uint8)
    rgb = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    # sparse impulses on flat gray force >15-long zero-history runs
    # inside refinement scans — the ZRL correction-bit path
    sparse = np.full((64, 64), 128, np.uint8)
    sparse[rng.integers(0, 64, 40), rng.integers(0, 64, 40)] = 255
    for img in (gray, rgb, sparse):
        base = decode_jpeg(encode_jpeg(img))
        for al in (1, 2):
            stats = {}
            blob = encode_jpeg_progressive_sa(img, al=al,
                                              _stats=stats)
            assert b"\xff\xc2" in blob                     # SOF2
            ncomp = 1 if img.ndim == 2 else 3
            # 1 DC-first + ncomp AC-first + al*(ncomp AC-refine
            # + 1 DC-refine) scans
            assert blob.count(b"\xff\xda") == \
                1 + ncomp + al * (ncomp + 1)
            assert (decode_jpeg(blob) == base).all()
            if img is sparse:
                # the flat background makes EOB runs actually SPAN
                # blocks in both scan kinds — the decoder's
                # cross-block eobrun paths are genuinely exercised
                assert stats["ac_first"] > 1
                assert stats["ac_refine"] > 1

    import pytest
    with pytest.raises(ValueError, match="spectral selection"):
        encode_jpeg_progressive_sa(gray, al=0)


def test_jpeg_progressive_sa_decoded_by_imageio(spark):
    """Conformance of the successive-approximation WRITER against an
    independent implementation: the JVM's javax.imageio decoder reads
    this repo's SA-encoded stream and must agree with this repo's own
    decode to within IDCT rounding (gray raster exact path ±1; 4:4:4
    color via getRGB ±2). Catches self-consistent-but-nonstandard
    encodings the roundtrip pin above cannot see."""
    import numpy as np

    from nvd2mysqlloader_spark.multimodal.jpeg import (
        decode_jpeg, encode_jpeg_progressive_sa)

    jvm = spark.sparkContext._jvm

    def jvm_decode(data, gray):
        im = jvm.javax.imageio.ImageIO.read(
            jvm.java.io.ByteArrayInputStream(data))
        w, h = im.getWidth(), im.getHeight()
        if gray:
            return np.array(
                im.getRaster().getSamples(0, 0, w, h, 0, None),
                dtype=np.int64).reshape(h, w)
        a = np.array(im.getRGB(0, 0, w, h, None, 0, w),
                     dtype=np.int64).reshape(h, w)
        return np.stack([(a >> 16) & 0xFF, (a >> 8) & 0xFF,
                         a & 0xFF], axis=2)

    yy, xx = np.mgrid[0:25, 0:42]
    gray_img = ((yy * 7 + xx * 3) % 251).astype(np.uint8)
    for al in (1, 2):
        blob = encode_jpeg_progressive_sa(gray_img, al=al)
        diff = np.abs(decode_jpeg(blob).astype(np.int64)
                      - jvm_decode(blob, True))
        assert int(diff.max()) <= 1, f"al={al}"

    rgb = np.stack([(yy * 9 % 255).astype(np.uint8),
                    (xx * 5 % 255).astype(np.uint8),
                    ((yy + xx) * 3 % 255).astype(np.uint8)], axis=2)
    blob = encode_jpeg_progressive_sa(rgb, al=1)
    diff = np.abs(decode_jpeg(blob).astype(np.int64)
                  - jvm_decode(blob, False))
    assert int(diff.max()) <= 2


def test_jpeg_progressive_420_differential_vs_imageio(spark):
    """4:2:0 progressive coverage (the one sampling shape no on-disk
    golden exercises): the JVM's ImageIO writer encodes a progressive
    (SOF2, 4:2:0, full successive-approximation scan script) JPEG of
    a deterministic image; this repo's decoder must agree with the
    JVM's own read-back to within IDCT rounding. Grayscale pins the
    entropy/coefficient path exactly (±1); the color image keeps its
    chroma smooth so nearest-vs-fancy chroma upsampling (a policy
    difference, not a defect) cannot dominate the comparison (±2)."""
    import numpy as np

    from nvd2mysqlloader_spark.multimodal.jpeg import decode_jpeg

    jvm = spark.sparkContext._jvm
    gw = spark.sparkContext._gateway

    def prog_encode(img_np):
        h, w = img_np.shape[:2]
        gray = img_np.ndim == 2
        img = jvm.java.awt.image.BufferedImage(w, h,
                                               10 if gray else 1)
        arr = gw.new_array(jvm.int, h * w)
        i = 0
        for y in range(h):
            for x in range(w):
                if gray:
                    v = int(img_np[y, x])
                    arr[i] = (v << 16) | (v << 8) | v
                else:
                    r, g, b = (int(c) for c in img_np[y, x])
                    arr[i] = (r << 16) | (g << 8) | b
                i += 1
        img.setRGB(0, 0, w, h, arr, 0, w)
        writer = jvm.javax.imageio.ImageIO \
            .getImageWritersByFormatName("jpeg").next()
        baos = jvm.java.io.ByteArrayOutputStream()
        ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
        writer.setOutput(ios)
        param = writer.getDefaultWriteParam()
        param.setProgressiveMode(
            jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
        writer.write(None,
                     jvm.javax.imageio.IIOImage(img, None, None),
                     param)
        ios.close()
        writer.dispose()
        return bytes(baos.toByteArray())

    def jvm_decode(data, gray):
        im = jvm.javax.imageio.ImageIO.read(
            jvm.java.io.ByteArrayInputStream(data))
        w, h = im.getWidth(), im.getHeight()
        if gray:
            return np.array(
                im.getRaster().getSamples(0, 0, w, h, 0, None),
                dtype=np.int64).reshape(h, w)
        a = np.array(im.getRGB(0, 0, w, h, None, 0, w),
                     dtype=np.int64).reshape(h, w)
        return np.stack([(a >> 16) & 0xFF, (a >> 8) & 0xFF,
                         a & 0xFF], axis=2)

    yy, xx = np.mgrid[0:24, 0:40]
    gray_img = ((yy * 5 + xx * 3) % 256).astype(np.uint8)
    blob = prog_encode(gray_img)
    assert b"\xff\xc2" in blob               # really progressive
    diff = np.abs(decode_jpeg(blob).astype(int)
                  - jvm_decode(blob, True))
    assert int(diff.max()) <= 1

    smooth = np.stack([(yy * 4).astype(np.uint8),
                       (yy * 4).astype(np.uint8),
                       (yy * 4 + xx // 8).astype(np.uint8)], axis=2)
    blob = prog_encode(smooth)
    assert b"\xff\xc2" in blob
    diff = np.abs(decode_jpeg(blob).astype(int)
                  - jvm_decode(blob, False))
    assert int(diff.max()) <= 2


def test_mjpeg_mp4_frames_decode_to_pixels():
    """VERDICT r11 ask #1: MJPEG samples are bare JPEG images, so
    decode_frame_pixels routes them through the repo's own decoder —
    per-frame pixels equal decode_jpeg applied to the extracted
    sample bytes, for every MJPEG fourcc variant; 'mjpb' (whose
    frames omit JPEG markers) and inter-frame codecs stay gated."""
    import numpy as np
    import pytest

    from nvd2mysqlloader_spark.multimodal.jpeg import (decode_jpeg,
                                                       encode_jpeg)
    from nvd2mysqlloader_spark.multimodal.mp4 import (
        decode_frame_pixels, decode_video_frames, encode_mp4,
        extract_samples)

    # non-constant frames: a gradient + a color image, so equality is
    # a real pixel-level check, not a constant-plane triviality
    grad = (np.arange(16 * 24, dtype=np.uint8).reshape(16, 24) % 251)
    rgb = np.zeros((16, 16, 3), dtype=np.uint8)
    rgb[..., 0], rgb[..., 1], rgb[..., 2] = 200, 100, 50
    frames = [bytes(encode_jpeg(grad)), bytes(encode_jpeg(rgb))]

    for fourcc in (b"jpeg", b"mjpg", b"mjpa"):
        blob = encode_mp4(frames, width=24, height=16, codec=fourcc)
        decoded = decode_video_frames(blob)
        direct = [decode_jpeg(s) for s in extract_samples(blob)]
        assert len(decoded) == 2
        for d, e in zip(decoded, direct):
            assert np.array_equal(d, e)
        assert decoded[0].shape == (16, 24)
        assert decoded[1].shape == (16, 16, 3)

    with pytest.raises(NotImplementedError, match="inter-frame"):
        decode_frame_pixels(frames[0], "mjpb")
    with pytest.raises(NotImplementedError, match="inter-frame"):
        decode_frame_pixels(frames[0], "hvc1")
    with pytest.raises(ValueError, match="no video track"):
        decode_video_frames(encode_mp4([b"pkt"], width=0, height=0,
                                       handler=b"soun"))


def test_mjpeg_mp4_through_feature_op(spark):
    """An MJPEG MP4 through decode_media_features measures the
    DECODED RASTER (n frames x w x h pixel bytes), like the still
    image branches — while a non-MJPEG video keeps raw sample bytes
    as its payload (decode stays gated)."""
    import numpy as np

    from nvd2mysqlloader_spark.multimodal.binary import \
        decode_media_features
    from nvd2mysqlloader_spark.multimodal.jpeg import encode_jpeg
    from nvd2mysqlloader_spark.multimodal.mp4 import encode_mp4

    frames = [bytes(encode_jpeg(np.full((8, 8), v, dtype=np.uint8)))
              for v in (112, 144)]
    mjpeg = encode_mp4(frames, width=8, height=8, codec=b"jpeg")
    raw = encode_mp4([b"\x01" * 10, b"\x03" * 10], width=8, height=8,
                     codec=b"avc1")
    media = spark.createDataFrame(
        [(1, bytearray(mjpeg)), (2, bytearray(raw))],
        "media_id long, content binary")
    rows = {r["media_id"]: r for r in
            decode_media_features(media).collect()}
    assert rows[1]["kind"] == "video"
    assert rows[1]["n_payload_bytes"] == 2 * 8 * 8   # decoded pixels
    assert rows[1]["mean_byte"] == 128.0             # (112+144)/2
    assert rows[2]["n_payload_bytes"] == 20          # raw samples


def test_mjpeg_payload_decodes_without_vide_handler():
    """Round-12 review finding: the MJPEG pixel-decode branch of
    _decode_payload must decode the track it SELECTED (which can be
    tracks[0] via the handler-preference fallback when no 'vide'
    handler exists), not re-select by handler — a handler/codec
    mismatch used to turn a decodable row into ValueError."""
    import numpy as np

    from nvd2mysqlloader_spark.multimodal.binary import _decode_payload
    from nvd2mysqlloader_spark.multimodal.jpeg import encode_jpeg
    from nvd2mysqlloader_spark.multimodal.mp4 import encode_mp4

    frames = [bytes(encode_jpeg(np.full((8, 8), v, dtype=np.uint8)))
              for v in (64, 128)]
    blob = encode_mp4(frames, width=8, height=8, codec=b"jpeg",
                      handler=b"meta")       # neither vide nor soun
    kind, w, h, payload = _decode_payload(bytes(blob))
    assert (kind, w, h) == ("video", 8, 8)
    # decoded rasters, not raw sample bytes: 2 frames x 64 px, and
    # constant mid/quarter-gray JPEG blocks roundtrip exactly
    assert len(payload) == 128
    assert payload == bytes([64] * 64 + [128] * 64)


def test_decode_video_frames_rejects_negative_track():
    import numpy as np
    import pytest

    from nvd2mysqlloader_spark.multimodal.jpeg import encode_jpeg
    from nvd2mysqlloader_spark.multimodal.mp4 import (decode_video_frames,
                                                      encode_mp4)

    blob = encode_mp4(
        [bytes(encode_jpeg(np.full((8, 8), 128, dtype=np.uint8)))],
        width=8, height=8, codec=b"jpeg")
    with pytest.raises(ValueError, match="tracks"):
        decode_video_frames(bytes(blob), track=-1)
