"""Pure-NumPy media codecs (operators/media_codecs.py): real BMP/PNM/WAV
decode with round-trip, padding, and dispatch coverage — this is the real
(non-stub) multimodal decode path."""

import numpy as np
import pytest

from mitie_spark.operators.media_codecs import (
    FEATURE_DIM,
    UnsupportedMediaError,
    audio_feature,
    builtin_decoder,
    decode_bmp,
    decode_pnm,
    decode_wav,
    encode_bmp,
    encode_pnm,
    encode_wav,
    image_feature,
    sniff_kind,
)


def test_bmp_roundtrip_exact():
    rng = np.random.default_rng(1)
    for w in (8, 5, 7, 64):  # widths exercising 4-byte row padding
        px = rng.integers(0, 256, size=(6, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_bmp_topdown_and_palette():
    # top-down: negative height in an otherwise identical header
    px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    b = bytearray(encode_bmp(px))
    import struct

    h = struct.unpack_from("<i", b, 22)[0]
    struct.pack_into("<i", b, 22, -h)
    # rows were written bottom-up; flagging top-down must flip them back
    assert np.array_equal(decode_bmp(bytes(b)), px[::-1])

    # 8-bit palette BMP built by hand: 2×2, palette of 4 gray levels
    pal = b"".join(bytes([v, v, v, 0]) for v in (0, 85, 170, 255))
    rows = bytes([0, 1, 0, 0]) + bytes([2, 3, 0, 0])  # padded to 4
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, 8, 0, 0, 4, 0)
    off = 14 + 40 + len(pal)
    hdr = struct.pack("<2sIHHI", b"BM", off + len(rows), 0, 0, off)
    img = decode_bmp(hdr + info + pal + rows)
    # bottom-up: file row 0 is image row 1
    assert img[1, 0, 0] == 0 and img[1, 1, 0] == 85
    assert img[0, 0, 0] == 170 and img[0, 1, 0] == 255


def test_bmp_rejects_compressed():
    import struct

    b = bytearray(encode_bmp(np.zeros((2, 2, 3), np.uint8)))
    struct.pack_into("<I", b, 30, 1)  # BI_RLE8 on a 24-bit frame: invalid
    with pytest.raises(UnsupportedMediaError):
        decode_bmp(bytes(b))


def _build_bmp(W, H, bpp, compression, data, pal=b"", colors_used=0):
    """Independent scalar BMP builder: masks (BI_BITFIELDS) or palette go
    right after the 40-byte info header, where the decoder reads them."""
    import struct

    info = struct.pack(
        "<IiiHHIIiiII", 40, W, H, 1, bpp, compression, len(data), 0, 0, colors_used, 0
    )
    off = 14 + 40 + len(pal)
    hdr = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    return hdr + info + pal + data


_GRAY16_PAL = b"".join(bytes([v * 17, v * 17, v * 17, 0]) for v in range(16))


def test_bmp_subbyte_palette():
    """1- and 4-bit palette BMPs: MSB-first packing, 4-byte row padding,
    bottom-up rows — validated against hand-packed scanlines."""
    # 4-bit: 3x3, indices laid out explicitly (two nibbles per byte)
    idx = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]], dtype=np.uint8)
    rows = b""
    for r in idx[::-1]:  # bottom-up
        packed = bytes([(r[0] << 4) | r[1], r[2] << 4])
        rows += packed + b"\x00" * (4 - len(packed))
    img = decode_bmp(_build_bmp(3, 3, 4, 0, rows, pal=_GRAY16_PAL))
    assert np.array_equal(img[..., 0], idx * 17)
    assert np.array_equal(img[..., 0], img[..., 1])

    # 1-bit: 2x10 checkerboard-ish, two palette entries
    bits = np.array([[1, 0, 1, 0, 1, 0, 1, 0, 1, 1],
                     [0, 1, 1, 1, 0, 0, 0, 1, 0, 1]], dtype=np.uint8)
    pal = bytes([10, 20, 30, 0]) + bytes([200, 210, 220, 0])
    rows = b""
    for r in bits[::-1]:
        b0 = int("".join(map(str, r[:8])), 2)
        b1 = int("".join(map(str, r[8:])), 2) << 6
        rows += bytes([b0, b1]) + b"\x00\x00"
    img = decode_bmp(_build_bmp(10, 2, 1, 0, rows, pal=pal))
    # palette entries are BGR: entry0 → RGB (30,20,10), entry1 → (220,210,200)
    want = np.where(bits[..., None] == 1, [220, 210, 200], [30, 20, 10])
    assert np.array_equal(img, want.astype(np.uint8))


def test_bmp_rle8():
    """BI_RLE8 stream: encoded runs, a literal (absolute) run with its
    16-bit padding, end-of-line, a cursor delta, end-of-bitmap."""
    pal = bytes(b for v in range(256) for b in (v, v, v, 0))
    stream = bytes(
        [3, 7]          # run: 3 pixels of index 7
        + [0, 4, 1, 2, 3, 4]  # literal run of 4 (even count: no pad byte)
        + [0, 0]        # end of line
        + [0, 2, 2, 1]  # delta: x += 2, y += 1
        + [2, 9]        # run: 2 pixels of index 9
        + [0, 1]        # end of bitmap
    )
    img = decode_bmp(_build_bmp(8, 4, 8, 1, stream, pal=pal, colors_used=256))
    want = np.zeros((4, 8), dtype=np.uint8)
    want[0, 0:3] = 7          # file row 0 (bottom-up → image row 3)
    want[0, 3:7] = [1, 2, 3, 4]
    want[2, 2:4] = 9          # after EOL (y=1) + delta (x=2, y=2)
    assert np.array_equal(img[..., 0], want[::-1])


def test_bmp_rle4():
    """BI_RLE4: encoded runs alternate the value's two nibbles; literal
    runs pack two pixels per byte, padded to a 16-bit boundary."""
    stream = bytes(
        [5, (12 << 4) | 3]   # run of 5: 12,3,12,3,12
        + [0, 3, (1 << 4) | 2, 3 << 4]  # literal of 3: 1,2,3 (2 bytes, word-aligned)
        + [0, 1]
    )
    img = decode_bmp(_build_bmp(8, 2, 4, 2, stream, pal=_GRAY16_PAL))
    want = np.zeros((2, 8), dtype=np.uint8)
    want[0, :5] = [12, 3, 12, 3, 12]
    want[0, 5:8] = [1, 2, 3]
    assert np.array_equal(img[..., 0], want[::-1] * 17)


def test_bmp_16bit_rgb555_and_565_bitfields():
    import struct

    # RGB555 (compression 0 default): pure-channel words
    words = [0x7C00, 0x03E0, 0x001F, 0x7FFF]  # R, G, B, white
    data = b"".join(struct.pack("<H", w) for w in words)  # one row, W=4, no pad
    img = decode_bmp(_build_bmp(4, 1, 16, 0, data))
    assert img.tolist() == [[[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 255]]]

    # RGB565 via BI_BITFIELDS: green has 6 bits
    masks = struct.pack("<III", 0xF800, 0x07E0, 0x001F)
    words = [0xF800, 0x07E0, 0x001F, 0x0400]  # R, G, B, mid-green (32/63)
    data = b"".join(struct.pack("<H", w) for w in words)
    img = decode_bmp(_build_bmp(4, 1, 16, 3, data, pal=masks))
    assert img.tolist()[0][:3] == [[255, 0, 0], [0, 255, 0], [0, 0, 255]]
    assert img[0, 3].tolist() == [0, 32 * 255 // 63, 0]


def test_bmp_32bit_bitfields_swapped_masks():
    import struct

    # RGBA byte order (masks name where each channel LIVES in the word)
    masks = struct.pack("<III", 0x000000FF, 0x0000FF00, 0x00FF0000)
    data = struct.pack("<I", 0x00C08040)  # word: B-field 0xC0, G 0x80, R 0x40
    img = decode_bmp(_build_bmp(1, 1, 32, 3, data, pal=masks))
    assert img[0, 0].tolist() == [0x40, 0x80, 0xC0]


def test_bmp_palette_bounds_and_truncation():
    # index past ColorsUsed must raise, not IndexError
    pal4 = b"".join(bytes([v, v, v, 0]) for v in range(4))
    rows = bytes([0, 200, 0, 0])  # index 200 >= 4 colors
    with pytest.raises(UnsupportedMediaError, match="palette index"):
        decode_bmp(_build_bmp(2, 1, 8, 0, rows, pal=pal4, colors_used=4))
    # palette shorter than ColorsUsed claims
    with pytest.raises(UnsupportedMediaError, match="palette"):
        decode_bmp(_build_bmp(2, 1, 8, 0, bytes(4), pal=b"\x00" * 8, colors_used=16))


def test_pnm_roundtrip_and_comments():
    rng = np.random.default_rng(2)
    gray = rng.integers(0, 256, size=(5, 9), dtype=np.uint8)
    assert np.array_equal(decode_pnm(encode_pnm(gray)), gray)
    rgb = rng.integers(0, 256, size=(3, 4, 3), dtype=np.uint8)
    assert np.array_equal(decode_pnm(encode_pnm(rgb)), rgb)
    # header comments per the spec
    with_comment = b"P5\n# a comment\n3 2\n255\n" + bytes(range(6))
    assert decode_pnm(with_comment).shape == (2, 3)


def test_pnm_16bit_big_endian():
    payload = b"P5\n2 1\n65535\n" + (1000).to_bytes(2, "big") + (
        65535
    ).to_bytes(2, "big")
    arr = decode_pnm(payload)
    assert arr.dtype == np.uint16 and arr[0, 0] == 1000 and arr[0, 1] == 65535


def test_wav_roundtrip_and_stereo_mean():
    t = np.arange(1600) / 16000.0
    x = 0.25 * np.sin(2 * np.pi * 440 * t)
    y, rate = decode_wav(encode_wav(x, rate=16000))
    assert rate == 16000
    assert np.max(np.abs(y - x)) < 1e-3  # 16-bit quantization only

    # hand-built stereo PCM: channels [0.5, -0.5] average to ~0
    import struct

    frames = b"".join(
        struct.pack("<hh", 16384, -16384) for _ in range(100)
    )
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    wav = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(frames))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(frames))
        + frames
    )
    mono, rate = decode_wav(wav)
    assert rate == 8000 and len(mono) == 100
    assert np.allclose(mono, 0.0, atol=1e-4)


def _wav_container(fmt_body: bytes, frames: bytes) -> bytes:
    import struct

    chunks = (
        b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + b"data" + struct.pack("<I", len(frames)) + frames
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_24bit_32bit_and_f64():
    """Independent scalar encodings of the wide PCM/float layouts: 24-bit
    little-endian signed (incl. full-scale negatives — the sign-extension
    path), 32-bit int, and float64."""
    import struct

    vals24 = [0, 1, -1, 8388607, -8388608, 4194304, -4194304]
    frames = b"".join(struct.pack("<i", v << 8)[1:] for v in vals24)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    y, rate = decode_wav(_wav_container(fmt, frames))
    assert rate == 8000
    np.testing.assert_allclose(y, np.array(vals24) / 8388608.0, atol=1e-9)

    vals32 = [0, 2147483647, -2147483648, 1 << 30]
    frames = b"".join(struct.pack("<i", v) for v in vals32)
    fmt = struct.pack("<HHIIHH", 1, 1, 44100, 44100 * 4, 4, 32)
    y, _ = decode_wav(_wav_container(fmt, frames))
    np.testing.assert_allclose(y, np.array(vals32) / 2147483648.0, rtol=1e-6)

    vals = np.array([0.0, 0.5, -0.25, 1.0, -1.0])
    fmt = struct.pack("<HHIIHH", 3, 1, 48000, 48000 * 8, 8, 64)
    y, _ = decode_wav(_wav_container(fmt, vals.astype("<f8").tobytes()))
    np.testing.assert_allclose(y, vals, atol=1e-7)


def test_wav_extensible_wrapper():
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE): the real code is the first two
    bytes of the SubFormat GUID at fmt offset 24; stereo 24-bit downmixes
    to mono by mean."""
    import struct

    # KSDATAFORMAT_SUBTYPE_PCM GUID: 00000001-0000-0010-8000-00aa00389b71
    guid = struct.pack("<H", 1) + bytes.fromhex("000000000010800000aa00389b71")
    fmt = (
        struct.pack("<HHIIHH", 0xFFFE, 2, 8000, 8000 * 6, 6, 24)
        + struct.pack("<HHI", 22, 24, 0x3)  # cbSize, valid bits, channel mask
        + guid
    )
    lr = [(4194304, -4194304), (8388607, 8388607), (0, -8388608)]
    frames = b"".join(
        struct.pack("<i", l << 8)[1:] + struct.pack("<i", r << 8)[1:] for l, r in lr
    )
    y, rate = decode_wav(_wav_container(fmt, frames))
    assert rate == 8000 and len(y) == 3
    want = np.array([(l + r) / 2.0 for l, r in lr]) / 8388608.0
    np.testing.assert_allclose(y, want, atol=1e-7)
    # truncated extensible fmt (no GUID) must fail fast, not misdecode
    with pytest.raises(UnsupportedMediaError, match="extensible"):
        decode_wav(_wav_container(struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 8000, 1, 8), b"\x80"))


def test_wav_skips_foreign_chunks():
    base = encode_wav(np.zeros(10), rate=8000)
    # splice a LIST chunk between WAVE and fmt
    import struct

    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = base[:12] + extra + base[12:]
    spliced = (
        spliced[:4]
        + struct.pack("<I", len(spliced) - 8)
        + spliced[8:]
    )
    y, rate = decode_wav(spliced)
    assert rate == 8000 and len(y) == 10


def test_sniff_kinds():
    assert sniff_kind(encode_bmp(np.zeros((2, 2, 3), np.uint8))) == "bmp"
    assert sniff_kind(encode_pnm(np.zeros((2, 2), np.uint8))) == "pnm"
    assert sniff_kind(encode_wav(np.zeros(4))) == "wav"
    assert sniff_kind(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8) == "png"
    assert sniff_kind(b"\xff\xd8\xff\xe0" + b"\x00" * 8) == "jpeg"
    assert sniff_kind(b"\x00\x00\x00\x18ftypisom" + b"\x00" * 8) == "mp4"
    assert sniff_kind(b"plain text here") is None


def test_image_feature_constant_image():
    # constant gray image pools to a constant vector regardless of size
    for shape in ((8, 8), (17, 23), (64, 64)):
        arr = np.full(shape + (3,), 128, dtype=np.uint8)
        f = image_feature(arr)
        assert f.shape == (FEATURE_DIM,)
        assert np.allclose(f, 128.0 / 255.0, atol=1e-6)


def test_image_feature_area_pool_is_exact_for_divisible():
    # 16×16 → 8×8: each cell is the mean of a 2×2 block
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, size=(16, 16)).astype(np.float64)
    f = image_feature(g)
    expect = g.reshape(8, 2, 8, 2).mean(axis=(1, 3)).reshape(64) / 255.0
    assert np.allclose(f, expect, atol=1e-9)


def test_audio_feature_energy_profile():
    # first half silent, second half loud → energy concentrated in the
    # trailing segments
    x = np.concatenate([np.zeros(3200), 0.5 * np.ones(3200)])
    f = audio_feature(x)
    assert f.shape == (FEATURE_DIM,)
    assert np.allclose(f[:32], 0.0)
    assert np.allclose(f[32:], 0.5, atol=1e-6)


def test_builtin_decoder_dispatch():
    assert builtin_decoder(
        encode_bmp(np.zeros((4, 4, 3), np.uint8))
    ).shape == (FEATURE_DIM,)
    assert builtin_decoder(encode_wav(np.zeros(100))).shape == (FEATURE_DIM,)
    with pytest.raises(UnsupportedMediaError):
        builtin_decoder(b"\x89PNG\r\n\x1a\n" + b"\x00" * 100)
    with pytest.raises(UnsupportedMediaError):
        builtin_decoder(b"")


def test_extract_features_real_decode_no_fake(spark):
    """The REAL decode path end-to-end: BMP/WAV payloads in the media table
    decode via the built-in codecs with deterministic_fake *off* — only the
    mp4 video blobs need the fallback, so filtering them out must succeed
    without any fake."""
    from pyspark.sql import functions as F

    from mitie_spark.operators.multimodal import (
        extract_features,
        synth_media_table,
    )

    media = synth_media_table(spark, n=30).filter(F.col("kind") != "video")
    rows = extract_features(media, deterministic_fake=False).collect()
    assert len(rows) == 20
    # decode is real: re-decode one payload locally and compare
    pay = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    by_id = {r["media_id"]: np.array(r["feature"], np.float32) for r in rows}
    for mid in list(by_id)[:4]:
        assert np.allclose(by_id[mid], builtin_decoder(pay[mid]), atol=1e-6)
    # image features are bounded pixel means; audio features are RMS ≤ 1
    for v in by_id.values():
        assert np.all(v >= 0.0) and np.all(v <= 1.0)


def test_malformed_payloads_degrade_to_unsupported():
    """Web-scale garbage: any parse failure must surface as
    UnsupportedMediaError (the only exception callers catch before the
    fallback path), never IndexError/struct.error/ValueError that would
    kill a Spark task."""
    import struct

    from mitie_spark.operators.media_codecs import (
        UnsupportedMediaError,
        builtin_decoder,
    )

    bad = [
        b"P5\n3 0\n255\n" + b"\x00" * 16,  # zero height -> empty pool
        b"P5\n0 3\n255\n" + b"\x00" * 16,  # zero width
        b"P5\n9 9\n255\n" + b"\x00" * 3,  # truncated pixel data
        b"P6\n70000 70000\n255\n",  # body far smaller than W*H*3
        # fmt chunk shorter than the 16-byte header it declares
        b"RIFF"
        + struct.pack("<I", 20)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", 4)
        + b"\x01\x00\x01\x00",
    ]
    for payload in bad:
        with pytest.raises(UnsupportedMediaError):
            builtin_decoder(payload)


def test_image_feature_scales_by_header_maxval_not_data_probe():
    from mitie_spark.operators.media_codecs import builtin_decoder

    rng = np.random.default_rng(7)
    scene8 = rng.integers(0, 200, size=(16, 16), dtype=np.uint8)
    p8 = encode_pnm(scene8)
    # the same scene as 16-bit (maxval 65535, samples * 257) must produce
    # the same features — including when every 16-bit sample stays <= 255
    # (the old max()>255 probe treated that image as 8-bit)
    scene16 = (scene8.astype(np.uint16) * 257).astype(">u2")
    p16 = b"P5\n16 16\n65535\n" + scene16.tobytes()
    f8, f16 = builtin_decoder(p8), builtin_decoder(p16)
    assert np.allclose(f8, f16, atol=1e-6)
    dark16 = (scene8.astype(np.uint16)).astype(">u2")  # all samples <= 255
    fdark = builtin_decoder(b"P5\n16 16\n65535\n" + dark16.tobytes())
    assert fdark.max() < f8.max() / 100  # near-black, not 8-bit-bright
    # non-65535 maxval scales by ITS header value
    scene10 = (scene8.astype(np.uint16) * (1023 // 255)).astype(">u2")
    f10 = builtin_decoder(b"P5\n16 16\n1023\n" + scene10.tobytes())
    assert np.allclose(f8, f10, rtol=0.01, atol=1e-4)


def test_decode_image_corrupt_payload_degrades_to_fake():
    from mitie_spark.operators.multimodal import decode_image, fake_decode

    def exploding_decoder(payload: bytes):
        raise OSError("cannot identify image file")  # PIL-style failure

    corrupt = b"\x89PNG\r\n\x1a\n" + b"\x00" * 8  # truncated PNG
    out = decode_image(
        corrupt, deterministic_fake=True, decoder=exploding_decoder
    )
    assert np.array_equal(out, fake_decode(corrupt))
    import pytest as _pytest

    with _pytest.raises(OSError):
        decode_image(corrupt, deterministic_fake=False, decoder=exploding_decoder)


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def _forward_filter_row(filt, cur, prev, bpp):
    """Independent scalar forward-filter (PNG spec §9) used to craft test
    payloads — the decoder must invert it exactly."""
    out = bytearray(len(cur))
    for i in range(len(cur)):
        a = cur[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if filt == 0:
            out[i] = cur[i]
        elif filt == 1:
            out[i] = (cur[i] - a) & 0xFF
        elif filt == 2:
            out[i] = (cur[i] - b) & 0xFF
        elif filt == 3:
            out[i] = (cur[i] - ((a + b) >> 1)) & 0xFF
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = (cur[i] - pred) & 0xFF
    return bytes(out)


def _build_png(pixels, color, bitd=8, filters=None, interlace=0, plte=None, width=None):
    """Hand-built PNG with a chosen filter per row (forward-filtered by the
    independent scalar implementation above). ``width`` is required for
    sub-byte depths (packed rows don't determine it)."""
    import struct as _s
    import zlib

    H = len(pixels)
    stride = len(pixels[0])
    bpp = max(1, {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color] * (bitd // 8))
    filters = filters or [0] * H
    prev = bytes(stride)
    raw = bytearray()
    for r in range(H):
        raw.append(filters[r])
        raw += _forward_filter_row(filters[r], pixels[r], prev, bpp)
        prev = pixels[r]
    W = stride // bpp if bitd == 8 else stride // bpp

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return _s.pack(">I", len(data)) + ctype + data + _s.pack(">I", crc)

    n_ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    W = width if width is not None else stride // (n_ch * (bitd // 8))
    out = b"\x89PNG\r\n\x1a\n"
    out += chunk(b"IHDR", _s.pack(">IIBBBBB", W, H, bitd, color, 0, 0, interlace))
    if plte is not None:
        out += chunk(b"PLTE", plte)
    out += chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += chunk(b"IEND", b"")
    return out


def test_png_roundtrip_gray_and_rgb():
    from mitie_spark.operators.media_codecs import decode_png, encode_png, sniff_kind

    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, (11, 7), dtype=np.uint8)
    p = encode_png(gray)
    assert sniff_kind(p) == "png"
    arr, maxval = decode_png(p)
    assert maxval == 255 and np.array_equal(arr, gray)

    rgb = rng.integers(0, 256, (5, 9, 3), dtype=np.uint8)
    arr, maxval = decode_png(encode_png(rgb))
    assert maxval == 255 and np.array_equal(arr, rgb)


def test_png_all_filter_types_invert_exactly():
    """Each spec filter (None/Sub/Up/Average/Paeth) forward-applied by an
    independent scalar implementation must decode back to the pixels."""
    from mitie_spark.operators.media_codecs import decode_png

    rng = np.random.default_rng(17)
    H, W = 10, 6
    img = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    rows = [img[r].tobytes() for r in range(H)]
    filters = [0, 1, 2, 3, 4, 4, 3, 2, 1, 0]
    p = _build_png(rows, color=2, filters=filters)
    arr, maxval = decode_png(p)
    assert np.array_equal(arr, img)


def test_png_16bit_palette_and_alpha():
    from mitie_spark.operators.media_codecs import decode_png

    rng = np.random.default_rng(5)
    # 16-bit grayscale, big-endian samples
    g16 = rng.integers(0, 65536, (4, 3), dtype=np.uint16)
    rows = [g16[r].astype(">u2").tobytes() for r in range(4)]
    arr, maxval = decode_png(_build_png(rows, color=0, bitd=16, filters=[0, 1, 2, 4]))
    assert maxval == 65535 and np.array_equal(arr, g16)

    # palette: indices gather through PLTE as RGB
    pal = np.arange(30, dtype=np.uint8)  # 10 entries
    idx = np.array([[0, 9, 3], [5, 5, 1]], dtype=np.uint8)
    rows = [idx[r].tobytes() for r in range(2)]
    arr, maxval = decode_png(
        _build_png(rows, color=3, filters=[0, 1], plte=pal.tobytes())
    )
    assert maxval == 255 and np.array_equal(arr, pal.reshape(10, 3)[idx])

    # RGBA drops alpha; gray+alpha keeps luma channel
    rgba = rng.integers(0, 256, (3, 4, 4), dtype=np.uint8)
    rows = [rgba[r].tobytes() for r in range(3)]
    arr, _ = decode_png(_build_png(rows, color=6, filters=[4, 3, 1]))
    assert np.array_equal(arr, rgba[..., :3])
    ga = rng.integers(0, 256, (3, 4, 2), dtype=np.uint8)
    rows = [ga[r].tobytes() for r in range(3)]
    arr, _ = decode_png(_build_png(rows, color=4, filters=[2, 4, 3]))
    assert np.array_equal(arr, ga[..., 0])


def test_png_rejects_bad_streams_and_garbage():
    import pytest as _pytest

    from mitie_spark.operators.media_codecs import (
        UnsupportedMediaError,
        decode_png,
        encode_png,
    )

    img = np.zeros((2, 2), dtype=np.uint8)
    rows = [img[r].tobytes() for r in range(2)]
    # IHDR claims Adam7 but the IDAT carries a non-interlaced layout: the
    # per-pass byte accounting must reject it, not mis-decode
    with _pytest.raises(UnsupportedMediaError):
        decode_png(_build_png(rows, color=0, interlace=1))
    # unknown interlace method
    with _pytest.raises(UnsupportedMediaError):
        decode_png(_build_png(rows, color=0, interlace=2))
    with _pytest.raises(UnsupportedMediaError):
        decode_png(b"\x89PNG\r\n\x1a\n" + b"junkjunkjunk")
    # corrupt the deflate stream: must degrade, not crash
    good = bytearray(encode_png(img))
    good[-20] ^= 0xFF
    with _pytest.raises(UnsupportedMediaError):
        decode_png(bytes(good))


_ADAM7_TEST = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _build_png_adam7(img_bytes, color, bitd=8, plte=None, filt_cycle=(0, 1, 2, 3, 4)):
    """Independent scalar Adam7 interlacer: split the (H, W, bpp)-byte image
    into the 7 spec passes, forward-filter each pass as its own little image
    (prev row resets per pass), concatenate, deflate."""
    import struct as _s
    import zlib

    H, W, bpp = img_bytes.shape
    n_ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    assert bpp == n_ch * (bitd // 8)
    raw = bytearray()
    fi = 0
    for x0, y0, xs, ys in _ADAM7_TEST:
        sub = img_bytes[y0::ys, x0::xs]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        prev = bytes(pw * bpp)
        for r in range(ph):
            f = filt_cycle[fi % len(filt_cycle)]
            fi += 1
            cur = sub[r].tobytes()
            raw.append(f)
            raw += _forward_filter_row(f, cur, prev, bpp)
            prev = cur

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return _s.pack(">I", len(data)) + ctype + data + _s.pack(">I", crc)

    out = b"\x89PNG\r\n\x1a\n"
    out += chunk(b"IHDR", _s.pack(">IIBBBBB", W, H, bitd, color, 0, 0, 1))
    if plte is not None:
        out += chunk(b"PLTE", plte)
    out += chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += chunk(b"IEND", b"")
    return out


def test_png_adam7_passes_tile_the_plane():
    """Spec sanity on the test's own geometry table: the 7 passes must cover
    every pixel of a 16x16 tile exactly once (so the golden below can't pass
    with a consistently-wrong table that leaves holes)."""
    cover = np.zeros((16, 16), dtype=np.int32)
    for x0, y0, xs, ys in _ADAM7_TEST:
        cover[y0::ys, x0::xs] += 1
    assert (cover == 1).all()


def test_png_adam7_gray_rgb_all_filters():
    """Adam7 golden: an independent scalar interlacer (per-pass forward
    filtering, all 5 filter types cycled) must decode back to the pixels."""
    from mitie_spark.operators.media_codecs import decode_png

    rng = np.random.default_rng(29)
    # dims chosen to exercise every pass non-degenerately (>=8 both ways)
    # plus ragged tails
    for H, W in [(13, 11), (8, 8), (9, 16)]:
        gray = rng.integers(0, 256, (H, W), dtype=np.uint8)
        arr, maxval = decode_png(_build_png_adam7(gray[..., None], color=0))
        assert maxval == 255 and np.array_equal(arr, gray)
        rgb = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
        arr, maxval = decode_png(_build_png_adam7(rgb, color=2))
        assert maxval == 255 and np.array_equal(arr, rgb)


def test_png_adam7_small_dims_empty_passes():
    """Images smaller than the 8x8 Adam7 tile leave some passes empty; the
    byte accounting and scatter must still reconstruct exactly."""
    from mitie_spark.operators.media_codecs import decode_png

    rng = np.random.default_rng(31)
    for H, W in [(1, 1), (1, 7), (5, 1), (3, 5), (7, 7), (2, 9)]:
        img = rng.integers(0, 256, (H, W), dtype=np.uint8)
        arr, _ = decode_png(_build_png_adam7(img[..., None], color=0))
        assert np.array_equal(arr, img), (H, W)


# --------------------------------------------------------------------------
# sub-byte depths (1/2/4-bit gray + palette; spec §7.2 MSB-first packing)
# --------------------------------------------------------------------------


def _pack_row(vals, bitd):
    """Independent scalar packer: sample values → MSB-first packed bytes
    (PNG spec §7.2), zero-padded to the byte boundary."""
    acc, nbits, out = 0, 0, bytearray()
    for v in vals:
        acc = (acc << bitd) | int(v)
        nbits += bitd
        if nbits == 8:
            out.append(acc)
            acc, nbits = 0, 0
    if nbits:
        out.append(acc << (8 - nbits))
    return bytes(out)


def test_png_subbyte_gray_all_filters():
    """1/2/4-bit gray: scalar-packed scanlines through every filter type
    must decode to the sample values with maxval (1<<depth)-1. Filters
    act on the PACKED bytes with a one-byte lag (spec §9)."""
    from mitie_spark.operators.media_codecs import decode_png

    rng = np.random.default_rng(37)
    for bitd in (1, 2, 4):
        for H, W in [(10, 6), (7, 13), (3, 1)]:
            img = rng.integers(0, 1 << bitd, (H, W), dtype=np.uint8)
            rows = [_pack_row(img[r], bitd) for r in range(H)]
            filters = [(r * 3) % 5 for r in range(H)]
            arr, maxval = decode_png(
                _build_png(rows, color=0, bitd=bitd, filters=filters, width=W)
            )
            assert maxval == (1 << bitd) - 1, bitd
            assert np.array_equal(arr, img), (bitd, H, W)


def test_png_subbyte_padding_bits_ignored():
    """W not a multiple of samples-per-byte leaves padding bits in the last
    byte of each scanline; hostile nonzero padding must not leak into
    pixels (the spec only requires encoders to zero it)."""
    from mitie_spark.operators.media_codecs import decode_png

    img = np.array([[1, 0, 1], [0, 1, 1]], dtype=np.uint8)
    rows = []
    for r in img:
        b = bytearray(_pack_row(r, 1))
        b[-1] |= 0x1F  # set all 5 padding bits
        rows.append(bytes(b))
    arr, maxval = decode_png(_build_png(rows, color=0, bitd=1, width=3))
    assert maxval == 1 and np.array_equal(arr, img)


def test_png_subbyte_palette():
    from mitie_spark.operators.media_codecs import decode_png

    rng = np.random.default_rng(41)
    plte_arr = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    for bitd in (1, 2, 4):
        n = 1 << bitd
        img = rng.integers(0, n, (9, 11), dtype=np.uint8)
        rows = [_pack_row(img[r], bitd) for r in range(9)]
        arr, maxval = decode_png(
            _build_png(
                rows, color=3, bitd=bitd, width=11, plte=plte_arr[:n].tobytes()
            )
        )
        assert maxval == 255
        assert np.array_equal(arr, plte_arr[:n][img]), bitd


def test_png_subbyte_adam7():
    """Sub-byte Adam7: each pass packs its own scanlines to a byte
    boundary and filters independently; the strided scatter must
    reconstruct exactly."""
    import struct as _s
    import zlib

    from mitie_spark.operators.media_codecs import decode_png

    rng = np.random.default_rng(43)
    for bitd in (1, 2, 4):
        for H, W in [(13, 11), (3, 5), (1, 9), (16, 16)]:
            img = rng.integers(0, 1 << bitd, (H, W), dtype=np.uint8)
            raw = bytearray()
            for x0, y0, xs, ys in _ADAM7_TEST:
                sub = img[y0::ys, x0::xs]
                ph, pw = sub.shape
                if ph == 0 or pw == 0:
                    continue
                prev = bytes((pw * bitd + 7) // 8)
                for r in range(ph):
                    cur = _pack_row(sub[r], bitd)
                    f = r % 5
                    raw.append(f)
                    raw += _forward_filter_row(f, cur, prev, 1)
                    prev = cur

            def chunk(ctype, data):
                crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
                return _s.pack(">I", len(data)) + ctype + data + _s.pack(">I", crc)

            p = b"\x89PNG\r\n\x1a\n"
            p += chunk(b"IHDR", _s.pack(">IIBBBBB", W, H, bitd, 0, 0, 0, 1))
            p += chunk(b"IDAT", zlib.compress(bytes(raw)))
            p += chunk(b"IEND", b"")
            arr, maxval = decode_png(p)
            assert maxval == (1 << bitd) - 1
            assert np.array_equal(arr, img), (bitd, H, W)


def test_png_subbyte_feature_scale_matches_8bit():
    """builtin_decoder scales by the header maxval: a 4-bit image and its
    exact 8-bit equivalent (v*17) must produce the same feature."""
    from mitie_spark.operators.media_codecs import builtin_decoder, encode_png

    rng = np.random.default_rng(47)
    img4 = rng.integers(0, 16, (24, 24), dtype=np.uint8)
    rows = [_pack_row(img4[r], 4) for r in range(24)]
    f4 = builtin_decoder(_build_png(rows, color=0, bitd=4, width=24))
    f8 = builtin_decoder(encode_png((img4 * 17).astype(np.uint8)))
    np.testing.assert_allclose(f4, f8, atol=1e-6)


def test_png_subbyte_rejects_invalid_depth_combos():
    """Spec §11.2.2: sub-byte depths are gray/palette only; 16-bit palette
    is invalid too."""
    from mitie_spark.operators.media_codecs import UnsupportedMediaError, decode_png

    rng = np.random.default_rng(53)
    img = rng.integers(0, 256, (4, 2, 3), dtype=np.uint8)
    rows = [img[r].tobytes() for r in range(4)]
    for color, bitd in [(2, 4), (4, 2), (6, 1)]:
        with pytest.raises(UnsupportedMediaError, match="bit depth"):
            decode_png(_build_png(rows, color=color, bitd=bitd, width=2))


def test_png_adam7_16bit_and_palette_and_alpha():
    from mitie_spark.operators.media_codecs import decode_png

    rng = np.random.default_rng(37)
    g16 = rng.integers(0, 65536, (9, 10), dtype=np.uint16)
    b16 = np.ascontiguousarray(g16.astype(">u2")).view(np.uint8).reshape(9, 10, 2)
    arr, maxval = decode_png(_build_png_adam7(b16, color=0, bitd=16))
    assert maxval == 65535 and np.array_equal(arr, g16)

    pal = np.arange(48, dtype=np.uint8)  # 16 entries
    idx = rng.integers(0, 16, (11, 9), dtype=np.uint8)
    arr, maxval = decode_png(
        _build_png_adam7(idx[..., None], color=3, plte=pal.tobytes())
    )
    assert maxval == 255 and np.array_equal(arr, pal.reshape(16, 3)[idx])

    rgba = rng.integers(0, 256, (10, 13, 4), dtype=np.uint8)
    arr, _ = decode_png(_build_png_adam7(rgba, color=6))
    assert np.array_equal(arr, rgba[..., :3])


def test_png_bomb_and_dimension_guards():
    """Hostile payloads (web corpus!) must route to UnsupportedMediaError,
    not allocate unbounded memory inside the Arrow UDF."""
    import struct as _s
    import zlib

    import pytest as _pytest

    from mitie_spark.operators.media_codecs import (
        UnsupportedMediaError,
        decode_png,
    )

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return _s.pack(">I", len(data)) + ctype + data + _s.pack(">I", crc)

    # (a) absurd declared dimensions: 1e9 x 1e9 grayscale, tiny IDAT —
    # must be rejected on the W*H cap before any inflate/allocation
    huge = b"\x89PNG\r\n\x1a\n"
    huge += chunk(b"IHDR", _s.pack(">IIBBBBB", 10**9, 10**9, 8, 0, 0, 0, 0))
    huge += chunk(b"IDAT", zlib.compress(b"\x00" * 8))
    huge += chunk(b"IEND", b"")
    with _pytest.raises(UnsupportedMediaError, match="pixel cap"):
        decode_png(huge)

    # (b) decompression bomb: declares 2x2 but the IDAT inflates to 32 MB
    # of zeros (compresses to ~32 KB) — must stop at the expected byte
    # count and reject, never materialize the full 32 MB
    bomb = b"\x89PNG\r\n\x1a\n"
    bomb += chunk(b"IHDR", _s.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
    bomb += chunk(b"IDAT", zlib.compress(b"\x00" * (32 * 1024 * 1024)))
    bomb += chunk(b"IEND", b"")
    with _pytest.raises(UnsupportedMediaError, match="inflates past"):
        decode_png(bomb)

    # (c) underfull IDAT: inflates to fewer bytes than H*(1+stride)
    short = b"\x89PNG\r\n\x1a\n"
    short += chunk(b"IHDR", _s.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
    short += chunk(b"IDAT", zlib.compress(b"\x00" * 7))
    short += chunk(b"IEND", b"")
    with _pytest.raises(UnsupportedMediaError, match="inflated to"):
        decode_png(short)


def test_png_feeds_builtin_decoder():
    from mitie_spark.operators.media_codecs import (
        FEATURE_DIM,
        builtin_decoder,
        encode_png,
        image_feature,
    )

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    feat = builtin_decoder(encode_png(rgb))
    assert feat.shape == (FEATURE_DIM,)
    assert np.array_equal(feat, image_feature(rgb))
