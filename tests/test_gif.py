"""GIF decoder tests (operators/gif.py), mirroring the JPEG suite's
strategy: an INDEPENDENT scalar encoder lives here in the tests (classic
hash-dict LZW — structurally unrelated to the decoder's table-of-bytes
loop), plus a hand-derived byte-level golden, compositing references
computed straight from NumPy, and hostile-input contracts.

No Spark session needed — the decoder is pure NumPy/stdlib.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mitie_spark.operators.gif import (
    decode_gif,
    decode_gif_frames,
)
from mitie_spark.operators.media_codecs import (
    UnsupportedMediaError,
    builtin_decoder,
    encode_bmp,
    image_feature,
    sniff_kind,
)

# ---------------------------------------------------------------------------
# independent encoder (tests-only)
# ---------------------------------------------------------------------------


class _BitPacker:
    """LSB-first variable-width code packer (GIF bit order)."""

    def __init__(self):
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def put(self, code: int, width: int):
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def lzw_encode(indices, mcs: int, deferred_clear: bool = False) -> bytes:
    """Textbook GIF LZW encoder: dict keyed by byte strings, width grows
    when next_code passes 2**width, table-full policy is either an
    explicit clear code (default) or the deferred-clear freeze."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    bp = _BitPacker()

    def fresh():
        return {bytes([i]): i for i in range(clear)}, eoi + 1, mcs + 1

    codes, next_code, width = fresh()
    bp.put(clear, width)
    w = b""
    for k in bytes(indices):
        wk = w + bytes([k])
        if wk in codes:
            w = wk
            continue
        bp.put(codes[w], width)
        if next_code < 4096:
            codes[wk] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        elif not deferred_clear:
            bp.put(clear, width)
            codes, next_code, width = fresh()
        w = bytes([k])
    if w:
        bp.put(codes[w], width)
    bp.put(eoi, width)
    return bp.flush()


def _subblocked(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _color_table_bits(n_colors: int) -> int:
    bits = 1
    while (2 << bits - 1) < n_colors:
        bits += 1
    return bits  # table size written as 2 << (bits-1)


def encode_gif(
    frames,
    palette: np.ndarray,
    screen=None,
    interlace: bool = False,
    deferred_clear: bool = False,
    bg_index: int = 0,
    version: bytes = b"GIF89a",
) -> bytes:
    """Independent GIF writer. ``frames`` is a list of dicts:
    {"idx": (h,w) uint8 index array, "left": int, "top": int,
     "delay_ms": int, "disposal": int, "transparent": int|None,
     "palette": local palette or None}.
    A bare ndarray is shorthand for one full-screen opaque frame."""
    if isinstance(frames, np.ndarray):
        frames = [{"idx": frames}]
    H, W = screen or frames[0]["idx"].shape
    pal = np.asarray(palette, dtype=np.uint8)
    bits = _color_table_bits(len(pal))
    n_slots = 2 << (bits - 1)
    pal_bytes = np.zeros((n_slots, 3), dtype=np.uint8)
    pal_bytes[: len(pal)] = pal
    out = bytearray(version)
    out += struct.pack("<HH", W, H)
    out += bytes([0x80 | (bits - 1), bg_index, 0])
    out += pal_bytes.tobytes()
    for fr in frames:
        idx = np.asarray(fr["idx"], dtype=np.uint8)
        h, w = idx.shape
        left, top = fr.get("left", 0), fr.get("top", 0)
        transparent = fr.get("transparent")
        if transparent is not None or fr.get("delay_ms") or fr.get("disposal"):
            packed = (fr.get("disposal", 0) & 7) << 2
            if transparent is not None:
                packed |= 1
            out += bytes([0x21, 0xF9, 4, packed])
            out += struct.pack("<H", fr.get("delay_ms", 0) // 10)
            out += bytes([transparent or 0, 0])
        lpal = fr.get("palette")
        ipacked = 0x40 if interlace else 0
        if lpal is not None:
            lbits = _color_table_bits(len(lpal))
            ipacked |= 0x80 | (lbits - 1)
        out += bytes([0x2C]) + struct.pack("<HHHH", left, top, w, h)
        out += bytes([ipacked])
        if lpal is not None:
            lslots = 2 << (lbits - 1)
            lb = np.zeros((lslots, 3), dtype=np.uint8)
            lb[: len(lpal)] = np.asarray(lpal, dtype=np.uint8)
            out += lb.tobytes()
        rows = idx
        if interlace:
            order = [
                y
                for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
                for y in range(start, h, step)
            ]
            rows = idx[np.asarray(order)]
        n_colors = len(lpal) if lpal is not None else len(pal)
        mcs = max(2, _color_table_bits(n_colors))
        out += bytes([mcs])
        out += _subblocked(
            lzw_encode(rows.reshape(-1), mcs, deferred_clear=deferred_clear)
        )
    out += b"\x3b"
    return bytes(out)


def _gray_palette():
    g = np.arange(256, dtype=np.uint8)
    return np.stack([g, g, g], axis=1)


# ---------------------------------------------------------------------------
# hand-derived byte-level golden (LZW codes computed by hand in the
# docstring of this test — independent of BOTH the encoder above and the
# decoder under test)
# ---------------------------------------------------------------------------


def test_handmade_golden_2x2():
    """2x2 checkerboard, 2-color palette, mcs=2: pixels [0,1,1,0] encode
    as codes (clear=4,w3)(0,w3)(1,w3)(1,w3)(0,w4)(eoi=5,w4) — the 4th
    code's emission grows the width to 4 because next_code hits 9 —
    packing LSB-first to bytes 0x44 0x02 0x05."""
    payload = (
        b"GIF89a"
        + struct.pack("<HH", 2, 2)
        + bytes([0x80, 0, 0])
        + bytes([0, 0, 0, 255, 255, 255])
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2) + b"\x00"
        + b"\x02" + bytes([3, 0x44, 0x02, 0x05, 0])
        + b"\x3b"
    )
    arr = decode_gif(payload)
    expect = np.array(
        [[[0, 0, 0], [255, 255, 255]], [[255, 255, 255], [0, 0, 0]]],
        dtype=np.uint8,
    )
    np.testing.assert_array_equal(arr, expect)


# ---------------------------------------------------------------------------
# round-trips vs the independent encoder
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n_colors", [2, 4, 16, 256])
@pytest.mark.parametrize("shape", [(1, 1), (3, 5), (16, 16), (37, 61)])
def test_roundtrip_noise(n_colors, shape):
    rng = np.random.default_rng(n_colors * 1000 + shape[0])
    idx = rng.integers(0, n_colors, size=shape).astype(np.uint8)
    pal = rng.integers(0, 256, size=(n_colors, 3)).astype(np.uint8)
    arr = decode_gif(encode_gif(idx, pal))
    np.testing.assert_array_equal(arr, pal[idx])


def test_roundtrip_big_image_multiple_width_growths():
    """4096-entry table overflow forces the encoder's clear-code path and
    the decoder's width growth all the way to 12 bits."""
    rng = np.random.default_rng(7)
    idx = rng.integers(0, 256, size=(120, 200)).astype(np.uint8)
    pal = _gray_palette()
    arr = decode_gif(encode_gif(idx, pal))
    np.testing.assert_array_equal(arr, pal[idx])


def test_roundtrip_deferred_clear():
    """Encoder freezes the table at 4096 instead of clearing — legal
    stream shape many real encoders emit; decoder must not grow past
    12 bits nor reject frozen-table codes."""
    rng = np.random.default_rng(11)
    idx = rng.integers(0, 256, size=(120, 200)).astype(np.uint8)
    pal = _gray_palette()
    arr = decode_gif(encode_gif(idx, pal, deferred_clear=True))
    np.testing.assert_array_equal(arr, pal[idx])


def test_roundtrip_kwkwk_runs():
    """Long single-color runs hit the KwKwK case (code == next slot)."""
    idx = np.zeros((8, 32), dtype=np.uint8)
    idx[4:, :] = 3
    pal = np.array(
        [[9, 9, 9], [1, 2, 3], [4, 5, 6], [200, 100, 50]], dtype=np.uint8
    )
    arr = decode_gif(encode_gif(idx, pal))
    np.testing.assert_array_equal(arr, pal[idx])


def test_roundtrip_interlaced():
    rng = np.random.default_rng(13)
    for h in (1, 2, 5, 8, 9, 33):  # exercise every pass-emptiness shape
        idx = rng.integers(0, 16, size=(h, 10)).astype(np.uint8)
        pal = rng.integers(0, 256, size=(16, 3)).astype(np.uint8)
        arr = decode_gif(encode_gif(idx, pal, interlace=True))
        np.testing.assert_array_equal(arr, pal[idx])


def test_gif87a_header_accepted():
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    arr = decode_gif(encode_gif(idx, pal, version=b"GIF87a"))
    np.testing.assert_array_equal(arr, pal[idx])


def test_local_palette_overrides_global():
    idx = np.full((4, 4), 1, dtype=np.uint8)
    gpal = np.array([[0, 0, 0], [10, 10, 10]], dtype=np.uint8)
    lpal = np.array([[0, 0, 0], [200, 30, 40]], dtype=np.uint8)
    payload = encode_gif([{"idx": idx, "palette": lpal}], gpal)
    np.testing.assert_array_equal(decode_gif(payload), lpal[idx])


# ---------------------------------------------------------------------------
# compositing: transparency, offsets, disposal
# ---------------------------------------------------------------------------


def test_transparency_composites_over_background():
    pal = np.array(
        [[7, 8, 9], [255, 0, 0], [0, 255, 0]], dtype=np.uint8
    )
    idx = np.array([[1, 0], [0, 2]], dtype=np.uint8)  # 0 = transparent
    payload = encode_gif(
        [{"idx": idx, "transparent": 0}], pal, bg_index=0
    )
    arr = decode_gif(payload)
    expect = np.empty((2, 2, 3), np.uint8)
    expect[:] = pal[0]  # canvas pre-filled with background color
    expect[0, 0] = pal[1]
    expect[1, 1] = pal[2]
    np.testing.assert_array_equal(arr, expect)


def test_animation_offsets_and_disposals():
    """3-frame animation: frame rects at offsets, disposal 1 (keep),
    2 (restore background), 3 (restore previous); reference canvas
    computed directly here with NumPy."""
    pal = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )
    f1 = {"idx": np.full((4, 4), 1, np.uint8), "disposal": 1, "delay_ms": 40}
    f2 = {
        "idx": np.full((2, 2), 2, np.uint8),
        "left": 1,
        "top": 1,
        "disposal": 2,
        "delay_ms": 50,
    }
    f3 = {
        "idx": np.full((2, 2), 3, np.uint8),
        "left": 2,
        "top": 0,
        "disposal": 3,
    }
    payload = encode_gif([f1, f2, f3], pal, screen=(4, 4), bg_index=0)
    frames = decode_gif_frames(payload)
    assert [d for d, _ in frames] == [40, 50, 0]
    c1 = np.empty((4, 4, 3), np.uint8)
    c1[:] = pal[1]
    np.testing.assert_array_equal(frames[0][1], c1)
    c2 = c1.copy()
    c2[1:3, 1:3] = pal[2]
    np.testing.assert_array_equal(frames[1][1], c2)
    c3 = c1.copy()  # disposal 2 restored f2's rect to background...
    c3[1:3, 1:3] = pal[0]
    c3[0:2, 2:4] = pal[3]  # ...then f3 drew at (2,0)
    np.testing.assert_array_equal(frames[2][1], c3)
    # max_frames early-stop returns the identical prefix
    np.testing.assert_array_equal(
        decode_gif_frames(payload, max_frames=2)[1][1], c2
    )


# ---------------------------------------------------------------------------
# hostile inputs: every failure is UnsupportedMediaError
# ---------------------------------------------------------------------------


def _valid_payload():
    idx = np.arange(16, dtype=np.uint8).reshape(4, 4)
    return encode_gif(idx, _gray_palette()[:16])


@pytest.mark.parametrize(
    "mutate",
    [
        lambda p: p[:5],  # short header
        lambda p: b"JIF89a" + p[6:],  # bad magic
        lambda p: p[:-1],  # missing trailer
        lambda p: p[: len(p) // 2],  # truncated mid-stream
        lambda p: p[:6] + struct.pack("<HH", 0, 4) + p[10:],  # zero width
        lambda p: p[:6] + struct.pack("<HH", 65535, 65535) + p[10:],  # bomb
    ],
)
def test_hostile_payloads(mutate):
    # full-parse API: decode_gif's max_frames=1 fast path deliberately
    # tolerates a truncated tail AFTER a complete first frame (browser
    # behavior), so the trailer check only fires on the full parse
    with pytest.raises(UnsupportedMediaError):
        decode_gif_frames(mutate(_valid_payload()))


def test_hostile_unknown_block():
    p = bytearray(_valid_payload())
    pos = 13 + 3 * 16  # first block byte (after header + 16-entry GCT)
    assert p[pos] == 0x2C
    p[pos] = 0x7E
    with pytest.raises(UnsupportedMediaError, match="unknown GIF block"):
        decode_gif(bytes(p))


def test_hostile_palette_index_out_of_range():
    # pixels index slot 3 but the declared color table has only 2
    # entries: shrink a valid 4-color payload's GCT in place (bits
    # field 0 → 2 slots, drop the last 6 palette bytes)
    idx = np.full((2, 2), 3, dtype=np.uint8)
    b = bytearray(encode_gif(idx, _gray_palette()[:4]))
    b[10] = 0x80 | 0x00
    del b[13 + 6 : 13 + 12]
    with pytest.raises(UnsupportedMediaError, match="palette index"):
        decode_gif(bytes(b))


def test_hostile_frame_rect_outside_screen():
    idx = np.zeros((2, 2), dtype=np.uint8)
    payload = encode_gif(
        [{"idx": idx, "left": 3, "top": 0}], _gray_palette()[:2], screen=(2, 2)
    )
    with pytest.raises(UnsupportedMediaError, match="outside"):
        decode_gif(payload)


def test_hostile_bad_lzw_min_code_size():
    p = bytearray(_valid_payload())
    pos = 13 + 3 * 16 + 10  # image descriptor (1+9 bytes) → mcs byte
    assert p[pos] == 4  # 16-color palette → mcs 4
    p[pos] = 12
    with pytest.raises(UnsupportedMediaError, match="minimum code size"):
        decode_gif(bytes(p))


def test_hostile_lzw_code_out_of_range():
    # first code after clear must be a literal; craft clear,clear,eoi-1?
    # simplest: stream whose first code IS eoi+1 (undefined slot)
    mcs = 2
    bp = _BitPacker()
    bp.put(4, 3)  # clear
    bp.put(7, 3)  # undefined table slot right after clear
    data = bp.flush()
    payload = (
        b"GIF89a"
        + struct.pack("<HH", 2, 2)
        + bytes([0x80, 0, 0])
        + bytes([0, 0, 0, 255, 255, 255])
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2) + b"\x00"
        + bytes([mcs]) + _subblocked(data)
        + b"\x3b"
    )
    with pytest.raises(UnsupportedMediaError, match="start code"):
        decode_gif(payload)


def test_hostile_truncated_lzw_stream():
    # EOI omitted AND raster short: 1 literal pixel for a 2x2 frame
    bp = _BitPacker()
    bp.put(4, 3)
    bp.put(0, 3)
    payload = (
        b"GIF89a"
        + struct.pack("<HH", 2, 2)
        + bytes([0x80, 0, 0])
        + bytes([0, 0, 0, 255, 255, 255])
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2) + b"\x00"
        + b"\x02" + _subblocked(bp.flush())
        + b"\x3b"
    )
    with pytest.raises(UnsupportedMediaError, match="LZW"):
        decode_gif(payload)


# ---------------------------------------------------------------------------
# pipeline integration
# ---------------------------------------------------------------------------


def test_sniff_and_builtin_decoder_gif():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(24, 17, 3)).astype(np.uint8)
    # same pixels through BMP (already-trusted path) and through a
    # 256-gray GIF must yield close features (GIF is palettized to gray)
    gray = np.round(
        px[..., 0] * 0.299 + px[..., 1] * 0.587 + px[..., 2] * 0.114
    ).astype(np.uint8)
    gif_payload = encode_gif(gray, _gray_palette())
    assert sniff_kind(gif_payload) == "gif"
    feat = builtin_decoder(gif_payload)
    assert feat.shape == (64,) and feat.dtype == np.float32
    assert np.isfinite(feat).all()
    gray3 = np.stack([gray] * 3, axis=-1)
    np.testing.assert_allclose(
        feat, builtin_decoder(encode_bmp(gray3)), atol=1e-6
    )
    # and the feature equals image_feature over the decoded array exactly
    np.testing.assert_array_equal(
        feat, image_feature(decode_gif(gif_payload))
    )


# ---------------------------------------------------------------------------
# giflib differential (the real-producer oracle; skipped if absent)
#
# Mirrors the libtiff pattern in test_tiff.py: every roundtrip above uses
# the tests-only encoder, which could in principle share a convention
# error with the decoder (LZW width-growth boundary, table-full policy).
# giflib is the producer behind virtually every real .gif in a crawl, so
# both directions are pinned:
#   1. giflib WRITES streams (incl. ones long enough to climb to 12-bit
#      codes and clear mid-stream) → our decoder must reproduce the
#      palette indices exactly.
#   2. giflib READS our tests-only encoder's streams (explicit-clear AND
#      deferred-clear table-full policies) → indices match.
# ---------------------------------------------------------------------------

import ctypes
import ctypes.util


def _load_libgif():
    for name in ("libgif.so.7", "libgif.so", ctypes.util.find_library("gif")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        try:
            lib.EGifOpenFileName.restype = ctypes.c_void_p
            lib.DGifOpenFileName.restype = ctypes.c_void_p
            lib.GifMakeMapObject.restype = ctypes.c_void_p
            lib.EGifOpenFileName.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
            lib.DGifOpenFileName.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
            lib.GifMakeMapObject.argtypes = [ctypes.c_int, ctypes.c_char_p]
            lib.GifFreeMapObject.argtypes = [ctypes.c_void_p]
            lib.EGifPutScreenDesc.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_void_p]
            lib.EGifPutImageDesc.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
            lib.EGifPutLine.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
            lib.EGifCloseFile.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int)]
            lib.DGifGetRecordType.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int)]
            lib.DGifGetImageDesc.argtypes = [ctypes.c_void_p]
            lib.DGifGetLine.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
            lib.DGifGetExtension.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_void_p)]
            lib.DGifGetExtensionNext.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p)]
            lib.DGifCloseFile.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int)]
        except AttributeError:
            continue
        return lib
    return None


_GIFLIB = _load_libgif()
needs_libgif = pytest.mark.skipif(_GIFLIB is None, reason="giflib not available")

# GIF interlace pass schedule (start, step) — the writer must supply rows
# in this order when the interlace bit is set (giflib does not reorder)
_ILACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


def _interlaced_row_order(h: int) -> list[int]:
    return [r for start, step in _ILACE_PASSES for r in range(start, h, step)]


def giflib_write(idx: np.ndarray, palette: np.ndarray, tmp_path,
                 interlace: bool = False) -> bytes:
    """Write palette indices through the system giflib; returns file bytes."""
    H, W = idx.shape
    n_slots = 2
    while n_slots < len(palette):
        n_slots *= 2
    pal = np.zeros((n_slots, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    cmap = _GIFLIB.GifMakeMapObject(n_slots, pal.tobytes())
    assert cmap
    err = ctypes.c_int(0)
    path = str(tmp_path / "lg.gif")
    gif = _GIFLIB.EGifOpenFileName(path.encode(), 0, ctypes.byref(err))
    assert gif, err.value
    bits = n_slots.bit_length() - 1
    assert _GIFLIB.EGifPutScreenDesc(gif, W, H, bits, 0, cmap) == 1
    assert _GIFLIB.EGifPutImageDesc(
        gif, 0, 0, W, H, int(interlace), None) == 1
    order = _interlaced_row_order(H) if interlace else range(H)
    rows = np.ascontiguousarray(idx, dtype=np.uint8)
    for r in order:
        assert _GIFLIB.EGifPutLine(gif, rows[r].tobytes(), W) == 1
    assert _GIFLIB.EGifCloseFile(gif, ctypes.byref(err)) == 1
    _GIFLIB.GifFreeMapObject(cmap)
    return (tmp_path / "lg.gif").read_bytes()


def giflib_read_indices(payload: bytes, shape, tmp_path) -> np.ndarray:
    """Read the first image's palette indices through the system giflib's
    sequential DGif API (record walk: 2=image, 3=extension, 4=trailer)."""
    H, W = shape
    path = tmp_path / "rg.gif"
    path.write_bytes(payload)
    err = ctypes.c_int(0)
    gif = _GIFLIB.DGifOpenFileName(str(path).encode(), ctypes.byref(err))
    assert gif, err.value
    out = np.zeros((H, W), dtype=np.uint8)
    buf = ctypes.create_string_buffer(W)
    rectype = ctypes.c_int(0)
    got = False
    while not got:
        assert _GIFLIB.DGifGetRecordType(gif, ctypes.byref(rectype)) == 1
        if rectype.value == 2:  # IMAGE_DESC_RECORD_TYPE
            assert _GIFLIB.DGifGetImageDesc(gif) == 1
            for r in range(H):
                assert _GIFLIB.DGifGetLine(gif, buf, W) == 1
                out[r] = np.frombuffer(buf.raw, dtype=np.uint8)
            got = True
        elif rectype.value == 3:  # EXTENSION_RECORD_TYPE
            code = ctypes.c_int(0)
            ext = ctypes.c_void_p()
            assert _GIFLIB.DGifGetExtension(
                gif, ctypes.byref(code), ctypes.byref(ext)) == 1
            while ext.value:
                assert _GIFLIB.DGifGetExtensionNext(
                    gif, ctypes.byref(ext)) == 1
        else:  # trailer before any image
            break
    _GIFLIB.DGifCloseFile(gif, ctypes.byref(err))
    assert got
    return out


_DIFF_RNG = np.random.default_rng(77)


@needs_libgif
@pytest.mark.parametrize("n_colors,shape", [(256, (21, 17)), (4, (15, 23))])
def test_giflib_written_streams_decode(n_colors, shape, tmp_path):
    idx = _DIFF_RNG.integers(0, n_colors, shape, dtype=np.uint8)
    palette = _DIFF_RNG.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    arr = decode_gif(giflib_write(idx, palette, tmp_path))
    np.testing.assert_array_equal(arr, palette[idx])


@needs_libgif
def test_giflib_long_stream_width_bumps(tmp_path):
    # enough entropy that the code width climbs to 12 bits and giflib's
    # table-full policy kicks in mid-stream
    idx = _DIFF_RNG.integers(0, 256, (96, 180), dtype=np.uint8)
    palette = np.arange(256, dtype=np.uint8)[:, None].repeat(3, axis=1)
    arr = decode_gif(giflib_write(idx, palette, tmp_path))
    np.testing.assert_array_equal(arr, palette[idx])


@needs_libgif
def test_giflib_interlaced_stream_decodes(tmp_path):
    idx = _DIFF_RNG.integers(0, 256, (37, 11), dtype=np.uint8)
    palette = _DIFF_RNG.integers(0, 256, (256, 3), dtype=np.uint8)
    arr = decode_gif(giflib_write(idx, palette, tmp_path, interlace=True))
    np.testing.assert_array_equal(arr, palette[idx])


@needs_libgif
@pytest.mark.parametrize("deferred_clear", [False, True])
def test_giflib_reads_our_encoder(deferred_clear, tmp_path):
    # reverse direction: both table-full policies of the tests-only
    # encoder must parse through the real producer's decoder
    idx = _DIFF_RNG.integers(0, 256, (64, 128), dtype=np.uint8)
    palette = np.arange(256, dtype=np.uint8)[:, None].repeat(3, axis=1)
    payload = encode_gif(idx, palette, deferred_clear=deferred_clear)
    got = giflib_read_indices(payload, idx.shape, tmp_path)
    np.testing.assert_array_equal(got, idx)


@needs_libgif
def test_giflib_reads_our_low_mcs_and_gce(tmp_path):
    # 4-color frame (mcs=2) carrying a graphic-control extension
    idx = _DIFF_RNG.integers(0, 4, (19, 13), dtype=np.uint8)
    palette = _DIFF_RNG.integers(0, 256, (4, 3), dtype=np.uint8)
    payload = encode_gif(
        [{"idx": idx, "delay_ms": 40, "transparent": 3}], palette)
    got = giflib_read_indices(payload, idx.shape, tmp_path)
    np.testing.assert_array_equal(got, idx)
