"""WebP VP8L decoder tests (operators/webp.py).

Two independent verification angles:

1. The system libwebp (via ctypes, skipped if absent) is both the
   encoder AND the decode oracle: for a matrix of image families chosen
   to force every VP8L feature — predictor transform, cross-color
   transform, subtract-green, palette at every bundle width, color
   cache, meta prefix groups, LZ77 backrefs — the pure-Python decode
   must equal ``WebPDecodeRGBA``'s output bit-for-bit (and the original
   pixels where alpha is opaque; libwebp's default lossless mode is
   deliberately non-exact under alpha=0).
2. A hand-built bitstream (independent LSB-first bit writer in this
   file) covers the 2-symbol simple-code form the real encoder rarely
   emits, with a hand-derived expected output.

Plus hostile-input contracts and container-walk cases.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import struct

import numpy as np
import pytest

from mitie_spark.operators.media_codecs import (
    UnsupportedMediaError,
    builtin_decoder,
    image_feature,
    sniff_kind,
)
import mitie_spark.operators.webp as webp_mod
from mitie_spark.operators.webp import decode_webp, decode_webp_frames

# ---------------------------------------------------------------------------
# libwebp ctypes binding (encode + reference decode), tests-only
# ---------------------------------------------------------------------------


def _load_libwebp():
    for name in ("libwebp.so.7", "libwebp.so", ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        try:
            lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
            lib.WebPEncodeLosslessRGBA.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_void_p),
            ]
            lib.WebPEncodeRGBA.restype = ctypes.c_size_t
            lib.WebPEncodeRGBA.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.POINTER(ctypes.c_void_p),
            ]
            lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
            lib.WebPDecodeRGBA.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
        except AttributeError:
            continue
        return lib
    return None


_LIB = _load_libwebp()
needs_libwebp = pytest.mark.skipif(_LIB is None, reason="libwebp not available")


def encode_lossless(rgba: np.ndarray) -> bytes:
    h, w, _ = rgba.shape
    out = ctypes.c_void_p()
    n = _LIB.WebPEncodeLosslessRGBA(
        np.ascontiguousarray(rgba).tobytes(), w, h, w * 4, ctypes.byref(out)
    )
    assert n > 0
    buf = ctypes.string_at(out, n)
    _LIB.WebPFree(out)
    return buf


def encode_lossy(rgba: np.ndarray, quality: float = 75.0) -> bytes:
    h, w, _ = rgba.shape
    out = ctypes.c_void_p()
    n = _LIB.WebPEncodeRGBA(
        np.ascontiguousarray(rgba).tobytes(), w, h, w * 4, quality, ctypes.byref(out)
    )
    assert n > 0
    buf = ctypes.string_at(out, n)
    _LIB.WebPFree(out)
    return buf


def reference_decode(payload: bytes) -> np.ndarray:
    wi, hi = ctypes.c_int(), ctypes.c_int()
    p = _LIB.WebPDecodeRGBA(payload, len(payload), ctypes.byref(wi), ctypes.byref(hi))
    assert p
    arr = np.ctypeslib.as_array(p, (hi.value, wi.value, 4)).copy()
    _LIB.WebPFree(ctypes.cast(p, ctypes.c_void_p))
    return arr


# ---------------------------------------------------------------------------
# image families (deterministic) chosen to force every VP8L feature
# ---------------------------------------------------------------------------


def _families() -> dict[str, np.ndarray]:
    rng = np.random.default_rng(42)

    def opaque(a):
        a = a.copy()
        a[..., 3] = 255
        return a

    yy, xx = np.meshgrid(np.arange(130), np.arange(170), indexing="ij")
    photo = np.stack(
        [
            128 + 80 * np.sin(yy / 9.0) + 40 * np.cos(xx / 13.0),
            100 + 90 * np.sin((xx + yy) / 17.0),
            xx * 255 / 170.0,
            np.full_like(yy, 255.0),
        ],
        -1,
    ).astype(np.uint8)
    photo = np.clip(photo + rng.normal(0, 4, photo.shape), 0, 255).astype(np.uint8)
    photo[..., 3] = 255

    fams = {
        # no transform, color cache + LZ77
        "noise": opaque(rng.integers(0, 256, (23, 31, 4), dtype=np.uint8)),
        # random alpha: opaque-pixel equality only (encoder is non-exact
        # under alpha=0 by design)
        "noise_alpha": rng.integers(0, 256, (23, 31, 4), dtype=np.uint8),
        # predictor + cross-color transforms, meta prefix groups
        "photo_big": photo,
        # subtract-green
        "gray3": None,
        # LZ77-heavy
        "texture": None,
        "const": np.full((16, 16, 4), 130, np.uint8),
    }
    gray = rng.integers(0, 256, (40, 50), dtype=np.uint8)
    g3 = np.clip(gray.astype(int)[..., None] + rng.integers(-6, 7, (40, 50, 3)), 0, 255)
    fams["gray3"] = np.concatenate(
        [g3, np.full((40, 50, 1), 255)], -1
    ).astype(np.uint8)
    tex = opaque(rng.integers(0, 256, (8, 16, 4), dtype=np.uint8))
    fams["texture"] = np.tile(tex, (6, 5, 1))
    # palettes at every bundle width (1/2/4/8 px per packed unit)
    for k, n in [("pal2", 2), ("pal3", 3), ("pal9", 9), ("pal17", 17), ("pal200", 200)]:
        pal = opaque(rng.integers(0, 256, (n, 4), dtype=np.uint8))
        fams[k] = pal[rng.integers(0, n, (29, 53))]
    return fams


@needs_libwebp
@pytest.mark.parametrize("name", sorted(_families()))
def test_real_encoder_roundtrip(name):
    img = _families()[name]
    payload = encode_lossless(img)
    got = decode_webp(payload)
    np.testing.assert_array_equal(got, reference_decode(payload))
    opaque_mask = img[..., 3] == 255
    np.testing.assert_array_equal(got[opaque_mask], img[opaque_mask])


@needs_libwebp
def test_feature_matrix_exercises_all_transforms():
    """Keep the suite honest: the family matrix must actually reach all
    four transforms and the meta-prefix path in the decoder. If a future
    libwebp changes its heuristics, this fails loudly instead of the
    coverage silently evaporating."""
    seen: set[int] = set()
    metas = []
    orig = webp_mod._decode_image

    def traced(br, xs, ys, level0):
        px, tr = orig(br, xs, ys, level0)
        if level0:
            seen.update(t[0] for t in tr)
        return px, tr

    webp_mod._decode_image = traced
    try:
        for img in _families().values():
            decode_webp(encode_lossless(img))
    finally:
        webp_mod._decode_image = orig
    assert seen == {0, 1, 2, 3}, f"transforms exercised: {seen}"


# ---------------------------------------------------------------------------
# hand-built bitstream: 2-symbol simple codes + subtract-green
# ---------------------------------------------------------------------------


class _LsbWriter:
    def __init__(self):
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def put(self, value: int, nbits: int):
        self.acc |= value << self.nbits
        self.nbits += nbits
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def bytes(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _wrap_riff(vp8l: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        chunk += b"\0"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def test_handbuilt_simple2_subtract_green():
    """4x3 image, subtract-green transform, GREEN uses a 2-symbol simple
    code (symbols read in DESCENDING order — canonical assignment must
    re-sort them), R/B/A single-symbol codes."""
    w, h = 4, 3
    bw = _LsbWriter()
    bw.put(0x2F, 8)
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)  # alpha hint
    bw.put(0, 3)  # version
    bw.put(1, 1)  # transform present
    bw.put(2, 2)  # subtract green
    bw.put(0, 1)  # no more transforms
    bw.put(0, 1)  # no color cache
    bw.put(0, 1)  # no meta prefix
    # green: simple, 2 symbols, 8-bit first: 200 then 10 (descending!)
    bw.put(1, 1)
    bw.put(1, 1)
    bw.put(1, 1)
    bw.put(200, 8)
    bw.put(10, 8)
    # red: simple, 1 symbol (5); blue: 1 symbol (100); alpha: 1 symbol (255)
    for sym in (5, 100, 255):
        bw.put(1, 1)
        bw.put(0, 1)
        bw.put(1, 1)
        bw.put(sym, 8)
    # distance: simple, 1 symbol, 1-bit form, symbol 0
    bw.put(1, 1)
    bw.put(0, 1)
    bw.put(0, 1)
    bw.put(0, 1)
    # pixels: canonical code ⇒ bit 0 → symbol 10, bit 1 → symbol 200
    pattern = [0, 1, 1, 0, 1, 0, 0, 1, 0, 0, 1, 1]
    for b in pattern:
        bw.put(b, 1)
    payload = _wrap_riff(bw.bytes())
    got = decode_webp(payload)
    greens = np.where(np.array(pattern).reshape(h, w) == 0, 10, 200).astype(np.uint16)
    expected = np.stack(
        [
            (greens + 5) % 256,  # red, subtract-green inverted
            greens,
            (greens + 100) % 256,
            np.full((h, w), 255, np.uint16),
        ],
        -1,
    ).astype(np.uint8)
    np.testing.assert_array_equal(got, expected)
    if _LIB is not None:  # the real decoder agrees with the hand-derivation
        np.testing.assert_array_equal(reference_decode(payload), expected)


# ---------------------------------------------------------------------------
# container + dispatch + hostile contracts
# ---------------------------------------------------------------------------


@needs_libwebp
def test_vp8x_container_with_vp8l_chunk():
    img = _families()["pal9"]
    payload = encode_lossless(img)
    # re-wrap the VP8L chunk inside an extended VP8X container
    assert payload[12:16] == b"VP8L"
    vp8l_chunk = payload[12:]
    h, w = img.shape[:2]
    vp8x = b"VP8X" + struct.pack("<I", 10) + bytes([0, 0, 0, 0]) + struct.pack(
        "<I", w - 1
    )[:3] + struct.pack("<I", h - 1)[:3]
    body = b"WEBP" + vp8x + vp8l_chunk
    wrapped = b"RIFF" + struct.pack("<I", len(body)) + body
    np.testing.assert_array_equal(decode_webp(wrapped), decode_webp(payload))


@needs_libwebp
def test_lossy_vp8_decodes_for_real():
    # the lossy path is covered in depth by tests/test_vp8.py; here just
    # pin that the container dispatch reaches it
    img = _families()["photo_big"]
    payload = encode_lossy(img)
    assert sniff_kind(payload) == "webp"
    out = decode_webp(payload)
    assert out.shape == (img.shape[0], img.shape[1], 4)


@needs_libwebp
def test_sniff_and_builtin_decoder():
    img = _families()["texture"]
    payload = encode_lossless(img)
    assert sniff_kind(payload) == "webp"
    np.testing.assert_array_equal(builtin_decoder(payload), image_feature(img))


@needs_libwebp
@pytest.mark.parametrize(
    "mutate",
    [
        lambda p: p[:11],
        lambda p: p[:20],
        lambda p: p[: len(p) // 2],
        lambda p: p[:12] + b"ANIM" + p[16:],
        lambda p: p.replace(b"VP8L", b"VP8 ", 1),
    ],
)
def test_malformed_raises_unsupported(mutate):
    payload = encode_lossless(_families()["pal3"])
    with pytest.raises(UnsupportedMediaError):
        decode_webp(mutate(payload))


def test_bad_signature_and_version():
    bw = _LsbWriter()
    bw.put(0x2F, 8)
    bw.put(3, 14)
    bw.put(2, 14)
    bw.put(0, 1)
    bw.put(5, 3)  # bad version
    with pytest.raises(UnsupportedMediaError, match="version"):
        decode_webp(_wrap_riff(bw.bytes()))
    with pytest.raises(UnsupportedMediaError):
        decode_webp(_wrap_riff(b"\x00\x00\x00\x00\x00"))


def test_dimension_bomb_rejected():
    bw = _LsbWriter()
    bw.put(0x2F, 8)
    bw.put(16383, 14)
    bw.put(16383, 14)  # 16384 x 16384 = 256M pixels > cap
    bw.put(0, 1)
    bw.put(0, 3)
    bw.put(0, 1)
    with pytest.raises(UnsupportedMediaError, match="dimensions"):
        decode_webp(_wrap_riff(bw.bytes()))


# ---------------------------------------------------------------------------
# animated WebP (ANIM/ANMF): frame extraction + compositing; no system
# demuxer exists here, so composites are checked against straight-NumPy
# implementations of the container spec's blend/dispose rules (the same
# strategy the GIF suite uses for its animation tests)
# ---------------------------------------------------------------------------


def _vp8l_chunk(payload: bytes) -> bytes:
    pos = 12
    while pos + 8 <= len(payload):
        f = payload[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", payload, pos + 4)
        if f == b"VP8L":
            return payload[pos : pos + 8 + sz + (sz & 1)]
        pos += 8 + sz + (sz & 1)
    raise AssertionError("no VP8L chunk")


def build_anim(cw, ch, frames, bg=(0, 0, 0, 0), loop=0):
    """frames: list of (rgba, x, y, duration_ms, blend, dispose)."""
    body = bytearray()
    body += b"VP8X" + struct.pack("<I", 10) + bytes([0x12, 0, 0, 0])
    body += (cw - 1).to_bytes(3, "little") + (ch - 1).to_bytes(3, "little")
    body += b"ANIM" + struct.pack("<I", 6)
    body += bytes([bg[2], bg[1], bg[0], bg[3]]) + struct.pack("<H", loop)
    for arr, x, y, dur, blend, dispose in frames:
        chunk = _vp8l_chunk(encode_lossless(arr))
        fl = (0 if blend else 2) | (1 if dispose else 0)
        anmf = (x // 2).to_bytes(3, "little") + (y // 2).to_bytes(3, "little")
        anmf += (arr.shape[1] - 1).to_bytes(3, "little")
        anmf += (arr.shape[0] - 1).to_bytes(3, "little")
        anmf += dur.to_bytes(3, "little") + bytes([fl]) + chunk
        body += b"ANMF" + struct.pack("<I", len(anmf)) + anmf
        if len(anmf) & 1:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + bytes(body)


@needs_libwebp
def test_animation_composite_blend_dispose():
    rng = np.random.default_rng(3)
    f1 = rng.integers(0, 256, (16, 24, 4), dtype=np.uint8)
    f1[..., 3] = 255
    f2 = rng.integers(0, 256, (8, 12, 4), dtype=np.uint8)
    f2[..., 3] = 255
    f3 = rng.integers(0, 256, (8, 12, 4), dtype=np.uint8)
    f3[..., 3] = 128
    p = build_anim(
        24, 16,
        [(f1, 0, 0, 100, False, False), (f2, 4, 6, 50, False, True),
         (f3, 8, 2, 70, True, False)],
        bg=(9, 8, 7, 255),
    )
    frames = decode_webp_frames(p)
    assert [d for _, d in frames] == [100, 50, 70]
    c0 = np.zeros((16, 24, 4), np.uint8)
    c0[0:16, 0:24] = f1
    np.testing.assert_array_equal(frames[0][0], c0)
    c1 = c0.copy()
    c1[6:14, 4:16] = f2
    np.testing.assert_array_equal(frames[1][0], c1)
    c2 = c1.copy()
    c2[6:14, 4:16] = np.array([9, 8, 7, 255], np.uint8)  # dispose
    dst = c2[2:10, 8:20].astype(np.int64)
    src = f3.astype(np.int64)
    sa, da = src[..., 3:4], dst[..., 3:4]
    scale = da * (255 - sa) // 255
    ba = sa + scale
    rgb = (src[..., :3] * sa + dst[..., :3] * scale) // np.maximum(ba, 1)
    c2[2:10, 8:20] = np.concatenate([rgb, ba], -1).astype(np.uint8)
    np.testing.assert_array_equal(frames[2][0], c2)
    # decode_webp returns the first composited frame
    np.testing.assert_array_equal(decode_webp(p), frames[0][0])


@needs_libwebp
def test_animation_still_fallback_and_hostile():
    # a still image through decode_webp_frames → single frame
    img = _families()["pal9"]
    payload = encode_lossless(img)
    frames = decode_webp_frames(payload)
    assert len(frames) == 1 and frames[0][1] == 0
    # ANMF before VP8X/ANIM is hostile
    bad = b"RIFF" + struct.pack("<I", 20) + b"WEBP" + b"ANMF" + struct.pack("<I", 8) + b"\x00" * 8
    with pytest.raises(UnsupportedMediaError):
        decode_webp_frames(bad)
    with pytest.raises(UnsupportedMediaError):
        decode_webp_frames(payload[:16])


def _frame_image_chunks(payload: bytes) -> bytes:
    """Extract the image chunks (ALPH if present, then VP8/VP8L) from a
    still WebP file, padded per RIFF — the body an ANMF frame embeds."""
    pos = 12
    out = bytearray()
    while pos + 8 <= len(payload):
        f = payload[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", payload, pos + 4)
        if f in (b"ALPH", b"VP8 ", b"VP8L"):
            out += payload[pos : pos + 8 + sz + (sz & 1)]
        pos += 8 + sz + (sz & 1)
    assert out, "no image chunk in still"
    return bytes(out)


def build_anim_raw(cw, ch, frames, bg=(0, 0, 0, 0), loop=0):
    """Like build_anim but frames carry pre-extracted image-chunk bytes:
    list of (chunks, w, h, x, y, duration_ms, blend, dispose)."""
    body = bytearray()
    body += b"VP8X" + struct.pack("<I", 10) + bytes([0x12, 0, 0, 0])
    body += (cw - 1).to_bytes(3, "little") + (ch - 1).to_bytes(3, "little")
    body += b"ANIM" + struct.pack("<I", 6)
    body += bytes([bg[2], bg[1], bg[0], bg[3]]) + struct.pack("<H", loop)
    for chunks, w, h, x, y, dur, blend, dispose in frames:
        fl = (0 if blend else 2) | (1 if dispose else 0)
        anmf = (x // 2).to_bytes(3, "little") + (y // 2).to_bytes(3, "little")
        anmf += (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
        anmf += dur.to_bytes(3, "little") + bytes([fl]) + chunks
        body += b"ANMF" + struct.pack("<I", len(anmf)) + anmf
        if len(anmf) & 1:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + bytes(body)


@needs_libwebp
def test_animation_lossy_frames_composite():
    """ANMF frames carrying VP8 (lossy) chunks — incl. one with an ALPH
    chunk inside the frame — composite exactly like VP8L ones. The frame
    pixels come from our own still decode (bit-exact vs libwebp per the
    suite above), so this pins the ANIM plumbing: the chunk walk, the
    ALPH-before-VP8 pairing inside ANMF, and blend/dispose."""
    yy, xx = np.meshgrid(np.arange(16), np.arange(24), indexing="ij")
    f1 = np.stack([(yy * 9 + xx * 5) % 256, (yy * 3) % 256,
                   (xx * 7) % 256, np.full_like(yy, 255)], -1).astype(np.uint8)
    f2 = np.stack([(xx[:8, :12] * 11) % 256, (yy[:8, :12] * 13) % 256,
                   np.full((8, 12), 40), np.full((8, 12), 255)], -1).astype(np.uint8)
    f3 = f2.copy()
    f3[..., 3] = 128  # semi-transparent → libwebp emits an ALPH chunk
    s1, s2, s3 = (encode_lossy(f, 80.0) for f in (f1, f2, f3))
    assert b"ALPH" in s3 and b"ALPH" not in s2
    p = build_anim_raw(
        24, 16,
        [(_frame_image_chunks(s1), 24, 16, 0, 0, 100, False, False),
         (_frame_image_chunks(s2), 12, 8, 4, 6, 50, False, True),
         (_frame_image_chunks(s3), 12, 8, 8, 2, 70, True, False)],
        bg=(9, 8, 7, 255),
    )
    frames = decode_webp_frames(p)
    assert [d for _, d in frames] == [100, 50, 70]
    # reference composite from our trusted still decodes
    d1, d2, d3 = (decode_webp(s) for s in (s1, s2, s3))
    c0 = np.zeros((16, 24, 4), np.uint8)
    c0[:] = d1
    np.testing.assert_array_equal(frames[0][0], c0)
    c1 = c0.copy()
    c1[6:14, 4:16] = d2  # opaque, blend=False → straight copy
    np.testing.assert_array_equal(frames[1][0], c1)
    c2 = c1.copy()
    c2[6:14, 4:16] = np.array([9, 8, 7, 255], np.uint8)  # dispose of f2
    dst = c2[2:10, 8:20].astype(np.int64)
    src = d3.astype(np.int64)
    sa, da = src[..., 3:4], dst[..., 3:4]
    scale = da * (255 - sa) // 255
    ba = sa + scale
    rgb = (src[..., :3] * sa + dst[..., :3] * scale) // np.maximum(ba, 1)
    c2[2:10, 8:20] = np.concatenate([rgb, ba], -1).astype(np.uint8)
    np.testing.assert_array_equal(frames[2][0], c2)
