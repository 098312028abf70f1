"""VP8 (lossy WebP) decoder tests (operators/vp8.py).

Two independent verification angles, mirroring tests/test_webp.py:

1. The system libwebp (ctypes, skipped if absent) as encoder AND decode
   oracle: for an image matrix across quality levels, the pure-Python
   reconstruction must equal ``WebPDecodeYUV``'s Y/U/V planes
   bit-for-bit (the decoder-level contract), and the public
   ``decode_webp`` RGBA output must equal ``WebPDecodeRGBA``
   bit-for-bit (fancy chroma upsampling + fixed-point YUV→RGB).
2. HAND-CRAFTED bitstreams (an independent VP8 bool *encoder* lives in
   this file) that pin every path the real encoder exercises only
   incidentally: each of the 10 B_PRED submodes in isolation, all
   16x16/chroma intra modes, mixed-submode context propagation, the
   normal loop filter across levels/sharpness, the simple filter,
   segmentation with per-segment filter levels, loop-filter ref/mode
   deltas, and multiple token partitions — each decoded by libwebp as
   the expected output.

Plus hostile-input contracts (interframe, bad start code, truncation,
dimension bombs) and container integration.
"""

from __future__ import annotations

import ctypes
import struct

import numpy as np
import pytest

from mitie_spark.operators.media_codecs import (
    UnsupportedMediaError,
    builtin_decoder,
    image_feature,
    sniff_kind,
)
from mitie_spark.operators.vp8 import decode_vp8, vp8_to_rgba
from mitie_spark.operators.vp8_tables import KF_BMODE_PROBS, UPDATE_PROBS
from mitie_spark.operators.webp import decode_webp
from tests.test_webp import _LIB as _WEBPLIB, needs_libwebp

if _WEBPLIB is not None:
    _WEBPLIB.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
    _WEBPLIB.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]


def encode_lossy(rgba: np.ndarray, quality: float = 75.0) -> bytes:
    h, w, _ = rgba.shape
    out = ctypes.c_void_p()
    n = _WEBPLIB.WebPEncodeRGBA(
        np.ascontiguousarray(rgba).tobytes(), w, h, w * 4, quality,
        ctypes.byref(out),
    )
    assert n > 0
    buf = ctypes.string_at(out, n)
    _WEBPLIB.WebPFree(out)
    return buf


def reference_yuv(payload: bytes):
    wi, hi = ctypes.c_int(), ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_ubyte)()
    vp = ctypes.POINTER(ctypes.c_ubyte)()
    st, uvst = ctypes.c_int(), ctypes.c_int()
    yp = _WEBPLIB.WebPDecodeYUV(
        payload, len(payload), ctypes.byref(wi), ctypes.byref(hi),
        ctypes.byref(up), ctypes.byref(vp), ctypes.byref(st), ctypes.byref(uvst),
    )
    assert yp
    w, h = wi.value, hi.value
    cw, ch = (w + 1) // 2, (h + 1) // 2
    Y = np.ctypeslib.as_array(yp, (h, st.value))[:, :w].copy()
    U = np.ctypeslib.as_array(up, (ch, uvst.value))[:, :cw].copy()
    V = np.ctypeslib.as_array(vp, (ch, uvst.value))[:, :cw].copy()
    _WEBPLIB.WebPFree(ctypes.cast(yp, ctypes.c_void_p))
    return Y, U, V


def reference_rgba(payload: bytes) -> np.ndarray:
    wi, hi = ctypes.c_int(), ctypes.c_int()
    p = _WEBPLIB.WebPDecodeRGBA(payload, len(payload), ctypes.byref(wi), ctypes.byref(hi))
    assert p
    arr = np.ctypeslib.as_array(p, (hi.value, wi.value, 4)).copy()
    _WEBPLIB.WebPFree(ctypes.cast(p, ctypes.c_void_p))
    return arr


def vp8_chunk(payload: bytes) -> bytes:
    pos = 12
    while pos + 8 <= len(payload):
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if fourcc == b"VP8 ":
            return payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


# ---------------------------------------------------------------------------
# independent bitstream crafter (tests-only): bool encoder + keyframe writer
# ---------------------------------------------------------------------------


class BoolEnc:
    """VP8 boolean encoder (big-int low register: carries self-resolve)."""

    def __init__(self):
        self.low = 0
        self.rng = 255
        self.s = 0

    def put(self, prob, bit):
        prob = int(prob)
        split = 1 + (((self.rng - 1) * prob) >> 8)
        if bit:
            self.low += split << 8
            self.rng -= split
        else:
            self.rng = split
        while self.rng < 128:
            self.low <<= 1
            self.rng <<= 1
            self.s += 1

    def lit(self, v, n):
        for i in range(n - 1, -1, -1):
            self.put(128, (v >> i) & 1)

    def flush(self) -> bytes:
        L = self.s + 16
        pad = (-L) % 8
        return (self.low << pad).to_bytes((L + pad) // 8, "big")


def emit_tree(enc, tree, probs, leaf):
    stack = [(0, [])]
    found = None
    while stack:
        i, bits = stack.pop()
        for b in (0, 1):
            t = tree[i + b]
            if t <= 0:
                if -t == leaf:
                    found = bits + [(i >> 1, b)]
            else:
                stack.append((t, bits + [(i >> 1, b)]))
    assert found is not None
    for pidx, b in found:
        enc.put(probs[pidx], b)


_KF_YMODE_TREE = (-4, 2, 4, 6, -0, -1, -2, -3)
_KF_YMODE_PROBS = (145, 156, 163, 128)
_UV_TREE = (-0, 2, -1, 4, -2, -3)
_UV_PROBS = (142, 114, 183)
_BMODE_TREE = (-0, 2, -1, 4, -2, 6, 8, 12, -3, 10, -4, -5, -6, 14, -7, 16, -8, -9)
_MODE_TO_B = {0: 0, 1: 2, 2: 3, 3: 1}


def craft_frame(mb_w, mb_h, ymodes, bmodes_fn=None, uvmode=0,
                simple_filter=0, filter_level=0, sharpness=0,
                seg_lf=None, seg_ids=None, lf_deltas=None, n_parts=1):
    """Write a skip-only (no residuals) VP8 keyframe exercising chosen
    modes/filter/segmentation paths; wrapped as a WebP file."""
    enc = BoolEnc()
    enc.put(128, 0)
    enc.put(128, 0)  # colorspace, clamp
    if seg_lf is not None:
        enc.put(128, 1)  # segmentation on
        enc.put(128, 1)  # update map
        enc.put(128, 1)  # update data
        enc.put(128, 1)  # absolute values
        for _ in range(4):
            enc.put(128, 0)  # no quantizer values
        for v in seg_lf:
            enc.put(128, 1)
            enc.lit(abs(v), 6)
            enc.put(128, 1 if v < 0 else 0)
        for _ in range(3):
            enc.put(128, 0)  # segment tree probs stay 255
    else:
        enc.put(128, 0)
    enc.put(128, simple_filter)
    enc.lit(filter_level, 6)
    enc.lit(sharpness, 3)
    if lf_deltas is not None:
        enc.put(128, 1)
        enc.put(128, 1)
        for group in lf_deltas:
            for v in group:
                enc.put(128, 1)
                enc.lit(abs(v), 6)
                enc.put(128, 1 if v < 0 else 0)
    else:
        enc.put(128, 0)
    enc.lit({1: 0, 2: 1, 4: 2, 8: 3}[n_parts], 2)
    enc.lit(0, 7)  # y_ac_qi
    for _ in range(5):
        enc.put(128, 0)  # no quant deltas
    enc.put(128, 0)  # refresh entropy
    for p in UPDATE_PROBS.reshape(-1):
        enc.put(int(p), 0)  # no token prob updates
    enc.put(128, 1)  # mb_no_skip_coeff
    enc.lit(128, 8)  # prob_skip
    above_b = np.zeros((mb_w, 4), dtype=np.int64)
    for my in range(mb_h):
        left_b = [0, 0, 0, 0]
        for mx in range(mb_w):
            if seg_lf is not None:
                sid = seg_ids[my][mx]
                enc.put(255, sid >> 1)
                enc.put(255, sid & 1)
            enc.put(128, 1)  # skip: no residuals
            ym = int(ymodes[my][mx])
            emit_tree(enc, _KF_YMODE_TREE, _KF_YMODE_PROBS, ym)
            if ym == 4:
                bm = bmodes_fn(my, mx)
                for sy in range(4):
                    for sx in range(4):
                        a = int(above_b[mx, sx]) if sy == 0 else bm[(sy - 1) * 4 + sx]
                        l = left_b[sy] if sx == 0 else bm[sy * 4 + sx - 1]
                        emit_tree(enc, _BMODE_TREE, KF_BMODE_PROBS[a][l], bm[sy * 4 + sx])
                above_b[mx] = bm[12:16]
                left_b = [bm[3], bm[7], bm[11], bm[15]]
            else:
                b = _MODE_TO_B[ym]
                above_b[mx] = b
                left_b = [b] * 4
            emit_tree(enc, _UV_TREE, _UV_PROBS, uvmode)
    part1 = enc.flush()
    W, H = mb_w * 16, mb_h * 16
    tag = (1 << 4) | (len(part1) << 5)
    hdr = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    hdr += b"\x9d\x01\x2a" + struct.pack("<HH", W, H)
    sizes = b"".join(struct.pack("<I", 1)[:3] for _ in range(n_parts - 1))
    frame = hdr + part1 + sizes + b"\x00" * n_parts
    chunk = b"VP8 " + struct.pack("<I", len(frame)) + frame
    if len(frame) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _assert_planes_match(payload):
    Yr, Ur, Vr = reference_yuv(payload)
    Ym, Um, Vm = decode_vp8(vp8_chunk(payload))
    np.testing.assert_array_equal(Ym, Yr)
    np.testing.assert_array_equal(Um, Ur)
    np.testing.assert_array_equal(Vm, Vr)


# ---------------------------------------------------------------------------
# real-encoder matrix
# ---------------------------------------------------------------------------


def _families():
    rng = np.random.default_rng(1)

    def opaque(a):
        a = a.copy()
        a[..., 3] = 255
        return a

    yy, xx = np.meshgrid(np.arange(48), np.arange(64), indexing="ij")
    return {
        "grad": opaque(
            np.stack([yy * 4 % 256, xx * 4 % 256, (xx + yy) * 2 % 256, 0 * yy], -1
                     ).astype(np.uint8)),
        "noise": opaque(rng.integers(0, 256, (48, 64, 4), dtype=np.uint8)),
        "odd": opaque(rng.integers(0, 256, (37, 51, 4), dtype=np.uint8)),
        "photo": opaque(
            np.clip(np.stack([128 + 80 * np.sin(yy / 5.0),
                              100 + 90 * np.cos(xx / 7.0),
                              (xx * yy) % 256, 0 * yy], -1), 0, 255
                    ).astype(np.uint8)),
    }


@needs_libwebp
@pytest.mark.parametrize("quality", [10, 50, 85])
@pytest.mark.parametrize("name", sorted(_families()))
def test_real_encoder_yuv_planes(name, quality):
    payload = encode_lossy(_families()[name], quality)
    _assert_planes_match(payload)


@needs_libwebp
def test_rgba_output_matches_libwebp():
    """decode_webp's RGBA (fancy upsampling + fixed-point YUV→RGB) must
    equal WebPDecodeRGBA bit-for-bit."""
    for name in ("grad", "odd"):
        payload = encode_lossy(_families()[name], 70)
        np.testing.assert_array_equal(decode_webp(payload), reference_rgba(payload))


# ---------------------------------------------------------------------------
# crafted bitstreams: exhaustive mode / filter / header coverage
# ---------------------------------------------------------------------------


@needs_libwebp
@pytest.mark.parametrize("bmode", range(10))
def test_crafted_bpred_submodes(bmode):
    payload = craft_frame(1, 1, [[4]], bmodes_fn=lambda my, mx: [bmode] * 16)
    _assert_planes_match(payload)


@needs_libwebp
@pytest.mark.parametrize("ymode", [0, 1, 2, 3])
@pytest.mark.parametrize("uvmode", [0, 1, 2, 3])
def test_crafted_16x16_and_chroma_modes(ymode, uvmode):
    _assert_planes_match(craft_frame(1, 1, [[ymode]], uvmode=uvmode))


@needs_libwebp
def test_crafted_mixed_modes_and_contexts():
    rng = np.random.default_rng(9)
    bl = rng.integers(0, 10, (9, 16)).tolist()
    payload = craft_frame(
        3, 3, [[4, 0, 3], [1, 4, 2], [4, 4, 0]],
        bmodes_fn=lambda my, mx: bl[my * 3 + mx], uvmode=1,
    )
    _assert_planes_match(payload)


@needs_libwebp
@pytest.mark.parametrize("level,sharpness", [(20, 0), (63, 3), (35, 6)])
def test_crafted_normal_loop_filter(level, sharpness):
    rng = np.random.default_rng(9)
    bl = rng.integers(0, 10, (9, 16)).tolist()
    payload = craft_frame(
        3, 3, [[4, 0, 3], [1, 4, 2], [4, 4, 0]],
        bmodes_fn=lambda my, mx: bl[my * 3 + mx], uvmode=1,
        filter_level=level, sharpness=sharpness,
    )
    _assert_planes_match(payload)


@needs_libwebp
@pytest.mark.parametrize("level", [10, 40])
def test_crafted_simple_loop_filter(level):
    rng = np.random.default_rng(9)
    bl = rng.integers(0, 10, (9, 16)).tolist()
    payload = craft_frame(
        3, 3, [[4, 0, 3], [1, 4, 2], [4, 4, 0]],
        bmodes_fn=lambda my, mx: bl[my * 3 + mx], uvmode=2,
        simple_filter=1, filter_level=level,
    )
    _assert_planes_match(payload)


@needs_libwebp
def test_crafted_segmentation_filter_levels():
    payload = craft_frame(
        3, 3, [[0, 1, 2], [3, 0, 1], [2, 3, 0]], filter_level=30,
        seg_lf=[0, 15, 40, 63], seg_ids=[[0, 1, 2], [3, 2, 1], [0, 0, 3]],
    )
    _assert_planes_match(payload)


@needs_libwebp
def test_crafted_lf_deltas():
    rng = np.random.default_rng(9)
    bl = rng.integers(0, 10, (9, 16)).tolist()
    payload = craft_frame(
        3, 3, [[4, 0, 4], [0, 4, 0], [4, 0, 4]],
        bmodes_fn=lambda my, mx: bl[my * 3 + mx],
        filter_level=20, lf_deltas=([10, 0, 0, 0], [-6, 0, 0, 0]),
    )
    _assert_planes_match(payload)


@needs_libwebp
def test_crafted_multiple_token_partitions():
    rng = np.random.default_rng(9)
    bl = rng.integers(0, 10, (9, 16)).tolist()
    payload = craft_frame(
        2, 4, [[0, 1], [2, 3], [4, 0], [1, 2]],
        bmodes_fn=lambda my, mx: bl[(my + mx) % 9], uvmode=3,
        n_parts=4, filter_level=12,
    )
    _assert_planes_match(payload)


# ---------------------------------------------------------------------------
# container integration + hostile contracts
# ---------------------------------------------------------------------------


@needs_libwebp
def test_sniff_and_builtin_decoder_lossy():
    img = _families()["grad"]
    payload = encode_lossy(img, 75)
    assert sniff_kind(payload) == "webp"
    feat = builtin_decoder(payload)
    np.testing.assert_array_equal(feat, image_feature(reference_rgba(payload)))


def test_interframe_rejected():
    # frame tag with bit0 set = interframe
    data = bytes([1, 0, 0]) + b"\x9d\x01\x2a" + struct.pack("<HH", 16, 16)
    with pytest.raises(UnsupportedMediaError, match="interframe"):
        decode_vp8(data)


def test_bad_start_code_rejected():
    data = bytes([0, 0, 0]) + b"\x00\x01\x2a" + struct.pack("<HH", 16, 16)
    with pytest.raises(UnsupportedMediaError, match="start code"):
        decode_vp8(data)


def test_dimension_bomb_rejected():
    data = bytes([0, 0, 0]) + b"\x9d\x01\x2a" + struct.pack("<HH", 16383, 16383)
    with pytest.raises(UnsupportedMediaError, match="dimensions"):
        decode_vp8(data + b"\x00" * 16)


@needs_libwebp
def test_truncation_and_mutation_decode_or_fail_cleanly():
    payload = encode_lossy(_families()["odd"], 60)
    chunk = vp8_chunk(payload)
    rng = np.random.default_rng(13)
    base = np.frombuffer(chunk, dtype=np.uint8)
    for _ in range(80):
        q = base.copy()
        op = int(rng.integers(0, 3))
        if op == 0:
            pos = rng.integers(0, len(q), int(rng.integers(1, 9)))
            q[pos] = rng.integers(0, 256, len(pos))
        elif op == 1:
            q = q[: int(rng.integers(1, len(q)))]
        else:
            at = int(rng.integers(0, len(q) + 1))
            ins = rng.integers(0, 256, int(rng.integers(1, 33))).astype(np.uint8)
            q = np.concatenate([q[:at], ins, q[at:]])
        try:
            decode_vp8(q.tobytes())
        except UnsupportedMediaError:
            pass


@needs_libwebp
@pytest.mark.parametrize("alpha_kind", ["smooth", "noisy", "binary"])
def test_lossy_with_alpha_plane(alpha_kind):
    """VP8X + ALPH + VP8: the alpha plane is a headerless VP8L image
    stream (or raw bytes) plus an inverse row filter — full RGBA output
    must equal WebPDecodeRGBA bit-for-bit."""
    rng = np.random.default_rng(5)
    yy, xx = np.meshgrid(np.arange(40), np.arange(56), indexing="ij")
    img = np.stack(
        [yy * 5 % 256, xx * 3 % 256, (xx + yy) % 256, np.zeros_like(yy)], -1
    ).astype(np.uint8)
    if alpha_kind == "smooth":
        img[..., 3] = np.clip(xx * 4, 0, 255)
    elif alpha_kind == "noisy":
        img[..., 3] = rng.integers(0, 256, (40, 56))
    else:
        img[..., 3] = np.where(xx % 7 < 3, 0, 255)
    payload = encode_lossy(img, 60)
    assert b"ALPH" in payload
    np.testing.assert_array_equal(decode_webp(payload), reference_rgba(payload))
