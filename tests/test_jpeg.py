"""Golden tests for the pure-NumPy baseline JPEG decoder.

The fixtures are produced by an INDEPENDENT scalar encoder written here in
the test (forward DCT from the textbook cosine formula, canonical Huffman
codes built by the spec algorithm, explicit byte stuffing / restart
markers) — the decoder must invert it. With all-ones quant tables the only
loss is coefficient rounding, so round-trips are near-exact; known-answer
cases (constant image → DC-only block) pin the absolute DCT scaling so a
consistently-wrong basis on both sides cannot slip through.
"""

import numpy as np
import pytest

from mitie_spark.operators.jpeg import decode_jpeg
from mitie_spark.operators.media_codecs import UnsupportedMediaError

# --------------------------------------------------------------------------
# independent scalar encoder
# --------------------------------------------------------------------------

_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# forward DCT basis straight from the formula: A[u,x] = c(u)/2 cos((2x+1)u pi/16)
_A = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0) / 2.0 * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

# simple valid Huffman geometry: 12 DC categories at code length 4,
# all 162 AC run/size symbols at code length 8 (all-ones codes unused)
_DC_COUNTS = bytes([0, 0, 0, 12] + [0] * 12)
_DC_VALUES = bytes(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
_AC_COUNTS = bytes([0] * 7 + [len(_AC_SYMBOLS)] + [0] * 8)
_AC_VALUES = bytes(_AC_SYMBOLS)


def _huff_codes(counts, values):
    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            codes[values[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, ln, val):
        for i in range(ln - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.put(1, 1)  # pad with 1s
        return bytes(self.out)


def _category(v):
    return 0 if v == 0 else int(abs(v)).bit_length()


def _enc_value(v, t):
    return v if v >= 0 else v + (1 << t) - 1


def _encode_block(w, blk, pred, dc_codes, ac_codes):
    """blk: 8x8 float pixels (already level-shifted NOT applied)."""
    f = _A @ (blk - 128.0) @ _A.T
    q = np.round(f).astype(int)
    zz = [int(q.flat[i]) for i in _ZZ]
    diff = zz[0] - pred
    t = _category(diff)
    ln, code = dc_codes[t]
    w.put(ln, code)
    w.put(t, _enc_value(diff, t))
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_codes[0xF0]
            w.put(ln, code)
            run -= 16
        s = _category(zz[k])
        ln, code = ac_codes[(run << 4) | s]
        w.put(ln, code)
        w.put(s, _enc_value(zz[k], s))
        run = 0
    if last_nz < 63:
        ln, code = ac_codes[0x00]
        w.put(ln, code)
    return zz[0]


def _pad_blocks(plane, bh, bw):
    """Edge-replicate to (bh*8, bw*8)."""
    H, W = plane.shape
    out = np.empty((bh * 8, bw * 8), dtype=np.float64)
    out[:H, :W] = plane
    out[H:, :W] = plane[-1:, :]
    out[:, W:] = out[:, W - 1 : W]
    return out


def _seg(marker, body):
    import struct

    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(img, subsample=False, restart=0):
    """Scalar baseline encoder: (H,W) gray or (H,W,3) RGB uint8 → JFIF
    bytes. All-ones quant tables; 4:4:4 or (subsample=True) 4:2:0."""
    import struct

    img = np.asarray(img)
    H, W = img.shape[:2]
    gray = img.ndim == 2
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            # 2x2 box average (pad odd dims by edge replication first)
            def box(p):
                pp = np.pad(p, ((0, H % 2), (0, W % 2)), mode="edge")
                return (pp[0::2, 0::2] + pp[1::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 1::2]) / 4.0

            planes = [y, box(cb), box(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcx = (W + 8 * hmax - 1) // (8 * hmax)
    mcy = (H + 8 * vmax - 1) // (8 * vmax)
    padded = [
        _pad_blocks(p, mcy * v, mcx * h) for p, (h, v) in zip(planes, samp)
    ]

    dc_codes = _huff_codes(_DC_COUNTS, _DC_VALUES)
    ac_codes = _huff_codes(_AC_COUNTS, _AC_VALUES)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # quant table 0, all ones
    out += _seg(0xDB, bytes([0x01]) + bytes([1] * 64))  # quant table 1
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", H, W) + bytes([ncomp])
    for i, (h, v) in enumerate(samp):
        sof += bytes([i + 1, (h << 4) | v, 0 if i == 0 else 1])
    out += _seg(0xC0, sof)
    # one DC + one AC table shared via two ids (exercises table selection)
    out += _seg(0xC4, bytes([0x00]) + _DC_COUNTS + _DC_VALUES)
    out += _seg(0xC4, bytes([0x10]) + _AC_COUNTS + _AC_VALUES)
    out += _seg(0xC4, bytes([0x01]) + _DC_COUNTS + _DC_VALUES)
    out += _seg(0xC4, bytes([0x11]) + _AC_COUNTS + _AC_VALUES)
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    w = _BitWriter()
    preds = [0] * ncomp
    rst = 0
    for m in range(mcx * mcy):
        if restart and m and m % restart == 0:
            out += w.flush()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            w = _BitWriter()
            preds = [0] * ncomp
        my, mx = divmod(m, mcx)
        for ci, (h, v) in enumerate(samp):
            for by in range(v):
                for bx in range(h):
                    r0, c0 = (my * v + by) * 8, (mx * h + bx) * 8
                    blk = padded[ci][r0 : r0 + 8, c0 : c0 + 8]
                    preds[ci] = _encode_block(w, blk, preds[ci], dc_codes, ac_codes)
    out += w.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------


def test_jpeg_constant_image_known_answer():
    """Constant gray: only the DC coefficient survives; the decode must
    reproduce the exact level — pins the absolute DCT/IDCT scaling."""
    for level in (0, 77, 128, 200, 255):
        img = np.full((16, 24), level, dtype=np.uint8)
        arr, maxval = decode_jpeg(encode_jpeg(img))
        assert maxval == 255
        assert arr.shape == (16, 24)
        assert np.array_equal(arr, img), level


def test_jpeg_gray_roundtrip_near_exact():
    rng = np.random.default_rng(41)
    for H, W in [(8, 8), (17, 23), (64, 48), (5, 100)]:
        img = rng.integers(0, 256, (H, W), dtype=np.uint8)
        arr, _ = decode_jpeg(encode_jpeg(img))
        assert arr.shape == (H, W)
        err = np.abs(arr.astype(int) - img.astype(int))
        # all-ones quant: only coefficient-rounding loss survives
        assert err.max() <= 4 and err.mean() < 1.0, (H, W, err.max())


def test_jpeg_smooth_gradient_high_fidelity():
    yy, xx = np.mgrid[0:40, 0:56]
    img = ((yy * 3 + xx * 2) % 256).astype(np.uint8)
    arr, _ = decode_jpeg(encode_jpeg(img))
    assert np.abs(arr.astype(int) - img.astype(int)).max() <= 4


def test_jpeg_rgb_444_roundtrip():
    rng = np.random.default_rng(43)
    img = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    arr, maxval = decode_jpeg(encode_jpeg(img))
    assert maxval == 255 and arr.shape == (24, 31, 3)
    err = np.abs(arr.astype(int) - img.astype(int))
    # color transform round-trip adds ~1 digit of rounding on top of DCT
    assert err.max() <= 6 and err.mean() < 1.5


def test_jpeg_rgb_420_constant_chroma_exactish():
    """4:2:0: box-subsampled chroma is lossy in general, so pin it with a
    constant-chroma image where subsample→nearest-upsample is the identity."""
    rng = np.random.default_rng(47)
    y = rng.integers(40, 216, (21, 18), dtype=np.uint8)
    img = np.stack([y, y, y], axis=-1)  # gray content → constant chroma
    arr, _ = decode_jpeg(encode_jpeg(img, subsample=True))
    assert arr.shape == (21, 18, 3)
    assert np.abs(arr.astype(int) - img.astype(int)).max() <= 6
    # structured color: still close on 2x2-constant color fields
    c = np.zeros((16, 16, 3), np.uint8)
    c[:8] = [200, 30, 60]
    c[8:] = [20, 140, 220]
    arr, _ = decode_jpeg(encode_jpeg(c, subsample=True))
    assert np.abs(arr.astype(int) - c.astype(int)).max() <= 6


def test_jpeg_restart_markers():
    rng = np.random.default_rng(53)
    img = rng.integers(0, 256, (40, 40), dtype=np.uint8)
    plain, _ = decode_jpeg(encode_jpeg(img))
    for dri in (1, 2, 7):
        arr, _ = decode_jpeg(encode_jpeg(img, restart=dri))
        assert np.array_equal(arr, plain), dri
    rgb = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    a1, _ = decode_jpeg(encode_jpeg(rgb, subsample=True, restart=3))
    a0, _ = decode_jpeg(encode_jpeg(rgb, subsample=True))
    assert np.array_equal(a0, a1)


def test_jpeg_rejects_nonbaseline_and_garbage():
    img = np.zeros((8, 8), dtype=np.uint8)
    good = bytearray(encode_jpeg(img))
    # flip SOF0 → SOF2 (progressive)
    i = good.index(bytes([0xFF, 0xC0]))
    prog = bytes(good[:i]) + bytes([0xFF, 0xC2]) + bytes(good[i + 2 :])
    with pytest.raises(UnsupportedMediaError):
        decode_jpeg(prog)
    with pytest.raises(UnsupportedMediaError):
        decode_jpeg(b"\xff\xd8\xff" + b"\x00" * 16)
    with pytest.raises(UnsupportedMediaError):
        decode_jpeg(bytes(good[:40]))  # truncated mid-segment
    # hostile dims: 65535x65535 declared
    import struct as _s

    j = good.index(bytes([0xFF, 0xC0]))
    bad = bytearray(good)
    bad[j + 5 : j + 9] = _s.pack(">HH", 65535, 65535)
    with pytest.raises(UnsupportedMediaError):
        decode_jpeg(bytes(bad))


def test_jpeg_feeds_builtin_decoder():
    from mitie_spark.operators.media_codecs import (
        FEATURE_DIM,
        builtin_decoder,
        image_feature,
        sniff_kind,
    )

    rng = np.random.default_rng(59)
    img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    payload = encode_jpeg(img)
    assert sniff_kind(payload) == "jpeg"
    feat = builtin_decoder(payload)
    assert feat.shape == (FEATURE_DIM,)
    ref = image_feature(decode_jpeg(payload)[0])
    assert np.array_equal(feat, ref)


def test_jpeg_decode_image_no_fake_needed():
    """The multimodal path must now decode real JPEG without PIL and
    without the deterministic fake."""
    from mitie_spark.operators.multimodal import decode_image, fake_decode

    rng = np.random.default_rng(61)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    payload = encode_jpeg(img)
    feat = decode_image(payload, deterministic_fake=False)
    assert feat.shape == (64,)
    assert not np.array_equal(feat, fake_decode(payload))
