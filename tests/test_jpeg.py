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

# 12-bit variants (T.81 Tables F.1/F.2): 16 DC categories at code length
# 5; all 226 AC run/size symbols (magnitudes 1..14) at code length 8
_DC12_COUNTS = bytes([0, 0, 0, 0, 16] + [0] * 11)
_DC12_VALUES = bytes(range(16))
_AC12_SYMBOLS = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 15)]
_AC12_COUNTS = bytes([0] * 7 + [len(_AC12_SYMBOLS)] + [0] * 8)
_AC12_VALUES = bytes(_AC12_SYMBOLS)


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


def _encode_block(w, blk, pred, dc_codes, ac_codes, shift=128.0):
    """blk: 8x8 float pixels (already level-shifted NOT applied)."""
    f = _A @ (blk - shift) @ _A.T
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


def encode_jpeg(img, subsample=False, restart=0, rgb_direct=False, precision=8):
    """Scalar baseline encoder: (H,W) gray or (H,W,3) RGB uint8 → JFIF
    bytes. All-ones quant tables; 4:4:4 or (subsample=True) 4:2:0.
    rgb_direct=True stores the RGB planes untransformed and declares it
    via an Adobe APP14 transform=0 segment. precision=12 emits an
    extended-sequential (SOF1) frame over uint16 samples 0..4095 with the
    widened Huffman category tables."""
    import struct

    shift = float(1 << (precision - 1))
    img = np.asarray(img)
    H, W = img.shape[:2]
    gray = img.ndim == 2
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    elif rgb_direct:
        assert not subsample
        planes = [img[..., i].astype(np.float64) for i in range(3)]
        samp = [(1, 1), (1, 1), (1, 1)]
    else:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = shift - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = shift + 0.5 * r - 0.418688 * g - 0.081312 * b
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

    if precision == 8:
        dc_counts, dc_values = _DC_COUNTS, _DC_VALUES
        ac_counts, ac_values = _AC_COUNTS, _AC_VALUES
        sof_marker = 0xC0
    else:
        dc_counts, dc_values = _DC12_COUNTS, _DC12_VALUES
        ac_counts, ac_values = _AC12_COUNTS, _AC12_VALUES
        sof_marker = 0xC1  # extended sequential
    dc_codes = _huff_codes(dc_counts, dc_values)
    ac_codes = _huff_codes(ac_counts, ac_values)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    if rgb_direct:
        # Adobe APP14, transform byte 0 = no color transform (RGB planes)
        out += _seg(0xEE, b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 0]))
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # quant table 0, all ones
    out += _seg(0xDB, bytes([0x01]) + bytes([1] * 64))  # quant table 1
    ncomp = 1 if gray else 3
    sof = bytes([precision]) + struct.pack(">HH", H, W) + bytes([ncomp])
    for i, (h, v) in enumerate(samp):
        sof += bytes([i + 1, (h << 4) | v, 0 if i == 0 else 1])
    out += _seg(sof_marker, sof)
    # one DC + one AC table shared via two ids (exercises table selection)
    out += _seg(0xC4, bytes([0x00]) + dc_counts + dc_values)
    out += _seg(0xC4, bytes([0x10]) + ac_counts + ac_values)
    out += _seg(0xC4, bytes([0x01]) + dc_counts + dc_values)
    out += _seg(0xC4, bytes([0x11]) + ac_counts + ac_values)
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
                    preds[ci] = _encode_block(
                        w, blk, preds[ci], dc_codes, ac_codes, shift=shift
                    )
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


def test_jpeg_adobe_rgb_no_color_transform():
    """APP14 Adobe transform=0 declares direct-RGB planes: the decoder
    must skip the YCbCr transform (ADVICE r4: those files previously
    decoded with wrong colors)."""
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    data = encode_jpeg(img, rgb_direct=True)
    out, scale = decode_jpeg(data)
    assert scale == 255 and out.shape == img.shape
    # all-ones quant: IDCT(DCT(x)) rounds back within 1
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1
    # and a YCbCr-encoded twin of the same image decodes to ~the same
    # pixels (sanity that the two paths are actually different transforms)
    out2, _ = decode_jpeg(encode_jpeg(img))
    assert int(np.abs(out2.astype(int) - img.astype(int)).max()) <= 3


def test_jpeg_hostile_ac_category_rejected():
    """AC magnitude category s>10 is illegal in 8-bit baseline (T.81
    Table F.2); a hostile Huffman table emitting s=11 must raise
    UnsupportedMediaError instead of wrapping int32 coefficients
    (ADVICE r4)."""
    import struct

    # minimal 8x8 gray: custom AC table whose only value is 0x0B (r=0,s=11)
    ac_counts = bytes([0, 1] + [0] * 14)  # one 2-bit code
    ac_values = bytes([0x0B])
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    out += _seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    out += _seg(0xC4, bytes([0x00]) + _DC_COUNTS + _DC_VALUES)
    out += _seg(0xC4, bytes([0x10]) + ac_counts + ac_values)
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    w = _BitWriter()
    dc_codes = _huff_codes(_DC_COUNTS, _DC_VALUES)
    ln, code = dc_codes[0]
    w.put(ln, code)          # DC category 0 (diff = 0)
    w.put(2, 0b00)           # the hostile AC code → s=11
    w.put(11, 0)             # its 11 magnitude bits
    out += w.flush() + b"\xff\xd9"
    with pytest.raises(UnsupportedMediaError, match="AC category"):
        decode_jpeg(bytes(out))


def test_jpeg_truncated_bodies_fail_fast():
    """Truncated SOF0/SOS/DRI bodies raise UnsupportedMediaError from
    decode_jpeg itself, not struct.error/IndexError (ADVICE r4: direct
    callers previously saw raw parse exceptions)."""
    import struct

    valid_prefix = bytearray(b"\xff\xd8")
    valid_prefix += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))

    # SOF0 body shorter than the fixed header
    bad_sof = bytes(valid_prefix) + _seg(0xC0, b"\x08\x00")
    with pytest.raises(UnsupportedMediaError, match="SOF"):
        decode_jpeg(bad_sof)

    # SOF0 declares 3 components but carries none
    bad_sof2 = bytes(valid_prefix) + _seg(
        0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([3]))
    with pytest.raises(UnsupportedMediaError, match="SOF"):
        decode_jpeg(bad_sof2)

    good_sof = bytes(valid_prefix) + _seg(
        0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))

    # empty SOS body
    with pytest.raises(UnsupportedMediaError, match="SOS"):
        decode_jpeg(good_sof + _seg(0xDA, b""))

    # SOS declares 3 selectors but carries one byte
    with pytest.raises(UnsupportedMediaError, match="SOS"):
        decode_jpeg(good_sof + _seg(0xDA, bytes([3, 1, 0])))

    # DRI with a 1-byte body
    with pytest.raises(UnsupportedMediaError, match="DRI"):
        decode_jpeg(good_sof + _seg(0xDD, b"\x01"))


# --------------------------------------------------------------------------
# independent progressive (SOF2) encoder — spectral selection + successive
# approximation per T.81 §G.1.2.2/G.1.2.3, used to golden-test the
# decoder's four progressive scan paths (DC first/refine, AC first/refine,
# EOBn runs, ZRL-with-correction-bits)
# --------------------------------------------------------------------------

# the standard-style AC table lacks EOBn symbols for runs > 1; progressive
# needs (r<<4)|0 for r = 1..14 — same all-8-bit-codes geometry
_ACP_SYMBOLS = _AC_SYMBOLS + [(r << 4) for r in range(1, 15)]
_ACP_COUNTS = bytes([0] * 7 + [len(_ACP_SYMBOLS)] + [0] * 8)
_ACP_VALUES = bytes(_ACP_SYMBOLS)

# 12-bit progressive: the widened AC table plus the EOBn run symbols
_ACP12_SYMBOLS = _AC12_SYMBOLS + [(r << 4) for r in range(1, 15)]
_ACP12_COUNTS = bytes([0] * 7 + [len(_ACP12_SYMBOLS)] + [0] * 8)
_ACP12_VALUES = bytes(_ACP12_SYMBOLS)


def _coef_blocks(img, precision=8):
    """→ (H, W, per-component [zigzag-coefficient blocks in raster order]).
    Gray or RGB 4:4:4, all-ones quant — the same coefficients the baseline
    encoder produces, so progressive and baseline decodes must be
    pixel-identical."""
    shift = float(1 << (precision - 1))
    img = np.asarray(img)
    H, W = img.shape[:2]
    if img.ndim == 2:
        planes = [img.astype(np.float64)]
    else:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            shift - 0.168736 * r - 0.331264 * g + 0.5 * b,
            shift + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    bh, bw = (H + 7) // 8, (W + 7) // 8
    comps = []
    for p in planes:
        pp = _pad_blocks(p, bh, bw)
        blocks = []
        for by in range(bh):
            for bx in range(bw):
                f = _A @ (pp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - shift) @ _A.T
                q = np.round(f).astype(int)
                blocks.append([int(q.flat[i]) for i in _ZZ])
        comps.append(blocks)
    return H, W, bh, bw, comps


class _EobRun:
    """Pending EOBn run + (refinement) buffered correction bits."""

    def __init__(self, w, ac_codes):
        self.w, self.ac = w, ac_codes
        self.n = 0
        self.bits = []

    def add(self, corr_bits=()):
        self.n += 1
        self.bits.extend(corr_bits)
        if self.n == 0x4000:
            self.flush()

    def flush(self):
        if self.n == 0:
            return
        r = self.n.bit_length() - 1
        ln, code = self.ac[r << 4]
        self.w.put(ln, code)
        if r:
            self.w.put(r, self.n - (1 << r))
        for b in self.bits:
            self.w.put(1, b)
        self.n = 0
        self.bits = []


def _w_dc_first(w, comps, al, dc_codes):
    preds = [0] * len(comps)
    for m in range(len(comps[0])):
        for ci, blocks in enumerate(comps):
            v = blocks[m][0] >> al
            diff = v - preds[ci]
            preds[ci] = v
            t = _category(diff)
            ln, code = dc_codes[t]
            w.put(ln, code)
            w.put(t, _enc_value(diff, t))


def _w_dc_refine(w, comps, al):
    for m in range(len(comps[0])):
        for blocks in comps:
            w.put(1, (blocks[m][0] >> al) & 1)


def _w_ac_first(w, blocks, ss, se, al, ac_codes):
    eob = _EobRun(w, ac_codes)
    for zz in blocks:
        v = [
            (1 if zz[k] > 0 else -1) * ((zz[k] if zz[k] > 0 else -zz[k]) >> al)
            for k in range(ss, se + 1)
        ]
        last = max((i for i, x in enumerate(v) if x), default=-1)
        if last < 0:
            eob.add()
            continue
        eob.flush()
        run = 0
        for i in range(last + 1):
            if v[i] == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_codes[0xF0]
                w.put(ln, code)
                run -= 16
            s = _category(v[i])
            ln, code = ac_codes[(run << 4) | s]
            w.put(ln, code)
            w.put(s, _enc_value(v[i], s))
            run = 0
        if last < se - ss:
            eob.add()
    eob.flush()


def _w_ac_refine(w, blocks, ss, se, al, ac_codes):
    eob = _EobRun(w, ac_codes)
    for zz in blocks:
        t = [(zz[k] if zz[k] > 0 else -zz[k]) >> al for k in range(ss, se + 1)]
        sgn = [1 if zz[k] > 0 else 0 for k in range(ss, se + 1)]
        # positions with t==1 become nonzero IN THIS PASS; t>1 already were
        last_new = max((i for i, x in enumerate(t) if x == 1), default=-1)
        if last_new < 0:
            eob.add([x & 1 for x in t if x > 1])
            continue
        eob.flush()
        run = 0
        br = []
        for i in range(last_new + 1):
            if t[i] == 0:
                run += 1
                continue
            if t[i] > 1:
                br.append(t[i] & 1)
                continue
            while run > 15:
                ln, code = ac_codes[0xF0]
                w.put(ln, code)
                for b_ in br:
                    w.put(1, b_)
                br = []
                run -= 16
            ln, code = ac_codes[(run << 4) | 1]
            w.put(ln, code)
            w.put(1, sgn[i])
            for b_ in br:
                w.put(1, b_)
            br = []
            run = 0
        tail = [t[i] & 1 for i in range(last_new + 1, len(t)) if t[i] > 1]
        if last_new < len(t) - 1:
            eob.add(tail)
    eob.flush()


def encode_jpeg_progressive(img, precision=8):
    """Progressive 4:4:4 / gray encoder: DC first (Al=1) → AC first per
    band per component (Al=1) → AC refinements (→ Al=0) → DC refinement.
    precision=12 uses the widened category tables over uint16 samples."""
    import struct

    H, W, bh, bw, comps = _coef_blocks(img, precision=precision)
    nc = len(comps)
    if precision == 8:
        dcc, dcv, acc, acv = _DC_COUNTS, _DC_VALUES, _ACP_COUNTS, _ACP_VALUES
    else:
        dcc, dcv, acc, acv = (
            _DC12_COUNTS, _DC12_VALUES, _ACP12_COUNTS, _ACP12_VALUES,
        )
    dc_codes = _huff_codes(dcc, dcv)
    ac_codes = _huff_codes(acc, acv)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    out += _seg(0xDB, bytes([0x01]) + bytes([1] * 64))
    sof = bytes([precision]) + struct.pack(">HH", H, W) + bytes([nc])
    for i in range(nc):
        sof += bytes([i + 1, 0x11, 0 if i == 0 else 1])
    out += _seg(0xC2, sof)  # SOF2
    out += _seg(0xC4, bytes([0x00]) + dcc + dcv)
    out += _seg(0xC4, bytes([0x10]) + acc + acv)

    def sos(sel_ids, ss, se, ah, al):
        body = bytes([len(sel_ids)])
        for cid in sel_ids:
            body += bytes([cid, 0x00 if ss == 0 else 0x10])
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    def scan(header, writer):
        nonlocal out
        out += header
        w = _BitWriter()
        writer(w)
        out += w.flush()

    all_ids = list(range(1, nc + 1))
    scan(sos(all_ids, 0, 0, 0, 1), lambda w: _w_dc_first(w, comps, 1, dc_codes))
    for ci in range(nc):
        scan(sos([ci + 1], 1, 5, 0, 1),
             lambda w, b=comps[ci]: _w_ac_first(w, b, 1, 5, 1, ac_codes))
        scan(sos([ci + 1], 6, 63, 0, 1),
             lambda w, b=comps[ci]: _w_ac_first(w, b, 6, 63, 1, ac_codes))
    for ci in range(nc):
        scan(sos([ci + 1], 1, 5, 1, 0),
             lambda w, b=comps[ci]: _w_ac_refine(w, b, 1, 5, 0, ac_codes))
        scan(sos([ci + 1], 6, 63, 1, 0),
             lambda w, b=comps[ci]: _w_ac_refine(w, b, 6, 63, 0, ac_codes))
    scan(sos(all_ids, 0, 0, 1, 0), lambda w: _w_dc_refine(w, comps, 0))
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_progressive_matches_baseline_gray():
    """Progressive decode must be pixel-identical to the baseline decode of
    the same coefficients (same all-ones quant, same DCT)."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 17), dtype=np.uint8)
    base, _ = decode_jpeg(encode_jpeg(img))
    prog, scale = decode_jpeg(encode_jpeg_progressive(img))
    assert scale == 255
    assert prog.shape == base.shape
    assert np.array_equal(prog, base)


def test_jpeg_progressive_matches_baseline_rgb():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, size=(19, 26, 3), dtype=np.uint8)
    base, _ = decode_jpeg(encode_jpeg(img))
    prog, _ = decode_jpeg(encode_jpeg_progressive(img))
    assert np.array_equal(prog, base)


def test_jpeg_progressive_smooth_and_sparse():
    """A smooth gradient (long EOB runs, sparse AC) and a constant image
    (everything EOB) — the EOBn paths."""
    x = np.linspace(0, 255, 40)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    base, _ = decode_jpeg(encode_jpeg(img))
    prog, _ = decode_jpeg(encode_jpeg_progressive(img))
    assert np.array_equal(prog, base)

    const = np.full((16, 16), 131, dtype=np.uint8)
    base, _ = decode_jpeg(encode_jpeg(const))
    prog, _ = decode_jpeg(encode_jpeg_progressive(const))
    assert np.array_equal(prog, base)


# --------------------------------------------------------------------------
# 12-bit extended sequential (SOF1) — widened category bounds, uint16 path
# --------------------------------------------------------------------------


def test_jpeg12_constant_image_known_answer():
    """Constant 12-bit gray: pins the 2048 level shift and the uint16
    clamp; level 4095 drives DC diff 16376 → category 15 (the widened
    T.81 Table F.1 bound) through both engines."""
    for level in (0, 1234, 2048, 3000, 4095):
        img = np.full((16, 24), level, dtype=np.uint16)
        arr, maxval = decode_jpeg(encode_jpeg(img, precision=12))
        assert maxval == 4095 and arr.dtype == np.uint16
        assert np.array_equal(arr, img), level


def test_jpeg12_gray_roundtrip_near_exact():
    rng = np.random.default_rng(61)
    for H, W in [(8, 8), (17, 23), (5, 100)]:
        img = rng.integers(0, 4096, (H, W)).astype(np.uint16)
        arr, maxval = decode_jpeg(encode_jpeg(img, precision=12))
        assert maxval == 4095 and arr.shape == (H, W)
        err = np.abs(arr.astype(int) - img.astype(int))
        # all-ones quant: only coefficient rounding, same absolute bound
        # in sample units as the 8-bit suite
        assert err.max() <= 4 and err.mean() < 1.0, (H, W, err.max())


def test_jpeg12_rgb_roundtrip_and_restarts():
    rng = np.random.default_rng(67)
    img = rng.integers(0, 4096, (24, 31, 3)).astype(np.uint16)
    arr, maxval = decode_jpeg(encode_jpeg(img, precision=12))
    assert maxval == 4095 and arr.shape == (24, 31, 3)
    err = np.abs(arr.astype(int) - img.astype(int))
    assert err.max() <= 8 and err.mean() < 2.0
    # restart markers reset the (12-bit-sized) DC predictors identically
    a1, _ = decode_jpeg(encode_jpeg(img, precision=12, restart=2))
    assert np.array_equal(arr, a1)


def test_jpeg_sof1_8bit_equals_sof0():
    """Extended sequential at 8-bit is the same scan procedure; flipping
    the marker must not change a pixel."""
    rng = np.random.default_rng(71)
    img = rng.integers(0, 256, (19, 21), dtype=np.uint8)
    payload = bytearray(encode_jpeg(img))
    base, _ = decode_jpeg(bytes(payload))
    i = payload.index(bytes([0xFF, 0xC0]))
    payload[i + 1] = 0xC1
    ext, maxval = decode_jpeg(bytes(payload))
    assert maxval == 255
    assert np.array_equal(base, ext)


def test_jpeg_sof0_rejects_12bit_precision():
    """Baseline is 8-bit only (T.81 §B.2.2): a 12-bit frame mislabeled
    SOF0 must route to the seam, not decode with wrong bounds."""
    img = np.full((8, 8), 100, dtype=np.uint16)
    payload = bytearray(encode_jpeg(img, precision=12))
    i = payload.index(bytes([0xFF, 0xC1]))
    payload[i + 1] = 0xC0
    with pytest.raises(UnsupportedMediaError, match="precision"):
        decode_jpeg(bytes(payload))


def test_jpeg12_feature_scale_matches_8bit():
    """builtin_decoder scales by the header maxval: the same image at
    8- and 12-bit precision must produce (nearly) the same feature."""
    from mitie_spark.operators.media_codecs import builtin_decoder

    rng = np.random.default_rng(73)
    img8 = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    img12 = ((img8.astype(np.uint32) * 4095 + 127) // 255).astype(np.uint16)
    f8 = builtin_decoder(encode_jpeg(img8))
    f12 = builtin_decoder(encode_jpeg(img12, precision=12))
    assert f12.dtype == np.float32
    np.testing.assert_allclose(f8, f12, atol=0.01)


def test_jpeg12_progressive_matches_sequential():
    """12-bit progressive (SOF2, precision 12): all four scan paths at the
    widened category bounds must reproduce the sequential decode exactly
    (same coefficients, same all-ones quant)."""
    rng = np.random.default_rng(79)
    for shape in [(24, 17), (19, 18, 3)]:
        img = rng.integers(0, 4096, shape).astype(np.uint16)
        seq, _ = decode_jpeg(encode_jpeg(img, precision=12))
        prog, maxval = decode_jpeg(encode_jpeg_progressive(img, precision=12))
        assert maxval == 4095 and prog.dtype == np.uint16
        assert np.array_equal(prog, seq), shape


# --------------------------------------------------------------------------
# lossless (SOF3, T.81 Annex H) — bit-exact roundtrips by construction
# --------------------------------------------------------------------------

# 17 lossless difference categories (0..16), all at code length 5
_DC_LL_COUNTS = bytes([0, 0, 0, 0, 17] + [0] * 11)
_DC_LL_VALUES = bytes(range(17))


def encode_jpeg_lossless(img, precision, predictor=1, pt=0, restart=0):
    """Scalar lossless (SOF3) encoder from T.81 Annex H: per-sample
    prediction difference mod 2^16 coded as category + appended bits
    through one DC-class Huffman table (category 16 = the special 32768
    difference, no appended bits). Gray or 3-component, 1x1 sampling,
    interleaved. Point transform stores img >> pt."""
    import struct

    img = np.asarray(img)
    H, W = img.shape[:2]
    ncomp = 1 if img.ndim == 2 else img.shape[2]
    planes = [
        (img if img.ndim == 2 else img[..., i]).astype(np.int64) >> pt
        for i in range(ncomp)
    ]
    codes = _huff_codes(_DC_LL_COUNTS, _DC_LL_VALUES)

    out = bytearray(b"\xff\xd8")
    sof = bytes([precision]) + struct.pack(">HH", H, W) + bytes([ncomp])
    for i in range(ncomp):
        sof += bytes([i + 1, 0x11, 0])
    out += _seg(0xC3, sof)
    out += _seg(0xC4, bytes([0x00]) + _DC_LL_COUNTS + _DC_LL_VALUES)
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])
    sos += bytes([predictor, 0, pt])
    out += _seg(0xDA, sos)

    default = 1 << (precision - 1 - pt)
    w = _BitWriter()
    fresh = [True] * ncomp
    rst = 0
    for k in range(H * W):
        y, x = divmod(k, W)
        if restart and k and k % restart == 0:
            out += w.flush()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            w = _BitWriter()
            fresh = [True] * ncomp
        for ci, p in enumerate(planes):
            if fresh[ci]:
                px = default
                fresh[ci] = False
            elif y == 0:
                px = int(p[0, x - 1])
            elif x == 0:
                px = int(p[y - 1, 0])
            else:
                a, b, c = int(p[y, x - 1]), int(p[y - 1, x]), int(p[y - 1, x - 1])
                px = [
                    None, a, b, c, a + b - c,
                    a + ((b - c) >> 1), b + ((a - c) >> 1), (a + b) >> 1,
                ][predictor]
            d = (int(p[y, x]) - px) & 0xFFFF
            if d == 32768:
                ln, code = codes[16]
                w.put(ln, code)
                continue
            if d > 32768:
                d -= 65536
            t = _category(d)
            ln, code = codes[t]
            w.put(ln, code)
            if t:
                w.put(t, _enc_value(d, t))
    out += w.flush()
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_lossless_all_predictors_bit_exact():
    """Lossless is lossless: every predictor 1-7 must roundtrip random
    8-bit gray exactly."""
    rng = np.random.default_rng(83)
    img = rng.integers(0, 256, (14, 19), dtype=np.uint8)
    for pred in range(1, 8):
        arr, maxval = decode_jpeg(encode_jpeg_lossless(img, 8, predictor=pred))
        assert maxval == 255 and arr.dtype == np.uint8
        assert np.array_equal(arr, img), pred


def test_jpeg_lossless_16bit_and_category16():
    rng = np.random.default_rng(89)
    img = rng.integers(0, 65536, (9, 13), dtype=np.uint16)
    arr, maxval = decode_jpeg(encode_jpeg_lossless(img, 16, predictor=4))
    assert maxval == 65535 and arr.dtype == np.uint16
    assert np.array_equal(arr, img)
    # the special 32768 difference (category 16, no appended bits)
    img = np.array([[0, 32768], [65535, 32767]], dtype=np.uint16)
    arr, _ = decode_jpeg(encode_jpeg_lossless(img, 16, predictor=1))
    assert np.array_equal(arr, img)


def test_jpeg_lossless_rgb_is_raw_planes():
    """T.81 defines no color transform for lossless: a 3-component SOF3
    frame decodes as raw planes, NOT YCbCr."""
    rng = np.random.default_rng(97)
    img = rng.integers(0, 256, (6, 7, 3), dtype=np.uint8)
    arr, maxval = decode_jpeg(encode_jpeg_lossless(img, 8, predictor=7))
    assert maxval == 255
    assert np.array_equal(arr, img)


def test_jpeg_lossless_point_transform_and_restarts():
    rng = np.random.default_rng(101)
    # low pt bits zero so Rx << Pt reconstructs exactly
    img = (rng.integers(0, 64, (11, 8), dtype=np.uint8) << 2).astype(np.uint8)
    arr, maxval = decode_jpeg(encode_jpeg_lossless(img, 8, predictor=5, pt=2))
    assert maxval == 255
    assert np.array_equal(arr, img)
    # restart markers reset predictions to the default on both sides
    img = rng.integers(0, 4096, (10, 10), dtype=np.uint16)
    base, _ = decode_jpeg(encode_jpeg_lossless(img, 12, predictor=6))
    rst, maxval = decode_jpeg(encode_jpeg_lossless(img, 12, predictor=6, restart=17))
    assert maxval == 4095
    assert np.array_equal(rst, base) and np.array_equal(base, img)


def test_jpeg_lossless_feeds_builtin_decoder():
    from mitie_spark.operators.media_codecs import builtin_decoder

    rng = np.random.default_rng(103)
    img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    f_ll = builtin_decoder(encode_jpeg_lossless(img, 8, predictor=2))
    f_png = builtin_decoder(__import__(
        "mitie_spark.operators.media_codecs", fromlist=["encode_png"]
    ).encode_png(img))
    np.testing.assert_allclose(f_ll, f_png, atol=1e-6)


def test_jpeg_lossless_rejects_bad_scan_params():
    img = np.zeros((4, 4), dtype=np.uint8)
    payload = bytearray(encode_jpeg_lossless(img, 8, predictor=1))
    i = payload.index(bytes([0xFF, 0xDA]))
    # Ss=0 (no predictor) is invalid for lossless
    payload[i + 7] = 0  # FF DA len(2) [ncomp cid tsel Ss ...]: Ss at +7
    with pytest.raises(UnsupportedMediaError, match="lossless"):
        decode_jpeg(bytes(payload))


# --------------------------------------------------------------------------
# hierarchical mode (T.81 Annex J): DHP + a non-differential first frame +
# EXP-expanded SOF5/SOF6 differential correction frames. The encoder below
# mirrors the decoder's clamped-reference reconstruction (the standard
# requires the encoder to track the decoder's state), so with all-ones
# quant the only loss is per-level coefficient rounding.
# --------------------------------------------------------------------------


def _exp_up_ref(p):
    """Independent restatement of T.81 J.1.1.2 (both axes): even output
    samples copy the input, odd ones are the rounded mean of the two
    neighbors, the last row/column replicates the edge."""
    h, w = p.shape
    a = np.empty((h, 2 * w), dtype=np.int64)
    a[:, 0::2] = p
    if w > 1:
        a[:, 1:-1:2] = (p[:, :-1] + p[:, 1:] + 1) >> 1
    a[:, -1] = p[:, -1]
    b = np.empty((2 * h, 2 * w), dtype=np.int64)
    b[0::2] = a
    if h > 1:
        b[1:-1:2] = (a[:-1] + a[1:] + 1) >> 1
    b[-1] = a[-1]
    return b


def _box2(p):
    hh, ww = p.shape
    pp = np.pad(p, ((0, hh % 2), (0, ww % 2)), mode="edge")
    return (pp[0::2, 0::2] + pp[1::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 1::2]) / 4.0


def _frame_coef_blocks(planes, h, w, shift):
    """→ (zigzag coefficient blocks in raster order, decoder-side spatial
    reconstruction of those blocks — IDCT of the rounded coefficients, no
    level shift) per component, all-ones quant."""
    bh, bw = (h + 7) // 8, (w + 7) // 8
    comps, recon = [], []
    for p in planes:
        pp = _pad_blocks(p, bh, bw)
        blocks = []
        rec = np.zeros((bh * 8, bw * 8))
        for by in range(bh):
            for bx in range(bw):
                blk = pp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                q = np.round(_A @ (blk - shift) @ _A.T).astype(int)
                blocks.append([int(q.flat[i]) for i in _ZZ])
                rec[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = _A.T @ q @ _A
        comps.append(blocks)
        recon.append(rec[:h, :w])
    return comps, recon


def _w_seq_scan(w, comps, dc_codes, ac_codes, dpcm):
    """Sequential interleaved scan over precomputed raster blocks;
    dpcm=False codes every DC against a zero prediction (the differential-
    frame rule of Annex J)."""
    preds = [0] * len(comps)
    for m in range(len(comps[0])):
        for ci, blocks in enumerate(comps):
            zz = blocks[m]
            diff = zz[0] - (preds[ci] if dpcm else 0)
            if dpcm:
                preds[ci] = zz[0]
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


def encode_jpeg_hierarchical(img, levels=3, progressive_diff=False,
                             zero_diff=False):
    """Independent hierarchical encoder: DHP, a non-differential SOF0
    frame at 1/2^(levels-1) resolution, then EXP'd differential frames —
    SOF5 sequential, or SOF6 progressive (DC scan + one full AC band scan
    per component) with progressive_diff=True. Differential frames use the
    widened 12-bit category tables (difference images span twice the
    source range). zero_diff=True writes all-zero differential frames so
    the decode must equal the EXP-expanded first-frame reconstruction
    exactly. → (payload bytes, expected decoder output planes int64)."""
    import struct

    img = np.asarray(img)
    H, W = img.shape[:2]
    nc = 1 if img.ndim == 2 else 3
    if nc == 1:
        full = [img.astype(np.float64)]
    else:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        full = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    pyramid = [full]
    for _ in range(levels - 1):
        pyramid.append([_box2(p) for p in pyramid[-1]])
    pyramid = pyramid[::-1]  # coarsest first

    dc8 = _huff_codes(_DC_COUNTS, _DC_VALUES)
    ac8 = _huff_codes(_AC_COUNTS, _AC_VALUES)
    dc12 = _huff_codes(_DC12_COUNTS, _DC12_VALUES)
    acc, acv = (
        (_ACP12_COUNTS, _ACP12_VALUES)  # EOBn symbols for the AC band scan
        if progressive_diff
        else (_AC12_COUNTS, _AC12_VALUES)
    )
    ac12 = _huff_codes(acc, acv)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    dhp = bytes([8]) + struct.pack(">HH", H, W) + bytes([nc])
    for i in range(nc):
        dhp += bytes([i + 1, 0x11, 0])
    out += _seg(0xDE, dhp)

    ref = None  # decoder-mirrored reference planes (int64, clamped)
    for li, planes in enumerate(pyramid):
        h, w = planes[0].shape
        first = li == 0
        if not first:
            ref = [_exp_up_ref(p)[:h, :w] for p in ref]
            planes = (
                [np.zeros((h, w)) for _ in planes]
                if zero_diff
                else [p - r for p, r in zip(planes, ref)]
            )
        comps, recon = _frame_coef_blocks(planes, h, w, 128.0 if first else 0.0)
        if first:
            ref = [
                np.clip(np.round(rc) + 128, 0, 255).astype(np.int64)
                for rc in recon
            ]
        else:
            ref = [
                np.clip(np.round(rc).astype(np.int64) + r, 0, 255)
                for rc, r in zip(recon, ref)
            ]
        if first:
            marker = 0xC0
            dcc, dcv, acc2, acv2 = _DC_COUNTS, _DC_VALUES, _AC_COUNTS, _AC_VALUES
            dc_codes, ac_codes = dc8, ac8
        else:
            marker = 0xC6 if progressive_diff else 0xC5
            dcc, dcv, acc2, acv2 = _DC12_COUNTS, _DC12_VALUES, acc, acv
            dc_codes, ac_codes = dc12, ac12
            out += _seg(0xDF, bytes([0x11]))  # EXP: expand both axes
        sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
        for i in range(nc):
            sof += bytes([i + 1, 0x11, 0])
        out += _seg(marker, sof)
        out += _seg(0xC4, bytes([0x00]) + dcc + dcv)
        out += _seg(0xC4, bytes([0x10]) + acc2 + acv2)
        if first or not progressive_diff:
            sos = bytes([nc])
            for i in range(nc):
                sos += bytes([i + 1, 0x00])
            out += _seg(0xDA, sos + bytes([0, 63, 0]))
            bw_ = _BitWriter()
            _w_seq_scan(bw_, comps, dc_codes, ac_codes, dpcm=first)
            out += bw_.flush()
        else:
            # SOF6: interleaved DC scan with zero prediction, then one
            # full-band AC first scan per component
            sos = bytes([nc])
            for i in range(nc):
                sos += bytes([i + 1, 0x00])
            out += _seg(0xDA, sos + bytes([0, 0, 0]))
            bw_ = _BitWriter()
            for m in range(len(comps[0])):
                for blocks in comps:
                    v = blocks[m][0]
                    t = _category(v)
                    ln, code = dc_codes[t]
                    bw_.put(ln, code)
                    bw_.put(t, _enc_value(v, t))
            out += bw_.flush()
            for ci in range(nc):
                out += _seg(0xDA, bytes([1, ci + 1, 0x10, 1, 63, 0]))
                bw_ = _BitWriter()
                _w_ac_first(bw_, comps[ci], 1, 63, 0, ac_codes)
                out += bw_.flush()
    out += b"\xff\xd9"
    return bytes(out), ref


def test_jpeg_hierarchical_constant_known_answer():
    """Constant gray: every level is DC-only and rounding-exact, so the
    hierarchical decode must reproduce the constant exactly."""
    img = np.full((19, 26), 147, dtype=np.uint8)
    payload, _ = encode_jpeg_hierarchical(img, levels=3)
    arr, maxval = decode_jpeg(payload)
    assert maxval == 255 and arr.shape == (19, 26)
    assert np.array_equal(arr, img)


def test_jpeg_hierarchical_gray_near_exact():
    """Final differential frame corrects the full-resolution residual, so
    the decode tracks the SOURCE within baseline rounding tolerance."""
    rng = np.random.default_rng(201)
    for H, W in [(16, 16), (21, 13), (40, 33)]:
        img = rng.integers(0, 256, (H, W), dtype=np.uint8)
        payload, ref = encode_jpeg_hierarchical(img, levels=3)
        arr, _ = decode_jpeg(payload)
        assert arr.shape == (H, W)
        err = np.abs(arr.astype(int) - img.astype(int))
        assert err.max() <= 4 and err.mean() < 1.0, (H, W, err.max())
        # and it must equal the encoder-mirrored reconstruction chain
        # (clamped reference + rounding) within the float ulp of two
        # different IDCT evaluation orders
        assert np.abs(arr.astype(np.int64) - ref[0]).max() <= 1


def test_jpeg_hierarchical_zero_diff_pins_exp_filter():
    """All-zero differential frames: the decode must be EXACTLY the
    J.1.1.2 expansion chain of the first frame's reconstruction — the
    first frame's pixels are recovered decoder-vs-decoder (a standalone
    SOF0 stream of the same coarse plane), so this pins the EXP filter
    and the clamped-reference accumulation bit-for-bit."""
    rng = np.random.default_rng(202)
    img = rng.integers(0, 256, (23, 17), dtype=np.uint8)
    payload, _ = encode_jpeg_hierarchical(img, levels=2, zero_diff=True)
    arr, _ = decode_jpeg(payload)
    # rebuild the first frame's reconstruction independently
    coarse = _box2(img.astype(np.float64))
    ch, cw = coarse.shape
    comps, recon = _frame_coef_blocks([coarse], ch, cw, 128.0)
    level0 = np.clip(np.round(recon[0]) + 128, 0, 255).astype(np.int64)
    expected = _exp_up_ref(level0)[:23, :17]
    assert np.array_equal(arr.astype(np.int64), expected)


def test_jpeg_hierarchical_rgb_and_progressive_diff():
    """RGB 4:4:4 through both differential frame types: SOF5 sequential
    and SOF6 progressive must land on the same pixels (same coefficients,
    different entropy layout) and track the source."""
    rng = np.random.default_rng(203)
    img = rng.integers(0, 256, (18, 25, 3), dtype=np.uint8)
    p_seq, _ = encode_jpeg_hierarchical(img, levels=2)
    p_prog, _ = encode_jpeg_hierarchical(img, levels=2, progressive_diff=True)
    a_seq, _ = decode_jpeg(p_seq)
    a_prog, _ = decode_jpeg(p_prog)
    assert a_seq.shape == (18, 25, 3)
    assert np.array_equal(a_seq, a_prog)
    err = np.abs(a_seq.astype(int) - img.astype(int))
    assert err.max() <= 6 and err.mean() < 1.5


def test_jpeg_hierarchical_feeds_builtin_decoder():
    from mitie_spark.operators.media_codecs import builtin_decoder

    img = np.full((16, 16), 64, dtype=np.uint8)
    payload, _ = encode_jpeg_hierarchical(img, levels=2)
    feats = builtin_decoder(payload)
    assert feats is not None


def test_jpeg_hierarchical_malformed_rejected():
    img = np.full((16, 16), 90, dtype=np.uint8)
    payload, _ = encode_jpeg_hierarchical(img, levels=2)

    # differential frame without a DHP header: drop DHP AND the first
    # (non-differential) frame so the stream leads with EXP+SOF5.
    # (Dropping only DHP leaves a well-formed single-frame stream — the
    # decoder stops at the first sequential frame's scan, as a baseline
    # decoder must.)
    i = payload.index(bytes([0xFF, 0xDE]))
    j = payload.index(bytes([0xFF, 0xDF]))
    no_dhp = payload[:i] + payload[j:]
    with pytest.raises(UnsupportedMediaError, match="without DHP"):
        decode_jpeg(no_dhp)

    # bad EXP expansion value
    j = payload.index(bytes([0xFF, 0xDF]))
    bad_exp = bytearray(payload)
    bad_exp[j + 4] = 0x22
    with pytest.raises(UnsupportedMediaError, match="EXP"):
        decode_jpeg(bytes(bad_exp))

    # DHP dims that don't match the final frame
    bad_dhp = bytearray(payload)
    bad_dhp[i + 5] += 1  # H low byte inside the DHP body
    with pytest.raises(UnsupportedMediaError, match="DHP"):
        decode_jpeg(bytes(bad_dhp))
