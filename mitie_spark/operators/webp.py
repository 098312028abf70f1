"""Pure-Python/NumPy WebP decoder: lossless (VP8L) here, lossy (VP8
key frames) via operators/vp8.py.

WebP is the single most common "modern" image payload in a current web
crawl; its lossless coding mode (VP8L) is a self-contained spec —
"WebP Lossless Bitstream Specification" (Google, public) — with no DCT
or arithmetic coding, so a bit-exact pure-Python decode is tractable the
same way GIF/PNG/TIFF were (operators/gif.py, media_codecs.py,
tiff.py). The reference engine (mit-nlp/MITIE) has no image path at
all — this module exists for the LLM-training-data mandate (multimodal
columns), not reference parity.

Coverage — the complete VP8L feature set:

- canonical prefix codes, both the 2-symbol "simple" form and the full
  code-length-coded form (incl. the 16/17/18 repeat semantics and the
  optional max-symbol length limit)
- color cache (hash 0x1e35a7bd, 1..11 bits)
- meta prefix codes (entropy image selecting per-tile code groups)
- LZ77 over the row-major pixel stream with the 120-entry 2-D distance
  map (spec §4.2.2; the table bytes below are the spec's, verified
  against libwebp's compiled copy)
- all four transforms, inverted in reverse stream order: predictor
  (14 modes with the exact C truncating-division semantics in mode 13),
  color (signed 3.5 fixed-point cross-channel deltas), subtract-green,
  and color indexing incl. sub-byte pixel bundling for ≤16-color
  palettes
- container walk: bare and VP8X-extended files; VP8L chunks decode
  here, lossy VP8 chunks through operators/vp8.py (bit-exact against
  libwebp incl. the RGBA conversion); animations and lossy-with-ALPH
  route to the injected-decoder seam via ``UnsupportedMediaError``

Design notes mirror the sibling decoders: the entropy-decode loop is
scalar Python by necessity (each symbol's prefix-code walk and the LZ77
copies are inherently sequential), per-payload failures raise
``UnsupportedMediaError`` (never a bare struct/index error), and
declared dimensions are capped before any allocation. The test suite
(tests/test_webp.py) cross-validates against the system libwebp via
ctypes where available: real-encoder bitstreams must decode to the
original pixels bit-for-bit.
"""

from __future__ import annotations

import struct

import numpy as np

from mitie_spark.operators.media_codecs import UnsupportedMediaError

_WEBP_MAX_PIXELS = 64 * 1024 * 1024

# Spec §4.2.2 distance-map table: plane codes 1..120 → (xoffset, yoffset)
# neighborhood offsets, packed one byte each as (yoffset << 4) | (8 - xoffset).
_DIST_MAP_HEX = (
    "1807171928062729161a262a38053739151b363a252b48044749141c353b464a"
    "242c58454b343c035759131d565a232d444c555b333d68026769121e666a222e"
    "545c434d656b323e78017779535d111f646c424e767a212f757b313f636d525e"
    "00747c414f1020626e30737d515f40727e616f50717f6070"
)
_DIST_MAP = [
    ((8 - (b & 0xF)), (b >> 4)) for b in bytes.fromhex(_DIST_MAP_HEX)
]

# code-length-code read order (spec §5.2.2)
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


class _BitReader:
    """LSB-first bit reader over the VP8L payload."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise UnsupportedMediaError("truncated VP8L stream")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return v


def _build_prefix(code_lengths: list[int]):
    """Canonical prefix code (DEFLATE convention: equal lengths ordered
    by symbol; stream bits walk the code MSB-first). Returns either
    ('single', symbol) for a 0-bit code or (lookup, max_len) where
    lookup maps (length, code) → symbol."""
    present = [(l, s) for s, l in enumerate(code_lengths) if l > 0]
    if not present:
        raise UnsupportedMediaError("empty VP8L prefix code")
    if len(present) == 1:
        return ("single", present[0][1])
    max_len = max(l for l, _ in present)
    if max_len > 15:
        raise UnsupportedMediaError("VP8L code length > 15")
    bl_count = [0] * (max_len + 1)
    for l, _ in present:
        bl_count[l] += 1
    # Kraft check: an over- or under-subscribed code is a corrupt stream
    total = 0
    for l in range(1, max_len + 1):
        total += bl_count[l] << (max_len - l)
    if total != (1 << max_len):
        raise UnsupportedMediaError("invalid VP8L prefix code (Kraft)")
    next_code = [0] * (max_len + 2)
    code = 0
    for l in range(1, max_len + 1):
        code = (code + bl_count[l - 1]) << 1
        next_code[l] = code
    lookup: dict[tuple[int, int], int] = {}
    for l, sym in sorted(present, key=lambda t: (t[0], t[1])):
        lookup[(l, next_code[l])] = sym
        next_code[l] += 1
    return (lookup, max_len)


def _read_symbol(br: _BitReader, tree) -> int:
    if tree[0] == "single":
        return tree[1]
    lookup, max_len = tree
    code = 0
    for length in range(1, max_len + 1):
        code = (code << 1) | br.read(1)
        sym = lookup.get((length, code))
        if sym is not None:
            return sym
    raise UnsupportedMediaError("invalid VP8L prefix-coded symbol")


def _read_prefix_code(br: _BitReader, alphabet_size: int):
    """One prefix code: simple (1-2 symbols) or code-length-coded."""
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        sym0 = br.read(8) if br.read(1) else br.read(1)
        lengths = [0] * alphabet_size
        if sym0 >= alphabet_size:
            raise UnsupportedMediaError("VP8L simple-code symbol out of range")
        if num_symbols == 2:
            sym1 = br.read(8)
            if sym1 >= alphabet_size or sym1 == sym0:
                raise UnsupportedMediaError("VP8L simple-code symbol out of range")
            lengths[sym0] = lengths[sym1] = 1
        else:
            lengths[sym0] = 1
        return _build_prefix(lengths)
    # normal: code lengths are themselves prefix-coded
    num_clc = 4 + br.read(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc_tree = _build_prefix(clc_lengths)
    if br.read(1):  # use a length limit
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = _read_symbol(br, clc_tree)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        else:
            slot = code_len - 16
            extra_bits = (2, 3, 7)[slot]
            repeat = (3, 3, 11)[slot] + br.read(extra_bits)
            if symbol + repeat > alphabet_size:
                raise UnsupportedMediaError("VP8L code-length repeat overflow")
            fill = prev_len if code_len == 16 else 0
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return _build_prefix(lengths)


def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _length_or_dist(br: _BitReader, prefix_code: int) -> int:
    if prefix_code < 4:
        return prefix_code + 1
    extra_bits = (prefix_code - 2) >> 1
    offset = (2 + (prefix_code & 1)) << extra_bits
    return offset + br.read(extra_bits) + 1


def _decode_image(br: _BitReader, xsize: int, ysize: int, level0: bool):
    """Decode one VP8L image stream (spec §5) to a flat uint32 ARGB list.
    level0 images may carry transforms (returned for inverse application)
    and meta prefix codes; sub-images carry neither."""
    transforms = []
    w = xsize
    if level0:
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise UnsupportedMediaError("duplicate VP8L transform")
            seen.add(ttype)
            if ttype in (0, 1):  # predictor / color
                bits = br.read(3) + 2
                tw = _subsample(w, bits)
                th = _subsample(ysize, bits)
                data, _ = _decode_image(br, tw, th, False)
                transforms.append((ttype, bits, w, data))
            elif ttype == 2:  # subtract green
                transforms.append((2, 0, w, None))
            else:  # color indexing
                num_colors = br.read(8) + 1
                bits = 0 if num_colors > 16 else 1 if num_colors > 4 else 2 if num_colors > 2 else 3
                pal_raw, _ = _decode_image(br, num_colors, 1, False)
                # palette entries are componentwise delta-coded
                palette = []
                prev = 0
                for p in pal_raw:
                    cur = 0
                    for shift in (0, 8, 16, 24):
                        cur |= (((p >> shift) + (prev >> shift)) & 0xFF) << shift
                    palette.append(cur)
                    prev = cur
                transforms.append((3, bits, w, palette))
                w = _subsample(w, bits)

    # color cache
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise UnsupportedMediaError(f"VP8L color cache bits {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0

    # meta prefix codes (level0 only)
    meta = None
    meta_bits = 0
    num_groups = 1
    if level0 and br.read(1):
        meta_bits = br.read(3) + 2
        mw = _subsample(w, meta_bits)
        mh = _subsample(ysize, meta_bits)
        meta_img, _ = _decode_image(br, mw, mh, False)
        meta = [((p >> 8) & 0xFFFF) for p in meta_img]
        num_groups = max(meta) + 1

    green_alpha = 256 + 24 + cache_size
    groups = []
    for _ in range(num_groups):
        groups.append(
            (
                _read_prefix_code(br, green_alpha),
                _read_prefix_code(br, 256),  # red
                _read_prefix_code(br, 256),  # blue
                _read_prefix_code(br, 256),  # alpha
                _read_prefix_code(br, 40),  # distance
            )
        )

    npix = w * ysize
    pixels: list[int] = [0] * npix
    cache = [0] * cache_size
    cache_shift = 32 - cache_bits if cache_bits else 0
    mw = _subsample(w, meta_bits) if meta is not None else 0
    pos = 0
    x = 0
    group = groups[0]
    g_tree, r_tree, b_tree, a_tree, d_tree = group
    while pos < npix:
        if meta is not None:
            gi = meta[(pos // w >> meta_bits) * mw + (x >> meta_bits)]
            if gi >= num_groups:
                raise UnsupportedMediaError("VP8L meta group out of range")
            g_tree, r_tree, b_tree, a_tree, d_tree = groups[gi]
        sym = _read_symbol(br, g_tree)
        if sym < 256:  # literal
            red = _read_symbol(br, r_tree)
            blue = _read_symbol(br, b_tree)
            alpha = _read_symbol(br, a_tree)
            px = (alpha << 24) | (red << 16) | (sym << 8) | blue
            pixels[pos] = px
            if cache_bits:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> cache_shift] = px
            pos += 1
            x += 1
            if x == w:
                x = 0
        elif sym < 280:  # LZ77 backward reference
            length = _length_or_dist(br, sym - 256)
            plane_code = _length_or_dist(br, _read_symbol(br, d_tree))
            if plane_code > 120:
                dist = plane_code - 120
            else:
                dx, dy = _DIST_MAP[plane_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > npix:
                raise UnsupportedMediaError("VP8L backref out of bounds")
            src = pos - dist
            if cache_bits:
                for _ in range(length):
                    px = pixels[src]
                    pixels[pos] = px
                    cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> cache_shift] = px
                    src += 1
                    pos += 1
            else:
                for _ in range(length):
                    pixels[pos] = pixels[src]
                    src += 1
                    pos += 1
            x = pos % w
        else:  # color cache
            idx = sym - 280
            if idx >= cache_size:
                raise UnsupportedMediaError("VP8L cache index out of range")
            pixels[pos] = cache[idx]
            pos += 1
            x += 1
            if x == w:
                x = 0
    return pixels, transforms


# ---------------------------------------------------------------------------
# inverse transforms
# ---------------------------------------------------------------------------


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) + (b >> 24)) >> 1) << 24)
        | (((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16)
        | (((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8)
        | (((a & 0xFF) + (b & 0xFF)) >> 1)
    )


def _add_px(a: int, b: int) -> int:
    """Per-channel mod-256 sum of two packed ARGB values."""
    return (
        ((((a >> 24) + (b >> 24)) & 0xFF) << 24)
        | (((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16)
        | (((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8)
        | (((a & 0xFF) + (b & 0xFF)) & 0xFF)
    )


def _select(l: int, t: int, tl: int) -> int:
    p_l = 0
    p_t = 0
    for sh in (24, 16, 8, 0):
        cl = (l >> sh) & 0xFF
        ct = (t >> sh) & 0xFF
        ctl = (tl >> sh) & 0xFF
        p_l += abs(ct - ctl)  # |pred - L| where pred = L + T - TL
        p_t += abs(cl - ctl)
    return l if p_l < p_t else t


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        out |= (0 if v < 0 else 255 if v > 255 else v) << sh
    return out


def _clamp_add_sub_half(l: int, t: int, tl: int) -> int:
    ave = _avg2(l, t)
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        d = a - ((tl >> sh) & 0xFF)
        # C integer division truncates toward zero
        half = d // 2 if d >= 0 else -((-d) // 2)
        v = a + half
        out |= (0 if v < 0 else 255 if v > 255 else v) << sh
    return out


def _inverse_predictor(pixels: list[int], w: int, h: int, bits: int, data):
    tw = _subsample(w, bits)
    for y in range(h):
        row = y * w
        trow = (y >> bits) * tw
        for xx in range(w):
            pos = row + xx
            if y == 0 and xx == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pixels[pos - 1]  # L
            elif xx == 0:
                pred = pixels[pos - w]  # T
            else:
                mode = (data[trow + (xx >> bits)] >> 8) & 0xFF
                lpx = pixels[pos - 1]
                tpx = pixels[pos - w]
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = lpx
                elif mode == 2:
                    pred = tpx
                elif mode == 3:
                    # TR; at the right edge the flat-array read wraps to
                    # the current row's first (already decoded) pixel —
                    # the spec's in-place semantics, kept deliberately
                    pred = pixels[pos - w + 1] if xx + 1 < w else pixels[row]
                elif mode == 4:
                    pred = pixels[pos - w - 1]
                elif mode == 5:
                    tr = pixels[pos - w + 1] if xx + 1 < w else pixels[row]
                    pred = _avg2(_avg2(lpx, tr), tpx)
                elif mode == 6:
                    pred = _avg2(lpx, pixels[pos - w - 1])
                elif mode == 7:
                    pred = _avg2(lpx, tpx)
                elif mode == 8:
                    pred = _avg2(pixels[pos - w - 1], tpx)
                elif mode == 9:
                    tr = pixels[pos - w + 1] if xx + 1 < w else pixels[row]
                    pred = _avg2(tpx, tr)
                elif mode == 10:
                    tr = pixels[pos - w + 1] if xx + 1 < w else pixels[row]
                    pred = _avg2(
                        _avg2(lpx, pixels[pos - w - 1]), _avg2(tpx, tr)
                    )
                elif mode == 11:
                    pred = _select(lpx, tpx, pixels[pos - w - 1])
                elif mode == 12:
                    pred = _clamp_add_sub_full(lpx, tpx, pixels[pos - w - 1])
                elif mode == 13:
                    pred = _clamp_add_sub_half(lpx, tpx, pixels[pos - w - 1])
                else:
                    raise UnsupportedMediaError(f"VP8L predictor mode {mode}")
            pixels[pos] = _add_px(pixels[pos], pred)


def _inverse_color_transform(pixels: list[int], w: int, h: int, bits: int, data):
    tw = _subsample(w, bits)

    def s8(v: int) -> int:
        return v - 256 if v >= 128 else v

    for y in range(h):
        row = y * w
        trow = (y >> bits) * tw
        for xx in range(w):
            pos = row + xx
            cte = data[trow + (xx >> bits)]
            g2r = s8(cte & 0xFF)
            g2b = s8((cte >> 8) & 0xFF)
            r2b = s8((cte >> 16) & 0xFF)
            px = pixels[pos]
            green = s8((px >> 8) & 0xFF)
            red = (((px >> 16) & 0xFF) + ((g2r * green) >> 5)) & 0xFF
            blue = ((px & 0xFF) + ((g2b * green) >> 5)) & 0xFF
            blue = (blue + ((r2b * s8(red)) >> 5)) & 0xFF
            pixels[pos] = (px & 0xFF00FF00) | (red << 16) | blue


def _inverse_transforms(pixels, transforms, ysize: int):
    """Apply inverse transforms in reverse stream order; returns
    (pixels, final_width)."""
    w = None
    for ttype, bits, full_w, data in reversed(transforms):
        if ttype == 3:  # color indexing: unbundle + palette lookup
            packed_w = _subsample(full_w, bits)
            out = [0] * (full_w * ysize)
            n_colors = len(data)
            for y in range(ysize):
                src_row = y * packed_w
                dst_row = y * full_w
                if bits == 0:
                    for xx in range(full_w):
                        idx = (pixels[src_row + xx] >> 8) & 0xFF
                        out[dst_row + xx] = data[idx] if idx < n_colors else 0
                else:
                    # pixel bundling (spec §4.2.4): each packed pixel's
                    # GREEN channel holds 1 << bits indices of width
                    # 8 >> bits bits each, lowest-order index first
                    idx_w = 8 >> bits
                    mask = (1 << idx_w) - 1
                    sub = (1 << bits) - 1
                    for xx in range(full_w):
                        packed = pixels[src_row + (xx >> bits)]
                        idx = ((packed >> 8) >> ((xx & sub) * idx_w)) & mask
                        out[dst_row + xx] = data[idx] if idx < n_colors else 0
            pixels = out
            w = full_w
        elif ttype == 2:  # subtract green
            w = full_w
            for i, px in enumerate(pixels):
                g = (px >> 8) & 0xFF
                red = (((px >> 16) & 0xFF) + g) & 0xFF
                blue = ((px & 0xFF) + g) & 0xFF
                pixels[i] = (px & 0xFF00FF00) | (red << 16) | blue
        elif ttype == 1:
            w = full_w
            _inverse_color_transform(pixels, full_w, ysize, bits, data)
        else:
            w = full_w
            _inverse_predictor(pixels, full_w, ysize, bits, data)
    return pixels, w


def _decode_vp8l_stream(data: bytes) -> np.ndarray:
    br = _BitReader(data)
    if br.read(8) != 0x2F:
        raise UnsupportedMediaError("bad VP8L signature byte")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise UnsupportedMediaError("unknown VP8L version")
    if w * h > _WEBP_MAX_PIXELS:
        raise UnsupportedMediaError(f"VP8L dimensions {w}x{h}")
    pixels, transforms = _decode_image(br, w, h, True)
    pixels, _ = _inverse_transforms(pixels, transforms, h)
    if len(pixels) != w * h:
        raise UnsupportedMediaError("VP8L pixel count mismatch after transforms")
    argb = np.asarray(pixels, dtype=np.uint32).reshape(h, w)
    rgba = np.empty((h, w, 4), dtype=np.uint8)
    rgba[:, :, 0] = (argb >> 16) & 0xFF
    rgba[:, :, 1] = (argb >> 8) & 0xFF
    rgba[:, :, 2] = argb & 0xFF
    rgba[:, :, 3] = argb >> 24
    return rgba


def _decode_alpha(body: bytes, W: int, H: int) -> np.ndarray:
    """ALPH chunk (WebP container spec): header byte = compression (0
    raw / 1 VP8L image stream), filtering method (none / horizontal /
    vertical / gradient), preprocessing (encoder-side only). The VP8L
    form is a HEADERLESS image stream of (W, H) whose GREEN channel
    carries the filtered alpha values."""
    if not body:
        raise UnsupportedMediaError("empty WebP ALPH chunk")
    hdr = body[0]
    compression = hdr & 3
    filter_method = (hdr >> 2) & 3
    if compression == 0:
        if len(body) - 1 < W * H:
            raise UnsupportedMediaError("truncated raw WebP alpha plane")
        plane = np.frombuffer(body[1 : 1 + W * H], dtype=np.uint8).reshape(H, W)
        plane = plane.astype(np.int32)
    elif compression == 1:
        br = _BitReader(body[1:])
        pixels, transforms = _decode_image(br, W, H, True)
        pixels, _ = _inverse_transforms(pixels, transforms, H)
        if len(pixels) != W * H:
            raise UnsupportedMediaError("WebP alpha plane size mismatch")
        plane = (
            (np.asarray(pixels, dtype=np.uint32).reshape(H, W) >> 8) & 0xFF
        ).astype(np.int32)
    else:
        raise UnsupportedMediaError(f"WebP alpha compression {compression}")
    if filter_method == 0:
        return plane.astype(np.uint8)
    out = np.zeros((H, W), dtype=np.int32)
    for y in range(H):
        if filter_method == 1:  # horizontal
            pred = 0 if y == 0 else int(out[y - 1, 0])
            for x in range(W):
                pred = (pred + plane[y, x]) & 0xFF
                out[y, x] = pred
        elif filter_method == 2:  # vertical
            if y == 0:
                pred = 0
                for x in range(W):
                    pred = (pred + plane[0, x]) & 0xFF
                    out[0, x] = pred
            else:
                out[y] = (out[y - 1] + plane[y]) & 0xFF
        else:  # gradient
            if y == 0:
                pred = 0
                for x in range(W):
                    pred = (pred + plane[0, x]) & 0xFF
                    out[0, x] = pred
            else:
                left = int(out[y - 1, 0])
                top_left = left
                for x in range(W):
                    top = int(out[y - 1, x])
                    g = left + top - top_left
                    g = 0 if g < 0 else 255 if g > 255 else g
                    left = (plane[y, x] + g) & 0xFF
                    out[y, x] = left
                    top_left = top
    return out.astype(np.uint8)


_MAX_TOTAL_PIXELS = 4 * _WEBP_MAX_PIXELS
_MAX_FRAMES = 10_000


def _decode_frame_chunks(payload: bytes, pos: int, end: int):
    """Decode the image chunks (optional ALPH + VP8/VP8L) inside an ANMF
    body or a still file → (H, W, 4) RGBA."""
    alpha_body = None
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body_end = pos + 8 + size
        if body_end > end:
            raise UnsupportedMediaError("truncated WebP frame chunk")
        if fourcc == b"VP8L":
            return _decode_vp8l_stream(payload[pos + 8 : body_end])
        if fourcc == b"VP8 ":
            from mitie_spark.operators.vp8 import vp8_to_rgba  # local import

            rgba = vp8_to_rgba(payload[pos + 8 : body_end])
            if alpha_body is not None:
                rgba[..., 3] = _decode_alpha(
                    alpha_body, rgba.shape[1], rgba.shape[0]
                )
            return rgba
        if fourcc == b"ALPH":
            alpha_body = payload[pos + 8 : body_end]
        pos = body_end + (size & 1)
    raise UnsupportedMediaError("WebP frame has no image chunk")


def _blend_frame(canvas: np.ndarray, frame: np.ndarray, y0: int, x0: int,
                 blend: bool) -> None:
    """Composite ``frame`` onto ``canvas`` at (y0, x0). ``blend`` uses the
    container spec's non-premultiplied alpha-blending formula (integer
    truncating division, matching the published reference semantics);
    otherwise the frame rectangle overwrites."""
    H, W = canvas.shape[:2]
    fh, fw = frame.shape[:2]
    vh, vw = min(fh, H - y0), min(fw, W - x0)
    if vh <= 0 or vw <= 0:
        return
    src = frame[:vh, :vw].astype(np.int64)
    if not blend:
        canvas[y0 : y0 + vh, x0 : x0 + vw] = src.astype(np.uint8)
        return
    dst = canvas[y0 : y0 + vh, x0 : x0 + vw].astype(np.int64)
    sa = src[..., 3:4]
    da = dst[..., 3:4]
    scale = da * (255 - sa) // 255
    ba = sa + scale
    rgb = np.where(
        ba > 0,
        (src[..., :3] * sa + dst[..., :3] * scale) // np.maximum(ba, 1),
        0,
    )
    out = np.concatenate([rgb, ba], axis=-1)
    keep = (sa == 0)[..., 0]
    out[keep] = dst[keep]
    canvas[y0 : y0 + vh, x0 : x0 + vw] = out.astype(np.uint8)


def decode_webp_frames(payload: bytes):
    """Decode an ANIMATED WebP → list of (composited RGBA frame,
    duration_ms). Still images return a single-frame list. Frame count
    and total composed pixels are bomb-guarded like the GIF decoder."""
    if len(payload) < 20 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise UnsupportedMediaError("not a WebP payload")
    pos = 12
    n = len(payload)
    canvas = None
    bg = None
    frames = []
    total_px = 0
    saw_anim = False
    while pos + 8 <= n:
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body_end = pos + 8 + size
        if body_end > n:
            raise UnsupportedMediaError("truncated WebP chunk")
        if fourcc == b"VP8X":
            if size < 10:
                raise UnsupportedMediaError("truncated WebP VP8X chunk")
            cw = 1 + int.from_bytes(payload[pos + 12 : pos + 15], "little")
            ch = 1 + int.from_bytes(payload[pos + 15 : pos + 18], "little")
            if cw * ch > _WEBP_MAX_PIXELS:
                raise UnsupportedMediaError(f"WebP canvas {cw}x{ch}")
            canvas = np.zeros((ch, cw, 4), dtype=np.uint8)
        elif fourcc == b"ANIM":
            if size < 6:
                raise UnsupportedMediaError("truncated WebP ANIM chunk")
            b, g, r, a = payload[pos + 8 : pos + 12]
            bg = np.array([r, g, b, a], dtype=np.uint8)
            saw_anim = True
        elif fourcc == b"ANMF":
            if canvas is None or bg is None:
                raise UnsupportedMediaError("WebP ANMF before VP8X/ANIM")
            if size < 16:
                raise UnsupportedMediaError("truncated WebP ANMF header")
            fx = 2 * int.from_bytes(payload[pos + 8 : pos + 11], "little")
            fy = 2 * int.from_bytes(payload[pos + 11 : pos + 14], "little")
            dur = int.from_bytes(payload[pos + 20 : pos + 23], "little")
            flags = payload[pos + 23]
            frame = _decode_frame_chunks(payload, pos + 24, body_end)
            total_px += frame.shape[0] * frame.shape[1]
            if len(frames) >= _MAX_FRAMES or total_px > _MAX_TOTAL_PIXELS:
                raise UnsupportedMediaError("WebP animation too large")
            _blend_frame(canvas, frame, fy, fx, blend=not (flags & 2))
            frames.append((canvas.copy(), dur))
            if flags & 1:  # dispose to background color
                vh = min(frame.shape[0], canvas.shape[0] - fy)
                vw = min(frame.shape[1], canvas.shape[1] - fx)
                canvas[fy : fy + vh, fx : fx + vw] = bg
        elif fourcc in (b"VP8 ", b"VP8L", b"ALPH"):
            if not saw_anim:  # still image
                return [(decode_webp(payload), 0)]
        pos = body_end + (size & 1)
    if not frames:
        raise UnsupportedMediaError("WebP file has no frames")
    return frames


def decode_webp(payload: bytes) -> np.ndarray:
    """Decode a WebP payload → (H, W, 4) uint8 RGBA. Lossless (VP8L) and
    lossy (VP8 keyframe, operators/vp8.py) both decode for real — the
    lossy path is bit-exact against libwebp incl. the fancy chroma
    upsampling. Animations and lossy-with-ALPH raise
    ``UnsupportedMediaError`` (injected-decoder seam)."""
    if len(payload) < 20 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise UnsupportedMediaError("not a WebP payload")
    pos = 12
    n = len(payload)
    alpha_body = None
    while pos + 8 <= n:
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body_end = pos + 8 + size
        if body_end > n:
            raise UnsupportedMediaError("truncated WebP chunk")
        if fourcc == b"VP8L":
            return _decode_vp8l_stream(payload[pos + 8 : body_end])
        if fourcc == b"VP8 ":
            from mitie_spark.operators.vp8 import vp8_to_rgba  # local import

            rgba = vp8_to_rgba(payload[pos + 8 : body_end])
            if alpha_body is not None:
                rgba[..., 3] = _decode_alpha(
                    alpha_body, rgba.shape[1], rgba.shape[0]
                )
            return rgba
        if fourcc == b"ALPH":
            alpha_body = payload[pos + 8 : body_end]
        if fourcc == b"ANIM" or fourcc == b"ANMF":
            # animation: return the first composited frame (the feature
            # pipeline's thumbnail semantic, mirroring decode_gif)
            return decode_webp_frames(payload)[0][0]
        if fourcc == b"VP8X":
            pass  # flags + canvas size; the image chunk follows
        pos = body_end + (size & 1)  # chunks are 2-byte aligned
    raise UnsupportedMediaError("WebP file has no VP8 image chunk")
