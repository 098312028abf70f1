"""Pure-Python/NumPy VP8 intra-frame (keyframe) decoder — RFC 6386.

WebP lossy still images are single VP8 key frames: all-intra, no motion
compensation, no reference frames. That makes a complete bit-exact
decode tractable in the same style as the sibling codecs
(operators/jpeg.py, webp.py): the inherently-sequential parts (boolean
arithmetic decoder, mode/token parsing, per-subblock intra prediction
feedback) run in scalar Python, the per-block math (dequant, iDCT) in
small integer helpers, and every hostile input fails fast with
``UnsupportedMediaError``.

Scope: keyframes only (WebP stills are always keyframes — interframes
raise), both loop filter types (normal with HEV/filter6 semantics and
the simple filter), segmentation with per-segment quantizers and filter
deltas, loop-filter ref/mode deltas, multiple token partitions, all
intra prediction modes incl. the 10 B_PRED submodes, and the Y2/WHT
second-order transform.

Verification (tests/test_vp8.py): the system libwebp is encoder AND
oracle — frames it encodes across quality levels must reconstruct to
byte-identical Y/U/V planes vs ``WebPDecodeYUV``. The constant tables
live in vp8_tables.py (extracted from libwebp's .rodata, structurally
verified); trees and filter arithmetic are transcribed from the RFC.
"""

from __future__ import annotations

import struct

import numpy as np

from mitie_spark.operators.media_codecs import UnsupportedMediaError
from mitie_spark.operators.vp8_tables import (
    ACQ,
    DCQ,
    DEFAULT_COEF_PROBS,
    KF_BMODE_PROBS,
    UPDATE_PROBS,
)

_MAX_PIXELS = 64 * 1024 * 1024

# --- mode ids (RFC 8.2 / 11.2) ---------------------------------------------
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
# B_PRED submodes
# NOTE: this is libwebp's numbering (RD/VR before LD) — the extracted
# KF_BMODE_PROBS table is context-indexed with THESE ids
(B_DC, B_TM, B_VE, B_HE, B_RD, B_VR, B_LD, B_VL, B_HD, B_HU) = range(10)

# keyframe mode trees + probs (RFC 11.2: kf_ymode_tree / uv_mode_tree)
_KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
_KF_YMODE_PROBS = (145, 156, 163, 128)
_UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
_KF_UV_PROBS = (142, 114, 183)
_BMODE_TREE = (
    -B_DC, 2, -B_TM, 4, -B_VE, 6, 8, 12, -B_HE, 10, -B_RD, -B_VR,
    -B_LD, 14, -B_VL, 16, -B_HD, -B_HU,
)
# map of 16x16 mode → implied b_mode for B_PRED context (RFC 11.3)
_MODE_TO_B = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}

# token tree (RFC 13.2) — 11 internal nodes / 12 tokens
_EOB, _ZERO = -100, -101  # sentinels (values resolved in the walk)
_COEF_TREE = (
    -11, 2, -0, 4, -1, 6, 8, 12, -2, 10, -3, -4,
    14, 16, -5, -6, 18, 20, -7, -8, -9, -10,
)
# token id → (base value, extra-bit probs); ids 5..10 are cat1..6
_CAT_PROBS = (
    (159,),
    (165, 145),
    (173, 148, 140),
    (176, 155, 140, 135),
    (180, 157, 141, 134, 130),
    (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
)
_CAT_BASE = (5, 7, 11, 19, 35, 67)

_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
_ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)


class _Bool:
    """RFC 6386 §7 boolean decoder (reads zeros past the end)."""

    __slots__ = ("d", "pos", "val", "rng", "cnt")

    def __init__(self, d: bytes):
        self.d = d
        self.pos = 2
        self.val = ((d[0] << 8) | d[1]) if len(d) >= 2 else (
            (d[0] << 8) if d else 0
        )
        self.rng = 255
        self.cnt = 0

    def bit(self, prob: int) -> int:
        split = 1 + (((self.rng - 1) * prob) >> 8)
        big = split << 8
        if self.val >= big:
            ret = 1
            self.rng -= split
            self.val -= big
        else:
            ret = 0
            self.rng = split
        while self.rng < 128:
            self.val <<= 1
            self.rng <<= 1
            self.cnt += 1
            if self.cnt == 8:
                self.cnt = 0
                d = self.d
                if self.pos < len(d):
                    self.val |= d[self.pos]
                self.pos += 1
        return ret

    def lit(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit(128)
        return v

    def signed_lit(self, n: int) -> int:
        v = self.lit(n)
        return -v if self.bit(128) else v

    def tree(self, tree, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.bit(probs[i >> 1])]
            if i <= 0:
                return -i


def _clamp_q(q: int) -> int:
    return 0 if q < 0 else 127 if q > 127 else q


class _Segment:
    __slots__ = ("y1dc", "y1ac", "y2dc", "y2ac", "uvdc", "uvac", "lf_level")


def decode_vp8(data: bytes, apply_filter: bool = True):
    """Decode a VP8 key frame → (Y, U, V) uint8 planes of the frame's
    visible dimensions (Y: HxW, U/V: ceil-half sizes)."""
    if len(data) < 10:
        raise UnsupportedMediaError("truncated VP8 payload")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise UnsupportedMediaError("VP8 interframe (not a still image)")
    version = (tag >> 1) & 7
    if version > 3:
        raise UnsupportedMediaError(f"VP8 version {version}")
    part1_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise UnsupportedMediaError("bad VP8 keyframe start code")
    w16, h16 = struct.unpack_from("<HH", data, 6)
    W = w16 & 0x3FFF
    H = h16 & 0x3FFF
    if W == 0 or H == 0 or W * H > _MAX_PIXELS:
        raise UnsupportedMediaError(f"VP8 dimensions {W}x{H}")
    if 10 + part1_size > len(data):
        raise UnsupportedMediaError("VP8 first partition past end")
    bd = _Bool(data[10 : 10 + part1_size])

    bd.bit(128)  # color space (must be 0, but tolerated)
    bd.bit(128)  # clamping type

    # --- segmentation (RFC 9.3) ---
    seg_enabled = bd.bit(128)
    update_map = False
    seg_tree_probs = [255, 255, 255]
    seg_abs = False
    seg_q = [0, 0, 0, 0]
    seg_lf = [0, 0, 0, 0]
    if seg_enabled:
        update_map = bool(bd.bit(128))
        update_data = bd.bit(128)
        if update_data:
            seg_abs = bool(bd.bit(128))
            for i in range(4):
                if bd.bit(128):
                    seg_q[i] = bd.signed_lit(7)
            for i in range(4):
                if bd.bit(128):
                    seg_lf[i] = bd.signed_lit(6)
        if update_map:
            for i in range(3):
                if bd.bit(128):
                    seg_tree_probs[i] = bd.lit(8)

    # --- loop filter header (RFC 9.4) ---
    simple_filter = bd.bit(128)
    filter_level = bd.lit(6)
    sharpness = bd.lit(3)
    lf_delta_enabled = bd.bit(128)
    ref_lf_deltas = [0, 0, 0, 0]
    mode_lf_deltas = [0, 0, 0, 0]
    if lf_delta_enabled:
        if bd.bit(128):  # update
            for i in range(4):
                if bd.bit(128):
                    ref_lf_deltas[i] = bd.signed_lit(6)
            for i in range(4):
                if bd.bit(128):
                    mode_lf_deltas[i] = bd.signed_lit(6)

    # --- token partitions (RFC 9.5) ---
    n_parts = 1 << bd.lit(2)
    part_base = 10 + part1_size
    sizes_end = part_base + 3 * (n_parts - 1)
    if sizes_end > len(data):
        raise UnsupportedMediaError("VP8 partition size table past end")
    parts = []
    off = sizes_end
    for i in range(n_parts):
        if i < n_parts - 1:
            sz = (
                data[part_base + 3 * i]
                | (data[part_base + 3 * i + 1] << 8)
                | (data[part_base + 3 * i + 2] << 16)
            )
        else:
            sz = len(data) - off
        if sz < 0 or off + sz > len(data):
            raise UnsupportedMediaError("VP8 token partition past end")
        parts.append(_Bool(data[off : off + sz]))
        off += sz

    # --- quantizers (RFC 9.6) ---
    y_ac_qi = bd.lit(7)
    y1dc_d = bd.signed_lit(4) if bd.bit(128) else 0
    y2dc_d = bd.signed_lit(4) if bd.bit(128) else 0
    y2ac_d = bd.signed_lit(4) if bd.bit(128) else 0
    uvdc_d = bd.signed_lit(4) if bd.bit(128) else 0
    uvac_d = bd.signed_lit(4) if bd.bit(128) else 0

    segments = []
    for s in range(4):
        base = (seg_q[s] if seg_abs else y_ac_qi + seg_q[s]) if seg_enabled else y_ac_qi
        base = _clamp_q(base)
        sg = _Segment()
        sg.y1dc = int(DCQ[_clamp_q(base + y1dc_d)])
        sg.y1ac = int(ACQ[base])
        sg.y2dc = int(DCQ[_clamp_q(base + y2dc_d)]) * 2
        sg.y2ac = int(ACQ[_clamp_q(base + y2ac_d)]) * 155 // 100
        if sg.y2ac < 8:
            sg.y2ac = 8
        sg.uvdc = int(DCQ[_clamp_q(base + uvdc_d)])
        if sg.uvdc > 132:
            sg.uvdc = 132
        sg.uvac = int(ACQ[_clamp_q(base + uvac_d)])
        lvl = (seg_lf[s] if seg_abs else filter_level + seg_lf[s]) if seg_enabled else filter_level
        sg.lf_level = 0 if lvl < 0 else 63 if lvl > 63 else lvl
        segments.append(sg)

    bd.bit(128)  # refresh entropy probs (keyframe: ignored)

    # --- token probability updates (RFC 13.4) ---
    coef_probs = DEFAULT_COEF_PROBS.copy()
    up = UPDATE_PROBS
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for l in range(11):
                    if bd.bit(int(up[i, j, k, l])):
                        coef_probs[i, j, k, l] = bd.lit(8)
    cp = coef_probs.tolist()  # python lists: much faster token decode

    mb_no_skip = bd.bit(128)
    prob_skip = bd.lit(8) if mb_no_skip else 0

    # --- per-macroblock decode ---
    mb_w = (W + 15) >> 4
    mb_h = (H + 15) >> 4
    yw, yh = mb_w * 16, mb_h * 16
    cw, ch = mb_w * 8, mb_h * 8
    # planes with a 1-pixel border row/col handled separately via arrays
    Y = np.zeros((yh, yw), dtype=np.uint8)
    U = np.zeros((ch, cw), dtype=np.uint8)
    V = np.zeros((ch, cw), dtype=np.uint8)

    # nonzero contexts: per-subblock columns for the row above, and left
    above_y_nz = np.zeros((mb_w, 4), dtype=np.uint8)
    above_u_nz = np.zeros((mb_w, 2), dtype=np.uint8)
    above_v_nz = np.zeros((mb_w, 2), dtype=np.uint8)
    above_y2_nz = np.zeros(mb_w, dtype=np.uint8)
    # B_PRED submode context (above row per MB, 4 entries)
    above_bmodes = np.full((mb_w, 4), B_DC, dtype=np.int8)

    # per-MB info retained for the loop filter pass
    mb_segment = np.zeros((mb_h, mb_w), dtype=np.int8)
    mb_is_b = np.zeros((mb_h, mb_w), dtype=bool)
    mb_has_coeffs = np.zeros((mb_h, mb_w), dtype=bool)

    zz = _ZIGZAG
    bands = _BANDS
    cat_base = _CAT_BASE
    cat_probs = _CAT_PROBS

    def read_coeffs(bc, block_type, first, ctx, dq_dc, dq_ac, out):
        """Token-decode one 4x4 block into out[16] (zigzag→raster applied
        here); returns True if any nonzero coefficient."""
        probs_bt = cp[block_type]
        n = first
        nonzero = False
        prev_zero = False
        while n < 16:
            p = probs_bt[bands[n]][ctx]
            if prev_zero:
                # a ZERO token cannot be followed by EOB: skip its branch
                i = 4 if bc.bit(p[1]) else 2
                # i=2 → token ZERO? no: node 2 is "-0, 4": we already
                # consumed the bit for node index 1 (prob p[1]);
                # bit==0 → token 0... handled below via explicit walk
                if i == 2:
                    tok = 0
                else:
                    tok = _tree_tok(bc, p, 4)
            else:
                if not bc.bit(p[0]):
                    break  # EOB
                if not bc.bit(p[1]):
                    tok = 0
                else:
                    tok = _tree_tok(bc, p, 4)
            if tok == 0:
                ctx = 0
                prev_zero = True
                n += 1
                continue
            prev_zero = False
            if tok <= 4:
                val = tok
            else:
                ci = tok - 5
                val = cat_base[ci]
                add = 0
                for pr in cat_probs[ci]:
                    add = (add << 1) | bc.bit(pr)
                val += add
            ctx = 2 if val > 1 else 1
            if bc.bit(128):
                val = -val
            out[zz[n]] = val * (dq_dc if n == 0 else dq_ac)
            nonzero = True
            n += 1
        return nonzero

    def _tree_tok(bc, p, start):
        # continue the token tree walk from node index `start` (=4: the
        # subtree after "not EOB, not ZERO"); returns token id 1..10
        i = start
        tree = _COEF_TREE
        while True:
            i = tree[i + bc.bit(p[i >> 1])]
            if i <= 0:
                return -i

    # reusable buffers
    coefs = np.zeros(16, dtype=np.int64)

    for mb_y in range(mb_h):
        bc = parts[mb_y % n_parts]
        left_y_nz = np.zeros(4, dtype=np.uint8)
        left_u_nz = np.zeros(2, dtype=np.uint8)
        left_v_nz = np.zeros(2, dtype=np.uint8)
        left_y2_nz = 0
        left_bmodes = [B_DC, B_DC, B_DC, B_DC]
        for mb_x in range(mb_w):
            # -- mode parsing (first partition) --
            seg_id = 0
            if seg_enabled and update_map:
                if bd.bit(seg_tree_probs[0]):
                    seg_id = 2 + bd.bit(seg_tree_probs[2])
                else:
                    seg_id = bd.bit(seg_tree_probs[1])
            elif seg_enabled:
                seg_id = 0
            mb_segment[mb_y, mb_x] = seg_id
            skip = bd.bit(prob_skip) if mb_no_skip else 0

            ymode = bd.tree(_KF_YMODE_TREE, _KF_YMODE_PROBS)
            if ymode == B_PRED:
                bmodes = [0] * 16
                for sy in range(4):
                    for sx in range(4):
                        above_m = (
                            above_bmodes[mb_x, sx] if sy == 0 else bmodes[(sy - 1) * 4 + sx]
                        )
                        left_m = (
                            left_bmodes[sy] if sx == 0 else bmodes[sy * 4 + sx - 1]
                        )
                        bmodes[sy * 4 + sx] = bd.tree(
                            _BMODE_TREE, KF_BMODE_PROBS[above_m][left_m]
                        )
                above_bmodes[mb_x] = bmodes[12:16]
                left_bmodes = [bmodes[3], bmodes[7], bmodes[11], bmodes[15]]
            else:
                b = _MODE_TO_B[ymode]
                bmodes = [b] * 16
                above_bmodes[mb_x] = (b, b, b, b)
                left_bmodes = [b, b, b, b]
            uvmode = bd.tree(_UV_MODE_TREE, _KF_UV_PROBS)

            is_b = ymode == B_PRED
            mb_is_b[mb_y, mb_x] = is_b
            sg = segments[seg_id]

            # -- residuals (token partition) --
            y_blocks = [None] * 16  # dequantized coefficient arrays or None
            u_blocks = [None] * 4
            v_blocks = [None] * 4
            y2 = None
            any_coeffs = False
            if skip:
                left_y_nz[:] = 0
                above_y_nz[mb_x] = 0
                left_u_nz[:] = 0
                above_u_nz[mb_x] = 0
                left_v_nz[:] = 0
                above_v_nz[mb_x] = 0
                if not is_b:
                    left_y2_nz = 0
                    above_y2_nz[mb_x] = 0
            else:
                first = 0
                if not is_b:
                    # Y2 block (type 1)
                    ctx = left_y2_nz + above_y2_nz[mb_x]
                    coefs[:] = 0
                    nz = read_coeffs(bc, 1, 0, ctx, sg.y2dc, sg.y2ac, coefs)
                    left_y2_nz = above_y2_nz[mb_x] = 1 if nz else 0
                    y2 = _iwht(coefs) if nz else None
                    first = 1
                    any_coeffs |= nz
                ytype = 0 if not is_b else 3
                for sy in range(4):
                    for sx in range(4):
                        ctx = int(left_y_nz[sy]) + int(above_y_nz[mb_x, sx])
                        coefs[:] = 0
                        nz = read_coeffs(
                            bc, ytype, first, ctx, sg.y1dc, sg.y1ac, coefs
                        )
                        left_y_nz[sy] = above_y_nz[mb_x, sx] = 1 if nz else 0
                        if nz:
                            y_blocks[sy * 4 + sx] = coefs.copy()
                            any_coeffs = True
                for plane, blocks, lnz, anz, in (
                    ("u", u_blocks, left_u_nz, above_u_nz),
                    ("v", v_blocks, left_v_nz, above_v_nz),
                ):
                    for sy in range(2):
                        for sx in range(2):
                            ctx = int(lnz[sy]) + int(anz[mb_x, sx])
                            coefs[:] = 0
                            nz = read_coeffs(
                                bc, 2, 0, ctx, sg.uvdc, sg.uvac, coefs
                            )
                            lnz[sy] = anz[mb_x, sx] = 1 if nz else 0
                            if nz:
                                blocks[sy * 2 + sx] = coefs.copy()
                                any_coeffs = True
            mb_has_coeffs[mb_y, mb_x] = any_coeffs

            # -- reconstruction --
            _reconstruct_mb(
                Y, U, V, mb_x, mb_y, mb_w, ymode, bmodes, uvmode,
                y_blocks, u_blocks, v_blocks, y2,
            )

    # --- loop filter ---
    if apply_filter and filter_level > 0:
        lf_levels = np.zeros((mb_h, mb_w), dtype=np.int32)
        for my in range(mb_h):
            for mx in range(mb_w):
                lvl = segments[mb_segment[my, mx]].lf_level
                if lf_delta_enabled:
                    lvl += ref_lf_deltas[0]  # intra frame
                    if mb_is_b[my, mx]:
                        lvl += mode_lf_deltas[0]
                lf_levels[my, mx] = 0 if lvl < 0 else 63 if lvl > 63 else lvl
        _loop_filter(
            Y, U, V, lf_levels, mb_is_b | mb_has_coeffs, simple_filter,
            sharpness, mb_w, mb_h,
        )

    return Y[:H, :W], U[: (H + 1) // 2, : (W + 1) // 2], V[: (H + 1) // 2, : (W + 1) // 2]


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------


def _iwht(coefs) -> list[int]:
    """Inverse Walsh-Hadamard for the Y2 block (RFC 14.3) → 16 DC values
    in raster order."""
    ip = coefs
    tmp = [0] * 16
    for i in range(4):
        a1 = int(ip[i]) + int(ip[12 + i])
        b1 = int(ip[4 + i]) + int(ip[8 + i])
        c1 = int(ip[4 + i]) - int(ip[8 + i])
        d1 = int(ip[i]) - int(ip[12 + i])
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        a1 = tmp[4 * i] + tmp[4 * i + 3]
        b1 = tmp[4 * i + 1] + tmp[4 * i + 2]
        c1 = tmp[4 * i + 1] - tmp[4 * i + 2]
        d1 = tmp[4 * i] - tmp[4 * i + 3]
        out[4 * i] = (a1 + b1 + 3) >> 3
        out[4 * i + 1] = (c1 + d1 + 3) >> 3
        out[4 * i + 2] = (a1 - b1 + 3) >> 3
        out[4 * i + 3] = (d1 - c1 + 3) >> 3
    return out


def _idct4x4(blk) -> np.ndarray:
    """RFC 14.4 inverse DCT (integer, constants 20091/35468) → (4,4) int."""
    ip = blk
    tmp = [0] * 16
    for i in range(4):
        i0, i4, i8, i12 = int(ip[i]), int(ip[4 + i]), int(ip[8 + i]), int(ip[12 + i])
        a1 = i0 + i8
        b1 = i0 - i8
        t1 = (i4 * 35468) >> 16
        t2 = i12 + ((i12 * 20091) >> 16)
        c1 = t1 - t2
        t1 = i4 + ((i4 * 20091) >> 16)
        t2 = (i12 * 35468) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    out = np.empty((4, 4), dtype=np.int32)
    for i in range(4):
        r = 4 * i
        i0, i1, i2, i3 = tmp[r], tmp[r + 1], tmp[r + 2], tmp[r + 3]
        a1 = i0 + i2
        b1 = i0 - i2
        t1 = (i1 * 35468) >> 16
        t2 = i3 + ((i3 * 20091) >> 16)
        c1 = t1 - t2
        t1 = i1 + ((i1 * 20091) >> 16)
        t2 = (i3 * 35468) >> 16
        d1 = t1 + t2
        out[i, 0] = (a1 + d1 + 4) >> 3
        out[i, 3] = (a1 - d1 + 4) >> 3
        out[i, 1] = (b1 + c1 + 4) >> 3
        out[i, 2] = (b1 - c1 + 4) >> 3
    return out


def _add_residual(plane, y0, x0, res):
    tgt = plane[y0 : y0 + 4, x0 : x0 + 4].astype(np.int32) + res
    plane[y0 : y0 + 4, x0 : x0 + 4] = np.clip(tgt, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# intra prediction (RFC 12)
# ---------------------------------------------------------------------------


def _edge_pixels(plane, y0, x0, size):
    """(above[size], left[size], top_left) with RFC border conventions:
    above row off-frame = 127, left column off-frame = 129."""
    have_above = y0 > 0
    have_left = x0 > 0
    above = (
        plane[y0 - 1, x0 : x0 + size].astype(np.int32)
        if have_above
        else np.full(size, 127, dtype=np.int32)
    )
    left = (
        plane[y0 : y0 + size, x0 - 1].astype(np.int32)
        if have_left
        else np.full(size, 129, dtype=np.int32)
    )
    if have_above and have_left:
        tl = int(plane[y0 - 1, x0 - 1])
    elif have_above:
        tl = 129  # left column missing: its fill value
    else:
        tl = 127  # above row missing: the corner belongs to the 127 row
    return above, left, tl, have_above, have_left


def _pred_block(plane, y0, x0, size, mode):
    above, left, tl, ha, hl = _edge_pixels(plane, y0, x0, size)
    if mode == DC_PRED:
        if ha and hl:
            dc = (int(above.sum()) + int(left.sum()) + size) >> {8: 4, 16: 5}[size]
        elif ha:
            dc = (int(above.sum()) + size // 2) >> {8: 3, 16: 4}[size]
        elif hl:
            dc = (int(left.sum()) + size // 2) >> {8: 3, 16: 4}[size]
        else:
            dc = 128
        plane[y0 : y0 + size, x0 : x0 + size] = dc
    elif mode == V_PRED:
        plane[y0 : y0 + size, x0 : x0 + size] = above.astype(np.uint8)[None, :]
    elif mode == H_PRED:
        plane[y0 : y0 + size, x0 : x0 + size] = left.astype(np.uint8)[:, None]
    else:  # TM
        pred = left[:, None] + above[None, :] - tl
        plane[y0 : y0 + size, x0 : x0 + size] = np.clip(pred, 0, 255).astype(np.uint8)


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _avg2(a, b):
    return (a + b + 1) >> 1


def _pred_b(plane, y0, x0, mode, ar):
    """4x4 B_PRED submode prediction; ``ar`` = the 4 above-right pixels."""
    have_above = y0 > 0
    have_left = x0 > 0
    A = (
        plane[y0 - 1, x0 : x0 + 4].astype(np.int64)
        if have_above
        else np.full(4, 127, dtype=np.int64)
    )
    L = (
        plane[y0 : y0 + 4, x0 - 1].astype(np.int64)
        if have_left
        else np.full(4, 129, dtype=np.int64)
    )
    if have_above and have_left:
        P = int(plane[y0 - 1, x0 - 1])
    elif have_above:
        P = 129  # left column missing
    else:
        P = 127  # above row missing: corner is part of the 127 row
    A0, A1, A2, A3 = (int(v) for v in A)
    L0, L1, L2, L3 = (int(v) for v in L)
    R0, R1, R2, R3 = (int(v) for v in ar)
    out = np.empty((4, 4), dtype=np.int64)
    if mode == B_DC:
        out[:, :] = (A0 + A1 + A2 + A3 + L0 + L1 + L2 + L3 + 4) >> 3
    elif mode == B_TM:
        out[:, :] = np.clip(L[:, None] + A[None, :] - P, 0, 255)
    elif mode == B_VE:
        row = [
            _avg3(P, A0, A1),
            _avg3(A0, A1, A2),
            _avg3(A1, A2, A3),
            _avg3(A2, A3, R0),
        ]
        out[:, :] = np.array(row)[None, :]
    elif mode == B_HE:
        col = [
            _avg3(P, L0, L1),
            _avg3(L0, L1, L2),
            _avg3(L1, L2, L3),
            _avg3(L2, L3, L3),
        ]
        out[:, :] = np.array(col)[:, None]
    elif mode == B_LD:
        e = [A0, A1, A2, A3, R0, R1, R2, R3]
        for r in range(4):
            for c in range(4):
                i = r + c
                out[r, c] = _avg3(e[i], e[i + 1], e[min(i + 2, 7)])
        out[3, 3] = _avg3(e[6], e[7], e[7])
    elif mode == B_RD:
        e = [L3, L2, L1, L0, P, A0, A1, A2, A3]
        for r in range(4):
            for c in range(4):
                i = 3 - r + c + 1
                out[r, c] = _avg3(e[i - 1], e[i], e[i + 1])
    elif mode == B_VR:
        e = [L3, L2, L1, L0, P, A0, A1, A2, A3]
        out[3, 0] = _avg3(e[1], e[2], e[3])
        out[2, 0] = _avg3(e[2], e[3], e[4])
        out[3, 1] = out[1, 0] = _avg3(e[3], e[4], e[5])
        out[2, 1] = out[0, 0] = _avg2(e[4], e[5])
        out[3, 2] = out[1, 1] = _avg3(e[4], e[5], e[6])
        out[2, 2] = out[0, 1] = _avg2(e[5], e[6])
        out[3, 3] = out[1, 2] = _avg3(e[5], e[6], e[7])
        out[2, 3] = out[0, 2] = _avg2(e[6], e[7])
        out[1, 3] = _avg3(e[6], e[7], e[8])
        out[0, 3] = _avg2(e[7], e[8])
    elif mode == B_VL:
        e = [A0, A1, A2, A3, R0, R1, R2, R3]
        out[0, 0] = _avg2(e[0], e[1])
        out[1, 0] = _avg3(e[0], e[1], e[2])
        out[2, 0] = out[0, 1] = _avg2(e[1], e[2])
        out[1, 1] = out[3, 0] = _avg3(e[1], e[2], e[3])
        out[2, 1] = out[0, 2] = _avg2(e[2], e[3])
        out[3, 1] = out[1, 2] = _avg3(e[2], e[3], e[4])
        out[2, 2] = out[0, 3] = _avg2(e[3], e[4])
        out[3, 2] = out[1, 3] = _avg3(e[3], e[4], e[5])
        out[2, 3] = _avg3(e[4], e[5], e[6])
        out[3, 3] = _avg3(e[5], e[6], e[7])
    elif mode == B_HD:
        e = [L3, L2, L1, L0, P, A0, A1, A2]
        out[3, 0] = _avg2(e[0], e[1])
        out[3, 1] = _avg3(e[0], e[1], e[2])
        out[2, 0] = out[3, 2] = _avg2(e[1], e[2])
        out[2, 1] = out[3, 3] = _avg3(e[1], e[2], e[3])
        out[2, 2] = out[1, 0] = _avg2(e[2], e[3])
        out[2, 3] = out[1, 1] = _avg3(e[2], e[3], e[4])
        out[1, 2] = out[0, 0] = _avg2(e[3], e[4])
        out[1, 3] = out[0, 1] = _avg3(e[3], e[4], e[5])
        out[0, 2] = _avg3(e[4], e[5], e[6])
        out[0, 3] = _avg3(e[5], e[6], e[7])
    else:  # B_HU
        out[0, 0] = _avg2(L0, L1)
        out[0, 1] = _avg3(L0, L1, L2)
        out[0, 2] = out[1, 0] = _avg2(L1, L2)
        out[0, 3] = out[1, 1] = _avg3(L1, L2, L3)
        out[1, 2] = out[2, 0] = _avg2(L2, L3)
        out[1, 3] = out[2, 1] = _avg3(L2, L3, L3)
        out[2, 2] = out[2, 3] = L3
        out[3, :] = L3
    plane[y0 : y0 + 4, x0 : x0 + 4] = out.astype(np.uint8)


def _reconstruct_mb(Y, U, V, mb_x, mb_y, mb_w, ymode, bmodes, uvmode,
                    y_blocks, u_blocks, v_blocks, y2):
    x0 = mb_x * 16
    y0 = mb_y * 16
    if ymode != B_PRED:
        _pred_block(Y, y0, x0, 16, ymode)
    # above-right pixels for B_PRED: from the row above this MB
    yw = Y.shape[1]
    if mb_y > 0:
        if x0 + 16 < yw:
            top_right = Y[y0 - 1, x0 + 16 : x0 + 20].astype(np.int64)
            if len(top_right) < 4:
                top_right = np.pad(top_right, (0, 4 - len(top_right)), mode="edge")
        else:
            top_right = np.full(4, int(Y[y0 - 1, yw - 1]), dtype=np.int64)
    else:
        top_right = np.full(4, 127, dtype=np.int64)

    for sy in range(4):
        for sx in range(4):
            by = y0 + sy * 4
            bx = x0 + sx * 4
            if ymode == B_PRED:
                if sx == 3:
                    ar = top_right
                elif sy == 0:
                    if mb_y > 0:
                        ar = Y[by - 1, bx + 4 : bx + 8].astype(np.int64)
                    else:
                        ar = np.full(4, 127, dtype=np.int64)
                else:
                    ar = Y[by - 1, bx + 4 : bx + 8].astype(np.int64)
                _pred_b(Y, by, bx, bmodes[sy * 4 + sx], ar)
            blk = y_blocks[sy * 4 + sx]
            dc = y2[sy * 4 + sx] if y2 is not None else None
            if blk is None and dc is None:
                continue
            if blk is None:
                blk = np.zeros(16, dtype=np.int64)
            if dc is not None:
                blk = blk.copy()
                blk[0] = dc
            _add_residual(Y, by, bx, _idct4x4(blk))

    cx0 = mb_x * 8
    cy0 = mb_y * 8
    for plane, blocks in ((U, u_blocks), (V, v_blocks)):
        _pred_block(plane, cy0, cx0, 8, uvmode)
        for sy in range(2):
            for sx in range(2):
                blk = blocks[sy * 2 + sx]
                if blk is not None:
                    _add_residual(
                        plane, cy0 + sy * 4, cx0 + sx * 4, _idct4x4(blk)
                    )


# ---------------------------------------------------------------------------
# loop filter (RFC 15)
# ---------------------------------------------------------------------------


def _c(v):
    return -128 if v < -128 else 127 if v > 127 else v


def _filter_common(p, idx, stride, use_outer):
    """filter4 / common adjust on pixels p[idx-2*stride..idx+stride]
    (signed-char domain). Returns the 'a' used for the outer taps."""
    p1 = p[idx - 2 * stride] - 128
    p0 = p[idx - stride] - 128
    q0 = p[idx] - 128
    q1 = p[idx + stride] - 128
    a = _c((_c(p1 - q1) if use_outer else 0) + 3 * (q0 - p0))
    f = _c(a + 4) >> 3
    e = _c(a + 3) >> 3
    p[idx] = (q0 - f) + 128
    p[idx - stride] = (p0 + e) + 128
    return f


def _loop_filter(Y, U, V, levels, has_inner, simple, sharpness, mb_w, mb_h):
    flats = [pl.reshape(-1).astype(np.int32) for pl in ((Y, U, V) if not simple else (Y,))]
    for mb_y in range(mb_h):
        for mb_x in range(mb_w):
            level = int(levels[mb_y, mb_x])
            if level == 0:
                continue
            interior = level
            if sharpness:
                interior >>= 2 if sharpness > 4 else 1
                cap = 9 - sharpness
                if interior > cap:
                    interior = cap
            if interior < 1:
                interior = 1
            hev_t = 2 if level >= 40 else 1 if level >= 15 else 0
            mb_limit = ((level + 2) * 2) + interior
            sb_limit = (level * 2) + interior
            inner = bool(has_inner[mb_y, mb_x])
            if simple:
                _filter_mb_simple(flats[0], Y.shape[1], mb_x, mb_y,
                                  mb_limit, sb_limit, inner)
            else:
                for flat, plane, size in (
                    (flats[0], Y, 16), (flats[1], U, 8), (flats[2], V, 8),
                ):
                    _filter_mb_normal(
                        flat, plane.shape[1], mb_x, mb_y, size, mb_limit,
                        sb_limit, interior, hev_t, inner,
                    )
    if simple:
        Y.reshape(-1)[:] = flats[0].astype(np.uint8)
    else:
        for flat, pl in zip(flats, (Y, U, V)):
            pl.reshape(-1)[:] = flat.astype(np.uint8)


def _normal_mask(p, i, s, limit, interior):
    return (
        abs(p[i - 4 * s] - p[i - 3 * s]) <= interior
        and abs(p[i - 3 * s] - p[i - 2 * s]) <= interior
        and abs(p[i - 2 * s] - p[i - s]) <= interior
        and abs(p[i + s] - p[i]) <= interior
        and abs(p[i + 2 * s] - p[i + s]) <= interior
        and abs(p[i + 3 * s] - p[i + 2 * s]) <= interior
        and abs(p[i - s] - p[i]) * 2 + abs(p[i - 2 * s] - p[i + s]) // 2 <= limit
    )


def _hev(p, i, s, thresh):
    return (
        abs(p[i - 2 * s] - p[i - s]) > thresh or abs(p[i + s] - p[i]) > thresh
    )


def _filter_sb(p, i, s, limit, interior, hev_t):
    if not _normal_mask(p, i, s, limit, interior):
        return
    hv = _hev(p, i, s, hev_t)
    a = _filter_common(p, i, s, hv)
    if not hv:
        a = (a + 1) >> 1
        q1 = p[i + s] - 128
        p1 = p[i - 2 * s] - 128
        p[i + s] = _u(q1 - a)
        p[i - 2 * s] = _u(p1 + a)


def _u(v):
    v += 128
    return 0 if v < 0 else 255 if v > 255 else v


def _filter_mbe(p, i, s, limit, interior, hev_t):
    if not _normal_mask(p, i, s, limit, interior):
        return
    if _hev(p, i, s, hev_t):
        _filter_common(p, i, s, True)
        return
    p2 = p[i - 3 * s] - 128
    p1 = p[i - 2 * s] - 128
    p0 = p[i - s] - 128
    q0 = p[i] - 128
    q1 = p[i + s] - 128
    q2 = p[i + 2 * s] - 128
    w = _c(_c(p1 - q1) + 3 * (q0 - p0))
    a = (27 * w + 63) >> 7
    p[i] = _u(q0 - a)
    p[i - s] = _u(p0 + a)
    a = (18 * w + 63) >> 7
    p[i + s] = _u(q1 - a)
    p[i - 2 * s] = _u(p1 + a)
    a = (9 * w + 63) >> 7
    p[i + 2 * s] = _u(q2 - a)
    p[i - 3 * s] = _u(p2 + a)


def _filter_mb_normal(flat, w, mb_x, mb_y, size, mb_limit, sb_limit,
                      interior, hev_t, inner):
    x0 = mb_x * size
    y0 = mb_y * size
    # vertical edges (filter across columns, stride 1)
    if mb_x > 0:
        for y in range(size):
            _filter_mbe(flat, (y0 + y) * w + x0, 1, mb_limit, interior, hev_t)
    if inner:
        for sx in range(4, size, 4):
            for y in range(size):
                _filter_sb(flat, (y0 + y) * w + x0 + sx, 1, sb_limit, interior, hev_t)
    # horizontal edges (stride w)
    if mb_y > 0:
        for x in range(size):
            _filter_mbe(flat, y0 * w + x0 + x, w, mb_limit, interior, hev_t)
    if inner:
        for sy in range(4, size, 4):
            for x in range(size):
                _filter_sb(flat, (y0 + sy) * w + x0 + x, w, sb_limit, interior, hev_t)


def _filter_simple_edge(p, i, s, limit):
    p1 = p[i - 2 * s] - 128
    p0 = p[i - s] - 128
    q0 = p[i] - 128
    q1 = p[i + s] - 128
    if abs(p0 - q0) * 2 + abs(p1 - q1) // 2 > limit:
        return
    _filter_common(p, i, s, True)


def _filter_mb_simple(flat, w, mb_x, mb_y, mb_limit, sb_limit, inner):
    x0 = mb_x * 16
    y0 = mb_y * 16
    if mb_x > 0:
        for y in range(16):
            _filter_simple_edge(flat, (y0 + y) * w + x0, 1, mb_limit)
    if inner:
        for sx in (4, 8, 12):
            for y in range(16):
                _filter_simple_edge(flat, (y0 + y) * w + x0 + sx, 1, sb_limit)
    if mb_y > 0:
        for x in range(16):
            _filter_simple_edge(flat, y0 * w + x0 + x, w, mb_limit)
    if inner:
        for sy in (4, 8, 12):
            for x in range(16):
                _filter_simple_edge(flat, (y0 + sy) * w + x0 + x, w, sb_limit)


# ---------------------------------------------------------------------------
# YUV 4:2:0 → RGBA (libwebp-compatible: fancy bilinear chroma upsampling +
# the 16-bit fixed-point BT.601 conversion, verified bit-exact against
# WebPDecodeRGBA in tests/test_vp8.py)
# ---------------------------------------------------------------------------


def _fancy_upsample(C: np.ndarray, H: int, W: int) -> np.ndarray:
    """Chroma sample (cx, cy) sits at luma (2cx+0.5, 2cy+0.5); each luma
    pixel blends its 4 nearest chroma samples with weights 9/3/3/1
    (edges replicate)."""
    P = np.pad(C.astype(np.int64), 1, mode="edge")
    out = np.empty((H, W), dtype=np.int64)
    for dy in (0, 1):
        for dx in (0, 1):
            ys = np.arange((H - dy + 1) // 2)
            xs = np.arange((W - dx + 1) // 2)
            main = P[1 + ys][:, 1 + xs]
            vert = P[1 + ys + (2 * dy - 1)][:, 1 + xs]
            horz = P[1 + ys][:, 1 + xs + (2 * dx - 1)]
            diag = P[1 + ys + (2 * dy - 1)][:, 1 + xs + (2 * dx - 1)]
            out[dy::2, dx::2] = (9 * main + 3 * (vert + horz) + diag + 8) >> 4
    return out


def vp8_to_rgba(data: bytes) -> np.ndarray:
    """Decode a VP8 key frame → (H, W, 4) uint8 RGBA (opaque alpha)."""
    Y, U, V = decode_vp8(data)
    H, W = Y.shape
    yy = Y.astype(np.int64) * 19077 >> 8
    uu = _fancy_upsample(U, H, W)
    vv = _fancy_upsample(V, H, W)
    out = np.empty((H, W, 4), dtype=np.uint8)
    out[..., 0] = np.clip((yy + (vv * 26149 >> 8) - 14234) >> 6, 0, 255)
    out[..., 1] = np.clip(
        (yy - (uu * 6419 >> 8) - (vv * 13320 >> 8) + 8708) >> 6, 0, 255
    )
    out[..., 2] = np.clip((yy + (uu * 33050 >> 8) - 17685) >> 6, 0, 255)
    out[..., 3] = 255
    return out
