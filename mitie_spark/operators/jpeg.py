"""Pure-NumPy baseline JPEG decoder (ITU-T T.81 §F.2 / JFIF).

Scope: baseline sequential DCT (SOF0), extended sequential DCT (SOF1 —
8- or 12-bit samples) AND progressive DCT (SOF2, 8- or 12-bit — full
spectral selection + successive approximation: interleaved DC first/
refinement scans, per-component AC band scans with EOBn run coding and
the correction-bit refinement procedure of T.81 §G.1.2.3), Huffman
entropy coding, grayscale and 3-component scans (JFIF
YCbCr by default; Adobe APP14 transform=0 or R/G/B component IDs decode
as direct RGB with no color transform), chroma sampling factors whose
ratios divide the max (4:4:4 / 4:2:2 / 4:2:0), restart markers
(DRI/RSTn), 0xFF00 byte stuffing, and DHT/DRI redefinition between
scans (tables are snapshotted per SOS). 12-bit frames return uint16
samples with maxval 4095 (the level shift is 2**(P-1) and the Huffman
category bounds widen to DC 0..15 / AC 1..14 per T.81 Tables F.1/F.2).
Lossless (SOF3, T.81 Annex H) decodes too: predictors 1-7, point
transform, 2..16-bit samples, category-16 differences, restart markers;
3-component lossless returns raw planes (the standard defines no color
transform there) unless Adobe APP14 transform=1 declares YCbCr.
ARITHMETIC entropy coding decodes for real as well — SOF9 (extended
sequential) and SOF10 (progressive) with DAC conditioning, via the
QM-coder in operators/jpeg_arith.py (differentially gated against the
system libjpeg: same pixels encoded Huffman and arithmetic must decode
bit-identically). HIERARCHICAL streams (T.81 Annex J) decode too: a DHP
header, a non-differential first frame at reduced resolution, then
EXP-expanded (J.1.1.2 bilinear doubling) Huffman differential correction
frames — SOF5 sequential / SOF6 progressive, DC prediction pinned to
zero, widened category bounds — accumulated onto a clamped per-component
reference. Differential-lossless and the arithmetic differential modes
(SOF13-15) raise UnsupportedMediaError, which routes callers to the
injected-decoder seam exactly like any other unsupported payload
(operators/multimodal.py).

Design: the marker walk and the inherently-sequential Huffman entropy
decode run in Python over the unstuffed scan bytes (work bounded by the
declared MCU count, which is capped like PNG's pixel guard), while
everything per-pixel — dequantization, zigzag placement, the 2-D IDCT
(einsum against the DCT-III basis over ALL blocks at once), nearest
upsampling and the YCbCr→RGB transform — is vectorized in NumPy. Safe
inside Arrow-batched UDFs: hostile headers fail fast, no unbounded
allocation.

Reference behavior parity target: mit-nlp/MITIE has no image path at all;
this module exists for the training-data-pipeline multimodal columns
(SURVEY.md §2.8 "multimodal"), replacing the former PIL-injected seam for
the dominant web image format.
"""

from __future__ import annotations

import struct

import numpy as np

from .media_codecs import UnsupportedMediaError

# zigzag scan order → raster index within the 8x8 block (T.81 Figure 5)
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# IDCT basis: T[u, x] = c(u)/2 * cos((2x+1) u pi / 16); spatial = T' F T
_U = np.arange(8, dtype=np.float64)
_IDCT_T = np.cos((2 * _U[None, :] + 1) * _U[:, None] * np.pi / 16) * np.where(
    _U[:, None] == 0, 1 / np.sqrt(2), 1.0
) / 2.0

# same hostile-header cap as the PNG decoder: declared dims are
# attacker-controlled in a web corpus
_MAX_PIXELS = 64 * 1024 * 1024


class _Huff:
    """Canonical Huffman table as the spec's DECODE procedure arrays
    (T.81 §F.2.2.3): mincode/maxcode/valptr per code length."""

    __slots__ = ("mincode", "maxcode", "valptr", "values")

    def __init__(self, counts: bytes, values: bytes):
        self.values = values
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            n = counts[ln - 1]
            self.valptr[ln] = k
            self.mincode[ln] = code
            self.maxcode[ln] = code + n - 1 if n else -1
            code = (code + n) << 1
            k += n


class _BitReader:
    """MSB-first bit reader over one unstuffed entropy segment."""

    __slots__ = ("data", "pos", "buf", "cnt")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.cnt = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise UnsupportedMediaError("JPEG entropy data exhausted mid-block")
        self.buf = (self.buf << 8) | self.data[self.pos]
        self.pos += 1
        self.cnt += 8

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        while self.cnt < n:
            self._fill()
        self.cnt -= n
        v = (self.buf >> self.cnt) & ((1 << n) - 1)
        self.buf &= (1 << self.cnt) - 1
        return v

    def decode(self, table: _Huff) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.receive(1)
            if code <= table.maxcode[ln]:
                return table.values[table.valptr[ln] + code - table.mincode[ln]]
        raise UnsupportedMediaError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 §F.2.2.1 EXTEND: map the t received bits to a signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _split_scan(payload: bytes, pos: int) -> tuple[list[bytes], int]:
    """Collect entropy-coded bytes from ``pos`` until the next real marker,
    unstuffing 0xFF00 and splitting at RSTn boundaries. → (segments,
    end_pos_of_scan)."""
    segs: list[bytes] = []
    cur = bytearray()
    n = len(payload)
    i = pos
    while i < n:
        b = payload[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        # 0xFF: look at the next byte
        if i + 1 >= n:
            break
        m = payload[i + 1]
        if m == 0x00:  # stuffed data byte
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn: segment boundary
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        elif m == 0xFF:  # fill byte
            i += 1
        else:  # a real marker ends the scan
            break
    segs.append(bytes(cur))
    return segs, i


def _resolve_arith_scan(scan, by_id) -> list[dict]:
    """Bind an arithmetic scan's component selectors: table ids select
    statistics areas and DAC conditioning (defaults L=0/U=1, Kx=5 per
    T.81 §F.1.4.4.1.2/§F.1.4.4.2) instead of Huffman tables."""
    dac_dc, dac_ac = scan["dac"]
    order = []
    for cid, tdta in scan["sel"]:
        if cid not in by_id:
            raise UnsupportedMediaError("JPEG scan references unknown component")
        td, ta = tdta >> 4, tdta & 15
        order.append(
            {
                "c": by_id[cid],
                "dc_tbl": td,
                "ac_tbl": ta,
                "dc_cond": dac_dc.get(td, (0, 1)),
                "ac_cond": dac_ac.get(ta, 5),
            }
        )
    return order


def _resolve_scan(scan, by_id, need_dc: bool, need_ac: bool) -> list[dict]:
    """Bind a scan's component selectors to the frame components and check
    the Huffman tables it references exist (in the DHT state snapshotted
    at this scan's SOS)."""
    order = []
    ht = scan["htables"]
    for cid, tdta in scan["sel"]:
        if cid not in by_id:
            raise UnsupportedMediaError("JPEG scan references unknown component")
        c = by_id[cid]
        td, ta = tdta >> 4, tdta & 15
        if need_dc and (0, td) not in ht:
            raise UnsupportedMediaError("JPEG references missing Huffman table")
        if need_ac and (1, ta) not in ht:
            raise UnsupportedMediaError("JPEG references missing Huffman table")
        order.append({"c": c, "dc": ht.get((0, td)), "ac": ht.get((1, ta))})
    return order


class _RestartReader:
    """Iterates a scan's entropy segments: a fresh _BitReader after every
    DRI-many units (restart resets DC predictors and the EOB run)."""

    __slots__ = ("segs", "dri", "i", "reader", "unit")

    def __init__(self, segs, dri):
        self.segs = segs
        self.dri = dri
        self.i = 0
        self.reader = _BitReader(segs[0])
        self.unit = 0

    def next_unit(self) -> bool:
        """Advance the unit counter; True iff a restart boundary was
        crossed (caller must reset predictors / EOB run)."""
        if self.dri and self.unit and self.unit % self.dri == 0:
            self.i += 1
            if self.i >= len(self.segs):
                raise UnsupportedMediaError("JPEG missing restart segment")
            self.reader = _BitReader(self.segs[self.i])
            self.unit += 1
            return True
        self.unit += 1
        return False


def _decode_baseline_scan(
    order, scan, mcx, mcy, dc_max=11, ac_max=10, dpcm=True
) -> None:
    """Sequential DCT scan (T.81 §F.2): DC diff + AC run-length per block,
    all components interleaved per MCU. ``dc_max``/``ac_max`` are the
    legal Huffman category bounds for the frame's sample precision
    (T.81 Tables F.1/F.2: 11/10 for 8-bit, 15/14 for 12-bit).
    ``dpcm=False`` is the hierarchical differential-frame variant where
    the DC prediction is always zero (T.81 Annex J)."""
    rr = _RestartReader(scan["segs"], scan["dri"])
    preds = [0] * len(order)
    for m in range(mcx * mcy):
        if rr.next_unit():
            preds = [0] * len(order)
        reader = rr.reader
        my, mx = divmod(m, mcx)
        for ci, oc in enumerate(order):
            c, dc_t, ac_t = oc["c"], oc["dc"], oc["ac"]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    blk = c["coef"][my * c["v"] + by, mx * c["h"] + bx]
                    t = reader.decode(dc_t)
                    if t > dc_max:
                        raise UnsupportedMediaError("bad JPEG DC category")
                    d = _extend(reader.receive(t), t)
                    if dpcm:
                        preds[ci] += d
                        d = preds[ci]
                    blk[0] = d
                    k = 1
                    while k < 64:
                        rs = reader.decode(ac_t)
                        r, s = rs >> 4, rs & 15
                        if s > ac_max:
                            # AC categories are 1..10 (8-bit) / 1..14
                            # (12-bit) per T.81 Table F.2; hostile tables
                            # can emit up to 15, whose dequant product
                            # silently wraps — mirror the DC check above
                            raise UnsupportedMediaError("bad JPEG AC category")
                        if s == 0:
                            if r != 15:
                                break  # EOB
                            k += 16
                            continue
                        k += r
                        if k > 63:
                            raise UnsupportedMediaError("JPEG AC run past block end")
                        blk[k] = _extend(reader.receive(s), s)
                        k += 1


def _decode_progressive_scan(
    scan, by_id, mcx, mcy, dc_max=11, ac_max=10, dpcm=True
) -> None:
    """One SOF2 scan (T.81 §G.2): DC scans (Ss=0) are interleaved over the
    scan's components; AC scans (Ss>0) carry exactly one component in its
    own data-unit raster. Ah=0 is the first pass for the band, Ah>0 a
    successive-approximation refinement adding bit Al. ``dpcm=False`` is
    the hierarchical differential variant (SOF6): DC prediction is always
    zero (T.81 Annex J); the AC procedures are unchanged."""
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    if not (0 <= ss <= se <= 63 and al <= 13):
        raise UnsupportedMediaError("bad JPEG progressive scan parameters")
    if ss == 0:
        if se != 0:
            raise UnsupportedMediaError("JPEG DC scan with Se != 0")
        order = _resolve_scan(scan, by_id, need_dc=ah == 0, need_ac=False)
        rr = _RestartReader(scan["segs"], scan["dri"])
        preds = [0] * len(order)
        for m in range(mcx * mcy):
            if rr.next_unit():
                preds = [0] * len(order)
            reader = rr.reader
            my, mx = divmod(m, mcx)
            for ci, oc in enumerate(order):
                c = oc["c"]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = c["coef"][my * c["v"] + by, mx * c["h"] + bx]
                        if ah == 0:  # first DC pass: diff-coded, scaled
                            t = reader.decode(oc["dc"])
                            if t > dc_max:
                                raise UnsupportedMediaError("bad JPEG DC category")
                            d = _extend(reader.receive(t), t)
                            if dpcm:
                                preds[ci] += d
                                d = preds[ci]
                            blk[0] = d << al
                        else:  # refinement: one bit per block
                            if reader.receive(1):
                                blk[0] |= 1 << al
        return

    # AC scan: exactly one component (T.81 §G.1.1.1)
    if len(scan["sel"]) != 1:
        raise UnsupportedMediaError("JPEG progressive AC scan with >1 component")
    oc = _resolve_scan(scan, by_id, need_dc=False, need_ac=True)[0]
    c, ac_t = oc["c"], oc["ac"]
    bw, bh = c["bw"], c["bh"]
    rr = _RestartReader(scan["segs"], scan["dri"])
    eobrun = 0
    for m in range(bw * bh):
        if rr.next_unit():
            eobrun = 0
        reader = rr.reader
        blk = c["coef"][m // bw, m % bw]
        if ah == 0:
            # first AC pass for this band (§G.1.2.2): run-length + EOBn
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = reader.decode(ac_t)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r < 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.receive(r)
                        break
                    k += 16  # ZRL
                    continue
                if s > ac_max:
                    raise UnsupportedMediaError("bad JPEG AC category")
                k += r
                if k > se:
                    raise UnsupportedMediaError("JPEG AC run past band end")
                blk[k] = _extend(reader.receive(s), s) << al
                k += 1
        else:
            # AC refinement (§G.1.2.3): correction bits for known-nonzero
            # coefficients, newly-nonzero values are ±1<<al
            bit = 1 << al
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = reader.decode(ac_t)
                    r, s = rs >> 4, rs & 15
                    val = 0
                    if s == 0:
                        if r < 15:
                            eobrun = (1 << r)
                            if r:
                                eobrun += reader.receive(r)
                            break  # remaining coeffs handled below
                        # ZRL: skip 16 zero-history coefficients
                    else:
                        if s != 1:
                            raise UnsupportedMediaError(
                                "bad JPEG AC refinement magnitude")
                        val = bit if reader.receive(1) else -bit
                    while k <= se:
                        if blk[k] != 0:
                            if reader.receive(1) and not (blk[k] & bit):
                                blk[k] += bit if blk[k] > 0 else -bit
                        else:
                            if r == 0:
                                if val:
                                    blk[k] = val
                                k += 1
                                break
                            r -= 1
                        k += 1
                    else:
                        if val:
                            raise UnsupportedMediaError(
                                "JPEG AC refinement run past band end")
            if eobrun > 0:
                # inside an EOB run: only correction bits for nonzeros
                while k <= se:
                    if blk[k] != 0:
                        if reader.receive(1) and not (blk[k] & bit):
                            blk[k] += bit if blk[k] > 0 else -bit
                    k += 1
                eobrun -= 1


def _decode_lossless_scan(order, scan, H, W, prec, pt):
    """Lossless scan (T.81 Annex H): one sample per component per MCU,
    interleaved; Huffman codes give the CATEGORY of the prediction
    difference (0..16 — category 16 is the special 32768 difference with
    no appended bits), reconstruction is (Px + diff) mod 2^16, and the
    decoder output is Rx << Pt (H.2.3). Edge rules per H.1.2.1: the first
    sample of the scan (and the first of each component after a restart
    marker, H.2.2) predicts the default 2^(P-Pt-1); the rest of the first
    line predicts left (Ra); the first column predicts above (Rb);
    everything else uses the scan's selected predictor 1-7. The
    per-sample Python walk is the same cost class as the entropy decode
    itself (both inherently sequential); there is nothing to vectorize
    past it. → list of (H, W) int64 planes."""
    default = 1 << (prec - 1 - pt)
    sel = scan["ss"]
    planes = [np.zeros((H, W), dtype=np.int32) for _ in order]
    fresh = [True] * len(order)
    rr = _RestartReader(scan["segs"], scan["dri"])
    for k in range(H * W):
        y, x = divmod(k, W)
        if rr.next_unit():
            fresh = [True] * len(order)
        reader = rr.reader
        for ci, oc in enumerate(order):
            t = reader.decode(oc["dc"])
            if t > 16:
                raise UnsupportedMediaError("bad lossless JPEG category")
            d = 32768 if t == 16 else _extend(reader.receive(t), t)
            out = planes[ci]
            if fresh[ci]:
                px = default
                fresh[ci] = False
            elif y == 0:
                px = out[0, x - 1]
            elif x == 0:
                px = out[y - 1, 0]
            else:
                a = int(out[y, x - 1])
                b = int(out[y - 1, x])
                c = int(out[y - 1, x - 1])
                if sel == 1:
                    px = a
                elif sel == 2:
                    px = b
                elif sel == 3:
                    px = c
                elif sel == 4:
                    px = a + b - c
                elif sel == 5:
                    px = a + ((b - c) >> 1)
                elif sel == 6:
                    px = b + ((a - c) >> 1)
                else:
                    px = (a + b) >> 1
            out[y, x] = (int(px) + d) & 0xFFFF
    return [p.astype(np.int64) << pt for p in planes]


def _exp_upsample(plane: np.ndarray, eh: int, ev: int) -> np.ndarray:
    """T.81 J.1.1.2 hierarchical reference expansion: double along each
    requested axis — even output samples copy the input, odd ones are the
    rounded mean of the two neighbors, the last one replicates the edge."""
    if eh:
        h, w = plane.shape
        out = np.empty((h, 2 * w), dtype=plane.dtype)
        out[:, 0::2] = plane
        if w > 1:
            out[:, 1:-1:2] = (plane[:, :-1] + plane[:, 1:] + 1) >> 1
        out[:, -1] = plane[:, -1]
        plane = out
    if ev:
        h, w = plane.shape
        out = np.empty((2 * h, w), dtype=plane.dtype)
        out[0::2] = plane
        if h > 1:
            out[1:-1:2] = (plane[:-1] + plane[1:] + 1) >> 1
        out[-1] = plane[-1]
        plane = out
    return plane


def decode_jpeg(payload: bytes) -> tuple[np.ndarray, int]:
    """→ ((H, W) gray or (H, W, 3) RGB array, maxval) — uint8/255 for
    8-bit frames, uint16 with maxval (1<<P)-1 for 12-bit DCT (SOF1/SOF2)
    and 2..16-bit lossless (SOF3) frames. Hierarchical streams (T.81
    Annex J: DHP + a non-differential first frame + EXP-expanded
    SOF5/SOF6 differential correction frames) decode too."""
    if payload[:3] != b"\xff\xd8\xff":
        raise UnsupportedMediaError("not a JPEG payload")

    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _Huff] = {}  # (class 0=DC/1=AC, id)
    dac_dc: dict[int, tuple[int, int]] = {}  # DAC conditioning: id → (L, U)
    dac_ac: dict[int, int] = {}  # id → Kx
    frames: list[dict] = []  # one per SOF; >1 only in hierarchical mode
    dhp = None  # hierarchical full-resolution header (DHP marker)
    pending_exp = None  # EXP marker state, consumed by the next frame
    dri = 0
    adobe_transform = None  # APP14 "Adobe" color-transform flag

    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise UnsupportedMediaError("JPEG marker sync lost")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + ln]
        if len(body) != ln - 2:
            raise UnsupportedMediaError("truncated JPEG segment")
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                i += 1
                if pq > 1:
                    raise UnsupportedMediaError(f"bad JPEG DQT precision {pq}")
                # length check BEFORE frombuffer: an odd-length truncated
                # 16-bit table raises ValueError from frombuffer otherwise
                if len(body) - i < 64 * (1 + pq):
                    raise UnsupportedMediaError("truncated JPEG DQT")
                if pq == 0:
                    q = np.frombuffer(body[i : i + 64], dtype=np.uint8)
                    i += 64
                else:
                    q = np.frombuffer(body[i : i + 128], dtype=">u2")
                    i += 128
                qtables[tq] = q.astype(np.int32)
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 15
                counts = body[i + 1 : i + 17]
                nv = sum(counts)
                values = body[i + 17 : i + 17 + nv]
                if len(values) != nv:
                    raise UnsupportedMediaError("truncated JPEG DHT")
                htables[(tc, th)] = _Huff(counts, values)
                i += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC9, 0xCA, 0xDE):
            # SOF0 baseline (8-bit only per T.81 §B.2.2) / SOF1 extended
            # sequential / SOF2 progressive DCT (both 8- or 12-bit) /
            # SOF3 lossless (2..16-bit, T.81 Annex H) / SOF5+SOF6
            # differential sequential/progressive DCT (hierarchical
            # correction frames, T.81 Annex J) / SOF9 extended sequential
            # + SOF10 progressive with ARITHMETIC entropy coding (T.81
            # Annex F QM-coder, operators/jpeg_arith.py) / DHP (0xDE,
            # hierarchical full-resolution header — same body syntax)
            if len(body) < 6:
                raise UnsupportedMediaError("truncated JPEG SOF body")
            prec, H, W, nc = struct.unpack_from(">BHHB", body, 0)
            if marker == 0xC3:
                if not 2 <= prec <= 16:
                    raise UnsupportedMediaError(f"JPEG precision {prec} not supported")
            elif prec != 8 and not (prec == 12 and marker != 0xC0):
                raise UnsupportedMediaError(f"JPEG precision {prec} not supported")
            if nc not in (1, 3):
                raise UnsupportedMediaError(f"{nc}-component JPEG not supported")
            if W <= 0 or H <= 0 or W * H > _MAX_PIXELS:
                raise UnsupportedMediaError(f"JPEG dimensions {W}x{H} rejected")
            if len(body) < 6 + 3 * nc:
                raise UnsupportedMediaError("truncated JPEG SOF components")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * c)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            if marker == 0xDE:
                if dhp is not None or frames:
                    raise UnsupportedMediaError("JPEG DHP after first frame")
                dhp = (H, W, comps, prec)
            else:
                if len(frames) >= 16:
                    # hostile-header guard: each frame's decode walk is
                    # MCU-bounded, but an attacker could stack frames
                    raise UnsupportedMediaError("too many JPEG frames")
                frames.append({
                    "sof": (H, W, comps, prec),
                    "progressive": marker in (0xC2, 0xC6, 0xCA),
                    "lossless": marker == 0xC3,
                    "arithmetic": marker in (0xC9, 0xCA),
                    "differential": marker in (0xC5, 0xC6),
                    "exp": pending_exp,
                    "scans": [],
                })
                pending_exp = None
        elif marker in (0xC7, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedMediaError(
                f"JPEG mode SOF{marker - 0xC0} (differential-lossless/"
                "differential-arithmetic/lossless-arithmetic) not supported"
            )
        elif marker == 0xDF:  # EXP — expand hierarchical reference (J.1)
            if not body:
                raise UnsupportedMediaError("truncated JPEG EXP body")
            eh, ev = body[0] >> 4, body[0] & 15
            if eh > 1 or ev > 1 or not (eh or ev):
                raise UnsupportedMediaError("bad JPEG EXP expansion")
            pending_exp = (eh, ev)
        elif marker == 0xCC:  # DAC — arithmetic conditioning (T.81 §B.2.4.3)
            i = 0
            while i + 2 <= len(body):
                tc, tb = body[i] >> 4, body[i] & 15
                cs = body[i + 1]
                i += 2
                if tc == 0:
                    low, up = cs & 15, cs >> 4
                    if low > up or up > 15:
                        raise UnsupportedMediaError("bad JPEG DAC DC conditioning")
                    dac_dc[tb] = (low, up)
                elif tc == 1:
                    if not 1 <= cs <= 63:
                        raise UnsupportedMediaError("bad JPEG DAC AC conditioning")
                    dac_ac[tb] = cs
                else:
                    raise UnsupportedMediaError("bad JPEG DAC table class")
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise UnsupportedMediaError("truncated JPEG DRI body")
            (dri,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xEE:  # APP14 — Adobe color-transform declaration
            if body[:5] == b"Adobe" and len(body) >= 12:
                adobe_transform = body[11]
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if not body:
                raise UnsupportedMediaError("truncated JPEG SOS body")
            ns = body[0]
            if len(body) < 4 + 2 * ns:
                raise UnsupportedMediaError("truncated JPEG SOS components")
            sel = [(body[1 + 2 * i], body[2 + 2 * i]) for i in range(ns)]
            ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            if not frames:
                raise UnsupportedMediaError("JPEG SOS before SOF")
            # arithmetic scans use the same 0xFF00 byte stuffing as
            # Huffman ones (the QM byte feed sees unstuffed data and
            # reads zeros past the terminating marker)
            segs, pos = _split_scan(payload, pos + 2 + ln)
            frames[-1]["scans"].append({
                "sel": sel, "ss": ss, "se": se,
                "ah": ahal >> 4, "al": ahal & 15,
                "segs": segs, "htables": dict(htables), "dri": dri,
                "dac": (dict(dac_dc), dict(dac_ac)),
            })
            if dhp is None and not frames[-1]["progressive"]:
                break  # single-scan sequential: decode what we have
            continue  # keep walking (more scans / frames / DHT / EOI)
        # APPn / COM / others: skip
        pos += 2 + ln

    if not frames or any(not f["scans"] for f in frames):
        raise UnsupportedMediaError("JPEG missing SOF/SOS")
    if dhp is None:
        if len(frames) > 1:
            raise UnsupportedMediaError("multiple JPEG frames without DHP")
        if frames[0]["differential"] or frames[0]["exp"]:
            raise UnsupportedMediaError("JPEG differential frame without DHP")
    else:
        return _decode_hierarchical(dhp, frames, qtables, adobe_transform)

    frame = frames[0]
    scans = frame["scans"]
    H, W, comps, prec = frame["sof"]
    mid, maxval = 1 << (prec - 1), (1 << prec) - 1
    out_dtype = np.uint8 if prec == 8 else np.uint16

    if frame["lossless"]:  # SOF3: no quant tables, no MCU blocking, no IDCT
        scan = scans[0]
        for c in comps:
            if len(comps) > 1 and (c["h"] != 1 or c["v"] != 1):
                raise UnsupportedMediaError("subsampled lossless JPEG not supported")
        if len(scan["sel"]) != len(comps):
            raise UnsupportedMediaError("non-interleaved multi-scan JPEG not supported")
        pt = scan["al"]
        if not 1 <= scan["ss"] <= 7 or scan["ah"] != 0 or pt >= prec:
            raise UnsupportedMediaError("bad lossless JPEG scan parameters")
        order = _resolve_scan(scan, {c["id"]: c for c in comps}, True, False)
        raw = _decode_lossless_scan(order, scan, H, W, prec, pt)
        out_dtype = np.uint8 if prec <= 8 else np.uint16
        planes = [np.clip(p, 0, maxval).astype(out_dtype) for p in raw]
        if len(planes) == 1:
            return planes[0], maxval
        # T.81 defines NO color transform for lossless; only an explicit
        # Adobe APP14 transform=1 declares the planes as YCbCr
        if adobe_transform == 1:
            y0, cb, cr = (p.astype(np.float64) for p in planes)
            ctr = float(mid)
            rgb = np.stack(
                [
                    y0 + 1.402 * (cr - ctr),
                    y0 - 0.344136 * (cb - ctr) - 0.714136 * (cr - ctr),
                    y0 + 1.772 * (cb - ctr),
                ],
                axis=-1,
            )
            return np.clip(np.round(rgb), 0, maxval).astype(out_dtype), maxval
        return np.stack(planes, axis=-1), maxval

    comps, spatial, hmax, vmax = _dct_decode_spatial(frame, qtables)
    planes = []
    for c, sp in zip(comps, spatial):
        px = np.clip(np.round(sp) + mid, 0, maxval).astype(out_dtype)
        px = np.repeat(px, vmax // c["v"], axis=0)
        px = np.repeat(px, hmax // c["h"], axis=1)
        planes.append(px[:H, :W])
    return _finish_color(planes, comps, adobe_transform, mid, maxval, out_dtype)


def _dct_decode_spatial(frame, qtables, differential: bool = False):
    """Decode one DCT frame's scans → (comps, per-component float64 IDCT
    output planes at each component's OWN sample resolution — no level
    shift, no clipping — hmax, vmax). Shared by the single-frame path
    (which level-shifts and clips) and the hierarchical path (which adds
    differential planes onto the running reference, T.81 Annex J). In
    differential frames the DC prediction is always zero (no DPCM across
    blocks) and the category bounds widen to 15/14 — difference images
    span twice the source range; the int64 dequant below keeps the wide
    categories overflow-safe."""
    H, W, comps, prec = frame["sof"]
    scans = frame["scans"]
    if differential:
        dc_max, ac_max = 15, 14
    else:
        dc_max, ac_max = (11, 10) if prec == 8 else (15, 14)

    # frame geometry: sampling factors / MCU grid over ALL components
    if len(comps) == 1:
        # single-component frame: data units are the component's own
        # ceil(W/8) x ceil(H/8) raster; no MCU padding (T.81 A.2.2)
        comps[0]["h"] = comps[0]["v"] = 1
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        if c["h"] < 1 or c["v"] < 1 or hmax % c["h"] or vmax % c["v"]:
            raise UnsupportedMediaError("unsupported JPEG sampling factors")
    mcx = (W + 8 * hmax - 1) // (8 * hmax)
    mcy = (H + 8 * vmax - 1) // (8 * vmax)
    by_id = {c["id"]: c for c in comps}
    for c in comps:
        if c["tq"] not in qtables:
            raise UnsupportedMediaError("JPEG references missing quant table")
        c["coef"] = np.zeros((mcy * c["v"], mcx * c["h"], 64), dtype=np.int32)
        # the component's own data-unit grid (non-interleaved scans)
        c["bw"] = (-(-W * c["h"] // hmax) + 7) // 8
        c["bh"] = (-(-H * c["v"] // vmax) + 7) // 8

    if frame["arithmetic"]:
        from .jpeg_arith import decode_arith_progressive, decode_arith_sequential

        if not frame["progressive"]:
            scan = scans[0]
            if len(scan["sel"]) != len(comps):
                raise UnsupportedMediaError(
                    "non-interleaved multi-scan JPEG not supported")
            order = _resolve_arith_scan(scan, by_id)
            decode_arith_sequential(order, scan, mcx, mcy)
        else:
            for scan in scans:
                order = _resolve_arith_scan(scan, by_id)
                decode_arith_progressive(scan, order, mcx, mcy)
    elif not frame["progressive"]:
        scan = scans[0]
        if len(scan["sel"]) != len(comps):
            raise UnsupportedMediaError(
                "non-interleaved multi-scan JPEG not supported")
        order = _resolve_scan(scan, by_id, need_dc=True, need_ac=True)
        _decode_baseline_scan(
            order, scan, mcx, mcy, dc_max, ac_max, dpcm=not differential)
    else:
        for scan in scans:
            _decode_progressive_scan(
                scan, by_id, mcx, mcy, dc_max, ac_max, dpcm=not differential)

    # --- vectorized reconstruction: dequant → zigzag → IDCT → planes ---
    spatial_planes = []
    for c in comps:
        bh, bw, _ = c["coef"].shape
        # int64: a 12-bit DC category-15 value (±32767) against a 16-bit
        # quant entry sits exactly at the int32 edge — don't flirt with it
        flat = c["coef"].reshape(-1, 64).astype(np.int64) * qtables[c["tq"]][None, :]
        fblk = np.zeros((flat.shape[0], 64), dtype=np.float64)
        fblk[:, _ZIGZAG] = flat
        spatial = np.einsum(
            "ux,nuv,vy->nxy", _IDCT_T, fblk.reshape(-1, 8, 8), _IDCT_T
        )
        plane = (
            spatial.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        ch = -(-H * c["v"] // vmax)
        cw = -(-W * c["h"] // hmax)
        spatial_planes.append(plane[:ch, :cw])
    return comps, spatial_planes, hmax, vmax


def _decode_hierarchical(dhp, frames, qtables, adobe_transform):
    """T.81 Annex J: a DHP header, a non-differential first frame at
    reduced resolution, then EXP-expanded Huffman differential correction
    frames (SOF5 sequential / SOF6 progressive). The running reference is
    kept per component at that component's sample resolution and clamped
    to [0, maxval] after every frame; the final frame must land on the
    DHP's declared dimensions. All frames must share the DHP's component
    ids and sampling factors (subsets / resolution-changing sampling
    switches are out of scope and fail fast)."""
    Hd, Wd, dcomps, prec = dhp
    mid, maxval = 1 << (prec - 1), (1 << prec) - 1
    out_dtype = np.uint8 if prec == 8 else np.uint16
    if len(dcomps) == 1:
        sig = [(dcomps[0]["id"], 1, 1)]
    else:
        sig = [(c["id"], c["h"], c["v"]) for c in dcomps]
    ref = None
    last = None
    for fi, f in enumerate(frames):
        if f["lossless"]:
            raise UnsupportedMediaError(
                "lossless frame in hierarchical JPEG not supported")
        Hf, Wf, fcomps, fprec = f["sof"]
        if fprec != prec:
            raise UnsupportedMediaError("hierarchical JPEG precision mismatch")
        if fi == 0:
            if f["differential"] or f["exp"]:
                raise UnsupportedMediaError(
                    "hierarchical JPEG first frame must be non-differential")
            comps, spatial, hmax, vmax = _dct_decode_spatial(f, qtables)
            ref = [
                np.clip(np.round(sp) + mid, 0, maxval).astype(np.int32)
                for sp in spatial
            ]
        else:
            if not f["differential"]:
                raise UnsupportedMediaError(
                    "non-differential later frame in hierarchical JPEG")
            if f["exp"]:
                eh, ev = f["exp"]
                ref = [_exp_upsample(p, eh, ev) for p in ref]
            comps, spatial, hmax, vmax = _dct_decode_spatial(
                f, qtables, differential=True)
            new_ref = []
            for p, sp in zip(ref, spatial):
                gh, gw = sp.shape
                # align the (possibly EXP-doubled) reference to this
                # frame's component grid: crop the J.1.1.2 edge replica,
                # edge-pad defensively if a malformed stream runs short
                p = p[:gh, :gw]
                if p.shape != (gh, gw):
                    p = np.pad(
                        p,
                        ((0, gh - p.shape[0]), (0, gw - p.shape[1])),
                        mode="edge",
                    )
                new_ref.append(
                    np.clip(np.round(sp).astype(np.int64) + p, 0, maxval)
                    .astype(np.int32)
                )
            ref = new_ref
        if [(c["id"], c["h"], c["v"]) for c in comps] != sig:
            raise UnsupportedMediaError(
                "hierarchical JPEG frame component geometry != DHP")
        last = (Hf, Wf, comps, hmax, vmax)
    Hf, Wf, comps, hmax, vmax = last
    if (Hf, Wf) != (Hd, Wd):
        raise UnsupportedMediaError(
            "hierarchical JPEG final frame dimensions != DHP")
    planes = []
    for c, p in zip(comps, ref):
        px = p.astype(out_dtype)
        px = np.repeat(px, vmax // c["v"], axis=0)
        px = np.repeat(px, hmax // c["h"], axis=1)
        planes.append(px[:Hd, :Wd])
    return _finish_color(planes, comps, adobe_transform, mid, maxval, out_dtype)


def _finish_color(planes, comps, adobe_transform, mid, maxval, out_dtype):
    """Final color stage shared by the single-frame and hierarchical
    paths: gray passthrough, Adobe/RGB-component-id direct RGB, or the
    JFIF YCbCr→RGB transform."""
    if len(planes) == 1:
        return planes[0], maxval
    # 3-component color space: JFIF default is YCbCr; Adobe APP14
    # transform=0 (and the informal component-ID convention 'R','G','B')
    # mean the planes are already RGB and must NOT be color-transformed
    ids = [c["id"] for c in comps]
    if adobe_transform == 0 or (adobe_transform is None and ids == [0x52, 0x47, 0x42]):
        return np.stack(planes, axis=-1), maxval
    y, cb, cr = (p.astype(np.float64) for p in planes)
    ctr = float(mid)  # chroma zero point scales with precision (T.81 A.3.1)
    r = y + 1.402 * (cr - ctr)
    g = y - 0.344136 * (cb - ctr) - 0.714136 * (cr - ctr)
    b = y + 1.772 * (cb - ctr)
    rgb = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, maxval).astype(out_dtype)
    return rgb, maxval
