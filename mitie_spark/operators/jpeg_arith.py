"""JPEG arithmetic entropy decoding (ITU-T T.81 Annex F, QM-coder).

Decodes the arithmetic-coded DCT modes — SOF9 (extended sequential) and
SOF10 (progressive) — that previously routed to the injected-decoder
seam. The earlier round's rationale for leaving this seam open was "no
arithmetic-capable producer exists in this sandbox to cross-validate
against"; the system libjpeg (jpeglib.h + libjpeg.so, driven by the
compiled tests/cross_engine/probe_jpegarith.c) removes that objection,
so the seam is now closed with a differential gate: the same pixels
encoded by libjpeg with Huffman AND with arithmetic coding must decode
to bit-identical output through this repo's decoder, because entropy
coding is lossless over the quantized coefficients.

Contents:

- the 113-state probability estimation machine of T.81 Table D.3
  (Qe / Next_MPS / Next_LPS / Switch — transcribed from the spec and
  byte-verified against the compiled libjpeg's copy of the table), plus
  the non-adapting index-113 "fixed" bin used for AC signs and DC/AC
  refinement bits,
- the QM decoder registers and procedures (INITDEC / DECODE with
  conditional MPS/LPS exchange / RENORMD / BYTEIN with the 0xFF
  bit-stuffing and marker-detection rules of §F.2.2.1 — note arithmetic
  scans do NOT use Huffman's 0xFF00 byte unstuffing),
- the DC and AC statistical models (§F.2.2.4-5: DC difference
  classification contexts from the L/U conditioning bounds, AC
  end-of-block / significance / magnitude-category decision trees with
  the Kx conditioning split), and the four progressive decision
  sequences (§G.3: DC first/refine, AC first/refine).

Statistics bins hold (index | MPS<<7) in one byte exactly as the spec's
flowcharts update them; each restart interval re-initializes the
decoder registers and zeroes all statistics.
"""

from __future__ import annotations

from .media_codecs import UnsupportedMediaError

# T.81 Table D.3: (Qe, Next_Index_MPS, Next_Index_LPS, Switch_MPS) per
# state, plus the extra non-adapting entry 113 (Qe≈0.5, transitions to
# itself) used for fixed-probability decisions. Packed as
# qe(4 hex) nmps(2) nlps(2) switch(1), semicolon-joined.
_TAB_PACKED = (
    "5a1d01011;2586020e0;111403100;080b04120;03d805140;01da06170;00e507190;"
    "006f081c0;0036091e0;001a0a210;000d0b230;00060c090;00030d0a0;00010d0c0;"
    "5a7f0f0f1;3f2510240;2cf211260;207c12270;17b913280;1182142a0;0cef152b0;"
    "09a1162d0;072f172e0;055c18300;040619310;03031a330;02401b340;01b11c360;"
    "01441d380;00f51e390;00b71f3b0;008a203c0;0068213e0;004e223f0;003b23200;"
    "002c09210;5ae125251;484c26400;3a0d27410;2ef128430;261f29440;1f332a450;"
    "19a82b460;15182c480;11772d490;0e742e4a0;0bfb2f4b0;09f8304d0;0861314e0;"
    "0706324f0;05cd33300;04de34320;040f35320;036336330;02d437340;025c38350;"
    "01f839360;01a43a370;01603b380;01253c390;00f63d3a0;00cb3e3b0;00ab3f3d0;"
    "008f203d0;5b1241411;4d0442500;412c43510;37d844520;2fe845530;293c46540;"
    "237947560;1edf48570;1aa949570;174e4a480;14244b480;119c4c4a0;0f6b4d4a0;"
    "0d514e4b0;0bb64f4d0;0a40304d0;583251501;4d1c52580;438e53590;3bdd545a0;"
    "34ee555b0;2eae565c0;299a575d0;251647560;557059581;4ca95a5f0;44d95b600;"
    "3e225c610;38245d630;32b45e630;2e17565d0;56a8605f1;4f4661650;47e562660;"
    "41cf63670;3c3d64680;375e5d630;523166690;4c0f676a0;4639686b0;415e63670;"
    "56276a691;50e76b6c0;4b85676d0;55976d6e0;504f6b6f0;5a106f6e1;55226d700;"
    "59eb6f701;5a1d71710"
)
_TAB = tuple(
    (int(s[0:4], 16), int(s[4:6], 16), int(s[6:8], 16), int(s[8], 16))
    for s in _TAB_PACKED.split(";")
)
assert len(_TAB) == 114 and _TAB[0] == (0x5A1D, 1, 1, 1)

_FIXED = 113  # non-adapting state for 0.5-probability decisions


class QMDecoder:
    """QM arithmetic decoder over one entropy segment (one restart
    interval, already 0xFF00-unstuffed and marker-terminated by
    jpeg.py's _split_scan — the arithmetic segments use the same byte
    stuffing as Huffman ones).

    Register geometry matches the de-facto producer convention
    (established by differential disassembly of the system libjpeg's
    decoder, which defines the arithmetic-JPEG ecosystem; T.81's Annex F
    "software conventions" flowcharts describe an equivalent coder with
    a different register alignment): ``a`` holds the interval (0x10000
    at init, kept > 0x7FFF by renormalization), ``c`` accumulates raw
    stream bytes and is never shifted, and ``ct`` aligns the two —
    decisions compare ``c`` against ``(a - qe) << ct``. Renormalization
    is DEFERRED to the start of the next decision, and once the segment
    is exhausted the byte feed supplies zeros."""

    __slots__ = ("data", "bp", "c", "a", "ct")

    def __init__(self, data: bytes):
        self.data = data
        self.bp = 0
        self.c = 0
        self.a = 0
        self.ct = -16  # primes the init path: two byte fetches, a=0x10000

    def decode(self, st: bytearray, i: int) -> int:
        """One binary decision against statistics bin st[i] (low 7 bits:
        state index, bit 7: current MPS sense), with conditional
        MPS/LPS exchange per T.81 §F.2.2.2-3."""
        a = self.a
        c = self.c
        ct = self.ct
        # deferred renormalization + byte feed
        if a <= 0x7FFF:
            data = self.data
            n = len(data)
            bp = self.bp
            while True:
                ct -= 1
                if ct < 0:
                    b = data[bp] if bp < n else 0
                    bp += 1
                    c = (c << 8) | b
                    ct += 8
                    if ct < 0:  # only during the two init fetches
                        ct += 1
                        if ct == 0:
                            a = 0x10000
                            break
                a <<= 1
                if a > 0x7FFF:
                    break
            self.bp = bp
        sv = st[i]
        qe, nmps, nlps, sw = _TAB[sv & 0x7F]
        mps = sv >> 7
        a -= qe
        temp = a << ct
        if c >= temp:
            c -= temp
            self.c = c
            self.ct = ct
            self.a = qe
            if qe > a:  # conditional exchange: the MPS became smaller
                st[i] = (sv & 0x80) | nmps
                return mps
            if sw:
                mps ^= 1
            st[i] = (mps << 7) | nlps
            return (sv >> 7) ^ 1
        self.a = a
        self.c = c
        self.ct = ct
        if a > 0x7FFF:
            return mps  # no renorm pending ⇒ no estimation update
        if qe <= a:
            st[i] = (sv & 0x80) | nmps
            return mps
        if sw:
            mps ^= 1
        st[i] = (mps << 7) | nlps
        return (sv >> 7) ^ 1


class _ScanStats:
    """Per-scan statistics areas (zeroed at scan start and at every
    restart marker, §F.2.2.1): 64 DC bins + 256 AC bins per table id,
    DC prediction/context per component, one fixed bin."""

    def __init__(self, n_comps: int):
        self.dc: dict[int, bytearray] = {}
        self.ac: dict[int, bytearray] = {}
        self.dc_context = [0] * n_comps
        self.last_dc = [0] * n_comps
        self.fixed = bytearray([_FIXED])

    def dc_bins(self, tbl: int) -> bytearray:
        if tbl not in self.dc:
            self.dc[tbl] = bytearray(64)
        return self.dc[tbl]

    def ac_bins(self, tbl: int) -> bytearray:
        if tbl not in self.ac:
            self.ac[tbl] = bytearray(256)
        return self.ac[tbl]


def _decode_dc_diff(dec, stats, ci, tbl, cond) -> int:
    """§F.2.2.4: one DC difference. ``cond`` is the (L, U) conditioning
    pair from the DAC segment (defaults 0, 1)."""
    low, up = cond
    st = stats.dc_bins(tbl)
    ctx = stats.dc_context[ci]
    if dec.decode(st, ctx) == 0:
        stats.dc_context[ci] = 0
        return 0
    sign = dec.decode(st, ctx + 1)
    m = dec.decode(st, ctx + 2 + sign)
    pos = ctx + 2 + sign
    if m:
        pos = 20  # X1
        while dec.decode(st, pos):
            m <<= 1
            if m == 0x8000:
                raise UnsupportedMediaError("JPEG arithmetic DC magnitude overflow")
            pos += 1
    # conditioning category for the NEXT block of this component
    if m < ((1 << low) >> 1):
        stats.dc_context[ci] = 0
    elif m > ((1 << up) >> 1):
        stats.dc_context[ci] = 12 + 4 * sign
    else:
        stats.dc_context[ci] = 4 + 4 * sign
    v = m
    pos += 14  # magnitude-bit bins sit 14 past the category bin (F.4)
    while m := m >> 1:
        if dec.decode(st, pos):
            v |= m
    v += 1
    return -v if sign else v


def _decode_ac_coef(dec, stats, st, pos, tbl, k, kx) -> int:
    """§F.2.2.5: sign + magnitude of one nonzero AC coefficient whose
    significance decision already fired. ``pos`` is the bin offset of the
    current k (3*(k-1)); ``kx`` the AC conditioning split."""
    sign = dec.decode(stats.fixed, 0)
    pos += 2
    m = dec.decode(st, pos)
    if m:
        if dec.decode(st, pos):
            m = 2
            st = stats.ac_bins(tbl)
            pos = 189 if k <= kx else 217
            while dec.decode(st, pos):
                m <<= 1
                if m == 0x8000:
                    raise UnsupportedMediaError(
                        "JPEG arithmetic AC magnitude overflow"
                    )
                pos += 1
    v = m
    pos += 14
    while m := m >> 1:
        if dec.decode(st, pos):
            v |= m
    v += 1
    return -v if sign else v


def decode_arith_sequential(order, scan, mcx, mcy) -> None:
    """SOF9 sequential scan: the arithmetic analog of the Huffman
    baseline scan — DC difference then AC run decisions per block, all
    components interleaved per MCU. ``order`` entries carry the frame
    component dict plus dc/ac table ids and conditioning."""
    segs, dri = scan["segs"], scan["dri"]
    seg_i = 0
    dec = QMDecoder(segs[0])
    stats = _ScanStats(len(order))
    for m in range(mcx * mcy):
        if dri and m and m % dri == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise UnsupportedMediaError("JPEG missing restart segment")
            dec = QMDecoder(segs[seg_i])
            stats = _ScanStats(len(order))
        my, mx = divmod(m, mcx)
        for ci, oc in enumerate(order):
            c = oc["c"]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    blk = c["coef"][my * c["v"] + by, mx * c["h"] + bx]
                    stats.last_dc[ci] += _decode_dc_diff(
                        dec, stats, ci, oc["dc_tbl"], oc["dc_cond"]
                    )
                    blk[0] = stats.last_dc[ci]
                    tbl, kx = oc["ac_tbl"], oc["ac_cond"]
                    st = stats.ac_bins(tbl)
                    k = 1
                    while k <= 63:
                        pos = 3 * (k - 1)
                        if dec.decode(st, pos):  # EOB
                            break
                        while dec.decode(st, pos + 1) == 0:
                            pos += 3
                            k += 1
                            if k > 63:
                                raise UnsupportedMediaError(
                                    "JPEG arithmetic AC run past block end"
                                )
                        blk[k] = _decode_ac_coef(dec, stats, st, pos, tbl, k, kx)
                        st = stats.ac_bins(tbl)
                        k += 1


def decode_arith_progressive(scan, order, mcx, mcy) -> None:
    """SOF10 progressive scan (§G.3): DC scans interleaved over the
    scan's components, AC scans single-component over its own data-unit
    raster; Ah=0 first pass, Ah>0 successive-approximation refinement."""
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    if not (0 <= ss <= se <= 63 and al <= 13):
        raise UnsupportedMediaError("bad JPEG progressive scan parameters")
    segs, dri = scan["segs"], scan["dri"]

    if ss == 0:
        if se != 0:
            raise UnsupportedMediaError("JPEG DC scan with Se != 0")
        seg_i = 0
        dec = QMDecoder(segs[0])
        stats = _ScanStats(len(order))
        for m in range(mcx * mcy):
            if dri and m and m % dri == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    raise UnsupportedMediaError("JPEG missing restart segment")
                dec = QMDecoder(segs[seg_i])
                stats = _ScanStats(len(order))
            my, mx = divmod(m, mcx)
            for ci, oc in enumerate(order):
                c = oc["c"]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = c["coef"][my * c["v"] + by, mx * c["h"] + bx]
                        if ah == 0:
                            stats.last_dc[ci] += _decode_dc_diff(
                                dec, stats, ci, oc["dc_tbl"], oc["dc_cond"]
                            )
                            blk[0] = stats.last_dc[ci] << al
                        else:  # refinement: one fixed-probability bit
                            if dec.decode(stats.fixed, 0):
                                blk[0] |= 1 << al
        return

    # AC scan: one component
    if len(order) != 1:
        raise UnsupportedMediaError("JPEG progressive AC scan with >1 component")
    oc = order[0]
    c = oc["c"]
    tbl, kx = oc["ac_tbl"], oc["ac_cond"]
    bw, bh = c["bw"], c["bh"]
    seg_i = 0
    dec = QMDecoder(segs[0])
    stats = _ScanStats(1)
    for m in range(bw * bh):
        if dri and m and m % dri == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise UnsupportedMediaError("JPEG missing restart segment")
            dec = QMDecoder(segs[seg_i])
            stats = _ScanStats(1)
        blk = c["coef"][m // bw, m % bw]
        st = stats.ac_bins(tbl)
        if ah == 0:  # first pass for this band
            k = ss
            while k <= se:
                pos = 3 * (k - 1)
                if dec.decode(st, pos):  # EOB
                    break
                while dec.decode(st, pos + 1) == 0:
                    pos += 3
                    k += 1
                    if k > se:
                        raise UnsupportedMediaError(
                            "JPEG arithmetic AC run past band end"
                        )
                v = _decode_ac_coef(dec, stats, st, pos, tbl, k, kx)
                st = stats.ac_bins(tbl)
                blk[k] = v << al
                k += 1
        else:  # refinement (§G.3 analog of G.1.2.3)
            p1 = 1 << al
            m1 = -1 << al
            kex = se
            while kex > 0 and blk[kex] == 0:
                kex -= 1
            k = ss
            while k <= se:
                pos = 3 * (k - 1)
                if k > kex:
                    if dec.decode(st, pos):
                        break
                while True:
                    cur = blk[k]
                    if cur:  # previously nonzero: one correction bit
                        if dec.decode(st, pos + 2):
                            blk[k] = cur + (m1 if cur < 0 else p1)
                        break
                    if dec.decode(st, pos + 1):  # newly nonzero: ±1<<al
                        blk[k] = m1 if dec.decode(stats.fixed, 0) else p1
                        break
                    pos += 3
                    k += 1
                    if k > se:
                        raise UnsupportedMediaError(
                            "JPEG arithmetic AC refinement past band end"
                        )
                k += 1
