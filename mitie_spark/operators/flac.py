"""Pure-Python/NumPy FLAC decoder (RFC 9639 / the original format spec)
+ a spec-valid encoder used as the in-test producer.

Role in the engine: FLAC is the web's lossless audio container; together
with WAV (media_codecs.decode_wav) it makes the audio leg of the
multimodal path REAL decode instead of the injected-decoder seam — the
same posture as the image stack (PNG/JPEG/GIF/TIFF/WebP). No codec
library exists in this sandbox, so like JPEG the correctness gate is an
independent encoder (this module's ``encode_flac``, written from the
spec's *encoding* description: subframe selection, rice parameter
estimation, stereo decorrelation) plus hand-assembled known-answer
frames in tests/test_flac.py whose expected bits are computed in the
test by hand, both CRCs and the STREAMINFO MD5 enforced end to end.

Coverage: STREAMINFO + skipped metadata blocks; frame headers with all
block-size/sample-rate/sample-size encodings and the UTF-8-style coded
frame/sample number; CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32)
subframes with wasted bits; rice residual methods 0 and 1 including the
escape-to-raw partitions; all four channel assignments (independent,
left/side, right/side, mid/side); CRC-8 (header), CRC-16 (frame), MD5
(stream) all verified. Reserved/invalid codes raise
UnsupportedMediaError — the crawl-hostile fail-fast contract shared by
every decoder in operators/. Per-frame block sizes are taken from each
frame header as the spec directs (variable-blocksize streams decode;
no cross-frame consistency check is imposed beyond the checksums).

Numeric shape: residual entropy decode is bit-serial (like the JPEG
Huffman walk — bounded by the declared block size); everything after it
(fixed-predictor integration via repeated cumsum, stereo undo, MD5
byte packing) is vectorized int64 NumPy. LPC reconstruction is the one
genuinely sequential recurrence (order ≤ 32) and runs as a bounded
scalar loop.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from .media_codecs import UnsupportedMediaError

__all__ = ["decode_flac", "encode_flac"]

# ---------------------------------------------------------------------------
# CRCs (FLAC uses CRC-8 poly 0x07 init 0 for frame headers and CRC-16
# poly 0x8005 init 0 for whole frames)
# ---------------------------------------------------------------------------


def _make_crc8_table() -> np.ndarray:
    t = np.zeros(256, dtype=np.uint8)
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        t[i] = c
    return t


def _make_crc16_table() -> np.ndarray:
    t = np.zeros(256, dtype=np.uint16)
    for i in range(256):
        c = i << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        t[i] = c
    return t


_CRC8 = _make_crc8_table()
_CRC16 = _make_crc16_table()


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8[c ^ b])
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC16[((c >> 8) ^ b) & 0xFF]) ^ ((c << 8) & 0xFFFF)
    return c


# ---------------------------------------------------------------------------
# MSB-first bit reader
# ---------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("data", "pos")  # pos in BITS

    def __init__(self, data: bytes, byte_pos: int = 0):
        self.data = data
        self.pos = byte_pos * 8

    def read(self, n: int) -> int:
        p = self.pos
        end = p + n
        if end > len(self.data) * 8:
            raise UnsupportedMediaError("FLAC bitstream exhausted")
        self.pos = end
        first, last = p >> 3, (end + 7) >> 3
        acc = int.from_bytes(self.data[first:last], "big")
        return (acc >> ((last << 3) - end)) & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        # count zero bits until the terminating 1
        data, p = self.data, self.pos
        nbits = len(data) * 8
        q = 0
        while True:
            if p >= nbits:
                raise UnsupportedMediaError("FLAC bitstream exhausted")
            byte = data[p >> 3]
            rem = 8 - (p & 7)
            chunk = byte & ((1 << rem) - 1)
            if chunk == 0:
                q += rem
                p += rem
                continue
            lead = rem - chunk.bit_length()
            q += lead
            p += lead + 1
            self.pos = p
            return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    @property
    def byte_pos(self) -> int:
        return self.pos >> 3


# ---------------------------------------------------------------------------
# decoding
# ---------------------------------------------------------------------------

_BLOCKSIZE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608}
_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _read_coded_number(br: _BitReader) -> int:
    """The frame header's UTF-8-style variable-length number (up to 36
    bits / 7 bytes — wider than real UTF-8)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    probe = b0
    while probe & 0x40:
        n += 1
        probe <<= 1
    if n < 1 or n > 6:
        raise UnsupportedMediaError("bad FLAC coded number lead byte")
    v = b0 & (0x3F >> n)
    for _ in range(n):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise UnsupportedMediaError("bad FLAC coded number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _decode_residual(br: _BitReader, block_size: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise UnsupportedMediaError(f"reserved FLAC residual method {method}")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    porder = br.read(4)
    n_part = 1 << porder
    if block_size % n_part:
        raise UnsupportedMediaError("FLAC block size not divisible by partitions")
    if (block_size >> porder) < order:
        raise UnsupportedMediaError("bad FLAC partition order")
    out = np.empty(block_size - order, dtype=np.int64)
    idx = 0
    for part in range(n_part):
        n = (block_size >> porder) - (order if part == 0 else 0)
        if n < 0:
            raise UnsupportedMediaError("bad FLAC partition order")
        k = br.read(pbits)
        if k == escape:
            raw = br.read(5)
            if raw == 0:
                out[idx : idx + n] = 0
            else:
                for i in range(n):
                    out[idx + i] = br.read_signed(raw)
        else:
            read_unary = br.read_unary
            read = br.read
            for i in range(n):
                q = read_unary()
                v = (q << k) | read(k) if k else q
                out[idx + i] = (v >> 1) ^ -(v & 1)  # zigzag
        idx += n
    return out


def _integrate_fixed(warmup: np.ndarray, res: np.ndarray) -> np.ndarray:
    """Undo the order-o fixed difference predictor: o cumsums seeded by
    the successive finite differences of the warmup samples."""
    order = len(warmup)
    if order == 0:
        return res
    diffs = [warmup]
    for _ in range(order - 1):
        diffs.append(np.diff(diffs[-1]))
    cur = res
    for lvl in range(order - 1, -1, -1):
        cur = diffs[lvl][-1] + np.cumsum(cur)
    return np.concatenate([warmup, cur])


def _decode_subframe(br: _BitReader, block_size: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise UnsupportedMediaError("bad FLAC subframe padding bit")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise UnsupportedMediaError("FLAC wasted bits exceed sample size")
    if stype == 0:  # CONSTANT
        out = np.full(block_size, br.read_signed(eff), dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.fromiter(
            (br.read_signed(eff) for _ in range(block_size)),
            dtype=np.int64,
            count=block_size,
        )
    elif 8 <= stype <= 12:  # FIXED order 0..4
        order = stype - 8
        if order > block_size:
            raise UnsupportedMediaError("FLAC predictor order > block size")
        warmup = np.fromiter(
            (br.read_signed(eff) for _ in range(order)), dtype=np.int64, count=order
        )
        res = _decode_residual(br, block_size, order)
        out = _integrate_fixed(warmup, res)
    elif stype >= 32:  # LPC order 1..32
        order = (stype & 31) + 1
        if order > block_size:
            raise UnsupportedMediaError("FLAC predictor order > block size")
        warmup = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise UnsupportedMediaError("invalid FLAC qlp precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise UnsupportedMediaError("negative FLAC qlp shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _decode_residual(br, block_size, order)
        s = warmup + [0] * len(res)
        rl = res.tolist()
        for i in range(len(rl)):
            pos = order + i
            acc = 0
            for j in range(order):
                acc += coefs[j] * s[pos - 1 - j]
            s[pos] = rl[i] + (acc >> shift)
        out = np.asarray(s, dtype=np.int64)
    else:
        raise UnsupportedMediaError(f"reserved FLAC subframe type {stype}")
    return out << wasted if wasted else out


def _parse_streaminfo(block: bytes) -> dict:
    if len(block) != 34:
        raise UnsupportedMediaError("bad FLAC STREAMINFO size")
    (
        _min_bs,
        _max_bs,
    ) = struct.unpack_from(">HH", block, 0)
    acc = int.from_bytes(block[10:18], "big")
    total = acc & ((1 << 36) - 1)
    bps = ((acc >> 36) & 0x1F) + 1
    n_ch = ((acc >> 41) & 0x7) + 1
    rate = (acc >> 44) & ((1 << 20) - 1)
    if rate == 0:
        raise UnsupportedMediaError("FLAC sample rate 0")
    return {
        "rate": rate,
        "channels": n_ch,
        "bps": bps,
        "total": total,
        "md5": block[18:34],
    }


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes → (mono float32 samples in [-1, 1], sample_rate) —
    the decode_wav output contract, so the audio feature path treats
    both containers identically. CRC-8/CRC-16 per frame and the
    STREAMINFO MD5 (when set) are all enforced."""
    if payload[:4] != b"fLaC":
        raise UnsupportedMediaError("not a FLAC payload")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            raise UnsupportedMediaError("truncated FLAC metadata")
        hdr = int.from_bytes(payload[pos : pos + 4], "big")
        last, btype, size = hdr >> 31, (hdr >> 24) & 0x7F, hdr & 0xFFFFFF
        pos += 4
        if pos + size > len(payload):
            raise UnsupportedMediaError("truncated FLAC metadata block")
        if btype == 0:
            info = _parse_streaminfo(payload[pos : pos + size])
        elif btype == 127:
            raise UnsupportedMediaError("invalid FLAC metadata block type")
        pos += size
        if last:
            break
    if info is None:
        raise UnsupportedMediaError("FLAC stream without STREAMINFO")

    n_ch, bps_default = info["channels"], info["bps"]
    frames: list[np.ndarray] = []
    got = 0
    while pos < len(payload):
        br = _BitReader(payload, pos)
        sync = br.read(14)
        if sync != 0b11111111111110:
            raise UnsupportedMediaError("lost FLAC frame sync")
        if br.read(1):
            raise UnsupportedMediaError("bad FLAC frame reserved bit")
        br.read(1)  # blocking strategy (fixed/variable) — either accepted
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise UnsupportedMediaError("bad FLAC frame reserved bit")
        _read_coded_number(br)
        if bs_code == 0:
            raise UnsupportedMediaError("reserved FLAC block size code")
        elif bs_code == 6:
            block_size = br.read(8) + 1
        elif bs_code == 7:
            block_size = br.read(16) + 1
        elif bs_code in _BLOCKSIZE:
            block_size = _BLOCKSIZE[bs_code]
        else:
            block_size = 256 << (bs_code - 8)
        if sr_code == 0:
            rate = info["rate"]
        elif sr_code in _SAMPLE_RATES:
            rate = _SAMPLE_RATES[sr_code]
        elif sr_code == 12:
            rate = br.read(8) * 1000
        elif sr_code == 13:
            rate = br.read(16)
        elif sr_code == 14:
            rate = br.read(16) * 10
        else:
            raise UnsupportedMediaError("invalid FLAC sample rate code")
        if ss_code == 0:
            bps = bps_default
        elif ss_code in _SAMPLE_SIZES:
            bps = _SAMPLE_SIZES[ss_code]
        else:
            raise UnsupportedMediaError("reserved FLAC sample size code")
        hdr_end = br.byte_pos
        if crc8(payload[pos:hdr_end]) != br.read(8):
            raise UnsupportedMediaError("FLAC frame header CRC-8 mismatch")

        if ch_code < 8:
            if ch_code + 1 != n_ch:
                raise UnsupportedMediaError("FLAC frame channel count mismatch")
            chans = [
                _decode_subframe(br, block_size, bps) for _ in range(n_ch)
            ]
        elif ch_code in (8, 9, 10):
            if n_ch != 2:
                raise UnsupportedMediaError("FLAC stereo frame in non-stereo stream")
            # the SIDE channel carries one extra bit
            bps0 = bps + (1 if ch_code == 9 else 0)
            bps1 = bps + (1 if ch_code in (8, 10) else 0)
            c0 = _decode_subframe(br, block_size, bps0)
            c1 = _decode_subframe(br, block_size, bps1)
            if ch_code == 8:  # left/side
                chans = [c0, c0 - c1]
            elif ch_code == 9:  # side/right
                chans = [c1 + c0, c1]
            else:  # mid/side
                total2 = (c0 << 1) | (c1 & 1)
                chans = [(total2 + c1) >> 1, (total2 - c1) >> 1]
        else:
            raise UnsupportedMediaError("reserved FLAC channel assignment")
        br.align()
        frame_end = br.byte_pos
        if frame_end + 2 > len(payload):
            raise UnsupportedMediaError("truncated FLAC frame footer")
        if crc16(payload[pos:frame_end]) != int.from_bytes(
            payload[frame_end : frame_end + 2], "big"
        ):
            raise UnsupportedMediaError("FLAC frame CRC-16 mismatch")
        pos = frame_end + 2
        frames.append(np.stack(chans, axis=1))  # (block, n_ch)
        got += block_size
        if info["total"] and got >= info["total"]:
            break

    if not frames:
        raise UnsupportedMediaError("FLAC stream without frames")
    pcm = np.concatenate(frames, axis=0)
    if info["total"]:
        if len(pcm) < info["total"]:
            raise UnsupportedMediaError("FLAC stream shorter than STREAMINFO")
        pcm = pcm[: info["total"]]
    lo, hi = -(1 << (bps_default - 1)), (1 << (bps_default - 1)) - 1
    if pcm.min() < lo or pcm.max() > hi:
        raise UnsupportedMediaError("FLAC sample out of range")
    if info["md5"] != b"\x00" * 16:
        nbytes = (bps_default + 7) // 8
        raw = _pack_le(pcm, nbytes)
        if hashlib.md5(raw).digest() != info["md5"]:
            raise UnsupportedMediaError("FLAC MD5 signature mismatch")
    mono = pcm.mean(axis=1).astype(np.float32) / float(1 << (bps_default - 1))
    return mono, rate


def _pack_le(pcm: np.ndarray, nbytes: int) -> bytes:
    """Interleaved samples → little-endian signed nbytes-per-sample (the
    layout the STREAMINFO MD5 is computed over)."""
    flat = pcm.reshape(-1).astype(np.int64)
    u = flat & ((1 << (8 * nbytes)) - 1)
    out = np.empty((len(u), nbytes), dtype=np.uint8)
    for i in range(nbytes):
        out[:, i] = (u >> (8 * i)) & 0xFF
    return out.tobytes()


# ---------------------------------------------------------------------------
# encoding (the in-test producer; spec-valid, exercises every subframe
# kind the decoder supports)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def write_signed(self, v: int, n: int) -> None:
        self.write(v & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


def _rice_k(res: np.ndarray) -> int:
    mean = float(np.mean(np.abs(res))) if len(res) else 0.0
    k = 0
    while (1 << k) < mean + 1 and k < 14:
        k += 1
    return k


def encode_flac(  # noqa: C901 — a producer, deliberately explicit
    pcm: np.ndarray,
    rate: int = 16000,
    bps: int = 16,
    block_size: int = 4096,
    stereo_mode: str = "independent",
    subframe: str = "auto",
    partition_order: int = 0,
    escape: bool = False,
    rice_method: int = 0,
    wasted_bits: int = 0,
    variable_blocking: bool = False,
) -> bytes:
    """(n, channels) int samples → FLAC bytes.

    ``subframe``: 'auto' (constant where possible else fixed-order-2),
    'constant' (requires constant input), 'verbatim', 'fixed0'..'fixed4',
    or 'lpc' (order-2 quantized [2, -1] predictor, shift 0).
    ``stereo_mode``: independent | left_side | right_side | mid_side
    (stereo input only). ``wasted_bits`` shifts samples up W bits and
    declares them wasted — the decoder must shift back.
    """
    pcm = np.asarray(pcm, dtype=np.int64)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n_samples, n_ch = pcm.shape
    if not 1 <= n_ch <= 8:
        raise ValueError("1..8 channels")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if pcm.min() < lo or pcm.max() > hi:
        raise ValueError("samples out of range for bps")
    if wasted_bits:
        if ((pcm % (1 << wasted_bits)) != 0).any():
            raise ValueError("wasted_bits requires samples divisible by 2^W")

    md5 = hashlib.md5(_pack_le(pcm, (bps + 7) // 8)).digest()
    out = bytearray(b"fLaC")
    acc = (rate << 44) | ((n_ch - 1) << 41) | ((bps - 1) << 36) | n_samples
    streaminfo = (
        struct.pack(">HH", block_size, block_size)
        + b"\x00\x00\x00" * 2  # min/max frame size unknown
        + acc.to_bytes(8, "big")
        + md5
    )
    out += (1 << 31 | 0 << 24 | len(streaminfo)).to_bytes(4, "big")
    out += streaminfo

    frame_no = 0
    start = 0
    while start < n_samples or frame_no == 0:
        nb = min(block_size, n_samples - start)
        if nb <= 0:
            break
        block = pcm[start : start + nb]
        out += _encode_frame(
            block, frame_no, rate, bps, nb, block_size, n_ch,
            stereo_mode, subframe, partition_order, escape, rice_method,
            wasted_bits, variable_blocking, start,
        )
        start += nb
        frame_no += 1
    return bytes(out)


def _encode_utf8_number(v: int) -> bytes:
    if v < 0x80:
        return bytes([v])
    n = 1
    while v >= (1 << (6 * n + (6 - n))):
        n += 1
    lead_bits = 6 - n
    head = (0xFF << (lead_bits + 1)) & 0xFF | (v >> (6 * n))
    body = [0x80 | ((v >> (6 * (n - 1 - i))) & 0x3F) for i in range(n)]
    return bytes([head] + body)


def _subframe_bits(
    bw: _BitWriter, x: np.ndarray, eff: int, subframe: str,
    partition_order: int, escape: bool, rice_method: int, nb: int,
    wasted: int,
) -> None:
    def residual(res: np.ndarray, order: int) -> None:
        bw.write(rice_method, 2)
        pbits = 4 + rice_method
        bw.write(partition_order, 4)
        idx = 0
        for part in range(1 << partition_order):
            n = (nb >> partition_order) - (order if part == 0 else 0)
            chunk = res[idx : idx + n]
            idx += n
            if escape:
                mx = int(np.abs(chunk).max()) if len(chunk) else 0
                raw = max(mx.bit_length() + 1, 2)
                bw.write((1 << pbits) - 1, pbits)
                bw.write(raw, 5)
                for v in chunk.tolist():
                    bw.write_signed(v, raw)
            else:
                k = _rice_k(chunk)
                bw.write(k, pbits)
                for v in chunk.tolist():
                    u = (v << 1) if v >= 0 else ((-v << 1) - 1)
                    bw.write_unary(u >> k)
                    if k:
                        bw.write(u & ((1 << k) - 1), k)

    def header(stype: int) -> None:
        bw.write(0, 1)
        bw.write(stype, 6)
        if wasted:
            bw.write(1, 1)
            bw.write_unary(wasted - 1)
        else:
            bw.write(0, 1)

    if subframe == "auto":
        subframe = "constant" if len(set(x.tolist())) == 1 else "fixed2"
    if subframe == "constant":
        if len(set(x.tolist())) != 1:
            raise ValueError("constant subframe needs constant samples")
        header(0)
        bw.write_signed(int(x[0]), eff)
    elif subframe == "verbatim":
        header(1)
        for v in x.tolist():
            bw.write_signed(v, eff)
    elif subframe.startswith("fixed"):
        order = int(subframe[5:])
        if order > len(x):
            raise ValueError("fixed order > block")
        header(8 + order)
        for v in x[:order].tolist():
            bw.write_signed(v, eff)
        res = np.diff(x, n=order) if order else x.copy()
        residual(res, order)
    elif subframe == "lpc":
        order, prec, shift = 2, 15, 0
        coefs = [2, -1]
        if len(x) <= order:
            raise ValueError("lpc needs > order samples")
        header(32 + order - 1)
        for v in x[:order].tolist():
            bw.write_signed(v, eff)
        bw.write(prec - 1, 4)
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(c, prec)
        xs = x.tolist()
        res = np.asarray(
            [
                xs[i] - ((coefs[0] * xs[i - 1] + coefs[1] * xs[i - 2]) >> shift)
                for i in range(order, len(xs))
            ],
            dtype=np.int64,
        )
        residual(res, order)
    else:
        raise ValueError(f"unknown subframe kind {subframe!r}")


def _encode_frame(
    block: np.ndarray, frame_no: int, rate: int, bps: int, nb: int,
    block_size: int, n_ch: int, stereo_mode: str, subframe: str,
    partition_order: int, escape: bool, rice_method: int, wasted: int,
    variable_blocking: bool, sample_start: int,
) -> bytes:
    hdr = _BitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 1)
    hdr.write(1 if variable_blocking else 0, 1)
    # block size: prefer a table code, else 16-bit at end
    bs_code = next(
        (c for c, v in _BLOCKSIZE.items() if v == nb),
        None,
    )
    if bs_code is None:
        for c in range(8, 16):
            if 256 << (c - 8) == nb:
                bs_code = c
                break
    tail_bs = None
    if bs_code is None:
        bs_code, tail_bs = 7, nb - 1
    hdr.write(bs_code, 4)
    sr_code = next((c for c, v in _SAMPLE_RATES.items() if v == rate), None)
    tail_sr = None
    if sr_code is None:
        sr_code, tail_sr = 13, rate  # 16-bit Hz at header end
    hdr.write(sr_code, 4)
    if stereo_mode == "independent" or n_ch != 2:
        hdr.write(n_ch - 1, 4)
    else:
        hdr.write({"left_side": 8, "right_side": 9, "mid_side": 10}[stereo_mode], 4)
    ss_code = next((c for c, v in _SAMPLE_SIZES.items() if v == bps), 0)
    hdr.write(ss_code, 3)
    hdr.write(0, 1)
    hdr.align()
    head = bytearray(hdr.bytes())
    head += _encode_utf8_number(
        sample_start if variable_blocking else frame_no
    )
    if tail_bs is not None:
        head += struct.pack(">H", tail_bs)
    if tail_sr is not None:
        head += struct.pack(">H", tail_sr)
    head.append(crc8(bytes(head)))

    body = _BitWriter()
    if stereo_mode == "independent" or n_ch != 2:
        chans = [(block[:, c], bps) for c in range(n_ch)]
    else:
        left, right = block[:, 0], block[:, 1]
        side = left - right
        if stereo_mode == "left_side":
            chans = [(left, bps), (side, bps + 1)]
        elif stereo_mode == "right_side":
            chans = [(side, bps + 1), (right, bps)]
        else:
            mid = (left + right) >> 1
            chans = [(mid, bps), (side, bps + 1)]
    for x, cbps in chans:
        if wasted and ((x % (1 << wasted)) != 0).any():
            # derived channels may lose divisibility (mid = (l+r)>>1):
            # refuse rather than silently corrupt the stream
            raise ValueError("wasted_bits incompatible with these samples")
        _subframe_bits(
            body, x >> wasted, cbps - wasted, subframe,
            partition_order, escape, rice_method, nb, wasted,
        )
    body.align()
    frame = bytes(head) + body.bytes()
    return frame + struct.pack(">H", crc16(frame))
