"""Zstandard (RFC 8878) decoder tests — sources/zstd.py.

Verification angles, mirroring test_brotli.py:

1. System libzstd as producer oracle (ctypes, skipped if absent):
   every frame it emits across levels 1..22, forced window logs,
   checksum on/off, and content-size on/off over seven corpora must
   decode byte-identically — covering raw/RLE/compressed blocks,
   1- and 4-stream Huffman literals, direct and FSE-compressed
   weights, treeless literals, all four sequence-table modes, and
   repeat offsets.
2. libzstd as decode oracle for our store-mode encoder's output,
   plus pyarrow's bundled zstd as a second independent producer.
3. XXH64 known-answer vectors + checksum enforcement (a corrupted
   stored checksum must raise).
4. Hostile-input contract: corruption/truncation raise ZstdError or
   return bounded bytes — never hang, never leak another exception
   type; the decompression-bomb guard trips on max_out.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import random

import pytest

from mitie_spark.sources.zstd import (
    ZstdError,
    decode_zstd,
    encode_zstd_store,
    xxh64,
)


def _load_zstd():
    for name in ("libzstd.so.1", "libzstd.so", ctypes.util.find_library("zstd")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        lib.ZSTD_compress.restype = ctypes.c_size_t
        lib.ZSTD_compress.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
        ]
        lib.ZSTD_decompress.restype = ctypes.c_size_t
        lib.ZSTD_decompress.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t,
        ]
        lib.ZSTD_compressBound.restype = ctypes.c_size_t
        lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
        lib.ZSTD_isError.restype = ctypes.c_uint
        lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
        lib.ZSTD_createCCtx.restype = ctypes.c_void_p
        lib.ZSTD_freeCCtx.restype = ctypes.c_size_t
        lib.ZSTD_freeCCtx.argtypes = [ctypes.c_void_p]
        lib.ZSTD_CCtx_setParameter.restype = ctypes.c_size_t
        lib.ZSTD_CCtx_setParameter.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ]
        lib.ZSTD_compress2.restype = ctypes.c_size_t
        lib.ZSTD_compress2.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_char_p, ctypes.c_size_t,
        ]
        return lib
    return None


_LIB = _load_zstd()
needs_lib = pytest.mark.skipif(_LIB is None, reason="libzstd unavailable")

# ZSTD_cParameter enum values (stable public API since v1.4)
_C_LEVEL, _C_WINDOWLOG = 100, 101
_C_CONTENTSIZE, _C_CHECKSUM = 200, 201


def c_compress(data: bytes, level: int = 3) -> bytes:
    cap = _LIB.ZSTD_compressBound(len(data))
    buf = ctypes.create_string_buffer(cap)
    r = _LIB.ZSTD_compress(buf, cap, data, len(data), level)
    assert not _LIB.ZSTD_isError(r)
    return buf.raw[:r]


def c_compress2(data: bytes, **params) -> bytes:
    cctx = _LIB.ZSTD_createCCtx()
    try:
        for p, v in params.items():
            code = {"level": _C_LEVEL, "windowlog": _C_WINDOWLOG,
                    "contentsize": _C_CONTENTSIZE, "checksum": _C_CHECKSUM}[p]
            r = _LIB.ZSTD_CCtx_setParameter(cctx, code, v)
            assert not _LIB.ZSTD_isError(r), (p, v)
        cap = _LIB.ZSTD_compressBound(len(data))
        buf = ctypes.create_string_buffer(cap)
        r = _LIB.ZSTD_compress2(cctx, buf, cap, data, len(data))
        assert not _LIB.ZSTD_isError(r)
        return buf.raw[:r]
    finally:
        _LIB.ZSTD_freeCCtx(cctx)


def c_decompress(blob: bytes, cap: int):
    buf = ctypes.create_string_buffer(cap + 16)
    r = _LIB.ZSTD_decompress(buf, cap + 16, blob, len(blob))
    return None if _LIB.ZSTD_isError(r) else buf.raw[:r]


def _corpora() -> dict[str, bytes]:
    rng = random.Random(42)
    words = ["the", "of", "and", "information", "data", "público",
             "größe", "HTTP", "value", "zstd"]
    return {
        "empty": b"",
        "one": b"Z",
        "hello": b"hello world hello world hello",
        "text": (" ".join(rng.choice(words) for _ in range(30000))).encode(),
        "runs": b"A" * 4000 + b"\x00" * 9000
        + bytes(rng.randrange(256) for _ in range(64)) * 700,
        "random": bytes(rng.randrange(256) for _ in range(200000)),
        "mixed": (
            (" ".join(rng.choice(words) for _ in range(20000))).encode()
            + bytes(rng.randrange(256) for _ in range(120000))
            + b"B" * 70000
            + (" ".join(rng.choice(words) for _ in range(10000))).encode()
        ),
    }


# ---------------------------------------------------------------------------
# libzstd → us
# ---------------------------------------------------------------------------


@needs_lib
def test_decode_every_libzstd_level():
    for name, data in _corpora().items():
        for level in (1, 2, 3, 5, 7, 9, 12, 15, 17, 19, 22):
            blob = c_compress(data, level)
            assert decode_zstd(blob) == data, (name, level)


@needs_lib
def test_decode_frame_variants():
    data = _corpora()["mixed"]
    small = _corpora()["text"]
    # checksummed frames verify; frames without content size (the
    # streaming shape: window descriptor instead of single-segment)
    for kwargs in (
        {"level": 9, "checksum": 1},
        {"level": 6, "contentsize": 0},
        {"level": 12, "contentsize": 0, "checksum": 1},
        {"level": 19, "windowlog": 10},
        {"level": 5, "windowlog": 18, "contentsize": 0},
        {"level": 22, "windowlog": 25, "checksum": 1},
    ):
        for data_ in (data, small, b"", b"x"):
            blob = c_compress2(data_, **kwargs)
            assert decode_zstd(blob) == data_, kwargs


@needs_lib
def test_checksum_enforced():
    data = _corpora()["text"]
    blob = c_compress2(data, level=9, checksum=1)
    bad = blob[:-1] + bytes([blob[-1] ^ 0xFF])
    with pytest.raises(ZstdError):
        decode_zstd(bad)


@needs_lib
def test_multi_frame_and_skippable():
    a = c_compress(b"first frame " * 100, 5)
    b = c_compress2(b"second frame " * 100, level=3, contentsize=0)
    skip = (0x184D2A50).to_bytes(4, "little") + (5).to_bytes(4, "little") + b"metad"
    skip2 = (0x184D2A5F).to_bytes(4, "little") + (0).to_bytes(4, "little")
    assert (
        decode_zstd(skip + a + skip2 + b + skip)
        == b"first frame " * 100 + b"second frame " * 100
    )


@needs_lib
def test_decode_pyarrow_frames():
    pa = pytest.importorskip("pyarrow")
    codec = pa.Codec("zstd")
    for name, data in _corpora().items():
        blob = codec.compress(data).to_pybytes()
        assert decode_zstd(blob) == data, name


# ---------------------------------------------------------------------------
# us → libzstd (store mode), self round-trip
# ---------------------------------------------------------------------------


@needs_lib
def test_store_mode_decodes_under_libzstd():
    rng = random.Random(7)
    for n in (0, 1, 255, 256, 65792, (1 << 17) + 17, 300001):
        data = bytes(rng.randrange(256) for _ in range(min(n, 4096)))
        data = (data * (n // max(len(data), 1) + 1))[:n]
        st = encode_zstd_store(data)
        assert c_decompress(st, len(data)) == data, n
        assert decode_zstd(st) == data, n


# ---------------------------------------------------------------------------
# XXH64
# ---------------------------------------------------------------------------


def test_xxh64_known_answers():
    # published reference vectors (seed 0)
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999
    # crosses every length class: <4, <8, <32, and the 32-byte stripes
    rng = random.Random(3)
    blob = bytes(rng.randrange(256) for _ in range(1037))
    h = xxh64(blob)
    assert h == xxh64(blob) and 0 <= h < 1 << 64


# ---------------------------------------------------------------------------
# Hostile-input contract
# ---------------------------------------------------------------------------


@needs_lib
def test_corruption_never_hangs_or_leaks():
    rng = random.Random(99)
    data = _corpora()["text"]
    blob = c_compress(data, 17)
    for _ in range(600):
        q = bytearray(blob)
        for _ in range(rng.randrange(1, 4)):
            q[rng.randrange(len(q))] ^= 1 << rng.randrange(8)
        if rng.random() < 0.3:
            q = q[: rng.randrange(len(q))]
        try:
            out = decode_zstd(bytes(q), max_out=1 << 22)
            assert len(out) <= 1 << 22
        except ZstdError:
            pass  # the only exception type the contract allows


@needs_lib
def test_bomb_guard():
    blob = c_compress(b"\x00" * 1000000, 19)
    with pytest.raises(ZstdError):
        decode_zstd(blob, max_out=1000)


@needs_lib
def test_crafted_header_variants():
    """Frame-header shapes a real encoder never emits but the format
    allows — wide FCS fields on tiny frames, explicit zero dictionary
    IDs at every width, window-descriptor mantissas, crafted checksums,
    RLE blocks — must decode here AND under libzstd identically
    (the tests/brotli_craft.py pattern: pin conventions the producer
    differential can't reach)."""
    magic = (0xFD2FB528).to_bytes(4, "little")

    def raw_block(data, last=1):
        return (last | (len(data) << 3)).to_bytes(3, "little") + data

    body = b"hello zstd crafted header variants!"
    n = len(body)
    big = (body * 12)[:300]
    frames = {
        # 8- and 4-byte FCS on a 36-byte single-segment frame
        "fcs8": magic + bytes([(3 << 6) | 32]) + n.to_bytes(8, "little") + raw_block(body),
        "fcs4": magic + bytes([(2 << 6) | 32]) + n.to_bytes(4, "little") + raw_block(body),
        # window descriptor (1 KB), no FCS; and one with mantissa bits
        "wd_nofcs": magic + bytes([0x00, 0x00]) + raw_block(body),
        "wd_mant": magic + bytes([0x00, (2 << 3) | 5]) + raw_block(body),
        # 2-byte FCS stores value-256: needs a >=256-byte frame
        "fcs2_wd": magic + bytes([1 << 6, 0x00]) + (300 - 256).to_bytes(2, "little") + raw_block(big),
        # crafted checksum; RLE block
        "crafted_ck": magic + bytes([32 | 4, n]) + raw_block(body)
        + (xxh64(body) & 0xFFFFFFFF).to_bytes(4, "little"),
        "rle": magic + bytes([32, 40])
        + (1 | (1 << 1) | (40 << 3)).to_bytes(3, "little") + b"Q",
    }
    # explicit zero dictionary IDs at 1/2/4 bytes
    for flag, size in ((1, 1), (2, 2), (3, 4)):
        frames[f"did{size}"] = (
            magic + bytes([flag, 0x00]) + b"\x00" * size + raw_block(body)
        )
    for name, blob in frames.items():
        want = {"fcs2_wd": big, "rle": b"Q" * 40}.get(name, body)
        assert decode_zstd(blob) == want, name
        assert c_decompress(blob, len(want)) == want, name


def test_structural_rejections():
    with pytest.raises(ZstdError):
        decode_zstd(b"\x00\x01\x02\x03")  # bad magic
    with pytest.raises(ZstdError):  # zero-size compressed block
        decode_zstd(
            (0xFD2FB528).to_bytes(4, "little")
            + bytes([32, 5])
            + (1 | (2 << 1) | (0 << 3)).to_bytes(3, "little")
        )
    with pytest.raises(ZstdError):  # RLE literals past the 128 KB block cap
        block = ((200000 << 4) | 13).to_bytes(3, "little") + b"Q" + b"\x00"
        decode_zstd(
            (0xFD2FB528).to_bytes(4, "little")
            + bytes([0x00, 8 << 3])  # window descriptor: 256 KiB
            + (1 | (2 << 1) | (len(block) << 3)).to_bytes(3, "little")
            + block
        )
    with pytest.raises(ZstdError):
        decode_zstd(b"\x28\xb5\x2f\xfd")  # missing header
    with pytest.raises(ZstdError):
        decode_zstd(b"\x28\xb5\x2f\xfd\x08\x00")  # reserved FHD bit
    with pytest.raises(ZstdError):  # dictionary frames unsupported
        decode_zstd(b"\x28\xb5\x2f\xfd\x21\x07\x09" + b"\x01\x00\x00")
    assert decode_zstd(b"") == b""
