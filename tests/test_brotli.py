"""Brotli (RFC 7932) decoder tests — sources/brotli.py.

Verification angles, mirroring the media-decoder test strategy:

1. System libbrotli as producer oracle (ctypes, skipped if absent):
   every stream libbrotlienc emits across qualities 0..11 and window
   bits 10..24 over text/binary/run/UTF-8/random corpora must decode
   byte-identically, including a multi-meta-block heterogeneous buffer
   that forces block-type switches and rich context maps at q11.
2. System libbrotlidec as decode oracle for hand-crafted streams
   (tests/brotli_craft.py) covering features the encoder rarely or
   never emits: distance ring-buffer short codes 0..15 from the initial
   state, ring push/no-push semantics, unsorted simple-code symbol
   lists in all four shapes, metadata meta-blocks, context-map RLE, and
   our store-mode encoder's output.
3. The committed artifact (artifacts/brotli_tables.npz) is re-derived
   from libbrotlicommon (dictionary struct, behavioral transform
   inference, context LUT) and must match bit-for-bit; transform
   application parity is checked over every first-byte value and random
   binary words for all 121 transforms.
4. Hostile-input contract: random corruption, truncation, and the
   decompression-bomb guard must raise BrotliError, never hang or leak
   another exception type.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import random

import pytest

from mitie_spark.sources.brotli import (
    BrotliError,
    _tables,
    _transform_word,
    decode_brotli,
    encode_brotli_store,
)

from tests.brotli_craft import craft_stream, dist_long_code


def _load(*names):
    for name in names:
        if not name:
            continue
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


def _load_enc():
    lib = _load("libbrotlienc.so.1", "libbrotlienc.so",
                ctypes.util.find_library("brotlienc"))
    if lib is None:
        return None
    lib.BrotliEncoderCompress.restype = ctypes.c_int
    lib.BrotliEncoderCompress.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_size_t, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p,
    ]
    return lib


def _load_dec():
    lib = _load("libbrotlidec.so.1", "libbrotlidec.so",
                ctypes.util.find_library("brotlidec"))
    if lib is None:
        return None
    lib.BrotliDecoderDecompress.restype = ctypes.c_int
    lib.BrotliDecoderDecompress.argtypes = [
        ctypes.c_size_t, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p,
    ]
    return lib


_ENC = _load_enc()
_DEC = _load_dec()
_COMMON = _load("libbrotlicommon.so.1", "libbrotlicommon.so",
                ctypes.util.find_library("brotlicommon"))

needs_enc = pytest.mark.skipif(_ENC is None, reason="libbrotlienc unavailable")
needs_dec = pytest.mark.skipif(_DEC is None, reason="libbrotlidec unavailable")
needs_common = pytest.mark.skipif(_COMMON is None, reason="libbrotlicommon unavailable")


def c_compress(data: bytes, quality: int = 11, lgwin: int = 22) -> bytes:
    cap = len(data) + (len(data) >> 1) + 1024
    out = ctypes.create_string_buffer(cap)
    sz = ctypes.c_size_t(cap)
    ok = _ENC.BrotliEncoderCompress(
        quality, lgwin, 0, len(data), data, ctypes.byref(sz), out
    )
    assert ok == 1
    return out.raw[: sz.value]


def c_decompress(blob: bytes, cap: int):
    out = ctypes.create_string_buffer(cap + 16)
    sz = ctypes.c_size_t(cap + 16)
    ok = _DEC.BrotliDecoderDecompress(len(blob), blob, ctypes.byref(sz), out)
    return out.raw[: sz.value] if ok == 1 else None


def _corpora() -> dict[str, bytes]:
    rng = random.Random(42)
    words = ["the", "of", "and", "information", "data", "público",
             "größe", "HTTP", "value", "page"]
    return {
        "empty": b"",
        "one": b"A",
        "hello": b"hello world hello world hello",
        "text": (" ".join(rng.choice(words) for _ in range(3000))).encode(),
        "html": (b"<html><head><title>x</title></head><body>"
                 + b"<p>the quick brown fox jumps over the lazy dog</p>" * 150
                 + b"</body></html>"),
        "random": bytes(rng.randrange(256) for _ in range(4000)),
        "repetitive": b"abcabcabc" * 1500,
        "binary_runs": (b"\x00" * 2000 + bytes(range(256)) * 6 + b"\xff" * 2000),
        "utf8": ("日本語のテキスト например ελληνικά " * 200).encode(),
    }


# ---------------------------------------------------------------------------
# 1. producer differential: everything libbrotlienc emits must decode
# ---------------------------------------------------------------------------


@needs_enc
@pytest.mark.parametrize("quality", [0, 1, 2, 5, 9, 10, 11])
def test_decode_matches_encoder_across_windows(quality):
    for name, data in _corpora().items():
        for lgwin in (10, 16, 22, 24):
            blob = c_compress(data, quality, lgwin)
            assert decode_brotli(blob) == data, f"{name} q{quality} w{lgwin}"


@needs_enc
def test_decode_multi_metablock_heterogeneous():
    """~1.5 MB of interleaved text/random/run stripes at q11 forces
    multiple meta-blocks, block-type switches, and non-trivial literal
    and distance context maps."""
    rng = random.Random(7)
    words = ["alpha", "beta", "gamma", "delta", "information", "の", "data"]
    stripes = []
    for i in range(24):
        if i % 3 == 0:
            stripes.append(
                (" ".join(rng.choice(words) for _ in range(12000))).encode()[:65536]
            )
        elif i % 3 == 1:
            stripes.append(bytes(rng.randrange(256) for _ in range(65536)))
        else:
            stripes.append(bytes([rng.randrange(4)]) * 65536)
    data = b"".join(stripes)
    for q in (1, 11):
        assert decode_brotli(c_compress(data, q, 22)) == data


# ---------------------------------------------------------------------------
# 2. crafted streams, libbrotlidec as the decode oracle
# ---------------------------------------------------------------------------

_PREFIX = b"aaabaacaadabbabcabdacbaccacdadbadcaddbbb"  # unique 4-gram windows


def _both(blob: bytes, cap: int = 4096) -> bytes:
    """Decode with libbrotlidec and our decoder; assert equal, return."""
    want = c_decompress(blob, cap)
    assert want is not None, "oracle rejected a stream we crafted as valid"
    got = decode_brotli(blob)
    assert got == want
    return got


@needs_dec
def test_initial_ring_short_codes():
    """Distance codes 0..15 from the pristine ring: 0..3 → 4, 11, 15, 16
    (oracle-probed orientation), 4..9 → last±{1,2,3}, 10..15 → 2nd±."""
    expected = [4, 11, 15, 16, 3, 5, 2, 6, 1, 7, 10, 12, 9, 13, 8, 14]
    for code in range(16):
        blob = craft_stream(
            [97, 98, 99, 100], [code], [(_PREFIX, 4, ("short", code))]
        )
        out = _both(blob)
        d = expected[code]
        if d >= 4:
            assert out[40:44] == _PREFIX[40 - d : 44 - d]
        else:  # overlapping copy
            pat = _PREFIX[40 - d :]
            assert out[40:44] == (pat * 4)[:4]


@needs_dec
def test_ring_push_semantics():
    """Long-code distances and resolved short codes push; code 0 and
    implicit (cmd<128) distances do not."""
    p7 = dist_long_code(7)[0]
    assert p7 == dist_long_code(8)[0]  # 7 and 8 share a long code
    # push 7, 8 → code0=8 (no push), code1=7 (pushes 7 AGAIN — ring
    # codes 1-15 push even when the value already sits in the ring), so
    # the following code2 (3rd last) sees [7,8,7,4] and resolves 7.
    blob = craft_stream(
        [97, 98, 99, 100],
        sorted({p7, 0, 1, 2}),
        [(_PREFIX, 4, ("long", 7)), (b"", 4, ("long", 8)),
         (b"", 4, ("short", 0)), (b"", 4, ("short", 1)),
         (b"", 4, ("short", 2))],
    )
    out = _both(blob)
    assert out[48:52] == out[48 - 8 : 52 - 8]   # code0 → 8 (no rotate)
    assert out[52:56] == out[52 - 7 : 56 - 7]   # code1 → 7
    assert out[56:60] == out[56 - 7 : 60 - 7]   # code2 → 7 (re-pushed)
    # a resolved short code pushes: push7, code5 → 8, then code0 → 8
    blob = craft_stream(
        [97, 98, 99, 100], sorted({p7, 5, 0}),
        [(_PREFIX, 4, ("long", 7)), (b"", 4, ("short", 5)),
         (b"", 4, ("short", 0))],
    )
    out = _both(blob)
    assert out[44:48] == out[44 - 8 : 48 - 8]
    assert out[48:52] == out[48 - 8 : 52 - 8]
    # implicit distance reuses last without pushing: code1 after → 4
    blob = craft_stream(
        [97, 98, 99, 100], sorted({p7, 1}),
        [(_PREFIX, 4, ("long", 7)), (b"", 4, None), (b"", 4, ("short", 1))],
    )
    out = _both(blob)
    assert out[44:48] == out[44 - 7 : 48 - 7]
    assert out[48:52] == out[48 - 4 : 52 - 4]


@needs_dec
def test_unsorted_simple_codes():
    """Simple-code symbol assignment conventions (oracle-pinned): NSYM=2
    sorted; NSYM=3 first-listed keeps depth 1, rest sorted; NSYM=4
    tree-select=0 fully sorted, =1 first two listed, last two sorted."""
    from tests.brotli_craft import (
        BitWriter, SimpleCode, cmd_symbol, cpy_code_for, ins_code_for,
        CPY_EXTRA, INS_EXTRA,
    )

    def craft_lits(symbols, tree_select, emit_codes):
        bw = BitWriter()
        bw.put(1, 0)
        bw.put(1, 1)
        bw.put(1, 0)
        bw.put(2, 0)
        bw.put(16, len(emit_codes) - 1)
        for _ in range(3):
            bw.put(1, 0)
        bw.put(2, 0)
        bw.put(4, 0)
        bw.put(2, 0)
        bw.put(1, 0)
        bw.put(1, 0)
        bw.put(2, 1)
        bw.put(2, len(symbols) - 1)
        for s in symbols:
            bw.put(8, s)
        if len(symbols) == 4:
            bw.put(1, tree_select)
        ic, ie = ins_code_for(len(emit_codes))
        cc, ce = cpy_code_for(2)
        SimpleCode(704, [cmd_symbol(ic, cc, False)]).write_def(bw)
        SimpleCode(64, [0]).write_def(bw)
        if INS_EXTRA[ic]:
            bw.put(INS_EXTRA[ic], ie)
        if CPY_EXTRA[cc]:
            bw.put(CPY_EXTRA[cc], ce)
        for length, code in emit_codes:
            bw.put_code(length, code)
        return bw.bytes()

    cases = [
        ([98, 97], 0, [(1, 0), (1, 1)], b"ab"),
        ([99, 97, 98], 0, [(1, 0), (2, 2), (2, 3)], b"cab"),
        ([100, 99, 98, 97], 0, [(2, 0), (2, 1), (2, 2), (2, 3)], b"abcd"),
        ([100, 99, 98, 97], 1, [(1, 0), (2, 2), (3, 6), (3, 7)], b"dcab"),
    ]
    for symbols, tsel, emits, want in cases:
        blob = craft_lits(symbols, tsel, emits)
        assert _both(blob) == want
    # duplicate symbols must be rejected by both decoders
    dup = craft_lits([97, 97], 0, [(1, 0), (1, 1)])
    assert c_decompress(dup, 64) is None
    with pytest.raises(BrotliError):
        decode_brotli(dup)


@needs_dec
def test_metadata_metablock_and_context_map_rle():
    blob = craft_stream(
        [97, 98, 99, 100], [0],
        [(_PREFIX, 4, ("short", 0))],
        prelude_meta=b"ignored metadata bytes",
    )
    assert _both(blob)[:40] == _PREFIX
    blob = craft_stream(
        [97, 98, 99, 100], [0],
        [(_PREFIX, 4, ("short", 0))],
        context_map_rle=True,
    )
    assert _both(blob)[:40] == _PREFIX


@needs_dec
def test_store_encoder_cross_accepted():
    for name, data in _corpora().items():
        blob = encode_brotli_store(data)
        assert c_decompress(blob, len(data)) == data, name
        assert decode_brotli(blob) == data, name
    # chunk boundary exercise
    data = bytes(range(256)) * 600  # > 2 chunks of 64 KiB
    blob = encode_brotli_store(data, chunk=1 << 16)
    assert c_decompress(blob, len(data)) == data
    assert decode_brotli(blob) == data


# ---------------------------------------------------------------------------
# 3. artifact + transform parity vs libbrotlicommon
# ---------------------------------------------------------------------------


@needs_common
def test_artifact_matches_library():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from extract_brotli_tables import (
        extract_context_lut, extract_dictionary, infer_transforms,
    )

    t = _tables()
    size_bits, offsets, data = extract_dictionary(_COMMON)
    assert size_bits.tolist() == t["size_bits"]
    assert offsets.tolist() == t["offsets"]
    assert data.tobytes() == t["dict"]
    assert extract_context_lut(_COMMON).tolist() == t["lut"]
    triples = infer_transforms(_COMMON)
    assert len(triples) == 121
    for i, (pre, op, suf) in enumerate(triples):
        assert t["prefixes"][i] == pre
        assert t["ops"][i] == op
        assert t["suffixes"][i] == suf


@needs_common
def test_transform_word_parity():
    """All 121 transforms over every first-byte value and random binary
    words — pins the ferment (pseudo-uppercase) UTF-8 walk exactly."""
    _COMMON.BrotliGetTransforms.restype = ctypes.c_void_p
    tr = _COMMON.BrotliGetTransforms()
    fn = _COMMON.BrotliTransformDictionaryWord
    fn.restype = ctypes.c_int
    fn.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
                   ctypes.c_void_p, ctypes.c_int]
    out = ctypes.create_string_buffer(256)
    t = _tables()
    rng = random.Random(3)
    words = [bytes([b]) + b"abcdefg" for b in range(256)]
    words += [bytes(rng.randrange(256) for _ in range(rng.randrange(4, 25)))
              for _ in range(50)]
    for w in words:
        for tid in range(121):
            n = fn(out, w, len(w), tr, tid)
            assert _transform_word(w, tid, t) == out.raw[:n], (w, tid)


@needs_enc
def test_dictionary_references_decode():
    """Short English text at q11 leans on the static dictionary +
    transforms; decoding it exercises the word/transform path for real."""
    data = (b"The information about the public working example, "
            b"which should not be different from the description.")
    blob = c_compress(data, 11, 22)
    assert len(blob) < len(data) // 2  # only achievable via the dictionary
    assert decode_brotli(blob) == data


# ---------------------------------------------------------------------------
# 4. hostile input contract
# ---------------------------------------------------------------------------


@needs_enc
def test_fuzz_corruption_fails_fast():
    rng = random.Random(99)
    base = (b"the quick brown fox " * 120) + bytes(
        rng.randrange(256) for _ in range(1200)
    )
    blobs = [c_compress(base, q, 18) for q in (1, 5, 11)]
    for _ in range(600):
        blob = bytearray(rng.choice(blobs))
        for _ in range(rng.randrange(1, 4)):
            if len(blob) < 3:
                break
            op = rng.randrange(3)
            if op == 0:
                blob[rng.randrange(len(blob))] ^= 1 << rng.randrange(8)
            elif op == 1:
                del blob[rng.randrange(1, len(blob)) :]
            else:
                blob[rng.randrange(len(blob))] = rng.randrange(256)
        try:
            decode_brotli(bytes(blob), max_out=1 << 22)
        except BrotliError:
            pass  # the only acceptable exception type


def test_truncation_and_bomb_guard():
    with pytest.raises(BrotliError):
        decode_brotli(b"")
    data = b"x" * 100_000
    blob = encode_brotli_store(data)
    for cut in (1, 5, len(blob) // 2, len(blob) - 1):
        with pytest.raises(BrotliError):
            decode_brotli(blob[:cut])
    with pytest.raises(BrotliError):
        decode_brotli(blob, max_out=50_000)
    assert decode_brotli(blob, max_out=100_000) == data


def test_store_roundtrip_without_libs():
    """Self-contained: store encoder → our decoder, no system libs."""
    rng = random.Random(5)
    for n in (0, 1, 255, 65536, 65537, 200_000):
        data = bytes(rng.randrange(256) for _ in range(min(n, 4096))) * (
            max(1, n // 4096)
        )
        data = data[:n]
        assert decode_brotli(encode_brotli_store(data)) == data
