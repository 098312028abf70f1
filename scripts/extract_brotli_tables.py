"""Extract the RFC 7932 static tables from the system libbrotli into a
committed npz artifact.

The brotli format (RFC 7932) fixes three large constant tables that a
decoder must reproduce exactly:

- the 122,784-byte static dictionary (RFC 7932 Appendix A) with its
  per-length size-bits/offsets index,
- the 121 word transforms (Appendix B) — each a (prefix, op, suffix)
  triple over ops {identity, omit-first-1..9, omit-last-1..9,
  uppercase-first, uppercase-all},
- the 2048-byte literal-context lookup table (§7.1; four modes x two
  256-byte halves, context = lut[p1] | lut[256 + p2]).

All three are public-domain content published verbatim in the RFC; the
in-sandbox libbrotlicommon exports them (BrotliGetDictionary,
BrotliGetTransforms + BrotliTransformDictionaryWord,
_kBrotliContextLookupTable), so extracting from the library is both the
least error-prone transcription and self-verifying: the transform table
is not read from memory layout at all but INFERRED behaviorally by
calling BrotliTransformDictionaryWord on probe words and diffing the
output against the input, which pins the exact (prefix, op, suffix)
semantics our decoder must implement.

Run once: python scripts/extract_brotli_tables.py
Output: mitie_spark/sources/artifacts/brotli_tables.npz
tests/test_brotli.py re-derives everything from the library and asserts
the committed artifact matches, so drift is impossible to miss.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import sys

import numpy as np


def load_common():
    for name in (
        "libbrotlicommon.so.1",
        "libbrotlicommon.so",
        ctypes.util.find_library("brotlicommon"),
    ):
        if not name:
            continue
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    raise SystemExit("libbrotlicommon not found")


class BrotliDictionary(ctypes.Structure):
    _fields_ = [
        ("size_bits_by_length", ctypes.c_uint8 * 32),
        ("offsets_by_length", ctypes.c_uint32 * 32),
        ("data_size", ctypes.c_size_t),
        ("data", ctypes.POINTER(ctypes.c_uint8)),
    ]


def extract_dictionary(lib):
    lib.BrotliGetDictionary.restype = ctypes.POINTER(BrotliDictionary)
    d = lib.BrotliGetDictionary().contents
    size_bits = np.ctypeslib.as_array(d.size_bits_by_length).copy()
    offsets = np.ctypeslib.as_array(d.offsets_by_length).copy()
    data = np.ctypeslib.as_array(d.data, shape=(d.data_size,)).copy()
    return size_bits, offsets, data


# Op encoding in the artifact: 0 = identity, 1..9 = omit-last-N,
# 10 = uppercase-first, 11 = uppercase-all, 12..20 = omit-first-(N-11).
def infer_transforms(lib):
    """Behaviorally infer all 121 (prefix, op, suffix) triples."""
    lib.BrotliGetTransforms.restype = ctypes.c_void_p
    transforms = lib.BrotliGetTransforms()
    fn = lib.BrotliTransformDictionaryWord
    fn.restype = ctypes.c_int
    fn.argtypes = [
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_void_p,
        ctypes.c_int,
    ]

    # 24 distinct lowercase bytes: every omit-first/omit-last count and
    # both uppercase ops leave a unique fingerprint on this word.
    word = bytes(range(ord("a"), ord("a") + 24))
    out = ctypes.create_string_buffer(256)
    triples = []
    for idx in range(121):
        n = fn(out, word, len(word), transforms, idx)
        o = out.raw[:n]
        cands = []
        for first in range(10):
            for last in range(10):
                core = word[first : len(word) - last]
                for op_name, tcore in (
                    ("identity", core),
                    ("upfirst", bytes([core[0] ^ 32]) + core[1:]),
                    ("upall", bytes(b ^ 32 for b in core)),
                ):
                    at = o.find(tcore)
                    if at < 0:
                        continue
                    if op_name != "identity" and first > 0 and last > 0:
                        continue  # RFC ops never combine omit with case
                    if op_name != "identity" and (first or last):
                        continue
                    cands.append((first, last, op_name, o[:at], o[at + len(tcore) :]))
        # longest core wins (identity with omits can also match a shorter
        # substring of an uppercase output; prefer the exact full match)
        cands.sort(key=lambda c: -(len(word) - c[0] - c[1]))
        first, last, op_name, prefix, suffix = cands[0]
        if op_name == "identity":
            op = last if last else (11 + first if first else 0)
            if first and last:
                raise SystemExit(f"transform {idx}: omit both ends unexpected")
        elif op_name == "upfirst":
            op = 10
        else:
            op = 11
        # self-verify: re-apply the inferred triple on a second probe word
        # and require byte equality with the library's own output.
        probe2 = bytes(range(ord("z"), ord("z") - 24, -1))
        n2 = fn(out, probe2, len(probe2), transforms, idx)
        if _apply(probe2, prefix, op, suffix) != out.raw[:n2]:
            raise SystemExit(f"transform {idx}: inference failed verification")
        triples.append((prefix, op, suffix))
    return triples


def _apply(word: bytes, prefix: bytes, op: int, suffix: bytes) -> bytes:
    """Reference application of an inferred transform (ASCII-probe scope)."""
    if 1 <= op <= 9:
        core = word[: len(word) - op]
    elif 12 <= op <= 20:
        core = word[op - 11 :]
    else:
        core = word
    if op == 10:
        core = bytes([core[0] ^ 32]) + core[1:]
    elif op == 11:
        core = bytes(b ^ 32 for b in core)
    return prefix + core + suffix


def extract_context_lut(lib):
    arr = (ctypes.c_uint8 * 2048).in_dll(lib, "_kBrotliContextLookupTable")
    return np.ctypeslib.as_array(arr).copy()


def main(out_path: str) -> None:
    lib = load_common()
    size_bits, offsets, dict_data = extract_dictionary(lib)
    triples = infer_transforms(lib)
    lut = extract_context_lut(lib)

    prefixes = [p for p, _, _ in triples]
    suffixes = [s for _, _, s in triples]
    ops = np.array([op for _, op, _ in triples], dtype=np.uint8)
    # variable-length byte strings: pool + offsets
    pre_pool = b"".join(prefixes)
    suf_pool = b"".join(suffixes)
    pre_off = np.cumsum([0] + [len(p) for p in prefixes]).astype(np.uint32)
    suf_off = np.cumsum([0] + [len(s) for s in suffixes]).astype(np.uint32)

    np.savez_compressed(
        out_path,
        dict_size_bits=size_bits,
        dict_offsets=offsets,
        dict_data=dict_data,
        transform_ops=ops,
        transform_prefix_pool=np.frombuffer(pre_pool, dtype=np.uint8),
        transform_prefix_offsets=pre_off,
        transform_suffix_pool=np.frombuffer(suf_pool, dtype=np.uint8),
        transform_suffix_offsets=suf_off,
        context_lut=lut,
    )
    print(
        f"wrote {out_path}: dict {dict_data.nbytes}B, "
        f"{len(triples)} transforms, lut {lut.nbytes}B"
    )


if __name__ == "__main__":
    main(
        sys.argv[1]
        if len(sys.argv) > 1
        else "mitie_spark/sources/artifacts/brotli_tables.npz"
    )
