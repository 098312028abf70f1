"""MurmurHash3 (x64-128) + the reference's feature-hashing helpers.

Port of the canonical Austin Appleby MurmurHash3 as vendored by the reference
(/root/reference/dlib/dlib/general_hash/murmur_hash3.h:318-429 byte variant,
:434-478 4×uint32 variant, :483+ 3×uint64 variant) and the NER feature
helpers built on it (/root/reference/mitielib/include/mitie/
ner_feature_extraction.h:81-100 — MAX_FEAT=500000, ±1.5 random-sign hashed
features; /root/reference/mitielib/src/ner_feature_extraction.cpp:27-66 —
prefix/suffix ≤3-char hashes and indicator features).

Bit-exact with the C++ for byte strings (verified by regression vectors in
tests); all arithmetic in masked 64-bit Python ints. These run a few hundred
times per document inside mapInPandas (chunk/pair features), so per-call
Python cost is acceptable; the per-token hot path uses NumPy gathers instead.
"""

from __future__ import annotations

from functools import lru_cache

_M = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix64(h: int) -> int:
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & _M
    h ^= h >> 33
    h = (h * 0xC4CEB9FE1A85EC53) & _M
    h ^= h >> 33
    return h


def murmur_hash3_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """MurmurHash3 x64-128 of ``data`` → (h1, h2), little-endian semantics
    (murmur_hash3.h:318-429). Hot path of the hashed-feature extractors, so
    the rotations/fmix are inlined and the tail bytes load via one
    int.from_bytes (little-endian int of the tail == the per-byte XOR
    accumulation of the original loop); bit-exactness is pinned by the
    regression vectors in tests."""
    length = len(data)
    nblocks = length >> 4
    M = _M
    h1 = h2 = seed & M

    for i in range(nblocks):
        o = i << 4
        k1 = int.from_bytes(data[o : o + 8], "little")
        k2 = int.from_bytes(data[o + 8 : o + 16], "little")
        k1 = (k1 * _C1) & M
        k1 = ((k1 << 31) | (k1 >> 33)) & M
        k1 = (k1 * _C2) & M
        h1 ^= k1
        h1 = ((h1 << 27) | (h1 >> 37)) & M
        h1 = (h1 + h2) & M
        h1 = (h1 * 5 + 0x52DCE729) & M
        k2 = (k2 * _C2) & M
        k2 = ((k2 << 33) | (k2 >> 31)) & M
        k2 = (k2 * _C1) & M
        h2 ^= k2
        h2 = ((h2 << 31) | (h2 >> 33)) & M
        h2 = (h2 + h1) & M
        h2 = (h2 * 5 + 0x38495AB5) & M

    t = length & 15
    if t:
        tail_int = int.from_bytes(data[length - t :], "little")
        if t > 8:
            k2 = tail_int >> 64
            k2 = (k2 * _C2) & M
            k2 = ((k2 << 33) | (k2 >> 31)) & M
            k2 = (k2 * _C1) & M
            h2 ^= k2
        k1 = tail_int & M
        k1 = (k1 * _C1) & M
        k1 = ((k1 << 31) | (k1 >> 33)) & M
        k1 = (k1 * _C2) & M
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & M
    h2 = (h2 + h1) & M
    h1 ^= h1 >> 33
    h1 = (h1 * 0xFF51AFD7ED558CCD) & M
    h1 ^= h1 >> 33
    h1 = (h1 * 0xC4CEB9FE1A85EC53) & M
    h1 ^= h1 >> 33
    h2 ^= h2 >> 33
    h2 = (h2 * 0xFF51AFD7ED558CCD) & M
    h2 ^= h2 >> 33
    h2 = (h2 * 0xC4CEB9FE1A85EC53) & M
    h2 ^= h2 >> 33
    h1 = (h1 + h2) & M
    h2 = (h2 + h1) & M
    return h1, h2


def murmur_hash3_128_u32x4(v1: int, v2: int, v3: int, v4: int) -> tuple[int, int]:
    """The 4×uint32 variant (murmur_hash3.h:434-478) used by prefix/suffix."""
    k1 = ((v2 & 0xFFFFFFFF) << 32) | (v1 & 0xFFFFFFFF)
    k2 = ((v4 & 0xFFFFFFFF) << 32) | (v3 & 0xFFFFFFFF)
    k1 = (k1 * _C1) & _M
    k1 = _rotl64(k1, 31)
    k1 = (k1 * _C2) & _M
    h1 = _rotl64(k1, 27)
    h1 = (h1 * 5 + 0x52DCE729) & _M
    k2 = (k2 * _C2) & _M
    k2 = _rotl64(k2, 33)
    k2 = (k2 * _C1) & _M
    h2 = _rotl64(k2, 31)
    h2 = (h2 + h1) & _M
    h2 = (h2 * 5 + 0x38495AB5) & _M
    h1 ^= 16
    h2 ^= 16
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    return h1, h2


def murmur_hash3_128_u64x3(k1: int, k2: int, k3: int) -> tuple[int, int]:
    """The 3×uint64 variant (murmur_hash3.h:483-527) used by ifeat."""
    h1 = h2 = k3 & _M
    k1 = (k1 * _C1) & _M
    k1 = _rotl64(k1, 31)
    k1 = (k1 * _C2) & _M
    h1 ^= k1
    h1 = _rotl64(h1, 27)
    h1 = (h1 + h2) & _M
    h1 = (h1 * 5 + 0x52DCE729) & _M
    k2 = (k2 * _C2) & _M
    k2 = _rotl64(k2, 33)
    k2 = (k2 * _C1) & _M
    h2 ^= k2
    h2 = _rotl64(h2, 31)
    h2 = (h2 + h1) & _M
    h2 = (h2 * 5 + 0x38495AB5) & _M
    h1 ^= 16
    h2 ^= 16
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    return h1, h2


# ---------------------------------------------------------------------------
# Feature hashing (ner_feature_extraction.h:81-100, .cpp:27-66)
# ---------------------------------------------------------------------------

MAX_FEAT = 500000  # ner_feature_extraction.h:81


def make_feat(hash_pair: tuple[int, int]) -> tuple[int, float]:
    """(index, ±1.5) with sign from bit 0 of h1 (ner_feature_extraction.h:84-91)."""
    h1, h2 = hash_pair
    sign = 1.0 if (h1 & 1) else -1.0
    return int(h2 % MAX_FEAT), sign * 1.5


@lru_cache(maxsize=200_000)
def shash(word: str, seed: int) -> tuple[int, int]:
    """murmur-128 of the word bytes (ner_feature_extraction.h:92-100).
    surrogateescape: stems can legally end mid-UTF-8-sequence (the
    reference stemmer truncates BYTES — functions/stemmer.stem_word), and
    the escape round-trips those exact bytes into the hash."""
    if not word:
        return (0, 0)
    return murmur_hash3_128(word.encode("utf-8", "surrogateescape"), seed)


def _schar(byte: int) -> int:
    """char → uint32 with sign extension: the reference assigns
    ``dlib::uint32 l1 = word[0]`` where char is signed on x86 Linux, so
    UTF-8 bytes ≥ 0x80 become 0xFFFFFFxx (ner_feature_extraction.cpp:27-61).
    Bit-exactness for non-ASCII words requires replicating that."""
    return byte if byte < 0x80 else (byte - 0x100) & 0xFFFFFFFF


@lru_cache(maxsize=200_000)
def prefix(word: str, seed: int) -> tuple[int, int]:
    """hash of the first ≤3 bytes (ner_feature_extraction.cpp:27-43)."""
    if not word:
        return (0, 0)
    b = word.encode("utf-8")
    l1 = _schar(b[0])
    l2 = _schar(b[1]) if len(b) > 1 else 0
    l3 = _schar(b[2]) if len(b) > 2 else 0
    return murmur_hash3_128_u32x4(l1, l2, l3, seed)


@lru_cache(maxsize=200_000)
def suffix(word: str, seed: int) -> tuple[int, int]:
    """hash of the last ≤3 bytes, reversed (ner_feature_extraction.cpp:45-61)."""
    if not word:
        return (0, 0)
    b = word.encode("utf-8")
    l1 = _schar(b[-1])
    l2 = _schar(b[-2]) if len(b) > 1 else 0
    l3 = _schar(b[-3]) if len(b) > 2 else 0
    return murmur_hash3_128_u32x4(l1, l2, l3, seed)


def ifeat(seed: int) -> tuple[int, int]:
    """indicator feature (ner_feature_extraction.cpp:63-66)."""
    return murmur_hash3_128_u64x3(seed, 0, 0)


# ---------------------------------------------------------------------------
# Deterministic hashed word embeddings — stand-in for the wordrep CCA vectors
# (total_word_feature_extractor dims; SURVEY.md §1). Each word deterministically
# maps to a unit-norm vector derived from murmur streams, so executors need no
# dictionary broadcast for OOV handling and the whole pipeline stays seedless.
# ---------------------------------------------------------------------------


def hashed_embedding(word: str, dim: int = 32):
    import numpy as np

    out = np.empty(dim, dtype=np.float64)
    for i in range(0, dim, 2):
        h1, h2 = murmur_hash3_128(word.encode("utf-8"), 7000 + i)
        # map to (-1, 1)
        out[i] = (h1 / _M) * 2.0 - 1.0
        if i + 1 < dim:
            out[i + 1] = (h2 / _M) * 2.0 - 1.0
    n = float((out @ out) ** 0.5)
    return (out / n if n > 0 else out).astype(np.float32)


def murmur_hash3_32(data: bytes, seed: int = 0) -> int:
    """MurmurHash3 x86-32 (murmur_hash3.h:236-314) — used by dlib::hash
    (general_hash/hash.h:18-28, empty string → 0) and therefore by the
    reference's count-min sketch (count_min_sketch.h:152-159)."""
    m32 = 0xFFFFFFFF
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h1 = seed & m32
    nblocks = len(data) // 4
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 4 : i * 4 + 4], "little")
        k1 = (k1 * c1) & m32
        k1 = ((k1 << 15) | (k1 >> 17)) & m32
        k1 = (k1 * c2) & m32
        h1 ^= k1
        h1 = ((h1 << 13) | (h1 >> 19)) & m32
        h1 = (h1 * 5 + 0xE6546B64) & m32
    tail = data[nblocks * 4 :]
    k1 = 0
    for j in range(len(tail) - 1, -1, -1):
        k1 ^= tail[j] << (j * 8)
    if tail:
        k1 = (k1 * c1) & m32
        k1 = ((k1 << 15) | (k1 >> 17)) & m32
        k1 = (k1 * c2) & m32
        h1 ^= k1
    h1 ^= len(data)
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & m32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & m32
    h1 ^= h1 >> 16
    return h1


def dlib_string_hash(s: str, seed: int = 0) -> int:
    """dlib::hash(std::string, seed) — murmur x86-32; empty string → 0
    (general_hash/hash.h:18-28)."""
    b = s.encode("utf-8")
    if not b:
        return 0
    return murmur_hash3_32(b, seed)
