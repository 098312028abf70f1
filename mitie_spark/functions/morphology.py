"""Approximate substring set + morphology features (T7/T8).

Port of /root/reference/mitielib/include/mitie/approximate_substring_set.h:
18-255 — a 13-bit open hash table keyed by a CRC32 rolling hash, storing the
top 19 hash bits as the stored-string fingerprint. ``add_substring`` may
overwrite earlier entries (collisions allowed by design; add the most
important substrings last). ``find_substrings`` scans all substrings of the
first 49 chars of a query (with ``*`` marking the word boundary) and emits
the bucket ids of matches — bit-exact with the C++ including the quirk that
a match is reported once per occurrence, not deduplicated.

And of word_morphology_feature_extractor.h:52-148 (T8): the morphological
feature vector of a word is the sum of rows of a (8192×D) projection matrix
indexed by the substring hits (``feats = morph_transᵀ · hits``), with no
case folding anywhere (the reference's morph path never lowercases).
"""

from __future__ import annotations

import numpy as np

_MASK = 0x1FFF
_MASK_BITS = 13
_INIT_HASH = 0xFFFFFFFF
_MAX_LEN = 50


def _fill_crc_table() -> np.ndarray:
    # approximate_substring_set.h:235-254 (standard CRC-32 table)
    table = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        temp = i
        for _ in range(8):
            if temp & 1:
                temp = (temp >> 1) ^ 0xEDB88320
            else:
                temp >>= 1
        table[i] = temp
    return table


_CRC = _fill_crc_table()


class ApproximateSubstringSet:
    def __init__(self) -> None:
        self.hash_table = np.zeros(_MASK + 1, dtype=np.uint16)
        self.max_substr_len = 0

    @staticmethod
    def _add_to_hash(h: int, byte: int) -> int:
        # h:223-233: hash = (hash>>8) ^ crc_table[(hash^item) & 0xFF]
        return (h >> 8) ^ int(_CRC[(h ^ byte) & 0xFF])

    def max_substring_id(self) -> int:
        return _MASK

    def add_substring(self, s: str) -> int:
        """h:56-88 — returns the bucket id (the substring ID)."""
        h = _INIT_HASH
        for b in s.encode("utf-8"):
            h = self._add_to_hash(h, b)
        if len(s) > self.max_substr_len:
            self.max_substr_len = len(s)
        str_id = (h >> _MASK_BITS) & 0xFFFF
        bucket_id = h & _MASK
        self.hash_table[bucket_id] = str_id
        return bucket_id

    def find_substrings(self, s: str) -> list[int]:
        """h:90-142 — bucket ids of all matching substrings of s[:49]."""
        data = s.encode("utf-8")[: _MAX_LEN - 1]
        hits: list[int] = []
        if not data:
            return hits
        n = len(data)
        # hashes[0] covers the prefix-with-'*' rolling hash; hashes[1..n]
        # cover substrings starting at each position
        hashes = [_INIT_HASH] * (n + 1)
        hashes[0] = self._add_to_hash(_INIT_HASH, ord("*"))

        table = self.hash_table
        begin = 0
        for _ in range(self.max_substr_len):
            if begin >= n:
                break
            h = self._add_to_hash(hashes[0], data[begin])
            hashes[0] = h
            if table[h & _MASK] == ((h >> _MASK_BITS) & 0xFFFF):
                hits.append(h & _MASK)
            ptr = 1
            for i in range(begin, n):
                h = self._add_to_hash(hashes[ptr], data[i])
                hashes[ptr] = h
                if table[h & _MASK] == ((h >> _MASK_BITS) & 0xFFFF):
                    hits.append(h & _MASK)
                ptr += 1
            begin += 1
            end_hash = self._add_to_hash(hashes[ptr - 1], ord("*"))
            if table[end_hash & _MASK] == ((end_hash >> _MASK_BITS) & 0xFFFF):
                hits.append(end_hash & _MASK)
        return hits


class MorphologyFeatureExtractor:
    """word → morph vector = Σ morph_trans[hit] over substring hits
    (word_morphology_feature_extractor.h:52-148; CASE-SENSITIVE — no
    tolower anywhere in the reference's morph path)."""

    def __init__(self, substrings: ApproximateSubstringSet, morph_trans: np.ndarray):
        self.substrings = substrings
        self.morph_trans = morph_trans  # (8192, D) float32

    @property
    def dims(self) -> int:
        return self.morph_trans.shape[1]

    def get_feature_vector(self, word: str) -> np.ndarray:
        hits = self.substrings.find_substrings(word)
        out = np.zeros(self.dims, dtype=np.float32)
        for h in hits:
            if h < self.morph_trans.shape[0]:
                out += self.morph_trans[h]
        return out
