"""Reference-exact binary-relation features + dlib ``.svm`` detector scoring.

A reference user arrives with ``rel_classifier_*.svm`` detector files that
were trained on the feature space of
``/root/reference/mitielib/src/binary_relation_detector.cpp:110-189``:

- dense block: the mean total-word-feature vector of each argument span,
  at indices ``0..d-1`` (arg1) and ``d..2d-1`` (arg2) (:121-140);
- sparse block: rolling murmur 1/2/3-gram features over 5 context windows
  (before-first ×2 widths, between, after-second ×2 widths) hashed into
  ``num_hash_dims = 100000`` dims at offset ``2d``, with the window seed
  encoding both the window id and the argument ORDER (base seed 100000
  when arg1 starts after arg2) (:60-71 + :145-175);
- 4 window-combination features from 32-bit range hashes (:177-185).

This module transcribes that algorithm over the already-ported and
regression-tested murmur primitives (functions/hashing.py), so reference
detector files score identically here — both in the binding facade and
distributed through operators/extraction.extract_kg.

The engine's own (npz) relation pipeline keeps its native hashed space
(models/relation_model.relation_features); this space exists for dlib
artifact compatibility.
"""

from __future__ import annotations

import numpy as np

from mitie_spark.functions.hashing import (
    dlib_string_hash,
    murmur_hash3_128,
    murmur_hash3_128_u64x3,
)
from mitie_spark.models.relation_model import RelationModel

NUM_HASH_DIMS = 100000  # binary_relation_detector.cpp:171
WIN_SMALL = 2  # :160
WIN_BIG = 5  # :165
ORDER_SEED = 100000  # :151-157


def _hash_string(s: str, seed: int) -> tuple[int, int]:
    """cpp:17-25 — empty string hashes to (0, 0)."""
    if not s:
        return (0, 0)
    return murmur_hash3_128(s.encode("utf-8"), seed)


def _accum_123gram(
    out_i: list, out_v: list, lo: int, hi: int, tokens: list[str], seed: int
) -> None:
    """cpp:29-71 — rolling 1/2/3-gram hashed features over [lo, hi)."""
    h0 = h1 = h2 = (0, 0)
    for i in range(lo, hi):
        h2, h1 = h1, h0
        h0 = _hash_string(tokens[i], seed)
        out_i.append(h0[0] % NUM_HASH_DIMS)
        out_v.append(1.0 if (h0[1] & 1) else -1.0)
        if i > lo:
            t = murmur_hash3_128_u64x3(h0[0], h1[0], 0)
            out_i.append(t[0] % NUM_HASH_DIMS)
            out_v.append(1.0 if (t[1] & 1) else -1.0)
        if i > lo + 1:
            t = murmur_hash3_128_u64x3(h0[0], h1[0], h2[0])
            out_i.append(t[0] % NUM_HASH_DIMS)
            out_v.append(1.0 if (t[1] & 1) else -1.0)


def _hash_range(tokens: list[str], lo: int, hi: int, seed: int) -> int:
    """cpp:90-102 — chained 32-bit dlib::hash over the range's tokens."""
    h = seed
    for i in range(lo, hi):
        h = dlib_string_hash(tokens[i], h)
    return h


def _make_feat3(v1: int, v2: int, v3: int) -> tuple[int, float]:
    """cpp:75-86."""
    t = murmur_hash3_128_u64x3(v1, v2, v3)
    return t[0] % NUM_HASH_DIMS, 1.0 if (t[1] & 1) else -1.0


def reference_relation_sparse_feats(
    tokens: list[str], arg1: tuple[int, int], arg2: tuple[int, int]
) -> tuple[np.ndarray, np.ndarray]:
    """The n-gram window block of ``extract_binary_relation``
    (cpp:142-185), indices in [0, NUM_HASH_DIMS) — the caller adds the
    ``2d`` offset (or keeps the dense part separate)."""
    s1, _ = arg1
    s2, _ = arg2
    r1, r2 = (arg1, arg2) if s1 <= s2 else (arg2, arg1)
    seed = 0 if s1 <= s2 else ORDER_SEED
    n = len(tokens)
    before = (max(r1[0] - WIN_SMALL, 0), r1[0])
    before2 = (max(r1[0] - WIN_BIG, 0), r1[0])
    between = (min(r1[1], r2[1]), max(r1[0], r2[0]))
    after = (r2[1], min(r2[1] + WIN_SMALL, n))
    after2 = (r2[1], min(r2[1] + WIN_BIG, n))

    out_i: list = []
    out_v: list = []
    _accum_123gram(out_i, out_v, *before, tokens, seed)
    _accum_123gram(out_i, out_v, *before2, tokens, seed + 1)
    _accum_123gram(out_i, out_v, *between, tokens, seed + 2)
    _accum_123gram(out_i, out_v, *after, tokens, seed + 3)
    _accum_123gram(out_i, out_v, *after2, tokens, seed + 4)

    h1 = _hash_range(tokens, *before, seed + 5)
    h2 = _hash_range(tokens, *between, seed + 5)
    h3 = _hash_range(tokens, *after, seed + 5)
    for i, v in (
        _make_feat3(h1, h2, 0),
        _make_feat3(0, h2, 0),
        _make_feat3(0, h2, h3),
        _make_feat3(h1, h2, h3),
    ):
        out_i.append(i)
        out_v.append(v)
    return (
        np.asarray(out_i, dtype=np.int64),
        np.asarray(out_v, dtype=np.float64),
    )


def reference_relation_pairs(
    tokens: list[str],
    X: np.ndarray,
    arg1: tuple[int, int],
    arg2: tuple[int, int],
) -> list[tuple[int, float]]:
    """The full sparse sample of ``extract_binary_relation`` — dense means
    encoded as leading pairs at 0..2d-1 like the C++ (cpp:121-140), n-gram
    feats at offset 2d, duplicates index-sorted and summed
    (make_sparse_vector_inplace). This is the exact vector a reference
    ``.svm`` decision function was trained on; ``X`` rows must come from
    the SAME total_word_feature_extractor (fingerprint-guarded upstream)."""
    from mitie_spark.models.ner_model import dlib_f32_mean

    s1, e1 = arg1
    s2, e2 = arg2
    # matrix<float,0,1> accumulation: sequential float32 sums + float32
    # reciprocal multiply, bit-exact vs the compiled reference
    m1 = dlib_f32_mean(X[s1:e1])
    m2 = dlib_f32_mean(X[s2:e2])
    d = len(m1)
    pairs = [(i, float(m1[i])) for i in range(d)]
    pairs += [(d + i, float(m2[i])) for i in range(d)]
    si, sv = reference_relation_sparse_feats(tokens, arg1, arg2)
    off = 2 * d
    pairs += [(off + int(i), float(v)) for i, v in zip(si, sv)]
    return merge_sparse_pairs(pairs)


def merge_sparse_pairs(pairs: list[tuple[int, float]]) -> list[tuple[int, float]]:
    """dlib make_sparse_vector_inplace: sort by index, sum duplicates
    (values here are ±1 so merged sums are exact in binary)."""
    pairs = sorted(pairs, key=lambda p: p[0])
    out: list[tuple[int, float]] = []
    for i, v in pairs:
        if out and out[-1][0] == i:
            out[-1] = (i, out[-1][1] + v)
        else:
            out.append((i, v))
    return out


def score_pairs(w: np.ndarray, b: float, pairs) -> float:
    """Linear decision value ``Σ w[i]·v − b`` over a sparse pair list,
    skipping out-of-range indices like dlib's sparse dot.

    This facade path sums in dlib's exact order (one sequential fold over
    the index-sorted merged pairs, dense block included) — byte-for-byte
    the C++ decision value. The distributed path (DlibRelationModel via
    score_feature_rows) groups the sum differently (segment-reduce over
    unmerged sparse + separate einsum dense), so the two can differ in
    the LAST ULP; a relation decision flips only when the score is within
    ~1e-16 of 0. Kept deliberately: the facade must match the C++ bit
    stream, the distributed path must score whole Arrow batches."""
    n = len(w)
    s = 0.0
    for i, v in pairs:
        if i < n:
            s += w[i] * v
    return float(s - b)


class DlibRelationModel(RelationModel):
    """RelationModel backed by reference ``.svm`` detector files: collapsed
    linear weights over the reference feature space, scored through the
    shared segment-reduce machinery, with the feature hook swapped to the
    exact C++ extraction above. Drop-in for operators/extraction.extract_kg
    (same preds/fingerprint/detect_batch surface)."""

    kind = "dlib"

    def __init__(self, preds, W_sparse, W_dense, b, fingerprint):
        # bypass RelationModel defaults: shapes are (K, NUM_HASH_DIMS) and
        # (K, 2d) here, not the native HR/DENSE_DIM
        self.preds = list(preds)
        self.W_sparse = W_sparse
        self.W_dense = W_dense
        self.b = b
        self.fingerprint = int(fingerprint)

    @classmethod
    def from_svm_files(cls, paths: list[str], dims: int) -> "DlibRelationModel":
        """``dims`` = the word-feature extractor's dimension count (splits
        the collapsed weight vector into dense/sparse blocks)."""
        from mitie_spark.sources.dlib_models import (
            read_binary_relation_detector,
            relation_weights_from_detector,
        )

        dets = [read_binary_relation_detector(p) for p in sorted(paths)]
        if not dets:
            raise ValueError("no detector files given")
        fps = {det["fingerprint"] for det in dets}
        if len(fps) != 1:
            raise ValueError(
                "detectors trained against different word-feature "
                f"extractors cannot be pooled (fingerprints {sorted(fps)})"
            )
        n_dims = 2 * dims + NUM_HASH_DIMS
        rows = [relation_weights_from_detector(det, n_dims) for det in dets]
        W = np.stack([r[0] for r in rows])
        return cls(
            preds=[det["relation_type"] for det in dets],
            W_sparse=W[:, 2 * dims :],
            W_dense=W[:, : 2 * dims],
            # shared scorer adds self.b; decision value is w·x − b_det
            b=-np.array([r[1] for r in rows]),
            fingerprint=fps.pop(),
        )

    def _features(self, tokens, X, arg1, arg2, mean_cache=None):
        s1, e1 = arg1
        s2, e2 = arg2

        from mitie_spark.models.ner_model import dlib_f32_mean

        def _mean(s, e):
            if mean_cache is None:
                return dlib_f32_mean(X[s:e])
            m = mean_cache.get(("ref", s, e))
            if m is None:
                m = dlib_f32_mean(X[s:e])
                mean_cache[("ref", s, e)] = m
            return m

        dense = np.concatenate([_mean(s1, e1), _mean(s2, e2)]).astype(
            np.float64
        )
        idxs, vals = reference_relation_sparse_feats(tokens, arg1, arg2)
        return idxs, vals, dense

    def save(self, path: str) -> None:  # pragma: no cover - guard only
        raise NotImplementedError(
            "export dlib detectors with "
            "sources.dlib_models.write_binary_relation_detector"
        )
