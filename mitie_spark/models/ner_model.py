"""NER model — BILOU sequence segmenter + chunk classifier, NumPy end-to-end.

Re-expresses the reference's two-part NER (SURVEY.md §2.3 M1+M2):

- M1: first-order BILOU chain decoded by Viterbi with illegal-transition
  rejection, window-3 emission features
  (/root/reference/dlib/dlib/svm/sequence_segmenter.h:131-253,363-408;
  find_max_factor_graph_viterbi.h:59). The reference's weights come from a
  structured-SVM solver; ours are trained with an averaged structured
  perceptron on the deterministic synthetic corpus (the reference's binary
  models are not vendored — makefile:13-17 downloads them).
- M2: per-chunk classification with murmur-hashed sparse features + dense
  word-vector blocks, multiclass linear argmax, and the "predicted class ≥
  num_tags ⇒ drop chunk" rule
  (/root/reference/mitielib/src/ner_feature_extraction.cpp:167-388;
  named_entity_extractor.cpp:147-174; dlib/svm/function.h:752-832).

Word features: deterministic murmur-derived embeddings + shape flags
(stand-in for the 271-dim CCA vectors of total_word_feature_extractor.h;
same lookup semantics — a broadcast-free hash "join" per token).

All inference is batched NumPy inside mapInPandas (SURVEY.md §4): the model
object is broadcast once per executor, never per batch.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from mitie_spark.functions.hashing import (
    hashed_embedding,
    make_feat,
    prefix,
    shash,
    suffix,
)

# BILOU state ids (sequence_segmenter.h uses the same 5-state layout when
# use_BIO_model == false; ner_feature_extraction.h:35)
O, B, I, L, U = 0, 1, 2, 3, 4
N_STATES = 5
NEG = -1e30

# legal transitions prev→cur (sequence_segmenter.h:131-206 reject_labeling)
_ALLOWED = np.full((N_STATES, N_STATES), NEG)
for prev, curs in {
    O: (O, B, U),
    B: (I, L),
    I: (I, L),
    L: (O, B, U),
    U: (O, B, U),
}.items():
    for c in curs:
        _ALLOWED[prev, c] = 0.0
_START_OK = np.array([0.0, 0.0, NEG, NEG, 0.0])  # O, B, U may start
_END_OK = np.array([0.0, NEG, NEG, 0.0, 0.0])  # O, L, U may end

EMB_DIM = 32
SHAPE_DIM = 6
D = EMB_DIM + SHAPE_DIM  # per-token dense feature width
WINDOW = 3  # sequence_segmenter window_size (ner_feature_extraction.h:39)
SEG_DIM = WINDOW * D + 1  # + bias

HC = 1 << 16  # hashed feature space of the chunk classifier

# feature-space fingerprint (S5 parity: the reference chains a murmur
# fingerprint of the word-feature extractor through every model and verifies
# it before predicting — named_entity_extractor.h:223-245,
# binary_relation_detector.h:70-77). Ours fingerprints the deterministic
# hashed-embedding feature space; bump the version when D/EMB_DIM change.
import zlib as _zlib

FEATURE_FINGERPRINT = _zlib.crc32(f"hashed-emb-v1:{EMB_DIM}:{SHAPE_DIM}".encode())
TAGS = ["PERSON", "LOCATION", "ORGANIZATION"]
NOT_ENTITY = len(TAGS)  # drop rule: predicted class ≥ len(TAGS)


@lru_cache(maxsize=500_000)
def token_features(word: str) -> np.ndarray:
    """Dense per-token features: hashed embedding + ASCII shape flags
    (shape predicates per ner_feature_extraction.cpp:70-145)."""
    v = np.empty(D, dtype=np.float32)
    v[:EMB_DIM] = hashed_embedding(word, EMB_DIM)
    c0 = word[0] if word else ""
    v[EMB_DIM + 0] = 1.0 if c0.isupper() else 0.0
    v[EMB_DIM + 1] = 1.0 if word.isupper() else 0.0
    v[EMB_DIM + 2] = 1.0 if any(ch.isdigit() for ch in word) else 0.0
    v[EMB_DIM + 3] = 1.0 if word.isalpha() else 0.0
    v[EMB_DIM + 4] = min(len(word), 10) / 10.0
    v[EMB_DIM + 5] = 1.0 if word.islower() else 0.0
    return v


def sentence_matrix(tokens: list[str]) -> np.ndarray:
    """(n, D) float32 token feature matrix (sentence_to_feats analog,
    ner_feature_extraction.cpp:13-23)."""
    if not tokens:
        return np.zeros((0, D), dtype=np.float32)
    return np.stack([token_features(t) for t in tokens])


def window_matrix(X: np.ndarray) -> np.ndarray:
    """(n, 3D+1): [x_{i-1}, x_i, x_{i+1}, 1] with zero padding at the edges
    (the window-3 emission features of sequence_segmenter.h:208-253)."""
    n = X.shape[0]
    W = np.zeros((n, SEG_DIM), dtype=np.float32)
    if n == 0:
        return W
    W[1:, 0:D] = X[:-1]
    W[:, D : 2 * D] = X
    W[:-1, 2 * D : 3 * D] = X[1:]
    W[:, -1] = 1.0
    return W


def viterbi(emissions: np.ndarray, trans: np.ndarray) -> np.ndarray:
    """Exact first-order decode with BILOU constraints
    (find_max_factor_graph_viterbi.h:59; O(n·25))."""
    n = emissions.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    T = trans + _ALLOWED
    dp = emissions[0] + _START_OK
    back = np.zeros((n, N_STATES), dtype=np.int8)
    for t in range(1, n):
        cand = dp[:, None] + T  # (prev, cur)
        back[t] = np.argmax(cand, axis=0)
        dp = cand[back[t], np.arange(N_STATES)] + emissions[t]
    dp = dp + _END_OK
    path = np.zeros(n, dtype=np.int64)
    path[-1] = int(np.argmax(dp))
    for t in range(n - 1, 0, -1):
        path[t - 1] = back[t, path[t]]
    return path


def viterbi_batch(
    emissions_list: list[np.ndarray], trans: np.ndarray
) -> list[np.ndarray]:
    """Decode a batch of sequences in one vectorized DP: identical
    arithmetic and argmax tie-breaking to per-doc ``viterbi`` (equivalence
    unit-tested), but the python-level loop runs max_len times per Arrow
    batch instead of sum(len) times — the per-step (B, 5, 5) NumPy ops
    amortize the interpreter overhead across documents."""
    B = len(emissions_list)
    if B == 0:
        return []
    T = trans + _ALLOWED
    lens = np.array([e.shape[0] for e in emissions_list], dtype=np.int64)
    Lmax = int(lens.max())
    if Lmax == 0:
        return [np.zeros(0, dtype=np.int64) for _ in range(B)]
    NEG = -1e30
    E = np.full((B, Lmax, N_STATES), 0.0)
    for b, e in enumerate(emissions_list):
        if lens[b]:
            E[b, : lens[b]] = e
    dp = np.full((B, N_STATES), NEG)
    nz = lens > 0
    dp[nz] = E[nz, 0] + _START_OK
    back = np.zeros((B, Lmax, N_STATES), dtype=np.int8)
    for t in range(1, Lmax):
        active = lens > t
        if not active.any():
            break
        cand = dp[active][:, :, None] + T[None]  # (A, prev, cur)
        bt = np.argmax(cand, axis=1).astype(np.int8)  # (A, cur)
        dp_a = (
            np.take_along_axis(cand, bt[:, None, :].astype(np.int64), axis=1)[
                :, 0, :
            ]
            + E[active, t]
        )
        dp[active] = dp_a
        back[active, t] = bt
    # batched backtrack: one assignment per time step over the active docs
    path_arr = np.zeros((B, Lmax), dtype=np.int64)
    final = dp + _END_OK
    last_state = np.argmax(final, axis=1)
    idx = np.nonzero(nz)[0]
    path_arr[idx, lens[idx] - 1] = last_state[idx]
    for t in range(Lmax - 1, 0, -1):
        active = lens > t
        if not active.any():
            continue
        path_arr[active, t - 1] = back[
            active, t, path_arr[active, t]
        ]
    return [path_arr[b, : lens[b]].copy() for b in range(B)]


def labels_to_chunks(path: np.ndarray) -> list[tuple[int, int]]:
    """BILOU label path → half-open token ranges
    (sequence_segmenter.h:389-408)."""
    chunks = []
    start = None
    for i, s in enumerate(path):
        if s == U:
            chunks.append((i, i + 1))
            start = None
        elif s == B:
            start = i
        elif s == L and start is not None:
            chunks.append((start, i + 1))
            start = None
        elif s == O:
            start = None
    return chunks


def chunks_to_labels(n: int, chunks: list[tuple[int, int]]) -> np.ndarray:
    path = np.full(n, O, dtype=np.int64)
    for s, e in chunks:
        if e - s == 1:
            path[s] = U
        else:
            path[s] = B
            path[s + 1 : e - 1] = I
            path[e - 1] = L
    return path


# ---------------------------------------------------------------------------
# chunk classifier features (simplified port of extract_ner_chunk_features,
# ner_feature_extraction.cpp:167-388: hashed words/prefix/suffix of the chunk
# ±2 context, plus dense first/last/mean/before/after blocks each normalized
# by 1/(0.5‖v‖+1e-10))
# ---------------------------------------------------------------------------

N_DENSE_BLOCKS = 5
CLS_DENSE = N_DENSE_BLOCKS * D


def _norm_block(v: np.ndarray) -> np.ndarray:
    return v / (0.5 * float(np.linalg.norm(v)) + 1e-10)


@lru_cache(maxsize=2_000_000)
def _featC(word: str, seed: int) -> tuple[int, float]:
    idx, val = make_feat(shash(word, seed))
    return idx % HC, val


@lru_cache(maxsize=2_000_000)
def _prefsufC(word: str) -> tuple[int, float, int, float]:
    """Cached prefix/suffix hashed features of a word (the murmur u32x4
    variants recompute per chunk occurrence otherwise)."""
    pi, pv = make_feat(prefix(word, 10))
    si, sv = make_feat(suffix(word, 11))
    return pi % HC, pv, si % HC, sv


def chunk_features(
    tokens: list[str], X: np.ndarray, start: int, end: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """→ (sparse idx array over HC, sparse val array, dense (CLS_DENSE,))."""
    idxs: list[int] = []
    vals: list[float] = []

    for pos in range(start, end):
        w = tokens[pos]
        f = _featC(w, 0); idxs.append(f[0]); vals.append(f[1])
        pi, pv, si, sv = _prefsufC(w)
        idxs.append(pi); vals.append(pv)
        idxs.append(si); vals.append(sv)
    f = _featC(tokens[start], 1); idxs.append(f[0]); vals.append(f[1])
    f = _featC(tokens[end - 1], 2); idxs.append(f[0]); vals.append(f[1])
    for off, seed in ((-2, 20), (-1, 21), (0, 22), (1, 23)):
        p = start + off if off < 0 else end - 1 + off
        if 0 <= p < len(tokens):
            f = _featC(tokens[p], seed); idxs.append(f[0]); vals.append(f[1])
    f = _featC(str(end - start if end - start < 5 else 5), 30)
    idxs.append(f[0]); vals.append(f[1])  # length bucket

    first = X[start]
    last = X[end - 1]
    mean = X[start:end].mean(axis=0)
    before = X[start - 1] if start > 0 else np.zeros(D, dtype=np.float32)
    after = X[end] if end < len(tokens) else np.zeros(D, dtype=np.float32)
    dense = np.concatenate(
        [_norm_block(b) for b in (first, last, mean, before, after)]
    ).astype(np.float32)
    return np.asarray(idxs, dtype=np.int64), np.asarray(vals), dense


class NerModel:
    """Weights container + predict; save/load as .npz (broadcastable)."""

    def __init__(
        self,
        W_seg: np.ndarray | None = None,
        T_seg: np.ndarray | None = None,
        W_cls_sparse: np.ndarray | None = None,
        W_cls_dense: np.ndarray | None = None,
        b_cls: np.ndarray | None = None,
        tags: list[str] | None = None,
    ):
        k = NOT_ENTITY + 1
        self.W_seg = W_seg if W_seg is not None else np.zeros((N_STATES, SEG_DIM))
        self.T_seg = T_seg if T_seg is not None else np.zeros((N_STATES, N_STATES))
        self.W_cls_sparse = (
            W_cls_sparse if W_cls_sparse is not None else np.zeros((k, HC))
        )
        self.W_cls_dense = (
            W_cls_dense if W_cls_dense is not None else np.zeros((k, CLS_DENSE))
        )
        self.b_cls = b_cls if b_cls is not None else np.zeros(k)
        self.tags = tags or TAGS

    # --- prediction (named_entity_extractor.cpp:132-174,178-225) ---
    def segment(self, tokens: list[str], X: np.ndarray | None = None):
        if X is None:
            X = sentence_matrix(tokens)
        em = window_matrix(X) @ self.W_seg.T.astype(np.float32)
        path = viterbi(em.astype(np.float64), self.T_seg)
        return labels_to_chunks(path), X

    def classify_chunk(self, tokens, X, start, end):
        idxs, vals, dense = chunk_features(tokens, X, start, end)
        scores = self.b_cls + (self.W_cls_sparse[:, idxs] * vals).sum(axis=1)
        scores += self.W_cls_dense @ dense.astype(np.float64)
        k = int(np.argmax(scores))
        srt = np.sort(scores)
        margin = float(srt[-1] - srt[-2]) if len(scores) > 1 else float(scores[k])
        return k, margin

    def segment_batch(
        self, Xs: list[np.ndarray], max_padded_cells: int = 1_000_000
    ):
        """Batched segmentation: one stacked emissions matmul for the whole
        batch + the vectorized Viterbi — value-identical to per-doc
        ``segment`` (equivalence unit-tested).

        The Viterbi DP pads to the longest doc in its group, so docs are
        grouped by length with total padded cells (group_size × max_len)
        capped: one 30k-token outlier in a 2048-row Arrow batch would
        otherwise inflate the padded tensors to B×Lmax ≈ gigabytes. With
        the cap, a skewed doc lands in its own small group and costs only
        itself — preserving the 'a 100×-long document only costs its own
        batch' property of the per-doc path."""
        if not Xs:
            return []
        Ws = [window_matrix(X) for X in Xs]
        allW = np.concatenate(Ws)
        allE = allW @ self.W_seg.T.astype(np.float32)
        offs = np.cumsum([0] + [w.shape[0] for w in Ws])
        ems = [
            allE[offs[i] : offs[i + 1]].astype(np.float64)
            for i in range(len(Ws))
        ]
        out: list = [None] * len(Xs)
        order = sorted(range(len(Xs)), key=lambda i: ems[i].shape[0])
        group: list[int] = []
        for i in order:
            n = ems[i].shape[0]  # ascending: n is the group max
            if group and (len(group) + 1) * max(n, 1) > max_padded_cells:
                for j, p in zip(
                    group, viterbi_batch([ems[j] for j in group], self.T_seg)
                ):
                    out[j] = labels_to_chunks(p)
                group = []
            group.append(i)
        for j, p in zip(
            group, viterbi_batch([ems[j] for j in group], self.T_seg)
        ):
            out[j] = labels_to_chunks(p)
        return out

    _CHUNK_CACHE_MAX = 500_000

    def classify_chunks(self, tokens, X, chunks):
        """chunks → [(start, end, tag, score)], dropping NOT_ENTITY
        (named_entity_extractor.cpp:147-174).

        Results are memoized per model instance: every feature of a chunk
        (hashed words/prefix/suffix, the ±2-token context seeds, and the
        five dense X-row blocks) is a pure function of the chunk tokens
        plus the tokens at start−2, start−1 and end — so identical
        (chunk, context) windows, which recur constantly in web text,
        classify once."""
        cache = getattr(self, "_chunk_cache", None)
        if cache is None:
            cache = self._chunk_cache = {}
        n = len(tokens)
        out = []
        for s, e in chunks:
            key = (
                tuple(tokens[s:e]),
                tokens[s - 2] if s >= 2 else None,
                tokens[s - 1] if s >= 1 else None,
                tokens[e] if e < n else None,
            )
            hit = cache.get(key)
            if hit is None:
                hit = self.classify_chunk(tokens, X, s, e)
                if len(cache) < self._CHUNK_CACHE_MAX:
                    cache[key] = hit
            k, margin = hit
            if k < len(self.tags):
                out.append((s, e, self.tags[k], margin))
        return out

    def extract_entities(self, tokens: list[str]):
        """→ [(start, end, tag, score)] — chunks classified NOT_ENTITY are
        dropped (named_entity_extractor.cpp:147-174)."""
        if not tokens:
            return []
        chunks, X = self.segment(tokens)
        return self.classify_chunks(tokens, X, chunks)

    # --- serialization ---
    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            W_seg=self.W_seg,
            T_seg=self.T_seg,
            W_cls_sparse=self.W_cls_sparse,
            W_cls_dense=self.W_cls_dense,
            b_cls=self.b_cls,
            tags=np.array(self.tags),
            fingerprint=np.array([FEATURE_FINGERPRINT], dtype=np.int64),
        )

    @classmethod
    def load(cls, path: str) -> "NerModel":
        z = np.load(path, allow_pickle=False)
        if "fingerprint" in z and int(z["fingerprint"][0]) != FEATURE_FINGERPRINT:
            raise ValueError(
                "NER model was trained against a different word-feature "
                "space (fingerprint mismatch) — retrain or ship the matching "
                "feature code (reference: named_entity_extractor.h:223-245)"
            )
        return cls(
            W_seg=z["W_seg"],
            T_seg=z["T_seg"],
            W_cls_sparse=z["W_cls_sparse"],
            W_cls_dense=z["W_cls_dense"],
            b_cls=z["b_cls"],
            tags=[str(t) for t in z["tags"]],
        )


# ---------------------------------------------------------------------------
# training (averaged structured perceptron; the reference's structured-SVM
# trainer ner_trainer.cpp:224-276 is the analog — same feature space, same
# two-part Part I segmenter / Part II classifier split)
# ---------------------------------------------------------------------------


def train_segmenter(sentences, epochs: int = 8, seed: int = 1234):
    """sentences: [(tokens, chunk_ranges)]. Returns (W_seg, T_seg)."""
    rng = np.random.default_rng(seed)
    W = np.zeros((N_STATES, SEG_DIM))
    T = np.zeros((N_STATES, N_STATES))
    Wa = np.zeros_like(W)
    Ta = np.zeros_like(T)
    feats = [
        (window_matrix(sentence_matrix(toks)), chunks_to_labels(len(toks), chunks))
        for toks, chunks in sentences
        if toks
    ]
    t_step = 0
    for _ in range(epochs):
        order = rng.permutation(len(feats))
        for i in order:
            FX, gold = feats[i]
            em = FX @ W.T
            pred = viterbi(em, T)
            if not np.array_equal(pred, gold):
                for t in range(len(gold)):
                    if pred[t] != gold[t]:
                        W[gold[t]] += FX[t]
                        W[pred[t]] -= FX[t]
                    if t > 0:
                        T[gold[t - 1], gold[t]] += 1.0
                        T[pred[t - 1], pred[t]] -= 1.0
            t_step += 1
            Wa += W
            Ta += T
    return Wa / max(t_step, 1), Ta / max(t_step, 1)


def train_chunk_classifier(
    examples, epochs: int = 6, seed: int = 1235, n_classes: int | None = None
):
    """examples: [(tokens, start, end, class_id)] with class_id == the
    not-entity id (== number of real tags) for non-entity segments. Returns
    (W_sparse, W_dense, b). ``n_classes`` = real tags + 1; defaults to the
    built-in TAGS vocabulary."""
    rng = np.random.default_rng(seed)
    k = n_classes if n_classes is not None else NOT_ENTITY + 1
    Ws = np.zeros((k, HC))
    Wd = np.zeros((k, CLS_DENSE))
    b = np.zeros(k)
    # lazy averaging: avg = W_final - U/steps where U accumulates
    # step_index * delta at each update (avoids O(HC) work per example)
    Us, Ud, ub = np.zeros_like(Ws), np.zeros_like(Wd), np.zeros_like(b)
    cache = []
    for tokens, s, e, y in examples:
        X = sentence_matrix(tokens)
        idxs, vals, dense = chunk_features(tokens, X, s, e)
        cache.append((idxs, vals, dense.astype(np.float64), y))
    steps = 0
    for _ in range(epochs):
        order = rng.permutation(len(cache))
        for i in order:
            idxs, vals, dense, y = cache[i]
            scores = b + (Ws[:, idxs] * vals).sum(axis=1)
            scores += Wd @ dense
            p = int(np.argmax(scores))
            steps += 1
            if p != y:
                np.add.at(Ws[y], idxs, vals)
                np.add.at(Ws[p], idxs, -vals)
                np.add.at(Us[y], idxs, steps * vals)
                np.add.at(Us[p], idxs, -steps * vals)
                Wd[y] += dense
                Wd[p] -= dense
                Ud[y] += steps * dense
                Ud[p] -= steps * dense
                b[y] += 1.0
                b[p] -= 1.0
                ub[y] += steps
                ub[p] -= steps
    n = max(steps, 1)
    return Ws - Us / n, Wd - Ud / n, b - ub / n
