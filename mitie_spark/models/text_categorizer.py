"""Text categorizer (M5) — port of the reference's third predictor.

Reference: /root/reference/mitielib/src/text_feature_extraction.cpp:11-73
(doc features = mean word vector plus hashed bags of words and *stems* when
word vectors are absent) and src/text_categorizer.cpp:117-156 (multiclass
linear argmax; out-of-range class → "Unseen"). Python surface mirrored:
mitielib/mitie.py:723-779 (``__call__(tokens) -> (label, score)``).

Ours uses both feature families: the deterministic hashed embeddings (mean
over tokens) and murmur-hashed word/stem bags (stemmer = the stem.c port).
Training: averaged multiclass perceptron on labeled synthetic docs.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from mitie_spark.functions.hashing import make_feat, shash
from mitie_spark.functions.stemmer import stem_word
from mitie_spark.models.ner_model import D, sentence_matrix

HT = 1 << 16  # hashed bag dims


def doc_features(tokens: list[str]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """→ (sparse idxs, sparse vals, dense mean vector). Feature SHAPE per
    text_feature_extraction.cpp:11-73 (a word bag + a stem bag + the mean
    word vector); this native space deliberately uses its own seeds 40/41
    (mod HT) — the reference's exact space (shash(word,0) / shash(stem,10)
    over 500k+dims) lives in sources/dlib_models.DlibTextCategorizer for
    real .dat models."""
    idxs: list[int] = []
    vals: list[float] = []
    for w in tokens:
        i, v = make_feat(shash(w, 40))
        idxs.append(i % HT)
        vals.append(v)
        i, v = make_feat(shash(stem_word(w), 41))
        idxs.append(i % HT)
        vals.append(v)
    X = sentence_matrix(tokens)
    dense = (
        X.mean(axis=0).astype(np.float64) if len(tokens) else np.zeros(D)
    )
    n = max(len(tokens), 1)
    return (
        np.asarray(idxs, dtype=np.int64),
        np.asarray(vals) / n,  # normalize bag by doc length
        dense,
    )


class TextCategorizer:
    UNSEEN = "Unseen"  # text_categorizer.cpp:117-156 out-of-range rule

    def __init__(self, labels: list[str], W_sparse=None, W_dense=None, b=None):
        self.labels = list(labels)
        k = len(self.labels)
        self.W_sparse = W_sparse if W_sparse is not None else np.zeros((k, HT))
        self.W_dense = W_dense if W_dense is not None else np.zeros((k, D))
        self.b = b if b is not None else np.zeros(k)

    def __call__(self, tokens: list[str]) -> tuple[str, float]:
        idxs, vals, dense = doc_features(tokens)
        s = self.b + (self.W_sparse[:, idxs] * vals).sum(axis=1)
        s += self.W_dense @ dense
        k = int(np.argmax(s))
        if k >= len(self.labels):
            return self.UNSEEN, 0.0
        srt = np.sort(s)
        margin = float(srt[-1] - srt[-2]) if len(s) > 1 else float(s[k])
        return self.labels[k], margin

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            labels=np.array(self.labels),
            W_sparse=self.W_sparse,
            W_dense=self.W_dense,
            b=self.b,
        )

    @classmethod
    def load(cls, path: str) -> "TextCategorizer":
        from mitie_spark.models.artifact_path import resolve_artifact

        z = np.load(resolve_artifact(path), allow_pickle=False)
        return cls(
            [str(l) for l in z["labels"]], z["W_sparse"], z["W_dense"], z["b"]
        )


def train_text_categorizer(
    examples: list[tuple[list[str], str]], epochs: int = 10, seed: int = 99
) -> TextCategorizer:
    labels = sorted({y for _, y in examples})
    lid = {l: i for i, l in enumerate(labels)}
    k = len(labels)
    rng = np.random.default_rng(seed)
    Ws = np.zeros((k, HT))
    Wd = np.zeros((k, D))
    b = np.zeros(k)
    Us, Ud, ub = np.zeros_like(Ws), np.zeros_like(Wd), np.zeros_like(b)
    cache = [(doc_features(toks), lid[y]) for toks, y in examples]
    steps = 0
    for _ in range(epochs):
        for i in rng.permutation(len(cache)):
            (idxs, vals, dense), y = cache[i]
            s = b + (Ws[:, idxs] * vals).sum(axis=1) + Wd @ dense
            p = int(np.argmax(s))
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
                b[y] += 1
                b[p] -= 1
                ub[y] += steps
                ub[p] -= steps
    n = max(steps, 1)
    return TextCategorizer(labels, Ws - Us / n, Wd - Ud / n, b - ub / n)


@lru_cache(maxsize=4)
def _load_categorizer(model_path: str):
    """.npz → this engine's TextCategorizer; dlib binary (full model or
    BoW-only pure model) → the reference-exact scoring port
    (sources/dlib_models.DlibTextCategorizer). lru_cached so a reused
    Python worker decodes the (multi-second, for a real 200k-word
    extractor) dlib stream once per process, not once per partition —
    same motivation as extraction._ner_from_dlib_cached."""
    from mitie_spark.sources.dlib_models import is_npz, text_categorizer_from_dlib

    if is_npz(model_path):
        return TextCategorizer.load(model_path)
    return text_categorizer_from_dlib(model_path)


def categorize_documents(df, model_path: str, id_col="doc_id", text_col="text"):
    """DataFrame operator: one narrow Arrow pass, model cached per worker.
    ``model_path`` may be an .npz artifact or a reference user's dlib
    text_categorizer .dat (empty docs label "Unseen" rather than hitting
    the dlib port's non-empty assert)."""
    import pandas as pd

    def run(batches):
        from mitie_spark.functions.tokenizer import tokenize

        model = _load_categorizer(model_path)
        for pdf in batches:
            labels, scores = [], []
            for t in pdf[text_col]:
                toks = tokenize(t or "")
                if toks:
                    lab, sc = model(toks)
                else:
                    lab, sc = "Unseen", 0.0
                labels.append(lab)
                scores.append(sc)
            yield pd.DataFrame(
                {"id": pdf[id_col], "label": labels, "score": scores}
            )

    return df.mapInPandas(run, schema="id:bigint,label:string,score:double")


# ---------------------------------------------------------------------------
# The reference's EXACT text-categorizer training flow
# (text_categorizer_trainer.cpp:120-280) via the OCA multiclass port
# ---------------------------------------------------------------------------


def extract_combined_features(tokens: list[str], fs=None):
    """text_feature_extraction.cpp:11-74 as one dlib text_sample: the
    sorted-unique hashed BoW pairs (``make_feat(shash(word, 0))`` +
    ``make_feat(shash(stem_word(word), 10))``, duplicates summed per
    make_sparse_vector_inplace) followed — when a word-feature extractor
    with nonzero dims is given — by the float32 mean word vector at
    MAX_FEAT+i (sequential sum + reciprocal-multiply division, the
    ``all_sum`` loop at :24-29).  Returns (idx int64 sorted, val float64).
    """
    from mitie_spark.functions.hashing import MAX_FEAT
    from mitie_spark.models.ner_model import dlib_f32_mean

    if not tokens:
        raise ValueError("extract_BoW_features requires a non-empty doc")
    idxs = np.empty(2 * len(tokens), dtype=np.int64)
    vals = np.empty(2 * len(tokens), dtype=np.float64)
    for j, word in enumerate(tokens):
        i, v = make_feat(shash(word, 0))
        idxs[2 * j], vals[2 * j] = i, v
        i, v = make_feat(shash(stem_word(word), 10))
        idxs[2 * j + 1], vals[2 * j + 1] = i, v
    order = np.argsort(idxs, kind="stable")
    idxs, vals = idxs[order], vals[order]
    uniq, starts = np.unique(idxs, return_index=True)
    sums = np.add.reduceat(vals, starts)
    if fs is not None and fs.dims > 0:
        mean = dlib_f32_mean(
            np.stack([fs.token_features(w) for w in tokens])
        ).astype(np.float64)
        uniq = np.concatenate(
            [uniq, MAX_FEAT + np.arange(len(mean), dtype=np.int64)]
        )
        sums = np.concatenate([sums, mean])
    return uniq, sums


def train_text_categorizer_svm(
    data: list[tuple[list[str], str]],
    fs=None,
    beta: float = 0.5,
    auto_tune: bool = False,
):
    """text_categorizer_trainer.cpp:120-280: label ids in first-seen order
    (get_label_id, :283-297), combined features, randomize_samples with a
    default-seeded dlib::rand, the optional find_max_single_variable C
    search over the 2-fold CV F-beta (only when every label has >= 2
    texts; C=300 fallback), final OCA train at C (default 300), eps=1e-4,
    2000 iterations.  ``fs`` is a word-feature extractor (dims > 0 adds
    the mean-vector block) or None for BoW-only, like a default
    total_word_feature_extractor.  Returns a DlibTextCategorizer."""
    from mitie_spark.models.dcd import randomize_samples
    from mitie_spark.models.oca import (
        count_of_least_common_label,
        svm_multiclass_linear_train,
        tune_multiclass_C,
    )
    from mitie_spark.sources.dlib_models import DlibTextCategorizer

    tags: list[str] = []
    tag_id: dict[str, int] = {}
    labels: list[int] = []
    samples = []
    for tokens, label in data:
        if label not in tag_id:
            tag_id[label] = len(tags)
            tags.append(label)
        labels.append(tag_id[label])
        samples.append(extract_combined_features(tokens, fs))

    randomize_samples(samples, labels)

    C = 300.0
    if auto_tune and count_of_least_common_label(labels) > 1:
        C = tune_multiclass_C(
            samples, labels, beta=beta, num_labels=len(tags),
            max_iterations=2000,
        )
    W, b, labs, _ = svm_multiclass_linear_train(
        samples, labels, C=C, eps=0.0001, max_iterations=2000
    )
    df = {"weights": W, "b": b, "labels": labs}
    fe = fs.to_dict() if fs is not None and fs.dims > 0 else None
    return DlibTextCategorizer(tags, df, fe)
