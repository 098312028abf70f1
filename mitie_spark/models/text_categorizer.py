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
        z = np.load(path, allow_pickle=False)
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
