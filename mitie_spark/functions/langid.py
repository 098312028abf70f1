"""Trained language identification: multinomial Naive Bayes over hashed
byte n-grams (1/2/3-grams of the UTF-8 encoding).

This replaces answer-quality reliance on the stopword/charset heuristic in
``text_quality.lang_id`` (kept for dependency-free callers): the model is
TRAINED on lang-labeled pages in ONE Spark pass (per-doc bucket counts via
``np.bincount`` inside mapInPandas → one groupBy(lang, bucket) sum → a
(L × n_buckets) log-weight matrix collected to the driver), then broadcast
into an Arrow-vectorized scoring UDF. Byte-level n-grams need no unicode
segmentation and capture CJK multi-byte sequences naturally — the same
hashed-feature trick as the reference's text categorizer BoW path
(text_feature_extraction.cpp:39-59), applied to characters instead of
words.

At corpus scale you train on a bounded SAMPLE of labeled pages (the model
is a 5×4096 matrix regardless of corpus size) and broadcast the weights;
scoring is a narrow mapInPandas over the text column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

N_BUCKETS = 4096
_SMOOTH = 0.5  # Laplace/Lidstone smoothing per bucket


def text_buckets(text: str, n_buckets: int = N_BUCKETS) -> np.ndarray:
    """UTF-8 byte 1/2/3-gram hashed bucket counts (length n_buckets).
    Fully vectorized: stride the byte array, combine lanes, bincount."""
    b = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8)
    if len(b) == 0:
        return np.zeros(n_buckets, dtype=np.int64)
    x = b.astype(np.int64)
    parts = [x]
    if len(x) >= 2:
        parts.append((x[:-1] << 8) | x[1:])
    if len(x) >= 3:
        parts.append((x[:-2] << 16) | (x[1:-1] << 8) | x[2:])
    grams = np.concatenate(parts)
    # odd multiplier scrambles the raw gram value across buckets
    return np.bincount((grams * 2654435761) % n_buckets, minlength=n_buckets)


# ---------------------------------------------------------------------------
# synthetic lang-labeled training corpus
# ---------------------------------------------------------------------------
#
# The driver-generated test corpora label pages with a `lang` column, but
# the label is sampled INDEPENDENTLY of the text (verified: 'zh'-labeled
# documents contain the same English-ish token stock as 'en' ones), so no
# model can learn language from those pages. Training therefore uses pages
# generated WITH genuine language signal: per-language function-word
# stocks + diacritics, CJK characters for zh — the same shape real web
# text presents to a lang-ID model.

_LANG_WORDS = {
    "en": ("the and of to in is was that for with on as it he she they have "
           "not this but his her from are were been had which you said").split(),
    "de": ("der die das und ist von mit für auf ein nicht zu sich den dem "
           "eine als auch es an werden aus er hat daß sie nach wird bei über "
           "schön müssen größe straße").split(),
    "es": ("el la los las de que y en un una es por con no para su al lo "
           "como más pero sus le ya o este sí porque esta entre cuando años "
           "está señor niño").split(),
    "fr": ("le la les de et est un une dans que pour qui sur se pas plus "
           "pouvoir par je avec tout faire son mettre autre mais nous comme "
           "être où très déjà français").split(),
}
_ZH_CHARS = "的一是不了人我在有他这为之大来以个中上们到说国和地也子时道出而要于就下得可你年生"


def synthetic_lang_corpus(n_per_lang: int = 200, seed: int = 13,
                          min_words: int = 20, max_words: int = 60):
    """→ list[(lang, text)] with real per-language signal, deterministic."""
    rng = np.random.default_rng(seed)
    rows: list[tuple[str, str]] = []
    for lang, stock in _LANG_WORDS.items():
        for _ in range(n_per_lang):
            n = int(rng.integers(min_words, max_words))
            words = [stock[int(rng.integers(len(stock)))] for _ in range(n)]
            rows.append((lang, " ".join(words) + " ."))
    for _ in range(n_per_lang):
        n = int(rng.integers(min_words * 2, max_words * 2))
        chars = [_ZH_CHARS[int(rng.integers(len(_ZH_CHARS)))] for _ in range(n)]
        rows.append(("zh", "".join(chars) + "。"))
    return rows


class CharNgramLangID:
    """log P(bucket|lang) matrix + log priors; predicts (lang, confidence)."""

    def __init__(self, langs: list[str], log_w: np.ndarray, log_prior: np.ndarray):
        self.langs = list(langs)
        self.log_w = np.asarray(log_w, dtype=np.float64)  # (L, B)
        self.log_prior = np.asarray(log_prior, dtype=np.float64)  # (L,)

    # -- training ----------------------------------------------------------

    @classmethod
    def train_spark(
        cls,
        df,
        text_col: str = "text",
        lang_col: str = "lang",
        n_buckets: int = N_BUCKETS,
    ) -> "CharNgramLangID":
        """ONE wide pass: per-doc hashed counts emitted as (lang, bucket,
        cnt) rows inside mapInPandas, summed by a single groupBy — the only
        shuffle is (L × n_buckets)-bounded. The collected matrix is tiny
        (L·B doubles) no matter the corpus size."""
        from pyspark.sql import functions as F

        def emit(batches):
            for pdf in batches:
                out_lang, out_bucket, out_cnt = [], [], []
                for lang, text in zip(pdf[lang_col], pdf[text_col]):
                    if lang is None:
                        continue
                    c = text_buckets(text or "", n_buckets)
                    nz = np.nonzero(c)[0]
                    out_lang.extend([lang] * len(nz))
                    out_bucket.extend(nz.tolist())
                    out_cnt.extend(c[nz].tolist())
                yield pd.DataFrame(
                    {"lang": out_lang, "bucket": out_bucket, "cnt": out_cnt}
                )

        rows = (
            df.select(lang_col, text_col)
            .mapInPandas(emit, "lang string, bucket int, cnt long")
            .groupBy("lang", "bucket")
            .agg(F.sum("cnt").alias("n"))
            .collect()
        )
        langs = sorted({r["lang"] for r in rows})
        lid = {l: i for i, l in enumerate(langs)}
        counts = np.zeros((len(langs), n_buckets), dtype=np.float64)
        for r in rows:
            counts[lid[r["lang"]], r["bucket"]] = r["n"]
        totals = counts.sum(axis=1, keepdims=True)
        log_w = np.log(counts + _SMOOTH) - np.log(totals + _SMOOTH * n_buckets)
        # prior from per-lang token mass is corpus-length-skewed; a uniform
        # prior keeps minority languages predictable — the n-gram evidence
        # dominates anyway on >20-byte texts
        log_prior = np.full(len(langs), -np.log(len(langs)))
        return cls(langs, log_w, log_prior)

    # -- inference ---------------------------------------------------------

    def predict_batch(self, texts) -> tuple[list[str], np.ndarray]:
        """→ (langs, posterior confidence of the argmax). Empty/whitespace
        texts → 'und' with confidence 0."""
        n_buckets = self.log_w.shape[1]
        langs_out: list[str] = []
        conf = np.zeros(len(texts), dtype=np.float64)
        C = np.stack([text_buckets(t or "", n_buckets) for t in texts])
        scores = C @ self.log_w.T + self.log_prior  # (n, L)
        # log-softmax → posterior of the winner
        m = scores.max(axis=1, keepdims=True)
        p = np.exp(scores - m)
        p /= p.sum(axis=1, keepdims=True)
        best = np.argmax(scores, axis=1)
        for i, t in enumerate(texts):
            if not (t or "").strip():
                langs_out.append("und")
            else:
                langs_out.append(self.langs[best[i]])
                conf[i] = p[i, best[i]]
        return langs_out, conf

    def udf(self):
        """Arrow-vectorized (lang, confidence) scorer over a text column;
        the weight matrix ships to executors inside the closure."""
        from pyspark.sql.functions import pandas_udf

        model = self

        @pandas_udf("struct<lang:string,confidence:double>")
        def lang_nb_udf(texts: pd.Series) -> pd.DataFrame:
            if not len(texts):
                return pd.DataFrame({"lang": [], "confidence": []})
            langs, conf = model.predict_batch(list(texts))
            return pd.DataFrame({"lang": langs, "confidence": conf})

        return lang_nb_udf

    # -- persistence -------------------------------------------------------

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            langs=np.array(self.langs),
            log_w=self.log_w,
            log_prior=self.log_prior,
        )

    @classmethod
    def load(cls, path: str) -> "CharNgramLangID":
        from mitie_spark.models.artifact_path import resolve_artifact

        z = np.load(resolve_artifact(path), allow_pickle=False)
        return cls([str(x) for x in z["langs"]], z["log_w"], z["log_prior"])
