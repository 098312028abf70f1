"""Text analysis: language-ID heuristic, quality scoring, token counting,
fingerprinting helpers (training-data pipeline ops).

Language ID is a stopword/charset n-gram heuristic (no external models):
score = stopword hits per language + charset evidence (CJK, diacritics).
Quality scoring combines length, stopword ratio, punctuation density,
lexical diversity into one [0,1] score. All functions are pure and
deterministic; the Spark surfaces are Arrow-vectorized.
"""

from __future__ import annotations

import re

import pandas as pd

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "was", "that", "for", "with", "on", "as"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "ein", "nicht", "zu"},
    "es": {"el", "la", "los", "las", "de", "que", "y", "en", "un", "una", "es", "por"},
    "fr": {"le", "la", "les", "de", "et", "est", "un", "une", "dans", "que", "pour", "qui"},
    "it": {"il", "la", "di", "che", "e", "un", "una", "per", "sono", "con", "non", "si"},
}
_CJK = re.compile(r"[一-鿿぀-ヿ가-힯]")
_WORD = re.compile(r"[a-zàâäéèêëïîôöùûüçáíóúñß]+", re.IGNORECASE)
_PUNCT = re.compile(r"[^\w\s]")


def lang_id(text: str) -> tuple[str, float]:
    """→ (lang, confidence). 'zh' covers CJK scripts; 'und' when nothing
    scores."""
    if not text:
        return "und", 0.0
    cjk = len(_CJK.findall(text))
    if cjk > len(text) * 0.1:
        return "zh", min(1.0, cjk / max(len(text), 1) * 3)
    words = [w.lower() for w in _WORD.findall(text)]
    if not words:
        return "und", 0.0
    scores = {
        lang: sum(1 for w in words if w in sw) / len(words)
        for lang, sw in _STOPWORDS.items()
    }
    best = max(sorted(scores), key=lambda l: scores[l])
    if scores[best] == 0.0:
        return "und", 0.0
    return best, min(1.0, scores[best] * 4)


def quality_score(text: str) -> dict:
    """Composite quality features + [0,1] score (length, stopword ratio,
    punctuation density, lexical diversity, mean token length)."""
    toks = (text or "").split()
    n = len(toks)
    if n == 0:
        return {
            "n_tokens": 0, "stop_ratio": 0.0, "punct_ratio": 0.0,
            "diversity": 0.0, "mean_tok_len": 0.0, "quality": 0.0,
        }
    low = [t.lower() for t in toks]
    stop = sum(1 for t in low if t in _STOPWORDS["en"]) / n
    punct = len(_PUNCT.findall(text)) / max(len(text), 1)
    diversity = len(set(low)) / n
    mean_len = sum(len(t) for t in toks) / n
    # heuristic composite: enough length, some stopwords, sane punctuation,
    # neither trivially repetitive nor random noise
    length_term = min(n / 100.0, 1.0)
    stop_term = min(stop * 4, 1.0)
    punct_term = 1.0 - min(punct * 5, 1.0)
    div_term = 1.0 - abs(diversity - 0.6)
    tok_term = 1.0 - min(abs(mean_len - 5.0) / 5.0, 1.0)
    quality = (length_term + stop_term + punct_term + div_term + tok_term) / 5.0
    return {
        "n_tokens": n, "stop_ratio": round(stop, 4),
        "punct_ratio": round(punct, 4), "diversity": round(diversity, 4),
        "mean_tok_len": round(mean_len, 4), "quality": round(quality, 4),
    }


_BPE_ISH = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")


def count_tokens_bpe_ish(text: str) -> int:
    """Whitespace+regex token count approximating BPE pre-tokenization."""
    return len(_BPE_ISH.findall(text or ""))


def register_udfs():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<lang:string,confidence:double>")
    def lang_id_udf(texts: pd.Series) -> pd.DataFrame:
        rows = [lang_id(t or "") for t in texts]
        return pd.DataFrame(
            {"lang": [r[0] for r in rows], "confidence": [r[1] for r in rows]}
        )

    @pandas_udf(
        "struct<n_tokens:int,stop_ratio:double,punct_ratio:double,"
        "diversity:double,mean_tok_len:double,quality:double>"
    )
    def quality_udf(texts: pd.Series) -> pd.DataFrame:
        return pd.DataFrame([quality_score(t or "") for t in texts])

    return lang_id_udf, quality_udf
