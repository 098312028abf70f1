"""BPE trainer/tokenizer tests: hand-checked merges, determinism, and
local == distributed strategy equivalence (the probe-gated split in
operators/bpe.py must be invisible in the result)."""

import pandas as pd

from mitie_spark.operators.bpe import (
    END,
    _train_bpe_distributed,
    bpe_encode_word,
    bpe_tokenize,
    train_bpe,
    train_bpe_local,
    word_counts,
)


def test_train_bpe_local_hand_checked():
    # Sennrich's classic toy corpus. First merges are driven by 'est</w>'
    # (newest x6 + widest x3 = 9 occurrences of each adjacent pair in it).
    words = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe_local(words, n_merges=4)
    assert merges[0] == ("e", "s")  # count 9
    assert merges[1] == ("es", "t")  # count 9
    assert merges[2] == ("est", END)  # count 9
    assert merges[3] == ("l", "o")  # count 7
    # deterministic: same input -> same table
    assert merges == train_bpe_local(words, n_merges=4)


def test_train_bpe_local_tie_break_and_min_freq():
    # 'ab' and 'ba' both occur twice in 'abab'; lexicographic tie-break
    # must pick ('a','b') — but note after merging pairs counts change.
    merges = train_bpe_local([("abab", 1), ("abab", 1)], n_merges=1)
    assert merges[0] == ("a", "b")
    # min_freq stops the loop: every pair in a singleton word has count 1
    assert train_bpe_local([("xyz", 1)], n_merges=5, min_freq=2) == []


def test_encode_word_roundtrip():
    words = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe_local(words, n_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in words:
        syms = bpe_encode_word(w, ranks)
        # segmentation covers the word exactly (with the end marker)
        assert "".join(syms) == w + END
    # unseen word falls back toward characters but still covers
    assert "".join(bpe_encode_word("zzz", ranks)) == "zzz" + END


def _docs_df(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def test_local_vs_distributed_equivalence(spark):
    texts = [
        "low low low low low lower lower",
        "newest newest newest newest newest newest",
        "widest widest widest",
        "the newest gadget is the widest",
    ]
    docs = _docs_df(spark, texts)
    wc = word_counts(docs)
    local = train_bpe_local(
        [(r["word"], r["cnt"]) for r in wc.collect()], n_merges=8, min_freq=2
    )
    dist = _train_bpe_distributed(wc, n_merges=8, min_freq=2)
    assert dist == local


def test_train_bpe_probe_path_and_tokenize(spark):
    texts = ["aa ab aa ab aa", "ab aa ab", ""]
    docs = _docs_df(spark, texts)
    merges = train_bpe(docs, n_merges=5, min_freq=2)  # tiny vocab → local path
    assert merges == train_bpe_local(
        [(r["word"], r["cnt"]) for r in word_counts(docs).collect()],
        n_merges=5,
        min_freq=2,
    )
    out = bpe_tokenize(docs, merges).orderBy("doc_id").collect()
    assert [r["n_words"] for r in out] == [5, 3, 0]
    ranks = {p: i for i, p in enumerate(merges)}
    exp0 = sum(len(bpe_encode_word(w, ranks)) for w in texts[0].split())
    assert out[0]["n_bpe_tokens"] == exp0
    assert out[2]["n_bpe_tokens"] == 0


def test_local_vs_distributed_equivalence_non_bmp(spark):
    """Astral-plane symbols (surrogate pairs in the JVM): the distributed
    split(word, '') must produce code POINTS like the local list(w) —
    verified here because Java's Pattern.split is code-point-aware; a
    UTF-16-unit split would emit lone surrogate halves and diverge."""
    texts = [
        "x😀y x😀y x😀y x😀y 𝕊ab 𝕊ab 𝕊ab",
        "😀😀 😀😀 😀😀 日本語𝕊 日本語𝕊",
    ]
    docs = _docs_df(spark, texts)
    wc = word_counts(docs)
    local = train_bpe_local(
        [(r["word"], r["cnt"]) for r in wc.collect()], n_merges=6, min_freq=2
    )
    dist = _train_bpe_distributed(wc, n_merges=6, min_freq=2)
    assert dist == local
    assert any("😀" in a or "😀" in b for a, b in local)  # emoji really merged
