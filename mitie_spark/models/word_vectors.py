"""wordrep-equivalent distributional word embeddings (A1-A7), Spark-first.

Reference pipeline (/root/reference/tools/wordrep/src/main.cpp:142-149):
count words → CCA word vectors from positional context windows → top-k
substrings → morphology CCA → total_word_feature_extractor. This module
re-expresses each stage:

- A1/A2 word counts + top-k vocab: exact groupBy/count + orderBy/limit —
  Spark's shuffle aggregate replaces the count-min sketch + heap
  (count_min_sketch.h:16-355, main.cpp:29-77); the sketch's only purpose was
  bounded RAM on one machine.
- A4 context windows: lead/lag over (doc, pos) windows → positional
  co-occurrence counts. The reference streams a 9-token window
  (word_vects.cpp:36-62); here the *sufficient statistics* (joint counts of
  left-offset/right-offset word pairs) are exact DataFrame aggregations, so
  no reservoir sample (A5) is needed until the pair-count table itself
  outgrows memory — at which point df.sample(fraction) slots in front.
- A6 CCA: the left/right context covariance blocks are assembled from the
  counts on the driver (dims = 4·(V+1), small once the vocab is capped) and
  solved with a whitened SVD — same math as dlib::cca
  (cca_abstract.h:44-130), deterministic instead of randomized because the
  matrices are small after the vocab cap.
- A7 per-word mean projected context: one more groupBy aggregation.
- Morphology (basic_morph/cca_morph): top-k boundary-marked substrings by
  corpus frequency (A3), then a per-substring mean-word-vector projection —
  a diagonal-normalized simplification of the morph CCA
  (cca_morph.cpp:32-65), sufficient for OOV fallback vectors.

Output mirrors total_word_feature_extractor.h:107-137 (T9): known word →
[0, left_cca, right_cca, morph]; OOV word → [1, zeros, morph(word)].
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mitie_spark.functions.morphology import ApproximateSubstringSet

WINDOW = 4  # positional offsets ±1..±4 (word_vects.cpp:36-62)


def tokenize_fold_udf():
    """CoNLL tokenize + digit folding (unigram_tokenizer semantics, T2)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def tok(texts: pd.Series) -> pd.Series:
        from mitie_spark.functions.tokenizer import fold_digits, tokenize

        return pd.Series(
            [
                [] if t is None else [fold_digits(w) for w in tokenize(t)]
                for t in texts
            ]
        )

    return tok


def doc_tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    tok = tokenize_fold_udf()
    return docs.select(
        F.col(id_col).alias("doc"), tok(F.col(text_col)).alias("toks")
    ).select("doc", F.posexplode("toks").alias("pos", "word"))


def word_counts(tokens: DataFrame) -> DataFrame:
    """A1: exact GROUP BY word COUNT(*)."""
    return tokens.groupBy("word").agg(F.count("*").alias("cnt"))


def top_k_words(counts: DataFrame, k: int) -> DataFrame:
    """A2: TopK by count (deterministic tie-break)."""
    return counts.orderBy(F.desc("cnt"), F.asc("word")).limit(k)


def substring_counts(counts: DataFrame, max_len: int = 5) -> DataFrame:
    """A3: boundary-marked substrings (≤ max_len chars incl. '*') of vocab
    words, weighted by word frequency (basic_morph.cpp:47-124). CASE-
    SENSITIVE like the reference (basic_morph never lowercases — so the
    morph features of OOV words carry capitalization, which the NER
    segmenter needs to find name boundaries). Dynamic substr bounds need
    SQL expr (F.substring takes literals only)."""
    marked = counts.select(
        F.concat(F.lit("*"), F.col("word"), F.lit("*")).alias("mw"), "cnt"
    )
    subs = marked.select(
        "cnt",
        F.explode(
            F.expr(
                f"""
                flatten(transform(sequence(1, length(mw)), i ->
                    filter(transform(sequence(2, {max_len}), l ->
                        CASE WHEN i + l - 1 <= length(mw)
                             THEN substr(mw, i, l) END), x -> x IS NOT NULL)))
                """
            )
        ).alias("sub"),
    )
    return (
        subs.groupBy("sub").agg(F.sum("cnt").alias("cnt"))
    )


def top_k_substrings(counts: DataFrame, k: int = 2000, max_len: int = 5) -> DataFrame:
    return (
        substring_counts(counts, max_len)
        .orderBy(F.desc("cnt"), F.asc("sub"))
        .limit(k)
    )


def _context_pairs(
    tokens: DataFrame, vocab_ids: DataFrame, v_oov: int | None = None
) -> DataFrame:
    """(doc, pos, wid) with OOV mapped to id V (the reference reserves an
    extra slot for unknown words — word_vects.cpp:84-113). Pass ``v_oov``
    (= vocabulary size) when known — the fallback count() launches an
    extra Spark job just to learn it."""
    t = tokens.join(F.broadcast(vocab_ids), "word", "left")
    if v_oov is None:
        v_oov = vocab_ids.count()
    return t.select(
        "doc", "pos", F.coalesce("wid", F.lit(v_oov)).alias("wid")
    )


def train_word_vectors(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 2000,
    cca_dim: int = 16,
    morph_dim: int = 8,
    n_substrings: int = 2000,
    reg: float = 1.0,
):
    """Full wordrep pipeline → WordVectors (vocab + vectors + morph OOV)."""
    from pyspark.sql.window import Window

    tokens = doc_tokens(docs, id_col, text_col).persist()
    counts = word_counts(tokens).persist()
    vocab = top_k_words(counts, vocab_size)
    vocab_rows = vocab.collect()
    words = [r["word"] for r in vocab_rows]
    wid = {w: i for i, w in enumerate(words)}
    V = len(words)
    spark = docs.sparkSession
    # Arrow local-data path (the pickle serializer has its own worker pool;
    # see operators/graph.py)
    import pandas as pd

    vocab_ids = spark.createDataFrame(
        pd.DataFrame({"word": words, "wid": range(V)}),
        "word string, wid long",
    )
    t = _context_pairs(tokens, vocab_ids, v_oov=V)

    # A4: positional co-occurrence counts via lead/lag windows
    w = Window.partitionBy("doc").orderBy("pos")
    ctx_cols = []
    for off in range(1, WINDOW + 1):
        ctx_cols.append(F.lag("wid", off).over(w).alias(f"l{off}"))
        ctx_cols.append(F.lead("wid", off).over(w).alias(f"r{off}"))
    ctx = t.select("wid", *ctx_cols).persist()

    # center-context pair counts (for A7 word vectors) — all 6 (side,
    # offset) marginals unpivot into one groupBy job instead of 6
    # sequential scan+collect jobs over the same persisted frame
    from collections import defaultdict

    slots = F.array(
        *[
            F.struct(
                F.lit(f"{side}{off}").alias("slot"),
                F.col(f"{side}{off}").alias("cid"),
            )
            for off in range(1, WINDOW + 1)
            for side in ("l", "r")
        ]
    )
    pair_counts: dict = defaultdict(list)
    for r in (
        ctx.select("wid", F.explode(slots).alias("s"))
        .filter(F.col("s.cid").isNotNull())
        .groupBy(
            "wid",
            F.col("s.slot").alias("slot"),
            F.col("s.cid").alias("cid"),
        )
        .agg(F.count("*").alias("n"))
        .collect()
    ):
        pair_counts[(r["slot"][0], int(r["slot"][1:]))].append(r)

    # left-right joint counts (for A6 CCA cross-covariance) — all 9
    # (lo, ro) blocks in one job likewise
    lr_structs = F.array(
        *[
            F.struct(
                F.lit(lo).alias("lo"),
                F.lit(ro).alias("ro"),
                F.col(f"l{lo}").alias("a"),
                F.col(f"r{ro}").alias("b"),
            )
            for lo in range(1, WINDOW + 1)
            for ro in range(1, WINDOW + 1)
        ]
    )
    lr_counts: dict = defaultdict(list)
    for r in (
        ctx.select(F.explode(lr_structs).alias("p"))
        .filter(F.col("p.a").isNotNull() & F.col("p.b").isNotNull())
        .groupBy(
            F.col("p.lo").alias("lo"),
            F.col("p.ro").alias("ro"),
            F.col("p.a").alias("a"),
            F.col("p.b").alias("b"),
        )
        .agg(F.count("*").alias("n"))
        .collect()
    ):
        lr_counts[(r["lo"], r["ro"])].append(r)
    ctx.unpersist()

    dL = WINDOW * (V + 1)
    # assemble covariance blocks on the driver (dims capped by vocab_size)
    Cll = np.eye(dL) * reg
    Crr = np.eye(dL) * reg
    Clr = np.zeros((dL, dL))

    def lidx(off, wid_):
        return (off - 1) * (V + 1) + wid_

    # diagonal (marginal) counts for whitening
    for (side, off), rows in pair_counts.items():
        tgt = Cll if side == "l" else Crr
        for r in rows:
            j = lidx(off, r["cid"])
            tgt[j, j] += r["n"]
    for (lo, ro), rows in lr_counts.items():
        for r in rows:
            Clr[lidx(lo, r["a"]), lidx(ro, r["b"])] += r["n"]

    # whitened SVD (CCA with diagonal whitening — cca_abstract.h:44-130)
    dl = 1.0 / np.sqrt(np.diag(Cll))
    dr = 1.0 / np.sqrt(np.diag(Crr))
    K = (dl[:, None] * Clr) * dr[None, :]
    U, s, Vt = np.linalg.svd(K, full_matrices=False)
    Ltrans = (dl[:, None] * U[:, :cca_dim]).astype(np.float32)
    Rtrans = (dr[:, None] * Vt[:cca_dim].T).astype(np.float32)

    # A7: word vector = projected mean context
    cnts = np.zeros(V + 1)
    for r in vocab_rows:
        cnts[wid[r["word"]]] = r["cnt"]
    left_mean = np.zeros((V + 1, cca_dim), dtype=np.float64)
    right_mean = np.zeros((V + 1, cca_dim), dtype=np.float64)
    for (side, off), rows in pair_counts.items():
        tgt = left_mean if side == "l" else right_mean
        proj = Ltrans if side == "l" else Rtrans
        for r in rows:
            tgt[r["wid"]] += r["n"] * proj[lidx(off, r["cid"])]
    denom = np.maximum(cnts, 1.0)[:, None]
    left_mean /= denom
    right_mean /= denom
    core = np.hstack([left_mean, right_mean]).astype(np.float32)  # (V+1, 2*cca)

    # morphology: top-k substrings → per-substring mean word vector
    subs = top_k_substrings(counts, k=n_substrings)
    sub_rows = subs.collect()
    sset = ApproximateSubstringSet()
    # add in ascending frequency so the most frequent win collisions
    # (add_substring keeps the last writer — h:56-88)
    for r in sorted(sub_rows, key=lambda r: (r["cnt"], r["sub"])):
        sset.add_substring(r["sub"])
    morph_acc = np.zeros((sset.max_substring_id() + 1, 2 * cca_dim))
    morph_n = np.zeros(sset.max_substring_id() + 1)
    for w_, i in wid.items():
        for h in set(sset.find_substrings(w_)):
            morph_acc[h] += core[i]
            morph_n[h] += 1
    morph_full = morph_acc / np.maximum(morph_n, 1.0)[:, None]
    # compress to morph_dim with an SVD projection (cca_morph analog)
    Um, sm, Vmt = np.linalg.svd(morph_full, full_matrices=False)
    morph_trans = (Um[:, :morph_dim] * sm[:morph_dim]).astype(np.float32)

    tokens.unpersist()
    counts.unpersist()
    return WordVectors(words, core[:V], sset, morph_trans, cca_dim)


class WordVectors:
    """total_word_feature_extractor equivalent (T9):
    dims = 1 (OOV flag) + 2*cca_dim + morph_dim.

    Doubles as a NER word-feature source (ner_model.NerModel ``fs``): the
    reference's NER consumes exactly these vectors as its emission features
    (total_word_feature_extractor.h:107-137), with digits folded to '#'
    before lookup (convert_numbers, :34-45)."""

    kind = "wordvec"

    def __init__(self, words, core, substring_set, morph_trans, cca_dim):
        self.words = list(words)
        self.wid = {w: i for i, w in enumerate(self.words)}
        self.core = core  # (V, 2*cca_dim)
        self.substring_set = substring_set
        self.morph_trans = morph_trans  # (8192, morph_dim)
        self.cca_dim = cca_dim
        self._tf_cache: dict[str, np.ndarray] = {}

    @property
    def dims(self) -> int:
        return 1 + self.core.shape[1] + self.morph_trans.shape[1]

    @property
    def fingerprint(self) -> int:
        """Content fingerprint chained through dependent models
        (reference: total_word_feature_extractor.h fingerprint member,
        verified by named_entity_extractor.h:223-245)."""
        import zlib

        h = zlib.crc32("wordvec-v1".encode())
        h = zlib.crc32("\x00".join(self.words).encode(), h)
        h = zlib.crc32(np.ascontiguousarray(self.core).tobytes(), h)
        h = zlib.crc32(
            np.ascontiguousarray(self.morph_trans).tobytes(), h
        )
        return h

    def token_features(self, word: str) -> np.ndarray:
        """Cached per-word lookup with the reference's digit fold applied
        (convert_numbers before the dictionary probe)."""
        v = self._tf_cache.get(word)
        if v is None:
            from mitie_spark.functions.tokenizer import fold_digits

            v = self.get_feature_vector(fold_digits(word))
            if len(self._tf_cache) < 500_000:
                self._tf_cache[word] = v
        return v

    def morph_vector(self, word: str) -> np.ndarray:
        # case-sensitive like the reference's word_morphology_feature_
        # extractor.get_feature_vector (no tolower anywhere in that path)
        hits = self.substring_set.find_substrings(word)
        out = np.zeros(self.morph_trans.shape[1], dtype=np.float32)
        for h in hits:
            out += self.morph_trans[h]
        return out

    def get_feature_vector(self, word: str) -> np.ndarray:
        """T9 lookup semantics (total_word_feature_extractor.h:107-137):
        hit → [0, core, morph]; miss → [1, zeros, morph]."""
        out = np.zeros(self.dims, dtype=np.float32)
        i = self.wid.get(word)
        if i is None:
            out[0] = 1.0
        else:
            out[1 : 1 + self.core.shape[1]] = self.core[i]
        out[1 + self.core.shape[1] :] = self.morph_vector(word)
        return out

    def to_twfe_dict(self) -> dict:
        """Render as a real ``mitie::total_word_feature_extractor`` object
        graph (the artifact tools/wordrep writes after the A1→A6 chain,
        main.cpp:142-149): per-word STORED vectors [flag=0, core, morph],
        OOV reconstructed from the morph tables at probe time. Write with
        sources.dlib_models.write_total_word_feature_extractor — the
        compiled reference and our DlibTotalWordFeatureExtractor both load
        the result (cross-engine tested) and reproduce token_features
        bit-for-bit."""
        from mitie_spark.functions import morphology as _morph

        V = len(self.words)
        vecs = np.zeros((V, self.dims), dtype=np.float32)
        for i, w in enumerate(self.words):
            vecs[i, 1 : 1 + self.core.shape[1]] = self.core[i]
            vecs[i, 1 + self.core.shape[1] :] = self.morph_vector(w)
        return {
            "fingerprint": self.fingerprint,
            "non_morph_feats": 1 + self.core.shape[1],
            "words": list(self.words),
            "vectors": vecs,
            "morph": {
                "substrings": {
                    "mask": _morph._MASK,
                    "mask_bits": _morph._MASK_BITS,
                    "init_hash": _morph._INIT_HASH,
                    "max_substr_len": self.substring_set.max_substr_len,
                    "hash_table": self.substring_set.hash_table,
                    "crc_table": _morph._CRC,
                },
                "morph_trans": self.morph_trans.astype(np.float32),
            },
        }

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            words=np.array(self.words),
            core=self.core,
            hash_table=self.substring_set.hash_table,
            max_substr_len=np.array([self.substring_set.max_substr_len]),
            morph_trans=self.morph_trans,
            cca_dim=np.array([self.cca_dim]),
        )

    @classmethod
    def load(cls, path: str) -> "WordVectors":
        z = np.load(path, allow_pickle=False)
        sset = ApproximateSubstringSet()
        sset.hash_table = z["hash_table"]
        sset.max_substr_len = int(z["max_substr_len"][0])
        return cls(
            [str(w) for w in z["words"]],
            z["core"],
            sset,
            z["morph_trans"],
            int(z["cca_dim"][0]),
        )
