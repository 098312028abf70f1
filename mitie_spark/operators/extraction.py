"""Fused KG-extraction operator: pages → (mentions, triples) per document.

One narrow mapInPandas stage covers the whole per-document dataflow (EP2/EP3,
SURVEY.md §3): html→text (when text is absent) → CoNLL tokenize → NER
(Viterbi BILOU + chunk classify) → adjacent-pair candidates both orders →
relation scoring → accepted triples. Fusing matters at 100 TB: token arrays
and feature matrices never hit a shuffle — the only shuffles in the pipeline
are the *aggregations* downstream (triple counts, linking, dedup), which
operate on small projected rows.

Skew handling (SURVEY.md §4a): Arrow batches are capped by
spark.sql.execution.arrow.maxRecordsPerBatch, and a 100×-long document only
costs its own batch — no key-based shuffle happens here, so no salting is
needed until the aggregate stages.

Models are loaded once per python worker process from an .npz path (shipped
via spark-submit --files on a real cluster) and cached at module level —
equivalent to a broadcast of the weight matrices.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

MENTION_FIELDS = (
    "start:bigint,end:bigint,tag:string,score:double,surface:string"
)
TRIPLE_FIELDS = (
    "subj:string,pred:string,obj:string,score:double,"
    "subj_start:bigint,obj_start:bigint"
)
KG_SCHEMA = (
    "url:string,n_tokens:bigint,"
    f"mentions:array<struct<{MENTION_FIELDS}>>,"
    f"triples:array<struct<{TRIPLE_FIELDS}>>"
)


@lru_cache(maxsize=4)
def _load_models(ner_path: str, rel_path: str):
    from mitie_spark.models.ner_model import NerModel
    from mitie_spark.models.relation_model import RelationModel

    return NerModel.load(ner_path), RelationModel.load(rel_path)


def _finish_document(tokens, ents, rel, X=None):
    """Post-segmentation per-doc dataflow: mentions rows + adjacent-pair
    relation scoring → (n_tokens, mentions, triples).

    Candidate pairs: adjacent detected mentions, both orders, no window crop
    (relation_extraction_example.cpp:107-121)."""
    from mitie_spark.models.ner_model import sentence_matrix

    mentions = [
        {
            "start": s,
            "end": e,
            "tag": tag,
            "score": float(score),
            "surface": " ".join(tokens[s:e]),
        }
        for s, e, tag, score in ents
    ]
    triples = []
    if len(ents) >= 2:
        if X is None:
            X = sentence_matrix(tokens)
        mean_cache: dict = {}  # per-mention mean vectors, shared across pairs
        order = sorted(range(len(ents)), key=lambda i: ents[i][0])
        for j in range(len(order) - 1):
            for a, b in ((order[j], order[j + 1]), (order[j + 1], order[j])):
                sa, ea = ents[a][0], ents[a][1]
                sb, eb = ents[b][0], ents[b][1]
                for pred, score in rel.detect(
                    tokens, X, (sa, ea), (sb, eb), mean_cache
                ):
                    triples.append(
                        {
                            "subj": " ".join(tokens[sa:ea]),
                            "pred": pred,
                            "obj": " ".join(tokens[sb:eb]),
                            "score": float(score),
                            "subj_start": sa,
                            "obj_start": sb,
                        }
                    )
    return len(tokens), mentions, triples


def extract_document(text: str, ner, rel):
    """Pure-python per-doc extraction → (n_tokens, mentions, triples)."""
    from mitie_spark.functions.tokenizer import tokenize

    tokens = tokenize(text)
    ents = ner.extract_entities(tokens)
    return _finish_document(tokens, ents, rel)


def extract_documents_batch(texts, ner, rel):
    """Arrow-batch extraction: segmentation (emissions matmul + Viterbi)
    runs batched across the documents (NerModel.segment_batch — the python
    per-step DP overhead amortizes over the batch), then each doc finishes
    through the same chunk-classify + relation path as extract_document.
    Value-identical to per-doc extraction (equivalence unit-tested)."""
    from mitie_spark.functions.tokenizer import tokenize
    from mitie_spark.models.ner_model import sentence_matrix

    tok_lists = [tokenize(t or "") for t in texts]
    Xs = [sentence_matrix(toks) for toks in tok_lists]
    chunk_lists = ner.segment_batch(Xs)
    return [
        _finish_document(
            toks, ner.classify_chunks(toks, X, chunks), rel, X=X
        )
        for toks, X, chunks in zip(tok_lists, Xs, chunk_lists)
    ]


def extract_kg(
    pages: DataFrame,
    ner_path: str,
    rel_path: str,
    text_col: str = "text",
    lang_filter: str | None = "en",
    parallelism: int | None = None,
) -> DataFrame:
    """pages(url, text[, lang]) → (url, n_tokens, mentions[], triples[]).

    ``parallelism``: optional round-robin repartition of the (url, text)
    projection before the CPU-bound UDF. Extraction costs ~2-5 ms/doc of CPU
    while compressed web text scans at >100 MB/s, so byte-based input splits
    chronically under-partition this stage; size tasks by compute (≈3-4× the
    executor core count) instead. The shuffle moves only the projected two
    columns."""
    if lang_filter is not None and "lang" in pages.columns:
        pages = pages.filter(pages["lang"] == lang_filter)
    slim = pages.select("url", text_col)
    if parallelism:
        slim = slim.repartition(parallelism)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ner, rel = _load_models(ner_path, rel_path)
        for pdf in batches:
            out = {"url": [], "n_tokens": [], "mentions": [], "triples": []}
            results = extract_documents_batch(list(pdf[text_col]), ner, rel)
            for url, (n, ments, trips) in zip(pdf["url"], results):
                out["url"].append(url)
                out["n_tokens"].append(n)
                out["mentions"].append(ments)
                out["triples"].append(trips)
            yield pd.DataFrame(out)

    return slim.mapInPandas(run, schema=KG_SCHEMA)


def mentions_table(kg: DataFrame) -> DataFrame:
    """Explode to one row per mention (the reference's detections sink,
    tools/ner_stream/src/main.cpp:71-86 → parquet)."""
    from pyspark.sql import functions as F

    m = kg.select("url", F.explode("mentions").alias("m"))
    return m.select(
        "url",
        F.col("m.start").alias("token_start"),
        F.col("m.end").alias("token_end"),
        F.col("m.tag").alias("tag"),
        F.col("m.score").alias("score"),
        F.col("m.surface").alias("surface"),
    )


def triples_table(kg: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    t = kg.select("url", F.explode("triples").alias("t"))
    return t.select(
        "url",
        F.col("t.subj").alias("subj"),
        F.col("t.pred").alias("pred"),
        F.col("t.obj").alias("obj"),
        F.col("t.score").alias("score"),
    )
