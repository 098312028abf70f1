"""End-to-end Spark parity test: generated pages corpus → extract_kg →
mentions/triples vs planted truth, P/R ≥ 0.95 (BASELINE.json north_rule)."""

import os

import pytest

from mitie_spark.corpus import generate
from mitie_spark.models.train import ARTIFACT_DIR

NER = os.path.join(ARTIFACT_DIR, "ner_model.npz")
REL = os.path.join(ARTIFACT_DIR, "relation_model.npz")


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus"))
    counts = generate(d, n_pages=120, seed=42)
    assert counts["pages"] == 120
    return d


def _pr(truth: set, pred: set):
    tp = len(truth & pred)
    p = tp / len(pred) if pred else 1.0
    r = tp / len(truth) if truth else 1.0
    return p, r


def test_extract_kg_parity(spark, corpus_dir):
    from mitie_spark.operators.extraction import (
        extract_kg,
        mentions_table,
        triples_table,
    )

    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    kg = extract_kg(pages, NER, REL, lang_filter=None).cache()

    got_m = {
        (r.url, r.token_start, r.token_end, r.tag)
        for r in mentions_table(kg).collect()
    }
    true_m = {
        (r.url, r.token_start, r.token_end, r.tag)
        for r in spark.read.parquet(f"{corpus_dir}/mentions_true.parquet").collect()
    }
    p, r = _pr(true_m, got_m)
    assert p >= 0.95 and r >= 0.95, f"mention P={p:.4f} R={r:.4f}"

    got_t = {
        (row.url, row.subj, row.pred, row.obj)
        for row in triples_table(kg).collect()
    }
    true_t = {
        (row.url, row.subj, row.pred, row.obj)
        for row in spark.read.parquet(f"{corpus_dir}/triples_true.parquet").collect()
    }
    p, r = _pr(true_t, got_t)
    assert p >= 0.95 and r >= 0.95, f"triple P={p:.4f} R={r:.4f}"
    kg.unpersist()


def test_text_invariant_on_spark(spark, corpus_dir):
    """html→text recomputed distributively must equal the stored text
    byte-for-byte per url (input_hint invariant)."""
    from pyspark.sql import functions as F

    from mitie_spark.functions.html2text import register_udf

    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    udf = register_udf()
    bad = pages.select(
        "url", (udf(F.col("html")) == F.col("text")).alias("same")
    ).filter(~F.col("same"))
    assert bad.count() == 0
