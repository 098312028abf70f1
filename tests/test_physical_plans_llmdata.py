"""Physical-plan audits for the LLM-data-pipeline queries (same contract
as test_physical_plans.py: the scale properties we designed for must be
the plans Catalyst actually picks)."""


import re

SF = "/root/testdata/sf0.001"


from tests.planutil import explain_formatted as _plan


def _n_nodes(plan: str, op: str) -> int:
    # formatted plans print each node twice (tree + detail section);
    # count the numbered detail headers
    return len(re.findall(rf"\(\d+\) {op}\b", plan))


def _q(spark, name):
    import __spark_entry__ as e

    return e.queries()[name](spark, SF)


def test_pii_scrub_is_narrow_scan_plus_tiny_agg(spark):
    plan = _plan(_q(spark, "pii_scrub_by_source"))
    # pure codegen: no Python at all in the path
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    # one aggregation with a map-side partial phase; the only exchange is
    # the 20-key source rollup
    assert _n_nodes(plan, "HashAggregate") >= 2
    # partial-agg shuffle + the final orderBy range exchange, nothing else
    assert _n_nodes(plan, "Exchange") <= 2


def test_domain_mixture_is_codegen_filterless_scan(spark):
    plan = _plan(_q(spark, "domain_mixture_sample"))
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    # md5 bucketing happens in-scan; only the source rollup shuffles
    assert _n_nodes(plan, "HashAggregate") >= 2
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "text" not in read_schema  # scan never reads the text bytes


def test_repetition_filters_copartition_by_doc(spark):
    plan = _plan(_q(spark, "doc_repetition_filters"))
    # no cartesian / nested-loop anywhere in the gram pipeline
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # all joins back to the doc spine are keyed (hash or sort-merge on
    # doc_id), never broadcast of the corpus-sized side to every task
    assert "doc_id" in plan


def test_sequence_packing_partitions_by_shard(spark):
    plan = _plan(_q(spark, "sequence_packing"))
    # the running-sum window must partition by shard (no single-partition
    # global Window, which is the classic prefix-sum scale killer)
    assert "CartesianProduct" not in plan
    window_lines = [l for l in plan.splitlines() if "Window" in l]
    assert window_lines, plan
    assert "SinglePartition" not in plan


def test_bpe_word_counts_single_corpus_shuffle(spark):
    from mitie_spark.operators.bpe import word_counts
    from mitie_spark.session import load_tables

    docs = load_tables(spark, SF, ["documents"])["documents"]
    plan = _plan(word_counts(docs))
    # partial + final aggregate around exactly one exchange: the ONLY
    # corpus-sized shuffle in BPE training
    assert _n_nodes(plan, "HashAggregate") >= 2
    assert _n_nodes(plan, "Exchange") == 1


def test_substring_spans_shuffles_hashes_not_text(spark):
    from mitie_spark.queries_simdedup import dedup_substring_spans

    plan = _plan(dedup_substring_spans(spark, SF))
    # never all-pairs: the pair join is a keyed join on the window hash
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # exactly one Arrow pass computes the fingerprints; everything after
    # shuffles only (id, pos, hash) rows — the raw text never reaches an
    # exchange
    assert _n_nodes(plan, "MapInPandas") == 1
    assert "BatchEvalPython" not in plan
    for line in plan.splitlines():
        if "Exchange" in line and "hashpartitioning" in line:
            assert "text" not in line


def test_embedding_topk_has_no_interpreted_folds(spark):
    """The gated cosine queries score via ONE Arrow-batched pandas UDF over
    integer-quantized vectors (engine-independent exact dots) — the
    interpreted F.aggregate/zip_with lambda folds are gone from the plan."""
    plan = _plan(_q(spark, "embedding_topk"))
    assert "aggregate(" not in plan and "lambdafunction" not in plan
    assert "ArrowEvalPython" in plan  # the vectorized scorer
    # the query side broadcasts: no shuffle on the N-row candidate scan
    assert "BroadcastExchange" in plan


def test_ivf_topk_has_no_interpreted_folds(spark):
    plan = _plan(_q(spark, "ivf_topk"))
    assert "aggregate(" not in plan and "lambdafunction" not in plan
    assert "BroadcastExchange" in plan
