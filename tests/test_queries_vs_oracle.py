"""Every queries() entry must match its DuckDB oracle at sf0.001 (the
driver runs the same comparison at sf0.01)."""

import sys

import pytest

sys.path.insert(0, "/root/repo")

# the driver gate runs at sf0.01 — test at the same scale
SF_DIR = "/root/testdata/sf0.01"


def _names():
    import __spark_entry__ as e

    return sorted(e.queries().keys())


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
