"""Iceberg-catalog seam tests. The sandbox has no Iceberg runtime jar, so
the Iceberg branch is exercised against a recording stub (same plumbing a
real catalog session would drive); the parquet fallback and the dispatch
logic run for real."""

import os

import pandas as pd

from mitie_spark.sources.catalog import (
    _catalog_from_items,
    iceberg_catalog,
    read_table,
    write_table,
)


def test_catalog_detection_from_conf_items():
    assert _catalog_from_items([]) is None
    assert (
        _catalog_from_items(
            [("spark.master", "local[4]"), ("spark.app.name", "x")]
        )
        is None
    )
    items = [
        ("spark.sql.catalog.graph", "org.apache.iceberg.spark.SparkCatalog"),
        ("spark.sql.catalog.graph.type", "hive"),
    ]
    assert _catalog_from_items(items) == "graph"
    # a non-iceberg custom catalog must not trigger the iceberg path
    assert (
        _catalog_from_items([("spark.sql.catalog.x", "com.example.Other")])
        is None
    )


def test_no_catalog_in_sandbox_session(spark):
    assert iceberg_catalog(spark) is None


def test_parquet_fallback_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        pd.DataFrame({"pred": ["a", "a", "b"], "n": [1, 2, 3]})
    )
    out = str(tmp_path / "stage1")
    kind, loc = write_table(df, out, "stage1", partition_by=["pred"])
    assert (kind, loc) == ("parquet", out)
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    # hive-style partition dirs
    assert os.path.exists(os.path.join(out, "pred=a"))
    back = read_table(spark, kind, loc)
    assert back.count() == 3 and set(back.columns) == {"pred", "n"}


class _StubWriter:
    def __init__(self, calls):
        self.calls = calls

    def using(self, fmt):
        self.calls.append(("using", fmt))
        return self

    def partitionedBy(self, *cols):
        self.calls.append(("partitionedBy", cols))
        return self

    def createOrReplace(self):
        self.calls.append(("createOrReplace",))


class _StubDF:
    def __init__(self):
        self.calls = []

    def writeTo(self, ident):
        self.calls.append(("writeTo", ident))
        return _StubWriter(self.calls)


def test_iceberg_branch_plumbing():
    df = _StubDF()
    kind, loc = write_table(
        df, "/ignored", "triples", partition_by=["pred"], catalog="graph"
    )
    assert (kind, loc) == ("iceberg", "graph.kg.triples")
    assert df.calls == [
        ("writeTo", "graph.kg.triples"),
        ("using", "iceberg"),
        ("partitionedBy", ("pred",)),
        ("createOrReplace",),
    ]
