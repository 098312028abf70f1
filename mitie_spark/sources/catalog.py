"""Iceberg-catalog-aware table materialization.

The north rule materializes pipeline stages into partitioned Iceberg graph
tables. In a real deployment an Iceberg catalog is configured at
spark-submit time::

    spark-submit \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> \
      --conf spark.sql.catalog.graph=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.graph.type=hive ...

When such a catalog exists, stage outputs go through ``df.writeTo``
(`partitionedBy` transforms, atomic `createOrReplace` snapshots — readers
never observe a half-written stage, and resume keys off table existence +
the lineage config hash exactly as with parquet). Without one (this
sandbox has no Iceberg runtime jar), outputs are partitioned parquet
directories with `_SUCCESS` markers — same layout, weaker atomicity.

The dispatch is pure and unit-tested; the Iceberg branch's plumbing is
exercised against a recording stub since the jar cannot be installed here.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def _catalog_from_items(items) -> str | None:
    """First catalog name whose implementation class mentions iceberg."""
    for k, v in items:
        m = re.fullmatch(r"spark\.sql\.catalog\.([A-Za-z0-9_]+)", k)
        if m and "iceberg" in str(v).lower():
            return m.group(1)
    return None


def iceberg_catalog(spark: SparkSession) -> str | None:
    """Name of a configured Iceberg catalog, or None (→ parquet fallback)."""
    try:
        items = spark.sparkContext.getConf().getAll()
    except Exception:  # pragma: no cover - defensive (connect-only sessions)
        items = []
    return _catalog_from_items(items)


def write_table(
    df: DataFrame,
    out_path: str,
    stage: str,
    partition_by: list[str] | None = None,
    catalog: str | None = None,
    namespace: str = "kg",
) -> tuple[str, str]:
    """Materialize a stage → (kind, location).

    kind='iceberg': location is the table identifier; kind='parquet':
    location is the directory path.
    """
    if catalog:
        ident = f"{catalog}.{namespace}.{stage}"
        w = df.writeTo(ident).using("iceberg")
        if partition_by:
            w = w.partitionedBy(*partition_by)
        w.createOrReplace()
        return ("iceberg", ident)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(out_path)
    return ("parquet", out_path)


def read_table(spark: SparkSession, kind: str, location: str) -> DataFrame:
    if kind == "iceberg":
        return spark.table(location)
    return spark.read.parquet(location)
