"""Aggregation helpers for skewed keys.

Spark's hash aggregate already does map-side partial combine, which absorbs
most key skew in counts. For pathological hot keys (a single entity appearing
in a large fraction of 10^12 documents), `salted_count` makes the two-phase
structure explicit: a first aggregate over (key, salt) spreads the hot key
across `salt_buckets` reducers, a second tiny aggregate merges the partials
(north rule: "salted, AQE-tuned shuffles to absorb domain/language skew")."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count(df: DataFrame, keys: list[str], salt_buckets: int = 16) -> DataFrame:
    """Equivalent to df.groupBy(keys).count() but skew-resistant."""
    salted = df.withColumn(
        "_salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*keys, "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy(*keys).agg(F.sum("_c").alias("count"))
