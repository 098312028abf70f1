"""Crawl-snapshot change detection (CDX-style recrawl diff).

A continuously-recrawled corpus asks, per URL across two snapshots:
did the content change, is the URL new, did it disappear?  Common-Crawl
index (CDX) consumers answer it with per-URL content digests; the same
diff is what drives incremental KG refresh (re-extract only changed
pages) and crawl politeness budgets (skip unchanged hosts).  The
reference engine (mit-nlp/MITIE) is corpus-at-rest only; this operator
belongs to the web-pipeline surface the build adds on top.

Scale shape: the diff is ONE full-outer hash join keyed on url — both
sides shuffle once, co-partitioned by the join key.  Content equality
travels as a fixed-width digest column (md5 hex), never the page body,
so at 100 TB the exchange carries (url, 32-byte digest) pairs only; the
digests themselves are computed in the upstream narrow scan.  Nothing
collects, nothing broadcasts (both sides are corpus-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_diff"]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "url",
    digest: str = "content_md5",
) -> DataFrame:
    """(old, new) snapshots → (key, status, old_digest, new_digest).

    ``status`` ∈ {'added', 'deleted', 'changed', 'unchanged'}: added =
    key only in ``new``, deleted = only in ``old``, changed/unchanged by
    digest equality.  Inputs must be key-unique (one row per URL per
    snapshot — crawl indexes are); duplicate keys would fan out the
    join.  Digest column semantics (md5 of the body, of the extracted
    text, simhash hex, ...) are the caller's choice — any equality-
    comparable fixed-width column works.
    """
    # presence is tracked with explicit flags, NOT digest nullness: a row
    # that exists with a NULL digest (md5 of a NULL body) must classify
    # by presence — digest-null tests would misreport it added/deleted,
    # and would diverge from the url-nullness SQL mirror in the gate
    o = old.select(
        F.col(key), F.col(digest).alias("old_digest"), F.lit(True).alias("_in_old")
    )
    n = new.select(
        F.col(key), F.col(digest).alias("new_digest"), F.lit(True).alias("_in_new")
    )
    j = o.join(n, key, "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("deleted"))
        # plain (non-null-safe) equality on purpose: present-in-both with
        # NULL digests reads 'changed', matching SQL CASE semantics
        .when(F.col("old_digest") == F.col("new_digest"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(key, status.alias("status"), "old_digest", "new_digest")
