"""Entity linking + canonicalization.

North-rule stages: "batched mention detection + entity-link scoring against a
broadcast alias dictionary with MinHash-LSH blocking, connected-components
canonicalization" — reference precedent for the LSH-blocking shape is the
wordrep k-NN/cluster side-tool (/root/reference/tools/wordrep/src/main.cpp:
197-256); the alias lookup itself has the same semantics as the reference's
token → word-vector dictionary probe (J1, total_word_feature_extractor.h:
117-124): a broadcast hash join with a fallback path for misses.

Pipeline:
1. exact match: mentions ⟕ broadcast(alias_dict) on (surface, tag);
2. fuzzy match for misses: MinHash-LSH blocking over character shingles of
   the surface vs the alias dictionary, verified by estimated Jaccard and
   resolved to the best-scoring alias;
3. canonicalization: same-as edges (mention-surface ↔ canonical_id from both
   exact and fuzzy matches, plus alias-alias edges within the dictionary) →
   connected components → stable canonical component ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mitie_spark.operators.dedup import (
    estimated_jaccard,
    lsh_candidate_pairs,
    minhash_signatures,
)
from mitie_spark.operators.graph import connected_components


def dedupe_alias_dict(alias_dict: DataFrame) -> DataFrame:
    """One deterministic row per (alias, tag) — min canonical_id wins.

    Real alias dictionaries carry ambiguous keys (the corpus's bare org
    name 'Acme' maps to every 'Acme <suffix>' canonical); joining mentions
    against the raw dict would fan each such mention out into one row per
    candidate entity. Linking must stay 1:1 per mention, so ambiguity is
    resolved deterministically here — and represented faithfully where it
    belongs: ``canonical_components`` builds its same-as graph from the
    FULL dictionary, so all canonicals sharing an alias still land in one
    component."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("alias", "tag").orderBy("canonical_id")
    return (
        alias_dict.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )


def link_exact(mentions: DataFrame, alias_dict: DataFrame) -> DataFrame:
    """mentions(url, surface, tag, ...) ⟕ broadcast alias dict →
    + (canonical_id, canonical_name, match_kind). The dict is deduped per
    (alias, tag) first so one mention links to at most one entity."""
    al = F.broadcast(
        dedupe_alias_dict(alias_dict).select(
            F.col("alias").alias("surface"),
            F.col("tag").alias("tag"),
            "canonical_id",
            "canonical_name",
        )
    )
    joined = mentions.join(al, ["surface", "tag"], "left")
    return joined.withColumn(
        "match_kind",
        F.when(F.col("canonical_id").isNotNull(), F.lit("exact")).otherwise(
            F.lit(None).cast("string")
        ),
    )


def link_fuzzy(
    unmatched: DataFrame,
    alias_dict: DataFrame,
    num_hashes: int = 64,
    bands: int = 32,
    threshold: float = 0.5,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Fuzzy alias resolution via MinHash-LSH blocking on surface strings.

    unmatched(surface) × alias_dict(alias) → best (surface, canonical_id,
    canonical_name, est_jaccard) per surface. Both sides are hashed into the
    same signature space; candidate generation never cross-joins.
    ``max_bucket`` caps degenerate LSH buckets far above the dedup default
    (500): for alias linking a dropped bucket is plain recall loss, not a
    near-certain-duplicate shortcut."""
    surf = unmatched.select("surface").distinct()
    s_sig = minhash_signatures(
        surf, id_col="surface", text_col="surface", num_hashes=num_hashes
    ).withColumn("side", F.lit("m"))
    a_sig = minhash_signatures(
        alias_dict, id_col="alias", text_col="alias", num_hashes=num_hashes
    ).withColumn("side", F.lit("a"))
    # prefix ids to keep the two sides distinct inside one LSH pass
    tagged = s_sig.select(
        F.concat(F.lit("m:"), "id").alias("id"), "sig"
    ).union(a_sig.select(F.concat(F.lit("a:"), "id").alias("id"), "sig"))
    pairs = lsh_candidate_pairs(tagged, bands=bands, max_bucket=max_bucket)
    scored = estimated_jaccard(pairs, tagged)
    cross = scored.filter(
        F.substring("id_a", 1, 2) != F.substring("id_b", 1, 2)
    ).filter(F.col("est_jaccard") >= threshold)
    norm = cross.select(
        F.when(F.col("id_a").startswith("m:"), F.col("id_a")).otherwise(
            F.col("id_b")
        ).substr(F.lit(3), F.lit(10_000)).alias("surface"),
        F.when(F.col("id_a").startswith("a:"), F.col("id_a")).otherwise(
            F.col("id_b")
        ).substr(F.lit(3), F.lit(10_000)).alias("alias"),
        "est_jaccard",
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("surface").orderBy(
        F.desc("est_jaccard"), F.asc("alias")
    )
    best = (
        norm.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    # resolve the winning alias string to ONE entity deterministically —
    # joining the raw dict would fan ambiguous aliases back out and break
    # the one-best-match-per-surface invariant row_number just established
    al = (
        dedupe_alias_dict(alias_dict)
        .groupBy("alias")
        .agg(
            F.min("canonical_id").alias("canonical_id"),
            F.min_by("canonical_name", "canonical_id").alias("canonical_name"),
        )
    )
    return best.join(F.broadcast(al), "alias").select(
        "surface", "canonical_id", "canonical_name",
        F.col("est_jaccard").alias("link_score"),
    )


def link_mentions(
    mentions: DataFrame, alias_dict: DataFrame, fuzzy: bool = True
) -> DataFrame:
    """Exact + (optionally) fuzzy linking; returns mentions + canonical ids."""
    exact = link_exact(mentions, alias_dict)
    if not fuzzy:
        return exact
    # persisted: the miss probe, the exact-matched branch, and the misses
    # reuse would otherwise each re-execute the join's full upstream
    exact = exact.persist()
    misses = exact.filter(F.col("canonical_id").isNull()).drop(
        "canonical_id", "canonical_name", "match_kind"
    )
    if misses.isEmpty():
        return exact
    fz = link_fuzzy(misses, alias_dict)
    fixed = (
        misses.join(fz, "surface", "left")
        .withColumn(
            "match_kind",
            F.when(F.col("canonical_id").isNotNull(), F.lit("fuzzy")),
        )
        .drop("link_score")
    )
    return exact.filter(F.col("canonical_id").isNotNull()).unionByName(fixed)


def canonical_components(alias_dict: DataFrame) -> DataFrame:
    """Connected components over the alias graph: aliases sharing a
    canonical_id collapse into one component. → (canonical_id, component).

    The component label is the min VERTEX string of the component — with
    the 'a:'/'c:' vertex prefixes that is almost always an 'a:'-prefixed
    alias label, NOT a canonical_id: treat it as an opaque group key
    (stable and deterministic), never join it back against the alias
    dict's canonical_id column."""
    edges = alias_dict.select(
        F.concat(F.lit("a:"), "alias").alias("src"),
        F.concat(F.lit("c:"), "canonical_id").alias("dst"),
    )
    cc = connected_components(edges)
    return (
        cc.filter(F.col("id").startswith("c:"))
        .select(
            F.expr("substring(id, 3)").alias("canonical_id"),
            F.col("comp").alias("component"),
        )
    )
