"""wordrep-family aggregation queries (SURVEY.md §2.4 A1/A3/A4) —
oracle-backed registry entries for the count-min sketch, top-k substring,
and context-window operators.

Reference analogs:
- A1 count-min sketch word counts: count_min_sketch.h:141-185 (8 murmur
  rows, min-over-rows estimate) — here the sketch is a distributed linear
  aggregator and the oracle is the exact GROUP BY it approximates; CMS
  never undercounts, so value-hash equality against exact counts is the
  no-collision certificate at gate scale.
- A3 top-k substrings: basic_morph.cpp:47-124 — substrings (≤5 chars,
  '*' = word boundary) of corpus tokens, counted and ranked.
- A4 context-window vectors: word_vects.cpp:36-62 — positional
  (center, offset, context) co-occurrence, the input to the CCA stage;
  here ranked pair counts via lag/lead windows.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mitie_spark.queries import query
from mitie_spark.session import load_tables

# ---------------------------------------------------------------------------
# A1 — count-min sketch vs exact counts
# ---------------------------------------------------------------------------

_CMS_TOP = 50


@query(
    "cms_token_counts",
    f"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
      FROM documents
    )
    SELECT token, COUNT(*) AS cms_count
    FROM toks GROUP BY token
    ORDER BY cms_count DESC, token LIMIT {_CMS_TOP}
    """,
)
def cms_token_counts(spark, sf_dir):
    """Count-min sketch end-to-end: per-partition NumPy sketches, exact
    linear treeReduce merge, driver-side point queries for the top tokens.
    The oracle is the exact aggregate — CMS estimates can only be ≥ exact,
    so equality certifies zero collisions at this width (8 rows × 100k).
    At 10^12 tokens the sketch is the tool Spark's exact agg isn't: the
    driver holds a fixed 6.4 MB array no matter the corpus size."""
    from mitie_spark.operators.sketch import sketch_token_counts

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    top = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "token")
        .limit(_CMS_TOP)
        .collect()
    )
    cms = sketch_token_counts(docs, text_col="text", hash_table_size=100_000)
    import pandas as pd

    rows = [(r["token"], cms.get_count(r["token"])) for r in top]
    # Arrow-path local-result handoff (the pickle serializer has its own
    # worker pool; see operators/graph.py)
    out = spark.createDataFrame(
        pd.DataFrame(rows, columns=["token", "cms_count"]),
        "token string, cms_count bigint",
    )
    return out.orderBy(F.desc("cms_count"), "token")


# ---------------------------------------------------------------------------
# A3 — top-k substrings with boundary markers
# ---------------------------------------------------------------------------

_SUB_TOP = 100


@query(
    "top_substrings",
    f"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS w
      FROM documents
    ), marked AS (
      SELECT '*' || w || '*' AS m FROM toks
    ), subs AS (
      SELECT unnest(flatten(
        [[substr(m, i, l) FOR i IN range(1, len(m) - l + 2)]
         FOR l IN range(2, 6)]
      )) AS sub
      FROM marked
    )
    SELECT sub, COUNT(*) AS cnt
    FROM subs GROUP BY sub
    ORDER BY cnt DESC, sub LIMIT {_SUB_TOP}
    """,
)
def top_substrings(spark, sf_dir):
    """A3: explode all 2..5-char substrings of '*'-delimited tokens and
    rank — the Spark replacement for the reference's CMS+heap two-pass
    (explode → partial-agg shuffle → TopK sort, all JVM-side)."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    # compute-sized tasks for the ~30× substring explode (single-row-group
    # test parquet would otherwise run the whole map side on one core)
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    toks = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).filter(F.col("w") != "")
    m = F.concat(F.lit("*"), F.col("w"), F.lit("*"))
    subs = toks.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(2), F.lit(5)),
                    # guard: Spark sequence(1, n) DESCENDS for n < 1 (unlike
                    # SQL range, which is empty) — emit no substrings when
                    # the marked token is shorter than l
                    lambda l: F.when(
                        F.length(m) >= l,
                        F.transform(
                            F.sequence(F.lit(1), F.length(m) - l + 1),
                            lambda i: F.substr(m, i, l),
                        ),
                    ).otherwise(F.array().cast("array<string>")),
                )
            )
        ).alias("sub")
    )
    return (
        subs.groupBy("sub")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "sub")
        .limit(_SUB_TOP)
    )


# ---------------------------------------------------------------------------
# A4 — positional context-window co-occurrence
# ---------------------------------------------------------------------------

_CTX_TOP = 100


@query(
    "context_window_pairs",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(l) AS token,
             generate_subscripts(l, 1) AS pos
      FROM (SELECT doc_id,
                   list_filter(string_split(lower(text), ' '), t -> t <> '') AS l
            FROM documents)
    ), pairs AS (
      SELECT token AS center, -2 AS off,
             LAG(token, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS ctx FROM toks
      UNION ALL
      SELECT token, -1,
             LAG(token, 1) OVER (PARTITION BY doc_id ORDER BY pos) FROM toks
      UNION ALL
      SELECT token, 1,
             LEAD(token, 1) OVER (PARTITION BY doc_id ORDER BY pos) FROM toks
      UNION ALL
      SELECT token, 2,
             LEAD(token, 2) OVER (PARTITION BY doc_id ORDER BY pos) FROM toks
    )
    SELECT center, off, ctx, COUNT(*) AS cnt
    FROM pairs WHERE ctx IS NOT NULL
    GROUP BY center, off, ctx
    ORDER BY cnt DESC, center, off, ctx LIMIT {_CTX_TOP}
    """,
)
def context_window_pairs(spark, sf_dir):
    """A4: (center, offset, context) counts via lag/lead windows — the
    relational form of wordrep's sliding context window; at scale this is
    the shuffle that feeds the CCA covariance blocks (word_vectors.py)."""
    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
        ).alias("pos", "token"),
    )
    # one window pass computes all four shifts (a union of four windowed
    # selects would shuffle+sort the token table four times); the unpivot
    # into (off, ctx) rows is a narrow explode after the single sort
    w = Window.partitionBy("doc_id").orderBy("pos")
    shifted = toks.select(
        "token",
        F.lag("token", 2).over(w).alias("m2"),
        F.lag("token", 1).over(w).alias("m1"),
        F.lead("token", 1).over(w).alias("p1"),
        F.lead("token", 2).over(w).alias("p2"),
    )
    pairs = shifted.select(
        F.col("token").alias("center"),
        F.explode(
            F.array(
                F.struct(F.lit(-2).alias("off"), F.col("m2").alias("ctx")),
                F.struct(F.lit(-1).alias("off"), F.col("m1").alias("ctx")),
                F.struct(F.lit(1).alias("off"), F.col("p1").alias("ctx")),
                F.struct(F.lit(2).alias("off"), F.col("p2").alias("ctx")),
            )
        ).alias("p"),
    ).select("center", F.col("p.off").alias("off"), F.col("p.ctx").alias("ctx"))
    return (
        pairs.filter(F.col("ctx").isNotNull())
        .groupBy("center", "off", "ctx")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "center", "off", "ctx")
        .limit(_CTX_TOP)
    )


# ---------------------------------------------------------------------------
# Skew-resistant aggregation (north rule: salted shuffles for hot keys)
# ---------------------------------------------------------------------------


@query(
    "salted_source_counts",
    """
    SELECT source, COUNT(*) AS n_docs
    FROM documents GROUP BY source ORDER BY source
    """,
)
def salted_source_counts(spark, sf_dir):
    """Two-phase salted aggregation over the (skewed) source column —
    equivalent to a plain groupBy().count() but with the hot key spread
    across salt buckets first (operators/agg.salted_count; the explicit
    form of the map-side combine Spark's hash aggregate does implicitly)."""
    from mitie_spark.operators.agg import salted_count

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    out = salted_count(docs, ["source"], salt_buckets=16)
    return out.select(
        "source", F.col("count").alias("n_docs")
    ).orderBy("source")


# ---------------------------------------------------------------------------
# Event-time tumbling windows (streaming/windowed.py code path, batch mode)
# ---------------------------------------------------------------------------


@query(
    "windowed_event_counts",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type, COUNT(*) AS n
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY window_start, event_type
    """,
)
def windowed_event_counts(spark, sf_dir):
    """Tumbling event-time window counts — the EXACT code path the
    Structured Streaming job runs (streaming/windowed.windowed_counts works
    on batch and streaming frames alike; the watermark is a no-op in
    batch). Oracle: SQL time_bucket."""
    from mitie_spark.streaming.windowed import windowed_counts

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    out = windowed_counts(
        ev, ts_col="ts", key_col="event_type", window_len="1 hour",
        watermark="30 minutes",
    )
    return out.orderBy("window_start", "event_type")


@query(
    "events_cube",
    """
    SELECT event_type, CAST(date_part('dow', ts) AS INT) AS dow, COUNT(*) AS n
    FROM events
    GROUP BY CUBE (event_type, dow)
    ORDER BY event_type NULLS FIRST, dow NULLS FIRST
    """,
)
def events_cube(spark, sf_dir):
    """CUBE grouping-sets coverage (SURVEY.md §2.5 absent-from-reference
    list): event counts by (type × day-of-week) with all subtotal planes.
    Spark dayofweek is 1=Sunday..7, SQL dow is 0=Sunday..6 — shifted to
    match."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return (
        ev.select("event_type", (F.dayofweek("ts") - 1).alias("dow"))
        .cube("event_type", "dow")
        .agg(F.count("*").alias("n"))
        .orderBy(
            F.asc_nulls_first("event_type"), F.asc_nulls_first("dow")
        )
    )


# ---------------------------------------------------------------------------
# HLL distinct-count sketch — vocabulary cardinality per source + overall.
# Rows-only for the driver (the 50 gated slots are full); full value-hash
# gate in queries_webkg.LOCAL_ORACLES (integer-exact by construction —
# see operators/sketch.hll_distinct).
# ---------------------------------------------------------------------------


@query("hll_distinct_tokens")
def hll_distinct_tokens(spark, sf_dir):
    """Distinct-token cardinality per source (plus an '__all__' rollup
    row): exact COUNT(DISTINCT) beside the HyperLogLog register estimate.
    The exact column is the gate/accuracy reference — at 100 TB you keep
    only the sketch (bounded 256-row register state per group, map-side
    MAX merge, no distinct shuffle of the values).

    Both branches (exact + sketch) read the SAME persisted token
    projection (queries_pipeline.doc_tokens, shared with bm25/unigram-LM)
    — no pre-distinct frame: the register MAX is duplicate-insensitive,
    so the sketch consumes the raw token stream (exactly what it would
    do at scale) and only the gate column pays a distinct aggregate."""
    from mitie_spark.operators.sketch import hll_distinct
    from mitie_spark.queries_pipeline import doc_tokens

    toks = doc_tokens(spark, sf_dir).select("source", "token")
    grp = toks.unionAll(
        toks.select(F.lit("__all__").alias("source"), "token")
    )
    ex = grp.groupBy("source").agg(
        F.countDistinct("token").alias("n_exact")
    )
    est = hll_distinct(grp, ["source"], "token")
    return ex.join(est, "source").select(
        "source", "n_exact", "n_zero_buckets", "hll_raw", "hll_est"
    )


# ---------------------------------------------------------------------------
# PIVOT — wide per-day event-type counts (the relational reshape the cube
# family was missing). Rows-only slot; full value-hash gate in
# queries_webkg.LOCAL_ORACLES via the conditional-aggregation mirror.
# ---------------------------------------------------------------------------

_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


@query("events_pivot_daily")
def events_pivot_daily(spark, sf_dir):
    """PIVOT event counts to one column per type per day. The value list
    is EXPLICIT (no extra distinct pass over the data to discover it —
    at 100 TB pivot with an inferred value list is two jobs), so the
    plan is a single partial-agg shuffle; missing cells are 0, stated
    identically in the SQL mirror's SUM(CASE...) form."""
    from mitie_spark.session import load_tables

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    out = (
        ev.select(F.to_date("ts").alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", list(_PIVOT_TYPES))
        .count()
        .na.fill(0)
    )
    return out.select(
        F.col("day").cast("string").alias("day"),
        *[F.col(t).cast("bigint").alias(f"n_{t}") for t in _PIVOT_TYPES],
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) bottom-k signatures — set similarity BETWEEN
# groups. Rows-only slot; full value-hash gate in
# queries_webkg.LOCAL_ORACLES.
# ---------------------------------------------------------------------------

_KMV_K = 64


@query("source_vocab_jaccard_kmv")
def source_vocab_jaccard_kmv(spark, sf_dir):
    """Pairwise vocabulary Jaccard between sources from bottom-k
    signatures (operators/sketch.kmv_jaccard, k=64): each source keeps
    only its k smallest md5 hash values — a fixed-size, mergeable set
    sketch; THE point at 100 TB is group similarity from k rows per
    group, never the sets themselves. jaccard_ppm = floor(1e6 *
    |shared| / (|sig_a| + |sig_b| - |shared|)), deterministic integers
    end to end; exact whenever a group's vocabulary fits inside k. The
    truncation path (vocab > k) is unit-tested against a scalar
    reference in tests/test_kg_analytics.py — the gate corpora's tiny
    vocabularies never exercise it."""
    from mitie_spark.operators.sketch import kmv_jaccard
    from mitie_spark.queries_pipeline import doc_tokens

    toks = doc_tokens(spark, sf_dir).select("source", "token")
    return kmv_jaccard(toks, "source", "token", k=_KMV_K).select(
        F.col("group_a").alias("source_a"),
        F.col("group_b").alias("source_b"),
        "n_shared",
        "jaccard_ppm",
    )
