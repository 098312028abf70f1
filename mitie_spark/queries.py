"""Query registry — every implemented operator exposed as (spark_fn, oracle_sql).

Each entry pairs a PySpark DataFrame program with an equivalent ANSI-SQL
string runnable by DuckDB over the same parquet tables (views: region nation
customer supplier part orders lineitem events documents embeddings). The
driver's correctness gate runs both at sf0.01 and compares row-count, schema,
and an order-insensitive value hash — so every computed column is aliased
identically on both sides, every top-k has a deterministic tie-break, and
floating aggregates are rounded.

Ops are registered here by the modules that implement them plus directly for
simple relational forms. SURVEY.md §2 operator ids are cited per query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mitie_spark.session import load_tables

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _docs(spark, sf_dir):
    return load_tables(spark, sf_dir, ["documents"])["documents"]


# ---------------------------------------------------------------------------
# A2 — top-k words (reference: wordrep two-pass CMS+heap,
# tools/wordrep/src/main.cpp:29-77; Spark replaces the sketch with an exact
# shuffle-aggregate + TopK sort, SURVEY.md §2.4 A1/A2).
# ---------------------------------------------------------------------------
@query(
    "top_words",
    """
    SELECT token, COUNT(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token
    ORDER BY cnt DESC, token
    LIMIT 100
    """,
)
def top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# T-family — per-doc scalar text stats (projection stays JVM-side: split/size/
# length, no Python; SURVEY.md §2.2).
# ---------------------------------------------------------------------------
@query(
    "doc_token_stats",
    """
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens,
           length(text) AS n_chars_calc,
           lang
    FROM documents
    """,
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias("n_tokens"),
        F.length("text").alias("n_chars_calc"),
        "lang",
    )


# ---------------------------------------------------------------------------
# Dedup (exact): hash-groupBy on content (training-data pipeline op).
# Gated through the union query ``dedup_exact_and_spans`` (queries_simdedup)
# — the driver records CORRECTNESS rows only for the first 50 registry
# entries, so same-family queries share one gated slot.
# ---------------------------------------------------------------------------
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return (
        docs.groupBy(F.md5(F.col("text").cast("binary")).alias("content_hash"))
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_docs") > 1)
        .orderBy("content_hash")
    )


@query(
    "lang_counts",
    """
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def lang_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return (
        docs.groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Classic relational coverage on the TPC-H-ish tables (Catalyst exercises:
# hash agg with partial combine, broadcast join, sort+limit).
# ---------------------------------------------------------------------------
@query(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "events_by_type_day",
    """
    SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
           COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY event_type, day
    ORDER BY event_type, day
    """,
)
def events_by_type_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return (
        ev.groupBy(
            "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("event_type", "day")
    )


# populate the registry with the KG / dedup / similarity / analysis queries
from mitie_spark import queries_kg as _queries_kg  # noqa: E402,F401
from mitie_spark import queries_simdedup as _queries_simdedup  # noqa: E402,F401
from mitie_spark import queries_wordrep as _queries_wordrep  # noqa: E402,F401
from mitie_spark import queries_pipeline as _queries_pipeline  # noqa: E402,F401
from mitie_spark import queries_llmdata as _queries_llmdata  # noqa: E402,F401
from mitie_spark import queries_webkg as _queries_webkg  # noqa: E402,F401


# ---------------------------------------------------------------------------
# Relational coverage absent from the reference (SURVEY.md §2.5: "therefore
# Catalyst built-ins when we need them"): multi-join, rollup, anti join,
# windowed sessionization.
# ---------------------------------------------------------------------------


@query(
    "shipping_priority",
    """
    SELECT o.o_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(o.o_orderdate AS DATE) AS order_date
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'O'
    GROUP BY o.o_orderkey, order_date
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 20
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders", "lineitem"])
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("o_orderstatus") == "O")
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("order_date"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("o_orderkey", "revenue", "order_date")
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(20)
    )


@query(
    "orders_rollup",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy(
            F.asc_nulls_first("o_orderstatus"),
            F.asc_nulls_first("o_orderpriority"),
        )
    )


# NOT EXISTS, not NOT IN: a NULL o_custkey would turn NOT IN into an
# empty result (three-valued logic) while the Spark anti join is
# null-tolerant — the two would silently disagree.  Gated through the
# union query ``customer_membership_shapes`` (queries_simdedup) to fit
# the driver's 50-row correctness cap.
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer", "orders"])
    return (
        t["customer"]
        .join(
            t["orders"],
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "user_sessions",
    """
    WITH seq AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE OR
                  LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM seq GROUP BY user_id ORDER BY user_id
    """,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-minute inactivity gap via a lag window."""
    from pyspark.sql.window import Window

    ev = load_tables(spark, sf_dir, ["events"])["events"]
    w = Window.partitionBy("user_id").orderBy("ts")
    seq = ev.select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.col("ts") - F.lag("ts").over(w)
                > F.expr("INTERVAL 30 MINUTES")
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    return (
        seq.groupBy("user_id")
        .agg(
            F.sum("new_session").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )
