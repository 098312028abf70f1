"""Web-KG queries — structured data embedded in pages + the link graph.

The north rule's pipeline mines triples from Common-Crawl-style pages.
Besides the free-text path (NER + relations, queries_kg.py), real CC KG
pipelines extract the machine-readable statements pages carry — schema.org
JSON-LD, OpenGraph meta — and rank hosts on the hyperlink graph. These
queries exercise that whole path end-to-end on the driver's documents
table: a deterministic page synthesizer (pure concat projection, stated
IDENTICALLY in Spark and DuckDB) wraps each document in real HTML with a
JSON-LD block, og: meta tags, and three absolute outlinks; the extractors
(operators/webgraph.py) then recover structure with pure Catalyst
expressions, and PageRank runs in exact int64 arithmetic so the iterative
result passes the value-hash gate bit-for-bit.

Registered rows-only for the driver (the 50 gated slots are full — see
test_registry_fits_driver_correctness_cap); the FULL DuckDB comparisons
run locally in tests/test_queries_vs_oracle.py::test_webkg_oracle via
LOCAL_ORACLES below, the same discipline as the ingest round trips.

Scale shape: synthesis + extraction are one narrow codegen'd pass over
documents (no Python, no shuffle); the link queries add exactly one
groupBy shuffle on (src,dst); PageRank adds one dst-keyed shuffle per
iteration. Nothing here collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mitie_spark.operators.recrawl import snapshot_diff
from mitie_spark.operators.webgraph import (
    extract_anchor_texts,
    extract_jsonld_triples,
    extract_links,
    extract_microdata_triples,
    extract_og_meta,
    extract_rdfa_triples,
    host_link_edges,
    pagerank_integer,
)
from mitie_spark.queries import query
from mitie_spark.session import load_tables

#: number of synthetic link-target hosts (srcK.example.com, K in 0..19) —
#: a constant of the synthesizer matching the generator's 20 sources.
N_HOSTS = 20
_PR_SCALE = 10**12
_PR_DAMP = 85
_PR_ITERS = 3

# ---------------------------------------------------------------------------
# Deterministic page synthesizer. The Spark projection and the SQL CTE
# below MUST stay in lockstep — test_webkg_oracle compares every byte of
# their downstream extractions. documents.text is [a-z0-9 ]-only (driver
# generator), so it needs no JSON/attribute escaping.
# ---------------------------------------------------------------------------


def synth_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, ["documents"])["documents"]

    def s(col):
        return col.cast("string")

    title = F.substring("text", 1, 32)

    def link_id(k: int):
        return F.col("doc_id") * 7 + 13 * k + 1

    def host(k: int):
        return F.concat(
            F.lit("src"), s(link_id(k) % N_HOSTS), F.lit(".example.com")
        )

    anchors = ("more", "related", "next")
    link_parts = []
    for k, word in enumerate(anchors):
        link_parts += [
            F.lit('<a href="https://'),
            host(k),
            F.lit("/doc/"),
            s(link_id(k)),
            F.lit(f'">{word}</a>'),
        ]
    html = F.concat(
        F.lit("<html><head><title>"),
        title,
        F.lit('</title><meta property="og:title" content="'),
        title,
        F.lit('"/><meta property="og:locale" content="'),
        F.col("lang"),
        F.lit('"/><meta property="og:type" content="article"/>'),
        F.lit(
            '<script type="application/ld+json">'
            '{"@context":"https://schema.org","@type":"Article","headline":"'
        ),
        title,
        F.lit('","author":{"@type":"Person","name":"author-'),
        s(F.col("doc_id") % 97),
        F.lit('"},"publisher":{"@type":"Organization","name":"'),
        F.col("source"),
        F.lit('"},"wordCount":'),
        s(F.col("n_chars")),
        F.lit("}</script></head><body><p>"),
        F.col("text"),
        F.lit("</p>"),
        # HTML5 microdata (Product) + RDFa Lite (Person) blocks — the
        # other two structured-data channels WebDataCommons-style
        # pipelines mine besides JSON-LD
        F.lit(
            '<div itemscope itemtype="https://schema.org/Product">'
            '<span itemprop="name">'
        ),
        title,
        F.lit('</span><meta itemprop="sku" content="sku-'),
        s(F.col("doc_id")),
        F.lit(
            '"/></div><div vocab="https://schema.org/" typeof="Person">'
            '<span property="name">author-'
        ),
        s(F.col("doc_id") % 97),
        F.lit("</span></div>"),
        *link_parts,
        F.lit("</body></html>"),
    )
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/doc/"),
        s(F.col("doc_id")),
    )
    return d.select(
        "doc_id", "source", "lang", url.alias("url"), html.alias("html")
    )


def _links_sql(k: int, word: str) -> str:
    lid = f"(doc_id*7 + {13 * k} + 1)"
    return (
        f"|| '<a href=\"https://src' || CAST({lid} % {N_HOSTS} AS VARCHAR) "
        f"|| '.example.com/doc/' || CAST({lid} AS VARCHAR) "
        f"|| '\">{word}</a>'"
    )


_PAGES_CTE = f"""
pages AS (
  SELECT doc_id, source, lang,
    'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
    '<html><head><title>' || substr(text, 1, 32)
    || '</title><meta property="og:title" content="' || substr(text, 1, 32)
    || '"/><meta property="og:locale" content="' || lang
    || '"/><meta property="og:type" content="article"/>'
    || '<script type="application/ld+json">{{"@context":"https://schema.org","@type":"Article","headline":"'
    || substr(text, 1, 32)
    || '","author":{{"@type":"Person","name":"author-' || CAST(doc_id % 97 AS VARCHAR)
    || '"}},"publisher":{{"@type":"Organization","name":"' || source
    || '"}},"wordCount":' || CAST(n_chars AS VARCHAR)
    || '}}</script></head><body><p>' || text || '</p>'
    || '<div itemscope itemtype="https://schema.org/Product"><span itemprop="name">'
    || substr(text, 1, 32)
    || '</span><meta itemprop="sku" content="sku-' || CAST(doc_id AS VARCHAR)
    || '"/></div><div vocab="https://schema.org/" typeof="Person"><span property="name">author-'
    || CAST(doc_id % 97 AS VARCHAR)
    || '</span></div>'
    {_links_sql(0, "more")}
    {_links_sql(1, "related")}
    {_links_sql(2, "next")}
    || '</body></html>' AS html
  FROM documents
)"""

_EDGES_CTES = f"""{_PAGES_CTE},
links AS (
  SELECT source || '.example.com' AS src_host,
         unnest(regexp_extract_all(html, '<a href="https?://([a-z0-9.-]+)[/"]', 1)) AS dst_host
  FROM pages
),
edges AS (
  SELECT src_host AS src, dst_host AS dst,
         COUNT(*) AS w
  FROM links GROUP BY src_host, dst_host
)"""


def _pagerank_ctes(iters: int = _PR_ITERS) -> str:
    """r0..r{iters} CTEs of the exact-int64 PageRank (mirrors
    operators/webgraph.pagerank_integer term for term)."""
    tele = f"({100 - _PR_DAMP} * {_PR_SCALE}) // (100 * n_nodes)"
    parts = [
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "nn AS (SELECT COUNT(*) AS n_nodes FROM nodes)",
        "outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS out_w FROM edges GROUP BY src)",
        f"r0 AS (SELECT node, {_PR_SCALE} // n_nodes AS r FROM nodes CROSS JOIN nn)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""c{i} AS (
  SELECT e.dst, CAST(SUM(({_PR_DAMP} * r{i - 1}.r * e.w) // (100 * o.out_w)) AS BIGINT) AS in_c
  FROM edges e
  JOIN r{i - 1} ON e.src = r{i - 1}.node
  JOIN outw o ON o.src = e.src
  GROUP BY e.dst)"""
        )
        parts.append(
            f"""r{i} AS (
  SELECT node, {tele} + COALESCE(c{i}.in_c, 0) AS r
  FROM nodes CROSS JOIN nn LEFT JOIN c{i} ON c{i}.dst = nodes.node)"""
        )
    return ",\n".join(parts)


#: full DuckDB mirrors, run by tests/test_queries_vs_oracle.py (rows-only
#: for the driver — its 50 gated slots are full).
LOCAL_ORACLES: dict[str, str] = {
    "web_jsonld_triples": f"""
    WITH {_PAGES_CTE},
    blocks AS (
      SELECT url,
             regexp_extract(html, '<script type="application/ld\\+json">([^<]*)</script>', 1) AS j
      FROM pages
      WHERE regexp_extract(html, '<script type="application/ld\\+json">([^<]*)</script>', 1) <> ''
    ),
    triples AS (
      SELECT url AS subj, 'rdf:type' AS pred, json_extract_string(j, '$."@type"') AS obj FROM blocks
      UNION ALL SELECT url, 'schema:headline', json_extract_string(j, '$.headline') FROM blocks
      UNION ALL SELECT url, 'schema:author', json_extract_string(j, '$.author.name') FROM blocks
      UNION ALL SELECT url, 'schema:publisher', json_extract_string(j, '$.publisher.name') FROM blocks
      UNION ALL SELECT url, 'schema:wordCount', json_extract_string(j, '$.wordCount') FROM blocks
    )
    SELECT subj, pred, obj FROM triples WHERE obj IS NOT NULL
    """,
    "web_microdata_rdfa_triples": f"""
    WITH {_PAGES_CTE},
    md AS (
      SELECT url,
             regexp_extract(html, 'itemscope itemtype="([^"]*)"', 1) AS itype,
             regexp_extract(html, '<span itemprop="name">([^<]*)<', 1) AS name_span,
             regexp_extract(html, '<meta itemprop="name" content="([^"]*)"', 1) AS name_meta,
             regexp_extract(html, '<span itemprop="sku">([^<]*)<', 1) AS sku_span,
             regexp_extract(html, '<meta itemprop="sku" content="([^"]*)"', 1) AS sku_meta
      FROM pages WHERE regexp_matches(html, 'itemscope')
    ),
    rd AS (
      SELECT url,
             regexp_extract(html, 'typeof="([^"]*)"', 1) AS rtype,
             regexp_extract(html, 'property="name">([^<]*)<', 1) AS r_name
      FROM pages WHERE regexp_matches(html, 'typeof=')
    ),
    triples AS (
      SELECT url AS subj, 'rdf:type' AS pred, NULLIF(itype, '') AS obj FROM md
      UNION ALL SELECT url, 'schema:name', COALESCE(NULLIF(name_span, ''), NULLIF(name_meta, '')) FROM md
      UNION ALL SELECT url, 'schema:sku', COALESCE(NULLIF(sku_span, ''), NULLIF(sku_meta, '')) FROM md
      UNION ALL SELECT url, 'rdf:type', NULLIF(rtype, '') FROM rd
      UNION ALL SELECT url, 'schema:name', NULLIF(r_name, '') FROM rd
    )
    SELECT subj, pred, obj FROM triples WHERE obj IS NOT NULL
    """,
    "web_opengraph_meta": f"""
    WITH {_PAGES_CTE}
    SELECT doc_id,
           regexp_extract(html, '<meta property="og:title" content="([^"]*)"', 1) AS og_title,
           regexp_extract(html, '<meta property="og:locale" content="([^"]*)"', 1) AS og_locale,
           regexp_extract(html, '<meta property="og:type" content="([^"]*)"', 1) AS og_type
    FROM pages
    """,
    "web_host_links": f"""
    WITH {_EDGES_CTES}
    SELECT src AS src_host, dst AS dst_host, w AS n_links FROM edges
    """,
    "web_anchor_texts": f"""
    WITH {_PAGES_CTE},
    anchors AS (
      SELECT u[1] AS dst_host, u[2] AS anchor FROM (
        SELECT unnest(list_zip(
          regexp_extract_all(html, '<a href="https?://([a-z0-9.-]+)[^"]*">([^<]*)</a>', 1),
          regexp_extract_all(html, '<a href="https?://([a-z0-9.-]+)[^"]*">([^<]*)</a>', 2)
        )) AS u
        FROM pages)
    )
    SELECT dst_host, anchor, COUNT(*) AS n_links
    FROM anchors GROUP BY dst_host, anchor
    """,
    "web_host_pagerank": f"""
    WITH {_EDGES_CTES},
    {_pagerank_ctes()}
    SELECT node AS host, r AS rank_int FROM r{_PR_ITERS}
    """,
}


# ---------------------------------------------------------------------------
# Queries (SURVEY.md §2.8 web-KG family).
# ---------------------------------------------------------------------------


@query("web_jsonld_triples")
def web_jsonld_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """schema.org JSON-LD blocks → (subj, pred, obj) triples.

    The second triple source of a CC KG pipeline (WebDataCommons-style),
    next to the NER/relation path. Pure Catalyst: regexp_extract of the
    script block + get_json_object per predicate + one explode — no
    Python, no shuffle; at 100 TB this is a single narrow pass with the
    scan pruned to (url, html).
    """
    return extract_jsonld_triples(synth_pages(spark, sf_dir))


@query("web_microdata_rdfa_triples")
def web_microdata_rdfa_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML5 microdata + RDFa Lite → (subj, pred, obj) triples.

    Completes the structured-data trio (with web_jsonld_triples) that
    CC KG pipelines mine: itemscope/itemprop blocks in both the visible
    span and invisible meta shapes, and typeof/property RDFa attributes.
    Pure regexp projections unioned — still no Python, no shuffle.
    """
    pages = synth_pages(spark, sf_dir)
    md = extract_microdata_triples(pages, props=("name", "sku"))
    rd = extract_rdfa_triples(pages, props=("name",))
    return md.union(rd)


@query("web_opengraph_meta")
def web_opengraph_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OpenGraph <meta> tags → typed page-metadata columns (og_title /
    og_locale / og_type). Pure regexp projection, no shuffle."""
    pages = synth_pages(spark, sf_dir)
    return extract_og_meta(pages.select("doc_id", "html")).drop("html")


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = synth_pages(spark, sf_dir)
    links = extract_links(
        pages, F.concat(F.col("source"), F.lit(".example.com"))
    )
    return host_link_edges(links)


@query("web_host_links")
def web_host_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """<a href> extraction → weighted host-level link-graph edges.

    regexp_extract_all + explode (narrow), then ONE groupBy shuffle on
    (src, dst) — the canonical first stage of any web-graph build.
    """
    return _edges(spark, sf_dir).select(
        F.col("src").alias("src_host"),
        F.col("dst").alias("dst_host"),
        F.col("weight").alias("n_links"),
    )


@query("web_anchor_texts")
def web_anchor_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text mining: which surface forms does the web use to link
    to each host — the classic alias-evidence signal for entity linking
    (reference analog J4's alias dictionary). Paired regexp extraction
    (host + visible text from the same match) then ONE groupBy shuffle.
    """
    pages = synth_pages(spark, sf_dir)
    anchors = extract_anchor_texts(
        pages, F.concat(F.col("source"), F.lit(".example.com"))
    )
    return (
        anchors.groupBy("dst_host", "anchor")
        .agg(F.count("*").alias("n_links"))
    )


#: the synthetic robots.txt every host serves in crawl_frontier_allowed —
#: exercises group selection (the smith group must NOT apply), the
#: longest-match allow-over-disallow rule, and '*'/'$' pattern matching.
_ROBOTS_TXT = (
    "User-agent: smith\n"
    "Disallow: /\n"
    "\n"
    "User-agent: *\n"
    "Disallow: /private/\n"
    "Allow: /private/ok\n"
    "Disallow: /files/*.exe$\n"
)


@query("crawl_frontier_allowed")
def crawl_frontier_allowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 politeness filtering through the REAL robots matcher
    (sources/robots.py): five path shapes per doc_id cycle through
    no-rule, plain disallow, longer-allow-wins, wildcard+$ disallow,
    and the $-anchor miss. The oracle states the expected decision
    independently (doc_id % 5), so the gate checks the matcher's
    group-selection and longest-match semantics, not a mirror of them.

    Scale shape: robots bodies are a per-host dimension (broadcast);
    decisions are one narrow mapInPandas with per-batch compiled-rule
    caching — no shuffle over the urls table.
    """
    from mitie_spark.sources.robots import filter_allowed_urls

    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    path = (
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.lit("/doc/"), F.col("doc_id").cast("string")))
        .when(F.col("doc_id") % 5 == 1, F.concat(F.lit("/private/"), F.col("doc_id").cast("string")))
        .when(F.col("doc_id") % 5 == 2, F.concat(F.lit("/private/ok"), F.col("doc_id").cast("string")))
        .when(F.col("doc_id") % 5 == 3, F.concat(F.lit("/files/"), F.col("doc_id").cast("string"), F.lit(".exe")))
        .otherwise(F.concat(F.lit("/files/"), F.col("doc_id").cast("string"), F.lit(".exe.txt")))
    )
    urls = d.select(
        "doc_id",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com"), path
        ).alias("url"),
    )
    robots = (
        d.select(F.col("source")).distinct()
        .select(
            F.concat(F.col("source"), F.lit(".example.com")).alias("host"),
            F.lit(_ROBOTS_TXT).alias("robots_txt"),
        )
    )
    return filter_allowed_urls(urls, robots, agent="mitiebot").select(
        "doc_id", "allowed"
    )


LOCAL_ORACLES["crawl_frontier_allowed"] = """
    SELECT doc_id,
           (doc_id % 5) IN (0, 2, 4) AS allowed
    FROM documents
    """


@query("url_canonical_forms")
def url_canonical_forms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 3986 canonicalization through the REAL normalizer
    (functions/urlnorm.py): six messy-URL shapes per doc_id cycle —
    uppercase scheme/host + default port, dot segments, unreserved
    percent-escapes, hex-case + fragment, empty path, and the
    userinfo/non-default-port passthrough. The oracle constructs each
    expected canonical string independently (doc_id % 6), gating the
    normalizer's semantics rather than mirroring its code.

    Scale shape: one Arrow-batched pandas-UDF projection, no shuffle —
    the canonical form feeds link-graph and frontier dedup keys.
    """
    from mitie_spark.functions.urlnorm import normalize_urls_udf

    d = load_tables(spark, sf_dir, ["documents"])["documents"]
    sid = F.col("doc_id").cast("string")
    host = F.concat(F.col("source"), F.lit(".example.com"))
    messy = (
        F.when(
            F.col("doc_id") % 6 == 0,
            F.concat(F.lit("HTTP://"), F.upper(host), F.lit(":80/doc/"), sid),
        )
        .when(
            F.col("doc_id") % 6 == 1,
            F.concat(F.lit("https://"), host, F.lit(":443/a/./"), sid, F.lit("/../page")),
        )
        .when(
            F.col("doc_id") % 6 == 2,
            F.concat(F.lit("https://"), host, F.lit("/%64%6f%63/"), sid),
        )
        .when(
            F.col("doc_id") % 6 == 3,
            F.concat(F.lit("https://"), host, F.lit("/doc/"), sid, F.lit("?x=%3a&y=2#frag")),
        )
        .when(F.col("doc_id") % 6 == 4, F.concat(F.lit("https://"), host))
        .otherwise(
            F.concat(F.lit("https://user:pw@"), host, F.lit(":8080/doc/"), sid)
        )
    )
    return d.select(
        "doc_id", normalize_urls_udf()(messy).alias("canon_url")
    )


LOCAL_ORACLES["url_canonical_forms"] = """
    SELECT doc_id,
           CASE doc_id % 6
             WHEN 0 THEN 'http://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR)
             WHEN 1 THEN 'https://' || source || '.example.com/a/page'
             WHEN 2 THEN 'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR)
             WHEN 3 THEN 'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR) || '?x=%3A&y=2'
             WHEN 4 THEN 'https://' || source || '.example.com/'
             ELSE 'https://user:pw@' || source || '.example.com:8080/doc/' || CAST(doc_id AS VARCHAR)
           END AS canon_url
    FROM documents
    """


@query("wet_document_ingest")
def wet_document_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-Crawl WET round trip under the md5 gate: documents →
    conversion-record archives (sources/wet_wat.py, half the archives
    gzip-member framed like a real .wet.gz) → parse_wet_bytes recovers
    every document byte-exactly. Rows-only slot; the md5+length DuckDB
    gate runs with the other ingest round trips in
    tests/test_queries_vs_oracle.py. Two narrow Arrow passes, no shuffle.
    """
    import hashlib

    import pandas as pd

    from mitie_spark.session import by_compute
    from mitie_spark.sources.wet_wat import parse_wet_bytes, write_wet

    docs = by_compute(
        load_tables(spark, sf_dir, ["documents"])["documents"].select(
            "doc_id", "text"
        )
    )

    def roundtrip(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            recs = [
                {
                    "doc_id": int(did),
                    "url": f"https://corpus.example/{int(did)}",
                    "warc_ts": "2024-01-01T00:00:00Z",
                    "text": text or "",
                }
                for did, text in zip(pdf["doc_id"], pdf["text"])
            ]
            ids, md5s, lens = [], [], []
            for i in range(0, len(recs), 256):
                part = recs[i : i + 256]
                blob = write_wet(part, gzip_members=part[0]["doc_id"] % 2 == 0)
                for url, _date, text in parse_wet_bytes(blob):
                    ids.append(int(url.rsplit("/", 1)[1]))
                    md5s.append(hashlib.md5(text.encode("utf-8")).hexdigest())
                    lens.append(len(text))
            yield pd.DataFrame(
                {"doc_id": ids, "text_md5": md5s, "text_len": lens}
            )

    return docs.mapInPandas(
        roundtrip, "doc_id bigint, text_md5 string, text_len bigint"
    )


@query("wat_link_graph")
def wat_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The link graph THROUGH the WAT sidecar round trip: synth pages →
    WAT metadata records (JSON envelopes with Head/Links) → archives →
    wat_link_edges reads them back (record walk + JVM get_json_object)
    → host edge counts. Gated against the SAME oracle as
    web_host_links, so the WAT write/parse cycle must preserve the link
    graph exactly.
    """
    import pandas as pd

    from mitie_spark.sources.wet_wat import wat_link_edges, write_wat

    pages = synth_pages(spark, sf_dir)
    from mitie_spark.sources.wet_wat import pages_to_wat_records

    recs = pages_to_wat_records(pages)

    def pack(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            rows = [
                {
                    "url": r.url,
                    "warc_ts": r.warc_ts,
                    "title": r.title,
                    "links": [
                        {"url": l["url"], "text": l["text"]} for l in r.links
                    ],
                }
                for r in pdf.itertuples()
            ]
            for i in range(0, len(rows), 256):
                yield pd.DataFrame(
                    {"content": [write_wat(rows[i : i + 256], gzip_members=i % 512 == 0)]}
                )

    archives = recs.mapInPandas(pack, "content binary")
    return (
        wat_link_edges(archives)
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_links"))
    )


LOCAL_ORACLES["wat_link_graph"] = LOCAL_ORACLES["web_host_links"]


@query("feed_frontier_ingest")
def feed_frontier_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed-discovery round trip under the md5 gate: documents become
    RSS 2.0 items (even doc_id batches) or Atom 1.0 entries (odd), the
    text riding in description/summary, then parse_feed
    (sources/feeds.py) recovers every document byte-exactly. Rows-only
    slot; the md5+length DuckDB gate runs with the ingest round trips
    in tests/test_queries_vs_oracle.py. One narrow Arrow pass.
    """
    import hashlib

    import pandas as pd

    from mitie_spark.session import by_compute
    from mitie_spark.sources.feeds import parse_feed
    from mitie_spark.sources.ooxml import esc_xml

    docs = by_compute(
        load_tables(spark, sf_dir, ["documents"])["documents"].select(
            "doc_id", "text"
        )
    )

    def roundtrip(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            rows = sorted(
                (int(d), t or "") for d, t in zip(pdf["doc_id"], pdf["text"])
            )
            ids, md5s, lens = [], [], []
            for i in range(0, len(rows), 256):
                part = rows[i : i + 256]
                if part[0][0] % 2 == 0:  # RSS 2.0
                    items = "".join(
                        f"<item><link>https://corpus.example/{d}</link>"
                        f"<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate>"
                        f"<description>{esc_xml(t)}</description></item>"
                        for d, t in part
                    )
                    blob = (
                        f"<rss version=\"2.0\"><channel><title>c</title>"
                        f"{items}</channel></rss>"
                    ).encode("utf-8")
                else:  # Atom 1.0
                    entries = "".join(
                        f"<entry><link rel=\"alternate\" "
                        f"href=\"https://corpus.example/{d}\"/>"
                        f"<updated>2024-01-01T00:00:00Z</updated>"
                        f"<summary>{esc_xml(t)}</summary></entry>"
                        for d, t in part
                    )
                    blob = (
                        '<feed xmlns="http://www.w3.org/2005/Atom">'
                        f"<title>c</title>{entries}</feed>"
                    ).encode("utf-8")
                for e in parse_feed(blob)[1]:
                    text = e["summary"] or ""
                    ids.append(int(e["url"].rsplit("/", 1)[1]))
                    md5s.append(hashlib.md5(text.encode("utf-8")).hexdigest())
                    lens.append(len(text))
            yield pd.DataFrame(
                {"doc_id": ids, "text_md5": md5s, "text_len": lens}
            )

    return docs.mapInPandas(
        roundtrip, "doc_id bigint, text_md5 string, text_len bigint"
    )


@query("sitemap_frontier_ingest")
def sitemap_frontier_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap-discovery round trip: each 256-doc batch becomes gzip'd
    child urlsets referenced by a sitemapindex; parse_sitemap walks the
    index, then each child, recovering (doc_id, lastmod). The oracle
    constructs the expected lastmod independently (doc_id % 28), so the
    gate checks the parser, not a mirror of it.
    """
    import gzip as _gzip

    import pandas as pd

    from mitie_spark.session import by_compute
    from mitie_spark.sources.robots import parse_sitemap

    docs = by_compute(
        load_tables(spark, sf_dir, ["documents"])["documents"].select("doc_id")
    )

    def roundtrip(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            dids = sorted(int(d) for d in pdf["doc_id"])
            children = []
            for i in range(0, len(dids), 256):
                urls = "".join(
                    f"<url><loc>https://corpus.example/{d}</loc>"
                    f"<lastmod>2024-01-{1 + d % 28:02d}</lastmod></url>"
                    for d in dids[i : i + 256]
                )
                child = (
                    '<urlset xmlns="http://www.sitemaps.org/schemas/'
                    f'sitemap/0.9">{urls}</urlset>'
                ).encode("utf-8")
                children.append(_gzip.compress(child))
            index = (
                '<sitemapindex xmlns="http://www.sitemaps.org/schemas/'
                "sitemap/0.9\">"
                + "".join(
                    f"<sitemap><loc>https://corpus.example/s{i}.xml.gz"
                    "</loc></sitemap>"
                    for i in range(len(children))
                )
                + "</sitemapindex>"
            ).encode("utf-8")
            kind, refs = parse_sitemap(index)
            assert kind == "sitemapindex" and len(refs) == len(children)
            ids, lastmods = [], []
            for loc, _ in refs:
                child_no = int(loc.rsplit("/s", 1)[1].split(".")[0])
                ckind, entries = parse_sitemap(children[child_no])
                assert ckind == "urlset"
                for url, lastmod in entries:
                    ids.append(int(url.rsplit("/", 1)[1]))
                    lastmods.append(lastmod)
            yield pd.DataFrame({"doc_id": ids, "lastmod": lastmods})

    return docs.mapInPandas(roundtrip, "doc_id bigint, lastmod string")


LOCAL_ORACLES["sitemap_frontier_ingest"] = """
    SELECT doc_id,
           '2024-01-' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0') AS lastmod
    FROM documents
    """


@query("wikidump_ingest")
def wikidump_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MediaWiki-dump round trip under the md5 gate: each document
    becomes a dump <page> whose wikitext wraps the text in the noise a
    real article carries — an infobox template, a comment, a wiki link
    and bold markup on the first two tokens, a <ref>, a category link —
    alternating plain / bz2 / multistream-bz2 archives; the stripper
    (sources/mediawiki.py) must recover every document byte-exactly.
    Rows-only slot; the md5+length gate runs with the other ingest round
    trips. One narrow Arrow pass, no shuffle.
    """
    import bz2 as _bz2
    import hashlib

    import pandas as pd

    from mitie_spark.session import by_compute
    from mitie_spark.sources.mediawiki import iter_dump_pages, wikitext_to_text
    from mitie_spark.sources.ooxml import esc_xml

    docs = by_compute(
        load_tables(spark, sf_dir, ["documents"])["documents"].select(
            "doc_id", "text"
        )
    )

    def roundtrip(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            rows = sorted(
                (int(d), t or "") for d, t in zip(pdf["doc_id"], pdf["text"])
            )
            ids, md5s, lens = [], [], []
            for i in range(0, len(rows), 256):
                part = rows[i : i + 256]
                pages = []
                for did, text in part:
                    toks = text.split(" ")
                    # only decorate markup-safe tokens: a ':' would make
                    # [[tok]] a dropped namespace link, a quote run would
                    # merge with the inserted ''' — either corrupts the
                    # byte-exact round trip on a richer corpus
                    if len(toks) >= 2 and toks[0].isalnum() and toks[1].isalnum():
                        toks[0] = f"[[{toks[0]}]]"
                        toks[1] = f"'''{toks[1]}'''"
                    wt = (
                        f"{{{{Infobox doc|id={did}}}}}<!--{did}-->"
                        + " ".join(toks)
                        + f"<ref>src {did}</ref>[[Category:C{did % 7}]]"
                    )
                    # esc_xml so the wikitext survives the XML layer AS
                    # TEXT — unescaped, the parser itself consumed the
                    # <ref>/comment (rel.text stopped at the first child
                    # element) and the stripper never saw the noise this
                    # gate exists to exercise; any '&'/'<' in a document
                    # would have been a parse crash
                    pages.append(
                        f"<page><title>Doc {did}</title><ns>0</ns>"
                        f"<revision><text>{esc_xml(wt)}</text></revision></page>"
                    )
                xml = (
                    '<mediawiki xmlns="http://www.mediawiki.org/xml/'
                    f'export-0.10/">{"".join(pages)}</mediawiki>'
                ).encode("utf-8")
                form = part[0][0] % 3
                if form == 1:
                    blob = _bz2.compress(xml)
                elif form == 2:  # multistream: two concatenated members
                    half = len(xml) // 2
                    blob = _bz2.compress(xml[:half]) + _bz2.compress(xml[half:])
                else:
                    blob = xml
                for p in iter_dump_pages(blob):
                    got = wikitext_to_text(p["text"])
                    ids.append(int(p["title"].split(" ", 1)[1]))
                    md5s.append(hashlib.md5(got.encode("utf-8")).hexdigest())
                    lens.append(len(got))
            yield pd.DataFrame(
                {"doc_id": ids, "text_md5": md5s, "text_len": lens}
            )

    return docs.mapInPandas(
        roundtrip, "doc_id bigint, text_md5 string, text_len bigint"
    )


@query("web_host_pagerank")
def web_host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank over the host graph, exact int64 ranks.

    An ITERATIVE distributed graph algorithm under the full value-hash
    gate: integer quantization (ranks in units of 1e-12, all divisions
    integer) makes every summation order produce identical bits, so the
    3-iteration Spark loop and the DuckDB recursive-CTE chain agree
    exactly (same convention as the quantized-cosine queries). One
    dst-keyed shuffle per iteration; nothing collects.
    """
    return pagerank_integer(
        _edges(spark, sf_dir),
        iters=_PR_ITERS,
        scale=_PR_SCALE,
        damp_pct=_PR_DAMP,
    ).select(F.col("node").alias("host"), "rank_int")


@query("recrawl_snapshot_diff")
def recrawl_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX-style change detection across two crawl snapshots.

    Snapshot 1 is the documents table as crawled; snapshot 2 is a
    deterministic perturbation stated IDENTICALLY in Spark and SQL:
    every 7th URL disappears (dropped page), every remaining 5th
    changes content, every 11th doc contributes a brand-new URL.  The
    diff (operators/recrawl.snapshot_diff) classifies each URL as
    added / deleted / changed / unchanged by digest equality, then
    aggregates per status.  Rows-only slot; full value-hash gate in
    tests/test_queries_vs_oracle.py via LOCAL_ORACLES.

    Scale shape: two narrow digest projections of the same scan + ONE
    full-outer hash join on url (digests travel, bodies never) + one
    4-group aggregate.  At 100 TB the join is the whole cost and it is
    already minimal: fixed-width rows, co-partitioned exchange.
    """
    docs = load_tables(spark, sf_dir, ["documents"])["documents"].select(
        "doc_id", "text", "source"
    )
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/doc/"),
        F.col("doc_id").cast("string"),
    )
    snap1 = docs.select(url.alias("url"), F.md5(F.col("text")).alias("content_md5"))
    snap2 = (
        docs.where(F.col("doc_id") % 7 != 0)
        .select(
            url.alias("url"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.md5(F.concat(F.col("text"), F.lit(" v2"))),
            )
            .otherwise(F.md5(F.col("text")))
            .alias("content_md5"),
        )
        .unionByName(
            docs.where(F.col("doc_id") % 11 == 0).select(
                F.concat(url, F.lit("-b")).alias("url"),
                F.md5(F.concat(F.col("text"), F.lit(" b"))).alias("content_md5"),
            )
        )
    )
    d = snapshot_diff(snap1, snap2)
    return (
        d.groupBy("status")
        .agg(F.count("*").alias("n_urls"), F.min("url").alias("first_url"))
        .orderBy("status")
    )


LOCAL_ORACLES["recrawl_snapshot_diff"] = """
    WITH snap1 AS (
      SELECT 'https://' || source || '.example.com/doc/'
               || CAST(doc_id AS VARCHAR) AS url,
             md5(text) AS content_md5
      FROM documents
    ), snap2 AS (
      SELECT 'https://' || source || '.example.com/doc/'
               || CAST(doc_id AS VARCHAR) AS url,
             CASE WHEN doc_id % 5 = 0 THEN md5(text || ' v2')
                  ELSE md5(text) END AS content_md5
      FROM documents WHERE doc_id % 7 <> 0
      UNION ALL
      SELECT 'https://' || source || '.example.com/doc/'
               || CAST(doc_id AS VARCHAR) || '-b',
             md5(text || ' b')
      FROM documents WHERE doc_id % 11 = 0
    ), diff AS (
      SELECT CASE WHEN s1.url IS NULL THEN 'added'
                  WHEN s2.url IS NULL THEN 'deleted'
                  WHEN s1.content_md5 = s2.content_md5 THEN 'unchanged'
                  ELSE 'changed' END AS status,
             COALESCE(s1.url, s2.url) AS url
      FROM snap1 s1 FULL OUTER JOIN snap2 s2 ON s1.url = s2.url
    )
    SELECT status, COUNT(*) AS n_urls, MIN(url) AS first_url
    FROM diff GROUP BY status ORDER BY status
    """


@query("main_content_extraction")
def main_content_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate removal under the md5 gate: each document is wrapped
    in the chrome a real crawled page carries — a <head>/<title>, a nav
    bar, a <header> masthead, a link-dense "related" row, a copyright
    footer — and the block-density extractor
    (functions/boilerplate.main_content) must recover the article text
    byte-exactly: containers kill nav/header/footer/head, link density
    kills the related-links row, and the lone <p> block survives.
    Rows-only slot; full value-hash gate in LOCAL_ORACLES.

    Scale shape: one narrow codegen'd synthesis projection + one Arrow
    mapInPandas pass sized by cores (by_compute) — per-doc pure-Python
    parsing is the honest cost for messy HTML; no shuffle, no collect.
    """
    from mitie_spark.functions.boilerplate import extract_main_content
    from mitie_spark.session import by_compute

    # the byte-exact round trip only holds for documents whose text can
    # embed in HTML verbatim — '<' would tag-parse, '&' would entity-
    # decode. The driver corpora are [a-z0-9 ]-only so nothing drops
    # today, but a richer corpus must shrink the gate on BOTH sides
    # identically rather than go red far from the cause.
    docs = load_tables(spark, sf_dir, ["documents"])["documents"].where(
        ~F.col("text").contains("<") & ~F.col("text").contains("&")
    )
    title = F.substring("text", 1, 16)
    html = F.concat(
        F.lit("<html><head><title>"),
        title,
        F.lit(
            '</title></head><body><nav><a href="/">home</a>'
            '<a href="/about">about</a><a href="/contact">contact</a></nav>'
            "<header><h1>"
        ),
        title,
        F.lit(
            '</h1></header><div><a href="/r/1">related one</a> '
            '<a href="/r/2">related two</a> '
            '<a href="/r/3">related three</a></div><p>'
        ),
        F.col("text"),
        F.lit("</p><footer>copyright 2024 "),
        F.col("source"),
        F.lit("</footer></body></html>"),
    )
    pages = by_compute(docs.select("doc_id", html.alias("html")))
    out = extract_main_content(pages)
    return out.select(
        "doc_id",
        F.md5(F.col("main_text")).alias("text_md5"),
        F.length("main_text").alias("text_len"),
    )


LOCAL_ORACLES["main_content_extraction"] = """
    SELECT doc_id, md5(text) AS text_md5, length(text) AS text_len
    FROM documents
    WHERE text NOT LIKE '%<%' AND text NOT LIKE '%&%'
    """


_HITS_SCALE = 10**6
_HITS_ITERS = 3


def _hits_ctes(iters: int = _HITS_ITERS, scale: int = _HITS_SCALE) -> str:
    """a1..a{iters}/h1..h{iters} CTEs of the exact-int64 HITS (mirrors
    operators/webgraph.hits_integer term for term: L1 normalization by
    integer division per half-step)."""
    parts = [
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        f"h0 AS (SELECT node, CAST({scale} AS BIGINT) AS s FROM nodes)",
    ]
    prev_h = "h0"
    for i in range(1, iters + 1):
        parts += [
            f"ar{i} AS (SELECT e.dst AS node, SUM(e.w * h.s) AS raw"
            f" FROM edges e JOIN {prev_h} h ON h.node = e.src GROUP BY e.dst)",
            f"at{i} AS (SELECT SUM(raw) AS tot FROM ar{i})",
            f"a{i} AS (SELECT n.node,"
            f" CAST(CASE WHEN tot = 0 THEN 0"
            f" ELSE COALESCE(ar{i}.raw, 0) * {scale} // tot END AS BIGINT) AS s"
            f" FROM nodes n LEFT JOIN ar{i} ON ar{i}.node = n.node"
            f" CROSS JOIN at{i})",
            f"hr{i} AS (SELECT e.src AS node, SUM(e.w * a.s) AS raw"
            f" FROM edges e JOIN a{i} a ON a.node = e.dst GROUP BY e.src)",
            f"ht{i} AS (SELECT SUM(raw) AS tot FROM hr{i})",
            f"h{i} AS (SELECT n.node,"
            f" CAST(CASE WHEN tot = 0 THEN 0"
            f" ELSE COALESCE(hr{i}.raw, 0) * {scale} // tot END AS BIGINT) AS s"
            f" FROM nodes n LEFT JOIN hr{i} ON hr{i}.node = n.node"
            f" CROSS JOIN ht{i})",
        ]
        prev_h = f"h{i}"
    return ",\n".join(parts)


@query("web_host_hits")
def web_host_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration HITS over the host graph, exact int64 scores.

    The second canonical link-graph authority signal next to PageRank
    (hubs point at good authorities; authorities are pointed at by good
    hubs).  Integer L1 normalization per half-step makes the 3-iteration
    Spark loop and the DuckDB CTE chain agree bit-for-bit (same
    convention as web_host_pagerank).  Rows-only slot; full value-hash
    gate via LOCAL_ORACLES.
    """
    from mitie_spark.operators.webgraph import hits_integer

    return (
        hits_integer(_edges(spark, sf_dir), iters=_HITS_ITERS, scale=_HITS_SCALE)
        .select(F.col("node").alias("host"), "auth_int", "hub_int")
        .orderBy("host")
    )


LOCAL_ORACLES["web_host_hits"] = f"""
    WITH {_EDGES_CTES.lstrip()},
    {_hits_ctes()}
    SELECT a{_HITS_ITERS}.node AS host,
           a{_HITS_ITERS}.s AS auth_int,
           h{_HITS_ITERS}.s AS hub_int
    FROM a{_HITS_ITERS} JOIN h{_HITS_ITERS}
      ON a{_HITS_ITERS}.node = h{_HITS_ITERS}.node
    ORDER BY host
    """


_BLOOM_BITS = 1 << 16
_BLOOM_K = 4
_BLOOM_SEED = "bloom"


def _bloom_sql_pos(i: int, url_expr: str) -> str:
    return (
        f"(('0x' || substr(md5('{_BLOOM_SEED}:{i}:' || {url_expr}), 1, 8))"
        f"::BIGINT % {_BLOOM_BITS})"
    )


def _bloom_ctes() -> str:
    build_pos = "\n      UNION ALL\n".join(
        f"      SELECT {_bloom_sql_pos(i, 'url')} AS p FROM seen"
        for i in range(_BLOOM_K)
    )
    probe_cols = ",\n".join(
        f"      {_bloom_sql_pos(i, 'url')} AS p{i}" for i in range(_BLOOM_K)
    )
    return f"""
    seen AS (
      SELECT 'https://' || source || '.example.com/doc/'
               || CAST(doc_id AS VARCHAR) AS url
      FROM documents
    ),
    probes AS (
      SELECT url, TRUE AS truly_seen FROM seen
      UNION ALL
      SELECT url || '-new', FALSE FROM seen
    ),
    build_pos AS (
{build_pos}
    ),
    bloom AS (
      SELECT (p - p % 63) // 63 AS word,
             BIT_OR(1::BIGINT << CAST(p % 63 AS INT)) AS bits
      FROM build_pos GROUP BY 1
    ),
    probe_pos AS (
      SELECT url, truly_seen,
{probe_cols}
      FROM probes
    )"""


def _bloom_sql_hit(i: int) -> str:
    mask = f"(1::BIGINT << CAST(p{i} % 63 AS INT))"
    return f"(COALESCE(b{i}.bits, 0) & {mask}) = {mask}"


@query("url_seen_bloom")
def url_seen_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl frontier's seen-URL Bloom filter, exact to the bit.

    Builds a 2^16-bit / k=4 Bloom filter over every crawled URL as a
    (word, bits) DataFrame (one explode + BIT_OR shuffle of int pairs),
    then probes every seen URL plus an equal number of unseen ones
    through k BROADCAST left joins — the frontier side never shuffles.
    Both build and probe are pure integer arithmetic on md5 prefixes, so
    Spark and DuckDB agree bit-for-bit: the gate structurally verifies
    the no-false-negative property (every truly_seen URL must read
    maybe_seen=true in BOTH engines).  Rows-only slot; full value-hash
    gate via LOCAL_ORACLES.
    """
    from mitie_spark.operators.bloom import bloom_build, bloom_probe

    docs = load_tables(spark, sf_dir, ["documents"])["documents"]
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/doc/"),
        F.col("doc_id").cast("string"),
    )
    seen = docs.select(url.alias("url"))
    probes = seen.select("url", F.lit(True).alias("truly_seen")).unionByName(
        seen.select(
            F.concat(F.col("url"), F.lit("-new")).alias("url"),
            F.lit(False).alias("truly_seen"),
        )
    )
    bloom = bloom_build(
        seen, m_bits=_BLOOM_BITS, k=_BLOOM_K, seed=_BLOOM_SEED
    )
    return bloom_probe(
        bloom, probes, m_bits=_BLOOM_BITS, k=_BLOOM_K, seed=_BLOOM_SEED
    ).select("url", "truly_seen", "maybe_seen")


LOCAL_ORACLES["url_seen_bloom"] = f"""
    WITH {_bloom_ctes().lstrip()}
    SELECT p.url, p.truly_seen,
           {" AND ".join(_bloom_sql_hit(i) for i in range(_BLOOM_K))}
             AS maybe_seen
    FROM probe_pos p
    {" ".join(f"LEFT JOIN bloom b{i} ON b{i}.word = (p{i} - p{i} % 63) // 63" for i in range(_BLOOM_K))}
    """


@query("charset_decoded_ingest")
def charset_decoded_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset sniffing under the md5 gate: each document is encoded the
    way a real crawl delivers it — rotating per doc_id through UTF-8
    with BOM, UTF-16-LE with BOM, windows-1252 declared as iso-8859-1
    via <meta> (the WHATWG alias rule), Shift_JIS declared via
    http-equiv, and undeclared strict-UTF-8 — with a non-ASCII marker
    prepended wherever the codec has bytes ASCII can't prove.  The
    detector (functions/charset.py) must pick the right channel AND
    codec: the gate hashes the recovered text and pins the codec name
    per row.  Rows-only slot; full value-hash gate via LOCAL_ORACLES.
    One narrow Arrow pass, by_compute-sized, no shuffle.
    """
    import codecs as _codecs
    import hashlib

    import pandas as pd

    from mitie_spark.functions.charset import decode_payload
    from mitie_spark.session import by_compute

    docs = by_compute(
        load_tables(spark, sf_dir, ["documents"])["documents"].select(
            "doc_id", "text"
        )
    )

    def roundtrip(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids, md5s, lens, encs = [], [], [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                text = text or ""
                mode = did % 5
                # downgrade rows the chosen channel can't round-trip to
                # the always-lossless BOM-UTF-8 channel, with the SAME
                # rule stated in the oracle: cp1252/shift_jis can't
                # encode arbitrary unicode (strict encode would kill the
                # task), and an undeclared payload whose own text embeds
                # '<meta' would win the prescan over the oracle's fixed
                # utf-8 answer
                if mode in (2, 3) and not text.isascii():
                    mode = 0
                if mode == 4 and "<meta" in text.lower():
                    mode = 0
                if mode == 0:
                    payload = _codecs.BOM_UTF8 + text.encode("utf-8")
                elif mode == 1:
                    payload = _codecs.BOM_UTF16_LE + text.encode("utf-16-le")
                elif mode == 2:
                    payload = (
                        '<meta charset="iso-8859-1">café ' + text
                    ).encode("cp1252")
                elif mode == 3:
                    payload = (
                        '<meta http-equiv="Content-Type" '
                        'content="text/html; charset=shift_jis">テスト ' + text
                    ).encode("shift_jis")
                else:
                    payload = ("ü " + text).encode("utf-8")
                got, enc = decode_payload(payload)
                if mode in (2, 3):  # strip the declaration element
                    got = got.split(">", 1)[1]
                ids.append(did)
                md5s.append(hashlib.md5(got.encode("utf-8")).hexdigest())
                lens.append(len(got))
                encs.append(enc)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "text_md5": md5s,
                    "text_len": lens,
                    "encoding": encs,
                }
            )

    return docs.mapInPandas(
        roundtrip,
        "doc_id bigint, text_md5 string, text_len bigint, encoding string",
    )


LOCAL_ORACLES["charset_decoded_ingest"] = """
    WITH moded AS (
      SELECT doc_id, COALESCE(text, '') AS t,
             CASE WHEN doc_id % 5 IN (2, 3)
                       AND strlen(COALESCE(text, ''))
                           <> length(COALESCE(text, '')) THEN 0
                  WHEN doc_id % 5 = 4
                       AND contains(lower(COALESCE(text, '')), '<meta')
                       THEN 0
                  ELSE doc_id % 5 END AS m
      FROM documents
    )
    SELECT doc_id,
           md5(CASE m WHEN 2 THEN 'café '
                      WHEN 3 THEN 'テスト '
                      WHEN 4 THEN 'ü '
                      ELSE '' END || t) AS text_md5,
           length(CASE m WHEN 2 THEN 'café '
                         WHEN 3 THEN 'テスト '
                         WHEN 4 THEN 'ü '
                         ELSE '' END || t) AS text_len,
           CASE m WHEN 1 THEN 'utf-16-le'
                  WHEN 2 THEN 'cp1252'
                  WHEN 3 THEN 'shift_jis'
                  ELSE 'utf-8' END AS encoding
    FROM moded
    """


# ---------------------------------------------------------------------------
# KG analytics gates (queries live in queries_kg.py — the graph-pattern
# queries over the extracted triples/mentions; rows-only for the driver,
# full value-hash gates here). The truth tables double as the oracle: the
# extracted graph equals the planted truth at gate scales, so the SQL
# states the same join over triples_true/mentions_true.
# ---------------------------------------------------------------------------

from mitie_spark.queries_kg import ORACLE_KG as _ORACLE_KG  # noqa: E402

LOCAL_ORACLES["kg_two_hop_inference"] = f"""
WITH born AS (
  SELECT url, subj AS person, obj AS city
  FROM read_parquet('{_ORACLE_KG}/triples_true.parquet') WHERE pred = 'born_in'
),
cont AS (
  SELECT DISTINCT subj AS country, obj AS city
  FROM read_parquet('{_ORACLE_KG}/triples_true.parquet') WHERE pred = 'contains'
)
SELECT person, country,
       COUNT(DISTINCT b.url) AS n_docs,
       COUNT(DISTINCT b.city) AS n_cities
FROM born b JOIN cont c ON b.city = c.city
GROUP BY person, country
"""

LOCAL_ORACLES["kg_entity_comentions"] = f"""
WITH ment AS (
  SELECT DISTINCT url, surface
  FROM read_parquet('{_ORACLE_KG}/mentions_true.parquet')
),
n_tot AS (SELECT COUNT(DISTINCT url) AS n FROM ment),
cnt AS (SELECT surface, COUNT(*) AS c FROM ment GROUP BY surface),
pairs AS (
  SELECT a.surface AS surface_a, b.surface AS surface_b,
         COUNT(*) AS n_docs_both
  FROM ment a JOIN ment b ON a.url = b.url AND a.surface < b.surface
  GROUP BY a.surface, b.surface
  HAVING COUNT(*) >= 3
)
SELECT surface_a, surface_b, n_docs_both,
       (n_docs_both * n.n * 1000000) // (ca.c * cb.c) AS lift_ppm
FROM pairs CROSS JOIN n_tot n
JOIN cnt ca ON ca.surface = pairs.surface_a
JOIN cnt cb ON cb.surface = pairs.surface_b
"""


# ---------------------------------------------------------------------------
# Host-graph BFS — reachability depth from a seed host (crawl-distance
# analytics: "how many hops from the seed list is this host?").
# ---------------------------------------------------------------------------

_BFS_SEED = "src0.example.com"
_BFS_ITERS = 3
_BFS_INF = 10**9


def _bfs_ctes(iters: int = _BFS_ITERS) -> str:
    """d0..d{iters} CTEs of the exact-integer BFS relaxation (mirrors
    operators/webgraph.bfs_depths_integer term for term)."""
    parts = [
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        f"""d0 AS (SELECT node,
  CAST(CASE WHEN node = '{_BFS_SEED}' THEN 0 ELSE {_BFS_INF} END AS BIGINT) AS d
  FROM nodes)""",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""u{i} AS (
  SELECT e.dst AS node, MIN(d{i - 1}.d + 1) AS du
  FROM edges e JOIN d{i - 1} ON d{i - 1}.node = e.src GROUP BY e.dst)"""
        )
        parts.append(
            f"""d{i} AS (
  SELECT d{i - 1}.node,
         LEAST(d{i - 1}.d, COALESCE(u{i}.du, {_BFS_INF})) AS d
  FROM d{i - 1} LEFT JOIN u{i} USING (node))"""
        )
    return ",\n".join(parts)


@query("web_host_bfs_depth")
def web_host_bfs_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-hop reachability over the host graph: BFS depth from the
    seed host, exact integers, fixed 3 iterations (host-graph diameters
    are single-digit; all 20 synth hosts are reached by hop 3, verified
    in the gate — depths found at pass i are final, BFS only shrinks
    them). Another ITERATIVE
    graph operator under the full value-hash gate — see
    operators/webgraph.bfs_depths_integer for the plan shape."""
    from mitie_spark.operators.webgraph import bfs_depths_integer

    return bfs_depths_integer(
        _edges(spark, sf_dir), seeds=[_BFS_SEED], iters=_BFS_ITERS,
        inf=_BFS_INF,
    ).select(F.col("node").alias("host"), "depth")


LOCAL_ORACLES["web_host_bfs_depth"] = f"""
WITH {_EDGES_CTES},
{_bfs_ctes()}
SELECT node AS host, d AS depth FROM d{_BFS_ITERS} WHERE d < {_BFS_INF}
"""


# HLL sketch gate (query in queries_wordrep.py) — the SQL states the
# identical register/estimate integer arithmetic; the LC table literals
# come from the same Python list the Spark plan embeds.

from mitie_spark.operators.sketch import (  # noqa: E402
    HLL_EST_NUM as _HLL_NUM,
    HLL_LC_TABLE as _HLL_LC,
    HLL_M as _HLL_M,
    HLL_RHO_MAX as _HLL_RHO_MAX,
)

_HLL_W = 1 << (_HLL_RHO_MAX - 1)
_HLL_EMPTY = 1 << _HLL_RHO_MAX
_HLL_ARR = "[" + ",".join(map(str, _HLL_LC)) + "]"

LOCAL_ORACLES["hll_distinct_tokens"] = f"""
WITH toks AS (
  SELECT source,
         unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
  FROM documents
),
grp AS (
  SELECT source, token FROM toks
  UNION ALL
  SELECT '__all__' AS source, token FROM toks
),
dist AS (SELECT DISTINCT source, token FROM grp),
h AS (
  SELECT source, ('0x' || substr(md5(token),1,8))::BIGINT AS h32 FROM dist
),
reg AS (
  SELECT source, h32 // {_HLL_W} AS bucket,
         MAX(CASE WHEN h32 % {_HLL_W} = 0 THEN {_HLL_RHO_MAX}
                  ELSE {_HLL_RHO_MAX} - length(bin(h32 % {_HLL_W})) END) AS rho
  FROM h GROUP BY source, h32 // {_HLL_W}
),
s AS (
  SELECT source,
         SUM(1::BIGINT << ({_HLL_RHO_MAX} - rho))
           + ({_HLL_M} - COUNT(*)) * {_HLL_EMPTY} AS s_int,
         {_HLL_M} - COUNT(*) AS v_zero
  FROM reg GROUP BY source
),
est AS (
  SELECT source, v_zero,
         {_HLL_NUM} // (1000000 * s_int) AS hll_raw,
         CASE WHEN {_HLL_NUM} // (1000000 * s_int) <= {5 * _HLL_M // 2}
                   AND v_zero > 0
              THEN ({_HLL_ARR})[v_zero]
              ELSE {_HLL_NUM} // (1000000 * s_int) END AS hll_est
  FROM s
),
ex AS (SELECT source, COUNT(DISTINCT token) AS n_exact FROM dist GROUP BY source)
SELECT ex.source, ex.n_exact,
       CAST(est.v_zero AS BIGINT) AS n_zero_buckets,
       CAST(est.hll_raw AS BIGINT) AS hll_raw,
       CAST(est.hll_est AS BIGINT) AS hll_est
FROM ex JOIN est USING (source)
"""


# BM25 gate (query in queries_pipeline.py) — same integer rational form,
# same term set, same ppm-floored idf.

from mitie_spark.queries_pipeline import BM25_TERMS as _BM25_TERMS  # noqa: E402

_BM25_IN = "(" + ",".join(f"'{t}'" for t in _BM25_TERMS) + ")"

LOCAL_ORACLES["bm25_doc_ranking"] = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
  FROM documents
),
nn AS (SELECT COUNT(*) AS n FROM documents),
aa AS (SELECT COUNT(*) AS a FROM toks),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM toks
  WHERE token IN {_BM25_IN} GROUP BY doc_id, token
),
dfreq AS (
  SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks
  WHERE token IN {_BM25_IN} GROUP BY token
),
idf AS (
  SELECT token,
         CAST(FLOOR(ln((nn.n - df + 0.5) / (df + 0.5) + 1) * 1000000)
              AS BIGINT) AS idf_ppm
  FROM dfreq CROSS JOIN nn
),
term AS (
  SELECT tf.doc_id,
         idf.idf_ppm * ((44 * tf.tf * aa.a * 1000)
            // (20 * aa.a * tf.tf + 6 * aa.a + 18 * nn.n * dl.dl)) AS w
  FROM tf JOIN dl USING (doc_id) JOIN idf USING (token)
  CROSS JOIN aa CROSS JOIN nn
)
SELECT doc_id, CAST(SUM(w) AS BIGINT) AS bm25_p9
FROM term GROUP BY doc_id
ORDER BY bm25_p9 DESC, doc_id LIMIT 50
"""


# ---------------------------------------------------------------------------
# Host-graph triangles + local clustering coefficient.
# ---------------------------------------------------------------------------


@query("web_host_triangles")
def web_host_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counts and local clustering coefficient per host, exact
    integers (coefficient in ppm) — the standard cohesion analytics over
    the link graph. See operators/webgraph.triangle_clustering for the
    ordered-wedge enumeration and plan shape."""
    from mitie_spark.operators.webgraph import triangle_clustering

    return triangle_clustering(_edges(spark, sf_dir)).select(
        F.col("node").alias("host"),
        "degree",
        "n_triangles",
        "clustering_ppm",
    )


LOCAL_ORACLES["web_host_triangles"] = f"""
WITH {_EDGES_CTES},
und AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM edges WHERE src <> dst
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM und e1
  JOIN und e2 ON e1.v = e2.u
  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
),
pn AS (
  SELECT node, COUNT(*) AS n_triangles
  FROM (SELECT unnest([a, b, c]) AS node FROM tri) GROUP BY node
),
deg AS (
  SELECT node, COUNT(*) AS degree
  FROM (SELECT u AS node FROM und UNION ALL SELECT v FROM und)
  GROUP BY node
)
SELECT deg.node AS host, deg.degree,
       CAST(COALESCE(pn.n_triangles, 0) AS BIGINT) AS n_triangles,
       CAST(CASE WHEN deg.degree < 2 THEN 0
                 ELSE (2 * COALESCE(pn.n_triangles, 0) * 1000000)
                      // (deg.degree * (deg.degree - 1)) END
            AS BIGINT) AS clustering_ppm
FROM deg LEFT JOIN pn USING (node)
"""


# ---------------------------------------------------------------------------
# Property-path closure over the host graph + the BGP/OPTIONAL gate.
# ---------------------------------------------------------------------------

_CLOSURE_DEPTH = 3


@query("web_host_reach_closure")
def web_host_reach_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive reachability (links_to+) over the host graph within 3
    hops, min hop count per pair — operators/kgquery.transitive_closure
    (frontier-delta iteration) under the full value-hash gate, mirrored
    by a depth-bounded DuckDB recursive CTE whose MIN(depth) rollup
    states the same first-discovery semantics."""
    from mitie_spark.operators.kgquery import transitive_closure

    t = _edges(spark, sf_dir).select(
        F.col("src").alias("subj"),
        F.lit("links_to").alias("pred"),
        F.col("dst").alias("obj"),
    )
    return transitive_closure(t, "links_to", max_depth=_CLOSURE_DEPTH)


LOCAL_ORACLES["web_host_reach_closure"] = f"""
WITH RECURSIVE {_EDGES_CTES},
paths(src, dst, depth) AS (
  SELECT src, dst, 1 FROM edges
  UNION
  SELECT p.src, e.dst, p.depth + 1
  FROM paths p JOIN edges e ON p.dst = e.src
  WHERE p.depth < {_CLOSURE_DEPTH}
)
SELECT src, dst, CAST(MIN(depth) AS INT) AS depth
FROM paths GROUP BY src, dst
"""

LOCAL_ORACLES["kg_bgp_person_org"] = f"""
WITH t AS (
  SELECT DISTINCT subj, pred, obj
  FROM read_parquet('{_ORACLE_KG}/triples_true.parquet')
),
born AS (SELECT subj AS person, obj AS city FROM t WHERE pred = 'born_in'),
cont AS (SELECT subj AS country, obj AS city FROM t WHERE pred = 'contains'),
works AS (SELECT subj AS person, obj AS org FROM t WHERE pred = 'works_for')
SELECT b.person, b.city, c.country, w.org
FROM born b
JOIN cont c ON b.city = c.city
LEFT JOIN works w ON w.person = b.person
"""


# PIVOT gate (query in queries_wordrep.py) — conditional-aggregation
# mirror of the explicit-value-list pivot.

from mitie_spark.queries_wordrep import _PIVOT_TYPES as _PVT  # noqa: E402

_PVT_COLS = ",\n       ".join(
    f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
    f" AS n_{t}"
    for t in _PVT
)

LOCAL_ORACLES["events_pivot_daily"] = f"""
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       {_PVT_COLS}
FROM events
GROUP BY CAST(ts AS DATE)
"""


# ---------------------------------------------------------------------------
# Label-propagation communities over the host graph.
# ---------------------------------------------------------------------------

_LPA_ITERS = 2


def _lpa_ctes(iters: int = _LPA_ITERS) -> str:
    """sym/l0..l{iters} CTEs of the synchronous deterministic LPA
    (mirrors operators/webgraph.label_propagation term for term)."""
    parts = [
        """sym AS (
  SELECT node, neigh, CAST(SUM(w) AS BIGINT) AS w FROM (
    SELECT src AS node, dst AS neigh, w FROM edges WHERE src <> dst
    UNION ALL
    SELECT dst AS node, src AS neigh, w FROM edges WHERE src <> dst
  ) GROUP BY node, neigh)""",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "l0 AS (SELECT node, node AS label FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""c{i} AS (
  SELECT s.node, l.label, SUM(s.w) AS c
  FROM sym s JOIN l{i - 1} l ON l.node = s.neigh
  GROUP BY s.node, l.label)"""
        )
        parts.append(
            f"""t{i} AS (
  SELECT node, label AS new_label FROM (
    SELECT node, label,
           ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn
    FROM c{i})
  WHERE rn = 1)"""
        )
        parts.append(
            f"""l{i} AS (
  SELECT n.node, COALESCE(t{i}.new_label, l{i - 1}.label) AS label
  FROM nodes n JOIN l{i - 1} ON l{i - 1}.node = n.node
  LEFT JOIN t{i} ON t{i}.node = n.node)"""
        )
    return ",\n".join(parts)


@query("web_host_communities")
def web_host_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the host graph: synchronous
    label-propagation with a deterministic count-DESC/label-ASC
    tie-break, 2 fixed passes — an LPA that passes the full value-hash
    gate (classic async LPA is run-order dependent and cannot be
    mirrored). See operators/webgraph.label_propagation."""
    from mitie_spark.operators.webgraph import label_propagation

    return label_propagation(_edges(spark, sf_dir), iters=_LPA_ITERS).select(
        F.col("node").alias("host"), F.col("label").alias("community")
    )


LOCAL_ORACLES["web_host_communities"] = f"""
WITH {_EDGES_CTES},
{_lpa_ctes()}
SELECT node AS host, label AS community FROM l{_LPA_ITERS}
"""


# ---------------------------------------------------------------------------
# k-core membership over the host graph.
# ---------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 4


def _kcore_ctes(k: int = _KCORE_K, rounds: int = _KCORE_ROUNDS) -> str:
    """sym/a0..a{rounds} CTEs of the fixed-round k-core peel (mirrors
    operators/webgraph.kcore_flags term for term)."""
    parts = [
        """sym AS (
  SELECT DISTINCT node, neigh FROM (
    SELECT src AS node, dst AS neigh FROM edges WHERE src <> dst
    UNION ALL
    SELECT dst AS node, src AS neigh FROM edges WHERE src <> dst
  ))""",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "a0 AS (SELECT node FROM nodes)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""a{i} AS (
  SELECT s.node FROM sym s
  JOIN a{i - 1} x ON x.node = s.node
  JOIN a{i - 1} y ON y.node = s.neigh
  GROUP BY s.node HAVING COUNT(*) >= {k})"""
        )
    return ",\n".join(parts)


@query("web_host_kcore")
def web_host_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core membership + in-core degree per host (the classic
    link-spam / community-strength structural signal), fixed-round
    synchronous peeling under the full value-hash gate — see
    operators/webgraph.kcore_flags."""
    from mitie_spark.operators.webgraph import kcore_flags

    return kcore_flags(
        _edges(spark, sf_dir), k=_KCORE_K, rounds=_KCORE_ROUNDS
    ).select(F.col("node").alias("host"), "in_kcore", "core_degree")


LOCAL_ORACLES["web_host_kcore"] = f"""
WITH {_EDGES_CTES},
{_kcore_ctes()},
degf AS (
  SELECT s.node, CAST(COUNT(*) AS BIGINT) AS core_degree
  FROM sym s
  JOIN a{_KCORE_ROUNDS} x ON x.node = s.node
  JOIN a{_KCORE_ROUNDS} y ON y.node = s.neigh
  GROUP BY s.node)
SELECT n.node AS host,
       CAST(CASE WHEN a.node IS NULL THEN 0 ELSE 1 END AS INT) AS in_kcore,
       COALESCE(degf.core_degree, 0) AS core_degree
FROM nodes n
LEFT JOIN a{_KCORE_ROUNDS} a ON a.node = n.node
LEFT JOIN degf ON degf.node = n.node
"""


# KMV bottom-k Jaccard gate (query in queries_wordrep.py).

from mitie_spark.queries_wordrep import _KMV_K as _KMV  # noqa: E402

LOCAL_ORACLES["source_vocab_jaccard_kmv"] = f"""
WITH toks AS (
  SELECT source,
         unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS token
  FROM documents
),
h AS (
  SELECT DISTINCT source,
         ('0x' || substr(md5(token),1,8))::BIGINT AS hv
  FROM toks
),
sig AS (
  SELECT source, hv FROM (
    SELECT source, hv,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv) AS rn
    FROM h)
  WHERE rn <= {_KMV}
),
sizes AS (SELECT source, COUNT(*) AS n_sig FROM sig GROUP BY source),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared
  FROM sig a JOIN sig b ON a.hv = b.hv AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT p.source_a, p.source_b, p.n_shared,
       (p.n_shared * 1000000) // (sa.n_sig + sb.n_sig - p.n_shared)
         AS jaccard_ppm
FROM pairs p
JOIN sizes sa ON sa.source = p.source_a
JOIN sizes sb ON sb.source = p.source_b
"""
