"""WET / WAT sidecar archives (the Common-Crawl artifact family).

A real CC release ships three artifacts per crawl segment: the raw
``.warc.gz`` (sources/warc.py), the extracted-text ``.wet.gz``
(WARC *conversion* records, text/plain payloads), and the metadata
``.wat.gz`` (WARC *metadata* records whose payload is a JSON envelope
of head metadata + outlinks). Pipelines that consume CC usually start
from WET (text) and WAT (link graph) rather than re-parsing raw HTML —
so emitting and reading both makes this engine a drop-in on either side
of that ecosystem.

Record framing reuses the WARC/1.0 grammar of sources/warc.py
(header block, Content-Length payload, two CRLFs, optional per-record
gzip members). The WAT JSON follows the published WAT structure
(Envelope → Payload-Metadata → HTML-Metadata → {Head, Links}) for the
fields this engine produces: page title and the absolute outlinks with
their anchor texts (operators/webgraph.ANCHOR_RE — the same extraction
the link-graph queries gate).

Scale shape: pack and parse are narrow Arrow passes (the
warc_http_ingest shape); reading the link graph back from WAT is
record-parse (Python, bounded by record framing) + get_json_object
(JVM) + one groupBy — the same plan as extracting from raw HTML.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F

from mitie_spark.sources.warc import (
    frame_warc_records,
    gunzip_members,
    iter_warc_records,
)

__all__ = [
    "parse_wat_bytes",
    "parse_wet_bytes",
    "wat_link_edges",
    "pages_to_wat_records",
    "write_wat",
    "write_wet",
]


def _write_records(records: list[tuple[list[bytes], bytes]], gzip_members: bool) -> bytes:
    return frame_warc_records(records, gzip_members=gzip_members)


def write_wet(records: list[dict], *, gzip_members: bool = False) -> bytes:
    """records: [{url, warc_ts, text}] → WET bytes (conversion records)."""
    recs = []
    for r in records:
        payload = (r["text"] or "").encode("utf-8")
        recs.append(
            (
                [
                    b"WARC/1.0",
                    b"WARC-Type: conversion",
                    b"WARC-Target-URI: " + r["url"].encode("utf-8"),
                    b"WARC-Date: " + r["warc_ts"].encode("ascii"),
                    b"Content-Type: text/plain",
                    b"Content-Length: " + str(len(payload)).encode("ascii"),
                ],
                payload,
            )
        )
    return _write_records(recs, gzip_members)


def write_wat(records: list[dict], *, gzip_members: bool = False) -> bytes:
    """records: [{url, warc_ts, title, links: [{url, text}]}] → WAT bytes
    (metadata records with the published JSON envelope shape)."""
    recs = []
    for r in records:
        envelope = {
            "Envelope": {
                "WARC-Header-Metadata": {
                    "WARC-Target-URI": r["url"],
                    "WARC-Date": r["warc_ts"],
                    "WARC-Type": "response",
                },
                "Payload-Metadata": {
                    "HTTP-Response-Metadata": {
                        "HTML-Metadata": {
                            "Head": {"Title": r.get("title") or ""},
                            "Links": [
                                {"path": "A@/href", "url": l["url"], "text": l.get("text", "")}
                                for l in r.get("links", [])
                            ],
                        }
                    }
                },
            }
        }
        payload = json.dumps(envelope, separators=(",", ":")).encode("utf-8")
        recs.append(
            (
                [
                    b"WARC/1.0",
                    b"WARC-Type: metadata",
                    b"WARC-Target-URI: " + r["url"].encode("utf-8"),
                    b"WARC-Date: " + r["warc_ts"].encode("ascii"),
                    b"Content-Type: application/json",
                    b"Content-Length: " + str(len(payload)).encode("ascii"),
                ],
                payload,
            )
        )
    return _write_records(recs, gzip_members)


def _parse_records(blob: bytes, want_type: str) -> list[tuple[str, str, bytes]]:
    """warc.iter_warc_records walk selecting one record type (the
    review-deduplicated shared grammar); gzip members sniffed here
    because WET/WAT blobs arrive whole, not pre-gunzipped."""
    if blob[:2] == b"\x1f\x8b":
        blob = gunzip_members(blob)
    return [
        (
            fields.get("warc-target-uri", ""),
            fields.get("warc-date", ""),
            payload,
        )
        for fields, payload in iter_warc_records(blob)
        if fields.get("warc-type") == want_type
    ]


def parse_wet_bytes(blob: bytes) -> list[tuple[str, str, str]]:
    """WET bytes → [(url, date, text)] from conversion records."""
    return [
        (url, date, payload.decode("utf-8", "replace"))
        for url, date, payload in _parse_records(blob, "conversion")
    ]


def parse_wat_bytes(blob: bytes) -> list[tuple[str, str, str]]:
    """WAT bytes → [(url, date, envelope_json_str)] from metadata
    records; JSON field extraction stays JVM-side (get_json_object)."""
    return [
        (url, date, payload.decode("utf-8", "replace"))
        for url, date, payload in _parse_records(blob, "metadata")
    ]


# ---------------------------------------------------------------------------
# Spark surfaces
# ---------------------------------------------------------------------------


def pages_to_wat_records(pages: DataFrame) -> DataFrame:
    """pages (url, html[, warc_ts]) → per-page WAT-record fields
    (url, warc_ts, title, links array) with all extraction JVM-side —
    title regexp + the paired ANCHOR_RE host/text extraction the
    link-graph queries gate. One narrow projection."""
    from mitie_spark.operators.webgraph import WAT_LINK_RE as link_re

    html = F.col("html").cast("string")
    cols = [
        F.col("url"),
        (
            F.col("warc_ts").cast("string")
            if "warc_ts" in pages.columns
            else F.lit("2024-01-01T00:00:00Z")
        ).alias("warc_ts"),
        F.regexp_extract(html, r"<title>([^<]*)</title>", 1).alias("title"),
        F.arrays_zip(
            F.regexp_extract_all(html, F.lit(link_re), 1).alias("url"),
            F.regexp_extract_all(html, F.lit(link_re), 2).alias("text"),
        ).alias("links"),
    ]
    return pages.select(*cols)


def wat_link_edges(wat_archives: DataFrame, content_col: str = "content") -> DataFrame:
    """WAT archive blobs → (src_host, dst_host) link rows, one per
    outlink: record walk in an Arrow pass, JSON fields via JVM
    get_json_object / explode — never a Python JSON loop per link."""
    import pandas as pd

    def parse(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            urls, dates, envs = [], [], []
            for blob in pdf[content_col]:
                for url, date, env in parse_wat_bytes(bytes(blob)):
                    urls.append(url)
                    dates.append(date)
                    envs.append(env)
            yield pd.DataFrame({"url": urls, "warc_date": dates, "envelope": envs})

    recs = wat_archives.mapInPandas(parse, "url string, warc_date string, envelope string")
    links = recs.select(
        F.parse_url("url", F.lit("HOST")).alias("src_host"),
        F.explode(
            F.from_json(
                F.get_json_object(
                    "envelope",
                    "$['Envelope']['Payload-Metadata']"
                    "['HTTP-Response-Metadata']['HTML-Metadata']['Links']",
                ),
                "array<struct<path:string,url:string,text:string>>",
            )
        ).alias("l"),
    )
    return links.select(
        "src_host", F.parse_url("l.url", F.lit("HOST")).alias("dst_host")
    )
