"""WARC source — Common-Crawl's native archive format → pages rows.

The graft's input table is Common-Crawl-style pages (`url, warc_ts, html,
text, lang`); this module provides the ingestion edge: parse WARC/1.0
response records out of raw archive bytes into page rows, as an
Arrow-batched DataFrame stage. Reference analog: the gigaword XML corpus
reader (/root/reference/mitielib/include/mitie/gigaword_reader.h:18-250) —
same shape, a record-delimited archive stream parsed into documents.

Scale design: real CC archives are gzip-member-per-record, so a 1 GB .warc.gz
splits at member boundaries; here the unit of distribution is one archive
blob per row (`spark.read.format("binaryFile")` or a manifest of byte
ranges), and parsing is a narrow mapInPandas — no shuffle until the pages
table is written.

A minimal writer is included so tests can synthesize archives; it emits the
same headers the parser consumes (round-trip golden-tested).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

PAGES_SCHEMA = "url:string,warc_ts:timestamp,html:binary"

_CRLF = b"\r\n"


def write_warc(records: list[dict]) -> bytes:
    """records: [{url, warc_ts (ISO str), html (bytes)}] → WARC/1.0 bytes.
    Response records only; headers cover what the parser reads."""
    out = []
    for r in records:
        payload = r["html"]
        headers = [
            b"WARC/1.0",
            b"WARC-Type: response",
            b"WARC-Target-URI: " + r["url"].encode("utf-8"),
            b"WARC-Date: " + r["warc_ts"].encode("ascii"),
            b"Content-Length: " + str(len(payload)).encode("ascii"),
        ]
        out.append(
            _CRLF.join(headers) + _CRLF + _CRLF + payload + _CRLF + _CRLF
        )
    return b"".join(out)


def _resync(blob: bytes, i: int) -> int:
    """Index of the next record marker after ``i``, or -1."""
    return blob.find(b"WARC/1.", i + 1)


def parse_warc_bytes(blob: bytes) -> list[tuple[str, str, bytes]]:
    """WARC/1.0 bytes → [(url, warc_date, html_payload)] for responses.

    Record grammar (ISO 28500): header block terminated by a blank line,
    payload of exactly Content-Length bytes, then two CRLFs. Non-response
    records (warcinfo, request, metadata) are skipped by type; records with
    corrupt headers (unparseable Content-Length, missing markers) are
    skipped by resyncing to the next ``WARC/1.`` marker.

    Real Common-Crawl response records carry a FULL HTTP response as the
    payload (Content-Type: application/http;msgtype=response — status line
    + headers + body); the HTTP header block is stripped so the returned
    payload is the document itself. Bare payloads (no HTTP/ status line)
    pass through unchanged."""
    recs = []
    i = 0
    n = len(blob)
    while i < n:
        head_end = blob.find(_CRLF + _CRLF, i)
        if head_end < 0:
            break
        head = blob[i:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            nxt = _resync(blob, i)
            if nxt < 0:
                break
            i = nxt
            continue
        fields = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields.get("content-length", "0"))
        except ValueError:
            length = -1
        if length < 0:
            # damaged header (unparseable or negative Content-Length —
            # a negative value would walk `i` BACKWARD below, and a
            # crafted record can pin it at a fixed point, hanging the
            # task): skip this record, keep the task alive
            nxt = _resync(blob, i)
            if nxt < 0:
                break
            i = nxt
            continue
        payload = blob[head_end + 4 : head_end + 4 + length]
        if fields.get("warc-type") == "response":
            if payload.startswith(b"HTTP/"):
                # application/http payload: strip the HTTP response headers
                body_at = payload.find(_CRLF + _CRLF)
                if body_at >= 0:
                    payload = payload[body_at + 4 :]
            recs.append(
                (
                    fields.get("warc-target-uri", ""),
                    fields.get("warc-date", ""),
                    payload,
                )
            )
        i = head_end + 4 + length + 4  # payload + two record-ending CRLFs
    return recs


def warc_to_pages(archives: DataFrame, content_col: str = "content") -> DataFrame:
    """archives(…, content: binary) → (url, warc_ts, html) page rows.

    Use with `spark.read.format("binaryFile").load(dir)` (column `content`)
    or any DataFrame carrying one archive blob per row. Narrow stage: one
    Arrow pass, rows multiply only within a task."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls: list = []
            tss: list = []
            htmls: list = []
            for blob in pdf[content_col]:
                for url, ts, payload in parse_warc_bytes(bytes(blob or b"")):
                    urls.append(url)
                    tss.append(ts)
                    htmls.append(payload)
            # tz-aware UTC series: Arrow preserves the instant. Stripping
            # the tz (tz_localize(None)) would make Spark reinterpret the
            # wall-clock in the session timezone, shifting warc_ts by the
            # session's UTC offset on non-UTC clusters.
            yield pd.DataFrame(
                {
                    "url": urls,
                    "warc_ts": pd.to_datetime(
                        pd.Series(tss, dtype="object"), utc=True, errors="coerce"
                    ),
                    "html": htmls,
                }
            )

    return archives.select(content_col).mapInPandas(run, schema=PAGES_SCHEMA)
