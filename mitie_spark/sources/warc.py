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

import zlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from .brotli import decode_brotli
from .zstd import decode_zstd

PAGES_SCHEMA = "url:string,warc_ts:timestamp,html:binary"

_CRLF = b"\r\n"


def gunzip_members(blob: bytes, max_out: int = 1 << 31) -> bytes:
    """Concatenated-gzip-member stream (.warc.gz stores one member per
    record; HTTP gzip bodies may also concatenate) → raw bytes.
    Damage policy: a corrupt or truncated member keeps everything
    decoded so far (members 1..k-1 plus the broken member's decodable
    prefix) — a cut connection should not discard the intact records
    before it.  Raises ValueError only when NOTHING decodes (so callers
    can fall back to the raw bytes) or when output exceeds max_out
    (decompression-bomb guard)."""
    out = []
    total = 0
    pos = 0
    n = len(blob)
    mv = memoryview(blob)  # O(1) suffix slices: a 1 GB member-per-record
    # archive must not memcpy its remaining suffix once per member
    while pos < n and blob[pos : pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            chunk = d.decompress(mv[pos:], max_out - total + 1)
        except zlib.error:
            if not out:
                raise ValueError("corrupt gzip member") from None
            break  # keep the intact earlier members
        total += len(chunk)
        if total > max_out:
            raise ValueError("gzip output exceeds max_out")
        out.append(chunk)
        if not d.eof:
            break  # truncated tail member: keep its decoded prefix
        pos = n - len(d.unused_data)
    if not out:
        raise ValueError("not a gzip archive")
    return b"".join(out)


def _dechunk(body: bytes) -> bytes | None:
    """Transfer-Encoding: chunked → payload bytes, or None if malformed
    (caller falls back to the raw body). Chunk extensions after ';' and
    trailer headers are ignored per RFC 9112."""
    out = []
    pos = 0
    n = len(body)
    while True:
        eol = body.find(_CRLF, pos)
        if eol < 0:
            return None
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        # strict hex only: int(x, 16) would accept '0x5'/'+5'/'1_0'
        # forms real HTTP parsers reject, silently mis-framing bodies
        if not size_tok or any(
            c not in b"0123456789abcdefABCDEF" for c in size_tok
        ):
            return None
        size = int(size_tok, 16)
        pos = eol + 2
        if size == 0:
            return b"".join(out)  # trailers (if any) ignored
        if pos + size > n:
            return None
        out.append(body[pos : pos + size])
        pos += size
        if body[pos : pos + 2] != _CRLF:
            return None
        pos += 2


def _decode_content(body: bytes, encoding: str) -> bytes | None:
    """Content-Encoding → decoded bytes, or None if undecodable (caller
    keeps the raw body rather than dropping the record). Handles RFC
    9110 coding LISTS ("gzip, br" = gzip applied first, br second) by
    undoing the layers in reverse; all-or-nothing — one undecodable
    layer degrades to the original raw body."""
    enc = encoding.strip().lower()
    if "," in enc:
        for layer in reversed(enc.split(",")):
            body2 = _decode_content(body, layer)
            if body2 is None:
                return None
            body = body2
        return body
    try:
        if enc in ("", "identity", "none"):
            return body
        if enc in ("gzip", "x-gzip"):
            # member walk with keep-prefix damage policy + bomb cap
            return gunzip_members(body, max_out=1 << 28)
        if enc == "deflate":
            # servers send both zlib-wrapped and raw-deflate bodies;
            # bound the output either way (bomb guard, matching br/zstd)
            for wbits in (zlib.MAX_WBITS, -zlib.MAX_WBITS):
                d = zlib.decompressobj(wbits)
                try:
                    out = d.decompress(body, (1 << 28) + 1)
                except zlib.error:
                    continue
                if len(out) > 1 << 28:
                    return None
                return out
            return None
        if enc == "br":
            return decode_brotli(body, max_out=1 << 28)
        if enc == "zstd":
            return decode_zstd(body, max_out=1 << 28)
    except (zlib.error, ValueError, EOFError):
        # ValueError covers gunzip_members plus BrotliError/ZstdError
        return None
    return None  # unknown encoding (compress, sdch, etc.)


def strip_http_envelope(payload: bytes) -> bytes:
    """Full HTTP response (status line + headers + body) → document
    bytes, applying Transfer-Encoding: chunked and Content-Encoding:
    gzip/x-gzip/deflate/br/zstd — the envelope a real Common-Crawl
    response record actually carries. Non-HTTP payloads pass through
    unchanged; undecodable layers degrade to the raw body (record
    kept)."""
    if not payload.startswith(b"HTTP/"):
        return payload
    body_at = payload.find(_CRLF + _CRLF)
    if body_at < 0:
        return payload
    head = payload[:body_at].decode("latin-1", "replace")
    body = payload[body_at + 4 :]
    te = ce = ""
    for line in head.split("\r\n")[1:]:
        k, _, v = line.partition(":")
        k = k.strip().lower()
        v = v.strip().lower()
        # RFC 9110 §5.3: repeated header lines combine into a list
        if k == "transfer-encoding":
            te = f"{te},{v}" if te else v
        elif k == "content-encoding":
            ce = f"{ce},{v}" if ce else v
    te_codings = [t.strip() for t in te.split(",") if t.strip()]
    if "chunked" in te_codings:
        dechunked = _dechunk(body)
        if dechunked is not None:
            body = dechunked
        te_codings.remove("chunked")
    if te_codings:
        # 'Transfer-Encoding: gzip, chunked' leaves a gzip layer after
        # dechunking; undo it like a Content-Encoding list
        decoded = _decode_content(body, ",".join(te_codings))
        if decoded is not None:
            body = decoded
    if ce:
        decoded = _decode_content(body, ce)
        if decoded is not None:
            body = decoded
    return body


def write_http_response(
    body: bytes,
    *,
    content_encoding: str | None = None,
    chunked: bool = False,
    chunk: int = 4096,
) -> bytes:
    """Synthesize the HTTP response envelope a real crawl record carries:
    status line + headers + body, optionally Content-Encoding'd
    (gzip/deflate/br/zstd — br and zstd use the store-mode encoders,
    so the round-trip is self-contained) and/or Transfer-Encoding:
    chunked. Round-trip partner of strip_http_envelope."""
    headers = [b"HTTP/1.1 200 OK", b"Content-Type: text/html; charset=UTF-8"]
    if content_encoding == "gzip":
        co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
        body = co.compress(body) + co.flush()
        headers.append(b"Content-Encoding: gzip")
    elif content_encoding == "deflate":
        body = zlib.compress(body)
        headers.append(b"Content-Encoding: deflate")
    elif content_encoding == "br":
        from .brotli import encode_brotli_store

        body = encode_brotli_store(body)
        headers.append(b"Content-Encoding: br")
    elif content_encoding == "zstd":
        from .zstd import encode_zstd_store

        body = encode_zstd_store(body)
        headers.append(b"Content-Encoding: zstd")
    elif content_encoding:
        raise ValueError(f"unsupported encoding {content_encoding!r}")
    if chunked:
        headers.append(b"Transfer-Encoding: chunked")
        parts = []
        for i in range(0, len(body), chunk):
            piece = body[i : i + chunk]
            parts.append(b"%x" % len(piece) + _CRLF + piece + _CRLF)
        parts.append(b"0" + _CRLF + _CRLF)
        body = b"".join(parts)
    else:
        headers.append(b"Content-Length: " + str(len(body)).encode("ascii"))
    return _CRLF.join(headers) + _CRLF + _CRLF + body


def frame_warc_records(
    records: list[tuple[list[bytes], bytes]], *, gzip_members: bool = False
) -> bytes:
    """[(header_lines, payload)] → framed WARC bytes (ISO 28500: header
    block, blank line, payload, two CRLFs). With gzip_members=True each
    record becomes its own gzip member — the Common-Crawl .warc.gz
    framing gunzip_members undoes. Shared by write_warc and the WET/WAT
    writers (sources/wet_wat.py)."""
    out = []
    for headers, payload in records:
        rec = _CRLF.join(headers) + _CRLF + _CRLF + payload + _CRLF + _CRLF
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
            rec = co.compress(rec) + co.flush()
        out.append(rec)
    return b"".join(out)


def write_warc(records: list[dict], *, gzip_members: bool = False) -> bytes:
    """records: [{url, warc_ts (ISO str), html (bytes)}] → WARC/1.0 bytes.
    Response records only; headers cover what the parser reads."""
    framed = []
    for r in records:
        payload = r["html"]
        framed.append(
            (
                [
                    b"WARC/1.0",
                    b"WARC-Type: response",
                    b"WARC-Target-URI: " + r["url"].encode("utf-8"),
                    b"WARC-Date: " + r["warc_ts"].encode("ascii"),
                    b"Content-Length: " + str(len(payload)).encode("ascii"),
                ],
                payload,
            )
        )
    return frame_warc_records(framed, gzip_members=gzip_members)


def _resync(blob: bytes, i: int) -> int:
    """Index of the next record marker after ``i``, or -1."""
    return blob.find(b"WARC/1.", i + 1)


def iter_warc_records(blob: bytes):
    """Yield (fields, payload) per WARC/1.0 record — the shared record
    walk under parse_warc_bytes and the WET/WAT readers.

    Record grammar (ISO 28500): header block terminated by a blank line,
    payload of exactly Content-Length bytes, then two CRLFs. Records with
    corrupt headers (unparseable or NEGATIVE Content-Length — a negative
    value would walk the cursor backward, and a crafted record can pin it
    at a fixed point, hanging the task) are skipped by resyncing to the
    next ``WARC/1.`` marker."""
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
            nxt = _resync(blob, i)
            if nxt < 0:
                break
            i = nxt
            continue
        yield fields, blob[head_end + 4 : head_end + 4 + length]
        i = head_end + 4 + length + 4  # payload + two record-ending CRLFs


def parse_warc_bytes(blob: bytes) -> list[tuple[str, str, bytes]]:
    """WARC/1.0 bytes → [(url, warc_date, html_payload)] for responses.

    Non-response records (warcinfo, request, metadata) are skipped by
    type. Real Common-Crawl response records carry a FULL HTTP response
    as the payload (Content-Type: application/http;msgtype=response —
    status line + headers + body); the HTTP header block is stripped so
    the returned payload is the document itself. Bare payloads (no HTTP/
    status line) pass through unchanged."""
    recs = []
    for fields, payload in iter_warc_records(blob):
        if fields.get("warc-type") == "response":
            # application/http payload: strip the status line + headers
            # and undo Transfer-Encoding / Content-Encoding (chunked,
            # gzip, deflate, brotli) — the envelope real crawls store.
            recs.append(
                (
                    fields.get("warc-target-uri", ""),
                    fields.get("warc-date", ""),
                    strip_http_envelope(payload),
                )
            )
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
                raw = bytes(blob or b"")
                if raw[:2] == b"\x1f\x8b":  # .warc.gz member framing
                    try:
                        raw = gunzip_members(raw)
                    except (ValueError, zlib.error):
                        continue  # corrupt archive blob: skip, task lives
                for url, ts, payload in parse_warc_bytes(raw):
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
