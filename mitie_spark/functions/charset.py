"""Charset detection + decoding for crawled payloads.

A real crawl is not UTF-8: legacy pages arrive in windows-1252,
Shift_JIS, GBK, UTF-16 … and feeding them to a UTF-8 decoder produces
replacement-character mojibake that poisons every downstream text stage
(tokenize, dedup shingles, quality scores).  This implements the
WHATWG encoding-sniffing order browsers use (Encoding Standard §
"determine the character encoding"):

1. **BOM** (UTF-8 / UTF-16 / UTF-32, either endianness) — overrides all;
2. the transport-layer **Content-Type charset** parameter;
3. a ``<meta charset=…>`` / ``<meta http-equiv=Content-Type …>``
   declaration in the first 1024 bytes (scanned as ASCII-superset
   bytes, the standard prescan);
4. strict UTF-8 trial decode (valid UTF-8 is self-identifying);
5. windows-1252 fallback — WHATWG's mandated default, and deliberately
   also the alias target for latin-1/ascii labels (real pages labelled
   iso-8859-1 use the cp1252 C1 range).

Decoding itself is stdlib ``codecs`` — the OPERATOR here is the
detection policy and its Spark surface, not a from-scratch codec (the
container has every legacy codec built in; re-porting them would be
engineering theater).  Unknown or broken labels fall through to the
next rule; byte errors under the chosen codec are replaced, never
raised — one hostile page must not kill a corpus-scale task.

Reference parity note: the reference engine (mit-nlp/MITIE) consumes
pre-decoded text; this belongs to the web-ingest surface the build adds.

Scale shape: per-payload bounded work (1 KiB prescan + one decode pass)
inside Arrow ``mapInPandas``; no shuffle, no collect.
"""

from __future__ import annotations

import codecs
import re

from pyspark.sql import DataFrame

__all__ = ["detect_encoding", "decode_payload", "decode_payloads"]

#: BOM table — UTF-32 first: its LE BOM starts with the UTF-16 LE BOM
_BOMS = (
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF8, "utf-8"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)

#: WHATWG-style label normalization (subset covering the labels that
#: dominate real crawls); latin-1-family labels map to cp1252 per spec
_ALIASES = {
    "latin-1": "cp1252",
    "latin1": "cp1252",
    "iso-8859-1": "cp1252",
    "iso8859-1": "cp1252",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
    "ascii": "cp1252",
    "us-ascii": "cp1252",
    "utf8": "utf-8",
    "utf-8": "utf-8",
    "utf-16": "utf-16",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
    "shift-jis": "shift_jis",
    "shift_jis": "shift_jis",
    "sjis": "shift_jis",
    "x-sjis": "shift_jis",
    "ms_kanji": "shift_jis",
    "gb2312": "gbk",
    "gbk": "gbk",
    "gb18030": "gb18030",
    "big5": "big5",
    "euc-jp": "euc_jp",
    "euc-kr": "euc_kr",
    "koi8-r": "koi8_r",
    "windows-1251": "cp1251",
    "iso-8859-2": "iso8859-2",
    "iso-8859-15": "iso8859-15",
}

_META_CHARSET_RE = re.compile(
    rb'<meta\s[^>]*?charset\s*=\s*["\']?\s*([a-zA-Z0-9._-]+)', re.I
)
_CT_CHARSET_RE = re.compile(r"charset\s*=\s*\"?\s*([a-zA-Z0-9._-]+)", re.I)


def _no_bomless_utf16(enc: str) -> str:
    """WHATWG: a UTF-16 label found by the ASCII prescan (or a header)
    on a BOM-less payload is self-refuting — the label being readable as
    ASCII proves the bytes aren't UTF-16.  The Encoding Standard
    substitutes UTF-8 for exactly this case; without it, mislabelled
    (actually-ASCII) pages decode to per-byte-pair CJK mojibake."""
    return "utf-8" if enc in ("utf-16", "utf-16-le", "utf-16-be") else enc


#: codecs that ARE registered text codecs but must never be chosen from
#: a charset label: escape/IDN transforms silently mangle page text
#: (punycode decodes 'hello' to ''), and 'undefined' raises on use
_DENYLIST = frozenset(
    {"punycode", "idna", "undefined", "unicode_escape", "raw_unicode_escape"}
)


def _normalize(label: str | None) -> str | None:
    if not label:
        return None
    label = label.strip().lower()
    if label in _ALIASES:
        return _ALIASES[label]
    try:
        info = codecs.lookup(label)
    except LookupError:
        return None  # unknown label: fall through to the next rule
    # canonicalize ('utf16'/'u16' → 'utf-16') so the bomless-UTF-16
    # substitution can't be bypassed by an unaliased spelling, and
    # refuse non-text codecs ('hex', 'base64', 'zlib' raise from
    # bytes.decode even with errors='replace') plus the denylist
    if not getattr(info, "_is_text_encoding", True):
        return None
    name = info.name
    if name.replace("-", "_") in _DENYLIST or name in _DENYLIST:
        return None
    return _ALIASES.get(name, name)


def _declared_encoding(
    payload: bytes, content_type: str | None
) -> tuple[str, int] | None:
    """BOM > Content-Type > meta prescan, or None if nothing declares."""
    for bom, enc in _BOMS:
        if payload.startswith(bom):
            return enc, len(bom)
    m = _CT_CHARSET_RE.search(content_type) if content_type else None
    enc = _normalize(m.group(1) if m else None)
    if enc:
        return _no_bomless_utf16(enc), 0
    m = _META_CHARSET_RE.search(payload[:1024])
    if m:
        enc = _normalize(m.group(1).decode("ascii", "replace"))
        if enc:
            return _no_bomless_utf16(enc), 0
    return None


def detect_encoding(
    payload: bytes, content_type: str | None = None
) -> tuple[str, int]:
    """→ (python codec name, BOM length to strip)."""
    payload = bytes(payload or b"")
    declared = _declared_encoding(payload, content_type)
    if declared:
        return declared
    try:
        payload.decode("utf-8", "strict")
        return "utf-8", 0
    except UnicodeDecodeError:
        return "cp1252", 0


def decode_payload(
    payload: bytes, content_type: str | None = None
) -> tuple[str, str]:
    """payload bytes → (text, codec used).  Never raises on content:
    byte errors under the detected codec are replaced, and a codec that
    rejects the bytes outright falls back to cp1252 (total function —
    one hostile page must not kill an Arrow task)."""
    payload = bytes(payload or b"")
    declared = _declared_encoding(payload, content_type)
    if declared:
        enc, bom = declared
        try:
            return payload[bom:].decode(enc, "replace"), enc
        except Exception:
            # belt-and-braces: _normalize screens non-text codecs, but a
            # codec raising despite errors='replace' must not escape
            return payload[bom:].decode("cp1252", "replace"), "cp1252"
    # undeclared: ONE strict UTF-8 pass doubles as trial and decode —
    # the common case must not decode the payload twice
    try:
        return payload.decode("utf-8", "strict"), "utf-8"
    except UnicodeDecodeError:
        return payload.decode("cp1252", "replace"), "cp1252"


def decode_payloads(
    df: DataFrame,
    content_col: str = "content",
    content_type_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, content[, content_type]) → (id, text, encoding), one narrow
    Arrow pass."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ctypes = (
                pdf[content_type_col]
                if content_type_col is not None
                else [None] * len(pdf)
            )
            texts, encs = [], []
            for blob, ct in zip(pdf[content_col], ctypes):
                text, enc = decode_payload(
                    bytes(blob) if blob is not None else b"",
                    None if ct is None else str(ct),
                )
                texts.append(text)
                encs.append(enc)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "text": texts, "encoding": encs}
            )

    cols = [id_col, content_col] + (
        [content_type_col] if content_type_col else []
    )
    id_type = dict(df.dtypes)[id_col]  # URLs key real crawls: keep type
    return df.select(*cols).mapInPandas(
        run, f"{id_col} {id_type}, text string, encoding string"
    )
