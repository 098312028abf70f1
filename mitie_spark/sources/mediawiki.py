"""MediaWiki XML dump reader + wikitext→text stripper.

Role in the engine: Wikipedia dumps (``pages-articles.xml.bz2``) are the
canonical knowledge-graph bootstrap corpus — alias dictionaries, entity
inventories, and relation training data all start there (the
reference's own example entities are Wikipedia-shaped). This module
reads the dump format: (multistream) bz2 via the stdlib decompressor
with a bounded-output loop (bomb-safe — stdlib ``bz2`` exists, unlike
brotli/zstd, so a from-scratch port would be engineering theater), the
``<mediawiki><page><revision><text>`` XML walk version-independently
(namespace-stripped local names), and a wikitext stripper covering the
constructs that dominate real articles: comments, nested templates,
tables, file/image links with nested brackets, wiki links (label
preference, namespace-link drop), external links, refs and HTML tags,
bold/italic quotes, headings, list markers, and character entities.

Hostile-input posture: bz2 output is bounded BEFORE materialization;
DTDs are rejected; any parse failure raises WikiDumpError.

Scale shape: per-record functions for Arrow ``mapInPandas`` stages —
a dump splits into per-stream (multistream) or per-page work, no
shuffle. ``dump_to_pages`` is the Spark surface.
"""

from __future__ import annotations

import bz2
import re
from html import unescape
from xml.etree import ElementTree

from pyspark.sql import DataFrame

__all__ = [
    "WikiDumpError",
    "dump_to_pages",
    "iter_dump_pages",
    "wikitext_to_text",
]


class WikiDumpError(ValueError):
    """Malformed, bombed, or truncated dump document."""


def _bounded_bz2(data: bytes, max_out: int) -> bytes:
    """Decompress (multistream) bz2 with the output bounded BEFORE it
    materializes — bz2.decompress would inflate a bomb first."""
    out = []
    total = 0
    while data:
        dec = bz2.BZ2Decompressor()
        try:
            chunk = dec.decompress(data, max_out - total + 1)
        except OSError as e:
            raise WikiDumpError(f"bad bz2 stream: {e}") from None
        total += len(chunk)
        if total > max_out:
            raise WikiDumpError("bz2 output exceeds max_out")
        out.append(chunk)
        if not dec.eof:
            if dec.needs_input:
                raise WikiDumpError("truncated bz2 stream")
            raise WikiDumpError("bz2 output exceeds max_out")
        data = dec.unused_data  # next multistream member
    return b"".join(out)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def iter_dump_pages(data: bytes, max_out: int = 1 << 28):
    """dump bytes (XML, bz2, or multistream bz2) → yields
    {title, ns, redirect, text} per <page> (latest revision's text).
    Export-version independent: element names match by local part."""
    if data[:3] == b"BZh":
        data = _bounded_bz2(data, max_out)
    if len(data) > max_out:
        raise WikiDumpError("dump exceeds max_out")
    if b"<!DOCTYPE" in data or b"<!ENTITY" in data:
        raise WikiDumpError("DTD in dump")
    try:
        root = ElementTree.fromstring(data)
    except ElementTree.ParseError as e:
        raise WikiDumpError(f"bad dump XML: {e}") from None
    if _local(root.tag) != "mediawiki":
        raise WikiDumpError(f"unknown dump root {root.tag!r}")
    for page in root.iter():
        if _local(page.tag) != "page":
            continue
        title, ns, redirect, text = None, 0, None, ""
        for el in page:
            name = _local(el.tag)
            if name == "title":
                title = (el.text or "").strip()
            elif name == "ns":
                try:
                    ns = int((el.text or "0").strip())
                except ValueError:
                    ns = 0
            elif name == "redirect":
                redirect = el.get("title", "")
            elif name == "revision":
                for rel in el:
                    if _local(rel.tag) == "text":
                        text = rel.text or ""
        if title is None:
            raise WikiDumpError("page without title")
        yield {"title": title, "ns": ns, "redirect": redirect, "text": text}


# ---------------------------------------------------------------------------
# wikitext → text
# ---------------------------------------------------------------------------

_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
# open-tag branch: attributes may contain '/' (urls in name= values); only
# the char immediately before '>' must not be '/' (that's the self-closing
# branch, which must NOT start a body match or it would eat to the next ref)
_REF_RE = re.compile(r"<ref(?:[^>]*[^>/])?>.*?</ref>|<ref[^>]*/>", re.S | re.I)
_DROP_TAG_BODY_RE = re.compile(
    r"<(math|nowiki|gallery|timeline|score)[^>]*>.*?</\1>", re.S | re.I
)
_TAG_RE = re.compile(r"</?[a-zA-Z][^>]*>")
_EXT_LINK_RE = re.compile(r"\[(?:[a-z][a-z0-9+.-]*:)?//[^ \]]*( ([^\]]*))?\]")
_HEADING_RE = re.compile(r"^=+ *(.*?) *=+ *$", re.M)
_LIST_RE = re.compile(r"^[*#:;]+ *", re.M)
_QUOTES_RE = re.compile(r"'{2,}")


def _strip_nested(text: str, open_s: str, close_s: str) -> str:
    """Remove balanced {{...}} / {|...|} spans, nesting-aware."""
    out = []
    depth = 0
    i, n = 0, len(text)
    lo, lc = len(open_s), len(close_s)
    while i < n:
        if text.startswith(open_s, i):
            depth += 1
            i += lo
        elif depth and text.startswith(close_s, i):
            depth -= 1
            i += lc
        elif depth:
            i += 1
        else:
            out.append(text[i])
            i += 1
    return "".join(out)


def _strip_links(text: str) -> str:
    """[[target|label]] → label, [[target]] → target, namespace links
    ([[File:...]], [[Category:...]]) dropped whole — nesting-aware
    (file captions contain links).  The label is everything after the
    FIRST pipe at bracket depth 0, exactly as MediaWiki renders it
    ([[a|b|c]] displays "b|c"), and is recursively stripped so nested
    piped links inside captions/labels resolve instead of leaking
    bracket halves into the text."""
    out = []
    i, n = 0, len(text)
    while i < n:
        if text.startswith("[[", i):
            depth = 1
            j = i + 2
            pipe = -1
            while j < n and depth:
                if text.startswith("[[", j):
                    depth += 1
                    j += 2
                elif text.startswith("]]", j):
                    depth -= 1
                    j += 2
                else:
                    if pipe < 0 and depth == 1 and text[j] == "|":
                        pipe = j
                    j += 1
            inner_end = j - 2 if depth == 0 else n
            if pipe >= 0:
                target = text[i + 2 : pipe]
                label = text[pipe + 1 : inner_end]
            else:
                target = text[i + 2 : inner_end]
                label = None
            if ":" in target:
                pass  # namespace link (File/Image/Category/lang): drop
            elif label is not None:
                out.append(_strip_links(label) if "[[" in label else label)
            else:
                out.append(target)
            i = j
        else:
            out.append(text[i])
            i += 1
    return "".join(out)


def wikitext_to_text(wt: str) -> str:
    """Wikitext → plain text (the constructs that dominate articles)."""
    t = _COMMENT_RE.sub("", wt or "")
    t = _DROP_TAG_BODY_RE.sub("", t)
    t = _REF_RE.sub("", t)
    t = _strip_nested(t, "{{", "}}")
    t = _strip_nested(t, "{|", "|}")
    t = _strip_links(t)
    t = _EXT_LINK_RE.sub(lambda m: m.group(2) or "", t)
    t = _HEADING_RE.sub(r"\1", t)
    t = _LIST_RE.sub("", t)
    t = _QUOTES_RE.sub("", t)
    t = _TAG_RE.sub("", t)
    return unescape(t)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def dump_to_pages(archives: DataFrame, content_col: str = "content") -> DataFrame:
    """dump blobs → (title, ns, redirect, text, wikitext) rows; article
    text pre-stripped. One narrow Arrow pass."""
    import pandas as pd

    def parse(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            rows = {"title": [], "ns": [], "redirect": [], "text": [], "wikitext": []}
            for blob in pdf[content_col]:
                for p in iter_dump_pages(bytes(blob)):
                    rows["title"].append(p["title"])
                    rows["ns"].append(p["ns"])
                    rows["redirect"].append(p["redirect"])
                    rows["text"].append(wikitext_to_text(p["text"]))
                    rows["wikitext"].append(p["text"])
            yield pd.DataFrame(rows)

    return archives.mapInPandas(
        parse,
        "title string, ns int, redirect string, text string, wikitext string",
    )
