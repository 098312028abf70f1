"""Main-content extraction (boilerplate removal) for crawled HTML.

Crawled pages bury the article under navigation, sidebars, footers and
cookie banners; LLM-corpus pipelines strip that chrome BEFORE dedup and
quality scoring or the boilerplate dominates both (the same reason
Common-Crawl publishes WET alongside WARC).  This implements the
classic block-based density heuristic (Kohlschütter et al., WSDM'10
"Boilerplate Detection Using Shallow Text Features" / jusText):

1. split the page into text blocks at block-level tag boundaries;
2. drop whole subtrees that are chrome by construction
   (``nav/header/footer/aside`` + invisible ``script/style/template``);
3. drop link-dense blocks (anchor-text chars / total chars above a
   threshold — menus and "related links" rows);
4. keep the rest, document order preserved.

Deterministic, stdlib-only, and Arrow-batched on the Spark side
(``extract_main_content``) — per-doc pure-Python parsing is the honest
cost model for messy real-world HTML (the same shape as
functions/html2text.py); nothing shuffles, nothing collects.

Reference parity note: the reference engine (mit-nlp/MITIE) consumes
pre-extracted text (gigaword_reader.h expects clean text zones); this
operator belongs to the web-pipeline surface the build adds on top.
"""

from __future__ import annotations

import re
from html import unescape

from pyspark.sql import DataFrame

__all__ = ["main_content", "extract_main_content"]

_TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:[^>'\"]|'[^']*'|\"[^\"]*\")*?)(/?)>")
# unterminated comments run to EOF per the HTML parsing spec
_COMMENT_RE = re.compile(r"<!--.*?(?:-->|$)", re.S)
# non-element markup real pages open with: doctype, processing
# instructions, CDATA — none of it is content and none of it matches
# _TAG_RE, so strip it up front or it leaks into the first text block
_DECL_RE = re.compile(r"<!DOCTYPE[^>]*>|<\?[^>]*\?>|<!\[CDATA\[.*?(?:\]\]>|$)", re.S | re.I)

#: subtrees that are chrome or invisible by construction
_DROP_CONTAINERS = frozenset(
    {"nav", "header", "footer", "aside", "template", "noscript", "svg", "head"}
)
#: raw-text elements (HTML spec): their content is NOT markup — tag-like
#: strings inside ('var s="<body>"') must not be tag-parsed, so the scan
#: jumps straight to the real close tag
_RAW_TEXT = frozenset({"script", "style"})
_RAW_CLOSE = {name: re.compile(rf"</{name}\s*>", re.I) for name in _RAW_TEXT}
#: tags whose open OR close ends the current text block
_BLOCK_TAGS = frozenset(
    {
        "p", "div", "li", "ul", "ol", "dl", "dt", "dd",
        "h1", "h2", "h3", "h4", "h5", "h6",
        "table", "tr", "td", "th", "blockquote", "pre",
        "article", "section", "main", "figure", "figcaption",
        "form", "fieldset", "br", "hr", "body", "html",
    }
)


def main_content(html: str, max_link_density: float = 0.34, min_chars: int = 0) -> str:
    """HTML → main-content text: blocks surviving the container and
    link-density rules, document order, joined by newline.

    Block text is NOT whitespace-normalized (the caller's corpus
    contract may be byte-exact); entity references are decoded.
    Whitespace-only blocks never survive regardless of thresholds.
    """
    html = _COMMENT_RE.sub("", html or "")
    html = _DECL_RE.sub("", html)
    blocks: list[tuple[str, int]] = []  # (raw_text, n_link_chars)
    cur: list[str] = []
    cur_link = 0
    drop_depth = 0
    link_depth = 0
    pos = 0

    def flush() -> None:
        # anchors are inline elements: they cannot span a block boundary
        # in a real HTML parse, so an unclosed <a> must not poison every
        # following block's link density — reset with the block
        nonlocal cur, cur_link, link_depth
        if cur:
            blocks.append(("".join(cur), cur_link))
            cur = []
            cur_link = 0
        link_depth = 0

    while True:
        m = _TAG_RE.search(html, pos)
        if m is None:
            break
        text = html[pos : m.start()]
        pos = m.end()
        if text and not drop_depth:
            cur.append(text)
            if link_depth:
                cur_link += len(text)
        closing, name, _attrs, self_close = m.groups()
        name = name.lower()
        if name in _RAW_TEXT:
            # skip raw-text content wholesale — never tag-parse it (a
            # '<body>' literal inside JS must not reset drop_depth, and
            # code must never reach the corpus); unterminated → EOF
            if not closing and not self_close:
                close = _RAW_CLOSE[name].search(html, pos)
                pos = close.end() if close else len(html)
            flush()
            continue
        if name in _DROP_CONTAINERS:
            if self_close:
                pass
            elif closing:
                drop_depth = max(0, drop_depth - 1)
            else:
                drop_depth += 1
            flush()
            continue
        if drop_depth:
            # real-world resilience: a page that never closes <head> (or
            # a chrome container) would otherwise drop everything — body
            # is never legitimately nested inside chrome, so it resets
            if name == "body" and not closing:
                drop_depth = 0
            continue
        if name == "a" and not self_close:
            link_depth = max(0, link_depth - 1) if closing else link_depth + 1
        elif name in _BLOCK_TAGS:
            flush()
    tail = html[pos:]
    if tail and not drop_depth:
        cur.append(tail)
        if link_depth:
            cur_link += len(tail)
    flush()

    kept = []
    for raw, n_link in blocks:
        if not raw.strip():
            continue
        if len(raw.strip()) < min_chars:
            continue
        if n_link / len(raw) > max_link_density:
            continue
        kept.append(unescape(raw))
    return "\n".join(kept)


def extract_main_content(
    pages: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    max_link_density: float = 0.34,
    min_chars: int = 0,
) -> DataFrame:
    """(id, html) → (id, main_text), one narrow Arrow pass."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "main_text": [
                        main_content(h or "", max_link_density, min_chars)
                        for h in pdf[html_col]
                    ],
                }
            )

    return pages.select(id_col, html_col).mapInPandas(
        run, f"{id_col} bigint, main_text string"
    )
