"""RSS 2.0 / Atom 1.0 feed parsing → page-frontier rows.

Role in the engine: feeds are how a crawl discovers fresh URLs between
full recrawls (the same frontier role as sitemaps, sources/robots.py).
A feed document yields (url, title, published, summary) entries that
become pages-table candidates.

Formats: RSS 2.0 (``<rss><channel><item>``, RFC-822 dates) and Atom 1.0
(``<feed><entry>``, RFC-3339 dates, ``<link rel="alternate">``
preference). Both parse with the stdlib ElementTree under the shared
hostile-input posture (DTD rejection, size bound, single error type);
date strings normalize to ISO-8601 UTC when parseable and pass through
verbatim otherwise (crawl reality: broken dates abound — dropping the
entry would lose the URL, which is the part the frontier needs).

Scale note: pure per-record function for Arrow ``mapInPandas`` — the
sitemap/robots shape, no shuffle.
"""

from __future__ import annotations

import email.utils
from datetime import datetime, timezone
from xml.etree import ElementTree

__all__ = ["FeedError", "parse_feed"]

_ATOM = "{http://www.w3.org/2005/Atom}"


class FeedError(ValueError):
    """Malformed or bombed feed document."""


def _norm_date(raw: str | None) -> str | None:
    """RFC-822 (RSS) or RFC-3339 (Atom) → ISO-8601 UTC; unparseable
    strings pass through stripped (never dropped, never an error)."""
    if not raw or not raw.strip():
        return None
    raw = raw.strip()
    try:  # RFC-822: "Mon, 01 Jan 2024 10:00:00 GMT"
        dt = email.utils.parsedate_to_datetime(raw)
    except (TypeError, ValueError):
        dt = None
    if dt is None:
        try:  # RFC-3339: "2024-01-01T10:00:00Z" (fromisoformat ≥3.11)
            dt = datetime.fromisoformat(raw.replace("Z", "+00:00"))
        except ValueError:
            return raw
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


def _text(el) -> str | None:
    if el is None:
        return None
    s = (el.text or "").strip()
    return s or None


def parse_feed(
    data: bytes, max_out: int = 1 << 26
) -> tuple[str, list[dict]]:
    """feed bytes → (kind, entries); kind is 'rss' or 'atom', each entry
    ``{"url", "title", "published", "summary"}`` (url-less items are
    skipped — a frontier can do nothing with them)."""
    if len(data) > max_out:
        raise FeedError("feed exceeds max_out")
    if b"<!DOCTYPE" in data or b"<!ENTITY" in data:
        raise FeedError("DTD in feed")  # entity-bomb guard
    try:
        root = ElementTree.fromstring(data)
    except ElementTree.ParseError as e:
        raise FeedError(f"bad feed XML: {e}") from None

    entries: list[dict] = []
    if root.tag == "rss":
        channel = root.find("channel")
        if channel is None:
            raise FeedError("rss without channel")
        for item in channel.iter("item"):
            url = _text(item.find("link"))
            if not url:
                continue
            entries.append(
                {
                    "url": url,
                    "title": _text(item.find("title")),
                    "published": _norm_date(_text(item.find("pubDate"))),
                    "summary": _text(item.find("description")),
                }
            )
        return "rss", entries
    if root.tag == _ATOM + "feed":
        for entry in root.iter(_ATOM + "entry"):
            url = None
            fallback = None
            for link in entry.iter(_ATOM + "link"):
                href = (link.get("href") or "").strip()
                if not href:
                    continue
                rel = link.get("rel", "alternate")
                if rel == "alternate":
                    url = url or href
                else:
                    fallback = fallback or href
            url = url or fallback
            if not url:
                continue
            published = _text(entry.find(_ATOM + "published")) or _text(
                entry.find(_ATOM + "updated")
            )
            entries.append(
                {
                    "url": url,
                    "title": _text(entry.find(_ATOM + "title")),
                    "published": _norm_date(published),
                    "summary": _text(entry.find(_ATOM + "summary")),
                }
            )
        return "atom", entries
    raise FeedError(f"unknown feed root {root.tag!r}")
