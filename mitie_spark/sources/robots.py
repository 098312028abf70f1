"""robots.txt parsing + matching (RFC 9309) and sitemap XML parsing.

Role in the engine: a Common-Crawl-style pipeline is downstream of a
crawler, but re-crawling, frontier expansion, and compliance filtering
(drop pages a site has since disallowed) all need the politeness layer:
which of a host's URLs may be fetched, at what delay, and where its
sitemaps are. This module implements the RFC 9309 group-selection and
longest-match rules exactly, plus the sitemap.org urlset/sitemapindex
formats (gzip members included).

RFC 9309 semantics implemented:
- group selection: the group whose user-agent token is the LONGEST
  case-insensitive match for the product token; ``*`` only when no
  specific group matches; consecutive UA lines share one group.
- rule matching: byte-wise longest-match over all rules in the selected
  group, ``*`` matching any span and ``$`` anchoring the end; on a
  length tie allow wins; no rule matching → allowed; unparseable or
  missing robots.txt → allowed (the RFC's fail-open posture for 4xx).
- percent-encoding: patterns and paths compare in their encoded form.

Spark surface: ``filter_allowed_urls`` — per-host robots bodies are a
dimension table (tiny next to the pages table, broadcast), the matcher
compiles each host's rules ONCE per Arrow batch and evaluates paths
vectorized-per-host; one narrow mapInPandas, no shuffle beyond the
broadcast join.
"""

from __future__ import annotations

import re
from xml.etree import ElementTree

__all__ = [
    "RobotsRules",
    "filter_allowed_urls",
    "parse_robots",
    "parse_sitemap",
]


def _compile_pattern(pat: str) -> re.Pattern:
    """RFC 9309 path pattern → anchored regex: '*' spans anything, a
    trailing '$' anchors the end, everything else is literal octets."""
    anchored = pat.endswith("$")
    if anchored:
        pat = pat[:-1]
    rx = ".*".join(re.escape(part) for part in pat.split("*"))
    return re.compile("^" + rx + ("$" if anchored else ""))


class RobotsRules:
    """Compiled rule set for one (host, product-token) pair."""

    __slots__ = ("rules", "crawl_delay", "sitemaps")

    def __init__(
        self,
        rules: list[tuple[bool, str]],
        crawl_delay: float | None,
        sitemaps: list[str],
    ):
        # compile once; keep pattern length for the longest-match rule
        self.rules = [
            (allow, len(pat), _compile_pattern(pat))
            for allow, pat in rules
            if pat
        ]
        self.crawl_delay = crawl_delay
        self.sitemaps = sitemaps

    def is_allowed(self, path: str) -> bool:
        """Longest-match decision for a percent-encoded path."""
        if not path.startswith("/"):
            path = "/" + path
        best_len = -1
        best_allow = True
        for allow, plen, rx in self.rules:
            if plen > best_len and rx.match(path):
                # ties: a same-length allow must win — scan order can't
                # guarantee that, so compare (len, allow) lexicographically
                best_len, best_allow = plen, allow
            elif plen == best_len and allow and not best_allow and rx.match(path):
                best_allow = True
        return best_allow


def parse_robots(content: str | bytes, agent: str = "*") -> RobotsRules:
    """robots.txt body → compiled RobotsRules for ``agent``.

    Unparseable lines are skipped (RFC 9309 §2.2: parse what you can);
    a None/empty body yields the allow-everything rule set.
    """
    if isinstance(content, bytes):
        content = content.decode("utf-8", "replace")
    agent = agent.lower()

    # first pass: split into groups of (ua_tokens, rules, delay)
    groups: list[tuple[list[str], list[tuple[bool, str]], float | None]] = []
    cur_uas: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    cur_delay: float | None = None
    in_ua_run = False  # consecutive UA lines accumulate into one group
    sitemaps: list[str] = []

    def close_group() -> None:
        nonlocal cur_uas, cur_rules, cur_delay
        if cur_uas:
            groups.append((cur_uas, cur_rules, cur_delay))
        cur_uas, cur_rules, cur_delay = [], [], None

    for raw in (content or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_ua_run:
                close_group()
            cur_uas.append(val.lower())
            in_ua_run = True
            continue
        in_ua_run = False
        if key in ("allow", "disallow"):
            # an empty Disallow means "allow everything" (no rule)
            if val:
                cur_rules.append((key == "allow", val))
        elif key == "crawl-delay":
            try:
                cur_delay = float(val)
            except ValueError:
                pass
        elif key == "sitemap" and val:
            sitemaps.append(val)  # sitemap lines are global, any group
    close_group()

    # group selection: longest UA token that is a substring-prefix match
    best: tuple[int, list[tuple[bool, str]], float | None] | None = None
    for uas, rules, delay in groups:
        for ua in uas:
            if ua == "*":
                score = 0
            elif ua and ua in agent:
                score = len(ua)
            else:
                continue
            if best is None or score > best[0]:
                best = (score, rules, delay)
            elif score == best[0]:
                # RFC: multiple groups matching the same UA merge rules;
                # an explicit Crawl-delay: 0 must survive the merge
                best = (
                    score,
                    best[1] + rules,
                    best[2] if best[2] is not None else delay,
                )
    if best is None:
        return RobotsRules([], None, sitemaps)
    return RobotsRules(best[1], best[2], sitemaps)


# ---------------------------------------------------------------------------
# sitemaps (sitemap.org XML: urlset and sitemapindex, optionally gzip)
# ---------------------------------------------------------------------------

_SM = "{http://www.sitemaps.org/schemas/sitemap/0.9}"


class SitemapError(ValueError):
    """Malformed or bombed sitemap document."""


def parse_sitemap(
    data: bytes, max_out: int = 1 << 26
) -> tuple[str, list[tuple[str, str | None]]]:
    """sitemap bytes → (kind, entries): kind is 'urlset' (entries are
    (loc, lastmod)) or 'sitemapindex' (entries are child sitemap (loc,
    lastmod) pairs for the caller's frontier to fetch). Gzip members
    (sitemap.xml.gz) are transparently decompressed, bounded by
    max_out; DTDs are rejected (entity-bomb guard)."""
    if data[:2] == b"\x1f\x8b":
        # bounded decompression: gzip.decompress would materialize a
        # decompression bomb BEFORE any size check (review finding)
        from mitie_spark.sources.warc import gunzip_members

        try:
            data = gunzip_members(data, max_out=max_out)
        except (OSError, EOFError, ValueError) as e:
            raise SitemapError(f"bad gzip member: {e}") from None
    if len(data) > max_out:
        raise SitemapError("sitemap exceeds max_out")
    if b"<!DOCTYPE" in data or b"<!ENTITY" in data:
        raise SitemapError("DTD in sitemap")
    try:
        root = ElementTree.fromstring(data)
    except ElementTree.ParseError as e:
        raise SitemapError(f"bad sitemap XML: {e}") from None
    if root.tag == _SM + "urlset":
        kind, child = "urlset", _SM + "url"
    elif root.tag == _SM + "sitemapindex":
        kind, child = "sitemapindex", _SM + "sitemap"
    else:
        raise SitemapError(f"unknown sitemap root {root.tag!r}")
    entries: list[tuple[str, str | None]] = []
    for el in root.iter(child):
        loc = el.find(_SM + "loc")
        if loc is None or not (loc.text or "").strip():
            continue
        lastmod = el.find(_SM + "lastmod")
        entries.append(
            (
                loc.text.strip(),
                (lastmod.text or "").strip() if lastmod is not None else None,
            )
        )
    return kind, entries


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def filter_allowed_urls(
    urls_df,
    robots_df,
    agent: str = "*",
    url_col: str = "url",
):
    """urls ⟕ broadcast(robots) → urls + ``allowed`` boolean.

    ``robots_df`` is (host, robots_txt) — a dimension table, broadcast.
    Each Arrow batch compiles a host's rules once (per-batch cache) and
    batches of same-host paths evaluate against the compiled set. One
    narrow mapInPandas after the broadcast join; no other shuffle.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    joined = urls_df.withColumn(
        "_host", F.parse_url(F.col(url_col), F.lit("HOST"))
    ).join(
        F.broadcast(robots_df.withColumnRenamed("host", "_host")),
        "_host",
        "left",
    )

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in urls_df.schema.fields
    ) + ", allowed boolean"

    keep = [f.name for f in urls_df.schema.fields]

    def run(batches):
        cache: dict[str, RobotsRules] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            allowed = []
            for u, txt in zip(pdf[url_col], pdf["robots_txt"]):
                if txt is None or (isinstance(txt, float) and pd.isna(txt)):
                    allowed.append(True)  # no robots.txt: fail open
                    continue
                rules = cache.get(txt)
                if rules is None:
                    rules = cache[txt] = parse_robots(txt, agent)
                m = re.match(
                    r"^[a-z][a-z0-9+.-]*://[^/]*(/.*)?$", u or "", re.IGNORECASE
                )
                path = (m.group(1) or "/") if m else (u or "/")
                allowed.append(rules.is_allowed(path))
            res = pdf[keep].copy()
            res["allowed"] = allowed
            yield res

    return joined.mapInPandas(run, out_schema)
