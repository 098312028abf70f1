"""robots.txt (RFC 9309) + sitemap tests — sources/robots.py.

Matching semantics pinned against the RFC's own examples (§2.2.2 group
selection, §2.2.3 special characters, §5.1 longest-match) plus the
Spark filter_allowed_urls surface and the crawl_frontier_allowed gate's
assumptions.
"""

from __future__ import annotations

import gzip

import pytest

from mitie_spark.sources.robots import (
    SitemapError,
    filter_allowed_urls,
    parse_robots,
    parse_sitemap,
)


def test_longest_match_and_allow_tie():
    body = """
    User-agent: *
    Disallow: /example/page/
    Allow: /example/page/disallowed.gif
    """
    r = parse_robots(body)
    assert not r.is_allowed("/example/page/")
    assert not r.is_allowed("/example/page/other.gif")
    assert r.is_allowed("/example/page/disallowed.gif")
    assert r.is_allowed("/elsewhere")
    # RFC 9309 §5.1: equivalent length -> allow SHOULD win
    tie = parse_robots("User-agent: *\nDisallow: /page\nAllow: /page")
    assert tie.is_allowed("/page")
    # order independence of the tie rule
    tie2 = parse_robots("User-agent: *\nAllow: /page\nDisallow: /page")
    assert tie2.is_allowed("/page")


def test_wildcard_and_anchor_patterns():
    r = parse_robots(
        "User-agent: *\nDisallow: /*.gif$\nDisallow: /fish*.php\n"
    )
    assert not r.is_allowed("/a/b/pic.gif")
    assert r.is_allowed("/a/b/pic.gif.html")  # $ anchors the end
    assert not r.is_allowed("/fishheads/catfish.php?parameters")
    assert r.is_allowed("/Fish.PHP")  # byte-wise, case-sensitive paths


def test_group_selection_longest_ua_wins():
    body = """
    User-agent: googlebot-news
    Disallow: /news-only

    User-agent: googlebot
    Disallow: /general

    User-agent: *
    Disallow: /everyone
    """
    news = parse_robots(body, agent="googlebot-news")
    assert not news.is_allowed("/news-only")
    assert news.is_allowed("/general")  # the more specific group REPLACES
    assert news.is_allowed("/everyone")
    general = parse_robots(body, agent="googlebot")
    assert not general.is_allowed("/general")
    assert general.is_allowed("/news-only")
    other = parse_robots(body, agent="mitiebot")
    assert not other.is_allowed("/everyone")
    assert other.is_allowed("/general")
    # case-insensitive UA comparison
    assert not parse_robots(body, agent="GoogleBot").is_allowed("/general")


def test_shared_and_merged_groups_and_delay():
    body = """
    User-agent: a
    User-agent: b
    Disallow: /both
    Crawl-delay: 2.5

    User-agent: b
    Disallow: /extra
    """
    ra, rb = parse_robots(body, "a"), parse_robots(body, "b")
    assert not ra.is_allowed("/both") and ra.is_allowed("/extra")
    # b's two groups merge their rules (RFC 9309 §2.2.1)
    assert not rb.is_allowed("/both") and not rb.is_allowed("/extra")
    assert ra.crawl_delay == 2.5


def test_fail_open_and_junk_tolerance():
    assert parse_robots("").is_allowed("/anything")
    assert parse_robots(None).is_allowed("/x")
    junk = "ERROR 500\n<html>not robots</html>\nDisallow /no-colon"
    assert parse_robots(junk).is_allowed("/x")
    # empty Disallow means allow-all, not disallow-all
    assert parse_robots("User-agent: *\nDisallow:").is_allowed("/x")
    # comments stripped
    r = parse_robots("User-agent: * # all\nDisallow: /a # hidden")
    assert not r.is_allowed("/a")


def test_sitemap_discovery_is_global():
    body = """
    Sitemap: https://ex.com/sitemap.xml
    User-agent: *
    Disallow: /x
    Sitemap: https://ex.com/sitemap2.xml
    """
    r = parse_robots(body, "anybot")
    assert r.sitemaps == [
        "https://ex.com/sitemap.xml",
        "https://ex.com/sitemap2.xml",
    ]


# ---------------------------------------------------------------------------
# sitemaps
# ---------------------------------------------------------------------------

_URLSET = (
    b'<?xml version="1.0" encoding="UTF-8"?>'
    b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    b"<url><loc>https://ex.com/a</loc><lastmod>2024-01-01</lastmod></url>"
    b"<url><loc> https://ex.com/b </loc></url>"
    b"<url><priority>0.5</priority></url>"
    b"</urlset>"
)


def test_sitemap_urlset_and_gzip():
    kind, entries = parse_sitemap(_URLSET)
    assert kind == "urlset"
    assert entries == [
        ("https://ex.com/a", "2024-01-01"),
        ("https://ex.com/b", None),
    ]
    assert parse_sitemap(gzip.compress(_URLSET)) == (kind, entries)


def test_sitemap_index_and_guards():
    idx = (
        b'<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        b"<sitemap><loc>https://ex.com/s1.xml.gz</loc></sitemap>"
        b"</sitemapindex>"
    )
    kind, entries = parse_sitemap(idx)
    assert kind == "sitemapindex"
    assert entries == [("https://ex.com/s1.xml.gz", None)]
    with pytest.raises(SitemapError):
        parse_sitemap(b"<broken")
    with pytest.raises(SitemapError):
        parse_sitemap(b"<other/>")
    with pytest.raises(SitemapError):
        parse_sitemap(b"<!DOCTYPE x>" + _URLSET)
    with pytest.raises(SitemapError):
        parse_sitemap(gzip.compress(b"x" * 2000), max_out=100)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def test_filter_allowed_urls(spark):
    import pandas as pd

    urls = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": [
                    "https://a.com/open",
                    "https://a.com/private/x",
                    "https://b.com/private/x",  # no robots row: fail open
                    "https://a.com/",
                ]
            }
        )
    )
    robots = spark.createDataFrame(
        pd.DataFrame(
            {
                "host": ["a.com"],
                "robots_txt": ["User-agent: *\nDisallow: /private/\n"],
            }
        )
    )
    got = {
        r.url: r.allowed
        for r in filter_allowed_urls(urls, robots).collect()
    }
    assert got == {
        "https://a.com/open": True,
        "https://a.com/private/x": False,
        "https://b.com/private/x": True,
        "https://a.com/": True,
    }


def test_sitemap_gzip_bomb_is_bounded():
    """Review-finding repro: a small .gz inflating past max_out must
    raise instead of materializing the bomb."""
    bomb = gzip.compress(b"\x00" * (1 << 22))
    assert len(bomb) < 1 << 14
    with pytest.raises(SitemapError):
        parse_sitemap(bomb, max_out=1 << 16)


def test_uppercase_scheme_still_filtered(spark):
    """Review-finding repro: 'HTTPS://...' must not bypass Disallow."""
    import pandas as pd

    urls = spark.createDataFrame(
        pd.DataFrame({"url": ["HTTPS://a.com/private/x"]})
    )
    robots = spark.createDataFrame(
        pd.DataFrame(
            {"host": ["a.com"], "robots_txt": ["User-agent: *\nDisallow: /private/\n"]}
        )
    )
    [row] = filter_allowed_urls(urls, robots).collect()
    assert row.allowed is False


def test_crawl_delay_zero_survives_group_merge():
    body = (
        "User-agent: *\nCrawl-delay: 0\nDisallow: /a\n\n"
        "User-agent: *\nCrawl-delay: 5\nDisallow: /b\n"
    )
    r = parse_robots(body)
    assert r.crawl_delay == 0.0
    assert not r.is_allowed("/a") and not r.is_allowed("/b")
