"""RSS/Atom feed parsing tests — sources/feeds.py."""

from __future__ import annotations

import pytest

from mitie_spark.sources.feeds import FeedError, parse_feed

_RSS = b"""<?xml version="1.0"?>
<rss version="2.0"><channel>
<title>Example</title>
<item><title>First</title><link>https://ex.com/1</link>
<pubDate>Mon, 01 Jan 2024 10:00:00 GMT</pubDate>
<description>d1</description></item>
<item><title>No link, skipped</title></item>
<item><link> https://ex.com/2 </link>
<pubDate>totally broken date</pubDate></item>
</channel></rss>"""

_ATOM = b"""<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
<title>Example</title>
<entry><title>A1</title>
<link rel="self" href="https://ex.com/meta"/>
<link rel="alternate" href="https://ex.com/a1"/>
<published>2024-02-03T04:05:06+02:00</published>
<summary>s1</summary></entry>
<entry><title>A2</title>
<link href="https://ex.com/a2"/>
<updated>2024-02-04T00:00:00Z</updated></entry>
<entry><title>no links, skipped</title></entry>
</feed>"""


def test_rss_items():
    kind, entries = parse_feed(_RSS)
    assert kind == "rss"
    assert entries == [
        {
            "url": "https://ex.com/1",
            "title": "First",
            "published": "2024-01-01T10:00:00Z",
            "summary": "d1",
        },
        {
            "url": "https://ex.com/2",
            "title": None,
            # broken dates pass through; the URL is what the frontier needs
            "published": "totally broken date",
            "summary": None,
        },
    ]


def test_atom_entries_and_link_rel_preference():
    kind, entries = parse_feed(_ATOM)
    assert kind == "atom"
    assert entries[0]["url"] == "https://ex.com/a1"  # alternate beats self
    assert entries[0]["published"] == "2024-02-03T02:05:06Z"  # UTC-normalized
    assert entries[0]["summary"] == "s1"
    assert entries[1] == {
        "url": "https://ex.com/a2",
        "title": "A2",
        "published": "2024-02-04T00:00:00Z",  # updated as fallback
        "summary": None,
    }
    assert len(entries) == 2


def test_guards():
    with pytest.raises(FeedError):
        parse_feed(b"<broken")
    with pytest.raises(FeedError):
        parse_feed(b"<other/>")
    with pytest.raises(FeedError):
        parse_feed(b"<rss/>")  # no channel
    with pytest.raises(FeedError):
        parse_feed(b"<!DOCTYPE x>" + _RSS)
    with pytest.raises(FeedError):
        parse_feed(_RSS, max_out=10)
