"""MediaWiki dump reader + wikitext stripper tests — sources/mediawiki.py."""

from __future__ import annotations

import bz2

import pytest

from mitie_spark.sources.mediawiki import (
    WikiDumpError,
    iter_dump_pages,
    wikitext_to_text,
)

_NS = "http://www.mediawiki.org/xml/export-0.10/"


def _dump(pages: str) -> bytes:
    return f'<mediawiki xmlns="{_NS}">{pages}</mediawiki>'.encode()


_PAGES = _dump(
    "<page><title>Alpha</title><ns>0</ns>"
    "<revision><text>'''Alpha''' is a [[letter]].</text></revision></page>"
    '<page><title>Beta</title><ns>0</ns><redirect title="Alpha"/>'
    "<revision><text>#REDIRECT [[Alpha]]</text></revision></page>"
    "<page><title>Talk:Alpha</title><ns>1</ns>"
    "<revision><text>chatter</text></revision></page>"
)


def test_dump_walk_plain_bz2_and_multistream():
    want = [
        ("Alpha", 0, None, "'''Alpha''' is a [[letter]]."),
        ("Beta", 0, "Alpha", "#REDIRECT [[Alpha]]"),
        ("Talk:Alpha", 1, None, "chatter"),
    ]
    for blob in (
        _PAGES,
        bz2.compress(_PAGES),
        # multistream: two concatenated bz2 members forming one XML doc
        bz2.compress(_PAGES[:50]) + bz2.compress(_PAGES[50:]),
    ):
        got = [
            (p["title"], p["ns"], p["redirect"], p["text"])
            for p in iter_dump_pages(blob)
        ]
        assert got == want


def test_dump_guards():
    with pytest.raises(WikiDumpError):
        list(iter_dump_pages(b"<broken"))
    with pytest.raises(WikiDumpError):
        list(iter_dump_pages(b"<other/>"))
    with pytest.raises(WikiDumpError):
        list(iter_dump_pages(b"<!DOCTYPE x>" + _PAGES))
    with pytest.raises(WikiDumpError):  # bz2 bomb bounded BEFORE inflating
        list(iter_dump_pages(bz2.compress(b"\x00" * (1 << 22)), max_out=1 << 16))
    with pytest.raises(WikiDumpError):  # truncated stream
        list(iter_dump_pages(bz2.compress(_PAGES)[:-5]))


def test_wikitext_constructs():
    wt = (
        "{{Infobox person|name=Ada|birth={{circa|1815}}}}\n"
        "'''Ada''' was a [[mathematician|mathematician and writer]].<ref>Bio</ref>\n"
        "== Early life ==\n"
        "* born in [[London]]\n"
        "[[File:Ada.jpg|thumb|Portrait by [[Someone]]]]\n"
        "{| class=\"wikitable\"\n|cell\n|}\n"
        "See [https://example.com her site] and [https://bare.example].\n"
        "[[Category:Mathematicians]]<!-- hidden -->&amp; more<ref name=x/>"
    )
    got = wikitext_to_text(wt)
    assert "Infobox" not in got and "circa" not in got
    assert "mathematician and writer" in got
    assert "Bio" not in got
    assert "Early life" in got and "==" not in got
    assert "born in London" in got
    assert "Ada.jpg" not in got and "Portrait" not in got
    assert "wikitable" not in got and "cell" not in got
    assert "her site" in got and "https://" not in got
    assert "Category" not in got and "hidden" not in got
    assert "& more" in got


def test_wikitext_edge_cases():
    assert wikitext_to_text("") == ""
    assert wikitext_to_text("plain text") == "plain text"
    # unbalanced template: drops to end rather than leaking braces
    assert wikitext_to_text("a {{unclosed b") == "a "
    # nested links inside a label
    assert wikitext_to_text("[[x|see [[y]] here]]") == "see y here"
    # math/nowiki bodies dropped/kept appropriately
    assert wikitext_to_text("<math>x^2</math>q") == "q"


def test_dump_to_pages_spark(spark):
    import pandas as pd

    from mitie_spark.sources.mediawiki import dump_to_pages

    df = spark.createDataFrame(pd.DataFrame({"content": [bz2.compress(_PAGES)]}))
    got = {r.title: r for r in dump_to_pages(df).collect()}
    assert got["Alpha"].text == "Alpha is a letter."
    assert got["Beta"].redirect == "Alpha"
    assert got["Talk:Alpha"].ns == 1


def test_wikitext_review_regressions():
    # '/' inside a ref attribute value must not stop the body strip
    assert wikitext_to_text('<ref name="a/b">leak</ref>ok') == "ok"
    # ...while self-closing refs still must not eat to the next close tag
    assert (
        wikitext_to_text('keep<ref name=x/>mid<ref>drop</ref>end')
        == "keepmidend"
    )
    # multi-pipe link: MediaWiki renders everything after the FIRST pipe
    assert wikitext_to_text("[[a|b|c]]") == "b|c"
    # nested piped link inside a label: recursive strip, no ']]' leak
    assert wikitext_to_text("[[a|text [[b|c]] more]]") == "text c more"
