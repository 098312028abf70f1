"""Hostile-input fuzz over the round-5 pure-Python web-text parsers.

Same posture as the media-decoder mutation fuzz: these functions sit in
Arrow tasks over crawled bytes, so for ARBITRARY input they must either
return a value or raise their declared error type — any other exception
is a corpus-scale task killer. Hypothesis drives structured-ish and raw
random inputs; seeds are deterministic (derandomize) so the suite stays
reproducible.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mitie_spark.functions.boilerplate import main_content
from mitie_spark.functions.charset import decode_payload, detect_encoding
from mitie_spark.sources.mediawiki import (
    WikiDumpError,
    iter_dump_pages,
    wikitext_to_text,
)

FUZZ = settings(
    max_examples=200,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)

# tag-soup-ish alphabet: heavy in markup metacharacters
_SOUP = st.text(
    alphabet="<>/=\"'a bz0{}[]|&;:!-\néテ", min_size=0, max_size=300
)


@FUZZ
@given(_SOUP)
def test_main_content_total(html):
    out = main_content(html)
    assert isinstance(out, str)
    # blocks are disjoint substrings joined by single newlines; entity
    # decode never grows text, so output is bounded by the input
    assert len(out) <= len(html) + 1


@FUZZ
@given(_SOUP)
def test_wikitext_total(wt):
    assert isinstance(wikitext_to_text(wt), str)


@FUZZ
@given(st.binary(min_size=0, max_size=300))
def test_dump_walk_total(blob):
    try:
        pages = list(iter_dump_pages(blob))
    except WikiDumpError:
        return  # the declared failure mode
    for p in pages:
        assert set(p) == {"title", "ns", "redirect", "text"}


@FUZZ
@given(
    st.binary(min_size=0, max_size=300),
    st.one_of(st.none(), st.text(max_size=60)),
)
def test_charset_total(payload, ctype):
    enc, bom = detect_encoding(payload, ctype)
    assert bom <= len(payload)
    text, used = decode_payload(payload, ctype)
    assert isinstance(text, str) and isinstance(used, str)


@FUZZ
@given(st.binary(min_size=0, max_size=64))
def test_charset_bom_prefixed_total(tail):
    # every BOM followed by arbitrary bytes must decode (replacement ok)
    import codecs

    for bom in (
        codecs.BOM_UTF8,
        codecs.BOM_UTF16_LE,
        codecs.BOM_UTF16_BE,
        codecs.BOM_UTF32_LE,
        codecs.BOM_UTF32_BE,
    ):
        text, enc = decode_payload(bom + tail)
        assert isinstance(text, str)
