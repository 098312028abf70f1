"""RTF text extractor tests — sources/rtf.py.

Gate pattern as PDF/DOCX/XLSX: write_rtf round trip, hand-written RTF
for what the writer never emits (destinations, codepage escapes, \\uc
fallbacks, \\bin runs, nested groups, special-char control words), and
the corruption fuzz contract.
"""

from __future__ import annotations

import random

import pytest

from mitie_spark.sources.rtf import RtfError, extract_rtf_text, write_rtf

TEXT = "hello RTF world\nsecond line with {braces} & back\\slash\n\ttabbed\n"
UNI = "naïve café — 中文 日本語 🎉 done"


def test_round_trip():
    for text in (TEXT, UNI, "", "one line", "a\n\nb\n", "… …", "𝔘𝔫𝔦"):
        assert extract_rtf_text(write_rtf(text)) == text


def test_writer_rejects_controls():
    with pytest.raises(ValueError):
        write_rtf("bell\x07")


def test_hand_written_rtf_word_style():
    """The shapes Word actually writes: header destinations to skip,
    formatting words to ignore, \\'hh codepage escapes, \\uN with a
    fallback char to swallow (\\uc1), special-char words."""
    doc = (
        rb"{\rtf1\ansi\ansicpg1252\deff0\uc1 "
        rb"{\fonttbl{\f0\fswiss Helvetica;}}"
        rb"{\colortbl ;\red0\green0\blue0;}"
        rb"{\*\generator Msftedit 5.41.21.2510;}"
        rb"{\info{\author Secret Author}}"
        rb"\pard\f0\fs24 Caf\'e9 costs \'80 3"
        rb"\par second\tab col\line third"
        rb"\par \ldblquote q\rdblquote \endash x}"
    )
    got = extract_rtf_text(doc)
    assert got == "Café costs € 3\nsecond\tcol\nthird\n“q”–x"


def test_uc_state_is_group_scoped():
    # \uc2 inside a group must not leak out of it
    doc = rb"{\rtf1\uc1 A{\uc2 \u233 xxB}\u234 yC}"
    # inner: \u233 swallows 2 fallback bytes ("xx"), B stays
    # outer: \u234 swallows 1 fallback byte ("y"), C stays
    assert extract_rtf_text(doc) == "AéBêC"


def test_bin_run_with_braces_is_skipped():
    doc = b"{\\rtf1 A\\bin5 \x7b\x7d\x5c\x01\x02B}"
    assert extract_rtf_text(doc) == "AB"


def test_nested_skipped_destination():
    doc = rb"{\rtf1 before{\pict{\*\picprop x}89abcdef}after}"
    assert extract_rtf_text(doc) == "beforeafter"


def test_file_newlines_are_not_text():
    doc = b"{\\rtf1 one\r\ntwo\\par\r\nthree}"
    assert extract_rtf_text(doc) == "onetwo\nthree"


def test_structural_rejections():
    with pytest.raises(RtfError):
        extract_rtf_text(b"not rtf at all")
    with pytest.raises(RtfError):
        extract_rtf_text(b"{\\rtf1 unterminated")
    with pytest.raises(RtfError):
        extract_rtf_text(b"{\\rtf1 \\'q9}")  # bad hex
    with pytest.raises(RtfError):
        extract_rtf_text(b"{\\rtf1 \\bin9999 x}")  # truncated bin
    with pytest.raises(RtfError):
        extract_rtf_text(write_rtf("x" * 5000), max_out=100)
    with pytest.raises(RtfError):
        extract_rtf_text(b"{\\rtf1 " + b"{" * 2000 + b"x" + b"}" * 2000 + b"}")


def test_corruption_never_hangs_or_leaks():
    rng = random.Random(3)
    seed = write_rtf(TEXT * 20 + UNI * 5)
    for _ in range(1500):
        blob = bytearray(seed)
        for _ in range(rng.randrange(1, 5)):
            blob[rng.randrange(len(blob))] ^= 1 << rng.randrange(8)
        if rng.random() < 0.3:
            blob = blob[: rng.randrange(len(blob))]
        try:
            out = extract_rtf_text(bytes(blob), max_out=1 << 20)
            assert len(out) <= 1 << 20
        except RtfError:
            pass  # the only exception type the contract allows


def test_doc_router_rtf():
    from mitie_spark.sources.doc_router import (
        extract_document_text,
        sniff_document_kind,
    )

    blob = write_rtf("rtf text\nline two")
    assert sniff_document_kind(blob) == "rtf"
    assert extract_document_text(blob) == "rtf text\nline two"
    # damaged rtf degrades to the html/text path, record kept
    assert isinstance(extract_document_text(blob[:10]), str)


def test_control_word_fallback_counts_as_one_unit():
    """Review-finding repro: with \\uc1, a control-word fallback
    (\\emdash) must be swallowed as ONE unit — not emitted as duplicate
    text with the following real char eaten by the stale skip count."""
    em = "—"
    assert extract_rtf_text(b"{\\rtf1\\ansi\\uc1 a\\u8212\\emdash b}") == f"a{em}b"
    # control symbols count too
    assert extract_rtf_text(b"{\\rtf1\\ansi\\uc1 a\\u8212\\~b}") == f"a{em}b"
    # \bin as fallback: counted once AND its data skipped
    assert (
        extract_rtf_text(b"{\\rtf1\\ansi\\uc1 a\\u8212\\bin2 \x01\x02b}")
        == f"a{em}b"
    )


def test_hex_escape_bytes_count_toward_max_out():
    """Review-finding repro: an all-\\'hh payload must hit the output
    bound like plain text does."""
    blob = b"{\\rtf1\\ansi " + b"\\'41" * 100 + b"}"
    assert extract_rtf_text(blob) == "A" * 100
    with pytest.raises(RtfError):
        extract_rtf_text(blob, max_out=10)


def test_uc_skip_ends_at_group_boundary():
    """Review-finding repro: a group opening right after \\uN must not
    have its '\\*' (or destination word) consumed as the fallback unit —
    that would leak destination junk into the text."""
    doc = b"{\\rtf1\\ansi\\uc1 a\\u8212{\\*\\themedata 554433}b}"
    assert extract_rtf_text(doc) == "a—b"
    doc2 = b"{\\rtf1\\ansi\\uc1 a\\u8212{\\pict 89abcd}b}"
    assert extract_rtf_text(doc2) == "a—b"
