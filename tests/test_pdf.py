"""PDF text extractor tests — sources/pdf.py.

No PDF producer or consumer exists in this sandbox (no poppler/mupdf/
ghostscript/pypdf), so — like the WARC envelope — the gate is a
self-contained round trip through the deterministic writer, which emits
real spec features (classic xref and xref-stream+ObjStm, Flate/LZW/
ASCII85 filters, WinAnsi and Identity-H+ToUnicode text), plus
known-answer filter vectors, hand-assembled documents exercising the
operators and encodings the writer itself never uses, and the
hostile-input fuzz contract.
"""

from __future__ import annotations

import random
import zlib

import pytest

from mitie_spark.sources.pdf import (
    PdfError,
    _ascii85_decode,
    _lzw_decode,
    _lzw_encode,
    _png_unpredict,
    _runlength_decode,
    extract_pdf_text,
    write_pdf,
)

TEXT = "hello PDF world\nsecond line with (parens) and \\ backslash\n\ttabbed"
UNI = "naïve café — 中文 日本語 «guillemets» 🎉 done"


@pytest.mark.parametrize("variant", ["classic", "xrefstream"])
@pytest.mark.parametrize("compress", ["none", "flate", "lzw", "a85flate"])
@pytest.mark.parametrize("font", ["winansi", "tounicode2"])
def test_round_trip_all_variants(variant, compress, font):
    pages = [TEXT, "page two\nlast line"]
    blob = write_pdf(pages, variant, compress, font)
    assert extract_pdf_text(blob) == "\n".join(pages)


def test_unicode_and_non_bmp():
    blob = write_pdf([UNI], "xrefstream", "flate", "tounicode2")
    assert extract_pdf_text(blob) == UNI


def test_binary_safe_strings():
    # control bytes + \r survive via octal escapes in literal strings
    tricky = "a\rb\x07c  double  spaces\nd"
    blob = write_pdf([tricky], "classic", "none", "tounicode2")
    assert extract_pdf_text(blob) == tricky


def test_blank_lines_and_trailing_newline_round_trip():
    """Review finding: blank lines and trailing newlines must survive —
    consecutive line advances are a real blank line, and page text is
    not rstripped."""
    for text in ("a\n\nb", "a\nb\n", "\nleading", "a\n\n\nb\n\n"):
        blob = write_pdf([text], "classic", "flate", "winansi")
        assert extract_pdf_text(blob) == text, repr(text)
    # across a page boundary too
    blob = write_pdf(["a\n", "\nb"], "xrefstream", "flate", "tounicode2")
    assert extract_pdf_text(blob) == "a\n\n\nb"


def test_bfrange_destination_overflow_rejected():
    from mitie_spark.sources.pdf import PdfError as E, _parse_tounicode

    with pytest.raises(E):
        _parse_tounicode(
            b"1 beginbfrange <0000> <0002> <ffff> endbfrange"
        )


def test_short_decodeparms_does_not_truncate_filters():
    """Review finding: /DecodeParms shorter than /Filter must not skip
    the remaining filters."""
    import zlib as _z

    from mitie_spark.sources.pdf import _decode_stream

    payload = b"the payload"
    raw = _z.compress(payload).hex().encode("ascii") + b">"
    sdict = {
        "Filter": ["ASCIIHexDecode", "FlateDecode"],
        "DecodeParms": [None],
    }
    assert _decode_stream(raw, sdict, lambda v: v, 1 << 20) == payload


def test_flate_bomb_capped():
    """A small flate stream inflating past the cap must raise before
    materializing the whole output."""
    import zlib as _z

    from mitie_spark.sources.pdf import PdfError as E, _decode_stream

    bomb = _z.compress(b"\x00" * 50_000_000)  # ~50 KB -> 50 MB
    with pytest.raises(E):
        _decode_stream(bomb, {"Filter": "FlateDecode"}, lambda v: v, 1 << 20)


def test_freed_object_shadows_older_revision():
    """Review finding: a newer revision's FREE entry must delete the
    object — not let the /Prev section resurrect it."""
    base = write_pdf(["soon deleted"], "classic", "none", "winansi")
    prev_xref = int(base[base.rfind(b"startxref") + 9 :].split()[0])
    out = bytearray(base)
    xref_at = len(out)
    out += b"xref\n0 1\n0000000000 65535 f \n4 1\n0000000000 00001 f \n"
    out += (
        b"trailer\n<< /Size 7 /Root 1 0 R /Prev %d >>\nstartxref\n%d\n%%%%EOF\n"
        % (prev_xref, xref_at)
    )
    # object 4 (the content stream) is freed: the page extracts empty
    assert extract_pdf_text(bytes(out)) == ""


def test_incremental_update_prev_chain():
    """An appended update section (new object 4, xref with /Prev back
    to the base) must win over the original — newest entry first along
    the /Prev chain, the way real incrementally-saved PDFs work."""
    base = write_pdf(["original text line"], "classic", "none", "winansi")
    new_content = b"BT /F1 12 Tf 72 720 Td (updated text line) Tj ET"
    prev_xref = int(base[base.rfind(b"startxref") + 9 :].split()[0])
    out = bytearray(base)
    off4 = len(out)
    out += (
        b"4 0 obj\n<< /Length %d >>\nstream\n" % len(new_content)
        + new_content
        + b"\nendstream\nendobj\n"
    )
    xref_at = len(out)
    out += b"xref\n0 1\n0000000000 65535 f \n4 1\n%010d 00000 n \n" % off4
    out += (
        b"trailer\n<< /Size 7 /Root 1 0 R /Prev %d >>\nstartxref\n%d\n%%%%EOF\n"
        % (prev_xref, xref_at)
    )
    assert extract_pdf_text(bytes(out)) == "updated text line"


def test_broken_xref_rescued():
    good = write_pdf([TEXT], "classic", "flate", "winansi")
    broken = good[: good.rfind(b"xref")] + b"GARBAGE NO XREF HERE"
    assert extract_pdf_text(broken) == TEXT


def test_encrypted_rejected():
    good = write_pdf([TEXT], "classic", "flate", "winansi")
    enc = good.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
    with pytest.raises(PdfError):
        extract_pdf_text(enc)


# ---------------------------------------------------------------------------
# Filter known answers / round trips
# ---------------------------------------------------------------------------


def test_ascii85_known_answers():
    assert _ascii85_decode(b"9jqo^~>") == b"Man "
    assert _ascii85_decode(b"z~>") == b"\x00\x00\x00\x00"
    assert _ascii85_decode(b"<~9jqo^BlbD-BleB1DJ+*+F(f,q~>") == b"Man is distinguished"
    with pytest.raises(PdfError):
        _ascii85_decode(b"9jqo^v~>")  # 'v' is out of range


def test_runlength_known_answer():
    # 2 → 3 literal bytes; 254 → 3 copies; 128 EOD
    assert _runlength_decode(b"\x02abc\xfeZ\x80") == b"abcZZZ"


def test_lzw_round_trip_both_earlychange():
    rng = random.Random(1)
    data = bytes(rng.choice(b"abcd") for _ in range(5000)) * 3
    for early in (0, 1):
        enc = _lzw_encode(data, early)
        assert _lzw_decode(enc, early, 1 << 20) == data
        # table-reset path: long enough input forces a mid-stream clear
    with pytest.raises(PdfError):
        _lzw_decode(_lzw_encode(b"x" * 100), 1, 10)  # cap enforced


def test_png_predictors_invert():
    # forward-filter each type by hand; _png_unpredict must invert it
    rng = random.Random(2)
    cols, rows, bpp = 11, 7, 1
    raw = [bytes(rng.randrange(256) for _ in range(cols)) for _ in range(rows)]
    for ft in (0, 1, 2, 3, 4):
        enc = bytearray()
        prev = bytes(cols)
        for row in raw:
            enc.append(ft)
            for i in range(cols):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if ft == 0:
                    pred = 0
                elif ft == 1:
                    pred = a
                elif ft == 2:
                    pred = b
                elif ft == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc.append((row[i] - pred) & 0xFF)
            prev = row
        assert _png_unpredict(bytes(enc), cols, 1, 8) == b"".join(raw), ft


# ---------------------------------------------------------------------------
# Hand-assembled documents: operators and encodings the writer never uses
# ---------------------------------------------------------------------------


def _classic_pdf(content: bytes, font_body: bytes) -> bytes:
    """Minimal classic-xref document around a raw content stream."""
    bodies = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
        b" /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        5: font_body,
    }
    out = bytearray(b"%PDF-1.5\n")
    offs = {}
    for num in (1, 2, 3, 5):
        offs[num] = len(out)
        out += b"%d 0 obj\n" % num + bodies[num] + b"\nendobj\n"
    offs[4] = len(out)
    out += (
        b"4 0 obj\n<< /Length %d >>\nstream\n" % len(content)
        + content
        + b"\nendstream\nendobj\n"
    )
    xref_at = len(out)
    out += b"xref\n0 6\n0000000000 65535 f \n"
    for num in range(1, 6):
        out += b"%010d 00000 n \n" % offs[num]
    out += b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(out)


_T1 = b"<< /Type /Font /Subtype /Type1 /BaseFont /H >>"


def test_tj_kerning_and_quote_operators():
    content = (
        b"BT /F1 12 Tf 72 720 Td"
        b" [(Hel) 10 (lo) -500 (world)] TJ"
        b" T* (next) Tj"
        b" (apo) '"
        b" 1 2 (quoted) \""
        b" ET"
    )
    got = extract_pdf_text(_classic_pdf(content, _T1))
    # small kern (+10) joins, large kern (-500) reads as a space;
    # ' and " start new lines
    assert got == "Hello world\nnext\napo\nquoted"


def test_differences_encoding_and_glyph_names():
    font = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /H /Encoding"
        b" << /BaseEncoding /WinAnsiEncoding /Differences"
        b" [65 /bullet 97 /adieresis /endash /uni20AC] >> >>"
    )
    content = b"BT /F1 12 Tf 72 720 Td (AaBbc \x99) Tj ET"
    got = extract_pdf_text(_classic_pdf(content, font))
    # A->bullet, a->adieresis, b(98)->endash, c(99)->euro via uniXXXX;
    # B keeps its WinAnsi value, 0x99 is WinAnsi trademark
    assert got == "•äB–€ ™"


def test_inline_image_skipped():
    # the binary contains a bare 'EI' not delimited by whitespace — the
    # skipper must pass it and resume at the real EI
    content = (
        b"BT /F1 12 Tf 72 720 Td (before) Tj ET\n"
        b"BI /W 2 /H 1 /BPC 8 /CS /G ID xEIx\x00\xffzz EI\n"
        b"BT /F1 12 Tf 72 700 Td (after) Tj ET"
    )
    got = extract_pdf_text(_classic_pdf(content, _T1))
    assert got == "before\nafter"


def test_standard_encoding_quotes():
    font = b"<< /Type /Font /Subtype /Type1 /BaseFont /H >>"  # default Standard
    content = b"BT /F1 12 Tf 72 720 Td (it\x27s \x60q\x27) Tj ET"
    got = extract_pdf_text(_classic_pdf(content, font))
    assert got == "it’s ‘q’"


def test_hex_strings_and_octal_escapes():
    content = b"BT /F1 12 Tf 72 720 Td <48656c6c 6f> Tj (\\110\\151\\41) Tj ET"
    font = b"<< /Type /Font /Subtype /Type1 /BaseFont /H /Encoding /WinAnsiEncoding >>"
    assert extract_pdf_text(_classic_pdf(content, font)) == "HelloHi!"


def test_bfrange_forms():
    # hand-build a Type0 font whose ToUnicode uses bfrange in both the
    # incrementing and array destination forms
    cmap = (
        b"1 begincodespacerange <0000> <ffff> endcodespacerange\n"
        b"1 beginbfrange <0001> <0003> <0041> endbfrange\n"
        b"1 beginbfrange <0010> <0011> [<0058> <00590059>] endbfrange\n"
    )
    bodies = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Resources"
        b" << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        5: b"<< /Type /Font /Subtype /Type0 /BaseFont /S"
        b" /Encoding /Identity-H /ToUnicode 6 0 R >>",
    }
    content = b"BT /F1 12 Tf 72 720 Td <000100020003 0010 0011> Tj ET"
    out = bytearray(b"%PDF-1.5\n")
    offs = {}
    for num in (1, 2, 3, 5):
        offs[num] = len(out)
        out += b"%d 0 obj\n" % num + bodies[num] + b"\nendobj\n"
    for num, data in ((4, content), (6, cmap)):
        offs[num] = len(out)
        out += (
            b"%d 0 obj\n<< /Length %d >>\nstream\n" % (num, len(data))
            + data
            + b"\nendstream\nendobj\n"
        )
    xref_at = len(out)
    out += b"xref\n0 7\n0000000000 65535 f \n"
    for num in range(1, 7):
        out += b"%010d 00000 n \n" % offs[num]
    out += b"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % xref_at
    assert extract_pdf_text(bytes(out)) == "ABCXYY"


# ---------------------------------------------------------------------------
# Hostile-input contract
# ---------------------------------------------------------------------------


def test_corruption_never_hangs_or_leaks():
    rng = random.Random(99)
    seeds = [
        write_pdf([TEXT], v, c, f)
        for v in ("classic", "xrefstream")
        for c in ("flate", "lzw")
        for f in ("winansi", "tounicode2")
    ]
    for _ in range(1500):
        blob = bytearray(rng.choice(seeds))
        for _ in range(rng.randrange(1, 6)):
            blob[rng.randrange(len(blob))] ^= 1 << rng.randrange(8)
        if rng.random() < 0.3:
            blob = blob[: rng.randrange(len(blob))]
        try:
            out = extract_pdf_text(bytes(blob), max_out=1 << 20)
            assert len(out) <= 1 << 20
        except PdfError:
            pass  # the only exception type the contract allows


def test_text_cap_enforced():
    blob = write_pdf(["x" * 5000] * 4, "classic", "flate", "winansi")
    with pytest.raises(PdfError):
        extract_pdf_text(blob, max_out=1000)


def test_structural_rejections():
    with pytest.raises(PdfError):
        extract_pdf_text(b"not a pdf at all")
    with pytest.raises(PdfError):
        extract_pdf_text(b"%PDF-1.5\nnothing else")
    # unsupported content filter fails fast, not silently empty
    blob = write_pdf([TEXT], "classic", "none", "winansi").replace(
        b"<< /Length", b"<< /Filter /DCTDecode /Length"
    )
    with pytest.raises(PdfError):
        extract_pdf_text(blob)


# ---------------------------------------------------------------------------
# Second-review regression pins
# ---------------------------------------------------------------------------


def test_tounicode_work_bound():
    """Repeated maximal bfranges must hit a bound quickly, not spin for
    minutes inside the per-range check."""
    import time

    from mitie_spark.sources.pdf import PdfError as E, _parse_tounicode

    payload = b"1 beginbfrange <0000> <ffff> <0000> endbfrange\n" * 2000
    t0 = time.time()
    with pytest.raises(E):
        _parse_tounicode(payload)
    assert time.time() - t0 < 5


def test_max_out_is_global_across_pages():
    blob = write_pdf(["x" * 60] * 5, "classic", "none", "winansi")
    with pytest.raises(PdfError):
        extract_pdf_text(blob, max_out=100)


def test_ascii85_partial_group_overflow():
    with pytest.raises(PdfError):
        _ascii85_decode(b"uu~>")


def test_hostile_xref_types_fail_fast():
    """Non-array /W, /Index, /Filter must raise PdfError (or rescue),
    never TypeError."""
    blob = write_pdf([TEXT], "xrefstream", "flate", "winansi")
    for needle, repl in (
        (b"/W [1 4 2]", b"/W 5"),
        (b"/Filter /FlateDecode", b"/Filter 5"),
    ):
        bad = blob.replace(needle, repl)
        assert bad != blob, needle
        try:
            extract_pdf_text(bad)
        except PdfError:
            pass  # the only allowed exception


def test_xrefstm_self_cycle_terminates():
    base = write_pdf([TEXT], "classic", "none", "winansi")
    prev_xref = int(base[base.rfind(b"startxref") + 9 :].split()[0])
    out = bytearray(base)
    xref_at = len(out)
    # a classic section whose /XRefStm points at THIS section's offset
    out += b"xref\n0 1\n0000000000 65535 f \n"
    out += (
        b"trailer\n<< /Size 7 /Root 1 0 R /XRefStm %d /Prev %d >>\n"
        b"startxref\n%d\n%%%%EOF\n" % (xref_at, prev_xref, xref_at)
    )
    # must terminate with either the text (cycle skipped) or PdfError
    try:
        got = extract_pdf_text(bytes(out))
        assert got == TEXT
    except PdfError:
        pass


def test_hybrid_xrefstm_precedence():
    """§7.5.8.4: the classic table marks stream-referenced objects free
    to hide them from PDF-1.4 readers; the XRefStm must win."""
    import zlib as _z

    base = write_pdf([TEXT], "classic", "none", "winansi")
    prev_xref = int(base[base.rfind(b"startxref") + 9 :].split()[0])
    off4 = base.find(b"4 0 obj")
    out = bytearray(base)
    # an XRef stream (object 7) declaring object 4 in-use at its offset
    rows = bytearray()
    prev = bytes(7)
    for row in (bytes((1,)) + off4.to_bytes(4, "big") + b"\x00\x00",):
        rows.append(2)
        rows.extend((row[i] - prev[i]) & 0xFF for i in range(7))
    xdata = _z.compress(bytes(rows))
    stm_at = len(out)
    out += (
        b"7 0 obj\n<< /Type /XRef /Size 8 /W [1 4 2] /Index [4 1] /Root 1 0 R"
        b" /Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 7 >>"
        b" /Length %d >>\nstream\n" % len(xdata)
    ) + xdata + b"\nendstream\nendobj\n"
    # a classic update that marks object 4 FREE but carries /XRefStm
    xref_at = len(out)
    out += b"xref\n0 1\n0000000000 65535 f \n4 1\n0000000000 00001 f \n"
    out += (
        b"trailer\n<< /Size 8 /Root 1 0 R /XRefStm %d /Prev %d >>\n"
        b"startxref\n%d\n%%%%EOF\n" % (stm_at, prev_xref, xref_at)
    )
    assert extract_pdf_text(bytes(out)) == TEXT


def test_form_xobject_text_extracted():
    """Text inside a /Subtype /Form XObject reached via Do."""
    form = b"BT /F1 12 Tf 72 700 Td (inside form) Tj ET"
    bodies = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Resources << /Font"
        b" << /F1 5 0 R >> /XObject << /Fm0 6 0 R >> >> /Contents 4 0 R >>",
        5: _T1,
    }
    content = b"BT /F1 12 Tf 72 720 Td (before) Tj ET /Fm0 Do"
    out = bytearray(b"%PDF-1.5\n")
    offs = {}
    for num in (1, 2, 3, 5):
        offs[num] = len(out)
        out += b"%d 0 obj\n" % num + bodies[num] + b"\nendobj\n"
    for num, data, extra in ((4, content, b""), (6, form, b" /Subtype /Form")):
        offs[num] = len(out)
        out += (
            b"%d 0 obj\n<< /Length %d%s >>\nstream\n" % (num, len(data), extra)
            + data
            + b"\nendstream\nendobj\n"
        )
    xref_at = len(out)
    out += b"xref\n0 7\n0000000000 65535 f \n"
    for num in range(1, 7):
        out += b"%010d 00000 n \n" % offs[num]
    out += b"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % xref_at
    assert extract_pdf_text(bytes(out)) == "before\ninside form"
