"""DOCX text extractor tests — sources/docx.py.

Same gate pattern as PDF (tests/test_pdf.py): no producer exists in
this sandbox, so the gate is the write_docx round trip, hand-written
WordprocessingML for what the writer never emits, zip/XML bomb guards,
and the corruption fuzz contract.
"""

from __future__ import annotations

import io
import random
import zipfile

import pytest

from mitie_spark.sources.docx import DocxError, extract_docx_text, write_docx

TEXT = "hello DOCX world\nsecond line with <tags> & ampersands\n\ttabbed\n"
UNI = "naïve café — 中文 日本語 🎉 done"


def test_round_trip():
    for text in (TEXT, UNI, "", "one line", "a\n\nb\n"):
        assert extract_docx_text(write_docx(text)) == text


def test_writer_rejects_non_xml_controls():
    with pytest.raises(ValueError):
        write_docx("bell\x07")


def _docx_with_document(document_xml: bytes) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("word/document.xml", document_xml)
    return buf.getvalue()


_NS = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'


def test_hand_written_wordprocessingml():
    # tabs/breaks as elements, split runs, table-cell paragraphs,
    # run properties to ignore — the shapes Word actually writes
    doc = (
        "<w:document %s><w:body>"
        "<w:p><w:r><w:rPr><w:b/></w:rPr><w:t>Hel</w:t></w:r>"
        "<w:r><w:t xml:space=\"preserve\">lo </w:t></w:r>"
        "<w:r><w:tab/><w:t>tabbed</w:t><w:br/><w:t>broken</w:t></w:r></w:p>"
        "<w:tbl><w:tr><w:tc><w:p><w:r><w:t>cell1</w:t></w:r></w:p></w:tc>"
        "<w:tc><w:p><w:r><w:t>cell2</w:t></w:r></w:p></w:tc></w:tr></w:tbl>"
        "<w:p><w:r><w:t>after</w:t></w:r></w:p>"
        "</w:body></w:document>" % _NS
    ).encode()
    got = extract_docx_text(_docx_with_document(doc))
    assert got == "Hello \ttabbed\nbroken\ncell1\ncell2\nafter"


def test_nested_paragraph_not_duplicated():
    """Review finding: a w:p nested in another (text boxes,
    AlternateContent) renders inline exactly once — body-level
    collection must not re-emit it as its own paragraph."""
    doc = (
        "<w:document %s><w:body>"
        "<w:p><w:r><w:t>outer </w:t></w:r>"
        "<w:pict><w:txbxContent><w:p><w:r><w:t>boxed</w:t></w:r></w:p>"
        "</w:txbxContent></w:pict></w:p>"
        "<w:p><w:r><w:t>next</w:t></w:r></w:p>"
        "</w:body></w:document>" % _NS
    ).encode()
    assert extract_docx_text(_docx_with_document(doc)) == "outer boxed\nnext"


def test_bomb_and_dtd_guards():
    # declared-size guard: a member whose file_size lies is re-checked
    big = _docx_with_document(b"<w:document %s><w:body/></w:document>" % _NS.encode())
    with pytest.raises(DocxError):
        extract_docx_text(write_docx("x" * 5000), max_out=100)
    assert extract_docx_text(big) == ""
    dtd = _docx_with_document(
        b"<!DOCTYPE x [<!ENTITY a 'aaaa'>]><w:document %s>"
        b"<w:body><w:p><w:r><w:t>&a;</w:t></w:r></w:p></w:body>"
        b"</w:document>" % _NS.encode()
    )
    with pytest.raises(DocxError):
        extract_docx_text(dtd)


def test_structural_rejections():
    with pytest.raises(DocxError):
        extract_docx_text(b"not a zip")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("other.txt", "x")
    with pytest.raises(DocxError):
        extract_docx_text(buf.getvalue())  # no document part
    with pytest.raises(DocxError):
        extract_docx_text(_docx_with_document(b"<broken"))


def test_corruption_never_hangs_or_leaks():
    rng = random.Random(5)
    seed = write_docx(TEXT * 20)
    for _ in range(1500):
        blob = bytearray(seed)
        for _ in range(rng.randrange(1, 5)):
            blob[rng.randrange(len(blob))] ^= 1 << rng.randrange(8)
        if rng.random() < 0.3:
            blob = blob[: rng.randrange(len(blob))]
        try:
            out = extract_docx_text(bytes(blob), max_out=1 << 20)
            assert len(out) <= 1 << 20
        except DocxError:
            pass  # the only exception type the contract allows


def test_doc_router():
    """sources/doc_router.py: magic-based routing with degrade-to-html
    on extractor failure."""
    from mitie_spark.sources.doc_router import (
        extract_document_text,
        sniff_document_kind,
    )
    from mitie_spark.sources.pdf import write_pdf

    assert sniff_document_kind(b"<html><p>x</p></html>") == "html"
    assert extract_document_text(b"<html><p>hi there</p></html>") == "hi there"
    pdf = write_pdf(["pdf text\nline two"])
    assert sniff_document_kind(pdf) == "pdf"
    assert extract_document_text(pdf) == "pdf text\nline two"
    # BOM/preamble before %PDF- (real generators emit this)
    assert sniff_document_kind(b"\xef\xbb\xbfjunk" + pdf) == "pdf"
    dx = write_docx("docx text\nline two")
    assert sniff_document_kind(dx) == "docx"
    assert extract_document_text(dx) == "docx text\nline two"
    # a broken PDF degrades to the html/text path, record kept
    broken = pdf[:40]
    got = extract_document_text(broken)
    assert isinstance(got, str)
    # a plain ZIP that is not a docx routes to html, not DocxError
    import io as _io
    import zipfile as _zf

    buf = _io.BytesIO()
    with _zf.ZipFile(buf, "w") as z:
        z.writestr("data.txt", "zipped plain text")
    assert sniff_document_kind(buf.getvalue()) == "html"
    assert isinstance(extract_document_text(buf.getvalue()), str)
