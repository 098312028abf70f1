"""XLSX / PPTX text extractor tests — sources/xlsx.py, sources/pptx.py.

Same gate pattern as PDF/DOCX (tests/test_pdf.py, test_docx.py): no
producer exists in this sandbox, so the gate is the writer round trip,
hand-written SpreadsheetML / PresentationML for what the writers never
emit (shared strings, rich runs, phonetic hints, cell types, multi-part
rels ordering), zip/XML bomb guards, and the corruption fuzz contract.
"""

from __future__ import annotations

import io
import random
import zipfile

import pytest

from mitie_spark.sources.pptx import PptxError, extract_pptx_text, write_pptx
from mitie_spark.sources.xlsx import XlsxError, extract_xlsx_text, write_xlsx

TEXT = "hello OFFICE world\nsecond line with <tags> & ampersands\ncol1\tcol2\n"
UNI = "naïve café — 中文 日本語 🎉 done"


def test_round_trips():
    for text in (TEXT, UNI, "", "one line", "a\n\nb\n", "a\tb\tc", " lead  sp "):
        assert extract_xlsx_text(write_xlsx(text)) == text
        assert extract_pptx_text(write_pptx(text)) == text


def test_writers_reject_non_xml_controls():
    with pytest.raises(ValueError):
        write_xlsx("bell\x07")
    with pytest.raises(ValueError):
        write_pptx("bell\x07")


# ---------------------------------------------------------------------------
# Hand-written SpreadsheetML (what Excel actually writes, which the
# minimal writer never emits)
# ---------------------------------------------------------------------------

_SSML = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_RNS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_PKREL = "http://schemas.openxmlformats.org/package/2006/relationships"


def _xlsx(parts: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        for name, data in parts.items():
            zf.writestr(name, data)
    return buf.getvalue()


def _wb_parts(sheet_rids: list[tuple[str, str]]) -> dict[str, bytes]:
    """workbook + rels for (rId, target) pairs, in sheet order."""
    sheets = "".join(
        f'<sheet name="S{i}" sheetId="{i + 1}" r:id="{rid}"/>'
        for i, (rid, _) in enumerate(sheet_rids)
    )
    rels = "".join(
        f'<Relationship Id="{rid}" Type="{_RNS}/worksheet" Target="{t}"/>'
        for rid, t in sheet_rids
    )
    return {
        "xl/workbook.xml": (
            f'<workbook xmlns="{_SSML}" xmlns:r="{_RNS}">'
            f"<sheets>{sheets}</sheets></workbook>"
        ).encode(),
        "xl/_rels/workbook.xml.rels": (
            f'<Relationships xmlns="{_PKREL}">{rels}</Relationships>'
        ).encode(),
    }


def test_xlsx_shared_strings_rich_runs_and_phonetics():
    sst = (
        f'<sst xmlns="{_SSML}" count="3" uniqueCount="3">'
        "<si><t>plain</t></si>"
        # rich-text runs concatenate; rPh phonetic hints are NOT text
        "<si><r><t>ri</t></r><r><rPr><b/></rPr><t>ch</t></r>"
        '<rPh sb="0" eb="2"><t>リッチ</t></rPh></si>'
        '<si><t xml:space="preserve"> spaced </t></si></sst>'
    ).encode()
    ws = (
        f'<worksheet xmlns="{_SSML}"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c>'
        '<c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row>'
        "</sheetData></worksheet>"
    ).encode()
    parts = _wb_parts([("rId1", "worksheets/sheet1.xml")])
    parts["xl/sharedStrings.xml"] = sst
    parts["xl/worksheets/sheet1.xml"] = ws
    assert extract_xlsx_text(_xlsx(parts)) == "plain\trich\t spaced "


def test_xlsx_cell_types_and_multisheet_rels_order():
    ws1 = (
        f'<worksheet xmlns="{_SSML}"><sheetData>'
        '<row r="1"><c r="A1"><v>3.25</v></c>'
        '<c r="B1" t="b"><v>1</v></c>'
        '<c r="C1" t="str"><v>formula out</v></c>'
        '<c r="D1" t="e"><v>#REF!</v></c>'
        '<c r="E1" t="inlineStr"><is><t>inline</t></is></c>'
        '<c r="F1"/></row>'
        '<row r="2"><c r="A2"><v>7</v></c></row>'
        "</sheetData></worksheet>"
    ).encode()
    ws2 = (
        f'<worksheet xmlns="{_SSML}"><sheetData>'
        '<row r="1"><c r="A1" t="inlineStr"><is><t>second sheet</t></is></c></row>'
        "</sheetData></worksheet>"
    ).encode()
    # workbook order says rId9 (→ partB) first, rId2 (→ partA) second:
    # extraction must follow workbook order, not part-name order
    parts = _wb_parts(
        [("rId9", "worksheets/partB.xml"), ("rId2", "worksheets/partA.xml")]
    )
    parts["xl/worksheets/partB.xml"] = ws1
    parts["xl/worksheets/partA.xml"] = ws2
    got = extract_xlsx_text(_xlsx(parts))
    assert got == "3.25\t1\tformula out\t#REF!\tinline\t\n7\nsecond sheet"


def test_xlsx_structural_rejections_and_guards():
    with pytest.raises(XlsxError):
        extract_xlsx_text(b"not a zip")
    with pytest.raises(XlsxError):  # no workbook part
        extract_xlsx_text(_xlsx({"xl/other.xml": b"<x/>"}))
    parts = _wb_parts([("rId1", "worksheets/sheet1.xml")])  # missing sheet part
    with pytest.raises(XlsxError):
        extract_xlsx_text(_xlsx(parts))
    # bad shared-string index
    parts = _wb_parts([("rId1", "worksheets/sheet1.xml")])
    parts["xl/worksheets/sheet1.xml"] = (
        f'<worksheet xmlns="{_SSML}"><sheetData>'
        '<row r="1"><c t="s"><v>99</v></c></row></sheetData></worksheet>'
    ).encode()
    with pytest.raises(XlsxError):
        extract_xlsx_text(_xlsx(parts))
    # DTD guard
    parts = _wb_parts([("rId1", "worksheets/sheet1.xml")])
    parts["xl/worksheets/sheet1.xml"] = (
        b"<!DOCTYPE x [<!ENTITY a 'aaaa'>]>"
        b'<worksheet xmlns="%s"><sheetData/></worksheet>' % _SSML.encode()
    )
    with pytest.raises(XlsxError):
        extract_xlsx_text(_xlsx(parts))
    # max_out bound
    with pytest.raises(XlsxError):
        extract_xlsx_text(write_xlsx("x" * 5000), max_out=100)


# ---------------------------------------------------------------------------
# Hand-written PresentationML
# ---------------------------------------------------------------------------

_PML = "http://schemas.openxmlformats.org/presentationml/2006/main"
_DML = "http://schemas.openxmlformats.org/drawingml/2006/main"


def _pptx(slide_rids: list[tuple[str, str]], parts: dict[str, bytes]) -> bytes:
    slds = "".join(
        f'<p:sldId id="{256 + i}" r:id="{rid}"/>'
        for i, (rid, _) in enumerate(slide_rids)
    )
    rels = "".join(
        f'<Relationship Id="{rid}" Type="{_RNS}/slide" Target="{t}"/>'
        for rid, t in slide_rids
    )
    base = {
        "ppt/presentation.xml": (
            f'<p:presentation xmlns:p="{_PML}" xmlns:r="{_RNS}">'
            f"<p:sldIdLst>{slds}</p:sldIdLst></p:presentation>"
        ).encode(),
        "ppt/_rels/presentation.xml.rels": (
            f'<Relationships xmlns="{_PKREL}">{rels}</Relationships>'
        ).encode(),
    }
    base.update(parts)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        for name, data in base.items():
            zf.writestr(name, data)
    return buf.getvalue()


def _slide(body: str) -> bytes:
    return (
        f'<p:sld xmlns:p="{_PML}" xmlns:a="{_DML}">'
        f"<p:cSld><p:spTree>{body}</p:spTree></p:cSld></p:sld>"
    ).encode()


def test_pptx_slide_order_breaks_and_unreferenced_parts():
    s1 = _slide(
        "<p:sp><p:txBody>"
        "<a:p><a:r><a:t>first </a:t></a:r><a:r><a:t>slide</a:t></a:r></a:p>"
        "<a:p><a:r><a:t>with</a:t><a:br/><a:t>break</a:t></a:r></a:p>"
        "</p:txBody></p:sp>"
    )
    s2 = _slide("<p:sp><p:txBody><a:p><a:r><a:t>second</a:t></a:r></a:p></p:txBody></p:sp>")
    notes = _slide("<p:sp><p:txBody><a:p><a:r><a:t>NOTES</a:t></a:r></a:p></p:txBody></p:sp>")
    # sldIdLst order says rId7 (partB) then rId3 (partA); the notes part
    # exists in the zip but is NOT in sldIdLst -> excluded
    blob = _pptx(
        [("rId7", "slides/partB.xml"), ("rId3", "slides/partA.xml")],
        {
            "ppt/slides/partB.xml": s1,
            "ppt/slides/partA.xml": s2,
            "ppt/notesSlides/notesSlide1.xml": notes,
        },
    )
    assert extract_pptx_text(blob) == "first slide\nwith\nbreak\nsecond"


def test_pptx_structural_rejections_and_guards():
    with pytest.raises(PptxError):
        extract_pptx_text(b"not a zip")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("other.txt", "x")
    with pytest.raises(PptxError):  # no presentation part
        extract_pptx_text(buf.getvalue())
    # unresolved slide rel
    blob = _pptx([("rId1", "slides/slide1.xml")], {})
    with pytest.raises(PptxError):
        extract_pptx_text(blob)
    # DTD guard
    blob = _pptx(
        [("rId1", "slides/slide1.xml")],
        {"ppt/slides/slide1.xml": b"<!DOCTYPE x><p:sld/>"},
    )
    with pytest.raises(PptxError):
        extract_pptx_text(blob)
    with pytest.raises(PptxError):
        extract_pptx_text(write_pptx("x" * 5000), max_out=100)


# ---------------------------------------------------------------------------
# Corruption fuzz + router integration
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "write,extract,err",
    [
        (write_xlsx, extract_xlsx_text, XlsxError),
        (write_pptx, extract_pptx_text, PptxError),
    ],
)
def test_corruption_never_hangs_or_leaks(write, extract, err):
    rng = random.Random(11)
    seed = write(TEXT * 20)
    for _ in range(1200):
        blob = bytearray(seed)
        for _ in range(rng.randrange(1, 5)):
            blob[rng.randrange(len(blob))] ^= 1 << rng.randrange(8)
        if rng.random() < 0.3:
            blob = blob[: rng.randrange(len(blob))]
        try:
            out = extract(bytes(blob), max_out=1 << 20)
            assert len(out) <= 1 << 20
        except err:
            pass  # the only exception type the contract allows


def test_doc_router_office_formats():
    from mitie_spark.sources.doc_router import (
        extract_document_text,
        sniff_document_kind,
    )

    xl = write_xlsx("sheet text\tcell two")
    assert sniff_document_kind(xl) == "xlsx"
    assert extract_document_text(xl) == "sheet text\tcell two"
    pp = write_pptx("slide text\nline two")
    assert sniff_document_kind(pp) == "pptx"
    assert extract_document_text(pp) == "slide text\nline two"
    # a damaged xlsx degrades to the html/text path, record kept
    got = extract_document_text(xl[:60])
    assert isinstance(got, str)


def test_xlsx_negative_shared_index_rejected():
    """Review-finding repro: a hostile <v>-1</v> shared-string index
    must raise, not resolve through Python negative indexing."""
    sst = (
        f'<sst xmlns="{_SSML}"><si><t>only</t></si></sst>'
    ).encode()
    ws = (
        f'<worksheet xmlns="{_SSML}"><sheetData>'
        '<row r="1"><c t="s"><v>-1</v></c></row></sheetData></worksheet>'
    ).encode()
    parts = _wb_parts([("rId1", "worksheets/sheet1.xml")])
    parts["xl/sharedStrings.xml"] = sst
    parts["xl/worksheets/sheet1.xml"] = ws
    with pytest.raises(XlsxError):
        extract_xlsx_text(_xlsx(parts))
