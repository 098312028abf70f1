"""XLSX (OOXML SpreadsheetML) text extractor + minimal writer.

Role in the engine: spreadsheets are the third office payload a crawl
carries in volume (after PDF and DOCX, sources/pdf.py / sources/docx.py);
a training-data pipeline ingests their cell text.  A .xlsx file is a ZIP
container: ``xl/workbook.xml`` lists sheets (name + r:id),
``xl/_rels/workbook.xml.rels`` maps r:id → worksheet part, cell text
lives either in ``xl/sharedStrings.xml`` (``si`` entries, plain ``t`` or
rich-text ``r``/``t`` runs, with ``rPh`` phonetic hints that are NOT
text) or inline in the cell (``t="inlineStr"``/``t="str"``), and numbers
sit raw in ``v``.  Extraction: cells of a row joined by tab, rows by
newline, sheets in workbook order — stdlib only (zipfile + xml.etree).

Hostile-input posture (same contract as sources/docx.py): declared member
sizes checked before reading AND actual bytes re-checked, DTDs rejected
(entity-bomb guard), any zip/XML damage raises XlsxError.

Correctness story (tests/test_office.py): no producer in this sandbox, so
the gate is a round trip through ``write_xlsx`` (a real, spec-shaped
container using inline strings) plus hand-written SpreadsheetML covering
what the writer doesn't emit (shared strings, rich runs, phonetic hints,
numbers, booleans, multi-sheet order via rels) and a corruption fuzz
contract.

Scale note: pure per-record function for Arrow ``mapInPandas`` stages —
the image-codec shape, no shuffle.
"""

from __future__ import annotations

import io
import posixpath
import zipfile

from mitie_spark.sources.ooxml import esc_xml, open_container, parse_xml, read_part

__all__ = ["XlsxError", "extract_xlsx_text", "write_xlsx"]

_M = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_RID = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
)


class XlsxError(ValueError):
    """Malformed, bombed, or text-free-by-damage .xlsx."""


def _read_part(zf: zipfile.ZipFile, name: str, max_out: int) -> bytes:
    return read_part(zf, name, max_out, XlsxError)


def _parse(xml: bytes, name: str):
    return parse_xml(xml, name, XlsxError)


def _si_text(si) -> str:
    """Shared-string entry text: plain t, or rich r/t runs; rPh phonetic
    runs carry furigana hints, not cell text — skipped."""
    parts: list[str] = []

    # manual walk so rPh subtrees can be excluded (ElementTree's iter()
    # cannot prune)
    def walk(el) -> None:
        for child in el:
            tag = child.tag
            if tag == _M + "rPh":
                continue
            if tag == _M + "t":
                parts.append(child.text or "")
            else:
                walk(child)

    walk(si)
    return "".join(parts)


def _cell_text(c, shared: list[str]) -> str:
    ctype = c.get("t", "n")
    if ctype == "inlineStr":
        is_el = c.find(_M + "is")
        return _si_text(is_el) if is_el is not None else ""
    v = c.find(_M + "v")
    raw = (v.text or "") if v is not None else ""
    if ctype == "s":
        try:
            idx = int(raw)
            if idx < 0:  # Python negative indexing must not "work" here
                raise IndexError
            return shared[idx]
        except (ValueError, IndexError):
            raise XlsxError(f"bad shared-string index {raw!r}") from None
    # n(umber), str (formula string), b(ool 0/1), e(rror literal) — the
    # stored value IS the text
    return raw


def extract_xlsx_text(data: bytes, max_out: int = 1 << 26) -> str:
    """.xlsx bytes → text: one line per row (cells tab-joined), sheets
    concatenated in workbook order.  Raises XlsxError on anything
    malformed; output bounded by max_out."""
    zf = open_container(data, XlsxError)

    wb = _parse(_read_part(zf, "xl/workbook.xml", max_out), "workbook")
    rels_root = _parse(
        _read_part(zf, "xl/_rels/workbook.xml.rels", max_out), "workbook rels"
    )
    rid_to_target = {
        rel.get("Id"): rel.get("Target", "")
        for rel in rels_root.iter(_REL + "Relationship")
    }

    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        sst = _parse(
            _read_part(zf, "xl/sharedStrings.xml", max_out), "sharedStrings"
        )
        shared = [_si_text(si) for si in sst.iter(_M + "si")]

    sheets_el = wb.find(_M + "sheets")
    if sheets_el is None:
        raise XlsxError("workbook has no sheets element")

    out: list[str] = []
    total = 0
    for sheet in sheets_el.iter(_M + "sheet"):
        rid = sheet.get(_RID)
        target = rid_to_target.get(rid)
        if not target:
            raise XlsxError(f"sheet rel {rid!r} unresolved")
        # rels targets are relative to xl/ unless rooted
        part = target.lstrip("/") if target.startswith("/") else posixpath.normpath(
            posixpath.join("xl", target)
        )
        ws = _parse(_read_part(zf, part, max_out), part)
        for row in ws.iter(_M + "row"):
            cells = [
                _cell_text(c, shared) for c in row if c.tag == _M + "c"
            ]
            out.append("\t".join(cells))
            total += len(out[-1]) + 1
            if total > max_out:
                raise XlsxError("extracted text exceeds max_out")
    return "\n".join(out)


_esc = esc_xml


def write_xlsx(text: str) -> bytes:
    """text → minimal real .xlsx: one row per line, one cell per
    tab-separated field, inline strings.  Round-trip partner of
    extract_xlsx_text: extract(write(t)) == t for any XML-1.0-legal
    text (no controls below 0x20 except \\t and \\n)."""
    for ch in text:
        if ch < " " and ch not in "\t\n":
            raise ValueError(f"character {ch!r} is not XML-1.0-encodable")

    rows = []
    for i, line in enumerate(text.split("\n"), start=1):
        cells = "".join(
            '<c t="inlineStr"><is><t xml:space="preserve">%s</t></is></c>'
            % _esc(field)
            for field in line.split("\t")
        )
        rows.append('<row r="%d">%s</row>' % (i, cells))
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>%s</sheetData></worksheet>'
        % "".join(rows)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.'
        'org/officeDocument/2006/relationships"><sheets>'
        '<sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
        "openxmlformats.org/officeDocument/2006/relationships/worksheet"
        '" Target="worksheets/sheet1.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types"><Default Extension="xml" ContentType="application/'
        'xml"/><Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        "vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"
        '"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
        'worksheet+xml"/></Types>'
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
        "openxmlformats.org/officeDocument/2006/relationships/officeDocument"
        '" Target="xl/workbook.xml"/></Relationships>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()
