"""DOCX (OOXML WordprocessingML) text extractor + minimal writer.

Role in the engine: alongside PDF (sources/pdf.py), DOCX is the other
office-document payload a web crawl carries in volume; a training-data
pipeline ingests it as text.  A .docx file is a ZIP container whose
main part is ``word/document.xml``; text lives in ``w:t`` runs inside
``w:p`` paragraphs, with ``w:tab``/``w:br``/``w:cr`` as explicit
whitespace elements.  This module extracts that, using only the stdlib
(zipfile + xml.etree) — no new dependencies.

Hostile-input posture: zip bombs are bounded by checking the declared
member size BEFORE reading (and re-checking the actual bytes read —
the declared size is attacker-controlled); XML documents carrying a
DTD are rejected outright (Word never writes one; entity-expansion
bombs need one); any zip/XML parse failure raises DocxError.

Correctness story (tests/test_docx.py): like PDF there is no producer
in this sandbox, so the gate is a round trip through ``write_docx``
(a real, spec-shaped container: [Content_Types].xml, _rels, the
document part), hand-written WordprocessingML exercising what the
writer doesn't emit (tabs/breaks as elements, tables, ignored runs),
and a corruption fuzz contract.

Scale note: Arrow-batched ``mapInPandas``, one document per record,
no shuffle — the image-codec shape.
"""

from __future__ import annotations

import io
import zipfile

from mitie_spark.sources.ooxml import esc_xml, open_container, parse_xml, read_part

__all__ = ["DocxError", "extract_docx_text", "write_docx"]

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


class DocxError(ValueError):
    """Malformed, bombed, or text-free-by-damage .docx."""


def extract_docx_text(data: bytes, max_out: int = 1 << 26) -> str:
    """.docx bytes → text: one line per paragraph, in document order —
    table-cell paragraphs included.  Raises DocxError on anything
    malformed; output bounded by max_out."""
    zf = open_container(data, DocxError)
    xml = read_part(zf, "word/document.xml", max_out, DocxError)
    root = parse_xml(xml, "word/document.xml", DocxError)

    out: list[str] = []
    total = 0

    def para_text(p) -> str:
        parts: list[str] = []
        for el in p.iter():
            tag = el.tag
            if tag == _W + "t":
                parts.append(el.text or "")
            elif tag == _W + "tab":
                parts.append("\t")
            elif tag in (_W + "br", _W + "cr"):
                parts.append("\n")
        return "".join(parts)

    body = root.find(_W + "body")
    if body is None:
        raise DocxError("document has no body")
    def collect(el) -> None:
        # descend through non-paragraph containers (tables, sdt, ...)
        # but NOT into a paragraph: a w:p nested inside another (text
        # boxes, AlternateContent) is already rendered inline by
        # para_text's iter() — re-emitting it would duplicate its text
        nonlocal total
        for child in el:
            if child.tag == _W + "p":
                out.append(para_text(child))
                total += len(out[-1]) + 1
                if total > max_out:
                    raise DocxError("extracted text exceeds max_out")
            else:
                collect(child)

    collect(body)
    return "\n".join(out)


def write_docx(text: str) -> bytes:
    """text → minimal real .docx (one w:p per line).  Round-trip
    partner of extract_docx_text: extract(write(t)) == t for any text
    whose characters are XML-1.0-legal (no controls below 0x20 except
    \\t and \\n)."""
    for ch in text:
        if ch < " " and ch not in "\t\n":
            raise ValueError(f"character {ch!r} is not XML-1.0-encodable")

    paras = "".join(
        '<w:p><w:r><w:t xml:space="preserve">%s</w:t></w:r></w:p>' % esc_xml(line)
        for line in text.split("\n")
    )
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/'
        'wordprocessingml/2006/main"><w:body>%s</w:body></w:document>' % paras
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types"><Default Extension="xml" ContentType="application/'
        'xml"/><Override PartName="/word/document.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.wordprocessingml.'
        'document.main+xml"/></Types>'
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
        "openxmlformats.org/officeDocument/2006/relationships/officeDocument"
        '" Target="word/document.xml"/></Relationships>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", rels)
        zf.writestr("word/document.xml", document)
    return buf.getvalue()
