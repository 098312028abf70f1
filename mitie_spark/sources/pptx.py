"""PPTX (OOXML PresentationML) text extractor + minimal writer.

Role in the engine: slide decks round out the office payloads a crawl
carries (PDF / DOCX / XLSX — sources/pdf.py, docx.py, xlsx.py).  A .pptx
file is a ZIP container: ``ppt/presentation.xml`` orders slides via its
``p:sldIdLst`` r:id references, ``ppt/_rels/presentation.xml.rels`` maps
r:id → slide part, and slide text lives in DrawingML ``a:t`` runs inside
``a:p`` paragraphs (``a:br`` = explicit line break).  Extraction: one
line per a:p paragraph, slides in presentation order — stdlib only.

Hostile-input posture (same contract as sources/docx.py / xlsx.py):
declared member sizes checked before reading AND re-checked after, DTDs
rejected, any zip/XML damage raises PptxError.

Correctness story (tests/test_office.py): round trip through
``write_pptx`` plus hand-written PresentationML covering what the writer
doesn't emit (multi-slide rels order, breaks, tables, notes excluded)
and a corruption fuzz contract.

Scale note: pure per-record function for Arrow ``mapInPandas`` stages —
no shuffle.
"""

from __future__ import annotations

import io
import posixpath
import zipfile

from mitie_spark.sources.ooxml import esc_xml, open_container, parse_xml, read_part

__all__ = ["PptxError", "extract_pptx_text", "write_pptx"]

_P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_RID = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
)


class PptxError(ValueError):
    """Malformed, bombed, or text-free-by-damage .pptx."""


def _read_part(zf: zipfile.ZipFile, name: str, max_out: int) -> bytes:
    return read_part(zf, name, max_out, PptxError)


def _parse(xml: bytes, name: str):
    return parse_xml(xml, name, PptxError)


def extract_pptx_text(data: bytes, max_out: int = 1 << 26) -> str:
    """.pptx bytes → text: one line per a:p paragraph, slides in
    presentation order (sldIdLst → rels).  Raises PptxError on anything
    malformed; output bounded by max_out."""
    zf = open_container(data, PptxError)

    pres = _parse(
        _read_part(zf, "ppt/presentation.xml", max_out), "presentation"
    )
    rels_root = _parse(
        _read_part(zf, "ppt/_rels/presentation.xml.rels", max_out),
        "presentation rels",
    )
    rid_to_target = {
        rel.get("Id"): rel.get("Target", "")
        for rel in rels_root.iter(_REL + "Relationship")
    }

    sld_lst = pres.find(_P + "sldIdLst")
    if sld_lst is None:
        raise PptxError("presentation has no sldIdLst")

    out: list[str] = []
    total = 0
    for sld in sld_lst.iter(_P + "sldId"):
        rid = sld.get(_RID)
        target = rid_to_target.get(rid)
        if not target:
            raise PptxError(f"slide rel {rid!r} unresolved")
        part = target.lstrip("/") if target.startswith("/") else posixpath.normpath(
            posixpath.join("ppt", target)
        )
        slide = _parse(_read_part(zf, part, max_out), part)
        for para in slide.iter(_A + "p"):
            parts: list[str] = []
            for el in para.iter():
                if el.tag == _A + "t":
                    parts.append(el.text or "")
                elif el.tag == _A + "br":
                    parts.append("\n")
            out.append("".join(parts))
            total += len(out[-1]) + 1
            if total > max_out:
                raise PptxError("extracted text exceeds max_out")
    return "\n".join(out)


_esc = esc_xml


def write_pptx(text: str) -> bytes:
    """text → minimal real .pptx: one slide, one a:p per line.
    Round-trip partner of extract_pptx_text: extract(write(t)) == t for
    XML-1.0-legal text without tab/newline caveats beyond docx's (no
    controls below 0x20 except \\t and \\n)."""
    for ch in text:
        if ch < " " and ch not in "\t\n":
            raise ValueError(f"character {ch!r} is not XML-1.0-encodable")

    paras = "".join(
        '<a:p><a:r><a:t>%s</a:t></a:r></a:p>' % _esc(line)
        for line in text.split("\n")
    )
    slide = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/'
        '2006/main" xmlns:a="http://schemas.openxmlformats.org/drawingml/'
        '2006/main"><p:cSld><p:spTree><p:sp><p:txBody>%s</p:txBody></p:sp>'
        "</p:spTree></p:cSld></p:sld>" % paras
    )
    presentation = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<p:presentation xmlns:p="http://schemas.openxmlformats.org/'
        'presentationml/2006/main" xmlns:r="http://schemas.openxmlformats.'
        'org/officeDocument/2006/relationships"><p:sldIdLst>'
        '<p:sldId id="256" r:id="rId1"/></p:sldIdLst></p:presentation>'
    )
    pres_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
        "openxmlformats.org/officeDocument/2006/relationships/slide"
        '" Target="slides/slide1.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types"><Default Extension="xml" ContentType="application/'
        'xml"/><Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Override PartName="/ppt/presentation.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.presentationml.'
        'presentation.main+xml"/>'
        '<Override PartName="/ppt/slides/slide1.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.presentationml.'
        'slide+xml"/></Types>'
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships"><Relationship Id="rId1" Type="http://schemas.'
        "openxmlformats.org/officeDocument/2006/relationships/officeDocument"
        '" Target="ppt/presentation.xml"/></Relationships>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", rels)
        zf.writestr("ppt/presentation.xml", presentation)
        zf.writestr("ppt/_rels/presentation.xml.rels", pres_rels)
        zf.writestr("ppt/slides/slide1.xml", slide)
    return buf.getvalue()
