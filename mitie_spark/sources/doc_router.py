"""Document-payload router: crawl bytes → text, by format sniffing.

A WARC response body (after sources/warc.py undoes the HTTP envelope)
is usually HTML but routinely PDF, DOCX, XLSX, or PPTX; this is the
one-stop edge a pipeline calls per record.  Routing is by magic bytes,
never by URL or Content-Type (both lie in real crawls):

- ``%PDF-`` (possibly after a BOM/garbage preamble ≤1 KB, which real
  generators emit) → sources/pdf.extract_pdf_text
- ZIP magic with a ``word/document.xml`` / ``xl/workbook.xml`` /
  ``ppt/presentation.xml`` part → sources/docx / xlsx / pptx
- anything else → functions/html2text (which degrades to plain text
  for non-markup payloads — tags are simply absent)

Failures inside a format extractor degrade to the HTML path rather
than dropping the record: a damaged PDF still surfaces whatever
byte-level text it carries, mirroring the envelope layer's
keep-the-record policy.

Scale shape: pure per-record function for Arrow ``mapInPandas``
stages; no Spark state, no shuffle.  Registered as the
``routed_document_ingest`` query (md5-gated round trip over PDF and
DOCX payloads through the router).  The KG pipeline's own html→text
stage deliberately does NOT route through here: its byte-identical
text invariant is versioned on ``html_to_text`` (extractor_version 1,
plans/pipeline.py) and the driver corpora are HTML — this router is
the edge for building NEW pages tables from raw crawl payloads.
"""

from __future__ import annotations

from mitie_spark.functions.html2text import html_to_text
from mitie_spark.sources.docx import DocxError, extract_docx_text
from mitie_spark.sources.pdf import PdfError, extract_pdf_text
from mitie_spark.sources.pptx import PptxError, extract_pptx_text
from mitie_spark.sources.rtf import RtfError, extract_rtf_text
from mitie_spark.sources.xlsx import XlsxError, extract_xlsx_text

__all__ = ["extract_document_text", "sniff_document_kind"]


def sniff_document_kind(payload: bytes) -> str:
    """'pdf' | 'docx' | 'xlsx' | 'pptx' | 'html' (the catch-all text
    path).  The exact ZIP-container tests outrank the fuzzy 1 KB %PDF-
    preamble scan — a deflate stream can contain that 5-byte string by
    chance.  OOXML kind is decided by the main part's name, which
    appears in its local header and the central directory wherever the
    part sits in the container."""
    if payload[:4] == b"PK\x03\x04":
        if b"word/document.xml" in payload:
            return "docx"
        if b"xl/workbook.xml" in payload:
            return "xlsx"
        if b"ppt/presentation.xml" in payload:
            return "pptx"
    if payload[:5] == b"{\\rtf":
        return "rtf"
    if b"%PDF-" in payload[:1024]:  # real generators emit BOM/preambles
        return "pdf"
    return "html"


_EXTRACTORS = {
    "pdf": (extract_pdf_text, PdfError),
    "docx": (extract_docx_text, DocxError),
    "xlsx": (extract_xlsx_text, XlsxError),
    "pptx": (extract_pptx_text, PptxError),
    "rtf": (extract_rtf_text, RtfError),
}


def extract_document_text(payload: bytes, max_out: int = 1 << 26) -> str:
    """Crawl payload bytes → extracted text (see module docstring)."""
    payload = bytes(payload or b"")
    kind = sniff_document_kind(payload)
    if kind == "html":
        return html_to_text(payload)
    extractor, err = _EXTRACTORS[kind]
    try:
        return extractor(payload, max_out=max_out)
    except err:
        return html_to_text(payload)
