"""Shared OOXML/ZIP container plumbing for docx/xlsx/pptx.

One implementation of the hostile-input posture all three extractors
share (review finding: it was triplicated and had already drifted once):
declared member sizes checked BEFORE reading and the actual bytes
re-checked after (the declared size is attacker-controlled), XML parts
carrying a DTD rejected outright (Office never writes one;
entity-expansion bombs need one), every zip-layer failure — including
``NotImplementedError`` from a hostile version field — funneled into the
caller's single error class.
"""

from __future__ import annotations

import io
import zipfile
import zlib
from xml.etree import ElementTree

__all__ = ["ZIP_ERRORS", "esc_xml", "open_container", "parse_xml", "read_part"]

ZIP_ERRORS = (
    zipfile.BadZipFile,
    zlib.error,
    OSError,
    EOFError,
    ValueError,  # corrupted offsets (negative seek etc.)
    NotImplementedError,  # corrupted/unknown compression or version field
    RuntimeError,  # encrypted member
)


def open_container(data: bytes, err: type[ValueError]) -> zipfile.ZipFile:
    try:
        return zipfile.ZipFile(io.BytesIO(data))
    except ZIP_ERRORS as e:
        raise err(f"not a zip container: {e}") from None


def read_part(
    zf: zipfile.ZipFile, name: str, max_out: int, err: type[ValueError]
) -> bytes:
    try:
        info = zf.getinfo(name)
    except KeyError:
        raise err(f"no {name} part") from None
    if info.file_size > max_out:
        raise err(f"{name} exceeds max_out")
    try:
        with zf.open(info) as fh:
            xml = fh.read(max_out + 1)
    except ZIP_ERRORS as e:
        raise err(f"bad zip member {name}: {e}") from None
    if len(xml) > max_out:
        raise err(f"{name} exceeds max_out")  # the header lied
    if b"<!DOCTYPE" in xml or b"<!ENTITY" in xml:
        raise err(f"DTD in {name}")  # entity-bomb guard
    return xml


def parse_xml(xml: bytes, name: str, err: type[ValueError]):
    try:
        return ElementTree.fromstring(xml)
    except ElementTree.ParseError as e:
        raise err(f"bad XML in {name}: {e}") from None


def esc_xml(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
