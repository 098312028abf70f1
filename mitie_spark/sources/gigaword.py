"""Gigaword-style XML corpus source (S2).

Port of /root/reference/mitielib/include/mitie/gigaword_reader.h:18-250:
each file holds a stream of ``<DOC id=... type=...>`` records with
``<HEADLINE>``, ``<DATELINE>`` and ``<TEXT>`` zones (TEXT may contain ``<P>``
paragraphs). The reference pulls one document at a time through dlib's XML
parser; here each *file* is a unit of parallelism and documents explode to
rows — the Spark analog of group_tokenizer over many files
(group_tokenizer.h:15-134).

Returns (file, doc_id, doc_type, headline, dateline, text).
"""

from __future__ import annotations

import html
import re

from pyspark.sql import DataFrame, SparkSession

_DOC = re.compile(r"<DOC\b([^>]*)>(.*?)</DOC\s*>", re.IGNORECASE | re.DOTALL)
_ATTR = re.compile(r"(\w+)\s*=\s*\"([^\"]*)\"")
_ZONE = {
    "headline": re.compile(r"<HEADLINE\s*>(.*?)</HEADLINE\s*>", re.IGNORECASE | re.DOTALL),
    "dateline": re.compile(r"<DATELINE\s*>(.*?)</DATELINE\s*>", re.IGNORECASE | re.DOTALL),
    "text": re.compile(r"<TEXT\s*>(.*?)</TEXT\s*>", re.IGNORECASE | re.DOTALL),
}
_P = re.compile(r"</?P\s*>", re.IGNORECASE)
_WS = re.compile(r"[ \t\r]+")


def _clean_zone(raw: str) -> str:
    s = _P.sub("\n", raw)
    s = html.unescape(s)
    lines = [_WS.sub(" ", l).strip() for l in s.split("\n")]
    return "\n".join(l for l in lines if l)


def parse_gigaword(text: str) -> list[dict]:
    """Parse all <DOC> records in one file's content."""
    docs = []
    for m in _DOC.finditer(text):
        attrs = dict(_ATTR.findall(m.group(1)))
        body = m.group(2)
        rec = {
            "doc_id": attrs.get("id", ""),
            "doc_type": attrs.get("type", ""),
        }
        for zone, rx in _ZONE.items():
            zm = rx.search(body)
            rec[zone] = _clean_zone(zm.group(1)) if zm else ""
        docs.append(rec)
    return docs


GIGAWORD_SCHEMA = (
    "file:string,doc_id:string,doc_type:string,"
    "headline:string,dateline:string,text:string"
)


def read_gigaword(spark: SparkSession, path: str) -> DataFrame:
    import pandas as pd

    files = spark.read.text(path, wholetext=True).selectExpr(
        "input_file_name() AS file", "value"
    )

    def parse(batches):
        for pdf in batches:
            rows = []
            for f, content in zip(pdf["file"], pdf["value"]):
                for rec in parse_gigaword(content):
                    rec = dict(rec)
                    rec["file"] = f
                    rows.append(rec)
            yield pd.DataFrame(
                rows,
                columns=["file", "doc_id", "doc_type", "headline", "dateline", "text"],
            )

    return files.mapInPandas(parse, schema=GIGAWORD_SCHEMA)
