"""WET/WAT sidecar archive tests — sources/wet_wat.py."""

from __future__ import annotations

import json

from mitie_spark.sources.wet_wat import (
    parse_wat_bytes,
    parse_wet_bytes,
    write_wat,
    write_wet,
)

_RECS = [
    {"url": "https://ex.com/1", "warc_ts": "2024-01-01T00:00:00Z", "text": "hello\nworld"},
    {"url": "https://ex.com/2", "warc_ts": "2024-01-01T00:00:01Z", "text": ""},
    {"url": "https://ex.com/3", "warc_ts": "2024-01-01T00:00:02Z", "text": "naïve café 🎉"},
]


def test_wet_round_trip_plain_and_gzip():
    for gz in (False, True):
        blob = write_wet(_RECS, gzip_members=gz)
        got = parse_wet_bytes(blob)
        assert got == [(r["url"], r["warc_ts"], r["text"]) for r in _RECS]


def test_wet_skips_foreign_record_types():
    from mitie_spark.sources.warc import write_warc

    mixed = write_warc(
        [{"url": "https://ex.com/r", "warc_ts": "2024-01-01", "html": b"x"}]
    ) + write_wet(_RECS[:1])
    got = parse_wet_bytes(mixed)
    assert [u for u, _, _ in got] == ["https://ex.com/1"]


def test_wet_resyncs_past_damage():
    blob = bytearray(write_wet(_RECS))
    # corrupt the first record's Content-Length header
    idx = blob.index(b"Content-Length:")
    blob[idx + 16 : idx + 18] = b"xq"
    got = parse_wet_bytes(bytes(blob))
    assert [u for u, _, _ in got] == ["https://ex.com/2", "https://ex.com/3"]


def test_wat_envelope_shape_and_round_trip():
    recs = [
        {
            "url": "https://src0.example.com/doc/1",
            "warc_ts": "2024-01-01T00:00:00Z",
            "title": "a title",
            "links": [
                {"url": "https://src1.example.com/doc/8", "text": "more"},
                {"url": "https://src2.example.com/doc/9", "text": ""},
            ],
        }
    ]
    for gz in (False, True):
        blob = write_wat(recs, gzip_members=gz)
        got = parse_wat_bytes(blob)
        assert len(got) == 1
        url, date, env = got[0]
        assert (url, date) == (recs[0]["url"], recs[0]["warc_ts"])
        doc = json.loads(env)
        meta = doc["Envelope"]["Payload-Metadata"]["HTTP-Response-Metadata"][
            "HTML-Metadata"
        ]
        assert meta["Head"]["Title"] == "a title"
        assert [l["url"] for l in meta["Links"]] == [
            "https://src1.example.com/doc/8",
            "https://src2.example.com/doc/9",
        ]
        assert all(l["path"] == "A@/href" for l in meta["Links"])


def test_wat_link_edges_spark(spark):
    import pandas as pd

    from mitie_spark.sources.wet_wat import wat_link_edges

    blob = write_wat(
        [
            {
                "url": "https://a.com/p",
                "warc_ts": "2024-01-01T00:00:00Z",
                "title": "t",
                "links": [
                    {"url": "https://b.org/x", "text": "one"},
                    {"url": "https://c.net/y", "text": "two"},
                ],
            }
        ]
    )
    df = spark.createDataFrame(pd.DataFrame({"content": [blob]}))
    got = sorted(
        (r.src_host, r.dst_host) for r in wat_link_edges(df).collect()
    )
    assert got == [("a.com", "b.org"), ("a.com", "c.net")]
