"""Tests: string predicates (T5), CoNLL source (S3), gigaword source (S2),
and the ner_stream bracket printer (EP1 golden round-trip)."""

import re

import pytest

from mitie_spark.functions.predicates import (
    alternating_caps_in_middle,
    caps_pattern,
    contains_hyphen,
    contains_letters,
    contains_letters_and_numbers,
    contains_numbers,
    is_all_caps,
    is_all_numbers,
    is_caps,
)
from mitie_spark.sources.conll import (
    bilou_to_chunks,
    bio_to_bilou,
    parse_conll_sentences,
    parse_conll_text,
)
from mitie_spark.sources.gigaword import parse_gigaword
from mitie_spark.streaming.ner_stream import format_markup


def test_predicates():  # ner_feature_extraction.cpp:70-145
    assert is_caps("Boston") and not is_caps("boston") and not is_caps("")
    assert is_all_caps("NBC") and not is_all_caps("NBc")
    assert is_all_caps("")  # reference quirk: vacuous loop
    assert contains_numbers("a1") and not contains_numbers("abc")
    assert contains_letters("a1") and not contains_letters("123")
    assert contains_letters_and_numbers("a1")
    assert is_all_numbers("123") and not is_all_numbers("12a")
    assert is_all_numbers("")  # reference quirk
    assert contains_hyphen("e-mail")
    assert alternating_caps_in_middle("McDonald")
    assert not alternating_caps_in_middle("NBC")  # all caps: no low→high flip
    # caps_pattern ORs everything into bit 0 (cpp:148-163): hash has exactly
    # two possible values
    words = ["the", "Boston", "area", "Is", "nice"]
    h_caps = caps_pattern(words, 1, 2)
    h_none = caps_pattern(["a", "b", "c"], 1, 2)
    assert h_caps != h_none
    assert caps_pattern(words, 3, 4) == h_caps  # any-caps collapses


CONLL_SAMPLE = """EU NNP I-NP I-ORG
rejects VBZ I-VP O
German JJ I-NP I-MISC
call NN I-NP O

Peter NNP I-NP I-PER
Blackburn NNP I-NP I-PER

"""


def test_parse_conll():
    sents = parse_conll_text(CONLL_SAMPLE)
    assert len(sents) >= 2
    assert sents[0][0] == ("EU", "I-ORG")
    parsed = parse_conll_sentences(CONLL_SAMPLE)
    toks0, chunks0 = parsed[0]
    assert toks0 == ["EU", "rejects", "German", "call"]
    assert chunks0 == [(0, 1, "ORGANIZATION"), (2, 3, "MISC")]
    toks1, chunks1 = parsed[1]
    assert chunks1 == [(0, 2, "PERSON")]


def test_parse_conll_errors():
    with pytest.raises(ValueError, match="wrong number of tokens"):
        parse_conll_text("EU NNP I-NP\n")
    with pytest.raises(ValueError, match="INVALID CONLL LABEL"):
        parse_conll_text("EU NNP I-NP I-BAD\n")


def test_bio_to_bilou():  # conll_parser.cpp:319-380
    assert bio_to_bilou(["I-PER", "I-PER", "O"]) == ["B-PER", "L-PER", "O"]
    assert bio_to_bilou(["I-PER", "O"]) == ["U-PER", "O"]
    assert bio_to_bilou(["B-ORG", "I-ORG", "I-ORG"]) == ["B-ORG", "I-ORG", "L-ORG"]
    assert bio_to_bilou(["B-LOC"]) == ["U-LOC"]
    # adjacent same-type entities: B restarts the chunk
    assert bio_to_bilou(["I-PER", "B-PER"]) == ["U-PER", "U-PER"]
    assert bilou_to_chunks(["B-PER", "L-PER", "O", "U-LOC"]) == [
        (0, 2, "PERSON"),
        (3, 4, "LOCATION"),
    ]


GIGA_SAMPLE = """<DOC id="AFP_ENG_19940512.0001" type="story">
<HEADLINE>
Something happened
</HEADLINE>
<DATELINE>
PARIS, May 12
</DATELINE>
<TEXT>
<P>
First paragraph &amp; more.
</P>
<P>
Second one.
</P>
</TEXT>
</DOC>
<DOC id="d2" type="other">
<TEXT>
<P>only text</P>
</TEXT>
</DOC>
"""


def test_parse_gigaword():  # gigaword_reader.h:18-250
    docs = parse_gigaword(GIGA_SAMPLE)
    assert len(docs) == 2
    assert docs[0]["doc_id"] == "AFP_ENG_19940512.0001"
    assert docs[0]["doc_type"] == "story"
    assert docs[0]["headline"] == "Something happened"
    assert docs[0]["dateline"] == "PARIS, May 12"
    assert "First paragraph & more." in docs[0]["text"]
    assert "Second one." in docs[0]["text"]
    assert docs[1]["doc_id"] == "d2" and docs[1]["headline"] == ""


MARKUP = re.compile(r"\[([A-Z]+) ")


def test_format_markup_golden_roundtrip():
    """Parse the reference's own ner_stream output lines into (tokens,
    entities), re-print with our port of the printer, compare byte-exact."""
    with open("/root/reference/sample_text.reference-output", encoding="utf-8") as f:
        golden = f.read().split("\n")
    checked = 0
    for line in golden:
        if not line:
            continue
        # parse "[TAG tok tok] " markup into tokens + spans
        tokens, ents = [], []
        i = 0
        parts = line.split(" ")
        open_tag, start = None, None
        for p in parts:
            if p.startswith("[") and p[1:].isupper():
                open_tag, start = p[1:], len(tokens)
                continue
            if p.endswith("]") and open_tag is not None:
                tokens.append(p[:-1])
                ents.append((start, len(tokens), open_tag))
                open_tag = None
                continue
            if p == "":
                continue
            tokens.append(p)
        ours = format_markup(tokens, ents)
        assert ours == line, f"{ours!r} != {line!r}"
        checked += 1
    assert checked >= 3  # the golden file has 3 content lines


def test_warc_roundtrip_and_pages(spark, tmp_path):
    """write_warc → parse_warc_bytes round-trips, and warc_to_pages turns
    binaryFile archive rows into (url, warc_ts, html) page rows."""
    from mitie_spark.sources.warc import parse_warc_bytes, warc_to_pages, write_warc

    recs = [
        {
            "url": f"https://ex{i}.org/p",
            "warc_ts": f"2024-01-0{i + 1}T00:00:00Z",
            "html": f"<html><body>doc {i} &amp; more</body></html>".encode(),
        }
        for i in range(3)
    ]
    blob = write_warc(recs)
    parsed = parse_warc_bytes(blob)
    assert [(u, p) for u, _, p in parsed] == [
        (r["url"], r["html"]) for r in recs
    ]

    # interleave a non-response record: it must be skipped
    noise = (
        b"WARC/1.0\r\nWARC-Type: request\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n"
    )
    assert len(parse_warc_bytes(noise + blob)) == 3

    p = tmp_path / "a.warc"
    p.write_bytes(noise + blob)
    archives = spark.read.format("binaryFile").load(str(p))
    pages = warc_to_pages(archives).orderBy("url")
    rows = pages.collect()
    assert [r["url"] for r in rows] == [r["url"] for r in recs]
    assert rows[0]["html"] == recs[0]["html"]
    assert rows[1]["warc_ts"].day == 2


def test_warc_pages_feed_extraction(spark, tmp_path):
    """WARC archive → pages → html2text → fused extraction: the ingestion
    edge composes with the KG pipeline end-to-end."""
    from mitie_spark.functions.html2text import register_udf
    from mitie_spark.models.train import ARTIFACT_DIR
    from mitie_spark.operators.extraction import extract_kg
    from mitie_spark.sources.warc import write_warc

    html = (
        b"<html><body><p>Davis Wilson was born in Boston .</p></body></html>"
    )
    blob = write_warc(
        [
            {
                "url": "https://ex.org/bio",
                "warc_ts": "2024-03-01T00:00:00Z",
                "html": html,
            }
        ]
    )
    p = tmp_path / "b.warc"
    p.write_bytes(blob)
    from mitie_spark.sources.warc import warc_to_pages

    pages = warc_to_pages(spark.read.format("binaryFile").load(str(p)))
    h2t = register_udf()
    pages = pages.withColumn("text", h2t(pages["html"]))
    kg = extract_kg(
        pages,
        f"{ARTIFACT_DIR}/ner_model.npz",
        f"{ARTIFACT_DIR}/relation_model.npz",
        lang_filter=None,
    ).collect()
    assert len(kg) == 1
    tags = {(m["surface"], m["tag"]) for m in kg[0]["mentions"]}
    assert ("Davis Wilson", "PERSON") in tags
    assert ("Boston", "LOCATION") in tags


def test_warc_http_payload_and_corrupt_records():
    """Real CC response payloads are full HTTP responses — the header block
    must be stripped — and a record with a corrupt Content-Length is skipped
    via resync instead of raising."""
    from mitie_spark.sources.warc import parse_warc_bytes, write_warc

    html = b"<html><body>clean</body></html>"
    http_payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
    )
    blob = write_warc(
        [
            {
                "url": "https://cc.org/a",
                "warc_ts": "2024-01-01T00:00:00Z",
                "html": http_payload,
            }
        ]
    )
    recs = parse_warc_bytes(blob)
    assert recs == [("https://cc.org/a", "2024-01-01T00:00:00Z", html)]

    corrupt = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://bad.org\r\n"
        b"Content-Length: 12zz\r\n\r\nwhatever\r\n\r\n"
    )
    assert parse_warc_bytes(corrupt + blob) == recs


def test_warc_negative_content_length_cannot_hang():
    """A crafted NEGATIVE Content-Length walks the record index backward;
    before the guard, a record whose end computed back onto itself pinned
    the parse loop at a fixed point (infinite loop inside the task). Must
    skip via resync and terminate."""
    from mitie_spark.sources.warc import parse_warc_bytes, write_warc

    hostile = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://evil.org\r\n"
        b"Content-Length: -8\r\n\r\n"
    )
    good = write_warc(
        [{"url": "https://ok.org", "warc_ts": "2024-01-01T00:00:00Z", "html": b"x"}]
    )
    # alone (index would land back inside the same record), and followed by
    # a good record (resync must recover it)
    assert parse_warc_bytes(hostile) == []
    recs = parse_warc_bytes(hostile + good)
    assert [r[0] for r in recs] == ["https://ok.org"]
    assert parse_warc_bytes(hostile * 50 + good) == recs


def test_reader_mutation_fuzz_never_raises():
    """Web-facing text readers (WARC parse, gigaword parse, html2text) see
    adversarial bytes at corpus scale: seeded mutations of valid inputs
    must never raise — damaged records skip, garbage yields garbage text."""
    import numpy as np

    from mitie_spark.functions.html2text import html_to_text
    from mitie_spark.sources.gigaword import parse_gigaword
    from mitie_spark.sources.warc import parse_warc_bytes, write_warc

    warc = write_warc(
        [
            {
                "url": f"https://s.org/{i}",
                "warc_ts": "2024-05-01T00:00:00Z",
                "html": b"<html><script>x</script><p>hi</p></html>",
            }
            for i in range(3)
        ]
    )
    giga = (
        b'<DOC id="d1" type="story"><HEADLINE>h</HEADLINE>'
        b"<TEXT><P>one</P><P>two</P></TEXT></DOC>" * 3
    )
    html = b"<html><head><style>a{}</style></head><body><p>x &amp; y</p></body>"
    rng = np.random.default_rng(101)
    for parse, seed in [
        (parse_warc_bytes, warc),
        (lambda b: parse_gigaword(b.decode("utf-8", "replace")), giga),
        (html_to_text, html),
    ]:
        base = np.frombuffer(seed, dtype=np.uint8)
        for _ in range(300):
            q = base.copy()
            op = int(rng.integers(0, 3))
            if op == 0:
                n = int(rng.integers(1, 9))
                pos = rng.integers(0, len(q), n)
                q[pos] = rng.integers(0, 256, n)
            elif op == 1:
                q = q[: int(rng.integers(1, len(q)))]
            else:
                at = int(rng.integers(0, len(q) + 1))
                ins = rng.integers(0, 256, int(rng.integers(1, 65))).astype(np.uint8)
                q = np.concatenate([q[:at], ins, q[at:]])
            parse(q.tobytes())  # must not raise, whatever it returns


def test_warc_real_web_envelopes():
    """Real Common-Crawl response payloads are HTTP responses whose
    bodies arrive chunked and/or Content-Encoding'd (gzip/deflate/br).
    strip_http_envelope must undo every layer; undecodable layers must
    degrade to the raw body, never drop the record."""
    import zlib

    from mitie_spark.sources.brotli import encode_brotli_store
    from mitie_spark.sources.warc import strip_http_envelope, write_http_response

    body = ("<html><body>" + "<p>La niña публика 日本</p>" * 50 + "</body></html>").encode()
    for enc in (None, "gzip", "deflate", "br", "zstd"):
        for chunked in (False, True):
            env = write_http_response(body, content_encoding=enc, chunked=chunked)
            assert strip_http_envelope(env) == body, (enc, chunked)
    # raw-deflate variant (servers send deflate without the zlib wrapper)
    raw = zlib.compress(body)[2:-4]
    env = (b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n" + raw)
    assert strip_http_envelope(env) == body
    # unknown encoding → raw body kept (record survives)
    env = b"HTTP/1.1 200 OK\r\nContent-Encoding: compress\r\n\r\nOPAQUE"
    assert strip_http_envelope(env) == b"OPAQUE"
    # RFC 9110 coding list: applied gzip-then-br, undone in reverse
    import zlib as _z

    from mitie_spark.sources.brotli import encode_brotli_store as _ebs

    co = _z.compressobj(6, _z.DEFLATED, 16 + _z.MAX_WBITS)
    layered = _ebs(co.compress(body) + co.flush())
    env = (b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip, br\r\n\r\n" + layered)
    assert strip_http_envelope(env) == body
    # a list with one undecodable layer → original raw body kept
    env = (b"HTTP/1.1 200 OK\r\nContent-Encoding: sdch, br\r\n\r\n" + layered)
    assert strip_http_envelope(env) == layered
    # concatenated gzip members decode in full; a truncated tail
    # member degrades to its decoded prefix, not to compressed bytes
    def gz(b):
        c = _z.compressobj(6, _z.DEFLATED, 16 + _z.MAX_WBITS)
        return c.compress(b) + c.flush()

    # repeated Content-Encoding header LINES combine per RFC 9110 §5.3
    env = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
        b"Content-Encoding: br\r\n\r\n" + layered
    )
    assert strip_http_envelope(env) == body
    # 'Transfer-Encoding: gzip, chunked': dechunk, then undo the gzip
    # transfer coding even with no Content-Encoding header
    chunked_gz = b"%x\r\n" % len(gz(body)) + gz(body) + b"\r\n0\r\n\r\n"
    env = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: gzip, chunked\r\n\r\n"
        + chunked_gz
    )
    assert strip_http_envelope(env) == body
    # non-RFC chunk-size forms ('1_0', '+5') must fall back to raw
    env = b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n1_0\r\nx"
    assert strip_http_envelope(env) == b"1_0\r\nx"

    multi = gz(body[:100]) + gz(body[100:])
    env = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + multi
    assert strip_http_envelope(env) == body
    m2 = gz(body[100:])
    cut = gz(body[:100]) + m2[: len(m2) // 2]
    env = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + cut
    got = strip_http_envelope(env)
    assert got.startswith(body[:100]) and len(got) < len(body)
    # malformed chunk framing → raw body kept
    env = b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nnot-hex\r\nx"
    assert strip_http_envelope(env) == b"not-hex\r\nx"
    # truncated brotli body → raw body kept
    broken = encode_brotli_store(body)[:-4]
    env = (b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\n" + broken)
    assert strip_http_envelope(env) == broken
    # truncated zstd body → raw body kept
    from mitie_spark.sources.zstd import encode_zstd_store

    broken = encode_zstd_store(body)[:-4]
    env = (b"HTTP/1.1 200 OK\r\nContent-Encoding: zstd\r\n\r\n" + broken)
    assert strip_http_envelope(env) == broken
    # non-HTTP payload passes through
    assert strip_http_envelope(b"<html>bare</html>") == b"<html>bare</html>"


def test_warc_gz_member_framing(spark, tmp_path):
    """.warc.gz stores one gzip member per record; gunzip_members undoes
    the framing and warc_to_pages sniffs it per blob — including pages
    whose HTTP bodies are themselves brotli- or gzip-encoded (the two
    compression layers are independent)."""
    from mitie_spark.sources.warc import (
        gunzip_members,
        parse_warc_bytes,
        warc_to_pages,
        write_http_response,
        write_warc,
    )

    docs = [f"<html><p>page {i} text</p></html>".encode() for i in range(6)]
    encs = [None, "gzip", "br", "zstd", "gzip", "br"]
    recs = [
        {
            "url": f"https://ex.org/{i}",
            "warc_ts": f"2024-02-0{i + 1}T00:00:00Z",
            "html": write_http_response(docs[i], content_encoding=encs[i], chunked=(i % 2 == 1)),
        }
        for i in range(6)
    ]
    gz = write_warc(recs, gzip_members=True)
    assert gz[:2] == b"\x1f\x8b"
    assert parse_warc_bytes(gunzip_members(gz)) == [
        (r["url"], r["warc_ts"], docs[i]) for i, r in enumerate(recs)
    ]
    # a truncated tail member keeps every intact record before it
    # (review finding: a cut connection must not discard the archive)
    cut = gz[: len(gz) - len(gz) // 8]
    kept = parse_warc_bytes(gunzip_members(cut))
    assert len(kept) >= 4 and kept[0] == (recs[0]["url"], recs[0]["warc_ts"], docs[0])
    # a gzip-bomb HTTP body degrades to the raw (compressed) bytes
    import zlib as _z

    co = _z.compressobj(9, _z.DEFLATED, 16 + _z.MAX_WBITS)
    bomb = co.compress(b"\x00" * (300 << 20)) + co.flush()
    assert bomb[:2] == b"\x1f\x8b" and len(bomb) < 1 << 20
    env = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + bomb
    from mitie_spark.sources.warc import strip_http_envelope

    assert strip_http_envelope(env) == bomb  # 300 MB > the 256 MB cap
    p = tmp_path / "c.warc.gz"
    p.write_bytes(gz)
    # a corrupt sibling blob is skipped without killing the task
    (tmp_path / "bad.warc.gz").write_bytes(b"\x1f\x8b" + b"\x00" * 40)
    pages = warc_to_pages(
        spark.read.format("binaryFile").load(str(tmp_path))
    ).orderBy("url")
    rows = pages.collect()
    assert [bytes(r["html"]) for r in rows] == docs
