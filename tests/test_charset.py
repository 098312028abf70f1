"""functions/charset.py — WHATWG-order sniffing, alias table, hostility."""

import codecs

from mitie_spark.functions.charset import (
    decode_payload,
    detect_encoding,
)


def test_bom_overrides_everything():
    assert detect_encoding(codecs.BOM_UTF8 + b"x") == ("utf-8", 3)
    assert detect_encoding(codecs.BOM_UTF16_LE + b"x\x00") == ("utf-16-le", 2)
    assert detect_encoding(codecs.BOM_UTF16_BE + b"\x00x") == ("utf-16-be", 2)
    assert detect_encoding(codecs.BOM_UTF32_LE + b"x\x00\x00\x00") == ("utf-32-le", 4)
    # BOM beats a conflicting meta declaration
    enc, bom = detect_encoding(codecs.BOM_UTF8 + b'<meta charset="shift_jis">')
    assert enc == "utf-8"
    # the BOM itself is stripped from the text
    assert decode_payload(codecs.BOM_UTF8 + "hé".encode("utf-8"))[0] == "hé"


def test_content_type_beats_meta():
    payload = '<meta charset="utf-8">caf\xe9'.encode("cp1252")
    text, enc = decode_payload(payload, "text/html; charset=iso-8859-1")
    assert enc == "cp1252" and text.endswith("café")


def test_meta_declarations():
    text, enc = decode_payload('<meta charset="iso-8859-1">é'.encode("cp1252"))
    assert enc == "cp1252" and text.endswith("é")
    text, enc = decode_payload(
        '<meta http-equiv="Content-Type" content="text/html; '
        'charset=Shift_JIS">テスト'.encode("shift_jis")
    )
    assert enc == "shift_jis" and text.endswith("テスト")
    # gb2312 label maps to gbk per WHATWG
    assert detect_encoding('<meta charset="gb2312">x'.encode())[0] == "gbk"


def test_sniff_and_fallback():
    # undeclared valid UTF-8 is self-identifying
    assert decode_payload("ünïcode".encode("utf-8")) == ("ünïcode", "utf-8")
    # undeclared cp1252 bytes are invalid UTF-8 -> WHATWG fallback
    assert decode_payload("café".encode("cp1252")) == ("café", "cp1252")
    assert decode_payload(b"") == ("", "utf-8")


def test_hostile_inputs_never_raise():
    # declared codec with undecodable bytes: replacement, not exception
    text, enc = decode_payload(b'<meta charset="shift_jis">\x81', None)
    assert enc == "shift_jis" and "�" in text
    # unknown label falls through to sniffing
    text, enc = decode_payload(b'<meta charset="klingon-8">plain ascii')
    assert enc == "utf-8" and text.endswith("plain ascii")
    # truncated utf-16 (odd byte count) replaces the dangling byte
    text, enc = decode_payload(codecs.BOM_UTF16_LE + b"a\x00b")
    assert enc == "utf-16-le" and text.startswith("a")


def test_spark_surface(spark):
    import pandas as pd

    from mitie_spark.functions.charset import decode_payloads

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "content": ["café".encode("cp1252"), "ok".encode()],
                "ctype": ["text/html; charset=latin-1", None],
            }
        )
    )
    got = {r.doc_id: (r.text, r.encoding) for r in
           decode_payloads(df, "content", "ctype").collect()}
    assert got[1] == ("café", "cp1252")
    assert got[2] == ("ok", "utf-8")


def test_bomless_utf16_label_means_utf8():
    # WHATWG: a utf-16 label readable by the ASCII prescan is
    # self-refuting — substitute utf-8 instead of emitting CJK mojibake
    text, enc = decode_payload(b'<meta charset="utf-16">hello world')
    assert enc == "utf-8" and text.endswith("hello world")
    text, enc = decode_payload(b"hello", "text/html; charset=UTF-16LE")
    assert enc == "utf-8" and text == "hello"
    # ...but a real BOM still wins and decodes as utf-16
    import codecs as c

    text, enc = decode_payload(c.BOM_UTF16_LE + "hi".encode("utf-16-le"))
    assert enc == "utf-16-le" and text == "hi"


def test_hostile_codec_labels_are_total():
    # registered-but-non-text codecs must not escape the never-raise
    # contract (bytes.decode('hex') raises even with errors='replace')
    for label in ("hex", "base64", "zlib", "uu", "undefined", "punycode", "idna"):
        text, enc = decode_payload(
            f'<meta charset="{label}">hello world'.encode()
        )
        assert isinstance(text, str) and text.endswith("hello world"), label
        assert enc == "utf-8", (label, enc)  # label refused -> sniffed
    # unaliased utf-16 spellings cannot bypass the bomless substitution
    for label in ("utf16", "u16", "utf_16", "UTF16LE"):
        text, enc = decode_payload(f'<meta charset="{label}">abc def'.encode())
        assert enc == "utf-8" and text.endswith("abc def"), label


def test_string_id_column(spark):
    import pandas as pd

    from mitie_spark.functions.charset import decode_payloads

    df = spark.createDataFrame(
        pd.DataFrame({"url": ["u1"], "content": ["café".encode("cp1252")]})
    )
    got = decode_payloads(df, "content", id_col="url").collect()
    assert got[0].url == "u1" and got[0].text == "café"
