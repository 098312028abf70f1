"""Porter stemmer port tests.

Expected values derive from the reference implementation's own documented
examples (/root/reference/mitielib/src/stem.c:206-226 comments) plus the two
DEPARTURE rules (stem.c:274, 297, 372)."""

from mitie_spark.functions.stemmer import stem_word


def test_stem_c_comment_examples():  # stem.c:206-226
    # NOTE: the stem.c comment shows step1ab intermediates; "agreed"/"disabled"
    # additionally lose their final e in step5 (the canonical full-pipeline
    # outputs are agre/disabl).
    pairs = {
        "caresses": "caress",
        "ponies": "poni",
        "ties": "ti",
        "caress": "caress",
        "cats": "cat",
        "feed": "feed",
        "agreed": "agre",
        "disabled": "disabl",
        "matting": "mat",
        "mating": "mate",
        "meeting": "meet",
        "milling": "mill",
        "messing": "mess",
        "meetings": "meet",
    }
    for w, expected in pairs.items():
        assert stem_word(w) == expected, (w, stem_word(w))


def test_e_restoration():  # cvc examples, stem.c:162-169
    assert stem_word("loving") == "love"
    assert stem_word("hoping") == "hope"
    assert stem_word("snowing") == "snow"  # w blocks the e-restore


def test_departures():
    # bli → ble instead of abli → able (stem.c:274)
    assert stem_word("possibly") == "possibl"
    # logi → log rule exists (stem.c:297)
    assert stem_word("archaeology") == "archaeolog"
    # k <= 1 early-out: 1- and 2-letter words untouched (stem.c:372)
    assert stem_word("as") == "as"
    assert stem_word("is") == "is"
    assert stem_word("a") == "a"


def test_classic_chains():
    assert stem_word("relational") == "relat"
    assert stem_word("rational") == "ration"
    assert stem_word("characterization") == "character"
    assert stem_word("happy") == "happi"
    assert stem_word("sky") == "sky"
    assert stem_word("controlled") == "control"
    assert stem_word("generalization") == "gener"


def test_lowercasing():  # stemmer.cpp:23-35 lowercases first
    assert stem_word("Meetings") == "meet"
    assert stem_word("CATS") == "cat"


def test_stem_byte_semantics_non_ascii():
    """The reference stems BYTES: dlib::tolower lowercases only A-Z (bytes
    >=0x80 are negative signed chars, unchanged by C-locale tolower), and
    stem.c runs over the UTF-8 byte buffer (stemmer.cpp:23-35). Unicode-
    aware lowercasing is therefore WRONG here — pin the byte behavior."""
    from mitie_spark.functions.stemmer import stem_word, stem_word_bytes

    # non-ASCII uppercase must NOT lowercase (the reference leaves the
    # 0xC3 0x89 bytes of 'É' alone; only the ASCII 'COLE' tail lowers)
    assert stem_word_bytes("ÉCOLE") == "É".encode("utf-8") + b"cole"
    assert stem_word_bytes("Müller") == "müller".encode("utf-8")
    # pure-ASCII behavior is unchanged
    assert stem_word("Running") == "run"
    assert stem_word("CARESSES") == "caress"
    # hashing round-trips the exact stem bytes even when the stem is not
    # valid UTF-8 on its own
    from mitie_spark.functions.hashing import murmur_hash3_128, shash

    s = stem_word("ÉCOLE")
    assert shash(s, 7) == murmur_hash3_128(stem_word_bytes("ÉCOLE"), 7)
