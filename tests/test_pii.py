"""PII detector/scrubber tests on realistic strings (the gated query only
sees doc_id-derived synthetic PII; these pin behavior on real-world
shapes)."""

import pandas as pd

from pyspark.sql import functions as F

from mitie_spark.functions.pii import PII_PATTERNS, pii_counts, scrub_pii

CASES = [
    # (text, n_email, n_ipv4, n_phone, scrubbed)
    (
        "mail a.b+tag@sub.example.co.uk now",
        1, 0, 0,
        "mail [EMAIL] now",
    ),
    (
        "server at 192.168.0.1 and 10.255.3.77:8080",
        0, 2, 0,
        "server at [IP] and [IP]:8080",
    ),
    (
        "call 555-867-5309 or 800-555-0100",
        0, 0, 2,
        "call [PHONE] or [PHONE]",
    ),
    (
        "mixed bob@corp.io 127.0.0.1 555-000-1234",
        1, 1, 1,
        "mixed [EMAIL] [IP] [PHONE]",
    ),
    ("nothing here", 0, 0, 0, "nothing here"),
    ("", 0, 0, 0, ""),
]


def test_pii_counts_and_scrub(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(CASES)), "t": [c[0] for c in CASES]})
    )
    c = pii_counts(F.col("t"))
    out = (
        df.select(
            "i",
            c["email"].alias("ne"),
            c["ipv4"].alias("ni"),
            c["phone"].alias("np"),
            scrub_pii(F.col("t")).alias("s"),
        )
        .orderBy("i")
        .collect()
    )
    for row, (txt, ne, ni, np_, scrubbed) in zip(out, CASES):
        assert row["ne"] == ne, txt
        assert row["ni"] == ni, txt
        assert row["np"] == np_, txt
        assert row["s"] == scrubbed, txt


def test_pattern_alphabets_disjoint_after_redaction():
    # replacement tokens must never themselves match a later pattern
    import re

    for _, pat, _ in PII_PATTERNS:
        for _, _, repl in PII_PATTERNS:
            assert not re.search(pat, repl), (pat, repl)
