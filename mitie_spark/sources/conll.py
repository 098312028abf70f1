"""CoNLL-2003 NER data source (S3).

Port of /root/reference/mitielib/include/mitie/conll_parser.h:50-96 and
src/conll_parser.cpp:75-168 (4-column token-per-line format, blank-line
sentence breaks, strict column check) plus the BIO→BILOU conversion
(conll_parser.cpp:319-380) and BILOU→chunk extraction used by the trainer.

Spark surface: ``read_conll(spark, path)`` reads one or many files
(wholetext — CoNLL sentence grouping is order-dependent within a file, so
the file is the unit of parallelism, exactly like the reference's
group_tokenizer treats files) and returns one row per sentence:
(file, sentence_idx, tokens array<string>, chunks array<struct>).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# label tag set (conll_parser.cpp:17-45); MITIE maps PER→PERSON etc. in the
# string-label variant of parse_conll_data (conll_parser.h:73-85)
TAG_NAMES = {"PER": "PERSON", "ORG": "ORGANIZATION", "LOC": "LOCATION", "MISC": "MISC"}
_VALID_BIO = {"O"} | {
    f"{p}-{t}" for p in ("B", "I") for t in ("PER", "ORG", "LOC", "MISC")
}


def parse_conll_text(text: str) -> list[list[tuple[str, str]]]:
    """→ sentences of (token, BIO label). Strict 4-column check
    (conll_parser.cpp:86-100)."""
    sentences: list[list[tuple[str, str]]] = []
    sentence: list[tuple[str, str]] = []
    lines = text.split("\n")
    if lines and lines[-1] == "":
        # a trailing newline is a line TERMINATOR, not an empty final line
        # (C++ getline semantics) — without this, every file ending in
        # "\n\n" grew a phantom empty sentence
        lines.pop()
    for ln, line in enumerate(lines, 1):
        toks = line.split()
        if len(toks) == 4:
            if toks[3] not in _VALID_BIO:
                raise ValueError(f"INVALID CONLL LABEL FOUND: {toks[3]}")
            sentence.append((toks[0], toks[3]))
        elif len(toks) == 0:
            sentences.append(sentence)
            sentence = []
        else:
            raise ValueError(
                f"CONLL PARSE ERROR, wrong number of tokens in line {ln}"
            )
    # flush an unterminated final sentence (file without trailing newline).
    # DELIBERATE divergence from the reference parser, which drops the last
    # sentence unless the file ends in a blank line — silently losing
    # train/eval data is worse than byte-parity here; files with the
    # conventional trailing blank line parse identically in both.
    if sentence:
        sentences.append(sentence)
    return sentences


def bio_to_bilou(labels: list[str]) -> list[str]:
    """conll_parser.cpp:319-380 — positional rewrite of BIO to BILOU."""
    out = list(labels)
    n = len(labels)
    for i in range(n):
        cur = labels[i]
        if cur == "O":
            continue
        kind, tag = cur.split("-")
        last = labels[i - 1] if i > 0 else "O"
        nxt = labels[i + 1] if i + 1 < n else "O"
        if kind == "B":
            if nxt != f"I-{tag}":
                out[i] = f"U-{tag}"
        elif kind == "I":
            if last in (cur, f"B-{tag}"):
                out[i] = cur if nxt == cur else f"L-{tag}"
            else:
                out[i] = f"B-{tag}" if nxt == cur else f"U-{tag}"
    return out


def bilou_to_chunks(labels: list[str]) -> list[tuple[int, int, str]]:
    """BILOU labels → (start, end, tag_name) half-open chunks."""
    chunks = []
    start = None
    tag = None
    for i, lab in enumerate(labels):
        if lab == "O":
            start = None
            continue
        kind, t = lab.split("-")
        if kind == "U":
            chunks.append((i, i + 1, TAG_NAMES[t]))
            start = None
        elif kind == "B":
            start, tag = i, t
        elif kind == "L" and start is not None:
            chunks.append((start, i + 1, TAG_NAMES[tag]))
            start = None
    return chunks


def parse_conll_sentences(text: str):
    """→ [(tokens, chunks)] with chunks as (start, end, tag_name)."""
    out = []
    for sent in parse_conll_text(text):
        tokens = [t for t, _ in sent]
        labels = bio_to_bilou([l for _, l in sent])
        out.append((tokens, bilou_to_chunks(labels)))
    return out


CONLL_SCHEMA = (
    "file:string,sentence_idx:bigint,tokens:array<string>,"
    "chunks:array<struct<start:bigint,end:bigint,tag:string>>"
)


def read_conll(spark: SparkSession, path: str) -> DataFrame:
    import pandas as pd

    files = spark.read.text(path, wholetext=True).selectExpr(
        "input_file_name() AS file", "value"
    )

    def parse(batches):
        for pdf in batches:
            rows = {"file": [], "sentence_idx": [], "tokens": [], "chunks": []}
            for f, text in zip(pdf["file"], pdf["value"]):
                for i, (tokens, chunks) in enumerate(parse_conll_sentences(text)):
                    if not tokens:
                        continue
                    rows["file"].append(f)
                    rows["sentence_idx"].append(i)
                    rows["tokens"].append(tokens)
                    rows["chunks"].append(
                        [{"start": s, "end": e, "tag": t} for s, e, t in chunks]
                    )
            yield pd.DataFrame(rows)

    return files.mapInPandas(parse, schema=CONLL_SCHEMA)
