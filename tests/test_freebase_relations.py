"""Freebase-format relation source + trainer-surface tests."""

import random

import pytest

from mitie_spark.sources.freebase_relations import (
    format_relation_line,
    parse_relation_line,
)


def test_parse_and_format_roundtrip():
    line = "people.person.place_of_birth 0 2 5 6\tMaria\tOkafor\twas\tborn\tin\tLyon\t."
    rel = parse_relation_line(line)
    assert rel["relation_type"] == "people.person.place_of_birth"
    assert (rel["arg1_start"], rel["arg1_end"]) == (0, 2)
    assert rel["tokens"][:2] == ["Maria", "Okafor"]
    again = format_relation_line(
        rel["relation_type"],
        (rel["arg1_start"], rel["arg1_end"]),
        (rel["arg2_start"], rel["arg2_end"]),
        rel["tokens"],
    )
    assert again == line


def test_parse_rejects_bad_ranges():
    with pytest.raises(ValueError, match="Invalid range"):
        parse_relation_line("r 0 2 5 9\ta\tb\tc")  # arg2_end > len(tokens)
    with pytest.raises(ValueError, match="error loading"):
        parse_relation_line("r 0 2\ta\tb\tc")


def test_train_from_freebase_file(spark, tmp_path):
    """End-to-end trainer surface: write a freebase-format file from our
    templates, train, and check the detector separates order."""
    from mitie_spark.corpus import make_sentence
    from mitie_spark.sources.freebase_relations import (
        format_relation_line,
        read_freebase_relations,
        train_from_freebase,
    )

    rng = random.Random(8)
    lines = []
    while len(lines) < 120:
        toks, ments, rels = make_sentence(rng)
        for si, pred, oi in rels:
            a1 = (ments[si][0], ments[si][1])
            a2 = (ments[oi][0], ments[oi][1])
            lines.append(format_relation_line(pred, a1, a2, toks))
    f = tmp_path / "rels.txt"
    f.write_text("\n".join(lines) + "\n")

    df = read_freebase_relations(spark, str(f))
    assert df.count() == len(lines)

    model = train_from_freebase(spark, str(f))
    assert set(model.preds) == {"born_in", "contains", "works_for"}
    # sanity: a born_in positive scores > 0, its swap scores <= 0
    toks = ["Maria", "Okafor", "was", "born", "in", "Lyon", "."]
    s = model.scores(toks, None, (0, 2), (5, 6))
    born = model.preds.index("born_in")
    assert s[born] > 0
    s_rev = model.scores(toks, None, (5, 6), (0, 2))
    assert s_rev[born] <= 0
