"""Triple-pattern (BGP) compiler: binding semantics on a toy KG, plan
pins, and equivalence with the hand-written two-hop inference query."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.planutil import explain_formatted as _plan

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def toy(spark):
    rows = [
        ("u1", "ana", "born_in", "lima"),
        ("u1", "peru", "contains", "lima"),
        ("u2", "bob", "born_in", "oslo"),
        ("u2", "norway", "contains", "oslo"),
        ("u3", "ana", "works_for", "acme"),
        ("u3", "bob", "knows", "ana"),
        ("u3", "ana", "knows", "bob"),
        ("u4", "cal", "knows", "cal"),
        # duplicate assertion of a fact in a second document
        ("u5", "ana", "born_in", "lima"),
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "subj", "pred", "obj"])
    )


def test_two_hop_binding(toy):
    from mitie_spark.operators.kgquery import match_patterns

    out = match_patterns(
        toy,
        [("?p", "born_in", "?c"), ("?country", "contains", "?c")],
    )
    assert sorted(out.columns) == ["c", "country", "p"]
    got = {(r["p"], r["c"], r["country"]) for r in out.collect()}
    assert got == {("ana", "lima", "peru"), ("bob", "oslo", "norway")}


def test_distinct_facts_dedupes_multi_document_assertions(toy):
    from mitie_spark.operators.kgquery import match_patterns

    out = match_patterns(toy, [("?p", "born_in", "lima")])
    # ana born_in lima is asserted in u1 AND u5 — one binding
    assert [r["p"] for r in out.collect()] == ["ana"]
    out2 = match_patterns(
        toy, [("?p", "born_in", "lima")], distinct_facts=False
    )
    assert sorted(r["p"] for r in out2.collect()) == ["ana", "ana"]


def test_cyclic_pattern_and_self_loop(toy):
    from mitie_spark.operators.kgquery import match_patterns

    # mutual-knows cycle: (?a knows ?b), (?b knows ?a)
    out = match_patterns(
        toy, [("?a", "knows", "?b"), ("?b", "knows", "?a")]
    )
    got = {(r["a"], r["b"]) for r in out.collect()}
    assert got == {("ana", "bob"), ("bob", "ana"), ("cal", "cal")}
    # repeated variable INSIDE one pattern: only the self-loop matches
    out2 = match_patterns(toy, [("?x", "knows", "?x")])
    assert [r["x"] for r in out2.collect()] == ["cal"]


def test_three_pattern_chain(toy):
    from mitie_spark.operators.kgquery import match_patterns

    out = match_patterns(
        toy,
        [
            ("?p", "born_in", "?c"),
            ("?country", "contains", "?c"),
            ("?p", "works_for", "?org"),
        ],
    )
    got = {(r["p"], r["country"], r["org"]) for r in out.collect()}
    assert got == {("ana", "peru", "acme")}


def test_errors(toy):
    from mitie_spark.operators.kgquery import match_patterns

    with pytest.raises(ValueError, match="empty pattern"):
        match_patterns(toy, [])
    with pytest.raises(ValueError, match="no variables"):
        match_patterns(toy, [("ana", "born_in", "lima")])
    with pytest.raises(ValueError, match="shares no variable"):
        match_patterns(
            toy, [("?p", "born_in", "?c"), ("?x", "works_for", "?y")]
        )


def test_literal_predicates_push_down_and_no_cartesian(spark, toy, tmp_path):
    """Over a parquet-backed triples table (the shape stage
    materialization produces) the literal pred terms must reach the scan
    as PushedFilters — a BGP whose filters stay above the join reads the
    whole store per pattern. (An in-memory toy frame constant-folds away
    entirely, so the pin needs the real source.)"""
    from mitie_spark.operators.kgquery import match_patterns

    path = str(tmp_path / "triples.parquet")
    toy.write.parquet(path)
    t = spark.read.parquet(path)
    df = match_patterns(
        t, [("?p", "born_in", "?c"), ("?country", "contains", "?c")]
    )
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "PushedFilters: [" in plan
    assert "EqualTo(pred,born_in)" in plan
    assert "EqualTo(pred,contains)" in plan


def test_matches_handwritten_two_hop_query(spark):
    """The compiled BGP must produce exactly the binding set of the
    hand-written kg_two_hop_inference join over the real extracted KG."""
    from mitie_spark.operators.extraction import triples_table
    from mitie_spark.operators.kgquery import match_patterns
    from mitie_spark.queries import QUERIES
    from mitie_spark.queries_kg import _kg

    t = triples_table(_kg(spark, SF)).select("subj", "pred", "obj")
    bgp = match_patterns(
        t, [("?person", "born_in", "?city"), ("?country", "contains", "?city")]
    )
    got = {(r["person"], r["country"]) for r in bgp.collect()}
    direct = {
        (r["person"], r["country"])
        for r in QUERIES["kg_two_hop_inference"](spark, SF).collect()
    }
    assert got == direct and got


def test_optional_pattern_left_joins(toy):
    from mitie_spark.operators.kgquery import match_patterns

    out = match_patterns(
        toy,
        [("?p", "born_in", "?c"), ("?country", "contains", "?c")],
        optional=[("?p", "works_for", "?org")],
    )
    got = {
        (r["p"], r["country"], r["org"]) for r in out.collect()
    }
    # ana has an employer; bob's binding survives with a null org
    assert got == {("ana", "peru", "acme"), ("bob", "norway", None)}


def test_optional_pattern_must_share_a_variable(toy):
    from mitie_spark.operators.kgquery import match_patterns

    with pytest.raises(ValueError, match="optional pattern"):
        match_patterns(
            toy,
            [("?p", "born_in", "?c")],
            optional=[("?x", "knows", "?y")],
        )


# ---------------------------------------------------------------------------
# Property path pred+ (transitive closure)
# ---------------------------------------------------------------------------


def test_transitive_closure_chain_with_min_depth(spark):
    from mitie_spark.operators.kgquery import transitive_closure

    rows = [
        ("u", "a", "contains", "b"),
        ("u", "b", "contains", "c"),
        ("u", "c", "contains", "d"),
        ("u", "a", "contains", "c"),  # shortcut: (a,c) is depth 1, not 2
        ("u", "x", "other", "y"),  # different predicate — excluded
    ]
    t = spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "subj", "pred", "obj"])
    )
    got = {
        (r["src"], r["dst"]): r["depth"]
        for r in transitive_closure(t, "contains").collect()
    }
    assert got == {
        ("a", "b"): 1,
        ("b", "c"): 1,
        ("c", "d"): 1,
        ("a", "c"): 1,  # min depth wins over the 2-hop route
        ("a", "d"): 2,
        ("b", "d"): 2,
    }


def test_transitive_closure_cycle_terminates(spark):
    from mitie_spark.operators.kgquery import transitive_closure

    rows = [("u", "a", "p", "b"), ("u", "b", "p", "a")]
    t = spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "subj", "pred", "obj"])
    )
    got = {
        (r["src"], r["dst"]): r["depth"]
        for r in transitive_closure(t, "p", max_depth=10).collect()
    }
    # SPARQL p+ reaches self through the cycle; frontier empties at d=3
    assert got == {
        ("a", "b"): 1,
        ("b", "a"): 1,
        ("a", "a"): 2,
        ("b", "b"): 2,
    }


def test_transitive_closure_depth_cap(spark):
    from mitie_spark.operators.kgquery import transitive_closure

    rows = [("u", f"n{i}", "p", f"n{i + 1}") for i in range(6)]
    t = spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "subj", "pred", "obj"])
    )
    got = transitive_closure(t, "p", max_depth=2).collect()
    assert max(r["depth"] for r in got) == 2
    assert len(got) == 6 + 5  # 6 direct + 5 two-hop pairs


def test_chained_optional_is_rejected(toy):
    """An optional referencing a variable another optional introduced
    would left-join on a possibly-null key — not SPARQL's sequential
    LeftJoin — so the compiler refuses instead of silently diverging."""
    from mitie_spark.operators.kgquery import match_patterns

    # an optional hanging only off another optional's variable: no
    # required-block anchor at all
    with pytest.raises(ValueError, match="shares no variable"):
        match_patterns(
            toy,
            [("?p", "born_in", "?c")],
            optional=[
                ("?p", "works_for", "?org"),
                ("?org", "knows", "?hq"),
            ],
        )
    # anchored on a required var but ALSO re-referencing an
    # optional-introduced one: the possibly-null-key case
    with pytest.raises(ValueError, match="introduced by"):
        match_patterns(
            toy,
            [("?p", "born_in", "?c")],
            optional=[
                ("?p", "works_for", "?org"),
                ("?p", "knows", "?org"),
            ],
        )


def test_property_path_inside_pattern(spark):
    """A literal predicate ending in '+' matches the transitive closure:
    (?region contains+ ?place) joined with (?p born_in ?place) finds
    people born anywhere UNDER a region, including grandchildren."""
    from mitie_spark.operators.kgquery import match_patterns

    rows = [
        ("u", "europe", "contains", "norway"),
        ("u", "norway", "contains", "oslo"),
        ("u", "bob", "born_in", "oslo"),
        ("u", "ana", "born_in", "norway"),
    ]
    t = spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "subj", "pred", "obj"])
    )
    out = match_patterns(
        t,
        [("?region", "contains+", "?place"), ("?p", "born_in", "?place")],
    )
    got = {(r["region"], r["place"], r["p"]) for r in out.collect()}
    assert got == {
        ("europe", "norway", "ana"),
        ("norway", "oslo", "bob"),
        ("europe", "oslo", "bob"),  # the 2-hop closure edge
    }
    # a variable predicate never path-expands; a bare '+' is a literal
    out2 = match_patterns(t, [("?a", "?rel", "?b")])
    assert out2.count() == 4


def test_path_syntax_guards(toy):
    """'?rel+' raises (a variable cannot path-expand); paths=False turns
    the '+' magic off so a predicate literally NAMED with a '+' suffix
    stays matchable."""
    from mitie_spark.operators.kgquery import match_patterns

    with pytest.raises(ValueError, match="cannot take"):
        match_patterns(toy, [("?a", "?rel+", "?b")])
    rows = [("u", "x", "c++", "y")]
    t = toy.sparkSession.createDataFrame(
        pd.DataFrame(rows, columns=["url", "subj", "pred", "obj"])
    )
    out = match_patterns(t, [("?a", "c++", "?b")], paths=False)
    assert [(r["a"], r["b"]) for r in out.collect()] == [("x", "y")]


# ---------------------------------------------------------------------------
# Randomized differential: compiled BGP joins vs a brute-force matcher
# ---------------------------------------------------------------------------


def _brute_force_bindings(facts, patterns):
    """Reference matcher: per-pattern distinct projections folded by
    consistent variable assignment (exactly the semantics the compiler
    states: distinct facts per pattern, natural join on shared vars)."""
    def pattern_rows(pat):
        rows = set()
        for s, p, o in facts:
            binding = {}
            ok = True
            for term, val in zip(pat, (s, p, o)):
                if term.startswith("?"):
                    name = term[1:]
                    if name in binding and binding[name] != val:
                        ok = False
                        break
                    binding[name] = val
                elif term != val:
                    ok = False
                    break
            if ok:
                rows.add(tuple(sorted(binding.items())))
        return [dict(r) for r in rows]

    bound = [dict(r) for r in pattern_rows(patterns[0])]
    for pat in patterns[1:]:
        nxt = []
        for b in bound:
            for r in pattern_rows(pat):
                if all(b.get(k, v) == v for k, v in r.items()):
                    nxt.append({**b, **r})
        bound = nxt
    return {tuple(sorted(b.items())) for b in bound}


@pytest.mark.parametrize("seed", [5, 17, 99])
def test_bgp_matches_brute_force_on_random_kg(spark, seed):
    import random

    rng = random.Random(seed)
    ents = [f"e{i}" for i in range(6)]
    preds = ["p", "q", "r"]
    facts = {
        (rng.choice(ents), rng.choice(preds), rng.choice(ents))
        for _ in range(40)
    }
    rows = [("u", s, p, o) for s, p, o in facts]
    t = spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "subj", "pred", "obj"])
    )
    from mitie_spark.operators.kgquery import match_patterns

    cases = [
        [("?a", "p", "?b"), ("?b", "q", "?c")],
        [("?a", "p", "?b"), ("?b", "?rel", "?c"), ("?c", "r", "?d")],
        [("?a", "?x", "e1"), ("?a", "q", "?b")],
        [("?a", "p", "?a")],
    ]
    for patterns in cases:
        ref = _brute_force_bindings(facts, patterns)
        got_rows = match_patterns(t, patterns).collect()
        got = {
            tuple(sorted((k, r[k]) for k in r.asDict())) for r in got_rows
        }
        assert got == ref, (patterns, len(got), len(ref))
