"""PrecedenceQueryParser (`queryparser/flexible/precedence/
PrecedenceQueryParser.java`) — TestPrecedenceQueryParser.testPrecedence
equivalence pairs plus the shared-grammar vectors that differ from the
classic addClause semantics."""

import pytest

from lucene_ray.search.query import (
    parse_classic,
    parse_precedence,
    query_to_string,
)


# TestPrecedenceQueryParser.testPrecedence: (query1, query2) must parse equal
PAIRS = [
    ("A AND B OR C AND D", "(A AND B) OR (C AND D)"),
    ("A OR B C", "(A B) C"),
    ("A AND B C", "(+A +B) C"),
    ("A AND NOT B", "+A -B"),
    ("A OR NOT B", "A -B"),
    ("A OR NOT B AND C", "A (-B +C)"),
]


@pytest.mark.parametrize("q1,q2", PAIRS)
def test_precedence_pairs(q1, q2):
    assert parse_precedence(q1) == parse_precedence(q2)


@pytest.mark.parametrize("q1,q2", [
    ("A AND B OR C AND D", "(A AND B) OR (C AND D)"),
])
def test_precedence_pairs_default_and(q1, q2):
    assert parse_precedence(q1, default_operator="AND") == \
        parse_precedence(q2, default_operator="AND")


def test_default_operator_and_juxtaposition():
    assert query_to_string(
        parse_precedence("A B", default_operator="AND")) == "+a +b"


# testSimple vectors shared with the classic grammar still hold
SHARED = [
    ("term term term", "term term term"),
    ("a AND b", "+a +b"),
    ("(a AND b)", "+a +b"),
    ("c OR (a AND b)", "c (+a +b)"),
    ("a AND NOT b", "+a -b"),
    ("a && b", "+a +b"),
    ("a && ! b", "+a -b"),
    ("a OR b", "a b"),
    ("a || b", "a b"),
    ("a OR !b", "a -b"),
    ("a OR ! b", "a -b"),
    ("a OR -b", "a -b"),
    ("+term -term term", "+term -term term"),
    ('term AND "phrase phrase"', '+term +"phrase phrase"'),
    ("(foo OR bar) AND (baz OR boo)", "+(foo bar) +(baz boo)"),
    ("((a OR b) AND NOT c) OR d", "(+(a b) -c) d"),
]


@pytest.mark.parametrize("src,want", SHARED)
def test_shared_grammar_vectors(src, want):
    assert query_to_string(parse_precedence(src)) == want


def test_divergence_from_classic():
    # the motivating case: classic addClause flips only the adjacent
    # clause, precedence groups both sides
    p = parse_precedence("A AND B OR C AND D")
    c = parse_classic("A AND B OR C AND D")
    assert p != c
    assert query_to_string(p) == "(+a +b) (+c +d)"
    # classic addClause: AND requires the current clause and flips the
    # previous one — the whole chain flattens to one required list
    assert query_to_string(c) == "+a +b +c +d"


def test_e2e_count(ray_session, tmp_path):
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.searcher import IndexSearcher
    from lucene_ray.sources.transcripts import synth_transcripts

    t = synth_transcripts(800, seed=4)
    d = str(tmp_path / "pidx")
    build_index(rd.from_arrow(t), d, target_docs_per_partition=300,
                input_desc="prec")
    s = IndexSearcher(d)
    import lucene_ray.analysis.standard as std

    toks = [set(std.analyze(x) if x else []) for x in
            t.column("text").to_pylist()]
    want = sum(1 for ts in toks
               if ("merge" in ts and "join" in ts)
               or ("sort" in ts and "scan" in ts))
    got = s.count(parse_precedence("merge AND join OR sort AND scan"))
    assert got == want
