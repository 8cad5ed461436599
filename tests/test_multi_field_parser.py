"""MultiFieldQueryParser (`queryparser/classic/MultiFieldQueryParser.java`
+ the TestMultiFieldQueryParser shapes): field-less leaves expand across
the field list grouped per term; boost map applied inside each group;
explicit fields stay single-field; the three static parse overloads."""

import pytest

from lucene_ray.search.query import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    FuzzyQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
    WildcardQuery,
    multi_field_parse,
    parse_multi_field,
)

SF = "/root/testdata/sf0.001"
F = ("text", "role")


def _group(*legs, occur=SHOULD):
    return BooleanClause(
        BooleanQuery(tuple(BooleanClause(q, SHOULD) for q in legs)), occur)


def test_simple_terms():
    # "one" -> single cross-field group at top level ("b:one t:one")
    q = parse_multi_field("one", F)
    assert q == BooleanQuery((
        BooleanClause(TermQuery("one", "text"), SHOULD),
        BooleanClause(TermQuery("role\x1fone", "role"), SHOULD)))
    # "one two" -> "(b:one t:one) (b:two t:two)"
    q = parse_multi_field("one two", F)
    assert q == BooleanQuery((
        _group(TermQuery("one", "text"), TermQuery("role\x1fone", "role")),
        _group(TermQuery("two", "text"), TermQuery("role\x1ftwo", "role"))))


def test_signed_groups():
    # "+one +two" -> "+(..) +(..)"; "+one -two" mixes occurs per group
    q = parse_multi_field("+one -two", F)
    assert q.clauses[0].occur == MUST
    assert q.clauses[1].occur == MUST_NOT
    assert q.clauses[0].query.clauses[0].query == TermQuery("one", "text")


def test_prefix_wildcard_fuzzy_expansion():
    q = parse_multi_field("one*", F)
    assert q == BooleanQuery((
        BooleanClause(PrefixQuery("one", "text"), SHOULD),
        BooleanClause(PrefixQuery("role\x1fone", "role"), SHOULD)))
    q = parse_multi_field("w?ldcard", F)
    assert q == BooleanQuery((
        BooleanClause(WildcardQuery("w?ldcard", "text"), SHOULD),
        BooleanClause(WildcardQuery("role\x1fw?ldcard", "role"), SHOULD)))
    q = parse_multi_field("one~2", F)
    # keyword-namespace leg pins the namespace via prefix_length
    assert q == BooleanQuery((
        BooleanClause(FuzzyQuery("one", max_edits=2, field="text"), SHOULD),
        BooleanClause(FuzzyQuery("role\x1fone", max_edits=2, prefix_length=5,
                                 field="role"), SHOULD)))


def test_phrase_expansion():
    # 'b:"foo bar"~4 t:"foo bar"~4' — text leg a sloppy phrase, keyword leg
    # the raw single-token value
    q = parse_multi_field('"foo bar"~4', F)
    assert q == BooleanQuery((
        BooleanClause(PhraseQuery(("foo", "bar"), "text", slop=4), SHOULD),
        BooleanClause(TermQuery("role\x1ffoo bar", "role"), SHOULD)))


def test_explicit_field_stays_single():
    # "(b:one t:one) f:two" — the reference's non-null-field dispatch
    q = parse_multi_field("one tool:two", F)
    assert q.clauses[0].query.clauses[1].query == \
        TermQuery("role\x1fone", "role")
    assert q.clauses[1].query == TermQuery("tool\x1ftwo", "tool")


def test_boost_map():
    # "(b:one)^5.0 (t:one)^10.0"
    q = parse_multi_field("one", F, boosts={"text": 5.0, "role": 10.0})
    assert q == BooleanQuery((
        BooleanClause(BoostQuery(TermQuery("one", "text"), 5.0), SHOULD),
        BooleanClause(BoostQuery(TermQuery("role\x1fone", "role"), 10.0),
                      SHOULD)))
    # boost map missing a field leaves that leg unwrapped
    q = parse_multi_field("one", F, boosts={"role": 10.0})
    assert q.clauses[0].query == TermQuery("one", "text")


def test_static_parse_zip():
    # parse(queries[], fields[]): "b:one t:two"
    q = multi_field_parse(["one", "two"], F)
    assert q == BooleanQuery((
        BooleanClause(TermQuery("one", "text"), SHOULD),
        BooleanClause(TermQuery("role\x1ftwo", "role"), SHOULD)))
    with pytest.raises(ValueError):
        multi_field_parse(["one"], F)


def test_static_parse_flags():
    # parse(query, fields, flags): "+b:one -t:one"
    q = multi_field_parse("one", F, flags=(MUST, MUST_NOT))
    assert q == BooleanQuery((
        BooleanClause(TermQuery("one", "text"), MUST),
        BooleanClause(TermQuery("role\x1fone", "role"), MUST_NOT)))
    with pytest.raises(ValueError):
        multi_field_parse("one", F, flags=(MUST,))


def test_static_parse_skips_empty():
    # a per-field parse that analyzes to nothing is skipped (the
    # reference's q != null guard for stopword-only queries)
    q = multi_field_parse(["...", "user"], F)
    assert q == BooleanQuery((
        BooleanClause(TermQuery("role\x1fuser", "role"), SHOULD),))


def test_end_to_end_counts(ray_session):
    """Expanded query counts match the hand-built equivalent, and the
    keyword leg really contributes (role:user docs lack the text term)."""
    from lucene_ray.pipelines.flagship import build_transcript_index
    from lucene_ray.search.query import bool_query
    from lucene_ray.search.searcher import IndexSearcher

    s = IndexSearcher(build_transcript_index(SF))
    q = parse_multi_field("user", F)
    manual = bool_query(should=[TermQuery("user", "text"),
                                TermQuery("role\x1fuser", "role")])
    n = s.count(q)
    assert n == s.count(manual)
    assert n >= s.count(TermQuery("role\x1fuser", "role")) > 0
    # boosted multi-field top-k executes and ranks role matches first
    # under a dominant role boost
    qb = parse_multi_field("user", F, boosts={"text": 0.1, "role": 100.0})
    top = s.search(qb, k=5)
    assert len(top.hits) == 5
