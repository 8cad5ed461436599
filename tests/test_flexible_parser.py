"""Flexible (Standard) query parser: AST shapes traced from the reference's
TestQPHelper/TestStandardQP (`queryparser/flexible/standard/
StandardSyntaxParser.jj`, `StandardQueryParser.java`) plus end-to-end
equivalence against hand-built queries over a real index."""

import pytest

from lucene_ray.index.build import build_index
from lucene_ray.search.flexible import (
    FlexibleParseError,
    _float_to_edits,
    parse_flexible,
)
from lucene_ray.search.query import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    FuzzyQuery,
    IntervalQuery,
    MatchAllDocsQuery,
    PhraseQuery,
    PrefixQuery,
    RangeQuery,
    RegexpQuery,
    TermInSetQuery,
    TermQuery,
    WildcardQuery,
)
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.sources.transcripts import synth_transcripts


def t(x):
    return TermQuery(x)


def c(q, occur):
    return BooleanClause(q, occur)


# ---------------- AST shapes (TestQPHelper.testSimple / testGroup) ---------

def test_and_or_shapes():
    # "a AND b" -> "+a +b"
    assert parse_flexible("a AND b") == BooleanQuery((c(t("a"), MUST),
                                                      c(t("b"), MUST)))
    assert parse_flexible("(a AND b)") == parse_flexible("a AND b")
    assert parse_flexible("a && b") == parse_flexible("a AND b")
    # "a OR b" -> "a b"
    assert parse_flexible("a OR b") == BooleanQuery((c(t("a"), SHOULD),
                                                     c(t("b"), SHOULD)))
    assert parse_flexible("a || b") == parse_flexible("a OR b")
    # juxtaposition = default operator (OR)
    assert parse_flexible("a b") == parse_flexible("a OR b")
    # default operator AND
    assert parse_flexible("a b", default_operator=MUST) == \
        parse_flexible("a AND b")
    # "c OR (a AND b)" -> "c (+a +b)"
    assert parse_flexible("c OR (a AND b)") == BooleanQuery((
        c(t("c"), SHOULD), c(parse_flexible("a AND b"), SHOULD)))
    # AND binds tighter than OR
    assert parse_flexible("a AND b OR c") == BooleanQuery((
        c(parse_flexible("a AND b"), SHOULD), c(t("c"), SHOULD)))


def test_negation_shapes():
    want = BooleanQuery((c(t("a"), MUST), c(t("b"), MUST_NOT)))
    assert parse_flexible("a AND NOT b") == want
    assert parse_flexible("a AND -b") == want
    assert parse_flexible("a AND !b") == want
    assert parse_flexible("a && ! b") == want
    # "a OR !b" -> "a -b"
    assert parse_flexible("a OR !b") == BooleanQuery((
        c(t("a"), SHOULD), c(t("b"), MUST_NOT)))
    # "+term -term term" stays mixed
    assert parse_flexible("+term -term term") == BooleanQuery((
        c(t("term"), MUST), c(t("term"), MUST_NOT), c(t("term"), SHOULD)))
    # leading negation (testLeadingNegation)
    neg = BooleanQuery((c(t("term"), MUST_NOT),))
    assert parse_flexible("-term") == neg
    assert parse_flexible("!term") == neg
    assert parse_flexible("NOT term") == neg
    # "!(a AND b) OR c" -> "-(+a +b) c"
    assert parse_flexible("!(a AND b) OR c") == BooleanQuery((
        c(parse_flexible("a AND b"), MUST_NOT), c(t("c"), SHOULD)))
    # negation in parentheses (testNegationInParentheses): "a (!b)" -> "a (-b)"
    assert parse_flexible("a (!b)") == BooleanQuery((
        c(t("a"), SHOULD), c(BooleanQuery((c(t("b"), MUST_NOT),)), SHOULD)))


def test_phrase_boost_slop_shapes():
    assert parse_flexible('"hello there"') == PhraseQuery(("hello", "there"))
    assert parse_flexible('"term germ"~2') == PhraseQuery(("term", "germ"),
                                                          slop=2)
    # single-term phrase degrades to a TermQuery (testSlop '"term"~2' -> term)
    assert parse_flexible('"term"~2') == t("term")
    # boosts: term^2, phrase^2, group^4
    assert parse_flexible("term^2") == BoostQuery(t("term"), 2.0)
    assert parse_flexible('"term germ"~2^2') == BoostQuery(
        PhraseQuery(("term", "germ"), slop=2), 2.0)
    assert parse_flexible("(a AND b)^4 OR c") == BooleanQuery((
        c(BoostQuery(parse_flexible("a AND b"), 4.0), SHOULD),
        c(t("c"), SHOULD)))


def test_wildcard_fuzzy_regexp_shapes():
    assert parse_flexible("term*") == PrefixQuery("term")
    assert parse_flexible("term*^2") == BoostQuery(PrefixQuery("term"), 2.0)
    assert parse_flexible("term*germ") == WildcardQuery("term*germ")
    assert parse_flexible("te?m") == WildcardQuery("te?m")
    # fuzzy: "term~" -> 2 edits; "term~0.7" -> 1 edit (floatToEdits, len 4)
    assert parse_flexible("term~") == FuzzyQuery("term", max_edits=2)
    assert parse_flexible("term~0.7") == FuzzyQuery("term", max_edits=1)
    assert parse_flexible("term~1") == FuzzyQuery("term", max_edits=1)
    assert parse_flexible("term~^3") == BoostQuery(
        FuzzyQuery("term", max_edits=2), 3.0)
    assert _float_to_edits(0.5, 5) == 2 and _float_to_edits(2.0, 5) == 2
    # regexp clause /.../ (flexible-only syntax)
    assert parse_flexible("/.est(s|ing)/") == RegexpQuery(".est(s|ing)")
    # leading wildcard rejected by default (AllowLeadingWildcardProcessor)
    with pytest.raises(FlexibleParseError):
        parse_flexible("*term")
    assert parse_flexible("*term", allow_leading_wildcard=True) == \
        WildcardQuery("*term")
    assert parse_flexible("*", allow_leading_wildcard=True) == \
        MatchAllDocsQuery()


def test_field_and_range_shapes():
    # non-default field -> keyword namespace (engine StringField convention)
    assert parse_flexible("role:user") == TermQuery("role\x1fuser", "role")
    # field applies to a whole group
    assert parse_flexible("role:(user OR tool)") == BooleanQuery((
        c(TermQuery("role\x1fuser", "role"), SHOULD),
        c(TermQuery("role\x1ftool", "role"), SHOULD)))
    # bracket ranges: inclusive / exclusive / open
    assert parse_flexible("ts:[5 TO 9]") == RangeQuery("ts", 5, 9)
    assert parse_flexible("ts:{5 TO 9}") == RangeQuery("ts", 6, 8)
    assert parse_flexible("ts:[* TO 9]") == RangeQuery("ts", None, 9)
    assert parse_flexible("ts:{5 TO *]") == RangeQuery("ts", 6, None)
    # FieldRangeExpr shorthand: field < value etc (flexible-only syntax)
    assert parse_flexible("ts<9") == RangeQuery("ts", None, 8)
    assert parse_flexible("ts<=9") == RangeQuery("ts", None, 9)
    assert parse_flexible("ts>5") == RangeQuery("ts", 6, None)
    assert parse_flexible("ts>=5") == RangeQuery("ts", 5, None)
    # field '=' alternative for ':'
    assert parse_flexible("role=user") == TermQuery("role\x1fuser", "role")


def test_min_should_match_shapes():
    # "(blue crab fish)@2"
    assert parse_flexible("(blue crab fish)@2") == BooleanQuery(
        (c(t("blue"), SHOULD), c(t("crab"), SHOULD), c(t("fish"), SHOULD)), 2)
    # nested complex sub-clauses allowed
    q = parse_flexible("((yellow OR blue) crab fish)@2")
    assert isinstance(q, BooleanQuery) and q.minimum_should_match == 2
    # @n on a non-disjunction is rejected (MinShouldMatchNode contract)
    with pytest.raises(FlexibleParseError):
        parse_flexible("(+a +b)@2")


def test_interval_function_shapes():
    assert parse_flexible("fn:ordered(quick brown fox)") == IntervalQuery(
        ("quick", "brown", "fox"), 1 << 30, ordered=True)
    assert parse_flexible("fn:unordered(quick fox)") == IntervalQuery(
        ("quick", "fox"), 1 << 30, ordered=False)
    assert parse_flexible("fn:maxwidth(5 fn:unordered(quick fox))") == \
        IntervalQuery(("quick", "fox"), 5, ordered=False)
    assert parse_flexible("fn:maxgaps(1 fn:ordered(a b c))") == \
        IntervalQuery(("a", "b", "c"), 4, ordered=True)
    assert parse_flexible("fn:phrase(quick brown)") == IntervalQuery(
        ("quick", "brown"), 2, ordered=True)
    assert parse_flexible("fn:or(quick fox)") == TermInSetQuery(
        ("quick", "fox"))
    assert parse_flexible("fn:atLeast(2 quick brown fox)") == BooleanQuery(
        (c(t("quick"), SHOULD), c(t("brown"), SHOULD), c(t("fox"), SHOULD)), 2)
    assert parse_flexible("fn:wildcard(qui*)") == WildcardQuery("qui*")
    from lucene_ray.search.spans import SpanRelationQuery

    assert parse_flexible("fn:extend(quick 1 1)") == SpanRelationQuery(
        "extend", "quick", before=1, after=1)
    assert parse_flexible("fn:notWithin(quick 2 fox)") == SpanRelationQuery(
        "not_within", "quick", reference="fox", positions=2)
    with pytest.raises(NotImplementedError):
        parse_flexible("fn:bogus(quick)")


def test_escaping():
    # the escaped characters reach the (analyzing) term pipeline as one
    # token string; with StandardAnalyzer semantics the punctuation then
    # splits into words — exactly what the reference does when the default
    # field is analyzed.  On a keyword field the escaped string survives
    # verbatim (StringField path, no analysis).
    assert parse_flexible(r"role:\(x\+y\)") == \
        TermQuery("role\x1f(x+y)", "role")
    assert parse_flexible(r"\:\(quoted\+term\)\:") == BooleanQuery((
        c(t("quoted"), SHOULD), c(t("term"), SHOULD)))


# ---------------- end-to-end over a real index -----------------------------

@pytest.fixture(scope="module")
def flex_index(ray_session, tmp_path_factory):
    import ray.data as rd

    tbl = synth_transcripts(1200, seed=91)
    d = str(tmp_path_factory.mktemp("flexidx"))
    build_index(rd.from_arrow(tbl), d, target_docs_per_partition=400,
                keyword_cols=("role",), docvalue_cols=("ts",),
                input_desc="flex")
    return IndexSearcher(d)


def _ids(s, q, k=100):
    td = s.search(q, k=k)
    return [(h.gid, round(h.score, 5)) for h in td.hits], td.total_hits


def test_flexible_matches_handbuilt_end_to_end(flex_index):
    s = flex_index
    cases = [
        ("merge AND join", BooleanQuery((c(t("merge"), MUST),
                                         c(t("join"), MUST)))),
        ('"the data"~3 OR scan', BooleanQuery((
            c(PhraseQuery(("the", "data"), slop=3), SHOULD),
            c(t("scan"), SHOULD)))),
        ("mer* AND NOT role:tool", BooleanQuery((
            c(PrefixQuery("mer"), MUST),
            c(TermQuery("role\x1ftool", "role"), MUST_NOT)))),
        ("(merge join scan)@2", BooleanQuery((
            c(t("merge"), SHOULD), c(t("join"), SHOULD),
            c(t("scan"), SHOULD)), 2)),
        ("fn:maxwidth(6 fn:ordered(merge join))",
         IntervalQuery(("merge", "join"), 6, ordered=True)),
    ]
    for text, handbuilt in cases:
        got, n_got = _ids(s, parse_flexible(text))
        want, n_want = _ids(s, handbuilt)
        assert (got, n_got) == (want, n_want), text
    # non-trivial hit counts (corpus really exercises the queries)
    assert _ids(s, parse_flexible("merge AND join"))[1] > 0
    assert _ids(s, parse_flexible("(merge join scan)@2"))[1] > 0


def test_interval_functions_on_span_algebra():
    """Nested interval functions compose on the span algebra; pure-term
    sources keep the specialized interval engine."""
    from lucene_ray.search.spans import (
        SpanContainingQuery,
        SpanNearQuery,
        SpanOrQuery,
        SpanWithinQuery,
    )

    # nested or inside ordered -> span near of span or
    q = parse_flexible("fn:ordered(fn:or(quick fast) fox)")
    assert q == SpanNearQuery((SpanOrQuery(("quick", "fast")), "fox"),
                              slop=1 << 29, in_order=True)
    # before/after are ordered pairs (doc-level existence)
    assert parse_flexible("fn:before(a b)") == SpanNearQuery(
        ("a", "b"), slop=1 << 29, in_order=True)
    assert parse_flexible("fn:after(a b)") == SpanNearQuery(
        ("b", "a"), slop=1 << 29, in_order=True)
    # containing(big small) / containedBy(small big)
    big = SpanNearQuery(("the", "data"), slop=1 << 29, in_order=True)
    assert parse_flexible("fn:containing(fn:ordered(the data) of)") == \
        SpanContainingQuery(big, "of")
    assert parse_flexible("fn:containedBy(of fn:ordered(the data))") == \
        SpanWithinQuery("of", big)
    # fuzzyTerm leaf
    assert parse_flexible("fn:ordered(fn:fuzzyTerm(merge) x)") == \
        SpanNearQuery((FuzzyQuery("merge"), "x"), slop=1 << 29, in_order=True)
    # maxgaps over a nested span source maps onto span-near slop
    got = parse_flexible("fn:maxgaps(2 fn:ordered(fn:or(a b) c))")
    assert got == SpanNearQuery((SpanOrQuery(("a", "b")), "c"), slop=2,
                                in_order=True)
    # nested phrase converts to a slop-0 span source inside ordered
    got = parse_flexible("fn:ordered(fn:phrase(big data) fn:or(x y))")
    assert got == SpanNearQuery(
        (SpanNearQuery(("big", "data"), slop=0, in_order=True),
         SpanOrQuery(("x", "y"))), slop=1 << 29, in_order=True)
    # pure-term forms unchanged (interval engine)
    assert parse_flexible("fn:ordered(quick brown fox)") == IntervalQuery(
        ("quick", "brown", "fox"), 1 << 30, ordered=True)


def test_interval_span_functions_end_to_end(flex_index):
    from lucene_ray.search.spans import SpanNearQuery, SpanOrQuery

    s = flex_index
    q = parse_flexible("fn:ordered(fn:or(merge sort) join)")
    want = SpanNearQuery((SpanOrQuery(("merge", "sort")), "join"),
                         slop=1 << 29, in_order=True)
    got, n_got = _ids(s, q)
    expect, n_want = _ids(s, want)
    assert (got, n_got) == (expect, n_want) and n_got > 0


def test_flexible_escaped_wildcards_literal():
    """Escaped \\* / \\? stay literal through the flexible dialect (the
    wildcard routing runs on the escaped form)."""
    from lucene_ray.search.flexible import parse_flexible
    from lucene_ray.search.query import PrefixQuery, TermQuery

    assert parse_flexible(r"data\*") == TermQuery("data")
    assert parse_flexible("data*") == PrefixQuery("data")
    assert parse_flexible(r"a\*b*") == PrefixQuery("a*b")
