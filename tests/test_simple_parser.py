"""SimpleQueryParser semantics (ports the shapes of
`queryparser/src/test/.../simple/TestSimpleQueryParser.java`): operators,
precedence, negation, phrases, prefix/fuzzy, and the tolerant repair of
broken syntax."""

from lucene_ray.search.query import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanClause,
    BooleanQuery,
    FuzzyQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
    parse_simple,
)


def b(*clauses):
    return BooleanQuery(tuple(clauses))


def test_term_and_default_or():
    assert parse_simple("foo") == TermQuery("foo")
    assert parse_simple("foo bar") == b(
        BooleanClause(TermQuery("foo"), SHOULD),
        BooleanClause(TermQuery("bar"), SHOULD))


def test_default_operator_and():
    assert parse_simple("foo bar", default_operator=MUST) == b(
        BooleanClause(TermQuery("foo"), MUST),
        BooleanClause(TermQuery("bar"), MUST))


def test_explicit_and_or():
    assert parse_simple("foo + bar") == b(
        BooleanClause(TermQuery("foo"), MUST),
        BooleanClause(TermQuery("bar"), MUST))
    assert parse_simple("foo | bar") == b(
        BooleanClause(TermQuery("foo"), SHOULD),
        BooleanClause(TermQuery("bar"), SHOULD))


def test_precedence_and_binds_tighter():
    # a + b | c  ->  (a AND b) OR c
    q = parse_simple("a + b | c")
    assert q == b(
        BooleanClause(b(BooleanClause(TermQuery("a"), MUST),
                        BooleanClause(TermQuery("b"), MUST)), SHOULD),
        BooleanClause(TermQuery("c"), SHOULD))


def test_negation():
    assert parse_simple("-foo") == b(BooleanClause(TermQuery("foo"), MUST_NOT))
    assert parse_simple("foo + -bar") == b(
        BooleanClause(TermQuery("foo"), MUST),
        BooleanClause(TermQuery("bar"), MUST_NOT))


def test_phrase_and_slop():
    assert parse_simple('"foo bar"') == PhraseQuery(("foo", "bar"))
    assert parse_simple('"foo bar"~2') == PhraseQuery(("foo", "bar"), slop=2)


def test_prefix_and_fuzzy():
    assert parse_simple("foo*") == PrefixQuery("foo")
    assert parse_simple("foo~1") == FuzzyQuery("foo", max_edits=1)


def test_parens_group():
    q = parse_simple("(a | b) + c")
    assert q == b(
        BooleanClause(b(BooleanClause(TermQuery("a"), SHOULD),
                        BooleanClause(TermQuery("b"), SHOULD)), MUST),
        BooleanClause(TermQuery("c"), MUST))


def test_tolerant_broken_syntax():
    # dangling operators, unbalanced quotes/parens never raise
    assert parse_simple("| foo") == TermQuery("foo")
    assert parse_simple("foo +") == TermQuery("foo")
    assert parse_simple('"unclosed phrase') == PhraseQuery(("unclosed", "phrase"))
    assert parse_simple("(a b") == b(
        BooleanClause(TermQuery("a"), SHOULD),
        BooleanClause(TermQuery("b"), SHOULD))
    assert parse_simple("") == BooleanQuery(())
    assert parse_simple("+ | -") == BooleanQuery(())


def test_analyzed_terms_lowercase():
    assert parse_simple("FOO") == TermQuery("foo")


def test_executes_through_searcher(ray_session):
    from lucene_ray.pipelines.flagship import build_transcript_index
    from lucene_ray.search.query import bool_query
    from lucene_ray.search.searcher import IndexSearcher

    s = IndexSearcher(build_transcript_index("/root/testdata/sf0.001"))
    n_simple = s.count(parse_simple("merge + join"))
    n_ref = s.count(bool_query(must=["merge", "join"]))
    assert n_simple == n_ref > 0
    # grouped query runs through the nested path
    assert s.count(parse_simple("(merge | join) + -window")) > 0


def test_simple_escapes():
    """SimpleQueryParser escape handling: \\ before any special char makes
    it literal text (operators, wildcard star, tilde, parens)."""
    from lucene_ray.search.query import (
        FuzzyQuery,
        PrefixQuery,
        TermQuery,
        parse_simple,
    )

    assert parse_simple(r"data\*") == TermQuery("data")
    assert parse_simple("data*") == PrefixQuery("data")
    # escaped + is literal text -> two analyzed SHOULD terms, not AND
    q = parse_simple(r"a\+b")
    assert all(c.occur == "SHOULD" for c in q.clauses)
    # escaped tilde is literal, unescaped is fuzzy
    assert parse_simple("merge~1") == FuzzyQuery("merge", max_edits=1)
    assert not isinstance(parse_simple(r"merge\~1"), FuzzyQuery)
    assert parse_simple(r"\(x\)") == TermQuery("x")
