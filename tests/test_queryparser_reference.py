"""QueryParserTestBase.java assertQueryEquals vectors against
parse_classic + query_to_string (the Query.toString twin).  Analyzer-
independent vectors only — the reference's null analyzer is a lowercasing
tokenizer like our standard chain; vectors that rely on MockAnalyzer
keep-case / stopword behaviors are skipped.  Line numbers reference
`queryparser/src/test/.../util/QueryParserTestBase.java`."""

import pytest

from lucene_ray.search.query import parse_classic, query_to_string


def q(s: str) -> str:
    return query_to_string(parse_classic(s))


# testSimple (:349-390) + testPunctuation-free operator shapes
SIMPLE = [
    ("term term term", "term term term"),
    ("a AND b", "+a +b"),
    ("(a AND b)", "+a +b"),
    ("c OR (a AND b)", "c (+a +b)"),
    ("a AND NOT b", "+a -b"),
    ("a AND -b", "+a -b"),
    ("a AND !b", "+a -b"),
    ("a && b", "+a +b"),
    ("a OR b", "a b"),
    ("a || b", "a b"),
    ("a OR !b", "a -b"),
    ("a OR -b", "a -b"),
    ("+term -term term", "+term -term term"),
    ('term AND "phrase phrase"', '+term +"phrase phrase"'),
    ('"hello there"', '"hello there"'),
    ("germ term^2.0", "germ (term)^2.0"),
    ("(term)^2.0", "(term)^2.0"),
    ("(germ term)^2.0", "(germ term)^2.0"),
    ("term^2.0", "(term)^2.0"),
    ("term^2", "(term)^2.0"),
    ('"germ term"^2.0', '("germ term")^2.0'),
    ('"term germ"^2', '("term germ")^2.0'),
    ("(foo OR bar) AND (baz OR boo)", "+(foo bar) +(baz boo)"),
    ("((a OR b) AND NOT c) OR d", "(+(a b) -c) d"),
]

# testSlop (:424-428)
SLOP = [
    ('"term germ"~2', '"term germ"~2'),
    ('"term germ"~2 flork', '"term germ"~2 flork'),
    ('"term"~2', "term"),
    ('" "~2 germ', "germ"),
    ('"term germ"~2^2', '("term germ"~2)^2.0'),
]

# testWildcard (:444-451)
WILDCARD = [
    ("term*", "term*"),
    ("term*^2", "(term*)^2.0"),
    ("term~", "term~2"),
    ("term~1", "term~1"),
    ("term~0.7", "term~1"),
    ("term~^3", "(term~2)^3.0"),
    ("term*germ", "term*germ"),
    ("term*germ^3", "(term*germ)^3.0"),
]

# testRange (:559-631) — the 'a' analyzer only lowercases here, which the
# standard chain does too
RANGE = [
    ("[ a TO z]", "[a TO z]"),
    ("[ a TO z}", "[a TO z}"),
    ("{ a TO z]", "{a TO z]"),
    ("[ a TO * ]", "[a TO *]"),
    ("[ * TO z ]", "[* TO z]"),
    ("[ * TO * ]", "[* TO *]"),
    ("{ a TO z ]", "{a TO z]"),
    ("[ a TO z }", "[a TO z}"),
    ("{ a TO * ]", "{a TO *]"),
    ("[ * TO z }", "[* TO z}"),
    ("[ a TO z ]", "[a TO z]"),
    ("{ a TO z}", "{a TO z}"),
    ("{ a TO z }", "{a TO z}"),
    ("{ a TO z }^2.0", "({a TO z})^2.0"),
    ("[ a TO z] OR bar", "[a TO z] bar"),
    ("[ a TO z] AND bar", "+[a TO z] +bar"),
    ("( bar blar { a TO z}) ", "bar blar {a TO z}"),
    ("gack ( bar blar { a TO z}) ", "gack (bar blar {a TO z})"),
    ("[* TO Z]", "[* TO z]"),
    ("[A TO *]", "[a TO *]"),
    ("[* TO *]", "[* TO *]"),
    ("[to TO to]", "[to TO to]"),
    ("[to TO TO]", "[to TO to]"),
    ("[TO TO to]", "[to TO to]"),
    ("[TO TO TO]", "[to TO to]"),
    ('["TO" TO "TO"]', "[to TO to]"),
    ('["TO" TO TO]', "[to TO to]"),
    ('[TO TO "TO"]', "[to TO to]"),
    ("[to TO xx]", "[to TO xx]"),
    ('["TO" TO xx]', "[to TO xx]"),
    ("[TO TO xx]", "[to TO xx]"),
    ("[xx TO to]", "[xx TO to]"),
    ('[xx TO "TO"]', "[xx TO to]"),
    ("[xx TO TO]", "[xx TO to]"),
    ("{A TO B}", "{a TO b}"),
    ("[A TO B}", "[a TO b}"),
    ("{A TO B]", "{a TO b]"),
    ("[A TO B]", "[a TO b]"),
    # escaped bounds (:804-805)
    ("[ a\\- TO a\\+ ]", "[a- TO a+]"),
    ("[ a\\: TO a\\~ ]", "[a: TO a~]"),
]


@pytest.mark.parametrize("src,want", SIMPLE)
def test_simple_vectors(src, want):
    assert q(src) == want


@pytest.mark.parametrize("src,want", SLOP)
def test_slop_vectors(src, want):
    assert q(src) == want


@pytest.mark.parametrize("src,want", WILDCARD)
def test_wildcard_vectors(src, want):
    assert q(src) == want


@pytest.mark.parametrize("src,want", RANGE)
def test_range_vectors(src, want):
    assert q(src) == want


def test_fielded_conjunction():
    # :374 with our default-field name substituted for "field"
    assert q("foo:term AND text:anotherTerm") == "+foo:term +anotherterm"


def test_star_parsing():
    # testStarParsing: f:* = any value in the field (FieldExistsQuery
    # rewrite of WildcardQuery(f, "*")); escaped star stays literal
    from lucene_ray.search.query import FieldExistsQuery, TermQuery

    assert parse_classic("role:*") == FieldExistsQuery("role")
    # escaped star stays a literal keyword term
    assert parse_classic("role:\\*") == TermQuery("role\x1f*", "role")


def test_default_operator_and():
    # testDefaultOperator shapes: the parser flips with AND default
    assert query_to_string(
        parse_classic("a b", default_operator="AND")) == "+a +b"
    assert query_to_string(
        parse_classic("a OR b", default_operator="AND")) == "a b"
