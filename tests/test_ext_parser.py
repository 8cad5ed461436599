"""ExtendableQueryParser (`queryparser/ext/`): extension dispatch on
composite fields, delimiter variants, escaping, the unescaped-delimiter
ParseException, and classic-fallback equivalence — the
TestExtendableQueryParser shapes."""

import pytest

SF = "/root/testdata/sf0.001"


class _Stub:
    """ExtensionStub analogue: TermQuery(field, rawQueryString)."""

    def parse(self, eq):
        from lucene_ray.search.query import TermQuery

        return TermQuery(eq.raw_query_string, eq.field)


def _ext(delim=":"):
    from lucene_ray.search.extparser import Extensions

    e = Extensions(delim)
    e.add("testExt", _Stub())
    return e


def test_build_extension_field():
    from lucene_ray.search.extparser import Extensions

    assert Extensions(":").build_extension_field("testExt", "aField") \
        == r"aField\:testExt"
    assert Extensions("-").build_extension_field("testExt", "aField") \
        == r"aField\-testExt"
    assert Extensions(":").build_extension_field("testExt") == r"\:testExt"


def test_split_extension_field():
    from lucene_ray.search.extparser import Extensions

    e = Extensions(":")
    assert e.split_extension_field("dflt", "aField") == ("aField", None)
    assert e.split_extension_field("dflt", "aField:key") == ("aField", "key")
    assert e.split_extension_field("dflt", ":key") == ("dflt", "key")
    # first-delimiter split: the remainder stays in the key
    assert e.split_extension_field("dflt", "a:b:c") == ("a", "b:c")


@pytest.mark.parametrize("delim", [":", "-", "|"])
def test_ext_field_unquoted(delim):
    from lucene_ray.search.extparser import parse_extendable
    from lucene_ray.search.query import BooleanQuery, TermQuery

    ext = _ext(delim)
    field = ext.build_extension_field("testExt", "aField")
    q = parse_extendable(f"{field}:foo bar", field="text", extensions=ext)
    assert isinstance(q, BooleanQuery) and len(q.clauses) == 2
    stub = q.clauses[0].query
    assert stub == TermQuery("foo", "aField")
    assert q.clauses[1].query == TermQuery("bar", "text")


@pytest.mark.parametrize("delim", [":", "-", "|"])
def test_ext_default_field_quoted(delim):
    from lucene_ray.search.extparser import parse_extendable
    from lucene_ray.search.query import TermQuery

    ext = _ext(delim)
    field = ext.build_extension_field("testExt")
    q = parse_extendable(f'{field}:"foo & bar"', field="text",
                         extensions=ext)
    assert q == TermQuery("foo & bar", "text")


def test_unescaped_delimiter_raises():
    from lucene_ray.search.extparser import parse_extendable

    ext = _ext(":")
    with pytest.raises(ValueError):
        parse_extendable('aField:testExt:"foo & bar"', field="text",
                         extensions=ext)


def test_classic_fallback_equivalence():
    from lucene_ray.search.extparser import Extensions, parse_extendable
    from lucene_ray.search.query import parse_classic

    for s in ("+merge (join sort)", 'role:user merge', '"merge join"~2',
              "ts:[1 TO 9] scan*"):
        assert parse_extendable(s, field="text", extensions=Extensions()) \
            == parse_classic(s, field="text")


def test_ext_end_to_end_count(ray_session):
    """A registered extension producing a real engine query searches
    identically to constructing that query directly."""
    from lucene_ray.pipelines.flagship import build_transcript_index
    from lucene_ray.search.extparser import Extensions, parse_extendable
    from lucene_ray.search.query import IntervalQuery
    from lucene_ray.search.searcher import IndexSearcher

    class NearExt:
        def parse(self, eq):
            terms = tuple(eq.raw_query_string.split())
            return IntervalQuery(terms, 5, ordered=True)

    ext = Extensions()
    ext.add("near", NearExt())
    searcher = IndexSearcher(build_transcript_index(SF))
    field = ext.build_extension_field("near")      # default-field form
    q = parse_extendable(f'{field}:"merge join"', field="text",
                         extensions=ext)
    assert q == IntervalQuery(("merge", "join"), 5, ordered=True)
    n = searcher.count(q)
    assert n == searcher.count(IntervalQuery(("merge", "join"), 5,
                                             ordered=True))
    assert n > 0
