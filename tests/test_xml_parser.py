"""XML query parser dialect (CoreParser element set —
`queryparser/xml/CoreParser.java` + `builders/`): AST shapes, attribute
conventions (fieldName inheritance, occurs values, boost wrapping), and
execution equivalence against directly-constructed queries."""

import pyarrow as pa
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.search.query import (
    FILTER,
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    IntervalQuery,
    MatchAllDocsQuery,
    PhraseQuery,
    RangeQuery,
    SynonymQuery,
    TermQuery,
    parse_classic,
)
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.search.xmlparser import XmlParseError, parse_xml


# --- AST shapes -----------------------------------------------------------

def test_term_query():
    assert parse_xml('<TermQuery fieldName="text">merge</TermQuery>') \
        == TermQuery("merge", field="text")
    # default field when no fieldName anywhere
    assert parse_xml("<TermQuery>merge</TermQuery>") == TermQuery("merge")


def test_term_query_boost():
    q = parse_xml('<TermQuery boost="2.5">merge</TermQuery>')
    assert q == BoostQuery(TermQuery("merge"), 2.5)


def test_terms_query_analyzed():
    q = parse_xml('<TermsQuery fieldName="text">Merge JOIN data</TermsQuery>')
    assert q == BooleanQuery(tuple(
        BooleanClause(TermQuery(t), SHOULD) for t in ("merge", "join", "data")))


def test_match_all():
    assert parse_xml("<MatchAllDocsQuery/>") == MatchAllDocsQuery()


def test_boolean_query_occurs_and_msm():
    xml = """
    <BooleanQuery minimumNumberShouldMatch="1" fieldName="text">
      <Clause occurs="must"><TermQuery>merge</TermQuery></Clause>
      <Clause occurs="mustNot"><TermQuery>scan</TermQuery></Clause>
      <Clause occurs="filter"><TermQuery>sort</TermQuery></Clause>
      <Clause occurs="should"><TermQuery>join</TermQuery></Clause>
      <Clause><TermQuery>data</TermQuery></Clause>
    </BooleanQuery>"""
    q = parse_xml(xml)
    assert q == BooleanQuery((
        BooleanClause(TermQuery("merge"), MUST),
        BooleanClause(TermQuery("scan"), MUST_NOT),
        BooleanClause(TermQuery("sort"), FILTER),
        BooleanClause(TermQuery("join"), SHOULD),
        BooleanClause(TermQuery("data"), SHOULD),
    ), minimum_should_match=1)


def test_bad_occurs_raises():
    with pytest.raises(XmlParseError):
        parse_xml('<BooleanQuery><Clause occurs="nope">'
                  "<TermQuery>x</TermQuery></Clause></BooleanQuery>")


def test_field_name_inheritance():
    xml = """
    <BooleanQuery fieldName="other">
      <Clause occurs="must"><TermQuery>a</TermQuery></Clause>
      <Clause occurs="must"><TermQuery fieldName="text">b</TermQuery></Clause>
    </BooleanQuery>"""
    q = parse_xml(xml)
    assert q.clauses[0].query.field == "other"
    assert q.clauses[1].query.field == "text"


def test_range_query_bounds():
    q = parse_xml('<RangeQuery fieldName="ts" lowerTerm="5" upperTerm="9"/>')
    assert q == RangeQuery("ts", 5, 9)
    q = parse_xml('<PointRangeQuery fieldName="ts" upperTerm="9" type="long"/>')
    assert q == RangeQuery("ts", None, 9)
    q = parse_xml('<RangeQuery fieldName="ts" lowerTerm="5" upperTerm="9" '
                  'includeLower="false" includeUpper="false"/>')
    assert q == RangeQuery("ts", 6, 8)


def test_dismax():
    xml = """
    <DisjunctionMaxQuery tieBreaker="0.3" fieldName="text">
      <TermQuery>merge</TermQuery>
      <TermQuery boost="2">join</TermQuery>
    </DisjunctionMaxQuery>"""
    q = parse_xml(xml)
    assert q == DisjunctionMaxQuery(
        (TermQuery("merge"), TermQuery("join", boost=2.0)), tie_breaker=0.3)


def test_constant_score():
    q = parse_xml('<ConstantScoreQuery boost="3">'
                  "<TermQuery>merge</TermQuery></ConstantScoreQuery>")
    assert q == ConstantScoreQuery(TermQuery("merge"), boost=3.0)


def test_user_query_is_classic():
    q = parse_xml("<UserQuery>+merge (join sort)</UserQuery>")
    assert q == parse_classic("+merge (join sort)")


def test_span_near_exact_and_sloppy():
    exact = parse_xml('<SpanNear slop="0" inOrder="true">'
                      "<SpanTerm>merge</SpanTerm><SpanTerm>join</SpanTerm>"
                      "</SpanNear>")
    assert exact == PhraseQuery(("merge", "join"))
    near = parse_xml('<SpanNear slop="2" inOrder="false">'
                     "<SpanTerm>merge</SpanTerm><SpanTerm>join</SpanTerm>"
                     "</SpanNear>")
    assert near == IntervalQuery(("merge", "join"), max_width=4, ordered=False)


def test_span_or_terms():
    q = parse_xml("<SpanOrTerms>merge join</SpanOrTerms>")
    assert q == SynonymQuery(("merge", "join"))


def test_span_first_and_position_range():
    from lucene_ray.search.query import SpanPositionRangeQuery

    q = parse_xml("<SpanFirst end='3'><SpanTerm>merge</SpanTerm></SpanFirst>")
    assert q == SpanPositionRangeQuery("merge", 0, 3)
    q = parse_xml("<SpanPositionRange start='2' end='5'>"
                  "<SpanTerm>merge</SpanTerm></SpanPositionRange>")
    assert q == SpanPositionRangeQuery("merge", 2, 5)


def test_unsupported_and_malformed():
    with pytest.raises(XmlParseError):
        parse_xml("<SpanNot><SpanTerm>a</SpanTerm></SpanNot>")
    with pytest.raises(XmlParseError):
        parse_xml("<TermQuery>merge")        # malformed
    with pytest.raises(XmlParseError):
        parse_xml("<TermQuery>  </TermQuery>")


# --- execution equivalence ------------------------------------------------

@pytest.fixture(scope="module")
def xml_idx(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("xmlidx")
    texts = [
        "merge the join carefully",
        "merge sort is stable",
        "join the data now",
        "scan every row",
        "merge join merge join",
    ]
    rows = pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(len(texts))]),
        "turn_idx": pa.array([0] * len(texts), type=pa.int32()),
        "ts": pa.array(list(range(len(texts))), type=pa.int64()),
        "text": pa.array(texts),
    })
    import ray.data as rd

    idx = str(d / "idx")
    build_index(rd.from_arrow(rows), idx, target_docs_per_partition=100,
                docvalue_cols=("ts",), input_desc="xmltest")
    return IndexSearcher(idx)


def test_xml_execution_matches_direct(xml_idx):
    s = xml_idx
    xml = """
    <BooleanQuery>
      <Clause occurs="must"><TermQuery>merge</TermQuery></Clause>
      <Clause occurs="mustNot"><TermQuery>scan</TermQuery></Clause>
      <Clause occurs="filter">
        <RangeQuery fieldName="ts" lowerTerm="0" upperTerm="3"/>
      </Clause>
    </BooleanQuery>"""
    direct = BooleanQuery((
        BooleanClause(TermQuery("merge"), MUST),
        BooleanClause(TermQuery("scan"), MUST_NOT),
        BooleanClause(RangeQuery("ts", 0, 3), FILTER),
    ))
    got = s.search(parse_xml(xml), 10)
    want = s.search(direct, 10)
    assert [(h.gid, h.score) for h in got.hits] \
        == [(h.gid, h.score) for h in want.hits]
    assert got.total_hits == want.total_hits == 2


def test_xml_span_near_counts(xml_idx):
    s = xml_idx
    exact = parse_xml("<SpanNear><SpanTerm>merge</SpanTerm>"
                      "<SpanTerm>join</SpanTerm></SpanNear>")
    assert s.count(exact) == 1               # only doc 4 has them adjacent
    near = parse_xml('<SpanNear slop="2" inOrder="true">'
                     "<SpanTerm>merge</SpanTerm><SpanTerm>join</SpanTerm>"
                     "</SpanNear>")
    assert s.count(near) == 2                # doc 0 within window too


def test_span_position_range_execution(xml_idx):
    s = xml_idx
    from lucene_ray.search.query import SpanPositionRangeQuery, span_first

    # "merge" at position 0 in docs 0, 1, 4; at position 2 in doc 4 too
    assert s.count(span_first("merge", 1)) == 3
    assert s.count(SpanPositionRangeQuery("merge", 1, 4)) == 1   # doc 4 pos 2
    assert s.count(SpanPositionRangeQuery("join", 0, 2)) == 2    # docs 2? check
    # brute force over the corpus
    import pyarrow as pa

    from lucene_ray.analysis.standard import analyze

    texts = ["merge the join carefully", "merge sort is stable",
             "join the data now", "scan every row",
             "merge join merge join"]
    for term, lo, hi in [("merge", 0, 1), ("merge", 1, 4), ("join", 0, 2),
                         ("join", 2, 6), ("data", 0, 2)]:
        want = sum(1 for t in texts
                   if any(lo <= p and p + 1 <= hi
                          for p, w in enumerate(analyze(t)) if w == term))
        got = s.count(SpanPositionRangeQuery(term, lo, hi))
        assert got == want, (term, lo, hi)


def test_span_not(xml_idx):
    from lucene_ray.search.query import SpanNotQuery

    q = parse_xml("<SpanNot><Include><SpanTerm>merge</SpanTerm></Include>"
                  "<Exclude><SpanTerm>join</SpanTerm></Exclude></SpanNot>")
    assert q == SpanNotQuery("merge", "join")
    s = xml_idx
    # pre/post=0: exclusion only when positions coincide -> never for
    # distinct terms; all merge docs match
    assert s.count(q) == s.count(parse_xml("<TermQuery>merge</TermQuery>"))
    # window exclusion: merge occurrences with no adjacent 'join'
    from lucene_ray.analysis.standard import analyze

    texts = ["merge the join carefully", "merge sort is stable",
             "join the data now", "scan every row",
             "merge join merge join"]
    for pre, post in [(0, 1), (1, 2), (0, 3)]:
        want = 0
        for t in texts:
            toks = analyze(t)
            mp = [i for i, w in enumerate(toks) if w == "merge"]
            jp = [i for i, w in enumerate(toks) if w == "join"]
            if any(all(not (p - pre <= x <= p + post) for x in jp)
                   for p in mp):
                want += 1
        got = s.count(SpanNotQuery("merge", "join", pre=pre, post=post))
        assert got == want, (pre, post)


def test_span_or_general(xml_idx):
    from lucene_ray.search.query import SynonymQuery

    q = parse_xml("<SpanOr><SpanTerm>merge</SpanTerm>"
                  "<SpanTerm>scan</SpanTerm></SpanOr>")
    assert q == SynonymQuery(("merge", "scan"))
    s = xml_idx
    mixed = parse_xml("<SpanOr><SpanTerm>scan</SpanTerm>"
                      "<SpanNear><SpanTerm>merge</SpanTerm>"
                      "<SpanTerm>join</SpanTerm></SpanNear></SpanOr>")
    # docs matching 'scan' (doc 3) OR exact "merge join" (doc 4)
    assert s.count(mixed) == 2


def test_xml_like_this_queries(ray_session, tmp_path_factory):
    """LikeThisQuery / FuzzyLikeThisQuery XML builders: AST shapes + the
    deferred MoreLikeThisQuery rewrite (msm = clauses * percent) matches an
    independent more_like_this construction."""
    from dataclasses import replace

    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import FuzzyLikeThisQuery, MoreLikeThisQuery
    from lucene_ray.search.searcher import IndexSearcher, more_like_this
    from lucene_ray.search.xmlparser import parse_xml
    from lucene_ray.sources.transcripts import synth_transcripts

    q = parse_xml('<LikeThisQuery maxQueryTerms="10" minDocFreq="5" '
                  'percentTermsToMatch="30">merge join hash scan'
                  '</LikeThisQuery>')
    assert q == MoreLikeThisQuery("merge join hash scan",
                                  max_query_terms=10, min_doc_freq=5,
                                  percent_terms_to_match=0.3)
    q2 = parse_xml('<FuzzyLikeThisQuery maxNumTerms="12" ignoreTF="true">'
                   '<Field fieldName="text" minSimilarity="1" '
                   'prefixLength="2">mergw</Field></FuzzyLikeThisQuery>')
    assert q2 == FuzzyLikeThisQuery((("mergw", 1, 2),), max_num_terms=12,
                                    ignore_tf=True)

    t = synth_transcripts(700, seed=13)
    d = str(tmp_path_factory.mktemp("xmlmlt"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=300,
                input_desc="xmlmlt")
    s = IndexSearcher(d)
    text = next(x for x in t.column("text").to_pylist()
                if x and "merge" in x)
    qq = MoreLikeThisQuery(text, max_query_terms=10, min_term_freq=1,
                           percent_terms_to_match=0.3)
    td = s.search(qq, k=5)
    bq = more_like_this(s, text, max_query_terms=10, min_term_freq=1,
                        min_doc_freq=5)
    bq = replace(bq, minimum_should_match=int(len(bq.clauses) * 0.3))
    td2 = s.search(bq, k=5)
    assert [(h.gid, h.score) for h in td.hits] == \
        [(h.gid, h.score) for h in td2.hits]
    assert td.total_hits > 0
    # FLT through XML executes
    assert s.search(q2, k=3).total_hits > 0
