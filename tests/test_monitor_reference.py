"""Reference-test transcriptions for the Monitor package:

- `monitor/src/test/.../TestQueryDecomposer.java` (all 11 shapes) against
  `percolate.decompose` — boosts fold into our AST's intrinsic boost
  fields (the structural twin of the reference's BoostQuery re-wrap).
- `monitor/src/test/.../TestMonitor.java` match/register/delete/clear/
  metadata/batching shapes against `percolate.AstMonitor.match`.
- TestMonitor.testMutliValuedFieldWithNonDefaultGaps against MemoryIndex
  multi-valued `add_field(pos_inc_gap=...)`.
"""

import dataclasses

from lucene_ray.index.memoryindex import MemoryIndex
from lucene_ray.pipelines.percolate import AstMonitor, decompose
from lucene_ray.search.query import (
    BoostQuery,
    DisjunctionMaxQuery,
    MatchAllDocsQuery,
    PhraseQuery,
    TermQuery,
    bool_query,
    parse_classic,
)


def parse(s):
    return parse_classic(s)


# ---------------------------------------------------------------------------
# TestQueryDecomposer.java
# ---------------------------------------------------------------------------

def test_conjunctions_are_not_decomposed():
    q = parse("+hello world")
    assert decompose(q) == {parse("+hello world")}


def test_simple_disjunctions():
    assert decompose(parse("hello world")) == {parse("hello"), parse("world")}


def test_nested_disjunctions():
    assert decompose(parse("(hello goodbye) world")) == \
        {parse("hello"), parse("goodbye"), parse("world")}


def test_exclusions():
    expected = {parse("+hello -goodbye"), parse("+world -goodbye")}
    assert decompose(parse("hello world -goodbye")) == expected


def test_nested_exclusions():
    expected = {parse("+(+hello -goodbye) -greeting"),
                parse("+(+world -goodbye) -greeting")}
    assert decompose(parse("((hello world) -goodbye) -greeting")) == expected


def test_single_valued_conjunctions():
    assert decompose(parse("+(hello world)")) == \
        {parse("hello"), parse("world")}


def test_single_valued_conjunct_with_exclusions():
    expected = {parse("+hello -goodbye"), parse("+world -goodbye")}
    assert decompose(parse("+(hello world) -goodbye")) == expected


def test_boosts_are_preserved():
    assert decompose(parse("+(hello world)^0.7")) == \
        {parse("hello^0.7"), parse("world^0.7")}
    expected = {parse("+hello^0.7 -goodbye"), parse("+world^0.7 -goodbye")}
    assert decompose(parse("+(hello world)^0.7 -goodbye")) == expected
    # nested boosts multiply through the intrinsic boost field
    parts = decompose(parse("+(hello^0.5 world)^0.8"))
    assert parts == {TermQuery("hello", boost=0.5 * 0.8),
                     TermQuery("world", boost=0.8)}


def test_disjunction_max_decomposition():
    q = DisjunctionMaxQuery((TermQuery("t1"), TermQuery("t2")), 0.1)
    assert decompose(q) == {TermQuery("t1"), TermQuery("t2")}


def test_nested_disjunction_max_decomposition():
    q = DisjunctionMaxQuery((parse("hello goodbye"), parse("world")), 0.1)
    assert decompose(q) == {parse("hello"), parse("goodbye"), parse("world")}


def test_filter_and_should_clause():
    q = bool_query(should=["should"], filter_=["filter"])
    assert decompose(q) == {q}


def test_boost_one_unwraps():
    # decomposeBoostQuery: boost == 1.0 decomposes the inner query directly
    q = BoostQuery(parse("hello world"), 1.0)
    assert decompose(q) == {parse("hello"), parse("world")}


def test_msm_gt_one_not_decomposed():
    q = bool_query(should=["a", "b", "c"], minimum_should_match=2)
    assert decompose(q) == {q}


# ---------------------------------------------------------------------------
# TestMonitor.java
# ---------------------------------------------------------------------------

def test_single_term_query_matches_single_document():
    mon = AstMonitor([("query1", TermQuery("test"))])
    m = mon.match("This is a test document")
    assert m.match_count() == 1
    assert m.matches("query1") is not None


def test_match_statistics_are_reported():
    mon = AstMonitor([("query1", TermQuery("test"))])
    m = mon.match("This is a test document")
    assert m.queries_run == 1
    assert m.batch_size == 1


def test_updates_overwrite_old_queries():
    mon = AstMonitor([])
    mon.register(("query1", TermQuery("this")))
    mon.register(("query1", TermQuery("that")))
    m = mon.match("that")
    assert m.matches("query1") is not None
    assert m.queries_run == 1


def test_can_delete_by_id():
    mon = AstMonitor([("query1", TermQuery("this"))])
    mon.register(("query2", TermQuery("that")),
                 ("query3", TermQuery("other")))
    assert mon.query_count == 3
    mon.delete_by_id("query2", "query1")
    assert mon.query_count == 1
    m = mon.match("other things")
    assert m.queries_run == 1
    assert m.matches("query3") is not None


def test_can_clear_the_monitor():
    mon = AstMonitor([("query1", MatchAllDocsQuery()),
                      ("query2", MatchAllDocsQuery()),
                      ("query3", MatchAllDocsQuery())])
    assert mon.query_count == 3
    mon.clear()
    assert mon.query_count == 0


def test_matches_against_an_empty_monitor():
    mon = AstMonitor([])
    assert mon.query_count == 0
    m = mon.match("This is a test document")
    assert m.queries_run == 0
    assert m.match_count() == 0


def test_matcher_metadata():
    mon = AstMonitor([("1", parse("+test 1"), {"key": "value"})])
    m = mon.match("This is a test document")
    assert m.matches("1") is not None
    assert m.matches("1").metadata["key"] == "value"
    # metadata survives register-rebuild and delete of other ids
    mon.register(("2", TermQuery("kangaroo")))
    m = mon.match("This is a test document")
    assert m.matches("1").metadata["key"] == "value"


def test_document_batching():
    mon = AstMonitor([("1", TermQuery("kangaroo"))])
    m = mon.match(["This is a test document",
                   "This is a kangaroo document"])
    assert m.batch_size == 2
    assert m.match_count(0) == 0
    assert m.match_count(1) == 1
    assert m.matches("1", doc=1) is not None


def test_multivalued_field_with_non_default_gaps():
    # phrase "hello world"~5 must match within one value but not across
    # values separated by a 1000-position increment gap
    q = PhraseQuery(("hello", "world"), slop=5)
    m1 = MemoryIndex()
    m1.add_field("text", "hello world", pos_inc_gap=1000)
    m1.add_field("text", "goodbye", pos_inc_gap=1000)
    assert m1.matches(q)

    m2 = MemoryIndex()
    m2.add_field("text", "hello", pos_inc_gap=1000)
    m2.add_field("text", "world", pos_inc_gap=1000)
    assert not m2.matches(q)

    # default gap 0: values concatenate (positions stay adjacent)
    m3 = MemoryIndex()
    m3.add_field("text", "hello")
    m3.add_field("text", "world")
    assert m3.matches(q)


def test_decomposed_disjuncts_indexed_separately():
    # Monitor.getDisjunctCount: a pure disjunction indexes per part
    mon = AstMonitor([("q", parse("hello world"))])
    assert mon.query_count == 1
    assert mon.disjunct_count == 2
    # matching still reports the parent once even when both parts hit
    m = mon.match("hello world")
    assert m.match_count() == 1
    assert m.matches("q") is not None


def test_decomposition_screens_unscreenable_disjunct_separately():
    # a disjunction of a term and a phrase: both parts carry their own
    # triggers; a doc with neither trigger term runs zero queries
    mon = AstMonitor([("q", bool_query(
        should=[TermQuery("kangaroo"),
                PhraseQuery(("big", "wombat"))]))])
    m = mon.match("nothing relevant here")
    assert m.queries_run == 0
    m = mon.match("a big wombat appeared")
    assert m.match_count() == 1


def test_classic_parser_boost_shapes():
    # the clause-level boost grammar the decomposer tests rely on
    assert parse("(hello world)^0.7") == BoostQuery(parse("hello world"), 0.7)
    assert parse('"a b"~2^0.5') == PhraseQuery(("a", "b"), slop=2, boost=0.5)
    assert parse("hello^2") == TermQuery("hello", boost=2.0)
    rq = parse("ts:[1 TO 5]^3")
    assert rq.boost == 3.0 and dataclasses.replace(rq, boost=1.0) == \
        parse("ts:[1 TO 5]")
