"""Query-AST JSON round-trips (search/serialize.py) + Monitor persistence
(MonitorQuerySerializer role)."""

import numpy as np
import pytest


def test_roundtrip_nested_queries():
    from lucene_ray.search.query import (
        BooleanClause,
        BooleanQuery,
        BoostQuery,
        CombinedFieldQuery,
        FuzzyLikeThisQuery,
        FuzzyQuery,
        MultiPhraseQuery,
        PhraseQuery,
        PrefixQuery,
        RangeQuery,
        TermQuery,
        bool_query,
    )
    from lucene_ray.search.serialize import dumps_query, loads_query

    cases = [
        TermQuery("merge", boost=2.5),
        PhraseQuery(("state", "of", "the", "art"), slop=2),
        bool_query(must=["a"], should=["b", "c"], must_not=["d"],
                   minimum_should_match=1),
        BooleanQuery((BooleanClause(BoostQuery(PrefixQuery("vec"), 3.0),
                                    "SHOULD"),
                      BooleanClause(RangeQuery("ts", 5, 10), "FILTER"))),
        FuzzyQuery("mrge", max_edits=1, prefix_length=1),
        FuzzyLikeThisQuery((("vectr merge", 1, 1),), max_num_terms=8),
        CombinedFieldQuery(("user",), (("text", 1.0), ("role", 2.0))),
        MultiPhraseQuery((("fast", "quick"), ("merge",))),
    ]
    for q in cases:
        s = dumps_query(q)
        q2 = loads_query(s)
        assert q2 == q, q
        assert dumps_query(q2) == s


def test_roundtrip_span_and_geo():
    from lucene_ray.search.geo import LatLonDistanceQuery, lat_lon_box_query
    from lucene_ray.search.serialize import dumps_query, loads_query
    from lucene_ray.search.spans import SpanNearQuery, SpanOrQuery

    q = SpanNearQuery(("merge", SpanOrQuery(("a", "b"))),
                      slop=3, in_order=True)
    assert loads_query(dumps_query(q)) == q
    g = LatLonDistanceQuery("loc", 37.0, -122.0, 5000.0)
    assert loads_query(dumps_query(g)) == g
    box = lat_lon_box_query("loc", -10.0, 10.0, 20.0, -20.0)  # dateline split
    assert loads_query(dumps_query(box)) == box


def test_monitor_persistence_roundtrip(ray_session, tmp_path):
    """A reloaded Monitor matches exactly like the original (Monitor
    restart with persisted queries)."""
    from lucene_ray.pipelines.percolate import AstMonitor, _registered_ast
    from lucene_ray.search.serialize import load_monitor, save_monitor

    registered = _registered_ast()
    m1 = AstMonitor(registered)
    path = str(tmp_path / "monitor.json")
    save_monitor(path, registered)
    m2 = load_monitor(path)
    import pandas as pd

    doc_ids = np.arange(4)
    texts = pd.Series(["merge join now", "the window is open with batch",
                       "vector search scan merge", "window pane"])
    r1 = m1.match_batch(doc_ids, texts)
    r2 = m2.match_batch(doc_ids, texts)
    assert [tuple(x) for x in zip(*r1)] == [tuple(x) for x in zip(*r2)]
    assert len(r1[0]) > 0


def test_monitor_register_and_delete(ray_session):
    """Monitor.register / deleteById: matches reflect the mutated query set
    exactly (rebuilt trigger index)."""
    import pandas as pd

    from lucene_ray.pipelines.percolate import AstMonitor
    from lucene_ray.search.query import PhraseQuery, TermQuery, bool_query

    m = AstMonitor([("q-a", TermQuery("merge"))])
    texts = pd.Series(["merge join now", "scan only", "join merge"])
    ids = np.arange(3)
    d0, q0 = m.match_batch(ids, texts)
    assert sorted(zip(d0, m.query_ids[q0])) == [(0, "q-a"), (2, "q-a")]
    m.register(("q-b", PhraseQuery(("merge", "join"))),
               ("q-a", bool_query(must=["scan"])))     # replace q-a
    d1, q1 = m.match_batch(ids, texts)
    assert sorted(zip(d1, m.query_ids[q1])) == [(0, "q-b"), (1, "q-a")]
    m.delete_by_id("q-a")
    d2, q2 = m.match_batch(ids, texts)
    assert sorted(zip(d2, m.query_ids[q2])) == [(0, "q-b")]


def test_intervals_and_valuesource_round_trip():
    from lucene_ray.search import intervals as iv
    from lucene_ray.search.serialize import query_from_dict, query_to_dict
    from lucene_ray.search.valuesource import (
        FieldSource,
        FunctionQuery,
        FunctionRangeQuery,
        LinearFloatFunction,
    )

    q1 = iv.IntervalsSourceQuery(
        iv.maxgaps(2, iv.ordered(iv.term("merge"),
                                 iv.or_(iv.term("join"), iv.prefix("sor")))))
    assert query_from_dict(query_to_dict(q1)) == q1
    q2 = FunctionRangeQuery(LinearFloatFunction(FieldSource("turn_idx"),
                                                2.0, 1.0), lo=5, hi=9)
    assert query_from_dict(query_to_dict(q2)) == q2
    q3 = FunctionQuery(FieldSource("ts"), boost=3.0)
    assert query_from_dict(query_to_dict(q3)) == q3
