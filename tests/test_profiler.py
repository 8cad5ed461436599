"""QueryProfiler surface (search/profiler.py): result identity with the
unprofiled search, tree structure, breakdown invariants."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def searcher(ray_session):
    from lucene_ray.pipelines.flagship import build_transcript_index
    from lucene_ray.search.searcher import IndexSearcher

    return IndexSearcher(build_transcript_index(SF))


def test_profile_result_identity(searcher):
    from lucene_ray.search.profiler import profile_search
    from lucene_ray.search.query import bool_query

    q = bool_query(should=["merge", "join"], must_not=["window"])
    plain = searcher.search(q, k=10)
    td, prof = profile_search(searcher, q, k=10)
    assert [(h.gid, np.float32(h.score)) for h in td.hits] == \
        [(h.gid, np.float32(h.score)) for h in plain.hits]
    assert td.total_hits == plain.total_hits


def test_profile_tree_and_breakdown(searcher):
    from lucene_ray.search.profiler import profile_search
    from lucene_ray.search.query import BooleanQuery, TermQuery, bool_query

    q = bool_query(should=["merge", "join", "vector"])
    _td, prof = profile_search(searcher, q, k=5)
    assert prof.type == "BooleanQuery"
    assert len(prof.children) == 3
    assert all(c.type == "TermQuery" for c in prof.children)
    for node in [prof] + prof.children:
        bd = node.breakdown
        assert set(bd) == {"rewrite", "create_weight", "search", "merge"}
        assert all(v >= 0 for v in bd.values())
        assert node.total_ns >= sum(bd.values()) - 1000  # same clock span
    # per-shard rows cover every shard
    assert {r["shard"] for r in prof.shards} == set(searcher._pids)
    assert sum(r["hits"] for r in prof.shards) >= prof.shards[0]["hits"]
    d = prof.to_dict()
    assert d["children"][0]["type"] == "TermQuery"


def test_profile_depth_limit(searcher):
    from lucene_ray.search.profiler import profile_search
    from lucene_ray.search.query import bool_query

    q = bool_query(should=["merge", "join"])
    _td, prof = profile_search(searcher, q, k=5, max_depth=0)
    assert prof.children == []
