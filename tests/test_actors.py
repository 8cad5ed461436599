"""Query actor pool returns identical results to the single-process searcher."""

import pytest

from lucene_ray.index.build import build_index
from lucene_ray.search.query import TermQuery, bool_query
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.sources.transcripts import synth_transcripts


@pytest.fixture(scope="module")
def index(ray_session, tmp_path_factory):
    import ray.data as rd

    d = str(tmp_path_factory.mktemp("actidx"))
    build_index(rd.from_arrow(synth_transcripts(2500, seed=5)), d,
                target_docs_per_partition=400, input_desc="actors")
    return d


def test_actor_pool_matches_local(index):
    from lucene_ray.search.actors import QueryService

    svc = QueryService(index, num_actors=3)
    local = IndexSearcher(index)
    queries = [
        TermQuery("query"),
        bool_query(should=["data", "merge", "join"]),
        bool_query(must=["sort", "scan"]),
        bool_query(should=["data"], must_not=["the"]),
    ]
    for q in queries:
        a = svc.search(q, k=15)
        b = local.search(q, k=15)
        assert [(h.gid, h.score) for h in a.hits] == [(h.gid, h.score) for h in b.hits]
        assert [(h.conv_id, h.turn_idx) for h in a.hits] == \
               [(h.conv_id, h.turn_idx) for h in b.hits]
    many = svc.search_many(queries, k=10)
    for td, q in zip(many, queries):
        b = local.search(q, k=10)
        assert [h.gid for h in td.hits] == [h.gid for h in b.hits]
    svc.shutdown()
