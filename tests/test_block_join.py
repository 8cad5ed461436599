"""ToParentBlockJoinQuery: per-shard segmented child→parent join vs a
brute-force python oracle, all score modes, actor-pool parity."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def idx(ray_session):
    from lucene_ray.pipelines.flagship import build_transcript_index

    return build_transcript_index(SF)


def _brute_parents(searcher, child_q, mode):
    td = searcher.search(child_q, k=10 ** 6, total_hits_threshold=2 ** 31 - 1)
    by_conv = {}
    for h in td.hits:
        by_conv.setdefault(h.conv_id, []).append((h.gid, h.score))
    out = []
    for cid, hits in by_conv.items():
        scores = [np.float32(s) for _, s in hits]
        if mode == "max":
            sc = max(scores)
        elif mode == "total":
            sc = float(np.sum(np.asarray(scores, dtype=np.float64)))
        else:
            sc = float(np.sum(np.asarray(scores, dtype=np.float64))) / len(hits)
        out.append((cid, np.float32(sc), min(g for g, _ in hits)))
    out.sort(key=lambda x: (-x[1], x[2]))
    return out


@pytest.mark.parametrize("mode", ["max", "total", "avg"])
def test_block_join_matches_bruteforce(idx, mode):
    from lucene_ray.search.query import ToParentBlockJoinQuery, bool_query
    from lucene_ray.search.searcher import IndexSearcher

    s = IndexSearcher(idx)
    child = bool_query(should=["merge", "join"])
    td = s.search(ToParentBlockJoinQuery(child, score_mode=mode), k=10)
    expect = _brute_parents(s, child, mode)[:10]
    assert [(h.conv_id, np.float32(h.score)) for h in td.hits] == \
        [(c, sc) for c, sc, _ in expect]
    # total parents reported
    assert td.total_hits == len(_brute_parents(s, child, mode))


def test_block_join_through_actor_pool(idx):
    from lucene_ray.search.actors import QueryService
    from lucene_ray.search.query import ToParentBlockJoinQuery, bool_query
    from lucene_ray.search.searcher import IndexSearcher

    q = ToParentBlockJoinQuery(bool_query(should=["merge", "join"]),
                               score_mode="total")
    local = IndexSearcher(idx).search(q, k=8)
    svc = QueryService(idx, num_actors=2)
    pooled = svc.search(q, k=8)
    svc.shutdown()
    assert [(h.conv_id, round(h.score, 6)) for h in pooled.hits] == \
        [(h.conv_id, round(h.score, 6)) for h in local.hits]
