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


def test_to_child_block_join_brute_force(idx):
    """ToChildBlockJoinQuery vs brute force: every turn of each matching
    conversation appears exactly once, scored with the parent's joined
    score; count() agrees."""
    from collections import Counter

    from lucene_ray.search.query import ToChildBlockJoinQuery, bool_query
    from lucene_ray.search.searcher import IndexSearcher
    from lucene_ray.sources.transcripts import TURNS_PER_CONV

    s = IndexSearcher(idx)
    child_q = bool_query(must=["merge", "join"])
    td_child = s.search(child_q, k=10 ** 6, total_hits_threshold=2 ** 31 - 1)
    parent_score = {}
    for h in td_child.hits:
        parent_score[h.conv_id] = max(parent_score.get(h.conv_id, -1e30),
                                      np.float32(h.score))
    assert parent_score
    n_docs = int(s.commit["doc_count"])
    turns_of = Counter()
    for cid in parent_score:
        first = int(cid[5:]) * TURNS_PER_CONV
        turns_of[cid] = min(TURNS_PER_CONV, n_docs - first)
    want_total = sum(turns_of.values())

    td = s.search(ToChildBlockJoinQuery(child_q, score_mode="max"), k=10 ** 6)
    assert td.total_hits == want_total
    got = Counter()
    for h in td.hits:
        got[h.conv_id] += 1
        assert np.float32(h.score) == parent_score[h.conv_id], h.conv_id
    assert got == turns_of
    assert s.count(ToChildBlockJoinQuery(child_q)) == want_total
