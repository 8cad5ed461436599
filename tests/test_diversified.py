"""DiversifiedTopDocsCollector semantics: per-key cap, global order kept,
equivalence to per-key-top-m-then-global-top-k."""

from collections import Counter

import pytest

from lucene_ray.pipelines.flagship import build_transcript_index
from lucene_ray.search.query import bool_query
from lucene_ray.search.searcher import IndexSearcher, diversified_search

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def searcher(ray_session):
    return IndexSearcher(build_transcript_index(SF))


def test_cap_one_unique_keys_and_order(searcher):
    q = bool_query(should=["merge", "join"])
    td = diversified_search(searcher, q, k=10, max_per_key=1)
    keys = [h.conv_id for h in td.hits]
    assert len(keys) == len(set(keys)) == 10
    scores = [h.score for h in td.hits]
    assert scores == sorted(scores, reverse=True)
    # equals: per-conv best hit, then global top-10
    full = searcher.search(q, k=searcher.doc_count,
                           total_hits_threshold=2**31 - 1)
    best = {}
    for h in full.hits:                       # already score desc, gid asc
        best.setdefault(h.conv_id, h)
    want = sorted(best.values(), key=lambda h: (-h.score, h.gid))[:10]
    assert [(h.gid, h.score) for h in td.hits] == \
           [(h.gid, h.score) for h in want]


def test_cap_two_matches_manual_greedy(searcher):
    q = bool_query(should=["merge", "join"])
    k = 40
    td2 = diversified_search(searcher, q, k=k, max_per_key=2)
    c = Counter(h.conv_id for h in td2.hits)
    assert max(c.values()) <= 2 and any(v == 2 for v in c.values())
    # exact greedy equivalence over the full ordered stream
    full = searcher.search(q, k=searcher.doc_count,
                           total_hits_threshold=2**31 - 1)
    taken: Counter = Counter()
    want = []
    for h in full.hits:
        if taken[h.conv_id] < 2:
            taken[h.conv_id] += 1
            want.append(h)
            if len(want) == k:
                break
    assert [(h.gid, h.score) for h in td2.hits] == \
           [(h.gid, h.score) for h in want]
    # relaxing the cap can only raise (or keep) every rank's score
    td1 = diversified_search(searcher, q, k=k, max_per_key=1)
    for a, b in zip(td2.hits, td1.hits):
        assert a.score >= b.score


def test_grouped_search_two_pass_semantics(searcher):
    """GroupingSearch parity: groups ranked by best doc, docs capped and
    ordered inside groups, group membership consistent with the keyword
    postings."""
    from lucene_ray.pipelines.classify import _classes_of_hits, _keyword_classes
    from lucene_ray.search.searcher import grouped_search
    import numpy as np

    q = bool_query(should=["merge", "join"])
    groups = grouped_search(searcher, q, "role", n_groups=4, docs_per_group=3)
    assert 1 <= len(groups) <= 4
    bests = [best for _, best, _ in groups]
    assert bests == sorted(bests, reverse=True)
    classes = _keyword_classes(searcher, "role")
    for role, best, hits in groups:
        assert role in classes
        assert 1 <= len(hits) <= 3
        scores = [h.score for h in hits]
        assert scores == sorted(scores, reverse=True)
        assert best == hits[0].score
        got = _classes_of_hits(searcher,
                               np.array([h.gid for h in hits], dtype=np.int64),
                               "role", classes)
        assert all(c == role for c in got)


def test_all_groups_and_heads(searcher):
    from lucene_ray.pipelines.classify import _classes_of_hits, _keyword_classes
    from lucene_ray.search.searcher import all_group_heads, all_groups

    q = bool_query(should=["merge", "join"])
    full = searcher.search(q, k=searcher.doc_count,
                           total_hits_threshold=2**31 - 1)
    import numpy as np

    classes = _keyword_classes(searcher, "role")
    gids = np.array([h.gid for h in full.hits], dtype=np.int64)
    vals = _classes_of_hits(searcher, gids, "role", classes)
    # AllGroups: distinct group values over every hit
    assert all_groups(searcher, q, "role") == \
        sorted({v for v in vals if v is not None})
    # AllGroupHeads: first hit per group under (score desc, gid asc)
    want = {}
    for h, v in zip(full.hits, vals):
        if v is not None and v not in want:
            want[v] = (h.gid, h.score)
    got = {v: (h.gid, h.score)
           for v, h in all_group_heads(searcher, q, "role").items()}
    assert got == want and len(got) >= 2
