"""Indri similarity family (`search/similarities/IndriDirichletSimilarity
.java`, `search/IndriAndQuery.java` + `IndriAndScorer.java`): formula
parity against a brute-force oracle, smoothing for absent clauses, boost
weighting, WAND gating."""

import collections
import math

import numpy as np
import pytest
import ray

from lucene_ray.index.build import build_index
from lucene_ray.search.query import IndriAndQuery, TermQuery
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.search.similarity import IndriDirichletSimilarity

TEXTS = ["merge the tables now", "merge join", "sort the data",
         "join tables", "merge merge merge", "nothing here at all"] * 3


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    rows = [{"conv_id": f"c{i // 4}", "turn_idx": i % 4, "role": "u",
             "text": t, "tool": "", "ts": 1700000000000000 + i}
            for i, t in enumerate(TEXTS)]
    d = str(tmp_path_factory.mktemp("indri") / "idx")
    build_index(ray.data.from_items(rows), d, target_docs_per_partition=7)
    return d


def _brute(searcher, clauses, mu=2000.0):
    sum_ttf = searcher.sum_ttf

    def pw(t):
        return max(searcher.ttf(t), 1) / max(sum_ttf, 1)

    want = {}
    for gid, t in enumerate(TEXTS):
        toks = t.split()
        cnt = collections.Counter(toks)
        if not any(cnt[term] for term, _ in clauses):
            continue
        sc = sum(b * math.log((cnt[term] + mu * pw(term))
                              / (len(toks) + mu)) for term, b in clauses)
        want[gid] = np.float32(sc / sum(b for _, b in clauses))
    return want


def test_indri_and_brute_force_parity(idx):
    s = IndexSearcher(idx)
    clauses = [("merge", 1.0), ("join", 2.0)]
    q = IndriAndQuery(tuple(TermQuery(t, boost=b) for t, b in clauses))
    td = s.search(q, k=50, total_hits_threshold=2**31 - 1)
    want = _brute(s, clauses)
    got = {h.gid: h.score for h in td.hits}
    assert set(got) == set(want)          # union-of-clauses match set
    for g, w in want.items():
        assert abs(got[g] - w) < 2e-6
    # scores are negative log-probs; docs with both terms rank highest
    assert all(v < 0 for v in got.values())
    top = max(want, key=want.get)
    assert td.hits[0].gid % 6 == top % 6


def test_indri_smoothing_rewards_presence(idx):
    s = IndexSearcher(idx)
    q = IndriAndQuery((TermQuery("merge"), TermQuery("join")))
    td = s.search(q, k=50, total_hits_threshold=2**31 - 1)
    by = {h.gid: h.score for h in td.hits}
    # "merge join" (both) beats "merge the tables now" (one + smoothing)
    assert by[1] > by[0]
    # docs with NO clause never match (union approximation)
    assert 5 not in by and len(by) == 12


def test_indri_standalone_similarity(idx):
    """IndriDirichletSimilarity as the searcher similarity: single-term
    scores match the formula (WAND auto-disabled for the negative-score
    model)."""
    s = IndexSearcher(idx, similarity=IndriDirichletSimilarity())
    td = s.search(TermQuery("merge"), k=50, total_hits_threshold=2**31 - 1)
    mu = 2000.0
    pw = max(s.ttf("merge"), 1) / max(s.sum_ttf, 1)
    for h in td.hits:
        toks = TEXTS[h.gid].split()
        f = toks.count("merge")
        want = np.float32(math.log((f + mu * pw) / (len(toks) + mu)))
        assert abs(h.score - want) < 2e-6
    # two-term disjunction under Indri must not be WAND-pruned into a
    # wrong top-k: compare against use_wand=False
    q2 = IndriAndQuery((TermQuery("merge"), TermQuery("sort")))
    a = s.search(q2, k=5)
    b = IndexSearcher(idx, similarity=IndriDirichletSimilarity(),
                      use_wand=False).search(q2, k=5)
    assert [(h.gid, h.score) for h in a.hits] == \
        [(h.gid, h.score) for h in b.hits]
