"""Pluggable similarity models (Classic TF-IDF, Boolean, LM Dirichlet) vs
brute-force oracles, incl. WAND == exhaustive under a non-BM25 scorer."""

import numpy as np
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.search.query import TermQuery, bool_query
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.search.similarity import (
    BooleanSimilarity,
    ClassicSimilarity,
    LMDirichletSimilarity,
)
from lucene_ray.sources.transcripts import synth_transcripts
from lucene_ray.util.smallfloat import LENGTH_TABLE, int_to_byte4


@pytest.fixture(scope="module")
def sim_index(ray_session, tmp_path_factory):
    import ray.data as rd

    import lucene_ray.analysis.standard as std

    t = synth_transcripts(2500, seed=31)
    d = str(tmp_path_factory.mktemp("simidx"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=800, input_desc="sims")
    ts = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    tokens = [std.analyze(x) if x else [] for x in ts.column("text").to_pylist()]
    return d, tokens


def _decoded_dl(tokens, d):
    return float(LENGTH_TABLE[int(int_to_byte4(np.int64(len(tokens[d]))))])


def test_classic_similarity_oracle(sim_index):
    d, tokens = sim_index
    s = IndexSearcher(d, similarity=ClassicSimilarity())
    N = sum(1 for t in tokens if t)
    for term in ("merge", "data", "query"):
        td = s.search(bool_query(should=[term]), k=15, total_hits_threshold=2**31 - 1)
        df = sum(term in set(t) for t in tokens)
        idf = np.float32(np.log((N + 1) / (df + 1.0)) + 1.0)
        for h in td.hits[:8]:
            f = tokens[h.gid].count(term)
            dl = _decoded_dl(tokens, h.gid)
            expect = np.float32(idf * idf) * np.float32(np.sqrt(np.float32(f))) \
                * np.float32(1.0 / np.sqrt(max(dl, 1.0)))
            assert abs(h.score - float(expect)) < 1e-5 * max(1.0, abs(float(expect)))


def test_boolean_similarity_flat_scores(sim_index):
    d, tokens = sim_index
    s = IndexSearcher(d, similarity=BooleanSimilarity())
    td = s.search(bool_query(should=["merge", "join"]), k=20,
                  total_hits_threshold=2**31 - 1)
    for h in td.hits:
        tk = set(tokens[h.gid])
        n = ("merge" in tk) + ("join" in tk)
        assert abs(h.score - float(n)) < 1e-6       # 1.0 per matching clause


def test_lm_dirichlet_oracle(sim_index):
    d, tokens = sim_index
    mu = 2000.0
    s = IndexSearcher(d, similarity=LMDirichletSimilarity(mu))
    sum_ttf = sum(len(t) for t in tokens)
    for term in ("merge", "scan"):
        ttf = sum(t.count(term) for t in tokens)
        p_w = ttf / sum_ttf
        td = s.search(bool_query(should=[term]), k=10, total_hits_threshold=2**31 - 1)
        for h in td.hits[:5]:
            f = tokens[h.gid].count(term)
            dl = _decoded_dl(tokens, h.gid)
            expect = max(0.0, np.log(1 + f / (mu * p_w)) + np.log(mu / (dl + mu)))
            assert abs(h.score - expect) < 1e-4, (term, h.gid)


def test_wand_matches_exhaustive_classic(sim_index):
    """Block-max pruning stays exact under a non-BM25 similarity (skyline
    pair maxes are scored with the active scorer)."""
    d, tokens = sim_index
    s_wand = IndexSearcher(d, similarity=ClassicSimilarity(), use_wand=True)
    s_taat = IndexSearcher(d, similarity=ClassicSimilarity(), use_wand=False)
    for q in [bool_query(should=["merge", "join"]),
              bool_query(should=["scan", "customer", "vector"]),
              bool_query(must=["sort", "data"])]:
        a = s_wand.search(q, k=10)
        b = s_taat.search(q, k=10)
        assert [(h.gid, h.score) for h in a.hits] == [(h.gid, h.score) for h in b.hits]
