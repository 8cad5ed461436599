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


# --- SimilarityBase family (DFR / IB / DFI), round 3 ----------------------

import math

from lucene_ray.search.similarity import (
    DFISimilarity,
    DFRSimilarity,
    IBSimilarity,
)


def _lg2(x):
    return math.log(x) / math.log(2)


def _corpus_stats(tokens, term):
    N = sum(1 for t in tokens if t)
    df = sum(term in set(t) for t in tokens)
    ttf = sum(t.count(term) for t in tokens)
    sum_ttf = sum(len(t) for t in tokens)
    return N, df, ttf, sum_ttf


def _tfn(norm_kind, c, f, dl, avgfl, ttf=0.0, sum_ttf=0.0):
    if norm_kind == "H1":
        return f * c * (avgfl / dl)
    if norm_kind == "H2":
        return f * _lg2(1 + c * avgfl / dl)
    if norm_kind == "H3":
        mu = 800.0
        return (f + mu * ((ttf + 1.0) / (sum_ttf + 1.0))) / (dl + mu) * mu
    if norm_kind == "Z":
        return f * (avgfl / dl) ** 0.30
    return f


@pytest.mark.parametrize("bm,ae,nz", [
    ("I(n)", "L", "H2"), ("I(F)", "B", "H1"),
    ("I(ne)", "B", "H2"), ("G", "L", "H1"),
    ("I(n)", "L", "H3"), ("I(F)", "B", "Z"),
])
def test_dfr_oracle(sim_index, bm, ae, nz):
    d, tokens = sim_index
    s = IndexSearcher(d, similarity=DFRSimilarity(bm, ae, nz, c=1.0))
    for term in ("merge", "data"):
        N, df, ttf, sum_ttf = _corpus_stats(tokens, term)
        avgfl = sum_ttf / N
        aev = 1.0 if ae == "L" else (ttf + 2.0) / (df + 1.0)
        td = s.search(bool_query(should=[term]), k=10,
                      total_hits_threshold=2**31 - 1)
        assert td.hits
        for h in td.hits[:6]:
            f = tokens[h.gid].count(term)
            dl = _decoded_dl(tokens, h.gid)
            t = _tfn(nz, 1.0, f, dl, avgfl, ttf, sum_ttf)
            if bm == "I(n)":
                A = _lg2((N + 1) / (df + 0.5))
                exp = A * aev * (1 - 1 / (1 + t))
            elif bm == "I(F)":
                A = _lg2(1 + (N + 1) / (ttf + 0.5))
                exp = A * aev * (1 - 1 / (1 + t))
            elif bm == "I(ne)":
                ne = N * (1 - ((N - 1) / N) ** ttf)
                A = _lg2((N + 1) / (ne + 0.5))
                exp = A * aev * (1 - 1 / (1 + t))
            else:
                lam = (ttf + 1.0) / (N + ttf + 1.0)
                A = _lg2(lam + 1)
                B = _lg2((1 + lam) / lam)
                exp = (B - (B - A) / (1 + t)) * aev
            assert abs(h.score - exp) < 1e-4 * max(1.0, abs(exp)), (bm, ae, nz, term)


@pytest.mark.parametrize("dist,lam_k,nz", [
    ("LL", "DF", "H1"), ("LL", "TTF", "H2"),
    ("SPL", "DF", "H2"), ("SPL", "TTF", "H1"),
    ("LL", "DF", "H3"), ("SPL", "DF", "Z"),
])
def test_ib_oracle(sim_index, dist, lam_k, nz):
    d, tokens = sim_index
    s = IndexSearcher(d, similarity=IBSimilarity(dist, lam_k, nz, c=1.0))
    for term in ("merge", "query"):
        N, df, ttf, sum_ttf = _corpus_stats(tokens, term)
        avgfl = sum_ttf / N
        occ = df if lam_k == "DF" else ttf
        lam = float(np.float32((occ + 1.0) / (N + 1.0)))
        td = s.search(bool_query(should=[term]), k=10,
                      total_hits_threshold=2**31 - 1)
        assert td.hits
        for h in td.hits[:6]:
            f = tokens[h.gid].count(term)
            dl = _decoded_dl(tokens, h.gid)
            t = _tfn(nz, 1.0, f, dl, avgfl, ttf, sum_ttf)
            if dist == "LL":
                exp = -math.log(lam / (t + lam))
            else:
                q = 1 - 1 / (t + 1)
                exp = -math.log((lam ** q - lam) / (1 - lam))
            assert abs(h.score - exp) < 1e-4 * max(1.0, abs(exp)), (dist, lam_k, nz)


@pytest.mark.parametrize("ind", ["ChiSquared", "Saturated", "Standardized"])
def test_dfi_oracle(sim_index, ind):
    d, tokens = sim_index
    s = IndexSearcher(d, similarity=DFISimilarity(ind))
    for term in ("merge", "data"):
        N, df, ttf, sum_ttf = _corpus_stats(tokens, term)
        td = s.search(bool_query(should=[term]), k=10,
                      total_hits_threshold=2**31 - 1)
        assert td.hits
        for h in td.hits[:6]:
            f = tokens[h.gid].count(term)
            dl = _decoded_dl(tokens, h.gid)
            expected = (ttf + 1) * dl / (sum_ttf + 1)
            if f <= expected:
                exp = 0.0
            else:
                if ind == "ChiSquared":
                    m = (f - expected) ** 2 / expected
                elif ind == "Saturated":
                    m = (f - expected) / expected
                else:
                    m = (f - expected) / math.sqrt(expected)
                exp = _lg2(m + 1)
            assert abs(h.score - exp) < 1e-4 * max(1.0, abs(exp)), (ind, term)


def test_wand_matches_exhaustive_dfr_ib(sim_index):
    d, tokens = sim_index
    for sim in (DFRSimilarity("I(ne)", "B", "H2"),
                IBSimilarity("SPL", "TTF", "H2"),
                DFISimilarity("ChiSquared")):
        s_wand = IndexSearcher(d, similarity=sim, use_wand=True)
        s_taat = IndexSearcher(d, similarity=sim, use_wand=False)
        for q in [bool_query(should=["merge", "join", "scan"]),
                  bool_query(must=["sort", "data"])]:
            a = s_wand.search(q, k=10)
            b = s_taat.search(q, k=10)
            assert [(h.gid, h.score) for h in a.hits] == \
                   [(h.gid, h.score) for h in b.hits], type(sim).__name__


# --- Axiomatic family (F1/F2/F3 x EXP/LOG) --------------------------------

from lucene_ray.search.similarity import AxiomaticSimilarity


@pytest.mark.parametrize("variant", ["F1EXP", "F1LOG", "F2EXP",
                                     "F2LOG", "F3EXP", "F3LOG"])
def test_axiomatic_oracle(sim_index, variant):
    d, tokens = sim_index
    s = IndexSearcher(d, similarity=AxiomaticSimilarity(variant))
    s_pars = dict(s=0.25, ql=1.0, k=0.35)
    for term in ("merge", "data"):
        N, df, ttf, sum_ttf = _corpus_stats(tokens, term)
        avgfl = sum_ttf / N
        idf = ((N + 1.0) / df) ** s_pars["k"] if variant.endswith("EXP") \
            else math.log((N + 1.0) / df)
        td = s.search(bool_query(should=[term]), k=10,
                      total_hits_threshold=2**31 - 1)
        assert td.hits
        for h in td.hits[:6]:
            f = tokens[h.gid].count(term)
            dl = _decoded_dl(tokens, h.gid)
            sp = s_pars["s"]
            if variant.startswith("F1"):
                core = (1 + math.log(1 + math.log(f + 1))) \
                    * ((avgfl + sp) / (avgfl + dl * sp))
                gamma = 0.0
            elif variant.startswith("F2"):
                core = f / (f + sp + sp * dl / avgfl)
                gamma = 0.0
            else:
                core = 1 + math.log(1 + math.log(f + 1))
                gamma = (dl - s_pars["ql"]) * sp * s_pars["ql"] / avgfl
            exp = max(0.0, core * idf - gamma)
            assert abs(h.score - exp) < 1e-4 * max(1.0, abs(exp)), (variant, term)


def test_wand_matches_exhaustive_axiomatic(sim_index):
    d, tokens = sim_index
    for variant in ("F2EXP", "F3LOG"):
        sim = AxiomaticSimilarity(variant)
        s_wand = IndexSearcher(d, similarity=sim, use_wand=True)
        s_taat = IndexSearcher(d, similarity=sim, use_wand=False)
        for q in [bool_query(should=["merge", "join", "scan"]),
                  bool_query(must=["sort", "data"])]:
            a = s_wand.search(q, k=10)
            b = s_taat.search(q, k=10)
            assert [(h.gid, h.score) for h in a.hits] == \
                   [(h.gid, h.score) for h in b.hits], variant


def test_multi_similarity_sum(sim_index):
    from lucene_ray.search.similarity import (
        BM25Similarity,
        MultiSimilarity,
    )

    d, tokens = sim_index
    multi = MultiSimilarity([BM25Similarity(), ClassicSimilarity()])
    s_m = IndexSearcher(d, similarity=multi)
    s_b = IndexSearcher(d, similarity=BM25Similarity())
    s_c = IndexSearcher(d, similarity=ClassicSimilarity())
    for term in ("merge", "data"):
        q = bool_query(should=[term])
        hm = {h.gid: h.score for h in
              s_m.search(q, k=10, total_hits_threshold=2**31 - 1).hits}
        hb = {h.gid: h.score
              for h in s_b.search(q, k=500, total_hits_threshold=2**31 - 1).hits}
        hc = {h.gid: h.score
              for h in s_c.search(q, k=500, total_hits_threshold=2**31 - 1).hits}
        for gid, sc in hm.items():
            want = np.float32(hb[gid]) + np.float32(hc[gid])
            assert abs(sc - float(want)) < 1e-5 * max(1.0, abs(float(want)))
    # WAND == TAAT under the summed model
    s_w = IndexSearcher(d, similarity=multi, use_wand=True)
    s_t = IndexSearcher(d, similarity=multi, use_wand=False)
    q = bool_query(should=["merge", "join", "scan"])
    assert [(h.gid, h.score) for h in s_w.search(q, k=10).hits] == \
           [(h.gid, h.score) for h in s_t.search(q, k=10).hits]


def test_sweetspot_defaults_equal_classic(sim_index):
    """ln_min=ln_max=1, steepness=0.5 collapses the plateau formula to
    1/sqrt(dl); base=0, tf_min=0 collapses baselineTf to sqrt(freq) — the
    default SweetSpotSimilarity must score exactly like Classic
    (SweetSpotSimilarity.java javadoc: defaults 'should produce results
    identical to DefaultSimilarity')."""
    from lucene_ray.search.similarity import SweetSpotSimilarity

    d, tokens = sim_index
    sc = IndexSearcher(d, similarity=ClassicSimilarity())
    ss = IndexSearcher(d, similarity=SweetSpotSimilarity())
    for term in ("merge", "data"):
        a = sc.search(bool_query(should=[term]), k=20,
                      total_hits_threshold=2**31 - 1)
        b = ss.search(bool_query(should=[term]), k=20,
                      total_hits_threshold=2**31 - 1)
        assert [(h.gid, h.score) for h in a.hits] == \
               [(h.gid, h.score) for h in b.hits]


def test_sweetspot_plateau_oracle(sim_index):
    """With a [2, 60] plateau, docs whose decoded length falls inside score
    with lengthNorm exactly 1; outside, the steepness decay applies —
    checked against a direct evaluation of the published formula."""
    from lucene_ray.search.similarity import SweetSpotSimilarity

    d, tokens = sim_index
    lo, hi, steep = 2, 60, 0.5
    s = IndexSearcher(d, similarity=SweetSpotSimilarity(
        ln_min=lo, ln_max=hi, steepness=steep))
    N = sum(1 for t in tokens if t)
    term = "merge"
    df = sum(term in set(t) for t in tokens)
    idf = np.float32(np.log((N + 1) / (df + 1.0)) + 1.0)
    td = s.search(bool_query(should=[term]), k=25,
                  total_hits_threshold=2**31 - 1)
    saw_inside = saw_outside = False
    for h in td.hits:
        f = tokens[h.gid].count(term)
        dl = _decoded_dl(tokens, h.gid)
        norm = 1.0 / np.sqrt(
            steep * (abs(dl - lo) + abs(dl - hi) - (hi - lo)) + 1.0)
        expect = float(np.float32(idf * idf)
                       * np.float32(np.sqrt(np.float32(f)))
                       * np.float32(norm))
        assert abs(h.score - expect) < 1e-5 * max(1.0, abs(expect))
        if lo <= dl <= hi:
            saw_inside = True
            assert norm == pytest.approx(1.0)
        else:
            saw_outside = True
    assert saw_inside      # the plateau actually covered some docs


def test_sweetspot_baseline_tf(sim_index):
    """tf_base/tf_min reshape the tf curve: freq <= tf_min scores base."""
    from lucene_ray.search.similarity import SweetSpotSimilarity

    sim = SweetSpotSimilarity(tf_base=1.5, tf_min=2.0)
    sc = sim.scorer_with_idf(1.0, np.float32(1.0), 100, 1000)
    f = np.array([0, 1, 2, 5], dtype=np.float32)
    norms = np.array([int(int_to_byte4(np.int64(1)))] * 4, dtype=np.uint8)
    got = sc.score(f, norms)
    assert got[0] == pytest.approx(0.0)
    assert got[1] == pytest.approx(1.5)            # freq <= min -> base
    assert got[2] == pytest.approx(1.5)
    assert got[3] == pytest.approx(np.sqrt(5 + 1.5 ** 2 - 2.0), rel=1e-6)


def test_per_field_similarity_wrapper(ray_session, tmp_path_factory):
    """PerFieldSimilarityWrapper (`PerFieldSimilarityWrapper.java`): a
    keyword field scored with BooleanSimilarity while the text field keeps
    BM25 — each clause's score matches the single-similarity searcher's
    score for that clause alone."""
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.index.shard import keyword_term
    from lucene_ray.search.query import BooleanClause, BooleanQuery, TermQuery
    from lucene_ray.search.similarity import (
        BM25Similarity,
        BooleanSimilarity,
        PerFieldSimilarity,
    )
    from lucene_ray.sources.transcripts import synth_transcripts

    t = synth_transcripts(600, seed=3)
    d = str(tmp_path_factory.mktemp("pfs"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=300,
                keyword_cols=("role",), input_desc="pfs600")
    pf = PerFieldSimilarity({"role": BooleanSimilarity()},
                            default=BM25Similarity())
    s = IndexSearcher(d, similarity=pf)
    rk = keyword_term("role", "user")
    q = BooleanQuery((BooleanClause(TermQuery("merge"), "SHOULD"),
                      BooleanClause(TermQuery(rk, boost=2.5), "SHOULD")))
    td = s.search(q, k=400, total_hits_threshold=2**31 - 1)
    # reference scorers: text clause under plain BM25, role clause Boolean
    bm = IndexSearcher(d, similarity=BM25Similarity())
    t_merge = {h.gid: h.score for h in bm.search(
        TermQuery("merge"), k=10**6, total_hits_threshold=2**31 - 1).hits}
    role_docs = {h.gid for h in bm.search(
        BooleanQuery((BooleanClause(TermQuery(rk), "FILTER"),)),
        k=10**6, total_hits_threshold=2**31 - 1).hits}
    import numpy as np
    for h in td.hits[:60]:
        want = np.float32(0.0)
        if h.gid in t_merge:
            want = want + np.float32(t_merge[h.gid])
        if h.gid in role_docs:
            want = want + np.float32(2.5)      # Boolean score = boost
        assert h.score == pytest.approx(float(want), rel=1e-6), h.gid
