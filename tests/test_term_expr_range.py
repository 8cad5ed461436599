"""TermRangeQuery (`search/TermRangeQuery.java`) and ExpressionRangeQuery
(`queries/function/FunctionRangeQuery.java`) vs brute force."""

import numpy as np
import pytest

from lucene_ray.analysis.standard import analyze
from lucene_ray.index.build import build_index
from lucene_ray.search.query import (
    FILTER,
    BooleanClause,
    BooleanQuery,
    ExpressionRangeQuery,
    TermQuery,
    TermRangeQuery,
)
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.sources.transcripts import synth_transcripts


@pytest.fixture(scope="module")
def setup(ray_session, tmp_path_factory):
    import ray.data as rd

    t = synth_transcripts(1500, seed=31)
    d = str(tmp_path_factory.mktemp("trangeidx"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=400,
                keyword_cols=("role",), docvalue_cols=("ts",),
                input_desc="trange")
    toks = [set(analyze(x or "")) for x in t.column("text").to_pylist()]
    ts = t.column("ts").cast("int64").to_pylist()
    return IndexSearcher(d), toks, ts


@pytest.mark.parametrize("lo,hi,il,iu", [
    ("m", "merge", True, True),
    ("merge", "sort", True, False),
    ("scan", "sort", False, True),
    (None, "b", True, True),
    ("w", None, False, True),
])
def test_term_range_counts(setup, lo, hi, il, iu):
    s, toks, _ = setup
    got = s.count(TermRangeQuery(lo, hi, include_lower=il, include_upper=iu))
    def inside(t):
        if lo is not None and (t < lo or (t == lo and not il)):
            return False
        if hi is not None and (t > hi or (t == hi and not iu)):
            return False
        return True
    want = sum(1 for ts_ in toks if any(inside(t) for t in ts_))
    assert got == want and want > 0


def test_term_range_excludes_keyword_namespace(setup):
    s, toks, _ = setup
    # an unbounded range must not leak role\x1f... keyword postings
    got = s.count(TermRangeQuery(None, None))
    want = sum(1 for ts_ in toks if ts_)
    assert got == want


def test_term_range_in_boolean_filter(setup):
    s, toks, _ = setup
    q = BooleanQuery((
        BooleanClause(TermQuery("merge"), FILTER),
        BooleanClause(TermRangeQuery("sc", "so", True, False), FILTER)))
    want = sum(1 for ts_ in toks
               if "merge" in ts_ and any("sc" <= t < "so" for t in ts_))
    assert s.count(q) == want and want > 0


def test_expression_range(setup):
    s, toks, ts = setup
    expr = "ts / 100000000000000000"
    lo_v = float(np.sort(np.asarray(ts, dtype=np.int64))[300]) / 1e17
    got = s.count(ExpressionRangeQuery(expr, lo_v, None,
                                       include_lower=True))
    vals = np.asarray([int(x) for x in ts], dtype=np.float64) / 1e17
    want = int((vals >= lo_v).sum())
    assert got == want and 0 < want < len(toks)
    # exclusive bound drops the boundary docs
    got_ex = s.count(ExpressionRangeQuery(expr, lo_v, None,
                                          include_lower=False))
    assert got_ex == int((vals > lo_v).sum()) < got


def test_expression_range_rejects_score(setup):
    s, _, _ = setup
    with pytest.raises(ValueError):
        s.compile(ExpressionRangeQuery("_score * 2", 0.0, 1.0))


def test_dv_stats_matches_numpy(setup):
    from lucene_ray.search.searcher import dv_stats

    s, toks, ts = setup
    st = dv_stats(s, TermQuery("merge"), "ts")
    vals = np.asarray([t for t, tk in zip(ts, toks) if "merge" in tk],
                      dtype=np.float64)
    assert st["count"] == len(vals) > 0
    assert st["min"] == vals.min() and st["max"] == vals.max()
    assert st["sum"] == pytest.approx(vals.sum(), rel=1e-12)
    assert st["mean"] == pytest.approx(vals.mean(), rel=1e-12)
    assert st["variance"] == pytest.approx(vals.var(), rel=1e-9)
    assert st["stdev"] == pytest.approx(vals.std(), rel=1e-9)
    empty = dv_stats(s, TermQuery("zzznothere"), "ts")
    assert empty["count"] == 0 and empty["min"] is None


def test_term_stat_value_sources(setup, ray_session, tmp_path_factory):
    """Term-statistic value sources in scoring expressions
    (TermFreqValueSource / DocFreqValueSource / TotalTermFreqValueSource /
    IDFValueSource / NormValueSource / MaxDocValueSource /
    NumDocsValueSource) vs brute force over the analyzed corpus."""
    import ray.data as rd

    from lucene_ray.search.query import FunctionScoreQuery
    from lucene_ray.sources.transcripts import synth_transcripts
    from lucene_ray.util.smallfloat import byte4_to_int, int_to_byte4

    t = synth_transcripts(1200, seed=32)
    st = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    d = str(tmp_path_factory.mktemp("tstats"))
    build_index(rd.from_arrow(st), d, target_docs_per_partition=400,
                input_desc="tstats")
    s = IndexSearcher(d)
    toks_all = [analyze(x or "") for x in st.column("text").to_pylist()]

    maxdoc = len(toks_all)
    df_join = sum("join" in set(tk) for tk in toks_all)
    ttf_join = sum(tk.count("join") for tk in toks_all)
    idf_m = np.float32(np.log((maxdoc + 1) /
                              (sum("merge" in set(tk) for tk in toks_all)
                               + 1.0)) + 1.0)

    q = FunctionScoreQuery(
        TermQuery("merge"),
        "tf('join') * 1000 + df('join') + ttf('join') / 1000"
        " + idf('merge') + maxdoc() / 10**9 + numdocs() / 10**12"
        " + tf('zzzznotaterm')")
    td = s.search(q, k=40, total_hits_threshold=2**31 - 1)
    assert td.total_hits == sum("merge" in set(tk) for tk in toks_all)
    for h in td.hits:
        tk = toks_all[h.gid]
        want = (tk.count("join") * 1000 + df_join + ttf_join / 1000
                + float(idf_m) + maxdoc / 10**9 + maxdoc / 10**12)
        assert abs(h.score - want) < 1e-9, (h.gid, h.score, want)

    # norm() = 1/sqrt(quantized length), 0 for empty (TFIDFSimilarity
    # decodeNormValue over the SmallFloat-encoded norm byte)
    tdn = s.search(FunctionScoreQuery(TermQuery("merge"), "norm()"), k=20)
    for h in tdn.hits:
        dl = int(byte4_to_int(np.array([int_to_byte4(
            np.array([len(toks_all[h.gid])]))[0]]))[0])
        want = 0.0 if dl == 0 else 1.0 / np.sqrt(float(dl))
        assert abs(h.score - want) < 1e-12

    # string-literal argument contract
    with pytest.raises(ValueError):
        from lucene_ray.search.expressions import compile_expression
        compile_expression("tf(ts)")
