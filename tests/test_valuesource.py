"""ValueSource / FunctionQuery family (`queries/function/`): field and
statistic sources vs independent numpy recomputation; FunctionQuery /
FunctionRangeQuery / FunctionMatchQuery execution semantics."""

import math

import numpy as np
import pytest
import ray.data as rd

from lucene_ray.index.build import build_index
from lucene_ray.search.query import TermQuery
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.search.valuesource import (
    ComparisonBoolFunction,
    ConstValueSource,
    DivFloatFunction,
    DocFreqValueSource,
    FieldSource,
    FunctionMatchQuery,
    FunctionQuery,
    FunctionRangeQuery,
    IDFValueSource,
    IfFunction,
    LinearFloatFunction,
    MaxDocValueSource,
    MaxFloatFunction,
    NormValueSource,
    NumDocsValueSource,
    ProductFloatFunction,
    QueryValueSource,
    RangeMapFloatFunction,
    ReciprocalFloatFunction,
    ScaleFloatFunction,
    SumFloatFunction,
    SumTotalTermFreqValueSource,
    TermFreqValueSource,
    TFValueSource,
    TotalTermFreqValueSource,
)
from lucene_ray.sources.transcripts import synth_transcripts
from lucene_ray.util.smallfloat import LENGTH_TABLE


@pytest.fixture(scope="module")
def vs_index(ray_session, tmp_path_factory):
    t = synth_transcripts(1200, seed=7)
    d = str(tmp_path_factory.mktemp("vsrc"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=400,
                keyword_cols=("role",), docvalue_cols=("ts", "turn_idx"),
                input_desc="vsrc1200")
    return IndexSearcher(d)


def _all_vals(searcher, src):
    parts = []
    for pid in searcher._pids:
        parts.append(src.vals(searcher, searcher.reader(pid)))
    return np.concatenate(parts)


def test_field_and_composition_sources(vs_index):
    s = vs_index
    ti = _all_vals(s, FieldSource("turn_idx"))
    maxdoc = sum(s.reader(p).doc_count for p in s._pids)
    assert ti.dtype == np.float64 and len(ti) == maxdoc
    lin = _all_vals(s, LinearFloatFunction(FieldSource("turn_idx"), 2.0, 1.0))
    assert np.array_equal(lin, ti * 2.0 + 1.0)
    tot = _all_vals(s, SumFloatFunction((FieldSource("turn_idx"),
                                         ConstValueSource(5.0))))
    assert np.array_equal(tot, ti + 5.0)
    prod = _all_vals(s, ProductFloatFunction((FieldSource("turn_idx"),
                                              ConstValueSource(3.0))))
    assert np.array_equal(prod, ti * 3.0)
    mx = _all_vals(s, MaxFloatFunction((FieldSource("turn_idx"),
                                        ConstValueSource(10.0))))
    assert np.array_equal(mx, np.maximum(ti, 10.0))
    div = _all_vals(s, DivFloatFunction(FieldSource("turn_idx"),
                                        ConstValueSource(4.0)))
    assert np.allclose(div, ti / 4.0)
    rec = _all_vals(s, ReciprocalFloatFunction(FieldSource("turn_idx"),
                                               1.0, 2.0, 3.0))
    assert np.allclose(rec, 2.0 / (ti + 3.0))
    rm = _all_vals(s, RangeMapFloatFunction(FieldSource("turn_idx"),
                                            0, 5, 99.0, default=-1.0))
    want = np.where((ti >= 0) & (ti <= 5), 99.0, -1.0)
    assert np.array_equal(rm, want)
    iff = _all_vals(s, IfFunction(
        ComparisonBoolFunction(FieldSource("turn_idx"),
                               ConstValueSource(3.0), "gt"),
        ConstValueSource(1.0), ConstValueSource(0.0)))
    assert np.array_equal(iff, (ti > 3.0).astype(np.float64))


def test_scale_function_global_bounds(vs_index):
    s = vs_index
    ti = _all_vals(s, FieldSource("turn_idx"))
    sc = _all_vals(s, ScaleFloatFunction(FieldSource("turn_idx"), 0.0, 1.0))
    lo, hi = ti.min(), ti.max()
    assert np.allclose(sc, (ti - lo) / (hi - lo))
    assert sc.min() == 0.0 and sc.max() == 1.0    # global, not per-shard


def test_statistic_sources(vs_index):
    s = vs_index
    df = s.df(s._ft("merge"))
    assert df > 0
    v = _all_vals(s, DocFreqValueSource("text", "merge"))
    assert (v == df).all()
    maxdoc = sum(s.reader(p).doc_count for p in s._pids)
    v = _all_vals(s, IDFValueSource("text", "merge"))
    assert v[0] == pytest.approx(math.log((maxdoc + 1) / (df + 1)) + 1)
    ttf = s.ttf(s._ft("merge"))
    v = _all_vals(s, TotalTermFreqValueSource("text", "merge"))
    assert (v == ttf).all()
    v = _all_vals(s, SumTotalTermFreqValueSource())
    assert (v == float(s.sum_ttf)).all()
    v = _all_vals(s, MaxDocValueSource())
    assert (v == maxdoc).all()
    v = _all_vals(s, NumDocsValueSource())
    assert (v == maxdoc).all()           # no deletes in this index
    # term frequency scatter vs postings decode
    tf = _all_vals(s, TermFreqValueSource("text", "merge"))
    assert tf.sum() == ttf and (tf >= 0).all()
    assert np.count_nonzero(tf) == df
    assert np.array_equal(_all_vals(s, TFValueSource("text", "merge")),
                          np.sqrt(tf))
    # norm source decodes the stored byte to 1/sqrt(length)
    nv = _all_vals(s, NormValueSource())
    rdr = s.reader(s._pids[0])
    lengths = LENGTH_TABLE[np.asarray(rdr.norms)].astype(np.float64)
    n0 = rdr.doc_count
    assert np.allclose(nv[:n0][lengths > 0], 1.0 / np.sqrt(lengths[lengths > 0]))


def test_function_query_topk(vs_index):
    s = vs_index
    q = FunctionQuery(LinearFloatFunction(FieldSource("turn_idx"), 1.0, 0.0),
                      boost=2.0)
    td = s.search(q, k=5)
    ti = _all_vals(s, FieldSource("turn_idx"))
    want = np.sort(ti * 2.0)[::-1][:5]
    assert [h.score for h in td.hits] == pytest.approx(want.tolist())
    assert td.total_hits == sum(s.reader(p).doc_count for p in s._pids)


def test_function_range_query(vs_index):
    s = vs_index
    q = FunctionRangeQuery(FieldSource("turn_idx"), lo=3, hi=7,
                           include_lower=True, include_upper=False)
    td = s.search(q, k=10_000, total_hits_threshold=2**31 - 1)
    ti = _all_vals(s, FieldSource("turn_idx"))
    want_n = int(((ti >= 3) & (ti < 7)).sum())
    assert td.total_hits == want_n
    # ValueSourceScorer: score IS the value
    assert all(3 <= h.score < 7 for h in td.hits)


def test_function_match_query(vs_index):
    s = vs_index
    q = FunctionMatchQuery(FieldSource("turn_idx"),
                           lambda v: v % 2 == 0, boost=1.5)
    td = s.search(q, k=10_000, total_hits_threshold=2**31 - 1)
    ti = _all_vals(s, FieldSource("turn_idx"))
    assert td.total_hits == int((ti % 2 == 0).sum())
    assert all(h.score == pytest.approx(1.5) for h in td.hits)


def test_query_value_source(vs_index):
    s = vs_index
    src = QueryValueSource(TermQuery("merge"), default_value=-1.0)
    v = _all_vals(s, src)
    td = s.search(TermQuery("merge"), k=s.doc_count,
                  total_hits_threshold=2**31 - 1)
    assert int((v != -1.0).sum()) == td.total_hits
    by_gid = {h.gid: h.score for h in td.hits}
    for gid, score in list(by_gid.items())[:20]:
        assert v[gid] == pytest.approx(score, rel=1e-6)


def test_function_queries_actor_parity(vs_index):
    """FunctionQuery / FunctionRangeQuery through the actor pool return the
    local searcher's exact results (compiled dict ships the dataclass)."""
    from lucene_ray.search.actors import QueryService

    s = vs_index
    svc = QueryService(s.index_dir, num_actors=2)
    try:
        for q in (FunctionQuery(LinearFloatFunction(FieldSource("turn_idx"),
                                                    1.0, 0.0), boost=2.0),
                  FunctionRangeQuery(FieldSource("turn_idx"), lo=3, hi=7,
                                     include_upper=False)):
            a = s.search(q, k=12)
            b = svc.search(q, k=12)
            assert [(h.gid, h.score) for h in a.hits] == \
                [(h.gid, h.score) for h in b.hits]
            assert a.total_hits == b.total_hits
    finally:
        svc.shutdown()
