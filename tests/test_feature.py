"""FeatureField scoring (`document/FeatureField.java`): encode/decode
quantization, the four score functions (float32-exact vs scalar oracles),
computed saturation pivot, and boolean composition with BM25 clauses."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.search.feature import (
    FeatureQuery,
    decode_feature_value,
    encode_feature_value,
)
from lucene_ray.search.query import SHOULD, BooleanClause, BooleanQuery, TermQuery
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.sources.transcripts import synth_transcripts


def test_encode_decode_quantization():
    # small ints (<= 9 significant bits) survive exactly
    v = np.arange(1, 512, dtype=np.float32)
    assert np.array_equal(decode_feature_value(encode_feature_value(v)), v)
    # the encoding drops the low 15 bits of the float32 representation:
    # nearby values collapse to the same bucket, decode <= original
    rng = np.random.default_rng(0)
    w = rng.uniform(1e-3, 1e6, 5000).astype(np.float32)
    d = decode_feature_value(encode_feature_value(w))
    assert np.all(d <= w)
    # relative quantization error bounded by 2^-9 of the value
    assert np.all((w - d) / w < 2.0**-8)
    # encoding is monotone
    s = np.sort(w)
    assert np.all(np.diff(encode_feature_value(s)) >= 0)
    with pytest.raises(ValueError):
        encode_feature_value(0.0)          # not a positive normal float
    with pytest.raises(ValueError):
        encode_feature_value(-1.0)


def test_score_functions_scalar_oracle():
    from lucene_ray.search.feature import score_feature

    freqs = encode_feature_value(np.array([1.0, 8.0, 97.0, 400.0], np.float32))
    s = decode_feature_value(freqs).astype(np.float64)
    # linear: w * S (float32)
    got = score_feature(freqs, FeatureQuery("f", "linear", boost=1.5), None)
    assert np.array_equal(got, (np.float32(1.5) * s.astype(np.float32)))
    # log: (float)(w * log(a + S))
    got = score_feature(freqs, FeatureQuery("f", "log", boost=1.5,
                                            scaling_factor=0.5), None)
    want = (1.5 * np.log((np.float32(0.5) + s.astype(np.float32))
                         .astype(np.float64))).astype(np.float32)
    assert np.array_equal(got, want)
    # saturation: w * (1 - k / (S + k)) in float32
    got = score_feature(freqs, FeatureQuery("f", "saturation", boost=2.0,
                                            pivot=8.0), 8.0)
    sf = s.astype(np.float32)
    want = np.float32(2.0) * (np.float32(1.0)
                              - np.float32(8.0) / (sf + np.float32(8.0)))
    assert np.array_equal(got, want)
    # sigmoid: (float)(w * (1 - k^a / (S^a + k^a)))
    got = score_feature(freqs, FeatureQuery("f", "sigmoid", boost=1.0,
                                            pivot=8.0, exponent=2.0), None)
    kpa = 8.0 ** 2.0
    want = (1.0 * (1.0 - kpa / (s ** 2.0 + kpa))).astype(np.float32)
    assert np.array_equal(got, want)


N = 2500


@pytest.fixture(scope="module")
def feat_index(ray_session, tmp_path_factory):
    import ray.data as rd

    t = synth_transcripts(N, seed=21)
    st = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    vals = (np.arange(N) % 53 + 1).astype(np.float32)
    enc = encode_feature_value(vals)
    enc[::11] = 0                       # every 11th doc: feature absent
    st = st.append_column("feat", pa.array(enc, type=pa.int64()))
    d = str(tmp_path_factory.mktemp("featidx"))
    build_index(rd.from_arrow(st), d, target_docs_per_partition=400,
                docvalue_cols=("feat",), input_desc="synthfeat")
    import lucene_ray.analysis.standard as std

    tokens = [set(std.analyze(x)) if x else set()
              for x in st.column("text").to_pylist()]
    return IndexSearcher(d), vals, enc, tokens


def test_feature_topk_and_absent(feat_index):
    s, vals, enc, tokens = feat_index
    td = s.search(FeatureQuery("feat", "log", boost=1.0, scaling_factor=1.0),
                  k=40)
    present = enc > 0
    assert td.total_hits == int(present.sum())
    sc = (1.0 * np.log((np.float32(1.0) + vals).astype(np.float64))) \
        .astype(np.float32)
    sc = np.where(present, sc, -np.inf)
    order = np.lexsort((np.arange(N), -sc))[:40]
    assert [h.gid for h in td.hits] == order.tolist()
    assert np.array_equal(np.array([h.score for h in td.hits], np.float32),
                          sc[order])


def test_feature_saturation_computed_pivot(feat_index):
    s, vals, enc, tokens = feat_index
    td = s.search(FeatureQuery("feat", "saturation", boost=1.0), k=10)
    present = enc > 0
    # pivot = decode(float32(mean encoded freq)) over docs with the feature
    avg = np.float32(np.float64(enc[present].sum()) / present.sum())
    pivot = float(decode_feature_value(np.float64(avg)))
    sf = vals.astype(np.float32)
    sc = np.float32(1.0) * (np.float32(1.0)
                            - np.float32(pivot) / (sf + np.float32(pivot)))
    sc = np.where(present, sc, -np.inf)
    order = np.lexsort((np.arange(N), -sc))[:10]
    assert [h.gid for h in td.hits] == order.tolist()
    assert np.allclose([h.score for h in td.hits], sc[order], rtol=0, atol=0)


def test_feature_in_boolean_with_bm25(feat_index):
    """BM25 SHOULD term + feature SHOULD clause: scores sum in clause order
    (the static-signal ranking idiom FeatureField exists for)."""
    s, vals, enc, tokens = feat_index
    fq = FeatureQuery("feat", "saturation", boost=0.7, pivot=10.0)
    q = BooleanQuery((BooleanClause(TermQuery("merge"), SHOULD),
                      BooleanClause(fq, SHOULD)))
    td = s.search(q, k=15)
    td_term = s.search(TermQuery("merge"), k=N)
    bm25 = np.zeros(N, dtype=np.float32)
    bm25[[h.gid for h in td_term.hits]] = [h.score for h in td_term.hits]
    has_term = np.zeros(N, dtype=bool)
    has_term[[h.gid for h in td_term.hits]] = True
    present = enc > 0
    sf = vals.astype(np.float32)
    feat = np.float32(0.7) * (np.float32(1.0)
                              - np.float32(10.0) / (sf + np.float32(10.0)))
    total = bm25 + np.where(present, feat, np.float32(0.0))
    matched = has_term | present
    sc = np.where(matched, total, -np.inf)
    order = np.lexsort((np.arange(N), -sc))[:15]
    assert [h.gid for h in td.hits] == order.tolist()
    got = np.array([h.score for h in td.hits], np.float32)
    assert np.allclose(got, sc[order], rtol=1e-6)


def test_covering_query(feat_index):
    """CoveringQuery vs brute force: per-doc dv minimum (clamped >= 1),
    constant minimum, and score = float32 sum of matching clause scores."""
    from lucene_ray.search.query import CoveringQuery, PrefixQuery, TermQuery

    s, vals, enc, tokens = feat_index
    n = len(tokens)
    terms = ("merge", "join", "sort")
    member = np.stack([np.array([t in tk for tk in tokens]) for t in terms])
    cnt = member.sum(axis=0)
    subs = tuple(TermQuery(t) for t in terms)
    td = s.search(CoveringQuery(subs, 2), k=n)
    want = set(np.nonzero(cnt >= 2)[0].tolist())
    assert {h.gid for h in td.hits} == want
    assert td.total_hits == len(want)
    # score = sum of the matching terms' BM25 scores
    per_term = {}
    for t in terms:
        tdt = s.search(TermQuery(t), k=n)
        v = np.zeros(n, dtype=np.float32)
        v[[h.gid for h in tdt.hits]] = [h.score for h in tdt.hits]
        per_term[t] = v
    acc = np.zeros(n, dtype=np.float32)
    for t in terms:                      # clause order
        acc += per_term[t]
    got = {h.gid: h.score for h in td.hits}
    for g in list(want)[:50]:
        assert abs(got[g] - float(acc[g])) < 1e-5
    # multi-term sub-queries compose too (dense leaves)
    td2 = s.search(CoveringQuery((TermQuery("merge"), PrefixQuery("jo")), 2),
                   k=n)
    pre = np.array([any(tok.startswith("jo") for tok in tk) for tk in tokens])
    want2 = set(np.nonzero(member[0] & pre)[0].tolist())
    assert {h.gid for h in td2.hits} == want2


def test_covering_query_dv_minimum(ray_session, tmp_path):
    from lucene_ray.search.query import CoveringQuery, TermQuery

    import pyarrow as _pa
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.sources.transcripts import synth_transcripts
    import lucene_ray.analysis.standard as std

    n = 1200
    t = synth_transcripts(n, seed=33)
    st = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    mm = 1 + np.arange(n, dtype=np.int64) % 3
    st = st.append_column("mm", _pa.array(mm, type=_pa.int64()))
    d = str(tmp_path / "cov")
    build_index(rd.from_arrow(st), d, target_docs_per_partition=300,
                docvalue_cols=("mm",), input_desc="covsynth")
    s = IndexSearcher(d)
    tokens = [set(std.analyze(x)) if x else set()
              for x in st.column("text").to_pylist()]
    terms = ("merge", "join", "sort")
    cnt = np.array([sum(t_ in tk for t_ in terms) for tk in tokens])
    got = s.count(CoveringQuery(tuple(TermQuery(t_) for t_ in terms), "mm"))
    assert got == int((cnt >= mm).sum())


def test_dv_numbers_query(ray_session, tmp_path):
    """DocValuesNumbersQuery vs brute force: standalone constant-score
    membership and FILTER-position composition with a scoring term."""
    from lucene_ray.search.query import (
        FILTER,
        MUST,
        BooleanClause,
        BooleanQuery,
        DocValuesNumbersQuery,
    )

    import pyarrow as _pa
    import ray.data as rd

    import lucene_ray.analysis.standard as std
    from lucene_ray.sources.transcripts import synth_transcripts

    n = 1000
    t = synth_transcripts(n, seed=13)
    st = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    vals = (np.arange(n, dtype=np.int64) * 7) % 23
    st = st.append_column("v", _pa.array(vals, type=_pa.int64()))
    d = str(tmp_path / "dvn")
    build_index(rd.from_arrow(st), d, target_docs_per_partition=250,
                docvalue_cols=("v",), input_desc="dvnsynth")
    s = IndexSearcher(d)
    q = DocValuesNumbersQuery("v", (3, 11, 19, 99))
    want = np.isin(vals, [3, 11, 19, 99])
    td = s.search(q, k=n)
    assert {h.gid for h in td.hits} == set(np.nonzero(want)[0].tolist())
    assert td.total_hits == int(want.sum())
    # out-of-range set fully pruned by the manifest bounds
    assert s.count(DocValuesNumbersQuery("v", (500, 600))) == 0
    # FILTER position beside a scoring MUST term (dense path)
    tokens = [set(std.analyze(x)) if x else set()
              for x in st.column("text").to_pylist()]
    bq = BooleanQuery((BooleanClause(TermQuery("merge"), MUST),
                       BooleanClause(q, FILTER)))
    want_n = sum(1 for i in range(n) if "merge" in tokens[i] and want[i])
    assert s.count(bq) == want_n


def test_long_distance_feature_query(feat_index):
    """LongPoint.newDistanceFeatureQuery analogue
    (`document/LongDistanceFeatureQuery.java`): score =
    (float)(w * (pivot / (pivot + (double)|value - origin|))), every doc
    with the dv column matches, score-desc docID-asc order."""
    from lucene_ray.search.feature import (
        LongDistanceFeatureQuery,
        score_long_distance,
    )

    s, vals, enc, tokens = feat_index
    origin, pivot = 500_000, 120_000
    q = LongDistanceFeatureQuery("feat", origin, pivot, boost=1.8)
    td = s.search(q, k=30)
    assert td.total_hits == N
    d = np.abs(enc.astype(np.int64) - origin).astype(np.float64)
    sc = (np.float64(np.float32(1.8)) * (float(pivot) / (pivot + d))) \
        .astype(np.float32)
    order = np.lexsort((np.arange(N), -sc))[:30]
    assert [h.gid for h in td.hits] == order.tolist()
    assert np.array_equal(np.array([h.score for h in td.hits], np.float32),
                          sc[order])
    with pytest.raises(ValueError):
        LongDistanceFeatureQuery("feat", 0, 0)


def test_long_distance_overflow_clamp():
    """|value - origin| that overflows int64 is clamped to Long.MAX_VALUE
    (LongDistanceFeatureQuery.java:112-117)."""
    from lucene_ray.search.feature import (
        LongDistanceFeatureQuery,
        score_long_distance,
    )

    lmax = (1 << 63) - 1
    q = LongDistanceFeatureQuery("f", -lmax, 10, boost=1.0)
    vals = np.array([lmax, lmax - 1, 0, -lmax], dtype=np.int64)
    got = score_long_distance(vals, q)
    # first two distances exceed Long.MAX_VALUE -> clamped (equal scores)
    assert got[0] == got[1]
    want0 = np.float32(np.float64(10) / (10 + np.float64(lmax)))
    assert got[0] == want0
    assert got[3] == np.float32(1.0)   # distance 0 -> full weight


def test_long_distance_feature_in_boolean(feat_index):
    """Recency-boost idiom: term MUST + distance-feature SHOULD; the SHOULD
    clause adds its float32 score without gating matches."""
    from lucene_ray.search.feature import LongDistanceFeatureQuery

    s, vals, enc, tokens = feat_index
    origin = 900_000
    fq = LongDistanceFeatureQuery("feat", origin, 50_000, boost=0.9)
    base = s.search(BooleanQuery((BooleanClause(TermQuery("merge"), SHOULD),)),
                    k=N)
    base_sc = {h.gid: h.score for h in base.hits}
    q = BooleanQuery((BooleanClause(TermQuery("merge"), SHOULD),
                      BooleanClause(fq, SHOULD)))
    td = s.search(q, k=N)
    assert td.total_hits == N          # the feature clause matches every doc
    d = np.abs(enc.astype(np.int64) - origin).astype(np.float64)
    feat = (np.float64(np.float32(0.9)) * (50_000.0 / (50_000.0 + d))) \
        .astype(np.float32)
    for h in td.hits[:200]:
        want = feat[h.gid]
        if h.gid in base_sc:
            want = np.float32(base_sc[h.gid]) + want
        assert np.float32(h.score) == np.float32(want)


def test_feature_sort_field(feat_index):
    """FeatureSortField (`document/FeatureSortField.java`): hits ordered by
    the decoded feature value DESCENDING (the comparator is reverse-only),
    missing feature -> 0.0, docID-asc ties."""
    from lucene_ray.search.feature import decode_feature_value
    from lucene_ray.search.query import FeatureSortField, bool_query

    s, vals, enc, tokens = feat_index
    q = bool_query(should=["merge"])
    td = s.search(q, k=25, sort=FeatureSortField("feat"))
    match = np.array([("merge" in t) for t in tokens])
    dec = np.where(enc > 0,
                   decode_feature_value(enc.astype(np.float64)), 0.0)
    cand = np.nonzero(match)[0]
    order = cand[np.lexsort((cand, -dec[cand]))][:25]
    assert [h.gid for h in td.hits] == order.tolist()
    assert [float(h.fields[0]) for h in td.hits] == dec[order].tolist()
