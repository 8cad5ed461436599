"""Numeric/date RangeQuery (PointRangeQuery analogue over doc-values with
shard min/max pruning) and sort-by-field top-k (TopFieldCollector analogue):
value-checked against brute-force oracles over the raw corpus."""

import numpy as np
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.search.query import (
    FILTER,
    MUST,
    MUST_NOT,
    BooleanClause,
    BooleanQuery,
    RangeQuery,
    SortField,
    TermQuery,
    bool_query,
)
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.sources.transcripts import synth_transcripts

N_TURNS = 3000


@pytest.fixture(scope="module")
def dv_index(ray_session, tmp_path_factory):
    import ray.data as rd

    t = synth_transcripts(N_TURNS, seed=42)
    index_dir = str(tmp_path_factory.mktemp("dvidx"))
    ds = rd.from_arrow(t)
    build_index(ds, index_dir, target_docs_per_partition=500,
                docvalue_cols=("ts",), input_desc="synth3000dv")
    sorted_t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    ts = sorted_t.column("ts").cast("int64").to_numpy()
    turn = sorted_t.column("turn_idx").to_numpy().astype(np.int64)
    texts = sorted_t.column("text").to_pylist()
    import lucene_ray.analysis.standard as std

    tokens = [set(std.analyze(x)) if x else set() for x in texts]
    return IndexSearcher(index_dir), ts, turn, tokens


def test_range_standalone_count(dv_index):
    s, ts, turn, tokens = dv_index
    lo, hi = int(ts[400]), int(ts[1700])
    n = s.count(RangeQuery("ts", lo, hi))
    assert n == int(((ts >= lo) & (ts <= hi)).sum())


def test_range_standalone_search_const_score(dv_index):
    s, ts, turn, tokens = dv_index
    lo, hi = int(ts[10]), int(ts[40])
    td = s.search(RangeQuery("ts", lo, hi, boost=2.5), k=100)
    expect = set(np.nonzero((ts >= lo) & (ts <= hi))[0].tolist())
    assert {h.gid for h in td.hits} == expect
    assert all(abs(h.score - 2.5) < 1e-6 for h in td.hits)
    assert td.total_hits == len(expect)


def test_range_open_bounds(dv_index):
    s, ts, turn, tokens = dv_index
    hi = int(ts[123])
    assert s.count(RangeQuery("ts", None, hi)) == int((ts <= hi).sum())
    lo = int(ts[2900])
    assert s.count(RangeQuery("ts", lo, None)) == int((ts >= lo).sum())
    assert s.count(RangeQuery("ts", None, None)) == len(ts)


def test_range_filter_in_boolean(dv_index):
    s, ts, turn, tokens = dv_index
    lo, hi = int(ts[200]), int(ts[2500])
    q = BooleanQuery((BooleanClause(TermQuery("merge"), MUST),
                      BooleanClause(RangeQuery("ts", lo, hi), FILTER)))
    n = s.count(q)
    expect = sum(1 for d in range(len(ts))
                 if "merge" in tokens[d] and lo <= ts[d] <= hi)
    assert n == expect
    # FILTER must not change scores: compare against plain MUST over the same docs
    td = s.search(q, k=expect + 5, total_hits_threshold=2**31 - 1)
    td_plain = s.search(bool_query(must=["merge"]), k=N_TURNS, total_hits_threshold=2**31 - 1)
    plain = {h.gid: h.score for h in td_plain.hits}
    for h in td.hits:
        assert lo <= ts[h.gid] <= hi
        assert h.score == plain[h.gid]


def test_range_must_not(dv_index):
    s, ts, turn, tokens = dv_index
    lo, hi = int(ts[100]), int(ts[2000])
    q = BooleanQuery((BooleanClause(TermQuery("merge"), MUST),
                      BooleanClause(RangeQuery("ts", lo, hi), MUST_NOT)))
    n = s.count(q)
    expect = sum(1 for d in range(len(ts))
                 if "merge" in tokens[d] and not (lo <= ts[d] <= hi))
    assert n == expect


def test_range_shard_pruning_bounds(dv_index):
    """A range covering only one shard's ts values returns exactly its docs
    (manifest min/max pruning must not drop boundary docs)."""
    s, ts, turn, tokens = dv_index
    for pid in s._pids[:3]:
        rdr = s.reader(pid)
        mm = rdr.docvalue_range("ts")
        assert mm is not None
        n = s.count(RangeQuery("ts", mm[0], mm[1]))
        assert n == int(((ts >= mm[0]) & (ts <= mm[1])).sum())


def test_sort_by_ts_desc(dv_index):
    s, ts, turn, tokens = dv_index
    k = 25
    td = s.search(bool_query(should=["merge"]), k=k, sort=SortField("ts", reverse=True))
    match = [d for d in range(len(ts)) if "merge" in tokens[d]]
    expect = sorted(match, key=lambda d: (-ts[d], d))[:k]
    assert [h.gid for h in td.hits] == expect
    assert [h.fields[0] for h in td.hits] == [int(ts[d]) for d in expect]
    assert td.total_hits == len(match)


def test_sort_by_turn_idx_ties(dv_index):
    """turn_idx has massive ties -> exercises the global-docID-asc tie-break."""
    s, ts, turn, tokens = dv_index
    k = 40
    td = s.search(bool_query(should=["merge"]), k=k,
                  sort=SortField("turn_idx", reverse=True))
    match = [d for d in range(len(ts)) if "merge" in tokens[d]]
    expect = sorted(match, key=lambda d: (-turn[d], d))[:k]
    assert [h.gid for h in td.hits] == expect


def test_sort_ascending(dv_index):
    s, ts, turn, tokens = dv_index
    td = s.search(bool_query(should=["merge"]), k=10, sort=SortField("ts"))
    match = [d for d in range(len(ts)) if "merge" in tokens[d]]
    expect = sorted(match, key=lambda d: (ts[d], d))[:10]
    assert [h.gid for h in td.hits] == expect


def test_sort_with_range_filter(dv_index):
    s, ts, turn, tokens = dv_index
    lo, hi = int(ts[500]), int(ts[1500])
    q = BooleanQuery((BooleanClause(TermQuery("merge"), MUST),
                      BooleanClause(RangeQuery("ts", lo, hi), FILTER)))
    td = s.search(q, k=10, sort=SortField("ts", reverse=True))
    match = [d for d in range(len(ts))
             if "merge" in tokens[d] and lo <= ts[d] <= hi]
    expect = sorted(match, key=lambda d: (-ts[d], d))[:10]
    assert [h.gid for h in td.hits] == expect


def test_sorted_search_after_pagination(dv_index):
    """FieldDoc-cursor paging through a sorted result: pages concatenate to
    the full ordering, totals stay the full match count."""
    s, ts, turn, tokens = dv_index
    match = [d for d in range(len(ts)) if "merge" in tokens[d]]
    expect = sorted(match, key=lambda d: (-ts[d], d))
    pages, after = [], None
    for _ in range(4):
        td = s.search(bool_query(should=["merge"]), k=7,
                      sort=SortField("ts", reverse=True), after=after)
        assert td.total_hits == len(match)
        if not td.hits:
            break
        pages.extend(h.gid for h in td.hits)
        last = td.hits[-1]
        after = (last.fields[0], last.gid)
    assert pages == expect[:len(pages)]
    assert len(set(pages)) == len(pages)
    # ascending with heavy ties (turn_idx) pages correctly too
    expect2 = sorted(match, key=lambda d: (turn[d], d))
    pages2, after = [], None
    for _ in range(3):
        td = s.search(bool_query(should=["merge"]), k=9,
                      sort=SortField("turn_idx"), after=after)
        pages2.extend(h.gid for h in td.hits)
        last = td.hits[-1]
        after = (last.fields[0], last.gid)
    assert pages2 == expect2[:len(pages2)]


# --- IndexOrDocValuesQuery (round 3) --------------------------------------

from lucene_ray.search.query import IndexOrDocValuesQuery


def test_iodv_standalone_equals_range(dv_index):
    s, ts, turn, tokens = dv_index
    lo, hi = int(ts[300]), int(ts[1500])
    rq = RangeQuery("ts", lo, hi, boost=1.5)
    a = s.search(IndexOrDocValuesQuery(rq, rq), k=50)
    b = s.search(rq, k=50)
    assert [(h.gid, h.score) for h in a.hits] == [(h.gid, h.score) for h in b.hits]
    assert a.total_hits == b.total_hits


def test_iodv_as_filter_dv_verification(dv_index):
    """Term clauses lead -> the range verifies candidates via doc-values; the
    result must equal both the full-mask RangeQuery filter and brute force."""
    s, ts, turn, tokens = dv_index
    lo, hi = int(ts[100]), int(ts[2500])
    rq = RangeQuery("ts", lo, hi)
    for term, occur in (("merge", MUST), ("data", FILTER)):
        q_iodv = BooleanQuery((BooleanClause(TermQuery(term), occur),
                               BooleanClause(IndexOrDocValuesQuery(rq, rq), FILTER)))
        q_rng = BooleanQuery((BooleanClause(TermQuery(term), occur),
                              BooleanClause(rq, FILTER)))
        a = s.search(q_iodv, k=30, total_hits_threshold=2**31 - 1)
        b = s.search(q_rng, k=30, total_hits_threshold=2**31 - 1)
        assert [(h.gid, h.score) for h in a.hits] == \
               [(h.gid, h.score) for h in b.hits]
        assert a.total_hits == b.total_hits
        expect = {i for i in range(len(ts))
                  if term in tokens[i] and lo <= ts[i] <= hi}
        got = {h.gid for h in s.search(q_iodv, k=len(ts),
                                       total_hits_threshold=2**31 - 1).hits}
        assert got == expect


def test_iodv_must_not_range(dv_index):
    s, ts, turn, tokens = dv_index
    lo, hi = int(ts[500]), int(ts[2000])
    rq = RangeQuery("ts", lo, hi)
    q = BooleanQuery((BooleanClause(TermQuery("data"), MUST),
                      BooleanClause(IndexOrDocValuesQuery(rq, rq), MUST_NOT)))
    got = {h.gid for h in s.search(q, k=len(ts),
                                   total_hits_threshold=2**31 - 1).hits}
    expect = {i for i in range(len(ts))
              if "data" in tokens[i] and not (lo <= ts[i] <= hi)}
    assert got == expect


def test_expression_sort_vs_brute(dv_index):
    """ExpressionSort (Expression.getSortField surface): float64 expression
    over doc-values, desc + paging, vs a numpy brute force."""
    from lucene_ray.search.query import ExpressionSort

    s, ts, turn, tokens = dv_index
    expr = "ln(1 + turn_idx) + ts / 100000000000000000"
    vals = np.log(1 + turn.astype(np.float64)) + ts.astype(np.float64) / 1e17
    match = np.array(["merge" in t for t in tokens])
    cand = np.nonzero(match)[0]
    order = cand[np.lexsort((cand, -vals[cand]))]
    td = s.search(bool_query(should=["merge"]), k=12,
                  sort=ExpressionSort(expr, reverse=True))
    assert [h.gid for h in td.hits] == order[:12].tolist()
    assert np.array_equal([h.fields[0] for h in td.hits], vals[order[:12]])
    cur = (td.hits[-1].fields[0], td.hits[-1].gid)
    td2 = s.search(bool_query(should=["merge"]), k=12,
                   sort=ExpressionSort(expr, reverse=True), after=cur)
    assert [h.gid for h in td2.hits] == order[12:24].tolist()
    # ascending too
    td3 = s.search(bool_query(should=["merge"]), k=7, sort=ExpressionSort(expr))
    order_asc = cand[np.lexsort((cand, vals[cand]))][:7]
    assert [h.gid for h in td3.hits] == order_asc.tolist()
    # _score is not available in scoreless sorted collection
    import pytest as _pytest

    with _pytest.raises(ValueError):
        s.search(bool_query(should=["merge"]), k=3,
                 sort=ExpressionSort("_score * 2"))


def test_sorted_early_termination(dv_index):
    """early_terminate: identical ranking, shards whose dv range can't beat
    the k-th value are skipped, total becomes a GTE lower bound
    (TopFieldCollector early-termination semantics under an index sort)."""
    s, ts, turn, tokens = dv_index
    q = bool_query(should=["merge"])
    exact = s.search(q, k=10, sort=SortField("ts", reverse=True))
    fast = s.search(q, k=10, sort=SortField("ts", reverse=True),
                    early_terminate=True)
    assert [(h.gid, h.fields[0]) for h in fast.hits] == \
        [(h.gid, h.fields[0]) for h in exact.hits]
    assert fast.total_hits <= exact.total_hits
    # ts correlates with docID order across shards, so later shards must
    # have been skipped (GTE + a strictly smaller floor)
    assert fast.relation == "GREATER_THAN_OR_EQUAL_TO" or \
        fast.total_hits == exact.total_hits
    # ascending too
    exact_a = s.search(q, k=7, sort=SortField("ts"))
    fast_a = s.search(q, k=7, sort=SortField("ts"), early_terminate=True)
    assert [h.gid for h in fast_a.hits] == [h.gid for h in exact_a.hits]


def test_sorted_dv_fast_path_equals_scan(ray_session, tmp_path):
    """IndexSortSortedNumericDocValuesRangeQuery semantics: when the dv
    column is sorted in docID order (index-sort field), range queries
    binary-search the boundaries; results must equal the full-scan path
    (both paths exercised, deletes honored)."""
    import numpy as np
    import ray

    from lucene_ray.index.build import build_index
    from lucene_ray.index.deletes import delete_by_query
    from lucene_ray.search.query import RangeQuery, TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    rng = np.random.default_rng(7)
    rows = []
    for i in range(400):
        rows.append({"conv_id": f"c{i // 8:04d}", "turn_idx": i % 8,
                     "role": "user", "text": f"turn {i} merge data",
                     "tool": "", "ts": 1700000000000000 + i * 1000})
    idx = str(tmp_path / "sorted_idx")
    build_index(ray.data.from_items(rows), idx, target_docs_per_partition=150,
                docvalue_cols=("ts",))
    s = IndexSearcher(idx)
    # ts ascends with docID in every shard -> fast path active
    assert all(s.reader(p).docvalue_is_sorted("ts") for p in s._pids)
    lo, hi = 1700000000050000, 1700000000260000
    q = RangeQuery("ts", lo, hi)
    got = s.search(q, k=500)
    want_ids = {i for i in range(400)
                if lo <= 1700000000000000 + i * 1000 <= hi}
    assert {h.gid for h in got.hits} == want_ids
    assert got.total_hits == len(want_ids)
    # force the scan path by poisoning the sorted cache: identical results
    for p in s._pids:
        s.reader(p)._dv_sorted_cache = {"ts": False}
    got2 = s.search(q, k=500)
    assert [(h.gid, h.score) for h in got2.hits] == \
        [(h.gid, h.score) for h in got.hits]
    # deletes respected on the fast path
    s2 = IndexSearcher(idx)
    delete_by_query(idx, TermQuery("57"))
    s2.refresh()
    got3 = s2.search(q, k=500)
    assert {h.gid for h in got3.hits} == want_ids - {57}
    # open-ended + after-page parity with the scan path
    q2 = RangeQuery("ts", None, 1700000000100000)
    a = s.search(q2, k=30)
    b = s.search(q2, k=30, after=(a.hits[-1].score, a.hits[-1].gid))
    ids = [h.gid for h in a.hits] + [h.gid for h in b.hits]
    assert ids == sorted(set(ids))[:len(ids)]
