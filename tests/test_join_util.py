"""JoinUtil.createJoinQuery analogue (search/join.py): conv_id→conv_id
query-time join vs a brute-force oracle, all five score modes, deletes."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def idx(ray_session):
    from lucene_ray.pipelines.flagship import build_transcript_index

    return build_transcript_index(SF)


def _brute_join(searcher, from_q, mode, k):
    """Oracle: full from-side scan, python dict aggregation, full to-side
    membership scan over every hit of MatchAll."""
    from lucene_ray.search.query import MatchAllDocsQuery

    td = searcher.search(from_q, k=10 ** 6, total_hits_threshold=2 ** 31 - 1)
    agg: dict[str, list[float]] = {}
    for h in td.hits:
        agg.setdefault(h.conv_id, []).append(float(h.score))
    val_score = {}
    for v, ss in agg.items():
        if mode == "none":
            val_score[v] = 1.0
        elif mode == "max":
            val_score[v] = max(ss)
        elif mode == "min":
            val_score[v] = min(ss)
        elif mode == "total":
            val_score[v] = float(np.sum(np.asarray(ss, dtype=np.float64)))
        else:
            val_score[v] = float(np.mean(np.asarray(ss, dtype=np.float64)))
    every = searcher.search(MatchAllDocsQuery(), k=10 ** 6,
                            total_hits_threshold=2 ** 31 - 1)
    out = [(np.float32(val_score[h.conv_id]), h.gid, h.conv_id, h.turn_idx)
           for h in every.hits if h.conv_id in val_score]
    out.sort(key=lambda x: (-x[0], x[1]))
    return out[:k], len(out)


@pytest.mark.parametrize("mode", ["none", "max", "min", "total", "avg"])
def test_join_matches_bruteforce(idx, mode):
    from lucene_ray.search.join import join_search
    from lucene_ray.search.query import bool_query
    from lucene_ray.search.searcher import IndexSearcher

    s = IndexSearcher(idx)
    from_q = bool_query(should=["merge", "vector"])
    td = join_search(s, from_q, "conv_id", "conv_id", score_mode=mode, k=12)
    expect, total = _brute_join(s, from_q, mode, 12)
    assert td.total_hits == total
    assert [(np.float32(h.score), h.gid) for h in td.hits] == \
        [(sc, g) for sc, g, _, _ in expect]


def test_join_no_matches(idx, ray_session):
    from lucene_ray.search.join import join_search
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    s = IndexSearcher(idx)
    td = join_search(s, TermQuery("zzzznotaterm"), "conv_id", "conv_id",
                     score_mode="max", k=5)
    assert td.total_hits == 0 and td.hits == []


def test_join_numeric_field(idx):
    """Join through the int64 turn_idx doc-values column: from docs matching
    a term to EVERY doc sharing any matched turn_idx value."""
    from lucene_ray.search.join import join_search
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    s = IndexSearcher(idx)
    from_q = TermQuery("dup")
    td_from = s.search(from_q, k=10 ** 6, total_hits_threshold=2 ** 31 - 1)
    vals = {h.turn_idx for h in td_from.hits}
    assert vals, "fixture term must match"
    td = join_search(s, from_q, "turn_idx", "turn_idx", score_mode="none",
                     k=10 ** 6)
    # membership count oracle over the docmap
    n = 0
    for pid in s._pids:
        rdr = s.reader(pid)
        tv = np.asarray(rdr.docmap().column("turn_idx"))
        n += int(np.isin(tv, list(vals)).sum())
    assert td.total_hits == n
    assert all(h.turn_idx in vals for h in td.hits[:50])


def test_join_respects_deletes(idx, tmp_path):
    """Deleted to-side docs never join; deleted from-side docs contribute no
    values (delete every doc of one conversation, join from a term that
    occurs in it)."""
    import pyarrow as pa

    from lucene_ray.index.deletes import delete_by_keys
    from lucene_ray.search.join import join_search
    from lucene_ray.search.query import bool_query
    from lucene_ray.search.searcher import IndexSearcher

    s = IndexSearcher(idx)
    from_q = bool_query(should=["merge", "vector"])
    before = join_search(s, from_q, "conv_id", "conv_id", "max", k=5)
    victim = before.hits[0].conv_id
    import shutil

    work = str(tmp_path / "jidx")
    shutil.copytree(idx, work)
    keys = pa.table({"conv_id": pa.array([victim] * 8),
                     "turn_idx": pa.array(list(range(8)), type=pa.int32())})
    delete_by_keys(work, keys)
    s2 = IndexSearcher(work)
    after = join_search(s2, from_q, "conv_id", "conv_id", "max", k=5)
    assert all(h.conv_id != victim for h in after.hits)
    assert after.total_hits < before.total_hits
