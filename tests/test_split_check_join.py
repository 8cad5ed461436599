"""PKIndexSplitter (deletes.split_index) + CheckJoinIndex
(check.check_join_index)."""

import numpy as np
import pyarrow as pa
import pytest


def _tbl(n):
    return pa.table({
        "conv_id": pa.array([f"conv-{i // 5:08d}" for i in range(n)]),
        "turn_idx": pa.array([i % 5 for i in range(n)], type=pa.int32()),
        "text": pa.array([("odd" if i % 2 else "even") + f" tok{i} shared"
                          for i in range(n)]),
    })


@pytest.fixture(scope="module")
def src(ray_session, tmp_path_factory):
    import ray.data as rd

    from lucene_ray.index.build import build_index

    d = str(tmp_path_factory.mktemp("split") / "src")
    build_index(rd.from_arrow(_tbl(200)), d, target_docs_per_partition=60,
                input_desc="split-src")
    return d


def test_split_index_partitions_by_query(src, tmp_path):
    from lucene_ray.index.deletes import split_index
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    d1, d2 = str(tmp_path / "odd"), str(tmp_path / "rest")
    c1, c2 = split_index(src, d1, d2, TermQuery("odd"))
    s1, s2 = IndexSearcher(d1), IndexSearcher(d2)
    # dir1 = matching docs only; dir2 = the complement; union = source
    assert s1.count(TermQuery("shared")) == 100
    assert s2.count(TermQuery("shared")) == 100
    assert s1.count(TermQuery("odd")) == 100
    assert s1.count(TermQuery("even")) == 0
    assert s2.count(TermQuery("even")) == 100
    assert s2.count(TermQuery("odd")) == 0
    # source untouched
    s0 = IndexSearcher(src)
    assert s0.count(TermQuery("shared")) == 200


def test_split_respects_prior_deletes(src, tmp_path):
    import shutil

    from lucene_ray.index.deletes import delete_by_query, split_index
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    work = str(tmp_path / "w")
    shutil.copytree(src, work)
    delete_by_query(work, TermQuery("tok3"))        # kills one odd doc
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    split_index(work, d1, d2, TermQuery("odd"))
    assert IndexSearcher(d1).count(TermQuery("odd")) == 99
    assert IndexSearcher(d2).count(TermQuery("even")) == 100


def test_check_join_index_green(src):
    from lucene_ray.index.check import check_join_index

    rep = check_join_index(src)
    assert rep["ok"], rep
    assert rep["n_shards_checked"] >= 2


def test_check_join_index_detects_cross_shard_conv(ray_session, tmp_path):
    """A conversation whose turns land in two shards (e.g. addIndexes of
    overlapping conv ranges — build_index itself always range-partitions
    whole conversations) must be flagged."""
    import ray.data as rd

    from lucene_ray.index.build import add_indexes, build_index
    from lucene_ray.index.check import check_join_index

    def tbl(lo, hi):
        return pa.table({
            "conv_id": pa.array([f"conv-{i // 5:08d}" for i in range(lo, hi)]),
            "turn_idx": pa.array([i % 5 for i in range(lo, hi)],
                                 type=pa.int32()),
            "text": pa.array([f"tok{i}" for i in range(lo, hi)]),
        })

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    build_index(rd.from_arrow(tbl(0, 63)), a,          # conv 12 half here
                target_docs_per_partition=63, input_desc="a")
    build_index(rd.from_arrow(tbl(63, 120)), b,        # ... half here
                target_docs_per_partition=57, input_desc="b")
    add_indexes(a, [b])
    rep = check_join_index(a)
    assert not rep["ok"]
    assert any("span" in e for e in rep["errors"])


@pytest.mark.parametrize("sequential", [False, True])
def test_multi_pass_split(src, tmp_path, sequential):
    from lucene_ray.index.deletes import multi_pass_split
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    outs = [str(tmp_path / f"p{i}-{sequential}") for i in range(3)]
    multi_pass_split(src, outs, sequential=sequential)
    counts = [IndexSearcher(d).count(TermQuery("shared")) for d in outs]
    assert sum(counts) == 200
    assert all(c > 0 for c in counts)
    if sequential:
        # contiguous ranges: sizes are the range widths
        assert counts == [200 * (i + 1) // 3 - 200 * i // 3 for i in range(3)]
    else:
        # round-robin: balanced within 1
        assert max(counts) - min(counts) <= 1


def test_rearrange_index(src, tmp_path):
    """IndexRearranger: segments defined by selectors; partition enforced."""
    from lucene_ray.index.manifest import latest_commit
    from lucene_ray.index.merge import rearrange_index
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    dest = str(tmp_path / "re")
    commit = rearrange_index(src, dest,
                             [TermQuery("odd"), TermQuery("even")])
    assert len(commit["shards"]) == 2
    s = IndexSearcher(dest)
    assert s.count(TermQuery("shared")) == 200
    assert s.count(TermQuery("odd")) == 100
    # segment membership: each new segment holds exactly one parity
    by_shard = []
    for pid in s._pids:
        rdr = s.reader(pid)
        tid = rdr.seek_exact("odd")
        by_shard.append(0 if tid < 0 else len(rdr.postings(tid)[0]))
    assert sorted(by_shard) == [0, 100]
    # deletes were expunged during the rewrite
    assert commit["doc_count"] == 200


def test_rearrange_rejects_non_partition(src, tmp_path):
    from lucene_ray.index.merge import rearrange_index
    from lucene_ray.search.query import TermQuery

    with pytest.raises(ValueError):
        rearrange_index(src, str(tmp_path / "bad"),
                        [TermQuery("odd"), TermQuery("shared")])
