"""addIndexes (IndexWriter.addIndexes(Directory...) analogue,
build.add_indexes): graft source indexes into a destination — doc/stat
union, delete survival, analyzer-chain guard, CheckIndex, merge CLI path."""

import numpy as np
import pyarrow as pa
import pytest


def _tbl(lo, hi, word):
    n = hi - lo
    return pa.table({
        "conv_id": pa.array([f"conv-{i // 5:08d}" for i in range(lo, hi)]),
        "turn_idx": pa.array([i % 5 for i in range(lo, hi)], type=pa.int32()),
        "text": pa.array([f"{word} body number{i} common" for i in range(lo, hi)]),
    })


@pytest.fixture(scope="module")
def three_indexes(ray_session, tmp_path_factory):
    import ray.data as rd

    from lucene_ray.index.build import build_index

    root = tmp_path_factory.mktemp("addidx")
    dirs = []
    for name, lo, hi, w in [("a", 0, 100, "alpha"), ("b", 100, 180, "beta"),
                            ("c", 180, 300, "gamma")]:
        d = str(root / name)
        build_index(rd.from_arrow(_tbl(lo, hi, w)), d,
                    target_docs_per_partition=40, input_desc=name)
        dirs.append(d)
    return dirs


def test_add_indexes_unions_docs_and_stats(three_indexes):
    from lucene_ray.index.build import add_indexes
    from lucene_ray.index.check import check_index
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    a, b, c = three_indexes
    commit = add_indexes(a, [b, c])
    s = IndexSearcher(a)
    assert s.doc_count == 300
    assert s.count(TermQuery("alpha")) == 100
    assert s.count(TermQuery("beta")) == 80
    assert s.count(TermQuery("gamma")) == 120
    assert s.count(TermQuery("common")) == 300
    # global stats re-merged: df through the bucketed store
    assert s.df("common") == 300 and s.df("beta") == 80
    assert commit["doc_count"] == 300
    rep = check_index(a)
    assert rep["ok"], rep


def test_add_indexes_carries_deletes(three_indexes, tmp_path):
    import shutil

    import ray.data as rd

    from lucene_ray.index.build import add_indexes, build_index
    from lucene_ray.index.deletes import delete_by_keys
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    dest = str(tmp_path / "dest")
    build_index(rd.from_arrow(_tbl(0, 50, "base")), dest,
                target_docs_per_partition=25, input_desc="dest")
    src = str(tmp_path / "src")
    build_index(rd.from_arrow(_tbl(50, 120, "extra")), src,
                target_docs_per_partition=30, input_desc="src")
    # delete 5 docs from the source BEFORE grafting
    keys = pa.table({"conv_id": pa.array([f"conv-{i // 5:08d}"
                                          for i in range(50, 55)]),
                     "turn_idx": pa.array([i % 5 for i in range(50, 55)],
                                          type=pa.int32())})
    delete_by_keys(src, keys)
    add_indexes(dest, [src])
    s = IndexSearcher(dest)
    assert s.count(TermQuery("extra")) == 65      # 70 - 5 deleted
    assert s.count(TermQuery("base")) == 50


def test_add_indexes_rejects_chain_mismatch(three_indexes, tmp_path):
    import ray.data as rd

    from lucene_ray.index.build import add_indexes, build_index

    stemmed = str(tmp_path / "stemmed")
    build_index(rd.from_arrow(_tbl(0, 20, "delta")), stemmed,
                target_docs_per_partition=20, input_desc="st",
                token_filters=("porter",))
    with pytest.raises(ValueError):
        add_indexes(three_indexes[0], [stemmed])
