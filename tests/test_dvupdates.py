"""Numeric doc-values updates (`IndexWriter.updateNumericDocValue`):
generational sidecars, commit visibility, range-pruning correctness when the
updated value leaves the original min/max, stacking, sort integration, and
merge folding."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.index.dvupdates import update_numeric_docvalue
from lucene_ray.index.merge import force_merge
from lucene_ray.search.query import RangeQuery, SortField, bool_query
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.sources.transcripts import synth_transcripts


def _keys(conv_turn_pairs):
    return pa.table({
        "conv_id": [c for c, _ in conv_turn_pairs],
        "turn_idx": pa.array([t for _, t in conv_turn_pairs], type=pa.int32()),
    })


@pytest.fixture()
def dv_index(ray_session, tmp_path):
    import ray.data as rd

    t = synth_transcripts(1200, seed=55)
    d = str(tmp_path / "dvidx")
    build_index(rd.from_arrow(t), d, target_docs_per_partition=400,
                docvalue_cols=("ts",), input_desc="dvupd")
    return d, t


def test_update_visible_after_refresh(dv_index):
    d, t = dv_index
    s = IndexSearcher(d)
    ts = s.reader(s._pids[0]).docvalue("ts")
    dm = s.reader(s._pids[0]).docmap()
    key = (dm.column("conv_id")[0].as_py(), dm.column("turn_idx")[0].as_py())
    old_val = int(ts[0])
    new_val = old_val + 10_000_000_000

    before = s.count(RangeQuery("ts", new_val, new_val))
    assert before == 0
    update_numeric_docvalue(d, _keys([key]), "ts", new_val)
    # not visible until refresh (commit-point semantics)
    assert s.count(RangeQuery("ts", new_val, new_val)) == before
    assert s.refresh()
    assert s.count(RangeQuery("ts", new_val, new_val)) == 1
    assert s.count(RangeQuery("ts", old_val, old_val)) == 0

    # a fresh searcher sees it too
    s2 = IndexSearcher(d)
    assert s2.count(RangeQuery("ts", new_val, new_val)) == 1


def test_pruning_not_stale_outside_original_range(dv_index):
    """The updated value lies far OUTSIDE every shard's original min/max; a
    range query over just that value must still find the doc (dv_ranges
    override beats the immutable shard manifest)."""
    d, _ = dv_index
    s = IndexSearcher(d)
    dm = s.reader(s._pids[0]).docmap()
    key = (dm.column("conv_id")[5].as_py(), dm.column("turn_idx")[5].as_py())
    far = 9_999_999_999_999_999
    update_numeric_docvalue(d, _keys([key]), "ts", far)
    s.refresh()
    assert s.count(RangeQuery("ts", far - 1, far + 1)) == 1
    rdr = s.reader(s._pids[0])
    lo, hi = rdr.docvalue_range("ts")
    assert hi == far                      # pruning range tracks the update


def test_updates_stack_and_sort_sees_them(dv_index):
    d, _ = dv_index
    s = IndexSearcher(d)
    dm = s.reader(s._pids[0]).docmap()
    k1 = (dm.column("conv_id")[1].as_py(), dm.column("turn_idx")[1].as_py())
    k2 = (dm.column("conv_id")[2].as_py(), dm.column("turn_idx")[2].as_py())
    top = 8_888_888_888_888_888
    update_numeric_docvalue(d, _keys([k1]), "ts", top)
    update_numeric_docvalue(d, _keys([k2]), "ts", top - 1)   # second gen
    s.refresh()
    from lucene_ray.search.query import MatchAllDocsQuery

    td = s.search(MatchAllDocsQuery(), k=2, sort=SortField("ts", reverse=True))
    got = [(h.conv_id, h.turn_idx) for h in td.hits]
    assert got == [k1, k2]
    # first update survives the second generation
    assert s.count(RangeQuery("ts", top, top)) == 1
    assert s.count(RangeQuery("ts", top - 1, top - 1)) == 1


def test_merge_folds_updates(dv_index):
    d, _ = dv_index
    s = IndexSearcher(d)
    dm = s.reader(s._pids[0]).docmap()
    key = (dm.column("conv_id")[3].as_py(), dm.column("turn_idx")[3].as_py())
    val = 7_777_777_777_777_777
    update_numeric_docvalue(d, _keys([key]), "ts", val)
    force_merge(d, max_segments=1)
    s2 = IndexSearcher(d)
    assert len(s2._pids) == 1
    assert s2.count(RangeQuery("ts", val, val)) == 1
    # merged segment carries the folded value natively — no sidecar attached
    assert not getattr(s2.reader(s2._pids[0]), "_dv_files", {})


def test_update_requires_docvalue_column(dv_index):
    d, _ = dv_index
    with pytest.raises(ValueError):
        update_numeric_docvalue(d, _keys([("conv-0", 0)]), "nope", 1)


def test_checkindex_and_prune_sidecars(dv_index):
    from lucene_ray.index.check import check_index
    from lucene_ray.index.manifest import prune_commits

    d, _ = dv_index
    s = IndexSearcher(d)
    dm = s.reader(s._pids[0]).docmap()
    k1 = (dm.column("conv_id")[0].as_py(), dm.column("turn_idx")[0].as_py())
    update_numeric_docvalue(d, _keys([k1]), "ts", 6_000_000_000_000_000)
    rep = check_index(d)
    assert rep["ok"], rep["errors"]
    # second generation orphans the first sidecar; prune cleans it up
    update_numeric_docvalue(d, _keys([k1]), "ts", 6_000_000_000_000_001)
    import glob as _g
    import os as _os

    n_before = len(_g.glob(_os.path.join(d, "dvups", "*.npy")))
    out = prune_commits(d, keep_last=1)
    n_after = len(_g.glob(_os.path.join(d, "dvups", "*.npy")))
    assert n_after < n_before and out["removed_sidecars"]
    assert check_index(d)["ok"]
    s2 = IndexSearcher(d)
    from lucene_ray.search.query import RangeQuery

    assert s2.count(RangeQuery("ts", 6_000_000_000_000_001,
                               6_000_000_000_000_001)) == 1
