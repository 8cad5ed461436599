"""Facet sets (`facet/facetset/` package): multi-valued point sidecars,
Exact/Range matchers, MatchingFacetSetsCounts pair-vs-doc semantics."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.search.facetset import (
    DimRange,
    ExactFacetSetMatcher,
    RangeFacetSetMatcher,
    facet_set_counts,
)
from lucene_ray.search.query import MatchAllDocsQuery, TermQuery
from lucene_ray.search.searcher import IndexSearcher


def test_dim_range_from_longs():
    assert DimRange.from_longs(3, True, 6, True) == DimRange(3, 6)
    assert DimRange.from_longs(3, False, 6, False) == DimRange(4, 5)


def test_matcher_masks():
    vals = np.array([[1, 2], [3, 4], [3, 9]], dtype=np.int64)
    assert ExactFacetSetMatcher("e", (3, 4)).mask(vals).tolist() == \
        [False, True, False]
    m = RangeFacetSetMatcher("r", (DimRange(2, 3), DimRange(4, 9)))
    assert m.mask(vals).tolist() == [False, True, True]
    with pytest.raises(ValueError):
        ExactFacetSetMatcher("e", (1,)).mask(vals)


N = 40


@pytest.fixture(scope="module")
def fs_index(ray_session, tmp_path_factory):
    import ray.data as rd

    ids = np.arange(N)
    # two sets per doc, third set only on even docs (ragged lists)
    fs_a, fs_b = [], []
    for d in ids:
        a, b = [int(d % 7), int(d % 5)], [int(d % 11), int(d % 13) + 8]
        if d % 2 == 0:
            a.append(99)
            b.append(100)
        fs_a.append(a)
        fs_b.append(b)
    t = pa.table({
        "conv_id": [f"c{d:04d}" for d in ids], "turn_idx": ids,
        "role": ["user"] * N, "ts": pa.array(ids, type=pa.int64()),
        "text": ["merge data" if d % 3 == 0 else "sort data" for d in ids],
        "fs_a": fs_a, "fs_b": fs_b,
    })
    d = str(tmp_path_factory.mktemp("fsidx"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=16,
                point_cols={"fs": ("fs_a", "fs_b")}, input_desc="fs-test")
    return IndexSearcher(d), ids


def _sets_of(d: int):
    out = [(d % 7, d % 5), (d % 11, d % 13 + 8)]
    if d % 2 == 0:
        out.append((99, 100))
    return out


def test_facet_set_counts_pairs_and_total(fs_index):
    s, ids = fs_index
    matchers = (
        ExactFacetSetMatcher("x99", (99, 100)),
        RangeFacetSetMatcher("r", (DimRange(0, 3), DimRange(0, 10))),
    )
    r = facet_set_counts(s, MatchAllDocsQuery(), "fs", matchers)
    # brute force over the flattened (doc, set) pairs; note the fixture's
    # set layout is column-major (fs_a holds dim-0 of every set), so the
    # doc's sets are (fs_a[i], fs_b[i])
    def sets(d):
        base = [(d % 7, d % 11), (d % 5, d % 13 + 8)]
        if d % 2 == 0:
            base.append((99, 100))
        return base

    want_x99 = sum(1 for d in ids for v in sets(d) if v == (99, 100))
    want_r = sum(1 for d in ids for v in sets(d)
                 if 0 <= v[0] <= 3 and 0 <= v[1] <= 10)
    want_total = sum(1 for d in ids
                     if any(v == (99, 100) or
                            (0 <= v[0] <= 3 and 0 <= v[1] <= 10)
                            for v in sets(d)))
    assert r["counts"] == [("x99", want_x99), ("r", want_r)]
    assert r["total"] == want_total
    # query restriction: only 'merge' docs count
    r2 = facet_set_counts(s, TermQuery("merge"), "fs", matchers)
    want2 = sum(1 for d in ids if d % 3 == 0
                for v in sets(d) if v == (99, 100))
    assert r2["counts"][0] == ("x99", want2)


def test_multivalued_point_box(fs_index):
    """Multi-valued sidecar: intersect_box returns each doc once even when
    several of its points fall in the box."""
    from lucene_ray.search.query import PointRangeQuery

    s, ids = fs_index
    # box covering (99, 100) only -> the even docs
    n = s.count(PointRangeQuery("fs", (50, 50), (None, None)))
    assert n == sum(1 for d in ids if d % 2 == 0)


def test_list_length_mismatch_raises(ray_session, tmp_path):
    import ray.data as rd

    t = pa.table({
        "conv_id": ["c0", "c1"], "turn_idx": [0, 1],
        "role": ["user"] * 2, "ts": pa.array([0, 1], type=pa.int64()),
        "text": ["a", "b"],
        "fs_a": [[1, 2], [3]], "fs_b": [[1], [3]],
    })
    with pytest.raises(Exception):
        build_index(rd.from_arrow(t), str(tmp_path / "bad"),
                    point_cols={"fs": ("fs_a", "fs_b")}, input_desc="bad")
