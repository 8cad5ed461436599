"""Facet sets: counting multi-dimensional long-value sets against a list
of matchers.

Re-expresses the `facet/src/java/org/apache/lucene/facet/facetset/`
package (`FacetSet.java`, `ExactFacetSetMatcher.java`,
`RangeFacetSetMatcher.java` + `DimRange`, `MatchingFacetSetsCounts.java`)
on the column data model: the reference packs every doc's sets into one
binary doc-values blob and decodes per doc; here the sets are rows of the
multi-valued k-dim point sidecar (`index/points.py` — one (doc, k-dim
value) row per set), so matching is one vectorized mask per matcher per
shard.

Counting semantics traced from `MatchingFacetSetsCounts.java:90-138`:
``counts[j]`` counts matching (doc, set) PAIRS — a doc carrying two sets
that both match contributes 2 — while ``totCount`` counts DISTINCT docs
that matched at least one matcher.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = ["DimRange", "ExactFacetSetMatcher", "RangeFacetSetMatcher",
           "facet_set_counts"]


@dataclass(frozen=True)
class DimRange:
    """Inclusive per-dimension long range (`RangeFacetSetMatcher.DimRange`);
    use :meth:`from_longs` for the reference's exclusive-bound adjustment
    (min+1 / max-1, `RangeFacetSetMatcher.fromLongs`)."""
    min: int
    max: int

    @staticmethod
    def from_longs(min_: int, min_inclusive: bool,
                   max_: int, max_inclusive: bool) -> "DimRange":
        return DimRange(min_ if min_inclusive else min_ + 1,
                        max_ if max_inclusive else max_ - 1)


@dataclass(frozen=True)
class ExactFacetSetMatcher:
    """Matches sets equal to ``values`` on every dimension
    (`ExactFacetSetMatcher.java:39-48`)."""
    label: str
    values: tuple

    def mask(self, vals: np.ndarray) -> np.ndarray:
        want = np.asarray(self.values, dtype=np.int64)
        if vals.shape[1] != len(want):
            raise ValueError(
                f"encoded dims ({vals.shape[1]}) != matcher dims ({len(want)})")
        return np.all(vals == want, axis=1)


@dataclass(frozen=True)
class RangeFacetSetMatcher:
    """Matches sets whose every dimension lies inside its DimRange
    (`RangeFacetSetMatcher.java:42-55`)."""
    label: str
    ranges: tuple      # tuple[DimRange, ...]

    def mask(self, vals: np.ndarray) -> np.ndarray:
        if vals.shape[1] != len(self.ranges):
            raise ValueError(
                f"encoded dims ({vals.shape[1]}) != matcher dims "
                f"({len(self.ranges)})")
        m = np.ones(len(vals), dtype=bool)
        for d, r in enumerate(self.ranges):
            m &= (vals[:, d] >= r.min) & (vals[:, d] <= r.max)
        return m


def facet_set_counts(searcher, query, field: str, matchers) -> dict:
    """MatchingFacetSetsCounts over the matching docs of ``query``:
    returns {"total": distinct matched docs,
             "counts": [(label, pair_count), ...]} in matcher order."""
    compiled = searcher.compile(query)
    counts = np.zeros(len(matchers), dtype=np.int64)
    total = 0
    for pid in searcher._pids:
        rdr = searcher.reader(pid)
        pr = rdr.points(field)
        if pr is None or pr.n_points == 0:
            continue
        _s, docs, _t, _r = searcher.search_shard(
            rdr, compiled, rdr.doc_count, total_hits_threshold=2**31 - 1)
        if not len(docs):
            continue
        in_query = np.zeros(rdr.doc_count, dtype=bool)
        in_query[docs] = True
        if rdr.deleted is not None:
            in_query &= ~rdr.deleted
        set_docs = np.asarray(pr.docs)
        eligible = in_query[set_docs]
        vals = np.asarray(pr.vals)
        doc_hit = np.zeros(rdr.doc_count, dtype=bool)
        for j, m in enumerate(matchers):
            hit = m.mask(vals) & eligible
            counts[j] += int(hit.sum())
            doc_hit[set_docs[hit]] = True
        total += int(doc_hit.sum())
    return {"total": total,
            "counts": [(m.label, int(c)) for m, c in zip(matchers, counts)]}
