"""Grouping-module extras beyond the two-pass keyword grouped top-k
(`searcher.grouped_search`): range group selectors, block grouping, and
grouped facets.

Reference surface: `lucene/grouping/src/java/org/apache/lucene/search/
grouping/LongRangeGroupSelector.java` + `LongRangeFactory.java` (group by
bucketed long values), `BlockGroupingCollector.java` (groups are index
blocks — one group per contiguous parent block, here a conversation), and
`GroupFacetCollector.java` / `TermGroupFacetCollector.java` (facet counts
that count DISTINCT GROUPS rather than docs).

All three ride the engine's existing hit stream (score desc, gid asc) and
resolve group keys vectorized — doc-values column takes for ranges, the
docmap conv key for blocks, keyword postings membership for facets.  The
collector state is O(groups seen), never O(corpus).
"""

from __future__ import annotations

import numpy as np

LONG_MIN = -(2 ** 63)
LONG_MAX = 2 ** 63 - 1


def long_range_of(value: int, lo: int, width: int, hi: int) -> tuple[int, int]:
    """LongRangeFactory.getRange (LongRangeFactory.java:45-63): below-min
    values collapse into [LONG_MIN, min); above-max into [max, LONG_MAX];
    between, fixed-width buckets [min + k*width, min + (k+1)*width)."""
    if value < lo:
        return (LONG_MIN, lo)
    if value >= hi:
        return (hi, LONG_MAX)
    bucket = (value - lo) // width
    return (lo + bucket * width, lo + bucket * width + width)


def _dv_of_gids(searcher, gids: np.ndarray, field: str) -> np.ndarray:
    """Per-hit int64 doc-values, resolved with one vectorized take per
    shard (hits grouped by owning shard)."""
    out = np.zeros(len(gids), dtype=np.int64)
    for pid in searcher._pids:
        base = searcher._bases[pid]
        rdr = searcher.reader(pid)
        sel = (gids >= base) & (gids < base + rdr.doc_count)
        if not sel.any():
            continue
        out[sel] = rdr.docvalue(field)[gids[sel] - base]
    return out


def range_grouped_search(searcher, query, field: str, lo: int, width: int,
                         hi: int, n_groups: int = 10,
                         docs_per_group: int = 2):
    """GroupingSearch with a LongRangeGroupSelector: two-pass grouped top-k
    where the group key is the value's LongRangeFactory bucket.  Groups
    ranked by their best doc (score desc, gid asc; ties: lower range
    first), top `docs_per_group` docs per group by (score desc, gid asc).

    Returns [((range_lo, range_hi), best_score, [ScoreDoc, ...])]."""
    td = searcher.search(query, k=searcher.doc_count,
                         total_hits_threshold=2**31 - 1)
    if not td.hits:
        return []
    gids = np.array([h.gid for h in td.hits], dtype=np.int64)
    vals = _dv_of_gids(searcher, gids, field)
    groups: dict[tuple[int, int], list] = {}
    for h, v in zip(td.hits, vals):       # stream is (score desc, gid asc)
        key = long_range_of(int(v), lo, width, hi)
        bucket = groups.setdefault(key, [])
        if len(bucket) < docs_per_group:
            bucket.append(h)
    ranked = sorted(groups.items(),
                    key=lambda kv: (-kv[1][0].score, kv[1][0].gid, kv[0]))
    return [(key, float(hits[0].score), hits)
            for key, hits in ranked[:n_groups]]


def double_range_of(value: float, lo: float, width: float,
                    hi: float) -> tuple[float, float]:
    """DoubleRangeFactory.getRange (`grouping/DoubleRangeFactory.java`):
    same bucket algebra as the long factory on doubles."""
    if value < lo:
        return (-np.inf, lo)
    if value >= hi:
        return (hi, np.inf)
    bucket = (value - lo) // width
    return (lo + bucket * width, lo + bucket * width + width)


def value_grouped_search(searcher, query, expression: str,
                         range_factory: tuple | None = None,
                         n_groups: int = 10, docs_per_group: int = 2):
    """GroupingSearch with a ValueSourceGroupSelector
    (`grouping/ValueSourceGroupSelector.java`) — the group key is a computed
    DoubleValuesSource over doc-values (our expressions module); with
    `range_factory=(lo, width, hi)` the keys bucket through
    DoubleRangeGroupSelector + DoubleRangeFactory instead.  Groups ranked by
    best doc (score desc, gid asc; ties lower key), `docs_per_group` docs
    per group.

    Returns [(key, best_score, [ScoreDoc, ...])] — key is the float value,
    or the (lo, hi) range tuple under a factory."""
    from .expressions import compile_expression

    fn, names = compile_expression(expression)
    td = searcher.search(query, k=searcher.doc_count,
                         total_hits_threshold=2**31 - 1)
    if not td.hits:
        return []
    gids = np.array([h.gid for h in td.hits], dtype=np.int64)
    env = {}
    for nm in names:
        if nm == "_score":
            env[nm] = np.array([h.score for h in td.hits], dtype=np.float64)
        else:
            env[nm] = _dv_of_gids(searcher, gids, nm).astype(np.float64)
    vals = fn(env)
    if vals.shape == ():
        vals = np.full(len(gids), float(vals))
    groups: dict = {}
    for h, v in zip(td.hits, vals):
        key = float(v) if range_factory is None \
            else double_range_of(float(v), *range_factory)
        bucket = groups.setdefault(key, [])
        if len(bucket) < docs_per_group:
            bucket.append(h)
    ranked = sorted(groups.items(),
                    key=lambda kv: (-kv[1][0].score, kv[1][0].gid, kv[0]))
    return [(key, float(hits[0].score), hits)
            for key, hits in ranked[:n_groups]]


def block_grouped_search(searcher, query, n_groups: int = 10,
                         docs_per_group: int = 2):
    """BlockGroupingCollector: groups ARE the index's contiguous parent
    blocks (one conversation per block under our index sort), so the group
    key needs no field lookup at all — it is the hit's block key.  Groups
    ranked by best doc (score desc, gid asc), `docs_per_group` docs each.

    Returns [(conv_id, best_score, [ScoreDoc, ...])]."""
    td = searcher.search(query, k=searcher.doc_count,
                         total_hits_threshold=2**31 - 1)
    groups: dict[str, list] = {}
    for h in td.hits:                     # stream is (score desc, gid asc)
        bucket = groups.setdefault(h.conv_id, [])
        if len(bucket) < docs_per_group:
            bucket.append(h)
    ranked = sorted(groups.items(),
                    key=lambda kv: (-kv[1][0].score, kv[1][0].gid))
    return [(cid, float(hits[0].score), hits)
            for cid, hits in ranked[:n_groups]]


def block_join_sorted_search(searcher, child_query, field: str,
                             selector: str = "max", k: int = 10,
                             reverse: bool = True):
    """ToParentBlockJoinSortField (`join/.../ToParentBlockJoinSortField.java`
    + `BlockJoinSelector.java` MIN/MAX): rank parent blocks by the min/max
    of a child doc-values field over the children matching `child_query`
    (the childFilter), ties to the lower parent (first matching child's
    gid).  Returns [(conv_id, value, rep_gid)] of length <= k."""
    if selector not in ("min", "max"):
        raise ValueError(selector)
    rows = []
    compiled = searcher.compile(child_query)
    for pid in searcher._pids:
        rdr = searcher.reader(pid)
        base = searcher._bases[pid]
        _s, docs, _t, _r = searcher.search_shard(
            rdr, compiled, rdr.doc_count, total_hits_threshold=2**31 - 1)
        if not len(docs):
            continue
        docs = np.sort(docs)
        conv = rdr.docmap().column("conv_id").to_numpy(zero_copy_only=False)
        cids = conv[docs]
        run_start = np.ones(len(docs), dtype=bool)
        run_start[1:] = cids[1:] != cids[:-1]
        starts = np.nonzero(run_start)[0]
        vals = rdr.docvalue(field)[docs]
        agg = (np.maximum if selector == "max" else np.minimum) \
            .reduceat(vals, starts)
        rep = docs[starts].astype(np.int64) + base
        for c, v, g in zip(cids[starts], agg, rep):
            rows.append((str(c), int(v), int(g)))
    rows.sort(key=lambda r: (-r[1] if reverse else r[1], r[2]))
    return rows[:k]


def group_facets(searcher, query, facet_field: str,
                 classes: list[str] | None = None,
                 min_count: int = 1) -> dict:
    """TermGroupFacetCollector.mergeSegmentResults: for each facet value,
    the number of DISTINCT GROUPS (blocks/conversations) that contain at
    least one matching doc carrying that value — the (group, facet) pair
    dedup of TermGroupFacetCollector.java:120-152.  Docs with no facet
    value contribute (group, missing) pairs to `total_missing`.

    Returns {"entries": [(value, group_count) count desc, value asc],
             "total": distinct (group, facet) pairs,
             "total_missing": distinct groups with a facetless match}."""
    from ..pipelines.classify import _classes_of_hits, _keyword_classes

    td = searcher.search(query, k=searcher.doc_count,
                         total_hits_threshold=2**31 - 1)
    if classes is None:
        classes = _keyword_classes(searcher, facet_field)
    gids = np.array([h.gid for h in td.hits], dtype=np.int64)
    vals = _classes_of_hits(searcher, gids, facet_field, classes)
    pairs = set()
    missing = set()
    for h, v in zip(td.hits, vals):
        if v is None:
            missing.add(h.conv_id)
        else:
            pairs.add((h.conv_id, v))
    counts: dict[str, int] = {}
    for _g, v in pairs:
        counts[v] = counts.get(v, 0) + 1
    entries = sorted(((v, c) for v, c in counts.items() if c >= min_count),
                     key=lambda vc: (-vc[1], vc[0]))
    return {"entries": entries, "total": len(pairs),
            "total_missing": len(missing)}
