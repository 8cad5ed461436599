"""Grouping-module extras beyond the two-pass keyword grouped top-k
(`searcher.grouped_search`): range group selectors, block grouping, and
grouped facets.

Reference surface: `lucene/grouping/src/java/org/apache/lucene/search/
grouping/LongRangeGroupSelector.java` + `LongRangeFactory.java` (group by
bucketed long values), `BlockGroupingCollector.java` (groups are index
blocks — one group per contiguous parent block, here a conversation), and
`GroupFacetCollector.java` / `TermGroupFacetCollector.java` (facet counts
that count DISTINCT GROUPS rather than docs).

The grouped-top-k collectors run PER SHARD (the reference's per-segment
collection): each shard contributes at most `docs_per_group` candidates per
group it contains, so driver state is O(groups × docs_per_group) — the full
match set never leaves its shard.  ``group_facets`` holds the distinct
(group, facet) pair set, which is inherent to TermGroupFacetCollector's
semantics (the reference's groupedFacetHits list is the same size); its
100-TB twin is the Dataset-side facet pipeline.
"""

from __future__ import annotations

import numpy as np

LONG_MIN = -(2 ** 63)
LONG_MAX = 2 ** 63 - 1


def _collect_grouped(searcher, query, shard_keys, docs_per_group: int):
    """Per-shard grouped top-k partials.  ``shard_keys(rdr, docs, scores)``
    returns sortable group-key scalars aligned with ``docs``.  Returns
    {key: [(score f32, gid), ...] top docs_per_group by (score desc, gid)}."""
    compiled = searcher.compile(query)
    groups: dict = {}
    for pid in searcher._pids:
        rdr = searcher.reader(pid)
        base = searcher._bases[pid]
        scores, docs, _t, _r = searcher.search_shard(
            rdr, compiled, rdr.doc_count, total_hits_threshold=2**31 - 1)
        if not len(docs):
            continue
        keys = shard_keys(rdr, docs, scores)
        uniq, inv = np.unique(keys, return_inverse=True)
        order = np.lexsort((docs, -scores, inv))
        k_s, s_s, d_s = inv[order], scores[order], docs[order]
        starts = np.concatenate(([0], np.nonzero(k_s[1:] != k_s[:-1])[0] + 1,
                                 [len(k_s)]))
        for a, b in zip(starts[:-1], starts[1:]):
            key = uniq[k_s[a]]
            key = key.item() if hasattr(key, "item") else key
            take = min(b, a + docs_per_group)
            cand = [(float(s_s[i]), int(d_s[i]) + base)
                    for i in range(a, take)]
            cur = groups.get(key)
            if cur is None:
                groups[key] = cand
            else:
                cur.extend(cand)
                cur.sort(key=lambda sg: (-sg[0], sg[1]))
                del cur[docs_per_group:]
    return groups


def _resolve_scoredocs(searcher, pairs):
    """[(score, gid)] -> [ScoreDoc] with (conv_id, turn_idx) resolved by one
    batched docmap take per owning shard."""
    from .searcher import ScoreDoc

    gids = np.array([g for _s, g in pairs], dtype=np.int64)
    pids = np.array([searcher._pid_of(int(g)) for g in gids], dtype=np.int64)
    fields = {}
    for pid in np.unique(pids):
        sel = np.nonzero(pids == pid)[0]
        rdr = searcher.reader(int(pid))
        rows = rdr.lookup_docs(gids[sel] - searcher._bases[int(pid)])
        convs = rows.column("conv_id").to_pylist()
        turns = rows.column("turn_idx").to_pylist()
        for j, i in enumerate(sel):
            fields[int(i)] = (convs[j], int(turns[j]))
    return [ScoreDoc(float(s), int(g), fields[i][0], fields[i][1])
            for i, (s, g) in enumerate(pairs)]


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


def range_grouped_search(searcher, query, field: str, lo: int, width: int,
                         hi: int, n_groups: int = 10,
                         docs_per_group: int = 2):
    """GroupingSearch with a LongRangeGroupSelector: two-pass grouped top-k
    where the group key is the value's LongRangeFactory bucket.  Groups
    ranked by their best doc (score desc, gid asc; ties: lower range
    first), top `docs_per_group` docs per group by (score desc, gid asc).

    Returns [((range_lo, range_hi), best_score, [ScoreDoc, ...])]."""
    def shard_keys(rdr, docs, _scores):
        vals = rdr.docvalue(field)[docs]
        # sortable lo-edge scalar per doc (tuple order == lo-edge order)
        return np.where(vals < lo, LONG_MIN,
                        np.where(vals >= hi, hi,
                                 lo + ((vals - lo) // width) * width))

    groups = _collect_grouped(searcher, query, shard_keys, docs_per_group)

    def tuple_of(edge: int) -> tuple[int, int]:
        if edge == LONG_MIN:
            return (LONG_MIN, lo)
        if edge == hi:
            return (hi, LONG_MAX)
        return (edge, edge + width)

    ranked = sorted(groups.items(),
                    key=lambda kv: (-kv[1][0][0], kv[1][0][1], kv[0]))
    return [(tuple_of(int(edge)), kv[0][0], _resolve_scoredocs(searcher, kv))
            for edge, kv in ranked[:n_groups]]


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

    def shard_keys(rdr, docs, scores):
        env = {}
        for nm in names:
            if nm == "_score":
                env[nm] = scores.astype(np.float64)
            else:
                env[nm] = rdr.docvalue(nm)[docs].astype(np.float64)
        vals = fn(env)
        if vals.shape == ():
            vals = np.full(len(docs), float(vals))
        if range_factory is None:
            return vals
        lo, width, hi = range_factory
        return np.where(vals < lo, -np.inf,
                        np.where(vals >= hi, hi,
                                 lo + ((vals - lo) // width) * width))

    groups = _collect_grouped(searcher, query, shard_keys, docs_per_group)

    def key_of(edge: float):
        if range_factory is None:
            return float(edge)
        lo, width, hi = range_factory
        if edge == -np.inf:
            return (-np.inf, lo)
        if edge == hi:
            return (hi, np.inf)
        return (edge, edge + width)

    ranked = sorted(groups.items(),
                    key=lambda kv: (-kv[1][0][0], kv[1][0][1], kv[0]))
    return [(key_of(edge), kv[0][0], _resolve_scoredocs(searcher, kv))
            for edge, kv in ranked[:n_groups]]


def block_grouped_search(searcher, query, n_groups: int = 10,
                         docs_per_group: int = 2):
    """BlockGroupingCollector: groups ARE the index's contiguous parent
    blocks (one conversation per block under our index sort), so the group
    key needs no field lookup at all — it is the hit's block key.  Groups
    ranked by best doc (score desc, gid asc), `docs_per_group` docs each.

    Returns [(conv_id, best_score, [ScoreDoc, ...])].  Blocks never span
    shards, so each group's candidates come from exactly one shard pass."""
    def shard_keys(rdr, docs, _scores):
        conv = getattr(rdr, "_conv_np", None)
        if conv is None:
            conv = rdr._conv_np = rdr.docmap().column("conv_id") \
                .to_numpy(zero_copy_only=False)
        return conv[docs]

    groups = _collect_grouped(searcher, query, shard_keys, docs_per_group)
    ranked = sorted(groups.items(),
                    key=lambda kv: (-kv[1][0][0], kv[1][0][1]))
    return [(str(cid), kv[0][0], _resolve_scoredocs(searcher, kv))
            for cid, kv in ranked[:n_groups]]


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
