"""Query-time join — `JoinUtil.createJoinQuery` analogue.

Reference surface: `lucene/join/src/java/org/apache/lucene/search/join/
JoinUtil.java` (createJoinQuery, single-valued / doc-values path),
`ScoreMode.java` (None | Avg | Max | Total | Min),
`TermsIncludingScoreQuery.java` (the scored to-side rewrite) and
`TermsQuery.java` / `DocValuesTermsCollector.java` (the unscored path).

Semantics (matching the reference):

1. FROM pass — run ``from_query``; for every matching (live) doc collect its
   single-valued ``from_field`` value together with the hit's score.
2. Aggregate per distinct value according to ``score_mode``:
   none → membership only; max / min / total → that reduction of the
   from-side scores; avg → total / count (GlobalOrdinalsWithScoreCollector
   semantics).
3. TO pass — match every live doc whose ``to_field`` equals one of the
   collected values; the hit's score is the value's aggregated from-side
   score (constant 1.0 for ``none``, the reference's TermsQuery →
   ConstantScoreQuery rewrite).

Scale shape: the from-side aggregate is bounded by the number of DISTINCT
join values among the matches (not by corpus size) and is the only state
shipped between the two passes — the exact broadcast-small-side pattern.
Both passes are per-shard vectorized scans (postings for the from query,
one Arrow ``index_in`` over the to-field doc-values column for the to
pass); on the actor pool each shard's pass runs where its mmap lives.
Join fields resolve from the shard docmap (our doc-values store), so both
string and numeric single-valued fields join without a stored-field fetch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SCORE_MODES = ("none", "max", "min", "total", "avg")


def _shard_aggregate(values: np.ndarray, scores: np.ndarray):
    """Per-shard sufficient statistics: (unique values, max, min, sum,
    count) — every ScoreMode folds from these, so only O(distinct keys)
    ever leaves a shard (not O(matches))."""
    uniq, inverse = np.unique(values, return_inverse=True)
    n = len(uniq)
    mx = np.full(n, -np.inf)
    np.maximum.at(mx, inverse, scores)
    mn = np.full(n, np.inf)
    np.minimum.at(mn, inverse, scores)
    sm = np.zeros(n)
    np.add.at(sm, inverse, scores)
    cnt = np.bincount(inverse, minlength=n).astype(np.int64)
    return uniq, mx, mn, sm, cnt


def _from_pass(searcher, from_query, from_field: str):
    """From-side collection, aggregated INSIDE each shard's pass (the
    map-side combine): returns per-shard (uniq, max, min, sum, count)
    tuples bounded by the shard's distinct join keys."""
    compiled = searcher.compile(from_query)
    parts = []
    for pid in searcher._pids:
        rdr = searcher.reader(pid)
        scores, local_docs, _total, _rel = searcher.search_shard(
            rdr, compiled, rdr.doc_count, total_hits_threshold=2**31 - 1)
        if not len(local_docs):
            continue
        col = rdr.docmap().column(from_field)
        if pa.types.is_timestamp(col.type):
            col = pc.cast(col, pa.int64())
        taken = np.asarray(col.take(pa.array(local_docs, type=pa.int64())))
        parts.append(_shard_aggregate(taken, scores.astype(np.float64)))
    return parts


def _aggregate(parts, score_mode: str):
    """Merge per-shard sufficient statistics into (unique values,
    per-value score) under the ScoreMode."""
    values = np.concatenate([p[0] for p in parts])
    uniq, inverse = np.unique(values, return_inverse=True)
    n = len(uniq)
    if score_mode == "none":
        return uniq, np.ones(n, np.float64)
    mx = np.full(n, -np.inf)
    mn = np.full(n, np.inf)
    sm = np.zeros(n)
    cnt = np.zeros(n, np.int64)
    off = 0
    for u, pmx, pmn, psm, pcnt in parts:
        idx = inverse[off:off + len(u)]
        off += len(u)
        np.maximum.at(mx, idx, pmx)
        np.minimum.at(mn, idx, pmn)
        np.add.at(sm, idx, psm)
        np.add.at(cnt, idx, pcnt)
    if score_mode == "max":
        return uniq, mx
    if score_mode == "min":
        return uniq, mn
    if score_mode == "total":
        return uniq, sm
    return uniq, sm / np.maximum(cnt, 1)           # avg


def join_search(searcher, from_query, from_field: str, to_field: str,
                score_mode: str = "none", k: int = 10):
    """JoinUtil.createJoinQuery + IndexSearcher.search in one call: join
    from docs matching `from_query` (via their `from_field` value) to docs
    whose `to_field` carries one of the collected values.  Returns a
    TopDocs of the to side, scored per `score_mode`."""
    if score_mode not in SCORE_MODES:
        raise ValueError(f"score_mode must be one of {SCORE_MODES}")
    parts = _from_pass(searcher, from_query, from_field)
    if not parts:
        from .searcher import TopDocs
        return TopDocs([], 0, "EQ")
    uniq, agg = _aggregate(parts, score_mode)
    value_set = pa.array(uniq)
    agg32 = agg.astype(np.float32)

    per_shard = []
    for pid in searcher._pids:
        rdr = searcher.reader(pid)
        col = rdr.docmap().column(to_field)
        if pa.types.is_timestamp(col.type):
            col = pc.cast(col, pa.int64())
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        idx = pc.index_in(col, value_set=value_set)
        idx_np = idx.to_numpy(zero_copy_only=False)
        mask = ~np.isnan(idx_np) if idx_np.dtype.kind == "f" \
            else idx.is_valid().to_numpy(zero_copy_only=False)
        if rdr.deleted is not None:
            mask = mask & ~rdr.deleted
        docs = np.nonzero(mask)[0].astype(np.int32)
        if not len(docs):
            per_shard.append((pid, rdr, (np.zeros(0, np.float32),
                                         np.zeros(0, np.int32), 0, "EQ")))
            continue
        doc_scores = agg32[idx_np[docs].astype(np.int64)]
        order = np.lexsort((docs, -doc_scores))[:k]
        per_shard.append((pid, rdr, (doc_scores[order], docs[order],
                                     int(len(docs)), "EQ")))
    return searcher._merge(per_shard, k)
