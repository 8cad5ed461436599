"""Query profiler — `sandbox/.../search/QueryProfilerIndexSearcher.java` /
`QueryProfilerTree.java` / `QueryProfilerResult.java` surface.

The reference wraps Weights/Scorers and accrues per-node nanosecond
counters (QueryProfilerTimingType: CREATE_WEIGHT, BUILD_SCORER, NEXT_DOC,
SCORE, ...) during one execution.  Our execution is vectorized per shard
rather than iterator-per-node, so the faithful mapping is per-PHASE
counters on each profiled node:

- ``rewrite``       — analyzer-chain query normalization (Query.rewrite)
- ``create_weight`` — compile(): stats lookups + per-clause scorer setup
- ``search``        — per-shard execution (seek + decode + score), with a
  per-shard breakdown in ``shards``
- ``merge``         — cross-shard TopDocs merge

The node tree mirrors the query tree (type = class name, description =
repr).  DIVERGENCE (documented): child nodes are profiled by standalone
re-execution of the sub-query — the reference attributes in-flight time to
tree nodes via wrapped scorers, which a batch engine has no analogue for.
Root-node numbers are the true cost of the profiled query.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class ProfilerResult:
    type: str
    description: str
    breakdown: dict
    total_ns: int
    shards: list = field(default_factory=list)
    children: list = field(default_factory=list)

    def to_dict(self) -> dict:
        return {"type": self.type, "description": self.description,
                "breakdown": dict(self.breakdown),
                "total_ns": self.total_ns,
                "shards": list(self.shards),
                "children": [c.to_dict() for c in self.children]}


def _sub_queries(query):
    """One level of query-tree children (QueryVisitor.getSubVisitor order)."""
    from .query import (
        BooleanQuery,
        BoostQuery,
        ConstantScoreQuery,
        DisjunctionMaxQuery,
        FunctionScoreQuery,
        ToChildBlockJoinQuery,
        ToParentBlockJoinQuery,
    )

    if isinstance(query, BooleanQuery):
        return [c.query for c in query.clauses]
    if isinstance(query, DisjunctionMaxQuery):
        return list(query.queries)
    if isinstance(query, (BoostQuery, ConstantScoreQuery)):
        return [query.query]
    if isinstance(query, FunctionScoreQuery):
        return [query.query]
    if isinstance(query, ToParentBlockJoinQuery):
        return [query.child]
    if isinstance(query, ToChildBlockJoinQuery):
        return [query.parent]
    return []


def _profile_one(searcher, query, k, total_hits_threshold) -> tuple:
    ns = time.perf_counter_ns
    t0 = ns()
    normalized = searcher._normalize(query)
    t1 = ns()
    compiled = searcher.compile(normalized, _normalized=True)
    t2 = ns()
    per_shard = []
    shard_rows = []
    if searcher.query_cache is not None:
        searcher.query_cache.begin_search()
    for pid in searcher._pids:
        rdr = searcher.reader(pid)
        s0 = ns()
        res = searcher.search_shard(rdr, compiled, k,
                                    total_hits_threshold=total_hits_threshold)
        s1 = ns()
        per_shard.append((pid, rdr, res))
        shard_rows.append({"shard": pid, "ns": s1 - s0,
                           "hits": int(res[2])})
    t3 = ns()
    td = searcher._merge(per_shard, k)
    t4 = ns()
    breakdown = {"rewrite": t1 - t0, "create_weight": t2 - t1,
                 "search": t3 - t2, "merge": t4 - t3}
    return td, breakdown, shard_rows, t4 - t0


def profile_search(searcher, query, k: int = 10,
                   total_hits_threshold: int = 1000,
                   max_depth: int = 3):
    """Profiled IndexSearcher.search: returns (TopDocs, ProfilerResult).
    The TopDocs is identical to an unprofiled search of the same query."""
    td, breakdown, shard_rows, total = _profile_one(
        searcher, query, k, total_hits_threshold)
    root = ProfilerResult(type(query).__name__, repr(query), breakdown,
                          total, shard_rows)
    if max_depth > 0:
        for sub in _sub_queries(query):
            _std, child = profile_search(searcher, sub, k,
                                         total_hits_threshold,
                                         max_depth=max_depth - 1)
            root.children.append(child)
    return td, root
