"""NRT utility surface: SearcherManager + LiveFieldValues
(`search/SearcherManager.java`, `search/ReferenceManager.java` listener
contract, `search/LiveFieldValues.java:17-130`).

`SearcherManager` owns one `IndexSearcher` and re-opens it on
`maybe_refresh()` (openIfChanged), firing RefreshListener callbacks
around the swap.  `LiveFieldValues` rides those callbacks to answer
"what is the CURRENT value of field X for id Y" for ids updated since
the last reopen — the double-buffer (current/old) prune protocol of the
reference: writes go to `current`; a refresh moves `current` → `old`
(lookups consult both while the reopen is in flight) and clears `old`
once the new searcher is visible, after which lookups fall through to
the index."""

from __future__ import annotations


class SearcherManager:
    """Single-owner manager over an IndexSearcher (the Ray-serving analogue
    holds one per query actor; actors refresh independently —
    `search/actors.py QueryService.refresh`)."""

    def __init__(self, searcher):
        self.searcher = searcher
        self._listeners: list = []

    def acquire(self):
        return self.searcher

    def release(self, searcher) -> None:
        pass                    # single-process: nothing to ref-count

    def add_listener(self, listener) -> None:
        self._listeners.append(listener)

    def remove_listener(self, listener) -> None:
        self._listeners.remove(listener)

    def maybe_refresh(self) -> bool:
        """openIfChanged + listener protocol (`ReferenceManager.java`
        doMaybeRefresh: beforeRefresh, swap, afterRefresh(didRefresh))."""
        for li in self._listeners:
            li.before_refresh()
        did = self.searcher.refresh()
        for li in self._listeners:
            li.after_refresh(did)
        return did


_MISSING = object()


class LiveFieldValues:
    """`search/LiveFieldValues.java`: tracks live field values across NRT
    reopens.  `lookup_from_searcher(searcher, id)` resolves ids that have
    already been flushed and reopened (doc values / stored fields)."""

    def __init__(self, manager: SearcherManager, missing_value,
                 lookup_from_searcher):
        self.manager = manager
        self.missing_value = missing_value
        self._lookup = lookup_from_searcher
        self._current: dict = {}
        self._old: dict = {}
        manager.add_listener(self)

    def close(self) -> None:
        self.manager.remove_listener(self)

    # -- RefreshListener ----------------------------------------------------

    def before_refresh(self) -> None:
        # updates arriving during the reopen go to the fresh map; lookups
        # still see the in-flight ones through `old`
        self._old = self._current
        self._current = {}

    def after_refresh(self, did_refresh: bool) -> None:
        # the old values are now visible via the reopened searcher (or were
        # already visible when did_refresh is False) — safe to drop
        self._old = {}

    # -- API ------------------------------------------------------------------

    def add(self, id_, value) -> None:
        """Record the value just written for `id_`."""
        self._current[id_] = value

    def delete(self, id_) -> None:
        """Record that `id_` was just deleted."""
        self._current[id_] = self.missing_value

    def size(self) -> int:
        return len(self._current) + len(self._old)

    def get(self, id_):
        """Live value for `id_`, or None when deleted / absent."""
        value = self._current.get(id_, _MISSING)
        if value is not _MISSING:
            return None if value == self.missing_value else value
        value = self._old.get(id_, _MISSING)
        if value is not _MISSING:
            return None if value == self.missing_value else value
        s = self.manager.acquire()
        try:
            return self._lookup(s, id_)
        finally:
            self.manager.release(s)


# ---------------------------------------------------------------------------
# Rescorers (`search/Rescorer.java`, `QueryRescorer.java:17-192`,
# `SortRescorer.java`)
# ---------------------------------------------------------------------------


class QueryRescorer:
    """Second-pass re-scoring of first-pass hits with another query
    (`search/QueryRescorer.java`): `combine(first, second_matches,
    second_score)` merges the two passes; hits the second query misses
    keep only their combined-with-zero score.  Executes ONE vectorized
    evaluation of the second query per shard holding candidates — the
    analogue of the reference's per-segment scorer advance."""

    def __init__(self, query, combine=None):
        self.query = query
        self.combine = combine or (
            lambda first, matches, second: first + second if matches
            else first)

    def rescore(self, searcher, top_docs, top_n: int):
        import numpy as np

        from .searcher import ScoreDoc, TopDocs

        hits = list(top_docs.hits)
        if not hits:
            return TopDocs([], top_docs.total_hits, top_docs.relation)
        want = {h.gid for h in hits}
        compiled = searcher.compile(self.query)
        second: dict[int, float] = {}
        for pid in searcher._pids:
            base = searcher._bases[pid]
            rdr = searcher.reader(pid)
            lo, hi = base, base + rdr.doc_count
            if not any(lo <= g < hi for g in want):
                continue
            sc, docs, _, _ = searcher.search_shard(
                rdr, compiled, rdr.doc_count,
                total_hits_threshold=2**31 - 1)
            for s, d in zip(sc, docs):
                g = base + int(d)
                if g in want:
                    second[g] = float(s)
        out = []
        for h in hits:
            if h.gid in second:
                ns = self.combine(h.score, True, second[h.gid])
            else:
                ns = self.combine(h.score, False, 0.0)
            out.append(ScoreDoc(float(np.float32(ns)), h.gid, h.conv_id,
                                h.turn_idx, h.fields))
        out.sort(key=lambda h: (-h.score, h.gid))
        return TopDocs(out[:top_n], top_docs.total_hits, top_docs.relation)

    @staticmethod
    def rescore_linear(searcher, top_docs, query, weight: float,
                       top_n: int):
        """The reference's sugar API: first + weight * second."""
        return QueryRescorer(
            query,
            combine=lambda first, matches, second:
            first + weight * second if matches else first
        ).rescore(searcher, top_docs, top_n)


class SortRescorer:
    """Re-sort first-pass hits by a SortField (`search/SortRescorer.java`);
    first-pass scores are preserved on the hits (the reference's
    setScorer-captured scores)."""

    def __init__(self, sort):
        self.sort = sort

    def rescore(self, searcher, top_docs, top_n: int):
        from .searcher import ScoreDoc, TopDocs

        hits = list(top_docs.hits)
        if not hits:
            return top_docs
        field, reverse = self.sort.field, self.sort.reverse
        vals = {}
        for pid in searcher._pids:
            base = searcher._bases[pid]
            rdr = searcher.reader(pid)
            lo, hi = base, base + rdr.doc_count
            local = [h.gid - base for h in hits if lo <= h.gid < hi]
            if not local:
                continue
            dv = rdr.docvalue(field)
            for d in local:
                vals[base + d] = int(dv[d])
        out = [ScoreDoc(h.score, h.gid, h.conv_id, h.turn_idx,
                        (vals.get(h.gid, 0),)) for h in hits]
        out.sort(key=lambda h: (-h.fields[0] if reverse else h.fields[0],
                                h.gid))
        return TopDocs(out[:top_n], top_docs.total_hits, top_docs.relation)


class ExpressionRescorer:
    """Second-pass re-ranking by a scoring expression
    (`expressions/ExpressionRescorer.java`): functionally SortRescorer over
    ``Sort(expression.getSortField(bindings, reverse=True))`` — hits re-sort
    descending by the expression value, which may bind ``_score`` (the
    first-pass score, the reference's DoubleValuesSource.SCORES binding),
    doc-value fields, and the ``tf:/df:/idf:``-style term-stat sources.
    First-pass scores are preserved on the hits (SortRescorer semantics);
    the expression value rides ``fields[0]`` like a FieldDoc sort value.
    Evaluation is one vectorized pass per shard holding candidates."""

    def __init__(self, expression: str):
        self.expression = expression

    def rescore(self, searcher, top_docs, top_n: int):
        import numpy as np

        from .searcher import IndexSearcher, ScoreDoc, TopDocs

        hits = list(top_docs.hits)
        if not hits:
            return top_docs
        ev = IndexSearcher._EXPR_CACHE.get(self.expression)
        if ev is None:
            from .expressions import compile_expression

            ev = IndexSearcher._EXPR_CACHE[self.expression] = \
                compile_expression(self.expression)
        fn, names = ev
        vals: dict[int, float] = {}
        for pid in searcher._pids:
            base = searcher._bases[pid]
            rdr = searcher.reader(pid)
            local = [h for h in hits
                     if base <= h.gid < base + rdr.doc_count]
            if not local:
                continue
            docs = np.array([h.gid - base for h in local], dtype=np.int32)
            env = {}
            for n in names:
                if n == "_score":
                    env[n] = np.array([h.score for h in local],
                                      dtype=np.float64)
                elif ":" in n:
                    env[n] = searcher._term_stat_value(rdr, n, docs)
                else:
                    env[n] = rdr.docvalue(n)[docs].astype(np.float64)
            v = fn(env)
            if v.shape == ():               # constant expression
                v = np.full(len(docs), float(v))
            for h, x in zip(local, v):
                vals[h.gid] = float(x)
        out = [ScoreDoc(h.score, h.gid, h.conv_id, h.turn_idx,
                        (vals.get(h.gid, 0.0),)) for h in hits]
        out.sort(key=lambda h: (-h.fields[0], h.gid))
        return TopDocs(out[:top_n], top_docs.total_hits, top_docs.relation)


# ---------------------------------------------------------------------------
# SearcherLifetimeManager (`search/SearcherLifetimeManager.java`)
# ---------------------------------------------------------------------------


class SearcherLifetimeManager:
    """Keeps old searcher views alive so follow-on actions (paging,
    drill-down) run against the SAME point-in-time view the user saw:
    `record` a searcher → token; `acquire(token)` returns that exact view
    or None when pruned; `prune(PruneByAge(sec))` drops stale ones.
    Tokens key on the commit generation — this engine's generations are
    immutable directory sets, so an old view stays valid as long as its
    commit is retained (manifest snapshot/prune policy)."""

    def __init__(self, clock=None):
        import time as _t

        self._clock = clock or _t.monotonic
        self._searchers: dict[int, tuple[object, float]] = {}
        self._closed = False

    def record(self, searcher) -> int:
        if self._closed:
            raise RuntimeError("this SearcherLifetimeManager is closed")
        token = int(searcher.commit["generation"])
        if token not in self._searchers:
            self._searchers[token] = (searcher, self._clock())
        return token

    def acquire(self, token: int):
        got = self._searchers.get(int(token))
        return got[0] if got is not None else None

    def release(self, searcher) -> None:
        pass                    # single-process: nothing to ref-count

    class PruneByAge:
        def __init__(self, max_age_sec: float):
            if max_age_sec < 0:
                raise ValueError("maxAgeSec must be > 0")
            self.max_age_sec = max_age_sec

        def do_prune(self, age_sec: float, searcher) -> bool:
            return age_sec > self.max_age_sec

    def prune(self, pruner) -> None:
        now = self._clock()
        for token in list(self._searchers):
            s, t0 = self._searchers[token]
            if pruner.do_prune(now - t0, s):
                del self._searchers[token]

    def close(self) -> None:
        self._closed = True
        self._searchers.clear()
