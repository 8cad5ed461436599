"""Percolator / Monitor re-expression (`lucene/monitor/Monitor.java:44,230-254`,
`monitor/Presearcher.java:1-66` + `monitor/QueryIndex.java`): match a STREAM
of documents against a registered set of queries.

The registered queries are compiled ONCE into flat numpy structures over a
shared query-term vocabulary (the QueryIndex role) and broadcast via the
task closure.  Per batch, matching is fully vectorized with no per-row or
per-query Python:

1. tokenize → flat token array + per-doc lengths;
2. (doc, term) presence keys restricted to the query vocabulary
   (searchsorted + unique — the only per-token work);
3. PRESEARCH: each query is indexed by trigger terms (one required term for
   conjunctions — a doc lacking it can never match; every optional term for
   disjunctions).  Candidate (doc, query) pairs come from joining the
   presence keys against the trigger index — queries whose triggers miss
   the doc are never verified (the TermFilteredPresearcher contract);
4. VERIFY: candidates are checked with segmented reductions over the
   presence keys (all required terms present; ≥1 optional when any are
   declared).

Output: one (doc_id, query_id) row per match — map_batches shaped,
streaming, no shuffle.  Cost is O(tokens + candidates), not
O(docs × queries), so 10k registered alert rules stay cheap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .textstats import _flat_tokens_np


def _vocab_codes(flat, vocab_arr: pa.Array):
    """Vocab ids for a flat polars token Series via Arrow ``index_in``
    (zero-copy — no per-token Python-object materialization, the
    classify.py scoring-pass pattern): (codes int64, valid bool) where
    valid marks tokens present in the vocabulary."""
    import pyarrow.compute as pc

    arr = flat.to_arrow()
    idx = pc.index_in(arr, value_set=vocab_arr.cast(arr.type))
    codes = idx.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
    return codes, codes >= 0

# the registered query set (deterministic; mirrored in the SQL oracle)
REGISTERED = [
    {"query_id": "pq-merge-join", "must": ["merge", "join"], "should": []},
    {"query_id": "pq-any-scan-sort", "must": [], "should": ["scan", "sort"]},
    {"query_id": "pq-window-not", "must": ["window"], "should": ["batch", "stream"]},
    {"query_id": "pq-rare", "must": ["vector", "spark"], "should": []},
]


class QueryIndex:
    """Compiled registered-query set (the Monitor QueryIndex role): shared
    sorted vocabulary, per-query required/optional term-id runs, and the
    trigger-term → query inverted index used for presearch."""

    def __init__(self, queries):
        self.query_ids = np.array([q["query_id"] for q in queries], dtype=object)
        vocab = sorted({t for q in queries for t in q["must"] + q["should"]})
        self.vocab = np.array(vocab, dtype=object)
        self.vocab_arr = pa.array(vocab, type=pa.string())
        tid = {t: i for i, t in enumerate(vocab)}
        must_runs = [[tid[t] for t in q["must"]] for q in queries]
        should_runs = [[tid[t] for t in q["should"]] for q in queries]
        self.n_must = np.array([len(r) for r in must_runs], dtype=np.int64)
        self.n_should = np.array([len(r) for r in should_runs], dtype=np.int64)
        self.must_flat = np.array([t for r in must_runs for t in r], dtype=np.int64)
        self.must_off = np.concatenate(([0], np.cumsum(self.n_must)))
        self.should_flat = np.array([t for r in should_runs for t in r], dtype=np.int64)
        self.should_off = np.concatenate(([0], np.cumsum(self.n_should)))
        # trigger index: ONE required term per conjunction (longest = rarity
        # heuristic; any single required term is a sound prescreen), every
        # optional term for pure disjunctions
        trig_t, trig_q = [], []
        for qi, q in enumerate(queries):
            if q["must"]:
                trig_t.append(tid[max(q["must"], key=len)])
                trig_q.append(qi)
            else:
                for t in q["should"]:
                    trig_t.append(tid[t])
                    trig_q.append(qi)
        trig_t = np.array(trig_t, dtype=np.int64)
        trig_q = np.array(trig_q, dtype=np.int64)
        order = np.argsort(trig_t, kind="stable")
        self.trig_t, self.trig_q = trig_t[order], trig_q[order]

    def match_batch(self, doc_ids: np.ndarray, texts):
        """(matched doc_ids, matched query indices) for one batch."""
        V = len(self.vocab)
        flat, lens = _flat_tokens_np(texts)
        code, valid = _vocab_codes(flat, self.vocab_arr)
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        present = np.unique(doc_idx[valid] * V + code[valid])
        if len(present) == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        p_doc, p_term = present // V, present % V
        # presearch: expand each present (doc, trigger-term) into its queries
        lo = np.searchsorted(self.trig_t, p_term, side="left")
        hi = np.searchsorted(self.trig_t, p_term, side="right")
        reps = hi - lo
        hit = reps > 0
        if not hit.any():
            return np.empty(0, np.int64), np.empty(0, np.int64)
        cand_doc = np.repeat(p_doc[hit], reps[hit])
        starts = lo[hit]
        span = np.arange(reps[hit].sum()) - np.repeat(
            np.cumsum(reps[hit]) - reps[hit], reps[hit])
        cand_q = self.trig_q[np.repeat(starts, reps[hit]) + span]
        cand = np.unique(cand_doc * len(self.query_ids) + cand_q)
        cand_doc, cand_q = cand // len(self.query_ids), cand % len(self.query_ids)
        # verify via membership of each candidate's query terms (segmented)
        def _all_present(flat_terms, off, n_terms):
            nm = n_terms[cand_q]
            run = np.repeat(np.arange(len(cand_q)), nm)
            term_pos = np.repeat(off[cand_q], nm) + (
                np.arange(nm.sum()) - np.repeat(np.cumsum(nm) - nm, nm))
            keys = cand_doc[run] * V + flat_terms[term_pos]
            found = present[np.clip(np.searchsorted(present, keys), 0,
                                    len(present) - 1)] == keys
            cnt = np.zeros(len(cand_q), dtype=np.int64)
            np.add.at(cnt, run, found)
            return cnt
        ok = np.ones(len(cand_q), dtype=bool)
        has_must = self.n_must[cand_q] > 0
        if has_must.any():
            ok &= _all_present(self.must_flat, self.must_off,
                               self.n_must) == self.n_must[cand_q]
        has_should = self.n_should[cand_q] > 0
        if has_should.any():
            should_cnt = _all_present(self.should_flat, self.should_off,
                                      self.n_should)
            ok &= (~has_should) | (should_cnt > 0)
        order = np.lexsort((cand_doc[ok], cand_q[ok]))
        return doc_ids[cand_doc[ok][order]], cand_q[ok][order]


def percolate(sf_dir: str, queries=None):
    """(doc_id, query_id) matches of every registered query over documents."""
    from .textstats import _read_documents

    qi = QueryIndex(queries if queries is not None else REGISTERED)

    def match(t: pa.Table) -> pa.Table:
        docs, qidx = qi.match_batch(t.column("doc_id").to_numpy(),
                                    t.column("text"))
        return pa.table({"doc_id": pa.array(docs, type=pa.int64()),
                         "query_id": pa.array(qi.query_ids[qidx],
                                              type=pa.string())})

    return _read_documents(sf_dir).map_batches(match, batch_format="pyarrow")


def trigger_terms(q):
    """TermFilteredPresearcher term extraction
    (`monitor/TermFilteredPresearcher.java:1-280` collectTerms): a set of
    terms such that any matching document must contain AT LEAST ONE, or
    None when the query cannot be prescreened by exact terms (multi-term
    expansions, ranges, match-all — the reference's ANYTOKEN fallback,
    which makes the query a candidate for every document)."""
    from ..search.query import (
        FILTER,
        MUST,
        SHOULD,
        BooleanQuery,
        BoostQuery,
        ConstantScoreQuery,
        IntervalQuery,
        MultiPhraseQuery,
        PhraseQuery,
        SynonymQuery,
        TermInSetQuery,
        TermQuery,
    )

    if isinstance(q, TermQuery):
        return {q.term}
    if isinstance(q, (PhraseQuery, IntervalQuery)):
        # every phrase term is required — one suffices as a trigger; longest
        # is the rarity heuristic the reference uses for minimum-weight terms
        return {max(q.terms, key=lambda t: (len(t), t))}
    if isinstance(q, MultiPhraseQuery):
        # one term per slot is required — trigger on the smallest slot
        slot = min(q.slots, key=len)
        return set(slot)
    if isinstance(q, (SynonymQuery, TermInSetQuery)):
        return set(q.terms)
    if isinstance(q, (BoostQuery, ConstantScoreQuery)):
        return trigger_terms(q.query)
    if isinstance(q, BooleanQuery):
        best = None
        has_required = False
        for c in q.clauses:
            if c.occur in (MUST, FILTER):
                has_required = True
                t = trigger_terms(c.query)
                if t is not None and (best is None or len(t) < len(best)):
                    best = t
        if best is not None:
            return best
        # With required clauses present and none screenable, SHOULD clauses
        # are optional (msm=0): a doc can match via the required clauses
        # alone, so the SHOULD union would be unsound — the reference
        # TermFilteredPresearcher treats this as ANYTOKEN.  Only when the
        # query is pure-SHOULD (or msm>=1 forces a SHOULD hit) is the
        # union of SHOULD triggers a sound prescreen.
        if has_required and q.minimum_should_match < 1:
            return None
        shoulds = [trigger_terms(c.query) for c in q.clauses
                   if c.occur == SHOULD]
        if shoulds and all(s is not None for s in shoulds):
            return set().union(*shoulds)
        return None
    return None


def trigger_prefixes(q):
    """Prefix triggers for queries exact terms cannot prescreen: a list of
    non-empty prefixes such that any matching doc contains a token starting
    with at least one (sound over-approximation — verification prunes).
    None = not derivable (true ANYTOKEN)."""
    from ..search.query import (
        FILTER,
        MUST,
        SHOULD,
        BooleanQuery,
        BoostQuery,
        ConstantScoreQuery,
        FuzzyQuery,
        PrefixQuery,
        WildcardQuery,
    )

    if isinstance(q, PrefixQuery):
        return [q.prefix] if q.prefix else None
    if isinstance(q, WildcardQuery):
        lit = q.pattern.split("*")[0].split("?")[0]
        return [lit] if lit else None
    if isinstance(q, FuzzyQuery):
        return [q.term[:q.prefix_length]] if q.prefix_length > 0 else None
    if isinstance(q, (BoostQuery, ConstantScoreQuery)):
        return trigger_prefixes(q.query)
    if isinstance(q, BooleanQuery):
        best = None
        has_required = False
        for c in q.clauses:
            if c.occur in (MUST, FILTER):
                has_required = True
                ts = trigger_terms(c.query)
                p = list(ts) if ts is not None else trigger_prefixes(c.query)
                if p and (best is None or len(p) < len(best)):
                    best = p
        if best is not None:
            return best
        # Same soundness rule as trigger_terms: required-but-unscreenable
        # clauses mean SHOULD triggers cannot prescreen (ANYTOKEN).
        if has_required and q.minimum_should_match < 1:
            return None
        out = []
        for c in q.clauses:
            if c.occur != SHOULD:
                continue
            ts = trigger_terms(c.query)
            if ts is not None:
                out.extend(ts)          # an exact term is its own prefix
                continue
            p = trigger_prefixes(c.query)
            if not p:
                return None
            out.extend(p)
        return out or None
    return None


def decompose(q) -> set:
    """QueryDecomposer.decompose (`monitor/QueryDecomposer.java:41-59`):
    split a disjunction into its constituent parts so each can be indexed
    and matched separately in the Monitor."""
    from ..search.query import BooleanQuery, BoostQuery, DisjunctionMaxQuery

    if isinstance(q, BooleanQuery):
        return _decompose_boolean(q)
    if isinstance(q, DisjunctionMaxQuery):
        out = set()
        for sub in q.queries:
            out |= decompose(sub)
        return out
    if isinstance(q, BoostQuery):
        # QueryDecomposer.decomposeBoostQuery: boost 1 unwraps, otherwise
        # the boost re-applies to every decomposed part (folded into the
        # part's intrinsic boost field where our AST carries one — the
        # structural twin of the reference's BoostQuery re-wrap)
        if q.boost == 1.0:
            return decompose(q.query)
        import dataclasses as _dc

        out = set()
        for s in decompose(q.query):
            if hasattr(s, "boost") and not isinstance(s, BooleanQuery):
                out.add(_dc.replace(s, boost=s.boost * q.boost))
            else:
                out.add(BoostQuery(s, q.boost))
        return out
    return {q}


def _decompose_boolean(q) -> set:
    """`monitor/QueryDecomposer.java:72-120` decomposeBoolean: only pure
    disjunctions split; >1 mandatory clause (or mandatory + SHOULD mix, or
    msm>1) stays whole; a single mandatory clause with no SHOULDs is
    decomposed in its place; MUST_NOT exclusions re-attach to every part."""
    from ..search.query import (
        FILTER,
        MUST,
        MUST_NOT,
        BooleanClause,
        BooleanQuery,
    )

    if q.minimum_should_match > 1:
        return {q}
    subqueries: set = set()
    exclusions: set = set()
    mandatory: set = set()
    for c in q.clauses:
        if c.occur in (MUST, FILTER):
            mandatory.add(c.query)
        elif c.occur == MUST_NOT:
            exclusions.add(c.query)
        else:
            subqueries |= decompose(c.query)
    if len(mandatory) > 1 or (len(mandatory) == 1 and subqueries):
        return {q}
    if len(mandatory) == 1:
        subqueries |= decompose(next(iter(mandatory)))
    if not exclusions:
        return subqueries
    ex = tuple(BooleanClause(e, MUST_NOT) for e in
               sorted(exclusions, key=repr))
    return {BooleanQuery((BooleanClause(s, MUST),) + ex) for s in subqueries}


class QueryMatch:
    """QueryMatch + metadata handle (`monitor/QueryMatch.java` surface)."""

    __slots__ = ("query_id", "metadata")

    def __init__(self, query_id, metadata=None):
        self.query_id = query_id
        self.metadata = metadata or {}


class MultiMatchingQueries:
    """`monitor/MultiMatchingQueries.java` reporting surface: per-doc
    matches, the batch size, and the number of registered (parent) queries
    the presearcher selected for verification."""

    def __init__(self, per_doc, queries_run: int):
        self._per_doc = per_doc
        self.queries_run = queries_run
        self.batch_size = len(per_doc)

    def match_count(self, doc: int = 0) -> int:
        return len(self._per_doc[doc])

    def matches(self, query_id, doc: int = 0):
        return self._per_doc[doc].get(query_id)

    def get_matches(self, doc: int = 0):
        return list(self._per_doc[doc].values())


# richer registered set exercising the MemoryIndex verification path
def _registered_ast():
    from ..search.query import PhraseQuery, PrefixQuery, bool_query

    return [
        ("pq-ast-phrase", PhraseQuery(("merge", "join"))),
        ("pq-ast-bool", bool_query(must=["merge"], should=["sort", "scan"],
                                   minimum_should_match=1)),
        ("pq-ast-prefix", PrefixQuery("vec")),
        ("pq-ast-not", bool_query(must=["window"], must_not=["batch"])),
    ]


class AstMonitor:
    """Monitor over arbitrary query ASTs (`monitor/Monitor.java:230-254`
    match flow): vectorized trigger-term presearch (QueryIndex role) +
    exact per-candidate verification against a single-doc MemoryIndex
    (`monitor/CandidateMatcher.java` — the reference verifies candidates by
    running the real query against a MemoryIndex of the streamed doc)."""

    def register(self, *entries):
        """Monitor.register(MonitorQuery...) — add (or replace, by id)
        queries and rebuild the trigger index (the reference commits the
        updated QueryIndex the same way).  Entries are (id, query) or
        (id, query, metadata)."""
        current = {qid: (q, self.metadata.get(qid))
                   for qid, q in zip(self.query_ids, self.queries)}
        for e in entries:
            if len(e) == 3:
                qid, q, md = e
            else:
                (qid, q), md = e, None
            current[qid] = (q, md)
        self.__init__([(qid, q, md) for qid, (q, md) in current.items()])

    def delete_by_id(self, *qids):
        """Monitor.deleteById(String...)."""
        drop = set(qids)
        self.__init__([(qid, q, self.metadata.get(qid)) for qid, q in
                       zip(self.query_ids, self.queries) if qid not in drop])

    def clear(self):
        """Monitor.clear()."""
        self.__init__([])

    @property
    def query_count(self) -> int:
        """Monitor.getQueryCount()."""
        return len(self.queries)

    @property
    def disjunct_count(self) -> int:
        """Monitor.getDisjunctCount() — decomposed subqueries indexed."""
        return len(self.sub_queries)

    def __init__(self, registered):
        entries = []
        self.metadata = {}
        for e in registered:
            if len(e) == 3:
                qid, q, md = e
                if md:
                    self.metadata[qid] = md
            else:
                qid, q = e
            entries.append((qid, q))
        self.query_ids = np.array([qid for qid, _ in entries], dtype=object)
        self.queries = [q for _, q in entries]
        # QueryDecomposer: disjunctions are indexed and verified per part
        # (`monitor/Monitor.java:183` register → decomposer.decompose);
        # candidates map back to the parent id and dedupe
        subs: list = []
        parents: list[int] = []
        for pi, q in enumerate(self.queries):
            for s in sorted(decompose(q), key=repr):
                subs.append(s)
                parents.append(pi)
        self.sub_queries = subs
        self.sub_parent = np.array(parents, dtype=np.int64)
        trig = [trigger_terms(s) for s in subs]
        # term-unscreenable subqueries fall back to vectorized prefix
        # triggers before the true ANYTOKEN bucket
        self.prefix_triggers = []
        always = []
        for i, t in enumerate(trig):
            if t is not None:
                continue
            p = trigger_prefixes(subs[i])
            if p:
                self.prefix_triggers.append((i, sorted(set(p))))
            else:
                always.append(i)
        self.always = np.array(always, dtype=np.int64)
        vocab = sorted({t for ts in trig if ts for t in ts})
        self.vocab = np.array(vocab, dtype=object)
        self.vocab_arr = pa.array(vocab, type=pa.string())
        tid = {t: i for i, t in enumerate(vocab)}
        trig_t, trig_q = [], []
        for qi, ts in enumerate(trig):
            for t in (ts or ()):
                trig_t.append(tid[t])
                trig_q.append(qi)
        order = np.argsort(np.array(trig_t, dtype=np.int64), kind="stable")
        self.trig_t = np.array(trig_t, dtype=np.int64)[order]
        self.trig_q = np.array(trig_q, dtype=np.int64)[order]

    def match_batch(self, doc_ids: np.ndarray, texts):
        from ..index.memoryindex import MemoryIndex

        import pyarrow.compute as pc

        V = len(self.vocab)
        flat, lens = _flat_tokens_np(texts)
        n_docs = len(lens)
        flat_arr = flat.to_arrow()              # zero-copy token column
        if V:
            code, valid = _vocab_codes(flat, self.vocab_arr)
        else:
            code = np.empty(0, np.int64)
            valid = np.zeros(len(flat_arr), dtype=bool)
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        present = (np.unique(doc_idx[valid] * max(V, 1) + code[valid])
                   if valid.any() else np.empty(0, np.int64))
        p_doc, p_term = present // max(V, 1), present % max(V, 1)
        lo = np.searchsorted(self.trig_t, p_term, side="left")
        hi = np.searchsorted(self.trig_t, p_term, side="right")
        reps = hi - lo
        pairs = set()
        hit = reps > 0
        if hit.any():
            cand_doc = np.repeat(p_doc[hit], reps[hit])
            starts = lo[hit]
            span = np.arange(reps[hit].sum()) - np.repeat(
                np.cumsum(reps[hit]) - reps[hit], reps[hit])
            cand_q = self.trig_q[np.repeat(starts, reps[hit]) + span]
            pairs.update(zip(cand_doc.tolist(), cand_q.tolist()))
        if self.prefix_triggers and len(flat_arr):
            for qi, prefixes in self.prefix_triggers:
                m = np.zeros(len(flat_arr), dtype=bool)
                for p in prefixes:
                    m |= pc.starts_with(flat_arr, p).to_numpy(
                        zero_copy_only=False)
                for d in np.unique(doc_idx[m]):
                    pairs.add((int(d), int(qi)))
        for qi in self.always:                   # ANYTOKEN queries
            pairs.update((d, int(qi)) for d in range(n_docs))
        # queriesRun: distinct registered (parent) queries selected by the
        # presearcher for this batch (MatchingQueries.getQueriesRun)
        self.last_queries_run = len({int(self.sub_parent[qi])
                                     for _, qi in pairs})
        # exact verification through a per-doc MemoryIndex, built lazily
        # once per doc that has candidates — from the batch's ALREADY
        # tokenized flat arrays (no per-candidate re-analysis).  Each
        # DECOMPOSED part verifies independently (cheaper than the whole
        # parent disjunction); matches dedupe to the parent id.
        starts = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        mems: dict[int, MemoryIndex] = {}
        emitted: set[tuple[int, int]] = set()
        out_d, out_q = [], []
        for d, qi in sorted(pairs):
            parent = int(self.sub_parent[qi])
            if (d, parent) in emitted:
                continue
            m = mems.get(d)
            if m is None:
                # tokens materialize to Python lazily, only for docs that
                # actually have candidates (slice of the Arrow token column)
                m = MemoryIndex.from_tokens(
                    flat_arr.slice(starts[d], lens[d]).to_pylist())
                mems[d] = m
            if m.matches(self.sub_queries[qi]):
                emitted.add((d, parent))
                out_d.append(d)
                out_q.append(parent)
        idx = np.array(out_d, dtype=np.int64)
        qidx = np.array(out_q, dtype=np.int64)
        order = np.lexsort((idx, qidx))
        return doc_ids[idx[order]] if len(idx) else idx, qidx[order]

    def match(self, docs):
        """Monitor.match(Document[], QueryMatch.SIMPLE_MATCHER) convenience
        for small in-hand batches (`monitor/Monitor.java:230-254`): returns
        the MultiMatchingQueries reporting surface.  `docs` is one text or
        a list of texts."""
        texts = [docs] if isinstance(docs, str) else list(docs)
        n = len(texts)
        d, qidx = self.match_batch(
            np.arange(n, dtype=np.int64),
            pa.chunked_array([pa.array(texts, type=pa.string())]))
        per_doc: list[dict] = [{} for _ in range(n)]
        for di, qi in zip(d.tolist(), qidx.tolist()):
            qid = self.query_ids[qi]
            per_doc[di][qid] = QueryMatch(qid, self.metadata.get(qid))
        return MultiMatchingQueries(per_doc, self.last_queries_run)


def percolate_ast(sf_dir: str, registered=None):
    """(doc_id, query_id) matches of AST-registered queries (phrases,
    nested booleans, prefix) — presearch + MemoryIndex verify."""
    from .textstats import _read_documents

    mon = AstMonitor(registered if registered is not None else _registered_ast())

    def match(t: pa.Table) -> pa.Table:
        docs, qidx = mon.match_batch(t.column("doc_id").to_numpy(),
                                     t.column("text"))
        return pa.table({"doc_id": pa.array(docs, type=pa.int64()),
                         "query_id": pa.array(mon.query_ids[qidx],
                                              type=pa.string())})

    return _read_documents(sf_dir).map_batches(match, batch_format="pyarrow")


def percolate_ast_oracle_sql() -> str:
    """DuckDB twin of percolate_ast over the fixed _registered_ast set."""
    phrase = ("' ' || array_to_string(toks, ' ') || ' ' LIKE '% merge join %'")
    return " UNION ALL ".join([
        f"SELECT doc_id, 'pq-ast-phrase' AS query_id FROM toklists WHERE {phrase}",
        "SELECT doc_id, 'pq-ast-bool' AS query_id FROM toklists "
        "WHERE list_contains(toks, 'merge') AND "
        "(list_contains(toks, 'sort') OR list_contains(toks, 'scan'))",
        "SELECT doc_id, 'pq-ast-prefix' AS query_id FROM toklists "
        "WHERE len(list_filter(toks, x -> x LIKE 'vec%')) > 0",
        "SELECT doc_id, 'pq-ast-not' AS query_id FROM toklists "
        "WHERE list_contains(toks, 'window') AND NOT list_contains(toks, 'batch')",
    ])


def percolate_oracle_sql() -> str:
    """DuckDB twin of percolate() over the same registered query set."""
    parts = []
    for q in REGISTERED:
        conds = [f"list_contains(toks, '{t}')" for t in q["must"]]
        if q["should"]:
            conds.append("(" + " OR ".join(
                f"list_contains(toks, '{t}')" for t in q["should"]) + ")")
        parts.append(
            f"SELECT doc_id, '{q['query_id']}' AS query_id FROM toklists "
            f"WHERE {' AND '.join(conds)}")
    return " UNION ALL ".join(parts)
