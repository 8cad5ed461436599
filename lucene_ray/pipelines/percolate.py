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
        flat_np = flat.to_numpy().astype(object)
        code = np.searchsorted(self.vocab, flat_np)
        valid = code < V
        if valid.any():
            valid[valid] = self.vocab[code[valid]] == flat_np[valid]
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
