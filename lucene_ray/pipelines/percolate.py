"""Percolator / Monitor re-expression (`lucene/monitor/Monitor.java:44,230-254`):
match a STREAM of documents against a registered set of queries.

The registered queries are compiled once (term sets), broadcast via the task
closure, and every batch is evaluated vectorized: a doc matches a query iff
it contains all MUST terms and (if any SHOULD terms are declared) at least
one SHOULD term.  Output: one (doc_id, query_id) row per match — flat_map
shaped, streaming, no shuffle.
"""

from __future__ import annotations

import pandas as pd

from .textstats import _read_documents, _tokens_series

# the registered query set (deterministic; mirrored in the SQL oracle)
REGISTERED = [
    {"query_id": "pq-merge-join", "must": ["merge", "join"], "should": []},
    {"query_id": "pq-any-scan-sort", "must": [], "should": ["scan", "sort"]},
    {"query_id": "pq-window-not", "must": ["window"], "should": ["batch", "stream"]},
    {"query_id": "pq-rare", "must": ["vector", "spark"], "should": []},
]


def percolate(sf_dir: str, queries=None):
    """(doc_id, query_id) matches of every registered query over documents."""
    queries = queries if queries is not None else REGISTERED

    def match(df: pd.DataFrame) -> pd.DataFrame:
        toks = _tokens_series(df["text"]).map(set)
        out_doc, out_q = [], []
        for q in queries:
            must, should = q["must"], q["should"]
            hit = toks.map(lambda t, m=must, s=should:
                           all(x in t for x in m) and (not s or any(x in t for x in s)))
            ids = df["doc_id"][hit.to_numpy()]
            out_doc.extend(ids.tolist())
            out_q.extend([q["query_id"]] * len(ids))
        return pd.DataFrame({"doc_id": pd.Series(out_doc, dtype="int64"),
                             "query_id": pd.Series(out_q, dtype="object")})

    return _read_documents(sf_dir).map_batches(match, batch_format="pandas")


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
