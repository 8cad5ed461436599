"""Index-free distributed BM25 scan (SQL-checkable twin of the engine).

Scores documents for a fixed term set with the classic two-pass pattern:
pass 1 aggregates the tiny global stats (doc count, total tokens, per-term
docFreq) with per-batch partials; pass 2 broadcasts those stats and scores
every batch vectorized, emitting only local top-k candidates.

Uses the SIMPLE tokenizer and float64 math with the formula written exactly
as the DuckDB oracle writes it:

    idf   = ln(1 + (N - df + 0.5) / (df + 0.5))
    score = sum_t idf_t * tf_t / (tf_t + k1 * (1 - b + b * dl / avgdl))

(the Lucene 9+ BM25 shape without the (k1+1) numerator —
`BM25Similarity.java:240-252` — but unquantized float64, so SQL can
reproduce it bit-for-bit modulo rounding to 4dp).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .textstats import _flat_tokens_np, _read_documents, _seg_sum

K1 = 1.2
B = 0.75


def bm25_scan_topk(sf_dir: str, terms=("merge", "join"), k: int = 20):
    """(rank, doc_id, score rounded 4dp) for a fixed OR-of-terms query."""
    import ray

    terms = list(terms)

    # ---- pass 1: global stats via per-batch partials + driver sum ----
    def partial_stats(t_in: pa.Table) -> pa.Table:
        flat, lens = _flat_tokens_np(t_in.column("text"))
        row = {"n_docs": [t_in.num_rows], "n_tokens": [int(lens.sum())]}
        for t in terms:
            row[f"df_{t}"] = [int((_seg_sum((flat == t).to_numpy(), lens) > 0).sum())]
        return pa.table(row)

    stats = (_read_documents(sf_dir)
             .map_batches(partial_stats, batch_format="pyarrow")
             .sum(["n_docs", "n_tokens"] + [f"df_{t}" for t in terms]))
    n_docs = int(stats["sum(n_docs)"])
    avgdl = stats["sum(n_tokens)"] / n_docs
    idf = {t: float(np.log(1 + (n_docs - stats[f"sum(df_{t})"] + 0.5)
                           / (stats[f"sum(df_{t})"] + 0.5))) for t in terms}
    ref = ray.put((idf, avgdl))

    # ---- pass 2: broadcast stats, score every batch, local top-k ----
    def score_batch(t_in: pa.Table) -> pa.Table:
        idf, avgdl = ray.get(ref)
        flat, lens = _flat_tokens_np(t_in.column("text"))
        dl = lens.astype(np.float64)
        score = np.zeros(t_in.num_rows, dtype=np.float64)
        matched = np.zeros(t_in.num_rows, dtype=bool)
        for t in terms:
            tf = _seg_sum((flat == t).to_numpy(), lens).astype(np.float64)
            hit = tf > 0
            matched |= hit
            denom = tf + K1 * (1 - B + B * dl / avgdl)
            score = np.where(hit, score + idf[t] * tf / denom, score)
        ids = t_in.column("doc_id").to_numpy()[matched]
        sc = score[matched]
        top = np.lexsort((ids, -sc))[:k]
        return pa.table({"doc_id": pa.array(ids[top]), "score": pa.array(sc[top])})

    cands = (_read_documents(sf_dir)
             .map_batches(score_batch, batch_format="pyarrow")).to_pandas()
    cands = cands.sort_values(["score", "doc_id"], ascending=[False, True]).head(k)
    cands = cands.reset_index(drop=True)
    cands["rank"] = np.arange(1, len(cands) + 1, dtype="int64")
    cands["score"] = cands["score"].round(4)
    return cands[["rank", "doc_id", "score"]].astype({"doc_id": "int64"})


def bm25_scan_count(sf_dir: str, must=("merge", "join"), must_not=()):
    """Boolean count: docs containing ALL of `must` and NONE of `must_not`."""
    must, must_not = list(must), list(must_not)

    def partial(t_in: pa.Table) -> pa.Table:
        flat, lens = _flat_tokens_np(t_in.column("text"))
        ok = np.ones(t_in.num_rows, dtype=bool)
        for t in must:
            ok &= _seg_sum((flat == t).to_numpy(), lens) > 0
        for t in must_not:
            ok &= ~(_seg_sum((flat == t).to_numpy(), lens) > 0)
        return pa.table({"n": [int(ok.sum())]})

    total = (_read_documents(sf_dir)
             .map_batches(partial, batch_format="pyarrow").sum("n"))
    import pandas as pd

    return pd.DataFrame({"n_matching": [int(total)]})
