"""Driver-facing suggester pipeline: build an AnalyzingSuggester store over
the documents table (surface = text, weight = n_chars) and run a prefix
lookup.  SQL-checkable: the analyzed key is the \\x1f-joined token stream,
which DuckDB reproduces with regexp tokenization on this ASCII corpus."""

from __future__ import annotations

import os

import pyarrow as pa

from ..search.suggest import MANIFEST, Suggester, build_suggester

CACHE_ROOT = "/tmp/lucene_ray_indexes"


def _store_dir(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    d = os.path.join(CACHE_ROOT, f"suggest_{tag}")
    if not os.path.exists(os.path.join(d, MANIFEST)):
        import ray.data

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["text", "n_chars"])
        build_suggester(ds, d, text_col="text", weight_col="n_chars")
    return d


def suggest_analyzing(sf_dir: str, prefix: str = "merge",
                      k: int = 10) -> pa.Table:
    """Top-k completions of `prefix` by weight desc, key asc (exactFirst
    off so the ordering is pure-SQL-expressible)."""
    s = Suggester(_store_dir(sf_dir))
    got = s.lookup(prefix, k, exact_first=False)
    return pa.table({
        "surface": pa.array([g[0] for g in got], type=pa.string()),
        "weight": pa.array([g[1] for g in got], type=pa.int64()),
    })


def suggest_fuzzy(sf_dir: str, query: str = "mergw",
                  k: int = 10) -> pa.Table:
    """FuzzySuggester lookup (maxEdits=1 past the first char)."""
    s = Suggester(_store_dir(sf_dir))
    got = s.lookup_fuzzy(query, k)
    return pa.table({
        "surface": pa.array([g[0] for g in got], type=pa.string()),
        "weight": pa.array([g[1] for g in got], type=pa.int64()),
    })
