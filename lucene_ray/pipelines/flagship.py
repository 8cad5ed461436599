"""Flagship pipeline: transcripts → inverted index → BM25 top-k.

Glues the whole engine together for the driver entry points: synthesize /
adapt the transcript table, build (or reuse) the index under /tmp, run the
reference query set through the actor-pool searcher, and return the results
as a flat table keyed by (query_id, rank, conv_id, turn_idx).
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd

from ..index.build import build_index
from ..search.query import FuzzyQuery, PhraseQuery, PrefixQuery, TermQuery, WildcardQuery, bool_query
from ..search.searcher import IndexSearcher
from ..sources.transcripts import transcripts_from_documents

# the reference query set (FIXTURES.md §2): hot / mid / rare / absent terms
QUERY_SET = [
    ("q-term-hot", bool_query(should=["scan"]), 10),
    ("q-term-mid", bool_query(should=["customer"]), 10),
    ("q-term-rare", bool_query(should=["vector"]), 10),
    ("q-term-absent", bool_query(should=["zzzabsent"]), 10),
    ("q-should", bool_query(should=["merge", "join", "sort"]), 10),
    ("q-must", bool_query(must=["merge", "join"]), 10),
    ("q-mixed", bool_query(must=["scan"], should=["window", "batch"]), 10),
    ("q-filter", bool_query(should=["merge"], filter_=["join"]), 10),
    ("q-mustnot", bool_query(should=["merge"], must_not=["join"]), 10),
    ("q-msm", bool_query(should=["merge", "join", "sort"], minimum_should_match=2), 10),
    ("q-phrase", PhraseQuery(("merge", "join")), 10),
    ("q-prefix", PrefixQuery("sca"), 10),
    ("q-wildcard", WildcardQuery("s*t"), 10),
    ("q-fuzzy", FuzzyQuery("querz", max_edits=1), 10),
]


def index_dir_for(sf_dir: str) -> str:
    h = hashlib.sha256(sf_dir.encode()).hexdigest()[:10]
    return os.path.join("/tmp", "lucene_ray_indexes", h)


def build_transcript_index(sf_dir: str, index_dir: str | None = None,
                           target_docs_per_partition: int = 100_000) -> str:
    """Build (or reuse via checkpoint) the index for sf_dir's documents
    mapped into transcript shape; returns the index directory."""
    index_dir = index_dir or index_dir_for(sf_dir)
    ds = transcripts_from_documents(sf_dir)
    build_index(ds, index_dir, target_docs_per_partition=target_docs_per_partition,
                input_desc=f"documents@{sf_dir}")
    return index_dir


def index_bm25_topk(sf_dir: str, use_actors: bool = False) -> pd.DataFrame:
    """Run the reference query set; (query_id, rank, conv_id, turn_idx, score)."""
    index_dir = build_transcript_index(sf_dir)
    if use_actors:
        from ..search.actors import QueryService

        svc = QueryService(index_dir, num_actors=4)
        search = svc.search
    else:
        searcher = IndexSearcher(index_dir)
        search = searcher.search
    rows = []
    for qid, q, k in QUERY_SET:
        td = search(q, k=k)
        for rank, h in enumerate(td.hits, 1):
            rows.append((qid, rank, h.conv_id, h.turn_idx, float(h.score)))
    if use_actors:
        svc.shutdown()
    return pd.DataFrame(rows, columns=["query_id", "rank", "conv_id", "turn_idx", "score"])


def index_term_dictionary(sf_dir: str) -> pd.DataFrame:
    """Global merged term statistics from the index (term, df, ttf) — the
    groupby-on-term shuffle output, SQL-checkable against tokenizing
    documents (ASCII corpus: StandardAnalyzer == simple tokenizer)."""
    import glob

    import pyarrow.parquet as pq

    index_dir = build_transcript_index(sf_dir)
    parts = sorted(glob.glob(os.path.join(index_dir, "term_stats", "*.parquet")))
    df = pd.concat([pq.read_table(p).to_pandas() for p in parts], ignore_index=True)
    return df.sort_values("term").reset_index(drop=True)[["term", "df", "ttf"]]
