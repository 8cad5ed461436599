"""Vector search as a first-class index query (SURVEY §2.8 KnnVectorQuery).

The Ray-native re-expression of `search/KnnFloatVectorQuery.java:1-120` +
`codecs/lucene95/Lucene95HnswVectorsFormat.java`: the index build attaches a
per-shard vector store + HNSW graph (built inside each shard's own flush
task from its own partition — never on the driver), and `IndexSearcher` /
the actor pool execute `KnnVectorQuery` per shard (graph search with
live-docs accept mask; exact over the filter's doc set when a filter is
given) and merge TopDocs-style.

Entries:
- :func:`index_knn_filtered` — filtered k-NN (exact path → full SQL oracle).
- :func:`index_knn_topk` — unfiltered per-shard-HNSW k-NN (approximate;
  recall vs brute force is pytest-checked).
- :func:`index_hybrid_rrf` — hybrid BM25 + k-NN via reciprocal-rank fusion
  (both sides exact → full SQL oracle).
- :func:`knn_hnsw` — the persisted-ANN pipeline surface kept from round 2,
  now running through the integrated index path.
"""

from __future__ import annotations

import pandas as pd

from ..index.build import build_index
from ..search.query import KnnVectorQuery, MatchAllDocsQuery, bool_query
from ..search.searcher import IndexSearcher
from ..sources.transcripts import TURNS_PER_CONV, transcripts_with_vectors
from .flagship import bm25_scored_cte, index_dir_for
from .knn import _query_matrix

KNN_QUERY_VEC_IDS = (0, 1, 2)
KNN_K = 10
HYBRID_TERMS = ("merge", "join")
HYBRID_TOPN = 20
HYBRID_QVEC = 0
HYBRID_K = 10
RRF_K = 60                      # the standard RRF constant


def build_vector_index(sf_dir: str, index_dir: str | None = None,
                       target_docs_per_partition: int = 50_000) -> str:
    """Build (or reuse) the vector-enabled transcript index: documents ⋈
    embeddings via the bucketed hash join, then the normal distributed build
    with `vector_col="embedding"` — each shard writes vectors.npy + hnsw.npz
    alongside its postings."""
    index_dir = index_dir or index_dir_for(sf_dir) + "-vec"
    ds = transcripts_with_vectors(sf_dir)
    build_index(ds, index_dir, target_docs_per_partition=target_docs_per_partition,
                keyword_cols=("role",), docvalue_cols=("ts",),
                vector_col="embedding",
                input_desc=f"documents+embeddings@{sf_dir}+vec")
    return index_dir


def _doc_id(hit) -> int:
    """Invert the deterministic transcript mapping back to doc_id."""
    return int(hit.conv_id[5:]) * TURNS_PER_CONV + int(hit.turn_idx)


def _knn_frame(rows) -> pd.DataFrame:
    return pd.DataFrame(rows, columns=["query_vec_id", "rank", "doc_id", "cos"]) \
        .astype({"query_vec_id": "int64", "rank": "int64", "doc_id": "int64"})


def index_knn_filtered(sf_dir: str, query_vec_ids=KNN_QUERY_VEC_IDS,
                       k: int = KNN_K) -> pd.DataFrame:
    """Filtered k-NN through the searcher: top-k by cosine among docs whose
    `role` keyword is 'user' (exact per-shard search over the filter's doc
    set — KnnFloatVectorQuery's exact fallback).  (query_vec_id, rank,
    doc_id, cos 4dp)."""
    from ..index.shard import keyword_term

    searcher = IndexSearcher(build_vector_index(sf_dir))
    qids, qm = _query_matrix(sf_dir, list(query_vec_ids))
    filt = bool_query(filter_=[keyword_term("role", "user")])
    rows = []
    for qid, q in zip(qids, qm):
        td = searcher.search(KnnVectorQuery(tuple(q.tolist()), k=k, filter=filt), k=k)
        for r, h in enumerate(td.hits, 1):
            rows.append((int(qid), r, _doc_id(h), round(float(h.score), 4)))
    return _knn_frame(rows)


def index_knn_filtered_oracle_sql(query_vec_ids=KNN_QUERY_VEC_IDS,
                                  k: int = KNN_K) -> str:
    ids = ",".join(str(i) for i in query_vec_ids)
    # role = 'user' iff doc_id % 4 == 0 (the deterministic transcript adapter)
    return f"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
                   WHERE vec_id IN ({ids})),
        c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 4 = 0),
        sims AS (SELECT q.qid, c.vec_id,
                        list_cosine_similarity(c.embedding::DOUBLE[],
                                               q.qe::DOUBLE[]) AS cos
                 FROM q, c),
        ranked AS (SELECT qid, vec_id, cos,
                          row_number() OVER (PARTITION BY qid
                                             ORDER BY cos DESC, vec_id ASC) AS r
                   FROM sims)
        SELECT qid::BIGINT AS query_vec_id, r::BIGINT AS rank,
               vec_id::BIGINT AS doc_id, round(cos, 4) AS cos
        FROM ranked WHERE r <= {k}
        ORDER BY qid, r"""


def index_knn_topk(sf_dir: str, query_vec_ids=KNN_QUERY_VEC_IDS,
                   k: int = KNN_K) -> pd.DataFrame:
    """Unfiltered k-NN through the per-shard HNSW graphs + TopDocs merge
    (approximate — rows-only at the driver gate; recall vs brute force is
    asserted in pytest).  (query_vec_id, rank, doc_id, cos 4dp)."""
    searcher = IndexSearcher(build_vector_index(sf_dir))
    qids, qm = _query_matrix(sf_dir, list(query_vec_ids))
    rows = []
    for qid, q in zip(qids, qm):
        td = searcher.search(KnnVectorQuery(tuple(q.tolist()), k=k), k=k)
        for r, h in enumerate(td.hits, 1):
            rows.append((int(qid), r, _doc_id(h), round(float(h.score), 4)))
    return _knn_frame(rows)


def knn_hnsw(sf_dir: str, query_vec_ids=KNN_QUERY_VEC_IDS, k: int = KNN_K,
             index_dir: str | None = None) -> pd.DataFrame:
    """Persisted-ANN surface (round-2 `knn_hnsw` shape, self-match excluded):
    (query_vec_id, rank, vec_id, cos 4dp) via the integrated per-shard HNSW
    path — graphs are built by the shard flush tasks and searched through
    `IndexSearcher`, not loaded on the driver."""
    searcher = IndexSearcher(build_vector_index(sf_dir, index_dir))
    qids, qm = _query_matrix(sf_dir, list(query_vec_ids))
    rows = []
    for qid, q in zip(qids, qm):
        td = searcher.search(KnnVectorQuery(tuple(q.tolist()), k=k + 1), k=k + 1)
        hits = [h for h in td.hits if _doc_id(h) != int(qid)][:k]
        for r, h in enumerate(hits, 1):
            rows.append((int(qid), r, _doc_id(h), round(float(h.score), 4)))
    return pd.DataFrame(rows, columns=["query_vec_id", "rank", "vec_id", "cos"]) \
        .astype({"query_vec_id": "int64", "rank": "int64", "vec_id": "int64"})


def index_hybrid_rrf(sf_dir: str, k: int = HYBRID_K) -> pd.DataFrame:
    """Hybrid retrieval: BM25 top-N (terms HYBRID_TERMS) fused with exact
    k-NN top-N (query vector HYBRID_QVEC) by reciprocal-rank fusion
    (rrf = Σ 1/(RRF_K + rank) over the lists containing the doc; Cormack et
    al. 2009 — the standard hybrid-search combiner).  Both sides are exact,
    so the whole entry is SQL-value-checked.  (rank, doc_id, rrf 6dp)."""
    searcher = IndexSearcher(build_vector_index(sf_dir))
    td_b = searcher.search(bool_query(should=list(HYBRID_TERMS)), k=HYBRID_TOPN)
    _, qm = _query_matrix(sf_dir, [HYBRID_QVEC])
    td_k = searcher.search(
        KnnVectorQuery(tuple(qm[0].tolist()), k=HYBRID_TOPN,
                       filter=MatchAllDocsQuery()), k=HYBRID_TOPN)
    rrf: dict[int, float] = {}
    for td in (td_b, td_k):
        for r, h in enumerate(td.hits, 1):
            d = _doc_id(h)
            rrf[d] = rrf.get(d, 0.0) + 1.0 / (RRF_K + r)
    ranked = sorted(rrf.items(), key=lambda x: (-x[1], x[0]))[:k]
    rows = [(r, d, round(s, 6)) for r, (d, s) in enumerate(ranked, 1)]
    return pd.DataFrame(rows, columns=["rank", "doc_id", "rrf"]) \
        .astype({"rank": "int64", "doc_id": "int64"})


def index_hybrid_rrf_oracle_sql(k: int = HYBRID_K) -> str:
    vec_corpus = ("(SELECT d.doc_id, d.text FROM documents d "
                  "JOIN embeddings e ON d.doc_id = e.vec_id)")
    return f"""
        WITH {bm25_scored_cte(HYBRID_TERMS, corpus_sql=vec_corpus)},
        bm AS (SELECT doc_id,
                      row_number() OVER (ORDER BY score DESC, doc_id ASC) AS r
               FROM scored QUALIFY r <= {HYBRID_TOPN}),
        q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {HYBRID_QVEC}),
        kn AS (SELECT e.vec_id AS doc_id,
                      row_number() OVER (
                        ORDER BY list_cosine_similarity(e.embedding::DOUBLE[],
                                                        q.qe::DOUBLE[]) DESC,
                                 e.vec_id ASC) AS r
               FROM embeddings e, q QUALIFY r <= {HYBRID_TOPN}),
        comb AS (SELECT coalesce(bm.doc_id, kn.doc_id) AS doc_id,
                        coalesce(1.0 / ({RRF_K} + bm.r), 0)
                        + coalesce(1.0 / ({RRF_K} + kn.r), 0) AS rrf
                 FROM bm FULL OUTER JOIN kn ON bm.doc_id = kn.doc_id)
        SELECT row_number() OVER (ORDER BY rrf DESC, doc_id ASC)::BIGINT AS rank,
               doc_id::BIGINT AS doc_id, round(rrf, 6) AS rrf
        FROM comb ORDER BY rrf DESC, doc_id ASC LIMIT {k}"""
