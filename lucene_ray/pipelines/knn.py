"""Similarity search over the `embeddings` table (vec_id, embedding:list<float>).

- :func:`knn_cosine` — brute-force cosine top-k: the query matrix is
  broadcast once (`ray.put`), each map_batches task does one numpy matmul
  per batch and emits only its LOCAL top-k candidates (combiner), so the
  final groupby/sort touches k*n_batches rows, not the corpus.
- :func:`knn_lsh` — the scale path: random-hyperplane LSH bucketing; only
  same-bucket vectors are scored (approximate; recall measured in tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _read_embeddings(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def _query_matrix(sf_dir: str, query_vec_ids: list[int]) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
                      filters=[("vec_id", "in", list(query_vec_ids))])
    order = np.argsort(t.column("vec_id").to_numpy())
    m = np.stack(t.column("embedding").to_pylist())[order].astype(np.float64)
    ids = t.column("vec_id").to_numpy()[order]
    return ids, m


def knn_cosine(sf_dir: str, query_vec_ids=(0, 1, 2), k: int = 10):
    """(query_vec_id, rank, vec_id, cos rounded 4dp) — float64 math so the
    DuckDB list_cosine_similarity oracle matches; self-matches excluded;
    tie-break vec_id asc."""
    import ray

    qids, qm = _query_matrix(sf_dir, list(query_vec_ids))
    qnorm = np.linalg.norm(qm, axis=1)
    ref = ray.put((qids, qm, qnorm))

    def score_batch(batch: pd.DataFrame) -> pd.DataFrame:
        qids, qm, qnorm = ray.get(ref)
        vm = np.stack(batch["embedding"].to_list()).astype(np.float64)
        vnorm = np.linalg.norm(vm, axis=1)
        sims = (vm @ qm.T) / (vnorm[:, None] * qnorm[None, :])
        out = []
        vid = batch["vec_id"].to_numpy()
        for j, q in enumerate(qids):
            s = sims[:, j]
            mask = vid != q
            idx = np.nonzero(mask)[0]
            # local top-k candidates only (combiner before the global sort)
            top = idx[np.lexsort((vid[idx], -s[idx]))[:k]]
            out.append(pd.DataFrame({"query_vec_id": int(q), "vec_id": vid[top],
                                     "cos": s[top]}))
        return pd.concat(out, ignore_index=True)

    cands = (_read_embeddings(sf_dir)
             .map_batches(score_batch, batch_format="pandas", batch_size=4096)
             ).to_pandas()
    cands = cands.sort_values(["query_vec_id", "cos", "vec_id"],
                              ascending=[True, False, True])
    cands["rank"] = cands.groupby("query_vec_id").cumcount() + 1
    out = cands[cands["rank"] <= k].reset_index(drop=True)
    out["cos"] = out["cos"].round(4)
    return out[["query_vec_id", "rank", "vec_id", "cos"]].astype(
        {"query_vec_id": "int64", "rank": "int64", "vec_id": "int64"})


N_PLANES = 6
_PLANES_BY_DIM: dict[int, np.ndarray] = {}


def _planes(dim: int) -> np.ndarray:
    if dim not in _PLANES_BY_DIM:
        _PLANES_BY_DIM[dim] = np.random.default_rng(424242 + dim).normal(size=(N_PLANES, dim))
    return _PLANES_BY_DIM[dim]


def knn_lsh(sf_dir: str, query_vec_ids=(0, 1, 2), k: int = 10):
    """Approximate ANN: random-hyperplane bucket per vector; queries only
    score vectors sharing their bucket (plus Hamming-1 neighbor buckets)."""
    import ray

    qids, qm = _query_matrix(sf_dir, list(query_vec_ids))
    planes = _planes(qm.shape[1])
    qsig = ((qm @ planes.T) > 0).astype(np.uint32)
    qbuckets = (qsig << np.arange(N_PLANES, dtype=np.uint32)).sum(axis=1)
    # multiprobe: bucket + all Hamming-1 and Hamming-2 neighbors
    def neighborhood(b: int) -> set[int]:
        out = {b}
        for i in range(N_PLANES):
            out.add(b ^ (1 << i))
            for j in range(i + 1, N_PLANES):
                out.add(b ^ (1 << i) ^ (1 << j))
        return out

    probe = {int(q): neighborhood(int(b)) for q, b in zip(qids, qbuckets)}
    qnorm = np.linalg.norm(qm, axis=1)
    ref = ray.put((qids, qm, qnorm, probe))

    def score_batch(batch: pd.DataFrame) -> pd.DataFrame:
        qids, qm, qnorm, probe = ray.get(ref)
        vm = np.stack(batch["embedding"].to_list()).astype(np.float64)
        planes = _planes(vm.shape[1])
        sig = ((vm @ planes.T) > 0).astype(np.uint32)
        buckets = (sig << np.arange(N_PLANES, dtype=np.uint32)).sum(axis=1)
        vid = batch["vec_id"].to_numpy()
        vnorm = np.linalg.norm(vm, axis=1)
        out = []
        for j, q in enumerate(qids):
            sel = np.array([int(b) in probe[int(q)] for b in buckets])
            sel &= vid != q
            if not sel.any():
                continue
            idx = np.nonzero(sel)[0]
            s = (vm[idx] @ qm[j]) / (vnorm[idx] * qnorm[j])
            top = np.lexsort((vid[idx], -s))[:k]
            out.append(pd.DataFrame({"query_vec_id": int(q), "vec_id": vid[idx][top],
                                     "cos": s[top]}))
        if not out:
            return pd.DataFrame({"query_vec_id": pd.Series([], dtype="int64"),
                                 "vec_id": pd.Series([], dtype="int64"),
                                 "cos": pd.Series([], dtype="float64")})
        return pd.concat(out, ignore_index=True)

    cands = (_read_embeddings(sf_dir)
             .map_batches(score_batch, batch_format="pandas", batch_size=4096)
             ).to_pandas()
    cands = cands.sort_values(["query_vec_id", "cos", "vec_id"],
                              ascending=[True, False, True])
    cands["rank"] = cands.groupby("query_vec_id").cumcount() + 1
    out = cands[cands["rank"] <= k].reset_index(drop=True)
    out["cos"] = out["cos"].round(4)
    return out[["query_vec_id", "rank", "vec_id", "cos"]].astype(
        {"query_vec_id": "int64", "rank": "int64", "vec_id": "int64"})
