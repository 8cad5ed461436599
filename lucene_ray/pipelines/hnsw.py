"""HNSW approximate-nearest-neighbor graphs over the `embeddings` table.

The persisted-ANN-index role of the reference's per-segment vector format
(`codecs/lucene95/Lucene95HnswVectorsFormat.java:99`,
`util/hnsw/HnswGraphBuilder.java` / `HnswGraphSearcher.java`), re-expressed
Ray-native: embeddings are partitioned into shards, one HNSW graph is built
PER SHARD in parallel Ray tasks (the per-segment graph model), each graph is
persisted (npz: flat neighbor arrays per level + vectors), and a query
searches every shard graph and merges top-k exactly like TopDocs.merge.
At cluster scale the per-shard graphs live with their shards and queries
fan out over the actor pool; here the fan-out is a task per shard.

Algorithm: standard HNSW (Malkov & Yashunin 2016) with seeded deterministic
level assignment, ef_construction beam inserts, simple closest-M neighbor
selection, M0 = 2M at level 0.  Distances are cosine (vectors stored
normalized; inner product == cosine).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd

M = 12
M0 = 24
EF_CONSTRUCTION = 80
EF_SEARCH = 60
N_SHARDS = 4


class HnswGraph:
    """In-memory HNSW over normalized vectors (one shard's graph)."""

    def __init__(self, vecs: np.ndarray, ids: np.ndarray, seed: int = 0):
        self.vecs = vecs
        self.ids = ids
        self.levels = None
        self.neighbors: list[dict[int, list[int]]] = []
        self.entry = -1
        self.max_level = -1
        self._rng = np.random.default_rng(seed)

    # ---- construction ----
    def build(self):
        n = len(self.vecs)
        ml = 1.0 / np.log(M)
        u = self._rng.random(n)
        self.levels = np.floor(-np.log(np.clip(u, 1e-12, 1.0)) * ml).astype(np.int64)
        self.max_level = int(self.levels.max(initial=0))
        self.neighbors = [dict() for _ in range(self.max_level + 1)]
        for i in range(n):
            self._insert(i)
        return self

    def _search_layer(self, q: np.ndarray, entry: int, ef: int, level: int):
        """Beam search on one layer; returns list of (sim, node) best-first."""
        import heapq

        adj = self.neighbors[level]
        visited = {entry}
        d0 = float(self.vecs[entry] @ q)
        cand = [(-d0, entry)]              # max-heap by sim (min-heap on -sim)
        best = [(d0, entry)]               # min-heap of kept results (by sim)
        heapq.heapify(best)
        while cand:
            negs, node = heapq.heappop(cand)
            if -negs < best[0][0] and len(best) >= ef:
                break
            for nb in adj.get(node, ()):
                if nb in visited:
                    continue
                visited.add(nb)
                d = float(self.vecs[nb] @ q)
                if len(best) < ef or d > best[0][0]:
                    heapq.heappush(cand, (-d, nb))
                    heapq.heappush(best, (d, nb))
                    if len(best) > ef:
                        heapq.heappop(best)
        return sorted(best, reverse=True)

    def _insert(self, i: int):
        if self.entry < 0:
            self.entry = i
            for lv in range(int(self.levels[i]) + 1):
                self.neighbors[lv][i] = []
            return
        q = self.vecs[i]
        lvl = int(self.levels[i])
        ep = self.entry
        for lv in range(self.max_level, lvl, -1):
            if lv >= len(self.neighbors) or not self.neighbors[lv]:
                continue
            res = self._search_layer(q, ep, 1, lv)
            ep = res[0][1]
        top_entry_level = int(self.levels[self.entry])
        for lv in range(min(lvl, top_entry_level), -1, -1):
            res = self._search_layer(q, ep, EF_CONSTRUCTION, lv)
            m_max = M0 if lv == 0 else M
            chosen = [node for _, node in res[:m_max]]
            self.neighbors[lv][i] = chosen
            for c in chosen:
                lst = self.neighbors[lv].setdefault(c, [])
                lst.append(i)
                if len(lst) > m_max:
                    # prune to the m_max closest (simple selection)
                    sims = self.vecs[lst] @ self.vecs[c]
                    keep = np.argsort(-sims)[:m_max]
                    self.neighbors[lv][c] = [lst[j] for j in keep]
            ep = res[0][1]
        for lv in range(top_entry_level + 1, lvl + 1):
            self.neighbors[lv][i] = []
        if lvl > int(self.levels[self.entry]):
            self.entry = i

    # ---- search ----
    def search(self, q: np.ndarray, k: int, ef: int = EF_SEARCH):
        if self.entry < 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        ep = self.entry
        for lv in range(self.max_level, 0, -1):
            if not self.neighbors[lv]:
                continue
            res = self._search_layer(q, ep, 1, lv)
            ep = res[0][1]
        res = self._search_layer(q, ep, max(ef, k), 0)[:k]
        nodes = np.array([n for _, n in res], dtype=np.int64)
        sims = np.array([s for s, _ in res], dtype=np.float64)
        return self.ids[nodes], sims

    # ---- persistence (flat arrays, npz) ----
    def save(self, path: str):
        flat, bounds, keys, lvl_bounds = [], [0], [], [0]
        for lv in range(self.max_level + 1):
            adj = self.neighbors[lv]
            for node in sorted(adj):
                keys.append(node)
                flat.extend(adj[node])
                bounds.append(len(flat))
            lvl_bounds.append(len(keys))
        np.savez_compressed(
            path, vecs=self.vecs.astype(np.float32), ids=self.ids,
            levels=self.levels, entry=np.int64(self.entry),
            keys=np.array(keys, dtype=np.int64),
            flat=np.array(flat, dtype=np.int64),
            bounds=np.array(bounds, dtype=np.int64),
            lvl_bounds=np.array(lvl_bounds, dtype=np.int64))

    @classmethod
    def load(cls, path: str) -> "HnswGraph":
        z = np.load(path)
        g = cls(z["vecs"].astype(np.float64), z["ids"])
        g.levels = z["levels"]
        g.entry = int(z["entry"])
        g.max_level = int(g.levels.max(initial=0))
        keys, flat, bounds, lvl_bounds = (z["keys"], z["flat"], z["bounds"],
                                          z["lvl_bounds"])
        g.neighbors = []
        for lv in range(len(lvl_bounds) - 1):
            adj = {}
            for ki in range(int(lvl_bounds[lv]), int(lvl_bounds[lv + 1])):
                adj[int(keys[ki])] = flat[int(bounds[ki]):int(bounds[ki + 1])].tolist()
            g.neighbors.append(adj)
        return g


def _index_dir(sf_dir: str) -> str:
    h = hashlib.sha256(f"hnsw:{sf_dir}".encode()).hexdigest()[:10]
    return os.path.join("/tmp", "lucene_ray_indexes", f"hnsw-{h}")


def build_hnsw_index(sf_dir: str, n_shards: int = N_SHARDS) -> str:
    """Build (or reuse) per-shard HNSW graphs with parallel Ray tasks;
    returns the index directory with shard-%02d.npz files."""
    import ray
    import pyarrow.parquet as pq

    out = _index_dir(sf_dir)
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    m = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    order = np.argsort(ids)
    ids, m = ids[order], m[order]

    @ray.remote
    def build_shard(sid: int, vecs, vids):
        g = HnswGraph(vecs, vids, seed=1000 + sid).build()
        g.save(os.path.join(out, f"shard-{sid:02d}.npz"))
        return sid

    bounds = np.linspace(0, len(ids), n_shards + 1).astype(int)
    ray.get([build_shard.remote(s, m[bounds[s]:bounds[s + 1]],
                                ids[bounds[s]:bounds[s + 1]])
             for s in range(n_shards) if bounds[s + 1] > bounds[s]])
    open(done, "w").close()
    return out


def knn_hnsw(sf_dir: str, query_vec_ids=(0, 1, 2), k: int = 10,
             ef: int = EF_SEARCH):
    """(query_vec_id, rank, vec_id, cos rounded 4dp) via the persisted
    per-shard HNSW graphs (searched per shard, merged like TopDocs.merge)."""
    from .knn import _query_matrix

    idx = build_hnsw_index(sf_dir)
    graphs = [HnswGraph.load(os.path.join(idx, f))
              for f in sorted(os.listdir(idx)) if f.endswith(".npz")]
    qids, qm = _query_matrix(sf_dir, list(query_vec_ids))
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    rows = []
    for qi, q in zip(qids, qn):
        cands_ids, cands_sims = [], []
        for g in graphs:
            gids, sims = g.search(q, k + 1, ef=ef)
            cands_ids.append(gids)
            cands_sims.append(sims)
        gids = np.concatenate(cands_ids)
        sims = np.concatenate(cands_sims)
        keep = gids != qi
        gids, sims = gids[keep], sims[keep]
        top = np.lexsort((gids, -sims))[:k]
        for r, j in enumerate(top, 1):
            rows.append((int(qi), r, int(gids[j]), round(float(sims[j]), 4)))
    return pd.DataFrame(rows, columns=["query_vec_id", "rank", "vec_id", "cos"]) \
        .astype({"query_vec_id": "int64", "rank": "int64", "vec_id": "int64"})
