"""Per-shard HNSW graph — the vector half of a segment.

The role of the reference's per-segment vector format + graph
(`codecs/lucene95/Lucene95HnswVectorsFormat.java:99`,
`util/hnsw/HnswGraphBuilder.java`, `util/hnsw/HnswGraphSearcher.java`):
each posting shard can carry a `vectors.npy` (float32 matrix in local-docID
order, mmap'd at query time) and an `hnsw.npz` graph built from THAT
partition's rows inside the same flush task — never on the driver.  Search
supports an accept mask (`HnswGraphSearcher`'s acceptDocs): non-accepted
nodes are traversed but not collected, so deletes and pre-filters compose
with the approximate path.

Algorithm: standard HNSW (Malkov & Yashunin 2016) with seeded deterministic
level assignment, ef_construction beam inserts, closest-M neighbor
selection, M0 = 2M at level 0.  Vectors are stored raw; the graph holds a
row-normalized copy so inner product == cosine.
"""

from __future__ import annotations

import heapq

import numpy as np

M = 12
M0 = 24
EF_CONSTRUCTION = 80
EF_SEARCH = 60


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

    def _search_layer(self, q: np.ndarray, entry: int, ef: int, level: int,
                      accept: np.ndarray | None = None):
        """Beam search on one layer; returns list of (sim, node) best-first.
        With `accept`, non-accepted nodes are traversed but never collected
        (HnswGraphSearcher acceptDocs semantics)."""
        adj = self.neighbors[level]
        visited = np.zeros(len(self.vecs), dtype=bool)
        visited[entry] = True
        d0 = float(self.vecs[entry] @ q)
        cand = [(-d0, entry)]              # max-heap by sim (min-heap on -sim)
        best = []                          # min-heap of kept results (by sim)
        if accept is None or accept[entry]:
            best.append((d0, entry))
        push, pop = heapq.heappush, heapq.heappop
        while cand:
            negs, node = pop(cand)
            full = len(best) >= ef
            floor = best[0][0] if full else -np.inf
            if full and -negs < floor:
                break
            nbs = adj.get(node)
            if not nbs:
                continue
            nbs = np.asarray(nbs, dtype=np.int64)
            new = nbs[~visited[nbs]]
            if not len(new):
                continue
            visited[new] = True
            dists = self.vecs[new] @ q
            if full:                       # batch-drop below-floor neighbors
                sel = dists > floor
                new, dists = new[sel], dists[sel]
            for nb, d in zip(new.tolist(), dists.tolist()):
                if len(best) < ef or d > floor:
                    push(cand, (-d, nb))
                    if accept is None or accept[nb]:
                        push(best, (d, nb))
                        if len(best) > ef:
                            pop(best)
                        if len(best) >= ef:
                            floor = best[0][0]
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
    def search(self, q: np.ndarray, k: int, ef: int = EF_SEARCH,
               accept: np.ndarray | None = None):
        """Top-k (ids, sims) by inner product over the stored normalized
        vectors; `accept` is an optional bool mask over nodes (live docs ∧
        pre-filter)."""
        if self.entry < 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        ep = self.entry
        for lv in range(self.max_level, 0, -1):
            if not self.neighbors[lv]:
                continue
            res = self._search_layer(q, ep, 1, lv)
            ep = res[0][1]
        res = self._search_layer(q, ep, max(ef, k), 0, accept=accept)[:k]
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
