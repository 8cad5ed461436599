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

Construction is sequential per doc (the reference's HnswGraphBuilder is
too) but each step is numpy-batched: per-level adjacency lives in fixed
int32 (n, m_max) arrays (no dict-of-lists), beam expansion scores all
unvisited neighbors in one matmul, visited-tracking uses a reusable stamp
array (no per-insert O(n) allocation), and over-full neighbor lists prune
with one vectorized top-m selection.
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
        # per level: adjacency int32 (n, m_max) padded -1 + degree int32[n]
        self.adj: list[np.ndarray] = []
        self.deg: list[np.ndarray] = []
        self.entry = -1
        self.max_level = -1
        self._rng = np.random.default_rng(seed)
        self._vstamp = None                # visited stamps (reused per search)
        self._stamp = 0
        self._v32 = None                   # float32 scoring copy (beam)

    # ---- construction ----
    def build(self):
        n = len(self.vecs)
        ml = 1.0 / np.log(M)
        u = self._rng.random(n)
        self.levels = np.floor(-np.log(np.clip(u, 1e-12, 1.0)) * ml).astype(np.int64)
        self.max_level = int(self.levels.max(initial=0))
        self.adj = [np.full((n, M0 if lv == 0 else M), -1, dtype=np.int32)
                    for lv in range(self.max_level + 1)]
        self.deg = [np.zeros(n, dtype=np.int32)
                    for _ in range(self.max_level + 1)]
        self._vstamp = np.zeros(n, dtype=np.int64)
        self._stamp = 0
        self._v32 = np.ascontiguousarray(self.vecs, dtype=np.float32)
        for i in range(n):
            self._insert(i)
        return self

    def _ensure_stamp(self):
        if self._vstamp is None or len(self._vstamp) != len(self.vecs):
            self._vstamp = np.zeros(len(self.vecs), dtype=np.int64)
            self._stamp = 0
        if getattr(self, "_v32", None) is None:
            self._v32 = np.ascontiguousarray(self.vecs, dtype=np.float32)

    def _search_layer(self, q: np.ndarray, entry: int, ef: int, level: int,
                      accept: np.ndarray | None = None,
                      chunk: int = 8):
        """Beam search on one layer; returns list of (sim, node) best-first.
        With `accept`, non-accepted nodes are traversed but never collected
        (HnswGraphSearcher acceptDocs semantics).

        Numpy-batched: up to `chunk` frontier nodes expand together — their
        adjacency rows gather into ONE candidate array scored by ONE matmul
        against the float32 vector copy.  Best-first termination still keys
        on the single top candidate, so the visit set is a (slight)
        superset of the classic one-at-a-time beam, never a subset."""
        adj, deg = self.adj[level], self.deg[level]
        v32 = self._v32
        q = np.asarray(q, dtype=np.float32)
        self._stamp += 1
        stamp, vstamp = self._stamp, self._vstamp
        vstamp[entry] = stamp
        d0 = float(v32[entry] @ q)
        cand = [(-d0, entry)]              # max-heap by sim (min-heap on -sim)
        best = []                          # min-heap of kept results (by sim)
        if accept is None or accept[entry]:
            best.append((d0, entry))
        push, pop = heapq.heappush, heapq.heappop
        while cand:
            full = len(best) >= ef
            floor = best[0][0] if full else -np.inf
            negs, node = pop(cand)
            if full and -negs < floor:
                break
            batch = [node]
            while cand and len(batch) < chunk and -cand[0][0] >= floor:
                batch.append(pop(cand)[1])
            rows = [adj[b][:deg[b]] for b in batch]
            if len(rows) == 1:
                nbs = rows[0]
            else:
                nbs = np.unique(np.concatenate(rows))   # dedupe across batch
            if not len(nbs):
                continue
            new = nbs[vstamp[nbs] != stamp]
            if not len(new):
                continue
            vstamp[new] = stamp
            dists = v32[new] @ q
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
            return
        q = self.vecs[i]
        lvl = int(self.levels[i])
        ep = self.entry
        top_entry_level = int(self.levels[self.entry])
        for lv in range(self.max_level, lvl, -1):
            if lv > top_entry_level:
                continue
            res = self._search_layer(q, ep, 1, lv)
            ep = res[0][1]
        for lv in range(min(lvl, top_entry_level), -1, -1):
            res = self._search_layer(q, ep, EF_CONSTRUCTION, lv)
            m_max = M0 if lv == 0 else M
            adj, deg = self.adj[lv], self.deg[lv]
            chosen = np.fromiter((node for _, node in res[:m_max]),
                                 dtype=np.int32, count=min(len(res), m_max))
            deg[i] = len(chosen)
            adj[i, :len(chosen)] = chosen
            for c in chosen.tolist():
                dc = deg[c]
                if dc < m_max:
                    adj[c, dc] = i
                    deg[c] = dc + 1
                else:
                    # prune to the m_max closest (vectorized selection)
                    row = np.concatenate((adj[c, :dc], [i])).astype(np.int64)
                    sims = self._v32[row] @ self._v32[c]
                    keep = np.argpartition(-sims, m_max - 1)[:m_max]
                    adj[c, :m_max] = row[keep]
            ep = res[0][1]
        if lvl > top_entry_level:
            self.entry = i

    # ---- search ----
    def search(self, q: np.ndarray, k: int, ef: int = EF_SEARCH,
               accept: np.ndarray | None = None):
        """Top-k (ids, sims) by inner product over the stored normalized
        vectors; `accept` is an optional bool mask over nodes (live docs ∧
        pre-filter)."""
        if self.entry < 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        self._ensure_stamp()
        ep = self.entry
        for lv in range(int(self.levels[self.entry]), 0, -1):
            res = self._search_layer(q, ep, 1, lv)
            ep = res[0][1]
        res = self._search_layer(q, ep, max(ef, k), 0, accept=accept)[:k]
        nodes = np.array([n for _, n in res], dtype=np.int64)
        sims = np.array([s for s, _ in res], dtype=np.float64)
        return self.ids[nodes], sims

    # ---- persistence (flat arrays, npz — format unchanged) ----
    def save(self, path: str):
        flat, bounds, keys, lvl_bounds = [], [0], [], [0]
        for lv in range(self.max_level + 1):
            deg = self.deg[lv]
            nodes = np.nonzero(deg > 0)[0]
            # nodes with degree 0 that exist at this level (fresh entry
            # points) carry no edges — omitting them matches the old
            # dict-of-lists format where empty lists loaded as empty
            for node in nodes.tolist():
                keys.append(node)
                flat.extend(self.adj[lv][node, :deg[node]].tolist())
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
        n = len(g.vecs)
        g.adj = [np.full((n, M0 if lv == 0 else M), -1, dtype=np.int32)
                 for lv in range(g.max_level + 1)]
        g.deg = [np.zeros(n, dtype=np.int32)
                 for _ in range(g.max_level + 1)]
        for lv in range(len(lvl_bounds) - 1):
            for ki in range(int(lvl_bounds[lv]), int(lvl_bounds[lv + 1])):
                node = int(keys[ki])
                run = flat[int(bounds[ki]):int(bounds[ki + 1])]
                m_cap = g.adj[lv].shape[1]
                run = run[:m_cap]
                g.deg[lv][node] = len(run)
                g.adj[lv][node, :len(run)] = run
        return g
