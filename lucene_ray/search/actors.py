"""Stateful query-serving actor pool.

The Ray re-expression of `IndexSearcher` slice execution
(`search/IndexSearcher.java:107-109,330-336,693`: leaves grouped into slices,
executed on an executor, merged with `TopDocs.merge`): each actor is a "slice
executor" that memory-maps a balanced subset of posting shards ONCE in
``__init__`` and serves queries from that hot state; the driver compiles the
query (weights from global stats), scatters it to all actors, and merges
per-actor top-k with the (score desc, global-docID asc) tie-break.

The pool is created only after the embedding application has initialized Ray.
"""

from __future__ import annotations

import numpy as np
import ray

from .scorer import RELATION_EQ, RELATION_GTE
from .searcher import IndexSearcher, ScoreDoc, TopDocs


@ray.remote
class QueryActor:
    def __init__(self, index_dir: str, pids: list[int], use_wand: bool = True):
        self.searcher = IndexSearcher(index_dir, use_wand=use_wand)
        self.pids = pids
        # eager mmap open (the expensive part amortized across queries)
        self.readers = {pid: self.searcher.reader(pid) for pid in pids}
        self.bases = {pid: self.searcher._bases[pid] for pid in pids}

    def search(self, compiled: dict, k: int, after=None, threshold: int = 1000):
        out_scores, out_gids, out_conv, out_turn = [], [], [], []
        total = 0
        relation = RELATION_EQ
        for pid in self.pids:
            rdr = self.readers[pid]
            base = self.bases[pid]
            local_after = None if after is None else (after[0], after[1] - base)
            scores, local_docs, t, rel = self.searcher.search_shard(
                rdr, compiled, k, after=local_after, total_hits_threshold=threshold)
            total += t
            if rel == RELATION_GTE:
                relation = RELATION_GTE
            if len(local_docs):
                rows = rdr.lookup_docs(local_docs.astype(np.int64))
                out_scores.append(scores)
                out_gids.append(local_docs.astype(np.int64) + base)
                out_conv.extend(rows.column("conv_id").to_pylist())
                out_turn.extend(rows.column("turn_idx").to_pylist())
        scores = np.concatenate(out_scores) if out_scores else np.zeros(0, np.float32)
        gids = np.concatenate(out_gids) if out_gids else np.zeros(0, np.int64)
        # local merge down to k before shipping to the driver
        order = np.lexsort((gids, -scores))[:k]
        return (scores[order], gids[order],
                [out_conv[i] for i in order], [out_turn[i] for i in order],
                total, relation)

    def ping(self):
        return len(self.pids)


class QueryService:
    """Driver-side facade over the actor pool (parse → compile → scatter →
    gather → TopDocs.merge)."""

    def __init__(self, index_dir: str, num_actors: int = 4, use_wand: bool = True,
                 num_cpus_per_actor: float = 1):
        self.index_dir = index_dir
        self.searcher = IndexSearcher(index_dir, use_wand=use_wand)  # stats + compile
        commit = self.searcher.commit
        shards = sorted(commit["shards"], key=lambda m: -m["doc_count"])
        num_actors = max(1, min(num_actors, len(shards)))
        # balance shards across actors by doc count (greedy bin packing)
        assign = [[] for _ in range(num_actors)]
        load = [0] * num_actors
        for m in shards:
            i = int(np.argmin(load))
            assign[i].append(m["pid"])
            load[i] += m["doc_count"]
        self.actors = [
            QueryActor.options(num_cpus=num_cpus_per_actor).remote(
                index_dir, sorted(pids), use_wand)
            for pids in assign if pids
        ]
        ray.get([a.ping.remote() for a in self.actors])

    def search(self, query, k: int = 10, after=None, threshold: int = 1000) -> TopDocs:
        compiled = self.searcher.compile(query)
        futs = [a.search.remote(compiled, k, after, threshold) for a in self.actors]
        return self._merge(ray.get(futs), k)

    def search_many(self, queries, k: int = 10) -> list[TopDocs]:
        """Pipeline a batch of queries across the pool (keeps all actors busy)."""
        compiled = [self.searcher.compile(q) for q in queries]
        futs = [[a.search.remote(c, k, None, 1000) for a in self.actors] for c in compiled]
        return [self._merge(ray.get(f), k) for f in futs]

    @staticmethod
    def _merge(parts, k) -> TopDocs:
        scores = np.concatenate([p[0] for p in parts])
        gids = np.concatenate([p[1] for p in parts])
        convs = [c for p in parts for c in p[2]]
        turns = [t for p in parts for t in p[3]]
        total = sum(p[4] for p in parts)
        relation = RELATION_GTE if any(p[5] == RELATION_GTE for p in parts) else RELATION_EQ
        order = np.lexsort((gids, -scores))[:k]
        hits = [ScoreDoc(float(scores[i]), int(gids[i]), convs[i], turns[i]) for i in order]
        return TopDocs(hits, total, relation)

    def shutdown(self):
        for a in self.actors:
            ray.kill(a)
        self.actors = []
