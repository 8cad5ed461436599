"""Term-major posting-list consolidation — the SegmentMerger re-expression.

The reference merge (`index/SegmentMerger.java:104-145`, ``mergeTerms`` at
:196) k-way-merges sorted term streams and concatenates docID-remapped
postings per term.  Ray-Data-first, that becomes the north rule's
"groupby-on-term aggregate shuffle with explicit salting for skewed hot
terms":

    per-shard map: decode each term's postings, remap local→global docIDs
      emit (term, salt, docs:list<int64>, freqs:list<int32>)
      where salt = doc_base // salt_span — a DOC-RANGE bucket, so a hot
      term (present in every shard) is split across reducers instead of
      landing on one
    → groupby(term, salt).map_groups: concat runs in doc_base order
      (partitions own disjoint ordered docID ranges, so in-salt
      concatenation is already doc-sorted)
    → groupby(term).map_groups: concatenate the salt runs in salt order —
      valid for the same reason — and emit the final merged posting list
    → write hash-bucketed parquet (term, df, ttf, docs, freqs)

The per-shard doc-partitioned index remains the serving layout (Lucene
keeps segments too); the merged store is the term-major artifact for
term-centric consumers (stats audits, posting exports) and is validated
against the shards by tests + CheckIndex-style equivalence.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pyarrow as pa

from .manifest import latest_commit
from .shard import ShardReader


def merge_postings(index_dir: str, commit: dict | None = None, *,
                   salt_span: int = 500_000, n_buckets: int = 16,
                   out_dir: str | None = None) -> str:
    """Run the salted term merge; returns the merged store directory."""
    import ray
    import ray.data

    commit = commit or latest_commit(index_dir)
    out_dir = out_dir or os.path.join(index_dir, "merged_postings")

    shard_rows = [{"shard_dir": os.path.join(index_dir, "shards", f"shard-{m['pid']:05d}"),
                   "doc_base": int(m["doc_base"])}
                  for m in commit["shards"]]

    def decode_shard(batch: pa.Table) -> pa.Table:
        terms_out, salts, bases, docs_out, freqs_out = [], [], [], [], []
        for shard_dir, doc_base in zip(batch.column("shard_dir").to_pylist(),
                                       batch.column("doc_base").to_pylist()):
            rdr = ShardReader(shard_dir)
            salt = int(doc_base) // salt_span
            for tid in range(rdr.n_terms):
                docs, freqs = rdr.postings(tid)
                terms_out.append(rdr._term_np[tid])
                salts.append(salt)
                bases.append(doc_base)
                docs_out.append((docs.astype(np.int64) + doc_base))
                freqs_out.append(freqs)
        return pa.table({
            "term": pa.array(terms_out, type=pa.string()),
            "salt": pa.array(salts, type=pa.int32()),
            "doc_base": pa.array(bases, type=pa.int64()),
            "docs": pa.array([d.tolist() for d in docs_out], type=pa.list_(pa.int64())),
            "freqs": pa.array([f.tolist() for f in freqs_out], type=pa.list_(pa.int32())),
        })

    def concat_in_salt(g: pa.Table) -> pa.Table:
        # one (term, salt): concat runs in doc_base order (disjoint ranges)
        order = np.argsort(g.column("doc_base").to_numpy(), kind="stable")
        docs = np.concatenate([np.asarray(g.column("docs")[int(i)].as_py(), dtype=np.int64)
                               for i in order])
        freqs = np.concatenate([np.asarray(g.column("freqs")[int(i)].as_py(), dtype=np.int32)
                                for i in order])
        return pa.table({
            "term": g.column("term").slice(0, 1),
            "salt": g.column("salt").slice(0, 1),
            "docs": pa.array([docs.tolist()], type=pa.list_(pa.int64())),
            "freqs": pa.array([freqs.tolist()], type=pa.list_(pa.int32())),
        })

    def concat_salts(g: pa.Table) -> pa.Table:
        # one term: salt buckets are doc-range ordered, concat in salt order
        order = np.argsort(g.column("salt").to_numpy(), kind="stable")
        docs = np.concatenate([np.asarray(g.column("docs")[int(i)].as_py(), dtype=np.int64)
                               for i in order])
        freqs = np.concatenate([np.asarray(g.column("freqs")[int(i)].as_py(), dtype=np.int32)
                                for i in order])
        term = g.column("term")[0].as_py()
        bucket = zlib.crc32(term.encode()) % n_buckets
        return pa.table({
            "term": pa.array([term], type=pa.string()),
            "bucket": pa.array([bucket], type=pa.int32()),
            "df": pa.array([len(docs)], type=pa.int64()),
            "ttf": pa.array([int(freqs.sum())], type=pa.int64()),
            "docs": pa.array([docs.tolist()], type=pa.list_(pa.int64())),
            "freqs": pa.array([freqs.tolist()], type=pa.list_(pa.int32())),
        })

    merged = (
        ray.data.from_items(shard_rows)
        .map_batches(decode_shard, batch_format="pyarrow", batch_size=1)
        .groupby(["term", "salt"]).map_groups(concat_in_salt, batch_format="pyarrow")
        .groupby("term").map_groups(concat_salts, batch_format="pyarrow")
    )
    import shutil
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    merged.write_parquet(out_dir)
    return out_dir


class MergedPostingsReader:
    """Reader over the term-major merged store (parquet with predicate
    pushdown per term)."""

    def __init__(self, merged_dir: str):
        self.dir = merged_dir

    def postings(self, term: str):
        import pyarrow.parquet as pq

        t = pq.read_table(self.dir, filters=[("term", "==", term)])
        if t.num_rows == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int32)
        docs = np.asarray(t.column("docs")[0].as_py(), dtype=np.int64)
        freqs = np.asarray(t.column("freqs")[0].as_py(), dtype=np.int32)
        return docs, freqs
