"""Explicit partitioned hash join — the "both sides large" pattern from the
Ray Data guide (and the query-time join surface of SURVEY §2.4): tag each
side with ``bucket = key % B``, union the tagged sides, ``groupby(bucket)``,
and hash-join the two sides of each bucket inside ``map_groups``.  No
broadcast, no driver materialization of either side; skewed keys would be
salted into sub-buckets the same way.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

TARGET_ROWS_PER_BUCKET = 250_000


def doc_embedding_join(sf_dir: str):
    """documents ⋈ embeddings on doc_id == vec_id -> (doc_id, lang, label)."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    embs = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"])
    # bucket count scales with the larger side so one bucket group stays a
    # bounded map_groups task at any corpus size (parquet-metadata count)
    n_rows = max(docs.count(), embs.count())
    N_BUCKETS = max(8, -(-n_rows // TARGET_ROWS_PER_BUCKET))

    def tag_left(t: pa.Table) -> pa.Table:
        key = t.column("doc_id").to_numpy().astype(np.int64)
        return pa.table({"bucket": pa.array(key % N_BUCKETS),
                         "key": pa.array(key),
                         "lang": t.column("lang"),
                         "label": pa.nulls(len(key), type=pa.int64())})

    def tag_right(t: pa.Table) -> pa.Table:
        key = t.column("vec_id").to_numpy().astype(np.int64)
        return pa.table({"bucket": pa.array(key % N_BUCKETS),
                         "key": pa.array(key),
                         "lang": pa.nulls(len(key), type=pa.string()),
                         "label": pa.compute.cast(t.column("label"), pa.int64())})

    def join_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        left = g.filter(pc.is_valid(g.column("lang")))
        right = g.filter(pc.invert(pc.is_valid(g.column("lang"))))
        lk = left.column("key").to_numpy()
        rk = right.column("key").to_numpy()
        lo, ro = np.argsort(lk), np.argsort(rk)
        _, li, ri = np.intersect1d(lk[lo], rk[ro], return_indices=True)
        lt = left.take(pa.array(lo[li]))
        rt = right.take(pa.array(ro[ri]))
        return pa.table({"doc_id": lt.column("key"),
                         "lang": lt.column("lang"),
                         "label": rt.column("label")})

    tagged = docs.map_batches(tag_left, batch_format="pyarrow").union(
        embs.map_batches(tag_right, batch_format="pyarrow"))
    return tagged.groupby("bucket").map_groups(join_bucket, batch_format="pyarrow")
