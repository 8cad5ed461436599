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

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"bucket": (df["doc_id"] % N_BUCKETS).astype("int64"),
                             "key": df["doc_id"].astype("int64"),
                             "side": "L", "lang": df["lang"], "label": None})

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"bucket": (df["vec_id"] % N_BUCKETS).astype("int64"),
                             "key": df["vec_id"].astype("int64"),
                             "side": "R", "lang": None, "label": df["label"]})

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == "L"][["key", "lang"]]
        right = g[g["side"] == "R"][["key", "label"]]
        out = left.merge(right, on="key", how="inner")
        return pd.DataFrame({"doc_id": out["key"].astype("int64"),
                             "lang": out["lang"].astype(str),
                             "label": out["label"].astype("int64")})

    tagged = docs.map_batches(tag_left, batch_format="pandas").union(
        embs.map_batches(tag_right, batch_format="pandas"))
    return tagged.groupby("bucket").map_groups(join_bucket, batch_format="pandas")
