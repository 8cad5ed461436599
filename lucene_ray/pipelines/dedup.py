"""Deduplication pipelines over the `documents` table.

- exact: content-hash + groupby(hash) -> first (SQL-checkable via md5)
- MinHash + LSH: shingle -> minhash -> band -> groupby(band bucket) ->
  candidate pairs -> Jaccard verify -> min-label clustering
- SimHash: 64-bit sketch + Hamming-banding buckets
- n-gram Jaccard: exact verified similarity on LSH candidates

Everything is seeded/deterministic (no Date/random at run time) and
streaming: sketches are computed per batch (vectorized numpy), only the
small (doc_id, bucket/signature) projections go through shuffles, never the
text.  At 100 TB the candidate-pair verification joins back to the text via
a bucketed hash join on doc_id; here the corpus is small enough to broadcast
the token sets for the verify stage.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from .textstats import SIMPLE_TOKEN, _read_documents, _tokens_series

# deterministic 64-bit string hash (stable across processes, unlike hash())
def _h64(arr: "pd.Series | list[str]", seed: int = 0) -> np.ndarray:
    out = np.empty(len(arr), dtype=np.uint64)
    sb = seed.to_bytes(4, "little")
    for i, s in enumerate(arr):
        out[i] = int.from_bytes(hashlib.blake2b((s).encode(), digest_size=8, salt=sb).digest(), "little")
    return out


def dedup_exact(sf_dir: str):
    """Exact dedup: (text_md5 -> representative doc_id = min, n_dups)."""
    from ray.data.aggregate import Count, Min

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "text_md5": df["text"].fillna("").map(lambda s: hashlib.md5(s.encode()).hexdigest()),
            "doc_id": df["doc_id"],
        })

    return (_read_documents(sf_dir)
            .map_batches(add_hash, batch_format="pandas")
            .groupby("text_md5")
            .aggregate(Min("doc_id", alias_name="rep_doc_id"),
                       Count(alias_name="n_dups")))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

N_PERM = 64
N_BANDS = 16          # 16 bands x 4 rows
ROWS_PER_BAND = N_PERM // N_BANDS
_MERSENNE = (1 << 61) - 1
_rng = np.random.default_rng(123456789)
_PERM_A = (_rng.integers(1, _MERSENNE, size=N_PERM, dtype=np.int64)).astype(np.uint64)
_PERM_B = (_rng.integers(0, _MERSENNE, size=N_PERM, dtype=np.int64)).astype(np.uint64)


def shingles(tokens: list[str], k: int = 3) -> list[str]:
    if len(tokens) < k:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)]


def minhash_signature(tokens: list[str], k: int = 3) -> np.ndarray:
    """N_PERM minhash values over k-token shingles (uint64)."""
    sh = set(shingles(tokens, k))
    if not sh:
        return np.full(N_PERM, np.iinfo(np.uint64).max, dtype=np.uint64)
    hv = _h64(sorted(sh))
    # universal hashing: (a*x + b) mod p, vectorized over perms x shingles
    x = hv.astype(np.uint64) % np.uint64(_MERSENNE)
    vals = (_PERM_A[:, None] * x[None, :] + _PERM_B[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


def _band_rows(df: pd.DataFrame, k: int = 3) -> pd.DataFrame:
    toks = _tokens_series(df["text"])
    sigs = np.stack([minhash_signature(t, k) for t in toks])   # (n, N_PERM)
    bands = sigs.reshape(len(df), N_BANDS, ROWS_PER_BAND)
    # one stable 64-bit key per band
    band_hash = bands[:, :, 0].copy()
    for r in range(1, ROWS_PER_BAND):
        band_hash = band_hash * np.uint64(0x9E3779B97F4A7C15) + bands[:, :, r]
    doc = np.repeat(df["doc_id"].to_numpy(), N_BANDS)
    return pd.DataFrame({
        "band": np.tile(np.arange(N_BANDS, dtype=np.int32), len(df)),
        "bhash": band_hash.reshape(-1).astype("uint64"),
        "doc_id": doc,
    })


def minhash_candidates(sf_dir: str, k: int = 3):
    """LSH bucket stage: (band, bhash) groups with >= 2 docs -> candidate
    doc_id lists (the shingle→minhash→band→bucket groupby of the brief)."""
    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"band": [], "bhash": [], "doc_ids": []})
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"band": [], "bhash": [], "doc_ids": []})
        return pd.DataFrame({"band": [g["band"].iloc[0]], "bhash": [g["bhash"].iloc[0]],
                             "doc_ids": [ids.tolist()]})

    return (_read_documents(sf_dir)
            .map_batches(_band_rows, batch_format="pandas", fn_kwargs={"k": k})
            .groupby(["band", "bhash"])
            .map_groups(bucket, batch_format="pandas"))


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def dedup_minhash(sf_dir: str, k: int = 3, threshold: float = 0.7):
    """Full near-dup pipeline: LSH candidates -> exact shingle-Jaccard verify
    -> union-find clustering -> (doc_id, cluster_rep).

    The candidate set is provably small (only bucket collisions), so the
    verify + clustering runs on the driver; at scale the verify would join
    token sets per bucket and clustering would be iterative min-label
    propagation (documented in ray_guide patterns).
    """
    cands = minhash_candidates(sf_dir, k).to_pandas()
    pairs = set()
    for ids in cands["doc_ids"]:
        ids = list(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((int(ids[i]), int(ids[j])))
    need = sorted({d for p in pairs for d in p})
    if need:
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
                          filters=[("doc_id", "in", need)])
        tok = {int(d): set(shingles(SIMPLE_TOKEN.findall(str(x).lower()), k))
               for d, x in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())}
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in sorted(pairs):
        if jaccard(tok[a], tok[b]) >= threshold:
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
    rows = [(d, find(d)) for d in need]
    out = pd.DataFrame(rows, columns=["doc_id", "cluster_rep"])
    return out[out.doc_id != out.cluster_rep].reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(tokens: list[str]) -> np.uint64:
    if not tokens:
        return np.uint64(0)
    uniq, counts = np.unique(np.asarray(tokens, dtype=object), return_counts=True)
    hv = _h64(list(uniq), seed=7)
    bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    acc = ((2 * bits - 1) * counts[:, None]).sum(axis=0)
    return np.uint64(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def simhash_table(sf_dir: str):
    """(doc_id, simhash hex) per document — vectorized per batch."""
    def sh(df: pd.DataFrame) -> pd.DataFrame:
        toks = _tokens_series(df["text"])
        return pd.DataFrame({"doc_id": df["doc_id"],
                             "simhash": [format(int(simhash64(t)), "016x") for t in toks]})

    return _read_documents(sf_dir).map_batches(sh, batch_format="pandas")


def dedup_simhash(sf_dir: str, max_hamming: int = 3):
    """Near-dup via simhash: band the 64 bits into 4 x 16-bit keys (any
    match -> candidate), verify Hamming distance <= max_hamming."""
    sims = simhash_table(sf_dir).to_pandas()
    sims["h"] = sims["simhash"].map(lambda s: int(s, 16))
    cands = set()
    for shift in (0, 16, 32, 48):
        key = (sims["h"].to_numpy().astype(np.uint64) >> np.uint64(shift)) & np.uint64(0xFFFF)
        g = pd.DataFrame({"key": key, "doc_id": sims["doc_id"]}).groupby("key")["doc_id"].apply(list)
        for ids in g:
            ids = sorted(ids)
            for i in range(len(ids)):
                for j in range(i + 1, min(i + 50, len(ids))):
                    cands.add((ids[i], ids[j]))
    hv = dict(zip(sims["doc_id"], sims["h"]))
    rows = []
    for a, b in sorted(cands):
        d = bin(hv[a] ^ hv[b]).count("1")
        if d <= max_hamming:
            rows.append((a, b, d))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"])


def ngram_jaccard_pairs(sf_dir: str, k: int = 3, threshold: float = 0.5):
    """Exact n-gram Jaccard similarity for LSH candidate pairs:
    (doc_a, doc_b, jaccard rounded to 6)."""
    cands = minhash_candidates(sf_dir, k).to_pandas()
    pairs = set()
    for ids in cands["doc_ids"]:
        ids = list(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((int(ids[i]), int(ids[j])))
    if not pairs:
        return pd.DataFrame(columns=["doc_a", "doc_b", "jaccard"])
    need = sorted({d for p in pairs for d in p})
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
                      filters=[("doc_id", "in", need)])
    tok = {int(d): set(shingles([w.lower() for w in SIMPLE_TOKEN.findall(str(x))], k))
           for d, x in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())}
    rows = [(a, b, round(jaccard(tok[a], tok[b]), 6))
            for a, b in sorted(pairs) if jaccard(tok[a], tok[b]) >= threshold]
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])
