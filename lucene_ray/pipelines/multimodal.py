"""Multimodal-column plumbing: opaque binary payloads + actor-pool feature
extraction.

Real image/audio decode libraries are not in this container, so the decode
step is a clearly-marked deterministic STUB — but the Ray-side plumbing is
real and is what matters at scale: binary payloads live in Arrow `binary`
columns (never converted to pandas object dtype), the extractor is a
callable CLASS run as a `map_batches` actor pool (model "loaded" once per
actor in __init__), batches are kept small because rows are wide, and the
output schema is (doc_id, n_bytes, payload_md5, feat list<float>).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

FEAT_DIM = 16


def _attach_payload(batch: pa.Table) -> pa.Table:
    """Deterministic fake media payload per document (stands in for an
    image/audio blob column read from parquet)."""
    payload = pa.array([t.encode() if t else b"" for t in
                        batch.column("text").to_pylist()], type=pa.binary())
    return pa.table({"doc_id": batch.column("doc_id"), "payload": payload})


class FeatureExtractor:
    """Actor-pool stage: 'model' built once per actor, per-batch vectorized
    extraction.  decode() is the stub boundary — swap it for a real decoder
    (PIL/torchaudio/...) when the libs exist."""

    def __init__(self, dim: int = FEAT_DIM, seed: int = 1234):
        # model load happens ONCE per actor (amortized across batches)
        rng = np.random.default_rng(seed)
        self.proj = rng.normal(size=(256, dim))

    @staticmethod
    def decode(payload: bytes) -> np.ndarray:
        """STUB decoder: real implementation would decode image/audio bytes.
        Deterministic fake: byte histogram (raises nothing; a real decoder
        would raise NotImplementedError for unsupported codecs)."""
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist = np.bincount(arr, minlength=256).astype(np.float64)
        return hist

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = np.stack([self.decode(p) @ self.proj for p in payloads]) \
            if payloads else np.zeros((0, self.proj.shape[1]))
        md5s = [hashlib.md5(p).hexdigest() for p in payloads]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_bytes": pa.array([len(p) for p in payloads], type=pa.int64()),
            "payload_md5": pa.array(md5s, type=pa.string()),
            "feat": pa.array([row.tolist() for row in feats],
                             type=pa.list_(pa.float64())),
        })


def media_features(sf_dir: str, concurrency: int = 2):
    """documents -> binary payload -> actor-pool feature extraction."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return (ds.map_batches(_attach_payload, batch_format="pyarrow")
            .map_batches(FeatureExtractor, batch_format="pyarrow",
                         batch_size=256, concurrency=concurrency, num_cpus=1))


def media_features_table(sf_dir: str):
    """SQL-checkable projection of the actor-pool output (drops the stub
    feature vector, keeps the exact columns DuckDB can mirror)."""
    ds = media_features(sf_dir)
    return ds.map_batches(lambda t: t.select(["doc_id", "n_bytes", "payload_md5"]),
                          batch_format="pyarrow")
