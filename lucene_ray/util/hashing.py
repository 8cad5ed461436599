"""Deterministic vectorized string hashing shared by the dedup pipelines and
the hash-partitioned term-stats store.  FNV-1a 64-bit over UTF-8 bytes,
computed zero-copy over Arrow string-array buffers (one masked pass per byte
position) — stable across processes, environments, and library versions,
unlike Python's hash() or polars' ahash."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

FNV_OFFSET = np.uint64(0xCBF29CE484222325)
FNV_PRIME = np.uint64(0x100000001B3)
GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def fnv1a64(arr, seed: int = 0) -> np.ndarray:
    """Vectorized FNV-1a 64 over a pyarrow string array / chunked array /
    list of str; returns uint64[n]."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not isinstance(arr, pa.Array):
        arr = pa.array(list(arr), type=pa.string())
    if not (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)):
        # string_view / dictionary inputs carry a different buffer layout
        arr = arr.cast(pa.large_string())
    off_dt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dt)[arr.offset:arr.offset + n + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    starts, lens = offs[:-1], offs[1:] - offs[:-1]
    with np.errstate(over="ignore"):
        h = np.full(n, (FNV_OFFSET ^ (np.uint64(seed) * GOLDEN)) * FNV_PRIME,
                    dtype=np.uint64)
        for j in range(int(lens.max()) if n else 0):
            m = lens > j
            h[m] = (h[m] ^ data[starts[m] + j].astype(np.uint64)) * FNV_PRIME
    return h


def fnv1a64_str(s: str, seed: int = 0) -> int:
    """Scalar twin of :func:`fnv1a64` (bit-identical)."""
    with np.errstate(over="ignore"):
        h = (FNV_OFFSET ^ (np.uint64(seed) * GOLDEN)) * FNV_PRIME
        for b in s.encode():
            h = (h ^ np.uint64(b)) * FNV_PRIME
    return int(h)
