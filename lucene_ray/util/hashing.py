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


# MurmurHash2 64-bit (`codecs/bloom/MurmurHash64.java`, the Apache-Commons
# variant Lucene's bloom postings use; default seed 0xe17a1465)
_M64 = np.uint64(0xC6A4A7935BD1E995)
_R64 = np.uint64(47)
MURMUR_SEED = 0xE17A1465


def murmur64(arr, seed: int = MURMUR_SEED) -> np.ndarray:
    """Vectorized MurmurHash64 over a pyarrow string array / list of str
    (UTF-8 bytes), bit-identical to `MurmurHash64.hash64`; uint64[n]."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not isinstance(arr, pa.Array):
        arr = pa.array(list(arr), type=pa.string())
    if not (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)):
        arr = arr.cast(pa.large_string())
    off_dt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dt)[arr.offset:arr.offset + n + 1] \
        .astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.empty(0, np.uint8)
    starts, lens = offs[:-1], offs[1:] - offs[:-1]
    with np.errstate(over="ignore"):
        h = np.uint64(seed & 0xFFFFFFFF) ^ (lens.astype(np.uint64) * _M64)
        nblocks = lens >> 3
        shifts = (np.arange(8, dtype=np.uint64) * np.uint64(8))
        for i in range(int(nblocks.max()) if n else 0):
            m = nblocks > i
            idx = (starts[m] + 8 * i)[:, None] + np.arange(8)
            chunk = data[idx].astype(np.uint64)
            k = np.zeros(int(m.sum()), dtype=np.uint64)
            for j in range(8):
                k |= chunk[:, j] << shifts[j]
            k *= _M64
            k ^= k >> _R64
            k *= _M64
            hm = h[m]
            hm ^= k
            hm *= _M64
            h[m] = hm
        rem = (lens & 7).astype(np.int64)
        tail_base = starts + 8 * nblocks
        t = np.zeros(n, dtype=np.uint64)
        for j in range(7):
            m = rem > j
            if not m.any():
                break
            t[m] |= data[tail_base[m] + j].astype(np.uint64) << shifts[j]
        m = rem > 0
        h[m] = (h[m] ^ t[m]) * _M64
        h ^= h >> _R64
        h *= _M64
        h ^= h >> _R64
    return h


def murmur64_str(s: str, seed: int = MURMUR_SEED) -> int:
    """Scalar twin of :func:`murmur64` (bit-identical; the per-lookup path)."""
    data = s.encode()
    length = len(data)
    M = 0xC6A4A7935BD1E995
    mask = (1 << 64) - 1
    h = (seed & 0xFFFFFFFF) ^ ((length * M) & mask)
    nblocks = length >> 3
    for i in range(nblocks):
        k = int.from_bytes(data[8 * i:8 * i + 8], "little")
        k = (k * M) & mask
        k ^= k >> 47
        k = (k * M) & mask
        h ^= k
        h = (h * M) & mask
    rem = length & 7
    if rem:
        t = int.from_bytes(data[8 * nblocks:], "little")
        h = ((h ^ t) * M) & mask
    h ^= h >> 47
    h = (h * M) & mask
    h ^= h >> 47
    return h
