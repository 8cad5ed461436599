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


# MurmurHash3 x64 128-bit (`analysis/minhash/MinHashFilter.java:414`
# murmurhash3_x64_128, the Austin Appleby algorithm over byte arrays;
# Lucene's MinHashFilter hashes each term's UTF-16LE bytes with seed 0)
_C1_128 = np.uint64(0x87C37B91114253D5)
_C2_128 = np.uint64(0x4CF5AD432745937F)
_FMIX1 = np.uint64(0xFF51AFD7ED558CCD)
_FMIX2 = np.uint64(0xC4CEB9FE1A85EC53)


def _rotl64(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _fmix64_np(k: np.ndarray) -> np.ndarray:
    k ^= k >> np.uint64(33)
    k *= _FMIX1
    k ^= k >> np.uint64(33)
    k *= _FMIX2
    k ^= k >> np.uint64(33)
    return k


def murmur3_128_batch(items: list[bytes], seed: int = 0
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized murmurhash3_x64_128 over a list of byte strings;
    returns (h1, h2) uint64 arrays (Java's LongPair.val1/val2)."""
    n = len(items)
    if n == 0:
        e = np.empty(0, dtype=np.uint64)
        return e, e
    lens = np.fromiter((len(b) for b in items), dtype=np.int64, count=n)
    width = max(16, int(((lens.max() + 15) // 16) * 16))
    data = np.zeros((n, width), dtype=np.uint8)
    for i, b in enumerate(items):
        if b:
            data[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
    le_words = data.view("<u8").astype(np.uint64)   # (n, width//8) LE longs
    with np.errstate(over="ignore"):
        h1 = np.full(n, np.uint64(seed & 0xFFFFFFFF))
        h2 = h1.copy()
        nblocks = lens >> 4
        for i in range(int(nblocks.max())):
            m = nblocks > i
            k1 = le_words[m, 2 * i].copy()
            k2 = le_words[m, 2 * i + 1].copy()
            k1 *= _C1_128
            k1 = _rotl64(k1, 31)
            k1 *= _C2_128
            h1m = h1[m] ^ k1
            h1m = _rotl64(h1m, 27)
            h1m += h2[m]
            h1m = h1m * np.uint64(5) + np.uint64(0x52DCE729)
            k2 *= _C2_128
            k2 = _rotl64(k2, 33)
            k2 *= _C1_128
            h2m = h2[m] ^ k2
            h2m = _rotl64(h2m, 31)
            h2m += h1m
            h2m = h2m * np.uint64(5) + np.uint64(0x38495AB5)
            h1[m], h2[m] = h1m, h2m
        # tail (len & 15 bytes after the rounded end); the Java switch
        # mixes k2 only when rem > 8 and k1 from the first min(rem, 8)
        rem = (lens & 15).astype(np.int64)
        base = (nblocks << 4).astype(np.int64)
        rows = np.arange(n)
        k1 = np.zeros(n, dtype=np.uint64)
        k2 = np.zeros(n, dtype=np.uint64)
        for j in range(8, 15):
            m = rem > j
            if m.any():
                k2[m] |= data[rows[m], base[m] + j].astype(np.uint64) \
                    << np.uint64(8 * (j - 8))
        m2 = rem > 8
        if m2.any():
            t = k2[m2]
            t *= _C2_128
            t = _rotl64(t, 33)
            t *= _C1_128
            h2[m2] ^= t
        for j in range(0, 8):
            m = rem > j
            if m.any():
                k1[m] |= data[rows[m], base[m] + j].astype(np.uint64) \
                    << np.uint64(8 * j)
        m1 = rem > 0
        if m1.any():
            t = k1[m1]
            t *= _C1_128
            t = _rotl64(t, 31)
            t *= _C2_128
            h1[m1] ^= t
        h1 ^= lens.astype(np.uint64)
        h2 ^= lens.astype(np.uint64)
        h1 += h2
        h2 += h1
        h1 = _fmix64_np(h1)
        h2 = _fmix64_np(h2)
        h1 += h2
        h2 += h1
    return h1, h2


def murmur3_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """Scalar twin of :func:`murmur3_128_batch` (bit-identical)."""
    h1, h2 = murmur3_128_batch([data], seed)
    return int(h1[0]), int(h2[0])
