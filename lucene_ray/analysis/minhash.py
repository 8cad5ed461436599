"""Reference-parity MinHashFilter
(`analysis/common/src/java/org/apache/lucene/analysis/minhash/MinHashFilter.java`).

The whole token stream of a document is hashed with MurmurHash3 x64 128 over
the token's UTF-16LE bytes, re-hashed per hash position with Guava-style
combineOrdered (val*37 + h), partitioned into ``bucket_count`` ranges of the
top-32-bit space, and the ``hash_set_size`` smallest DISTINCT 128-bit values
per (hash position, bucket) are emitted as tokens at stream end (first token
posInc 1, the rest posInc 0).  ``with_rotation`` fills empty buckets with the
next non-empty bucket's minimum (cyclic) when hash_set_size == 1 — the
constant-signature-width variant.

Divergence: the reference packs each hash into UTF-16 code units (including
unpaired surrogates), which cannot live in Arrow's UTF-8 string columns —
tokens here are the same bits hex-encoded, preserving the reference's
truncation (hashCount > 1 emits the hash position (32 bits), val2 (64) and
only the top 32 bits of val1; hashCount == 1 emits all 128 bits).  Hash
values themselves are pinned bit-for-bit by the reference's own test vectors
(TestMinHashFilter.testIntHash/testStringHash and the packed-char fixtures).
"""

from __future__ import annotations

import numpy as np

_M64 = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M64
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """MurmurHash3 x64 128 (`MinHashFilter.java:414-504`), unsigned
    (val1, val2)."""
    h1 = seed & 0xFFFFFFFF
    h2 = seed & 0xFFFFFFFF
    length = len(data)
    rounded = length & ~15
    for i in range(0, rounded, 16):
        k1 = int.from_bytes(data[i:i + 8], "little")
        k2 = int.from_bytes(data[i + 8:i + 16], "little")
        k1 = (k1 * _C1) & _M64
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M64
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _M64
        h1 = (h1 * 5 + 0x52DCE729) & _M64
        k2 = (k2 * _C2) & _M64
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M64
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _M64
        h2 = (h2 * 5 + 0x38495AB5) & _M64
    tail = data[rounded:]
    if len(tail) > 8:
        k2 = int.from_bytes(tail[8:], "little")
        k2 = (k2 * _C2) & _M64
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M64
        h2 ^= k2
    if tail:
        k1 = int.from_bytes(tail[:8], "little")
        k1 = (k1 * _C1) & _M64
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M64
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    return h1, h2


def int_hash(i: int) -> tuple[int, int]:
    """Hash of the hash position (`MinHashFilter.getIntHash`: murmur over
    the big-endian int bytes)."""
    return murmur3_x64_128(int(i).to_bytes(4, "big"))


def combine_ordered(a: tuple[int, int], b: tuple[int, int]) -> tuple[int, int]:
    """`MinHashFilter.combineOrdered` seeded from (0, 0): folding h then ih
    gives (0*37 + h)*37 + ih = h*37 + ih per 64-bit lane, Java wraparound."""
    v1 = (a[0] * 37 + b[0]) & _M64
    v2 = (a[1] * 37 + b[1]) & _M64
    return v1, v2


def _pack_hex(pos: int, val1: int, val2: int, hash_count: int) -> str:
    """Hex twin of the reference's UTF-16 char packing
    (`MinHashFilter.java:214-236`): val2 first; hashCount > 1 prefixes the
    hash position and truncates val1 to its top 32 bits."""
    if hash_count > 1:
        return f"{pos:08x}{val2:016x}{val1 >> 32:08x}"
    return f"{val2:016x}{val1:016x}"


def min_hash_tokens(tokens, hash_count: int = 1, bucket_count: int = 512,
                    hash_set_size: int = 1,
                    with_rotation: bool | None = None) -> list[str]:
    """One document's MinHash token stream (hex terms, emission order =
    hash position asc, bucket asc, hash asc — the reference's pull order)."""
    if with_rotation is None:
        with_rotation = bucket_count > 1
    bucket_size = (1 << 32) // bucket_count
    if (1 << 32) % bucket_count != 0:
        bucket_size += 1
    # distinct hashes per token value; rehash per hash position
    hashes = {}
    for t in tokens:
        if t not in hashes:
            hashes[t] = murmur3_x64_128(t.encode("utf-16-le"))
    out = []
    for i in range(hash_count):
        ih = int_hash(i)
        buckets: list[list] = [[] for _ in range(bucket_count)]
        seen = set()
        for h in hashes.values():
            re1, re2 = combine_ordered(h, ih)
            if (re2, re1) in seen:
                continue
            seen.add((re2, re1))
            buckets[(re2 >> 32) // bucket_size].append((re2, re1))
        mins = [sorted(b)[:hash_set_size] for b in buckets]
        if with_rotation and hash_set_size == 1:
            for j in range(bucket_count):
                if not mins[j]:
                    for off in range(1, bucket_count):
                        nxt = mins[(j + off) % bucket_count]
                        if nxt:
                            mins[j] = [nxt[0]]
                            break
        for j in range(bucket_count):
            for re2, re1 in mins[j]:
                out.append(_pack_hex(i, re1, re2, hash_count))
    return out
