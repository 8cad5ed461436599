"""Bloom-filter term sidecars for primary-key-style fields.

Re-expresses `codecs/src/java/org/apache/lucene/codecs/bloom/` —
`FuzzySet.java` (all-ones bitset sizes, `createOptimalSet` sizing at
targetMaxFpp, the (lsb + i*msb) int32 hash walk over MurmurHash64, the
`downsize` re-projection) and `DefaultBloomFilterFactory.java` (size for
maxDoc unique values at 10.23% fpp; drop the set when saturation > 90%)
and `BloomFilteringPostingsFormat.java` (consult the filter before
touching the terms dictionary; a NO skips the seek entirely).

At 100-TB scale this is the shard-pruning layer for point lookups: a
primary-key TermQuery fans out to every shard, and without the filter
every shard pays a terms-dictionary probe (mmap page faults on cold
shards); with it, the one shard actually holding the key does.
"""

from __future__ import annotations

import math
import os

import numpy as np

from ..util.hashing import murmur64, murmur64_str

# usable sizes are all-ones numbers so (hash & size) is the modulo
# (`FuzzySet.java:68-75`)
USABLE_BITSET_SIZES = tuple((1 << (i + 6)) - 1 for i in range(26))


def nearest_set_size(max_number_of_bits: int) -> int:
    """Largest usable size <= max_number_of_bits (`FuzzySet.java:81-89`)."""
    result = USABLE_BITSET_SIZES[0]
    for s in USABLE_BITSET_SIZES:
        if s <= max_number_of_bits:
            result = s
    return result


def optimal_params(max_values: int, target_fpp: float = 0.1023) -> tuple[int, int]:
    """(bloom_size, hash_count) per `FuzzySet.createOptimalSet`."""
    max_values = max(1, int(max_values))
    set_size = int(math.ceil((max_values * math.log(target_fpp))
                             / math.log(1.0 / (2.0 ** math.log(2.0)))))
    set_size = nearest_set_size(2 * set_size)
    k = int(round((set_size / max_values) * math.log(2.0)))
    return set_size, max(1, k)


def _positions(h: np.ndarray, k: int, size: int) -> np.ndarray:
    """All k probe positions for each 64-bit hash: Java int32 arithmetic
    (lsb + i*msb) masked by the all-ones size (`FuzzySet.java:152-163`)."""
    msb = (h >> np.uint64(32)).astype(np.uint32).view(np.int32)
    lsb = (h & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
    out = np.empty((k, len(h)), dtype=np.int64)
    with np.errstate(over="ignore"):
        for i in range(k):
            pos = (lsb + np.int32(i) * msb).view(np.uint32)
            out[i] = (pos & np.uint32(size)).astype(np.int64)
    return out


class BloomFilter:
    """A FuzzySet over a term set: ``contains`` answers NO / MAYBE."""

    def __init__(self, bits: np.ndarray, size: int, k: int):
        self.bits = bits                     # uint64 words
        self.size = int(size)                # all-ones modulo mask
        self.k = int(k)

    @staticmethod
    def build(terms, max_values: int, target_fpp: float = 0.1023,
              downsize_saturation: float = 0.1023) -> "BloomFilter":
        """Hash every term, set bits at optimal size, then downsize to the
        smallest usable size at <= downsize_saturation
        (`BloomFilteringPostingsFormat.java:496` + `FuzzySet.downsize`)."""
        size, k = optimal_params(max_values, target_fpp)
        h = murmur64(terms)
        pos = np.unique(_positions(h, k, size).ravel())
        # downsize: project set-bit indices into the smallest usable size
        # that keeps saturation under the target
        n_set = len(pos)
        for cand in USABLE_BITSET_SIZES:
            if cand > size:
                break
            if n_set / cand <= downsize_saturation:
                size = cand
                pos = np.unique(pos & np.int64(size))
                break
        bits = np.zeros((size + 64) // 64, dtype=np.uint64)
        np.bitwise_or.at(bits, pos >> 6,
                         np.uint64(1) << (pos & 63).astype(np.uint64))
        return BloomFilter(bits, size, k)

    @property
    def saturation(self) -> float:
        n_set = int(np.bitwise_count(self.bits).sum()) \
            if hasattr(np, "bitwise_count") else \
            int(sum(bin(int(w)).count("1") for w in self.bits))
        return n_set / float(self.size)

    def contains(self, terms) -> np.ndarray:
        """Vectorized NO/MAYBE per term (True = MAYBE)."""
        h = murmur64(terms)
        pos = _positions(h, self.k, self.size)
        ok = np.ones(pos.shape[1], dtype=bool)
        for i in range(self.k):
            p = pos[i]
            bit = (self.bits[p >> 6] >> (p & 63).astype(np.uint64)) \
                & np.uint64(1)
            ok &= bit.astype(bool)
        return ok

    def contains_one(self, term: str) -> bool:
        """Scalar NO/MAYBE (the per-seekExact hot path — plain int ops;
        Java's int32 (lsb + i*msb) wraparound == mod 2^32 here because the
        all-ones size mask keeps only low bits)."""
        h = murmur64_str(term)
        msb = (h >> 32) & 0xFFFFFFFF
        lsb = h & 0xFFFFFFFF
        bits, size, k = self._bits_list, self.size, self.k
        for i in range(k):
            p = (lsb + i * msb) & size
            if not (bits[p >> 6] >> (p & 63)) & 1:
                return False
        return True

    @property
    def _bits_list(self):
        # python-int word list: avoids a numpy scalar conversion per probe
        bl = self.__dict__.get("_bits_list_cache")
        if bl is None:
            bl = self.__dict__["_bits_list_cache"] = self.bits.tolist()
        return bl

    def save(self, path: str) -> None:
        np.savez(path, bits=self.bits,
                 meta=np.array([self.size, self.k], dtype=np.int64))

    @staticmethod
    def load(path: str) -> "BloomFilter":
        z = np.load(path)
        size, k = (int(x) for x in z["meta"])
        return BloomFilter(z["bits"], size, k)


def write_field_blooms(tmp_dir: str, terms_np: np.ndarray, n_docs: int,
                       bloom_fields, keyword_sep: str) -> dict:
    """Build + persist one bloom per requested keyword field from the
    shard's SORTED term array (the field's terms are one contiguous
    prefix slice).  Returns the manifest entries; a field whose filter
    would be > 90% saturated is skipped
    (`DefaultBloomFilterFactory.isSaturated`)."""
    out = {}
    for field in bloom_fields:
        prefix = f"{field}{keyword_sep}"
        a = int(np.searchsorted(terms_np, prefix))
        # exclusive upper bound: bump the separator's codepoint — every
        # term of this field sorts strictly below it
        upper = field + chr(ord(keyword_sep) + 1)
        b = int(np.searchsorted(terms_np, upper))
        if b <= a:
            continue
        bf = BloomFilter.build(terms_np[a:b].tolist(), max(n_docs, b - a))
        if bf.saturation > 0.9:
            continue
        fname = f"bloom_{field}.npz"
        bf.save(os.path.join(tmp_dir, fname))
        out[field] = {"file": fname, "n_terms": b - a}
    return out
