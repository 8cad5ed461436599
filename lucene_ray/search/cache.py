"""Query cache — the reference's `search/LRUQueryCache.java` (678 LoC) +
`search/UsageTrackingQueryCachingPolicy.java` (163 LoC) re-expressed for the
Ray actor-pool serving model.

Reference semantics kept:

- The cache stores the MATCHING-DOC SET of *non-scoring* sub-queries
  (BooleanWeight asks for scoreless iterators for FILTER / MUST_NOT clauses
  — `search/BooleanWeight.java`), keyed by (query, segment).  Scores are
  never cached.
- Eviction is least-recently-used over a doubly-linked map with both an
  entry-count bound and a RAM bound (`LRUQueryCache.java:93-110` — defaults
  1000 queries / 32 MB in `IndexSearcher.java:171-178`).
- A *caching policy* decides which queries are worth caching
  (`UsageTrackingQueryCachingPolicy.java`): a frequency-tracking ring
  buffer of recently-seen queries; a query is cached only once it has been
  seen `minFrequencyToCache` times in the window — 2 for costly queries
  (multi-term expansions, phrases, points/ranges: `:95-108`), 5 for cheap
  ones.  TermQuery / MatchAllDocs / MatchNoDocs are never cached
  (`shouldNeverCache`, `:62-88`): re-executing them costs less than the
  cached bitset they would pin.
- Cached sets are stored as packed bitsets (`util/FixedBitSet` /
  `RoaringDocIdSet` in the reference; `np.packbits` here — 1 bit/doc).
- Deletes are NOT part of the cached set (the reference caches per segment
  core, live-docs applied outside); callers mask deletes after lookup.
- Segment identity: keys carry the shard's immutable directory (a merge
  rewrites survivors into a fresh dir, so a reused pid can never alias a
  stale set); `IndexSearcher.refresh()` additionally clears the cache on a
  generation change, the analogue of the reference dropping per-core
  entries when a segment reader closes.

Per the brief's actor-pool model this is *per-worker hot state*: each
QueryActor's IndexSearcher owns an independent cache (the reference
likewise shares one cache per IndexSearcher process, not across JVMs).
"""

from __future__ import annotations

from collections import OrderedDict, deque

import numpy as np

__all__ = ["LRUQueryCache", "UsageTrackingQueryCachingPolicy", "query_key"]


def query_key(query) -> str:
    """Stable structural key for a query tree.  The query AST classes are
    dataclasses whose repr covers every field (terms, fields, bounds,
    nested clauses), so repr is a faithful structural identity — the
    analogue of Query.equals()/hashCode() keying in the reference."""
    return f"{type(query).__name__}:{query!r}"


class UsageTrackingQueryCachingPolicy:
    """`UsageTrackingQueryCachingPolicy.java` — track recently-used queries
    in a bounded ring buffer; admit a query to the cache only when its
    frequency in the window reaches the per-shape minimum."""

    HISTORY_SIZE = 256          # FrequencyTrackingRingBuffer sizing (`:40`)

    def __init__(self, history_size: int = HISTORY_SIZE):
        self._recent: deque[str] = deque(maxlen=history_size)
        self._counts: dict[str, int] = {}

    # -- the reference's shape classification ---------------------------
    @staticmethod
    def _never_cache(query) -> bool:
        # `shouldNeverCache` (`UsageTrackingQueryCachingPolicy.java:62-88`):
        # term queries are cheaper to re-execute than to cache; match-all /
        # match-none are trivial; an empty boolean matches nothing.
        name = type(query).__name__
        if name in ("TermQuery", "MatchAllDocsQuery", "MatchNoDocsQuery"):
            return True
        if name == "BooleanQuery" and not query.clauses:
            return True
        return False

    @staticmethod
    def _min_frequency(query) -> int:
        # `minFrequencyToCache` (`:95-108`): costly-to-build sets amortize
        # after 2 uses; everything else must prove itself 5 times.
        name = type(query).__name__
        if name in ("PrefixQuery", "WildcardQuery", "RegexpQuery",
                    "FuzzyQuery", "TermInSetQuery", "RangeQuery",
                    "PhraseQuery", "MultiPhraseQuery",
                    "IndexOrDocValuesQuery"):
            return 2
        return 5

    def on_use(self, query) -> None:
        if self._never_cache(query):
            return
        key = query_key(query)
        if len(self._recent) == self._recent.maxlen:
            old = self._recent[0]
            c = self._counts.get(old, 0) - 1
            if c <= 0:
                self._counts.pop(old, None)
            else:
                self._counts[old] = c
        self._recent.append(key)
        self._counts[key] = self._counts.get(key, 0) + 1

    def should_cache(self, query) -> bool:
        if self._never_cache(query):
            return False
        return (self._counts.get(query_key(query), 0)
                >= self._min_frequency(query))


class LRUQueryCache:
    """LRU over (pid, query) → packed matching-doc bitset."""

    def __init__(self, max_entries: int = 1000,
                 max_ram_bytes: int = 32 * 1024 * 1024,
                 policy: UsageTrackingQueryCachingPolicy | None = None):
        self.max_entries = max_entries
        self.max_ram_bytes = max_ram_bytes
        self.policy = policy or UsageTrackingQueryCachingPolicy()
        self._map: OrderedDict[tuple, tuple[bytes, int]] = OrderedDict()
        self._ram = 0
        # stats mirror `LRUQueryCache` accessors (hitCount/missCount/...)
        self.hit_count = 0
        self.miss_count = 0
        self.cache_count = 0        # entries ever stored
        self.eviction_count = 0
        # sub-queries already usage-counted during the current search:
        # matches() is invoked once per segment, but the reference
        # UsageTrackingQueryCachingPolicy counts one use per *search*
        # (IndexSearcher calls onUse from the cached-weight wrapper once),
        # so dedupe within a search to avoid N-shard inflation.
        self._used_this_search: set = set()

    def __len__(self) -> int:
        return len(self._map)

    def begin_search(self) -> None:
        """Mark the start of a top-level search: usage counting resets so
        each distinct sub-query counts at most one use this search."""
        self._used_this_search.clear()

    def clear(self) -> None:
        self._map.clear()
        self._ram = 0

    def matches(self, segment_key, query, compute) -> np.ndarray:
        """Return the dense bool matched-array for `query` on the segment
        identified by `segment_key` (the shard's immutable directory — a
        merge rewrites into a fresh dir, so stale sets can never be read),
        consulting / populating the cache.  `compute()` produces the
        uncached answer (a bool[n_docs] array, deletes NOT applied)."""
        qk = query_key(query)
        if qk not in self._used_this_search:
            self._used_this_search.add(qk)
            self.policy.on_use(query)
        key = (segment_key, qk)
        hit = self._map.get(key)
        if hit is not None:
            self.hit_count += 1
            self._map.move_to_end(key)
            packed, n = hit
            return np.unpackbits(
                np.frombuffer(packed, dtype=np.uint8), count=n).astype(bool)
        self.miss_count += 1
        matched = compute()
        if self.policy.should_cache(query):
            packed = np.packbits(matched).tobytes()
            self._map[key] = (packed, len(matched))
            self._ram += len(packed) + 64
            self.cache_count += 1
            while (len(self._map) > self.max_entries
                   or self._ram > self.max_ram_bytes):
                _, (old, _n) = self._map.popitem(last=False)
                self._ram -= len(old) + 64
                self.eviction_count += 1
        return matched
