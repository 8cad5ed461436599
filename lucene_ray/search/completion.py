"""Document-based completion queries — the `suggest/document` package
surface (`suggest/.../document/SuggestIndexSearcher.java:38-80`,
`PrefixCompletionQuery.java`, `RegexCompletionQuery.java`,
`FuzzyCompletionQuery.java:55-290`, `ContextQuery.java:72-341`,
`TopSuggestDocsCollector.java:50-160`, `CompletionScorer.java:95-106`)
re-expressed over this repo's sorted suggester store (suggest.py — the
NRTSuggester/CompletionPostingsFormat role: per-shard key-sorted parquet
with manifest range pruning instead of a per-segment completion FST).

Scoring follows CompletionScorer.score(weight, boost):

    boost == 0 -> weight;  weight == 0 -> boost;  else weight * boost

* PrefixCompletionQuery: boost 0 (pure index weight);
* FuzzyCompletionQuery: boost = length of the longest common prefix
  between the matched key and the analyzed query (code points, capped at
  len(query)-1 — the reference's pathPrefix drops the last consumed
  label, so an exact match and an edit-at-the-end boost the same:
  `FuzzyCompletionQuery.java:267-290`);
* ContextQuery: boost = context boost + inner boost
  (`ContextQuery.java:339-341`), with exact or prefix context labels.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np

from .suggest import SEP, Suggester, analyzed_key


@dataclass(frozen=True)
class PrefixCompletionQuery:
    """All completions whose analyzed key starts with the analyzed term
    (`suggest/document/PrefixCompletionQuery.java`)."""
    term: str


@dataclass(frozen=True)
class RegexCompletionQuery:
    """Completions whose analyzed key has a PREFIX matching the regex
    (`suggest/document/RegexCompletionQuery.java` — the automaton accepts
    any continuation after the regex is consumed).  Anchored at the start
    like the reference's RegExp-compiled automaton."""
    regexp: str


@dataclass(frozen=True)
class FuzzyCompletionQuery:
    """Completions whose key prefix is within `max_edits` of the analyzed
    term (`suggest/document/FuzzyCompletionQuery.java` defaults: 1 edit,
    no edits inside the first `non_fuzzy_prefix` code points, no fuzz for
    queries shorter than `min_fuzzy_length`); more similar completions
    boost higher."""
    term: str
    max_edits: int = 1
    non_fuzzy_prefix: int = 1
    min_fuzzy_length: int = 3


@dataclass
class ContextQuery:
    """Context-filtered/boosted completion (`ContextQuery.java:72-341`):
    only entries carrying an accepted context label match; score boost =
    context boost + inner query boost.  `exact=False` accepts labels the
    given context is a prefix of."""
    query: object
    contexts: dict = field(default_factory=dict)   # label -> (boost, exact)
    match_all: bool = False

    def __post_init__(self):
        if isinstance(self.query, ContextQuery):
            raise ValueError("'query' must not be a ContextQuery")

    def add_context(self, context: str, boost: float = 1.0,
                    exact: bool = True) -> "ContextQuery":
        if boost < 0:
            raise ValueError("'boost' must be >= 0")
        self.contexts[context] = (float(boost), exact)
        return self

    def add_all_contexts(self) -> "ContextQuery":
        """`ContextQuery.addAllContexts()`: every context matches, boost 1."""
        self.match_all = True
        return self


@dataclass(frozen=True)
class SuggestScoreDoc:
    surface: str
    key: str
    score: float
    context: str | None = None


@dataclass(frozen=True)
class TopSuggestDocs:
    hits: tuple


def _lcp(a: str, b: str) -> int:
    n = min(len(a), len(b))
    for i in range(n):
        if a[i] != b[i]:
            return i
    return n


class SuggestIndexSearcher:
    """`suggest/document/SuggestIndexSearcher.java`: executes
    CompletionQuerys against a suggester store, collecting the top-n by
    score desc (TopSuggestDocsCollector; `skip_duplicates` keeps the best
    hit per surface form)."""

    def __init__(self, suggester: Suggester):
        self.suggester = suggester

    # -- candidate enumeration per query type ------------------------------

    def _entries(self, lo: str, hi: str):
        """(key, surface, weight, contexts) rows from range-pruned shards."""
        for keys, surfaces, weights, ctxs in self.suggester._candidates(
                lo, hi):
            lo_i = int(np.searchsorted(keys, lo, side="left"))
            hi_i = int(np.searchsorted(keys, hi, side="left"))
            for i in range(lo_i, hi_i):
                yield (keys[i], str(surfaces[i]), int(weights[i]),
                       ctxs[i] if ctxs is not None else None)

    def _matches(self, query):
        """Yield (key, surface, weight, contexts, boost)."""
        HI = chr(0x10FFFF)
        if isinstance(query, PrefixCompletionQuery):
            kq = analyzed_key(query.term)
            if not kq:
                return
            for k, s, w, c in self._entries(kq, kq + HI):
                yield k, s, w, c, 0.0
        elif isinstance(query, RegexCompletionQuery):
            # Lucene RegExp dialect (`util/automaton/RegExp.java`), prefix
            # intersection semantics; the literal prefix prunes the store
            from ..util.regexp import LuceneRegExp

            rx = LuceneRegExp(query.regexp)
            lo = rx.literal_prefix()
            for k, s, w, c in self._entries(lo, (lo + HI) if lo else HI):
                if rx.prefix_match(k):
                    yield k, s, w, c, 0.0
        elif isinstance(query, FuzzyCompletionQuery):
            from .suggest import _prefix_within_edits

            kq = analyzed_key(query.term)
            if not kq:
                return
            if len(kq) < query.min_fuzzy_length:
                for k, s, w, c in self._entries(kq, kq + HI):
                    yield k, s, w, c, 0.0
                return
            pre = kq[:query.non_fuzzy_prefix]
            cap = max(len(kq) - 1, 0)
            for k, s, w, c in self._entries(pre, pre + HI):
                if _prefix_within_edits(k, kq, query.max_edits):
                    yield k, s, w, c, float(min(_lcp(k, kq), cap))
        elif isinstance(query, ContextQuery):
            if not query.match_all and not query.contexts:
                return
            for k, s, w, c, b in self._matches(query.query):
                if c is None:
                    raise ValueError(
                        "ContextQuery over a store without a contexts "
                        "column (ContextSuggestField missing)")
                best = None
                for label in c:
                    if query.match_all:
                        cb = 1.0
                    else:
                        cb = None
                        for ctx, (boost, exact) in query.contexts.items():
                            if (label == ctx if exact
                                    else label.startswith(ctx)):
                                cb = boost if cb is None else max(cb, boost)
                        if cb is None:
                            continue
                    if best is None or cb > best[0]:
                        best = (cb, label)
                if best is not None:
                    yield k, s, w, (c, best[1]), best[0] + b
        else:
            raise TypeError(type(query).__name__)

    # -- search -------------------------------------------------------------

    def suggest(self, query, n: int = 5,
                skip_duplicates: bool = False) -> TopSuggestDocs:
        hits = []
        for k, s, w, c, boost in self._matches(query):
            # CompletionScorer.score(weight, boost)
            if boost == 0.0:
                score = float(w)
            elif w == 0:
                score = boost
            else:
                score = float(w) * boost
            context = c[1] if isinstance(c, tuple) else None
            hits.append(SuggestScoreDoc(s, k, score, context))
        hits.sort(key=lambda h: (-h.score, h.key, h.surface))
        if skip_duplicates:
            seen, out = set(), []
            for h in hits:
                if h.surface not in seen:
                    seen.add(h.surface)
                    out.append(h)
            hits = out
        return TopSuggestDocs(tuple(hits[:n]))
