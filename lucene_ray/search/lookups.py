"""Suggester Lookup variants + dictionaries + spell-checker string distances.

Re-expresses the remaining `suggest` surface the analyzing/fuzzy/infix/
freetext suggesters (suggest.py) don't cover:

* `FSTCompletion` / `FSTCompletionLookup`
  (`suggest/.../fst/FSTCompletion.java:75-300`,
  `FSTCompletionLookup.java:180-240`): weights DISCRETIZED into
  `buckets` equal-frequency classes (sort by weight, bucket = rank *
  buckets / n, equal weights share a bucket); completions ordered by
  bucket desc then key byte-order, optional exact-match-first.  The
  returned weight IS the bucket — large in-bucket weight differences are
  deliberately lost (the reference's rationale: bucket order survives
  automaton sharing).
* `WFSTCompletionLookup` (`suggest/.../fst/WFSTCompletionLookup.java`):
  exact long weights, results by (weight desc, key asc), exact-first slot.
* `TSTLookup` / `TSTAutocomplete`
  (`suggest/.../tst/TSTLookup.java`, `TSTAutocomplete.java:40-140`): a
  real ternary search tree, balanced middle-first insertion from
  UTF-16-sorted keys, DFS prefix completion; `only_more_popular=True`
  re-ranks the DFS list by weight.
* `DocumentDictionary` / `DocumentValueSourceDictionary` /
  `PlainTextDictionary` (`suggest/DocumentDictionary.java`,
  `DocumentValueSourceDictionary.java`, `spell/PlainTextDictionary.java`):
  (term, weight) inputs from a Ray Dataset's columns, an expression over
  its numeric columns, or a plain-text file — each produces the
  entry list every Lookup here builds from (the InputIterator role).
* Spell-checker `StringDistance` family (`search/spell/
  LevenshteinDistance.java`, `JaroWinklerDistance.java`,
  `NGramDistance.java`, `LuceneLevenshteinDistance.java`) — pluggable
  similarity scores in [0,1] (LuceneLevenshtein: 1 - d/min) used to
  re-rank DirectSpellChecker output.
* `SuggestStopFilter` (`analysis/.../SuggestStopFilter.java` semantics):
  drops stopwords EXCEPT a trailing one the user may still be typing
  (kept only when the token reaches the end of the input, i.e. no
  separator follows).

All lookups build from small (key, weight) lists — suggestion corpora are
query logs / titles, tiny next to the corpus — produced distributedly by
the dictionary helpers (Dataset aggregation), so nothing corpus-sized
ever funnels through the driver.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# FSTCompletion (bucketed weights)
# ---------------------------------------------------------------------------


class FSTCompletion:
    """Bucketed completion over explicit (key, bucket) pairs
    (`FSTCompletion.java:95-300`): lookup returns (key, bucket) ordered by
    bucket desc then UTF-8 byte order — the FST's root arcs are sorted by
    decreasing weight class and traversal within a class is byte-ordered;
    `exact_first` promotes an exact match to the front,
    `higher_weights_first=False` gives plain alphabetical order
    (lookupSortedAlphabetically)."""

    def __init__(self, entries, higher_weights_first: bool = True,
                 exact_first: bool = True):
        self.exact_first = exact_first
        self.higher_weights_first = higher_weights_first
        # UTF-8 byte order coincides with code-point order, so a plain
        # str sort gives the FST's byte-ordered traversal
        ordered = sorted(entries, key=lambda kw: kw[0])
        self._keys = np.array([k for k, _ in ordered], dtype=object)
        self._buckets = np.array([b for _, b in ordered], dtype=np.int64)

    def lookup(self, prefix: str, num: int = 5) -> list[tuple[str, int]]:
        lo = np.searchsorted(self._keys, prefix, side="left")
        hi = np.searchsorted(self._keys, prefix + chr(0x10FFFF), side="right")
        if lo >= hi:
            return []
        keys = self._keys[lo:hi]
        bks = self._buckets[lo:hi]
        if self.higher_weights_first:
            # stable: byte order within a bucket (completionStream DFS)
            order = np.argsort(-bks, kind="stable")
        else:
            order = np.arange(len(keys))     # lookupSortedAlphabetically
        out = [(str(keys[i]), int(bks[i])) for i in order]
        if self.exact_first:
            exact = [kv for kv in out if kv[0] == prefix]
            if exact:
                out = exact + [kv for kv in out if kv[0] != prefix]
        return out[:num]

    def get_bucket(self, key: str) -> int | None:
        i = np.searchsorted(self._keys, key, side="left")
        if i < len(self._keys) and self._keys[i] == key:
            return int(self._buckets[i])
        return None


class FSTCompletionLookup:
    """Weight-discretizing adapter (`FSTCompletionLookup.java:180-240`):
    entries sorted by weight asc get bucket = rank * buckets / n (equal
    weights share the earlier rank's bucket), then FSTCompletion ordering;
    the returned weight IS the bucket."""

    DEFAULT_BUCKETS = 10

    def __init__(self, entries, buckets: int = DEFAULT_BUCKETS,
                 exact_first: bool = True, higher_weights_first: bool = True):
        if buckets < 1 or buckets > 255:
            raise ValueError(f"buckets must be >= 1 and <= 255: {buckets}")
        by_weight = sorted(entries, key=lambda kw: (kw[1], kw[0]))
        n = len(by_weight)
        pairs = []
        prev_w, prev_b = None, 0
        for line, (k, w) in enumerate(by_weight):
            b = prev_b if (line > 0 and w == prev_w) \
                else line * buckets // n
            prev_w, prev_b = w, b
            pairs.append((k, b))
        self._completion = FSTCompletion(
            pairs, higher_weights_first=higher_weights_first,
            exact_first=exact_first)

    def lookup(self, prefix: str, num: int = 5) -> list[tuple[str, int]]:
        return self._completion.lookup(prefix, num)

    def get_bucket(self, key: str) -> int | None:
        return self._completion.get_bucket(key)


class WFSTCompletionLookup:
    """Exact-weight completion (`WFSTCompletionLookup.java:149-230`):
    (weight desc, key asc) over the prefix range, with an optional
    reserved first slot for the exact match."""

    def __init__(self, entries, exact_first: bool = True):
        self.exact_first = exact_first
        ordered = sorted(entries, key=lambda kw: kw[0].encode("utf-8"))
        self._keys = np.array([k for k, _ in ordered], dtype=object)
        self._weights = np.array([w for _, w in ordered], dtype=np.int64)

    def lookup(self, prefix: str, num: int = 5) -> list[tuple[str, int]]:
        if num <= 0:
            raise ValueError("num must be > 0")
        lo = np.searchsorted(self._keys, prefix, side="left")
        hi = np.searchsorted(self._keys, prefix + chr(0x10FFFF), side="right")
        if lo >= hi:
            return []
        keys = self._keys[lo:hi]
        weights = self._weights[lo:hi]
        out = []
        budget = num
        if self.exact_first and len(keys) and keys[0] == prefix:
            out.append((prefix, int(weights[0])))
            keys, weights = keys[1:], weights[1:]
            budget -= 1
        order = sorted(range(len(keys)),
                       key=lambda i: (-weights[i], keys[i].encode("utf-8")))
        out.extend((str(keys[i]), int(weights[i])) for i in order[:budget])
        return out

    def get(self, key: str) -> int | None:
        i = np.searchsorted(self._keys, key, side="left")
        if i < len(self._keys) and self._keys[i] == key:
            return int(self._weights[i])
        return None


# ---------------------------------------------------------------------------
# TSTLookup — a genuine ternary search tree
# ---------------------------------------------------------------------------


class TernaryTreeNode:
    """`suggest/tst/TernaryTreeNode.java` — splitchar + lo/eq/hi kids."""

    __slots__ = ("splitchar", "lo", "eq", "hi", "token", "val")

    def __init__(self):
        self.splitchar = ""
        self.lo = self.eq = self.hi = None
        self.token = None
        self.val = None


class TSTLookup:
    """Ternary-search-tree completion (`TSTLookup.java:103-200`,
    `TSTAutocomplete.java:40-140`): build sorts keys (UTF-16 code-unit
    order in the reference; Python's code-point sort matches on the BMP)
    and inserts middle-first for balance; `lookup` DFS-completes the
    prefix, optionally re-ranked by weight (`only_more_popular`)."""

    def __init__(self, entries=()):
        self.root = None
        ordered = sorted(entries, key=lambda kw: kw[0])
        if ordered:
            self.root = TernaryTreeNode()
            self._balanced(
                [k for k, _ in ordered], [w for _, w in ordered],
                0, len(ordered) - 1)

    # `TSTAutocomplete.balancedTree`
    def _balanced(self, tokens, vals, lo, hi):
        if lo > hi:
            return
        mid = (lo + hi) // 2
        self.root = self._insert(self.root, tokens[mid], vals[mid], 0)
        self._balanced(tokens, vals, lo, mid - 1)
        self._balanced(tokens, vals, mid + 1, hi)

    # `TSTAutocomplete.insert` (iterative on the eq-descent to dodge
    # Python's recursion limit on long keys)
    def _insert(self, node, s: str, val, x: int):
        if not s or len(s) <= x:
            return node
        if node is None:
            node = TernaryTreeNode()
            node.splitchar = s[x]
        if node.splitchar > s[x]:
            node.lo = self._insert(node.lo, s, val, x)
        elif node.splitchar == s[x]:
            if x < len(s) - 1:
                node.eq = self._insert(node.eq, s, val, x + 1)
            else:
                node.token = s
                node.val = val
        else:
            node.hi = self._insert(node.hi, s, val, x)
        return node

    def add(self, key: str, val) -> None:
        if self.root is None:
            self.root = TernaryTreeNode()
            self.root.splitchar = key[0]
        self.root = self._insert(self.root, key, val, 0)

    def get(self, key: str):
        for node in self._prefix_completion(key):
            if node.token == key:
                return node.val
        return None

    # `TSTAutocomplete.prefixCompletion` — DFS with the reference's exact
    # stack order (hi pushed last → popped first after eq/lo)
    def _prefix_completion(self, s: str):
        p, x = self.root, 0
        while p is not None:
            if s[x] < p.splitchar:
                p = p.lo
            elif s[x] == p.splitchar:
                if x == len(s) - 1:
                    break
                x += 1
                p = p.eq
            else:
                p = p.hi
        suggest = []
        if p is None:
            return suggest
        if p.eq is None and p.token is None:
            return suggest
        if p.eq is None and p.token is not None:
            suggest.append(p)
            return suggest
        if p.token is not None:
            suggest.append(p)
        stack = [p.eq]
        while stack:
            top = stack.pop()
            if top.token is not None:
                suggest.append(top)
            if top.eq is not None:
                stack.append(top.eq)
            if top.lo is not None:
                stack.append(top.lo)
            if top.hi is not None:
                stack.append(top.hi)
        return suggest

    def lookup(self, prefix: str, num: int = 5,
               only_more_popular: bool = False) -> list[tuple[str, int]]:
        nodes = self._prefix_completion(prefix)
        if not nodes:
            return []
        if only_more_popular:
            ranked = sorted(nodes, key=lambda n: (-int(n.val), n.token))
            return [(n.token, int(n.val)) for n in ranked[:num]]
        return [(n.token, int(n.val)) for n in nodes[:num]]


# ---------------------------------------------------------------------------
# Dictionaries (InputIterator sources)
# ---------------------------------------------------------------------------


# Driver-side FST/TST builds are in-heap by design (like the reference's
# suggester FSTs), so a dictionary pull must be dictionary-sized: refuse a
# silent corpus-sized take_all() if a caller passes the raw documents table.
MAX_DICTIONARY_ROWS = 5_000_000


def _guard_dictionary_rows(ds, what: str) -> None:
    n = ds.count()
    if n > MAX_DICTIONARY_ROWS:
        raise ValueError(
            f"{what} pulls every (term, weight) pair to the driver for the "
            f"in-heap suggester build; {n} rows > {MAX_DICTIONARY_ROWS}. "
            f"Pre-aggregate to a dictionary-sized dataset first.")


def document_dictionary(ds, field: str, weight_field: str | None = None
                        ) -> list[tuple[str, int]]:
    """`suggest/DocumentDictionary.java`: every stored value of `field`
    with its weight from `weight_field` (0 when absent).  Distributed:
    one column-pruned projection; only the (term, weight) pairs reach the
    driver."""
    _guard_dictionary_rows(ds, "document_dictionary")
    cols = [field] + ([weight_field] if weight_field else [])
    rows = ds.select_columns(cols).take_all()
    out = []
    for r in rows:
        t = r[field]
        if t is None:
            continue
        out.append((str(t), int(r[weight_field]) if weight_field else 0))
    return out


def document_value_source_dictionary(ds, field: str, expr: str
                                     ) -> list[tuple[str, int]]:
    """`suggest/DocumentValueSourceDictionary.java`: weight from a scoring
    expression over the document's numeric columns (the LongValuesSource
    role, reusing the expressions compiler)."""
    from .expressions import compile_expression

    fn, names = compile_expression(expr)

    def weigh(batch):
        import pyarrow as pa

        env = {name: batch.column(name).to_numpy(zero_copy_only=False)
               .astype(np.float64) for name in names}
        w = fn(env)
        return pa.table({field: batch.column(field),
                         "__weight": pa.array(np.asarray(w, dtype=np.int64))})

    _guard_dictionary_rows(ds, "document_value_source_dictionary")
    rows = ds.map_batches(weigh, batch_format="pyarrow").take_all()
    return [(str(r[field]), int(r["__weight"]))
            for r in rows if r[field] is not None]


def plain_text_dictionary(path: str) -> list[tuple[str, int]]:
    """`spell/PlainTextDictionary.java`: one word per line, weight 1."""
    out = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            w = line.strip()
            if w:
                out.append((w, 1))
    return out


# ---------------------------------------------------------------------------
# SuggestStopFilter
# ---------------------------------------------------------------------------


def suggest_stop_tokens(text: str, stopset) -> list[str]:
    """`analysis/.../SuggestStopFilter.java` semantics: remove stopwords,
    but KEEP a trailing stopword when nothing follows it in the raw input
    (end offset == len(text)) — the user may still be typing it ("a" in
    "mai ta" should survive; in "mai ta " it should not)."""
    from ..analysis.standard import analyze_detailed

    toks = analyze_detailed(text)
    out = []
    for i, (term, _pos, _start, end, _ty) in enumerate(toks):
        if term not in stopset:
            out.append(term)
        elif i == len(toks) - 1 and end == len(text):
            out.append(term)        # trailing, still being typed: keep
    return out


# ---------------------------------------------------------------------------
# StringDistance family (`search/spell/*Distance.java`)
# ---------------------------------------------------------------------------


def levenshtein_distance(target: str, other: str) -> float:
    """`spell/LevenshteinDistance.java`: 1 - edits / max(len) (plain
    Levenshtein, no transpositions)."""
    n, m = len(target), len(other)
    if n == 0 or m == 0:
        return 1.0 if n == m else 0.0
    p = np.arange(n + 1, dtype=np.int64)
    t = np.frombuffer(target.encode("utf-32-le"), dtype=np.uint32)
    for j in range(1, m + 1):
        d = np.empty(n + 1, dtype=np.int64)
        d[0] = j
        cost = (t != ord(other[j - 1])).astype(np.int64)
        # row-wise DP needs the running minimum; vectorize the diagonal
        # and top terms, then resolve the left term sequentially
        diag = p[:-1] + cost
        top = p[1:] + 1
        best = np.minimum(diag, top)
        for i in range(1, n + 1):
            d[i] = min(d[i - 1] + 1, best[i - 1])
        p = d
    return 1.0 - float(np.float32(p[n]) / np.float32(max(n, m)))


def lucene_levenshtein_distance(target: str, other: str) -> float:
    """`spell/LuceneLevenshteinDistance.java`: Damerau (optimal string
    alignment, matching FuzzyTermsEnum with transpositions) scaled as
    1 - d / min(len) over full codepoints."""
    t = [ord(c) for c in target]
    o = [ord(c) for c in other]
    n, m = len(t), len(o)
    if n == 0 or m == 0:
        return 0.0 if n == m else float(max(n, m))
    d = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        d[i][0] = i
    for j in range(m + 1):
        d[0][j] = j
    for j in range(1, m + 1):
        for i in range(1, n + 1):
            cost = 0 if t[i - 1] == o[j - 1] else 1
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                          d[i - 1][j - 1] + cost)
            if (i > 1 and j > 1 and t[i - 1] == o[j - 2]
                    and t[i - 2] == o[j - 1]):
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + cost)
    return 1.0 - float(np.float32(d[n][m]) / np.float32(min(m, n)))


def jaro_winkler_distance(s1: str, s2: str, threshold: float = 0.7) -> float:
    """`spell/JaroWinklerDistance.java:37-105`: Jaro similarity with the
    Winkler common-prefix bonus above `threshold`."""
    if len(s1) > len(s2):
        mx, mn = s1, s2
    else:
        mx, mn = s2, s1
    rng = max(len(mx) // 2 - 1, 0)
    match_idx = [-1] * len(mn)
    match_flags = [False] * len(mx)
    matches = 0
    for mi, c1 in enumerate(mn):
        for xi in range(max(mi - rng, 0), min(mi + rng + 1, len(mx))):
            if not match_flags[xi] and c1 == mx[xi]:
                match_idx[mi] = xi
                match_flags[xi] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    ms1 = [mn[i] for i in range(len(mn)) if match_idx[i] != -1]
    ms2 = [mx[i] for i in range(len(mx)) if match_flags[i]]
    transpositions = sum(a != b for a, b in zip(ms1, ms2)) // 2
    prefix = 0
    for a, b in zip(s1, s2):
        if a != b:
            break
        prefix += 1
    # float32 arithmetic step-for-step like the Java float expression —
    # the reference's boundary assertions (e.g. 0.84 < d) depend on it
    f32 = np.float32
    m = f32(matches)
    j = (m / f32(len(s1)) + m / f32(len(s2))
         + (m - f32(transpositions)) / m) / f32(3)
    if j < threshold:
        return float(j)
    jw = j + min(f32(0.1), f32(1) / f32(len(mx))) * f32(prefix) * (f32(1) - j)
    return float(jw)


def ngram_distance(source: str, target: str, n: int = 2) -> float:
    """`spell/NGramDistance.java:34-133`: Levenshtein over n-gram windows
    with null-prefix padding and partial (fractional) substitution costs,
    scaled as 1 - d / max(len)."""
    sl, tl = len(source), len(target)
    if sl == 0 or tl == 0:
        return 1.0 if sl == tl else 0.0
    if sl < n or tl < n:
        cost = sum(1 for i in range(min(sl, tl)) if source[i] == target[i])
        return float(np.float32(cost) / np.float32(max(sl, tl)))
    sa = "\x00" * (n - 1) + source
    p = np.arange(sl + 1, dtype=np.float64)
    for j in range(1, tl + 1):
        if j < n:
            t_j = "\x00" * (n - j) + target[:j]
        else:
            t_j = target[j - n:j]
        d = np.empty(sl + 1, dtype=np.float64)
        d[0] = j
        for i in range(1, sl + 1):
            cost, tn = 0, n
            for ni in range(n):
                if sa[i - 1 + ni] != t_j[ni]:
                    cost += 1
                elif sa[i - 1 + ni] == "\x00":
                    tn -= 1         # discount matches on the null prefix
            ec = cost / tn
            d[i] = min(d[i - 1] + 1, p[i] + 1, p[i - 1] + ec)
        p = d
    return 1.0 - float(np.float32(p[sl]) / np.float32(max(tl, sl)))
