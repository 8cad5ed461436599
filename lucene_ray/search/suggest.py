"""Analyzing / fuzzy completion suggesters — the FST-suggester surface
(`suggest/src/java/org/apache/lucene/search/suggest/analyzing/
AnalyzingSuggester.java:1-900`, `FuzzySuggester.java:1-270`) re-expressed
Ray-Data-first.

The reference builds one FST from (surface, weight) pairs whose arcs are
the ANALYZED form of the surface (tokens joined by SEP_LABEL 0x1f,
preserveSep=true) with weights on the paths; lookup walks the analyzed
query prefix (FuzzySuggester intersects a Levenshtein automaton instead of
the literal prefix).  Here:

- **build**: a Ray Dataset of (text, weight) rows is analyzed in
  `map_batches` (pyarrow, vectorized tokenizer), keyed by the
  \\x1f-joined token stream, globally sorted by key (the one wide op —
  the analogue of the reference's offline sorter), and written as
  sorted parquet shards with a per-shard [min,max] key manifest.  Shards
  stay sorted on disk, so lookups touch only shards whose key range
  intersects the prefix — the FST's prefix-walk pruning, re-expressed as
  manifest range pruning.
- **lookup**: binary search (np.searchsorted) inside each candidate
  shard for the analyzed prefix range; rank by (exactFirst, weight desc,
  key asc) like TopNSearcher with exactFirst=true.
- **lookup_fuzzy**: FuzzySuggester defaults (maxEdits=1,
  nonFuzzyPrefix=1, minFuzzyLength=3, transpositions as unit edits):
  keys sharing the first nonFuzzyPrefix chars are candidate-pruned via
  the manifest, then a banded edit-distance DP over each DISTINCT
  candidate prefix decides whether some prefix of the key is within
  maxEdits of the analyzed query.

Scale: the sorted build streams through `Dataset.sort`; lookups load only
pruned shards (cached per process).  Suggestion corpora (query logs,
titles) are small next to the corpus itself; per-shard columnar binary
search keeps the driver footprint at one shard's keys.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEP = "\x1f"          # AnalyzingSuggester.SEP_LABEL (preserveSep=true)
MANIFEST = "suggest_manifest.json"


def analyzed_key(text: str) -> str:
    from ..analysis.standard import analyze

    return SEP.join(analyze(text))


def build_suggester(ds, out_dir: str, *, text_col: str = "text",
                    weight_col: str = "weight",
                    contexts_col: str | None = None,
                    num_partitions: int | None = None) -> dict:
    """Build a sorted suggester store from a Ray Dataset of
    (text_col, weight_col[, contexts_col]) rows.  ``contexts_col`` (a
    string or list<string> column) attaches ContextSuggestField-style
    labels to each suggestion; context-filtered lookups keep only entries
    sharing at least one label (ContextQuery any-of semantics).  Returns
    the manifest dict."""
    from ..analysis.standard import tokenize_column

    def _key_batch(t: pa.Table) -> pa.Table:
        lengths, flat = tokenize_column(t.column(text_col))
        toks = np.asarray(flat, dtype=object)
        starts = np.concatenate(([0], np.cumsum(lengths)))
        keys = [SEP.join(toks[starts[i]:starts[i + 1]])
                for i in range(len(lengths))]
        cols = {
            "key": pa.array(keys, type=pa.string()),
            "surface": pa.compute.cast(t.column(text_col), pa.string()),
            "weight": pa.compute.cast(t.column(weight_col), pa.int64()),
        }
        if contexts_col is not None:
            c = t.column(contexts_col).combine_chunks()
            if pa.types.is_string(c.type):
                n = len(c)
                c = pa.ListArray.from_arrays(
                    pa.array(np.arange(n + 1, dtype=np.int32)),
                    pa.compute.cast(c, pa.string()))
            cols["contexts"] = c
        out = pa.table(cols)
        return out.filter(pa.compute.not_equal(out.column("key"), ""))

    keyed = ds.map_batches(_key_batch, batch_format="pyarrow")
    if num_partitions:
        keyed = keyed.repartition(num_partitions)
    ordered = keyed.sort("key")

    os.makedirs(out_dir, exist_ok=True)
    shards = []
    # write each sorted block as its own shard, recording its key range
    for i, ref in enumerate(ordered.to_arrow_refs()):
        import ray

        t = ray.get(ref)
        if t.num_rows == 0:
            continue
        fn = f"shard-{i:05d}.parquet"
        pq.write_table(t, os.path.join(out_dir, fn))
        keys = t.column("key")
        shards.append({"file": fn,
                       "min": str(keys[0]), "max": str(keys[-1]),
                       "rows": t.num_rows})
    manifest = {"shards": shards, "sep": SEP}
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f)
    return manifest


def _prefix_within_edits(key: str, q: str, max_edits: int) -> bool:
    """True iff some prefix of `key` is within `max_edits` edits of `q`
    (the automaton-intersection acceptance test).  Transpositions count
    as ONE edit (FuzzySuggester.DEFAULT_TRANSPOSITIONS=true — the
    LevenshteinAutomata are built with Damerau transpositions)."""
    m = len(q)
    # band the DP: only key prefixes up to m + max_edits can qualify
    key = key[: m + max_edits]
    prev2: list[int] | None = None
    prev = list(range(m + 1))          # edits for key-prefix length 0
    if prev[m] <= max_edits:
        return True
    for j, kc in enumerate(key, 1):
        cur = [j] + [0] * m
        for i in range(1, m + 1):
            c = min(prev[i] + 1,               # delete from q
                    cur[i - 1] + 1,            # insert into q
                    prev[i - 1] + (q[i - 1] != kc))
            if (prev2 is not None and i > 1 and j > 1
                    and q[i - 1] == key[j - 2] and q[i - 2] == kc):
                c = min(c, prev2[i - 2] + 1)   # transposition
            cur[i] = c
        if cur[m] <= max_edits:
            return True
        if min(cur) > max_edits:
            return False
        prev2, prev = prev, cur
    return False


class Suggester:
    """Reader over a `build_suggester` store."""

    def __init__(self, dir_: str):
        self.dir = dir_
        with open(os.path.join(dir_, MANIFEST)) as f:
            self.manifest = json.load(f)
        self._cache: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}

    def _shard(self, fn: str):
        got = self._cache.get(fn)
        if got is None:
            t = pq.read_table(os.path.join(self.dir, fn))
            ctx = None
            if "contexts" in t.column_names:
                ctx = np.asarray([set(x) if x is not None else set()
                                  for x in t.column("contexts").to_pylist()],
                                 dtype=object)
            got = (np.asarray(t.column("key"), dtype=object).astype(str),
                   np.asarray(t.column("surface"), dtype=object),
                   t.column("weight").to_numpy(), ctx)
            self._cache[fn] = got
        return got

    def _candidates(self, lo_key: str, hi_key: str):
        for s in self.manifest["shards"]:
            if s["max"] >= lo_key and s["min"] < hi_key:
                yield self._shard(s["file"])

    def lookup(self, query: str, num: int = 5,
               exact_first: bool = True,
               contexts: set | None = None) -> list[tuple[str, int]]:
        """Completions for the analyzed prefix of `query`, ranked by
        (exact match first, weight desc, key asc).  ``contexts`` keeps only
        entries sharing at least one label (ContextQuery any-of —
        `suggest/document/ContextQuery.java` filter mode over
        ContextSuggestField labels)."""
        kq = analyzed_key(query)
        if not kq:
            return []
        # PRESERVE_SEP trailing-separator rule (TestAnalyzingSuggester
        # testEndingSpace; TokenStreamToAutomaton appends a SEP when the
        # raw query ends past the last token's end offset): "i " requires
        # "i" to be a COMPLETE token, so the match prefix becomes key+SEP
        # and the bare key itself no longer qualifies.  isalnum
        # approximates "last char is token-internal" for the UAX#29
        # tokenizer: trailing separators and DROPPED trailing punctuation
        # (apostrophe, period) both read ended, exactly like the
        # reference's final-offset test; a tokenizer-probe variant
        # misfires at the 255-char token chop, so the char test stays.
        ended = bool(query) and not query[-1].isalnum()
        pre = kq + SEP if ended else kq
        hi = pre + "￿"
        # duplicate (analyzed, surface) entries keep the max weight — the
        # reference's build-time dedup (AnalyzingSuggester.build seen-set;
        # TestAnalyzingSuggester testKeyword / testDupSurfaceFormsMissing-
        # Results3).  Done at lookup over the pruned range: result-set
        # equal to the build-time dedup for num <= the per-form cap.
        best: dict[tuple[str, str], int] = {}
        for keys, surfaces, weights, ctxs in self._candidates(pre, hi):
            lo_i = int(np.searchsorted(keys, pre, side="left"))
            hi_i = int(np.searchsorted(keys, hi, side="left"))
            for i in range(lo_i, hi_i):
                if contexts is not None and (
                        ctxs is None or not (ctxs[i] & contexts)):
                    continue
                k2, s2, w2 = keys[i], str(surfaces[i]), int(weights[i])
                cur = best.get((k2, s2))
                if cur is None or w2 > cur:
                    best[(k2, s2)] = w2
        out = [(k, s, w) for (k, s), w in best.items()]
        # equal weights tie-break on the surface form
        # (testTieBreakOnSurfaceForm), after the analyzed key
        out.sort(key=lambda x: (not (exact_first and x[0] == kq),
                                -x[2], x[0], x[1]))
        return [(s, w) for _, s, w in out[:num]]

    def lookup_fuzzy(self, query: str, num: int = 5, *,
                     max_edits: int = 1, non_fuzzy_prefix: int = 1,
                     min_fuzzy_length: int = 3,
                     contexts: set | None = None) -> list[tuple[str, int]]:
        """FuzzySuggester lookup: like `lookup` but the analyzed query may
        differ from the key prefix by up to `max_edits` edits past the
        first `non_fuzzy_prefix` chars; queries shorter than
        `min_fuzzy_length` fall back to exact prefix matching.
        ``contexts`` filters like `lookup`."""
        kq = analyzed_key(query)
        if not kq:
            return []
        if len(kq) < min_fuzzy_length:
            return self.lookup(query, num, contexts=contexts)
        fixed = kq[:non_fuzzy_prefix]
        lo_key, hi_key = fixed, fixed + "￿"
        exact = kq
        seen: dict[tuple[str, str], int] = {}
        decided: dict[str, bool] = {}
        probe = len(kq) + max_edits
        for keys, surfaces, weights, ctxs in self._candidates(lo_key, hi_key):
            lo_i = int(np.searchsorted(keys, lo_key, side="left"))
            hi_i = int(np.searchsorted(keys, hi_key, side="left"))
            for i in range(lo_i, hi_i):
                if contexts is not None and (
                        ctxs is None or not (ctxs[i] & contexts)):
                    continue
                k = keys[i]
                pref = k[:probe]
                ok = decided.get(pref)
                if ok is None:
                    ok = _prefix_within_edits(pref, kq, max_edits)
                    decided[pref] = ok
                if ok:
                    seen[(k, str(surfaces[i]))] = max(
                        seen.get((k, str(surfaces[i])), -1), int(weights[i]))
        out = [(k, s, w) for (k, s), w in seen.items()]
        out.sort(key=lambda x: (not x[0] == exact, -x[2], x[0]))
        return [(s, w) for _, s, w in out[:num]]

    # ---- infix + blended lookups -------------------------------------

    def _infix_matches(self, query: str):
        """(key_tokens, surface, weight, first_match_pos) for suggestions
        matching every analyzed query token — earlier tokens exactly, the
        LAST token as a prefix (`AnalyzingInfixSuggester.lookup`'s
        finishFirstToken handling).  Scans every shard (no range pruning
        for infix matching, like the reference's dedicated internal
        index)."""
        kq = analyzed_key(query)
        if not kq:
            return
        qtoks = kq.split(SEP)
        exact, last = qtoks[:-1], qtoks[-1]
        for s in self.manifest["shards"]:
            keys, surfaces, weights, _ctxs = self._shard(s["file"])
            for i in range(len(keys)):
                ktoks = keys[i].split(SEP)
                first = None
                ok = True
                for t in exact:
                    pos = next((j for j, kt in enumerate(ktoks) if kt == t),
                               None)
                    if pos is None:
                        ok = False
                        break
                    first = pos if first is None or pos < first else first
                if not ok:
                    continue
                pos = next((j for j, kt in enumerate(ktoks)
                            if kt.startswith(last)), None)
                if pos is None:
                    continue
                first = pos if first is None or pos < first else first
                yield ktoks, str(surfaces[i]), int(weights[i]), int(first)

    def lookup_infix(self, query: str, num: int = 5) -> list[tuple[str, int]]:
        """AnalyzingInfixSuggester surface: suggestions containing every
        query token (last = prefix), ranked by weight desc, surface asc."""
        out = [(s, w) for _, s, w, _ in self._infix_matches(query)]
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:num]

    def lookup_blended(self, query: str, num: int = 5, *,
                       blender_type: str = "position_linear",
                       num_factor: int = 10,
                       exponent: float = 2.0) -> list[tuple[str, int]]:
        """BlendedInfixSuggester lookup (`suggest/analyzing/
        BlendedInfixSuggester.java:159-365`): infix candidates fetched
        num × num_factor deep by raw weight, then re-scored by the position
        of the FIRST matching token —

        - ``position_linear``:                 weight × (1 − 0.10·pos)
        - ``position_reciprocal``:             weight / (1 + pos)
        - ``position_exponential_reciprocal``: weight / (1 + pos)^exponent

        with the reference's weight adjustments (0 → 1; |w| < 10 scaled ×10
        to keep integer blending precision) and the final long truncation.
        Returns [(surface, blended_score)]."""
        cands = sorted(self._infix_matches(query),
                       key=lambda x: (-x[2], x[1]))[:num * num_factor]
        out = []
        for _ktoks, surface, w, pos in cands:
            if w == 0:
                w = 1
            if -10 < w < 10:                  # 1 / LINEAR_COEF
                w *= 10
            if blender_type == "position_linear":
                coef = 1.0 - 0.10 * pos
            elif blender_type == "position_reciprocal":
                coef = 1.0 / (1.0 + pos)
            elif blender_type == "position_exponential_reciprocal":
                coef = 1.0 / ((1.0 + pos) ** exponent)
            else:
                raise ValueError(f"unknown blender_type {blender_type!r}")
            out.append((surface, int(w * coef)))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:num]


def build_suggester_from_file(path: str, out_dir: str,
                              delimiter: str = "\t") -> dict:
    """FileDictionary (`suggest/.../FileDictionary.java:33-60`) input
    adapter: each line is ``term[<TAB>weight[<TAB>payload]]`` (missing
    weight = 1, like the reference); parsed distributed via
    ray.data.read_text into the sorted suggester store.  Payloads ride
    along as the suggestion surface when present."""
    import pyarrow as pa
    import ray.data as rd

    def parse(batch: pa.Table) -> pa.Table:
        texts, weights = [], []
        for line in batch.column("text").to_pylist():
            if not line or not line.strip():
                continue
            parts = line.split(delimiter)
            texts.append(parts[0])
            try:
                weights.append(int(float(parts[1])) if len(parts) > 1 else 1)
            except ValueError:
                weights.append(1)
        return pa.table({"text": pa.array(texts, type=pa.string()),
                         "weight": pa.array(weights, type=pa.int64())})

    ds = rd.read_text(path).map_batches(parse, batch_format="pyarrow")
    return build_suggester(ds, out_dir, text_col="text", weight_col="weight")


def build_suggester_from_index(index_dir: str, out_dir: str, *,
                               min_freq: float = 0.0,
                               weight: str = "df",
                               num_partitions: int | None = None) -> dict:
    """Suggester input from the index's own term dictionary —
    LuceneDictionary (`suggest/.../LuceneDictionary.java:30-55`, all terms
    of a field) and HighFrequencyDictionary
    (`suggest/.../spell/HighFrequencyDictionary.java:30-95`, terms whose
    docFreq >= (int)(min_freq * numDocs), weight = docFreq).

    Reads the index's bucketed term-stats store as a parquet Dataset (the
    global (term, df, ttf) table the build already merged — never the
    per-shard dictionaries on the driver), filters distributed, and feeds
    the sorted suggester store.  Keyword-namespace terms
    (``field\\x1fvalue``) are excluded like the reference's per-field
    Terms walk."""
    import ray.data as rd

    from ..index.manifest import latest_commit
    from ..index.shard import KEYWORD_SEP

    commit = latest_commit(index_dir)
    if commit is None:
        raise FileNotFoundError(f"no commit in {index_dir}")
    num_docs = int(commit["doc_count"])
    min_num_docs = int(min_freq * float(num_docs))
    wcol = {"df": "df", "ttf": "ttf"}[weight]

    def prep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.invert(pc.match_substring(t.column("term"), KEYWORD_SEP))
        if min_num_docs > 0:
            keep = pc.and_(keep, pc.greater_equal(
                t.column("df"), pa.scalar(min_num_docs, type=pa.int64())))
        t = t.filter(keep)
        return pa.table({"text": t.column("term"),
                         "weight": t.column(wcol)})

    ds = (rd.read_parquet(os.path.join(index_dir, "term_stats"))
          .map_batches(prep, batch_format="pyarrow"))
    return build_suggester(ds, out_dir, text_col="text",
                           weight_col="weight",
                           num_partitions=num_partitions)
