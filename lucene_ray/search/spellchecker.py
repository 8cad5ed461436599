"""Classic n-gram SpellChecker (`suggest/src/java/org/apache/lucene/search/
spell/SpellChecker.java:1-689`), re-expressed Ray-Data-first.

The reference builds an auxiliary Lucene index over the dictionary: per word
of length L, fields ``gram{n}`` (every n-gram, DOCS_AND_FREQS, norms
omitted), ``start{n}`` / ``end{n}`` (first / last gram, StringField) for n
in [getMin(L), getMax(L)]; ``suggestSimilar`` retrieves the top
``10 * numSug`` candidates with a SHOULD query over the misspelling's grams
(start^2.0, end^1.0), then re-ranks by StringDistance with the accuracy
cutoff tightening to the queue minimum (SpellChecker.java:326-409).

Here the spell index is a **bucketed parquet posting store** built as a
Dataset pipeline (vocabulary-bounded — the same scale class as the index's
term-stats store) and the lookup is a point read of only the buckets that
hold the query's grams:

  <out>/postings/bucket=K/   rows (field, gram, word, wfreq, dfreq)
  <out>/words/bucket=K/      rows (word, freq)      — exist()/self checks
  <out>/field_stats.json     per gram-field (doc_count, sum_ttf)

Candidate retrieval scores each clause with the reference's BM25 under
omitted norms (norm byte 1 -> doc length 1.0, avgdl from the gram field's
collection stats, k1=1.2 b=0.75, `BM25Similarity.java:240-252` operation
order) so the top-``10*numSug`` truncation matches the reference's ranking;
docID tie-break = dictionary insertion order = sorted word order
(`indexDictionary` walks the Dictionary iterator, which is term-sorted for
LuceneDictionary).  The re-rank stage is the literal reference loop:
distance >= accuracy, user-index frequency gates per SuggestMode, and the
SuggestWordQueue comparator (score, then freq, then REVERSED string —
`SuggestWordScoreComparator.java:24-46` — so the final list is score desc,
freq desc, word asc)."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

K1 = 1.2
B = 0.75
F_WORD = "word"


def get_min(length: int) -> int:
    """`SpellChecker.getMin`: 3 above length 5, 2 at 5, else 1."""
    if length > 5:
        return 3
    if length == 5:
        return 2
    return 1


def get_max(length: int) -> int:
    """`SpellChecker.getMax`: 4 above length 5, 3 at 5, else min(l, 2)."""
    if length > 5:
        return 4
    if length == 5:
        return 3
    return min(length, 2)


def form_grams(text: str, ng: int) -> list[str]:
    """`SpellChecker.formGrams`: all n-grams, duplicates kept."""
    if len(text) < ng:
        return []
    return [text[i:i + ng] for i in range(len(text) - ng + 1)]


def _word_rows(word: str):
    """The reference ``createDocument``/``addGram`` expansion of one word:
    (field, gram, wfreq) rows — gram fields carry in-word frequencies
    (duplicates aggregated), start/end are single DOCS-only terms."""
    out = []
    length = len(word)
    for ng in range(get_min(length), get_max(length) + 1):
        grams = form_grams(word, ng)
        if not grams:
            continue
        counts = {}
        for g in grams:
            counts[g] = counts.get(g, 0) + 1
        key = f"gram{ng}"
        out.extend((key, g, c) for g, c in counts.items())
        out.append((f"start{ng}", grams[0], 1))
        out.append((f"end{ng}", grams[-1], 1))
    return out


def _bucket_of(s: str, num_buckets: int) -> int:
    """Stable FNV-1a bucket (process-seed-independent, unlike hash())."""
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h % num_buckets


def build_spell_store(source, out_dir: str, *, num_buckets: int = 32,
                      min_freq: float = 0.0) -> dict:
    """Index the dictionary (`SpellChecker.indexDictionary:482-545`).

    ``source`` is an index directory (dictionary = the index's merged
    term-stats store, LuceneDictionary semantics — keyword-namespace terms
    excluded, weight = docFreq) or a ``ray.data.Dataset`` with columns
    (word, freq).  Words shorter than 3 chars are skipped, as the
    reference.  Fully distributed: gram expansion per batch, postings
    hash-partitioned by gram so one lookup touches only its grams'
    buckets; the only driver materialization is the ~8-row field-stats
    table."""
    import ray.data as rd

    if isinstance(source, str):
        from ..index.manifest import latest_commit
        from ..index.shard import KEYWORD_SEP

        commit = latest_commit(source)
        if commit is None:
            raise FileNotFoundError(f"no commit in {source}")
        min_df = int(min_freq * float(commit["doc_count"]))

        def prep(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            keep = pc.invert(pc.match_substring(t.column("term"),
                                                KEYWORD_SEP))
            if min_df > 0:
                keep = pc.and_(keep, pc.greater_equal(
                    t.column("df"), pa.scalar(min_df, type=pa.int64())))
            t = t.filter(keep)
            return pa.table({"word": t.column("term"),
                             "freq": t.column("df")})

        ds = (rd.read_parquet(os.path.join(source, "term_stats"),
                              columns=["term", "df"])
              .map_batches(prep, batch_format="pyarrow"))
    else:
        ds = source

    def explode(t: pa.Table) -> pa.Table:
        words = t.column("word").to_pylist()
        freqs = t.column("freq").to_pylist()
        fields, grams, ws, wfreqs, dfreqs, buckets = [], [], [], [], [], []
        for w, fq in zip(words, freqs):
            if w is None or len(w) < 3:     # "too short we bail"
                continue
            for field, gram, wf in _word_rows(w):
                fields.append(field)
                grams.append(gram)
                ws.append(w)
                wfreqs.append(wf)
                dfreqs.append(int(fq))
                buckets.append(_bucket_of(gram, num_buckets))
        return pa.table({
            "bucket": pa.array(buckets, type=pa.int32()),
            "field": pa.array(fields, type=pa.string()),
            "gram": pa.array(grams, type=pa.string()),
            "word": pa.array(ws, type=pa.string()),
            "wfreq": pa.array(wfreqs, type=pa.int32()),
            "dfreq": pa.array(dfreqs, type=pa.int64()),
        })

    postings = ds.map_batches(explode, batch_format="pyarrow")
    postings.write_parquet(os.path.join(out_dir, "postings"),
                           partition_cols=["bucket"])

    def word_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lens = pc.utf8_length(t.column("word"))
        t = t.filter(pc.greater_equal(lens, 3))
        buckets = [_bucket_of(w, num_buckets)
                   for w in t.column("word").to_pylist()]
        return pa.table({"bucket": pa.array(buckets, type=pa.int32()),
                         "word": t.column("word"),
                         "freq": t.column("freq")})

    ds.map_batches(word_rows, batch_format="pyarrow") \
        .write_parquet(os.path.join(out_dir, "words"),
                       partition_cols=["bucket"])

    # per-field CollectionStatistics: docCount + sumTotalTermFreq (start/
    # end are DOCS-only, so their ttf == df); field-count-bounded groupby
    def fstat(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = t.group_by(["field", "word"]).aggregate([("wfreq", "sum")])
        out = out.group_by("field").aggregate(
            [("wfreq_sum", "sum"), ("word", "count")])
        return pa.table({"field": out.column("field"),
                         "ttf": pc.cast(out.column("wfreq_sum_sum"),
                                        pa.int64()),
                         "doc_count": pc.cast(out.column("word_count"),
                                              pa.int64())})

    # partial per batch -> tiny global groupby (fields x batches rows).
    # a word's rows for one field always land in one batch?  NO — grams of
    # one word hit many buckets, but explode() emits all of a word's rows
    # inside the batch that held the word, so the per-batch (field, word)
    # count is exact before partitioning.
    STATS_SCHEMA = pa.schema([("field", pa.string()), ("ttf", pa.int64()),
                              ("doc_count", pa.int64())])
    parts = ds.map_batches(
        lambda t: (fstat(explode(t)).cast(STATS_SCHEMA) if t.num_rows
                   else STATS_SCHEMA.empty_table()),
        batch_format="pyarrow").materialize()
    agg = parts.to_arrow_refs()
    import ray as _ray

    tables = [t for t in (_ray.get(r) for r in agg) if t.num_rows]
    tbl = pa.concat_tables(tables) if tables \
        else STATS_SCHEMA.empty_table()
    tbl = tbl.group_by("field").aggregate([("ttf", "sum"),
                                           ("doc_count", "sum")])
    stats = {f: {"ttf": int(t), "doc_count": int(d)}
             for f, t, d in zip(tbl.column("field").to_pylist(),
                                tbl.column("ttf_sum").to_pylist(),
                                tbl.column("doc_count_sum").to_pylist())}
    meta = {"num_buckets": num_buckets, "fields": stats}
    with open(os.path.join(out_dir, "field_stats.json"), "w") as fh:
        json.dump(meta, fh)
    return meta


SUGGEST_WHEN_NOT_IN_INDEX = "when_not_in_index"
SUGGEST_MORE_POPULAR = "more_popular"
SUGGEST_ALWAYS = "always"

COMPARATOR_SCORE = "score"          # SuggestWordScoreComparator (default)
COMPARATOR_FREQUENCY = "frequency"  # SuggestWordFrequencyComparator


class SpellChecker:
    """Point-lookup / actor-state side of the store.  ``b_start``/``b_end``
    mirror the reference's prefix/suffix boosts (SpellChecker.java:75-80);
    ``distance`` defaults to LevenshteinDistance like the reference."""

    def __init__(self, store_dir: str, *, accuracy: float = 0.5,
                 b_start: float = 2.0, b_end: float = 1.0,
                 distance=None, comparator: str = COMPARATOR_SCORE):
        from .lookups import levenshtein_distance

        self.store_dir = store_dir
        self.accuracy = accuracy
        self.b_start = b_start
        self.b_end = b_end
        self.distance = distance or levenshtein_distance
        self.comparator = comparator   # setComparator(SuggestWord*Comparator)
        with open(os.path.join(store_dir, "field_stats.json")) as fh:
            meta = json.load(fh)
        self.num_buckets = meta["num_buckets"]
        self.field_stats = meta["fields"]
        self._bucket_cache: dict[int, pa.Table] = {}
        self._word_cache: dict[int, set] = {}

    # -- store reads ----------------------------------------------------
    def _bucket(self, k: int) -> pa.Table:
        t = self._bucket_cache.get(k)
        if t is None:
            import pyarrow.parquet as pq

            path = os.path.join(self.store_dir, "postings", f"bucket={k}")
            if os.path.isdir(path):
                t = pq.read_table(path,
                                  columns=["field", "gram", "word", "wfreq",
                                           "dfreq"])
            else:
                t = pa.table({"field": pa.array([], pa.string()),
                              "gram": pa.array([], pa.string()),
                              "word": pa.array([], pa.string()),
                              "wfreq": pa.array([], pa.int32()),
                              "dfreq": pa.array([], pa.int64())})
            self._bucket_cache[k] = t
        return t

    def exist(self, word: str) -> bool:
        """`SpellChecker.exist:465-478`."""
        k = _bucket_of(word, self.num_buckets)
        ws = self._word_cache.get(k)
        if ws is None:
            import pyarrow.parquet as pq

            path = os.path.join(self.store_dir, "words", f"bucket={k}")
            ws = set(pq.read_table(path, columns=["word"])
                     .column("word").to_pylist()) if os.path.isdir(path) \
                else set()
            self._word_cache[k] = ws
        return word in ws

    # -- retrieval ------------------------------------------------------
    def _clauses(self, word: str):
        """The suggestSimilar boolean query (`SpellChecker.java:326-352`):
        per n, start^b_start + end^b_end + one SHOULD clause per gram
        occurrence (duplicates are distinct clauses and sum)."""
        cl = []      # (field, gram, boost)
        length = len(word)
        for ng in range(get_min(length), get_max(length) + 1):
            grams = form_grams(word, ng)
            if not grams:
                continue
            if self.b_start > 0:
                cl.append((f"start{ng}", grams[0], self.b_start))
            if self.b_end > 0:
                cl.append((f"end{ng}", grams[-1], self.b_end))
            cl.extend((f"gram{ng}", g, 1.0) for g in grams)
        return cl

    def _retrieve(self, word: str, max_hits: int):
        """Top-``max_hits`` candidates by the gram query's BM25 score
        (norms omitted -> doc length 1.0; df per (field, gram) recounted
        from the loaded rows — a gram's postings are complete inside its
        hash bucket), ties by sorted-word docID order.  Vectorized: one
        merge + groupby over the candidate postings."""
        clauses = self._clauses(word)
        if not clauses:
            return []
        import pandas as pd
        import pyarrow.compute as pc

        weights = {}                       # (field, gram) -> summed boost
        for f, g, b in clauses:
            weights[(f, g)] = weights.get((f, g), 0.0) + b
        grams_arr = pa.array(sorted({g for _, g, _ in clauses}))
        parts = []
        for k in sorted({_bucket_of(g, self.num_buckets)
                         for _, g, _ in clauses}):
            t = self._bucket(k)
            parts.append(t.filter(pc.is_in(t.column("gram"),
                                           value_set=grams_arr)))
        t = pa.concat_tables(parts) if parts else None
        if t is None or t.num_rows == 0:
            return []
        df = t.to_pandas()
        cl = pd.DataFrame([(f, g, w) for (f, g), w in weights.items()],
                          columns=["field", "gram", "w8"])
        stats = pd.DataFrame(
            [(f, v["doc_count"], v["ttf"])
             for f, v in self.field_stats.items()],
            columns=["field", "N", "TTF"])
        df = df.merge(cl, on=["field", "gram"], how="inner") \
               .merge(stats, on="field", how="inner")
        if df.empty:
            return []
        dfg = df.groupby(["field", "gram"])["word"].transform("size") \
                .to_numpy().astype(np.float64)
        n = df["N"].to_numpy().astype(np.float64)
        idf = np.log(1.0 + (n - dfg + 0.5) / (dfg + 0.5))
        weight = df["w8"].to_numpy() * idf
        avgdl = df["TTF"].to_numpy() / n
        c = 1.0 / (K1 * ((1 - B) + B * 1.0 / avgdl))
        freq = np.where(df["field"].str.startswith("gram").to_numpy(),
                        df["wfreq"].to_numpy().astype(np.float64), 1.0)
        s = weight - weight / (1.0 + freq * c)
        agg = (pd.DataFrame({"word": df["word"], "s": s,
                             "dfreq": df["dfreq"]})
               .groupby("word", sort=False)
               .agg(score=("s", "sum"), dfreq=("dfreq", "first"))
               .reset_index()
               .sort_values(["score", "word"], ascending=[False, True],
                            kind="mergesort")
               .head(max_hits))
        return list(zip(agg["word"], agg["score"], agg["dfreq"]))

    # -- the reference suggestSimilar loop -------------------------------
    def suggest_similar(self, word: str, num_sug: int, searcher=None,
                        field: str = None,
                        suggest_mode: str = SUGGEST_WHEN_NOT_IN_INDEX,
                        accuracy: float | None = None,
                        max_hits: int | None = None) -> list[str]:
        """`SpellChecker.suggestSimilar:305-409` with the user index
        represented by an engine ``IndexSearcher`` (docFreq via
        ``count(TermQuery(...))``).  ``max_hits`` defaults to the
        reference's ``10 * numSug`` retrieval truncation; pass a large
        value to re-rank the full gram-sharing candidate set (then the
        result is independent of the retrieval scoring — the
        SQL-twinnable mode)."""
        return [w for _, _, w in
                self.suggest_words(word, num_sug, searcher, field,
                                   suggest_mode, accuracy, max_hits)]

    def suggest_words(self, word: str, num_sug: int, searcher=None,
                      field: str = None,
                      suggest_mode: str = SUGGEST_WHEN_NOT_IN_INDEX,
                      accuracy: float | None = None,
                      max_hits: int | None = None) -> list[tuple]:
        """suggest_similar returning the full SuggestWord tuples
        (score, freq, string), final order score desc / freq desc /
        string asc."""
        from .query import TermQuery

        if searcher is None or field is None:
            suggest_mode = SUGGEST_ALWAYS
        if suggest_mode == SUGGEST_ALWAYS:
            searcher = None
            field = None
        acc = self.accuracy if accuracy is None else accuracy

        def user_freq(w: str) -> int:
            if searcher is None:
                return 0
            t = w if field == "text" else f"{field}\x1f{w}"
            return searcher.count(TermQuery(t, field))

        freq = user_freq(word) if searcher is not None else 0
        goal_freq = freq if suggest_mode == SUGGEST_MORE_POPULAR else 0
        if suggest_mode == SUGGEST_WHEN_NOT_IN_INDEX and freq > 0:
            return [(1.0, freq, word)]

        if max_hits is None:
            max_hits = 10 * num_sug
        queue: list[tuple] = []            # (score, freq, word)

        if self.comparator == COMPARATOR_FREQUENCY:
            # SuggestWordFrequencyComparator.java:24-46: freq first
            def key(x):
                return (x[1], x[0], _RevStr(x[2]))
        else:
            def key(x):
                return (x[0], x[1], _RevStr(x[2]))

        def least(q):
            # queue "top" = least by the configured comparator
            return min(q, key=key)

        for cand, _s, _df in self._retrieve(word, max_hits):
            if cand == word:
                continue
            score = self.distance(word, cand)
            if score < acc:
                continue
            if searcher is not None and field is not None:
                cfreq = user_freq(cand)
                if (suggest_mode == SUGGEST_MORE_POPULAR
                        and goal_freq > cfreq) or cfreq < 1:
                    continue
            else:
                cfreq = 0    # SuggestWord.freq stays 0 without a user
                             # index (SpellChecker.java:384-390 guard)
            queue.append((score, cfreq, cand))
            if len(queue) > num_sug:
                queue.remove(least(queue))
            if len(queue) == num_sug:
                # tighten to the queue top's SCORE whatever the comparator
                # (SpellChecker.java:393-398 reads sugQueue.top().score)
                acc = least(queue)[0]
        queue.sort(key=key, reverse=True)
        # reverse=True flips _RevStr too, giving word ASC — the reference's
        # pop-order reversal (SpellChecker.java:402-407)
        return queue


class _RevStr:
    """Reversed string ordering for the queue's third criterion
    (`SuggestWordScoreComparator.java:43-45`: second.compareTo(first))."""

    __slots__ = ("s",)

    def __init__(self, s):
        self.s = s

    def __lt__(self, other):
        return self.s > other.s

    def __eq__(self, other):
        return self.s == other.s


class SpellCheckStage:
    """Actor-pool batch corrector: store opened once per actor
    (`map_batches(SpellCheckStage, fn_constructor_kwargs=..., concurrency=N)`),
    each batch's ``word`` column mapped to its top suggestion (or null)."""

    def __init__(self, store_dir: str, num_sug: int = 5, **kw):
        self.checker = SpellChecker(store_dir, **kw)
        self.num_sug = num_sug

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for w in batch.column("word").to_pylist():
            sugg = self.checker.suggest_similar(w, self.num_sug)
            out.append(sugg[0] if sugg else None)
        return batch.append_column("suggestion",
                                   pa.array(out, type=pa.string()))
