"""Driver-facing suggester pipeline: build an AnalyzingSuggester store over
the documents table (surface = text, weight = n_chars) and run a prefix
lookup.  SQL-checkable: the analyzed key is the \\x1f-joined token stream,
which DuckDB reproduces with regexp tokenization on this ASCII corpus."""

from __future__ import annotations

import os

import pyarrow as pa

from ..search.suggest import MANIFEST, Suggester, build_suggester
from . import textstats

CACHE_ROOT = "/tmp/lucene_ray_indexes"


def _store_dir(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    # v2: entries carry ContextSuggestField labels (the lang column)
    d = os.path.join(CACHE_ROOT, f"suggest2_{tag}")
    if not os.path.exists(os.path.join(d, MANIFEST)):
        import ray.data

        ds = ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["text", "n_chars", "lang"])
        build_suggester(ds, d, text_col="text", weight_col="n_chars",
                        contexts_col="lang")
    return d


def suggest_contexts(sf_dir: str, prefix: str = "merge", ctx: str = "en",
                     k: int = 10) -> pa.Table:
    """Context-filtered completions (ContextQuery any-of over
    ContextSuggestField labels): only suggestions carrying the ``ctx``
    label, ranked by weight desc, key asc."""
    s = Suggester(_store_dir(sf_dir))
    got = s.lookup(prefix, k, exact_first=False, contexts={ctx})
    return pa.table({
        "surface": pa.array([g[0] for g in got], type=pa.string()),
        "weight": pa.array([g[1] for g in got], type=pa.int64()),
    })


def train_freetext(sf_dir: str, max_order: int = 3, min_count: int = 1,
                   max_grams_per_order: int | None = 1 << 20):
    """n-gram language model for the FreeTextSuggester
    (`suggest/src/java/org/apache/lucene/suggest/analyzing/
    FreeTextSuggester.java:1-800`: ShingleFilter n-grams → weighted FST;
    here: distributed n-gram counting — per-batch vectorized gram extraction
    → ``groupby(gram)`` sum — with the counts kept as plain dicts, the
    broadcastable model).  Returns {"counts": {order: {gram_str: n}},
    "totals": {order: Σ}, "max_order": o}; grams join tokens with '\\x1e'
    (the reference's separator).

    ``max_grams_per_order`` defaults to 2^20 so web-scale n-gram tables
    never materialize on the driver (per-block top-k combiner below);
    corpora under the cap get the exact uncapped model.  ``None``
    (explicit, small-data/tests only) disables the guard."""
    import numpy as np
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .textstats import _flat_tokens_np

    SEP = "\x1e"

    def partial(t: pa.Table) -> pa.Table:
        import polars as pl

        from .textstats import _grams_pl

        flat, lens = _flat_tokens_np(t.column("text"))
        parts = []
        for o in range(1, max_order + 1):
            # Arrow-native grams (polars zero-copy slices + concat_str —
            # no object-dtype round-trip; r4 verdict hygiene finding)
            g = _grams_pl(flat, lens, o, sep=SEP)
            if not len(g):
                continue
            parts.append(pl.DataFrame(
                {"gram": g,
                 "order": pl.Series(np.full(len(g), o, dtype=np.int64))}))
        if not parts:
            return pa.table({"gram": pa.array([], type=pa.string()),
                             "order": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        tl = pl.concat(parts)
        agg = tl.group_by(["gram", "order"]).agg(
            pl.len().cast(pl.Int64).alias("cnt"))
        return agg.to_arrow().cast(pa.schema([
            ("gram", pa.string()), ("order", pa.int64()), ("cnt", pa.int64())]))

    agg = (rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["text"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby(["gram", "order"])
           .aggregate(Sum("cnt", alias_name="cnt")))
    if max_grams_per_order is not None:
        # 100-TB guard: web-scale trigram vocabularies dwarf driver memory.
        # Per-block top-k combiner (blocks hold disjoint grams after the
        # groupby), then the final head() — the same shape as
        # textstats.top_terms; the full gram table never reaches the driver.
        m = max_grams_per_order

        def local_topk(t: pa.Table) -> pa.Table:
            import polars as pl

            return (pl.from_arrow(t)
                    .sort(["cnt", "gram"], descending=[True, False])
                    .group_by("order", maintain_order=True)
                    .head(m)
                    .select(t.column_names)        # polars group_by reorders
                    .to_arrow().cast(t.schema))

        df = (agg.map_batches(local_topk, batch_format="pyarrow").to_pandas()
              .sort_values(["cnt", "gram"], ascending=[False, True])
              .groupby("order", sort=False).head(m))
    else:
        df = agg.to_pandas()
    counts: dict[int, dict[str, int]] = {o: {} for o in range(1, max_order + 1)}
    for gram, order, cnt in df.itertuples(index=False):
        if cnt >= min_count:
            counts[int(order)][gram] = int(cnt)
    totals = {o: sum(counts[o].values()) for o in counts}
    return {"counts": counts, "totals": totals, "max_order": max_order}


def freetext_lookup(model, text: str, k: int = 5, alpha: float = 0.4):
    """Stupid-backoff next-word suggestion (`FreeTextSuggester.lookup`
    semantics): the longest available context order scores candidates
    count(context·w)/count(context); each backoff level multiplies by
    ALPHA (= 0.4, `FreeTextSuggester.java` ALPHA) and only contributes
    words the higher orders did not already offer.  A trailing partial
    token (no trailing separator) becomes a prefix filter on the suggested
    word; with a TRAILING separator the unigram order is skipped (the
    reference's empty-fragment rule).  Returns [(word, score)] sorted
    score desc, word asc."""
    from .textstats import simple_tokens

    SEP = "\x1e"
    toks = simple_tokens(text)
    prefix = ""
    if text and not text[-1].isspace() and toks:
        prefix, toks = toks[-1], toks[:-1]
    counts, totals = model["counts"], model["totals"]
    max_order = model["max_order"]
    out: dict[str, float] = {}
    backoff = 0
    for order in range(min(max_order, len(toks) + 1), 0, -1):
        if order == 1 and not prefix and text:
            # FreeTextSuggester.lookup:523-525: with an ENDED last token
            # the unigram order's fragment is empty and the order is
            # skipped (no all-vocabulary dump after a trailing separator)
            continue
        ctx = toks[len(toks) - (order - 1):]
        ctx_key = SEP.join(ctx)
        if order > 1:
            denom = counts[order - 1].get(ctx_key, 0)
        else:
            denom = totals[1]
        if denom:
            pre = ctx_key + SEP if ctx_key else ""
            for gram, c in counts[order].items():
                if not gram.startswith(pre):
                    continue
                w = gram[len(pre):]
                if SEP in w or (prefix and not w.startswith(prefix)):
                    continue
                if w not in out:
                    out[w] = (alpha ** backoff) * c / denom
        backoff += 1
    ranked = sorted(out.items(), key=lambda x: (-x[1], x[0]))[:k]
    return ranked


def suggest_freetext(sf_dir: str, contexts=("the", "merge", "data"),
                     k: int = 5):
    """(context, rank, term, score) — bigram/unigram FreeTextSuggester over
    the documents table for fixed one-word contexts.  SQL-checkable EXACTLY:
    each score is one float64 division of integer counts (plus one 0.4
    multiply on the backoff path) evaluated in the same operation order as
    the oracle, so the values compare bit-identical unrounded."""
    import pandas as pd

    model = train_freetext(sf_dir, max_order=2)
    rows = []
    for ctx in contexts:
        for rank, (w, s) in enumerate(freetext_lookup(model, ctx + " ", k=k),
                                      start=1):
            rows.append((ctx, rank, w, s))
    return pd.DataFrame(rows, columns=["context", "rank", "term", "score"]) \
        .astype({"context": "object", "rank": "int64", "term": "object",
                 "score": "float64"})


def suggest_freetext_oracle_sql(contexts=("the", "merge", "data"),
                                k: int = 5) -> str:
    """DuckDB twin of suggest_freetext (same tokenizer, same backoff)."""
    ctx_values = ", ".join(f"('{c}')" for c in contexts)
    return f"""
WITH toklists AS (
  SELECT doc_id, list_transform(regexp_extract_all(text, '[A-Za-z0-9]+'),
                                x -> lower(x)) AS toks FROM documents),
tok_pos AS (
  SELECT doc_id, unnest(toks) AS term,
         generate_subscripts(toks, 1) AS pos FROM toklists),
big AS (
  SELECT a.term AS ctx, b.term AS nxt, count(*)::BIGINT AS c
  FROM tok_pos a JOIN tok_pos b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  GROUP BY 1, 2),
uni AS (SELECT term, count(*)::BIGINT AS c FROM tok_pos GROUP BY 1),
tot AS (SELECT count(*)::BIGINT AS t FROM tok_pos),
ctxs(ctx) AS (VALUES {ctx_values}),
cand AS (
  SELECT c.ctx, b.nxt AS term, b.c::DOUBLE / u.c AS score
  FROM ctxs c JOIN big b ON b.ctx = c.ctx JOIN uni u ON u.term = c.ctx
  UNION ALL
  SELECT c.ctx, u.term, 0.4 * u.c / (SELECT t FROM tot) AS score
  FROM ctxs c CROSS JOIN uni u
  WHERE NOT EXISTS (SELECT 1 FROM big b
                    WHERE b.ctx = c.ctx AND b.nxt = u.term))
SELECT ctx AS context,
       row_number() OVER (PARTITION BY ctx
                          ORDER BY score DESC, term ASC)::BIGINT AS rank,
       term, score
FROM cand
QUALIFY rank <= {k}
ORDER BY context, rank
"""


def suggest_analyzing(sf_dir: str, prefix: str = "merge",
                      k: int = 10) -> pa.Table:
    """Top-k completions of `prefix` by weight desc, key asc (exactFirst
    off so the ordering is pure-SQL-expressible)."""
    s = Suggester(_store_dir(sf_dir))
    got = s.lookup(prefix, k, exact_first=False)
    return pa.table({
        "surface": pa.array([g[0] for g in got], type=pa.string()),
        "weight": pa.array([g[1] for g in got], type=pa.int64()),
    })


def suggest_blended(sf_dir: str, query: str = "merge",
                    k: int = 10) -> pa.Table:
    """BlendedInfixSuggester lookup: infix candidates re-scored by the
    position of the first matching token (position_linear blending)."""
    s = Suggester(_store_dir(sf_dir))
    got = s.lookup_blended(query, k)
    return pa.table({
        "surface": pa.array([g[0] for g in got], type=pa.string()),
        "score": pa.array([g[1] for g in got], type=pa.int64()),
    })


def suggest_fuzzy(sf_dir: str, query: str = "mergw",
                  k: int = 10) -> pa.Table:
    """FuzzySuggester lookup (maxEdits=1 past the first char)."""
    s = Suggester(_store_dir(sf_dir))
    got = s.lookup_fuzzy(query, k)
    return pa.table({
        "surface": pa.array([g[0] for g in got], type=pa.string()),
        "weight": pa.array([g[1] for g in got], type=pa.int64()),
    })


def _term_count_entries(sf_dir: str) -> list[tuple[str, int]]:
    """(term, occurrence-count) dictionary from the distributed term_counts
    aggregate — the DocumentDictionary role feeding the Lookup variants.
    Only the aggregated vocabulary reaches the driver."""
    t = _pa_concat(textstats.term_counts(sf_dir).to_arrow_refs())
    return list(zip(t.column("term").to_pylist(),
                    t.column("n_occurrences").to_pylist()))


def _pa_concat(refs):
    import ray

    tables = [r for r in ray.get(refs) if r.num_rows] or [ray.get(refs[0])]
    return pa.concat_tables(tables)


def suggest_wfst(sf_dir: str, prefix: str = "s", k: int = 5) -> pa.Table:
    """WFSTCompletionLookup over the corpus term dictionary
    (`suggest/.../fst/WFSTCompletionLookup.java`): exact weights,
    (weight desc, key asc); exactFirst off so the order is pure SQL."""
    from ..search.lookups import WFSTCompletionLookup

    lk = WFSTCompletionLookup(_term_count_entries(sf_dir), exact_first=False)
    got = lk.lookup(prefix, k)
    return pa.table({
        "key": pa.array([g[0] for g in got], type=pa.string()),
        "weight": pa.array([g[1] for g in got], type=pa.int64()),
    })


def suggest_fst_bucketed(sf_dir: str, prefix: str = "s", k: int = 10,
                         buckets: int = 4) -> pa.Table:
    """FSTCompletionLookup over the corpus term dictionary
    (`suggest/.../fst/FSTCompletionLookup.java:180-240`): weights
    discretized to rank-based buckets (equal weights share the run-start
    bucket), results by (bucket desc, key asc)."""
    from ..search.lookups import FSTCompletionLookup

    lk = FSTCompletionLookup(_term_count_entries(sf_dir), buckets=buckets,
                             exact_first=False)
    got = lk.lookup(prefix, k)
    return pa.table({
        "key": pa.array([g[0] for g in got], type=pa.string()),
        "bucket": pa.array([g[1] for g in got], type=pa.int64()),
    })


def _spell_store_dir(sf_dir: str) -> str:
    """Build (or reuse) the n-gram spell store over the transcript index's
    own term dictionary (LuceneDictionary path — the reference's
    `spellChecker.indexDictionary(new LuceneDictionary(reader, field))`)."""
    from ..search.spellchecker import build_spell_store

    tag = os.path.basename(os.path.normpath(sf_dir))
    d = os.path.join(CACHE_ROOT, f"spell_{tag}")
    if not os.path.exists(os.path.join(d, "field_stats.json")):
        from .flagship import build_transcript_index

        build_spell_store(build_transcript_index(sf_dir), d)
    return d


def spellcheck_suggest(sf_dir: str, word: str = "parts", num_sug: int = 5,
                       accuracy: float = 0.35) -> pa.Table:
    """Classic SpellChecker suggestSimilar through the driver gate
    (`spell/SpellChecker.java:305-409`): dictionary = the index's term
    dictionary, retrieval = gram-bucket point reads, re-rank = Levenshtein
    score with the accuracy cutoff.  ``max_hits`` is unbounded so the
    result is retrieval-order independent (the SQL-twinnable mode); the
    SQL twin reproduces the candidate condition (shares a query n-gram
    with n inside BOTH length ranges) and the (score desc, word asc)
    order with integer-exact filters.  Columns (word, dist, score 4dp)."""
    from ..search.spellchecker import SUGGEST_ALWAYS, SpellChecker

    checker = SpellChecker(_spell_store_dir(sf_dir), accuracy=accuracy)
    got = checker.suggest_words(word, num_sug, suggest_mode=SUGGEST_ALWAYS,
                                max_hits=1 << 30)
    dists = [int(round((1.0 - s) * max(len(word), len(w))))
             for s, _f, w in got]
    return pa.table({
        "word": pa.array([w for _s, _f, w in got], type=pa.string()),
        "dist": pa.array(dists, type=pa.int64()),
        "score": pa.array([round(float(s), 4) for s, _f, _w in got],
                          type=pa.float64()),
    })
