"""End-to-end corpus curation — the composed training-data pipeline.

The individual stages exist as standalone operators (quality signals,
repetition filters, exact dedup, split assignment); this module chains
them the way a real pre-training data pipeline does, as ONE streaming
`ray.data.Dataset` program:

    read → per-batch signals (tokens, repetition fractions)
         → threshold filters (Gopher-style)
         → exact dedup (md5 groupby, min-doc_id representative)
         → deterministic train/val/test split
         → (doc_id, lang, split, n_tokens, dup_word_frac)

Everything stays lazy until the terminal consumption: signals and filters
are one `map_batches` pass (no row loops — the same segmented-numpy
counting as `textstats.repetition_stats`), dedup is the only shuffle
(groupby on the 128-bit content hash), and the split is pure arithmetic on
doc_id.  At 100 TB this is: one streaming scan, one hash shuffle whose
keys are content hashes (uniform by construction — no skew), no driver
materialization.  The whole program has an exact DuckDB twin (md5 +
window-min + integer-hash arithmetic), so the composition — not just the
stages — is correctness-gated.

Filter thresholds (Gopher-ish, tuned for the synthetic corpus so every
branch is exercised): n_tokens >= 5, dup_word_frac <= 0.6,
top_word_frac <= 0.35.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .textstats import _KNUTH, _SPLIT_EDGES, _flat_tokens_np, _read_documents

MIN_TOKENS = 5
MAX_DUP_WORD_FRAC = 0.6
MAX_TOP_WORD_FRAC = 0.35


def _signals(batch: pa.Table) -> pa.Table:
    """One pass: token counts + repetition fractions + content hash."""
    flat, lens = _flat_tokens_np(batch.column("text"))
    n_docs = len(lens)
    dup = np.zeros(n_docs)
    topw = np.zeros(n_docs)
    if lens.sum() > 0:
        toks = flat.to_numpy()
        _, codes = np.unique(toks, return_inverse=True)
        v = np.int64(codes.max() + 1)
        didx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        key = didx * v + codes
        key.sort()
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        run_len = np.diff(np.r_[starts, len(key)])
        run_doc = key[starts] // v
        distinct = np.bincount(run_doc, minlength=n_docs).astype(np.float64)
        np.maximum.at(topw, run_doc, run_len.astype(np.float64))
        with np.errstate(divide="ignore", invalid="ignore"):
            total = lens.astype(np.float64)
            dup = np.where(total > 0, 1.0 - distinct / total, 0.0)
            topw = np.where(total > 0, topw / total, 0.0)
    texts = pa.compute.fill_null(batch.column("text"), "").to_pylist()
    md5 = [hashlib.md5(s.encode()).hexdigest() for s in texts]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "lang": batch.column("lang"),
        "text_md5": pa.array(md5, pa.string()),
        "n_tokens": pa.array(lens, pa.int64()),
        "dup_word_frac": pa.array(np.round(dup, 6), pa.float64()),
        "top_word_frac": pa.array(np.round(topw, 6), pa.float64()),
    })


def _quality_mask(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    keep = pc.and_(
        pc.and_(pc.greater_equal(t["n_tokens"], MIN_TOKENS),
                pc.less_equal(t["dup_word_frac"], MAX_DUP_WORD_FRAC)),
        pc.less_equal(t["top_word_frac"], MAX_TOP_WORD_FRAC))
    return t.filter(keep)


def _assign_split(t: pa.Table) -> pa.Table:
    edges = [(int(frac * 2**32), name) for frac, name in _SPLIT_EDGES]
    ids = t.column("doc_id").to_numpy().astype(np.uint64)
    h = ((ids % np.uint64(2**32)) * np.uint64(_KNUTH)) % np.uint64(2**32)
    split = np.full(len(ids), "test", dtype=object)
    for hi, name in reversed(edges):
        split[h < hi] = name
    return t.append_column("split", pa.array(split, pa.string()))


def curate_corpus(sf_dir: str):
    """The composed pipeline; returns the curated-survivor table
    (doc_id, lang, split, n_tokens, dup_word_frac) sorted by doc_id."""
    signals = (_read_documents(sf_dir,
                               columns=("doc_id", "text", "lang"))
               .map_batches(_signals, batch_format="pyarrow")
               .map_batches(_quality_mask, batch_format="pyarrow"))

    # exact dedup in ONE hash shuffle, fully vectorized: pack each row into
    # a zero-padded-doc_id-prefixed string so the native Min aggregate
    # selects the min-doc_id ROW per content hash (argmin-by-proxy — no
    # per-group Python callback), then unpack.  Groupby keys are content
    # hashes: uniform by construction, no salting needed.
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    def pack(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        lang = t.column("lang").to_pylist()
        nt = t.column("n_tokens").to_numpy()
        dup = t.column("dup_word_frac").to_numpy()
        rows = [f"{i:012d}|{lg}|{n}|{d:.6f}"
                for i, lg, n, d in zip(ids, lang, nt, dup)]
        return pa.table({"text_md5": t.column("text_md5"),
                         "packed": pa.array(rows, pa.string())})

    def unpack(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t.column("packed"), "|")
        lists = parts.to_pylist()
        return pa.table({
            "doc_id": pa.array([int(p[0]) for p in lists], pa.int64()),
            "lang": pa.array([p[1] for p in lists], pa.string()),
            "n_tokens": pa.array([int(p[2]) for p in lists], pa.int64()),
            "dup_word_frac": pa.array([float(p[3]) for p in lists],
                                      pa.float64()),
        })

    survivors = (signals.map_batches(pack, batch_format="pyarrow")
                 .groupby("text_md5")
                 .aggregate(Min("packed", alias_name="packed"))
                 .map_batches(unpack, batch_format="pyarrow"))
    out = survivors.map_batches(_assign_split, batch_format="pyarrow")
    df = (out.select_columns(["doc_id", "lang", "split", "n_tokens",
                              "dup_word_frac"])
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    return df


def curation_oracle_sql() -> str:
    e = [(int(frac * 2**32), name) for frac, name in _SPLIT_EDGES]
    return f"""
        WITH toklists AS (SELECT doc_id, lang, text, list_transform(
                 regexp_extract_all(text, '[A-Za-z0-9]+'),
                 x -> lower(x)) AS toks FROM documents),
        tokens AS (SELECT doc_id, unnest(toks) AS term FROM toklists),
        tc AS (SELECT doc_id, term, count(*)::DOUBLE AS c FROM tokens
               GROUP BY doc_id, term),
        agg AS (SELECT doc_id, sum(c) AS total,
                       count(*)::DOUBLE AS distinct_terms, max(c) AS top
                FROM tc GROUP BY doc_id),
        sig AS (SELECT t.doc_id, t.lang, md5(coalesce(t.text, '')) AS h,
                       coalesce(a.total, 0)::BIGINT AS n_tokens,
                       round(CASE WHEN a.total > 0
                             THEN 1 - a.distinct_terms/a.total
                             ELSE 0 END, 6) AS dup_word_frac,
                       round(CASE WHEN a.total > 0 THEN a.top/a.total
                             ELSE 0 END, 6) AS top_word_frac
                FROM toklists t LEFT JOIN agg a USING (doc_id)),
        q AS (SELECT * FROM sig
              WHERE n_tokens >= {MIN_TOKENS}
                AND dup_word_frac <= {MAX_DUP_WORD_FRAC}
                AND top_word_frac <= {MAX_TOP_WORD_FRAC}),
        d AS (SELECT *, min(doc_id) OVER (PARTITION BY h) AS rep FROM q)
        SELECT doc_id, lang,
               CASE WHEN ((doc_id % 4294967296) * {_KNUTH}) % 4294967296
                         < {e[0][0]} THEN '{e[0][1]}'
                    WHEN ((doc_id % 4294967296) * {_KNUTH}) % 4294967296
                         < {e[1][0]} THEN '{e[1][1]}'
                    ELSE '{e[2][1]}' END AS split,
               n_tokens, dup_word_frac
        FROM d WHERE doc_id = rep ORDER BY doc_id"""
