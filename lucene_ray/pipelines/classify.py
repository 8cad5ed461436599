"""Classification — the reference's classification module re-expressed
Ray-Data-first.

Two classifiers:

- Multinomial Naive Bayes over a labeled corpus column
  (`classification/src/java/org/apache/lucene/classification/
  SimpleNaiveBayesClassifier.java:1-280`): log prior + per-token
  log-likelihood with add-one (Laplace) smoothing.  The reference computes
  word-in-class frequencies lazily per query through index term stats; here
  training is a distributed Ray Data aggregation (per-batch partial counts →
  ``groupby(cls, term)`` — the combiner pattern) and the fitted model is a
  broadcast lookup table (`ray.put` once, read per actor), so classifying a
  corpus is a single vectorized ``map_batches`` pass.
- k-nearest-neighbor over the inverted index
  (`classification/.../KNearestNeighborClassifier.java:1-250`): build a
  MoreLikeThis query from the input text, take BM25 top-k, majority class
  vote with score-sum tie-break (``classifyFromTopDocs``).  The class of a
  hit is resolved from the index itself — each class value's keyword
  postings (`role\\x1fuser` style) tested by sorted membership — so no
  stored-field fetch and no driver-side corpus state.

Scale notes (100 TB): NB training shuffles only (class, term) partial counts
(vocabulary-bounded, not corpus-bounded); `max_features` caps the broadcast
model by global-frequency feature selection (per-block top-k combiner — the
vocabulary itself never lands on the driver).  kNN classification is one
index search per input plus |classes| cached postings lookups per shard.

The tokenizer is the SIMPLE one shared with textstats (``[A-Za-z0-9]+``
lowercased) so Naive Bayes has an exact DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .textstats import _flat_tokens_np, _seg_starts

# ---------------------------------------------------------------------------
# Naive Bayes
# ---------------------------------------------------------------------------


def train_naive_bayes(sf_dir: str, class_col: str = "lang",
                      max_features: int | None = 1 << 20):
    """Fit a multinomial NB model over documents(text, class_col).

    Distributed: per-batch polars partial counts → ``groupby(cls, term)``
    global sum (all-to-all on the vocabulary, not the corpus).  Returns a
    plain dict of numpy arrays (the broadcastable model):
    ``classes`` (sorted str), ``log_prior`` (C,), ``vocab`` (sorted str),
    ``log_lik`` (V, C) for seen terms, ``log_lik_oov`` (C,) for unseen.

    ``max_features`` defaults to 2^20 so the driver materialization is
    bounded at web scale: feature selection (global-frequency top-k) AND
    the (class × term) filter both run distributed; only the ≤
    max_features × C selected rows ever reach the driver.  Corpora whose
    vocabulary fits under the cap get the exact uncapped model (top-k
    keeps everything).  ``None`` (explicit, small-data/tests only)
    materializes the full vocabulary.
    """
    import ray
    import ray.data as rd
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", class_col])

    def partial(t: pa.Table) -> pa.Table:
        import polars as pl

        flat, lens = _flat_tokens_np(t.column("text"))
        cls = t.column(class_col).to_numpy(zero_copy_only=False)
        tl = pl.DataFrame({
            "cls": np.repeat(cls, lens),
            "term": flat,
        })
        agg = tl.group_by(["cls", "term"]).agg(
            pl.len().cast(pl.Int64).alias("cnt"))
        return agg.to_arrow().cast(pa.schema([
            ("cls", pa.string()), ("term", pa.string()), ("cnt", pa.int64())]))

    # materialize the (class x term) aggregate ONCE: the selection pass and
    # the keep-filter both consume it, and an unmaterialized Dataset would
    # re-run the corpus read + tokenize per consumer.  The materialized set
    # is vocabulary-bounded (aggregate output), not corpus-sized.
    wc = (ds.map_batches(partial, batch_format="pyarrow")
          .groupby(["cls", "term"])
          .aggregate(Sum("cnt", alias_name="cnt"))
          .materialize())

    if max_features is not None and wc.count() > max_features:
        # feature selection by global term frequency: per-block top-k
        # combiner, then a k × n_blocks merge — the full vocabulary never
        # materializes on the driver (same shape as textstats.top_terms)
        from ray.data.aggregate import Sum as _Sum

        gl = wc.groupby("term").aggregate(_Sum("cnt", alias_name="gcnt"))

        def local_topk(t: pa.Table) -> pa.Table:
            return t.sort_by([("gcnt", "descending"),
                              ("term", "ascending")]).slice(0, max_features)

        keep_tbl = (gl.map_batches(local_topk, batch_format="pyarrow")
                    .to_pandas()
                    .sort_values(["gcnt", "term"], ascending=[False, True])
                    .head(max_features))
        # filter the (cls, term) table DISTRIBUTED against the broadcast
        # keep-set, so only <= max_features x C rows reach the driver
        keep_ref = ray.put(pa.array(keep_tbl["term"].to_numpy(), type=pa.string()))

        def keep_only(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t.column("term"), value_set=ray.get(keep_ref)))

        wc_df = wc.map_batches(keep_only, batch_format="pyarrow").to_pandas()
    else:
        wc_df = wc.to_pandas()

    # class priors from a small groupby (C rows)
    cls_df = (ds.groupby(class_col).count().to_pandas()
              .rename(columns={class_col: "cls", "count()": "nd"}))
    n_docs = int(cls_df["nd"].sum())

    classes = np.array(sorted(cls_df["cls"]))
    c_index = {c: i for i, c in enumerate(classes)}
    nd = np.zeros(len(classes), dtype=np.float64)
    for _, row in cls_df.iterrows():
        nd[c_index[row["cls"]]] = float(row["nd"])

    vocab = np.array(sorted(wc_df["term"].unique()))
    v_index = pd.Series(np.arange(len(vocab)), index=vocab)
    cnt = np.zeros((len(vocab), len(classes)), dtype=np.float64)
    ci = wc_df["cls"].map(c_index).to_numpy()
    vi = v_index[wc_df["term"]].to_numpy()
    cnt[vi, ci] = wc_df["cnt"].to_numpy().astype(np.float64)

    tot = cnt.sum(axis=0)                       # tokens per class (kept terms)
    v = float(len(vocab))                       # smoothing vocabulary size
    # SimpleNaiveBayesClassifier math: log(P(c)) + Σ log((tf+1)/(den));
    # den = class token mass + vocabulary size (add-one smoothing)
    log_prior = np.log(nd / n_docs)
    log_lik = np.log((cnt + 1.0) / (tot + v)[None, :])
    log_lik_oov = np.log(1.0 / (tot + v))
    return {"classes": classes, "log_prior": log_prior, "vocab": vocab,
            "log_lik": log_lik, "log_lik_oov": log_lik_oov}


def _nb_pred_ds(sf_dir: str, class_col: str,
                max_features: int | None, carry: tuple[str, ...] = ()):
    """Fit NB and return the scored Dataset of (doc_id, *carry, pred) — the
    shared one-broadcast + vectorized map_batches scoring pass behind both
    ``classify_naive_bayes`` and the confusion-matrix generator.

    Per batch: tokens resolve to vocab rows via ``pc.index_in`` (OOV → the
    smoothing row), per-doc per-class log-likelihood sums via a segmented
    ``np.add.reduceat`` over the (n_tokens, C) matrix — no Python loop over
    docs.  argmax ties break class-ascending (np.argmax takes the first
    maximum over the sorted class axis), mirrored by the SQL oracle's
    ``ORDER BY score DESC, cls ASC``."""
    import ray
    import ray.data as rd
    import pyarrow.compute as pc

    model = train_naive_bayes(sf_dir, class_col, max_features)
    lnp_ext = np.vstack([model["log_lik"], model["log_lik_oov"][None, :]])
    ref = ray.put((pa.array(model["vocab"]), lnp_ext,
                   model["log_prior"], model["classes"]))

    def score(t: pa.Table) -> pa.Table:
        vocab_arr, lnp_ext, log_prior, classes = ray.get(ref)
        oov_row = lnp_ext.shape[0] - 1
        flat, lens = _flat_tokens_np(t.column("text"))
        idx = pc.index_in(pa.array(flat.to_numpy(), type=pa.string()),
                          value_set=vocab_arr)
        idx = idx.to_numpy(zero_copy_only=False)
        idx = np.where(pd.isna(idx), oov_row, idx).astype(np.int64)
        scores = np.tile(log_prior, (len(lens), 1))
        nz = lens > 0
        if nz.any():
            scores[nz] += np.add.reduceat(
                lnp_ext[idx], _seg_starts(lens)[nz], axis=0)
        pred = classes[np.argmax(scores, axis=1)]
        cols = {"doc_id": t.column("doc_id")}
        for c in carry:
            cols[c] = t.column(c)
        cols["pred"] = pa.array(pred, type=pa.string())
        return pa.table(cols)

    read_cols = ["doc_id", "text"] + [c for c in carry if c != "text"]
    return (rd.read_parquet(f"{sf_dir}/documents.parquet", columns=read_cols)
            .map_batches(score, batch_format="pyarrow"))


def classify_naive_bayes(sf_dir: str, class_col: str = "lang",
                         max_features: int | None = 1 << 20) -> pd.DataFrame:
    """(doc_id, pred) — NB self-classification of every document: fit on the
    labeled corpus, then one broadcast + vectorized scoring pass
    (``assignClass`` over a stream instead of one text at a time)."""
    out = _nb_pred_ds(sf_dir, class_col, max_features).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


class ConfusionMatrix:
    """The reference's ConfusionMatrixGenerator.ConfusionMatrix
    (`classification/src/java/org/apache/lucene/classification/utils/
    ConfusionMatrixGenerator.java:158-330`): a linearized
    actual → (predicted → count) map with the reference's exact metric
    formulas — per-class precision tp/(tp+fp) (0 when tp==0), per-class
    recall tp/(tp+fn), F1 = 2pr/(p+r) (0 unless both positive), macro-
    averaged precision/recall over the matrix's actual-class rows, and
    the reference's accuracy accumulation (tn counted once per
    (klass, row-missing-klass) pair, faithfully reproduced)."""

    def __init__(self, counts: dict[str, dict[str, int]],
                 avg_classification_time: float = 0.0,
                 number_of_evaluated_docs: int | None = None):
        self.counts = counts
        self.avg_classification_time = avg_classification_time
        self.number_of_evaluated_docs = (
            number_of_evaluated_docs if number_of_evaluated_docs is not None
            else sum(v for row in counts.values() for v in row.values()))

    def precision(self, klass: str) -> float:
        row = self.counts.get(klass)
        tp = 0.0
        den = 0.0
        if row is not None:
            tp = float(row.get(klass, 0))
            for values in self.counts.values():
                if klass in values:
                    den += values[klass]
        return tp / den if tp > 0 else 0.0

    def recall(self, klass: str) -> float:
        row = self.counts.get(klass)
        tp = 0.0
        fn = 0.0
        if row is not None:
            for pred, n in row.items():
                if pred == klass:
                    tp += n
                else:
                    fn += n
        return tp / (tp + fn) if tp + fn > 0 else 0.0

    def f1(self, klass: str | None = None) -> float:
        p = self.macro_precision() if klass is None else self.precision(klass)
        r = self.macro_recall() if klass is None else self.recall(klass)
        return 2 * p * r / (p + r) if p > 0 and r > 0 else 0.0

    def macro_precision(self) -> float:
        if not self.counts:
            return 0.0
        return sum(self.precision(k) for k in self.counts) / len(self.counts)

    def macro_recall(self) -> float:
        if not self.counts:
            return 0.0
        return sum(self.recall(k) for k in self.counts) / len(self.counts)

    def accuracy(self) -> float:
        tp = tn = tfp = fn = 0.0
        for klass, row in self.counts.items():
            for pred, n in row.items():
                if pred == klass:
                    tp += n
                else:
                    fn += n
            for values in self.counts.values():
                if klass in values:
                    tfp += values[klass]
                else:
                    tn += 1
        den = tfp + fn + tn
        return (tp + tn) / den if den else 0.0


def classify_confusion(sf_dir: str, class_col: str = "lang",
                       max_features: int | None = 1 << 20) -> pd.DataFrame:
    """(actual, pred, n) — the confusion matrix of the NB self-classification
    as a distributed aggregation (the Ray-native
    ``ConfusionMatrixGenerator.getConfusionMatrix``): the scored stream is
    pre-aggregated per batch (C² combiner rows per block) and reduced by one
    vocabulary-free ``groupby(actual, pred)`` — no per-doc rows ever reach
    the driver, so the matrix costs one scoring pass at any corpus size."""
    from ray.data.aggregate import Sum

    ds = _nb_pred_ds(sf_dir, class_col, max_features, carry=(class_col,))

    def partial(t: pa.Table) -> pa.Table:
        import polars as pl

        tl = pl.DataFrame({
            "actual": t.column(class_col).to_numpy(zero_copy_only=False),
            "pred": t.column("pred").to_numpy(zero_copy_only=False),
        })
        agg = tl.group_by(["actual", "pred"]).agg(
            pl.len().cast(pl.Int64).alias("n"))
        return agg.to_arrow().cast(pa.schema([
            ("actual", pa.string()), ("pred", pa.string()),
            ("n", pa.int64())]))

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["actual", "pred"])
           .aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    return out.sort_values(["actual", "pred"]).reset_index(drop=True)


def confusion_matrix_nb(sf_dir: str, class_col: str = "lang",
                        max_features: int | None = 1 << 20) -> ConfusionMatrix:
    """ConfusionMatrix object (reference accessors) from the distributed
    counts."""
    df = classify_confusion(sf_dir, class_col, max_features)
    counts: dict[str, dict[str, int]] = {}
    for actual, pred, n in df.itertuples(index=False):
        counts.setdefault(actual, {})[pred] = int(n)
    return ConfusionMatrix(counts)


def confusion_oracle_sql(class_col: str = "lang") -> str:
    """DuckDB twin of classify_confusion: the NB-prediction oracle joined
    back to the labeled corpus and grouped to (actual, pred) counts."""
    return f"""
SELECT d.{class_col} AS actual, p.pred AS pred, count(*)::BIGINT AS n
FROM ({naive_bayes_oracle_sql(class_col)}) p
JOIN documents d USING (doc_id)
GROUP BY 1, 2
ORDER BY 1, 2
"""


def naive_bayes_oracle_sql(class_col: str = "lang") -> str:
    """DuckDB twin of classify_naive_bayes (same tokenizer, same smoothing,
    same tie-break)."""
    return f"""
WITH toklists AS (
  SELECT doc_id, {class_col} AS cls,
         list_transform(regexp_extract_all(text, '[A-Za-z0-9]+'),
                        x -> lower(x)) AS toks
  FROM documents),
tokens AS (SELECT doc_id, cls, unnest(toks) AS term FROM toklists),
cl AS (SELECT {class_col} AS cls, count(*)::DOUBLE AS nd
       FROM documents GROUP BY 1),
total AS (SELECT count(*)::DOUBLE AS n FROM documents),
wc AS (SELECT cls, term, count(*)::DOUBLE AS cnt FROM tokens GROUP BY 1, 2),
tot AS (SELECT cls, sum(cnt) AS tot FROM wc GROUP BY 1),
voc AS (SELECT count(DISTINCT term)::DOUBLE AS v FROM tokens),
tokscore AS (
  SELECT t.doc_id, c.cls,
         sum(ln((coalesce(w.cnt, 0) + 1)
                / (tt.tot + (SELECT v FROM voc)))) AS s
  FROM tokens t
  CROSS JOIN cl c
  LEFT JOIN wc w ON w.cls = c.cls AND w.term = t.term
  JOIN tot tt ON tt.cls = c.cls
  GROUP BY 1, 2),
scores AS (
  SELECT d.doc_id, c.cls,
         ln(c.nd / (SELECT n FROM total)) + coalesce(ts.s, 0) AS score
  FROM documents d
  CROSS JOIN cl c
  LEFT JOIN tokscore ts ON ts.doc_id = d.doc_id AND ts.cls = c.cls)
SELECT doc_id, cls AS pred
FROM scores
QUALIFY row_number() OVER (PARTITION BY doc_id
                           ORDER BY score DESC, cls ASC) = 1
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# k-nearest-neighbor over the index
# ---------------------------------------------------------------------------


def _keyword_classes(searcher, class_field: str) -> list[str]:
    """Distinct values of a keyword field, from the shards' sorted term
    dictionaries (prefix range over `field\\x1f`) — no corpus scan."""
    from ..index.shard import KEYWORD_SEP
    from ..search.searcher import _prefix_range

    prefix = f"{class_field}{KEYWORD_SEP}"
    vals: set[str] = set()
    for pid in searcher._pids:
        rdr = searcher.reader(pid)
        lo, hi = _prefix_range(rdr._term_np, prefix)
        for t in rdr._term_np[lo:hi]:
            vals.add(str(t)[len(prefix):])
    return sorted(vals)


def _classes_of_hits(searcher, gids: np.ndarray, class_field: str,
                     classes: list[str]) -> list[str | None]:
    """Resolve each hit's class by sorted-membership against the class
    values' keyword postings (per-shard, LRU-cached decode)."""
    from ..index.shard import keyword_term

    out: list[str | None] = [None] * len(gids)
    order = np.argsort(gids)
    # group hits by shard so each class's postings decode once per shard
    for pid in searcher._pids:
        base = searcher._bases[pid]
        rdr = searcher.reader(pid)
        in_shard = [i for i in order
                    if base <= gids[i] < base + rdr.doc_count]
        if not in_shard:
            continue
        local = np.array([gids[i] - base for i in in_shard], dtype=np.int64)
        for c in classes:
            tid = rdr.seek_exact(keyword_term(class_field, c))
            if tid < 0:
                continue
            docs, _ = rdr.postings(tid)
            pos = np.searchsorted(docs, local)
            hit = (pos < len(docs)) & (docs[np.minimum(pos, len(docs) - 1)]
                                       == local)
            for j, i in enumerate(in_shard):
                if hit[j]:
                    out[i] = c
    return out


def knn_classify(searcher, text: str, class_field: str = "role",
                 k: int = 10, classes: list[str] | None = None,
                 max_query_terms: int = 25, min_term_freq: int = 1,
                 min_doc_freq: int = 1):
    """`KNearestNeighborClassifier.assignClass`: MoreLikeThis query from the
    input text → BM25 top-k → per-class (votes, score-sum) from the top
    docs, winner by votes desc / score-sum desc / class asc
    (`classifyFromTopDocs` + `buildListFromTopDocs`).  Returns
    (predicted_class | None, votes, score_sum)."""
    from ..search.searcher import more_like_this

    q = more_like_this(searcher, text, max_query_terms=max_query_terms,
                       min_term_freq=min_term_freq, min_doc_freq=min_doc_freq)
    if not q.clauses:
        return None, 0, 0.0
    td = searcher.search(q, k=k)
    if not td.hits:
        return None, 0, 0.0
    if classes is None:
        classes = _keyword_classes(searcher, class_field)
    gids = np.array([h.gid for h in td.hits], dtype=np.int64)
    cls = _classes_of_hits(searcher, gids, class_field, classes)
    votes: dict[str, int] = {}
    ssum: dict[str, float] = {}
    for h, c in zip(td.hits, cls):
        if c is None:
            continue
        votes[c] = votes.get(c, 0) + 1
        ssum[c] = ssum.get(c, 0.0) + float(h.score)
    if not votes:
        return None, 0, 0.0
    best = sorted(votes, key=lambda c: (-votes[c], -ssum[c], c))[0]
    return best, votes[best], ssum[best]


def knn_classify_doc(searcher, gid: int, class_field: str = "role",
                     k: int = 10, classes: list[str] | None = None):
    """`KNearestNeighborDocumentClassifier.assignClass`: like knn_classify
    but the query is built from an INDEXED document's term vector
    (MoreLikeThis like(docNum)) instead of re-analyzed text."""
    from ..search.searcher import more_like_this_doc

    q = more_like_this_doc(searcher, gid, min_term_freq=1, min_doc_freq=1)
    if not q.clauses:
        return None, 0, 0.0
    td = searcher.search(q, k=k + 1)
    hits = [h for h in td.hits if h.gid != gid][:k]     # exclude self
    if not hits:
        return None, 0, 0.0
    if classes is None:
        classes = _keyword_classes(searcher, class_field)
    gids = np.array([h.gid for h in hits], dtype=np.int64)
    cls = _classes_of_hits(searcher, gids, class_field, classes)
    votes: dict[str, int] = {}
    ssum: dict[str, float] = {}
    for h, c in zip(hits, cls):
        if c is None:
            continue
        votes[c] = votes.get(c, 0) + 1
        ssum[c] = ssum.get(c, 0.0) + float(h.score)
    if not votes:
        return None, 0, 0.0
    best = sorted(votes, key=lambda c: (-votes[c], -ssum[c], c))[0]
    return best, votes[best], ssum[best]


def bm25_nb_classify(searcher, text: str, class_field: str = "role",
                     classes: list[str] | None = None):
    """`BM25NBClassifier.assignClassNormalizedList`
    (`classification/BM25NBClassifier.java:120-231`): naive bayes
    approximated with pure BM25 queries — per class c,
    score(c) = logPrior(c) + sum over input tokens w of
    log(top-1 BM25 score of bool(MUST class-term(c), SHOULD w)), where
    logPrior(c) = log(top-1 score of MUST class-term(c)) (0 when the class
    has no docs) and a token query with no hits contributes log(1) = 0.
    Scores are then softmax-normalized against the max
    (`normClassificationResults`: exp(score - logsumexp)).  Class terms are
    keyword postings; they score against the text-field collection stats
    (our keyword fields carry no separate norms — the reference's
    StringField likewise scores with norm 1).  Returns [(class, prob)]
    sorted best-first."""
    import math

    from ..analysis.standard import analyze
    from ..index.shard import keyword_term
    from ..search.query import BooleanClause, BooleanQuery, TermQuery

    if classes is None:
        classes = _keyword_classes(searcher, class_field)
    if not classes:
        return []
    tokens = list(analyze(text))
    scored: list[tuple[str, float]] = []
    for c in classes:
        ckey = keyword_term(class_field, c)
        must = BooleanClause(TermQuery(ckey), "MUST")
        prior_td = searcher.search(BooleanQuery((must,)), k=1)
        prior = math.log(prior_td.hits[0].score) if prior_td.hits else 0.0
        loglik = 0.0
        for w in tokens:
            td = searcher.search(
                BooleanQuery((must, BooleanClause(TermQuery(w), "SHOULD"))),
                k=1)
            p = float(td.hits[0].score) if td.hits else 1.0
            loglik += math.log(p)
        scored.append((c, prior + loglik))
    # normClassificationResults: softmax via logsumexp against the max
    smax = max(s for _, s in scored)
    loga = smax + math.log(sum(math.exp(s - smax) for _, s in scored))
    out = [(c, math.exp(s - loga)) for c, s in scored]
    out.sort(key=lambda cs: (-cs[1], cs[0]))
    return out


def knearest_fuzzy_classify(searcher, text: str, class_field: str = "role",
                            k: int = 10, classes: list[str] | None = None):
    """`KNearestFuzzyClassifier.assignClass`
    (`classification/KNearestFuzzyClassifier.java:104-176`): top-k docs of a
    NearestFuzzyQuery built from the input text, then the same per-class
    (votes, score-sum) ranking as the MLT-based kNN classifier
    (`buildListFromTopDocs`).  NearestFuzzyQuery
    (`classification/utils/NearestFuzzyQuery.java:53-56`) is the
    FuzzyLikeThisQuery rewrite with fixed parameters maxEdits=1,
    prefixLength=2, MAX_VARIANTS_PER_TERM=50, MAX_NUM_TERMS=300 — our
    FuzzyLikeThisQuery implements exactly that rewrite, so the classifier
    composes it directly.  Returns (predicted_class | None, votes,
    score_sum)."""
    from ..search.query import FuzzyLikeThisQuery

    q = FuzzyLikeThisQuery(fields=((text, 1, 2),), max_num_terms=300)
    td = searcher.search(q, k=k)
    if not td.hits:
        return None, 0, 0.0
    if classes is None:
        classes = _keyword_classes(searcher, class_field)
    gids = np.array([h.gid for h in td.hits], dtype=np.int64)
    cls = _classes_of_hits(searcher, gids, class_field, classes)
    votes: dict[str, int] = {}
    ssum: dict[str, float] = {}
    for h, c in zip(td.hits, cls):
        if c is None:
            continue
        votes[c] = votes.get(c, 0) + 1
        ssum[c] = ssum.get(c, 0.0) + float(h.score)
    if not votes:
        return None, 0, 0.0
    best = sorted(votes, key=lambda c: (-votes[c], -ssum[c], c))[0]
    return best, votes[best], ssum[best]


# ---------------------------------------------------------------------------
# Boolean (two-class) perceptron
# ---------------------------------------------------------------------------


def train_perceptron(sf_dir: str, positive_lang: str = "en", epochs: int = 3,
                     learning_rate: float = 1.0):
    """Binary perceptron over term-frequency features
    (`classification/BooleanPerceptronClassifier.java:1-230`: FST of
    per-term weights updated on misclassified docs, thresholded at 0).

    The reference's update loop is inherently sequential over docs; the
    distributed re-expression is parameter mixing (averaged perceptron,
    McDonald/Mann-style): each partition trains a local perceptron for
    `epochs` passes over its own docs, and the global model is the
    doc-count-weighted average of the partition weight vectors.  Features
    hash into a fixed 2^18 weight vector so the broadcast model is bounded
    regardless of vocabulary size.

    Label: doc.lang == positive_lang (a deterministic stand-in for the
    reference's boolean class field).  Returns (weights, bias, dim).
    """
    import ray.data as rd

    DIM = 1 << 18

    def local_train(t: pa.Table) -> pa.Table:
        w = np.zeros(DIM, dtype=np.float64)
        b = 0.0
        hcodes, lens = _hashed_features(t.column("text"), DIM)
        starts = _seg_starts(lens)
        y = np.where(
            t.column("lang").to_numpy(zero_copy_only=False) == positive_lang,
            1.0, -1.0)
        for _ in range(epochs):
            for i in range(len(lens)):
                hc = hcodes[starts[i]:starts[i] + lens[i]]
                score = w[hc].sum() + b
                if y[i] * score <= 0:           # misclassified → update
                    np.add.at(w, hc, learning_rate * y[i])
                    b += learning_rate * y[i]
        # sparse doc-count-weighted emission; idx=-1 is the per-partition
        # sentinel carrying (bias, n) exactly once
        nz = np.nonzero(w)[0]
        idx = np.concatenate(([-1], nz))
        wv = np.concatenate(([0.0], w[nz] * len(lens)))
        return pa.table({
            "idx": pa.array(idx, type=pa.int64()),
            "w": pa.array(wv, type=pa.float64()),
            "b": pa.array(np.r_[b * len(lens), np.zeros(len(nz))],
                          type=pa.float64()),
            "n": pa.array(np.r_[len(lens), np.zeros(len(nz), np.int64)],
                          type=pa.int64()),
        })

    parts = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["text", "lang"])
             .map_batches(local_train, batch_format="pyarrow")
             .to_pandas())
    if parts.empty:
        return np.zeros(DIM), 0.0, DIM
    total_n = int(parts["n"].sum())
    agg = parts[parts["idx"] >= 0].groupby("idx")["w"].sum()
    w = np.zeros(DIM, dtype=np.float64)
    w[agg.index.to_numpy()] = agg.to_numpy() / total_n
    bias = float(parts["b"].sum()) / total_n
    return w, bias, DIM


def _hashed_features(texts, dim: int):
    """(per-token hashed feature codes int64, per-doc lengths) — vectorized
    FNV-1a over the flat Arrow token buffer (no per-token Python)."""
    from ..util.hashing import fnv1a64

    flat, lens = _flat_tokens_np(texts)
    hcodes = (fnv1a64(flat.to_arrow()) % np.uint64(dim)).astype(np.int64)
    return hcodes, lens


def perceptron_predict(model, texts) -> np.ndarray:
    """Vectorized batch prediction: True where w·x + b > 0."""
    w, b, dim = model
    hcodes, lens = _hashed_features(pd.Series(list(texts)), dim)
    scores = np.full(len(lens), b, dtype=np.float64)
    nz = lens > 0
    if nz.any():
        scores[nz] += np.add.reduceat(w[hcodes], _seg_starts(lens)[nz])
    return scores > 0


def classify_perceptron(sf_dir: str) -> pd.DataFrame:
    """(doc_id, pred) — train the parameter-mixed boolean perceptron
    (positive class: lang == 'en') and predict every document in one
    vectorized map_batches pass.  Rows-only driver entry (the averaged
    model depends on partition boundaries, not SQL-expressible)."""
    import ray
    import ray.data as rd

    model = train_perceptron(sf_dir)
    ref = ray.put(model)

    def pred(t: pa.Table) -> pa.Table:
        m = ray.get(ref)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "pred": pa.array(perceptron_predict(m, t.column("text").to_pylist())),
        })

    out = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
           .map_batches(pred, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def classify_knn(sf_dir: str, n_queries: int = 20, k: int = 10) -> pd.DataFrame:
    """(i, pred_role, votes) — kNN-classify the first `n_queries` transcript
    texts (deterministic sample) against the flagship index by `role`.
    Driver entry is rows-only: the oracle would be a doc-vs-doc BM25
    self-join, out of SQL reach at any scale."""
    import pyarrow.parquet as pq

    from ..search.searcher import IndexSearcher
    from .flagship import build_transcript_index

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    t = t.sort_by([("doc_id", "ascending")])
    texts = t.column("text").to_pylist()[:n_queries]
    classes = _keyword_classes(searcher, "role")
    rows = []
    for i, text in enumerate(texts):
        pred, votes, _ = knn_classify(searcher, text or "", "role", k=k,
                                      classes=classes)
        rows.append((i, pred or "", votes))
    return pd.DataFrame(rows, columns=["i", "pred_role", "votes"]).astype(
        {"i": "int64", "pred_role": "string", "votes": "int64"})


# ---------------------------------------------------------------------------
# DatasetSplitter (`classification/utils/DatasetSplitter.java:46-182`)
# ---------------------------------------------------------------------------


def dataset_split_stratified(sf_dir: str, test_ratio: float = 0.2,
                             cv_ratio: float = 0.1,
                             class_col: str = "lang",
                             bucket_rows: int = 1 << 16) -> pd.DataFrame:
    """(doc_id, split) — the reference DatasetSplitter's stratified
    train/test/cross-validation assignment, re-expressed distributed.

    The reference iterates class groups in INDEXORDER (groups ordered by
    their first docID, docs within a group by docID) with a GLOBAL
    alternation counter ``b``: an even-``b`` doc goes to test while the
    group's test quota (``tc < n*testRatio``) is open, otherwise to cv
    while ``cvc < n*cvRatio``, else to train.

    Scale shape (round-5 restructure): the assignment is pure RANK
    arithmetic — for a doc with 0-based within-class rank ``i`` in a class
    of size ``n`` whose global alternation offset is ``b0``, the prefix
    counts the reference accumulates have closed forms::

        ecum(i) = i//2 + 1          if b0 even   (1-based rank among evens)
                  (i+1)//2          if b0 odd
        is_test = even(b0+i) and ecum-1 < n*test_ratio
        ncum(i) = (i+1) - min(ecum(i), Et)      # Et = #evens passing quota
        is_cv   = not is_test and ncum-1 < n*cv_ratio

    so no per-class cumsum — and therefore no class-sized group — is ever
    needed.  Within-class rank comes from bounded doc_id-range buckets
    (``doc_id // G``): one small aggregation counts docs per
    (class, bucket); the driver prefix-sums bucket counts per class into a
    broadcast start-rank table (C×(maxdoc/G) rows, ~MBs at 100 TB); the
    assignment pass is ``groupby(bucket).map_groups`` where every group is
    ≤ G rows regardless of class skew — the hot-class group that
    previously materialized a whole class in one task is gone."""
    import ray
    import ray.data as rd

    G = bucket_rows                             # bucket width (rows bound)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", class_col])

    def partial_counts(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        bucket = pc.floor(pc.divide(pc.cast(t["doc_id"], pa.float64()), G))
        g = pa.table({
            "cls": t[class_col],
            "bucket": pc.cast(bucket, pa.int64()),
            "head": t["doc_id"],
        })
        gb = g.group_by(["cls", "bucket"]).aggregate(
            [("head", "count"), ("head", "min")])
        return gb.rename_columns(["cls", "bucket", "cnt", "head"])

    from ray.data.aggregate import Min, Sum

    counts = (ds.map_batches(partial_counts, batch_format="pyarrow")
              .groupby(["cls", "bucket"])
              .aggregate(Sum("cnt", alias_name="cnt"),
                         Min("head", alias_name="head"))
              .to_pandas())                     # C×(maxdoc/G) rows, small
    counts = counts.sort_values(["cls", "bucket"]).reset_index(drop=True)
    # within-class start rank of each (class, bucket) = prefix sum
    csum = counts.groupby("cls", sort=False)["cnt"].cumsum()
    counts["start"] = (csum - counts["cnt"]).astype(np.int64)
    # class order (reference INDEXORDER = first docID), totals, b0 offsets
    totals = (counts.groupby("cls", sort=False)
              .agg(n=("cnt", "sum"), first=("head", "min"))
              .sort_values("first"))
    b0s = np.concatenate(([0], np.cumsum(totals["n"].to_numpy())[:-1]))
    cls_meta = {c: (int(n), int(b0)) for c, n, b0 in
                zip(totals.index, totals["n"], b0s)}
    start_rank = {(c, int(b)): int(s) for c, b, s in
                  zip(counts["cls"], counts["bucket"], counts["start"])}
    bcast = ray.put((cls_meta, start_rank))

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        cls_meta_, start_ = ray.get(bcast)
        g = g.sort_values("doc_id").reset_index(drop=True)
        bucket = int(g["doc_id"].iloc[0]) // G
        out = np.empty(len(g), dtype=object)
        codes, uniq = pd.factorize(g[class_col])
        for ci, c in enumerate(uniq):
            sel = codes == ci
            n, b0 = cls_meta_[c]
            i = start_[(c, bucket)] + np.arange(int(sel.sum()),
                                                dtype=np.int64)
            b = b0 + i
            even = (b % 2) == 0
            ecum = np.where(b0 % 2 == 0, i // 2 + 1, (i + 1) // 2)
            test_size = n * test_ratio
            cv_size = n * cv_ratio
            is_test = even & ((ecum - 1) < test_size)
            # Et = #integers e>=1 with e-1 < test_size (same float compare)
            ff = np.floor(test_size)
            et = int(ff) + (1 if ff < test_size else 0)
            ncum = (i + 1) - np.minimum(ecum, et)
            is_cv = ~is_test & ((ncum - 1) < cv_size)
            out[sel] = np.where(is_test, "test",
                                np.where(is_cv, "cv", "train"))
        return pd.DataFrame({"doc_id": g["doc_id"], "split": out})

    def add_bucket(t):
        import pyarrow.compute as pc

        return t.append_column(
            "bucket", pc.cast(pc.floor(pc.divide(
                pc.cast(t["doc_id"], "float64"), G)), "int64"))

    out = (ds.map_batches(add_bucket, batch_format="pyarrow")
           .groupby("bucket").map_groups(assign).to_pandas())
    return (out.sort_values("doc_id").reset_index(drop=True)
            .astype({"doc_id": "int64"}))


def dataset_split_stratified_sql(test_ratio: float = 0.2,
                                 cv_ratio: float = 0.1,
                                 class_col: str = "lang") -> str:
    """DuckDB twin of dataset_split_stratified (same float quota math)."""
    return f"""
WITH d AS (SELECT doc_id, {class_col} AS cls FROM documents),
heads AS (SELECT cls, min(doc_id) AS head, count(*)::BIGINT AS n
          FROM d GROUP BY 1),
ord AS (SELECT d.doc_id, d.cls, h.n,
               row_number() OVER (PARTITION BY d.cls ORDER BY d.doc_id) - 1
                   AS i,
               row_number() OVER (ORDER BY h.head, d.doc_id) - 1 AS b
        FROM d JOIN heads h USING (cls)),
m AS (SELECT *,
             sum(CASE WHEN b % 2 = 0 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY cls ORDER BY i) AS ecum
      FROM ord),
t AS (SELECT *,
             (b % 2 = 0) AND (ecum - 1 < n * {test_ratio!r}) AS is_test
      FROM m),
c AS (SELECT *,
             sum(CASE WHEN is_test THEN 0 ELSE 1 END)
                 OVER (PARTITION BY cls ORDER BY i) AS ncum
      FROM t)
SELECT doc_id,
       CASE WHEN is_test THEN 'test'
            WHEN ncum - 1 < n * {cv_ratio!r} THEN 'cv'
            ELSE 'train' END AS split
FROM c
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# SimpleNaiveBayesDocumentClassifier
# (`classification/document/SimpleNaiveBayesDocumentClassifier.java:60-280`)
# ---------------------------------------------------------------------------


def _field_sum_df(searcher, field: str) -> tuple[float, int]:
    """(sumDocFreq, docCount) for a field, from the index's bucketed
    term-stats store read as a distributed parquet aggregation (the
    reference's Terms.getSumDocFreq/getDocCount).  ``field='text'`` is the
    analyzed column (terms without the keyword separator); any other name
    is a keyword namespace (single-valued: docCount = sumDocFreq).
    Cached per searcher instance."""
    import os

    import ray.data as rd

    from ..index.shard import KEYWORD_SEP

    cache = getattr(searcher, "_field_stats_cache", None)
    if cache is None:
        cache = searcher._field_stats_cache = {}
    if field in cache:
        return cache[field]

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if field == "text":
            keep = pc.invert(pc.match_substring(t.column("term"),
                                                KEYWORD_SEP))
        else:
            keep = pc.starts_with(t.column("term"),
                                  f"{field}{KEYWORD_SEP}")
        df = t.filter(keep).column("df")
        s = pc.sum(df).as_py() or 0
        return pa.table({"s": pa.array([s], type=pa.int64())})

    store = os.path.join(searcher.index_dir, "term_stats")
    sum_df = int(sum(
        rd.read_parquet(store)
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()["s"]))
    if field == "text":
        doc_count = int(searcher.doc_count)
    else:
        doc_count = sum_df          # single-valued keyword field
    cache[field] = (float(sum_df), doc_count)
    return cache[field]


def nb_document_classify(searcher, field_texts: dict[str, str],
                         class_field: str = "role",
                         boosts: dict[str, float] | None = None,
                         classes: list[str] | None = None,
                         use_cache: bool = False):
    """`SimpleNaiveBayesDocumentClassifier.assignNormClasses`
    (`classification/document/SimpleNaiveBayesDocumentClassifier.java:
    106-280`): multi-field naive bayes where the likelihood counts DOCUMENT
    frequencies via index intersections — per class c and field f,
    score += logPrior(c) + boost(f) * avg_w log((count(f:w AND class:c)+1)
    / (avgUniqueTermsPerDoc(f) * docFreq(c) + docsWithClass)); the
    reference's ``title^10`` boost syntax maps to the ``boosts`` dict.
    ``field_texts['text']`` is analyzed; other keys are keyword fields
    whose value is one token.  Scores softmax-normalize
    (``normClassificationResults``).  Returns [(class, prob)] best-first.

    ``use_cache=True`` is the CachingNaiveBayesClassifier
    (`classification/CachingNaiveBayesClassifier.java:35-180`): the
    (word, class) → hit-count intersections memoize on the searcher, so
    repeated classifications over a shared vocabulary skip the index
    counts (the reference's insertPoint/reInitCache warm map)."""
    import math

    from ..analysis.standard import analyze
    from ..index.shard import keyword_term
    from ..search.query import BooleanClause, BooleanQuery, TermQuery

    boosts = boosts or {}
    if classes is None:
        classes = _keyword_classes(searcher, class_field)
    if not classes:
        return []
    docs_with_class = sum(
        searcher.df(keyword_term(class_field, c)) for c in classes)
    field_tokens = {
        f: (list(analyze(v)) if f == "text" else [v])
        for f, v in field_texts.items()}
    field_stats = {f: _field_sum_df(searcher, f) for f in field_texts}

    scored: list[tuple[str, float]] = []
    for c in classes:
        ckey = keyword_term(class_field, c)
        class_df = searcher.df(ckey)
        log_prior = math.log(class_df) - math.log(docs_with_class)
        class_score = 0.0
        for f, tokens in field_tokens.items():
            sum_df, f_doc_count = field_stats[f]
            avg_unique = sum_df / f_doc_count if f_doc_count else 0.0
            den = avg_unique * class_df + docs_with_class
            cache = None
            if use_cache:
                cache = getattr(searcher, "_nbdoc_count_cache", None)
                if cache is None:
                    cache = searcher._nbdoc_count_cache = {}
            loglik = 0.0
            for w in tokens:
                wkey = w if f == "text" else keyword_term(f, w)
                hits = cache.get((wkey, ckey)) if cache is not None else None
                if hits is None:
                    hits = searcher.count(BooleanQuery((
                        BooleanClause(TermQuery(wkey), "MUST"),
                        BooleanClause(TermQuery(ckey), "MUST"))))
                    if cache is not None:
                        cache[(wkey, ckey)] = hits
                loglik += math.log((hits + 1) / den)
            n = max(len(tokens), 1)
            class_score += log_prior + (loglik / n) * boosts.get(f, 1.0)
        scored.append((c, class_score))
    # normClassificationResults: softmax via logsumexp against the max
    smax = max(s for _, s in scored)
    loga = smax + math.log(sum(math.exp(s - smax) for _, s in scored))
    out = [(c, math.exp(s - loga)) for c, s in scored]
    out.sort(key=lambda x: -x[1])
    return out
