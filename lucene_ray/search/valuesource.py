"""ValueSource / FunctionQuery family (`queries/function/`).

The reference's ValueSource API is a per-document function algebra used for
function-based scoring and filtering:

- `FunctionQuery` (`queries/function/FunctionQuery.java:39-199`): matches
  ALL docs, score = boost * valueSource(doc) (negative/NaN mapped to
  -Float.MAX_VALUE by AllScorer.score).
- `FunctionRangeQuery` (`queries/function/FunctionRangeQuery.java:44-120` +
  `ValueSourceScorer.java`): matches docs whose value lies in a range;
  score = the value itself.
- `FunctionMatchQuery` (`queries/function/FunctionMatchQuery.java:43-120`):
  matches docs whose DoubleValues pass a predicate; constant score.
- the `valuesource/` package (60 small classes): field sources, constants,
  arithmetic/composition functions, index-statistic sources (docFreq, idf,
  tf, termFreq, totalTermFreq, sumTotalTermFreq, maxDoc, numDocs, norm) and
  query-score sources.

Here each ValueSource is a small dataclass with a vectorized
``vals(searcher, rdr) -> float64[n_docs]`` — one numpy expression per shard
instead of a per-doc virtual call, evaluated inside the per-shard search
(the reference evaluates lazily per doc; both are one pass over the
segment).  Statistic sources read the same hash-bucketed global stats the
scorers use; TF/termFreq sources scatter one postings decode into a dense
column.  ScaleFloatFunction needs the GLOBAL min/max of its source, which
the reference computes over all leaves at weight-creation time
(`ScaleFloatFunction.java:56-90` createWeight) — mirrored by a pre-pass
over all shards cached on the searcher.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..util.smallfloat import LENGTH_TABLE


class ValueSource:
    """Base: subclasses implement vals(searcher, rdr) -> float64[n_docs]."""

    def vals(self, searcher, rdr) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError

    def key(self) -> tuple:
        return (type(self).__name__,) + tuple(
            getattr(self, f) for f in getattr(self, "__dataclass_fields__", ()))


# ---- constants & fields ----


@dataclass(frozen=True)
class ConstValueSource(ValueSource):
    """`valuesource/ConstValueSource.java` / DoubleConstValueSource."""
    value: float

    def vals(self, searcher, rdr):
        return np.full(rdr.doc_count, float(self.value), dtype=np.float64)


@dataclass(frozen=True)
class FieldSource(ValueSource):
    """Int/Long/Float/DoubleFieldSource (`valuesource/LongFieldSource.java`
    etc.): the doc-values column as doubles (dv-update overlays included
    by ``rdr.docvalue``)."""
    field: str

    def vals(self, searcher, rdr):
        return np.asarray(rdr.docvalue(self.field), dtype=np.float64)


# Java-name aliases (the reference distinguishes by numeric type; our dv
# columns are int64, all read through the same source)
IntFieldSource = LongFieldSource = FloatFieldSource = DoubleFieldSource = \
    FieldSource


@dataclass(frozen=True)
class FloatVectorSimilaritySource(ValueSource):
    """FloatVectorSimilarityFunction over FloatKnnVectorFieldSource +
    ConstKnnFloatValueSource (`queries/function/valuesource/
    FloatVectorSimilarityFunction.java`): per-doc similarity between the
    shard's stored vector and a constant query vector, usable in
    FunctionQuery / FunctionRangeQuery / expressions.  ``metric``:
    'cosine' ((1 + cos) / 2, VectorSimilarityFunction.COSINE's score
    mapping), 'dot' ((1 + dot) / 2, DOT_PRODUCT's normalized mapping, for
    unit vectors), or 'euclidean' (1 / (1 + ||a-b||^2)).  Docs without a
    vector store score 0."""
    vector: tuple
    metric: str = "cosine"

    def vals(self, searcher, rdr):
        vm = rdr.vectors()
        n = rdr.doc_count
        if vm is None:
            return np.zeros(n, dtype=np.float64)
        q = np.asarray(self.vector, dtype=np.float64)
        vm64 = np.asarray(vm, dtype=np.float64)
        dots = vm64 @ q
        if self.metric == "dot":
            return (1.0 + dots) / 2.0
        if self.metric == "euclidean":
            d2 = (vm64 * vm64).sum(axis=1) - 2.0 * dots + float(q @ q)
            return 1.0 / (1.0 + np.maximum(d2, 0.0))
        if self.metric != "cosine":
            raise ValueError(f"unknown vector similarity {self.metric!r}")
        qn = np.linalg.norm(q) or 1.0
        return (1.0 + dots / (rdr.vector_norms() * qn)) / 2.0


@dataclass(frozen=True)
class SortedNumericFieldSource(ValueSource):
    """MultiValuedLongFieldSource / MultiValuedDoubleFieldSource
    (`valuesource/MultiValuedLongFieldSource.java` — SortedNumericSelector
    wrapped as a single-valued view "for use with sorting, expressions,
    function queries"): per-doc MIN or MAX of a multi-valued numeric dv
    column, ``missing`` for docs with no values."""
    field: str
    selector: str = "min"
    missing: int = 0

    def vals(self, searcher, rdr):
        return rdr.selected_numeric(self.field, self.selector,
                                    self.missing).astype(np.float64)


# ---- composition functions ----


@dataclass(frozen=True)
class SumFloatFunction(ValueSource):
    sources: tuple

    def vals(self, searcher, rdr):
        out = self.sources[0].vals(searcher, rdr).copy()
        for s in self.sources[1:]:
            out += s.vals(searcher, rdr)
        return out


@dataclass(frozen=True)
class ProductFloatFunction(ValueSource):
    sources: tuple

    def vals(self, searcher, rdr):
        out = self.sources[0].vals(searcher, rdr).copy()
        for s in self.sources[1:]:
            out *= s.vals(searcher, rdr)
        return out


@dataclass(frozen=True)
class MaxFloatFunction(ValueSource):
    sources: tuple

    def vals(self, searcher, rdr):
        out = self.sources[0].vals(searcher, rdr)
        for s in self.sources[1:]:
            out = np.maximum(out, s.vals(searcher, rdr))
        return out


@dataclass(frozen=True)
class MinFloatFunction(ValueSource):
    sources: tuple

    def vals(self, searcher, rdr):
        out = self.sources[0].vals(searcher, rdr)
        for s in self.sources[1:]:
            out = np.minimum(out, s.vals(searcher, rdr))
        return out


@dataclass(frozen=True)
class DivFloatFunction(ValueSource):
    a: ValueSource
    b: ValueSource

    def vals(self, searcher, rdr):
        with np.errstate(divide="ignore", invalid="ignore"):
            return self.a.vals(searcher, rdr) / self.b.vals(searcher, rdr)


@dataclass(frozen=True)
class PowFloatFunction(ValueSource):
    a: ValueSource
    b: ValueSource

    def vals(self, searcher, rdr):
        with np.errstate(invalid="ignore"):
            return np.power(self.a.vals(searcher, rdr),
                            self.b.vals(searcher, rdr))


@dataclass(frozen=True)
class LinearFloatFunction(ValueSource):
    """`valuesource/LinearFloatFunction.java`: m*x + c."""
    source: ValueSource
    slope: float
    intercept: float

    def vals(self, searcher, rdr):
        return self.source.vals(searcher, rdr) * self.slope + self.intercept


@dataclass(frozen=True)
class ReciprocalFloatFunction(ValueSource):
    """`valuesource/ReciprocalFloatFunction.java`: a / (m*x + b)."""
    source: ValueSource
    m: float
    a: float
    b: float

    def vals(self, searcher, rdr):
        return self.a / (self.m * self.source.vals(searcher, rdr) + self.b)


@dataclass(frozen=True)
class RangeMapFloatFunction(ValueSource):
    """`valuesource/RangeMapFloatFunction.java`: values inside [min,max]
    map to target; outside map to default (or pass through when None)."""
    source: ValueSource
    lo: float
    hi: float
    target: float
    default: float | None = None

    def vals(self, searcher, rdr):
        v = self.source.vals(searcher, rdr)
        inside = (v >= self.lo) & (v <= self.hi)
        out = v.copy() if self.default is None \
            else np.full_like(v, self.default)
        out[inside] = self.target
        return out


@dataclass(frozen=True)
class ScaleFloatFunction(ValueSource):
    """`valuesource/ScaleFloatFunction.java`: linearly rescale the source
    to [target_lo, target_hi] using the GLOBAL min/max across the index
    (computed over every leaf at createWeight, :56-90)."""
    source: ValueSource
    target_lo: float
    target_hi: float

    def _bounds(self, searcher):
        cache = getattr(searcher, "_scale_bounds", None)
        if cache is None:
            cache = searcher._scale_bounds = {}
        k = self.source.key()
        if k not in cache:
            lo, hi = np.inf, -np.inf
            for pid in searcher._pids:
                v = self.source.vals(searcher, searcher.reader(pid))
                if len(v):
                    lo = min(lo, float(v.min()))
                    hi = max(hi, float(v.max()))
            cache[k] = (lo, hi)
        return cache[k]

    def vals(self, searcher, rdr):
        lo, hi = self._bounds(searcher)
        v = self.source.vals(searcher, rdr)
        if not np.isfinite(lo) or hi == lo:
            return np.full_like(v, self.target_lo)
        return (v - lo) / (hi - lo) * (self.target_hi - self.target_lo) \
            + self.target_lo


@dataclass(frozen=True)
class IfFunction(ValueSource):
    """`valuesource/IfFunction.java`: cond != 0 ? then : else."""
    cond: ValueSource
    then: ValueSource
    otherwise: ValueSource

    def vals(self, searcher, rdr):
        return np.where(self.cond.vals(searcher, rdr) != 0,
                        self.then.vals(searcher, rdr),
                        self.otherwise.vals(searcher, rdr))


@dataclass(frozen=True)
class ComparisonBoolFunction(ValueSource):
    """`valuesource/ComparisonBoolFunction.java` (gt/gte/lt/lte/eq/neq):
    1.0 where the comparison holds, else 0.0."""
    a: ValueSource
    b: ValueSource
    op: str

    _OPS = {"gt": np.greater, "gte": np.greater_equal, "lt": np.less,
            "lte": np.less_equal, "eq": np.equal, "neq": np.not_equal}

    def vals(self, searcher, rdr):
        return self._OPS[self.op](self.a.vals(searcher, rdr),
                                  self.b.vals(searcher, rdr)).astype(np.float64)


# ---- index-statistic sources ----


def _classic_idf(df: int, doc_count: int) -> float:
    """ClassicSimilarity idf (`search/similarities/ClassicSimilarity.java`),
    the formula the reference's IDFValueSource delegates to."""
    import math

    return math.log((doc_count + 1) / (df + 1)) + 1.0


def _term_key(searcher, field: str, term: str) -> str:
    from ..index.shard import keyword_term

    return searcher._ft(term) if field == "text" else keyword_term(field, term)


@dataclass(frozen=True)
class DocFreqValueSource(ValueSource):
    """`valuesource/DocFreqValueSource.java`: constant df(term)."""
    field: str
    term: str

    def vals(self, searcher, rdr):
        df = searcher.df(_term_key(searcher, self.field, self.term))
        return np.full(rdr.doc_count, float(df), dtype=np.float64)


def _max_doc(searcher) -> int:
    """reader.maxDoc(): every doc incl. deletes (NOT the per-field
    docCount collection statistic)."""
    return sum(searcher.reader(p).doc_count for p in searcher._pids)


@dataclass(frozen=True)
class IDFValueSource(ValueSource):
    """`valuesource/IDFValueSource.java`: constant classic
    idf(docFreq, reader.maxDoc())."""
    field: str
    term: str

    def vals(self, searcher, rdr):
        df = searcher.df(_term_key(searcher, self.field, self.term))
        return np.full(rdr.doc_count,
                       _classic_idf(df, _max_doc(searcher)), dtype=np.float64)


def _dense_freq(searcher, rdr, field: str, term: str) -> np.ndarray:
    tid = rdr.seek_exact(_term_key(searcher, field, term))
    out = np.zeros(rdr.doc_count, dtype=np.float64)
    if tid >= 0:
        docs, freqs = rdr.postings(tid)
        out[docs] = freqs
    return out


@dataclass(frozen=True)
class TermFreqValueSource(ValueSource):
    """`valuesource/TermFreqValueSource.java`: raw within-doc frequency."""
    field: str
    term: str

    def vals(self, searcher, rdr):
        return _dense_freq(searcher, rdr, self.field, self.term)


@dataclass(frozen=True)
class TFValueSource(ValueSource):
    """`valuesource/TFValueSource.java`: ClassicSimilarity tf = sqrt(freq)."""
    field: str
    term: str

    def vals(self, searcher, rdr):
        return np.sqrt(_dense_freq(searcher, rdr, self.field, self.term))


@dataclass(frozen=True)
class TotalTermFreqValueSource(ValueSource):
    """`valuesource/TotalTermFreqValueSource.java`: constant ttf(term)."""
    field: str
    term: str

    def vals(self, searcher, rdr):
        ttf = searcher.ttf(_term_key(searcher, self.field, self.term))
        return np.full(rdr.doc_count, float(ttf), dtype=np.float64)


@dataclass(frozen=True)
class SumTotalTermFreqValueSource(ValueSource):
    """`valuesource/SumTotalTermFreqValueSource.java`: constant
    sumTotalTermFreq of the text field."""
    field: str = "text"

    def vals(self, searcher, rdr):
        return np.full(rdr.doc_count, float(searcher.sum_ttf),
                       dtype=np.float64)


@dataclass(frozen=True)
class NumDocsValueSource(ValueSource):
    """`valuesource/NumDocsValueSource.java`: live doc count."""

    def vals(self, searcher, rdr):
        n = sum(searcher.reader(p).doc_count
                - (int(searcher.reader(p).deleted.sum())
                   if searcher.reader(p).deleted is not None else 0)
                for p in searcher._pids)
        return np.full(rdr.doc_count, float(n), dtype=np.float64)


@dataclass(frozen=True)
class MaxDocValueSource(ValueSource):
    """`valuesource/MaxDocValueSource.java`: doc count incl. deletes."""

    def vals(self, searcher, rdr):
        return np.full(rdr.doc_count, float(_max_doc(searcher)),
                       dtype=np.float64)


@dataclass(frozen=True)
class NormValueSource(ValueSource):
    """`valuesource/NormValueSource.java`: the decoded ClassicSimilarity
    length norm 1/sqrt(length) from the stored SmallFloat norm byte."""
    field: str = "text"

    def vals(self, searcher, rdr):
        lengths = LENGTH_TABLE[np.asarray(rdr.norms)].astype(np.float64)
        with np.errstate(divide="ignore"):
            out = 1.0 / np.sqrt(lengths)
        out[lengths == 0] = 0.0
        return out


@dataclass(frozen=True)
class QueryValueSource(ValueSource):
    """`valuesource/QueryValueSource.java`: per-doc score of an arbitrary
    query; non-matching docs get default_value."""
    query: object
    default_value: float = 0.0

    def key(self):
        return ("QueryValueSource", repr(self.query), self.default_value)

    def vals(self, searcher, rdr):
        compiled = searcher.compile(self.query)
        scores, docs, _, _ = searcher.search_shard(
            rdr, compiled, rdr.doc_count, total_hits_threshold=2**31 - 1)
        out = np.full(rdr.doc_count, float(self.default_value),
                      dtype=np.float64)
        out[docs] = scores.astype(np.float64)
        return out


# ---- the three queries ----


@dataclass(frozen=True)
class FunctionQuery:
    """`queries/function/FunctionQuery.java`: matches every (live) doc,
    score = boost * value (NaN/-inf → -Float.MAX_VALUE, AllScorer.score)."""
    source: ValueSource
    boost: float = 1.0


@dataclass(frozen=True)
class FunctionRangeQuery:
    """`queries/function/FunctionRangeQuery.java`: docs whose value lies in
    [lo, hi]; score = the value itself (ValueSourceScorer)."""
    source: ValueSource
    lo: float | None = None
    hi: float | None = None
    include_lower: bool = True
    include_upper: bool = True


@dataclass(frozen=True)
class FunctionMatchQuery:
    """`queries/function/FunctionMatchQuery.java`: docs whose value passes
    the predicate; constant score = boost."""
    source: ValueSource
    predicate: object                  # Callable[[np.ndarray], np.ndarray]
    boost: float = 1.0

    def key(self):
        return ("FunctionMatchQuery", self.source.key(), id(self.predicate))


_NEG_MAX = np.float32(-np.finfo(np.float32).max)


def search_shard_function(searcher, rdr, query, k: int, after=None):
    """Per-shard execution for the three function queries: one vectorized
    ValueSource evaluation, deletes mask, score mapping per query type."""
    from .searcher import RELATION_EQ

    v = query.source.vals(searcher, rdr)
    if isinstance(query, FunctionQuery):
        mask = np.ones(rdr.doc_count, dtype=bool)
        sc = (v * float(query.boost)).astype(np.float32)
        # AllScorer.score: anything not > -inf (NaN, -inf) → -Float.MAX_VALUE
        bad = ~(sc > np.float32(-np.inf))
        sc[bad] = _NEG_MAX
    elif isinstance(query, FunctionRangeQuery):
        mask = np.ones(rdr.doc_count, dtype=bool)
        if query.lo is not None:
            mask &= (v >= query.lo) if query.include_lower else (v > query.lo)
        if query.hi is not None:
            mask &= (v <= query.hi) if query.include_upper else (v < query.hi)
        sc = v.astype(np.float32)
    else:                               # FunctionMatchQuery
        mask = np.asarray(query.predicate(v), dtype=bool)
        sc = np.full(rdr.doc_count, np.float32(query.boost), dtype=np.float32)
    if rdr.deleted is not None:
        mask = mask & ~rdr.deleted
    cand = np.nonzero(mask)[0].astype(np.int32)
    sc = sc[cand]
    total = int(len(cand))
    if after is not None:
        a_s, a_d = np.float32(after[0]), after[1]
        keep = (sc < a_s) | ((sc == a_s) & (cand.astype(np.int64) > a_d))
        cand, sc = cand[keep], sc[keep]
    order = np.lexsort((cand, -sc))[:k]
    return sc[order], cand[order], total, RELATION_EQ
