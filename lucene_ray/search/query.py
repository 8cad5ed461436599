"""Query AST — the north-rule subset of Lucene's Query classes
(`search/TermQuery.java`, `search/BooleanQuery.java`, `search/BooleanClause.java:25-46`):
TermQuery + BooleanQuery with SHOULD / MUST / FILTER / MUST_NOT occurs and
minimumNumberShouldMatch, plus MatchAllDocsQuery.  A tiny builder replaces
the classic query-parser grammar: :func:`parse_query` analyzes free text into
a SHOULD-of-terms BooleanQuery the way QueryParser does for a default field.
"""

from __future__ import annotations

from dataclasses import dataclass, field

SHOULD = "SHOULD"
MUST = "MUST"
FILTER = "FILTER"
MUST_NOT = "MUST_NOT"


@dataclass(frozen=True)
class TermQuery:
    term: str
    field: str = "text"
    boost: float = 1.0


@dataclass(frozen=True)
class MatchAllDocsQuery:
    pass


@dataclass(frozen=True)
class MatchNoDocsQuery:
    """Matches nothing (`search/MatchNoDocsQuery.java`) — the empty element
    of the rewrite algebra (e.g. a fully-analyzed-away query)."""
    reason: str = ""


@dataclass(frozen=True)
class KnnVectorQuery:
    """Approximate k-nearest-neighbor by cosine over the index's per-shard
    vector store (`search/KnnFloatVectorQuery.java:1-120` semantics): each
    shard collects its k best vectors — through its HNSW graph
    (`util/hnsw/HnswGraphSearcher.java`) with live-docs as the accept mask —
    and the per-shard results merge TopDocs-style (score desc, global docID
    asc).  With `filter`, matching docs are resolved first and the shard
    runs EXACT search over the filtered subset (the reference's
    exact-search fallback when the filter is selective); the unfiltered path
    is approximate.  Score is raw cosine similarity."""
    vector: tuple[float, ...]
    k: int = 10
    filter: object | None = None
    field: str = "embedding"
    boost: float = 1.0
    ef: int = 0          # 0 -> max(EF_SEARCH, k)


@dataclass(frozen=True)
class PhraseQuery:
    """Exact phrase (slop=0) over consecutive positions
    (`search/PhraseQuery.java`, `ExactPhraseMatcher.java` semantics:
    phraseFreq = number of exact occurrences; weight uses the SUM of the
    terms' idfs — `BM25Similarity.idfExplain(collectionStats, termStats[])`)."""
    terms: tuple[str, ...]
    field: str = "text"
    boost: float = 1.0
    slop: int = 0


@dataclass(frozen=True)
class MultiPhraseQuery:
    """Phrase where each position (slot) accepts any of several terms
    (`search/MultiPhraseQuery.java`): a slot's postings are the union of its
    terms' postings with sorted merged positions (UnionPostingsEnum,
    MultiPhraseQuery.java:419-500); matching/scoring like PhraseQuery with
    idf summed over every provided term with df > 0 (getStats at :221-244)."""
    slots: tuple[tuple[str, ...], ...]
    field: str = "text"
    boost: float = 1.0
    slop: int = 0
    # explicit slot positions (MultiPhraseQuery.Builder.add(terms, pos) —
    # gaps allowed, e.g. testMultiExactWithRepeats' (0, 2)); empty =
    # consecutive 0..n-1
    positions: tuple[int, ...] = ()

    def __post_init__(self):
        if any(len(s) == 0 for s in self.slots):
            raise ValueError("empty slot")
        if self.positions:
            if len(self.positions) != len(self.slots):
                raise ValueError("positions must match slots")
            if any(b <= a for a, b in zip(self.positions,
                                          self.positions[1:])):
                raise ValueError("positions must be strictly increasing")


@dataclass(frozen=True)
class PhraseWildcardQuery:
    """Generalized phrase with multi-term slots under a shared expansion
    budget (`sandbox/search/PhraseWildcardQuery.java:88-216`).  Each slot is
    either a single term (str) or a multi-term query (Prefix/Wildcard/
    Regexp/Fuzzy/TermInSet).  Resolution follows createWeight: single terms
    collected first with whole-query early stop if one matches nowhere; then
    each multi-term expands sequentially with
    ``maxExpansionsForTerm = remainingExpansions // remainingMultiTerms``,
    smallest dictionaries first, shards where an earlier phrase term did not
    match skipped (segment optimization).  Matching/scoring after resolution
    is MultiPhraseQuery over the collected terms (the reference's
    PhraseWeight over the collected TermStates/TermStatistics)."""
    slots: tuple
    slop: int = 0
    max_multi_term_expansions: int = 128
    segment_optimization: bool = True
    field: str = "text"
    boost: float = 1.0

    def __post_init__(self):
        if self.max_multi_term_expansions < 0:
            raise ValueError("negative expansion budget")


@dataclass(frozen=True)
class PayloadScoreQuery:
    """Score docs from the payload values at matched occurrences
    (`queries/payloads/PayloadScoreQuery.java:42-288`): every matched
    occurrence's payload factor feeds a PayloadFunction (``sum`` / ``min``
    / ``max`` / ``avg`` — Sum/Min/Max/AveragePayloadFunction docScore
    semantics, negative results clamp to 0), missing payloads decode to 1
    (PayloadDecoder.FLOAT_DECODER null convention).  ``query`` is a term or
    an ordered :class:`~lucene_ray.search.spans.SpanNearQuery` of terms;
    ``include_span_score`` multiplies by the wrapped query's own score
    (scoreCurrentDoc at :282-287)."""
    query: object          # str | spans.SpanNearQuery (ordered, term-only)
    func: str = "sum"
    include_span_score: bool = False
    boost: float = 1.0

    def __post_init__(self):
        if self.func not in ("sum", "min", "max", "avg"):
            raise ValueError(f"unknown payload function {self.func!r}")


@dataclass(frozen=True)
class SpanPayloadCheckQuery:
    """Match ordered adjacent term spans whose payload sequence satisfies
    the expected values (`queries/payloads/SpanPayloadCheckQuery.java`,
    PayloadChecker at :202-240): the i-th constituent's payload must
    compare (``op`` in eq/gt/gte/lt/lte, numeric) to ``expected[i]``; a
    None expected entry matches anything, a missing actual payload fails a
    non-None expectation.  Scored like the wrapped span (idf summed over
    the terms, freq = accepted spans)."""
    terms: tuple
    expected: tuple
    op: str = "eq"
    field: str = "text"
    boost: float = 1.0

    def __post_init__(self):
        if len(self.terms) != len(self.expected):
            raise ValueError("terms/expected length mismatch")
        if self.op not in ("eq", "gt", "gte", "lt", "lte"):
            raise ValueError(f"unknown payload op {self.op!r}")


@dataclass(frozen=True)
class IntervalQuery:
    """Proximity interval matching (`queries/intervals/Intervals.java`
    surface: ordered / unordered with maxwidth): matches docs containing one
    occurrence of every term inside a window of span <= max_width positions
    (span = last - first + 1), in query order when `ordered`.  Constant-score
    rewrite (the reference's IntervalScorer freq weighting is out of scope —
    match semantics only, documented divergence)."""
    terms: tuple[str, ...]
    max_width: int
    ordered: bool = True
    field: str = "text"
    boost: float = 1.0


@dataclass(frozen=True)
class SpanPositionRangeQuery:
    """Single-term span restricted to a position window
    (`queries/spans/SpanPositionRangeQuery.java`: spans with
    start() >= start and end() <= end; a term span's end is pos+1).
    Constant-score rewrite like IntervalQuery (documented divergence from
    span freq weighting).  ``span_first(term, end)`` is the
    SpanFirstQuery shorthand (`queries/spans/SpanFirstQuery.java` =
    position range [0, end))."""
    term: str
    start: int = 0
    end: int = 1 << 31
    field: str = "text"
    boost: float = 1.0


def span_first(term: str, end: int, field: str = "text",
               boost: float = 1.0) -> SpanPositionRangeQuery:
    return SpanPositionRangeQuery(term, 0, end, field=field, boost=boost)


@dataclass(frozen=True)
class SpanNotQuery:
    """Occurrences of `include` with NO `exclude` occurrence within
    [pos - pre, pos + post] (`queries/spans/SpanNotQuery.java` for term
    spans; pre/post default 0 = exact overlap exclusion).  A doc matches
    when at least one include occurrence survives.  Constant-score rewrite
    like the other span queries (documented divergence)."""
    include: str
    exclude: str
    pre: int = 0
    post: int = 0
    field: str = "text"
    boost: float = 1.0


@dataclass(frozen=True)
class RangeQuery:
    """Inclusive numeric/date range over a doc-values column
    (`search/PointRangeQuery.java` / `document/LongPoint.newRangeQuery`
    semantics re-expressed Ray-native: per-shard int64 doc-values columns
    with manifest min/max shard pruning instead of a BKD tree).  `None`
    bounds are open.  Standalone it scores constant `boost`; in FILTER
    position it contributes no score."""
    field: str
    lo: int | None = None
    hi: int | None = None
    boost: float = 1.0


@dataclass(frozen=True)
class PointRangeQuery:
    """Inclusive k-dimensional box over a BKD point field
    (`search/PointRangeQuery.java` over `index/points.py` sidecars;
    `document/LongPoint.newRangeQuery` builds the 1-D case).  ``lower`` /
    ``upper`` are per-dimension int bounds (``None`` = open); a doc matches
    when its point lies inside on EVERY dimension.  Constant score; in
    FILTER position it contributes no score (ConstantScoreWeight)."""
    field: str
    lower: tuple
    upper: tuple
    boost: float = 1.0

    def __post_init__(self):
        lo = self.lower if isinstance(self.lower, tuple) else (self.lower,)
        hi = self.upper if isinstance(self.upper, tuple) else (self.upper,)
        object.__setattr__(self, "lower", lo)
        object.__setattr__(self, "upper", hi)
        if len(lo) != len(hi):
            raise ValueError("lower/upper dimensionality mismatch")


@dataclass(frozen=True)
class RangeFieldQuery:
    """Query over doc-side RANGES (`document/RangeFieldQuery.java` /
    `document/LongRange.java`): each doc stores a k-dim [min, max] range as
    a 2k-dim point (first k dims = mins, last k = maxes — the reference's
    packed layout).  ``relation`` selects the per-dim predicate
    (RangeFieldQuery.QueryType):

      intersects: doc.min <= q.max AND doc.max >= q.min
      within:     doc.min >= q.min AND doc.max <= q.max
      contains:   doc.min <= q.min AND doc.max >= q.max
      crosses:    intersects AND NOT within      (:260-263)

    The first three are single BKD box visits on the 2k-dim sidecar; crosses
    is the set difference of two visits.  Constant score."""
    field: str
    relation: str
    lower: tuple
    upper: tuple
    boost: float = 1.0

    def __post_init__(self):
        lo = self.lower if isinstance(self.lower, tuple) else (self.lower,)
        hi = self.upper if isinstance(self.upper, tuple) else (self.upper,)
        object.__setattr__(self, "lower", lo)
        object.__setattr__(self, "upper", hi)
        if len(lo) != len(hi):
            raise ValueError("lower/upper dimensionality mismatch")
        if self.relation not in ("intersects", "within", "contains", "crosses"):
            raise ValueError(f"unknown range relation {self.relation!r}")


@dataclass(frozen=True)
class DocValuesNumbersQuery:
    """Set membership over an int64 doc-values column
    (`sandbox/search/DocValuesNumbersQuery.java`): a doc matches when its
    value is one of ``values``.  Constant score; like the reference it is
    a doc-values iterator (no index structure), so it shines in FILTER
    position under a selective scoring clause."""
    field: str
    values: tuple

    def __post_init__(self):
        object.__setattr__(self, "values",
                           tuple(int(v) for v in self.values))


@dataclass(frozen=True)
class CoveringQuery:
    """Per-document minimum-should-match (`sandbox/search/CoveringQuery.java`
    / CoveringScorer): a doc matches when at least ``min_match`` of the
    sub-queries match it, where ``min_match`` is an int constant or the
    name of an int64 doc-values column (LongValuesSource), clamped to >= 1
    per doc (CoveringScorer.java:135-141).  Score = float32 sum of the
    matching sub-queries' scores in clause order."""
    queries: tuple
    min_match: object            # int constant | str doc-values column


@dataclass(frozen=True)
class PointMultiRangeQuery:
    """Union of k-dim boxes over one point field (the sandbox
    `sandbox/.../MultiRangeQuery.java` surface): a doc matches when its
    point lies in ANY of the boxes.  Each range is a (lower, upper) pair of
    per-dimension int tuples (``None`` = open).  Constant score."""
    field: str
    ranges: tuple
    boost: float = 1.0


@dataclass(frozen=True)
class PointInSetQuery:
    """Point-membership query (`search/PointInSetQuery.java` /
    `document/LongPoint.newSetQuery`): a doc matches when its point equals
    one of ``values`` exactly (each value a per-dimension int tuple).
    Constant score."""
    field: str
    values: tuple

    def __post_init__(self):
        vals = tuple(v if isinstance(v, tuple) else (v,) for v in self.values)
        object.__setattr__(self, "values", vals)


@dataclass(frozen=True)
class IndexOrDocValuesQuery:
    """Wrapper over two EQUIVALENT queries with different execution profiles
    (`search/IndexOrDocValuesQuery.java`): `index_query` is efficient when it
    leads iteration, `dv_query` when another clause leads and the range only
    verifies candidates.  The caller contracts that both match the same docs
    (Lucene does not verify either).  Execution here is cost-based in the
    boolean scorer: with required term clauses present the range is checked
    per-candidate against doc-values (`scorer._verify_ranges`); standalone or
    range-led booleans use the full-shard mask with min/max shard pruning."""
    index_query: "RangeQuery"
    dv_query: "RangeQuery | None" = None

    def rewrite(self) -> "RangeQuery":
        return self.index_query


@dataclass(frozen=True)
class ToParentBlockJoinQuery:
    """Child-to-parent join (`join/src/java/org/apache/lucene/search/join/
    ToParentBlockJoinQuery.java` / `ParentChildrenBlockJoinQuery.java`
    semantics, Ray-native): parents are CONVERSATIONS, children are turns.
    The build's conv_id range partitioning co-locates every conversation
    inside one shard (the doc-block invariant the reference gets from
    addDocuments), so the join is a per-shard segmented reduction: run the
    child query, group matching turns by conv_id, combine child scores with
    `score_mode` (max | total | avg), represent each parent by its FIRST
    matching child's docID (global order == conv order) and merge parent
    top-k TopDocs-style."""
    child: object
    score_mode: str = "max"

    def __post_init__(self):
        if self.score_mode not in ("max", "total", "avg"):
            raise ValueError(self.score_mode)


@dataclass(frozen=True)
class ToChildBlockJoinQuery:
    """Parent-to-child join (`join/src/java/org/apache/lucene/search/join/
    ToChildBlockJoinQuery.java` semantics, Ray-native): the parent side is a
    conversation-level match — expressed, like :class:`ToParentBlockJoinQuery`,
    as a child query aggregated per conversation with `score_mode` — and the
    result enumerates EVERY live turn of each matching conversation, scored
    with its parent's joined score (the reference's parentScore
    propagation).  Same doc-block invariant: conv_id range partitioning
    keeps each conversation inside one shard."""
    parent: object
    score_mode: str = "max"

    def __post_init__(self):
        if self.score_mode not in ("max", "total", "avg"):
            raise ValueError(self.score_mode)


@dataclass(frozen=True)
class FunctionScoreQuery:
    """Rescores the wrapped query's matches with an arithmetic expression
    over `_score` and doc-values fields (`queries/function/
    FunctionScoreQuery.java` + the `expressions` module's
    `JavascriptCompiler` binding `SimpleBindings` to sort fields/score).
    The expression string is compiled per shard into one vectorized numpy
    pass (see search/expressions.py)."""
    query: object
    expression: str


@dataclass(frozen=True)
class SortField:
    """Sort specification for field-sorted top-k
    (`search/SortField.java:57-126`): order by the doc-values column
    (descending when reverse), tie-break global docID ascending
    (`search/TopFieldCollector.java:39` + TopDocs merge semantics)."""
    field: str
    reverse: bool = False


@dataclass(frozen=True)
class SortedNumericSortField:
    """Sort on a MULTI-VALUED numeric doc-values column through a selector
    (`search/SortedNumericSortField.java` + `SortedNumericSelector.java`):
    each doc's sort value is the MIN or MAX of its value set; docs with no
    values take ``missing`` (SortField missingValue, default 0 like the
    reference LongComparator).  Tie-break global docID ascending."""
    field: str
    selector: str = "min"          # "min" | "max"
    reverse: bool = False
    missing: int = 0


@dataclass(frozen=True)
class SortedSetSortField:
    """Sort on a MULTI-VALUED string doc-values column through a selector
    (`search/SortedSetSortField.java` + `SortedSetSelector.java`): each
    doc's sort key is the MIN / MAX / MIDDLE_MIN / MIDDLE_MAX of its
    DISTINCT value set (middle selectors pick the lower / higher of the two
    middles on even counts).  Docs with no values sort first ascending
    (reference TermOrdValComparator null-ord semantics); hit.fields carries
    the selected string (None when missing)."""
    field: str
    selector: str = "min"          # "min" | "max" | "middle_min" | "middle_max"
    reverse: bool = False


@dataclass(frozen=True)
class SortedNumericRangeQuery:
    """Slow range over a multi-valued numeric dv column
    (`document/SortedNumericDocValuesField.java` newSlowRangeQuery /
    newSlowExactQuery): constant-score docs with AT LEAST ONE value in
    [lower, upper] (None bound = unbounded).  Shard manifest flattened
    min/max prunes non-overlapping shards first."""
    field: str
    lower: int | None = None
    upper: int | None = None


@dataclass(frozen=True)
class SortedNumericSetQuery:
    """Slow set query over a multi-valued numeric dv column
    (`document/SortedNumericDocValuesField.newSlowSetQuery` /
    `SortedNumericDocValuesSetQuery.java`): constant-score docs with AT
    LEAST ONE value in the set — the multi-valued sibling of
    DocValuesNumbersQuery."""
    field: str
    values: tuple


@dataclass(frozen=True)
class FeatureSortField:
    """Sort by a FeatureField's decoded static score
    (`document/FeatureSortField.java`): value = decode(encoded freq),
    DESCENDING always (the reference's comparator is reverse-only — higher
    feature first), docs without the feature at 0.0; global docID
    ascending tie-break.  The reference addresses (field, featureName);
    here each feature is one encoded dv column, so ``field`` names it
    directly.  setMissingValue is unsupported in the reference — there is
    deliberately no missing/reverse knob."""
    field: str
    reverse = True            # class attr: the reference comparator is
                              # descending-only (SortField.Type.CUSTOM, true)


@dataclass(frozen=True)
class DocValuesRewriteQuery:
    """DocValuesRewriteMethod (`search/DocValuesRewriteMethod.java`): a
    MultiTermQuery (prefix / wildcard / regexp / fuzzy / term-range /
    term-set) evaluated against a SortedSet DOC-VALUES field instead of the
    postings dictionary: per shard, intersect the wrapped query with the dv
    vocab to an ord set, then constant-score docs carrying ANY matching
    ord.  Terms are matched RAW (dv values are not analyzed), matching the
    reference's dv TermsEnum visit."""
    field: str
    query: object


@dataclass(frozen=True)
class SortedSetRangeQuery:
    """Slow range over a multi-valued string dv column
    (`document/SortedSetDocValuesField.java` newSlowRangeQuery): constant-
    score docs with at least one value in the [lower, upper] term range;
    inclusive flags follow the reference's lowerInclusive/upperInclusive."""
    field: str
    lower: str | None = None
    upper: str | None = None
    include_lower: bool = True
    include_upper: bool = True


@dataclass(frozen=True)
class ExpressionSort:
    """Sort by an arithmetic expression over doc-values columns (the
    `expressions` module's `Expression.getSortField` /
    `DoubleValuesSource.getSortField` surface): float64 sort values,
    global-docID-asc tie-break.  Same compiled-expression engine as
    FunctionScoreQuery (`search/expressions.py`), without `_score` (sorted
    collection runs scoreless, needsScores=false)."""
    expression: str
    reverse: bool = False


@dataclass(frozen=True)
class BooleanClause:
    query: "TermQuery"
    occur: str = SHOULD


@dataclass(frozen=True)
class BooleanQuery:
    clauses: tuple[BooleanClause, ...] = ()
    minimum_should_match: int = 0

    def __post_init__(self):
        if len(self.clauses) > 1024:   # BooleanQuery.maxClauseCount
            raise ValueError("too many clauses")


@dataclass(frozen=True)
class SynonymQuery:
    """Scores several terms as ONE pseudo-term (`search/SynonymQuery.java:51`,
    SynonymWeight at :199-227): pseudo docFreq = max of the terms' dfs,
    pseudo totalTermFreq = sum; per-doc freq = sum of boost_i * freq_i
    (boosts in (0, 1]); a single BM25 evaluation on the blended freq."""
    terms: tuple[str, ...]
    boosts: tuple[float, ...] = ()
    field: str = "text"
    boost: float = 1.0

    def __post_init__(self):
        if self.boosts and len(self.boosts) != len(self.terms):
            raise ValueError("boosts must match terms")
        for b in self.boosts:
            if not (0 < b <= 1):
                raise ValueError("synonym term boost must be in (0, 1]")


@dataclass(frozen=True)
class BlendedTermQuery:
    """Blends several terms' statistics so their scores are comparable
    (`search/BlendedTermQuery.java`): every term is scored with the MAX
    docFreq across the set (the df-adjustment of adjustFrequencies), then
    combined with the default DisjunctionMax rewrite (tie_breaker = 0.01,
    BlendedTermQuery.DISJUNCTION_MAX_REWRITE)."""
    terms: tuple[str, ...]
    boosts: tuple[float, ...] = ()
    field: str = "text"
    boost: float = 1.0

    def __post_init__(self):
        if self.boosts and len(self.boosts) != len(self.terms):
            raise ValueError("boosts must match terms")


@dataclass(frozen=True)
class CommonTermsQuery:
    """Splits its terms by document frequency at rewrite time
    (`queries/src/java/org/apache/lucene/queries/CommonTermsQuery.java:
    1-418`): rare terms form a low-frequency group (``low_freq_occur`` per
    term + ``low_freq_msm``), common terms a high-frequency SHOULD-style
    group — so stopword-like terms influence ranking without gating recall.
    ``max_term_frequency`` >= 1.0 is an absolute docFreq cutoff, else a
    fraction of maxDoc.  Rewrites: both groups present -> Boolean(MUST
    low-group, SHOULD high-group); one group empty -> the other alone."""
    terms: tuple[str, ...]
    max_term_frequency: float = 0.01
    low_freq_occur: str = SHOULD
    high_freq_occur: str = SHOULD
    low_freq_msm: int = 0
    high_freq_msm: int = 0
    field: str = "text"


@dataclass(frozen=True)
class DisjunctionMaxQuery:
    """score = max(clause scores) + tie_breaker * sum(other clause scores)
    (`search/DisjunctionMaxQuery.java`); clauses are TermQuerys."""
    queries: tuple[TermQuery, ...]
    tie_breaker: float = 0.0


@dataclass(frozen=True)
class IndriAndQuery:
    """Indri-style AND (`search/IndriAndQuery.java` + `IndriAndScorer.java:
    17-90`): matches the UNION of its term clauses' docs; score = the
    boost-weighted AVERAGE of per-clause scores, where a clause absent
    from the doc contributes its freq=0 smoothing score (the Indri
    "smoothing acts like idf" behavior).  Clauses score under
    IndriDirichletSimilarity regardless of the searcher's similarity
    (the reference requires IndriScorer subscorers)."""
    queries: tuple          # TermQuerys (boosts respected)
    mu: float = 2000.0


@dataclass(frozen=True)
class BoostQuery:
    """Wraps a query, multiplying its boost (`search/BoostQuery.java`)."""
    query: object
    boost: float = 1.0


@dataclass(frozen=True)
class ConstantScoreQuery:
    """Matches of the inner query all score `boost`
    (`search/ConstantScoreQuery.java`)."""
    query: object
    boost: float = 1.0


@dataclass(frozen=True)
class FieldExistsQuery:
    """Matches docs that have any value for a keyword field
    (`search/FieldExistsQuery.java` surface): rewritten to a prefix scan of
    the field's keyword-term namespace, constant-score."""
    field: str
    boost: float = 1.0


@dataclass(frozen=True)
class TermInSetQuery:
    """Matches docs containing ANY of the given terms, constant score
    (`search/TermInSetQuery.java`: the efficient many-term filter that
    rewrites to a bit-set union instead of a scoring disjunction).  Executes
    on the same per-shard constant-score union path as the multi-term
    queries; each shard intersects the set with its own dictionary."""
    terms: tuple[str, ...]
    field: str = "text"
    boost: float = 1.0


@dataclass(frozen=True)
class TermRangeQuery:
    """Lexicographic term-dictionary range (`search/TermRangeQuery.java`):
    docs containing any term in [lower, upper] under the include flags
    (None = open end), constant-score multi-term rewrite with per-shard
    expansion.  Keyword-namespace terms are excluded — the range runs over
    the analyzed text field's dictionary (the reference's per-field terms)."""
    lower: str | None
    upper: str | None
    include_lower: bool = True
    include_upper: bool = True
    field: str = "text"
    boost: float = 1.0


@dataclass(frozen=True)
class ExpressionRangeQuery:
    """FunctionRangeQuery on the expressions engine
    (`queries/function/FunctionRangeQuery.java` ValueSourceScorer): docs
    whose compiled doc-values expression value lies in [lo, hi] under the
    include flags (None = open end); constant score, scoreless evaluation
    (_score is rejected, like ExpressionSort)."""
    expression: str
    lo: float | None
    hi: float | None
    include_lower: bool = True
    include_upper: bool = True
    boost: float = 1.0


@dataclass(frozen=True)
class PrefixQuery:
    """Term-dictionary prefix expansion, rewritten to a constant-score union
    (`search/PrefixQuery.java` with CONSTANT_SCORE_REWRITE semantics: every
    matching doc scores boost)."""
    prefix: str
    field: str = "text"
    boost: float = 1.0


@dataclass(frozen=True)
class WildcardQuery:
    """`*` (any run) / `?` (one char) pattern over the term dictionary
    (`search/WildcardQuery.java`), constant-score rewrite."""
    pattern: str
    field: str = "text"
    boost: float = 1.0


@dataclass(frozen=True)
class RegexpQuery:
    """Anchored regular-expression term expansion (`search/RegexpQuery.java`)
    in LUCENE's RegExp dialect (`util/automaton/RegExp.java` via
    `util/regexp.py`: union/concat/repeats/classes plus — under the default
    ALL flags — intersection ``&``, numerical intervals ``<n-m>``,
    any-string ``@`` and empty-language ``#``), constant-score rewrite."""
    regexp: str
    field: str = "text"
    boost: float = 1.0
    flags: int = 0xFF            # RegExp.ALL; pass util.regexp flag bits


@dataclass(frozen=True)
class FuzzyQuery:
    """Levenshtein expansion within max_edits (`search/FuzzyQuery.java`).
    Scored contexts use the reference's default
    TopTermsBlendedFreqScoringRewrite (`MultiTermQuery.java:197-230`):
    the top ``max_expansions`` variants by (boost desc, term asc) — boost
    = 1 for exact else 1 - ed/min(|term|,|query|) per FuzzyTermsEnum:249-255
    — scored as a SHOULD-sum of TermQuerys whose docFreq is blended to the
    set's max (BlendedTermQuery BOOLEAN_REWRITE).  Scoreless contexts
    (count / FILTER / MUST_NOT) keep the capped constant-score expansion
    (no stats loads).  rewrite="constant_score" forces the old flat
    behavior (CONSTANT_SCORE_BLENDED rewrite role)."""
    term: str
    max_edits: int = 2
    prefix_length: int = 0
    field: str = "text"
    boost: float = 1.0
    max_expansions: int = 50
    rewrite: str = "top_terms_blended"
    # adjacent swaps count as one edit (FuzzyQuery.defaultTranspositions —
    # the LevenshteinAutomata withTranspositions=true default)
    transpositions: bool = True


@dataclass(frozen=True)
class CombinedFieldQuery:
    """BM25F over a synthetic combined field
    (`sandbox/.../search/CombinedFieldQuery.java:67-96`): term freqs are the
    weighted sum of per-field freqs, the norm is the re-encoded weighted sum
    of per-field decoded lengths (MultiNormsLeafSimScorer.java:143-152), and
    term/collection statistics blend as max(df) / sum(w*ttf)
    (CombinedFieldWeight:328-371).  Here the analyzed `text` field combines
    with keyword fields (single-token fields of decoded length 1) — the
    engine's other indexed-field kind; weights must be >= 1."""
    terms: tuple
    fields: tuple                 # of (field_name, weight >= 1)
    boost: float = 1.0


@dataclass(frozen=True)
class FuzzyLikeThisQuery:
    """Fuzzify every analyzed term of the provided strings, keep the best
    `max_num_terms` differentiating variants across all of them, rewrite to
    a SHOULD boolean (`sandbox/.../queries/FuzzyLikeThisQuery.java:189-332`):
    variants of one source term share the SOURCE term's df for their IDF
    factor (misspellings must not win on rarity); each selected variant
    scores with ARTIFICIAL df=1/ttf=1 term stats, boosted by
    similarity^2 * classic idf(source df); `ignore_tf` swaps the inner
    term queries for constant-score ones."""
    fields: tuple                 # of (query_string, max_edits, prefix_length)
    max_num_terms: int = 25
    ignore_tf: bool = False
    boost: float = 1.0
    MAX_VARIANTS_PER_TERM = 50


@dataclass(frozen=True)
class MoreLikeThisQuery:
    """Deferred find-similar query (`queries/mlt/MoreLikeThisQuery.java`):
    rewrite at search time builds the MoreLikeThis SHOULD boolean from the
    like-text against the INDEX's stats, then applies
    minimumNumberShouldMatch = int(clauses * percent_terms_to_match)
    (MoreLikeThisQuery.rewrite:68-80).  The XML `LikeThisQuery` element
    builds this."""
    like_text: str
    max_query_terms: int = 20
    min_term_freq: int = 1
    min_doc_freq: int = -1        # -1 -> MoreLikeThis default (5)
    percent_terms_to_match: float = 0.3
    field: str = "text"
    boost: float = 1.0


def bool_query(should=(), must=(), filter_=(), must_not=(), minimum_should_match=0) -> BooleanQuery:
    cl = [BooleanClause(TermQuery(t) if isinstance(t, str) else t, SHOULD) for t in should]
    cl += [BooleanClause(TermQuery(t) if isinstance(t, str) else t, MUST) for t in must]
    cl += [BooleanClause(TermQuery(t) if isinstance(t, str) else t, FILTER) for t in filter_]
    cl += [BooleanClause(TermQuery(t) if isinstance(t, str) else t, MUST_NOT) for t in must_not]
    return BooleanQuery(tuple(cl), minimum_should_match)


def parse_query(text: str, field: str = "text"):
    """Free text -> SHOULD-of-analyzed-terms (QueryParser default-field
    behavior, `queryparser/classic/QueryParserBase.java:132`)."""
    from ..analysis.standard import analyze

    terms = analyze(text)
    if len(terms) == 1:
        return TermQuery(terms[0], field)
    return bool_query(should=[TermQuery(t, field) for t in terms])


def extract_terms(q) -> list[TermQuery]:
    if isinstance(q, TermQuery):
        return [q]
    if isinstance(q, BooleanQuery):
        return [c.query for c in q.clauses]
    return []


def parse_simple(text: str, field: str = "text", default_operator: str = SHOULD):
    """SimpleQueryParser — the tolerant end-user dialect
    (`queryparser/simple/SimpleQueryParser.java:1-651`): never raises; any
    malformed syntax degrades to terms.

        a b        -> a OR b (default operator SHOULD; pass MUST for AND)
        a + b      -> a AND b          a | b     -> a OR b
        -a         -> NOT a            "a b"     -> phrase, "a b"~2 sloppy
        pre*       -> prefix           term~1    -> fuzzy
        (a | b) + c                    precedence: + binds tighter than |

    Unbalanced quotes/parens and dangling operators are repaired, matching
    the reference's error-tolerant contract."""
    import re as _re

    from ..analysis.standard import analyze

    tok_pat = _re.compile(
        r"""(?P<lp>\()|(?P<rp>\))|(?P<and>\+)|(?P<or>\|)|(?P<not>-(?=\S))
          |"(?P<phrase>[^"]*)"?(?:~(?P<slop>\d+))?
          |(?P<word>(?:\\.|[^\s()+|\\])+\\?|\\)""", _re.VERBOSE)
    tokens = []
    for m in tok_pat.finditer(text):
        if m.group("lp"):
            tokens.append(("(", None))
        elif m.group("rp"):
            tokens.append((")", None))
        elif m.group("and"):
            tokens.append(("AND", None))
        elif m.group("or"):
            tokens.append(("OR", None))
        elif m.group("not"):
            tokens.append(("NOT", None))
        elif m.group("phrase") is not None:
            tokens.append(("phrase", (m.group("phrase"), m.group("slop"))))
        else:
            tokens.append(("word", m.group("word")))

    pos = [0]

    def _atom():
        """One clause: term / phrase / prefix / fuzzy / group; None if the
        next token cannot start a clause (tolerance)."""
        while pos[0] < len(tokens):
            kind, val = tokens[pos[0]]
            if kind in ("AND", "OR"):      # dangling operator: skip
                pos[0] += 1
                continue
            break
        if pos[0] >= len(tokens):
            return None
        kind, val = tokens[pos[0]]
        if kind == ")":
            return None
        if kind == "NOT":
            pos[0] += 1
            sub = _atom()
            return ("NOT", sub) if sub is not None else None
        if kind == "(":
            pos[0] += 1
            sub = _expr()
            if pos[0] < len(tokens) and tokens[pos[0]][0] == ")":
                pos[0] += 1
            return sub
        pos[0] += 1
        if kind == "phrase":
            ptext, slop = val
            terms = tuple(analyze(ptext))
            if not terms:
                return None
            if len(terms) == 1:
                return TermQuery(terms[0], field)
            return PhraseQuery(terms, field, slop=int(slop) if slop else 0)
        word = val
        fm = _re.fullmatch(r"(.*)~(\d+)", word)
        if fm and _escaped_at(word, len(fm.group(1))):
            fm = None                      # \~ is literal
        if fm:
            analyzed = analyze(_discard_escapes(fm.group(1)))
            if not analyzed:
                return None
            return FuzzyQuery(analyzed[0], max_edits=int(fm.group(2)), field=field)
        if word.endswith("*") and len(word) > 1 \
                and not _escaped_at(word, len(word) - 1):
            return PrefixQuery(_discard_escapes(word[:-1]).lower(), field)
        terms = analyze(_discard_escapes(word))
        if not terms:
            return None
        if len(terms) == 1:
            return TermQuery(terms[0], field)
        return bool_query(should=[TermQuery(t, field) for t in terms])

    def _and_group():
        """clause (+ clause)* — explicit '+' joins as MUST."""
        parts = [("POS", None)]
        first = _atom()
        if first is None:
            return None
        parts = [first]
        while pos[0] < len(tokens) and tokens[pos[0]][0] == "AND":
            pos[0] += 1
            nxt = _atom()
            if nxt is None:
                break
            parts.append(nxt)
        if len(parts) == 1:
            return parts[0]
        clauses = []
        for p in parts:
            if isinstance(p, tuple) and p and p[0] == "NOT":
                clauses.append(BooleanClause(p[1], MUST_NOT))
            else:
                clauses.append(BooleanClause(p, MUST))
        return BooleanQuery(tuple(clauses))

    def _expr():
        """and_group (('|' | adjacency) and_group)* with the default
        operator joining adjacent groups."""
        groups = []
        ops = []
        g = _and_group()
        if g is None:
            return None
        groups.append(g)
        while pos[0] < len(tokens):
            kind, _ = tokens[pos[0]]
            if kind == ")":
                break
            if kind == "OR":
                pos[0] += 1
                ops.append(SHOULD)
            else:
                ops.append(default_operator)
            g = _and_group()
            if g is None:
                ops.pop()
                break
            groups.append(g)
        if len(groups) == 1:
            g = groups[0]
            if isinstance(g, tuple) and g and g[0] == "NOT":
                return BooleanQuery((BooleanClause(g[1], MUST_NOT),))
            return g
        # mixed operators: explicit '|' anywhere makes the join SHOULD;
        # all-default joins use the default operator
        occur = SHOULD if SHOULD in ops else MUST
        clauses = []
        for g in groups:
            if isinstance(g, tuple) and g and g[0] == "NOT":
                clauses.append(BooleanClause(g[1], MUST_NOT))
            else:
                clauses.append(BooleanClause(g, occur))
        return BooleanQuery(tuple(clauses))

    q = _expr()
    return q if q is not None else BooleanQuery(())


@dataclass(frozen=True)
class ComplexPhraseQuery:
    """Phrase whose slots may be multi-term expansions — wildcard, prefix,
    fuzzy, or (a b) alternative groups embedded in a quoted phrase
    (`queryparser/complexPhrase/ComplexPhraseQueryParser.java:1-480`, which
    rewrites to SpanNearQuery over SpanMultiTermQueryWrapper spans).  Each
    slot is a tuple whose elements are concrete term strings or multi-term
    primitives (PrefixQuery / WildcardQuery / RegexpQuery / FuzzyQuery /
    TermInSetQuery); expansion happens PER SHARD against that shard's
    dictionary at execution time (the per-leaf rewrite model — no global
    dictionary).  Scored constant `boost` per matching doc — the repo's
    multi-term CONSTANT_SCORE rewrite convention (the reference's span
    scoring is noted as a divergence, like FuzzyQuery's blended rewrite)."""
    slots: tuple[tuple, ...]
    slop: int = 0
    field: str = "text"
    boost: float = 1.0

    def __post_init__(self):
        if any(len(s) == 0 for s in self.slots):
            raise ValueError("empty slot")


def parse_classic(text: str, field: str = "text",
                  default_operator: str = "OR"):
    """Classic-QueryParser syntax (`queryparser/classic/QueryParser.java`
    surface, re-implemented as a small recursive-descent parser):

        +term      -> MUST          -term      -> MUST_NOT
        a AND b / && -> both MUST    a OR b / || -> SHOULD
        NOT x / !x -> MUST_NOT       (addClause flip semantics;
                                      default_operator="AND" supported)
        term       -> SHOULD        "a b"      -> PhraseQuery
        "a b"~2    -> sloppy phrase  term~1     -> FuzzyQuery(max_edits)
        pre*       -> PrefixQuery    w?ld*card  -> WildcardQuery
        term^2.5   -> boost          (a b) +c   -> nested BooleanQuery
        role:user  -> keyword-field TermQuery (non-default field)
        ts:[1 TO 9] / ts:{1 TO 9}   -> inclusive/exclusive int RangeQuery
        ts:[* TO 9]                 -> open bound

    Free text falls back to analyzed SHOULD terms (QueryParserBase.parse
    default-field behavior); nested groups execute through the recursive
    dense boolean path."""
    return _parse_classic(text, field, complex_phrases=False,
                          default_operator=default_operator)


def parse_complex_phrase(text: str, field: str = "text"):
    """ComplexPhraseQueryParser dialect (`queryparser/complexPhrase/
    ComplexPhraseQueryParser.java:1-480`): classic syntax, but quoted
    phrases may embed wildcard / prefix / fuzzy terms and (a b) alternative
    groups — e.g. ``"(john jon) smyth~1"`` or ``"merge jo*"~2`` — parsed
    into :class:`ComplexPhraseQuery`.  Plain quoted phrases stay ordinary
    PhraseQueries."""
    return _parse_classic(text, field, complex_phrases=True)


def _complex_phrase_query(ptext: str, slop: int, field: str):
    """Inner-phrase parser: whitespace items; ``(a b)`` = one slot of
    alternatives; per item wildcard/prefix/fuzzy primitives or analyzed
    terms."""
    import re as _re

    from ..analysis.standard import analyze

    slots = []
    for item in _re.findall(r"\([^)]*\)|\S+", ptext):
        alts = item[1:-1].split() if item.startswith("(") else [item]
        slot = []
        for w in alts:
            em = _re.fullmatch(r"(.+)~(\d+)", w)
            if em:
                base = analyze(em.group(1))
                if base:
                    slot.append(FuzzyQuery(base[0], max_edits=int(em.group(2)),
                                           field=field))
                continue
            if "*" in w or "?" in w:
                if w.endswith("*") and "*" not in w[:-1] and "?" not in w:
                    slot.append(PrefixQuery(w[:-1].lower(), field))
                else:
                    slot.append(WildcardQuery(w.lower(), field))
                continue
            slot.extend(analyze(w))
        if slot:
            slots.append(tuple(slot))
    if not slots:
        return None
    if len(slots) == 1 and len(slots[0]) == 1 and isinstance(slots[0][0], str):
        return TermQuery(slots[0][0], field)
    return ComplexPhraseQuery(tuple(slots), slop=slop, field=field)


def _mf_boost(q, f, boosts):
    """Apply the MultiFieldQueryParser per-field boost map (BoostQuery wrap,
    `MultiFieldQueryParser.java:92-100`)."""
    if boosts:
        b = boosts.get(f)
        if b is not None:
            return BoostQuery(q, b)
    return q


def _mf_group(legs):
    """One cross-field SHOULD group (`MultiFieldQueryParser.java:188-199`);
    a single surviving leg is added bare, as the reference does when
    maxTerms == 1."""
    if len(legs) == 1:
        return legs[0]
    return BooleanQuery(tuple(BooleanClause(q, SHOULD) for q in legs))


def parse_multi_field(text: str, fields, boosts=None):
    """MultiFieldQueryParser (`queryparser/classic/MultiFieldQueryParser.java:
    83-297`): classic syntax where every field-LESS leaf expands across
    `fields` — grouped per analyzed term, so ``one two`` over (title, body)
    becomes ``(title:one body:one) (title:two body:two)`` — with an optional
    per-field boost map applied inside each group.  Explicitly fielded
    syntax (``role:user``, ``ts:[..]``, ``text:foo``) stays single-field,
    like the reference's non-null-field dispatch.

    Engine field model: ``text`` is the analyzed field; every other name is
    a keyword namespace whose terms are stored as ``f\\x1fvalue`` —
    expansion legs there use the RAW token (StringField semantics).  Fuzzy
    legs in a keyword namespace pin the namespace prefix via
    ``prefix_length`` so edits apply to the value only; prefix/wildcard
    legs prepend the namespace to the pattern."""
    return _parse_classic(text, "text", complex_phrases=False,
                          multi=(tuple(fields), dict(boosts or {})))


def multi_field_parse(queries, fields, flags=None, boosts=None):
    """The static MultiFieldQueryParser.parse overloads
    (`MultiFieldQueryParser.java:300-420`): ``queries[i]`` parsed against
    ``fields[i]`` (or one query string against every field), combined with
    ``flags[i]`` occurs (default SHOULD); empty per-field parses are
    skipped, as the reference's ``q != null`` / non-empty-boolean guard."""
    qs = [queries] * len(fields) if isinstance(queries, str) else list(queries)
    if len(qs) != len(fields):
        raise ValueError("queries, fields lengths differ")
    occurs = list(flags) if flags is not None else [SHOULD] * len(fields)
    if len(occurs) != len(fields):
        raise ValueError("queries, fields, flags lengths differ")
    cl = []
    for qtext, f, oc in zip(qs, fields, occurs):
        q = parse_multi_field(qtext, (f,), boosts)
        if isinstance(q, BooleanQuery) and not q.clauses:
            continue
        cl.append(BooleanClause(q, oc))
    return BooleanQuery(tuple(cl))


def classic_escape(s: str) -> str:
    """`QueryParserUtil.escape` / `QueryParserBase.escape`: backslash every
    character the classic grammar treats as syntax, so arbitrary user text
    parses as literal terms."""
    out = []
    for c in s:
        if c in '\\+-!():^[]"{}~*?|&/':
            out.append("\\")
        out.append(c)
    return "".join(out)


def _discard_escapes(s: str) -> str:
    """`QueryParserBase.discardEscapeChar`: drop escape backslashes keeping
    the escaped char; ``\\uXXXX`` decodes a unicode codepoint.  Lenient on
    a trailing lone backslash (kept literal)."""
    out = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            if s[i + 1] == "u" and i + 6 <= n and all(
                    ch in "0123456789abcdefABCDEF" for ch in s[i + 2:i + 6]):
                out.append(chr(int(s[i + 2:i + 6], 16)))
                i += 6
                continue
            out.append(s[i + 1])
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _escaped_at(s: str, idx: int) -> bool:
    """True when s[idx] is preceded by an odd number of backslashes."""
    k = 0
    j = idx - 1
    while j >= 0 and s[j] == "\\":
        k += 1
        j -= 1
    return k % 2 == 1


def _has_unescaped(s: str, chars) -> bool:
    return any(c in chars and not _escaped_at(s, i)
               for i, c in enumerate(s))


def _parse_classic(text: str, field: str, complex_phrases: bool,
                   extensions=None, multi=None, default_operator="OR",
                   precedence: bool = False):
    import re as _re

    # lexer: parens, field ranges, field:"quoted" composites, quoted
    # phrases (with slop), bare words.  fielded-quote tokens keep the
    # quotes so the extension dispatch sees the raw form
    # (`queryparser/ext/ExtendableQueryParser.java` getFieldQuery hook).
    tok_pat = _re.compile(
        r"""(?P<lp>\()|(?P<rp>\))|(?P<sign>[+-])(?=\S)
          |(?P<range>(?:\w+:)?[\[\{][^\]\}]*?\s+TO\s+[^\]\}]*?[\]\}])
          |(?P<fquoted>(?:[^\s()"\\]|\\.)+:"[^"]*")
          |"(?P<phrase>[^"]*)"(?:~(?P<slop>\d+(?:\.\d+)?))?
          |(?P<word>(?:[^\s()\\]|\\.)+\\?|\\)""", _re.VERBOSE)
    tokens = []
    for m in tok_pat.finditer(text):
        if m.group("lp"):
            tokens.append(("(", None))
        elif m.group("rp"):
            tokens.append((")", None))
        elif m.group("sign"):
            tokens.append(("sign", m.group("sign")))
        elif m.group("range"):
            tokens.append(("range", m.group("range")))
        elif m.group("fquoted"):
            tokens.append(("fquoted", m.group("fquoted")))
        elif m.group("phrase") is not None:
            tokens.append(("phrase", (m.group("phrase"), m.group("slop"))))
        else:
            tokens.append(("word", m.group("word")))

    pos = [0]

    def parse_group(group_field=None):
        from ..analysis.standard import analyze

        clauses = []
        state = {"conj": None, "not": False}

        def peek_boost():
            # Clause := ... (CARAT <NUMBER>)? — the classic grammar allows
            # a boost after ANY clause (groups, phrases, ranges), not just
            # bare terms (QueryParser.jj Clause production)
            if pos[0] < len(tokens):
                k, v = tokens[pos[0]]
                if k == "word":
                    bm = _re.fullmatch(r"\^(\d+(?:\.\d+)?)", v)
                    if bm:
                        pos[0] += 1
                        return float(bm.group(1))
            return None

        def boosted(q):
            b = peek_boost()
            if b is None or q is None:
                return q
            if hasattr(q, "boost") and not isinstance(q, BooleanQuery):
                import dataclasses as _dc

                return _dc.replace(q, boost=q.boost * b)
            return BoostQuery(q, b)

        def emit(pair):
            # QueryParserBase.addClause conjunction semantics: AND flips
            # the previous non-prohibited clause to required; with the
            # AND default operator, OR flips it back to optional
            q, occur = pair
            if precedence:
                # PrecedenceQueryParser: record the raw (query, sign, conj)
                # stream; operator-precedence grouping happens at group end
                sign = "+" if occur == MUST else \
                       "-" if occur == MUST_NOT else None
                clauses.append((q, sign, state["conj"]))
                state["conj"] = None
                state["not"] = False
                return
            conj = state["conj"]
            if conj == "AND" and clauses and clauses[-1][1] != MUST_NOT:
                clauses[-1] = (clauses[-1][0], MUST)
            if default_operator == "AND":
                if conj == "OR" and clauses and clauses[-1][1] != MUST_NOT:
                    clauses[-1] = (clauses[-1][0], SHOULD)
                if occur == SHOULD and conj != "OR":
                    occur = MUST
            elif conj == "AND" and occur == SHOULD:
                occur = MUST
            clauses.append((q, occur))
            state["conj"] = None
            state["not"] = False

        while pos[0] < len(tokens):
            kind, val = tokens[pos[0]]
            if kind == ")":
                pos[0] += 1
                break
            if kind == "word" and val in ("AND", "&&"):
                state["conj"] = "AND"
                pos[0] += 1
                continue
            if kind == "word" and val in ("OR", "||"):
                state["conj"] = "OR"
                pos[0] += 1
                continue
            if kind == "word" and (val in ("NOT", "!")
                                   or (val.startswith("!") and len(val) > 1
                                       and not _escaped_at(val, 0))):
                state["not"] = True
                if val in ("NOT", "!"):
                    pos[0] += 1
                else:
                    tokens[pos[0]] = ("word", val[1:])
                continue
            occur = MUST_NOT if state["not"] else SHOULD
            if kind == "sign":
                occur = MUST if val == "+" else MUST_NOT
                pos[0] += 1
                if pos[0] >= len(tokens):
                    break
                kind, val = tokens[pos[0]]
            if kind == "(":
                pos[0] += 1
                sub = boosted(parse_group(group_field))
                if sub is not None:
                    emit((sub, occur))
                continue
            if kind == "word" and _re.fullmatch(r"\w+:", val) \
                    and pos[0] + 1 < len(tokens) \
                    and tokens[pos[0] + 1][0] == "(":
                # fielded group `f:(a b)` (QueryParser field grouping):
                # the field applies to every clause of the group
                pos[0] += 2
                sub = boosted(parse_group(val[:-1]))
                if sub is not None:
                    emit((sub, occur))
                continue
            pos[0] += 1
            if kind == ")":
                break
            if group_field is not None and group_field != field:
                # keyword-field group member: raw (unescaped) value term
                if kind == "word":
                    emit((TermQuery(
                        f"{group_field}\x1f{_discard_escapes(val)}",
                        group_field), occur))
                elif kind == "phrase":
                    emit((TermQuery(f"{group_field}\x1f{val[0]}",
                                    group_field), occur))
                continue
            if kind == "range":
                m = _re.fullmatch(
                    r"(?:(\w+):)?([\[\{])\s*([^\s]+)\s+TO\s+([^\s]+)\s*([\]\}])",
                    val)
                f, lb, lo, hi, rb = m.groups()
                if f is None:
                    f = group_field if group_field is not None else field

                def _bound(x: str) -> str:
                    # quoted bounds unquote (QueryParser.jj Range production
                    # RANGE_QUOTED) and escapes discard
                    if len(x) >= 2 and x[0] == '"' and x[-1] == '"':
                        x = x[1:-1]
                    return _discard_escapes(x)

                lo, hi = _bound(lo), _bound(hi)
                try:
                    if f == field:
                        # default-field ranges are TERM ranges (the classic
                        # grammar's getRangeQuery -> TermRangeQuery); only
                        # explicit non-default fields hit doc values
                        raise ValueError
                    lo_v = None if lo == "*" else \
                        int(lo) + (1 if lb == "{" else 0)
                    hi_v = None if hi == "*" else \
                        int(hi) - (1 if rb == "}" else 0)
                    emit((boosted(RangeQuery(f, lo_v, hi_v)), occur))
                except ValueError:
                    # non-numeric bounds: getRangeQuery -> TermRangeQuery
                    # over the term dictionary (keyword fields range over
                    # their namespaced terms)
                    ns = "" if f == field else f"{f}\x1f"
                    emit((boosted(TermRangeQuery(
                        None if lo == "*" else ns + lo.lower(),
                        None if hi == "*" else ns + hi.lower(),
                        include_lower=lb == "[", include_upper=rb == "]",
                        field="text" if f == field else f)), occur))
                continue
            if kind == "fquoted":
                # <field>:"..." composite: extension dispatch first
                # (ExtendableQueryParser.getFieldQuery), else fielded phrase
                if extensions is not None:
                    from .extparser import try_extension

                    eq = try_extension(val, field, extensions)
                    if eq is not None:
                        emit((eq, occur))
                        continue
                raw_f, ptext = val.split(':"', 1)
                ptext = ptext[:-1]
                raw_f = raw_f.replace("\\", "")
                if raw_f and raw_f != field:
                    emit((boosted(TermQuery(f"{raw_f}\x1f{ptext}", raw_f)),
                                  occur))
                    continue
                terms = tuple(analyze(ptext))
                if terms:
                    q = PhraseQuery(terms, field) if len(terms) > 1 \
                        else TermQuery(terms[0], field)
                    emit((boosted(q), occur))
                continue
            if kind == "phrase":
                ptext, slop = val
                slop_i = int(float(slop)) if slop else 0
                if complex_phrases and _re.search(r"[*?~(]", ptext):
                    q = boosted(_complex_phrase_query(ptext, slop_i, field))
                    if q is not None:
                        emit((q, occur))
                    continue
                terms = tuple(analyze(ptext))
                if multi is not None:
                    legs = []
                    for f in multi[0]:
                        if f == "text":
                            if not terms:
                                continue
                            lq = PhraseQuery(terms, "text", slop=slop_i) \
                                if len(terms) > 1 else TermQuery(terms[0],
                                                                 "text")
                        else:
                            lq = TermQuery(f"{f}\x1f{ptext}", f)
                        legs.append(_mf_boost(lq, f, multi[1]))
                    if legs:
                        emit((boosted(_mf_group(legs)), occur))
                    continue
                if not terms:
                    continue
                q = PhraseQuery(terms, field, slop=slop_i) \
                    if len(terms) > 1 else TermQuery(terms[0], field)
                emit((boosted(q), occur))
                continue
            word = val
            if kind == "word" and len(word) >= 2 and word[0] == "/" \
                    and word.endswith("/") and not _escaped_at(word, len(word) - 1):
                # /regexp/ term (classic REGEXPTERM; escaped \/ stays in)
                emit((RegexpQuery(word[1:-1].replace("\\/", "/"), field),
                      occur))
                continue
            if kind == "word" and word == "*:*":
                # the classic grammar's match-all (`*:*`)
                emit((MatchAllDocsQuery(), occur))
                continue
            if kind == "word" and extensions is not None and ":" in word:
                from .extparser import try_extension

                eq = try_extension(word, field, extensions)
                if eq is not None:
                    emit((eq, occur))
                    continue
            f = field
            fm = _re.fullmatch(r"(\w+):(.+)", word)
            if fm and fm.group(1) != field:
                f, v = fm.group(1), fm.group(2)
                if len(v) >= 2 and v[0] == "/" and v.endswith("/") \
                        and not _escaped_at(v, len(v) - 1):
                    # fielded /regexp/: runs over the field's namespaced
                    # dictionary slice
                    emit((RegexpQuery(
                        f"{f}\x1f" + v[1:-1].replace("\\/", "/"), f),
                        occur))
                    continue
                if v == "*":
                    # f:* = any value in the field (testStarParsing:
                    # getWildcardQuery(f, "*"), the FieldExistsQuery
                    # rewrite)
                    emit((boosted(FieldExistsQuery(f)), occur))
                    continue
                # non-default field: keyword-term namespace (StringField);
                # escapes discarded per QueryParserBase.discardEscapeChar
                emit((TermQuery(f"{f}\x1f{_discard_escapes(v)}", f), occur))
                continue
            mlt = multi
            if fm:
                word = fm.group(2)
                mlt = None      # explicitly fielded: single-field dispatch
            boost = 1.0
            bm = _re.fullmatch(r"(.*)\^(\d+(?:\.\d+)?)", word)
            if bm and not _escaped_at(word, len(bm.group(1))):
                word, boost = bm.group(1), float(bm.group(2))
            em = _re.fullmatch(r"(.*)~(\d+(?:\.\d+)?)?", word)
            if em and (em.group(1) == ""
                       or _escaped_at(word, len(em.group(1)))
                       or not word.endswith(("~",) if em.group(2) is None
                                            else (em.group(2),))
                       or "~" not in word):
                em = None       # \~ is a literal tilde, not fuzzy
            if em:
                # bare `term~` = fuzzyMinSim 2.0 -> 2 edits; similarity
                # converts via FuzzyQuery.floatToEdits over the normalized
                # term's length (QueryParserBase.newFuzzyQuery:590-596)
                analyzed = analyze(_discard_escapes(em.group(1)))
                g2 = em.group(2)
                sim = 2.0 if g2 is None else float(g2)
                from .flexible import _float_to_edits

                edits = _float_to_edits(
                    sim, len(analyzed[0]) if analyzed else 0)
                if analyzed:
                    if mlt is not None:
                        legs = [_mf_boost(
                            FuzzyQuery(analyzed[0],
                                       max_edits=edits,
                                       field="text", boost=boost)
                            if f == "text" else
                            FuzzyQuery(f"{f}\x1f{_discard_escapes(em.group(1))}",
                                       max_edits=edits,
                                       prefix_length=len(f) + 1,
                                       field=f, boost=boost),
                            f, mlt[1]) for f in mlt[0]]
                        emit((_mf_group(legs), occur))
                    else:
                        emit((FuzzyQuery(analyzed[0],
                                                   max_edits=edits,
                                                   field=field, boost=boost),
                                        occur))
                continue
            if _has_unescaped(word, "*?"):
                # escaped \* / \? are literals (WildcardQuery.toAutomaton
                # honors them downstream); prefix = one unescaped trailing *
                wl = [i for i, c in enumerate(word)
                      if c in "*?" and not _escaped_at(word, i)]
                is_prefix = (len(wl) == 1 and word[wl[0]] == "*"
                             and wl[0] == len(word) - 1)
                if mlt is not None:
                    legs = []
                    for f in mlt[0]:
                        ns = "" if f == "text" else f"{f}\x1f"
                        lq = PrefixQuery(
                            ns + _discard_escapes(word[:-1]).lower(), f,
                            boost) if is_prefix \
                            else WildcardQuery(ns + word.lower(), f, boost)
                        legs.append(_mf_boost(lq, f, mlt[1]))
                    emit((_mf_group(legs), occur))
                elif is_prefix:
                    emit((PrefixQuery(
                        _discard_escapes(word[:-1]).lower(), field, boost),
                        occur))
                else:
                    emit((WildcardQuery(word.lower(), field, boost), occur))
                continue
            word = _discard_escapes(word)
            if mlt is not None:
                cols = [[TermQuery(t, "text", boost) for t in analyze(word)]
                        if f == "text" else [TermQuery(f"{f}\x1f{word}", f,
                                                       boost)]
                        for f in mlt[0]]
                for i in range(max((len(c) for c in cols), default=0)):
                    legs = [_mf_boost(c[i], f, mlt[1])
                            for f, c in zip(mlt[0], cols) if i < len(c)]
                    if legs:
                        emit((_mf_group(legs), occur))
                continue
            for t in analyze(word):
                emit((TermQuery(t, field, boost), occur))
        if not clauses:
            return None
        if precedence:
            return _combine_precedence(clauses, default_operator)
        if len(clauses) == 1 and clauses[0][1] == SHOULD:
            return clauses[0][0]
        return BooleanQuery(tuple(BooleanClause(q, o) for q, o in clauses))

    q = parse_group()
    if q is None:
        return BooleanQuery(())
    return q


def _combine_precedence(rows, default_operator: str):
    """PrecedenceQueryParser grouping (`queryparser/flexible/precedence/
    processors/BooleanQuery2ModifierNodeProcessor.java` semantics, pinned by
    TestPrecedenceQueryParser.testPrecedence): AND binds tighter than OR;
    juxtaposition separates top-level clauses.  ``rows`` is the raw
    (query, sign, preceding-conjunction) stream of one group."""
    # split into operator chains at juxtaposition boundaries
    chains: list[list] = []
    cur: list = []
    for i, r in enumerate(rows):
        if i > 0 and r[2] is None:
            chains.append(cur)
            cur = []
        cur.append(r)
    chains.append(cur)

    def build_chain(rows):
        # AND-groups inside the chain; OR starts a new group
        groups: list[list] = []
        g: list = []
        for i, r in enumerate(rows):
            if i > 0 and r[2] == "OR":
                groups.append(g)
                g = []
            g.append(r)
        groups.append(g)
        outs = []          # (query, sign) per OR operand
        for g in groups:
            if len(g) == 1:
                q, sign, _ = g[0]
                outs.append((q, sign))
            else:
                cl = tuple(BooleanClause(q, MUST_NOT if sign == "-" else MUST)
                           for q, sign, _ in g)
                outs.append((BooleanQuery(cl), None))
        if len(outs) == 1:
            return outs[0]
        # explicit modifiers survive the OR grouping: the reference's
        # BooleanModifiersQueryNodeProcessor.applyModifier only upgrades
        # MOD_NONE — '+a OR b' keeps a required ('+a b')
        cl = tuple(BooleanClause(q, MUST if sign == "+" else
                                 MUST_NOT if sign == "-" else SHOULD)
                   for q, sign in outs)
        return (BooleanQuery(cl), None)

    built = [build_chain(c) for c in chains]
    if len(built) == 1:
        q, sign = built[0]
        if sign == "+":
            return BooleanQuery((BooleanClause(q, MUST),))
        if sign == "-":
            return BooleanQuery((BooleanClause(q, MUST_NOT),))
        return q
    cl = []
    for q, sign in built:
        if sign == "+":
            occ = MUST
        elif sign == "-":
            occ = MUST_NOT
        else:
            occ = MUST if default_operator == "AND" else SHOULD
        cl.append(BooleanClause(q, occ))
    return BooleanQuery(tuple(cl))


def parse_precedence(text: str, field: str = "text",
                     default_operator: str = "OR"):
    """PrecedenceQueryParser (`queryparser/flexible/precedence/
    PrecedenceQueryParser.java`): the classic grammar with true operator
    precedence — AND binds tighter than OR, and plain juxtaposition keeps
    the default-operator semantics — instead of the classic addClause
    flip."""
    return _parse_classic(text, field, False,
                          default_operator=default_operator,
                          precedence=True)


class SurroundParseError(ValueError):
    """Raised for syntax the surround dialect (or this subset) rejects."""


def parse_surround(text: str, field: str = "text"):
    """Surround-QueryParser dialect (`queryparser/surround/parser/
    QueryParser.jj`): span-proximity operators over the boolean algebra,
    case-insensitive, both infix and prefix forms.

        a W b        -> ordered, adjacent          a N b   -> unordered
        a 3W b       -> ordered within distance 3 (SpanNear slop = 2)
        3W(a, b, c)  -> prefix form, 2-99
        a AND b / AND(a, b), OR, NOT    (NOT is infix-only, binary)
        pre*         -> prefix, te?m -> wildcard (boolean positions only)
        role:user    -> keyword-field term        ( ... )  -> grouping

    Precedence (loosest to tightest): OR, AND, NOT, N, W — as in the
    reference grammar.  Distance ops compile to IntervalQuery with
    max_width = n_terms + distance - 1 (the SpanNearQuery slop = distance-1
    rewrite in `surround/query/DistanceQuery.java:70-90`).  Subset: distance
    operands must be plain single terms — the reference allows nested spans
    (`(aa or bb) w cc`); here that raises SurroundParseError (documented
    divergence), as does mixing W/N in one chain."""
    import re as _re

    from ..analysis.standard import analyze

    tok_pat = _re.compile(
        r"""(?P<lp>\()|(?P<rp>\))|(?P<comma>,)
          |(?P<dist>\d{1,2}[wWnN])(?=[\s(])
          |(?P<word>[^\s(),]+)""", _re.VERBOSE)
    tokens = []
    for m in tok_pat.finditer(text):
        if m.group("lp"):
            tokens.append(("(", None))
        elif m.group("rp"):
            tokens.append((")", None))
        elif m.group("comma"):
            tokens.append((",", None))
        elif m.group("dist"):
            d = m.group("dist")
            tokens.append(("distop", (int(d[:-1]), d[-1].lower() == "w")))
        else:
            w = m.group("word")
            u = w.upper()
            if u in ("AND", "OR", "NOT"):
                tokens.append((u, None))
            elif u in ("W", "N"):
                tokens.append(("distop", (1, u == "W")))
            else:
                tokens.append(("word", w))
    pos = [0]

    def peek():
        return tokens[pos[0]] if pos[0] < len(tokens) else (None, None)

    def expect(kind):
        k, v = peek()
        if k != kind:
            raise SurroundParseError(f"expected {kind!r}, got {k!r} in {text!r}")
        pos[0] += 1
        return v

    def term_of(q):
        if isinstance(q, TermQuery) and "\x1f" not in q.term:
            return q.term
        return None

    def _iv_source(q):
        """Distance operand -> intervals source: term / prefix / wildcard /
        OR-of-those (the reference's SrndTruncQuery + OrQuery operands,
        `surround/query/DistanceQuery.java` getSpanQuery over sub-spans)."""
        from . import intervals as iv

        if isinstance(q, TermQuery) and "\x1f" not in q.term:
            return iv.term(q.term)
        if isinstance(q, PrefixQuery) and "\x1f" not in q.prefix:
            return iv.prefix(q.prefix)
        if isinstance(q, WildcardQuery) and "\x1f" not in q.pattern:
            return iv.wildcard(q.pattern)
        if isinstance(q, BooleanQuery) and q.clauses and \
                all(c.occur == SHOULD for c in q.clauses):
            return iv.or_(*[_iv_source(c.query) for c in q.clauses])
        if isinstance(q, IntervalQuery):
            comb = (iv.ordered if q.ordered else iv.unordered)(
                *[iv.term(t) for t in q.terms])
            # equivalent gap form for term leaves: width n+d-1 == d-1 gaps
            return iv.maxgaps(q.max_width - len(q.terms), comb)
        from .intervals import IntervalsSourceQuery as _ISQ

        if isinstance(q, _ISQ):
            return q.source
        raise SurroundParseError(
            f"unsupported distance operand {type(q).__name__}")

    def mk_distance(operands, dist, ordered):
        terms = tuple(term_of(q) for q in operands)
        if all(t is not None for t in terms):
            return IntervalQuery(terms, max_width=len(terms) + dist - 1,
                                 ordered=ordered, field=field)
        from . import intervals as iv
        from .intervals import IntervalsSourceQuery

        subs = [_iv_source(q) for q in operands]
        comb = iv.ordered(*subs) if ordered else iv.unordered(*subs)
        # SpanNear slop semantics: <= dist-1 GAP positions between the
        # operand spans (DistanceQuery opDistance -> slop = d-1), which
        # maxgaps expresses for variable-width operands where a width
        # bound cannot
        return IntervalsSourceQuery(iv.maxgaps(dist - 1, comb),
                                    field=field)

    def prefix_args(parse_fn):
        expect("(")
        args = [parse_fn()]
        while peek()[0] == ",":
            pos[0] += 1
            args.append(parse_fn())
        expect(")")
        if len(args) < 2:
            # FieldsQueryList is `q ("," q)+` — one operand is a
            # ParseException in the reference grammar
            raise SurroundParseError("prefix operator needs >= 2 operands")
        return args

    def parse_primary():
        k, v = peek()
        if k == "(":
            pos[0] += 1
            q = parse_or()
            expect(")")
            return q
        if k == "distop" and pos[0] + 1 < len(tokens) \
                and tokens[pos[0] + 1][0] == "(":
            pos[0] += 1
            dist, ordered = v
            return mk_distance(prefix_args(parse_primary), dist, ordered)
        if k in ("AND", "OR") and pos[0] + 1 < len(tokens) \
                and tokens[pos[0] + 1][0] == "(":
            pos[0] += 1
            occ = MUST if k == "AND" else SHOULD
            args = prefix_args(parse_or)
            return BooleanQuery(tuple(BooleanClause(q, occ) for q in args))
        if k != "word":
            raise SurroundParseError(f"unexpected {k!r} in {text!r}")
        pos[0] += 1
        word = v
        fm = _re.fullmatch(r"(\w+):(.+)", word)
        if fm and fm.group(1) != field:
            return TermQuery(f"{fm.group(1)}\x1f{fm.group(2)}", fm.group(1))
        if fm:
            word = fm.group(2)
        if "*" in word or "?" in word:
            # "Too unrestrictive truncation": a prefix needs >= 3 prefix
            # chars (allowedSuffix), a truncated term >= 3 normal chars
            # (allowedTruncation) — QueryParser.jj:78-179
            if word.endswith("*") and "*" not in word[:-1] and "?" not in word:
                if len(word) - 1 < 3:
                    raise SurroundParseError(
                        f"Too unrestrictive truncation: {word!r}")
                return PrefixQuery(word[:-1].lower(), field)
            if sum(1 for c in word if c not in "*?") < 3:
                raise SurroundParseError(
                    f"Too unrestrictive truncation: {word!r}")
            return WildcardQuery(word.lower(), field)
        analyzed = analyze(word)
        if not analyzed:
            raise SurroundParseError(f"term {word!r} analyzes to nothing")
        return TermQuery(analyzed[0], field)

    def parse_w():
        # WQuery: Primary (<W> Primary)* — LEFT-ASSOCIATIVE binary nesting
        # (QueryParser.jj:357-373: a new DistanceQuery per operator)
        q = parse_primary()
        while peek()[0] == "distop" and peek()[1][1]:
            d, _ = peek()[1]
            pos[0] += 1
            q = mk_distance([q, parse_primary()], d, True)
        return q

    def parse_dist():
        # NQuery: WQuery (<N> WQuery)* — W binds tighter than N
        q = parse_w()
        while peek()[0] == "distop" and not peek()[1][1]:
            d, _ = peek()[1]
            pos[0] += 1
            q = mk_distance([q, parse_w()], d, False)
        return q

    def parse_not():
        q = parse_dist()
        clauses = None
        while peek()[0] == "NOT":
            pos[0] += 1
            if clauses is None:
                clauses = [BooleanClause(q, MUST)]
            clauses.append(BooleanClause(parse_dist(), MUST_NOT))
        return q if clauses is None else BooleanQuery(tuple(clauses))

    def parse_and():
        q = parse_not()
        clauses = None
        while peek()[0] == "AND":
            pos[0] += 1
            if clauses is None:
                clauses = [BooleanClause(q, MUST)]
            clauses.append(BooleanClause(parse_not(), MUST))
        return q if clauses is None else BooleanQuery(tuple(clauses))

    def parse_or():
        q = parse_and()
        clauses = None
        while peek()[0] == "OR":
            pos[0] += 1
            if clauses is None:
                clauses = [BooleanClause(q, SHOULD)]
            clauses.append(BooleanClause(parse_and(), SHOULD))
        return q if clauses is None else BooleanQuery(tuple(clauses))

    if not tokens:
        raise SurroundParseError("empty query")
    q = parse_or()
    if pos[0] != len(tokens):
        raise SurroundParseError(f"trailing input at token {pos[0]} in {text!r}")
    return q


@dataclass(frozen=True)
class NGramPhraseQuery:
    """Phrase over an n-gram analyzed stream (`search/NGramPhraseQuery.java`):
    for exact (slop=0) consecutive phrases of >= 3 grams with n >= 2, the
    rewrite keeps only every n-th gram plus the last, each pinned at its
    original position — equivalent on n-gram token streams (the retained
    grams overlap-cover the whole string) and ~n times cheaper.  When not
    optimizable it degrades to the wrapped PhraseQuery."""
    n: int
    phrase: PhraseQuery

    def rewrite(self):
        """Returns either the plain PhraseQuery or (terms, positions)."""
        terms = self.phrase.terms
        if self.phrase.slop != 0 or self.n < 2 or len(terms) < 3:
            return self.phrase
        keep = [i for i in range(len(terms))
                if i % self.n == 0 or i == len(terms) - 1]
        return tuple(terms[i] for i in keep), tuple(keep)


def facet_query(dimension: str, *path: str) -> TermQuery:
    """FacetQuery (`facet/FacetQuery.java:28-46`): filter docs carrying the
    given facet dimension + path — a TermQuery over the drill-down term
    ``FacetsConfig.pathToString`` produces (dim and path components joined
    by the same \\x1f separator our keyword namespaces use)."""
    key = "\x1f".join((dimension,) + tuple(path))
    return TermQuery(key)


def multi_facet_query(dimension: str, *paths) -> TermInSetQuery:
    """MultiFacetQuery (`facet/MultiFacetQuery.java:30-55`): docs carrying
    ANY of the given paths under one dimension — a TermInSetQuery over the
    drill-down terms (constant-score union, like the reference's
    TermInSetQuery base)."""
    keys = tuple(
        "\x1f".join((dimension,) + ((p,) if isinstance(p, str)
                                    else tuple(p)))
        for p in paths)
    return TermInSetQuery(keys)


# ---------------------------------------------------------------------------
# Query.toString twin
# ---------------------------------------------------------------------------

def _fmt_float(x: float) -> str:
    """Java Float.toString for the common range (2.0 -> "2.0")."""
    s = repr(float(x))
    return s


def query_to_string(q, field: str = "text") -> str:
    """`Query.toString(String field)` twin over the AST — the reference's
    canonical debug rendering (BooleanQuery.java toString occur prefixes +
    sub-bool parens + ~msm; BoostQuery "(q)^b"; PhraseQuery quotes + ~slop;
    FuzzyQuery ~maxEdits; TermRangeQuery bracket forms).  Queries whose
    intrinsic ``boost`` differs from 1 render through the BoostQuery form,
    matching the parser's BoostQuery wrapping in the reference."""
    import dataclasses as _dc

    b = getattr(q, "boost", 1.0)
    if b != 1.0 and not isinstance(q, (BoostQuery, ConstantScoreQuery)):
        plain = _dc.replace(q, boost=1.0)
        return f"({query_to_string(plain, field)})^{_fmt_float(b)}"

    def fld(f: str, term: str) -> tuple[str, str]:
        # keyword-namespace terms print as field:value
        if "\x1f" in term:
            f2, v = term.split("\x1f", 1)
            return f2, v
        return f, term

    if isinstance(q, BoostQuery):
        return f"({query_to_string(q.query, field)})^{_fmt_float(q.boost)}"
    if isinstance(q, ConstantScoreQuery):
        base = f"ConstantScore({query_to_string(q.query, field)})"
        if q.boost != 1.0:
            return f"({base})^{_fmt_float(q.boost)}"
        return base
    if isinstance(q, TermQuery):
        f, v = fld(q.field, q.term)
        return v if f == field else f"{f}:{v}"
    if isinstance(q, PhraseQuery):
        body = '"' + " ".join(q.terms) + '"'
        if q.slop:
            body += f"~{q.slop}"
        return body if q.field == field else f"{q.field}:{body}"
    if isinstance(q, PrefixQuery):
        f, v = fld(q.field, q.prefix)
        body = v + "*"
        return body if f == field else f"{f}:{body}"
    if isinstance(q, WildcardQuery):
        f, v = fld(q.field, q.pattern)
        return v if f == field else f"{f}:{v}"
    if isinstance(q, RegexpQuery):
        f, v = fld(q.field, q.regexp)
        body = f"/{v}/"
        return body if f == field else f"{f}:{body}"
    if isinstance(q, FuzzyQuery):
        f, v = fld(q.field, q.term)
        body = f"{v}~{q.max_edits}"
        return body if f == field else f"{f}:{body}"
    if isinstance(q, TermRangeQuery):
        def side(x, ns_strip=True):
            if x is None:
                return "*"
            return x.split("\x1f", 1)[-1]
        lb = "[" if q.include_lower else "{"
        rb = "]" if q.include_upper else "}"
        body = f"{lb}{side(q.lower)} TO {side(q.upper)}{rb}"
        return body if q.field == field else f"{q.field}:{body}"
    if isinstance(q, RangeQuery):
        body = (f"[{'*' if q.lo is None else q.lo} TO "
                f"{'*' if q.hi is None else q.hi}]")
        return body if q.field == field else f"{q.field}:{body}"
    if isinstance(q, MatchAllDocsQuery):
        return "*:*"
    if isinstance(q, MatchNoDocsQuery):
        return 'MatchNoDocsQuery("")'
    if isinstance(q, BooleanQuery):
        occ = {SHOULD: "", MUST: "+", MUST_NOT: "-", FILTER: "#"}
        parts = []
        for c in q.clauses:
            s = query_to_string(c.query, field)
            if isinstance(c.query, BooleanQuery):
                s = f"({s})"
            parts.append(occ[c.occur] + s)
        out = " ".join(parts)
        if q.minimum_should_match > 0:
            out = f"({out})~{q.minimum_should_match}"
        return out
    if isinstance(q, FieldExistsQuery):
        # rendered as the classic grammar form that parses back to it
        return f"{q.field}:*"
    if isinstance(q, DisjunctionMaxQuery):
        inner = " | ".join(query_to_string(s, field) for s in q.queries)
        return f"({inner})~{_fmt_float(q.tie_breaker)}"
    if isinstance(q, SynonymQuery):
        inner = " ".join(
            (f"{field}:{t}" if b == 1.0 else
             f"{field}:{t}^{_fmt_float(b)}")
            for t, b in zip(q.terms, q.boosts or (1.0,) * len(q.terms)))
        return f"Synonym({inner})"
    if isinstance(q, TermInSetQuery):
        f2 = q.field
        vals = " ".join(t.split("\x1f", 1)[-1] for t in q.terms)
        return f"{f2}:({vals})"
    if isinstance(q, MultiPhraseQuery):
        offs = list(q.positions) if q.positions else list(range(len(q.slots)))
        parts = []
        last = -1
        for off, slot in zip(offs, q.slots):
            parts.extend(["?"] * (off - last - 1))   # position gaps
            parts.append(slot[0] if len(slot) == 1
                         else "(" + " ".join(slot) + ")")
            last = off
        body = '"' + " ".join(parts) + '"'
        if q.slop:
            body += f"~{q.slop}"
        return body if q.field == field else f"{q.field}:{body}"
    return repr(q)
