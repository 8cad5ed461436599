"""Monitor query-analysis layer: QueryTree / TermWeightor / QueryDecomposer /
multipass presearching + matcher variants.

Re-expresses the reference monitor module's query-side machinery
(`monitor/QueryTree.java:17-290`, `monitor/TermWeightor.java:17-140`,
`monitor/QueryAnalyzer.java:17-150`, `monitor/QueryDecomposer.java:17-120`,
`monitor/MultipassTermFilteredPresearcher.java:17-180`,
`monitor/RegexpQueryHandler.java:17-150`) on this repo's query AST:

* a query is analyzed into a tree of conjunction / disjunction / term / ANY
  nodes; a *conjunction* only needs its single most highly weighted child's
  terms to prescreen soundly, a *disjunction* needs every child's;
* `advance_phase` walks to the next-most-weighted path, so indexing a query
  k times (the multipass presearcher) collects k different sufficient term
  sets — a document must hit ALL k sets to become a candidate, which filters
  out e.g. docs containing only one half of a two-term phrase;
* `QueryDecomposer` splits top-level disjunctions so each branch is
  presearched (and verified) independently, with matches reported under the
  parent query id;
* `RegexpQueryHandler` prescreens RegexpQuery by its longest static
  substring.  The reference indexes every document-token ngram under a
  suffixed field (`SuffixingNGramTokenFilter`); generating all ngrams per
  streamed token is O(len^2) per token at 100 TB, so the document side here
  tests "any token CONTAINS the substring" directly with one vectorized
  `pyarrow.compute.match_substring` per trigger — the exact same acceptance
  set, without materializing ngrams (divergence documented, parity tested in
  tests/test_querytree.py).

The match stage itself stays the AstMonitor shape (percolate.py): compile
once, broadcast via the task closure, vectorized presearch inside
`map_batches`, exact verification of candidates against a per-doc
MemoryIndex.
"""

from __future__ import annotations

import math
import time

import numpy as np
import pyarrow as pa

ANYTOKEN_FIELD = "__anytokenfield"
ANYTOKEN = "__ANYTOKEN__"

# ---------------------------------------------------------------------------
# TermWeightor (`monitor/TermWeightor.java`) — a weightor maps a
# (field, term-text) pair to a float; higher = better trigger.
# ---------------------------------------------------------------------------


def length_weightor(a: float = 3.0, k: float = 0.3):
    """``w = 4 - a * e^(-k * byte_length)`` with lengths clamped to 31
    (`TermWeightor.java:118-134` lengthWeightor — longer terms weigh more;
    the reference precomputes float32 norms, mirrored here)."""
    norms = [np.float32(a * math.exp(-k * i)) for i in range(32)]

    def w(term):
        n = len(term[1].encode("utf-8"))
        return 4.0 - float(norms[min(n, 31)])

    return w


DEFAULT_WEIGHTOR = length_weightor(3.0, 0.3)


def combine_weightors(*weightors):
    """Multiplicative combination (`TermWeightor.java:35-44`)."""
    def w(term):
        r = 1.0
        for sub in weightors:
            r *= sub(term)
        return r

    return w


def field_weightor(weight: float, *fields: str):
    """Terms in the given fields get `weight`, others 1
    (`TermWeightor.java:46-60`)."""
    fs = set(fields)
    return lambda term: weight if term[0] in fs else 1.0


def term_weightor(weight: float, *texts: str):
    """Terms with the given text get `weight` (`TermWeightor.java:62-74`)."""
    ts = set(texts)
    return lambda term: weight if term[1] in ts else 1.0


def term_and_field_weightor(weight: float, *terms):
    """Exact (field, text) matches get `weight` (`TermWeightor.java:76-92`)."""
    ts = set(terms)
    return lambda term: weight if term in ts else 1.0


def term_freq_weightor(frequencies: dict, n: float, k: float):
    """``w = n / freq + k`` for known terms, 1 otherwise
    (`TermWeightor.java:94-116` — rarer terms weigh more)."""
    def w(term):
        f = frequencies.get(term[1])
        return (n / f) + k if f is not None else 1.0

    return w


# ---------------------------------------------------------------------------
# QueryTree (`monitor/QueryTree.java`)
# ---------------------------------------------------------------------------


class QueryTree:
    """A node in the analyzed query tree.  `collect_terms` gathers the terms
    of the currently-selected (most highly weighted) sufficient path;
    `advance_phase` moves to the next-most-weighted path."""

    def weight(self) -> float:
        raise NotImplementedError

    def collect_terms(self, collector) -> None:
        raise NotImplementedError

    def advance_phase(self, min_weight: float) -> bool:
        raise NotImplementedError


class TermNode(QueryTree):
    def __init__(self, field: str, text: str, weight: float):
        if weight <= 0:
            raise ValueError("Term weights must be greater than 0")
        self.field, self.text, self._weight = field, text, weight

    def weight(self):
        return self._weight

    def collect_terms(self, collector):
        collector(self.field, self.text)

    def advance_phase(self, min_weight):
        return False

    def __repr__(self):
        return f"{self.field}:{self.text}^{self._weight}"


class AnyNode(QueryTree):
    """Matches any document (`QueryTree.java:123-147` anyTerm): collected as
    the reserved ANYTOKEN so the presearcher makes the query a candidate for
    every document."""

    def __init__(self, reason: str):
        self.reason = reason

    def weight(self):
        return 0.0

    def collect_terms(self, collector):
        collector(ANYTOKEN_FIELD, ANYTOKEN)

    def advance_phase(self, min_weight):
        return False

    def __repr__(self):
        return f"ANY[{self.reason}]"


class ConjunctionNode(QueryTree):
    """Weight/terms of the highest-weighted child only; `advance_phase`
    first advances within that child, then drops it for the runner-up
    (`QueryTree.java:180-232` ConjunctionQueryTree)."""

    def __init__(self, children):
        self.children = sorted(children, key=lambda c: -c.weight())

    def weight(self):
        return self.children[0].weight()

    def collect_terms(self, collector):
        self.children[0].collect_terms(collector)

    def advance_phase(self, min_weight):
        if self.children[0].advance_phase(min_weight):
            self.children.sort(key=lambda c: -c.weight())
            return True
        if len(self.children) == 1:
            return False
        if self.children[1].weight() <= min_weight:
            return False
        self.children.pop(0)
        return True

    def __repr__(self):
        return f"Conjunction{self.children!r}"


class DisjunctionNode(QueryTree):
    """Weight = the LOWEST child (a disjunction is only as selective as its
    weakest branch); terms = union of all children
    (`QueryTree.java:234-290` DisjunctionQueryTree)."""

    def __init__(self, children):
        self.children = sorted(children, key=lambda c: c.weight())

    def weight(self):
        return self.children[0].weight()

    def collect_terms(self, collector):
        for c in self.children:
            c.collect_terms(collector)

    def advance_phase(self, min_weight):
        changed = False
        for c in self.children:
            changed |= c.advance_phase(min_weight)
        if not changed:
            return False
        self.children.sort(key=lambda c: c.weight())
        return True

    def __repr__(self):
        return f"Disjunction{self.children!r}"


def conjunction(children) -> QueryTree:
    """`QueryTree.java:149-166`: single child passes through; all-ANY
    collapses to the first child."""
    children = list(children)
    if not children:
        raise ValueError("Cannot build a conjunction with no children")
    if len(children) == 1:
        return children[0]
    if all(c.weight() <= 0 for c in children):
        return children[0]
    return ConjunctionNode(children)


def disjunction(children) -> QueryTree:
    """`QueryTree.java:168-178`: any ANY child makes the whole disjunction
    ANY."""
    children = list(children)
    if not children:
        raise ValueError("Cannot build a disjunction with no children")
    if len(children) == 1:
        return children[0]
    for c in children:
        if c.weight() == 0:
            return c
    return DisjunctionNode(children)


# ---------------------------------------------------------------------------
# QueryAnalyzer (`monitor/QueryAnalyzer.java`) over this repo's AST
# ---------------------------------------------------------------------------


def build_query_tree(q, weightor=DEFAULT_WEIGHTOR, handlers=()) -> QueryTree:
    """Analyze a query AST into a QueryTree, mirroring the reference's
    QueryVisitor flow (`QueryAnalyzer.java:70-150`): MUST/FILTER clauses
    become conjunction children, SHOULD clauses a disjunction (ignored when
    required clauses exist), MUST_NOT is invisible (pure-negative queries
    become ANY), and unknown leaves go through the custom `handlers` before
    falling back to ANY."""
    from ..search.query import (
        FILTER,
        MUST,
        SHOULD,
        BooleanQuery,
        BoostQuery,
        ConstantScoreQuery,
        DisjunctionMaxQuery,
        IntervalQuery,
        MultiPhraseQuery,
        PhraseQuery,
        SynonymQuery,
        TermInSetQuery,
        TermQuery,
    )

    def term(field, text):
        return TermNode(field, text, weightor((field, text)))

    def visit(q) -> QueryTree:
        if isinstance(q, TermQuery):
            return term(q.field, q.term)
        if isinstance(q, (PhraseQuery, IntervalQuery)):
            # every term is required: conjunction of leaves
            field = getattr(q, "field", "text")
            return conjunction([term(field, t) for t in q.terms])
        if isinstance(q, MultiPhraseQuery):
            # each slot is required, any of its terms satisfies it
            return conjunction(
                [disjunction([term("text", t) for t in slot])
                 for slot in q.slots])
        if isinstance(q, (SynonymQuery, TermInSetQuery)):
            field = getattr(q, "field", "text")
            return disjunction([term(field, t) for t in q.terms])
        if isinstance(q, DisjunctionMaxQuery):
            return disjunction([visit(sub) for sub in q.queries])
        if isinstance(q, (BoostQuery, ConstantScoreQuery)):
            return visit(q.query)
        if isinstance(q, BooleanQuery):
            required = [c.query for c in q.clauses
                        if c.occur in (MUST, FILTER)]
            shoulds = [c.query for c in q.clauses if c.occur == SHOULD]
            if not required and not shoulds:
                # pure negative query (`QueryAnalyzer.java:83-93`)
                return AnyNode(f"PURE NEGATIVE QUERY[{q}]")
            children = [visit(c) for c in required]
            if shoulds and not required:
                children.append(disjunction([visit(c) for c in shoulds]))
            return conjunction(children)
        for h in handlers:
            t = h.handle_query(q, weightor)
            if t is not None:
                return t
        return AnyNode(repr(q))

    return visit(q)


# ---------------------------------------------------------------------------
# QueryDecomposer (`monitor/QueryDecomposer.java`)
# ---------------------------------------------------------------------------


class QueryDecomposer:
    """Split top-level disjunctions into separately indexed/verified
    subqueries (matches report the parent query id).  Delegates to the
    canonical `percolate.decompose` (same `monitor/QueryDecomposer.java`
    semantics; boosts fold into parts' intrinsic boost fields where the
    AST carries one)."""

    def decompose(self, q) -> list:
        from .percolate import decompose as _decompose

        return sorted(_decompose(q), key=repr)


# ---------------------------------------------------------------------------
# RegexpQueryHandler (`monitor/RegexpQueryHandler.java`)
# ---------------------------------------------------------------------------


class SubstringNode(QueryTree):
    """Trigger leaf produced by RegexpQueryHandler: the query is a candidate
    when some document token CONTAINS `substring` (the reference's
    ngram-suffixed term), or when the document holds a token longer than the
    ngram cutoff (the reference's __WILDCARD__ token)."""

    def __init__(self, field: str, substring: str, weight: float,
                 anchored: bool = False):
        self.field, self.substring, self._weight = field, substring, weight
        self.anchored = anchored        # True: prefix (starts_with) trigger

    def weight(self):
        return self._weight

    def collect_terms(self, collector):
        collector(self.field, ("__substr__", self.substring, self.anchored))

    def advance_phase(self, min_weight):
        return False

    def __repr__(self):
        return f"WILDCARD_NGRAM[{self.field}:{self.substring}]^{self._weight}"


class RegexpQueryHandler:
    """Prescreen RegexpQuery by its longest static substring
    (`RegexpQueryHandler.java:94-150`): split on regex operators, keep the
    longest literal run."""

    DEFAULT_NGRAM_SUFFIX = "XX"
    DEFAULT_MAX_TOKEN_SIZE = 30
    DEFAULT_WILDCARD_TOKEN = "__WILDCARD__"

    def __init__(self, ngram_suffix: str = DEFAULT_NGRAM_SUFFIX,
                 max_token_size: int = DEFAULT_MAX_TOKEN_SIZE,
                 wildcard_token: str = DEFAULT_WILDCARD_TOKEN,
                 excluded_fields=()):
        self.ngram_suffix = ngram_suffix
        self.max_token_size = max_token_size
        self.wildcard_token = wildcard_token
        self.excluded_fields = set(excluded_fields)

    @staticmethod
    def select_longest_substring(regexp: str) -> str:
        """`RegexpQueryHandler.java:141-149`: split on `.`/`*`/`<char>?` and
        keep the longest literal."""
        import re

        selected = ""
        for sub in re.split(r"\.|\*|.\?", regexp):
            if len(sub) > len(selected):
                selected = sub
        return selected

    def handle_query(self, q, weightor):
        from ..search.query import RegexpQuery

        if not isinstance(q, RegexpQuery):
            return None
        if q.field in self.excluded_fields:
            return AnyNode(f"excluded field[{q.field}]")
        import re as _re

        if _re.search(r'[|&<>{}\[\]()@#"\\+]', q.regexp):
            # Lucene-dialect operators beyond the reference splitter's
            # simple subset (unions, intersections, intervals, classes,
            # quoted strings): no substring is provably REQUIRED, so the
            # query must stay unscreenable — a wrong "literal" here would
            # be a percolator false negative.  (Defensive divergence: the
            # reference RegexpQueryHandler is documented for simple
            # regexes only and would mis-trigger on these.)
            return AnyNode(repr(q))
        selected = self.select_longest_substring(q.regexp)
        if not selected:
            return AnyNode(repr(q))
        w = weightor((q.field, selected + self.ngram_suffix))
        return SubstringNode(q.field, selected, w)


class PrefixQueryHandler:
    """Prescreen Prefix / Wildcard / Fuzzy(prefix_length>0) queries by their
    literal prefix — this repo's extension mirroring the AstMonitor prefix
    triggers (a prefix is a substring anchored at token start; matched with
    `pyarrow.compute.starts_with`)."""

    def handle_query(self, q, weightor):
        from ..search.query import FuzzyQuery, PrefixQuery, WildcardQuery

        if isinstance(q, PrefixQuery) and q.prefix:
            lit = q.prefix
        elif isinstance(q, WildcardQuery):
            lit = q.pattern.split("*")[0].split("?")[0]
            if not lit:
                return None
        elif isinstance(q, FuzzyQuery) and q.prefix_length > 0:
            lit = q.term[:q.prefix_length]
        else:
            return None
        field = getattr(q, "field", "text")
        return SubstringNode(field, lit, weightor((field, lit)),
                             anchored=True)


def suffixing_ngrams(token: str, suffix: str = "XX",
                     wildcard_token: str = "__WILDCARD__",
                     max_token_length: int = 30) -> list[str]:
    """Document-side ngram expansion (`SuffixingNGramTokenFilter.java:70-140`)
    — the original token, then every distinct substring + suffix; tokens over
    `max_token_length` yield only the wildcard token.  Used for parity tests;
    the streaming matcher tests substring containment directly instead of
    materializing the O(len^2) grams."""
    out = [token]
    if len(token) > max_token_length:
        out.append(wildcard_token)
        return out
    seen = set()
    for pos in range(len(token)):
        for size in range(len(token) - pos, 0, -1):
            g = token[pos:pos + size] + suffix
            if g not in seen:
                seen.add(g)
                out.append(g)
    return out


# ---------------------------------------------------------------------------
# TreeMonitor: multipass presearch + MemoryIndex verify + matcher variants
# ---------------------------------------------------------------------------


class TreeMonitor:
    """Monitor whose presearcher runs on analyzed QueryTrees
    (`MultipassTermFilteredPresearcher.java` + `Monitor.java:230-254`):

    * each registered query is decomposed (QueryDecomposer) into subquery
      *units*; a unit matching reports the parent query id;
    * each unit's tree is walked `passes` times, collecting a sufficient
      trigger-term set per pass and then `advance_phase(min_weight)`-ing to
      the next path (duplicate pass sets are folded — hitting one hits all);
    * a document is a candidate for a unit only if its token set intersects
      EVERY pass set (ANYTOKEN passes auto-hit; substring triggers from
      Regexp/Prefix handlers match via vectorized contains / starts_with);
    * candidates are verified exactly against a per-doc MemoryIndex.

    State is built once (driver side, query sets are small) and broadcast
    via the map_batches task closure — the actor-pool stage pattern for
    streaming percolation."""

    def __init__(self, registered, passes: int = 1, min_weight: float = 0.0,
                 weightor=DEFAULT_WEIGHTOR, handlers=(), decompose=True,
                 slow_log_limit_s: float | None = None):
        self.query_ids = np.array([qid for qid, _ in registered], dtype=object)
        self.queries = [q for _, q in registered]
        self.passes = passes
        dec = QueryDecomposer()
        # units: (parent query index, subquery)
        self.units = []
        for qi, q in enumerate(self.queries):
            for sub in (dec.decompose(q) if decompose else [q]):
                self.units.append((qi, sub))
        # per unit: list of distinct pass term-sets; each set is a list of
        # trigger entries — ("term", text) | ("substr", lit, anchored) |
        # ("any",)
        self.unit_passes: list[list[list[tuple]]] = []
        for _, sub in self.units:
            tree = build_query_tree(sub, weightor, handlers)
            seen, passsets = set(), []
            for _ in range(passes):
                entries = []

                def collect(field, text):
                    if field == ANYTOKEN_FIELD:
                        entries.append(("any",))
                    elif isinstance(text, tuple):  # ("__substr__", lit, anch)
                        entries.append(("substr", text[1], text[2]))
                    else:
                        entries.append(("term", text))

                tree.collect_terms(collect)
                key = frozenset(entries)
                if key not in seen:
                    seen.add(key)
                    passsets.append(entries)
                tree.advance_phase(min_weight)
            self.unit_passes.append(passsets)
        self._compile()
        self.slow_log_limit_s = slow_log_limit_s
        self.slow_log: dict[str, float] = {}

    def _compile(self):
        """Flatten pass sets into the vectorized trigger tables."""
        # exact-term trigger rows: term -> (unit, pass)
        trig_term, trig_unit, trig_pass = [], [], []
        # substring rows evaluated per batch: (unit, pass, lit, anchored)
        self.substr_triggers: list[tuple[int, int, str, bool]] = []
        self.n_pass = np.zeros(len(self.units), dtype=np.int64)
        always_units = []
        for ui, passsets in enumerate(self.unit_passes):
            live = []
            for entries in passsets:
                if any(e[0] == "any" for e in entries):
                    continue        # auto-hit pass: no constraint
                live.append(entries)
            self.n_pass[ui] = len(live)
            if not live:
                always_units.append(ui)
                continue
            for pi, entries in enumerate(live):
                for e in entries:
                    if e[0] == "term":
                        trig_term.append(e[1])
                        trig_unit.append(ui)
                        trig_pass.append(pi)
                    else:
                        self.substr_triggers.append((ui, pi, e[1], e[2]))
        self.always_units = np.array(always_units, dtype=np.int64)
        vocab = sorted(set(trig_term))
        self.vocab = np.array(vocab, dtype=object)
        self.vocab_arr = pa.array(vocab, type=pa.string())
        tid = {t: i for i, t in enumerate(vocab)}
        tt = np.array([tid[t] for t in trig_term], dtype=np.int64)
        tu = np.array(trig_unit, dtype=np.int64)
        tp = np.array(trig_pass, dtype=np.int64)
        order = np.argsort(tt, kind="stable")
        self.trig_t, self.trig_u, self.trig_p = tt[order], tu[order], tp[order]

    # -- matching ----------------------------------------------------------

    def _candidates(self, doc_idx, flat_arr, lens):
        """(doc, unit) candidate pairs for one tokenized batch: a unit is a
        candidate iff every live pass has ≥1 trigger hit in the doc."""
        import pyarrow.compute as pc

        n_docs = len(lens)
        U = len(self.units)
        maxp = int(self.n_pass.max()) if len(self.n_pass) else 0
        hits = []                           # (doc*U + unit)*maxP + pass keys
        V = len(self.vocab)
        if V and len(flat_arr):
            idx = pc.index_in(flat_arr, value_set=self.vocab_arr)
            code = idx.fill_null(-1).to_numpy(zero_copy_only=False).astype(
                np.int64)
            valid = code >= 0
            present = np.unique(doc_idx[valid] * V + code[valid])
            p_doc, p_term = present // V, present % V
            lo = np.searchsorted(self.trig_t, p_term, side="left")
            hi = np.searchsorted(self.trig_t, p_term, side="right")
            reps = hi - lo
            hit = reps > 0
            if hit.any():
                h_doc = np.repeat(p_doc[hit], reps[hit])
                starts = lo[hit]
                span = np.arange(reps[hit].sum()) - np.repeat(
                    np.cumsum(reps[hit]) - reps[hit], reps[hit])
                rows = np.repeat(starts, reps[hit]) + span
                hits.append((h_doc * U + self.trig_u[rows]) * max(maxp, 1)
                            + self.trig_p[rows])
        if self.substr_triggers and len(flat_arr):
            for ui, pi, lit, anchored in self.substr_triggers:
                m = (pc.starts_with(flat_arr, lit) if anchored
                     else pc.match_substring(flat_arr, lit)).to_numpy(
                         zero_copy_only=False)
                for d in np.unique(doc_idx[m]):
                    hits.append(np.array(
                        [(d * U + ui) * max(maxp, 1) + pi], dtype=np.int64))
        if hits:
            keys = np.unique(np.concatenate(hits))
            du = keys // max(maxp, 1)           # doc*U + unit, pass deduped
            du_unique, counts = np.unique(du, return_counts=True)
            cand_doc = du_unique // U
            cand_unit = du_unique % U
            ok = counts == self.n_pass[cand_unit]
            pairs = list(zip(cand_doc[ok].tolist(), cand_unit[ok].tolist()))
        else:
            pairs = []
        for ui in self.always_units:            # ANYTOKEN units
            pairs.extend((d, int(ui)) for d in range(n_docs))
        return sorted(set(pairs))

    def _verify(self, pairs, flat_arr, lens, scorer=None):
        """Run each candidate unit's subquery against the doc's MemoryIndex.
        Returns {(doc, parent_query): score_or_True}."""
        from ..index.memoryindex import MemoryIndex

        starts = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        mems: dict[int, object] = {}
        out: dict[tuple[int, int], float] = {}
        for d, ui in pairs:
            m = mems.get(d)
            if m is None:
                m = MemoryIndex.from_tokens(
                    flat_arr.slice(starts[d], lens[d]).to_pylist())
                mems[d] = m
            qi, sub = self.units[ui]
            t0 = (time.perf_counter()
                  if self.slow_log_limit_s is not None else 0.0)
            if scorer is None:
                if m.matches(sub):
                    out[(d, qi)] = out.get((d, qi), 0.0)
            else:
                s = scorer(m, sub)
                if s is not None:
                    # ScoringMatch.merge sums subquery scores
                    out[(d, qi)] = out.get((d, qi), 0.0) + s
            if self.slow_log_limit_s is not None:
                dt = time.perf_counter() - t0
                if dt >= self.slow_log_limit_s:
                    qid = str(self.query_ids[qi])
                    self.slow_log[qid] = self.slow_log.get(qid, 0.0) + dt
        return out

    def _tokenize(self, texts):
        from .textstats import _flat_tokens_np

        flat, lens = _flat_tokens_np(texts)
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        return flat.to_arrow(), lens, doc_idx

    def match_batch(self, doc_ids: np.ndarray, texts):
        """(matched doc_ids, parent query indices) — QueryMatch semantics."""
        flat_arr, lens, doc_idx = self._tokenize(texts)
        pairs = self._candidates(doc_idx, flat_arr, lens)
        out = self._verify(pairs, flat_arr, lens)
        d = np.array([k[0] for k in out], dtype=np.int64)
        q = np.array([k[1] for k in out], dtype=np.int64)
        order = np.lexsort((d, q)) if len(d) else np.empty(0, np.int64)
        return (doc_ids[d[order]] if len(d) else d), q[order]

    def scoring_match_batch(self, doc_ids: np.ndarray, texts,
                            similarity=None):
        """ScoringMatch semantics (`monitor/ScoringMatch.java`): score each
        matching subquery against the single-doc MemoryIndex and SUM scores
        per parent query; zero-scoring matches are dropped (the reference's
        ScoringMatcher only reports matches with score > 0)."""
        flat_arr, lens, doc_idx = self._tokenize(texts)
        pairs = self._candidates(doc_idx, flat_arr, lens)

        def scorer(mem, sub):
            s = mem.search(sub, similarity=similarity)
            return s if s > 0 else None

        out = self._verify(pairs, flat_arr, lens, scorer=scorer)
        items = sorted(out.items(), key=lambda kv: (kv[0][1], kv[0][0]))
        d = np.array([k[0] for k, _ in items], dtype=np.int64)
        q = np.array([k[1] for k, _ in items], dtype=np.int64)
        s = np.array([v for _, v in items], dtype=np.float32)
        return (doc_ids[d] if len(d) else d), q, s

    def highlight_match_batch(self, doc_ids: np.ndarray, texts):
        """HighlightsMatch semantics (`monitor/HighlightsMatch.java`): for
        each match, the token-position spans the query matched at.  Term
        leaves report each occurrence; exact phrases report aligned runs;
        boolean hits union their matching clauses' hits
        (HighlightsMatch.merge).  Returns (doc_ids, query idx, hits) where
        hits is a list of (start_pos, end_pos) per match row."""
        from ..index.memoryindex import MemoryIndex

        flat_arr, lens, doc_idx = self._tokenize(texts)
        pairs = self._candidates(doc_idx, flat_arr, lens)
        starts = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        mems: dict[int, object] = {}
        merged: dict[tuple[int, int], list] = {}
        for d, ui in pairs:
            m = mems.get(d)
            if m is None:
                m = MemoryIndex.from_tokens(
                    flat_arr.slice(starts[d], lens[d]).to_pylist())
                mems[d] = m
            qi, sub = self.units[ui]
            if not m.matches(sub):
                continue
            merged.setdefault((d, qi), []).extend(query_hits(sub, m))
        items = sorted(merged.items(), key=lambda kv: (kv[0][1], kv[0][0]))
        d = np.array([k[0] for k, _ in items], dtype=np.int64)
        q = np.array([k[1] for k, _ in items], dtype=np.int64)
        hits = [sorted(set(v)) for _, v in items]
        return (doc_ids[d] if len(d) else d), q, hits

    def debug_batch(self, doc_ids: np.ndarray, texts):
        """PresearcherMatches debug surface (`monitor/PresearcherMatches.java`):
        per (doc, parent query) the exact trigger terms that selected it,
        BEFORE verification."""
        flat_arr, lens, doc_idx = self._tokenize(texts)
        import pyarrow.compute as pc

        out: dict[tuple[int, int], set] = {}
        toks = set()
        if len(flat_arr):
            toks = set(pc.unique(flat_arr).to_pylist())
        pairs = self._candidates(doc_idx, flat_arr, lens)
        for d, ui in pairs:
            qi = self.units[ui][0]
            terms = set()
            for entries in self.unit_passes[ui]:
                for e in entries:
                    if e[0] == "term" and e[1] in toks:
                        terms.add(e[1])
                    elif e[0] == "substr":
                        terms.add(f"~{e[1]}")
                    elif e[0] == "any":
                        terms.add(ANYTOKEN)
            out.setdefault((int(doc_ids[d]), qi), set()).update(terms)
        return {(d, str(self.query_ids[qi])): sorted(ts)
                for (d, qi), ts in out.items()}


def query_hits(q, mem) -> list[tuple[int, int]]:
    """Token-position spans where `q` matches inside a single-doc
    MemoryIndex (HighlightsMatch hit extraction via the Matches API):
    term → every occurrence, exact phrase → aligned runs, boolean → union
    of matching positive clauses, wrappers descend.  Leaves without a
    position representation (ranges, multi-term expansions) contribute no
    spans — the match itself is still reported."""
    from ..search.query import (
        MUST_NOT,
        BooleanQuery,
        BoostQuery,
        ConstantScoreQuery,
        PhraseQuery,
        SynonymQuery,
        TermInSetQuery,
        TermQuery,
    )

    if isinstance(q, TermQuery):
        return [(p, p) for p in mem._positions("text", q.term)]
    if isinstance(q, (SynonymQuery, TermInSetQuery)):
        out = []
        for t in q.terms:
            out.extend((p, p) for p in mem._positions("text", t))
        return out
    if isinstance(q, PhraseQuery) and getattr(q, "slop", 0) == 0:
        pos = [mem._positions("text", t) for t in q.terms]
        if any(not p for p in pos):
            return []
        first = np.asarray(pos[0], dtype=np.int64)
        ok = np.ones(len(first), dtype=bool)
        for i, p in enumerate(pos[1:], start=1):
            ok &= np.isin(first + i, np.asarray(p, dtype=np.int64))
        n = len(q.terms)
        return [(int(s), int(s) + n - 1) for s in first[ok]]
    if isinstance(q, (BoostQuery, ConstantScoreQuery)):
        return query_hits(q.query, mem)
    if isinstance(q, BooleanQuery):
        out = []
        for c in q.clauses:
            if c.occur == MUST_NOT:
                continue
            if mem.matches(c.query):
                out.extend(query_hits(c.query, mem))
        return out
    return []


# ---------------------------------------------------------------------------
# Driver pipeline: stream documents through a multipass TreeMonitor
# ---------------------------------------------------------------------------

def _registered_tree():
    from ..search.query import PhraseQuery, PrefixQuery, RegexpQuery, \
        bool_query

    return [
        ("pq-tree-phrase", PhraseQuery(("merge", "join"))),
        ("pq-tree-dis", bool_query(should=["scan", "sort"])),
        ("pq-tree-not", bool_query(must=["window"], must_not=["batch"])),
        ("pq-tree-regex", RegexpQuery("merg.*g")),
        ("pq-tree-prefix", PrefixQuery("vec")),
    ]


def percolate_tree(sf_dir: str, registered=None, passes: int = 2):
    """(doc_id, query_id) matches via the QueryTree multipass presearcher
    (decomposed disjunctions, phrase two-pass filtering, regexp + prefix
    trigger handlers) — same streaming map_batches shape as percolate()."""
    from .textstats import _read_documents

    mon = TreeMonitor(
        registered if registered is not None else _registered_tree(),
        passes=passes,
        handlers=[RegexpQueryHandler(), PrefixQueryHandler()])

    def match(t: pa.Table) -> pa.Table:
        docs, qidx = mon.match_batch(t.column("doc_id").to_numpy(),
                                     t.column("text"))
        return pa.table({"doc_id": pa.array(docs, type=pa.int64()),
                         "query_id": pa.array(mon.query_ids[qidx],
                                              type=pa.string())})

    return _read_documents(sf_dir).map_batches(match, batch_format="pyarrow")


def percolate_tree_oracle_sql() -> str:
    """DuckDB twin of percolate_tree over the fixed _registered_tree set."""
    phrase = ("' ' || array_to_string(toks, ' ') || ' ' LIKE '% merge join %'")
    return " UNION ALL ".join([
        f"SELECT doc_id, 'pq-tree-phrase' AS query_id FROM toklists WHERE {phrase}",
        "SELECT doc_id, 'pq-tree-dis' AS query_id FROM toklists "
        "WHERE list_contains(toks, 'scan') OR list_contains(toks, 'sort')",
        "SELECT doc_id, 'pq-tree-not' AS query_id FROM toklists "
        "WHERE list_contains(toks, 'window') AND NOT list_contains(toks, 'batch')",
        "SELECT doc_id, 'pq-tree-regex' AS query_id FROM toklists "
        "WHERE len(list_filter(toks, x -> regexp_full_match(x, 'merg.*g'))) > 0",
        "SELECT doc_id, 'pq-tree-prefix' AS query_id FROM toklists "
        "WHERE len(list_filter(toks, x -> x LIKE 'vec%')) > 0",
    ])
