"""Flexible (Standard) query parser — the 5th reference dialect.

Re-implements the surface of `queryparser/flexible/standard/
StandardQueryParser.java:1-250` and its grammar
(`flexible/standard/parser/StandardSyntaxParser.jj:228-860`):

    Query      ::= DisjQuery ( DisjQuery )*          juxtaposition = default op
    DisjQuery  ::= ConjQuery ( OR ConjQuery )*       OR binds loosest
    ConjQuery  ::= ModClause ( AND ModClause )*      AND binds tighter than OR
    ModClause  ::= ('+' | '-' | NOT | '!')? Clause
    Clause     ::= FieldRangeExpr
                 | (FieldName (':' | '='))? (Term | GroupingExpr | IntervalExpr)
    GroupingExpr ::= '(' Query ')' ('^' NUM)? ('@' NUM)?
    Term       ::= word ('~' NUM?)? ('^' NUM)?       fuzzy + boost
                 | '/regexp/' ('^' NUM)?
                 | '[' lo TO hi ']' / '{' lo TO hi '}' (open bound '*')
                 | '"phrase"' ('~' NUM)? ('^' NUM)?
    FieldRangeExpr ::= FieldName ('<'|'>'|'<='|'>=') value
    IntervalExpr   ::= 'fn:' name '(' args ')'       interval functions

The node-processor pipeline (`flexible/standard/processors/
StandardQueryNodeProcessorPipeline.java`) is folded into the build step:
BooleanQuery2ModifierNodeProcessor semantics (AND children REQ, OR children
SHOULD, default operator for juxtaposition, '-'/NOT → MUST_NOT),
FuzzyQueryNodeProcessor float-to-edits, AllowLeadingWildcardProcessor
(rejects leading wildcards unless configured), MinShouldMatchNode → the
BooleanQuery's minimum_should_match.

Engine mapping (documented divergences): non-default-field terms address
the keyword namespace (StringField analogy, same convention as
parse_classic); field ranges hit int64 doc-values columns; interval
functions map onto :class:`IntervalQuery` (ordered/unordered + maxwidth /
maxgaps / phrase), `fn:or` / `fn:atLeast` / `fn:wildcard` onto their exact
doc-matching boolean equivalents (standalone positional source == document
presence).  Unsupported nestings raise NotImplementedError honestly.
"""

from __future__ import annotations

import re as _re

from .query import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanClause,
    BooleanQuery,
    BoostQuery,
    FuzzyQuery,
    IntervalQuery,
    PhraseQuery,
    PrefixQuery,
    RangeQuery,
    RegexpQuery,
    TermInSetQuery,
    TermQuery,
    WildcardQuery,
)


class FlexibleParseError(ValueError):
    """Raised for syntax the Standard dialect rejects (ParseException)."""


_TOKEN = _re.compile(
    r"""\s+
      | (?P<and>AND\b|&&)
      | (?P<or>OR\b|\|\|)
      | (?P<not>NOT\b|!)
      | (?P<lp>\()
      | (?P<rp>\))
      | (?P<plus>\+(?=\S))
      | (?P<minus>-(?=\S))
      | (?P<range>[\[\{][^\]\}]*?\sTO\s[^\]\}]*?[\]\}])
      | "(?P<phrase>(?:\\.|[^"\\])*)"
      | /(?P<regexp>(?:\\.|[^/\\])*)/
      | (?P<msm>@\d+)
      | (?P<boost>\^\d+(?:\.\d+)?)
      | (?P<tilde>~(?:\d+(?:\.\d+)?)?)
      | (?P<cmp><=|>=|<|>|=|:)
      | (?P<word>(?:\\.|[^\s()^@:<>="/\\~])+)
    """, _re.VERBOSE)


def _unescape(s: str) -> str:
    """discardEscapeChar (`flexible/standard/parser/EscapeQuerySyntaxImpl`)."""
    return _re.sub(r"\\(.)", r"\1", s)


def _lex(text: str):
    toks, pos = [], 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if m is None:
            raise FlexibleParseError(f"cannot lex at {text[pos:pos + 20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind is None:            # whitespace
            continue
        toks.append((kind, m.group(kind)))
    return toks


def _to_span_node(q):
    """Convert a parsed interval-function Query into a span-algebra node so
    it can nest inside an enclosing interval function."""
    from .query import MatchAllDocsQuery  # noqa: F401 (guard import cycle)
    from .spans import SPAN_TYPES

    if isinstance(q, (str, *SPAN_TYPES, PrefixQuery, WildcardQuery,
                      RegexpQuery, FuzzyQuery)):
        return q
    if isinstance(q, TermQuery):
        return q.term
    if isinstance(q, IntervalQuery):
        # ordered interval with width cap w over unit terms == span-near
        # with total gap cap w - n (NearSpansOrdered math)
        slop = (1 << 29 if q.max_width >= (1 << 29)
                else max(0, int(q.max_width) - len(q.terms)))
        from .spans import SpanNearQuery

        return SpanNearQuery(tuple(q.terms), slop=slop,
                             in_order=q.ordered, field=q.field)
    if isinstance(q, TermInSetQuery):
        from .spans import SpanOrQuery

        return SpanOrQuery(tuple(q.terms), field=q.field)
    raise NotImplementedError(
        f"{type(q).__name__} cannot nest inside an interval function")


def _float_to_edits(similarity: float, term_len: int) -> int:
    """FuzzyQuery.floatToEdits (`search/FuzzyQuery.java:261-270`)."""
    if similarity >= 1.0:
        return min(int(similarity), 2)
    if similarity == 0.0:
        return 0            # 0 means exact, not infinite edits
    return min(int((1.0 - similarity) * term_len), 2)


class _Flex:
    def __init__(self, tokens, field, default_operator, allow_leading_wildcard):
        self.toks = tokens
        self.i = 0
        self.field = field
        self.default_operator = default_operator
        self.allow_leading = allow_leading_wildcard

    # ---- token helpers ----
    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    # ---- grammar ----
    def query(self, field):
        """Query ::= DisjQuery+ — juxtaposition joined by the default op."""
        nodes = []
        while self.peek()[0] is not None and self.peek()[0] != "rp":
            nodes.append(self.disj(field))
        nodes = [n for n in nodes if n is not None]
        if not nodes:
            return BooleanQuery(())
        if len(nodes) == 1:
            return self._unwrap(nodes[0])
        occur = MUST if self.default_operator == MUST else SHOULD
        return BooleanQuery(tuple(self._clause(n, occur) for n in nodes))

    def disj(self, field):
        nodes = [self.conj(field)]
        while self.peek()[0] == "or":
            self.take()
            nodes.append(self.conj(field))
        nodes = [n for n in nodes if n is not None]
        if not nodes:
            return None
        if len(nodes) == 1:
            return nodes[0]
        return BooleanQuery(tuple(self._clause(n, SHOULD) for n in nodes))

    def conj(self, field):
        nodes = [self.mod(field)]
        while self.peek()[0] == "and":
            self.take()
            nodes.append(self.mod(field))
        nodes = [n for n in nodes if n is not None]
        if not nodes:
            return None
        if len(nodes) == 1:
            return nodes[0]
        return BooleanQuery(tuple(self._clause(n, MUST) for n in nodes))

    def mod(self, field):
        kind, _ = self.peek()
        if kind in ("plus", "minus", "not"):
            self.take()
            sub = self.clause(field)
            if sub is None:
                return None
            return ("REQ" if kind == "plus" else "NOT", sub)
        return self.clause(field)

    # modifier-aware clause emission (BooleanQuery2ModifierNodeProcessor)
    @staticmethod
    def _clause(node, occur):
        if isinstance(node, tuple):
            tag, q = node
            return BooleanClause(q, MUST if tag == "REQ" else MUST_NOT)
        return BooleanClause(node, occur)

    @staticmethod
    def _unwrap(node):
        """A single top-level node: a bare modifier still forms a boolean
        (`+a` → MUST-only query; `-a` → pure-negative, matches nothing)."""
        if isinstance(node, tuple):
            tag, q = node
            return BooleanQuery((BooleanClause(
                q, MUST if tag == "REQ" else MUST_NOT),))
        return node

    def clause(self, field):
        kind, val = self.peek()
        if kind == "word":
            # FieldRangeExpr / field-qualified clause need 2-token lookahead
            nxt = self.toks[self.i + 1] if self.i + 1 < len(self.toks) else (None, None)
            if nxt[0] == "cmp":
                word = _unescape(val)
                if word == "fn" and nxt[1] == ":":
                    return self.interval(field)
                if nxt[1] in ("<", ">", "<=", ">="):
                    self.take(); self.take()
                    return self.field_range(word, nxt[1])
                if nxt[1] in (":", "="):
                    self.take(); self.take()
                    # field applies to the next term / group / interval fn
                    return self.clause_body(word)
            return self.term(field)
        return self.clause_body(field)

    def clause_body(self, field):
        kind, val = self.peek()
        if kind == "lp":
            return self.group(field)
        if kind == "word" and val == "fn" \
                and self.i + 1 < len(self.toks) \
                and self.toks[self.i + 1] == ("cmp", ":"):
            return self.interval(field)
        return self.term(field)

    def group(self, field):
        self.take()                                   # '('
        q = self.query(field)
        if self.peek()[0] != "rp":
            raise FlexibleParseError("expected ')'")
        self.take()
        boost, msm = None, None
        while self.peek()[0] in ("boost", "msm"):
            kind, val = self.take()
            if kind == "boost":
                boost = float(val[1:])
            else:
                msm = int(val[1:])
        if msm is not None:
            if not (isinstance(q, BooleanQuery)
                    and all(c.occur == SHOULD for c in q.clauses)):
                raise FlexibleParseError(
                    "@<n> (minimum-should-match) applies only to pure "
                    "disjunction groups (MinShouldMatchNode contract)")
            q = BooleanQuery(q.clauses, msm)
        if boost is not None:
            q = BoostQuery(q, boost)
        return q

    def field_range(self, fname, op):
        kind, val = self.take()
        if kind not in ("word", "phrase"):
            raise FlexibleParseError(f"expected range value after {fname}{op}")
        v = self._range_value(_unescape(val))
        # FieldRangeExpr (`StandardSyntaxParser.jj:738-781`)
        if op == "<":
            return RangeQuery(fname, None, v - 1)
        if op == "<=":
            return RangeQuery(fname, None, v)
        if op == ">":
            return RangeQuery(fname, v + 1, None)
        return RangeQuery(fname, v, None)

    @staticmethod
    def _range_value(s):
        try:
            return int(s)
        except ValueError:
            raise FlexibleParseError(
                f"range bound {s!r}: only int64 doc-values ranges are "
                f"supported (engine has no text-sorted BKD terms)")

    def range_query(self, fname, val):
        m = _re.fullmatch(
            r"([\[\{])\s*(\S+)\s+TO\s+(\S+)\s*([\]\}])", val)
        if m is None:
            raise FlexibleParseError(f"bad range {val!r}")
        lb, lo, hi, rb = m.groups()
        lo_v = None if lo == "*" else self._range_value(lo) + (1 if lb == "{" else 0)
        hi_v = None if hi == "*" else self._range_value(hi) - (1 if rb == "}" else 0)
        return RangeQuery(fname, lo_v, hi_v)

    def term(self, field):
        from ..analysis.standard import analyze

        kind, val = self.take()
        if kind == "range":
            return self.range_query(field, val)
        if kind == "regexp":
            q = RegexpQuery(_unescape(val), field=field)
            return self._with_boost(q)
        if kind == "phrase":
            if field != self.field:
                raise NotImplementedError(
                    "phrases on keyword fields are unsupported (positions "
                    "exist only for the analyzed text field)")
            ptext = _unescape(val)
            slop = 0
            if self.peek()[0] == "tilde":
                t = self.take()[1][1:]
                slop = int(float(t)) if t else 0
            terms = tuple(analyze(ptext))
            if not terms:
                return None
            q = (TermQuery(terms[0], field) if len(terms) == 1
                 else PhraseQuery(terms, field, slop=slop))
            return self._with_boost(q)
        if kind != "word":
            raise FlexibleParseError(f"unexpected {val!r}")
        word = _unescape(val)
        if field != self.field:
            # non-default field → keyword-term namespace (StringField)
            return self._with_boost(TermQuery(f"{field}\x1f{word}", field))
        if self.peek()[0] == "tilde":
            sim = self.take()[1][1:]
            fms = float(sim) if sim else 2.0
            if fms < 0:
                raise FlexibleParseError("fuzzy similarity < 0")
            if fms >= 1.0 and fms != int(fms):
                raise FlexibleParseError("fractional edit distance > 1")
            analyzed = analyze(word)
            if not analyzed:
                return None
            edits = _float_to_edits(fms, len(analyzed[0]))
            return self._with_boost(FuzzyQuery(analyzed[0], max_edits=edits,
                                               field=field))
        from .query import _escaped_at as _esc

        wl = [i for i, c in enumerate(val)
              if c in "*?" and not _esc(val, i)]
        if wl:
            # wildcard routing on the ESCAPED form: \* / \? are literals
            if wl[0] == 0 and not self.allow_leading:
                # AllowLeadingWildcardProcessor default contract
                raise FlexibleParseError(
                    "leading wildcard not allowed (set "
                    "allow_leading_wildcard=True)")
            if val == "*":
                from .query import MatchAllDocsQuery
                return self._with_boost(MatchAllDocsQuery())
            if len(wl) == 1 and val[wl[0]] == "*" and wl[0] == len(val) - 1:
                return self._with_boost(
                    PrefixQuery(_unescape(val[:-1]).lower(), field))
            return self._with_boost(WildcardQuery(val.lower(), field))
        terms = analyze(word)
        if not terms:
            return None
        if len(terms) == 1:
            return self._with_boost(TermQuery(terms[0], field))
        occur = MUST if self.default_operator == MUST else SHOULD
        return self._with_boost(BooleanQuery(tuple(
            BooleanClause(TermQuery(t, field), occur) for t in terms)))

    def _with_boost(self, q):
        if self.peek()[0] == "boost":
            b = float(self.take()[1][1:])
            return BoostQuery(q, b)
        return q

    # ---- interval functions (`flexible/standard/nodes/intervalfn/`) ----
    def interval(self, field):
        self.take()                                   # 'fn'
        self.take()                                   # ':'
        kind, name = self.take()
        if kind != "word":
            raise FlexibleParseError("expected interval function name")
        name = name.lower()
        if self.peek()[0] != "lp":
            raise FlexibleParseError(f"expected '(' after fn:{name}")
        self.take()
        q = self._interval_body(name, field)
        if self.peek()[0] != "rp":
            raise FlexibleParseError("expected ')' closing interval fn")
        self.take()
        return self._with_boost(q)

    def _interval_words(self):
        """Consume plain words until ')' (analyzed query terms)."""
        from ..analysis.standard import analyze

        out = []
        while self.peek()[0] == "word" and not self._at_fn():
            out.extend(analyze(_unescape(self.take()[1])))
        return tuple(out)

    def _at_fn(self) -> bool:
        return (self.peek() == ("word", "fn")
                and self.i + 1 < len(self.toks)
                and self.toks[self.i + 1] == ("cmp", ":"))

    def _interval_args(self, field):
        """Mixed args: plain analyzed terms and nested fn: sources — the
        recursive IntervalFun grammar.  Returns span-algebra nodes (a term
        string, or a Span*/FuzzyQuery node)."""
        out = []
        from ..analysis.standard import analyze

        while True:
            if self._at_fn():
                out.append(_to_span_node(self.interval(field)))
            elif self.peek()[0] == "word":
                out.extend(analyze(_unescape(self.take()[1])))
            else:
                break
        return out

    def _interval_body(self, name, field):
        from .spans import SpanContainingQuery, SpanNearQuery, SpanOrQuery,\
            SpanRelationQuery, SpanWithinQuery

        if name in ("notcontaining", "notcontainedby", "overlapping",
                    "nonoverlapping", "unorderednooverlaps"):
            # the filtering half of the Intervals algebra
            # (StandardSyntaxParser.jj:393-468; Intervals.java:377-469)
            args = self._interval_args(field)
            if len(args) != 2:
                raise FlexibleParseError(f"fn:{name} needs two sources")
            op = {"notcontaining": "not_containing",
                  "notcontainedby": "not_contained_by",
                  "overlapping": "overlapping",
                  "nonoverlapping": "non_overlapping",
                  "unorderednooverlaps": "unordered_no_overlaps"}[name]
            return SpanRelationQuery(op, args[0], reference=args[1],
                                     field=field)
        if name in ("within", "notwithin"):
            # fn:within(source positions reference)
            # (StandardSyntaxParser.jj:574-618)
            args = self._interval_args(field)
            if len(args) != 3 or not (isinstance(args[1], str)
                                      and args[1].isdigit()):
                raise FlexibleParseError(
                    f"fn:{name} needs (source positions reference)")
            return SpanRelationQuery(
                "within" if name == "within" else "not_within",
                args[0], reference=args[2], positions=int(args[1]),
                field=field)
        if name == "extend":
            # fn:extend(source before after) (StandardSyntaxParser.jj:590-602)
            args = self._interval_args(field)
            if len(args) != 3 or not all(isinstance(a, str) and a.isdigit()
                                         for a in args[1:]):
                raise FlexibleParseError("fn:extend needs (source before after)")
            return SpanRelationQuery("extend", args[0], before=int(args[1]),
                                     after=int(args[2]), field=field)

        if name in ("ordered", "unordered", "phrase"):
            args = self._interval_args(field)
            if not args:
                raise FlexibleParseError(f"fn:{name} needs arguments")
            in_order = name != "unordered"
            if all(isinstance(a, str) for a in args):
                # pure-term sources keep the specialized interval engine
                width = len(args) if name == "phrase" else 1 << 30
                return IntervalQuery(tuple(args), width, ordered=in_order,
                                     field=field)
            # nested positional sources compose on the span algebra
            slop = 0 if name == "phrase" else 1 << 29
            return SpanNearQuery(tuple(args), slop=slop, in_order=in_order,
                                 field=field)
        if name == "or":
            args = self._interval_args(field)
            if not args:
                raise FlexibleParseError("fn:or needs arguments")
            if all(isinstance(a, str) for a in args):
                # standalone positional disjunction == any-term presence
                return TermInSetQuery(tuple(args), field=field)
            return SpanOrQuery(tuple(args), field=field)
        if name in ("before", "after"):
            args = self._interval_args(field)
            if len(args) != 2:
                raise FlexibleParseError(f"fn:{name} needs (source reference)")
            src, ref = args
            # doc-level: source strictly before/after the reference
            pair = (src, ref) if name == "before" else (ref, src)
            return SpanNearQuery(pair, slop=1 << 29, in_order=True,
                                 field=field)
        if name in ("containing", "containedby"):
            args = self._interval_args(field)
            if len(args) != 2:
                raise FlexibleParseError(f"fn:{name} needs two sources")
            if name == "containing":                 # (big small)
                return SpanContainingQuery(args[0], args[1], field=field)
            return SpanWithinQuery(args[0], args[1], field=field)  # (small big)
        if name == "fuzzyterm":
            kind, val = self.take()
            if kind != "word":
                raise FlexibleParseError("fn:fuzzyTerm needs a term")
            return FuzzyQuery(_unescape(val).lower(), field=field)
        if name == "wildcard":
            kind, val = self.take()
            if kind != "word":
                raise FlexibleParseError("fn:wildcard needs a pattern")
            return WildcardQuery(_unescape(val).lower(), field=field)
        if name in ("maxwidth", "maxgaps", "atleast"):
            kind, nval = self.take()
            if kind != "word" or not nval.isdigit():
                raise FlexibleParseError(f"fn:{name} needs a leading number")
            n = int(nval)
            if name == "atleast":
                terms = self._interval_words()
                if not terms:
                    raise FlexibleParseError("fn:atLeast needs terms")
                # standalone: >= n of the terms present anywhere in the doc
                return BooleanQuery(tuple(
                    BooleanClause(TermQuery(t, field), SHOULD)
                    for t in terms), n)
            # maxwidth / maxgaps wrap ONE positional source
            if self._at_fn():
                sub = self.interval(field)
            else:
                terms = self._interval_words()
                sub = IntervalQuery(terms, 1 << 30, ordered=False, field=field) \
                    if terms else None
            if isinstance(sub, SpanNearQuery) and name == "maxgaps" \
                    and sub.slop >= 1 << 29:
                # gap cap maps directly onto span-near slop
                import dataclasses

                return dataclasses.replace(sub, slop=n)
            if not isinstance(sub, IntervalQuery):
                raise NotImplementedError(
                    f"fn:{name} supports ordered/unordered/phrase term "
                    f"sources only (got {type(sub).__name__})")
            width = n if name == "maxwidth" else len(sub.terms) + n
            return IntervalQuery(sub.terms, min(width, sub.max_width),
                                 ordered=sub.ordered, field=field)
        raise NotImplementedError(
            f"interval function fn:{name} not supported (supported: ordered "
            f"unordered phrase or before after containing containedBy "
            f"notContaining notContainedBy overlapping nonOverlapping "
            f"within notWithin extend unorderedNoOverlaps "
            f"wildcard fuzzyTerm maxwidth maxgaps atLeast)")


def parse_flexible(text: str, field: str = "text",
                   default_operator: str = SHOULD,
                   allow_leading_wildcard: bool = False):
    """Parse one Standard-dialect query string into the engine AST."""
    p = _Flex(_lex(text), field, default_operator, allow_leading_wildcard)
    q = p.query(field)
    if p.peek()[0] is not None:
        raise FlexibleParseError(f"trailing input at token {p.peek()!r}")
    return q
