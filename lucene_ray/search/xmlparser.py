"""XML query parser dialect — the CoreParser element set
(`queryparser/src/java/org/apache/lucene/queryparser/xml/CoreParser.java:90-134`
and its `builders/`) mapped onto this engine's query AST.

Supported elements (attribute conventions follow the reference builders —
`fieldName` inherits from ancestors like DOMUtils.getAttributeWithInheritance):

- ``TermQuery`` / ``BoostingTermQuery`` — fieldName + text content
  (BoostingTermQuery's payload scoring is out of scope; it degrades to a
  boosted TermQuery, documented divergence).
- ``TermsQuery`` — content analyzed; SHOULD-of-terms BooleanQuery
  (`builders/TermsQueryBuilder.java`).
- ``MatchAllDocsQuery``.
- ``BooleanQuery`` — ``minimumNumberShouldMatch``; ``Clause`` children with
  ``occurs`` in should|must|mustNot|filter (`builders/BooleanQueryBuilder.java`).
- ``RangeQuery`` / ``PointRangeQuery`` — ``lowerTerm``/``upperTerm`` (open
  when absent), int/long types; RangeQuery's ``includeLower``/``includeUpper``
  map onto the engine's inclusive int64 doc-values range by +/-1
  (`builders/PointRangeQueryBuilder.java`, `builders/RangeQueryBuilder.java`).
- ``DisjunctionMaxQuery`` — ``tieBreaker``; element children are disjuncts.
- ``ConstantScoreQuery`` — wraps its first element child.
- ``UserQuery`` — classic-parser syntax in text content
  (`builders/UserInputQueryBuilder.java`).
- ``SpanTerm`` — degenerate single-term span.
- ``SpanNear`` — ``slop`` + ``inOrder``; SpanTerm children.  slop=0 ordered
  is an exact PhraseQuery; otherwise IntervalQuery with
  max_width = n_terms + slop (the span-width equivalence also used by the
  surround dialect).
- ``SpanOrTerms`` — analyzed content as one SynonymQuery.
- ``SpanFirst`` / ``SpanPositionRange`` — single SpanTerm child restricted
  to a position window (SpanPositionRangeQuery).
- ``SpanNot`` — Include/Exclude SpanTerm pair (SpanNotQuery).

The *LikeThis builders are out of scope (MLT lives on the searcher) —
they raise ``XmlParseError``.

Every element honors ``boost`` by wrapping in BoostQuery, like the
reference builders do.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from ..analysis.standard import analyze
from .query import (
    SHOULD,
    BooleanClause,
    BooleanQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    IntervalQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    PhraseQuery,
    RangeQuery,
    SpanNotQuery,
    SpanPositionRangeQuery,
    SynonymQuery,
    TermQuery,
    parse_classic,
)
from .query import BoostQuery as _Boost

_OCCURS = {"should": "SHOULD", "must": "MUST",
           "mustnot": "MUST_NOT", "filter": "FILTER"}


class XmlParseError(ValueError):
    pass


def _field(e: ET.Element, inherited: str | None, default: str) -> str:
    f = e.get("fieldName")
    if f:
        return f
    if inherited:
        return inherited
    return default


def _text(e: ET.Element) -> str:
    t = (e.text or "").strip()
    if not t:
        raise XmlParseError(f"<{e.tag}> requires non-blank text content")
    return t


def _boost(e: ET.Element, q):
    b = float(e.get("boost", "1"))
    return _Boost(q, b) if b != 1.0 else q


def _children(e: ET.Element) -> list[ET.Element]:
    return list(e)


def _build_span(e: ET.Element, fld: str):
    """One node of a nested span tree (`builders/SpanQueryBuilderFactory`):
    SpanTerm → term string, SpanNear/SpanOr → span query objects,
    SpanOrTerms → analyzed-term SpanOr."""
    from .spans import SpanNearQuery, SpanOrQuery

    if e.tag == "SpanTerm":
        return _text(e)
    if e.tag == "SpanNear":
        kids = _children(e)
        if not kids:
            raise XmlParseError("SpanNear requires children")
        return SpanNearQuery(tuple(_build_span(c, fld) for c in kids),
                             slop=int(e.get("slop", "0")),
                             in_order=e.get("inOrder", "true").lower() != "false",
                             field=fld)
    if e.tag == "SpanOr":
        kids = _children(e)
        if not kids:
            raise XmlParseError("SpanOr requires children")
        return SpanOrQuery(tuple(_build_span(c, fld) for c in kids), field=fld)
    if e.tag == "SpanOrTerms":
        toks = analyze(_text(e))
        if not toks:
            raise XmlParseError("SpanOrTerms analyzed to no terms")
        return SpanOrQuery(tuple(dict.fromkeys(toks)), field=fld)
    raise XmlParseError(f"unsupported span element {e.tag}")


def _build(e: ET.Element, inherited_field: str | None, default_field: str):
    tag = e.tag
    fld = _field(e, inherited_field, default_field)
    if tag in ("TermQuery", "BoostingTermQuery", "SpanTerm"):
        return _boost(e, TermQuery(_text(e), field=fld))
    if tag == "TermsQuery":
        toks = analyze(_text(e))
        if not toks:
            return MatchNoDocsQuery("no terms after analysis")
        clauses = tuple(BooleanClause(TermQuery(t, field=fld), SHOULD)
                        for t in toks)
        return _boost(e, BooleanQuery(clauses))
    if tag == "MatchAllDocsQuery":
        return MatchAllDocsQuery()
    if tag == "LikeThisQuery":
        # builders/LikeThisQueryBuilder.java: text content + maxQueryTerms
        # / minTermFrequency / percentTermsToMatch (percent) / minDocFreq
        from .query import MoreLikeThisQuery

        return _boost(e, MoreLikeThisQuery(
            _text(e),
            max_query_terms=int(e.get("maxQueryTerms", "20")),
            min_term_freq=int(e.get("minTermFrequency", "1")),
            min_doc_freq=int(e.get("minDocFreq", "-1")),
            percent_terms_to_match=float(
                e.get("percentTermsToMatch", "30")) / 100.0,
            field=fld))
    if tag == "FuzzyLikeThisQuery":
        # builders/FuzzyLikeThisQueryBuilder.java: Field children carry
        # (text, minSimilarity -> floatToEdits ints here, prefixLength)
        from .query import FuzzyLikeThisQuery

        flds = []
        for fe in _children(e):
            if fe.tag != "Field":
                continue
            sim = float(fe.get("minSimilarity", "2"))
            edits = min(int(sim), 2) if sim >= 1.0 else (
                0 if sim == 0.0 else 1)
            flds.append((_text(fe), edits,
                         int(fe.get("prefixLength", "1"))))
        return _boost(e, FuzzyLikeThisQuery(
            tuple(flds),
            max_num_terms=int(e.get("maxNumTerms", "50")),
            ignore_tf=e.get("ignoreTF", "false").lower() == "true"))
    if tag == "BooleanQuery":
        msm = int(e.get("minimumNumberShouldMatch", "0"))
        clauses = []
        for child in _children(e):
            if child.tag != "Clause":
                continue
            occ = _OCCURS.get(child.get("occurs", "should").lower())
            if occ is None:
                raise XmlParseError(
                    f"invalid occurs value: {child.get('occurs')}")
            inner = _children(child)
            if not inner:
                raise XmlParseError("Clause requires a child query element")
            q = _build(inner[0], fld if e.get("fieldName") else inherited_field,
                       default_field)
            clauses.append(BooleanClause(q, occ))
        return _boost(e, BooleanQuery(tuple(clauses),
                                      minimum_should_match=msm))
    if tag in ("RangeQuery", "PointRangeQuery"):
        lo = e.get("lowerTerm")
        hi = e.get("upperTerm")
        typ = e.get("type", "int" if tag == "PointRangeQuery" else "long")
        if typ.lower() not in ("int", "long"):
            raise XmlParseError(
                "only int/long ranges are supported (int64 doc-values)")
        lo_v = int(lo) if lo is not None else None
        hi_v = int(hi) if hi is not None else None
        if e.get("includeLower", "true").lower() == "false" and lo_v is not None:
            lo_v += 1
        if e.get("includeUpper", "true").lower() == "false" and hi_v is not None:
            hi_v -= 1
        return _boost(e, RangeQuery(fld, lo_v, hi_v))
    if tag == "DisjunctionMaxQuery":
        tie = float(e.get("tieBreaker", "0"))
        disjuncts = []
        for c in _children(e):
            q = _build(c, fld if e.get("fieldName") else inherited_field,
                       default_field)
            if isinstance(q, _Boost) and isinstance(q.query, TermQuery):
                q = TermQuery(q.query.term, field=q.query.field,
                              boost=q.query.boost * q.boost)
            if not isinstance(q, TermQuery):
                raise XmlParseError(
                    "DisjunctionMaxQuery supports term disjuncts only "
                    "(engine dismax is term-level)")
            disjuncts.append(q)
        if not disjuncts:
            raise XmlParseError("DisjunctionMaxQuery requires disjuncts")
        return _boost(e, DisjunctionMaxQuery(tuple(disjuncts),
                                             tie_breaker=tie))
    if tag == "ConstantScoreQuery":
        inner = _children(e)
        if not inner:
            raise XmlParseError("ConstantScoreQuery requires a child")
        q = _build(inner[0], fld if e.get("fieldName") else inherited_field,
                   default_field)
        return ConstantScoreQuery(q, boost=float(e.get("boost", "1")))
    if tag == "UserQuery":
        return _boost(e, parse_classic(_text(e), field=fld))
    if tag == "SpanNear":
        slop = int(e.get("slop", "0"))
        in_order = e.get("inOrder", "true").lower() != "false"
        kids = _children(e)
        if not kids:
            raise XmlParseError("SpanNear requires children")
        if all(c.tag == "SpanTerm" for c in kids):
            # flat term spans keep their specialized rewrites
            terms = [_text(c) for c in kids]
            if len(terms) == 1:
                return _boost(e, TermQuery(terms[0], field=fld))
            if in_order and slop == 0:
                return _boost(e, PhraseQuery(tuple(terms), field=fld))
            return _boost(e, IntervalQuery(tuple(terms),
                                           max_width=len(terms) + slop,
                                           ordered=in_order, field=fld))
        # nested span algebra (`builders/SpanNearBuilder.java` accepts any
        # SpanQuery children): SpanNear / SpanOr / SpanTerm compose
        from .spans import SpanNearQuery as _SN

        return _boost(e, _SN(tuple(_build_span(c, fld) for c in kids),
                             slop=slop, in_order=in_order, field=fld))
    if tag == "SpanOrTerms":
        toks = analyze(_text(e))
        if not toks:
            return MatchNoDocsQuery("no terms after analysis")
        return _boost(e, SynonymQuery(tuple(dict.fromkeys(toks)), field=fld))
    if tag == "SpanOr":
        # general span-or (`builders/SpanOrBuilder.java`): SpanTerm children
        # union like SynonymQuery; composite span children form a true
        # SpanOrQuery usable inside an enclosing SpanNear
        kids = _children(e)
        if not kids:
            raise XmlParseError("SpanOr requires children")
        if all(c.tag == "SpanTerm" for c in kids):
            return _boost(e, SynonymQuery(
                tuple(dict.fromkeys(_text(c) for c in kids)), field=fld))
        from .spans import SpanOrQuery as _SO

        return _boost(e, _SO(tuple(_build_span(c, fld) for c in kids),
                             field=fld))
    if tag == "SpanNot":
        # reference SpanNot has Include/Exclude wrapper children
        inc = e.find("Include")
        exc = e.find("Exclude")
        if inc is None or exc is None or len(inc) != 1 or len(exc) != 1 \
                or inc[0].tag != "SpanTerm" or exc[0].tag != "SpanTerm":
            raise XmlParseError(
                "SpanNot requires Include/Exclude each holding one SpanTerm")
        return _boost(e, SpanNotQuery(_text(inc[0]), _text(exc[0]),
                                      field=fld))
    if tag in ("SpanFirst", "SpanPositionRange"):
        inner = _children(e)
        if len(inner) != 1 or inner[0].tag != "SpanTerm":
            raise XmlParseError(
                f"{tag} supports a single SpanTerm child only")
        start = int(e.get("start", "0")) if tag == "SpanPositionRange" else 0
        end = int(e.get("end"))
        return _boost(e, SpanPositionRangeQuery(
            _text(inner[0]), start, end, field=fld))
    raise XmlParseError(f"unsupported query element: <{tag}>")


def parse_xml(xml_text: str, field: str = "text"):
    """Parse a CoreParser-dialect XML query string into a query object.

    The root element is the query itself (the reference accepts any
    registered element as the document root)."""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError as exc:
        raise XmlParseError(f"malformed XML: {exc}") from exc
    return _build(root, None, field)
