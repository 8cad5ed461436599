"""Classic query-parser subset + highlighter."""

import pytest

from lucene_ray.search.highlight import highlight
from lucene_ray.search.query import (
    BooleanQuery,
    FuzzyQuery,
    MUST,
    MUST_NOT,
    PhraseQuery,
    PrefixQuery,
    SHOULD,
    TermQuery,
    WildcardQuery,
    parse_classic,
)


def test_parse_free_text():
    q = parse_classic("Merge JOIN")
    assert isinstance(q, BooleanQuery)
    assert [(c.query.term, c.occur) for c in q.clauses] == \
        [("merge", SHOULD), ("join", SHOULD)]


def test_parse_signs():
    q = parse_classic("+merge -join sort")
    assert [(c.query.term, c.occur) for c in q.clauses] == \
        [("merge", MUST), ("join", MUST_NOT), ("sort", SHOULD)]


def test_parse_phrase_and_slop():
    assert parse_classic('"merge join"') == PhraseQuery(("merge", "join"))
    assert parse_classic('"merge join"~3') == PhraseQuery(("merge", "join"), slop=3)


def test_parse_multiterm():
    assert parse_classic("rare*") == PrefixQuery("rare")
    assert parse_classic("r?re*") == WildcardQuery("r?re*")
    assert parse_classic("quer~1") == FuzzyQuery("quer", max_edits=1)


def test_parse_boost():
    assert parse_classic("merge^2.5") == TermQuery("merge", boost=2.5)


def test_highlight_basic():
    text = "the quick brown fox jumps over the lazy dog"
    snip = highlight(text, ["fox", "dog"], max_passage_tokens=10)
    assert "<b>fox</b>" in snip and "<b>dog</b>" in snip


def test_highlight_window_selection():
    text = ("filler " * 50) + "alpha beta gamma" + (" filler" * 50)
    snip = highlight(text, ["alpha", "gamma"], max_passage_tokens=5)
    assert "<b>alpha</b>" in snip and "<b>gamma</b>" in snip
    assert len(snip) < 120
    assert snip.startswith("…") and snip.endswith("…")


def test_highlight_no_match():
    assert highlight("nothing relevant here", ["absent"]) is None
    assert highlight("", ["x"]) is None


def test_highlight_case_and_unicode():
    snip = highlight("İstanbul is big", ["istanbul"])
    assert snip is not None and "<b>İstanbul</b>" in snip


def test_parser_grouping_parens():
    from lucene_ray.search.query import (
        MUST, MUST_NOT, SHOULD, BooleanQuery, TermQuery, parse_classic,
    )

    q = parse_classic("(merge join) +scan")
    assert isinstance(q, BooleanQuery)
    occurs = [c.occur for c in q.clauses]
    assert occurs == [SHOULD, MUST]
    inner = q.clauses[0].query
    assert isinstance(inner, BooleanQuery)
    assert [c.query.term for c in inner.clauses] == ["merge", "join"]
    assert q.clauses[1].query.term == "scan"
    # nested MUST_NOT group
    q2 = parse_classic("merge -(join sort)")
    assert q2.clauses[1].occur == MUST_NOT
    assert isinstance(q2.clauses[1].query, BooleanQuery)


def test_parser_field_qualified_and_range():
    from lucene_ray.search.query import RangeQuery, TermQuery, parse_classic

    q = parse_classic("role:user")
    assert isinstance(q, TermQuery)
    assert q.term == "role\x1fuser"
    q2 = parse_classic("ts:[100 TO 200]")
    assert q2 == RangeQuery("ts", 100, 200)
    q3 = parse_classic("ts:{100 TO 200}")
    assert q3 == RangeQuery("ts", 101, 199)
    q4 = parse_classic("ts:[* TO 50]")
    assert q4 == RangeQuery("ts", None, 50)
    q5 = parse_classic("+merge ts:[10 TO 20]")
    assert len(q5.clauses) == 2


def test_nested_boolean_execution(ray_session, tmp_path_factory):
    """(a OR b) AND NOT c through the recursive dense path == flat algebra."""
    import numpy as np
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import (
        MUST, MUST_NOT, SHOULD, BooleanClause, BooleanQuery, PhraseQuery,
        TermQuery, bool_query, parse_classic,
    )
    from lucene_ray.search.searcher import IndexSearcher
    from lucene_ray.sources.transcripts import synth_transcripts
    import lucene_ray.analysis.standard as std

    t = synth_transcripts(2000, seed=21)
    d = str(tmp_path_factory.mktemp("nested"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=700,
                input_desc="nested")
    s = IndexSearcher(d)
    ts = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    tokens = [set(std.analyze(x)) if x else set() for x in ts.column("text").to_pylist()]

    # nested group of SHOULD == flat boolean (same matches AND scores)
    nested = BooleanQuery((
        BooleanClause(bool_query(should=["merge", "join"]), SHOULD),))
    flat = bool_query(should=["merge", "join"])
    a = s.search(nested, k=30, total_hits_threshold=2**31 - 1)
    b = s.search(flat, k=30, total_hits_threshold=2**31 - 1)
    assert [(h.gid, h.score) for h in a.hits] == [(h.gid, h.score) for h in b.hits]
    assert a.total_hits == b.total_hits

    # (merge OR join) MUST, NOT sort — brute-force match-set oracle
    q = BooleanQuery((
        BooleanClause(bool_query(should=["merge", "join"]), MUST),
        BooleanClause(TermQuery("sort"), MUST_NOT)))
    got = s.search(q, k=3000, total_hits_threshold=2**31 - 1)
    expect = {d_ for d_, tk in enumerate(tokens)
              if ({"merge", "join"} & tk) and "sort" not in tk}
    assert {h.gid for h in got.hits} == expect

    # phrase inside a boolean (previously unsupported)
    qp = BooleanQuery((
        BooleanClause(PhraseQuery(("the", "data")), MUST),
        BooleanClause(TermQuery("merge"), SHOULD)))
    got2 = s.search(qp, k=3000, total_hits_threshold=2**31 - 1)
    texts = ts.column("text").to_pylist()
    expect2 = set()
    for d_, x in enumerate(texts):
        toks = std.analyze(x) if x else []
        if any(toks[i] == "the" and toks[i + 1] == "data"
               for i in range(len(toks) - 1)):
            expect2.add(d_)
    assert {h.gid for h in got2.hits} == expect2

    # parsed grouped query runs end-to-end
    q3 = parse_classic('(merge join) +"the data"')
    got3 = s.search(q3, k=10)
    assert got3.total_hits > 0


def test_spell_correct(ray_session, tmp_path_factory):
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.searcher import IndexSearcher, spell_correct
    from lucene_ray.sources.transcripts import synth_transcripts

    d = str(tmp_path_factory.mktemp("spell"))
    build_index(rd.from_arrow(synth_transcripts(1200, seed=3)), d,
                target_docs_per_partition=500, input_desc="spell")
    s = IndexSearcher(d)
    got = spell_correct(s, "querz", max_edits=1)
    assert got and got[0][0] == "query"
    got2 = spell_correct(s, "mergee", max_edits=2)
    assert any(t == "merge" for t, _ in got2)
    # exact term not suggested for itself
    assert all(t != "querz" for t, _ in got)


def test_highlight_multi_passage():
    from lucene_ray.search.highlight import highlight

    text = ("merge starts here with join nearby " + "filler " * 40 +
            "and later merge again with join close by " + "tail " * 10)
    one = highlight(text, ["merge", "join"], max_passage_tokens=8, num_passages=1)
    two = highlight(text, ["merge", "join"], max_passage_tokens=8, num_passages=2)
    assert one.count("<b>") >= 2
    assert two.count("<b>") > one.count("<b>")
    assert " … " in two                      # two passages joined
    # passages in document order
    assert two.index("starts") < two.index("again")


def test_highlight_hits_end_to_end(ray_session, tmp_path_factory):
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.highlight import highlight_hits
    from lucene_ray.search.query import bool_query
    from lucene_ray.search.searcher import IndexSearcher
    from lucene_ray.sources.transcripts import synth_transcripts

    t = synth_transcripts(600, seed=61)
    d = str(tmp_path_factory.mktemp("hl"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=300, input_desc="hl")
    text_by_key = {(c, i): x for c, i, x in zip(t.column("conv_id").to_pylist(),
                                                t.column("turn_idx").to_pylist(),
                                                t.column("text").to_pylist())}
    s = IndexSearcher(d)
    res = highlight_hits(s, bool_query(should=["merge"]), text_by_key, k=5)
    assert len(res) == 5
    for h, snip in res:
        assert snip is not None and "<b>merge</b>" in snip


def test_classic_escapes():
    """QueryParserBase escape semantics: escaped syntax chars parse as
    literal term text; classic_escape() makes arbitrary input literal."""
    from lucene_ray.search.query import (
        BooleanQuery,
        FuzzyQuery,
        PhraseQuery,
        PrefixQuery,
        TermQuery,
        WildcardQuery,
        classic_escape,
        parse_classic,
    )

    # escaped wildcard -> literal (analyzed term, not a WildcardQuery)
    assert parse_classic(r"data\*") == TermQuery("data")
    assert parse_classic("data*") == PrefixQuery("data")
    # escaped tilde -> no fuzzy; escaped caret -> no boost
    assert parse_classic(r"merge\~1") != parse_classic("merge~1")
    assert isinstance(parse_classic("merge~1"), FuzzyQuery)
    assert parse_classic(r"merge\^2") != TermQuery("merge", boost=2.0)
    assert parse_classic("merge^2") == TermQuery("merge", boost=2.0)
    # escaped colon in a keyword value reaches the term verbatim
    assert parse_classic(r"role:a\:b") == TermQuery("role\x1fa:b", "role")
    # escaped space joins one keyword value
    assert parse_classic(r"role:user\ admin") == \
        TermQuery("role\x1fuser admin", "role")
    # escaped parens don't open groups
    q = parse_classic(r"\(merge\)")
    assert q == TermQuery("merge")
    # \uXXXX unicode escape decodes (discardEscapeChar)
    assert parse_classic("\\u006derge") == TermQuery("merge")
    # escape() round-trip: syntax chars become literal text; the standard
    # analyzer then tokenizes the literal string
    esc = classic_escape('c++ (merge)')
    assert esc == r"c\+\+ \(merge\)"
    q = parse_classic(esc)
    assert isinstance(q, (BooleanQuery, TermQuery))
    terms = ([c.query.term for c in q.clauses]
             if isinstance(q, BooleanQuery) else [q.term])
    assert terms == ["c", "merge"]
    # a\*b* : escaped star literal, trailing star = prefix over "a*b"
    assert parse_classic(r"a\*b*") == PrefixQuery("a*b")
    # both wildcards unescaped -> wildcard query keeps the escape form
    assert isinstance(parse_classic(r"a*b?"), WildcardQuery)
    # phrases still parse around escapes
    assert parse_classic('"the data"') == PhraseQuery(("the", "data"))


def test_classic_boolean_operators():
    """AND/OR/NOT/&&/||/! with QueryParserBase.addClause flip semantics,
    both default operators."""
    from lucene_ray.search.query import (
        MUST,
        MUST_NOT,
        SHOULD,
        parse_classic,
    )

    def occurs(q):
        return [c.occur for c in q.clauses]

    assert occurs(parse_classic("merge AND join")) == [MUST, MUST]
    assert occurs(parse_classic("merge && join")) == [MUST, MUST]
    assert occurs(parse_classic("merge OR join")) == [SHOULD, SHOULD]
    assert occurs(parse_classic("merge NOT join")) == [SHOULD, MUST_NOT]
    assert occurs(parse_classic("!merge join")) == [MUST_NOT, SHOULD]
    # AND flips the PREVIOUS clause; OR (default OR) leaves it required
    assert occurs(parse_classic("a AND b OR c")) == [MUST, MUST, SHOULD]
    # AND NOT: previous required, current prohibited
    assert occurs(parse_classic("a AND NOT b")) == [MUST, MUST_NOT]
    # lowercase and/or are ordinary terms
    q = parse_classic("merge and join")
    assert [c.query.term for c in q.clauses] == ["merge", "and", "join"]
    # default_operator="AND": bare terms are required, OR makes optional
    assert occurs(parse_classic("a b", default_operator="AND")) == \
        [MUST, MUST]
    assert occurs(parse_classic("a OR b", default_operator="AND")) == \
        [SHOULD, SHOULD]


def test_classic_string_ranges(ray_session, tmp_path_factory):
    """Non-numeric range bounds -> TermRangeQuery (getRangeQuery): text
    dictionary ranges and keyword-field namespaced ranges."""
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import TermRangeQuery, parse_classic
    from lucene_ray.search.searcher import IndexSearcher
    from lucene_ray.sources.transcripts import synth_transcripts

    q = parse_classic("text:[merge TO sort]")
    assert q == TermRangeQuery("merge", "sort")
    q2 = parse_classic("role:{admin TO user}")
    assert q2 == TermRangeQuery("role\x1fadmin", "role\x1fuser",
                                include_lower=False, include_upper=False,
                                field="role")

    t = synth_transcripts(800, seed=5)
    d = str(tmp_path_factory.mktemp("trange"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=300,
                keyword_cols=("role",), input_desc="trange")
    s = IndexSearcher(d)
    # text range vs brute force over the analyzed corpus
    from lucene_ray.analysis.standard import analyze

    texts = t.column("text").to_pylist()
    want = sum(1 for x in texts
               if any("merge" <= tok <= "sort" for tok in analyze(x or "")))
    assert s.count(q) == want
    # keyword range: roles within ["assistant", "tool"] bounds
    roles = t.column("role").to_pylist()
    qk = parse_classic("role:[assistant TO tool]")
    want_k = sum(1 for r in roles if "assistant" <= r <= "tool")
    assert s.count(qk) == want_k


def test_classic_fielded_groups(ray_session, tmp_path_factory):
    """`f:(a b)` field grouping: the field applies to every group member;
    keyword fields take raw values, the default field analyzes normally."""
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import (
        MUST,
        SHOULD,
        TermQuery,
        parse_classic,
    )
    from lucene_ray.search.searcher import IndexSearcher
    from lucene_ray.sources.transcripts import synth_transcripts

    q = parse_classic("role:(user admin)")
    assert [c.query for c in q.clauses] == \
        [TermQuery("role\x1fuser", "role"), TermQuery("role\x1fadmin", "role")]
    q2 = parse_classic("text:(merge AND join)")
    assert [(c.query.term, c.occur) for c in q2.clauses] == \
        [("merge", MUST), ("join", MUST)]
    # signs inside the group
    q3 = parse_classic("role:(+user -tool)")
    assert [c.occur for c in q3.clauses] == [MUST, "MUST_NOT"]

    t = synth_transcripts(600, seed=7)
    d = str(tmp_path_factory.mktemp("fgrp"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=300,
                keyword_cols=("role",), input_desc="fgrp")
    s = IndexSearcher(d)
    roles = t.column("role").to_pylist()
    want = sum(1 for r in roles if r in ("user", "assistant"))
    assert s.count(parse_classic("role:(user assistant)")) == want


def test_classic_bare_fuzzy_and_matchall():
    """`term~` (fuzzyMinSim 2.0), float similarity via floatToEdits, and
    the `*:*` match-all (QueryParserBase.handleBareFuzzy semantics)."""
    from lucene_ray.search.query import (
        FuzzyQuery,
        MatchAllDocsQuery,
        parse_classic,
    )

    assert parse_classic("merge~") == FuzzyQuery("merge", max_edits=2)
    assert parse_classic("xyz~0.8") == FuzzyQuery("xyz", max_edits=0)
    assert parse_classic("merge~0.5") == FuzzyQuery("merge", max_edits=2)
    assert parse_classic("merge~0.0") == FuzzyQuery("merge", max_edits=0)
    assert parse_classic("merge~1^3") == FuzzyQuery("merge", max_edits=1,
                                                    boost=3.0)
    assert parse_classic("*:*") == MatchAllDocsQuery()


def test_classic_regexp_terms(ray_session, tmp_path_factory):
    """Classic /regexp/ terms (REGEXPTERM): default-field and fielded
    (keyword-namespaced) forms + float phrase slop truncation."""
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import PhraseQuery, RegexpQuery, parse_classic
    from lucene_ray.search.searcher import IndexSearcher
    from lucene_ray.sources.transcripts import synth_transcripts

    assert parse_classic("/ab.c/") == RegexpQuery("ab.c")
    assert parse_classic("role:/us.r/") == RegexpQuery("role\x1fus.r", "role")
    assert parse_classic('"merge join"~2.5') == \
        PhraseQuery(("merge", "join"), slop=2)

    t = synth_transcripts(600, seed=9)
    d = str(tmp_path_factory.mktemp("rx"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=300,
                keyword_cols=("role",), input_desc="rx")
    s = IndexSearcher(d)
    texts = t.column("text").to_pylist()
    assert s.count(parse_classic("/mer.e/")) == \
        sum(1 for x in texts if "merge" in (x or ""))
    roles = t.column("role").to_pylist()
    assert s.count(parse_classic("role:/us.r/")) == \
        sum(1 for r in roles if r == "user")


def test_classic_escape_fuzz():
    """Property: parse_classic(classic_escape(s)) always equals the plain
    free-text SHOULD-of-analyzed-terms of s (no syntax survives escaping),
    over random strings dense in grammar metacharacters."""
    import random

    from lucene_ray.analysis.standard import analyze
    from lucene_ray.search.query import (
        BooleanQuery,
        TermQuery,
        classic_escape,
        parse_classic,
    )

    rng = random.Random(42)
    alphabet = 'ab1 +-!():^[]"{}~*?|&/\\.'
    for _ in range(300):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 24)))
        q = parse_classic(classic_escape(s))
        want = analyze(s)
        if not want:
            assert q == BooleanQuery(())
        elif len(want) == 1:
            assert q == TermQuery(want[0]), (s, q)
        else:
            assert isinstance(q, BooleanQuery), (s, q)
            assert [c.query.term for c in q.clauses] == want, (s, q)
            assert all(c.occur == "SHOULD" for c in q.clauses)
