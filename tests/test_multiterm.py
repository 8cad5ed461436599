"""MultiTermQuery expansions (prefix / wildcard / regexp / fuzzy) with
constant-score rewrite, vs brute-force dictionary + postings scans."""

import numpy as np
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.search.query import FuzzyQuery, PrefixQuery, RegexpQuery, WildcardQuery
from lucene_ray.search.searcher import IndexSearcher, _levenshtein_leq
from lucene_ray.sources.transcripts import synth_transcripts


@pytest.fixture(scope="module")
def setup(ray_session, tmp_path_factory):
    import pyarrow as pa

    import lucene_ray.analysis.standard as std
    import ray.data as rd

    t = synth_transcripts(1500, seed=9)
    d = str(tmp_path_factory.mktemp("mtidx"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=400, input_desc="mt")
    t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    tokens = [std.analyze(x) if x else [] for x in t.column("text").to_pylist()]
    return IndexSearcher(d), tokens


def _brute_docs(tokens, pred):
    return sorted(d for d, toks in enumerate(tokens) if any(pred(t) for t in toks))


def test_levenshtein():
    assert _levenshtein_leq("kitten", "sitting", 3)
    assert not _levenshtein_leq("kitten", "sitting", 2)
    assert _levenshtein_leq("abc", "abc", 0)
    assert _levenshtein_leq("abc", "abd", 1)
    assert not _levenshtein_leq("abcdef", "fedcba", 2)


def test_prefix_query(setup):
    s, tokens = setup
    td = s.search(PrefixQuery("rareterm00"), k=1000)
    want = _brute_docs(tokens, lambda t: t.startswith("rareterm00"))
    assert [h.gid for h in td.hits] == want
    assert all(h.score == 1.0 for h in td.hits)
    assert td.total_hits == len(want)


def test_wildcard_query(setup):
    s, tokens = setup
    td = s.search(WildcardQuery("qu*y"), k=1000)
    import re
    pat = re.compile(r"qu.*y")
    want = _brute_docs(tokens, lambda t: bool(pat.fullmatch(t)))
    assert [h.gid for h in td.hits] == want
    td2 = s.search(WildcardQuery("dat?"), k=1000)
    pat2 = re.compile(r"dat.")
    want2 = _brute_docs(tokens, lambda t: bool(pat2.fullmatch(t)))
    assert [h.gid for h in td2.hits] == want2


def test_regexp_query(setup):
    s, tokens = setup
    import re
    td = s.search(RegexpQuery("rareterm0[01]2."), k=1000)
    pat = re.compile("rareterm0[01]2.")
    want = _brute_docs(tokens, lambda t: bool(pat.fullmatch(t)))
    assert [h.gid for h in td.hits] == want


def test_fuzzy_query(setup):
    s, tokens = setup
    # constant-score rewrite keeps the flat docID-ordered hit list
    td = s.search(FuzzyQuery("quera", max_edits=1,
                             rewrite="constant_score"), k=1000)
    want = _brute_docs(tokens, lambda t: _levenshtein_leq(t, "quera", 1))
    assert [h.gid for h in td.hits] == want
    # the default blended rewrite scores the SAME match set (the top-50
    # cap is not binding on this corpus)
    td_b = s.search(FuzzyQuery("quera", max_edits=1), k=1000)
    assert sorted(h.gid for h in td_b.hits) == want
    # prefix_length constrains the expansion
    td2 = s.search(FuzzyQuery("query", max_edits=2, prefix_length=5,
                              rewrite="constant_score"), k=1000)
    want2 = _brute_docs(tokens, lambda t: t.startswith("query") and _levenshtein_leq(t, "query", 2))
    assert [h.gid for h in td2.hits] == want2


def test_fuzzy_transpositions():
    """FuzzyQuery.defaultTranspositions: an adjacent swap counts ONE edit
    (LevenshteinAutomata withTranspositions=true); plain Levenshtein counts
    two."""
    from lucene_ray.search.searcher import _edit_distance

    assert _levenshtein_leq("mreged", "merged", 1, True)
    assert not _levenshtein_leq("mreged", "merged", 1, False)
    assert _edit_distance("mreged", "merged", True) == 1
    assert _edit_distance("mreged", "merged", False) == 2
    # non-adjacent swaps still cost two
    assert not _levenshtein_leq("dcb", "bcd", 1, True)
    assert _edit_distance("dcb", "bcd", True) == 2


def test_fuzzy_transpositions_e2e(setup):
    s, tokens = setup
    # 'josn' ~1 matches 'join'? no (substitute+substitute) — but a term
    # whose transposition exists in the corpus must match at maxEdits=1
    # under the default and NOT with transpositions=False
    base = next(t for toks in tokens for t in toks
                if len(t) >= 5 and t[0] != t[1])
    swapped = base[1] + base[0] + base[2:]
    assert swapped != base
    q_on = FuzzyQuery(swapped, max_edits=1)
    q_off = FuzzyQuery(swapped, max_edits=1, transpositions=False)
    on_terms = {v for _, v in s._fuzzy_top_terms(q_on)}
    assert base in on_terms
    off_terms = {v for _, v in s._fuzzy_top_terms(q_off)}
    assert base not in off_terms


def test_fuzzy_blended_scoring(setup):
    """TopTermsBlendedFreqScoringRewrite parity: the default FuzzyQuery
    scores EXACTLY like a SHOULD-sum of per-variant-boosted TermQuerys
    whose docFreq is forced to the set's max (BlendedTermQuery
    adjustFrequencies + BOOLEAN_REWRITE)."""
    from lucene_ray.search.query import TermQuery, bool_query

    s, tokens = setup
    q = FuzzyQuery("quera", max_edits=1)
    kept = s._fuzzy_top_terms(q)
    assert kept, "expansion found no variants"
    # FuzzyTermsEnum boost formula
    from lucene_ray.search.searcher import _edit_distance

    for b, v in kept:
        ed = _edit_distance(v, "quera")
        expect = 1.0 if ed == 0 else 1.0 - ed / min(len(v), len("quera"))
        assert b == expect
    td = s.search(q, k=1000)
    # equivalent flat boolean with df monkeypatched to the blended max
    vset = {v for _, v in kept}
    df_max = max(s.df(v) for v in vset)
    orig_df = s.df
    s.df = lambda t: df_max if t in vset else orig_df(t)
    try:
        twin = bool_query(should=[TermQuery(v, boost=b) for b, v in kept])
        td2 = s.search(twin, k=1000)
    finally:
        s.df = orig_df
    assert [(h.gid, h.score) for h in td.hits] == \
        [(h.gid, h.score) for h in td2.hits]
    # count() agrees with the scored match set and consults no stats
    assert s.count(q) == td.total_hits


def test_expansion_without_global_dictionary(setup):
    """Round-2 scale fix: multi-term expansion and suggest must work without
    the driver ever materializing the full term dictionary — only per-term
    stat-bucket loads are allowed."""
    from lucene_ray.search.query import PrefixQuery, WildcardQuery, FuzzyQuery
    from lucene_ray.search.searcher import IndexSearcher, suggest

    s0, _ = setup
    s = IndexSearcher(s0.index_dir)

    def no_load(*a, **k):
        raise AssertionError("full stats load attempted during expansion")

    # expansion paths never consult global stats at all
    s._stats_bucket = no_load
    assert s.count(PrefixQuery("qu")) > 0
    assert s.count(WildcardQuery("que*")) > 0
    assert s.count(FuzzyQuery("querz", max_edits=1)) > 0
    got = suggest(s, "que", k=5)
    assert got and all(t.startswith("que") for t, _ in got)


def test_stats_buckets_lazy_and_correct(setup):
    """df() loads only the bucket a term hashes to, and matches the full
    stats table."""
    import glob
    import os

    import pyarrow.parquet as pq

    from lucene_ray.search.searcher import IndexSearcher

    s0, _ = setup
    index_dir = s0.index_dir
    files = glob.glob(os.path.join(index_dir, "term_stats", "bucket-*.parquet"))
    assert len(files) > 1              # hash-partitioned layout
    full = {}
    for p in files:
        t = pq.read_table(p, columns=["term", "df"])
        full.update(zip(t.column("term").to_pylist(), t.column("df").to_numpy()))
    s = IndexSearcher(index_dir)
    for term in ["query", "data", "merge", "nonexistenttermxyz"]:
        assert s.df(term) == int(full.get(term, 0))
    # only the buckets actually touched are resident
    assert len(s._stats) <= 4


def test_term_in_set_query(setup):
    """TermInSetQuery: constant-score union, equals the equivalent
    const-score SHOULD union; absent terms ignored; FILTER position works."""
    import numpy as np

    from lucene_ray.search.query import TermInSetQuery, bool_query

    s, tokens = setup
    q = TermInSetQuery(("merge", "join", "zzzabsent"))
    want = sum(1 for t in tokens if t and ({"merge", "join"} & set(t)))
    assert s.count(q) == want
    td = s.search(q, k=5)
    assert all(abs(h.score - 1.0) < 1e-6 for h in td.hits)
    # FILTER position: with a required MUST clause the set restricts it;
    # (with only SHOULD, the filter alone defines the match set — SHOULD
    # is optional once a required clause exists, Boolean semantics)
    both = s.count(bool_query(must=["data"], filter_=[q]))
    want_b = sum(1 for t in tokens
                 if t and "data" in t and ({"merge", "join"} & set(t)))
    assert both == want_b
    assert s.count(bool_query(should=["data"], filter_=[q])) == want
