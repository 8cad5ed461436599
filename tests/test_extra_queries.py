"""DisjunctionMaxQuery / BoostQuery / ConstantScoreQuery vs brute force."""

import numpy as np
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.search.query import (
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    PhraseQuery,
    TermQuery,
    bool_query,
)
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.sources.transcripts import synth_transcripts
from lucene_ray.util.smallfloat import LENGTH_TABLE, int_to_byte4


@pytest.fixture(scope="module")
def setup(ray_session, tmp_path_factory):
    import ray.data as rd

    import lucene_ray.analysis.standard as std

    t = synth_transcripts(1800, seed=77)
    d = str(tmp_path_factory.mktemp("exq"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=500, input_desc="exq")
    t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    tokens = [std.analyze(x) if x else [] for x in t.column("text").to_pylist()]
    return IndexSearcher(d), tokens


def _term_scores(s, tokens, term, boost=1.0):
    df = sum(term in set(t) for t in tokens)
    if df == 0:
        return {}
    N = sum(1 for t in tokens if t)
    sum_ttf = sum(len(t) for t in tokens)
    idf = np.float32(np.log(1 + (N - df + 0.5) / (df + 0.5)))
    w = np.float32(boost) * idf
    avgdl = np.float32(sum_ttf / float(N))
    one = np.float32(1.0)
    out = {}
    for d, toks in enumerate(tokens):
        f = toks.count(term)
        if f:
            ln = LENGTH_TABLE[int(int_to_byte4(len(toks)))]
            ninv = one / (np.float32(1.2) * ((one - np.float32(0.75)) + np.float32(0.75) * ln / avgdl))
            out[d] = w - w / (one + np.float32(f) * ninv)
    return out


def test_dismax(setup):
    s, tokens = setup
    q = DisjunctionMaxQuery((TermQuery("query"), TermQuery("data")), tie_breaker=0.3)
    td = s.search(q, k=15)
    s1 = _term_scores(s, tokens, "query")
    s2 = _term_scores(s, tokens, "data")
    want = {}
    tie = np.float32(0.3)
    for d in set(s1) | set(s2):
        a = s1.get(d, np.float32(0))
        b = s2.get(d, np.float32(0))
        mx = max(a, b)
        want[d] = float(mx + tie * ((a + b) - mx))
    ranked = sorted(want.items(), key=lambda x: (-x[1], x[0]))[:15]
    assert [(h.gid, h.score) for h in td.hits] == [(d, v) for d, v in ranked]
    assert s.count(q) == len(want)


def test_boost_query(setup):
    s, tokens = setup
    plain = s.search(TermQuery("query"), k=10)
    boosted = s.search(BoostQuery(TermQuery("query"), 2.5), k=10)
    assert [h.gid for h in boosted.hits] == [h.gid for h in plain.hits]
    for hb, hp in zip(boosted.hits, plain.hits):
        want = _term_scores(s, tokens, "query", boost=2.5)[hb.gid]
        assert np.float32(hb.score) == np.float32(want)
    # nested boost through a boolean query
    bq = BoostQuery(bool_query(should=["query", "data"]), 3.0)
    td = s.search(bq, k=5)
    assert td.hits[0].score > s.search(bool_query(should=["query", "data"]), k=5).hits[0].score


def test_constant_score(setup):
    s, tokens = setup
    inner = bool_query(must=["merge", "join"])
    td = s.search(ConstantScoreQuery(inner, boost=2.0), k=4000)
    want = sorted(d for d, t in enumerate(tokens)
                  if "merge" in t and "join" in t)
    assert [h.gid for h in td.hits] == want
    assert all(h.score == 2.0 for h in td.hits)
    assert td.total_hits == len(want)
    # constant score over a phrase
    td2 = s.search(ConstantScoreQuery(PhraseQuery(("query", "data"))), k=4000)
    want2 = sorted(d for d, t in enumerate(tokens)
                   if any(t[i:i + 2] == ["query", "data"] for i in range(len(t) - 1)))
    assert [h.gid for h in td2.hits] == want2


def test_suggest(setup):
    from lucene_ray.search.searcher import suggest

    s, tokens = setup
    out = suggest(s, "quer", k=5)
    assert out and out[0][0] == "query"
    want_ttf = sum(t.count("query") for t in tokens)
    assert out[0][1] == want_ttf
    # weight-desc, term-asc deterministic order
    assert all(out[i][1] >= out[i + 1][1] for i in range(len(out) - 1))
    assert suggest(s, "zzznope") == []


def test_synonym_query(setup):
    from lucene_ray.search.query import SynonymQuery

    s, tokens = setup
    terms = ("query", "data")
    boosts = (1.0, 0.5)
    td = s.search(SynonymQuery(terms, boosts), k=15)
    # brute force: pseudo df = max df, blended freq = sum(boost*freq) f32
    N = sum(1 for t in tokens if t)
    sum_ttf = sum(len(t) for t in tokens)
    dfs = [sum(t_ in set(tk) for tk in tokens) for t_ in terms]
    df = max(dfs)
    idf = np.float32(np.log(1 + (N - df + 0.5) / (df + 0.5)))
    avgdl = np.float32(sum_ttf / float(N))
    one = np.float32(1.0)
    want = {}
    for d, tk in enumerate(tokens):
        f = np.float32(0.0)
        for t_, b_ in zip(terms, boosts):
            c = tk.count(t_)
            if c:
                f = f + np.float32(b_) * np.float32(c)
        if f > 0:
            ln = LENGTH_TABLE[int(int_to_byte4(len(tk)))]
            ninv = one / (np.float32(1.2) * ((one - np.float32(0.75)) + np.float32(0.75) * ln / avgdl))
            want[d] = float(idf - idf / (one + f * ninv))
    ranked = sorted(want.items(), key=lambda x: (-x[1], x[0]))[:15]
    assert [(h.gid, h.score) for h in td.hits] == ranked
    assert td.total_hits == len(want)


def test_blended_term_query(setup):
    """BlendedTermQuery: every term scored with the shared max df, DisMax
    tie=0.01 combination — verified against a hand-computed oracle."""
    import numpy as np

    from lucene_ray.search.query import BlendedTermQuery
    from lucene_ray.search.similarity import BM25Similarity

    s, tokens = setup
    q = BlendedTermQuery(("merge", "join"))
    td = s.search(q, k=30, total_hits_threshold=2**31 - 1)
    assert td.total_hits > 0
    sim = BM25Similarity()
    df_max = max(s.df("merge"), s.df("join"))
    sc_m = sim.scorer(1.0, s.doc_count, s.sum_ttf, df_max)
    sc_j = sim.scorer(1.0, s.doc_count, s.sum_ttf, df_max)
    # oracle for a few hits: max + 0.01 * (sum - max) over per-term scores
    for h in td.hits[:10]:
        toks = tokens[h.gid]
        parts = []
        for t, sc in (("merge", sc_m), ("join", sc_j)):
            f = toks.count(t)
            if f:
                pid = s._pid_of(h.gid)
                rdr = s.reader(pid)
                local = h.gid - s._bases[pid]
                parts.append(float(sc.score(np.array([f], np.float32),
                                            rdr.norms[local:local + 1])[0]))
        expect = max(parts) + 0.01 * (sum(parts) - max(parts))
        assert abs(h.score - np.float32(expect)) < 1e-5


# --- NGramPhraseQuery (round 3) -------------------------------------------

def test_ngram_phrase_query(ray_session, tmp_path_factory):
    """On n-gram token streams the sparse rewrite (every n-th gram + last,
    pinned at original positions) matches exactly the docs the full
    consecutive phrase matches."""
    import string

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import NGramPhraseQuery, PhraseQuery
    from lucene_ray.search.searcher import IndexSearcher

    rng = np.random.default_rng(42)
    N_GRAM = 2
    strings = ["".join(rng.choice(list(string.ascii_lowercase[:6]),
                                  size=rng.integers(5, 15)))
               for _ in range(300)]
    # token stream of a string = its overlapping character n-grams
    texts = [" ".join(s[i:i + N_GRAM] for i in range(len(s) - N_GRAM + 1))
             for s in strings]
    t = pa.table({
        "conv_id": pa.array([f"c{i:04d}" for i in range(len(texts))]),
        "turn_idx": pa.array([0] * len(texts), type=pa.int32()),
        "text": pa.array(texts),
    })
    d = str(tmp_path_factory.mktemp("ngpidx"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=100,
                input_desc="ngp")
    s = IndexSearcher(d)

    checked = 0
    for src in strings[:40]:
        if len(src) < 6:
            continue
        sub = src[1:6]                                # 5-char substring
        grams = tuple(sub[i:i + N_GRAM] for i in range(len(sub) - N_GRAM + 1))
        full = PhraseQuery(grams)
        ngp = NGramPhraseQuery(N_GRAM, full)
        th = 2**31 - 1
        a = s.search(full, k=300, total_hits_threshold=th)
        b = s.search(ngp, k=300, total_hits_threshold=th)
        want = {i for i, st in enumerate(strings) if sub in st}
        assert {h.gid for h in a.hits} == want, sub
        assert {h.gid for h in b.hits} == want, sub
        assert b.total_hits == a.total_hits
        checked += 1
    assert checked >= 30

    # non-optimizable shapes degrade to the plain phrase
    short = NGramPhraseQuery(N_GRAM, PhraseQuery(("ab", "bc")))
    assert short.rewrite() == PhraseQuery(("ab", "bc"))
    sloppy = NGramPhraseQuery(N_GRAM, PhraseQuery(("ab", "bc", "cd"), slop=1))
    assert sloppy.rewrite() == PhraseQuery(("ab", "bc", "cd"), slop=1)


def test_search_timeout_partial_results(ray_session):
    """IndexSearcher timeout (TimeLimitingCollector model): an expired
    budget skips remaining shards and returns a flagged PARTIAL result;
    a generous budget returns the full result unflagged."""
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import IndexSearcher
    from lucene_ray.sources.transcripts import synth_transcripts

    import tempfile

    t = synth_transcripts(2000, seed=77)
    st = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    d = tempfile.mkdtemp(prefix="toidx")
    build_index(rd.from_arrow(st), d, target_docs_per_partition=400,
                input_desc="timeout")
    s = IndexSearcher(d)
    assert len(s._pids) >= 2, "timeout semantics need multiple shards"
    full = s.search(TermQuery("merge"), k=10)
    quick = s.search(TermQuery("merge"), k=10, timeout_ms=0)
    assert quick.timed_out
    assert quick.relation == "GREATER_THAN_OR_EQUAL_TO"
    # at least the first shard was searched; totals are a lower bound
    assert 0 < quick.total_hits <= full.total_hits
    relaxed = s.search(TermQuery("merge"), k=10, timeout_ms=60_000)
    assert not relaxed.timed_out
    assert relaxed.total_hits == full.total_hits
    assert [h.gid for h in relaxed.hits] == [h.gid for h in full.hits]


def test_multi_field_sort_and_paging(ray_session):
    """Sort over SortField[]: lexicographic N-key order with docID tie, and
    FieldDoc paging concatenation == one deep page."""
    from lucene_ray.pipelines.flagship import build_transcript_index
    from lucene_ray.search.query import SortField, TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    s = IndexSearcher(build_transcript_index("/root/testdata/sf0.001"))
    sorts = [SortField("turn_idx"), SortField("ts", reverse=True)]
    q = TermQuery("merge")
    deep = s.search(q, k=20, sort=sorts)
    # brute force over all matches
    every = s.search(q, k=10 ** 6, total_hits_threshold=2 ** 31 - 1)
    rows = sorted(
        ((h.turn_idx, -(1_700_000_000_000_000
                        + (int(h.conv_id.split("-")[1]) * 5 + h.turn_idx)
                        * 1_000_000), h.gid) for h in every.hits))
    assert [(h.fields[0], -r[1], h.gid) for h, r in zip(deep.hits, rows)] == \
        [(r[0], -r[1], r[2]) for r in rows[:20]]
    # paging: two pages of 10 == the deep page
    p1 = s.search(q, k=10, sort=sorts)
    cursor = (p1.hits[-1].fields, p1.hits[-1].gid)
    p2 = s.search(q, k=10, sort=sorts, after=cursor)
    assert [h.gid for h in p1.hits + p2.hits] == [h.gid for h in deep.hits]
    # single-element list delegates to the single-field path
    one = s.search(q, k=5, sort=[SortField("ts", reverse=True)])
    base = s.search(q, k=5, sort=SortField("ts", reverse=True))
    assert [h.gid for h in one.hits] == [h.gid for h in base.hits]


def test_search_large_parity(setup):
    """LargeNumHitsTopDocsCollector: identical hits/order to ordinary
    search at the same k, exact totalHits, and full-corpus k works."""
    s, tokens = setup
    q = bool_query(should=["merge", "join"])
    want = s.search(q, k=500, total_hits_threshold=2**31 - 1)
    got = s.search_large(q, k=500)
    assert got.total_hits == want.total_hits
    assert got.relation == "EQUAL_TO"
    assert [(h.gid, h.score) for h in got.hits] == \
        [(h.gid, h.score) for h in want.hits]
    # requesting more hits than match returns them all
    big = s.search_large(q, k=10**6)
    assert len(big.hits) == big.total_hits == want.total_hits
    import pytest as _pytest
    with _pytest.raises(ValueError):
        s.search_large(q, k=0)


def test_ngram_phrase_rewrite_reference_vectors():
    """TestNGramPhraseQuery.testRewrite: AB/BC stays whole; ABCD and the
    tri-gram chain drop redundant inner grams keeping sparse positions."""
    from lucene_ray.search.query import NGramPhraseQuery, PhraseQuery

    rw1 = NGramPhraseQuery(2, PhraseQuery(("ab", "bc"))).rewrite()
    assert rw1 == PhraseQuery(("ab", "bc"))
    rw2 = NGramPhraseQuery(2, PhraseQuery(("ab", "bc", "cd"))).rewrite()
    assert rw2 == (("ab", "cd"), (0, 2))
    rw3 = NGramPhraseQuery(
        3, PhraseQuery(("abc", "bcd", "cde", "def", "efg", "fgh"))).rewrite()
    assert rw3 == (("abc", "def", "fgh"), (0, 3, 5))
