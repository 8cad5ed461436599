"""FuzzyLikeThisQuery (sandbox/queries/FuzzyLikeThisQuery.java): variant
selection, source-df IDF sharing, artificial df=1 scoring, ignore_tf path —
vs an independent oracle over the same dictionary."""

import math

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def searcher(ray_session):
    from lucene_ray.pipelines.flagship import build_transcript_index
    from lucene_ray.search.searcher import IndexSearcher

    return IndexSearcher(build_transcript_index(SF))


def _lev(a, b):
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i]
        for j in range(1, lb + 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (a[i - 1] != b[j - 1])))
        prev = cur
    return prev[lb]


def _oracle_selected(searcher, strings, max_edits, prefix_length,
                     max_num_terms):
    """Independent reimplementation of the selection pipeline (shares only
    the shard dictionaries with the engine)."""
    from lucene_ray.analysis.standard import analyze
    from lucene_ray.index.shard import KEYWORD_SEP

    # full merged dictionary
    vocab = set()
    for pid in searcher._pids:
        vocab.update(t for t in searcher.reader(pid)._term_np
                     if KEYWORD_SEP not in t)
    n_docs = searcher.doc_count
    out = []
    for qs in strings:
        seen = set()
        for term in analyze(qs):
            if term in seen:
                continue
            seen.add(term)
            pre = term[:prefix_length]
            variants = [v for v in vocab
                        if v.startswith(pre)
                        and _lev(v, term) <= max_edits]
            if not variants:
                continue
            scored = sorted(
                ((1.0 if _lev(v, term) == 0
                  else 1.0 - _lev(v, term) / min(len(v), len(term)), v)
                 for v in variants), key=lambda sv: (-sv[0], sv[1]))[:50]
            df = searcher.df(term)
            if df == 0:
                df = sum(searcher.df(v) for v in variants) // len(variants)
            idf = math.log((n_docs + 1) / (df + 1)) + 1.0
            out.extend((s * s * idf, v) for s, v in scored)
    out.sort(key=lambda sv: (-sv[0], sv[1]))
    return out[:max_num_terms]


def test_selection_matches_oracle(searcher):
    from lucene_ray.search.query import FuzzyLikeThisQuery

    q = FuzzyLikeThisQuery((("merge vectr", 1, 1),), max_num_terms=10)
    compiled = searcher._compile_fuzzy_like_this(q)
    got = [(t, np.float32(sc.weight)) for t, sc, _ in compiled["scoring"]]
    expect = _oracle_selected(searcher, ["merge vectr"], 1, 1, 10)
    assert [t for t, _w in got] == [v for _s, v in expect]
    # weights carry boost * BM25 weight with df=1 — check boosts via ratio:
    # weight(s) = s * base where base is the same artificial-stats factor
    base = searcher.sim.scorer(1.0, searcher.doc_count, searcher.sum_ttf,
                               1, ttf=1).weight
    for (t, w), (s, _v) in zip(got, expect):
        assert w == pytest.approx(np.float32(s) * np.float32(base), rel=1e-5)


def test_misspelling_matches_and_ranks(searcher):
    """'vectr' (not a corpus term) still retrieves docs containing 'vector'
    through its fuzzy variant, with the source-term-df idf."""
    from lucene_ray.search.query import FuzzyLikeThisQuery, TermQuery

    q = FuzzyLikeThisQuery((("vectr", 2, 0),), max_num_terms=25)
    td = searcher.search(q, k=10)
    assert td.total_hits > 0
    direct = searcher.search(TermQuery("vector"), k=10 ** 6,
                             total_hits_threshold=2 ** 31 - 1)
    # every doc containing 'vector' must be a candidate of the FLT query
    cand = searcher.search(q, k=10 ** 6,
                           total_hits_threshold=2 ** 31 - 1)
    got_gids = {h.gid for h in cand.hits}
    assert {h.gid for h in direct.hits} <= got_gids


def test_ignore_tf_constant_scores(searcher):
    """ignore_tf: a doc's score is the SUM of its matched variants' boosts,
    independent of term frequency."""
    from lucene_ray.search.query import FuzzyLikeThisQuery

    q = FuzzyLikeThisQuery((("merge", 1, 1),), max_num_terms=5,
                           ignore_tf=True)
    compiled_scored = searcher._compile_fuzzy_like_this(
        FuzzyLikeThisQuery((("merge", 1, 1),), max_num_terms=5))
    boosts = {t: np.float32(0) for t, _s, _o in compiled_scored["scoring"]}
    expect = _oracle_selected(searcher, ["merge"], 1, 1, 5)
    td = searcher.search(q, k=20)
    assert td.total_hits > 0
    sel = dict((v, s) for s, v in expect)
    for h in td.hits:
        # recompute: sum of boosts of variants present in the doc
        doc_terms = set()
        pid = searcher._pid_of(h.gid)
        rdr = searcher.reader(pid)
        local = h.gid - searcher._bases[pid]
        for v in sel:
            tid = rdr.seek_exact(v)
            if tid >= 0:
                docs, _f = rdr.postings(tid)
                i = int(np.searchsorted(docs, local))
                if i < len(docs) and docs[i] == local:
                    doc_terms.add(v)
        want = np.float32(sum(np.float32(sel[v]) for v in sorted(doc_terms)))
        assert np.float32(h.score) == pytest.approx(want, rel=1e-4)
    assert boosts is not None


def test_no_variants_matches_nothing(searcher):
    from lucene_ray.search.query import FuzzyLikeThisQuery

    q = FuzzyLikeThisQuery((("qqqqqqqqqqqqqq", 1, 3),))
    td = searcher.search(q, k=5)
    assert td.total_hits == 0
