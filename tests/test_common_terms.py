"""CommonTermsQuery: df-split rewrite vs the hand-built boolean equivalent
(`queries/src/java/org/apache/lucene/queries/CommonTermsQuery.java:116-189`)."""

import math

import pytest

from lucene_ray.index.build import build_index
from lucene_ray.search.query import (
    MUST,
    SHOULD,
    BooleanClause,
    BooleanQuery,
    CommonTermsQuery,
    TermQuery,
)
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.sources.transcripts import synth_transcripts


@pytest.fixture(scope="module")
def setup(ray_session, tmp_path_factory):
    import ray.data as rd

    t = synth_transcripts(1800, seed=78)
    d = str(tmp_path_factory.mktemp("ctq"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=500,
                input_desc="ctq")
    return IndexSearcher(d)


def _hits(s, q, k=30):
    td = s.search(q, k=k)
    return [(h.gid, round(h.score, 6)) for h in td.hits], td.total_hits


def test_split_matches_manual_boolean(setup):
    s = setup
    terms = ("the", "data", "merge", "join")   # dfs ~91/44/34/32% of maxDoc
    dfs = {t: s.df(t) for t in terms}
    max_doc = int(s.commit["doc_count"])
    cut = math.ceil(0.4 * max_doc)             # CommonTermsQuery.java:155
    low = [t for t in terms if dfs[t] <= cut]
    high = [t for t in terms if dfs[t] > cut]
    assert low and high                        # the fixture really mixes both

    q = CommonTermsQuery(terms, max_term_frequency=0.4)
    manual = BooleanQuery((
        BooleanClause(BooleanQuery(tuple(
            BooleanClause(TermQuery(t), SHOULD) for t in low)), MUST),
        BooleanClause(BooleanQuery(tuple(
            BooleanClause(TermQuery(t), SHOULD) for t in high)), SHOULD),
    ))
    assert _hits(s, q) == _hits(s, manual)


def test_all_low_freq_degrades_to_low_group(setup):
    s = setup
    q = CommonTermsQuery(("merge", "join"), max_term_frequency=1e9,
                         low_freq_occur=MUST)
    manual = BooleanQuery((BooleanClause(TermQuery("merge"), MUST),
                           BooleanClause(TermQuery("join"), MUST)))
    assert _hits(s, q) == _hits(s, manual)


def test_all_high_freq_degrades_to_high_group(setup):
    s = setup
    # absolute cutoff 1: every real term is "common"
    q = CommonTermsQuery(("the", "data"), max_term_frequency=1.0,
                         high_freq_msm=2)
    manual = BooleanQuery((BooleanClause(TermQuery("the"), SHOULD),
                           BooleanClause(TermQuery("data"), SHOULD)), 2)
    assert _hits(s, q) == _hits(s, manual)


def test_high_group_widens_recall_without_gating(setup):
    s = setup
    # low group alone bounds the hit set; adding common terms must not
    # shrink it (they only contribute score)
    low_only, n_low = _hits(s, TermQuery("merge"), k=200)
    _, n_both = _hits(s, CommonTermsQuery(("merge", "the"),
                                          max_term_frequency=0.4,
                                          low_freq_occur=MUST), k=200)
    assert n_both == n_low


def test_fractional_cutoff_uses_ceil(setup):
    """ADVICE r3 (low): df in (f*maxDoc, ceil(f*maxDoc)] is LOW-frequency
    (CommonTermsQuery.java:155 classifies high only when
    docFreq > ceil(maxTermFrequency * maxDoc))."""
    s = setup
    max_doc = int(s.commit["doc_count"])
    df = s.df("merge")
    assert df > 0
    # pick a fraction so f*maxDoc is just under df: without ceil the term
    # would flip to the high-frequency group
    f = (df - 0.5) / max_doc
    assert f * max_doc < df <= math.ceil(f * max_doc)
    q = CommonTermsQuery(("merge",), max_term_frequency=f, low_freq_occur=MUST)
    manual = BooleanQuery((BooleanClause(TermQuery("merge"), MUST),))
    assert _hits(s, q) == _hits(s, manual)
