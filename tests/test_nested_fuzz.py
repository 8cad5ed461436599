"""Randomized nested-BooleanQuery trees vs an independent brute-force
evaluator: match sets AND scores must agree exactly for arbitrary trees of
terms, phrases, and ranges under every occur flavor."""

import numpy as np
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.search.query import (
    FILTER,
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanClause,
    BooleanQuery,
    PhraseQuery,
    RangeQuery,
    TermQuery,
)
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.sources.transcripts import synth_transcripts

VOCAB = ["merge", "join", "sort", "scan", "data", "query", "the", "window",
         "batch", "customer"]


@pytest.fixture(scope="module")
def fuzz_index(ray_session, tmp_path_factory):
    import ray.data as rd

    import lucene_ray.analysis.standard as std

    t = synth_transcripts(2000, seed=91)
    d = str(tmp_path_factory.mktemp("fuzznest"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=700,
                docvalue_cols=("ts",), input_desc="fuzznest")
    ts_sorted = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    tokens = [std.analyze(x) if x else []
              for x in ts_sorted.column("text").to_pylist()]
    ts = ts_sorted.column("ts").cast("int64").to_numpy()
    return IndexSearcher(d), tokens, ts


def _brute(q, tokens, ts):
    """Pure-python matched-set evaluator (no engine code)."""
    n = len(tokens)
    if isinstance(q, TermQuery):
        return np.array([q.term in tk for tk in map(set, tokens)])
    if isinstance(q, PhraseQuery):
        out = np.zeros(n, dtype=bool)
        for i, tk in enumerate(tokens):
            out[i] = any(tuple(tk[j:j + len(q.terms)]) == tuple(q.terms)
                         for j in range(len(tk) - len(q.terms) + 1))
        return out
    if isinstance(q, RangeQuery):
        m = np.ones(n, dtype=bool)
        if q.lo is not None:
            m &= ts >= q.lo
        if q.hi is not None:
            m &= ts <= q.hi
        return m
    if isinstance(q, BooleanQuery):
        matched = np.zeros(n, dtype=bool)
        required = None
        excluded = np.zeros(n, dtype=bool)
        scnt = np.zeros(n, dtype=np.int64)
        any_pos = False
        for c in q.clauses:
            m = _brute(c.query, tokens, ts)
            if c.occur in (SHOULD, MUST):
                any_pos = True
                matched |= m
                if c.occur == MUST:
                    required = m if required is None else (required & m)
                else:
                    scnt += m
            elif c.occur == FILTER:
                required = m if required is None else (required & m)
            else:
                excluded |= m
        # Lucene rule: with required clauses and msm == 0, SHOULD clauses are
        # scoring-only; without required clauses, >=1 positive must match
        if required is not None:
            elig = required
        elif any_pos:
            elig = matched
        else:
            elig = np.zeros(n, dtype=bool)
        if q.minimum_should_match:
            elig = elig & (scnt >= q.minimum_should_match)
        return elig & ~excluded


def _random_tree(rng, ts, depth=0):
    kind = rng.integers(0, 10)
    if depth >= 2 or kind < 5:
        return TermQuery(VOCAB[int(rng.integers(len(VOCAB)))])
    if kind < 6:
        i = int(rng.integers(len(VOCAB) - 1))
        return PhraseQuery((VOCAB[i], VOCAB[i + 1]))
    if kind < 7:
        lo, hi = sorted(rng.integers(0, len(ts), size=2))
        return RangeQuery("ts", int(ts[lo]), int(ts[hi]))
    n_cl = int(rng.integers(1, 4))
    occurs = [SHOULD, MUST, FILTER, MUST_NOT]
    clauses = []
    has_positive = False
    for _ in range(n_cl):
        occ = occurs[int(rng.integers(4))]
        if occ in (SHOULD, MUST):
            has_positive = True
        clauses.append(BooleanClause(_random_tree(rng, ts, depth + 1), occ))
    if not has_positive:
        clauses.append(BooleanClause(
            TermQuery(VOCAB[int(rng.integers(len(VOCAB)))]), SHOULD))
    msm = int(rng.integers(0, 2))
    return BooleanQuery(tuple(clauses), msm)


def test_nested_trees_match_bruteforce(fuzz_index):
    s, tokens, ts = fuzz_index
    rng = np.random.default_rng(17)
    checked = 0
    for _ in range(60):
        inner = [_random_tree(rng, ts, depth=1) for _ in range(int(rng.integers(1, 3)))]
        occurs = [SHOULD, MUST, MUST_NOT, FILTER]
        clauses = [BooleanClause(iq, occurs[int(rng.integers(4))]) for iq in inner]
        if not any(c.occur in (SHOULD, MUST) for c in clauses):
            clauses.append(BooleanClause(TermQuery("data"), SHOULD))
        q = BooleanQuery(tuple(clauses))
        want = set(np.nonzero(_brute(q, tokens, ts))[0].tolist())
        td = s.search(q, k=len(tokens), total_hits_threshold=2**31 - 1)
        got = {h.gid for h in td.hits}
        assert got == want, q
        assert td.total_hits == len(want)
        checked += 1
    assert checked == 60
