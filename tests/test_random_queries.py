"""Randomized query fuzzing: engine vs brute-force float32 BM25 oracle over
random boolean shapes (seeded), plus searchAfter through the WAND path."""

import numpy as np
import pytest

import lucene_ray.analysis.standard as std
from lucene_ray.index.build import build_index
from lucene_ray.search.query import bool_query
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.sources.transcripts import synth_transcripts
from lucene_ray.util.smallfloat import LENGTH_TABLE, int_to_byte4


@pytest.fixture(scope="module")
def setup(ray_session, tmp_path_factory):
    import ray.data as rd

    t = synth_transcripts(4000, seed=123)
    d = str(tmp_path_factory.mktemp("rndidx"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=700, input_desc="rnd")
    t = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    tokens = [std.analyze(x) if x else [] for x in t.column("text").to_pylist()]
    return IndexSearcher(d), tokens


def _oracle(tokens, should, must, must_not, msm, k):
    lengths = np.array([len(x) for x in tokens], dtype=np.int64)
    nb = int_to_byte4(lengths)
    N = int((lengths > 0).sum())
    sum_ttf = int(lengths.sum())
    avgdl = np.float32(sum_ttf / float(N))
    one = np.float32(1.0)
    k1, b = np.float32(1.2), np.float32(0.75)

    def term_scores(term):
        df = sum(term in set(tk) for tk in tokens)
        if df == 0:
            return {}
        idf = np.float32(np.log(1 + (N - df + 0.5) / (df + 0.5)))
        out = {}
        for d, tk in enumerate(tokens):
            f = tk.count(term)
            if f:
                ln = LENGTH_TABLE[int(nb[d])]
                ninv = one / (k1 * ((one - b) + b * ln / avgdl))
                out[d] = idf - idf / (one + np.float32(f) * ninv)
        return out

    scores = {}
    should_match = {}
    req = None
    for t_ in should:
        for d, v in term_scores(t_).items():
            scores[d] = scores.get(d, np.float32(0)) + v
            should_match[d] = should_match.get(d, 0) + 1
    for t_ in must:
        s = term_scores(t_)
        docs = set(s)
        req = docs if req is None else req & docs
        for d, v in s.items():
            scores[d] = scores.get(d, np.float32(0)) + v
    if req is not None:
        eligible = req
        if msm:
            eligible = {d for d in eligible if should_match.get(d, 0) >= msm}
    else:
        eligible = {d for d, c in should_match.items() if c >= max(1, msm)}
    for t_ in must_not:
        hit = {d for d, tk in enumerate(tokens) if t_ in tk}
        eligible -= hit
    ranked = sorted(eligible, key=lambda d: (-scores.get(d, np.float32(0)), d))
    return [(d, float(scores.get(d, np.float32(0)))) for d in ranked[:k]], len(eligible)


VOCAB_HOT = ["the", "a", "to", "query", "data", "scan"]
VOCAB_MID = ["merge", "join", "sort", "customer", "window", "batch", "vector"]
VOCAB_RARE = [f"rareterm{i:04d}" for i in range(40)]


def test_random_boolean_queries(setup):
    s, tokens = setup
    rng = np.random.default_rng(99)
    for trial in range(40):
        pool = VOCAB_HOT + VOCAB_MID + list(rng.choice(VOCAB_RARE, 3))
        n_should = int(rng.integers(0, 4))
        n_must = int(rng.integers(0, 3))
        n_not = int(rng.integers(0, 2))
        if n_should + n_must == 0:
            n_should = 1
        terms = list(rng.choice(pool, size=n_should + n_must + n_not, replace=False))
        should = terms[:n_should]
        must = terms[n_should:n_should + n_must]
        must_not = terms[n_should + n_must:]
        msm = int(rng.integers(0, n_should + 1)) if n_should > 1 and not n_must else 0
        k = int(rng.choice([5, 10, 37]))
        td = s.search(bool_query(should=should, must=must, must_not=must_not,
                                 minimum_should_match=msm), k=k)
        want, total = _oracle(tokens, should, must, must_not, msm, k)
        got = [(h.gid, h.score) for h in td.hits]
        assert got == want, (trial, should, must, must_not, msm, k)
        if td.relation == "EQUAL_TO":
            assert td.total_hits == total, (trial, should, must, must_not)


def test_search_after_through_wand(setup):
    """Pagination on a selective disjunction (WAND path): pages concatenate to
    the oracle's full ranking with no gaps or repeats."""
    s, tokens = setup
    should = ["rareterm0003", "rareterm0011", "customer"]
    want, total = _oracle(tokens, should, [], [], 0, 100)
    got = []
    after = None
    while len(got) < min(total, 60):
        td = s.search(bool_query(should=should), k=7, after=after)
        if not td.hits:
            break
        got.extend((h.gid, h.score) for h in td.hits)
        after = (td.hits[-1].score, td.hits[-1].gid)
    assert got == want[:len(got)]
    assert len(got) >= min(total, 60)   # pages of 7 may overshoot the target
