"""Payload queries vs brute force.

DelimitedPayloadTokenFilter index side
(`analysis/common/.../payloads/DelimitedPayloadTokenFilter.java:53-70`),
PayloadScoreQuery (`queries/payloads/PayloadScoreQuery.java`) and
SpanPayloadCheckQuery (`queries/payloads/SpanPayloadCheckQuery.java`):
deterministic corpus with a whitespace tokenizer (the reference pairing —
the standard tokenizer would split at the delimiter), payloads on some
occurrences only, brute-force oracles in plain Python floats."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.search.query import (
    PayloadScoreQuery,
    SpanPayloadCheckQuery,
    TermQuery,
)
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.search.spans import SpanNearQuery

VOCAB = ["alpha", "beta", "gamma", "delta", "omega"]


def _make_rows(n=400, seed=11):
    """Deterministic corpus: ~half the occurrences carry |<float> payloads."""
    rng = np.random.default_rng(seed)
    texts, parsed = [], []
    for i in range(n):
        toks, doc = [], []
        for j in range(int(rng.integers(1, 12))):
            w = VOCAB[int(rng.integers(0, len(VOCAB)))]
            if rng.random() < 0.5:
                p = float(np.float32(round(float(rng.uniform(-1, 5)), 2)))
                toks.append(f"{w}|{p}")
                doc.append((w, p))
            else:
                toks.append(w)
                doc.append((w, None))
        texts.append(" ".join(toks))
        parsed.append(doc)
    rows = pa.table({
        "conv_id": pa.array([f"conv-{i:08d}" for i in range(n)]),
        "turn_idx": pa.array([0] * n, type=pa.int32()),
        "text": pa.array(texts),
    })
    return rows, parsed


@pytest.fixture(scope="module")
def setup(ray_session, tmp_path_factory):
    import ray.data as rd

    rows, parsed = _make_rows()
    d = str(tmp_path_factory.mktemp("payidx"))
    build_index(rd.from_arrow(rows), d, target_docs_per_partition=97,
                token_filters=("tokenizer:whitespace", "delimited_payload:|"),
                input_desc="paysynth")
    return IndexSearcher(d), parsed


def _factors(doc, term):
    """Payload factors at the term's occurrences (missing -> 1.0)."""
    return [p if p is not None else 1.0 for w, p in doc if w == term]


def _agg(fs, func):
    if func == "sum":
        return sum(fs)
    if func == "min":
        return min(fs)
    if func == "max":
        return max(fs)
    return sum(fs) / len(fs)


@pytest.mark.parametrize("func", ["sum", "min", "max", "avg"])
def test_payload_score_term(setup, func):
    s, parsed = setup
    td = s.search(PayloadScoreQuery("alpha", func=func), k=500)
    want = {d: max(0.0, _agg(_factors(doc, "alpha"), func))
            for d, doc in enumerate(parsed) if _factors(doc, "alpha")}
    got = {h.gid: h.score for h in td.hits}
    assert set(got) == set(want)
    for g, sc in got.items():
        assert sc == pytest.approx(want[g], abs=1e-4)


def test_payload_score_boost_and_span_score(setup):
    s, parsed = setup
    td = s.search(PayloadScoreQuery("beta", func="sum", boost=2.0), k=500)
    base = s.search(PayloadScoreQuery("beta", func="sum"), k=500)
    b0 = {h.gid: h.score for h in base.hits}
    for h in td.hits:
        assert h.score == pytest.approx(2.0 * b0[h.gid], rel=1e-6)
    # include_span_score multiplies by the wrapped term's own BM25 score
    tds = s.search(PayloadScoreQuery("beta", func="sum",
                                     include_span_score=True), k=500)
    bm = {h.gid: h.score for h in s.search(TermQuery("beta"), k=500).hits}
    for h in tds.hits:
        assert h.score == pytest.approx(
            np.float32(b0[h.gid]) * np.float32(bm[h.gid]), rel=1e-5)


def test_payload_score_span_near(setup):
    s, parsed = setup
    q = PayloadScoreQuery(
        SpanNearQuery(("alpha", "beta"), slop=0, in_order=True), func="sum")
    td = s.search(q, k=500)
    want = {}
    for d, doc in enumerate(parsed):
        fs = []
        for i in range(len(doc) - 1):
            if doc[i][0] == "alpha" and doc[i + 1][0] == "beta":
                fs += [doc[i][1] if doc[i][1] is not None else 1.0,
                       doc[i + 1][1] if doc[i + 1][1] is not None else 1.0]
        if fs:
            want[d] = max(0.0, sum(fs))
    got = {h.gid: h.score for h in td.hits}
    assert got.keys() == want.keys()
    for g in got:
        assert got[g] == pytest.approx(want[g], abs=1e-4)


def _check_matches(doc, terms, expected, op):
    import operator

    ops = {"eq": operator.eq, "gt": operator.gt, "gte": operator.ge,
           "lt": operator.lt, "lte": operator.le}[op]
    n = 0
    for i in range(len(doc) - len(terms) + 1):
        if all(doc[i + j][0] == terms[j] for j in range(len(terms))):
            ok = True
            for j, exp in enumerate(expected):
                if exp is None:
                    continue
                actual = doc[i + j][1]
                if actual is None or not ops(np.float32(actual),
                                             np.float32(exp)):
                    ok = False
                    break
            if ok:
                n += 1
    return n


@pytest.mark.parametrize("expected,op", [
    ((None, None), "eq"),            # pure phrase (payloads unchecked)
    ((1.5, None), "gt"),             # first constituent payload > 1.5
    ((None, 0.0), "lt"),             # second payload negative
    ((2.0, 2.0), "gte"),
])
def test_span_payload_check(setup, expected, op):
    s, parsed = setup
    terms = ("alpha", "beta")
    td = s.search(SpanPayloadCheckQuery(terms, expected, op=op), k=500)
    want = {d: _check_matches(doc, terms, expected, op)
            for d, doc in enumerate(parsed)}
    want = {d: c for d, c in want.items() if c > 0}
    got = {h.gid for h in td.hits}
    assert got == set(want)
    # freq = accepted spans feeds the phrase-style scorer: a doc with more
    # accepted matches and equal length scores >= one with fewer — spot
    # check monotonicity through the count() totals instead of re-deriving
    # BM25 here (the scorer itself is pinned by the phrase tests)
    assert s.count(SpanPayloadCheckQuery(terms, expected, op=op)) == len(want)


def test_missing_payload_fails_check(setup):
    s, parsed = setup
    # every alpha occurrence without a stored payload must NOT satisfy a
    # non-None expectation, even one that "1.0" would pass
    td = s.search(SpanPayloadCheckQuery(("alpha",), (1.0,), op="eq"), k=500)
    want = {d for d, doc in enumerate(parsed)
            if any(w == "alpha" and p is not None
                   and np.float32(p) == np.float32(1.0) for w, p in doc)}
    assert {h.gid for h in td.hits} == want


def test_validation():
    with pytest.raises(ValueError):
        PayloadScoreQuery("x", func="median")
    with pytest.raises(ValueError):
        SpanPayloadCheckQuery(("a", "b"), (1.0,))
    with pytest.raises(ValueError):
        SpanPayloadCheckQuery(("a",), (1.0,), op="ne")


def test_payloads_survive_force_merge(setup, tmp_path):
    import shutil

    from lucene_ray.index.merge import force_merge

    s, parsed = setup
    d2 = str(tmp_path / "merged")
    shutil.copytree(s.index_dir, d2)
    force_merge(d2, max_segments=1)
    s2 = IndexSearcher(d2)
    for func in ("sum", "min"):
        a = s.search(PayloadScoreQuery("gamma", func=func), k=500)
        b = s2.search(PayloadScoreQuery("gamma", func=func), k=500)
        assert [(h.gid, h.score) for h in a.hits] == \
            [(h.gid, h.score) for h in b.hits]
    qa = SpanPayloadCheckQuery(("alpha", "beta"), (1.5, None), op="gt")
    assert {h.gid for h in s.search(qa, k=500).hits} == \
        {h.gid for h in s2.search(qa, k=500).hits}
