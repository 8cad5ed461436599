"""TestSynonymQuery.java transcriptions: equal-scoring semantics of the
blended pseudo-term (testScores), and boost-weighted freq blending
(testBoosts — the reference omits norms; here the docs are padded to equal
length so the norm factor cancels and the blended freq math is what's
under test)."""

import pyarrow as pa
import pytest

from lucene_ray.search.query import SynonymQuery
from lucene_ray.search.searcher import IndexSearcher


def _index(tmp_path_factory, texts, name):
    import ray.data as rd

    from lucene_ray.index.build import build_index

    t = pa.table({
        "conv_id": [f"conv-{i:08d}" for i in range(len(texts))],
        "turn_idx": pa.array([0] * len(texts), type=pa.int32()),
        "role": ["user"] * len(texts),
        "tool": ["none"] * len(texts),
        "ts": pa.array(list(range(len(texts))), type=pa.int64()),
        "text": list(texts),
    })
    d = str(tmp_path_factory.mktemp(name))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=8,
                input_desc=name)
    return IndexSearcher(d)


def test_scores(ray_session, tmp_path_factory):
    # 1 doc "a" + 10 docs "b": every doc scores IDENTICALLY — the synonym
    # blends df to the max and each doc has pseudo-freq 1
    s = _index(tmp_path_factory, ["a"] + ["b"] * 10, "syn_scores")
    td = s.search(SynonymQuery(("a", "b")), k=100)
    assert td.total_hits == 11
    scores = [h.score for h in td.hits]
    assert all(sc == scores[0] for sc in scores)


def test_boosts(ray_session, tmp_path_factory):
    # freq blending: a@0.25, b@0.5, c@1.0 — docs built so every doc's
    # blended freq is exactly 1 (4a*0.25 == 2b*0.5 == (2a*0.25+1b*0.5)
    # == 1c) and every doc has the same length (norms cancel)
    texts = []
    for _ in range(5):
        texts.append("a a a a")
        texts.append("b b z z")
        texts.append("a a b z")
    texts.append("c z z z")
    texts.append("c z z z")
    s = _index(tmp_path_factory, texts, "syn_boosts")
    q = SynonymQuery(("a", "b", "c"), boosts=(0.25, 0.5, 1.0))
    td = s.search(q, k=100)
    assert td.total_hits == len(texts)
    scores = [round(float(h.score), 6) for h in td.hits]
    assert all(sc == scores[0] for sc in scores)


def test_boost_validation():
    # SynonymQuery.Builder rejects boosts outside (0, 1]
    with pytest.raises(ValueError):
        SynonymQuery(("a",), boosts=(1.5,))
    with pytest.raises(ValueError):
        SynonymQuery(("a",), boosts=(0.0,))


def test_blended_term_scores(ray_session, tmp_path_factory):
    """TestBlendedTermQuery.testBlendedScores: 1 doc 'a' + 10 docs 'b'
    under the df-max blend — every doc scores identically (tie 0 makes
    the DisMax a pure max of equal-stat scorers)."""
    from lucene_ray.search.query import BlendedTermQuery

    s = _index(tmp_path_factory, ["a"] + ["b"] * 10, "blended_scores")
    td = s.search(BlendedTermQuery(("a", "b")), k=20)
    assert td.total_hits == 11
    scores = [h.score for h in td.hits]
    assert all(sc == scores[0] for sc in scores)
