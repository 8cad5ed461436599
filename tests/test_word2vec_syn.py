"""Word2Vec synonym provider + filter stage
(`synonym/word2vec/Word2VecSynonymProvider.java`,
`TestWord2VecSynonymProvider.java` vectors)."""

import numpy as np
import pytest
import ray

from lucene_ray.analysis.filters import run_token_chain
from lucene_ray.analysis.word2vec import (
    Word2VecModel,
    Word2VecSynonymProvider,
)


def _model(entries):
    m = Word2VecModel()
    for t, v in entries:
        m.add_term_and_vector(t, v)
    return m


def test_provider_reference_vectors():
    """TestWord2VecSynonymProvider.getSynonyms_shouldReturnSynonymsBased
    OnMinAcceptedSimilarity: query 'a'=(10,10), expected d,e,c,b desc."""
    m = _model([("a", [10, 10]), ("b", [10, 8]), ("c", [9, 10]),
                ("d", [1, 1]), ("e", [99, 101]), ("f", [-1, 10])])
    unit = Word2VecSynonymProvider(m)
    got = unit.get_synonyms("a", 10, 0.85)
    assert [t for t, _ in got] == ["d", "e", "c", "b"]
    # boosts are the (1+dot)/2 similarities, descending, self removed
    sims = [s for _, s in got]
    assert sims == sorted(sims, reverse=True)
    assert sims[0] == pytest.approx(1.0, abs=1e-6)      # d is parallel to a
    assert all(s >= 0.85 for s in sims)
    # 'f' fails the similarity floor
    assert "f" not in {t for t, _ in got}
    # max_synonyms_per_term caps the list
    assert len(unit.get_synonyms("a", 2, 0.85)) == 2
    with pytest.raises(ValueError):
        unit.get_synonyms(None)
    # unknown terms expand to nothing
    assert unit.get_synonyms("zzz") == []


def test_model_save_load_roundtrip(tmp_path):
    m = _model([("alpha", [1.0, 0.0]), ("beta", [0.9, 0.1])])
    path = str(tmp_path / "w2v.npz")
    m.save(path)
    m2 = Word2VecModel.load(path)
    assert m2.terms == ["alpha", "beta"]
    np.testing.assert_allclose(m2.matrix, m.matrix, rtol=1e-6)
    # vectors normalized on ingest
    assert np.linalg.norm(m2.vector_value("beta")) == pytest.approx(1.0)


def test_word2vec_chain_stage(tmp_path):
    m = _model([("merge", [10, 10]), ("combine", [99, 101]),
                ("join", [9, 10]), ("split", [-1, 10])])
    path = str(tmp_path / "model.npz")
    m.save(path)
    flat, lens, pos, norms = run_token_chain(
        ["merge", "the", "split"], np.array([3]),
        (f"word2vec_syn:{path}:5:0.85",))
    toks = list(np.asarray(flat, dtype=object))
    # originals survive; synonyms overlay (stream is position-sorted)
    assert set(toks) == {"merge", "the", "split", "combine", "join"}
    assert list(lens) == [5]
    # overlays share the source position (posInc 0) and skip the norm
    assert list(norms) == [3]
    merge_pos = pos[toks.index("merge")]
    assert all(pos[i] == merge_pos for i, t in enumerate(toks)
               if t in ("combine", "join"))


def test_word2vec_index_end_to_end(ray_session, tmp_path):
    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import PhraseQuery, TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    m = _model([("merge", [10, 10]), ("combine", [99, 101]),
                ("sort", [-5, 7])])
    mp = str(tmp_path / "model.npz")
    m.save(mp)
    rows = [{"conv_id": "c0", "turn_idx": i, "role": "u", "text": t,
             "tool": "", "ts": 1700000000000000 + i}
            for i, t in enumerate(["merge the tables", "sort the data"])]
    idx = str(tmp_path / "idx")
    build_index(ray.data.from_items(rows), idx,
                token_filters=(f"word2vec_syn:{mp}",))
    s = IndexSearcher(idx)
    # the synonym is searchable at the source position
    assert s.count(TermQuery("combine")) == 1
    assert s.count(PhraseQuery(("combine", "the", "tables"))) == 1
    assert s.count(TermQuery("sort")) == 1          # no accepted synonyms
