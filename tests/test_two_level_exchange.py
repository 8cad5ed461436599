"""Two-level partition exchange (block → coarse bucket → shards): results
identical to the single-level exchange, resume still skips committed shards."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_two_level_matches_single_level(ray_session, tmp_path):
    from lucene_ray.index.build import TWO_LEVEL_PARTS, build_index
    from lucene_ray.search.query import PhraseQuery, bool_query
    from lucene_ray.search.searcher import IndexSearcher
    from lucene_ray.sources.transcripts import transcripts_from_documents

    ds = transcripts_from_documents(SF)
    base = str(tmp_path / "single")
    build_index(transcripts_from_documents(SF), base,
                target_docs_per_partition=200, input_desc="single")
    # 1 doc per partition target -> n_parts=500 > TWO_LEVEL_PARTS
    assert 500 > TWO_LEVEL_PARTS
    two = str(tmp_path / "two")
    c2 = build_index(ds, two, target_docs_per_partition=1, input_desc="two")
    assert c2["doc_count"] == 500
    s1, s2 = IndexSearcher(base), IndexSearcher(two)
    for q in (bool_query(must=["merge"]), bool_query(should=["merge", "join"]),
              PhraseQuery(("merge", "join"))):
        assert s1.count(q) == s2.count(q)
        h1 = [(h.conv_id, h.turn_idx, round(h.score, 5))
              for h in s1.search(q, k=8).hits]
        h2 = [(h.conv_id, h.turn_idx, round(h.score, 5))
              for h in s2.search(q, k=8).hits]
        assert h1 == h2


def test_two_level_resume(ray_session, tmp_path):
    """A rebuild over an existing commit with the same input is a no-op."""
    from lucene_ray.index.build import build_index
    from lucene_ray.sources.transcripts import transcripts_from_documents

    idx = str(tmp_path / "idx")
    c1 = build_index(transcripts_from_documents(SF), idx,
                     target_docs_per_partition=1, input_desc="resume-two")
    c2 = build_index(transcripts_from_documents(SF), idx,
                     target_docs_per_partition=1, input_desc="resume-two")
    assert c1["fingerprint"] == c2["fingerprint"]
    assert c2["generation"] == c1["generation"]
