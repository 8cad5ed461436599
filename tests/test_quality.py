"""Quality benchmark (`benchmark/quality/QualityStats.java`,
trec/TrecJudge.java): accumulator semantics — top-5-gated MRR, P@n
short-list extrapolation, AvP, the good-queries-only average — and an
end-to-end judged run."""

import numpy as np
import pytest

from lucene_ray.pipelines.quality import (
    QualityStats,
    TrecJudge,
    parse_trec_qrels,
    quality_benchmark,
)


def test_stats_accumulator_semantics():
    st = QualityStats(max_good_points=4)
    rel = [False, True, False, True, False, False]   # ranks 1..6
    for i, r in enumerate(rel, 1):
        st.add_result(i, r)
    assert st.num_good_points == 2
    assert st.recall == 2 / 4
    # first relevant at rank 2 (within top 5) -> mrr = 1/2
    assert st.mrr == 0.5
    assert st.precision_at(2) == 1 / 2
    assert st.precision_at(4) == 2 / 4
    assert st.precision_at(6) == 2 / 6
    # extrapolation past the result list: numPoints * pAt[numPoints] / n
    assert st.precision_at(12) == pytest.approx(6 * (2 / 6) / 12)
    # avp sums precision at relevant ranks / maxGood
    assert st.avp() == pytest.approx((1 / 2 + 2 / 4) / 4)
    # out-of-order rank rejected
    with pytest.raises(ValueError):
        st.add_result(9, True)


def test_mrr_top5_gate():
    st = QualityStats(3)
    for i in range(1, 7):
        st.add_result(i, i == 6)       # first relevant at rank 6
    assert st.mrr == 0.0               # outside the top-5 gate


def test_average_good_queries_only():
    a = QualityStats(2)
    for i, r in enumerate([True, True], 1):
        a.add_result(i, r)
    b = QualityStats(0)                 # no judgements -> excluded
    b.add_result(1, False)
    c = QualityStats(1)
    for i, r in enumerate([False, True], 1):
        c.add_result(i, r)
    avg = QualityStats.average([a, b, c])
    assert avg.recall == pytest.approx((1.0 + 1.0) / 2)
    assert avg.mrr == pytest.approx((1.0 + 0.5) / 2)
    assert avg.precision_at(1) == pytest.approx((1.0 + 0.0) / 2)
    assert avg.avp() == pytest.approx((1.0 + 0.5) / 2)


def test_trec_qrels_and_end_to_end(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.searcher import IndexSearcher
    from lucene_ray.sources.transcripts import synth_transcripts

    qrels = parse_trec_qrels("q1 0 doc-a 1\nq1 0 doc-b 0\nq2 0 doc-a 1\n")
    assert qrels == {"q1": {"doc-a"}, "q2": {"doc-a"}}
    judge = TrecJudge(qrels)
    assert judge.max_recall("q1") == 1 and not judge.is_relevant("doc-b", "q1")

    t = synth_transcripts(800, seed=99)
    d = str(tmp_path / "q")
    build_index(rd.from_arrow(t), d, target_docs_per_partition=300,
                input_desc="quality")
    s = IndexSearcher(d)
    td = s.search_large(__import__("lucene_ray.search.query",
                                   fromlist=["TermQuery"]).TermQuery("merge"),
                        k=30)
    names = [f"{h.conv_id}:{int(h.turn_idx)}" for h in td.hits]
    rel = set(names[::3])               # every third hit judged relevant
    judge2 = TrecJudge({"q": rel})
    st = quality_benchmark(s, [("q", "merge")], judge2, max_results=30)[0]
    assert st.num_good_points == len([n for n in names if n in rel])
    assert st.recall == 1.0
    assert st.mrr == 1.0                # rank 1 is relevant by construction
