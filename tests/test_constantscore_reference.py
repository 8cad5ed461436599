"""TestConstantScoreQuery.java transcriptions: constant-score wrapping
(single, double, and around a boolean of constant-score clauses) always
scores exactly the outer boost."""

import pyarrow as pa
import pytest

from lucene_ray.search.query import (
    BoostQuery,
    ConstantScoreQuery,
    TermQuery,
    bool_query,
)
from lucene_ray.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def csq_index(ray_session, tmp_path_factory):
    import ray.data as rd

    from lucene_ray.index.build import build_index

    t = pa.table({
        "conv_id": ["conv-00000000"],
        "turn_idx": pa.array([0], type=pa.int32()),
        "role": ["user"], "tool": ["none"],
        "ts": pa.array([0], type=pa.int64()),
        "text": ["term1 term2"],
    })
    d = str(tmp_path_factory.mktemp("csq"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=4,
                input_desc="csq")
    return IndexSearcher(d)


def _check_hits(s, q, want_score):
    td = s.search(q, k=10)
    assert td.total_hits == 1
    assert td.hits[0].score == pytest.approx(want_score, abs=1e-6)


def test_wrapped_2_times(csq_index):
    s = csq_index
    csq1 = BoostQuery(ConstantScoreQuery(TermQuery("term1")), 2.0)
    csq2 = BoostQuery(
        ConstantScoreQuery(ConstantScoreQuery(TermQuery("term2"))), 5.0)
    _check_hits(s, csq1, 2.0)
    _check_hits(s, csq2, 5.0)
    bq = bool_query(should=[csq1, csq2])
    csqbq = BoostQuery(ConstantScoreQuery(bq), 17.0)
    _check_hits(s, csqbq, 17.0)
    # the un-wrapped boolean sums its constant-score clauses
    _check_hits(s, bq, 7.0)


def test_csq_basic(csq_index):
    s = csq_index
    _check_hits(s, ConstantScoreQuery(TermQuery("term1")), 1.0)
    _check_hits(s, ConstantScoreQuery(TermQuery("term1"), boost=3.0), 3.0)
