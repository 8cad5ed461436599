"""AST Monitor (presearch triggers + MemoryIndex verify): trigger-term
soundness and full parity with brute-force per-(doc, query) evaluation."""

import numpy as np
import pyarrow.parquet as pq

from lucene_ray.index.memoryindex import MemoryIndex
from lucene_ray.pipelines.percolate import AstMonitor, _registered_ast, trigger_terms
from lucene_ray.search.query import (
    FuzzyQuery,
    IntervalQuery,
    MatchAllDocsQuery,
    MultiPhraseQuery,
    PhraseQuery,
    PrefixQuery,
    SynonymQuery,
    TermQuery,
    bool_query,
)

SF = "/root/testdata/sf0.001"


def test_trigger_terms_shapes():
    assert trigger_terms(TermQuery("merge")) == {"merge"}
    assert trigger_terms(PhraseQuery(("a", "merge", "jo"))) == {"merge"}
    assert trigger_terms(MultiPhraseQuery((("x", "y"), ("z",)))) == {"z"}
    assert trigger_terms(SynonymQuery(("a", "b"))) == {"a", "b"}
    assert trigger_terms(IntervalQuery(("scan", "windowing"), 4)) == {"windowing"}
    # conjunction: one required child's trigger set suffices (smallest wins)
    assert trigger_terms(bool_query(must=["merge"], should=["x", "y"])) == {"merge"}
    # disjunction: union of all branches
    assert trigger_terms(bool_query(should=["x", "y"])) == {"x", "y"}
    # non-prescreenable shapes
    assert trigger_terms(PrefixQuery("me")) is None
    assert trigger_terms(FuzzyQuery("merge")) is None
    assert trigger_terms(MatchAllDocsQuery()) is None
    # disjunction with one unprescreenable branch → whole query unprescreenable
    assert trigger_terms(bool_query(should=[TermQuery("a"), PrefixQuery("b")])) is None


def test_ast_monitor_matches_brute_force(ray_session):
    registered = _registered_ast() + [
        ("pq-extra-sloppy", PhraseQuery(("merge", "data"), slop=5)),
        ("pq-extra-syn", SynonymQuery(("vector", "spark"))),
    ]
    mon = AstMonitor(registered)
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    t = t.sort_by([("doc_id", "ascending")]).slice(0, 200)
    doc_ids = t.column("doc_id").to_numpy()
    texts = t.column("text")
    got_d, got_q = mon.match_batch(doc_ids, texts)
    got = set(zip(got_d.tolist(),
                  [registered[i][0] for i in got_q.tolist()]))
    want = set()
    for did, text in zip(doc_ids.tolist(), texts.to_pylist()):
        m = MemoryIndex().add_field("text", text or "")
        for qid, q in registered:
            if m.matches(q):
                want.add((did, qid))
    assert got == want
    assert len(want) > 0                        # non-degenerate corpus


def test_ast_monitor_presearch_prunes(ray_session):
    """Candidates actually shrink: a rare-term query must not be verified
    against every doc (spy on MemoryIndex construction count)."""
    registered = [("pq-rare-only", TermQuery("nonexistentterm12345"))]
    mon = AstMonitor(registered)
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    d, q = mon.match_batch(t.column("doc_id").to_numpy(), t.column("text"))
    assert len(d) == 0 and len(mon.always) == 0


def test_required_unscreenable_not_masked_by_should():
    """ADVICE r3 (high): MUST/FILTER clauses that cannot be prescreened must
    not fall back to the SHOULD-trigger union when msm=0 — a doc matching
    only the required clause would be a percolator false negative.  The
    reference TermFilteredPresearcher treats this case as ANYTOKEN."""
    from lucene_ray.pipelines.percolate import trigger_prefixes

    q = bool_query(must=[PrefixQuery("vec")], should=["merge"])
    # exact-term prescreen is impossible — but NOT the should-union
    assert trigger_terms(q) is None
    # the prefix path screens on the required prefix (sound)
    assert trigger_prefixes(q) == ["vec"]
    # fuzzy MUST with prefix_length=0 → no prefix either: true ANYTOKEN
    q2 = bool_query(must=[FuzzyQuery("merge")], should=["scan"])
    assert trigger_terms(q2) is None and trigger_prefixes(q2) is None
    # msm>=1 makes SHOULD required again → union is sound
    q3 = bool_query(must=[FuzzyQuery("merge")], should=["scan", "sort"],
                    minimum_should_match=1)
    assert trigger_terms(q3) == {"scan", "sort"}
    # pure-SHOULD unchanged
    assert trigger_terms(bool_query(should=["a", "b"])) == {"a", "b"}


def test_ast_monitor_required_prefix_end_to_end(ray_session):
    """End-to-end reproduction of the ADVICE case: a doc containing
    'vector' but not 'merge' must match bool(must=[prefix(vec)],
    should=[merge])."""
    registered = [("pq-req-prefix",
                   bool_query(must=[PrefixQuery("vec")], should=["merge"]))]
    mon = AstMonitor(registered)
    doc_ids = np.array([1, 2, 3], dtype=np.int64)
    import pyarrow as pa
    texts = pa.array(["the vector index", "merge sort only", "plain text"])
    d, q = mon.match_batch(doc_ids, texts)
    assert set(d.tolist()) == {1}
