"""TestFuzzyQuery.java transcriptions (core/src/test/.../search/
TestFuzzyQuery.java) against the blended-rewrite FuzzyQuery: per-prefix
match counts, boost-ranked ordering, maxExpansions queue cut, and the
LUCENE-329 exact-match-scores-highest invariant."""

import pyarrow as pa
import pytest

from lucene_ray.search.query import FuzzyQuery
from lucene_ray.search.searcher import IndexSearcher


def _term_index(tmp_path_factory, terms, name):
    import ray.data as rd

    from lucene_ray.index.build import build_index

    t = pa.table({
        "conv_id": [f"conv-{i:08d}" for i in range(len(terms))],
        "turn_idx": pa.array([0] * len(terms), type=pa.int32()),
        "role": ["user"] * len(terms),
        "tool": ["none"] * len(terms),
        "ts": pa.array(list(range(len(terms))), type=pa.int64()),
        "text": list(terms),
    })
    d = str(tmp_path_factory.mktemp(name))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=4,
                input_desc=name)
    return IndexSearcher(d), list(terms)


@pytest.fixture(scope="module")
def fuzz_index(ray_session, tmp_path_factory):
    # testFuzziness corpus (one term per doc, stored order = docID order)
    return _term_index(tmp_path_factory,
                       ["aaaaa", "aaaab", "aaabb", "aabbb",
                        "abbbb", "bbbbb", "ddddd"], "fuzzref")


def _hit_terms(searcher, terms, td):
    # conv ids encode the insertion index == the term list index
    return [terms[int(h.conv_id.split("-")[1])] for h in td.hits]


def test_fuzziness_counts_by_prefix(fuzz_index):
    s, _ = fuzz_index
    for prefix, want in [(0, 3), (1, 3), (2, 3), (3, 3), (4, 2), (5, 1),
                         (6, 1)]:
        q = FuzzyQuery("aaaaa", max_edits=2, prefix_length=prefix)
        assert s.search(q, k=1000).total_hits == want, prefix


def test_fuzziness_scoring_order(fuzz_index):
    s, terms = fuzz_index
    td = s.search(FuzzyQuery("bbbbb", max_edits=2), k=1000)
    assert _hit_terms(s, terms, td) == ["bbbbb", "abbbb", "aabbb"]


def test_fuzziness_max_expansions_cut(fuzz_index):
    # pq size: maxExpansions=2 keeps only the top-2 boosted terms
    s, terms = fuzz_index
    td = s.search(FuzzyQuery("bbbbb", max_edits=2, max_expansions=2),
                  k=1000)
    assert _hit_terms(s, terms, td) == ["bbbbb", "abbbb"]
    # and count() agrees with the capped match set
    assert s.count(FuzzyQuery("bbbbb", max_edits=2, max_expansions=2)) == 2


def test_fuzziness_not_similar_enough(fuzz_index):
    s, _ = fuzz_index
    assert s.search(FuzzyQuery("xxxxx", max_edits=2), k=1000).total_hits == 0
    # edit distance from aaccc to aaaaa is 3
    assert s.search(FuzzyQuery("aaccc", max_edits=2), k=1000).total_hits == 0


def test_fuzziness_similar_term_ordering(fuzz_index):
    s, terms = fuzz_index
    td = s.search(FuzzyQuery("aaaac", max_edits=2), k=1000)
    assert _hit_terms(s, terms, td) == ["aaaaa", "aaaab", "aaabb"]
    for prefix, want in [(1, 3), (2, 3), (3, 3)]:
        td = s.search(FuzzyQuery("aaaac", max_edits=2,
                                 prefix_length=prefix), k=1000)
        assert len(td.hits) == want
    td = s.search(FuzzyQuery("aaaac", max_edits=2, prefix_length=4), k=1000)
    assert _hit_terms(s, terms, td) == ["aaaaa", "aaaab"]
    assert s.search(FuzzyQuery("aaaac", max_edits=2, prefix_length=5),
                    k=1000).total_hits == 0


def test_fuzziness_ddddx(fuzz_index):
    s, terms = fuzz_index
    for prefix in range(5):
        td = s.search(FuzzyQuery("ddddx", max_edits=2,
                                 prefix_length=prefix), k=1000)
        assert _hit_terms(s, terms, td) == ["ddddd"], prefix
    assert s.search(FuzzyQuery("ddddx", max_edits=2, prefix_length=5),
                    k=1000).total_hits == 0


def test_single_query_exact_match_scores_highest(ray_session,
                                                 tmp_path_factory):
    """LUCENE-329: IDF must not outrank the exact surface form — the
    blended max-df makes rare variants score by boost, not rarity."""
    s, terms = _term_index(
        tmp_path_factory,
        ["smith"] * 6 + ["smythe", "smdssasd"], "l329")
    for search_term in ("smith", "smythe", "smdssasd"):
        td = s.search(FuzzyQuery(search_term, max_edits=2,
                                 prefix_length=1), k=1000)
        hits = _hit_terms(s, terms, td)
        assert hits, search_term
        assert hits[0] == search_term
        if len(hits) > 1:
            assert hits[-1] != search_term
