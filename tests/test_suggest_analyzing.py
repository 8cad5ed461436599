"""Analyzing / fuzzy suggesters (`suggest/analyzing/AnalyzingSuggester.java`,
`FuzzySuggester.java` semantics): sorted-shard build via Ray Data, prefix
lookup with exactFirst + weight ranking, fuzzy lookup with
maxEdits/nonFuzzyPrefix/minFuzzyLength defaults."""

import numpy as np
import pytest

from lucene_ray.search.suggest import (
    SEP,
    Suggester,
    _prefix_within_edits,
    analyzed_key,
    build_suggester,
)

ENTRIES = [
    ("merge sort", 40),
    ("merge join", 100),
    ("merge", 30),
    ("merger of equals", 10),
    ("quick brown fox", 55),
    ("quick start", 80),
    ("Merge Conflict", 25),       # analyzes to merge<SEP>conflict
    ("zebra", 5),
]


@pytest.fixture(scope="module")
def sugg(ray_session, tmp_path_factory):
    import pyarrow as pa
    import ray.data as rd

    t = pa.table({
        "text": pa.array([e[0] for e in ENTRIES]),
        "weight": pa.array([e[1] for e in ENTRIES], type=pa.int64()),
    })
    d = str(tmp_path_factory.mktemp("sugg") / "store")
    build_suggester(rd.from_arrow(t), d, num_partitions=3)
    return Suggester(d)


def test_analyzed_key_sep_and_case():
    assert analyzed_key("Merge Conflict") == f"merge{SEP}conflict"
    assert analyzed_key("") == ""


def test_prefix_lookup_weight_order(sugg):
    got = sugg.lookup("mer", 10)
    # all merge* entries, weight desc
    assert [s for s, _ in got] == \
        ["merge join", "merge sort", "merge", "Merge Conflict",
         "merger of equals"]


def test_exact_first(sugg):
    got = sugg.lookup("merge", 3)
    # exactFirst: the exact key "merge" (weight 30) outranks heavier
    # completions
    assert got[0] == ("merge", 30)
    assert got[1] == ("merge join", 100)


def test_multi_token_prefix(sugg):
    got = sugg.lookup("merge jo", 5)
    assert got == [("merge join", 100)]


def test_no_matches(sugg):
    assert sugg.lookup("xyzzy", 5) == []
    assert sugg.lookup("", 5) == []


def test_fuzzy_one_edit(sugg):
    # "marge" -> "merge..." is 1 substitution past the fixed first char
    got = sugg.lookup_fuzzy("marge", 10)
    names = [s for s, _ in got]
    assert "merge join" in names and "merge" in names
    # weight order among fuzzy matches
    assert names.index("merge join") < names.index("merge sort")


def test_fuzzy_respects_non_fuzzy_prefix(sugg):
    # edit in the FIRST char is not allowed (nonFuzzyPrefix=1)
    got = sugg.lookup_fuzzy("xerge", 10)
    assert got == []


def test_fuzzy_short_query_falls_back_exact(sugg):
    # len(analyzed) < minFuzzyLength=3 -> exact prefix semantics
    assert sugg.lookup_fuzzy("qk", 5) == []
    assert [s for s, _ in sugg.lookup_fuzzy("qu", 5)] == \
        ["quick start", "quick brown fox"]


def test_fuzzy_exact_still_first(sugg):
    got = sugg.lookup_fuzzy("merge", 10)
    assert got[0] == ("merge", 30)


@pytest.mark.parametrize("key,q,ed,ok", [
    ("merge", "merge", 1, True),
    ("mergexyz", "merge", 0, True),       # prefix exact
    ("marge", "merge", 1, True),
    ("marge", "merge", 0, False),
    ("mrege", "merge", 1, True),          # transposition = 1 unit edit
    ("mrgee", "merge", 1, True),          # prefix "mrge" = 1 deletion
    ("xrege", "merge", 1, False),         # 2 substitutions
    ("mege", "merge", 1, True),           # deletion
    ("meerge", "merge", 1, True),         # insertion
    ("xyz", "merge", 1, False),
])
def test_prefix_within_edits(key, q, ed, ok):
    assert _prefix_within_edits(key, q, ed) is ok


def test_shard_pruning_only_touches_candidates(sugg):
    # force a cold reader and check only range-matching shards load
    s2 = Suggester(sugg.dir)
    s2.lookup("zebra", 3)
    loaded = set(s2._cache)
    assert 0 < len(loaded) <= len(s2.manifest["shards"])
    for fn in loaded:
        meta = next(m for m in s2.manifest["shards"] if m["file"] == fn)
        assert meta["max"] >= "zebra"


def test_contexts_filter(ray_session, tmp_path):
    """ContextSuggestField labels + ContextQuery any-of filtering."""
    import pyarrow as pa
    import ray.data as rd

    from lucene_ray.search.suggest import Suggester, build_suggester

    t = pa.table({
        "text": ["merge sort", "merge join", "merge tree", "other thing"],
        "weight": [5, 9, 7, 3],
        "ctx": [["en"], ["en", "de"], ["fr"], ["en"]],
    })
    d = str(tmp_path / "ctxsugg")
    build_suggester(rd.from_arrow(t), d, text_col="text",
                    weight_col="weight", contexts_col="ctx")
    s = Suggester(d)
    # unfiltered: all three merge-* entries by weight desc
    assert [x[0] for x in s.lookup("merge", 5, exact_first=False)] == \
        ["merge join", "merge tree", "merge sort"]
    assert [x[0] for x in s.lookup("merge", 5, exact_first=False,
                                   contexts={"en"})] == \
        ["merge join", "merge sort"]
    assert [x[0] for x in s.lookup("merge", 5, exact_first=False,
                                   contexts={"de", "fr"})] == \
        ["merge join", "merge tree"]
    assert s.lookup("merge", 5, contexts={"zz"}) == []
    # a plain string contexts column works too (single label per entry)
    t2 = t.drop_columns(["ctx"]).append_column(
        "ctx", pa.array(["en", "en", "fr", "en"], type=pa.string()))
    d2 = str(tmp_path / "ctxsugg2")
    build_suggester(rd.from_arrow(t2), d2, text_col="text",
                    weight_col="weight", contexts_col="ctx")
    s2 = Suggester(d2)
    assert [x[0] for x in s2.lookup("merge", 5, exact_first=False,
                                    contexts={"fr"})] == ["merge tree"]


def test_contexts_filter_fuzzy(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from lucene_ray.search.suggest import Suggester, build_suggester

    t = pa.table({
        "text": ["merge sort", "merge join", "marge tree"],
        "weight": [5, 9, 7],
        "ctx": [["en"], ["de"], ["en"]],
    })
    d = str(tmp_path / "ctxfz")
    build_suggester(rd.from_arrow(t), d, text_col="text",
                    weight_col="weight", contexts_col="ctx")
    s = Suggester(d)
    got = s.lookup_fuzzy("merg", 5, contexts={"en"})
    assert [x[0] for x in got] == ["marge tree", "merge sort"]
