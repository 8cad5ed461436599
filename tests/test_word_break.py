"""WordBreakSpellChecker surfaces (`suggest/spell/WordBreakSpellChecker.java`):
run-together terms split into dictionary words; adjacent terms combined when
the concatenation is a dictionary word."""

import pyarrow as pa
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.search.searcher import (
    IndexSearcher,
    suggest_word_breaks,
    suggest_word_combinations,
)


@pytest.fixture(scope="module")
def wb_index(ray_session, tmp_path_factory):
    texts = [
        "merge the join carefully",
        "merge sort is stable",
        "join the data now",
        "mergejoin is one word here",
        "data base versus database",
    ]
    rows = pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(len(texts))]),
        "turn_idx": pa.array([0] * len(texts), type=pa.int32()),
        "text": pa.array(texts),
    })
    import ray.data as rd

    idx = str(tmp_path_factory.mktemp("wb") / "idx")
    build_index(rd.from_arrow(rows), idx, target_docs_per_partition=100,
                input_desc="wb")
    return IndexSearcher(idx)


def test_word_breaks_basic(wb_index):
    # "mergejoin" IS an index word -> gated under the default mode
    assert suggest_word_breaks(wb_index, "mergejoin") == []
    got = suggest_word_breaks(wb_index, "mergejoin", suggest_mode="always")
    parts = [p for p, _ in got]
    assert ("merge", "join") in parts
    # NUM_CHANGES_THEN_MAX_FREQUENCY rank: fewest breaks, then MAX part df
    top_parts, top_df = got[0]
    assert top_parts == ("merge", "join")
    assert top_df == max(wb_index.df("merge"), wb_index.df("join"))
    # a non-indexed run-together term suggests under the default mode
    got2 = suggest_word_breaks(wb_index, "joindata")
    assert ("join", "data") in [p for p, _ in got2]


def test_word_breaks_multi_split(wb_index):
    # "mergejoindata" needs 2 breaks
    got = suggest_word_breaks(wb_index, "mergejoindata", max_changes=3)
    assert ("merge", "join", "data") in [p for p, _ in got]
    # with max_changes=1 the 3-way split is out of reach
    got1 = suggest_word_breaks(wb_index, "mergejoindata", max_changes=1)
    assert ("merge", "join", "data") not in [p for p, _ in got1]


def test_word_breaks_no_garbage(wb_index):
    assert suggest_word_breaks(wb_index, "zzzqqqxxx") == []
    # the reference default mode returns NOTHING for an in-index term
    assert suggest_word_breaks(wb_index, "database") == []
    # SUGGEST_ALWAYS still only returns real splits
    got = suggest_word_breaks(wb_index, "database", suggest_mode="always")
    for parts, _ in got:
        assert all(wb_index.df(p) > 0 for p in parts)
    assert ("data", "base") in [p for p, _ in got]


def test_word_combinations(wb_index):
    got = suggest_word_combinations(wb_index, ["merge", "join", "now"])
    assert got and got[0][1] == "mergejoin" and got[0][0] == (0, 1)
    assert got[0][2] == wb_index.df("mergejoin") and got[0][3] == 1
    got2 = suggest_word_combinations(wb_index, ["data", "base"])
    assert got2[0][1] == "database"
    assert suggest_word_combinations(wb_index, ["now", "stable"]) == []


def test_word_combinations_reference_vectors(ray_session, tmp_path_factory):
    """TestWordBreakSpellChecker.testCombiningWords, transcribed: the
    hun/dred/eight/y/eight corpus, 2- and 3-term combinations, queue
    order, and the SUGGEST_WHEN_NOT_IN_INDEX gate."""
    import pyarrow as pa
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.searcher import IndexSearcher

    texts = ["one hundred eight", "eighty eight", "yeight one",
             "hundredeight hundred", "eightyeight eighty", "yeight two",
             "tres y cinco"]     # provides 'y' (the reference corpus doc)
    t = pa.table({
        "conv_id": pa.array([f"w{i:02d}" for i in range(len(texts))]),
        "turn_idx": pa.array([0] * len(texts), type=pa.int32()),
        "text": pa.array(texts),
    })
    d = str(tmp_path_factory.mktemp("wbc"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=16,
                input_desc="wbc")
    s = IndexSearcher(d)
    terms = ["one", "hun", "dred", "eight", "y", "eight"]
    cs = suggest_word_combinations(s, terms, k=10, max_changes=3)
    combos = [(c[0], c[1], c[3]) for c in cs]
    # three 2-term combos (score 1) first, then the 3-term (score 2) ones
    assert ((1, 2), "hundred", 1) in combos[:3]
    assert ((3, 4), "eighty", 1) in combos[:3]
    assert ((4, 5), "yeight", 1) in combos[:3]
    assert {( (1, 2, 3), "hundredeight", 2), ((3, 4, 5), "eightyeight", 2)} \
        <= set(combos[3:])
    # WHEN_NOT_IN_INDEX: only combos containing an absent original term
    # survive ("hun"/"dred" are not index words; eight/y/eight all are)
    cs2 = suggest_word_combinations(s, terms, k=5,
                                    suggest_mode="when_not_in_index",
                                    max_changes=3)
    combos2 = [(c[0], c[1]) for c in cs2]
    assert combos2[0] == ((1, 2), "hundred")
    assert ((1, 2, 3), "hundredeight") in combos2
    assert all("y" != c[1] for c in cs2)
    assert not any(c[1] in ("eighty", "yeight", "eightyeight")
                   for c in cs2)


def test_direct_spell_suggest_full_surface(ray_session, tmp_path_factory):
    """DirectSpellChecker.suggestSimilar with the full gate/knob surface:
    query-length and frequency gates, WHEN_NOT_IN_INDEX, candidate df
    floors, 1 - d/min(len) scoring with the accuracy cutoff, comparator
    order, prefix = max(minPrefix, ed-1)."""
    import pyarrow as pa
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.searcher import IndexSearcher, direct_spell_suggest

    texts = (["query merge data"] * 6 + ["quern appears here"] * 3
             + ["qtern shares one prefix char"] * 2)
    t = pa.table({
        "conv_id": pa.array([f"d{i:02d}" for i in range(len(texts))]),
        "turn_idx": pa.array([0] * len(texts), type=pa.int32()),
        "text": pa.array(texts),
    })
    d = str(tmp_path_factory.mktemp("dss"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=32,
                input_desc="dss")
    s = IndexSearcher(d)

    got = direct_spell_suggest(s, "querz", max_query_frequency=1.0)
    # querz: query d=1 (0.8), quern d=1 (0.8), qtern d=2 (0.6); score
    # ties break freq desc
    assert [g[0] for g in got] == ["query", "quern", "qtern"]
    assert [g[1] for g in got] == [0.8, 0.8, 0.6]
    assert got[0][2] == 6 and got[1][2] == 3
    # accuracy cutoff removes the d=2 candidate
    got = direct_spell_suggest(s, "querz", accuracy=0.75,
                               max_query_frequency=1.0)
    assert [g[0] for g in got] == ["query", "quern"]
    # frequency comparator: freq first
    got = direct_spell_suggest(s, "querz", comparator="frequency",
                               max_query_frequency=1.0)
    assert got[0][0] == "query"
    # gates: too short / in index / too frequent
    assert direct_spell_suggest(s, "que") == []
    assert direct_spell_suggest(s, "query") == []
    # maxQueryFrequency gates terms PRESENT above the cutoff (df 0
    # always passes: ceil(0*maxDoc) == 0 is not exceeded)
    assert direct_spell_suggest(s, "quern", suggest_mode="always",
                                max_query_frequency=0.0001) == []
    # prefix = max(minPrefix, ed-1): 'qtern' shares only 1 leading char,
    # so min_prefix=2 drops it (and a different-first-char word would
    # never appear at all under the default minPrefix=1)
    got = direct_spell_suggest(s, "querz", min_prefix=2,
                               max_query_frequency=1.0)
    assert "qtern" not in [g[0] for g in got]
    assert [g[0] for g in got] == ["query", "quern"]
    # MORE_POPULAR: only candidates strictly more frequent than the query
    got = direct_spell_suggest(s, "quern", suggest_mode="more_popular",
                               max_query_frequency=100)
    assert [g[0] for g in got] == ["query"]
