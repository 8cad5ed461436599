"""Solr + WordNet synonym rule-file parsers and the `synmap:` replace
stage (`analysis/common/.../synonym/SolrSynonymParser.java` /
`WordnetSynonymParser.java` / SynonymMap keepOrig=false), traced against
the reference's TestSolrSynonymParser / TestWordnetSynonymParser
fixtures."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.analysis.filters import run_token_chain
from lucene_ray.analysis.synparse import (
    parse_solr_synonyms,
    parse_wordnet_synonyms,
    rules_to_specs,
)

SOLR_FILE = ("i-pod, ipod, ipoooood\n"
             "foo => foo bar\n"
             "foo => baz\n"
             "this test, that testing")

WORDNET_FILE = ("s(100000001,1,'woods',n,1,0).\n"
                "s(100000001,2,'wood',n,1,0).\n"
                "s(100000001,3,'forest',n,1,0).\n"
                "s(100000002,1,'wolfish',n,1,0).\n"
                "s(100000002,2,'ravenous',n,1,0).\n"
                "s(100000003,1,'king',n,1,1).\n"
                "s(100000003,2,'baron',n,1,1).\n"
                "s(100000004,1,'king''s evil',n,1,1).\n"
                "s(100000004,2,'king''s meany',n,1,1).\n")


def _chain(texts, specs):
    from lucene_ray.analysis.standard import tokenize_column

    lengths, flat = tokenize_column(pa.array(texts, type=pa.string()))
    return run_token_chain(flat, lengths, specs)


def test_solr_parse_simple():
    """TestSolrSynonymParser.testSimple's rule set."""
    rules = parse_solr_synonyms(SOLR_FILE, expand=True)
    s = set(rules)
    # equivalence class: all ordered pairs, keepOrig
    for a in ("i-pod", "ipod", "ipoooood"):
        for b in ("i-pod", "ipod", "ipoooood"):
            assert ((a, b, True) in s) == (a != b)
    # explicit mappings never preserve original
    assert ("foo", "foo bar", False) in s
    assert ("foo", "baz", False) in s
    assert ("this test", "that testing", True) in s
    assert ("that testing", "this test", True) in s


def test_solr_parse_noexpand_and_escapes():
    rules = parse_solr_synonyms("a, b, c", expand=False)
    assert set(rules) == {("a", "a", False), ("b", "a", False),
                          ("c", "a", False)}
    # backslash escapes: `\,` is a literal comma, `\=>` literal arrow
    rules = parse_solr_synonyms(r"a\,b, c", expand=True)
    assert set(rules) == {("a,b", "c", True), ("c", "a,b", True)}
    rules = parse_solr_synonyms(r"x\=>y => z", expand=True)
    assert set(rules) == {("x=>y", "z", False)}
    # comments and blank lines skip
    assert parse_solr_synonyms("# comment\n\n") == []
    with pytest.raises(ValueError):
        parse_solr_synonyms("a => b => c")


def test_solr_parse_analyzer_normalization():
    rules = parse_solr_synonyms("Wi-Fi, WIFI => wireless",
                                analyzer=lambda w: w.lower())
    assert set(rules) == {("wi-fi", "wireless", False),
                          ("wifi", "wireless", False)}


def test_wordnet_parse():
    """TestWordnetSynonymParser's fixture: synsets become equivalence
    classes; `''` unescapes to a quote."""
    rules = parse_wordnet_synonyms(WORDNET_FILE, expand=True)
    s = set(rules)
    for a in ("woods", "wood", "forest"):
        for b in ("woods", "wood", "forest"):
            assert ((a, b, True) in s) == (a != b)
    assert ("wolfish", "ravenous", True) in s
    assert ("king", "baron", True) in s
    assert ("king's evil", "king's meany", True) in s
    # expand=false: map to first
    rules = parse_wordnet_synonyms(WORDNET_FILE, expand=False)
    assert ("baron", "king", False) in set(rules)
    assert ("king", "king", False) in set(rules)


def test_rules_to_specs_and_overlay_chain():
    specs = rules_to_specs(parse_solr_synonyms("huge, large", expand=True))
    assert specs == ["syn:huge=large;large=huge"]
    flat, counts, pos, norms = _chain(["a huge dog"], tuple(specs))
    assert np.asarray(flat, dtype=object).tolist() == ["a", "huge", "large",
                                                       "dog"]
    assert pos.tolist() == [0, 1, 1, 2]
    assert norms.tolist() == [3]           # overlay discounted


def test_synmap_replace_single():
    """Replace semantics (keepOrig=false): source removed, first output
    takes its position and counts toward the norm."""
    specs = rules_to_specs(parse_solr_synonyms("foo => baz, qux"))
    assert specs == ["synmap:foo=baz|qux"]
    flat, counts, pos, norms = _chain(["a foo b"], tuple(specs))
    assert np.asarray(flat, dtype=object).tolist() == ["a", "baz", "qux", "b"]
    assert pos.tolist() == [0, 1, 1, 2]
    assert norms.tolist() == [3]           # baz counts, qux is an overlay


def test_synmap_replace_noexpand_class():
    """expand=false equivalence class: every member collapses to the
    first term (the legacy SYNONYM-type rewrite)."""
    specs = rules_to_specs(parse_solr_synonyms("small, tiny, minuscule",
                                               expand=False))
    flat, counts, pos, norms = _chain(["tiny dog", "minuscule cat",
                                       "small bird"], tuple(specs))
    assert np.asarray(flat, dtype=object).tolist() == [
        "small", "dog", "small", "cat", "small", "bird"]
    assert norms.tolist() == [2, 2, 2]


def test_synmap_multiword_source_gap():
    """Multi-word source consumes every constituent; following tokens keep
    their positions (flattened-graph hole)."""
    flat, counts, pos, norms = _chain(["the hash join wins"],
                                      ("synmap:hash join=hashjoin",))
    assert np.asarray(flat, dtype=object).tolist() == ["the", "hashjoin",
                                                       "wins"]
    assert pos.tolist() == [0, 1, 3]       # position 2 is a hole
    assert norms.tolist() == [3]
    with pytest.raises(ValueError):
        _chain(["x"], ("synmap:x=a b",))   # multi-word OUTPUT rejected


def test_synmap_phrase_behavior_through_index(ray_session, tmp_path):
    """End-to-end: index with a replace rule; the source term is gone from
    the index, the output is searchable, and phrases respect the hole."""
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import PhraseQuery, TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    t = pa.table({
        "conv_id": ["c0"] * 3, "turn_idx": [0, 1, 2],
        "role": ["user"] * 3,
        "ts": pa.array([0, 1, 2], type=pa.int64()),
        "text": ["the hash join wins", "plain hash table", "join now"],
    })
    d = str(tmp_path / "synmapidx")
    build_index(rd.from_arrow(t), d,
                token_filters=("synmap:hash join=hashjoin",),
                input_desc="synmap-e2e")
    s = IndexSearcher(d)
    assert s.count(TermQuery("hashjoin")) == 1
    # 'hash' survives where the 2-word rule didn't match
    assert s.count(TermQuery("hash")) == 1
    assert s.count(TermQuery("join")) == 1         # doc 2 only
    # phrase across the hole does NOT match ("hashjoin wins" has a gap)
    assert s.count(PhraseQuery(("hashjoin", "wins"))) == 0
    assert s.count(PhraseQuery(("hashjoin", "wins"), slop=1)) == 1


def test_mixed_semantics_rejected():
    with pytest.raises(ValueError):
        rules_to_specs([("a", "b", True), ("a", "c", False)])
    with pytest.raises(ValueError):
        rules_to_specs([("a;b", "c", True)])
