"""ClassicTokenizer + ClassicFilter — the reference TestClassicAnalyzer
vectors (tokenizer shapes; the analyzer's lowercase/stop stages applied
manually where the fixture includes them)."""

import pytest

from lucene_ray.analysis.chars import classic_scan, classic_token_filter


def _analyze(text):
    """ClassicAnalyzer minus stopwords: tokenize, ClassicFilter, lowercase."""
    return [classic_token_filter(t).lower() for t in classic_scan(text)]


@pytest.mark.parametrize("text,want", [
    ("B2B", ["b2b"]),
    ("2B", ["2b"]),
    ("word_having_underscore", ["word", "having", "underscore"]),
    ("some-dashed-phrase", ["some", "dashed", "phrase"]),
    ("dogs,chase,cats", ["dogs", "chase", "cats"]),
    ("ac/dc", ["ac", "dc"]),
    ("O'Reilly", ["o'reilly"]),
    ("you're", ["you're"]),
    ("she's", ["she"]),
    ("Jim's", ["jim"]),
    ("don't", ["don't"]),
    ("O'Reilly's", ["o'reilly"]),
    ("s-class", ["s", "class"]),
    ("t-com", ["t", "com"]),
    ("AT&T", ["at&t"]),
    ("Excite@Home", ["excite@home"]),
    ("www.nutch.org.", ["www.nutch.org"]),
    ("www.nutch.org", ["www.nutch.org"]),
    ("test@example.com", ["test@example.com"]),
    ("first.lastname@example.com", ["first.lastname@example.com"]),
    ("first_lastname@example.com", ["first_lastname@example.com"]),
    ("21.35", ["21.35"]),
    ("R2D2 C3PO", ["r2d2", "c3po"]),
    ("216.239.63.104", ["216.239.63.104"]),
    ("1-2-3", ["1-2-3"]),
    ("a1-b2-c3", ["a1-b2-c3"]),
    ("a1-b-c3", ["a1-b-c3"]),
    ("David has 5000 bones", ["david", "has", "5000", "bones"]),
    ("C embedded developers wanted",
     ["c", "embedded", "developers", "wanted"]),
    ("foo bar FOO BAR", ["foo", "bar", "foo", "bar"]),
    ("U.S.A.", ["usa"]),
    ("a1-b-class", ["a1-b", "class"]),
])
def test_classic_analyzer_vectors(text, want):
    assert _analyze(text) == want


def test_classic_max_token_length():
    long = "toolongtoken" * 30
    assert classic_scan(f"ab {long} xy") == ["ab", "xy"]


def test_classic_filter_is_chain_stage():
    import numpy as np
    import pyarrow as pa

    from lucene_ray.analysis.filters import run_token_chain

    flat = pa.array(["U.S.A.", "Jim's", "plain"])
    out, _l, pos, _n = run_token_chain(
        flat, np.array([3], dtype=np.int64), ("classic_filter",))
    assert out.to_pylist() == ["USA", "Jim", "plain"]
    assert pos is None


def test_classic_analyzer_preset_end_to_end(ray_session, tmp_path):
    """ClassicAnalyzer preset through a real index build: acronyms fold to
    dot-free terms, possessives strip, hosts stay whole, stops vanish."""
    import pyarrow as pa
    import ray.data as rd

    from lucene_ray.analysis.filters import analyzer_preset
    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    t = pa.table({
        "conv_id": pa.array([f"conv-{i:08d}" for i in range(6)]),
        "turn_idx": pa.array([0] * 6, type=pa.int32()),
        "text": pa.array(["The U.S.A. called Jim's host www.nutch.org."] * 6),
    })
    d = str(tmp_path / "cidx")
    build_index(rd.from_arrow(t), d, target_docs_per_partition=3,
                input_desc="classic", token_filters=analyzer_preset("classic"))
    s = IndexSearcher(d)
    assert s.count(TermQuery("usa")) == 6
    assert s.count(TermQuery("jim")) == 6
    assert s.count(TermQuery("www.nutch.org")) == 6
    assert s.count(TermQuery("the")) == 0          # stopword
