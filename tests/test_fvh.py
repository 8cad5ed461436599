"""FastVectorHighlighter (term-vector path) vs the re-analysis highlighter:
snippet parity on unfiltered indexes, phrase-aware wrapping, stemmed-index
surface-form recovery, and a timed long-doc sample."""

import time

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.search.fvh import (
    field_phrase_list,
    field_term_stack,
    fvh_highlight,
    fvh_supported,
    query_items,
)
from lucene_ray.search.highlight import highlight
from lucene_ray.search.query import PhraseQuery, TermQuery, bool_query
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.sources.transcripts import synth_transcripts


@pytest.fixture(scope="module")
def fvh_setup(ray_session, tmp_path_factory):
    import ray.data as rd

    tbl = synth_transcripts(800, seed=101)
    d = str(tmp_path_factory.mktemp("fvhidx"))
    build_index(rd.from_arrow(tbl), d, target_docs_per_partition=250,
                term_vectors=True, input_desc="fvh")
    texts = tbl.column("text").to_pylist()
    return IndexSearcher(d), texts


@pytest.fixture(scope="module")
def fvh_stemmed(ray_session, tmp_path_factory):
    import ray.data as rd

    tbl = synth_transcripts(400, seed=102)
    d = str(tmp_path_factory.mktemp("fvhstem"))
    build_index(rd.from_arrow(tbl), d, target_docs_per_partition=200,
                term_vectors=True, token_filters=("porter",),
                input_desc="fvhstem")
    texts = tbl.column("text").to_pylist()
    return IndexSearcher(d), texts


def test_supported_flag(fvh_setup, fvh_stemmed):
    assert fvh_supported(fvh_setup[0])
    assert fvh_supported(fvh_stemmed[0])     # porter is 1:1


def test_query_items_flatten():
    q = bool_query(must=["merge", PhraseQuery(("the", "data"))],
                   should=["scan"], must_not=["noise"])
    assert set(query_items(q)) == {("merge",), ("the", "data"), ("scan",)}
    # sloppy phrases degrade to single terms (no contiguous-position match)
    assert query_items(PhraseQuery(("a", "b"), slop=2)) == [("a",), ("b",)]


def test_parity_with_reanalysis_highlighter(fvh_setup):
    """Same passage policy + same match sets → identical snippets for
    term-only queries on an unfiltered index."""
    s, texts = fvh_setup
    q = bool_query(should=["merge", "join", "data"])
    td = s.search(q, k=40)
    assert td.total_hits > 0
    n_checked = 0
    for h in td.hits:
        text = texts[h.gid]
        want = highlight(text, ["merge", "join", "data"],
                         max_passage_tokens=24, num_passages=2)
        got = fvh_highlight(s, h.gid, text, q,
                            max_passage_tokens=24, num_passages=2)
        assert got == want, h.gid
        n_checked += 1
    assert n_checked >= 20


def test_phrase_aware_wrapping(fvh_setup):
    """A phrase query wraps ONLY adjacent-position matches — the
    FieldPhraseList behavior the re-analysis highlighter lacks."""
    s, texts = fvh_setup
    q = PhraseQuery(("the", "data"))
    td = s.search(q, k=10)
    assert td.total_hits > 0
    for h in td.hits[:5]:
        snip = fvh_highlight(s, h.gid, texts[h.gid], q)
        assert snip is not None
        assert "<b>the data</b>" in snip.replace("  ", " ") or \
            "<b>" in snip  # wrapped unit is the whole adjacent pair
        # no lone '<b>the</b>' wrapping where 'data' does not follow
        import re
        for m in re.finditer(r"<b>(.*?)</b>", snip):
            assert m.group(1).lower().startswith("the"), snip
            assert "data" in m.group(1).lower(), snip


def test_stemmed_index_highlights_surface_forms(fvh_stemmed):
    """On a porter-stemmed index the term vectors match stemmed terms while
    the wrapped text keeps the surface form — re-analysis set matching
    cannot do this."""
    s, texts = fvh_stemmed
    q = TermQuery("merges")               # stems to 'merg', like 'merging'
    td = s.search(q, k=20)
    assert td.total_hits > 0
    found_variant = False
    for h in td.hits:
        snip = fvh_highlight(s, h.gid, texts[h.gid], q)
        assert snip is not None and "<b>" in snip
        import re
        wrapped = [m.group(1).lower() for m in re.finditer(r"<b>(.*?)</b>", snip)]
        assert all(w.startswith("merg") for w in wrapped), snip
        found_variant |= any(w != "merges" for w in wrapped)
    assert found_variant                  # a non-identical surface form hit


def test_term_stack_and_phrase_list_shapes(fvh_setup):
    s, texts = fvh_setup
    td = s.search(PhraseQuery(("the", "data")), k=1)
    gid = td.hits[0].gid
    pid = max((p for p in s._pids if s._bases[p] <= gid),
              key=lambda p: s._bases[p])
    rdr = s.reader(pid)
    stack = field_term_stack(rdr, gid - s._bases[pid], ["the", "data"])
    assert set(stack) == {"the", "data"}
    ml = field_phrase_list(stack, [("the", "data")])
    assert ml and all(n == 2 for _, n, _ in ml)
    # every reported start really has 'data' right after 'the'
    for p0, _n, _k in ml:
        assert p0 in stack["the"] and (p0 + 1) in stack["data"]


def test_timed_long_doc_sample(ray_session, tmp_path_factory, capsys):
    """Long docs (~8k tokens, matches early): the TV path reads match
    positions from the sidecar and lazily scans offsets only up to the last
    passage window, while re-analysis tokenizes + lowers + set-matches the
    whole document.  Timed sample recorded; a lenient 1.0x assert guards
    against the fast path regressing to slower-than-re-analysis."""
    import ray.data as rd

    base = synth_transcripts(400, seed=103).column("text").to_pylist()
    long_texts = ["zqmerge zqjoin results here. " + " ".join(base[i:i + 100])
                  for i in range(0, 400, 2)]
    tbl = pa.table({
        "conv_id": [f"long-{i:04d}" for i in range(len(long_texts))],
        "turn_idx": pa.array(np.zeros(len(long_texts), dtype=np.int32)),
        "role": ["user"] * len(long_texts),
        "text": long_texts,
        "tool": [""] * len(long_texts),
        "ts": pa.array(np.arange(len(long_texts), dtype=np.int64)),
    })
    d = str(tmp_path_factory.mktemp("fvhlong"))
    build_index(rd.from_arrow(tbl), d, target_docs_per_partition=100,
                term_vectors=True, input_desc="fvhlong")
    s = IndexSearcher(d)
    q = bool_query(should=["zqmerge", "zqjoin"])
    td = s.search(q, k=20)
    gids = [h.gid for h in td.hits]
    terms = ["zqmerge", "zqjoin"]
    # warm mmaps
    for g in gids:
        assert fvh_highlight(s, g, long_texts[g], q) is not None
    t0 = time.perf_counter()
    for _ in range(5):
        for g in gids:
            fvh_highlight(s, g, long_texts[g], q)
    t_fvh = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        for g in gids:
            highlight(long_texts[g], terms)
    t_re = time.perf_counter() - t0
    print(f"\nFVH 100 highlights: {t_fvh*1000:.1f} ms; "
          f"re-analysis: {t_re*1000:.1f} ms ({t_re/t_fvh:.1f}x)")
    assert t_fvh < t_re               # the index-served path must win here
