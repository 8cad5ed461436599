"""Round-3 extras: n-gram / edge-n-gram graph stages, the infix suggester,
and LM Jelinek-Mercer similarity (brute-force oracle)."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _chain(texts, specs):
    from lucene_ray.analysis.filters import run_token_chain
    from lucene_ray.analysis.standard import tokenize_column

    lengths, flat = tokenize_column(pa.array(texts, type=pa.string()))
    return run_token_chain(flat, lengths, specs)


def test_edge_ngram_overlays():
    flat, counts, pos, norms = _chain(["search box"], ("edge_ngram:2-3",))
    toks = np.asarray(flat, dtype=object).tolist()
    assert toks == ["search", "se", "sea", "box", "bo"]
    assert pos.tolist() == [0, 0, 0, 1, 1]
    assert norms.tolist() == [2]          # overlays discounted
    assert counts.tolist() == [5]


def test_ngram_overlays():
    flat, _, pos, _ = _chain(["abcd"], ("ngram:3-3",))
    toks = np.asarray(flat, dtype=object).tolist()
    assert toks == ["abcd", "abc", "bcd"]
    assert pos.tolist() == [0, 0, 0]


def test_edge_ngram_end_to_end_prefix_term(ray_session, tmp_path):
    """An edge-n-gram index answers prefix lookups as plain TermQuerys."""
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    rows = pa.table({
        "conv_id": pa.array(["a", "b", "c"]),
        "turn_idx": pa.array([0, 0, 0], type=pa.int32()),
        "text": pa.array(["searching code", "searched result", "sorting data"]),
    })
    build_index(rd.from_arrow(rows), str(tmp_path / "idx"),
                target_docs_per_partition=100,
                token_filters=("edge_ngram:3-5",), input_desc="t")
    s = IndexSearcher(str(tmp_path / "idx"))
    assert s.count(TermQuery("sear")) == 2       # edge gram of search*
    assert s.count(TermQuery("sort")) == 1
    assert s.count(TermQuery("searching")) == 1  # original preserved


def test_suggest_infix(ray_session):
    from lucene_ray.pipelines.flagship import build_transcript_index
    from lucene_ray.search.searcher import IndexSearcher, suggest_infix

    s = IndexSearcher(build_transcript_index(SF))
    got = suggest_infix(s, "erg", k=5)           # m-erg-e
    assert any(t == "merge" for t, _ in got)
    # brute-force oracle over the union dictionary
    ttfs = {}
    for pid in s._pids:
        rdr = s.reader(pid)
        for t, ttf in zip(rdr._term_np, rdr._ttf):
            if "erg" in t:
                ttfs[t] = ttfs.get(t, 0) + int(ttf)
    expect = sorted(ttfs.items(), key=lambda x: (-x[1], x[0]))[:5]
    assert got == expect


def test_lm_jelinek_mercer_bruteforce(ray_session):
    """LMJM top-k through the engine equals a brute-force recomputation from
    decoded postings + norms."""
    from lucene_ray.pipelines.flagship import build_transcript_index
    from lucene_ray.search.query import bool_query
    from lucene_ray.search.searcher import IndexSearcher
    from lucene_ray.search.similarity import LMJelinekMercerSimilarity
    from lucene_ray.util.smallfloat import LENGTH_TABLE

    sim = LMJelinekMercerSimilarity(lam=0.3)
    s = IndexSearcher(build_transcript_index(SF), similarity=sim)
    term = "merge"
    td = s.search(bool_query(should=[term]), k=10)
    # brute force
    p_w = s.ttf(term) / s.sum_ttf
    rows = []
    for pid in s._pids:
        rdr = s.reader(pid)
        tid = rdr.seek_exact(term)
        if tid < 0:
            continue
        docs, freqs = rdr.postings(tid)
        dl = np.maximum(LENGTH_TABLE[rdr.norms[docs] & 0xFF].astype(np.float64), 1.0)
        sc = np.log(1.0 + ((1 - 0.3) * freqs / dl) / (0.3 * p_w)).astype(np.float32)
        for d, v in zip(docs, sc):
            rows.append((float(v), int(d) + s._bases[pid]))
    rows.sort(key=lambda x: (-x[0], x[1]))
    assert [(h.gid, round(h.score, 5)) for h in td.hits] == \
        [(g, round(v, 5)) for v, g in rows[:10]]


def test_expression_compiler_safety_and_values():
    import numpy as np

    from lucene_ray.search.expressions import compile_expression

    fn, names = compile_expression("_score * 2 + ln(1 + turn_idx)")
    assert names == ["_score", "turn_idx"]
    out = fn({"_score": np.array([1.0, 2.0]), "turn_idx": np.array([0.0, 3.0])})
    np.testing.assert_allclose(out, [2.0, 4.0 + np.log(4.0)])
    for evil in ("__import__('os')", "x.y", "(lambda: 1)()", "[1,2]",
                 "open('f')"):
        with pytest.raises(ValueError):
            compile_expression(evil)


def test_function_score_query(ray_session):
    """FunctionScoreQuery rescoring equals recomputing from the inner
    query's hits + doc values; runs through the actor pool identically."""
    import numpy as np

    from lucene_ray.pipelines.flagship import build_transcript_index
    from lucene_ray.search.actors import QueryService
    from lucene_ray.search.query import FunctionScoreQuery, bool_query
    from lucene_ray.search.searcher import IndexSearcher

    idx = build_transcript_index(SF)
    s = IndexSearcher(idx)
    inner = bool_query(should=["merge", "join"])
    q = FunctionScoreQuery(inner, "_score * 2 + ln(1 + turn_idx)")
    td = s.search(q, k=10)
    base = s.search(inner, k=10 ** 6, total_hits_threshold=2 ** 31 - 1)
    exp = sorted(((np.float64(h.score) * 2 + np.log(1 + h.turn_idx), h.gid)
                  for h in base.hits), key=lambda x: (-x[0], x[1]))[:10]
    assert [(round(h.score, 9), h.gid) for h in td.hits] == \
        [(round(v, 9), g) for v, g in exp]
    svc = QueryService(idx, num_actors=2)
    pooled = svc.search(q, k=10)
    svc.shutdown()
    assert [(h.gid, round(h.score, 9)) for h in pooled.hits] == \
        [(h.gid, round(h.score, 9)) for h in td.hits]


def test_simple_filters_and_length():
    from lucene_ray.analysis.filters import apply_filters_str

    assert apply_filters_str("tables", ("english_minimal",)) == "table"
    assert apply_filters_str("glass", ("english_minimal",)) == "glass"
    assert apply_filters_str("corpus", ("english_minimal",)) == "corpus"
    assert apply_filters_str("abcdef", ("truncate:3",)) == "abc"
    assert apply_filters_str("abc", ("reverse",)) == "cba"
    flat, counts, pos, norms = _chain(["a merge of things"], ("length:3-10",))
    toks = np.asarray(flat, dtype=object).tolist()
    assert toks == ["merge", "things"]
    assert pos.tolist() == [1, 3]          # gaps where short tokens were
    assert norms.tolist() == [2]


def test_highlight_sentences():
    from lucene_ray.search.highlight import highlight_sentences

    text = ("The merge ran fine. Nothing to see here. "
            "Then the join and merge both failed badly.")
    out = highlight_sentences(text, ["merge", "join"], num_passages=1)
    # best passage = the sentence with both terms
    assert out is not None and "<b>join</b>" in out and "<b>merge</b>" in out
    assert "ran fine" not in out
    assert highlight_sentences(text, ["absent"]) is None
    two = highlight_sentences(text, ["merge", "join"], num_passages=2)
    assert "ran fine" in two and " … " in two


def test_check_index_validates_vectors(ray_session, tmp_path):
    from lucene_ray.index.check import check_index
    from lucene_ray.pipelines.vsearch import build_vector_index

    idx = build_vector_index(SF, str(tmp_path / "v"))
    rep = check_index(idx, sample_terms=50)
    assert rep["ok"], rep["errors"]


def test_expression_function_library():
    """Full JavascriptCompiler function surface: trig/hyperbolic/rounding,
    logn, and haversin (LAX→BNA great-circle ≈ 2886 km, the reference's own
    SloppyMath example)."""
    import numpy as np

    from lucene_ray.search.expressions import compile_expression

    ev, vars_ = compile_expression("ceil(sin(x) + cos(x)) + logn(2, 8)")
    assert vars_ == ["x"]
    np.testing.assert_allclose(ev({"x": np.array([0.0, 1.0])}), [4.0, 5.0])
    # reference naming: haversin is KILOMETERS (JavascriptCompiler.properties
    # haversin -> haversinKilometers), haversinMeters is the meters twin
    ev2, _ = compile_expression("haversin(36.12, -86.67, 33.94, -118.40)")
    assert float(ev2({})) == pytest.approx(2_886.4484, rel=1e-4)
    ev2m, _ = compile_expression(
        "haversinMeters(36.12, -86.67, 33.94, -118.40)")
    assert float(ev2m({})) == pytest.approx(2_886_448.4, rel=1e-4)
    ev3, _ = compile_expression("atan2(floor(1.9), tanh(100))")
    assert float(ev3({})) == pytest.approx(np.arctan2(1.0, np.tanh(100.0)))
