"""CJKBigramFilter traced against the reference's TestCJKBigramFilter
fixtures (`analysis/common/src/test/.../cjk/TestCJKBigramFilter.java`),
plus the index-side chain stage and an indexed phrase test."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.analysis.filters import (
    CJK_ALL,
    CJK_HAN,
    cjk_bigram_stream,
    run_token_chain,
)
from lucene_ray.analysis.standard import analyze_detailed

JA = "多くの学生が試験に落ちた。"


def _stream(text, **kw):
    return cjk_bigram_stream(analyze_detailed(text), **kw)


def test_all_scripts_bigrams():
    # TestCJKBigramFilter.testAllScripts
    got = _stream(JA)
    assert [t[0] for t in got] == [
        "多く", "くの", "の学", "学生", "生が", "が試", "試験", "験に",
        "に落", "落ち", "ちた"]
    assert all(t[4] == "<DOUBLE>" and t[1] == 1 for t in got)
    # offsets: consecutive (i, i+2) windows
    assert [(t[2], t[3]) for t in got[:3]] == [(0, 2), (1, 3), (2, 4)]


def test_han_only():
    # TestCJKBigramFilter.testHanOnly
    got = _stream(JA, flags=CJK_HAN)
    assert [t[0] for t in got] == [
        "多", "く", "の", "学生", "が", "試験", "に", "落", "ち", "た"]
    assert [t[4] for t in got] == [
        "<SINGLE>", "<HIRAGANA>", "<HIRAGANA>", "<DOUBLE>", "<HIRAGANA>",
        "<DOUBLE>", "<HIRAGANA>", "<SINGLE>", "<HIRAGANA>", "<HIRAGANA>"]
    assert [(t[2], t[3]) for t in got] == [
        (0, 1), (1, 2), (2, 3), (3, 5), (5, 6), (6, 8), (8, 9), (9, 10),
        (10, 11), (11, 12)]
    assert all(t[1] == 1 for t in got)


def test_unigrams_and_bigrams_all_scripts():
    # TestCJKBigramFilter.testUnigramsAndBigramsAllScripts
    got = _stream(JA, flags=0xFF, output_unigrams=True)
    assert [t[0] for t in got] == [
        "多", "多く", "く", "くの", "の", "の学", "学", "学生", "生", "生が",
        "が", "が試", "試", "試験", "験", "験に", "に", "に落", "落", "落ち",
        "ち", "ちた", "た"]
    assert [t[1] for t in got] == [1, 0] * 11 + [1]
    assert [t[4] for t in got] == ["<SINGLE>", "<DOUBLE>"] * 11 + ["<SINGLE>"]


def test_unigrams_and_bigrams_han_only():
    # TestCJKBigramFilter.testUnigramsAndBigramsHanOnly
    got = _stream(JA, flags=CJK_HAN, output_unigrams=True)
    assert [t[0] for t in got] == [
        "多", "く", "の", "学", "学生", "生", "が", "試", "試験", "験",
        "に", "落", "ち", "た"]
    assert [t[1] for t in got] == [1, 1, 1, 1, 0, 1, 1, 1, 0, 1, 1, 1, 1, 1]


def test_huge_wraparound():
    # TestCJKBigramFilter.testHuge: bigrams cross the repetition boundary
    got = _stream("多くの学生が試験に落ちた" * 11)
    assert len(got) == 11 * 12 - 1
    assert got[11][0] == "た多"           # boundary bigram


def test_offset_gap_blocks_bigram():
    # unaligned offsets (whitespace) clear the queue in the reference
    got = _stream("中 国")
    assert [t[0] for t in got] == ["中", "国"]
    assert all(t[4] == "<SINGLE>" for t in got)


def test_multichar_katakana_and_hangul_runs():
    got = _stream("アイウ")
    assert [t[0] for t in got] == ["アイ", "イウ"]
    got = _stream("한국어 test")
    assert [t[0] for t in got] == ["한국", "국어", "test"]
    assert got[-1][4] == "<ALPHANUM>"


def test_mixed_script_token_passes_through():
    # mixed-script tokens are ALPHANUM in the tokenizer: never bigrammed
    got = _stream("abc中")  # tokenizer splits: 'abc' ALPHANUM + '中' HAN
    kinds = {t[0]: t[4] for t in got}
    assert kinds["abc"] == "<ALPHANUM>"
    assert kinds["中"] == "<SINGLE>"


# ---------------- chain stage + indexed phrase ----------------

def _chain(docs, spec):
    lens = np.array([len(d) for d in docs], dtype=np.int64)
    flat = pa.array([t for d in docs for t in d], type=pa.string())
    out_flat, out_lens, out_pos, norms = run_token_chain(flat, lens, (spec,))
    toks = out_flat.to_pylist()
    res, i = [], 0
    for n in out_lens:
        res.append(toks[i:i + int(n)])
        i += int(n)
    return res, out_pos, norms


def test_chain_stage_bigrams_positionally():
    docs = [["多", "く", "の"], ["test", "多", "国"], ["alpha", "beta"]]
    got, pos, norms = _chain(docs, "cjk_bigram")
    assert got[0] == ["多く", "くの"]
    assert got[1] == ["test", "多国"]     # position-adjacent han pair
    assert got[2] == ["alpha", "beta"]
    assert norms.tolist() == [2, 2, 2]


def test_chain_stage_unigram_mode_overlays():
    docs = [["多", "く"]]
    got, pos, norms = _chain(docs, "cjk_bigram:unigrams")
    assert sorted(got[0]) == ["く", "多", "多く"]
    assert norms.tolist() == [2]          # overlay bigram not counted


def test_indexed_cjk_phrase(ray_session, tmp_path_factory):
    """End-to-end: a CJK corpus indexed with the cjk preset answers a
    bigram term query and a bigram phrase query."""
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import PhraseQuery, TermQuery
    from lucene_ray.search.searcher import IndexSearcher

    docs = ["多くの学生が試験に落ちた", "学生は試験に合格した",
            "the quick brown fox", "試験の結果が出た"] * 10
    tbl = pa.table({
        "conv_id": [f"c{i:03d}" for i in range(len(docs))],
        "turn_idx": pa.array(np.zeros(len(docs), dtype=np.int32)),
        "role": ["user"] * len(docs),
        "text": docs,
        "tool": [""] * len(docs),
        "ts": pa.array(np.arange(len(docs), dtype=np.int64)),
    })
    d = str(tmp_path_factory.mktemp("cjkidx"))
    build_index(rd.from_arrow(tbl), d, target_docs_per_partition=20,
                token_filters=("cjk_width", "cjk_bigram"), input_desc="cjk")
    s = IndexSearcher(d)
    # '試験' is a bigram term in 3 of the 4 doc templates
    assert s.count(TermQuery("試験")) == 30
    # consecutive bigrams form a phrase: 学生が → bigrams 学生, 生が
    assert s.count(PhraseQuery(("学生", "生が"))) == 10
    assert s.count(TermQuery("quick")) == 10      # non-CJK passthrough