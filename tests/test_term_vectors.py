"""Term vectors (the doc-major transpose of the inversion —
`codecs/lucene90/Lucene90TermVectorsFormat.java` semantics): per-doc
(term, freq, positions) agree with re-analysis of the source text, exclude
keyword-namespace terms, survive append, and feed MoreLikeThis-from-docID."""

from collections import Counter

import numpy as np
import pytest

import lucene_ray.analysis.standard as std
from lucene_ray.index.build import append_index, build_index
from lucene_ray.index.check import check_index
from lucene_ray.search.searcher import IndexSearcher, more_like_this, \
    more_like_this_doc
from lucene_ray.sources.transcripts import synth_transcripts

N = 1200


@pytest.fixture(scope="module")
def tv_index(ray_session, tmp_path_factory):
    import ray.data as rd

    t = synth_transcripts(N, seed=77)
    d = str(tmp_path_factory.mktemp("tvidx"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=400,
                keyword_cols=("role",), term_vectors=True, input_desc="tv")
    ts = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    texts = ts.column("text").to_pylist()
    return d, texts


def test_term_vector_matches_reanalysis(tv_index):
    d, texts = tv_index
    s = IndexSearcher(d)
    rng = np.random.default_rng(5)
    for gid in rng.integers(0, len(texts), size=40):
        gid = int(gid)
        pid = next(p for p in s._pids
                   if s._bases[p] <= gid < s._bases[p] + s.reader(p).doc_count)
        rdr = s.reader(pid)
        tids, freqs, poss = rdr.term_vector(gid - s._bases[pid],
                                            with_positions=True)
        toks = std.analyze(texts[gid]) if texts[gid] else []
        want = Counter(toks)
        got = {str(rdr._term_np[int(t)]): int(f) for t, f in zip(tids, freqs)}
        assert got == dict(want), gid
        # keyword-namespace terms are excluded
        assert all("\x1f" not in t for t in got)
        # positions reproduce the token stream
        for tid, pos in zip(tids, poss):
            term = str(rdr._term_np[int(tid)])
            expect_pos = [i for i, tk in enumerate(toks) if tk == term]
            assert list(pos) == expect_pos, (gid, term)


def test_checkindex_validates_term_vectors(tv_index):
    d, _ = tv_index
    out = check_index(d, sample_terms=50)
    assert out["errors"] == []


def test_append_inherits_term_vectors(tv_index, tmp_path_factory):
    import ray.data as rd

    d, texts = tv_index
    import shutil

    d2 = str(tmp_path_factory.mktemp("tvapp"))
    shutil.copytree(d, d2, dirs_exist_ok=True)
    extra = synth_transcripts(300, seed=99)
    append_index(rd.from_arrow(extra), d2, input_desc="tv-extra")
    s = IndexSearcher(d2)
    # the appended shards carry term vectors too
    last_pid = max(s._pids)
    rdr = s.reader(last_pid)
    assert rdr.has_term_vectors
    tids, freqs = rdr.term_vector(0)
    ts = extra.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    toks = std.analyze(ts.column("text")[0].as_py())
    got = {str(rdr._term_np[int(t)]): int(f) for t, f in zip(tids, freqs)}
    assert got == dict(Counter(toks))


def test_mlt_from_doc_matches_mlt_from_text(tv_index):
    d, texts = tv_index
    s = IndexSearcher(d)
    rng = np.random.default_rng(11)
    checked = 0
    for gid in rng.integers(0, len(texts), size=30):
        gid = int(gid)
        if not texts[gid]:
            continue
        q_doc = more_like_this_doc(s, gid, min_term_freq=1, min_doc_freq=2)
        q_txt = more_like_this(s, texts[gid], min_term_freq=1, min_doc_freq=2)
        assert q_doc == q_txt, gid
        checked += 1
    assert checked >= 20
