"""CombinedFieldQuery (sandbox BM25F): degenerate single-field identity with
plain BM25, keyword-field blending vs a brute-force oracle, stats blending."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def searcher(ray_session):
    from lucene_ray.pipelines.flagship import build_transcript_index
    from lucene_ray.search.searcher import IndexSearcher

    return IndexSearcher(build_transcript_index(SF))


def test_single_text_field_identity(searcher):
    """fields=[('text', 1.0)] must reproduce the plain SHOULD BM25 exactly:
    the norm re-encode round-trips and all pseudo stats equal the real ones."""
    from lucene_ray.search.query import CombinedFieldQuery, bool_query

    terms = ("merge", "join")
    cq = CombinedFieldQuery(terms, (("text", 1.0),))
    td_c = searcher.search(cq, k=25)
    td_p = searcher.search(bool_query(should=list(terms)), k=25)
    assert td_c.total_hits == td_p.total_hits
    assert [(h.gid, np.float32(h.score)) for h in td_c.hits] == \
        [(h.gid, np.float32(h.score)) for h in td_p.hits]


def _brute_combined(searcher, terms, fields, k):
    """Independent per-doc recomputation: dense tf/norm blending done with
    plain python/numpy over the shard sidecars."""
    from lucene_ray.index.shard import keyword_term
    from lucene_ray.pipelines.classify import _keyword_classes
    from lucene_ray.util.smallfloat import LENGTH_TABLE, int_to_byte4

    # pseudo collection stats
    doc_count, sum_ttf = 0, 0.0
    for f, w in fields:
        if f == "text":
            dc, sttf = searcher.doc_count, float(searcher.sum_ttf)
        else:
            cls = _keyword_classes(searcher, f)
            dc = sum(searcher.df(keyword_term(f, v)) for v in cls)
            sttf = float(sum(searcher.ttf(keyword_term(f, v)) for v in cls))
        doc_count = max(doc_count, dc)
        sum_ttf += w * sttf
    out = []
    for pid in searcher._pids:
        rdr = searcher.reader(pid)
        base = searcher._bases[pid]
        n = rdr.doc_count
        dl = np.zeros(n, np.float32)
        for f, w in fields:
            if f == "text":
                dl += np.float32(w) * LENGTH_TABLE[
                    np.asarray(rdr.norms, np.int64) & 0xFF]
            else:
                for v in _keyword_classes(searcher, f):
                    tid = rdr.seek_exact(keyword_term(f, v))
                    if tid >= 0:
                        docs, _ = rdr.postings(tid)
                        dl[docs] += np.float32(w)
        nb = int_to_byte4(np.floor(dl + 0.5).astype(np.int64))
        totals = np.zeros(n, np.float32)
        matched = np.zeros(n, bool)
        for t in terms:
            df = 0
            freqs = np.zeros(n, np.float32)
            for f, w in fields:
                key = t if f == "text" else keyword_term(f, t)
                d = searcher.df(key)
                if d > 0:
                    df = max(df, d)
                tid = rdr.seek_exact(key)
                if tid >= 0:
                    docs, fr = rdr.postings(tid)
                    freqs[docs] += np.float32(w) * fr
            if df == 0:
                continue
            scorer = searcher.sim.scorer(1.0, doc_count,
                                         max(1, int(round(sum_ttf))), df)
            m = freqs > 0
            matched |= m
            idx = np.nonzero(m)[0]
            totals[idx] += scorer.score(freqs[idx], nb[idx])
        for local in np.nonzero(matched)[0]:
            out.append((np.float32(totals[local]), base + int(local)))
    out.sort(key=lambda sg: (-sg[0], sg[1]))
    return out[:k], len(out)


def test_keyword_field_blending(searcher):
    """'user' both as a text token and a role keyword: the role occurrence
    adds weight*1 to tf, and every doc's norm grows by the role weight."""
    from lucene_ray.search.query import CombinedFieldQuery

    terms = ("user", "merge")
    fields = (("text", 1.0), ("role", 2.0))
    td = searcher.search(CombinedFieldQuery(terms, fields), k=30)
    expect, total = _brute_combined(searcher, terms, fields, 30)
    assert td.total_hits == total
    assert [(np.float32(h.score), h.gid) for h in td.hits] == expect
    # role matches alone must surface: every doc has a role, 1/4 are 'user'
    assert total >= searcher.doc_count // 4


def test_weight_below_one_rejected(searcher):
    from lucene_ray.search.query import CombinedFieldQuery

    with pytest.raises(ValueError):
        searcher.search(CombinedFieldQuery(("merge",), (("text", 0.5),)), k=5)
