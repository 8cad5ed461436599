"""Multi-valued doc values: SortedNumericDocValues / SortedSetDocValues CSR
views with per-doc canonicalization, SortedNumericSortField /
SortedSetSortField selector sorts (`search/SortedNumericSelector.java`,
`search/SortedSetSelector.java`), slow any-value range queries
(`document/SortedNumericDocValuesField.newSlowRangeQuery`,
`SortedSetDocValuesField.newSlowRangeQuery`), searchAfter paging — all vs
brute-force recomputation from the deterministic column derivations."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def mv_num_of(doc_id: int) -> list[int]:
    return [(doc_id * 7 + j * 131) % 500 for j in range(doc_id % 4)]


def mv_str_of(doc_id: int) -> list[str]:
    return sorted({f"t{(doc_id * (j * 17 + 13)) % 23:02d}"
                   for j in range(doc_id % 3)})


def doc_id_of(hit) -> int:
    return int(hit.conv_id.split("-")[1]) * 5 + hit.turn_idx


@pytest.fixture(scope="module")
def searcher(ray_session):
    from lucene_ray.pipelines.flagship import build_mv_index
    from lucene_ray.search.searcher import IndexSearcher

    return IndexSearcher(build_mv_index(SF))


def _all_hits(searcher, q):
    return searcher.search(q, k=10 ** 6, total_hits_threshold=2 ** 31 - 1).hits


def test_reader_canonicalization(searcher):
    rdr = searcher.reader(searcher._pids[0])
    offs, vals = rdr.sorted_numeric_docvalue("mv_num")
    assert len(offs) == rdr.doc_count + 1
    for d in range(min(rdr.doc_count, 300)):
        seg = vals[offs[d]:offs[d + 1]]
        assert np.all(seg[1:] >= seg[:-1])          # per-doc ascending
    soffs, ords, vocab = rdr.sorted_set_docvalue("mv_str")
    assert np.all(vocab[1:] > vocab[:-1])           # sorted vocab
    for d in range(min(rdr.doc_count, 300)):
        seg = ords[soffs[d]:soffs[d + 1]]
        assert np.all(seg[1:] > seg[:-1])           # distinct ascending ords


def test_selected_numeric_vs_brute(searcher):
    rdr = searcher.reader(searcher._pids[0])
    dm = rdr.docmap()
    conv = dm.column("conv_id").to_pylist()
    turn = dm.column("turn_idx").to_pylist()
    doc_ids = [int(c.split("-")[1]) * 5 + int(t) for c, t in zip(conv, turn)]
    for selector, fn in (("min", min), ("max", max)):
        sel = rdr.selected_numeric("mv_num", selector, missing=-7)
        expect = [fn(mv_num_of(d)) if mv_num_of(d) else -7 for d in doc_ids]
        assert sel.tolist() == expect


def test_selected_ord_vs_brute(searcher):
    rdr = searcher.reader(searcher._pids[0])
    dm = rdr.docmap()
    doc_ids = [int(c.split("-")[1]) * 5 + int(t)
               for c, t in zip(dm.column("conv_id").to_pylist(),
                               dm.column("turn_idx").to_pylist())]
    _o, _r, vocab = rdr.sorted_set_docvalue("mv_str")

    def pick(vals, selector):
        if not vals:
            return None
        c = len(vals)
        i = {"min": 0, "max": c - 1,
             "middle_min": (c - 1) // 2, "middle_max": c // 2}[selector]
        return vals[i]

    for selector in ("min", "max", "middle_min", "middle_max"):
        sel = rdr.selected_ord("mv_str", selector)
        got = [str(vocab[o]) if o >= 0 else None for o in sel]
        assert got == [pick(mv_str_of(d), selector) for d in doc_ids]


def test_sorted_numeric_sort_vs_brute(searcher):
    from lucene_ray.search.query import SortedNumericSortField, bool_query

    q = bool_query(should=["merge"])
    hits = _all_hits(searcher, q)
    for selector in ("min", "max"):
        for reverse in (False, True):
            td = searcher.search(q, k=20, sort=SortedNumericSortField(
                "mv_num", selector, reverse=reverse, missing=-1))
            key = {}
            for h in hits:
                v = mv_num_of(doc_id_of(h))
                key[h.gid] = (min(v) if selector == "min" else max(v)) \
                    if v else -1
            expect = sorted(hits, key=lambda h: (
                -key[h.gid] if reverse else key[h.gid], h.gid))[:20]
            assert [(h.gid, key[h.gid]) for h in expect] == \
                [(h.gid, int(h.fields[0])) for h in td.hits]


def test_sorted_set_sort_vs_brute(searcher):
    from lucene_ray.search.query import SortedSetSortField, bool_query

    q = bool_query(should=["merge"])
    hits = _all_hits(searcher, q)

    def pick(d, selector):
        vals = mv_str_of(d)
        if not vals:
            return None
        c = len(vals)
        return vals[{"min": 0, "max": c - 1, "middle_min": (c - 1) // 2,
                     "middle_max": c // 2}[selector]]

    for selector in ("min", "max", "middle_min", "middle_max"):
        for reverse in (False, True):
            td = searcher.search(q, k=20, sort=SortedSetSortField(
                "mv_str", selector, reverse=reverse))
            sel = {h.gid: pick(doc_id_of(h), selector) for h in hits}
            if reverse:       # string desc, missing LAST, gid asc ties
                expect = sorted(hits, key=lambda h: h.gid)
                expect.sort(key=lambda h: sel[h.gid] or "", reverse=True)
                expect.sort(key=lambda h: sel[h.gid] is None)
            else:             # missing FIRST ascending
                expect = sorted(hits, key=lambda h: (
                    sel[h.gid] is not None, sel[h.gid] or "", h.gid))
            assert [(h.gid, sel[h.gid]) for h in expect[:20]] == \
                [(h.gid, h.fields[0]) for h in td.hits]


def test_sorted_set_search_after_pages(searcher):
    from lucene_ray.search.query import SortedSetSortField, bool_query

    q = bool_query(should=["merge"])
    for selector, reverse in (("min", False), ("max", True),
                              ("middle_max", False)):
        sort = SortedSetSortField("mv_str", selector, reverse=reverse)
        full = searcher.search(q, k=30, sort=sort).hits
        paged, after = [], None
        for _ in range(3):
            td = searcher.search(q, k=10, sort=sort, after=after)
            if not td.hits:
                break
            paged.extend(td.hits)
            last = td.hits[-1]
            after = (last.fields[0], last.gid)
        assert [(h.gid, h.fields[0]) for h in paged] == \
            [(h.gid, h.fields[0]) for h in full[:len(paged)]]


def test_sorted_numeric_search_after_pages(searcher):
    from lucene_ray.search.query import SortedNumericSortField, bool_query

    q = bool_query(should=["merge"])
    sort = SortedNumericSortField("mv_num", "max", reverse=True, missing=-1)
    full = searcher.search(q, k=30, sort=sort).hits
    paged, after = [], None
    for _ in range(3):
        td = searcher.search(q, k=10, sort=sort, after=after)
        if not td.hits:
            break
        paged.extend(td.hits)
        last = td.hits[-1]
        after = (int(last.fields[0]), last.gid)
    assert [(h.gid, h.fields[0]) for h in paged] == \
        [(h.gid, h.fields[0]) for h in full[:len(paged)]]


def test_mv_range_queries_vs_brute(searcher):
    from lucene_ray.search.query import (
        SortedNumericRangeQuery,
        SortedSetRangeQuery,
    )

    n_docs = sum(searcher.reader(p).doc_count for p in searcher._pids)

    def brute_num(lo, hi):
        return sum(1 for d in range(n_docs)
                   if any(lo <= v <= hi for v in mv_num_of(d)))

    assert searcher.count(SortedNumericRangeQuery("mv_num", 100, 220)) == \
        brute_num(100, 220)
    assert searcher.count(SortedNumericRangeQuery("mv_num", 150, 150)) == \
        brute_num(150, 150)
    assert searcher.count(SortedNumericRangeQuery("mv_num", None, 3)) == \
        brute_num(-(1 << 62), 3)
    assert searcher.count(SortedNumericRangeQuery("mv_num", 495, None)) == \
        brute_num(495, 1 << 62)
    # empty range prunes to zero
    assert searcher.count(SortedNumericRangeQuery("mv_num", 800, 900)) == 0

    def brute_str(lo, hi, il, iu):
        def ok(s):
            a = (s >= lo) if il else (s > lo)
            b = (s <= hi) if iu else (s < hi)
            return a and b
        return sum(1 for d in range(n_docs)
                   if any(ok(s) for s in mv_str_of(d)))

    assert searcher.count(SortedSetRangeQuery("mv_str", "t03", "t07")) == \
        brute_str("t03", "t07", True, True)
    assert searcher.count(SortedSetRangeQuery(
        "mv_str", "t03", "t07", include_lower=False,
        include_upper=False)) == brute_str("t03", "t07", False, False)
    assert searcher.count(SortedSetRangeQuery("mv_str", None, "t01")) == \
        sum(1 for d in range(n_docs)
            if any(s <= "t01" for s in mv_str_of(d)))


def test_multi_sort_chain_with_selector(searcher):
    from lucene_ray.search.query import (
        SortField,
        SortedNumericSortField,
        bool_query,
    )

    q = bool_query(should=["merge"])
    hits = _all_hits(searcher, q)
    sorts = [SortedNumericSortField("mv_num", "min", missing=999),
             SortField("turn_idx", reverse=True)]
    td = searcher.search(q, k=15, sort=sorts)
    key = {}
    for h in hits:
        v = mv_num_of(doc_id_of(h))
        key[h.gid] = (min(v) if v else 999, -h.turn_idx, h.gid)
    expect = sorted(hits, key=lambda h: key[h.gid])[:15]
    assert [h.gid for h in expect] == [h.gid for h in td.hits]
    assert [int(h.fields[0]) for h in td.hits] == \
        [key[h.gid][0] for h in expect]


def test_dv_rewrite_vs_brute(searcher):
    """DocValuesRewriteMethod: wildcard/prefix/regexp/term-set multiterm
    queries evaluated on the mv_str SortedSet dv vocab, vs python brute
    force over the deterministic derivation."""
    import re

    from lucene_ray.search.query import (
        DocValuesRewriteQuery,
        PrefixQuery,
        RegexpQuery,
        TermInSetQuery,
        WildcardQuery,
    )

    n_docs = sum(searcher.reader(p).doc_count for p in searcher._pids)

    def brute(pred):
        return sum(1 for d in range(n_docs)
                   if any(pred(s) for s in mv_str_of(d)))

    q = DocValuesRewriteQuery("mv_str", WildcardQuery("t?2"))
    assert searcher.count(q) == brute(lambda s: re.fullmatch("t.2", s))
    q = DocValuesRewriteQuery("mv_str", PrefixQuery("t1"))
    assert searcher.count(q) == brute(lambda s: s.startswith("t1"))
    q = DocValuesRewriteQuery("mv_str", RegexpQuery("t0[13]"))
    assert searcher.count(q) == brute(lambda s: re.fullmatch("t0[13]", s))
    q = DocValuesRewriteQuery("mv_str", TermInSetQuery(("t05", "t09", "zz")))
    assert searcher.count(q) == brute(lambda s: s in ("t05", "t09"))
    # no vocab intersection -> zero
    q = DocValuesRewriteQuery("mv_str", PrefixQuery("zzz"))
    assert searcher.count(q) == 0


def test_facet_sorted_set_vs_brute(searcher):
    """SortedSetDocValuesFacetCounts: per-tag doc counts over the match
    set vs python recount; count-desc/label-asc order; dim_count."""
    from collections import Counter

    from lucene_ray.search.query import bool_query

    q = bool_query(should=["merge"])
    hits = _all_hits(searcher, q)
    want = Counter()
    dim = 0
    for h in hits:
        tags = mv_str_of(doc_id_of(h))
        dim += bool(tags)
        want.update(tags)
    top, dim_count = searcher.facet_sorted_set(q, "mv_str", top_n=8)
    assert dim_count == dim
    expect = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:8]
    assert top == expect


def test_sorted_numeric_valuesource(searcher):
    """MultiValuedLongFieldSource: selector view usable in function
    queries — FunctionRangeQuery over min(mv_num) vs brute force."""
    from lucene_ray.search.valuesource import (
        FunctionRangeQuery,
        SortedNumericFieldSource,
    )

    n_docs = sum(searcher.reader(p).doc_count for p in searcher._pids)
    src = SortedNumericFieldSource("mv_num", "min", missing=10**6)
    q = FunctionRangeQuery(src, 0.0, 120.0)
    want = sum(1 for d in range(n_docs)
               if mv_num_of(d) and 0 <= min(mv_num_of(d)) <= 120)
    assert searcher.count(q) == want


def test_sorted_numeric_set_query_vs_brute(searcher):
    """SortedNumericDocValuesField.newSlowSetQuery: any-value-in-set
    semantics vs brute force; out-of-range set values prune to nothing."""
    from lucene_ray.search.query import SortedNumericSetQuery

    n_docs = sum(searcher.reader(p).doc_count for p in searcher._pids)
    wanted = (3, 150, 499, 777)
    brute = sum(1 for d in range(n_docs)
                if any(v in wanted for v in mv_num_of(d)))
    assert searcher.count(SortedNumericSetQuery("mv_num", wanted)) == brute
    assert searcher.count(SortedNumericSetQuery("mv_num", (1234, -5))) == 0
