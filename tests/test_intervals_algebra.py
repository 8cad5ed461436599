"""Full intervals algebra (`queries/intervals/`): minimal-interval
semantics per combinator vs an independent brute-force enumerator;
IntervalsSourceQuery scoring (saturation freq formula); end-to-end over a
small built index including multi-term leaves and atLeast."""

import itertools

import numpy as np
import pytest
import ray.data as rd

from lucene_ray.index.build import build_index
from lucene_ray.search import intervals as iv
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.sources.transcripts import synth_transcripts

# ---- brute-force oracle over explicit token lists ----


def _brute(src, toks):
    """Enumerate ALL satisfying intervals by definition, then minimalize."""
    n = len(toks)

    def sat(s, e, node):
        """Does window [s,e] exactly equal a satisfying interval?"""
        return (s, e) in all_ivals(node)

    def all_ivals(node):
        if isinstance(node, iv.Term):
            return {(i, i) for i, t in enumerate(toks) if t == node.term}
        if isinstance(node, iv.Combine):
            if node.kind == "unordered":
                # duplicate sub-sources require DISTINCT occurrences:
                # the reference's RepeatingIntervalsSource windows
                from collections import Counter

                cnt = Counter(node.subs)
                subs = []
                for x, c in cnt.items():
                    base = sorted(all_ivals(x))
                    if c > 1:
                        base = ([] if len(base) < c else
                                [(base[i][0], base[i + c - 1][1])
                                 for i in range(len(base) - c + 1)])
                    subs.append(base)
            else:
                subs = [sorted(all_ivals(x)) for x in node.subs]
            if any(not s for s in subs):
                return set()
            out = set()
            for combo in itertools.product(*subs):
                if node.kind == "ordered":
                    ok = all(combo[i + 1][0] > combo[i][1]
                             for i in range(len(combo) - 1))
                elif node.kind == "block":
                    ok = all(combo[i + 1][0] == combo[i][1] + 1
                             for i in range(len(combo) - 1))
                else:
                    ok = True
                if ok:
                    out.add((min(c[0] for c in combo),
                             max(c[1] for c in combo)))
            return set(iv._minimalize(out))
        if isinstance(node, iv.Or):
            out = set()
            for x in node.subs:
                out |= all_ivals(x)
            return set(iv._minimalize(out))
        if isinstance(node, iv.AtLeast):
            subs = [sorted(all_ivals(x)) for x in node.subs]
            out = set()
            for combo_sources in itertools.combinations(
                    [s for s in subs if s], node.n):
                for combo in itertools.product(*combo_sources):
                    out.add((min(c[0] for c in combo),
                             max(c[1] for c in combo)))
            return set(iv._minimalize(out))
        if isinstance(node, iv.Filtered):
            ivals = all_ivals(node.source)
            if node.kind == "maxwidth":
                return {x for x in ivals if x[1] - x[0] + 1 <= node.limit}
            # gaps approximation (width - minExtent): exact while the
            # generator keeps width-1 leaves under every Combine (depth>=2
            # forces terms); the true per-match slop accounting is pinned
            # by tests/test_intervals_reference.py's maxgaps vectors
            me = node.source.min_extent()
            return {x for x in ivals
                    if (x[1] - x[0] + 1) - me <= node.limit}
        if isinstance(node, iv.Extend):
            return {(max(0, s - node.before), min(iv.MAX_POS, e + node.after))
                    for s, e in all_ivals(node.source)}
        if isinstance(node, iv.Offset):
            out = set()
            for s, e in all_ivals(node.source):
                p = s - 1 if node.at_start else e + 1
                if p >= 0:
                    out.add((p, p))
            return set(iv._minimalize(out))
        if isinstance(node, iv.Relate):
            src_ = all_ivals(node.source)
            ref = all_ivals(node.reference)
            k = node.kind

            def c(a, b):
                return a[0] <= b[0] and a[1] >= b[1]

            def ov(a, b):
                return a[0] <= b[1] and b[0] <= a[1]

            if k == "containing":
                return {a for a in src_ if any(c(a, b) for b in ref)}
            if k == "contained_by":
                return {a for a in src_ if any(c(b, a) for b in ref)}
            if k == "not_containing":
                return {a for a in src_ if not any(c(a, b) for b in ref)}
            if k == "not_contained_by":
                return {a for a in src_ if not any(c(b, a) for b in ref)}
            if k == "overlapping":
                return {a for a in src_ if any(ov(a, b) for b in ref)}
            return {a for a in src_ if not any(ov(a, b) for b in ref)}
        raise TypeError(type(node).__name__)

    return sorted(all_ivals(src))


def _engine(src, toks):
    ctx = {}
    for i, t in enumerate(toks):
        ctx.setdefault(t, []).append(i)
    ctx = {t: np.array(p, dtype=np.int64) for t, p in ctx.items()}
    return sorted(src.doc_intervals(ctx))


VOCAB = list("abcd")


def _random_source(rng, depth=0):
    kind = rng.choice(["term"] if depth >= 2 else
                      ["term", "term", "ordered", "unordered", "or",
                       "block", "maxwidth", "maxgaps", "atleast",
                       "containing", "contained_by", "not_containing",
                       "not_contained_by", "overlapping", "non_overlapping",
                       "extend"])
    if kind == "term":
        return iv.Term(rng.choice(VOCAB))
    if kind in ("ordered", "unordered", "block"):
        n = int(rng.integers(2, 4))
        return iv.Combine(kind, tuple(_random_source(rng, depth + 1)
                                      for _ in range(n)))
    if kind == "or":
        n = int(rng.integers(2, 4))
        return iv.Or(tuple(_random_source(rng, depth + 1) for _ in range(n)))
    if kind == "atleast":
        n = int(rng.integers(2, 5))
        m = int(rng.integers(1, n))
        return iv.AtLeast(m, tuple(_random_source(rng, depth + 1)
                                   for _ in range(n)))
    if kind in ("maxwidth", "maxgaps"):
        return iv.Filtered(kind, int(rng.integers(0, 6)),
                           _random_source(rng, depth + 1))
    if kind == "extend":
        return iv.Extend(_random_source(rng, depth + 1),
                         int(rng.integers(0, 3)), int(rng.integers(0, 3)))
    return iv.Relate(kind, _random_source(rng, depth + 1),
                     _random_source(rng, depth + 1))


def test_randomized_vs_brute_force():
    rng = np.random.default_rng(1234)
    for trial in range(300):
        toks = [str(rng.choice(VOCAB)) for _ in range(int(rng.integers(1, 14)))]
        src = _random_source(rng)
        assert _engine(src, toks) == _brute(src, toks), \
            f"trial {trial}: {src} over {toks}"


def test_hand_cases():
    toks = "a b c a c b".split()
    assert _engine(iv.ordered(iv.term("a"), iv.term("b")), toks) == \
        [(0, 1), (3, 5)]
    assert _engine(iv.phrase("a", "b"), toks) == [(0, 1)]
    assert _engine(iv.unordered(iv.term("b"), iv.term("a")), toks) == \
        [(0, 1), (1, 3), (3, 5)]
    assert _engine(iv.maxgaps(0, iv.ordered(iv.term("a"), iv.term("c"))),
                   toks) == [(3, 4)]
    # within: 'a' within 1 position of 'c'
    assert _engine(iv.within(iv.term("a"), 1, iv.term("c")), toks) == [(3, 3)]
    assert _engine(iv.before(iv.term("a"), iv.term("b")), toks) == [(0, 0), (3, 3)]
    assert _engine(iv.after(iv.term("c"), iv.term("b")), toks) == [(2, 2), (4, 4)]
    assert _engine(iv.unordered_no_overlaps(iv.term("a"), iv.term("c")),
                   toks) == [(0, 2), (2, 3), (3, 4)]
    assert _engine(iv.at_least(2, iv.term("a"), iv.term("b"), iv.term("z")),
                   toks) == [(0, 1), (1, 3), (3, 5)]


@pytest.fixture(scope="module")
def iv_index(ray_session, tmp_path_factory):
    t = synth_transcripts(900, seed=11)
    d = str(tmp_path_factory.mktemp("ivx"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=300,
                input_desc="ivx900")
    texts = {(c, int(i)): x for c, i, x in
             zip(t.column("conv_id").to_pylist(),
                 t.column("turn_idx").to_pylist(),
                 t.column("text").to_pylist())}
    return IndexSearcher(d), texts


def test_end_to_end_scoring(iv_index):
    s, texts = iv_index
    q = iv.IntervalsSourceQuery(iv.ordered(iv.term("merge"), iv.term("join")))
    td = s.search(q, k=1000, total_hits_threshold=2**31 - 1)
    # every hit's score must equal the saturation formula recomputed from
    # the doc's own token positions
    from lucene_ray.analysis.standard import analyze

    for h in td.hits:
        toks = analyze(texts[(h.conv_id, int(h.turn_idx))])
        ivals = _engine(iv.ordered(iv.term("merge"), iv.term("join")), toks)
        assert ivals, "hit must contain an ordered (merge, join) interval"
        me = 2
        freq = np.float32(0.0)
        for st, en in ivals:
            freq += np.float32(1.0 / max((en - st + 1) - me + 1, 1))
        want = np.float32(1.0) * freq / (freq + np.float32(1.0))
        assert h.score == pytest.approx(float(want), rel=1e-6)
    # sanity: matches exist and are fewer than the disjunction
    assert 0 < td.total_hits < s.doc_count


def test_multiterm_leaf_and_atleast_end_to_end(iv_index):
    s, _ = iv_index
    q = iv.IntervalsSourceQuery(
        iv.maxwidth(8, iv.unordered(iv.prefix("mer"), iv.term("join"))))
    td = s.search(q, k=50, total_hits_threshold=2**31 - 1)
    assert td.total_hits > 0
    q2 = iv.IntervalsSourceQuery(
        iv.at_least(2, iv.term("merge"), iv.term("join"), iv.term("sort")))
    td2 = s.search(q2, k=50, total_hits_threshold=2**31 - 1)
    base = s.search(iv.IntervalsSourceQuery(
        iv.unordered(iv.term("merge"), iv.term("join"))), k=50,
        total_hits_threshold=2**31 - 1)
    assert td2.total_hits >= base.total_hits


def test_analyzed_text():
    src = iv.analyzed_text("Merge JOIN", max_gaps=0)
    toks = "a merge join b merge x join".split()
    # maxgaps=0 ordered = adjacent pair only
    assert _engine(src, toks) == [(1, 2)]
    assert iv.analyzed_text("merge") == iv.Term("merge")
    assert _engine(iv.analyzed_text("merge join", max_gaps=1), toks) == \
        [(1, 2), (4, 6)]


def test_payload_filtered_term(ray_session, tmp_path_factory):
    """Intervals.term(term, payloadFilter)
    (PayloadFilteredTermIntervalsSource): only occurrences whose payload
    passes the predicate produce intervals — verified against a
    per-document recount from the source corpus."""
    import pyarrow as pa

    rng = np.random.default_rng(5)
    texts, parsed = [], []
    for i in range(120):
        toks, doc = [], []
        for _ in range(int(rng.integers(2, 10))):
            w = ["alpha", "beta", "gamma"][int(rng.integers(0, 3))]
            if rng.random() < 0.6:
                p = float(np.float32(round(float(rng.uniform(0, 4)), 2)))
                toks.append(f"{w}|{p}")
                doc.append((w, p))
            else:
                toks.append(w)
                doc.append((w, None))
        texts.append(" ".join(toks))
        parsed.append(doc)
    rows = pa.table({
        "conv_id": pa.array([f"conv-{i:08d}" for i in range(120)]),
        "turn_idx": pa.array([0] * 120, type=pa.int32()),
        "text": pa.array(texts)})
    d = str(tmp_path_factory.mktemp("ivpay"))
    build_index(rd.from_arrow(rows), d, target_docs_per_partition=50,
                token_filters=("tokenizer:whitespace", "delimited_payload:|"),
                input_desc="ivpay")
    s = IndexSearcher(d)
    src = iv.PayloadFilteredTerm(
        "alpha", lambda vals, found: found & (vals >= 2.0))
    td = s.search(iv.IntervalsSourceQuery(src), k=500,
                  total_hits_threshold=2**31 - 1)
    want = {i for i, doc in enumerate(parsed)
            if any(w == "alpha" and p is not None and np.float32(p) >= 2.0
                   for w, p in doc)}
    assert {h.gid for h in td.hits} == want
    assert td.total_hits == len(want)


def test_fast_ordered_pair_parity(iv_index, monkeypatch):
    """The vectorized ordered-pair path returns bit-identical results to
    the generic per-doc tree walk (scores, docIDs, totals), with and
    without a maxgaps/maxwidth wrapper."""
    s, _ = iv_index
    queries = [
        iv.IntervalsSourceQuery(iv.ordered(iv.term("merge"), iv.term("join"))),
        iv.IntervalsSourceQuery(
            iv.maxgaps(3, iv.ordered(iv.term("merge"), iv.term("join")))),
        iv.IntervalsSourceQuery(
            iv.maxwidth(5, iv.ordered(iv.term("sort"), iv.term("data"))),
            pivot=0.5, exp=2.0, boost=3.0),
    ]
    fast = [s.search(q, k=200, total_hits_threshold=2**31 - 1)
            for q in queries]
    monkeypatch.setattr(iv, "_is_ordered_pair", lambda src: False)
    slow = [s.search(q, k=200, total_hits_threshold=2**31 - 1)
            for q in queries]
    for a, b in zip(fast, slow):
        assert a.total_hits == b.total_hits
        assert [(h.gid, h.score) for h in a.hits] == \
            [(h.gid, h.score) for h in b.hits]


def test_fast_within_pair_parity(iv_index, monkeypatch):
    s, _ = iv_index
    queries = [
        iv.IntervalsSourceQuery(iv.within(iv.term("merge"), 3,
                                          iv.term("join"))),
        iv.IntervalsSourceQuery(iv.within(iv.term("data"), 1,
                                          iv.term("sort")), boost=2.0),
    ]
    fast = [s.search(q, k=200, total_hits_threshold=2**31 - 1)
            for q in queries]
    monkeypatch.setattr(iv, "_is_within_pair", lambda src: False)
    slow = [s.search(q, k=200, total_hits_threshold=2**31 - 1)
            for q in queries]
    for a, b in zip(fast, slow):
        assert a.total_hits == b.total_hits
        assert [(h.gid, h.score) for h in a.hits] == \
            [(h.gid, h.score) for h in b.hits]


def test_fast_atleast2_parity(iv_index, monkeypatch):
    s, _ = iv_index
    queries = [
        iv.IntervalsSourceQuery(iv.at_least(2, iv.term("merge"),
                                            iv.term("join"), iv.term("sort"))),
        iv.IntervalsSourceQuery(iv.unordered(iv.term("merge"),
                                             iv.term("join"))),
        iv.IntervalsSourceQuery(iv.at_least(2, iv.term("data"),
                                            iv.term("data"), iv.term("sort"))),
        iv.IntervalsSourceQuery(iv.at_least(2, iv.term("merge"),
                                            iv.term("zzznope"),
                                            iv.term("join"))),
    ]
    fast = [s.search(q, k=300, total_hits_threshold=2**31 - 1)
            for q in queries]
    monkeypatch.setattr(iv, "_is_atleast2_terms", lambda src: False)
    slow = [s.search(q, k=300, total_hits_threshold=2**31 - 1)
            for q in queries]
    for qi, (a, b) in enumerate(zip(fast, slow)):
        assert a.total_hits == b.total_hits, qi
        assert [(h.gid, h.score) for h in a.hits] == \
            [(h.gid, h.score) for h in b.hits], qi


def test_fast_paths_randomized_parity(ray_session, tmp_path_factory,
                                      monkeypatch):
    """Randomized shard-level parity: vectorized ordered/within/atLeast
    paths vs the generic tree walk over a random small-vocab corpus
    (absent terms, repeats, overlapping positions all exercised)."""
    import pyarrow as pa

    rng = np.random.default_rng(77)
    texts = [" ".join(str(rng.choice(VOCAB + ["zz"]))
                      for _ in range(int(rng.integers(1, 18))))
             for _ in range(300)]
    t = pa.table({"conv_id": pa.array([f"conv-{i:08d}" for i in range(300)]),
                  "turn_idx": pa.array([0] * 300, type=pa.int32()),
                  "text": pa.array(texts)})
    d = str(tmp_path_factory.mktemp("ivfuzz"))
    build_index(rd.from_arrow(t), d, target_docs_per_partition=120,
                input_desc="ivfuzz300")
    s = IndexSearcher(d)
    qs = []
    for _ in range(40):
        a, b, c = (str(rng.choice(VOCAB + ["zz", "qq"])) for _ in range(3))
        kind = rng.choice(["ordered", "within", "atleast", "unordered",
                           "ordered_mg", "ordered_mw"])
        if kind == "ordered":
            src = iv.ordered(iv.term(a), iv.term(b))
        elif kind == "ordered_mg":
            src = iv.maxgaps(int(rng.integers(0, 4)),
                             iv.ordered(iv.term(a), iv.term(b)))
        elif kind == "ordered_mw":
            src = iv.maxwidth(int(rng.integers(1, 6)),
                              iv.ordered(iv.term(a), iv.term(b)))
        elif kind == "within":
            src = iv.within(iv.term(a), int(rng.integers(0, 4)), iv.term(b))
        elif kind == "unordered":
            src = iv.unordered(iv.term(a), iv.term(b))
        else:
            src = iv.at_least(2, iv.term(a), iv.term(b), iv.term(c))
        qs.append(iv.IntervalsSourceQuery(src, pivot=float(rng.uniform(0.5, 2))))
    fast = [s.search(q, k=400, total_hits_threshold=2**31 - 1) for q in qs]
    monkeypatch.setattr(iv, "_is_ordered_pair", lambda src: False)
    monkeypatch.setattr(iv, "_is_within_pair", lambda src: False)
    monkeypatch.setattr(iv, "_is_atleast2_terms", lambda src: False)
    slow = [s.search(q, k=400, total_hits_threshold=2**31 - 1) for q in qs]
    for qi, (x, y) in enumerate(zip(fast, slow)):
        assert x.total_hits == y.total_hits, qs[qi]
        assert [(h.gid, h.score) for h in x.hits] == \
            [(h.gid, h.score) for h in y.hits], qs[qi]
