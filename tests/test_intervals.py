"""Interval proximity queries (ordered / unordered with max width) vs a
brute-force window oracle over the raw tokens."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.index.shard import ShardReader, write_shard
from lucene_ray.search.query import IntervalQuery
from lucene_ray.search.scorer import (
    _min_span_ordered,
    _min_span_unordered,
    search_shard_interval,
)


def brute_ordered(tokens, terms, w):
    """Exists strictly-increasing positions for terms in order, span <= w."""
    import itertools

    pls = [[i for i, t in enumerate(tokens) if t == q] for q in terms]
    if any(not p for p in pls):
        return False
    for combo in itertools.product(*pls):
        if all(combo[i] > combo[i - 1] for i in range(1, len(combo))):
            if combo[-1] - combo[0] + 1 <= w:
                return True
    return False


def brute_unordered(tokens, terms, w):
    import itertools
    from collections import Counter

    pls = [[i for i, t in enumerate(tokens) if t == q] for q in terms]
    if any(not p for p in pls):
        return False
    for combo in itertools.product(*pls):
        # one occurrence per slot; same-term slots need distinct positions
        cnt = Counter(combo)
        slot_terms = Counter(terms)
        ok = True
        for pos, c in cnt.items():
            if c > 1 and slot_terms[tokens[pos]] < c:
                ok = False
        if not ok or len(set(combo)) < len(set(combo)):
            continue
        if max(combo) - min(combo) + 1 <= w:
            return True
    return False


def test_min_span_randomized():
    rng = np.random.default_rng(8)
    vocab = list("abcd")
    for _ in range(400):
        doc = [vocab[i] for i in rng.integers(0, 4, size=rng.integers(3, 14))]
        nterms = int(rng.integers(2, 4))
        terms = [vocab[i] for i in rng.integers(0, 4, size=nterms)]
        pls = [np.array([i for i, t in enumerate(doc) if t == q], dtype=np.int64)
               for q in terms]
        if any(len(p) == 0 for p in pls):
            continue
        for w in (1, 2, 3, 5, 8):
            got_o = _min_span_ordered(pls) <= w
            want_o = brute_ordered(doc, terms, w)
            assert got_o == want_o, (doc, terms, w, "ordered")
        # unordered with distinct terms only (repeat-slot semantics differ
        # from the naive product oracle)
        if len(set(terms)) == len(terms):
            for w in (1, 2, 3, 5, 8):
                got_u = _min_span_unordered(pls) <= w
                want_u = brute_unordered(doc, terms, w)
                assert got_u == want_u, (doc, terms, w, "unordered")


@pytest.fixture(scope="module")
def iv_shard(tmp_path_factory):
    texts = [
        "merge x join",             # ordered span 3
        "join merge",               # unordered span 2, not ordered
        "merge a b c d e join",     # span 7
        "merge join",               # span 2
        "join x x x merge",         # unordered span 5
        "merge only here",
        "only join here",
        "nothing at all",
    ]
    t = pa.table({
        "conv_id": pa.array([f"c{i:03d}" for i in range(len(texts))]),
        "turn_idx": pa.array([0] * len(texts), type=pa.int32()),
        "text": pa.array(texts),
    })
    d = str(tmp_path_factory.mktemp("ivshard"))
    write_shard(d, 0, t, "ivfp")
    return ShardReader(f"{d}/shard-00000"), [x.split() for x in texts]


@pytest.mark.parametrize("w,ordered", [(2, True), (3, True), (5, True), (7, True),
                                       (2, False), (5, False), (7, False)])
def test_shard_interval_matches_brute(iv_shard, w, ordered):
    rdr, docs = iv_shard
    sc, cand, total, _ = search_shard_interval(rdr, ("merge", "join"), w, ordered,
                                               1.0, k=20)
    brute = brute_ordered if ordered else brute_unordered
    expect = {i for i, toks in enumerate(docs) if brute(toks, ["merge", "join"], w)}
    assert set(cand.tolist()) == expect, (w, ordered)
    assert total == len(expect)


def test_unordered_repeated_terms_need_distinct_occurrences(iv_shard):
    """'merge merge'~w must need TWO distinct occurrences of merge."""
    import pyarrow as pa

    from lucene_ray.index.shard import ShardReader, write_shard

    rdr, docs = iv_shard
    # docs with a single merge must NOT match ("merge", "merge")
    sc, cand, total, _ = search_shard_interval(rdr, ("merge", "merge"), 10,
                                               False, 1.0, k=20)
    expect = {i for i, toks in enumerate(docs) if toks.count("merge") >= 2}
    assert set(cand.tolist()) == expect
