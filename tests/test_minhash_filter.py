"""MinHashFilter (`analysis/minhash/MinHashFilter.java`): murmur3_x64_128
parity, LongPair ordering, token-stream fixtures from the reference's
TestMinHashFilter (exact char payloads), count/rotation semantics, hex
payload indexing end-to-end."""

import numpy as np
import pyarrow as pa

from lucene_ray.analysis.filters import run_token_chain
from lucene_ray.util.hashing import murmur3_128, murmur3_128_batch


def _mh(tokens_per_doc, spec):
    flat = [t for d in tokens_per_doc for t in d]
    lengths = np.array([len(d) for d in tokens_per_doc], dtype=np.int64)
    toks, cnt, pos, norms = run_token_chain(
        pa.array(flat, type=pa.string()), lengths, (spec,))
    return [str(x) for x in toks.to_pylist()], cnt, pos, norms


# reference char fixtures (TestMinHashFilter.java:185,205-206,222-225)
HASH_WOOF5 = "".join(chr(c) for c in
                     [0x2101, 0xD33D, 0xFA85, 0x8059,
                      0x219D, 0xA1C1, 0xD671, 0x676F])
HASH_PUFF = "".join(chr(c) for c in
                    [36347, 63457, 43013, 56843, 52284, 34231, 57934, 42302])
DOC2 = ["woof woof woof woof woof", "woof woof woof woof puff"]


def test_murmur3_128_reference_values():
    # TestMinHashFilter.testIntHash / testStringHash
    h1, h2 = murmur3_128((0).to_bytes(4, "big"))
    assert h1 == (-3485513579396041028) % 2**64
    assert h2 == 6383328099726337777
    h1, h2 = murmur3_128("woof woof woof woof woof".encode("utf-16-le"))
    assert h1 == 7638079586852243959
    assert h2 == 4378804943379391304


def test_murmur3_128_batch_scalar_parity():
    import random

    rng = random.Random(7)
    items = [bytes(rng.randrange(256) for _ in range(rng.randrange(0, 50)))
             for _ in range(500)]
    items += [b"", b"a", b"0123456789abcdef", b"0123456789abcdefg"]
    b1, b2 = murmur3_128_batch(items)
    for i, it in enumerate(items):
        s1, s2 = murmur3_128_batch([it])
        assert (b1[i], b2[i]) == (s1[0], s2[0])


def test_single_input_fixture():
    # createTokenStream(5, "woof woof woof woof woof", 1, 1, 100, false)
    t, cnt, pos, norms = _mh([["woof woof woof woof woof"]],
                             "min_hash:1,1,100,chars")
    assert t == [HASH_WOOF5]
    assert list(cnt) == [1] and list(pos) == [0] and list(norms) == [1]


def test_two_hashes_fixture():
    t, *_ = _mh([["woof woof woof woof woof"]], "min_hash:2,1,1,chars")
    assert t == [
        "".join(chr(c) for c in [0, 0, 8449, 54077, 64133, 32857, 8605, 41409]),
        "".join(chr(c) for c in [0, 1, 16887, 58164, 39536, 14926, 6529, 17276]),
    ]


def test_two_shingles_fixture_and_posinc():
    # HASH_PUFF's payload contains a LONE SURROGATE code unit (0xDE0B) —
    # valid as a Java term, unrepresentable in the UTF-8 Arrow output —
    # so this fixture is verified through the 1:1 hex re-encode
    t, cnt, pos, norms = _mh([DOC2], "min_hash:1,1,100")
    assert t == ["".join(f"{ord(c):04x}" for c in s)
                 for s in (HASH_WOOF5, HASH_PUFF)]
    # one position, first token posInc 1 / second 0 => norm counts 1
    assert list(pos) == [0, 0] and list(norms) == [1]


def test_token_counts():
    # TestMinHashFilter.testTokenStream2..5 count semantics
    assert len(_mh([DOC2], "min_hash:100,1,1")[0]) == 100
    assert len(_mh([DOC2], "min_hash:10,1,10")[0]) == 20
    assert len(_mh([DOC2], "min_hash:10,10,1")[0]) == 20
    assert len(_mh([DOC2], "min_hash:10,10,1,rotate")[0]) == 100
    assert len(_mh([DOC2], "min_hash:1,100,1")[0]) == 2


def test_rotation_fill_order():
    # testTokenStream5: 100 buckets, rotation on -> 100 tokens, 2 distinct,
    # ascending runs that wrap back to the first hash
    # hex payloads preserve Java char-sequence order (0-padded %04x blocks
    # compare identically), and the chars form would hit HASH_PUFF's lone
    # surrogate
    t, *_ = _mh([DOC2], "min_hash:1,100,1,rotate")
    assert len(t) == 100 and len(set(t)) == 2
    rolled, first, last = False, t[0], None
    for cur in t[1:]:
        if last is not None:
            if not rolled:
                assert cur >= last or cur == first
                rolled = cur < last
            else:
                assert cur == first
        last = cur


def test_hex_payload_roundtrip_and_default():
    # surrogate-free input so the chars form is representable
    one = [["woof woof woof woof woof"]]
    th, *_ = _mh(one, "min_hash:2,1,1")
    tc, *_ = _mh(one, "min_hash:2,1,1,chars")
    assert th == ["".join(f"{ord(c):04x}" for c in s) for s in tc]


def test_docs_independent():
    t, cnt, _, norms = _mh([["a b c d e"], ["a b c d e"], []], "min_hash")
    assert t[0] == t[1]
    assert list(cnt) == [1, 1, 0] and list(norms) == [1, 1, 0]


def test_duplicate_shingles_collapse():
    # the per-bucket TreeSet is a set: equal hashes don't repeat
    t1, *_ = _mh([["x y z w v", "x y z w v"]], "min_hash:1,1,100")
    t2, *_ = _mh([["x y z w v"]], "min_hash:1,1,100")
    assert t1 == t2


def test_indexed_end_to_end(ray_session, tmp_path):
    """shingle -> min_hash hex terms are indexable and searchable: two docs
    sharing all shingles get identical minhash terms."""
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import TermQuery, bool_query
    from lucene_ray.search.searcher import IndexSearcher

    n = 40
    text = ["merge sort big data now" if i % 2 == 0
            else "scan filter tiny rows here" for i in range(n)]
    t = pa.table({
        "conv_id": [f"c{i:04d}" for i in range(n)],
        "turn_idx": [0] * n,
        "role": ["user"] * n,
        "ts": pa.array(range(n), type=pa.int64()),
        "text": text,
    })
    d = str(tmp_path / "mhidx")
    build_index(rd.from_arrow(t), d, target_docs_per_partition=20,
                token_filters=("shingle", "min_hash:1,16,1"),
                input_desc="minhash-e2e")
    s = IndexSearcher(d)
    # compute one doc's minhash terms directly and query them
    toks0 = text[0].split()
    shingles = toks0 + [f"{a} {b}" for a, b in zip(toks0, toks0[1:])]
    terms, *_ = _mh([shingles], "min_hash:1,16,1")
    n_hits = {s.count(bool_query(filter_=[term])) for term in terms}
    assert n_hits == {n // 2}, n_hits
    # a term from the OTHER doc group matches the other half
    toks1 = text[1].split()
    shingles1 = toks1 + [f"{a} {b}" for a, b in zip(toks1, toks1[1:])]
    terms1, *_ = _mh([shingles1], "min_hash:1,16,1")
    assert {s.count(bool_query(filter_=[term])) for term in terms1} == {n // 2}
