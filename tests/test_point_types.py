"""HalfFloatPoint / BigIntegerPoint (`sandbox/document/HalfFloatPoint.java`,
`BigIntegerPoint.java`): encoding parity vs IEEE float16 (numpy) as an
independent oracle, reference nextUp/nextDown cases, 128-bit split order,
and end-to-end range/exact/set queries vs brute force."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.search.point_types import (
    BIGINT_MAX,
    BIGINT_MIN,
    big_integer_encode_binary16,
    big_integer_exact_query,
    big_integer_join,
    big_integer_range_query,
    big_integer_set_query,
    big_integer_split,
    half_float_encode_column,
    half_float_next_down,
    half_float_next_up,
    half_float_range_query,
    half_float_set_query,
    half_float_to_short_bits,
    half_float_to_sortable_short,
    short_bits_to_half_float,
    sortable_short_to_half_float,
)


def test_half_float_decode_all_bit_patterns():
    """Every 16-bit pattern decodes exactly like IEEE binary16."""
    bits = np.arange(65536, dtype=np.uint16)
    want = bits.view(np.float16).astype(np.float32)
    got = short_bits_to_half_float(bits.astype(np.int64))
    nan = np.isnan(want)
    assert np.isnan(got[nan]).all()
    assert np.array_equal(got[~nan], want[~nan])
    # signed zeros preserved
    assert np.signbit(short_bits_to_half_float(np.array([0x8000]))[0])
    assert not np.signbit(short_bits_to_half_float(np.array([0]))[0])


def test_half_float_encode_matches_ieee():
    """halfFloatToShortBits == IEEE float32->float16 conversion (numpy)
    on random floats, denormals, boundaries, and infinities."""
    rng = np.random.default_rng(7)
    vals = np.concatenate([
        rng.normal(0, 1000, 5000).astype(np.float32),
        rng.normal(0, 1e-6, 1000).astype(np.float32),
        np.array([0.0, -0.0, np.inf, -np.inf, 65504.0, 65519.9, 65520.0,
                  -65520.0, 1e-40, -1e-40, 2.0**-24, 2.0**-25,
                  2.0**-25 * 1.0000001, 6.1e-5], dtype=np.float32),
        rng.uniform(-70000, 70000, 5000).astype(np.float32),
    ])
    got = half_float_to_short_bits(vals).astype(np.uint16)
    want = vals.astype(np.float16).view(np.uint16)
    assert np.array_equal(got, want)


def test_half_float_sortable_order_and_roundtrip():
    rng = np.random.default_rng(11)
    vals = np.sort(rng.uniform(-65504, 65504, 4000).astype(np.float32))
    s = half_float_to_sortable_short(vals)
    assert (np.diff(s) >= 0).all()
    back = sortable_short_to_half_float(s)
    assert np.array_equal(back, vals.astype(np.float16).astype(np.float32))


def test_half_float_next_up_down_reference_cases():
    """TestHalfFloatPoint.testNextUp/testNextDown:236-257."""
    assert np.isnan(half_float_next_up(np.nan))
    assert half_float_next_up(np.inf) == np.inf
    assert half_float_next_up(-np.inf) == -65504.0
    assert half_float_next_up(-0.0) == 0.0 and \
        not np.signbit(half_float_next_up(-0.0))
    assert half_float_next_up(0.0) == float(
        short_bits_to_half_float(np.array([1]))[0])
    tiny = float(np.nextafter(np.float32(0), np.float32(1)))
    assert half_float_next_up(tiny) == half_float_next_up(0.0)
    assert np.isnan(half_float_next_down(np.nan))
    assert half_float_next_down(-np.inf) == -np.inf
    assert half_float_next_down(np.inf) == 65504.0
    assert half_float_next_down(0.0) == 0.0 and \
        np.signbit(half_float_next_down(0.0))
    assert half_float_next_down(tiny) == 0.0 and \
        not np.signbit(half_float_next_down(tiny))


def test_big_integer_split_order_and_roundtrip():
    rng = np.random.default_rng(13)
    vals = sorted(
        [BIGINT_MIN, BIGINT_MAX, 0, -1, 1, 1 << 64, -(1 << 64),
         (1 << 64) - 1] +
        [int(rng.integers(-2**62, 2**62)) * int(rng.integers(1, 2**60))
         for _ in range(500)])
    pairs = [big_integer_split(v) for v in vals]
    assert pairs == sorted(pairs)
    assert [big_integer_join(h, l) for h, l in pairs] == vals
    with pytest.raises(ValueError):
        big_integer_split(BIGINT_MAX + 1)


def test_big_integer_binary16_encoder():
    rng = np.random.default_rng(17)
    vals = [int(rng.integers(-2**62, 2**62)) * int(rng.integers(1, 2**63))
            for _ in range(300)] + [BIGINT_MIN, BIGINT_MAX, 0, -1]
    raw = [v.to_bytes(16, "big", signed=True) for v in vals]
    arr = pa.array(raw, type=pa.binary(16))
    hi, lo = big_integer_encode_binary16(arr)
    want = [big_integer_split(v) for v in vals]
    assert list(zip(hi.tolist(), lo.tolist())) == want
    # sliced arrays honor the offset
    hi2, lo2 = big_integer_encode_binary16(arr.slice(10, 50))
    assert list(zip(hi2.tolist(), lo2.tolist())) == want[10:60]


def test_point_types_end_to_end(ray_session, tmp_path):
    """Index a half-float column and a 128-bit column; range/exact/set
    counts match brute force."""
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.searcher import IndexSearcher
    from lucene_ray.sources.transcripts import synth_transcripts

    n = 1200
    t = synth_transcripts(n, seed=91)
    st = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    i = np.arange(n, dtype=np.int64)
    hf = ((i * 37) % 1000 - 500).astype(np.float32) / 8.0   # exact halves
    big = [(int(v) - 600) * ((1 << 70) + 12345) for v in i]
    hi, lo = zip(*[big_integer_split(v) for v in big])
    st = st.append_column("hf", pa.array(half_float_encode_column(hf)))
    st = st.append_column("bhi", pa.array(np.asarray(hi, dtype=np.int64)))
    st = st.append_column("blo", pa.array(np.asarray(lo, dtype=np.int64)))
    d = str(tmp_path / "pt")
    build_index(rd.from_arrow(st), d, target_docs_per_partition=400,
                point_cols={"hf": ("hf",), "big": ("bhi", "blo")},
                input_desc="point-types")
    s = IndexSearcher(d)

    q = half_float_range_query("hf", -12.25, 30.5)
    assert s.count(q) == int(((hf >= -12.25) & (hf <= 30.5)).sum())
    assert s.count(half_float_set_query("hf", [0.0, 3.125, 9999.0])) == \
        int(np.isin(hf, [0.0, 3.125]).sum())

    lo_v, hi_v = big[100], big[900]
    got = s.count(big_integer_range_query("big", lo_v, hi_v))
    assert got == sum(1 for v in big if lo_v <= v <= hi_v)
    # a range crossing hi-word boundaries with partial low words
    lo_v2 = big[100] + 1
    hi_v2 = big[900] - 1
    got2 = s.count(big_integer_range_query("big", lo_v2, hi_v2))
    assert got2 == sum(1 for v in big if lo_v2 <= v <= hi_v2)
    assert s.count(big_integer_exact_query("big", big[7])) == 1
    assert s.count(big_integer_set_query("big", [big[3], big[5], 10**38]))\
        == 2
    # full-domain sanity
    assert s.count(big_integer_range_query("big", BIGINT_MIN, BIGINT_MAX))\
        == n


def test_inet_encoding_and_order():
    """InetAddressPoint.encode: IPv4 maps to ::ffff:a.b.c.d; the (hi, lo)
    sortable pair preserves address order across families."""
    from lucene_ray.search.point_types import inet_split, inet_to_bytes16

    assert inet_to_bytes16("1.2.3.4") == \
        bytes([0] * 10 + [0xFF, 0xFF, 1, 2, 3, 4])
    assert inet_to_bytes16("::ffff:1.2.3.4") == inet_to_bytes16("1.2.3.4")
    import ipaddress
    addrs = ["0.0.0.0", "1.2.3.4", "10.0.0.1", "10.0.0.2", "255.255.255.255",
             "::1", "2001:db8::1", "2001:db8::2", "fe80::1",
             "ffff:ffff:ffff:ffff:ffff:ffff:ffff:ffff"]
    mapped = [ipaddress.IPv6Address(inet_to_bytes16(a)) for a in addrs]
    order = sorted(range(len(addrs)), key=lambda i: mapped[i])
    pairs = [inet_split(a) for a in addrs]
    assert sorted(range(len(addrs)), key=lambda i: pairs[i]) == order


def test_inet_queries_end_to_end(ray_session, tmp_path):
    """Exact / set / range / CIDR-prefix queries and InetAddressRange
    relations vs brute force."""
    import ipaddress

    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.point_types import (
        inet_encode_column,
        inet_exact_query,
        inet_prefix_query,
        inet_range_query,
        inet_range_relation_query,
        inet_set_query,
        inet_split,
    )
    from lucene_ray.search.searcher import IndexSearcher
    from lucene_ray.sources.transcripts import synth_transcripts

    n = 900
    t = synth_transcripts(n, seed=95)
    st = t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    i = np.arange(n)
    # mix of v4 and v6 addresses
    addrs = [f"10.{(j * 7) % 250}.{(j * 13) % 250}.{j % 250}" if j % 3
             else f"2001:db8::{j:x}" for j in i]
    hi, lo = inet_encode_column(addrs)
    st = st.append_column("iphi", pa.array(hi))
    st = st.append_column("iplo", pa.array(lo))
    # doc-side ranges [lo_addr, hi_addr] over a v4 block
    v4lo = [f"172.16.{(j * 3) % 200}.{(j * 11) % 200}" for j in i]
    v4hi = [f"172.16.{(j * 3) % 200 + (0 if (j * 11) % 200 + j % 40 < 256 else 1)}."
            f"{((j * 11) % 200 + j % 40) % 256}" for j in i]
    rl = [inet_split(a) for a in v4lo]
    rh = [inet_split(a) for a in v4hi]
    st = st.append_column("r_hmin", pa.array(np.array([p[0] for p in rl])))
    st = st.append_column("r_lmin", pa.array(np.array([p[1] for p in rl])))
    st = st.append_column("r_hmax", pa.array(np.array([p[0] for p in rh])))
    st = st.append_column("r_lmax", pa.array(np.array([p[1] for p in rh])))
    d = str(tmp_path / "inet")
    build_index(rd.from_arrow(st), d, target_docs_per_partition=300,
                point_cols={"ip": ("iphi", "iplo"),
                            "iprange": ("r_hmin", "r_lmin",
                                        "r_hmax", "r_lmax")},
                input_desc="inet")
    s = IndexSearcher(d)

    ip_of = [ipaddress.IPv6Address(
        a if ":" in a else f"::ffff:{a}") for a in addrs]

    assert s.count(inet_exact_query("ip", addrs[17])) == \
        sum(1 for x in ip_of if x == ip_of[17])
    want_set = {str(addrs[3]), str(addrs[4]), "9.9.9.9"}
    assert s.count(inet_set_query("ip", list(want_set))) == \
        sum(1 for a in addrs if a in want_set)

    qlo, qhi = "10.0.0.0", "10.120.255.255"
    L = ipaddress.IPv6Address(f"::ffff:{qlo}")
    H = ipaddress.IPv6Address(f"::ffff:{qhi}")
    assert s.count(inet_range_query("ip", qlo, qhi)) == \
        sum(1 for x in ip_of if L <= x <= H)
    # v6 range crossing hi words
    assert s.count(inet_range_query("ip", "2001:db8::10", "2001:db8::ff")) \
        == sum(1 for x in ip_of
               if ipaddress.IPv6Address("2001:db8::10") <= x
               <= ipaddress.IPv6Address("2001:db8::ff"))
    net = ipaddress.ip_network("10.64.0.0/10")
    assert s.count(inet_prefix_query("ip", "10.64.0.0/10")) == \
        sum(1 for a in addrs if ":" not in a
            and ipaddress.ip_address(a) in net)

    # range relations vs interval brute force on the mapped integers
    lo_i = np.array([int.from_bytes(
        (ipaddress.IPv6Address(f"::ffff:{a}")).packed, "big") for a in v4lo])
    hi_i = np.array([int.from_bytes(
        (ipaddress.IPv6Address(f"::ffff:{a}")).packed, "big") for a in v4hi])
    ql = int.from_bytes(ipaddress.IPv6Address("::ffff:172.16.40.0").packed,
                        "big")
    qh = int.from_bytes(ipaddress.IPv6Address("::ffff:172.16.120.255").packed,
                        "big")
    inter = (lo_i <= qh) & (hi_i >= ql)
    within = (lo_i >= ql) & (hi_i <= qh)
    contains = (lo_i <= ql) & (hi_i >= qh)
    for rel, want in (("intersects", inter.sum()),
                      ("within", within.sum()),
                      ("contains", contains.sum()),
                      ("crosses", (inter & ~within).sum())):
        q = inet_range_relation_query("iprange", rel,
                                      "172.16.40.0", "172.16.120.255")
        assert s.count(q) == int(want), rel
