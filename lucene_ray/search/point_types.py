"""Sandbox point types over the generic int64 BKD sidecar.

HalfFloatPoint (`sandbox/document/HalfFloatPoint.java`): values are
rounded to half precision (IEEE round-half-even, traced from
halfFloatToShortBits / roundShift, HalfFloatPoint.java:101-166) and
stored as ORDER-PRESERVING sortable shorts (sign-folded bit pattern,
sortableShortBits :111-113) widened to one int64 point dimension.
Range/exact/set queries round their bounds exactly like the reference
(`newRangeQuery` encodes bounds with halfFloatToSortableShort), so a
bound that is not representable as a half float snaps to the nearest
one — reference-faithful, documented there too.

BigIntegerPoint (`sandbox/document/BigIntegerPoint.java`): 128-bit
signed integers, indexed as TWO int64 dimensions (hi = arithmetic
high word, lo = low word sign-folded to preserve unsigned order).
The reference packs 16 sortable big-endian bytes; the (hi, lo) pair
is the same total order.  Range queries decompose into at most three
per-dimension boxes (low-boundary row, full interior rows, high-
boundary row), so they ride the ordinary PointMultiRangeQuery /
PointRangeQuery machinery with no bespoke scorer.
"""

from __future__ import annotations

import numpy as np

from .query import PointInSetQuery, PointMultiRangeQuery, PointRangeQuery

# ---------------------------------------------------------------------------
# half floats
# ---------------------------------------------------------------------------


def _round_shift(i: np.ndarray, shift: np.ndarray) -> np.ndarray:
    """roundShift (HalfFloatPoint.java:160-166): divide by 2^shift
    rounding half to even.  int64 arrays throughout."""
    i = i + (np.int64(1) << (shift - 1))
    i = i - ((i >> shift) & 1)
    return i >> shift


def half_float_to_short_bits(v) -> np.ndarray:
    """float32 -> IEEE half-float bit pattern (uint16-valued int64 array);
    vectorized trace of HalfFloatPoint.halfFloatToShortBits."""
    v = np.atleast_1d(np.asarray(v, dtype=np.float32))
    fb = v.view(np.int32).astype(np.int64) & 0xFFFFFFFF
    sign = fb >> 31
    exp = (fb >> 23) & 0xFF
    man = fb & 0x7FFFFF

    out_exp = np.zeros_like(exp)
    out_man = np.zeros_like(man)

    # NaN / infinity: exp 0x1f, mantissa >>> 13
    nan_inf = exp == 0xFF
    out_exp = np.where(nan_inf, 0x1F, out_exp)
    out_man = np.where(nan_inf, man >> 13, out_man)

    # float denormals round to (signed) zero: exp 0, man 0 (already zeros)

    normal = (exp != 0) & (exp != 0xFF)
    e = exp - 127 + 15
    # too large -> infinity
    to_inf = normal & (e >= 0x1F)
    out_exp = np.where(to_inf, 0x1F, out_exp)
    # half denormal: shift = 23 - 10 - e + 1 (zero when shift >= 32)
    den = normal & (e <= 0)
    shift = np.where(den, 14 - e, 1)
    den_fit = den & (shift < 32)
    rs = _round_shift(man | 0x800000, np.where(den_fit, shift, 1))
    out_exp = np.where(den_fit, rs >> 10, out_exp)
    out_man = np.where(den_fit, rs & 0x3FF, out_man)
    # ordinary: round the packed (e << 23 | man) by 13
    ordi = normal & (e > 0) & (e < 0x1F)
    rs2 = _round_shift((e << 23) | man, np.int64(13))
    out_exp = np.where(ordi, rs2 >> 10, out_exp)
    out_man = np.where(ordi, rs2 & 0x3FF, out_man)

    return (sign << 15) | (out_exp << 10) | out_man


def short_bits_to_half_float(s) -> np.ndarray:
    """IEEE half-float bit pattern -> float32 (exact: every half value is
    representable; HalfFloatPoint.shortBitsToHalfFloat)."""
    s = np.atleast_1d(np.asarray(s, dtype=np.int64)) & 0xFFFF
    sign = np.where((s >> 15) != 0, np.float64(-1.0), np.float64(1.0))
    exp = (s >> 10) & 0x1F
    man = (s & 0x3FF).astype(np.float64)
    # denormal: man * 2^-24; normal: (1024 + man) * 2^(exp - 25)
    mag = np.where(exp == 0, man * 2.0 ** -24,
                   (1024.0 + man) * np.exp2(exp.astype(np.float64) - 25.0))
    out = (sign * mag).astype(np.float32)
    spec = exp == 0x1F
    if spec.any():
        out[spec & (man == 0) & (s >> 15 == 0)] = np.float32(np.inf)
        out[spec & (man == 0) & (s >> 15 != 0)] = np.float32(-np.inf)
        out[spec & (man != 0)] = np.float32(np.nan)
    return out


def _sortable_short_bits(s: np.ndarray) -> np.ndarray:
    """sortableShortBits: fold the sign so the int16 order matches the
    float order (involution).  Operates on int64 holding int16 values."""
    s16 = (s & 0xFFFF).astype(np.int64)
    s16 = np.where(s16 >= 0x8000, s16 - 0x10000, s16)  # as signed int16
    return s16 ^ ((s16 >> 15) & 0x7FFF)


def half_float_to_sortable_short(v) -> np.ndarray:
    """float -> order-preserving short (int64-valued), the indexed form."""
    return _sortable_short_bits(half_float_to_short_bits(v))


def sortable_short_to_half_float(s) -> np.ndarray:
    """Inverse of half_float_to_sortable_short."""
    return short_bits_to_half_float(_sortable_short_bits(
        np.atleast_1d(np.asarray(s, dtype=np.int64))))


def half_float_next_up(v: float) -> float:
    """Smallest half float strictly greater than ``v`` (nextUp :68-81)."""
    if np.isnan(v) or v == np.inf:
        return float(v)
    s = int(half_float_to_sortable_short(np.float32(v))[0])
    r = float(sortable_short_to_half_float(s)[0])
    if r <= v:
        r = float(sortable_short_to_half_float(s + 1)[0])
    return r


def half_float_next_down(v: float) -> float:
    """Largest half float strictly smaller than ``v`` (nextDown :87-100)."""
    if np.isnan(v) or v == -np.inf:
        return float(v)
    s = int(half_float_to_sortable_short(np.float32(v))[0])
    r = float(sortable_short_to_half_float(s)[0])
    if r >= v:
        r = float(sortable_short_to_half_float(s - 1)[0])
    return r


def half_float_encode_column(vals) -> np.ndarray:
    """Vectorized index-time encoder: a float column -> the int64 point
    dimension (sortable shorts).  Feed the result to ``point_cols``."""
    return half_float_to_sortable_short(np.asarray(vals, dtype=np.float32))


def half_float_range_query(field: str, lower: float, upper: float,
                           boost: float = 1.0) -> PointRangeQuery:
    """HalfFloatPoint.newRangeQuery: inclusive range, bounds snapped to
    half precision exactly like indexing snaps values."""
    lo = int(half_float_to_sortable_short(np.float32(lower))[0])
    hi = int(half_float_to_sortable_short(np.float32(upper))[0])
    return PointRangeQuery(field, (lo,), (hi,), boost=boost)


def half_float_exact_query(field: str, value: float) -> PointRangeQuery:
    return half_float_range_query(field, value, value)


def half_float_set_query(field: str, values) -> PointInSetQuery:
    """HalfFloatPoint.newSetQuery."""
    enc = half_float_to_sortable_short(np.asarray(values, dtype=np.float32))
    return PointInSetQuery(field, tuple(int(e) for e in enc))


# ---------------------------------------------------------------------------
# 128-bit integers
# ---------------------------------------------------------------------------

BIGINT_MIN = -(1 << 127)
BIGINT_MAX = (1 << 127) - 1
_LO_MIN = -(1 << 63)
_LO_MAX = (1 << 63) - 1


def big_integer_split(v: int) -> tuple[int, int]:
    """128-bit signed int -> (hi, lo) int64 pair whose lexicographic
    order equals the integer order (hi = arithmetic high word, lo =
    sign-folded low word)."""
    v = int(v)
    if not (BIGINT_MIN <= v <= BIGINT_MAX):
        raise ValueError(f"value out of 128-bit signed range: {v}")
    hi = v >> 64
    lo = (v & 0xFFFFFFFFFFFFFFFF) - (1 << 63)
    return hi, lo


def big_integer_join(hi: int, lo: int) -> int:
    """Inverse of big_integer_split."""
    return (int(hi) << 64) | (int(lo) + (1 << 63))


def big_integer_encode_binary16(arr) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized index-time encoder for a pyarrow fixed_size_binary(16)
    column holding big-endian two's-complement values (the reference's
    packed byte layout before sign-flip): -> (hi, lo) int64 arrays for
    ``point_cols``."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    buf = arr.buffers()[1]
    raw = np.frombuffer(buf, dtype=np.uint8)
    off = arr.offset * 16
    raw = raw[off:off + len(arr) * 16].reshape(-1, 16)
    hi_u = raw[:, :8].copy().view(">u8").ravel().astype(np.uint64)
    lo_u = raw[:, 8:].copy().view(">u8").ravel().astype(np.uint64)
    return hi_u.view(np.int64), (lo_u ^ np.uint64(1 << 63)).view(np.int64)


def big_integer_exact_query(field: str, value: int) -> PointInSetQuery:
    """BigIntegerPoint.newExactQuery."""
    return PointInSetQuery(field, (big_integer_split(value),))


def big_integer_set_query(field: str, values) -> PointInSetQuery:
    """BigIntegerPoint.newSetQuery."""
    return PointInSetQuery(field,
                           tuple(big_integer_split(v) for v in values))


def big_integer_range_query(field: str, lower: int, upper: int,
                            boost: float = 1.0):
    """BigIntegerPoint.newRangeQuery (inclusive).  Decomposed into <= 3
    disjoint (hi, lo) boxes so the composite 128-bit comparison becomes
    ordinary per-dimension BKD visits."""
    return _word_pair_range_query(field, big_integer_split(lower),
                                  big_integer_split(upper), boost)


def _word_pair_range_query(field: str, lo_pair, hi_pair, boost: float = 1.0):
    """Inclusive range over a 2-word lexicographic value as <= 3 boxes."""
    hmin, lmin = lo_pair
    hmax, lmax = hi_pair
    if hmin == hmax:
        return PointRangeQuery(field, (hmin, lmin), (hmax, lmax),
                               boost=boost)
    boxes = [((hmin, lmin), (hmin, _LO_MAX))]
    if hmax - hmin >= 2:
        boxes.append(((hmin + 1, _LO_MIN), (hmax - 1, _LO_MAX)))
    boxes.append(((hmax, _LO_MIN), (hmax, lmax)))
    return PointMultiRangeQuery(field, tuple(boxes), boost=boost)


# ---------------------------------------------------------------------------
# IP addresses (`document/InetAddressPoint.java`, `InetAddressRange.java`)
# ---------------------------------------------------------------------------


def inet_to_bytes16(addr: str) -> bytes:
    """InetAddressPoint.encode: the 16-byte IPv6 form, IPv4 mapped to
    ::ffff:a.b.c.d (InetAddressPoint.java encode/decode)."""
    import ipaddress

    ip = ipaddress.ip_address(addr)
    if ip.version == 4:
        ip = ipaddress.IPv6Address(f"::ffff:{ip}")
    return ip.packed


def inet_split(addr: str) -> tuple[int, int]:
    """IP -> (hi, lo) sortable int64 pair; both words are UNSIGNED, so
    both get the sign fold (unlike BigInteger's arithmetic high word)."""
    b = inet_to_bytes16(addr)
    hi_u = int.from_bytes(b[:8], "big")
    lo_u = int.from_bytes(b[8:], "big")
    return hi_u - (1 << 63), lo_u - (1 << 63)


def inet_encode_column(addrs) -> tuple[np.ndarray, np.ndarray]:
    """Index-time encoder for a string column of IPs: -> (hi, lo) int64
    arrays for ``point_cols``.  Parsing is inherently per-value (the
    reference's InetAddress parsing is too); everything downstream is
    the vectorized point path."""
    pairs = [inet_split(a) for a in
             (addrs.to_pylist() if hasattr(addrs, "to_pylist") else addrs)]
    hi = np.fromiter((p[0] for p in pairs), dtype=np.int64, count=len(pairs))
    lo = np.fromiter((p[1] for p in pairs), dtype=np.int64, count=len(pairs))
    return hi, lo


def inet_exact_query(field: str, addr: str) -> PointInSetQuery:
    """InetAddressPoint.newExactQuery."""
    return PointInSetQuery(field, (inet_split(addr),))


def inet_set_query(field: str, addrs) -> PointInSetQuery:
    """InetAddressPoint.newSetQuery."""
    return PointInSetQuery(field, tuple(inet_split(a) for a in addrs))


def inet_range_query(field: str, lower: str, upper: str,
                     boost: float = 1.0):
    """InetAddressPoint.newRangeQuery (inclusive on both ends)."""
    return _word_pair_range_query(field, inet_split(lower),
                                  inet_split(upper), boost)


def inet_prefix_query(field: str, cidr: str, boost: float = 1.0):
    """InetAddressPoint.newPrefixQuery: every address inside the CIDR
    network (network address .. broadcast address, inclusive)."""
    import ipaddress

    net = ipaddress.ip_network(cidr, strict=False)
    return inet_range_query(field, str(net.network_address),
                            str(net.broadcast_address), boost)


def inet_range_relation_query(field: str, relation: str,
                              lower: str, upper: str):
    """InetAddressRange relations (`document/InetAddressRange.java` +
    RangeFieldQuery semantics) over a doc-side [min_ip, max_ip] range
    indexed as a 4-dim point (hi_min, lo_min, hi_max, lo_max).

    Composite 128-bit comparisons don't decompose per dimension, so each
    relation composes from word-pair half-plane visits:

      intersects: NOT(doc.max < q.min) AND NOT(doc.min > q.max)
      within:     NOT(doc.min < q.min) AND NOT(doc.max > q.max)
      contains:   NOT(doc.min > q.min) AND NOT(doc.max < q.max)
      crosses:    intersects AND NOT within

    where each strict word-pair comparison is a <= 2-box
    PointMultiRangeQuery on the same sidecar (boolean FILTER/MUST_NOT
    composition, constant score)."""
    from .query import FILTER, MUST_NOT, BooleanClause, BooleanQuery

    qmin = inet_split(lower)
    qmax = inet_split(upper)
    NEG = (_LO_MIN, _LO_MIN, _LO_MIN, _LO_MIN)
    POS = (_LO_MAX, _LO_MAX, _LO_MAX, _LO_MAX)

    def box(dim_lo: dict, dim_hi: dict):
        lo = tuple(dim_lo.get(i, NEG[i]) for i in range(4))
        hi = tuple(dim_hi.get(i, POS[i]) for i in range(4))
        return lo, hi

    def less_than(hi_dim: int, lo_dim: int, pair) -> object:
        """value(hi_dim, lo_dim) < pair (strict), as <= 2 boxes."""
        h, l = pair
        boxes = []
        if h > _LO_MIN:
            boxes.append(box({}, {hi_dim: h - 1}))
        if l > _LO_MIN:
            boxes.append(box({hi_dim: h}, {hi_dim: h, lo_dim: l - 1}))
        if not boxes:                      # nothing is < the minimum value
            boxes = [box({hi_dim: _LO_MAX, lo_dim: _LO_MAX},
                         {hi_dim: _LO_MIN, lo_dim: _LO_MIN})]
        return PointMultiRangeQuery(field, tuple(boxes))

    def greater_than(hi_dim: int, lo_dim: int, pair) -> object:
        h, l = pair
        boxes = []
        if h < _LO_MAX:
            boxes.append(box({hi_dim: h + 1}, {}))
        if l < _LO_MAX:
            boxes.append(box({hi_dim: h, lo_dim: l + 1}, {hi_dim: h}))
        if not boxes:
            boxes = [box({hi_dim: _LO_MAX, lo_dim: _LO_MAX},
                         {hi_dim: _LO_MIN, lo_dim: _LO_MIN})]
        return PointMultiRangeQuery(field, tuple(boxes))

    exists = PointRangeQuery(field, NEG, POS)
    # dims: 0 = hi_min, 1 = lo_min, 2 = hi_max, 3 = lo_max
    max_below_qmin = less_than(2, 3, qmin)        # doc.max < q.min
    min_above_qmax = greater_than(0, 1, qmax)     # doc.min > q.max
    min_below_qmin = less_than(0, 1, qmin)        # doc.min < q.min
    max_above_qmax = greater_than(2, 3, qmax)     # doc.max > q.max
    min_above_qmin = greater_than(0, 1, qmin)     # doc.min > q.min
    max_below_qmax = less_than(2, 3, qmax)        # doc.max < q.max

    if relation == "intersects":
        neg, pos = (max_below_qmin, min_above_qmax), ()
    elif relation == "within":
        neg, pos = (min_below_qmin, max_above_qmax), ()
    elif relation == "contains":
        neg, pos = (min_above_qmin, max_below_qmax), ()
    elif relation == "crosses":
        # intersects AND NOT within: the NOT-within disjunction rides a
        # nested SHOULD boolean in FILTER position
        neg = (max_below_qmin, min_above_qmax)
        from .query import SHOULD

        pos = (BooleanQuery((BooleanClause(min_below_qmin, SHOULD),
                             BooleanClause(max_above_qmax, SHOULD))),)
    else:
        raise ValueError(f"unknown relation {relation!r}")
    return BooleanQuery((BooleanClause(exists, FILTER),)
                        + tuple(BooleanClause(q, FILTER) for q in pos)
                        + tuple(BooleanClause(q, MUST_NOT) for q in neg))
