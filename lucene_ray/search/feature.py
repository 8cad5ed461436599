"""FeatureField: static scoring signals (pagerank, url_length, ...) scored
through saturating functions.

Re-expresses `core/src/java/org/apache/lucene/document/FeatureField.java`
on the column data model: the reference smuggles the feature weight into a
term frequency (`floatToIntBits(v) >>> 15`, FeatureField.java:165) so it
can ride the postings; here the ENCODED freq lives in an int64 doc-values
column (one column per (field, feature) pair), and scoring is a vectorized
pass over the column.  The 9-mantissa-bit quantization is kept so scores
are bit-identical to the reference:

  encode: floatToIntBits(v) >>> 15        (v must be a positive normal f32)
  decode: intBitsToFloat(freq << 15)      (FeatureField.java:210-220)

Score functions (FeatureField.java:232-470; float32/float64 op order
traced from the Java expressions):

  linear:     w * S                              (all float32)
  log:        (float)(w * log(a + S))            (a+S in f32, log/mul in f64)
  saturation: w * (1 - k / (S + k))              (all float32)
  sigmoid:    (float)(w * (1 - k^a / (S^a + k^a)))  (pows in f64)

A SaturationQuery without a pivot computes it at rewrite time as
decode(avg encoded freq) over docs carrying the feature
(FeatureField.computePivotFeatureValue, :625-638) — here a vectorized
reduction over each shard's doc-values column.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

MAX_FREQ = np.int64(np.float32(3.4028235e38).view(np.int32)) >> 15


def encode_feature_value(v) -> np.ndarray:
    """float weight(s) -> encoded freq int64 (`FeatureField.java:165`).
    Values must be positive, finite, normal float32s."""
    f = np.asarray(v, dtype=np.float32)
    if np.any(~np.isfinite(f)) or np.any(f < np.float32(1.17549435e-38)):
        raise ValueError("feature values must be positive normal finite floats")
    return (f.view(np.int32).astype(np.int64)) >> 15


def decode_feature_value(freq) -> np.ndarray:
    """encoded freq -> float32 feature value (`FeatureField.java:210-220`)."""
    tf = np.atleast_1d(np.asarray(freq, dtype=np.int64))
    out = (np.minimum(tf, MAX_FREQ).astype(np.int32) << 15).view(np.float32)
    out = np.where(tf > MAX_FREQ, np.float32(3.4028235e38), out)
    return out.reshape(np.shape(freq))


@dataclass(frozen=True)
class FeatureQuery:
    """Feature scoring query over an encoded doc-values column.  ``function``
    is one of linear / log / saturation / sigmoid; ``boost`` is the
    reference's ``weight`` (w).  Docs whose encoded freq is 0 do not match
    (the feature term is absent)."""
    field: str
    function: str = "saturation"
    boost: float = 1.0
    scaling_factor: float = 1.0      # log: a
    pivot: float | None = None       # saturation/sigmoid: k (None = computed)
    exponent: float = 1.0            # sigmoid: a


def score_feature(freqs: np.ndarray, q: FeatureQuery, pivot: float | None) -> np.ndarray:
    """Vectorized SimScorer.score over encoded freqs (float32 results)."""
    w = np.float32(q.boost)
    s = decode_feature_value(freqs)
    if q.function == "linear":
        return w * s
    if q.function == "log":
        a = np.float32(q.scaling_factor)
        return (np.float64(w) * np.log((a + s).astype(np.float64))) \
            .astype(np.float32)
    if q.function == "saturation":
        k = np.float32(pivot)
        return w * (np.float32(1.0) - k / (s + k))
    if q.function == "sigmoid":
        k, a = np.float64(np.float32(q.pivot)), np.float64(np.float32(q.exponent))
        kpa = np.power(k, a)
        return (np.float64(w) * (1.0 - kpa / (np.power(s.astype(np.float64), a) + kpa))) \
            .astype(np.float32)
    raise ValueError(f"unknown feature function {q.function!r}")


def compute_pivot(readers, field: str) -> float:
    """decode(avg encoded freq over docs carrying the feature), as float32
    (`FeatureField.computePivotFeatureValue`); 1.0 when no doc has it."""
    total = 0
    n = 0
    for rdr in readers:
        st = (rdr.manifest.get("dv_sums") or {}).get(field)
        if st is not None:
            # precomputed at flush (the analogue of reading term stats) —
            # O(shards), no column scan; like the reference, deletes and dv
            # updates don't refresh these stats
            total += int(st[0])
            n += int(st[1])
        else:
            dv = np.asarray(rdr.docvalue(field), dtype=np.int64)
            has = dv > 0
            total += int(dv[has].sum())
            n += int(has.sum())
    if n == 0:
        return 1.0
    avg_freq = np.float32(np.float64(total) / n)
    return float(decode_feature_value(np.float64(avg_freq)))


@dataclass(frozen=True)
class LongDistanceFeatureQuery:
    """Distance feature over a long doc-values column
    (`core/.../document/LongDistanceFeatureQuery.java`, built by
    `LongPoint.newDistanceFeatureQuery`): every doc carrying the field
    matches, scored

        (float) (weight * (pivot / (pivot + (double) |value - origin|)))

    with the unsigned distance clamped to Long.MAX_VALUE
    (LongDistanceFeatureQuery.java:112-117,270-271).  ``boost`` is the
    reference's ``weight`` (the BoostQuery the factory wraps around it)."""
    field: str
    origin: int
    pivot_distance: int
    boost: float = 1.0

    def __post_init__(self):
        if self.pivot_distance <= 0:
            raise ValueError("pivotDistance must be > 0, got %r"
                             % (self.pivot_distance,))


def score_long_distance(values: np.ndarray, q: LongDistanceFeatureQuery) -> np.ndarray:
    """Vectorized LongDistanceFeatureQuery.DistanceScorer.score: unsigned
    |value - origin| with Long.MAX_VALUE overflow clamp, then the float32
    saturation (the float weight widens exactly to double before the
    multiply — Java `boost * (pivotDistance / (pivotDistance + (double) d))`)."""
    v = np.asarray(values, dtype=np.int64)
    o = np.int64(q.origin)
    hi = np.maximum(v, o).astype(np.uint64)
    lo = np.minimum(v, o).astype(np.uint64)
    dist = hi - lo                                    # exact unsigned diff
    maxl = np.uint64((1 << 63) - 1)
    d = np.where(dist > maxl, np.float64(maxl), dist.astype(np.float64))
    pivot = np.float64(q.pivot_distance)
    w = np.float64(np.float32(q.boost))
    return (w * (pivot / (pivot + d))).astype(np.float32)
