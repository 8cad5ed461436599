"""BKD-style point index sidecar: k-dimensional numeric points per shard.

Re-expresses the reference's points format (`codecs/lucene90/
Lucene90PointsFormat.java`, `util/bkd/BKDWriter.java` / `BKDReader.java`)
Ray-native: each shard flush task sorts its own points into space-filling
order (value order for 1-D, Morton/Z-order interleave for 2-D int32-range
dims, lexicographic otherwise), packs them into fixed-size leaf blocks and
records per-leaf min/max cell bounds.  Queries visit leaves with the BKD
``intersect`` relation logic (`PointValues.IntersectVisitor`):

  - CELL_OUTSIDE_QUERY  → leaf skipped,
  - CELL_INSIDE_QUERY   → all leaf docs bulk-accepted,
  - CELL_CROSSES_QUERY  → per-point compare (vectorized).

The flat sorted-leaf layout replaces the recursive in-heap tree: with
``LEAF_SIZE`` = 512 the per-leaf bound arrays are ~1/512 of the point count,
so the "inner node" pruning pass is a handful of vectorized numpy compares
over mmap'd sidecars — the same asymptotics as walking packed index nodes,
with no per-node Python.  Shard-level min/max in the manifest prunes whole
shards before any sidecar is touched (the analogue of
``PointValues.getMinPackedValue`` / ``getMaxPackedValue`` pruning).

Values are int64 per dimension (callers encode doubles / lat-lon to sortable
ints first — see `search/geo.py`); one point per doc per field (the column
data model), docs with a null dimension are simply absent from the sidecar
(``FieldExistsQuery``-consistent).
"""

from __future__ import annotations

import os

import numpy as np

LEAF_SIZE = 512

# sidecar filenames per point field
def _files(field: str) -> tuple[str, str, str, str]:
    return (f"pt_{field}_vals.npy", f"pt_{field}_docs.npy",
            f"pt_{field}_leafmin.npy", f"pt_{field}_leafmax.npy")


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """Spread each uint32's bits into the even bit positions of a uint64."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def morton2(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Z-order key for two int64 arrays whose values fit int32 (sign-flipped
    to unsigned so the interleave preserves signed ordering per dim)."""
    ux = (x + np.int64(2**31)).astype(np.uint32)
    uy = (y + np.int64(2**31)).astype(np.uint32)
    return (_spread_bits(ux) << np.uint64(1)) | _spread_bits(uy)


def _sort_order(coords: np.ndarray) -> np.ndarray:
    """Space-filling sort order for (n, ndims) int64 coords."""
    n, ndims = coords.shape
    if ndims == 1:
        return np.argsort(coords[:, 0], kind="stable")
    int32_ok = (coords.min(initial=0) >= -2**31) and \
        (coords.max(initial=-1) < 2**31)
    if ndims == 2 and int32_ok:
        return np.argsort(morton2(coords[:, 0], coords[:, 1]), kind="stable")
    return np.lexsort(tuple(coords[:, d] for d in range(coords.shape[1] - 1, -1, -1)))


def write_points(out_dir: str, field: str, coords: np.ndarray,
                 docs: np.ndarray, leaf_size: int = LEAF_SIZE) -> dict:
    """Persist one field's point sidecar into ``out_dir``; returns the
    manifest metadata entry (ndims / count / leaf size / global bounds)."""
    coords = np.asarray(coords, dtype=np.int64)
    if coords.ndim == 1:
        coords = coords[:, None]
    n, ndims = coords.shape
    order = _sort_order(coords)
    coords = np.ascontiguousarray(coords[order])
    docs = np.ascontiguousarray(np.asarray(docs, dtype=np.int32)[order])

    n_leaves = max(1, -(-n // leaf_size)) if n else 0
    if n:
        starts = np.arange(n_leaves) * leaf_size
        leaf_min = np.minimum.reduceat(coords, starts, axis=0)
        leaf_max = np.maximum.reduceat(coords, starts, axis=0)
        gmin = [int(v) for v in coords.min(axis=0)]
        gmax = [int(v) for v in coords.max(axis=0)]
    else:
        leaf_min = np.zeros((0, ndims), dtype=np.int64)
        leaf_max = np.zeros((0, ndims), dtype=np.int64)
        gmin = gmax = []

    fv, fd, fmn, fmx = _files(field)
    np.save(os.path.join(out_dir, fv), coords)
    np.save(os.path.join(out_dir, fd), docs)
    np.save(os.path.join(out_dir, fmn), leaf_min)
    np.save(os.path.join(out_dir, fmx), leaf_max)
    return {"ndims": int(ndims), "n_points": int(n),
            "leaf_size": int(leaf_size), "min": gmin, "max": gmax}


class PointsReader:
    """mmap'd reader over one shard's point sidecar for one field."""

    def __init__(self, shard_dir: str, field: str, meta: dict):
        fv, fd, fmn, fmx = _files(field)
        self.meta = meta
        self.ndims = int(meta["ndims"])
        self.n_points = int(meta["n_points"])
        self.leaf_size = int(meta.get("leaf_size", LEAF_SIZE))
        self.vals = np.load(os.path.join(shard_dir, fv), mmap_mode="r")
        self.docs = np.load(os.path.join(shard_dir, fd), mmap_mode="r")
        self.leaf_min = np.load(os.path.join(shard_dir, fmn))
        self.leaf_max = np.load(os.path.join(shard_dir, fmx))

    def _bounds(self, lower, upper) -> tuple[np.ndarray, np.ndarray]:
        lo = np.full(self.ndims, np.iinfo(np.int64).min, dtype=np.int64)
        hi = np.full(self.ndims, np.iinfo(np.int64).max, dtype=np.int64)
        for d in range(self.ndims):
            if lower is not None and lower[d] is not None:
                lo[d] = int(lower[d])
            if upper is not None and upper[d] is not None:
                hi[d] = int(upper[d])
        return lo, hi

    def intersect_box(self, lower, upper) -> np.ndarray:
        """Local docIDs (sorted, unique) with a point inside the inclusive
        box; ``None`` bounds are open.  The BKD intersect: leaf-relation
        pruning, bulk-accept inside leaves, per-point compare on crossers."""
        if self.n_points == 0:
            return np.zeros(0, dtype=np.int32)
        lo, hi = self._bounds(lower, upper)
        if np.any(lo > hi):
            return np.zeros(0, dtype=np.int32)
        if self.ndims == 1:
            # value-sorted: the matching rows are one contiguous slice
            col = self.vals[:, 0]
            a = int(np.searchsorted(col, lo[0], side="left"))
            b = int(np.searchsorted(col, hi[0], side="right"))
            return np.unique(self.docs[a:b])

        outside = np.any(self.leaf_max < lo, axis=1) | \
            np.any(self.leaf_min > hi, axis=1)
        inside = np.all(self.leaf_min >= lo, axis=1) & \
            np.all(self.leaf_max <= hi, axis=1) & ~outside
        crossing = ~outside & ~inside

        parts = []
        in_ids = np.nonzero(inside)[0]
        if len(in_ids):
            # bulk accept: expand each inside leaf's row range
            starts = in_ids * self.leaf_size
            ends = np.minimum(starts + self.leaf_size, self.n_points)
            idx = _expand_ranges(starts, ends)
            parts.append(np.asarray(self.docs[idx]))
        cr_ids = np.nonzero(crossing)[0]
        if len(cr_ids):
            starts = cr_ids * self.leaf_size
            ends = np.minimum(starts + self.leaf_size, self.n_points)
            idx = _expand_ranges(starts, ends)
            pts = self.vals[idx]
            m = np.all((pts >= lo) & (pts <= hi), axis=1)
            parts.append(np.asarray(self.docs[idx[m]]))
        if not parts:
            return np.zeros(0, dtype=np.int32)
        return np.unique(np.concatenate(parts))

    def doc_values(self, local_docs: np.ndarray) -> np.ndarray:
        """(len(local_docs), ndims) point values for the given docs; rows for
        docs without a point are int64.min-filled.  Used by verify steps
        (e.g. the distance query's haversine check on decoded coords)."""
        out = np.full((len(local_docs), self.ndims), np.iinfo(np.int64).min,
                      dtype=np.int64)
        if self.n_points == 0 or len(local_docs) == 0:
            return out
        d = np.asarray(self.docs)
        order = np.argsort(d, kind="stable")
        ds = d[order]
        pos = np.searchsorted(ds, local_docs)
        pos_c = np.minimum(pos, len(ds) - 1)
        hit = ds[pos_c] == local_docs
        out[hit] = np.asarray(self.vals)[order[pos_c[hit]]]
        return out


def _expand_ranges(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Concatenate [s, e) integer ranges without a Python loop."""
    lens = (ends - starts).astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    base = np.repeat(starts.astype(np.int64), lens)
    off = np.arange(total, dtype=np.int64) - \
        np.repeat(np.concatenate(([0], np.cumsum(lens)[:-1])), lens)
    return base + off


def check_points(shard_dir: str, field: str, meta: dict, doc_count: int):
    """CheckIndex-style sidecar validation: sizes agree with the manifest,
    docIDs are in range, leaf bounds actually bound their rows, and the
    sort order matches the declared space-filling order."""
    r = PointsReader(shard_dir, field, meta)
    vals = np.asarray(r.vals)
    docs = np.asarray(r.docs)
    if vals.shape != (r.n_points, r.ndims) or docs.shape != (r.n_points,):
        raise ValueError(f"points[{field}]: sidecar shape mismatch")
    if r.n_points == 0:
        return
    if docs.min() < 0 or docs.max() >= doc_count:
        raise ValueError(f"points[{field}]: docID out of range")
    if list(vals.min(axis=0)) != list(meta["min"]) or \
            list(vals.max(axis=0)) != list(meta["max"]):
        raise ValueError(f"points[{field}]: manifest bounds mismatch")
    order = _sort_order(vals)
    if not np.array_equal(vals[order], vals):
        raise ValueError(f"points[{field}]: leaf order violated")
    n_leaves = -(-r.n_points // r.leaf_size)
    if r.leaf_min.shape != (n_leaves, r.ndims):
        raise ValueError(f"points[{field}]: leaf bound count mismatch")
    starts = np.arange(n_leaves) * r.leaf_size
    if not np.array_equal(np.minimum.reduceat(vals, starts, axis=0), r.leaf_min) \
            or not np.array_equal(np.maximum.reduceat(vals, starts, axis=0), r.leaf_max):
        raise ValueError(f"points[{field}]: leaf bounds mismatch")
