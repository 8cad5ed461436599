"""Shape-field sidecar: one polygon per document, queried by relation.

Re-expresses the reference's shape fields (`document/LatLonShape.java`,
`document/ShapeField.java`, `document/LatLonShapeQuery.java` semantics)
Ray-native.  The reference tessellates geometries into triangles packed
into a 7-dim BKD; here each shard stores

  - the polygon vertices, GeoEncodingUtils-quantized, as flat int32 arrays
    with per-shape offsets (mmap-able npys), and
  - the shape bounding boxes as a 4-dim point field named
    ``<field>__bbox`` with the RangeField packed layout
    (min-lat, min-lon | max-lat, max-lon) through the ordinary
    `index/points.py` sidecar,

so relation queries prune through the existing BKD box visits
(INTERSECTS/WITHIN/CONTAINS as `RangeFieldQuery` relations on the bbox)
and verify exactly on the decoded vertices (`search/shapes.py`).  The
same asymptotics as the reference's triangle-tree prune + per-triangle
verify, with the verify running on whole polygons instead of triangle
fans.

Scope (documented): one polygon per doc — an outer ring plus optional HOLE
rings (list<list<float>> input columns; `geo/Polygon.java` holes model,
hole boundaries belong to the shape); shapes must not cross the dateline.
Docs with a null shape are absent (FieldExists semantics), like the point
sidecars.
"""

from __future__ import annotations

import os

import numpy as np

from .points import write_points


def _files(field: str) -> tuple[str, str, str]:
    return (f"shp_{field}_verts.npy", f"shp_{field}_offs.npy",
            f"shp_{field}_docs.npy")


def _ring_files(field: str) -> tuple[str, str]:
    return (f"shp_{field}_rcnt.npy", f"shp_{field}_rsz.npy")


def write_shapes(out_dir: str, field: str, flat_lat, flat_lon,
                 counts: np.ndarray, docs: np.ndarray,
                 mode: str = "geo",
                 ring_sizes: list | None = None,
                 gtype: str = "polygon") -> dict:
    """Persist one field's shape sidecar.  ``flat_lat``/``flat_lon`` hold
    every shape's ENCODED int vertices back-to-back; ``counts`` gives
    vertices per shape (aligned with ``docs``).  ``ring_sizes`` (optional,
    aligned with docs) holds each shape's per-ring vertex counts — ring 0
    is the outer ring, the rest are HOLES (`geo/Polygon.java` holes model);
    absent means one ring per shape.  Returns the manifest metadata entry
    (the bbox point-field meta nests under "bbox")."""
    counts = np.asarray(counts, dtype=np.int64)
    min_v = 2 if gtype == "line" else 3
    if np.any(counts < min_v):
        raise ValueError(f"{gtype}s need >= {min_v} vertices")
    n = len(counts)
    flat = np.zeros((int(counts.sum()), 2), dtype=np.int64)
    if n:
        flat[:, 0] = np.asarray(flat_lat, dtype=np.int64)
        flat[:, 1] = np.asarray(flat_lon, dtype=np.int64)
    offs = np.concatenate(([0], np.cumsum(counts)))
    docs = np.asarray(docs, dtype=np.int32)
    if ring_sizes is not None:
        ring_sizes = [np.asarray(r, dtype=np.int64) for r in ring_sizes]
        if all(len(r) == 1 for r in ring_sizes):
            ring_sizes = None                 # single-ring: legacy layout
        elif gtype == "line":
            raise ValueError("lines have no holes")
        else:
            for i, r in enumerate(ring_sizes):
                if int(r.sum()) != int(counts[i]) or np.any(r < 3):
                    raise ValueError("ring sizes must each be >= 3 and sum "
                                     "to the shape's vertex count")
    # docID order so candidate lookups are a searchsorted away
    order = np.argsort(docs, kind="stable")
    if not np.array_equal(order, np.arange(n)):
        reord_v = []
        for i in order:
            reord_v.append(flat[offs[i]:offs[i + 1]])
        flat = np.concatenate(reord_v) if reord_v else flat[:0]
        counts = counts[order]
        offs = np.concatenate(([0], np.cumsum(counts)))
        docs = docs[order]
        if ring_sizes is not None:
            ring_sizes = [ring_sizes[i] for i in order]

    fv, fo, fd = _files(field)
    np.save(os.path.join(out_dir, fv), flat)
    np.save(os.path.join(out_dir, fo), offs)
    np.save(os.path.join(out_dir, fd), docs)
    if ring_sizes is not None:
        frc, frs = _ring_files(field)
        np.save(os.path.join(out_dir, frc),
                np.asarray([len(r) for r in ring_sizes], dtype=np.int64))
        np.save(os.path.join(out_dir, frs),
                np.concatenate(ring_sizes) if ring_sizes
                else np.zeros(0, np.int64))

    # bbox 4-dim point sidecar in the RangeField packed layout
    if n:
        starts = offs[:-1]
        bb_min = np.stack([np.minimum.reduceat(flat[:, 0], starts),
                           np.minimum.reduceat(flat[:, 1], starts)], axis=1)
        bb_max = np.stack([np.maximum.reduceat(flat[:, 0], starts),
                           np.maximum.reduceat(flat[:, 1], starts)], axis=1)
        coords = np.concatenate([bb_min, bb_max], axis=1)
    else:
        coords = np.zeros((0, 4), dtype=np.int64)
    bbox_meta = write_points(out_dir, f"{field}__bbox", coords, docs)
    return {"n_shapes": int(n), "bbox": bbox_meta, "mode": mode,
            "gtype": gtype, "has_holes": ring_sizes is not None}


class ShapesReader:
    """mmap'd reader over one shard's shape sidecar for one field."""

    def __init__(self, shard_dir: str, field: str, meta: dict):
        fv, fo, fd = _files(field)
        self.n_shapes = int(meta["n_shapes"])
        self.verts = np.load(os.path.join(shard_dir, fv), mmap_mode="r")
        self.offs = np.load(os.path.join(shard_dir, fo))
        self.docs = np.load(os.path.join(shard_dir, fd))
        self._rcnt = self._rsz = None
        if meta.get("has_holes"):
            frc, frs = _ring_files(field)
            self._rcnt = np.load(os.path.join(shard_dir, frc))
            self._rsz = np.load(os.path.join(shard_dir, frs))
            self._rstart = np.concatenate(([0], np.cumsum(self._rcnt)))

    def vertices(self, local_doc: int) -> np.ndarray | None:
        """(k, 2) encoded (lat, lon) vertices for one doc (every ring
        back-to-back); None when the doc has no shape."""
        i = int(np.searchsorted(self.docs, local_doc))
        if i >= self.n_shapes or self.docs[i] != local_doc:
            return None
        return np.asarray(self.verts[self.offs[i]:self.offs[i + 1]])

    def rings(self, local_doc: int) -> list[np.ndarray] | None:
        """Per-ring vertex arrays (ring 0 = outer, rest = holes); None when
        the doc has no shape."""
        i = int(np.searchsorted(self.docs, local_doc))
        if i >= self.n_shapes or self.docs[i] != local_doc:
            return None
        v = np.asarray(self.verts[self.offs[i]:self.offs[i + 1]])
        if self._rcnt is None:
            return [v]
        sizes = self._rsz[self._rstart[i]:self._rstart[i + 1]]
        cuts = np.concatenate(([0], np.cumsum(sizes)))
        return [v[cuts[j]:cuts[j + 1]] for j in range(len(sizes))]

    def ring_sizes(self, idx: int) -> np.ndarray:
        """Per-ring vertex counts for shape index ``idx`` (merge path)."""
        if self._rcnt is None:
            return np.array([self.offs[idx + 1] - self.offs[idx]],
                            dtype=np.int64)
        return np.asarray(
            self._rsz[self._rstart[idx]:self._rstart[idx + 1]])


def check_shapes(shard_dir: str, field: str, meta: dict, doc_count: int):
    """CheckIndex-style validation: sizes agree, docIDs sorted and in
    range, offsets monotone with >=3 vertices per shape, and the bbox
    sidecar bounds actually bound each shape's vertices."""
    r = ShapesReader(shard_dir, field, meta)
    if r.offs.shape != (r.n_shapes + 1,) or r.docs.shape != (r.n_shapes,):
        raise ValueError(f"shapes[{field}]: sidecar shape mismatch")
    if r.n_shapes == 0:
        return
    if r.docs.min() < 0 or r.docs.max() >= doc_count:
        raise ValueError(f"shapes[{field}]: docID out of range")
    if np.any(np.diff(r.docs.astype(np.int64)) <= 0):
        raise ValueError(f"shapes[{field}]: docs not strictly increasing")
    counts = np.diff(r.offs)
    min_v = 2 if meta.get("gtype") == "line" else 3
    if np.any(counts < min_v) or int(r.offs[-1]) != len(r.verts):
        raise ValueError(f"shapes[{field}]: bad vertex offsets")
    if r._rcnt is not None:
        if len(r._rcnt) != r.n_shapes or np.any(r._rsz < 3):
            raise ValueError(f"shapes[{field}]: bad ring sidecar")
        per_shape = np.add.reduceat(
            r._rsz, r._rstart[:-1]) if len(r._rsz) else np.zeros(0, np.int64)
        if not np.array_equal(per_shape, counts):
            raise ValueError(f"shapes[{field}]: ring sizes don't sum to "
                             "vertex counts")
    from .points import PointsReader

    pr = PointsReader(shard_dir, f"{field}__bbox", meta["bbox"])
    bb = pr.doc_values(r.docs.astype(np.int64))
    verts = np.asarray(r.verts)
    starts = r.offs[:-1]
    got_min = np.stack([np.minimum.reduceat(verts[:, 0], starts),
                        np.minimum.reduceat(verts[:, 1], starts)], axis=1)
    got_max = np.stack([np.maximum.reduceat(verts[:, 0], starts),
                        np.maximum.reduceat(verts[:, 1], starts)], axis=1)
    if not (np.array_equal(bb[:, :2], got_min)
            and np.array_equal(bb[:, 2:], got_max)):
        raise ValueError(f"shapes[{field}]: bbox sidecar mismatch")
