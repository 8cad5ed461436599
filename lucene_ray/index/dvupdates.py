"""Numeric doc-values updates — `IndexWriter.updateNumericDocValue(Term,
field, value)` (`index/IndexWriter.java:1900-1935`) re-expressed with the
same generational-sidecar shape as deletions.

Reference semantics kept:

- An update sets `field = value` for EVERY live doc matching the key
  (delete-term granularity), without rewriting the segment: Lucene writes a
  whole new generation of the field's doc-values file per touched segment
  (`index/ReadersAndUpdates.java` writeFieldUpdates; `docValuesGen` in
  `index/SegmentCommitInfo.java`), visible only from the next commit.
- Readers layer the newest generation over the original column; merges fold
  the updates into the merged segment and drop the sidecars
  (`SegmentMerger` reads through the updated reader view).

Ray shape: one task per shard (broadcast key table, object-store join
against the docmap — the same semi-join as `deletes.delete_by_keys`), each
writing ``dvups/shard-{pid}-{field}-gen{g}.npy`` (full int64 column — the
reference also rewrites the full per-segment column).  The commit entry
carries ``dv_files``/``dv_ranges`` per shard; ``dv_ranges`` replaces the
immutable shard manifest's min/max for range pruning, which would otherwise
wrongly prune a shard whose updated values moved outside the original range.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .manifest import commit_index, latest_commit, shard_dirpath

__all__ = ["update_numeric_docvalue", "soft_delete_by_keys",
           "soft_undelete_by_keys"]


def update_numeric_docvalue(index_dir: str, keys: pa.Table, field: str,
                            value: int, *,
                            key_cols: tuple[str, str] = ("conv_id", "turn_idx")
                            ) -> dict:
    """Set `field = value` on every doc whose key appears in `keys`;
    publishes a new commit generation and returns it."""
    import ray

    commit = latest_commit(index_dir)
    if commit is None:
        raise FileNotFoundError(index_dir)
    if field not in tuple(commit.get("docvalue_cols", ())):
        raise ValueError(f"{field!r} is not a doc-values column")
    dv_dir = os.path.join(index_dir, "dvups")
    os.makedirs(dv_dir, exist_ok=True)
    keys_ref = ray.put(keys.select(list(key_cols)))

    @ray.remote
    def apply(shard_dir: str, pid: int, prev_file, gen: int):
        import pyarrow.parquet as pq

        ks = ray.get(keys_ref)
        dm = pq.read_table(os.path.join(shard_dir, "docmap.parquet"),
                           columns=list(key_cols) + [field])
        dm = dm.append_column("_lid", pa.array(np.arange(dm.num_rows),
                                               type=pa.int64()))
        hit = dm.join(ks, keys=list(key_cols), join_type="inner")
        if hit.num_rows == 0 and not prev_file:
            return None                     # untouched shard, no sidecar
        if prev_file and os.path.exists(prev_file):
            dv = np.load(prev_file).astype(np.int64, copy=True)
        else:
            col = dm.column(field)
            if pa.types.is_timestamp(col.type):
                col = pa.compute.cast(col, pa.int64())
            dv = col.to_numpy(zero_copy_only=False).astype(np.int64,
                                                           copy=True)
        if hit.num_rows:
            dv[hit.column("_lid").to_numpy()] = int(value)
        path = os.path.join(dv_dir,
                            f"shard-{pid:05d}-{field}-gen{gen}.npy")
        np.save(path, dv)
        return path, int(dv.min()) if len(dv) else 0, \
            int(dv.max()) if len(dv) else 0

    gen = commit["generation"] + 1
    futs = []
    for m in commit["shards"]:
        prev = (m.get("dv_files") or {}).get(field)
        futs.append(apply.remote(shard_dirpath(index_dir, m), m["pid"],
                                 prev, gen))
    new_shards = []
    for m, f in zip(commit["shards"], futs):
        m = dict(m)
        res = ray.get(f)
        if res is not None:
            path, lo, hi = res
            m["dv_files"] = {**(m.get("dv_files") or {}), field: path}
            m["dv_ranges"] = {**(m.get("dv_ranges") or {}),
                              field: [lo, hi]}
        new_shards.append(m)
    meta = {k: commit[k] for k in ("fingerprint", "input_desc",
                                   "split_points", "key_cols", "keyword_cols",
                                   "docvalue_cols", "token_filters",
                                   "text_col", "format")
            if k in commit}
    return commit_index(index_dir, new_shards, meta)


def soft_delete_by_keys(index_dir: str, keys: pa.Table, *,
                        field: str = "soft_del",
                        key_cols: tuple[str, str] = ("conv_id", "turn_idx")
                        ) -> dict:
    """Soft deletes (`IndexWriter.softUpdateDocument` /
    `index/SoftDeletesDirectoryReaderWrapper.java` model): mark matching
    docs deleted by SETTING A DOC-VALUES FIELD instead of flipping the
    live-docs bitmap.  The docs stay physically present (merges fold the
    marker dv like any update — the SoftDeletesRetentionMergePolicy
    retention role for retention=MatchAll), searchers opened with
    ``soft_deletes_field=field`` hide them, searchers opened without see
    them — the wrapper's dual-view contract.  Reversible via
    :func:`soft_undelete_by_keys` (hard deletes are not)."""
    return update_numeric_docvalue(index_dir, keys, field, 1,
                                   key_cols=key_cols)


def soft_undelete_by_keys(index_dir: str, keys: pa.Table, *,
                          field: str = "soft_del",
                          key_cols: tuple[str, str] = ("conv_id", "turn_idx")
                          ) -> dict:
    """Clear the soft-delete marker (the reversibility soft deletes exist
    for — `SoftDeletesDirectoryReaderWrapper` javadoc)."""
    return update_numeric_docvalue(index_dir, keys, field, 0,
                                   key_cols=key_cols)
