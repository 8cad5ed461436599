"""Distributed index build — the Ray-Data re-expression of the Lucene write
path (`index/DocumentsWriter.java` DWPT flush → `SegmentInfos` publish):

    read_parquet(transcripts)
      → per-batch partial conv counts            (map_batches, pyarrow)
      → groupby(conv_id).sum                     (small shuffle: planning pass)
      → [driver] range boundaries + doc bases    (tiny, P entries)
      → tag pid per row                          (map_batches, searchsorted)
      → filter already-committed pids            (resume from lineage)
      → groupby(pid).map_groups(write_shard)     (THE shuffle: one task = one
                                                  DWPT-equivalent flush)
      → commit segments_N + salted term-stats merge

Partitioning: conv_id range buckets (ONE partitioning key reused across
stages); every partition owns a contiguous (conv_id, turn_idx) range, so
``global_doc_id = doc_base[pid] + local_id`` preserves stable global doc
order (SURVEY.md §1.5).  At 10^12 turns the planning pass aggregates
per-conversation counts (pre-aggregated per batch before the groupby) and the
driver only ever holds the P range boundaries, never the data.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from . import manifest as mf
from .shard import write_shard

FORMAT_VERSION = 1


def _partial_conv_counts(batch: pa.Table) -> pa.Table:
    """Pre-aggregate rows per conv_id inside the batch (combiner before the
    planning groupby — keeps the shuffle tiny)."""
    import pyarrow.compute as pc

    counts = batch.group_by("conv_id").aggregate([("conv_id", "count")])
    return counts.rename_columns(["conv_id", "n"])


def plan_partitions(conv_counts, target_docs_per_partition: int):
    """Driver-side planning from the (conv_id, n) table sorted by conv_id.

    Returns (split_points: list[str], doc_counts: np.ndarray per pid).
    Partition p = conv_ids in [split[p-1], split[p]); doc bases are the
    prefix sum of doc_counts.
    """
    conv_ids = conv_counts["conv_id"].to_numpy()
    ns = conv_counts["n"].to_numpy().astype(np.int64)
    cum = np.cumsum(ns)
    total = int(cum[-1]) if len(cum) else 0
    n_parts = max(1, -(-total // target_docs_per_partition))
    targets = (np.arange(1, n_parts) * total) // n_parts
    cut_idx = np.unique(np.searchsorted(cum, targets, side="left") + 1)
    cut_idx = cut_idx[cut_idx < len(conv_ids)]
    split_points = conv_ids[cut_idx].tolist()
    bounds = np.concatenate(([0], cut_idx, [len(conv_ids)]))
    doc_counts = np.array([int(ns[int(a):int(b)].sum()) for a, b in zip(bounds[:-1], bounds[1:])],
                          dtype=np.int64)
    return split_points, doc_counts


def build_index(ds, index_dir: str, *, target_docs_per_partition: int = 200_000,
                text_col: str = "text", key_cols: tuple[str, str] = ("conv_id", "turn_idx"),
                input_desc: str = "", merge_stats: bool = True) -> dict:
    """Build (or resume) an index from a transcripts Dataset; returns commit.

    ``ds`` must contain key_cols + text_col.  Ray must already be
    initialized by the caller.
    """
    import ray.data

    os.makedirs(os.path.join(index_dir, "shards"), exist_ok=True)

    # fast path: a commit with this input already exists and is intact
    prev = mf.latest_commit(index_dir)
    if prev is not None and input_desc and prev.get("input_desc") == input_desc:
        have = mf.committed_shards(index_dir, prev["fingerprint"])
        if set(have) == {m["pid"] for m in prev["shards"]}:
            return prev

    # ---- planning pass: conv_id -> row count (small; pre-aggregated) ----
    conv_counts = (
        ds.select_columns(list(key_cols))
        .map_batches(_partial_conv_counts, batch_format="pyarrow")
        .groupby("conv_id").sum("n")
    ).to_pandas()
    conv_counts = conv_counts.rename(columns={"sum(n)": "n"}).sort_values("conv_id")
    split_points, doc_counts = plan_partitions(conv_counts, target_docs_per_partition)
    doc_bases = np.concatenate(([0], np.cumsum(doc_counts)[:-1])).astype(np.int64)

    fp = mf.fingerprint({
        "input": input_desc,
        "splits": split_points,
        "format": FORMAT_VERSION,
        "text_col": text_col,
        "key_cols": list(key_cols),
    })

    done = mf.committed_shards(index_dir, fp)
    todo = [p for p in range(len(doc_counts)) if p not in done]

    if todo:
        splits_arr = np.array(split_points, dtype=object)
        shards_dir = os.path.join(index_dir, "shards")
        bases = {int(p): int(doc_bases[p]) for p in range(len(doc_counts))}
        done_set = frozenset(done)

        def tag_pid(batch: pa.Table) -> pa.Table:
            cids = batch.column(key_cols[0]).to_numpy(zero_copy_only=False)
            pid = np.searchsorted(splits_arr, cids, side="right").astype(np.int32)
            batch = batch.append_column("pid", pa.array(pid, type=pa.int32()))
            if done_set:
                keep = pa.compute.invert(pa.compute.is_in(
                    batch.column("pid"), value_set=pa.array(sorted(done_set), type=pa.int32())))
                batch = batch.filter(keep)
            return batch

        def flush_partition(group: pa.Table) -> pa.Table:
            pid = int(group.column("pid")[0].as_py())
            m = write_shard(shards_dir, pid, bases[pid], group.drop_columns(["pid"]),
                            fp, text_col=text_col, key_cols=key_cols)
            return pa.table({k: [v] for k, v in m.items()})

        new_manifests = (
            ds.select_columns([*key_cols, text_col])
            .map_batches(tag_pid, batch_format="pyarrow")
            .groupby("pid")
            .map_groups(flush_partition, batch_format="pyarrow")
        ).take_all()
        for m in new_manifests:
            done[int(m["pid"])] = dict(m)

    commit = mf.commit_index(index_dir, list(done.values()), {
        "fingerprint": fp,
        "input_desc": input_desc,
        "split_points": split_points,
        "key_cols": list(key_cols),
        "text_col": text_col,
        "format": FORMAT_VERSION,
    })

    if merge_stats:
        merge_term_stats(index_dir, commit)
    return commit


def merge_term_stats(index_dir: str, commit: dict, n_salts: int = 16) -> str:
    """Global term statistics via the salted groupby-on-term shuffle.

    Per-shard term dictionaries already hold partial (df, ttf) — the
    per-partition combiner.  This stage is the Lucene merge's ``mergeTerms``
    statistics half (`index/SegmentMerger.java:196`), expressed as:

        read shard terms → add salt → groupby(term, salt).sum   (spreads hot
        terms that appear in EVERY shard across reducers)
        → groupby(term).sum → write term_stats parquet

    At 10^12 scale the output would be hash-partitioned by term; here it is
    one parquet directory loaded into RAM by searchers.
    """
    import ray.data

    paths = [os.path.join(index_dir, "shards", f"shard-{m['pid']:05d}", "terms.parquet")
             for m in commit["shards"]]
    out_dir = os.path.join(index_dir, "term_stats")

    def add_salt(batch: pa.Table) -> pa.Table:
        salt = (np.arange(len(batch)) % n_salts).astype(np.int32)
        return batch.append_column("salt", pa.array(salt, type=pa.int32()))

    stats = (
        ray.data.read_parquet(paths, columns=["term", "df", "ttf"])
        .map_batches(add_salt, batch_format="pyarrow")
        .groupby(["term", "salt"]).aggregate(
            ray.data.aggregate.Sum("df", alias_name="df"),
            ray.data.aggregate.Sum("ttf", alias_name="ttf"))
        .drop_columns(["salt"])
        .groupby("term").aggregate(
            ray.data.aggregate.Sum("df", alias_name="df"),
            ray.data.aggregate.Sum("ttf", alias_name="ttf"))
    )
    import shutil
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    stats.write_parquet(out_dir)
    return out_dir
