"""Index commit points + lineage manifests.

The Ray-Data equivalent of Lucene's generational ``segments_N`` two-phase
commit (`index/SegmentInfos.java:55-64,132`, `IndexWriter.java:3539,1323`):

- every shard directory carries its own ``manifest.json`` (per-partition
  lineage: pid, doc_base, counts, input fingerprint, status) written
  atomically via tmp-dir + rename — this is the checkpoint unit;
- an index-level ``segments_{gen}.json`` lists all committed shards plus
  global collection statistics; the highest generation wins, and writing it
  is the commit (rename onto the final name).

Resume = re-run the build: partitions whose shard manifest matches the
current fingerprint are skipped before the shuffle.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os


def fingerprint(payload: dict) -> str:
    return hashlib.sha256(json.dumps(payload, sort_keys=True).encode()).hexdigest()[:16]


def shard_dirname(m: dict) -> str:
    """Directory name for a shard manifest entry.  Flush-built shards live at
    ``shard-{pid:05d}``; merge-built shards carry an explicit ``dir`` (the
    merged segment keeps its group's first pid — which preserves the global
    doc order under the pid-sorted doc_base prefix sum — but needs a fresh
    directory because shard dirs are immutable)."""
    return m.get("dir") or f"shard-{m['pid']:05d}"


def shard_dirpath(index_dir: str, m: dict) -> str:
    return os.path.join(index_dir, "shards", shard_dirname(m))


def commit_index(index_dir: str, shard_manifests: list[dict], meta: dict) -> dict:
    """Write the next segments_{gen}.json atomically; returns the commit."""
    shard_manifests = sorted(shard_manifests, key=lambda m: m["pid"])
    # global doc bases: prefix sum of shard doc counts in pid (= range) order
    base = 0
    shard_manifests = [dict(m) for m in shard_manifests]
    for m in shard_manifests:
        m["doc_base"] = base
        base += int(m["doc_count"])
    gen = 1 + max((int(os.path.basename(p).split("_")[1].split(".")[0])
                   for p in glob.glob(os.path.join(index_dir, "segments_*.json"))), default=0)
    commit = {
        "generation": gen,
        "shards": shard_manifests,
        "doc_count": sum(m["doc_count"] for m in shard_manifests),
        "doc_count_field": sum(m["doc_count_field"] for m in shard_manifests),
        "sum_ttf": sum(m["sum_ttf"] for m in shard_manifests),
        "sum_df": sum(m["sum_df"] for m in shard_manifests),
        **meta,
    }
    path = os.path.join(index_dir, f"segments_{gen}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(commit, f)
    os.rename(tmp, path)
    return commit


def latest_commit(index_dir: str) -> dict | None:
    paths = glob.glob(os.path.join(index_dir, "segments_*.json"))
    if not paths:
        return None
    best = max(paths, key=lambda p: int(os.path.basename(p).split("_")[1].split(".")[0]))
    with open(best) as f:
        return json.load(f)


def committed_shards(index_dir: str, fp: str) -> dict[int, dict]:
    """pid -> manifest for every already-committed shard matching fingerprint."""
    out = {}
    for d in glob.glob(os.path.join(index_dir, "shards", "shard-*")):
        if d.endswith(".tmp"):
            continue
        p = os.path.join(d, "manifest.json")
        if os.path.exists(p):
            with open(p) as f:
                m = json.load(f)
            if m.get("status") == "committed" and m.get("fingerprint") == fp:
                out[m["pid"]] = m
    return out


def list_commits(index_dir: str) -> list[dict]:
    """All commit points, generation asc (`IndexDeletionPolicy` view:
    every segments_N still on disk is an openable point-in-time)."""
    out = []
    for p in sorted(glob.glob(os.path.join(index_dir, "segments_*.json")),
                    key=lambda p: int(os.path.basename(p).split("_")[1].split(".")[0])):
        with open(p) as f:
            out.append(json.load(f))
    return out


def rollback(index_dir: str, generation: int,
             remerge_stats: bool = True) -> dict:
    """Restore an earlier commit point (`IndexWriter.rollback` +
    SnapshotDeletionPolicy model): the chosen generation's shard list is
    re-published as the NEWEST segments_{gen}.json, so live readers pick it
    up through the normal ``refresh()`` path (highest generation wins) and
    no shard file is touched — generational files are immutable.  The
    commit-level global term-stats table is re-merged for the restored
    shard set (it is derived state, like the merged statistics a Lucene
    reader recomputes per commit point)."""
    src = os.path.join(index_dir, f"segments_{generation}.json")
    if not os.path.exists(src):
        raise FileNotFoundError(f"no commit generation {generation}")
    with open(src) as f:
        commit = json.load(f)
    new_gen = 1 + max(int(os.path.basename(p).split("_")[1].split(".")[0])
                      for p in glob.glob(os.path.join(index_dir, "segments_*.json")))
    commit = dict(commit)
    commit["generation"] = new_gen
    commit["rolled_back_from"] = generation
    path = os.path.join(index_dir, f"segments_{new_gen}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(commit, f)
    os.rename(tmp, path)
    if remerge_stats:
        from .build import merge_term_stats    # lazy: avoids import cycle

        merge_term_stats(index_dir, commit)
    return commit


def prune_commits(index_dir: str, keep_last: int = 1,
                  snapshots: tuple[int, ...] = ()) -> dict:
    """IndexFileDeleter analogue: drop commit points older than the last
    ``keep_last`` (except explicitly snapshotted generations), then delete
    shard directories referenced by NO remaining commit.  Returns
    {"removed_commits": [...], "removed_shards": [...]}."""
    commits = list_commits(index_dir)
    if not commits:
        return {"removed_commits": [], "removed_shards": []}
    keep_gens = {c["generation"] for c in commits[-keep_last:]} | set(snapshots)
    removed_commits = []
    kept = []
    for c in commits:
        if c["generation"] in keep_gens:
            kept.append(c)
        else:
            os.remove(os.path.join(index_dir,
                                   f"segments_{c['generation']}.json"))
            removed_commits.append(c["generation"])
    referenced = {shard_dirname(m) for c in kept for m in c["shards"]}
    removed_shards = []
    import shutil

    for d in glob.glob(os.path.join(index_dir, "shards", "shard-*")):
        name = os.path.basename(d)
        if name.endswith(".tmp") or name in referenced:
            continue
        shutil.rmtree(d)
        removed_shards.append(name)
    # generational sidecars (live-docs bitmaps, dv-update columns) referenced
    # by no surviving commit die with their commit points too
    live_files = set()
    for c in kept:
        for m in c["shards"]:
            if m.get("del_file"):
                live_files.add(os.path.abspath(m["del_file"]))
            for p in (m.get("dv_files") or {}).values():
                live_files.add(os.path.abspath(p))
    removed_sidecars = []
    for sub in ("deletes", "dvups"):
        for f in glob.glob(os.path.join(index_dir, sub, "*.npy")):
            if os.path.abspath(f) not in live_files:
                os.remove(f)
                removed_sidecars.append(os.path.basename(f))
    return {"removed_commits": removed_commits,
            "removed_shards": sorted(removed_shards),
            "removed_sidecars": sorted(removed_sidecars)}
