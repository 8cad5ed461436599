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
