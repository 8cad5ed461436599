"""Index replication — the `replicator` module's primary/replica flow
(`lucene/replicator/src/java/org/apache/lucene/replicator/Replicator.java`,
`IndexRevision.java` / `ReplicationClient.java`): a replica pulls the
primary's latest committed revision, copies only the files it is missing,
and atomically publishes the new commit generation; readers on the replica
pick it up with the normal `IndexSearcher.refresh()` (openIfChanged).

Re-expression: a revision = the commit's shard directories (immutable,
content-addressed by pid + fingerprint) + delete sidecars + term_stats +
the segments_N json.  Sync is incremental — already-present shard dirs
(same pid, same fingerprint, committed) are skipped — and crash-safe: data
files copy first into tmp dirs renamed into place, the commit file is
written last (a torn sync leaves the previous generation visible, exactly
like the reference's copy-then-publish contract).
"""

from __future__ import annotations

import json
import os
import shutil

from . import manifest as mf
from .shard import read_manifest


def replicate(src_index: str, dst_index: str) -> dict | None:
    """Pull the latest revision of ``src_index`` into ``dst_index``.
    Returns the replicated commit, or None when the replica is current."""
    commit = mf.latest_commit(src_index)
    if commit is None:
        raise FileNotFoundError(f"no commit in {src_index}")
    have = mf.latest_commit(dst_index)
    if have is not None and have["generation"] >= commit["generation"]:
        return None
    os.makedirs(os.path.join(dst_index, "shards"), exist_ok=True)

    copied = 0
    for m in commit["shards"]:
        name = mf.shard_dirname(m)
        dst = os.path.join(dst_index, "shards", name)
        dm = read_manifest(dst)
        if dm and dm.get("status") == "committed" \
                and dm.get("fingerprint") == m.get("fingerprint"):
            pass                                  # immutable + identical
        else:
            tmp = dst + ".sync"
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            shutil.copytree(os.path.join(src_index, "shards", name), tmp)
            if os.path.exists(dst):
                shutil.rmtree(dst)
            os.rename(tmp, dst)
            copied += 1
        if m.get("del_file"):
            # generational delete sidecars are immutable files named by gen
            rel = os.path.basename(m["del_file"])
            d = os.path.join(dst_index, "deletes")
            os.makedirs(d, exist_ok=True)
            if not os.path.exists(os.path.join(d, rel)):
                shutil.copy2(m["del_file"], os.path.join(d, rel))

    # term stats: replace wholesale (small next to the shards; written to a
    # tmp dir + rename so readers never see a half synced stats table)
    src_stats = os.path.join(src_index, "term_stats")
    if os.path.isdir(src_stats):
        tmp = os.path.join(dst_index, "term_stats.sync")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        shutil.copytree(src_stats, tmp)
        final = os.path.join(dst_index, "term_stats")
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)

    # publish LAST: rewrite del_file paths to the replica's copies, then
    # write the segments file for this generation
    new_commit = json.loads(json.dumps(commit))
    for m in new_commit["shards"]:
        if m.get("del_file"):
            m["del_file"] = os.path.join(dst_index, "deletes",
                                         os.path.basename(m["del_file"]))
    path = os.path.join(dst_index, f"segments_{commit['generation']}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(new_commit, f)
    os.rename(tmp, path)
    new_commit["_files_copied"] = copied
    return new_commit


def precopy(src_index: str, dst_index: str) -> dict:
    """`replicator/nrt/PreCopyMergedSegmentWarmer.java` role: copy the data
    files of the primary's latest revision to the replica WITHOUT
    publishing a commit — the primary warms freshly-merged segments on all
    replicas before cutting a searchable point over to them, so the
    subsequent `replicate()` publish is metadata-only (zero bulk copy in
    the refresh critical path).  Crash-safe like replicate(): tmp dir +
    rename per shard, no segments_N written.  Returns
    {"precopied": n_shards, "generation": primary generation}."""
    commit = mf.latest_commit(src_index)
    if commit is None:
        raise FileNotFoundError(f"no commit in {src_index}")
    os.makedirs(os.path.join(dst_index, "shards"), exist_ok=True)
    copied = 0
    for m in commit["shards"]:
        name = mf.shard_dirname(m)
        dst = os.path.join(dst_index, "shards", name)
        dm = read_manifest(dst)
        if dm and dm.get("status") == "committed" \
                and dm.get("fingerprint") == m.get("fingerprint"):
            continue
        tmp = dst + ".sync"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        shutil.copytree(os.path.join(src_index, "shards", name), tmp)
        if os.path.exists(dst):
            shutil.rmtree(dst)
        os.rename(tmp, dst)
        copied += 1
        if m.get("del_file"):
            rel = os.path.basename(m["del_file"])
            d = os.path.join(dst_index, "deletes")
            os.makedirs(d, exist_ok=True)
            if not os.path.exists(os.path.join(d, rel)):
                shutil.copy2(m["del_file"], os.path.join(d, rel))
    return {"precopied": copied, "generation": commit["generation"]}
