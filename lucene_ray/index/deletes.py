"""Live-docs deletions — the `Lucene90LiveDocsFormat` re-expression
(`codecs/lucene90/Lucene90LiveDocsFormat.java:49,82-102` + the buffered
delete-by-term path `index/DocumentsWriterDeleteQueue.java`):

Shard directories stay immutable; deletions live in generational sidecar
bitmaps under ``index_dir/deletes/shard-{pid}-gen{g}.npy`` referenced from
the commit (``del_file`` / ``del_count`` per shard).  Query execution masks
deleted docs; collection/term statistics intentionally KEEP counting deleted
docs until a rewrite/merge — exactly the reference's behavior (stats are
per-segment and only shrink when segments merge).

``delete_by_keys`` is the delete-by-term primitive; ``append_index(...,
update=True)`` composes it into updateDocument semantics (delete old docs
with the same (conv_id, turn_idx), then the appended shards supply the new
versions).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .manifest import commit_index, latest_commit, shard_dirpath


def delete_by_keys(index_dir: str, keys: pa.Table, *,
                   key_cols: tuple[str, str] = ("conv_id", "turn_idx"),
                   only_pids: set[int] | None = None) -> dict:
    """Mark every doc whose (conv_id, turn_idx) appears in `keys` as deleted;
    publishes a new commit generation.  Returns the new commit.

    One Ray task per shard joins the key set against the shard's docmap and
    writes the next-generation bitmap; the key table is broadcast via the
    object store (small side of a semi-join).
    """
    import ray

    commit = latest_commit(index_dir)
    if commit is None:
        raise FileNotFoundError(index_dir)
    del_dir = os.path.join(index_dir, "deletes")
    os.makedirs(del_dir, exist_ok=True)
    keys_ref = ray.put(keys.select(list(key_cols)))

    @ray.remote
    def mark(shard_dir: str, pid: int, doc_count: int, old_del, gen: int):
        import pyarrow.parquet as pq

        keys = ray.get(keys_ref)
        dm = pq.read_table(os.path.join(shard_dir, "docmap.parquet"))
        dm = dm.append_column("_lid", pa.array(np.arange(dm.num_rows), type=pa.int64()))
        hit = dm.join(keys, keys=list(key_cols), join_type="inner")
        deleted = np.zeros(doc_count, dtype=bool)
        if old_del and os.path.exists(old_del):
            deleted |= np.load(old_del)
        if hit.num_rows:
            deleted[hit.column("_lid").to_numpy()] = True
        n = int(deleted.sum())
        path = os.path.join(del_dir, f"shard-{pid:05d}-gen{gen}.npy")
        if n:
            np.save(path, deleted)
            return n, path
        return 0, None

    gen = commit["generation"] + 1
    futs = []
    for m in commit["shards"]:
        if only_pids is not None and m["pid"] not in only_pids:
            futs.append(None)
            continue
        shard_dir = shard_dirpath(index_dir, m)
        futs.append(mark.remote(shard_dir, m["pid"], m["doc_count"],
                                m.get("del_file"), gen))
    new_shards = []
    for m, f in zip(commit["shards"], futs):
        m = dict(m)
        if f is not None:
            n, path = ray.get(f)
            if path is not None:
                m["del_count"] = n
                m["del_file"] = path
        new_shards.append(m)
    meta = {k: commit[k] for k in ("fingerprint", "input_desc", "split_points",
                                   "key_cols", "keyword_cols", "docvalue_cols", "token_filters",
                                   "text_col", "format")
            if k in commit}
    return commit_index(index_dir, new_shards, meta)


def delete_by_query(index_dir: str, query) -> dict:
    """IndexWriter.deleteDocuments(Query...) analogue
    (`index/BufferedUpdatesStream.java` query-delete resolution): run the
    query against every shard through the ordinary engine, OR the match
    set into the next-generation live-docs bitmap, publish a new commit.
    Like the reference, already-deleted docs stay deleted and statistics
    keep counting them until a merge rewrites the segment."""
    import ray

    commit = latest_commit(index_dir)
    if commit is None:
        raise FileNotFoundError(index_dir)
    del_dir = os.path.join(index_dir, "deletes")
    os.makedirs(del_dir, exist_ok=True)
    gen = commit["generation"] + 1

    @ray.remote
    def mark(pids: list[int]):
        # one searcher per task, scoped to its shard group (mmaps only the
        # shards it touches) — the per-segment resolution runs in parallel
        # across the cluster instead of a driver loop
        from ..search.searcher import IndexSearcher

        searcher = IndexSearcher(index_dir, query_cache=False)
        compiled = searcher.compile(query)
        out = []
        for pid in pids:
            rdr = searcher.reader(pid)
            _, docs, _, _ = searcher.search_shard(
                rdr, compiled, rdr.doc_count, total_hits_threshold=2**31 - 1)
            if len(docs) == 0:
                out.append((pid, None, None))
                continue
            m = next(s for s in searcher.commit["shards"] if s["pid"] == pid)
            deleted = np.zeros(m["doc_count"], dtype=bool)
            old = m.get("del_file")
            if old and os.path.exists(old):
                deleted |= np.load(old)
            deleted[docs] = True
            path = os.path.join(del_dir, f"shard-{pid:05d}-gen{gen}.npy")
            np.save(path, deleted)
            out.append((pid, int(deleted.sum()), path))
        return out

    pids = [m["pid"] for m in commit["shards"]]
    n_tasks = max(1, min(len(pids), int(ray.cluster_resources().get("CPU", 8))))
    groups = [pids[i::n_tasks] for i in range(n_tasks) if pids[i::n_tasks]]
    results = {}
    for part in ray.get([mark.remote(g) for g in groups]):
        for pid, n, path in part:
            results[pid] = (n, path)
    new_shards = []
    for m in commit["shards"]:
        m = dict(m)
        n, path = results[m["pid"]]
        if path is not None:
            m["del_count"] = n
            m["del_file"] = path
        new_shards.append(m)
    meta = {k: commit[k] for k in ("fingerprint", "input_desc", "split_points",
                                   "key_cols", "keyword_cols", "docvalue_cols",
                                   "token_filters", "text_col", "format")
            if k in commit}
    return commit_index(index_dir, new_shards, meta)


def split_index(src_dir: str, dir1: str, dir2: str, docs_in_first) -> tuple:
    """PKIndexSplitter (`misc/.../index/PKIndexSplitter.java:43-118`): split
    one index into two by a query — `dir1` keeps the docs matching
    `docs_in_first`, `dir2` keeps the rest, both as DELETE MASKS over
    hardlinked segment files (the reference wraps a filtered reader and
    addIndexes it; segments here are immutable so a hardlink copy + inverse
    live-docs bitmaps gives the same two indexes without rewriting
    postings — a later force_merge rewrites either side compactly).
    Statistics keep counting masked docs until a merge, like the reference's
    deleted docs."""
    import shutil

    import ray

    commit = latest_commit(src_dir)
    if commit is None:
        raise FileNotFoundError(src_dir)

    def _link_copy(dst):
        os.makedirs(os.path.dirname(os.path.abspath(dst)), exist_ok=True)
        try:
            shutil.copytree(src_dir, dst, copy_function=os.link)
        except OSError:
            shutil.copytree(src_dir, dst)   # cross-device fallback

    _link_copy(dir1)
    _link_copy(dir2)

    @ray.remote
    def resolve(pids: list[int]):
        from ..search.searcher import IndexSearcher

        searcher = IndexSearcher(src_dir, query_cache=False)
        compiled = searcher.compile(docs_in_first)
        out = []
        for pid in pids:
            rdr = searcher.reader(pid)
            _s, docs, _t, _r = searcher.search_shard(
                rdr, compiled, rdr.doc_count, total_hits_threshold=2**31 - 1)
            match = np.zeros(rdr.doc_count, dtype=bool)
            match[docs] = True
            out.append((pid, match))
        return out

    pids = [m["pid"] for m in commit["shards"]]
    n_tasks = max(1, min(len(pids), int(ray.cluster_resources().get("CPU", 8))))
    groups = [pids[i::n_tasks] for i in range(n_tasks) if pids[i::n_tasks]]
    matches = {}
    for part in ray.get([resolve.remote(g) for g in groups]):
        for pid, m in part:
            matches[pid] = m

    commits = []
    for out_dir, keep_matching in ((dir1, True), (dir2, False)):
        del_dir = os.path.join(out_dir, "deletes")
        os.makedirs(del_dir, exist_ok=True)
        gen = commit["generation"] + 1
        new_shards = []
        for m in commit["shards"]:
            m = dict(m)
            deleted = ~matches[m["pid"]] if keep_matching \
                else matches[m["pid"]].copy()
            old = m.get("del_file")
            if old and os.path.exists(old):
                deleted |= np.load(old)
            path = os.path.join(del_dir,
                                f"split-{m['pid']:05d}-gen{gen}.npy")
            np.save(path, deleted)
            m["del_count"] = int(deleted.sum())
            m["del_file"] = path
            new_shards.append(m)
        meta = {k: commit[k] for k in ("fingerprint", "input_desc",
                                       "split_points", "key_cols",
                                       "keyword_cols", "docvalue_cols",
                                       "token_filters", "text_col", "format")
                if k in commit}
        commits.append(commit_index(out_dir, new_shards, meta))
    return tuple(commits)


def multi_pass_split(src_dir: str, out_dirs, sequential: bool = False):
    """MultiPassIndexSplitter (`misc/.../index/MultiPassIndexSplitter.java`):
    split an index into len(out_dirs) parts — round-robin over global docIDs
    by default, contiguous ranges with ``sequential=True`` — each part a
    hardlink copy of the immutable segments carrying an inverse live-docs
    mask (the reference wraps FakeDeleteIndexReader passes the same way).
    Docs already deleted in the source stay deleted in every part."""
    import shutil

    n_parts = len(out_dirs)
    commit = latest_commit(src_dir)
    if commit is None:
        raise FileNotFoundError(src_dir)
    total = commit["doc_count"]
    commits = []
    for part, out_dir in enumerate(out_dirs):
        os.makedirs(os.path.dirname(os.path.abspath(out_dir)), exist_ok=True)
        try:
            shutil.copytree(src_dir, out_dir, copy_function=os.link)
        except OSError:
            shutil.copytree(src_dir, out_dir)
        del_dir = os.path.join(out_dir, "deletes")
        os.makedirs(del_dir, exist_ok=True)
        gen = commit["generation"] + 1
        lo = part * total // n_parts
        hi = (part + 1) * total // n_parts
        new_shards = []
        for m in sorted(commit["shards"], key=lambda m: m["pid"]):
            m = dict(m)
            base = int(m["doc_base"])
            gids = base + np.arange(int(m["doc_count"]), dtype=np.int64)
            keep = (gids % n_parts == part) if not sequential \
                else (gids >= lo) & (gids < hi)
            deleted = ~keep
            old = m.get("del_file")
            if old and os.path.exists(old):
                deleted |= np.load(old)
            path = os.path.join(del_dir,
                                f"mpsplit-{m['pid']:05d}-gen{gen}.npy")
            np.save(path, deleted)
            m["del_count"] = int(deleted.sum())
            m["del_file"] = path
            new_shards.append(m)
        meta = {k: commit[k] for k in ("fingerprint", "input_desc",
                                       "split_points", "key_cols",
                                       "keyword_cols", "docvalue_cols",
                                       "token_filters", "text_col", "format")
                if k in commit}
        commits.append(commit_index(out_dir, new_shards, meta))
    return tuple(commits)
