"""Term-major posting-list consolidation — the SegmentMerger re-expression.

The reference merge (`index/SegmentMerger.java:104-145`, ``mergeTerms`` at
:196) k-way-merges sorted term streams and concatenates docID-remapped
postings per term.  Ray-Data-first, that becomes the north rule's
"groupby-on-term aggregate shuffle with explicit salting for skewed hot
terms":

    per-shard map: decode each term's postings, remap local→global docIDs
      emit (term, salt, docs:list<int64>, freqs:list<int32>)
      where salt = doc_base // salt_span — a DOC-RANGE bucket, so a hot
      term (present in every shard) is split across reducers instead of
      landing on one
    → groupby(term, salt).map_groups: concat runs in doc_base order
      (partitions own disjoint ordered docID ranges, so in-salt
      concatenation is already doc-sorted)
    → groupby(term).map_groups: concatenate the salt runs in salt order —
      valid for the same reason — and emit the final merged posting list
    → write hash-bucketed parquet (term, df, ttf, docs, freqs)

The per-shard doc-partitioned index remains the serving layout (Lucene
keeps segments too); the merged store is the term-major artifact for
term-centric consumers (stats audits, posting exports) and is validated
against the shards by tests + CheckIndex-style equivalence.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pyarrow as pa

from .manifest import latest_commit, shard_dirpath
from .shard import ShardReader


def merge_postings(index_dir: str, commit: dict | None = None, *,
                   salt_span: int = 500_000, n_buckets: int = 16,
                   out_dir: str | None = None) -> str:
    """Run the salted term merge; returns the merged store directory."""
    import ray
    import ray.data

    commit = commit or latest_commit(index_dir)
    out_dir = out_dir or os.path.join(index_dir, "merged_postings")

    shard_rows = [{"shard_dir": shard_dirpath(index_dir, m),
                   "doc_base": int(m["doc_base"])}
                  for m in commit["shards"]]

    def decode_shard(batch: pa.Table) -> pa.Table:
        terms_out, salts, bases, docs_out, freqs_out = [], [], [], [], []
        for shard_dir, doc_base in zip(batch.column("shard_dir").to_pylist(),
                                       batch.column("doc_base").to_pylist()):
            rdr = ShardReader(shard_dir)
            salt = int(doc_base) // salt_span
            for tid in range(rdr.n_terms):
                docs, freqs = rdr.postings(tid)
                terms_out.append(rdr._term_np[tid])
                salts.append(salt)
                bases.append(doc_base)
                docs_out.append((docs.astype(np.int64) + doc_base))
                freqs_out.append(freqs)
        return pa.table({
            "term": pa.array(terms_out, type=pa.string()),
            "salt": pa.array(salts, type=pa.int32()),
            "doc_base": pa.array(bases, type=pa.int64()),
            "docs": pa.array([d.tolist() for d in docs_out], type=pa.list_(pa.int64())),
            "freqs": pa.array([f.tolist() for f in freqs_out], type=pa.list_(pa.int32())),
        })

    def concat_in_salt(g: pa.Table) -> pa.Table:
        # one (term, salt): concat runs in doc_base order (disjoint ranges)
        order = np.argsort(g.column("doc_base").to_numpy(), kind="stable")
        docs = np.concatenate([np.asarray(g.column("docs")[int(i)].as_py(), dtype=np.int64)
                               for i in order])
        freqs = np.concatenate([np.asarray(g.column("freqs")[int(i)].as_py(), dtype=np.int32)
                                for i in order])
        return pa.table({
            "term": g.column("term").slice(0, 1),
            "salt": g.column("salt").slice(0, 1),
            "docs": pa.array([docs.tolist()], type=pa.list_(pa.int64())),
            "freqs": pa.array([freqs.tolist()], type=pa.list_(pa.int32())),
        })

    def concat_salts(g: pa.Table) -> pa.Table:
        # one term: salt buckets are doc-range ordered, concat in salt order
        order = np.argsort(g.column("salt").to_numpy(), kind="stable")
        docs = np.concatenate([np.asarray(g.column("docs")[int(i)].as_py(), dtype=np.int64)
                               for i in order])
        freqs = np.concatenate([np.asarray(g.column("freqs")[int(i)].as_py(), dtype=np.int32)
                                for i in order])
        term = g.column("term")[0].as_py()
        bucket = zlib.crc32(term.encode()) % n_buckets
        return pa.table({
            "term": pa.array([term], type=pa.string()),
            "bucket": pa.array([bucket], type=pa.int32()),
            "df": pa.array([len(docs)], type=pa.int64()),
            "ttf": pa.array([int(freqs.sum())], type=pa.int64()),
            "docs": pa.array([docs.tolist()], type=pa.list_(pa.int64())),
            "freqs": pa.array([freqs.tolist()], type=pa.list_(pa.int32())),
        })

    merged = (
        ray.data.from_items(shard_rows)
        .map_batches(decode_shard, batch_format="pyarrow", batch_size=1)
        .groupby(["term", "salt"]).map_groups(concat_in_salt, batch_format="pyarrow")
        .groupby("term").map_groups(concat_salts, batch_format="pyarrow")
    )
    import shutil
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    merged.write_parquet(out_dir)
    return out_dir


class MergedPostingsReader:
    """Reader over the term-major merged store (parquet with predicate
    pushdown per term)."""

    def __init__(self, merged_dir: str):
        self.dir = merged_dir

    def postings(self, term: str):
        import pyarrow.parquet as pq

        t = pq.read_table(self.dir, filters=[("term", "==", term)])
        if t.num_rows == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int32)
        docs = np.asarray(t.column("docs")[0].as_py(), dtype=np.int64)
        freqs = np.asarray(t.column("freqs")[0].as_py(), dtype=np.int32)
        return docs, freqs


# ---------------------------------------------------------------------------
# Segment-level merge: IndexWriter.forceMerge / SegmentMerger re-expression
# ---------------------------------------------------------------------------

def _merge_group(index_dir: str, members: list[dict], pid: int,
                 dirname: str, fp: str, key_cols: list[str]) -> dict:
    """Rewrite one contiguous group of shards into a single new shard.

    The reference merge (`index/SegmentMerger.java:104-145`; ``mergeTerms``
    at :196 k-way-merges sorted term streams, `index/DocIDMerger.java`
    remaps docIDs, and under an index sort `index/SortingCodecReader.java`
    re-sorts the merged docs by the sort key).  Here the whole group is one
    Ray task — decode every member's postings, drop deleted docs (merge
    expunges deletes: `index/IndexWriter.java` forceMergeDeletes contract),
    remap + re-sort by ``key_cols`` (the index sort), and hand the merged
    inversion arrays to the same ``_persist_shard`` codec-write path a
    flush uses.  No driver-side data: members stream from shard files on
    whatever node the task lands on.
    """
    import shutil

    import pyarrow.compute as pc

    from .shard import (
        HNSW_FILE,
        KEYWORD_SEP,
        PAYLOADS_FILE,
        VECTORS_FILE,
        VECTORS_Q_FILE,
        _persist_shard,
        read_manifest,
    )

    out_dir = os.path.join(index_dir, "shards")
    final_dir = os.path.join(out_dir, dirname)
    if os.path.exists(final_dir):
        m = read_manifest(final_dir)
        if m and m.get("status") == "committed" and m.get("fingerprint") == fp:
            return m                       # resume: identical merge already done
        shutil.rmtree(final_dir)
    tmp_dir = final_dir + ".tmp"
    if os.path.exists(tmp_dir):
        shutil.rmtree(tmp_dir)
    os.makedirs(tmp_dir)

    has_pos = all(m.get("has_positions") for m in members)
    want_vecs = all(int(m.get("vector_dim") or 0) > 0 for m in members)
    quantized = want_vecs and all(m.get("vector_scale") is not None for m in members)
    want_graph = False
    want_tv = all(m.get("term_vectors") for m in members)

    terms_parts, inv_sizes = [], []
    dfs_parts, docs_parts, freqs_parts, pos_parts = [], [], [], []
    norms_parts, dm_parts, vec_parts = [], [], []
    pay_parts: list[tuple] = []
    pts_parts: dict[str, list] = {}
    shp_parts: dict[str, list] = {}
    base = 0
    for m in sorted(members, key=lambda x: x["pid"]):
        rdr = ShardReader(shard_dirpath(index_dir, m))
        rdr.set_deletes(m.get("del_file"))
        deleted = rdr.deleted if (rdr.deleted is not None and rdr.deleted.any()) else None
        keep_doc = None
        if deleted is not None:
            keep_doc = ~deleted
            old2new = np.cumsum(keep_doc) - 1        # survivor rank
        n_live = int(keep_doc.sum()) if keep_doc is not None else rdr.doc_count

        t_docs, t_freqs, t_pos, t_dfs, used = [], [], [], [], []
        for tid in range(rdr.n_terms):
            docs, freqs = rdr.postings(tid)
            pos = rdr.positions(tid, freqs) if has_pos else None
            if deleted is not None:
                keepp = keep_doc[docs]
                if not keepp.all():
                    if pos is not None:
                        pos = pos[np.repeat(keepp, freqs)]
                    docs, freqs = docs[keepp], freqs[keepp]
                    if not len(docs):
                        continue           # term fully expunged
                docs = old2new[docs]
            used.append(tid)
            t_dfs.append(len(docs))
            t_docs.append(docs.astype(np.int64) + base)
            t_freqs.append(freqs)
            if pos is not None:
                t_pos.append(pos)
        terms_parts.append(rdr._term_np[used])
        inv_sizes.append(len(used))
        dfs_parts.append(np.asarray(t_dfs, dtype=np.int64))
        docs_parts.append(np.concatenate(t_docs) if t_docs else np.zeros(0, np.int64))
        freqs_parts.append(np.concatenate(t_freqs) if t_freqs else np.zeros(0, np.int32))
        if has_pos:
            pos_parts.append(np.concatenate(t_pos) if t_pos else np.zeros(0, np.int32))

        nb = np.asarray(rdr.norms)
        norms_parts.append(nb[keep_doc] if keep_doc is not None else nb)
        dm = rdr.docmap()
        # fold doc-values update generations into the merged segment (the
        # SegmentMerger reads through the updated reader view and the
        # sidecars die with the old segment — ReadersAndUpdates semantics)
        for fld in (m.get("dv_files") or {}):
            rdr.set_dv_updates(m.get("dv_files"), m.get("dv_ranges"))
            col = dm.column(fld)
            upd = pa.array(rdr.docvalue(fld), type=pa.int64()).cast(col.type)
            dm = dm.set_column(dm.column_names.index(fld), fld, upd)
        dm_parts.append(dm.filter(pa.array(keep_doc)) if keep_doc is not None else dm)
        if want_vecs:
            vm = np.asarray(rdr.vectors(), dtype=np.float32)
            vec_parts.append(vm[keep_doc] if keep_doc is not None else vm)
            want_graph = want_graph or rdr.hnsw() is not None
        # point sidecars: survivors remapped like postings docs; the merged
        # sidecar is rebuilt (re-sorted into leaf order) after the index
        # sort.  Shape bbox fields (<field>__bbox) are rebuilt by the shape
        # merge below instead.
        for fld in (m.get("points") or {}):
            if fld.endswith("__bbox") and fld[:-6] in (m.get("shapes") or {}):
                continue
            pr = rdr.points(fld)
            pvals = np.asarray(pr.vals)
            pdocs = np.asarray(pr.docs).astype(np.int64)
            if deleted is not None:
                kp = keep_doc[pdocs]
                pvals, pdocs = pvals[kp], old2new[pdocs[kp]]
            pts_parts.setdefault(fld, []).append((pvals, pdocs + base))
        # payload sidecar ((doc, raw position) -> float32): survivors keep
        # their raw token positions, docs remap like postings
        pf = os.path.join(rdr.dir, PAYLOADS_FILE)
        if os.path.exists(pf):
            z = np.load(pf)
            p_off, p_pos, p_val = z["doc_off"], z["pos"], z["val"]
            p_docs = np.repeat(np.arange(len(p_off) - 1, dtype=np.int64),
                               np.diff(p_off))
            if deleted is not None:
                kp = keep_doc[p_docs]
                p_docs = old2new[p_docs[kp]]
                p_pos, p_val = p_pos[kp], p_val[kp]
            if len(p_docs):
                pay_parts.append((p_docs + base, p_pos, p_val))
        for fld in (m.get("shapes") or {}):
            sr = rdr.shapes(fld)
            sdocs = np.asarray(sr.docs).astype(np.int64)
            verts = np.asarray(sr.verts)
            offs = np.asarray(sr.offs)
            keep_idx = np.arange(len(sdocs))
            if deleted is not None:
                keep_idx = keep_idx[keep_doc[sdocs]]
            for i in keep_idx:
                nd = old2new[sdocs[i]] if deleted is not None else sdocs[i]
                shp_parts.setdefault(fld, []).append(
                    (int(nd + base), verts[offs[i]:offs[i + 1]],
                     sr.ring_sizes(int(i))))
        base += n_live

    n_docs = base
    if n_docs >= 2**31 - 128:
        raise ValueError("merged segment exceeds int32 local docID space; "
                         "raise max_segments")

    # ---- index sort: re-sort merged docs by key_cols (SortingCodecReader) ----
    merged_dm = pa.concat_tables(dm_parts).combine_chunks() if dm_parts else None
    sort_keys = [merged_dm.column(c) for c in key_cols]
    perm = np.lexsort(tuple(k.to_numpy(zero_copy_only=False)
                            for k in reversed(sort_keys)))
    sort_map = np.empty(n_docs, dtype=np.int64)
    sort_map[perm] = np.arange(n_docs)
    merged_dm = merged_dm.take(pa.array(perm))
    norms = np.concatenate(norms_parts)[perm] if norms_parts else np.zeros(0, np.uint8)

    # ---- merge term dictionaries + flat posting arrays ----
    all_terms = np.concatenate(terms_parts)
    merged_terms, inv = np.unique(all_terms, return_inverse=True)
    inv_bounds = np.concatenate(([0], np.cumsum(inv_sizes)))
    tid_pp = np.concatenate([
        np.repeat(inv[inv_bounds[i]:inv_bounds[i + 1]], dfs_parts[i])
        for i in range(len(members))]) if len(all_terms) else np.zeros(0, np.int64)
    docs_flat = sort_map[np.concatenate(docs_parts)] if len(tid_pp) else np.zeros(0, np.int64)
    freqs_flat = np.concatenate(freqs_parts) if len(tid_pp) else np.zeros(0, np.int32)
    order = np.lexsort((docs_flat, tid_pp))
    doc_of = docs_flat[order].astype(np.int32)
    freq = freqs_flat[order].astype(np.int32)
    term_starts = np.concatenate(([0], np.cumsum(
        np.bincount(tid_pp, minlength=len(merged_terms))))).astype(np.int64)

    if has_pos and len(tid_pp):
        pos_flat = np.concatenate(pos_parts)
        pb = np.concatenate(([0], np.cumsum(freqs_flat.astype(np.int64))))
        lens = freqs_flat[order].astype(np.int64)
        out_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        gather = np.repeat(pb[:-1][order], lens) + (
            np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(out_starts, lens))
        positions = pos_flat[gather].astype(np.int32)
    else:
        positions = np.zeros(0, np.int32)

    terms_pa = pa.array(merged_terms, type=pa.string())

    # live stats shrink at merge time (the reference's per-segment stats
    # contract): recompute from the surviving TEXT postings
    kw_mask = pc.match_substring(terms_pa, KEYWORD_SEP) \
        .to_numpy(zero_copy_only=False).astype(bool) if len(merged_terms) \
        else np.zeros(0, bool)
    text_pp = ~kw_mask[tid_pp[order]] if len(tid_pp) else np.zeros(0, bool)
    sum_ttf = int(freq[text_pp].sum()) if len(freq) else 0
    doc_count_field = int(len(np.unique(doc_of[text_pp]))) if len(doc_of) else 0

    # ---- vectors: concat survivors (sorted), requantize, rebuild the graph ----
    vector_dim, vector_scale = 0, None
    if want_vecs and n_docs:
        vm = np.concatenate(vec_parts)[perm]
        vector_dim = vm.shape[1]
        if quantized:
            amax = float(np.abs(vm).max())
            vector_scale = (amax / 127.0) if amax > 0 else 1.0
            qm = np.clip(np.round(vm / vector_scale), -127, 127).astype(np.int8)
            np.save(os.path.join(tmp_dir, VECTORS_Q_FILE), qm)
            vm = qm.astype(np.float32) * np.float32(vector_scale)
        else:
            np.save(os.path.join(tmp_dir, VECTORS_FILE), vm)
        if want_graph:
            from .hnsw import HnswGraph

            nrm = np.linalg.norm(vm.astype(np.float64), axis=1)
            nrm[nrm == 0] = 1.0
            g = HnswGraph(vm.astype(np.float64) / nrm[:, None],
                          np.arange(n_docs, dtype=np.int64),
                          seed=1000 + pid).build()
            g.save(os.path.join(tmp_dir, HNSW_FILE))

    if pay_parts:
        pd = sort_map[np.concatenate([p[0] for p in pay_parts])]
        pp = np.concatenate([p[1] for p in pay_parts])
        pv = np.concatenate([p[2] for p in pay_parts])
        o = np.lexsort((pp, pd))
        pd, pp, pv = pd[o], pp[o], pv[o]
        np.savez(os.path.join(tmp_dir, PAYLOADS_FILE),
                 doc_off=np.searchsorted(pd, np.arange(n_docs + 1))
                 .astype(np.int64),
                 pos=pp.astype(np.int32), val=pv.astype(np.float32))

    points_meta = {}
    if pts_parts:
        from .points import write_points

        for fld, parts in sorted(pts_parts.items()):
            coords = np.concatenate([v for v, _ in parts])
            pdocs = sort_map[np.concatenate([d for _, d in parts])]
            points_meta[fld] = write_points(tmp_dir, fld, coords,
                                            pdocs.astype(np.int32))
    shapes_meta = {}
    if shp_parts:
        from .shapes import write_shapes

        for fld, parts in sorted(shp_parts.items()):
            sdocs = sort_map[np.asarray([d for d, _, _ in parts],
                                        dtype=np.int64)]
            counts = np.asarray([len(v) for _, v, _ in parts], dtype=np.int64)
            allv = np.concatenate([v for _, v, _ in parts]) if parts \
                else np.zeros((0, 2), dtype=np.int64)
            ring_sizes = [r for _, _, r in parts]
            src = next((m["shapes"][fld] for m in members
                        if fld in (m.get("shapes") or {})), {})
            shapes_meta[fld] = write_shapes(
                tmp_dir, fld, allv[:, 0], allv[:, 1], counts,
                sdocs.astype(np.int32), mode=src.get("mode", "geo"),
                gtype=src.get("gtype", "polygon"),
                ring_sizes=ring_sizes or None)
            points_meta[f"{fld}__bbox"] = shapes_meta[fld]["bbox"]

    range_cols = [c for c in merged_dm.column_names if c != key_cols[0]]
    return _persist_shard(
        tmp_dir, final_dir, pid, terms_pa, term_starts, doc_of, freq, positions,
        index_positions=has_pos, norms=norms, docmap_tbl=merged_dm,
        range_cols=range_cols, doc_count_field=doc_count_field,
        sum_ttf=sum_ttf, vector_dim=vector_dim, vector_scale=vector_scale,
        term_vectors=want_tv, fingerprint=fp,
        bloom_fields=tuple(sorted({f for m in members
                                   for f in (m.get("blooms") or {})})),
        extra={"dir": dirname, "merged_from": [int(m["pid"]) for m in members],
               **({"points": points_meta} if points_meta else {}),
               **({"shapes": shapes_meta} if shapes_meta else {})})


def _plan_merge_groups(shards: list[dict], max_segments: int) -> list[list[dict]]:
    """Contiguous (pid-ordered) grouping balanced by live doc count — the
    stand-in for TieredMergePolicy's forceMerge spec (`TieredMergePolicy
    .java:30-91`); contiguity preserves global doc order under the
    pid-sorted doc_base prefix sum."""
    n = max(1, min(max_segments, len(shards)))
    live = [m["doc_count"] - int(m.get("del_count") or 0) for m in shards]
    total = sum(live) or 1
    groups, cur, acc = [], [], 0
    for i, m in enumerate(shards):
        cur.append(m)
        acc += live[i]
        remaining = len(shards) - i - 1
        if (len(groups) + 1 < n and acc >= total / n
                and remaining >= n - len(groups) - 1):
            groups.append(cur)
            cur, acc = [], 0
    if cur:
        groups.append(cur)
    return groups


def force_merge(index_dir: str, max_segments: int = 1, *,
                expunge_deletes_only: bool = False,
                commit: dict | None = None, merge_stats: bool = True) -> dict:
    """``IndexWriter.forceMerge(maxNumSegments)`` (`index/IndexWriter.java:
    2069-2130`) / ``forceMergeDeletes`` re-expression: rewrite the committed
    shards into at most ``max_segments`` segments (one Ray task per merge
    group, scheduled concurrently), expunging deleted docs, then publish a
    new commit generation.  Old shard dirs stay on disk (immutable,
    referenced by older commit points) until ``prune_commits``.

    ``expunge_deletes_only=True`` keeps the segment count but rewrites only
    shards carrying deletes (forceMergeDeletes semantics).  Shards that end
    up alone in their group with no deletes pass through untouched.
    """
    commit = commit or latest_commit(index_dir)
    if commit is None:
        raise FileNotFoundError(f"no commit in {index_dir}")
    shards = sorted(commit["shards"], key=lambda m: m["pid"])
    if expunge_deletes_only:
        groups = [[m] for m in shards]
    else:
        groups = _plan_merge_groups(shards, max_segments)
    return _run_merge(index_dir, commit, groups, merge_stats=merge_stats)


def _run_merge(index_dir: str, commit: dict, groups: list[list[dict]],
               *, merge_stats: bool = True) -> dict:
    """Execute a merge plan: one Ray task per multi-shard (or
    delete-carrying) group, pass-through for the rest, then commit."""
    import ray

    from . import manifest as mf
    from .build import merge_term_stats

    key_cols = list(commit.get("key_cols") or ("conv_id", "turn_idx"))
    new_gen = int(commit["generation"]) + 1
    merge_group = ray.remote(_merge_group)
    futs, out = [], []
    for g in groups:
        if len(g) == 1 and not g[0].get("del_count"):
            out.append(dict(g[0]))                            # pass-through
            continue
        pid = int(g[0]["pid"])
        dirname = f"shard-{pid:05d}-g{new_gen}"
        fp = mf.fingerprint({
            "merge": [[int(m["pid"]), m.get("fingerprint"),
                       int(m.get("del_count") or 0)] for m in g]})
        futs.append(merge_group.remote(index_dir, [dict(m) for m in g],
                                       pid, dirname, fp, key_cols))
    manifests = out + list(ray.get(futs))
    meta = {k: v for k, v in commit.items()
            if k not in ("generation", "shards", "doc_count",
                         "doc_count_field", "sum_ttf", "sum_df")}
    new_commit = mf.commit_index(index_dir, manifests, meta)
    if merge_stats:
        merge_term_stats(index_dir, new_commit)
    return new_commit


def maybe_merge(index_dir: str, *, target_docs_per_segment: int = 200_000,
                max_merge_at_once: int = 10, deletes_pct_allowed: float = 20.0,
                commit: dict | None = None,
                merge_stats: bool = True) -> dict | None:
    """``IndexWriter.maybeMerge`` + TieredMergePolicy-lite
    (`index/TieredMergePolicy.java:30-91`: defaults maxMergeAtOnce=10,
    deletesPctAllowed=20): after appends/deletes have accumulated small or
    delete-heavy segments, consolidate them in the background.

    A shard is merge-eligible when its LIVE doc count is under half the
    target (undersized — typical of incremental appends) or its delete
    ratio exceeds ``deletes_pct_allowed``.  Adjacent eligible shards are
    greedily grouped (contiguity preserves global doc order) up to
    ``max_merge_at_once`` members / ``target_docs_per_segment`` live docs
    per group.  Returns the new commit, or None when nothing qualifies —
    the steady state, so repeated calls are cheap and idempotent.
    """
    commit = commit or latest_commit(index_dir)
    if commit is None:
        raise FileNotFoundError(f"no commit in {index_dir}")
    shards = sorted(commit["shards"], key=lambda m: m["pid"])

    def live(m):
        return int(m["doc_count"]) - int(m.get("del_count") or 0)

    def eligible(m):
        dels = int(m.get("del_count") or 0)
        return (live(m) < target_docs_per_segment // 2
                or (m["doc_count"] and
                    100.0 * dels / m["doc_count"] > deletes_pct_allowed))

    groups, cur, acc = [], [], 0
    did_work = False
    for m in shards:
        if (eligible(m) and len(cur) < max_merge_at_once
                and acc + live(m) <= target_docs_per_segment):
            cur.append(m)
            acc += live(m)
            continue
        if cur:
            did_work = did_work or len(cur) > 1 or bool(cur[0].get("del_count"))
            groups.append(cur)
            cur, acc = [], 0
        if eligible(m):
            cur, acc = [m], live(m)
        else:
            groups.append([m])
    if cur:
        did_work = did_work or len(cur) > 1 or bool(cur[0].get("del_count"))
        groups.append(cur)
    if not did_work:
        return None
    return _run_merge(index_dir, commit, groups, merge_stats=merge_stats)


def rearrange_index(src_dir: str, dest_dir: str, selectors) -> dict:
    """IndexRearranger (`misc/.../index/IndexRearranger.java:40-120`):
    rewrite an index into one whose segments are defined by document
    selectors — segment i holds exactly the docs matching ``selectors[i]``
    (queries).  Like the reference, the selectors must PARTITION the live
    docs (every live doc selected exactly once) or this raises.

    Composition over existing machinery: per selector, hardlink-copy the
    immutable segments, mask the complement as deleted, force_merge(1) to
    expunge (one Ray merge task per selector, concurrent), then graft the
    single-segment indexes together with addIndexes.  No text re-analysis
    anywhere — postings rewrite only, like the reference's
    addIndexes(CodecReader)."""
    import shutil
    import tempfile

    from ..search.searcher import IndexSearcher
    from .build import add_indexes
    from .manifest import latest_commit

    commit = latest_commit(src_dir)
    if commit is None:
        raise FileNotFoundError(src_dir)
    searcher = IndexSearcher(src_dir, query_cache=False)
    # per-shard selector masks + partition check
    per_shard_masks: dict[int, list[np.ndarray]] = {}
    for pid in searcher._pids:
        rdr = searcher.reader(pid)
        cover = np.zeros(rdr.doc_count, dtype=np.int64)
        masks = []
        for sel in selectors:
            compiled = searcher.compile(sel)
            _s, docs, _t, _r = searcher.search_shard(
                rdr, compiled, rdr.doc_count, total_hits_threshold=2**31 - 1)
            m = np.zeros(rdr.doc_count, dtype=bool)
            m[docs] = True
            if rdr.deleted is not None:
                m &= ~rdr.deleted
            masks.append(m)
            cover += m
        live = ~rdr.deleted if rdr.deleted is not None \
            else np.ones(rdr.doc_count, dtype=bool)
        if (cover[live] != 1).any():
            n0 = int((cover[live] == 0).sum())
            n2 = int((cover[live] > 1).sum())
            raise ValueError(
                f"selectors must partition the live docs: shard pid={pid} "
                f"has {n0} unselected and {n2} multiply-selected docs")
        per_shard_masks[pid] = masks

    tmp_root = tempfile.mkdtemp(prefix="rearrange-", dir=os.path.dirname(
        os.path.abspath(dest_dir)) or ".")
    parts = []
    try:
        for i in range(len(selectors)):
            part_dir = os.path.join(tmp_root, f"part-{i:03d}")
            try:
                shutil.copytree(src_dir, part_dir, copy_function=os.link)
            except OSError:
                shutil.copytree(src_dir, part_dir)
            del_dir = os.path.join(part_dir, "deletes")
            os.makedirs(del_dir, exist_ok=True)
            gen = commit["generation"] + 1
            new_shards = []
            for m in commit["shards"]:
                m = dict(m)
                deleted = ~per_shard_masks[m["pid"]][i]
                path = os.path.join(
                    del_dir, f"rearrange-{m['pid']:05d}-gen{gen}.npy")
                np.save(path, deleted)
                m["del_count"] = int(deleted.sum())
                m["del_file"] = path
                new_shards.append(m)
            from .manifest import commit_index

            meta = {k: commit[k] for k in ("fingerprint", "input_desc",
                                           "split_points", "key_cols",
                                           "keyword_cols", "docvalue_cols",
                                           "token_filters", "text_col",
                                           "format") if k in commit}
            commit_index(part_dir, new_shards, meta)
            force_merge(part_dir, 1)
            parts.append(part_dir)
        shutil.move(parts[0], dest_dir)
        out = add_indexes(dest_dir, parts[1:]) if len(parts) > 1 \
            else latest_commit(dest_dir)
        return out
    finally:
        shutil.rmtree(tmp_root, ignore_errors=True)
