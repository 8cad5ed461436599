"""Index integrity checker — the CheckIndex equivalent
(`lucene/core/src/java/org/apache/lucene/index/CheckIndex.java` model):
re-reads every structure of every shard and validates invariants.

Checks per shard:
- term dictionary sorted strictly ascending
- every posting list decodes; docIDs strictly ascending, within [0, doc_count)
- df == len(docs); ttf == sum(freqs); freqs >= 1
- skip table last-docs match decoded blocks; impact skylines upper-bound
  every (freq, norm) pair in their block
- norms length == doc_count; docmap row count == doc_count and sorted by key
Global:
- commit doc bases are the prefix sum of shard doc counts
- collection stats equal the sum over shards
- merged term_stats (df, ttf) equal the sum of per-shard stats
"""

from __future__ import annotations

import glob
import os

import numpy as np

from ..search.similarity import BM25Similarity
from .manifest import latest_commit, shard_dirpath
from .postings import BLOCK_SIZE
from .shard import ShardReader


def check_index(index_dir: str, sample_terms: int | None = None,
                exorcise: bool = False) -> dict:
    commit = latest_commit(index_dir)
    if commit is None:
        raise FileNotFoundError(f"no commit in {index_dir}")
    errors: list[str] = []
    n_terms_checked = 0
    sim = BM25Similarity()

    base = 0
    agg = {"doc_count": 0, "doc_count_field": 0, "sum_ttf": 0, "sum_df": 0}
    shard_stats: dict[str, list[int]] = {}
    for m in commit["shards"]:
        if m["doc_base"] != base:
            errors.append(f"shard {m['pid']}: doc_base {m['doc_base']} != prefix sum {base}")
        base += m["doc_count"]
        for k in agg:
            agg[k] += m[k]
        rdr = ShardReader(shard_dirpath(index_dir, m))
        if len(rdr.norms) != rdr.doc_count:
            errors.append(f"shard {m['pid']}: norms length mismatch")
        if m.get("del_file"):
            dels = np.load(m["del_file"])
            if len(dels) != m["doc_count"]:
                errors.append(f"shard {m['pid']}: delete bitmap length mismatch")
            if int(dels.sum()) != m.get("del_count"):
                errors.append(f"shard {m['pid']}: del_count inconsistent with bitmap")
        dm = rdr.docmap()
        if dm.num_rows != rdr.doc_count:
            errors.append(f"shard {m['pid']}: docmap rows != doc_count")
        for fld, path in (m.get("dv_files") or {}).items():
            if not os.path.exists(path):
                errors.append(f"shard {m['pid']}: dv sidecar missing: {path}")
                continue
            dv = np.load(path)
            if len(dv) != m["doc_count"]:
                errors.append(f"shard {m['pid']}: dv sidecar {fld} length "
                              f"{len(dv)} != doc_count {m['doc_count']}")
            r = (m.get("dv_ranges") or {}).get(fld)
            if r and len(dv) and (int(dv.min()) < int(r[0])
                                  or int(dv.max()) > int(r[1])):
                errors.append(f"shard {m['pid']}: dv sidecar {fld} values "
                              f"outside committed dv_ranges")
        # point sidecars: shapes/ranges/leaf bounds/sort order validated by
        # the module's own checker (BKD-block invariants)
        for fld, meta in (m.get("points") or {}).items():
            from .points import check_points

            try:
                check_points(shard_dirpath(index_dir, m), fld, meta,
                             rdr.doc_count)
            except (ValueError, FileNotFoundError) as e:
                errors.append(f"shard {m['pid']}: {e}")
        for fld, meta in (m.get("shapes") or {}).items():
            from .shapes import check_shapes

            try:
                check_shapes(shard_dirpath(index_dir, m), fld, meta,
                             rdr.doc_count)
            except (ValueError, FileNotFoundError) as e:
                errors.append(f"shard {m['pid']}: {e}")
        # vector files (when the shard carries a vector column): row count
        # matches, finite values, graph loads and its node ids are in range
        if int(m.get("vector_dim", 0)) > 0:
            vm = rdr.vectors()
            if vm is None:
                errors.append(f"shard {m['pid']}: vector_dim set but vectors.npy missing")
            else:
                if vm.shape != (rdr.doc_count, int(m["vector_dim"])):
                    errors.append(f"shard {m['pid']}: vectors shape {vm.shape} != "
                                  f"({rdr.doc_count}, {m['vector_dim']})")
                if not np.isfinite(np.asarray(vm, dtype=np.float64)).all():
                    errors.append(f"shard {m['pid']}: non-finite vector values")
            g = rdr.hnsw()
            if g is not None:
                if len(g.ids) and (g.ids.min() < 0 or g.ids.max() >= rdr.doc_count):
                    errors.append(f"shard {m['pid']}: hnsw node id out of range")
                if g.entry >= rdr.doc_count:
                    errors.append(f"shard {m['pid']}: hnsw entry out of range")
        # bloom sidecars (when stored): a FuzzySet can answer NO only for
        # absent terms — every indexed term of the field must be MAYBE
        for bfield, bmeta in (m.get("blooms") or {}).items():
            from .shard import KEYWORD_SEP

            bf = rdr._bloom(bfield)
            prefix = f"{bfield}{KEYWORD_SEP}"
            a = int(np.searchsorted(rdr._term_np, prefix))
            b = int(np.searchsorted(rdr._term_np,
                                    bfield + chr(ord(KEYWORD_SEP) + 1)))
            if b - a != int(bmeta.get("n_terms", b - a)):
                errors.append(f"shard {m['pid']}: bloom n_terms "
                              f"{bmeta.get('n_terms')} != dict slice {b - a}")
            if b > a and not bf.contains(rdr._term_np[a:b].tolist()).all():
                errors.append(f"shard {m['pid']}: bloom false negative "
                              f"in field {bfield!r}")
        # term vectors (when stored): the doc-major transpose must agree
        # with the postings — for sampled docs, every (term, freq) pair in
        # the vector appears as (doc, freq) in that term's posting list
        # (CheckIndex.testTermVectors cross-check semantics)
        if m.get("term_vectors"):
            sample_docs = np.linspace(0, rdr.doc_count - 1,
                                      min(rdr.doc_count, 16)).astype(int) \
                if rdr.doc_count else []
            for d in sample_docs:
                tv_t, tv_f, tv_p = rdr.term_vector(int(d), with_positions=True)
                if np.any(np.diff(tv_t.astype(np.int64)) <= 0):
                    errors.append(f"shard {m['pid']} doc {d}: tv terms not ascending")
                for tid_, f_, pos_ in zip(tv_t, tv_f, tv_p):
                    docs_, freqs_ = rdr.postings(int(tid_))
                    j = np.searchsorted(docs_, d)
                    if j >= len(docs_) or docs_[j] != d or freqs_[j] != f_:
                        errors.append(f"shard {m['pid']} doc {d}: tv/postings "
                                      f"freq mismatch for tid {tid_}")
                    if len(pos_) != f_ or (len(pos_) > 1
                                           and np.any(np.diff(pos_) < 0)):
                        errors.append(f"shard {m['pid']} doc {d}: tv positions "
                                      f"invalid for tid {tid_}")

        tids = range(rdr.n_terms)
        if sample_terms and rdr.n_terms > sample_terms:
            tids = np.linspace(0, rdr.n_terms - 1, sample_terms).astype(int)
        prev_term = None
        scorer = sim.scorer(1.0, max(commit["doc_count_field"], 1),
                            max(commit["sum_ttf"], 1), 1)
        for tid in tids:
            term = rdr._term_np[tid]
            if prev_term is not None and not (prev_term < term):
                errors.append(f"shard {m['pid']}: term order violation at {term!r}")
            prev_term = term
            df, ttf = rdr.term_stats(int(tid))
            docs, freqs = rdr.postings(int(tid))
            if len(docs) != df:
                errors.append(f"shard {m['pid']} {term!r}: df {df} != {len(docs)}")
            if int(freqs.sum()) != ttf:
                errors.append(f"shard {m['pid']} {term!r}: ttf mismatch")
            if len(docs) and (docs[0] < 0 or docs[-1] >= rdr.doc_count):
                errors.append(f"shard {m['pid']} {term!r}: docID out of range")
            if np.any(np.diff(docs.astype(np.int64)) <= 0):
                errors.append(f"shard {m['pid']} {term!r}: docIDs not strictly ascending")
            if np.any(freqs < 1):
                errors.append(f"shard {m['pid']} {term!r}: freq < 1")
            # impact skylines upper-bound their blocks
            so, sl, ic, if_, in_ = rdr.skip_data(int(tid))
            bounds = np.concatenate(([0], np.cumsum(ic)))
            for b in range(len(so)):
                lo = b * BLOCK_SIZE
                hi = min(lo + BLOCK_SIZE, df)
                if sl[b] != docs[hi - 1]:
                    errors.append(f"shard {m['pid']} {term!r}: skip last_doc wrong at block {b}")
                bf = if_[bounds[b]:bounds[b + 1]]
                bn = in_[bounds[b]:bounds[b + 1]]
                bmax = scorer.max_score(bf, bn)
                actual = scorer.score(freqs[lo:hi], rdr.norms[docs[lo:hi]])
                if np.any(actual > bmax + 1e-6):
                    errors.append(f"shard {m['pid']} {term!r}: impact bound violated at block {b}")
            n_terms_checked += 1
            key = str(term)
            s = shard_stats.setdefault(key, [0, 0])
            s[0] += df
            s[1] += ttf

    for k in agg:
        if commit[k] != agg[k]:
            errors.append(f"commit {k} {commit[k]} != shard sum {agg[k]}")

    # merged term_stats consistency (only for fully-checked dictionaries)
    if sample_terms is None:
        import pyarrow.parquet as pq

        stats_dir = os.path.join(index_dir, "term_stats")
        got = {}
        for p in sorted(glob.glob(os.path.join(stats_dir, "*.parquet"))):
            t = pq.read_table(p)
            for term, df, ttf in zip(t.column("term").to_pylist(),
                                     t.column("df").to_pylist(),
                                     t.column("ttf").to_pylist()):
                got[term] = [int(df), int(ttf)]
        if got != shard_stats:
            diff = {k for k in set(got) | set(shard_stats)
                    if got.get(k) != shard_stats.get(k)}
            errors.append(f"term_stats mismatch for {len(diff)} terms e.g. {sorted(diff)[:3]}")

    result = {"ok": not errors, "errors": errors,
              "n_shards": len(commit["shards"]),
              "n_terms_checked": n_terms_checked}
    if exorcise and errors:
        # CheckIndex -exorcise (`index/CheckIndex.java` exorciseIndex):
        # drop shards with per-shard corruption from the commit — LOSES
        # their documents, exactly like the reference's last-resort tool.
        # Commit-level errors (doc_base / aggregate / term_stats drift)
        # don't condemn a shard; commit_index recomputes bases and totals.
        import re as _re

        bad = set()
        for e in errors:
            m_ = _re.match(r"shard (\d+)(?: |:)", e)
            if m_ and "doc_base" not in e:
                bad.add(int(m_.group(1)))
        if bad:
            from .manifest import commit_index

            keep = [m for m in commit["shards"] if m["pid"] not in bad]
            meta = {k: commit[k] for k in
                    ("fingerprint", "input_desc", "split_points", "key_cols",
                     "keyword_cols", "docvalue_cols", "token_filters",
                     "text_col", "format") if k in commit}
            new_commit = commit_index(index_dir, keep, meta)
            # rebuild the merged term_stats store from the survivors so the
            # collection statistics stay consistent with the new commit
            from .build import merge_term_stats

            merge_term_stats(index_dir, new_commit)
            result["exorcised_pids"] = sorted(bad)
            result["lost_docs"] = int(sum(m["doc_count"] for m in commit["shards"]
                                          if m["pid"] in bad))
            result["new_generation"] = new_commit["generation"]
    return result


def check_join_index(index_dir: str) -> dict:
    """CheckJoinIndex (`join/.../CheckJoinIndex.java:34-78`) for our
    block-join layout: every conversation's turns must form ONE contiguous
    run inside ONE shard (the reference checks every segment's parent
    BitSet covers whole blocks; here blocks are conv runs under the
    (conv_id, turn_idx) index sort, and conv ranges must not overlap across
    shards — ToParentBlockJoin/conv grouping rely on both)."""
    import numpy as np
    import pyarrow.parquet as pq

    from .manifest import latest_commit, shard_dirpath

    commit = latest_commit(index_dir)
    if commit is None:
        raise FileNotFoundError(index_dir)
    errors: list[str] = []
    shard_ranges = []
    for m in sorted(commit["shards"], key=lambda m: m["pid"]):
        conv = pq.read_table(
            os.path.join(shard_dirpath(index_dir, m), "docmap.parquet"),
            columns=["conv_id"]).column("conv_id").to_numpy(
            zero_copy_only=False)
        if not len(conv):
            continue
        # contiguity: a conv value must never restart after a different one
        change = np.nonzero(conv[1:] != conv[:-1])[0]
        starts = conv[np.concatenate(([0], change + 1))]
        if len(np.unique(starts)) != len(starts):
            dupes = [str(s) for s in starts[np.nonzero(
                starts[1:] == starts[:-1])[0]]][:3]
            errors.append(f"shard pid={m['pid']}: conversation split into "
                          f"non-contiguous runs (e.g. {dupes})")
        shard_ranges.append((m["pid"], str(conv.min()), str(conv.max()),
                             set(np.unique(conv).tolist())))
    for i in range(len(shard_ranges)):
        for j in range(i + 1, len(shard_ranges)):
            overlap = shard_ranges[i][3] & shard_ranges[j][3]
            if overlap:
                errors.append(
                    f"conversation(s) span shards pid={shard_ranges[i][0]} "
                    f"and pid={shard_ranges[j][0]}: "
                    f"{sorted(overlap)[:3]}")
    return {"ok": not errors, "errors": errors,
            "n_shards_checked": len(shard_ranges)}
