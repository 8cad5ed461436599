"""Index inspection CLI — the Luke diagnostics analogue (`lucene/luke/` app
surface: overview tab = segment table + top terms; documents tab = stored
doc lookup; check = CheckIndex).  Prints one JSON document.

Usage:
  python scripts/inspect_index.py --index /tmp/idx [--top-df 10]
      [--sample-terms 5] [--doc GID] [--check]
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--top-df", type=int, default=10,
                    help="top-k terms by docFreq from the bucketed stats "
                         "(per-bucket top-k, merged — never the full dict)")
    ap.add_argument("--sample-terms", type=int, default=5,
                    help="first/last dictionary terms per shard")
    ap.add_argument("--doc", type=int, default=None,
                    help="stored-fields lookup for one global docID")
    ap.add_argument("--order", default="df", choices=("df", "ttf"),
                    help="HighFreqTerms order (misc/HighFreqTerms.java -t "
                         "flag): docFreq or totalTermFreq")
    ap.add_argument("--term", default=None,
                    help="GetTermInfo: print one term's global df/ttf from "
                         "its stats bucket")
    ap.add_argument("--check", action="store_true",
                    help="run CheckIndex and include its report")
    args = ap.parse_args()

    from lucene_ray.index.manifest import latest_commit, shard_dirname

    commit = latest_commit(args.index)
    if commit is None:
        print(json.dumps({"error": "no commit"}))
        return 1
    out = {
        "generation": commit["generation"],
        "doc_count": commit["doc_count"],
        "doc_count_field": commit.get("doc_count_field"),
        "sum_ttf": commit.get("sum_ttf"),
        "format": commit.get("format"),
        "token_filters": commit.get("token_filters"),
        "n_shards": len(commit["shards"]),
        "shards": [],
    }
    from lucene_ray.index.shard import ShardReader

    for m in commit["shards"]:
        sdir = os.path.join(args.index, "shards", shard_dirname(m))
        rdr = ShardReader(sdir)
        entry = {
            "pid": m["pid"], "dir": shard_dirname(m),
            "doc_base": m.get("doc_base"), "doc_count": m["doc_count"],
            "del_count": m.get("del_count", 0), "n_terms": rdr.n_terms,
            "has_positions": bool(m.get("has_positions")),
            "term_vectors": bool(m.get("term_vectors")),
            "vector_dim": m.get("vector_dim"),
            "dv_updates": sorted(m.get("dv_files") or {}),
            "postings_bytes": os.path.getsize(
                os.path.join(sdir, "postings.bin")),
        }
        if args.sample_terms and rdr.n_terms:
            k = args.sample_terms
            entry["first_terms"] = [str(t) for t in rdr._term_np[:k]]
            entry["last_terms"] = [str(t) for t in rdr._term_np[-k:]]
        out["shards"].append(entry)

    if args.top_df:
        # HighFreqTerms (misc/HighFreqTerms.java): per-bucket top-k by the
        # chosen statistic, merged — never the full dictionary
        import pyarrow.parquet as pq

        key = args.order
        tops = []
        for f in sorted(glob.glob(os.path.join(args.index, "term_stats",
                                               "bucket-*.parquet"))):
            t = pq.read_table(f).sort_by([(key, "descending"),
                                          ("term", "ascending")])
            tops.extend(zip(t.column("term").to_pylist()[:args.top_df],
                            t.column("df").to_pylist()[:args.top_df],
                            t.column("ttf").to_pylist()[:args.top_df]))
        tops.sort(key=lambda x: (-x[1 if key == "df" else 2], x[0]))
        out[f"top_terms_by_{key}"] = [
            {"term": t, "df": int(d), "ttf": int(f)}
            for t, d, f in tops[:args.top_df]]

    if args.term is not None:
        # GetTermInfo (misc/GetTermInfo.java): one term, one stats bucket
        from lucene_ray.search.searcher import IndexSearcher

        s = IndexSearcher(args.index)
        term = s._ft(args.term)
        out["term_info"] = {"term": term, "df": s.df(term),
                            "ttf": s.ttf(term)}

    if args.doc is not None:
        from lucene_ray.search.searcher import IndexSearcher

        s = IndexSearcher(args.index)
        pid = s._pid_of(args.doc)
        rdr = s.reader(pid)
        row = rdr.lookup_docs(
            __import__("numpy").array([args.doc - s._bases[pid]]))
        out["doc"] = {c: row.column(c)[0].as_py() for c in row.column_names}

    if args.check:
        from lucene_ray.index.check import check_index

        out["check"] = check_index(args.index)

    print(json.dumps(out, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
