#!/usr/bin/env python
"""Monitor / percolator CLI (`monitor/Monitor.java` operational surface):
register query ASTs once (persisted with the MonitorQuerySerializer-role
JSON store), then stream a document parquet through an ACTOR-POOL matching
stage — each actor loads the persisted query set once in __init__ and
verifies candidates per batch.

    # persist a demo query set (or write your own JSON with search/serialize)
    python scripts/monitor.py --save-demo /tmp/queries.json
    # stream documents through it
    python scripts/monitor.py --queries /tmp/queries.json \
        --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/matches [--actors 4]

Prints one JSON line: n_docs, n_matches, per-query counts.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _MatchStage:
    """Stateful map_batches stage: the Monitor (trigger index + MemoryIndex
    verifier) builds once per actor from the persisted store."""

    def __init__(self, queries_path: str):
        from lucene_ray.search.serialize import load_monitor

        self.mon = load_monitor(queries_path)

    def __call__(self, t):
        import pyarrow as pa

        docs, qidx = self.mon.match_batch(
            t.column("doc_id").to_numpy(), t.column("text"))
        return pa.table({
            "doc_id": pa.array(docs, type=pa.int64()),
            "query_id": pa.array(self.mon.query_ids[qidx], type=pa.string()),
        })


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--save-demo", default="",
                    help="write the demo query set to this path and exit")
    ap.add_argument("--queries", default="", help="persisted query-set JSON")
    ap.add_argument("--input", default="", help="documents parquet (doc_id, text)")
    ap.add_argument("--output", default="", help="matches parquet dir (optional)")
    ap.add_argument("--actors", type=int, default=2)
    args = ap.parse_args()

    if args.save_demo:
        from lucene_ray.pipelines.percolate import _registered_ast
        from lucene_ray.search.serialize import save_monitor

        save_monitor(args.save_demo, _registered_ast())
        print(json.dumps({"saved": args.save_demo,
                          "n_queries": len(_registered_ast())}))
        return

    if not (args.queries and args.input):
        raise SystemExit("--queries and --input required (or --save-demo)")

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=max(4, args.actors),
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    ds = rd.read_parquet(args.input, columns=["doc_id", "text"])
    matches = ds.map_batches(_MatchStage,
                             fn_constructor_args=(args.queries,),
                             concurrency=args.actors,
                             batch_format="pyarrow")
    if args.output:
        matches.write_parquet(args.output)
        import pyarrow.dataset as pads

        tbl = pads.dataset(args.output).to_table()
    else:
        tbl = matches.take_all()
        import pyarrow as pa

        tbl = pa.Table.from_pylist(tbl) if isinstance(tbl, list) else tbl
    import collections

    per_q = collections.Counter(tbl.column("query_id").to_pylist())
    print(json.dumps({"n_docs": ds.count(), "n_matches": tbl.num_rows,
                      "per_query": dict(sorted(per_q.items()))}))
    ray.shutdown()


if __name__ == "__main__":
    main()
