#!/usr/bin/env python
"""IndexMergeTool (misc/IndexMergeTool.java) analogue: graft source indexes
into a destination index (IndexWriter.addIndexes), optionally force-merging
the result down to N segments.

    python scripts/merge_indexes.py --dest /path/idx --src a_idx b_idx \
        [--force-merge N]

Prints one JSON line with the new commit's shape.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dest", required=True)
    ap.add_argument("--src", nargs="+", required=True)
    ap.add_argument("--force-merge", type=int, default=0,
                    help="merge down to N segments after the graft")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from lucene_ray.index.build import add_indexes

    commit = add_indexes(args.dest, args.src)
    if args.force_merge:
        from lucene_ray.index.merge import force_merge

        commit = force_merge(args.dest, args.force_merge)
    print(json.dumps({"generation": commit["generation"],
                      "n_shards": len(commit["shards"]),
                      "doc_count": commit["doc_count"],
                      "sum_ttf": commit["sum_ttf"]}))
    ray.shutdown()


if __name__ == "__main__":
    main()
