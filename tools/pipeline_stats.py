"""Print Ray Data execution stats (`Dataset.stats()`) for representative
pipelines — the measure-don't-guess loop: per-operator wall time, block
counts, and memory so a stage dominated by overhead (instead of useful
compute) is visible.

Usage: python tools/pipeline_stats.py [sf_dir] [pipeline ...]
Pipelines: term_counts dedup_minhash classify_nb percolate_ast redact
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    def show(name, make):
        if only and name not in only:
            return
        ds = make()
        if hasattr(ds, "materialize"):
            ds = ds.materialize()
            print(f"===== {name} =====")
            print(ds.stats())
        else:
            print(f"===== {name} (driver-shaped result; no dataset stats)")

    from lucene_ray.pipelines import dedup, percolate, textstats

    show("term_counts", lambda: textstats.term_counts(sf_dir))
    show("dedup_minhash", lambda: dedup.dedup_minhash(sf_dir))
    show("percolate_ast", lambda: percolate.percolate_ast(sf_dir))
    show("redact", lambda: textstats.redact(sf_dir))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
