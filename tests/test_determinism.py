"""Build determinism: identical input -> byte-identical shards, and the
driver call sequence (entry + queries in one session) is re-runnable."""

import hashlib
import os

import pytest

from lucene_ray.index.build import build_index
from lucene_ray.index.manifest import latest_commit
from lucene_ray.sources.transcripts import synth_transcripts


def _shard_hashes(index_dir):
    out = {}
    commit = latest_commit(index_dir)
    for m in commit["shards"]:
        d = os.path.join(index_dir, "shards", f"shard-{m['pid']:05d}")
        h = hashlib.sha256()
        for f in ("postings.bin", "norms.bin", "positions.bin", "terms.parquet"):
            p = os.path.join(d, f)
            if os.path.exists(p):
                h.update(open(p, "rb").read())
        out[m["pid"]] = h.hexdigest()
    return out


def test_build_is_deterministic(ray_session, tmp_path):
    import ray.data as rd

    t = synth_transcripts(1200, seed=90)
    h = []
    for run in range(2):
        d = str(tmp_path / f"det{run}")
        build_index(rd.from_arrow(t), d, target_docs_per_partition=300,
                    input_desc="det")
        h.append(_shard_hashes(d))
    assert h[0] == h[1]


def test_driver_sequence_rerunnable(ray_session):
    """entry() twice + a query twice in one session: stable results."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    a = e.entry()
    b = e.entry()          # second call hits the commit fast path
    assert a.equals(b)
    q = e.queries()["facet_counts"]
    r1 = q("/root/testdata/sf0.001").to_pandas().sort_values("lang").reset_index(drop=True)
    r2 = q("/root/testdata/sf0.001").to_pandas().sort_values("lang").reset_index(drop=True)
    assert r1.equals(r2)
