"""Salted groupby-on-term postings merge: the merged term-major store must
equal the union of per-shard postings under the global docID mapping."""

import numpy as np
import pytest

from lucene_ray.index.build import build_index
from lucene_ray.index.manifest import latest_commit
from lucene_ray.index.merge import MergedPostingsReader, merge_postings
from lucene_ray.index.shard import ShardReader
from lucene_ray.sources.transcripts import synth_transcripts


@pytest.fixture(scope="module")
def merged(ray_session, tmp_path_factory):
    import os

    import ray.data as rd

    d = str(tmp_path_factory.mktemp("mgidx"))
    build_index(rd.from_arrow(synth_transcripts(2500, seed=60)), d,
                target_docs_per_partition=400, input_desc="mg")
    commit = latest_commit(d)
    # small salt_span so hot terms actually split across salt buckets
    out = merge_postings(d, commit, salt_span=500)
    return d, commit, out


def _global_postings(index_dir, commit, term):
    import os

    docs_all, freqs_all = [], []
    for m in commit["shards"]:
        rdr = ShardReader(os.path.join(index_dir, "shards", f"shard-{m['pid']:05d}"))
        tid = rdr.seek_exact(term)
        if tid < 0:
            continue
        docs, freqs = rdr.postings(tid)
        docs_all.append(docs.astype(np.int64) + m["doc_base"])
        freqs_all.append(freqs)
    if not docs_all:
        return np.zeros(0, np.int64), np.zeros(0, np.int32)
    return np.concatenate(docs_all), np.concatenate(freqs_all)


def test_merged_equals_shard_union(merged):
    d, commit, out = merged
    rdr = MergedPostingsReader(out)
    for term in ["the", "query", "data", "merge", "rareterm0003"]:
        mdocs, mfreqs = rdr.postings(term)
        wdocs, wfreqs = _global_postings(d, commit, term)
        assert np.array_equal(mdocs, wdocs), term
        assert np.array_equal(mfreqs, wfreqs), term
        # globally sorted (salt-order concatenation preserved doc order)
        assert np.all(np.diff(mdocs) > 0)


def test_merged_stats_match_term_stats(merged):
    import glob
    import os

    import pyarrow.parquet as pq

    d, commit, out = merged
    merged_t = pq.read_table(out, columns=["term", "df", "ttf"])
    got = {t: (int(df), int(ttf)) for t, df, ttf in
           zip(merged_t.column("term").to_pylist(),
               merged_t.column("df").to_pylist(),
               merged_t.column("ttf").to_pylist())}
    stats = {}
    for p in sorted(glob.glob(os.path.join(d, "term_stats", "*.parquet"))):
        t = pq.read_table(p)
        for term, df, ttf in zip(t.column("term").to_pylist(),
                                 t.column("df").to_pylist(),
                                 t.column("ttf").to_pylist()):
            stats[term] = (int(df), int(ttf))
    assert got == stats
