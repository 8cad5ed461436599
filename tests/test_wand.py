"""Block-max WAND pruning: identical top-k to the exhaustive oracle path, and
evidence that pruning actually skips block decodes (the ImpactsDISI /
WANDScorer contract — pruned and unpruned results agree on top-k)."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.index.shard import ShardReader, write_shard
from lucene_ray.search.query import MUST, SHOULD, TermQuery, bool_query
from lucene_ray.search.scorer import BlockMaxWand, _TermState, search_shard_exhaustive
from lucene_ray.search.searcher import IndexSearcher
from lucene_ray.search.similarity import BM25Similarity
from lucene_ray.sources.transcripts import BASE_TS_US


@pytest.fixture(scope="module")
def big_shard(tmp_path_factory):
    """A single shard big enough that hot terms span many 128-doc blocks."""
    rng = np.random.default_rng(7)
    vocab_hot = ["alpha", "beta", "gamma"]
    vocab_mid = [f"mid{i}" for i in range(50)]
    vocab_rare = [f"rare{i}" for i in range(3000)]
    n = 20000
    texts = []
    for i in range(n):
        words = []
        for h, p in zip(vocab_hot, (0.9, 0.5, 0.25)):
            reps = rng.geometric(1 - p) - 1 if rng.random() < p else 0
            words += [h] * min(int(reps) + (1 if rng.random() < p else 0), 6)
        words += list(rng.choice(vocab_mid, size=int(rng.integers(1, 6))))
        if rng.random() < 0.4:
            words.append(vocab_rare[int(rng.integers(len(vocab_rare)))])
        rng.shuffle(words)
        texts.append(" ".join(words) if words else "filler")
    table = pa.table({
        "conv_id": pa.array([f"conv-{i // 8:08d}" for i in range(n)]),
        "turn_idx": pa.array([i % 8 for i in range(n)], type=pa.int32()),
        "text": pa.array(texts),
    })
    d = str(tmp_path_factory.mktemp("bigshard"))
    m = write_shard(d, 0, table, "wandfp")
    rdr = ShardReader(f"{d}/shard-00000")
    return rdr, m


def _compiled(sim, m, terms, occur=SHOULD, msm=0):
    scoring = []
    for t in terms:
        # per-shard df == global df here (single shard)
        pass
    return None


def _states(rdr, sim, m, terms):
    out = []
    for t in terms:
        tid = rdr.seek_exact(t)
        assert tid >= 0, t
        df = rdr.term_stats(tid)[0]
        out.append(_TermState(rdr, tid, t, sim.scorer(1.0, m["doc_count_field"], m["sum_ttf"], df), None))
    return out


@pytest.mark.parametrize("terms,k", [
    (["alpha"], 10),
    (["alpha", "beta"], 10),
    (["alpha", "beta", "gamma"], 10),
    (["alpha", "mid3", "rare11"], 25),
    (["beta", "gamma"], 100),
])
def test_wand_matches_exhaustive_disjunction(big_shard, terms, k):
    rdr, m = big_shard
    sim = BM25Similarity()
    compiled = {"scoring": [(t, sim.scorer(1.0, m["doc_count_field"], m["sum_ttf"],
                                           rdr.term_stats(rdr.seek_exact(t))[0]), SHOULD)
                            for t in terms],
                "filters": [], "must_nots": [], "msm": 0, "n_required": 0}
    es, ed, etotal, _ = search_shard_exhaustive(rdr, compiled, k)
    wand = BlockMaxWand(rdr, _states(rdr, sim, m, terms), k, threshold=1000)
    ws, wd, wtotal, wrel = wand.run()
    assert np.array_equal(ed, wd)
    assert np.array_equal(es, ws)           # bit-identical float32
    if wrel == "EQUAL_TO":
        assert wtotal == etotal


@pytest.mark.parametrize("terms,k", [
    (["alpha", "beta"], 10),
    (["alpha", "beta", "gamma"], 50),
    (["beta", "mid7"], 10),
])
def test_wand_matches_exhaustive_conjunction(big_shard, terms, k):
    rdr, m = big_shard
    sim = BM25Similarity()
    compiled = {"scoring": [(t, sim.scorer(1.0, m["doc_count_field"], m["sum_ttf"],
                                           rdr.term_stats(rdr.seek_exact(t))[0]), MUST)
                            for t in terms],
                "filters": [], "must_nots": [], "msm": 0, "n_required": len(terms)}
    es, ed, etotal, _ = search_shard_exhaustive(rdr, compiled, k)
    wand = BlockMaxWand(rdr, _states(rdr, sim, m, terms), k, conjunctive=True, threshold=1000)
    ws, wd, wtotal, wrel = wand.run()
    assert np.array_equal(ed, wd)
    assert np.array_equal(es, ws)


@pytest.fixture(scope="module")
def skewed_shard(tmp_path_factory):
    """High-impact docs in the first blocks, weak tail: the BMW sweet spot."""
    n = 10000
    texts = []
    for i in range(n):
        if i < 500:
            texts.append(" ".join(["alpha"] * 10 + ["pad"] * 2))
        else:
            texts.append("alpha " + " ".join(["pad"] * 30))
    table = pa.table({
        "conv_id": pa.array([f"conv-{i:08d}" for i in range(n)]),
        "turn_idx": pa.array([0] * n, type=pa.int32()),
        "text": pa.array(texts),
    })
    d = str(tmp_path_factory.mktemp("skewshard"))
    m = write_shard(d, 0, table, "skewfp")
    return ShardReader(f"{d}/shard-00000"), m


def test_wand_actually_prunes(skewed_shard):
    """With a low totalHitsThreshold, block-max pruning must skip decodes."""
    rdr, m = skewed_shard
    sim = BM25Similarity()
    wand = BlockMaxWand(rdr, _states(rdr, sim, m, ["alpha"]), 10, threshold=10)
    ws, wd, _, rel = wand.run()
    assert wand.blocks_skipped > 0, "no blocks were pruned"
    assert rel == "GREATER_THAN_OR_EQUAL_TO"
    # pruned run still returns the exact top-k
    compiled = {"scoring": [(t, sim.scorer(1.0, m["doc_count_field"], m["sum_ttf"],
                                           rdr.term_stats(rdr.seek_exact(t))[0]), SHOULD)
                            for t in ["alpha"]],
                "filters": [], "must_nots": [], "msm": 0, "n_required": 0}
    es, ed, _, _ = search_shard_exhaustive(rdr, compiled, 10)
    assert np.array_equal(ed, wd)
    assert np.array_equal(es, ws)


def test_wand_threshold_semantics(big_shard):
    """Default threshold 1000: totals below it stay exact (EQUAL_TO)."""
    rdr, m = big_shard
    sim = BM25Similarity()
    tid = rdr.seek_exact("rare11")
    df = rdr.term_stats(tid)[0]
    wand = BlockMaxWand(rdr, _states(rdr, sim, m, ["rare11"]), 5)
    _, _, total, rel = wand.run()
    assert rel == "EQUAL_TO"
    assert total == df
