"""Pipeline smoke + property tests (the SQL oracles are exercised by the
driver and tools/check_oracles.py; here we check the rows-only ops)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_minhash_similarity_property():
    """MinHash collision probability approximates Jaccard."""
    from lucene_ray.pipelines.dedup import minhash_signature

    a = [f"w{i}" for i in range(40)]
    b = a[:30] + [f"x{i}" for i in range(10)]       # high overlap
    c = [f"y{i}" for i in range(40)]                 # disjoint
    sa, sb, sc = (minhash_signature(t, k=1) for t in (a, b, c))
    sim_ab = (sa == sb).mean()
    sim_ac = (sa == sc).mean()
    assert sim_ab > 0.4
    assert sim_ac < 0.1
    # deterministic across calls
    assert np.array_equal(sa, minhash_signature(a, k=1))


def test_simhash_property():
    from lucene_ray.pipelines.dedup import simhash64

    a = ["alpha", "beta", "gamma"] * 10
    b = a + ["delta"]
    c = [f"z{i}" for i in range(30)]
    ha, hb, hc = int(simhash64(a)), int(simhash64(b)), int(simhash64(c))
    assert bin(ha ^ hb).count("1") < bin(ha ^ hc).count("1")
    assert ha == int(simhash64(a))


def test_dedup_exact_finds_planted_duplicates(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import pyarrow as pa
    from lucene_ray.pipelines.dedup import dedup_exact

    texts = ["unique text %d" % i for i in range(50)] + ["dup body"] * 5
    t = pa.table({"doc_id": pa.array(range(55), type=pa.int64()),
                  "text": pa.array(texts)})
    d = tmp_path / "documents.parquet"
    pq.write_table(t, str(d))
    out = dedup_exact(str(tmp_path)).to_pandas()
    assert len(out) == 51
    dup = out[out.n_dups == 5]
    assert len(dup) == 1 and int(dup.rep_doc_id.iloc[0]) == 50


def test_minhash_lsh_finds_near_dups(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import pyarrow as pa
    from lucene_ray.pipelines.dedup import dedup_minhash

    base = " ".join(f"tok{i}" for i in range(60))
    near = " ".join(f"tok{i}" for i in range(58)) + " other words"
    texts = [f"random doc {i} about {i*7} things entirely different {i}" for i in range(40)]
    texts += [base, near]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts)})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = dedup_minhash(str(tmp_path), threshold=0.5)
    pairs = set(zip(out.doc_id, out.cluster_rep))
    assert (41, 40) in pairs


def test_knn_lsh_recall(ray_session):
    from lucene_ray.pipelines.knn import knn_cosine, knn_lsh

    exact = knn_cosine(SF, k=10)
    approx = knn_lsh(SF, k=10)
    recall = []
    for q in exact.query_vec_id.unique():
        e = set(exact[exact.query_vec_id == q].vec_id)
        a = set(approx[approx.query_vec_id == q].vec_id)
        recall.append(len(e & a) / len(e))
    assert np.mean(recall) > 0.3      # LSH probe-1 on random data: modest but > random


def test_entry_smoke(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    out = e.entry()
    assert len(out) > 0
    assert set(out.columns) == {"query_id", "rank", "conv_id", "turn_idx", "score"}
    # every query_id's ranks are 1..n
    for qid, g in out.groupby("query_id"):
        assert list(g["rank"]) == list(range(1, len(g) + 1))


def test_queries_oracle_contract():
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 20


def test_hopping_counts_membership(ray_session):
    """Every event lands in exactly window/hop hopping windows; totals agree
    with tumbling at hop == window."""
    from lucene_ray.pipelines.windows import hopping_counts, tumbling_counts

    hop = hopping_counts(SF).to_pandas()
    tum = tumbling_counts(SF).to_pandas()
    # 60-min windows hopping by 15 -> each event counted 4x
    assert hop.n_events.sum() == 4 * tum.n_events.sum()


def test_windowed_topk_users_oracle(ray_session):
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.windows import windowed_topk_users

    out = windowed_topk_users(SF).to_pandas().sort_values(
        ["window_start", "rank"]).reset_index(drop=True)
    ev = pq.read_table(f"{SF}/events.parquet", columns=["ts", "user_id"]).to_pandas()
    ts = ev["ts"].astype("datetime64[us]").astype("int64")
    ev["ws"] = ts // 86400000000 * 86400000000
    cnt = ev.groupby(["ws", "user_id"]).size().rename("n").reset_index()
    for ws, g in cnt.groupby("ws"):
        g = g.sort_values(["n", "user_id"], ascending=[False, True]).head(3)
        got = out[out.window_start == ws]
        assert list(got.user_id) == list(g.user_id), ws
        assert list(got.n_events) == list(g.n)


def test_media_resize_and_frames(ray_session):
    """Resize + frame-sample actor-pool stages: deterministic stubs, real
    plumbing; counting semantics match the byte-length oracle."""
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.multimodal import (
        FRAME_BYTES,
        FRAME_STRIDE,
        media_frames,
        media_resize,
    )

    fr = media_frames(SF).to_pandas()
    texts = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]) \
        .to_pandas().set_index("doc_id")["text"]
    for _, row in fr.sample(20, random_state=0).iterrows():
        nbytes = len(texts[row.doc_id].encode())
        nf = -(-nbytes // FRAME_BYTES) if nbytes else 0
        assert row.n_frames == nf
        assert row.n_sampled == len(range(0, nf, FRAME_STRIDE))
    rs = media_resize(SF).to_pandas()
    assert set(rs.columns) == {"doc_id", "width", "height", "resized_md5", "mean_px"}
    assert (rs.width == 8).all() and (rs.height == 8).all()
    # deterministic across runs
    rs2 = media_resize(SF).to_pandas()
    pd.testing.assert_frame_equal(rs.sort_values("doc_id").reset_index(drop=True),
                                  rs2.sort_values("doc_id").reset_index(drop=True))


def test_redact_rules_fire_and_match_counts(ray_session, tmp_path):
    """Redaction rewrites emails/URLs/digit-runs and counts matches on the
    ORIGINAL text (rules apply in order on progressively cleaned text)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.textstats import redact

    docs = [
        "mail bob@corp.com or see https://x.io/p id 123456",
        "no pii here",
        "a1234567b and c@d.net",
    ]
    pq.write_table(pa.table({"doc_id": [0, 1, 2], "text": docs}),
                   str(tmp_path / "documents.parquet"))
    out = redact(str(tmp_path)).to_pandas().sort_values("doc_id")
    assert out["clean_text"].tolist() == [
        "mail [EMAIL] or see [URL] id [NUM]",
        "no pii here",
        "a[NUM]b and [EMAIL]",
    ]
    assert out["n_redactions"].tolist() == [3, 0, 2]


def test_pack_sequences_greedy_invariants(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.textstats import pack_sequences

    texts = ["w " * n for n in (100, 100, 100, 300, 50, 50, 50, 50, 10)]
    pq.write_table(pa.table({"doc_id": list(range(len(texts))),
                             "text": [t.strip() for t in texts]}),
                   str(tmp_path / "documents.parquet"))
    out = pack_sequences(str(tmp_path), max_tokens=256, override_num_blocks=1).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # greedy next-fit at 256: [100,100]=200, +100 overflows -> new pack;
    # [100], +300 overflows -> [300] alone; [50,50,50,50,10]=210
    assert out["pack_seq"].tolist() == [
        "p0-0", "p0-0", "p0-1", "p0-2", "p0-3", "p0-3", "p0-3", "p0-3",
        "p0-3"]
    assert out["pack_pos"].tolist() == [0, 1, 0, 0, 0, 1, 2, 3, 4]
    assert out["n_tokens"].tolist() == [100, 100, 100, 300, 50, 50, 50, 50, 10]
    # budget invariant: every pack except oversize singletons fits
    g = out.groupby("pack_seq")["n_tokens"].sum()
    for pack, tot in g.items():
        assert tot <= 256 or (out["pack_seq"] == pack).sum() == 1


def test_dataset_split_deterministic_and_proportional(ray_session):
    from lucene_ray.pipelines.textstats import dataset_split

    a = dataset_split("/root/testdata/sf0.001").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = dataset_split("/root/testdata/sf0.001").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)                       # stable across runs
    frac = a["split"].value_counts(normalize=True)
    assert 0.7 < frac.get("train", 0) < 0.9  # ~80/10/10 at n=500
    assert 0.04 < frac.get("val", 0) < 0.17
    assert 0.04 < frac.get("test", 0) < 0.17


def test_contamination_planted_overlap(ray_session, tmp_path):
    """A doc sharing an 8-gram with a benchmark doc is flagged with the
    right occurrence count; disjoint docs score 0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.dedup import contamination

    bench = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    overlap = "xx alpha beta gamma delta epsilon zeta eta theta yy"
    double = bench + " " + bench          # repeats benchmark grams
    clean = "one two three four five six seven eight nine ten"
    short = "tiny doc"
    pq.write_table(pa.table({
        "doc_id": [0, 1, 2, 3, 4],
        "text": [bench, overlap, double, clean, short],
    }), str(tmp_path / "documents.parquet"))
    out = contamination(str(tmp_path), n=8, bench_docs=1).to_pandas() \
        .sort_values("doc_id")
    got = dict(zip(out["doc_id"], out["n_overlap"]))
    assert got[0] == 3                    # bench overlaps itself: 10-8+1
    assert got[1] == 1                    # one shared 8-gram window
    assert got[2] > 3                     # repeated benchmark content
    assert got[3] == 0 and got[4] == 0


def test_lm_doc_scores_shapes(ray_session):
    """Corpus-bigram LM scoring: exact agreement with a hand-computed
    model on a tiny corpus + degenerate docs (the sf-level value check is
    the DuckDB oracle)."""
    import math

    import pyarrow as pa
    import ray

    from lucene_ray.pipelines import textstats

    rows = [
        {"doc_id": 0, "text": "a b a b"},
        {"doc_id": 1, "text": "a b"},
        {"doc_id": 2, "text": "solo"},
        {"doc_id": 3, "text": ""},
    ]
    import unittest.mock as mock

    ds = ray.data.from_items(rows)
    with mock.patch.object(textstats, "_read_documents",
                           lambda sf_dir: ds):
        t = pa.concat_tables(
            ray.get(textstats.lm_doc_scores("unused").to_arrow_refs()))
    got = {r["doc_id"]: (r["n_bigrams"], r["lm_score"])
           for r in t.to_pylist()}
    # corpus bigrams: ab x3, ba x1 -> P(b|a)=3/3=1? prefixes: a as start
    # of bigram occurs 3 times (ab,ab,ab) ... wait ba once: prefix b = 1
    # doc0 pairs: ab, ba, ab -> ln(3/3), ln(1/1), ln(3/3) = 0
    assert got[0] == (3, 0.0)
    assert got[1] == (1, 0.0)
    assert got[2] == (0, 0.0)
    assert got[3] == (0, 0.0)
    # a skewed corpus produces negative scores for the rare continuation
    rows2 = [{"doc_id": i, "text": "x y"} for i in range(9)] + \
        [{"doc_id": 9, "text": "x z"}]
    ds2 = ray.data.from_items(rows2)
    with mock.patch.object(textstats, "_read_documents",
                           lambda sf_dir: ds2):
        t2 = pa.concat_tables(
            ray.get(textstats.lm_doc_scores("unused").to_arrow_refs()))
    got2 = {r["doc_id"]: r["lm_score"] for r in t2.to_pylist()}
    assert got2[0] == round(math.log(9 / 10), 6)
    assert got2[9] == round(math.log(1 / 10), 6)


def test_sample_mixture_rates(ray_session):
    """Domain-mixing sampler: per-domain keep rates approximate the
    configured weights; unlisted domains drop; deterministic replay."""
    import pandas as pd

    from lucene_ray.pipelines.textstats import sample_mixture

    sf = "/root/testdata/sf0.01"
    got = sample_mixture(sf).to_pandas()
    again = sample_mixture(sf).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True),
        again.sort_values("doc_id").reset_index(drop=True))
    import pyarrow.parquet as pq

    tot = pq.read_table(f"{sf}/documents.parquet", columns=["lang"]) \
        .column("lang").to_pandas().value_counts()
    kept = got["lang"].value_counts()
    assert kept.get("en", 0) == tot.get("en", 0)           # rate 1.0
    for lang, rate in (("de", 0.5), ("fr", 0.25)):
        if tot.get(lang, 0) >= 40:
            frac = kept.get(lang, 0) / tot[lang]
            assert abs(frac - rate) < 0.15, (lang, frac)
    assert set(got["lang"]) <= {"en", "de", "fr"}


def test_cap_per_source(ray_session):
    """Per-source caps: every source contributes at most `cap` docs, kept
    docs are each source's top by (n_chars desc, doc_id asc)."""
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.textstats import cap_per_source

    sf = "/root/testdata/sf0.01"
    got = cap_per_source(sf, cap=10).to_pandas()
    counts = got.groupby("source").size()
    assert (counts <= 10).all() and (counts == 10).any()
    t = pq.read_table(f"{sf}/documents.parquet",
                      columns=["doc_id", "source", "n_chars"]).to_pandas()
    src = t[t.source == got.source.iloc[0]].sort_values(
        ["n_chars", "doc_id"], ascending=[False, True]).head(10)
    assert set(got[got.source == got.source.iloc[0]].doc_id) == \
        set(src.doc_id)
