"""Composed curation pipeline (signals → quality filters → exact dedup →
split) — invariants + planted-duplicate behavior + DuckDB twin on sf0.001."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pqw

from lucene_ray.pipelines.curation import (
    MAX_DUP_WORD_FRAC,
    MAX_TOP_WORD_FRAC,
    MIN_TOKENS,
    curate_corpus,
    curation_oracle_sql,
)

SF = "/root/testdata/sf0.001"


def test_matches_duckdb_twin(ray_session):
    got = curate_corpus(SF)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = con.sql(curation_oracle_sql()).df()
    assert len(got) == len(want)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["split"].tolist() == want["split"].tolist()
    assert got["n_tokens"].tolist() == want["n_tokens"].tolist()
    assert got["dup_word_frac"].tolist() == want["dup_word_frac"].tolist()


def test_planted_dups_and_filters(ray_session, tmp_path):
    texts = [
        "the quick brown fox jumps over the lazy dog today",   # keeps
        "the quick brown fox jumps over the lazy dog today",   # dup of 0
        "spam spam spam spam spam spam",                        # repetition
        "tiny",                                                 # too short
        "a completely different sentence with many new words",  # keeps
        "the quick brown fox jumps over the lazy dog today",   # dup of 0
    ]
    t = pa.table({"doc_id": pa.array(range(6), pa.int64()),
                  "text": texts, "lang": ["en"] * 6,
                  "source": ["s"] * 6,
                  "n_chars": pa.array([len(x) for x in texts], pa.int64())})
    pqw.write_table(t, str(tmp_path / "documents.parquet"))
    out = curate_corpus(str(tmp_path))
    assert out["doc_id"].tolist() == [0, 4]      # dups + junk removed
    assert (out["n_tokens"] >= MIN_TOKENS).all()
    assert (out["dup_word_frac"] <= MAX_DUP_WORD_FRAC).all()
    assert set(out["split"]) <= {"train", "val", "test"}


def test_split_is_pure_function_of_doc_id(ray_session):
    a = curate_corpus(SF)
    b = curate_corpus(SF)
    assert a.equals(b)                           # deterministic end-to-end
    # survivors are a subset of all docs with stable split assignment
    from lucene_ray.pipelines.textstats import dataset_split

    full = dataset_split(SF).to_pandas().set_index("doc_id")["split"]
    for did, sp in zip(a["doc_id"], a["split"]):
        assert full.loc[did] == sp


def test_dsir_select_hand_model(ray_session):
    """dsir_select vs a from-scratch numpy recount of the DSIR importance
    weights (target counts, corpus counts, add-one smoothing, integer
    quantization, top ordering)."""
    import numpy as np
    import pyarrow.parquet as pq

    from lucene_ray.pipelines.textstats import (
        DSIR_TARGET_DOCS,
        dsir_select,
        simple_tokens,
    )

    sf = "/root/testdata/sf0.001"
    got = dsir_select(sf, top=50)

    t = pq.read_table(f"{sf}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    t = t.sort_values("doc_id").reset_index(drop=True)
    docs = {int(r.doc_id): simple_tokens(r.text or "")
            for r in t.itertuples()}
    tgt_counts = {}
    for d, toks in docs.items():
        if d < DSIR_TARGET_DOCS:
            for tok in toks:
                tgt_counts[tok] = tgt_counts.get(tok, 0) + 1
    t_total = sum(tgt_counts.values())
    v = len(tgt_counts)
    corpus_counts = {w: 0 for w in tgt_counts}
    corpus_total = 0
    for toks in docs.values():
        corpus_total += len(toks)
        for tok in toks:
            if tok in corpus_counts:
                corpus_counts[tok] += 1
    r = {w: int(np.floor(1e6 * (np.log((c + 1.0) / (t_total + v))
                                - np.log((corpus_counts[w] + 1.0)
                                         / (corpus_total + v))) + 0.5))
         for w, c in tgt_counts.items()}
    scores = {}
    for d, toks in docs.items():
        s, hits = 0, 0
        for tok in toks:
            if tok in r:
                s += r[tok]
                hits += 1
        if hits:
            scores[d] = s
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert list(zip(got["doc_id"], got["dsir_score"])) == want
