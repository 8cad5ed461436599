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
