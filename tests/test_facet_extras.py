"""Facet extras: float taxonomy associations
(`facet/taxonomy/TaxonomyFacetFloatAssociations.java`), string value facet
counts (`facet/StringValueFacetCounts.java`) and range-on-range facets
(`facet/rangeonrange/RangeOnRangeFacetCounts.java`) — doc-side pipelines
cross-checked against DuckDB on the sf0.001 table."""

import duckdb

from lucene_ray.pipelines.textstats import (
    facet_taxonomy_float_assoc,
    range_on_range_facets,
    string_value_facets,
)

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return con


def test_float_assoc(ray_session):
    got = facet_taxonomy_float_assoc(SF)
    con = _con()
    want = con.sql("""
        SELECT lang, coalesce(source, '') AS source,
               sum(n_chars * 0.5)::DOUBLE AS sum_assoc,
               max(n_chars * 0.5)::DOUBLE AS max_assoc
        FROM documents
        GROUP BY GROUPING SETS ((lang), (lang, source))
        ORDER BY lang, source""").df()
    assert got[["lang", "source"]].values.tolist() == \
        want[["lang", "source"]].values.tolist()
    # exactly-representable halves: distributed float sum is exact
    assert got["sum_assoc"].tolist() == want["sum_assoc"].tolist()
    assert got["max_assoc"].tolist() == want["max_assoc"].tolist()
    # hierarchical rollup: the parent ('' source) row covers its children
    parents = got[got["source"] == ""]
    for _, p in parents.iterrows():
        kids = got[(got["lang"] == p["lang"]) & (got["source"] != "")]
        assert p["sum_assoc"] == kids["sum_assoc"].sum()
        assert p["max_assoc"] == kids["max_assoc"].max()


def test_string_value_facets(ray_session):
    got = string_value_facets(SF)
    con = _con()
    want = con.sql("""
        WITH hits AS (SELECT source FROM documents WHERE text LIKE '%merge%')
        SELECT source AS value, count(*)::BIGINT AS n_docs
        FROM hits GROUP BY source ORDER BY value""").df()
    total = got[got["value"] == ""]["n_docs"].iloc[0]
    rest = got[got["value"] != ""].reset_index(drop=True)
    assert rest["value"].tolist() == want["value"].tolist()
    assert rest["n_docs"].tolist() == want["n_docs"].tolist()
    assert total == want["n_docs"].sum()


def test_range_on_range(ray_session):
    got = range_on_range_facets(SF)
    assert len(got) == 9
    con = _con()
    want = con.sql("""
        WITH docs AS (SELECT n_chars AS lo, n_chars + (doc_id % 50) AS hi
                      FROM documents)
        SELECT count(*) FILTER (lo <= 400 AND hi >= 0)::BIGINT AS isect,
               count(*) FILTER (lo >= 0 AND hi <= 400)::BIGINT AS within,
               count(*) FILTER (lo <= 0 AND hi >= 400)::BIGINT AS contains
        FROM docs""").df()
    small = got[got["label"] == "small"].set_index("relation")["n_docs"]
    assert small["intersects"] == want["isect"].iloc[0]
    assert small["within"] == want["within"].iloc[0]
    assert small["contains"] == want["contains"].iloc[0]
    # a doc range never within AND containing unless equal to the query range
    assert (got.groupby("label")["n_docs"].max()
            == got[got["relation"] == "intersects"]
            .set_index("label")["n_docs"]).all()


def test_repetition_stats_planted(ray_session, tmp_path):
    """Gopher repetition signals on a hand corpus with known fractions."""
    import pyarrow as pa
    import pyarrow.parquet as pqw

    from lucene_ray.pipelines.textstats import repetition_stats

    texts = [
        "spam spam spam eggs",          # dup=1-2/4, topw=3/4, topbg=2/3
        "a b c d",                      # all distinct
        "",                             # degenerate
        "one",                          # single token
    ]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": texts,
                  "lang": ["en"] * 4, "source": ["s"] * 4,
                  "n_chars": pa.array([len(x) for x in texts], pa.int64())})
    pqw.write_table(t, str(tmp_path / "documents.parquet"))
    got = (repetition_stats(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["dup_word_frac"].tolist() == [round(1 - 2 / 4, 6), 0.0, 0.0, 0.0]
    assert got["top_word_frac"].tolist() == [0.75, 0.25, 0.0, 1.0]
    assert got["top_bigram_frac"].tolist() == [round(2 / 3, 6),
                                               round(1 / 3, 6), 0.0, 0.0]


def test_icu_normalizer_forms():
    from lucene_ray.analysis.filters import FILTERS

    nf = FILTERS["icu_normalizer"]           # nfkc_cf default
    assert nf("ＡＢＣ") == "abc"
    assert nf("ﬁx") == "fix"
    assert nf("STRASSE") == "strasse"
    assert nf("ｶﾞ") == "ガ"                   # halfwidth + dakuten compose
    import unicodedata
    assert FILTERS["icu_normalizer:nfc"]("é") == \
        unicodedata.normalize("NFC", "é")
    assert FILTERS["icu_normalizer:nfkd"]("Ⅸ") == "IX"


def test_facet_query_and_multi_facet_query(ray_session, tmp_path):
    """FacetQuery == keyword TermQuery on the drill-down term;
    MultiFacetQuery == constant-score union over paths (recount parity)."""
    import ray.data as rd

    from lucene_ray.index.build import build_index
    from lucene_ray.search.query import facet_query, multi_facet_query
    from lucene_ray.search.searcher import IndexSearcher
    from lucene_ray.sources.transcripts import synth_transcripts

    t = synth_transcripts(500, seed=13)
    idx = str(tmp_path / "fq_idx")
    build_index(rd.from_arrow(t), idx, target_docs_per_partition=200,
                keyword_cols=("role",), input_desc="fq500")
    s = IndexSearcher(idx)
    roles = t.column("role").to_pylist()
    want_user = sum(1 for r in roles if r == "user")
    assert s.count(facet_query("role", "user")) == want_user
    two = {"user", "assistant"}
    want_two = sum(1 for r in roles if r in two)
    assert s.count(multi_facet_query("role", "user", "assistant")) == want_two
    # list-path form and absent path
    assert s.count(multi_facet_query("role", ["user"])) == want_user
    assert s.count(facet_query("role", "nosuchrole")) == 0
