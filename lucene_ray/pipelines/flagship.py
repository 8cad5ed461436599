"""Flagship pipeline: transcripts → inverted index → BM25 top-k.

Glues the whole engine together for the driver entry points: synthesize /
adapt the transcript table, build (or reuse) the index under /tmp, run the
reference query set through the actor-pool searcher, and return the results
as a flat table keyed by (query_id, rank, conv_id, turn_idx).
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd

from ..index.build import build_index
from ..search.query import FuzzyQuery, PhraseQuery, PrefixQuery, WildcardQuery, bool_query
from ..search.searcher import IndexSearcher
from ..sources.transcripts import transcripts_from_documents

# the reference query set (FIXTURES.md §2): hot / mid / rare / absent terms
QUERY_SET = [
    ("q-term-hot", bool_query(should=["scan"]), 10),
    ("q-term-mid", bool_query(should=["customer"]), 10),
    ("q-term-rare", bool_query(should=["vector"]), 10),
    ("q-term-absent", bool_query(should=["zzzabsent"]), 10),
    ("q-should", bool_query(should=["merge", "join", "sort"]), 10),
    ("q-must", bool_query(must=["merge", "join"]), 10),
    ("q-mixed", bool_query(must=["scan"], should=["window", "batch"]), 10),
    ("q-filter", bool_query(should=["merge"], filter_=["join"]), 10),
    ("q-mustnot", bool_query(should=["merge"], must_not=["join"]), 10),
    ("q-msm", bool_query(should=["merge", "join", "sort"], minimum_should_match=2), 10),
    ("q-phrase", PhraseQuery(("merge", "join")), 10),
    ("q-prefix", PrefixQuery("sca"), 10),
    ("q-wildcard", WildcardQuery("s*t"), 10),
    ("q-fuzzy", FuzzyQuery("querz", max_edits=1), 10),
]


def _extra_queries():
    """Round-2 query types appended to the reference set (lazy: the query
    classes import cleanly even when only the classic set is exercised)."""
    from ..search.query import (
        FILTER,
        MUST,
        BooleanClause,
        BooleanQuery,
        IntervalQuery,
        MultiPhraseQuery,
        RangeQuery,
        TermQuery,
    )
    from ..sources.transcripts import BASE_TS_US

    return [
        ("q-range-filter", BooleanQuery((
            BooleanClause(TermQuery("merge"), MUST),
            BooleanClause(RangeQuery("ts", None, BASE_TS_US + 400_000_000), FILTER))), 10),
        ("q-multiphrase", MultiPhraseQuery((("merge", "sort"), ("join",))), 10),
        ("q-interval", IntervalQuery(("merge", "join"), 6, ordered=False), 10),
        ("q-sloppy-rpt", PhraseQuery(("merge", "join", "merge"), slop=8), 10),
    ]


def index_dir_for(sf_dir: str) -> str:
    h = hashlib.sha256(sf_dir.encode()).hexdigest()[:10]
    return os.path.join("/tmp", "lucene_ray_indexes", h)


def build_transcript_index(sf_dir: str, index_dir: str | None = None,
                           target_docs_per_partition: int = 100_000) -> str:
    """Build (or reuse via checkpoint) the index for sf_dir's documents
    mapped into transcript shape; returns the index directory."""
    index_dir = index_dir or index_dir_for(sf_dir)
    ds = transcripts_from_documents(sf_dir)
    build_index(ds, index_dir, target_docs_per_partition=target_docs_per_partition,
                keyword_cols=("role", "tool"), docvalue_cols=("ts",),
                input_desc=f"documents@{sf_dir}+kw+dv")
    return index_dir


def index_phrase_count(sf_dir: str) -> pd.DataFrame:
    """Exact-phrase doc count through the index (positions + intersection)."""
    searcher = IndexSearcher(build_transcript_index(sf_dir))
    n = searcher.count(PhraseQuery(("merge", "join")))
    return pd.DataFrame({"n_matching": pd.Series([n], dtype="int64")})


def index_prefix_count(sf_dir: str) -> pd.DataFrame:
    """Prefix-expansion doc count through the index term dictionary."""
    searcher = IndexSearcher(build_transcript_index(sf_dir))
    n = searcher.count(PrefixQuery("s"))
    return pd.DataFrame({"n_matching": pd.Series([n], dtype="int64")})


def index_span_near_count(sf_dir: str) -> pd.DataFrame:
    """Nested span algebra end-to-end: span-near(span-or(merge, sort),
    'the') with slop 3 in order — doc count through the index
    (`queries/spans/SpanNearQuery.java` + `SpanOrQuery.java` semantics)."""
    from ..search.spans import SpanNearQuery, SpanOrQuery

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    q = SpanNearQuery((SpanOrQuery(("merge", "sort")), "the"),
                      slop=3, in_order=True)
    n = searcher.count(q)
    return pd.DataFrame({"n_matching": pd.Series([n], dtype="int64")})


def index_flexible_count(sf_dir: str) -> pd.DataFrame:
    """Flexible (Standard) parser dialect end-to-end: a query using AND,
    prefix wildcard and the '@n' minimum-should-match group syntax
    (`flexible/standard/parser/StandardSyntaxParser.jj` surface) parsed by
    parse_flexible and counted through the index."""
    from ..search.flexible import parse_flexible

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    q = parse_flexible('(merge AND jo*) OR (scan sort filter)@2')
    n = searcher.count(q)
    return pd.DataFrame({"n_matching": pd.Series([n], dtype="int64")})


def index_highlight_topk(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """BM25 top-k for 'merge join' with sentence-passage snippets
    (UnifiedHighlighter model: sentence BreakIterator + passage scoring).
    Rows-only driver entry — passage scoring is not SQL-expressible; the
    snippet/selection math has pytest oracles (tests/test_parser_highlight)."""
    import pyarrow.parquet as pq

    from ..search.highlight import highlight_sentences
    from ..sources.transcripts import TURNS_PER_CONV

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    td = searcher.search(bool_query(must=["merge", "join"]), k=k)
    # invert the deterministic documents→transcripts key mapping
    doc_ids = [int(h.conv_id[5:]) * TURNS_PER_CONV + int(h.turn_idx)
               for h in td.hits]
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"],
                      filters=[("doc_id", "in", list(set(doc_ids)))])
    texts = dict(zip(t.column("doc_id").to_pylist(),
                     t.column("text").to_pylist()))
    rows = []
    for rank, (h, did) in enumerate(zip(td.hits, doc_ids), start=1):
        snip = highlight_sentences(texts.get(did, ""),
                                   ["merge", "join"], num_passages=1)
        rows.append((rank, h.conv_id, int(h.turn_idx), snip or ""))
    return pd.DataFrame(rows, columns=["rank", "conv_id", "turn_idx",
                                       "snippet"]).astype(
        {"rank": "int64", "turn_idx": "int64"})


def index_complex_phrase_count(sf_dir: str) -> pd.DataFrame:
    """ComplexPhrase doc count: 'merge' followed by a 'jo'-prefixed token
    (wildcard-in-phrase, per-shard slot expansion)."""
    from ..search.query import ComplexPhraseQuery

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    n = searcher.count(ComplexPhraseQuery((("merge",), (PrefixQuery("jo"),))))
    return pd.DataFrame({"n_matching": pd.Series([n], dtype="int64")})


def index_phrase_wildcard_count(sf_dir: str) -> pd.DataFrame:
    """PhraseWildcardQuery doc count: 'the' followed by an 's'-prefixed
    token, resolved through the sandbox expansion-budget path (single term
    collected first, prefix expanded per shard smallest-first) rather than
    the ComplexPhrase constant-score path — the count also verifies the
    scored MultiPhrase resolution matches per-position SQL."""
    from ..search.query import PhraseWildcardQuery

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    n = searcher.count(PhraseWildcardQuery(("the", PrefixQuery("s")),
                                           max_multi_term_expansions=1024))
    return pd.DataFrame({"n_matching": pd.Series([n], dtype="int64")})


def index_keyword_count(sf_dir: str) -> pd.DataFrame:
    """Keyword FILTER + scoring term conjunction through the index."""
    from ..index.shard import keyword_term

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    n = searcher.count(bool_query(must=["merge"],
                                  filter_=[keyword_term("role", "user")]))
    return pd.DataFrame({"n_matching": pd.Series([n], dtype="int64")})


def index_pk_bloom_count(sf_dir: str) -> pd.DataFrame:
    """Primary-key lookups through per-shard bloom-filter term sidecars
    (`codecs/bloom/BloomFilteringPostingsFormat.java` +
    `DefaultBloomFilterFactory.java`): the index stores one FuzzySet per
    shard for the unique `pk` keyword field, and seekExact consults it
    before the terms dictionary — at 100-TB scale the shards NOT holding a
    key answer NO from the in-memory filter without an mmap dictionary
    probe.  Counts: one present key, one absent key, and a TermInSetQuery
    mixing both."""
    import pyarrow as pa
    import ray.data as rd

    from ..index.build import build_index as _build
    from ..index.shard import keyword_term
    from ..search.query import FILTER, BooleanClause, BooleanQuery
    from ..search.query import TermInSetQuery, TermQuery
    from ..sources.transcripts import doc_batch_to_transcripts

    def add_pk(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = doc_batch_to_transcripts(batch)
        d = batch.column("doc_id")
        pk = pc.binary_join_element_wise(
            "doc-", pc.utf8_lpad(pc.cast(d, pa.string()), 9, "0"), "")
        t = t.append_column("pk", pk)
        # IDVersion payload: a deterministic long version per PK
        ver = (d.to_numpy().astype("int64") * 13) % 5000
        return t.append_column("pkver", pa.array(ver, type=pa.int64()))

    index_dir = index_dir_for(sf_dir) + "-bloom"
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    _build(ds.map_batches(add_pk, batch_format="pyarrow"), index_dir,
           target_docs_per_partition=100_000, keyword_cols=("pk",),
           docvalue_cols=("pkver",), bloom_fields=("pk",),
           id_version_fields=("pk",),
           input_desc=f"documents@{sf_dir}+pkver")
    searcher = IndexSearcher(index_dir)
    # the entry is only meaningful if every shard actually carries the
    # sidecar the seekExact fast path reads
    for pid in searcher._pids:
        assert "pk" in (searcher.reader(pid).manifest.get("blooms") or {}), \
            f"shard {pid} missing pk bloom sidecar"

    def count_term(value: str) -> int:
        return searcher.count(BooleanQuery((BooleanClause(
            TermQuery(keyword_term("pk", value)), FILTER),)))

    n_present = count_term("doc-000000117")
    n_absent = count_term("doc-999999999")
    n_in_set = searcher.count(BooleanQuery((BooleanClause(
        TermInSetQuery(tuple(keyword_term("pk", v) for v in
                             ("doc-000000001", "doc-000000005",
                              "doc-000000042", "doc-999999999"))),
        FILTER),)))
    return pd.DataFrame({"n_present": pd.Series([n_present], dtype="int64"),
                         "n_absent": pd.Series([n_absent], dtype="int64"),
                         "n_in_set": pd.Series([n_in_set], dtype="int64")})


PK_LOOKUP_DOCS = (7, 117, 4242, 9999999)   # last one absent at small sf
PK_VERSION_FLOOR = 2500


def index_pk_version_lookup(sf_dir: str) -> pd.DataFrame:
    """IDVersion PK lookups (`sandbox/codecs/idversion/` — seekExact with
    a version floor): per probed ID, the indexed version and whether it
    clears the floor (the optimistic-concurrency gate).  Reuses the
    bloom-sidecar index (version = (doc_id * 13) %% 5000 doc-values)."""
    from ..search.pklookup import VersionPKLookup

    index_pk_bloom_count(sf_dir)                 # ensure the index exists
    searcher = IndexSearcher(index_dir_for(sf_dir) + "-bloom")
    lk = VersionPKLookup(searcher, "pk", "pkver")
    rows = []
    for d in PK_LOOKUP_DOCS:
        pk = f"doc-{d:09d}"
        hit = lk.lookup(pk)
        gated = lk.lookup(pk, min_version=PK_VERSION_FLOOR)
        rows.append((pk, -1 if hit is None else hit[1],
                     0 if gated is None else 1))
    return pd.DataFrame(rows, columns=["pk", "version", "above_floor"]) \
        .astype({"version": "int64", "above_floor": "int64"})


def index_bm25_topk(sf_dir: str, use_actors: bool = False) -> pd.DataFrame:
    """Run the reference query set; (query_id, rank, conv_id, turn_idx, score)."""
    index_dir = build_transcript_index(sf_dir)
    if use_actors:
        from ..search.actors import QueryService

        svc = QueryService(index_dir, num_actors=4)
        search = svc.search
    else:
        searcher = IndexSearcher(index_dir)
        search = searcher.search
    rows = []
    for qid, q, k in QUERY_SET + _extra_queries():
        td = search(q, k=k)
        for rank, h in enumerate(td.hits, 1):
            rows.append((qid, rank, h.conv_id, h.turn_idx, float(h.score)))
    if use_actors:
        svc.shutdown()
    return pd.DataFrame(rows, columns=["query_id", "rank", "conv_id", "turn_idx", "score"])


def index_delete_query_count(sf_dir: str) -> pd.DataFrame:
    """IndexWriter.deleteDocuments(Query) through the driver gate: build a
    private index, delete every doc matching (merge AND ts <= cutoff), then
    count 'merge' and 'join' over the survivors — SQL mirror applies the
    same predicate."""
    import shutil

    from ..index.deletes import delete_by_query
    from ..search.query import BooleanClause, BooleanQuery, RangeQuery, TermQuery
    from ..search.query import FILTER as F, MUST as M
    from ..sources.transcripts import BASE_TS_US

    index_dir = index_dir_for(sf_dir) + "-delq"
    shutil.rmtree(index_dir, ignore_errors=True)
    ds = transcripts_from_documents(sf_dir)
    build_index(ds, index_dir, target_docs_per_partition=100_000,
                docvalue_cols=("ts",), input_desc=f"documents@{sf_dir}+delq")
    cutoff = BASE_TS_US + 250 * 1_000_000
    delete_by_query(index_dir, BooleanQuery((
        BooleanClause(TermQuery("merge"), M),
        BooleanClause(RangeQuery("ts", None, cutoff), F))))
    searcher = IndexSearcher(index_dir)
    n_merge = searcher.count(TermQuery("merge"))
    n_join = searcher.count(TermQuery("join"))
    return pd.DataFrame({"n_merge": pd.Series([n_merge], dtype="int64"),
                         "n_join": pd.Series([n_join], dtype="int64")})


def index_delete_count(sf_dir: str) -> pd.DataFrame:
    """Live-docs deletions through the driver gate: build a private index,
    delete every doc with doc_id %% 7 == 0 (expressed as transcript keys),
    and count a term query over the survivors — SQL mirror filters the same
    modulo predicate."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..index.deletes import delete_by_keys
    from ..sources.transcripts import TURNS_PER_CONV

    index_dir = index_dir_for(sf_dir) + "-del"
    shutil.rmtree(index_dir, ignore_errors=True)
    ds = transcripts_from_documents(sf_dir)
    build_index(ds, index_dir, target_docs_per_partition=100_000,
                input_desc=f"documents@{sf_dir}+del")
    doc_ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"]) \
        .column("doc_id").to_numpy()
    victims = doc_ids[doc_ids % 7 == 0]
    keys = pa.table({
        "conv_id": pa.array([f"conv-{d // TURNS_PER_CONV:08d}" for d in victims]),
        "turn_idx": pa.array((victims % TURNS_PER_CONV).astype("int32")),
    })
    delete_by_keys(index_dir, keys)
    searcher = IndexSearcher(index_dir)
    n = searcher.count(bool_query(must=["merge"]))
    return pd.DataFrame({"n_matching": pd.Series([n], dtype="int64")})


DV_SENTINEL_TS = 9_000_000_000_000_000        # far above every real ts


def index_dv_update_count(sf_dir: str) -> pd.DataFrame:
    """updateNumericDocValue through the driver gate: build a private index,
    set ts to a sentinel for every doc with doc_id %% 5 == 0 (generational
    dv sidecars), and count 'merge' docs whose ts now equals the sentinel —
    SQL mirror filters the same modulo predicate."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..index.dvupdates import update_numeric_docvalue
    from ..search.query import BooleanClause, BooleanQuery, RangeQuery, TermQuery
    from ..search.query import FILTER as F, MUST as M
    from ..sources.transcripts import TURNS_PER_CONV

    index_dir = index_dir_for(sf_dir) + "-dvu"
    shutil.rmtree(index_dir, ignore_errors=True)
    ds = transcripts_from_documents(sf_dir)
    build_index(ds, index_dir, target_docs_per_partition=100_000,
                docvalue_cols=("ts",), input_desc=f"documents@{sf_dir}+dvu")
    doc_ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"]) \
        .column("doc_id").to_numpy()
    victims = doc_ids[doc_ids % 5 == 0]
    keys = pa.table({
        "conv_id": pa.array([f"conv-{d // TURNS_PER_CONV:08d}" for d in victims]),
        "turn_idx": pa.array((victims % TURNS_PER_CONV).astype("int32")),
    })
    update_numeric_docvalue(index_dir, keys, "ts", DV_SENTINEL_TS)
    searcher = IndexSearcher(index_dir)
    q = BooleanQuery((BooleanClause(TermQuery("merge"), M),
                      BooleanClause(RangeQuery("ts", DV_SENTINEL_TS,
                                               DV_SENTINEL_TS), F)))
    n = searcher.count(q)
    return pd.DataFrame({"n_matching": pd.Series([n], dtype="int64")})


# doc_id range for the ts range-query entries (ts = BASE_TS_US + doc_id*1e6)
RANGE_LO_DOC, RANGE_HI_DOC = 100, 300
SORT_K = 15


def index_range_count(sf_dir: str) -> pd.DataFrame:
    """Numeric/date range FILTER through the index doc-values: count of docs
    containing 'merge' with ts in [lo, hi] (PointRangeQuery-in-FILTER
    semantics; SQL mirror filters the same doc_id window)."""
    from ..search.query import BooleanClause, BooleanQuery, RangeQuery, TermQuery
    from ..search.query import FILTER as F, MUST as M
    from ..sources.transcripts import BASE_TS_US

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    lo = BASE_TS_US + RANGE_LO_DOC * 1_000_000
    hi = BASE_TS_US + RANGE_HI_DOC * 1_000_000
    q = BooleanQuery((BooleanClause(TermQuery("merge"), M),
                      BooleanClause(RangeQuery("ts", lo, hi), F)))
    n = searcher.count(q)
    # standalone range count too (pure doc-values scan, no term clause)
    n_range_only = searcher.count(RangeQuery("ts", lo, hi))
    return pd.DataFrame({"n_matching": pd.Series([n], dtype="int64"),
                         "n_in_range": pd.Series([n_range_only], dtype="int64")})


# geo query constants shared with the oracle SQL (__ray_entry__)
GEO_BOX = (-30.0, 45.0, -90.0, 60.0)                # min_lat,max_lat,min_lon,max_lon
GEO_DATELINE_BOX = (-90.0, 90.0, 150.0, -150.0)     # crosses the dateline
GEO_CIRCLE = (12.0, -47.0, 3_000_000.0)             # lat, lon, radius_m
POINT_SET_DOCS = (17, 99, 256)


def build_geo_index(sf_dir: str, index_dir: str | None = None) -> str:
    """Index variant carrying BKD point sidecars: a 2-D LatLonPoint field
    `loc` (lat/lon derived deterministically from doc_id, quantized with the
    GeoEncodingUtils scale model) and a 1-D point field `ts_pt` over ts."""
    from ..sources.transcripts import transcripts_with_geo

    index_dir = index_dir or index_dir_for(sf_dir) + "-geo"
    ds = transcripts_with_geo(sf_dir)
    build_index(ds, index_dir, target_docs_per_partition=100_000,
                point_cols={"loc": ("lat_enc", "lon_enc"), "ts_pt": ("ts",),
                            "span": ("span_lo", "span_hi"),
                            "xy": ("x_enc", "y_enc"),
                            "hf": ("hf_enc",), "big": ("bhi", "blo"),
                            "ip": ("iphi", "iplo"),
                            "iprange": ("ipr_hmin", "ipr_lmin",
                                        "ipr_hmax", "ipr_lmax")},
                docvalue_cols=("feat_pr", "min_match"),
                input_desc=f"documents@{sf_dir}+geo")
    return index_dir


COVERING_TERMS = ("merge", "join", "sort")


def index_covering_count(sf_dir: str) -> pd.DataFrame:
    """CoveringQuery (`sandbox/search/CoveringQuery.java`): docs where the
    number of matching term clauses reaches a PER-DOC minimum read from the
    min_match doc-values column (1 + doc_id %% 3), plus a constant-minimum
    variant (== minimumShouldMatch)."""
    from ..search.query import CoveringQuery, TermQuery

    from ..search.query import DocValuesNumbersQuery

    searcher = IndexSearcher(build_geo_index(sf_dir))
    subs = tuple(TermQuery(t) for t in COVERING_TERMS)
    n_dv = searcher.count(CoveringQuery(subs, "min_match"))
    n_const = searcher.count(CoveringQuery(subs, 2))
    # DocValuesNumbersQuery set membership over the same column
    n_in_set = searcher.count(DocValuesNumbersQuery("min_match", (1, 3)))
    return pd.DataFrame({"n_dv_min": pd.Series([n_dv], dtype="int64"),
                         "n_const_min": pd.Series([n_const], dtype="int64"),
                         "n_dv_in_set": pd.Series([n_in_set], dtype="int64")})


def index_point_range_count(sf_dir: str) -> pd.DataFrame:
    """1-D BKD point queries (`search/PointRangeQuery.java` /
    `PointInSetQuery.java` over `index/points.py` leaf blocks): range count
    over the ts point field and an exact-value set count."""
    from ..search.query import PointInSetQuery, PointMultiRangeQuery, PointRangeQuery
    from ..sources.transcripts import BASE_TS_US

    searcher = IndexSearcher(build_geo_index(sf_dir))

    def ts(d):
        return BASE_TS_US + d * 1_000_000

    n_range = searcher.count(PointRangeQuery("ts_pt", ts(RANGE_LO_DOC),
                                             ts(RANGE_HI_DOC)))
    vals = tuple(ts(d) for d in POINT_SET_DOCS)
    n_set = searcher.count(PointInSetQuery("ts_pt", vals))
    # union of disjoint ranges (sandbox MultiRangeQuery surface)
    n_multi = searcher.count(PointMultiRangeQuery("ts_pt", (
        ((ts(RANGE_LO_DOC),), (ts(RANGE_HI_DOC),)),
        ((ts(400),), (ts(450),)))))
    return pd.DataFrame({"n_in_range": pd.Series([n_range], dtype="int64"),
                         "n_in_set": pd.Series([n_set], dtype="int64"),
                         "n_multi": pd.Series([n_multi], dtype="int64")})


def index_geo_count(sf_dir: str) -> pd.DataFrame:
    """LatLonPoint queries through the 2-D BKD sidecar
    (`document/LatLonPoint.java` box/distance semantics): a plain box, a
    dateline-crossing box (two-range rewrite) and a haversine distance
    query (bbox prune + exact verify on decoded coords)."""
    from ..search.geo import LatLonDistanceQuery, lat_lon_box_query

    searcher = IndexSearcher(build_geo_index(sf_dir))
    n_box = searcher.count(lat_lon_box_query("loc", *GEO_BOX))
    n_dateline = searcher.count(lat_lon_box_query("loc", *GEO_DATELINE_BOX))
    n_radius = searcher.count(LatLonDistanceQuery("loc", *GEO_CIRCLE))
    return pd.DataFrame({"n_in_box": pd.Series([n_box], dtype="int64"),
                         "n_dateline": pd.Series([n_dateline], dtype="int64"),
                         "n_in_radius": pd.Series([n_radius], dtype="int64")})


# second circle for index_geo3d_count (polar-adjacent center exercises the
# high-latitude band where spherical-vs-ellipsoid divergence peaks)
GEO3D_CIRCLE2 = (68.0, 120.0, 1_500_000.0)


def index_geo3d_count(sf_dir: str) -> pd.DataFrame:
    """Geo3DPoint.newDistanceQuery with PlanetModel.SPHERE
    (`spatial3d/.../Geo3DPoint.java` + `geom/GeoStandardCircle.java`):
    membership evaluated in 3-D Cartesian space (unit vectors, spherical
    cap dot-product) — equal to the haversine metric on the same mean
    radius, which is the SQL twin."""
    from ..search.geo3d import Geo3DCircleQuery

    searcher = IndexSearcher(build_geo_index(sf_dir))
    n1 = searcher.count(Geo3DCircleQuery("loc", *GEO_CIRCLE))
    n2 = searcher.count(Geo3DCircleQuery("loc", *GEO3D_CIRCLE2))
    return pd.DataFrame({"n_circle": pd.Series([n1], dtype="int64"),
                         "n_polar": pd.Series([n2], dtype="int64")})


def index_geo3d_wgs84_count(sf_dir: str) -> pd.DataFrame:
    """Geo3DPoint.newDistanceQuery WGS84 surface-distance semantics: the
    same circles evaluated as ellipsoid geodesics (Andoyer-Lambert
    first-order; `spatial3d/.../PlanetModel.java` WGS84 +
    `GeoStandardCircle` on the ellipsoid, documented O(f^2)
    approximation)."""
    from ..search.geo3d import Geo3DCircleQuery

    searcher = IndexSearcher(build_geo_index(sf_dir))
    n1 = searcher.count(Geo3DCircleQuery("loc", *GEO_CIRCLE,
                                         planet="wgs84"))
    n2 = searcher.count(Geo3DCircleQuery("loc", *GEO3D_CIRCLE2,
                                         planet="wgs84"))
    return pd.DataFrame({"n_circle": pd.Series([n1], dtype="int64"),
                         "n_polar": pd.Series([n2], dtype="int64")})


# query box for index_shape_count (bounds off the doc rect grid so
# quantization can't flip a touch decision between engine and oracle)
SHAPE_QBOX = (-10.1, 25.1, -30.1, 40.1)


def build_shape_index(sf_dir: str, index_dir: str | None = None) -> str:
    """Index variant carrying a shape field: one rectangle per doc derived
    deterministically from doc_id (LatLonShape document model —
    `index/shapes.py` vertex sidecar + 4-dim bbox BKD)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ..sources.transcripts import doc_batch_to_transcripts

    def add_shape(batch: pa.Table) -> pa.Table:
        t = doc_batch_to_transcripts(batch)
        i = batch.column("doc_id").to_numpy().astype(np.int64)
        lat0 = ((i * 37) % 160) - 80.0
        lat1 = lat0 + 1.0 + (i % 7) * 0.25
        lon0 = ((i * 53) % 340) - 170.0
        lon1 = lon0 + 1.0 + (i % 5) * 0.5
        lats = np.stack([lat0, lat0, lat1, lat1], axis=1)
        lons = np.stack([lon0, lon1, lon1, lon0], axis=1)
        t = t.append_column("shape_lats", pa.array(
            list(lats), type=pa.list_(pa.float64())))
        return t.append_column("shape_lons", pa.array(
            list(lons), type=pa.list_(pa.float64())))

    index_dir = index_dir or index_dir_for(sf_dir) + "-shp"
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]) \
        .map_batches(add_shape, batch_format="pyarrow")
    build_index(ds, index_dir, target_docs_per_partition=100_000,
                shape_cols={"area": ("shape_lats", "shape_lons")},
                input_desc=f"documents@{sf_dir}+shp")
    return index_dir


def index_shape_count(sf_dir: str) -> pd.DataFrame:
    """Shape relation queries (`document/LatLonShapeQuery.java`): per-doc
    rectangles vs a query box, all four relations, through the bbox BKD
    prune + exact integer-geometry verify."""
    from ..search.shapes import lat_lon_shape_box_query

    searcher = IndexSearcher(build_shape_index(sf_dir))
    counts = {rel: searcher.count(
        lat_lon_shape_box_query("area", rel, *SHAPE_QBOX))
        for rel in ("intersects", "within", "contains", "disjoint")}
    return pd.DataFrame({f"n_{rel}": pd.Series([v], dtype="int64")
                         for rel, v in counts.items()})


def index_shape_holes_count(sf_dir: str) -> pd.DataFrame:
    """Polygon-with-holes relations: per-doc annuli (outer square + centered
    square hole, doc_id-derived) vs the query box — intersects excludes
    boxes swallowed by a hole, contains requires the box to avoid the hole
    (`geo/Polygon.java` holes semantics)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ..search.shapes import lat_lon_shape_box_query
    from ..sources.transcripts import doc_batch_to_transcripts

    def add_annulus(batch: pa.Table) -> pa.Table:
        t = doc_batch_to_transcripts(batch)
        i = batch.column("doc_id").to_numpy().astype(np.int64)
        o0 = ((i * 31) % 120) / 2.0 - 60.0
        o1 = o0 + 8.0 + (i % 4)
        h0 = o0 + 2.0
        h1 = h0 + 2.0 + (i % 3)
        lats = [[[o0[j], o0[j], o1[j], o1[j]], [h0[j], h0[j], h1[j], h1[j]]]
                for j in range(len(i))]
        lons = [[[o0[j], o1[j], o1[j], o0[j]], [h0[j], h1[j], h1[j], h0[j]]]
                for j in range(len(i))]
        t = t.append_column("sl", pa.array(
            lats, type=pa.list_(pa.list_(pa.float64()))))
        return t.append_column("sn", pa.array(
            lons, type=pa.list_(pa.list_(pa.float64()))))

    index_dir = index_dir_for(sf_dir) + "-ann"
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]) \
        .map_batches(add_annulus, batch_format="pyarrow")
    build_index(ds, index_dir, target_docs_per_partition=100_000,
                shape_cols={"area": ("sl", "sn")},
                input_desc=f"documents@{sf_dir}+ann")
    searcher = IndexSearcher(index_dir)
    qy0, qy1, qx0, qx1 = SHAPE_QBOX
    counts = {rel: searcher.count(
        lat_lon_shape_box_query("area", rel, qy0, qy1, qx0, qx1))
        for rel in ("intersects", "contains", "disjoint")}
    return pd.DataFrame({f"n_{rel}": pd.Series([v], dtype="int64")
                         for rel, v in counts.items()})


def index_charfilter_count(sf_dir: str) -> pd.DataFrame:
    """Char filter + alternate tokenizer end-to-end: a MappingCharFilter
    rewrite (fast→quick) feeding a case-preserving WhitespaceTokenizer +
    LowerCaseFilter chain (`analysis/charfilter/MappingCharFilter.java`,
    `analysis/core/WhitespaceTokenizer.java`); counts through the index
    for the rewritten term, the erased source term, and a phrase over the
    whitespace positions."""
    from ..search.query import PhraseQuery, TermQuery

    index_dir = index_dir_for(sf_dir) + "-ws"
    ds = transcripts_from_documents(sf_dir)
    build_index(ds, index_dir, target_docs_per_partition=100_000,
                token_filters=("char:map:fast=quick", "tokenizer:whitespace",
                               "lowercase"),
                input_desc=f"documents@{sf_dir}+ws")
    searcher = IndexSearcher(index_dir)
    n_quick = searcher.count(TermQuery("quick"))
    n_fast = searcher.count(TermQuery("fast"))
    n_phrase = searcher.count(PhraseQuery(("quick", "table")))
    return pd.DataFrame({"n_quick": pd.Series([n_quick], dtype="int64"),
                         "n_fast": pd.Series([n_fast], dtype="int64"),
                         "n_phrase": pd.Series([n_phrase], dtype="int64")})


def index_automaton_count(sf_dir: str) -> pd.DataFrame:
    """TermAutomatonQuery end-to-end (`sandbox/.../TermAutomatonQuery.java`):
    a gap pattern (merge · ANY · join) and a union-of-bigrams automaton
    (merge→join | merge→sort), counted through the positional postings."""
    from ..search.automaton import TermAutomatonQuery

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    gap = TermAutomatonQuery()
    s0, s1, s2, s3 = (gap.create_state() for _ in range(4))
    gap.add_transition(s0, s1, "merge")
    gap.add_any_transition(s1, s2)
    gap.add_transition(s2, s3, "join")
    gap.set_accept(s3, True)
    n_gap = searcher.count(gap.finish())

    uni = TermAutomatonQuery()
    u0, u1a, u1b, u2 = (uni.create_state() for _ in range(4))
    uni.add_transition(u0, u1a, "merge")
    uni.add_transition(u1a, u2, "join")
    uni.add_transition(u0, u1b, "merge")
    uni.add_transition(u1b, u2, "sort")
    uni.set_accept(u2, True)
    n_union = searcher.count(uni.finish())
    return pd.DataFrame({"n_gap": pd.Series([n_gap], dtype="int64"),
                         "n_union": pd.Series([n_union], dtype="int64")})


def index_feature_topk(sf_dir: str) -> pd.DataFrame:
    """FeatureField scoring (`document/FeatureField.java`): top-k by the
    log feature function over the encoded `feat_pr` doc-values column,
    with the saturation score (explicit pivot) reported for the same docs
    — both functions are monotone in S, so the rankings coincide and the
    SQL twin reproduces the float32 score math exactly."""
    from ..search.feature import FeatureQuery

    searcher = IndexSearcher(build_geo_index(sf_dir))
    td = searcher.search(FeatureQuery("feat_pr", "log", boost=1.5,
                                      scaling_factor=0.5), k=SORT_K)
    td_sat = searcher.search(FeatureQuery("feat_pr", "saturation", boost=2.0,
                                          pivot=8.0), k=SORT_K)
    assert [h.gid for h in td.hits] == [h.gid for h in td_sat.hits]
    rows = [(r, h.conv_id, int(h.turn_idx), float(h.score), float(hs.score))
            for r, (h, hs) in enumerate(zip(td.hits, td_sat.hits), 1)]
    return pd.DataFrame(rows, columns=["rank", "conv_id", "turn_idx",
                                       "score_log", "score_sat"]) \
        .astype({"rank": "int64", "turn_idx": "int64",
                 "score_log": "float64", "score_sat": "float64"})


# XY query shapes (index_xy_count); triangle is convex CCW in the x/y plane
XY_BOX = (-20.0, 40.0, -10.0, 55.0)            # min_x, max_x, min_y, max_y
XY_CIRCLE = (5.0, 12.0, 30.0)                  # x, y, radius
XY_TRI_XS = (-55.0, 60.0, -10.0)
XY_TRI_YS = (-50.0, -20.0, 62.0)


def index_xy_count(sf_dir: str) -> pd.DataFrame:
    """Cartesian XYPoint queries (`document/XYPointField.java` over the
    sortable-float encoding): box, squared-euclidean distance and polygon
    counts through the 2-D BKD sidecar."""
    from ..search.xy import XYDistanceQuery, XYPolygonQuery, xy_box_query

    searcher = IndexSearcher(build_geo_index(sf_dir))
    n_box = searcher.count(xy_box_query("xy", XY_BOX[0], XY_BOX[1],
                                        XY_BOX[2], XY_BOX[3]))
    n_radius = searcher.count(XYDistanceQuery("xy", *XY_CIRCLE))
    n_poly = searcher.count(XYPolygonQuery("xy", XY_TRI_XS, XY_TRI_YS))
    return pd.DataFrame({"n_in_box": pd.Series([n_box], dtype="int64"),
                         "n_in_radius": pd.Series([n_radius], dtype="int64"),
                         "n_in_polygon": pd.Series([n_poly], dtype="int64")})


HF_RANGE = (-12.25, 30.5)                       # half-float query bounds
HF_SET = (0.0, 3.125, 9999.0)                   # last value unindexed
BIG_K = (1 << 70) + 12345                       # BigInteger stride
BIG_BOUND_DOCS = (100, 900)                     # bounds from these doc_ids


def index_sandbox_point_count(sf_dir: str) -> pd.DataFrame:
    """Sandbox numeric point types (`sandbox/document/HalfFloatPoint.java`,
    `BigIntegerPoint.java`): half-float range + set counts over the
    sortable-short dimension, and a 128-bit integer range whose bounds
    slice the low word (so the <=3-box decomposition is exercised)."""
    from ..search.point_types import (
        big_integer_range_query,
        half_float_range_query,
        half_float_set_query,
    )

    searcher = IndexSearcher(build_geo_index(sf_dir))
    n_hf = searcher.count(half_float_range_query("hf", *HF_RANGE))
    n_hf_set = searcher.count(half_float_set_query("hf", HF_SET))
    d0, d1 = BIG_BOUND_DOCS
    lo = (d0 - 3000) * BIG_K + 1
    hi = (d1 - 3000) * BIG_K - 1
    n_big = searcher.count(big_integer_range_query("big", lo, hi))
    return pd.DataFrame({"n_hf_range": pd.Series([n_hf], dtype="int64"),
                         "n_hf_set": pd.Series([n_hf_set], dtype="int64"),
                         "n_big_range": pd.Series([n_big], dtype="int64")})


INET_RANGE_Q = ("172.16.40.0", "172.16.120.255")   # iprange query bounds


def index_inet_count(sf_dir: str) -> pd.DataFrame:
    """InetAddressPoint + InetAddressRange (`document/InetAddressPoint.java`,
    `InetAddressRange.java`): exact / CIDR-prefix / range counts over the
    ip point column and all four range relations over the doc-side
    [min_ip, max_ip] ranges (word-pair half-plane visits composed in
    boolean FILTER/MUST_NOT position)."""
    from ..search.point_types import (
        inet_exact_query,
        inet_prefix_query,
        inet_range_query,
        inet_range_relation_query,
    )

    searcher = IndexSearcher(build_geo_index(sf_dir))

    def v4_str(d: int) -> str:
        v = (10 << 24) + (d * 97) % (1 << 24)
        return f"10.{(v >> 16) & 255}.{(v >> 8) & 255}.{v & 255}"

    out = {
        "n_exact": searcher.count(inet_exact_query("ip", v4_str(117))),
        "n_prefix": searcher.count(inet_prefix_query("ip", "10.64.0.0/10")),
        "n_range": searcher.count(
            inet_range_query("ip", "10.32.0.0", "10.159.255.255")),
    }
    for rel in ("intersects", "within", "contains", "crosses"):
        out[f"n_{rel}"] = searcher.count(
            inet_range_relation_query("iprange", rel, *INET_RANGE_Q))
    return pd.DataFrame({k: pd.Series([v], dtype="int64")
                         for k, v in out.items()})


RANGE_FIELD_Q = (50, 120)          # query range for index_range_field_count


def index_range_field_count(sf_dir: str) -> pd.DataFrame:
    """RangeField relations (`document/RangeFieldQuery.java`) over the
    doc-side [span_lo, span_hi] ranges: intersects / within / contains /
    crosses counts against the [50, 120] query range."""
    from ..search.query import RangeFieldQuery

    searcher = IndexSearcher(build_geo_index(sf_dir))
    lo, hi = RANGE_FIELD_Q
    counts = {rel: searcher.count(RangeFieldQuery("span", rel, lo, hi))
              for rel in ("intersects", "within", "contains", "crosses")}
    return pd.DataFrame({f"n_{rel}": pd.Series([n], dtype="int64")
                         for rel, n in counts.items()})


# convex (CCW in the lon/lat plane) query triangle + distance-sort origin
GEO_TRI_LATS = (-40.0, -10.0, 65.0)
GEO_TRI_LONS = (-120.0, 100.0, -30.0)
GEO_SORT_ORIGIN = (37.0, -122.0)


def index_geo_polygon_count(sf_dir: str) -> pd.DataFrame:
    """LatLonPoint.newPolygonQuery through the BKD sidecar: bbox prune +
    exact even-odd containment verify on decoded coords
    (`geo/Polygon2D.java` semantics)."""
    from ..search.geo import LatLonPolygonQuery

    searcher = IndexSearcher(build_geo_index(sf_dir))
    n = searcher.count(LatLonPolygonQuery("loc", GEO_TRI_LATS, GEO_TRI_LONS))
    return pd.DataFrame({"n_in_polygon": pd.Series([n], dtype="int64")})


def index_geo_distance_topk(sf_dir: str) -> pd.DataFrame:
    """Distance-sorted top-k (LatLonDocValuesField.newDistanceSort
    analogue): docs containing 'merge', nearest-first from the origin,
    haversine on decoded quantized coords; (rank, conv_id, turn_idx,
    dist_m floored to integer meters for the SQL twin)."""
    from ..search.geo import GeoDistanceSort

    searcher = IndexSearcher(build_geo_index(sf_dir))
    td = searcher.search(bool_query(should=["merge"]), k=SORT_K,
                         sort=GeoDistanceSort("loc", *GEO_SORT_ORIGIN))
    import math

    rows = [(r, h.conv_id, int(h.turn_idx), int(math.floor(h.fields[0])))
            for r, h in enumerate(td.hits, 1)]
    return pd.DataFrame(rows, columns=["rank", "conv_id", "turn_idx", "dist_m"]) \
        .astype({"rank": "int64", "turn_idx": "int64", "dist_m": "int64"})


def build_facetset_index(sf_dir: str, index_dir: str | None = None) -> str:
    """Index variant with a multi-valued 2-dim facet-set point field `fs`
    (two sets per doc — `facet/facetset/FacetSetsField.java` model)."""
    from ..sources.transcripts import transcripts_with_facetsets

    index_dir = index_dir or index_dir_for(sf_dir) + "-fs"
    ds = transcripts_with_facetsets(sf_dir)
    build_index(ds, index_dir, target_docs_per_partition=100_000,
                point_cols={"fs": ("fs_a", "fs_b")},
                input_desc=f"documents@{sf_dir}+facetsets")
    return index_dir


def index_facetset_counts(sf_dir: str) -> pd.DataFrame:
    """MatchingFacetSetsCounts (`facet/facetset/MatchingFacetSetsCounts.java`)
    over docs containing 'merge': an ExactFacetSetMatcher and two
    RangeFacetSetMatchers against the doc's two (a, b) sets — counts are
    matching (doc, set) pairs, total is distinct matched docs."""
    from ..search.facetset import (
        DimRange,
        ExactFacetSetMatcher,
        RangeFacetSetMatcher,
        facet_set_counts,
    )

    searcher = IndexSearcher(build_facetset_index(sf_dir))
    matchers = (
        ExactFacetSetMatcher("exact_3_4", (3, 4)),
        RangeFacetSetMatcher("mid", (DimRange(2, 4), DimRange(5, 9))),
        RangeFacetSetMatcher("hi", (DimRange.from_longs(3, False, 6, True),
                                    DimRange(8, 20))),
    )
    r = facet_set_counts(searcher, bool_query(should=["merge"]), "fs",
                         matchers)
    cols = {"total": pd.Series([r["total"]], dtype="int64")}
    for label, c in r["counts"]:
        cols[f"n_{label}"] = pd.Series([c], dtype="int64")
    return pd.DataFrame(cols)


# LongPoint.newDistanceFeatureQuery config: origin at doc 137's ts, pivot 43s
DISTFEAT_ORIGIN_DOC = 137
DISTFEAT_PIVOT_US = 43_000_000
DISTFEAT_WEIGHT = 1.8
GEO_DISTFEAT_PIVOT_M = 250_000.0
GEO_DISTFEAT_WEIGHT = 2.0


def index_distance_feature_topk(sf_dir: str) -> pd.DataFrame:
    """LongPoint.newDistanceFeatureQuery
    (`document/LongDistanceFeatureQuery.java`): recency-style boosting —
    top-k docs by weight * pivot/(pivot + |ts - origin|), float32 score
    reproduced exactly by the SQL twin.  (rank, conv_id, turn_idx, score)."""
    from ..search.feature import LongDistanceFeatureQuery
    from ..sources.transcripts import BASE_TS_US

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    origin = BASE_TS_US + DISTFEAT_ORIGIN_DOC * 1_000_000
    td = searcher.search(
        LongDistanceFeatureQuery("ts", origin, DISTFEAT_PIVOT_US,
                                 boost=DISTFEAT_WEIGHT), k=SORT_K)
    rows = [(r, h.conv_id, int(h.turn_idx), float(h.score))
            for r, h in enumerate(td.hits, 1)]
    return pd.DataFrame(rows, columns=["rank", "conv_id", "turn_idx", "score"]) \
        .astype({"rank": "int64", "turn_idx": "int64", "score": "float64"})


def index_geo_distfeat_topk(sf_dir: str) -> pd.DataFrame:
    """LatLonPoint.newDistanceFeatureQuery
    (`document/LatLonPointDistanceFeatureQuery.java`): proximity boosting —
    every doc with a point, scored weight * pivot_m/(pivot_m + haversine_m)
    on decoded coords.  Reports the floored meter distance alongside the
    float32 score.  (rank, conv_id, turn_idx, dist_m, score)."""
    import math

    from ..search.geo import GeoDistanceFeatureQuery

    searcher = IndexSearcher(build_geo_index(sf_dir))
    qlat, qlon = GEO_SORT_ORIGIN
    td = searcher.search(
        GeoDistanceFeatureQuery("loc", qlat, qlon, GEO_DISTFEAT_PIVOT_M,
                                boost=GEO_DISTFEAT_WEIGHT), k=SORT_K)
    # score reported quantized (floor(score * 1e4)) so the oracle compare
    # tolerates last-ulp trig differences, like the floored-meter geo sort
    rows = [(r, h.conv_id, int(h.turn_idx),
             int(math.floor(float(h.score) * 10_000.0)))
            for r, h in enumerate(td.hits, 1)]
    return pd.DataFrame(rows, columns=["rank", "conv_id", "turn_idx",
                                       "score_q4"]) \
        .astype({"rank": "int64", "turn_idx": "int64", "score_q4": "int64"})


def index_sorted_topk(sf_dir: str) -> pd.DataFrame:
    """Sort-by-field top-k through the index (TopFieldCollector analogue):
    docs containing 'merge', ordered by turn_idx DESC with global-docID-asc
    tie-break — heavy ties (turn_idx in 0..4) exercise the tie-break.
    (rank, conv_id, turn_idx, sort_value)."""
    from ..search.query import SortField

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    td = searcher.search(bool_query(should=["merge"]), k=SORT_K,
                         sort=SortField("turn_idx", reverse=True))
    rows = [(r, h.conv_id, int(h.turn_idx), int(h.fields[0]))
            for r, h in enumerate(td.hits, 1)]
    return pd.DataFrame(rows, columns=["rank", "conv_id", "turn_idx", "sort_value"]) \
        .astype({"rank": "int64", "turn_idx": "int64", "sort_value": "int64"})


def build_mv_index(sf_dir: str, index_dir: str | None = None) -> str:
    """Index variant carrying MULTI-VALUED doc-values columns: ``mv_num``
    (list<int64>, SortedNumericDocValuesField model) and ``mv_str``
    (list<string>, SortedSetDocValuesField model)."""
    from ..sources.transcripts import transcripts_with_multivalues

    index_dir = index_dir or index_dir_for(sf_dir) + "-mv"
    ds = transcripts_with_multivalues(sf_dir)
    build_index(ds, index_dir, target_docs_per_partition=100_000,
                docvalue_cols=("mv_num", "mv_str"),
                input_desc=f"documents@{sf_dir}+mv")
    return index_dir


def index_sorted_numeric_topk(sf_dir: str) -> pd.DataFrame:
    """Sort by a MULTI-VALUED numeric dv column through a selector
    (`search/SortedNumericSortField.java` + SortedNumericSelector.MAX):
    docs containing 'merge' ordered by max(mv_num) DESC, docs with no
    values taking missing=-1 (sorting last), global-docID-asc ties.
    (rank, conv_id, turn_idx, sort_value)."""
    from ..search.query import SortedNumericSortField

    searcher = IndexSearcher(build_mv_index(sf_dir))
    td = searcher.search(
        bool_query(should=["merge"]), k=SORT_K,
        sort=SortedNumericSortField("mv_num", "max", reverse=True,
                                    missing=-1))
    rows = [(r, h.conv_id, int(h.turn_idx), int(h.fields[0]))
            for r, h in enumerate(td.hits, 1)]
    return pd.DataFrame(rows, columns=["rank", "conv_id", "turn_idx",
                                       "sort_value"]) \
        .astype({"rank": "int64", "turn_idx": "int64", "sort_value": "int64"})


def index_sorted_set_topk(sf_dir: str) -> pd.DataFrame:
    """Sort by a MULTI-VALUED string dv column through a selector
    (`search/SortedSetSortField.java` + SortedSetSelector.MIDDLE_MAX):
    docs containing 'merge' ordered by the selected tag ASC with docs
    missing the field first (TermOrdValComparator null semantics), k=15.
    Missing tags report as '' so the oracle compare sees one value domain.
    (rank, conv_id, turn_idx, sort_tag)."""
    from ..search.query import SortedSetSortField

    searcher = IndexSearcher(build_mv_index(sf_dir))
    td = searcher.search(bool_query(should=["merge"]), k=SORT_K,
                         sort=SortedSetSortField("mv_str", "middle_max"))
    rows = [(r, h.conv_id, int(h.turn_idx), h.fields[0] or "")
            for r, h in enumerate(td.hits, 1)]
    return pd.DataFrame(rows, columns=["rank", "conv_id", "turn_idx",
                                       "sort_tag"]) \
        .astype({"rank": "int64", "turn_idx": "int64"})


def index_multivalue_range_count(sf_dir: str) -> pd.DataFrame:
    """Slow multi-valued dv range queries
    (`document/SortedNumericDocValuesField.newSlowRangeQuery` /
    `SortedSetDocValuesField.newSlowRangeQuery`): any-value-in-range
    semantics over the list columns — numeric range, numeric exact,
    string range inclusive and exclusive."""
    from ..search.query import (
        DocValuesRewriteQuery,
        SortedNumericRangeQuery,
        SortedSetRangeQuery,
        WildcardQuery,
    )

    searcher = IndexSearcher(build_mv_index(sf_dir))
    n_num = searcher.count(SortedNumericRangeQuery("mv_num", 100, 220))
    n_exact = searcher.count(SortedNumericRangeQuery("mv_num", 150, 150))
    n_str = searcher.count(SortedSetRangeQuery("mv_str", "t03", "t07"))
    n_str_x = searcher.count(SortedSetRangeQuery(
        "mv_str", "t03", "t07", include_lower=False, include_upper=False))
    # DocValuesRewriteMethod: a wildcard evaluated on the dv vocab
    n_wild = searcher.count(DocValuesRewriteQuery(
        "mv_str", WildcardQuery("t?2")))
    return pd.DataFrame({"n_num": pd.Series([n_num], dtype="int64"),
                         "n_num_exact": pd.Series([n_exact], dtype="int64"),
                         "n_str": pd.Series([n_str], dtype="int64"),
                         "n_str_excl": pd.Series([n_str_x], dtype="int64"),
                         "n_wild": pd.Series([n_wild], dtype="int64")})


def index_ssdv_facets(sf_dir: str) -> pd.DataFrame:
    """SortedSetDocValues faceting over a MULTI-VALUED field
    (`facet/sortedset/SortedSetDocValuesFacetCounts.java` getTopChildren):
    per-tag doc counts of mv_str among docs matching 'merge', count desc /
    tag asc, top 8, plus the dim count (docs with >= 1 tag).
    (rank, tag, n_docs, dim_count)."""
    searcher = IndexSearcher(build_mv_index(sf_dir))
    top, dim_count = searcher.facet_sorted_set(
        bool_query(should=["merge"]), "mv_str", top_n=8)
    rows = [(r, tag, n, dim_count) for r, (tag, n) in enumerate(top, 1)]
    return pd.DataFrame(rows, columns=["rank", "tag", "n_docs",
                                       "dim_count"]) \
        .astype({"rank": "int64", "n_docs": "int64", "dim_count": "int64"})


def index_sorted_ts_topk(sf_dir: str) -> pd.DataFrame:
    """Most-recent-matching-turns: docs containing 'merge' by ts DESC, k=15
    (the 'search within a time window, newest first' surface), combined with
    a ts range FILTER.  (rank, conv_id, turn_idx, ts_us)."""
    from ..search.query import BooleanClause, BooleanQuery, RangeQuery, SortField, TermQuery
    from ..search.query import FILTER as F, MUST as M
    from ..sources.transcripts import BASE_TS_US

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    hi = BASE_TS_US + RANGE_HI_DOC * 1_000_000
    q = BooleanQuery((BooleanClause(TermQuery("merge"), M),
                      BooleanClause(RangeQuery("ts", None, hi), F)))
    td = searcher.search(q, k=SORT_K, sort=SortField("ts", reverse=True))
    rows = [(r, h.conv_id, int(h.turn_idx), int(h.fields[0]))
            for r, h in enumerate(td.hits, 1)]
    return pd.DataFrame(rows, columns=["rank", "conv_id", "turn_idx", "ts_us"]) \
        .astype({"rank": "int64", "turn_idx": "int64", "ts_us": "int64"})


INTERVAL_W = 5


def index_interval_count(sf_dir: str) -> pd.DataFrame:
    """Interval proximity through the index positions: docs where 'merge'
    precedes 'join' within a span of INTERVAL_W positions (ordered), and
    where both occur within the span in any order (unordered)."""
    from ..search.query import IntervalQuery

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    n_ord = searcher.count(IntervalQuery(("merge", "join"), INTERVAL_W, ordered=True))
    n_any = searcher.count(IntervalQuery(("merge", "join"), INTERVAL_W, ordered=False))
    return pd.DataFrame({"n_ordered": pd.Series([n_ord], dtype="int64"),
                         "n_unordered": pd.Series([n_any], dtype="int64")})


def index_facet_role(sf_dir: str) -> pd.DataFrame:
    """Index-backed faceting: docs per `role` keyword value, read straight
    from the merged keyword-term statistics (no source-table scan) — the
    SSDV-faceting role of `facet/sortedset/SortedSetDocValuesFacetCounts`.
    SQL mirror uses the deterministic role = _ROLES[doc_id %% 4] adapter."""
    from ..index.shard import keyword_term

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    roles = ["assistant", "system", "tool", "user"]
    rows = [(r, searcher.df(keyword_term("role", r))) for r in roles]
    return pd.DataFrame(rows, columns=["role", "n_docs"]).astype({"n_docs": "int64"})


def index_stemmed_count(sf_dir: str) -> pd.DataFrame:
    """Porter-stemmed index: querying the inflected form 'merges' matches
    docs containing 'merge' (both stem to 'merg'; the searcher applies the
    commit's filter chain to query terms).  The corpus vocabulary is closed,
    so the SQL mirror's preimage set {merge} is exact.
    (n_merges = count for query 'merges', n_queries = count for 'queries')."""
    import shutil

    from ..index.build import build_index as _build

    index_dir = index_dir_for(sf_dir) + "-stem"
    ds = transcripts_from_documents(sf_dir)
    _build(ds, index_dir, target_docs_per_partition=100_000,
           token_filters=("ascii_fold", "porter"),
           input_desc=f"documents@{sf_dir}+stem")
    searcher = IndexSearcher(index_dir)
    n1 = searcher.count(bool_query(must=["merges"]))
    n2 = searcher.count(bool_query(must=["queries"]))
    return pd.DataFrame({"n_merges": pd.Series([n1], dtype="int64"),
                         "n_queries": pd.Series([n2], dtype="int64")})


def index_synonym_count(sf_dir: str) -> pd.DataFrame:
    """SynonymGraphFilter chain: rule join=merge emits 'merge' at every
    'join' position (posInc 0).  n_merge counts docs matching 'merge'
    (= docs containing merge OR join); n_phrase counts the exact phrase
    'merge sort' (= docs where sort follows merge-or-join)."""
    from ..search.query import PhraseQuery

    index_dir = index_dir_for(sf_dir) + "-syn"
    ds = transcripts_from_documents(sf_dir)
    build_index(ds, index_dir, target_docs_per_partition=100_000,
                token_filters=("syn:join=merge",),
                input_desc=f"documents@{sf_dir}+syn")
    searcher = IndexSearcher(index_dir)
    n1 = searcher.count(bool_query(must=["merge"]))
    n2 = searcher.count(PhraseQuery(("merge", "sort")))
    return pd.DataFrame({"n_merge": pd.Series([n1], dtype="int64"),
                         "n_phrase": pd.Series([n2], dtype="int64")})


def index_shingle_count(sf_dir: str) -> pd.DataFrame:
    """ShingleFilter(2,2, outputUnigrams) chain: a 'a b' token per adjacent
    pair.  n_bigram counts docs containing the shingle term 'merge join';
    n_unigram checks unigrams still index ('merge')."""
    from ..search.query import TermQuery

    index_dir = index_dir_for(sf_dir) + "-shingle"
    ds = transcripts_from_documents(sf_dir)
    build_index(ds, index_dir, target_docs_per_partition=100_000,
                token_filters=("shingle",),
                input_desc=f"documents@{sf_dir}+shingle")
    searcher = IndexSearcher(index_dir)
    n1 = searcher.count(TermQuery("merge join"))
    n2 = searcher.count(TermQuery("merge"))
    return pd.DataFrame({"n_bigram": pd.Series([n1], dtype="int64"),
                         "n_unigram": pd.Series([n2], dtype="int64")})


def index_stop_count(sf_dir: str) -> pd.DataFrame:
    """Configurable StopFilter chain (enablePositionIncrements): stopwords
    vanish from the dictionary (n_the = 0), non-stop terms are unaffected
    (n_merge), and phrases do NOT match across the position gap a removed
    stopword leaves (n_phrase = original-adjacency 'merge join' count)."""
    from ..search.query import PhraseQuery

    index_dir = index_dir_for(sf_dir) + "-stop"
    ds = transcripts_from_documents(sf_dir)
    build_index(ds, index_dir, target_docs_per_partition=100_000,
                token_filters=("stop:the,and,of,to,a,in,is,it,that,for",),
                input_desc=f"documents@{sf_dir}+stop")
    searcher = IndexSearcher(index_dir)
    n_the = searcher.count(bool_query(must=["the"]))
    n_merge = searcher.count(bool_query(must=["merge"]))
    n_phrase = searcher.count(PhraseQuery(("merge", "join")))
    return pd.DataFrame({"n_the": pd.Series([n_the], dtype="int64"),
                         "n_merge": pd.Series([n_merge], dtype="int64"),
                         "n_phrase": pd.Series([n_phrase], dtype="int64")})


BM25_SQL_TERMS = ("merge", "join")
BM25_SQL_K = 20


def index_bm25_sql_topk(sf_dir: str) -> pd.DataFrame:
    """Index-backed BM25 top-k with an exact DuckDB oracle: the oracle embeds
    the SmallFloat norm quantization table, so the full engine chain
    (analyze → norm byte → BM25 float32) is value-checked against SQL to
    4 decimals.  (rank, conv_id, turn_idx, score)."""
    from ..search.query import bool_query

    index_dir = build_transcript_index(sf_dir)
    searcher = IndexSearcher(index_dir)
    td = searcher.search(bool_query(should=list(BM25_SQL_TERMS)), k=BM25_SQL_K)
    rows = [(r, h.conv_id, int(h.turn_idx), round(float(h.score), 4))
            for r, h in enumerate(td.hits, 1)]
    return pd.DataFrame(rows, columns=["rank", "conv_id", "turn_idx", "score"]) \
        .astype({"rank": "int64", "turn_idx": "int64"})


DIV_MAX_PER_KEY = 1


def index_diversified_topk(sf_dir: str) -> pd.DataFrame:
    """DiversifiedTopDocsCollector through the driver gate: BM25 top-k with
    at most DIV_MAX_PER_KEY hit per conversation; SQL twin caps via
    row_number() over the same scored CTE.  (rank, conv_id, turn_idx,
    score 4dp)."""
    from ..search.query import bool_query
    from ..search.searcher import diversified_search

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    td = diversified_search(searcher, bool_query(should=list(BM25_SQL_TERMS)),
                            k=BM25_SQL_K, max_per_key=DIV_MAX_PER_KEY)
    rows = [(r, h.conv_id, int(h.turn_idx), round(float(h.score), 4))
            for r, h in enumerate(td.hits, 1)]
    return pd.DataFrame(rows, columns=["rank", "conv_id", "turn_idx", "score"]) \
        .astype({"rank": "int64", "turn_idx": "int64"})


GROUP_DOCS_PER = 3


def index_grouped_topk(sf_dir: str) -> pd.DataFrame:
    """GroupingSearch through the driver gate: BM25 over the query terms,
    grouped by the role keyword (two-pass collector semantics), top
    GROUP_DOCS_PER docs per group; SQL twin partitions the scored CTE by
    the deterministic doc_id→role mapping.  (group_rank, role, doc_rank,
    conv_id, turn_idx, score 4dp)."""
    from ..search.query import bool_query
    from ..search.searcher import grouped_search

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    groups = grouped_search(searcher, bool_query(should=list(BM25_SQL_TERMS)),
                            group_field="role", n_groups=4,
                            docs_per_group=GROUP_DOCS_PER)
    rows = []
    for grank, (role, _best, hits) in enumerate(groups, start=1):
        for drank, h in enumerate(hits, start=1):
            rows.append((grank, role, drank, h.conv_id, int(h.turn_idx),
                         round(float(h.score), 4)))
    return pd.DataFrame(rows, columns=["group_rank", "role", "doc_rank",
                                       "conv_id", "turn_idx", "score"]) \
        .astype({"group_rank": "int64", "doc_rank": "int64",
                 "turn_idx": "int64"})


def index_grouped_oracle_sql() -> str:
    return f"""
        WITH {bm25_scored_cte(BM25_SQL_TERMS)},
        keyed AS (
          SELECT doc_id, score,
                 ['user','assistant','system','tool'][doc_id % 4 + 1] AS role
          FROM scored),
        docs_ranked AS (
          SELECT *, row_number() OVER (PARTITION BY role
                                       ORDER BY score DESC, doc_id ASC) AS doc_rank
          FROM keyed),
        grp AS (
          SELECT role, score AS best, doc_id AS best_doc,
                 row_number() OVER (ORDER BY score DESC, doc_id ASC, role ASC)
                     AS group_rank
          FROM docs_ranked WHERE doc_rank = 1)
        SELECT g.group_rank::BIGINT AS group_rank, d.role,
               d.doc_rank::BIGINT AS doc_rank,
               printf('conv-%08d', d.doc_id // 5) AS conv_id,
               (d.doc_id % 5)::BIGINT AS turn_idx,
               round(d.score, 4) AS score
        FROM docs_ranked d JOIN grp g ON g.role = d.role
        WHERE d.doc_rank <= {GROUP_DOCS_PER} AND g.group_rank <= 4
        ORDER BY g.group_rank, d.doc_rank"""


def index_diversified_oracle_sql() -> str:
    return f"""
        WITH {bm25_scored_cte(BM25_SQL_TERMS)},
        capped AS (
          SELECT doc_id, score,
                 row_number() OVER (PARTITION BY doc_id // 5
                                    ORDER BY score DESC, doc_id ASC) AS rk
          FROM scored)
        SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
               printf('conv-%08d', doc_id // 5) AS conv_id,
               (doc_id % 5)::BIGINT AS turn_idx,
               round(score, 4) AS score
        FROM capped WHERE rk <= {DIV_MAX_PER_KEY}
        ORDER BY score DESC, doc_id ASC LIMIT {BM25_SQL_K}"""


def _normmap_values() -> str:
    """VALUES list of (raw length -> SmallFloat-decoded length) pairs for
    every length that can occur in this corpus (<= 1024)."""
    import numpy as np

    from ..util.smallfloat import LENGTH_TABLE, int_to_byte4

    pairs = []
    for n in range(0, 1025):
        dec = float(LENGTH_TABLE[int(int_to_byte4(np.int64(n)))])
        pairs.append(f"({n},{dec})")
    return ",".join(pairs)


def bm25_scored_cte(terms: tuple[str, ...],
                    corpus_sql: str = "documents") -> str:
    """Shared DuckDB CTE chain ending in ``scored(doc_id, score)`` — the SQL
    twin of the engine's analyze → SmallFloat norm → BM25 chain, reused by
    the BM25 and hybrid oracles.  ``corpus_sql`` restricts the corpus (and
    with it df/avgdl/doc_count) — the hybrid oracle passes the
    documents⋈embeddings join because the vector index only contains docs
    that carry embeddings."""
    qmap = _normmap_values()
    tf_union = " UNION ALL ".join(
        f"SELECT doc_id, '{t}' AS term, len(list_filter(toks, x -> x = '{t}')) AS tf FROM toklists"
        for t in terms)
    return f"""toklists AS (
          SELECT doc_id, list_transform(regexp_extract_all(text, '[A-Za-z0-9]+'),
                                        x -> lower(x)) AS toks
          FROM {corpus_sql}),
        normmap(n, dec) AS (VALUES {qmap}),
        dl AS (SELECT t.doc_id, len(t.toks) AS raw_dl, m.dec AS dl
               FROM toklists t JOIN normmap m ON m.n = len(t.toks)),
        stats AS (SELECT count(*) AS n_docs,
                         sum(raw_dl) * 1.0 / count(*) AS avgdl FROM dl),
        tf AS ({tf_union}),
        df AS (SELECT term, count(*) FILTER (tf > 0) AS df FROM tf GROUP BY term),
        scored AS (
          SELECT tf.doc_id,
                 sum(ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))) AS score
          FROM tf, stats, df, dl
          WHERE tf.term = df.term AND tf.doc_id = dl.doc_id AND tf.tf > 0
          GROUP BY tf.doc_id)"""


def index_bm25_oracle_sql() -> str:
    """DuckDB twin of index_bm25_sql_topk (shares only constants, no code)."""
    return f"""
        WITH {bm25_scored_cte(BM25_SQL_TERMS)}
        SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
               printf('conv-%08d', doc_id // 5) AS conv_id,
               (doc_id % 5)::BIGINT AS turn_idx,
               round(score, 4) AS score
        FROM scored ORDER BY score DESC, doc_id ASC LIMIT {BM25_SQL_K}"""


BOOL_SQL_MUST = ("merge", "join")
BOOL_SQL_NOT = ("window",)


def index_bm25_bool_sql(sf_dir: str) -> pd.DataFrame:
    """Boolean MUST + MUST_NOT scoring through the index, SQL-value-checked:
    docs containing ALL of BOOL_SQL_MUST and none of BOOL_SQL_NOT, scored by
    the sum of the MUST terms' BM25 contributions."""
    searcher = IndexSearcher(build_transcript_index(sf_dir))
    td = searcher.search(bool_query(must=list(BOOL_SQL_MUST),
                                    must_not=list(BOOL_SQL_NOT)), k=BM25_SQL_K)
    rows = [(r, h.conv_id, int(h.turn_idx), round(float(h.score), 4))
            for r, h in enumerate(td.hits, 1)]
    return pd.DataFrame(rows, columns=["rank", "conv_id", "turn_idx", "score"]) \
        .astype({"rank": "int64", "turn_idx": "int64"})


def index_bool_oracle_sql() -> str:
    import numpy as np

    from ..util.smallfloat import LENGTH_TABLE, int_to_byte4

    pairs = ",".join(f"({n},{float(LENGTH_TABLE[int(int_to_byte4(np.int64(n)))])})"
                     for n in range(0, 1025))
    must, must_not = BOOL_SQL_MUST, BOOL_SQL_NOT
    tf_union = " UNION ALL ".join(
        f"SELECT doc_id, '{t}' AS term, len(list_filter(toks, x -> x = '{t}')) AS tf FROM toklists"
        for t in must)
    notcond = " AND ".join(f"NOT list_contains(t.toks, '{t}')" for t in must_not)
    return f"""
        WITH toklists AS (
          SELECT doc_id, list_transform(regexp_extract_all(text, '[A-Za-z0-9]+'),
                                        x -> lower(x)) AS toks
          FROM documents),
        normmap(n, dec) AS (VALUES {pairs}),
        dl AS (SELECT t.doc_id, len(t.toks) AS raw_dl, m.dec AS dl
               FROM toklists t JOIN normmap m ON m.n = len(t.toks)),
        stats AS (SELECT count(*) AS n_docs,
                         sum(raw_dl) * 1.0 / count(*) AS avgdl FROM dl),
        tf AS ({tf_union}),
        df AS (SELECT term, count(*) FILTER (tf > 0) AS df FROM tf GROUP BY term),
        eligible AS (SELECT doc_id FROM toklists t
                     WHERE {" AND ".join(f"list_contains(t.toks, '{t}')" for t in must)}
                       AND {notcond}),
        scored AS (
          SELECT tf.doc_id,
                 sum(ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))) AS score
          FROM tf, stats, df, dl
          WHERE tf.term = df.term AND tf.doc_id = dl.doc_id AND tf.tf > 0
            AND tf.doc_id IN (SELECT doc_id FROM eligible)
          GROUP BY tf.doc_id)
        SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
               printf('conv-%08d', doc_id // 5) AS conv_id,
               (doc_id % 5)::BIGINT AS turn_idx,
               round(score, 4) AS score
        FROM scored ORDER BY score DESC, doc_id ASC LIMIT {BM25_SQL_K}"""


EXPR_K = 10
EXPR_SRC = "_score * 2 + ln(1 + turn_idx)"


def index_expr_topk(sf_dir: str, k: int = EXPR_K) -> pd.DataFrame:
    """Scripted-scoring (expressions module surface): rescore the reference
    BM25 matches with `_score * 2 + ln(1 + turn_idx)` over doc-values —
    value-checked against SQL.  (rank, conv_id, turn_idx, score 4dp)."""
    from ..search.query import FunctionScoreQuery

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    q = FunctionScoreQuery(bool_query(should=list(BM25_SQL_TERMS)), EXPR_SRC)
    td = searcher.search(q, k=k)
    rows = [(r, h.conv_id, int(h.turn_idx), round(float(h.score), 4))
            for r, h in enumerate(td.hits, 1)]
    return pd.DataFrame(rows, columns=["rank", "conv_id", "turn_idx", "score"]) \
        .astype({"rank": "int64", "turn_idx": "int64"})


def index_intervals_algebra_count(sf_dir: str) -> pd.DataFrame:
    """Minimal-interval algebra counts (`queries/intervals/Intervals.java`):
    ordered(merge, join), within(merge, 3, join) and
    atLeast(2, merge, join, sort) doc counts through the index — each has a
    pure positional definition the SQL twin reproduces from the token
    lists."""
    from ..search import intervals as iv

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    n_ordered = searcher.count(iv.IntervalsSourceQuery(
        iv.ordered(iv.term("merge"), iv.term("join"))))
    n_within = searcher.count(iv.IntervalsSourceQuery(
        iv.within(iv.term("merge"), 3, iv.term("join"))))
    n_atleast = searcher.count(iv.IntervalsSourceQuery(
        iv.at_least(2, iv.term("merge"), iv.term("join"), iv.term("sort"))))
    return pd.DataFrame({"n_ordered": pd.Series([n_ordered], dtype="int64"),
                         "n_within": pd.Series([n_within], dtype="int64"),
                         "n_atleast": pd.Series([n_atleast], dtype="int64")})


def index_function_range_topk(sf_dir: str, k: int = 40) -> pd.DataFrame:
    """FunctionRangeQuery over a composed ValueSource
    (`queries/function/FunctionRangeQuery.java` + ValueSourceScorer,
    `valuesource/LinearFloatFunction.java`): docs whose value
    2*turn_idx + 1 lies in [5, 9); the score IS the value.  (rank, conv_id,
    turn_idx, score)."""
    from ..search.valuesource import (
        FieldSource,
        FunctionRangeQuery,
        LinearFloatFunction,
    )

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    q = FunctionRangeQuery(LinearFloatFunction(FieldSource("turn_idx"),
                                               2.0, 1.0),
                           lo=5, hi=9, include_upper=False)
    td = searcher.search(q, k=k, total_hits_threshold=2**31 - 1)
    rows = [(r, h.conv_id, int(h.turn_idx), float(h.score))
            for r, h in enumerate(td.hits, 1)]
    out = pd.DataFrame(rows, columns=["rank", "conv_id", "turn_idx", "score"]) \
        .astype({"rank": "int64", "turn_idx": "int64", "score": "float64"})
    out["n_total"] = int(td.total_hits)
    return out


TERMSTAT_EXPR = "tf('join') + df('sort') / maxdoc() + idf('merge') / 100"


def index_fn_termstats_topk(sf_dir: str, k: int = EXPR_K) -> pd.DataFrame:
    """FunctionQuery over term-statistic value sources
    (`queries/function/valuesource/TermFreqValueSource.java`,
    DocFreqValueSource, IDFValueSource, MaxDocValueSource): 'merge' docs
    rescored by per-doc tf('join') plus collection-stat terms — every
    component reproducible from the token lists in SQL.  (rank, conv_id,
    turn_idx, score 6dp)."""
    from ..search.query import FunctionScoreQuery, TermQuery

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    td = searcher.search(FunctionScoreQuery(TermQuery("merge"),
                                            TERMSTAT_EXPR), k=k)
    rows = [(r, h.conv_id, int(h.turn_idx), round(float(h.score), 6))
            for r, h in enumerate(td.hits, 1)]
    return pd.DataFrame(rows, columns=["rank", "conv_id", "turn_idx",
                                       "score"]) \
        .astype({"rank": "int64", "turn_idx": "int64"})


EXPR_SORT_SRC = "ln(1 + turn_idx) + ts / 100000000000000000"


def index_expr_sorted_topk(sf_dir: str) -> pd.DataFrame:
    """Sort-by-expression top-k (`Expression.getSortField` /
    ExpressionSortField surface): 'merge' docs ordered by a float64
    expression over doc-values, descending, gid-asc ties.  (rank, conv_id,
    turn_idx, sort_value)."""
    from ..search.query import ExpressionSort

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    td = searcher.search(bool_query(should=["merge"]), k=SORT_K,
                         sort=ExpressionSort(EXPR_SORT_SRC, reverse=True))
    rows = [(r, h.conv_id, int(h.turn_idx), float(h.fields[0]))
            for r, h in enumerate(td.hits, 1)]
    return pd.DataFrame(rows, columns=["rank", "conv_id", "turn_idx",
                                       "sort_value"]) \
        .astype({"rank": "int64", "turn_idx": "int64",
                 "sort_value": "float64"})


def index_fn_termstats_oracle_sql(k: int = EXPR_K) -> str:
    """SQL twin of TERMSTAT_EXPR: tf from the token lists, df/maxdoc as
    collection counts, idf through a FLOAT (float32) cast like
    ClassicSimilarity.idf's float return."""
    return """
        , stats AS (SELECT
            (SELECT count(*) FROM toklists
             WHERE list_contains(toks, 'sort')) AS df_sort,
            (SELECT count(*) FROM toklists
             WHERE list_contains(toks, 'merge')) AS df_merge,
            (SELECT count(*) FROM documents) AS maxdoc),
        fn AS (SELECT t.doc_id,
                 len(list_filter(t.toks, x -> x = 'join'))
                 + df_sort / (1.0 * maxdoc)
                 + (ln((maxdoc + 1) / (df_merge + 1.0)) + 1.0)::FLOAT::DOUBLE
                   / 100 AS fscore
               FROM toklists t, stats
               WHERE list_contains(t.toks, 'merge'))
        SELECT row_number() OVER (ORDER BY fscore DESC, doc_id ASC)::BIGINT
                 AS rank,
               printf('conv-%08d', doc_id // 5) AS conv_id,
               (doc_id % 5)::BIGINT AS turn_idx,
               round(fscore, 6) AS score
        FROM fn ORDER BY fscore DESC, doc_id ASC LIMIT """ + str(k)


QUALITY_K = 50                 # judged depth for quality_eval
QUALITY_MOD = 37               # relevant <=> doc_id % QUALITY_MOD == 0


class _ModJudge:
    """Deterministic judge: relevance from the doc name's derived doc_id
    (external-qrels stand-in; real runs feed TrecJudge + parsed qrels)."""

    def __init__(self, n_docs: int):
        self.n_docs = n_docs

    @staticmethod
    def _doc_id(name: str) -> int:
        conv, turn = name.split(":")
        return int(conv.split("-")[1]) * 5 + int(turn)

    def is_relevant(self, doc_name: str, qid: str) -> bool:
        return self._doc_id(doc_name) % QUALITY_MOD == 0

    def max_recall(self, qid: str) -> int:
        return (self.n_docs + QUALITY_MOD - 1) // QUALITY_MOD


def quality_eval(sf_dir: str) -> pd.DataFrame:
    """TREC-style quality run (`benchmark/quality/QualityStats.java`,
    QualityBenchmark): BM25 top-50 for query 'merge' judged against a
    deterministic relevance set — P@5/10/20 (with the reference's
    short-list extrapolation), MAP (avp), recall, and the top-5-gated
    MRR, all reproduced from the ranked list in SQL."""
    import pyarrow.parquet as pq

    from ..search.query import TermQuery
    from .quality import quality_benchmark

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    stats = quality_benchmark(searcher, [("q1", TermQuery("merge"))],
                              _ModJudge(n_docs), max_results=QUALITY_K)[0]
    return pd.DataFrame({
        "p_at_5": [round(stats.precision_at(5), 6)],
        "p_at_10": [round(stats.precision_at(10), 6)],
        "p_at_20": [round(stats.precision_at(20), 6)],
        "avp": [round(stats.avp(), 6)],
        "recall": [round(stats.recall, 6)],
        "mrr": [round(stats.mrr, 6)],
        "num_good": pd.Series([int(stats.num_good_points)], dtype="int64"),
    })


def quality_eval_oracle_sql(k: int = QUALITY_K) -> str:
    return f"""
        WITH {bm25_scored_cte(("merge",))},
        ranked AS (SELECT doc_id,
                          row_number() OVER (ORDER BY score DESC,
                                             doc_id ASC) AS r
                   FROM scored QUALIFY r <= {k}),
        j AS (SELECT r, (doc_id % {QUALITY_MOD} = 0)::INT AS rel,
                     SUM((doc_id % {QUALITY_MOD} = 0)::INT)
                       OVER (ORDER BY r) AS cum
              FROM ranked),
        mg AS (SELECT count(*) AS maxgood FROM documents
               WHERE doc_id % {QUALITY_MOD} = 0)
        SELECT
          round((SELECT cum / 5.0 FROM j WHERE r = 5), 6) AS p_at_5,
          round((SELECT cum / 10.0 FROM j WHERE r = 10), 6) AS p_at_10,
          round((SELECT cum / 20.0 FROM j WHERE r = 20), 6) AS p_at_20,
          round((SELECT sum(rel * cum / (1.0 * r)) FROM j)
                / (SELECT maxgood FROM mg), 6) AS avp,
          round((SELECT max(cum) FROM j)
                / (1.0 * (SELECT maxgood FROM mg)), 6) AS recall,
          round(coalesce((SELECT CASE WHEN min(r) <= 5 THEN 1.0 / min(r)
                                      ELSE 0 END
                          FROM j WHERE rel = 1), 0), 6) AS mrr,
          (SELECT max(cum) FROM j)::BIGINT AS num_good"""


def index_expr_oracle_sql(k: int = EXPR_K) -> str:
    return f"""
        WITH {bm25_scored_cte(BM25_SQL_TERMS)},
        fn AS (SELECT doc_id, score * 2 + ln(1 + doc_id % 5) AS fscore
               FROM scored)
        SELECT row_number() OVER (ORDER BY fscore DESC, doc_id ASC)::BIGINT AS rank,
               printf('conv-%08d', doc_id // 5) AS conv_id,
               (doc_id % 5)::BIGINT AS turn_idx,
               round(fscore, 4) AS score
        FROM fn ORDER BY fscore DESC, doc_id ASC LIMIT {k}"""


MLT_DOC_ID = 0
MLT_K = 10
MLT_MAX_TERMS = 25
MLT_MIN_TF = 2
MLT_MIN_DF = 5


def index_mlt_topk(sf_dir: str, k: int = MLT_K) -> pd.DataFrame:
    """MoreLikeThis: interesting terms (tf >= 2, df >= 5, top-25 by
    tf * classic idf) from the text of doc MLT_DOC_ID, searched as a SHOULD
    BooleanQuery with BM25 — the whole select-then-search chain is
    SQL-value-checked.  (rank, conv_id, turn_idx, score 4dp)."""
    import pyarrow.parquet as pq

    from ..search.searcher import more_like_this

    text = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"],
                         filters=[("doc_id", "=", MLT_DOC_ID)]) \
        .column("text")[0].as_py()
    searcher = IndexSearcher(build_transcript_index(sf_dir))
    q = more_like_this(searcher, text, max_query_terms=MLT_MAX_TERMS,
                       min_term_freq=MLT_MIN_TF, min_doc_freq=MLT_MIN_DF)
    td = searcher.search(q, k=k)
    rows = [(r, h.conv_id, int(h.turn_idx), round(float(h.score), 4))
            for r, h in enumerate(td.hits, 1)]
    return pd.DataFrame(rows, columns=["rank", "conv_id", "turn_idx", "score"]) \
        .astype({"rank": "int64", "turn_idx": "int64"})


def index_mlt_oracle_sql(k: int = MLT_K) -> str:
    return f"""
        WITH toklists AS (
          SELECT doc_id, list_transform(regexp_extract_all(text, '[A-Za-z0-9]+'),
                                        x -> lower(x)) AS toks
          FROM documents),
        tokens AS (SELECT doc_id, unnest(toks) AS term FROM toklists),
        normmap(n, dec) AS (VALUES {_normmap_values()}),
        dl AS (SELECT t.doc_id, len(t.toks) AS raw_dl, m.dec AS dl
               FROM toklists t JOIN normmap m ON m.n = len(t.toks)),
        stats AS (SELECT count(*) AS n_docs,
                         sum(raw_dl) * 1.0 / count(*) AS avgdl FROM dl),
        liketf AS (SELECT term, count(*) AS tf FROM tokens
                   WHERE doc_id = {MLT_DOC_ID} GROUP BY term),
        dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM tokens
                GROUP BY term),
        interesting AS (
          SELECT l.term FROM liketf l JOIN dft d USING (term), stats s
          WHERE l.tf >= {MLT_MIN_TF} AND d.df >= {MLT_MIN_DF}
          ORDER BY l.tf * (ln((s.n_docs + 1.0) / (d.df + 1.0)) + 1.0) DESC,
                   l.term ASC
          LIMIT {MLT_MAX_TERMS}),
        tfq AS (SELECT t.doc_id, t.term, count(*) AS tf FROM tokens t
                JOIN interesting USING (term) GROUP BY t.doc_id, t.term),
        scored AS (
          SELECT tfq.doc_id,
                 sum(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                     * tfq.tf / (tfq.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS score
          FROM tfq JOIN dft d USING (term)
          JOIN dl ON dl.doc_id = tfq.doc_id, stats s
          GROUP BY tfq.doc_id)
        SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
               printf('conv-%08d', doc_id // 5) AS conv_id,
               (doc_id % 5)::BIGINT AS turn_idx,
               round(score, 4) AS score
        FROM scored ORDER BY score DESC, doc_id ASC LIMIT {k}"""


CONV_JOIN_K = 10


def index_conv_topk(sf_dir: str, k: int = CONV_JOIN_K) -> pd.DataFrame:
    """Parent/child block join: top-k CONVERSATIONS by the max BM25 score of
    their matching turns for the reference term pair (ToParentBlockJoinQuery
    with ScoreMode.Max), SQL-value-checked.  (rank, conv_id, score 4dp)."""
    from ..search.query import ToParentBlockJoinQuery

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    q = ToParentBlockJoinQuery(bool_query(should=list(BM25_SQL_TERMS)),
                               score_mode="max")
    td = searcher.search(q, k=k)
    rows = [(r, h.conv_id, round(float(h.score), 4))
            for r, h in enumerate(td.hits, 1)]
    return pd.DataFrame(rows, columns=["rank", "conv_id", "score"]) \
        .astype({"rank": "int64"})


def index_conv_children_count(sf_dir: str) -> pd.DataFrame:
    """Parent→child block join (ToChildBlockJoinQuery): count of live turns
    belonging to conversations that contain a '+merge +join' turn."""
    from ..search.query import ToChildBlockJoinQuery

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    n = searcher.count(ToChildBlockJoinQuery(
        bool_query(must=["merge", "join"])))
    return pd.DataFrame({"n_matching": pd.Series([n], dtype="int64")})


TS_BASE = 1_700_000_000_000_000
RG_LO = TS_BASE + 100 * 1_000_000
RG_WIDTH = 100 * 1_000_000
RG_HI = RG_LO + 3 * RG_WIDTH
RG_GROUPS, RG_DOCS_PER = 5, 2


def index_range_grouped_topk(sf_dir: str) -> pd.DataFrame:
    """GroupingSearch with LongRangeGroupSelector + LongRangeFactory: BM25
    over the reference terms, grouped into fixed-width ts ranges (with the
    factory's open below-min / above-max buckets), top RG_DOCS_PER docs per
    group; SQL twin buckets the scored CTE with the same factory arithmetic.
    (group_rank, range_lo, range_hi, doc_rank, conv_id, turn_idx, score)."""
    from ..search.grouping import range_grouped_search

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    groups = range_grouped_search(
        searcher, bool_query(should=list(BM25_SQL_TERMS)), "ts",
        RG_LO, RG_WIDTH, RG_HI, n_groups=RG_GROUPS,
        docs_per_group=RG_DOCS_PER)
    rows = []
    for grank, ((lo, hi), _best, hits) in enumerate(groups, start=1):
        for drank, h in enumerate(hits, start=1):
            rows.append((grank, lo, hi, drank, h.conv_id, int(h.turn_idx),
                         round(float(h.score), 4)))
    return pd.DataFrame(rows, columns=["group_rank", "range_lo", "range_hi",
                                       "doc_rank", "conv_id", "turn_idx",
                                       "score"]) \
        .astype({"group_rank": "int64", "range_lo": "int64",
                 "range_hi": "int64", "doc_rank": "int64",
                 "turn_idx": "int64"})


def index_range_grouped_oracle_sql() -> str:
    from ..search.grouping import LONG_MAX, LONG_MIN

    lo, w, hi = RG_LO, RG_WIDTH, RG_HI
    return f"""
        WITH {bm25_scored_cte(BM25_SQL_TERMS)},
        v AS (SELECT doc_id, score,
                     {TS_BASE} + doc_id * 1000000 AS ts FROM scored),
        b AS (SELECT doc_id, score,
                 CASE WHEN ts < {lo} THEN {LONG_MIN}
                      WHEN ts >= {hi} THEN {hi}
                      ELSE {lo} + ((ts - {lo}) // {w}) * {w} END AS rlo,
                 CASE WHEN ts < {lo} THEN {lo}
                      WHEN ts >= {hi} THEN {LONG_MAX}
                      ELSE {lo} + ((ts - {lo}) // {w}) * {w} + {w} END AS rhi
              FROM v),
        docs_ranked AS (
          SELECT *, row_number() OVER (PARTITION BY rlo
                                       ORDER BY score DESC, doc_id ASC) AS doc_rank
          FROM b),
        grp AS (
          SELECT rlo, row_number() OVER (ORDER BY score DESC, doc_id ASC,
                                         rlo ASC) AS group_rank
          FROM docs_ranked WHERE doc_rank = 1)
        SELECT g.group_rank::BIGINT AS group_rank, d.rlo::BIGINT AS range_lo,
               d.rhi::BIGINT AS range_hi, d.doc_rank::BIGINT AS doc_rank,
               printf('conv-%08d', d.doc_id // 5) AS conv_id,
               (d.doc_id % 5)::BIGINT AS turn_idx, round(d.score, 4) AS score
        FROM docs_ranked d JOIN grp g USING (rlo)
        WHERE d.doc_rank <= {RG_DOCS_PER} AND g.group_rank <= {RG_GROUPS}
        ORDER BY g.group_rank, d.doc_rank"""


def index_group_facets(sf_dir: str) -> pd.DataFrame:
    """TermGroupFacetCollector: per role facet value, the number of DISTINCT
    conversations (groups) with >=1 matching turn carrying it — not a doc
    count.  (role, n_groups) ordered count desc, value asc."""
    from ..search.grouping import group_facets

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    res = group_facets(searcher, bool_query(should=list(BM25_SQL_TERMS)),
                       "role")
    return pd.DataFrame(res["entries"], columns=["role", "n_groups"]) \
        .astype({"n_groups": "int64"})


def index_group_facets_oracle_sql() -> str:
    terms = " OR ".join(f"list_contains(toks, '{t}')" for t in BM25_SQL_TERMS)
    return f"""
        WITH toklists AS (
          SELECT doc_id, list_transform(regexp_extract_all(text, '[A-Za-z0-9]+'),
                                        x -> lower(x)) AS toks
          FROM documents),
        m AS (SELECT DISTINCT doc_id // 5 AS conv,
                     ['user','assistant','system','tool'][doc_id % 4 + 1] AS role
              FROM toklists WHERE {terms})
        SELECT role, count(*)::BIGINT AS n_groups FROM m GROUP BY role
        ORDER BY n_groups DESC, role ASC"""


BG_GROUPS, BG_DOCS_PER = 8, 2


def index_block_grouped_topk(sf_dir: str) -> pd.DataFrame:
    """BlockGroupingCollector: grouped top-k where groups are the index's
    contiguous conversation blocks (no group-field lookup at all), top
    BG_DOCS_PER turns per conversation.  (group_rank, conv_id, doc_rank,
    turn_idx, score 4dp)."""
    from ..search.grouping import block_grouped_search

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    groups = block_grouped_search(
        searcher, bool_query(should=list(BM25_SQL_TERMS)),
        n_groups=BG_GROUPS, docs_per_group=BG_DOCS_PER)
    rows = []
    for grank, (cid, _best, hits) in enumerate(groups, start=1):
        for drank, h in enumerate(hits, start=1):
            rows.append((grank, cid, drank, int(h.turn_idx),
                         round(float(h.score), 4)))
    return pd.DataFrame(rows, columns=["group_rank", "conv_id", "doc_rank",
                                       "turn_idx", "score"]) \
        .astype({"group_rank": "int64", "doc_rank": "int64",
                 "turn_idx": "int64"})


def index_block_grouped_oracle_sql() -> str:
    return f"""
        WITH {bm25_scored_cte(BM25_SQL_TERMS)},
        docs_ranked AS (
          SELECT *, row_number() OVER (PARTITION BY doc_id // 5
                                       ORDER BY score DESC, doc_id ASC) AS doc_rank
          FROM scored),
        grp AS (
          SELECT doc_id // 5 AS conv,
                 row_number() OVER (ORDER BY score DESC, doc_id ASC) AS group_rank
          FROM docs_ranked WHERE doc_rank = 1)
        SELECT g.group_rank::BIGINT AS group_rank,
               printf('conv-%08d', d.doc_id // 5) AS conv_id,
               d.doc_rank::BIGINT AS doc_rank,
               (d.doc_id % 5)::BIGINT AS turn_idx, round(d.score, 4) AS score
        FROM docs_ranked d JOIN grp g ON g.conv = d.doc_id // 5
        WHERE d.doc_rank <= {BG_DOCS_PER} AND g.group_rank <= {BG_GROUPS}
        ORDER BY g.group_rank, d.doc_rank"""


MS_K = 15


def index_multi_sorted_topk(sf_dir: str) -> pd.DataFrame:
    """Multi-field Sort (Sort over SortField[]): docs matching the reference
    term ordered by (turn_idx asc, ts desc), docID tie — the N-key
    TopFieldCollector comparator.  (rank, conv_id, turn_idx, ts_us)."""
    from ..search.query import SortField, TermQuery

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    td = searcher.search(TermQuery(BM25_SQL_TERMS[0]), k=MS_K,
                         sort=[SortField("turn_idx"),
                               SortField("ts", reverse=True)])
    rows = [(r, h.conv_id, int(h.fields[0]), int(h.fields[1]))
            for r, h in enumerate(td.hits, 1)]
    return pd.DataFrame(rows, columns=["rank", "conv_id", "turn_idx",
                                       "ts_us"]) \
        .astype({"rank": "int64", "turn_idx": "int64", "ts_us": "int64"})


def index_multi_sorted_oracle_sql() -> str:
    t = BM25_SQL_TERMS[0]
    return f"""
        WITH toklists AS (
          SELECT doc_id, list_transform(regexp_extract_all(text, '[A-Za-z0-9]+'),
                                        x -> lower(x)) AS toks
          FROM documents)
        SELECT row_number() OVER (ORDER BY doc_id % 5 ASC,
                                  {TS_BASE} + doc_id * 1000000 DESC,
                                  doc_id ASC)::BIGINT AS rank,
               printf('conv-%08d', doc_id // 5) AS conv_id,
               (doc_id % 5)::BIGINT AS turn_idx,
               ({TS_BASE} + doc_id * 1000000)::BIGINT AS ts_us
        FROM toklists WHERE list_contains(toks, '{t}')
        ORDER BY turn_idx ASC, ts_us DESC, doc_id ASC LIMIT {MS_K}"""


def index_dv_facets(sf_dir: str) -> pd.DataFrame:
    """LongValueFacetCounts over the turn_idx doc-values column for docs
    matching the reference term: (turn_idx, n_docs) in value order."""
    from ..search.query import TermQuery
    from ..search.searcher import dv_value_facets

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    out = dv_value_facets(searcher, TermQuery(BM25_SQL_TERMS[0]), "turn_idx")
    return pd.DataFrame(out, columns=["turn_idx", "n_docs"]) \
        .astype({"turn_idx": "int64", "n_docs": "int64"})


def index_dv_facets_oracle_sql() -> str:
    t = BM25_SQL_TERMS[0]
    return f"""
        WITH toklists AS (
          SELECT doc_id, list_transform(regexp_extract_all(text, '[A-Za-z0-9]+'),
                                        x -> lower(x)) AS toks
          FROM documents)
        SELECT (doc_id % 5)::BIGINT AS turn_idx, count(*)::BIGINT AS n_docs
        FROM toklists WHERE list_contains(toks, '{t}')
        GROUP BY doc_id % 5 ORDER BY turn_idx"""


BJS_K = 12


def index_block_join_sorted(sf_dir: str) -> pd.DataFrame:
    """ToParentBlockJoinSortField through the driver gate: conversations
    with a turn matching the reference terms, ranked by the MAX ts of their
    MATCHING turns (BlockJoinSelector.MAX over the childFilter set), ties
    to the lower conv.  (rank, conv_id, max_ts)."""
    from ..search.grouping import block_join_sorted_search

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    rows = block_join_sorted_search(
        searcher, bool_query(should=list(BM25_SQL_TERMS)), "ts",
        selector="max", k=BJS_K, reverse=True)
    return pd.DataFrame(
        [(r, c, v) for r, (c, v, _g) in enumerate(rows, 1)],
        columns=["rank", "conv_id", "max_ts"]) \
        .astype({"rank": "int64", "max_ts": "int64"})


def index_block_join_sorted_oracle_sql() -> str:
    terms = " OR ".join(f"list_contains(toks, '{t}')" for t in BM25_SQL_TERMS)
    return f"""
        WITH toklists AS (
          SELECT doc_id, list_transform(regexp_extract_all(text, '[A-Za-z0-9]+'),
                                        x -> lower(x)) AS toks
          FROM documents),
        m AS (SELECT doc_id // 5 AS conv,
                     max({TS_BASE} + doc_id * 1000000) AS max_ts,
                     min(doc_id) AS rep
              FROM toklists WHERE {terms} GROUP BY doc_id // 5)
        SELECT row_number() OVER (ORDER BY max_ts DESC, rep ASC)::BIGINT AS rank,
               printf('conv-%08d', conv) AS conv_id, max_ts::BIGINT AS max_ts
        FROM m ORDER BY max_ts DESC, rep ASC LIMIT {BJS_K}"""


CFQ_TERMS = ("user", "merge")       # 'user' is both a text token and a role
CFQ_W_TEXT, CFQ_W_ROLE = 1.0, 2.0
CFQ_K = 15


def _combined_normmap_values(w_text: float, w_kw: float) -> str:
    """VALUES list (raw text length -> decoded COMBINED length): the
    MultiNormsLeafSimScorer composition decode -> weighted sum -> round ->
    re-encode -> decode, precomputed for every length this corpus can hit."""
    import numpy as np

    from ..util.smallfloat import LENGTH_TABLE, int_to_byte4

    pairs = []
    for n in range(0, 1025):
        dec_text = float(LENGTH_TABLE[int(int_to_byte4(np.int64(n)))])
        combined = w_text * dec_text + w_kw * 1.0
        b = int(int_to_byte4(np.int64(int(np.floor(combined + 0.5)))))
        pairs.append(f"({n},{float(LENGTH_TABLE[b])})")
    return ",".join(pairs)


def index_combined_topk(sf_dir: str) -> pd.DataFrame:
    """CombinedFieldQuery (sandbox BM25F) through the driver gate: 'text'
    blended with the 'role' keyword field at weight 2 — a term that is also
    a role value scores role occurrences into the combined tf, and every
    doc's norm grows by the role weight.  The DuckDB twin recomputes the
    blended stats, combined tf and the re-encoded combined norm from raw
    text + the deterministic doc->role mapping.
    (rank, conv_id, turn_idx, score 4dp)."""
    from ..search.query import CombinedFieldQuery

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    q = CombinedFieldQuery(CFQ_TERMS, (("text", CFQ_W_TEXT),
                                       ("role", CFQ_W_ROLE)))
    td = searcher.search(q, k=CFQ_K)
    rows = [(r, h.conv_id, int(h.turn_idx), round(float(h.score), 4))
            for r, h in enumerate(td.hits, 1)]
    return pd.DataFrame(rows, columns=["rank", "conv_id", "turn_idx", "score"]) \
        .astype({"rank": "int64", "turn_idx": "int64"})


def index_combined_oracle_sql() -> str:
    cmap = _combined_normmap_values(CFQ_W_TEXT, CFQ_W_ROLE)
    wt, wr = CFQ_W_TEXT, CFQ_W_ROLE
    df_rows = " UNION ALL ".join(f"""
        SELECT '{t}' AS term, greatest(
          (SELECT count(*) FROM toklists WHERE list_contains(toks, '{t}')),
          (SELECT count(*) FROM base WHERE role = '{t}')) AS df"""
                                 for t in CFQ_TERMS)
    tf_rows = " UNION ALL ".join(f"""
        SELECT b.doc_id, '{t}' AS term,
               {wt} * len(list_filter(t.toks, x -> x = '{t}'))
               + {wr} * (CASE WHEN b.role = '{t}' THEN 1 ELSE 0 END) AS tfc
        FROM base b JOIN toklists t USING (doc_id)""" for t in CFQ_TERMS)
    return f"""
        WITH toklists AS (
          SELECT doc_id, list_transform(regexp_extract_all(text, '[A-Za-z0-9]+'),
                                        x -> lower(x)) AS toks
          FROM documents),
        cmap(n, dec) AS (VALUES {cmap}),
        base AS (
          SELECT t.doc_id, len(t.toks) AS rawlen,
                 ['user','assistant','system','tool'][t.doc_id % 4 + 1] AS role
          FROM toklists t),
        stats AS (
          SELECT greatest((SELECT count(*) FROM base WHERE rawlen > 0),
                          (SELECT count(*) FROM base)) AS n_docs,
                 round({wt} * (SELECT sum(rawlen) FROM base)
                       + {wr} * (SELECT count(*) FROM base)) AS sttf),
        dfs AS ({df_rows}),
        tf AS ({tf_rows}),
        scored AS (
          SELECT tf.doc_id,
                 sum(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                     * tf.tfc / (tf.tfc + 1.2 * (1 - 0.75 + 0.75 * m.dec
                                 / (s.sttf * 1.0 / s.n_docs)))) AS score
          FROM tf
          JOIN dfs d ON d.term = tf.term
          JOIN base b ON b.doc_id = tf.doc_id
          JOIN cmap m ON m.n = b.rawlen, stats s
          WHERE tf.tfc > 0
          GROUP BY tf.doc_id)
        SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
               printf('conv-%08d', doc_id // 5) AS conv_id,
               (doc_id % 5)::BIGINT AS turn_idx,
               round(score, 4) AS score
        FROM scored ORDER BY score DESC, doc_id ASC LIMIT {CFQ_K}"""


FLT_STRING = "vectr merge"          # one misspelled + one indexed source term
FLT_EDITS, FLT_PREFIX, FLT_MAXTERMS, FLT_K = 1, 1, 8, 15


def index_flt_topk(sf_dir: str) -> pd.DataFrame:
    """FuzzyLikeThisQuery end-to-end through the driver gate: fuzzify the
    source string (one misspelling, one real term), select the top variants
    (similarity^2 x classic idf of the SOURCE df, avg-variant df for the
    unindexed source), score with artificial df=1 stats.  The DuckDB twin
    recomputes the whole chain — damerau_levenshtein() variant expansion
    (FuzzyLikeThisQuery.java:213-214 transpositions=true), the
    ScoreTermQueue ordering, and the df=1 BM25 — from the raw text.
    (rank, conv_id, turn_idx, score 4dp)."""
    from ..search.query import FuzzyLikeThisQuery

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    q = FuzzyLikeThisQuery(((FLT_STRING, FLT_EDITS, FLT_PREFIX),),
                           max_num_terms=FLT_MAXTERMS)
    td = searcher.search(q, k=FLT_K)
    rows = [(r, h.conv_id, int(h.turn_idx), round(float(h.score), 4))
            for r, h in enumerate(td.hits, 1)]
    return pd.DataFrame(rows, columns=["rank", "conv_id", "turn_idx", "score"]) \
        .astype({"rank": "int64", "turn_idx": "int64"})


def index_flt_oracle_sql() -> str:
    sources = FLT_STRING.split()
    qmap = _normmap_values()
    src_rows = ", ".join(
        f"('{s}', '{s[:FLT_PREFIX]}%', {len(s)})" for s in sources)
    return f"""
        WITH toklists AS (
          SELECT doc_id, list_transform(regexp_extract_all(text, '[A-Za-z0-9]+'),
                                        x -> lower(x)) AS toks
          FROM documents),
        normmap(n, dec) AS (VALUES {qmap}),
        dl AS (SELECT t.doc_id, len(t.toks) AS raw_dl, m.dec AS dl
               FROM toklists t JOIN normmap m ON m.n = len(t.toks)),
        stats AS (SELECT count(*) AS n_docs,
                         sum(raw_dl) * 1.0 / count(*) AS avgdl FROM dl),
        vocab AS (
          SELECT term, count(DISTINCT doc_id) AS df
          FROM (SELECT doc_id, unnest(toks) AS term FROM toklists)
          GROUP BY term),
        src(s, pre, slen) AS (VALUES {src_rows}),
        variants AS (
          SELECT src.s, v.term, v.df,
                 damerau_levenshtein(v.term, src.s) AS ed,
                 CASE WHEN v.term = src.s THEN 1.0
                      ELSE 1.0 - damerau_levenshtein(v.term, src.s) * 1.0 /
                           least(length(v.term), src.slen) END AS sim
          FROM src JOIN vocab v ON v.term LIKE src.pre
          WHERE damerau_levenshtein(v.term, src.s) <= {FLT_EDITS}),
        kept AS (
          SELECT *, row_number() OVER (PARTITION BY s
                                       ORDER BY sim DESC, term ASC) AS vr
          FROM variants),
        srcdf AS (
          SELECT k.s,
                 coalesce((SELECT df FROM vocab WHERE term = k.s),
                          (SELECT sum(df) // count(*) FROM variants
                           WHERE variants.s = k.s)) AS df
          FROM (SELECT DISTINCT s FROM kept) k),
        boosted AS (
          SELECT k.term,
                 k.sim * k.sim *
                 (ln((stats.n_docs + 1) * 1.0 / (sd.df + 1)) + 1.0) AS boost
          FROM kept k JOIN srcdf sd ON sd.s = k.s, stats
          WHERE k.vr <= 50),
        sel AS (
          SELECT term, boost,
                 row_number() OVER (ORDER BY boost DESC, term ASC) AS r
          FROM boosted),
        tf AS (
          SELECT t.doc_id, s.term, s.boost,
                 len(list_filter(t.toks, x -> x = s.term)) AS tf
          FROM toklists t, sel s WHERE s.r <= {FLT_MAXTERMS}),
        scored AS (
          SELECT tf.doc_id,
                 sum(tf.boost * ln(1 + (stats.n_docs - 1 + 0.5) / (1 + 0.5))
                     * tf.tf / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))) AS score
          FROM tf, stats, dl
          WHERE dl.doc_id = tf.doc_id AND tf.tf > 0
          GROUP BY tf.doc_id)
        SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
               printf('conv-%08d', doc_id // 5) AS conv_id,
               (doc_id % 5)::BIGINT AS turn_idx,
               round(score, 4) AS score
        FROM scored ORDER BY score DESC, doc_id ASC LIMIT {FLT_K}"""


JOINUTIL_K = 20
JOINUTIL_COUNT_TERM = "dup"


def index_join_topk(sf_dir: str, k: int = JOINUTIL_K) -> pd.DataFrame:
    """Query-time join (JoinUtil.createJoinQuery, ScoreMode.Max): from turns
    matching the reference term pair, join conv_id→conv_id, return the top-k
    TO-SIDE TURNS scored by their conversation's max from-side BM25 score
    (TermsIncludingScoreQuery semantics — every turn of a matched
    conversation is a hit, not just the matching ones).
    (rank, conv_id, turn_idx, score 4dp)."""
    from ..search.join import join_search

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    td = join_search(searcher, bool_query(should=list(BM25_SQL_TERMS)),
                     "conv_id", "conv_id", score_mode="max", k=k)
    rows = [(r, h.conv_id, int(h.turn_idx), round(float(h.score), 4))
            for r, h in enumerate(td.hits, 1)]
    return pd.DataFrame(rows, columns=["rank", "conv_id", "turn_idx", "score"]) \
        .astype({"rank": "int64", "turn_idx": "int64"})


def index_join_count(sf_dir: str) -> pd.DataFrame:
    """JoinUtil with ScoreMode.None (TermsQuery / constant-score path):
    count of live turns whose conversation contains a turn matching the
    from query."""
    from ..search.join import join_search
    from ..search.query import TermQuery

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    td = join_search(searcher, TermQuery(JOINUTIL_COUNT_TERM),
                     "conv_id", "conv_id", score_mode="none", k=1)
    return pd.DataFrame({"n_joined": pd.Series([td.total_hits], dtype="int64")})


def index_join_oracle_sql(k: int = JOINUTIL_K) -> str:
    return f"""
        WITH {bm25_scored_cte(BM25_SQL_TERMS)},
        conv AS (SELECT doc_id // 5 AS conv, max(score) AS jscore
                 FROM scored GROUP BY doc_id // 5)
        SELECT row_number() OVER (ORDER BY c.jscore DESC, d.doc_id ASC)::BIGINT AS rank,
               printf('conv-%08d', d.doc_id // 5) AS conv_id,
               (d.doc_id % 5)::BIGINT AS turn_idx,
               round(c.jscore, 4) AS score
        FROM documents d JOIN conv c ON d.doc_id // 5 = c.conv
        ORDER BY c.jscore DESC, d.doc_id ASC LIMIT {k}"""


def index_join_count_oracle_sql() -> str:
    t = JOINUTIL_COUNT_TERM
    return f"""
        WITH toklists AS (
          SELECT doc_id, list_transform(regexp_extract_all(text, '[A-Za-z0-9]+'),
                                        x -> lower(x)) AS toks
          FROM documents),
        matched AS (
          SELECT DISTINCT doc_id // 5 AS conv FROM toklists
          WHERE len(list_filter(toks, x -> x = '{t}')) > 0)
        SELECT count(*)::BIGINT AS n_joined
        FROM documents d WHERE d.doc_id // 5 IN (SELECT conv FROM matched)"""


def index_conv_oracle_sql(k: int = CONV_JOIN_K) -> str:
    return f"""
        WITH {bm25_scored_cte(BM25_SQL_TERMS)},
        conv AS (SELECT doc_id // 5 AS conv, max(score) AS score
                 FROM scored GROUP BY doc_id // 5)
        SELECT row_number() OVER (ORDER BY score DESC, conv ASC)::BIGINT AS rank,
               printf('conv-%08d', conv) AS conv_id, round(score, 4) AS score
        FROM conv ORDER BY score DESC, conv ASC LIMIT {k}"""


def index_term_dictionary(sf_dir: str):
    """Global merged term statistics from the index (term, df, ttf) — the
    groupby-on-term shuffle output, SQL-checkable against tokenizing
    documents (ASCII corpus: StandardAnalyzer == simple tokenizer).
    Returned as a streaming Dataset: the stats stay in their bucketed
    parquet files and the keyword-namespace filter runs per batch — the
    driver never concatenates the vocabulary (it is billions of rows at
    the target scale)."""
    import pyarrow.compute as pc
    import ray.data

    from ..index.shard import KEYWORD_SEP

    index_dir = build_transcript_index(sf_dir)

    def _text_terms(t):
        return t.filter(pc.invert(pc.match_substring(
            pc.cast(t.column("term"), "string"), KEYWORD_SEP)))

    return (ray.data.read_parquet(os.path.join(index_dir, "term_stats"),
                                  columns=["term", "df", "ttf"])
            .map_batches(_text_terms, batch_format="pyarrow"))


def _attach_payloads(batch):
    """Transform: every whitespace token gets a deterministic
    ``|((pos % 5) + 1)`` payload suffix (pos = 0-based token index after
    dropping empty tokens), so the DelimitedPayloadTokenFilter path and its
    SQL twin see identical values.  Vectorized over the flat token buffer."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    txt = batch.column("text")
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    lst = pc.split_pattern(pc.fill_null(txt, ""), " ")
    off = lst.offsets.to_numpy()
    flat = lst.flatten()
    keep = pc.not_equal(flat, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    row = np.repeat(np.arange(len(off) - 1, dtype=np.int64), np.diff(off))
    row_k = row[keep_np]
    flat_k = flat.filter(keep)
    # 0-based position within its row = global rank minus the row's first rank
    pos = np.arange(len(row_k), dtype=np.int64) - np.searchsorted(row_k, row_k)
    pay = np.char.add("|", ((pos % 5) + 1).astype("U1"))
    toks = pc.binary_join_element_wise(flat_k, pa.array(pay, type=pa.string()),
                                       "")
    new_off = np.searchsorted(row_k, np.arange(len(off), dtype=np.int64))
    lst2 = pa.ListArray.from_arrays(pa.array(new_off, type=pa.int64())
                                    .cast(pa.int32()), toks)
    joined = pc.binary_join(lst2, " ")
    return batch.set_column(batch.column_names.index("text"), "text",
                            joined.cast(pa.string()))


def _payload_index(sf_dir: str) -> str:
    """Whitespace-tokenized index with delimited payloads (the reference
    pairing — StandardTokenizer would split at the delimiter)."""
    index_dir = index_dir_for(sf_dir) + "-payload"
    ds = transcripts_from_documents(sf_dir) \
        .map_batches(_attach_payloads, batch_format="pyarrow")
    build_index(ds, index_dir, target_docs_per_partition=100_000,
                token_filters=("tokenizer:whitespace", "delimited_payload:|"),
                input_desc=f"documents@{sf_dir}+payload")
    return index_dir


def index_payload_topk(sf_dir: str) -> pd.DataFrame:
    """DelimitedPayloadTokenFilter + PayloadScoreQuery end-to-end
    (`analysis/common/.../payloads/DelimitedPayloadTokenFilter.java:53-70`,
    `queries/payloads/PayloadScoreQuery.java:42-288`): top-k docs by the SUM
    PayloadFunction over 'merge' occurrences — payload values are small
    integers, so the float32 sums are exact and the SQL twin matches
    bit-for-bit.  (rank, conv_id, turn_idx, payload_sum)."""
    from ..search.query import PayloadScoreQuery

    searcher = IndexSearcher(_payload_index(sf_dir))
    td = searcher.search(PayloadScoreQuery("merge", func="sum"), k=20)
    rows = [(r, h.conv_id, int(h.turn_idx), float(h.score))
            for r, h in enumerate(td.hits, 1)]
    return pd.DataFrame(rows, columns=["rank", "conv_id", "turn_idx",
                                       "payload_sum"]) \
        .astype({"rank": "int64", "turn_idx": "int64",
                 "payload_sum": "float64"})


def index_payload_check_count(sf_dir: str) -> pd.DataFrame:
    """SpanPayloadCheckQuery (`queries/payloads/SpanPayloadCheckQuery.java`):
    adjacent 'merge join' spans accepted only when merge's payload equals 2
    (raw token position % 5 == 1), next to the unchecked phrase count."""
    from ..search.query import SpanPayloadCheckQuery

    searcher = IndexSearcher(_payload_index(sf_dir))
    n_checked = searcher.count(
        SpanPayloadCheckQuery(("merge", "join"), (2.0, None), op="eq"))
    n_phrase = searcher.count(
        SpanPayloadCheckQuery(("merge", "join"), (None, None)))
    return pd.DataFrame({"n_checked": pd.Series([n_checked], dtype="int64"),
                         "n_phrase": pd.Series([n_phrase], dtype="int64")})


def index_interval_fn_count(sf_dir: str) -> pd.DataFrame:
    """Interval relation functions through the flexible parser
    (`queries/intervals/Intervals.java:321-497`,
    `queryparser/flexible/standard/nodes/intervalfn/`): notContaining /
    within / notContainedBy counts over the positional postings."""
    from ..search.flexible import parse_flexible

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    n_nc = searcher.count(parse_flexible(
        "fn:notContaining(fn:ordered(merge join) sort)"))
    n_w = searcher.count(parse_flexible("fn:within(merge 3 join)"))
    n_ncb = searcher.count(parse_flexible(
        "fn:notContainedBy(sort fn:ordered(the data))"))
    return pd.DataFrame({
        "n_not_containing": pd.Series([n_nc], dtype="int64"),
        "n_within": pd.Series([n_w], dtype="int64"),
        "n_not_contained_by": pd.Series([n_ncb], dtype="int64")})


def index_all_group_heads(sf_dir: str) -> pd.DataFrame:
    """AllGroupsCollector + AllGroupHeadsCollector
    (`grouping/.../AllGroupsCollector.java`, `AllGroupHeadsCollector.java`):
    every matching group's head doc under a constant-score query — the head
    is the tie-break winner (gid asc), so the SQL twin is min(doc_id) per
    group; n_groups doubles as the AllGroups count."""
    from ..search.query import ConstantScoreQuery, TermQuery
    from ..search.searcher import all_group_heads, all_groups

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    q = ConstantScoreQuery(TermQuery("merge"))
    heads = all_group_heads(searcher, q, "role")
    n_groups = len(all_groups(searcher, q, "role"))
    rows = sorted((v, h.conv_id, int(h.turn_idx), n_groups)
                  for v, h in heads.items())
    return pd.DataFrame(rows, columns=["role", "conv_id", "turn_idx",
                                       "n_groups"]) \
        .astype({"turn_idx": "int64", "n_groups": "int64"})


def index_term_range_count(sf_dir: str) -> pd.DataFrame:
    """TermRangeQuery (`search/TermRangeQuery.java`): lexicographic
    dictionary ranges with inclusive/exclusive bounds, expanded per shard
    (no global dictionary)."""
    from ..search.query import TermRangeQuery

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    n_incl = searcher.count(TermRangeQuery("merge", "sort"))
    n_excl = searcher.count(TermRangeQuery("merge", "sort",
                                           include_lower=False,
                                           include_upper=False))
    return pd.DataFrame({"n_incl": pd.Series([n_incl], dtype="int64"),
                         "n_excl": pd.Series([n_excl], dtype="int64")})


def index_expr_range_count(sf_dir: str) -> pd.DataFrame:
    """FunctionRangeQuery on the expressions engine
    (`queries/function/FunctionRangeQuery.java`): docs whose doc-values
    expression value falls in a range, constant score."""
    from ..search.query import ExpressionRangeQuery

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    expr = "ln(1 + turn_idx) + ts / 100000000000000000"
    n = searcher.count(ExpressionRangeQuery(expr, 0.5, 1.5))
    return pd.DataFrame({"n_matching": pd.Series([n], dtype="int64")})


def index_dv_stats(sf_dir: str) -> pd.DataFrame:
    """DocValuesStatsCollector (`misc/.../search/DocValuesStats.java`):
    numeric doc-values statistics over the matches of a term query; values
    rounded to 6dp so the SQL twin's avg/var_pop/stddev_pop compare exactly
    on these small-integer values."""
    from ..search.query import TermQuery
    from ..search.searcher import dv_stats

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    st = dv_stats(searcher, TermQuery("merge"), "turn_idx")
    return pd.DataFrame({
        "n_count": pd.Series([st["count"]], dtype="int64"),
        "v_min": pd.Series([int(st["min"])], dtype="int64"),
        "v_max": pd.Series([int(st["max"])], dtype="int64"),
        "v_sum": pd.Series([int(st["sum"])], dtype="int64"),
        "v_mean": pd.Series([round(st["mean"], 6)], dtype="float64"),
        "v_var": pd.Series([round(st["variance"], 6)], dtype="float64"),
        "v_stdev": pd.Series([round(st["stdev"], 6)], dtype="float64")})


INDRI_CLAUSES = (("merge", 1.0), ("join", 2.0))
INDRI_MU = 2000.0


def index_indri_topk(sf_dir: str) -> pd.DataFrame:
    """IndriAndQuery through the index (`search/IndriAndQuery.java` +
    IndriDirichletSimilarity): boost-weighted average of per-clause
    Dirichlet log-probabilities with smoothing for absent clauses; SQL
    twin recomputes the whole chain incl. the SmallFloat norm
    quantization.  (rank, conv_id, turn_idx, score 4dp)."""
    from ..search.query import IndriAndQuery, TermQuery

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    q = IndriAndQuery(tuple(TermQuery(t, boost=b) for t, b in INDRI_CLAUSES),
                      mu=INDRI_MU)
    td = searcher.search(q, k=BM25_SQL_K)
    rows = [(r, h.conv_id, int(h.turn_idx), round(float(h.score), 4))
            for r, h in enumerate(td.hits, 1)]
    return pd.DataFrame(rows, columns=["rank", "conv_id", "turn_idx", "score"]) \
        .astype({"rank": "int64", "turn_idx": "int64"})


def index_indri_oracle_sql() -> str:
    """DuckDB twin of index_indri_topk: p_w = ttf/sum_ttf over RAW token
    counts (the engine's global term stats), doc length from the embedded
    SmallFloat quantization map, score = Σ boost·ln((tf + μ·p_w)/(dl + μ))
    / Σ boost over docs matching ≥1 clause."""
    qmap = _normmap_values()
    mu = INDRI_MU
    tf_cols = ", ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf_{i}"
        for i, (t, _) in enumerate(INDRI_CLAUSES))
    pw = ", ".join(
        f"(SELECT greatest(sum(tf_{i}), 1) * 1.0 FROM tf) / "
        f"(SELECT sum(len(toks)) * 1.0 FROM toklists) AS pw_{i}"
        for i, _ in enumerate(INDRI_CLAUSES))
    boost_sum = sum(b for _, b in INDRI_CLAUSES)
    score = " + ".join(
        f"{b} * ln((tf.tf_{i} + {mu} * pw.pw_{i}) / (dl.dl + {mu}))"
        for i, (_, b) in enumerate(INDRI_CLAUSES))
    anymatch = " OR ".join(f"tf.tf_{i} > 0"
                           for i, _ in enumerate(INDRI_CLAUSES))
    return f"""
        WITH toklists AS (
          SELECT doc_id, list_transform(regexp_extract_all(text, '[A-Za-z0-9]+'),
                                        x -> lower(x)) AS toks
          FROM documents),
        normmap(n, dec) AS (VALUES {qmap}),
        dl AS (SELECT t.doc_id, m.dec AS dl
               FROM toklists t JOIN normmap m ON m.n = len(t.toks)),
        tf AS (SELECT doc_id, {tf_cols} FROM toklists),
        pw AS (SELECT {pw}),
        scored AS (
          SELECT tf.doc_id, ({score}) / {boost_sum} AS score
          FROM tf, pw, dl WHERE tf.doc_id = dl.doc_id AND ({anymatch}))
        SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
               printf('conv-%08d', doc_id // 5) AS conv_id,
               (doc_id % 5)::BIGINT AS turn_idx,
               round(score, 4) AS score
        FROM scored ORDER BY score DESC, doc_id ASC LIMIT {BM25_SQL_K}"""


def index_matchhl_topk(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """MatchHighlighter through the driver gate: docs containing 'merge'
    ordered by turn_idx DESC / gid ASC (the sorted-top-k path); snippet =
    the Matches-API-driven highlighter (`search/matchhighlight.py`) with an
    unbounded passage window, so the formatted value is the full turn text
    with every 'merge' TOKEN occurrence wrapped in >..< — exact in SQL as a
    word-boundary regexp_replace.  (rank, conv_id, turn_idx, snippet)."""
    import numpy as np
    import pyarrow.parquet as pq

    from ..search.matchhighlight import (
        MatchHighlighter,
        PassageFormatter,
        highlighted,
        skip_remaining,
    )
    from ..search.query import SortField, TermQuery
    from ..sources.transcripts import TURNS_PER_CONV

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    q = TermQuery("merge")
    td = searcher.search(q, k=k, sort=SortField("turn_idx", reverse=True))
    doc_ids = [int(h.conv_id[5:]) * TURNS_PER_CONV + int(h.turn_idx)
               for h in td.hits]
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"],
                      filters=[("doc_id", "in", list(set(doc_ids)))])
    texts = dict(zip(t.column("doc_id").to_pylist(),
                     t.column("text").to_pylist()))
    by_gid = {h.gid: texts[d] for h, d in zip(td.hits, doc_ids)}

    mh = MatchHighlighter(searcher, lambda gid: {"text": by_gid[gid]})
    mh.append_field_highlighter(
        highlighted(1 << 28, 1, PassageFormatter("...", ">", "<"),
                    {"text"}))
    mh.append_field_highlighter(skip_remaining())
    out = mh.highlight([h.gid for h in td.hits], q)
    rows = [(r, h.conv_id, int(h.turn_idx),
             "".join(res["fields"].get("text", [])))
            for r, (h, res) in enumerate(zip(td.hits, out), start=1)]
    return pd.DataFrame(rows, columns=["rank", "conv_id", "turn_idx",
                                       "snippet"]).astype(
        {"rank": "int64", "turn_idx": "int64"})


def index_precedence_count(sf_dir: str) -> pd.DataFrame:
    """PrecedenceQueryParser end-to-end through the driver gate:
    ``merge AND join OR sort AND scan`` groups as
    (+merge +join) (+sort +scan) — AND binds tighter than OR
    (`queryparser/flexible/precedence/PrecedenceQueryParser.java`).
    SQL twin = the literal set algebra.  (n_matching)."""
    from ..search.query import parse_precedence

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    n = searcher.count(parse_precedence("merge AND join OR sort AND scan"))
    return pd.DataFrame({"n_matching": pd.Series([n], dtype="int64")})


def index_classic_ops_count(sf_dir: str) -> pd.DataFrame:
    """Classic-parser boolean operators end-to-end through the driver gate:
    ``merge AND join NOT scan`` (addClause semantics: +merge +join -scan)
    counted via the index; SQL twin = the literal set algebra.
    (n_matching)."""
    from ..search.query import parse_classic

    searcher = IndexSearcher(build_transcript_index(sf_dir))
    n = searcher.count(parse_classic("merge AND join NOT scan"))
    return pd.DataFrame({"n_matching": pd.Series([n], dtype="int64")})
