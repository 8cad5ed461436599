"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in lucene_ray) calls ray.init()/ray.shutdown().

- ``entry()`` — flagship: documents(sf0.001) → transcripts → inverted-index
  build (Ray pipeline, lineage manifests) → BM25 reference query set.
- ``queries()`` — one callable per implemented operator/pipeline
  (SURVEY.md §2 + the training-data operators); each takes sf_dir.
- ``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible entry
  (same column names; index/BM25-engine internals and approximate/LSH ops
  are rows-only).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_EN_STOP = "'the','and','of','to','a','in','is','it','that','for'"
_DE_STOP = "'der','die','das','und','ist','nicht','ein','mit','auf','zu'"
_FR_STOP = "'le','la','les','et','est','un','une','dans','pour','que'"

# tokens CTE shared by the text oracles (simple tokenizer == StandardAnalyzer
# on this pure-lowercase-ASCII corpus)
_TOKS = ("WITH toklists AS (SELECT doc_id, list_transform(regexp_extract_all(text, "
         "'[A-Za-z0-9]+'), x -> lower(x)) AS toks FROM documents), "
         "tokens AS (SELECT doc_id, unnest(toks) AS term FROM toklists)")


def entry() -> Any:
    from lucene_ray.pipelines.flagship import index_bm25_topk

    return index_bm25_topk("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from lucene_ray.pipelines import bm25scan, dedup, knn, textstats, windows
    from lucene_ray.pipelines.flagship import index_bm25_topk, index_term_dictionary

    return {
        # Ordering note: the external driver's correctness gate covers the
        # FIRST 50 entries. Round-5 rotation (VERDICT r4 #1): the window now
        # holds the 48 highest-value entries that had never had a driver-green
        # row through r04 (40 SQL-exact + 8 deterministic rows-only), anchored
        # by index_term_dictionary and the SQL-exact flagship twin. Every
        # entry, in or out of the window, is still checked by
        # tools/check_oracles.py at sf0.01 and sf0.1 before each close.
        "index_term_dictionary": index_term_dictionary,
        "index_bm25_sql_topk": _index_bm25_sql_topk,
        "index_classic_ops_count": _lazy("index_classic_ops_count"),
        "index_combined_topk": _lazy("index_combined_topk"),
        "index_join_topk": _lazy("index_join_topk"),
        "index_join_count": _lazy("index_join_count"),
        "index_block_grouped_topk": _lazy("index_block_grouped_topk"),
        "index_multi_sorted_topk": _lazy("index_multi_sorted_topk"),
        "index_flt_topk": _lazy("index_flt_topk"),
        "index_ssdv_facets": _lazy("index_ssdv_facets"),
        "suggest_fuzzy": _suggest_fuzzy,
        "suggest_blended": _suggest_blended,
        "sample_mixture": textstats.sample_mixture,
        "cap_per_source": textstats.cap_per_source,
        "index_matchhl_topk": _lazy("index_matchhl_topk"),
        "index_sorted_set_topk": _lazy("index_sorted_set_topk"),
        "index_multivalue_range_count": _lazy("index_multivalue_range_count"),
        "index_charfilter_count": _lazy("index_charfilter_count"),
        "index_synonym_count": _lazy("index_synonym_count"),
        "index_shingle_count": _lazy("index_shingle_count"),
        "index_expr_topk": _lazy("index_expr_topk"),
        "index_fn_termstats_topk": _lazy("index_fn_termstats_topk"),
        "index_expr_sorted_topk": _lazy("index_expr_sorted_topk"),
        "suggest_contexts": _suggest_contexts,
        "facet_taxonomy_assoc": textstats.facet_taxonomy_assoc,
        "dataset_split_stratified": _dataset_split_stratified,
        "quality_eval": _lazy("quality_eval"),
        "suggest_fst_bucketed": _suggest_fst_bucketed,
        "index_geo_polygon_count": _lazy("index_geo_polygon_count"),
        "index_block_join_sorted": _lazy("index_block_join_sorted"),
        "index_dv_facets": _lazy("index_dv_facets"),
        "index_range_grouped_topk": _lazy("index_range_grouped_topk"),
        "index_group_facets": _lazy("index_group_facets"),
        "index_payload_check_count": _lazy("index_payload_check_count"),
        "suggest_freetext": _suggest_freetext,
        "index_all_group_heads": _lazy("index_all_group_heads"),
        "index_term_range_count": _lazy("index_term_range_count"),
        "index_expr_range_count": _lazy("index_expr_range_count"),
        "index_dv_stats": _lazy("index_dv_stats"),
        "index_stop_count": _lazy("index_stop_count"),
        "index_conv_children_count": _lazy("index_conv_children_count"),
        "index_shape_holes_count": _lazy("index_shape_holes_count"),
        "classify_knn": _classify_knn,
        "classify_perceptron": _classify_perceptron,
        "knn_ivf": knn.knn_ivf,
        "index_knn_topk": _vs("index_knn_topk"),
        "dedup_minhash": dedup.dedup_minhash,
        "dedup_simhash_pairs": dedup.dedup_simhash,
        "ngram_jaccard": dedup.ngram_jaccard_pairs,
        "index_highlight_topk": _lazy("index_highlight_topk"),
        # ---------------- beyond the 50-entry driver window ----------------
        # (driver-green in r01-r04; in-repo gate evidence continues to stand)
        "index_bm25_topk": index_bm25_topk,
        "index_knn_filtered": _vs("index_knn_filtered"),
        "index_hybrid_rrf": _vs("index_hybrid_rrf"),
        "index_conv_topk": _lazy("index_conv_topk"),
        "index_mlt_topk": _lazy("index_mlt_topk"),
        "classify_naive_bayes": _classify_nb,
        "percolate": _percolate,
        "percolate_ast": _percolate_ast,
        "suggest_analyzing": _suggest_analyzing,
        "classify_confusion": _classify_confusion,
        "index_indri_topk": _lazy("index_indri_topk"),
        "percolate_tree": _percolate_tree,
        "suggest_wfst": _suggest_wfst,
        "lm_doc_scores": _lm_doc_scores,
        "index_phrase_wildcard_count": _lazy("index_phrase_wildcard_count"),
        "index_flexible_count": _lazy("index_flexible_count"),
        "index_precedence_count": _lazy("index_precedence_count"),
        "index_span_near_count": _lazy("index_span_near_count"),
        "index_interval_fn_count": _lazy("index_interval_fn_count"),
        "index_automaton_count": _lazy("index_automaton_count"),
        "index_payload_topk": _lazy("index_payload_topk"),
        "index_pk_bloom_count": _lazy("index_pk_bloom_count"),
        "index_pk_version_lookup": _lazy("index_pk_version_lookup"),
        "index_delete_query_count": _lazy("index_delete_query_count"),
        "index_range_count": _lazy("index_range_count"),
        "index_point_range_count": _lazy("index_point_range_count"),
        "index_range_field_count": _lazy("index_range_field_count"),
        "index_xy_count": _lazy("index_xy_count"),
        "index_covering_count": _lazy("index_covering_count"),
        "index_sandbox_point_count": _lazy("index_sandbox_point_count"),
        "index_inet_count": _lazy("index_inet_count"),
        "index_geo_count": _lazy("index_geo_count"),
        "index_shape_count": _lazy("index_shape_count"),
        "index_geo_distance_topk": _lazy("index_geo_distance_topk"),
        "index_feature_topk": _lazy("index_feature_topk"),
        "index_distance_feature_topk": _lazy("index_distance_feature_topk"),
        "index_geo_distfeat_topk": _lazy("index_geo_distfeat_topk"),
        "index_facetset_counts": _lazy("index_facetset_counts"),
        "index_function_range_topk": _lazy("index_function_range_topk"),
        "index_intervals_algebra_count": _lazy("index_intervals_algebra_count"),
        "facet_taxonomy_float_assoc": textstats.facet_taxonomy_float_assoc,
        "repetition_stats": textstats.repetition_stats,
        "curation_pipeline": _curation_pipeline,
        "string_value_facets": textstats.string_value_facets,
        "range_on_range_facets": textstats.range_on_range_facets,
        "index_sorted_topk": _lazy("index_sorted_topk"),
        "index_sorted_numeric_topk": _lazy("index_sorted_numeric_topk"),
        "dedup_substring": dedup.dedup_substring,
        "spellcheck_suggest": _spellcheck_suggest,
        "index_stemmed_count": _lazy("index_stemmed_count"),
        "index_facet_role": _lazy("index_facet_role"),
        "bucketed_join": _bucketed_join,
        "index_grouped_topk": _lazy("index_grouped_topk"),
        "index_bm25_bool_sql": _lazy("index_bm25_bool_sql"),
        "index_phrase_count": _lazy("index_phrase_count"),
        "index_complex_phrase_count": _lazy("index_complex_phrase_count"),
        "index_prefix_count": _lazy("index_prefix_count"),
        "index_keyword_count": _lazy("index_keyword_count"),
        "index_delete_count": _lazy("index_delete_count"),
        "index_dv_update_count": _lazy("index_dv_update_count"),
        "index_interval_count": _lazy("index_interval_count"),
        "term_counts": textstats.term_counts,
        "dedup_exact": dedup.dedup_exact,
        "knn_cosine": knn.knn_cosine,
        "sessionize": windows.sessionize,
        "bm25_scan_topk": bm25scan.bm25_scan_topk,
        "index_diversified_topk": _lazy("index_diversified_topk"),
        "index_sorted_ts_topk": _lazy("index_sorted_ts_topk"),
        "media_features": _media_features,
        "media_frames": _media_frames,
        "media_image_pixel_stats": _media_image_pixel_stats,
        "media_audio_sample_stats": _media_audio_sample_stats,
        "index_geo3d_count": _lazy("index_geo3d_count"),
        "index_geo3d_wgs84_count": _lazy("index_geo3d_wgs84_count"),
        "dsir_select": textstats.dsir_select,
        "collection_stats": textstats.collection_stats,
        "grouped_topk": textstats.grouped_topk,
        "top_terms": textstats.top_terms,
        "doc_token_stats": textstats.doc_token_stats,
        "quality_stats": textstats.quality_stats,
        "langid": textstats.langid,
        "fingerprints": textstats.fingerprints,
        "redact": textstats.redact,
        "pack_sequences": textstats.pack_sequences,
        "dataset_split": textstats.dataset_split,
        "doc_length_deciles": textstats.doc_length_deciles,
        "export_splits": _export_splits,
        "facet_counts": textstats.facet_counts,
        "facet_sampled": textstats.facet_counts_sampled,
        "facet_ranges": textstats.facet_ranges,
        "facet_taxonomy": textstats.facet_taxonomy,
        "drill_sideways": textstats.drill_sideways,
        "distinct_langs": textstats.distinct_langs,
        "contamination": dedup.contamination,
        "knn_lsh": knn.knn_lsh,
        "knn_hnsw": _knn_hnsw,
        "dedup_embedding": knn.dedup_embedding,
        "dedup_embedding_lsh": knn.dedup_embedding_lsh,
        "dedup_semantic": lambda sf: knn.dedup_semantic(sf, threshold=0.4),
        "quantize_embeddings": knn.quantize_embeddings,
        "tumbling_counts": windows.tumbling_counts,
        "hopping_counts": windows.hopping_counts,
        "windowed_topk_users": windows.windowed_topk_users,
        "bm25_scan_count": bm25scan.bm25_scan_count,
    }


def _percolate_ast(sf_dir):
    from lucene_ray.pipelines.percolate import percolate_ast

    return percolate_ast(sf_dir)


def _lm_doc_scores(sf_dir):
    from lucene_ray.pipelines.textstats import lm_doc_scores

    return lm_doc_scores(sf_dir)


def _percolate_tree(sf_dir):
    from lucene_ray.pipelines.querytree import percolate_tree

    return percolate_tree(sf_dir)


def _classify_nb(sf_dir):
    from lucene_ray.pipelines.classify import classify_naive_bayes

    return classify_naive_bayes(sf_dir)


def _dataset_split_stratified(sf_dir):
    from lucene_ray.pipelines.classify import dataset_split_stratified

    return dataset_split_stratified(sf_dir)


def _classify_confusion(sf_dir):
    from lucene_ray.pipelines.classify import classify_confusion

    return classify_confusion(sf_dir)


def _classify_knn(sf_dir):
    from lucene_ray.pipelines.classify import classify_knn

    return classify_knn(sf_dir)


def _classify_perceptron(sf_dir):
    from lucene_ray.pipelines.classify import classify_perceptron

    return classify_perceptron(sf_dir)


def _curation_pipeline(sf_dir):
    from lucene_ray.pipelines.curation import curate_corpus

    return curate_corpus(sf_dir)


def _cap_per_source_sql():
    from lucene_ray.pipelines.textstats import cap_per_source_oracle_sql

    return cap_per_source_oracle_sql()


def _sample_mixture_sql():
    from lucene_ray.pipelines.textstats import sample_mixture_oracle_sql

    return sample_mixture_oracle_sql()


def _dedup_substring_sql():
    from lucene_ray.pipelines.dedup import dedup_substring_oracle_sql

    return dedup_substring_oracle_sql()


def _curation_sql():
    from lucene_ray.pipelines.curation import curation_oracle_sql

    return curation_oracle_sql()


def _lazy(name):
    def call(sf_dir):
        from lucene_ray.pipelines import flagship

        return getattr(flagship, name)(sf_dir)
    return call


def _index_bm25_sql_topk(sf_dir):
    from lucene_ray.pipelines.flagship import index_bm25_sql_topk

    return index_bm25_sql_topk(sf_dir)


def _knn_hnsw(sf_dir):
    from lucene_ray.pipelines.vsearch import knn_hnsw

    return knn_hnsw(sf_dir)


def _vs(name):
    def call(sf_dir):
        from lucene_ray.pipelines import vsearch

        return getattr(vsearch, name)(sf_dir)
    return call


def _suggest_analyzing(sf_dir):
    from lucene_ray.pipelines.suggesters import suggest_analyzing

    return suggest_analyzing(sf_dir)


def _suggest_contexts(sf_dir):
    from lucene_ray.pipelines.suggesters import suggest_contexts

    return suggest_contexts(sf_dir)


def _spellcheck_suggest(sf_dir):
    from lucene_ray.pipelines.suggesters import spellcheck_suggest

    return spellcheck_suggest(sf_dir)


def _suggest_fuzzy(sf_dir):
    from lucene_ray.pipelines.suggesters import suggest_fuzzy

    return suggest_fuzzy(sf_dir)


def _suggest_wfst(sf_dir):
    from lucene_ray.pipelines.suggesters import suggest_wfst

    return suggest_wfst(sf_dir)


def _suggest_fst_bucketed(sf_dir):
    from lucene_ray.pipelines.suggesters import suggest_fst_bucketed

    return suggest_fst_bucketed(sf_dir)


def _suggest_blended(sf_dir):
    from lucene_ray.pipelines.suggesters import suggest_blended

    return suggest_blended(sf_dir)


def _suggest_freetext(sf_dir):
    from lucene_ray.pipelines.suggesters import suggest_freetext

    return suggest_freetext(sf_dir)


def _bucketed_join(sf_dir):
    from lucene_ray.pipelines.joins import doc_embedding_join

    return doc_embedding_join(sf_dir)


def _percolate(sf_dir):
    from lucene_ray.pipelines.percolate import percolate

    return percolate(sf_dir)


def _media_features(sf_dir):
    from lucene_ray.pipelines.multimodal import media_features_table

    return media_features_table(sf_dir)


def _media_image_sql():
    from lucene_ray.pipelines.multimodal import media_image_pixel_stats_sql

    return media_image_pixel_stats_sql()


def _media_audio_sql():
    from lucene_ray.pipelines.multimodal import media_audio_sample_stats_sql

    return media_audio_sample_stats_sql()


def _media_image_pixel_stats(sf_dir):
    from lucene_ray.pipelines.multimodal import media_image_pixel_stats

    return media_image_pixel_stats(sf_dir)


def _media_audio_sample_stats(sf_dir):
    from lucene_ray.pipelines.multimodal import media_audio_sample_stats

    return media_audio_sample_stats(sf_dir)


def _media_frames(sf_dir):
    from lucene_ray.pipelines.multimodal import media_frames

    return media_frames(sf_dir)


def _geo_cte() -> str:
    """Shared oracle prologue: re-derive the deterministic doc_id->geo
    assignment, quantize with the GeoEncodingUtils scale model (exact
    double math both sides), and decode back (what the engine's verify
    steps operate on)."""
    from lucene_ray.sources.transcripts import (
        GEO_LAT_MOD,
        GEO_LAT_MULT,
        GEO_LON_MOD,
        GEO_LON_MULT,
    )

    return f"""
        WITH geo AS (
          SELECT doc_id,
            floor(((((doc_id * {GEO_LAT_MULT}) % {GEO_LAT_MOD}) / 10000.0) - 90.0)
                  * (4294967296.0 / 180.0)) AS lat_e,
            floor(((((doc_id * {GEO_LON_MULT}) % {GEO_LON_MOD}) / 10000.0) - 180.0)
                  * (4294967296.0 / 360.0)) AS lon_e
          FROM documents),
        dec AS (
          SELECT doc_id,
                 lat_e / (4294967296.0 / 180.0) AS dlat,
                 lon_e / (4294967296.0 / 360.0) AS dlon,
                 lat_e, lon_e
          FROM geo)"""


def _haversine_sql(qlat: float, qlon: float) -> str:
    """SQL haversine meters from (qlat, qlon) to (dlat, dlon), mirroring
    `search/geo.py` haversine_meters operation-for-operation."""
    from lucene_ray.search.geo import MEAN_EARTH_RADIUS_M

    return (f"2 * {MEAN_EARTH_RADIUS_M!r} * asin(sqrt(least(1.0, "
            f"sin((radians({qlat!r}) - radians(dlat)) / 2)"
            f" * sin((radians({qlat!r}) - radians(dlat)) / 2)"
            f" + cos(radians(dlat)) * cos(radians({qlat!r}))"
            f" * (sin((radians({qlon!r}) - radians(dlon)) / 2)"
            f" * sin((radians({qlon!r}) - radians(dlon)) / 2)))))")


def _xy_sql() -> str:
    """Oracle for index_xy_count: the XY coords are eighth-steps (exact in
    binary at every precision), so the sortable-int encoding round-trips
    them verbatim and the predicates apply to the raw doubles."""
    from lucene_ray.pipelines.flagship import (
        XY_BOX,
        XY_CIRCLE,
        XY_TRI_XS,
        XY_TRI_YS,
    )

    qx, qy, r = XY_CIRCLE
    edges = []
    n = len(XY_TRI_XS)
    for i in range(n):
        x1, y1 = XY_TRI_XS[i], XY_TRI_YS[i]
        x2, y2 = XY_TRI_XS[(i + 1) % n], XY_TRI_YS[(i + 1) % n]
        edges.append(f"(({x2!r} - {x1!r}) * (y - {y1!r})"
                     f" - ({y2!r} - {y1!r}) * (x - {x1!r})) >= 0")
    return f"""
        WITH xy AS (
          SELECT doc_id,
                 ((doc_id * 131) % 1000) / 8.0 - 60.0 AS x,
                 ((doc_id * 173) % 1000) / 8.0 - 60.0 AS y
          FROM documents)
        SELECT
          (SELECT count(*) FROM xy
           WHERE x BETWEEN {XY_BOX[0]!r} AND {XY_BOX[1]!r}
             AND y BETWEEN {XY_BOX[2]!r} AND {XY_BOX[3]!r})::BIGINT AS n_in_box,
          (SELECT count(*) FROM xy
           WHERE (x - {qx!r}) * (x - {qx!r}) + (y - {qy!r}) * (y - {qy!r})
                 <= {r!r} * {r!r})::BIGINT AS n_in_radius,
          (SELECT count(*) FROM xy
           WHERE {' AND '.join(edges)})::BIGINT AS n_in_polygon"""


def _shape_sql() -> str:
    """Oracle for index_shape_count: the doc shapes are axis-aligned
    rectangles, so every relation is interval arithmetic on the raw
    degrees (query bounds sit off the quarter-degree doc grid, so
    int32 quantization cannot flip a touch decision)."""
    from lucene_ray.pipelines.flagship import SHAPE_QBOX

    qy0, qy1, qx0, qx1 = SHAPE_QBOX
    return f"""
        WITH r AS (
          SELECT doc_id,
                 ((doc_id * 37) % 160) - 80.0 AS lat0,
                 ((doc_id * 37) % 160) - 80.0 + 1.0 + (doc_id % 7) * 0.25 AS lat1,
                 ((doc_id * 53) % 340) - 170.0 AS lon0,
                 ((doc_id * 53) % 340) - 170.0 + 1.0 + (doc_id % 5) * 0.5 AS lon1
          FROM documents)
        SELECT
          (SELECT count(*) FROM r WHERE lat0 <= {qy1!r} AND lat1 >= {qy0!r}
             AND lon0 <= {qx1!r} AND lon1 >= {qx0!r})::BIGINT AS n_intersects,
          (SELECT count(*) FROM r WHERE lat0 >= {qy0!r} AND lat1 <= {qy1!r}
             AND lon0 >= {qx0!r} AND lon1 <= {qx1!r})::BIGINT AS n_within,
          (SELECT count(*) FROM r WHERE lat0 <= {qy0!r} AND lat1 >= {qy1!r}
             AND lon0 <= {qx0!r} AND lon1 >= {qx1!r})::BIGINT AS n_contains,
          (SELECT count(*) FROM r WHERE NOT (lat0 <= {qy1!r} AND lat1 >= {qy0!r}
             AND lon0 <= {qx1!r} AND lon1 >= {qx0!r}))::BIGINT AS n_disjoint"""


def _shape_holes_sql() -> str:
    """Oracle for index_shape_holes_count: annulus (outer square + centered
    square hole) vs the query box — pure interval arithmetic."""
    from lucene_ray.pipelines.flagship import SHAPE_QBOX

    qy0, qy1, qx0, qx1 = SHAPE_QBOX
    return f"""
        WITH r AS (
          SELECT doc_id,
                 ((doc_id * 31) % 120) / 2.0 - 60.0 AS o0,
                 ((doc_id * 31) % 120) / 2.0 - 60.0 + 8.0 + (doc_id % 4) AS o1,
                 ((doc_id * 31) % 120) / 2.0 - 60.0 + 2.0 AS h0,
                 ((doc_id * 31) % 120) / 2.0 - 60.0 + 4.0 + (doc_id % 3) AS h1
          FROM documents),
        m AS (
          SELECT doc_id,
                 (o0 <= {qy1!r} AND o1 >= {qy0!r} AND o0 <= {qx1!r} AND o1 >= {qx0!r})
                 AND NOT ({qy0!r} > h0 AND {qy1!r} < h1
                          AND {qx0!r} > h0 AND {qx1!r} < h1) AS inter,
                 (o0 <= {qy0!r} AND o1 >= {qy1!r} AND o0 <= {qx0!r} AND o1 >= {qx1!r})
                 AND NOT (h0 <= {qy1!r} AND h1 >= {qy0!r}
                          AND h0 <= {qx1!r} AND h1 >= {qx0!r}) AS cont
          FROM r)
        SELECT
          (SELECT count(*) FROM m WHERE inter)::BIGINT AS n_intersects,
          (SELECT count(*) FROM m WHERE cont)::BIGINT AS n_contains,
          (SELECT count(*) FROM m WHERE NOT inter)::BIGINT AS n_disjoint"""


def _geo_sql() -> str:
    """Oracle for index_geo_count: box / dateline-box / haversine-radius
    predicates over the shared geo CTE."""
    from lucene_ray.pipelines.flagship import GEO_BOX, GEO_CIRCLE, GEO_DATELINE_BOX
    from lucene_ray.search.geo import encode_latitude, encode_longitude

    b_lat_lo, b_lat_hi = int(encode_latitude(GEO_BOX[0])), int(encode_latitude(GEO_BOX[1]))
    b_lon_lo, b_lon_hi = int(encode_longitude(GEO_BOX[2])), int(encode_longitude(GEO_BOX[3]))
    d_lat_lo, d_lat_hi = int(encode_latitude(GEO_DATELINE_BOX[0])), int(encode_latitude(GEO_DATELINE_BOX[1]))
    d_lon_w, d_lon_e = int(encode_longitude(GEO_DATELINE_BOX[2])), int(encode_longitude(GEO_DATELINE_BOX[3]))
    qlat, qlon, radius = GEO_CIRCLE
    return _geo_cte() + f"""
        SELECT
          (SELECT count(*) FROM geo
           WHERE lat_e BETWEEN {b_lat_lo} AND {b_lat_hi}
             AND lon_e BETWEEN {b_lon_lo} AND {b_lon_hi})::BIGINT AS n_in_box,
          (SELECT count(*) FROM geo
           WHERE lat_e BETWEEN {d_lat_lo} AND {d_lat_hi}
             AND (lon_e >= {d_lon_w} OR lon_e <= {d_lon_e}))::BIGINT AS n_dateline,
          (SELECT count(*) FROM dec
           WHERE {_haversine_sql(qlat, qlon)} <= {radius!r})::BIGINT AS n_in_radius"""


def _andoyer_sql(qlat: float, qlon: float) -> str:
    """SQL Andoyer-Lambert WGS84 geodesic meters from (qlat, qlon) to
    (dlat, dlon), mirroring `search/geo3d.py` andoyer_wgs84_meters; the
    query point's reduced latitude is precomputed as literals."""
    import math

    from lucene_ray.search.geo3d import WGS84_A, WGS84_F

    f = WGS84_F
    b1 = math.atan((1 - f) * math.tan(math.radians(qlat)))
    sigma = (f"acos(greatest(-1.0, least(1.0, "
             f"{math.sin(b1)!r} * sin(atan({1 - f!r} * tan(radians(dlat)))) "
             f"+ {math.cos(b1)!r} * cos(atan({1 - f!r} * tan(radians(dlat)))) "
             f"* cos(radians(dlon) - {math.radians(qlon)!r}))))")
    b2 = f"atan({1 - f!r} * tan(radians(dlat)))"
    p = f"(({b1!r} + {b2}) / 2)"
    q = f"(({b2} - {b1!r}) / 2)"
    x = (f"(CASE WHEN {sigma} > 0 THEN ({sigma} - sin({sigma})) "
         f"* sin({p}) * sin({p}) * cos({q}) * cos({q}) "
         f"/ greatest(cos({sigma} / 2) * cos({sigma} / 2), 1e-300) "
         f"ELSE 0 END)")
    y = (f"(CASE WHEN sin({sigma}) > 0 THEN ({sigma} + sin({sigma})) "
         f"* cos({p}) * cos({p}) * sin({q}) * sin({q}) "
         f"/ greatest(sin({sigma} / 2) * sin({sigma} / 2), 1e-300) "
         f"ELSE 0 END)")
    return f"({WGS84_A!r} * ({sigma} - {f / 2.0!r} * ({x} + {y})))"


def _geo3d_wgs84_sql() -> str:
    """Oracle for index_geo3d_wgs84_count: two Andoyer-geodesic radius
    predicates over the decoded-coordinate CTE."""
    from lucene_ray.pipelines.flagship import GEO3D_CIRCLE2, GEO_CIRCLE

    lat1, lon1, r1 = GEO_CIRCLE
    lat2, lon2, r2 = GEO3D_CIRCLE2
    return _geo_cte() + f"""
        SELECT
          (SELECT count(*) FROM dec
           WHERE {_andoyer_sql(lat1, lon1)} <= {r1!r})::BIGINT AS n_circle,
          (SELECT count(*) FROM dec
           WHERE {_andoyer_sql(lat2, lon2)} <= {r2!r})::BIGINT AS n_polar"""


def _dsir_sql() -> str:
    from lucene_ray.pipelines.textstats import dsir_select_oracle_sql

    return dsir_select_oracle_sql()


def _geo3d_sql() -> str:
    """Oracle for index_geo3d_count: the SPHERE planet model's cap test
    equals haversine on the same mean radius, so the twin is two
    haversine-radius predicates."""
    from lucene_ray.pipelines.flagship import GEO3D_CIRCLE2, GEO_CIRCLE

    lat1, lon1, r1 = GEO_CIRCLE
    lat2, lon2, r2 = GEO3D_CIRCLE2
    return _geo_cte() + f"""
        SELECT
          (SELECT count(*) FROM dec
           WHERE {_haversine_sql(lat1, lon1)} <= {r1!r})::BIGINT AS n_circle,
          (SELECT count(*) FROM dec
           WHERE {_haversine_sql(lat2, lon2)} <= {r2!r})::BIGINT AS n_polar"""


def _geo_polygon_sql() -> str:
    """Oracle for index_geo_polygon_count: the query triangle is convex and
    CCW in the lon/lat plane, so containment (boundary-inclusive, matching
    Polygon2D) is three half-plane cross-product tests on decoded coords."""
    from lucene_ray.pipelines.flagship import GEO_TRI_LATS, GEO_TRI_LONS

    edges = []
    n = len(GEO_TRI_LATS)
    for i in range(n):
        x1, y1 = GEO_TRI_LONS[i], GEO_TRI_LATS[i]
        x2, y2 = GEO_TRI_LONS[(i + 1) % n], GEO_TRI_LATS[(i + 1) % n]
        edges.append(f"(({x2!r} - {x1!r}) * (dlat - {y1!r})"
                     f" - ({y2!r} - {y1!r}) * (dlon - {x1!r})) >= 0")
    return _geo_cte() + f"""
        SELECT count(*)::BIGINT AS n_in_polygon
        FROM dec WHERE {' AND '.join(edges)}"""


def _geo_dist_topk_sql() -> str:
    """Oracle for index_geo_distance_topk: 'merge' docs nearest-first from
    the sort origin (haversine on decoded coords), doc_id-asc tie-break,
    distance floored to integer meters."""
    from lucene_ray.pipelines.flagship import GEO_SORT_ORIGIN, SORT_K

    qlat, qlon = GEO_SORT_ORIGIN
    return _geo_cte() + f""",
        toklists AS (SELECT doc_id, list_transform(regexp_extract_all(text,
            '[A-Za-z0-9]+'), x -> lower(x)) AS toks FROM documents),
        matches AS (
          SELECT dec.doc_id, {_haversine_sql(qlat, qlon)} AS d
          FROM dec JOIN toklists USING (doc_id)
          WHERE list_contains(toks, 'merge'))
        SELECT row_number() OVER (ORDER BY d ASC, doc_id ASC)::BIGINT AS rank,
               printf('conv-%08d', doc_id // 5) AS conv_id,
               (doc_id % 5)::BIGINT AS turn_idx,
               floor(d)::BIGINT AS dist_m
        FROM matches ORDER BY d ASC, doc_id ASC LIMIT {SORT_K}"""


def _long_distfeat_sql() -> str:
    """Oracle for index_distance_feature_topk: the float32
    LongDistanceFeatureQuery score (weight widened f32->f64 exactly, the
    saturation computed in f64, cast to FLOAT) recomputed in DuckDB —
    ts = BASE + doc_id * 1e6, so |ts - origin| = |doc_id - 137| * 1e6."""
    from lucene_ray.pipelines.flagship import (
        DISTFEAT_ORIGIN_DOC,
        DISTFEAT_PIVOT_US,
        DISTFEAT_WEIGHT,
        SORT_K,
    )

    p = float(DISTFEAT_PIVOT_US)
    return f"""
        WITH s AS (
          SELECT doc_id,
                 CAST(CAST(CAST({DISTFEAT_WEIGHT!r} AS FLOAT) AS DOUBLE)
                      * ({p!r} / ({p!r} + CAST(abs(doc_id - {DISTFEAT_ORIGIN_DOC})
                                              AS DOUBLE) * 1000000.0))
                      AS FLOAT) AS score_f
          FROM documents)
        SELECT row_number() OVER (ORDER BY score_f DESC, doc_id ASC)::BIGINT AS rank,
               printf('conv-%08d', doc_id // 5) AS conv_id,
               (doc_id % 5)::BIGINT AS turn_idx,
               CAST(score_f AS DOUBLE) AS score
        FROM s ORDER BY score_f DESC, doc_id ASC LIMIT {SORT_K}"""


def _geo_distfeat_sql() -> str:
    """Oracle for index_geo_distfeat_topk: the float32
    LatLonPointDistanceFeatureQuery score over decoded coords, quantized
    floor(score * 1e4) so last-ulp trig differences can't flip the hash."""
    from lucene_ray.pipelines.flagship import (
        GEO_DISTFEAT_PIVOT_M,
        GEO_DISTFEAT_WEIGHT,
        GEO_SORT_ORIGIN,
        SORT_K,
    )

    qlat, qlon = GEO_SORT_ORIGIN
    p = float(GEO_DISTFEAT_PIVOT_M)
    return _geo_cte() + f""",
        s AS (
          SELECT doc_id,
                 CAST(CAST(CAST({GEO_DISTFEAT_WEIGHT!r} AS FLOAT) AS DOUBLE)
                      * ({p!r} / ({p!r} + {_haversine_sql(qlat, qlon)}))
                      AS FLOAT) AS score_f
          FROM dec)
        SELECT row_number() OVER (ORDER BY score_f DESC, doc_id ASC)::BIGINT AS rank,
               printf('conv-%08d', doc_id // 5) AS conv_id,
               (doc_id % 5)::BIGINT AS turn_idx,
               floor(CAST(score_f AS DOUBLE) * 10000.0)::BIGINT AS score_q4
        FROM s ORDER BY score_f DESC, doc_id ASC LIMIT {SORT_K}"""


def oracle_sql() -> dict[str, str]:
    k1, b = 1.2, 0.75
    bm25_terms = ("merge", "join")
    tf_union = " UNION ALL ".join(
        f"SELECT doc_id, '{t}' AS term, len(list_filter(toks, x -> x = '{t}')) AS tf FROM toklists"
        for t in bm25_terms)
    return {
        "term_counts": _TOKS + """
            SELECT term, count(*)::BIGINT AS n_occurrences,
                   count(DISTINCT doc_id)::BIGINT AS n_docs
            FROM tokens GROUP BY term""",
        "top_terms": _TOKS + """
            SELECT term, count(*)::BIGINT AS n_occurrences,
                   count(DISTINCT doc_id)::BIGINT AS n_docs
            FROM tokens GROUP BY term
            ORDER BY n_occurrences DESC, term ASC LIMIT 100""",
        "collection_stats": _TOKS + """
            SELECT (SELECT count(*) FROM documents)::BIGINT AS doc_count,
                   count(*)::BIGINT AS sum_tokens,
                   count(DISTINCT term)::BIGINT AS n_terms
            FROM tokens""",
        "doc_token_stats": _TOKS + """
            SELECT d.doc_id, length(d.text)::BIGINT AS n_chars,
                   len(t.toks)::BIGINT AS n_tokens,
                   len(list_distinct(t.toks))::BIGINT AS n_unique
            FROM documents d JOIN toklists t USING (doc_id)""",
        "quality_stats": _TOKS + f"""
            SELECT doc_id, len(toks)::BIGINT AS n_tokens,
                   len(list_filter(toks, x -> x IN ({_EN_STOP})))::BIGINT AS n_stop_en,
                   len(list_filter(toks, x -> regexp_matches(x, '^[0-9]+$')))::BIGINT AS n_digit_tokens,
                   coalesce(list_max(list_transform(toks, x -> length(x))), 0)::BIGINT AS max_token_len
            FROM toklists""",
        "langid": _TOKS + f"""
            SELECT doc_id,
                   len(list_filter(toks, x -> x IN ({_EN_STOP})))::BIGINT AS n_en,
                   len(list_filter(toks, x -> x IN ({_DE_STOP})))::BIGINT AS n_de,
                   len(list_filter(toks, x -> x IN ({_FR_STOP})))::BIGINT AS n_fr,
                   CASE WHEN n_en = 0 AND n_de = 0 AND n_fr = 0 THEN 'und'
                        WHEN n_en >= n_de AND n_en >= n_fr THEN 'en'
                        WHEN n_de >= n_fr THEN 'de' ELSE 'fr' END AS lang_pred
            FROM toklists""",
        "fingerprints": _TOKS + """
            SELECT d.doc_id,
                   md5(array_to_string(t.toks, ' ')) AS token_fp,
                   md5(d.text) AS raw_fp
            FROM documents d JOIN toklists t USING (doc_id)""",
        "redact": _redact_sql(),
        "dataset_split": _dataset_split_sql(),
        "sample_mixture": _sample_mixture_sql(),
        "cap_per_source": _cap_per_source_sql(),
        "contamination": _contamination_sql(),
        "doc_length_deciles": _deciles_sql(),
        "export_splits": """
            SELECT CASE WHEN ((doc_id % 4294967296) * 2654435761) % 4294967296
                             < 3435973836 THEN 'train'
                        WHEN ((doc_id % 4294967296) * 2654435761) % 4294967296
                             < 3865470566 THEN 'val'
                        ELSE 'test' END AS split,
                   count(*)::BIGINT AS n_docs
            FROM documents GROUP BY 1""",
        "facet_counts": "SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY lang",
        "facet_ranges": """
            WITH edges(bucket, lo, hi) AS (VALUES
              (0, 0, 100), (1, 100, 200), (2, 200, 400), (3, 400, 800),
              (4, 800, 1099511627776)),
            b AS (SELECT e.bucket, e.lo, e.hi, count(*) AS n_docs
                  FROM documents d JOIN edges e
                    ON d.n_chars >= e.lo AND d.n_chars < e.hi
                  GROUP BY e.bucket, e.lo, e.hi)
            SELECT bucket::BIGINT AS bucket, lo::BIGINT AS lo, hi::BIGINT AS hi,
                   n_docs::BIGINT AS n_docs
            FROM b ORDER BY bucket""",
        "facet_taxonomy": """
            SELECT lang, coalesce(source, '') AS source, count(*)::BIGINT AS n_docs
            FROM documents
            GROUP BY GROUPING SETS ((lang), (lang, source))
            ORDER BY lang, source""",
        "facet_taxonomy_assoc": """
            SELECT lang, coalesce(source, '') AS source,
                   sum(n_chars)::BIGINT AS sum_assoc,
                   max(n_chars)::BIGINT AS max_assoc
            FROM documents
            GROUP BY GROUPING SETS ((lang), (lang, source))
            ORDER BY lang, source""",
        # Gopher repetition filters: per-doc duplicate-word fraction, top
        # word fraction, top adjacent-bigram fraction (6dp both sides)
        "repetition_stats": """
            WITH toklists AS (SELECT doc_id, list_transform(
                     regexp_extract_all(text, '[A-Za-z0-9]+'),
                     x -> lower(x)) AS toks FROM documents),
            tokens AS (SELECT doc_id, unnest(toks) AS term,
                              generate_subscripts(toks, 1) AS pos
                       FROM toklists),
            tc AS (SELECT doc_id, term, count(*)::DOUBLE AS c FROM tokens
                   GROUP BY doc_id, term),
            agg AS (SELECT doc_id, sum(c) AS total,
                           count(*)::DOUBLE AS distinct_terms, max(c) AS top
                    FROM tc GROUP BY doc_id),
            bi AS (SELECT doc_id, term || ' ' ||
                          lead(term) OVER (PARTITION BY doc_id ORDER BY pos)
                          AS bg FROM tokens),
            bc0 AS (SELECT doc_id, bg, count(*)::DOUBLE AS c FROM bi
                    WHERE bg IS NOT NULL GROUP BY doc_id, bg),
            bc AS (SELECT doc_id, max(c) AS topbg FROM bc0 GROUP BY doc_id)
            SELECT t.doc_id,
                   round(CASE WHEN a.total > 0
                         THEN 1 - a.distinct_terms/a.total ELSE 0 END,
                         6) AS dup_word_frac,
                   round(CASE WHEN a.total > 0 THEN a.top/a.total
                         ELSE 0 END, 6) AS top_word_frac,
                   round(CASE WHEN coalesce(a.total, 0) > 1
                         THEN coalesce(bc.topbg, 0)/(a.total-1)
                         ELSE 0 END, 6) AS top_bigram_frac
            FROM toklists t LEFT JOIN agg a USING (doc_id)
            LEFT JOIN bc USING (doc_id)
            ORDER BY t.doc_id""",
        "facet_taxonomy_float_assoc": """
            SELECT lang, coalesce(source, '') AS source,
                   sum(n_chars * 0.5)::DOUBLE AS sum_assoc,
                   max(n_chars * 0.5)::DOUBLE AS max_assoc
            FROM documents
            GROUP BY GROUPING SETS ((lang), (lang, source))
            ORDER BY lang, source""",
        "string_value_facets": """
            WITH hits AS (SELECT source FROM documents
                          WHERE text LIKE '%merge%'),
                 c AS (SELECT source AS value, count(*)::BIGINT AS n_docs
                       FROM hits GROUP BY source)
            SELECT value, n_docs FROM c
            UNION ALL
            SELECT '' AS value, count(*)::BIGINT AS n_docs FROM hits
            ORDER BY value""",
        "range_on_range_facets": """
            WITH docs AS (SELECT n_chars AS lo,
                                 n_chars + (doc_id % 50) AS hi
                          FROM documents),
                 q(label, qlo, qhi) AS (VALUES ('small', 0, 400),
                                               ('mid', 400, 900),
                                               ('large', 900, 2000)),
                 rel(relation) AS (VALUES ('intersects'), ('within'),
                                          ('contains'))
            SELECT q.label, rel.relation,
                   count(*) FILTER (
                     (relation = 'intersects' AND lo <= qhi AND hi >= qlo) OR
                     (relation = 'within' AND lo >= qlo AND hi <= qhi) OR
                     (relation = 'contains' AND lo <= qlo AND hi >= qhi)
                   )::BIGINT AS n_docs
            FROM docs CROSS JOIN q CROSS JOIN rel
            GROUP BY q.label, rel.relation
            ORDER BY q.label, rel.relation""",
        "dedup_embedding": """
            SELECT a.vec_id::BIGINT AS doc_a, b.vec_id::BIGINT AS doc_b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]), 4) AS cos
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                               b.embedding::DOUBLE[]), 4) >= 0.4
            ORDER BY doc_a, doc_b""",
        "distinct_langs": "SELECT DISTINCT lang FROM documents ORDER BY lang",
        "grouped_topk": """
            SELECT doc_id, lang, n_chars, rank FROM (
              SELECT doc_id, lang, n_chars,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY n_chars DESC, doc_id ASC)::BIGINT AS rank
              FROM documents) WHERE rank <= 3""",
        "dedup_exact": """
            SELECT md5(text) AS text_md5, min(doc_id)::BIGINT AS rep_doc_id,
                   count(*)::BIGINT AS n_dups
            FROM documents GROUP BY md5(text)""",
        "dedup_substring": _dedup_substring_sql(),
        "knn_cosine": """
            WITH q AS (SELECT vec_id AS query_vec_id, embedding FROM embeddings
                       WHERE vec_id IN (0, 1, 2)),
            sims AS (
              SELECT q.query_vec_id, e.vec_id,
                     list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) AS cos
              FROM embeddings e, q WHERE e.vec_id <> q.query_vec_id),
            ranked AS (
              SELECT query_vec_id, vec_id, cos,
                     row_number() OVER (PARTITION BY query_vec_id
                                        ORDER BY cos DESC, vec_id ASC)::BIGINT AS rank
              FROM sims)
            SELECT query_vec_id::BIGINT AS query_vec_id, rank, vec_id::BIGINT AS vec_id,
                   round(cos, 4) AS cos
            FROM ranked WHERE rank <= 10""",
        "tumbling_counts": """
            SELECT event_type, date_trunc('hour', ts) AS window_start,
                   count(*)::BIGINT AS n_events
            FROM events GROUP BY event_type, date_trunc('hour', ts)""",
        "hopping_counts": """
            WITH hops AS (SELECT range AS i FROM range(0, 4)),
            ev AS (SELECT event_type, epoch_us(ts) AS ts_us FROM events),
            exp AS (SELECT event_type,
                           (ts_us // 900000000 * 900000000 - i * 900000000) AS ws
                    FROM ev, hops
                    WHERE (ts_us // 900000000 * 900000000 - i * 900000000)
                          + 3600000000 > ts_us)
            SELECT event_type, make_timestamp(ws) AS window_start,
                   count(*)::BIGINT AS n_events
            FROM exp GROUP BY event_type, ws""",
        "windowed_topk_users": """
            WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
            cnt AS (SELECT (ts_us // 86400000000 * 86400000000) AS ws, user_id,
                           count(*) AS n
                    FROM ev GROUP BY ws, user_id),
            ranked AS (SELECT ws, user_id, n,
                              row_number() OVER (PARTITION BY ws
                                                 ORDER BY n DESC, user_id ASC) AS rank
                       FROM cnt)
            SELECT ws::BIGINT AS window_start, rank::BIGINT AS rank,
                   user_id::BIGINT AS user_id, n::BIGINT AS n_events
            FROM ranked WHERE rank <= 3""",
        "sessionize": """
            WITH ordered AS (
              SELECT user_id, ts, event_id,
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
              FROM events),
            flagged AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN prev_ts IS NULL
                          OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
              FROM ordered),
            sess AS (
              SELECT user_id,
                     sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
              FROM flagged)
            SELECT user_id::BIGINT AS user_id, session_id,
                   count(*)::BIGINT AS n_events
            FROM sess GROUP BY user_id, session_id""",
        "bm25_scan_topk": _TOKS + f""",
            tf AS ({tf_union}),
            stats AS (SELECT count(*) AS n_docs,
                             (SELECT count(*) FROM tokens) * 1.0 / count(*) AS avgdl
                      FROM documents),
            df AS (SELECT term, count(*) FILTER (tf > 0) AS df FROM tf GROUP BY term),
            dl AS (SELECT doc_id, len(toks) AS dl FROM toklists),
            scored AS (
              SELECT tf.doc_id,
                     sum(ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
                         * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * dl.dl / stats.avgdl))) AS score
              FROM tf, stats, df, dl
              WHERE tf.term = df.term AND tf.doc_id = dl.doc_id AND tf.tf > 0
              GROUP BY tf.doc_id)
            SELECT row_number() OVER (ORDER BY score DESC, doc_id ASC)::BIGINT AS rank,
                   doc_id::BIGINT AS doc_id, round(score, 4) AS score
            FROM scored ORDER BY score DESC, doc_id ASC LIMIT 20""",
        "index_classic_ops_count": _TOKS + """
            SELECT count(*)::BIGINT AS n_matching FROM toklists
            WHERE list_contains(toks, 'merge') AND list_contains(toks, 'join')
              AND NOT list_contains(toks, 'scan')""",
        # PrecedenceQueryParser: AND binds tighter than OR
        "index_precedence_count": _TOKS + """
            SELECT count(*)::BIGINT AS n_matching FROM toklists
            WHERE (list_contains(toks, 'merge') AND list_contains(toks, 'join'))
               OR (list_contains(toks, 'sort') AND list_contains(toks, 'scan'))""",
        "bm25_scan_count": _TOKS + """
            SELECT count(*)::BIGINT AS n_matching FROM toklists
            WHERE list_contains(toks, 'merge') AND list_contains(toks, 'join')""",
        "index_term_dictionary": _TOKS + """
            SELECT term, count(DISTINCT doc_id)::INT AS df,
                   count(*)::BIGINT AS ttf
            FROM tokens GROUP BY term ORDER BY term""",
        "index_bm25_sql_topk": _index_bm25_oracle_sql(),
        "index_indri_topk": _flagship_sql("index_indri_oracle_sql"),
        "index_diversified_topk": _index_diversified_sql(),
        "index_grouped_topk": _index_grouped_sql(),
        "index_bm25_bool_sql": _index_bool_oracle_sql(),
        "index_conv_topk": _conv_join_sql(),
        "index_join_topk": _index_join_sql(),
        "index_join_count": _index_join_count_sql(),
        "index_flt_topk": _flagship_sql("index_flt_oracle_sql"),
        "index_combined_topk": _flagship_sql("index_combined_oracle_sql"),
        "index_block_join_sorted": _flagship_sql("index_block_join_sorted_oracle_sql"),
        "index_dv_facets": _flagship_sql("index_dv_facets_oracle_sql"),
        "index_multi_sorted_topk": _flagship_sql("index_multi_sorted_oracle_sql"),
        "index_range_grouped_topk": _flagship_sql("index_range_grouped_oracle_sql"),
        "index_group_facets": _flagship_sql("index_group_facets_oracle_sql"),
        "index_block_grouped_topk": _flagship_sql("index_block_grouped_oracle_sql"),
        "index_conv_children_count": _TOKS + """
            SELECT count(*)::BIGINT AS n_matching FROM documents
            WHERE doc_id // 5 IN (
                SELECT doc_id // 5 FROM toklists
                WHERE list_contains(toks, 'merge')
                  AND list_contains(toks, 'join'))""",
        "index_mlt_topk": _mlt_sql(),
        "index_expr_topk": _expr_sql(),
        "index_fn_termstats_topk": _TOKS + _flagship_sql(
            "index_fn_termstats_oracle_sql"),
        # intervals algebra: ordered = a merge strictly before a join;
        # within(3) = |merge_pos - join_pos| <= 3; atLeast(2 of 3 terms)
        "index_intervals_algebra_count": """
            WITH toklists AS (SELECT doc_id, list_transform(
                     regexp_extract_all(text, '[A-Za-z0-9]+'),
                     x -> lower(x)) AS toks FROM documents),
            tokens AS (SELECT doc_id, lower(t.term) AS term,
                              t.pos FROM (
                       SELECT doc_id, unnest(toks) AS term,
                              generate_subscripts(toks, 1) AS pos
                       FROM toklists) t)
            SELECT
              (SELECT count(DISTINCT a.doc_id) FROM tokens a JOIN tokens b
               ON a.doc_id = b.doc_id AND a.term = 'merge'
               AND b.term = 'join' AND a.pos < b.pos)::BIGINT AS n_ordered,
              (SELECT count(DISTINCT a.doc_id) FROM tokens a JOIN tokens b
               ON a.doc_id = b.doc_id AND a.term = 'merge'
               AND b.term = 'join'
               AND abs(a.pos - b.pos) <= 3)::BIGINT AS n_within,
              (SELECT count(*) FROM (
                 SELECT doc_id FROM tokens
                 WHERE term IN ('merge', 'join', 'sort')
                 GROUP BY doc_id
                 HAVING count(DISTINCT term) >= 2))::BIGINT AS n_atleast""",
        # FunctionRangeQuery: value = 2*turn_idx+1 in [5,9) → turn_idx 2..3;
        # score IS the value; merge order = score desc, global docID asc
        "index_function_range_topk": """
            WITH m AS (SELECT doc_id, 2.0 * (doc_id % 5) + 1.0 AS v
                       FROM documents
                       WHERE 2.0 * (doc_id % 5) + 1.0 >= 5
                         AND 2.0 * (doc_id % 5) + 1.0 < 9)
            SELECT row_number() OVER (ORDER BY v DESC, doc_id ASC)::BIGINT AS rank,
                   printf('conv-%08d', doc_id // 5) AS conv_id,
                   (doc_id % 5)::BIGINT AS turn_idx,
                   v::DOUBLE AS score,
                   (SELECT count(*) FROM m)::BIGINT AS n_total
            FROM m ORDER BY v DESC, doc_id ASC LIMIT 40""",
        "quality_eval": _flagship_sql("quality_eval_oracle_sql"),
        "index_knn_filtered": _knn_filtered_sql(),
        "index_hybrid_rrf": _hybrid_rrf_sql(),
        "index_delete_query_count": _TOKS + """
            SELECT
              (SELECT count(*) FROM toklists
               WHERE list_contains(toks, 'merge')
                 AND NOT (list_contains(toks, 'merge') AND doc_id <= 250)
              )::BIGINT AS n_merge,
              (SELECT count(*) FROM toklists
               WHERE list_contains(toks, 'join')
                 AND NOT (list_contains(toks, 'merge') AND doc_id <= 250)
              )::BIGINT AS n_join""",
        "index_charfilter_count": """
            WITH ws AS (SELECT doc_id,
                               string_split(replace(text, 'fast', 'quick'),
                                            ' ') AS parts
                        FROM documents)
            SELECT
              (SELECT count(*) FROM ws
               WHERE list_contains(parts, 'quick'))::BIGINT AS n_quick,
              (SELECT count(*) FROM ws
               WHERE list_contains(parts, 'fast'))::BIGINT AS n_fast,
              (SELECT count(*) FROM ws
               WHERE len(parts) >= 2 AND len(list_filter(
                   generate_series(1, len(parts) - 1),
                   i -> parts[i] = 'quick' AND parts[i + 1] = 'table')) > 0
              )::BIGINT AS n_phrase""",
        "index_automaton_count": _TOKS + """
            SELECT
              (SELECT count(*) FROM toklists
               WHERE len(toks) >= 3 AND len(list_filter(
                   generate_series(1, len(toks) - 2),
                   i -> toks[i] = 'merge' AND toks[i + 2] = 'join')) > 0
              )::BIGINT AS n_gap,
              (SELECT count(*) FROM toklists
               WHERE len(toks) >= 2 AND len(list_filter(
                   generate_series(1, len(toks) - 1),
                   i -> toks[i] = 'merge'
                        AND (toks[i + 1] = 'join' OR toks[i + 1] = 'sort'))) > 0
              )::BIGINT AS n_union""",
        "index_phrase_count": _TOKS + """
            SELECT count(*)::BIGINT AS n_matching FROM toklists
            WHERE len(toks) >= 2 AND len(list_filter(
                generate_series(1, len(toks) - 1),
                i -> toks[i] = 'merge' AND toks[i + 1] = 'join')) > 0""",
        "index_prefix_count": _TOKS + """
            SELECT count(*)::BIGINT AS n_matching FROM toklists
            WHERE len(list_filter(toks, t -> t LIKE 's%')) > 0""",
        "index_complex_phrase_count": _TOKS + """
            SELECT count(*)::BIGINT AS n_matching FROM toklists
            WHERE len(toks) >= 2 AND len(list_filter(
                generate_series(1, len(toks) - 1),
                i -> toks[i] = 'merge' AND toks[i + 1] LIKE 'jo%')) > 0""",
        "index_phrase_wildcard_count": _TOKS + """
            SELECT count(*)::BIGINT AS n_matching FROM toklists
            WHERE len(toks) >= 2 AND len(list_filter(
                generate_series(1, len(toks) - 1),
                i -> toks[i] = 'the' AND toks[i + 1] LIKE 's%')) > 0""",
        # span-near(span-or(merge,sort), the) slop=3 ordered: exists i with
        # toks[i] in {merge,sort} and 'the' at i+1..i+4 (gap <= 3)
        "index_span_near_count": _TOKS + """
            SELECT count(*)::BIGINT AS n_matching FROM toklists
            WHERE len(list_filter(
                generate_series(1, len(toks)),
                i -> (toks[i] = 'merge' OR toks[i] = 'sort')
                     AND len(list_filter(generate_series(i + 1,
                             least(i + 4, len(toks))),
                         j -> toks[j] = 'the')) > 0)) > 0""",
        # flexible parser: (merge AND jo*) OR (scan sort filter)@2
        "index_flexible_count": _TOKS + """
            SELECT count(*)::BIGINT AS n_matching FROM toklists
            WHERE (list_contains(toks, 'merge')
                   AND len(list_filter(toks, t -> t LIKE 'jo%')) > 0)
               OR (list_contains(toks, 'scan')::INT
                   + list_contains(toks, 'sort')::INT
                   + list_contains(toks, 'filter')::INT >= 2)""",
        "index_keyword_count": _TOKS + """
            SELECT count(*)::BIGINT AS n_matching FROM toklists
            WHERE doc_id % 4 = 0 AND list_contains(toks, 'merge')""",
        # pk = 'doc-%09d' % doc_id (unique per doc), bloom-gated seekExact
        "index_pk_bloom_count": """
            SELECT
              (SELECT count(*) FROM documents
               WHERE doc_id = 117)::BIGINT AS n_present,
              (SELECT count(*) FROM documents
               WHERE doc_id = 999999999)::BIGINT AS n_absent,
              (SELECT count(*) FROM documents
               WHERE doc_id IN (1, 5, 42, 999999999))::BIGINT AS n_in_set""",
        # version = (doc_id * 13) % 5000; absent IDs report -1 / 0
        "index_pk_version_lookup": """
            WITH probe AS (SELECT unnest([7, 117, 4242, 9999999]) AS d)
            SELECT 'doc-' || lpad(d::VARCHAR, 9, '0') AS pk,
                   coalesce((SELECT (doc_id * 13) % 5000 FROM documents
                             WHERE doc_id = d), -1)::BIGINT AS version,
                   (CASE WHEN EXISTS (SELECT 1 FROM documents
                                      WHERE doc_id = d
                                        AND (doc_id * 13) % 5000 >= 2500)
                         THEN 1 ELSE 0 END)::BIGINT AS above_floor
            FROM probe ORDER BY pk""",
        "bucketed_join": """
            SELECT d.doc_id, d.lang, e.label
            FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id""",
        "index_delete_count": _TOKS + """
            SELECT count(*)::BIGINT AS n_matching FROM toklists
            WHERE doc_id % 7 <> 0 AND list_contains(toks, 'merge')""",
        "index_dv_update_count": _TOKS + """
            SELECT count(*)::BIGINT AS n_matching FROM toklists
            WHERE doc_id % 5 = 0 AND list_contains(toks, 'merge')""",
        # ts = 1700000000000000 + doc_id * 1000000 (transcript adapter), so the
        # ts window [BASE+100e6, BASE+300e6] is exactly doc_id in [100, 300]
        "index_range_count": _TOKS + """
            SELECT (SELECT count(*) FROM toklists
                    WHERE doc_id BETWEEN 100 AND 300
                      AND list_contains(toks, 'merge'))::BIGINT AS n_matching,
                   (SELECT count(*) FROM documents
                    WHERE doc_id BETWEEN 100 AND 300)::BIGINT AS n_in_range""",
        "index_point_range_count": """
            SELECT (SELECT count(*) FROM documents
                    WHERE doc_id BETWEEN 100 AND 300)::BIGINT AS n_in_range,
                   (SELECT count(*) FROM documents
                    WHERE doc_id IN (17, 99, 256))::BIGINT AS n_in_set,
                   (SELECT count(*) FROM documents
                    WHERE doc_id BETWEEN 100 AND 300
                       OR doc_id BETWEEN 400 AND 450)::BIGINT AS n_multi""",
        "index_xy_count": _xy_sql(),
        # HalfFloatPoint values are exact eighth-steps <= 62.5 (no
        # half-precision rounding), BigIntegerPoint twin runs in HUGEINT
        "index_sandbox_point_count": """
            WITH hf AS (SELECT doc_id,
                               ((doc_id * 37) % 1000 - 500) / 8.0 AS v
                        FROM documents),
                 big AS (SELECT doc_id,
                                (doc_id::HUGEINT - 3000)
                                * 1180591620717411315769::HUGEINT AS v
                         FROM documents)
            SELECT (SELECT count(*) FROM hf
                    WHERE v BETWEEN -12.25 AND 30.5)::BIGINT AS n_hf_range,
                   (SELECT count(*) FROM hf
                    WHERE v IN (0.0, 3.125, 9999.0))::BIGINT AS n_hf_set,
                   (SELECT count(*) FROM big
                    WHERE v BETWEEN
                      (100::HUGEINT - 3000) * 1180591620717411315769::HUGEINT + 1
                      AND (900::HUGEINT - 3000) * 1180591620717411315769::HUGEINT - 1
                   )::BIGINT AS n_big_range""",
        # ip = 10.<(doc_id*97)%2^24 spread>; iprange offsets relative to
        # 172.16.0.0 (o in [a<<8|b]); query bounds as plain integers
        "index_inet_count": """
            WITH ip AS (SELECT doc_id, (doc_id * 97) % 16777216 AS o,
                               (doc_id % 2048) * 16 AS rlo,
                               (doc_id % 2048) * 16 + doc_id % 29 AS rhi
                        FROM documents)
            SELECT
              (SELECT count(*) FROM ip
               WHERE o = (117 * 97) % 16777216)::BIGINT AS n_exact,
              (SELECT count(*) FROM ip
               WHERE o BETWEEN 4194304 AND 8388607)::BIGINT AS n_prefix,
              (SELECT count(*) FROM ip
               WHERE o BETWEEN 2097152 AND 10485759)::BIGINT AS n_range,
              (SELECT count(*) FROM ip
               WHERE rlo <= 30975 AND rhi >= 10240)::BIGINT AS n_intersects,
              (SELECT count(*) FROM ip
               WHERE rlo >= 10240 AND rhi <= 30975)::BIGINT AS n_within,
              (SELECT count(*) FROM ip
               WHERE rlo <= 10240 AND rhi >= 30975)::BIGINT AS n_contains,
              (SELECT count(*) FROM ip
               WHERE rlo <= 30975 AND rhi >= 10240
                 AND NOT (rlo >= 10240 AND rhi <= 30975))::BIGINT
                 AS n_crosses""",
        "index_covering_count": _TOKS + """
            , cov AS (SELECT doc_id,
                             list_contains(toks, 'merge')::INT
                             + list_contains(toks, 'join')::INT
                             + list_contains(toks, 'sort')::INT AS cnt
                      FROM toklists)
            SELECT (SELECT count(*) FROM cov
                    WHERE cnt >= 1 + doc_id % 3)::BIGINT AS n_dv_min,
                   (SELECT count(*) FROM cov
                    WHERE cnt >= 2)::BIGINT AS n_const_min,
                   (SELECT count(*) FROM documents
                    WHERE 1 + doc_id % 3 IN (1, 3))::BIGINT AS n_dv_in_set""",
        "index_range_field_count": """
            WITH spans AS (SELECT doc_id, doc_id % 211 AS lo,
                                  doc_id % 211 + doc_id % 37 AS hi
                           FROM documents)
            SELECT
              (SELECT count(*) FROM spans
               WHERE lo <= 120 AND hi >= 50)::BIGINT AS n_intersects,
              (SELECT count(*) FROM spans
               WHERE lo >= 50 AND hi <= 120)::BIGINT AS n_within,
              (SELECT count(*) FROM spans
               WHERE lo <= 50 AND hi >= 120)::BIGINT AS n_contains,
              (SELECT count(*) FROM spans
               WHERE lo <= 120 AND hi >= 50
                 AND NOT (lo >= 50 AND hi <= 120))::BIGINT AS n_crosses""",
        "index_geo_count": _geo_sql(),
        "index_shape_count": _shape_sql(),
        "index_shape_holes_count": _shape_holes_sql(),
        "index_geo_polygon_count": _geo_polygon_sql(),
        "index_geo_distance_topk": _geo_dist_topk_sql(),
        "index_distance_feature_topk": _long_distfeat_sql(),
        # facet sets: two (a, b) sets per doc — pair counts per matcher,
        # distinct-doc total (MatchingFacetSetsCounts semantics)
        "index_facetset_counts": _TOKS + """,
            m AS (SELECT doc_id FROM toklists
                  WHERE list_contains(toks, 'merge')),
            p AS (SELECT doc_id, doc_id % 7 AS a, doc_id % 11 AS b FROM m
                  UNION ALL
                  SELECT doc_id, doc_id % 5 AS a, doc_id % 13 + 8 AS b FROM m),
            f AS (SELECT doc_id,
                         (a = 3 AND b = 4) AS m1,
                         (a BETWEEN 2 AND 4 AND b BETWEEN 5 AND 9) AS m2,
                         (a BETWEEN 4 AND 6 AND b BETWEEN 8 AND 20) AS m3
                  FROM p)
            SELECT
              (SELECT count(DISTINCT doc_id) FROM f
               WHERE m1 OR m2 OR m3)::BIGINT AS total,
              (SELECT count(*) FROM f WHERE m1)::BIGINT AS n_exact_3_4,
              (SELECT count(*) FROM f WHERE m2)::BIGINT AS n_mid,
              (SELECT count(*) FROM f WHERE m3)::BIGINT AS n_hi""",
        "index_geo_distfeat_topk": _geo_distfeat_sql(),
        "index_expr_sorted_topk": _TOKS + """
            , m AS (SELECT doc_id FROM toklists
                    WHERE list_contains(toks, 'merge')),
            v AS (SELECT doc_id,
                         ln(1 + (doc_id % 5))
                         + (1700000000000000 + doc_id * 1000000)
                           / 100000000000000000 AS sort_value
                  FROM m)
            SELECT row_number() OVER (ORDER BY sort_value DESC, doc_id ASC)::BIGINT AS rank,
                   printf('conv-%08d', doc_id // 5) AS conv_id,
                   (doc_id % 5)::BIGINT AS turn_idx,
                   sort_value
            FROM v ORDER BY sort_value DESC, doc_id ASC LIMIT 15""",
        "index_feature_topk": """
            WITH feat AS (SELECT doc_id, (doc_id % 97 + 1) AS s FROM documents)
            SELECT row_number() OVER (ORDER BY s DESC, doc_id ASC)::BIGINT AS rank,
                   printf('conv-%08d', doc_id // 5) AS conv_id,
                   (doc_id % 5)::BIGINT AS turn_idx,
                   CAST(CAST(1.5 * ln(CAST(CAST(0.5 + s AS FLOAT) AS DOUBLE))
                        AS FLOAT) AS DOUBLE) AS score_log,
                   CAST(CAST(2.0 AS FLOAT) * (CAST(1.0 AS FLOAT)
                        - CAST(8.0 AS FLOAT) / (CAST(s AS FLOAT)
                        + CAST(8.0 AS FLOAT))) AS DOUBLE) AS score_sat
            FROM feat ORDER BY s DESC, doc_id ASC LIMIT 15""",
        "index_sorted_topk": _TOKS + """
            SELECT row_number() OVER (ORDER BY (doc_id % 5) DESC, doc_id ASC)::BIGINT AS rank,
                   printf('conv-%08d', doc_id // 5) AS conv_id,
                   (doc_id % 5)::BIGINT AS turn_idx,
                   (doc_id % 5)::BIGINT AS sort_value
            FROM toklists WHERE list_contains(toks, 'merge')
            ORDER BY (doc_id % 5) DESC, doc_id ASC LIMIT 15""",
        # multi-valued dv twins: mv_num_j = (doc_id*7 + j*131) %% 500 for
        # j < doc_id %% 4; mv_str_j = 't%02d' %% ((doc_id*(j*17+13)) %% 23)
        # for j < doc_id %% 3 (distinct-set semantics)
        "index_sorted_numeric_topk": _TOKS + """,
            m AS (SELECT doc_id FROM toklists WHERE list_contains(toks, 'merge')),
            v AS (SELECT doc_id,
                         coalesce(list_aggregate(list_transform(
                             range(0, CAST(doc_id % 4 AS INT)),
                             j -> (doc_id * 7 + j * 131) % 500), 'max'),
                             -1) AS sort_value
                  FROM m)
            SELECT row_number() OVER (ORDER BY sort_value DESC, doc_id ASC)::BIGINT AS rank,
                   printf('conv-%08d', doc_id // 5) AS conv_id,
                   (doc_id % 5)::BIGINT AS turn_idx,
                   sort_value::BIGINT AS sort_value
            FROM v ORDER BY sort_value DESC, doc_id ASC LIMIT 15""",
        "index_sorted_set_topk": _TOKS + """,
            m AS (SELECT doc_id FROM toklists WHERE list_contains(toks, 'merge')),
            t AS (SELECT doc_id,
                         list_sort(list_distinct(list_transform(
                             range(0, CAST(doc_id % 3 AS INT)),
                             j -> printf('t%02d', (doc_id * (j * 17 + 13)) % 23)))) AS l
                  FROM m),
            v AS (SELECT doc_id, l[len(l) // 2 + 1] AS sel FROM t)
            SELECT row_number() OVER (ORDER BY sel ASC NULLS FIRST, doc_id ASC)::BIGINT AS rank,
                   printf('conv-%08d', doc_id // 5) AS conv_id,
                   (doc_id % 5)::BIGINT AS turn_idx,
                   coalesce(sel, '') AS sort_tag
            FROM v ORDER BY sel ASC NULLS FIRST, doc_id ASC LIMIT 15""",
        "index_multivalue_range_count": """
            WITH v AS (SELECT doc_id,
                   list_transform(range(0, CAST(doc_id % 4 AS INT)),
                                  j -> (doc_id * 7 + j * 131) % 500) AS nums,
                   list_transform(range(0, CAST(doc_id % 3 AS INT)),
                                  j -> printf('t%02d', (doc_id * (j * 17 + 13)) % 23)) AS tags
                       FROM documents)
            SELECT (SELECT count(*) FROM v WHERE len(list_filter(nums,
                        x -> x >= 100 AND x <= 220)) > 0)::BIGINT AS n_num,
                   (SELECT count(*) FROM v
                        WHERE list_contains(nums, 150))::BIGINT AS n_num_exact,
                   (SELECT count(*) FROM v WHERE len(list_filter(tags,
                        s -> s >= 't03' AND s <= 't07')) > 0)::BIGINT AS n_str,
                   (SELECT count(*) FROM v WHERE len(list_filter(tags,
                        s -> s > 't03' AND s < 't07')) > 0)::BIGINT AS n_str_excl,
                   (SELECT count(*) FROM v WHERE len(list_filter(tags,
                        s -> regexp_matches(s, '^t.2$'))) > 0)::BIGINT AS n_wild""",
        "index_ssdv_facets": _TOKS + """,
            m AS (SELECT doc_id FROM toklists WHERE list_contains(toks, 'merge')),
            t AS (SELECT doc_id, list_distinct(list_transform(
                      range(0, CAST(doc_id % 3 AS INT)),
                      j -> printf('t%02d', (doc_id * (j * 17 + 13)) % 23))) AS tags
                  FROM m),
            u AS (SELECT unnest(tags) AS tag FROM t),
            c AS (SELECT tag, count(*)::BIGINT AS n_docs FROM u GROUP BY tag),
            d AS (SELECT count(*)::BIGINT AS dim_count FROM t WHERE len(tags) > 0)
            SELECT row_number() OVER (ORDER BY n_docs DESC, tag ASC)::BIGINT AS rank,
                   tag, n_docs, (SELECT dim_count FROM d) AS dim_count
            FROM c ORDER BY n_docs DESC, tag ASC LIMIT 8""",
        # adapter: role = ['user','assistant','system','tool'][doc_id %% 4]
        "index_facet_role": """
            WITH r AS (SELECT doc_id,
                              ['user','assistant','system','tool'][doc_id % 4 + 1] AS role
                       FROM documents)
            SELECT role, count(*)::BIGINT AS n_docs FROM r
            GROUP BY role ORDER BY role""",
        "index_term_range_count": _TOKS + """
            SELECT (SELECT count(*) FROM toklists WHERE len(list_filter(
                        toks, t -> t >= 'merge' AND t <= 'sort')) > 0)::BIGINT
                       AS n_incl,
                   (SELECT count(*) FROM toklists WHERE len(list_filter(
                        toks, t -> t > 'merge' AND t < 'sort')) > 0)::BIGINT
                       AS n_excl""",
        "index_dv_stats": _TOKS + """,
            m AS (SELECT (doc_id % 5)::DOUBLE AS v FROM toklists
                  WHERE list_contains(toks, 'merge'))
            SELECT count(*)::BIGINT AS n_count,
                   min(v)::BIGINT AS v_min, max(v)::BIGINT AS v_max,
                   sum(v)::BIGINT AS v_sum,
                   round(avg(v), 6) AS v_mean,
                   round(var_pop(v), 6) AS v_var,
                   round(stddev_pop(v), 6) AS v_stdev
            FROM m""",
        # expression value = ln(1 + turn_idx) + ts/1e17 (same double math as
        # the index_expr_sorted_topk twin); boundaries far from any value
        "index_expr_range_count": """
            WITH v AS (SELECT doc_id,
                              ln(1 + (doc_id % 5))
                              + (1700000000000000 + doc_id * 1000000)
                                / 100000000000000000 AS val
                       FROM documents)
            SELECT count(*)::BIGINT AS n_matching FROM v
            WHERE val >= 0.5 AND val <= 1.5""",
        # constant-score heads tie-break by gid asc -> min(doc_id) per group
        "index_all_group_heads": _TOKS + """,
            m AS (SELECT doc_id FROM toklists
                  WHERE list_contains(toks, 'merge')),
            r AS (SELECT doc_id,
                         ['user','assistant','system','tool'][doc_id % 4 + 1]
                             AS role FROM m),
            h AS (SELECT role, min(doc_id) AS doc_id FROM r GROUP BY role)
            SELECT role, printf('conv-%08d', doc_id // 5) AS conv_id,
                   (doc_id % 5)::BIGINT AS turn_idx,
                   (SELECT count(DISTINCT role) FROM r)::BIGINT AS n_groups
            FROM h ORDER BY role""",
        # interval relation functions: ordered(merge join) span = [m, j+1)
        # over 1-based positions; notContaining excludes sort at k in [m, j];
        # within(merge 3 join) = |m - j| <= 3 (extend(join,3,3) containment);
        # notContainedBy(sort, ordered(the data)) = a sort outside every
        # the..data envelope
        "index_interval_fn_count": _TOKS + """,
            tp AS (SELECT doc_id, unnest(toks) AS term,
                          unnest(range(1, len(toks) + 1)) AS pos FROM toklists)
            SELECT
              (SELECT count(DISTINCT a.doc_id) FROM tp a JOIN tp b
                 ON a.doc_id = b.doc_id AND a.term = 'merge'
                AND b.term = 'join' AND b.pos > a.pos
                WHERE NOT EXISTS (SELECT 1 FROM tp k
                    WHERE k.doc_id = a.doc_id AND k.term = 'sort'
                      AND k.pos BETWEEN a.pos AND b.pos))::BIGINT
                AS n_not_containing,
              (SELECT count(DISTINCT a.doc_id) FROM tp a JOIN tp b
                 ON a.doc_id = b.doc_id AND a.term = 'merge'
                AND b.term = 'join'
                AND abs(a.pos - b.pos) <= 3)::BIGINT AS n_within,
              (SELECT count(DISTINCT s.doc_id) FROM tp s
                WHERE s.term = 'sort' AND NOT EXISTS (
                    SELECT 1 FROM tp a JOIN tp b
                      ON a.doc_id = b.doc_id AND a.term = 'the'
                     AND b.term = 'data' AND b.pos > a.pos
                    WHERE a.doc_id = s.doc_id
                      AND s.pos BETWEEN a.pos AND b.pos))::BIGINT
                AS n_not_contained_by""",
        # payload of the token at 1-based pos is ((pos - 1) % 5) + 1 (the
        # transform attaches |((0-based pos % 5) + 1) to every token)
        "index_payload_topk": _TOKS + """,
            tp AS (SELECT doc_id, unnest(toks) AS term,
                          unnest(range(1, len(toks) + 1)) AS pos FROM toklists),
            p AS (SELECT doc_id, SUM((pos - 1) % 5 + 1) AS psum
                  FROM tp WHERE term = 'merge' GROUP BY doc_id)
            SELECT row_number() OVER (ORDER BY psum DESC, doc_id ASC)::BIGINT AS rank,
                   printf('conv-%08d', doc_id // 5) AS conv_id,
                   (doc_id % 5)::BIGINT AS turn_idx,
                   psum::DOUBLE AS payload_sum
            FROM p ORDER BY psum DESC, doc_id ASC LIMIT 20""",
        "index_payload_check_count": _TOKS + """
            SELECT (SELECT count(*) FROM toklists
                    WHERE len(toks) >= 2 AND len(list_filter(
                        generate_series(1, len(toks) - 1),
                        i -> toks[i] = 'merge' AND toks[i + 1] = 'join'
                             AND ((i - 1) % 5) + 1 = 2)) > 0)::BIGINT AS n_checked,
                   (SELECT count(*) FROM toklists
                    WHERE len(toks) >= 2 AND len(list_filter(
                        generate_series(1, len(toks) - 1),
                        i -> toks[i] = 'merge'
                             AND toks[i + 1] = 'join')) > 0)::BIGINT AS n_phrase""",
        "index_interval_count": _TOKS + """,
            tp AS (SELECT doc_id, unnest(toks) AS term,
                          unnest(range(1, len(toks) + 1)) AS pos FROM toklists)
            SELECT (SELECT count(DISTINCT a.doc_id) FROM tp a JOIN tp b
                      ON a.doc_id = b.doc_id AND a.term = 'merge' AND b.term = 'join'
                     AND b.pos > a.pos AND b.pos - a.pos + 1 <= 5)::BIGINT AS n_ordered,
                   (SELECT count(DISTINCT a.doc_id) FROM tp a JOIN tp b
                      ON a.doc_id = b.doc_id AND a.term = 'merge' AND b.term = 'join'
                     AND abs(b.pos - a.pos) + 1 <= 5)::BIGINT AS n_unordered""",
        # Porter preimages within the closed corpus vocabulary:
        # stem('merge')='merg' (only 'merge'), stem('query')='queri'
        "index_stemmed_count": _TOKS + """
            SELECT (SELECT count(*) FROM toklists
                    WHERE list_contains(toks, 'merge'))::BIGINT AS n_merges,
                   (SELECT count(*) FROM toklists
                    WHERE list_contains(toks, 'query'))::BIGINT AS n_queries""",
        # syn:join=merge -> 'merge' matches docs with merge OR join; phrase
        # 'merge sort' matches (merge|join) immediately followed by sort
        "index_synonym_count": _TOKS + """
            SELECT (SELECT count(*) FROM toklists
                    WHERE list_contains(toks, 'merge')
                       OR list_contains(toks, 'join'))::BIGINT AS n_merge,
                   (SELECT count(*) FROM toklists
                    WHERE len(toks) >= 2 AND len(list_filter(
                        generate_series(1, len(toks) - 1),
                        i -> toks[i] IN ('merge', 'join')
                             AND toks[i + 1] = 'sort')) > 0)::BIGINT AS n_phrase""",
        "index_shingle_count": _TOKS + """
            SELECT (SELECT count(*) FROM toklists
                    WHERE len(toks) >= 2 AND len(list_filter(
                        generate_series(1, len(toks) - 1),
                        i -> toks[i] = 'merge' AND toks[i + 1] = 'join')) > 0
                   )::BIGINT AS n_bigram,
                   (SELECT count(*) FROM toklists
                    WHERE list_contains(toks, 'merge'))::BIGINT AS n_unigram""",
        # stopwords leave position gaps: phrase adjacency == ORIGINAL stream
        # adjacency, stop terms themselves never match
        "index_stop_count": _TOKS + """
            SELECT 0::BIGINT AS n_the,
                   (SELECT count(*) FROM toklists
                    WHERE list_contains(toks, 'merge'))::BIGINT AS n_merge,
                   (SELECT count(*) FROM toklists
                    WHERE len(toks) >= 2 AND len(list_filter(
                        generate_series(1, len(toks) - 1),
                        i -> toks[i] = 'merge' AND toks[i + 1] = 'join')) > 0
                   )::BIGINT AS n_phrase""",
        "index_sorted_ts_topk": _TOKS + """
            SELECT row_number() OVER (ORDER BY doc_id DESC)::BIGINT AS rank,
                   printf('conv-%08d', doc_id // 5) AS conv_id,
                   (doc_id % 5)::BIGINT AS turn_idx,
                   (1700000000000000 + doc_id * 1000000)::BIGINT AS ts_us
            FROM toklists WHERE list_contains(toks, 'merge') AND doc_id <= 300
            ORDER BY doc_id DESC LIMIT 15""",
        "percolate": _TOKS + " " + _percolate_sql(),
        "quantize_embeddings": """
            SELECT vec_id,
                   CASE WHEN amax > 0 THEN amax / 127.0 ELSE 1.0 END AS scale,
                   CAST(list_sum(list_transform(embedding, x ->
                        greatest(-127.0, least(127.0, floor(x /
                        (CASE WHEN amax > 0 THEN amax / 127.0 ELSE 1.0 END)
                        + 0.5))))) AS BIGINT) AS q_sum,
                   CAST(list_sum(list_transform(embedding, x ->
                        abs(greatest(-127.0, least(127.0, floor(x /
                        (CASE WHEN amax > 0 THEN amax / 127.0 ELSE 1.0 END)
                        + 0.5)))))) AS BIGINT) AS q_l1,
                   CAST(list_max(list_transform(embedding, x ->
                        greatest(-127.0, least(127.0, floor(x /
                        (CASE WHEN amax > 0 THEN amax / 127.0 ELSE 1.0 END)
                        + 0.5))))) AS BIGINT) AS q_max
            FROM (SELECT vec_id, embedding,
                         list_max(list_transform(embedding, x ->
                             CAST(abs(x) AS DOUBLE))) AS amax
                  FROM embeddings)""",
        "drill_sideways": """
            SELECT 'lang' AS dim, lang AS value, count(*)::BIGINT AS n_docs
            FROM documents WHERE source = 'src7' GROUP BY lang
            UNION ALL
            SELECT 'source', source, count(*)::BIGINT
            FROM documents WHERE lang = 'en' GROUP BY source
            UNION ALL
            SELECT 'hits', '', count(*)::BIGINT
            FROM documents WHERE lang = 'en' AND source = 'src7'""",
        "suggest_analyzing": """
            WITH keyed AS (
              SELECT text AS surface, n_chars::BIGINT AS weight,
                     array_to_string(list_transform(
                         regexp_extract_all(text, '[A-Za-z0-9]+'),
                         x -> lower(x)), chr(31)) AS key
              FROM documents)
            SELECT surface, max(weight) AS weight FROM keyed
            WHERE starts_with(key, 'merge')
            GROUP BY key, surface
            ORDER BY weight DESC, key ASC, surface ASC LIMIT 10""",
        # BlendedInfixSuggester: infix candidates (first token-prefix match
        # position), top num*num_factor=100 by (weight desc, pos asc, key
        # asc — the store's stable scan order), weight adjustments (0→1,
        # |w|<10 ×10), position_linear coefficient, trunc, re-rank
        "suggest_blended": """
            WITH keyed AS (
              SELECT text AS surface, n_chars::BIGINT AS w,
                     list_transform(regexp_extract_all(text, '[A-Za-z0-9]+'),
                                    x -> lower(x)) AS toks,
                     array_to_string(list_transform(
                         regexp_extract_all(text, '[A-Za-z0-9]+'),
                         x -> lower(x)), chr(31)) AS key
              FROM documents),
            m AS (
              SELECT surface, w, key,
                     list_aggregate(list_filter(list_apply(toks,
                         (x, i) -> CASE WHEN starts_with(x, 'merge')
                                   THEN i - 1 ELSE NULL END),
                         x -> x IS NOT NULL), 'min') AS pos
              FROM keyed
              WHERE len(list_filter(toks, x -> starts_with(x, 'merge'))) > 0),
            cut AS (
              SELECT *, row_number() OVER (ORDER BY w DESC, pos ASC,
                                           key ASC) AS rn
              FROM m),
            blended AS (
              SELECT surface,
                     trunc((CASE WHEN w = 0 THEN 1
                                 WHEN w > -10 AND w < 10 THEN w * 10
                                 ELSE w END) * (1.0 - 0.10 * pos))::BIGINT
                         AS score
              FROM cut WHERE rn <= 100)
            SELECT surface, score FROM blended
            ORDER BY score DESC, surface ASC LIMIT 10""",
        # FuzzySuggester: some prefix of the analyzed key within 1 DAMERAU
        # edit of 'mergw' (prefix lengths m-1..m+1 are the only candidates
        # at maxEdits=1), first char fixed (nonFuzzyPrefix=1), exact key
        # first then weight desc / key asc — the engine's queue order
        "suggest_fuzzy": """
            WITH keyed AS (
              SELECT text AS surface, n_chars::BIGINT AS weight,
                     array_to_string(list_transform(
                         regexp_extract_all(text, '[A-Za-z0-9]+'),
                         x -> lower(x)), chr(31)) AS key
              FROM documents),
            dedup AS (SELECT key, surface, max(weight) AS weight
                      FROM keyed GROUP BY key, surface),
            cand AS (
              SELECT * FROM dedup
              WHERE starts_with(key, 'm') AND (
                    damerau_levenshtein(substr(key, 1, 4), 'mergw') <= 1
                 OR damerau_levenshtein(substr(key, 1, 5), 'mergw') <= 1
                 OR damerau_levenshtein(substr(key, 1, 6), 'mergw') <= 1))
            SELECT surface, weight FROM cand
            ORDER BY (key = 'mergw') DESC, weight DESC, key ASC LIMIT 10""",
        "suggest_contexts": """
            WITH keyed AS (
              SELECT text AS surface, n_chars::BIGINT AS weight, lang,
                     array_to_string(list_transform(
                         regexp_extract_all(text, '[A-Za-z0-9]+'),
                         x -> lower(x)), chr(31)) AS key
              FROM documents)
            SELECT surface, max(weight) AS weight FROM keyed
            WHERE starts_with(key, 'merge') AND lang = 'en'
            GROUP BY key, surface
            ORDER BY weight DESC, key ASC, surface ASC LIMIT 10""",
        "media_features": """
            SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes,
                   md5(text) AS payload_md5
            FROM documents""",
        "media_frames": """
            SELECT doc_id,
                   ceil(octet_length(encode(text)) / 64.0)::BIGINT AS n_frames,
                   ceil(ceil(octet_length(encode(text)) / 64.0) / 4.0)::BIGINT AS n_sampled
            FROM documents""",
        "media_image_pixel_stats": _media_image_sql(),
        "media_audio_sample_stats": _media_audio_sql(),
        "index_geo3d_count": _geo3d_sql(),
        "index_geo3d_wgs84_count": _geo3d_wgs84_sql(),
        "dsir_select": _dsir_sql(),
        # MatchHighlighter with an unbounded window: snippet == full text
        # with every 'merge' TOKEN wrapped (word-boundary replace)
        "index_matchhl_topk": _TOKS + """
            SELECT row_number() OVER (ORDER BY (t.doc_id % 5) DESC,
                                      t.doc_id ASC)::BIGINT AS rank,
                   printf('conv-%08d', t.doc_id // 5) AS conv_id,
                   (t.doc_id % 5)::BIGINT AS turn_idx,
                   regexp_replace(d.text, '\\bmerge\\b', '>merge<', 'g')
                       AS snippet
            FROM toklists t JOIN documents d ON t.doc_id = d.doc_id
            WHERE list_contains(t.toks, 'merge')
            ORDER BY (t.doc_id % 5) DESC, t.doc_id ASC LIMIT 10""",
        # SpellChecker suggestSimilar: candidates share a query n-gram with
        # n inside BOTH length ranges (getMin/getMax); accuracy 0.35 and the
        # ordering are integer-exact (dist/ml <= 0.65 <=> 20*dist <= 13*ml)
        "spellcheck_suggest": _TOKS + """
            , words AS (SELECT DISTINCT term AS w FROM tokens
                        WHERE length(term) >= 3),
            cand AS (
              SELECT w FROM words WHERE w <> 'parts' AND (
                CASE WHEN length(w) > 5 THEN
                       (w LIKE '%par%' OR w LIKE '%art%' OR w LIKE '%rts%')
                     WHEN length(w) = 5 THEN
                       (w LIKE '%pa%' OR w LIKE '%ar%' OR w LIKE '%rt%'
                        OR w LIKE '%ts%' OR w LIKE '%par%' OR w LIKE '%art%'
                        OR w LIKE '%rts%')
                     ELSE
                       (w LIKE '%pa%' OR w LIKE '%ar%' OR w LIKE '%rt%'
                        OR w LIKE '%ts%')
                END)),
            scored AS (
              SELECT w AS word, levenshtein('parts', w)::BIGINT AS dist,
                     greatest(5, length(w)) AS ml
              FROM cand)
            SELECT word, dist, round(1.0 - dist::DOUBLE / ml, 4) AS score
            FROM scored WHERE 20 * dist <= 13 * ml
            ORDER BY dist::DOUBLE / ml ASC, word ASC LIMIT 5""",
        "classify_naive_bayes": _classify_nb_sql(),
        "classify_confusion": _classify_confusion_sql(),
        "dataset_split_stratified": _dataset_split_stratified_sql(),
        "percolate_ast": _TOKS + " " + _percolate_ast_sql(),
        "percolate_tree": _TOKS + " " + _percolate_tree_sql(),
        "lm_doc_scores": _lm_scores_sql(),
        "curation_pipeline": _curation_sql(),
        "suggest_freetext": _suggest_freetext_sql(),
        "suggest_wfst": _TOKS + """
            , tc AS (SELECT term, count(*)::BIGINT AS c FROM tokens GROUP BY term)
            SELECT term AS key, c AS weight FROM tc
            WHERE term LIKE 's%' ORDER BY c DESC, key LIMIT 5""",
        "suggest_fst_bucketed": _TOKS + """
            , tc AS (SELECT term, count(*)::BIGINT AS c FROM tokens GROUP BY term),
            ranked AS (SELECT term, c,
                              row_number() OVER (ORDER BY c, term) - 1 AS rn,
                              count(*) OVER () AS n
                       FROM tc),
            firstrn AS (SELECT c, min(rn) AS frn, any_value(n) AS n
                        FROM ranked GROUP BY c),
            bucketed AS (SELECT r.term, (f.frn * 4) // f.n AS bucket
                         FROM ranked r JOIN firstrn f USING (c))
            SELECT term AS key, bucket FROM bucketed
            WHERE term LIKE 's%' ORDER BY bucket DESC, key LIMIT 10""",
        # rows-only (non-SQL-expressible / approximate): dedup_minhash,
        # dedup_simhash_pairs, ngram_jaccard, knn_lsh, knn_ivf, knn_hnsw,
        # dedup_embedding_lsh, index_bm25_topk, suggest_fuzzy (Damerau
        # prefix automaton), classify_knn (doc-vs-doc BM25 self-join)
    }


def _lm_scores_sql() -> str:
    from lucene_ray.pipelines.textstats import lm_doc_scores_oracle_sql

    return lm_doc_scores_oracle_sql()


def _percolate_tree_sql() -> str:
    from lucene_ray.pipelines.querytree import percolate_tree_oracle_sql

    return percolate_tree_oracle_sql()


def _classify_nb_sql() -> str:
    from lucene_ray.pipelines.classify import naive_bayes_oracle_sql

    return naive_bayes_oracle_sql()


def _dataset_split_stratified_sql() -> str:
    from lucene_ray.pipelines.classify import dataset_split_stratified_sql

    return dataset_split_stratified_sql()


def _classify_confusion_sql() -> str:
    from lucene_ray.pipelines.classify import confusion_oracle_sql

    return confusion_oracle_sql()


def _redact_sql() -> str:
    from lucene_ray.pipelines.textstats import redact_oracle_sql

    return redact_oracle_sql()


def _dataset_split_sql() -> str:
    from lucene_ray.pipelines.textstats import dataset_split_oracle_sql

    return dataset_split_oracle_sql()


def _contamination_sql() -> str:
    from lucene_ray.pipelines.dedup import contamination_oracle_sql

    return contamination_oracle_sql()


def _deciles_sql() -> str:
    from lucene_ray.pipelines.textstats import doc_length_deciles_oracle_sql

    return doc_length_deciles_oracle_sql()


def _export_splits(sf_dir):
    from lucene_ray.pipelines.textstats import export_splits

    return export_splits(sf_dir)[["split", "n_docs"]]


def _percolate_ast_sql() -> str:
    from lucene_ray.pipelines.percolate import percolate_ast_oracle_sql

    return percolate_ast_oracle_sql()


def _suggest_freetext_sql() -> str:
    from lucene_ray.pipelines.suggesters import suggest_freetext_oracle_sql

    return suggest_freetext_oracle_sql()


def _index_bm25_oracle_sql() -> str:
    from lucene_ray.pipelines.flagship import index_bm25_oracle_sql

    return index_bm25_oracle_sql()


def _index_diversified_sql() -> str:
    from lucene_ray.pipelines.flagship import index_diversified_oracle_sql

    return index_diversified_oracle_sql()


def _index_grouped_sql() -> str:
    from lucene_ray.pipelines.flagship import index_grouped_oracle_sql

    return index_grouped_oracle_sql()


def _index_bool_oracle_sql() -> str:
    from lucene_ray.pipelines.flagship import index_bool_oracle_sql

    return index_bool_oracle_sql()


def _percolate_sql() -> str:
    from lucene_ray.pipelines.percolate import percolate_oracle_sql

    return percolate_oracle_sql()


def _expr_sql() -> str:
    from lucene_ray.pipelines.flagship import index_expr_oracle_sql

    return index_expr_oracle_sql()


def _mlt_sql() -> str:
    from lucene_ray.pipelines.flagship import index_mlt_oracle_sql

    return index_mlt_oracle_sql()


def _conv_join_sql() -> str:
    from lucene_ray.pipelines.flagship import index_conv_oracle_sql

    return index_conv_oracle_sql()


def _flagship_sql(fn_name: str) -> str:
    from lucene_ray.pipelines import flagship

    return getattr(flagship, fn_name)()


def _index_join_sql() -> str:
    from lucene_ray.pipelines.flagship import index_join_oracle_sql

    return index_join_oracle_sql()


def _index_join_count_sql() -> str:
    from lucene_ray.pipelines.flagship import index_join_count_oracle_sql

    return index_join_count_oracle_sql()


def _knn_filtered_sql() -> str:
    from lucene_ray.pipelines.vsearch import index_knn_filtered_oracle_sql

    return index_knn_filtered_oracle_sql()


def _hybrid_rrf_sql() -> str:
    from lucene_ray.pipelines.vsearch import index_hybrid_rrf_oracle_sql

    return index_hybrid_rrf_oracle_sql()
