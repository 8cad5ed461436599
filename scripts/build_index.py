#!/usr/bin/env python
"""Build (or resume) an inverted index from transcript parquet.

The `IndexFiles` demo equivalent (`lucene/demo/.../IndexFiles.java:58`),
runnable directly or via `ray job submit -- python scripts/build_index.py ...`.

    python scripts/build_index.py --input /data/transcripts --index /data/index \
        [--append] [--target-docs 200000] [--keyword-cols role,tool] [--num-cpus 32]
"""

import argparse
import json
import os
import sys

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, _REPO)
# ray workers import lucene_ray too
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet file/dir of transcripts")
    ap.add_argument("--index", required=True, help="output index directory")
    ap.add_argument("--append", action="store_true", help="append to an existing index")
    ap.add_argument("--update", action="store_true",
                    help="with --append: updateDocument semantics (appended keys delete their older versions)")
    ap.add_argument("--target-docs", type=int, default=200_000)
    ap.add_argument("--keyword-cols", default="", help="comma-separated keyword columns")
    ap.add_argument("--docvalue-cols", default="",
                    help="comma-separated numeric/timestamp doc-values columns (RangeQuery/sort)")
    ap.add_argument("--vector-col", default="",
                    help="list<float> column to index as per-shard vectors + HNSW")
    ap.add_argument("--analyzer", default="",
                    help="per-language analyzer preset (english, german, "
                         "french, ... — see ANALYZER_PRESETS); extra "
                         "--token-filters append after it")
    ap.add_argument("--bloom-cols", default="",
                    help="comma-separated keyword columns that get a "
                         "per-shard bloom-filter term sidecar (PK lookups)")
    ap.add_argument("--synonyms", default="", metavar="FILE[:wordnet][:noexpand]",
                    help="synonym rule file (Solr flat format by default, "
                         ":wordnet for the WordNet prolog format; :noexpand "
                         "maps classes to their first term) — appended to "
                         "the filter chain as syn:/synmap: stages")
    ap.add_argument("--token-filters", default="",
                    help="comma-separated analyzer filters applied index+query side (ascii_fold,porter)")
    ap.add_argument("--point-cols", default="",
                    help="BKD point fields: field=col or field=col1:col2 "
                         "(int/timestamp columns), comma-separated")
    ap.add_argument("--geo-col", default="",
                    help="field=latCol:lonCol — degree columns quantized "
                         "(GeoEncodingUtils int32) into a 2-D point field")
    ap.add_argument("--index-sort", default="", metavar="FIELD:asc|desc[,..]",
                    help="index-time sort (IndexWriterConfig.setIndexSort): "
                         "local docIDs follow this field chain")
    ap.add_argument("--bp-reorder", action="store_true",
                    help="recursive-graph-bisection doc layout per shard "
                         "(Dhulipala et al. KDD'16): smaller postings, "
                         "incompatible with block-join adjacency")
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--force-merge", type=int, default=0, metavar="N",
                    help="after building, forceMerge the index down to N segments")
    ap.add_argument("--maybe-merge", action="store_true",
                    help="after building, run the tiered merge policy "
                         "(consolidates undersized / delete-heavy segments)")
    args = ap.parse_args()

    import ray

    from lucene_ray.util.warmup import set_worker_env

    set_worker_env()
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import ray.data as rd

    from lucene_ray.index.build import append_index, build_index

    ds = rd.read_parquet(args.input)
    point_cols = {}
    for spec in (s for s in args.point_cols.split(",") if s):
        field, cols = spec.split("=")
        point_cols[field] = tuple(cols.split(":"))
    if args.geo_col:
        field, cols = args.geo_col.split("=")
        lat_col, lon_col = cols.split(":")

        def add_geo_enc(batch):
            import numpy as np
            import pyarrow as geo_pa

            from lucene_ray.search.geo import encode_latitude, encode_longitude

            lat = batch.column(lat_col).to_numpy(zero_copy_only=False).astype(np.float64)
            lon = batch.column(lon_col).to_numpy(zero_copy_only=False).astype(np.float64)
            miss = np.isnan(lat) | np.isnan(lon)     # null coords -> no point
            batch = batch.append_column(
                f"__{field}_lat",
                geo_pa.array(encode_latitude(np.where(miss, 0.0, lat)),
                             type=geo_pa.int64(), mask=miss))
            return batch.append_column(
                f"__{field}_lon",
                geo_pa.array(encode_longitude(np.where(miss, 0.0, lon)),
                             type=geo_pa.int64(), mask=miss))

        ds = ds.map_batches(add_geo_enc, batch_format="pyarrow")
        point_cols[field] = (f"__{field}_lat", f"__{field}_lon")
    kw = tuple(c for c in args.keyword_cols.split(",") if c)
    dv = tuple(c for c in args.docvalue_cols.split(",") if c)
    # space-separated when any spec carries comma/semicolon parameters
    # (stop:a,b / dict_compound:w1,w2 / syn:a=b;c=d ...); else commas
    tf_sep = None if " " in args.token_filters.strip() else ","
    tf = tuple(c for c in args.token_filters.split(tf_sep) if c)
    if args.analyzer:
        from lucene_ray.analysis.filters import analyzer_preset

        tf = analyzer_preset(args.analyzer) + tf
    if args.synonyms:
        from lucene_ray.analysis.synparse import (
            parse_solr_synonyms,
            parse_wordnet_synonyms,
            rules_to_specs,
        )

        parts = args.synonyms.split(":")
        path, opts = parts[0], set(parts[1:])
        with open(path, encoding="utf-8") as f:
            text = f.read()
        parse = parse_wordnet_synonyms if "wordnet" in opts \
            else parse_solr_synonyms
        tf = tf + tuple(rules_to_specs(parse(text,
                                             expand="noexpand" not in opts)))
    if args.append:
        commit = append_index(ds, args.index, target_docs_per_partition=args.target_docs,
                              keyword_cols=kw or None, docvalue_cols=dv or None,
                              token_filters=tf or None,
                              input_desc=f"cli:{args.input}", update=args.update)
    else:
        commit = build_index(ds, args.index, target_docs_per_partition=args.target_docs,
                             keyword_cols=kw, docvalue_cols=dv, token_filters=tf,
                             vector_col=args.vector_col or None,
                             point_cols=point_cols or None,
                             bloom_fields=tuple(
                                 c for c in args.bloom_cols.split(",") if c),
                             bp_reorder=args.bp_reorder,
                             index_sort=tuple(
                                 (p.split(":")[0], (p.split(":") + ["asc"])[1])
                                 for p in args.index_sort.split(",") if p),
                             input_desc=f"cli:{args.input}")
    if args.force_merge:
        from lucene_ray.index.merge import force_merge

        commit = force_merge(args.index, args.force_merge)
    elif args.maybe_merge:
        from lucene_ray.index.merge import maybe_merge

        commit = maybe_merge(args.index,
                             target_docs_per_segment=args.target_docs) or commit
    print(json.dumps({k: commit[k] for k in
                      ("generation", "doc_count", "doc_count_field", "sum_ttf",
                       "fingerprint")} | {"n_shards": len(commit["shards"])}))
    ray.shutdown()


if __name__ == "__main__":
    main()
