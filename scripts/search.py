#!/usr/bin/env python
"""Query an index from the command line (`SearchFiles.java:48` equivalent).

    python scripts/search.py --index /data/index --query "merge join" [-k 10]
        [--must] [--phrase] [--actors 4] [--count-only]
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
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", default="", help="free text (analyzed); "
                    "optional when --knn is given (then acts as the filter)")
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--must", action="store_true", help="AND the terms instead of OR")
    ap.add_argument("--phrase", action="store_true", help="exact phrase")
    ap.add_argument("--classic", action="store_true",
                    help="classic QueryParser syntax (+/-, \"phrase\"~n, parens, "
                         "field:value, ts:[a TO b], wildcards, fuzzy, boosts)")
    ap.add_argument("--simple", action="store_true",
                    help="SimpleQueryParser dialect (tolerant: + | - parens "
                         "\"phrase\"~n prefix* fuzzy~n)")
    ap.add_argument("--complex", action="store_true",
                    help="ComplexPhrase dialect (wildcards/fuzzy/groups "
                         "inside quoted phrases, e.g. '\"merge jo*\"~2')")
    ap.add_argument("--surround", action="store_true",
                    help="surround dialect (a 3W b / 3N(a,b,c) proximity, "
                         "AND/OR/NOT, prefix forms)")
    ap.add_argument("--flexible", action="store_true",
                    help="flexible (Standard) dialect (AND/OR/NOT && || !, "
                         "/regexp/, (a b c)@msm, field<val ranges, "
                         "fn:ordered(...) interval functions)")
    ap.add_argument("--precedence", action="store_true",
                    help="PrecedenceQueryParser dialect (classic grammar "
                         "with AND binding tighter than OR)")
    ap.add_argument("--xml", action="store_true",
                    help="CoreParser XML dialect (TermQuery/BooleanQuery/"
                         "SpanNear/RangeQuery/UserQuery/... elements)")
    ap.add_argument("--knn", default="",
                    help="comma-separated query vector: k-NN by cosine over the "
                         "index's vector column (optionally filtered by --query)")
    ap.add_argument("--expr", default="",
                    help="rescore matches with an expression over _score and "
                         "doc-values fields, e.g. '_score * 2 + ln(1 + turn_idx)'")
    ap.add_argument("--geo-field", default="loc",
                    help="point field for the --geo-* options")
    ap.add_argument("--geo-box", default="",
                    help="minLat,maxLat,minLon,maxLon (LatLonPoint box; "
                         "minLon>maxLon crosses the dateline)")
    ap.add_argument("--geo-dist", default="",
                    help="lat,lon,radiusMeters (LatLonPoint distance query)")
    ap.add_argument("--geo-polygon", default="",
                    help="lat:lon,lat:lon,... vertices (LatLonPoint polygon)")
    ap.add_argument("--sort-dist", default="",
                    help="lat,lon — sort hits nearest-first from this origin")
    ap.add_argument("--sort", default="",
                    help="sort by doc-values fields instead of score, e.g. 'ts:desc' or 'turn_idx,ts:desc' (multi-key)")
    ap.add_argument("--actors", type=int, default=0, help="serve via an actor pool of N")
    ap.add_argument("--count-only", action="store_true")
    ap.add_argument("--profile", action="store_true",
                    help="emit a QueryProfiler breakdown tree alongside hits")
    ap.add_argument("--similarity", default="bm25",
                    help="scoring model: bm25 | classic | boolean | "
                         "lmdirichlet | lmjm | dfr | ib | dfi | "
                         "f1exp|f1log|f2exp|f2log|f3exp|f3log (axiomatic)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=max(4, args.actors or 4),
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from lucene_ray.analysis.standard import analyze
    from lucene_ray.search.query import PhraseQuery, bool_query
    from lucene_ray.search.searcher import IndexSearcher

    terms = analyze(args.query)
    if args.classic:
        from lucene_ray.search.query import parse_classic

        q = parse_classic(args.query)
    elif args.complex:
        from lucene_ray.search.query import parse_complex_phrase

        q = parse_complex_phrase(args.query)
    elif args.simple:
        from lucene_ray.search.query import parse_simple

        q = parse_simple(args.query)
    elif args.surround:
        from lucene_ray.search.query import parse_surround

        q = parse_surround(args.query)
    elif args.flexible:
        from lucene_ray.search.flexible import parse_flexible

        q = parse_flexible(args.query)
    elif args.precedence:
        from lucene_ray.search.query import parse_precedence

        q = parse_precedence(args.query)
    elif args.xml:
        from lucene_ray.search.xmlparser import parse_xml

        q = parse_xml(args.query)
    elif args.phrase:
        q = PhraseQuery(tuple(terms))
    elif args.must:
        q = bool_query(must=terms)
    else:
        q = bool_query(should=terms)
    geo_q = None
    if args.geo_box:
        from lucene_ray.search.geo import lat_lon_box_query

        lo1, hi1, lo2, hi2 = (float(x) for x in args.geo_box.split(","))
        geo_q = lat_lon_box_query(args.geo_field, lo1, hi1, lo2, hi2)
    elif args.geo_dist:
        from lucene_ray.search.geo import LatLonDistanceQuery

        glat, glon, rad = (float(x) for x in args.geo_dist.split(","))
        geo_q = LatLonDistanceQuery(args.geo_field, glat, glon, rad)
    elif args.geo_polygon:
        from lucene_ray.search.geo import LatLonPolygonQuery

        verts = [v.split(":") for v in args.geo_polygon.split(",")]
        geo_q = LatLonPolygonQuery(args.geo_field,
                                   tuple(float(a) for a, _ in verts),
                                   tuple(float(b) for _, b in verts))
    if geo_q is not None:
        if args.query.strip():
            # text scores, geo restricts (the LatLonPoint filter idiom)
            from lucene_ray.search.query import FILTER, MUST, BooleanClause, BooleanQuery

            q = BooleanQuery((BooleanClause(q, MUST),
                              BooleanClause(geo_q, FILTER)))
        else:
            q = geo_q
    if args.knn:
        from lucene_ray.search.query import KnnVectorQuery

        vec = tuple(float(x) for x in args.knn.split(","))
        filt = q if args.query.strip() else None
        q = KnnVectorQuery(vec, k=args.k, filter=filt)
    if args.expr:
        from lucene_ray.search.query import FunctionScoreQuery

        q = FunctionScoreQuery(q, args.expr)
    sort = None
    if args.sort_dist:
        from lucene_ray.search.geo import GeoDistanceSort

        slat, slon = (float(x) for x in args.sort_dist.split(","))
        sort = GeoDistanceSort(args.geo_field, slat, slon)
    elif args.sort.startswith("expr:"):
        from lucene_ray.search.query import ExpressionSort

        spec = args.sort[5:]
        rev = spec.endswith(":desc")
        sort = ExpressionSort(spec[:-5] if rev else spec, reverse=rev)
    elif args.sort:
        from lucene_ray.search.query import SortField

        fields = []
        for spec in args.sort.split(","):
            parts = spec.split(":")
            fields.append(SortField(parts[0], reverse=(len(parts) > 1
                                                       and parts[1] == "desc")))
        sort = fields if len(fields) > 1 else fields[0]

    sim_name = args.similarity.lower()
    if sim_name != "bm25":
        from lucene_ray.search import similarity as sims

        sim = {
            "classic": sims.ClassicSimilarity, "boolean": sims.BooleanSimilarity,
            "lmdirichlet": sims.LMDirichletSimilarity,
            "indri": sims.IndriDirichletSimilarity,
            "lmjm": sims.LMJelinekMercerSimilarity,
            "dfr": sims.DFRSimilarity, "ib": sims.IBSimilarity,
            "dfi": sims.DFISimilarity, "sweetspot": sims.SweetSpotSimilarity,
        }.get(sim_name)
        if sim is not None:
            searcher = IndexSearcher(args.index, similarity=sim())
        else:
            searcher = IndexSearcher(
                args.index,
                similarity=sims.AxiomaticSimilarity(sim_name.upper()))
    else:
        searcher = IndexSearcher(args.index)
    if args.count_only:
        print(json.dumps({"count": searcher.count(q)}))
    else:
        if args.actors:
            from lucene_ray.search.actors import QueryService

            svc = QueryService(args.index, num_actors=args.actors)
            td = svc.search(q, k=args.k)
            if sort is not None:
                print(json.dumps({"warning": "--sort served by the local searcher"}),
                      file=sys.stderr)
                td = searcher.search(q, k=args.k, sort=sort)
            svc.shutdown()
        elif args.profile and sort is None:
            from lucene_ray.search.profiler import profile_search

            td, prof = profile_search(searcher, q, k=args.k)
        else:
            td = searcher.search(q, k=args.k, sort=sort)
        out = {
            "total_hits": td.total_hits, "relation": td.relation,
            "hits": [{"rank": i + 1, "score": h.score, "conv_id": h.conv_id,
                      "turn_idx": h.turn_idx, "gid": h.gid}
                     for i, h in enumerate(td.hits)],
        }
        if args.profile and sort is None and not args.actors:
            out["profile"] = prof.to_dict()
        print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
