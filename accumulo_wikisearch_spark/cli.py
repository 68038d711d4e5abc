"""Command-line serving front — the analogue of the reference's REST query
endpoints (query-war web.xml:33-40: /Query?query=…&auths=…, /Content).

Emits one JSON object per result row (Results/Document shape:
AbstractQueryLogic.createDocument, AbstractQueryLogic.java:400-430).

    python -m accumulo_wikisearch_spark.cli "TEXT == 'dup' and SOURCE == 'src3'"
    python -m accumulo_wikisearch_spark.cli --auths en,fr "TEXT == 'dup'"
    python -m accumulo_wikisearch_spark.cli --content "DOCUMENT:3/en/123"
    python -m accumulo_wikisearch_spark.cli --scored dup --limit 10
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="wikisearch-spark", description=__doc__)
    p.add_argument("query", nargs="?", help="JEXL boolean query expression")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01", help="corpus dir")
    p.add_argument("--auths", help="comma-separated language authorizations")
    p.add_argument("--limit", type=int, default=0, help="max results (0 = all)")
    p.add_argument("--content", metavar="POINTER", help="fetch DOCUMENT:partition/lang/id")
    p.add_argument("--scored", metavar="TERM", help="ranked single-term search")
    p.add_argument(
        "--tfidf", metavar="TERMS", help="comma-separated terms, IDF-weighted ranked AND search"
    )
    p.add_argument(
        "--phrase", metavar="TERMS", help="comma-separated terms, exact phrase search"
    )
    p.add_argument(
        "--bm25", metavar="TERMS", help="comma-separated terms, BM25-ranked AND search"
    )
    p.add_argument(
        "--more-like", metavar="DOC_ID", type=int, help="similar docs by shared rare terms"
    )
    p.add_argument(
        "--cardinalities",
        metavar="TERMS",
        help="comma-separated terms: per-field doc counts from the global index",
    )
    p.add_argument("--ids-only", action="store_true", help="emit doc ids, not documents")
    p.add_argument(
        "--describe",
        metavar="CATALOG",
        help="print a written catalog's lifecycle state (versions/kinds,"
        " pending deltas, generations on disk) as one JSON object",
    )
    p.add_argument(
        "--explain",
        action="store_true",
        help="print the planner's decision for the query instead of running it",
    )
    p.add_argument("--serve", type=int, metavar="PORT", help="start the REST front on PORT and block")
    return p


def run(argv: list[str], out=sys.stdout) -> int:
    args = build_parser().parse_args(argv)
    if not (
        args.query
        or args.content
        or args.scored
        or args.serve
        or args.tfidf
        or args.phrase
        or args.bm25
        or args.more_like is not None
        or args.cardinalities
        or args.describe
    ):
        build_parser().print_usage(out)
        return 2

    from accumulo_wikisearch_spark.session import get_spark
    from accumulo_wikisearch_spark.sources.corpus import get_engine

    spark = get_spark("wikisearch-cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.describe:
        # catalog maintenance view — metadata only, no corpus engine
        from accumulo_wikisearch_spark.operators.compaction import describe_catalog

        print(json.dumps(describe_catalog(spark, args.describe)), file=out)
        return 0

    eng = get_engine(spark, args.sf_dir)
    auths = args.auths.split(",") if args.auths else None

    if args.serve:
        from accumulo_wikisearch_spark.serving import start_server

        srv = start_server(eng, args.serve)
        print(json.dumps({"serving": f"http://127.0.0.1:{srv.server_address[1]}"}), file=out)
        try:
            import threading

            threading.Event().wait()  # block until killed
        except KeyboardInterrupt:
            srv.shutdown()
        return 0

    if args.explain:
        if not args.query:
            build_parser().print_usage(out)
            return 2
        print(json.dumps(eng.explain_query(args.query, auths=auths)), file=out)
        return 0

    if args.content:
        df = eng.content(args.content, auths=auths)
    elif args.scored:
        df = eng.scored_search(args.scored, auths=auths).drop("offsets")
    elif args.tfidf:
        df = eng.scored_search_tfidf(args.tfidf.split(","), auths=auths)
    elif args.phrase:
        df = eng.phrase_search(args.phrase.split(","), auths=auths)
    elif args.bm25:
        df = eng.scored_search_bm25(args.bm25.split(","), auths=auths)
    elif args.more_like is not None:
        df = eng.more_like_this(args.more_like, auths=auths)
    elif args.cardinalities:
        df = eng.term_cardinalities(args.cardinalities.split(","), auths=auths)
    elif args.ids_only:
        df = eng.query(args.query, auths=auths)
    else:
        df = eng.fetch_documents(eng.query(args.query, auths=auths))
    if args.limit:
        df = df.limit(args.limit)

    n = 0
    for row in df.toJSON().toLocalIterator():
        print(row, file=out)
        n += 1
    print(json.dumps({"results": n}), file=sys.stderr)
    return 0


def main() -> None:  # pragma: no cover
    raise SystemExit(run(sys.argv[1:]))


if __name__ == "__main__":  # pragma: no cover
    main()
