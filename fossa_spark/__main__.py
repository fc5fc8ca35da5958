"""CLI: run inventory queries, the training-data pipeline, or the status API.

    python -m fossa_spark list
    python -m fossa_spark run q_agg_basic [--sf-dir DIR] [--explain]
    python -m fossa_spark pipeline --data DIR --out DIR
    python -m fossa_spark bench
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="fossa_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list all inventory queries")

    run = sub.add_parser("run", help="run one query and show its result")
    run.add_argument("query")
    run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    run.add_argument("--explain", action="store_true")
    run.add_argument("--rows", type=int, default=20)

    pipe = sub.add_parser("pipeline", help="run the training-data pipeline")
    pipe.add_argument("--data", required=True)
    pipe.add_argument("--out", required=True)

    sub.add_parser("bench", help="run the benchmark (same as python bench.py)")

    args = ap.parse_args(argv)

    from fossa_spark.queries import all_oracles, all_queries

    if args.cmd == "list":
        oracles = all_oracles()
        for name in sorted(all_queries()):
            kind = "oracle" if name in oracles else "rows-only"
            print(f"{name:24s} {kind}")
        return 0

    from fossa_spark.session import get_spark

    if args.cmd == "bench":
        import bench  # repo-root harness

        bench.main()
        return 0

    spark = get_spark(app_name="fossa_spark_cli")
    if args.cmd == "run":
        queries = all_queries()
        if args.query not in queries:
            print(f"unknown query {args.query!r}; see `python -m fossa_spark list`",
                  file=sys.stderr)
            return 2
        df = queries[args.query](spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
        df.show(args.rows, truncate=False)
        return 0

    if args.cmd == "pipeline":
        from fossa_spark.connect import connector_resolver
        from fossa_spark.pipelines import TrainingDataPipeline

        with connector_resolver.context(data=args.data, out=args.out):
            stats = TrainingDataPipeline(spark=spark).go()
        print(json.dumps(stats))
        return 0

    return 1


if __name__ == "__main__":
    raise SystemExit(main())
