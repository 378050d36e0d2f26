"""Command-line entry point: list, run, and explain registered queries.

Usage:
    python -m datapipeline_ops_spark list [substring]
    python -m datapipeline_ops_spark run <query> [--sf-dir DIR] [--limit N]
                                        [--explain] [--json]
    python -m datapipeline_ops_spark oracle <query>
    python -m datapipeline_ops_spark bench <query> [--sf-dir DIR] [--runs N]

`run` executes one registered query against the parquet tables in --sf-dir
and prints the result (or its formatted physical plan with --explain).
`oracle` prints the DuckDB oracle SQL so results can be cross-checked by any
ANSI engine. `bench` times one query (median of N full executions).

The CLI builds its session through the same factory the engine tests use
(AQE, Arrow, UTC); on a real cluster submit with spark-submit and the
factory's master/conf are overridden by the environment.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="datapipeline_ops_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    lp = sub.add_parser("list", help="list registered queries")
    lp.add_argument("substring", nargs="?", default="")

    rp = sub.add_parser("run", help="run one query")
    rp.add_argument("query")
    rp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    rp.add_argument("--limit", type=int, default=20)
    rp.add_argument("--explain", action="store_true")
    rp.add_argument("--json", action="store_true", help="JSON lines instead of a table")

    op = sub.add_parser("oracle", help="print a query's DuckDB oracle SQL")
    op.add_argument("query")

    bp = sub.add_parser("bench", help="time one query")
    bp.add_argument("query")
    bp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    bp.add_argument("--runs", type=int, default=3)
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    from datapipeline_ops_spark.queries import QUERIES

    if args.cmd == "list":
        for name, spec in sorted(QUERIES.items()):
            if args.substring in name:
                doc = (spec.doc or "").strip().splitlines()
                head = doc[0] if doc else ""
                print(f"{name:36s} {head[:90]}")
        return 0

    spec = QUERIES.get(args.query)
    if spec is None:
        near = [n for n in sorted(QUERIES) if args.query in n][:8]
        print(f"unknown query {args.query!r}; close: {near}", file=sys.stderr)
        return 2

    if args.cmd == "oracle":
        if spec.oracle is None:
            print("-- no oracle: non-SQL-expressible (rows-only gate)", file=sys.stderr)
            return 1
        print(spec.oracle)
        return 0

    from datapipeline_ops_spark.session import get_spark

    spark = get_spark("cli")
    spark.sparkContext.setLogLevel("ERROR")
    if args.cmd == "run":
        df = spec.fn(spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
            return 0
        if args.json:
            for row in df.limit(args.limit).toJSON().collect():
                print(row)
        else:
            df.show(args.limit, truncate=False)
        return 0

    if args.cmd == "bench":
        from datapipeline_ops_spark.operators.dedup import clear_barriers

        runs = []
        for _ in range(args.runs):
            clear_barriers()
            t0 = time.time()
            spec.fn(spark, args.sf_dir).count()
            runs.append(time.time() - t0)
        print(json.dumps({
            "query": args.query,
            "sf_dir": args.sf_dir,
            "runs": [round(r, 3) for r in runs],
            "median_sec": round(statistics.median(runs), 3),
        }))
        return 0
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
