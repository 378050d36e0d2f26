#!/usr/bin/env python
"""Isolated per-query timing with the bench protocol: untimed warm-up run,
then median of N runs (default 3), persist barriers cleared before every
run so each measurement pays the full cold pipeline.

Usage:  python tools/time_query.py <query> [query ...]
Env:    SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
        SPARK_GRAFT_CPUS   (default 32)
        SPARK_GRAFT_BENCH_RUNS (default 3)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def main() -> int:
    from datapipeline_ops_spark.operators.dedup import clear_barriers
    from datapipeline_ops_spark.queries import QUERIES
    from datapipeline_ops_spark.session import get_spark

    names = sys.argv[1:]
    if not names:
        print("usage: time_query.py <query> [query ...]", file=sys.stderr)
        return 2
    spark = get_spark("time_query", cpus=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    for name in names:
        spec = QUERIES.get(name)
        if spec is None:
            print(f"SKIP {name}: not registered")
            continue
        spark.sparkContext.setJobDescription(f"time_query: {name}")
        clear_barriers()
        spec.fn(spark, SF_DIR).count()  # untimed JIT warm-up
        runs = []
        for _ in range(RUNS):
            clear_barriers()
            t0 = time.time()
            spec.fn(spark, SF_DIR).count()
            runs.append(time.time() - t0)
        med = statistics.median(runs)
        print(f"{name}: median {med:.3f}s  runs {[round(r, 3) for r in runs]}")
        spark.sparkContext.setJobDescription(None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
