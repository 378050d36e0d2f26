#!/usr/bin/env python
"""Ad-hoc single-query Spark-vs-DuckDB parity check (same compare the
driver gate and the fuzz harness use). Usage:

    python tools/quick_pair.py <query_name> [<query_name> ...] [--sf DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from tools.check_correctness import value_hash  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = "/root/testdata/sf0.01"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
    from datapipeline_ops_spark.queries import QUERIES
    from datapipeline_ops_spark.session import get_spark

    spark = get_spark("quick_pair", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    bad = 0
    for name in args:
        spec = QUERIES[name]
        sdf = spec.fn(spark, sf)
        scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
        if spec.oracle is None:
            print(f"{name}: rows={len(srows)} (no oracle)")
            continue
        cur = con.execute(spec.oracle)
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
        ok_rows = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        ok_hash = value_hash(scols, srows) == value_hash(dcols, drows)
        status = "PASS" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            bad += 1
        print(
            f"{name}: {status} rows {len(srows)}/{len(drows)}"
            f" cols_ok={ok_cols} hash_ok={ok_hash}"
        )
        if not ok_cols:
            print("  spark:", scols, "\n  duck: ", dcols)
        if ok_cols and not ok_hash:
            print("  spark:", sorted(srows)[:3])
            print("  duck: ", sorted(drows)[:3])
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
