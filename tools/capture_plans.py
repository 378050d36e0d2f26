#!/usr/bin/env python
"""Capture ``explain("formatted")`` output for named queries to files.

Usage:  python tools/capture_plans.py <suffix> [query ...]

Writes ``plans/r14/<query>_<suffix>.txt`` for each query (default: the
bench HEADLINE + EXTENSIONS sets). ``suffix`` is ``before`` / ``after`` —
the optimization round's evidence files. Plans are formatted WITHOUT
executing the final action (iterative queries still run their internal
eager steps, as in plan_inventory.py).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"))


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    if not names:
        import bench

        names = list(bench.HEADLINE) + list(bench.EXTENSIONS)

    from datapipeline_ops_spark.operators.dedup import clear_barriers
    from datapipeline_ops_spark.queries import QUERIES
    from datapipeline_ops_spark.session import get_spark

    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        spec = QUERIES.get(name)
        if spec is None:
            print(f"SKIP {name}: not registered", file=sys.stderr)
            continue
        clear_barriers()
        try:
            import contextlib
            import io

            df = spec.fn(spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — capture what we can
            plan = f"ERROR {type(exc).__name__}: {exc}"
        with open(os.path.join(OUT_DIR, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")
    clear_barriers()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
