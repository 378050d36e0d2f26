"""Pin the Hilbert-curve variant: the Spark column walk must match the
scalar reference exactly, be a bijection, and have the unit-step adjacency
property (|Δx| + |Δy| = 1 between consecutive indices) — the property that
makes Hilbert layout tighter than Z-order (no diagonal jumps)."""

import pyspark.sql.functions as F

from datapipeline_ops_spark.queries.layout_queries import with_hilbert

BITS = 4
N = 1 << BITS


def _xy2d_ref(n: int, x: int, y: int) -> int:
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_reference_and_is_a_unit_step_curve(spark):
    grid = spark.range(N * N).select(
        (F.col("id") % N).cast("int").alias("x"),
        (F.col("id") / N).cast("int").alias("y"),
    )
    got = {
        (r["x"], r["y"]): r["hval"]
        for r in with_hilbert(grid, "x", "y", bits=BITS).collect()
    }
    ref = {(x, y): _xy2d_ref(N, x, y) for x in range(N) for y in range(N)}
    assert got == ref

    # bijection + unit-step adjacency
    by_d = {d: xy for xy, d in got.items()}
    assert sorted(by_d) == list(range(N * N))
    for d in range(N * N - 1):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1
