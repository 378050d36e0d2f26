"""Round-6 additions: basket-size cap on co-purchase pair generation and
other scale guards.

Correctness vs the DuckDB oracle runs in tools/check_correctness.py; these
tests pin the semantic invariants that a value-hash alone wouldn't explain
if it broke."""

import pyspark.sql.functions as F

from datapipeline_ops_spark.queries import QUERIES


def test_copurchase_edges_drop_wide_baskets(spark):
    from datapipeline_ops_spark.queries.graph_queries import (
        COPURCHASE_MIN_ORDERS,
        TRIANGLE_MAX_BASKET,
        copurchase_edges,
    )

    wide = TRIANGLE_MAX_BASKET + 16
    rows = []
    # two identical bot-wide baskets: every pair would clear the support
    # floor, so only the width cap can exclude them
    for orderkey in (1, 2):
        rows += [(orderkey, 10_000 + i) for i in range(wide)]
    # two identical normal baskets: pairs must survive
    for orderkey in (3, 4):
        rows += [(orderkey, 20_000 + i) for i in range(3)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    edges = copurchase_edges(li).collect()
    parts = {e["pa"] for e in edges} | {e["pb"] for e in edges}
    assert all(p >= 20_000 for p in parts), "wide-basket pairs leaked past the cap"
    # 3 items -> 3 pairs, each seen in 2 orders >= the support floor
    assert len(edges) == 3 and COPURCHASE_MIN_ORDERS <= 2


def test_triangle_stats_unchanged_by_cap(spark, sf_dir):
    # TPC-H baskets are <= 7 items: the cap must be a no-op on this schema
    from datapipeline_ops_spark.tables import load_table

    widest = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    from datapipeline_ops_spark.queries.graph_queries import TRIANGLE_MAX_BASKET

    assert widest <= TRIANGLE_MAX_BASKET
    r = QUERIES["triangle_copurchase_stats"].fn(spark, sf_dir).first()
    assert 0 <= r["clustering_coeff"] <= 1
