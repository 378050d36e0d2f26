"""Robustness / scale-technique queries: salted aggregation, retrying
side-effect execution with error-as-data status, and set operations.

The salted and retry forms produce results identical to their direct
counterparts — each oracle is the PLAIN formulation, so the gate proves the
technique changes the plan, not the answer.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.functions.hashing import sql_hash_unit
from datapipeline_ops_spark.operators.sideeffects import RetryPolicy, run_with_status
from datapipeline_ops_spark.operators.skew import salted_agg
from datapipeline_ops_spark.tables import load_table


@query(
    "salted_group_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
           count(*) AS n_rows,
           CAST(max(l_extendedprice) AS DOUBLE) AS max_price
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def salted_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over (returnflag, linestatus) — the hot
    keys fan out over 8 salts in phase 1, phase 2 combines partials. The
    oracle is the UNSALTED aggregate: exact equality proves salting is
    result-transparent (sums of integer-valued doubles and counts/max are
    exactly re-combinable)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("l_quantity", "sum"),
            "n_rows": ("l_quantity", "count"),
            "max_price": ("l_extendedprice", "max"),
        },
    )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("max_price").cast("double").alias("max_price"),
    )


@query(
    "retry_cut_status",
    oracle=f"""
    SELECT printf('/out/order_%d.mp4', o_orderkey) AS out_path,
           CASE WHEN {sql_hash_unit("printf('/out/order_%d.mp4', o_orderkey)", seed=33)} < 0.15
                THEN 0 ELSE 1 END AS status
    FROM orders WHERE o_orderkey < 1000
    """,
)
def retry_cut_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cut execution through the retrying partition runner
    (``ffmpeg_cut_op.py:40-56`` budget: 3 attempts, exp backoff): the
    injected action fails DETERMINISTICALLY-ALWAYS for ~15% of paths
    (md5-derived), so after 3 attempts those rows carry status=0 +
    error text — error-as-data, and the oracle recomputes exactly which
    rows exhaust the budget. Backoff sleeper is a no-op here (tests cover
    timing); real ffmpeg slots into `action` unchanged."""
    import hashlib

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    paths = o.select(F.format_string("/out/order_%d.mp4", F.col("o_orderkey")).alias("out_path"))

    def flaky_cut(path: str) -> None:
        h = int(hashlib.md5(f"33:{path}".encode()).hexdigest()[:15], 16)
        if (h % 1_000_000) / 1_000_000.0 < 0.15:
            raise RuntimeError("ffmpeg exited 1")

    out = run_with_status(
        paths,
        "out_path",
        flaky_cut,
        policy=RetryPolicy(max_attempts=3, jitter=lambda: 0.0, sleeper=lambda s: None),
    )
    return out.select("out_path", "status")


@query(
    "salted_skew_join",
    oracle="""
    SELECT o_orderpriority,
           CAST((sum(CAST(round(l_extendedprice*100) AS BIGINT)
                     * (100 - CAST(round(l_discount*100) AS BIGINT)))
                 + 50) // 100 AS BIGINT) / 100.0 AS revenue,
           count(*) AS n_items
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant fact-fact join via explicit salting: the probe side
    (lineitem) gets a salt derived from NON-join columns, the build side
    (orders) is replicated across all ``DEFAULT_SALTS`` salts with a tiny
    posexplode, and the join key becomes (orderkey, salt) — a hot orderkey
    now spreads over S reducers instead of pinning one.  The oracle is the
    PLAIN join + aggregate: exact equality proves salting is
    result-transparent.  (AQE's skew-join split is the automatic variant;
    this is the portable manual form for engines/stages AQE can't reach,
    e.g. a skewed key feeding a window.)  Replication cost: |orders| x S
    rows of two small columns, partial-aggregated before the final
    priority rollup."""
    from datapipeline_ops_spark.operators.skew import DEFAULT_SALTS

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    probe = li.withColumn(
        "_salt",
        F.pmod(F.xxhash64("l_linenumber", "l_extendedprice"), F.lit(DEFAULT_SALTS)),
    )
    build = o.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(DEFAULT_SALTS - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    joined = probe.join(
        build,
        (F.col("l_orderkey") == F.col("o_orderkey")) & (probe["_salt"] == build["_salt"]),
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("long")
                * (
                    F.lit(100)
                    - F.round(F.col("l_discount") * 100, 0).cast("long")
                )
            ).alias("_u"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            "o_orderpriority",
            F.expr("CAST((_u + 50) div 100 AS DOUBLE) / 100.0").alias("revenue"),
            "n_items",
        )
    )


@query(
    "set_ops_segments",
    oracle="""
    SELECT c_custkey FROM (
        (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
         UNION
         SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
        INTERSECT
        SELECT DISTINCT o_custkey FROM orders
    )
    EXCEPT
    SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 400000
    """,
)
def set_ops_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union / intersect / except composition (absent from the reference,
    SURVEY.md §2.2 'Set ops'; built-in here): (BUILDING ∪ MACHINERY)
    ∩ has-orders − has-big-orders, all on the compact key column."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    machinery = c.filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    with_orders = o.select(F.col("o_custkey").alias("c_custkey")).distinct()
    big = (
        o.filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    return building.union(machinery).distinct().intersect(with_orders).subtract(big)
