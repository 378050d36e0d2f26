"""Relational core: the duckdb-checkable surface of SURVEY.md §2.2.

Each query re-expresses a dataflow pattern found in the reference pipelines
on the synthetic TPC-H-ish catalog. Reference citations are in each
docstring; the Spark side is pure `pyspark.sql.functions` (JVM, codegen,
pushdown-friendly) — no Python UDFs anywhere in this module.

Scale notes (100 TB thinking):
- every aggregate here is a partial-aggregation-friendly `groupBy().agg()`
  (map-side combine before shuffle);
- dimension joins (nation/region/supplier) are explicitly `F.broadcast` —
  at any realistic scale those tables are KBs-to-MBs while the fact side is
  TBs, so a shuffle join would be malpractice;
- window top-1 uses `row_number` with a deterministic tie-break so results
  are stable under any partitioning.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.tables import load_table


# ---------------------------------------------------------------------------
# Aggregations over derived columns
# ---------------------------------------------------------------------------

@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_base_price,
           CAST(((sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)))) + 50) // 100 AS BIGINT) / 100.0 AS sum_disc_price,
           CAST(((sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)) * (100 + CAST(round(l_tax*100) AS BIGINT)))) + 5000) // 10000 AS BIGINT) / 100.0
               AS sum_charge,
           CAST((20000 * (sum(CAST(round(l_quantity*100) AS BIGINT))) + 100 * (count(*))) // (2 * 100 * (count(*))) AS BIGINT) / 10000.0 AS avg_qty,
           CAST((20000 * (sum(CAST(round(l_extendedprice*100) AS BIGINT))) + 100 * (count(*))) // (2 * 100 * (count(*))) AS BIGINT) / 10000.0 AS avg_price,
           CAST((20000 * (sum(CAST(round(l_discount*100) AS BIGINT))) + 100 * (count(*))) // (2 * 100 * (count(*))) AS BIGINT) / 10000.0 AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: derived-column arithmetic + wide agg.

    Exercises the reference's derived-column pattern
    (``video_info_op.py:28``: total_duration = frame_count / fps) and
    group-count summaries (``cut_ruidi.py:146-156``) at once. Map-side
    partial aggregation reduces 100 TB of lineitem to a handful of groups
    before any shuffle; the date predicate pushes down to the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # All four money/quantity columns are 2-dp exact, so every sum runs in
    # exact integer units (cents x whole-percent factors) — raw double
    # partial sums are only conditionally reproducible across engines and
    # task schedules (the r08 trade_flow_matrix red). BIGINT headroom:
    # sum_charge units are dollars x 1e6, exact to ~sf1000.
    qty_c = F.round(F.col("l_quantity") * 100, 0).cast("long")
    price_c = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    disc_p = F.round(F.col("l_discount") * 100, 0).cast("long")
    tax_p = F.round(F.col("l_tax") * 100, 0).cast("long")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty_c).alias("_q"),
            F.sum(price_c).alias("_p"),
            F.sum(price_c * (100 - disc_p)).alias("_dp"),
            F.sum(price_c * (100 - disc_p) * (100 + tax_p)).alias("_ch"),
            F.sum(disc_p).alias("_d"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            (F.col("_q") / 100.0).alias("sum_qty"),
            (F.col("_p") / 100.0).alias("sum_base_price"),
            F.expr("CAST(((_dp) + 50) div 100 AS DOUBLE) / 100.0").alias("sum_disc_price"),
            F.expr("CAST(((_ch) + 5000) div 10000 AS DOUBLE) / 100.0").alias("sum_charge"),
            F.expr("CAST((CAST(_q AS DECIMAL(38,0)) * 20000 + 100 * (count_order)) div (2 * 100 * (count_order)) AS DOUBLE) / 10000.0").alias("avg_qty"),
            F.expr("CAST((CAST(_p AS DECIMAL(38,0)) * 20000 + 100 * (count_order)) div (2 * 100 * (count_order)) AS DOUBLE) / 10000.0").alias("avg_price"),
            F.expr("CAST((CAST(_d AS DECIMAL(38,0)) * 20000 + 100 * (count_order)) div (2 * 100 * (count_order)) AS DOUBLE) / 10000.0").alias("avg_disc"),
            "count_order",
        )
    )


@query(
    "revenue_by_nation",
    oracle="""
    SELECT n_name,
           CAST((sum(CAST(round(l_extendedprice*100) AS BIGINT)
                     * (100 - CAST(round(l_discount*100) AS BIGINT)))
                 + 50) // 100 AS BIGINT) / 100.0 AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY n_name
    """,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped multi-join rollup (fact-fact joins + broadcast dims).

    The reference has no relational join (SURVEY §2.2 joins note); this is
    part of the engine's beyond-reference relational surface.

    Only the genuinely tiny dims broadcast (region -> nation -> the 2-col
    nation/name lookup). customer is FACT-scaled (15M rows at sf100, 1.5B at
    sf10k) so it must never be forced into a broadcast — orders⋈customer
    shuffles on custkey (region filter has already cut customers to ~1/5),
    then ⋈lineitem shuffles on orderkey, with AQE free to pick shuffled-hash
    vs sort-merge per side at runtime.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    dims = (
        n.join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA")),
            n.n_regionkey == r.r_regionkey,
        ).select("n_nationkey", "n_name")
    )
    cust = (
        c.select("c_custkey", "c_nationkey")
        .join(F.broadcast(dims), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "n_name")
    )
    o_f = o.filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    ).select("o_orderkey", "o_custkey")
    return (
        o_f.join(cust, o_f.o_custkey == cust.c_custkey)
        .join(
            li.select("l_orderkey", "l_extendedprice", "l_discount"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("n_name")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("long")
                * (
                    F.lit(100)
                    - F.round(F.col("l_discount") * 100, 0).cast("long")
                )
            ).alias("_u")
        )
        .select("n_name", F.expr("CAST((_u + 50) div 100 AS DOUBLE) / 100.0").alias("revenue"))
    )


@query(
    "top_orders",
    oracle="""
    SELECT o_orderkey,
           CAST((sum(CAST(round(l_extendedprice*100) AS BIGINT)
                     * (100 - CAST(round(l_discount*100) AS BIGINT)))
                 + 50) // 100 AS BIGINT) / 100.0 AS revenue,
           o_orderdate, o_orderpriority
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped top-K: join + agg + global deterministic top-10.

    Top-K with an explicit tie-break (orderkey) so ordering is stable across
    engines and partitionings. At scale Spark runs this as per-partition
    top-K then a tiny final merge (TakeOrderedAndProject), no full sort.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o.filter(F.col("o_orderstatus") == "O"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("long")
                * (
                    F.lit(100)
                    - F.round(F.col("l_discount") * 100, 0).cast("long")
                )
            ).alias("_u")
        )
        .select(
            "o_orderkey",
            F.expr("CAST((_u + 50) div 100 AS DOUBLE) / 100.0").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Filters / predicates (reference gauntlet analogs)
# ---------------------------------------------------------------------------

@query(
    "threshold_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem WHERE l_quantity >= 45.0
    """,
)
def threshold_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration-threshold filter analog (``video_extract_frame.py:332-334``,
    ``cut_30min.py:99-103``: drop videos shorter than min duration).

    Pure pushed-down parquet predicate — verify `PushedFilters` in explain.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") >= 45.0).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


@query(
    "band_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_discount
    FROM lineitem WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def band_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity-band filter analog (``video_extract_frame.py:300-302``:
    keep candidates with sim_lo <= s <= sim_hi)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_discount").between(0.05, 0.07) & (F.col("l_quantity") < 24)
    ).select("l_orderkey", "l_linenumber", "l_discount")


@query(
    "multi_predicate_filter",
    oracle="""
    SELECT p_partkey, p_name, p_size, p_retailprice
    FROM part WHERE p_size >= 25 AND p_retailprice >= 950.0
    """,
)
def multi_predicate_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolution filter analog (``for_high_bg_all_morelittler.py:149-151``:
    keep images with height >= 1000 AND width >= 1000)."""
    p = load_table(spark, sf_dir, "part")
    return p.filter((F.col("p_size") >= 25) & (F.col("p_retailprice") >= 950.0)).select(
        "p_partkey", "p_name", "p_size", "p_retailprice"
    )


@query(
    "count_in_range_filter",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders
    FROM orders GROUP BY o_custkey HAVING count(*) BETWEEN 8 AND 10
    """,
)
def count_in_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detection-count range filter analog (``video_extract_frame.py:171``:
    keep frames with 1..2 persons; ``:344`` refs in min..max).

    Expressed as group-count + HAVING-between — the relational form of
    `F.size(col).between(lo, hi)` when detections live in rows not arrays.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders").between(8, 10))
    )


@query(
    "null_guard_filter",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE value IS NOT NULL AND event_type IS NOT NULL AND value > 250.0
    """,
)
def null_guard_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null/empty guard analog (``ffmpeg_cut_op.py:97-100``,
    ``scene_segmenter_op.py:89-99``: skip rows with missing inputs)."""
    e = load_table(spark, sf_dir, "events")
    return e.filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull() & (F.col("value") > 250.0)
    ).select("event_id", "user_id", "event_type", "value")


# ---------------------------------------------------------------------------
# Group-by aggregates
# ---------------------------------------------------------------------------

@query(
    "group_count",
    oracle="SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey",
)
def group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segments-per-video summary analog (``cut_ruidi.py:146-156``,
    ``cut_30min.py:50``: count planned segments per input file)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))


@query(
    "group_avg",
    oracle="""
    SELECT l_partkey,
           CAST(sum(CAST(l_quantity AS DECIMAL(18, 2))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))
                    * (CAST(1 AS DECIMAL(18, 2))
                       - CAST(l_discount AS DECIMAL(18, 2)))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS avg_net
    FROM lineitem GROUP BY l_partkey
    """,
)
def group_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mean analog (``video_extract_frame.py:307-309``: mean of
    per-person quality/sim scores within a frame).

    Averages of double money columns are partition-order dependent (double
    addition is not associative), so a round() of the double avg can land on
    different sides of a half-boundary in Spark vs the oracle (the r04
    driver red). Fix: the inputs are exact 2dp values, so quantize to
    DECIMAL before summing — decimal addition is associative and
    bit-identical in both engines — then divide as DOUBLE/DOUBLE (identical
    operands → identical IEEE result) and ship the raw double for the gate
    hasher to normalize."""
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(18,2)")
    net = F.col("l_extendedprice").cast("decimal(18,2)") * (
        one - F.col("l_discount").cast("decimal(18,2)")
    )
    n = F.count(F.lit(1)).cast("double")
    return li.groupBy("l_partkey").agg(
        (F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double") / n).alias("avg_qty"),
        (F.sum(net).cast("double") / n).alias("avg_net"),
    )


@query(
    "running_best_max_by",
    oracle="""
    SELECT o_custkey, o_totalprice AS best_price, o_orderkey AS best_orderkey
    FROM (
        SELECT o_custkey, o_totalprice, o_orderkey,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def running_best_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-best / keep-highest-quality analog
    (``video_extract_frame.py:211-218``: keep the best-quality face per
    identity). `max_by` with a (score, key) tuple gives a deterministic
    argmax even on score ties — a single partial-aggregatable pass, no
    window shuffle-and-sort needed.
    """
    o = load_table(spark, sf_dir, "orders")
    best = F.max(F.struct(F.col("o_totalprice"), F.col("o_orderkey"))).alias("b")
    return (
        o.groupBy("o_custkey")
        .agg(best)
        .select(
            "o_custkey",
            F.col("b.o_totalprice").alias("best_price"),
            F.col("b.o_orderkey").alias("best_orderkey"),
        )
    )


# ---------------------------------------------------------------------------
# Windows: bin-argmax, top-k per group
# ---------------------------------------------------------------------------

@query(
    "bin_argmax",
    oracle="""
    SELECT o_custkey, order_year, o_orderkey, o_totalprice
    FROM (
        SELECT o_custkey, year(o_orderdate) AS order_year, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey, year(o_orderdate)
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def bin_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bin-then-argmax analog (``video_extract_frame.py:312-320``: bucket
    frames by frame_idx // 150, keep the top-scoring frame per bucket).

    Window top-1 per (customer, year-bucket) with deterministic tie-break.
    At scale this is one shuffle on the partition keys; AQE coalesces
    post-shuffle partitions.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey", "order_year").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("order_year", F.year("o_orderdate"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "order_year", "o_orderkey", "o_totalprice")
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice
    FROM (
        SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
               row_number() OVER (PARTITION BY l_suppkey
                                  ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        FROM lineitem
    ) WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group (generalizes the reference's top-1-per-bin to K>1)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
    )


# ---------------------------------------------------------------------------
# Joins beyond the reference: semi / anti / broadcast dim
# ---------------------------------------------------------------------------

@query(
    "anti_join_idempotency",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
    """,
)
def anti_join_idempotency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotent-restart predicate analog
    (``for_high_bg_all_morelittler.py:176-179``: skip inputs whose output
    already exists) — expressed as an anti-join against the already-processed
    manifest, the scalable form of a skip-if-exists check.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    processed = li.filter(F.col("l_returnflag") == "R").select(F.col("l_orderkey").alias("o_orderkey"))
    return o.join(processed, on="o_orderkey", how="left_anti").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@query(
    "semi_join",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus
    FROM orders
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 48)
    """,
)
def semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence filter as a left-semi join (has-at-least-one-match)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = li.filter(F.col("l_quantity") > 48).select(F.col("l_orderkey").alias("o_orderkey"))
    return o.join(big, on="o_orderkey", how="left_semi").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )


@query(
    "broadcast_dim_join",
    oracle="""
    SELECT c_custkey, c_name, n_name, r_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    """,
)
def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema dimension enrichment with explicit broadcast hints —
    nation (25 rows) and region (5 rows) never justify a shuffle at any SF.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@query(
    "distinct_agg_suppliers",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_suppliers,
           count(DISTINCT l_partkey) AS n_parts,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def distinct_agg_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column distinct aggregation (absent from the reference;
    built-in here). Spark expands multiple DISTINCTs with a single `expand`
    + two-phase aggregate — still one scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "having_big_customers",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders,
           round(sum(CAST(round(o_totalprice*100) AS BIGINT)) / 100.0, 2)
               AS total_spend
    FROM orders GROUP BY o_custkey
    HAVING count(*) >= 15
       AND sum(CAST(round(o_totalprice*100) AS BIGINT)) > 100000000
    """,
)
def having_big_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation HAVING predicate: the filter runs on aggregated
    rows (can't push below the agg), everything else pushes/prunes as
    usual. The HAVING floor compares exact integer CENTS — a float-summed
    spend sitting on the $1,000,000 boundary would make group MEMBERSHIP a
    partial-sum-ordering draw, a worse failure mode than a rounded value."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "_cents"
            ),
        )
        .filter((F.col("n_orders") >= 15) & (F.col("_cents") > 100_000_000))
        .select(
            "o_custkey",
            "n_orders",
            F.round(F.col("_cents") / 100.0, 2).alias("total_spend"),
        )
    )


@query(
    "above_avg_parts",
    oracle="""
    SELECT p_partkey, p_retailprice
    FROM part
    WHERE CAST(round(p_retailprice*100) AS BIGINT) * 100
          * (SELECT count(*) FROM part)
          > 104 * (SELECT sum(CAST(round(p_retailprice*100) AS BIGINT))
                   FROM part)
    """,
)
def above_avg_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery predicate (price > 1.04x corpus average): Spark plans
    the subquery as an independent stage whose single-row result feeds the
    main scan's filter — two passes, no self-join. The comparison is the
    integer cross-multiplication ``cents*100*n > 104*sum_cents`` (exactly
    ``price > 1.04 x avg``): a float average would make boundary-part
    MEMBERSHIP depend on partial-sum order."""
    register = load_table(spark, sf_dir, "part")
    register.createOrReplaceTempView("part_v")
    return register.sparkSession.sql(
        """
        SELECT p_partkey, p_retailprice
        FROM part_v
        WHERE CAST(round(p_retailprice*100) AS BIGINT) * 100
              * (SELECT count(*) FROM part_v)
              > 104 * (SELECT sum(CAST(round(p_retailprice*100) AS BIGINT))
                       FROM part_v)
        """
    )


@query(
    "revenue_by_region_year",
    oracle="""
    SELECT r.r_name AS region, CAST(year(o.o_orderdate) AS INT) AS order_year,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18, 2))
                    * (CAST(1 AS DECIMAL(18, 2))
                       - CAST(l.l_discount AS DECIMAL(18, 2)))) AS DOUBLE)
               AS revenue,
           count(DISTINCT o.o_orderkey) AS n_orders
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
    """,
)
def revenue_by_region_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-table star join (region→nation→customer→orders→lineitem) with a
    time rollup — the deepest join tree in the suite. Catalyst reorders the
    dims first and broadcasts every one of them (region/nation/customer are
    tiny fractions of lineitem), so the fact table is scanned once and
    never shuffled for the joins; the only exchange is the final group-by.

    Revenue is summed in DECIMAL (the 2dp money inputs quantize exactly, and
    decimal addition is associative so the sum is partition-order
    independent in both engines), then shipped as the raw cast-to-double —
    the in-engine round(sum(double), 2) form was the r04 driver hash-red:
    ~35 rows of 1e7–1e9 double sums make a .005 half-boundary hit likely."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    joined = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    )
    return (
        joined.groupBy(
            F.col("r_name").alias("region"),
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )
