"""Second wave of relational coverage: outer-join histograms, correlated
EXISTS, conditional aggregation, batch sessionization, deterministic hash
sampling, and exact percentiles.

These have no direct analog in the reference (it has no relational joins at
all, SURVEY.md §2.2) but complete the surface a user of a curation pipeline
needs at 100 TB: restart bookkeeping (who has zero outputs?), conditional
quality tallies, event sessionization for engagement stats, reproducible
sampling for eval sets, and distribution summaries.

All queries are pure `pyspark.sql.functions` — JVM-side, codegen-friendly,
no Python UDFs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.tables import load_table


@query(
    "customer_order_histogram",
    oracle="""
    SELECT n_orders, count(*) AS n_customers
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
        FROM customer c
        LEFT JOIN orders o
          ON o.o_custkey = c.c_custkey AND o.o_orderstatus <> 'F'
        GROUP BY c.c_custkey
    )
    GROUP BY n_orders
    """,
)
def customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-shaped distribution: LEFT OUTER join (customers with ZERO
    matching orders must survive) + double aggregation.

    The filter on the probe side lives in the join condition, not a WHERE —
    a WHERE would silently turn the outer join inner. At scale: one shuffle
    for the outer join (customer is the smaller side but correctness of
    count(o_orderkey)=0 rows forbids dropping it), then the second agg runs
    on a few hundred distinct counts — essentially free after AQE coalesces.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o.filter(F.col("o_orderstatus") != "F"),
            on=c.c_custkey == o.o_custkey,
            how="left",
        )
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@query(
    "priority_with_big_lineitem",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1996-01-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_quantity > 40
      )
    GROUP BY o_orderpriority
    """,
)
def priority_with_big_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-shaped correlated EXISTS: orders in a date window that have
    at least one qualifying lineitem, tallied by priority.

    Spark plans the EXISTS as a left-semi hash join; the date predicate
    pushes to the orders parquet scan, the quantity predicate to lineitem's,
    so both sides shrink before the shuffle.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    qualifying = li.filter(F.col("l_quantity") > 40).select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .join(qualifying, on="o_orderkey", how="left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "returnflag_share",
    oracle="""
    SELECT l_linestatus,
           round(100.0 * sum(CASE WHEN l_returnflag = 'R'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS return_share_pct,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def returnflag_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-shaped conditional aggregation: CASE-WHEN inside SUM to
    compute the returned-revenue share per line status in ONE scan — the
    relational form of 'tally pass/fail quality gates without two passes'
    (the reference tallies gauntlet outcomes imperatively,
    ``video_extract_frame.py:262-305``).
    """
    li = load_table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    returned = F.when(F.col("l_returnflag") == "R", net).otherwise(F.lit(0.0))
    return li.groupBy("l_linestatus").agg(
        F.round(100.0 * F.sum(returned) / F.sum(net), 4).alias("return_share_pct"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "sessionize_events",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE
                    THEN 0 ELSE 1 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events,
           CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS duration_s
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a new session starts when
    the gap since the user's previous event exceeds 30 minutes; sessions are
    numbered by a running sum of the start markers.

    This is the batch twin of the streaming session window
    (``stream_session_windows``). One shuffle on user_id serves both window
    passes and the final group-by — the partitioning is reused across all
    three stages, so 100 TB of events exchanges exactly once.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gap_s = F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long")
    marked = e.withColumn(
        "new_session", F.when(gap_s <= 30 * 60, F.lit(0)).otherwise(F.lit(1))
    )
    numbered = marked.withColumn("session_id", F.sum("new_session").over(run))
    return numbered.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias(
            "duration_s"
        ),
    )


@query(
    "deterministic_sample",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
    """,
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~1/8 sample by hashing the primary key (first md5 nibble
    in {0,1}) — the curation-pipeline way to carve a stable eval holdout:
    unlike `df.sample`, membership is a pure function of the key, so the
    same docs are selected on every run, every engine, and every scale,
    and the predicate is embarrassingly parallel (no shuffle, no state).
    """
    d = load_table(spark, sf_dir, "documents")
    nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return d.filter(nib.isin("0", "1")).select("doc_id", "lang", "n_chars")


@query(
    "value_percentiles_by_type",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4)  AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95,
           round(quantile_cont(value, 0.99), 4) AS p99,
           count(*) AS n
    FROM events
    WHERE value IS NOT NULL
    GROUP BY event_type
    """,
)
def value_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (p50/p95/p99) per event type —
    distribution summaries for threshold tuning (the reference hard-codes
    thresholds like quality>t, sim in [lo,hi]; this is how you'd derive
    them from data). Spark's `percentile` matches DuckDB's `quantile_cont`
    (linear interpolation). Exact percentiles buffer each group's values —
    fine for bounded group counts; switch to `percentile_approx` when the
    per-group cardinality itself is unbounded at 100 TB.
    """
    e = load_table(spark, sf_dir, "events")
    pct = F.expr("percentile(value, array(0.5, 0.95, 0.99))")
    return (
        e.filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(pct.alias("_p"), F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            F.round(F.col("_p")[0], 4).alias("p50"),
            F.round(F.col("_p")[1], 4).alias("p95"),
            F.round(F.col("_p")[2], 4).alias("p99"),
            "n",
        )
    )


@query(
    "ntile_price_quartiles",
    oracle="""
    SELECT quartile, count(*) AS n, round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM (
        SELECT o_totalprice,
               ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
        FROM orders
    )
    GROUP BY quartile
    """,
)
def ntile_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile bucketing with exact ntile semantics, computed WITHOUT a
    global-sort window (the r04 form funneled the whole fact table through
    one WindowExec task — the one scale-killer the round-4 audit found).

    Distributed total-order ranking, the classic sort-free scheme:
    1. `repartitionByRange` on the deterministic total order (price, key) —
       one range shuffle; partition i holds a contiguous key range below
       partition i+1's.
    2. Per-partition `row_number` (WindowExec partitioned by pid — no
       single-task sort) plus a broadcast per-partition offset table (32
       rows) gives each row its exact global rank.
    3. ntile's bucket boundaries are a pure function of (rank, n): the
       first n%4 buckets get n//4+1 rows, the rest n//4 — computed as an
       expression, no second sort.
    The per-bucket agg then shuffles only (quartile, price). Scales as one
    range exchange + one 4-group agg regardless of fact size."""
    from datapipeline_ops_spark.operators.dedup import persist_barrier

    o = load_table(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    # barrier: the pid column must come from ONE materialization — the range
    # partitioner samples per-instance, so two un-reused plan copies could
    # draw different boundaries and disagree on pids
    ranked = persist_barrier(
        o.repartitionByRange(32, "o_totalprice", "o_orderkey").withColumn(
            "_pid", F.spark_partition_id()
        ),
        "ntile_ranked",
    )
    counts = ranked.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c"))
    # 32-row bounded frame: the unpartitioned window is over per-partition
    # counts, not the fact table
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off"),
        F.sum("_c").over(
            Window.orderBy("_pid").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_n"),
    )
    w_pid = Window.partitionBy("_pid").orderBy("o_totalprice", "o_orderkey")
    big = (F.col("_n") % 4).cast("long")  # first `big` buckets get base_sz+1 rows
    base_sz = ((F.col("_n") - big) / F.lit(4)).cast("long")  # exact: 4*base_sz/4
    cut = big * (base_sz + 1)  # rank boundary between big and small buckets
    r = F.col("_rank")
    quartile = F.when(
        r <= cut, F.floor((r - 1) / (base_sz + 1)) + 1
    ).otherwise(big + F.floor((r - cut - 1) / base_sz) + 1)
    return (
        ranked.join(F.broadcast(offsets), "_pid")
        .withColumn("_rank", F.row_number().over(w_pid) + F.col("_off"))
        .withColumn("quartile", quartile.cast("int"))
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@query(
    "price_stats_by_flag",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
               CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
                   AS sy,
               CAST(sum(CAST(l_quantity AS BIGINT)
                        * CAST(round(l_extendedprice*100) AS BIGINT))
                    AS BIGINT) AS sxy,
               CAST(sum(CAST(l_quantity AS BIGINT)
                        * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx,
               CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                        * CAST(round(l_extendedprice*100) AS BIGINT))
                    AS BIGINT) AS syy,
               round(avg(l_extendedprice), 4)         AS mean_price,
               round(stddev_samp(l_extendedprice), 4) AS sd_price
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag, mean_price, sd_price,
           CASE WHEN (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) > 0
                 AND (CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)) > 0
                THEN round(
                  (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                  / sqrt((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                         * (CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))), 6)
                ELSE NULL END AS qty_price_corr,
           n
    FROM m
    """,
)
def price_stats_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (sample stddev, Pearson correlation) per
    group — distribution diagnostics for threshold tuning. All are
    single-pass partial-aggregatable moments (sum, sum², sum-of-products),
    so the shuffle carries a handful of accumulators per group regardless
    of input size.

    The correlation assembles from exact integer moments (quantity x
    price-cents; corr is scale-invariant so cents == dollars) with a
    zero-variance guard in BOTH engines — Spark's built-in corr()
    DIVIDES BY ZERO under ANSI when a group's column is constant (found
    by the oracle-parity fuzzer; a constant column in some group WILL
    happen at scale). Moment headroom: Σ(price_cents²) is exact to
    ~10^6 rows per group; beyond that accumulate as DECIMAL(38) (the
    spearman note).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_extendedprice",
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("y"),
    )
    m = li.groupBy("l_returnflag").agg(
        F.round(F.avg("l_extendedprice"), 4).alias("mean_price"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    nd = F.col("n").cast("double")
    vx = nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")
    vy = nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double")
    cov = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")
    return m.select(
        "l_returnflag",
        "mean_price",
        "sd_price",
        F.when((vx > 0) & (vy > 0), F.round(cov / F.sqrt(vx * vy), 6))
        .otherwise(F.lit(None).cast("double"))
        .alias("qty_price_corr"),
        "n",
    )


@query(
    "orders_by_weekday",
    oracle="""
    SELECT CAST(isodow(o_orderdate) - 1 AS INT) AS weekday,
           count(*) AS n_orders,
           round(avg(o_totalprice), 4) AS avg_price
    FROM orders
    GROUP BY 1
    """,
)
def orders_by_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order volume by day-of-week (0=Monday — Spark's `weekday`; the
    oracle uses isodow-1, since the engines' default day numbering
    differs). Calendar-function parity is exactly the kind of cross-engine
    trap the oracle gate exists to catch."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.weekday("o_orderdate").alias("weekday"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
    )


@query(
    "overlapping_order_windows",
    oracle="""
    WITH w AS (
        SELECT o_orderkey, o_custkey, o_orderdate AS s,
               o_orderdate + INTERVAL 7 DAY AS e
        FROM orders
    )
    SELECT a.o_custkey AS custkey, a.o_orderkey AS key_a, b.o_orderkey AS key_b,
           CAST(date_diff('second',
                          CASE WHEN a.s > b.s THEN a.s ELSE b.s END,
                          CASE WHEN a.e < b.e THEN a.e ELSE b.e END) AS BIGINT)
               AS overlap_s
    FROM w a JOIN w b
      ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
     AND a.s <= b.e AND b.s <= a.e
    """,
)
def overlapping_order_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-OVERLAP self-join: pairs of the same customer's orders whose
    7-day windows intersect, with the overlap length. The equi-key
    (customer) partitions the join; the overlap predicate is a residual
    theta condition evaluated inside each key group — the scalable form of
    interval joins when a natural partition key exists (without one, use
    the bucket-expansion pattern of range_join_value_bands).
    """
    o = load_table(spark, sf_dir, "orders")
    w = o.select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").alias("s"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("e"),
    )
    a, b = w.alias("a"), w.alias("b")
    # o_orderdate reads as TIMESTAMP_NTZ; NTZ won't cast straight to long —
    # hop through TIMESTAMP (identity under the UTC session timezone).
    overlap_s = (
        F.least(F.col("a.e"), F.col("b.e")).cast("timestamp").cast("long")
        - F.greatest(F.col("a.s"), F.col("b.s")).cast("timestamp").cast("long")
    )
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
            & (F.col("a.s") <= F.col("b.e"))
            & (F.col("b.s") <= F.col("a.e")),
        )
        .select(
            F.col("a.o_custkey").alias("custkey"),
            F.col("a.o_orderkey").alias("key_a"),
            F.col("b.o_orderkey").alias("key_b"),
            overlap_s.alias("overlap_s"),
        )
    )


@query(
    "brand_size_rank",
    oracle="""
    WITH g AS (
        SELECT p_brand, p_size, count(*) AS n_parts FROM part GROUP BY 1, 2
    )
    SELECT p_brand, p_size,
           CAST(rank() OVER w AS INT) AS rnk,
           CAST(dense_rank() OVER w AS INT) AS drnk,
           n_parts
    FROM g
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_size DESC)
    """,
)
def brand_size_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank vs dense_rank with REAL ties (many parts share a size within a
    brand): tied rows get equal rank, and both rank flavors are functions of
    the VALUE alone, so the result is deterministic under any partitioning —
    unlike row_number, which would need a tiebreak column."""
    p = load_table(spark, sf_dir, "part")
    grouped = p.groupBy("p_brand", "p_size").agg(F.count(F.lit(1)).alias("n_parts"))
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_size"))
    return grouped.select(
        "p_brand",
        "p_size",
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        "n_parts",
    )


@query(
    "promo_revenue_share",
    oracle="""
    SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
           round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))
                                  ELSE 0 END)
                 / sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))), 4) AS promo_share,
           CAST((sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) + 50) // 100 AS BIGINT) / 100.0 AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-shaped promo-revenue ratio per ship month: fact-dim join +
    conditional aggregation over the joined row.

    Scale shape: `part` is the small side and broadcasts (pruned to two
    columns before the exchange), so lineitem is scanned once and never
    shuffled for the join; the month group-by partial-aggregates map-side
    to ~|months| rows. The CASE lives inside the sum — one pass, no second
    join or self-union for the promo subset.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.round(F.col("l_extendedprice") * 100, 0).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100, 0).cast("long")
    )
    zero = F.lit(0).cast("long")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy(F.date_trunc("month", "l_shipdate").cast("date").alias("month"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
                / F.sum(rev),
                4,
            ).alias("promo_share"),
            F.sum(rev).alias("_u"),
        )
        .withColumn("total_revenue", F.expr("CAST((_u + 50) div 100 AS DOUBLE) / 100.0"))
        .drop("_u")
    )


@query(
    "idle_big_balance_customers",
    oracle="""
    SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
    FROM customer
    WHERE CAST(round(c_acctbal*100) AS BIGINT)
          * (SELECT count(*) FROM customer WHERE c_acctbal > 0)
          > (SELECT sum(CAST(round(c_acctbal*100) AS BIGINT))
             FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    """,
)
def idle_big_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-shaped audit: above-average-balance customers with no OPEN
    orders (dormant high-value accounts).

    The scalar subquery (global avg over positive balances) is a one-row
    aggregate broadcast into the filter; the NOT EXISTS is a LEFT ANTI join
    on the customer key — Spark's anti-join never materializes the matched
    payload, so the orders side is reduced to its join column at the scan.
    """
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select("o_custkey")
    )
    # Integer cross-multiplication (cents * n_pos > sum_pos_cents) == the
    # ``bal > avg`` predicate, without a float average deciding boundary
    # MEMBERSHIP by partial-sum order.
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.count(F.lit(1)).cast("long").alias("n_pos"),
        F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("long")).alias(
            "sum_pos_cents"
        ),
    )
    rich = c.join(F.broadcast(avg_bal)).filter(
        F.round(F.col("c_acctbal") * 100, 0).cast("long") * F.col("n_pos")
        > F.col("sum_pos_cents")
    )
    idle = rich.join(o, rich["c_custkey"] == o["o_custkey"], "left_anti")
    return idle.select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"))


@query(
    "returned_revenue_by_nation",
    oracle="""
    SELECT n.n_name AS nation,
           CAST((sum(CASE WHEN l.l_returnflag = 'R'
                          THEN CAST(round(l.l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l.l_discount*100) AS BIGINT))
                          ELSE 0 END) + 50) // 100 AS BIGINT) / 100.0
               AS returned_revenue,
           round(100.0 * sum(CASE WHEN l.l_returnflag = 'R'
                                  THEN CAST(round(l.l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l.l_discount*100) AS BIGINT))
                                  ELSE 0 END)
                 / sum(CAST(round(l.l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l.l_discount*100) AS BIGINT))), 4) AS returned_share,
           count(DISTINCT c.c_custkey) AS n_customers
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def returned_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-flavored returns analysis rolled up to nation (no top-k
    cutoff, so the result is deterministic across engines): which markets
    return the most revenue, as an absolute and a share of their spend.

    Scale shape: the two fact tables join on the order key (both shuffle on
    a bigint); customer and nation broadcast. The conditional sums ride the
    single group-by; count(DISTINCT custkey) is Spark's built-in two-phase
    distinct aggregate — no second join over the facts.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = F.round(F.col("l_extendedprice") * 100, 0).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100, 0).cast("long")
    )
    ret = F.when(F.col("l_returnflag") == "R", rev).otherwise(F.lit(0).cast("long"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(ret).alias("_ru"),
            F.round(100.0 * F.sum(ret) / F.sum(rev), 4).alias("returned_share"),
            F.count_distinct(F.col("c_custkey")).alias("n_customers"),
        )
        .select(
            "nation",
            F.expr("CAST((_ru + 50) div 100 AS DOUBLE) / 100.0").alias("returned_revenue"),
            "returned_share",
            "n_customers",
        )
    )


# --- CDC snapshot diff ------------------------------------------------------

# Deterministic two-snapshot derivation from one table: rows with
# key % 50 == 7 are "inserted" after the old snapshot, key % 50 == 23 are
# "deleted" before the new one, and key % 13 == 0 rows change price.
_INS_MOD, _DEL_MOD, _UPD_MOD = 7, 23, 13


@query(
    "snapshot_diff_cdc",
    oracle=f"""
    WITH old_s AS (
        SELECT o_orderkey,
               md5(o_orderstatus || '|' || printf('%.2f', o_totalprice)) AS h
        FROM orders WHERE o_orderkey % 50 <> {_INS_MOD}
    ),
    new_s AS (
        SELECT o_orderkey,
               md5(o_orderstatus || '|' || printf('%.2f',
                   CASE WHEN o_orderkey % {_UPD_MOD} = 0
                        THEN o_totalprice + 1.0 ELSE o_totalprice END)) AS h
        FROM orders WHERE o_orderkey % 50 <> {_DEL_MOD}
    )
    SELECT coalesce(old_s.o_orderkey, new_s.o_orderkey) AS o_orderkey,
           CASE WHEN old_s.h IS NULL THEN 'insert'
                WHEN new_s.h IS NULL THEN 'delete'
                WHEN old_s.h <> new_s.h THEN 'update'
                ELSE 'unchanged' END AS change_type
    FROM old_s FULL JOIN new_s ON old_s.o_orderkey = new_s.o_orderkey
    """,
)
def snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style snapshot diff: classify every key across two table versions
    as insert / delete / update / unchanged — the change-detection pass an
    incremental ingest runs before a merge/upsert. Rows compare via an
    md5 row-hash of the tracked columns (the wide-table CDC pattern: one
    hash comparison instead of N column comparisons), and the two versions
    full-outer-join on the key.

    Scale: two scans of the same table (in production: two snapshot
    locations), one full outer shuffle join on the bigint key; the row hash
    is computed map-side so the shuffle carries (key, 32-byte hash), never
    the tracked columns themselves."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )

    def row_hash(price: F.Column) -> F.Column:
        return F.md5(
            F.concat_ws("|", F.col("o_orderstatus"), F.format_string("%.2f", price)).cast(
                "binary"
            )
        )

    old_s = o.filter(F.col("o_orderkey") % 50 != _INS_MOD).select(
        "o_orderkey", row_hash(F.col("o_totalprice")).alias("h_old")
    )
    new_price = F.when(
        F.col("o_orderkey") % _UPD_MOD == 0, F.col("o_totalprice") + 1.0
    ).otherwise(F.col("o_totalprice"))
    new_s = o.filter(F.col("o_orderkey") % 50 != _DEL_MOD).select(
        "o_orderkey", row_hash(new_price).alias("h_new")
    )
    diff = old_s.join(new_s, "o_orderkey", "full")
    return diff.select(
        "o_orderkey",
        F.when(F.col("h_old").isNull(), "insert")
        .when(F.col("h_new").isNull(), "delete")
        .when(F.col("h_old") != F.col("h_new"), "update")
        .otherwise("unchanged")
        .alias("change_type"),
    )


@query(
    "winsorized_value_stats",
    oracle="""
    WITH q AS (
        SELECT event_type,
               quantile_cont(value, 0.01) AS lo, quantile_cont(value, 0.99) AS hi
        FROM events WHERE value IS NOT NULL GROUP BY event_type
    )
    SELECT e.event_type,
           round(avg(least(greatest(value, lo), hi)), 4) AS wavg,
           round(stddev(least(greatest(value, lo), hi)), 4) AS wstd,
           count(*) AS n,
           round(min(lo), 4) AS p01, round(min(hi), 4) AS p99
    FROM events e JOIN q ON e.event_type = q.event_type
    WHERE value IS NOT NULL
    GROUP BY e.event_type
    """,
)
def winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (p01/p99-clipped) mean and stddev per event type — the
    outlier-robust summary a feature pipeline computes before normalizing a
    heavy-tailed metric column. Two passes: exact interpolated cutpoints
    per group (matches DuckDB quantile_cont), then the tiny per-type
    cutpoint table broadcast back onto the scan for clip + aggregate; the
    fact table shuffles once, on event_type, for the partial-agg rollup."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    pct = F.expr("percentile(value, array(0.01, 0.99))")
    q = e.groupBy("event_type").agg(
        pct[0].alias("lo"), pct[1].alias("hi")
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        e.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.avg(clipped), 4).alias("wavg"),
            F.round(F.stddev(clipped), 4).alias("wstd"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("lo"), 4).alias("p01"),
            F.round(F.min("hi"), 4).alias("p99"),
        )
    )


@query(
    "merge_upsert_apply",
    oracle=f"""
    WITH old_s AS (
        SELECT o_orderkey, round(o_totalprice, 2) AS price
        FROM orders WHERE o_orderkey % 50 <> {_INS_MOD}
    ),
    new_s AS (
        SELECT o_orderkey,
               round(CASE WHEN o_orderkey % {_UPD_MOD} = 0
                          THEN o_totalprice + 1.0 ELSE o_totalprice END, 2) AS price
        FROM orders WHERE o_orderkey % 50 <> {_DEL_MOD}
    )
    SELECT new_s.o_orderkey, new_s.price,
           CASE WHEN old_s.o_orderkey IS NULL THEN 'insert'
                WHEN old_s.price <> new_s.price THEN 'update'
                ELSE 'keep' END AS action
    FROM old_s FULL JOIN new_s ON old_s.o_orderkey = new_s.o_orderkey
    WHERE new_s.o_orderkey IS NOT NULL
    """,
)
def merge_upsert_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGE (upsert) that follows snapshot_diff_cdc: apply the source
    snapshot onto the target — insert new keys, update changed rows, keep
    unchanged ones, drop keys absent from the source (`WHEN NOT MATCHED BY
    SOURCE THEN DELETE`) — emitting the merged table with a per-row action
    tag, exactly what a Delta/Iceberg MERGE writes plus its audit column.

    Same deterministic two-snapshot derivation as snapshot_diff_cdc
    (`_INS_MOD`/`_DEL_MOD`/`_UPD_MOD`); one full-outer shuffle join on the
    key — at 100 TB both sides are key-partitioned snapshots, so the merge
    is the canonical co-partitioned sort-merge join and the write preserves
    the target's partitioning for the next increment."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    old_s = o.filter(F.col("o_orderkey") % 50 != _INS_MOD).select(
        F.col("o_orderkey").alias("k_old"),
        F.round("o_totalprice", 2).alias("p_old"),
    )
    new_price = F.when(
        F.col("o_orderkey") % _UPD_MOD == 0, F.col("o_totalprice") + 1.0
    ).otherwise(F.col("o_totalprice"))
    new_s = o.filter(F.col("o_orderkey") % 50 != _DEL_MOD).select(
        F.col("o_orderkey").alias("k_new"), F.round(new_price, 2).alias("p_new")
    )
    merged = old_s.join(new_s, old_s.k_old == new_s.k_new, "full").filter(
        F.col("k_new").isNotNull()
    )
    return merged.select(
        F.col("k_new").alias("o_orderkey"),
        F.col("p_new").alias("price"),
        F.when(F.col("k_old").isNull(), "insert")
        .when(F.col("p_old") != F.col("p_new"), "update")
        .otherwise("keep")
        .alias("action"),
    )


@query(
    "copurchase_part_pairs",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    p AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT part_a, part_b, count(*) AS n_orders
    FROM p GROUP BY part_a, part_b
    ORDER BY n_orders DESC, part_a, part_b LIMIT 25
    """,
)
def copurchase_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top-25 part pairs that appear in the
    same order, with a deterministic (count, a, b) tiebreak — the candidate
    stage of frequent-itemset mining.

    The self-join is keyed on l_orderkey, so candidate pairs scale with
    Σ items_per_order² — bounded because baskets are small (TPC-H ≤ 7
    lines/order); at 100 TB the guard for pathological baskets is the same
    per-key cap used in the LSH bucket stage (operators/dedup.py
    LSH_MAX_BUCKET pattern). Top-K is a TakeOrdered over the aggregated
    pair table, never a global sort."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.alias("a")
    b = li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(25)
    )


@query(
    "fk_integrity_report",
    oracle="""
    SELECT 'lineitem->orders' AS fk, count(*) AS n_rows,
           CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'orders->customer', count(*),
           CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'lineitem->part', count(*),
           CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
    UNION ALL
    SELECT 'lineitem->supplier', count(*),
           CAST(sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
    UNION ALL
    SELECT 'customer->nation', count(*),
           CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
)
def fk_integrity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across every foreign key in the star
    schema: per FK, total child rows and orphan rows whose parent key is
    missing — the pre-ingest data-quality gate a lakehouse pipeline runs
    before trusting joins (Spark enforces no constraints; this computes
    them).

    Each edge is a left join against the PARENT KEY COLUMN only —
    dimension-sized parents (customer/part/supplier/nation) broadcast so
    the fact side never shuffles; the fact-sized parent (orders) goes
    through a shuffled join on the key both sides are already bucketed by
    in a production layout. The five audits are independent jobs unioned
    into one report."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ["lineitem", "orders", "customer", "supplier", "part", "nation"]}

    def audit(fk: str, child: DataFrame, ck: str, parent: DataFrame, pk: str,
              bcast: bool = True) -> DataFrame:
        p = parent.select(pk).distinct()
        if bcast:
            p = F.broadcast(p)
        j = child.select(ck).join(p, child[ck] == p[pk], "left")
        return j.agg(
            F.lit(fk).alias("fk"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col(pk).isNull(), 1).otherwise(0)).alias("n_orphans"),
        )

    reports = [
        audit("lineitem->orders", t["lineitem"], "l_orderkey", t["orders"],
              "o_orderkey", bcast=False),
        audit("orders->customer", t["orders"], "o_custkey", t["customer"], "c_custkey"),
        audit("lineitem->part", t["lineitem"], "l_partkey", t["part"], "p_partkey"),
        audit("lineitem->supplier", t["lineitem"], "l_suppkey", t["supplier"], "s_suppkey"),
        audit("customer->nation", t["customer"], "c_nationkey", t["nation"], "n_nationkey"),
    ]
    out = reports[0]
    for r in reports[1:]:
        out = out.unionAll(r)
    return out


# ---------------------------------------------------------------------------
# Incremental materialized-view refresh
# ---------------------------------------------------------------------------

_MV_CUTOVER_DAY = 19745  # events on/after this epoch-day are "new arrivals"


@query(
    "incremental_mv_refresh",
    oracle="""
    SELECT event_type,
           CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
           count(*) AS n_events,
           CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) / 100.0
               AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def incremental_mv_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the daily-rollup MV is
    refreshed by aggregating ONLY the newly arrived slice (day >=
    cutover) and merging it with the existing MV rows — base rows pass
    through untouched, overlapping (type, day) cells combine additively
    (count and sum are self-decomposable aggregates). The oracle is the
    full recompute, so the hash match PROVES incremental == full — the
    property that lets a 100 TB warehouse maintain daily rollups by
    touching only the new partition instead of re-scanning history.

    Plan shape: two partial-aggregated rollups (the base build stands in
    for the stored MV — production reads it back from the lake, paying
    zero scan of history) and a union + re-rollup over |cells| rows, not
    raw events. Avg/percentile-style MVs store (sum, count) components to
    stay decomposable; MIN/MAX only merge additively under inserts."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long").alias("day"),
        "value",
    )
    # value is 2-dp money: sum exact integer cents through BOTH rollup
    # levels (self-decomposable AND partition-order-independent — double
    # partial sums are not), divide once at the end (2 dp <= the published
    # 4 dp, so no rounding step is needed at all).
    daily = lambda df: df.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("sv"),
    )
    base_mv = daily(e.filter(F.col("day") < _MV_CUTOVER_DAY))      # the stored MV
    delta_mv = daily(e.filter(F.col("day") >= _MV_CUTOVER_DAY))    # new slice only
    merged = (
        base_mv.unionByName(delta_mv)
        .groupBy("event_type", "day")
        .agg(F.sum("n_events").alias("n_events"), F.sum("sv").alias("sv"))
    )
    return merged.select(
        "event_type",
        "day",
        "n_events",
        (F.col("sv").cast("double") / 100.0).alias("total_value"),
    )


@query(
    "unpivot_order_metrics",
    oracle="""
    SELECT metric, count(*) AS n,
           CAST(sum(CAST(round(val*100) AS BIGINT)) AS BIGINT) / 100.0
               AS total,
           CAST((2000000 * sum(CAST(round(val*100) AS BIGINT))
                 + 100 * count(*))
                // (2 * 100 * count(*)) AS BIGINT) / 1000000.0 AS mean
    FROM (
        SELECT l_orderkey, metric, val FROM (
            SELECT l_orderkey,
                   l_quantity AS quantity,
                   l_extendedprice AS extendedprice,
                   l_discount AS discount,
                   l_tax AS tax
            FROM lineitem
        ) UNPIVOT (val FOR metric IN (quantity, extendedprice, discount, tax))
    ) GROUP BY metric
    """,
)
def unpivot_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt — the inverse of events_type_pivot: four wide lineitem
    metric columns melted to long (key, metric, value) rows and profiled
    per metric. The long form is what metric stores, drift monitors and
    plotting layers consume; Spark's `unpivot` keeps it one scan with the
    row expansion done post-projection (4 rows out per lineitem).

    Melting never shuffles — the only exchange is the |metrics|-row
    rollup, partial-aggregated map-side."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.col("l_quantity").alias("quantity"),
        F.col("l_extendedprice").alias("extendedprice"),
        F.col("l_discount").alias("discount"),
        F.col("l_tax").alias("tax"),
    )
    melted = li.unpivot(
        "l_orderkey", ["quantity", "extendedprice", "discount", "tax"], "metric", "val"
    )
    val_c = F.round(F.col("val") * 100, 0).cast("long")
    return (
        melted.groupBy("metric")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(val_c).alias("_c"),
        )
        .select(
            "metric",
            "n",
            (F.col("_c") / 100.0).alias("total"),
            F.expr(
                "CAST((CAST(_c AS DECIMAL(38,0)) * 2000000 + 100 * n)"
                " div (2 * 100 * n) AS DOUBLE) / 1000000.0"
            ).alias("mean"),
        )
    )


@query(
    "user_event_type_map",
    oracle="""
    WITH cells AS (
        SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           '{' || string_agg('"' || event_type || '":' || n, ',' ORDER BY event_type)
               || '}' AS type_counts,
           CAST(sum(n) AS BIGINT) AS n_total
    FROM cells GROUP BY user_id
    """,
)
def user_event_type_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type histogram emitted as a MAP column — the nested
    output shape feature stores serve ("counters per user as one row"),
    exercising MapType end-to-end through the value gate.  Entries are
    assembled in sorted key order and the map serializes to canonical JSON
    for the gate (engines' client-side MAP representations differ; the
    MapType itself is exercised inside the plan).  One partial-aggregated (user, type) shuffle, then a
    per-user merge; the map is bounded by |event types|."""
    e = load_table(spark, sf_dir, "events")
    cells = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    entry = F.struct(F.col("event_type").alias("k"), F.col("n").alias("v"))
    return cells.groupBy("user_id").agg(
        F.to_json(F.map_from_entries(F.array_sort(F.collect_list(entry))))
        .alias("type_counts"),
        F.sum("n").cast("long").alias("n_total"),
    )


@query(
    "decimal_exact_totals",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18, 2)) AS DECIMAL(28, 2)))
                AS VARCHAR) AS total_price,
           count(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def decimal_exact_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL aggregation: order totals quantized to DECIMAL(18,2)
    and summed in decimal arithmetic — the money path where double rounding
    is unacceptable and results must be bit-identical regardless of
    partitioning or add order (decimal addition is associative; double
    addition is not).  Exercises Spark's decimal sum codepath through the
    gate; the oracle mirrors the same two-step quantize-then-widen cast, and the
    total leaves the plan as its canonical string so the gate hashes the
    exact decimal digits (client DECIMAL representations vary)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)").cast("decimal(28,2)"))
        .cast("string")
        .alias("total_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# supplier_return_wilson — rank by proportion the statistically sound way
# ---------------------------------------------------------------------------

_WIL_Z = 1.959963984540054  # 95% two-sided
_WIL_TOP = 25
_WIL_MIN_N = 20


@query(
    "supplier_return_wilson",
    oracle=f"""
    WITH s AS MATERIALIZED (
        SELECT l_suppkey,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_returned
        FROM lineitem GROUP BY l_suppkey
        HAVING count(*) >= {_WIL_MIN_N}
    ),
    sc AS (
        SELECT l_suppkey, n, n_returned,
               CAST(n_returned AS DOUBLE) / CAST(n AS DOUBLE) AS p_hat,
               (CAST(n_returned AS DOUBLE) / CAST(n AS DOUBLE)
                + {_WIL_Z} * {_WIL_Z} / (2.0 * CAST(n AS DOUBLE))
                - {_WIL_Z} * sqrt(
                    (CAST(n_returned AS DOUBLE) / CAST(n AS DOUBLE)
                     * (1.0 - CAST(n_returned AS DOUBLE) / CAST(n AS DOUBLE))
                     + {_WIL_Z} * {_WIL_Z} / (4.0 * CAST(n AS DOUBLE)))
                    / CAST(n AS DOUBLE)))
               / (1.0 + {_WIL_Z} * {_WIL_Z} / CAST(n AS DOUBLE)) AS wilson_lcb
        FROM s
    )
    SELECT l_suppkey, n, n_returned, p_hat, wilson_lcb
    FROM sc ORDER BY wilson_lcb DESC, l_suppkey LIMIT {_WIL_TOP}
    """,
)
def supplier_return_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers ranked by the WILSON LOWER CONFIDENCE BOUND of their
    return rate (not the raw rate): a supplier with 3/3 returns must not
    outrank one with 80/100 — the small-n shrinkage every proportion
    leaderboard needs (the same estimator behind comment-ranking and
    defect-rate triage). Raw p̂ rides along so the shrinkage is visible.

    Exactness: counts are integers; the Wilson bound is one fixed-order
    float expression per supplier with the z constant embedded as the same
    literal in both engines; ranking ties break on the key.

    Scale: one partial-agg pass over lineitem grouped by supplier, a
    projection, and a TakeOrdered top-{_WIL_TOP} — leaderboards never sort
    globally."""
    s = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("n_returned"),
        )
        .filter(F.col("n") >= _WIL_MIN_N)
    )
    nn = F.col("n").cast("double")
    p = F.col("n_returned").cast("double") / nn
    z2 = _WIL_Z * _WIL_Z
    lcb = (
        p
        + F.lit(z2) / (F.lit(2.0) * nn)
        - F.lit(_WIL_Z)
        * F.sqrt((p * (F.lit(1.0) - p) + F.lit(z2) / (F.lit(4.0) * nn)) / nn)
    ) / (F.lit(1.0) + F.lit(z2) / nn)
    return (
        s.select("l_suppkey", "n", "n_returned", p.alias("p_hat"), lcb.alias("wilson_lcb"))
        .orderBy(F.desc("wilson_lcb"), F.asc("l_suppkey"))
        .limit(_WIL_TOP)
    )


# ---------------------------------------------------------------------------
# discount_quantity_elasticity — does discounting move volume?
# ---------------------------------------------------------------------------

_ELA_MIN_N = 50


@query(
    "discount_quantity_elasticity",
    oracle=f"""
    WITH j AS MATERIALIZED (
        SELECT p.p_brand,
               CAST(round(l.l_discount * 100) AS BIGINT) AS disc_pct,
               CAST(round(l.l_quantity) AS BIGINT) AS qty
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    m AS (
        SELECT p_brand,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(disc_pct) AS BIGINT) AS sx,
               CAST(sum(qty) AS BIGINT) AS sy,
               CAST(sum(disc_pct * qty) AS BIGINT) AS sxy,
               CAST(sum(disc_pct * disc_pct) AS BIGINT) AS sxx,
               CAST(sum(qty * qty) AS BIGINT) AS syy
        FROM j GROUP BY p_brand
        HAVING count(*) >= {_ELA_MIN_N}
    )
    SELECT p_brand, n,
           CASE WHEN n * sxx - sx * sx > 0 THEN
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE)
           END AS slope_qty_per_pct,
           CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0 THEN
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                          * CAST(n * syy - sy * sy AS DOUBLE))
           END AS pearson_r
    FROM m
    """,
)
def discount_quantity_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand discount→quantity response: the OLS slope (extra units per
    discount point) and Pearson correlation between discount and quantity
    — the 'is the discount budget buying anything' readout, computed per
    brand so one aggressive brand can't masquerade as corpus-wide
    elasticity (the Simpson's screen's sibling).

    Exactness: discounts quantize to integer PERCENT and quantities to
    integer units, so all five regression moments are exact integer sums
    and both statistics are fixed-order ratios; degenerate brands
    (constant discount or constant quantity) emit NULL identically.

    Scale: one fact-dim equi-join (part broadcast-eligible) and one
    partial-agg moment pass — the sufficient-statistics pattern; nothing
    after the rollup exceeds |brands| rows."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_discount") * 100).cast("long").alias("disc_pct"),
        F.round(F.col("l_quantity")).cast("long").alias("qty"),
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(p, li["l_partkey"] == p["p_partkey"]).select(
        "p_brand", "disc_pct", "qty"
    )
    m = (
        j.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("disc_pct").cast("long").alias("sx"),
            F.sum("qty").cast("long").alias("sy"),
            F.sum(F.col("disc_pct") * F.col("qty")).cast("long").alias("sxy"),
            F.sum(F.col("disc_pct") * F.col("disc_pct")).cast("long").alias("sxx"),
            F.sum(F.col("qty") * F.col("qty")).cast("long").alias("syy"),
        )
        .filter(F.col("n") >= _ELA_MIN_N)
    )
    den_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return m.select(
        "p_brand",
        "n",
        F.when(den_x > 0, num.cast("double") / den_x.cast("double")).alias(
            "slope_qty_per_pct"
        ),
        F.when(
            (den_x > 0) & (den_y > 0),
            num.cast("double") / F.sqrt(den_x.cast("double") * den_y.cast("double")),
        ).alias("pearson_r"),
    )


# ---------------------------------------------------------------------------
# trade_flow_matrix — TPC-H Q7's shape: who ships value to whom
# ---------------------------------------------------------------------------


@query(
    "trade_flow_matrix",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(count(*) AS BIGINT) AS n_lineitems,
           CAST((sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
                     * (100 - CAST(round(l.l_discount*100) AS BIGINT)))
                 + 50) // 100 AS BIGINT) / 100.0 AS revenue
    FROM lineitem l
    JOIN orders o    ON o.o_orderkey = l.l_orderkey
    JOIN customer c  ON c.c_custkey = o.o_custkey
    JOIN supplier s  ON s.s_suppkey = l.l_suppkey
    JOIN nation cn   ON cn.n_nationkey = c.c_nationkey
    JOIN nation sn   ON sn.n_nationkey = s.s_nationkey
    WHERE cn.n_name <> sn.n_name
    GROUP BY cn.n_name, sn.n_name
    HAVING count(*) >= 5
    """,
)
def trade_flow_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-nation trade-flow matrix (TPC-H Q7's shape): discounted
    revenue flowing from each supplier nation to each DIFFERENT customer
    nation — the five-table snowflake join that exercises the planner's
    join-order and broadcast decisions harder than any single-dim query
    (two independent fact→dim arms meeting at lineitem).

    Plan shape: lineitem⋈orders is the one fact-fact shuffle; customer
    joins on the shuffled side; supplier and BOTH nation aliases are
    broadcast dims; the inequality filter lands after the dim joins where
    both names exist. Revenue is summed in exact integer cent-percent
    units (cents x (100 - whole-percent discount), the `_rev_units`
    convention from tpch_shapes.py) so the partial-sum ordering can never
    move a cell across a half-cent rounding boundary — the r08 driver red
    was exactly that draw on raw double sums. Divide to dollars once at
    the end; the >=5 support floor keeps the matrix stable across SFs."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    sn = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(cn), c["c_nationkey"] == F.col("c_nk"))
        .join(F.broadcast(sn), s["s_nationkey"] == F.col("s_nk"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("long")
                * (
                    F.lit(100)
                    - F.round(F.col("l_discount") * 100, 0).cast("long")
                )
            ).alias("_u"),
        )
        .filter(F.col("n_lineitems") >= 5)
        .withColumn("revenue", F.expr("CAST((_u + 50) div 100 AS DOUBLE) / 100.0"))
        .drop("_u")
    )


# ---------------------------------------------------------------------------
# small_quantity_order_revenue — TPC-H Q17's correlated-aggregate shape
# ---------------------------------------------------------------------------


@query(
    "small_quantity_order_revenue",
    oracle="""
    WITH pa AS MATERIALIZED (
        SELECT l_partkey, avg(l_quantity) AS avg_qty, count(*) AS n
        FROM lineitem GROUP BY l_partkey HAVING count(*) >= 3
    )
    SELECT CAST(count(*) AS BIGINT) AS n_small_lineitems,
           CAST((2 * sum(CAST(round(l.l_extendedprice*100) AS BIGINT)) + 7)
                // 14 AS BIGINT) / 100.0 AS avg_yearly
    FROM lineitem l JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE l.l_quantity < 0.2 * pa.avg_qty
    """,
)
def small_quantity_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17's shape): lineitems whose
    quantity falls below 20% of THAT PART's average quantity — the
    correlated-scalar-aggregate pattern ('compare each row to its group's
    statistic'), decorrelated the way every engine must: compute the
    per-part averages ONCE as an aggregate, then one equi-join back, never
    a per-row subquery. Parts with < 3 lineitems are excluded so the
    threshold is a real average, keeping the result stable at sf0.001.

    Exactness note: the 0.2·avg threshold compares each row against a
    float average — both engines derive avg_qty from the identical
    integer-valued quantities with one division (count and sum are exact),
    so the comparison boundary is bit-identical. Output keeps Q17's
    avg_yearly normalization, summed and rounded in exact integer cents.

    Scale: one partial-agg pass builds the per-part thresholds, one
    shuffle equi-join on l_partkey applies them — at 100 TB the threshold
    table is |parts|-sized and bucket-joins with the fact table."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pa = (
        li.groupBy("l_partkey")
        .agg(F.avg("l_quantity").alias("avg_qty"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 3)
        .select("l_partkey", "avg_qty")
    )
    return (
        li.join(pa, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_small_lineitems"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("long")
            ).alias("_cents"),
        )
        # avg_yearly = round(sum_cents/700, 2) computed half-up in integer
        # space — round(double, 2) is the shortest-decimal divergence class
        # (functions/money.py) even though the exact rational can't land on
        # a half boundary (2k/7 odd is impossible).
        .select(
            "n_small_lineitems",
            F.expr(
                "CAST((2 * _cents + 7) div 14 AS DOUBLE) / 100.0"
            ).alias("avg_yearly"),
        )
    )
