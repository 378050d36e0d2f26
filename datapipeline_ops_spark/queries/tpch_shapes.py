"""Third wave of relational coverage: the TPC-H join shapes not yet in the
registry — Q2 (argmin + join-back), Q8 (two-level share-of-total), Q9
(multi-dim profit rollup), Q11 (group vs global scalar threshold), Q15
(max-of-aggregate), Q16 (anti-join + count distinct), Q18 (HAVING join-back
to detail), Q19 (disjunction of conjunctive band predicates), Q20 (nested
semi-join chain), Q21 (EXISTS + NOT EXISTS on the same fact).

The reference engine has no relational surface (SURVEY.md §2.2 — it is a
Ray-based media pipeline), but these shapes are exactly what its users run
around the pipeline: supplier selection, share-of-total reporting,
exception audits. Adapted to the available catalog (no partsupp table:
supplier-part economics derive from lineitem facts).

Cross-engine exactness strategy: every monetary comparison and threshold is
integer. Money columns are 2-dp exact in the testdata (verified: max
deviation of price*100 from an integer is < 1e-9), so
``CAST(round(x*100) AS BIGINT)`` cents are exact in both engines; discounts
are whole percents, so revenue lives in "cent-percent" units
``cents * (100 - disc_pct)`` — BIGINT all the way, no float boundary can
flip a HAVING or a max. Dollar outputs divide back by 1e4 at the end
(identical integer -> identical double -> identical round).

All queries are pure ``pyspark.sql.functions`` — JVM-side, codegen-friendly,
no Python UDFs. Scale notes per query docstring.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.tables import load_table


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100, 0).cast("long")


def _rev_units() -> F.Column:
    """Revenue in cent-percent units: cents * (100 - whole-percent discount).

    Exact BIGINT in both engines; 1 dollar == 10_000 units."""
    disc_pct = F.round(F.col("l_discount") * 100, 0).cast("long")
    return _cents("l_extendedprice") * (F.lit(100) - disc_pct)


_SQL_REV_UNITS = (
    "CAST(round(l_extendedprice*100) AS BIGINT)"
    " * (100 - CAST(round(l_discount*100) AS BIGINT))"
)


# ---------------------------------------------------------------------------
# min_cost_supplier_per_part — TPC-H Q2's argmin + join-back shape
# ---------------------------------------------------------------------------


@query(
    "min_cost_supplier_per_part",
    oracle=f"""
    WITH su AS MATERIALIZED (
        SELECT l_partkey, l_suppkey,
               min(CAST(round(l_extendedprice*100) AS BIGINT)
                   // CAST(l_quantity AS BIGINT)) AS unit_cents
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    best AS MATERIALIZED (
        SELECT l_partkey, min(unit_cents) AS min_unit_cents,
               count(*) AS n_suppliers
        FROM su GROUP BY l_partkey HAVING count(*) >= 2
    ),
    pick AS (
        SELECT su.l_partkey, b.min_unit_cents, b.n_suppliers,
               min(su.l_suppkey) AS best_suppkey
        FROM su JOIN best b
          ON b.l_partkey = su.l_partkey AND su.unit_cents = b.min_unit_cents
        GROUP BY su.l_partkey, b.min_unit_cents, b.n_suppliers
    )
    SELECT p.l_partkey AS p_partkey, p.min_unit_cents,
           CAST(p.n_suppliers AS BIGINT) AS n_suppliers,
           p.best_suppkey, n.n_name AS supp_nation
    FROM pick p
    JOIN supplier s ON s.s_suppkey = p.best_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    """,
)
def min_cost_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest supplier per part (TPC-H Q2's shape): the correlated
    'minimum cost within the group' subquery, decorrelated as
    aggregate-once + equality join-back, then the winning row re-joined to
    its dimensions. Ties break to the lowest suppkey (exact integer argmin
    — unit cost is cents ``div`` quantity, truncating in both engines).

    Plan shape: two partial-aggregate passes over the supplier-part pairs
    (pair count << lineitem count), one equi-join between them on
    (partkey, unit_cents), then broadcast supplier/nation. At 100 TB the
    pair table is |parts|x|suppliers-per-part|-sized — bounded by the
    catalog, not the fact table; nothing fact-sized ever re-shuffles."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.expr(
            "CAST(round(l_extendedprice*100) AS BIGINT) div CAST(l_quantity AS BIGINT)"
        ).alias("unit_cents"),
    )
    su = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("unit_cents").alias("unit_cents")
    )
    best = (
        su.groupBy("l_partkey")
        .agg(
            F.min("unit_cents").alias("min_unit_cents"),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
        .filter(F.col("n_suppliers") >= 2)
    )
    pick = (
        su.join(best, ["l_partkey"])
        .filter(F.col("unit_cents") == F.col("min_unit_cents"))
        .groupBy("l_partkey", "min_unit_cents", "n_suppliers")
        .agg(F.min("l_suppkey").alias("best_suppkey"))
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        pick.join(F.broadcast(s), pick["best_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "min_unit_cents",
            F.col("n_suppliers").cast("long").alias("n_suppliers"),
            "best_suppkey",
            F.col("n_name").alias("supp_nation"),
        )
    )


# ---------------------------------------------------------------------------
# market_share_by_year — TPC-H Q8's two-level share-of-total shape
# ---------------------------------------------------------------------------


@query(
    "market_share_by_year",
    oracle=f"""
    SELECT r.r_name AS region, CAST(year(o.o_orderdate) AS INT) AS order_year,
           round(CAST(sum(CASE WHEN sn.n_regionkey = cn.n_regionkey
                               THEN {_SQL_REV_UNITS} ELSE 0 END) AS DOUBLE)
                 / CAST(sum({_SQL_REV_UNITS}) AS DOUBLE), 6) AS intra_share,
           CAST((sum({_SQL_REV_UNITS}) + 50) // 100 AS BIGINT) / 100.0
               AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = cn.n_regionkey
    GROUP BY r.r_name, year(o.o_orderdate)
    """,
)
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-region market share per (customer region, year) — TPC-H Q8's
    shape: a conditional share-of-total where the numerator is a CASE'd
    subset of the same aggregate, computed in ONE pass (never two scans or
    a self-join). Both sums are exact BIGINT revenue units, so the share
    ratio divides two identical integers — no float-order noise.

    Plan shape: same five-table snowflake as trade_flow_matrix (one
    fact-fact shuffle, all dims broadcast), then a single groupBy with two
    conditional sums. Scale: 35 output rows (5 regions x 7 years)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", _rev_units().alias("units")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").cast("int").alias("order_year")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    cn = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    sn = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_regionkey").alias("s_rk")
    )
    intra = F.sum(
        F.when(F.col("s_rk") == F.col("c_rk"), F.col("units")).otherwise(F.lit(0))
    )
    total = F.sum("units")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(cn), c["c_nationkey"] == F.col("c_nk"))
        .join(F.broadcast(sn), s["s_nationkey"] == F.col("s_nk"))
        .join(F.broadcast(r), F.col("c_rk") == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), "order_year")
        .agg(
            F.round(
                intra.cast("double") / total.cast("double"), 6
            ).alias("intra_share"),
            total.alias("_u"),
        )
        .withColumn("revenue", F.expr("CAST((_u + 50) div 100 AS DOUBLE) / 100.0"))
        .drop("_u")
    )


# ---------------------------------------------------------------------------
# profit_by_nation_year — TPC-H Q9's multi-dim profit rollup shape
# ---------------------------------------------------------------------------


@query(
    "profit_by_nation_year",
    oracle=f"""
    SELECT n.n_name AS supp_nation,
           CAST(year(l.l_shipdate) AS INT) AS ship_year,
           CAST(sum({_SQL_REV_UNITS}
                    - CAST(l.l_quantity AS BIGINT)
                      * CAST(round(p.p_retailprice*100) AS BIGINT) * 60
               ) AS BIGINT) AS profit_units,
           CASE WHEN sum({_SQL_REV_UNITS}
                         - CAST(l.l_quantity AS BIGINT)
                           * CAST(round(p.p_retailprice*100) AS BIGINT) * 60
                        ) >= 0
                THEN CAST((sum({_SQL_REV_UNITS}
                         - CAST(l.l_quantity AS BIGINT)
                           * CAST(round(p.p_retailprice*100) AS BIGINT) * 60
                        ) + 50) // 100 AS BIGINT) / 100.0
                ELSE -(CAST((-sum({_SQL_REV_UNITS}
                         - CAST(l.l_quantity AS BIGINT)
                           * CAST(round(p.p_retailprice*100) AS BIGINT) * 60
                        ) + 50) // 100 AS BIGINT) / 100.0)
                END AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name, year(l.l_shipdate)
    """,
)
def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product profit by supplier nation and ship year (TPC-H Q9's shape):
    revenue minus supply cost where cost joins in from the part dimension
    (60% of retail, the classic ps_supplycost stand-in since the catalog
    has no partsupp). Profit is exact BIGINT units: revenue cent-percents
    minus quantity x retail-cents x 60 — both engines sum identical
    integers.

    Plan shape: lineitem scans once; part and supplier/nation broadcast
    (both catalog-sized); one groupBy on (nation, year) — 175 output rows.
    At 100 TB the only shuffle is the final 25x7-group aggregate's
    map-side-combined exchange."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        F.year("l_shipdate").cast("int").alias("ship_year"),
        _rev_units().alias("units"),
    )
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("retail_cents")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = F.sum(
        F.col("units")
        - F.col("l_quantity").cast("long") * F.col("retail_cents") * F.lit(60)
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("supp_nation"), "ship_year")
        .agg(profit.cast("long").alias("profit_units"))
        .withColumn(
            "profit",
            F.expr(
                "CASE WHEN profit_units >= 0"
                " THEN CAST((profit_units + 50) div 100 AS DOUBLE) / 100.0"
                " ELSE -(CAST((-profit_units + 50) div 100 AS DOUBLE) / 100.0)"
                " END"
            ),
        )
    )


# ---------------------------------------------------------------------------
# quantity_concentration_parts — TPC-H Q11's group-vs-global-scalar shape
# ---------------------------------------------------------------------------


@query(
    "quantity_concentration_parts",
    oracle="""
    WITH per_part AS MATERIALIZED (
        SELECT l_partkey, CAST(sum(l_quantity) AS BIGINT) AS part_qty
        FROM lineitem GROUP BY l_partkey
    ),
    tot AS (
        SELECT CAST(sum(part_qty) AS BIGINT) AS total_qty,
               CAST(count(*) AS BIGINT) AS n_parts
        FROM per_part
    )
    SELECT p.l_partkey AS p_partkey, p.part_qty,
           round(CAST(p.part_qty AS DOUBLE) / CAST(t.total_qty AS DOUBLE), 8)
             AS qty_share
    FROM per_part p, tot t
    WHERE p.part_qty * t.n_parts * 10 > 13 * t.total_qty
    """,
)
def quantity_concentration_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inventory concentration (TPC-H Q11's shape): parts whose shipped
    quantity exceeds 1.3x the MEAN part's share — a per-group aggregate
    filtered against a global scalar aggregate. The threshold is the
    integer cross-multiplication ``part_qty*n_parts*10 > 13*total_qty``
    (never ``share > 1.3/n`` — a float boundary that engines could land on
    different sides of). Relative-to-mean keeps the qualifying fraction
    stable as the catalog grows with scale.

    Plan shape: one partial-agg pass builds per-part sums, materialized
    behind a persist barrier (parts-sized, catalog not fact cardinality);
    the global (total, count) is a 1-row aggregate of THAT result — never a
    second fact scan — broadcast back via cross-join. Without the barrier
    Spark recomputes the agg subtree for both consumers and scans the fact
    twice (caught by check_plans). At 100 TB: fact scanned once."""
    from datapipeline_ops_spark.operators.dedup import persist_barrier

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", F.col("l_quantity").cast("long").alias("qty")
    )
    per_part = persist_barrier(
        li.groupBy("l_partkey").agg(F.sum("qty").alias("part_qty")),
        f"qconc_per_part:{sf_dir}",
    )
    tot = per_part.agg(
        F.sum("part_qty").alias("total_qty"),
        F.count(F.lit(1)).cast("long").alias("n_parts"),
    )
    return (
        per_part.join(F.broadcast(tot))
        .filter(
            F.col("part_qty") * F.col("n_parts") * F.lit(10)
            > F.lit(13) * F.col("total_qty")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "part_qty",
            F.round(
                F.col("part_qty").cast("double") / F.col("total_qty").cast("double"),
                8,
            ).alias("qty_share"),
        )
    )


# ---------------------------------------------------------------------------
# top_revenue_suppliers — TPC-H Q15's max-of-aggregate shape
# ---------------------------------------------------------------------------


@query(
    "top_revenue_suppliers",
    oracle=f"""
    WITH rev AS MATERIALIZED (
        SELECT l_suppkey, CAST(sum({_SQL_REV_UNITS}) AS BIGINT) AS rev_units
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.rev_units,
           CAST((r.rev_units + 50) // 100 AS BIGINT) / 100.0 AS total_revenue
    FROM rev r
    JOIN (SELECT max(rev_units) AS mx FROM rev) m ON r.rev_units = m.mx
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    """,
)
def top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier(s) by quarterly revenue (TPC-H Q15's shape): an
    aggregate compared against the MAX of the same aggregate — the
    'view + scalar subquery on the view' pattern, decorrelated as
    aggregate-once + 1-row max + equality join back. Revenue is exact
    BIGINT units so the max-equality cannot split on float noise; ties
    all surface (Q15 semantics).

    Plan shape: the Q1-1996 predicate pushes to the parquet scan
    (PushedFilters on l_shipdate); one partial agg per supplier; the max
    is a 1-row broadcast. At 100 TB the date filter prunes ~96% of the
    fact before any shuffle."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .select("l_suppkey", _rev_units().alias("units"))
    )
    rev = li.groupBy("l_suppkey").agg(F.sum("units").alias("rev_units"))
    mx = rev.agg(F.max("rev_units").alias("mx"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev["rev_units"] == F.col("mx"))
        .join(F.broadcast(s), rev["l_suppkey"] == s["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            "rev_units",
            F.expr("CAST((rev_units + 50) div 100 AS DOUBLE) / 100.0").alias(
                "total_revenue"
            ),
        )
    )


# ---------------------------------------------------------------------------
# brand_bucket_supplier_counts — TPC-H Q16's anti-join + count-distinct shape
# ---------------------------------------------------------------------------


@query(
    "brand_bucket_supplier_counts",
    oracle="""
    SELECT p.p_brand, CAST((p.p_size - 1) // 10 AS INT) AS size_bucket,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_type <> 'PROMO' AND p.p_brand <> 'Brand#13'
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, (p.p_size - 1) // 10
    """,
)
def brand_bucket_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier variety per brand/size bucket (TPC-H Q16's shape):
    COUNT(DISTINCT supplier) per part attribute group, with a NOT IN
    blocklist (suppliers in arrears) that must plan as an anti-join, plus
    negated dimension predicates. All-integer output.

    Plan shape: the blocklist subquery is catalog-sized -> broadcast
    left-anti join on the fact BEFORE the distinct agg (pruning early);
    part broadcasts; the count-distinct shuffles (brand, bucket, suppkey)
    partials. At 100 TB: one fact scan, one distinct-ready shuffle."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_type") != "PROMO") & (F.col("p_brand") != "Brand#13"))
        .select(
            "p_partkey",
            "p_brand",
            F.expr("CAST((p_size - 1) div 10 AS INT)").alias("size_bucket"),
        )
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), li["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "size_bucket")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# large_order_customers_detail — TPC-H Q18's HAVING join-back shape
# ---------------------------------------------------------------------------


@query(
    "large_order_customers_detail",
    oracle="""
    WITH big AS MATERIALIZED (
        SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(l_quantity) > 150
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(year(o.o_orderdate) AS INT) AS order_year,
           o.o_totalprice, b.total_qty
    FROM big b
    JOIN orders o   ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def large_order_customers_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders with customer detail (TPC-H Q18's shape): the
    'orders IN (group-HAVING subquery)' pattern — aggregate the fact,
    filter on the aggregate, then join BACK to the detail tables. The
    threshold is an integer quantity sum (exact both engines).

    Plan shape: one partial-agg pass over (orderkey, qty) — map-side
    combine does most of the work since lines of an order colocate in
    scan order; the surviving ~3% of orders equi-join orders then
    customer. At 100 TB the join-back is keys-first: only qualifying
    orderkeys reach the wide tables."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_quantity").cast("long").alias("qty")
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("qty").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        "o_totalprice",
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_custkey", "c_name", "o_orderkey", "order_year",
            "o_totalprice", "total_qty",
        )
    )


# ---------------------------------------------------------------------------
# disjunctive_predicate_revenue — TPC-H Q19's OR-of-conjunctions shape
# ---------------------------------------------------------------------------


@query(
    "disjunctive_predicate_revenue",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_lineitems,
           CAST((sum({_SQL_REV_UNITS}) + 50) // 100 AS BIGINT) / 100.0
               AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo-band revenue (TPC-H Q19's shape): a disjunction of conjunctive
    band predicates spanning BOTH join sides — the planner must still
    derive the common implied predicates and keep the join an equi-join
    with the OR evaluated post-join (a naive engine degrades to a
    cartesian with a residual filter).

    Plan shape: part's brand/size predicates can't fully push (they're
    per-disjunct) but partkey pruning and the equi-join survive; part
    broadcasts. Single aggregate output row."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", _rev_units().alias("units")
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & (q >= 1) & (q <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & (q >= 10) & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 15)
            & (q >= 20) & (q <= 30)
        )
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(cond)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
            F.sum("units").alias("_u"),
        )
        .withColumn("revenue", F.expr("CAST((_u + 50) div 100 AS DOUBLE) / 100.0"))
        .drop("_u")
    )


# ---------------------------------------------------------------------------
# promo_part_recent_suppliers — TPC-H Q20's nested semi-join chain shape
# ---------------------------------------------------------------------------


@query(
    "promo_part_recent_suppliers",
    oracle="""
    WITH sp AS MATERIALIZED (
        SELECT l.l_suppkey, l.l_partkey,
               CAST(sum(CASE WHEN year(l.l_shipdate) = 2000
                             THEN l.l_quantity ELSE 0 END) AS BIGINT) AS q2000,
               CAST(sum(l.l_quantity) AS BIGINT) AS q_all
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE 'small%'
        GROUP BY l.l_suppkey, l.l_partkey
    )
    SELECT s.s_suppkey, s.s_name, n.n_name AS supp_nation
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (
        SELECT l_suppkey FROM sp WHERE q2000 > 0 AND 3 * q2000 > q_all
    )
    """,
)
def promo_part_recent_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers recently concentrated on promo parts (TPC-H Q20's shape):
    a nested semi-join chain — parts filtered by name prefix, a per
    (supplier, part) aggregate threshold ('more than a third of lifetime
    volume shipped in 2000', integer cross-multiplied), then supplier
    semi-joined against the qualifying keys. Never materializes a
    supplier x part cross product.

    Plan shape: name-prefix predicate pushes into the part scan; part
    broadcasts onto the fact; one (suppkey, partkey) partial agg; the
    qualifying-supplier key set is catalog-sized and drives a broadcast
    LEFT SEMI join. At 100 TB every stage is bounded by the catalog after
    the one fact scan."""
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.col("l_quantity").cast("long").alias("qty"),
        F.year("l_shipdate").alias("ship_year"),
    )
    sp = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(F.col("ship_year") == 2000, F.col("qty")).otherwise(0)).alias(
                "q2000"
            ),
            F.sum("qty").alias("q_all"),
        )
        .filter((F.col("q2000") > 0) & (F.lit(3) * F.col("q2000") > F.col("q_all")))
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        s.join(F.broadcast(sp), s["s_suppkey"] == sp["l_suppkey"], "left_semi")
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select("s_suppkey", "s_name", F.col("n_name").alias("supp_nation"))
    )


# ---------------------------------------------------------------------------
# sole_late_supplier_report — TPC-H Q21's EXISTS + NOT EXISTS shape
# ---------------------------------------------------------------------------


@query(
    "sole_late_supplier_report",
    oracle="""
    WITH ol AS MATERIALIZED (
        SELECT l.l_orderkey, l.l_suppkey,
               max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                        THEN 1 ELSE 0 END) AS is_late
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY l.l_orderkey, l.l_suppkey
    ),
    stats AS MATERIALIZED (
        SELECT l_orderkey,
               count(*) AS n_suppliers,
               CAST(sum(is_late) AS BIGINT) AS n_late_suppliers
        FROM ol GROUP BY l_orderkey
    )
    SELECT ol.l_suppkey AS s_suppkey, s.s_name,
           CAST(count(*) AS BIGINT) AS numwait
    FROM ol
    JOIN stats st ON st.l_orderkey = ol.l_orderkey
    JOIN supplier s ON s.s_suppkey = ol.l_suppkey
    WHERE ol.is_late = 1
      AND st.n_suppliers >= 2
      AND st.n_late_suppliers = 1
    GROUP BY ol.l_suppkey, s.s_name
    HAVING count(*) >= 2
    """,
)
def sole_late_supplier_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who alone delayed multi-supplier orders (TPC-H Q21's
    shape): the double-correlated EXISTS (another supplier on the order) +
    NOT EXISTS (no OTHER late supplier) pattern. Decorrelated the scalable
    way: ONE aggregate over (order, supplier, late-flag) yields per-order
    supplier/late counts, and 'exists other + not exists other late'
    becomes ``n_suppliers >= 2 AND n_late_suppliers = 1`` on the flagged
    supplier — the fact table is never self-joined row-to-row.

    Late = shipped more than 60 days after order date (calendar interval,
    identical on naive timestamps in both engines).

    Plan shape: one fact-fact shuffle (lineitem x orders on orderkey,
    status filter pushed), one (order, supplier) agg, then the per-order
    supplier/late counts come from a WINDOW over that aggregate (partition
    by orderkey) — the Spark plan reads the fact ONCE; a naive
    agg-then-self-join would recompute the whole subtree for both
    consumers and scan the fact twice (caught by check_plans). At 100 TB
    the window runs over order-cardinality groups of <= a few suppliers."""
    from pyspark.sql import Window

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    ol = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("is_late")
        )
    )
    w = Window.partitionBy("l_orderkey")
    flagged = ol.select(
        "l_orderkey",
        "l_suppkey",
        "is_late",
        F.count(F.lit(1)).over(w).alias("n_suppliers"),
        F.sum("is_late").over(w).cast("long").alias("n_late_suppliers"),
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        flagged.filter(
            (F.col("is_late") == 1)
            & (F.col("n_suppliers") >= 2)
            & (F.col("n_late_suppliers") == 1)
        )
        .join(F.broadcast(s), flagged["l_suppkey"] == s["s_suppkey"])
        .groupBy(F.col("l_suppkey").alias("s_suppkey"), "s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .filter(F.col("numwait") >= 2)
    )


# ---------------------------------------------------------------------------
# join_cardinality_audit — histogram-predicted vs actual join output size
# ---------------------------------------------------------------------------


@query(
    "join_cardinality_audit",
    oracle="""
    WITH lh AS MATERIALIZED (
        SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS f1
        FROM lineitem GROUP BY l_orderkey
    ),
    oh AS MATERIALIZED (
        SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS f2
        FROM orders GROUP BY o_orderkey
    ),
    pred AS (
        SELECT CAST(sum(lh.f1 * oh.f2) AS BIGINT) AS predicted_rows,
               CAST(count(*) AS BIGINT) AS n_shared_keys,
               CAST(max(lh.f1 * oh.f2) AS BIGINT) AS max_key_contrib
        FROM lh JOIN oh ON oh.k = lh.k
    ),
    act AS (
        SELECT CAST(count(*) AS BIGINT) AS actual_rows
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT p.predicted_rows, a.actual_rows, p.n_shared_keys,
           p.max_key_contrib,
           p.predicted_rows = a.actual_rows AS estimate_exact
    FROM pred p, act a
    """,
)
def join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation audit — the optimizer-statistics
    diagnostic: per-key frequency histograms on both join sides predict
    the equi-join output as ``sum_k f1(k)*f2(k)`` (exact when histograms
    are exact, the upper-bound sketch when they are truncated), checked
    against the ACTUAL join count. ``max_key_contrib`` is the skew
    headline: the single key that would dominate a shuffle partition —
    the number join_skew_diagnosis turns into a salt factor.

    All-integer; the equality verdict is exact by construction here and
    documents the contract a sampled-histogram estimator would be audited
    against at scale.

    Scale: two per-key aggregates (order-cardinality) + one agg-sized
    equi-join for the prediction; the actual-count leg is the plain join
    the audit prices."""
    lh = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("f1"))
    )
    oh = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("f2"))
    )
    pred = lh.join(oh, "k").agg(
        F.sum(F.col("f1") * F.col("f2")).cast("long").alias("predicted_rows"),
        F.count(F.lit(1)).cast("long").alias("n_shared_keys"),
        F.max(F.col("f1") * F.col("f2")).cast("long").alias("max_key_contrib"),
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    act = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .agg(F.count(F.lit(1)).cast("long").alias("actual_rows"))
    )
    return (
        pred.join(F.broadcast(act))
        .select(
            "predicted_rows",
            "actual_rows",
            "n_shared_keys",
            "max_key_contrib",
            (F.col("predicted_rows") == F.col("actual_rows")).alias(
                "estimate_exact"
            ),
        )
    )


# ---------------------------------------------------------------------------
# filter_selectivity_audit — independence-assumption estimation error
# ---------------------------------------------------------------------------


@query(
    "filter_selectivity_audit",
    oracle="""
    WITH s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n1,
               CAST(sum(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n2,
               CAST(sum(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n3,
               CAST(sum(CASE WHEN l_returnflag = 'R' AND l_quantity >= 25
                              AND l_discount >= 0.05 THEN 1 ELSE 0 END)
                    AS BIGINT) AS actual_rows
        FROM lineitem
    )
    SELECT n, n1, n2, n3, actual_rows,
           round(CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE)
                 * (CAST(n2 AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(n3 AS DOUBLE) / CAST(n AS DOUBLE))
                 * CAST(n AS DOUBLE), 2) AS predicted_rows,
           CASE WHEN actual_rows > 0
                THEN round(CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE)
                           * (CAST(n2 AS DOUBLE) / CAST(n AS DOUBLE))
                           * (CAST(n3 AS DOUBLE) / CAST(n AS DOUBLE))
                           * CAST(n AS DOUBLE)
                           / CAST(actual_rows AS DOUBLE), 4)
                ELSE NULL END AS independence_ratio
    FROM s
    """,
)
def filter_selectivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selectivity-estimation audit under the independence assumption — the
    other half of the optimizer-statistics diagnostic pair with
    join_cardinality_audit: per-predicate selectivities multiply into a
    predicted conjunctive row count (exactly what a cost model without
    multi-column statistics does), checked against the actual conjunction.
    ``independence_ratio`` far from 1 flags correlated predicates — the
    classic source of catastrophic plan choices.

    ONE scan computes all four counts as conditional sums (never four
    passes); integer counts, two identical float expressions.

    Scale: single partial-agg'd pass, 1-row output."""
    li = load_table(spark, sf_dir, "lineitem")
    p1 = F.col("l_returnflag") == "R"
    p2 = F.col("l_quantity") >= 25
    p3 = F.col("l_discount") >= 0.05
    s = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(p1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(p2, 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(p3, 1).otherwise(0)).cast("long").alias("n3"),
        F.sum(F.when(p1 & p2 & p3, 1).otherwise(0)).cast("long").alias("actual_rows"),
    )
    nd = F.col("n").cast("double")
    pred = (
        F.col("n1").cast("double") / nd
        * (F.col("n2").cast("double") / nd)
        * (F.col("n3").cast("double") / nd)
        * nd
    )
    return s.select(
        "n",
        "n1",
        "n2",
        "n3",
        "actual_rows",
        F.round(pred, 2).alias("predicted_rows"),
        F.when(
            F.col("actual_rows") > 0,
            F.round(pred / F.col("actual_rows").cast("double"), 4),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("independence_ratio"),
    )
