"""Survival/econometrics wave: Kaplan-Meier conversion survival (with
censoring), the Mann-Kendall trend test, Herfindahl-Hirschman market
concentration, and a cohort-LTV matrix.

Exactness notes:
- KM survival multiplies per-step factors as ``exp(cumsum(ln(factor)))``
  over the ORDERED duration spine — running window aggregates accumulate
  in frame order in both engines, and ln/exp on identical doubles is the
  precedented cross-engine seam (bigram_lm_perplexity ships raw ln-derived
  perplexities). Zero factors short-circuit to survival 0 via a windowed
  min, never ln(0).
- Mann-Kendall's S and the tie-corrected variance numerator are exact
  integers (the pair join runs over the bounded day spine — constant size
  at any fact scale); z is one identical float expression.
- HHI and LTV assemble from integer unit/cent sums.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.tables import load_table


# ---------------------------------------------------------------------------
# kaplan_meier_conversion — survival curve of view -> purchase with censoring
# ---------------------------------------------------------------------------


@query(
    "kaplan_meier_conversion",
    oracle="""
    WITH days AS (
        SELECT user_id, event_type,
               CAST(ts AS DATE) - DATE '1970-01-01' AS day
        FROM events WHERE event_type IN ('view', 'purchase')
    ),
    starts AS (
        SELECT user_id, min(day) AS start_day FROM days
        WHERE event_type = 'view' GROUP BY user_id
    ),
    convs AS (
        SELECT d.user_id, min(d.day) AS conv_day
        FROM days d JOIN starts s ON s.user_id = d.user_id
        WHERE d.event_type = 'purchase' AND d.day >= s.start_day
        GROUP BY d.user_id
    ),
    horizon AS (SELECT max(day) AS end_day FROM days),
    subj AS MATERIALIZED (
        SELECT s.user_id,
               CASE WHEN c.conv_day IS NOT NULL
                    THEN c.conv_day - s.start_day
                    ELSE h.end_day - s.start_day END AS duration,
               CASE WHEN c.conv_day IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM starts s LEFT JOIN convs c ON c.user_id = s.user_id
        CROSS JOIN horizon h
    ),
    spine AS MATERIALIZED (
        SELECT duration AS t,
               CAST(sum(ev) AS BIGINT) AS d_t,
               CAST(sum(1 - ev) AS BIGINT) AS c_t,
               CAST(count(*) AS BIGINT) AS n_t
        FROM subj GROUP BY duration
    ),
    km AS (
        SELECT t, d_t, c_t,
               (SELECT CAST(count(*) AS BIGINT) FROM subj) -
               CAST(coalesce(sum(n_t) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                             PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS at_risk
        FROM spine
    )
    SELECT t, at_risk, d_t AS n_events, c_t AS n_censored,
           CASE WHEN min(CAST(at_risk - d_t AS DOUBLE)
                         / CAST(at_risk AS DOUBLE))
                     OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) = 0.0
                THEN 0.0
                ELSE exp(sum(ln(CASE WHEN at_risk - d_t > 0
                                THEN CAST(at_risk - d_t AS DOUBLE)
                                     / CAST(at_risk AS DOUBLE)
                                ELSE 1.0 END))
                         OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW))
           END AS survival
    FROM km
    """,
)
def kaplan_meier_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of view -> purchase conversion: each
    user enters at their first view; converting users contribute an event
    at ``conv_day - start_day``; non-converters are RIGHT-CENSORED at the
    observation horizon — the estimator that handles 'hasn't converted
    YET' correctly, which a naive conversion-rate query cannot
    (Kaplan & Meier 1958). ``S(t) = prod_{u<=t} (1 - d_u/n_u)`` with the
    at-risk set shrinking by both events and censorings.

    Determinism: the product is exp(cumsum(ln(factor))) over the ordered
    duration spine — running-frame window aggregation is order-defined in
    both engines; an exhausted risk set short-circuits to 0 via a windowed
    min before any ln(0).

    Scale: per-user start/conversion are two partial aggs over the fact;
    everything after lives on the <= 30-row duration spine (bounded by the
    event calendar), where unpartitioned windows are safe."""
    days = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .select(
            "user_id",
            "event_type",
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ).cast("long").alias("day"),
        )
    )
    starts = (
        days.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("day").alias("start_day"))
    )
    convs = (
        days.filter(F.col("event_type") == "purchase")
        .join(starts, "user_id")
        .filter(F.col("day") >= F.col("start_day"))
        .groupBy("user_id")
        .agg(F.min("day").alias("conv_day"))
    )
    horizon = days.agg(F.max("day").alias("end_day"))
    subj = (
        starts.join(convs, "user_id", "left")
        .join(F.broadcast(horizon))
        .select(
            F.when(
                F.col("conv_day").isNotNull(),
                F.col("conv_day") - F.col("start_day"),
            )
            .otherwise(F.col("end_day") - F.col("start_day"))
            .alias("duration"),
            F.when(F.col("conv_day").isNotNull(), 1).otherwise(0).alias("ev"),
        )
    )
    from datapipeline_ops_spark.operators.dedup import persist_barrier

    subj = persist_barrier(subj, f"km_subj:{sf_dir}")
    spine = subj.groupBy(F.col("duration").alias("t")).agg(
        F.sum("ev").cast("long").alias("d_t"),
        F.sum(1 - F.col("ev")).cast("long").alias("c_t"),
        F.count(F.lit(1)).cast("long").alias("n_t"),
    )
    total = subj.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    km = spine.join(F.broadcast(total)).select(
        "t",
        "d_t",
        "c_t",
        (
            F.col("n_total")
            - F.coalesce(F.sum("n_t").over(w_prev), F.lit(0)).cast("long")
        ).alias("at_risk"),
    )
    factor = (F.col("at_risk") - F.col("d_t")).cast("double") / F.col(
        "at_risk"
    ).cast("double")
    w_run = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    return km.select(
        "t",
        "at_risk",
        F.col("d_t").alias("n_events"),
        F.col("c_t").alias("n_censored"),
        F.when(F.min(factor).over(w_run) == 0.0, F.lit(0.0))
        .otherwise(
            F.exp(
                F.sum(
                    F.log(F.when(factor > 0, factor).otherwise(F.lit(1.0)))
                ).over(w_run)
            )
        )
        .alias("survival"),
    )


# ---------------------------------------------------------------------------
# mann_kendall_trend — nonparametric monotone-trend test on daily revenue
# ---------------------------------------------------------------------------

_MK_UNIT = 100_000  # daily cents -> $1000 units (the ACF coarsening)


@query(
    "mann_kendall_trend",
    oracle=f"""
    WITH d AS MATERIALIZED (
        SELECT CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS day,
               CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
                 // {_MK_UNIT} AS x
        FROM orders GROUP BY 1
    ),
    s AS (
        SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1
                             WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT)
                   AS s_stat
        FROM d a JOIN d b ON b.day > a.day
    ),
    ties AS (
        SELECT CAST(coalesce(sum(c*(c-1)*(2*c+5)), 0) AS BIGINT) AS tie_term
        FROM (SELECT CAST(count(*) AS BIGINT) AS c FROM d GROUP BY x)
        WHERE c > 1
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM d)
    SELECT n.n_days, s.s_stat,
           CAST(n.n_days*(n.n_days-1)*(2*n.n_days+5) - t.tie_term AS BIGINT)
               AS var18_num,
           CASE WHEN n.n_days < 3 OR
                     n.n_days*(n.n_days-1)*(2*n.n_days+5) - t.tie_term <= 0
                THEN NULL
                WHEN s.s_stat > 0 THEN round(
                  (CAST(s.s_stat AS DOUBLE) - 1.0)
                  / sqrt(CAST(n.n_days*(n.n_days-1)*(2*n.n_days+5)
                              - t.tie_term AS DOUBLE) / 18.0), 6)
                WHEN s.s_stat < 0 THEN round(
                  (CAST(s.s_stat AS DOUBLE) + 1.0)
                  / sqrt(CAST(n.n_days*(n.n_days-1)*(2*n.n_days+5)
                              - t.tie_term AS DOUBLE) / 18.0), 6)
                ELSE 0.0 END AS z_score
    FROM s, ties t, n
    """,
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test on the daily revenue series:
    ``S = sum sign(x_j - x_i)`` over all day pairs i<j, tie-corrected
    variance ``(n(n-1)(2n+5) - sum t(t-1)(2t+5))/18``, continuity-corrected
    z — the nonparametric companion to the Theil-Sen slope already in the
    registry (same series, significance instead of magnitude).

    S and the variance numerator are exact integers (values coarsened to
    $1000 units like the ACF query); z is one identical float expression,
    NULL-guarded for degenerate spines.

    Scale: the pair join is day-spine x day-spine — ~2400 rows squared
    regardless of fact size (bounded by the FIXED calendar, the same
    contract as the Hilbert/seasonal spines); the fact contributes one
    partial-agg pass."""
    d = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
            ).cast("long").alias("day")
        )
        .agg(
            F.expr(
                f"CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)"
                f" div {_MK_UNIT}"
            ).alias("x")
        )
    )
    from datapipeline_ops_spark.operators.dedup import persist_barrier

    d = persist_barrier(d, f"mk_daily:{sf_dir}")
    a = d.select(F.col("day").alias("da"), F.col("x").alias("xa"))
    b = d.select(F.col("day").alias("db"), F.col("x").alias("xb"))
    s = (
        a.join(b, F.col("db") > F.col("da"))
        .agg(
            F.sum(
                F.when(F.col("xb") > F.col("xa"), 1)
                .when(F.col("xb") < F.col("xa"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    ties = (
        d.groupBy("x")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .filter(F.col("c") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("c") * (F.col("c") - 1) * (2 * F.col("c") + 5)),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    n = d.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    var_num = (
        F.col("n_days") * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
        - F.col("tie_term")
    ).cast("long")
    sd = F.sqrt(var_num.cast("double") / 18.0)
    z = (
        F.when((F.col("n_days") < 3) | (var_num <= 0), F.lit(None).cast("double"))
        .when(F.col("s_stat") > 0, F.round((F.col("s_stat").cast("double") - 1.0) / sd, 6))
        .when(F.col("s_stat") < 0, F.round((F.col("s_stat").cast("double") + 1.0) / sd, 6))
        .otherwise(F.lit(0.0))
    )
    return (
        s.join(F.broadcast(ties))
        .join(F.broadcast(n))
        .select("n_days", "s_stat", var_num.alias("var18_num"), z.alias("z_score"))
    )


# ---------------------------------------------------------------------------
# herfindahl_concentration — HHI of supplier-nation revenue per region
# ---------------------------------------------------------------------------

_HHI_UNIT = 100_000


@query(
    "herfindahl_concentration",
    oracle=f"""
    WITH nrev AS MATERIALIZED (
        SELECT r.r_name AS region, n.n_name AS nation,
               CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(round(l.l_discount*100) AS BIGINT)))
                    AS BIGINT) // {_HHI_UNIT} AS q
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        GROUP BY r.r_name, n.n_name
    )
    SELECT region,
           CAST(count(*) AS BIGINT) AS n_nations,
           round(CAST(sum(q*q) AS DOUBLE)
                 / (CAST(sum(q) AS DOUBLE) * CAST(sum(q) AS DOUBLE)), 6)
               AS hhi,
           round(1.0 / CAST(count(*) AS DOUBLE), 6) AS hhi_floor
    FROM nrev
    WHERE q > 0
    GROUP BY region
    """,
)
def herfindahl_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of supplier revenue within each
    region: ``HHI = sum(share_i^2) = sum(q_i^2) / (sum q_i)^2`` — 1/n for
    perfectly even competition (emitted as hhi_floor), 1.0 for monopoly.
    The share-squared trick keeps everything integer until ONE final
    division: never compute float shares then sum them (25-term float sums
    order-differ across engines).

    Scale: one fact scan with broadcast dims, a |nations|-row aggregate,
    5 output rows."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        (
            F.round(F.col("l_extendedprice") * 100, 0).cast("long")
            * (F.lit(100) - F.round(F.col("l_discount") * 100, 0).cast("long"))
        ).alias("units"),
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    nrev = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.expr(f"CAST(sum(units) AS BIGINT) div {_HHI_UNIT}").alias("q"))
    )
    return (
        nrev.filter(F.col("q") > 0)
        .groupBy("region")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nations"),
            F.round(
                F.sum(F.col("q") * F.col("q")).cast("double")
                / (F.sum("q").cast("double") * F.sum("q").cast("double")),
                6,
            ).alias("hhi"),
            F.round(F.lit(1.0) / F.count(F.lit(1)).cast("double"), 6).alias(
                "hhi_floor"
            ),
        )
    )


# ---------------------------------------------------------------------------
# cohort_ltv_matrix — cumulative average spend by cohort year and age
# ---------------------------------------------------------------------------


@query(
    "cohort_ltv_matrix",
    oracle="""
    WITH first_order AS MATERIALIZED (
        SELECT o_custkey, CAST(min(year(o_orderdate)) AS INT) AS cohort
        FROM orders GROUP BY o_custkey
    ),
    cohort_size AS MATERIALIZED (
        SELECT cohort, CAST(count(*) AS BIGINT) AS n_customers
        FROM first_order GROUP BY cohort
    ),
    spend AS (
        SELECT f.cohort,
               CAST(year(o.o_orderdate) AS INT) - f.cohort AS age,
               CAST(sum(CAST(round(o.o_totalprice*100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders o JOIN first_order f ON f.o_custkey = o.o_custkey
        GROUP BY f.cohort, CAST(year(o.o_orderdate) AS INT) - f.cohort
    )
    SELECT s.cohort, s.age, cs.n_customers,
           CAST((2 * sum(s.cents) OVER (PARTITION BY s.cohort ORDER BY s.age
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 + cs.n_customers) // (2 * cs.n_customers) AS BIGINT)
               / 100.0 AS cum_ltv
    FROM spend s JOIN cohort_size cs ON cs.cohort = s.cohort
    """,
)
def cohort_ltv_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: customers cohorted by first-order
    year; each (cohort, age) cell is the cohort's CUMULATIVE average spend
    through that age — the LTV curve marketing reads payback periods off,
    and the revenue companion to the registry's retention_cohorts (which
    counts activity, not value).

    Cent-exact integer sums; the cumulative window runs per cohort over
    the <= 7-row age spine. The per-customer average is rounded to whole
    CENTS in integer arithmetic — half-up via ``(2c + n) div (2n)`` — then
    divided by 100 once: ``round(double, 2)`` is NOT cross-engine-safe on
    .xx5 values (Spark rounds the shortest decimal representation, DuckDB
    the binary value; the fuzzer caught cum_ltv diverging on exactly such
    a cell).

    Scale: first-order cohorts are a per-customer aggregate; the fact
    joins the cohort map on custkey (shuffle equi-join) and collapses to
    the 7x7 matrix before any window."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    first_order = o.groupBy("o_custkey").agg(F.min("yr").alias("cohort"))
    from datapipeline_ops_spark.operators.dedup import persist_barrier

    first_order = persist_barrier(first_order, f"ltv_cohort:{sf_dir}")
    cohort_size = first_order.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )
    spend = (
        o.join(first_order, "o_custkey")
        .groupBy("cohort", (F.col("yr") - F.col("cohort")).alias("age"))
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    w = Window.partitionBy("cohort").orderBy("age").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        spend.join(F.broadcast(cohort_size), "cohort")
        .withColumn("cum_cents", F.sum("cents").over(w))
        .select(
            "cohort",
            "age",
            "n_customers",
            (
                F.expr("(2 * cum_cents + n_customers) div (2 * n_customers)")
                / 100.0
            ).alias("cum_ltv"),
        )
    )


# ---------------------------------------------------------------------------
# diff_in_diff_revenue — two-group pre/post causal contrast
# ---------------------------------------------------------------------------

_DID_CUTOVER = "1999-01-01"  # midpoint of the 1995-2001 order calendar


@query(
    "diff_in_diff_revenue",
    oracle=f"""
    WITH cells AS (
        SELECT CASE WHEN n.n_regionkey % 2 = 0 THEN 1 ELSE 0 END AS treated,
               CASE WHEN o.o_orderdate >= TIMESTAMP '{_DID_CUTOVER}'
                    THEN 1 ELSE 0 END AS post,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(round(o.o_totalprice*100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n   ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2
    ),
    m AS (
        SELECT treated, post, n_orders,
               CAST(cents AS DOUBLE) / CAST(n_orders AS DOUBLE) / 100.0
                   AS mean_order_value
        FROM cells
    )
    SELECT treated, post, n_orders, round(mean_order_value, 4)
               AS mean_order_value,
           round((SELECT (t1.mean_order_value - t0.mean_order_value)
                         - (c1.mean_order_value - c0.mean_order_value)
                  FROM m t1, m t0, m c1, m c0
                  WHERE t1.treated = 1 AND t1.post = 1
                    AND t0.treated = 1 AND t0.post = 0
                    AND c1.treated = 0 AND c1.post = 1
                    AND c0.treated = 0 AND c0.post = 0), 4) AS did_estimate
    FROM m
    """,
)
def diff_in_diff_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences contrast of mean order value: 'treated'
    customer nations (even region key — the policy-rollout seam) vs
    control, before/after the {_DID_CUTOVER} cutover;
    ``DiD = (T_post - T_pre) - (C_post - C_pre)`` — the workhorse causal
    estimator when randomization isn't available, here as the 2x2 cell
    table every DiD readout starts from, with the estimate repeated on
    each cell row.

    Cent-exact integer cell sums; cell means and the DiD contrast are
    identical float expressions over the four 1-row cells.

    Scale: one orders scan with broadcast customer-nation dims, a 4-row
    aggregate, O(1) arithmetic."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.when(
            F.col("o_orderdate") >= F.lit(_DID_CUTOVER).cast("timestamp"), 1
        ).otherwise(0).alias("post"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", (F.col("n_regionkey") % 2 == 0).cast("int").alias("treated")
    )
    cells = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("treated", "post")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("cents"),
        )
    )
    from datapipeline_ops_spark.operators.dedup import persist_barrier

    m = persist_barrier(
        cells.select(
            "treated",
            "post",
            "n_orders",
            (
                F.col("cents").cast("double")
                / F.col("n_orders").cast("double")
                / 100.0
            ).alias("mean_order_value"),
        ),
        f"did_cells:{sf_dir}",
    )

    def cell(t: int, p: int, name: str) -> DataFrame:
        return m.filter((F.col("treated") == t) & (F.col("post") == p)).select(
            F.col("mean_order_value").alias(name)
        )

    did = (
        cell(1, 1, "t1")
        .join(F.broadcast(cell(1, 0, "t0")))
        .join(F.broadcast(cell(0, 1, "c1")))
        .join(F.broadcast(cell(0, 0, "c0")))
        .select(
            F.round(
                (F.col("t1") - F.col("t0")) - (F.col("c1") - F.col("c0")), 4
            ).alias("did_estimate")
        )
    )
    # LEFT join on a constant-true condition: with any 2x2 cell missing the
    # contrast frame is EMPTY and an inner cross-join would drop all cell
    # rows, while the oracle's scalar subquery yields NULL — the left join
    # reproduces the NULL did_estimate instead.
    return m.join(F.broadcast(did), F.lit(True), "left").select(
        "treated",
        "post",
        "n_orders",
        F.round("mean_order_value", 4).alias("mean_order_value"),
        "did_estimate",
    )


# ---------------------------------------------------------------------------
# pareto_revenue_deciles — customer-concentration Lorenz table
# ---------------------------------------------------------------------------


@query(
    "pareto_revenue_deciles",
    oracle="""
    WITH per_cust AS MATERIALIZED (
        SELECT o_custkey,
               CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY o_custkey
    ),
    nt AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(cents) AS BIGINT) AS total FROM per_cust),
    cb AS (
        SELECT cents, CAST(sum(c) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED
                           PRECEDING AND CURRENT ROW) - c AS BIGINT) AS below
        FROM (SELECT cents, count(*) AS c FROM per_cust GROUP BY cents)
    ),
    dec AS (
        SELECT least(9, (10 * cb.below) // nt.n) AS decile,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(p.cents) AS BIGINT) AS dec_cents
        FROM per_cust p JOIN cb ON cb.cents = p.cents CROSS JOIN nt
        GROUP BY least(9, (10 * cb.below) // nt.n)
    )
    SELECT CAST(decile AS BIGINT) AS decile, n_customers,
           round(CAST(dec_cents AS DOUBLE) / 100.0, 2) AS revenue,
           round(CAST(sum(dec_cents) OVER (ORDER BY decile ROWS BETWEEN
                          UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / CAST((SELECT total FROM nt) AS DOUBLE), 6)
               AS cum_revenue_share
    FROM dec
    """,
)
def pareto_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer revenue-concentration Lorenz table: customers bucketed into
    spend deciles by the value-level CDF (``least(9, 10*|below|//n)`` —
    deterministic under ties, the RFM quartile rule at decile granularity),
    each decile's revenue and the cumulative Lorenz share. The '80/20'
    readout: 1 - cum_share at decile 7 is the top-20% concentration.

    Cent-exact integer sums; the only windows are the value-CDF (bucketed
    two-level prefix sum on the Spark side) and a 10-row decile cumsum.

    Scale: one orders scan -> per-customer agg; the CDF spine join is
    value-keyed; 10 output rows."""
    from datapipeline_ops_spark.functions.ranks import cum_before_spine
    from datapipeline_ops_spark.operators.dedup import persist_barrier

    per_cust = persist_barrier(
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("cents")
        ),
        f"pareto_per_cust:{sf_dir}",
    )
    nt = per_cust.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("total"),
    )
    by_val = per_cust.groupBy("cents").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    cb = cum_before_spine(by_val, "cents", "c", "below")
    dec = (
        per_cust.join(cb, "cents")
        .join(F.broadcast(nt))
        .groupBy(
            F.least(F.lit(9), F.expr("(10 * below) div n")).cast("long").alias(
                "decile"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("cents").cast("long").alias("dec_cents"),
        )
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return dec.join(F.broadcast(nt.select("total"))).select(
        "decile",
        "n_customers",
        F.round(F.col("dec_cents").cast("double") / 100.0, 2).alias("revenue"),
        F.round(
            F.sum("dec_cents").over(w).cast("double")
            / F.col("total").cast("double"),
            6,
        ).alias("cum_revenue_share"),
    )
