"""Experimentation statistics: the A/B-testing toolkit a data platform runs
next to the pipeline — rank tests (Mann-Whitney U), rank correlation
(Spearman), variance-reduced treatment effects (CUPED), probabilistic
forecast decomposition (Brier), paired-model comparison (McNemar), and
sequential monitoring (SPRT over daily rating periods).

No analog in the reference (a Ray media pipeline, SURVEY.md §2) — this
extends the engine's drift/eval family (`drift_quality.py`,
`mlops_extra.py`) toward experiment readouts.

Cross-engine exactness strategy: every test statistic is assembled from
INTEGER sufficient statistics (counts, cent-exact sums, 2x-midranks so tie
midpoints stay integral) and only converted to float in one final identical
expression; log-likelihood constants are Python literals pasted into both
engines (engine libm log could differ in the last ulp). Rank machinery uses
distinct-VALUE spines (bounded by the value domain, not the row count), so
the windows scale.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.functions.hashing import hash64, sql_hash64
from datapipeline_ops_spark.functions.ranks import rank_spine as _rank_spine
from datapipeline_ops_spark.tables import load_table



# ---------------------------------------------------------------------------
# mann_whitney_value_shift — rank-sum test with midranks, tie-corrected z
# ---------------------------------------------------------------------------


@query(
    "mann_whitney_value_shift",
    oracle="""
    WITH ev AS (
        SELECT CAST(round(value*100) AS BIGINT) AS cents,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1
        FROM events WHERE event_type IN ('purchase', 'view')
    ),
    by_val AS (
        SELECT cents,
               CAST(sum(g1) AS BIGINT) AS n1v,
               CAST(count(*) AS BIGINT) AS ntv
        FROM ev GROUP BY cents
    ),
    ranked AS (
        SELECT n1v, ntv,
               2 * (sum(ntv) OVER (ORDER BY cents
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) - ntv)
                 + ntv + 1 AS midrank2
        FROM by_val
    ),
    s AS (
        SELECT CAST(sum(n1v) AS BIGINT) AS n1,
               CAST(sum(ntv - n1v) AS BIGINT) AS n2,
               CAST(sum(n1v * midrank2) AS BIGINT) AS r1_x2,
               CAST(sum(ntv*ntv*ntv - ntv) AS BIGINT) AS tie_t
        FROM ranked
    )
    SELECT n1, n2,
           round((CAST(r1_x2 AS DOUBLE) - CAST(n1*(n1+1) AS DOUBLE)) / 2.0, 1)
             AS u1,
           CASE WHEN n1 > 0 AND n2 > 0 AND (n1 + n2) > 1 AND
                     (CAST(n1 AS DOUBLE)*CAST(n2 AS DOUBLE)/12.0)
                     * (CAST(n1+n2+1 AS DOUBLE)
                        - CAST(tie_t AS DOUBLE)
                          / (CAST(n1+n2 AS DOUBLE)*CAST(n1+n2-1 AS DOUBLE))) > 0
                THEN round(
                  ((CAST(r1_x2 AS DOUBLE) - CAST(n1*(n1+1) AS DOUBLE)) / 2.0
                   - CAST(n1 AS DOUBLE)*CAST(n2 AS DOUBLE)/2.0)
                  / sqrt((CAST(n1 AS DOUBLE)*CAST(n2 AS DOUBLE)/12.0)
                         * (CAST(n1+n2+1 AS DOUBLE)
                            - CAST(tie_t AS DOUBLE)
                              / (CAST(n1+n2 AS DOUBLE)*CAST(n1+n2-1 AS DOUBLE)))),
                  6)
                ELSE NULL END AS z_score
    FROM s
    """,
)
def mann_whitney_value_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test: do purchase event values stochastically
    dominate view values? Nonparametric — the workhorse for skewed revenue
    metrics where the t-test's normality assumption fails.

    Midranks without sorting rows: group by distinct CENT value (values are
    2-dp exact), cumulative counts over the value spine give each tie group
    its midrank; ``2*midrank`` stays integral so R1 is an exact BIGINT. The
    tie-corrected normal approximation's z assembles from five integer
    sufficient statistics in one identical float expression (zero-variance
    guarded to NULL in both engines).

    Scale: ranks come from the two-level bucketed prefix sum
    (``_rank_spine``) — the only unpartitioned window runs over the coarse
    BUCKET spine; per-value running sums are windowed within buckets, so no
    single partition ever holds the whole distinct-value spine."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "view"))
        .select(
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("g1"),
        )
    )
    by_val = ev.groupBy("cents").agg(
        F.sum("g1").cast("long").alias("n1v"),
        F.count(F.lit(1)).cast("long").alias("ntv"),
    )
    spine = _rank_spine(by_val.select("cents", "ntv"), "cents", "ntv", "midrank2")
    ranked = by_val.join(spine, "cents").select("n1v", "ntv", "midrank2")
    s = ranked.agg(
        F.sum("n1v").cast("long").alias("n1"),
        F.sum(F.col("ntv") - F.col("n1v")).cast("long").alias("n2"),
        F.sum(F.col("n1v") * F.col("midrank2")).cast("long").alias("r1_x2"),
        F.sum(F.col("ntv") * F.col("ntv") * F.col("ntv") - F.col("ntv"))
        .cast("long")
        .alias("tie_t"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = (F.col("n1") + F.col("n2")).cast("double")
    u1 = (F.col("r1_x2").cast("double") - (F.col("n1") * (F.col("n1") + 1)).cast("double")) / 2.0
    var = (n1d * n2d / 12.0) * (
        (F.col("n1") + F.col("n2") + 1).cast("double")
        - F.col("tie_t").cast("double") / (nd * (nd - F.lit(1.0)))
    )
    z = (u1 - n1d * n2d / 2.0) / F.sqrt(var)
    return s.select(
        "n1",
        "n2",
        F.round(u1, 1).alias("u1"),
        F.when(
            (F.col("n1") > 0) & (F.col("n2") > 0) & (F.col("n1") + F.col("n2") > 1) & (var > 0),
            F.round(z, 6),
        ).otherwise(F.lit(None).cast("double")).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# spearman_spend_orders — rank correlation from integer 2x-midranks
# ---------------------------------------------------------------------------


@query(
    "spearman_spend_orders",
    oracle="""
    WITH per_cust AS MATERIALIZED (
        SELECT o_custkey,
               CAST(count(*) AS BIGINT) AS x,
               CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS y
        FROM orders GROUP BY o_custkey
    ),
    rx AS (
        SELECT x, 2 * (sum(c) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED
                                    PRECEDING AND CURRENT ROW) - c) + c + 1
                    AS rx2
        FROM (SELECT x, CAST(count(*) AS BIGINT) AS c FROM per_cust GROUP BY x)
    ),
    ry AS (
        SELECT y, 2 * (sum(c) OVER (ORDER BY y ROWS BETWEEN UNBOUNDED
                                    PRECEDING AND CURRENT ROW) - c) + c + 1
                    AS ry2
        FROM (SELECT y, CAST(count(*) AS BIGINT) AS c FROM per_cust GROUP BY y)
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(rx2) AS BIGINT) AS sx,
               CAST(sum(ry2) AS BIGINT) AS sy,
               CAST(sum(rx2*ry2) AS BIGINT) AS sxy,
               CAST(sum(rx2*rx2) AS BIGINT) AS sxx,
               CAST(sum(ry2*ry2) AS BIGINT) AS syy
        FROM per_cust p JOIN rx ON rx.x = p.x JOIN ry ON ry.y = p.y
    )
    SELECT n,
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
                ELSE NULL END AS spearman_rho
    FROM m
    """,
)
def spearman_spend_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between a customer's order COUNT and total
    SPEND — the monotone-association readout that's robust to the heavy
    right tail Pearson chokes on.

    Rho = Pearson over midranks, with every moment an exact BIGINT:
    midranks come from cumulative counts over the two DISTINCT-value
    spines (doubled so .5 tie-midpoints stay integral — the x2 factors
    cancel in the correlation), and the five moment sums are integer.
    The single float expression at the end is identical in both engines;
    zero-variance degenerates to NULL. BIGINT headroom: moments are
    O(n^3) in customer count — exact to ~10^6 customers, beyond which the
    moments should be accumulated as DECIMAL(38).

    Scale: one orders scan -> per-customer agg; midranks come from the
    two-level bucketed prefix sum (``_rank_spine``) — the spend spine is
    customers-cardinality, so it is NEVER pushed through one unpartitioned
    window; only the coarse bucket spine is."""
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("x"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("y"),
        )
    )
    def rank2(df: DataFrame, col: str, out: str) -> DataFrame:
        by_val = df.groupBy(col).agg(F.count(F.lit(1)).cast("long").alias("c"))
        return _rank_spine(by_val, col, "c", out)

    rx = rank2(per_cust, "x", "rx2")
    ry = rank2(per_cust, "y", "ry2")
    # rx (order-count spine) has a tiny domain — broadcast; ry is the
    # distinct-SPEND spine (~customer cardinality), so it must travel by
    # shuffle equi-join, never broadcast.
    m = (
        per_cust.join(F.broadcast(rx), "x")
        .join(ry, "y")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("rx2").cast("long").alias("sx"),
            F.sum("ry2").cast("long").alias("sy"),
            F.sum(F.col("rx2") * F.col("ry2")).cast("long").alias("sxy"),
            F.sum(F.col("rx2") * F.col("rx2")).cast("long").alias("sxx"),
            F.sum(F.col("ry2") * F.col("ry2")).cast("long").alias("syy"),
        )
    )
    nd = F.col("n").cast("double")
    vx = nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")
    vy = nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double")
    cov = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")
    return m.select(
        "n",
        F.when((vx > 0) & (vy > 0), F.round(cov / F.sqrt(vx * vy), 6))
        .otherwise(F.lit(None).cast("double"))
        .alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# cuped_adjusted_conversion — variance-reduced A/B readout
# ---------------------------------------------------------------------------


@query(
    "cuped_adjusted_conversion",
    oracle=f"""
    WITH per_user AS MATERIALIZED (
        SELECT user_id,
               {sql_hash64("user_id", seed=71)} % 2 AS variant,
               CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                             THEN 1 ELSE 0 END) AS BIGINT) AS x,
               CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                              AND event_type = 'purchase'
                             THEN 1 ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY user_id
    ),
    g AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x*y) AS BIGINT) AS sxy,
               CAST(sum(x*x) AS BIGINT) AS sxx
        FROM per_user
    ),
    th AS (
        SELECT n, sx,
               CASE WHEN CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE) > 0
                    THEN (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                         / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                    ELSE 0.0 END AS theta
        FROM g
    )
    SELECT p.variant,
           CAST(count(*) AS BIGINT) AS n_users,
           round(CAST(sum(p.y) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
             AS mean_post,
           round(CAST(sum(p.y) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                 - t.theta * (CAST(sum(p.x) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                              - CAST(t.sx AS DOUBLE) / CAST(t.n AS DOUBLE)), 6)
             AS adjusted_mean,
           round(t.theta, 6) AS theta
    FROM per_user p, th t
    GROUP BY p.variant, t.theta, t.sx, t.n
    """,
)
def cuped_adjusted_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout: per-variant post-period purchase
    means adjusted by the pre-period activity covariate —
    ``adj = ȳ_v − θ·(x̄_v − x̄)`` with θ = cov(X,Y)/var(X) pooled. The
    standard trick for shrinking experiment confidence intervals with
    pre-experiment data (Deng et al., WSDM'13).

    Variant assignment is the deterministic md5 hash of user_id (exact in
    both engines); X and Y are integer event counts, so θ's moments are
    exact BIGINTs and the float arithmetic is one identical expression.
    Zero pre-period variance degenerates θ to 0 (plain difference of
    means) in both engines.

    Scale: one fact scan -> per-user agg (conditional sums, map-side
    combined); θ is a 1-row aggregate of that result broadcast back;
    2-row output."""
    per_user = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("ts") < F.lit("2024-01-16").cast("timestamp"), 1).otherwise(0)
            )
            .cast("long")
            .alias("x"),
            F.sum(
                F.when(
                    (F.col("ts") >= F.lit("2024-01-16").cast("timestamp"))
                    & (F.col("event_type") == "purchase"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("y"),
        )
        .select(
            (hash64(F.col("user_id"), seed=71) % 2).alias("variant"), "x", "y"
        )
    )
    from datapipeline_ops_spark.operators.dedup import persist_barrier

    per_user = persist_barrier(per_user, f"cuped_per_user:{sf_dir}")
    g = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    varx = nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")
    covxy = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")
    th = g.select(
        "n",
        "sx",
        F.when(varx > 0, covxy / varx).otherwise(F.lit(0.0)).alias("theta"),
    )
    return (
        per_user.join(F.broadcast(th))
        .groupBy("variant", "theta", "sx", "n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("y").cast("long").alias("_sy_v"),
            F.sum("x").cast("long").alias("_sx_v"),
        )
        .select(
            "variant",
            "n_users",
            F.round(F.col("_sy_v").cast("double") / F.col("n_users").cast("double"), 6)
            .alias("mean_post"),
            F.round(
                F.col("_sy_v").cast("double") / F.col("n_users").cast("double")
                - F.col("theta")
                * (
                    F.col("_sx_v").cast("double") / F.col("n_users").cast("double")
                    - F.col("sx").cast("double") / F.col("n").cast("double")
                ),
                6,
            ).alias("adjusted_mean"),
            F.round("theta", 6).alias("theta"),
        )
    )


# ---------------------------------------------------------------------------
# brier_score_decomposition — reliability / resolution / uncertainty
# ---------------------------------------------------------------------------


@query(
    "brier_score_decomposition",
    oracle=f"""
    WITH scored AS (
        SELECT {sql_hash64("doc_id", seed=11)} % 1000 AS p1000,
               CASE WHEN {sql_hash64("doc_id", seed=12)} % 1000
                         < {sql_hash64("doc_id", seed=11)} % 1000
                    THEN 1 ELSE 0 END AS o
        FROM documents
    ),
    bins AS (
        SELECT (p1000 // 100) AS bin,
               CAST(count(*) AS BIGINT) AS nk,
               CAST(sum(p1000) AS BIGINT) AS sp,
               CAST(sum(o) AS BIGINT) AS so,
               CAST(sum((p1000 - 1000*o)*(p1000 - 1000*o)) AS BIGINT) AS sq
        FROM scored GROUP BY p1000 // 100
    ),
    tot AS (
        SELECT CAST(sum(nk) AS BIGINT) AS n, CAST(sum(so) AS BIGINT) AS so_all,
               CAST(sum(sq) AS BIGINT) AS sq_all
        FROM bins
    )
    SELECT t.n AS n_docs,
           round(CAST(t.sq_all AS DOUBLE) / (1e6 * CAST(t.n AS DOUBLE)), 8)
             AS brier,
           round(sum(
             (CAST(b.sp AS DOUBLE)/1000.0 - CAST(b.so AS DOUBLE))
             * (CAST(b.sp AS DOUBLE)/1000.0 - CAST(b.so AS DOUBLE))
             / CAST(b.nk AS DOUBLE)) / CAST(t.n AS DOUBLE), 8) AS reliability,
           round(sum(
             CAST(b.nk AS DOUBLE)
             * (CAST(b.so AS DOUBLE)/CAST(b.nk AS DOUBLE)
                - CAST(t.so_all AS DOUBLE)/CAST(t.n AS DOUBLE))
             * (CAST(b.so AS DOUBLE)/CAST(b.nk AS DOUBLE)
                - CAST(t.so_all AS DOUBLE)/CAST(t.n AS DOUBLE)))
             / CAST(t.n AS DOUBLE), 8) AS resolution,
           round((CAST(t.so_all AS DOUBLE)/CAST(t.n AS DOUBLE))
                 * (1.0 - CAST(t.so_all AS DOUBLE)/CAST(t.n AS DOUBLE)), 8)
             AS uncertainty
    FROM bins b, tot t
    GROUP BY t.n, t.so_all, t.sq_all
    """,
)
def brier_score_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score (brier = reliability −
    resolution + uncertainty) for a probabilistic quality classifier over
    the document corpus — the calibration readout that says WHY a
    forecaster's squared error is what it is.

    The classifier is the deterministic hash stub (the repo's injected-
    scorer seam): p = h(doc)%1000 / 1000, with the outcome drawn
    consistently with p (a second hash compared against p1000), so the
    forecaster is calibrated by construction and reliability lands near 0
    — a meaningful fixture, not noise. Per-bin sufficient statistics are
    integer (counts, thousandth-sums, integer squared-error numerators);
    the 10-bin float reduction is rounded to 8 dp in both engines.

    Scale: one documents scan -> 10-bin aggregate -> constant-size
    arithmetic. Nothing row-scale survives the first agg."""
    h = hash64(F.col("doc_id"), seed=11) % 1000
    o = F.when(hash64(F.col("doc_id"), seed=12) % 1000 < h, 1).otherwise(0)
    scored = load_table(spark, sf_dir, "documents").select(
        h.alias("p1000"), o.alias("o")
    )
    bins = scored.groupBy(F.expr("p1000 div 100").alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("nk"),
        F.sum("p1000").cast("long").alias("sp"),
        F.sum("o").cast("long").alias("so"),
        F.sum(
            (F.col("p1000") - 1000 * F.col("o")) * (F.col("p1000") - 1000 * F.col("o"))
        )
        .cast("long")
        .alias("sq"),
    )
    from datapipeline_ops_spark.operators.dedup import persist_barrier

    bins = persist_barrier(bins, f"brier_bins:{sf_dir}")
    tot = bins.agg(
        F.sum("nk").cast("long").alias("n"),
        F.sum("so").cast("long").alias("so_all"),
        F.sum("sq").cast("long").alias("sq_all"),
    )
    nkd = F.col("nk").cast("double")
    nd = F.col("n").cast("double")
    obar = F.col("so_all").cast("double") / nd
    rel_term = (
        (F.col("sp").cast("double") / 1000.0 - F.col("so").cast("double"))
        * (F.col("sp").cast("double") / 1000.0 - F.col("so").cast("double"))
        / nkd
    )
    res_term = nkd * (F.col("so").cast("double") / nkd - obar) * (
        F.col("so").cast("double") / nkd - obar
    )
    return (
        bins.join(F.broadcast(tot))
        .groupBy("n", "so_all", "sq_all")
        .agg(
            F.round(F.sum(rel_term) / nd, 8).alias("_rel"),
            F.round(F.sum(res_term) / nd, 8).alias("_res"),
        )
        .select(
            F.col("n").alias("n_docs"),
            F.round(F.col("sq_all").cast("double") / (F.lit(1e6) * nd), 8).alias(
                "brier"
            ),
            F.col("_rel").alias("reliability"),
            F.col("_res").alias("resolution"),
            F.round(obar * (F.lit(1.0) - obar), 8).alias("uncertainty"),
        )
    )


# ---------------------------------------------------------------------------
# mcnemar_model_disagreement — paired-model significance on shared examples
# ---------------------------------------------------------------------------


@query(
    "mcnemar_model_disagreement",
    oracle=f"""
    WITH j AS (
        SELECT CASE WHEN {sql_hash64("doc_id", seed=21)} % 100 < 62
                    THEN 1 ELSE 0 END AS a_ok,
               CASE WHEN {sql_hash64("doc_id", seed=22)} % 100 < 58
                    THEN 1 ELSE 0 END AS b_ok
        FROM documents
    ),
    c AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN a_ok = 1 AND b_ok = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS b10,
               CAST(sum(CASE WHEN a_ok = 0 AND b_ok = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS b01,
               CAST(sum(a_ok) AS BIGINT) AS a_correct,
               CAST(sum(b_ok) AS BIGINT) AS b_correct
        FROM j
    )
    SELECT n, a_correct, b_correct, b10, b01,
           CASE WHEN b10 + b01 > 0
                THEN round(CAST((abs(b10 - b01) - 1) * (abs(b10 - b01) - 1)
                                AS DOUBLE) / CAST(b10 + b01 AS DOUBLE), 6)
                ELSE NULL END AS chi2_cc,
           CASE WHEN b10 + b01 > 0
                THEN CAST((abs(b10 - b01) - 1) * (abs(b10 - b01) - 1)
                          AS DOUBLE) / CAST(b10 + b01 AS DOUBLE) > 3.841459
                ELSE NULL END AS significant
    FROM c
    """,
)
def mcnemar_model_disagreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test: are model A and model B's accuracies
    different, judged only on the examples where they DISAGREE? The
    correct significance test for comparing two classifiers evaluated on
    the SAME dataset (independent-sample tests overstate significance by
    ignoring the pairing).

    The two models are deterministic hash stubs with different seeds
    (62% / 58% accurate by construction). The continuity-corrected
    statistic ``(|b10−b01|−1)²/(b10+b01)`` is an integer-numerator ratio;
    the 3.84 threshold (chi-square, 1 df, alpha=.05) is a literal in both
    engines; b10+b01=0 degenerates to NULL.

    Scale: one scan, one 1-row aggregate."""
    a_ok = F.when(hash64(F.col("doc_id"), seed=21) % 100 < 62, 1).otherwise(0)
    b_ok = F.when(hash64(F.col("doc_id"), seed=22) % 100 < 58, 1).otherwise(0)
    j = load_table(spark, sf_dir, "documents").select(
        a_ok.alias("a_ok"), b_ok.alias("b_ok")
    )
    c = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when((F.col("a_ok") == 1) & (F.col("b_ok") == 0), 1).otherwise(0))
        .cast("long")
        .alias("b10"),
        F.sum(F.when((F.col("a_ok") == 0) & (F.col("b_ok") == 1), 1).otherwise(0))
        .cast("long")
        .alias("b01"),
        F.sum("a_ok").cast("long").alias("a_correct"),
        F.sum("b_ok").cast("long").alias("b_correct"),
    )
    diff = F.abs(F.col("b10") - F.col("b01")) - 1
    chi2 = (diff * diff).cast("double") / (F.col("b10") + F.col("b01")).cast("double")
    nonzero = (F.col("b10") + F.col("b01")) > 0
    return c.select(
        "n",
        "a_correct",
        "b_correct",
        "b10",
        "b01",
        F.when(nonzero, F.round(chi2, 6)).otherwise(F.lit(None).cast("double")).alias("chi2_cc"),
        F.when(nonzero, chi2 > 3.841459).otherwise(F.lit(None).cast("boolean")).alias(
            "significant"
        ),
    )


# ---------------------------------------------------------------------------
# sprt_daily_monitor — sequential probability ratio test over rating days
# ---------------------------------------------------------------------------

_SPRT_P0 = 0.19
_SPRT_P1 = 0.22
# log-likelihood increments as PYTHON literals: engine libm log() could
# differ in the last ulp, so both engines get the identical double constants.
_SPRT_L1 = math.log(_SPRT_P1 / _SPRT_P0)
_SPRT_L0 = math.log((1 - _SPRT_P1) / (1 - _SPRT_P0))
_SPRT_A = math.log(19.0)  # accept H1 (alpha=beta=0.05)
_SPRT_B = -math.log(19.0)  # accept H0


@query(
    "sprt_daily_monitor",
    oracle=f"""
    WITH daily AS (
        SELECT {sql_hash64("user_id", seed=71)} % 2 AS variant,
               CAST(ts AS DATE) - DATE '1970-01-01' AS day,
               CAST(count(*) AS BIGINT) AS trials,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS conv
        FROM events
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT variant, day,
               CAST(sum(conv) OVER w AS DOUBLE) * {_SPRT_L1!r}
               + (CAST(sum(trials) OVER w AS DOUBLE)
                  - CAST(sum(conv) OVER w AS DOUBLE)) * {_SPRT_L0!r} AS llr
        FROM daily
        WINDOW w AS (PARTITION BY variant ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT variant,
           CAST(count(*) AS BIGINT) AS n_days,
           round(max_by(llr, day), 6) AS final_llr,
           min(CASE WHEN llr >= {_SPRT_A!r} OR llr <= {_SPRT_B!r}
                    THEN day END) AS decision_day,
           CASE WHEN min(CASE WHEN llr >= {_SPRT_A!r} THEN day END)
                     IS NOT NULL
                 AND coalesce(min(CASE WHEN llr >= {_SPRT_A!r} THEN day END)
                              <= min(CASE WHEN llr <= {_SPRT_B!r} THEN day END),
                              TRUE)
                THEN 'accept_h1'
                WHEN min(CASE WHEN llr <= {_SPRT_B!r} THEN day END)
                     IS NOT NULL
                THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM cum
    GROUP BY variant
    """,
)
def sprt_daily_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test run as a daily experiment
    monitor: per variant, the cumulative log-likelihood ratio of
    'conversion rate is p1=0.22' vs 'p0=0.19' over rating days (variant
    assignment shares CUPED's seed-71 hash so both monitors describe the
    SAME experiment — experiment_readout_e2e composes them), with the
    day the boundary ±log(19) (alpha=beta=0.05) was first crossed and the
    verdict. The sequential design is what lets an experiment platform
    stop early without inflating false positives.

    Exactness: daily trials/conversions are integer; the llr multiplies
    them by PYTHON-literal log constants (pasted into both engines — their
    own libm logs could differ by an ulp), so every llr and every boundary
    comparison is bit-identical. The decision resolves which boundary was
    hit FIRST (both can be hit across different days of a wandering walk).

    Scale: the cumulative window runs over the (variant, day) spine — ~60
    rows regardless of fact size; the fact is consumed by one partial
    agg."""
    ev = load_table(spark, sf_dir, "events").select(
        (hash64(F.col("user_id"), seed=71) % 2).alias("variant"),
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_conv"),
    )
    daily = ev.groupBy("variant", "day").agg(
        F.count(F.lit(1)).cast("long").alias("trials"),
        F.sum("is_conv").cast("long").alias("conv"),
    )
    w = Window.partitionBy("variant").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = daily.select(
        "variant",
        "day",
        (
            F.sum("conv").over(w).cast("double") * F.lit(_SPRT_L1)
            + (F.sum("trials").over(w).cast("double") - F.sum("conv").over(w).cast("double"))
            * F.lit(_SPRT_L0)
        ).alias("llr"),
    )
    h1_day = F.min(F.when(F.col("llr") >= _SPRT_A, F.col("day")))
    h0_day = F.min(F.when(F.col("llr") <= _SPRT_B, F.col("day")))
    return cum.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(F.max_by("llr", "day"), 6).alias("final_llr"),
        F.least(h1_day, h0_day).alias("decision_day"),
        F.when(
            h1_day.isNotNull() & F.coalesce(h1_day <= h0_day, F.lit(True)),
            F.lit("accept_h1"),
        )
        .when(h0_day.isNotNull(), F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
    )


# ---------------------------------------------------------------------------
# experiment_readout_e2e — the full A/B readout composed end-to-end
# ---------------------------------------------------------------------------

from datapipeline_ops_spark.core.registry import QUERIES  # noqa: E402


@query("experiment_readout_e2e", oracle=None)  # composed below
def experiment_readout_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The experiment platform's per-variant readout as ONE Catalyst plan —
    the experimentation counterpart of serving_retrieval_e2e: (1) CUPED
    variance-reduced adjusted means per variant (seed-71 assignment);
    (2) the SPRT sequential monitor's decision for the SAME assignment;
    (3) the corpus-level Mann-Whitney value-shift z as the nonparametric
    robustness check; (4) the adjusted lift of each variant against
    control (variant 0). Proves the experimentation operators compose:
    three registered query shapes chained without materialization
    barriers, exactly the readout row an experiment review looks at.

    Exactness: every leg is already integer-derived; the lift subtracts
    two identically-rounded doubles and re-rounds — bit-identical.

    Scale: each leg collapses the fact to <= 2 rows before the joins;
    composition cost is three scans of events (one per leg), each a
    partial-agg'd single pass."""
    cuped = QUERIES["cuped_adjusted_conversion"].fn(spark, sf_dir)
    sprt = QUERIES["sprt_daily_monitor"].fn(spark, sf_dir).select(
        "variant", "final_llr", "decision_day", "decision"
    )
    mw = QUERIES["mann_whitney_value_shift"].fn(spark, sf_dir).select(
        F.col("z_score").alias("mw_z")
    )
    control = cuped.filter(F.col("variant") == 0).select(
        F.col("adjusted_mean").alias("ctl_adj")
    )
    return (
        cuped.join(sprt, "variant")
        .join(F.broadcast(control))
        .join(F.broadcast(mw))
        .select(
            "variant",
            "n_users",
            "mean_post",
            "adjusted_mean",
            "theta",
            F.round(F.col("adjusted_mean") - F.col("ctl_adj"), 6).alias(
                "lift_adj"
            ),
            "final_llr",
            "decision_day",
            "decision",
            "mw_z",
        )
    )


def _readout_oracle() -> str:
    cuped_sql = QUERIES["cuped_adjusted_conversion"].oracle
    sprt_sql = QUERIES["sprt_daily_monitor"].oracle
    mw_sql = QUERIES["mann_whitney_value_shift"].oracle
    return f"""
    WITH cuped AS MATERIALIZED ({cuped_sql}),
    sprt AS MATERIALIZED ({sprt_sql}),
    mw AS MATERIALIZED ({mw_sql}),
    ctl AS (SELECT adjusted_mean AS ctl_adj FROM cuped WHERE variant = 0)
    SELECT c.variant, c.n_users, c.mean_post, c.adjusted_mean, c.theta,
           round(c.adjusted_mean - ctl.ctl_adj, 6) AS lift_adj,
           s.final_llr, s.decision_day, s.decision, mw.z_score AS mw_z
    FROM cuped c
    JOIN sprt s ON s.variant = c.variant
    CROSS JOIN ctl
    CROSS JOIN mw
    """


QUERIES["experiment_readout_e2e"].oracle = _readout_oracle()


# ---------------------------------------------------------------------------
# ab_srm_check — sample-ratio-mismatch guard (step 0 of every readout)
# ---------------------------------------------------------------------------


@query(
    "ab_srm_check",
    oracle=f"""
    WITH v AS (
        SELECT {sql_hash64("user_id", seed=71)} % 2 AS variant
        FROM (SELECT DISTINCT user_id FROM events)
    ),
    c AS (
        SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n0,
               CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1
        FROM v
    )
    SELECT n0, n1,
           CASE WHEN n0 + n1 > 0
                THEN round(CAST((n0 - n1) * (n0 - n1) AS DOUBLE)
                           / CAST(n0 + n1 AS DOUBLE), 6)
                ELSE NULL END AS chi2,
           CASE WHEN n0 + n1 > 0
                THEN CAST((n0 - n1) * (n0 - n1) AS DOUBLE)
                     / CAST(n0 + n1 AS DOUBLE) > 3.841459
                ELSE NULL END AS srm_detected
    FROM c
    """,
)
def ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check — step 0 of every A/B readout: under a
    50/50 split the per-variant USER counts must be statistically equal;
    ``chi2 = (n0-n1)^2/(n0+n1)`` (the 2-cell equal-expected chi-square in
    closed form) against the 3.84 threshold. An SRM means the assignment
    or logging pipeline is broken and every downstream metric — including
    this module's CUPED and SPRT readouts, which share this seed-71
    assignment — is invalid (Fabijan et al. 2019).

    Distinct-first (users, not events — event-weighted counts would hide
    per-user volume skew); integer counts, one guarded float ratio.

    Scale: one distinct-user agg, 1-row output."""
    v = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select((hash64(F.col("user_id"), seed=71) % 2).alias("variant"))
    )
    c = v.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
    )
    tot = F.col("n0") + F.col("n1")
    chi2 = ((F.col("n0") - F.col("n1")) * (F.col("n0") - F.col("n1"))).cast(
        "double"
    ) / tot.cast("double")
    return c.select(
        "n0",
        "n1",
        F.when(tot > 0, F.round(chi2, 6))
        .otherwise(F.lit(None).cast("double"))
        .alias("chi2"),
        F.when(tot > 0, chi2 > 3.841459)
        .otherwise(F.lit(None).cast("boolean"))
        .alias("srm_detected"),
    )
