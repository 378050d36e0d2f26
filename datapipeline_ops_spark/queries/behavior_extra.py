"""Behavioral/time-series wave: gaps-and-islands activity streaks, sample
autocorrelation of the daily revenue series, inter-event burstiness (Fano
factor), and RFM customer segmentation via distributed CDF quartiles.

Extends the temporal family (sessionization, retention cohorts, funnels,
seasonal monitors) with the remaining classic event-analytics shapes.

Exactness: streaks and RFM are pure integers; ACF and Fano assemble from
integer moment sums (series values coarsened to keep products inside
BIGINT) into one identical float expression; no float aggregation exists
anywhere in the wave.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.functions.ranks import cum_before_spine
from datapipeline_ops_spark.tables import load_table


# ---------------------------------------------------------------------------
# activity_streak_histogram — gaps & islands over user active days
# ---------------------------------------------------------------------------


@query(
    "activity_streak_histogram",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id,
               CAST(ts AS DATE) - DATE '1970-01-01' AS day
        FROM events
    ),
    isl AS (
        SELECT user_id,
               day - row_number() OVER (PARTITION BY user_id ORDER BY day)
                   AS grp
        FROM ud
    ),
    streaks AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS streak_len
        FROM isl GROUP BY user_id, grp
    )
    SELECT streak_len,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM streaks
    GROUP BY streak_len
    """,
)
def activity_streak_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-day activity streaks (the gaps-and-islands pattern):
    ``day - row_number()`` is constant within a run of consecutive active
    days, so grouping by it splits each user's calendar into islands —
    the classic SQL idiom, no self-join, no recursion. Output: histogram
    of streak lengths with how many users own one.

    All-integer; distinct-first (one row per active user-day before any
    window).

    Scale: the window partitions by user — thousands of independent
    partitions each at most 30 rows (the event calendar), the same
    contract as sessionize_events; output bounded by the calendar."""
    ud = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ).cast("long").alias("day"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    isl = ud.select("user_id", (F.col("day") - F.row_number().over(w)).alias("grp"))
    streaks = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("streak_len")
    )
    return streaks.groupBy("streak_len").agg(
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# autocorrelation_daily_revenue — sample ACF at business-relevant lags
# ---------------------------------------------------------------------------

_ACF_LAGS = (1, 7, 28)
_ACF_UNIT = 100_000  # daily cents -> $1000 units so lag products fit BIGINT


def _acf_oracle() -> str:
    lag_sql = []
    for k in _ACF_LAGS:
        lag_sql.append(f"""
    SELECT {k} AS lag,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(a.x*b.x) AS BIGINT) AS sxy,
           CAST(sum(a.x) AS BIGINT) AS sh,
           CAST(sum(b.x) AS BIGINT) AS st
    FROM d a JOIN d b ON b.day = a.day + {k}
    """)
    return (
        f"""
    WITH d AS MATERIALIZED (
        SELECT CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS day,
               CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
                 // {_ACF_UNIT} AS x
        FROM orders GROUP BY 1
    ),
    t AS MATERIALIZED (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(x*x) AS BIGINT) AS sxx
        FROM d
    ),
    p AS MATERIALIZED (
    """
        + " UNION ALL ".join(lag_sql)
        + """
    )
    SELECT p.lag, p.n_pairs,
           CASE WHEN (CAST(t.sxx AS DOUBLE)
                      - CAST(t.n AS DOUBLE)
                        * (CAST(t.sx AS DOUBLE) / CAST(NULLIF(t.n, 0) AS DOUBLE))
                        * (CAST(t.sx AS DOUBLE) / CAST(NULLIF(t.n, 0) AS DOUBLE))
                     ) > 0
                THEN round((
                       CAST(p.sxy AS DOUBLE)
                       - (CAST(t.sx AS DOUBLE) / CAST(NULLIF(t.n, 0) AS DOUBLE))
                         * (CAST(p.sh AS DOUBLE) + CAST(p.st AS DOUBLE))
                       + CAST(p.n_pairs AS DOUBLE)
                         * (CAST(t.sx AS DOUBLE) / CAST(NULLIF(t.n, 0) AS DOUBLE))
                         * (CAST(t.sx AS DOUBLE) / CAST(NULLIF(t.n, 0) AS DOUBLE))
                     ) / (
                       CAST(t.sxx AS DOUBLE)
                       - CAST(t.n AS DOUBLE)
                         * (CAST(t.sx AS DOUBLE) / CAST(NULLIF(t.n, 0) AS DOUBLE))
                         * (CAST(t.sx AS DOUBLE) / CAST(NULLIF(t.n, 0) AS DOUBLE))
                     ), 6)
                ELSE NULL END AS acf
    FROM p, t
    """
    )


@query("autocorrelation_daily_revenue", oracle=_acf_oracle())
def autocorrelation_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the daily order-revenue series at lags 1,
    7, and 28 days — the first thing a forecaster checks (weekly
    seasonality shows as a lag-7 spike). ACF_k expands to moment form:
    ``(Σx_t·x_{t+k} − x̄(Σhead + Σtail) + n_k·x̄²) / (Σx² − N·x̄²)`` with
    every Σ an exact BIGINT (daily cents coarsened to $1000 units so
    lagged products stay inside BIGINT at any plausible scale) and ONE
    identical float expression per lag. Missing calendar days simply
    don't pair (calendar-lag join, not index lag).

    Scale: one orders scan -> per-day agg (the ~2400-day bounded spine);
    the lag joins are spine-sized equi-joins; 3 output rows."""
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
                f" div {_ACF_UNIT}"
            ).alias("x")
        )
    )
    from datapipeline_ops_spark.operators.dedup import persist_barrier

    d = persist_barrier(d, f"acf_daily:{sf_dir}")
    tot = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    out = None
    for k in _ACF_LAGS:
        b = d.select((F.col("day") - k).alias("day"), F.col("x").alias("xk"))
        lagk = (
            d.join(b, "day")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_pairs"),
                F.sum(F.col("x") * F.col("xk")).cast("long").alias("sxy"),
                F.sum("x").cast("long").alias("sh"),
                F.sum("xk").cast("long").alias("st"),
            )
            .select(F.lit(k).cast("int").alias("lag"), "n_pairs", "sxy", "sh", "st")
        )
        out = lagk if out is None else out.unionAll(lagk)
    mean = F.col("sx").cast("double") / F.nullif(
        F.col("n"), F.lit(0).cast("long")
    ).cast("double")
    num = (
        F.col("sxy").cast("double")
        - mean * (F.col("sh").cast("double") + F.col("st").cast("double"))
        + F.col("n_pairs").cast("double") * mean * mean
    )
    den = F.col("sxx").cast("double") - F.col("n").cast("double") * mean * mean
    # A constant coarsened series (all x equal) makes den exactly 0 —
    # ANSI Spark would raise DIVIDE_BY_ZERO where DuckDB yields NULL, so
    # both engines guard den > 0 identically (same double from same
    # BIGINTs, so the comparison can never disagree across engines).
    return out.join(F.broadcast(tot)).select(
        "lag",
        "n_pairs",
        F.when(den > 0, F.round(num / den, 6)).alias("acf"),
    )


# ---------------------------------------------------------------------------
# interevent_burstiness — Fano factor of inter-event gaps per event type
# ---------------------------------------------------------------------------


@query(
    "interevent_burstiness",
    oracle="""
    WITH g AS (
        SELECT event_type,
               (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id, event_type
                    ORDER BY ts, event_id)) // 60000000 AS gap_min
        FROM events
    ),
    m AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_gaps,
               CAST(sum(gap_min) AS BIGINT) AS s1,
               CAST(sum(gap_min * gap_min) AS BIGINT) AS s2
        FROM g WHERE gap_min IS NOT NULL
        GROUP BY event_type
    )
    SELECT event_type, n_gaps,
           round(CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE), 4) AS mean_gap_min,
           CASE WHEN s1 > 0 AND n_gaps > 1
                THEN round(
                  ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)*CAST(s1 AS DOUBLE)
                    / CAST(n_gaps AS DOUBLE)) / CAST(n_gaps - 1 AS DOUBLE))
                  / (CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE)), 4)
                ELSE NULL END AS fano_factor
    FROM m
    """,
)
def interevent_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness of each event type: the Fano factor (sample variance /
    mean) of inter-event gaps within a (user, type) stream. Fano ~ 1 is
    Poisson; >> 1 means bursty arrivals (sessions, retries, incident
    storms) — the dispersion diagnostic behind rate-limiter and capacity
    sizing.

    Gaps come from a lag window ordered by (ts, event_id) — the tiebreak
    makes equal-timestamp orderings identical cross-engine — floored to
    whole MINUTES so squared-gap sums stay deep inside BIGINT at any
    scale. Variance/mean assemble from the integer (n, Σg, Σg²) in one
    identical expression; zero-mean and single-gap groups degrade to NULL.

    Scale: the window partitions by (user, type) — bounded per-user
    streams; one partial-agg'd rollup to 5 rows."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    g = ev.select(
        "event_type",
        F.expr(
            "(unix_micros(ts) - lag(unix_micros(ts)) OVER ("
            "PARTITION BY user_id, event_type ORDER BY ts, event_id))"
            " div 60000000"
        ).alias("gap_min"),
    )
    m = g.filter(F.col("gap_min").isNotNull()).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("gap_min").cast("long").alias("s1"),
        F.sum(F.col("gap_min") * F.col("gap_min")).cast("long").alias("s2"),
    )
    nd = F.col("n_gaps").cast("double")
    mean = F.col("s1").cast("double") / nd
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double") / nd
    ) / (F.col("n_gaps") - 1).cast("double")
    return m.select(
        "event_type",
        "n_gaps",
        F.round(mean, 4).alias("mean_gap_min"),
        F.when((F.col("s1") > 0) & (F.col("n_gaps") > 1), F.round(var / mean, 4))
        .otherwise(F.lit(None).cast("double"))
        .alias("fano_factor"),
    )


# ---------------------------------------------------------------------------
# rfm_segmentation — recency/frequency/monetary quartile codes
# ---------------------------------------------------------------------------

_RFM_ASOF = "2001-08-02"  # day after the last order date in the catalog


@query(
    "rfm_segmentation",
    oracle=f"""
    WITH per_cust AS MATERIALIZED (
        SELECT o_custkey,
               CAST(DATE '{_RFM_ASOF}' - CAST(max(o_orderdate) AS DATE)
                    AS BIGINT) AS r,
               CAST(count(*) AS BIGINT) AS f,
               CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
                 AS m
        FROM orders GROUP BY o_custkey
    ),
    nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM per_cust),
    rq AS (SELECT r, CAST(sum(c) OVER (ORDER BY r ROWS BETWEEN UNBOUNDED
                         PRECEDING AND CURRENT ROW) - c AS BIGINT) AS cb
           FROM (SELECT r, count(*) AS c FROM per_cust GROUP BY r)),
    fq AS (SELECT f, CAST(sum(c) OVER (ORDER BY f ROWS BETWEEN UNBOUNDED
                         PRECEDING AND CURRENT ROW) - c AS BIGINT) AS cb
           FROM (SELECT f, count(*) AS c FROM per_cust GROUP BY f)),
    mq AS (SELECT m, CAST(sum(c) OVER (ORDER BY m ROWS BETWEEN UNBOUNDED
                         PRECEDING AND CURRENT ROW) - c AS BIGINT) AS cb
           FROM (SELECT m, count(*) AS c FROM per_cust GROUP BY m))
    SELECT CAST(100 * (1 + least(3, (4 * rq.cb) // nt.n))
                + 10 * (1 + least(3, (4 * fq.cb) // nt.n))
                + (1 + least(3, (4 * mq.cb) // nt.n)) AS BIGINT) AS rfm_code,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(CAST(sum(p.m) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) / 100.0, 2) AS avg_spend
    FROM per_cust p
    JOIN rq ON rq.r = p.r
    JOIN fq ON fq.f = p.f
    JOIN mq ON mq.m = p.m
    CROSS JOIN nt
    GROUP BY 1
    """,
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: quartile-code each customer on Recency
    (days since last order), Frequency (order count), and Monetary (total
    cent-exact spend), emit the 3-digit code distribution with average
    spend — the classic CRM segmentation, done the deterministic way:
    quartile = ``1 + min(3, 4*|{{values strictly below}}| // n)`` from the
    value-level CDF, so tied customers ALWAYS share a quartile (ntile()
    would split ties by arbitrary row order — nondeterministic across
    engines and across runs).

    Scale: the Spark side computes each CDF with the two-level bucketed
    prefix sum (functions/ranks.py) — no customers-cardinality partition
    anywhere; the oracle uses the plain single windows (DuckDB need not
    scale). Output <= 64 codes."""
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.datediff(
                F.lit(_RFM_ASOF).cast("date"), F.max(F.col("o_orderdate").cast("date"))
            ).cast("long").alias("r"),
            F.count(F.lit(1)).cast("long").alias("f"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("m"),
        )
    )
    from datapipeline_ops_spark.operators.dedup import persist_barrier

    per_cust = persist_barrier(per_cust, f"rfm_per_cust:{sf_dir}")
    nt = per_cust.agg(F.count(F.lit(1)).cast("long").alias("n"))

    def cdf(col: str) -> DataFrame:
        by_val = per_cust.groupBy(col).agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        return cum_before_spine(by_val, col, "c", f"cb_{col}")

    q = lambda col: 1 + F.least(  # noqa: E731
        F.lit(3), F.expr(f"(4 * cb_{col}) div n")
    )
    return (
        per_cust.join(cdf("r"), "r")
        .join(cdf("f"), "f")
        .join(cdf("m"), "m")
        .join(F.broadcast(nt))
        .groupBy(
            (100 * q("r") + 10 * q("f") + q("m")).cast("long").alias("rfm_code")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(
                F.sum("m").cast("double") / F.count(F.lit(1)).cast("double") / 100.0,
                2,
            ).alias("avg_spend"),
        )
    )
