"""Window-function and grouping-set queries beyond the reference's two
window sites (SURVEY.md §2.2 notes lead/lag/rollup are 'available built-in'
— these queries make that claim checkable).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.tables import load_table


@query(
    "lead_lag_deltas",
    oracle="""
    SELECT user_id, event_id,
           CAST(epoch_us(ts) - lag(epoch_us(ts))
                OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                AS BIGINT) AS gap_us,
           round(value - lag(value)
                OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id), 6)
                AS value_delta
    FROM events
    """,
)
def lead_lag_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gaps and value deltas via lag() — the time-series
    primitive under session detection and rate computation. One shuffle on
    user_id; deterministic secondary sort on event_id breaks ts ties."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), F.asc("event_id")
    )
    return e.select(
        "user_id",
        "event_id",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap_us"),
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("value_delta"),
    )


@query(
    "rolling_window_avg",
    oracle="""
    SELECT user_id, event_id,
           round(avg(value) OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
               AS rolling_avg
    FROM events
    """,
)
def rolling_window_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row rolling mean per user (rowsBetween frame spec) — smoothing /
    trend primitive; frame-bounded state keeps memory O(frame) per key."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"), F.asc("event_id"))
        .rowsBetween(-2, 0)
    )
    return e.select(
        "user_id", "event_id", F.round(F.avg("value").over(w), 6).alias("rolling_avg")
    )


@query(
    "rollup_corpus_report",
    oracle="""
    SELECT lang, source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY ROLLUP (lang, source)
    """,
)
def rollup_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical corpus report: per (lang, source), per lang, and grand
    total in ONE pass via rollup — the curation dashboard query. Partial
    aggregation applies to every grouping set."""
    d = load_table(spark, sf_dir, "documents")
    return d.rollup("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@query(
    "cube_events_report",
    oracle="""
    SELECT event_type, CAST(user_id % 10 AS BIGINT) AS user_bucket,
           count(*) AS n,
           round(sum(CAST(round(value*100) AS BIGINT)) / 100.0, 4) AS total
    FROM events GROUP BY CUBE (event_type, CAST(user_id % 10 AS BIGINT))
    """,
)
def cube_events_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 2^2 grouping combinations over (event_type, user bucket) via
    cube — cross-tab reporting in one shuffle."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "user_bucket", (F.col("user_id") % 10).cast("long")
    )
    return e.cube("event_type", "user_bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0, 4
        ).alias("total"),
    )


@query(
    "grouping_sets_report",
    oracle="""
    SELECT lang, source, count(*) AS n
    FROM documents
    GROUP BY GROUPING SETS ((lang), (source), (lang, source))
    """,
)
def grouping_sets_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (not the rollup/cube lattice): per-lang,
    per-source, and per-(lang, source) tallies in one scan — the general
    form when a dashboard wants specific breakdowns, not every combination.
    Spark compiles this to the same Expand + partial-agg plan as
    rollup/cube."""
    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("docs_gs")
    return d.sparkSession.sql(
        """
        SELECT lang, source, count(*) AS n FROM docs_gs
        GROUP BY GROUPING SETS ((lang), (source), (lang, source))
        """
    )


@query(
    "time_range_rolling_sum",
    oracle="""
    SELECT event_id, user_id,
           CAST(epoch_us(ts) // 1000000 AS BIGINT) AS t_sec,
           count(*) OVER w AS n_in_hour,
           round(sum(CAST(round(value*100) AS BIGINT)) OVER w / 100.0, 4)
               AS sum_in_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def time_range_rolling_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-TIME rolling window (RANGE frame on epoch seconds): per user,
    the count and value-sum of events in the trailing hour AT each event —
    the rate-limiter / trailing-exposure primitive row-count frames can't
    express (rows frames count neighbors, range frames honor actual time
    gaps and tie peers identically in both engines).

    One exchange on user_id; the range frame is evaluated over the sorted
    run with a sliding two-pointer, so per-partition cost is linear — the
    same plan shape as the rows-frame rolling mean, just a different frame
    boundary rule."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "value",
        (F.unix_micros("ts") / F.lit(1_000_000)).cast("long").alias("t_sec"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_sec")
        .rangeBetween(-3600, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "t_sec",
        F.count(F.lit(1)).over(w).alias("n_in_hour"),
        F.round(
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).over(w) / 100.0,
            4,
        ).alias("sum_in_hour"),
    )


@query(
    "daily_anomaly_zscore",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               count(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, n,
           CASE WHEN stddev_samp(n) OVER (PARTITION BY event_type) > 0
                THEN round((n - avg(n) OVER (PARTITION BY event_type))
                     / stddev_samp(n) OVER (PARTITION BY event_type), 4)
                ELSE NULL END AS z,
           CASE WHEN stddev_samp(n) OVER (PARTITION BY event_type) > 0
                THEN abs((n - avg(n) OVER (PARTITION BY event_type))
                     / stddev_samp(n) OVER (PARTITION BY event_type)) > 3
                ELSE NULL END AS anomalous
    FROM daily
    """,
)
def daily_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly monitor: daily event counts per type, z-scored against
    that type's own distribution; |z| > 3 flags the days a pipeline health
    dashboard would page on (ingest stall, upstream replay, bot burst).

    The daily rollup partial-aggregates the raw scan down to |types|x|days|
    rows; the z-score pass is a window over that tiny frame — at 100 TB the
    expensive part never shuffles more than the daily matrix."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # Constant daily counts give stddev 0 and ANSI Spark raises on the
    # division (single-day types give NULL stddev, which is fine) — guard
    # to NULL in both engines (found by the oracle-parity fuzzer).
    w = Window.partitionBy("event_type")
    sd = F.stddev_samp("n").over(w)
    z = (F.col("n") - F.avg("n").over(w)) / sd
    return daily.select(
        "event_type",
        "day",
        "n",
        F.when(sd > 0, F.round(z, 4)).otherwise(F.lit(None).cast("double")).alias("z"),
        F.when(sd > 0, F.abs(z) > 3)
        .otherwise(F.lit(None).cast("boolean"))
        .alias("anomalous"),
    )


@query(
    "percent_rank_features",
    oracle="""
    SELECT event_id, event_type,
           round(value, 6) AS value,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cdf
    FROM events WHERE value IS NOT NULL
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
)
def percent_rank_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDF-transform features: percent_rank and cume_dist of each event's
    value within its type — the rank-normalization step that makes
    heavy-tailed features comparable across types before training
    (a learned model sees uniform [0,1] marginals instead of raw scales).

    One exchange on event_type serves both rank functions; deterministic
    tie-break on event_id keeps ranks stable across engines and runs."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy(F.asc("value"), F.asc("event_id"))
    return e.select(
        "event_id",
        "event_type",
        F.round("value", 6).alias("value"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdf"),
    )


# ---------------------------------------------------------------------------
# Seasonal-trend decomposition + CUSUM changepoint (time-series monitors)
# ---------------------------------------------------------------------------

_STL_HALF = 3  # centered moving-average half-width (7-day trend window)


@query(
    "seasonal_decompose_daily",
    oracle=f"""
    WITH daily AS MATERIALIZED (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               sum(value) AS v
        FROM events WHERE value IS NOT NULL GROUP BY 1
    ),
    tr AS MATERIALIZED (
        SELECT day, v,
               avg(v) OVER (ORDER BY day ROWS BETWEEN {_STL_HALF} PRECEDING
                            AND {_STL_HALF} FOLLOWING) AS trend
        FROM daily
    ),
    de AS MATERIALIZED (
        SELECT day, v, trend, v - trend AS detrended,
               CAST((day + 3) % 7 AS INT) AS dow
        FROM tr
    ),
    se AS MATERIALIZED (
        SELECT dow, avg(detrended) AS seasonal FROM de GROUP BY dow
    )
    SELECT de.day, de.v AS value, de.trend, se.seasonal,
           de.detrended - se.seasonal AS residual
    FROM de JOIN se ON de.dow = se.dow
    """,
)
def seasonal_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal-trend decomposition of the daily value series
    (STL-lite): trend = 7-day centered moving average, seasonal = mean
    detrended value per day-of-week, residual = the monitor-worthy
    remainder. This is the decomposition behind 'is Monday always low, or
    is THIS Monday broken?' — z-scoring residuals beats z-scoring raw
    values whenever traffic has weekly shape.

    Scale: the raw scan partial-aggregates to |days| rows; every window
    after that runs on the bounded daily frame (same bounded-global-window
    rationale as the month/day spine queries), and the seasonal join is a
    7-row broadcast."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = e.groupBy(
        (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long").alias("day")
    ).agg(F.sum("value").alias("v"))
    # bounded frame (|days| rows): global ordered window is fine here
    w = Window.orderBy("day").rowsBetween(-_STL_HALF, _STL_HALF)
    tr = daily.withColumn("trend", F.avg("v").over(w))
    de = tr.select(
        "day",
        "v",
        "trend",
        (F.col("v") - F.col("trend")).alias("detrended"),
        ((F.col("day") + 3) % 7).cast("int").alias("dow"),
    )
    se = de.groupBy("dow").agg(F.avg("detrended").alias("seasonal"))
    return de.join(F.broadcast(se), "dow").select(
        "day",
        F.col("v").alias("value"),
        "trend",
        "seasonal",
        (F.col("detrended") - F.col("seasonal")).alias("residual"),
    )


@query(
    "changepoint_cusum_daily",
    oracle="""
    WITH daily AS MATERIALIZED (
        SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    st AS (SELECT CAST(sum(n) AS BIGINT) AS total,
                  CAST(count(*) AS BIGINT) AS days FROM daily),
    cu AS MATERIALIZED (
        SELECT day, n,
               CAST(sum(n) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                    AS DOUBLE)
               - CAST(row_number() OVER (ORDER BY day) AS DOUBLE)
                 * (CAST((SELECT total FROM st) AS DOUBLE)
                    / CAST((SELECT days FROM st) AS DOUBLE)) AS cusum
        FROM daily
    ),
    mx AS (SELECT max(abs(cusum)) AS peak FROM cu)
    SELECT day, n, cusum,
           abs(cusum) = (SELECT peak FROM mx) AS is_changepoint
    FROM cu
    """,
)
def changepoint_cusum_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan over the daily event-volume series:
    cumulative deviation from the series mean; the |cusum| peak marks the
    most likely level-shift day (the classic offline CUSUM estimator).
    The full curve ships so a dashboard shows drift building, not just
    the argmax.

    Cross-engine exactness by construction: the running sum and the rank
    are exact integers and the mean is ONE division of two exact integers,
    so every cusum value — and the exact-equality peak flag — is
    bit-identical across engines (no near-zero float-tail hazard; the raw
    value-sum variant fails the gate precisely because the final cusum is
    structurally ~0 and engine accumulation noise dominates it).

    Scale: one partial-aggregated rollup to |days| rows; the running sum
    and the peak flag run on that bounded frame with the totals and peak
    riding along as broadcast 1-row frames."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    st = daily.agg(
        F.sum("n").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("days"),
    )
    # bounded frame (|days| rows): global ordered window is fine here
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wr = Window.orderBy("day")
    mu = F.col("total").cast("double") / F.col("days").cast("double")
    cu = (
        daily.crossJoin(F.broadcast(st))
        .withColumn(
            "cusum",
            F.sum("n").over(w).cast("double")
            - F.row_number().over(wr).cast("double") * mu,
        )
        .select("day", "n", "cusum")
    )
    mx = cu.agg(F.max(F.abs(F.col("cusum"))).alias("peak"))
    return cu.crossJoin(F.broadcast(mx)).select(
        "day",
        "n",
        "cusum",
        (F.abs(F.col("cusum")) == F.col("peak")).alias("is_changepoint"),
    )


# ---------------------------------------------------------------------------
# theil_sen_daily_trend
# ---------------------------------------------------------------------------

_TS_FROM = "2001-04-01"  # last ~4 months of the order history


@query(
    "theil_sen_daily_trend",
    oracle=f"""
    WITH daily AS MATERIALIZED (
        SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS cnt
        FROM orders WHERE o_orderdate >= TIMESTAMP '{_TS_FROM}'
        GROUP BY 1
    ),
    slopes AS MATERIALIZED (
        SELECT CAST(b.cnt - a.cnt AS DOUBLE) / CAST(b.day - a.day AS DOUBLE)
                   AS slope,
               a.day AS di, b.day AS dj
        FROM daily a JOIN daily b ON b.day > a.day
    ),
    ranked AS (
        SELECT slope, row_number() OVER (ORDER BY slope, di, dj) AS rn,
               count(*) OVER () AS n
        FROM slopes
    ),
    med AS (
        SELECT avg(slope) AS ts_slope FROM ranked
        WHERE rn = (n + 1) // 2 OR rn = n // 2 + 1
    ),
    ols AS (
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               CAST(count(*) * sum(day * cnt) - sum(day) * sum(cnt) AS BIGINT)
                   AS num,
               CAST(count(*) * sum(day * day) - sum(day) * sum(day) AS BIGINT)
                   AS den
        FROM daily
    )
    SELECT o.n_days,
           CAST(o.n_days * (o.n_days - 1) / 2 AS BIGINT) AS n_pairs,
           m.ts_slope,
           CASE WHEN o.den = 0 THEN NULL
                ELSE CAST(o.num AS DOUBLE) / CAST(o.den AS DOUBLE) END AS ols_slope
    FROM ols o CROSS JOIN med m
    """,
)
def theil_sen_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend estimate of the daily order rate (median of
    all pairwise slopes) next to the OLS slope — the monitor that doesn't
    move when one day is an outage or a bot spike, which is exactly when
    the OLS line lies. Runs over the last ~4 months of history.

    Exactness: pairwise slopes are single divisions of integer deltas
    (bit-identical), the median picks by a fully deterministic
    (slope, day_i, day_j) order — even-count medians average TWO doubles,
    a single commutative add — and the OLS slope is one division of
    integer sums (day·count products stay integral). Nothing accumulates
    in float.

    Scale: the pair stage is O(days²) over the DAILY AGGREGATE (~120
    rows -> ~7k pairs), never the fact table — the same
    aggregate-then-quadratic discipline as the bounded-spine monitors;
    the fact scan is one partial-agg count with the date filter pushed
    to parquet."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(_TS_FROM).cast("timestamp"))
        .groupBy(
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("day")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .persist()
    )
    try:
        a = daily.select(F.col("day").alias("di"), F.col("cnt").alias("ci"))
        b = daily.select(F.col("day").alias("dj"), F.col("cnt").alias("cj"))
        slopes = a.join(b, F.col("dj") > F.col("di")).select(
            (
                (F.col("cj") - F.col("ci")).cast("double")
                / (F.col("dj") - F.col("di")).cast("double")
            ).alias("slope"),
            "di",
            "dj",
        )
        w = Window.orderBy("slope", "di", "dj")
        ranked = slopes.select(
            "slope",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        )
        lo = F.floor((F.col("n") + 1) / 2).cast("long")
        hi = F.floor(F.col("n") / 2).cast("long") + 1
        med = (
            ranked.filter((F.col("rn") == lo) | (F.col("rn") == hi))
            .agg(F.avg("slope").alias("ts_slope"))
        )
        ols = daily.agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            (
                F.count(F.lit(1)) * F.sum(F.col("day") * F.col("cnt"))
                - F.sum("day") * F.sum("cnt")
            )
            .cast("long")
            .alias("num"),
            (
                F.count(F.lit(1)) * F.sum(F.col("day") * F.col("day"))
                - F.sum("day") * F.sum("day")
            )
            .cast("long")
            .alias("den"),
        )
        out = ols.crossJoin(med).select(
            "n_days",
            (F.col("n_days") * (F.col("n_days") - 1) / 2).cast("long").alias("n_pairs"),
            "ts_slope",
            F.when(
                F.col("den") != 0,
                F.col("num").cast("double") / F.col("den").cast("double"),
            ).alias("ols_slope"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        daily.unpersist()


# ---------------------------------------------------------------------------
# freshness_sla_report
# ---------------------------------------------------------------------------

_SLA_SECONDS = 1800


@query(
    "freshness_sla_report",
    oracle=f"""
    WITH per_type AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
               CAST(max(epoch_us(ts)) AS BIGINT) AS max_ts_us
        FROM events GROUP BY event_type
    )
    SELECT event_type, n_events, max_ts_us,
           CAST(max(max_ts_us) OVER () - max_ts_us AS BIGINT) AS lag_us,
           CAST((max(max_ts_us) OVER () - max_ts_us) // 1000000 AS BIGINT)
               AS lag_seconds,
           ((max(max_ts_us) OVER () - max_ts_us) // 1000000 > {_SLA_SECONDS})
               AS stale
    FROM per_type
    """,
)
def freshness_sla_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness SLA monitor: per event stream (event_type), the lag
    between its newest record and the newest record anywhere in the table,
    with a staleness verdict at {_SLA_SECONDS} s — the first page of any
    ingest dashboard, and the gate that blocks a training snapshot from
    shipping with a silently stalled upstream.

    Scale: one partial-agg max/count per stream key (map-side combined),
    then a window over the |streams|-row aggregate for the global
    high-water mark; all lag arithmetic is integer microseconds
    (``unix_micros`` <-> ``epoch_us`` — the repo's epoch convention), so
    the verdict boolean is exact cross-engine."""
    per_type = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max(F.unix_micros("ts")).cast("long").alias("max_ts_us"),
        )
    )
    w = Window.partitionBy()
    lag_us = F.max("max_ts_us").over(w) - F.col("max_ts_us")
    lag_s = F.floor(lag_us / 1_000_000).cast("long")
    return per_type.select(
        "event_type",
        "n_events",
        "max_ts_us",
        lag_us.cast("long").alias("lag_us"),
        lag_s.alias("lag_seconds"),
        (lag_s > _SLA_SECONDS).alias("stale"),
    )


# ---------------------------------------------------------------------------
# seasonal_naive_backtest
# ---------------------------------------------------------------------------

_SNB_FROM = "2001-05-01"


@query(
    "seasonal_naive_backtest",
    oracle=f"""
    WITH daily AS MATERIALIZED (
        SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS cnt
        FROM orders WHERE o_orderdate >= TIMESTAMP '{_SNB_FROM}'
        GROUP BY 1
    ),
    lagged AS (
        SELECT day, cnt,
               lag(cnt, 1) OVER (ORDER BY day) AS l1,
               lag(cnt, 7) OVER (ORDER BY day) AS l7
        FROM daily
    ),
    scored AS (
        SELECT CAST(count(*) AS BIGINT) AS n_days_scored,
               CAST(sum(abs(cnt - l1)) AS BIGINT) AS ae_naive,
               CAST(sum(abs(cnt - l7)) AS BIGINT) AS ae_snaive
        FROM lagged WHERE l7 IS NOT NULL
    )
    SELECT n_days_scored,
           CASE WHEN n_days_scored > 0
                THEN CAST(ae_naive AS DOUBLE) / CAST(n_days_scored AS DOUBLE)
                ELSE NULL END AS mae_naive,
           CASE WHEN n_days_scored > 0
                THEN CAST(ae_snaive AS DOUBLE) / CAST(n_days_scored AS DOUBLE)
                ELSE NULL END AS mae_snaive,
           (ae_snaive < ae_naive) AS snaive_better
    FROM scored
    """,
)
def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-baseline backtest on the daily order rate: MAE of the naive
    forecast (yesterday's value) vs the seasonal-naive forecast (same
    weekday last week) over the recent history — the sanity floor every
    capacity-planning or anomaly-threshold model must beat before it ships
    (a model that loses to seasonal-naive is worse than no model).

    Exactness: absolute errors are integer count deltas summed as
    integers; each MAE is one final int/int division; the verdict compares
    integers — nothing accumulates in float.

    Scale: the backtest runs entirely on the daily aggregate (bounded day
    spine) behind one partial-agg fact scan with the date filter pushed
    to parquet; the lag window orders the ~90-row spine."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(_SNB_FROM).cast("timestamp"))
        .groupBy(
            F.datediff(
                F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
            )
            .cast("long")
            .alias("day")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "day",
        "cnt",
        F.lag("cnt", 1).over(w).alias("l1"),
        F.lag("cnt", 7).over(w).alias("l7"),
    )
    scored = lagged.filter(F.col("l7").isNotNull()).agg(
        F.count(F.lit(1)).cast("long").alias("n_days_scored"),
        F.sum(F.abs(F.col("cnt") - F.col("l1"))).cast("long").alias("ae_naive"),
        F.sum(F.abs(F.col("cnt") - F.col("l7"))).cast("long").alias("ae_snaive"),
    )
    # a series shorter than the 7-day season scores zero days — ANSI Spark
    # raises on the 0-divisor MAE where DuckDB doesn't; NULL-guard both
    # engines (oracle-parity fuzzer, round 9)
    nd = F.col("n_days_scored")
    return scored.select(
        "n_days_scored",
        F.when(
            nd > 0, F.col("ae_naive").cast("double") / nd.cast("double")
        ).alias("mae_naive"),
        F.when(
            nd > 0, F.col("ae_snaive").cast("double") / nd.cast("double")
        ).alias("mae_snaive"),
        (F.col("ae_snaive") < F.col("ae_naive")).alias("snaive_better"),
    )
