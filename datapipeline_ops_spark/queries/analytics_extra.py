"""Third coverage wave: vector centroids, time-series trends, fuzzy string
matching.

- ``label_centroids``: per-class embedding centroid — the reduce step of
  k-means / IVF coarse quantizer training (the IVF ANN query seeds its cells
  from hashes; real training averages vectors exactly like this).
- ``monthly_revenue_trend``: date_trunc bucketing + cumulative window — the
  canonical OLAP time series.
- ``fuzzy_name_pairs``: edit-distance near-match under a blocking key —
  entity-resolution shape (dedup of near-identical titles/names), the
  string twin of the embedding near-dup ops.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.tables import load_table

_DIM = 64


@query(
    "label_centroids",
    oracle=f"""
    WITH e AS (SELECT label, embedding FROM embeddings)
    SELECT label, i.dim AS dim, round(avg(embedding[i.dim + 1]), 4) + 0.0 AS centroid,
           count(*) AS n_vectors
    FROM e, LATERAL (SELECT unnest(generate_series(0, {_DIM - 1})) AS dim) AS i
    GROUP BY 1, 2
    """,
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid, one row per (label, dimension).

    posexplode flattens vectors to (label, dim, value) and one hash
    aggregate averages per cell. The explode multiplies rows by the
    dimension (64×) but each row is 20 bytes and partial aggregation
    collapses them map-side to |labels|×|dims| rows before the shuffle — at
    100 TB the exchange carries only the tiny centroid matrix. The
    no-explode alternative (aggregate over an array accumulator, as in
    simhash) saves the row blowup but gives up map-side combine; explode +
    partial agg wins when |groups| is small.
    """
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(
            (F.round(F.avg("v"), 4) + 0.0).alias("centroid"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
    )


@query(
    "monthly_revenue_trend",
    oracle="""
    WITH m AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
                   AS rev_cents,
               count(*) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT month, round(rev_cents / 100.0, 2) AS revenue, n_orders,
           round(CAST(sum(rev_cents) OVER (ORDER BY month
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 / 100.0, 2) AS cumulative_revenue
    FROM m
    """,
)
def monthly_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-bucketed revenue with a cumulative running total.

    The monthly aggregate shrinks the fact table to ~100 rows before the
    window runs, so the unpartitioned (single-task) cumulative window is
    safe — the rule at scale: never run a global window on raw rows, always
    on a pre-aggregated frame.
    """
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("month"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "rev_cents"
            ),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return monthly.select(
        "month",
        F.round(F.col("rev_cents") / 100.0, 2).alias("revenue"),
        "n_orders",
        F.round(F.sum("rev_cents").over(w) / 100.0, 2).alias("cumulative_revenue"),
    )


@query(
    "fuzzy_name_pairs",
    oracle="""
    WITH p AS (
        SELECT p_partkey, p_name,
               split_part(p_name, ' ', 2) AS noun
        FROM part
    )
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM p a JOIN p b ON a.noun = b.noun AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 2 AND a.p_name <> b.p_name
    """,
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution near-match: part-name pairs within edit distance 2,
    blocked on the name's noun token so the join is an equi-join per block,
    never |parts|² — the same block-then-verify shape as the LSH and
    SimHash pipelines, with Levenshtein as the verifier. Both engines
    implement plain (unweighted) Levenshtein, so values agree exactly.
    """
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        F.split(F.col("p_name"), " ").getItem(1).alias("noun"),
    )
    a, b = p.alias("a"), p.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.noun") == F.col("b.noun"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .filter((dist <= 2) & (F.col("a.p_name") != F.col("b.p_name")))
        .select(
            F.col("a.p_partkey").alias("key_a"),
            F.col("b.p_partkey").alias("key_b"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            dist.alias("dist"),
        )
    )


@query(
    "monthly_spine_gap_fill",
    oracle="""
    WITH bounds AS (
        SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS lo,
               CAST(date_trunc('month', max(o_orderdate)) AS DATE) AS hi
        FROM orders
    ),
    spine AS (
        SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE) AS month
        FROM bounds
    ),
    actual AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               count(*) AS n_orders,
               round(sum(CAST(round(o_totalprice*100) AS BIGINT)) / 100.0, 2)
                   AS revenue
        FROM orders
        WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 450000
        GROUP BY 1
    )
    SELECT s.month AS month,
           COALESCE(a.n_orders, 0) AS n_orders,
           COALESCE(a.revenue, 0.0) AS revenue
    FROM spine s LEFT JOIN actual a ON s.month = a.month
    """,
)
def monthly_spine_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled monthly series: months with NO qualifying orders appear as
    explicit zero rows (dashboards and trend models need the holes). The
    spine is `sequence(min_month, max_month, interval 1 month)` exploded
    from a single-row bounds aggregate, then left-joined to the sparse
    actuals — both sides of that join are at most a few hundred rows at any
    data scale, so the broadcast is free; the only real work is the
    pre-aggregation, which partial-aggregates before its shuffle.
    """
    o = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", "o_orderdate").cast("date")
    bounds = o.agg(
        F.min(month).alias("lo"), F.max(month).alias("hi")
    )
    spine = bounds.select(
        F.explode(
            F.sequence(
                F.col("lo").cast("timestamp"),
                F.col("hi").cast("timestamp"),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("month_ts")
    ).select(F.col("month_ts").cast("date").alias("month"))
    actual = (
        o.filter((F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 450000))
        .groupBy(month.alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")) / 100.0,
                2,
            ).alias("revenue"),
        )
    )
    return spine.join(actual, "month", "left").select(
        "month",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
    )


@query(
    "funnel_conversion",
    oracle="""
    WITH t1 AS (SELECT user_id, min(epoch_us(ts)) AS v FROM events
                WHERE event_type = 'signup' GROUP BY user_id),
    t2 AS (SELECT e.user_id, min(epoch_us(ts)) AS v FROM events e
           JOIN t1 ON e.user_id = t1.user_id
           WHERE event_type = 'view' AND epoch_us(ts) > t1.v GROUP BY e.user_id),
    t3 AS (SELECT e.user_id, min(epoch_us(ts)) AS v FROM events e
           JOIN t2 ON e.user_id = t2.user_id
           WHERE event_type = 'click' AND epoch_us(ts) > t2.v GROUP BY e.user_id),
    t4 AS (SELECT e.user_id, min(epoch_us(ts)) AS v FROM events e
           JOIN t3 ON e.user_id = t3.user_id
           WHERE event_type = 'purchase' AND epoch_us(ts) > t3.v GROUP BY e.user_id)
    SELECT (SELECT count(*) FROM t1) AS n_signup,
           (SELECT count(*) FROM t2) AS n_then_view,
           (SELECT count(*) FROM t3) AS n_then_click,
           (SELECT count(*) FROM t4) AS n_then_purchase
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: users who signed up, THEN viewed, THEN
    clicked, THEN purchased — each stage strictly after the previous
    stage's first completion (the product-analytics funnel the reference's
    linear pipelines can't express; every step is an ordered temporal
    predicate, not a set intersection).

    Four chained (aggregate → co-partitioned join) stages, all keyed on
    user_id: the event log shuffles ONCE onto user_id and every subsequent
    min/join reuses that partitioning; stage frames shrink monotonically,
    so at 100 TB each later stage joins an ever-smaller user set."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("t")
    )

    def stage(prev: DataFrame, etype: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == etype)
            .join(prev, "user_id")
            .filter(F.col("t") > F.col("v"))
            .groupBy("user_id")
            .agg(F.min("t").alias("v2"))
            .select("user_id", F.col("v2").alias("v"))
        )

    t1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("t").alias("v"))
    )
    t2 = stage(t1, "view")
    t3 = stage(t2, "click")
    t4 = stage(t3, "purchase")
    counts = [
        df.agg(F.count(F.lit(1)).alias(name))
        for df, name in [
            (t1, "n_signup"),
            (t2, "n_then_view"),
            (t3, "n_then_click"),
            (t4, "n_then_purchase"),
        ]
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.crossJoin(c)
    return out


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap


@query(
    "event_bigram_paths",
    oracle=f"""
    WITH s AS (
        SELECT user_id, event_type, epoch_us(ts) AS t, event_id,
               lead(event_type) OVER w AS nxt,
               lead(epoch_us(ts)) OVER w AS nxt_t
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    )
    SELECT event_type AS step_a, nxt AS step_b, count(*) AS n_transitions
    FROM s
    WHERE nxt IS NOT NULL AND nxt_t - t <= {SESSION_GAP_US}
    GROUP BY event_type, nxt
    """,
)
def event_bigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-path transition matrix: counts of consecutive event-type
    bigrams within a 30-minute session gap — the Markov-chain view of user
    journeys that powers next-step prediction and funnel discovery
    (complements funnel_conversion's fixed-order stages with the full
    empirical transition graph).

    One shuffle on user_id for the lead() window, then a partial-aggregated
    rollup on the tiny (type × type) key space; transition counts are
    |types|² rows regardless of corpus size."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("t"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    s = e.select(
        "event_type",
        "t",
        F.lead("event_type").over(w).alias("nxt"),
        F.lead("t").over(w).alias("nxt_t"),
    )
    return (
        s.filter(
            F.col("nxt").isNotNull()
            & (F.col("nxt_t") - F.col("t") <= SESSION_GAP_US)
        )
        .groupBy(
            F.col("event_type").alias("step_a"), F.col("nxt").alias("step_b")
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@query(
    "retention_cohorts",
    oracle="""
    WITH firstday AS (
        SELECT user_id,
               CAST(epoch_us(min(ts)) // 86400000000 AS BIGINT) AS cohort_day
        FROM events GROUP BY user_id
    )
    SELECT f.cohort_day,
           CAST(epoch_us(e.ts) // 86400000000 AS BIGINT) - f.cohort_day AS day_offset,
           count(DISTINCT e.user_id) AS n_users
    FROM events e JOIN firstday f ON f.user_id = e.user_id
    GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day, counted
    on each subsequent day they return — the standard growth-analytics
    triangle (cohort_day x day_offset -> distinct returning users).

    Shape at scale: the first-touch per user is a window min over ONE
    user_id exchange; day arithmetic stays on epoch-day integers (timezone-
    proof). The distinct-user rollup re-shuffles on the tiny
    (cohort_day, day_offset) key — partial aggregation collapses the
    per-user rows map-side first. No join against a separate firstday
    table: the window computes first-touch in the same exchange the events
    already need, where the oracle's self-join shape would scan twice."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long").alias("day")
    )
    w = Window.partitionBy("user_id")
    cohorted = e.select(
        "user_id", "day", F.min("day").over(w).alias("cohort_day")
    )
    return (
        cohorted.groupBy(
            "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset")
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


_HIST_BINS = 20


@query(
    "histogram_equi_width",
    oracle=f"""
    WITH ext AS (SELECT min(value) AS lo, max(value) AS hi FROM events
                 WHERE value IS NOT NULL),
    b AS (
        SELECT CASE WHEN hi = lo THEN 0
                    ELSE least({_HIST_BINS - 1},
                     CAST(floor((value - lo) * {_HIST_BINS}e0 / (hi - lo)) AS INT))
               END AS bin
        FROM events, ext WHERE value IS NOT NULL
    )
    SELECT bin,
           round((SELECT lo FROM ext) + bin * ((SELECT hi FROM ext) - (SELECT lo FROM ext)) / {_HIST_BINS}e0, 4) AS bin_lo,
           round((SELECT lo FROM ext) + (bin + 1) * ((SELECT hi FROM ext) - (SELECT lo FROM ext)) / {_HIST_BINS}e0, 4) AS bin_hi,
           count(*) AS n
    FROM b GROUP BY bin
    """,
)
def histogram_equi_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of the event value column: 20 bins over the
    observed [min, max], each row reporting its bounds and count — the
    profiling primitive behind NDV/selectivity estimation and data-drift
    monitors.

    Two passes, both cheap at scale: a full-scan min/max agg collapses to a
    single broadcast row (crossJoin of a 1-row extent is a broadcast, not a
    shuffle), then the binning pass is pure per-row arithmetic feeding a
    partial-aggregated rollup of exactly 20 groups."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    ext = e.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    nb = F.lit(float(_HIST_BINS))
    # degenerate extent (all values identical): everything lands in bin 0 —
    # guarded in BOTH engines; ANSI Spark raises on the 0-width division and
    # DuckDB's NaN->INT cast would too (found by the oracle-parity fuzzer).
    binned = e.crossJoin(F.broadcast(ext)).select(
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(_HIST_BINS - 1),
                F.floor(
                    (F.col("value") - F.col("lo")) * nb / (F.col("hi") - F.col("lo"))
                ).cast("int"),
            )
        )
        .alias("bin"),
        "lo",
        "hi",
    )
    return binned.groupBy("bin").agg(
        F.round(F.first("lo") + F.col("bin") * (F.first("hi") - F.first("lo")) / nb, 4).alias("bin_lo"),
        F.round(F.first("lo") + (F.col("bin") + 1) * (F.first("hi") - F.first("lo")) / nb, 4).alias("bin_hi"),
        F.count(F.lit(1)).alias("n"),
    ).select("bin", "bin_lo", "bin_hi", "n")


@query(
    "partition_skew_report",
    oracle="""
    WITH per_key AS (
        SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_keys,
           CAST(sum(n) AS BIGINT) AS n_rows,
           max(n) AS max_rows,
           round(avg(n), 4) AS avg_rows,
           round(max(n) * 1e0 / avg(n), 4) AS skew_factor
    FROM per_key
    """,
)
def partition_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew profile for the events/user_id join key: per-key row
    counts reduced to (keys, rows, max, avg, max/avg skew factor) — the
    diagnostic that decides whether a 100 TB join needs salting or AQE skew
    handling BEFORE it runs. A skew_factor near 1 means uniform keys; the
    hot-key regime (factor >> shuffle parallelism) is where an unsalted
    shuffle stalls on one straggler task.

    Two aggregations, both partial-agg collapsed: per-key counts shuffle
    once on user_id; the five-number summary reduces to a single row."""
    per_key = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_rows"),
        F.round(F.avg("n"), 4).alias("avg_rows"),
        F.round(F.max("n") * F.lit(1.0) / F.avg("n"), 4).alias("skew_factor"),
    )


_ATTR_WINDOW_US = 30 * 60 * 1_000_000


@query(
    "multi_touch_attribution",
    oracle=f"""
    WITH clicks AS (
        SELECT event_id AS click_id, user_id, epoch_us(ts) AS t
        FROM events WHERE event_type = 'click'
    ),
    purchases AS (
        SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS t, value
        FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
        SELECT c.click_id, p.purchase_id, p.value,
               count(*) OVER (PARTITION BY p.purchase_id) AS n_touches
        FROM clicks c JOIN purchases p
          ON p.user_id = c.user_id
         AND c.t <= p.t AND c.t > p.t - {_ATTR_WINDOW_US}
    ),
    grouped AS (
        SELECT click_id, n_touches AS k, count(*) AS cnt,
               sum(CAST(round(value*100) AS BIGINT)) AS cents
        FROM touches GROUP BY 1, 2
    )
    SELECT click_id,
           CAST(sum(cnt) AS BIGINT) AS n_purchases,
           list_sum(list(CAST(cnt AS DOUBLE) / CAST(k AS DOUBLE)
                         ORDER BY k)) AS credit,
           list_sum(list(CAST(cents AS DOUBLE) / CAST(100 * k AS DOUBLE)
                         ORDER BY k)) AS attributed_value
    FROM grouped GROUP BY click_id
    """,
)
def multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every click in the 30 minutes before
    a purchase shares that purchase's credit equally (1/n_touches) — the
    marketing-science upgrade over last-touch (asof_click_to_purchase)
    that doesn't crown whichever touch happened to be final. Per click:
    contributing purchases, total credit, and attributed revenue.

    Join shape at scale: clicks x purchases pair only within user_id
    (equi-key) with the time bound as a join-level filter — the same
    bounded-state shape as the streaming click/purchase join; the
    per-purchase touch count is a window over the joined pairs on the
    SAME purchase partitioning, then one rollup per click."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.unix_micros("ts").alias("ct"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.unix_micros("ts").alias("pt"),
        "value",
    )
    touches = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("ct") <= F.col("pt"))
        & (F.col("ct") > F.col("pt") - _ATTR_WINDOW_US),
    )
    w = Window.partitionBy("purchase_id")
    credited = touches.withColumn("n_touches", F.count(F.lit(1)).over(w))
    # Exactness: double partial sums of 1/k and value/k are
    # partition-order-dependent (the trade_flow_matrix divergence class).
    # Instead aggregate EXACT integers per (click, k) — count and value
    # cents — then fold the few distinct-k terms left-to-right in sorted
    # order, the same bit-identical accumulation convention as
    # functions/vectors.py; both engines ship the identical raw double.
    grouped = credited.groupBy("click_id", "n_touches").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"),
    )
    per_click = grouped.groupBy("click_id").agg(
        F.sum("cnt").cast("long").alias("n_purchases"),
        F.sort_array(
            F.collect_list(
                F.struct(F.col("n_touches").alias("k"), "cnt", "cents")
            )
        ).alias("arr"),
    )
    return per_click.select(
        "click_id",
        "n_purchases",
        F.aggregate(
            "arr",
            F.lit(0.0),
            lambda a, x: a + x["cnt"].cast("double") / x["k"].cast("double"),
        ).alias("credit"),
        F.aggregate(
            "arr",
            F.lit(0.0),
            lambda a, x: a
            + x["cents"].cast("double") / (F.lit(100) * x["k"]).cast("double"),
        ).alias("attributed_value"),
    )


@query(
    "wow_type_delta",
    oracle="""
    WITH weekly AS (
        SELECT CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS week,
               event_type, count(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT c.week, c.event_type, c.n,
           p.n AS prev_n,
           c.n - p.n AS delta,
           CAST(c.n - p.n AS DOUBLE) / CAST(p.n AS DOUBLE) AS pct_change
    FROM weekly c JOIN weekly p
      ON p.event_type = c.event_type AND p.week = c.week - 1
    """,
)
def wow_type_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week movement per event type: each (week, type) cell joined
    to its predecessor week, emitting absolute and relative change — the
    mover/decliner report behind every ops dashboard.  Weeks are integer
    epoch-week buckets (timezone-proof).  One partial-aggregated count
    shuffle; the self-join runs on the tiny weekly table.  (lead/lag windows
    express the same thing — the join form is used here so the weekly table
    stays reusable for other deltas.)"""
    e = load_table(spark, sf_dir, "events")
    weekly = (
        e.select(
            (F.unix_micros("ts") / F.lit(604_800_000_000)).cast("long").alias("week"),
            "event_type",
        )
        .groupBy("week", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cur = weekly.alias("c")
    prev = weekly.select(
        (F.col("week") + 1).alias("week"), "event_type", F.col("n").alias("prev_n")
    )
    return (
        cur.join(prev, ["week", "event_type"])
        .select(
            "week", "event_type", "n", "prev_n",
            (F.col("n") - F.col("prev_n")).alias("delta"),
            ((F.col("n") - F.col("prev_n")).cast("double") / F.col("prev_n").cast("double"))
            .alias("pct_change"),
        )
    )


@query(
    "new_vs_returning_daily",
    oracle="""
    WITH act AS (
        SELECT DISTINCT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day, user_id
        FROM events
    ),
    first_day AS (SELECT user_id, min(day) AS d0 FROM act GROUP BY user_id)
    SELECT a.day,
           CAST(sum(CASE WHEN f.d0 = a.day THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
           CAST(sum(CASE WHEN f.d0 < a.day THEN 1 ELSE 0 END) AS BIGINT)
               AS returning_users
    FROM act a JOIN first_day f USING (user_id)
    GROUP BY a.day
    """,
)
def new_vs_returning_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning user split: a user's first active epoch-day
    tags them "new" on that day and "returning" after — the acquisition/
    retention headline metric.  Two shuffles on user_id (the distinct-
    activity set and the first-day aggregate share partitioning; the join
    is co-located), then a tiny per-day rollup."""
    e = load_table(spark, sf_dir, "events")
    act = (
        e.select(
            (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long").alias("day"),
            "user_id",
        )
        .distinct()
    )
    first_day = act.groupBy("user_id").agg(F.min("day").alias("d0"))
    return (
        act.join(first_day, "user_id")
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("d0") == F.col("day"), 1).otherwise(0))
            .cast("long")
            .alias("new_users"),
            F.sum(F.when(F.col("d0") < F.col("day"), 1).otherwise(0))
            .cast("long")
            .alias("returning_users"),
        )
    )


@query(
    "time_to_convert_quantiles",
    oracle="""
    WITH s AS (
        SELECT user_id, min(epoch_us(ts)) AS t0 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS t1
        FROM events e JOIN s USING (user_id)
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s.t0
        GROUP BY e.user_id
    ),
    d AS (
        SELECT CAST(p.t1 - s.t0 AS DOUBLE) / 3600000000.0 AS hours
        FROM p JOIN s USING (user_id)
    )
    SELECT count(*) AS n_converted,
           quantile_cont(hours, 0.5) AS p50_hours,
           quantile_cont(hours, 0.9) AS p90_hours,
           max(hours) AS max_hours
    FROM d
    """,
)
def time_to_convert_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup-to-first-purchase latency distribution: per user, the first
    signup and the first strictly-later purchase, delta in hours, then the
    conversion-latency quantiles product teams actually watch (median /
    p90 / worst).  Two partial-aggregated min()s per user share the
    user_id exchange; the quantile runs over one row per converted user
    (percentile-approx is the swap-in when even that is unbounded)."""
    e = load_table(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("t0"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", F.unix_micros("ts").alias("t"))
        .join(s, "user_id")
        .filter(F.col("t") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t1"), F.any_value("t0").alias("t0"))
    )
    # Quantiles ship RAW: DuckDB quantile_cont and Spark percentile() may
    # interpolate with different FP op order, so an in-engine round(,4) can
    # land a .5e-4-boundary value on different sides across engines. The
    # gate hasher normalizes both raw doubles with the same Python code.
    d = p.select(((F.col("t1") - F.col("t0")).cast("double") / 3.6e9).alias("hours"))
    pct = F.expr("percentile(hours, array(0.5, 0.9))")
    return d.agg(
        F.count(F.lit(1)).alias("n_converted"),
        pct.alias("_p"),
        F.max("hours").alias("max_hours"),
    ).select(
        "n_converted",
        F.col("_p")[0].alias("p50_hours"),
        F.col("_p")[1].alias("p90_hours"),
        "max_hours",
    )


@query(
    "cumulative_users_daily",
    oracle="""
    WITH fd AS (
        SELECT user_id, min(CAST(epoch_us(ts) // 86400000000 AS BIGINT)) AS d0
        FROM events GROUP BY user_id
    ),
    days AS (SELECT DISTINCT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
             FROM events),
    news AS (SELECT d0 AS day, count(*) AS n_new FROM fd GROUP BY d0)
    SELECT d.day,
           CAST(coalesce(n.n_new, 0) AS BIGINT) AS n_new,
           CAST(sum(coalesce(n.n_new, 0)) OVER (ORDER BY d.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS users_to_date
    FROM days d LEFT JOIN news n USING (day)
    """,
)
def cumulative_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day — the growth curve.  The naive form
    (COUNT(DISTINCT user) OVER cumulative window) re-scans every prior day's
    users per day and cannot partial-aggregate; this plan reduces each user
    to their FIRST-seen day (one user_id shuffle), rolls new-user counts per
    day, and takes a running sum over the tiny day spine — exact, and the
    cumulative window touches |days| rows, not |events|."""
    e = load_table(spark, sf_dir, "events")
    day = (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long")
    fd = e.select(day.alias("day"), "user_id").groupBy("user_id").agg(
        F.min("day").alias("d0")
    )
    days = e.select(day.alias("day")).distinct()
    news = fd.groupBy(F.col("d0").alias("day")).agg(F.count(F.lit(1)).alias("n_new"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        days.join(F.broadcast(news), "day", "left")
        .select("day", F.coalesce(F.col("n_new"), F.lit(0)).cast("long").alias("n_new"))
        .withColumn("users_to_date", F.sum("n_new").over(w).cast("long"))
    )


# ---------------------------------------------------------------------------
# Entity resolution end to end (block -> verify -> cluster -> canonicalize)
# ---------------------------------------------------------------------------


@query(
    "entity_resolution_e2e",
    oracle="""
    WITH RECURSIVE nm AS MATERIALIZED (
        SELECT p_name, split_part(p_name, ' ', 2) AS noun,
               min(p_partkey) AS name_key, count(*) AS n_rows
        FROM part GROUP BY 1, 2
    ),
    pairs AS MATERIALIZED (
        SELECT a.name_key AS s, b.name_key AS d
        FROM nm a JOIN nm b ON a.noun = b.noun AND a.name_key < b.name_key
        WHERE levenshtein(a.p_name, b.p_name) <= 2
    ),
    edges AS MATERIALIZED (SELECT s, d FROM pairs UNION SELECT d, s FROM pairs),
    nodes AS (SELECT DISTINCT s AS k FROM edges),
    reach AS (
        SELECT k, k AS label FROM nodes
        UNION
        SELECT e.d AS k, r.label FROM reach r JOIN edges e ON e.s = r.k
    ),
    cl AS MATERIALIZED (SELECT k, min(label) AS cluster_id FROM reach GROUP BY k),
    agg AS (
        SELECT cl.cluster_id, CAST(sum(m.n_rows) AS BIGINT) AS n_members
        FROM cl JOIN nm m ON m.name_key = cl.k
        GROUP BY cl.cluster_id
    )
    SELECT agg.cluster_id, agg.n_members, c.p_name AS canonical_name
    FROM agg JOIN nm c ON c.name_key = agg.cluster_id
    """,
)
def entity_resolution_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end to end — the master-data pipeline in one
    composed plan: collapse raw rows to DISTINCT entity keys first (the
    name string, with min(p_partkey) as its stable numeric key and a kept
    row count), block on a cheap key (the name's noun token), verify
    candidates with Levenshtein <= 2, resolve transitive matches into
    entities via connected components (adaptive union-find /
    pointer-jumping, `operators/dedup.py`), and emit one canonical record
    per entity (the smallest member key's name — a survivorship rule) with
    the total number of RAW rows it absorbs. The oracle replays the whole
    chain including exact graph reachability as a recursive CTE, so
    dedupe, blocking, verification, clustering AND canonical pick are
    value-gated together. Singletons (names with no fuzzy match) are not
    multi-source entities and are excluded by construction.

    Scale: the distinct-first step is THE load-bearing design at 100 TB —
    pairwise verification runs on |distinct names| per block (a few
    hundred strings here; bounded by the entity vocabulary, not the fact
    table), never on raw rows, and raw-row volume re-enters only as a
    pre-aggregated count summed per cluster. A naive raw-row Levenshtein
    self-join on this very schema is ~2.4M comparisons at sf0.1 and grows
    quadratically; the distinct-name graph is ~100 nodes at any SF. CC
    runs on the tiny name graph; the canonical join keys on cluster_id."""
    from datapipeline_ops_spark.operators.dedup import connected_components
    from datapipeline_ops_spark.tables import load_table as _lt

    names = (
        _lt(spark, sf_dir, "part")
        .select(
            "p_partkey",
            "p_name",
            F.split(F.col("p_name"), " ").getItem(1).alias("noun"),
        )
        .groupBy("p_name", "noun")
        .agg(
            F.min("p_partkey").alias("name_key"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    a = names.select(
        F.col("name_key").alias("key_a"), F.col("p_name").alias("name_a"), "noun"
    )
    b = names.select(
        F.col("name_key").alias("key_b"), F.col("p_name").alias("name_b"), "noun"
    )
    pairs = (
        a.join(b, "noun")
        .filter(
            (F.col("key_a") < F.col("key_b"))
            & (F.levenshtein("name_a", "name_b") <= 2)
        )
        .select("key_a", "key_b")
    )
    cc = connected_components(pairs, "key_a", "key_b")
    canon = names.select(
        F.col("name_key").alias("cluster_id"),
        F.col("p_name").alias("canonical_name"),
    )
    return (
        cc.join(names.select("name_key", "n_rows"), cc["node"] == F.col("name_key"))
        .groupBy(F.col("label").alias("cluster_id"))
        .agg(F.sum("n_rows").cast("long").alias("n_members"))
        .join(canon, "cluster_id")
        .select("cluster_id", "n_members", "canonical_name")
    )


# ---------------------------------------------------------------------------
# conversion_ab_ztest
# ---------------------------------------------------------------------------

_AB_Z_CRIT = 1.96
# conversion = a user's purchase total exceeds this floor, in integer CENTS
# (exact cross-engine; a float-sum threshold would be order-sensitive at the
# boundary). ~600 currency units sits at the per-user purchase-total median,
# splitting the synthetic cohort away from 0/100% at every SF.
_AB_VALUE_FLOOR = 60000


@query(
    "conversion_ab_ztest",
    oracle=f"""
    WITH per_user AS MATERIALIZED (
        SELECT user_id, user_id % 2 AS grp,
               max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicked,
               CASE WHEN sum(CASE WHEN event_type = 'purchase'
                                  THEN CAST(round(value * 100) AS BIGINT)
                                  ELSE 0 END) > {_AB_VALUE_FLOOR}
                    THEN 1 ELSE 0 END AS converted
        FROM events GROUP BY 1, 2
    ),
    g AS (
        SELECT CAST(sum(CASE WHEN grp = 0 AND clicked = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN grp = 0 AND clicked = 1 AND converted = 1 THEN 1 ELSE 0 END) AS BIGINT) AS x_a,
               CAST(sum(CASE WHEN grp = 1 AND clicked = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               CAST(sum(CASE WHEN grp = 1 AND clicked = 1 AND converted = 1 THEN 1 ELSE 0 END) AS BIGINT) AS x_b
        FROM per_user
    ),
    p AS (
        SELECT n_a, x_a, n_b, x_b,
               CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p_a,
               CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p_b,
               CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS p_pool,
               (n_a > 0 AND n_b > 0 AND x_a + x_b > 0
                AND x_a + x_b < n_a + n_b) AS ok
        FROM g
    )
    SELECT n_a, x_a, n_b, x_b,
           CASE WHEN n_a > 0 THEN p_a END AS p_a,
           CASE WHEN n_b > 0 THEN p_b END AS p_b,
           CASE WHEN ok THEN
               (p_a - p_b) / sqrt(p_pool * (1 - p_pool)
                   * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
           END AS z,
           CASE WHEN ok THEN
               abs((p_a - p_b) / sqrt(p_pool * (1 - p_pool)
                   * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))))
                   > {_AB_Z_CRIT}
           END AS significant
    FROM p
    """,
)
def conversion_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on click->purchase conversion between the
    even-user and odd-user cohorts (the A/B assignment seam): pooled
    standard error, z statistic, and the alpha=0.05 two-sided verdict —
    the experiment readout that decides whether a pipeline change
    actually moved conversion or just wiggled it.

    Exactness: cohort sizes and conversions are integers from one
    per-user collapse (max-flag aggregation, no distinct explosion); all
    probabilities and the z statistic derive from those four integers in
    one fixed op order — bit-identical cross-engine, so even the
    significance BOOLEAN is exact.

    Scale: one shuffle on user_id to collapse events to per-user flags
    (partial max map-side), then a single 4-counter aggregate; the test
    itself is O(1)."""
    per_user = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", (F.col("user_id") % 2).alias("grp"))
        .agg(
            F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
                "clicked"
            ),
            F.when(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.round(F.col("value") * 100).cast("long"),
                    ).otherwise(F.lit(0).cast("long"))
                )
                > _AB_VALUE_FLOOR,
                1,
            )
            .otherwise(0)
            .alias("converted"),
        )
    )
    g = per_user.agg(
        F.sum(F.when((F.col("grp") == 0) & (F.col("clicked") == 1), 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(
            F.when(
                (F.col("grp") == 0) & (F.col("clicked") == 1) & (F.col("converted") == 1),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("x_a"),
        F.sum(F.when((F.col("grp") == 1) & (F.col("clicked") == 1), 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.sum(
            F.when(
                (F.col("grp") == 1) & (F.col("clicked") == 1) & (F.col("converted") == 1),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("x_b"),
    )
    p_a = F.col("x_a").cast("double") / F.col("n_a").cast("double")
    p_b = F.col("x_b").cast("double") / F.col("n_b").cast("double")
    p_pool = (F.col("x_a") + F.col("x_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    # guard the degenerate cohorts (empty group, all-convert, none-convert):
    # the z denominator is 0 there and ANSI mode raises — mirror the
    # oracle's CASE, which short-circuits per row in both engines
    ok = (
        (F.col("n_a") > 0)
        & (F.col("n_b") > 0)
        & (F.col("x_a") + F.col("x_b") > 0)
        & (F.col("x_a") + F.col("x_b") < F.col("n_a") + F.col("n_b"))
    )
    z = F.when(
        ok,
        (p_a - p_b)
        / F.sqrt(
            p_pool
            * (1 - p_pool)
            * (
                F.lit(1.0) / F.col("n_a").cast("double")
                + F.lit(1.0) / F.col("n_b").cast("double")
            )
        ),
    )
    return g.select(
        "n_a",
        "x_a",
        "n_b",
        "x_b",
        F.when(F.col("n_a") > 0, p_a).alias("p_a"),
        F.when(F.col("n_b") > 0, p_b).alias("p_b"),
        z.alias("z"),
        F.when(ok, F.abs(z) > _AB_Z_CRIT).alias("significant"),
    )


# ---------------------------------------------------------------------------
# markov_next_event_accuracy
# ---------------------------------------------------------------------------


@query(
    "markov_next_event_accuracy",
    oracle="""
    WITH s AS MATERIALIZED (
        SELECT event_type AS cur,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id) AS nxt
        FROM events
    ),
    trans AS MATERIALIZED (
        SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n
        FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2
    ),
    pred AS (
        SELECT cur, nxt AS predicted_next FROM (
            SELECT cur, nxt,
                   row_number() OVER (PARTITION BY cur ORDER BY n DESC, nxt) AS rn
            FROM trans
        ) WHERE rn = 1
    )
    SELECT t.cur AS event_type, p.predicted_next,
           CAST(sum(t.n) AS BIGINT) AS n_transitions,
           CAST(sum(CASE WHEN t.nxt = p.predicted_next THEN t.n ELSE 0 END)
                AS BIGINT) AS n_hits,
           CAST(sum(CASE WHEN t.nxt = p.predicted_next THEN t.n ELSE 0 END)
                AS DOUBLE) / CAST(sum(t.n) AS DOUBLE) AS accuracy
    FROM trans t JOIN pred p ON p.cur = t.cur
    GROUP BY 1, 2
    """,
)
def markov_next_event_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov next-event prediction, evaluated in-sample: the
    transition matrix from per-user event sequences (lead over the
    user-time order), the argmax next-state per current state (tie-break
    lexicographic), and the accuracy that prediction achieves — the
    baseline every sequence model (session-based recommender, next-action
    predictor) must beat, and the eval harness it must beat it ON.

    Exactness: transitions and hits are integer counts; accuracy is one
    int/int division per state.

    Scale: one shuffle on user_id for the lead window (raw-event window,
    partitioned by user — bounded per-partition state), then all work runs
    on the |states|² transition matrix; the argmax is a window over that
    tiny frame and the eval join is states-sized."""
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), F.asc("event_id"))
    s = (
        load_table(spark, sf_dir, "events")
        .select(
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("nxt"),
        )
        .filter(F.col("nxt").isNotNull())
    )
    trans = s.groupBy("cur", "nxt").agg(F.count(F.lit(1)).cast("long").alias("n"))
    w_pred = Window.partitionBy("cur").orderBy(F.desc("n"), F.asc("nxt"))
    pred = (
        trans.withColumn("rn", F.row_number().over(w_pred))
        .filter(F.col("rn") == 1)
        .select("cur", F.col("nxt").alias("predicted_next"))
    )
    return (
        trans.join(pred, "cur")
        .groupBy(F.col("cur").alias("event_type"), "predicted_next")
        .agg(
            F.sum("n").cast("long").alias("n_transitions"),
            F.sum(F.when(F.col("nxt") == F.col("predicted_next"), F.col("n")).otherwise(0))
            .cast("long")
            .alias("n_hits"),
        )
        .withColumn(
            "accuracy",
            F.col("n_hits").cast("double") / F.col("n_transitions").cast("double"),
        )
    )


# ---------------------------------------------------------------------------
# power_sample_size_calc
# ---------------------------------------------------------------------------

_PW_Z_ALPHA = 1.959963984540054  # two-sided alpha = 0.05
_PW_Z_BETA = 0.8416212335729143  # power = 0.80


@query(
    "power_sample_size_calc",
    oracle=f"""
    WITH per_user AS MATERIALIZED (
        SELECT user_id, user_id % 2 AS grp,
               max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicked,
               CASE WHEN sum(CASE WHEN event_type = 'purchase'
                                  THEN CAST(round(value * 100) AS BIGINT)
                                  ELSE 0 END) > {_AB_VALUE_FLOOR}
                    THEN 1 ELSE 0 END AS converted
        FROM events GROUP BY 1, 2
    ),
    g AS (
        SELECT CAST(sum(CASE WHEN grp = 0 AND clicked = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN grp = 0 AND clicked = 1 AND converted = 1 THEN 1 ELSE 0 END) AS BIGINT) AS x_a,
               CAST(sum(CASE WHEN grp = 1 AND clicked = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
               CAST(sum(CASE WHEN grp = 1 AND clicked = 1 AND converted = 1 THEN 1 ELSE 0 END) AS BIGINT) AS x_b
        FROM per_user
    ),
    p AS (
        SELECT n_a, x_a, n_b, x_b,
               CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p_a,
               CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p_b,
               CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS p_pool,
               (n_a > 0 AND n_b > 0 AND x_a > 0 AND x_b > 0
                AND x_a < n_a AND x_b < n_b
                AND CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                    <> CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE)) AS ok
        FROM g
    )
    SELECT n_a, n_b,
           CASE WHEN n_a > 0 THEN p_a END AS p_a,
           CASE WHEN n_b > 0 THEN p_b END AS p_b,
           CASE WHEN ok THEN abs(p_a - p_b) END AS mde,
           CASE WHEN ok THEN
               CAST(ceil(
                   ({_PW_Z_ALPHA} * sqrt(2 * p_pool * (1 - p_pool))
                    + {_PW_Z_BETA} * sqrt(p_a * (1 - p_a) + p_b * (1 - p_b)))
                   * ({_PW_Z_ALPHA} * sqrt(2 * p_pool * (1 - p_pool))
                      + {_PW_Z_BETA} * sqrt(p_a * (1 - p_a) + p_b * (1 - p_b)))
                   / ((p_a - p_b) * (p_a - p_b))) AS BIGINT)
           END AS n_per_arm,
           CASE WHEN ok THEN
               least(n_a, n_b) >= CAST(ceil(
                   ({_PW_Z_ALPHA} * sqrt(2 * p_pool * (1 - p_pool))
                    + {_PW_Z_BETA} * sqrt(p_a * (1 - p_a) + p_b * (1 - p_b)))
                   * ({_PW_Z_ALPHA} * sqrt(2 * p_pool * (1 - p_pool))
                      + {_PW_Z_BETA} * sqrt(p_a * (1 - p_a) + p_b * (1 - p_b)))
                   / ((p_a - p_b) * (p_a - p_b))) AS BIGINT)
           END AS powered
    FROM p
    """,
)
def power_sample_size_calc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power analysis on the observed conversion cohorts (the
    design-side companion to conversion_ab_ztest): treating the observed
    |p_a - p_b| as the minimum detectable effect, the required sample size
    per arm for 80% power at two-sided alpha=0.05 —
    n = (z_a·sqrt(2·p̄(1-p̄)) + z_b·sqrt(p_a(1-p_a)+p_b(1-p_b)))² / (p_a-p_b)²
    — and whether the CURRENT cohorts already clear it. This is the 'how
    long must the experiment run' number, computed where the data lives
    instead of in a spreadsheet.

    Exactness: all inputs are the same four cohort integers as the z-test,
    pushed through one fixed float op order (z constants are literals);
    guarded NULL on degenerate cohorts, mirroring the oracle's CASE.

    Scale: identical to the z-test — one per-user collapse, then O(1)."""
    per_user = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", (F.col("user_id") % 2).alias("grp"))
        .agg(
            F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
                "clicked"
            ),
            F.when(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.round(F.col("value") * 100).cast("long"),
                    ).otherwise(F.lit(0).cast("long"))
                )
                > _AB_VALUE_FLOOR,
                1,
            )
            .otherwise(0)
            .alias("converted"),
        )
    )
    g = per_user.agg(
        F.sum(F.when((F.col("grp") == 0) & (F.col("clicked") == 1), 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(
            F.when(
                (F.col("grp") == 0) & (F.col("clicked") == 1) & (F.col("converted") == 1),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("x_a"),
        F.sum(F.when((F.col("grp") == 1) & (F.col("clicked") == 1), 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.sum(
            F.when(
                (F.col("grp") == 1) & (F.col("clicked") == 1) & (F.col("converted") == 1),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("x_b"),
    )
    p_a = F.col("x_a").cast("double") / F.col("n_a").cast("double")
    p_b = F.col("x_b").cast("double") / F.col("n_b").cast("double")
    p_pool = (F.col("x_a") + F.col("x_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    ok = (
        (F.col("n_a") > 0)
        & (F.col("n_b") > 0)
        & (F.col("x_a") > 0)
        & (F.col("x_b") > 0)
        & (F.col("x_a") < F.col("n_a"))
        & (F.col("x_b") < F.col("n_b"))
        & (p_a != p_b)
    )
    se_term = F.lit(_PW_Z_ALPHA) * F.sqrt(
        F.lit(2.0) * p_pool * (1 - p_pool)
    ) + F.lit(_PW_Z_BETA) * F.sqrt(p_a * (1 - p_a) + p_b * (1 - p_b))
    n_req = F.ceil(se_term * se_term / ((p_a - p_b) * (p_a - p_b))).cast("long")
    return g.select(
        "n_a",
        "n_b",
        F.when(F.col("n_a") > 0, p_a).alias("p_a"),
        F.when(F.col("n_b") > 0, p_b).alias("p_b"),
        F.when(ok, F.abs(p_a - p_b)).alias("mde"),
        F.when(ok, n_req).alias("n_per_arm"),
        F.when(ok, F.least("n_a", "n_b") >= n_req).alias("powered"),
    )


# ---------------------------------------------------------------------------
# event_trigram_funnels
# ---------------------------------------------------------------------------

_TRI_TOP = 20


@query(
    "event_trigram_funnels",
    oracle=f"""
    WITH s AS MATERIALIZED (
        SELECT event_type AS a, epoch_us(ts) AS t,
               lead(event_type) OVER w AS b, lead(epoch_us(ts)) OVER w AS tb,
               lead(event_type, 2) OVER w AS c, lead(epoch_us(ts), 2) OVER w AS tc
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    )
    SELECT a || '->' || b || '->' || c AS path,
           CAST(count(*) AS BIGINT) AS n_paths
    FROM s
    WHERE c IS NOT NULL AND tb - t <= {SESSION_GAP_US}
          AND tc - tb <= {SESSION_GAP_US}
    GROUP BY 1
    ORDER BY n_paths DESC, path LIMIT {_TRI_TOP}
    """,
)
def event_trigram_funnels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_TRI_TOP} three-step user journeys (event-type trigrams with
    both hops inside the 30-minute session gap) — the funnel-discovery
    view one step deeper than event_bigram_paths: where bigrams say what
    follows a click, trigrams say which PATHS dominate (the Sankey diagram
    feed, and the sequences a next-action model trains on).

    Scale: one shuffle on user_id serves both leads (same window spec);
    counting collapses to |types|^3 paths map-side; the ranking is
    TakeOrdered over that bounded path table."""
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), F.asc("event_id"))
    t = F.unix_micros("ts")
    s = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("a"),
        t.alias("t"),
        F.lead("event_type").over(w).alias("b"),
        F.lead(t).over(w).alias("tb"),
        F.lead("event_type", 2).over(w).alias("c"),
        F.lead(t, 2).over(w).alias("tc"),
    )
    return (
        s.filter(
            F.col("c").isNotNull()
            & (F.col("tb") - F.col("t") <= SESSION_GAP_US)
            & (F.col("tc") - F.col("tb") <= SESSION_GAP_US)
        )
        .groupBy(
            F.concat_ws("->", "a", "b", "c").alias("path")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
        .orderBy(F.desc("n_paths"), F.asc("path"))
        .limit(_TRI_TOP)
    )


# ---------------------------------------------------------------------------
# daily_anomaly_mad
# ---------------------------------------------------------------------------

_MAD_K = 1.4826  # consistency constant: MAD * 1.4826 ~ sigma for normal data
_MAD_THRESH = 3.0


@query(
    "daily_anomaly_mad",
    oracle=f"""
    WITH daily AS MATERIALIZED (
        SELECT event_type, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    ranked AS MATERIALIZED (
        SELECT event_type, day, n,
               row_number() OVER (PARTITION BY event_type ORDER BY n, day) AS rn,
               count(*) OVER (PARTITION BY event_type) AS m
        FROM daily
    ),
    med AS MATERIALIZED (
        SELECT event_type, avg(n) AS med FROM ranked
        WHERE rn = (m + 1) // 2 OR rn = m // 2 + 1
        GROUP BY event_type
    ),
    dev AS MATERIALIZED (
        SELECT d.event_type, d.day, d.n, m.med, abs(d.n - m.med) AS ad,
               row_number() OVER (PARTITION BY d.event_type
                                  ORDER BY abs(d.n - m.med), d.day) AS rn,
               count(*) OVER (PARTITION BY d.event_type) AS m2
        FROM daily d JOIN med m ON m.event_type = d.event_type
    ),
    mad AS MATERIALIZED (
        SELECT event_type, avg(ad) AS mad FROM dev
        WHERE rn = (m2 + 1) // 2 OR rn = m2 // 2 + 1
        GROUP BY event_type
    )
    SELECT d.event_type, d.day, d.n, d.med, m.mad,
           CASE WHEN m.mad > 0
                THEN (d.n - d.med) / ({_MAD_K} * m.mad) END AS robust_z,
           CASE WHEN m.mad > 0
                THEN abs((d.n - d.med) / ({_MAD_K} * m.mad)) > {_MAD_THRESH}
           END AS anomalous
    FROM (SELECT DISTINCT event_type, day, n, med, ad FROM dev) d
    JOIN mad m ON m.event_type = d.event_type
    """,
)
def daily_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust volume-anomaly monitor: daily counts per stream scored by
    MEDIAN and MAD instead of mean/stddev (daily_anomaly_zscore's twin) —
    the estimator that still flags the right day when the baseline window
    itself contains the outage, because one broken day shifts a mean but
    not a median. robust_z = (n - median) / (1.4826 * MAD), flagged at
    |z| > {_MAD_THRESH}.

    Exactness: both medians come from explicit rank selection over integer
    counts (even case averages two values — one commutative add), so med
    and MAD are exact dyadic values; the z division is one fixed-order op;
    mad == 0 degrades to NULL identically in both engines.

    Scale: everything after the daily partial-agg rollup runs on the
    |streams| x |days| matrix; the rank windows partition by stream."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )

    def _median(df: DataFrame, val: str, extra_order: str, out: str) -> DataFrame:
        w_r = Window.partitionBy("event_type").orderBy(F.asc(val), F.asc(extra_order))
        w_c = Window.partitionBy("event_type")
        r = df.withColumn("rn", F.row_number().over(w_r)).withColumn(
            "m", F.count(F.lit(1)).over(w_c)
        )
        lo = F.floor((F.col("m") + 1) / 2).cast("long")
        hi = F.floor(F.col("m") / 2).cast("long") + 1
        return (
            r.filter((F.col("rn") == lo) | (F.col("rn") == hi))
            .groupBy("event_type")
            .agg(F.avg(val).alias(out))
        )

    med = _median(daily, "n", "day", "med")
    dev = daily.join(med, "event_type").withColumn(
        "ad", F.abs(F.col("n") - F.col("med"))
    )
    mad = _median(dev, "ad", "day", "mad")
    rz = F.when(
        F.col("mad") > 0,
        (F.col("n") - F.col("med")) / (F.lit(_MAD_K) * F.col("mad")),
    )
    return (
        dev.join(mad, "event_type")
        .select(
            "event_type",
            "day",
            "n",
            "med",
            "mad",
            rz.alias("robust_z"),
            F.when(F.col("mad") > 0, F.abs(rz) > _MAD_THRESH).alias("anomalous"),
        )
    )


# ---------------------------------------------------------------------------
# simpsons_paradox_check
# ---------------------------------------------------------------------------

_SPX_PRICE = 250_000


@query(
    "simpsons_paradox_check",
    oracle=f"""
    WITH j AS MATERIALIZED (
        SELECT c.c_mktsegment AS segment,
               CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS treat,
               CASE WHEN o.o_totalprice > {_SPX_PRICE} THEN 1 ELSE 0 END AS y
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    seg AS MATERIALIZED (
        SELECT segment,
               CAST(sum(treat) AS BIGINT) AS n_t,
               CAST(sum(treat * y) AS BIGINT) AS x_t,
               CAST(sum(1 - treat) AS BIGINT) AS n_c,
               CAST(sum((1 - treat) * y) AS BIGINT) AS x_c
        FROM j GROUP BY segment
    ),
    pooled AS (
        SELECT CAST(sum(n_t) AS BIGINT) AS n_t, CAST(sum(x_t) AS BIGINT) AS x_t,
               CAST(sum(n_c) AS BIGINT) AS n_c, CAST(sum(x_c) AS BIGINT) AS x_c
        FROM seg
    )
    SELECT s.segment, s.n_t, s.x_t, s.n_c, s.x_c,
           CASE WHEN s.n_t > 0 AND s.n_c > 0
                THEN CAST(s.x_t AS DOUBLE) / CAST(s.n_t AS DOUBLE)
                     - CAST(s.x_c AS DOUBLE) / CAST(s.n_c AS DOUBLE)
                ELSE NULL END AS seg_effect,
           CASE WHEN p.n_t > 0 AND p.n_c > 0
                THEN CAST(p.x_t AS DOUBLE) / CAST(p.n_t AS DOUBLE)
                     - CAST(p.x_c AS DOUBLE) / CAST(p.n_c AS DOUBLE)
                ELSE NULL END AS pooled_effect,
           (s.x_t * s.n_c > s.x_c * s.n_t) <> (p.x_t * p.n_c > p.x_c * p.n_t)
               AS sign_flip
    FROM seg s CROSS JOIN pooled p
    """,
)
def simpsons_paradox_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox screen: the treatment effect (urgent-priority ->
    high-value-order rate) per customer segment next to the POOLED effect,
    with a sign-flip flag per segment — the aggregation trap every
    segmented metrics report should test for before anyone acts on the
    pooled number. The sign comparison is integer CROSS-MULTIPLICATION
    (x_t·n_c vs x_c·n_t), so the flip verdict is exact even when the
    effects are tiny; the effect sizes ride along as fixed-order ratios.

    Scale: one fact-dim equi-join (customer broadcast-eligible), one
    partial-agg collapse to |segments| rows, and a 1-row pooled rollup
    crossed back — nothing after the join exceeds the segment count."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("treat"),
        F.when(F.col("o_totalprice") > _SPX_PRICE, 1).otherwise(0).alias("y"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    j = o.join(c, o["o_custkey"] == c["c_custkey"]).select("segment", "treat", "y")
    seg = j.groupBy("segment").agg(
        F.sum("treat").cast("long").alias("n_t"),
        F.sum(F.col("treat") * F.col("y")).cast("long").alias("x_t"),
        F.sum(1 - F.col("treat")).cast("long").alias("n_c"),
        F.sum((1 - F.col("treat")) * F.col("y")).cast("long").alias("x_c"),
    )
    pooled = seg.agg(
        F.sum("n_t").cast("long").alias("p_n_t"),
        F.sum("x_t").cast("long").alias("p_x_t"),
        F.sum("n_c").cast("long").alias("p_n_c"),
        F.sum("x_c").cast("long").alias("p_x_c"),
    )
    # a one-sided segment (no treated or no control orders) zeroes a rate
    # denominator — ANSI Spark raises where DuckDB doesn't; NULL-guard the
    # EFFECTS in both engines (caught by the oracle-parity fuzzer, round 9).
    # The integer cross-multiplied sign_flip needs no guard.
    seg_eff = F.when(
        (F.col("n_t") > 0) & (F.col("n_c") > 0),
        F.col("x_t").cast("double") / F.col("n_t").cast("double")
        - F.col("x_c").cast("double") / F.col("n_c").cast("double"),
    )
    pool_eff = F.when(
        (F.col("p_n_t") > 0) & (F.col("p_n_c") > 0),
        F.col("p_x_t").cast("double") / F.col("p_n_t").cast("double")
        - F.col("p_x_c").cast("double") / F.col("p_n_c").cast("double"),
    )
    flip = (F.col("x_t") * F.col("n_c") > F.col("x_c") * F.col("n_t")) != (
        F.col("p_x_t") * F.col("p_n_c") > F.col("p_x_c") * F.col("p_n_t")
    )
    return (
        seg.crossJoin(F.broadcast(pooled))
        .select(
            "segment",
            "n_t",
            "x_t",
            "n_c",
            "x_c",
            seg_eff.alias("seg_effect"),
            pool_eff.alias("pooled_effect"),
            flip.alias("sign_flip"),
        )
    )


# ---------------------------------------------------------------------------
# session_gap_sensitivity
# ---------------------------------------------------------------------------

_SGS_GAPS_MIN = (15, 30, 60)


@query(
    "session_gap_sensitivity",
    oracle=f"""
    WITH gaps AS MATERIALIZED (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                   AS gap_us
        FROM events
    )
    SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(DISTINCT user_id)
                + sum(CASE WHEN gap_us > {_SGS_GAPS_MIN[0] * 60_000_000} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sessions_15m,
           CAST(count(DISTINCT user_id)
                + sum(CASE WHEN gap_us > {_SGS_GAPS_MIN[1] * 60_000_000} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sessions_30m,
           CAST(count(DISTINCT user_id)
                + sum(CASE WHEN gap_us > {_SGS_GAPS_MIN[2] * 60_000_000} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sessions_60m
    FROM gaps
    """,
)
def session_gap_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization parameter sensitivity: total session counts under 15 /
    30 / 60-minute inactivity gaps, from ONE lag pass (a session starts at
    each user's first event plus at every gap exceeding the threshold, so
    all three thresholds are conditional sums over the same gap column) —
    the analysis that justifies (or indicts) the 30-minute default before
    every downstream metric inherits it. A metric that moves 2x between 15
    and 60 minutes is a parameter artifact, not a product change.

    Scale: one shuffle on user_id for the lag window; the three counters
    ride the same pass (no re-scan per threshold). Integer microsecond
    arithmetic throughout — the repo's epoch convention."""
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), F.asc("event_id"))
    gaps = load_table(spark, sf_dir, "events").select(
        "user_id",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap_us"),
    )
    aggs = [F.count_distinct("user_id").cast("long").alias("n_users")]
    for g in _SGS_GAPS_MIN:
        aggs.append(
            (
                F.count_distinct("user_id")
                + F.sum(
                    F.when(F.col("gap_us") > g * 60_000_000, 1).otherwise(0)
                )
            )
            .cast("long")
            .alias(f"n_sessions_{g}m")
        )
    return gaps.agg(*aggs)
