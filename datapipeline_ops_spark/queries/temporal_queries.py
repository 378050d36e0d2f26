"""As-of and range join queries over the events stream table.

The reference has no temporal joins (SURVEY.md §2.2: no as-of/interval
joins anywhere); these are the custom operators the brief calls out, built
as pure DataFrame compositions (operators/temporal.py) and value-checked
against DuckDB's correlated-subquery formulations.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.operators.temporal import asof_join, range_join_buckets
from datapipeline_ops_spark.tables import load_table, local_frame

# non-uniform value bands for the range join (widths 10..150)
BANDS = [
    (0.0, 10.0, "micro"),
    (10.0, 25.0, "small"),
    (25.0, 50.0, "medium"),
    (50.0, 100.0, "large"),
    (100.0, 250.0, "xlarge"),
    (250.0, 500.0, "huge"),
]
_BANDS_SQL = ", ".join(f"({lo}, {hi}, '{name}')" for lo, hi, name in BANDS)


@query(
    "asof_click_to_purchase",
    oracle="""
    SELECT l.event_id, l.user_id,
           r.event_id AS purchase_event, round(r.value, 4) AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    LEFT JOIN LATERAL (
        SELECT event_id, value FROM events r
        WHERE r.event_type = 'purchase' AND r.user_id = l.user_id
          AND epoch_us(r.ts) <= epoch_us(l.ts)
        ORDER BY epoch_us(r.ts) DESC, event_id DESC LIMIT 1
    ) r ON true
    """,
)
def asof_click_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every click matched to the user's most recent prior (or
    same-instant) purchase. Union+window construction — one shuffle on
    user_id; the oracle is DuckDB's correlated LATERAL formulation with the
    identical (ts, event_id) tiebreak."""
    e = load_table(spark, sf_dir, "events").withColumn("_t", F.unix_micros("ts"))
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "_t", "event_id"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "_t", "event_id", "value"
    )
    out = asof_join(
        clicks,
        purchases,
        on="user_id",
        time_col="_t",
        tiebreak_col="event_id",
        right_payload=["event_id", "value"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("_match.event_id").alias("purchase_event"),
        F.round(F.col("_match.value"), 4).alias("purchase_value"),
    )


@query(
    "range_join_value_bands",
    oracle=f"""
    WITH bands(lo, hi, band) AS (VALUES {_BANDS_SQL})
    SELECT band, count(*) AS n_events,
           round(sum(CAST(round(value*100) AS BIGINT)) / 100.0, 4) AS total_value
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY band
    """,
)
def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-uniform range join (value ∈ [lo, hi) bands) via bucket expansion
    + equi-join + residual filter — work scales with rows + total band
    width, never rows × bands. Oracle is the plain theta join."""
    e = load_table(spark, sf_dir, "events")
    bands = local_frame(e.sparkSession, BANDS, "lo double, hi double, band string")
    joined = range_join_buckets(e, "value", bands, "lo", "hi", bucket_width=25.0)
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0, 4
        ).alias("total_value"),
    )


@query(
    "scd2_user_state",
    oracle="""
    WITH s AS (
        SELECT user_id, event_type, epoch_us(ts) AS t, event_id,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn,
               row_number() OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY epoch_us(ts), event_id) AS rns
        FROM events
    ),
    i AS (
        SELECT user_id, event_type AS state, rn - rns AS grp,
               min(t) AS valid_from, count(*) AS n_events
        FROM s GROUP BY user_id, event_type, rn - rns
    )
    SELECT user_id, state, valid_from,
           lead(valid_from) OVER (
               PARTITION BY user_id ORDER BY valid_from, state) AS valid_to,
           n_events,
           lead(valid_from) OVER (
               PARTITION BY user_id ORDER BY valid_from, state) IS NULL AS is_current
    FROM i
    """,
)
def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build from an event log: collapse each user's
    consecutive runs of the same event_type into validity intervals
    [valid_from, valid_to) in epoch micros, open-ended (is_current) on the
    last run — the standard warehouse pattern for turning CDC/event streams
    into slowly-changing dimensions (the reference has no temporal
    versioning; SURVEY.md §2.2).

    Gaps-and-islands via the rn − rn_per_state difference; all three window
    passes share the user_id partition key, so the whole build is ONE
    shuffle on user_id — at 100 TB the dimension key (not time) carries the
    partitioning and no global sort exists anywhere."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("t"), "event_id"
    )
    w_user = Window.partitionBy("user_id").orderBy("t", "event_id")
    w_state = Window.partitionBy("user_id", "event_type").orderBy("t", "event_id")
    runs = e.select(
        "user_id",
        F.col("event_type").alias("state"),
        "t",
        (F.row_number().over(w_user) - F.row_number().over(w_state)).alias("grp"),
    )
    islands = runs.groupBy("user_id", "state", "grp").agg(
        F.min("t").alias("valid_from"), F.count(F.lit(1)).alias("n_events")
    )
    w_seq = Window.partitionBy("user_id").orderBy("valid_from", "state")
    nxt = F.lead("valid_from").over(w_seq)
    return islands.select(
        "user_id",
        "state",
        "valid_from",
        nxt.alias("valid_to"),
        "n_events",
        nxt.isNull().alias("is_current"),
    )


@query(
    "ohlc_time_bars",
    oracle="""
    WITH e AS (
        SELECT event_type, value, event_id,
               epoch_us(ts) // 3600000000 AS hour,
               row_number() OVER (PARTITION BY event_type, epoch_us(ts) // 3600000000
                                  ORDER BY epoch_us(ts), event_id) AS rna,
               row_number() OVER (PARTITION BY event_type, epoch_us(ts) // 3600000000
                                  ORDER BY epoch_us(ts) DESC, event_id DESC) AS rnd
        FROM events WHERE value IS NOT NULL
    )
    SELECT event_type, CAST(hour * 3600 AS BIGINT) AS bar_start,
           round(max(CASE WHEN rna = 1 THEN value END), 6) AS open,
           round(max(value), 6) AS high,
           round(min(value), 6) AS low,
           round(max(CASE WHEN rnd = 1 THEN value END), 6) AS close,
           count(*) AS n_events
    FROM e GROUP BY event_type, hour
    """,
)
def ohlc_time_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time-bucket rollup: 1-hour OHLC (open/high/low/
    close) bars of the event value stream per event_type — the continuous-
    aggregate shape time-series stores precompute for dashboards, built
    from plain windows + one rollup.

    Open/close are first/last by (ts, event_id) — deterministic under ts
    ties. Both row_number passes and the final groupBy share ONE
    (event_type, hour) exchange; at 100 TB the bar table is |types|×|hours|
    rows, and incremental maintenance is per-arriving-bucket (append-only
    event time means closed bars never change — the same property the
    streaming watermark queries exploit)."""
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            "value",
            "event_id",
            F.unix_micros("ts").alias("t"),
            (F.unix_micros("ts") / F.lit(3_600_000_000)).cast("long").alias("hour"),
        )
    )
    wa = Window.partitionBy("event_type", "hour").orderBy(F.asc("t"), F.asc("event_id"))
    wd = Window.partitionBy("event_type", "hour").orderBy(F.desc("t"), F.desc("event_id"))
    marked = e.withColumn("rna", F.row_number().over(wa)).withColumn(
        "rnd", F.row_number().over(wd)
    )
    return marked.groupBy("event_type", "hour").agg(
        F.round(F.max(F.when(F.col("rna") == 1, F.col("value"))), 6).alias("open"),
        F.round(F.max("value"), 6).alias("high"),
        F.round(F.min("value"), 6).alias("low"),
        F.round(F.max(F.when(F.col("rnd") == 1, F.col("value"))), 6).alias("close"),
        F.count(F.lit(1)).alias("n_events"),
    ).select(
        "event_type",
        (F.col("hour") * 3600).cast("long").alias("bar_start"),
        "open",
        "high",
        "low",
        "close",
        "n_events",
    )


@query(
    "pit_state_at_order",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey,
           s.event_type AS state_at_order,
           s.event_id AS state_event
    FROM orders o
    LEFT JOIN LATERAL (
        SELECT event_type, event_id FROM events e
        WHERE e.user_id = o.o_custkey
          AND epoch_us(e.ts) <= epoch(CAST(o.o_orderdate AS TIMESTAMP)) * 1000000
        ORDER BY epoch_us(e.ts) DESC, event_id DESC LIMIT 1
    ) s ON true
    """,
)
def pit_state_at_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature join (the feature-store correctness pattern):
    each order looks up the customer's event state AS OF the order date —
    the last event at-or-before that instant, never a later one (lookahead
    leakage is THE bug PIT joins exist to prevent in training-data
    assembly). Cross-table: probes come from orders, history from events.

    Same union+window machinery as the as-of join — state rows and probe
    rows union on (user, t), one window pass carries the last state
    forward, probe rows keep the carried value. ONE exchange on user id;
    no range join, no per-probe scan. At 100 TB this is how feature
    snapshots attach to billions of training examples."""
    e = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid"),
        F.unix_micros("ts").alias("t"),
        F.col("event_type").alias("state"),
        "event_id",
        F.lit(1).alias("is_state"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("uid"),
        (F.col("o_orderdate").cast("timestamp").cast("long") * 1_000_000).alias("t"),
        F.lit(None).cast("string").alias("state"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(0).alias("is_state"),
        "o_orderkey",
    )
    u = e.withColumn("o_orderkey", F.lit(None).cast("long")).unionByName(o)
    # states sort BEFORE probes at the same instant (at-or-before semantics);
    # among same-instant states the largest event_id wins, matching the
    # oracle's ORDER BY t DESC, event_id DESC LIMIT 1
    w = (
        Window.partitionBy("uid")
        .orderBy(F.asc("t"), F.desc("is_state"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "uid",
        "o_orderkey",
        "is_state",
        F.last("state", ignorenulls=True).over(w).alias("state_at_order"),
        F.last("event_id", ignorenulls=True).over(w).alias("state_event"),
    )
    return carried.filter(F.col("is_state") == 0).select(
        "o_orderkey",
        F.col("uid").alias("o_custkey"),
        "state_at_order",
        "state_event",
    )


@query(
    "twap_per_user",
    oracle="""
    WITH seq AS (
        SELECT user_id, value, epoch_us(ts) AS t,
               lead(epoch_us(ts)) OVER w AS nxt
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    )
    SELECT user_id,
           count(*) AS n_intervals,
           CASE WHEN sum(nxt - t) > 0
                THEN CAST(sum(CAST(round(value*100) AS BIGINT) * (nxt - t))
                          AS DOUBLE)
                     / (100.0 * CAST(sum(nxt - t) AS DOUBLE))
                ELSE NULL END AS twap
    FROM seq WHERE nxt IS NOT NULL
    GROUP BY user_id
    """,
)
def twap_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user: each observation is weighted by
    how long it was the latest one (interval to the next event), the
    standard TWAP/state-duration aggregate for irregularly sampled signals
    (a plain avg over-weights bursts).  One hash exchange on user_id serves
    both the lead() window and the final aggregation; interval arithmetic
    stays on integer microseconds so both engines weight identically."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    seq = e.select(
        "user_id",
        "value",
        F.unix_micros("ts").alias("t"),
        F.lead(F.unix_micros("ts")).over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    # exact integer cents x microseconds keeps the weighted sum
    # order-independent; a user whose events all share one timestamp has
    # total duration 0 — ANSI Spark raises on the division where DuckDB
    # doesn't, so NULL-guard both engines (oracle-parity fuzzer, round 9)
    dt = F.col("nxt") - F.col("t")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return (
        seq.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum(cents * dt).alias("_w"),
            F.sum(dt).alias("_d"),
        )
        .select(
            "user_id",
            "n_intervals",
            F.when(
                F.col("_d") > 0,
                F.col("_w").cast("double") / (100.0 * F.col("_d").cast("double")),
            ).alias("twap"),
        )
    )
