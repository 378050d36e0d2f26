"""Event-time streaming queries, drained to completion and value-checked
against DuckDB batch oracles.

Each query runs the REAL streaming machinery — file-manifest source,
watermark tracking, streaming state store, window operators — with
``trigger(availableNow=True)`` so the run is finite. With all data drained,
event-time results are by construction equal to the batch computation, which
is exactly what the oracle expresses (windows on epoch-microsecond
arithmetic, so no timezone dependence anywhere).

At 100 TB: the grouping keys (window, event_type / user_id) partition the
state store; watermarks bound state size by evicting closed windows —
without one, per-key state grows forever. Every query below declares its
watermark for that reason even though a finite drain never drops rows.
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.functions.hashing import sql_hash64
from datapipeline_ops_spark.streaming.ops import (
    _STREAM_CACHE_ROOT,
    events_stream,
    run_stream_foreach_batch,
    run_stream_to_table,
)
from datapipeline_ops_spark.streaming.stateful import running_totals_per_user

_US_H = 3_600_000_000  # one hour in microseconds


@query(
    "stream_tumbling_counts",
    oracle=f"""
    SELECT CAST((epoch_us(ts) // {_US_H}) * 3600 AS BIGINT) AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(CAST(round(value*100) AS BIGINT)) / 100.0, 4)
               AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event_type with a 1-hour
    watermark; complete-mode drain emits every window. Window bounds are
    returned as epoch seconds (timezone-proof across engines)."""
    s = events_stream(spark, sf_dir)
    agg = (
        s.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0, 4
            ).alias("total_value"),
        )
    )
    out = run_stream_to_table(agg, output_mode="complete")
    return out.select(
        F.unix_timestamp(F.col("w.start")).alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


@query(
    "stream_sliding_counts",
    oracle=f"""
    SELECT window_start, count(*) AS n_events FROM (
        SELECT CAST(u.s * 3600 AS BIGINT) AS window_start, event_id
        FROM events,
             LATERAL (SELECT unnest([epoch_us(ts) // {_US_H} - 1,
                                     epoch_us(ts) // {_US_H}]) AS s) AS u
        WHERE epoch_us(ts) >= u.s * {_US_H}
          AND epoch_us(ts) < (u.s + 2) * {_US_H}
    ) GROUP BY 1
    """,
)
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (2-hour length, 1-hour hop): every event lands in two
    overlapping windows; the engine assigns both, state is per (window) key.
    Oracle replays the hop arithmetic on epoch microseconds."""
    s = events_stream(spark, sf_dir)
    agg = (
        s.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = run_stream_to_table(agg, output_mode="complete")
    return out.select(
        F.unix_timestamp(F.col("w.start")).alias("window_start"), "n_events"
    )


@query(
    "stream_session_windows",
    oracle="""
    WITH x AS (
        SELECT user_id, epoch_us(ts) AS t, value,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                        OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) > 1800000000
                    OR lag(epoch_us(ts))
                        OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
    ),
    y AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY t
                                        ROWS UNBOUNDED PRECEDING) AS sess
          FROM x)
    SELECT user_id,
           CAST(min(t) // 1000000 AS BIGINT) AS session_start,
           CAST(max(t) // 1000000 + 1800 AS BIGINT) AS session_end,
           count(*) AS n_events,
           round(sum(CAST(round(value*100) AS BIGINT)) / 100.0, 4)
               AS total_value
    FROM y GROUP BY user_id, sess
    """,
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap per user — the
    streaming-native op the batch world needs gaps-and-islands SQL for
    (which is exactly what the oracle does: lag + cumulative sum). Session
    end = last event + gap, matching Spark's definition."""
    s = events_stream(spark, sf_dir)
    agg = (
        s.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0, 4
            ).alias("total_value"),
        )
    )
    out = run_stream_to_table(agg, output_mode="complete")
    return out.select(
        "user_id",
        F.unix_timestamp(F.col("w.start")).alias("session_start"),
        F.unix_timestamp(F.col("w.end")).alias("session_end"),
        "n_events",
        "total_value",
    )


@query(
    "stream_dedup_count",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def stream_dedup_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates on (event_type, user_id) with a watermark
    bounding dedup state, then a complete-mode rollup — the streaming
    equivalent of count(DISTINCT)."""
    s = events_stream(spark, sf_dir)
    deduped = s.withWatermark("ts", "1 hour").dropDuplicates(["event_type", "user_id"])
    agg = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_users"))
    out = run_stream_to_table(agg, output_mode="complete")
    return out.select("event_type", "n_users")


@query(
    "stream_running_totals",
    oracle="""
    SELECT user_id, count(*) AS n_events,
           round(sum(CAST(round(value*100) AS BIGINT)) / 100.0, 4)
               AS total_value
    FROM events GROUP BY user_id
    """,
)
def stream_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming via ``applyInPandasWithState``: per-user
    (count, sum) state folded batch-by-batch in the state store, emitted in
    update mode. The drain's final emission per user (the one with the
    largest n_events) equals the batch aggregate — which is the oracle."""
    from pyspark.sql import Window as W

    s = events_stream(spark, sf_dir)
    updates = run_stream_to_table(running_totals_per_user(s), output_mode="update")
    w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        updates.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", F.round("total_value", 4).alias("total_value"))
    )


@query(
    "stream_static_enrich",
    oracle="""
    SELECT e.event_type, c.c_mktsegment AS segment,
           count(*) AS n,
           round(sum(CAST(round(e.value*100) AS BIGINT)) / 100.0, 4) AS total
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY 1, 2
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against the static
    customer dimension (broadcast per micro-batch — the standard streaming
    enrichment shape; the dim re-resolves each batch so slowly-changing
    dims stay fresh), then a windowless rollup."""
    from datapipeline_ops_spark.tables import load_table

    s = events_stream(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    joined = s.join(F.broadcast(dim), "user_id")
    agg = joined.groupBy("event_type", "segment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0, 4
        ).alias("total"),
    )
    out = run_stream_to_table(agg, output_mode="complete")
    return out.select("event_type", "segment", "n", "total")


@query(
    "stream_foreachbatch_sink",
    oracle="""
    SELECT event_type, count(*) AS n,
           round(sum(CAST(round(value*100) AS BIGINT)) / 100.0, 4) AS total
    FROM events GROUP BY event_type
    """,
)
def stream_foreachbatch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the event stream through a ``foreachBatch`` parquet sink with
    per-batch-id idempotent overwrite, then read the sink back and verify it
    holds exactly the source rows (the oracle is the batch aggregate).

    Each micro-batch writes to its own ``batch_id=N`` partition directory
    with ``mode("overwrite")`` — the exactly-once discipline for foreachBatch:
    a replayed batch (same batch_id after failure) overwrites its own
    partition instead of appending duplicates. The idempotency property
    itself is unit-tested in tests/test_streaming.py; this gate query checks
    the end-to-end plumbing produced a loss-free, duplication-free sink.

    At 100 TB: foreachBatch is the sink escape hatch for targets Structured
    Streaming lacks natively (MERGE into a lakehouse table, multi-table
    fan-out, JDBC). The per-batch DataFrame write is a normal distributed
    batch write — nothing funnels through the driver."""
    sink_dir = os.path.join(
        _STREAM_CACHE_ROOT, "..", "fb_sink", sf_dir.strip("/").replace("/", "_")
    )
    sink_dir = os.path.abspath(sink_dir)
    shutil.rmtree(sink_dir, ignore_errors=True)

    s = events_stream(spark, sf_dir).select("event_id", "event_type", "value")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(sink_dir, f"batch_id={batch_id}")
        )

    run_stream_foreach_batch(s, write_batch, output_mode="append")
    out = spark.read.parquet(sink_dir)
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0, 4
        ).alias("total"),
    )


@query(
    "stream_stream_click_purchase",
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS gap_s
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def stream_stream_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join: each click joins the same user's purchases
    within the following 30 minutes. BOTH sides declare watermarks and the
    join carries an explicit time-bound — that pair is what lets the state
    store evict: a buffered click can be dropped once the purchase-side
    watermark passes click.ts + 30min. Without the bound, both sides buffer
    forever (Spark rejects append-mode stream-stream joins lacking it).
    State partitions by user_id (the equi-key); the finite drain emits the
    exact batch join, which the oracle replays as a self-join.
    """
    clicks = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        "inner",
    )
    out = run_stream_to_table(joined, output_mode="append")
    return out.select(
        "click_id",
        "purchase_id",
        "user_id",
        (F.col("purchase_ts").cast("long") - F.col("click_ts").cast("long")).alias("gap_s"),
    )


_US_D = 86_400_000_000  # one day in microseconds


@query(
    "stream_psi_drift",
    oracle=f"""
    WITH ext AS MATERIALIZED (SELECT min(value) AS vmin, max(value) AS vmax FROM events),
    hist AS MATERIALIZED (
        SELECT CAST((epoch_us(ts) // {_US_D}) * 86400 AS BIGINT) AS window_start,
               {{bin}} AS bin, count(*) AS n
        FROM events e CROSS JOIN ext x GROUP BY 1, 2
    ),
    spine AS (
        SELECT w.window_start, CAST(b.bin AS BIGINT) AS bin
        FROM (SELECT DISTINCT window_start FROM hist) w,
             (SELECT unnest(generate_series(0, {{nb_1}})) AS bin) b
    ),
    dense AS (
        SELECT s.window_start, s.bin, CAST(coalesce(h.n, 0) AS BIGINT) AS n
        FROM spine s LEFT JOIN hist h USING (window_start, bin)
    ),
    ref AS MATERIALIZED (
        SELECT {{bin}} AS bin,
               CAST(count(*) AS DOUBLE) / CAST(sum(count(*)) OVER () AS DOUBLE) AS pref
        FROM events e CROSS JOIN ext x GROUP BY 1
    ),
    terms AS (
        SELECT d.window_start,
               GREATEST(CAST(d.n AS DOUBLE)
                        / CAST(sum(d.n) OVER (PARTITION BY d.window_start) AS DOUBLE),
                        {{eps}}) AS pa,
               GREATEST(r.pref, {{eps}}) AS pb
        FROM dense d JOIN ref r USING (bin)
    )
    SELECT window_start,
           sum((pa - pb) * ln(pa / pb)) AS psi,
           sum((pa - pb) * ln(pa / pb)) > 0.2 AS drift
    FROM terms GROUP BY window_start
    """.format(
        bin="LEAST(CAST(FLOOR(((e.value - x.vmin) / (x.vmax - x.vmin)) * 10.0) AS BIGINT), 9)",
        nb_1=9,
        eps=1e-6,
    ),
)
def stream_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming drift monitor: per event-time DAY window, the value
    histogram streams through the REAL stateful machinery (stream-static
    join against the broadcast bin extent, 1-day watermark, windowed
    count), then PSI against the corpus-wide reference distribution is
    assembled from the drained histogram — exactly what a foreachBatch
    alerting sink would compute per micro-batch in production.

    Two-layer design matters at scale: the stateful stream keeps only
    (window x 10 bins) counters per state key — bounded by the watermark —
    while the PSI assembly touches the tiny histogram table, never raw
    events. Empty window-bins are densified against a 10-row spine so the
    epsilon-floored PSI term for vanished bins is included (a silently
    missing bin is precisely the drift you must not drop)."""
    from datapipeline_ops_spark.queries.drift_quality import (
        PSI_BINS,
        PSI_EPS,
        _bin_expr,
    )
    from datapipeline_ops_spark.tables import load_table

    batch = load_table(spark, sf_dir, "events")
    ext = batch.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax")).withColumn(
        "k", F.lit(1)
    )
    s = events_stream(spark, sf_dir).withColumn("k", F.lit(1))
    binned = s.join(F.broadcast(ext), "k").withColumn(
        "bin", _bin_expr(F.col("value"), F.col("vmin"), F.col("vmax"), PSI_BINS)
    )
    agg = (
        binned.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("w"), "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    hist = run_stream_to_table(agg, output_mode="complete").select(
        F.unix_timestamp(F.col("w.start")).alias("window_start"), "bin", "n"
    )
    # batch post-processing on the drained (windows x 10)-row histogram
    spine = (
        hist.select("window_start")
        .distinct()
        .select(
            "window_start",
            F.explode(F.sequence(F.lit(0), F.lit(PSI_BINS - 1))).alias("bin"),
        )
        .withColumn("bin", F.col("bin").cast("long"))
    )
    dense = (
        spine.join(hist, ["window_start", "bin"], "left")
        .select("window_start", "bin", F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"))
    )
    from pyspark.sql import Window as W

    ref = (
        batch.crossJoin(F.broadcast(ext.drop("k")))
        .select(_bin_expr(F.col("value"), F.col("vmin"), F.col("vmax"), PSI_BINS).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("rn"))
        .select(
            "bin",
            (F.col("rn").cast("double") / F.sum("rn").over(W.partitionBy()).cast("double")).alias("pref"),
        )
    )
    terms = dense.join(F.broadcast(ref), "bin").select(
        "window_start",
        F.greatest(
            F.col("n").cast("double")
            / F.sum("n").over(W.partitionBy("window_start")).cast("double"),
            F.lit(PSI_EPS),
        ).alias("pa"),
        F.greatest(F.col("pref"), F.lit(PSI_EPS)).alias("pb"),
    )
    term = (F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb"))
    return terms.groupBy("window_start").agg(
        F.sum(term).alias("psi"), (F.sum(term) > 0.2).alias("drift")
    )


@query(
    "stream_dedup_within_watermark",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           count(DISTINCT event_id) AS n_unique,
           round(sum(CAST(round(value*100) AS BIGINT)) / 100.0, 4)
               AS total_value
    FROM events GROUP BY event_type
    """,
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once dedup: the event stream unioned with itself
    (every record delivered twice — the at-least-once delivery failure
    mode) is deduplicated by ``dropDuplicatesWithinWatermark`` on
    event_id, the Spark 3.5+ operator whose state store evicts keys once
    the watermark passes them — bounded state, unlike plain
    ``dropDuplicates`` whose key set grows forever. Drained with
    availableNow, the result must equal the ORIGINAL stream exactly: the
    oracle aggregates the batch table, so any duplicate that survives (or
    any legitimate row the state eviction drops) flips the per-type
    counts red.

    At 100 TB: watermark-scoped dedup state is THE ingestion-time dedup —
    per-key state lives only `watermark` long, so state size tracks the
    late-data horizon, not stream history."""
    s = events_stream(spark, sf_dir)
    dup = s.unionAll(s)
    dedup = dup.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    out = run_stream_to_table(dedup, output_mode="append")
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_id").alias("n_unique"),
        F.round(
            F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0, 4
        ).alias("total_value"),
    )


@query(
    "stream_hll_registers",
    oracle=f"""
    WITH h AS (
        SELECT {sql_hash64("user_id")} AS h FROM events
    )
    SELECT h & 63 AS bucket,
           max(CASE WHEN (h >> 6) = 0 THEN 55
                    ELSE CAST(round(log2((h >> 6) & (-(h >> 6)))) AS INT) + 1
               END) AS reg
    FROM h GROUP BY 1
    """,
)
def stream_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming HyperLogLog: the 64 distinct-count registers maintained as
    a STREAMING aggregate (groupBy bucket, max rho) over the event stream —
    the canonical unbounded-cardinality monitor. Because max is the HLL
    merge monoid (proven on data by hll_mergeability_audit), the drained
    streaming state is bit-identical to the batch registers NO MATTER how
    the source slices micro-batches — which is exactly what the batch
    oracle asserts. State is 64 rows forever; complete-mode emission is
    constant-size.

    At 100 TB/day: this replaces count(DISTINCT) dashboards — the state
    store holds 64 integers instead of the user-id set, and the same
    registers union across streams/days by max."""
    from datapipeline_ops_spark.functions.hashing import hash64

    s = events_stream(spark, sf_dir)
    h = hash64(F.col("user_id"))
    w = F.shiftright(h, 6)
    rho = F.when(w == 0, F.lit(55)).otherwise(
        F.round(F.log2(w.bitwiseAND(-w))).cast("int") + 1
    )
    regs = (
        s.select(h.bitwiseAND(F.lit(63)).alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("reg"))
    )
    out = run_stream_to_table(regs, output_mode="complete")
    return out.select("bucket", "reg")


@query(
    "stream_topk_frequent_items",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
           CAST(row_number() OVER (ORDER BY count(*) DESC, event_type) AS INT)
               AS rnk
    FROM events GROUP BY event_type
    QUALIFY rnk <= 5
    """,
)
def stream_topk_frequent_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming frequent-items via a Misra-Gries sketch IN THE STATE STORE
    (``applyInPandasWithState``): each hash shard holds a bounded counter
    table that evolves micro-batch by micro-batch — the streaming sibling of
    the batch `heavy_hitters_verified` (mapInPandas MG + exact recount).
    After the drain, the final per-shard summaries (identified by the
    monotone n_seen high-water mark; a NULL-item sentinel keeps the final
    emission non-empty even when the table drains to zero slots) yield the
    candidate set; a batch recount makes the counts exact and ranks the
    top 5. Saturation is CHECKED, not assumed: the sketch carries an
    n_evictions counter, and any final snapshot showing a decrement-all
    event raises — an evicted table may have dropped a true heavy hitter
    the recount would never see, so a silent answer would be wrong. On the
    gated corpus the slot budget ({MG_CAPACITY} per shard) exceeds the
    event_type domain, so the check passes and the verified output is
    independent of how the source files split into micro-batches — which
    is what lets an exact batch oracle gate a sketch-bearing stream.

    Scale shape: state per shard is bounded by the slot budget regardless
    of stream length or item cardinality (the whole point of MG — a plain
    streaming groupBy(item) keeps state per DISTINCT item); the recount is
    a semi-joined aggregation on the candidate survivors only."""
    from pyspark.sql import Window as W

    from datapipeline_ops_spark.streaming.stateful import (
        MG_CAPACITY,
        mg_frequent_items,
    )
    from datapipeline_ops_spark.tables import load_table

    s = events_stream(spark, sf_dir)
    updates = run_stream_to_table(mg_frequent_items(s), output_mode="update")
    final = updates.withColumn(
        "mx", F.max("n_seen").over(W.partitionBy("shard"))
    ).filter(F.col("n_seen") == F.col("mx"))
    saturated = final.filter(F.col("n_evictions") > 0).limit(1).count()
    if saturated:
        raise ValueError(
            "stream_topk_frequent_items: Misra-Gries state saturated "
            f"(decrement-all fired; capacity {MG_CAPACITY}/shard) — the "
            "candidate set may have lost a true top-k item; raise "
            "MG_CAPACITY or shard count instead of trusting this answer"
        )
    cands = (
        final.filter(F.col("item").isNotNull())
        .select(F.col("item").alias("event_type"))
        .distinct()
    )
    exact = (
        load_table(spark, sf_dir, "events")
        .join(cands, "event_type", "left_semi")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w_rank = W.orderBy(F.desc("cnt"), F.asc("event_type"))
    return (
        exact.withColumn("rnk", F.row_number().over(w_rank).cast("int"))
        .filter(F.col("rnk") <= 5)
        .select("event_type", "cnt", "rnk")
    )


# ---------------------------------------------------------------------------
# stream_cms_frequency — Count-Min sketch maintained as a streaming aggregate
# (the additive-monoid sibling of stream_hll_registers' max monoid)
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 64
CMS_SEED = 31  # per-depth seeds CMS_SEED .. CMS_SEED + CMS_DEPTH - 1


def _cms_oracle() -> str:
    def h(expr: str, d: int) -> str:
        return f"{sql_hash64(expr, seed=CMS_SEED + d)} % {CMS_WIDTH}"

    est_cols = ",\n               ".join(
        f"""sum(CASE WHEN {h("b.event_type", d)} = {h("a.event_type", d)}
                     THEN b.cnt ELSE 0 END) AS e{d}"""
        for d in range(CMS_DEPTH)
    )
    least = "least(" + ", ".join(f"e{d}" for d in range(CMS_DEPTH)) + ")"
    return f"""
    WITH c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
               FROM events GROUP BY event_type),
    est AS (
        SELECT a.event_type,
               {est_cols}
        FROM c a, c b GROUP BY a.event_type
    )
    SELECT est.event_type,
           CAST({least} AS BIGINT) AS cms_est,
           c.cnt AS true_count,
           CAST({least} AS BIGINT) - c.cnt AS overcount
    FROM est JOIN c USING (event_type)
    """


@query("stream_cms_frequency", oracle=_cms_oracle())
def stream_cms_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch maintained as a STREAMING aggregate: each
    event explodes into {CMS_DEPTH} (depth, bucket) register hits and the
    stream groupBy counts them — because addition is the CMS merge monoid,
    the drained register table is bit-identical to the batch sketch no
    matter how the source slices micro-batches (the sum-monoid sibling of
    stream_hll_registers' max-monoid argument, proven on data by the exact
    oracle). After the drain, every observed event_type point-queries the
    registers (min over its {CMS_DEPTH} cells) and is compared against its
    exact count: CMS never undercounts, so `overcount >= 0` is a pinned
    invariant, and the oracle recomputes every estimate arithmetically —
    one corrupted register anywhere flips a min and goes gate-red.

    At 100 TB/day this is the frequency-monitoring counterpart of the HLL
    registers: {CMS_DEPTH}x{CMS_WIDTH} counters in the state store instead
    of per-key state, mergeable across streams/days by plain addition.

    Scale shape: the streaming side is one explode + a bounded-key
    aggregate (state = {CMS_DEPTH * CMS_WIDTH} rows forever); the post-
    drain point-query joins the broadcast register table; the exact
    recount is one partial-aggregated groupBy over the batch table."""
    from datapipeline_ops_spark.functions.hashing import hash64
    from datapipeline_ops_spark.tables import load_table

    s = events_stream(spark, sf_dir)
    hits = s.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.pmod(
                            hash64(F.col("event_type"), seed=CMS_SEED + d),
                            F.lit(CMS_WIDTH),
                        ).alias("w"),
                    )
                    for d in range(CMS_DEPTH)
                ]
            )
        ).alias("hit")
    ).select("hit.d", "hit.w")
    regs = hits.groupBy("d", "w").agg(F.count(F.lit(1)).alias("cnt"))
    drained = run_stream_to_table(regs, output_mode="complete")

    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("true_count"))
    )
    probes = exact.select(
        "event_type",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.pmod(
                            hash64(F.col("event_type"), seed=CMS_SEED + d),
                            F.lit(CMS_WIDTH),
                        ).alias("w"),
                    )
                    for d in range(CMS_DEPTH)
                ]
            )
        ).alias("p"),
    ).select("event_type", "p.d", "p.w")
    est = (
        probes.join(F.broadcast(drained), ["d", "w"])
        .groupBy("event_type")
        .agg(F.min("cnt").cast("long").alias("cms_est"))
    )
    return exact.join(est, "event_type").select(
        "event_type",
        "cms_est",
        "true_count",
        (F.col("cms_est") - F.col("true_count")).cast("long").alias("overcount"),
    )
