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
           count(*) AS n, round(sum(value), 4) AS total
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
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total")
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
