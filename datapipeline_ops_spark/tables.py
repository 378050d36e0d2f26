"""Canonical table loader for the synthetic test catalog.

The driver generates TPC-H-ish parquet tables plus ``events`` (stream-shaped),
``documents`` (text corpus) and ``embeddings`` (vector table) at
``/root/testdata/sf*/`` (TESTDATA.md). All engine queries address tables
through this loader so source handling is one place: parquet scan, explicit
column pruning left to Catalyst, and optional temp-view registration for the
SQL API.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; known: {TABLE_NAMES}")
    if name == "events":
        # The testdata generator has stored ``ts`` with several parquet
        # encodings across regenerations; normalize every one of them to a
        # plain TimestampType so downstream code (unix_micros, watermarks,
        # window ranges) sees one stable schema:
        #   - TIMESTAMP(NANOS): Spark has no nanos type; read as long nanos
        #     (legacy SQLConf) and truncate to micros exactly like DuckDB's
        #     ns→timestamp conversion so oracles agree.
        #   - timestamp[us] without tz: surfaces as TIMESTAMP_NTZ; cast to
        #     TIMESTAMP. Session tz is pinned UTC (session.py), so the
        #     instant equals DuckDB's epoch interpretation of the naive value.
        #   - timestamp[us] with tz: already TimestampType; pass through.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        return _normalize_event_ts(df)
    return spark.read.parquet(table_path(sf_dir, name))


def _normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Coerce an event-time column to TimestampType regardless of the parquet
    physical encoding (nanos-as-long / micros-NTZ / micros-UTC)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    dt = df.schema[col].dataType
    if isinstance(dt, LongType):
        # integer division, NOT floor(ts/1000): double division of an
        # ~1.7e18 nanos value rounds in the 53-bit mantissa and lands
        # ±1 µs off the exact truncation DuckDB does.
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    if isinstance(dt, TimestampNTZType):
        # NTZ→TIMESTAMP interprets the naive value in the SESSION timezone;
        # pin UTC (runtime conf — the driver hands us a vanilla session) so
        # the instant equals DuckDB's epoch view of the same naive value.
        df.sparkSession.conf.set("spark.sql.session.timeZone", "UTC")
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every catalog table as a DataFrame (lazy — no scan happens here)."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register each table as a temp view for spark.sql() queries."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
