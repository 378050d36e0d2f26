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
        # ts is parquet TIMESTAMP(NANOS); Spark has no nanos timestamp type.
        # Read it as long nanos (runtime-settable SQLConf — the caller may
        # hand us a vanilla session) and truncate to micros exactly like
        # DuckDB's ns→timestamp conversion so oracles agree.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        df = spark.read.parquet(table_path(sf_dir, name))
        if isinstance(df.schema["ts"].dataType, LongType):
            # integer division, NOT floor(ts/1000): double division of an
            # ~1.7e18 nanos value rounds in the 53-bit mantissa and lands
            # ±1 µs off the exact truncation DuckDB does.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every catalog table as a DataFrame (lazy — no scan happens here)."""
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register each table as a temp view for spark.sql() queries."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
