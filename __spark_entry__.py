"""Driver contract for the spark-graft builder (PySpark target).

Thin facade over ``datapipeline_ops_spark``: the engine package registers
every implemented query (Spark builder + DuckDB oracle SQL) in
``datapipeline_ops_spark.queries.QUERIES``; this module just exposes them in
the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datapipeline_ops_spark.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the full corpus-curation funnel (quality gate -> exact
    dedup -> MinHash/LSH near-dup clusters -> keeper per cluster) — the
    engine's core 100 TB use case composed end-to-end.
    """
    return QUERIES["corpus_curation_e2e"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted for non-SQL-expressible ops."""
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
