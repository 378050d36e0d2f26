"""Query registry: every implemented operator registers a named query.

Each entry pairs a Spark query builder ``(spark, sf_dir) -> DataFrame`` with
an equivalent ANSI-SQL oracle string that DuckDB runs on the same parquet
tables. The driver's correctness gate compares the two (row count + schema +
order-insensitive value hash), so:

- every computed column is aliased IDENTICALLY in both;
- float aggregates are rounded identically in both (sum order differs across
  engines; rounding removes last-bit noise);
- ops whose semantics are genuinely non-relational (sequential greedy dedup,
  streaming state) register with ``oracle=None`` → rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as query ``name`` with the given DuckDB oracle SQL."""

    def wrap(fn: QueryFn) -> QueryFn:
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return wrap
