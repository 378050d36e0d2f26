"""Regression guards for the two round-2 failure classes:

1. The events.ts schema seam — the testdata generator has re-encoded ``ts``
   between rounds (TIMESTAMP(NANOS) → timestamp[us]/NTZ), and each change
   silently broke every timestamp consumer. ``load_table`` /
   ``events_stream`` must normalize ALL plausible encodings to a plain
   TimestampType so `unix_micros` and `withWatermark` always resolve.

2. Doc drift — README's registered-query count has drifted from the registry
   twice; parse the README and assert it against the live registry so the
   number cannot drift a third time.
"""

import os
import re

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

from datapipeline_ops_spark.tables import _normalize_event_ts, load_table


def test_events_ts_is_timestamp_on_real_testdata(spark, sf_dir):
    dt = load_table(spark, sf_dir, "events").schema["ts"].dataType
    assert isinstance(dt, TimestampType), f"events.ts surfaced as {dt}"


def test_normalize_ntz_encoding(spark):
    df = spark.range(3).select(
        F.col("id"),
        F.to_timestamp(F.lit("2024-01-02 03:04:05.123456"))
        .cast("timestamp_ntz")
        .alias("ts"),
    )
    assert isinstance(df.schema["ts"].dataType, TimestampNTZType)
    out = _normalize_event_ts(df)
    assert isinstance(out.schema["ts"].dataType, TimestampType)
    # UTC session tz pinned: the naive instant maps 1:1 onto epoch micros
    micros = out.select(F.unix_micros("ts").alias("m")).first()["m"]
    assert micros == 1704164645123456


def test_normalize_nanos_long_encoding(spark):
    nanos = 1704164645123456789  # .123456789 s — truncates to .123456
    df = spark.range(1).select(F.lit(nanos).cast("long").alias("ts"))
    out = _normalize_event_ts(df)
    assert isinstance(out.schema["ts"].dataType, TimestampType)
    micros = out.select(F.unix_micros("ts").alias("m")).first()["m"]
    assert micros == 1704164645123456


def test_normalize_timestamp_passthrough(spark):
    df = spark.range(1).select(
        F.to_timestamp(F.lit("2024-01-02 03:04:05")).alias("ts")
    )
    out = _normalize_event_ts(df)
    assert isinstance(out.schema["ts"].dataType, TimestampType)


def test_events_stream_ts_is_timestamp(spark, sf_dir):
    from datapipeline_ops_spark.streaming.ops import events_stream

    sdf = events_stream(spark, sf_dir)
    assert isinstance(sdf.schema["ts"].dataType, TimestampType)
    # watermark assignment is the operation that hard-fails on NTZ
    sdf.withWatermark("ts", "1 hour")


def test_unix_micros_resolves_on_events(spark, sf_dir):
    # the exact call pattern that threw DATATYPE_MISMATCH in round 2
    e = load_table(spark, sf_dir, "events").select(F.unix_micros("ts").alias("t"))
    assert e.first()["t"] is not None


def test_readme_query_count_matches_registry():
    from datapipeline_ops_spark.queries import QUERIES

    readme = open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "README.md")
    ).read()
    m = re.search(r"(\d+) registered queries", readme)
    assert m, "README no longer states the registered-query count"
    assert int(m.group(1)) == len(QUERIES), (
        f"README says {m.group(1)} queries; registry has {len(QUERIES)}"
    )
    m2 = re.search(r"(\d+) paired with a DuckDB oracle", readme)
    n_oracle = sum(1 for q in QUERIES.values() if q.oracle is not None)
    assert m2 and int(m2.group(1)) == n_oracle, (
        f"README oracle count {m2 and m2.group(1)}; registry has {n_oracle}"
    )


def test_priority_names_exist():
    # every name in the driver-ordering list must be a real registration —
    # a typo here silently demotes a query out of the driver's capped sample
    import __spark_entry__ as entry_mod
    from datapipeline_ops_spark.queries import QUERIES

    missing = [n for n in entry_mod._PRIORITY if n not in QUERIES]
    assert not missing, f"_PRIORITY names not in registry: {missing}"
    ordered = entry_mod._ordered_names()
    assert sorted(ordered) == sorted(QUERIES), "ordering must cover the registry exactly"
