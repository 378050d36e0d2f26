"""Unit tests for the relational core queries at sf0.001 (fast smoke: shape +
spot-check invariants; full value-level verification is the DuckDB oracle in
tools/check_correctness.py and the driver's t2 gate)."""

import pyspark.sql.functions as F
import pytest

from datapipeline_ops_spark.queries import QUERIES


def q(name, spark, sf_dir):
    return QUERIES[name].fn(spark, sf_dir)


# query names allowed to ship without a DuckDB oracle (non-SQL-expressible)
ORACLE_EXEMPT_MARKERS = ("stream", "greedy", "multimodal", "approx")


def test_registry_has_oracles():
    missing = [
        n
        for n, s in QUERIES.items()
        if s.oracle is None and not any(m in n for m in ORACLE_EXEMPT_MARKERS)
    ]
    assert not missing, f"relational queries missing oracles: {missing}"


def test_pricing_summary(spark, sf_dir):
    rows = q("pricing_summary", spark, sf_dir).collect()
    assert 1 <= len(rows) <= 9  # |returnflag| x |linestatus|
    for r in rows:
        assert r.sum_disc_price <= r.sum_base_price  # discount can only reduce
        assert r.count_order > 0
        # semantic pin (round-9 ADVICE): avg_disc is a discount FRACTION —
        # the whole-percent sum must be normalized by per=100, not per=1
        # (which published ~5.0 while staying cross-engine green)
        assert 0.0 <= r.avg_disc <= 0.11
        assert 0.0 <= r.avg_qty <= 55.0


def test_threshold_filter(spark, sf_dir):
    df = q("threshold_filter", spark, sf_dir)
    assert df.filter(F.col("l_quantity") < 45.0).count() == 0


def test_band_filter(spark, sf_dir):
    df = q("band_filter", spark, sf_dir)
    bad = df.filter(~F.col("l_discount").between(0.05, 0.07)).count()
    assert bad == 0


def test_count_in_range_filter(spark, sf_dir):
    rows = q("count_in_range_filter", spark, sf_dir).collect()
    assert all(8 <= r.n_orders <= 10 for r in rows)


def test_bin_argmax_unique_per_bin(spark, sf_dir):
    df = q("bin_argmax", spark, sf_dir)
    dup = df.groupBy("o_custkey", "order_year").count().filter("count > 1").count()
    assert dup == 0


def test_topk_per_group_k(spark, sf_dir):
    df = q("topk_per_group", spark, sf_dir)
    over = df.groupBy("l_suppkey").count().filter("count > 3").count()
    assert over == 0


def test_running_best_matches_window(spark, sf_dir):
    df = q("running_best_max_by", spark, sf_dir)
    # best_price is the true max per customer
    from datapipeline_ops_spark.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    true_max = o.groupBy("o_custkey").agg(F.max("o_totalprice").alias("m"))
    joined = df.join(true_max, "o_custkey")
    assert joined.filter(F.col("best_price") != F.col("m")).count() == 0


def test_anti_semi_disjoint(spark, sf_dir):
    anti = q("anti_join_idempotency", spark, sf_dir).select("o_orderkey")
    semi = q("semi_join", spark, sf_dir).select("o_orderkey")
    # anti(R-flagged) ∪ its complement = all orders; semi is a subset of orders
    from datapipeline_ops_spark.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    assert semi.join(o, "o_orderkey", "left_anti").count() == 0


def test_broadcast_join_is_broadcast(spark, sf_dir):
    df = q("broadcast_dim_join", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_approx_distinct_within_tolerance(spark, sf_dir):
    from datapipeline_ops_spark.tables import load_table

    rows = {r["event_type"]: r for r in q("approx_distinct_users", spark, sf_dir).collect()}
    e = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert set(rows) == set(exact)
    for t, n in exact.items():
        assert rows[t]["exact_users"] == n, (t, rows[t]["exact_users"], n)
        assert rows[t]["estimate_ok"], (t, dict(rows[t].asDict()))


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    # queries()/oracle_sql() contract: oracle keys ⊆ query keys
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)


def test_sessionize_gap_invariants(spark, sf_dir):
    """Within a session every inter-event gap <= 30 min; consecutive sessions
    of one user are separated by > 30 min."""
    from datapipeline_ops_spark.tables import load_table

    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    sessions = q("sessionize_events", spark, sf_dir)
    # recompute the assignment row-wise and check invariants on boundaries
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.withColumn("gap_s", F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long"))
    # number of session starts per user = 1 (first event) + gaps > 30min
    starts = gaps.groupBy("user_id").agg(
        (F.count(F.lit(1)) - F.count("gap_s") + F.sum(F.when(F.col("gap_s") > 1800, 1).otherwise(0))).alias("n_starts")
    )
    per_user_sessions = sessions.groupBy("user_id").agg(F.countDistinct("session_id").alias("n_sessions"))
    joined = starts.join(per_user_sessions, "user_id")
    assert joined.filter(F.col("n_starts") != F.col("n_sessions")).count() == 0
    # session event counts must sum to the table row count
    assert sessions.agg(F.sum("n_events")).first()[0] == e.count()


def test_fuzzy_pairs_distance_bounds(spark, sf_dir):
    df = q("fuzzy_name_pairs", spark, sf_dir)
    bad = df.filter(
        (F.col("dist") > 2)
        | (F.col("dist") <= 0)
        | (F.col("key_a") >= F.col("key_b"))
        | (F.levenshtein(F.col("name_a"), F.col("name_b")) != F.col("dist"))
    )
    assert bad.count() == 0


def test_user_event_type_map_roundtrip(spark, sf_dir):
    import json

    from datapipeline_ops_spark.queries import QUERIES
    from datapipeline_ops_spark.tables import load_table

    rows = QUERIES["user_event_type_map"].fn(spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "events")
    n_events = e.count()
    total = 0
    for r in rows:
        m = json.loads(r.type_counts)
        assert sum(m.values()) == r.n_total
        assert list(m) == sorted(m), "map keys must serialize sorted"
        total += r.n_total
    assert total == n_events


def test_decimal_exact_totals_is_exact(spark, sf_dir):
    from decimal import Decimal

    from datapipeline_ops_spark.queries import QUERIES
    from datapipeline_ops_spark.tables import load_table

    rows = QUERIES["decimal_exact_totals"].fn(spark, sf_dir).collect()
    o = load_table(spark, sf_dir, "orders").select("o_orderpriority", "o_totalprice").collect()
    expect = {}
    for r in o:
        q = Decimal(str(r.o_totalprice)).quantize(Decimal("0.01"))
        expect[r.o_orderpriority] = expect.get(r.o_orderpriority, Decimal(0)) + q
    for r in rows:
        assert Decimal(r.total_price) == expect[r.o_orderpriority]
