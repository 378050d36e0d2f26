"""Property tests for the graph / layout / tokenizer-prep query family
(gate parity is covered by tools/check_correctness.py; these check the
algorithmic invariants the oracle can't express)."""

import pyspark.sql.functions as F

from datapipeline_ops_spark.queries import QUERIES


def _run(name, spark, sf_dir):
    return QUERIES[name].fn(spark, sf_dir)


def test_pagerank_mass_conserved(spark, sf_dir):
    # Undirected construction -> no dangling nodes -> total rank stays 1.
    df = _run("pagerank_purchase_graph", spark, sf_dir)
    row = df.agg(
        F.sum("pagerank").alias("mass"), F.min("pagerank").alias("lo")
    ).first()
    assert abs(row["mass"] - 1.0) < 1e-4
    assert row["lo"] > 0.0


def test_scd2_intervals_partition_time(spark, sf_dir):
    # Per user: intervals tile [first, last] with no overlap, exactly one
    # open (is_current) interval, and event counts sum to the user's rows.
    df = _run("scd2_user_state", spark, sf_dir).cache()
    bad_overlap = df.filter(
        F.col("valid_to").isNotNull() & (F.col("valid_to") <= F.col("valid_from"))
    ).count()
    assert bad_overlap == 0
    per_user = df.groupBy("user_id").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_open"),
        F.sum("n_events").alias("n_ev"),
    )
    assert per_user.filter(F.col("n_open") != 1).count() == 0
    from datapipeline_ops_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").groupBy("user_id").count()
    joined = per_user.join(ev, "user_id")
    assert joined.filter(F.col("n_ev") != F.col("count")).count() == 0
    df.unpersist()


def test_chunk_plan_covers_every_token(spark, sf_dir):
    from datapipeline_ops_spark.queries.curation_extra import CHUNK_SIZE, CHUNK_STRIDE

    df = _run("chunk_overlap_plan", spark, sf_dir).cache()
    # max end_tok per doc == token count, min start == 0, strides uniform
    agg = df.groupBy("doc_id").agg(
        F.min("start_tok").alias("s0"),
        F.max("end_tok").alias("emax"),
        F.max("n_tok").alias("wmax"),
    )
    assert agg.filter(F.col("s0") != 0).count() == 0
    assert agg.filter(F.col("wmax") > CHUNK_SIZE).count() == 0
    # consecutive chunks overlap by SIZE - STRIDE when full
    assert CHUNK_SIZE > CHUNK_STRIDE
    gaps = df.filter(
        (F.col("start_tok") % CHUNK_STRIDE != 0)
    ).count()
    assert gaps == 0
    df.unpersist()


def test_zorder_buckets_are_locally_tight(spark, sf_dir):
    # The point of z-order: per-bucket ranges are narrow on BOTH dims.
    # Each 256-code bucket covers a 16x16 grid tile -> range <= 15 each dim.
    df = _run("zorder_layout", spark, sf_dir)
    bad = df.filter(
        (F.col("price_hi") - F.col("price_lo") > 15)
        | (F.col("cust_hi") - F.col("cust_lo") > 15)
    ).count()
    assert bad == 0


def test_bpe_pairs_are_adjacent_lowercase(spark, sf_dir):
    df = _run("bpe_pair_counts", spark, sf_dir)
    rows = df.collect()
    assert 0 < len(rows) <= 50
    assert all(r["a"] == r["a"].lower() and r["b"] == r["b"].lower() for r in rows)
    counts = [r["cnt"] for r in rows]
    assert counts == sorted(counts, reverse=True)
