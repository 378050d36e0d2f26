"""Tests for profiling + cogroup + ORC queries: cross-checked invariants on
the sf0.001 tables."""

import pyspark.sql.functions as F

from datapipeline_ops_spark.queries.io_queries import orc_roundtrip
from datapipeline_ops_spark.queries.profiling import (
    VOCAB_MIN_COUNT,
    VOCAB_TOP_K,
    table_profile,
    vocab_top_tokens,
)
from datapipeline_ops_spark.queries.stateful import cogroup_click_purchase_stats
from datapipeline_ops_spark.tables import load_table


def test_table_profile_matches_direct_aggregates(spark, sf_dir):
    prof = {r.col_name: r for r in table_profile(spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders")
    n = o.count()
    direct_distinct = o.select(F.count_distinct("o_orderstatus")).first()[0]
    assert prof["o_orderstatus"].n_distinct == direct_distinct
    for r in prof.values():
        assert 0 <= r.n_null <= n
        assert r.min_value <= r.max_value or r.n_distinct <= 1
    ok = o.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    assert prof["o_orderkey"].min_value == str(ok[0])
    assert prof["o_orderkey"].max_value == str(ok[1])


def test_vocab_top_tokens_bounds(spark, sf_dir):
    rows = vocab_top_tokens(spark, sf_dir).collect()
    assert 0 < len(rows) <= VOCAB_TOP_K
    assert all(r.n >= VOCAB_MIN_COUNT for r in rows)
    # counts non-increasing in the (n desc, token) order
    ns = [r.n for r in sorted(rows, key=lambda r: (-r.n, r.token))]
    assert ns == sorted(ns, reverse=True)


def test_orc_roundtrip_lossless(spark, sf_dir):
    out = {r.s_nationkey: r for r in orc_roundtrip(spark, sf_dir).collect()}
    sup = load_table(spark, sf_dir, "supplier")
    direct = {
        r.s_nationkey: r
        for r in sup.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 4).alias("total_acctbal"),
        )
        .collect()
    }
    assert out.keys() == direct.keys()
    for k in out:
        assert out[k].n_suppliers == direct[k].n_suppliers
        assert abs(out[k].total_acctbal - direct[k].total_acctbal) < 1e-9


def test_cogroup_attribution_semantics(spark, sf_dir):
    stats = {r.user_id: r for r in cogroup_click_purchase_stats(spark, sf_dir).collect()}
    e = load_table(spark, sf_dir, "events")
    rows = e.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id", "event_type", F.unix_micros("ts").alias("t"), "value"
    ).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, evs in by_user.items():
        clicks = [r.t for r in evs if r.event_type == "click"]
        purchases = [r for r in evs if r.event_type == "purchase"]
        s = stats[user]
        assert s.n_clicks == len(clicks)
        assert s.n_purchases == len(purchases)
        if clicks:
            first = min(clicks)
            attr = [r for r in purchases if r.t >= first]
        else:
            attr = []
        assert s.n_attributed == len(attr)
        assert abs(s.attributed_value - round(sum(r.value for r in attr), 4)) < 1e-6
    assert stats.keys() == by_user.keys()


def test_manifest_source_partitions_and_fidelity(spark, sf_dir):
    import os

    from datapipeline_ops_spark.queries.io_queries import _scratch
    from datapipeline_ops_spark.sources.io import write_jsonl
    from datapipeline_ops_spark.sources.manifest_source import (
        ManifestJsonlDataSource,
        write_manifest,
    )

    d = load_table(spark, sf_dir, "documents")
    shard_dir = _scratch(sf_dir, "test_manifest_shards")
    write_jsonl(d.repartition(3), shard_dir)
    manifest = os.path.join(_scratch(sf_dir, "test_manifest"), "manifest.json")
    n_shards = write_manifest(shard_dir, manifest)
    assert n_shards == 3
    try:
        spark.dataSource.register(ManifestJsonlDataSource)
    except Exception:
        pass
    back = (
        spark.read.format("jsonl_manifest")
        .schema("doc_id bigint, text string, lang string, source string, n_chars bigint")
        .option("manifest", manifest)
        .load()
    )
    # one input partition per shard
    assert back.rdd.getNumPartitions() == 3
    got = {(r.doc_id, r.text, r.lang, r.source, r.n_chars) for r in back.collect()}
    want = {(r.doc_id, r.text, r.lang, r.source, r.n_chars) for r in d.collect()}
    assert got == want
