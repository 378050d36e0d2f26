"""Invariant tests for the funnel / merge / text-model query additions
(value parity vs DuckDB is covered by tools/check_correctness.py)."""

import pyspark.sql.functions as F

from datapipeline_ops_spark.queries import QUERIES


def _run(name, spark, sf_dir):
    return QUERIES[name].fn(spark, sf_dir)


def test_funnel_stages_monotone(spark, sf_dir):
    r = _run("funnel_conversion", spark, sf_dir).first()
    assert r["n_signup"] >= r["n_then_view"] >= r["n_then_click"] >= r["n_then_purchase"]
    assert r["n_signup"] > 0


def test_merge_apply_agrees_with_cdc_diff(spark, sf_dir):
    merged = _run("merge_upsert_apply", spark, sf_dir)
    diff = _run("snapshot_diff_cdc", spark, sf_dir)
    m = {r["action"]: r["n"] for r in merged.groupBy("action").agg(F.count(F.lit(1)).alias("n")).collect()}
    d = {r["change_type"]: r["n"] for r in diff.groupBy("change_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    # merge emits exactly the new-snapshot rows; actions align with the diff
    assert m.get("insert", 0) == d.get("insert", 0)
    assert m.get("update", 0) == d.get("update", 0)
    assert m.get("keep", 0) == d.get("unchanged", 0)
    assert merged.count() == m.get("insert", 0) + m.get("update", 0) + m.get("keep", 0)


def test_tfidf_topk_bounded_per_lang(spark, sf_dir):
    df = _run("tfidf_top_terms", spark, sf_dir)
    per = df.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    assert per and all(r["n"] <= 10 for r in per)


def test_trigram_lm_scores_are_log_probs(spark, sf_dir):
    df = _run("char_trigram_lm_score", spark, sf_dir)
    row = df.agg(
        F.max("lm_score").alias("mx"), F.min("n_tri").alias("mn")
    ).first()
    assert row["mx"] < 0.0  # log-probabilities
    assert row["mn"] >= 1
