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


# The driver gate records a capped prefix of queries() in registration order
# (r01..r13 each recorded exactly 50), so ordering controls which queries get
# a driver record. Round-14 ordering applies the staged plan from the
# round-13 comment (round-13 gate came back 50/50 green, so no reds to head
# the window):
# (a) first driver records for the 16 round-14 additions, registration
#     order (8 from the opening wave + 8 from the classic-ML wave 2);
# (b) vocab_coverage_curve -- the last r05-latest straggler; the r05 cohort
#     is fully rotated after it;
# (c) the first 33 of the r06-latest cohort (50 queries), registration
#     order; the last 17 (clipped_area_filter, gauntlet_exactly_one,
#     pipeline_cut_e2e, pipeline_caption_e2e,
#     pipeline_frame_mining_e2e, pipeline_bg_filter_e2e, kmv_set_ops_audit,
#     bootstrap_mean_ci, ann_ivfpq_recall_eval, html_text_extract,
#     url_canonical_dedup, crawl_schedule_plan, warc_record_extract,
#     crawl_to_corpus_e2e, robots_rules_apply, seasonal_decompose_daily,
#     changepoint_cusum_daily) roll to round 15 to keep the window at 50.
# All queries remain registered -- ordering only picks the driver sample.
_PRIORITY = [
    # (a) round-14 additions -- first records in the round they were written
    "kmeans_train_loop", "kmeans_assign_apply",
    "trained_gate_artifact_apply", "bpe_artifact_apply",
    "kmeans_artifact_apply",
    "trained_gate_calibration", "trained_gate_feature_ablation",
    "minibatch_sgd_train",
    # (a, wave 2) classical-ML closures
    "naive_bayes_train", "naive_bayes_confusion",
    "decision_stump_train", "decision_stump_apply",
    "ols_normal_equations", "isotonic_calibration_pav",
    "gbdt_stump_boost", "gbdt_gate_apply",
    # (b) the final r05 straggler
    "vocab_coverage_curve",
    # (c) r06-latest cohort, registration order (45 of 50)
    "label_centroids", "monthly_revenue_trend", "fuzzy_name_pairs",
    "monthly_spine_gap_fill", "dedup_exact", "minhash_signatures",
    "ngram_jaccard_pairs", "simhash_fingerprints", "simhash_near_pairs",
    "pareto_frontier_docs", "pq_code_assign", "ann_ivf_pq_topk",
    "eval_rmse_report", "eval_angular_error", "eval_dataset_means",
    "udf_quality_gate", "udf_detect_count_filter", "udf_pair_similarity_band",
    "csv_roundtrip", "jsonl_roundtrip", "jsonl_records",
    "media_manifest", "media_decode_stub", "media_resize_stub",
    "media_frame_sample", "media_type_sniff", "media_png_frame_extract",
    "segment_plan", "segment_summary", "frame_sample_ref",
    "frame_sample_scan", "array_index_join", "iou_boxes",
    # --- 50-slot window ends here ---
]
# ROUND-15 ORDERING PLAN (apply after the round-14 gate runs): head the
# window with any round-14 reds (expected none), then:
# (1) first records for any round-15 additions as they land;
# (2) the 17 rolled r06 queries (clipped_area_filter, gauntlet_exactly_one,
#     pipeline_cut_e2e, pipeline_caption_e2e,
#     pipeline_frame_mining_e2e, pipeline_bg_filter_e2e, kmv_set_ops_audit,
#     bootstrap_mean_ci, ann_ivfpq_recall_eval, html_text_extract,
#     url_canonical_dedup, crawl_schedule_plan, warc_record_extract,
#     crawl_to_corpus_e2e, robots_rules_apply, seasonal_decompose_daily,
#     changepoint_cusum_daily) -- the r06 cohort is fully rotated after them;
# (3) fill the remaining slots from the then-oldest cohort (r07-latest, 50
#     queries), registration order; the rest roll to round 16. The window
#     stays pure first-records-for-new + oldest-cohort rotation on a
#     <=8-round cadence.


def _ordered_names() -> list[str]:
    names = list(QUERIES)
    missing = [n for n in _PRIORITY if n not in QUERIES]
    assert not missing, f"_PRIORITY names not in QUERIES: {missing}"
    prio = list(_PRIORITY)
    rest = [n for n in names if n not in set(prio)]
    return prio + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, driver-unrecorded
    families first (see _R1_DRIVER_CHECKED)."""
    return {name: QUERIES[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted for non-SQL-expressible ops."""
    return {
        name: QUERIES[name].oracle
        for name in _ordered_names()
        if QUERIES[name].oracle is not None
    }
