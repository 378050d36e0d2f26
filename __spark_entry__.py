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
# (r01..r05 each recorded exactly 50), so ordering controls which queries get
# a driver record. Round-6 ordering fills the 50-slot window with:
# (a) the 16 round-5 additions that overflowed the round-5 window (no driver
#     record yet; all pass the local oracle mimic at sf0.001/0.01/0.1);
# (b) 34 of the 42 queries whose only driver record is r01 — the rotation
#     backlog the r5 verdict asked for. The 8 cheapest scalar-shape queries
#     (path_roundtrip fraction_parse sec_to_label coalesce_fallback
#     json_props_extract placeholders_build threshold_filter band_filter)
#     are deferred to round 7 — they are single-expression projections whose
#     r01 greens are the least likely to have drifted.
# Round-6 NEW queries land after the 50-cap (first records in round 7),
# exactly as the round-5 wave did — registration keeps them mimic-gated.
# All queries remain registered — ordering only picks the driver sample.
_PRIORITY = [
    # (a) round-5 additions, first driver record (web-curation wave,
    # IVF-PQ pair, sketches, time-series monitors, frame extraction)
    "html_text_extract", "url_canonical_dedup", "crawl_schedule_plan",
    "media_type_sniff", "warc_record_extract", "crawl_to_corpus_e2e",
    "robots_rules_apply", "media_png_frame_extract",
    "pq_code_assign", "pareto_frontier_docs", "kmv_set_ops_audit",
    "ann_ivf_pq_topk", "ann_ivfpq_recall_eval",
    "seasonal_decompose_daily", "changepoint_cusum_daily",
    "bootstrap_mean_ci",
    # (b) stale-r01 rotation (latest record r01; 34 slots)
    "dedup_exact", "minhash_signatures", "ngram_jaccard_pairs",
    "simhash_fingerprints", "simhash_near_pairs",
    "label_centroids", "monthly_revenue_trend", "fuzzy_name_pairs",
    "monthly_spine_gap_fill",
    "eval_rmse_report", "eval_angular_error", "eval_dataset_means",
    "udf_quality_gate", "udf_detect_count_filter",
    "udf_pair_similarity_band",
    "csv_roundtrip", "jsonl_roundtrip", "jsonl_records",
    "media_manifest", "media_decode_stub", "media_resize_stub",
    "media_frame_sample", "segment_plan", "segment_summary",
    "frame_sample_ref", "frame_sample_scan",
    "array_index_join", "iou_boxes", "clipped_area_filter",
    "gauntlet_exactly_one",
    "pipeline_cut_e2e", "pipeline_caption_e2e",
    "pipeline_frame_mining_e2e", "pipeline_bg_filter_e2e",
]
# ROUND-7 ORDERING PLAN (apply after the round-6 gate runs): head the window
# with any round-6 reds, then the 17 round-6 additions lacking records
# (bigram_lm_perplexity bpe_merge_step quality_classifier_score
# dataset_card_report train_test_split_leakfree hll_register_sketch
# weighted_sample_aes audio_silence_segments sequence_packing_plan
# boilerplate_line_removal mrl_truncation_eval video_scene_cut_detect
# stream_dedup_within_watermark media_curation_e2e hybrid_rrf_fusion
# rag_chunk_plan bloom_pruned_join),
# then the 56 round-6 late-wave additions (entity_resolution_e2e
# spell_correct_symdel embedding_hamming_ann feature_hash_vectors
# dp_noisy_histogram ams_f2_sketch node_jaccard_similarity
# flesch_readability rare_category_collapse copurchase_pmi_scores
# calibration_ece_report gdpr_delete_cascade triplet_mining_hard_negatives
# lsh_pair_recall_eval tokenizer_fertility_by_lang wasserstein_drift_binned
# theil_sen_daily_trend freshness_sla_report join_skew_diagnosis
# seasonal_naive_backtest conversion_ab_ztest hll_mergeability_audit
# dedup_rate_curve markov_next_event_accuracy power_sample_size_calc
# hilbert_vs_zorder_locality stream_hll_registers pass_at_k_eval
# event_trigram_funnels daily_anomaly_mad ann_ndcg_eval
# quality_gate_correlation provenance_hash_rollup encoding_advisor
# annotator_kappa prefix_sharing_stats embedding_norm_audit
# dedup_token_savings context_window_fit_report simpsons_paradox_check
# source_vocab_jaccard_matrix blocklist_filter_report
# qi_uniqueness_report cc_consistency_audit funnel_order_cost_report
# kcore_2_peeling shuffled_dup_detect bradley_terry_strengths
# neyman_allocation_plan session_gap_sensitivity good_turing_smoothing
# colbert_maxsim_topk supplier_return_wilson
# discount_quantity_elasticity trade_flow_matrix
# small_quantity_order_revenue),
# then the 8 deferred r01-latest scalar queries (path_roundtrip
# fraction_parse sec_to_label coalesce_fallback json_props_extract
# placeholders_build threshold_filter band_filter), then rotate the oldest
# r02-latest records with the remaining slots.
# NOTE: 17 + 56 first-records exceed the 50-slot window — round 7 records
# the first 50 in the order above; the overflow heads the round-8 window
# (every unrecorded query stays mimic-gated at all three SFs meanwhile).


def _ordered_names() -> list[str]:
    names = list(QUERIES)
    prio = [n for n in _PRIORITY if n in QUERIES]
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
