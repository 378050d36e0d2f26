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
# (r01..r07 each recorded exactly 50), so ordering controls which queries get
# a driver record. Round-8 ordering applies the plan the round-7 comment laid
# out: there are no round-7 reds, so the window is —
# (a) the 23 late-wave round-6 overflow queries (first driver records);
# (b) the 2 round-7 additions (colbert_maxsim_ivf_topk, serving_retrieval_e2e)
#     — first records;
# (c) the 8 queries whose only driver record is r01 (trivial scalars deferred
#     since round 6) — rotation;
# (d) 17 rotations from the oldest live cohort (r02-latest, 41 queries),
#     most engine-coupled first per the round-7 plan, then registration order.
# 23 + 2 + 8 + 17 = 50. Round-8 NEW queries land after the 50-cap (first
# records in round 9). All queries remain registered — ordering only picks
# the driver sample.
_PRIORITY = [
    # (a) late-wave round-6 overflow, first driver record
    "quality_gate_correlation", "provenance_hash_rollup",
    "encoding_advisor", "annotator_kappa", "prefix_sharing_stats",
    "embedding_norm_audit", "dedup_token_savings",
    "context_window_fit_report", "simpsons_paradox_check",
    "source_vocab_jaccard_matrix", "blocklist_filter_report",
    "qi_uniqueness_report", "cc_consistency_audit",
    "funnel_order_cost_report", "kcore_2_peeling", "shuffled_dup_detect",
    "neyman_allocation_plan", "session_gap_sensitivity",
    "good_turing_smoothing", "supplier_return_wilson",
    "discount_quantity_elasticity", "trade_flow_matrix",
    "small_quantity_order_revenue",
    # (b) round-7 additions, first driver record
    "colbert_maxsim_ivf_topk", "serving_retrieval_e2e",
    # (c) r01-latest scalar rotations (deferred since round 6)
    "path_roundtrip", "fraction_parse", "sec_to_label",
    "coalesce_fallback", "json_props_extract", "placeholders_build",
    "threshold_filter", "band_filter",
    # (d) r02-latest rotations, most engine-coupled first
    "greedy_dedup_keep", "scene_split_recursive", "orc_roundtrip",
    "stream_running_totals", "stream_static_enrich",
    "manifest_source_scan", "merge_upsert_apply", "snapshot_diff_cdc",
    "incremental_dedup", "embedding_dedup_keepers",
    "embedding_near_dup_lsh", "salted_group_agg",
    "pagerank_purchase_graph", "grouping_sets_report",
    "rollup_corpus_report", "cube_events_report",
    "decontaminate_overlap",
    # --- 50-slot window ends here ---
]
# ROUND-9 ORDERING PLAN (apply after the round-8 gate runs): head the window
# with any round-8 reds (expected none), then:
# (1) the 43 round-8 additions — first driver records, in wave order:
#     min_cost_supplier_per_part market_share_by_year profit_by_nation_year
#     quantity_concentration_parts top_revenue_suppliers
#     brand_bucket_supplier_counts large_order_customers_detail
#     disjunctive_predicate_revenue promo_part_recent_suppliers
#     sole_late_supplier_report join_cardinality_audit
#     filter_selectivity_audit mann_whitney_value_shift
#     spearman_spend_orders cuped_adjusted_conversion
#     brier_score_decomposition mcnemar_model_disagreement
#     sprt_daily_monitor experiment_readout_e2e ab_srm_check
#     kneser_ney_bigram cross_source_bigram_bleu
#     cross_source_duplication_matrix l_diversity_audit t_closeness_audit
#     span_corruption_plan fim_split_plan elo_rating_periods
#     activity_streak_histogram autocorrelation_daily_revenue
#     interevent_burstiness rfm_segmentation local_clustering_coefficient
#     kaplan_meier_conversion mann_kendall_trend herfindahl_concentration
#     cohort_ltv_matrix diff_in_diff_revenue text_lines_roundtrip
#     pareto_revenue_deciles basket_affinity_rules kfold_assignment_audit
#     class_weight_plan
# (2) 7 of the r02-latest rotations, registration order
#     (repetition_report pii_redact domain_mixing_sample sequence_packing
#     ...) — 43 + 7 fill the 50-slot window; the other 17 r02 stragglers
#     roll to round 10's rotation tail.
# After rounds 9-10 every registered query has a driver record; from then
# on the window is pure first-records-for-new + oldest-cohort rotation.


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
