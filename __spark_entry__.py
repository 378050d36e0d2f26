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
# (r01..r10 each recorded exactly 50), so ordering controls which queries get
# a driver record. Round-11 ordering applies the staged plan (round-10 gate
# came back 50/50 green, so no reds to head the window):
# (a) first driver records for the 6 round-10 additions, registration
#     order (judge-verified PASS against the oracle in round 10);
# (b) the 15 remaining r03-latest stragglers, registration order — after
#     these the r03 cohort is fully rotated;
# (c) round-11 additions, registration order — first records in the same
#     round they were written;
# (d) fill from the then-oldest cohort (r04-latest, 47 queries),
#     registration order; the rest roll to round 12. All queries remain
#     registered — ordering only picks the driver sample.
_PRIORITY = [
    # (a) round-10 additions, first driver records
    "dedup_manifest_reconcile", "tokenizer_roundtrip_audit",
    "serving_eval_gate_e2e", "preference_pair_margins",
    "mixture_realized_audit", "neardup_split_leakage",
    # (b) r03-latest stragglers, registration order
    "stream_foreachbatch_sink", "stream_stream_click_purchase",
    "asof_click_to_purchase", "scd2_user_state", "ohlc_time_bars",
    "pit_state_at_order", "zipf_slope_fit", "lang_confusion_matrix",
    "text_normalize_stats", "corpus_report_card", "lead_lag_deltas",
    "rolling_window_avg", "time_range_rolling_sum", "daily_anomaly_zscore",
    "percent_rank_features",
    # (c) round-11 additions, registration order — first records in the
    #     same round they were written
    "dedup_tau_sensitivity", "contamination_decay_audit",
    "tokenizer_swap_impact", "int8_serving_parity",
    # (d) r04-latest rotations, registration order (trimmed to keep the
    #     window at 50; the rest roll to round 12)
    "partition_skew_report", "dedup_exact_keepers", "minhash_lsh_pairs",
    "neardup_clusters", "corpus_curation_e2e", "exact_substring_spans",
    "dsir_importance_weights", "compaction_plan", "similarity_argmax",
    "embedding_int8_quant", "pricing_summary", "revenue_by_nation",
    "top_orders", "multi_predicate_filter", "count_in_range_filter",
    "null_guard_filter", "group_count", "running_best_max_by",
    "topk_per_group", "anti_join_idempotency", "broadcast_dim_join",
    "distinct_agg_suppliers", "having_big_customers", "above_avg_parts",
    "customer_order_histogram",
    # --- 50-slot window ends here ---
]
# ROUND-12 ORDERING PLAN (apply after the round-11 gate runs): head the
# window with any round-11 reds (expected none), then:
# (0) first records for the 14 round-11 post-window additions, registration
#     order: quality_filter_sweep epoch_repeat_plan ann_probe_recall_curve
#     neardup_cluster_purity media_phash_neardup epoch_shuffle_audit
#     audio_fingerprint_neardup scaling_law_subsets ivf_cell_balance
#     inbatch_negative_collisions packing_fill_sweep
#     minhash_vs_simhash_agreement dedup_removal_impact
#     neardup_chain_overmerge stream_topk_frequent_items (all fifteen
#     oracle-green in the round-11
#     pre-record gates — the mid-session full-registry run passed 379/379
#     and later additions passed individually — but registered after the
#     50-slot window was staged);
# (1) first records for any round-12 additions as they land;
# (2) the 22 remaining r04-latest stragglers, registration order:
#     priority_with_big_lineitem
#     returnflag_share deterministic_sample value_percentiles_by_type
#     price_stats_by_flag orders_by_weekday overlapping_order_windows
#     brand_size_rank promo_revenue_share idle_big_balance_customers
#     returned_revenue_by_nation copurchase_part_pairs fk_integrity_report
#     retry_cut_status set_ops_segments stratified_sample_per_source
#     events_type_pivot approx_distinct_users quantile_sketch_audit
#     range_join_value_bands oov_rate_report sentence_split_udtf;
# (3) fill the remaining slots from the then-oldest cohort (r05-latest,
#     50 queries), registration order. The window stays pure
#     first-records-for-new + oldest-cohort rotation on a ≤8-round cadence.


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
