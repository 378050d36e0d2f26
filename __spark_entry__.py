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
# (r01..r11 each recorded exactly 50), so ordering controls which queries get
# a driver record. Round-12 ordering applies the staged plan (round-11 gate
# came back 50/50 green, so no reds to head the window):
# (a) first driver records for the 15 round-11 post-window additions,
#     registration order (all fifteen oracle-green in the round-11 pre-record
#     gates and judge-verified PASS);
# (b) round-12 additions, registration order — first records in the same
#     round they were written;
# (c) the 22 remaining r04-latest stragglers, registration order — after
#     these the r04 cohort is fully rotated;
# (d) fill from the then-oldest cohort (r05-latest, 50 queries),
#     registration order; the rest roll to round 13. All queries remain
#     registered — ordering only picks the driver sample.
_PRIORITY = [
    # (a) round-11 post-window additions, first driver records
    "quality_filter_sweep", "epoch_repeat_plan", "ann_probe_recall_curve",
    "neardup_cluster_purity", "media_phash_neardup", "epoch_shuffle_audit",
    "audio_fingerprint_neardup", "scaling_law_subsets", "ivf_cell_balance",
    "inbatch_negative_collisions", "packing_fill_sweep",
    "minhash_vs_simhash_agreement", "dedup_removal_impact",
    "neardup_chain_overmerge", "stream_topk_frequent_items",
    # (b) round-12 additions, registration order — first records in the
    #     same round they were written (inserted here as they land)
    "crossdoc_substring_dedup", "caption_image_agreement",
    "dedup_savings_by_source", "webdataset_shard_plan",
    "padding_waste_report", "crosslingual_neardup_rate",
    "in_context_packing_plan", "stream_cms_frequency",
    "rejection_sampling_yield",
    # (c) r04-latest stragglers, registration order — r04 fully rotated
    "priority_with_big_lineitem", "returnflag_share", "deterministic_sample",
    "value_percentiles_by_type", "price_stats_by_flag", "orders_by_weekday",
    "overlapping_order_windows", "brand_size_rank", "promo_revenue_share",
    "idle_big_balance_customers", "returned_revenue_by_nation",
    "copurchase_part_pairs", "fk_integrity_report", "retry_cut_status",
    "set_ops_segments", "stratified_sample_per_source", "events_type_pivot",
    "approx_distinct_users", "quantile_sketch_audit", "range_join_value_bands",
    "oov_rate_report", "sentence_split_udtf",
    # (d) r05-latest rotations, registration order (trimmed to keep the
    #     window at 50; the rest roll to round 13)
    "wow_type_delta", "new_vs_returning_daily", "time_to_convert_quantiles",
    "cumulative_users_daily",
    # --- 50-slot window ends here ---
]
# ROUND-13 ORDERING PLAN (apply after the round-12 gate runs): head the
# window with any round-12 reds (expected none), then:
# (1) first records for any round-13 additions as they land;
# (2) the 46 remaining r05-latest stragglers, registration order
#     (minhash_estimate_audit, ngram_novelty_rate, lsh_tuning_report,
#     mixture_temperature_weights, curriculum_length_buckets,
#     k_anonymity_audit, winnowing_fingerprints .. vocab_coverage_curve);
# (3) fill the remaining slots from the then-oldest cohort (r06-latest),
#     registration order. The window stays pure first-records-for-new +
#     oldest-cohort rotation on a ≤8-round cadence.


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
