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
# (r01..r09 each recorded exactly 50), so ordering controls which queries get
# a driver record. Round-10 ordering applies the staged plan (round-9 gate
# came back 50/50 green, so no reds to head the window):
# (a) pretrain_prep_e2e — the round-9 addition and the registry's only
#     driver-unrecorded query — first record;
# (b) the 18 remaining r02-latest stragglers, registration order (their
#     last driver record is round 2; the fuzzer covers most of them but a
#     fresh record closes the ≤8-round cadence loop);
# (c) 31 rotations from the then-oldest cohort (r03-latest, 46 queries),
#     registration order. 1 + 18 + 31 = 50; the other 15 r03 queries roll
#     to round 11. After this round EVERY registered query has a driver
#     record. All queries remain registered — ordering only picks the
#     driver sample.
_PRIORITY = [
    # (a) round-9 addition, first driver record
    "pretrain_prep_e2e",
    # (b) r02-latest stragglers, registration order
    "cosine_topk_bruteforce", "embedding_near_dup", "ann_lsh_buckets",
    "ann_ivf_topk", "eval_tonemap", "zorder_layout", "variant_props_stats",
    "table_profile", "vocab_top_tokens", "winsorized_value_stats",
    "token_stats", "bpe_ish_token_count", "quality_score", "language_id",
    "lang_distribution", "doc_fingerprint", "tfidf_top_terms",
    "char_trigram_lm_score",
    # (c) r03-latest rotations, registration order
    "funnel_conversion", "event_bigram_paths", "retention_cohorts",
    "histogram_equi_width", "multi_touch_attribution",
    "neardup_cluster_sizes", "semantic_dedup_keepers",
    "weighted_sample_per_source", "ann_rerank_l2", "kmeans_refine_step",
    "triangle_copurchase_stats", "partitioned_write_prune",
    "bucketed_join_copartition", "manifest_stream_scan",
    "dpp_partitioned_join", "schema_evolution_merge", "pretrain_data_e2e",
    "benford_price_check", "expectations_report", "bin_argmax",
    "semi_join", "sessionize_events", "incremental_mv_refresh",
    "unpivot_order_metrics", "dataset_split_assign", "split_leakage_audit",
    "cogroup_click_purchase_stats", "stream_tumbling_counts",
    "stream_sliding_counts", "stream_session_windows", "stream_dedup_count",
    # --- 50-slot window ends here ---
]
# ROUND-11 ORDERING PLAN (apply after the round-10 gate runs): head the
# window with any round-10 reds (expected none), then:
# (1) first driver records for the round-10 additions, registration order:
#     dedup_manifest_reconcile tokenizer_roundtrip_audit
#     serving_eval_gate_e2e preference_pair_margins mixture_realized_audit
#     neardup_split_leakage;
# (2) the 15 remaining r03-latest stragglers, registration order:
#     stream_foreachbatch_sink stream_stream_click_purchase
#     asof_click_to_purchase scd2_user_state ohlc_time_bars
#     pit_state_at_order zipf_slope_fit lang_confusion_matrix
#     text_normalize_stats corpus_report_card lead_lag_deltas
#     rolling_window_avg time_range_rolling_sum daily_anomaly_zscore
#     percent_rank_features
# (3) fill the remaining slots from the then-oldest cohort (r04-latest,
#     47 queries), registration order.
# From round 11 on the window is pure first-records-for-new +
# oldest-cohort rotation on a ≤8-round cadence.


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
