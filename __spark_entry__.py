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
# (r01..r08 each recorded exactly 50), so ordering controls which queries get
# a driver record. Round-9 ordering applies the staged plan plus the r08
# verdict's "reds first" rule:
# (a) trade_flow_matrix — the one r08 red (hash-only, partial-sum-ordering
#     draw on round(sum(double),2)); revenue now summed in exact integer
#     cent-percent units (_rev_units convention) in both engines — re-record;
# (b) the 43 round-8 additions, first driver records, in wave order
#     (TPC-H shapes, optimizer audits, experimentation stats, corpus-LM,
#     governance, pretrain-prep, behavior, graph, survival/econ, misc);
# (c) 6 rotations from the oldest live cohort (r02-latest, 24 queries),
#     registration order. 1 + 43 + 6 = 50; the other 18 r02 stragglers roll
#     to round 10's rotation tail. All queries remain registered — ordering
#     only picks the driver sample.
_PRIORITY = [
    # (a) the r08 red, fixed — re-record first
    "trade_flow_matrix",
    # (b) round-8 additions, first driver records, wave order
    "min_cost_supplier_per_part", "market_share_by_year",
    "profit_by_nation_year", "quantity_concentration_parts",
    "top_revenue_suppliers", "brand_bucket_supplier_counts",
    "large_order_customers_detail", "disjunctive_predicate_revenue",
    "promo_part_recent_suppliers", "sole_late_supplier_report",
    "join_cardinality_audit", "filter_selectivity_audit",
    "mann_whitney_value_shift", "spearman_spend_orders",
    "cuped_adjusted_conversion", "brier_score_decomposition",
    "mcnemar_model_disagreement", "sprt_daily_monitor",
    "experiment_readout_e2e", "ab_srm_check",
    "kneser_ney_bigram", "cross_source_bigram_bleu",
    "cross_source_duplication_matrix", "l_diversity_audit",
    "t_closeness_audit", "span_corruption_plan", "fim_split_plan",
    "elo_rating_periods", "activity_streak_histogram",
    "autocorrelation_daily_revenue", "interevent_burstiness",
    "rfm_segmentation", "local_clustering_coefficient",
    "kaplan_meier_conversion", "mann_kendall_trend",
    "herfindahl_concentration", "cohort_ltv_matrix",
    "diff_in_diff_revenue", "text_lines_roundtrip",
    "pareto_revenue_deciles", "basket_affinity_rules",
    "kfold_assignment_audit", "class_weight_plan",
    # (c) r02-latest rotations, registration order
    "repetition_report", "pii_redact", "domain_mixing_sample",
    "sequence_packing", "bpe_pair_counts", "chunk_overlap_plan",
    # --- 50-slot window ends here ---
]
# ROUND-10 ORDERING PLAN (apply after the round-9 gate runs): head the window
# with any round-9 reds (expected none), then:
# (1) first driver records for any round-9 additions (e.g.
#     pretrain_prep_e2e), in registration order;
# (2) the 18 remaining r02-latest stragglers, registration order:
#     cosine_topk_bruteforce embedding_near_dup ann_lsh_buckets ann_ivf_topk
#     eval_tonemap zorder_layout variant_props_stats table_profile
#     vocab_top_tokens winsorized_value_stats token_stats bpe_ish_token_count
#     quality_score language_id lang_distribution doc_fingerprint
#     tfidf_top_terms char_trigram_lm_score
# (3) fill the remaining slots from the then-oldest cohort (r03-latest,
#     ~46 queries), registration order — those roll across rounds 10-11.
# After round 10 every registered query has a driver record; from then on
# the window is pure first-records-for-new + oldest-cohort rotation.


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
