#!/usr/bin/env python
"""Scaling-curve measurement: wall-clock vs scale factor per query family.

Times representative queries at every available sf directory (default
sf0.001 / sf0.01 / sf0.1 — 100x input growth end to end) and fits the
log-log slope: wall ~ sf^beta.  beta <= ~1 means the plan scales linearly or
better in input size; beta >> 1 flags superlinear work (the thing that kills
a 100 TB run even when every small-scale test is green).

Interpretation caveats, printed with the data: at these tiny scales constant
per-query overhead (JVM task dispatch, Python UDF worker startup, plan
compilation) dominates the small end, DEFLATING beta — so the fit uses only
the top two scale points (10x apart) where data cost is visible, and the
report also prints raw walls so a reader can see the floor.  A beta near 0
therefore means "overhead-bound at test scale", not "free at 100 TB".

Usage: python tools/scaling_curve.py [--md] [query ...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIRS = [
    ("0.001", "/root/testdata/sf0.001"),
    ("0.01", "/root/testdata/sf0.01"),
    ("0.1", "/root/testdata/sf0.1"),
]

# one representative per major family, biased toward the shapes whose
# scaling could plausibly break (joins, dedup, windows, iterative)
DEFAULT_QUERIES = [
    "pricing_summary",        # scan + wide agg
    "revenue_by_nation",      # fact-fact join + dims
    "top_orders",             # join + top-k
    "sessionize_events",      # windows
    "minhash_lsh_pairs",      # LSH dedup funnel
    "ngram_jaccard_pairs",    # inverted-index pair join
    "embedding_near_dup_lsh", # vector LSH
    "cosine_topk_bruteforce", # broadcast scan ANN
    "triangle_copurchase_stats",  # graph joins
    "bfs_reach_3hop",         # iterative frontier
    "token_stats",            # text scan
    "inverted_index_postings",  # two-phase top-k
    "ks_drift_binned",        # sketch agg
    "corpus_curation_e2e",    # composed funnel
    "bm25_topk",              # filter-inside-explode ranking
    "heavy_hitters_verified", # MG sketch + broadcast recount
    "mmr_diverse_topk",       # shortlist + bounded greedy
    "salted_skew_join",       # salt-replicated fact-fact join
    "ntile_price_quartiles",  # distributed total-order ranking
    # round-5 families
    "winnow_match_pairs",     # winnowed-fingerprint inverted index
    "containment_pairs",      # asymmetric containment pair join
    "embedding_pca_covariance",  # map-side-combined Gram matrix
    "jl_random_projection",   # shuffle-free narrow projection
    "class_scatter_direction",   # scan-to-factor + driver power iteration
    "token_budget_select",    # per-source cumulative budget window
    "bloom_dedup_admission",  # fixed-size bitmap build + broadcast probe
    "kmv_set_ops_audit",      # bottom-k sketch algebra
    "pq_code_assign",         # broadcast-codebook quantization
    "ann_ivf_pq_topk",        # cells + ADC + rerank
    "pareto_frontier_docs",   # skyline via aggregated sweep
    "html_text_extract",      # map-only regex extraction
    "crawl_to_corpus_e2e",    # web-side funnel e2e
    "warc_record_extract",    # WARC stream parse in Arrow batches
    "robots_rules_apply",     # broadcast theta-join + bounded argmax window
    "media_type_sniff",       # binary magic-byte dispatch, map-only
    "seasonal_decompose_daily",  # STL-lite windows over the day spine
    "changepoint_cusum_daily",   # exact-integer CUSUM over daily aggs
    "media_png_frame_extract",   # sprite-sheet decode + stride slicing
    # round-6 families
    "bigram_lm_perplexity",      # corpus LM shuffle-joined doc scoring
    "sequence_packing_plan",     # distributed prefix-sum chunking
    "boilerplate_line_removal",  # per-source line-df join
    "hll_register_sketch",       # 64-register exact HLL
    "audio_silence_segments",    # WAV decode + RLE VAD
    "video_scene_cut_detect",    # frame decode + SAD cuts
    # round-6 late wave
    "entity_resolution_e2e",     # distinct-first block/verify/CC/canonical
    "spell_correct_symdel",      # deletion-key blocking equi-join
    "embedding_hamming_ann",     # packed-code Hamming shortlist + rerank
    "feature_hash_vectors",      # stateless signed-hash featurization
    "ams_f2_sketch",             # distinct-first sign-sum moment sketch
    "node_jaccard_similarity",   # wedge join + TakeOrdered top-k
    "copurchase_pmi_scores",     # pair-marginal PMI + TakeOrdered
    "gdpr_delete_cascade",       # FK-chain semi-join purge audit
    "triplet_mining_hard_negatives",  # anchor-batch NLJ + dual windows
    "wasserstein_drift_binned",  # bin-sketch CDF distance
    "theil_sen_daily_trend",     # day-spine pairwise median slope
    "join_skew_diagnosis",       # frequency pass + salt recommendation
    "seasonal_naive_backtest",   # day-spine lag backtest
    "conversion_ab_ztest",       # per-user collapse + O(1) test
    "hll_mergeability_audit",    # conditional-max registers, one scan
    "dedup_rate_curve",          # prefix-expanded distinct counts
    "markov_next_event_accuracy",  # user-window transitions + argmax
    "hilbert_vs_zorder_locality",  # chained bit-walk + segment bbox audit
    "stream_hll_registers",        # streaming 64-row sketch state
    "pass_at_k_eval",              # task-bounded attempt grid
    "event_trigram_funnels",       # shared-window dual lead + TakeOrdered
    "daily_anomaly_mad",           # rank-selected medians per stream
    "provenance_hash_rollup",      # two-level Merkle manifest
    "encoding_advisor",            # page-blocked run counting
    "annotator_kappa",             # one-scan agreement table
    "prefix_sharing_stats",        # bounded-slice md5 grouping
    "embedding_norm_audit",        # per-vector projection histogram
    "dedup_token_savings",         # hash-key keeper attribution join
    "context_window_fit_report",   # single-agg token-fit counters
    "simpsons_paradox_check",      # dim join + segment rollup
    "source_vocab_jaccard_matrix", # distinct-first source-level index
    "blocklist_filter_report",     # filter-inside-explode lexicon gate
    "qi_uniqueness_report",        # bounded QI rollups
    "cc_consistency_audit",        # pair pipeline + CC closure join
    "funnel_order_cost_report",    # one cached scan, both orderings
    "kcore_2_peeling",             # iterative degree-filter rounds
    "shuffled_dup_detect",         # per-doc token sort fingerprints
    "bradley_terry_strengths",     # arms-bounded match grid + ordered fold
    "neyman_allocation_plan",      # moment pass + O(strata) arithmetic
    "session_gap_sensitivity",     # one lag window, three thresholds
    "good_turing_smoothing",       # count-of-counts over the freq table
    "colbert_maxsim_topk",         # multi-vector MaxSim broadcast scan
    "supplier_return_wilson",      # proportion leaderboard moment pass
    "discount_quantity_elasticity",  # dim join + regression moments
    "trade_flow_matrix",           # Q7 snowflake, dual broadcast arms
    "small_quantity_order_revenue",  # Q17 decorrelated scalar agg
    "colbert_maxsim_ivf_topk",     # IVF shortlist -> MaxSim rerank
    "serving_retrieval_e2e",       # hybrid serving path composed e2e
    # round-8 additions
    "min_cost_supplier_per_part",  # Q2 argmin + join-back
    "market_share_by_year",        # Q8 conditional share-of-total
    "profit_by_nation_year",       # Q9 snowflake profit rollup
    "quantity_concentration_parts",  # Q11 group vs global scalar
    "top_revenue_suppliers",       # Q15 max-of-aggregate
    "brand_bucket_supplier_counts",  # Q16 anti-join + count distinct
    "large_order_customers_detail",  # Q18 HAVING join-back
    "disjunctive_predicate_revenue",  # Q19 OR-of-conjunctions
    "promo_part_recent_suppliers",  # Q20 nested semi chain
    "sole_late_supplier_report",   # Q21 window-decorrelated exists pair
    "mann_whitney_value_shift",    # midrank U test, bucketed spine
    "spearman_spend_orders",       # rank correlation, bucketed spines
    "cuped_adjusted_conversion",   # per-user covariate adjust
    "brier_score_decomposition",   # 10-bin calibration decomposition
    "mcnemar_model_disagreement",  # paired-model counts
    "sprt_daily_monitor",          # cumulative llr over day spine
    "kneser_ney_bigram",           # KN smoothing, vocab-bounded joins
    "cross_source_bigram_bleu",    # clipped precision vs rest
    "cross_source_duplication_matrix",  # distinct-first fingerprint pairs
    "l_diversity_audit",           # QI-group distinct-sensitive counts
    "elo_rating_periods",          # bounded-collect driver fold
    "activity_streak_histogram",   # gaps & islands per user
    "autocorrelation_daily_revenue",  # lag joins on day spine
    "interevent_burstiness",       # per-stream lag + integer moments
    "rfm_segmentation",            # three bucketed CDFs + code rollup
    "local_clustering_coefficient",  # per-node triangle closure
    "experiment_readout_e2e",      # CUPED + SPRT + MW composed
    "kaplan_meier_conversion",     # censored survival on duration spine
    "mann_kendall_trend",          # day-spine pair join, integer S
    "herfindahl_concentration",    # integer share-squared rollup
    "cohort_ltv_matrix",           # cohort x age cumulative matrix
    "span_corruption_plan",        # position explode + mask stats
    "fim_split_plan",              # O(1) hash cuts per doc
    "t_closeness_audit",           # QI-group TVD vs global, integer
    "text_lines_roundtrip",        # text sink/source interchange
    "ab_srm_check",                # distinct-user variant chi-square
    "join_cardinality_audit",      # histogram-predicted join size
    "filter_selectivity_audit",    # one-scan conjunctive selectivity
    "diff_in_diff_revenue",        # 2x2 causal contrast cells
    "pareto_revenue_deciles",      # Lorenz deciles via CDF spine
    "basket_affinity_rules",       # capped-basket directional rules
    "kfold_assignment_audit",      # hash-fold balance rollup
    "class_weight_plan",           # inverse-frequency label weights
]


def main() -> int:
    md = "--md" in sys.argv
    names = [a for a in sys.argv[1:] if not a.startswith("--")] or DEFAULT_QUERIES

    from datapipeline_ops_spark.operators.dedup import clear_barriers
    from datapipeline_ops_spark.queries import QUERIES
    from datapipeline_ops_spark.session import get_spark

    spark = get_spark("scaling-curve")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIRS[0][1]}/region.parquet").count()

    results = []
    for name in names:
        spec = QUERIES.get(name)
        if spec is None:
            continue
        walls = {}
        try:
            # warm-up at the smallest sf pays codegen/compilation once
            clear_barriers()
            spec.fn(spark, SF_DIRS[0][1]).count()
            for sf, d in SF_DIRS:
                clear_barriers()
                t0 = time.time()
                spec.fn(spark, d).count()
                walls[sf] = round(time.time() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            results.append({"query": name, "error": str(exc)[:160]})
            continue
        # slope over the top two points (10x apart); the smallest point is
        # overhead-dominated and would deflate the fit
        b = math.log(walls["0.1"] / walls["0.01"]) / math.log(10.0)
        results.append({"query": name, "walls": walls, "beta_top_decade": round(b, 3)})

    if md:
        print("# SCALING CURVE — generated by tools/scaling_curve.py")
        print()
        print("wall ~ sf^beta over the top decade (sf0.01 -> sf0.1, 10x rows);")
        print("beta <= ~1 = linear-or-better in input size; beta near 0 =")
        print("overhead-bound at test scale (see tool docstring for caveats).")
        print()
        print("| query | sf0.001 s | sf0.01 s | sf0.1 s | beta (top decade) |")
        print("| --- | --- | --- | --- | --- |")
        for r in results:
            if "error" in r:
                print(f"| {r['query']} | err | err | err | {r['error'][:40]} |")
                continue
            w = r["walls"]
            print(f"| {r['query']} | {w['0.001']} | {w['0.01']} | {w['0.1']} | {r['beta_top_decade']} |")
        bad = [r["query"] for r in results if r.get("beta_top_decade", 0) > 1.3]
        print()
        print(f"Superlinear flags (beta > 1.3): {bad if bad else 'none'}")
    else:
        for r in results:
            print(json.dumps(r))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
