"""Cross-engine fuzz: hypothesis-generated CONTRACT-CONFORMING micro-tables
(2-dp money, integer quantities, whole-percent discounts, the fixed
catalog calendar) run through registered queries AND their DuckDB oracles,
compared with the driver gate's own normalizer (tools/check_correctness).

The per-round mimic gate uses the fixed testdata; this harness moves the
inputs — random tie patterns, missing 2x2 cells, empty date windows,
single-day calendars — while holding the schema contract, so any
engine-divergence that only shows on an input shape the testdata never
produces is caught here first.

Rounding contract: exact-decimal outputs must use the integer-space
helpers in ``functions/money.py``; a divergence on a ``round(double, N)``
column is NOT a finding if the query is in money.py's PINNED-EXCEPTIONS
inventory (genuinely irrational families — stddev/log/RMSE/irrational
means) AND both engines share the op order — re-read that docstring
before filing one.
"""

import os
import sys

import duckdb
from hypothesis import HealthCheck, given, settings, strategies as st

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
from check_correctness import value_hash  # noqa: E402

from datapipeline_ops_spark.queries import QUERIES

# Soak knob: the per-round suite runs 4 examples per family group; a deep
# soak (SPARK_GRAFT_FUZZ_EXAMPLES=25 python -m pytest tests/test_fuzz_...)
# re-rolls every group with fresh inputs — any divergence it finds is one
# the driver gate would never see.
_SETTINGS = dict(
    max_examples=int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "4")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_DATES = [
    "1995-01-01", "1995-07-15", "1996-02-01", "1996-03-31", "1998-12-31",
    "1999-01-01", "2000-06-15", "2001-07-31",
]
_SHIP_OFFSETS = [0, 1, 30, 59, 60, 61, 90, 120]


def _run_pair(spark, tmp_path, names, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{tmp_path}/{t}.parquet'")
    for name in names:
        spec = QUERIES[name]
        sdf = spec.fn(spark, str(tmp_path))
        scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
        cur = con.execute(spec.oracle)
        dcols = [d[0] for d in cur.description]
        drows = cur.fetchall()
        assert len(srows) == len(drows), (name, len(srows), len(drows))
        assert sorted(scols) == sorted(dcols), (name, scols, dcols)
        hs, hd = value_hash(scols, srows), value_hash(dcols, drows)
        assert hs == hd, (name, sorted(srows)[:3], sorted(drows)[:3])


def _write_dims(tmp_path):
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT i AS r_regionkey,
                        'REGION_' || i AS r_name
                 FROM range(3) t(i))
            TO '{tmp_path}/region.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT CAST(i AS INT) AS n_nationkey,
                        'NATION_' || i AS n_name,
                        CAST(i % 3 AS INT) AS n_regionkey
                 FROM range(6) t(i))
            TO '{tmp_path}/nation.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT CAST(i + 1 AS BIGINT) AS s_suppkey,
                        'Supplier#' || i AS s_name,
                        CAST(i % 6 AS INT) AS s_nationkey,
                        CAST(CASE WHEN i % 3 = 0 THEN -50.25
                                  ELSE 100.50 END AS DOUBLE) AS s_acctbal
                 FROM range(4) t(i))
            TO '{tmp_path}/supplier.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT CAST(i + 1 AS BIGINT) AS c_custkey,
                        'Customer#' || i AS c_name,
                        CAST(i % 6 AS INT) AS c_nationkey,
                        CAST(10.00 * i AS DOUBLE) AS c_acctbal,
                        'SEG_' || (i % 2) AS c_mktsegment
                 FROM range(6) t(i))
            TO '{tmp_path}/customer.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT CAST(i + 1 AS BIGINT) AS p_partkey,
                        CASE WHEN i % 2 = 0 THEN 'small ring'
                             ELSE 'red widget' END AS p_name,
                        'Brand#1' || (i % 3) AS p_brand,
                        CASE WHEN i % 2 = 0 THEN 'PROMO'
                             ELSE 'LARGE' END AS p_type,
                        CAST(1 + i * 10 AS INT) AS p_size,
                        CAST(900.0 + i AS DOUBLE) AS p_retailprice
                 FROM range(5) t(i))
            TO '{tmp_path}/part.parquet' (FORMAT PARQUET)"""
    )


def _copy_rows(tmp_path, table, columns, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    data = {c: [r[i] for r in rows] for i, (c, _) in enumerate(columns)}
    schema = pa.schema([(c, t) for c, t in columns])
    pq.write_table(pa.table(data, schema=schema), f"{tmp_path}/{table}.parquet")


_ORDER_ROW = st.tuples(
    st.integers(min_value=1, max_value=6),          # custkey
    st.sampled_from("POF"),                         # status
    st.integers(min_value=10_000, max_value=50_000_000),  # total cents
    st.sampled_from(_DATES),                        # orderdate
    st.sampled_from(["1-URGENT", "3-MEDIUM", "5-LOW"]),
)

_LINE_ROW = st.tuples(
    st.integers(min_value=1, max_value=5),          # partkey
    st.integers(min_value=1, max_value=4),          # suppkey
    st.integers(min_value=1, max_value=50),         # quantity
    st.integers(min_value=90_182, max_value=10_499_788),  # ext cents
    st.integers(min_value=0, max_value=10),         # discount pct
    st.sampled_from("RNA"),                         # returnflag
    st.sampled_from(_SHIP_OFFSETS),                 # ship offset days
)


def _write_orders_lineitem(tmp_path, orders, lines, seed):
    import datetime
    import pyarrow as pa

    _write_dims(tmp_path)
    o_rows = []
    for i, (ck, status, cents, d, prio) in enumerate(orders):
        o_rows.append(
            (
                i + 1,
                ck,
                status,
                cents / 100.0,
                datetime.datetime.fromisoformat(d),
                prio,
            )
        )
    _copy_rows(
        tmp_path,
        "orders",
        [
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_orderstatus", pa.string()),
            ("o_totalprice", pa.float64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_orderpriority", pa.string()),
        ],
        o_rows,
    )
    l_rows = []
    for i, (pk, sk, qty, cents, disc, rf, off) in enumerate(lines):
        okey = (i + seed) % len(o_rows) + 1
        base = o_rows[okey - 1][4]
        l_rows.append(
            (
                okey,
                pk,
                sk,
                i + 1,
                float(qty),
                cents / 100.0,
                disc / 100.0,
                0.04,
                rf,
                "O",
                base + datetime.timedelta(days=off),
            )
        )
    _copy_rows(
        tmp_path,
        "lineitem",
        [
            ("l_orderkey", pa.int64()),
            ("l_partkey", pa.int64()),
            ("l_suppkey", pa.int64()),
            ("l_linenumber", pa.int32()),
            ("l_quantity", pa.float64()),
            ("l_extendedprice", pa.float64()),
            ("l_discount", pa.float64()),
            ("l_tax", pa.float64()),
            ("l_returnflag", pa.string()),
            ("l_linestatus", pa.string()),
            ("l_shipdate", pa.timestamp("us")),
        ],
        l_rows,
    )

_OL_TABLES = ["region", "nation", "supplier", "customer", "part", "orders", "lineitem"]

# The orders/lineitem families are split into bounded groups: a single test
# function over the full list exceeds the harness timeout (4 hypothesis
# examples x ~90 query pairs), and -x granularity per group localizes any
# divergence to ~25 families.
_OL_GROUP_A = [
    "min_cost_supplier_per_part",
    "quantity_concentration_parts",
    "top_revenue_suppliers",
    "large_order_customers_detail",
    "sole_late_supplier_report",
    "market_share_by_year",
    "herfindahl_concentration",
    "cohort_ltv_matrix",
    "elo_rating_periods",
    "rfm_segmentation",
    "pareto_revenue_deciles",
    "mann_kendall_trend",
    "autocorrelation_daily_revenue",
    "diff_in_diff_revenue",
    "spearman_spend_orders",
    "join_cardinality_audit",
    "filter_selectivity_audit",
    "basket_affinity_rules",
    # legacy families on the same tables
    "pricing_summary",
    "group_count",
    "group_avg",
    "returnflag_share",
    "customer_order_histogram",
]

_OL_GROUP_B = [
    "orders_by_weekday",
    "monthly_revenue_trend",
    "top_orders",
    "semi_join",
    "broadcast_dim_join",
    "trade_flow_matrix",
    "small_quantity_order_revenue",
    "above_avg_parts",
    "having_big_customers",
    "distinct_agg_suppliers",
    "promo_revenue_share",
    "returned_revenue_by_nation",
    "idle_big_balance_customers",
    "priority_with_big_lineitem",
    "brand_size_rank",
    "price_stats_by_flag",
    # round-9 additions: TPC-H HAVING floors + the exactness-swept
    # legacy money aggregates (integer-cents migration)
    "profit_by_nation_year",
    "brand_bucket_supplier_counts",
    "disjunctive_predicate_revenue",
    "promo_part_recent_suppliers",
    "revenue_by_nation",
    "unpivot_order_metrics",
    "salted_skew_join",
]

_OL_GROUP_C = [
    "monthly_spine_gap_fill",
    "local_clustering_coefficient",
    # round-9 wave 2: unfuzzed families with normalizers/thresholds
    "theil_sen_daily_trend",
    "seasonal_naive_backtest",
    "simpsons_paradox_check",
    "supplier_return_wilson",
    "discount_quantity_elasticity",
    "benford_price_check",
    "join_skew_diagnosis",
    "copurchase_pmi_scores",
    "qi_uniqueness_report",
    # round-10 wave 3a: the r02/r03 rotation cohorts land on fuzz-hardened
    # code — relational exactness + CDC/window families
    "revenue_by_region_year",
    "decimal_exact_totals",
    "salted_group_agg",
    "ntile_price_quartiles",
    "overlapping_order_windows",
    "snapshot_diff_cdc",
    "merge_upsert_apply",
    "copurchase_part_pairs",
    "threshold_filter",
    "band_filter",
    "multi_predicate_filter",
    "count_in_range_filter",
]

_OL_GROUP_D = [
    # round-10 wave 3b: never-fuzzed window/segment/graph/profile families
    # on the same micro-catalog
    "running_best_max_by",
    "bin_argmax",
    "topk_per_group",
    "anti_join_idempotency",
    "segment_plan",
    "segment_summary",
    "frame_sample_ref",
    "frame_sample_scan",
    "retry_cut_status",
    "set_ops_segments",
    "fuzzy_name_pairs",
    "pagerank_purchase_graph",
    "triangle_copurchase_stats",
    "bfs_reach_3hop",
    "kcore_2_peeling",
    "table_profile",
    "expectations_report",
    "column_correlation_matrix",
    "zorder_layout",
    "rare_category_collapse",
    "node_jaccard_similarity",
]

_OL_GIVEN = dict(
    orders=st.lists(_ORDER_ROW, min_size=4, max_size=24),
    lines=st.lists(_LINE_ROW, min_size=4, max_size=48),
    seed=st.integers(min_value=0, max_value=10_000),
)


@settings(**_SETTINGS)
@given(**_OL_GIVEN)
def test_fuzz_ol_group_a(spark, tmp_path_factory, orders, lines, seed):
    tmp_path = tmp_path_factory.mktemp("fuzz_ol")
    _write_orders_lineitem(tmp_path, orders, lines, seed)
    _run_pair(spark, tmp_path, _OL_GROUP_A, _OL_TABLES)


@settings(**_SETTINGS)
@given(**_OL_GIVEN)
def test_fuzz_ol_group_b(spark, tmp_path_factory, orders, lines, seed):
    tmp_path = tmp_path_factory.mktemp("fuzz_ol")
    _write_orders_lineitem(tmp_path, orders, lines, seed)
    _run_pair(spark, tmp_path, _OL_GROUP_B, _OL_TABLES)


@settings(**_SETTINGS)
@given(**_OL_GIVEN)
def test_fuzz_ol_group_c(spark, tmp_path_factory, orders, lines, seed):
    tmp_path = tmp_path_factory.mktemp("fuzz_ol")
    _write_orders_lineitem(tmp_path, orders, lines, seed)
    _run_pair(spark, tmp_path, _OL_GROUP_C, _OL_TABLES)


@settings(**_SETTINGS)
@given(**_OL_GIVEN)
def test_fuzz_ol_group_d(spark, tmp_path_factory, orders, lines, seed):
    tmp_path = tmp_path_factory.mktemp("fuzz_ol")
    _write_orders_lineitem(tmp_path, orders, lines, seed)
    _run_pair(spark, tmp_path, _OL_GROUP_D, _OL_TABLES)


_EVENT_ROW = st.tuples(
    st.integers(min_value=0, max_value=29),   # day in Jan 2024
    st.integers(min_value=0, max_value=86_399),  # second of day
    st.integers(min_value=1, max_value=8),    # user
    st.sampled_from(["click", "view", "purchase", "signup", "error"]),
    st.integers(min_value=1, max_value=49_002),  # value cents
)


@settings(**_SETTINGS)
@given(events=st.lists(_EVENT_ROW, min_size=6, max_size=60))
def test_fuzz_events_queries(spark, tmp_path_factory, events):
    import datetime
    import pyarrow as pa

    tmp_path = tmp_path_factory.mktemp("fuzz_ev")
    rows = []
    for i, (day, sec, user, etype, cents) in enumerate(events):
        ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(days=day, seconds=sec)
        rows.append((i + 1, ts, user, etype, cents / 100.0, "{}"))
    _copy_rows(
        tmp_path,
        "events",
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ],
        rows,
    )
    _run_pair(
        spark,
        tmp_path,
        [
            "mann_whitney_value_shift",
            "sprt_daily_monitor",
            "cuped_adjusted_conversion",
            "ab_srm_check",
            "activity_streak_histogram",
            "interevent_burstiness",
            "kaplan_meier_conversion",
            # legacy families on events
            "sessionize_events",
            "funnel_conversion",
            "retention_cohorts",
            "value_percentiles_by_type",
            "histogram_equi_width",
            "new_vs_returning_daily",
            "cumulative_users_daily",
            "daily_anomaly_zscore",
            "event_bigram_paths",
            "user_event_type_map",
            # round-9 additions: swept cents aggregates + rank-spine ties
            "range_join_value_bands",
            "cube_events_report",
            "time_range_rolling_sum",
            "experiment_readout_e2e",
            # round-9 wave 2
            "wow_type_delta",
            "conversion_ab_ztest",
            "markov_next_event_accuracy",
            "power_sample_size_calc",
            "chi2_type_by_dow",
            "info_gain_type_by_dow",
            "twap_per_user",
            "changepoint_cusum_daily",
            "multi_touch_attribution",
            "winsorized_value_stats",
            "neyman_allocation_plan",
            "ks_drift_binned",
        ],
        ["events"],
    )


_EVENT_PROPS_ROW = st.tuples(
    _EVENT_ROW,
    # props variant: None -> NULL, 0 -> "{}", k>0 -> {"k": k}
    st.one_of(st.none(), st.integers(min_value=0, max_value=120)),
)


@settings(**_SETTINGS)
@given(events=st.lists(_EVENT_PROPS_ROW, min_size=6, max_size=60))
def test_fuzz_events_wave4(spark, tmp_path_factory, events):
    """Round-10 wave 4c: never-fuzzed events families — JSON props
    extraction, the freshly integer-migrated MV/pivot aggregates, as-of /
    SCD2 temporal joins, and the window/feature family."""
    import datetime
    import pyarrow as pa

    tmp_path = tmp_path_factory.mktemp("fuzz_ev4")
    rows = []
    for i, ((day, sec, user, etype, cents), k) in enumerate(events):
        ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(days=day, seconds=sec)
        props = None if k is None else ("{}" if k == 0 else '{"k": %d}' % k)
        rows.append((i + 1, ts, user, etype, cents / 100.0, props))
    _copy_rows(
        tmp_path,
        "events",
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ],
        rows,
    )
    _run_pair(
        spark,
        tmp_path,
        [
            "json_props_extract",
            "variant_props_stats",
            "null_guard_filter",
            "incremental_mv_refresh",
            "events_type_pivot",
            "asof_click_to_purchase",
            "scd2_user_state",
            "ohlc_time_bars",
            "lead_lag_deltas",
            "rolling_window_avg",
            "percent_rank_features",
            "partition_skew_report",
            "daily_anomaly_mad",
            "time_to_convert_quantiles",
            "dead_letter_split",
            "freshness_sla_report",
        ],
        ["events"],
    )


_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]

_DOC_ROW = st.tuples(
    st.lists(st.sampled_from(_WORDS), min_size=1, max_size=12),
    st.sampled_from(["en", "de"]),
    st.sampled_from(["web", "books", "code"]),
)


@settings(**_SETTINGS)
@given(docs=st.lists(_DOC_ROW, min_size=3, max_size=16))
def test_fuzz_documents_queries(spark, tmp_path_factory, docs):
    import pyarrow as pa

    tmp_path = tmp_path_factory.mktemp("fuzz_doc")
    rows = []
    for i, (words, lang, source) in enumerate(docs):
        text = " ".join(words)
        rows.append((i + 1, text, lang, source, len(text)))
    _copy_rows(
        tmp_path,
        "documents",
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ],
        rows,
    )
    _run_pair(
        spark,
        tmp_path,
        [
            "kneser_ney_bigram",
            "cross_source_bigram_bleu",
            "cross_source_duplication_matrix",
            "l_diversity_audit",
            "t_closeness_audit",
            "span_corruption_plan",
            "fim_split_plan",
            "brier_score_decomposition",
            "mcnemar_model_disagreement",
            # legacy families on documents
            "dedup_exact",
            "token_stats",
            "language_id",
            "lang_distribution",
            "k_anonymity_audit",
            "quality_score",
            "gopher_quality_flags",
            "flesch_readability",
            "repetition_report",
            "entropy_by_source",
            "doc_fingerprint",
            "minhash_signatures",
            "simhash_fingerprints",
            "ngram_jaccard_pairs",
            "shuffled_dup_detect",
            "good_turing_smoothing",
            "bigram_lm_perplexity",
            "kfold_assignment_audit",
            "pretrain_prep_e2e",
            # round-9 wave 2
            "ngram_novelty_rate",
            "dedup_rate_curve",
            "dedup_token_savings",
            "decontaminate_overlap",
            "mixture_temperature_weights",
            "exact_substring_spans",
            "containment_pairs",
            "boilerplate_line_removal",
            "tokenizer_fertility_by_lang",
            "tfidf_top_terms",
            "char_trigram_lm_score",
            "zipf_slope_fit",
            "oov_rate_report",
            "js_divergence_sources",
            "vocab_coverage_curve",
            "bm25_topk",
            "dataset_card_report",
            "calibration_ece_report",
            "bradley_terry_strengths",
            "quality_gate_correlation",
        ],
        ["documents"],
    )


@settings(**_SETTINGS)
@given(docs=st.lists(_DOC_ROW, min_size=3, max_size=16))
def test_fuzz_documents_wave4(spark, tmp_path_factory, docs):
    """Round-10 wave 4d: never-fuzzed token-stats / sampling / curriculum
    families on the documents micro-table."""
    import pyarrow as pa

    tmp_path = tmp_path_factory.mktemp("fuzz_doc4")
    rows = []
    for i, (words, lang, source) in enumerate(docs):
        text = " ".join(words)
        rows.append((i + 1, text, lang, source, len(text)))
    _copy_rows(
        tmp_path,
        "documents",
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ],
        rows,
    )
    _run_pair(
        spark,
        tmp_path,
        [
            "vocab_top_tokens",
            "gini_by_source",
            "bpe_ish_token_count",
            "text_normalize_stats",
            "inverted_index_postings",
            "lang_confusion_matrix",
            "deterministic_sample",
            "stratified_sample_per_source",
            "dataset_split_assign",
            "split_leakage_audit",
            "compaction_plan",
            "token_budget_select",
            "curriculum_length_buckets",
            "prefix_sharing_stats",
            "chunk_overlap_plan",
            "bpe_pair_counts",
            # round-10 capability wave
            "tokenizer_roundtrip_audit",
            "dedup_manifest_reconcile",
            # round-11 capability wave
            "contamination_decay_audit",
            "tokenizer_swap_impact",
            "dedup_tau_sensitivity",
            "epoch_repeat_plan",
            "epoch_shuffle_audit",
            "scaling_law_subsets",
            "packing_fill_sweep",
        ],
        ["documents"],
    )

# first component >= 1: the engine-wide contract (functions/vectors.py) is
# NON-ZERO embeddings — zero-norm vectors are quarantined upstream by
# embedding_norm_audit, so cosine stages divide unguarded in both engines.
_EMB_ROW = st.tuples(
    st.tuples(
        st.integers(min_value=1, max_value=200),
        st.lists(
            st.integers(min_value=-200, max_value=200),
            min_size=63,
            max_size=63,
        ),
    ).map(lambda t: [t[0]] + t[1]),
    st.integers(min_value=0, max_value=9),
)


@settings(**_SETTINGS)
@given(embs=st.lists(_EMB_ROW, min_size=12, max_size=40))
def test_fuzz_embeddings_queries(spark, tmp_path_factory, embs):
    tmp_path = tmp_path_factory.mktemp("fuzz_emb")
    _write_embeddings(tmp_path, embs)
    _run_pair(
        spark,
        tmp_path,
        [
            "cosine_topk_bruteforce",
            "embedding_norm_audit",
            "embedding_near_dup",
            "ann_lsh_buckets",
            "embedding_int8_quant",
            "label_centroids",
            "class_weight_plan",
            # round-9 wave 2
            "embedding_centroid_drift",
            "jl_random_projection",
            "mrl_truncation_eval",
        ],
        ["embeddings"],
    )


def _write_embeddings(tmp_path, embs):
    import pyarrow as pa

    # values are k/100 floats: exact in float32, so the float64 upcast both
    # engines perform before the ordered-fold dot products is identical
    rows = [
        (i, [v / 100.0 for v in vec], label)
        for i, (vec, label) in enumerate(embs)
    ]
    _copy_rows(
        tmp_path,
        "embeddings",
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ],
        rows,
    )


@settings(**_SETTINGS)
@given(embs=st.lists(_EMB_ROW, min_size=12, max_size=40))
def test_fuzz_embeddings_wave4(spark, tmp_path_factory, embs):
    """Round-10 wave 4a: the never-fuzzed decomposition / quantization /
    diversity / ANN families on the same micro-embedding strategy."""
    tmp_path = tmp_path_factory.mktemp("fuzz_emb4")
    _write_embeddings(tmp_path, embs)
    _run_pair(
        spark,
        tmp_path,
        [
            "embedding_pca_covariance",
            "class_scatter_direction",
            "pq_code_assign",
            "embedding_anisotropy",
            "mmr_diverse_topk",
            "embedding_hamming_ann",
            "triplet_mining_hard_negatives",
            "udf_pair_similarity_band",
            "ann_ivf_topk",
            "ann_rerank_l2",
            # round-11 capability wave
            "int8_serving_parity",
            "ann_probe_recall_curve",
            "ivf_cell_balance",
        ],
        ["embeddings"],
    )


@settings(**_SETTINGS)
@given(embs=st.lists(_EMB_ROW, min_size=12, max_size=40))
def test_fuzz_eval_serving_wave4(spark, tmp_path_factory, embs):
    """Round-10 wave 4b: retrieval-evaluation and serving families — the
    r02/r03 rotation cohort lands on fuzz-hardened code. The hybrid /
    serving / LSH-recall families also read documents (BM25 lexical leg),
    so a small deterministic corpus rides along with the fuzzed vectors."""
    import pyarrow as pa

    tmp_path = tmp_path_factory.mktemp("fuzz_eval4")
    _write_embeddings(tmp_path, embs)
    doc_rows = [
        (i + 1, " ".join(_WORDS[(i + j) % len(_WORDS)] for j in range(1 + i % 5)),
         ["en", "de"][i % 2], ["web", "books", "code"][i % 3])
        for i in range(12)
    ]
    _copy_rows(
        tmp_path,
        "documents",
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ],
        [(d, t, lg, s, len(t)) for d, t, lg, s in doc_rows],
    )
    _run_pair(
        spark,
        tmp_path,
        [
            "eval_rmse_report",
            "eval_angular_error",
            "eval_dataset_means",
            "eval_tonemap",
            "ann_recall_eval",
            "ann_ndcg_eval",
            "hybrid_rrf_fusion",
            "lsh_pair_recall_eval",
            "ann_ivfpq_recall_eval",
            "serving_retrieval_e2e",
            # round-10 capability wave
            "serving_eval_gate_e2e",
        ],
        ["embeddings", "documents"],
    )


_DIRTY_FIELD = st.one_of(
    st.none(),
    st.sampled_from(["web", "bo\toks", "co de", "x\ty\tz", ""]),
)


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(_WORDS),
            _DIRTY_FIELD,
            _DIRTY_FIELD,
        ),
        min_size=2,
        max_size=12,
    )
)
def test_fuzz_text_lines_dirty_contract(spark, tmp_path_factory, docs):
    """text_lines_roundtrip's writer-enforced contract: NULL lang/source
    become the \\N sentinel and embedded tabs become spaces, identically
    in the Spark writer and the DuckDB oracle — the exact inputs the
    tab-joined text format cannot carry natively."""
    import pyarrow as pa

    tmp_path = tmp_path_factory.mktemp("fuzz_txt")
    rows = [
        (i + 1, w, lang, source, len(w))
        for i, (w, lang, source) in enumerate(docs)
    ]
    _copy_rows(
        tmp_path,
        "documents",
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ],
        rows,
    )
    _run_pair(spark, tmp_path, ["text_lines_roundtrip"], ["documents"])


# ---------------------------------------------------------------------------
# Wave 5 (round 10): every remaining batch family — only the 11 streaming
# drains stay outside the fuzz net (stateful checkpoint actions; the driver
# gate covers them). The wave-5 documents strategy mixes digit-bearing and
# digit-free sources: robots_rules_apply / domain_mixing_sample key their
# rule tables off the source's embedded number, and the digit-free path is
# exactly where the ANSI-cast crash this wave caught used to live. Tokens
# include markup / emails / digits so the HTML, PII, and tokenizer regexes
# see non-trivial matches, not just [a-z]+ words.
# ---------------------------------------------------------------------------

_W5_TOKENS = _WORDS + [
    "alpha3", "x9y", "<p>hi</p>", "<b>Z</b>", "a@b.com", "tel:555-0100",
    "HTTP://Ex.COM/A?b=1", "omega", "42",
]

_W5_DOC_ROW = st.tuples(
    st.lists(st.sampled_from(_W5_TOKENS), min_size=1, max_size=14),
    st.sampled_from(["en", "de"]),
    st.sampled_from(["web", "src3", "src12", "code"]),
)


def _write_w5_docs(tmp_path, docs):
    import pyarrow as pa

    rows = []
    for i, (words, lang, source) in enumerate(docs):
        text = " ".join(words)
        rows.append((i + 1, text, lang, source, len(text)))
    _copy_rows(
        tmp_path,
        "documents",
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ],
        rows,
    )


@settings(**_SETTINGS)
@given(docs=st.lists(_W5_DOC_ROW, min_size=3, max_size=16))
def test_fuzz_documents_wave5_dedup(spark, tmp_path_factory, docs):
    """Wave 5a: the fingerprint/near-dup/admission families."""
    tmp_path = tmp_path_factory.mktemp("fuzz_doc5a")
    _write_w5_docs(tmp_path, docs)
    _run_pair(
        spark,
        tmp_path,
        [
            "dedup_exact_keepers",
            "minhash_lsh_pairs",
            "minhash_estimate_audit",
            "simhash_near_pairs",
            "neardup_clusters",
            "neardup_cluster_sizes",
            "neardup_cluster_purity",
            "winnowing_fingerprints",
            "winnow_match_pairs",
            "incremental_dedup",
            "bloom_dedup_admission",
            "url_canonical_dedup",
            "cc_consistency_audit",
            "neardup_split_leakage",
            "inbatch_negative_collisions",
            "minhash_vs_simhash_agreement",
            "dedup_removal_impact",
            "neardup_chain_overmerge",
            "crosslingual_neardup_rate",
            "spell_correct_symdel",
            "sentence_split_udtf",
        ],
        ["documents"],
    )


@settings(**_SETTINGS)
@given(docs=st.lists(_W5_DOC_ROW, min_size=3, max_size=16))
def test_fuzz_documents_wave5_web(spark, tmp_path_factory, docs):
    """Wave 5b: web-curation gates and the corpus report/e2e compositions."""
    tmp_path = tmp_path_factory.mktemp("fuzz_doc5b")
    _write_w5_docs(tmp_path, docs)
    _run_pair(
        spark,
        tmp_path,
        [
            "html_text_extract",
            "pii_redact",
            "quality_classifier_score",
            "quality_filter_sweep",
            "train_quality_classifier",
            "trained_gate_impact",
            "trained_gate_artifact_apply",
            "trained_gate_calibration",
            "trained_gate_feature_ablation",
            "minibatch_sgd_train",
            "blocklist_filter_report",
            "robots_rules_apply",
            "warc_record_extract",
            "crawl_schedule_plan",
            "crawl_to_corpus_e2e",
            "corpus_curation_e2e",
            "pretrain_data_e2e",
            "corpus_report_card",
            "rollup_corpus_report",
            "grouping_sets_report",
        ],
        ["documents"],
    )


@settings(**_SETTINGS)
@given(docs=st.lists(_W5_DOC_ROW, min_size=3, max_size=16))
def test_fuzz_documents_wave5_select(spark, tmp_path_factory, docs):
    """Wave 5c: pretrain packing/selection/sampling and label-eval families."""
    tmp_path = tmp_path_factory.mktemp("fuzz_doc5c")
    _write_w5_docs(tmp_path, docs)
    _run_pair(
        spark,
        tmp_path,
        [
            "rag_chunk_plan",
            "token_chunk_udtf",
            "context_window_fit_report",
            "sequence_packing",
            "sequence_packing_plan",
            "bpe_merge_step",
            "bpe_train_loop",
            "bpe_vocab_apply",
            "bpe_artifact_apply",
            "source_vocab_jaccard_matrix",
            "pareto_frontier_docs",
            "domain_mixing_sample",
            "dsir_importance_weights",
            "feature_hash_vectors",
            "train_test_split_leakfree",
            "provenance_hash_rollup",
            "dp_noisy_histogram",
            "annotator_kappa",
            "auc_binned_report",
            "weighted_sample_aes",
            "weighted_sample_per_source",
            "funnel_order_cost_report",
            "pass_at_k_eval",
            "heavy_hitters_verified",
            "lsh_tuning_report",
            "mixture_realized_audit",
        ],
        ["documents"],
    )


@settings(**_SETTINGS)
@given(docs=st.lists(_W5_DOC_ROW, min_size=3, max_size=16))
def test_fuzz_documents_wave5_media(spark, tmp_path_factory, docs):
    """Wave 5d: the media/binary plumbing — PNG/WAV codecs, frame sampling,
    decode stubs, manifests, UDF gates, and the media e2e compositions all
    synthesize their binary columns deterministically from the fuzzed doc
    rows, so the whole Arrow-batch path moves with the corpus."""
    tmp_path = tmp_path_factory.mktemp("fuzz_doc5d")
    _write_w5_docs(tmp_path, docs)
    _run_pair(
        spark,
        tmp_path,
        [
            "media_type_sniff",
            "media_png_roundtrip",
            "media_wav_probe",
            "media_manifest",
            "media_decode_stub",
            "media_frame_sample",
            "media_resize_stub",
            "media_png_resize",
            "media_png_frame_extract",
            "media_phash_neardup",
            "audio_fingerprint_neardup",
            "media_curation_e2e",
            "audio_silence_segments",
            "video_scene_cut_detect",
            "jsonl_records",
            "manifest_source_scan",
            "manifest_stream_scan",
            "udf_quality_gate",
            "udf_detect_count_filter",
            "placeholders_build",
            "pipeline_caption_e2e",
        ],
        ["documents"],
    )


@settings(**_SETTINGS)
@given(embs=st.lists(_EMB_ROW, min_size=12, max_size=40))
def test_fuzz_embeddings_wave5(spark, tmp_path_factory, embs):
    """Wave 5e: the remaining vector families — semantic dedup keepers,
    k-means refinement, ColBERT MaxSim serving, and compressed-index ANN."""
    tmp_path = tmp_path_factory.mktemp("fuzz_emb5")
    _write_embeddings(tmp_path, embs)
    _run_pair(
        spark,
        tmp_path,
        [
            "embedding_near_dup_lsh",
            "embedding_dedup_keepers",
            "semantic_dedup_keepers",
            "kmeans_refine_step",
            "colbert_maxsim_topk",
            "colbert_maxsim_ivf_topk",
            "ann_ivf_pq_topk",
            "in_context_packing_plan",
        ],
        ["embeddings"],
    )


@settings(**_SETTINGS)
@given(embs=st.lists(_EMB_ROW, min_size=12, max_size=40))
def test_fuzz_embeddings_kmeans_loop(spark, tmp_path_factory, embs):
    """Round-14 wave 6a: the full Lloyd training closure. Micro-corpora
    exercise the paths testdata never does — K < 10 seed batches (corpora
    under 20 vectors), drained clusters taking the carry-over centroid,
    duplicate vectors forcing the cluster-id argmin tie-break, and
    convergence plateaus where n_moved hits 0 mid-loop."""
    tmp_path = tmp_path_factory.mktemp("fuzz_km")
    _write_embeddings(tmp_path, embs)
    _run_pair(
        spark,
        tmp_path,
        ["kmeans_train_loop", "kmeans_assign_apply", "kmeans_artifact_apply"],
        ["embeddings"],
    )


@settings(**_SETTINGS)
@given(events=st.lists(_EVENT_ROW, min_size=6, max_size=60))
def test_fuzz_events_wave5(spark, tmp_path_factory, events):
    """Wave 5f: the sketch-audit families (KMV/CMS/HLL/AMS/q-digest),
    distribution drift, burst/sensitivity diagnostics, and the per-user
    cogroup/greedy applyInPandas operators."""
    import datetime
    import pyarrow as pa

    tmp_path = tmp_path_factory.mktemp("fuzz_ev5")
    rows = []
    for i, (day, sec, user, etype, cents) in enumerate(events):
        ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(days=day, seconds=sec)
        rows.append((i + 1, ts, user, etype, cents / 100.0, "{}"))
    _copy_rows(
        tmp_path,
        "events",
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ],
        rows,
    )
    _run_pair(
        spark,
        tmp_path,
        [
            "ams_f2_sketch",
            "approx_distinct_users",
            "bootstrap_mean_ci",
            "count_min_freq_audit",
            "event_trigram_funnels",
            "hll_mergeability_audit",
            "hll_register_sketch",
            "psi_stability_report",
            "quantile_sketch_audit",
            "seasonal_decompose_daily",
            "session_gap_sensitivity",
            "wasserstein_drift_binned",
            "cogroup_click_purchase_stats",
            "greedy_dedup_keep",
            "kmv_set_ops_audit",
            "preference_pair_margins",
            "rejection_sampling_yield",
        ],
        ["events"],
    )


@settings(**_SETTINGS)
@given(**_OL_GIVEN)
def test_fuzz_ol_wave5_layout(spark, tmp_path_factory, orders, lines, seed):
    """Wave 5g: physical-layout/IO families on the order tables — bloom
    pruning, bucketed/DPP joins, partitioned writes, schema evolution,
    round-trip sinks, and the path/label scalar surfaces."""
    tmp_path = tmp_path_factory.mktemp("fuzz_ol5g")
    _write_orders_lineitem(tmp_path, orders, lines, seed)
    _run_pair(
        spark,
        tmp_path,
        [
            "bloom_pruned_join",
            "bucketed_join_copartition",
            "dpp_partitioned_join",
            "partitioned_write_prune",
            "schema_evolution_merge",
            "encoding_advisor",
            "csv_roundtrip",
            "jsonl_roundtrip",
            "orc_roundtrip",
            "path_roundtrip",
            "sec_to_label",
            "fraction_parse",
            "coalesce_fallback",
            "similarity_argmax",
        ],
        _OL_TABLES,
    )


@settings(**_SETTINGS)
@given(**_OL_GIVEN)
def test_fuzz_ol_wave5_pipeline(spark, tmp_path_factory, orders, lines, seed):
    """Wave 5h: the reference-pipeline analog families on the order tables
    (box filters, segment recursion, gauntlets, placeholder joins) plus the
    multi-table integrity/deletion audits and the point-in-time join (a
    small deterministic events table rides along for it)."""
    import datetime
    import pyarrow as pa

    tmp_path = tmp_path_factory.mktemp("fuzz_ol5h")
    _write_orders_lineitem(tmp_path, orders, lines, seed)
    ev_rows = []
    for i in range(18):
        ts = datetime.datetime(1995, 1, 1) + datetime.timedelta(
            days=(i * 53) % 2400, seconds=(i * 977) % 86_400
        )
        ev_rows.append(
            (i + 1, ts, 1 + i % 6, ["click", "view", "purchase"][i % 3],
             ((i * 137) % 5_000) / 100.0, "{}")
        )
    _copy_rows(
        tmp_path,
        "events",
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ],
        ev_rows,
    )
    _run_pair(
        spark,
        tmp_path,
        [
            "scene_split_recursive",
            "gauntlet_exactly_one",
            "iou_boxes",
            "clipped_area_filter",
            "array_index_join",
            "gdpr_delete_cascade",
            "fk_integrity_report",
            "entity_resolution_e2e",
            "pipeline_cut_e2e",
            "pipeline_frame_mining_e2e",
            "pipeline_bg_filter_e2e",
            "pit_state_at_order",
            "hilbert_vs_zorder_locality",
        ],
        _OL_TABLES + ["events"],
    )


@settings(**_SETTINGS)
@given(events=st.lists(_EVENT_ROW, min_size=6, max_size=60))
def test_fuzz_streaming_wave5(spark, tmp_path_factory, events):
    """Wave 5i: the Structured Streaming drains — tumbling/sliding/session
    windows, watermark dedup, stateful running totals, stream-static and
    stream-stream joins, the foreachBatch sink, and the HLL/PSI streaming
    sketches. Each builder drains its file stream with availableNow
    against the fuzzed events and must land on the same table the batch
    oracle computes; this closes the fuzz net over the FULL registry (the
    dims ride along for the stream-static enrich)."""
    import datetime
    import pyarrow as pa

    tmp_path = tmp_path_factory.mktemp("fuzz_st5")
    _write_dims(tmp_path)
    rows = []
    for i, (day, sec, user, etype, cents) in enumerate(events):
        ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(days=day, seconds=sec)
        rows.append((i + 1, ts, user, etype, cents / 100.0, "{}"))
    _copy_rows(
        tmp_path,
        "events",
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ],
        rows,
    )
    _run_pair(
        spark,
        tmp_path,
        [
            "stream_tumbling_counts",
            "stream_sliding_counts",
            "stream_session_windows",
            "stream_dedup_count",
            "stream_running_totals",
            "stream_static_enrich",
            "stream_foreachbatch_sink",
            "stream_stream_click_purchase",
            "stream_psi_drift",
            "stream_dedup_within_watermark",
            "stream_hll_registers",
            "stream_topk_frequent_items",
            "stream_cms_frequency",
        ],
        ["events", "customer"],
    )


_W6_CD_TOKENS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa",
]

_W6_CD_DOC = st.tuples(
    st.lists(st.sampled_from(_W6_CD_TOKENS), min_size=0, max_size=12),
    st.booleans(),        # embed the shared boilerplate span?
    st.integers(0, 12),   # insertion offset into the doc's own tokens
    st.sampled_from(["web", "src3", "src12", "code"]),
)


@settings(**_SETTINGS)
@given(
    boiler=st.lists(st.sampled_from(_W6_CD_TOKENS), min_size=8, max_size=11),
    docs=st.lists(_W6_CD_DOC, min_size=3, max_size=12),
)
def test_fuzz_documents_wave6_crossdoc(spark, tmp_path_factory, boiler, docs):
    """Wave 6: cross-document substring removal + the caption/image gate.
    A per-example boilerplate span (>= CROSSDOC_K tokens) is spliced into a
    random subset of docs at random offsets, so the marked-window path, the
    keep-first rule, and the overlapping-span interval union all move with
    the fuzz — including empty docs, docs shorter than the window, and the
    all-unique corpus where nothing is removed. The caption gate rides the
    same doc_ids (its corpus is keyed off doc_id alone), fuzzing the
    mislabel/perturbation residues."""
    import pyarrow as pa

    tmp_path = tmp_path_factory.mktemp("fuzz_doc6")
    rows = []
    for i, (own, embed, off, source) in enumerate(docs):
        words = list(own)
        if embed:
            pos = min(off, len(words))
            words = words[:pos] + list(boiler) + words[pos:]
        text = " ".join(words)
        rows.append((i + 1, text, "en", source, len(text)))
    _copy_rows(
        tmp_path,
        "documents",
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ],
        rows,
    )
    _run_pair(
        spark,
        tmp_path,
        [
            "crossdoc_substring_dedup",
            "dedup_savings_by_source",
            "caption_image_agreement",
            "webdataset_shard_plan",
            "padding_waste_report",
        ],
        ["documents"],
    )


@settings(**_SETTINGS)
@given(docs=st.lists(_W5_DOC_ROW, min_size=3, max_size=16))
def test_fuzz_documents_wave7_classic_ml(spark, tmp_path_factory, docs):
    """Wave 7 (round 14): the classical-ML closures. The micro-corpora
    exercise the degenerate regimes the sf tables never hit: single-source
    corpora (NB prior ln(1)=0, one-row confusion), vocabularies smaller
    than the top-V cap (V = actual size in the smoothing denominator),
    all-docs-identical feature tables (no valid stump split -> empty
    sweep and empty apply in BOTH engines), constant features (singular
    OLS system -> NULL-coefficient guard), and single-bin PAV fits."""
    tmp_path = tmp_path_factory.mktemp("fuzz_doc7")
    _write_w5_docs(tmp_path, docs)
    _run_pair(
        spark,
        tmp_path,
        [
            "naive_bayes_train",
            "naive_bayes_confusion",
            "decision_stump_train",
            "decision_stump_apply",
            "ols_normal_equations",
            "isotonic_calibration_pav",
            "gbdt_stump_boost",
            "gbdt_gate_apply",
        ],
        ["documents"],
    )
