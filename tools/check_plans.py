"""Physical-plan audit: assert the plans we ship are the plans we want.

For each audited query this checks the `explain("formatted")` output for the
scale-critical properties — filters pushed into the parquet scan, schemas
pruned to referenced columns, small dimensions broadcast, whole-stage
codegen covering the expression work. A query can be correct and still scan
100 TB for a 2-column projection; this harness is how we catch that.

Usage: python tools/check_plans.py [-v]
"""

from __future__ import annotations

import os
import re
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Overridable so the audit can re-run at sf0.1, where broadcast-threshold
# and AQE decisions can flip relative to the default gate scale.
SF_DIR = os.environ.get("SPARK_GRAFT_PLAN_SF_DIR", "/root/testdata/sf0.01")


def plan_of(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def read_schema_cols(plan: str, table: str) -> set[str]:
    """Columns actually read from `table`'s parquet scan."""
    cols: set[str] = set()
    for m in re.finditer(r"Location:.*" + table + r"\.parquet.*?ReadSchema: struct<([^>]*)>", plan, re.S):
        cols |= {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
    # formatted explain puts scans in numbered sections; fall back to scanning
    # the per-node detail blocks
    if not cols:
        for block in plan.split("\n\n"):
            if f"{table}.parquet" in block:
                m = re.search(r"ReadSchema: struct<([^>]*)>", block)
                if m:
                    cols |= {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
    return cols


def pushed_filters(plan: str, table: str) -> str:
    for block in plan.split("\n\n"):
        if f"{table}.parquet" in block:
            m = re.search(r"PushedFilters: \[([^\]]*)\]", block)
            if m:
                return m.group(1)
    return ""


CHECKS = []


def check(name):
    def wrap(fn):
        CHECKS.append((name, fn))
        return fn

    return wrap


@check("pricing_summary: column pruning on lineitem")
def _(qs, spark):
    plan = plan_of(qs["pricing_summary"](spark, SF_DIR))
    cols = read_schema_cols(plan, "lineitem")
    assert cols and "l_comment" not in cols and "l_partkey" not in cols, cols
    # map-side combine: partial aggregation must run before the exchange so
    # the shuffle carries group-count rows, not the 600M-row scan
    assert "partial_sum" in plan, "no partial aggregation before exchange"


@check("threshold_filter: predicate pushed to scan")
def _(qs, spark):
    plan = plan_of(qs["threshold_filter"](spark, SF_DIR))
    pf = pushed_filters(plan, "lineitem")
    assert "GreaterThan" in pf or "GreaterThanOrEqual" in pf, f"no pushed filter: {pf!r}"


@check("revenue_by_nation: only tiny dims broadcast; customer joins via shuffle")
def _(qs, spark):
    # with auto-broadcast off ("every table exceeds the threshold"), the only
    # broadcasts left are the explicit region/nation dim hints — customer,
    # orders, and lineitem must all flow through shuffle equi-joins
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(qs["revenue_by_nation"](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastHashJoin" in plan, "region/nation dims should broadcast"
    n_bcast = len(re.findall(r"^\(\d+\) BroadcastExchange", plan, re.M))
    assert n_bcast <= 2, f"fact-scaled table forced into a broadcast: {n_bcast}"
    n_shuffle_joins = len(
        re.findall(r"^\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan, re.M)
    )
    assert n_shuffle_joins == 2, (
        f"custkey+orderkey joins must shuffle, saw {n_shuffle_joins}"
    )


@check("broadcast_dim_join: explicit broadcast honored")
def _(qs, spark):
    plan = plan_of(qs["broadcast_dim_join"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


@check("anti_join_idempotency: broadcast anti join")
def _(qs, spark):
    plan = plan_of(qs["anti_join_idempotency"](spark, SF_DIR))
    assert "LeftAnti" in plan, "anti-join missing"


@check("pipeline_caption_e2e: lang filter pushed through 4-op pipeline")
def _(qs, spark):
    plan = plan_of(qs["pipeline_caption_e2e"](spark, SF_DIR))
    pf = pushed_filters(plan, "documents")
    assert "lang" in pf, f"lang filter not pushed: {pf!r}"
    cols = read_schema_cols(plan, "documents")
    assert "text" not in cols, f"caption pipeline must not read text: {cols}"


@check("pipeline_cut_e2e: duration filter pushed; summary reads 2 cols")
def _(qs, spark):
    plan = plan_of(qs["pipeline_cut_e2e"](spark, SF_DIR))
    pf = pushed_filters(plan, "orders")
    assert "o_totalprice" in pf, f"duration filter not pushed: {pf!r}"
    cols = read_schema_cols(plan, "orders")
    assert cols <= {"o_orderkey", "o_totalprice"}, cols


@check("token_stats: reads only doc_id,text")
def _(qs, spark):
    plan = plan_of(qs["token_stats"](spark, SF_DIR))
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "text"}, cols


@check("cosine_topk_bruteforce: query side broadcast")
def _(qs, spark):
    plan = plan_of(qs["cosine_topk_bruteforce"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


@check("udf_quality_gate: ArrowEvalPython (vectorized), not BatchEvalPython")
def _(qs, spark):
    plan = plan_of(qs["udf_quality_gate"](spark, SF_DIR))
    assert "ArrowEvalPython" in plan, "pandas UDF should evaluate via Arrow"
    assert "BatchEvalPython" not in plan, "row-at-a-time Python UDF in the plan"


@check("asof_click_to_purchase: one window, no nested-loop join")
def _(qs, spark):
    plan = plan_of(qs["asof_click_to_purchase"](spark, SF_DIR))
    assert "Window" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, (
        "as-of join must not plan a cross product"
    )


@check("range_join_value_bands: equi-join on buckets, not cross product")
def _(qs, spark):
    plan = plan_of(qs["range_join_value_bands"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, "range join degenerated to cross product"
    assert "_bucket" in plan, "bucket key missing from join"


@check("minhash_lsh_pairs: shingle hashes behind exchange, equi-join on band/bucket")
def _(qs, spark):
    plan = plan_of(qs["minhash_lsh_pairs"](spark, SF_DIR))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange") >= 2  # spread + barrier exchanges present


@check("sessionize_events: one exchange reused by both windows and the agg")
def _(qs, spark):
    plan = plan_of(qs["sessionize_events"](spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") <= 1 or plan.count("(3) Exchange"), plan
    # both window passes and the group-by share the user_id partitioning:
    # exactly one exchange node in the whole plan
    n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchange == 1, f"{n_exchange} exchanges (partitioning not reused)"


@check("customer_order_histogram: outer join preserved, orders pruned to 3 cols")
def _(qs, spark):
    plan = plan_of(qs["customer_order_histogram"](spark, SF_DIR))
    cols = read_schema_cols(plan, "orders")
    assert cols <= {"o_orderkey", "o_custkey", "o_orderstatus"}, cols
    assert "LeftOuter" in plan or "left_outer" in plan.lower(), "outer join lost"


@check("events_type_pivot: single-scan pivot, partial aggregation")
def _(qs, spark):
    plan = plan_of(qs["events_type_pivot"](spark, SF_DIR))
    assert "partial_" in plan, "no map-side partial aggregation"
    cols = read_schema_cols(plan, "events")
    assert "props" not in cols and "ts" not in cols, cols


@check("monthly_spine_gap_fill: spine join broadcasts, orders pruned")
def _(qs, spark):
    plan = plan_of(qs["monthly_spine_gap_fill"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, "tiny spine/actuals join not broadcast"
    cols = read_schema_cols(plan, "orders")
    assert cols <= {"o_orderdate", "o_orderpriority", "o_totalprice"}, cols


@check("price_stats_by_flag: single-pass moments with partial agg")
def _(qs, spark):
    plan = plan_of(qs["price_stats_by_flag"](spark, SF_DIR))
    assert "partial_" in plan, "no map-side partial aggregation"
    cols = read_schema_cols(plan, "lineitem")
    assert cols <= {"l_returnflag", "l_extendedprice", "l_quantity"}, cols


@check("promo_revenue_share: part broadcasts pruned to 2 cols, partial agg")
def _(qs, spark):
    plan = plan_of(qs["promo_revenue_share"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, "part dim not broadcast"
    assert "partial_" in plan, "no map-side partial aggregation"
    cols = read_schema_cols(plan, "part")
    assert cols <= {"p_partkey", "p_type"}, cols


@check("idle_big_balance_customers: anti join, orders pruned to key+status")
def _(qs, spark):
    plan = plan_of(qs["idle_big_balance_customers"](spark, SF_DIR))
    assert "LeftAnti" in plan, "NOT EXISTS did not plan as anti join"
    cols = read_schema_cols(plan, "orders")
    assert cols <= {"o_custkey", "o_orderstatus"}, cols


@check("corpus_curation_e2e: no cross product anywhere in the funnel")
def _(qs, spark):
    plan = plan_of(qs["corpus_curation_e2e"](spark, SF_DIR))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "InMemoryTableScan" in plan, "persist barriers missing from plan"


@check("embedding_near_dup: blocked self-join, no corpus-wide broadcast build")
def _(qs, spark):
    # At toy SFs Catalyst rightly auto-broadcasts the corpus side; the scale
    # property under test is that nothing FORCES a broadcast — with
    # auto-broadcast off (i.e. "corpus exceeds the threshold"), the pair
    # stage must become a shuffle equi-join on the block id.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(qs["embedding_near_dup"](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, "no shuffle equi-join on block id"


@check("embedding_near_dup_lsh: probe equi-join on bucket key only")
def _(qs, spark):
    plan = plan_of(qs["embedding_near_dup_lsh"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


@check("scene_split_recursive: zero exchanges (executor-local array rewrites)")
def _(qs, spark):
    plan = plan_of(qs["scene_split_recursive"](spark, SF_DIR))
    assert "Exchange" not in plan, "halving explode must not shuffle"
    cols = read_schema_cols(plan, "orders")
    assert cols <= {"o_orderkey", "o_totalprice"}, cols


@check("eval_tonemap: zero exchanges, embeddings pruned to 2 cols")
def _(qs, spark):
    plan = plan_of(qs["eval_tonemap"](spark, SF_DIR))
    assert "Exchange" not in plan, "per-row tonemap must not shuffle"
    cols = read_schema_cols(plan, "embeddings")
    assert cols <= {"vec_id", "embedding"}, cols


@check("decontaminate_overlap: benchmark set broadcast, corpus never nested-loops")
def _(qs, spark):
    plan = plan_of(qs["decontaminate_overlap"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, "benchmark n-gram set must broadcast"
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


@check("pii_redact: zero exchanges, documents pruned to doc_id,text")
def _(qs, spark):
    plan = plan_of(qs["pii_redact"](spark, SF_DIR))
    assert "Exchange" not in plan, "regex redaction is a pure map stage"
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "text"}, cols


@check("domain_mixing_sample: zero exchanges, no text read")
def _(qs, spark):
    plan = plan_of(qs["domain_mixing_sample"](spark, SF_DIR))
    assert "Exchange" not in plan, "hash sampling is a pure scan+filter"
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "source"}, cols


@check("sequence_packing: one window partitioning + partial-agg rollup")
def _(qs, spark):
    plan = plan_of(qs["sequence_packing"](spark, SF_DIR))
    assert plan.count("Window") >= 1
    assert "partial_count" in plan or "partial_sum" in plan, "rollup must partial-agg"
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "source", "text"}, cols


@check("repetition_report: doc_id-keyed aggs only, no cross product")
def _(qs, spark):
    plan = plan_of(qs["repetition_report"](spark, SF_DIR))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan or "partial_max" in plan, "bigram agg must partial-agg"


@check("table_profile: single scan, one Expand for all distinct aggs")
def _(qs, spark):
    plan = plan_of(qs["table_profile"](spark, SF_DIR))
    # count node headers ("(N) Scan parquet"), not tree+detail mentions
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans == 1, f"profile must be one pass, saw {n_scans} scans"
    assert "Expand" in plan, "multi-distinct should plan via Expand"


@check("vocab_top_tokens: partial-agg counts + TakeOrdered top-K (no full sort)")
def _(qs, spark):
    plan = plan_of(qs["vocab_top_tokens"](spark, SF_DIR))
    assert "partial_count" in plan, "token counts must partial-agg before shuffle"
    assert "TakeOrderedAndProject" in plan, "top-K must be a TakeOrdered merge"


@check("cogroup_click_purchase_stats: Arrow cogroup, both sides hash-partitioned once")
def _(qs, spark):
    plan = plan_of(qs["cogroup_click_purchase_stats"](spark, SF_DIR))
    assert "FlatMapCoGroupsInPandas" in plan
    n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_ex <= 2, f"one shuffle per side, saw {n_ex}"


@check("snapshot_diff_cdc: full outer on key, row hash map-side, 3-col scan")
def _(qs, spark):
    plan = plan_of(qs["snapshot_diff_cdc"](spark, SF_DIR))
    assert "FullOuter" in plan, "diff must be a full outer join"
    cols = read_schema_cols(plan, "orders")
    assert cols <= {"o_orderkey", "o_orderstatus", "o_totalprice"}, cols


@check("incremental_dedup: equi-joins only (bands + md5 anti)")
def _(qs, spark):
    plan = plan_of(qs["incremental_dedup"](spark, SF_DIR))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan, "exact stage must be an anti join"


@check("scd2_user_state: all windows share ONE user_id shuffle")
def _(qs, spark):
    plan = plan_of(qs["scd2_user_state"](spark, SF_DIR))
    n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchange == 1, f"expected 1 exchange, saw {n_exchange}"


@check("chunk_overlap_plan: zero shuffles (pure per-row explode)")
def _(qs, spark):
    plan = plan_of(qs["chunk_overlap_plan"](spark, SF_DIR))
    assert "Exchange" not in plan, "chunk planning must not shuffle"
    assert "explode(sequence" in plan


@check("bpe_pair_counts: top-K via TakeOrdered, single pair-count shuffle")
def _(qs, spark):
    plan = plan_of(qs["bpe_pair_counts"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, "global sort instead of top-K"
    n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchange == 1, f"expected 1 exchange, saw {n_exchange}"


@check("winsorized_value_stats: cutpoint table broadcast back to scan")
def _(qs, spark):
    plan = plan_of(qs["winsorized_value_stats"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


@check("zorder_layout: extent broadcast, no real data movement before rollup")
def _(qs, spark):
    plan = plan_of(qs["zorder_layout"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    cols = read_schema_cols(plan, "orders")
    assert cols and "o_comment" not in cols and "o_orderpriority" not in cols, cols


@check("pagerank_purchase_graph: no cartesian products across rounds")
def _(qs, spark):
    plan = plan_of(qs["pagerank_purchase_graph"](spark, SF_DIR))
    assert "CartesianProduct" not in plan


@check("retention_cohorts: window + rollup, partial-agg, events pruned")
def _(qs, spark):
    plan = plan_of(qs["retention_cohorts"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "partial_" in plan, "distinct-user rollup must partial-agg"
    cols = read_schema_cols(plan, "events")
    assert cols <= {"user_id", "ts"}, cols


@check("histogram_equi_width: 1-row extent broadcast, 20-group partial agg")
def _(qs, spark):
    plan = plan_of(qs["histogram_equi_width"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, (
        "extent row must broadcast, not shuffle"
    )
    assert "partial_" in plan, "bin rollup must partial-agg"
    cols = read_schema_cols(plan, "events")
    assert cols <= {"value"}, cols


@check("partition_skew_report: events pruned to user_id, both aggs partial")
def _(qs, spark):
    plan = plan_of(qs["partition_skew_report"](spark, SF_DIR))
    assert "partial_count" in plan, "per-key counts must partial-agg"
    cols = read_schema_cols(plan, "events")
    assert cols <= {"user_id"}, cols


@check("compaction_plan: rollup reuses the window's source partitioning (1 exchange)")
def _(qs, spark):
    plan = plan_of(qs["compaction_plan"](spark, SF_DIR))
    n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchange == 1, f"expected 1 exchange, saw {n_exchange}"
    cols = read_schema_cols(plan, "documents")
    assert "text" not in cols, f"planner must not read text: {cols}"


@check("ann_rerank_l2: broadcast query batch, rerank adds no corpus pass")
def _(qs, spark):
    plan = plan_of(qs["ann_rerank_l2"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans <= 2, f"rerank stage must not rescan the corpus: {n_scans} scans"


@check("kmeans_refine_step: centroids broadcast, update partial-aggregates")
def _(qs, spark):
    plan = plan_of(qs["kmeans_refine_step"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, (
        "centroid batch must broadcast"
    )
    assert "partial_" in plan, "centroid update must partial-agg the explode"


@check("ohlc_time_bars: both window passes + rollup share one exchange")
def _(qs, spark):
    plan = plan_of(qs["ohlc_time_bars"](spark, SF_DIR))
    n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchange == 1, f"expected 1 exchange, saw {n_exchange}"
    cols = read_schema_cols(plan, "events")
    assert cols <= {"event_type", "value", "event_id", "ts"}, cols


@check("triangle_copurchase_stats: equi-joins only, support filter before cubic stage")
def _(qs, spark):
    plan = plan_of(qs["triangle_copurchase_stats"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "lineitem")
    assert cols <= {"l_orderkey", "l_partkey"}, cols


@check("zipf_slope_fit: top-K via TakeOrdered bounds the rank window input")
def _(qs, spark):
    plan = plan_of(qs["zipf_slope_fit"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, "vocab cap must plan as TakeOrdered"
    assert "partial_count" in plan, "token counts must partial-agg"


@check("dataset_split_assign: pure projection + tiny rollup, no text read")
def _(qs, spark):
    plan = plan_of(qs["dataset_split_assign"](spark, SF_DIR))
    n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchange <= 1, f"split assignment must not shuffle rows: {n_exchange}"
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "source"}, cols


@check("exact_substring_spans: gram df + span join are equi-shuffles, text-only scan")
def _(qs, spark):
    plan = plan_of(qs["exact_substring_spans"](spark, SF_DIR))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "partial_" in plan, "gram df must partial-agg"
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "text"}, cols


@check("semantic_dedup_keepers: centroids broadcast, pairs equi-join on cluster_id")
def _(qs, spark):
    plan = plan_of(qs["semantic_dedup_keepers"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan, "keeper filter must be an anti join"


@check("weighted_sample_per_source: one window exchange, no text read")
def _(qs, spark):
    plan = plan_of(qs["weighted_sample_per_source"](spark, SF_DIR))
    n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchange == 1, f"expected 1 exchange, saw {n_exchange}"
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"source", "doc_id", "n_chars"}, cols


@check("partitioned_write_prune: read-back scan prunes on the partition column")
def _(qs, spark):
    plan = plan_of(qs["partitioned_write_prune"](spark, SF_DIR))
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "o_orderpriority" in m.group(1), (
        f"partition filter not applied: {m and m.group(1)!r}"
    )
    assert "partial_" in plan


@check("bucketed_join_copartition: join runs exchange-free off bucketed tables")
def _(qs, spark):
    # at toy SF Catalyst auto-broadcasts the small side; the scale property
    # under test is the no-exchange sort-merge path, so force it the way a
    # 100 TB table would (both sides over the broadcast threshold)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(qs["bucketed_join_copartition"](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan, "bucketed join should sort-merge"
    n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchange <= 1, (
        f"bucketed join must not shuffle its inputs (only the rollup may): {n_exchange}"
    )


@check("pretrain_data_e2e: benchmark broadcast, monotone funnel, no cross product")
def _(qs, spark):
    plan = plan_of(qs["pretrain_data_e2e"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, "benchmark n-gram set must broadcast"
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "source", "text"}, cols


@check("time_range_rolling_sum: one user_id exchange, 4-col events scan")
def _(qs, spark):
    plan = plan_of(qs["time_range_rolling_sum"](spark, SF_DIR))
    n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchange == 1, f"expected 1 exchange, saw {n_exchange}"
    cols = read_schema_cols(plan, "events")
    assert cols <= {"event_id", "user_id", "value", "ts"}, cols


@check("daily_anomaly_zscore: partial-agg daily rollup feeds the window")
def _(qs, spark):
    plan = plan_of(qs["daily_anomaly_zscore"](spark, SF_DIR))
    assert "partial_count" in plan, "daily rollup must partial-agg"
    cols = read_schema_cols(plan, "events")
    assert cols <= {"event_type", "ts"}, cols


@check("incremental_mv_refresh: both rollups partial-agg; merge over cells only")
def _(qs, spark):
    plan = plan_of(qs["incremental_mv_refresh"](spark, SF_DIR))
    assert "partial_count" in plan and "partial_sum" in plan
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "events")
    assert cols <= {"event_type", "ts", "value"}, cols


@check("dpp_partitioned_join: runtime dynamicpruning subquery on the fact scan")
def _(qs, spark):
    plan = plan_of(qs["dpp_partitioned_join"](spark, SF_DIR))
    assert "dynamicpruning" in plan.lower(), "no dynamic partition pruning injected"
    assert "BroadcastHashJoin" in plan, "tiny dim must broadcast"


@check("oov_rate_report: vocab broadcast, membership marked map-side")
def _(qs, spark):
    plan = plan_of(qs["oov_rate_report"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, "vocabulary must broadcast"
    assert "TakeOrderedAndProject" in plan, "vocab cap must plan as TakeOrdered"
    assert "partial_" in plan


@check("lang_confusion_matrix: single scan, tiny rollup")
def _(qs, spark):
    plan = plan_of(qs["lang_confusion_matrix"](spark, SF_DIR))
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans == 1, f"one documents pass expected, saw {n_scans}"
    assert "partial_count" in plan


@check("text_normalize_stats: zero exchanges, one documents scan")
def _(qs, spark):
    plan = plan_of(qs["text_normalize_stats"](spark, SF_DIR))
    assert "Exchange" not in plan, "normalization is a pure map stage"
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans == 1, f"one scan expected, saw {n_scans}"


@check("unpivot_order_metrics: melt adds no shuffle before the rollup")
def _(qs, spark):
    plan = plan_of(qs["unpivot_order_metrics"](spark, SF_DIR))
    n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchange == 1, f"only the rollup may exchange: {n_exchange}"
    assert "partial_" in plan
    cols = read_schema_cols(plan, "lineitem")
    assert cols <= {"l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_tax"}, cols


@check("schema_evolution_merge: merged scan null-fills, rollup partial-aggs")
def _(qs, spark):
    plan = plan_of(qs["schema_evolution_merge"](spark, SF_DIR))
    assert "partial_" in plan
    assert "CartesianProduct" not in plan


@check("corpus_report_card: all three audits in ONE documents pass")
def _(qs, spark):
    plan = plan_of(qs["corpus_report_card"](spark, SF_DIR))
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans == 1, f"audits must share one scan, saw {n_scans}"
    assert "partial_" in plan


@check("pit_state_at_order: union+window PIT join, no per-probe scan or range join")
def _(qs, spark):
    plan = plan_of(qs["pit_state_at_order"](spark, SF_DIR))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchange == 1, f"one uid exchange expected, saw {n_exchange}"
    cols = read_schema_cols(plan, "orders")
    assert cols <= {"o_orderkey", "o_custkey", "o_orderdate"}, cols


@check("percent_rank_features: one event_type exchange for both rank fns")
def _(qs, spark):
    plan = plan_of(qs["percent_rank_features"](spark, SF_DIR))
    n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchange == 1, f"expected 1 exchange, saw {n_exchange}"


@check("expectations_report: all constraints in one scan")
def _(qs, spark):
    plan = plan_of(qs["expectations_report"](spark, SF_DIR))
    n_scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
    assert n_scans == 1, f"expectation suite must be one pass, saw {n_scans}"


@check("multi_touch_attribution: user-key equi-join, no cross product")
def _(qs, spark):
    plan = plan_of(qs["multi_touch_attribution"](spark, SF_DIR))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    cols = read_schema_cols(plan, "events")
    assert cols <= {"event_id", "user_id", "event_type", "ts", "value"}, cols


@check("split_leakage_audit: one content-hash shuffle, partial-agg")
def _(qs, spark):
    plan = plan_of(qs["split_leakage_audit"](spark, SF_DIR))
    assert "partial_" in plan
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "text"}, cols


@check("sentence_split_udtf: Arrow UDTF expansion, zero shuffles, 2-col scan")
def _(qs, spark):
    plan = plan_of(qs["sentence_split_udtf"](spark, SF_DIR))
    assert "ArrowEvalPythonUDTF" in plan, "UDTF should evaluate via Arrow"
    assert "BatchEvalPythonUDTF" not in plan, "non-Arrow UDTF in the plan"
    assert "Exchange" not in plan, "per-row expansion must not shuffle"
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "text"}, cols


@check("embedding_int8_quant: zero shuffles, embeddings pruned to 2 cols")
def _(qs, spark):
    plan = plan_of(qs["embedding_int8_quant"](spark, SF_DIR))
    assert "Exchange" not in plan, "per-vector quantization must not shuffle"
    cols = read_schema_cols(plan, "embeddings")
    assert cols <= {"vec_id", "embedding"}, cols


@check("quantile_sketch_audit: sketch table broadcasts back for the CDF pass")
def _(qs, spark):
    plan = plan_of(qs["quantile_sketch_audit"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, "per-type sketch row must broadcast"
    assert "partial_" in plan, "both aggregations must partial-agg"
    cols = read_schema_cols(plan, "events")
    assert cols <= {"event_type", "value"}, cols


@check("dsir_importance_weights: bucket dist broadcast, persisted token stream")
def _(qs, spark):
    plan = plan_of(qs["dsir_importance_weights"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, "bucket->pt/ps table must broadcast"
    assert "partial_count" in plan, "distribution counts must partial-agg"
    assert "InMemoryTableScan" in plan, "token-bucket persist barrier missing"
    assert "CartesianProduct" not in plan


@check("gopher_quality_flags: map-only, documents pruned to doc_id+text")
def _(qs, spark):
    plan = plan_of(qs["gopher_quality_flags"](spark, SF_DIR))
    assert "Exchange" not in plan, "rule gates must not shuffle"
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "text"}, cols


@check("ks_drift_binned: events pruned to user_id+value, partial-agg bins")
def _(qs, spark):
    plan = plan_of(qs["ks_drift_binned"](spark, SF_DIR))
    cols = read_schema_cols(plan, "events")
    assert cols <= {"user_id", "value"}, cols
    assert "partial_sum" in plan, "bin counts must partial-aggregate"


@check("dead_letter_split: events pruned, partial-agg per type")
def _(qs, spark):
    plan = plan_of(qs["dead_letter_split"](spark, SF_DIR))
    cols = read_schema_cols(plan, "events")
    assert cols <= {"event_id", "event_type", "props"}, cols
    assert "partial_count" in plan or "partial_sum" in plan


@check("mmr_diverse_topk: shortlist via TakeOrdered, no global sort, Arrow group")
def _(qs, spark):
    plan = plan_of(qs["mmr_diverse_topk"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, "shortlist must be per-partition top-k"
    assert "FlatMapGroupsInPandas" in plan, "greedy stage must be Arrow-grouped"
    assert not re.search(r"^\(\d+\) Sort\b.*global", plan, re.M), "global sort leaked"


@check("salted_skew_join: salt replication via explode, partial-agg rollup")
def _(qs, spark):
    plan = plan_of(qs["salted_skew_join"](spark, SF_DIR))
    assert "Generate" in plan, "build-side salt replication (explode) missing"
    assert "partial_sum" in plan, "priority rollup must partial-aggregate"
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


@check("bfs_reach_3hop: edges persisted once, reused across hops")
def _(qs, spark):
    plan = plan_of(qs["bfs_reach_3hop"](spark, SF_DIR))
    # the loop returns localCheckpointed state; the final plan must be flat
    # scans of the checkpointed RDDs, not a re-derivation of the per-hop joins
    assert "ExistingRDD" in plan, plan[:400]
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, (
        "final plan re-derives the hop joins instead of reading checkpoints"
    )


@check("bm25_topk: term filter inside explode, TakeOrdered top-k, stats broadcast")
def _(qs, spark):
    plan = plan_of(qs["bm25_topk"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, "top-k must not global-sort"
    assert "BroadcastHashJoin" in plan, "df/stats tables must broadcast"
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "text"}, cols


@check("inverted_index_postings: two-phase top-k, no token window")
def _(qs, spark):
    plan = plan_of(qs["inverted_index_postings"](spark, SF_DIR))
    assert "Window" not in plan, "hot-token window partition leaked into the plan"
    assert "partial_count" in plan or "partial_sum" in plan


@check("heavy_hitters_verified: candidate broadcast semi-join, partial recount")
def _(qs, spark):
    plan = plan_of(qs["heavy_hitters_verified"](spark, SF_DIR))
    assert "LeftSemi" in plan, "candidate filter must be a semi join"
    assert "TakeOrderedAndProject" in plan, "top-k must not global-sort"
    assert "partial_count" in plan, "recount must partial-aggregate"


@check("column_correlation_matrix: one scan, one partial-agg, no joins")
def _(qs, spark):
    plan = plan_of(qs["column_correlation_matrix"](spark, SF_DIR))
    assert "partial_sum" in plan
    assert "Join" not in plan, "moment matrix must come from a single scan"
    cols = read_schema_cols(plan, "lineitem")
    assert cols <= {"l_quantity", "l_extendedprice", "l_discount", "l_tax"}, cols


@check("ann_recall_eval: joins only top-k result tables")
def _(qs, spark):
    plan = plan_of(qs["ann_recall_eval"](spark, SF_DIR))
    assert "CartesianProduct" not in plan


@check("ntile_price_quartiles: no unpartitioned WindowExec on the fact table")
def _(qs, spark):
    # the r04 form was ntile(4) OVER (ORDER BY ...) — a single-task global
    # sort. The rewrite ranks per range-partition: the fact-side row_number
    # window must be partitioned by _pid; only the 32-row offset windows may
    # be unpartitioned.
    plan = plan_of(qs["ntile_price_quartiles"](spark, SF_DIR))
    for block in plan.split("\n\n"):
        if "row_number" in block and "Window" in block:
            assert "_pid" in block, f"fact window not partitioned: {block[:300]}"
    assert "ntile" not in plan, "global ntile window crept back in"
    assert "rangepartitioning" in plan.lower(), "expected a range exchange"


@check("winnow_match_pairs: partitioned windows only, hash equi-join, no cartesian")
def _(qs, spark):
    plan = plan_of(qs["winnow_match_pairs"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # both windows (per-doc winnow min, per-hash df cap) must be partitioned
    for block in plan.split("\n\n"):
        if "Window" in block and "windowspecdefinition" in block:
            assert "doc_id" in block or "h#" in block, block[:300]
    cols = read_schema_cols(plan, "documents")
    assert "text" in cols and "source" not in cols and "lang" not in cols, cols


@check("containment_pairs: df-capped index barriered, no cartesian")
def _(qs, spark):
    plan = plan_of(qs["containment_pairs"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan, (
        "capped posting index must come from the persist barrier"
    )


@check("token_budget_select: one source-partitioned window, pruned scan")
def _(qs, spark):
    plan = plan_of(qs["token_budget_select"](spark, SF_DIR))
    for block in plan.split("\n\n"):
        if "Window" in block and "windowspecdefinition" in block:
            assert "source" in block, f"budget window must partition by source: {block[:300]}"
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "source", "text"}, cols


@check("vocab_coverage_curve: vocab cap plans as TakeOrdered, ks broadcast")
def _(qs, spark):
    plan = plan_of(qs["vocab_coverage_curve"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, "top-k vocab must be TakeOrdered"
    assert "partial_count" in plan or "partial_sum" in plan, (
        "token counting must partial-aggregate before the exchange"
    )


@check("embedding_anisotropy: linear scan, partial agg, no pair join")
def _(qs, spark):
    plan = plan_of(qs["embedding_anisotropy"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan, "anisotropy must not join the corpus to itself"
    assert "partial_sum" in plan, "per-dim mean must partial-aggregate"


@check("embedding_pca_covariance: map-side-combined Gram, broadcast moments")
def _(qs, spark):
    plan = plan_of(qs["embedding_pca_covariance"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan, "moment joins must broadcast (d^2 rows)"
    assert "partial_sum" in plan, "cross-products must partial-aggregate before the exchange"
    cols = read_schema_cols(plan, "embeddings")
    assert cols == {"embedding"}, f"covariance needs only the vector column: {cols}"


@check("jl_random_projection: pure narrow plan, zero exchanges, zero UDFs")
def _(qs, spark):
    plan = plan_of(qs["jl_random_projection"](spark, SF_DIR))
    assert "Exchange" not in plan, "JL projection must be shuffle-free"
    assert "pythonUDF" not in plan and "ArrowEvalPython" not in plan
    assert "codegen id" in plan, "projection must stay in whole-stage codegen"


@check("ann_ivf_pq_topk: query tables broadcast, full vectors only at rerank")
def _(qs, spark):
    plan = plan_of(qs["ann_ivf_pq_topk"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan, "qtab/query frames must broadcast"
    # the ADC phase must not sort-merge the corpus against ITSELF: the only
    # shuffle equi-joins are candidates->packed-codes and shortlist->vectors,
    # both keyed on vec_id and bounded by the candidate/shortlist row count
    n_smj = plan.count("SortMergeJoin")
    assert n_smj <= 2, f"ADC phase leaked into extra shuffle joins: {n_smj}"


@check("html_text_extract: pure narrow regex chain, zero exchanges")
def _(qs, spark):
    plan = plan_of(qs["html_text_extract"](spark, SF_DIR))
    assert "Exchange" not in plan, "extraction must be a map-only stage"
    assert "pythonUDF" not in plan and "ArrowEvalPython" not in plan
    cols = read_schema_cols(plan, "documents")
    assert cols == {"doc_id", "source", "text"}, cols


@check("url_canonical_dedup: one partial-aggregated rollup")
def _(qs, spark):
    plan = plan_of(qs["url_canonical_dedup"](spark, SF_DIR))
    assert "partial_count" in plan or "partial_min" in plan
    n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchange == 1, f"{n_exchange} exchanges"
    cols = read_schema_cols(plan, "documents")
    assert cols == {"doc_id", "source"}, cols


@check("crawl_to_corpus_e2e: map-only funnel until keeper window + rollup")
def _(qs, spark):
    plan = plan_of(qs["crawl_to_corpus_e2e"](spark, SF_DIR))
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan
    assert "pythonUDF" not in plan and "ArrowEvalPython" not in plan, (
        "extraction/gate must be JVM expressions"
    )
    # exactly two exchanges: the canonical-URL window and the rollup
    n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchange == 2, f"{n_exchange} exchanges"
    cols = read_schema_cols(plan, "documents")
    assert cols == {"doc_id", "source", "text"}, cols


@check("kmv_set_ops_audit: one distinct shuffle, bottom-k windows partitioned")
def _(qs, spark):
    plan = plan_of(qs["kmv_set_ops_audit"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "events")
    assert cols == {"event_type", "user_id"}, cols
    for block in plan.split("\n\n"):
        if "Window" in block and "windowspecdefinition" in block:
            assert "t#" in block or "type_a" in block, (
                "bottom-k windows must partition by type / pair: " + block[:200]
            )


@check("pareto_frontier_docs: no quadratic self-join; sweep on aggregated frame")
def _(qs, spark):
    plan = plan_of(qs["pareto_frontier_docs"](spark, SF_DIR))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, (
        "skyline must not plan the quadratic dominance join"
    )
    assert "partial_max" in plan, "richness rollup must partial-aggregate"
    # documents is scanned once for stats + once for the recover join: both prune
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "text"}, cols


@check("pq_code_assign: broadcast codebook, partitioned argmin window")
def _(qs, spark):
    plan = plan_of(qs["pq_code_assign"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan, "the PQ codebook is M*K rows — broadcast it"
    for block in plan.split("\n\n"):
        if "Window" in block and "windowspecdefinition" in block:
            assert "vec_id" in block, f"argmin window must partition by (vec_id, m): {block[:200]}"


@check("bloom_dedup_admission: fixed-size bitmap broadcast, no corpus shuffle join")
def _(qs, spark):
    plan = plan_of(qs["bloom_dedup_admission"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan, (
        "bitmap and seen-hash set must broadcast; the batch never sort-merges"
    )
    assert "partial_bit_or" in plan or "bit_or" in plan, "bitmap words must aggregate"


@check("count_min_freq_audit: partial-aggregated cells, broadcast sketch probe")
def _(qs, spark):
    plan = plan_of(qs["count_min_freq_audit"](spark, SF_DIR))
    assert "SortMergeJoin" not in plan, "the cell table is fixed-size — broadcast it"
    assert "partial_count" in plan, "cells must combine map-side"
    cols = read_schema_cols(plan, "events")
    assert cols == {"user_id"}, cols


@check("mixture_temperature_weights: one source rollup, broadcast totals")
def _(qs, spark):
    plan = plan_of(qs["mixture_temperature_weights"](spark, SF_DIR))
    assert "SortMergeJoin" not in plan, "corpus totals must ride broadcast"
    assert "partial_count" in plan or "partial_sum" in plan
    cols = read_schema_cols(plan, "documents")
    assert cols == {"source", "text"}, cols


@check("ann_ivf_pq_topk: corpus code table rides shuffle, never broadcast")
def _(qs, spark):
    # the r5 design audit: the packed PQ-code frame is one row per CORPUS
    # vector — broadcasting it is a hard stop at 1e9+ vectors. With
    # auto-broadcast off, the only legal broadcasts are the query-bounded
    # frames (centroids, codebook, query list, distance tables, query
    # vectors); the code-table join AND the exact-rerank vector join must
    # both be shuffle equi-joins on vec_id. A regression to
    # broadcast(codes) collapses this count to 1.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(qs["ann_ivf_pq_topk"](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    n_shuffle_joins = len(
        re.findall(r"^\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan, re.M)
    )
    assert n_shuffle_joins == 2, (
        f"expected 2 shuffle equi-joins (packed codes + rerank), saw "
        f"{n_shuffle_joins} — a corpus-derived frame is being broadcast"
    )


@check("bigram_lm_perplexity: LM tables ride shuffle joins, only vocab row broadcast")
def _(qs, spark):
    # the bigram/context LM tables are vocabulary-scaled (corpus-derived):
    # they must reach document bigrams via shuffle equi-joins, never a
    # broadcast; the only broadcast-extent node is the 1-row vocab total.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(qs["bigram_lm_perplexity"](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "CartesianProduct" not in plan
    n_smj = len(re.findall(r"^\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan, re.M))
    assert n_smj == 2, f"LM joins must shuffle (bigram + context), saw {n_smj}"
    cols = read_schema_cols(plan, "documents")
    assert cols == {"doc_id", "text"}, cols


@check("sequence_packing_plan: range-partitioned prefix sum, no global fact window")
def _(qs, spark):
    plan = plan_of(qs["sequence_packing_plan"](spark, SF_DIR))
    assert "rangepartitioning" in plan.lower(), "expected a range exchange"
    # the fact-side cumulative window must be partitioned by _pid; only the
    # 32-row per-partition offset window may be unpartitioned
    for block in plan.split("\n\n"):
        if "Window" in block and "n_tok" in block and "sum" in block:
            assert "_pid" in block, f"fact window not partitioned: {block[:300]}"


@check("boilerplate_line_removal: line-df table rides shuffle, dims broadcast")
def _(qs, spark):
    # the (source, line) document-frequency table is vocabulary-scaled — no
    # explicit hint may force it broadcast (at tiny SF the optimizer
    # broadcasts it on its own, which is fine; with auto-broadcast off the
    # join must degrade to a shuffle equi-join); the per-source doc-count
    # table (source-cardinality-bounded) stays hint-broadcast.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(qs["boilerplate_line_removal"](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "CartesianProduct" not in plan
    n_smj = len(re.findall(r"^\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan, re.M))
    assert n_smj >= 1, "df join must be a shuffle equi-join"
    cols = read_schema_cols(plan, "documents")
    assert "lang" not in cols and "n_chars" not in cols, cols


@check("bloom_pruned_join: map-side probe, one shuffle join of survivors")
def _(qs, spark):
    # the runtime-filter contract: the lineitem probe must be entirely
    # map-side (the bitmap rides a 1-row broadcast map; no explode-shuffle
    # of the fact table), so the ONLY shuffle equi-join is survivors->keys
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(qs["bloom_pruned_join"](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "CartesianProduct" not in plan
    n_smj = len(re.findall(r"^\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan, re.M))
    assert n_smj == 1, f"probe leaked into extra shuffle joins: {n_smj}"
    cols = read_schema_cols(plan, "lineitem")
    assert cols == {"l_orderkey", "l_extendedprice", "l_discount"}, cols


@check("rag_chunk_plan: one spread exchange, no joins, no chunk text in output")
def _(qs, spark):
    df = qs["rag_chunk_plan"](spark, SF_DIR)
    plan = plan_of(df)
    n_ex = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_ex <= 1, f"chunking must be map-only after the spread: {n_ex}"
    assert "Join" not in plan
    assert "chunk_md5" in df.columns and "chunk_text" not in df.columns


@check("media_curation_e2e: one Arrow pass, payloads never shuffle")
def _(qs, spark):
    plan = plan_of(qs["media_curation_e2e"](spark, SF_DIR))
    # formatted explain names the node once in the tree and once in the
    # detail section — assert presence, and that there is only ONE distinct
    # Arrow stage id
    ids = set(re.findall(r"^\((\d+)\) MapInPandas", plan, re.M))
    assert len(ids) == 1, f"expected exactly one Arrow stage, saw {ids}"
    n_ex = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_ex <= 1, f"media bytes must not shuffle: {n_ex} exchanges"


@check("spell_correct_symdel: deletion-key blocking is an equi-join, no distance matrix")
def _(qs, spark):
    plan = plan_of(qs["spell_correct_symdel"](spark, SF_DIR))
    # the whole point of SymSpell: candidates meet on EQUAL keys; a
    # nested-loop over queries x vocab would be the distance-matrix shape
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, "blocking degraded to all-pairs"
    cols = read_schema_cols(plan, "documents")
    assert cols == {"text"}, f"vocab build should read only text: {cols}"


@check("embedding_hamming_ann: one Hamming scan join, equi rerank joins")
def _(qs, spark):
    plan = plan_of(qs["embedding_hamming_ann"](spark, SF_DIR))
    # exactly ONE nested-loop join is intended: the broadcast query batch
    # streaming past the corpus codes (the Hamming scan). The rerank joins
    # key on query_id/vec_id and must stay hash joins — a second nested
    # loop would mean the float vectors are being scanned all-pairs.
    n_nlj = len(re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", plan, re.M))
    assert n_nlj == 1, f"expected exactly one Hamming-scan NLJ, saw {n_nlj}"
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan, "rerank joins should be broadcast equi-joins"


@check("feature_hash_vectors: stateless projection, pruned scan, partial agg")
def _(qs, spark):
    plan = plan_of(qs["feature_hash_vectors"](spark, SF_DIR))
    cols = read_schema_cols(plan, "documents")
    assert cols == {"source", "text"}, f"scan should read source+text only: {cols}"
    assert "Join" not in plan, "hashing trick must not build/join a vocabulary"
    assert "partial" in plan.lower(), "no map-side partial aggregation"


@check("dp_noisy_histogram / flesch_readability / rare_category_collapse: agg-then-decorate, pruned scans")
def _(qs, spark):
    plan = plan_of(qs["dp_noisy_histogram"](spark, SF_DIR))
    assert read_schema_cols(plan, "documents") == {"source"}
    assert "partial" in plan.lower()
    plan = plan_of(qs["flesch_readability"](spark, SF_DIR))
    assert read_schema_cols(plan, "documents") == {"source", "text"}
    assert "partial" in plan.lower()
    plan = plan_of(qs["rare_category_collapse"](spark, SF_DIR))
    assert read_schema_cols(plan, "part") == {"p_type"}
    # the unpartitioned window must sit ABOVE the category aggregate (the
    # exchange into the window is a single-partition move of ~150 agg rows,
    # never the fact table): aggregate node ids all smaller than Window's
    win = re.search(r"^\((\d+)\) Window", plan, re.M)
    agg = re.search(r"^\((\d+)\) HashAggregate", plan, re.M)
    assert win and agg, "expected window over hash aggregate"


@check("gdpr_delete_cascade: cascade levels are semi-joins on the FK")
def _(qs, spark):
    plan = plan_of(qs["gdpr_delete_cascade"](spark, SF_DIR))
    n_semi = len(re.findall(r"LeftSemi", plan))
    assert n_semi >= 3, f"expected >=3 semi-joins (orders, lineitem x2 levels): {n_semi}"
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "lineitem")
    assert cols == {"l_orderkey"}, f"lineitem scan should read only the FK: {cols}"


@check("triplet_mining_hard_negatives: one anchor-batch NLJ, windows share the scan")
def _(qs, spark):
    plan = plan_of(qs["triplet_mining_hard_negatives"](spark, SF_DIR))
    n_nlj = len(re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", plan, re.M))
    # pos/neg branches each reference the scored frame; exchange reuse may
    # keep it at 1 — but never more than 2 corpus passes
    assert 1 <= n_nlj <= 2, f"anchor scan NLJ count out of range: {n_nlj}"
    assert "CartesianProduct" not in plan


@check("copurchase_pmi_scores / calibration / fertility: pruned scans, TakeOrdered ranking")
def _(qs, spark):
    # PMI builds behind localCheckpoint (persist-barriered pair table), so
    # assert on the cheap decorated frames instead
    plan = plan_of(qs["calibration_ece_report"](spark, SF_DIR))
    assert read_schema_cols(plan, "documents") == {"doc_id", "n_chars"}
    assert "partial" in plan.lower()
    plan = plan_of(qs["tokenizer_fertility_by_lang"](spark, SF_DIR))
    assert read_schema_cols(plan, "documents") == {"lang", "text", "n_chars"}
    assert "partial" in plan.lower()


@check("wasserstein_drift_binned: one fact scan per branch, bounded bin-spine window")
def _(qs, spark):
    plan = plan_of(qs["wasserstein_drift_binned"](spark, SF_DIR))
    cols = read_schema_cols(plan, "events")
    assert cols == {"user_id", "value"}, f"scan should read user_id+value: {cols}"
    # the CDF window must be over the bin spine (single-partition exchange of
    # <= W1_BINS rows), never a fact-table sort: every Sort node in the plan
    # sorts by `bin`
    sorts = re.findall(r"^\(\d+\) Sort \[(.*?)\]", plan, re.M)
    assert all("bin" in s for s in sorts), f"unexpected non-bin sort: {sorts}"


@check("theil_sen_daily_trend / freshness_sla_report: aggregate-then-quadratic/window")
def _(qs, spark):
    plan = plan_of(qs["freshness_sla_report"](spark, SF_DIR))
    assert read_schema_cols(plan, "events") == {"event_type", "ts"}
    assert "partial" in plan.lower(), "no map-side partial aggregation"
    # theil_sen builds behind localCheckpoint (persisted daily aggregate);
    # assert the date filter is pushed on the cheap daily probe instead
    from datapipeline_ops_spark.tables import load_table as _lt

    daily = (
        _lt(spark, "/root/testdata/sf0.01", "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-04-01").cast("timestamp"))
        .groupBy("o_orderdate")
        .count()
    )
    pf = pushed_filters(plan_of(daily), "orders")
    assert "GreaterThanOrEqual" in pf, f"date filter not pushed: {pf!r}"


@check("join_skew_diagnosis: frequency pass + 1-row broadcast + TakeOrdered")
def _(qs, spark):
    plan = plan_of(qs["join_skew_diagnosis"](spark, SF_DIR))
    assert read_schema_cols(plan, "lineitem") == {"l_partkey"}
    assert "TakeOrderedAndProject" in plan, "top-k must be TakeOrdered, not global sort"
    assert "CartesianProduct" not in plan


@check("seasonal_naive_backtest / conversion_ab_ztest: pushed filters, pruned scans")
def _(qs, spark):
    plan = plan_of(qs["seasonal_naive_backtest"](spark, SF_DIR))
    assert read_schema_cols(plan, "orders") == {"o_orderdate"}
    pf = pushed_filters(plan, "orders")
    assert "GreaterThanOrEqual" in pf, f"date filter not pushed: {pf!r}"
    plan = plan_of(qs["conversion_ab_ztest"](spark, SF_DIR))
    assert read_schema_cols(plan, "events") == {"user_id", "event_type", "value"}
    assert "partial" in plan.lower()
    assert "Join" not in plan, "the per-user collapse needs no join"


@check("hll_mergeability_audit: ONE fact scan builds all three register sets")
def _(qs, spark):
    plan = plan_of(qs["hll_mergeability_audit"](spark, SF_DIR))
    n_scans = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))
    assert n_scans == 1, f"conditional-max must not re-scan: {n_scans} scans"
    assert read_schema_cols(plan, "events") == {"user_id"}
    assert "Join" not in plan


@check("dedup_rate_curve: one text-hash scan + 1-row max probe, pruned schemas")
def _(qs, spark):
    plan = plan_of(qs["dedup_rate_curve"](spark, SF_DIR))
    # two scans are the intended shape: the 1-row max(doc_id) probe (reads
    # doc_id only) and the single hash pass (doc_id + text) — text must
    # appear in exactly ONE scan schema, i.e. each doc is md5'd once
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    with_text = [s for s in schemas if "text" in s]
    assert len(schemas) == 2, f"expected max-probe + hash scan: {schemas}"
    assert len(with_text) == 1, f"text must be scanned exactly once: {schemas}"
    assert "CartesianProduct" not in plan


@check("markov_next_event_accuracy / power_sample_size_calc: user-window + states-sized tail")
def _(qs, spark):
    plan = plan_of(qs["markov_next_event_accuracy"](spark, SF_DIR))
    assert read_schema_cols(plan, "events") == {"user_id", "event_type", "ts", "event_id"}
    # the lead window must partition by user_id (never an unpartitioned
    # fact-table window); everything after the transition aggregate is
    # states-sized
    assert re.search(r"windowspecdefinition\(user_id", plan), (
        "lead window not user-partitioned"
    )
    plan = plan_of(qs["power_sample_size_calc"](spark, SF_DIR))
    assert read_schema_cols(plan, "events") == {"user_id", "event_type", "value"}
    assert "Join" not in plan and "partial" in plan.lower()


@check("hilbert_vs_zorder_locality: one scan, codegen bit-walk, bounded agg")
def _(qs, spark):
    plan = plan_of(qs["hilbert_vs_zorder_locality"](spark, SF_DIR))
    n_scans = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))
    assert n_scans == 2, f"expected extent probe + code scan: {n_scans}"
    assert read_schema_cols(plan, "orders") == {"o_totalprice", "o_custkey"}
    # the 8-stage Hilbert walk must stay inside projections — no exchange
    # until the (curve, bucket) aggregate (plus its final rollup)
    n_ex = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_ex <= 2, f"bit-walk must not shuffle: {n_ex} exchanges"
    assert "CartesianProduct" not in plan


@check("event_trigram_funnels: one user-window serves both leads, TakeOrdered tail")
def _(qs, spark):
    plan = plan_of(qs["event_trigram_funnels"](spark, SF_DIR))
    n_win = len(re.findall(r"^\(\d+\) Window", plan, re.M))
    assert n_win == 1, f"both leads must share one window: {n_win}"
    assert "TakeOrderedAndProject" in plan
    assert read_schema_cols(plan, "events") == {"user_id", "event_type", "ts", "event_id"}


@check("pass_at_k_eval / quality_gate_correlation: task-bounded explode / one-scan counters")
def _(qs, spark):
    plan = plan_of(qs["pass_at_k_eval"](spark, SF_DIR))
    assert read_schema_cols(plan, "documents") == {"source"}
    # the attempts explode runs ABOVE the distinct task collapse — Generate
    # over an aggregate, never over the corpus scan
    assert "Generate" in plan and "HashAggregate" in plan
    plan = plan_of(qs["quality_gate_correlation"](spark, SF_DIR))
    n_scans = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))
    assert n_scans == 1, f"12 counters must share one scan: {n_scans}"
    assert "Join" not in plan


@check("daily_anomaly_mad: rank windows partition by stream over the daily aggregate")
def _(qs, spark):
    plan = plan_of(qs["daily_anomaly_mad"](spark, SF_DIR))
    specs = re.findall(r"windowspecdefinition\((\w+)", plan)
    assert specs and all(s == "event_type" for s in specs), (
        f"all windows must partition by event_type: {set(specs)}"
    )


@check("provenance_hash_rollup / encoding_advisor: bounded collects, page-blocked windows")
def _(qs, spark):
    plan = plan_of(qs["provenance_hash_rollup"](spark, SF_DIR))
    assert read_schema_cols(plan, "documents") == {"doc_id", "source", "text"}
    # two-level Merkle tree = exactly two aggregates, no join, no window
    assert "Join" not in plan and "Window" not in plan
    plan = plan_of(qs["encoding_advisor"](spark, SF_DIR))
    specs = re.findall(r"windowspecdefinition\((\w+)", plan)
    assert specs and all(s == "blk" for s in specs), (
        f"run-count windows must partition by page block: {set(specs)}"
    )


@check("annotator_kappa / prefix_sharing_stats: one-scan contingency / bounded-slice key")
def _(qs, spark):
    plan = plan_of(qs["annotator_kappa"](spark, SF_DIR))
    n_scans = len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M))
    assert n_scans == 1 and "Join" not in plan
    assert read_schema_cols(plan, "documents") == {"doc_id"}
    plan = plan_of(qs["prefix_sharing_stats"](spark, SF_DIR))
    assert read_schema_cols(plan, "documents") == {"text"}
    assert "partial" in plan.lower()


@check("dedup_token_savings / context_window_fit: hash-key join / single-agg scans")
def _(qs, spark):
    plan = plan_of(qs["dedup_token_savings"](spark, SF_DIR))
    # two scans (keeper branch reads a NARROWER schema than the attribution
    # branch) — both must stay pruned to the three referenced columns
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for s in schemas for c in s.split(",") if c}
    assert cols == {"doc_id", "source", "text"}, f"unpruned scan: {schemas}"
    assert "partial" in plan.lower()
    plan = plan_of(qs["context_window_fit_report"](spark, SF_DIR))
    assert read_schema_cols(plan, "documents") == {"source", "text"}
    assert "Join" not in plan and "partial" in plan.lower()


@check("simpsons_paradox_check: dim join + segment rollup; source_vocab: distinct-first")
def _(qs, spark):
    plan = plan_of(qs["simpsons_paradox_check"](spark, SF_DIR))
    assert read_schema_cols(plan, "orders") == {
        "o_custkey", "o_orderpriority", "o_totalprice",
    }
    assert "CartesianProduct" not in plan
    plan = plan_of(qs["source_vocab_jaccard_matrix"](spark, SF_DIR))
    # the pair join must read the persisted DISTINCT (source, token) index,
    # not re-explode the corpus per side
    assert "InMemoryTableScan" in plan, "distinct index not barriered"
    assert read_schema_cols(plan, "documents") in ({"source", "text"}, set()), (
        "scan should read source+text only"
    )


@check("blocklist_filter_report / qi_uniqueness_report: filter-inside-explode / bounded rollups")
def _(qs, spark):
    plan = plan_of(qs["blocklist_filter_report"](spark, SF_DIR))
    # the IN-list must prune inside/below the explode: the aggregate after
    # Generate only ever sees blocklisted tokens
    assert "Generate" in plan and "partial" in plan.lower()
    assert "CartesianProduct" not in plan
    plan = plan_of(qs["qi_uniqueness_report"](spark, SF_DIR))
    assert read_schema_cols(plan, "customer") == {
        "c_nationkey", "c_mktsegment", "c_acctbal",
    }
    assert "Join" not in plan


@check("bradley_terry / neyman / session_gap: arm-bounded grid, moment pass, one window")
def _(qs, spark):
    plan = plan_of(qs["bradley_terry_strengths"](spark, SF_DIR))
    assert read_schema_cols(plan, "documents") == {"source"}
    assert "CartesianProduct" not in plan
    plan = plan_of(qs["neyman_allocation_plan"](spark, SF_DIR))
    assert read_schema_cols(plan, "events") == {"event_type", "value"}
    assert "Join" not in plan and "partial" in plan.lower()
    plan = plan_of(qs["session_gap_sensitivity"](spark, SF_DIR))
    specs = re.findall(r"windowspecdefinition\((\w+)", plan)
    assert specs and all(s == "user_id" for s in specs), f"windows: {set(specs)}"
    assert read_schema_cols(plan, "events") == {"user_id", "ts", "event_id"}


@check("good_turing / colbert: vocab-sized tail, single broadcast MaxSim scan")
def _(qs, spark):
    plan = plan_of(qs["good_turing_smoothing"](spark, SF_DIR))
    assert read_schema_cols(plan, "documents") == {"text"}
    assert "partial" in plan.lower()
    plan = plan_of(qs["colbert_maxsim_topk"](spark, SF_DIR))
    n_nlj = len(re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", plan, re.M))
    assert n_nlj == 1, f"MaxSim must be ONE broadcast corpus pass: {n_nlj}"
    assert "CartesianProduct" not in plan


@check("supplier_wilson / elasticity: moment pass + TakeOrdered / dim join rollup")
def _(qs, spark):
    plan = plan_of(qs["supplier_return_wilson"](spark, SF_DIR))
    assert read_schema_cols(plan, "lineitem") == {"l_suppkey", "l_returnflag"}
    assert "TakeOrderedAndProject" in plan
    plan = plan_of(qs["discount_quantity_elasticity"](spark, SF_DIR))
    assert read_schema_cols(plan, "lineitem") == {
        "l_partkey", "l_discount", "l_quantity",
    }
    assert "partial" in plan.lower() and "CartesianProduct" not in plan


@check("trade_flow_matrix: dims broadcast, fact chain shuffles (Q7 shape)")
def _(qs, spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(qs["trade_flow_matrix"](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    n_bcast = len(re.findall(r"^\(\d+\) BroadcastExchange", plan, re.M))
    assert n_bcast == 3, f"supplier + 2 nation arms should broadcast: {n_bcast}"
    n_shuffle_joins = len(
        re.findall(r"^\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan, re.M)
    )
    assert n_shuffle_joins == 2, (
        f"orderkey+custkey joins must shuffle, saw {n_shuffle_joins}"
    )
    plan2 = plan_of(qs["small_quantity_order_revenue"](spark, SF_DIR))
    # two scans (threshold branch narrower than the probe branch) — union
    # of schemas must stay pruned to the three referenced columns
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan2)
    cols = {c.split(":")[0] for s in schemas for c in s.split(",") if c}
    assert cols == {"l_partkey", "l_quantity", "l_extendedprice"}, schemas


@check("ams_f2_sketch: distinct-first, pruned events scan, no cartesian")
def _(qs, spark):
    plan = plan_of(qs["ams_f2_sketch"](spark, SF_DIR))
    cols = read_schema_cols(plan, "events")
    assert cols == {"user_id"}, f"scan should read only user_id: {cols}"
    assert "CartesianProduct" not in plan
    # the explode must sit above the per-user aggregate (distinct-first):
    # Generate's child chain contains a HashAggregate, i.e. aggregate ids
    # precede the generate in the formatted tree order
    assert "Generate" in plan and "HashAggregate" in plan


@check("colbert batches: broadcast side corpus-independent (pushed vec_id bound)")
def _(qs, spark):
    # The round-6 verdict's design nit: a query batch defined as a MODULUS of
    # vec_id broadcasts |corpus|/k rows. Both MaxSim variants (and the
    # Hamming/triplet batches) must instead push a CONSTANT vec_id upper
    # bound into the embeddings scan — the broadcast side is then
    # corpus-independent by construction at any index size.
    for qname in (
        "colbert_maxsim_topk",
        "colbert_maxsim_ivf_topk",
        "embedding_hamming_ann",
        "triplet_mining_hard_negatives",
    ):
        plan = plan_of(qs[qname](spark, SF_DIR))
        assert re.search(r"PushedFilters: \[[^\]]*LessThan\(vec_id,\d+\)", plan), (
            f"{qname}: query-batch scan must push a constant vec_id bound"
        )
        assert "CartesianProduct" not in plan, qname


@check("colbert_maxsim_ivf_topk: cell equi-join, rerank never full-corpus")
def _(qs, spark):
    # With auto-broadcast off, the ONLY broadcasts are the two explicitly
    # constant-sized frames (10 centroids, 10 queries); the cell shortlist
    # must reach MaxSim through a hash join keyed on cid, never a
    # nested-loop over the whole corpus.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(qs["colbert_maxsim_ivf_topk"](spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # Up to 3 = the 10-row centroid frame twice (items + queries leg both
    # rebuild the assignment) + the 10-row query batch; all
    # corpus-independent. Bounds, not exact counts: a Spark version that
    # reuses the centroid exchange (ReusedExchange) legitimately lowers the
    # count — the invariant is "nothing corpus-derived broadcasts", i.e. the
    # broadcast count never EXCEEDS the 3 known constant frames.
    n_bcast = len(re.findall(r"^\(\d+\) BroadcastExchange", plan, re.M))
    assert 1 <= n_bcast <= 3, (
        f"only centroid/query constants may broadcast: {n_bcast}"
    )
    # the rerank itself must ride the cid equi-join (hash), and the only
    # nested loops are the centroid-assignment argmaxes over the 10-row frame
    assert len(re.findall(r"^\(\d+\) BroadcastHashJoin", plan, re.M)) >= 1
    n_nlj = len(re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", plan, re.M))
    assert n_nlj <= 2, f"nested loops beyond the 2 centroid argmaxes: {n_nlj}"
    assert "CartesianProduct" not in plan


@check("serving_retrieval_e2e: fusion/gate on top-k tables, one corpus MaxSim leg")
def _(qs, spark):
    plan = plan_of(qs["serving_retrieval_e2e"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # dense leg must be the IVF-pruned variant: constant vec_id bound pushed
    assert re.search(r"PushedFilters: \[[^\]]*LessThan\(vec_id,\d+\)", plan)
    # the gate is a 1-row aggregate broadcast back onto the fused top-k
    assert "BroadcastExchange" in plan


@check("top_revenue_suppliers: Q15 date window pushed to scan, 1-row max broadcast")
def _(qs, spark):
    plan = plan_of(qs["top_revenue_suppliers"](spark, SF_DIR))
    pf = pushed_filters(plan, "lineitem")
    assert "GreaterThanOrEqual(l_shipdate" in pf and "LessThan(l_shipdate" in pf, pf
    assert "CartesianProduct" not in plan
    # the scalar max joins back as a broadcast, not a shuffle of the agg
    assert "BroadcastExchange" in plan


@check("sole_late_supplier_report: Q21 decorrelation — no fact self-join, status pushed")
def _(qs, spark):
    plan = plan_of(qs["sole_late_supplier_report"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "EqualTo(o_orderstatus,F)" in pushed_filters(plan, "orders")
    # ONE lineitem scan: the exists/not-exists pair rides the aggregated
    # (order, supplier) frame, never a second pass over the fact
    n_li_scans = plan.count("lineitem.parquet")
    assert n_li_scans == 1, f"lineitem scanned {n_li_scans}x"


@check("brand_bucket_supplier_counts: Q16 blocklist plans as broadcast anti-join")
def _(qs, spark):
    plan = plan_of(qs["brand_bucket_supplier_counts"](spark, SF_DIR))
    assert re.search(r"BroadcastHashJoin .*LeftAnti", plan), "blocklist not anti-join"
    cols = read_schema_cols(plan, "lineitem")
    assert cols == {"l_partkey", "l_suppkey"}, cols


@check("quantity_concentration_parts: Q11 global scalar from the agg, one fact scan")
def _(qs, spark):
    plan = plan_of(qs["quantity_concentration_parts"](spark, SF_DIR))
    n_li_scans = plan.count("lineitem.parquet")
    assert n_li_scans == 1, f"lineitem scanned {n_li_scans}x"
    assert "CartesianProduct" not in plan  # 1-row total must broadcast
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


@check("min_cost_supplier_per_part: Q2 argmin joins pair aggs, dims broadcast")
def _(qs, spark):
    plan = plan_of(qs["min_cost_supplier_per_part"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    n_li_scans = plan.count("lineitem.parquet")
    assert n_li_scans <= 2, f"lineitem scanned {n_li_scans}x"
    cols = read_schema_cols(plan, "lineitem")
    assert "l_shipdate" not in cols and "l_tax" not in cols, cols


@check("spearman/mann-whitney: rank spine windows are bucket-partitioned")
def _(qs, spark):
    # The two-level prefix-sum contract: per-VALUE running sums must be
    # partitioned by the coarse bucket (windowspecdefinition lists _bkt as
    # partition key); only bucket-spine cumsum windows may be unpartitioned.
    for name in ("spearman_spend_orders", "mann_whitney_value_shift"):
        plan = plan_of(qs[name](spark, SF_DIR))
        specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
        assert specs, f"{name}: no window specs found"
        for spec in specs:
            first = spec.split(",")[0]
            assert "_bkt" in first, (
                f"{name}: window not bucket-led: {spec[:80]}"
            )


@check("experiment_readout_e2e: three 1-2-row legs, bounded broadcasts")
def _(qs, spark):
    plan = plan_of(qs["experiment_readout_e2e"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # each leg collapses events with one partial-agg pass. Runtime scans = 3
    # (CUPED's per-user frame is persisted and reused by its theta and
    # control consumers), but formatted explain reprints a cached subtree's
    # child plan at every reference, so the TEXT count is higher; bound it
    # at the 5 printed references so a genuinely new leg still fails.
    n_ev = plan.count("events.parquet")
    assert n_ev <= 5, f"events subtree printed {n_ev}x"
    # the control row and the MW z join back as broadcasts of 1-row frames
    assert "BroadcastExchange" in plan


@check("mann_kendall_trend: pair join on the bounded day spine, one fact scan")
def _(qs, spark):
    plan = plan_of(qs["mann_kendall_trend"](spark, SF_DIR))
    # the barrier makes the spine an InMemoryRelation consumed three times;
    # the orders fact itself must appear once per cached-subtree print, and
    # the pair join must be a range join on the spine, never on the fact
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "orders")
    assert cols <= {"o_orderdate", "o_totalprice"}, cols


@check("kaplan_meier_conversion: windows only on the duration spine")
def _(qs, spark):
    plan = plan_of(qs["kaplan_meier_conversion"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # events scan pruned to the three referenced columns
    cols = read_schema_cols(plan, "events")
    assert cols <= {"user_id", "event_type", "ts"}, cols
    # the per-user aggregates run BEFORE any window: every window sits above
    # the spine aggregate, so no window spec partitions by user_id
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs and all("user_id" not in sp for sp in specs), specs[:2]


@check("cohort_ltv_matrix: cumulative window per cohort, pruned orders scan")
def _(qs, spark):
    plan = plan_of(qs["cohort_ltv_matrix"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # the cohort-map branch reads only (custkey, orderdate); the spend branch
    # adds totalprice — regex block-matching can surface either scan first,
    # so pin the superset bound plus totalprice's presence in SOME ReadSchema
    cols = read_schema_cols(plan, "orders")
    assert cols <= {"o_custkey", "o_orderdate", "o_totalprice"}, cols
    assert "o_totalprice" in plan
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs and all("cohort" in sp.split(",")[0] for sp in specs), specs[:2]


@check("t_closeness_audit: topic spine broadcast, one documents subtree")
def _(qs, spark):
    plan = plan_of(qs["t_closeness_audit"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "lang", "source"}, cols
    # the global topic distribution and the 1-row total ride broadcasts
    assert plan.count("BroadcastExchange") >= 2


@check("join_cardinality_audit: prediction rides agg-sized equi-join")
def _(qs, spark):
    plan = plan_of(qs["join_cardinality_audit"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # both fact scans prune to the single join-key column
    assert read_schema_cols(plan, "lineitem") == {"l_orderkey"}
    assert read_schema_cols(plan, "orders") == {"o_orderkey"}


@check("diff_in_diff_revenue: 4-cell barrier, broadcast contrast joins")
def _(qs, spark):
    plan = plan_of(qs["diff_in_diff_revenue"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "orders")
    assert cols <= {"o_custkey", "o_orderdate", "o_totalprice"}, cols
    assert "BroadcastExchange" in plan


@check("pretrain_prep_e2e: barriered stages, bounded scans, no global window")
def _(qs, spark):
    plan = plan_of(qs["pretrain_prep_e2e"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # documents is scanned twice at runtime (shingle barrier + token counts);
    # formatted explain reprints cached subtrees per reference, so bound the
    # printed count rather than pinning it — a new uncached leg still fails
    n_doc = plan.count("documents.parquet")
    assert n_doc <= 8, f"documents subtree printed {n_doc}x"
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "text", "source"}, cols
    # per-source joins ride broadcasts; the packing prefix-sum must window
    # within range partitions (_pid-led), with the only unpartitioned window
    # the 32-row partition-offset spine (_pid ordering, empty partition spec
    # prints as 'windowspecdefinition(_pid...')
    assert "BroadcastExchange" in plan
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs and all(sp.split(",")[0].strip().startswith("_pid") for sp in specs), specs[:2]


@check("neardup_split_leakage: rides the capped LSH path, no all-pairs")
def _(qs, spark):
    plan = plan_of(qs["neardup_split_leakage"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "text"}, cols
    # pair generation is the bucket-grouped LSH stage, never an uncapped
    # cross stage; the InMemory barrier from with_shingle_hashes is present
    assert "BroadcastNestedLoopJoin" not in plan
    assert "InMemoryTableScan" in plan


@check("mixture_realized_audit: source-key rollups, broadcast weight table")
def _(qs, spark):
    plan = plan_of(qs["mixture_realized_audit"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "text", "source"}, cols
    # the |sources|-row weight table rides a broadcast into the sampling
    # filter; per-doc rows never hash-exchange (only source rollups do)
    assert "BroadcastExchange" in plan
    assert "windowspecdefinition" not in plan


@check("preference_pair_margins: one user_id exchange feeds both windows")
def _(qs, spark):
    plan = plan_of(qs["preference_pair_margins"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "events")
    assert cols <= {"event_id", "user_id", "event_type", "value"}, cols
    # both row_numbers and the per-prompt collapse share the user_id
    # partitioning; the only other exchange is the |types|^2 rollup
    specs = re.findall(r"windowspecdefinition\(user_id[^)]*\)", plan)
    assert len(specs) >= 2, "expected both per-user windows"
    n_ex = plan.count("Exchange hashpartitioning")
    assert n_ex <= 2, f"{n_ex} hash exchanges"


@check("tokenizer_roundtrip_audit: one pruned scan, lang-key rollup, no window")
def _(qs, spark):
    plan = plan_of(qs["tokenizer_roundtrip_audit"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"text", "lang"}, cols
    assert "windowspecdefinition" not in plan
    # the only exchange is the low-cardinality lang rollup
    n_ex = plan.count("Exchange hashpartitioning")
    assert n_ex <= 1, f"{n_ex} hash exchanges"


@check("dedup_manifest_reconcile: md5 equi-joins only, pruned scans")
def _(qs, spark):
    plan = plan_of(qs["dedup_manifest_reconcile"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "text", "source"}, cols
    # manifest lookups and keeper resolution are hash-keyed equi-joins; the
    # only nested-loop is the broadcast of the 1-row manifest count
    assert "BroadcastNestedLoopJoin" not in plan or "BroadcastExchange" in plan
    # the global roll-forward window runs on per-source rows (bounded by the
    # source vocabulary), never on per-doc rows
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert len(specs) <= 4, specs[:2]


@check("serving_eval_gate_e2e: composed top-k tables, no cartesian blowup")
def _(qs, spark):
    plan = plan_of(qs["serving_eval_gate_e2e"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "embeddings")
    assert cols <= {"vec_id", "embedding"}, cols
    # both retrieval legs end in constant top-k tables; the gate windows
    # over the N_QUERIES-row result only
    assert "BroadcastExchange" in plan


@check("contamination_decay_audit: broadcast bench set, constant-size round rollup")
def _(qs, spark):
    plan = plan_of(qs["contamination_decay_audit"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "text"}, cols
    # benchmark shingle set broadcasts; the cumulative/lag windows run on the
    # _DECAY_ROUNDS-row rollup (round_id spine), never on per-doc rows
    assert "BroadcastExchange" in plan
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs and all("round_id" in sp.split(",")[0] or sp.strip().startswith("round_id") or "round_id" in sp for sp in specs), specs[:2]


@check("int8_serving_parity: map-only quantization, constant query broadcast")
def _(qs, spark):
    plan = plan_of(qs["int8_serving_parity"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "embeddings")
    assert cols <= {"vec_id", "embedding"}, cols
    # the int8 scoring leg joins the corpus against the broadcast constant
    # query batch (theta join -> BroadcastNestedLoopJoin is expected and
    # bounded: N_QUERIES rows); no corpus-side cartesian exists
    assert "BroadcastExchange" in plan
    # top-k windows partition by query_id; the only other window is the
    # gate rollup's GLOBAL spec (empty partition list prints as
    # 'specifiedwindowframe'), which runs on the N_QUERIES-row table
    specs = re.findall(r"windowspecdefinition\((\w+)", plan)
    assert specs and all(s in ("query_id", "specifiedwindowframe") for s in specs), specs[:3]


@check("tokenizer_swap_impact: vocab-bounded argmax, array-side occurrence count")
def _(qs, spark):
    plan = plan_of(qs["tokenizer_swap_impact"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "text", "source"}, cols
    # the 1-row merge rule broadcasts back onto the cached token arrays
    # (persist barrier); the corpus-side stages are TakeOrdered over the
    # aggregated pair table + a low-cardinality source rollup — no window
    assert "InMemoryTableScan" in plan
    assert "TakeOrderedAndProject" in plan
    assert "windowspecdefinition" not in plan


@check("dedup_tau_sensitivity: one LSH pass, 9-row tau spine broadcast")
def _(qs, spark):
    plan = plan_of(qs["dedup_tau_sensitivity"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "text"}, cols
    # the expensive banding/verify work rides the shared shingle barrier;
    # thresholds fan out via a broadcast of the constant tau spine, and the
    # rollups key on the 9-value tau_pct
    assert "InMemoryTableScan" in plan
    assert "BroadcastExchange" in plan
    assert "windowspecdefinition" not in plan


@check("quality_filter_sweep: zero-UDF feature pass, 9-row tau spine broadcast")
def _(qs, spark):
    plan = plan_of(qs["quality_filter_sweep"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "text"}, cols
    # the feature pass is pure whole-stage projection (no Python rows); each
    # threshold is a broadcast-spine filter + low-cardinality rollup
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastExchange" in plan
    assert "windowspecdefinition" not in plan


@check("epoch_repeat_plan: corpus reduced to source frame before windows")
def _(qs, spark):
    plan = plan_of(qs["epoch_repeat_plan"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"source", "text"}, cols
    # the corpus collapses through a partial-aggregated source groupBy; the
    # water-filling windows run on the per-source frame only, and the two
    # residual 1-row totals ride along as broadcasts
    assert "partial_sum" in plan, "no map-side combine before the source rollup"
    assert "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@check("ann_probe_recall_curve: one scoring pass, broadcast spine sweep")
def _(qs, spark):
    plan = plan_of(qs["ann_probe_recall_curve"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "embeddings")
    assert cols <= {"vec_id", "embedding", "label"}, cols
    # centroids, query-probe table and the 4-row nprobe spine all broadcast;
    # the dot products are JVM array expressions, never Python rows
    assert "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@check("neardup_cluster_purity: pruned doc join onto the clustered subset")
def _(qs, spark):
    plan = plan_of(qs["neardup_cluster_purity"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "text", "lang", "source"}, cols
    # the cluster labels arrive as the CC operator's checkpointed frame; the
    # joined member table persists so both rollups share one documents scan
    assert "Scan ExistingRDD" in plan
    assert "InMemoryTableScan" in plan


@check("media_phash_neardup: banded equi-join, bytes never shuffle")
def _(qs, spark):
    plan = plan_of(qs["media_phash_neardup"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id"}, cols
    # hashing happens inside one Arrow-batched pass (only band BIGINTs come
    # out); candidates form through an equi-join on band buckets
    assert "MapInPandas" in plan
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan)


@check("epoch_shuffle_audit: bucketed windows, no single-task global sort")
def _(qs, spark):
    plan = plan_of(qs["epoch_shuffle_audit"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id"}, cols
    # successors compute inside (epoch, bucket) window partitions; the
    # 4-row epoch spine broadcasts; the repeat check is a pure equi-join
    assert "BroadcastExchange" in plan
    assert "windowspecdefinition" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@check("audio_fingerprint_neardup: banded equi-join, audio bytes never shuffle")
def _(qs, spark):
    plan = plan_of(qs["audio_fingerprint_neardup"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id"}, cols
    assert "MapInPandas" in plan
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan)


@check("scaling_law_subsets: integer-threshold membership, source-frame joins")
def _(qs, spark):
    plan = plan_of(qs["scaling_law_subsets"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "source", "text"}, cols
    # one partial-aggregated rollup to (pct, source) cells; the audit joins
    # run on that persisted frame, and membership is a scan-side filter
    assert "partial_sum" in plan or "partial_count" in plan
    assert "InMemoryTableScan" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@check("ivf_cell_balance: broadcast-centroid argmax, 10-row audit frame")
def _(qs, spark):
    plan = plan_of(qs["ivf_cell_balance"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "embeddings")
    assert cols <= {"vec_id", "embedding", "label"}, cols
    assert "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@check("inbatch_negative_collisions: rides the capped LSH path, spine sweep")
def _(qs, spark):
    plan = plan_of(qs["inbatch_negative_collisions"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "text"}, cols
    # near-dup pairs come from the shared banded machinery (persisted
    # shingle barrier); batch membership is hash arithmetic on a spine
    assert "InMemoryTableScan" in plan
    assert "BroadcastExchange" in plan


@check("packing_fill_sweep: one source-partitioned cumsum, spine fan-out")
def _(qs, spark):
    plan = plan_of(qs["packing_fill_sweep"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "source", "text"}, cols
    # the running sum partitions by source and persists; both sweep legs
    # read the barrier, and chunk math runs on the source totals frame
    assert "InMemoryTableScan" in plan
    assert "windowspecdefinition" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@check("minhash_vs_simhash_agreement: two capped pair legs, 3-group rollup")
def _(qs, spark):
    plan = plan_of(qs["minhash_vs_simhash_agreement"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "text"}, cols
    # both legs ride their registered capped paths (persisted shingles /
    # pigeonhole segments); the audit join is a full outer equi-join on the
    # small pair tables
    assert "InMemoryTableScan" in plan
    assert "FullOuter" in plan


@check("dedup_removal_impact: funnel replay + lang-cardinality rollup")
def _(qs, spark):
    plan = plan_of(qs["dedup_removal_impact"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "text", "lang"}, cols
    # attribution joins are doc_id equi-joins; the exact-dup stage persists
    # so the md5 window shuffles once
    assert "InMemoryTableScan" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@check("neardup_chain_overmerge: shared pair/CC machinery, cluster rollups")
def _(qs, spark):
    plan = plan_of(qs["neardup_chain_overmerge"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "text"}, cols
    # CC labels arrive as the checkpointed frame; edges attribute through
    # one doc_a equi-join; both rollups are cluster-cardinality
    assert "Scan ExistingRDD" in plan


@check("crossdoc_substring_dedup: gram-hash equi-shuffle, text-only scan, no cartesian")
def _(qs, spark):
    plan = plan_of(qs["crossdoc_substring_dedup"](spark, SF_DIR))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "source", "text"}, cols
    # dup flag + keep-first rank both ride the single gram-hash exchange;
    # span merge is a per-doc window; the carry-back is an outer equi-join
    assert "windowspecdefinition" in plan
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchange <= 4, f"expected <=4 exchanges (spread, gh, doc merge, join): {n_exchange}"


@check("dedup_savings_by_source: rollup partial-aggs over the shared per-doc stats")
def _(qs, spark):
    plan = plan_of(qs["dedup_savings_by_source"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "source", "text"}, cols
    assert "partial_" in plan, "source rollup must map-side combine"


@check("caption_image_agreement: one Arrow pass, zero joins/shuffles on rows")
def _(qs, spark):
    plan = plan_of(qs["caption_image_agreement"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "source"}, cols
    # the gate is per-row: hash both sides inside mapInPandas, then filter —
    # no Exchange at all, so it streams at scan speed
    assert "MapInPandas" in plan
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan) is None
    n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchange == 0, f"expected 0 exchanges, saw {n_exchange}"


@check("webdataset_shard_plan: one shard exchange feeds window + rollups, no text read")
def _(qs, spark):
    plan = plan_of(qs["webdataset_shard_plan"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "source", "n_chars"}, cols
    assert "windowspecdefinition" in plan
    assert "partial_" in plan, "per-shard rollups must map-side combine"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@check("crosslingual_neardup_rate: lang joins pruned to (doc_id,lang), no cartesian")
def _(qs, spark):
    plan = plan_of(qs["crosslingual_neardup_rate"](spark, SF_DIR))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    cols = read_schema_cols(plan, "documents")
    # the pair machinery reads (doc_id, text); the lang attribution must
    # add ONLY lang — anything else is an unpruned scan
    assert cols <= {"doc_id", "text", "lang"}, cols
    assert "partial_" in plan, "lang-pair rollup must map-side combine"


@check("in_context_packing_plan: broadcast-centroid argmax, bounded pair equi-join")
def _(qs, spark):
    plan = plan_of(qs["in_context_packing_plan"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan, "centroid batch must broadcast"
    # members persist once and feed sizes + the pair join; candidates form
    # through an equi-join on (cluster, ctx_seq), never all-pairs
    assert "InMemoryTableScan" in plan
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan)


@check("rejection_sampling_yield: rank window + broadcast budget spine, no cartesian")
def _(qs, spark):
    plan = plan_of(qs["rejection_sampling_yield"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "events")
    assert cols <= {"user_id", "event_id", "ts"}, cols
    assert "windowspecdefinition" in plan
    # the 4-row budget spine rides the audited broadcast-extent pattern
    assert "BroadcastExchange" in plan
    assert "partial_" in plan, "best-of rollups must map-side combine"


@check("stream_cms_frequency: bounded-register stream agg + broadcast point-query")
def _(qs, spark):
    plan = plan_of(qs["stream_cms_frequency"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # drained registers arrive as a checkpointed in-memory table and
    # broadcast into the point-query join; the exact recount partial-aggs
    assert "BroadcastExchange" in plan
    assert "partial_" in plan


@check("padding_waste_report: zero-join CASE-chain projection, one bucket exchange")
def _(qs, spark):
    plan = plan_of(qs["padding_waste_report"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"text"}, cols
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan) is None
    assert "partial_" in plan
    n_exchange = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchange <= 1, f"expected <=1 exchange (bucket agg), saw {n_exchange}"


@check("train_quality_classifier: driver-literal trajectory, flat local plan")
def _(qs, spark):
    plan = plan_of(qs["train_quality_classifier"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # r14 optimization: stage weights live driver-side between stages (the
    # kmeans-loop precedent) — each stage already ran as ONE
    # partial-aggregated job over the persisted feature table, rounded in
    # Spark, and the published plan is the flat local trajectory. No
    # relational join and no shuffle may appear in it.
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan) is None
    assert "ExistingRDD" in plan, plan[:400]
    assert "Exchange" not in plan, "published trajectory must be a local frame"


@check("bpe_train_loop: checkpoint-flat stages, vocab-bounded stats, no relational join")
def _(qs, spark):
    plan = plan_of(qs["bpe_train_loop"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # adaptive strategy (r14 optimization): at or under _BPE_DRIVER_VOCAB_CAP
    # entries the merge loop runs driver-local on the collected vocabulary,
    # so the published plan is a flat union of local per-merge stats rows
    # (ExistingRDD) with ZERO exchanges; above the cap every stage rewrites
    # behind a localCheckpoint (2^k lineage otherwise) and the plan is flat
    # scans of checkpointed RDDs plus the bounded stats aggregates. Both
    # forms: no relational join may re-derive the loop.
    assert "ExistingRDD" in plan, plan[:400]
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan) is None, (
        "final plan re-derives stage joins instead of reading checkpoints"
    )
    assert "partial_" in plan or "Exchange" not in plan, (
        "distributed per-merge stats must map-side combine"
    )


@check("trained_gate_impact: scalar weight spine + one source rollup, no relational join")
def _(qs, spark):
    plan = plan_of(qs["trained_gate_impact"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan) is None
    assert "InMemoryTableScan" in plan, "feature table must persist across passes"
    assert "BroadcastNestedLoopJoin" in plan
    assert "partial_" in plan, "source rollup must map-side combine"
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"source", "text"}, cols


@check("bpe_vocab_apply: vocab-bounded token equi-join over checkpoint-flat stages")
def _(qs, spark):
    plan = plan_of(qs["bpe_vocab_apply"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # the trained vocab arrives as a checkpointed RDD; tokenization is one
    # equi-join between two vocab-bounded tables + a source rollup
    assert "ExistingRDD" in plan, plan[:400]
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan), (
        "apply must be an equi-join on the token key"
    )
    assert "partial_" in plan, "source rollup must map-side combine"
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"source", "text"}, cols


@check("token_chunk_udtf: Arrow UDTF windowed expansion, zero shuffles, 2-col scan")
def _(qs, spark):
    plan = plan_of(qs["token_chunk_udtf"](spark, SF_DIR))
    assert "ArrowEvalPythonUDTF" in plan, "UDTF should evaluate via Arrow"
    assert "BatchEvalPythonUDTF" not in plan, "non-Arrow UDTF in the plan"
    assert "Exchange" not in plan, "per-row expansion must not shuffle"
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "text"}, cols


@check("kmeans_train_loop: flat local trajectory; fused distributed stage is join-free")
def _(qs, spark):
    plan = plan_of(qs["kmeans_train_loop"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # adaptive strategy (r15 optimization): at or under _KM_DRIVER_ROWS_CAP
    # clean corpus rows the Lloyd loop runs driver-local on the collected
    # matrix; above it the fused means+stats distributed loop runs. Both
    # paths publish the per-stage stats as ONE single-slice local frame
    # (all values rounded before collection), so the published plan must
    # be flat: no join, no exchange.
    assert "ExistingRDD" in plan, plan[:400]
    assert re.search(r"\w*Join\w*", plan) is None, re.findall(r"\w*Join\w*", plan)
    assert "Exchange" not in plan, "published trajectory must be a local frame"
    # the distributed form (forced by a zero cap) must keep the fused
    # one-pass-per-stage shape: literal-centroid argmin over the persisted
    # corpus, NO join of any kind, map-side partial aggregation
    from datapipeline_ops_spark.queries import kmeans_loop as km

    old = km._KM_DRIVER_ROWS_CAP
    km._KM_DRIVER_ROWS_CAP = 0
    try:
        km._km_memo_clear()
        dist_plan = plan_of(qs["kmeans_train_loop"](spark, SF_DIR))
    finally:
        km._KM_DRIVER_ROWS_CAP = old
        km._km_memo_clear()
    assert re.search(r"\w*Join\w*", dist_plan) is None
    assert "ExistingRDD" in dist_plan


@check("kmeans_assign_apply: local rollup under the cap; join-free argmin pass above it")
def _(qs, spark):
    plan = plan_of(qs["kmeans_assign_apply"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert re.search(r"\w*Join\w*", plan) is None, re.findall(r"\w*Join\w*", plan)
    # under the cap the rollup was computed from the final driver-local
    # assignment and publishes as a local frame; the distributed form
    # (forced by a zero cap) must stay ONE join-free argmin pass over the
    # persisted corpus with a map-side-combined cluster rollup
    assert "ExistingRDD" in plan, plan[:400]
    from datapipeline_ops_spark.queries import kmeans_loop as km

    old = km._KM_DRIVER_ROWS_CAP
    km._KM_DRIVER_ROWS_CAP = 0
    try:
        km._km_memo_clear()
        dist_plan = plan_of(qs["kmeans_assign_apply"](spark, SF_DIR))
    finally:
        km._KM_DRIVER_ROWS_CAP = old
        km._km_memo_clear()
    assert re.search(r"\w*Join\w*", dist_plan) is None
    assert "InMemoryTableScan" in dist_plan, "corpus projection must persist"
    assert "partial_" in dist_plan, "cluster rollup must map-side combine"
    cols = read_schema_cols(dist_plan, "embeddings")
    assert cols <= {"vec_id", "embedding"}, cols


@check("trained_gate_artifact_apply: weights arrive via parquet artifact scan")
def _(qs, spark):
    plan = plan_of(qs["trained_gate_artifact_apply"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # the model must come FROM THE FILE: a parquet scan of the registry
    # path, broadcast onto the persisted feature table — never the
    # training lineage re-derived inside the apply plan
    assert "quality_gate_weights" in plan, "apply must scan the weights artifact"
    assert "BroadcastNestedLoopJoin" in plan, "1-row weight frame must broadcast"
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan) is None
    assert "InMemoryTableScan" in plan, "feature table must persist"
    assert "partial_" in plan, "source rollup must map-side combine"


@check("bpe_artifact_apply: vocab equi-join against the parquet artifact, loop out of plan")
def _(qs, spark):
    plan = plan_of(qs["bpe_artifact_apply"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "bpe_vocab" in plan, "apply must scan the vocab artifact"
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan), (
        "apply must be an equi-join on the token key"
    )
    # the serving plan must NOT contain the training loop: no checkpointed
    # stage RDDs — the trained state enters only through the file
    assert "ExistingRDD" not in plan, "training lineage leaked into the serving plan"
    assert "partial_" in plan, "source rollup must map-side combine"
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"source", "text"}, cols


@check("kmeans_artifact_apply: centroids arrive via parquet artifact scan, broadcast spine")
def _(qs, spark):
    plan = plan_of(qs["kmeans_artifact_apply"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # the trained centroid matrix must come FROM THE FILE: a parquet scan
    # of the registry path collapsed to a 1-row spine and broadcast — the
    # only join in the serving plan is that scalar-spine BNLJ
    assert "kmeans_centroids" in plan, "apply must scan the centroid artifact"
    assert "BroadcastNestedLoopJoin" in plan, "1-row centroid spine must broadcast"
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan) is None
    assert "InMemoryTableScan" in plan, "corpus projection must persist"
    assert "partial_" in plan, "cluster rollup must map-side combine"
    cols = read_schema_cols(plan, "embeddings")
    assert cols <= {"vec_id", "embedding"}, cols


@check("trained_gate_calibration: one scalar-spine pass, bounded bin rollup")
def _(qs, spark):
    plan = plan_of(qs["trained_gate_calibration"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan) is None
    assert "BroadcastNestedLoopJoin" in plan, "1-row weight frame must broadcast"
    assert "InMemoryTableScan" in plan, "feature table must persist"
    assert "partial_" in plan, "bin rollup must map-side combine"


@check("trained_gate_feature_ablation: all ablations in ONE pass, 4-row unstack")
def _(qs, spark):
    plan = plan_of(qs["trained_gate_feature_ablation"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan) is None
    # the published plan reads the persisted 1-row aggregate (all five
    # accuracies computed together), never five separate corpus passes
    assert "InMemoryTableScan" in plan, "ablation aggregate must persist"
    assert plan.count("Union") >= 1


@check("minibatch_sgd_train: driver-literal trajectory, flat local plan")
def _(qs, spark):
    plan = plan_of(qs["minibatch_sgd_train"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # same shape law as the GD loop after the r14 optimization: each step
    # already ran as ONE batch-filtered partial-aggregated job over the
    # persisted feature table with the step weights as plan literals; the
    # published plan is the flat local trajectory — no relational join, no
    # shuffle.
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan) is None
    assert "ExistingRDD" in plan, plan[:400]
    assert "Exchange" not in plan, "published trajectory must be a local frame"


@check("naive_bayes_train: vocab-capped broadcast assembly, corpus never doc-shuffles")
def _(qs, spark):
    plan = plan_of(qs["naive_bayes_train"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # the class-token count joins against the top-V vocab and the bounded
    # priors/totals frames must all broadcast — the only shuffles are the
    # token-key histogram and the (source, tok) count, both map-side combined
    assert "BroadcastHashJoin" in plan, "vocab/model assembly joins must broadcast"
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "partial_" in plan, "token histogram must map-side combine"
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"source", "text"}, cols


@check("naive_bayes_confusion: broadcast model grid + union'd prior spine, integer argmax")
def _(qs, spark):
    plan = plan_of(qs["naive_bayes_confusion"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan, "token contributions must broadcast-join the model"
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan, "prior spine must broadcast onto docs"
    assert "Union" in plan, "prior rows ride the same aggregate as contributions"
    assert "partial_" in plan, "score sum must map-side combine"
    cols = read_schema_cols(plan, "documents")
    assert cols <= {"doc_id", "source", "text"}, cols


@check("decision_stump_train: one bounded histogram shuffle, sweep on the bounded frame")
def _(qs, spark):
    plan = plan_of(qs["decision_stump_train"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan, "1-row argmin frame must broadcast"
    assert "Generate" in plan, "feature unpivot is a map-side explode"
    assert "partial_" in plan, "histogram must map-side combine"
    assert "InMemoryTableScan" in plan, "feature table / Gini frame must persist"


@check("decision_stump_apply: scalar-spine pass with the best split broadcast")
def _(qs, spark):
    plan = plan_of(qs["decision_stump_apply"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan) is None
    assert "BroadcastNestedLoopJoin" in plan, "1-row best-split frame must broadcast"
    assert "InMemoryTableScan" in plan, "feature table must persist (shared with train)"
    assert "partial_" in plan, "per-source rollup must map-side combine"


@check("ols_normal_equations: join-free single-pass moment aggregate")
def _(qs, spark):
    plan = plan_of(qs["ols_normal_equations"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # the whole fit is ONE aggregation over the persisted feature table;
    # the Cramer solve is scalar arithmetic on the 1-row result — no join
    # of any kind belongs in this plan
    assert re.search(r"\w*Join\w*", plan) is None, re.findall(r"\w*Join\w*", plan)
    assert "InMemoryTableScan" in plan, "feature table must persist"
    assert "partial_" in plan, "moment aggregate must map-side combine"


@check("gbdt_stump_boost: one bounded histogram shuffle per round, broadcast split state")
def _(qs, spark):
    plan = plan_of(qs["gbdt_stump_boost"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    # model state (base score + per-round 1-row split frames) is broadcast;
    # no relational join touches the corpus
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan) is None
    assert "BroadcastNestedLoopJoin" in plan
    assert "InMemoryTableScan" in plan, "feature table / histograms must persist"
    assert "partial_" in plan, "histogram must map-side combine"


@check("gbdt_gate_apply: scalar-spine ensemble pass, map-side source rollup")
def _(qs, spark):
    plan = plan_of(qs["gbdt_gate_apply"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", plan) is None
    assert "BroadcastNestedLoopJoin" in plan, "split frames must broadcast"
    assert "InMemoryTableScan" in plan, "feature table must persist (shared with train)"
    assert "partial_" in plan, "per-source rollup must map-side combine"


@check("isotonic_calibration_pav: one binning pass, minimax on the bounded bin frame")
def _(qs, spark):
    plan = plan_of(qs["isotonic_calibration_pav"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # corpus side: scalar-spine BNLJ (weights broadcast) + one map-side
    # combined bin rollup; the O(B^3) pair/extrema joins run on the
    # persisted <=16-row bin frame (range joins -> bounded BNLJ)
    assert "BroadcastNestedLoopJoin" in plan
    assert "InMemoryTableScan" in plan, "bin frame must persist"
    assert "partial_" in plan, "bin rollup must map-side combine"


def main() -> int:
    import __spark_entry__ as entry_mod
    from datapipeline_ops_spark.session import get_spark

    verbose = "-v" in sys.argv
    spark = get_spark("check-plans", cpus=4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    failed = 0
    for name, fn in CHECKS:
        try:
            fn(qs, spark)
            print(f"PLAN OK   {name}")
        except AssertionError as exc:
            failed += 1
            print(f"PLAN BAD  {name}: {exc}")
            if verbose:
                raise
        except Exception as exc:  # noqa: BLE001 — a query that cannot even
            # plan must not kill the remaining checks (round 2: one
            # AnalysisException hid 30 later assertions)
            failed += 1
            print(f"PLAN ERR  {name}: {type(exc).__name__}: {str(exc).splitlines()[0][:200]}")
            if verbose:
                raise
    print(f"{len(CHECKS) - failed} ok, {failed} bad")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
