"""Round-6 additions: basket-size cap on co-purchase pair generation and
other scale guards.

Correctness vs the DuckDB oracle runs in tools/check_correctness.py; these
tests pin the semantic invariants that a value-hash alone wouldn't explain
if it broke."""

import pyspark.sql.functions as F

from datapipeline_ops_spark.queries import QUERIES


def test_copurchase_edges_drop_wide_baskets(spark):
    from datapipeline_ops_spark.queries.graph_queries import (
        COPURCHASE_MIN_ORDERS,
        TRIANGLE_MAX_BASKET,
        copurchase_edges,
    )

    wide = TRIANGLE_MAX_BASKET + 16
    rows = []
    # two identical bot-wide baskets: every pair would clear the support
    # floor, so only the width cap can exclude them
    for orderkey in (1, 2):
        rows += [(orderkey, 10_000 + i) for i in range(wide)]
    # two identical normal baskets: pairs must survive
    for orderkey in (3, 4):
        rows += [(orderkey, 20_000 + i) for i in range(3)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    edges = copurchase_edges(li).collect()
    parts = {e["pa"] for e in edges} | {e["pb"] for e in edges}
    assert all(p >= 20_000 for p in parts), "wide-basket pairs leaked past the cap"
    # 3 items -> 3 pairs, each seen in 2 orders >= the support floor
    assert len(edges) == 3 and COPURCHASE_MIN_ORDERS <= 2


def test_triangle_stats_unchanged_by_cap(spark, sf_dir):
    # TPC-H baskets are <= 7 items: the cap must be a no-op on this schema
    from datapipeline_ops_spark.tables import load_table

    widest = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    from datapipeline_ops_spark.queries.graph_queries import TRIANGLE_MAX_BASKET

    assert widest <= TRIANGLE_MAX_BASKET
    r = QUERIES["triangle_copurchase_stats"].fn(spark, sf_dir).first()
    assert 0 <= r["clustering_coeff"] <= 1


def test_bigram_lm_perplexity_invariants(spark, sf_dir):
    import pyspark.sql.functions as F2

    from datapipeline_ops_spark.functions.text import tokens
    from datapipeline_ops_spark.tables import load_table

    out = QUERIES["bigram_lm_perplexity"].fn(spark, sf_dir)
    rows = out.collect()
    assert rows
    for r in rows:
        assert r["ppl"] > 0 and r["xent"] > 0
        assert r["high_ppl"] == (r["ppl"] > 30.0)
    # every doc contributes exactly len(tokens)-1 bigram instances
    ref = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", (F2.size(tokens(F2.col("text"))) - 1).alias("m1"))
        .collect()
    )
    m1 = {r["doc_id"]: r["m1"] for r in ref}
    for r in rows:
        assert r["n_bigrams"] == m1[r["doc_id"]]


def test_bpe_merge_step_rank_order(spark, sf_dir):
    rows = QUERIES["bpe_merge_step"].fn(spark, sf_dir).orderBy("rank").collect()
    assert len(rows) == 20
    freqs = [r["freq"] for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    assert all(len(r["pair"]) == 2 for r in rows)


def test_quality_classifier_score_gate_consistency(spark, sf_dir):
    rows = QUERIES["quality_classifier_score"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["score"] < 1.0
        assert r["passes"] == (r["score"] >= 0.5)
    # the gate must discriminate, not rubber-stamp
    n_pass = sum(r["passes"] for r in rows)
    assert 0 < n_pass < len(rows)


def test_dataset_card_total_row_consistent(spark, sf_dir):
    rows = QUERIES["dataset_card_report"].fn(spark, sf_dir).collect()
    per_source = [r for r in rows if r["source"] != "TOTAL"]
    total = [r for r in rows if r["source"] == "TOTAL"]
    assert len(total) == 1
    assert total[0]["n_docs"] == sum(r["n_docs"] for r in per_source)
    assert total[0]["total_tokens"] == sum(r["total_tokens"] for r in per_source)


def test_train_test_split_has_no_leaks(spark, sf_dir):
    rows = QUERIES["train_test_split_leakfree"].fn(spark, sf_dir).collect()
    assert {r["split"] for r in rows} == {"train", "test"}
    assert all(r["leaked_clusters"] == 0 for r in rows)


def test_hll_register_sketch_within_tolerance(spark, sf_dir):
    r = QUERIES["hll_register_sketch"].fn(spark, sf_dir).first()
    assert r["m"] == 64
    assert r["within_tol"] is True
    assert r["hll_estimate"] > 0


def test_weighted_sample_aes_k_per_source(spark, sf_dir):
    import collections

    rows = QUERIES["weighted_sample_aes"].fn(spark, sf_dir).collect()
    per = collections.Counter(r["source"] for r in rows)
    assert all(v <= 3 for v in per.values())
    assert all(1 <= r["rank"] <= 3 and r["es_key"] < 0 for r in rows)


def test_audio_silence_segments_bounds(spark, sf_dir):
    rows = QUERIES["audio_silence_segments"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_silent"] <= r["n_samples"]
        assert r["longest_run"] <= r["n_silent"]
        # can't have more min-3 segments than silent samples allow
        assert r["n_segments"] * 3 <= r["n_silent"] or r["n_segments"] == 0


def test_sequence_packing_prefix_sum_exact(spark, sf_dir):
    rows = (
        QUERIES["sequence_packing_plan"].fn(spark, sf_dir)
        .orderBy("doc_id")
        .collect()
    )
    cum = 0
    for r in rows:
        assert r["cum_before"] == cum, "prefix sum must be exact and gapless"
        assert r["seq_id"] == cum // 512
        assert r["offset_in_seq"] == cum % 512
        assert r["n_seqs_spanned"] >= 1
        assert r["spans_boundary"] == (r["offset_in_seq"] + r["n_tok"] > 512)
        cum += r["n_tok"]


def test_boilerplate_line_removal_bounds(spark, sf_dir):
    rows = QUERIES["boilerplate_line_removal"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_boiler"] <= r["n_lines"]
        assert 0.0 <= r["kept_ratio"] <= 1.0


def test_mrl_truncation_eval_shape(spark, sf_dir):
    rows = QUERIES["mrl_truncation_eval"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    mr = rows[0]["mean_recall"]
    for r in rows:
        assert 0.0 <= r["recall"] <= 1.0 and r["k"] == 5
        assert abs(r["mean_recall"] - mr) < 1e-12


def test_video_scene_cut_scene_count(spark, sf_dir):
    rows = QUERIES["video_scene_cut_detect"].fn(spark, sf_dir).collect()
    assert rows
    saw_cut = False
    for r in rows:
        assert r["n_scenes"] == r["n_cuts"] + 1
        assert r["n_cuts"] <= r["n_frames"] - 1 or r["n_frames"] == 1
        saw_cut = saw_cut or r["n_cuts"] > 0
    assert saw_cut, "threshold must actually fire on this corpus"
