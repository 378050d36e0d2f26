"""Semantic tests for BM25, inverted index, and ANN recall evaluation."""

import math

import pyspark.sql.functions as F

from datapipeline_ops_spark.queries import QUERIES
from datapipeline_ops_spark.queries.search_rank import (
    BM25_B,
    BM25_K1,
    BM25_TERMS,
    BM25_TOPK,
    POSTINGS_K,
)
from datapipeline_ops_spark.tables import load_table


def q(name, spark, sf_dir):
    return QUERIES[name].fn(spark, sf_dir)


def test_bm25_topk_matches_python_recompute(spark, sf_dir):
    rows = q("bm25_topk", spark, sf_dir).collect()
    assert len(rows) == BM25_TOPK
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    toks = {d.doc_id: d.text.split() for d in docs}
    n = len(toks)
    avgdl = sum(len(w) for w in toks.values()) / n
    df = {
        t: sum(1 for w in toks.values() if t in w)
        for t in BM25_TERMS
    }
    for r in rows[:5]:
        words = toks[r.doc_id]
        expect = 0.0
        hits = 0
        for t in BM25_TERMS:
            tf = words.count(t)
            if tf == 0:
                continue
            hits += 1
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            expect += idf * tf * (BM25_K1 + 1.0) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * len(words) / avgdl)
            )
        assert r.n_terms_hit == hits
        assert abs(r.score - expect) < 1e-5, (r.doc_id, r.score, expect)


def test_inverted_index_postings_shape(spark, sf_dir):
    rows = q("inverted_index_postings", spark, sf_dir).collect()
    by_tok = {}
    for r in rows:
        by_tok.setdefault(r.token, []).append(r)
    for tok, rs in by_tok.items():
        rs.sort(key=lambda r: r.posting_rank)
        assert [r.posting_rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= POSTINGS_K
        # postings ordered by tf desc then doc_id asc
        keys = [(-r.tf, r.doc_id) for r in rs]
        assert keys == sorted(keys), (tok, keys)
        # df and total_tf constant per token, consistent with postings
        assert len({r.df for r in rs}) == 1 and len({r.total_tf for r in rs}) == 1
        assert rs[0].df >= len(rs)
        assert rs[0].total_tf >= sum(r.tf for r in rs)


def test_inverted_index_agrees_with_window_formulation(spark, sf_dir):
    out = q("inverted_index_postings", spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
    )
    tf = d.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    from pyspark.sql import Window

    w = Window.partitionBy("token").orderBy(F.desc("tf"), F.asc("doc_id"))
    ref = (
        tf.withColumn("posting_rank", F.row_number().over(w))
        .filter(F.col("posting_rank") <= POSTINGS_K)
        .select("token", "posting_rank", "doc_id", "tf")
    )
    got = {(r.token, r.posting_rank, r.doc_id, r.tf) for r in out.collect()}
    want = {(r.token, r.posting_rank, r.doc_id, r.tf) for r in ref.collect()}
    assert got == want


def test_ann_recall_bounds(spark, sf_dir):
    rows = q("ann_recall_eval", spark, sf_dir).collect()
    assert len(rows) == 10  # one per query vector
    mean = sum(r.recall for r in rows) / len(rows)
    for r in rows:
        assert 0.0 <= r.recall <= 1.0
        assert r.n_hits <= r.k == 5
        assert abs(r.mean_recall - mean) < 1e-12
    # IVF with 1 probe on clustered synthetic data: recall must beat random
    assert mean > 0.2


def test_ann_probe_recall_curve_monotone(spark, sf_dir):
    from datapipeline_ops_spark.queries.search_rank import ann_probe_recall_curve

    rows = sorted(ann_probe_recall_curve(spark, sf_dir).collect(), key=lambda r: r.nprobe)
    assert rows
    for r in rows:
        assert 0.0 <= r.min_recall <= r.mean_recall <= 1.0
        assert r.mean_candidates >= 0.0
    # probing more cells can only add candidates: recall and cost are both
    # monotone non-decreasing in nprobe
    for a, b in zip(rows, rows[1:]):
        assert a.mean_recall <= b.mean_recall + 1e-12
        assert a.mean_candidates <= b.mean_candidates + 1e-12


def test_ivf_cell_balance_accounting(spark, sf_dir):
    from datapipeline_ops_spark.queries.similarity import (
        IVF_CENTROIDS,
        ivf_cell_balance,
    )

    rows = ivf_cell_balance(spark, sf_dir).collect()
    n_cells = IVF_CENTROIDS[1] - IVF_CENTROIDS[0]
    assert len(rows) == n_cells  # empty cells surface as rows, never vanish
    assert abs(sum(r.cell_share for r in rows) - 1.0) < 1e-9
    hot = max(r.load_factor for r in rows)
    for r in rows:
        assert r.n_vectors >= 0
        assert abs(r.load_factor - r.cell_share * n_cells) < 1e-9
        assert abs(r.hot_factor - hot) < 1e-12
