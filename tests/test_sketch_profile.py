"""Semantic tests for heavy-hitter sketch+verify and the correlation matrix."""

import math

import pyspark.sql.functions as F

from datapipeline_ops_spark.queries import QUERIES
from datapipeline_ops_spark.queries.sampling_sketch import HH_K
from datapipeline_ops_spark.tables import load_table


def q(name, spark, sf_dir):
    return QUERIES[name].fn(spark, sf_dir)


def test_heavy_hitters_match_exact_topk(spark, sf_dir):
    rows = q("heavy_hitters_verified", spark, sf_dir).collect()
    assert len(rows) == HH_K
    exact = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(HH_K)
        .collect()
    )
    assert [(r.token, r.cnt) for r in rows] == [(r.token, r.cnt) for r in exact]


def test_correlation_matrix_matches_spark_corr(spark, sf_dir):
    rows = q("column_correlation_matrix", spark, sf_dir).collect()
    assert len(rows) == 6
    li = load_table(spark, sf_dir, "lineitem")
    for r in rows:
        assert -1.0 <= r.corr <= 1.0
        ref = li.agg(F.corr(r.col_x, r.col_y)).collect()[0][0]
        assert math.isclose(r.corr, ref, rel_tol=1e-9, abs_tol=1e-9), (
            r.col_x, r.col_y, r.corr, ref,
        )


def test_entropy_by_source_bounds(spark, sf_dir):
    rows = q("entropy_by_source", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_distinct >= 1 and r.n_tokens >= r.n_distinct
        assert 0.0 <= r.entropy <= __import__("math").log(r.n_distinct) + 1e-9
        assert 0.0 <= r.entropy_norm <= 1.0 + 1e-9


def test_jsd_sources_bounds_and_zero_case(spark, sf_dir):
    import math

    rows = q("js_divergence_sources", spark, sf_dir).collect()
    assert rows
    for r in rows:
        # JSD in [0, ln 2]; normalized in [0, 1]
        assert -1e-12 <= r.jsd <= math.log(2.0) + 1e-12
        assert abs(r.jsd_norm - r.jsd / math.log(2.0)) < 1e-12
    # sources drawn from the same generator: none should be a hard outlier
    assert max(r.jsd_norm for r in rows) < 0.5


def test_embedding_centroid_drift_iid_halves_agree(spark, sf_dir):
    rows = q("embedding_centroid_drift", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_a > 0 and r.n_b > 0
        assert -1.0 <= r.centroid_cos <= 1.0
    # this corpus's labels are geometrically unstructured: half-centroids
    # are noise residues, so |cos| must hover near 0 — far from either pole
    assert all(abs(r.centroid_cos) < 0.5 for r in rows)


def test_gini_by_source_bounds_and_recompute(spark, sf_dir):
    rows = q("gini_by_source", spark, sf_dir).collect()
    assert rows
    docs = load_table(spark, sf_dir, "documents").select("source", "doc_id", "text").collect()
    by_src = {}
    for d in docs:
        by_src.setdefault(d.source, []).append((len(d.text.split()), d.doc_id))
    for r in rows:
        assert 0.0 <= r.gini < 1.0
        xs = sorted(by_src[r.source])
        n = len(xs)
        sx = sum(x for x, _ in xs)
        g = 2.0 * sum((i + 1) * x for i, (x, _) in enumerate(xs)) / (n * sx) - (n + 1.0) / n
        assert abs(r.gini - g) < 1e-9, (r.source, r.gini, g)
        assert r.n_docs == n and r.total_words == sx
