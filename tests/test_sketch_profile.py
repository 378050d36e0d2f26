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
