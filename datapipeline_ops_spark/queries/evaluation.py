"""Quantitative evaluation metrics — the reference's vendored eval suite
(``third_part/evaluation/fast_rmse.py:17-97``: RMSE, scale-invariant RMSE,
angular error over alpha-masked pixels, aggregated as dataset means at
``:125-170``) re-expressed over vector pairs.

Pixels → embedding elements, alpha mask → positional mask (every element
whose index is not divisible by 4, analog of the sphere alpha mask); each
metric is pure `zip_with`/`aggregate` array math with left-to-right double
accumulation, so DuckDB reproduces values bit-for-bit before rounding.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.functions.vectors import as_double
from datapipeline_ops_spark.tables import load_table

EMB_DIM = 64

# masked element indices: i in 1..64 (1-based) with (i-1) % 4 != 0
_MASK_SQL = f"list_filter(generate_series(1, {EMB_DIM}), i -> (i - 1) % 4 <> 0)"


def _mask_idx() -> Column:
    return F.filter(
        F.sequence(F.lit(1), F.lit(EMB_DIM)), lambda i: ((i - 1) % 4) != 0
    )


def _sum_over_mask(expr) -> Column:
    """Sum f(i) over masked 1-based indices, left-to-right."""
    return F.aggregate(_mask_idx(), F.lit(0.0), lambda acc, i: acc + expr(i))


def _pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(pair_id, a, b): consecutive-vector pairs — prediction vs ground
    truth stand-ins (even vec_id = pred, odd = gt)."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    a = e.filter(F.col("vec_id") % 2 == 0).select(
        (F.col("vec_id") / 2).cast("long").alias("pair_id"), F.col("v").alias("a")
    )
    b = e.filter(F.col("vec_id") % 2 == 1).select(
        ((F.col("vec_id") - 1) / 2).cast("long").alias("pair_id"), F.col("v").alias("b")
    )
    return a.join(b, "pair_id")


_PAIRS_CTE = """
    v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
    pairs AS (
        SELECT CAST(a.vec_id / 2 AS BIGINT) AS pair_id, a.v AS a, b.v AS b
        FROM v a JOIN v b ON b.vec_id = a.vec_id + 1
        WHERE a.vec_id % 2 = 0
    )
"""

_N_MASK = EMB_DIM * 3 // 4  # 48 masked elements


@query(
    "eval_rmse_report",
    oracle=f"""
    WITH {_PAIRS_CTE},
    metrics AS (
        SELECT pair_id,
               sqrt(list_sum(list_transform({_MASK_SQL}, i -> (a[i] - b[i]) * (a[i] - b[i]))) / {_N_MASK}) AS rmse,
               list_sum(list_transform({_MASK_SQL}, i -> a[i] * b[i]))
                 / list_sum(list_transform({_MASK_SQL}, i -> b[i] * b[i])) AS alpha
        FROM pairs
    ),
    si AS (
        SELECT m.pair_id, m.rmse, m.alpha,
               sqrt(list_sum(list_transform({_MASK_SQL},
                    i -> (p.a[i] - m.alpha * p.b[i]) * (p.a[i] - m.alpha * p.b[i]))) / {_N_MASK}) AS si_rmse
        FROM metrics m JOIN pairs p ON p.pair_id = m.pair_id
    )
    SELECT pair_id, round(rmse, 6) AS rmse, round(si_rmse, 6) AS si_rmse,
           round(alpha, 6) AS alpha
    FROM si
    """,
)
def eval_rmse_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pair RMSE + scale-invariant RMSE (optimal alpha = Σab/Σbb over
    the mask, ``fast_rmse.py:39-79``) — masked array math, no UDF."""
    p = _pairs(spark, sf_dir)
    a, b = F.col("a"), F.col("b")
    rmse = F.sqrt(
        _sum_over_mask(lambda i: (F.element_at(a, i) - F.element_at(b, i)) ** 2) / _N_MASK
    )
    alpha = _sum_over_mask(lambda i: F.element_at(a, i) * F.element_at(b, i)) / _sum_over_mask(
        lambda i: F.element_at(b, i) * F.element_at(b, i)
    )
    with_alpha = p.withColumn("rmse", rmse).withColumn("alpha", alpha)
    si = F.sqrt(
        _sum_over_mask(
            lambda i: (F.element_at(a, i) - F.col("alpha") * F.element_at(b, i)) ** 2
        )
        / _N_MASK
    )
    return with_alpha.select(
        "pair_id",
        F.round("rmse", 6).alias("rmse"),
        F.round(si, 6).alias("si_rmse"),
        F.round("alpha", 6).alias("alpha"),
    )


@query(
    "eval_angular_error",
    oracle=f"""
    WITH {_PAIRS_CTE}
    SELECT pair_id,
           round(degrees(acos(least(1.0, greatest(-1.0,
               list_sum(list_transform({_MASK_SQL}, i -> a[i] * b[i]))
               / (sqrt(list_sum(list_transform({_MASK_SQL}, i -> a[i] * a[i])))
                  * sqrt(list_sum(list_transform({_MASK_SQL}, i -> b[i] * b[i])))))))), 6)
               AS angular_deg
    FROM pairs
    """,
)
def eval_angular_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Masked angular error in degrees (``angular_error.py:15-28``), cosine
    clipped to [-1, 1] exactly as the reference clips before acos."""
    p = _pairs(spark, sf_dir)
    a, b = F.col("a"), F.col("b")
    dot = _sum_over_mask(lambda i: F.element_at(a, i) * F.element_at(b, i))
    na = F.sqrt(_sum_over_mask(lambda i: F.element_at(a, i) ** 2))
    nb = F.sqrt(_sum_over_mask(lambda i: F.element_at(b, i) ** 2))
    cosang = F.least(F.lit(1.0), F.greatest(F.lit(-1.0), dot / (na * nb)))
    return p.select(
        "pair_id", F.round(F.degrees(F.acos(cosang)), 6).alias("angular_deg")
    )


@query(
    "eval_dataset_means",
    oracle=f"""
    WITH {_PAIRS_CTE},
    per AS (
        SELECT pair_id,
               sqrt(list_sum(list_transform({_MASK_SQL}, i -> (a[i] - b[i]) * (a[i] - b[i]))) / {_N_MASK}) AS rmse
        FROM pairs
    )
    SELECT count(*) AS n_pairs, round(avg(rmse), 6) AS mean_rmse,
           round(min(rmse), 6) AS min_rmse, round(max(rmse), 6) AS max_rmse
    FROM per
    """,
)
def eval_dataset_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-level metric rollup (``fast_rmse.py:125-170`` aggregates
    per-image metrics into means) — one partial-agg shuffle."""
    p = _pairs(spark, sf_dir)
    a, b = F.col("a"), F.col("b")
    rmse = F.sqrt(
        _sum_over_mask(lambda i: (F.element_at(a, i) - F.element_at(b, i)) ** 2) / _N_MASK
    )
    per = p.select(rmse.alias("rmse"))
    return per.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg("rmse"), 6).alias("mean_rmse"),
        F.round(F.min("rmse"), 6).alias("min_rmse"),
        F.round(F.max("rmse"), 6).alias("max_rmse"),
    )
