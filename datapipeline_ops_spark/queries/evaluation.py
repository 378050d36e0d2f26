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
               -- all-zero masked gt => alpha undefined => NULL (a sum of
               -- squares is 0 iff every term is 0, so the guard is exact
               -- and order-independent in both engines)
               CASE WHEN list_sum(list_transform({_MASK_SQL}, i -> b[i] * b[i])) > 0
                    THEN list_sum(list_transform({_MASK_SQL}, i -> a[i] * b[i]))
                         / list_sum(list_transform({_MASK_SQL}, i -> b[i] * b[i]))
                    ELSE NULL END AS alpha
        FROM pairs
    ),
    si AS (
        SELECT m.pair_id, m.rmse, m.alpha,
               CASE WHEN m.alpha IS NULL THEN NULL ELSE
               sqrt(list_sum(list_transform({_MASK_SQL},
                    i -> (p.a[i] - m.alpha * p.b[i]) * (p.a[i] - m.alpha * p.b[i]))) / {_N_MASK}) END AS si_rmse
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
    # all-zero masked gt => alpha undefined => NULL (exact guard: a sum of
    # squares is 0 iff every term is 0); si_rmse inherits the NULL through
    # the arithmetic, matching the oracle's explicit CASE
    sbb = _sum_over_mask(lambda i: F.element_at(b, i) * F.element_at(b, i))
    alpha = F.when(
        sbb > 0,
        _sum_over_mask(lambda i: F.element_at(a, i) * F.element_at(b, i)) / sbb,
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
           -- all-zero masked side => angle undefined => NULL (exact guard:
           -- sum of squares is 0 iff every term is 0, both engines agree)
           CASE WHEN list_sum(list_transform({_MASK_SQL}, i -> a[i] * a[i])) > 0
                 AND list_sum(list_transform({_MASK_SQL}, i -> b[i] * b[i])) > 0
           THEN round(degrees(acos(least(1.0, greatest(-1.0,
               list_sum(list_transform({_MASK_SQL}, i -> a[i] * b[i]))
               / (sqrt(list_sum(list_transform({_MASK_SQL}, i -> a[i] * a[i])))
                  * sqrt(list_sum(list_transform({_MASK_SQL}, i -> b[i] * b[i])))))))), 6)
           ELSE NULL END AS angular_deg
    FROM pairs
    """,
)
def eval_angular_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Masked angular error in degrees (``angular_error.py:15-28``), cosine
    clipped to [-1, 1] exactly as the reference clips before acos."""
    p = _pairs(spark, sf_dir)
    a, b = F.col("a"), F.col("b")
    dot = _sum_over_mask(lambda i: F.element_at(a, i) * F.element_at(b, i))
    saa = _sum_over_mask(lambda i: F.element_at(a, i) ** 2)
    sbb = _sum_over_mask(lambda i: F.element_at(b, i) ** 2)
    cosang = F.least(
        F.lit(1.0), F.greatest(F.lit(-1.0), dot / (F.sqrt(saa) * F.sqrt(sbb)))
    )
    # all-zero masked side => angle undefined => NULL (exact guard, matches
    # the oracle's CASE; ANSI /0 otherwise — fuzzer, round 10)
    return p.select(
        "pair_id",
        F.when(
            (saa > 0) & (sbb > 0), F.round(F.degrees(F.acos(cosang)), 6)
        ).alias("angular_deg"),
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


# TonemapHDR (third_part/evaluation/tonemap.py:24 instantiates
# util.py:31-65 with gamma=2.4, percentile=50, max_mapping=0.5):
#   power = img ** (1/gamma)   (element-wise; non-positive -> 0)
#   r_p   = percentile_50 of the POSITIVE power elements
#           (fallback: percentile over all elements when none are positive)
#   alpha = max_mapping / (r_p + 1e-10);  tonemapped = alpha * power
# Pixels -> embedding elements, as in the rest of the eval suite. The
# median is computed by array_sort + midpoint interpolation (numpy's
# percentile-50) as pure array expressions — deterministic and identical
# in both engines, no engine quantile function involved.
_TM_GAMMA_INV = 1 / 2.4
_TM_MAX_MAPPING = 0.5
_TM_EPS = 1e-10


@query(
    "eval_tonemap",
    oracle=f"""
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
               FROM embeddings),
    pw AS (
        SELECT vec_id,
               list_transform(vec, x -> CASE WHEN x > 0 THEN pow(x, {_TM_GAMMA_INV!r})
                                             ELSE 0.0 END) AS power
        FROM v
    ),
    srt AS (SELECT vec_id, power, list_sort(list_filter(power, p -> p > 0)) AS s FROM pw),
    med AS (
        SELECT vec_id, power,
               CASE WHEN len(s) > 0
                    THEN (s[(len(s) + 1) // 2] + s[len(s) // 2 + 1]) / 2.0
                    ELSE 0.0 END AS p50
        FROM srt
    ),
    al AS (SELECT vec_id, power, {_TM_MAX_MAPPING} / (p50 + {_TM_EPS!r}) AS alpha FROM med)
    SELECT vec_id, round(alpha, 6) AS alpha,
           round(list_sum(list_transform(power, p -> alpha * p)) / {EMB_DIM}, 6) AS tone_mean,
           round(alpha * list_max(power), 6) AS tone_max
    FROM al
    """,
)
def eval_tonemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image percentile tonemap normalization (TonemapHDR,
    ``third_part/evaluation/tonemap.py:24``, ``util.py:31-65``): the one
    eval-suite stage with real dataflow semantics left unported in round 1.
    Entirely per-row array math — gamma power, positive-element median via
    sorted-array midpoint, alpha scale — so the 100 TB shape is a narrow
    scan with zero shuffles."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("vec")
    )
    power = F.transform(
        F.col("vec"),
        lambda x: F.when(x > 0, F.pow(x, F.lit(_TM_GAMMA_INV))).otherwise(F.lit(0.0)),
    )
    pw = e.select("vec_id", power.alias("power"))
    s = F.array_sort(F.filter(F.col("power"), lambda p: p > 0))
    n = F.size(s)
    p50 = F.when(
        n > 0,
        (
            F.element_at(s, ((n + 1) / F.lit(2)).cast("int"))
            + F.element_at(s, (n / F.lit(2) + 1).cast("int"))
        )
        / 2.0,
    ).otherwise(F.lit(0.0))
    # distinct internal name: naming this "alpha" would let the rounded
    # output alias `alpha` SHADOW the child column via Spark's lateral
    # column alias resolution, silently feeding the ROUNDED alpha into
    # tone_mean/tone_max (observed: last-digit mismatches vs the oracle)
    al = pw.withColumn("alpha_raw", F.lit(_TM_MAX_MAPPING) / (p50 + F.lit(_TM_EPS)))
    tone_mean = (
        F.aggregate(
            F.col("power"), F.lit(0.0), lambda acc, p: acc + F.col("alpha_raw") * p
        )
        / EMB_DIM
    )
    return al.select(
        "vec_id",
        F.round("alpha_raw", 6).alias("alpha"),
        F.round(tone_mean, 6).alias("tone_mean"),
        F.round(F.col("alpha_raw") * F.array_max("power"), 6).alias("tone_max"),
    )
