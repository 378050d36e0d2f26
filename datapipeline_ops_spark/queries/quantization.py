"""Embedding quantization: int8 scalar quantization with a reconstruction
audit, and a quantized-vs-float retrieval agreement gate.

Training-data-pipeline motivation: at 100 TB an `array<float>` embedding
column dominates storage and shuffle width. Symmetric int8 scalar
quantization (per-vector scale = max|x|/127) cuts the payload 4x with, for
typical distributions, ~1% reconstruction error — the standard first step
before IVF/PQ indexing. Everything here is JVM-side array arithmetic
(`transform`/`zip_with`/`aggregate`, whole-stage codegen, no Python), in
element order so values are bit-identical to the DuckDB mirrors.

The reference has no vector ops at all (its similarity is an injected GPU
matcher, ``common/transform/similarity_op.py:7-24``); this extends the
engine's beyond-reference ANN surface (queries/similarity.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.functions.vectors import as_double
from datapipeline_ops_spark.tables import load_table

_QBITS_MAX = 127.0  # symmetric int8: q in [-127, 127]


@query(
    "embedding_int8_quant",
    oracle="""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings
    ),
    s AS (
        SELECT vec_id, vec,
               list_max(list_transform(vec, x -> abs(x))) / 127.0 AS scale
        FROM v
    ),
    q AS (
        SELECT vec_id, vec, scale,
               list_transform(vec, x -> CAST(round(x / scale) AS INTEGER)) AS qv
        FROM s WHERE scale > 0
    )
    SELECT vec_id,
           CAST(len(vec) AS INTEGER) AS n_dims,
           round(scale, 6) AS scale,
           round(sqrt(list_sum(list_transform(generate_series(1, len(vec)),
                         i -> (vec[i] - qv[i] * scale) * (vec[i] - qv[i] * scale))))
                 / sqrt(list_sum(list_transform(vec, x -> x * x))), 6) AS rel_err,
           CAST(list_max(list_transform(qv, x -> abs(x))) AS INTEGER) AS max_q
    FROM q
    """,
)
def embedding_int8_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization audit: per vector, the scale
    (max|x|/127), the L2 reconstruction error relative to the vector's own
    norm, and the max quantized magnitude (must be <= 127 by construction —
    the oracle value-match proves the codes are in range).

    Pure per-row array arithmetic — zero shuffles; at 100 TB this runs as a
    map-only pass over the embedding column, and the emitted (scale, codes)
    pair is what an IVF/PQ index would actually store. The quantize ->
    reconstruct -> error trip is mirrored expression-for-expression in the
    DuckDB oracle (same IEEE ops in element order)."""
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("vec")
    )
    # internal name `s_raw` deliberately differs from the output alias
    # `scale`: Spark's lateral-column-alias resolution would otherwise bind
    # same-select references to the ROUNDED output column, silently
    # quantizing with the 6-decimal scale (caught by the oracle gate)
    scale = (
        F.array_max(F.transform("vec", lambda x: F.abs(x))) / F.lit(_QBITS_MAX)
    ).alias("s_raw")
    s = v.select("vec_id", "vec", scale).filter(F.col("s_raw") > 0)
    q = s.withColumn(
        "qv",
        F.transform("vec", lambda x: F.round(x / F.col("s_raw"), 0).cast("int")),
    )
    sq_err = F.aggregate(
        F.zip_with(
            "vec",
            "qv",
            lambda a, b: (a - b * F.col("s_raw")) * (a - b * F.col("s_raw")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sq_norm = F.aggregate(
        F.transform("vec", lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    )
    return q.select(
        "vec_id",
        F.size("vec").alias("n_dims"),
        F.round("s_raw", 6).alias("scale"),
        F.round(F.sqrt(sq_err) / F.sqrt(sq_norm), 6).alias("rel_err"),
        F.array_max(F.transform("qv", lambda x: F.abs(x))).alias("max_q"),
    )


# ---------------------------------------------------------------------------
# class_weight_plan — inverse-frequency balanced class weights
# ---------------------------------------------------------------------------


@query(
    "class_weight_plan",
    oracle="""
    WITH c AS MATERIALIZED (
        SELECT label, CAST(count(*) AS BIGINT) AS n
        FROM embeddings GROUP BY label
    ),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS total,
                 CAST(count(*) AS BIGINT) AS k FROM c)
    SELECT c.label, c.n AS n_examples,
           round(CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE), 6)
               AS class_share,
           round(CAST(t.total AS DOUBLE)
                 / (CAST(t.k AS DOUBLE) * CAST(c.n AS DOUBLE)), 6)
               AS balanced_weight
    FROM c, t
    """,
)
def class_weight_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced class weights for the embedding labels:
    ``w_c = N / (K * n_c)`` (scikit-learn's 'balanced' heuristic — the
    weight vector a trainer loads to counter label skew) plus each class's
    share. Integer counts; two identical float expressions.

    Scale: one scan, one |labels|-row aggregate, one 1-row broadcast."""
    c = (
        load_table(spark, sf_dir, "embeddings")
        .groupBy("label")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    from datapipeline_ops_spark.operators.dedup import persist_barrier

    c = persist_barrier(c, f"class_weights:{sf_dir}")
    t = c.agg(
        F.sum("n").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    return c.join(F.broadcast(t)).select(
        "label",
        F.col("n").alias("n_examples"),
        F.round(F.col("n").cast("double") / F.col("total").cast("double"), 6).alias(
            "class_share"
        ),
        F.round(
            F.col("total").cast("double")
            / (F.col("k").cast("double") * F.col("n").cast("double")),
            6,
        ).alias("balanced_weight"),
    )
