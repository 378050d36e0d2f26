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
from pyspark.sql import DataFrame, SparkSession, Window

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


# ---------------------------------------------------------------------------
# int8_serving_parity — quantized-path retrieval parity gate
# ---------------------------------------------------------------------------

_PARITY_RECALL_PCT = 60  # per-query gate: int8 recall@k >= 0.60, integer test


def _int8_topk_sql() -> str:
    """DuckDB CTE chain: symmetric-int8 codes -> integer-dot cosine top-k.

    The quantized cosine uses ONLY quantized state: the per-vector scales
    cancel out of dot/(|a||b|), so the score is an exact-integer dot over an
    exact-integer sum-of-squares — sqrt and one division are the only float
    ops, identical in both engines.
    """
    from datapipeline_ops_spark.queries.similarity import N_QUERIES, TOP_K

    return f"""
    v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings
    ),
    s AS (
        SELECT vec_id, vec,
               list_max(list_transform(vec, x -> abs(x))) / 127.0 AS scale
        FROM v
    ),
    q AS (
        SELECT vec_id,
               list_transform(vec, x -> CAST(round(x / scale) AS BIGINT)) AS qv
        FROM s WHERE scale > 0
    ),
    qq AS (
        SELECT vec_id,
               CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS ssq,
               qv
        FROM q
    ),
    iscored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
               CAST(list_sum(list_transform(generate_series(1, len(a.qv)),
                        i -> a.qv[i] * b.qv[i])) AS DOUBLE)
                   / (sqrt(CAST(a.ssq AS DOUBLE)) * sqrt(CAST(b.ssq AS DOUBLE)))
                   AS icos
        FROM qq a JOIN qq b ON b.vec_id <> a.vec_id
        WHERE a.vec_id < {N_QUERIES}
    ),
    itop AS (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY icos DESC, vec_id) AS irank
        FROM iscored
        QUALIFY irank <= {TOP_K}
    )"""


@query("int8_serving_parity", oracle=None)  # composed below
def int8_serving_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized-serving parity gate: would swapping the float retrieval
    path for the 4x-cheaper symmetric-int8 path change what users see?
    The int8 index (codes + per-vector scale, exactly what
    ``embedding_int8_quant`` emits) serves cosine top-k where the scales
    CANCEL — score = int_dot / (sqrt(int_ssq_a) * sqrt(int_ssq_b)) is
    integer arithmetic up to one sqrt/divide — and every query's int8
    top-k is scored against the exact float path
    (:func:`...similarity.cosine_topk_bruteforce`) on recall@k, gated in
    integer space (n_hits*100 >= {_PARITY_RECALL_PCT}*k) and rolled into
    the all-pass verdict a rollout blocks on.

    Scale shape: quantization is a map-only pass (zero shuffles); the
    query batch is constant-size and broadcast, so the corpus is scanned
    once for the int8 scores; both top-k tables are (queries x k) rows and
    the gate rollup is constant-size. Composes the same way at 100 TB with
    the brute-force truth run on a sampled query set."""
    from datapipeline_ops_spark.core.registry import QUERIES
    from datapipeline_ops_spark.queries.similarity import N_QUERIES, TOP_K

    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("vec")
    )
    s = v.select(
        "vec_id",
        "vec",
        (F.array_max(F.transform("vec", lambda x: F.abs(x))) / F.lit(_QBITS_MAX)).alias(
            "s_raw"
        ),
    ).filter(F.col("s_raw") > 0)
    qq = s.select(
        "vec_id",
        F.transform("vec", lambda x: F.round(x / F.col("s_raw"), 0).cast("long")).alias(
            "qv"
        ),
    ).select(
        "vec_id",
        "qv",
        F.aggregate(
            F.transform("qv", lambda x: x * x),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("ssq"),
    )
    qbatch = qq.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("qqv"),
        F.col("ssq").alias("qssq"),
    )
    idot = F.aggregate(
        F.zip_with("qqv", "qv", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    iscored = (
        qq.join(F.broadcast(qbatch), F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "icos",
            idot.cast("double")
            / (F.sqrt(F.col("qssq").cast("double")) * F.sqrt(F.col("ssq").cast("double"))),
        )
    )
    iw = Window.partitionBy("query_id").orderBy(F.desc("icos"), F.asc("vec_id"))
    itop = (
        iscored.withColumn("irank", F.row_number().over(iw))
        .filter(F.col("irank") <= TOP_K)
        .select("query_id", "vec_id")
    )
    truth = QUERIES["cosine_topk_bruteforce"].fn(spark, sf_dir).select(
        "query_id", "vec_id", F.lit(1).alias("hit")
    )
    g = (
        itop.join(truth, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_hits"),
            F.count(F.lit(1)).cast("long").alias("k"),
        )
    )
    scored = g.select(
        "query_id",
        "n_hits",
        "k",
        (F.col("n_hits").cast("double") / F.col("k").cast("double")).alias("recall"),
        (F.col("n_hits") * 100 >= F.lit(_PARITY_RECALL_PCT) * F.col("k")).alias(
            "passed"
        ),
    )
    w = Window.partitionBy()
    return scored.select(
        "query_id",
        "n_hits",
        "k",
        "recall",
        "passed",
        F.sum(F.col("passed").cast("long")).over(w).alias("n_pass"),
        F.count(F.lit(1)).over(w).alias("n_queries"),
        F.min(F.col("passed").cast("int")).over(w).cast("boolean").alias("parity_ok"),
    )


def _int8_serving_parity_oracle() -> str:
    from datapipeline_ops_spark.core.registry import QUERIES

    gt_sql = QUERIES["cosine_topk_bruteforce"].oracle
    return f"""
    WITH {_int8_topk_sql()},
    gt AS MATERIALIZED (SELECT query_id, vec_id FROM ({gt_sql})),
    g AS (
        SELECT itop.query_id,
               CAST(sum(CASE WHEN gt.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hits,
               count(*) AS k
        FROM itop LEFT JOIN gt
          ON gt.query_id = itop.query_id AND gt.vec_id = itop.vec_id
        GROUP BY itop.query_id
    ),
    scored AS (
        SELECT query_id, n_hits, k,
               CAST(n_hits AS DOUBLE) / CAST(k AS DOUBLE) AS recall,
               n_hits * 100 >= {_PARITY_RECALL_PCT} * k AS passed
        FROM g
    )
    SELECT query_id, n_hits, k, recall, passed,
           CAST(sum(CASE WHEN passed THEN 1 ELSE 0 END) OVER () AS BIGINT)
               AS n_pass,
           count(*) OVER () AS n_queries,
           CAST(min(CASE WHEN passed THEN 1 ELSE 0 END) OVER () AS BOOLEAN)
               AS parity_ok
    FROM scored
    """


from datapipeline_ops_spark.core.registry import QUERIES as _Q

_Q["int8_serving_parity"].oracle = _int8_serving_parity_oracle()
