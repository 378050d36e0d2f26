"""Embedding-space decomposition diagnostics: dimension covariance /
correlation structure and Johnson–Lindenstrauss random projection.

Beyond-reference surface (the reference — a Ray video/image pipeline —
carries embeddings only as opaque model outputs, e.g. ``common/transform/
similarity_op.py:7-24``; it has no corpus-level embedding analytics).
These are the linear-algebra diagnostics a training-data pipeline runs
before trusting embedding-based dedup/retrieval at scale:

- **dimension covariance + correlation** (`embedding_pca_covariance`) —
  the d x d second-moment structure, the input to PCA / whitening and the
  "are half my dimensions dead?" check. Computed movement-free for the
  corpus: each row emits its upper-triangle products, partial aggregation
  reduces every partition to <= d(d+1)/2 rows BEFORE the shuffle, so the
  exchange carries O(d^2) rows per partition regardless of corpus size —
  the map-side-combine shape of distributed Gram-matrix computation.
- **JL random projection** (`jl_random_projection`) — project every
  embedding onto K deterministic +-1/sqrt(K) hyperplanes (the database-
  friendly Achlioptas form). A pure per-row expression: ZERO shuffles,
  zero UDFs; the projection matrix is md5-derived at plan-build time so
  both engines use the same literal matrix, and per-row left-to-right
  accumulation makes the outputs bit-identical across engines. This is
  the cheap front-end that shrinks 100 TB of wide vectors before any
  pairwise work.

Like `functions/vectors.py`, all arithmetic is double, element-order
accumulation; corpus-level sums are true float aggregations (partition
order differs across engines) and ship raw — the gate hasher normalizes
both sides to 6 significant figures.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.functions.vectors import as_double, dot, sql_as_double, sql_dot
from datapipeline_ops_spark.tables import load_table

EMB_DIM = 64  # embeddings.embedding is array<float>[64] (TESTDATA.md)
JL_K = 8      # projection target dimensionality


# ---------------------------------------------------------------------------
# Dimension covariance / correlation
# ---------------------------------------------------------------------------


@query(
    "embedding_pca_covariance",
    oracle=f"""
    WITH v AS MATERIALIZED (
        SELECT {sql_as_double("embedding")} AS vec FROM embeddings
    ),
    st AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM v),
    ex AS (
        SELECT g.i AS i, vec[g.i] AS x
        FROM v, unnest(generate_series(1, {EMB_DIM})) AS g(i)
    ),
    mu AS MATERIALIZED (
        SELECT i, sum(x) / (SELECT nd FROM st) AS m FROM ex GROUP BY i
    ),
    sp AS (
        SELECT gi.i AS i, gj.j AS j, sum(vec[gi.i] * vec[gj.j]) AS sp
        FROM v,
             unnest(generate_series(1, {EMB_DIM})) AS gi(i),
             unnest(generate_series(1, {EMB_DIM})) AS gj(j)
        WHERE gj.j >= gi.i
        GROUP BY gi.i, gj.j
    ),
    cov AS MATERIALIZED (
        SELECT sp.i, sp.j, sp.sp / (SELECT nd FROM st) - mi.m * mj.m AS cov
        FROM sp JOIN mu mi ON sp.i = mi.i JOIN mu mj ON sp.j = mj.i
    ),
    var AS MATERIALIZED (SELECT i, cov AS v FROM cov WHERE i = j)
    SELECT CAST(c.i AS INT) AS dim_i, CAST(c.j AS INT) AS dim_j,
           c.cov AS cov, c.cov / sqrt(vi.v * vj.v) AS corr
    FROM cov c JOIN var vi ON c.i = vi.i JOIN var vj ON c.j = vj.i
    """,
)
def embedding_pca_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle covariance AND correlation of the {EMB_DIM} embedding
    dimensions — the population Gram/covariance structure PCA and whitening
    start from, and the diagnostic that finds dead (zero-variance) or
    redundant (|corr| ~ 1) dimensions before they waste index space.

    Scale shape: each row flat-maps to its d(d+1)/2 upper-triangle products
    and hash aggregation PARTIALLY combines them inside the partition, so
    the one exchange moves at most d(d+1)/2 = {EMB_DIM * (EMB_DIM + 1) // 2}
    rows per upstream partition — independent of corpus size (the classic
    map-side-combined Gram matrix). Means and variances are {EMB_DIM}- and
    2080-row frames joined back broadcast. No vector ever shuffles; no
    driver-side math. Covariance/correlation are true float aggregations
    (partition accumulation order differs across engines) so they ship raw
    per the repo convention."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select(as_double(F.col("embedding")).alias("vec"))
    nd = F.col("nd")

    # per-dimension mean (d rows)
    ex = v.select(F.posexplode("vec").alias("i0", "x")).select(
        (F.col("i0") + 1).alias("i"), "x"
    )
    stats = v.agg(F.count(F.lit(1)).cast("double").alias("nd"))
    mu = (
        ex.crossJoin(F.broadcast(stats))
        .groupBy("i")
        .agg((F.sum("x") / F.any_value(nd)).alias("m"))
    )

    # upper-triangle cross products: flat-map then partial-aggregated sum
    idx = F.sequence(F.lit(1), F.lit(EMB_DIM))
    vec = F.col("vec")
    tri = F.flatten(
        F.transform(
            idx,
            lambda i: F.transform(
                F.sequence(i, F.lit(EMB_DIM)),
                lambda j: F.struct(
                    i.alias("i"),
                    j.alias("j"),
                    (F.element_at(vec, i) * F.element_at(vec, j)).alias("p"),
                ),
            ),
        )
    )
    sp = (
        v.select(F.explode(tri).alias("t"))
        .select("t.i", "t.j", "t.p")
        .groupBy("i", "j")
        .agg(F.sum("p").alias("sp"))
    )

    cov = (
        sp.crossJoin(F.broadcast(stats))
        .join(F.broadcast(mu.select(F.col("i"), F.col("m").alias("mi"))), "i")
        .join(
            F.broadcast(mu.select(F.col("i").alias("j"), F.col("m").alias("mj"))),
            "j",
        )
        .select("i", "j", (F.col("sp") / nd - F.col("mi") * F.col("mj")).alias("cov"))
    )
    var = cov.filter(F.col("i") == F.col("j")).select(
        F.col("i").alias("vi"), F.col("cov").alias("v")
    )
    return (
        cov.join(F.broadcast(var), cov["i"] == var["vi"])
        .drop("vi")
        .withColumnRenamed("v", "v_i")
        .join(F.broadcast(var), cov["j"] == var["vi"])
        .drop("vi")
        .select(
            F.col("i").cast("int").alias("dim_i"),
            F.col("j").cast("int").alias("dim_j"),
            "cov",
            (F.col("cov") / F.sqrt(F.col("v_i") * F.col("v"))).alias("corr"),
        )
    )


# ---------------------------------------------------------------------------
# Johnson–Lindenstrauss random projection
# ---------------------------------------------------------------------------


def _jl_sign(j: int, i: int) -> float:
    """Deterministic +-1 from md5 — computed once at plan-build time and
    embedded as a literal matrix in BOTH engines (same convention as
    functions/hashing.py: md5-derived, never engine-native hash)."""
    h = int(hashlib.md5(f"rp_{j}_{i}".encode()).hexdigest()[:15], 16)
    return 1.0 if h % 2 == 0 else -1.0


_JL_ROWS = [[_jl_sign(j, i) for i in range(1, EMB_DIM + 1)] for j in range(1, JL_K + 1)]
_JL_SCALE = f"sqrt(CAST({JL_K} AS DOUBLE))"


def _jl_sql_row(j: int) -> str:
    lits = ", ".join(f"{s:.1f}" for s in _JL_ROWS[j - 1])
    return f"({sql_dot('vec', f'[{lits}]')} / {_JL_SCALE})"


@query(
    "jl_random_projection",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, {sql_as_double("embedding")} AS vec FROM embeddings
    ),
    p AS (
        SELECT vec_id,
               {", ".join(f"{_jl_sql_row(j)} AS p{j}" for j in range(1, JL_K + 1))},
               {sql_dot("vec", "vec")} AS sq
        FROM v
    )
    SELECT vec_id, {", ".join(f"p{j}" for j in range(1, JL_K + 1))},
           ({" + ".join(f"p{j} * p{j}" for j in range(1, JL_K + 1))}) / sq
               AS norm_ratio
    FROM p
    """,
)
def jl_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss sketch: project each {EMB_DIM}-dim embedding
    onto {JL_K} fixed +-1/sqrt({JL_K}) hyperplanes (Achlioptas database-
    friendly JL). `norm_ratio` = ||proj||^2 / ||x||^2 is the per-vector
    distortion — E[ratio] = 1 is the JL guarantee, and the column doubles
    as the sanity gate a pipeline checks before swapping the sketch in for
    the full vectors in distance work.

    Scale: a pure per-row projection — ZERO shuffles, zero UDFs, one
    narrow whole-stage-codegen stage over the scan; the 100 TB use is
    shrinking vectors 8x before any pairwise/index stage. The sign matrix
    is md5-derived at plan-build time and embedded as literals in both
    engines; per-row left-to-right accumulation makes every output
    bit-identical to the oracle."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select("vec_id", as_double(F.col("embedding")).alias("vec"))
    vec = F.col("vec")
    scale = F.sqrt(F.lit(float(JL_K)))
    cols = [
        (dot(vec, F.array(*[F.lit(s) for s in _JL_ROWS[j - 1]])) / scale).alias(f"p{j}")
        for j in range(1, JL_K + 1)
    ]
    p = v.select("vec_id", *cols, dot(vec, vec).alias("sq"))
    sumsq = None
    for j in range(1, JL_K + 1):
        term = F.col(f"p{j}") * F.col(f"p{j}")
        sumsq = term if sumsq is None else sumsq + term
    return p.select(
        "vec_id",
        *[f"p{j}" for j in range(1, JL_K + 1)],
        (sumsq / F.col("sq")).alias("norm_ratio"),
    )
