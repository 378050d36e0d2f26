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
import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.functions.vectors import as_double, dot, sql_as_double, sql_dot
from datapipeline_ops_spark.tables import load_table, local_frame

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
        SELECT i, sum(x) / (SELECT nd FROM st) AS m,
               min(x) < max(x) AS live
        FROM ex GROUP BY i
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
    var AS MATERIALIZED (
        SELECT cov.i, cov.cov AS v, mu.live AS live
        FROM cov JOIN mu ON cov.i = mu.i WHERE cov.i = cov.j
    )
    -- constant dimension (min = max, an EXACT order-independent test) has
    -- undefined correlation: NULL in both engines instead of /0 (ANSI
    -- Spark) or sqrt(-eps) (DuckDB) — oracle-parity fuzzer, round 10
    SELECT CAST(c.i AS INT) AS dim_i, CAST(c.j AS INT) AS dim_j,
           c.cov AS cov,
           CASE WHEN vi.live AND vj.live
                THEN c.cov / sqrt(vi.v * vj.v) ELSE NULL END AS corr
    FROM cov c JOIN var vi ON c.i = vi.i JOIN var vj ON c.j = vj.i
    """,
)
def embedding_pca_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle covariance AND correlation of the {EMB_DIM} embedding
    dimensions — the population Gram/covariance structure PCA and whitening
    start from, and the diagnostic that finds dead (zero-variance) or
    redundant (|corr| ~ 1) dimensions before they waste index space.

    Scale shape: each row flat-maps to its d raw values plus its d(d+1)/2
    upper-triangle products in ONE flat array, and hash aggregation
    PARTIALLY combines them inside the partition, so the single exchange
    moves at most d(d+3)/2 = {EMB_DIM * (EMB_DIM + 3) // 2} rows per
    upstream partition — independent of corpus size (the classic
    map-side-combined Gram matrix, fused with the means/count pass). The
    aggregated moments frame (d(d+3)/2 rows) persists behind a site-keyed
    barrier; means, variances and liveness derive from it via broadcast
    joins, so the corpus is scanned exactly ONCE however many times the
    tiny frames are reused downstream (the un-persisted form re-expanded
    the corpus subtree 44x — round-14 plan census). No vector ever
    shuffles; no driver-side math. Covariance/correlation are true float
    aggregations (partition accumulation order differs across engines) so
    they ship raw per the repo convention."""
    from datapipeline_ops_spark.operators.dedup import persist_barrier

    e = load_table(spark, sf_dir, "embeddings")
    v = e.select(as_double(F.col("embedding")).alias("vec"))
    # a small parquet file scans as one partition and the d^2/2 product
    # fan-out is the expensive stage — spread it, but ONLY when the input
    # is under-partitioned (at production scale the scan already has
    # thousands of partitions and this full-vector shuffle would be waste)
    n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if v.rdd.getNumPartitions() < n:
        v = v.repartition(n)

    # ONE corpus pass: each row emits its d raw values FOLLOWED BY its
    # d(d+1)/2 upper-triangle products as one flat double array
    # (positionally ordered i=1..d, then i=1..d x j=i..d), and a single
    # partial-aggregated groupBy(k) reduces every partition to
    # d(d+3)/2 rows before the one exchange. sum/min/max/count per linear
    # index simultaneously yield the per-dimension means (k < d), the
    # liveness flags (min < max), the cross-product sums (k >= d), and the
    # corpus count — the three separate corpus passes (means pass, count
    # pass, Gram pass) this query used to run collapsed into this one.
    idx = F.sequence(F.lit(1), F.lit(EMB_DIM))
    vec = F.col("vec")
    tri = F.flatten(
        F.transform(
            idx,
            lambda i: F.transform(
                F.sequence(i, F.lit(EMB_DIM)),
                lambda j: F.element_at(vec, i) * F.element_at(vec, j),
            ),
        )
    )
    moments = persist_barrier(
        v.select(F.posexplode(F.concat(vec, tri)).alias("k", "p"))
        .groupBy("k")
        .agg(
            F.sum("p").alias("s"),
            (F.min("p") < F.max("p")).alias("live"),
            F.count(F.lit(1)).cast("double").alias("nd"),
        ),
        f"pca_cov_moments:{sf_dir}",
    )
    mu = moments.filter(F.col("k") < EMB_DIM).select(
        (F.col("k") + 1).alias("i"),
        (F.col("s") / F.col("nd")).alias("m"),
        "live",
    )

    # (i, j) labels for the product block come back from a broadcast index
    # map built once from a 1-row frame with the identical nesting order,
    # offset past the d raw-value slots
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.lit(EMB_DIM)),
            lambda i: F.transform(
                F.sequence(i, F.lit(EMB_DIM)),
                lambda j: F.struct(i.alias("i"), j.alias("j")),
            ),
        )
    )
    kmap = (
        spark.range(1)
        .select(F.posexplode(pairs).alias("k0", "t"))
        .select((F.col("k0") + EMB_DIM).alias("k"), "t.i", "t.j")
    )
    sp = (
        moments.filter(F.col("k") >= EMB_DIM)
        .join(F.broadcast(kmap), "k")
        .select("i", "j", "s", "nd")
    )

    cov = (
        sp.join(F.broadcast(mu.select(F.col("i"), F.col("m").alias("mi"))), "i")
        .join(
            F.broadcast(mu.select(F.col("i").alias("j"), F.col("m").alias("mj"))),
            "j",
        )
        .select(
            "i", "j", (F.col("s") / F.col("nd") - F.col("mi") * F.col("mj")).alias("cov")
        )
    )
    var = (
        cov.filter(F.col("i") == F.col("j"))
        .join(F.broadcast(mu.select("i", "live")), "i")
        .select(F.col("i").alias("vi"), F.col("cov").alias("v"), "live")
    )
    return (
        cov.join(F.broadcast(var), cov["i"] == var["vi"])
        .drop("vi")
        .withColumnRenamed("v", "v_i")
        .withColumnRenamed("live", "live_i")
        .join(F.broadcast(var), cov["j"] == var["vi"])
        .drop("vi")
        .select(
            F.col("i").cast("int").alias("dim_i"),
            F.col("j").cast("int").alias("dim_j"),
            "cov",
            # constant dim => undefined corr => NULL (matches the oracle's
            # CASE; ANSI /0 + sqrt(-eps) guard — fuzzer, round 10)
            F.when(
                F.col("live_i") & F.col("live"),
                F.col("cov") / F.sqrt(F.col("v_i") * F.col("v")),
            ).alias("corr"),
        )
    )


# ---------------------------------------------------------------------------
# Dominant between-class direction (factored power iteration)
# ---------------------------------------------------------------------------

POWER_ITERS = 15   # (lambda2/lambda1)^15 <= 0.81^15 ~ 0.04 on this data
TOP_LOADINGS = 8   # emit the 8 largest-|loading| dims (all >= 0.17 here —
                   # far above the gate's 6-significant-figure floor)


def _scatter_oracle() -> str:
    """Unrolled {POWER_ITERS}-step power iteration as MATERIALIZED CTEs
    (every CTE is referenced more than once — see the repo's DuckDB
    planner convention)."""
    parts = [
        f"""
    WITH v AS MATERIALIZED (
        SELECT label, {sql_as_double("embedding")} AS vec FROM embeddings
    ),
    ex AS (
        SELECT label, g.i AS i, vec[g.i] AS x
        FROM v, unnest(generate_series(1, {EMB_DIM})) AS g(i)
    ),
    per AS MATERIALIZED (
        SELECT label, i, sum(x) AS s, count(*) AS n_l FROM ex GROUP BY label, i
    ),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM v),
    mu AS MATERIALIZED (
        SELECT i, sum(s) / (SELECT n FROM tot) AS mu FROM per GROUP BY i
    ),
    d AS MATERIALIZED (
        SELECT per.label, per.i,
               per.s / CAST(per.n_l AS DOUBLE) - mu.mu AS d,
               CAST(per.n_l AS DOUBLE) / (SELECT n FROM tot) AS w
        FROM per JOIN mu ON per.i = mu.i
    ),
    x0 AS MATERIALIZED (
        SELECT g.i AS i, 1.0 AS x FROM unnest(generate_series(1, {EMB_DIM})) AS g(i)
    )"""
    ]
    for t in range(1, POWER_ITERS + 1):
        parts.append(f""",
    s{t} AS MATERIALIZED (
        SELECT d.label, sum(d.d * x.x) AS s, any_value(d.w) AS w
        FROM d JOIN x{t - 1} x ON d.i = x.i GROUP BY d.label
    ),
    y{t} AS MATERIALIZED (
        SELECT d.i, sum(d.w * d.d * s.s) AS y
        FROM d JOIN s{t} s ON d.label = s.label GROUP BY d.i
    ),
    n{t} AS MATERIALIZED (SELECT sqrt(sum(y * y)) AS nm FROM y{t}),
    x{t} AS MATERIALIZED (
        SELECT i, y / (SELECT nm FROM n{t}) AS x FROM y{t}
    )""")
    parts.append(f""",
    tr AS (SELECT sum(w * d * d) AS trace FROM d),
    ranked AS (
        SELECT i, x, row_number() OVER (ORDER BY abs(x) DESC, i) AS rnk
        FROM x{POWER_ITERS}
    )
    SELECT CAST(rnk AS INT) AS rank, CAST(i AS INT) AS dim, x AS loading,
           (SELECT nm FROM n{POWER_ITERS}) AS lambda1,
           (SELECT nm FROM n{POWER_ITERS}) / (SELECT trace FROM tr)
               AS scatter_share
    FROM ranked WHERE rnk <= {TOP_LOADINGS}
      AND coalesce((SELECT nm FROM n{POWER_ITERS}), 0) > 0
    """)
    return "".join(parts)


@query("class_scatter_direction", oracle=_scatter_oracle())
def class_scatter_direction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant between-class direction: the top eigenvector of the
    label-weighted between-class scatter matrix B = sum_l w_l (mu_l -
    mu)(mu_l - mu)^T, found by {POWER_ITERS} power-iteration steps — the
    axis along which the class centroids separate most (PCA on centroids /
    LDA numerator), the embedding-space diagnostic for "do my labels even
    separate linearly?". Emits the {TOP_LOADINGS} largest-|loading| dims
    plus the eigenvalue and its share of total scatter.

    Scale shape: B is NEVER materialized — the iteration runs on the
    factored form y = M^T W (M x) where M is the (n_labels x d) centered
    centroid matrix. ONE distributed, partial-aggregated scan reduces the
    corpus to that factor (n_labels * d rows — bounded by the SCHEMA, not
    the data, exactly like the union-find edge cap in operators/dedup.py),
    which is then collected and iterated driver-side: 15 multiplies of a
    few-hundred-element factor are microseconds, where the distributed
    formulation costs 30 scheduler round-trips of 64-row jobs. The corpus
    is touched exactly once regardless of iteration count. Iteration
    numerics: cross-engine float drift is damped by the spectral-gap
    contraction, and all emitted loadings are O(0.2) — raw doubles per the
    repo convention."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select("label", as_double(F.col("embedding")).alias("vec"))
    ex = v.select(
        "label", F.posexplode("vec").alias("i0", "x")
    ).select("label", (F.col("i0") + 1).alias("i"), "x")
    per = ex.groupBy("label", "i").agg(
        F.sum("x").alias("s"), F.count(F.lit(1)).alias("n_l")
    )

    # ONE distributed job: the corpus reduces to the schema-bounded
    # (n_labels x d) sum/count factor under map-side combine and is
    # collected; the grand mean, centering, and weights are a few hundred
    # driver-side flops on that factor — the former broadcast-join chain
    # (tot -> mu -> d) cost three extra tiny stages whose scheduler
    # overhead dominated the sub-second runtime (the r9 bench regression).
    sums: dict[int, dict[int, float]] = {}
    n_label: dict[int, int] = {}
    for r in per.collect():
        sums.setdefault(r.label, {})[r.i] = r.s
        n_label[r.label] = r.n_l
    labels = sorted(sums)
    dims = range(1, EMB_DIM + 1)
    n = float(sum(n_label.values()))
    # per-dimension grand mean, matching the oracle's sum-of-sums / n
    # accumulation in label order
    mu_d = {
        i: sum(sums[lab][i] for lab in labels) / n for i in dims
    }
    factor = {
        lab: {i: sums[lab][i] / float(n_label[lab]) - mu_d[i] for i in dims}
        for lab in labels
    }
    weight = {lab: float(n_label[lab]) / n for lab in labels}

    x = {i: 1.0 for i in dims}
    nm = 0.0
    for _ in range(POWER_ITERS):
        s = {
            lab: sum(factor[lab][i] * x[i] for i in dims) for lab in labels
        }
        y = {
            i: sum(weight[lab] * factor[lab][i] * s[lab] for lab in labels)
            for i in dims
        }
        nm = math.sqrt(sum(y[i] * y[i] for i in dims))
        if nm == 0.0:
            # Zero between-class scatter (single label, or centroids all at
            # the grand mean): no separating direction exists — emit ZERO
            # rows, matching the oracle's `nm > 0` filter (its divisions
            # propagate NULL, never crash). Oracle-parity fuzzer, round 10.
            return local_frame(
                spark,
                [],
                "rank int, dim int, loading double, lambda1 double, "
                "scatter_share double",
            )
        x = {i: y[i] / nm for i in dims}

    trace = sum(
        weight[lab] * factor[lab][i] * factor[lab][i]
        for lab in labels
        for i in dims
    )
    top = sorted(dims, key=lambda i: (-abs(x[i]), i))[:TOP_LOADINGS]
    rows = [
        (rank, i, x[i], nm, nm / trace) for rank, i in enumerate(top, start=1)
    ]
    return local_frame(
        spark, rows, "rank int, dim int, loading double, lambda1 double, scatter_share double"
    )


# ---------------------------------------------------------------------------
# Product quantization (IVF-PQ's compression stage)
# ---------------------------------------------------------------------------

PQ_M = 8  # subvectors per vector (EMB_DIM / PQ_M dims each)
PQ_K = 4  # centroids per subspace; codebook = first PQ_K corpus vectors
_PQ_SUB = EMB_DIM // PQ_M


def _pq_subspaces(v: DataFrame) -> DataFrame:
    """(vec_id, m, sub): each vector split into {PQ_M} subvectors."""
    subs = F.transform(
        F.sequence(F.lit(1), F.lit(PQ_M)),
        lambda m: F.struct(
            m.alias("m"), F.slice("vec", (m - 1) * _PQ_SUB + 1, _PQ_SUB).alias("sub")
        ),
    )
    return v.select("vec_id", F.explode(subs).alias("s")).select(
        "vec_id", "s.m", "s.sub"
    )


def _pq_codebook(ex: DataFrame) -> DataFrame:
    """(k, m, csub): deterministic codebook — subvectors of the first
    {PQ_K} corpus vectors (swap in kmeans centroids in production)."""
    return ex.filter(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").alias("k"), "m", F.col("sub").alias("csub")
    )


def _pq_best(ex: DataFrame, cent: DataFrame | None = None) -> DataFrame:
    """(vec_id, m, k, dist): nearest codebook entry per subspace, smallest-k
    tie-break; distances are per-row left-to-right squared L2 —
    bit-identical across engines."""
    if cent is None:
        cent = _pq_codebook(ex)
    diff = F.zip_with("sub", "csub", lambda x, c: x - c)
    d = ex.join(F.broadcast(cent), "m").select(
        "vec_id", "m", "k", dot(diff, diff).alias("dist")
    )
    return d.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("vec_id", "m").orderBy("dist", "k")),
    ).filter(F.col("rn") == 1)


def _pq_shared(spark: SparkSession, sf_dir: str):
    """(ex, cb, best) with the BOUNDED codebook behind a site-keyed
    persist_barrier (r15 optimization, the r14 verdict item): the
    PQ_M x PQ_K codebook subtree (a corpus filter at scale) materializes
    ONCE per session+dataset and is shared by pq_code_assign,
    ann_ivf_pq_topk and their e2e consumers (ann_ivfpq_recall_eval,
    serving_eval_gate_e2e) — it is read 2-3x per plan (the assignment
    join and the query distance tables). Corpus-sized barriers were
    measured and REJECTED here: persisting the per-subspace assignment
    (``best``) or the coarse (vec_id, cid) table added +0.3-0.5 s cold
    per query at sf0.1 (the cache write outweighs recomputing from the
    cached scan) with no isolated-median win — see OPTIMIZATION_r15.md."""
    from datapipeline_ops_spark.operators.dedup import persist_barrier
    from datapipeline_ops_spark.queries.similarity import _vectors

    v = _vectors(spark, sf_dir).select("vec_id", "vec")
    ex = _pq_subspaces(v)
    cb = persist_barrier(_pq_codebook(ex), f"pq_cb:{sf_dir}")
    best = _pq_best(ex, cb)
    return ex, cb, best


@query(
    "pq_code_assign",
    oracle=f"""
    WITH v AS MATERIALIZED (
        SELECT vec_id, {sql_as_double("embedding")} AS vec FROM embeddings
    ),
    ex AS MATERIALIZED (
        SELECT vec_id, g.m AS m, vec[(g.m - 1) * {_PQ_SUB} + 1 : g.m * {_PQ_SUB}] AS sub
        FROM v, unnest(generate_series(1, {PQ_M})) AS g(m)
    ),
    cent AS MATERIALIZED (
        SELECT vec_id AS k, m, sub AS csub FROM ex WHERE vec_id < {PQ_K}
    ),
    d AS (
        SELECT ex.vec_id, ex.m, cent.k,
               {sql_dot(f"list_transform(generate_series(1, {_PQ_SUB}), i -> ex.sub[i] - cent.csub[i])",
                        f"list_transform(generate_series(1, {_PQ_SUB}), i -> ex.sub[i] - cent.csub[i])")}
                   AS dist
        FROM ex JOIN cent ON ex.m = cent.m
    ),
    best AS (
        SELECT vec_id, m, k, dist,
               row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, k) AS rn
        FROM d
    )
    SELECT vec_id,
           CAST(sum(k * (1 << (2 * (m - 1)))) AS BIGINT) AS pq_code,
           sum(dist) AS recon_err
    FROM best WHERE rn = 1 GROUP BY vec_id
    """,
)
def pq_code_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization code assignment: split each vector into {PQ_M}
    subvectors of {_PQ_SUB} dims, assign each to the nearest of {PQ_K}
    codebook entries per subspace (deterministic codebook: the subvectors
    of the first {PQ_K} corpus vectors — a seeded kmeans stand-in; swap in
    `kmeans_refine_step` centroids in production), and pack the {PQ_M}
    2-bit codes into one BIGINT. `recon_err` is the summed squared
    quantization error — the quantity PQ training minimizes and the
    quality metric for choosing M/K. This is the compression stage of
    IVF-PQ: 64 floats -> one small int per vector, the difference between
    an ANN index that fits in RAM at 1e9+ vectors and one that doesn't.

    Scale shape: subvector explode (x{PQ_M}) joins the {PQ_M * PQ_K}-row
    codebook BROADCAST; the nearest-centroid pick is a window partitioned
    by (vec_id, m); distances are per-row left-to-right arithmetic —
    bit-identical across engines, so code assignments (including
    tie-breaks) match exactly. The pack sum is exact integer math; only
    recon_err is a float sum (raw, 6-sig-fig gated)."""
    _, _, best = _pq_shared(spark, sf_dir)
    return best.groupBy("vec_id").agg(
        F.sum(F.expr("k * shiftleft(1L, CAST(2 * (m - 1) AS INT))"))
        .cast("long")
        .alias("pq_code"),
        F.sum("dist").alias("recon_err"),
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


# ---------------------------------------------------------------------------
# IVF-PQ ANN search: coarse cells + PQ asymmetric distances + exact rerank
# ---------------------------------------------------------------------------

IVFPQ_SHORTLIST = 10  # ADC candidates per query before exact rerank
IVFPQ_TOPK = 5


def _ivfpq_oracle() -> str:
    from datapipeline_ops_spark.queries.similarity import (
        IVF_CENTROIDS,
        N_QUERIES,
    )
    from datapipeline_ops_spark.functions.vectors import sql_cosine

    sq = (
        f"list_transform(generate_series(1, {_PQ_SUB}), "
        "i -> qe.sub[i] - cb.csub[i])"
    )
    return f"""
    WITH v AS MATERIALIZED (
        SELECT vec_id, {sql_as_double("embedding")} AS vec FROM embeddings
    ),
    cent AS MATERIALIZED (
        SELECT vec_id AS cid, vec AS cvec FROM v
        WHERE vec_id >= {IVF_CENTROIDS[0]} AND vec_id < {IVF_CENTROIDS[1]}
    ),
    assign AS MATERIALIZED (
        SELECT vec_id, cid, vec FROM (
            SELECT a.vec_id, b.cid, a.vec,
                   row_number() OVER (PARTITION BY a.vec_id
                                      ORDER BY {sql_cosine("a.vec", "b.cvec")} DESC,
                                               b.cid) AS rn
            FROM v a JOIN cent b ON true
        ) WHERE rn = 1
    ),
    ex AS MATERIALIZED (
        SELECT vec_id, g.m AS m, vec[(g.m - 1) * {_PQ_SUB} + 1 : g.m * {_PQ_SUB}] AS sub
        FROM v, unnest(generate_series(1, {PQ_M})) AS g(m)
    ),
    cb AS MATERIALIZED (
        SELECT vec_id AS k, m, sub AS csub FROM ex WHERE vec_id < {PQ_K}
    ),
    codes AS MATERIALIZED (
        SELECT vec_id, m, k AS code FROM (
            SELECT e.vec_id, e.m, cb.k,
                   row_number() OVER (PARTITION BY e.vec_id, e.m ORDER BY
                       {sql_dot(f"list_transform(generate_series(1, {_PQ_SUB}), i -> e.sub[i] - cb.csub[i])",
                                f"list_transform(generate_series(1, {_PQ_SUB}), i -> e.sub[i] - cb.csub[i])")},
                       cb.k) AS rn
            FROM ex e JOIN cb ON e.m = cb.m
        ) WHERE rn = 1
    ),
    qd AS MATERIALIZED (
        SELECT qe.vec_id AS query_id, cb.m, cb.k,
               {sql_dot(sq, sq)} AS d
        FROM ex qe JOIN cb ON qe.m = cb.m
        WHERE qe.vec_id < {N_QUERIES}
    ),
    q AS MATERIALIZED (
        SELECT vec_id AS query_id, cid AS qcid, vec AS qvec FROM assign
        WHERE vec_id < {N_QUERIES}
    ),
    adc AS MATERIALIZED (
        SELECT q.query_id, c.vec_id,
               list_sum(list(qd.d ORDER BY qd.m)) AS adc
        FROM q
        JOIN assign c ON c.cid = q.qcid AND c.vec_id <> q.query_id
        JOIN codes ON codes.vec_id = c.vec_id
        JOIN qd ON qd.query_id = q.query_id AND qd.m = codes.m
               AND qd.k = codes.code
        GROUP BY q.query_id, c.vec_id
    ),
    short AS MATERIALIZED (
        SELECT query_id, vec_id, adc FROM (
            SELECT query_id, vec_id, adc,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY adc, vec_id) AS rn
            FROM adc
        ) WHERE rn <= {IVFPQ_SHORTLIST}
    ),
    rr AS (
        SELECT s.query_id, s.vec_id, s.adc,
               {sql_cosine("q.qvec", "x.vec")} AS cos,
               row_number() OVER (PARTITION BY s.query_id
                                  ORDER BY {sql_cosine("q.qvec", "x.vec")} DESC,
                                           s.vec_id) AS rank
        FROM short s
        JOIN q ON q.query_id = s.query_id
        JOIN v x ON x.vec_id = s.vec_id
    )
    SELECT query_id, vec_id, adc, cos, CAST(rank AS INT) AS rank
    FROM rr WHERE rank <= {IVFPQ_TOPK}
    """


@query("ann_ivf_pq_topk", oracle=_ivfpq_oracle())
def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ approximate nearest neighbor — the production vector-index
    shape end to end: (1) coarse-quantize the corpus into IVF cells so each
    query scans only its own cell; (2) rank the cell's candidates by PQ
    ASYMMETRIC distance — the query precomputes a {PQ_M} x {PQ_K} table of
    subvector-to-codebook distances, and a candidate's approximate distance
    is {PQ_M} table lookups summed, NEVER a touch of its full vector;
    (3) exact-rerank the top-{IVFPQ_SHORTLIST} shortlist by true cosine and
    return the top-{IVFPQ_TOPK}. At 1e9+ vectors this is why the index fits
    in RAM: the scan phase reads 2-bit codes, full vectors surface only for
    {IVFPQ_SHORTLIST} rows per query.

    Determinism: the ADC sum adds the per-subspace lookups in EXPLICIT m
    order (an unrolled left-to-right fold; DuckDB `list_sum(list(d ORDER
    BY m))`) so candidate ordering — and therefore the shortlist and final
    ranks — match the oracle exactly. Plan shape: the corpus codes are
    packed {PQ_M} x 2-bit into ONE BIGINT per vector (the `pq_code_assign`
    pack) and reach candidates via a plain equi-join on vec_id — nothing
    corpus-sized is ever broadcast (the r5 design audit's fix); the only
    broadcast frames are the per-query {PQ_M * PQ_K}-entry distance tables
    and the query-id list, both bounded by query count. ADC itself is
    per-row codegen: 8 shift/mask lookups into the broadcast table."""
    from datapipeline_ops_spark.queries.similarity import (
        IVF_CENTROIDS,
        N_QUERIES,
        _vectors,
    )
    from datapipeline_ops_spark.functions.vectors import norm

    vfull = _vectors(spark, sf_dir)  # (vec_id, label, vec, nrm)
    cent = vfull.filter(
        (F.col("vec_id") >= IVF_CENTROIDS[0]) & (F.col("vec_id") < IVF_CENTROIDS[1])
    ).select(
        F.col("vec_id").alias("cid"),
        F.col("vec").alias("cvec"),
        F.col("nrm").alias("cnrm"),
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cid"))
    assign = (
        vfull.join(F.broadcast(cent))
        .withColumn(
            "ccos", dot(F.col("vec"), F.col("cvec")) / (F.col("nrm") * F.col("cnrm"))
        )
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid")
    )

    ex, cb, best = _pq_shared(spark, sf_dir)
    # ONE row per corpus vector: the PQ_M 2-bit codes packed into a BIGINT
    # (same pack as pq_code_assign, derived from the shared-codebook
    # assignment). Candidates reach their codes via a plain equi-join —
    # never a broadcast of a corpus-derived frame.
    packed = (
        best
        .groupBy("vec_id")
        .agg(
            F.sum(F.expr("k * shiftleft(1L, CAST(2 * (m - 1) AS INT))"))
            .cast("long")
            .alias("pq_code")
        )
    )

    qdiff = F.zip_with("sub", "csub", lambda x, c: x - c)
    qd = (
        ex.filter(F.col("vec_id") < N_QUERIES)
        .withColumnRenamed("vec_id", "query_id")
        .join(F.broadcast(cb), "m")
        .select("query_id", "m", "k", dot(qdiff, qdiff).alias("d"))
    )
    q = assign.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("cid").alias("qcid")
    )
    cand = assign.join(F.broadcast(q), assign["cid"] == q["qcid"]).filter(
        F.col("vec_id") != F.col("query_id")
    ).select("query_id", "vec_id")
    # Per-query flat distance table: dt[(m-1)*PQ_K + k] = d, PQ_M*PQ_K
    # entries — bounded by query count, the ONLY broadcast in the ADC join.
    qtab = qd.groupBy("query_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("m", "k", "d"))),
            lambda s: s["d"],
        ).alias("dt")
    )
    # ADC: 8 shift/mask lookups per candidate, added in explicit m order
    # (unrolled left-to-right fold) so the sum is bit-identical to the
    # oracle's list_sum(list(d ORDER BY m))
    adc_expr = F.lit(0.0)
    for m in range(1, PQ_M + 1):
        code_m = F.shiftright(F.col("pq_code"), 2 * (m - 1)).bitwiseAND(
            F.lit(PQ_K - 1)
        )
        adc_expr = adc_expr + F.element_at(
            F.col("dt"), ((m - 1) * PQ_K + code_m + 1).cast("int")
        )
    adc = (
        cand.join(packed, "vec_id")
        .join(F.broadcast(qtab), "query_id")
        .select("query_id", "vec_id", adc_expr.alias("adc"))
    )
    w_short = Window.partitionBy("query_id").orderBy("adc", "vec_id")
    short = (
        adc.withColumn("rn", F.row_number().over(w_short))
        .filter(F.col("rn") <= IVFPQ_SHORTLIST)
        .select("query_id", "vec_id", "adc")
    )
    qv = vfull.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("nrm").alias("qnrm"),
    )
    rr = (
        short.join(F.broadcast(qv), "query_id")
        .join(vfull.select("vec_id", "vec", "nrm"), "vec_id")
        .withColumn(
            "cos", dot(F.col("qvec"), F.col("vec")) / (F.col("qnrm") * F.col("nrm"))
        )
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        rr.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= IVFPQ_TOPK)
        .select("query_id", "vec_id", "adc", "cos", "rank")
    )
