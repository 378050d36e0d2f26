"""Similarity search over the ``embeddings`` table (``array<float>`` column).

Beyond-reference surface (the reference's only similarity op is a pairwise
face-embedding scorer behind an injected model — ``common/transform/
similarity_op.py:7-24``; dataset-level search doesn't exist there). Four
queries give the full ANN story a training-data pipeline needs:

- **brute-force cosine top-k** — the exactness baseline. The query side is
  tiny and broadcast; the corpus side streams. One pass over the corpus per
  batch of queries, no shuffle of the vectors themselves (only the top-k
  window on ``query_id`` shuffles, and rows are pre-pruned to k per
  partition by the rank filter).
- **near-dup pairs** (cosine >= tau) — brute-force O(n^2) kept as the
  correctness oracle for the bucketed variants.
- **sign-LSH buckets** — 8 deterministic hyperplanes (components derived
  from the cross-engine hash, so DuckDB reproduces the exact bucket ids);
  near-dup candidates become an equi-join on an 8-bit bucket key.
- **IVF two-stage search** — assign corpus vectors to their nearest
  centroid (coarse quantizer), then search only the query's cell. At 100 TB
  the corpus is written partitioned/bucketed BY cell id, so a probe reads
  one partition — partition pruning does the pruning, not a filter.

All dot products / norms are `zip_with` + `aggregate` array expressions —
JVM-side, whole-stage codegen, no Python. Left-to-right double accumulation
makes values bit-identical to the DuckDB mirrors (see functions/vectors.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.functions.hashing import hash_unit, sql_hash_unit
from datapipeline_ops_spark.functions.vectors import (
    as_double,
    dot,
    norm,
    sql_as_double,
    sql_cosine,
    sql_dot,
    sql_norm,
)
from datapipeline_ops_spark.tables import load_table, local_frame

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5
NEAR_DUP_TAU = 0.35
LSH_PLANES = 8
IVF_CENTROIDS = (10, 20)  # vec_id in [10, 20) are the coarse centroids
EMB_DIM = 64
# Block count for the exact all-pairs self-join: the corpus self-joins
# through NB(NB+1)/2 block pairs instead of one driver-bound broadcast.
# Parallelism of the pair stage == NB (equi-join key cardinality), so at
# cluster scale set NB ≈ 2·sqrt(desired tasks); 16 gives 136 block pairs —
# plenty for local[32] at test SFs.
NEAR_DUP_BLOCKS = 16

# DuckDB mirror of a vectors view with DOUBLE elements
_V_CTE = """
    v AS (SELECT vec_id, label,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
          FROM embeddings)
"""
_COS_AB = sql_cosine("a.vec", "b.vec")


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, vec, nrm): the L2 norm is computed ONCE per vector in
    the scan projection — every pair query then divides a pair dot product
    by the two cached norms instead of re-walking both arrays per CANDIDATE
    PAIR (zip_with/aggregate are interpreted, not codegen'd; norms were 2/3
    of the pair-stage expression work). Queries that don't reference ``nrm``
    lose the column to Catalyst's projection pruning — computing it here is
    free for them. Values are bit-identical either way (same IEEE ops in
    the same order), so the oracles are unchanged."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select("vec_id", "label", as_double(F.col("embedding")).alias("vec"))
    return v.withColumn("nrm", norm(F.col("vec")))


@query(
    "cosine_topk_bruteforce",
    oracle=f"""
    WITH {_V_CTE},
    scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
               {_COS_AB} AS cos,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY {_COS_AB} DESC, b.vec_id) AS rn
        FROM v a JOIN v b ON b.vec_id <> a.vec_id
        WHERE a.vec_id < {N_QUERIES}
    )
    SELECT query_id, vec_id, round(cos, 6) AS cos, CAST(rn AS INT) AS rank
    FROM scored WHERE rn <= {TOP_K}
    """,
)
def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast the (tiny) query batch against the
    corpus scan — a broadcast nested-loop join, one corpus pass for the
    whole query batch — then rank within each query. Deterministic
    tie-break on vec_id so ranking is stable across engines and runs."""
    v = _vectors(spark, sf_dir)
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("nrm").alias("qnrm"),
    )
    scored = (
        v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", dot(F.col("qvec"), F.col("vec")) / (F.col("qnrm") * F.col("nrm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")
    )


@query(
    "embedding_near_dup",
    oracle=f"""
    WITH {_V_CTE}
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, round({_COS_AB}, 6) AS cos
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE {_COS_AB} >= {NEAR_DUP_TAU}
    """,
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine threshold self-join, executed as a BLOCKED
    distributed pair join — not a broadcast of the whole corpus.

    Why not candidate blocking: at τ=0.35 (θ_max≈69.5°) no angular blocking
    is both selective and lossless — measured on this corpus, qualifying
    pairs span the FULL sign-LSH Hamming range 0–8 (sf0.01: {0:8, 1:32,
    2:63, 3:78, 4:47, 5:30, 6:12, 7:1}) and pivot ball-cover cell radii sit
    at ~85°, so triangle-inequality pruning removes nothing. An exact
    cosine join at a "not quite orthogonal" threshold is inherently
    all-pairs; the scale question is only HOW the n² pair-FLOPs distribute.
    For the selective near-dup regime (high τ) see
    :func:`embedding_near_dup_lsh`.

    Plan shape: vectors get ``block = vec_id % NB``; a tiny (ba ≤ bb)
    block-pair frame broadcasts onto side A (row amplification ≈ NB/2, of
    compact (id, block, vec) rows), then side B attaches via a SHUFFLE
    equi-join on its block id. No corpus-wide broadcast build side (the
    previous form died at the 8 GB driver broadcast limit long before
    100 TB), even work per block pair (dense ids → uniform blocks), and
    pair FLOPs stay in whole-stage codegen via the zip_with cosine."""
    v = _vectors(spark, sf_dir).withColumn(
        "block", (F.col("vec_id") % NEAR_DUP_BLOCKS).cast("int")
    )
    # constant block-pair metadata (NB(NB+1)/2 rows), not a data-dependent join
    bp = local_frame(
        spark,
        [(ba, bb) for ba in range(NEAR_DUP_BLOCKS) for bb in range(ba, NEAR_DUP_BLOCKS)],
        "ba int, bb int",
    )
    a = v.select(
        F.col("vec_id").alias("id_a"), F.col("vec").alias("va"),
        F.col("nrm").alias("na"), F.col("block").alias("ba"),
    )
    b = v.select(
        F.col("vec_id").alias("id_b"), F.col("vec").alias("vb"),
        F.col("nrm").alias("nb"), F.col("block").alias("bb"),
    )
    return (
        a.join(F.broadcast(bp), "ba")
        .join(b, "bb")
        .filter((F.col("ba") < F.col("bb")) | (F.col("id_a") < F.col("id_b")))
        .withColumn("cos", dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= NEAR_DUP_TAU)
        .select(
            F.least("id_a", "id_b").alias("vec_a"),
            F.greatest("id_a", "id_b").alias("vec_b"),
            F.round("cos", 6).alias("cos"),
        )
    )


@query(
    "ann_lsh_buckets",
    oracle=f"""
    WITH {_V_CTE},
    proj AS (
        SELECT vec_id, p.j AS j,
               list_sum(list_transform(generate_series(1, {EMB_DIM}),
                   i -> vec[i] * ({sql_hash_unit("CAST(p.j AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)")} - 0.5))) AS d
        FROM v, LATERAL (SELECT unnest(generate_series(0, {LSH_PLANES - 1})) AS j) AS p
    )
    SELECT vec_id,
           CAST(sum(CASE WHEN d > 0 THEN 1 << j ELSE 0 END) AS INT) AS bucket
    FROM proj GROUP BY vec_id
    """,
)
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane (sign) LSH: 8 deterministic hyperplanes whose
    components are hash_unit(j:i)-0.5, so both engines build bit-identical
    planes. Bucket = 8-bit sign pattern; near-dup candidate generation then
    becomes an equi-join on this int key (shuffle on a 1-byte key, never on
    the vectors)."""
    v = _vectors(spark, sf_dir)
    return v.select("vec_id", _lsh_bucket(F.col("vec")).alias("bucket"))


def _plane_const(j: int, i: int) -> float:
    """plane_j[i] = hash_unit(\"j:i\") - 0.5, evaluated at plan-build time.
    Bit-identical to the engine expression (md5 hex → 60-bit int → %1e6 →
    /1e6): the components are pure functions of (j, i), and Catalyst does
    NOT constant-fold through transform() lambdas — the previous in-plan
    construction re-ran 8×64 md5+conv per ROW. The DuckDB oracle keeps the
    hash-based construction and reproduces these exact doubles."""
    import hashlib

    v = int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[:15], 16)
    return (v % 1_000_000) / 1_000_000.0 - 0.5


def _lsh_bucket(vec) -> F.Column:
    """8-bit sign-LSH bucket of a double-array column (shared by
    ann_lsh_buckets and embedding_near_dup_lsh; mirrored by the proj/bucket
    oracle CTEs). Planes are literal arrays — zero hashing in the scan."""
    bucket = F.lit(0)
    for j in range(LSH_PLANES):
        plane = F.array(*[F.lit(_plane_const(j, i)) for i in range(EMB_DIM)])
        proj = F.aggregate(
            F.zip_with(vec, plane, lambda x, h: x * h),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket.cast("int")


_BUCKET_CTE = f"""
    proj AS (
        SELECT vec_id, p.j AS j,
               list_sum(list_transform(generate_series(1, {EMB_DIM}),
                   i -> vec[i] * ({sql_hash_unit("CAST(p.j AS VARCHAR) || ':' || CAST(i - 1 AS VARCHAR)")} - 0.5))) AS d
        FROM v, LATERAL (SELECT unnest(generate_series(0, {LSH_PLANES - 1})) AS j) AS p
    ),
    bkt AS (
        SELECT vec_id,
               CAST(sum(CASE WHEN d > 0 THEN 1 << j ELSE 0 END) AS INT) AS bucket
        FROM proj GROUP BY vec_id
    )
"""


@query(
    "embedding_near_dup_lsh",
    oracle=f"""
    WITH {_V_CTE},
    {_BUCKET_CTE}
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, round({_COS_AB}, 6) AS cos
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    JOIN bkt ka ON ka.vec_id = a.vec_id
    JOIN bkt kb ON kb.vec_id = b.vec_id
    WHERE bit_count(xor(CAST(ka.bucket AS BIGINT), CAST(kb.bucket AS BIGINT))) <= 1
      AND {_COS_AB} >= {NEAR_DUP_TAU}
    """,
)
def embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH-blocked near-dup pairs: bucket equi-join with Hamming-1
    multiprobe → exact cosine verify. The quadratic pair space never
    materializes — side A explodes into its 9 probe buckets (home ∪ one-bit
    flips), side B keeps only its home bucket, and candidates come from ONE
    equi-join on the 8-bit bucket key; each Hamming≤1 pair matches exactly
    one probe, so no distinct is needed.

    The oracle applies the *same* Hamming≤1 spec brute-force in SQL, so the
    gate proves the probe join loses nothing against the operator's
    definition (the simhash_near_pairs precedent). Versus the exact join
    (:func:`embedding_near_dup`) the bucket filter is lossy by design —
    sign-LSH recall at angle θ is Σ_{{k≤1}} C(8,k)(θ/π)^k(1-θ/π)^(8-k),
    →1 as cos→1 (true near-dups) but only ~15% at the τ=0.35 tail
    (measured sf0.01: qualifying pairs span Hamming 0–8). That tradeoff —
    not a selective-AND-exact blocking, which does not exist at θ_max≈70° —
    is what makes this the 100 TB path: shuffle is 9 compact (id, bucket)
    rows per vector plus verified candidates only."""
    v = _vectors(spark, sf_dir).withColumn("bucket", _lsh_bucket(F.col("vec")))
    probes = F.array(
        F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(LSH_PLANES)]
    )
    a = v.select(
        F.col("vec_id").alias("id_a"),
        F.col("vec").alias("va"),
        F.col("nrm").alias("na"),
        F.explode(probes).alias("bucket"),
    )
    b = v.select(
        F.col("vec_id").alias("id_b"), F.col("vec").alias("vb"),
        F.col("nrm").alias("nb"), "bucket",
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= NEAR_DUP_TAU)
        .select(
            F.col("id_a").alias("vec_a"),
            F.col("id_b").alias("vec_b"),
            F.round("cos", 6).alias("cos"),
        )
    )


@query(
    "ann_ivf_topk",
    oracle=f"""
    WITH {_V_CTE},
    cent AS (SELECT vec_id AS cid, vec FROM v
             WHERE vec_id >= {IVF_CENTROIDS[0]} AND vec_id < {IVF_CENTROIDS[1]}),
    assign AS (
        SELECT vec_id, cid, vec FROM (
            SELECT a.vec_id, b.cid, a.vec AS vec,
                   row_number() OVER (PARTITION BY a.vec_id
                                      ORDER BY {sql_cosine("a.vec", "b.vec")} DESC, b.cid) AS rn
            FROM v a JOIN cent b ON true
        ) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, cid AS qcid, vec AS qvec FROM assign
          WHERE query_id < {N_QUERIES}),
    scored AS (
        SELECT q.query_id, c.vec_id,
               {sql_cosine("q.qvec", "c.vec")} AS cos,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY {sql_cosine("q.qvec", "c.vec")} DESC, c.vec_id) AS rn
        FROM q JOIN assign c ON c.cid = q.qcid AND c.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, round(cos, 6) AS cos, CAST(rn AS INT) AS rank
    FROM scored WHERE rn <= {TOP_K}
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) two-stage ANN: (1) coarse-quantize every vector to
    its nearest of 10 centroids (broadcast centroid table + argmax window);
    (2) each query searches only its own cell. At scale the corpus is
    written ``partitionBy(cid)`` so stage 2 is partition-pruned I/O — the
    scan reads 1/C of the data per probe instead of filtering post-hoc."""
    v = _vectors(spark, sf_dir)
    cent = v.filter(
        (F.col("vec_id") >= IVF_CENTROIDS[0]) & (F.col("vec_id") < IVF_CENTROIDS[1])
    ).select(
        F.col("vec_id").alias("cid"), F.col("vec").alias("cvec"),
        F.col("nrm").alias("cnrm"),
    )

    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("ccos"), F.asc("cid")
    )
    assign = (
        v.join(F.broadcast(cent))
        .withColumn("ccos", dot(F.col("vec"), F.col("cvec")) / (F.col("nrm") * F.col("cnrm")))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid", "vec", "nrm")
    )
    q = assign.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("cid").alias("qcid"),
        F.col("vec").alias("qvec"),
        F.col("nrm").alias("qnrm"),
    )
    scored = (
        assign.join(
            F.broadcast(q),
            (F.col("cid") == F.col("qcid")) & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn("cos", dot(F.col("qvec"), F.col("vec")) / (F.col("qnrm") * F.col("nrm")))
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")
    )


@query(
    "embedding_dedup_keepers",
    oracle=f"""
    WITH RECURSIVE {_V_CTE},
    {_BUCKET_CTE},
    prs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM v a JOIN v b ON a.vec_id < b.vec_id
        JOIN bkt ka ON ka.vec_id = a.vec_id
        JOIN bkt kb ON kb.vec_id = b.vec_id
        WHERE bit_count(xor(CAST(ka.bucket AS BIGINT), CAST(kb.bucket AS BIGINT))) <= 1
          AND {_COS_AB} >= {NEAR_DUP_TAU}
    ),
    edges AS (SELECT vec_a AS s, vec_b AS d FROM prs
              UNION SELECT vec_b, vec_a FROM prs),
    reach AS (
        SELECT s AS vec_id, s AS label FROM (SELECT DISTINCT s FROM edges)
        UNION
        SELECT e.d AS vec_id, r.label FROM reach r JOIN edges e ON e.s = r.vec_id
    ),
    clusters AS (SELECT vec_id, min(label) AS cluster_id FROM reach GROUP BY vec_id)
    SELECT em.vec_id, em.label
    FROM embeddings em LEFT JOIN clusters c ON em.vec_id = c.vec_id
    WHERE c.vec_id IS NULL OR c.cluster_id = em.vec_id
    """,
)
def embedding_dedup_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The embedding-side dedup funnel, end to end: sign-LSH multiprobe
    near-dup pairs (:func:`embedding_near_dup_lsh`) → connected components
    (pointer-jumping min-label propagation) → keep each cluster's min
    vec_id plus all singletons. This is `corpus_curation_e2e` for the
    vector modality — the step an embedding-level training-data dedup runs
    after text dedup. The oracle replays pairs brute-force over the same
    Hamming≤1 spec and the clustering as a recursive CTE, so the gate
    value-checks the full funnel against exact graph reachability."""
    from datapipeline_ops_spark.operators.dedup import connected_components

    pairs = embedding_near_dup_lsh(spark, sf_dir)
    clusters = connected_components(pairs, "vec_a", "vec_b").select(
        F.col("node").alias("vec_id"), F.col("label").alias("cluster_id")
    )
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    return (
        e.join(clusters, "vec_id", "left")
        .filter(F.col("cluster_id").isNull() | (F.col("cluster_id") == F.col("vec_id")))
        .select("vec_id", "label")
    )


RERANK_SHORTLIST = 20
RERANK_K = 5
_L2_AB = (
    "sqrt(greatest(0e0, "
    + sql_dot("a.vec", "a.vec")
    + " + "
    + sql_dot("b.vec", "b.vec")
    + " - 2 * "
    + sql_dot("a.vec", "b.vec")
    + "))"
)


@query(
    "ann_rerank_l2",
    oracle=f"""
    WITH {_V_CTE},
    scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
               {_L2_AB} AS l2,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY {_COS_AB} DESC, b.vec_id) AS rn
        FROM v a JOIN v b ON b.vec_id <> a.vec_id
        WHERE a.vec_id < {N_QUERIES}
    ),
    rr AS (
        SELECT query_id, vec_id, l2,
               row_number() OVER (PARTITION BY query_id ORDER BY l2, vec_id) AS rank
        FROM scored WHERE rn <= {RERANK_SHORTLIST}
    )
    SELECT query_id, vec_id, round(l2, 6) AS l2, CAST(rank AS INT) AS rank
    FROM rr WHERE rank <= {RERANK_K}
    """,
)
def ann_rerank_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval: a cheap cosine shortlist (top-20 per query) is
    re-ranked by exact L2 distance to the final top-5 — the
    shortlist-then-rerank architecture every production ANN service uses
    (coarse metric or quantized vectors for recall, exact/expensive metric
    for precision on the tiny shortlist).

    L2 is derived from the SAME dot products the cosine stage computes
    (|a-b|² = |a|² + |b|² − 2a·b), so stage 2 re-walks no arrays. At scale:
    stage 1 is the broadcast-query corpus pass (IVF/LSH would replace it
    above memory); stage 2 touches shortlist×queries rows — constant work
    regardless of corpus size."""
    v = _vectors(spark, sf_dir)
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("nrm").alias("qnrm"),
    )
    scored = (
        v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn("dp", dot(F.col("qvec"), F.col("vec")))
        .withColumn("cos", F.col("dp") / (F.col("qnrm") * F.col("nrm")))
        .withColumn(
            "l2",
            F.sqrt(
                F.greatest(
                    F.lit(0.0),
                    F.col("qnrm") * F.col("qnrm")
                    + F.col("nrm") * F.col("nrm")
                    - 2 * F.col("dp"),
                )
            ),
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    short = scored.withColumn("rn", F.row_number().over(w1)).filter(
        F.col("rn") <= RERANK_SHORTLIST
    )
    w2 = Window.partitionBy("query_id").orderBy(F.asc("l2"), F.asc("vec_id"))
    return (
        short.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= RERANK_K)
        .select("query_id", "vec_id", F.round("l2", 6).alias("l2"), "rank")
    )


@query(
    "kmeans_refine_step",
    oracle=f"""
    WITH {_V_CTE},
    c AS (SELECT vec_id - {IVF_CENTROIDS[0]} AS cluster_id, vec FROM v
          WHERE vec_id >= {IVF_CENTROIDS[0]} AND vec_id < {IVF_CENTROIDS[1]}),
    assign AS (
        SELECT a.vec_id, c.cluster_id,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY {sql_cosine("a.vec", "c.vec")} DESC,
                                           c.cluster_id) AS rn
        FROM v a, c
    ),
    m AS (
        SELECT v.vec_id, a.cluster_id, v.vec
        FROM v JOIN (SELECT vec_id, cluster_id FROM assign WHERE rn = 1) a
          USING (vec_id)
    )
    SELECT cluster_id, i.dim AS dim,
           round(avg(vec[i.dim + 1]), 6) + 0.0 AS centroid,
           count(*) AS n_members
    FROM m, LATERAL (SELECT unnest(generate_series(0, {EMB_DIM - 1})) AS dim) AS i
    GROUP BY 1, 2
    """,
)
def kmeans_refine_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd iteration of k-means over the embedding corpus: assign
    every vector to its nearest centroid (cosine, deterministic tie-break),
    then recompute each centroid as the member mean per dimension — the
    assign+update step that trains the IVF coarse quantizer
    (``ann_ivf_topk`` consumes exactly such centroids).

    Scale shape: the K=10 centroid batch broadcasts (constant size); the
    assignment is one corpus pass with a per-row argmax — no shuffle of
    vectors. The update explodes members to (cluster, dim, value) rows and
    partial-aggregates map-side down to K×dim cells, so the exchange
    carries only the new centroid matrix. Driving the loop to convergence
    re-runs this plan with the previous round's broadcast output."""
    v = _vectors(spark, sf_dir)
    c = v.filter(
        (F.col("vec_id") >= IVF_CENTROIDS[0]) & (F.col("vec_id") < IVF_CENTROIDS[1])
    ).select(
        (F.col("vec_id") - IVF_CENTROIDS[0]).alias("cluster_id"),
        F.col("vec").alias("cvec"),
        F.col("nrm").alias("cnrm"),
    )
    scored = v.crossJoin(F.broadcast(c)).withColumn(
        "cos", dot(F.col("vec"), F.col("cvec")) / (F.col("nrm") * F.col("cnrm"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cluster_id"))
    members = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cluster_id", "vec")
    )
    return (
        members.select("cluster_id", F.posexplode("vec").alias("dim", "val"))
        .groupBy("cluster_id", "dim")
        .agg(
            (F.round(F.avg("val"), 6) + 0.0).alias("centroid"),
            F.count(F.lit(1)).alias("n_members"),
        )
    )


@query(
    "embedding_centroid_drift",
    oracle=f"""
    WITH {_V_CTE},
    halves AS (
        SELECT label, vec_id % 2 AS grp, i.dim AS dim,
               round(avg(vec[i.dim + 1]), 6) + 0.0 AS c
        FROM v, LATERAL (SELECT unnest(generate_series(0, {EMB_DIM - 1})) AS dim) AS i
        GROUP BY 1, 2, 3
    ),
    paired AS (
        SELECT a.label, a.dim, a.c AS ca, b.c AS cb
        FROM halves a JOIN halves b
          ON a.label = b.label AND a.dim = b.dim AND a.grp = 0 AND b.grp = 1
    ),
    counts AS (
        SELECT label,
               CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        FROM v GROUP BY label
    )
    SELECT p.label, c.n_a, c.n_b,
           sum(ca * cb) / (sqrt(sum(ca * ca)) * sqrt(sum(cb * cb))) AS centroid_cos
    FROM paired p JOIN counts c ON p.label = c.label
    GROUP BY p.label, c.n_a, c.n_b
    """,
)
def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift monitor: per label, the cosine between the
    centroid of the even-id half and the odd-id half of the corpus — the
    vector analog of the PSI gate ("did this class's embedding distribution
    move between snapshots?").  Reading: a label whose members cluster in a
    direction shows cos near 1 (and drift as a drop); a label with no
    geometric structure — like this corpus's uniform synthetic labels —
    shows the half-centroids as uncorrelated noise residues, cos near 0,
    which is itself the useful diagnostic ("label carries no direction").

    Plan: posexplode to (label, half, dim) rows -> ONE partial-aggregated
    shuffle of per-dim sums (the same centroid shape as `label_centroids` /
    `kmeans_refine_step`) -> the cosine assembles from the K x 2 x {EMB_DIM}
    bounded centroid table.  Centroids round to 6 dp in BOTH engines before
    the cosine so the gate compares identical doubles."""
    e = load_table(spark, sf_dir, "embeddings")
    dims = e.select(
        "label",
        (F.col("vec_id") % 2).alias("grp"),
        F.posexplode(as_double(F.col("embedding"))).alias("dim", "x"),
    )
    halves = dims.groupBy("label", "grp", "dim").agg(
        (F.round(F.avg("x"), 6) + 0.0).alias("c")
    )
    a = halves.filter(F.col("grp") == 0).select("label", "dim", F.col("c").alias("ca"))
    b = halves.filter(F.col("grp") == 1).select("label", "dim", F.col("c").alias("cb"))
    counts = e.groupBy("label").agg(
        F.sum(F.when(F.col("vec_id") % 2 == 0, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("vec_id") % 2 == 1, 1).otherwise(0)).cast("long").alias("n_b"),
    )
    paired = a.join(b, ["label", "dim"])
    cos = F.sum(F.col("ca") * F.col("cb")) / (
        F.sqrt(F.sum(F.col("ca") * F.col("ca"))) * F.sqrt(F.sum(F.col("cb") * F.col("cb")))
    )
    return (
        paired.groupBy("label")
        .agg(cos.alias("centroid_cos"))
        .join(F.broadcast(counts), "label")
        .select("label", "n_a", "n_b", "centroid_cos")
    )


# ---------------------------------------------------------------------------
# Embedding anisotropy (corpus-level embedding-space diagnostic)
# ---------------------------------------------------------------------------

_ANISO_UNIT = "list_transform(vec, x -> x / " + sql_norm("vec") + ")"


@query(
    "embedding_anisotropy",
    oracle=f"""
    WITH v AS MATERIALIZED (
        SELECT vec_id, {_ANISO_UNIT} AS unit
        FROM (SELECT vec_id, {sql_as_double("embedding")} AS vec FROM embeddings)
    ),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS n_vecs,
                     CAST(max(len(unit)) AS INT) AS dim FROM v),
    ex AS (
        SELECT g.i AS i, unit[g.i] AS x
        FROM v, unnest(generate_series(1, len(unit))) AS g(i)
    ),
    mu AS (
        SELECT i, sum(x) / (SELECT CAST(n_vecs AS DOUBLE) FROM stats) AS m
        FROM ex GROUP BY i
    )
    SELECT s.n_vecs, s.dim, (SELECT sum(m * m) FROM mu) AS anisotropy
    FROM stats s
    """,
)
def embedding_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anisotropy of the embedding space: E[cos(x, y)] over random vector
    pairs equals ||mean(unit_vectors)||^2 — a quadratic-pair quantity
    estimated in ONE linear scan (no pair join). High anisotropy means the
    embeddings occupy a narrow cone, which degrades cosine-based dedup and
    retrieval thresholds — this is the diagnostic run before trusting a
    NEAR_DUP_TAU on a new corpus.

    Scale: explode to (dim_index, component), one partial-aggregated
    group-by over at most `dim` groups, then a `dim`-row reduction; the
    vector count and dim ride along as a broadcast 1-row frame (no driver
    actions). The pairwise definition would cost |corpus|^2 cosines; this
    is O(|corpus| * dim) with no shuffle wider than the dimension count.
    Op order mirrors the oracle exactly (sum / n, then m*m, then sum) so
    the raw doubles agree to the gate's normalization."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select("vec_id", as_double(F.col("embedding")).alias("vec"))
    unit = F.transform("vec", lambda x: x / norm(F.col("vec")))
    stats = v.agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.max(F.size("vec")).cast("int").alias("dim"),
    )
    ex = v.select(F.posexplode(unit).alias("i0", "x")).select(
        (F.col("i0") + 1).alias("i"), "x"
    )
    mu = (
        ex.crossJoin(F.broadcast(stats))
        .groupBy("i")
        .agg(
            (F.sum("x") / F.any_value(F.col("n_vecs").cast("double"))).alias("m"),
            F.any_value("n_vecs").alias("n_vecs"),
            F.any_value("dim").alias("dim"),
        )
    )
    return mu.agg(
        F.any_value("n_vecs").alias("n_vecs"),
        F.any_value("dim").alias("dim"),
        F.sum(F.col("m") * F.col("m")).alias("anisotropy"),
    )


# ---------------------------------------------------------------------------
# Matryoshka truncation eval (recall cost of prefix-dimension embeddings)
# ---------------------------------------------------------------------------

MRL_DIM = 16  # retrieval on the first 16 of 64 dims


@query(
    "mrl_truncation_eval",
    oracle=f"""
    WITH {_V_CTE},
    tv AS (SELECT vec_id, vec[1:{MRL_DIM}] AS tvec FROM v),
    gt AS MATERIALIZED (
        SELECT query_id, vec_id FROM (
            SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
                   row_number() OVER (PARTITION BY a.vec_id
                                      ORDER BY {_COS_AB} DESC, b.vec_id) AS rn
            FROM v a JOIN v b ON b.vec_id <> a.vec_id
            WHERE a.vec_id < {N_QUERIES}
        ) WHERE rn <= {TOP_K}
    ),
    ap AS MATERIALIZED (
        SELECT query_id, vec_id FROM (
            SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
                   row_number() OVER (PARTITION BY a.vec_id
                                      ORDER BY {sql_cosine("a.tvec", "b.tvec")} DESC,
                                               b.vec_id) AS rn
            FROM tv a JOIN tv b ON b.vec_id <> a.vec_id
            WHERE a.vec_id < {N_QUERIES}
        ) WHERE rn <= {TOP_K}
    ),
    hits AS (
        SELECT gt.query_id,
               CAST(sum(CASE WHEN ap.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hits,
               count(*) AS k
        FROM gt LEFT JOIN ap
          ON ap.query_id = gt.query_id AND ap.vec_id = gt.vec_id
        GROUP BY gt.query_id
    )
    SELECT query_id, n_hits, k,
           CAST(n_hits AS DOUBLE) / CAST(k AS DOUBLE) AS recall,
           avg(CAST(n_hits AS DOUBLE) / CAST(k AS DOUBLE)) OVER () AS mean_recall
    FROM hits
    """,
)
def mrl_truncation_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-representation truncation eval: recall@{TOP_K} of
    brute-force retrieval on the first {MRL_DIM} of {EMB_DIM} dims against
    full-dimension ground truth — the acceptance gate for serving
    prefix-truncated embeddings (MRL, Kusupati et al.), which cut index
    memory and distance cost {EMB_DIM // MRL_DIM}x when the recall holds.
    Same constant-size evaluation shape as `ann_recall_eval`: both join
    inputs are (queries x k)-row top-k tables regardless of corpus scale.
    On THIS corpus the embeddings are near-isotropic (no energy
    concentration in the prefix — see `embedding_pca_covariance`), so
    truncation recall is structurally low; on MRL-trained production
    embeddings the same gate reads near 1.0. The gate measures the
    embedding-vs-serving fit, it does not assert a threshold."""
    v = _vectors(spark, sf_dir)
    tv = v.select(
        "vec_id", F.slice("vec", 1, MRL_DIM).alias("tvec")
    ).withColumn("tnrm", norm(F.col("tvec")))

    def _topk(frame: DataFrame, vec_col: str, nrm_col: str) -> DataFrame:
        q = frame.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.col(nrm_col).alias("qn"),
        )
        scored = frame.join(
            F.broadcast(q), F.col("vec_id") != F.col("query_id")
        ).withColumn(
            "cos",
            dot(F.col("qv"), F.col(vec_col)) / (F.col("qn") * F.col(nrm_col)),
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= TOP_K)
            .select("query_id", "vec_id")
        )

    gt = _topk(v, "vec", "nrm")
    ap = _topk(tv, "tvec", "tnrm").select(
        "query_id", F.col("vec_id").alias("ap_vec_id")
    )
    hits = (
        gt.join(
            ap,
            (gt["query_id"] == ap["query_id"]) & (gt["vec_id"] == ap["ap_vec_id"]),
            "left",
        )
        .select(gt["query_id"], F.col("ap_vec_id").isNotNull().cast("int").alias("hit"))
        .groupBy("query_id")
        .agg(
            F.sum("hit").cast("long").alias("n_hits"),
            F.count(F.lit(1)).cast("long").alias("k"),
        )
        .withColumn(
            "recall", F.col("n_hits").cast("double") / F.col("k").cast("double")
        )
    )
    return hits.withColumn(
        "mean_recall", F.avg("recall").over(Window.partitionBy())
    )


# ---------------------------------------------------------------------------
# embedding_norm_audit
# ---------------------------------------------------------------------------

_NORM_EPS = 1e-12


@query(
    "embedding_norm_audit",
    oracle=f"""
    WITH {_V_CTE},
    n2 AS MATERIALIZED (
        SELECT vec_id, {sql_dot("v.vec", "v.vec")} AS norm2 FROM v
    ),
    deg AS (
        SELECT CAST(sum(CASE WHEN norm2 < {_NORM_EPS} THEN 1 ELSE 0 END) AS BIGINT)
            AS n_degenerate
        FROM n2
    )
    SELECT CAST(floor(norm2) AS BIGINT) AS norm2_band,
           CAST(count(*) AS BIGINT) AS n_vectors,
           d.n_degenerate
    FROM n2 CROSS JOIN deg d
    GROUP BY 1, d.n_degenerate
    """,
)
def embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding health check: the histogram of squared L2 norms (unit-width
    bands) plus a count of degenerate (near-zero) vectors — the first
    thing to look at when retrieval quality drops: all-zero vectors from a
    failed encoder batch, un-normalized vectors mixed into a normalized
    index, or fp16 underflow all show up here before any downstream metric
    moves. Norm² is the exact left-to-right dot accumulation (bit-identical
    cross-engine), and integer banding makes the histogram hash-stable.

    Scale: one projection per vector (no pairs, no index), one
    partial-agg histogram; the degenerate count is a 1-row broadcast."""
    v = _vectors(spark, sf_dir)
    n2 = v.select("vec_id", dot(F.col("vec"), F.col("vec")).alias("norm2"))
    deg = n2.agg(
        F.sum(F.when(F.col("norm2") < _NORM_EPS, 1).otherwise(0))
        .cast("long")
        .alias("n_degenerate")
    )
    return (
        n2.crossJoin(F.broadcast(deg))
        .groupBy(
            F.floor("norm2").cast("long").alias("norm2_band"), "n_degenerate"
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
        .select("norm2_band", "n_vectors", "n_degenerate")
    )


# ---------------------------------------------------------------------------
# ivf_cell_balance — is the coarse quantizer's load balanced, or do hot
# cells serialize the serving tail?
# ---------------------------------------------------------------------------


@query(
    "ivf_cell_balance",
    oracle=f"""
    WITH {_V_CTE},
    cent AS (SELECT vec_id AS cid, vec FROM v
             WHERE vec_id >= {IVF_CENTROIDS[0]} AND vec_id < {IVF_CENTROIDS[1]}),
    assign AS (
        SELECT vec_id, cid FROM (
            SELECT a.vec_id, b.cid,
                   row_number() OVER (PARTITION BY a.vec_id
                                      ORDER BY {sql_cosine("a.vec", "b.vec")} DESC, b.cid) AS rn
            FROM v a JOIN cent b ON true
        ) WHERE rn = 1
    ),
    sz AS (
        SELECT c.cid, CAST(count(a.vec_id) AS BIGINT) AS n_vectors
        FROM cent c LEFT JOIN assign a ON a.cid = c.cid
        GROUP BY c.cid
    ),
    tot AS (SELECT sum(n_vectors) AS n_total, count(*) AS n_cells FROM sz)
    SELECT sz.cid, sz.n_vectors,
           CAST(sz.n_vectors AS DOUBLE) / t.n_total AS cell_share,
           CAST(sz.n_vectors AS DOUBLE) * t.n_cells / t.n_total AS load_factor,
           max(CAST(sz.n_vectors AS DOUBLE) * t.n_cells / t.n_total) OVER ()
               AS hot_factor
    FROM sz CROSS JOIN tot t
    """,
)
def ivf_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load-balance audit for the IVF coarse quantizer: per cell, the
    assigned vector count, its share, and its load factor (1.0 = perfectly
    balanced), plus the corpus-wide hot factor (the max load). A skewed
    quantizer makes probe latency bimodal — queries routed to a hot cell
    scan many times the average — and at write time a hot cell becomes the
    straggler partition of the partitionBy(cid) layout `ann_ivf_topk`
    ships. This is the index-side companion of `ann_probe_recall_curve`:
    that query tunes how MANY cells to probe, this one shows whether the
    cells are worth probing uniformly. Empty cells surface as n_vectors=0
    rows (wasted centroids), not absent rows.

    Scale shape: the assignment is the shared broadcast-centroid argmax;
    the audit itself is one partial-aggregated count per cid joined back
    to the 10-row centroid table, with the totals riding a broadcast
    1-row frame and the hot factor a centroid-cardinality window."""
    v = _vectors(spark, sf_dir)
    cent = v.filter(
        (F.col("vec_id") >= IVF_CENTROIDS[0]) & (F.col("vec_id") < IVF_CENTROIDS[1])
    ).select(F.col("vec_id").alias("cid"), F.col("vec").alias("cvec"), F.col("nrm").alias("cnrm"))
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("acid"))
    assign = (
        v.join(F.broadcast(cent.select(F.col("cid").alias("acid"), "cvec", "cnrm")))
        .withColumn(
            "ccos", dot(F.col("vec"), F.col("cvec")) / (F.col("nrm") * F.col("cnrm"))
        )
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("acid").alias("cid"))
    )
    sz = (
        cent.select("cid")
        .join(assign, "cid", "left")
        .groupBy("cid")
        .agg(F.count("vec_id").cast("long").alias("n_vectors"))
    )
    tot = sz.agg(
        F.sum("n_vectors").alias("n_total"), F.count(F.lit(1)).alias("n_cells")
    )
    load = F.col("n_vectors").cast("double") * F.col("n_cells") / F.col("n_total")
    return (
        sz.crossJoin(F.broadcast(tot))
        .select(
            "cid",
            "n_vectors",
            (F.col("n_vectors").cast("double") / F.col("n_total")).alias("cell_share"),
            load.alias("load_factor"),
            F.max(load).over(Window.partitionBy()).alias("hot_factor"),
        )
    )


# ---------------------------------------------------------------------------
# in_context_packing_plan — semantic packing of related documents into
# shared context windows (in-context pretraining)
# ---------------------------------------------------------------------------

CTX_DOCS = 4  # documents packed per context window


@query(
    "in_context_packing_plan",
    oracle=f"""
    WITH {_V_CTE},
    c AS (SELECT vec_id - {IVF_CENTROIDS[0]} AS cluster_id, vec FROM v
          WHERE vec_id >= {IVF_CENTROIDS[0]} AND vec_id < {IVF_CENTROIDS[1]}),
    assign AS (
        SELECT a.vec_id, c.cluster_id,
               {sql_cosine("a.vec", "c.vec")} AS ccos,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY {sql_cosine("a.vec", "c.vec")} DESC,
                                           c.cluster_id) AS rn
        FROM v a, c
    ),
    m AS (
        SELECT v.vec_id, a.cluster_id, a.ccos, v.vec
        FROM v JOIN (SELECT vec_id, cluster_id, ccos FROM assign WHERE rn = 1) a
          USING (vec_id)
    ),
    ctx AS (
        SELECT vec_id, cluster_id, vec,
               CAST((row_number() OVER (PARTITION BY cluster_id
                                        ORDER BY ccos DESC, vec_id) - 1)
                    // {CTX_DOCS} AS BIGINT) AS ctx_seq
        FROM m
    ),
    sizes AS (SELECT cluster_id, ctx_seq, CAST(count(*) AS BIGINT) AS n_docs
              FROM ctx GROUP BY 1, 2),
    pairs AS (
        SELECT a.cluster_id, a.ctx_seq, {_COS_AB} AS pcos
        FROM ctx a JOIN ctx b
          ON a.cluster_id = b.cluster_id AND a.ctx_seq = b.ctx_seq
             AND a.vec_id < b.vec_id
    ),
    ps AS (SELECT cluster_id, ctx_seq,
                  round(avg(pcos), 6) + 0.0 AS mean_pair_cos,
                  round(min(pcos), 6) + 0.0 AS min_pair_cos
           FROM pairs GROUP BY 1, 2)
    SELECT s.cluster_id, s.ctx_seq, s.n_docs, ps.mean_pair_cos, ps.min_pair_cos
    FROM sizes s LEFT JOIN ps USING (cluster_id, ctx_seq)
    """,
)
def in_context_packing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-context pretraining packing plan (Shi et al. 2023, "In-Context
    Pretraining: Language Modeling Beyond Document Boundaries"): instead of
    concatenating RANDOM documents into a context window, pack RELATED
    ones — assign every embedding to its nearest coarse centroid (cosine
    argmax, deterministic tie-break), order each cluster most-central
    first, and cut consecutive runs of {CTX_DOCS} into context windows.
    Per context the plan reports its size and the mean/min pairwise member
    cosine — the packing-quality curve an operator compares against the
    random-packing baseline before paying the pretraining run. Tail
    contexts with one member publish NULL pair stats rather than faking a
    self-similarity of 1.

    Reuses the IVF coarse centroids (deterministic, oracle-reproducible);
    production feeds kmeans_refine_step's trained centroids. Scale shape:
    the K-centroid batch broadcasts and assignment is a per-row argmax (no
    vector shuffle); the within-cluster order window and the context
    rollup share one cluster_id exchange; member-pair scoring is an
    equi-join on (cluster, ctx_seq) with at most C(={CTX_DOCS},2) pairs
    per context — candidate volume is bounded by corpus size times a
    constant, never quadratic."""
    from datapipeline_ops_spark.operators.dedup import persist_barrier

    v = _vectors(spark, sf_dir)
    c = v.filter(
        (F.col("vec_id") >= IVF_CENTROIDS[0]) & (F.col("vec_id") < IVF_CENTROIDS[1])
    ).select(
        (F.col("vec_id") - IVF_CENTROIDS[0]).alias("cluster_id"),
        F.col("vec").alias("cvec"),
        F.col("nrm").alias("cnrm"),
    )
    scored = v.crossJoin(F.broadcast(c)).withColumn(
        "ccos", dot(F.col("vec"), F.col("cvec")) / (F.col("nrm") * F.col("cnrm"))
    )
    wa = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cluster_id"))
    m = (
        scored.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cluster_id", "ccos", "vec", "nrm")
    )
    wr = Window.partitionBy("cluster_id").orderBy(F.desc("ccos"), F.asc("vec_id"))
    ctx = persist_barrier(
        m.select(
            "vec_id",
            "cluster_id",
            "vec",
            "nrm",
            ((F.row_number().over(wr) - 1) / CTX_DOCS)
            .cast("bigint")
            .alias("ctx_seq"),
        ),
        "icp_ctx",
    )
    sizes = ctx.groupBy("cluster_id", "ctx_seq").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    a = ctx.select(
        "cluster_id", "ctx_seq",
        F.col("vec_id").alias("a_id"), F.col("vec").alias("a_vec"),
        F.col("nrm").alias("a_nrm"),
    )
    b = ctx.select(
        "cluster_id", "ctx_seq",
        F.col("vec_id").alias("b_id"), F.col("vec").alias("b_vec"),
        F.col("nrm").alias("b_nrm"),
    )
    ps = (
        a.join(b, ["cluster_id", "ctx_seq"])
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn(
            "pcos",
            dot(F.col("a_vec"), F.col("b_vec")) / (F.col("a_nrm") * F.col("b_nrm")),
        )
        .groupBy("cluster_id", "ctx_seq")
        .agg(
            (F.round(F.avg("pcos"), 6) + F.lit(0.0)).alias("mean_pair_cos"),
            (F.round(F.min("pcos"), 6) + F.lit(0.0)).alias("min_pair_cos"),
        )
    )
    return sizes.join(ps, ["cluster_id", "ctx_seq"], "left").select(
        "cluster_id", "ctx_seq", "n_docs", "mean_pair_cos", "min_pair_cos"
    )
