"""k-means training closure: the full Lloyd loop trained in-engine, plus
the apply half that assigns the corpus with the trained centroids.

This closes the last one-step trainer: ``kmeans_refine_step``
(queries/similarity.py) publishes ONE assign+update iteration; here the
engine trains the coarse quantizer to depth — the same train->apply
closure pattern as ``train_quality_classifier`` / ``trained_gate_impact``
(gradient descent) and ``bpe_train_loop`` / ``bpe_vocab_apply`` (BPE),
applied to clustering. Reference parity: the reference pipeline consumes
externally-trained cluster/codebook artifacts (e.g. the vendored model
configs under common/); this engine instead fits them where the data
lives, which is what a 100 TB curation stack needs from its quantizer.

Design (Lloyd, squared-L2):

- Stage i holds centroids c_i (c_0 = the IVF seed vectors, vec_id in
  ``IVF_CENTROIDS``). The K x dim centroid matrix is a BOUNDED model
  artifact, held driver-side and embedded as one literal
  array<struct<cid,cvec>> per stage (the Spark MLlib KMeans topology).
  Assignment is then a per-row argmin against the in-plan batch —
  ``array_min(transform(cents, c -> struct(sqdist, cid)))`` — a
  zero-shuffle, zero-join narrow projection (no N x K row explosion, no
  window shuffle; contrast kmeans_refine_step's window-over-vec_id form,
  which this loop deliberately avoids).
- The update posexplodes members to (cluster, dim, x), partial-aggregates
  map-side down to K x dim cells, and collects the rounded centroid
  matrix back to the driver — the only exchange per stage carries
  K*dim*partitions cells, never vectors, and the collect moves K x dim
  doubles (a model artifact, same audited-bounded class as the capped-CC
  and Elo collect sites — not a data collect). Clusters that lose every
  member keep their previous centroid (dict carry-over, mirroring the
  oracle's left-join coalesce) in BOTH engines.
- Centroid components round to 6 dp (+0.0) after every update so both
  engines walk the identical trajectory (the GD-loop precedent); argmin
  ties break on cluster_id over bit-identical distances (same IEEE fold
  order as the DuckDB mirror, see functions/vectors.py).
- Driver-side centroids are also the lineage cut: every stage's plan is
  flat (cached scan + literals), dodging both the O(2^k) recompute of a
  frame-chained unroll AND its Catalyst re-analysis cost (the
  persist/checkpoint-chained forms of this loop measured ~29 s and ~14 s
  wall for a 0.2 s data problem; this form runs ~3 s). Plain-Python
  state can't ride sameSemantics, so the loop memoizes per
  (session, sf_dir) — the _bpe_run_loop precedent — and apply never
  retrains.
- Lloyd guarantees inertia(stage i+1) <= inertia(stage i) in exact
  arithmetic; 6-dp centroid rounding perturbs it by <= N*dim*(5e-7)^2
  (~1e-11 here) — far inside the invariant audit's monotone tolerance,
  so ``inertia`` is pinned monotone non-increasing across stages.

Scale: the corpus projection (vec_id, vec) persists ONCE; each stage is
two passes over it (stats, update) with the centroid batch shipped in the
plan — depth-k training costs 2k+1 fact scans and never shuffles a
vector. At 1000 executors the posexplode update is the textbook
partial-agg reduction; the K x dim centroid matrix stays driver-tiny
(10 x 64 doubles).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.functions.vectors import as_double, sqdist, sql_sqdist
from datapipeline_ops_spark.operators.dedup import persist_barrier
from datapipeline_ops_spark.queries.similarity import _V_CTE, EMB_DIM, IVF_CENTROIDS
from datapipeline_ops_spark.tables import load_table, local_frame

# Unrolled Lloyd update steps; stages 0.._KM_ITERS publish (k+1 rows).
_KM_ITERS = 5


def _km_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return persist_barrier(
        e.select("vec_id", as_double(F.col("embedding")).alias("vec")), "km_v"
    )


def _km_lit_spine(cents_py: dict[int, list[float]]):
    """Driver-held centroid dict -> one literal array<struct<cid,cvec>>
    expression. K x dim is a BOUNDED model artifact (10 x 64 doubles), so
    carrying it as plan literals is the Spark MLlib KMeans topology —
    each task evaluates the argmin against the in-plan batch with zero
    joins and zero extra jobs. Past ~10^4 cells, switch to a broadcast
    1-row frame instead (plan-size, not correctness, is the limit)."""
    # ONE F.expr parse, not K*dim F.lit calls: building 640 Column objects
    # costs ~650 py4j round-trips per spine (~1 s each on local[32]), which
    # dominated the loop; repr(float) round-trips exactly and SQL
    # string->DOUBLE casts are correctly rounded, so values are identical.
    if not cents_py:
        # seedless corpus (no vec_id in the seed range): a TYPED empty
        # batch, so the argmin lambda still analyzes and every assignment
        # is NULL — mirroring the oracle's empty cent0 (NULL stats rows,
        # zero apply rows after the NULL filter)
        return F.expr(
            "CAST(array() AS array<struct<cid:bigint,cvec:array<double>>>)"
        )
    parts = []
    for cid, vec in sorted(cents_py.items()):
        arr = ", ".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in vec)
        parts.append(
            f"named_struct('cid', CAST({int(cid)} AS BIGINT), 'cvec', array({arr}))"
        )
    return F.expr("array(" + ", ".join(parts) + ")")


def _km_best(vec_col, cents_col):
    """Per-row argmin: struct(dist, cid) minimum over the centroid array —
    lexicographic struct order gives min-dist with cid tie-break, matching
    the oracle's ORDER BY dist, cluster_id exactly (bit-identical dists)."""
    return F.array_min(
        F.transform(
            cents_col,
            lambda c: F.struct(
                sqdist(vec_col, c["cvec"]).alias("dist"), c["cid"].alias("cid")
            ),
        )
    )


# Session-scoped memo for the trained Lloyd state (the _bpe_run_loop
# precedent): centroid frames are localCheckpoint-backed — the lineage cut
# keeps every stage's logical plan flat (the persist-chained form spent
# ~25 s in Catalyst re-analysis of the growing argmin expression trees for
# a 0.2 s data problem) — so cross-query reuse can't ride sameSemantics
# and needs an explicit memo. Keyed by (applicationId, sf_dir); cleared by
# clear_barriers() so bench repeats stay cold.
_KM_MEMO: dict = {}


def _km_memo_clear() -> None:
    _KM_MEMO.clear()


def _km_run(spark: SparkSession, sf_dir: str):
    """Run the {_KM_ITERS}-update Lloyd loop; return (centroid frames
    c_0..c_k, per-stage stats frames). Shared by kmeans_train_loop and
    kmeans_assign_apply — memoized per session+dir, so the apply query
    reuses the trained centroids instead of re-clustering."""
    from datapipeline_ops_spark.operators.dedup import register_clear_hook

    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _KM_MEMO.get(key)
    if hit is not None:
        return hit
    register_clear_hook(_km_memo_clear)
    v = _km_v(spark, sf_dir)
    # Seed pull: K x dim doubles to the driver — a bounded model artifact
    # (same class as the audited capped-CC/Elo collect sites), NOT a data
    # collect; this is exactly where Spark MLlib's KMeans keeps centroids.
    seeds = v.filter(
        (F.col("vec_id") >= IVF_CENTROIDS[0]) & (F.col("vec_id") < IVF_CENTROIDS[1])
    ).select(
        (F.col("vec_id") - IVF_CENTROIDS[0]).alias("cluster_id"),
        F.col("vec").alias("cvec"),
    ).collect()
    cents: list[dict[int, list[float]]] = [
        {int(r["cluster_id"]): list(r["cvec"]) for r in seeds}
    ]
    stage_rows = []
    for i in range(_KM_ITERS + 1):
        cur = _km_best(F.col("vec"), _km_lit_spine(cents[i]))
        if i == 0:
            scored = v.select(cur.alias("b"))
            moved = F.lit(0).cast("long")
        else:
            # prev assignment recomputes in the SAME narrow pass from the
            # previous literal batch — n_moved costs no join
            prev = _km_best(F.col("vec"), _km_lit_spine(cents[i - 1]))
            scored = v.select(cur.alias("b"), prev.alias("pb"))
            moved = F.sum((F.col("b.cid") != F.col("pb.cid")).cast("int")).cast("long")
        stats = scored.agg(
            (F.round(F.sum("b.dist"), 6) + F.lit(0.0)).alias("inertia"),
            F.count_distinct(F.col("b.cid")).cast("long").alias("n_active"),
            moved.alias("n_moved"),
        )
        stage_rows.append(
            stats.select(F.lit(i).alias("iter"), "inertia", "n_active", "n_moved")
        )
        if i < _KM_ITERS:
            # ONE job per stage: argmin-assign (narrow) -> posexplode ->
            # map-side partial agg down to K x dim cells -> collect the new
            # (rounded-in-Spark) centroid matrix
            means = (
                v.select(cur["cid"].alias("cid"), "vec")
                .select("cid", F.posexplode("vec").alias("dim", "x"))
                .groupBy("cid", "dim")
                .agg((F.round(F.avg("x"), 6) + F.lit(0.0)).alias("c"))
            ).collect()
            nxt = {cid: list(vec) for cid, vec in cents[i].items()}
            by_cid: dict[int, dict[int, float]] = {}
            for r in means:
                if r["cid"] is None:
                    continue  # seedless corpus: every assignment is NULL
                by_cid.setdefault(int(r["cid"]), {})[int(r["dim"])] = r["c"]
            for cid, dims in by_cid.items():
                # drained clusters keep their previous centroid (mirrors the
                # oracle's left-join coalesce)
                nxt[cid] = [dims[d] for d in range(len(dims))]
            cents.append(nxt)
    _KM_MEMO[key] = (cents, stage_rows)
    return cents, stage_rows


def _km_ctes() -> tuple[list[str], list[str]]:
    """Unrolled MATERIALIZED-CTE Lloyd mirror: cent{i} the stage centroids,
    a{i} the argmin assignment at those centroids; second list holds the
    per-stage stats SELECTs. Distances use the same left-to-right double
    fold as the Spark side, so argmin tie-breaks agree exactly."""
    k0, k1 = IVF_CENTROIDS
    d = sql_sqdist("x.vec", "c.cvec")
    parts = [
        _V_CTE.strip(),
        f"""cent0 AS MATERIALIZED (
        SELECT vec_id - {k0} AS cluster_id, vec AS cvec
        FROM v WHERE vec_id >= {k0} AND vec_id < {k1})""",
    ]
    rows = []
    for i in range(_KM_ITERS + 1):
        parts.append(f"""a{i} AS MATERIALIZED (
        SELECT vec_id, cluster_id, dist FROM (
            SELECT x.vec_id, c.cluster_id, {d} AS dist,
                   row_number() OVER (PARTITION BY x.vec_id
                                      ORDER BY {d}, c.cluster_id) AS rn
            FROM v x, cent{i} c) WHERE rn = 1)""")
        if i == 0:
            rows.append(
                "(SELECT 0 AS iter, round(sum(dist), 6) + 0e0 AS inertia,"
                " CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_active,"
                " CAST(0 AS BIGINT) AS n_moved FROM a0)"
            )
        else:
            rows.append(f"""(SELECT {i} AS iter,
               round(sum(a.dist), 6) + 0e0 AS inertia,
               CAST(count(DISTINCT a.cluster_id) AS BIGINT) AS n_active,
               CAST(sum(CASE WHEN a.cluster_id <> p.cluster_id
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
        FROM a{i} a JOIN a{i - 1} p USING (vec_id))""")
        if i < _KM_ITERS:
            parts.append(f"""mean{i} AS (
        SELECT a.cluster_id, d.dim, round(avg(x.vec[d.dim + 1]), 6) + 0e0 AS c
        FROM a{i} a JOIN v x USING (vec_id),
             LATERAL (SELECT unnest(generate_series(0, {EMB_DIM} - 1)) AS dim) d
        GROUP BY 1, 2)""")
            parts.append(f"""cent{i + 1} AS MATERIALIZED (
        SELECT p.cluster_id, coalesce(m.cvec, p.cvec) AS cvec
        FROM cent{i} p LEFT JOIN (SELECT cluster_id, list(c ORDER BY dim) AS cvec
                                  FROM mean{i} GROUP BY 1) m
          ON p.cluster_id = m.cluster_id)""")
    return parts, rows


def _km_train_oracle() -> str:
    parts, rows = _km_ctes()
    return "WITH " + ",\n    ".join(parts) + "\n" + "\nUNION ALL\n".join(rows)


def _km_apply_oracle() -> str:
    parts, _ = _km_ctes()
    return (
        "WITH " + ",\n    ".join(parts) + f"""
    SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
           round(sum(dist), 6) + 0e0 AS cluster_inertia,
           round(avg(dist), 6) + 0e0 AS mean_dist
    FROM a{_KM_ITERS} GROUP BY cluster_id"""
    )


@query("kmeans_train_loop", oracle=_km_train_oracle())
def kmeans_train_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the IVF coarse quantizer in-engine: {_KM_ITERS} unrolled Lloyd
    iterations (squared-L2) from the IVF seed centroids, publishing one row
    per stage — the inertia AT that stage's centroids (monotone
    non-increasing; invariant-pinned), the number of clusters holding at
    least one member, and how many vectors changed assignment versus the
    previous stage (the convergence signal an operator watches).

    Stage 1's assign+update is semantically `kmeans_refine_step` with the
    L2 metric; this loop is the to-convergence closure, with assignment as
    a zero-shuffle broadcast-spine argmin rather than a window shuffle.
    See the module docstring for the full scale design."""
    _, stage_rows = _km_run(spark, sf_dir)
    out = stage_rows[0]
    for r in stage_rows[1:]:
        out = out.unionByName(r)
    return out


def _km_apply_rollup(scored: DataFrame) -> DataFrame:
    """(cluster_id, dist) rows -> the per-cluster compactness report shared
    by the in-lineage and artifact applies. NULL cluster_ids (seedless
    corpus: argmin over an empty batch) drop, matching the oracle's
    inner-join-through-argmin shape (zero rows, not a NULL group)."""
    return scored.filter(F.col("cluster_id").isNotNull()).groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        (F.round(F.sum("dist"), 6) + F.lit(0.0)).alias("cluster_inertia"),
        (F.round(F.avg("dist"), 6) + F.lit(0.0)).alias("mean_dist"),
    )


@query("kmeans_assign_apply", oracle=_km_apply_oracle())
def kmeans_assign_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign the corpus with the centroids `kmeans_train_loop` just
    trained — the apply half of the clustering train->apply closure: per
    surviving cluster, the member count, the summed squared distance, and
    the mean distance (cell balance + compactness, the report that decides
    whether the quantizer is fit to serve ``ann_ivf_topk``). Cross-query
    identities pin this to the final training stage: row count ==
    `n_active`, and the cluster inertias sum back to the stage-{_KM_ITERS}
    `inertia` (within 6-dp rounding of the K parts).

    Scale: ONE more zero-shuffle argmin pass over the persisted corpus
    projection with the final K-centroid spine broadcast, rolled up by
    cluster with map-side combine; the train state itself is reused via
    the loop's persist_barrier sites, so apply never re-clusters."""
    cents, _ = _km_run(spark, sf_dir)
    v = _km_v(spark, sf_dir)
    b = _km_best(F.col("vec"), _km_lit_spine(cents[-1]))
    return _km_apply_rollup(
        v.select(b["cid"].alias("cluster_id"), b["dist"].alias("dist"))
    )


@query("kmeans_artifact_apply", oracle=_km_apply_oracle())
def kmeans_artifact_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`kmeans_assign_apply`, operationalized: write the trained centroid
    matrix to parquet (the model registry) and assign the corpus FROM THE
    FILE — completing the artifact seam across all three in-engine
    trainers (GD weights, BPE vocab, and now the quantizer centroids).
    Unlike the in-lineage apply's plan-literal batch, here the K-row
    centroid table enters the plan as a parquet scan collapsed to a 1-row
    array<struct> spine and broadcast onto the corpus — the serving job
    never sees the training loop. Same oracle as the in-lineage apply; a
    cross-query identity pins the two row-equal across the serialization
    seam (doubles round-trip parquet bit-exactly).

    Scale: the artifact is K x dim doubles; the apply is one broadcast
    nested-loop of a 1-row spine onto the corpus scan — zero shuffles
    before the K-row rollup, training cluster out of the serving path."""
    from datapipeline_ops_spark.queries.lm_quality import _artifact_path

    cents, _ = _km_run(spark, sf_dir)
    rows = [(int(cid), list(vec)) for cid, vec in sorted(cents[-1].items())]
    cent_df = local_frame(spark, rows, "cluster_id long, cvec array<double>")
    path = _artifact_path(sf_dir, "kmeans_centroids")
    cent_df.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    spine = back.agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("cluster_id").alias("cid"), F.col("cvec").alias("cvec"))
            )
        ).alias("cents")
    )
    v = _km_v(spark, sf_dir)
    b = _km_best(F.col("vec"), F.col("cents"))
    return _km_apply_rollup(
        v.crossJoin(F.broadcast(spine)).select(
            b["cid"].alias("cluster_id"), b["dist"].alias("dist")
        )
    )
