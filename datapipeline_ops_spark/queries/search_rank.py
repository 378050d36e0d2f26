"""Search-ranking primitives: BM25 scoring, inverted-index construction, and
ANN recall evaluation.

Retrieval is half of a modern data pipeline — curation mines "documents like
these" (BM25/keyword recall feeding embedding rerank), and every ANN index
the pipeline ships needs a measured recall number against exact search
before anyone trusts it.  All three queries are pure DataFrame plans.

Scale design:
- BM25: one explode+group shuffle for term frequencies (only the query's
  terms survive the filter, so the exploded stream is tiny), corpus-level
  stats broadcast back as a 1-row join, final top-k via per-partition
  TakeOrdered merge — no global sort.
- Inverted index: per-token top-k postings WITHOUT a window — a window
  partitioned by token collapses every posting of a hot token ("the" at 5 B
  docs) onto one reducer.  Instead: shard each token's postings 32 ways,
  take a local top-k per shard with array_sort over the collected shard
  (bounded: shard top-k only), then merge the 32 bounded lists per token.
  Both shuffles carry (token, shard)-grained rows.
- Recall eval: composes the registered exact and IVF retrieval plans and
  joins their (query, id) sets — the joins are on the tiny result tables.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from datapipeline_ops_spark.core.registry import QUERIES, query
from datapipeline_ops_spark.functions.hashing import hash64, sql_hash64
from datapipeline_ops_spark.functions.vectors import as_double, sql_cosine
from datapipeline_ops_spark.tables import load_table, local_frame

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("spark", "join", "window")
BM25_TOPK = 20
POSTINGS_K = 5
POSTINGS_SHARDS = 32


def _terms_sql() -> str:
    return ", ".join(f"'{t}'" for t in BM25_TERMS)


@query(
    "bm25_topk",
    oracle=f"""
    WITH toks AS MATERIALIZED (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
        FROM documents
    ),
    dl AS MATERIALIZED (SELECT doc_id, CAST(len(words) AS BIGINT) AS dl FROM toks),
    tf AS MATERIALIZED (
        SELECT doc_id, token, count(*) AS tf
        FROM toks, unnest(words) AS u(token)
        WHERE token IN ({_terms_sql()})
        GROUP BY doc_id, token
    ),
    df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                     avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
    scored AS (
        SELECT tf.doc_id,
               sum(ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                   * (CAST(tf.tf AS DOUBLE) * ({BM25_K1} + 1.0))
                   / (CAST(tf.tf AS DOUBLE)
                      + {BM25_K1} * (1.0 - {BM25_B}
                                     + {BM25_B} * CAST(dl.dl AS DOUBLE) / s.avgdl))
               ) AS score,
               count(*) AS n_terms_hit
        FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats s
        GROUP BY tf.doc_id
    )
    SELECT doc_id, scored.score AS score, n_terms_hit
    FROM scored ORDER BY scored.score DESC, doc_id LIMIT {BM25_TOPK}
    """,
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1={BM25_K1}, b={BM25_B}) ranking of the corpus for the fixed
    keyword query {BM25_TERMS}, top-{BM25_TOPK} with doc_id tie-break.  The
    per-term filter runs INSIDE the explode so only query-term tokens are
    ever shuffled; document length and corpus stats join back broadcast."""
    from datapipeline_ops_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("words")
    )
    dl = d.select("doc_id", F.size("words").cast("long").alias("dl"))
    tf = (
        d.select("doc_id", F.explode("words").alias("token"))
        .filter(F.col("token").isin(*BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    contrib = idf * (
        F.col("tf").cast("double") * (BM25_K1 + 1.0)
    ) / (
        F.col("tf").cast("double")
        + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl").cast("double") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(df), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(contrib).alias("score"), F.count(F.lit(1)).alias("n_terms_hit"))
    )
    # Raw score on both sides (gate hasher normalizes to 6 sig figs): an
    # in-engine round(,6) reintroduces the .5e-6 half-boundary divergence,
    # and ordering by the rounded alias while ranking by the raw score can
    # pick different doc_ids at a rounded-score tie on the top-k boundary.
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(BM25_TOPK)
        .select("doc_id", "score", "n_terms_hit")
    )


@query(
    "inverted_index_postings",
    oracle=f"""
    WITH tf AS MATERIALIZED (
        SELECT doc_id, token, count(*) AS tf
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
              FROM documents), unnest(words) AS u(token)
        GROUP BY doc_id, token
    ),
    ranked AS (
        SELECT token, doc_id, tf,
               row_number() OVER (PARTITION BY token
                                  ORDER BY tf DESC, doc_id) AS posting_rank,
               count(*) OVER (PARTITION BY token) AS df,
               CAST(sum(tf) OVER (PARTITION BY token) AS BIGINT) AS total_tf
        FROM tf
    )
    SELECT token, CAST(posting_rank AS INT) AS posting_rank, doc_id, tf,
           df, total_tf
    FROM ranked WHERE posting_rank <= {POSTINGS_K}
    """,
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: per token, document frequency, total term
    frequency, and the top-{POSTINGS_K} postings by tf (doc_id tie-break).

    The per-token top-k deliberately avoids ``row_number() OVER (PARTITION
    BY token)``: at corpus scale a stopword's partition is billions of rows
    on one reducer.  Instead postings shard {POSTINGS_SHARDS} ways by
    doc_id, each (token, shard) group keeps its local top-{POSTINGS_K} via
    array_sort+slice of the collected shard, and a second group-by merges
    the <= {POSTINGS_SHARDS}x{POSTINGS_K} bounded lists per token — the
    classic two-phase top-k-per-key.  The oracle is the window formulation
    (semantically identical; the oracle's data fits one node)."""
    from datapipeline_ops_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("words")
    )
    tf = (
        d.select("doc_id", F.explode("words").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # phase 1: bounded local top-k per (token, shard). The collected list is
    # one shard of one token's postings; the slice caps what leaves the agg.
    entry = F.struct((-F.col("tf")).alias("ntf"), F.col("doc_id").alias("doc_id"),
                     F.col("tf").alias("tf"))
    local = (
        tf.withColumn("shard", F.pmod(F.col("doc_id"), F.lit(POSTINGS_SHARDS)))
        .groupBy("token", "shard")
        .agg(
            F.slice(F.array_sort(F.collect_list(entry)), 1, POSTINGS_K).alias("top"),
            F.count(F.lit(1)).alias("df_part"),
            F.sum("tf").alias("tf_part"),
        )
    )
    # phase 2: merge the bounded shard lists; df/total_tf combine exactly.
    merged = local.groupBy("token").agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("top"))), 1, POSTINGS_K).alias("top"),
        F.sum("df_part").alias("df"),
        F.sum("tf_part").cast("long").alias("total_tf"),
    )
    return merged.select(
        "token",
        F.posexplode("top").alias("pos", "p"),
        "df",
        "total_tf",
    ).select(
        "token",
        (F.col("pos") + 1).cast("int").alias("posting_rank"),
        F.col("p.doc_id").alias("doc_id"),
        F.col("p.tf").alias("tf"),
        "df",
        "total_tf",
    )


@query(
    "ann_recall_eval",
    oracle=None,  # composed from the registered retrieval oracles below
)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF ANN path against exact brute-force ground truth,
    per query and macro-averaged — the acceptance gate for any approximate
    index the pipeline ships.  Composes the two registered retrieval plans
    and joins their id sets; every join input is a top-k result table
    (queries x k rows), so the evaluation is constant-sized regardless of
    corpus scale."""
    gt = QUERIES["cosine_topk_bruteforce"].fn(spark, sf_dir).select(
        "query_id", "vec_id"
    )
    ap = QUERIES["ann_ivf_topk"].fn(spark, sf_dir).select(
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


def _ann_recall_oracle() -> str:
    gt_sql = QUERIES["cosine_topk_bruteforce"].oracle
    ap_sql = QUERIES["ann_ivf_topk"].oracle
    return f"""
    WITH gt AS MATERIALIZED (SELECT query_id, vec_id FROM ({gt_sql})),
    ap AS MATERIALIZED (SELECT query_id, vec_id FROM ({ap_sql})),
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
    """


QUERIES["ann_recall_eval"].oracle = _ann_recall_oracle()


@query(
    "ann_ivfpq_recall_eval",
    oracle=None,  # composed from the registered retrieval oracles below
)
def ann_ivfpq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF-PQ path (coarse cells + asymmetric-distance
    shortlist + exact rerank) against brute-force ground truth — the
    acceptance gate that prices what PQ compression costs in answer
    quality next to plain IVF's `ann_recall_eval`. Same constant-size
    evaluation shape: both join inputs are (queries x k)-row top-k result
    tables regardless of corpus scale.

    Reading the numbers on THIS corpus: the synthetic embeddings are
    near-isotropic (see `embedding_anisotropy` / the 0.99 covariance
    eigengap), so single-cell IVF recall is structurally low (~0.1-0.24)
    and the 2-bit/4-entry PQ shortlist sits below it — which is precisely
    the regime this gate exists to expose before an index ships. On
    clustered production embeddings the same gate reads 0.9+; the query
    measures the index-vs-data fit, it does not assert a threshold."""
    gt = QUERIES["cosine_topk_bruteforce"].fn(spark, sf_dir).select(
        "query_id", "vec_id"
    )
    ap = QUERIES["ann_ivf_pq_topk"].fn(spark, sf_dir).select(
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


def _ann_ivfpq_recall_oracle() -> str:
    gt_sql = QUERIES["cosine_topk_bruteforce"].oracle
    ap_sql = QUERIES["ann_ivf_pq_topk"].oracle
    return f"""
    WITH gt AS MATERIALIZED (SELECT query_id, vec_id FROM ({gt_sql})),
    ap AS MATERIALIZED (SELECT query_id, vec_id FROM ({ap_sql})),
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
    """


QUERIES["ann_ivfpq_recall_eval"].oracle = _ann_ivfpq_recall_oracle()


# ---------------------------------------------------------------------------
# Hybrid retrieval fusion (BM25 + dense, reciprocal-rank fusion)
# ---------------------------------------------------------------------------

RRF_K = 60       # the standard RRF dampening constant (Cormack et al.)
RRF_TOPK = 10


def _rrf_oracle() -> str:
    from datapipeline_ops_spark.queries.similarity import _COS_AB, _V_CTE

    bm25_sql = QUERIES["bm25_topk"].oracle
    return f"""
    WITH {_V_CTE},
    b AS MATERIALIZED (
        SELECT doc_id,
               row_number() OVER (ORDER BY score DESC, doc_id) AS r
        FROM ({bm25_sql})
    ),
    c AS MATERIALIZED (
        SELECT doc_id, r FROM (
            SELECT b.vec_id AS doc_id,
                   row_number() OVER (ORDER BY {_COS_AB} DESC, b.vec_id) AS r
            FROM v a JOIN v b ON b.vec_id <> a.vec_id
            WHERE a.vec_id = 0
        ) WHERE r <= {RRF_TOPK}
    ),
    f AS (
        SELECT coalesce(b.doc_id, c.doc_id) AS doc_id,
               coalesce(1.0 / ({RRF_K} + b.r), 0)
                   + coalesce(1.0 / ({RRF_K} + c.r), 0) AS rrf_score,
               b.doc_id IS NOT NULL AS in_bm25,
               c.doc_id IS NOT NULL AS in_dense
        FROM b FULL OUTER JOIN c ON c.doc_id = b.doc_id
    )
    SELECT doc_id, rrf_score, in_bm25, in_dense, fused_rank FROM (
        SELECT *, CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id)
                       AS INT) AS fused_rank
        FROM f
    ) WHERE fused_rank <= {RRF_TOPK}
    """


@query("hybrid_rrf_fusion", oracle=None)  # composed below from bm25 oracle
def hybrid_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion — the modern search
    stack's default: a sparse ranking (the registered BM25 keyword run)
    and a dense ranking (exact cosine from query vector 0 over the
    aligned embedding corpus) merge by RRF, score = sum of
    1/({RRF_K}+rank) over the lists containing the doc. Rank-based fusion
    needs no score calibration between retrievers — the reason RRF beats
    score interpolation in production hybrid search. The arithmetic is
    exact rational division of small integers, so the fused scores and
    ordering are bit-identical cross-engine.

    Scale: both retriever outputs are top-k tables (constant size at any
    corpus scale); the fusion join and final ranking run on <= 2k rows."""
    from datapipeline_ops_spark.functions.vectors import dot
    from datapipeline_ops_spark.queries.similarity import _vectors

    bm25 = QUERIES["bm25_topk"].fn(spark, sf_dir)
    w_b = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    b = bm25.select("doc_id", F.row_number().over(w_b).alias("r_b"))

    v = _vectors(spark, sf_dir)
    q = v.filter(F.col("vec_id") == 0).select(
        F.col("vec").alias("qvec"), F.col("nrm").alias("qnrm")
    )
    w_c = Window.orderBy(F.desc("cos"), F.asc("doc_id"))
    c = (
        v.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            (dot(F.col("qvec"), F.col("vec")) / (F.col("qnrm") * F.col("nrm"))
             ).alias("cos"),
        )
        .withColumn("r_c", F.row_number().over(w_c))
        .filter(F.col("r_c") <= RRF_TOPK)
        .select("doc_id", "r_c")
    )
    f = (
        b.join(c, "doc_id", "full_outer")
        .select(
            "doc_id",
            (
                F.coalesce(F.lit(1.0) / (RRF_K + F.col("r_b")), F.lit(0.0))
                + F.coalesce(F.lit(1.0) / (RRF_K + F.col("r_c")), F.lit(0.0))
            ).alias("rrf_score"),
            F.col("r_b").isNotNull().alias("in_bm25"),
            F.col("r_c").isNotNull().alias("in_dense"),
        )
    )
    w_f = Window.orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return (
        f.withColumn("fused_rank", F.row_number().over(w_f))
        .filter(F.col("fused_rank") <= RRF_TOPK)
        .select("doc_id", "rrf_score", "in_bm25", "in_dense", "fused_rank")
    )


QUERIES["hybrid_rrf_fusion"].oracle = _rrf_oracle()


# ---------------------------------------------------------------------------
# ann_ndcg_eval — graded ranking quality of the IVF path vs exact cosine
# ---------------------------------------------------------------------------

_NDCG_K = 5
# 1/log2(rank+1) discount weights and the ideal DCG, precomputed in Python
# and embedded as LITERALS in both engines — log2(3) etc. computed engine-
# side could differ in the last ulp; a shared literal cannot.
_NDCG_W = [1.0 / math.log2(i + 1) for i in range(1, _NDCG_K + 1)]
_NDCG_IDEAL = sum((_NDCG_K + 1 - j) * _NDCG_W[j - 1] for j in range(1, _NDCG_K + 1))


@query(
    "ann_ndcg_eval",
    oracle=None,  # composed from the registered retrieval oracles below
)
def ann_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@{_NDCG_K} of the IVF ANN ranking against exact-cosine ground
    truth with GRADED relevance (rel of a doc = {_NDCG_K}+1 minus its exact
    rank; docs outside the exact top-{_NDCG_K} score 0) — the ranking-
    quality complement to ann_recall_eval's set-overlap: recall can't see
    that the approximate index returned the right docs in the wrong order,
    NDCG can.

    Exactness: relevance grades are integers, each discount weight and the
    ideal DCG are Python-precomputed literals shared by both engines, and
    per-query DCG is a literal-order weighted sum of {_NDCG_K} terms — no
    engine-ordered float accumulation (the rank-slot extraction is a
    conditional max per slot).

    Scale: both inputs are top-k result tables (queries x k rows); the
    whole evaluation is constant-sized."""
    gt = QUERIES["cosine_topk_bruteforce"].fn(spark, sf_dir).select(
        "query_id",
        "vec_id",
        (F.lit(_NDCG_K + 1) - F.col("rank")).alias("rel"),
    )
    ap = QUERIES["ann_ivf_topk"].fn(spark, sf_dir).select(
        "query_id", "vec_id", "rank"
    )
    j = ap.join(gt, ["query_id", "vec_id"], "left").select(
        "query_id", "rank", F.coalesce("rel", F.lit(0)).alias("rel")
    )
    slots = [
        F.max(F.when(F.col("rank") == i, F.col("rel"))).alias(f"r{i}")
        for i in range(1, _NDCG_K + 1)
    ]
    g = j.groupBy("query_id").agg(*slots)
    dcg = F.lit(0.0)
    for i in range(1, _NDCG_K + 1):
        dcg = dcg + F.coalesce(F.col(f"r{i}"), F.lit(0)).cast("double") * F.lit(
            _NDCG_W[i - 1]
        )
    out = g.select(
        "query_id", (dcg / F.lit(_NDCG_IDEAL)).alias("ndcg")
    )
    return out.withColumn(
        "mean_ndcg", F.avg("ndcg").over(Window.partitionBy())
    )


def _ann_ndcg_oracle() -> str:
    gt_sql = QUERIES["cosine_topk_bruteforce"].oracle
    ap_sql = QUERIES["ann_ivf_topk"].oracle
    slot_cols = ", ".join(
        f"max(CASE WHEN rank = {i} THEN rel END) AS r{i}"
        for i in range(1, _NDCG_K + 1)
    )
    dcg = " + ".join(
        f"CAST(coalesce(r{i}, 0) AS DOUBLE) * {_NDCG_W[i - 1]!r}"
        for i in range(1, _NDCG_K + 1)
    )
    return f"""
    WITH gt AS MATERIALIZED (
        SELECT query_id, vec_id, {_NDCG_K} + 1 - rank AS rel FROM ({gt_sql})
    ),
    ap AS MATERIALIZED (SELECT query_id, vec_id, rank FROM ({ap_sql})),
    j AS (
        SELECT ap.query_id, ap.rank, coalesce(gt.rel, 0) AS rel
        FROM ap LEFT JOIN gt
          ON gt.query_id = ap.query_id AND gt.vec_id = ap.vec_id
    ),
    slots AS (SELECT query_id, {slot_cols} FROM j GROUP BY query_id)
    SELECT query_id, ({dcg}) / {_NDCG_IDEAL!r} AS ndcg,
           avg(({dcg}) / {_NDCG_IDEAL!r}) OVER () AS mean_ndcg
    FROM slots
    """


QUERIES["ann_ndcg_eval"].oracle = _ann_ndcg_oracle()


# ---------------------------------------------------------------------------
# bradley_terry_strengths — preference-data fitting (2 MM iterations)
# ---------------------------------------------------------------------------

_BT_MATCHES = 5
_BT_SEED = 23
_BT_LAT_MOD = 400


@query(
    "bradley_terry_strengths",
    oracle=f"""
    WITH arms AS MATERIALIZED (
        SELECT source, {sql_hash64("source")} % {_BT_LAT_MOD} AS lat
        FROM documents GROUP BY source
    ),
    pairs AS MATERIALIZED (
        SELECT a.source AS si, b.source AS sj, a.lat AS li, b.lat AS lj,
               greatest(50, least(950, 500 + (a.lat - b.lat) // 2)) AS thr
        FROM arms a JOIN arms b ON a.source < b.source
    ),
    matches AS MATERIALIZED (
        SELECT si, sj,
               CASE WHEN {sql_hash64("si || '|' || sj || '|' || CAST(g.m AS VARCHAR)", _BT_SEED)}
                         % 1000 < thr THEN 1 ELSE 0 END AS i_wins
        FROM pairs, LATERAL unnest(generate_series(0, {_BT_MATCHES - 1})) AS g(m)
    ),
    w AS MATERIALIZED (
        SELECT source, CAST(sum(win) AS BIGINT) AS wins,
               CAST(count(*) AS BIGINT) AS n_matches
        FROM (
            SELECT si AS source, i_wins AS win FROM matches
            UNION ALL SELECT sj, 1 - i_wins FROM matches
        ) GROUP BY source
    ),
    opp AS MATERIALIZED (
        SELECT i.source AS si, i.wins AS wi, i.n_matches AS ni,
               array_agg({{'sj': j.source, 'wj': j.wins, 'nj': j.n_matches}}
                         ORDER BY j.source) AS js
        FROM w i JOIN w j ON j.source <> i.source
        GROUP BY i.source, i.wins, i.n_matches
    ),
    fit AS (
        SELECT si AS source, wi AS wins, ni AS n_matches,
               CAST(wi AS DOUBLE)
                   / list_sum(list_transform(js, x ->
                       {_BT_MATCHES}.0 / (2.0 * wi / ni + 2.0 * x.wj / x.nj)))
                   AS strength
        FROM opp
    )
    SELECT f.source, a.lat AS latent, f.wins, f.n_matches, f.strength,
           CAST(row_number() OVER (ORDER BY f.strength DESC, f.source) AS INT)
               AS rank
    FROM fit f JOIN arms a ON a.source = f.source
    """,
)
def bradley_terry_strengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley–Terry strength fitting from pairwise preferences — the model
    under RLHF reward-data aggregation, chatbot-arena rankings, and any
    'which output do you prefer' pipeline. Arms are the corpus sources; a
    deterministic match grid ({_BT_MATCHES} per pair, md5-stub outcomes
    biased by a latent per-arm strength — the seam where real human
    preference labels land) feeds two unrolled MM iterations
    (s_i <- W_i / Σ_j n_ij/(s_i+s_j); Hunter 2004). With s⁰ = 1 the first
    iteration is exactly 2·W_i/N_i, so the second — the emitted fit — is
    a ratio whose denominator is an ORDERED left-to-right fold over
    opponents (array_agg ORDER BY / sort_array + aggregate, the sql_dot
    discipline), making the float bit-identical cross-engine; the rank
    therefore ties out exactly.

    Scale: |arms|² match grid (bounded by the arm vocabulary, not the
    corpus), one win rollup, and an |arms|-row fold — preference fitting
    is cheap; the expensive part at 100 TB is the upstream label join,
    which is the same distinct-first collapse every eval here uses."""
    arms = (
        load_table(spark, sf_dir, "documents")
        .select("source")
        .distinct()
        .select("source", (hash64(F.col("source")) % _BT_LAT_MOD).alias("lat"))
    )
    a = arms.select(F.col("source").alias("si"), F.col("lat").alias("li"))
    b = arms.select(F.col("source").alias("sj"), F.col("lat").alias("lj"))
    pairs = a.join(F.broadcast(b), F.col("si") < F.col("sj")).select(
        "si",
        "sj",
        F.greatest(
            F.lit(50),
            F.least(
                F.lit(950),
                # `div` truncates toward zero, matching DuckDB's `//`
                # (-7 div 2 = -3 in both engines; F.floor(-7/2) would be -4
                # and shift thr by 1 for every negative odd latent delta).
                F.lit(500) + F.expr("(li - lj) div 2").cast("long"),
            ),
        ).alias("thr"),
    )
    matches = pairs.select(
        "si",
        "sj",
        "thr",
        F.explode(F.sequence(F.lit(0), F.lit(_BT_MATCHES - 1))).alias("m"),
    ).select(
        "si",
        "sj",
        F.when(
            hash64(
                F.concat_ws("|", "si", "sj", F.col("m").cast("string")), _BT_SEED
            )
            % 1000
            < F.col("thr"),
            1,
        )
        .otherwise(0)
        .alias("i_wins"),
    )
    w = (
        matches.select(F.col("si").alias("source"), F.col("i_wins").alias("win"))
        .unionAll(
            matches.select(F.col("sj").alias("source"), (1 - F.col("i_wins")).alias("win"))
        )
        .groupBy("source")
        .agg(
            F.sum("win").cast("long").alias("wins"),
            F.count(F.lit(1)).cast("long").alias("n_matches"),
        )
    )
    wi = w.select(
        F.col("source").alias("si"), F.col("wins").alias("wi"), F.col("n_matches").alias("ni")
    )
    wj = w.select(
        F.col("source").alias("sj"), F.col("wins").alias("wj"), F.col("n_matches").alias("nj")
    )
    opp = (
        wi.join(F.broadcast(wj), F.col("sj") != F.col("si"))
        .groupBy("si", "wi", "ni")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("sj"), F.col("wj"), F.col("nj")))
            ).alias("js")
        )
    )
    den = F.aggregate(
        F.col("js"),
        F.lit(0.0),
        lambda acc, x: acc
        + F.lit(float(_BT_MATCHES))
        / (
            F.lit(2.0) * F.col("wi") / F.col("ni")
            + F.lit(2.0) * x["wj"] / x["nj"]
        ),
    )
    fit = opp.select(
        F.col("si").alias("source"),
        F.col("wi").alias("wins"),
        F.col("ni").alias("n_matches"),
        (F.col("wi").cast("double") / den).alias("strength"),
    )
    rk = Window.orderBy(F.desc("strength"), F.asc("source"))
    return (
        fit.join(arms.select("source", F.col("lat").alias("latent")), "source")
        .withColumn("rank", F.row_number().over(rk).cast("int"))
        .select("source", "latent", "wins", "n_matches", "strength", "rank")
    )


# ---------------------------------------------------------------------------
# colbert_maxsim_topk — late-interaction (multi-vector) retrieval
# ---------------------------------------------------------------------------

_CB_SUB = 4          # token vectors per item (64-dim sliced into 4 x 16)
_CB_SUBDIM = 16
_CB_N_QUERIES = 10   # vec_id < 10 are the query vectors — CONSTANT batch
_CB_TOP = 5


def _cb_slices(col: str) -> list[str]:
    return [
        f"list_transform({col}[{i * _CB_SUBDIM + 1}:{(i + 1) * _CB_SUBDIM}], x -> CAST(x AS DOUBLE))"
        for i in range(_CB_SUB)
    ]


def _cb_slices_dbl(col: str) -> list[str]:
    """Slices over an already-DOUBLE list column (assignment CTE output)."""
    return [
        f"{col}[{i * _CB_SUBDIM + 1}:{(i + 1) * _CB_SUBDIM}]"
        for i in range(_CB_SUB)
    ]


def _cb_slice_cols(col: str, prefix: str) -> list:
    return [
        F.slice(F.col(col), i * _CB_SUBDIM + 1, _CB_SUBDIM).alias(f"{prefix}{i}")
        for i in range(_CB_SUB)
    ]


def _cb_with_norms(df: DataFrame, prefix: str) -> DataFrame:
    # per-slice norms computed ONCE per side in the scan projection (the
    # _vectors discipline): each candidate pair then costs 16 dots and 16
    # divisions instead of re-walking 32 norm folds per pair
    from datapipeline_ops_spark.functions.vectors import norm

    return df.select(
        "*",
        *[norm(F.col(f"{prefix}{i}")).alias(f"{prefix}n{i}") for i in range(_CB_SUB)],
    )


def _cb_maxsim_col():
    """MaxSim = sum over query slices of greatest item-slice cosine, in
    literal order (bit-identical cross-engine)."""
    from datapipeline_ops_spark.functions.vectors import dot

    maxsim = None
    for i in range(_CB_SUB):
        # a zero-norm SLICE (legal even for a non-zero vector) has no
        # cosine: NULL, exactly what DuckDB's 0/0 produces — both engines'
        # greatest() then skip NULLs, and an all-NULL row sums to NULL.
        # ANSI Spark would raise DIVIDE_BY_ZERO instead (fuzzer, round 10).
        best = F.greatest(
            *[
                F.when(
                    (F.col(f"qn{i}") > 0) & (F.col(f"dn{j}") > 0),
                    dot(F.col(f"q{i}"), F.col(f"d{j}"))
                    / (F.col(f"qn{i}") * F.col(f"dn{j}")),
                )
                for j in range(_CB_SUB)
            ]
        )
        maxsim = best if maxsim is None else maxsim + best
    return maxsim


def _cb_sql_maxsim(qcol: str, dcol: str, dbl: bool = False) -> str:
    sl = _cb_slices_dbl if dbl else _cb_slices
    qs, ds = sl(qcol), sl(dcol)
    best_terms = []
    for i in range(_CB_SUB):
        cos_ij = [sql_cosine(qs[i], ds[j]) for j in range(_CB_SUB)]
        best_terms.append("greatest(" + ", ".join(cos_ij) + ")")
    return " + ".join(best_terms)


@query(
    "colbert_maxsim_topk",
    oracle=None,  # assembled below (needs the cosine helper per slice pair)
)
def colbert_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction (ColBERT-style) retrieval: each item is a BAG of
    {_CB_SUB} token vectors (the 64-dim embedding sliced into {_CB_SUB} x
    {_CB_SUBDIM} — the seam where real per-token embeddings land), and
    relevance is MaxSim: sum over query tokens of the best-matching item
    token cosine. This is the retrieval family between single-vector ANN
    (loses token-level matching) and cross-encoders (can't pre-index) —
    worth having as its own operator because its plan shape differs: the
    scan evaluates {_CB_SUB}x{_CB_SUB} small cosines per pair instead of
    one big one.

    Exactness: every sub-cosine is the ordered-fold dot (bit-identical
    cross-engine); per query token the best item token is greatest() of
    {_CB_SUB} such values; MaxSim is their literal-order sum — no
    engine-ordered accumulation anywhere; ties in the final ranking break
    on vec_id.

    Scale: the query batch is a CONSTANT {_CB_N_QUERIES} vectors (the
    N_QUERIES discipline of similarity.py) so the broadcast side is
    corpus-independent — one corpus pass regardless of index size; at
    index scale the same MaxSim runs over an ANN-pruned candidate set —
    see colbert_maxsim_ivf_topk for that composed serving topology."""
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("vec")
    )
    items = _cb_with_norms(v.select("vec_id", *_cb_slice_cols("vec", "d")), "d")
    q = _cb_with_norms(
        v.filter(F.col("vec_id") < _CB_N_QUERIES).select(
            F.col("vec_id").alias("query_id"), *_cb_slice_cols("vec", "q")
        ),
        "q",
    )
    joined = items.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("maxsim"), F.asc("vec_id"))
    return (
        joined.withColumn("maxsim", _cb_maxsim_col())
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _CB_TOP)
        .select("query_id", "vec_id", F.round("maxsim", 6).alias("maxsim"), "rank")
    )


def _colbert_oracle() -> str:
    maxsim = _cb_sql_maxsim("q.embedding", "c.embedding")
    return f"""
    WITH scored AS MATERIALIZED (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
               {maxsim} AS maxsim
        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {_CB_N_QUERIES}
    )
    SELECT query_id, vec_id, round(maxsim, 6) AS maxsim, CAST(rn AS INT) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY maxsim DESC, vec_id
        ) AS rn FROM scored
    ) WHERE rn <= {_CB_TOP}
    """


QUERIES["colbert_maxsim_topk"].oracle = _colbert_oracle()


# ---------------------------------------------------------------------------
# colbert_maxsim_ivf_topk — the ColBERT serving topology: IVF cell shortlist
# feeding the MaxSim rerank (no full-corpus late interaction)
# ---------------------------------------------------------------------------


@query(
    "colbert_maxsim_ivf_topk",
    oracle=None,  # assembled below (assignment CTE + sliced MaxSim)
)
def colbert_maxsim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style retrieval the way it is actually SERVED: a coarse IVF
    quantizer (nearest of the 10 shared centroids by full-vector cosine —
    the same assignment ann_ivf_topk builds) prunes the corpus to the
    query's cell, and only that shortlist pays the {_CB_SUB}x{_CB_SUB}
    MaxSim evaluation. This is the composed topology the full-corpus
    colbert_maxsim_topk docstring points at — late interaction as a RERANK
    stage over an ANN-pruned candidate set, never over the whole index
    (PLAID / ColBERTv2 serving; Santhanam et al. 2022).

    Exactness: centroid assignment is the registered argmax-window pattern
    (ordered full-vector cosines, centroid-id tie-break); every sub-cosine
    of the rerank is the ordered-fold dot; MaxSim sums in literal order —
    all bit-identical cross-engine, rank ties break on vec_id.

    Scale: the query batch is a CONSTANT {_CB_N_QUERIES} vectors and the
    candidate set per query is |corpus|/C (one cell), so rerank cost is
    corpus/C × queries instead of corpus × queries; at 100 TB the corpus
    is written partitionBy(cid) and each probe is partition-pruned I/O.
    Nothing corpus-derived is ever broadcast — the cell join is a plain
    equi-join on cid against the constant query table."""
    from datapipeline_ops_spark.functions.vectors import dot, norm
    from datapipeline_ops_spark.queries.similarity import IVF_CENTROIDS

    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("vec")
    )
    vn = v.withColumn("nrm", norm(F.col("vec")))
    cent = vn.filter(
        (F.col("vec_id") >= IVF_CENTROIDS[0]) & (F.col("vec_id") < IVF_CENTROIDS[1])
    ).select(
        F.col("vec_id").alias("cid"),
        F.col("vec").alias("cvec"),
        F.col("nrm").alias("cnrm"),
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cid"))
    assign = (
        vn.join(F.broadcast(cent))
        .withColumn(
            "ccos", dot(F.col("vec"), F.col("cvec")) / (F.col("nrm") * F.col("cnrm"))
        )
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid", "vec")
    )
    items = _cb_with_norms(
        assign.select("vec_id", "cid", *_cb_slice_cols("vec", "d")), "d"
    )
    q = _cb_with_norms(
        assign.filter(F.col("vec_id") < _CB_N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("cid").alias("qcid"),
            *_cb_slice_cols("vec", "q"),
        ),
        "q",
    )
    joined = items.join(
        F.broadcast(q),
        (F.col("cid") == F.col("qcid")) & (F.col("vec_id") != F.col("query_id")),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("maxsim"), F.asc("vec_id"))
    return (
        joined.withColumn("maxsim", _cb_maxsim_col())
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _CB_TOP)
        .select("query_id", "vec_id", F.round("maxsim", 6).alias("maxsim"), "rank")
    )


def _colbert_ivf_oracle() -> str:
    from datapipeline_ops_spark.queries.similarity import IVF_CENTROIDS

    maxsim = _cb_sql_maxsim("q.vec", "c.vec", dbl=True)
    return f"""
    WITH v AS MATERIALIZED (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings
    ),
    cent AS (SELECT vec_id AS cid, vec AS cvec FROM v
             WHERE vec_id >= {IVF_CENTROIDS[0]} AND vec_id < {IVF_CENTROIDS[1]}),
    assign AS MATERIALIZED (
        SELECT vec_id, cid, vec FROM (
            SELECT a.vec_id, b.cid, a.vec,
                   row_number() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY {sql_cosine("a.vec", "b.cvec")} DESC, b.cid
                   ) AS rn
            FROM v a JOIN cent b ON true
        ) WHERE rn = 1
    ),
    scored AS MATERIALIZED (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id, {maxsim} AS maxsim
        FROM assign q JOIN assign c ON c.cid = q.cid AND c.vec_id <> q.vec_id
        WHERE q.vec_id < {_CB_N_QUERIES}
    )
    SELECT query_id, vec_id, round(maxsim, 6) AS maxsim, CAST(rn AS INT) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY maxsim DESC, vec_id
        ) AS rn FROM scored
    ) WHERE rn <= {_CB_TOP}
    """


QUERIES["colbert_maxsim_ivf_topk"].oracle = _colbert_ivf_oracle()


# ---------------------------------------------------------------------------
# serving_retrieval_e2e — the full hybrid serving path composed end-to-end:
# IVF shortlist -> MaxSim rerank (dense) + BM25 (sparse) -> RRF fusion ->
# NDCG gate against exact late interaction
# ---------------------------------------------------------------------------


@query("serving_retrieval_e2e", oracle=None)  # composed below
def serving_retrieval_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production hybrid-retrieval serving path as ONE Catalyst plan —
    the retrieval counterpart of corpus_curation_e2e's funnel: (1) dense
    leg = colbert_maxsim_ivf_topk (IVF cell shortlist -> MaxSim rerank) for
    query 0; (2) sparse leg = the registered BM25 keyword run; (3) the two
    rankings merge by reciprocal-rank fusion (score = sum 1/({RRF_K}+rank),
    no score calibration across retrievers); (4) the fused list is GATED:
    NDCG@{_NDCG_K} of the fused ranking against the EXACT full-corpus
    MaxSim ranking for the same query, graded rel = {_NDCG_K}+1-exact_rank
    — the dense-fidelity number a serving rollout watches before swapping
    retrievers. Proves the registry's retrieval operators compose: four
    registered query shapes chained without materialization barriers.

    Exactness: ranks are integers, RRF scores exact rational sums, NDCG
    discount weights are shared Python literals; fused ties break on
    doc_id — bit-identical cross-engine throughout.

    Scale: both retriever outputs are top-k tables (constant size at any
    corpus scale); fusion and the gate run on <= 30 rows. The corpus cost
    is one BM25 pass + one IVF-pruned MaxSim pass, both scale-safe."""
    dense = (
        QUERIES["colbert_maxsim_ivf_topk"]
        .fn(spark, sf_dir)
        .filter(F.col("query_id") == 0)
        .select(F.col("vec_id").alias("doc_id"), F.col("rank").alias("r_d"))
    )
    bm25 = QUERIES["bm25_topk"].fn(spark, sf_dir)
    w_b = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    sparse = bm25.select("doc_id", F.row_number().over(w_b).alias("r_b"))
    fused = (
        sparse.join(dense, "doc_id", "full_outer")
        .select(
            "doc_id",
            (
                F.coalesce(F.lit(1.0) / (RRF_K + F.col("r_b")), F.lit(0.0))
                + F.coalesce(F.lit(1.0) / (RRF_K + F.col("r_d")), F.lit(0.0))
            ).alias("rrf_score"),
            F.col("r_b").isNotNull().alias("in_bm25"),
            F.col("r_d").isNotNull().alias("in_dense"),
        )
    )
    w_f = Window.orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    fused = (
        fused.withColumn("fused_rank", F.row_number().over(w_f).cast("int"))
        .filter(F.col("fused_rank") <= RRF_TOPK)
    )
    gt = (
        QUERIES["colbert_maxsim_topk"]
        .fn(spark, sf_dir)
        .filter(F.col("query_id") == 0)
        .select(
            F.col("vec_id").alias("doc_id"),
            (F.lit(_NDCG_K + 1) - F.col("rank")).alias("rel"),
        )
    )
    j = fused.join(gt, "doc_id", "left").select(
        "fused_rank", F.coalesce("rel", F.lit(0)).alias("rel")
    )
    slots = [
        F.max(F.when(F.col("fused_rank") == i, F.col("rel"))).alias(f"r{i}")
        for i in range(1, _NDCG_K + 1)
    ]
    dcg = F.lit(0.0)
    for i in range(1, _NDCG_K + 1):
        dcg = dcg + F.coalesce(F.col(f"r{i}"), F.lit(0)).cast("double") * F.lit(
            _NDCG_W[i - 1]
        )
    gate = j.agg(*slots).select(
        (dcg / F.lit(_NDCG_IDEAL)).alias("ndcg_dense")
    )
    return fused.crossJoin(F.broadcast(gate)).select(
        "doc_id", "rrf_score", "in_bm25", "in_dense", "fused_rank", "ndcg_dense"
    )


def _serving_oracle() -> str:
    bm25_sql = QUERIES["bm25_topk"].oracle
    dense_sql = QUERIES["colbert_maxsim_ivf_topk"].oracle
    gt_sql = QUERIES["colbert_maxsim_topk"].oracle
    slot_cols = ", ".join(
        f"max(CASE WHEN fused_rank = {i} THEN rel END) AS r{i}"
        for i in range(1, _NDCG_K + 1)
    )
    dcg = " + ".join(
        f"CAST(coalesce(r{i}, 0) AS DOUBLE) * {_NDCG_W[i - 1]!r}"
        for i in range(1, _NDCG_K + 1)
    )
    return f"""
    WITH b AS MATERIALIZED (
        SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r_b
        FROM ({bm25_sql})
    ),
    d AS MATERIALIZED (
        SELECT vec_id AS doc_id, rank AS r_d FROM ({dense_sql})
        WHERE query_id = 0
    ),
    f AS MATERIALIZED (
        SELECT coalesce(b.doc_id, d.doc_id) AS doc_id,
               coalesce(1.0 / ({RRF_K} + b.r_b), 0)
                   + coalesce(1.0 / ({RRF_K} + d.r_d), 0) AS rrf_score,
               b.doc_id IS NOT NULL AS in_bm25,
               d.doc_id IS NOT NULL AS in_dense
        FROM b FULL OUTER JOIN d ON d.doc_id = b.doc_id
    ),
    fused AS MATERIALIZED (
        SELECT * FROM (
            SELECT *, CAST(row_number() OVER (
                ORDER BY rrf_score DESC, doc_id) AS INT) AS fused_rank
            FROM f
        ) WHERE fused_rank <= {RRF_TOPK}
    ),
    gt AS MATERIALIZED (
        SELECT vec_id AS doc_id, {_NDCG_K} + 1 - rank AS rel FROM ({gt_sql})
        WHERE query_id = 0
    ),
    slots AS (
        SELECT {slot_cols} FROM (
            SELECT fu.fused_rank, coalesce(gt.rel, 0) AS rel
            FROM fused fu LEFT JOIN gt ON gt.doc_id = fu.doc_id
        )
    ),
    gate AS (SELECT ({dcg}) / {_NDCG_IDEAL!r} AS ndcg_dense FROM slots)
    SELECT doc_id, rrf_score, in_bm25, in_dense, fused_rank, ndcg_dense
    FROM fused CROSS JOIN gate
    """


QUERIES["serving_retrieval_e2e"].oracle = _serving_oracle()


# ---------------------------------------------------------------------------
# serving_eval_gate_e2e — offline quality gate for the compressed ANN path
# ---------------------------------------------------------------------------

_GATE_RECALL_PCT = 60  # per-query gate: recall@k >= 0.60 (exact integer test)
_GATE_NDCG = 0.6       # per-query gate: NDCG@k >= 0.6 (shared-literal doubles)


@query("serving_eval_gate_e2e", oracle=None)  # composed below
def serving_eval_gate_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline serving-quality gate as ONE composed plan — the eval-side
    counterpart of serving_retrieval_e2e: the compressed production index
    path (ann_ivf_pq_topk: IVF cells -> PQ ADC shortlist -> exact rerank)
    is scored per query against exact brute-force cosine ground truth on
    BOTH set overlap (recall@k) and rank quality (NDCG@k, graded rel),
    each thresholded into a per-query pass flag, then rolled up into the
    pass-rate + all-pass verdict a rollout pipeline blocks on. Recall gates
    compare in INTEGER space (n_hits * 100 >= {_GATE_RECALL_PCT} * k) and
    the NDCG gate compares doubles both engines derive from integer rels
    and shared Python-literal weights — bit-identical, so the boolean
    verdict can never straddle engines.

    Scale: both retrieval outputs are constant top-k tables (queries x k);
    the gate itself is a {N_QUERIES}-row rollup. The corpus cost is the
    IVF-PQ pass plus the brute-force pass — the latter is the ground-truth
    oracle a production gate runs on a SAMPLED query set, which is exactly
    what the constant query batch models."""
    gt = QUERIES["cosine_topk_bruteforce"].fn(spark, sf_dir).select(
        "query_id",
        "vec_id",
        (F.lit(_NDCG_K + 1) - F.col("rank")).alias("rel"),
    )
    ap = QUERIES["ann_ivf_pq_topk"].fn(spark, sf_dir).select(
        "query_id", "vec_id", "rank"
    )
    j = ap.join(gt, ["query_id", "vec_id"], "left").select(
        "query_id",
        "rank",
        F.coalesce("rel", F.lit(0)).alias("rel"),
        (F.col("rel").isNotNull()).cast("int").alias("hit"),
    )
    slots = [
        F.max(F.when(F.col("rank") == i, F.col("rel"))).alias(f"r{i}")
        for i in range(1, _NDCG_K + 1)
    ]
    g = j.groupBy("query_id").agg(
        F.sum("hit").cast("long").alias("n_hits"),
        F.count(F.lit(1)).cast("long").alias("k"),
        *slots,
    )
    dcg = F.lit(0.0)
    for i in range(1, _NDCG_K + 1):
        dcg = dcg + F.coalesce(F.col(f"r{i}"), F.lit(0)).cast("double") * F.lit(
            _NDCG_W[i - 1]
        )
    scored = g.select(
        "query_id",
        "n_hits",
        "k",
        (F.col("n_hits").cast("double") / F.col("k").cast("double")).alias("recall"),
        (dcg / F.lit(_NDCG_IDEAL)).alias("ndcg"),
        (
            (F.col("n_hits") * 100 >= F.lit(_GATE_RECALL_PCT) * F.col("k"))
            & (dcg / F.lit(_NDCG_IDEAL) >= F.lit(_GATE_NDCG))
        ).alias("passed"),
    )
    w = Window.partitionBy()
    return scored.select(
        "query_id",
        "n_hits",
        "k",
        "recall",
        "ndcg",
        "passed",
        F.sum(F.col("passed").cast("long")).over(w).alias("n_pass"),
        F.count(F.lit(1)).over(w).alias("n_queries"),
        F.min(F.col("passed").cast("int")).over(w).cast("boolean").alias("gate_ok"),
    )


def _serving_eval_gate_oracle() -> str:
    gt_sql = QUERIES["cosine_topk_bruteforce"].oracle
    ap_sql = QUERIES["ann_ivf_pq_topk"].oracle
    slot_cols = ", ".join(
        f"max(CASE WHEN rank = {i} THEN rel END) AS r{i}"
        for i in range(1, _NDCG_K + 1)
    )
    dcg = " + ".join(
        f"CAST(coalesce(r{i}, 0) AS DOUBLE) * {_NDCG_W[i - 1]!r}"
        for i in range(1, _NDCG_K + 1)
    )
    return f"""
    WITH gt AS MATERIALIZED (
        SELECT query_id, vec_id, {_NDCG_K} + 1 - rank AS rel FROM ({gt_sql})
    ),
    ap AS MATERIALIZED (SELECT query_id, vec_id, rank FROM ({ap_sql})),
    j AS (
        SELECT ap.query_id, ap.rank, coalesce(gt.rel, 0) AS rel,
               CASE WHEN gt.rel IS NOT NULL THEN 1 ELSE 0 END AS hit
        FROM ap LEFT JOIN gt
          ON gt.query_id = ap.query_id AND gt.vec_id = ap.vec_id
    ),
    g AS (
        SELECT query_id,
               CAST(sum(hit) AS BIGINT) AS n_hits,
               count(*) AS k, {slot_cols}
        FROM j GROUP BY query_id
    ),
    scored AS (
        SELECT query_id, n_hits, k,
               CAST(n_hits AS DOUBLE) / CAST(k AS DOUBLE) AS recall,
               ({dcg}) / {_NDCG_IDEAL!r} AS ndcg,
               (n_hits * 100 >= {_GATE_RECALL_PCT} * k)
                   AND (({dcg}) / {_NDCG_IDEAL!r} >= {_GATE_NDCG!r}) AS passed
        FROM g
    )
    SELECT query_id, n_hits, k, recall, ndcg, passed,
           CAST(sum(CASE WHEN passed THEN 1 ELSE 0 END) OVER () AS BIGINT)
               AS n_pass,
           count(*) OVER () AS n_queries,
           CAST(min(CASE WHEN passed THEN 1 ELSE 0 END) OVER () AS BOOLEAN)
               AS gate_ok
    FROM scored
    """


QUERIES["serving_eval_gate_e2e"].oracle = _serving_eval_gate_oracle()


# ---------------------------------------------------------------------------
# ann_probe_recall_curve — the recall-vs-cost tuning curve for the IVF index
# ---------------------------------------------------------------------------

# nprobe sweep: how many of the 10 coarse cells each query searches. One
# assignment pass + one candidate scoring pass at the loosest setting serve
# every point on the curve.
_PROBE_SPINE = (1, 2, 4, 8)


@query("ann_probe_recall_curve", oracle=None)  # composed below
def ann_probe_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF nprobe tuning curve: recall@k against exact ground truth AND the
    candidate-scan cost, per probe count {_PROBE_SPINE} — the curve an
    operator reads before pinning the serving index's nprobe (the knob that
    trades recall for latency). `ann_recall_eval` grades ONE configured
    index; this sweeps the configuration space from a single pass: vectors
    are assigned to cells once, candidates are scored once at the loosest
    nprobe, and every tighter setting is a filter on the probe rank.

    Scale shape: the assignment is the same broadcast-centroid argmax as
    `ann_ivf_topk`; the candidate stage is (constant query batch) x (probed
    cells), never corpus x corpus; the sweep fans the scored candidates
    across a 4-row broadcast spine and ranks per (nprobe, query) — at
    production scale the curve costs one index probe pass, not four."""
    from datapipeline_ops_spark.functions.vectors import dot
    from datapipeline_ops_spark.queries.similarity import (
        IVF_CENTROIDS,
        N_QUERIES,
        TOP_K,
        _vectors,
    )

    v = _vectors(spark, sf_dir)
    cent = v.filter(
        (F.col("vec_id") >= IVF_CENTROIDS[0]) & (F.col("vec_id") < IVF_CENTROIDS[1])
    ).select(
        F.col("vec_id").alias("cid"),
        F.col("vec").alias("cvec"),
        F.col("nrm").alias("cnrm"),
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cid"))
    assign = (
        v.join(F.broadcast(cent))
        .withColumn(
            "ccos", dot(F.col("vec"), F.col("cvec")) / (F.col("nrm") * F.col("cnrm"))
        )
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid", "vec", "nrm")
    )
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("nrm").alias("qnrm"),
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("pcos"), F.asc("pcid"))
    qp = (
        q.join(F.broadcast(cent.select(F.col("cid").alias("pcid"), "cvec", "cnrm")))
        .withColumn(
            "pcos", dot(F.col("qvec"), F.col("cvec")) / (F.col("qnrm") * F.col("cnrm"))
        )
        .withColumn("crank", F.row_number().over(w_probe))
        .filter(F.col("crank") <= max(_PROBE_SPINE))
        .select("query_id", "pcid", "crank", "qvec", "qnrm")
    )
    scored = (
        assign.join(
            F.broadcast(qp),
            (F.col("cid") == F.col("pcid")) & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn(
            "cos", dot(F.col("qvec"), F.col("vec")) / (F.col("qnrm") * F.col("nrm"))
        )
        .select("query_id", "vec_id", "crank", "cos")
    )
    spine = local_frame(spark, [(p,) for p in _PROBE_SPINE], "nprobe int")
    fan = scored.crossJoin(F.broadcast(spine)).filter(
        F.col("crank") <= F.col("nprobe")
    )
    w_rank = Window.partitionBy("nprobe", "query_id").orderBy(
        F.desc("cos"), F.asc("vec_id")
    )
    ret = (
        fan.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= TOP_K)
        .select("nprobe", "query_id", F.col("vec_id").alias("ret_vec_id"))
    )
    gt = (
        QUERIES["cosine_topk_bruteforce"]
        .fn(spark, sf_dir)
        .select("query_id", F.col("vec_id").alias("gt_vec_id"))
    )
    # the ground-truth fan-out gets its own renamed spine columns: reusing
    # `spine` verbatim would put the SAME attribute ids on both sides of the
    # hits join (nprobe == nprobe resolves trivially true)
    gfan = gt.crossJoin(
        F.broadcast(spine.select(F.col("nprobe").alias("g_nprobe"))),
    ).select(F.col("query_id").alias("g_query_id"), "gt_vec_id", "g_nprobe")
    hits = (
        gfan.join(
            ret,
            (F.col("g_nprobe") == F.col("nprobe"))
            & (F.col("g_query_id") == F.col("query_id"))
            & (F.col("gt_vec_id") == F.col("ret_vec_id")),
            "left",
        )
        .select(
            "g_nprobe",
            "g_query_id",
            F.col("ret_vec_id").isNotNull().cast("int").alias("hit"),
        )
        .groupBy("g_nprobe", "g_query_id")
        .agg(
            (F.sum("hit").cast("double") / F.lit(float(TOP_K))).alias("recall")
        )
    )
    per = hits.groupBy("g_nprobe").agg(
        F.avg("recall").alias("mean_recall"), F.min("recall").alias("min_recall")
    ).withColumnRenamed("g_nprobe", "nprobe")
    cost = fan.groupBy("nprobe").agg(
        (F.count(F.lit(1)).cast("double") / F.lit(float(N_QUERIES))).alias(
            "mean_candidates"
        )
    )
    return per.join(cost, "nprobe").select(
        "nprobe", "mean_recall", "min_recall", "mean_candidates"
    )


def _probe_curve_oracle() -> str:
    from datapipeline_ops_spark.queries.similarity import (
        _V_CTE,
        IVF_CENTROIDS,
        N_QUERIES,
        TOP_K,
    )

    gt_sql = QUERIES["cosine_topk_bruteforce"].oracle
    spine = ", ".join(str(p) for p in _PROBE_SPINE)
    return f"""
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
    q AS (SELECT vec_id AS query_id, vec AS qvec FROM v WHERE vec_id < {N_QUERIES}),
    qp AS (
        SELECT query_id, cid, crank FROM (
            SELECT q.query_id, b.cid,
                   row_number() OVER (PARTITION BY q.query_id
                                      ORDER BY {sql_cosine("q.qvec", "b.vec")} DESC, b.cid) AS crank
            FROM q JOIN cent b ON true
        ) WHERE crank <= {max(_PROBE_SPINE)}
    ),
    scored AS (
        SELECT qp.query_id, a.vec_id, qp.crank,
               {sql_cosine("q.qvec", "a.vec")} AS cos
        FROM qp JOIN assign a ON a.cid = qp.cid
                JOIN q ON q.query_id = qp.query_id
        WHERE a.vec_id <> qp.query_id
    ),
    spine AS (SELECT unnest([{spine}]) AS nprobe),
    fan AS (SELECT s.nprobe, c.* FROM scored c CROSS JOIN spine s
            WHERE c.crank <= s.nprobe),
    ret AS (
        SELECT nprobe, query_id, vec_id FROM (
            SELECT *, row_number() OVER (PARTITION BY nprobe, query_id
                                         ORDER BY cos DESC, vec_id) AS rn
            FROM fan
        ) WHERE rn <= {TOP_K}
    ),
    gt AS MATERIALIZED (SELECT query_id, vec_id FROM ({gt_sql})),
    hits AS (
        SELECT s.nprobe, g.query_id,
               CAST(sum(CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS DOUBLE) / {TOP_K} AS recall
        FROM gt g CROSS JOIN spine s
             LEFT JOIN ret r ON r.nprobe = s.nprobe
                            AND r.query_id = g.query_id AND r.vec_id = g.vec_id
        GROUP BY s.nprobe, g.query_id
    ),
    cost AS (SELECT nprobe, count(*) * 1.0 / {N_QUERIES} AS mean_candidates
             FROM fan GROUP BY nprobe)
    SELECT h.nprobe, avg(h.recall) AS mean_recall, min(h.recall) AS min_recall,
           c.mean_candidates
    FROM hits h JOIN cost c ON h.nprobe = c.nprobe
    GROUP BY h.nprobe, c.mean_candidates
    """


QUERIES["ann_probe_recall_curve"].oracle = _probe_curve_oracle()
