"""Diversity-aware selection: Maximal Marginal Relevance (MMR) top-k.

Training-data selection wants items that are RELEVANT to a target AND
mutually DIVERSE — picking the 10 nearest neighbours of a query usually
returns 10 near-duplicates.  MMR (Carbonell & Goldstein 1998) interleaves
the two: pick argmax over candidates of

    lambda * sim(query, c)  -  (1 - lambda) * max_{s in selected} sim(c, s)

one item at a time.  The selection itself is inherently sequential, but only
over a SHORTLIST: the distributed work is the corpus-wide relevance scan
(broadcast query against every vector — the same plan as the ANN brute-force
stage), which cuts the corpus to SHORTLIST rows; the greedy loop then runs
on the shortlist's pairwise-similarity table inside one ``applyInPandas``
group (SHORTLIST^2 = 900 rows — bounded by constants, never data-scaled, and
it stays on an executor instead of collecting to the driver).

Cross-engine determinism: every similarity is the package's bit-exact
dot/norm convention (``functions/vectors.py``), lambda arithmetic is the
same two multiplies and a subtract in both engines, and every argmax
tie-breaks on vec_id — so the DuckDB oracle (the same greedy unrolled as
MMR_K chained single-row CTEs) reproduces the selection exactly.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.functions.vectors import as_double, dot, norm, sql_cosine
from datapipeline_ops_spark.tables import load_table

MMR_QUERY_ID = 0
MMR_CAND_MIN_ID = 10  # skip the reserved query/centroid vectors
SHORTLIST = 30
MMR_K = 10
MMR_LAMBDA = 0.7


def _mmr_oracle() -> str:
    # Every CTE referenced more than once is MATERIALIZED: sel{k} reads
    # selu{k-1} twice and selu{k} unions it again, so without the hint the
    # planner inlines ~3^K copies of the chain (observed: minutes at K=10,
    # plus one parquet open per inlined scan).
    cos_qb = sql_cosine("q.vec", "b.vec")
    cos_ab = sql_cosine("a.vec", "b.vec")
    lam, mu = MMR_LAMBDA, round(1.0 - MMR_LAMBDA, 12)
    parts = [
        f"""
    WITH v AS MATERIALIZED (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
               FROM embeddings),
    q AS MATERIALIZED (SELECT vec FROM v WHERE vec_id = {MMR_QUERY_ID}),
    sl AS MATERIALIZED (
        SELECT vec_id, vec, simq FROM (
            SELECT b.vec_id, b.vec, {cos_qb} AS simq,
                   row_number() OVER (ORDER BY {cos_qb} DESC, b.vec_id) AS rn
            FROM v b CROSS JOIN q
            WHERE b.vec_id >= {MMR_CAND_MIN_ID}
        ) WHERE rn <= {SHORTLIST}
    ),
    ps AS MATERIALIZED (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, {cos_ab} AS sim
        FROM sl a JOIN sl b ON a.vec_id <> b.vec_id
    ),
    sel1 AS (SELECT vec_id, 1 AS step, {lam} * simq AS score
             FROM sl ORDER BY score DESC, vec_id LIMIT 1),
    selu1 AS MATERIALIZED (SELECT * FROM sel1)"""
    ]
    for k in range(2, MMR_K + 1):
        parts.append(
            f""",
    sel{k} AS (
        SELECT c.vec_id, {k} AS step,
               {lam} * c.simq - {mu} * max(p.sim) AS score
        FROM sl c JOIN ps p ON p.id_b = c.vec_id
             AND p.id_a IN (SELECT vec_id FROM selu{k - 1})
        WHERE c.vec_id NOT IN (SELECT vec_id FROM selu{k - 1})
        GROUP BY c.vec_id, c.simq
        ORDER BY score DESC, c.vec_id LIMIT 1
    ),
    selu{k} AS MATERIALIZED (SELECT * FROM selu{k - 1} UNION ALL SELECT * FROM sel{k})"""
        )
    parts.append(
        f"""
    SELECT CAST(step AS INT) AS step, vec_id, score AS mmr_score FROM selu{MMR_K}"""
    )
    return "".join(parts)


def _mmr_select(pdf: pd.DataFrame) -> pd.DataFrame:
    """Greedy MMR over one shortlist's pair table (executor-side, bounded)."""
    simq: dict[int, float] = {}
    sim: dict[int, dict[int, float]] = {}
    for r in pdf.itertuples(index=False):
        simq[r.id_a] = r.simq_a
        sim.setdefault(r.id_a, {})[r.id_b] = r.sim
    lam, mu = MMR_LAMBDA, round(1.0 - MMR_LAMBDA, 12)
    ids = sorted(simq)
    sel: list[int] = []
    out: list[tuple[int, int, float]] = []
    for step in range(1, MMR_K + 1):
        best_id, best_score = None, None
        for c in ids:
            if c in sel:
                continue
            score = lam * simq[c] if not sel else (
                lam * simq[c] - mu * max(sim[c][s] for s in sel)
            )
            if best_score is None or score > best_score:
                best_id, best_score = c, score
        if best_id is None:
            # shortlist smaller than MMR_K (tiny/filtered corpus): degrade
            # to fewer rows instead of raising on sim[c][None] below
            break
        sel.append(best_id)
        out.append((step, best_id, best_score))
    return pd.DataFrame(out, columns=["step", "vec_id", "mmr_score"])


@query("mmr_diverse_topk", oracle=_mmr_oracle())
def mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diverse top-{MMR_K} for query vector {MMR_QUERY_ID} at
    lambda={MMR_LAMBDA}: corpus-wide broadcast relevance scan -> top-30
    shortlist -> pairwise sims (30x30 broadcast self-join) -> greedy
    selection in one bounded applyInPandas group."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select("vec_id", as_double(F.col("embedding")).alias("vec")).withColumn(
        "nrm", norm(F.col("vec"))
    )
    q = v.filter(F.col("vec_id") == MMR_QUERY_ID).select(
        F.col("vec").alias("qvec"), F.col("nrm").alias("qnrm")
    )
    scored = (
        v.filter(F.col("vec_id") >= MMR_CAND_MIN_ID)
        .crossJoin(F.broadcast(q))
        .withColumn("simq", dot(F.col("qvec"), F.col("vec")) / (F.col("qnrm") * F.col("nrm")))
    )
    # orderBy+limit compiles to TakeOrderedAndProject: per-partition top-30
    # then a 30-row merge — no global sort, unlike a row_number() window
    sl = (
        scored.orderBy(F.desc("simq"), F.asc("vec_id"))
        .limit(SHORTLIST)
        .select("vec_id", "vec", "nrm", "simq")
    )
    a = sl.select(
        F.col("vec_id").alias("id_a"),
        F.col("vec").alias("va"),
        F.col("nrm").alias("na"),
        F.col("simq").alias("simq_a"),
    )
    b = sl.select(
        F.col("vec_id").alias("id_b"), F.col("vec").alias("vb"), F.col("nrm").alias("nb")
    )
    ps = (
        a.crossJoin(b)
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("sim"),
            "simq_a",
        )
    )
    return (
        ps.groupBy(F.lit(0).alias("_g"))
        .applyInPandas(
            lambda pdf: _mmr_select(pdf),
            schema="step int, vec_id long, mmr_score double",
        )
    )
