"""Sampling and sketch surface: stratified deterministic sampling, pivot
reports, and approximate (HLL) distinct sketches.

Curation-pipeline motivation: eval holdouts must be reproducible per
stratum (source/lang), dashboards want wide per-type pivots, and at 100 TB
exact distinct counts of high-cardinality keys (users, urls) are a shuffle
of every distinct value — the HLL sketch answers in one pass with bounded
memory per group.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.functions.hashing import hash_unit, sql_hash_unit
from datapipeline_ops_spark.tables import load_table

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "stratified_sample_per_source",
    oracle="""
    SELECT source, doc_id, lang FROM (
        SELECT source, doc_id, lang,
               row_number() OVER (PARTITION BY source
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents
    ) WHERE rn <= 3
    """,
)
def stratified_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: 3 docs per source, chosen by ranking
    on the md5 of the key — an unbiased-but-reproducible per-stratum pick
    (same members every run/engine/scale, unlike `sampleBy`). One shuffle on
    source; the window sort runs per stratum. For heavy strata at 100 TB,
    swap row_number for a per-partition top-K (`F.min_by` over k slots) to
    avoid sorting whole strata.
    """
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("source", "doc_id", "lang")
    )


@query(
    "events_type_pivot",
    oracle="""
    SELECT user_id,
           count(*) FILTER (event_type = 'click')    AS click,
           count(*) FILTER (event_type = 'error')    AS error,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'signup')   AS signup,
           count(*) FILTER (event_type = 'view')     AS view,
           round(sum(value) FILTER (event_type = 'purchase'), 2) AS purchase_value
    FROM events GROUP BY user_id
    """,
)
def events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-user activity pivot: event_type rows → columns in one scan.

    Uses `groupBy().pivot(values=...)` with the value list declared up
    front — omitting it makes Spark run an extra distinct pass AND makes
    the output schema data-dependent, both wrong at scale. Compiles to a
    single partial-aggregatable hash aggregate, same as hand-written
    conditional aggregation.
    """
    e = load_table(spark, sf_dir, "events")
    counts = (
        e.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves NULL for absent (user, type) combos; the oracle's FILTER
    # counts yield 0 — coalesce to match, and add the purchase-value rollup
    # via a conditional agg in the same scan.
    purchase_val = (
        e.groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))), 2
            ).alias("purchase_value")
        )
    )
    wide = counts.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES]
    )
    return wide.join(purchase_val, "user_id")


_HLL_TOLERANCE = 0.03  # rsd=1% sketch; observed error <=0.67% at sf0.001..0.1


@query(
    "approx_distinct_users",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           count(*) AS n_events,
           TRUE AS estimate_ok
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-user sketch per event type (rsd=1%), checked.

    The HLL estimate itself is engine-specific, so it can't be value-matched
    against DuckDB. Instead the query emits the exact distinct count (which
    the oracle matches) plus ``estimate_ok`` — the |approx-exact|/exact <=
    {3%} bound folded into the result as a boolean the oracle asserts as
    literal TRUE. A drifting sketch flips the boolean and goes driver-red,
    which makes this a real correctness gate rather than a rows-only check.

    At 100 TB the sketch is THE way to count distincts: one pass, fixed
    ~1.5 KB sketch per group, map-side mergeable — versus count(DISTINCT)
    shuffling every distinct (type, user) pair. Emitting both here costs the
    exact path too (it's the audit query); production callers use the
    approx column alone.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
            F.count_distinct("user_id").alias("exact_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            "exact_users",
            "n_events",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= F.col("exact_users") * F.lit(_HLL_TOLERANCE)
            ).alias("estimate_ok"),
        )
        .orderBy("event_type")
    )


_QSKETCH_PROBS = (0.5, 0.95, 0.99)
_QSKETCH_ACCURACY = 10_000


@query(
    "quantile_sketch_audit",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           round(quantile_cont(value, 0.5), 4)  AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95,
           round(quantile_cont(value, 0.99), 4) AS p99,
           TRUE AS rank_ok_p50,
           TRUE AS rank_ok_p95,
           TRUE AS rank_ok_p99
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def quantile_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-sketch audit: per event type, exact p50/p95/p99 (which the
    oracle value-matches) PLUS a rank-error gate on the approx_percentile
    sketch. The sketch's output value is engine-specific, so — like the HLL
    gate in approx_distinct_users — the checkable claim is folded into
    booleans: the empirical CDF evaluated AT the sketch's answer must sit
    within eps of the target probability (eps = 1% sketch rank error +
    2/n group discretization; value-distance would be the wrong test
    because in a sparse tail the nearest sample can be far from the
    interpolated exact quantile while still being rank-perfect).

    At 100 TB the sketch is THE quantile path: one pass, fixed-size
    mergeable state per group, no sort — versus exact percentile's
    per-group sort. This audit query pays a second pass (CDF lookup join)
    on purpose; production callers run the sketch alone.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    probs = list(_QSKETCH_PROBS)
    agg = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr(
            f"percentile(value, array({', '.join(map(str, probs))}))"
        ).alias("exact_q"),
        F.expr(
            f"approx_percentile(value, array({', '.join(map(str, probs))}), "
            f"{_QSKETCH_ACCURACY})"
        ).alias("approx_q"),
    )
    # one broadcast of the |event_types|-row sketch table back onto the
    # stream to evaluate the empirical CDF at each sketch output
    probe = e.join(F.broadcast(agg.select("event_type", "approx_q")), "event_type")
    cdf = probe.groupBy("event_type").agg(
        *[
            F.avg(
                F.when(F.col("value") <= F.element_at("approx_q", i + 1), 1.0).otherwise(0.0)
            ).alias(f"cdf_{i}")
            for i in range(len(probs))
        ]
    )
    eps = F.lit(0.01) + F.lit(2.0) / F.col("n_events")
    out = agg.join(cdf, "event_type").select(
        "event_type",
        "n_events",
        *[
            F.round(F.element_at("exact_q", i + 1), 4).alias(f"p{int(p * 100)}")
            for i, p in enumerate(probs)
        ],
        *[
            (F.abs(F.col(f"cdf_{i}") - F.lit(p)) <= eps).alias(f"rank_ok_p{int(p * 100)}")
            for i, p in enumerate(probs)
        ],
    )
    return out.orderBy("event_type")


SPLIT_SEED = 777
SPLIT_TRAIN, SPLIT_VAL = 0.8, 0.9  # train < 0.8 <= val < 0.9 <= test


@query(
    "dataset_split_assign",
    oracle=f"""
    WITH assigned AS (
        SELECT source,
               CASE WHEN {sql_hash_unit("doc_id", SPLIT_SEED)} < {SPLIT_TRAIN} THEN 'train'
                    WHEN {sql_hash_unit("doc_id", SPLIT_SEED)} < {SPLIT_VAL} THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT source, split, count(*) AS n_docs
    FROM assigned GROUP BY source, split
    """,
)
def dataset_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split assignment (80/10/10) by seeded
    hash of the stable document id, reported as per-source split counts —
    the reproducible-holdout primitive every training pipeline needs:
    membership is a pure function of (doc_id, seed), so reruns, backfills
    and incremental batches assign identically with NO stored split table
    and no coordination.

    Pure per-row hashing (no shuffle until the tiny rollup); at 100 TB the
    split column is computed at read time wherever needed rather than
    materialized — a projection, not a join against a membership list."""
    d = load_table(spark, sf_dir, "documents").select(
        "source", hash_unit(F.col("doc_id"), SPLIT_SEED).alias("u")
    )
    assigned = d.select(
        "source",
        F.when(F.col("u") < SPLIT_TRAIN, "train")
        .when(F.col("u") < SPLIT_VAL, "val")
        .otherwise("test")
        .alias("split"),
    )
    return assigned.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@query(
    "split_leakage_audit",
    oracle=f"""
    WITH assigned AS (
        SELECT md5(text) AS h,
               CASE WHEN {sql_hash_unit("doc_id", SPLIT_SEED)} < {SPLIT_TRAIN} THEN 'train'
                    WHEN {sql_hash_unit("doc_id", SPLIT_SEED)} < {SPLIT_VAL} THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    ),
    groups AS (
        SELECT h, count(DISTINCT split) AS n_splits, count(*) AS n_docs
        FROM assigned GROUP BY h
    )
    SELECT count(*) AS n_content_groups,
           CAST(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_leaking_groups,
           CAST(sum(CASE WHEN n_splits > 1 THEN n_docs ELSE 0 END) AS BIGINT)
               AS n_leaking_docs
    FROM groups
    """,
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test leakage audit for the hash split: content groups (by
    md5(text)) that span MORE THAN ONE split are eval leakage — identical
    text in both train and test inflates benchmark scores. The report
    counts content groups, leaking groups, and affected documents; a
    nonzero leak count means dedup must run BEFORE splitting (the
    id-hash split assigns duplicate CONTENT independently per doc id —
    exactly why curation pipelines dedup first).

    One shuffle on the 16-byte content hash with partial aggregation,
    then a 1-row rollup."""
    d = load_table(spark, sf_dir, "documents").select(
        F.md5(F.col("text").cast("binary")).alias("h"),
        F.when(hash_unit(F.col("doc_id"), SPLIT_SEED) < SPLIT_TRAIN, "train")
        .when(hash_unit(F.col("doc_id"), SPLIT_SEED) < SPLIT_VAL, "val")
        .otherwise("test")
        .alias("split"),
    )
    groups = d.groupBy("h").agg(
        F.count_distinct("split").alias("n_splits"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return groups.agg(
        F.count(F.lit(1)).alias("n_content_groups"),
        F.sum(F.when(F.col("n_splits") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_leaking_groups"),
        F.sum(F.when(F.col("n_splits") > 1, F.col("n_docs")).otherwise(0))
        .cast("long")
        .alias("n_leaking_docs"),
    )


HH_K = 10
HH_SLOTS = 64


@query(
    "heavy_hitters_verified",
    oracle=f"""
    SELECT token, count(*) AS cnt FROM (
        SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
        FROM documents
    ) GROUP BY token ORDER BY cnt DESC, token LIMIT {HH_K}
    """,
)
def heavy_hitters_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-{HH_K} tokens via the sketch-then-verify pattern: a
    Misra–Gries summary ({HH_SLOTS} slots) runs per partition inside
    ``mapInPandas`` — bounded memory no matter how many distinct tokens
    stream through — then the surviving candidates are exactly recounted in
    one semi-joined aggregation and ranked.

    Why this shape at 100 TB: a plain groupBy(token) shuffles EVERY distinct
    token (billions for web text); here the shuffle carries only per-partition
    candidate survivors (<= partitions x {HH_SLOTS} rows) plus the recount of
    the candidate set. MG guarantees any token with per-partition frequency
    > n_p/{HH_SLOTS} survives that partition; the verify pass then makes the
    final counts exact (a candidate superset can only ADD rows to recount,
    never corrupt ranks). On this synthetic corpus the vocabulary (~31) is
    below the slot budget, so candidates are lossless by construction; the
    oracle is the exact global top-{HH_K} and agrees."""
    from collections.abc import Iterator

    import pandas as pd

    d = load_table(spark, sf_dir, "documents")
    tokens = d.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
    )

    def mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for tok in pdf["token"]:
                if tok in counters:
                    counters[tok] += 1
                elif len(counters) < HH_SLOTS:
                    counters[tok] = 1
                else:
                    # decrement-all step: drop zeroed slots
                    dead = []
                    for k in counters:
                        counters[k] -= 1
                        if counters[k] == 0:
                            dead.append(k)
                    for k in dead:
                        del counters[k]
        yield pd.DataFrame({"token": list(counters.keys())})

    candidates = (
        tokens.mapInPandas(mg_partition, schema="token string")
        .distinct()
    )
    return (
        tokens.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(HH_K)
    )
