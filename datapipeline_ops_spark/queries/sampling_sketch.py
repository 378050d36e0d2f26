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

from datapipeline_ops_spark.core.registry import QUERIES, query
from datapipeline_ops_spark.functions.hashing import hash64, hash_unit, sql_hash64, sql_hash_unit
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
           CAST(sum(CAST(round(value*100) AS BIGINT))
                FILTER (event_type = 'purchase') AS BIGINT) / 100.0
               AS purchase_value
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
    # value is 2-dp money — sum exact integer cents (round(sum(double), 2)
    # is the partition-order divergence class, functions/money.py); the
    # empty-FILTER NULL passes through the cents sum and the division.
    purchase_val = (
        e.groupBy("user_id")
        .agg(
            (
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.round(F.col("value") * 100, 0).cast("long"),
                    )
                ).cast("double")
                / 100.0
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
    booleans via the two-sided rank test — P(value < q) <= p + eps AND
    P(value <= q) >= p - eps (eps = 1% sketch rank error + 2/n group
    discretization). Two-sided because ties make the one-sided
    |CDF(<=q) - p| <= eps form wrong: at a point mass (all values equal —
    wave-5 fuzz catch) CDF(<=q) is 1.0 at every quantile even though any
    answer inside the mass is rank-perfect. Value-distance would also be
    the wrong test: in a sparse tail the nearest sample can be far from
    the interpolated exact quantile while still being rank-perfect.

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
            ).alias(f"cdf_le_{i}")
            for i in range(len(probs))
        ],
        *[
            F.avg(
                F.when(F.col("value") < F.element_at("approx_q", i + 1), 1.0).otherwise(0.0)
            ).alias(f"cdf_lt_{i}")
            for i in range(len(probs))
        ],
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
            (
                (F.col(f"cdf_lt_{i}") <= F.lit(p) + eps)
                & (F.col(f"cdf_le_{i}") >= F.lit(p) - eps)
            ).alias(f"rank_ok_p{int(p * 100)}")
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


# ---------------------------------------------------------------------------
# Bloom-filter dedup admission (hand-rolled, cross-engine-exact bitmap)
# ---------------------------------------------------------------------------

# 65536 bits as 1024 x 64-bit words; k=3 md5-derived positions per key.
# Spark 4's SQL surface has no public bloom_filter_agg/might_contain, and a
# hand-rolled bitmap is strictly better for the gate: every bit — and thus
# every membership answer INCLUDING the false positives — is reproduced
# exactly by the DuckDB oracle, so the check is value-level, not an
# in-tolerance boolean.
# 63 usable bits per 64-bit word: DuckDB's checked left-shift raises on
# 1 << 63 (sign bit), Spark's wraps — excluding bit 63 keeps both exact.
BLOOM_WORD_BITS = 63
BLOOM_BITS = BLOOM_WORD_BITS * 1024
BLOOM_K = 3
_BLOOM_SEEDS = [911, 912, 913]
_BATCH_MOD = 10  # every 10th doc is the "newly arrived" batch (matches
                 # incremental_dedup's split)


def _bloom_sql_positions(expr: str) -> str:
    return "[" + ", ".join(
        f"{sql_hash64(expr, seed=s)} % {BLOOM_BITS}" for s in _BLOOM_SEEDS
    ) + "]"


@query(
    "bloom_dedup_admission",
    oracle=f"""
    WITH corpus AS MATERIALIZED (
        SELECT doc_id, text, {sql_hash64('text')} AS h
        FROM documents WHERE doc_id % {_BATCH_MOD} <> 0
    ),
    bm AS MATERIALIZED (
        SELECT pos // 63 AS word,
               bit_or(1::BIGINT << CAST(pos % 63 AS INT)) AS w
        FROM (SELECT unnest({_bloom_sql_positions('text')}) AS pos FROM corpus)
        GROUP BY pos // 63
    ),
    batch AS MATERIALIZED (
        SELECT doc_id, {sql_hash64('text')} AS h,
               unnest({_bloom_sql_positions('text')}) AS pos
        FROM documents WHERE doc_id % {_BATCH_MOD} = 0
    ),
    probe AS (
        SELECT doc_id, any_value(h) AS h,
               bool_and(coalesce(
                   (bm.w & (1::BIGINT << CAST(batch.pos % 63 AS INT))) <> 0,
                   false)) AS bloom_maybe
        FROM batch LEFT JOIN bm ON batch.pos // 63 = bm.word
        GROUP BY doc_id
    ),
    ch AS (SELECT DISTINCT h FROM corpus)
    SELECT p.doc_id, p.bloom_maybe,
           ch.h IS NOT NULL AS exact_dup,
           p.bloom_maybe AND ch.h IS NULL AS false_positive
    FROM probe p LEFT JOIN ch ON p.h = ch.h
    """,
)
def bloom_dedup_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter admission for incremental dedup: build a {BLOOM_BITS}-bit
    bitmap over the corpus text hashes ({BLOOM_K} positions per key), probe
    every newly-arrived document, and report the bloom verdict next to the
    exact answer — `false_positive` rows are the admission cost, and a
    false NEGATIVE (exact_dup without bloom_maybe) is impossible by
    construction, which the oracle verifies bit-for-bit.

    Scale shape: the bitmap build is one partial-aggregated rollup to
    <= {BLOOM_BITS // BLOOM_WORD_BITS} words — a FIXED-size structure the batch side
    joins broadcast, so admission never shuffles the corpus (at 1e9+ keys
    production sizes the bitmap to GBs and still broadcasts; the exact
    column here is the audit, not the production path)."""
    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % _BATCH_MOD != 0).select(
        "doc_id", "text", hash64(F.col("text")).alias("h")
    )
    batch = d.filter(F.col("doc_id") % _BATCH_MOD == 0).select(
        "doc_id", "text", hash64(F.col("text")).alias("h")
    )
    positions = F.array(
        *[hash64(F.col("text"), seed=s) % BLOOM_BITS for s in _BLOOM_SEEDS]
    )
    bitmap = (
        corpus.select(F.explode(positions).alias("pos"))
        .select(
            F.expr("pos div 63").alias("word"),
            F.expr("shiftleft(1L, CAST(pos % 63 AS INT))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(bit)").alias("w"))
    )
    probe = (
        batch.select("doc_id", "h", F.explode(positions).alias("pos"))
        .withColumn("word", F.expr("pos div 63"))
        .join(F.broadcast(bitmap), "word", "left")
        .withColumn(
            "hit",
            F.coalesce(
                F.expr("(w & shiftleft(1L, CAST(pos % 63 AS INT))) <> 0"),
                F.lit(False),
            ),
        )
        .groupBy("doc_id")
        .agg(F.any_value("h").alias("h"), F.bool_and("hit").alias("bloom_maybe"))
    )
    ch = corpus.select("h").distinct().withColumn("seen", F.lit(True))
    return (
        probe.join(F.broadcast(ch), "h", "left")
        .select(
            "doc_id",
            "bloom_maybe",
            F.coalesce(F.col("seen"), F.lit(False)).alias("exact_dup"),
            (F.col("bloom_maybe") & F.col("seen").isNull()).alias("false_positive"),
        )
    )


# ---------------------------------------------------------------------------
# Count–Min frequency audit (hand-rolled, cross-engine-exact counters)
# ---------------------------------------------------------------------------

CMS_D = 4     # depth: independent hash rows
CMS_W = 512   # width: counters per row
_CMS_SEEDS = [921, 922, 923, 924]
_CMS_PROBE_MOD = 13  # probe users with user_id % 13 == 0


def _cms_sql_cells(expr: str) -> str:
    return "[" + ", ".join(
        f"{sql_hash64(expr, seed=s)} % {CMS_W}" for s in _CMS_SEEDS
    ) + "]"


@query(
    "count_min_freq_audit",
    oracle=f"""
    WITH cells AS MATERIALIZED (
        SELECT g.j AS j, cols[g.j] AS pos, count(*) AS c
        FROM (SELECT {_cms_sql_cells('user_id')} AS cols FROM events),
             unnest(generate_series(1, {CMS_D})) AS g(j)
        GROUP BY g.j, cols[g.j]
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM events),
    probe AS MATERIALIZED (
        SELECT user_id, CAST(count(*) AS BIGINT) AS exact_n,
               {_cms_sql_cells('user_id')} AS cols
        FROM events WHERE user_id % {_CMS_PROBE_MOD} = 0 GROUP BY user_id
    ),
    probej AS MATERIALIZED (
        SELECT user_id, exact_n, g.j AS j, cols[g.j] AS pos
        FROM probe, unnest(generate_series(1, {CMS_D})) AS g(j)
    ),
    est AS (
        SELECT p.user_id, any_value(p.exact_n) AS exact_n,
               CAST(min(coalesce(c.c, 0)) AS BIGINT) AS cms_estimate
        FROM probej p LEFT JOIN cells c ON c.j = p.j AND c.pos = p.pos
        GROUP BY p.user_id
    )
    SELECT user_id, exact_n, cms_estimate,
           cms_estimate >= exact_n AS never_underestimates,
           CAST(cms_estimate - exact_n AS DOUBLE)
               <= 2.718281828459045 / {CMS_W} * (SELECT total FROM n)
               AS within_eps
    FROM est
    """,
)
def count_min_freq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count–Min sketch frequency audit over event user_ids: build a
    {CMS_D} x {CMS_W} counter table in one partial-aggregated pass, probe a
    deterministic user subset, and emit the estimate next to the exact
    count plus the two CMS guarantees as booleans — `never_underestimates`
    (structural: min over per-row counters that each include the true
    count) and `within_eps` (est - exact <= (e/w) * N, the standard CMS
    error bound at the ~63% confidence of d=1, held with room by d={CMS_D}).
    The sketch is md5-derived, so the oracle reproduces every counter and
    every estimate EXACTLY — the approximation itself is value-gated.

    Scale shape: the build explodes each event into {CMS_D} (row, cell)
    pairs and partial-aggregates to <= {CMS_D * CMS_W} cells per partition
    before the one exchange — a fixed-size mergeable sketch regardless of
    event volume (the reason CMS replaces exact group-bys for frequency
    queries at 100 TB); probes join the broadcast cell table."""
    e = load_table(spark, sf_dir, "events")
    cells_arr = F.array(
        *[hash64(F.col("user_id"), seed=s) % CMS_W for s in _CMS_SEEDS]
    )
    cells = (
        e.select(F.posexplode(cells_arr).alias("j0", "pos"))
        .select((F.col("j0") + 1).alias("j"), "pos")
        .groupBy("j", "pos")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = e.agg(F.count(F.lit(1)).cast("long").alias("total"))
    probe = (
        e.filter(F.col("user_id") % _CMS_PROBE_MOD == 0)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
        .withColumn("cols", cells_arr)
    )
    est = (
        probe.select(
            "user_id", "exact_n", F.posexplode("cols").alias("j0", "pos")
        )
        .select("user_id", "exact_n", (F.col("j0") + 1).alias("j"), "pos")
        .join(F.broadcast(cells), ["j", "pos"], "left")
        .groupBy("user_id")
        .agg(
            F.any_value("exact_n").alias("exact_n"),
            F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("cms_estimate"),
        )
    )
    return est.crossJoin(F.broadcast(total)).select(
        "user_id",
        "exact_n",
        "cms_estimate",
        (F.col("cms_estimate") >= F.col("exact_n")).alias("never_underestimates"),
        (
            (F.col("cms_estimate") - F.col("exact_n")).cast("double")
            <= F.lit(2.718281828459045 / CMS_W) * F.col("total")
        ).alias("within_eps"),
    )


# ---------------------------------------------------------------------------
# KMV (bottom-k / theta) sketch set operations — deterministic, value-gated
# ---------------------------------------------------------------------------

KMV_K = 64
_KMV_MAX = 1 << 60  # hash64 range; v = h / 2^60 in (0, 1)


@query(
    "kmv_set_ops_audit",
    oracle=f"""
    WITH h AS MATERIALIZED (
        SELECT DISTINCT event_type AS t, {sql_hash64("user_id")} AS h FROM events
    ),
    bk AS MATERIALIZED (
        SELECT t, h FROM (
            SELECT t, h, row_number() OVER (PARTITION BY t ORDER BY h) AS rn FROM h
        ) WHERE rn <= {KMV_K}
    ),
    types AS MATERIALIZED (SELECT DISTINCT t FROM h),
    pairs AS MATERIALIZED (
        SELECT a.t AS type_a, b.t AS type_b FROM types a JOIN types b ON a.t < b.t
    ),
    pu AS MATERIALIZED (
        SELECT DISTINCT type_a, type_b, h FROM (
            SELECT p.type_a, p.type_b, bk.h FROM pairs p JOIN bk ON bk.t = p.type_a
            UNION ALL
            SELECT p.type_a, p.type_b, bk.h FROM pairs p JOIN bk ON bk.t = p.type_b
        )
    ),
    ubk AS MATERIALIZED (
        SELECT type_a, type_b, h FROM (
            SELECT type_a, type_b, h,
                   row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn
            FROM pu
        ) WHERE rn <= {KMV_K}
    ),
    ust AS MATERIALIZED (
        SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS n_u, max(h) AS hk
        FROM ubk GROUP BY type_a, type_b
    ),
    rho AS MATERIALIZED (
        SELECT u.type_a, u.type_b, CAST(count(*) AS BIGINT) AS rho
        FROM ubk u
        JOIN bk a ON a.t = u.type_a AND a.h = u.h
        JOIN bk b ON b.t = u.type_b AND b.h = u.h
        GROUP BY u.type_a, u.type_b
    ),
    ex AS MATERIALIZED (
        SELECT a.t AS type_a, b.t AS type_b, CAST(count(*) AS BIGINT) AS exact_inter
        FROM h a JOIN h b ON a.h = b.h AND a.t < b.t
        GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b,
           coalesce(ex.exact_inter, 0) AS exact_inter,
           u.n_u AS n_union_sketch,
           CASE WHEN u.n_u < {KMV_K} THEN CAST(u.n_u AS DOUBLE)
                ELSE ({KMV_K} - 1) / (CAST(u.hk AS DOUBLE) / {_KMV_MAX})
           END AS est_union,
           CASE WHEN u.n_u < {KMV_K} THEN CAST(coalesce(rho.rho, 0) AS DOUBLE)
                ELSE CAST(coalesce(rho.rho, 0) AS DOUBLE) / {KMV_K}
                     * (({KMV_K} - 1) / (CAST(u.hk AS DOUBLE) / {_KMV_MAX}))
           END AS est_inter,
           abs(CASE WHEN u.n_u < {KMV_K} THEN CAST(coalesce(rho.rho, 0) AS DOUBLE)
                    ELSE CAST(coalesce(rho.rho, 0) AS DOUBLE) / {KMV_K}
                         * (({KMV_K} - 1) / (CAST(u.hk AS DOUBLE) / {_KMV_MAX}))
               END - coalesce(ex.exact_inter, 0))
               <= 0.5 * coalesce(ex.exact_inter, 0) + 10.0 AS within_tol
    FROM pairs p
    JOIN ust u ON u.type_a = p.type_a AND u.type_b = p.type_b
    LEFT JOIN rho ON rho.type_a = p.type_a AND rho.type_b = p.type_b
    LEFT JOIN ex ON ex.type_a = p.type_a AND ex.type_b = p.type_b
    """,
)
def kmv_set_ops_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k / theta) sketch set algebra over per-event-type user
    sets: estimate the distinct-user UNION and INTERSECTION of every type
    pair from {KMV_K}-minimum-value sketches, next to the exact
    intersection. Because the sketch is the bottom-k of a deterministic
    md5-derived hash, every sketch member, theta, and ESTIMATE reproduces
    bit-for-bit in the oracle — the approximation itself is value-gated
    (same discipline as bloom_dedup_admission / count_min_freq_audit).
    Sets smaller than k take the exact branch (the sketch IS the set) —
    sf0.001 exercises it, larger SFs exercise the (k-1)/theta estimator.

    Sketch algebra: union sketch = bottom-k of the merged bottom-k's;
    intersection via the rho trick — members of the union sketch present
    in BOTH input sketches (correct because theta_union <= each input
    theta). At 100 TB the production build keeps per-partition bottom-k
    and merges (mergeable, fixed memory, no distinct shuffle); the full
    distinct here exists only to price the exact audit column."""
    from datapipeline_ops_spark.operators.dedup import persist_barrier

    e = load_table(spark, sf_dir, "events")
    # h feeds the sketch build, the type list AND the exact-intersection
    # audit; bk feeds four consumers (both union legs, both rho probes).
    # Without barriers each consumer re-derived the events scan + distinct
    # (+ the bottom-k window) — 44 exchanges / 36 scans in the r14 census.
    h = persist_barrier(
        e.select(
            F.col("event_type").alias("t"), hash64(F.col("user_id")).alias("h")
        ).distinct(),
        f"kmv_h:{sf_dir}",
    )
    wk = Window.partitionBy("t").orderBy("h")
    bk = persist_barrier(
        h.withColumn("rn", F.row_number().over(wk)).filter(
            F.col("rn") <= KMV_K
        ).select("t", "h"),
        f"kmv_bk:{sf_dir}",
    )
    types = h.select("t").distinct()
    pairs = (
        types.select(F.col("t").alias("type_a"))
        .join(types.select(F.col("t").alias("type_b")), F.col("type_a") < F.col("type_b"))
    )
    pu = (
        pairs.join(F.broadcast(bk), bk["t"] == pairs["type_a"])
        .select("type_a", "type_b", "h")
        .unionAll(
            pairs.join(F.broadcast(bk), bk["t"] == pairs["type_b"]).select(
                "type_a", "type_b", "h"
            )
        )
        .distinct()
    )
    wu = Window.partitionBy("type_a", "type_b").orderBy("h")
    # union sketch feeds its stats row AND both rho probes — bounded
    # (K rows per type pair), barrier it
    ubk = persist_barrier(
        pu.withColumn("rn", F.row_number().over(wu)).filter(
            F.col("rn") <= KMV_K
        ).select("type_a", "type_b", "h"),
        f"kmv_ubk:{sf_dir}",
    )
    ust = ubk.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_u"), F.max("h").alias("hk")
    )
    rho = (
        ubk.join(
            F.broadcast(bk.select(F.col("t").alias("type_a"), "h")),
            ["type_a", "h"],
        )
        .join(
            F.broadcast(bk.select(F.col("t").alias("type_b"), "h")),
            ["type_b", "h"],
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("rho"))
    )
    ex = (
        h.select(F.col("t").alias("type_a"), "h")
        .join(h.select(F.col("t").alias("type_b"), "h"), "h")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_inter"))
    )
    est_union = F.when(
        F.col("n_u") < KMV_K, F.col("n_u").cast("double")
    ).otherwise(
        (KMV_K - 1) / (F.col("hk").cast("double") / float(_KMV_MAX))
    )
    rho_d = F.coalesce(F.col("rho"), F.lit(0)).cast("double")
    est_inter = F.when(F.col("n_u") < KMV_K, rho_d).otherwise(
        rho_d / KMV_K * ((KMV_K - 1) / (F.col("hk").cast("double") / float(_KMV_MAX)))
    )
    exact = F.coalesce(F.col("exact_inter"), F.lit(0))
    return (
        pairs.join(ust, ["type_a", "type_b"])
        .join(rho, ["type_a", "type_b"], "left")
        .join(ex, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            exact.alias("exact_inter"),
            F.col("n_u").alias("n_union_sketch"),
            est_union.alias("est_union"),
            est_inter.alias("est_inter"),
            (F.abs(est_inter - exact) <= 0.5 * exact + 10.0).alias("within_tol"),
        )
    )


# ---------------------------------------------------------------------------
# Distributed Poisson bootstrap (error bars without resampling passes)
# ---------------------------------------------------------------------------

BOOT_R = 20          # bootstrap replicates
# per-replicate uniforms come from ONE unseeded md5 hash of the string
# event_id || '_' || r (replicate id concatenated into the hash input) —
# identical in the engine and the oracle, no seed table involved
# Poisson(1) inverse-CDF thresholds (k = 0..5; else 6): the classic
# Poisson-bootstrap approximation of multinomial resampling — each row
# contributes an independent Poisson(1) weight per replicate, so ONE scan
# computes every replicate without materializing any resample
_POIS_CDF = (
    0.367879441171,
    0.735758882343,
    0.919698602929,
    0.981011843124,
    0.996340153173,
    0.999405815182,
)


def _pois_case_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POIS_CDF)
    )
    return f"(CASE {branches} ELSE 6 END)"


@query(
    "bootstrap_mean_ci",
    oracle=f"""
    WITH reps AS MATERIALIZED (
        SELECT g.r AS r,
               {_pois_case_sql(f"({sql_hash64('event_id || :_: || g.r')} % 1000000) / 1000000.0".replace(":_:", "'_'"))} AS w,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM (SELECT event_id, value FROM events WHERE value IS NOT NULL),
             unnest(generate_series(1, {BOOT_R})) AS g(r)
    ),
    means AS MATERIALIZED (
        SELECT r, CAST(sum(w * cents) AS DOUBLE)
                      / (100.0 * CAST(sum(w) AS DOUBLE)) AS rep_mean
        FROM reps WHERE w > 0 GROUP BY r
    ),
    base AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
                   / (100.0 * CAST(count(*) AS DOUBLE)) AS mean_value
        FROM events WHERE value IS NOT NULL
    )
    SELECT b.n, b.mean_value,
           (SELECT quantile_cont(rep_mean, 0.025) FROM means) AS ci_lo,
           (SELECT quantile_cont(rep_mean, 0.975) FROM means) AS ci_hi,
           (SELECT stddev_samp(rep_mean) FROM means) AS boot_se,
           CAST({BOOT_R} AS INT) AS n_replicates
    FROM base b
    """,
)
def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for the mean event value:
    each row contributes an independent Poisson(1) weight to each of
    {BOOT_R} replicates (deterministic: inverse-CDF of a seeded md5
    uniform), replicate means come out of ONE partial-aggregated scan,
    and the 95% CI / bootstrap SE are quantiles over the {BOOT_R}-row
    replicate frame. This is how error bars are priced at 100 TB — the
    classic resample-R-times bootstrap would be R full passes (or a
    driver-memory sample); the Poisson trick folds all replicates into
    one scan with a 7-branch CASE per (row, replicate).

    Determinism: weights are exact integers from md5 thresholds, so both
    engines build identical replicates; each replicate mean is ONE double
    division of exact integer sufficient statistics (weighted cents /
    weighted count) — bit-identical across engines, so a constant-value
    corpus yields exactly-equal replicate means and an exactly-zero
    bootstrap SE on both sides (the float `sum(w*value)/sum(w)` form left
    engine-specific e-19 cancellation noise in stddev_samp — wave-5 fuzz
    catch). The interpolated CI quantiles then act on identical doubles."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    u = hash_unit(
        F.concat(F.col("event_id").cast("string"), F.lit("_"), F.col("r").cast("string"))
    )
    pois = F.when(u < _POIS_CDF[0], 0)
    for k in range(1, len(_POIS_CDF)):
        pois = pois.when(u < _POIS_CDF[k], k)
    pois = pois.otherwise(6)
    reps = (
        e.select(
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            F.explode(F.sequence(F.lit(1), F.lit(BOOT_R))).alias("r"),
        )
        .withColumn("w", pois)
        .filter(F.col("w") > 0)
    )
    means = reps.groupBy("r").agg(
        (
            F.sum(F.col("w") * F.col("cents")).cast("double")
            / (F.lit(100.0) * F.sum("w").cast("double"))
        ).alias("rep_mean")
    )
    # 20-row replicate frame: global aggregation is trivially bounded
    ci = means.agg(
        F.expr("percentile(rep_mean, 0.025)").alias("ci_lo"),
        F.expr("percentile(rep_mean, 0.975)").alias("ci_hi"),
        F.stddev_samp("rep_mean").alias("boot_se"),
    )
    base = e.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (
            F.sum(F.round(F.col("value") * 100).cast("long")).cast("double")
            / (F.lit(100.0) * F.count(F.lit(1)).cast("double"))
        ).alias("mean_value"),
    )
    return base.crossJoin(F.broadcast(ci)).select(
        "n",
        "mean_value",
        "ci_lo",
        "ci_hi",
        "boot_se",
        F.lit(BOOT_R).cast("int").alias("n_replicates"),
    )


# ---------------------------------------------------------------------------
# Leakage-free train/test split (cluster-aware assignment + leak audit)
# ---------------------------------------------------------------------------

_SPLITLF_SEED = 23
_SPLITLF_TRAIN_PCT = 8  # hash % 10 < 8 -> train (80/20)


@query(
    "train_test_split_leakfree",
    oracle=f"""
    WITH a AS MATERIALIZED (
        SELECT doc_id, md5(text) AS ck,
               CASE WHEN {sql_hash64("md5(text)", _SPLITLF_SEED)} % 10
                         < {_SPLITLF_TRAIN_PCT}
                    THEN 'train' ELSE 'test' END AS split
        FROM documents
    ),
    leak AS (
        SELECT CAST(coalesce(sum(CASE WHEN nsp > 1 THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS leaked_clusters
        FROM (SELECT ck, count(DISTINCT split) AS nsp FROM a GROUP BY ck)
    )
    SELECT split, count(*) AS n_docs,
           count(DISTINCT ck) AS n_clusters,
           (SELECT leaked_clusters FROM leak) AS leaked_clusters
    FROM a GROUP BY split
    """,
)
def train_test_split_leakfree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free train/test split: assign by seeded hash of the CONTENT
    key (md5 of the text) instead of the row id, so exact duplicates can
    never straddle the boundary — the eval-contamination failure mode of
    naive row-hash splits (`dataset_split_assign` splits by doc_id and
    would leak every duplicated document). `leaked_clusters` re-derives
    the guarantee from the assignment itself (clusters seen in >1 split)
    rather than trusting the construction — the audit a 100 TB split job
    publishes next to the datasheet. In production the content key widens
    to the near-dup cluster id from the LSH stage (`corpus_curation_e2e`);
    the assignment and audit shapes are identical.

    Scale: one shuffle on the content hash for the audit, one partial-
    aggregated rollup for the counts; the 1-row leak total rides
    broadcast."""
    d = load_table(spark, sf_dir, "documents")
    a = d.select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("ck")
    ).withColumn(
        "split",
        F.when(
            hash64(F.col("ck"), _SPLITLF_SEED) % 10 < _SPLITLF_TRAIN_PCT, "train"
        ).otherwise("test"),
    )
    leak = (
        a.groupBy("ck")
        .agg(F.countDistinct("split").alias("nsp"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("nsp") > 1, 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias("leaked_clusters")
        )
    )
    return (
        a.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("ck").alias("n_clusters"),
        )
        .crossJoin(F.broadcast(leak))
        .select("split", "n_docs", "n_clusters", "leaked_clusters")
    )


# ---------------------------------------------------------------------------
# Hand-rolled HyperLogLog (cross-engine-exact registers and estimate)
# ---------------------------------------------------------------------------

_HLLX_M = 64          # 2^6 registers
_HLLX_ALPHA = 0.709   # standard alpha_m for m = 64
_HLLX_TOL = 0.35      # |rel err| gate; sigma = 1.04/sqrt(64) = 13%


@query(
    "hll_register_sketch",
    oracle=f"""
    WITH h AS MATERIALIZED (
        SELECT {sql_hash64("user_id")} AS h FROM events
    ),
    r AS (
        SELECT h & {_HLLX_M - 1} AS bucket,
               max(CASE WHEN (h >> 6) = 0 THEN 55
                        ELSE CAST(round(log2((h >> 6) & (-(h >> 6)))) AS INT) + 1
                   END) AS reg
        FROM h GROUP BY 1
    ),
    spine AS (SELECT g.b AS bucket FROM unnest(generate_series(0, {_HLLX_M - 1})) AS g(b)),
    regs AS (
        SELECT spine.bucket, coalesce(r.reg, 0) AS reg
        FROM spine LEFT JOIN r USING (bucket)
    ),
    agg AS (
        SELECT sum(pow(2.0, -reg)) AS raw,
               CAST(sum(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v0
        FROM regs
    ),
    x AS (SELECT count(DISTINCT user_id) AS exact_users FROM events),
    e AS (
        SELECT raw, v0, exact_users,
               CASE WHEN {_HLLX_ALPHA} * {_HLLX_M} * {_HLLX_M} / raw
                         <= 2.5 * {_HLLX_M} AND v0 > 0
                    THEN {_HLLX_M} * ln({_HLLX_M}.0 / v0)
                    ELSE {_HLLX_ALPHA} * {_HLLX_M} * {_HLLX_M} / raw
               END AS est
        FROM agg CROSS JOIN x
    )
    SELECT CAST({_HLLX_M} AS INT) AS m,
           exact_users,
           est AS hll_estimate,
           (est - exact_users) / CAST(exact_users AS DOUBLE) AS rel_err,
           abs((est - exact_users) / CAST(exact_users AS DOUBLE))
               <= {_HLLX_TOL} AS within_tol
    FROM e
    """,
)
def hll_register_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog built from scratch with cross-engine-exact values — the
    register-level complement to `approx_distinct_users` (whose engine HLL++
    can only be boolean-audited): bucket = low 6 hash bits, rho = 1 +
    trailing-zero count of the remaining 54 bits (an equally-uniform HLL
    flavor that stays in exact integer arithmetic — round(log2(w & -w)) is
    exact because w & -w is a power of two), registers = per-bucket max.
    The estimate alpha·m²/Σ2^-reg is a 64-term sum of dyadic rationals —
    exact in IEEE double regardless of order — so the oracle matches the
    ESTIMATE itself, not just a tolerance flag. Flajolet's small-range
    correction applies below 2.5m when empty registers remain: linear
    counting m·ln(m/V) (at 15 distinct users the raw estimator reads 53 —
    2.5x off — while linear counting reads within ~5%); the branch
    condition is dyadic-exact arithmetic, so both engines always take the
    same branch.

    Scale: the register build is one partial-aggregated shuffle of
    (bucket, rho) pairs — 64 groups, mergeable map-side, the textbook
    one-pass distinct sketch; the exact count is paid here only because
    this is the audit query."""
    e = load_table(spark, sf_dir, "events")
    h = hash64(F.col("user_id"))
    w = F.shiftright(h, 6)
    rho = F.when(w == 0, F.lit(55)).otherwise(
        F.round(F.log2(w.bitwiseAND(-w))).cast("int") + 1
    )
    regs = (
        e.select(h.bitwiseAND(F.lit(_HLLX_M - 1)).alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("reg"))
    )
    spine = spark.range(_HLLX_M).select(F.col("id").alias("bucket"))
    full = spine.join(regs, "bucket", "left").select(
        F.coalesce(F.col("reg"), F.lit(0)).alias("reg")
    )
    agg = full.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("raw"),
        F.sum(F.when(F.col("reg") == 0, 1).otherwise(0))
        .cast("long")
        .alias("v0"),
    )
    exact = e.agg(F.countDistinct("user_id").alias("exact_users"))
    raw_est = F.lit(_HLLX_ALPHA) * _HLLX_M * _HLLX_M / F.col("raw")
    est = F.when(
        (raw_est <= 2.5 * _HLLX_M) & (F.col("v0") > 0),
        F.lit(float(_HLLX_M)) * F.log(F.lit(float(_HLLX_M)) / F.col("v0")),
    ).otherwise(raw_est)
    rel = (est - F.col("exact_users")) / F.col("exact_users").cast("double")
    return (
        agg.crossJoin(F.broadcast(exact))
        .select(
            F.lit(_HLLX_M).cast("int").alias("m"),
            "exact_users",
            est.alias("hll_estimate"),
            rel.alias("rel_err"),
            (F.abs(rel) <= _HLLX_TOL).alias("within_tol"),
        )
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (A-ES / exponential-sort keys)
# ---------------------------------------------------------------------------

_AES_SEED = 31
_AES_K = 3
_AES_U_MOD = 1_000_000


@query(
    "weighted_sample_aes",
    oracle=f"""
    WITH keyed AS (
        SELECT source, doc_id, n_chars,
               ln(({sql_hash64("doc_id", _AES_SEED)} % {_AES_U_MOD} + 1)
                  / {float(_AES_U_MOD + 1)})
                   / CAST(n_chars AS DOUBLE) AS es_key
        FROM documents WHERE n_chars > 0
    )
    SELECT source, doc_id, n_chars, es_key,
           CAST(rn AS INT) AS rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY source
                                     ORDER BY es_key DESC, doc_id) AS rn
        FROM keyed
    ) WHERE rn <= {_AES_K}
    """,
)
def weighted_sample_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, A-ES (Efraimidis–Spirakis):
    each row draws a deterministic uniform u from a seeded hash and is
    ranked by ln(u)/w — the monotone-equivalent of the classic u^(1/w)
    key — so the top-{_AES_K} per source is an exact weighted sample
    (here weight = document length; heavier docs proportionally likelier).
    Reproducible across runs, engines, and scales, unlike rand()-based
    sampling; u is shifted to (0, 1] so ln never sees zero.

    Scale: one shuffle on source + a per-stratum window; for heavy strata
    the window swaps for a bounded per-partition top-K exactly as
    `stratified_sample_per_source` documents."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (hash64(F.col("doc_id"), _AES_SEED) % _AES_U_MOD + 1) / F.lit(
        float(_AES_U_MOD + 1)
    )
    keyed = d.select(
        "source",
        "doc_id",
        "n_chars",
        (F.log(u) / F.col("n_chars").cast("double")).alias("es_key"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("es_key"), F.asc("doc_id"))
    return (
        keyed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _AES_K)
        .select("source", "doc_id", "n_chars", "es_key", "rank")
    )


# ---------------------------------------------------------------------------
# Bloom-pruned shuffle join (hand-rolled runtime filter + audit)
# ---------------------------------------------------------------------------

_RTF_PRIORITY = "1-URGENT"
_RTF_SEEDS = [931, 932, 933]


def _rtf_positions_sql(expr: str) -> list[str]:
    return [f"({sql_hash64(expr, seed=s)} % {BLOOM_BITS})" for s in _RTF_SEEDS]


@query(
    "bloom_pruned_join",
    oracle=f"""
    WITH keys AS MATERIALIZED (
        SELECT o_orderkey FROM orders WHERE o_orderpriority = '{_RTF_PRIORITY}'
    ),
    bm AS MATERIALIZED (
        SELECT pos // {BLOOM_WORD_BITS} AS word,
               bit_or(CAST(1 AS BIGINT)
                      << CAST(pos % {BLOOM_WORD_BITS} AS INT)) AS w
        FROM (SELECT unnest([{", ".join(_rtf_positions_sql("o_orderkey"))}])
                     AS pos
              FROM keys)
        GROUP BY 1
    ),
    li AS (
        SELECT l_orderkey, l_extendedprice, l_discount,
               {_rtf_positions_sql("l_orderkey")[0]} AS p1,
               {_rtf_positions_sql("l_orderkey")[1]} AS p2,
               {_rtf_positions_sql("l_orderkey")[2]} AS p3
        FROM lineitem
    ),
    probe AS MATERIALIZED (
        SELECT l.l_orderkey, l.l_extendedprice, l.l_discount,
               coalesce(b1.w, 0)
                   & (CAST(1 AS BIGINT) << CAST(l.p1 % {BLOOM_WORD_BITS} AS INT)) <> 0
               AND coalesce(b2.w, 0)
                   & (CAST(1 AS BIGINT) << CAST(l.p2 % {BLOOM_WORD_BITS} AS INT)) <> 0
               AND coalesce(b3.w, 0)
                   & (CAST(1 AS BIGINT) << CAST(l.p3 % {BLOOM_WORD_BITS} AS INT)) <> 0
                   AS hit
        FROM li l
        LEFT JOIN bm b1 ON b1.word = l.p1 // {BLOOM_WORD_BITS}
        LEFT JOIN bm b2 ON b2.word = l.p2 // {BLOOM_WORD_BITS}
        LEFT JOIN bm b3 ON b3.word = l.p3 // {BLOOM_WORD_BITS}
    ),
    j AS (
        SELECT count(*) AS n_joined,
               CAST(sum(CAST(p.l_extendedprice AS DECIMAL(18, 2))
                        * (CAST(1 AS DECIMAL(18, 2))
                           - CAST(p.l_discount AS DECIMAL(18, 2)))) AS DOUBLE)
                   AS revenue
        FROM probe p JOIN keys k ON k.o_orderkey = p.l_orderkey
        WHERE p.hit
    ),
    s AS (
        SELECT count(*) AS n_total,
               CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_bloom_pass
        FROM probe
    )
    SELECT n_total, n_bloom_pass, n_joined,
           n_bloom_pass - n_joined AS n_false_pass,
           CAST(n_total - n_bloom_pass AS DOUBLE) / CAST(n_total AS DOUBLE)
               AS prune_ratio,
           revenue
    FROM s CROSS JOIN j
    """,
)
def bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hand-rolled runtime filter — the join-pruning pattern AQE's
    bloom-filter join applies automatically, built explicitly so the
    pruning is measurable and value-gated: the filtered build side
    ('{_RTF_PRIORITY}' orders) populates a {BLOOM_BITS}-bit bitmap, the
    bitmap rides to every lineitem task as ONE broadcast map row, each
    probe row checks its {len(_RTF_SEEDS)} bit positions entirely
    map-side (no explode, no pre-join shuffle), and only bloom survivors
    enter the real shuffle equi-join. The audit row reports total/pruned/
    joined/false-pass counts — all md5-deterministic, so even the bloom's
    false-positive count value-matches the oracle — plus the
    DECIMAL-stabilized revenue of the true join.

    At 100 TB this is the difference between shuffling 600 B lineitem
    rows and shuffling the ~20% that can match: the filter costs one
    bounded broadcast (the bitmap is fixed-size regardless of build-side
    rows) and trades it for a shuffle proportional to survivors."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    keys = o.filter(F.col("o_orderpriority") == _RTF_PRIORITY).select("o_orderkey")
    positions = F.array(
        *[hash64(F.col("o_orderkey"), seed=s) % BLOOM_BITS for s in _RTF_SEEDS]
    )
    bm = (
        keys.select(F.explode(positions).alias("pos"))
        .select(
            F.expr(f"pos div {BLOOM_WORD_BITS}").alias("word"),
            F.expr(
                f"shiftleft(1L, CAST(pos % {BLOOM_WORD_BITS} AS INT))"
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(bit)").alias("w"))
    )
    bmrow = bm.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "w"))).alias("bmap")
    )
    hit = F.lit(True)
    probe = li.crossJoin(F.broadcast(bmrow))
    for i, s in enumerate(_RTF_SEEDS, start=1):
        pos = (hash64(F.col("l_orderkey"), seed=s) % BLOOM_BITS).alias(f"p{i}")
        probe = probe.withColumn(f"p{i}", pos)
        word = F.expr(f"p{i} div {BLOOM_WORD_BITS}")
        bit = F.expr(f"shiftleft(1L, CAST(p{i} % {BLOOM_WORD_BITS} AS INT))")
        hit = hit & (
            F.coalesce(F.element_at(F.col("bmap"), word), F.lit(0)).bitwiseAND(bit)
            != 0
        )
    probe = probe.withColumn("hit", hit)
    stats = probe.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("hit"), 1).otherwise(0)).cast("long").alias("n_bloom_pass"),
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    )
    j = (
        probe.filter(F.col("hit"))
        .join(keys, F.col("l_orderkey") == F.col("o_orderkey"))
        .agg(
            F.count(F.lit(1)).alias("n_joined"),
            F.sum(rev).cast("double").alias("revenue"),
        )
    )
    return stats.crossJoin(F.broadcast(j)).select(
        "n_total",
        "n_bloom_pass",
        "n_joined",
        (F.col("n_bloom_pass") - F.col("n_joined")).alias("n_false_pass"),
        (
            (F.col("n_total") - F.col("n_bloom_pass")).cast("double")
            / F.col("n_total").cast("double")
        ).alias("prune_ratio"),
        "revenue",
    )


# ---------------------------------------------------------------------------
# hll_mergeability_audit — the distributed-correctness proof for the sketch
# ---------------------------------------------------------------------------


@query(
    "hll_mergeability_audit",
    oracle=f"""
    WITH h AS MATERIALIZED (
        SELECT {sql_hash64("user_id")} AS h, user_id % 2 AS grp FROM events
    ),
    rho AS MATERIALIZED (
        SELECT h & {_HLLX_M - 1} AS bucket, grp,
               CASE WHEN (h >> 6) = 0 THEN 55
                    ELSE CAST(round(log2((h >> 6) & (-(h >> 6)))) AS INT) + 1
               END AS rho
        FROM h
    ),
    regs AS (
        SELECT bucket,
               max(CASE WHEN grp = 0 THEN rho END) AS reg_a,
               max(CASE WHEN grp = 1 THEN rho END) AS reg_b,
               max(rho) AS reg_all
        FROM rho GROUP BY bucket
    ),
    audit AS (
        SELECT CAST(count(*) AS BIGINT) AS n_buckets_seen,
               CAST(sum(CASE WHEN greatest(coalesce(reg_a, 0), coalesce(reg_b, 0))
                                  <> reg_all THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_mismatch
        FROM regs
    )
    SELECT CAST({_HLLX_M} AS INT) AS m, n_buckets_seen, n_mismatch,
           (n_mismatch = 0) AS merge_exact
    FROM audit
    """,
)
def hll_mergeability_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The property that makes HLL distributable, PROVEN on data: registers
    built independently on two disjoint shards (even/odd users) and merged
    by per-bucket max must equal the registers built over the whole table
    — max is the sketch's commutative monoid, so shard-then-merge is
    exact, which is precisely why the register build can partial-aggregate
    map-side and why per-partition sketches can union across a cluster
    (or across days in an incremental rollup) with zero error.

    Exactness: registers are integers; the audit compares integers.

    Scale: ONE fact scan computes all three register sets via conditional
    max aggregation (no self-union, no second pass); the audit runs on
    the {_HLLX_M}-row register table."""
    e = load_table(spark, sf_dir, "events")
    h = hash64(F.col("user_id"))
    w = F.shiftright(h, 6)
    rho = F.when(w == 0, F.lit(55)).otherwise(
        F.round(F.log2(w.bitwiseAND(-w))).cast("int") + 1
    )
    rows = e.select(
        h.bitwiseAND(F.lit(_HLLX_M - 1)).alias("bucket"),
        (F.col("user_id") % 2).alias("grp"),
        rho.alias("rho"),
    )
    regs = rows.groupBy("bucket").agg(
        F.max(F.when(F.col("grp") == 0, F.col("rho"))).alias("reg_a"),
        F.max(F.when(F.col("grp") == 1, F.col("rho"))).alias("reg_b"),
        F.max("rho").alias("reg_all"),
    )
    audit = regs.agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets_seen"),
        F.sum(
            F.when(
                F.greatest(
                    F.coalesce("reg_a", F.lit(0)), F.coalesce("reg_b", F.lit(0))
                )
                != F.col("reg_all"),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_mismatch"),
    )
    return audit.select(
        F.lit(_HLLX_M).cast("int").alias("m"),
        "n_buckets_seen",
        "n_mismatch",
        (F.col("n_mismatch") == 0).alias("merge_exact"),
    )


# ---------------------------------------------------------------------------
# neyman_allocation_plan
# ---------------------------------------------------------------------------

_NEY_BUDGET = 1000


@query(
    "neyman_allocation_plan",
    oracle=f"""
    WITH cents AS MATERIALIZED (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
        FROM events
    ),
    strata AS MATERIALIZED (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(c) AS BIGINT) AS s1,
               CAST(sum(c * c) AS BIGINT) AS s2
        FROM cents GROUP BY event_type
    ),
    scored AS MATERIALIZED (
        SELECT event_type, n,
               CAST(n AS DOUBLE)
                   * sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                          / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS nh_sh
        FROM strata
    )
    SELECT event_type, n AS stratum_size, nh_sh,
           CASE WHEN sum(nh_sh) OVER () > 0
                THEN CAST(round({_NEY_BUDGET} * nh_sh / sum(nh_sh) OVER ())
                          AS BIGINT)
                ELSE NULL END AS n_alloc
    FROM scored
    """,
)
def neyman_allocation_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sampling allocation: a fixed sample budget
    of {_NEY_BUDGET} rows split across strata proportional to N_h·S_h
    (stratum size x stratum std dev) — the allocation that minimizes the
    estimator variance for a fixed budget, i.e. the statistically-correct
    replacement for 'sample 1% of everything' when strata differ in
    spread. Feeds weighted_sample_per_source with its per-stratum counts.

    Exactness: values are quantized to integer cents, so N·S_h reduces to
    sqrt((n·Σx² - (Σx)²)/n²) over exact integer sums — one fixed float op
    chain per stratum; the allocation divides by the window total of
    |strata| such values (sum over 5 strata of bit-identical doubles in
    group order — DuckDB and Spark both sum the tiny frame in one
    partition after the aggregate, and the hasher normalizes the rounded
    integer allocation anyway).

    Scale: one partial-agg moment pass (count/sum/sum-of-squares are the
    mergeable sufficient statistics), then O(|strata|) arithmetic."""
    cents = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("c")
    )
    strata = cents.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    nh_sh = F.col("n").cast("double") * F.sqrt(
        (
            F.col("n").cast("double") * F.col("s2").cast("double")
            - F.col("s1").cast("double") * F.col("s1").cast("double")
        )
        / (F.col("n").cast("double") * F.col("n").cast("double"))
    )
    scored = strata.select("event_type", "n", nh_sh.alias("nh_sh"))
    w = Window.partitionBy()
    # every stratum constant -> every S_h = 0 -> the allocation denominator
    # is 0: ANSI Spark raises where DuckDB yields NaN — NULL-guard both
    # engines (oracle-parity fuzzer, round 9)
    tot = F.sum("nh_sh").over(w)
    return scored.select(
        "event_type",
        F.col("n").alias("stratum_size"),
        "nh_sh",
        F.when(
            tot > 0,
            F.round(F.lit(_NEY_BUDGET) * F.col("nh_sh") / tot).cast("long"),
        ).alias("n_alloc"),
    )


# ---------------------------------------------------------------------------
# neardup_split_leakage — SOFT leakage across train/val/test splits
# ---------------------------------------------------------------------------


def _neardup_split_leakage_oracle() -> str:
    from datapipeline_ops_spark.queries.dedup import _pairs_cte

    def split_case(col: str) -> str:
        u = sql_hash_unit(col, SPLIT_SEED)
        return (
            f"CASE WHEN {u} < {SPLIT_TRAIN} THEN 'train'"
            f" WHEN {u} < {SPLIT_VAL} THEN 'val' ELSE 'test' END"
        )

    return (
        "WITH "
        + _pairs_cte()
        + f""",
    labeled AS (
        SELECT doc_a, doc_b,
               {split_case("doc_a")} AS sa,
               {split_case("doc_b")} AS sb
        FROM pairs
    ),
    crossed AS MATERIALIZED (
        SELECT least(sa, sb) AS split_a, greatest(sa, sb) AS split_b,
               doc_a, doc_b
        FROM labeled WHERE sa <> sb
    ),
    long AS (
        SELECT split_a, split_b, doc_a AS doc FROM crossed
        UNION ALL
        SELECT split_a, split_b, doc_b FROM crossed
    )
    SELECT c.split_a, c.split_b,
           CAST(count(*) AS BIGINT) AS n_pairs,
           (SELECT count(DISTINCT doc) FROM long l
            WHERE l.split_a = c.split_a AND l.split_b = c.split_b)
               AS n_leaked_docs
    FROM crossed c GROUP BY c.split_a, c.split_b
    """
    )


@query("neardup_split_leakage", oracle=None)  # assigned below
def neardup_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOFT train/val/test leakage: near-duplicate pairs (MinHash-LSH
    candidates verified at Jaccard >= 0.5 — the ``neardup_clusters``
    machinery) whose two documents land in DIFFERENT hash splits. This is
    the leakage ``split_leakage_audit`` structurally misses: that audit
    groups by exact md5(text), so a test document that is a lightly
    edited or shuffled copy of a training document sails through while
    still inflating eval scores. Per unordered split pair: the cross-pair
    count and the number of distinct documents touched by any such pair.

    Scale: identical to the near-dup path (bucketed LSH, bucket cap, no
    all-pairs stage); the split label is a deterministic hash of doc_id,
    so the cross-split predicate prunes candidates BEFORE the Jaccard
    verify via ``pair_filter`` — no extra scan, join, or broadcast is
    added to the dedup pipeline it rides."""
    from datapipeline_ops_spark.operators.dedup import with_shingle_hashes
    from datapipeline_ops_spark.queries.dedup import _lsh_verified_pairs

    def split_col(c):
        u = hash_unit(c, SPLIT_SEED)
        return (
            F.when(u < SPLIT_TRAIN, "train")
            .when(u < SPLIT_VAL, "val")
            .otherwise("test")
        )

    d = with_shingle_hashes(load_table(spark, sf_dir, "documents"), "doc_id")
    cross = split_col(F.col("doc_a")) != split_col(F.col("doc_b"))
    pairs = _lsh_verified_pairs(d, pair_filter=cross)
    crossed = pairs.select(
        F.least(split_col(F.col("doc_a")), split_col(F.col("doc_b"))).alias("split_a"),
        F.greatest(split_col(F.col("doc_a")), split_col(F.col("doc_b"))).alias("split_b"),
        "doc_a",
        "doc_b",
    )
    docs_long = crossed.select("split_a", "split_b", F.col("doc_a").alias("doc")).unionAll(
        crossed.select("split_a", "split_b", F.col("doc_b").alias("doc"))
    )
    leaked = docs_long.groupBy("split_a", "split_b").agg(
        F.count_distinct("doc").alias("n_leaked_docs")
    )
    return (
        crossed.groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .join(leaked, ["split_a", "split_b"])
        .select("split_a", "split_b", "n_pairs", "n_leaked_docs")
    )


QUERIES["neardup_split_leakage"].oracle = _neardup_split_leakage_oracle()
