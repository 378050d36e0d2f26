"""Dedup queries over the ``documents`` corpus (exact, MinHash+LSH, SimHash,
n-gram Jaccard). All signatures/buckets use the cross-engine md5-derived
hash, so the DuckDB oracle reproduces every value exactly — the correctness
gate checks the *full pipeline* (shingle → sign → band → pair → verify), not
just row counts.

Scale shape (100 TB corpus):
- signatures are per-row array expressions — narrow, no shuffle;
- the only shuffles are the equi-join on (band, bucket) for candidates and
  the final pair dedup — both on compact integer keys;
- exact verification touches only candidate pairs, never the full cross
  product.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from datapipeline_ops_spark.core.registry import QUERIES, query
from datapipeline_ops_spark.functions.hashing import hash64, sql_hash64
from datapipeline_ops_spark.operators.dedup import (
    LSH_BANDS,
    LSH_MAX_BUCKET,
    MINHASH_ABC,
    MINHASH_K,
    MINHASH_P,
    SIMHASH_BITS,
    SIMHASH_RADIUS,
    jaccard,
    lsh_band_buckets,
    minhash_signature_from_hashes,
    persist_barrier,
    simhash,
    simhash_segments,
    with_shingle_hashes,
)
from datapipeline_ops_spark.functions.text import tokens
from datapipeline_ops_spark.tables import load_table, local_frame

# ---------------------------------------------------------------------------
# Shared oracle CTEs
# ---------------------------------------------------------------------------

def _sh_cte(rel: str = "documents") -> str:
    """Shingle CTE over any relation exposing (doc_id, text)."""
    return f"""
    sh AS (
        SELECT doc_id, list_distinct(
            CASE WHEN len(t) >= 3
                 THEN list_transform(generate_series(1, len(t) - 2),
                                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                 ELSE [text] END) AS sh
        FROM (SELECT doc_id, text, regexp_split_to_array(text, '\\s+') AS t FROM {rel})
    )
"""


_SH_CTE = _sh_cte()


# Hash arrays mirror with_shingle_hashes: shingle strings end here; every
# downstream stage (signatures, bands, verification) works on the 60-bit
# hashes in BOTH engines, so parity holds by construction.
def _hs_cte(rel: str = "documents") -> str:
    return (
        _sh_cte(rel)
        + f""",
    hsv AS (
        SELECT doc_id,
               list_distinct(list_transform(sh, s -> {sql_hash64('s')})) AS hs
        FROM sh
    )
"""
    )


_HS_CTE = _hs_cte()

_SIG_ELEMS = ", ".join(
    f"list_min(list_transform(hs, h -> "
    f"(({a} * (h & 1073741823)) + ({b} * (h >> 30)) + {c}) % {MINHASH_P}))"
    for a, b, c in MINHASH_ABC
)
def _sig_cte(rel: str = "documents") -> str:
    return _hs_cte(rel) + f", sig AS (SELECT doc_id, [{_SIG_ELEMS}] AS sig FROM hsv)"


_SIG_CTE = _sig_cte()

_ROWS_PER_BAND = MINHASH_K // LSH_BANDS
_BUCKET_EXPR = sql_hash64(
    "CAST(b.band AS VARCHAR) || ':' || "
    + " || ':' || ".join(f"CAST(sig[{_ROWS_PER_BAND} * b.band + {r + 1}] AS VARCHAR)" for r in range(_ROWS_PER_BAND))
)
def _bands_cte(rel: str = "documents") -> str:
    # bands applies the same bucket-size cap as _lsh_verified_pairs, so the
    # oracle and the engine skip identical degenerate buckets.
    return (
        _sig_cte(rel)
        + f""",
    bands_raw AS (
        SELECT doc_id, b.band AS band, {_BUCKET_EXPR} AS bucket
        FROM sig, LATERAL (SELECT unnest(generate_series(0, {LSH_BANDS - 1})) AS band) AS b
    ),
    bands AS (
        SELECT doc_id, band, bucket FROM (
            SELECT *, count(*) OVER (PARTITION BY band, bucket) AS bsz FROM bands_raw
        ) WHERE bsz <= {LSH_MAX_BUCKET}
    )
"""
    )


_BANDS_CTE = _bands_cte()


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash, min(doc_id) AS keeper_id, count(*) AS group_size
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: one shuffle on a 16-byte key, keeper =
    min doc_id per group (deterministic under any partitioning)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text").cast("binary")).alias("text_hash"))
        .agg(F.min("doc_id").alias("keeper_id"), F.count(F.lit(1)).alias("group_size"))
    )


@query(
    "dedup_exact_keepers",
    oracle="""
    SELECT doc_id, lang, source FROM (
        SELECT doc_id, lang, source,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM documents
    ) WHERE rn = 1
    """,
)
def dedup_exact_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`dropDuplicates`-with-deterministic-keeper: the row kept is the min
    doc_id per content hash, not whichever partition wins the race."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source")
    )


@query(
    "minhash_signatures",
    oracle="WITH "
    + _SIG_CTE
    + """
    SELECT doc_id, CAST(u.j AS INT) AS seed, sig[u.j + 1] AS minhash
    FROM sig, LATERAL (SELECT unnest(generate_series(0, 7)) AS j) AS u
    """,
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=8 seeded MinHash signatures over distinct word 3-shingles — computed
    entirely as array expressions (no explode, no shuffle)."""
    d = with_shingle_hashes(load_table(spark, sf_dir, "documents"), "doc_id")
    return (
        d.withColumn("sig", minhash_signature_from_hashes(F.col("hs")))
        .select("doc_id", F.posexplode("sig").alias("seed", "minhash"))
    )


@query(
    "minhash_lsh_pairs",
    oracle="WITH "
    + _BANDS_CTE
    + """,
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
                                  AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, jac AS jaccard FROM (
        SELECT doc_a, doc_b,
               len(list_intersect(sa.hs, sb.hs)) * 1.0 /
               (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) AS jac
        FROM cand JOIN hsv sa ON cand.doc_a = sa.doc_id
                  JOIN hsv sb ON cand.doc_b = sb.doc_id
    ) WHERE jac >= 0.5
    """,
)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash→LSH→verify near-dup pipeline: band buckets give candidate
    pairs via equi-join (the quadratic pair space never materializes);
    candidates are verified with exact Jaccard on shingle-HASH arrays, τ=0.5
    (equal to string Jaccard modulo 60-bit collisions; the oracle hashes
    identically, so the comparison is still value-exact).

    Plan shape (measured ~10× over the naive form at sf0.1): md5 shingle
    hashes are materialized once behind a persist barrier
    (with_shingle_hashes), so the 8 seeds and 4 band buckets cost integer
    ops, not repeated md5 — and signatures AND both verification join
    sides read the same cached (doc_id, hs) blocks instead of recomputing
    the scan+md5 per branch.
    """
    d = with_shingle_hashes(load_table(spark, sf_dir, "documents"), "doc_id")
    return _lsh_verified_pairs(d)


def _lsh_candidates(d: DataFrame) -> DataFrame:
    """(doc_a, doc_b) LSH band-bucket candidates (bucket-size capped, in-array
    pair generation — see :func:`_lsh_verified_pairs` for why no self-join),
    NOT yet deduplicated across bands."""
    sigs = d.withColumn("sig", minhash_signature_from_hashes(F.col("hs")))
    bands = sigs.select(
        "doc_id", F.explode(lsh_band_buckets(F.col("sig"))).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    buckets = (
        bands.groupBy("band", "bucket")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids").between(2, LSH_MAX_BUCKET))
    )
    return (
        buckets.select(
            F.explode(
                F.filter(
                    F.flatten(
                        F.transform(
                            "ids",
                            lambda a: F.transform(
                                "ids", lambda b: F.struct(a.alias("doc_a"), b.alias("doc_b"))
                            ),
                        )
                    ),
                    lambda s: s.doc_a < s.doc_b,
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
    )


def _lsh_verified_pairs(d: DataFrame, tau: float = 0.5, pair_filter=None) -> DataFrame:
    """sign → band → bucket-group pair generation (with size cap) →
    exact-Jaccard verify, over a barriered (doc_id, hs) frame from
    :func:`with_shingle_hashes`.

    Candidates come from ONE aggregation on (band, bucket) — collect the
    bucket's members and emit in-array ordered pairs — instead of a
    self-join: a self-join reads the band frame twice, and AQE's broadcast
    conversion recomputes the branch per side (with_shingle_hashes failure
    mode), while the groupBy shuffles it once.

    The size filter is the quadratic-blowup guard (SCALE.md failure mode
    #1): a boilerplate bucket of size m would emit m²/2 candidates; buckets
    above ``LSH_MAX_BUCKET`` are dropped (their docs still pair through
    their other bands). Degenerate buckets do materialize their member
    array before the filter — collect_list aggregation spills under the
    sort-based fallback, so a pathological bucket costs disk, not an OOM,
    and is discarded immediately.

    ``pair_filter`` (a Column predicate over doc_a/doc_b) prunes CANDIDATES
    before the verify stage — callers that only want a subset of pairs
    (e.g. incremental_dedup's batch x corpus cross pairs, ~18% of all
    candidates at a 10% batch fraction) skip the two hs-array joins and
    the Jaccard walk for pairs they would discard anyway."""
    cand = _lsh_candidates(d)
    if pair_filter is not None:
        cand = cand.filter(pair_filter)
    cand = cand.distinct()
    verified = (
        cand.join(d.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("hs", "hs_a"), "doc_a")
        .join(d.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("hs", "hs_b"), "doc_b")
        .withColumn("jac", jaccard(F.col("hs_a"), F.col("hs_b")))
        .filter(F.col("jac") >= tau)
    )
    # jaccard ships RAW: it is a small-denominator rational computed through
    # identical integer ops in both engines (bit-equal), and engine round()
    # diverges on exact .5e-6 boundaries (possible when |union| divides 2e6,
    # e.g. 640) — the gate hasher normalizes both sides identically instead.
    return verified.select("doc_a", "doc_b", F.col("jac").alias("jaccard"))


# Posting-list (document-frequency) cap for the inverted-index join: a
# boilerplate shingle occurring in m docs contributes m²/2 join pairs — the
# same quadratic blowup class as an uncapped LSH bucket. Shingles with
# df > NGRAM_MAX_DF are dropped from the INDEX (not from the size
# denominators); true near-dups still intersect through their rarer
# shingles, and the oracle applies the identical cap so the gate stays
# value-exact.
NGRAM_MAX_DF = 256


@query(
    "ngram_jaccard_pairs",
    oracle="WITH "
    + _HS_CTE
    + f""",
    ex_raw AS (SELECT doc_id, unnest(hs) AS s FROM hsv),
    ex AS (
        SELECT doc_id, s FROM (
            SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df FROM ex_raw
        ) WHERE df <= {NGRAM_MAX_DF}
    ),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, len(hs) AS n FROM hsv)
    SELECT doc_a, doc_b, n_inter * 1.0 / (sa.n + sb.n - n_inter) AS jaccard
    FROM inter JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
    WHERE n_inter * 1.0 / (sa.n + sb.n - n_inter) >= 0.5
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs n-gram Jaccard via the inverted-index join (explode
    shingle hashes, equi-join on the 8-byte hash — cheaper shuffle keys than
    strings — count intersections) — the scalable exact algorithm: work is
    proportional to shared-shingle pairs, not |docs|².

    Scale guard: posting lists are df-capped (``NGRAM_MAX_DF``) via a
    window over the SAME (s)-partitioning the pair join needs, so the cap
    rides the exchange the join pays anyway. Pairs whose only shared
    shingles are boilerplate (df > cap) don't pair — intersections through
    rarer shingles are unaffected; sizes (denominators) stay uncapped.
    """
    from datapipeline_ops_spark.operators.dedup import persist_barrier

    d = with_shingle_hashes(load_table(spark, sf_dir, "documents"), "doc_id")
    # barrier the capped index: referenced by BOTH self-join sides, and
    # exchange reuse is best-effort — without it the explode+window subtree
    # is duplicated per side (observed: 2x Window nodes in the plan).
    ex = persist_barrier(
        d.select("doc_id", F.explode("hs").alias("s"))
        .withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("s")))
        .filter(F.col("df") <= NGRAM_MAX_DF)
        .select("doc_id", "s"),
        "ngram_index",
    )
    inter = (
        ex.alias("a")
        .join(ex.alias("b"), (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = d.select("doc_id", F.size("hs").alias("n"))
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "n_b"), "doc_b")
        .withColumn("jaccard", F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
    )


def _fingerprints(spark: SparkSession, sf_dir: str, out: str = "f") -> DataFrame:
    """(doc_id, fingerprint) spread across cores and materialized through a
    shuffle barrier: the fingerprint aggregate is md5-per-token work, and
    without the barrier CollapseProject would re-inline it into every
    downstream segment/xor expression and the pair self-join would
    recompute it per side (rationale in with_shingle_hashes). Lifecycle
    via persist_barrier: one live cached frame per site."""
    from datapipeline_ops_spark.operators.dedup import persist_barrier

    n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    d = load_table(spark, sf_dir, "documents").repartition(n, F.col("doc_id"))
    fp = d.select("doc_id", simhash(tokens(F.col("text"))).alias(out))
    return persist_barrier(fp, f"simhash_fp_{out}")


@query(
    "simhash_fingerprints",
    oracle=f"""
    WITH th AS (
        SELECT doc_id,
               list_transform(regexp_split_to_array(text, '\\s+'),
                              x -> {sql_hash64('x')}) AS hs
        FROM documents
    ),
    votes AS (
        SELECT doc_id, u.bit AS bit,
               list_sum(list_transform(hs, h -> CASE WHEN (h >> u.bit) & 1 = 1
                                                     THEN 1 ELSE -1 END)) AS v
        FROM th, LATERAL (SELECT unnest(generate_series(0, {SIMHASH_BITS - 1})) AS bit) AS u
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
    """,
)
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash fingerprint (bitwise token-hash majority) — token
    multiplicity weights votes, as in the original Charikar construction.
    One md5 per token, one array-accumulator aggregate per doc. 60 bits =
    the full hash64 width; the fingerprint space no longer saturates at
    corpus scale the way the old 16-bit prints did."""
    return _fingerprints(spark, sf_dir, out="simhash")


@query(
    "simhash_near_pairs",
    oracle=f"""
    WITH th AS (
        SELECT doc_id,
               list_transform(regexp_split_to_array(text, '\\s+'),
                              x -> {sql_hash64('x')}) AS hs
        FROM documents
    ),
    votes AS (
        SELECT doc_id, u.bit AS bit,
               list_sum(list_transform(hs, h -> CASE WHEN (h >> u.bit) & 1 = 1
                                                     THEN 1 ELSE -1 END)) AS v
        FROM th, LATERAL (SELECT unnest(generate_series(0, {SIMHASH_BITS - 1})) AS bit) AS u
    ),
    fp AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS f
        FROM votes GROUP BY doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.f, b.f)) AS INT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.f, b.f)) <= {SIMHASH_RADIUS}
    """,
)
def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs within Hamming radius 3 via pigeonhole
    blocking: the 60-bit print splits into radius+1 = 4 segments of 15
    bits, and any pair within the radius must agree on a whole segment —
    so candidates come from an equi-join on (segment, value), never an
    all-pairs product. At corpus scale a segment value holds ~n/2^15 docs,
    so the equi-join stays selective (the old 5-6-bit segments held n/32
    and degenerated toward a cross product). The oracle is the brute-force
    quadratic SQL: identical result set proves the blocking loses nothing."""
    fp = _fingerprints(spark, sf_dir, out="f")
    segs = fp.select("doc_id", "f", F.explode(simhash_segments(F.col("f"))).alias("s")).select(
        "doc_id", "f", F.col("s.seg").alias("seg"), F.col("s.val").alias("val")
    )
    pairs = (
        segs.alias("a")
        .join(
            segs.alias("b"),
            (F.col("a.seg") == F.col("b.seg"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.f").alias("fa"),
            F.col("b.f").alias("fb"),
        )
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))).cast("int"))
        .filter(F.col("hamming") <= SIMHASH_RADIUS)
    )
    return pairs.select("doc_a", "doc_b", "hamming")


def _pairs_cte(rel: str = "documents") -> str:
    """CTE chain through ``pairs`` (verified LSH near-dup pairs, jac >= 0.5)
    over any relation exposing (doc_id, text) — shared by the cluster
    queries here and the incremental-dedup query in curation_extra.py."""
    return (
        _bands_cte(rel)
        + """,
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
                                  AND a.doc_id < b.doc_id
    ),
    pairs AS (
        SELECT doc_a, doc_b FROM (
            SELECT doc_a, doc_b,
                   len(list_intersect(sa.hs, sb.hs)) * 1.0 /
                   (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) AS jac
            FROM cand JOIN hsv sa ON cand.doc_a = sa.doc_id
                      JOIN hsv sb ON cand.doc_b = sb.doc_id
        ) WHERE jac >= 0.5
    )
"""
    )


def _verified_pairs_cte(rel: str = "documents") -> str:
    return (
        _pairs_cte(rel)
        + """,
    edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    nodes AS (SELECT DISTINCT s AS doc_id FROM edges),
    reach AS (
        SELECT doc_id, doc_id AS label FROM nodes
        UNION
        SELECT e.d AS doc_id, r.label FROM reach r JOIN edges e ON e.s = r.doc_id
    )
"""
    )


_VERIFIED_PAIRS_CTE = _verified_pairs_cte()


@query(
    "neardup_clusters",
    oracle="WITH RECURSIVE "
    + _VERIFIED_PAIRS_CTE
    + """
    SELECT doc_id, min(label) AS cluster_id FROM reach GROUP BY doc_id
    """,
)
def neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: verified MinHash pairs → connected components via
    iterative min-label propagation (cluster id = smallest member id). The
    oracle replays the transitive closure as a recursive CTE, so the
    iterative distributed algorithm is value-checked against exact graph
    reachability. This is the `pairs → keeper-per-cluster` step every
    corpus dedup ends with."""
    from datapipeline_ops_spark.operators.dedup import connected_components

    pairs = minhash_lsh_pairs(spark, sf_dir)
    cc = connected_components(pairs, "doc_a", "doc_b")
    return cc.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


@query(
    "corpus_curation_e2e",
    oracle="WITH RECURSIVE q AS ("
    "    SELECT doc_id, text, lang, source FROM documents"
    "    WHERE len(regexp_split_to_array(text, '\\s+')) >= 10"
    "), e AS ("
    "    SELECT doc_id, text, lang, source FROM ("
    "        SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM q"
    "    ) WHERE rn = 1"
    "), "
    + _verified_pairs_cte("e")
    + """,
    clusters AS (SELECT doc_id, min(label) AS cluster_id FROM reach GROUP BY doc_id)
    SELECT e.doc_id, e.lang, e.source
    FROM e LEFT JOIN clusters c ON e.doc_id = c.doc_id
    WHERE c.doc_id IS NULL OR c.cluster_id = e.doc_id
    """,
)
def corpus_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-corpus curation funnel as ONE composed pipeline —
    the operation a 100 TB pretraining-data build runs end-to-end:

    1. **quality gate** (n_tokens >= 10): a pushable scan predicate; junk
       never reaches the expensive stages;
    2. **exact dedup** with deterministic keeper (min doc_id per md5(text)):
       one shuffle on a 16-byte key;
    3. **near-dup dedup**: MinHash → LSH bands → verified Jaccard >= 0.5 →
       connected components → keep only each cluster's min-id member
       (singletons keep themselves via the left anti pattern).

    Funnel ordering is the optimization: every stage strictly shrinks the
    input of the costlier next stage (the reference pipelines use the same
    cheap-first discipline, `pipeline/video_extract_frame.py:332-346`).
    The oracle replays all three stages in DuckDB, with the component step
    as a recursive CTE — so the iterative distributed clustering is
    value-checked against exact reachability on the same funnel.
    """
    from datapipeline_ops_spark.functions.text import tokens
    from datapipeline_ops_spark.operators.dedup import connected_components

    docs = load_table(spark, sf_dir, "documents")
    q = docs.filter(F.size(tokens(F.col("text"))) >= 10)
    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    from datapipeline_ops_spark.operators.dedup import persist_barrier

    # e feeds two consumers (shingle hashing AND the final keeper join);
    # persist so the scan + md5-window shuffle run once, same rationale as
    # the with_shingle_hashes barrier (lifecycle: persist_barrier).
    e = persist_barrier(
        q.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "text", "lang", "source"),
        "curation_exact",
    )
    d = with_shingle_hashes(e, "doc_id")
    pairs = _lsh_verified_pairs(d)
    clusters = connected_components(pairs, "doc_a", "doc_b").select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )
    kept = (
        e.join(clusters, "doc_id", "left")
        .filter(F.col("cluster_id").isNull() | (F.col("cluster_id") == F.col("doc_id")))
    )
    return kept.select("doc_id", "lang", "source")


@query(
    "neardup_cluster_sizes",
    oracle="WITH RECURSIVE "
    + _VERIFIED_PAIRS_CTE
    + """,
    clusters AS (SELECT doc_id, min(label) AS cluster_id FROM reach GROUP BY doc_id)
    SELECT cluster_size, count(*) AS n_clusters FROM (
        SELECT cluster_id, count(*) AS cluster_size FROM clusters GROUP BY cluster_id
    ) GROUP BY cluster_size
    """,
)
def neardup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size distribution: how many clusters of each size
    the verified-pair graph produces — the dedup-health histogram (a fat
    tail of giant clusters means boilerplate is slipping past the bucket
    caps; mostly-pairs means healthy near-dup structure). Two tiny rollups
    over the component labels; the expensive work is the shared
    LSH machinery the pair query already runs."""
    from datapipeline_ops_spark.operators.dedup import connected_components

    pairs = minhash_lsh_pairs(spark, sf_dir)
    cc = connected_components(pairs, "doc_a", "doc_b")
    sizes = cc.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(F.count(F.lit(1)).alias("n_clusters"))


@query(
    "minhash_estimate_audit",
    oracle="WITH "
    + _BANDS_CTE
    + f""",
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
                                  AND a.doc_id < b.doc_id
    ),
    audited AS (
        SELECT doc_a, doc_b,
               len(list_intersect(sa.hs, sb.hs)) * 1.0 /
               (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) AS jaccard,
               CAST(len(list_filter(generate_series(1, {MINHASH_K}),
                                    i -> ga.sig[i] = gb.sig[i])) AS DOUBLE)
                   / {MINHASH_K}.0 AS est
        FROM cand
        JOIN hsv sa ON cand.doc_a = sa.doc_id
        JOIN hsv sb ON cand.doc_b = sb.doc_id
        JOIN sig ga ON cand.doc_a = ga.doc_id
        JOIN sig gb ON cand.doc_b = gb.doc_id
    )
    SELECT doc_a, doc_b, jaccard, est, abs(est - jaccard) AS abs_err,
           avg(abs(est - jaccard)) OVER () AS mean_abs_err,
           max(abs(est - jaccard)) OVER () AS max_abs_err
    FROM audited
    """,
)
def minhash_estimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimator-quality audit for the MinHash sketch: on every LSH
    candidate pair (no Jaccard threshold — the audit wants the full range),
    compare the k={MINHASH_K} signature agreement rate (the MinHash Jaccard
    estimate, E[est] = J) against the exact shingle-hash Jaccard, and report
    per-pair absolute error plus the corpus-wide mean/max.

    This closes the approximation-accountability loop the ANN recall gate
    (`ann_recall_eval`) and the Misra–Gries exact-verify
    (`heavy_hitters_verified`) follow: no sketch ships without a measured
    error against ground truth.  Cost: the same candidate-join plan as
    `minhash_lsh_pairs` plus one 8-int array comparison per pair — exact
    Jaccard is already computed there, so the audit is nearly free, and at
    100 TB it runs on a sampled candidate subset."""
    d = with_shingle_hashes(load_table(spark, sf_dir, "documents"), "doc_id")
    feats = d.withColumn("sig", minhash_signature_from_hashes(F.col("hs")))
    cand = _lsh_candidates(d).distinct()
    a = feats.select(
        F.col("doc_id").alias("doc_a"), F.col("hs").alias("hs_a"), F.col("sig").alias("sig_a")
    )
    b = feats.select(
        F.col("doc_id").alias("doc_b"), F.col("hs").alias("hs_b"), F.col("sig").alias("sig_b")
    )
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v))
        .cast("double")
        / float(MINHASH_K)
    )
    audited = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("jaccard", jaccard(F.col("hs_a"), F.col("hs_b")))
        .withColumn("est", est)
        .withColumn("abs_err", F.abs(F.col("est") - F.col("jaccard")))
    )
    wall = Window.partitionBy()
    return audited.select(
        "doc_a", "doc_b", "jaccard", "est", "abs_err",
        F.avg("abs_err").over(wall).alias("mean_abs_err"),
        F.max("abs_err").over(wall).alias("max_abs_err"),
    )


@query(
    "ngram_novelty_rate",
    oracle="WITH "
    + _HS_CTE
    + """,
    ex AS (SELECT doc_id, unnest(hs) AS s FROM hsv),
    first AS (SELECT s, min(doc_id) AS first_doc FROM ex GROUP BY s)
    SELECT e.doc_id,
           count(*) AS n_grams,
           CAST(sum(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(sum(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS novelty_rate
    FROM ex e JOIN first f USING (s)
    GROUP BY e.doc_id
    """,
)
def ngram_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty profile over corpus order: per document, the fraction of its
    distinct 3-gram shingles whose FIRST occurrence (min doc_id) is this
    document — the memorization/duplication curve used to decide where a
    crawl stops contributing new text (novelty collapsing toward 0 = the
    tail is rehashing the head).

    Shuffle inventory: one explode+group on the 60-bit shingle hash for
    first-occurrence, one join back on the same key (the exchange is
    reusable), one per-doc aggregation — all on compact int keys, never
    shingle strings.  The shingle-hash persist barrier is shared with every
    other dedup query in a combined run."""
    d = with_shingle_hashes(load_table(spark, sf_dir, "documents"), "doc_id")
    ex = d.select("doc_id", F.explode("hs").alias("s"))
    first = ex.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    novel = (F.col("first_doc") == F.col("doc_id")).cast("int")
    return (
        ex.join(first, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(novel).cast("long").alias("n_novel"),
            (F.sum(novel).cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "novelty_rate"
            ),
        )
    )


LSH_TUNE_CONFIGS = [(1, 8), (2, 4), (4, 2), (8, 1)]


def _lsh_tuning_oracle() -> str:
    from datapipeline_ops_spark.functions.hashing import sql_hash64

    base = ("WITH " + _SIG_CTE).replace(
        "hsv AS (", "hsv AS MATERIALIZED ("
    ).replace("sig AS (", "sig AS MATERIALIZED (")
    jac = ("len(list_intersect(sa.hs, sb.hs)) * 1.0 / "
           "(len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs)))")
    parts = [base]
    parts.append(f""",
    ex AS MATERIALIZED (SELECT doc_id, unnest(hs) AS s FROM hsv),
    inter AS (
        SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    sizes AS MATERIALIZED (SELECT doc_id, len(hs) AS n FROM hsv),
    truth AS MATERIALIZED (
        SELECT count(*) AS n_true
        FROM inter JOIN sizes sa ON da = sa.doc_id JOIN sizes sb ON db = sb.doc_id
        WHERE ni * 1.0 / (sa.n + sb.n - ni) >= 0.5
    )""")
    for b, r in LSH_TUNE_CONFIGS:
        elems = " || ':' || ".join(
            f"CAST(sig[bi.band * {r} + {j + 1}] AS VARCHAR)" for j in range(r)
        )
        bucket = sql_hash64(f"CAST(bi.band AS VARCHAR) || ':' || {elems}")
        parts.append(f""",
    bands_{b} AS (
        SELECT doc_id, bi.band AS band, {bucket} AS bucket
        FROM sig, LATERAL (SELECT unnest(generate_series(0, {b - 1})) AS band) AS bi
    ),
    bandsc_{b} AS MATERIALIZED (
        SELECT doc_id, band, bucket FROM (
            SELECT *, count(*) OVER (PARTITION BY band, bucket) AS bsz FROM bands_{b}
        ) WHERE bsz <= {LSH_MAX_BUCKET}
    ),
    cand_{b} AS MATERIALIZED (
        SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
        FROM bandsc_{b} x JOIN bandsc_{b} y
          ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
    ),
    ver_{b} AS MATERIALIZED (
        SELECT count(*) AS n FROM cand_{b} c
        JOIN hsv sa ON c.da = sa.doc_id JOIN hsv sb ON c.db = sb.doc_id
        WHERE {jac} >= 0.5
    ),
    row_{b} AS (
        SELECT {b} AS n_bands, {r} AS rows_per_band,
               (SELECT count(*) FROM cand_{b}) AS n_candidates,
               (SELECT n FROM ver_{b}) AS n_verified
    )""")
    union = "\n    UNION ALL ".join(
        f"SELECT * FROM row_{b}" for b, _ in LSH_TUNE_CONFIGS
    )
    parts.append(f""",
    configs AS ({union})
    SELECT CAST(n_bands AS INT) AS n_bands,
           CAST(rows_per_band AS INT) AS rows_per_band,
           CAST(n_candidates AS BIGINT) AS n_candidates,
           CAST(n_verified AS BIGINT) AS n_verified,
           CAST(t.n_true AS BIGINT) AS n_true,
           CASE WHEN n_candidates = 0 THEN 0.0
                ELSE CAST(n_verified AS DOUBLE) / CAST(n_candidates AS DOUBLE)
           END AS precision,
           CASE WHEN t.n_true = 0 THEN NULL
                ELSE CAST(n_verified AS DOUBLE) / CAST(t.n_true AS DOUBLE)
           END AS recall
    FROM configs CROSS JOIN truth t""")
    return "".join(parts)


@query("lsh_tuning_report", oracle=_lsh_tuning_oracle())
def lsh_tuning_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding-parameter sweep for the MinHash LSH index: for every (bands,
    rows-per-band) factorization of the k=8 signature, the candidate count,
    the verified-pair count at tau=0.5, and precision/recall against the
    EXACT pair set (uncapped inverted-index join, computed once) — the
    tuning table that decides the b x r trade before a 100 TB dedup run
    (more bands = higher recall and more candidates to verify; the S-curve
    P(candidate) = 1 - (1 - J^r)^b moves with each row).

    Everything derives from ONE barriered (doc_id, hs, sig) frame: the
    ground truth is computed once, each config adds a candidates-equi-join
    and a bounded verify.  At full scale the truth column is computed on a
    sampled stratum instead (exact all-pairs truth is itself quadratic) —
    the report's shape is unchanged."""
    d = with_shingle_hashes(load_table(spark, sf_dir, "documents"), "doc_id")
    sigs = d.withColumn("sig", minhash_signature_from_hashes(F.col("hs")))

    ex = d.select("doc_id", F.explode("hs").alias("s"))
    inter = (
        ex.alias("a")
        .join(ex.alias("b"), (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    sizes = d.select("doc_id", F.size("hs").alias("n"))
    truth = (
        inter.join(sizes.withColumnRenamed("doc_id", "da").withColumnRenamed("n", "na"), "da")
        .join(sizes.withColumnRenamed("doc_id", "db").withColumnRenamed("n", "nb"), "db")
        .filter(F.col("ni") / (F.col("na") + F.col("nb") - F.col("ni")) >= 0.5)
        .agg(F.count(F.lit(1)).alias("n_true"))
    )

    branches = []
    for b, r in LSH_TUNE_CONFIGS:
        bands = sigs.select(
            "doc_id", F.explode(lsh_band_buckets(F.col("sig"), bands=b)).alias("bb")
        ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
        buckets = (
            bands.groupBy("band", "bucket")
            .agg(F.collect_list("doc_id").alias("ids"))
            .filter(F.size("ids").between(2, LSH_MAX_BUCKET))
        )
        cand = (
            buckets.select(
                F.explode(
                    F.filter(
                        F.flatten(
                            F.transform(
                                "ids",
                                lambda x: F.transform(
                                    "ids", lambda y: F.struct(x.alias("da"), y.alias("db"))
                                ),
                            )
                        ),
                        lambda s: s.da < s.db,
                    )
                ).alias("p")
            )
            .select("p.da", "p.db")
            .distinct()
        )
        # cand feeds BOTH the verify join and the candidate count below;
        # without a barrier the band-explode + bucket-group + pair-explode
        # chain re-derives per consumer (2x per config — r14 census audit)
        cand = persist_barrier(cand, f"lsh_tune_cand_{b}x{r}:{sf_dir}")
        ver = (
            cand.join(d.select(F.col("doc_id").alias("da"), F.col("hs").alias("hs_a")), "da")
            .join(d.select(F.col("doc_id").alias("db"), F.col("hs").alias("hs_b")), "db")
            .filter(jaccard(F.col("hs_a"), F.col("hs_b")) >= 0.5)
            .agg(F.count(F.lit(1)).alias("n_verified"))
        )
        branches.append(
            cand.agg(F.count(F.lit(1)).alias("n_candidates"))
            .crossJoin(ver)
            .select(
                F.lit(b).cast("int").alias("n_bands"),
                F.lit(r).cast("int").alias("rows_per_band"),
                F.col("n_candidates").cast("long").alias("n_candidates"),
                F.col("n_verified").cast("long").alias("n_verified"),
            )
        )
    from functools import reduce

    configs = reduce(DataFrame.unionByName, branches)
    return configs.crossJoin(F.broadcast(truth)).select(
        "n_bands",
        "rows_per_band",
        "n_candidates",
        "n_verified",
        F.col("n_true").cast("long").alias("n_true"),
        F.when(F.col("n_candidates") == 0, F.lit(0.0))
        .otherwise(F.col("n_verified").cast("double") / F.col("n_candidates").cast("double"))
        .alias("precision"),
        # no true pairs -> recall undefined (NULL), matching the oracle's
        # explicit CASE; ANSI Spark would otherwise raise DIVIDE_BY_ZERO on
        # a duplicate-free corpus (wave-5 fuzz catch)
        F.when(F.col("n_true") == 0, F.lit(None).cast("double"))
        .otherwise(F.col("n_verified").cast("double") / F.col("n_true").cast("double"))
        .alias("recall"),
    )


# ---------------------------------------------------------------------------
# dedup_rate_curve — duplication grows with corpus size; measure the curve
# ---------------------------------------------------------------------------


@query(
    "dedup_rate_curve",
    oracle=f"""
    WITH d AS MATERIALIZED (
        SELECT doc_id, {sql_hash64('text')} AS h FROM documents
    ),
    mx AS (SELECT max(doc_id) AS max_id FROM d),
    pref AS (
        SELECT g.k, d.h
        FROM d CROSS JOIN mx, LATERAL unnest(generate_series(1, 4)) AS g(k)
        WHERE d.doc_id * 4 <= mx.max_id * g.k
    )
    SELECT k AS quartile_prefix,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
           CAST(count(*) - count(DISTINCT h) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS dup_rate
    FROM pref GROUP BY k
    """,
)
def dedup_rate_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate rate as a function of corpus prefix size (25/50/75/
    100% by doc_id): the growth curve that answers 'how much will dedup
    save at 10x the data?' — duplication compounds superlinearly as a
    corpus grows (every new doc can collide with everything before it),
    so the marginal dup rate of the LAST quartile, not today's average,
    is what sizes the dedup stage of the next crawl.

    Scale: one scan hashes each doc once (md5 convention); the 4x prefix
    expansion replicates only the 8-byte hash, not the text, and each
    prefix is one distinct-count aggregate. The prefix predicate is
    integer cross-multiplication against a 1-row broadcast max."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.conv(F.substring(F.md5(F.col("text")), 1, 15), 16, 10).cast("long").alias("h")
    )
    mx = d.agg(F.max("doc_id").alias("max_id"))
    pref = (
        d.crossJoin(F.broadcast(mx))
        .select("doc_id", "h", "max_id", F.explode(F.sequence(F.lit(1), F.lit(4))).alias("k"))
        .filter(F.col("doc_id") * 4 <= F.col("max_id") * F.col("k"))
    )
    return pref.groupBy(F.col("k").alias("quartile_prefix")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_distinct("h").cast("long").alias("n_distinct"),
        (
            (F.count(F.lit(1)) - F.count_distinct("h")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("dup_rate"),
    )


# ---------------------------------------------------------------------------
# dedup_token_savings — what dedup buys, denominated in training tokens
# ---------------------------------------------------------------------------


@query(
    "dedup_token_savings",
    oracle=f"""
    WITH d AS MATERIALIZED (
        SELECT doc_id, source,
               md5(text) AS h,
               CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_tok
        FROM documents
    ),
    keep AS (SELECT h, min(doc_id) AS keeper FROM d GROUP BY h)
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN d.doc_id <> k.keeper THEN 1 ELSE 0 END) AS BIGINT)
               AS n_removed,
           CAST(sum(d.n_tok) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN d.doc_id <> k.keeper THEN d.n_tok ELSE 0 END)
                AS BIGINT) AS tokens_saved,
           CAST(sum(CASE WHEN d.doc_id <> k.keeper THEN d.n_tok ELSE 0 END)
                AS DOUBLE) / CAST(sum(d.n_tok) AS DOUBLE) AS savings_share
    FROM d JOIN keep k ON k.h = d.h
    GROUP BY d.source
    """,
)
def dedup_token_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup impact denominated in the unit that matters — TRAINING TOKENS:
    per source, how many documents exact dedup removes (keeper = min
    doc_id per content hash, groups spanning sources charged to the
    REMOVED doc's source) and how many tokens that saves, as count and
    share. This is the number that justifies (or kills) a dedup stage in
    a budgeted pipeline: 'dedup costs one shuffle and saves 11% of
    compute' is an argument; a pair count isn't.

    Scale: one scan hashes and token-counts each doc; the keeper table is
    an aggregation on the 16-byte hash; the attribution join keys on the
    same hash — the exact-dedup shuffle shape, plus one integer rollup.

    Exactness: all counts integer; the share is one int/int division."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.md5("text").alias("h"),
        F.regexp_count(F.col("text"), F.lit(r"[a-z0-9]+")).cast("long").alias("n_tok"),
    )
    keep = d.groupBy("h").agg(F.min("doc_id").alias("keeper"))
    removed = F.when(F.col("doc_id") != F.col("keeper"), 1).otherwise(0)
    saved = F.when(F.col("doc_id") != F.col("keeper"), F.col("n_tok")).otherwise(0)
    return (
        d.join(keep, "h")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(removed).cast("long").alias("n_removed"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.sum(saved).cast("long").alias("tokens_saved"),
        )
        .withColumn(
            "savings_share",
            F.col("tokens_saved").cast("double") / F.col("total_tokens").cast("double"),
        )
    )


# ---------------------------------------------------------------------------
# cc_consistency_audit — clustering is closed over the pairs that built it
# ---------------------------------------------------------------------------


@query(
    "cc_consistency_audit",
    oracle=None,  # composed from the registered minhash oracle below
)
def cc_consistency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The near-dup clustering invariant, PROVEN on data: every verified
    LSH pair must land inside one connected component (label(a) ==
    label(b) for all edges) — the property that makes 'keep one doc per
    cluster' a valid dedup policy; a single violation would mean the
    pointer-jumping CC left a cluster silently split (exactly the failure
    its max_iters guard exists to prevent). Alongside the zero-violation
    count: component census stats (nodes, clusters, largest component).

    Scale: re-runs the registered pair pipeline once, CC on the (tiny)
    pair graph, and one join of the pair list against the label table —
    all bounded by near-dup volume, not corpus size."""
    from datapipeline_ops_spark.operators.dedup import connected_components

    pairs = QUERIES["minhash_lsh_pairs"].fn(spark, sf_dir).select("doc_a", "doc_b")
    pairs = pairs.persist()
    try:
        cc = connected_components(pairs, "doc_a", "doc_b").persist()
        try:
            la = cc.select(F.col("node").alias("doc_a"), F.col("label").alias("lab_a"))
            lb = cc.select(F.col("node").alias("doc_b"), F.col("label").alias("lab_b"))
            viol = (
                pairs.join(la, "doc_a")
                .join(lb, "doc_b")
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n_pairs"),
                    F.sum(F.when(F.col("lab_a") != F.col("lab_b"), 1).otherwise(0))
                    .cast("long")
                    .alias("n_violations"),
                )
            )
            census = cc.groupBy("label").agg(F.count(F.lit(1)).alias("sz")).agg(
                F.count(F.lit(1)).cast("long").alias("n_clusters"),
                F.sum("sz").cast("long").alias("n_nodes"),
                F.max("sz").cast("long").alias("largest_cluster"),
            )
            out = viol.crossJoin(F.broadcast(census)).select(
                "n_pairs",
                "n_nodes",
                "n_clusters",
                "largest_cluster",
                "n_violations",
                (F.col("n_violations") == 0).alias("closed_under_pairs"),
            )
            return out.localCheckpoint(eager=True)
        finally:
            cc.unpersist()
    finally:
        pairs.unpersist()


def _cc_consistency_oracle() -> str:
    pairs_sql = QUERIES["minhash_lsh_pairs"].oracle
    return f"""
    WITH RECURSIVE p AS MATERIALIZED (
        SELECT doc_a, doc_b FROM ({pairs_sql})
    ),
    edges AS MATERIALIZED (
        SELECT doc_a AS s, doc_b AS d FROM p
        UNION SELECT doc_b, doc_a FROM p
    ),
    nodes AS (SELECT DISTINCT s AS k FROM edges),
    reach AS (
        SELECT k, k AS label FROM nodes
        UNION
        SELECT e.d AS k, r.label FROM reach r JOIN edges e ON e.s = r.k
    ),
    cl AS MATERIALIZED (SELECT k, min(label) AS label FROM reach GROUP BY k),
    viol AS (
        SELECT CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(CASE WHEN a.label <> b.label THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violations
        FROM p JOIN cl a ON a.k = p.doc_a JOIN cl b ON b.k = p.doc_b
    ),
    census AS (
        SELECT CAST(count(*) AS BIGINT) AS n_clusters,
               CAST(sum(sz) AS BIGINT) AS n_nodes,
               CAST(max(sz) AS BIGINT) AS largest_cluster
        FROM (SELECT label, count(*) AS sz FROM cl GROUP BY label)
    )
    SELECT v.n_pairs, c.n_nodes, c.n_clusters, c.largest_cluster,
           v.n_violations, (v.n_violations = 0) AS closed_under_pairs
    FROM viol v CROSS JOIN census c
    """


QUERIES["cc_consistency_audit"].oracle = _cc_consistency_oracle()


# ---------------------------------------------------------------------------
# shuffled_dup_detect — duplicates that exact hashing cannot see
# ---------------------------------------------------------------------------


@query(
    "shuffled_dup_detect",
    oracle="""
    WITH k AS MATERIALIZED (
        SELECT source, md5(text) AS h_exact,
               md5(array_to_string(list_sort(
                   regexp_split_to_array(trim(text), '\\s+')), ' ')) AS h_bag
        FROM documents
    ),
    eg AS MATERIALIZED (
        SELECT h_exact, count(*) AS n FROM k GROUP BY h_exact
    ),
    bg AS MATERIALIZED (
        SELECT h_bag, count(*) AS n FROM k GROUP BY h_bag
    )
    SELECT k.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN eg.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_exact_dup_docs,
           CAST(sum(CASE WHEN bg.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bag_dup_docs,
           CAST(sum(CASE WHEN bg.n > 1 AND eg.n = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_permuted_only
    FROM k JOIN eg ON eg.h_exact = k.h_exact JOIN bg ON bg.h_bag = k.h_bag
    GROUP BY k.source
    """,
)
def shuffled_dup_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permuted-duplicate detector: documents whose SORTED token multiset
    collides (bag-of-words fingerprint) but whose raw text does not — the
    template/spam pattern exact dedup is blind to (same words, reshuffled
    order) and shingle-based near-dup only catches probabilistically.
    Reported per source: exact-dup docs, bag-dup docs, and the PERMUTED-
    ONLY gap between them — when that gap is large, the corpus needs the
    bag fingerprint as a second dedup key, not just md5(text).

    Scale: both fingerprints are one projection (the sort is per-document
    over its own tokens, O(len log len) map-side — never a shuffle); each
    group table aggregates a 16-byte key; the attribution joins key on
    those hashes. Integer counts throughout."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    k = load_table(spark, sf_dir, "documents").select(
        "source",
        F.md5("text").alias("h_exact"),
        F.md5(F.concat_ws(" ", F.sort_array(toks))).alias("h_bag"),
    ).persist()
    try:
        eg = k.groupBy("h_exact").agg(F.count(F.lit(1)).alias("ne"))
        bg = k.groupBy("h_bag").agg(F.count(F.lit(1)).alias("nb"))
        out = (
            k.join(eg, "h_exact")
            .join(bg, "h_bag")
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum(F.when(F.col("ne") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_exact_dup_docs"),
                F.sum(F.when(F.col("nb") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_bag_dup_docs"),
                F.sum(F.when((F.col("nb") > 1) & (F.col("ne") == 1), 1).otherwise(0))
                .cast("long")
                .alias("n_permuted_only"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        k.unpersist()


# ---------------------------------------------------------------------------
# dedup_tau_sensitivity — the dup-rate-vs-threshold curve an operator reads
# before pinning the near-dup tau
# ---------------------------------------------------------------------------

# The sweep starts at the LSH banding's design point (tau >= 0.5, where the
# (bands, rows) choice keeps candidate recall high) — below that the curve
# would understate dup rates because candidates themselves go missing.
_TAU_PCTS = (50, 55, 60, 65, 70, 75, 80, 85, 90)


@query(
    "dedup_tau_sensitivity",
    oracle="WITH "
    + _bands_cte()
    + f""",
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
                                  AND a.doc_id < b.doc_id
    ),
    pj AS (
        SELECT doc_a, doc_b,
               len(list_intersect(sa.hs, sb.hs)) * 1.0 /
               (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs)))
                   AS jac
        FROM cand JOIN hsv sa ON cand.doc_a = sa.doc_id
                  JOIN hsv sb ON cand.doc_b = sb.doc_id
    ),
    spine AS (SELECT unnest([{", ".join(str(t) for t in _TAU_PCTS)}]) AS tau_pct),
    qual AS (
        SELECT s.tau_pct, doc_a, doc_b
        FROM pj CROSS JOIN spine s
        WHERE jac >= CAST(s.tau_pct AS DOUBLE) / 100.0
    ),
    pc AS (SELECT tau_pct, count(*) AS n_pairs FROM qual GROUP BY tau_pct),
    dc AS (
        SELECT tau_pct, CAST(count(DISTINCT d) AS BIGINT) AS n_flagged_docs
        FROM (SELECT tau_pct, doc_a AS d FROM qual
              UNION ALL SELECT tau_pct, doc_b FROM qual)
        GROUP BY tau_pct
    ),
    tot AS (SELECT count(*) AS n_corpus FROM documents)
    SELECT s.tau_pct,
           coalesce(pc.n_pairs, 0) AS n_pairs,
           coalesce(dc.n_flagged_docs, 0) AS n_flagged_docs,
           CAST(coalesce(dc.n_flagged_docs, 0) AS DOUBLE)
               / CAST(t.n_corpus AS DOUBLE) AS flagged_share
    FROM spine s LEFT JOIN pc ON s.tau_pct = pc.tau_pct
                 LEFT JOIN dc ON s.tau_pct = dc.tau_pct
                 CROSS JOIN tot t
    """,
)
def dedup_tau_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup threshold sensitivity: how many pairs and how many flagged
    docs each candidate tau would yield, swept over {_TAU_PCTS} from ONE
    LSH candidate + exact-Jaccard pass — the curve an operator reads before
    pinning the dedup threshold (too low: real content removed; too high:
    templated spam survives). Counts are monotone non-increasing in tau by
    construction; the tau=50 row equals what the production path
    (:func:`_lsh_verified_pairs` at its default) removes.

    Scale shape: the expensive work (banding, capped bucket pair
    generation, hash-array Jaccard) happens ONCE at the loosest tau; the
    9-row integer tau spine broadcasts onto the verified pair table
    (LSH-capped, orders of magnitude smaller than the corpus) and each
    threshold is a filter + low-cardinality rollup. tau compares as
    tau_pct/100.0 against the bit-identical Jaccard double, so the
    qualifying sets match across engines exactly."""
    d = with_shingle_hashes(load_table(spark, sf_dir, "documents"), "doc_id")
    pj = _lsh_verified_pairs(d, tau=0.5)
    spine = local_frame(spark, [(t,) for t in _TAU_PCTS], "tau_pct int")
    qual = pj.crossJoin(F.broadcast(spine)).filter(
        F.col("jaccard") >= F.col("tau_pct").cast("double") / 100.0
    )
    pc = qual.groupBy("tau_pct").agg(F.count(F.lit(1)).alias("n_pairs"))
    dc = (
        qual.select("tau_pct", F.col("doc_a").alias("d"))
        .unionAll(qual.select("tau_pct", F.col("doc_b").alias("d")))
        .groupBy("tau_pct")
        .agg(F.countDistinct("d").alias("n_flagged_docs"))
    )
    tot = load_table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).alias("n_corpus")
    )
    return (
        spine.join(pc, "tau_pct", "left")
        .join(dc, "tau_pct", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "tau_pct",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.coalesce("n_flagged_docs", F.lit(0)).alias("n_flagged_docs"),
            (
                F.coalesce("n_flagged_docs", F.lit(0)).cast("double")
                / F.col("n_corpus").cast("double")
            ).alias("flagged_share"),
        )
    )


# ---------------------------------------------------------------------------
# neardup_cluster_purity — are near-dup clusters real duplicates or
# cross-language/cross-source template merges?
# ---------------------------------------------------------------------------


@query(
    "neardup_cluster_purity",
    oracle="WITH RECURSIVE "
    + _VERIFIED_PAIRS_CTE
    + """,
    clusters AS (SELECT doc_id, min(label) AS cluster_id FROM reach GROUP BY doc_id),
    mem AS (
        SELECT c.cluster_id, d.lang, d.source
        FROM clusters c JOIN documents d ON c.doc_id = d.doc_id
    ),
    bylang AS (
        SELECT cluster_id, lang, count(*) AS cnt
        FROM mem GROUP BY cluster_id, lang
    ),
    langs AS (
        SELECT cluster_id,
               CAST(sum(cnt) AS BIGINT) AS n_members,
               CAST(count(*) AS BIGINT) AS n_langs,
               max(cnt) AS max_lang_cnt
        FROM bylang GROUP BY cluster_id
    ),
    srcs AS (
        SELECT cluster_id, CAST(count(DISTINCT source) AS BIGINT) AS n_sources
        FROM mem GROUP BY cluster_id
    )
    SELECT l.cluster_id, l.n_members, l.n_langs, s.n_sources,
           CAST(l.max_lang_cnt AS DOUBLE) / CAST(l.n_members AS DOUBLE)
               AS top_lang_share,
           avg(CASE WHEN l.n_langs = 1 THEN 1.0 ELSE 0.0 END) OVER ()
               AS lang_pure_rate,
           avg(CASE WHEN s.n_sources = 1 THEN 1.0 ELSE 0.0 END) OVER ()
               AS source_pure_rate
    FROM langs l JOIN srcs s ON l.cluster_id = s.cluster_id
    """,
)
def neardup_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-quality audit for the near-dup graph: per cluster, member
    count, distinct languages, distinct sources, and the majority-language
    share, plus corpus-wide purity rates. A healthy near-dup cluster is
    copies of ONE document — same language, usually same source; a cluster
    spanning languages means the LSH is merging boilerplate/templates
    (navigation chrome, license headers) rather than content, and removing
    "duplicates" from it deletes distinct documents. This is the audit an
    operator reads alongside `neardup_cluster_sizes` before trusting a
    dedup manifest.

    Scale shape: cluster labels come from the shared LSH + connected-
    components machinery (banded candidates, capped buckets); the purity
    rollups are two grouped aggregations on the CLUSTERED subset (orders of
    magnitude smaller than the corpus) after one doc_id equi-join that
    reads only (doc_id, lang, source) off the scan. The corpus-wide rates
    ride an unpartitioned window over the per-cluster frame — cluster
    cardinality, never corpus cardinality."""
    from datapipeline_ops_spark.operators.dedup import connected_components, persist_barrier

    pairs = minhash_lsh_pairs(spark, sf_dir)
    cc = connected_components(pairs, "doc_a", "doc_b").select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    # mem feeds BOTH rollups (by-lang and by-source); the barrier keeps the
    # documents scan + cluster join to one execution
    mem = persist_barrier(
        cc.join(d, "doc_id").select("cluster_id", "lang", "source"),
        f"cluster_mem:{sf_dir}",
    )
    bylang = mem.groupBy("cluster_id", "lang").agg(F.count(F.lit(1)).alias("cnt"))
    langs = bylang.groupBy("cluster_id").agg(
        F.sum("cnt").cast("long").alias("n_members"),
        F.count(F.lit(1)).cast("long").alias("n_langs"),
        F.max("cnt").alias("max_lang_cnt"),
    )
    srcs = mem.groupBy("cluster_id").agg(
        F.countDistinct("source").cast("long").alias("n_sources")
    )
    per = langs.join(srcs, "cluster_id")
    w_all = Window.partitionBy()
    return per.select(
        "cluster_id",
        "n_members",
        "n_langs",
        "n_sources",
        (
            F.col("max_lang_cnt").cast("double") / F.col("n_members").cast("double")
        ).alias("top_lang_share"),
        F.avg(F.when(F.col("n_langs") == 1, 1.0).otherwise(0.0))
        .over(w_all)
        .alias("lang_pure_rate"),
        F.avg(F.when(F.col("n_sources") == 1, 1.0).otherwise(0.0))
        .over(w_all)
        .alias("source_pure_rate"),
    )


# ---------------------------------------------------------------------------
# inbatch_negative_collisions — how often does in-batch negative sampling
# pair a document with its own near-duplicate?
# ---------------------------------------------------------------------------

# Candidate batch counts for the contrastive-training batching sweep (a
# batch count of NB at corpus size n means batches of ~n/NB documents).
_IBN_BATCHES = (8, 32, 128)
_IBN_SEED = 11


@query(
    "inbatch_negative_collisions",
    oracle="WITH "
    + _bands_cte()
    + f""",
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
                                  AND a.doc_id < b.doc_id
    ),
    pj AS (
        SELECT doc_a, doc_b
        FROM cand JOIN hsv sa ON cand.doc_a = sa.doc_id
                  JOIN hsv sb ON cand.doc_b = sb.doc_id
        WHERE len(list_intersect(sa.hs, sb.hs)) * 1.0 /
              (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) >= 0.5
    ),
    spine AS (SELECT unnest([{", ".join(str(b) for b in _IBN_BATCHES)}]) AS n_batches),
    coll AS (
        SELECT s.n_batches, count(*) AS n_collisions
        FROM pj CROSS JOIN spine s
        WHERE {sql_hash64("pj.doc_a", seed=_IBN_SEED)} % s.n_batches
            = {sql_hash64("pj.doc_b", seed=_IBN_SEED)} % s.n_batches
        GROUP BY s.n_batches
    ),
    tot AS (SELECT count(*) AS n_pairs FROM pj)
    SELECT s.n_batches,
           CAST(t.n_pairs AS BIGINT) AS n_pairs,
           CAST(coalesce(c.n_collisions, 0) AS BIGINT) AS n_collisions,
           CASE WHEN t.n_pairs > 0 THEN
               CAST(coalesce(c.n_collisions, 0) AS DOUBLE)
                   / CAST(t.n_pairs AS DOUBLE)
           END AS collision_rate
    FROM spine s CROSS JOIN tot t
         LEFT JOIN coll c ON c.n_batches = s.n_batches
    """,
)
def inbatch_negative_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training batch audit: when training with in-batch
    negatives, a near-duplicate pair that lands in the SAME batch becomes a
    FALSE negative — the model is pushed to separate two copies of the same
    content, which corrupts the embedding space. Per candidate batch count
    {_IBN_BATCHES}, this counts verified near-dup pairs (the shared
    MinHash-LSH machinery, Jaccard >= 0.5) whose members hash into the same
    batch, and the collision rate among all near-dup pairs (~1/n_batches
    for an independent hash — a higher rate means the batching key
    correlates with content). The fix the audit motivates is exactly
    `corpus_curation_e2e`'s: dedup BEFORE batching; this query measures the
    damage of skipping it.

    Scale shape: the expensive near-dup work rides the shared banded-LSH
    pass (bucketed candidates, never all-pairs); the batching sweep is a
    3-row broadcast spine over the verified pair table, and batch
    membership is pure hash arithmetic — no shuffle beyond the pair
    machinery itself."""
    d = with_shingle_hashes(load_table(spark, sf_dir, "documents"), "doc_id")
    pj = _lsh_verified_pairs(d, tau=0.5).select("doc_a", "doc_b")
    spine = local_frame(spark, [(b,) for b in _IBN_BATCHES], "n_batches int")
    coll = (
        pj.crossJoin(F.broadcast(spine))
        .filter(
            hash64(F.col("doc_a"), seed=_IBN_SEED) % F.col("n_batches")
            == hash64(F.col("doc_b"), seed=_IBN_SEED) % F.col("n_batches")
        )
        .groupBy("n_batches")
        .agg(F.count(F.lit(1)).cast("long").alias("n_collisions"))
    )
    tot = pj.agg(F.count(F.lit(1)).alias("n_pairs"))
    return (
        spine.crossJoin(F.broadcast(tot))
        .join(coll, "n_batches", "left")
        .select(
            "n_batches",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.coalesce("n_collisions", F.lit(0)).cast("long").alias("n_collisions"),
            F.when(
                F.col("n_pairs") > 0,
                F.coalesce("n_collisions", F.lit(0)).cast("double")
                / F.col("n_pairs").cast("double"),
            ).alias("collision_rate"),
        )
    )


# ---------------------------------------------------------------------------
# minhash_vs_simhash_agreement — do the two fingerprint families flag the
# same near-duplicates?
# ---------------------------------------------------------------------------


@query("minhash_vs_simhash_agreement", oracle=None)  # composed below
def minhash_vs_simhash_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-estimator QA for the two near-dup fingerprint families: full
    outer join of the MinHash-LSH verified pairs (Jaccard >= 0.5) against
    the SimHash radius-3 pairs, rolled up by which family found each pair
    (`both`, `minhash_only`, `simhash_only`) with pair counts and the
    exact-Jaccard range where it is known. An operator choosing a family
    (set-similarity MinHash vs cosine-sketch SimHash) reads this before
    trusting one alone: a large `simhash_only` bucket means weighted/
    repeated-token duplicates MinHash's set semantics miss; a large
    `minhash_only` bucket means SimHash's radius is too tight for the
    corpus. Both legs are the registered production paths, so the audit
    measures the shipped estimators, not idealized ones.

    Scale shape: both pair tables are LSH/pigeonhole-capped (orders of
    magnitude smaller than the corpus); the audit is one full outer
    equi-join on (doc_a, doc_b) plus a 3-group rollup."""
    m = QUERIES["minhash_lsh_pairs"].fn(spark, sf_dir)
    s = QUERIES["simhash_near_pairs"].fn(spark, sf_dir).select(
        F.col("doc_a").alias("s_a"), F.col("doc_b").alias("s_b")
    )
    j = m.join(
        s,
        (F.col("doc_a") == F.col("s_a")) & (F.col("doc_b") == F.col("s_b")),
        "full_outer",
    )
    found = (
        F.when(F.col("doc_a").isNotNull() & F.col("s_a").isNotNull(), "both")
        .when(F.col("doc_a").isNotNull(), "minhash_only")
        .otherwise("simhash_only")
    )
    return (
        j.select(found.alias("found_by"), "jaccard")
        .groupBy("found_by")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.min("jaccard").alias("min_jaccard"),
            F.max("jaccard").alias("max_jaccard"),
        )
    )


def _mvsa_oracle() -> str:
    m_sql = QUERIES["minhash_lsh_pairs"].oracle
    s_sql = QUERIES["simhash_near_pairs"].oracle
    return f"""
    WITH m AS MATERIALIZED ({m_sql}),
    s AS MATERIALIZED (SELECT doc_a AS s_a, doc_b AS s_b FROM ({s_sql})),
    j AS (
        SELECT m.doc_a, m.jaccard, s.s_a,
               CASE WHEN m.doc_a IS NOT NULL AND s.s_a IS NOT NULL THEN 'both'
                    WHEN m.doc_a IS NOT NULL THEN 'minhash_only'
                    ELSE 'simhash_only' END AS found_by
        FROM m FULL OUTER JOIN s ON m.doc_a = s.s_a AND m.doc_b = s.s_b
    )
    SELECT found_by,
           CAST(count(*) AS BIGINT) AS n_pairs,
           min(jaccard) AS min_jaccard,
           max(jaccard) AS max_jaccard
    FROM j GROUP BY found_by
    """


QUERIES["minhash_vs_simhash_agreement"].oracle = _mvsa_oracle()


# ---------------------------------------------------------------------------
# dedup_removal_impact — which languages pay for the curation funnel?
# ---------------------------------------------------------------------------


@query(
    "dedup_removal_impact",
    oracle="WITH RECURSIVE q AS ("
    "    SELECT doc_id, text, lang FROM documents"
    "    WHERE len(regexp_split_to_array(text, '\\s+')) >= 10"
    "), keep1 AS ("
    "    SELECT doc_id, text, lang, rn FROM ("
    "        SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM q"
    "    )"
    "), e AS (SELECT doc_id, text, lang FROM keep1 WHERE rn = 1), "
    + _verified_pairs_cte("e")
    + """,
    clusters AS (SELECT doc_id, min(label) AS cluster_id FROM reach GROUP BY doc_id),
    tagged AS (
        SELECT d.lang,
               CASE
                   WHEN len(regexp_split_to_array(d.text, '\\s+')) < 10
                       THEN 'quality'
                   WHEN k.rn > 1 THEN 'exact_dup'
                   WHEN c.cluster_id IS NOT NULL AND c.cluster_id <> d.doc_id
                       THEN 'near_dup'
                   ELSE 'kept'
               END AS fate
        FROM documents d
        LEFT JOIN keep1 k ON d.doc_id = k.doc_id
        LEFT JOIN clusters c ON d.doc_id = c.doc_id
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN fate = 'quality' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_quality_removed,
           CAST(sum(CASE WHEN fate = 'exact_dup' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_exact_removed,
           CAST(sum(CASE WHEN fate = 'near_dup' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_neardup_removed,
           CAST(sum(CASE WHEN fate = 'kept' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(sum(CASE WHEN fate = 'kept' THEN 1 ELSE 0 END) AS DOUBLE)
               / count(*) AS kept_share
    FROM tagged GROUP BY lang
    """,
)
def dedup_removal_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-funnel fairness audit: per language, how many documents each
    stage of `corpus_curation_e2e` removes (quality gate, exact dedup,
    near-dup dedup) and the kept share. Dedup is known to remove data
    NON-uniformly — boilerplate-heavy or template-translated languages lose
    disproportionately, which silently shifts the training mixture after
    curation. This query attributes every document to exactly one fate
    (the four columns sum to n_docs per row), so a mixture designer can
    correct weights POST-funnel instead of assuming the pre-funnel blend
    survived.

    Scale shape: replays the funnel's own stages (pushable quality
    predicate, one md5-window shuffle, the shared capped LSH + CC pass)
    and adds two doc_id equi-joins plus a language-cardinality rollup —
    attribution costs two pruned scans on top of the funnel it audits."""
    from datapipeline_ops_spark.functions.text import tokens as _tokens
    from datapipeline_ops_spark.operators.dedup import (
        connected_components,
        persist_barrier,
    )

    docs = load_table(spark, sf_dir, "documents")
    q = docs.filter(F.size(_tokens(F.col("text"))) >= 10)
    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    keep1 = persist_barrier(
        q.withColumn("rn", F.row_number().over(w)).select("doc_id", "text", "rn"),
        f"dri_keep1:{sf_dir}",
    )
    e = keep1.filter(F.col("rn") == 1).select("doc_id", "text")
    d_sh = with_shingle_hashes(e, "doc_id")
    pairs = _lsh_verified_pairs(d_sh)
    clusters = connected_components(pairs, "doc_a", "doc_b").select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )
    base = docs.select("doc_id", "lang", F.size(_tokens(F.col("text"))).alias("n_tok"))
    tagged = (
        base.join(keep1.select("doc_id", "rn"), "doc_id", "left")
        .join(clusters, "doc_id", "left")
        .select(
            "lang",
            F.when(F.col("n_tok") < 10, "quality")
            .when(F.col("rn") > 1, "exact_dup")
            .when(
                F.col("cluster_id").isNotNull()
                & (F.col("cluster_id") != F.col("doc_id")),
                "near_dup",
            )
            .otherwise("kept")
            .alias("fate"),
        )
    )
    return tagged.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("fate") == "quality", 1).otherwise(0))
        .cast("long")
        .alias("n_quality_removed"),
        F.sum(F.when(F.col("fate") == "exact_dup", 1).otherwise(0))
        .cast("long")
        .alias("n_exact_removed"),
        F.sum(F.when(F.col("fate") == "near_dup", 1).otherwise(0))
        .cast("long")
        .alias("n_neardup_removed"),
        F.sum(F.when(F.col("fate") == "kept", 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        (
            F.sum(F.when(F.col("fate") == "kept", 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("kept_share"),
    )


# ---------------------------------------------------------------------------
# neardup_chain_overmerge — are clusters cliques of real duplicates, or
# transitive chains gluing dissimilar documents?
# ---------------------------------------------------------------------------


@query(
    "neardup_chain_overmerge",
    oracle="WITH RECURSIVE "
    + _VERIFIED_PAIRS_CTE
    + """,
    clusters AS (SELECT doc_id, min(label) AS cluster_id FROM reach GROUP BY doc_id),
    csize AS (
        SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
        FROM clusters GROUP BY cluster_id
    ),
    cedges AS (
        SELECT c.cluster_id,
               len(list_intersect(sa.hs, sb.hs)) * 1.0 /
               (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs)))
                   AS jaccard
        FROM pairs p JOIN clusters c ON p.doc_a = c.doc_id
                     JOIN hsv sa ON p.doc_a = sa.doc_id
                     JOIN hsv sb ON p.doc_b = sb.doc_id
    ),
    estat AS (
        SELECT cluster_id,
               CAST(count(*) AS BIGINT) AS n_edges,
               min(jaccard) AS min_edge_jaccard
        FROM cedges GROUP BY cluster_id
    )
    SELECT s.cluster_id, s.n_members, e.n_edges,
           CAST(e.n_edges AS DOUBLE)
               / (s.n_members * (s.n_members - 1) / 2) AS edge_density,
           e.min_edge_jaccard,
           s.n_members * (s.n_members - 1) / 2 > e.n_edges AS chained
    FROM csize s JOIN estat e ON s.cluster_id = e.cluster_id
    """,
)
def neardup_chain_overmerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive-overmerge guard for connected-component dedup: per
    near-dup cluster, the member count, verified-edge count, edge density
    (edges over member pairs), the weakest direct edge, and a `chained`
    flag (density < 1 means some member pair was merged with NO direct
    similarity evidence — A~B and B~C glued A to C). Connected components
    are the standard last step of corpus dedup, and chaining is their
    standard failure: one templated page bridges two unrelated document
    groups and the keeper step deletes real content. A healthy dedup run
    shows mostly density-1.0 cliques; chained clusters with low
    min_edge_jaccard are where an operator tightens tau or switches to
    star-clustering. Complements `neardup_cluster_purity` (metadata
    homogeneity) with similarity-structure evidence.

    Scale shape: both inputs are the shared capped machinery (verified
    pair table, CC labels); the audit is two grouped rollups and a
    cluster-cardinality join — every edge belongs to exactly one cluster,
    so the edge rollup is a single equi-join on doc_a."""
    from datapipeline_ops_spark.operators.dedup import connected_components

    pairs = minhash_lsh_pairs(spark, sf_dir)
    cc = connected_components(pairs, "doc_a", "doc_b").select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )
    csize = cc.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    edges = pairs.join(
        cc.select(F.col("doc_id").alias("doc_a"), "cluster_id"), "doc_a"
    )
    estat = edges.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.min("jaccard").alias("min_edge_jaccard"),
    )
    possible = (F.col("n_members") * (F.col("n_members") - 1) / 2)
    return csize.join(estat, "cluster_id").select(
        "cluster_id",
        "n_members",
        "n_edges",
        (F.col("n_edges").cast("double") / possible).alias("edge_density"),
        "min_edge_jaccard",
        (possible > F.col("n_edges")).alias("chained"),
    )


# ---------------------------------------------------------------------------
# Cross-document substring dedup (Lee et al. 2022 ExactSubstr, removal form):
# k-token hash-gram windows at stride 1; a window whose gram occurs in >= 2
# distinct documents is REMOVED everywhere except its first occurrence
# (min (doc_id, position)); removed windows merge into covered-token spans.
# Unlike exact_substring_spans (profile only), this pair of queries REPORTS
# THE REMOVAL: per-doc token savings and the per-source rollup.
# ---------------------------------------------------------------------------

CROSSDOC_K = 8  # token-window width (Lee et al. use 50 BPE tokens at scale)


def _crossdoc_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document removal stats for k-token-window cross-doc dedup.

    Shape: one exchange on doc_id materializes the token array (so the
    per-position slice is O(k), not O(len) re-splits — the lesson of
    functions/text.py:shingles_from); per-gram facts (cross-doc flag via
    min!=max doc, the keep-first occurrence via a lexicographic
    min-struct) reduce through a PARTIAL-AGGREGATED groupBy on the 64-bit
    gram hash — deliberately NOT a window over the gh partition, because a
    boilerplate gram with millions of occurrences would funnel them into
    ONE reducer's sort; map-side combine collapses the hot key to one row
    per partition, and the join back onto the occurrences is an equi-join
    AQE can split on skew. Marked windows then merge into covered spans
    with a per-doc lead() window — interval union of equal-length windows
    is sum(min(k, next_start - start)) — and a left join carries docs with
    nothing removed. Only (doc_id, s, hash) triples ever shuffle; text
    stays partition-local. Grams join on hash64, not the string: at 100 TB
    the shuffle key is 8 bytes, and a (same-engine) collision merely merges
    two gram families identically in Spark and the oracle."""
    n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    d = load_table(spark, sf_dir, "documents")
    spread = d.select(
        "doc_id", "source", tokens(F.col("text")).alias("_toks")
    ).repartition(n, F.col("doc_id"))
    base = spread.select(
        "doc_id", "source", F.size("_toks").cast("long").alias("n_tokens"), "_toks"
    )
    grams = (
        base.filter(F.col("n_tokens") >= CROSSDOC_K)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.col("n_tokens") - (CROSSDOC_K - 1))
            ).alias("s"),
            "_toks",
        )
        .select(
            "doc_id",
            "s",
            hash64(
                F.concat_ws(" ", F.slice(F.col("_toks"), F.col("s"), CROSSDOC_K))
            ).alias("gh"),
        )
    )
    pg = grams.groupBy("gh").agg(
        F.min("doc_id").alias("_mind"),
        F.max("doc_id").alias("_maxd"),
        F.min(F.struct(F.col("doc_id").alias("d"), F.col("s").alias("p"))).alias(
            "_fst"
        ),
    )
    marked = (
        grams.join(pg, "gh")
        .filter(
            (F.col("_mind") != F.col("_maxd"))
            & ~(
                (F.col("doc_id") == F.col("_fst.d"))
                & (F.col("s") == F.col("_fst.p"))
            )
        )
        .select("doc_id", "s")
    )
    wd = Window.partitionBy("doc_id").orderBy("s")
    cov = F.coalesce(
        F.least(F.lit(CROSSDOC_K), F.lead("s", 1).over(wd) - F.col("s")),
        F.lit(CROSSDOC_K),
    )
    removed = (
        marked.withColumn("_cov", cov)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_marked_windows"),
            F.sum("_cov").cast("long").alias("n_removed_tokens"),
        )
    )
    nrm = F.coalesce(F.col("n_removed_tokens"), F.lit(0)).cast("long")
    return base.select("doc_id", "source", "n_tokens").join(
        removed, "doc_id", "left"
    ).select(
        "doc_id",
        "source",
        "n_tokens",
        F.coalesce(F.col("n_marked_windows"), F.lit(0))
        .cast("long")
        .alias("n_marked_windows"),
        nrm.alias("n_removed_tokens"),
        (F.col("n_tokens") - nrm).alias("n_kept_tokens"),
        F.round(nrm * 1.0 / F.col("n_tokens"), 6).alias("removed_frac"),
    )


_CROSSDOC_CTE = f"""
    t AS MATERIALIZED (
        SELECT doc_id, source, regexp_split_to_array(text, '\\s+') AS arr
        FROM documents
    ),
    cdbase AS (SELECT doc_id, source, len(arr) AS n_tokens, arr FROM t),
    cdg AS MATERIALIZED (
        SELECT doc_id, s.s AS s,
               {sql_hash64(f"array_to_string(list_slice(arr, s.s, s.s + {CROSSDOC_K - 1}), ' ')")} AS gh
        FROM cdbase,
             LATERAL (SELECT unnest(generate_series(1, CAST(n_tokens AS INT) - {CROSSDOC_K - 1})) AS s) AS s
        WHERE n_tokens >= {CROSSDOC_K}
    ),
    cdpg AS (
        SELECT gh, min(doc_id) AS mind, max(doc_id) AS maxd,
               min(struct_pack(d := doc_id, p := s)) AS fst
        FROM cdg GROUP BY gh
    ),
    cdmk AS (
        SELECT g.doc_id, g.s
        FROM cdg g JOIN cdpg p USING (gh)
        WHERE p.mind <> p.maxd
          AND NOT (g.doc_id = p.fst.d AND g.s = p.fst.p)
    ),
    cdcov AS (
        SELECT doc_id,
               coalesce(least({CROSSDOC_K},
                              lead(s) OVER (PARTITION BY doc_id ORDER BY s) - s),
                        {CROSSDOC_K}) AS c
        FROM cdmk
    ),
    cdr AS (
        SELECT doc_id, count(*) AS n_marked_windows,
               CAST(sum(c) AS BIGINT) AS n_removed_tokens
        FROM cdcov GROUP BY doc_id
    ),
    cdstats AS (
        SELECT b.doc_id, b.source, CAST(b.n_tokens AS BIGINT) AS n_tokens,
               coalesce(r.n_marked_windows, 0) AS n_marked_windows,
               coalesce(r.n_removed_tokens, 0) AS n_removed_tokens,
               CAST(b.n_tokens AS BIGINT) - coalesce(r.n_removed_tokens, 0)
                   AS n_kept_tokens,
               round(coalesce(r.n_removed_tokens, 0) * 1e0 / b.n_tokens, 6)
                   AS removed_frac
        FROM cdbase b LEFT JOIN cdr r USING (doc_id)
    )
"""


@query(
    "crossdoc_substring_dedup",
    oracle=f"""
    WITH {_CROSSDOC_CTE}
    SELECT doc_id, source, n_tokens, n_marked_windows, n_removed_tokens,
           n_kept_tokens, removed_frac
    FROM cdstats
    """,
)
def crossdoc_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document substring dedup, removal form (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): every
    {CROSSDOC_K}-token window is hashed at stride 1; a window whose gram
    occurs in >= 2 distinct documents is removed everywhere except its
    global first occurrence (lowest (doc_id, position)), and once a gram
    family is cross-doc, within-doc repeats drop too. Overlapping removed
    windows merge into spans (interval union), so the per-doc token savings
    are exact, not window-count * k. One row per document — including
    untouched ones — with token totals, marked windows, removed/kept token
    counts and the removed fraction: the operator a pretraining pipeline
    runs right before tokenization to strip boilerplate that MinHash
    (whole-doc granularity) cannot see.

    The reference has no corpus-dedup surface (Ray video pipeline); this
    extends the beyond-reference dedup family of `queries/dedup.py` next to
    `exact_substring_spans`, which only PROFILES duplication — this one
    commits to a removal plan and quantifies it."""
    return _crossdoc_doc_stats(spark, sf_dir)


@query(
    "dedup_savings_by_source",
    oracle=f"""
    WITH {_CROSSDOC_CTE}
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_removed_tokens > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_docs_affected,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(n_removed_tokens) AS BIGINT) AS removed_tokens,
           CAST(sum(n_kept_tokens) AS BIGINT) AS kept_tokens,
           round(sum(n_removed_tokens) * 1e0 / sum(n_tokens), 6) AS savings_frac
    FROM cdstats
    GROUP BY source
    """,
)
def dedup_savings_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source savings report for cross-document substring dedup: how
    many documents each source contributes, how many were touched, and the
    exact token savings the removal plan of `crossdoc_substring_dedup`
    realizes — the number a data-mixture owner reads to see which crawl
    slice is paying the boilerplate tax. Sums of exact integers, so the
    fraction is reproducible to the last ulp on both engines.

    Scale shape: everything up to the per-doc stats is shared machinery
    (one gram-hash shuffle, one per-doc merge window); this adds a single
    map-side-combined rollup on the low-cardinality source key."""
    stats = _crossdoc_doc_stats(spark, sf_dir)
    return stats.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("n_removed_tokens") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_docs_affected"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("n_removed_tokens").cast("long").alias("removed_tokens"),
        F.sum("n_kept_tokens").cast("long").alias("kept_tokens"),
        F.round(
            F.sum("n_removed_tokens") * 1.0 / F.sum("n_tokens"), 6
        ).alias("savings_frac"),
    )


# ---------------------------------------------------------------------------
# crosslingual_neardup_rate — which language pairs share near-duplicate
# content (mirror sites, templated translations, machine-translated spam)
# ---------------------------------------------------------------------------


@query(
    "crosslingual_neardup_rate",
    oracle="WITH "
    + _pairs_cte()
    + """,
    lp AS (
        SELECT least(da.lang, db.lang) AS lang_lo,
               greatest(da.lang, db.lang) AS lang_hi
        FROM pairs
        JOIN documents da ON pairs.doc_a = da.doc_id
        JOIN documents db ON pairs.doc_b = db.doc_id
    ),
    g AS (SELECT lang_lo, lang_hi, CAST(count(*) AS BIGINT) AS n_pairs
          FROM lp GROUP BY 1, 2)
    SELECT lang_lo, lang_hi, n_pairs,
           round(n_pairs * 1e0 / sum(n_pairs) OVER (), 6) AS pair_share,
           lang_lo <> lang_hi AS is_cross
    FROM g
    """,
)
def crosslingual_neardup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-pair breakdown of the verified near-dup pairs: mirror
    sites, templated translations and MT-generated spam show up as
    CROSS-language near-duplicates (the CCNet/mC4 curation finding), and
    this query tells an operator which language pairs bleed into each
    other before a per-language dedup run would silently keep both copies.
    One row per unordered (lang_lo, lang_hi) with the pair count, its
    share of all near-dup pairs, and the cross-language flag.

    Scale shape: rides the shared capped LSH pair machinery (one band
    equi-join, exact-Jaccard verify on candidates only); the language
    attribution is two equi-joins against the (doc_id, lang) projection —
    column-pruned, never the text — and the rollup key space is
    langs^2/2, so the share window runs over a dozen-row aggregate."""
    pairs = minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    da = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("doc_a"), F.col("lang").alias("lang_a")
    )
    db = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("doc_b"), F.col("lang").alias("lang_b")
    )
    g = (
        pairs.join(da, "doc_a")
        .join(db, "doc_b")
        .select(
            F.least("lang_a", "lang_b").alias("lang_lo"),
            F.greatest("lang_a", "lang_b").alias("lang_hi"),
        )
        .groupBy("lang_lo", "lang_hi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )
    w = Window.partitionBy()  # dozen-row aggregate frame; no sort, no skew
    return g.select(
        "lang_lo",
        "lang_hi",
        "n_pairs",
        F.round(F.col("n_pairs") * 1.0 / F.sum("n_pairs").over(w), 6).alias(
            "pair_share"
        ),
        (F.col("lang_lo") != F.col("lang_hi")).alias("is_cross"),
    )
