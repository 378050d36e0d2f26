"""ML-data-ops wave 7: query understanding, compact embedding search,
hashed featurization, privacy release, streaming moments, graph link
prediction, readability, and dimensional encoding.

- ``spell_correct_symdel``: SymSpell-style deletion-key blocking + edit
  distance verification + frequency argmax — the query-normalization /
  typo-repair stage of a search or data-cleaning pipeline.
- ``embedding_hamming_ann``: 62-bit sign binarization of embeddings,
  Hamming-distance shortlist over packed BIGINT codes, exact cosine
  rerank — the 64x-compression ANN path (binary codes stay in registers;
  floats are touched only for the shortlist).
- ``feature_hash_vectors``: the hashing trick (Weinberger et al.) —
  signed token hashing into a fixed bucket space, aggregated per source,
  with collision accounting. Integer-exact cross-engine.
- ``dp_noisy_histogram``: differentially-private count release with
  deterministic inverse-CDF Laplace noise (md5-derived uniforms).
- ``ams_f2_sketch``: Alon-Matias-Szegedy second frequency moment
  estimator (16 sign estimators) audited against the exact F2 —
  integer-exact cross-engine because sign sums are order-free.
- ``node_jaccard_similarity``: neighborhood Jaccard over the co-purchase
  graph — the classic link-prediction / related-items score.
- ``flesch_readability``: syllable-heuristic Flesch reading ease per
  source, derived only from integer counts so the float arithmetic is
  bit-identical across engines.
- ``rare_category_collapse``: long-tail categorical collapse to OTHER at
  a 90% cumulative-coverage floor, with integer-only threshold math.

Reference parity: extends the text/quality surface beyond the reference's
empty ``common/text/`` and ``common/filter/`` stubs; the hashing seam is
the same injected-scorer discipline as ``common/transform/similarity_op.py``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.functions.hashing import hash64, sql_hash64
from datapipeline_ops_spark.functions.vectors import (
    as_double,
    dot,
    norm,
    sql_cosine,
)
from datapipeline_ops_spark.tables import load_table

# ---------------------------------------------------------------------------
# spell_correct_symdel
# ---------------------------------------------------------------------------

_MIN_WORD_LEN = 4


def _del_at(word: Column, i: Column) -> Column:
    """word with the i-th (1-based) char deleted; i=0 returns word itself."""
    return F.when(i == 0, word).otherwise(
        F.concat(word.substr(F.lit(1), i - 1), word.substr(i + 1, F.length(word)))
    )


@query(
    "spell_correct_symdel",
    oracle=f"""
    WITH toks AS MATERIALIZED (
        SELECT t.tok FROM documents,
             LATERAL unnest(regexp_split_to_array(text, '\\s+')) AS t(tok)
        WHERE t.tok <> ''
    ),
    vocab AS MATERIALIZED (
        SELECT tok AS word, CAST(count(*) AS BIGINT) AS freq
        FROM toks WHERE len(tok) >= {_MIN_WORD_LEN} GROUP BY tok
    ),
    qs AS MATERIALIZED (
        SELECT DISTINCT substr(word, 1, pos - 1) || substr(word, pos + 1) AS q
        FROM (SELECT word, ({sql_hash64("word")} % len(word)) + 1 AS pos FROM vocab)
    ),
    vkeys AS MATERIALIZED (
        SELECT word, freq,
               CASE WHEN g.i = 0 THEN word
                    ELSE substr(word, 1, g.i - 1) || substr(word, g.i + 1) END AS key
        FROM vocab, LATERAL unnest(generate_series(0, len(word))) AS g(i)
    ),
    qkeys AS MATERIALIZED (
        SELECT q,
               CASE WHEN g.i = 0 THEN q
                    ELSE substr(q, 1, g.i - 1) || substr(q, g.i + 1) END AS key
        FROM qs, LATERAL unnest(generate_series(0, len(q))) AS g(i)
    ),
    cand AS MATERIALIZED (
        SELECT DISTINCT qk.q, vk.word, vk.freq
        FROM qkeys qk JOIN vkeys vk USING (key)
        WHERE levenshtein(qk.q, vk.word) <= 1
    ),
    ranked AS (
        SELECT q, word, freq,
               row_number() OVER (PARTITION BY q ORDER BY freq DESC, word) AS rn,
               CAST(count(*) OVER (PARTITION BY q) AS BIGINT) AS n_cands
        FROM cand
    )
    SELECT q AS query_token, word AS corrected, freq, n_cands
    FROM ranked WHERE rn = 1
    """,
)
def spell_correct_symdel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SymSpell-style spell correction: build a frequency vocabulary from
    the corpus, corrupt each vocab word deterministically (delete the char
    at an md5-chosen position — the "user typo"), then correct the
    corrupted tokens by DELETION-KEY BLOCKING: both sides expand to their
    {{identity}} ∪ {{delete-one-char}} key sets, candidates meet on equal
    keys (an equi-join), and only candidates are verified with
    Levenshtein <= 1. The winner per query token is the most frequent
    verified vocab word (tie-break lexicographic).

    Scale: this is the whole point of SymSpell — candidate generation is
    O(word_len) keys per word and one shuffle equi-join on the key, never
    a |queries| x |vocab| distance matrix. Vocabulary is bounded by the
    token vocabulary (Heaps' law), not the corpus row count, and the
    distinct-first collapse happens before any expansion. Edit-distance
    verification runs only on blocked candidates."""
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.col("text"), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    vocab = (
        toks.filter(F.length("tok") >= _MIN_WORD_LEN)
        .groupBy(F.col("tok").alias("word"))
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pos = (hash64(F.col("word")) % F.length("word") + F.lit(1)).alias("pos")
    qs = (
        vocab.select("word", pos)
        .select(
            F.concat(
                F.col("word").substr(F.lit(1), F.col("pos") - 1),
                F.col("word").substr(F.col("pos") + 1, F.length("word")),
            ).alias("q")
        )
        .distinct()
    )
    vkeys = vocab.select(
        "word",
        "freq",
        F.explode(F.sequence(F.lit(0), F.length("word"))).alias("i"),
    ).select("word", "freq", _del_at(F.col("word"), F.col("i")).alias("key"))
    qkeys = qs.select(
        "q", F.explode(F.sequence(F.lit(0), F.length("q"))).alias("i")
    ).select("q", _del_at(F.col("q"), F.col("i")).alias("key"))
    cand = (
        qkeys.join(vkeys, "key")
        .filter(F.levenshtein("q", "word") <= 1)
        .select("q", "word", "freq")
        .distinct()
    )
    w = Window.partitionBy("q").orderBy(F.desc("freq"), F.asc("word"))
    wc = Window.partitionBy("q")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .withColumn("n_cands", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == 1)
        .select(
            F.col("q").alias("query_token"),
            F.col("word").alias("corrected"),
            "freq",
            "n_cands",
        )
    )


# ---------------------------------------------------------------------------
# embedding_hamming_ann
# ---------------------------------------------------------------------------

_HAM_BITS = 62  # < 63 so the packed code is always a non-negative BIGINT
_HAM_SHORTLIST = 20
_HAM_TOP_K = 3
_HAM_QUERY_MOD = 50  # vec_id % 50 == 0 are the query vectors

_SQL_CODE = (
    "CAST(list_sum(list_transform(generate_series(0, {b} - 1), i -> "
    "CASE WHEN vec[i + 1] > 0 THEN (1::BIGINT << i) ELSE 0::BIGINT END)) "
    "AS BIGINT)"
).format(b=_HAM_BITS)


@query(
    "embedding_hamming_ann",
    oracle=f"""
    WITH v AS MATERIALIZED (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings
    ),
    coded AS MATERIALIZED (
        SELECT vec_id, vec, {_SQL_CODE} AS code FROM v
    ),
    short AS MATERIALIZED (
        SELECT * FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                   CAST(bit_count(xor(q.code, c.code)) AS INT) AS hamming,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY bit_count(xor(q.code, c.code)), c.vec_id
                   ) AS srn
            FROM coded q JOIN coded c ON c.vec_id <> q.vec_id
            WHERE q.vec_id % {_HAM_QUERY_MOD} = 0
        ) WHERE srn <= {_HAM_SHORTLIST}
    ),
    rer AS (
        SELECT s.query_id, s.vec_id, s.hamming,
               {sql_cosine("a.vec", "b.vec")} AS cos
        FROM short s
        JOIN v a ON a.vec_id = s.query_id
        JOIN v b ON b.vec_id = s.vec_id
    )
    SELECT query_id, vec_id, hamming, round(cos, 6) AS cos, CAST(rn AS INT) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos DESC, vec_id
        ) AS rn FROM rer
    ) WHERE rn <= {_HAM_TOP_K}
    """,
)
def embedding_hamming_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-code ANN: binarize each embedding to a {_HAM_BITS}-bit sign
    code packed into ONE BIGINT, shortlist the {_HAM_SHORTLIST} nearest
    neighbors per query by Hamming distance (bit_count of XOR — pure JVM
    integer ops inside codegen), then rerank the shortlist with exact
    cosine and keep the top {_HAM_TOP_K}.

    Scale: the scan phase compares 8-byte codes, not 256-byte float
    vectors — a 32x read reduction and no floating point until the
    rerank, which touches |queries| x {_HAM_SHORTLIST} vectors only. The
    query batch is broadcast (corpus is streamed once); at billion-vector
    scale the same codes become the posting payload of an IVF cell scan
    (see ann_ivf_pq_topk for the cell-partitioned variant). Cosine values
    are bit-identical cross-engine (same IEEE accumulation order), so the
    rerank ordering is stable."""
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("vec")
    )
    coded = v.withColumn(
        "code",
        F.expr(
            f"aggregate(sequence(0, {_HAM_BITS} - 1), 0L, (acc, i) -> "
            "acc + IF(vec[i] > 0D, shiftleft(1L, i), 0L))"
        ),
    )
    q = coded.filter(F.col("vec_id") % _HAM_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("code").alias("qcode"),
        F.col("vec").alias("qvec"),
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.asc("hamming"), F.asc("vec_id")
    )
    short = (
        coded.drop("vec")
        .join(F.broadcast(q.drop("qvec")), F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("qcode").bitwiseXOR(F.col("code"))).cast("int"),
        )
        .withColumn("srn", F.row_number().over(w_short))
        .filter(F.col("srn") <= _HAM_SHORTLIST)
        .select("query_id", "vec_id", "hamming")
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        short.join(F.broadcast(q.select("query_id", "qvec")), "query_id")
        .join(v, "vec_id")
        .withColumn("cos", dot(F.col("qvec"), F.col("vec")) / (norm(F.col("qvec")) * norm(F.col("vec"))))
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= _HAM_TOP_K)
        .select(
            "query_id", "vec_id", "hamming", F.round("cos", 6).alias("cos"), "rank"
        )
    )


# ---------------------------------------------------------------------------
# feature_hash_vectors
# ---------------------------------------------------------------------------

_FH_BUCKETS = 64
_FH_SIGN_SEED = 7


@query(
    "feature_hash_vectors",
    oracle=f"""
    WITH toks AS MATERIALIZED (
        SELECT source, t.tok FROM documents,
             LATERAL unnest(regexp_split_to_array(text, '\\s+')) AS t(tok)
        WHERE t.tok <> ''
    ),
    hashed AS (
        SELECT source, tok,
               {sql_hash64("tok")} % {_FH_BUCKETS} AS bucket,
               1 - 2 * ({sql_hash64("tok", _FH_SIGN_SEED)} % 2) AS sgn
        FROM toks
    )
    SELECT source, bucket,
           CAST(sum(sgn) AS BIGINT) AS val,
           CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct_tokens
    FROM hashed GROUP BY source, bucket
    """,
)
def feature_hash_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: every token maps to one of {_FH_BUCKETS} buckets
    via the cross-engine md5 hash, with a second hash choosing a +/-1 sign
    (Weinberger et al. 2009 — the sign makes collision noise zero-mean).
    Aggregated per source this yields the hashed bag-of-words prototype
    vector of each source, plus a collision audit (distinct tokens sharing
    each bucket).

    Scale: featurization is stateless projection — no vocabulary build, no
    broadcast dictionary, no OOV path; the bucket space is fixed at
    {_FH_BUCKETS} regardless of vocabulary growth, so the aggregate state
    is sources x buckets no matter how many tokens stream through. This is
    the standard featurizer when a learned vocab would itself be a
    multi-GB broadcast. Sign sums are integers — exact in any execution
    order."""
    toks = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.explode(F.split(F.col("text"), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    hashed = toks.select(
        "source",
        "tok",
        (hash64(F.col("tok")) % _FH_BUCKETS).alias("bucket"),
        (F.lit(1) - F.lit(2) * (hash64(F.col("tok"), _FH_SIGN_SEED) % 2)).alias("sgn"),
    )
    return hashed.groupBy("source", "bucket").agg(
        F.sum("sgn").cast("long").alias("val"),
        F.count_distinct("tok").cast("long").alias("n_distinct_tokens"),
    )


# ---------------------------------------------------------------------------
# dp_noisy_histogram
# ---------------------------------------------------------------------------

_DP_EPS = 0.5
_DP_SEED = 11
_DP_MOD = 1_000_000


@query(
    "dp_noisy_histogram",
    oracle=f"""
    WITH counts AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_true
        FROM documents GROUP BY source
    ),
    noised AS (
        SELECT source, n_true,
               ({sql_hash64("source", _DP_SEED)} % {_DP_MOD} + 0.5) / {_DP_MOD}.0 AS u
        FROM counts
    )
    SELECT source, n_true,
           CAST(round(n_true + (-1.0 / {_DP_EPS}) * sign(u - 0.5)
                      * ln(1 - 2 * abs(u - 0.5)), 0) AS BIGINT) AS n_released,
           CAST({_DP_EPS} AS DOUBLE) AS eps
    FROM noised
    """,
)
def dp_noisy_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private histogram release: per-source document counts
    plus Laplace(1/eps) noise, eps={_DP_EPS}, rounded to integers (the
    standard integral release for counting queries). The noise is
    DETERMINISTIC for the oracle: a uniform in (0,1) is derived from the
    md5 hash of the group key and pushed through the Laplace inverse CDF
    -b*sign(u-1/2)*ln(1-2|u-1/2|) — in production swap the hash-uniform
    for a calibrated RNG; everything else (sensitivity-1 count, per-key
    independence, integral post-processing) is the real mechanism.

    Scale: noise is applied AFTER aggregation — one value per group, never
    per row — so the DP step adds zero shuffle; the histogram itself is a
    partial-agg count. Post-processing (rounding) preserves the DP
    guarantee by the post-processing theorem."""
    counts = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_true"))
    )
    u = (hash64(F.col("source"), _DP_SEED) % _DP_MOD + F.lit(0.5)) / F.lit(
        float(_DP_MOD)
    )
    noise = (
        F.lit(-1.0 / _DP_EPS)
        * F.signum(u - 0.5)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u - 0.5))
    )
    return counts.select(
        "source",
        "n_true",
        F.round(F.col("n_true") + noise, 0).cast("long").alias("n_released"),
        F.lit(_DP_EPS).alias("eps"),
    )


# ---------------------------------------------------------------------------
# ams_f2_sketch
# ---------------------------------------------------------------------------

_AMS_K = 16


@query(
    "ams_f2_sketch",
    oracle=f"""
    WITH per_user AS MATERIALIZED (
        SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY user_id
    ),
    exact AS (SELECT CAST(sum(cnt * cnt) AS BIGINT) AS f2_exact FROM per_user),
    signs AS (
        SELECT g.j,
               (1 - 2 * ({sql_hash64("CAST(user_id AS VARCHAR) || '|' || CAST(g.j AS VARCHAR)")} % 2))
                   * cnt AS term
        FROM per_user, LATERAL unnest(generate_series(0, {_AMS_K} - 1)) AS g(j)
    ),
    est AS (
        SELECT j, CAST(sum(term) AS BIGINT) AS s_j FROM signs GROUP BY j
    )
    SELECT j, s_j, CAST(s_j * s_j AS BIGINT) AS f2_est, f2_exact,
           CAST(s_j * s_j AS DOUBLE) / CAST(f2_exact AS DOUBLE) AS ratio
    FROM est, exact
    """,
)
def ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS second-frequency-moment sketch: {_AMS_K} independent +/-1
    four-wise-style hash signs per key; each estimator is (sum of
    sign*frequency)^2, an unbiased estimate of F2 = sum f_i^2 (the
    self-join size / repeat-rate statistic that drives skew detection and
    join-size planning). Audited against the exact F2 with the per-
    estimator ratio.

    Scale: the load-bearing shape is DISTINCT-FIRST — frequencies are
    aggregated per key once, then each key contributes {_AMS_K} integer
    terms; the sketch state is {_AMS_K} longs total however large the
    stream, and integer sign sums are exact in any partial-aggregation
    order (why the estimate itself is cross-engine exact, not just the
    audit). This is the streaming estimator you keep when the exact
    per-key frequency table no longer fits."""
    per_user = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = per_user.agg(
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("f2_exact")
    )
    signs = per_user.select(
        "cnt",
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(_AMS_K - 1))).alias("j"),
    ).select(
        "j",
        (
            (
                F.lit(1)
                - F.lit(2)
                * (
                    hash64(
                        F.concat(
                            F.col("user_id").cast("string"),
                            F.lit("|"),
                            F.col("j").cast("string"),
                        )
                    )
                    % 2
                )
            )
            * F.col("cnt")
        ).alias("term"),
    )
    est = signs.groupBy("j").agg(F.sum("term").cast("long").alias("s_j"))
    return est.crossJoin(F.broadcast(exact)).select(
        "j",
        "s_j",
        (F.col("s_j") * F.col("s_j")).cast("long").alias("f2_est"),
        "f2_exact",
        (
            (F.col("s_j") * F.col("s_j")).cast("double")
            / F.col("f2_exact").cast("double")
        ).alias("ratio"),
    )


# ---------------------------------------------------------------------------
# node_jaccard_similarity
# ---------------------------------------------------------------------------

_NJ_TOP = 50


@query(
    "node_jaccard_similarity",
    oracle=f"""
    WITH ok_orders AS (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING count(*) <= 64
    ),
    pairs AS MATERIALIZED (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        JOIN ok_orders ok ON ok.l_orderkey = a.l_orderkey
        GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    adj AS MATERIALIZED (
        SELECT pa AS node, pb AS nbr FROM pairs
        UNION ALL SELECT pb, pa FROM pairs
    ),
    deg AS MATERIALIZED (SELECT node, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY node),
    common AS (
        SELECT x.node AS a, y.node AS b, CAST(count(*) AS BIGINT) AS n_common
        FROM adj x JOIN adj y ON x.nbr = y.nbr AND x.node < y.node
        GROUP BY 1, 2
    )
    SELECT a, b, n_common, jaccard FROM (
        SELECT c.a, c.b, c.n_common,
               CAST(c.n_common AS DOUBLE)
                   / CAST(da.d + db.d - c.n_common AS DOUBLE) AS jaccard
        FROM common c
        JOIN deg da ON da.node = c.a
        JOIN deg db ON db.node = c.b
    ) ORDER BY jaccard DESC, a, b LIMIT {_NJ_TOP}
    """,
)
def node_jaccard_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood Jaccard over the co-purchase graph (|N(a) ∩ N(b)| /
    |N(a) ∪ N(b)|) — the classic structural link-prediction / related-
    items score, reported as the global top-{_NJ_TOP} pairs. Common
    neighbors come from one wedge equi-join on the shared neighbor;
    degrees are a plain aggregation; the union size is da + db - common
    (inclusion-exclusion), so no set materialization.

    Scale: reuses :func:`copurchase_edges` — basket-capped pair
    generation and a support floor of 2 orders prune the edge set BEFORE
    the quadratic wedge stage, exactly like the triangle census; the
    wedge join cost is sum(deg^2) over the PRUNED graph. The final
    top-{_NJ_TOP} is orderBy+limit over the AGGREGATED pair stats —
    Spark plans it as TakeOrdered (per-partition heap + driver merge of
    {_NJ_TOP}-row heads), never a global sort. Jaccard is a ratio of
    integers — bit-identical cross-engine, shipped raw, so the ranking
    ties out exactly (tie-break on the pair keys)."""
    from datapipeline_ops_spark.queries.graph_queries import copurchase_edges

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = copurchase_edges(li).persist()
    try:
        adj = edges.select(
            F.col("pa").alias("node"), F.col("pb").alias("nbr")
        ).unionAll(edges.select(F.col("pb").alias("node"), F.col("pa").alias("nbr")))
        deg = adj.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("d"))
        x = adj.select(F.col("node").alias("a"), "nbr")
        y = adj.select(F.col("node").alias("b"), F.col("nbr").alias("nbr2"))
        common = (
            x.join(y, (F.col("nbr") == F.col("nbr2")) & (F.col("a") < F.col("b")))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
        )
        jac = F.col("n_common").cast("double") / (
            F.col("da") + F.col("db") - F.col("n_common")
        ).cast("double")
        out = (
            common.join(deg.select(F.col("node").alias("a"), F.col("d").alias("da")), "a")
            .join(deg.select(F.col("node").alias("b"), F.col("d").alias("db")), "b")
            .withColumn("jaccard", jac)
            .select("a", "b", "n_common", "jaccard")
            .orderBy(F.desc("jaccard"), F.asc("a"), F.asc("b"))
            .limit(_NJ_TOP)
        )
        return out.localCheckpoint(eager=True)
    finally:
        edges.unpersist()


# ---------------------------------------------------------------------------
# flesch_readability
# ---------------------------------------------------------------------------


@query(
    "flesch_readability",
    oracle="""
    WITH per_doc AS (
        SELECT source,
               len(regexp_extract_all(text, '[a-z]+')) AS n_words,
               len(regexp_extract_all(text, '[aeiouy]+')) AS n_syll
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS sum_words,
           CAST(sum(n_syll) AS BIGINT) AS sum_syllables,
           206.835
             - 1.015 * (CAST(sum(n_words) AS DOUBLE) / CAST(count(*) AS DOUBLE))
             - 84.6 * (CAST(sum(n_syll) AS DOUBLE) / CAST(sum(n_words) AS DOUBLE))
               AS flesch
    FROM per_doc GROUP BY source
    """,
)
def flesch_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per source: word count is the count of [a-z]+
    runs, the syllable heuristic is the count of vowel-group [aeiouy]+
    runs (the standard cheap estimator), sentences ≡ documents on this
    punctuation-free corpus. The score is computed from the per-source
    INTEGER sums (flesch-of-means), so the float path is two divisions
    and two multiply-subtracts in a fixed order — bit-identical across
    engines, shipped raw.

    Scale: two regexp_count projections inside codegen and one partial
    aggregation; no tokenization explode at all — the cheapest possible
    quality-signal pass, which is why readability belongs in the FIRST
    gate of a curation funnel (cf. gopher_quality_flags for the heavier
    token-level gates)."""
    d = load_table(spark, sf_dir, "documents").select(
        "source",
        F.regexp_count(F.col("text"), F.lit(r"[a-z]+")).alias("n_words"),
        F.regexp_count(F.col("text"), F.lit(r"[aeiouy]+")).alias("n_syll"),
    )
    agg = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("sum_words"),
        F.sum("n_syll").cast("long").alias("sum_syllables"),
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015)
        * (F.col("sum_words").cast("double") / F.col("n_docs").cast("double"))
        - F.lit(84.6)
        * (F.col("sum_syllables").cast("double") / F.col("sum_words").cast("double"))
    )
    return agg.select(
        "source", "n_docs", "sum_words", "sum_syllables", flesch.alias("flesch")
    )


# ---------------------------------------------------------------------------
# rare_category_collapse
# ---------------------------------------------------------------------------

_RC_COVER_NUM = 9  # keep categories while cumulative share <= 9/10
_RC_COVER_DEN = 10


@query(
    "rare_category_collapse",
    oracle=f"""
    WITH counts AS (
        SELECT p_type AS category, CAST(count(*) AS BIGINT) AS cnt
        FROM part GROUP BY p_type
    ),
    ranked AS (
        SELECT category, cnt,
               row_number() OVER (ORDER BY cnt DESC, category) AS rn,
               sum(cnt) OVER (ORDER BY cnt DESC, category
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum,
               sum(cnt) OVER () AS total
        FROM counts
    )
    SELECT CASE WHEN cum * {_RC_COVER_DEN} <= total * {_RC_COVER_NUM} OR rn = 1
                THEN category ELSE 'OTHER' END AS out_category,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_source_categories
    FROM ranked GROUP BY 1
    """,
)
def rare_category_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-tail categorical collapse: keep the most frequent categories
    while their cumulative share stays within {_RC_COVER_NUM}/{_RC_COVER_DEN}
    of all rows (always keeping at least the head category), fold the tail
    into 'OTHER' — the dimensional-encoding step before one-hot /
    embedding layers, and the cardinality-control step before a groupBy
    whose key would otherwise explode. The threshold compare is integer
    cross-multiplication (cum*{_RC_COVER_DEN} <= total*{_RC_COVER_NUM}) —
    no float anywhere.

    Scale: the window runs over the CATEGORY aggregate (bounded by the
    category vocabulary, ~150 rows here), never the fact table — the same
    aggregate-then-window discipline as the daily monitors; the fact-table
    pass is one partial-agg count."""
    counts = (
        load_table(spark, sf_dir, "part")
        .groupBy(F.col("p_type").alias("category"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w_ord = Window.orderBy(F.desc("cnt"), F.asc("category"))
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy()
    ranked = counts.select(
        "category",
        "cnt",
        F.row_number().over(w_ord).alias("rn"),
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("total"),
    )
    keep = (F.col("cum") * _RC_COVER_DEN <= F.col("total") * _RC_COVER_NUM) | (
        F.col("rn") == 1
    )
    return (
        ranked.select(
            F.when(keep, F.col("category")).otherwise(F.lit("OTHER")).alias(
                "out_category"
            ),
            "cnt",
        )
        .groupBy("out_category")
        .agg(
            F.sum("cnt").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_source_categories"),
        )
    )
