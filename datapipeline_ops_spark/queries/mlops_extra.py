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
- ``copurchase_pmi_scores``: PPMI association mining over the co-purchase
  graph (the item2vec / SGNS objective's exact counterpart).
- ``calibration_ece_report``: reliability bins + expected calibration
  error with an integer-numerator ECE (exact cross-engine).
- ``gdpr_delete_cascade``: right-to-be-forgotten delete propagation
  across the customer -> orders -> lineitem FK chain with purge audit.
- ``triplet_mining_hard_negatives``: label-aware contrastive mining —
  hardest in-batch positive and negative per anchor, margin violations.
- ``lsh_pair_recall_eval``: candidate-recall audit of the MinHash-LSH
  near-dup path against the exact inverted-index Jaccard ground truth.
- ``tokenizer_fertility_by_lang``: tokens-per-word fertility and
  chars-per-token by language — the multilingual tokenizer-quality table.

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
from datapipeline_ops_spark.tables import load_table, local_frame

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
_HAM_N_QUERIES = 10  # vec_id < 10 are the query vectors — CONSTANT batch

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
            WHERE q.vec_id < {_HAM_N_QUERIES}
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
    query batch is a CONSTANT {_HAM_N_QUERIES} vectors (corpus-independent
    broadcast; corpus is streamed once); at billion-vector
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
    q = coded.filter(F.col("vec_id") < _HAM_N_QUERIES).select(
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
        # wedge enumeration ARRAY-SIDE (the copurchase/LSH bucket-collect
        # pattern): one groupBy on the shared neighbor replaces a self-join
        # that would shuffle adj twice; pair output is identical (no cap —
        # the support-2 edge filter already bounds hub degree here)
        per_nbr = adj.groupBy("nbr").agg(F.collect_list("node").alias("ns"))
        common = (
            per_nbr.select(
                F.explode(
                    F.filter(
                        F.flatten(
                            F.transform(
                                "ns",
                                lambda a: F.transform(
                                    "ns",
                                    lambda b: F.struct(a.alias("a"), b.alias("b")),
                                ),
                            )
                        ),
                        lambda s: s.a < s.b,
                    )
                ).alias("p")
            )
            .select("p.a", "p.b")
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


# ---------------------------------------------------------------------------
# copurchase_pmi_scores
# ---------------------------------------------------------------------------

_PMI_TOP = 100
_PMI_MIN_ORDERS = 2
_PMI_MAX_BASKET = 64


@query(
    "copurchase_pmi_scores",
    oracle=f"""
    WITH ok_orders AS (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING count(*) <= {_PMI_MAX_BASKET}
    ),
    pairs AS MATERIALIZED (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb,
               CAST(count(*) AS BIGINT) AS n_ab
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        JOIN ok_orders ok ON ok.l_orderkey = a.l_orderkey
        GROUP BY 1, 2 HAVING count(*) >= {_PMI_MIN_ORDERS}
    ),
    marg AS MATERIALIZED (
        SELECT node, CAST(sum(n_ab) AS BIGINT) AS n_node FROM (
            SELECT pa AS node, n_ab FROM pairs
            UNION ALL SELECT pb, n_ab FROM pairs
        ) GROUP BY node
    ),
    tot AS (SELECT CAST(sum(n_ab) AS BIGINT) AS t FROM pairs)
    SELECT pa, pb, n_ab, pmi FROM (
        SELECT p.pa, p.pb, p.n_ab,
               ln(CAST(p.n_ab AS DOUBLE) * CAST(tot.t AS DOUBLE)
                  / (CAST(ma.n_node AS DOUBLE) * CAST(mb.n_node AS DOUBLE))) AS pmi
        FROM pairs p
        JOIN marg ma ON ma.node = p.pa
        JOIN marg mb ON mb.node = p.pb
        CROSS JOIN tot
    ) ORDER BY n_ab DESC, pa, pb LIMIT {_PMI_TOP}
    """,
)
def copurchase_pmi_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over co-purchase pairs —
    ln(p(a,b) / (p(a) p(b))) with probabilities from pair-occurrence
    marginals — the association score behind item2vec-style embeddings
    (SGNS factorizes the shifted PMI matrix; Levy & Goldberg 2014) and
    "customers also bought" ranking. Reported for the top-{_PMI_TOP}
    pairs by support (support ordering is integer-deterministic; PMI
    itself rides along as a value).

    Scale: pair counts come from the basket-capped array-side explode
    (one lineitem shuffle); marginals and the total are aggregations of
    the PAIR table, not the fact table; the ranking is TakeOrdered. The
    PMI argument is built from integer counts in one fixed op order, so
    the only engine-sensitive op is ln itself (hash-normalized)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    per_order = (
        li.groupBy("l_orderkey")
        .agg(F.collect_list("l_partkey").alias("ps"))
        .filter(F.size("ps") <= _PMI_MAX_BASKET)
    )
    raw_pairs = per_order.select(
        F.explode(
            F.filter(
                F.flatten(
                    F.transform(
                        "ps",
                        lambda a: F.transform(
                            "ps", lambda b: F.struct(a.alias("pa"), b.alias("pb"))
                        ),
                    )
                ),
                lambda s: s.pa < s.pb,
            )
        ).alias("p")
    ).select("p.pa", "p.pb")
    pairs = (
        raw_pairs.groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= _PMI_MIN_ORDERS)
        .persist()
    )
    try:
        marg = (
            pairs.select(F.col("pa").alias("node"), "n_ab")
            .unionAll(pairs.select(F.col("pb").alias("node"), "n_ab"))
            .groupBy("node")
            .agg(F.sum("n_ab").cast("long").alias("n_node"))
        )
        tot = pairs.agg(F.sum("n_ab").cast("long").alias("t"))
        pmi = F.log(
            F.col("n_ab").cast("double")
            * F.col("t").cast("double")
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
        )
        out = (
            pairs.join(
                marg.select(F.col("node").alias("pa"), F.col("n_node").alias("n_a")),
                "pa",
            )
            .join(
                marg.select(F.col("node").alias("pb"), F.col("n_node").alias("n_b")),
                "pb",
            )
            .crossJoin(F.broadcast(tot))
            .select("pa", "pb", "n_ab", pmi.alias("pmi"))
            .orderBy(F.desc("n_ab"), F.asc("pa"), F.asc("pb"))
            .limit(_PMI_TOP)
        )
        return out.localCheckpoint(eager=True)
    finally:
        pairs.unpersist()


# ---------------------------------------------------------------------------
# calibration_ece_report
# ---------------------------------------------------------------------------

_ECE_SEED = 31
_ECE_MOD = 1_000_000
_ECE_BIN_DIV = 100_000  # 10 bins
_ECE_LABEL_CHARS = 500


@query(
    "calibration_ece_report",
    oracle=f"""
    WITH scored AS (
        SELECT {sql_hash64("doc_id", _ECE_SEED)} % {_ECE_MOD} AS conf_k,
               CASE WHEN n_chars >= {_ECE_LABEL_CHARS} THEN 1 ELSE 0 END AS y
        FROM documents
    ),
    bins AS (
        SELECT conf_k // {_ECE_BIN_DIV} AS bin,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS n_pos,
               CAST(sum(conf_k) AS BIGINT) AS sum_k
        FROM scored GROUP BY 1
    )
    SELECT bin, n, n_pos,
           CAST(sum_k AS DOUBLE) / (CAST(n AS DOUBLE) * {_ECE_MOD}.0) AS conf,
           CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS acc,
           CAST(abs(sum_k - n_pos * {_ECE_MOD}) AS DOUBLE)
               / ({_ECE_MOD}.0 * CAST(n AS DOUBLE)) AS gap,
           CAST(sum(abs(sum_k - n_pos * {_ECE_MOD})) OVER () AS DOUBLE)
               / ({_ECE_MOD}.0 * CAST(sum(n) OVER () AS DOUBLE)) AS ece
    FROM bins
    """,
)
def calibration_ece_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + expected calibration error for a stub
    classifier (md5-uniform confidence, length-derived label — the seam
    where a real model's scores plug in). Per bin: mean confidence, empirical
    accuracy, |gap|; ECE = sum_bins (n_b/N)·|conf_b - acc_b|.

    The numeric trick that makes this EXACT cross-engine: confidences are
    integers k/1e6, so bin mean-confidence, accuracy, the per-bin gap AND
    the ECE all reduce to ratios with INTEGER numerators —
    |sum_k - n_pos·1e6| per bin — summed as integers before one final
    float division. No float accumulation anywhere, so no engine-order
    sensitivity (the same discipline as the HLL dyadic sums).

    Scale: one partial-agg pass to 10 bin rows; the ECE window runs over
    the 10-row aggregate."""
    scored = load_table(spark, sf_dir, "documents").select(
        (hash64(F.col("doc_id"), _ECE_SEED) % _ECE_MOD).alias("conf_k"),
        F.when(F.col("n_chars") >= _ECE_LABEL_CHARS, 1).otherwise(0).alias("y"),
    )
    bins = scored.groupBy(
        (F.col("conf_k") / _ECE_BIN_DIV).cast("long").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
        F.sum("conf_k").cast("long").alias("sum_k"),
    )
    w = Window.partitionBy()
    num = F.abs(F.col("sum_k") - F.col("n_pos") * _ECE_MOD)
    return bins.select(
        "bin",
        "n",
        "n_pos",
        (F.col("sum_k").cast("double") / (F.col("n").cast("double") * float(_ECE_MOD))).alias("conf"),
        (F.col("n_pos").cast("double") / F.col("n").cast("double")).alias("acc"),
        (num.cast("double") / (float(_ECE_MOD) * F.col("n").cast("double"))).alias("gap"),
        (
            F.sum(num).over(w).cast("double")
            / (float(_ECE_MOD) * F.sum("n").over(w).cast("double"))
        ).alias("ece"),
    )


# ---------------------------------------------------------------------------
# gdpr_delete_cascade
# ---------------------------------------------------------------------------

_GDPR_MOD = 97


@query(
    "gdpr_delete_cascade",
    oracle=f"""
    WITH del_cust AS MATERIALIZED (
        SELECT c_custkey FROM customer WHERE c_custkey % {_GDPR_MOD} = 0
    ),
    del_orders AS MATERIALIZED (
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM del_cust)
    ),
    del_li AS (
        SELECT count(*) AS n FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM del_orders)
    )
    SELECT 'customer' AS table_name,
           CAST((SELECT count(*) FROM del_cust) AS BIGINT) AS n_purged,
           CAST((SELECT count(*) FROM customer) -
                (SELECT count(*) FROM del_cust) AS BIGINT) AS n_retained
    UNION ALL
    SELECT 'orders',
           CAST((SELECT count(*) FROM del_orders) AS BIGINT),
           CAST((SELECT count(*) FROM orders) -
                (SELECT count(*) FROM del_orders) AS BIGINT)
    UNION ALL
    SELECT 'lineitem',
           CAST((SELECT n FROM del_li) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem) - (SELECT n FROM del_li) AS BIGINT)
    """,
)
def gdpr_delete_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten delete propagation: a deletion request list
    (every {_GDPR_MOD}th customer — the seam where real DSAR requests
    arrive) cascades across the FK chain customer -> orders -> lineitem,
    and the audit reports purged vs retained row counts per table — the
    numbers a privacy officer signs off before the actual rewrite job.

    Scale: each cascade level is a semi-join on the FK — purged orders by
    o_custkey, purged lineitems by l_orderkey — the same shape an actual
    DELETE ... WHERE EXISTS compiles to; counts are partial aggregates.
    The request list is fact-derived (1/{_GDPR_MOD} of customers), so the
    semi-joins shuffle on their keys rather than assuming a broadcastable
    request set — at 100 TB a year of accumulated DSARs is itself big."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    del_cust = cust.filter(F.col("c_custkey") % _GDPR_MOD == 0)
    del_orders = orders.join(
        del_cust, orders["o_custkey"] == del_cust["c_custkey"], "left_semi"
    ).select("o_orderkey")
    del_li = li.join(
        del_orders, li["l_orderkey"] == del_orders["o_orderkey"], "left_semi"
    )

    def _audit(name: str, total: DataFrame, purged: DataFrame) -> DataFrame:
        t = total.agg(F.count(F.lit(1)).alias("n_total"))
        p = purged.agg(F.count(F.lit(1)).alias("n_purged"))
        return t.crossJoin(p).select(
            F.lit(name).alias("table_name"),
            F.col("n_purged").cast("long").alias("n_purged"),
            (F.col("n_total") - F.col("n_purged")).cast("long").alias("n_retained"),
        )

    return (
        _audit("customer", cust, del_cust)
        .unionAll(_audit("orders", orders, del_orders))
        .unionAll(_audit("lineitem", li, del_li))
    )


# ---------------------------------------------------------------------------
# triplet_mining_hard_negatives
# ---------------------------------------------------------------------------

_TRIP_BATCH = 10  # anchors per mining pass (one mini-batch) — CONSTANT
_TRIP_MARGIN = 0.05


@query(
    "triplet_mining_hard_negatives",
    oracle=f"""
    WITH v AS MATERIALIZED (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings
    ),
    scored AS MATERIALIZED (
        SELECT q.vec_id AS query_id, q.label AS qlabel,
               c.vec_id AS vec_id, c.label AS label,
               {sql_cosine("q.vec", "c.vec")} AS cos
        FROM v q JOIN v c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {_TRIP_BATCH}
    ),
    pos AS (
        SELECT query_id, vec_id AS pos_id, cos AS cos_pos FROM (
            SELECT query_id, vec_id, cos,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos ASC, vec_id) AS rn
            FROM scored WHERE label = qlabel
        ) WHERE rn = 1
    ),
    neg AS (
        SELECT query_id, vec_id AS neg_id, cos AS cos_neg FROM (
            SELECT query_id, vec_id, cos,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, vec_id) AS rn
            FROM scored WHERE label <> qlabel
        ) WHERE rn = 1
    )
    SELECT p.query_id, p.pos_id, p.cos_pos, n.neg_id, n.cos_neg,
           n.cos_neg - p.cos_pos AS margin,
           (n.cos_neg - p.cos_pos > -{_TRIP_MARGIN}) AS violates
    FROM pos p JOIN neg n ON n.query_id = p.query_id
    """,
)
def triplet_mining_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive triplet mining: for each anchor, the HARDEST positive
    (same label, lowest cosine — the pair the model most needs to pull
    together) and the HARDEST negative (different label, highest cosine —
    the pair it most needs to push apart), plus the margin and a
    violation flag (negative closer than positive minus margin) — the
    batch-construction step of triplet/InfoNCE training and the standard
    mining strategy (FaceNet, Schroff et al. 2015).

    Scale: the anchor batch is one CONSTANT-size training mini-batch
    ({_TRIP_BATCH} anchors) whose broadcast is corpus-independent; it
    streams past the corpus once per pass (mining the full training set
    iterates batches, each pass identical); both argmins ride the SAME scan via two windows over the scored
    frame, so mining cost is one corpus pass per batch regardless of
    label count. Cosines are bit-identical cross-engine, so the
    float-derived margin and boolean flag compare exactly."""
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("vec")
    )
    q = v.filter(F.col("vec_id") < _TRIP_BATCH).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("vec").alias("qvec"),
    )
    scored = (
        v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cos",
            dot(F.col("qvec"), F.col("vec"))
            / (norm(F.col("qvec")) * norm(F.col("vec"))),
        )
        .select("query_id", "qlabel", "vec_id", "label", "cos")
    )
    w_pos = Window.partitionBy("query_id").orderBy(F.asc("cos"), F.asc("vec_id"))
    w_neg = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    pos = (
        scored.filter(F.col("label") == F.col("qlabel"))
        .withColumn("rn", F.row_number().over(w_pos))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("vec_id").alias("pos_id"), F.col("cos").alias("cos_pos"))
    )
    neg = (
        scored.filter(F.col("label") != F.col("qlabel"))
        .withColumn("rn", F.row_number().over(w_neg))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("vec_id").alias("neg_id"), F.col("cos").alias("cos_neg"))
    )
    return pos.join(neg, "query_id").select(
        "query_id",
        "pos_id",
        "cos_pos",
        "neg_id",
        "cos_neg",
        (F.col("cos_neg") - F.col("cos_pos")).alias("margin"),
        (F.col("cos_neg") - F.col("cos_pos") > -_TRIP_MARGIN).alias("violates"),
    )


# ---------------------------------------------------------------------------
# tokenizer_fertility_by_lang
# ---------------------------------------------------------------------------


@query(
    "tokenizer_fertility_by_lang",
    oracle="""
    WITH per_doc AS (
        SELECT lang,
               len(regexp_extract_all(text, '[a-z0-9]+')) AS n_words,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
                   AS n_bpe,
               n_chars
        FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_words) AS BIGINT) AS sum_words,
           CAST(sum(n_bpe) AS BIGINT) AS sum_bpe_tokens,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(n_bpe) AS DOUBLE) / CAST(sum(n_words) AS DOUBLE) AS fertility,
           CAST(sum(n_chars) AS DOUBLE) / CAST(sum(n_bpe) AS DOUBLE)
               AS chars_per_token
    FROM per_doc GROUP BY lang
    """,
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language: BPE-ish tokens per whitespace word
    (fertility — the standard multilingual tokenizer-quality metric; a
    language with fertility 2x pays 2x the sequence length for the same
    content) and chars per token (compression), from corpus-level integer
    sums. Uses the repo's BPE-ish regex convention (letters | digits |
    single punctuation) against [a-z0-9]+ words.

    Scale: two regexp_count projections + one partial aggregation to
    |languages| rows; ratios are fixed-order divisions of integer sums —
    bit-identical cross-engine."""
    d = load_table(spark, sf_dir, "documents").select(
        "lang",
        F.regexp_count(F.col("text"), F.lit(r"[a-z0-9]+")).alias("n_words"),
        F.regexp_count(
            F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
        ).alias("n_bpe"),
        "n_chars",
    )
    agg = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("sum_words"),
        F.sum("n_bpe").cast("long").alias("sum_bpe_tokens"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "sum_words",
        "sum_bpe_tokens",
        "sum_chars",
        (
            F.col("sum_bpe_tokens").cast("double")
            / F.col("sum_words").cast("double")
        ).alias("fertility"),
        (
            F.col("sum_chars").cast("double")
            / F.col("sum_bpe_tokens").cast("double")
        ).alias("chars_per_token"),
    )


# ---------------------------------------------------------------------------
# lsh_pair_recall_eval — composed from the registered dedup oracles
# ---------------------------------------------------------------------------

from datapipeline_ops_spark.core.registry import QUERIES  # noqa: E402


@query(
    "lsh_pair_recall_eval",
    oracle=None,  # composed from the registered dedup oracles below
)
def lsh_pair_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-recall audit of the MinHash-LSH near-dup path against the
    exact inverted-index Jaccard ground truth at the same threshold — the
    acceptance gate for the banding parameters (bands x rows fix the
    s-curve; this measures what the curve actually delivered). Also
    surfaces the asymmetry the two pipelines are ALLOWED to have: the
    exact path df-caps boilerplate posting lists (pairs sharing only
    ultra-common shingles don't pair), while LSH verification is uncapped
    — so both only-sides are reported, not assumed empty.

    Scale: composes the two registered pipelines and full-outer-joins
    their PAIR outputs (already threshold-filtered, tiny relative to the
    corpus); counts are one aggregation. Ratios are integer divisions."""
    truth = QUERIES["ngram_jaccard_pairs"].fn(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("in_exact")
    )
    cand = QUERIES["minhash_lsh_pairs"].fn(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("in_lsh")
    )
    both = truth.join(cand, ["doc_a", "doc_b"], "full_outer")
    agg = both.agg(
        F.sum(F.coalesce("in_exact", F.lit(0))).cast("long").alias("n_exact"),
        F.sum(F.coalesce("in_lsh", F.lit(0))).cast("long").alias("n_lsh"),
        F.sum(
            F.when(
                F.col("in_exact").isNotNull() & F.col("in_lsh").isNotNull(), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_both"),
    )
    return agg.select(
        "n_exact",
        "n_lsh",
        "n_both",
        (F.col("n_both").cast("double") / F.col("n_exact").cast("double")).alias(
            "recall_vs_exact"
        ),
        (
            F.col("n_both").cast("double")
            / (F.col("n_exact") + F.col("n_lsh") - F.col("n_both")).cast("double")
        ).alias("pair_set_jaccard"),
    )


def _lsh_recall_oracle() -> str:
    truth_sql = QUERIES["ngram_jaccard_pairs"].oracle
    cand_sql = QUERIES["minhash_lsh_pairs"].oracle
    return f"""
    WITH truth AS MATERIALIZED (SELECT doc_a, doc_b FROM ({truth_sql})),
    cand AS MATERIALIZED (SELECT doc_a, doc_b FROM ({cand_sql})),
    j AS (
        SELECT coalesce(t.doc_a, c.doc_a) AS doc_a,
               coalesce(t.doc_b, c.doc_b) AS doc_b,
               (t.doc_a IS NOT NULL) AS in_exact,
               (c.doc_a IS NOT NULL) AS in_lsh
        FROM truth t FULL OUTER JOIN cand c
          ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
    ),
    agg AS (
        SELECT CAST(sum(CASE WHEN in_exact THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
               CAST(sum(CASE WHEN in_lsh THEN 1 ELSE 0 END) AS BIGINT) AS n_lsh,
               CAST(sum(CASE WHEN in_exact AND in_lsh THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_both
        FROM j
    )
    SELECT n_exact, n_lsh, n_both,
           CAST(n_both AS DOUBLE) / CAST(n_exact AS DOUBLE) AS recall_vs_exact,
           CAST(n_both AS DOUBLE) / CAST(n_exact + n_lsh - n_both AS DOUBLE)
               AS pair_set_jaccard
    FROM agg
    """


QUERIES["lsh_pair_recall_eval"].oracle = _lsh_recall_oracle()


# ---------------------------------------------------------------------------
# preference_pair_margins — best-of-n -> (chosen, rejected) DPO-pair prep
# ---------------------------------------------------------------------------


def _pref_pair_oracle() -> str:
    from datapipeline_ops_spark.functions.money import sql_avg_units

    avg_margin = sql_avg_units("sum(chosen_cents - rejected_cents)", "count(*)", 100, 4)
    return f"""
    WITH c AS (
        SELECT event_id, user_id, event_type,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL
    ),
    r AS (
        SELECT user_id, event_type, cents,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY cents DESC, event_id ASC) AS rn_hi,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY cents ASC, event_id ASC) AS rn_lo,
               count(*) OVER (PARTITION BY user_id) AS n_events
        FROM c
    ),
    p AS (
        SELECT user_id,
               max(CASE WHEN rn_hi = 1 THEN event_type END) AS chosen_type,
               max(CASE WHEN rn_hi = 1 THEN cents END) AS chosen_cents,
               max(CASE WHEN rn_lo = 1 THEN event_type END) AS rejected_type,
               max(CASE WHEN rn_lo = 1 THEN cents END) AS rejected_cents,
               max(n_events) AS n_events
        FROM r GROUP BY user_id
    )
    SELECT chosen_type, rejected_type,
           CAST(count(*) AS BIGINT) AS n_pairs,
           {avg_margin} AS avg_margin,
           CAST(max(chosen_cents - rejected_cents) AS DOUBLE) / 100.0
               AS max_margin
    FROM p
    WHERE n_events >= 2 AND chosen_cents > rejected_cents
    GROUP BY chosen_type, rejected_type
    """


@query("preference_pair_margins", oracle=_pref_pair_oracle())
def preference_pair_margins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-of-n preference-pair extraction — the prep step UPSTREAM of the
    repo's preference fitters (``bradley_terry_strengths``, Elo): each
    user's scored candidate set (events as reward-scored generations for
    one prompt) yields one (chosen, rejected) pair — the top- and
    bottom-scored candidates under a fully deterministic order (cents
    DESC/ASC, event_id tie-break), dropping prompts with fewer than two
    candidates or a zero margin (no training signal). The rollup per
    (chosen_type, rejected_type) — pair counts and exact-cents margin
    stats — is the dataset card a DPO/RLHF run is gated on: it shows
    which variant beats which, how often, and by how much.

    Exactness: margins are integer cents; the mean is the integer half-up
    4dp form (functions/money.py) and the max one exact division, so
    every published value derives from identical integers on both engines.

    Scale: both row_numbers and the per-prompt collapse share ONE
    exchange on user_id (candidate sets are bounded per prompt); the
    final rollup is |types|^2 rows. No pair explosion — the pair is
    argmax/argmin per group, never a cross join."""
    from datapipeline_ops_spark.functions.money import spark_avg_units

    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    c = e.select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w_hi = Window.partitionBy("user_id").orderBy(F.desc("cents"), F.asc("event_id"))
    w_lo = Window.partitionBy("user_id").orderBy(F.asc("cents"), F.asc("event_id"))
    r = c.select(
        "user_id",
        "event_type",
        "cents",
        F.row_number().over(w_hi).alias("rn_hi"),
        F.row_number().over(w_lo).alias("rn_lo"),
    )
    p = r.groupBy("user_id").agg(
        F.max(F.when(F.col("rn_hi") == 1, F.col("event_type"))).alias("chosen_type"),
        F.max(F.when(F.col("rn_hi") == 1, F.col("cents"))).alias("chosen_cents"),
        F.max(F.when(F.col("rn_lo") == 1, F.col("event_type"))).alias("rejected_type"),
        F.max(F.when(F.col("rn_lo") == 1, F.col("cents"))).alias("rejected_cents"),
        F.count(F.lit(1)).alias("n_events"),
    )
    pairs = p.filter(
        (F.col("n_events") >= 2) & (F.col("chosen_cents") > F.col("rejected_cents"))
    )
    g = pairs.groupBy("chosen_type", "rejected_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.col("chosen_cents") - F.col("rejected_cents")).alias("_mc"),
        F.max(F.col("chosen_cents") - F.col("rejected_cents")).alias("_mx"),
    )
    return g.select(
        "chosen_type",
        "rejected_type",
        "n_pairs",
        F.expr(spark_avg_units("_mc", "n_pairs", 100, 4)).alias("avg_margin"),
        (F.col("_mx").cast("double") / 100.0).alias("max_margin"),
    )


# ---------------------------------------------------------------------------
# rejection_sampling_yield — best-of-n yield curve for RLHF / distillation
# sampling budgets
# ---------------------------------------------------------------------------

RSY_NS = (1, 2, 4, 8)
RSY_SEED = 41
RSY_TAU = 0.9


def _rsy_oracle() -> str:
    from datapipeline_ops_spark.functions.hashing import sql_hash64

    spine = ", ".join(str(n) for n in RSY_NS)
    # rewards stay in exact integer ppm until ONE final division, so the
    # mean cannot drift across engines' summation orders (a fuzz-found
    # boundary: avg of k/1e6 doubles flipped the 6th decimal)
    return f"""
    WITH r AS (
        SELECT user_id, {sql_hash64("event_id", seed=RSY_SEED)} % 1000000 AS reward_ppm,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    spine AS (SELECT unnest([{spine}]) AS n_candidates),
    best AS (
        SELECT s.n_candidates, r.user_id, max(r.reward_ppm) AS best
        FROM r JOIN spine s ON r.rn <= s.n_candidates
        GROUP BY 1, 2
    )
    SELECT n_candidates, CAST(count(*) AS BIGINT) AS n_prompts,
           round(sum(best) * 1e0 / (count(*) * 1000000), 6) AS mean_best_reward,
           round(sum(CASE WHEN best >= {int(RSY_TAU * 1000000)} THEN 1 ELSE 0 END)
                 * 1e0 / count(*), 6) AS pass_rate
    FROM best GROUP BY n_candidates
    """


@query("rejection_sampling_yield", oracle=_rsy_oracle())
def rejection_sampling_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-of-n yield curve for rejection sampling: each user's event
    stream stands in for a prompt's candidate generations (arrival order =
    decode order; the md5 stub reward sits in the seam a real reward model
    fills), and for every sampling budget n in {RSY_NS} the curve reports
    the mean best-of-first-n reward and the share of prompts clearing the
    acceptance bar ({RSY_TAU}) — the numbers that price how many samples
    per prompt an RLHF / distillation run should pay for. Prefixes nest,
    so both curves are monotone non-decreasing in n (pinned in the
    invariant audit's MONOTONE layer) — a shared-bug curve cannot fake
    that physics.

    Scale shape: one per-user rank window, then the {len(RSY_NS)}-row
    budget spine broadcasts against the ranked rows (the audited
    broadcast-extent pattern, never a data-sized product); best-of and the
    final rollup are partial-aggregated groupBys on (n, user) then n."""
    from datapipeline_ops_spark.tables import load_table

    # exact integer ppm rewards; ONE final division per published float
    # (see the oracle comment on the fuzz-found summation-order boundary)
    r = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.pmod(hash64(F.col("event_id"), seed=RSY_SEED), F.lit(1000000)).alias(
            "reward_ppm"
        ),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("rn"),
    )
    spine = local_frame(spark, [(n,) for n in RSY_NS], "n_candidates int")
    best = (
        r.join(F.broadcast(spine), F.col("rn") <= F.col("n_candidates"))
        .groupBy("n_candidates", "user_id")
        .agg(F.max("reward_ppm").alias("best"))
    )
    n = F.count(F.lit(1))
    return best.groupBy("n_candidates").agg(
        n.cast("long").alias("n_prompts"),
        F.round(F.sum("best") * 1.0 / (n * 1000000), 6).alias("mean_best_reward"),
        F.round(
            F.sum(F.when(F.col("best") >= int(RSY_TAU * 1000000), 1).otherwise(0))
            * 1.0
            / n,
            6,
        ).alias("pass_rate"),
    )
