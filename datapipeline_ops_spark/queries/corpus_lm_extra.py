"""Corpus/LM statistics wave 3: Kneser-Ney smoothing, cross-source
self-BLEU diversity, cross-source duplication matrix, and an l-diversity
governance audit.

Extends the LM-quality family (`lm_quality.py`: add-k bigram perplexity,
Good-Turing) with the smoothing method modern n-gram LMs actually use
(interpolated Kneser-Ney), and the dedup family with source-level overlap
readouts a mixture designer needs before setting sampling weights.

Exactness: all LM statistics are integer counts; the KN probability is one
identical float expression per row (no float aggregation anywhere); overlap
matrices are pure integers with a final rounded ratio.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.functions.hashing import hash64, sql_hash64
from datapipeline_ops_spark.functions.text import tokens
from datapipeline_ops_spark.tables import load_table, local_frame

KN_D = 0.75  # the standard Kneser-Ney absolute discount


def _bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, bg) exploded bigrams, whitespace tokenization —
    the same tokenizer as lm_quality.py so LM families agree."""
    d = load_table(spark, sf_dir, "documents")
    n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    spread = d.select("doc_id", "source", tokens(F.col("text")).alias("t")).repartition(
        n, F.col("doc_id")
    )
    return spread.filter(F.size("t") >= 2).select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(F.col("t"), i),
                    F.element_at(F.col("t"), i + 1),
                ),
            )
        ).alias("bg"),
    )


_SQL_BG = """
    tok AS MATERIALIZED (
        SELECT doc_id, source, regexp_split_to_array(text, '\\s+') AS t
        FROM documents
    ),
    bg AS MATERIALIZED (
        SELECT doc_id, source, t[g.i] || ' ' || t[g.i + 1] AS bg
        FROM tok, unnest(generate_series(1, len(t) - 1)) AS g(i)
        WHERE len(t) >= 2
    )
"""


# ---------------------------------------------------------------------------
# kneser_ney_bigram — interpolated KN smoothing over corpus bigrams
# ---------------------------------------------------------------------------


@query(
    "kneser_ney_bigram",
    oracle=f"""
    WITH {_SQL_BG},
    lm2 AS MATERIALIZED (
        SELECT bg, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY bg
    ),
    lm1 AS MATERIALIZED (
        SELECT split_part(bg, ' ', 1) AS w1,
               CAST(sum(c2) AS BIGINT) AS c1,
               CAST(count(*) AS BIGINT) AS n_fwd
        FROM lm2 GROUP BY 1
    ),
    cont AS MATERIALIZED (
        SELECT split_part(bg, ' ', 2) AS w2,
               CAST(count(*) AS BIGINT) AS n_cont
        FROM lm2 GROUP BY 1
    ),
    nt AS (SELECT CAST(count(*) AS BIGINT) AS n_types FROM lm2)
    SELECT lm2.bg, lm2.c2,
           greatest(CAST(lm2.c2 AS DOUBLE) - {KN_D}, 0.0)
             / CAST(lm1.c1 AS DOUBLE)
           + ({KN_D} * CAST(lm1.n_fwd AS DOUBLE) / CAST(lm1.c1 AS DOUBLE))
             * (CAST(cont.n_cont AS DOUBLE) / CAST(nt.n_types AS DOUBLE))
             AS p_kn
    FROM lm2
    JOIN lm1  ON lm1.w1 = split_part(lm2.bg, ' ', 1)
    JOIN cont ON cont.w2 = split_part(lm2.bg, ' ', 2)
    CROSS JOIN nt
    ORDER BY lm2.c2 DESC, lm2.bg
    LIMIT 200
    """,
)
def kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (discount D=0.75, the
    textbook constant): ``P = max(c2-D,0)/c1 + D*N1+(w1.)/c1 * Pcont(w2)``
    where the continuation probability ``Pcont = N1+(.w2)/|bigram types|``
    counts CONTEXTS, not tokens — the insight that makes KN the strongest
    n-gram smoother (Chen & Goodman 1999). Complements the add-k LM in
    lm_quality.py (reference has no LM surface; cites CCNet-style gating).

    Top-200 bigrams by (count desc, bigram) — a deterministic TakeOrdered.
    Every statistic is an integer count; P assembles in ONE identical float
    expression per row, so no float aggregation exists anywhere.

    Scale: bigram/context/continuation tables are vocabulary-bounded
    aggregates reached by shuffle equi-joins on their keys — the LM is
    never broadcast (only the 1-row type count is); same topology as
    bigram_lm_perplexity which holds beta 0.2 in SCALING.md."""
    bg = _bigrams(spark, sf_dir)
    lm2 = bg.groupBy("bg").agg(F.count(F.lit(1)).cast("long").alias("c2"))
    w1 = F.substring_index(F.col("bg"), " ", 1)
    w2 = F.substring_index(F.col("bg"), " ", -1)
    lm1 = (
        lm2.select(w1.alias("w1"), "c2")
        .groupBy("w1")
        .agg(
            F.sum("c2").cast("long").alias("c1"),
            F.count(F.lit(1)).cast("long").alias("n_fwd"),
        )
    )
    cont = (
        lm2.select(w2.alias("w2"))
        .groupBy("w2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_cont"))
    )
    nt = lm2.agg(F.count(F.lit(1)).cast("long").alias("n_types"))
    p_kn = (
        F.greatest(F.col("c2").cast("double") - F.lit(KN_D), F.lit(0.0))
        / F.col("c1").cast("double")
        + (F.lit(KN_D) * F.col("n_fwd").cast("double") / F.col("c1").cast("double"))
        * (F.col("n_cont").cast("double") / F.col("n_types").cast("double"))
    )
    return (
        lm2.join(lm1, w1 == lm1["w1"])
        .join(cont, w2 == cont["w2"])
        .join(F.broadcast(nt))
        .select("bg", "c2", p_kn.alias("p_kn"))
        .orderBy(F.col("c2").desc(), "bg")
        .limit(200)
    )


# ---------------------------------------------------------------------------
# cross_source_bigram_bleu — self-BLEU-style diversity between sources
# ---------------------------------------------------------------------------


@query(
    "cross_source_bigram_bleu",
    oracle=f"""
    WITH {_SQL_BG},
    sb AS MATERIALIZED (
        SELECT source, bg, CAST(count(*) AS BIGINT) AS c_s
        FROM bg GROUP BY source, bg
    ),
    tot AS MATERIALIZED (
        SELECT bg, CAST(sum(c_s) AS BIGINT) AS c_tot FROM sb GROUP BY bg
    )
    SELECT sb.source,
           CAST(sum(sb.c_s) AS BIGINT) AS n_bigrams,
           CAST(sum(least(sb.c_s, tot.c_tot - sb.c_s)) AS BIGINT) AS clipped,
           round(CAST(sum(least(sb.c_s, tot.c_tot - sb.c_s)) AS DOUBLE)
                 / CAST(sum(sb.c_s) AS DOUBLE), 6) AS self_bleu2
    FROM sb JOIN tot ON tot.bg = sb.bg
    GROUP BY sb.source
    """,
)
def cross_source_bigram_bleu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-BLEU-style diversity: for each source, the clipped bigram
    precision of its text against the REST of the corpus —
    ``sum(min(c_s, c_rest)) / sum(c_s)`` with ``c_rest = c_tot - c_s``.
    High self-BLEU = the source repeats what other sources already say
    (low marginal diversity for a mixture); the standard diversity metric
    for generated corpora (Zhu et al. 2018), computed corpus-level.

    Exact integers end to end: per-(source, bigram) counts joined to
    per-bigram totals on the bigram key, so 'rest of corpus' needs no
    second pass and no source x source pair join.

    Scale: both tables are vocabulary-bounded aggregates; the equi-join on
    bg shuffles agg-sized data; 20 output rows."""
    bg = _bigrams(spark, sf_dir)
    sb = bg.groupBy("source", "bg").agg(
        F.count(F.lit(1)).cast("long").alias("c_s")
    )
    tot = sb.groupBy("bg").agg(F.sum("c_s").cast("long").alias("c_tot"))
    clip = F.sum(F.least(F.col("c_s"), F.col("c_tot") - F.col("c_s"))).cast("long")
    return (
        sb.join(tot, "bg")
        .groupBy("source")
        .agg(
            F.sum("c_s").cast("long").alias("n_bigrams"),
            clip.alias("clipped"),
            F.round(
                clip.cast("double") / F.sum("c_s").cast("double"), 6
            ).alias("self_bleu2"),
        )
    )


# ---------------------------------------------------------------------------
# cross_source_duplication_matrix — shared exact-dup content across sources
# ---------------------------------------------------------------------------


@query(
    "cross_source_duplication_matrix",
    oracle="""
    WITH sh AS MATERIALIZED (
        SELECT DISTINCT source,
               md5(array_to_string(regexp_split_to_array(text, '\\s+')[1:5],
                                   ' ')) AS h
        FROM documents
    ),
    per_src AS MATERIALIZED (
        SELECT source, CAST(count(*) AS BIGINT) AS n_distinct
        FROM sh GROUP BY source
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_shared,
           round(CAST(count(*) AS DOUBLE)
                 / CAST(pa.n_distinct + pb.n_distinct - count(*) AS DOUBLE), 6)
             AS jaccard
    FROM sh a
    JOIN sh b ON b.h = a.h AND a.source < b.source
    JOIN per_src pa ON pa.source = a.source
    JOIN per_src pb ON pb.source = b.source
    GROUP BY a.source, b.source, pa.n_distinct, pb.n_distinct
    """,
)
def cross_source_duplication_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source exact-duplication matrix: for every source pair, how
    many distinct content fingerprints (md5 of the first-5-token prefix —
    the doc_fingerprint convention; exact-text dups are near-absent in the
    corpus so raw-text keys degenerate to an empty matrix) appear in BOTH,
    and the Jaccard overlap of their fingerprint sets. The readout a
    mixture designer checks before weighting sources: double-counted
    content inflates a source's apparent contribution.

    Distinct-FIRST (the entity-resolution lesson): collapse to distinct
    (source, content-hash) before any pairing, so the self-join on the
    hash key generates at most |sources|^2 rows per duplicated hash —
    bounded by the source vocabulary (20), never by document count.

    Scale: one scan -> distinct agg; the pair join is hash-key equi-join
    on agg-sized tables; 20x19/2 max output rows."""
    d = load_table(spark, sf_dir, "documents")
    sh = d.select(
        "source",
        F.md5(F.concat_ws(" ", F.slice(tokens(F.col("text")), 1, 5))).alias("h"),
    ).distinct()
    from datapipeline_ops_spark.operators.dedup import persist_barrier

    sh = persist_barrier(sh, f"xsrc_dup_sh:{sf_dir}")
    per_src = sh.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct")
    )
    a = sh.select(F.col("source").alias("source_a"), "h")
    b = sh.select(F.col("source").alias("source_b"), "h")
    pa = per_src.select(
        F.col("source").alias("source_a"), F.col("n_distinct").alias("na")
    )
    pb = per_src.select(
        F.col("source").alias("source_b"), F.col("n_distinct").alias("nb")
    )
    shared = F.count(F.lit(1)).cast("long")
    return (
        a.join(b, "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .join(F.broadcast(pa), "source_a")
        .join(F.broadcast(pb), "source_b")
        .groupBy("source_a", "source_b", "na", "nb")
        .agg(
            shared.alias("n_shared"),
            F.round(
                shared.cast("double")
                / (F.col("na") + F.col("nb") - shared).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .drop("na", "nb")
    )


# ---------------------------------------------------------------------------
# l_diversity_audit — distinct-sensitive-values per quasi-identifier group
# ---------------------------------------------------------------------------

L_DIVERSITY_L = 3


@query(
    "l_diversity_audit",
    oracle=f"""
    WITH quasi AS (
        SELECT lang, source, n_chars // 500 AS len_bucket,
               {sql_hash64("doc_id", seed=31)} % 8 AS topic
        FROM documents
    )
    SELECT lang, source, CAST(len_bucket AS BIGINT) AS len_bucket,
           CAST(count(*) AS BIGINT) AS group_size,
           CAST(count(DISTINCT topic) AS BIGINT) AS l_distinct,
           count(DISTINCT topic) >= {L_DIVERSITY_L} AS l_diverse
    FROM quasi
    GROUP BY lang, source, len_bucket
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007), the companion to
    the k-anonymity audit in curation_extra.py: a quasi-identifier group
    can be k-anonymous yet still leak if every member shares the same
    SENSITIVE value — each group must contain >= l distinct sensitive
    values. QI tuple (lang, source, length bucket) matches the k-anon
    query; the sensitive attribute is the deterministic hash-stub topic
    (the repo's injected-classifier seam).

    Scale: one scan, one partial-agg'd group-by with a count-distinct —
    group count bounded by the QI domain."""
    d = load_table(spark, sf_dir, "documents").select(
        "lang",
        "source",
        F.expr("n_chars div 500").cast("long").alias("len_bucket"),
        (hash64(F.col("doc_id"), seed=31) % 8).alias("topic"),
    )
    return d.groupBy("lang", "source", "len_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.countDistinct("topic").cast("long").alias("l_distinct"),
        (F.countDistinct("topic") >= L_DIVERSITY_L).alias("l_diverse"),
    )


# ---------------------------------------------------------------------------
# span_corruption_plan — T5-style masking statistics per source
# ---------------------------------------------------------------------------

_SPAN_MASK_PCT = 15  # T5's 15% corruption rate
_SPAN_SEED = 41


@query(
    "span_corruption_plan",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, source,
               len(regexp_split_to_array(text, '\\s+')) AS n
        FROM documents
    ),
    pos AS (
        SELECT doc_id, source, n, g.p,
               CASE WHEN {sql_hash64("doc_id || ':' || g.p", seed=_SPAN_SEED)}
                         % 100 < {_SPAN_MASK_PCT} THEN 1 ELSE 0 END AS m,
               CASE WHEN g.p = 1 THEN 0
                    WHEN {sql_hash64("doc_id || ':' || (g.p - 1)",
                                     seed=_SPAN_SEED)} % 100
                         < {_SPAN_MASK_PCT} THEN 1 ELSE 0 END AS m_prev
        FROM tok, unnest(generate_series(1, n)) AS g(p)
    )
    SELECT source,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(sum(1) AS BIGINT) AS total_tokens,
           CAST(sum(m) AS BIGINT) AS masked_tokens,
           CAST(sum(CASE WHEN m = 1 AND m_prev = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_spans,
           round(CAST(sum(m) AS DOUBLE) / CAST(sum(1) AS DOUBLE), 6)
               AS corruption_rate,
           CASE WHEN sum(CASE WHEN m = 1 AND m_prev = 0 THEN 1 ELSE 0 END) > 0
                THEN round(CAST(sum(m) AS DOUBLE)
                           / CAST(sum(CASE WHEN m = 1 AND m_prev = 0
                                           THEN 1 ELSE 0 END) AS DOUBLE), 4)
                ELSE NULL END AS mean_span_len
    FROM pos
    GROUP BY source
    """,
)
def span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption masking plan: every token position draws a
    deterministic 15% mask from the (doc, position) hash;
    contiguous masked runs form corruption SPANS (a span starts where a
    masked position follows an unmasked one). Per-source statistics —
    corruption rate and mean span length — are what a pretrain-prep
    pipeline validates before writing sentinel-token targets (Raffel et
    al. 2020, §3.1.4). The hash seam is where a real span sampler lands.

    Mask decisions depend only on (doc_id, position), so span starts need
    no window: position p consults its own hash and position p-1's —
    pure per-row JVM expressions after the position explode.

    Scale: the explode is O(total tokens) — the same cost class as the
    registry's shingle/bigram builds — followed by one partial-agg'd
    rollup to 20 source rows; integer counts, two guarded final ratios."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(tokens(F.col("text"))).alias("n")
    )
    pos = d.select(
        "doc_id",
        "source",
        F.explode(F.sequence(F.lit(1), F.col("n"))).alias("p"),
    )
    mask_of = lambda pcol: (  # noqa: E731
        hash64(
            F.concat(F.col("doc_id").cast("string"), F.lit(":"), pcol.cast("string")),
            seed=_SPAN_SEED,
        )
        % 100
        < _SPAN_MASK_PCT
    ).cast("int")
    pos = pos.select(
        "doc_id",
        "source",
        mask_of(F.col("p")).alias("m"),
        F.when(F.col("p") == 1, F.lit(0))
        .otherwise(mask_of(F.col("p") - 1))
        .alias("m_prev"),
    )
    spans = F.sum(
        F.when((F.col("m") == 1) & (F.col("m_prev") == 0), 1).otherwise(0)
    ).cast("long")
    return pos.groupBy("source").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("total_tokens"),
        F.sum("m").cast("long").alias("masked_tokens"),
        spans.alias("n_spans"),
        F.round(
            F.sum("m").cast("double") / F.count(F.lit(1)).cast("double"), 6
        ).alias("corruption_rate"),
        F.when(
            spans > 0, F.round(F.sum("m").cast("double") / spans.cast("double"), 4)
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("mean_span_len"),
    )


# ---------------------------------------------------------------------------
# fim_split_plan — fill-in-middle prefix/middle/suffix split statistics
# ---------------------------------------------------------------------------

_FIM_SEED_A = 43
_FIM_SEED_B = 44
_FIM_SEED_MODE = 45


@query(
    "fim_split_plan",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, source,
               len(regexp_split_to_array(text, '\\s+')) AS n
        FROM documents
    ),
    cuts AS (
        SELECT source, n,
           least(1 + {sql_hash64("doc_id", seed=_FIM_SEED_A)} % n,
                 1 + {sql_hash64("doc_id", seed=_FIM_SEED_B)} % n) AS lo,
           greatest(1 + {sql_hash64("doc_id", seed=_FIM_SEED_A)} % n,
                    1 + {sql_hash64("doc_id", seed=_FIM_SEED_B)} % n) AS hi,
           {sql_hash64("doc_id", seed=_FIM_SEED_MODE)} % 2 AS spm
        FROM tok WHERE n >= 1
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n) AS BIGINT) AS total_tokens,
           CAST(sum(lo - 1) AS BIGINT) AS prefix_tokens,
           CAST(sum(hi - lo) AS BIGINT) AS middle_tokens,
           CAST(sum(n - hi + 1) AS BIGINT) AS suffix_tokens,
           CAST(sum(spm) AS BIGINT) AS n_spm,
           round(CAST(sum(hi - lo) AS DOUBLE) / CAST(sum(n) AS DOUBLE), 6)
               AS middle_frac
    FROM cuts
    GROUP BY source
    """,
)
def fim_split_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle transformation plan: two deterministic hash cuts
    split each document into prefix [1,lo) / middle [lo,hi) / suffix
    [hi,n], plus a hash-chosen PSM-vs-SPM ordering bit — the FIM data prep
    used by infilling-capable code models (Bavarian et al. 2022), validated here
    as per-source split-mass statistics before any text is rewritten.

    No explode at all: the cuts are O(1) arithmetic on the token COUNT,
    so the whole plan is one documents scan and a 20-row rollup. Exact
    integer token masses; one final rounded ratio."""
    d = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id", "source", F.size(tokens(F.col("text"))).alias("n")
        )
        .filter(F.col("n") >= 1)
    )
    ca = 1 + hash64(F.col("doc_id"), seed=_FIM_SEED_A) % F.col("n")
    cb = 1 + hash64(F.col("doc_id"), seed=_FIM_SEED_B) % F.col("n")
    cuts = d.select(
        "source",
        "n",
        F.least(ca, cb).alias("lo"),
        F.greatest(ca, cb).alias("hi"),
        (hash64(F.col("doc_id"), seed=_FIM_SEED_MODE) % 2).alias("spm"),
    )
    return cuts.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n").cast("long").alias("total_tokens"),
        F.sum(F.col("lo") - 1).cast("long").alias("prefix_tokens"),
        F.sum(F.col("hi") - F.col("lo")).cast("long").alias("middle_tokens"),
        F.sum(F.col("n") - F.col("hi") + 1).cast("long").alias("suffix_tokens"),
        F.sum("spm").cast("long").alias("n_spm"),
        F.round(
            F.sum(F.col("hi") - F.col("lo")).cast("double")
            / F.sum("n").cast("double"),
            6,
        ).alias("middle_frac"),
    )


# ---------------------------------------------------------------------------
# t_closeness_audit — TVD between group and global sensitive distributions
# ---------------------------------------------------------------------------


@query(
    "t_closeness_audit",
    oracle=f"""
    WITH quasi AS MATERIALIZED (
        SELECT lang, source,
               {sql_hash64("doc_id", seed=31)} % 8 AS topic
        FROM documents
    ),
    gt AS MATERIALIZED (
        SELECT lang, source, topic, CAST(count(*) AS BIGINT) AS c_gt
        FROM quasi GROUP BY lang, source, topic
    ),
    g AS (
        SELECT lang, source, CAST(sum(c_gt) AS BIGINT) AS n_g
        FROM gt GROUP BY lang, source
    ),
    gdist AS (
        SELECT topic, CAST(sum(c_gt) AS BIGINT) AS c_t FROM gt GROUP BY topic
    ),
    tot AS (SELECT CAST(sum(c_t) AS BIGINT) AS n FROM gdist)
    SELECT g.lang, g.source, g.n_g AS group_size,
           round(CAST(sum(abs(coalesce(gt.c_gt, 0) * tot.n
                              - gdist.c_t * g.n_g)) AS DOUBLE)
                 / CAST(2 * g.n_g * tot.n AS DOUBLE), 6) AS tvd,
           5 * CAST(sum(abs(coalesce(gt.c_gt, 0) * tot.n
                            - gdist.c_t * g.n_g)) AS BIGINT)
               <= 2 * g.n_g * tot.n AS t_close
    FROM g
    CROSS JOIN gdist
    CROSS JOIN tot
    LEFT JOIN gt ON gt.lang = g.lang AND gt.source = g.source
                AND gt.topic = gdist.topic
    GROUP BY g.lang, g.source, g.n_g, tot.n
    """,
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li et al. 2007) — the third rung of the
    anonymization ladder after k-anonymity and [[l_diversity_audit]]: a
    group can be k-anonymous AND l-diverse yet still leak if its sensitive
    distribution DIFFERS sharply from the global one. For categorical
    sensitive values the earth-mover distance reduces to total variation:
    ``tvd = 0.5 * sum_t |p_group(t) - p_global(t)|``, audited per
    (lang, source) group against t = 0.2.

    The verdict is the integer cross-multiplication
    ``5 * sum|c_gt*N - c_t*n_g| <= 2*n_g*N`` — never a float-threshold
    comparison; the reported tvd divides the same exact integers once.
    Missing (group, topic) cells enter as true zeros via the topic-spine
    outer join (a group missing a topic entirely is exactly the leak
    t-closeness exists to catch).

    Scale: one scan -> (group, topic) agg bounded by QI x topic domains;
    the global topic distribution is an 8-row broadcast."""
    quasi = load_table(spark, sf_dir, "documents").select(
        "lang", "source", (hash64(F.col("doc_id"), seed=31) % 8).alias("topic")
    )
    gt = quasi.groupBy("lang", "source", "topic").agg(
        F.count(F.lit(1)).cast("long").alias("c_gt")
    )
    from datapipeline_ops_spark.operators.dedup import persist_barrier

    gt = persist_barrier(gt, f"tclose_gt:{sf_dir}")
    g = gt.groupBy("lang", "source").agg(F.sum("c_gt").cast("long").alias("n_g"))
    glob = gt.groupBy("topic").agg(F.sum("c_gt").cast("long").alias("c_t"))
    tot = glob.agg(F.sum("c_t").cast("long").alias("n"))
    joined = (
        g.join(F.broadcast(glob))
        .join(F.broadcast(tot))
        .join(gt, ["lang", "source", "topic"], "left")
    )
    dev = F.abs(
        F.coalesce(F.col("c_gt"), F.lit(0).cast("long")) * F.col("n")
        - F.col("c_t") * F.col("n_g")
    )
    return joined.groupBy("lang", "source", "n_g", "n").agg(
        F.round(
            F.sum(dev).cast("double")
            / (F.lit(2) * F.col("n_g") * F.col("n")).cast("double"),
            6,
        ).alias("tvd"),
        (
            F.lit(5) * F.sum(dev).cast("long")
            <= F.lit(2) * F.col("n_g") * F.col("n")
        ).alias("t_close"),
    ).select(
        "lang", "source", F.col("n_g").alias("group_size"), "tvd", "t_close"
    )


# ---------------------------------------------------------------------------
# kfold_assignment_audit — deterministic 5-fold CV split + balance audit
# ---------------------------------------------------------------------------

KFOLD_K = 5


@query(
    "kfold_assignment_audit",
    oracle=f"""
    WITH f AS (
        SELECT source, {sql_hash64("doc_id", seed=51)} % {KFOLD_K} AS fold
        FROM documents
    ),
    per AS MATERIALIZED (
        SELECT source, fold, CAST(count(*) AS BIGINT) AS n
        FROM f GROUP BY source, fold
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_folds_present,
           CAST(sum(n) AS BIGINT) AS n_docs,
           CAST(min(n) AS BIGINT) AS min_fold,
           CAST(max(n) AS BIGINT) AS max_fold,
           CASE WHEN min(n) > 0
                THEN round(CAST(max(n) AS DOUBLE) / CAST(min(n) AS DOUBLE), 4)
                ELSE NULL END AS imbalance_ratio,
           count(*) = {KFOLD_K} AND min(n) > 0 AS usable
    FROM per
    GROUP BY source
    """,
)
def kfold_assignment_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold cross-validation assignment (md5 hash of
    doc_id mod {KFOLD_K} — reproducible across runs, engines, and
    cluster sizes, unlike randomSplit) with the per-source balance audit
    an eval pipeline runs before trusting fold metrics: folds present,
    min/max fold size, imbalance ratio, and a usable verdict (every fold
    non-empty). Complements dataset_split_assign (single split) and
    train_test_split_leakfree (group-aware split).

    Scale: one scan, one (source, fold) partial agg, 20-row rollup."""
    f = load_table(spark, sf_dir, "documents").select(
        "source", (hash64(F.col("doc_id"), seed=51) % KFOLD_K).alias("fold")
    )
    per = f.groupBy("source", "fold").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return per.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_folds_present"),
        F.sum("n").cast("long").alias("n_docs"),
        F.min("n").cast("long").alias("min_fold"),
        F.max("n").cast("long").alias("max_fold"),
        F.when(
            F.min("n") > 0,
            F.round(F.max("n").cast("double") / F.min("n").cast("double"), 4),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("imbalance_ratio"),
        ((F.count(F.lit(1)) == KFOLD_K) & (F.min("n") > 0)).alias("usable"),
    )


# ---------------------------------------------------------------------------
# epoch_shuffle_audit — is the per-epoch data order reproducible AND
# decorrelated across epochs?
# ---------------------------------------------------------------------------

# Epoch count and range-bucket fan-out for the distributed successor pass.
# The order key is the md5-derived hex of (epoch, doc_id): deterministic,
# reproducible from the seed alone, and range-bucketable by its first nibble
# (prefix buckets preserve the global lexicographic order, so within-bucket
# successors + one boundary pair per bucket reconstruct the exact global
# successor relation without ever sorting the corpus in one task).
_ESA_EPOCHS = 4


def _esa_sql() -> str:
    return f"""
    WITH spine AS (SELECT unnest(generate_series(0, {_ESA_EPOCHS - 1})) AS epoch),
    keyed AS (
        SELECT s.epoch, d.doc_id,
               substr(md5(CAST(s.epoch AS VARCHAR) || 'e:'
                          || CAST(d.doc_id AS VARCHAR)), 1, 15)
                   || '-' || lpad(CAST(d.doc_id AS VARCHAR), 12, '0') AS skey,
               CAST(('0x' || substr(md5(CAST(s.epoch AS VARCHAR) || 'e:'
                          || CAST(d.doc_id AS VARCHAR)), 1, 1)) AS BIGINT)
                   AS bucket
        FROM documents d CROSS JOIN spine s
    ),
    within AS (
        SELECT epoch, doc_id,
               lead(doc_id) OVER (PARTITION BY epoch, bucket ORDER BY skey)
                   AS succ
        FROM keyed
    ),
    ext AS (
        SELECT epoch, bucket,
               min_by(doc_id, skey) AS first_doc,
               max_by(doc_id, skey) AS last_doc
        FROM keyed GROUP BY epoch, bucket
    ),
    boundary AS (
        SELECT epoch, last_doc AS doc_id,
               lead(first_doc) OVER (PARTITION BY epoch ORDER BY bucket)
                   AS succ
        FROM ext
    ),
    pairs AS (
        SELECT epoch, doc_id, succ FROM within WHERE succ IS NOT NULL
        UNION ALL
        SELECT epoch, doc_id, succ FROM boundary WHERE succ IS NOT NULL
    ),
    pc AS (SELECT epoch, count(*) AS n_pairs FROM pairs GROUP BY epoch),
    rep AS (
        SELECT a.epoch, count(*) AS n_repeats
        FROM pairs a JOIN pairs b
          ON b.epoch = a.epoch + 1 AND b.doc_id = a.doc_id AND b.succ = a.succ
        GROUP BY a.epoch
    )
    SELECT pc.epoch AS epoch_from,
           CAST(pc.epoch + 1 AS INT) AS epoch_to,
           CAST(pc.n_pairs AS BIGINT) AS n_pairs,
           CAST(coalesce(rep.n_repeats, 0) AS BIGINT) AS n_repeats,
           CASE WHEN pc.n_pairs > 0 THEN
               CAST(coalesce(rep.n_repeats, 0) AS DOUBLE)
                   / CAST(pc.n_pairs AS DOUBLE)
           END AS repeat_rate
    FROM pc LEFT JOIN rep ON pc.epoch = rep.epoch
    WHERE pc.epoch < {_ESA_EPOCHS - 1}
    """


@query("epoch_shuffle_audit", oracle=_esa_sql())
def epoch_shuffle_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data order audit: derive each epoch's document order from a
    seeded hash (reproducible from the seed alone — the property a resumable
    trainer needs), extract the global successor relation per epoch, and
    measure how many adjacencies REPEAT in the next epoch. A healthy
    per-epoch shuffle repeats ~0 adjacencies (repeat_rate ~ 1/n); a high
    rate means consecutive epochs present documents in correlated order,
    which turns "4 epochs" into "1 epoch seen 4 times" for curriculum
    effects. n_pairs per epoch is exactly n_docs - 1, so coverage rides
    along for free.

    Scale shape: NO global sort and NO single-task window — the hex order
    key range-buckets by its first nibble (prefix buckets preserve global
    lexicographic order), successors compute inside (epoch, bucket) window
    partitions, and the 16-per-epoch bucket boundaries stitch through a
    bucket-extremes rollup (min_by/max_by on the unique order key) plus a
    16-row lead. The repeat join is an exact equi-join on
    (epoch+1, doc, succ)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    spine = local_frame(spark, [(e,) for e in range(_ESA_EPOCHS)], "epoch int")
    hx = F.substring(
        F.md5(
            F.concat(
                F.col("epoch").cast("string"),
                F.lit("e:"),
                F.col("doc_id").cast("string"),
            )
        ),
        1,
        15,
    )
    keyed = d.crossJoin(F.broadcast(spine)).select(
        "epoch",
        "doc_id",
        F.concat(hx, F.lit("-"), F.lpad(F.col("doc_id").cast("string"), 12, "0")).alias(
            "skey"
        ),
        F.conv(F.substring(hx, 1, 1), 16, 10).cast("int").alias("bucket"),
    )
    w_succ = Window.partitionBy("epoch", "bucket").orderBy("skey")
    within = keyed.select(
        "epoch", "doc_id", F.lead("doc_id").over(w_succ).alias("succ")
    ).filter(F.col("succ").isNotNull())
    ext = keyed.groupBy("epoch", "bucket").agg(
        F.min_by("doc_id", "skey").alias("first_doc"),
        F.max_by("doc_id", "skey").alias("last_doc"),
    )
    w_bkt = Window.partitionBy("epoch").orderBy("bucket")
    boundary = ext.select(
        "epoch",
        F.col("last_doc").alias("doc_id"),
        F.lead("first_doc").over(w_bkt).alias("succ"),
    ).filter(F.col("succ").isNotNull())
    pairs = within.unionAll(boundary)
    pc = pairs.groupBy("epoch").agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    pa = pairs.select(
        F.col("epoch").alias("epoch_a"),
        (F.col("epoch") + 1).alias("nxt"),
        "doc_id",
        "succ",
    )
    pb = pairs.select(
        F.col("epoch").alias("epoch_b"),
        F.col("doc_id").alias("doc_b"),
        F.col("succ").alias("succ_b"),
    )
    rep = (
        pa.join(
            pb,
            (F.col("nxt") == F.col("epoch_b"))
            & (F.col("doc_id") == F.col("doc_b"))
            & (F.col("succ") == F.col("succ_b")),
        )
        .groupBy("epoch_a")
        .agg(F.count(F.lit(1)).cast("long").alias("n_repeats"))
    )
    return (
        pc.filter(F.col("epoch") < _ESA_EPOCHS - 1)
        .join(rep, pc["epoch"] == rep["epoch_a"], "left")
        .select(
            pc["epoch"].alias("epoch_from"),
            (pc["epoch"] + 1).cast("int").alias("epoch_to"),
            "n_pairs",
            F.coalesce("n_repeats", F.lit(0)).cast("long").alias("n_repeats"),
            F.when(
                F.col("n_pairs") > 0,
                F.coalesce("n_repeats", F.lit(0)).cast("double")
                / F.col("n_pairs").cast("double"),
            ).alias("repeat_rate"),
        )
    )
