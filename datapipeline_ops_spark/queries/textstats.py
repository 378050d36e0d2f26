"""Text-analysis queries over the ``documents`` corpus: language ID, quality
scoring, token counting, and rolling-hash fingerprinting.

Beyond-reference surface — the reference's ``common/text/`` is an empty stub
(``Text_README.md:1-3``); these are the operators a 100 TB training-data
pipeline runs over every document. All are narrow per-row projections (no
shuffle except the final group-bys), built from JVM-side expressions —
regexes, array ops and the cross-engine hash — so whole-stage codegen keeps
them in one scan pass and the DuckDB oracle reproduces every value.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from datapipeline_ops_spark.core.registry import QUERIES, query
from datapipeline_ops_spark.functions.text import sql_shingles, sql_tokens, tokens
from datapipeline_ops_spark.tables import load_table

# tiny deterministic stopword list for the quality heuristics
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")

# n-gram "language profiles": a doc is scored per language by how many of its
# tokens appear in the profile; argmax wins (deterministic tie-break on name).
# Profiles are over the synthetic corpus vocabulary — the *mechanism* (profile
# overlap scoring) is the real language-ID algorithm shape.
LANG_PROFILES = {
    "query": ("select", "from", "where", "group", "order", "join", "table", "index"),
    "exec": ("scan", "hash", "sort", "merge", "spill", "batch", "row", "column"),
    "infra": ("node", "shard", "cluster", "disk", "network", "cpu", "memory", "cache"),
}


@query(
    "token_stats",
    oracle=f"""
    SELECT doc_id,
           len({sql_tokens("text")}) AS n_tokens,
           len(list_distinct({sql_tokens("text")})) AS n_distinct,
           round(len(list_distinct({sql_tokens("text")})) * 1.0
                 / len({sql_tokens("text")}), 6) AS ttr,
           CAST(round(list_avg(list_transform({sql_tokens("text")},
                t -> CAST(len(t) AS DOUBLE))), 6) AS DOUBLE) AS avg_token_len
    FROM documents
    """,
)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + type/token ratio + mean token length —
    one narrow projection per document, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    n = F.size(t)
    nd = F.size(F.array_distinct(t))
    avg_len = F.aggregate(
        t, F.lit(0.0), lambda acc, x: acc + F.length(x), lambda acc: acc / n
    )
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        nd.alias("n_distinct"),
        F.round(nd.cast("double") / n, 6).alias("ttr"),
        F.round(avg_len, 6).alias("avg_token_len"),
    )


@query(
    "bpe_ish_token_count",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
           CAST(ceil(len(text) / 4.0) AS BIGINT) AS n_char_est
    FROM documents
    """,
)
def bpe_ish_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token estimate: regex pre-tokenizer (letter runs / digit runs
    / single punctuation — the GPT-2 pre-tokenizer shape) plus the chars/4
    heuristic. Both JVM regex, no Python."""
    d = load_table(spark, sf_dir, "documents")
    pieces = F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    return d.select(
        "doc_id",
        F.size(pieces).cast("long").alias("n_bpe_tokens"),
        F.ceil(F.length("text") / 4.0).cast("long").alias("n_char_est"),
    )


_SW_LIST = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


@query(
    "quality_score",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, text, {sql_tokens("text")} AS toks,
               len(regexp_extract_all(text, '[[:punct:]]')) AS n_punct
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               len(toks) AS n_tokens,
               round(len(list_filter(toks, x -> list_contains({_SW_LIST}, x))) * 1.0
                     / len(toks), 6) AS stopword_ratio,
               round(n_punct * 1.0 / len(text), 6) AS punct_ratio,
               round(list_avg(list_transform(toks, x -> CAST(len(x) AS DOUBLE))), 6)
                   AS avg_word_len
        FROM t
    )
    SELECT doc_id, n_tokens, stopword_ratio, punct_ratio, avg_word_len,
           (n_tokens >= 10 AND stopword_ratio >= 0.05 AND punct_ratio <= 0.2
            AND avg_word_len BETWEEN 2 AND 12) AS passes
    FROM m
    """,
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality gates: length, stopword ratio,
    punctuation density, mean word length — each a cheap columnar metric,
    combined into a boolean keep/drop verdict."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    n_sw = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    n_punct = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[\p{Punct}]"), 0))
    avg_wl = F.aggregate(
        toks, F.lit(0.0), lambda acc, x: acc + F.length(x), lambda acc: acc / n
    )
    m = d.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(n_sw.cast("double") / n, 6).alias("stopword_ratio"),
        F.round(n_punct.cast("double") / F.length("text"), 6).alias("punct_ratio"),
        F.round(avg_wl, 6).alias("avg_word_len"),
    )
    return m.withColumn(
        "passes",
        (F.col("n_tokens") >= 10)
        & (F.col("stopword_ratio") >= 0.05)
        & (F.col("punct_ratio") <= 0.2)
        & F.col("avg_word_len").between(2, 12),
    )


_PROFILE_SQL = {
    lang: "[" + ", ".join(f"'{w}'" for w in words) + "]"
    for lang, words in LANG_PROFILES.items()
}
_SCORE_SQL = {
    lang: f"len(list_filter(toks, x -> list_contains({arr}, x)))"
    for lang, arr in _PROFILE_SQL.items()
}
_BEST_SQL = " ".join(
    f"WHEN {_SCORE_SQL[lang]} >= GREATEST({', '.join(_SCORE_SQL[o] for o in sorted(LANG_PROFILES))}) THEN '{lang}'"
    for lang in sorted(LANG_PROFILES)
)


@query(
    "language_id",
    oracle=f"""
    WITH t AS (SELECT doc_id, {sql_tokens("text")} AS toks FROM documents)
    SELECT doc_id,
           CASE {_BEST_SQL} ELSE 'unknown' END AS pred_lang,
           CAST({" + ".join(_SCORE_SQL[lang] for lang in sorted(LANG_PROFILES))} AS BIGINT)
               AS profile_hits
    FROM t
    """,
)
def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile-overlap language ID: score each document against per-language
    token profiles, pick the argmax (first-in-alphabetical-order wins ties —
    identical CASE ladder in both engines). The real-world version swaps the
    profiles for char-n-gram frequency tables; the dataflow is identical."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    def profile_hits(words: tuple[str, ...]):
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))

    scores = {lang: profile_hits(tuple(words)) for lang, words in LANG_PROFILES.items()}
    best = F.greatest(*[scores[lang] for lang in sorted(LANG_PROFILES)])
    pred = F.lit("unknown")
    for lang in sorted(LANG_PROFILES, reverse=True):
        pred = F.when(scores[lang] >= best, F.lit(lang)).otherwise(pred)
    total = None
    for lang in sorted(LANG_PROFILES):
        total = scores[lang] if total is None else total + scores[lang]
    return d.select(
        "doc_id", pred.alias("pred_lang"), total.cast("long").alias("profile_hits")
    )


@query(
    "lang_distribution",
    oracle="""
    SELECT lang, source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang, source
    """,
)
def lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition rollup — the report every curation run ends with.
    Partial aggregation makes this one cheap shuffle of (lang, source)
    pre-aggregated counts regardless of corpus size."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


# polynomial rolling hash over tokens: h = sum token_hash(t_i) * B^(n-1-i) mod P
# B and P small enough that every intermediate fits BIGINT exactly in both
# engines: P < 2^30, B < P, token_hash < P, so acc*B + h < 2^60.
_FP_B = 131
_FP_P = (1 << 30) - 35  # prime 1073741789


@query(
    "doc_fingerprint",
    oracle=f"""
    WITH t AS (SELECT doc_id, {sql_tokens("text")} AS toks FROM documents)
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(toks,
                       x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % {_FP_P})),
               (acc, h) -> (acc * {_FP_B} + h) % {_FP_P}) AS fingerprint
    FROM t
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash document fingerprint (Rabin-Karp shape):
    fold token hashes through acc*B+h mod P. Order-sensitive — permuted
    documents get different prints, unlike bag-of-words hashes. Exact
    BIGINT arithmetic reproduces in any engine."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    th = F.transform(
        toks,
        lambda x: F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast("long") % _FP_P,
    )
    fp = F.aggregate(
        th,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * _FP_B + h) % _FP_P,
    )
    return d.select("doc_id", fp.alias("fingerprint"))


@query(
    "tfidf_top_terms",
    oracle="""
    WITH tok AS (
        SELECT lang, unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
        FROM documents
    ),
    tf AS (SELECT lang, term, count(*) AS tf FROM tok GROUP BY lang, term),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    nl AS (SELECT count(DISTINCT lang) AS n FROM tf),
    scored AS (
        SELECT tf.lang, tf.term,
               round(tf.tf * ln((SELECT n FROM nl) * 1e0 / df.df), 6) AS tfidf
        FROM tf JOIN df ON tf.term = df.term
    )
    SELECT lang, term, tfidf FROM (
        SELECT lang, term, tfidf,
               row_number() OVER (
                   PARTITION BY lang ORDER BY tfidf DESC, term) AS rk
        FROM scored
    ) WHERE rk <= 10
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top-10 terms by TF-IDF (corpus partitions as the
    "documents": tf = term count within the language, idf = ln(n_langs /
    n_langs_containing)) — the characteristic-vocabulary report a corpus
    curator uses to spot contamination between language shards.

    Two aggregations (term×lang, then term) plus a broadcast of the tiny
    df table back onto tf; the per-lang top-10 is a bounded window over the
    aggregated term table — token rows never pass through a window."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(tokens(F.lower(F.col("text")))).alias("term"))
    tf = tok.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.persist()
    try:
        df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        n_langs = tf.select("lang").distinct().count()
        scored = tf.join(df_t, "term").select(
            "lang",
            "term",
            F.round(
                F.col("tf") * F.log(F.lit(float(n_langs)) / F.col("df")), 6
            ).alias("tfidf"),
        )
        from pyspark.sql import Window

        w = Window.partitionBy("lang").orderBy(F.desc("tfidf"), "term")
        out = (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 10)
            .select("lang", "term", "tfidf")
        )
        out = out.localCheckpoint(eager=True)
    finally:
        tf.unpersist()
    return out


@query(
    "char_trigram_lm_score",
    oracle="""
    WITH tri AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, length(text) - 2),
                                     i -> substr(text, i, 3))) AS g
        FROM documents WHERE length(text) >= 3
    ),
    cnt AS (SELECT g, count(*) AS c FROM tri GROUP BY g),
    tot AS (SELECT count(*) AS t FROM tri)
    SELECT tri.doc_id,
           count(*) AS n_tri,
           round(avg(ln(cnt.c * 1e0 / (SELECT t FROM tot))), 4) AS lm_score
    FROM tri JOIN cnt ON tri.g = cnt.g
    GROUP BY tri.doc_id
    """,
)
def char_trigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language-model quality score: train unigram-of-
    trigram stats over the whole corpus in one aggregation, then score each
    document as the mean log-probability of its trigrams — the
    perplexity-style fluency filter (KenLM-shaped, model-free) used to
    rank web-scraped text before training.

    Plan: trigrams are materialized array-side per row (substring ladder,
    no Python), counted once (shuffle on trigram), then the SAME exploded
    frame re-joins the count table and partial-aggregates per doc. The
    trigram vocabulary is bounded (charset³), so at 100 TB the count table
    broadcasts while the corpus-side explode streams."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") >= 3)
    grams = F.expr(
        "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))"
    )
    tri = d.select("doc_id", F.explode(grams).alias("g")).persist()
    try:
        cnt = tri.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
        total = tri.count()
        out = (
            tri.join(F.broadcast(cnt), "g")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_tri"),
                F.round(F.avg(F.log(F.col("c") * 1.0 / total)), 4).alias("lm_score"),
            )
        )
        out = out.localCheckpoint(eager=True)
    finally:
        tri.unpersist()
    return out


@query(
    "zipf_slope_fit",
    oracle="""
    WITH tok AS (
        SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS token
        FROM documents
    ),
    counts AS (
        SELECT token, count(*) AS n FROM tok WHERE token <> '' GROUP BY token
    ),
    top AS (SELECT token, n FROM counts ORDER BY n DESC, token LIMIT 50000),
    ranked AS (
        SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rank FROM top
    )
    SELECT count(*) AS n_tokens,
           round(regr_slope(ln(n), ln(rank)), 6) AS zipf_slope,
           round(regr_intercept(ln(n), ln(rank)), 6) AS zipf_intercept,
           round(regr_r2(ln(n), ln(rank)), 6) AS r2
    FROM ranked
    """,
)
def zipf_slope_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus token distribution: log-log linear
    regression of frequency on rank (natural corpora slope ≈ −1; synthetic
    or templated text departs sharply — a cheap corpus-health fingerprint
    next to language-ID and quality gates).

    Single token-count shuffle; the rank window runs over the top-50k
    vocabulary only (a TakeOrdered merge bounds it — the long tail of
    hapaxes adds noise, not signal, to the fit), then a one-row regression
    aggregate (regr_* are single-pass moment aggregations, partial-combined
    map-side)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(tokens(F.lower(F.col("text")))).alias("token")
    ).filter(F.col("token") != "")
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    # bound the fit to the top-50k vocabulary: the global-rank window then
    # runs over a CONSTANT-size input (the limit plans as a TakeOrdered
    # merge, no full sort) instead of single-partitioning the whole vocab
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(50_000)
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    ranked = top.select("n", F.row_number().over(w).alias("rank"))
    ln_n, ln_r = F.log(F.col("n")), F.log(F.col("rank"))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.regr_slope(ln_n, ln_r), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(ln_n, ln_r), 6).alias("zipf_intercept"),
        F.round(F.regr_r2(ln_n, ln_r), 6).alias("r2"),
    )


_OOV_VOCAB_K = 100
_OOV_MIN_COUNT = 5


@query(
    "oov_rate_report",
    oracle=f"""
    WITH vocab AS (
        SELECT token FROM (
            SELECT t.token AS token, count(*) AS n
            FROM (SELECT unnest({sql_tokens("text")}) AS token FROM documents) t
            GROUP BY t.token
        ) WHERE n >= {_OOV_MIN_COUNT}
        ORDER BY n DESC, token LIMIT {_OOV_VOCAB_K}
    ),
    tok AS (
        SELECT doc_id, unnest({sql_tokens("text")}) AS token FROM documents
    )
    SELECT doc_id,
           count(*) AS n_tokens,
           CAST(sum(CASE WHEN vocab.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           round(sum(CASE WHEN vocab.token IS NULL THEN 1 ELSE 0 END) * 1e0
                 / count(*), 6) AS oov_rate
    FROM tok LEFT JOIN vocab ON tok.token = vocab.token
    GROUP BY doc_id
    """,
)
def oov_rate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fit audit: per-document out-of-vocabulary rate against the
    corpus-built top-{100} vocabulary (the vocab_top_tokens artifact) — the
    health metric that decides whether a tokenizer/vocab needs retraining
    before the corpus ships. High-OOV docs are either foreign-domain or
    junk; both matter to a curation pass.

    The vocabulary is a TakeOrdered-bounded constant-size set and
    BROADCASTS; the corpus side explodes tokens, marks membership map-side
    and partial-aggregates per doc — one compact (doc_id, counts) shuffle,
    no vocab-side shuffle at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= _OOV_MIN_COUNT)
    )
    vocab = (
        counts.orderBy(F.desc("n"), F.asc("token"))
        .limit(_OOV_VOCAB_K)
        .select("token")
        .withColumn("hit", F.lit(1))
    )
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    return (
        tok.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("hit").isNull(), 1).otherwise(0)).alias("n_oov"),
            F.round(
                F.sum(F.when(F.col("hit").isNull(), 1).otherwise(0)) * 1.0
                / F.count(F.lit(1)),
                6,
            ).alias("oov_rate"),
        )
    )


@query(
    "lang_confusion_matrix",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, {sql_tokens("text")} AS toks FROM documents)
    SELECT lang AS declared_lang,
           CASE {_BEST_SQL} ELSE 'unknown' END AS pred_lang,
           count(*) AS n_docs
    FROM t GROUP BY 1, 2
    """,
)
def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-trust audit: the declared ``lang`` column cross-tabulated
    against the engine's own language prediction — the confusion matrix
    that tells a curation pass whether upstream language tags can be used
    for routing/mixing or must be re-derived. Disagreement cells are the
    docs to re-inspect.

    Same per-row profile scoring as language_id (pure JVM array ops, one
    scan), then a partial-aggregated rollup of |langs|x|preds| cells."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))

    def profile_hits(words):
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))

    scores = {lang: profile_hits(tuple(words)) for lang, words in LANG_PROFILES.items()}
    best = F.greatest(*[scores[lang] for lang in sorted(LANG_PROFILES)])
    pred = F.lit("unknown")
    for lang in sorted(LANG_PROFILES, reverse=True):
        pred = F.when(scores[lang] >= best, F.lit(lang)).otherwise(pred)
    return (
        d.select(F.col("lang").alias("declared_lang"), pred.alias("pred_lang"))
        .groupBy("declared_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "text_normalize_stats",
    oracle="""
    WITH n AS (
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(text, '[\\t\\r\\n]', ' ', 'g'),
                                   ' +', ' ', 'g')) AS norm
        FROM documents
    )
    SELECT n.doc_id,
           length(d.text) AS raw_len,
           length(n.norm) AS norm_len,
           length(d.text) - length(n.norm) AS removed,
           md5(n.norm) AS norm_hash
    FROM n JOIN documents d ON n.doc_id = d.doc_id
    """,
)
def text_normalize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization (the pass every corpus runs before hashing or
    tokenizing): control whitespace (tab/CR/LF) to spaces, runs of spaces
    collapsed, edges trimmed — reported as per-doc raw/normalized lengths,
    removed-char count, and the md5 of the NORMALIZED text (the identity
    exact-dedup should key on, so whitespace variants of one document
    hash identically).

    One scan, pure JVM regex projection, no shuffle — the md5 parity with
    the oracle proves both engines normalize to the identical byte string,
    which is exactly the property dedup correctness rests on."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), r"[\t\r\n]", " "), " +", " "
        )
    )
    return d.select(
        "doc_id",
        F.length("text").alias("raw_len"),
        F.length(norm).alias("norm_len"),
        (F.length("text") - F.length(norm)).alias("removed"),
        F.md5(norm.cast("binary")).alias("norm_hash"),
    )


@query(
    "corpus_report_card",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source, {sql_tokens("text")} AS toks, text FROM documents
    ),
    m AS (
        SELECT doc_id, source,
               len(toks) AS n_tokens,
               len(list_filter(toks, x -> list_contains({_SW_LIST}, x))) * 1.0
                   / len(toks) AS sw_ratio,
               CASE {_BEST_SQL} ELSE 'unknown' END AS pred_lang
        FROM t
    ),
    g AS (
        SELECT doc_id, {sql_shingles("text", 3)} AS g3 FROM documents
    ),
    rep AS (
        SELECT doc_id,
               1.0 - len(list_distinct(g3)) * 1.0 / len(g3) AS dup3
        FROM g
    )
    SELECT m.source,
           count(*) AS n_docs,
           round(avg(m.n_tokens), 4) AS mean_tokens,
           round(avg(CASE WHEN m.n_tokens >= 10 AND m.sw_ratio >= 0.05
                          THEN 1e0 ELSE 0e0 END), 6) AS quality_pass_rate,
           round(avg(CASE WHEN rep.dup3 > 0.05 THEN 1e0 ELSE 0e0 END), 6)
               AS repetitive_rate,
           round(avg(CASE WHEN m.pred_lang = 'unknown' THEN 1e0 ELSE 0e0 END), 6)
               AS lang_unknown_rate
    FROM m JOIN rep ON m.doc_id = rep.doc_id
    GROUP BY m.source
    """,
)
def corpus_report_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus report card: document count, mean length, quality
    pass rate (length + stopword gates), repetition rate (dup-3-gram
    fraction > 0.05), and language-ID unknown rate — the one-page summary
    a data team reviews per ingest source before admitting it to the
    training mix. Integrates three per-doc audits (quality, repetition,
    language) in a single pass over the corpus plus one |sources|-row
    rollup — audits compose as column expressions, not separate scans."""
    from datapipeline_ops_spark.functions.text import shingles

    d = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    sw_ratio = F.size(F.filter(toks, lambda x: F.array_contains(sw, x))) * 1.0 / n
    g3 = shingles(F.col("text"), 3)
    dup3 = 1.0 - F.size(F.array_distinct(g3)) / F.size(g3).cast("double")

    def profile_hits(words):
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))

    scores = {lang: profile_hits(tuple(words)) for lang, words in LANG_PROFILES.items()}
    best = F.greatest(*[scores[lang] for lang in sorted(LANG_PROFILES)])
    pred = F.lit("unknown")
    for lang in sorted(LANG_PROFILES, reverse=True):
        pred = F.when(scores[lang] >= best, F.lit(lang)).otherwise(pred)

    per_doc = d.select(
        "source",
        n.alias("n_tokens"),
        sw_ratio.alias("sw_ratio"),
        dup3.alias("dup3"),
        pred.alias("pred_lang"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_tokens"), 4).alias("mean_tokens"),
        F.round(
            F.avg(
                F.when(
                    (F.col("n_tokens") >= 10) & (F.col("sw_ratio") >= 0.05), 1.0
                ).otherwise(0.0)
            ),
            6,
        ).alias("quality_pass_rate"),
        F.round(
            F.avg(F.when(F.col("dup3") > 0.05, 1.0).otherwise(0.0)), 6
        ).alias("repetitive_rate"),
        F.round(
            F.avg(F.when(F.col("pred_lang") == "unknown", 1.0).otherwise(0.0)), 6
        ).alias("lang_unknown_rate"),
    )


@query(
    "entropy_by_source",
    oracle="""
    WITH tok AS MATERIALIZED (
        SELECT source, token, count(*) AS n
        FROM (SELECT source, unnest(regexp_split_to_array(text, '\\s+')) AS token
              FROM documents)
        GROUP BY source, token
    ),
    shares AS (
        SELECT source, n,
               CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY source) AS DOUBLE) AS p
        FROM tok
    )
    SELECT source,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           count(*) AS n_distinct,
           -sum(p * ln(p)) AS entropy,
           CASE WHEN count(*) > 1
                THEN -sum(p * ln(p)) / ln(CAST(count(*) AS DOUBLE))
                ELSE NULL END AS entropy_norm
    FROM shares GROUP BY source
    """,
)
def entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each source's token distribution plus the
    [0, 1]-normalized form H/ln(|vocab_s|) — the "is this source
    boilerplate?" signal (near-0 = a few tokens dominate; near-1 =
    uniform).  One explode+group shuffle carries (source, token) partial
    counts; shares and the entropy sum run on the bounded per-source
    vocabulary table."""
    d = load_table(spark, sf_dir, "documents")
    tok = (
        d.select("source", F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("source")
    shares = tok.select(
        "source",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(w).cast("double")).alias("p"),
    )
    # a single-token vocabulary gives ln(1) = 0 in the normalizer and ANSI
    # Spark raises on the division — NULL in both engines (fuzzer find)
    return shares.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        (-F.sum(F.col("p") * F.log("p"))).alias("entropy"),
        F.when(
            F.count(F.lit(1)) > 1,
            -F.sum(F.col("p") * F.log("p"))
            / F.log(F.count(F.lit(1)).cast("double")),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("entropy_norm"),
    )


@query(
    "js_divergence_sources",
    oracle="""
    WITH tok AS MATERIALIZED (
        SELECT source, token, count(*) AS n
        FROM (SELECT source, unnest(regexp_split_to_array(text, '\\s+')) AS token
              FROM documents)
        GROUP BY source, token
    ),
    corpus AS MATERIALIZED (
        SELECT token,
               CAST(sum(n) AS DOUBLE) / CAST(sum(sum(n)) OVER () AS DOUBLE) AS q
        FROM tok GROUP BY token
    ),
    spine AS (
        SELECT s.source, c.token, c.q
        FROM (SELECT DISTINCT source FROM tok) s CROSS JOIN corpus c
    ),
    dense AS (
        SELECT sp.source, sp.token, sp.q,
               CAST(coalesce(t.n, 0) AS DOUBLE)
                   / CAST(sum(coalesce(t.n, 0)) OVER (PARTITION BY sp.source) AS DOUBLE) AS p
        FROM spine sp LEFT JOIN tok t
          ON t.source = sp.source AND t.token = sp.token
    )
    SELECT source,
           sum(CASE WHEN p > 0 THEN 0.5 * p * ln(p / ((p + q) / 2)) ELSE 0.0 END
               + 0.5 * q * ln(q / ((p + q) / 2))) AS jsd,
           sum(CASE WHEN p > 0 THEN 0.5 * p * ln(p / ((p + q) / 2)) ELSE 0.0 END
               + 0.5 * q * ln(q / ((p + q) / 2))) / ln(2.0) AS jsd_norm
    FROM dense GROUP BY source
    """,
)
def js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence of each source's token distribution from
    the corpus distribution, plus the ln(2)-normalized [0,1] form — the
    domain-mixing diagnostic ("which source is the outlier?") that pairs
    with `domain_mixing_sample`'s reweighting.

    The spine is sources x corpus vocabulary so tokens a source never emits
    still contribute their KL(Q||M) mass (p=0 terms of KL(P||M) are 0 by
    convention).  Shuffles: the (source, token) count group-by (input-
    sized, partial-aggregated) — the spine/densify/divergence stages all
    run on |sources| x |vocab| bounded rows.  At web scale, cap the
    vocabulary to top-K by corpus frequency first (the tail's q mass is
    negligible to JSD)."""
    d = load_table(spark, sf_dir, "documents")
    tok = (
        d.select("source", F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wall = Window.partitionBy()
    corpus = (
        tok.groupBy("token")
        .agg(F.sum("n").alias("cn"))
        .select(
            "token",
            (F.col("cn").cast("double") / F.sum("cn").over(wall).cast("double")).alias("q"),
        )
    )
    spine = tok.select("source").distinct().crossJoin(F.broadcast(corpus))
    wsrc = Window.partitionBy("source")
    dense = (
        spine.join(tok, ["source", "token"], "left")
        .select(
            "source",
            "q",
            (
                F.coalesce(F.col("n"), F.lit(0)).cast("double")
                / F.sum(F.coalesce(F.col("n"), F.lit(0))).over(wsrc).cast("double")
            ).alias("p"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2
    term = (
        F.when(F.col("p") > 0, 0.5 * F.col("p") * F.log(F.col("p") / m)).otherwise(0.0)
        + 0.5 * F.col("q") * F.log(F.col("q") / m)
    )
    return dense.groupBy("source").agg(
        F.sum(term).alias("jsd"),
        (F.sum(term) / F.log(F.lit(2.0))).alias("jsd_norm"),
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage curve (tokenizer design: how much of the token stream
# the top-k vocabulary entries cover)
# ---------------------------------------------------------------------------

VOCAB_CURVE_KS = (10, 100, 1000)


@query(
    "vocab_coverage_curve",
    oracle=f"""
    WITH counts AS MATERIALIZED (
        SELECT token, count(*) AS c
        FROM (SELECT unnest({sql_tokens("text")}) AS token FROM documents)
        GROUP BY token
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM counts),
    ranked AS (
        SELECT token, c, row_number() OVER (ORDER BY c DESC, token) AS rnk
        FROM counts
    )
    SELECT ks.k, CAST(sum(r.c) AS BIGINT) AS covered_tokens,
           CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) / CAST(t.total AS DOUBLE)
               AS coverage
    FROM ranked r
    JOIN (VALUES {", ".join(f"({k})" for k in VOCAB_CURVE_KS)}) AS ks(k)
      ON r.rnk <= ks.k
    CROSS JOIN tot t
    GROUP BY ks.k, t.total
    """,
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage of the token stream by the top-k vocabulary entries for
    k in {VOCAB_CURVE_KS} — the curve a tokenizer designer reads to size
    the vocab (what fraction of occurrences the head covers).

    Scale: token counting is the one real shuffle (partial-aggregated);
    the ranking then runs over AT MOST max(k) rows via TakeOrdered —
    per-partition top-k + a bounded merge, never a global sort of the
    vocabulary — and the curve join is a broadcast against that bounded
    frame. Coverage is BIGINT/BIGINT shipped as the raw double."""
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = counts.agg(F.sum("c").cast("long").alias("total"))
    top = counts.orderBy(F.desc("c"), F.asc("token")).limit(max(VOCAB_CURVE_KS))
    # bounded frame (<= max(k) rows): the unpartitioned window is fine here
    ranked = top.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.desc("c"), F.asc("token")))
    )
    ks = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in VOCAB_CURVE_KS])).alias("k")
    )
    return (
        ranked.join(F.broadcast(ks), ranked["rnk"] <= ks["k"])
        .groupBy("k")
        .agg(F.sum("c").cast("long").alias("covered_tokens"))
        .crossJoin(F.broadcast(total))
        .select(
            "k",
            "covered_tokens",
            (F.col("covered_tokens").cast("double") / F.col("total").cast("double"))
            .alias("coverage"),
        )
    )


# ---------------------------------------------------------------------------
# context_window_fit_report
# ---------------------------------------------------------------------------

_CTX_WINDOWS = (512, 2048, 8192)


@query(
    "context_window_fit_report",
    oracle=f"""
    WITH t AS MATERIALIZED (
        SELECT source,
               CAST(len(regexp_extract_all(text,
                        '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_tok
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN n_tok <= {_CTX_WINDOWS[0]} THEN 1 ELSE 0 END) AS BIGINT) AS n_fit_512,
           CAST(sum(CASE WHEN n_tok <= {_CTX_WINDOWS[1]} THEN 1 ELSE 0 END) AS BIGINT) AS n_fit_2048,
           CAST(sum(CASE WHEN n_tok <= {_CTX_WINDOWS[2]} THEN 1 ELSE 0 END) AS BIGINT) AS n_fit_8192,
           CAST(sum(greatest(n_tok - {_CTX_WINDOWS[0]}, 0)) AS BIGINT) AS trunc_loss_512,
           CAST(sum(greatest(n_tok - {_CTX_WINDOWS[1]}, 0)) AS BIGINT) AS trunc_loss_2048,
           CAST(sum(greatest(n_tok - {_CTX_WINDOWS[2]}, 0)) AS BIGINT) AS trunc_loss_8192
    FROM t GROUP BY source
    """,
)
def context_window_fit_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window fit: per source, how many documents fit whole into a
    512 / 2048 / 8192-token window (BPE-ish token convention) and how many
    tokens a hard truncation at each size would discard — the table that
    picks between truncation, chunking (rag_chunk_plan) and packing
    (sequence_packing_plan) per source, and sizes the loss of the cheap
    option. One scan, one partial aggregation, all integers."""
    t = load_table(spark, sf_dir, "documents").select(
        "source",
        F.regexp_count(
            F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
        )
        .cast("long")
        .alias("n_tok"),
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
    ]
    for wsize in _CTX_WINDOWS:
        aggs.append(
            F.sum(F.when(F.col("n_tok") <= wsize, 1).otherwise(0))
            .cast("long")
            .alias(f"n_fit_{wsize}")
        )
    for wsize in _CTX_WINDOWS:
        aggs.append(
            F.sum(F.greatest(F.col("n_tok") - wsize, F.lit(0)))
            .cast("long")
            .alias(f"trunc_loss_{wsize}")
        )
    return t.groupBy("source").agg(*aggs)


# ---------------------------------------------------------------------------
# source_vocab_jaccard_matrix
# ---------------------------------------------------------------------------


@query(
    "source_vocab_jaccard_matrix",
    oracle=f"""
    WITH st AS MATERIALIZED (
        SELECT DISTINCT source, t.tok
        FROM documents,
             LATERAL unnest(regexp_split_to_array(text, '\\s+')) AS t(tok)
        WHERE t.tok <> ''
    ),
    sizes AS MATERIALIZED (
        SELECT source, CAST(count(*) AS BIGINT) AS vocab FROM st GROUP BY source
    ),
    inter AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(count(*) AS BIGINT) AS n_common
        FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT i.src_a, i.src_b, i.n_common, sa.vocab AS vocab_a, sb.vocab AS vocab_b,
           CAST(i.n_common AS DOUBLE)
               / CAST(sa.vocab + sb.vocab - i.n_common AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.source = i.src_a
    JOIN sizes sb ON sb.source = i.src_b
    """,
)
def source_vocab_jaccard_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between SOURCES — the corpus-level
    similarity matrix that informs mixture design (two sources with
    near-identical vocabularies contribute redundant coverage; upweight
    the outlier instead) and flags accidental source duplication upstream.
    Same inverted-index shape as the document-level near-dup ops, lifted
    one aggregation level: the DISTINCT-FIRST collapse to (source, token)
    bounds everything by |sources| x |vocabulary| regardless of corpus
    row count, and the pair join meets on the token (posting lists of at
    most |sources| entries — no df cap needed at this level).

    Exactness: intersections and vocab sizes are integers;
    Jaccard by inclusion-exclusion is one int/int division."""
    st = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.explode(F.split(F.col("text"), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )
    from datapipeline_ops_spark.operators.dedup import persist_barrier

    st = persist_barrier(st, "source_vocab")
    sizes = st.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("vocab"))
    a = st.select(F.col("source").alias("src_a"), "tok")
    b = st.select(F.col("source").alias("src_b"), F.col("tok").alias("tok2"))
    inter = (
        a.join(b, (F.col("tok") == F.col("tok2")) & (F.col("src_a") < F.col("src_b")))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    return (
        inter.join(sizes.select(F.col("source").alias("src_a"), F.col("vocab").alias("vocab_a")), "src_a")
        .join(sizes.select(F.col("source").alias("src_b"), F.col("vocab").alias("vocab_b")), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_common",
            "vocab_a",
            "vocab_b",
            (
                F.col("n_common").cast("double")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# tokenizer_roundtrip_audit — encode->decode fidelity per language
# ---------------------------------------------------------------------------

_RT_PAT = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@query(
    "tokenizer_roundtrip_audit",
    oracle=None,  # composed below (shares the rate arithmetic with Spark)
)
def tokenizer_roundtrip_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer round-trip fidelity per language: encode every document
    with the BPE-ish pre-tokenizer (the ``bpe_ish_token_count`` regex —
    letter runs / digit runs / single punctuation, whitespace DROPPED),
    decode by single-space joining, and compare against the
    whitespace-normalized original. A document round-trips exactly iff its
    spacing is single-space word separation with no punctuation adjacency
    — precisely the information a lossless tokenizer must carry and a
    lossy one silently destroys, which corrupts spans, FIM splits, and
    exact-substring decontamination downstream.

    Per language: doc counts, exact-round-trip counts and rate (integer
    half-up 6dp — functions/money.py convention), characters in vs
    decoded, and the worst per-doc character loss.

    Scale shape: two JVM regex projections and one partial-aggregated
    group-by on the low-cardinality lang key; nothing shuffles but the
    per-lang partial rows."""
    from datapipeline_ops_spark.functions.money import spark_avg_units

    d = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.col("text"), F.lit(_RT_PAT), 0)
    decoded = F.array_join(toks, " ")
    norm = F.regexp_replace(
        F.regexp_replace(F.col("text"), F.lit(r"^\s+|\s+$"), F.lit("")),
        F.lit(r"\s+"),
        F.lit(" "),
    )
    per = d.select(
        "lang",
        (decoded == norm).cast("int").alias("exact"),
        F.length("text").cast("long").alias("chars_in"),
        F.length(decoded).cast("long").alias("chars_decoded"),
        (F.length(norm) - F.length(decoded)).cast("long").alias("char_delta"),
    )
    g = per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("exact").cast("long").alias("n_exact"),
        F.sum("chars_in").cast("long").alias("sum_chars_in"),
        F.sum("chars_decoded").cast("long").alias("sum_chars_decoded"),
        F.max(F.abs(F.col("char_delta"))).cast("long").alias("max_char_delta"),
    )
    return g.select(
        "lang",
        "n_docs",
        "n_exact",
        F.expr(spark_avg_units("n_exact * 1000000", "n_docs", 1000000, 6)).alias(
            "exact_rate"
        ),
        "sum_chars_in",
        "sum_chars_decoded",
        "max_char_delta",
    )


def _tokenizer_roundtrip_oracle() -> str:
    from datapipeline_ops_spark.functions.money import sql_avg_units

    rate = sql_avg_units("n_exact * 1000000", "n_docs", 1000000, 6)
    return f"""
    WITH per AS (
        SELECT lang,
               CASE WHEN array_to_string(
                        regexp_extract_all(text, '{_RT_PAT}'), ' ')
                    = regexp_replace(
                        regexp_replace(text, '^\\s+|\\s+$', '', 'g'),
                        '\\s+', ' ', 'g')
                    THEN 1 ELSE 0 END AS exact,
               len(text) AS chars_in,
               len(array_to_string(regexp_extract_all(text, '{_RT_PAT}'), ' '))
                   AS chars_decoded,
               len(regexp_replace(regexp_replace(text, '^\\s+|\\s+$', '', 'g'),
                                  '\\s+', ' ', 'g'))
                   - len(array_to_string(regexp_extract_all(text, '{_RT_PAT}'), ' '))
                   AS char_delta
        FROM documents
    ),
    g AS (
        SELECT lang, count(*) AS n_docs,
               CAST(sum(exact) AS BIGINT) AS n_exact,
               CAST(sum(chars_in) AS BIGINT) AS sum_chars_in,
               CAST(sum(chars_decoded) AS BIGINT) AS sum_chars_decoded,
               CAST(max(abs(char_delta)) AS BIGINT) AS max_char_delta
        FROM per GROUP BY lang
    )
    SELECT lang, n_docs, n_exact, {rate} AS exact_rate,
           sum_chars_in, sum_chars_decoded, max_char_delta
    FROM g
    """


QUERIES["tokenizer_roundtrip_audit"].oracle = _tokenizer_roundtrip_oracle()
