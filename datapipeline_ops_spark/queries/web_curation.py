"""Web-scrape curation stages: HTML boilerplate stripping and URL
canonicalization dedup.

Beyond-reference surface: a pretraining corpus built from web crawl runs
these two stages before ANY of the text analytics — raw documents arrive
as HTML, and the same page arrives under many URL spellings. Both stages
are pure JVM string/regex expressions (whole-stage codegen; zero UDFs),
and both build their synthetic inputs deterministically from the
documents table with the IDENTICAL concatenation in the oracle, so the
extraction chain and the canonicalization rules are value-gated
character for character.

Cross-engine regex note: Spark compiles java.util.regex, DuckDB uses RE2.
Everything here sticks to the common subset — character classes,
alternation, non-greedy quantifiers, anchors — and avoids lookaround and
backreferences (absent from RE2), so both engines apply the same
semantics to the same patterns.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.tables import load_table

# ---------------------------------------------------------------------------
# HTML boilerplate stripping
# ---------------------------------------------------------------------------

# synthetic page: head noise (title/style), body heading, the document text
# in a paragraph, trailing script — the shapes a real extractor must drop
_HTML_SQL = (
    "'<html><head><title>' || source || '</title>"
    "<style>body{margin:0}</style></head>"
    "<body><h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1><p>' || text || "
    "'</p><script>var a=1;</script></body></html>'"
)


@query(
    "html_text_extract",
    oracle=f"""
    WITH page AS (
        SELECT doc_id, {_HTML_SQL} AS html FROM documents
    ),
    ext AS (
        SELECT p.doc_id, d.text,
               trim(regexp_replace(
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(
                               regexp_replace(p.html,
                                   '<script[^>]*>.*?</script>', ' ', 'g'),
                               '<style[^>]*>.*?</style>', ' ', 'g'),
                           '<title[^>]*>.*?</title>', ' ', 'g'),
                       '<[^>]*>', ' ', 'g'),
                   ' +', ' ', 'g')) AS extracted
        FROM page p JOIN documents d ON p.doc_id = d.doc_id
    )
    SELECT doc_id,
           CAST(length(extracted) AS BIGINT) AS extracted_len,
           md5(extracted) AS extracted_md5,
           extracted = 'Doc ' || CAST(doc_id AS VARCHAR) || ' ' || trim(text)
               AS matches_expected
    FROM ext
    """,
)
def html_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML -> text extraction (trafilatura-lite): drop script / style /
    title blocks, strip remaining tags, collapse whitespace. The page is
    synthesized deterministically around each document's text, so the
    oracle verifies the EXTRACTED BYTES (md5) and the structural claim
    that extraction recovers exactly the heading + original text —
    boilerplate gone, content intact.

    Scale: a per-row regex chain in whole-stage codegen — zero shuffles
    beyond the scan; at crawl scale this is the map stage in front of
    every text analytic. Patterns stay in the java-regex ∩ RE2 subset so
    both engines agree character for character."""
    d = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><head><title>"),
        F.col("source"),
        F.lit("</title><style>body{margin:0}</style></head><body><h1>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit("</p><script>var a=1;</script></body></html>"),
    )
    ext = html
    for pat in (
        r"<script[^>]*>.*?</script>",
        r"<style[^>]*>.*?</style>",
        r"<title[^>]*>.*?</title>",
        r"<[^>]*>",
    ):
        ext = F.regexp_replace(ext, pat, " ")
    ext = F.trim(F.regexp_replace(ext, " +", " "))
    expected = F.concat(
        F.lit("Doc "), F.col("doc_id").cast("string"), F.lit(" "), F.trim("text")
    )
    return d.select(
        "doc_id",
        F.length(ext).cast("long").alias("extracted_len"),
        F.md5(ext.cast("binary")).alias("extracted_md5"),
        (ext == expected).alias("matches_expected"),
    )


# ---------------------------------------------------------------------------
# URL canonicalization dedup
# ---------------------------------------------------------------------------

# messy-but-equivalent URL spellings: uppercase host, explicit default
# port, tracking params, fragment — all of which canonicalization removes.
# The path key is doc_id % 97, so ~97 docs share each canonical page.
_URL_SQL = (
    "'https://WWW.' || source || '.Example.COM:443/p/' "
    "|| CAST(doc_id % 97 AS VARCHAR) "
    "|| '?utm_source=feed&ref=' || CAST(doc_id % 7 AS VARCHAR) "
    "|| '&utm_campaign=x#frag' || CAST(doc_id AS VARCHAR)"
)


@query(
    "url_canonical_dedup",
    oracle=f"""
    WITH u AS (
        SELECT doc_id, {_URL_SQL} AS url FROM documents
    ),
    canon AS (
        SELECT doc_id,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(
                           lower(regexp_replace(u.url, '#.*$', '')),
                           '(utm_[a-z]+|ref)=[^&]*&?', '', 'g'),
                       '[?&]+$', ''),
                   ':443/', '/') AS curl
        FROM u
    )
    SELECT curl AS canonical_url,
           CAST(count(*) AS BIGINT) AS n_dups,
           CAST(min(doc_id) AS BIGINT) AS keeper_doc_id
    FROM canon GROUP BY curl
    """,
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup (the crawl-frontier stage): lowercase,
    strip the fragment, drop tracking parameters (utm_*/ref), remove the
    explicit default port, then group by canonical URL and keep the
    min-doc_id fetch — the rule set that collapses the many spellings of
    one page before any content-level dedup runs. The synthetic URLs
    (deterministic per doc) collide ~97-to-1 after canonicalization, so
    the group/keeper logic is genuinely exercised.

    Lowercasing the whole URL is sound here because the synthetic paths
    are case-free; a production canonicalizer lowercases scheme+host
    only. One partial-aggregated shuffle on the canonical string; the
    regex chain is per-row codegen."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://WWW."),
        F.col("source"),
        F.lit(".Example.COM:443/p/"),
        (F.col("doc_id") % 97).cast("string"),
        F.lit("?utm_source=feed&ref="),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("&utm_campaign=x#frag"),
        F.col("doc_id").cast("string"),
    )
    curl = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.lower(F.regexp_replace(url, r"#.*$", "")),
                r"(utm_[a-z]+|ref)=[^&]*&?",
                "",
            ),
            r"[?&]+$",
            "",
        ),
        ":443/",
        "/",
    )
    return (
        d.select("doc_id", curl.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dups"),
            F.min("doc_id").cast("long").alias("keeper_doc_id"),
        )
    )


# ---------------------------------------------------------------------------
# Crawl politeness scheduling (per-host rate buckets)
# ---------------------------------------------------------------------------

CRAWL_RATE = 8  # fetches per host per time slot


@query(
    "crawl_schedule_plan",
    oracle=f"""
    WITH ranked AS (
        SELECT source AS host, doc_id,
               row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS rk
        FROM documents
    ),
    slotted AS (
        SELECT host, doc_id, rk // {CRAWL_RATE} AS slot
        FROM ranked
    )
    SELECT host,
           CAST(count(*) AS BIGINT) AS n_fetches,
           CAST(max(slot) + 1 AS BIGINT) AS n_slots,
           CAST(count(*) - (max(slot)) * {CRAWL_RATE} AS BIGINT) AS last_slot_fill
    FROM slotted GROUP BY host
    """,
)
def crawl_schedule_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness scheduling for a crawl frontier: per host, assign fetches
    to time slots of at most {CRAWL_RATE} requests (deterministic doc_id
    order), and report the slot count — the host with max(n_slots) is the
    crawl's makespan, the number every frontier planner sizes its worker
    pool against. Rate limits are per-HOST, so the plan is one
    source-partitioned ranking window (no global coordination — exactly
    how a distributed fetcher shards politeness state).

    One exchange on host; the slot assignment is integer arithmetic on
    the rank, so every value is exact cross-engine."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("doc_id")
    slotted = d.select(
        F.col("source").alias("host"),
        "doc_id",
        ((F.row_number().over(w) - 1) / CRAWL_RATE).cast("long").alias("slot"),
    )
    return slotted.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_fetches"),
        (F.max("slot") + 1).cast("long").alias("n_slots"),
        (F.count(F.lit(1)) - F.max("slot") * CRAWL_RATE).cast("long").alias(
            "last_slot_fill"
        ),
    )
