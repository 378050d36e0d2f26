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
                       '[?&]+$', '', 'g'),
                   '^(https?://[^/]*):443/', '\\1/', 'g') AS curl
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
        r"^(https?://[^/]*):443/",
        "$1/",
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


# ---------------------------------------------------------------------------
# WARC ingest: stream-parse concatenated crawl records
# ---------------------------------------------------------------------------


@query(
    "warc_record_extract",
    oracle=f"""
    WITH page AS (
        SELECT doc_id,
               'https://' || source || '.example.com/doc/'
                   || CAST(doc_id AS VARCHAR) AS uri,
               {_HTML_SQL} AS html
        FROM documents
    )
    SELECT doc_id, uri AS target_uri,
           CAST(length(html) AS BIGINT) AS content_length,
           md5(html) AS payload_md5,
           TRUE AS framing_ok
    FROM page
    """,
)
def warc_record_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC ingest, value-gated: each partition serializes its documents'
    synthetic HTML pages into ONE concatenated WARC/1.0 byte stream — the
    shape crawl data actually arrives in — then stream-parses it back by
    Content-Length framing (``functions/warc.py``) and emits each record's
    target URI, payload length and payload md5. The oracle predicts every
    value from the page construction, so a framing bug (the classic: a
    payload containing header-like bytes desyncing the stream — these
    payloads DO contain angle brackets and CRLF-free header lookalikes)
    mismatches immediately. ``framing_ok`` additionally asserts the parser
    consumed exactly the records that were written, in order.

    Scale: mapInPandas per partition; the WARC bytes are built, parsed and
    reduced in place — at crawl scale this is the record-iterator stage
    over multi-GB WARC files, with one parser instance per partition."""
    import hashlib as _hl
    from collections.abc import Iterator as _It

    import pandas as _pd

    from datapipeline_ops_spark.functions.warc import (
        parse_warc_stream,
        write_warc_record,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")

    def run(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        for pdf in batches:
            uris, payloads = [], []
            for doc_id, source, text in zip(
                pdf["doc_id"], pdf["source"], pdf["text"]
            ):
                doc_id = int(doc_id)
                uri = f"https://{source}.example.com/doc/{doc_id}"
                html = (
                    f"<html><head><title>{source}</title>"
                    "<style>body{margin:0}</style></head>"
                    f"<body><h1>Doc {doc_id}</h1><p>{text}</p>"
                    "<script>var a=1;</script></body></html>"
                ).encode()
                uris.append(uri)
                payloads.append(html)
            stream = b"".join(
                write_warc_record(u, p, record_id=f"<urn:uuid:{i}>")
                for i, (u, p) in enumerate(zip(uris, payloads))
            )
            records = parse_warc_stream(stream)
            ok = len(records) == len(uris)
            out = {
                "doc_id": [], "target_uri": [], "content_length": [],
                "payload_md5": [], "framing_ok": [],
            }
            for i, (doc_id, rec) in enumerate(zip(pdf["doc_id"], records)):
                out["doc_id"].append(int(doc_id))
                out["target_uri"].append(rec["headers"]["WARC-Target-URI"])
                out["content_length"].append(len(rec["payload"]))
                out["payload_md5"].append(_hl.md5(rec["payload"]).hexdigest())
                out["framing_ok"].append(
                    ok and rec["headers"]["WARC-Target-URI"] == uris[i]
                )
            yield _pd.DataFrame(out)

    return d.mapInPandas(
        run,
        schema="doc_id long, target_uri string, content_length long, "
        "payload_md5 string, framing_ok boolean",
    )


# ---------------------------------------------------------------------------
# Crawl-to-corpus e2e: the web-side funnel composed end to end
# ---------------------------------------------------------------------------

_E2E_MIN_TOKENS = 10


@query(
    "crawl_to_corpus_e2e",
    oracle=f"""
    WITH page AS (
        SELECT doc_id, source,
               {_URL_SQL} AS url,
               {_HTML_SQL} AS html
        FROM documents
    ),
    ext AS (
        SELECT doc_id, source, url,
               trim(regexp_replace(
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(
                               regexp_replace(html,
                                   '<script[^>]*>.*?</script>', ' ', 'g'),
                               '<style[^>]*>.*?</style>', ' ', 'g'),
                           '<title[^>]*>.*?</title>', ' ', 'g'),
                       '<[^>]*>', ' ', 'g'),
                   ' +', ' ', 'g')) AS extracted
        FROM page
    ),
    gated AS (
        SELECT *, len(regexp_split_to_array(extracted, '\\s+')) AS n_tok
        FROM ext
        WHERE len(regexp_split_to_array(extracted, '\\s+')) >= {_E2E_MIN_TOKENS}
    ),
    canon AS (
        SELECT *,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(
                           lower(regexp_replace(url, '#.*$', '')),
                           '(utm_[a-z]+|ref)=[^&]*&?', '', 'g'),
                       '[?&]+$', '', 'g'),
                   '^(https?://[^/]*):443/', '\\1/', 'g') AS curl
        FROM gated
    ),
    keep AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY curl ORDER BY doc_id) AS rn
            FROM canon
        ) WHERE rn = 1
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_pages,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM keep GROUP BY source
    """,
)
def crawl_to_corpus_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The web-side corpus funnel as ONE composed Catalyst plan — the
    stages that run BEFORE `pretrain_data_e2e`'s text-side funnel:
    synthesize crawl pages (URL + HTML) -> strip boilerplate -> token
    quality gate -> URL canonicalization dedup (keeper per canonical
    page) -> per-source page/token rollup. Third flagship next to
    `corpus_curation_e2e` (near-dup story) and `pretrain_data_e2e`
    (decontaminate/split story); together the three are the full
    crawl -> training-corpus build.

    Funnel discipline as in the other flagships: the extraction and gate
    are map-only; the only exchanges are the canonical-URL keeper window
    and the final per-source rollup — both on compact keys, both strictly
    after the row count has been shrunk."""
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
        r"^(https?://[^/]*):443/",
        "$1/",
    )
    gated = (
        d.select(
            "doc_id",
            "source",
            curl.alias("curl"),
            F.size(F.split(ext, r"\s+")).alias("n_tok"),
        )
        .filter(F.col("n_tok") >= _E2E_MIN_TOKENS)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("curl").orderBy("doc_id")
    keep = gated.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return keep.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_pages"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.min("doc_id").cast("long").alias("first_doc"),
    )


# ---------------------------------------------------------------------------
# robots.txt rule application (longest-prefix-match, allow wins ties)
# ---------------------------------------------------------------------------

# deterministic per-host rule set:
#   '/'     -> allow   (default)
#   '/p/'   -> disallow on every third host (by the digits in its name)
#   '/p/1'  -> allow   (exception overriding the /p/ disallow)
_ROBOTS_RULES_SQL = """
    rules AS MATERIALIZED (
        SELECT source AS host, r.prefix, r.allow,
               length(r.prefix) AS plen
        FROM (SELECT DISTINCT source FROM documents),
             (VALUES ('/', TRUE), ('/p/', FALSE), ('/p/1', TRUE))
                 AS r(prefix, allow)
        WHERE r.prefix <> '/p/'
           OR TRY_CAST(NULLIF(regexp_extract(source, '([0-9]+)', 1), '')
                       AS BIGINT) % 3 = 0
    )
"""


@query(
    "robots_rules_apply",
    oracle=f"""
    WITH {_ROBOTS_RULES_SQL},
    urls AS (
        SELECT doc_id, source AS host,
               '/p/' || CAST(doc_id % 97 AS VARCHAR) AS path
        FROM documents
    ),
    matched AS (
        SELECT u.doc_id, u.host, u.path, r.prefix, r.allow,
               row_number() OVER (PARTITION BY u.doc_id
                                  ORDER BY r.plen DESC,
                                           CASE WHEN r.allow THEN 0 ELSE 1 END)
                   AS rn
        FROM urls u JOIN rules r
          ON u.host = r.host AND starts_with(u.path, r.prefix)
    )
    SELECT doc_id, host, path, prefix AS matched_prefix, allow AS allowed
    FROM matched WHERE rn = 1
    """,
)
def robots_rules_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt evaluation with the modern (Google/RFC 9309) semantics:
    the LONGEST matching rule prefix decides, and allow wins a length tie.
    Every third host disallows '/p/' but carves out '/p/1' — so the same
    path is fetchable on one host and not its neighbor, and paths under
    '/p/1' survive the disallow via the longer exception. This is the
    fetch gate between the crawl frontier (`crawl_schedule_plan`) and the
    WARC writer.

    Plan shape: the rule table is |hosts| x |rules| rows — broadcast; the
    prefix match is a broadcast theta-join (starts_with), and the winner
    is one row_number window per URL over <= |rules| candidates. URLs
    never shuffle for the match; only the per-doc argmax window exchanges
    compact rows."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    hosts = d.select(F.col("source").alias("host")).distinct()
    rules = (
        hosts.select(
            "host",
            F.explode(
                F.array(
                    F.struct(F.lit("/").alias("prefix"), F.lit(True).alias("allow")),
                    F.struct(F.lit("/p/").alias("prefix"), F.lit(False).alias("allow")),
                    F.struct(F.lit("/p/1").alias("prefix"), F.lit(True).alias("allow")),
                )
            ).alias("r"),
        )
        .select("host", "r.prefix", "r.allow", F.length("r.prefix").alias("plen"))
        .filter(
            # try_cast mirrors the oracle's TRY_CAST(NULLIF(...)): a host
            # with no digit yields NULL (rule dropped), not an ANSI cast
            # error — the fuzzer's digitless sources hit this path
            (F.col("prefix") != "/p/")
            | (F.regexp_extract("host", r"(\d+)", 1).try_cast("long") % 3 == 0)
        )
    )
    urls = d.select(
        "doc_id",
        F.col("source").alias("host"),
        F.concat(F.lit("/p/"), (F.col("doc_id") % 97).cast("string")).alias("path"),
    )
    matched = urls.join(
        F.broadcast(rules),
        (urls["host"] == rules["host"])
        & F.col("path").startswith(F.col("prefix")),
    ).select(urls["host"].alias("host"), "doc_id", "path", "prefix", "allow", "plen")
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("plen"), F.when(F.col("allow"), 0).otherwise(1)
    )
    return (
        matched.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "host",
            "path",
            F.col("prefix").alias("matched_prefix"),
            F.col("allow").alias("allowed"),
        )
    )
