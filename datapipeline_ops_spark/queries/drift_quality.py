"""Distribution-drift and data-quality monitoring queries.

A 100 TB training-data pipeline is only as good as its monitoring: before a
corpus snapshot ships, the pipeline compares it against the previous snapshot
(or a holdout split) for covariate drift, checks categorical independence
assumptions, applies document-quality rule gates (Gopher-style heuristics,
Rae et al. 2021 §A1.1), and routes malformed records to a dead-letter queue
instead of poisoning downstream parsing. The reference pipeline has the same
*shape* of needs — per-row gates plus corpus-level report cards (e.g. the
quality gauntlets in ``pipeline/for_high_bg_all_morelittler.py:128-150``) —
re-expressed here as declarative Spark plans.

Scale notes common to the family:
- Every statistic here is computed from a FIXED-WIDTH BINNED sketch (2048 or
  10 bins) or a bounded categorical cross-product — the only shuffles carry
  |bins| or |types|x|weekdays| rows, never input rows.  Exact-order
  statistics (true KS over raw values) would need a global sort; binned KS
  converges to it from below and is the standard monitoring practice.
- Cumulative/total windows run over the PRE-AGGREGATED bin table (<= 2048
  rows), so the single-partition window sort is bounded and constant, not
  data-sized.
- All floating-point is computed in DOUBLE with identical operation order in
  the Spark plan and the DuckDB oracle, so the gate compares exact values.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.functions.hashing import hash_unit, sql_hash64, sql_hash_unit
from datapipeline_ops_spark.tables import load_table

KS_BINS = 2048
PSI_BINS = 10
PSI_EPS = 1e-6
KS_ALPHA_C = 1.358  # c(alpha) at alpha = 0.05 for the two-sample KS test
DLQ_RATE = 0.1


def _bin_expr(value: F.Column, vmin: F.Column, vmax: F.Column, nbins: int) -> F.Column:
    """Fixed-width bin id in [0, nbins): identical arithmetic to _sql_bin.

    Degenerate extent (all values identical, vmax == vmin) maps every row
    to bin 0 in BOTH engines — ANSI Spark would raise DIVIDE_BY_ZERO on
    the unguarded width division (oracle-parity fuzzer, round 9; same
    class as the round-8 histogram_equi_width fix)."""
    return F.least(
        F.when(
            vmax > vmin,
            F.floor(((value - vmin) / (vmax - vmin)) * F.lit(float(nbins))).cast(
                "long"
            ),
        )
        .otherwise(F.lit(0))
        .cast("long"),
        F.lit(nbins - 1),
    )


def _sql_bin(value: str, vmin: str, vmax: str, nbins: int) -> str:
    return (
        f"LEAST(CAST(CASE WHEN {vmax} > {vmin} "
        f"THEN FLOOR((({value} - {vmin}) / ({vmax} - {vmin})) * {float(nbins)}) "
        f"ELSE 0 END AS BIGINT), {nbins - 1})"
    )


@query(
    "ks_drift_binned",
    oracle=f"""
    WITH ext AS (
        SELECT min(value) AS vmin, max(value) AS vmax,
               sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS tot_a,
               sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS tot_b
        FROM events
    ),
    binned AS (
        SELECT {_sql_bin('e.value', 'x.vmin', 'x.vmax', KS_BINS)} AS bin,
               sum(CASE WHEN e.user_id % 2 = 0 THEN 1 ELSE 0 END) AS cnt_a,
               sum(CASE WHEN e.user_id % 2 = 1 THEN 1 ELSE 0 END) AS cnt_b
        FROM events e CROSS JOIN ext x
        GROUP BY 1
    ),
    cdf AS (
        SELECT CASE WHEN x.tot_a > 0
                    THEN CAST(sum(cnt_a) OVER w AS DOUBLE)
                         / CAST(x.tot_a AS DOUBLE) ELSE NULL END AS cdf_a,
               CASE WHEN x.tot_b > 0
                    THEN CAST(sum(cnt_b) OVER w AS DOUBLE)
                         / CAST(x.tot_b AS DOUBLE) ELSE NULL END AS cdf_b,
               x.tot_a, x.tot_b
        FROM binned CROSS JOIN ext x
        WINDOW w AS (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT max(abs(cdf_a - cdf_b)) AS ks_stat,
           CAST(any_value(tot_a) AS BIGINT) AS n_a,
           CAST(any_value(tot_b) AS BIGINT) AS n_b,
           CASE WHEN any_value(tot_a) * any_value(tot_b) > 0
                THEN {KS_ALPHA_C}
                     * sqrt(CAST(any_value(tot_a) + any_value(tot_b) AS DOUBLE)
                            / CAST(any_value(tot_a) * any_value(tot_b) AS DOUBLE))
                ELSE NULL END AS ks_crit,
           CASE WHEN any_value(tot_a) * any_value(tot_b) > 0
                THEN max(abs(cdf_a - cdf_b)) > {KS_ALPHA_C}
                     * sqrt(CAST(any_value(tot_a) + any_value(tot_b) AS DOUBLE)
                            / CAST(any_value(tot_a) * any_value(tot_b) AS DOUBLE))
                ELSE NULL END AS drift
    FROM cdf
    """,
)
def ks_drift_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift check between the even-user and
    odd-user halves of ``events.value``, over a {KS_BINS}-bin fixed-width
    sketch.  The per-bin counts are one partial-aggregated shuffle carrying
    <= 2048 rows; the CDF window and final max run on that bounded table.
    Emits the KS statistic, both sample sizes, the alpha=0.05 critical value
    1.358*sqrt((na+nb)/(na*nb)), and the drift verdict."""
    e = load_table(spark, sf_dir, "events")
    ext = e.agg(
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0)).alias("tot_a"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0)).alias("tot_b"),
    )
    binned = (
        e.crossJoin(F.broadcast(ext))
        .withColumn("bin", _bin_expr(F.col("value"), F.col("vmin"), F.col("vmax"), KS_BINS))
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0)).alias("cnt_a"),
            F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0)).alias("cnt_b"),
        )
    )
    # one user-parity half can be EMPTY (all-even or all-odd user ids):
    # ANSI Spark raises on the CDF and critical-value divisions where
    # DuckDB doesn't — NULL-guard both engines (oracle-parity fuzzer, r9)
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cdf = binned.crossJoin(F.broadcast(ext)).select(
        F.when(
            F.col("tot_a") > 0,
            F.sum("cnt_a").over(w).cast("double") / F.col("tot_a").cast("double"),
        ).alias("cdf_a"),
        F.when(
            F.col("tot_b") > 0,
            F.sum("cnt_b").over(w).cast("double") / F.col("tot_b").cast("double"),
        ).alias("cdf_b"),
        "tot_a",
        "tot_b",
    )
    both = F.any_value("tot_a") * F.any_value("tot_b") > 0
    crit = F.lit(KS_ALPHA_C) * F.sqrt(
        (F.any_value("tot_a") + F.any_value("tot_b")).cast("double")
        / (F.any_value("tot_a") * F.any_value("tot_b")).cast("double")
    )
    return cdf.agg(
        F.max(F.abs(F.col("cdf_a") - F.col("cdf_b"))).alias("ks_stat"),
        F.any_value("tot_a").cast("long").alias("n_a"),
        F.any_value("tot_b").cast("long").alias("n_b"),
        F.when(both, crit).alias("ks_crit"),
        F.when(both, F.max(F.abs(F.col("cdf_a") - F.col("cdf_b"))) > crit).alias(
            "drift"
        ),
    )


@query(
    "psi_stability_report",
    oracle=f"""
    WITH ext AS (
        SELECT min(value) AS vmin, max(value) AS vmax,
               (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS tmid
        FROM events
    ),
    tagged AS (
        SELECT {_sql_bin('e.value', 'x.vmin', 'x.vmax', PSI_BINS)} AS bin,
               CASE WHEN epoch_us(e.ts) <= x.tmid THEN 1 ELSE 0 END AS in_a
        FROM events e CROSS JOIN ext x
    ),
    cells AS (
        SELECT bin, sum(in_a) AS n_a, sum(1 - in_a) AS n_b FROM tagged GROUP BY bin
    ),
    probs AS (
        SELECT bin, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
               CASE WHEN sum(n_a) OVER () > 0
                    THEN GREATEST(CAST(n_a AS DOUBLE)
                                  / CAST(sum(n_a) OVER () AS DOUBLE), {PSI_EPS})
                    ELSE {PSI_EPS} END AS pa,
               CASE WHEN sum(n_b) OVER () > 0
                    THEN GREATEST(CAST(n_b AS DOUBLE)
                                  / CAST(sum(n_b) OVER () AS DOUBLE), {PSI_EPS})
                    ELSE {PSI_EPS} END AS pb
        FROM cells
    )
    SELECT bin, n_a, n_b, pa, pb,
           (pa - pb) * ln(pa / pb) AS psi_term,
           sum((pa - pb) * ln(pa / pb)) OVER () AS psi_total
    FROM probs
    """,
)
def psi_stability_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of the
    event stream (split at the midpoint timestamp, integer microseconds so
    both engines pick the identical boundary), over {PSI_BINS} fixed-width
    value bins.  PSI = sum (pa-pb)*ln(pa/pb) with an epsilon floor on empty
    bins — the standard production drift gate (PSI > 0.2 => investigate).
    One input-sized shuffle (the bin group-by); every window runs on the
    10-row bin table."""
    e = load_table(spark, sf_dir, "events")
    ext = e.agg(
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        ((F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2)
        .cast("long")
        .alias("tmid"),
    )
    cells = (
        e.crossJoin(F.broadcast(ext))
        .select(
            _bin_expr(F.col("value"), F.col("vmin"), F.col("vmax"), PSI_BINS).alias("bin"),
            F.when(F.unix_micros("ts") <= F.col("tmid"), 1).otherwise(0).alias("in_a"),
        )
        .groupBy("bin")
        .agg(F.sum("in_a").alias("n_a"), F.sum(1 - F.col("in_a")).alias("n_b"))
    )
    # all events on one side of the midpoint (e.g. a single distinct
    # timestamp) zeroes a half's total — epsilon-floor that side in BOTH
    # engines instead of dividing by zero (oracle-parity fuzzer, r9)
    wall = Window.partitionBy()
    probs = cells.select(
        "bin",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.when(
            F.sum("n_a").over(wall) > 0,
            F.greatest(
                F.col("n_a").cast("double") / F.sum("n_a").over(wall).cast("double"),
                F.lit(PSI_EPS),
            ),
        )
        .otherwise(F.lit(PSI_EPS))
        .alias("pa"),
        F.when(
            F.sum("n_b").over(wall) > 0,
            F.greatest(
                F.col("n_b").cast("double") / F.sum("n_b").over(wall).cast("double"),
                F.lit(PSI_EPS),
            ),
        )
        .otherwise(F.lit(PSI_EPS))
        .alias("pb"),
    )
    term = (F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb"))
    return probs.select(
        "bin", "n_a", "n_b", "pa", "pb",
        term.alias("psi_term"),
        F.sum(term).over(wall).alias("psi_total"),
    )


@query(
    "chi2_type_by_dow",
    oracle="""
    WITH cells AS (
        SELECT event_type,
               CAST((epoch_us(ts) // 86400000000 + 3) % 7 AS BIGINT) AS dow,
               count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(n) AS DOUBLE) AS n_tot FROM cells),
    expected AS (
        SELECT c.event_type, c.dow, CAST(c.n AS BIGINT) AS n,
               CAST(sum(c.n) OVER (PARTITION BY c.event_type) AS DOUBLE)
                   * CAST(sum(c.n) OVER (PARTITION BY c.dow) AS DOUBLE)
                   / t.n_tot AS expected
        FROM cells c CROSS JOIN tot t
    )
    SELECT event_type, dow, n, expected,
           (CAST(n AS DOUBLE) - expected) * (CAST(n AS DOUBLE) - expected)
               / expected AS contrib,
           sum((CAST(n AS DOUBLE) - expected) * (CAST(n AS DOUBLE) - expected)
               / expected) OVER () AS chi2_total
    FROM expected
    """,
)
def chi2_type_by_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence audit of event_type x day-of-week — "is event
    mix stable across the week, or is a source batching its uploads?".
    Day-of-week comes from epoch-day integer arithmetic ((day+3) % 7,
    0=Monday) so both engines agree without timezone functions.  The only
    input-sized operation is the (type, dow) count group-by; marginals and
    the chi-square total run as windows over the <=70-cell contingency
    table."""
    e = load_table(spark, sf_dir, "events")
    cells = (
        e.select(
            "event_type",
            (((F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long") + 3) % 7)
            .cast("long")
            .alias("dow"),
        )
        .groupBy("event_type", "dow")
        .agg(F.count("*").alias("n"))
    )
    wall = Window.partitionBy()
    n_tot = F.sum("n").over(wall).cast("double")
    expected = (
        F.sum("n").over(Window.partitionBy("event_type")).cast("double")
        * F.sum("n").over(Window.partitionBy("dow")).cast("double")
        / n_tot
    )
    contrib = (F.col("n").cast("double") - F.col("expected")) * (
        F.col("n").cast("double") - F.col("expected")
    ) / F.col("expected")
    return (
        cells.withColumn("expected", expected)
        .select(
            "event_type", "dow", F.col("n").cast("long").alias("n"), "expected",
            contrib.alias("contrib"),
        )
        .withColumn("chi2_total", F.sum("contrib").over(wall))
    )


@query(
    "gopher_quality_flags",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               regexp_split_to_array(trim(text), '\\s+') AS words,
               length(regexp_replace(text, '\\s', '', 'g')) AS n_nonspace
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               CAST(len(words) AS BIGINT) AS n_words,
               CAST(n_nonspace AS DOUBLE) / CAST(len(words) AS DOUBLE) AS mean_word_len,
               CAST(len(list_filter(words, w -> regexp_matches(w, '[a-zA-Z]')))
                    AS DOUBLE) / CAST(len(words) AS DOUBLE) AS alpha_frac
        FROM toks
    )
    SELECT doc_id, n_words, mean_word_len, alpha_frac,
           n_words >= 50 AND n_words <= 100000 AS flag_word_count,
           mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS flag_word_len,
           alpha_frac > 0.8 AS flag_alpha,
           (n_words >= 50 AND n_words <= 100000)
               AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
               AND alpha_frac > 0.8 AS keep
    FROM m
    """,
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule gates (Rae et al. 2021, §A1.1) per document: word
    count in [50, 100000], mean word length in [3, 10], alphabetic-word
    fraction > 0.8 — each emitted as its own flag plus the conjunction, so a
    corpus report can histogram *which* rule rejects.  Pure JVM expressions
    (split/filter/length), zero shuffles, scales as a map-only pass."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.split(F.trim(F.col("text")), r"\s+").alias("words"),
        F.length(F.regexp_replace("text", r"\s", "")).alias("n_nonspace"),
    )
    n_words = F.size("words").cast("long")
    mean_word_len = F.col("n_nonspace").cast("double") / n_words.cast("double")
    alpha_frac = (
        F.size(F.expr("filter(words, w -> w rlike '[a-zA-Z]')")).cast("double")
        / n_words.cast("double")
    )
    m = toks.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        alpha_frac.alias("alpha_frac"),
    )
    f_wc = (F.col("n_words") >= 50) & (F.col("n_words") <= 100_000)
    f_wl = (F.col("mean_word_len") >= 3.0) & (F.col("mean_word_len") <= 10.0)
    f_al = F.col("alpha_frac") > 0.8
    return m.select(
        "doc_id", "n_words", "mean_word_len", "alpha_frac",
        f_wc.alias("flag_word_count"),
        f_wl.alias("flag_word_len"),
        f_al.alias("flag_alpha"),
        (f_wc & f_wl & f_al).alias("keep"),
    )


@query(
    "dead_letter_split",
    oracle=f"""
    WITH corrupted AS (
        SELECT event_type,
               CASE WHEN {sql_hash_unit('event_id', seed=7)} < {DLQ_RATE}
                    THEN substr(props, 1, length(props) - 2) ELSE props END AS raw
        FROM events
    ),
    parsed AS (
        SELECT event_type,
               CAST(json_extract_string(TRY_CAST(raw AS JSON), '$.k') AS BIGINT) AS k
        FROM corrupted
    )
    SELECT event_type,
           count(*) AS n_total,
           CAST(sum(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
           CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dlq,
           CAST(sum(k) AS BIGINT) AS sum_k
    FROM parsed GROUP BY event_type
    """,
)
def dead_letter_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter routing for malformed payloads: ~10% of ``props`` strings
    are deterministically corrupted (truncated mid-object, md5-selected by
    event_id so the oracle corrupts the identical rows), then each row is
    parsed leniently — parse failures are counted into a per-type DLQ tally
    instead of failing the job, parse successes contribute to the payload
    aggregate.  ``get_json_object`` / TRY_CAST-as-JSON return NULL on bad
    input in the respective engines, which is the error-as-data seam.  One
    partial-aggregated shuffle on event_type."""
    e = load_table(spark, sf_dir, "events")
    raw = F.when(
        hash_unit(F.col("event_id"), seed=7) < DLQ_RATE,
        F.substring(F.col("props"), 1, F.length("props") - 2),
    ).otherwise(F.col("props"))
    parsed = e.select(
        "event_type",
        F.get_json_object(raw, "$.k").cast("long").alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(F.col("k").isNotNull(), 1).otherwise(0)).alias("n_ok"),
        F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).alias("n_dlq"),
        F.sum("k").cast("long").alias("sum_k"),
    )


AUC_BINS = 2048
AUC_LABEL_CHARS = 300  # label: long doc (n_chars >= this)


@query(
    "auc_binned_report",
    oracle=f"""
    WITH scored AS MATERIALIZED (
        SELECT CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS score,
               CASE WHEN n_chars >= {AUC_LABEL_CHARS} THEN 1 ELSE 0 END AS label
        FROM documents
    ),
    ext AS (SELECT min(score) AS vmin, max(score) AS vmax FROM scored),
    bins AS (
        SELECT {_sql_bin('s.score', 'x.vmin', 'x.vmax', AUC_BINS)} AS bin,
               CAST(sum(s.label) AS BIGINT) AS n_pos,
               CAST(sum(1 - s.label) AS BIGINT) AS n_neg
        FROM scored s CROSS JOIN ext x GROUP BY 1
    ),
    cum AS (
        SELECT n_pos, n_neg,
               coalesce(sum(n_neg) OVER (ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
        FROM bins
    ),
    tot AS (SELECT CAST(sum(n_pos) AS DOUBLE) AS p, CAST(sum(n_neg) AS DOUBLE) AS n
            FROM cum)
    SELECT CAST(t.p AS BIGINT) AS n_pos, CAST(t.n AS BIGINT) AS n_neg,
           CASE WHEN t.p * t.n > 0
                THEN sum(CAST(c.n_pos AS DOUBLE)
                    * (CAST(c.neg_below AS DOUBLE) + 0.5 * CAST(c.n_neg AS DOUBLE)))
                    / (t.p * t.n) ELSE NULL END AS auc,
           CASE WHEN t.p * t.n > 0
                THEN 2.0 * (sum(CAST(c.n_pos AS DOUBLE)
                    * (CAST(c.neg_below AS DOUBLE) + 0.5 * CAST(c.n_neg AS DOUBLE)))
                    / (t.p * t.n)) - 1.0 ELSE NULL END AS gini
    FROM cum c CROSS JOIN tot t
    GROUP BY t.p, t.n
    """,
)
def auc_binned_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of a score against a binary label, computed from a
    {AUC_BINS}-bin score sketch — the scalable form of the classifier
    acceptance metric (exact AUC needs a global rank; binned AUC with
    within-bin ties counted 1/2 converges from the same sketch the drift
    checks use).  Demonstrated on word-count-as-score vs long-document
    label (AUC ~1 by construction — the metric plumbing is the point;
    substitute any model score column).

    AUC = sum over score bins of n_pos_b * (neg_below_b + n_neg_b/2) /
    (P*N) — rank-sum (Mann-Whitney) over the binned distribution.  One
    partial-aggregated shuffle carries <= {AUC_BINS} rows; the cumulative
    window runs on the bounded bin table."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("double").alias("score"),
        F.when(F.col("n_chars") >= AUC_LABEL_CHARS, 1).otherwise(0).alias("label"),
    )
    ext = scored.agg(F.min("score").alias("vmin"), F.max("score").alias("vmax"))
    bins = (
        scored.crossJoin(F.broadcast(ext))
        .withColumn("bin", _bin_expr(F.col("score"), F.col("vmin"), F.col("vmax"), AUC_BINS))
        .groupBy("bin")
        .agg(
            F.sum("label").cast("long").alias("n_pos"),
            F.sum(1 - F.col("label")).cast("long").alias("n_neg"),
        )
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    cum = bins.select(
        "n_pos", "n_neg",
        F.coalesce(F.sum("n_neg").over(w), F.lit(0)).alias("neg_below"),
    )
    wall = Window.partitionBy()
    tot_p = F.sum("n_pos").over(wall).cast("double")
    tot_n = F.sum("n_neg").over(wall).cast("double")
    contrib = F.col("n_pos").cast("double") * (
        F.col("neg_below").cast("double") + 0.5 * F.col("n_neg").cast("double")
    )
    staged = cum.select(
        "n_pos", "n_neg", contrib.alias("contrib"), tot_p.alias("p"), tot_n.alias("n")
    )
    # a single-class corpus (no positives or no negatives) zeroes P*N —
    # NULL-guard both engines (oracle-parity fuzzer, r9)
    pn = F.any_value("p") * F.any_value("n")
    return (
        staged.groupBy("p", "n")
        .agg(
            F.any_value("p").cast("long").alias("n_pos"),
            F.any_value("n").cast("long").alias("n_neg"),
            F.when(pn > 0, F.sum("contrib") / pn).alias("auc"),
            F.when(pn > 0, 2.0 * F.sum("contrib") / pn - 1.0).alias("gini"),
        )
        .drop("p", "n")
    )


@query(
    "info_gain_type_by_dow",
    oracle="""
    WITH cells AS MATERIALIZED (
        SELECT event_type,
               CAST((epoch_us(ts) // 86400000000 + 3) % 7 AS BIGINT) AS dow,
               count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(n) AS DOUBLE) AS nt FROM cells),
    marg AS (SELECT event_type, CAST(sum(n) AS DOUBLE) AS m FROM cells GROUP BY 1),
    h_type AS (
        SELECT -sum((m / t.nt) * ln(m / t.nt)) AS h
        FROM marg CROSS JOIN tot t GROUP BY t.nt
    ),
    wd AS (SELECT dow, n, sum(n) OVER (PARTITION BY dow) AS nd FROM cells),
    percell AS (
        SELECT dow, nd,
               -(CAST(n AS DOUBLE) / CAST(nd AS DOUBLE))
                   * ln(CAST(n AS DOUBLE) / CAST(nd AS DOUBLE)) AS term
        FROM wd
    ),
    perdow AS (SELECT dow, any_value(nd) AS nd, sum(term) AS hk
               FROM percell GROUP BY dow),
    h_cond AS (
        SELECT sum((CAST(nd AS DOUBLE) / t.nt) * hk) AS h
        FROM perdow CROSS JOIN tot t GROUP BY t.nt
    )
    SELECT round(a.h, 6) + 0e0 AS h_type,
           round(b.h, 6) + 0e0 AS h_type_given_dow,
           round(a.h - b.h, 6) + 0e0 AS info_gain,
           CASE WHEN a.h > 0 THEN round((a.h - b.h) / a.h, 6) + 0e0 ELSE NULL END
               AS info_gain_ratio
    FROM h_type a CROSS JOIN h_cond b
    """,
)
def info_gain_type_by_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information gain of day-of-week about event type: H(type) −
    H(type | dow) — the mutual-information twin of the chi-square audit
    (`chi2_type_by_dow`), in nats. Near-zero gain = the weekly cycle
    carries no signal about event mix (expected for this i.i.d. stream);
    a real pipeline alerts when gain jumps (a source started batching by
    weekday). Same single (type, dow) count shuffle as the chi-square;
    every entropy term computes on the <=35-cell contingency table."""
    e = load_table(spark, sf_dir, "events")
    cells = (
        e.select(
            "event_type",
            (((F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long") + 3) % 7)
            .cast("long")
            .alias("dow"),
        )
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wall = Window.partitionBy()
    nt = F.sum("n").over(wall).cast("double")
    # H(type): marginal over dow first
    type_tot = cells.groupBy("event_type").agg(F.sum("n").alias("m"))
    pt = F.col("m").cast("double") / F.sum("m").over(wall).cast("double")
    h_type = type_tot.select((-F.sum(pt * F.log(pt)).over(wall)).alias("h")).limit(1)
    # H(type | dow): per-dow entropy weighted by dow mass
    wdow = Window.partitionBy("dow")
    pk = F.col("n").cast("double") / F.sum("n").over(wdow).cast("double")
    per_cell = cells.select(
        "dow", "n",
        (-(pk * F.log(pk))).alias("term"),
        F.sum("n").over(wdow).alias("nd"),
        nt.alias("nt"),
    )
    h_cond = (
        per_cell.groupBy("dow")
        .agg(
            F.sum("term").alias("hk"),
            F.any_value("nd").alias("nd"),
            F.any_value("nt").alias("ntt"),
        )
        .select((F.col("nd").cast("double") / F.col("ntt") * F.col("hk")).alias("w"))
        .agg(F.sum("w").alias("h"))
    )
    return (
        h_type.crossJoin(F.broadcast(h_cond.withColumnRenamed("h", "hc")))
        .select(
            # 6-dp round (+0.0) on BOTH engines: a degenerate corpus where
            # every event lands on one day makes H(type|dow) mathematically
            # == H(type), and the two engines' different summation orders
            # published gains of +eps vs -eps (2.2e-16, OPPOSITE signs) —
            # under the driver's 6-significant-figure hash those differ.
            # Caught by the oracle-parity fuzzer, round 14 (catch #21).
            (F.round(F.col("h"), 6) + F.lit(0.0)).alias("h_type"),
            (F.round(F.col("hc"), 6) + F.lit(0.0)).alias("h_type_given_dow"),
            (F.round(F.col("h") - F.col("hc"), 6) + F.lit(0.0)).alias("info_gain"),
            # a single event type gives H(type) = 0 — ANSI Spark raises on
            # the ratio where DuckDB would; NULL-guard both engines
            # (caught by the oracle-parity fuzzer, round 9)
            F.when(
                F.col("h") > 0,
                F.round((F.col("h") - F.col("hc")) / F.col("h"), 6) + F.lit(0.0),
            ).alias("info_gain_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# wasserstein_drift_binned
# ---------------------------------------------------------------------------

W1_BINS = 64


@query(
    "wasserstein_drift_binned",
    oracle=f"""
    WITH ext AS MATERIALIZED (
        SELECT min(value) AS vmin, max(value) AS vmax,
               CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tot_a,
               CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tot_b
        FROM events
    ),
    binned AS (
        SELECT {_sql_bin('e.value', 'x.vmin', 'x.vmax', W1_BINS)} AS bin,
               CAST(sum(CASE WHEN e.user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
               CAST(sum(CASE WHEN e.user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
        FROM events e CROSS JOIN ext x
        GROUP BY 1
    ),
    spine AS (
        SELECT g.bin FROM ext, LATERAL unnest(generate_series(0, {W1_BINS - 1})) AS g(bin)
    ),
    cdf AS (
        SELECT sum(coalesce(b.cnt_a, 0)) OVER w AS cum_a,
               sum(coalesce(b.cnt_b, 0)) OVER w AS cum_b
        FROM spine s LEFT JOIN binned b ON b.bin = s.bin
        WINDOW w AS (ORDER BY s.bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    num AS (
        SELECT CAST(sum(abs(cum_a * x.tot_b - cum_b * x.tot_a)) AS BIGINT) AS sum_abs
        FROM cdf CROSS JOIN ext x
    )
    SELECT x.tot_a AS n_a, x.tot_b AS n_b,
           CASE WHEN x.tot_a * x.tot_b > 0
                THEN CAST(n.sum_abs AS DOUBLE) * (x.vmax - x.vmin) / {W1_BINS}.0
                     / (CAST(x.tot_a AS DOUBLE) * CAST(x.tot_b AS DOUBLE))
                ELSE NULL END AS w1_distance,
           CASE WHEN x.tot_a * x.tot_b > 0
                THEN CAST(n.sum_abs AS DOUBLE) / {W1_BINS}.0
                     / (CAST(x.tot_a AS DOUBLE) * CAST(x.tot_b AS DOUBLE))
                ELSE NULL END AS w1_normalized
    FROM num n CROSS JOIN ext x
    """,
)
def wasserstein_drift_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earth-mover (Wasserstein-1) drift between the even-user and odd-user
    halves of ``events.value`` over a {W1_BINS}-bin fixed-width sketch —
    the drift metric that, unlike KS (max gap), weights HOW FAR mass
    moved: W1 = integral |CDF_a - CDF_b|, here the bin-width-weighted sum
    over the full bin spine (empty bins included — their CDF gap still
    contributes, which group-by alone would silently drop).

    Exactness: the CDF gap per bin is |cum_a·n_b - cum_b·n_a| / (n_a·n_b)
    — an INTEGER numerator, summed as integers across bins before one
    final float division (the calibration_ece_report discipline), so the
    statistic is bit-identical cross-engine despite being a sum of 64
    float-looking terms.

    Scale: identical shape to ks_drift_binned — one partial-agg shuffle
    of <= {W1_BINS} rows after a single fact scan; the spine join and
    window run on the bounded bin table."""
    e = load_table(spark, sf_dir, "events")
    ext = e.agg(
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("tot_a"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
        .cast("long")
        .alias("tot_b"),
    )
    binned = (
        e.crossJoin(F.broadcast(ext))
        .withColumn(
            "bin", _bin_expr(F.col("value"), F.col("vmin"), F.col("vmax"), W1_BINS)
        )
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
            .cast("long")
            .alias("cnt_a"),
            F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
            .cast("long")
            .alias("cnt_b"),
        )
    )
    spine = ext.select(
        F.explode(F.sequence(F.lit(0), F.lit(W1_BINS - 1))).alias("bin")
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cdf = (
        spine.join(binned, "bin", "left")
        .select(
            "bin",
            F.coalesce("cnt_a", F.lit(0)).alias("cnt_a"),
            F.coalesce("cnt_b", F.lit(0)).alias("cnt_b"),
        )
        .withColumn("cum_a", F.sum("cnt_a").over(w))
        .withColumn("cum_b", F.sum("cnt_b").over(w))
    )
    num = cdf.crossJoin(F.broadcast(ext)).agg(
        F.sum(F.abs(F.col("cum_a") * F.col("tot_b") - F.col("cum_b") * F.col("tot_a")))
        .cast("long")
        .alias("sum_abs")
    )
    # one empty user-parity half zeroes n_a*n_b — NULL-guard both engines
    # (oracle-parity fuzzer, r9)
    ab = F.col("tot_a") * F.col("tot_b") > 0
    return num.crossJoin(F.broadcast(ext)).select(
        F.col("tot_a").alias("n_a"),
        F.col("tot_b").alias("n_b"),
        F.when(
            ab,
            F.col("sum_abs").cast("double")
            * (F.col("vmax") - F.col("vmin"))
            / float(W1_BINS)
            / (F.col("tot_a").cast("double") * F.col("tot_b").cast("double")),
        ).alias("w1_distance"),
        F.when(
            ab,
            F.col("sum_abs").cast("double")
            / float(W1_BINS)
            / (F.col("tot_a").cast("double") * F.col("tot_b").cast("double")),
        ).alias("w1_normalized"),
    )


# ---------------------------------------------------------------------------
# quality_gate_correlation
# ---------------------------------------------------------------------------

_QGC_CHARS = 500
_QGC_TOKENS = 80


@query(
    "quality_gate_correlation",
    oracle=f"""
    WITH flags AS MATERIALIZED (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g1,
               CASE WHEN n_chars >= {_QGC_CHARS} THEN 1 ELSE 0 END AS g2,
               CASE WHEN len(regexp_extract_all(text, '[a-z0-9]+')) >= {_QGC_TOKENS}
                    THEN 1 ELSE 0 END AS g3
        FROM documents
    ),
    c AS (
        SELECT
          CAST(sum(g1 * g2) AS BIGINT) AS a_11,
          CAST(sum(g1 * (1 - g2)) AS BIGINT) AS a_10,
          CAST(sum((1 - g1) * g2) AS BIGINT) AS a_01,
          CAST(sum((1 - g1) * (1 - g2)) AS BIGINT) AS a_00,
          CAST(sum(g1 * g3) AS BIGINT) AS b_11,
          CAST(sum(g1 * (1 - g3)) AS BIGINT) AS b_10,
          CAST(sum((1 - g1) * g3) AS BIGINT) AS b_01,
          CAST(sum((1 - g1) * (1 - g3)) AS BIGINT) AS b_00,
          CAST(sum(g2 * g3) AS BIGINT) AS c_11,
          CAST(sum(g2 * (1 - g3)) AS BIGINT) AS c_10,
          CAST(sum((1 - g2) * g3) AS BIGINT) AS c_01,
          CAST(sum((1 - g2) * (1 - g3)) AS BIGINT) AS c_00
        FROM flags
    ),
    rows_out AS (
        SELECT 'lang_x_len' AS gate_pair, a_11 AS n11, a_10 AS n10, a_01 AS n01, a_00 AS n00 FROM c
        UNION ALL
        SELECT 'lang_x_tokens', b_11, b_10, b_01, b_00 FROM c
        UNION ALL
        SELECT 'len_x_tokens', c_11, c_10, c_01, c_00 FROM c
    )
    SELECT gate_pair, n11, n10, n01, n00,
           CASE WHEN (n11 + n10) > 0 AND (n01 + n00) > 0
                 AND (n11 + n01) > 0 AND (n10 + n00) > 0
                THEN CAST(n11 * n00 - n10 * n01 AS DOUBLE)
                     / sqrt(CAST((n11 + n10) * (n01 + n00) AS DOUBLE)
                            * CAST((n11 + n01) * (n10 + n00) AS DOUBLE))
           END AS phi
    FROM rows_out
    """,
)
def quality_gate_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise phi correlation between three curation gates (lang==en,
    length floor, token-count floor) from their 2x2 contingency tables —
    the redundancy audit of a quality-filter stack: two gates with phi
    near 1 are one gate paid for twice (drop one), phi near 0 means each
    removes different documents (keep both). The question every
    multi-gate curation funnel should answer before burning a corpus pass
    per gate.

    Exactness: all four cells of every contingency table are integer sums
    from ONE scan (12 conditional counters, map-side combined); phi's
    numerator is integer arithmetic and the denominator one sqrt of an
    integer product — fixed op order, bit-identical; degenerate margins
    degrade to NULL identically.

    Scale: one fact scan -> a 1-row aggregate -> three constant rows."""
    flags = load_table(spark, sf_dir, "documents").select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("g1"),
        F.when(F.col("n_chars") >= _QGC_CHARS, 1).otherwise(0).alias("g2"),
        F.when(
            F.regexp_count(F.col("text"), F.lit(r"[a-z0-9]+")) >= _QGC_TOKENS, 1
        )
        .otherwise(0)
        .alias("g3"),
    )
    aggs = []
    for tag, x, y in (("a", "g1", "g2"), ("b", "g1", "g3"), ("c", "g2", "g3")):
        gx, gy = F.col(x), F.col(y)
        aggs += [
            F.sum(gx * gy).cast("long").alias(f"{tag}_11"),
            F.sum(gx * (1 - gy)).cast("long").alias(f"{tag}_10"),
            F.sum((1 - gx) * gy).cast("long").alias(f"{tag}_01"),
            F.sum((1 - gx) * (1 - gy)).cast("long").alias(f"{tag}_00"),
        ]
    c = flags.agg(*aggs)
    rows_out = c.select(
        F.expr(
            "stack(3, "
            "'lang_x_len', a_11, a_10, a_01, a_00, "
            "'lang_x_tokens', b_11, b_10, b_01, b_00, "
            "'len_x_tokens', c_11, c_10, c_01, c_00"
            ") AS (gate_pair, n11, n10, n01, n00)"
        )
    )
    n11, n10, n01, n00 = (F.col(c_) for c_ in ("n11", "n10", "n01", "n00"))
    ok = (
        ((n11 + n10) > 0) & ((n01 + n00) > 0) & ((n11 + n01) > 0) & ((n10 + n00) > 0)
    )
    phi = F.when(
        ok,
        (n11 * n00 - n10 * n01).cast("double")
        / F.sqrt(
            ((n11 + n10) * (n01 + n00)).cast("double")
            * ((n11 + n01) * (n10 + n00)).cast("double")
        ),
    )
    return rows_out.select("gate_pair", "n11", "n10", "n01", "n00", phi.alias("phi"))


# ---------------------------------------------------------------------------
# annotator_kappa
# ---------------------------------------------------------------------------

_KAP_THRESH = 650
_KAP_NOISE = 300


@query(
    "annotator_kappa",
    oracle=f"""
    WITH labels AS MATERIALIZED (
        SELECT CASE WHEN {sql_hash64("doc_id", 43)} % 1000
                         + {sql_hash64("doc_id", 47)} % {_KAP_NOISE}
                         > {_KAP_THRESH} THEN 1 ELSE 0 END AS a1,
               CASE WHEN {sql_hash64("doc_id", 43)} % 1000
                         + {sql_hash64("doc_id", 48)} % {_KAP_NOISE}
                         > {_KAP_THRESH} THEN 1 ELSE 0 END AS a2
        FROM documents
    ),
    c AS (
        SELECT CAST(sum(a1 * a2) AS BIGINT) AS n11,
               CAST(sum(a1 * (1 - a2)) AS BIGINT) AS n10,
               CAST(sum((1 - a1) * a2) AS BIGINT) AS n01,
               CAST(sum((1 - a1) * (1 - a2)) AS BIGINT) AS n00
        FROM labels
    )
    SELECT n11, n10, n01, n00,
           CAST(n11 + n00 AS DOUBLE) / CAST(n11 + n10 + n01 + n00 AS DOUBLE) AS po,
           (CAST((n11 + n10) * (n11 + n01) AS DOUBLE)
            + CAST((n01 + n00) * (n10 + n00) AS DOUBLE))
               / (CAST(n11 + n10 + n01 + n00 AS DOUBLE)
                  * CAST(n11 + n10 + n01 + n00 AS DOUBLE)) AS pe,
           CASE WHEN (CAST((n11 + n10) * (n11 + n01) AS DOUBLE)
                      + CAST((n01 + n00) * (n10 + n00) AS DOUBLE))
                         / (CAST(n11 + n10 + n01 + n00 AS DOUBLE)
                            * CAST(n11 + n10 + n01 + n00 AS DOUBLE)) <> 1.0
                THEN (CAST(n11 + n00 AS DOUBLE)
                          / CAST(n11 + n10 + n01 + n00 AS DOUBLE)
                      - (CAST((n11 + n10) * (n11 + n01) AS DOUBLE)
                         + CAST((n01 + n00) * (n10 + n00) AS DOUBLE))
                            / (CAST(n11 + n10 + n01 + n00 AS DOUBLE)
                               * CAST(n11 + n10 + n01 + n00 AS DOUBLE)))
                     / (1.0 - (CAST((n11 + n10) * (n11 + n01) AS DOUBLE)
                               + CAST((n01 + n00) * (n10 + n00) AS DOUBLE))
                                  / (CAST(n11 + n10 + n01 + n00 AS DOUBLE)
                                     * CAST(n11 + n10 + n01 + n00 AS DOUBLE)))
           END AS kappa
    FROM c
    """,
)
def annotator_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two annotators — chance-corrected agreement,
    the QA gate for labeled training data (raw percent agreement lies
    when the label distribution is skewed; kappa doesn't). The two
    annotators are hash-stub raters sharing a latent per-document signal
    plus independent noise (the seam where real rater tables plug in), so
    agreement is genuinely above chance and the statistic is exercised
    away from its degenerate points.

    Exactness: the 2x2 agreement table is integer sums from one scan;
    observed and expected agreement and kappa are fixed-order ratios of
    those four integers; pe == 1 degrades to NULL identically.

    Scale: one scan, a 1-row aggregate, O(1) arithmetic."""
    from datapipeline_ops_spark.functions.hashing import hash64

    latent = hash64(F.col("doc_id"), 43) % 1000
    a1 = F.when(latent + hash64(F.col("doc_id"), 47) % _KAP_NOISE > _KAP_THRESH, 1).otherwise(0)
    a2 = F.when(latent + hash64(F.col("doc_id"), 48) % _KAP_NOISE > _KAP_THRESH, 1).otherwise(0)
    labels = load_table(spark, sf_dir, "documents").select(
        a1.alias("a1"), a2.alias("a2")
    )
    c = labels.agg(
        F.sum(F.col("a1") * F.col("a2")).cast("long").alias("n11"),
        F.sum(F.col("a1") * (1 - F.col("a2"))).cast("long").alias("n10"),
        F.sum((1 - F.col("a1")) * F.col("a2")).cast("long").alias("n01"),
        F.sum((1 - F.col("a1")) * (1 - F.col("a2"))).cast("long").alias("n00"),
    )
    n11, n10, n01, n00 = (F.col(x) for x in ("n11", "n10", "n01", "n00"))
    tot = (n11 + n10 + n01 + n00).cast("double")
    po = (n11 + n00).cast("double") / tot
    pe = (
        ((n11 + n10) * (n11 + n01)).cast("double")
        + ((n01 + n00) * (n10 + n00)).cast("double")
    ) / (tot * tot)
    kappa = F.when(pe != 1.0, (po - pe) / (F.lit(1.0) - pe))
    return c.select(
        "n11", "n10", "n01", "n00", po.alias("po"), pe.alias("pe"), kappa.alias("kappa")
    )
