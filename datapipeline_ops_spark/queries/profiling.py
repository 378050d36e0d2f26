"""Dataset profiling queries: per-column statistics and corpus vocabulary.

Beyond-reference surface: the reference pipelines log ad-hoc dict stats per
stage (e.g. ``pipeline/video_extract_frame.py`` prints counts); a 100 TB
ingest needs a real profiling pass — the report that drives schema checks,
null-rate alerts and tokenizer vocabulary decisions — expressed as ONE scan,
not a loop of per-column jobs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.functions.text import sql_tokens, tokens
from datapipeline_ops_spark.tables import load_table

# (column, render kind) for the orders profile; "price" renders %.2f so the
# float min/max strings are byte-identical across engines.
_PROFILE_COLS = [
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_orderstatus", "str"),
    ("o_orderpriority", "str"),
    ("o_orderdate", "ts"),
    ("o_totalprice", "price"),
]


def _render(kind: str, col: F.Column) -> F.Column:
    if kind == "ts":
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    if kind == "price":
        return F.format_string("%.2f", col)
    return col.cast("string")


def _sql_render(kind: str, expr: str) -> str:
    if kind == "ts":
        return f"strftime({expr}, '%Y-%m-%d %H:%M:%S')"
    if kind == "price":
        return f"printf('%.2f', {expr})"
    return f"CAST({expr} AS VARCHAR)"


_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name,
           count(*) - count({c}) AS n_null,
           count(DISTINCT {c}) AS n_distinct,
           {_sql_render(k, f"min({c})")} AS min_value,
           {_sql_render(k, f"max({c})")} AS max_value
    FROM orders"""
    for c, k in _PROFILE_COLS
)


@query("table_profile", oracle=_PROFILE_ORACLE)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass table profile: per column, null count, exact distinct
    count, and rendered min/max — the ingest-validation report. All columns
    profile in ONE aggregation job (Spark plans the multi-distinct via one
    Expand, cost ~n_cols x rows map-side, vs n_cols separate scans for the
    loop formulation); the 1-row aggregate then unpivots to one row per
    column with an explode of literal structs. At 100 TB swap
    ``count_distinct`` for ``approx_count_distinct`` — the plan shape is
    unchanged."""
    o = load_table(spark, sf_dir, "orders")
    aggs = []
    for c, _ in _PROFILE_COLS:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nn"),
            F.count_distinct(F.col(c)).alias(f"{c}__nd"),
            F.min(c).alias(f"{c}__mn"),
            F.max(c).alias(f"{c}__mx"),
        ]
    row = o.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"{c}__nn").alias("n_null"),
            F.col(f"{c}__nd").alias("n_distinct"),
            _render(k, F.col(f"{c}__mn")).alias("min_value"),
            _render(k, F.col(f"{c}__mx")).alias("max_value"),
        )
        for c, k in _PROFILE_COLS
    ]
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


VOCAB_MIN_COUNT = 5
VOCAB_TOP_K = 100


@query(
    "vocab_top_tokens",
    oracle=f"""
    SELECT token, n FROM (
        SELECT t.token AS token, count(*) AS n
        FROM (SELECT unnest({sql_tokens("text")}) AS token FROM documents) t
        GROUP BY t.token
    ) WHERE n >= {VOCAB_MIN_COUNT}
    ORDER BY n DESC, token LIMIT {VOCAB_TOP_K}
    """,
)
def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary builder: corpus-wide token frequencies, floor-filtered and
    truncated to the top-K — the first step of any tokenizer build. Explode
    + partial-aggregated count (the shuffle carries per-partition partial
    counts, not tokens), then a global top-K with a total (n DESC, token)
    order so the truncation boundary is deterministic in both engines.
    At 100 TB the top-K is a TakeOrdered merge, never a full sort."""
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= VOCAB_MIN_COUNT)
    )
    return counts.orderBy(F.desc("n"), F.asc("token")).limit(VOCAB_TOP_K)


@query(
    "benford_price_check",
    oracle="""
    WITH d AS (
        SELECT CAST(substr(printf('%.0f', floor(o_totalprice)), 1, 1) AS INT) AS digit
        FROM orders WHERE o_totalprice >= 1
    )
    SELECT digit, count(*) AS n,
           round(count(*) * 1e0 / (SELECT count(*) FROM d), 6) AS share,
           round(log10(1e0 + 1e0 / digit), 6) AS benford_expected
    FROM d GROUP BY digit
    """,
)
def benford_price_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit on order totals: observed leading-
    digit shares next to the Benford expectation log10(1 + 1/d) — the
    classic fraud / synthetic-data smell test a profiling pass runs on
    monetary columns (TPC-H's uniform prices deliberately FAIL it, which
    is exactly what the report shows).

    Per-row digit extraction + a 9-key rollup: one partial-aggregated
    shuffle of 9 rows; the total-count denominator is a broadcast scalar."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        # floor() yields LONG — format via a plain string cast (Java's %.0f
        # throws IllegalFormatConversionException on integral types)
        F.substring(F.floor("o_totalprice").cast("string"), 1, 1)
        .cast("int")
        .alias("digit")
    ).persist()
    try:
        total = d.count()
        out = d.groupBy("digit").agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.count(F.lit(1)) * 1.0 / total, 6).alias("share"),
            F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias("benford_expected"),
        )
        out = out.localCheckpoint(eager=True)
    finally:
        d.unpersist()
    return out


@query(
    "expectations_report",
    oracle="""
    WITH stats AS (
        SELECT count(*) AS n,
               sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS null_price,
               sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS nonpos_price,
               count(DISTINCT o_orderkey) AS distinct_keys,
               sum(CASE WHEN o_orderdate < DATE '1995-01-01'
                         OR o_orderdate > DATE '2001-12-31' THEN 1 ELSE 0 END)
                   AS date_out_of_range,
               sum(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P') THEN 1 ELSE 0 END)
                   AS bad_status
        FROM orders
    )
    SELECT u.name AS expectation, u.violations,
           u.violations = 0 AS passed
    FROM stats, LATERAL (
        SELECT * FROM (VALUES
            ('price_not_null', CAST(null_price AS BIGINT)),
            ('price_positive', CAST(nonpos_price AS BIGINT)),
            ('orderkey_unique', CAST(n - distinct_keys AS BIGINT)),
            ('orderdate_in_range', CAST(date_out_of_range AS BIGINT)),
            ('status_in_domain', CAST(bad_status AS BIGINT))
        ) AS v(name, violations)
    ) u
    """,
)
def expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract expectation suite (the deequ/Great-Expectations shape):
    declarative constraints — completeness (no null prices), validity
    (positive amounts, status in domain, dates in the catalog's 1995-2001 business range), and
    uniqueness of the primary key — evaluated in ONE scan as conditional
    aggregates and reported as (expectation, violations, passed) rows. A
    failed row is the admission gate between ingest and the training mix.

    All checks share a single pass: each constraint is a conditional sum,
    the uniqueness check rides the same aggregate via count distinct, and
    the report is a constant-size unpivot of the one stats row."""
    o = load_table(spark, sf_dir, "orders")
    stats = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0)).alias("null_price"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("nonpos_price"),
        F.count_distinct("o_orderkey").alias("distinct_keys"),
        F.sum(
            F.when(
                (F.col("o_orderdate") < F.lit("1995-01-01").cast("date"))
                | (F.col("o_orderdate") > F.lit("2001-12-31").cast("date")),
                1,
            ).otherwise(0)
        ).alias("date_out_of_range"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("F", "O", "P"), 1).otherwise(0)
        ).alias("bad_status"),
    )
    checks = stats.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("price_not_null").alias("expectation"),
                    F.col("null_price").cast("long").alias("violations"),
                ),
                F.struct(
                    F.lit("price_positive").alias("expectation"),
                    F.col("nonpos_price").cast("long").alias("violations"),
                ),
                F.struct(
                    F.lit("orderkey_unique").alias("expectation"),
                    (F.col("n") - F.col("distinct_keys")).cast("long").alias("violations"),
                ),
                F.struct(
                    F.lit("orderdate_in_range").alias("expectation"),
                    F.col("date_out_of_range").cast("long").alias("violations"),
                ),
                F.struct(
                    F.lit("status_in_domain").alias("expectation"),
                    F.col("bad_status").cast("long").alias("violations"),
                ),
            )
        ).alias("c")
    )
    return checks.select(
        "c.expectation", "c.violations", (F.col("c.violations") == 0).alias("passed")
    )


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


# Integer unit scale per column under the data contract (integer
# quantities, 2-dp money, whole-percent discount/tax): moments over these
# units are EXACT (HUGEINT / DECIMAL(38,0) sums), so the zero-variance test
# is exact, Cauchy-Schwarz guarantees a non-negative variance term, and the
# final double arithmetic runs on identical integers in both engines —
# correlation is scale-invariant so the units cancel.
_CORR_SCALE = {"l_quantity": 1, "l_extendedprice": 100, "l_discount": 100, "l_tax": 100}


def _corr_oracle() -> str:
    units = ", ".join(
        f"CAST(round({c} * {s}) AS HUGEINT) AS u_{c}" for c, s in _CORR_SCALE.items()
    )
    sums = ["count(*) AS n"]
    for c in _CORR_COLS:
        sums.append(f"sum(u_{c}) AS s_{c}")
        sums.append(f"sum(u_{c} * u_{c}) AS ss_{c}")
    pairs = [
        (x, y)
        for i, x in enumerate(_CORR_COLS)
        for y in _CORR_COLS[i + 1 :]
    ]
    for x, y in pairs:
        sums.append(f"sum(u_{x} * u_{y}) AS sp_{x}_{y}")
    selects = []
    for x, y in pairs:
        corr = (
            f"CASE WHEN n * ss_{x} = s_{x} * s_{x} OR n * ss_{y} = s_{y} * s_{y} "
            f"THEN NULL ELSE "
            f"CAST(n * sp_{x}_{y} - s_{x} * s_{y} AS DOUBLE) / "
            f"(sqrt(CAST(n * ss_{x} - s_{x} * s_{x} AS DOUBLE)) * "
            f"sqrt(CAST(n * ss_{y} - s_{y} * s_{y} AS DOUBLE))) END"
        )
        selects.append(
            f"SELECT '{x}' AS col_x, '{y}' AS col_y, CAST(n AS BIGINT) AS n, "
            f"{corr} AS corr FROM agg"
        )
    return (
        f"WITH units AS (SELECT {units} FROM lineitem),\n"
        "    agg AS (SELECT " + ", ".join(sums) + " FROM units)\n    "
        + "\n    UNION ALL ".join(selects)
    )


@query("column_correlation_matrix", oracle=_corr_oracle())
def column_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation over the numeric lineitem columns in ONE
    scan: a single aggregation computes every sum / sum-of-squares /
    cross-product moment (4 + 4 + 6 aggregates), then each pair's
    correlation is assembled from the one-row moment table — no per-pair
    jobs, no second pass, and the identical closed-form arithmetic runs in
    the oracle so values match to float-hash precision.  At 100 TB this is
    the schema-drift guard ("did discount stop tracking price?") priced at
    one partial-aggregated scan."""
    li = load_table(spark, sf_dir, "lineitem")
    units = li.select(
        *[
            F.round(F.col(c) * F.lit(s)).cast("long").alias(f"u_{c}")
            for c, s in _CORR_SCALE.items()
        ]
    )
    dec = "decimal(38,0)"
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in _CORR_COLS:
        u = F.col(f"u_{c}")
        aggs.append(F.sum(u.cast(dec)).alias(f"s_{c}"))
        aggs.append(F.sum((u * u).cast(dec)).alias(f"ss_{c}"))
    pairs = [
        (x, y)
        for i, x in enumerate(_CORR_COLS)
        for y in _CORR_COLS[i + 1 :]
    ]
    for x, y in pairs:
        aggs.append(
            F.sum((F.col(f"u_{x}") * F.col(f"u_{y}")).cast(dec)).alias(f"sp_{x}_{y}")
        )
    m = units.agg(*aggs)
    ndec = F.col("n").cast(dec)
    rows = []
    var = {
        c: ndec * F.col(f"ss_{c}") - F.col(f"s_{c}") * F.col(f"s_{c}")
        for c in _CORR_COLS
    }
    for x, y in pairs:
        num = ndec * F.col(f"sp_{x}_{y}") - F.col(f"s_{x}") * F.col(f"s_{y}")
        corr = F.when(
            (var[x] > 0) & (var[y] > 0),
            num.cast("double")
            / (F.sqrt(var[x].cast("double")) * F.sqrt(var[y].cast("double"))),
        )
        rows.append(
            F.struct(
                F.lit(x).alias("col_x"),
                F.lit(y).alias("col_y"),
                F.col("n").cast("long").alias("n"),
                corr.alias("corr"),
            )
        )
    return m.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.col_x", "r.col_y", "r.n", "r.corr"
    )


@query(
    "gini_by_source",
    oracle="""
    WITH lens AS (
        SELECT source, doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS x
        FROM documents
    ),
    ranked AS (
        SELECT source, x,
               row_number() OVER (PARTITION BY source ORDER BY x, doc_id) AS i,
               count(*) OVER (PARTITION BY source) AS n,
               sum(x) OVER (PARTITION BY source) AS sx
        FROM lens
    )
    SELECT source,
           CAST(any_value(n) AS BIGINT) AS n_docs,
           CAST(any_value(sx) AS BIGINT) AS total_words,
           2.0 * CAST(sum(i * x) AS DOUBLE)
               / (CAST(any_value(n) AS DOUBLE) * CAST(any_value(sx) AS DOUBLE))
               - (CAST(any_value(n) AS DOUBLE) + 1.0) / CAST(any_value(n) AS DOUBLE)
               AS gini
    FROM ranked GROUP BY source
    """,
)
def gini_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of document length per source — the inequality
    profile that flags a source mixing boilerplate stubs with huge pages
    (high Gini) vs uniform contributions (near 0).  Computed by the exact
    rank formula G = 2*sum(i*x_i)/(n*sum x) - (n+1)/n over lengths sorted
    ascending with doc_id tie-break, so both engines rank identically and
    the value is deterministic.  The rank window partitions by source —
    parallel across sources, and per-source state is just the sort (the
    same shape as any per-key ranking at scale)."""
    d = load_table(spark, sf_dir, "documents")
    lens = d.select(
        "source",
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("x"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("x", "doc_id")
    ws = Window.partitionBy("source")
    ranked = lens.select(
        "source",
        "x",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(ws).alias("n"),
        F.sum("x").over(ws).alias("sx"),
    )
    nd = F.any_value("n").cast("double")
    sxd = F.any_value("sx").cast("double")
    return ranked.groupBy("source").agg(
        F.any_value("n").cast("long").alias("n_docs"),
        F.any_value("sx").cast("long").alias("total_words"),
        (2.0 * F.sum(F.col("i") * F.col("x")).cast("double") / (nd * sxd)
         - (nd + 1.0) / nd).alias("gini"),
    )


# ---------------------------------------------------------------------------
# join_skew_diagnosis
# ---------------------------------------------------------------------------

_SKEW_TOP = 20


@query(
    "join_skew_diagnosis",
    oracle=f"""
    WITH freq AS MATERIALIZED (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS f
        FROM lineitem GROUP BY l_partkey
    ),
    tot AS (
        SELECT CAST(sum(f * f) AS BIGINT) AS join_size,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(f) AS BIGINT) AS n_rows
        FROM freq
    )
    SELECT l_partkey, f,
           CAST(f * f AS BIGINT) AS pair_contrib,
           CAST(f * f AS DOUBLE) / CAST(t.join_size AS DOUBLE) AS contrib_share,
           CAST((f * t.n_keys + t.n_rows - 1) // t.n_rows AS BIGINT)
               AS recommended_salt
    FROM freq CROSS JOIN tot t
    ORDER BY f DESC, l_partkey LIMIT {_SKEW_TOP}
    """,
)
def join_skew_diagnosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-skew pre-flight: per join key (l_partkey), its frequency, its
    contribution f² to the self-join size (the quantity AQE's skew-join
    split and our salted_skew_join exist to tame), its share of the total,
    and a recommended salt factor ceil(f / mean_f) — the number a pipeline
    author plugs into the salting operator BEFORE launching the 100 TB
    join instead of discovering the straggler at hour three.

    Exactness: everything derives from integer frequencies — f², the
    Σf² join size, and the salt factor via integer ceiling division
    (f·n_keys + n_rows - 1) // n_rows; the share is one int/int division.

    Scale: one partial-agg frequency pass, a 1-row total broadcast, and a
    TakeOrdered top-{_SKEW_TOP}; the diagnosis never materializes the
    join it predicts."""
    freq = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    tot = freq.agg(
        F.sum(F.col("f") * F.col("f")).cast("long").alias("join_size"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("f").cast("long").alias("n_rows"),
    )
    return (
        freq.crossJoin(F.broadcast(tot))
        .select(
            "l_partkey",
            "f",
            (F.col("f") * F.col("f")).cast("long").alias("pair_contrib"),
            (
                (F.col("f") * F.col("f")).cast("double")
                / F.col("join_size").cast("double")
            ).alias("contrib_share"),
            F.floor(
                (F.col("f") * F.col("n_keys") + F.col("n_rows") - 1) / F.col("n_rows")
            )
            .cast("long")
            .alias("recommended_salt"),
        )
        .orderBy(F.desc("f"), F.asc("l_partkey"))
        .limit(_SKEW_TOP)
    )
