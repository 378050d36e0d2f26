"""Data-layout optimization: z-order (Morton) clustering keys.

Beyond-reference surface: the reference writes outputs wherever the
pipeline walks (SURVEY.md §2.2 sinks); at 100 TB the WRITE layout decides
every future scan's cost. Z-ordering interleaves the bits of several
quantized columns into one sort key so that a range predicate on ANY of
the interleaved dimensions touches few files — the technique behind
Delta/Iceberg `OPTIMIZE ZORDER BY`, built here from plain expressions.

The gate query quantizes orders to an 8-bit grid on (o_totalprice,
o_custkey), interleaves to a 16-bit Morton code, groups rows into
256-rows-per-file buckets by code prefix, and reports each bucket's
min/max per dimension — the exact metadata a file-skipping reader would
consult. Tight per-bucket ranges (verified value-exact by the oracle) are
the point: both a price filter AND a customer filter prune most buckets.

Scale notes: the Morton code is a per-row projection (16 bit-ops, all
whole-stage codegen); writing z-ordered files is then just
``repartitionByRange(z).sortWithinPartitions(z)`` — one range shuffle,
the same cost as any global sort, paid once at write to save every read.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.tables import load_table

ZBITS = 8  # per-dimension quantization width; 2 dims -> 16-bit Morton code
ZBUCKET_SHIFT = 8  # bucket = z >> 8 -> 256 buckets ("files")


def morton2(x: Column, y: Column, bits: int = ZBITS) -> Column:
    """Interleave two ``bits``-wide non-negative ints: x in even bit
    positions, y in odd. Pure integer expressions (codegen-friendly)."""
    z = F.lit(0)
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def _sql_morton2(x: str, y: str, bits: int = ZBITS) -> str:
    terms = [
        f"((({x} >> {i}) & 1) << {2 * i}) + ((({y} >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


# Degenerate extent (all values identical, hi == lo) quantizes every row to
# 0 in BOTH engines — ANSI Spark would raise DIVIDE_BY_ZERO on the unguarded
# width division (oracle-parity fuzzer, round 10; same class as _bin_expr).
_Q = (
    "least({m} - 1, CAST(CASE WHEN hi_{k} > lo_{k} "
    "THEN floor(({c} - lo_{k}) * ({m} - 0e0) / (hi_{k} - lo_{k})) "
    "ELSE 0 END AS INT))"
)


@query(
    "zorder_layout",
    oracle=f"""
    WITH ext AS (
        SELECT min(o_totalprice) AS lo_p, max(o_totalprice) AS hi_p,
               min(o_custkey)    AS lo_c, max(o_custkey)    AS hi_c
        FROM orders
    ),
    q AS (
        SELECT {_Q.format(c="o_totalprice", k="p", m=2**ZBITS)} AS qp,
               {_Q.format(c="o_custkey", k="c", m=2**ZBITS)} AS qc
        FROM orders, ext
    ),
    z AS (SELECT qp, qc, {_sql_morton2("qp", "qc")} AS zval FROM q)
    SELECT zval >> {ZBUCKET_SHIFT} AS bucket, count(*) AS n_rows,
           min(qp) AS price_lo, max(qp) AS price_hi,
           min(qc) AS cust_lo, max(qc) AS cust_hi
    FROM z GROUP BY bucket
    """,
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout plan for orders on (o_totalprice, o_custkey): 8-bit
    quantization per dimension (min/max scaled), 16-bit Morton interleave,
    bucket = top 8 code bits, and per-bucket min/max of both quantized
    dimensions — the file-skipping statistics a z-ordered write produces.

    The min/max extent is a broadcast one-row aggregate crossed into the
    scan; everything else is per-row integer bit arithmetic + one
    partial-aggregated rollup on the 256 bucket keys."""
    o = load_table(spark, sf_dir, "orders")
    ext = o.agg(
        F.min("o_totalprice").alias("lo_p"),
        F.max("o_totalprice").alias("hi_p"),
        F.min("o_custkey").alias("lo_c"),
        F.max("o_custkey").alias("hi_c"),
    )
    m = 2**ZBITS

    def quant(c: str, k: str) -> Column:
        # hi == lo (degenerate extent) => 0, matching _Q / _bin_expr.
        lo, hi = F.col(f"lo_{k}"), F.col(f"hi_{k}")
        raw = F.when(
            hi > lo, F.floor((F.col(c) - lo) * (m - 0.0) / (hi - lo))
        ).otherwise(F.lit(0))
        return F.least(F.lit(m - 1), raw.cast("int"))

    q = o.crossJoin(F.broadcast(ext)).select(
        quant("o_totalprice", "p").alias("qp"), quant("o_custkey", "c").alias("qc")
    )
    z = q.select("qp", "qc", morton2(F.col("qp"), F.col("qc")).alias("zval"))
    return z.groupBy(
        F.shiftright("zval", ZBUCKET_SHIFT).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("qp").alias("price_lo"),
        F.max("qp").alias("price_hi"),
        F.min("qc").alias("cust_lo"),
        F.max("qc").alias("cust_hi"),
    )


_COMPACT_TARGET = 100_000  # target output-file payload in chars ("bytes")


@query(
    "compaction_plan",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, source, n_chars,
               sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS cum
        FROM documents
    ),
    assigned AS (
        SELECT source, doc_id, n_chars,
               CAST(floor((cum - 1) / {_COMPACT_TARGET}) AS BIGINT) AS file_no
        FROM sized
    )
    SELECT source, file_no, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM assigned GROUP BY source, file_no
    """,
)
def compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner: bin-packs documents into target-size
    output files per source partition (greedy first-fit in doc_id order via
    a running-size cumulative sum), reporting each planned file's doc count,
    payload, and id range — the OPTIMIZE/compact step every lakehouse needs
    once streaming ingest has scattered millions of small files.

    Contiguous packing (cumsum // target) rather than true bin-packing is
    deliberate: it preserves doc_id clustering within output files (range
    scans stay file-local) and needs only ONE window pass — a single
    exchange on source — where optimal packing is a sequential dependency.
    The plan itself is metadata (|files| rows); executing it is one
    repartition by (source, file_no) write."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    assigned = d.select(
        "source",
        "doc_id",
        "n_chars",
        F.floor((F.sum("n_chars").over(w) - 1) / F.lit(_COMPACT_TARGET)).alias("file_no"),
    )
    return assigned.groupBy("source", "file_no").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# ---------------------------------------------------------------------------
# Hilbert curve vs Z-order: which layout keeps files spatially tighter?
# ---------------------------------------------------------------------------


def with_hilbert(
    df: DataFrame, xcol: str, ycol: str, out: str = "hval", bits: int = ZBITS
) -> DataFrame:
    """Append the Hilbert-curve index of (xcol, ycol) — both in [0, 2^bits)
    — as ``out``. The classic xy2d walk (one reflect+swap rotation per bit,
    MSB first; the n-1 reflection keeps every intermediate in [0, n)) is
    unrolled into ``bits`` chained SELECTs so each stage materializes real
    columns: a single nested expression would duplicate x and y per branch
    and grow the Catalyst tree 4^bits large. All stages are integer bit
    ops inside whole-stage codegen. Mirrored column-for-column by
    :func:`_sql_hilbert_ctes`; variant pinned by tests/test_hilbert.py
    against a scalar reference."""
    n = 1 << bits
    df = df.withColumn("_hx", F.col(xcol)).withColumn("_hy", F.col(ycol)).withColumn(
        out, F.lit(0)
    )
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = F.shiftright(F.col("_hx"), i).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col("_hy"), i).bitwiseAND(F.lit(1))
        nd = F.col(out) + F.lit(s * s) * (rx * 3).bitwiseXOR(ry)
        nx = F.when(
            ry == 0, F.when(rx == 1, F.lit(n - 1) - F.col("_hy")).otherwise(F.col("_hy"))
        ).otherwise(F.col("_hx"))
        ny = F.when(
            ry == 0, F.when(rx == 1, F.lit(n - 1) - F.col("_hx")).otherwise(F.col("_hx"))
        ).otherwise(F.col("_hy"))
        keep = [c for c in df.columns if c not in ("_hx", "_hy", out)]
        df = df.select(*keep, nx.alias("_hx"), ny.alias("_hy"), nd.alias(out))
    return df.drop("_hx", "_hy")


def _sql_hilbert_ctes(src: str, bits: int = ZBITS, passthrough: str = "qp, qc, zval") -> tuple[str, str]:
    """(cte_sql, final_name): DuckDB CTE chain computing the identical
    Hilbert walk as :func:`with_hilbert` from ``src`` (must expose x, y
    plus the passthrough columns)."""
    n = 1 << bits
    ctes = []
    prev = src
    for idx, i in enumerate(range(bits - 1, -1, -1)):
        s = 1 << i
        name = f"hil{idx}"
        mat = " MATERIALIZED" if idx == bits - 1 else ""
        ctes.append(
            f"""{name} AS{mat} (
        SELECT {passthrough},
               CASE WHEN ((y >> {i}) & 1) = 0
                    THEN CASE WHEN ((x >> {i}) & 1) = 1 THEN {n - 1} - y ELSE y END
                    ELSE x END AS x,
               CASE WHEN ((y >> {i}) & 1) = 0
                    THEN CASE WHEN ((x >> {i}) & 1) = 1 THEN {n - 1} - x ELSE x END
                    ELSE y END AS y,
               d + {s * s} * xor(((x >> {i}) & 1) * 3, (y >> {i}) & 1) AS d
        FROM {prev}
    )"""
        )
        prev = name
    return ",\n    ".join(ctes), prev


_HIL_CTES, _HIL_LAST = _sql_hilbert_ctes("q0")

# "file" = a run of _HVZ_SEG consecutive curve positions. Deliberately NOT a
# power of two: 2^k-ALIGNED prefix buckets of the two curves are provably the
# same quadrants (both curves are quadrant-recursive), so prefix bucketing
# shows zero difference — but real z-ordered writes cut equal-ROW-COUNT files
# whose boundaries don't align, and there Hilbert's no-jump property wins
# (measured on the dense 256x256 grid: max bbox area 528 vs Morton's 6144).
_HVZ_SEG = 300


@query(
    "hilbert_vs_zorder_locality",
    oracle=f"""
    WITH ext AS (
        SELECT min(o_totalprice) AS lo_p, max(o_totalprice) AS hi_p,
               min(o_custkey)    AS lo_c, max(o_custkey)    AS hi_c
        FROM orders
    ),
    q AS MATERIALIZED (
        SELECT qp, qc, {_sql_morton2("qp", "qc")} AS zval FROM (
            SELECT {_Q.format(c="o_totalprice", k="p", m=2**ZBITS)} AS qp,
                   {_Q.format(c="o_custkey", k="c", m=2**ZBITS)} AS qc
            FROM orders, ext
        )
    ),
    q0 AS (SELECT qp, qc, zval, qp AS x, qc AS y, 0 AS d FROM q),
    {_HIL_CTES},
    curves AS (
        SELECT 'zorder' AS curve, zval // {_HVZ_SEG} AS bucket, qp, qc
        FROM {_HIL_LAST}
        UNION ALL
        SELECT 'hilbert', d // {_HVZ_SEG}, qp, qc FROM {_HIL_LAST}
    ),
    per_bucket AS (
        SELECT curve, bucket,
               (max(qp) - min(qp) + 1) * (max(qc) - min(qc) + 1) AS area
        FROM curves GROUP BY 1, 2
    )
    SELECT curve,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(area) AS BIGINT) AS sum_area,
           CAST(max(area) AS BIGINT) AS max_area,
           CAST(sum(area) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_area
    FROM per_bucket GROUP BY curve
    """,
)
def hilbert_vs_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-to-head locality comparison of the two classic multi-dimensional
    layout curves on orders (o_totalprice, o_custkey): quantize to the
    {2**ZBITS}-cell grid, assign each row its Morton (Z) code AND its
    Hilbert code, cut both codespaces into equal-length 'files' of
    {_HVZ_SEG} curve positions (non-aligned on purpose — see _HVZ_SEG:
    2^k-aligned prefix buckets of the two curves are provably identical
    quadrants, so only the equal-row-count file model real writes use can
    tell them apart), and report each curve's per-file bounding-box area
    (the min/max metadata a reader consults). Smaller areas = tighter
    files = more files pruned by a 2-D predicate; Hilbert's no-jump
    property wins the max-area tail by >10x here — this query turns that
    folklore into a measured, value-gated number on real data.

    Scale: ONE fact scan computes both codes (the Hilbert walk is
    {ZBITS} chained integer-only projections, all codegen); the code pair
    is then stacked (map-side 2x of two small ints, not a re-scan) and
    everything downstream aggregates 512 (curve, bucket) groups."""
    o = load_table(spark, sf_dir, "orders")
    ext = o.agg(
        F.min("o_totalprice").alias("lo_p"),
        F.max("o_totalprice").alias("hi_p"),
        F.min("o_custkey").alias("lo_c"),
        F.max("o_custkey").alias("hi_c"),
    )
    m = 2**ZBITS

    def quant(c: str, k: str) -> Column:
        # hi == lo (degenerate extent) => 0, matching _Q / _bin_expr.
        lo, hi = F.col(f"lo_{k}"), F.col(f"hi_{k}")
        raw = F.when(
            hi > lo, F.floor((F.col(c) - lo) * (m - 0.0) / (hi - lo))
        ).otherwise(F.lit(0))
        return F.least(F.lit(m - 1), raw.cast("int"))

    q = o.crossJoin(F.broadcast(ext)).select(
        quant("o_totalprice", "p").alias("qp"), quant("o_custkey", "c").alias("qc")
    )
    q = q.withColumn("zval", morton2(F.col("qp"), F.col("qc")))
    q = with_hilbert(q, "qp", "qc", out="hval")
    curves = q.select(
        "qp",
        "qc",
        F.expr(
            f"stack(2, 'zorder', zval div {_HVZ_SEG}, "
            f"'hilbert', hval div {_HVZ_SEG}) AS (curve, bucket)"
        ),
    )
    per_bucket = curves.groupBy("curve", "bucket").agg(
        (
            (F.max("qp") - F.min("qp") + 1) * (F.max("qc") - F.min("qc") + 1)
        ).alias("area")
    )
    return per_bucket.groupBy("curve").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("area").cast("long").alias("sum_area"),
        F.max("area").cast("long").alias("max_area"),
        (F.sum("area").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avg_area"
        ),
    )
