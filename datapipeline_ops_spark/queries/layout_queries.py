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


# ---------------------------------------------------------------------------
# webdataset_shard_plan — training-shard assignment + interleave quality
# ---------------------------------------------------------------------------

WDS_SHARDS = 8
WDS_ORDER_SEED = 7


def _wds_oracle() -> str:
    from datapipeline_ops_spark.functions.hashing import sql_hash64

    sh = f"{sql_hash64('doc_id')} % {WDS_SHARDS}"
    ok = sql_hash64("doc_id", seed=WDS_ORDER_SEED)
    return f"""
    WITH d AS (
        SELECT doc_id, source, n_chars,
               {sh} AS shard_id, {ok} AS ok
        FROM documents
    ),
    r AS (
        SELECT shard_id, source, ok, doc_id,
               CASE WHEN lag(source) OVER w IS NULL
                         OR lag(source) OVER w <> source
                    THEN 1 ELSE 0 END AS nr
        FROM d
        WINDOW w AS (PARTITION BY shard_id ORDER BY ok, doc_id)
    ),
    r2 AS (
        SELECT shard_id,
               sum(nr) OVER (PARTITION BY shard_id ORDER BY ok, doc_id
                             ROWS UNBOUNDED PRECEDING) AS run_id
        FROM r
    ),
    runs AS (SELECT shard_id, run_id, count(*) AS rl FROM r2 GROUP BY 1, 2),
    mx AS (SELECT shard_id, CAST(max(rl) AS BIGINT) AS max_source_run
           FROM runs GROUP BY shard_id),
    tot AS (
        SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               CAST(count(DISTINCT source) AS BIGINT) AS n_sources
        FROM d GROUP BY shard_id
    ),
    sc AS (SELECT shard_id, source, count(*) AS c FROM d GROUP BY 1, 2),
    ent AS (
        SELECT sc.shard_id,
               round(-sum((c * 1e0 / t.n_docs) * ln(c * 1e0 / t.n_docs)), 6)
                   + 0e0 AS source_entropy
        FROM sc JOIN tot t USING (shard_id) GROUP BY sc.shard_id
    )
    SELECT t.shard_id, t.n_docs, t.total_chars, t.n_sources,
           e.source_entropy, m.max_source_run
    FROM tot t JOIN ent e USING (shard_id) JOIN mx m USING (shard_id)
    """


@query("webdataset_shard_plan", oracle=_wds_oracle())
def webdataset_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard layout plan (the WebDataset/TFRecord packing step):
    every document is hash-assigned to one of {WDS_SHARDS} shards and given
    a deterministic within-shard shuffle position (seeded second hash) —
    exactly how a 100 TB corpus becomes tar/record shards a dataloader
    streams sequentially. Per shard the plan reports size (docs, chars),
    source diversity (distinct sources, Shannon entropy of the source mix)
    and the WORST same-source run length in read order — the number that
    decides whether a sequential reader sees interleaved data or a
    correlated block (long runs starve the trainer's effective shuffle
    buffer and bias gradient batches).

    Scale shape: assignment and order keys are per-row hash projections;
    one exchange on shard_id feeds BOTH the run-length window (lag + running
    sum over the same (shard, order) sort) and the per-shard rollups; the
    source-mix entropy reduces per (shard, source) with map-side combine.
    Shards scale with corpus size, never with executor count, so the plan
    is identical on 1 or 1000 executors."""
    from datapipeline_ops_spark.functions.hashing import hash64

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "n_chars",
        F.pmod(hash64(F.col("doc_id")), F.lit(WDS_SHARDS)).alias("shard_id"),
        hash64(F.col("doc_id"), seed=WDS_ORDER_SEED).alias("ok"),
    )
    w = Window.partitionBy("shard_id").orderBy("ok", "doc_id")
    prev = F.lag("source").over(w)
    r = d.select(
        "shard_id",
        "source",
        "n_chars",
        F.when(prev.isNull() | (prev != F.col("source")), 1).otherwise(0).alias("nr"),
        "ok",
        "doc_id",
    ).select(
        "shard_id",
        "source",
        "n_chars",
        F.sum("nr").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("run_id"),
    )
    mx = (
        r.groupBy("shard_id", "run_id")
        .agg(F.count(F.lit(1)).alias("rl"))
        .groupBy("shard_id")
        .agg(F.max("rl").cast("long").alias("max_source_run"))
    )
    tot = r.groupBy("shard_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.count_distinct("source").alias("n_sources"),
    )
    sc = r.groupBy("shard_id", "source").agg(F.count(F.lit(1)).alias("c"))
    p = F.col("c") * 1.0 / F.col("n_docs")
    ent = (
        sc.join(tot.select("shard_id", "n_docs"), "shard_id")
        .groupBy("shard_id")
        # + 0.0 normalizes IEEE -0.0 (single-source shard: -sum of zeros)
        # to +0.0 on both engines
        .agg((F.round(-F.sum(p * F.log(p)), 6) + F.lit(0.0)).alias("source_entropy"))
    )
    return tot.join(ent, "shard_id").join(mx, "shard_id").select(
        "shard_id", "n_docs", "total_chars", "n_sources",
        "source_entropy", "max_source_run",
    )


# ---------------------------------------------------------------------------
# padding_waste_report — length-bucketed batching waste (GPU-utilization
# counterpart of sequence_packing: pad-to-bucket instead of pack-to-window)
# ---------------------------------------------------------------------------

PW_BUCKETS = [2 ** i for i in range(0, 17)]  # 1 .. 65536 token ceilings


def _pw_bucket_sql(n: str) -> str:
    cases = " ".join(f"WHEN {n} <= {b} THEN {b}" for b in PW_BUCKETS)
    return f"CASE {cases} ELSE NULL END"


def _pw_oracle() -> str:
    return f"""
    WITH d AS (
        SELECT len(regexp_split_to_array(text, '\\s+')) AS n_tokens
        FROM documents
    ),
    b AS (SELECT n_tokens, {_pw_bucket_sql("n_tokens")} AS bucket FROM d)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS real_tokens,
           CAST(count(*) * bucket AS BIGINT) AS padded_tokens,
           CAST(count(*) * bucket - sum(n_tokens) AS BIGINT) AS waste_tokens,
           round((count(*) * bucket - sum(n_tokens)) * 1e0
                 / (count(*) * bucket), 6) AS waste_share
    FROM b GROUP BY bucket
    """


@query("padding_waste_report", oracle=_pw_oracle())
def padding_waste_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching waste: every document pads up to the
    smallest power-of-two token ceiling (the dynamic-batching scheme most
    trainers/servers use), and per bucket the report totals real vs padded
    tokens and the waste share — the direct GPU-utilization number that
    tells an operator whether to add bucket boundaries or switch to packed
    sequences (`sequence_packing` is the pack-to-window alternative; this
    query prices the pad-to-bucket status quo).

    Scale shape: the bucket ceiling is a constant CASE chain over 17
    power-of-two literals — pure whole-stage-codegen projection, no join,
    no spine — followed by one map-side-combined rollup on a <=17-key
    group. Token counts beyond 2^16 fall into a NULL bucket row rather
    than silently clamping (both engines agree on the grouping)."""
    from datapipeline_ops_spark.functions.text import tokens

    n = F.size(tokens(F.col("text"))).cast("long")
    expr = F.lit(None).cast("long")
    for b in reversed(PW_BUCKETS):
        expr = F.when(F.col("n_tokens") <= b, F.lit(b).cast("long")).otherwise(expr)
    d = (
        load_table(spark, sf_dir, "documents")
        .select(n.alias("n_tokens"))
        .select("n_tokens", expr.alias("bucket"))
    )
    return d.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("real_tokens"),
        (F.count(F.lit(1)) * F.max("bucket")).cast("long").alias("padded_tokens"),
        (F.count(F.lit(1)) * F.max("bucket") - F.sum("n_tokens"))
        .cast("long")
        .alias("waste_tokens"),
        F.round(
            (F.count(F.lit(1)) * F.max("bucket") - F.sum("n_tokens")) * 1.0
            / (F.count(F.lit(1)) * F.max("bucket")),
            6,
        ).alias("waste_share"),
    )
