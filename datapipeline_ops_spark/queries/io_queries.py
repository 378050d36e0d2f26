"""Source/sink round-trip queries: the correctness gate drives the CSV and
JSONL readers/writers end-to-end (write a table out through the sink, read
it back through the source, aggregate), and the JSONL record builder
reproduces the reference's output-record shape byte-for-byte.

Round-trips write under the repo-local ``.tmp/`` scratch dir with
``mode=overwrite`` — reruns are idempotent, and the oracle (which queries
the original parquet) proves the sink+source pair is lossless including
nulls, quotes and floats.
"""

from __future__ import annotations

import os
import re

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.sources.io import read_csv, read_jsonl, write_csv, write_jsonl
from datapipeline_ops_spark.tables import load_table, local_frame

_SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".tmp", "io"
)


def _scratch(sf_dir: str, name: str) -> str:
    tag = sf_dir.strip("/").replace("/", "_")
    return os.path.join(_SCRATCH, tag, name)


@query(
    "csv_roundtrip",
    oracle="""
    SELECT n_regionkey, count(*) AS n_nations,
           min(n_name) AS first_name
    FROM nation GROUP BY n_regionkey
    """,
)
def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation → header-CSV sink → explicit-schema CSV source → aggregate.
    Proves the sink/source pair is lossless; the oracle reads the original
    parquet, so any quoting/encoding drift would hash-mismatch."""
    nation = load_table(spark, sf_dir, "nation")
    path = _scratch(sf_dir, "nation_csv")
    write_csv(nation, path)
    back = read_csv(spark, path, nation.schema)
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"), F.min("n_name").alias("first_name")
    )


@query(
    "jsonl_roundtrip",
    oracle="""
    SELECT p_brand, count(*) AS n_parts,
           CAST(sum(p_size) AS BIGINT) AS total_size,
           round(sum(CAST(round(p_retailprice*100) AS BIGINT)) / 100.0, 4)
               AS total_price
    FROM part GROUP BY p_brand
    """,
)
def jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part → JSONL sink (directory of parts — the race-free replacement for
    the reference's concurrent single-file appends) → schema'd JSONL source
    → aggregate, checked against the original parquet."""
    part = load_table(spark, sf_dir, "part")
    path = _scratch(sf_dir, "part_jsonl")
    write_jsonl(part, path)
    back = read_jsonl(spark, path, part.schema)
    return back.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("p_size").cast("long").alias("total_size"),
        F.round(
            F.sum(F.round(F.col("p_retailprice") * 100, 0).cast("long")) / 100.0,
            4,
        ).alias("total_price"),
    )


@query(
    "orc_roundtrip",
    oracle="""
    SELECT s_nationkey, count(*) AS n_suppliers,
           round(sum(CAST(round(s_acctbal*100) AS BIGINT)) / 100.0, 4)
               AS total_acctbal
    FROM supplier GROUP BY s_nationkey
    """,
)
def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier → ORC sink → explicit-schema ORC source → aggregate. ORC is
    the third columnar interchange format next to parquet and CSV/JSONL;
    the oracle reads the original parquet, so the hash match proves the
    sink/source pair is lossless (types, nulls, doubles)."""
    sup = load_table(spark, sf_dir, "supplier")
    path = _scratch(sf_dir, "supplier_orc")
    sup.write.mode("overwrite").orc(path)
    back = spark.read.schema(sup.schema).orc(path)
    return back.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.round(
            F.sum(F.round(F.col("s_acctbal") * 100, 0).cast("long")) / 100.0, 4
        ).alias("total_acctbal"),
    )


@query(
    "jsonl_records",
    oracle="""
    SELECT doc_id,
           to_json(struct_pack(
               task_type := 'subject_driven',
               instruction := substr(text, 1, 40),
               input_images := [source || '/' || CAST(doc_id AS VARCHAR) || '_ref.jpg'],
               output_image := source || '/' || CAST(doc_id AS VARCHAR) || '_gt.jpg'
           )) AS record
    FROM documents
    """,
)
def jsonl_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's output-record shape (``save_output_op.py:18-26``:
    {"task_type","instruction","input_images",[...],"output_image"}) built
    as ``to_json(struct(...))`` — byte-identical JSON across engines (same
    field order, compact separators, same string escaping)."""
    d = load_table(spark, sf_dir, "documents")
    rec = F.to_json(
        F.struct(
            F.lit("subject_driven").alias("task_type"),
            F.substring("text", 1, 40).alias("instruction"),
            F.array(
                F.concat_ws("", F.col("source"), F.lit("/"), F.col("doc_id"), F.lit("_ref.jpg"))
            ).alias("input_images"),
            F.concat_ws("", F.col("source"), F.lit("/"), F.col("doc_id"), F.lit("_gt.jpg")).alias(
                "output_image"
            ),
        )
    )
    return d.select("doc_id", rec.alias("record"))


@query(
    "manifest_source_scan",
    oracle="""
    SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    """,
)
def manifest_source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → JSONL shards + manifest → custom Python Data Source
    (``sources/manifest_source.py``) → aggregate. The manifest is read once
    at planning time and every shard becomes one InputPartition, so the read
    parallelism equals shard count with a single driver listing — the
    Spark-native replacement for the reference's imperative object-store
    manifest loops. The oracle reads the original parquet: a hash match
    proves the writer+manifest+source chain is lossless."""
    from datapipeline_ops_spark.sources.manifest_source import (
        ManifestJsonlDataSource,
        write_manifest,
    )

    d = load_table(spark, sf_dir, "documents")
    shard_dir = _scratch(sf_dir, "documents_manifest_shards")
    write_jsonl(d, shard_dir)
    manifest = os.path.join(_scratch(sf_dir, "documents_manifest"), "manifest.json")
    write_manifest(shard_dir, manifest)
    try:
        spark.dataSource.register(ManifestJsonlDataSource)
    except Exception:
        pass  # already registered in this session
    back = (
        spark.read.format("jsonl_manifest")
        .schema("doc_id bigint, text string, lang string, source string, n_chars bigint")
        .option("manifest", manifest)
        .load()
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@query(
    "partitioned_write_prune",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders,
           round(sum(CAST(round(o_totalprice*100) AS BIGINT)) / 100.0, 4)
               AS total
    FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderpriority
    """,
)
def partitioned_write_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned write + partition-pruned read: orders land
    partitioned by o_orderpriority, and the read-back filter on the
    partition column prunes whole directories — the scan never opens the
    other partitions' files. This is THE layout decision for a 100 TB
    fact table: a predicate on the partition key becomes a listing
    operation, not an I/O pass (check_plans asserts the pruned scan).

    The partition column count must be low-cardinality and coarse
    (priority/date, never user_id) — each distinct value is a directory,
    and small-file explosion from over-partitioning is the classic failure
    (compaction_plan is the repair tool)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    path = _scratch(sf_dir, "orders_by_priority")
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(path)
    back = spark.read.parquet(path).filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")) / 100.0, 4
        ).alias("total"),
    )


@query(
    "bucketed_join_copartition",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS n_items,
           round(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)) / 100.0, 4)
               AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def bucketed_join_copartition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join: orders and lineitem are written ONCE as
    bucketed tables (8 buckets on the join key, sorted within buckets);
    the subsequent join reads bucket i against bucket i directly — NO
    exchange on either side (check_plans asserts zero exchanges before
    the join). This is the bucketing payoff at 100 TB: the shuffle for
    every future join on that key is paid once at write time.

    Buckets also bound AQE's skew problem (a hot orderkey lands in one
    bucket, not one reduce task) and give sort-merge join presorted runs.
    The bucket count is a layout constant — production uses
    hundreds-to-thousands so each bucket file stays ~128-512 MB."""
    import shutil

    # identifier-safe tag: any non-alphanumeric path char (hyphens in tmp
    # dirs, dots in sf names) would break the unquoted table identifier
    tag = re.sub(r"[^0-9A-Za-z]+", "_", sf_dir.strip("/"))
    t_orders, t_lineitem = f"b_orders_{tag}", f"b_lineitem_{tag}"
    # a table dir left by ANOTHER session's catalog blocks saveAsTable even
    # in overwrite mode — drop the catalog entry AND any orphaned location
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    for t in (t_orders, t_lineitem):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(t_orders)
    )
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(t_lineitem)
    )
    bo = spark.table(t_orders)
    bl = spark.table(t_lineitem)
    joined = bo.join(bl, bl.l_orderkey == bo.o_orderkey)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")) / 100.0,
            4,
        ).alias("revenue"),
    )


@query(
    "manifest_stream_scan",
    oracle="""
    SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY source
    """,
)
def manifest_stream_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming read through the custom Python Data Source: the stream
    TAILS the shard manifest (offset = committed shard count), each
    micro-batch ingesting newly listed shards, drained with availableNow
    into a complete-mode aggregate. A hash match against the parquet oracle
    proves the writer → manifest → stream-offset → read chain is lossless
    and duplication-free across micro-batch boundaries.

    This is the continuous-ingest connector shape for a 100 TB lake: an
    upstream writer appends shards and rewrites the manifest; the stream's
    (start, end] shard-slice offsets make every batch replayable, so
    failure recovery re-reads exactly the same shards."""
    from datapipeline_ops_spark.sources.manifest_source import (
        ManifestJsonlDataSource,
        write_manifest,
    )
    from datapipeline_ops_spark.streaming.ops import run_stream_to_table

    d = load_table(spark, sf_dir, "documents")
    shard_dir = _scratch(sf_dir, "documents_stream_shards")
    write_jsonl(d, shard_dir)
    manifest = os.path.join(_scratch(sf_dir, "documents_stream_manifest"), "manifest.json")
    write_manifest(shard_dir, manifest)
    try:
        spark.dataSource.register(ManifestJsonlDataSource)
    except Exception:
        pass  # already registered in this session
    s = (
        spark.readStream.format("jsonl_manifest")
        .schema("doc_id bigint, text string, lang string, source string, n_chars bigint")
        .option("manifest", manifest)
        .load()
    )
    agg = s.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
    out = run_stream_to_table(agg, output_mode="complete")
    return out.select("source", "n_docs", "total_chars")


@query(
    "dpp_partitioned_join",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS n_orders,
           round(sum(CAST(round(o.o_totalprice*100) AS BIGINT)) / 100.0, 4)
               AS total
    FROM orders o
    WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o.o_orderpriority
    """,
)
def dpp_partitioned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact table is stored partitioned by
    o_orderpriority, the filter lives on a tiny DIMENSION table, and the
    partition values to scan are only known at RUNTIME — Catalyst injects
    a subquery filter on the fact's partition column from the dim side
    (``dynamicpruning`` in the plan, asserted), so the fact scan reads 2
    of 5 partitions without the query ever naming them statically.

    At 100 TB this is the star-join workhorse: date-dim filters
    ("last quarter") prune a date-partitioned fact to the matching
    partitions at runtime, cutting the scan by the dim's selectivity
    before a single fact row is read."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    path = _scratch(sf_dir, "orders_dpp")
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(path)
    fact = spark.read.parquet(path)
    # DPP wants a SELECTIVE predicate on the dim side (an unfiltered literal
    # relation doesn't qualify): full priority dim, filtered to the fast
    # tier. local_frame (r15): one explicit slice instead of
    # defaultParallelism pickled slices — the last multi-slice local frame
    # in a query path (r14 verdict item).
    dim = local_frame(
        spark,
        [
            ("1-URGENT", "fast"),
            ("2-HIGH", "fast"),
            ("3-MEDIUM", "slow"),
            ("4-NOT SPECIFIED", "slow"),
            ("5-LOW", "slow"),
        ],
        "priority string, tier string",
    ).filter(F.col("tier") == "fast")
    joined = fact.join(dim, fact.o_orderpriority == dim.priority)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")) / 100.0, 4
        ).alias("total"),
    )


@query(
    "schema_evolution_merge",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n,
           CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_missing_price,
           round(sum(coalesce(CAST(round(o_totalprice*100) AS BIGINT), 0))
                 / 100.0, 4) AS total_known
    FROM (
        SELECT o_orderkey, o_orderstatus, NULL::DOUBLE AS o_totalprice
        FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 2 = 1
    ) GROUP BY o_orderstatus
    """,
)
def schema_evolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across file generations: generation 1 wrote
    (orderkey, status) — no price column existed yet; generation 2 added
    o_totalprice. ``mergeSchema`` reconciles both into one scan schema with
    NULL-fill for the missing column, and the aggregate accounts for the
    gap explicitly (missing-count + known-total). This is the WHEN-not-IF
    of a 100 TB lake: columns get added mid-history, and readers must see
    one coherent schema without rewriting old files.

    The per-generation writes stay partition-parallel; mergeSchema pays one
    footer read per file at planning (production: a table-format catalog
    carries the schema instead)."""
    o = load_table(spark, sf_dir, "orders")
    path = _scratch(sf_dir, "orders_evolving")
    gen1 = o.filter(F.col("o_orderkey") % 2 == 0).select("o_orderkey", "o_orderstatus")
    gen2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    gen1.write.mode("overwrite").parquet(os.path.join(path, "gen=1"))
    gen2.write.mode("overwrite").parquet(os.path.join(path, "gen=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(path, "gen=1"), os.path.join(path, "gen=2")
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_missing_price"),
        F.round(
            F.sum(
                F.coalesce(
                    F.round(F.col("o_totalprice") * 100, 0).cast("long"),
                    F.lit(0).cast("long"),
                )
            )
            / 100.0,
            4,
        ).alias("total_known"),
    )


# ---------------------------------------------------------------------------
# provenance_hash_rollup — Merkle manifest of the corpus, per source
# ---------------------------------------------------------------------------

_PROV_SHARDS = 16


@query(
    "provenance_hash_rollup",
    oracle=f"""
    WITH doc_h AS MATERIALIZED (
        SELECT source, doc_id % {_PROV_SHARDS} AS shard, md5(text) AS h
        FROM documents
    ),
    shard_h AS MATERIALIZED (
        SELECT source, shard,
               md5(string_agg(h, '' ORDER BY h)) AS shard_md5,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM doc_h GROUP BY source, shard
    )
    SELECT source,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_shards,
           md5(string_agg(shard_md5, '' ORDER BY shard_md5)) AS manifest_md5
    FROM shard_h GROUP BY source
    """,
)
def provenance_hash_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-style provenance manifest: every document hashes to md5(text),
    {_PROV_SHARDS} shard digests per source roll up the SORTED doc hashes,
    and one source digest rolls up the sorted shard digests — the content-
    addressed fingerprint that answers 'is tonight's corpus build byte-
    identical to last night's, and if not, WHICH source/shard changed?'
    without diffing a single row. Two manifest rows differ iff any
    underlying document changed (modulo md5) — the audit trail data-
    lineage tooling (and dataset cards) should publish.

    Scale: the two-level tree is the point — each collect is bounded
    (docs within one (source, shard), then {_PROV_SHARDS} digests per
    source), so no group ever aggregates an unbounded string list; at
    bigger corpora, add levels (page -> file -> partition), same shape.
    Sorting inside each node makes the digest order-canonical, so the
    manifest is invariant to partitioning/shuffle order — the property
    that makes it usable as an equality gate between builds."""
    doc_h = load_table(spark, sf_dir, "documents").select(
        "source",
        (F.col("doc_id") % _PROV_SHARDS).alias("shard"),
        F.md5("text").alias("h"),
    )
    shard_h = doc_h.groupBy("source", "shard").agg(
        F.md5(F.concat_ws("", F.sort_array(F.collect_list("h")))).alias("shard_md5"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    return shard_h.groupBy("source").agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_shards"),
        F.md5(F.concat_ws("", F.sort_array(F.collect_list("shard_md5")))).alias(
            "manifest_md5"
        ),
    )


# ---------------------------------------------------------------------------
# encoding_advisor — which parquet encoding fits each column?
# ---------------------------------------------------------------------------

_ENC_BLOCK = 4096  # rows per "page": RLE runs reset at page boundaries
_ENC_DICT_NDV = 1024
_ENC_RLE_RUN = 4.0


@query(
    "encoding_advisor",
    oracle=f"""
    WITH src AS MATERIALIZED (
        SELECT o_orderkey // {_ENC_BLOCK} AS blk, o_orderkey,
               o_orderstatus, o_orderpriority
        FROM orders
    ),
    runs AS (
        SELECT 'o_orderstatus' AS column_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS ndv,
               CAST(sum(CASE WHEN prev IS NULL OR prev <> o_orderstatus
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
        FROM (
            SELECT blk, o_orderstatus,
                   lag(o_orderstatus) OVER (PARTITION BY blk ORDER BY o_orderkey)
                       AS prev
            FROM src
        )
        UNION ALL
        SELECT 'o_orderpriority',
               CAST(count(*) AS BIGINT),
               CAST(count(DISTINCT o_orderpriority) AS BIGINT),
               CAST(sum(CASE WHEN prev IS NULL OR prev <> o_orderpriority
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM (
            SELECT blk, o_orderpriority,
                   lag(o_orderpriority) OVER (PARTITION BY blk ORDER BY o_orderkey)
                       AS prev
            FROM src
        )
    )
    SELECT column_name, n_rows, ndv, n_runs,
           CAST(n_rows AS DOUBLE) / CAST(n_runs AS DOUBLE) AS avg_run_len,
           CASE
             WHEN ndv <= {_ENC_DICT_NDV}
                  AND CAST(n_rows AS DOUBLE) / CAST(n_runs AS DOUBLE)
                      >= {_ENC_RLE_RUN}
                 THEN 'DICT+RLE'
             WHEN ndv <= {_ENC_DICT_NDV} THEN 'DICT'
             ELSE 'PLAIN'
           END AS recommendation
    FROM runs
    """,
)
def encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-encoding advisor: per candidate column, the distinct count,
    the number of value RUNS within {_ENC_BLOCK}-row pages (runs reset at
    page boundaries, exactly like parquet's RLE), the average run length,
    and a DICT / DICT+RLE / PLAIN recommendation — the write-side analysis
    that decides whether re-sorting before write is worth it (a column
    with ndv=3 but avg_run=1 wants a sort; after sorting its runs collapse
    and the same table scans 10x cheaper).

    Exactness: runs and NDV are integers; avg_run_len is one int/int
    division; the recommendation CASE compares those exact values.

    Scale: the lag window partitions by PAGE BLOCK (o_orderkey div
    {_ENC_BLOCK}) — thousands of independent 4k-row partitions, never a
    global sort; at 100 TB this is embarrassingly parallel per page."""
    src = load_table(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") / _ENC_BLOCK).cast("long").alias("blk"),
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
    )

    def stats(col: str) -> DataFrame:
        w = Window.partitionBy("blk").orderBy("o_orderkey")
        lagged = src.select("blk", "o_orderkey", col).withColumn(
            "prev", F.lag(col).over(w)
        )
        return lagged.agg(
            F.lit(col).alias("column_name"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count_distinct(F.col(col)).cast("long").alias("ndv"),
            F.sum(
                F.when(
                    F.col("prev").isNull() | (F.col("prev") != F.col(col)), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_runs"),
        )

    runs = stats("o_orderstatus").unionAll(stats("o_orderpriority"))
    avg_run = F.col("n_rows").cast("double") / F.col("n_runs").cast("double")
    rec = (
        F.when(
            (F.col("ndv") <= _ENC_DICT_NDV) & (avg_run >= _ENC_RLE_RUN), "DICT+RLE"
        )
        .when(F.col("ndv") <= _ENC_DICT_NDV, "DICT")
        .otherwise("PLAIN")
    )
    return runs.select(
        "column_name",
        "n_rows",
        "ndv",
        "n_runs",
        avg_run.alias("avg_run_len"),
        rec.alias("recommendation"),
    )


@query(
    "text_lines_roundtrip",
    oracle="""
    SELECT coalesce(replace(lang, chr(9), ' '), '\\N') AS lang,
           coalesce(replace(source, chr(9), ' '), '\\N') AS source,
           count(*) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id
    FROM documents
    WHERE doc_id IS NOT NULL
    GROUP BY 1, 2
    """,
)
def text_lines_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents metadata -> line-oriented TEXT sink (one tab-joined record
    per line, the log-file interchange format) -> spark.read.text source ->
    split + typed projection -> aggregate, checked against the original
    parquet. Completes the interchange matrix (parquet/CSV/JSONL/ORC/text).
    Only newline-free columns ride the text format (doc_id, lang, source) —
    free-text bodies belong in the escaped formats; that contract is the
    point of having both. The format can't carry NULL or embedded tabs, so
    the writer ENFORCES the contract rather than trusting it: NULL
    lang/source become the log-format sentinel ``\\N`` and embedded tabs
    become spaces (the oracle applies the identical normalization), and
    NULL doc_id rows are excluded in both engines — concat_ws would
    silently drop the field and shift columns on read-back otherwise.

    Scale: text write/read parallelize per partition like every other
    sink here; the aggregate is a 130-group rollup."""

    def _fld(col: str) -> F.Column:
        return F.coalesce(F.translate(F.col(col), "\t", " "), F.lit("\\N"))

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull())
        .select(
            F.concat_ws(
                "\t", F.col("doc_id").cast("string"), _fld("lang"), _fld("source")
            ).alias("value")
        )
    )
    path = _scratch(sf_dir, "documents_text")
    d.write.mode("overwrite").text(path)
    back = (
        spark.read.text(path)
        .select(F.split(F.col("value"), "\t").alias("p"))
        .select(
            F.element_at(F.col("p"), 1).cast("long").alias("doc_id"),
            F.element_at(F.col("p"), 2).alias("lang"),
            F.element_at(F.col("p"), 3).alias("source"),
        )
    )
    return back.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").cast("long").alias("min_doc_id"),
    )
