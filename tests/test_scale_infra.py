"""Scale-infrastructure proofs on tiny data: bucketed co-located joins
(no exchange in the plan), partition-pruned reads (the IVF cell-probe
claim), and the binaryFile media source mapping.

These run on sf0.001 but assert PLAN and I/O properties — the things that
decide whether the same code survives 100 TB.
"""

import contextlib
import io
import os

import pyspark.sql.functions as F

from datapipeline_ops_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Pre-bucketing both sides of a repeated join key eliminates the
    shuffle: the SortMergeJoin reads bucket files directly. This is the
    co-located-join strategy for fact-fact joins at 100 TB."""
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(4, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_bkt")
    )
    (
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
        .write.mode("overwrite")
        .bucketBy(4, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("lineitem_bkt")
    )
    try:
        # force the sort-merge path: at test scale Spark rightly broadcasts
        # the tiny side; at 100 TB fact-fact scale broadcast is off the
        # table and bucketing is what removes the shuffle.
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("orders_bkt").join(spark.table("lineitem_bkt"), "o_orderkey")
            plan = _plan(joined)
            assert "Exchange hashpartitioning" not in plan, (
                f"bucketed join still shuffles:\n{plan[:800]}"
            )
            assert "SortMergeJoin" in plan
            assert joined.count() == lineitem.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    assert warehouse  # fixture sanity


def test_partitioned_write_prunes_at_read(spark, tmp_path):
    """partitionBy(cell) at write + an equality filter at read touches ONE
    partition directory — the physical backing for the IVF 'probe reads
    1/C of the data' claim (queries/similarity.py)."""
    path = str(tmp_path / "by_cell")
    e = load_table(spark, SF, "embeddings").withColumn(
        "cell", (F.col("vec_id") % 8).cast("int")
    )
    e.write.mode("overwrite").partitionBy("cell").parquet(path)
    probe = spark.read.parquet(path).filter(F.col("cell") == 3)
    plan = _plan(probe)
    m = [line for line in plan.splitlines() if "PartitionFilters" in line]
    assert m and "cell" in m[0], f"no partition filter in scan: {plan[:600]}"
    # physical check: only the cell=3 directory is listed in the scan
    assert probe.count() == e.filter(F.col("cell") == 3).count()
    dirs = {d for d in os.listdir(path) if d.startswith("cell=")}
    assert "cell=3" in dirs and len(dirs) == 8


def test_binary_file_source_reads_media(spark, tmp_path):
    """Media source mapping (SURVEY.md §2.2): spark.read.format('binaryFile')
    yields (path, modificationTime, length, content) per file — the inline
    alternative to the reference's open-from-shared-FS pattern."""
    media = tmp_path / "media"
    media.mkdir()
    payloads = {f"clip{i}.mp4": bytes([i]) * (10 + i) for i in range(3)}
    for name, data in payloads.items():
        (media / name).write_bytes(data)
    df = spark.read.format("binaryFile").load(str(media))
    rows = {os.path.basename(r.path): (r.length, bytes(r.content)) for r in df.collect()}
    assert rows == {n: (len(d), d) for n, d in payloads.items()}


def test_dynamic_partition_overwrite_is_idempotent(spark, tmp_path):
    """Re-running one day's output replaces ONLY that partition — the
    idempotent-restart story for partitioned sinks: a failed/re-run job
    never clobbers sibling partitions and never duplicates its own."""
    out = str(tmp_path / "by_day")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        o = load_table(spark, SF, "orders").withColumn(
            "order_date", F.to_date("o_orderdate")
        )
        two_days = [r["order_date"] for r in o.select("order_date").distinct().limit(2).collect()]
        d0, d1 = sorted(two_days)
        base = o.filter(F.col("order_date").isin([d0, d1]))
        base.write.partitionBy("order_date").mode("overwrite").parquet(out)
        n_d0 = base.filter(F.col("order_date") == d0).count()
        n_total = base.count()
        # re-run ONLY d0's slice (simulating a task retry / backfill)
        base.filter(F.col("order_date") == d0).write.partitionBy(
            "order_date"
        ).mode("overwrite").parquet(out)
        back = spark.read.parquet(out)
        assert back.count() == n_total  # d1 untouched, d0 not duplicated
        assert back.filter(F.col("order_date") == d0).count() == n_d0
    finally:
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")


def test_output_file_count_is_controlled(spark, tmp_path):
    """Small-file control: repartition before write bounds the number of
    output files (the 100 TB lake-hygiene lever — a 32-partition shuffle
    stage must not emit 32 tiny files per day into a partitioned table)."""
    out = str(tmp_path / "compacted")
    li = load_table(spark, SF, "lineitem").repartition(32, "l_orderkey")
    li.repartition(2).write.mode("overwrite").parquet(out)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == 2, files
    assert spark.read.parquet(out).count() == li.count()


def test_observe_metrics_without_second_scan(spark):
    """`df.observe` collects pipeline health metrics (row counts, null
    tallies, sums) as a side product of the ONE action that runs the
    query — at 100 TB you cannot afford a second scan just to know how many
    rows a filter dropped."""
    from pyspark.sql import Observation

    li = load_table(spark, SF, "lineitem")
    obs = Observation("pipeline_metrics")
    out = (
        li.observe(
            obs,
            F.count(F.lit(1)).alias("rows_in"),
            F.sum(F.col("l_quantity")).alias("qty_in"),
            F.count(F.when(F.col("l_shipdate").isNull(), 1)).alias("null_shipdates"),
        )
        .filter(F.col("l_quantity") >= 45.0)
        .count()
    )
    m = obs.get
    assert m["rows_in"] == li.count()
    assert m["null_shipdates"] == 0
    assert out < m["rows_in"]
