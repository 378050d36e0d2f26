"""Streaming building blocks: file-manifest source over the events table and
a run-to-completion harness.

Design for scale: the source is a *file manifest* stream (new parquet files
landing in a directory — the standard pattern for continuous ingest into a
100 TB lake). Event-time correctness comes from watermarks; all window
operators are the built-in Structured Streaming ones, so state lives in the
state store (RocksDB on a real cluster) and scales horizontally with
partitions of the grouping key.

Testing shape: ``trigger(availableNow=True)`` drains whatever files exist
and terminates — the stream computes with the full streaming machinery
(state store, watermark tracking, incremental micro-batches via
``maxFilesPerTrigger``) but the run is finite, so results land in a memory
sink and can be compared row-for-row against a batch/DuckDB oracle.
"""

from __future__ import annotations

import itertools
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from datapipeline_ops_spark.tables import _normalize_event_ts, table_path

_STREAM_CACHE_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".tmp",
    "stream_src",
)
_counter = itertools.count()


def _events_stream_dir(sf_dir: str) -> str:
    """Materialize the events table as a one-file stream-source directory
    (file streams read directories, not single files). Copied once per sf;
    re-copied when the source's (mtime, size) changes, so a regenerated
    source table is never silently read stale."""
    tag = sf_dir.strip("/").replace("/", "_")
    d = os.path.join(_STREAM_CACHE_ROOT, tag)
    dst = os.path.join(d, "events.parquet")
    src = table_path(sf_dir, "events")
    st = os.stat(src)
    if (
        not os.path.exists(dst)
        or (os.path.getmtime(dst), os.path.getsize(dst)) != (st.st_mtime, st.st_size)
    ):
        os.makedirs(d, exist_ok=True)
        shutil.copyfile(src, dst)
        os.utime(dst, (st.st_atime, st.st_mtime))  # stamp for the next compare
    return d


def events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """``readStream`` over the events manifest directory with the same
    nanos→micros timestamp normalization as the batch loader, so streaming
    and batch queries see identical rows."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src_dir = _events_stream_dir(sf_dir)
    schema = spark.read.parquet(src_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(src_dir)
    # same nanos-long / micros-NTZ / micros-UTC normalization as the batch
    # loader — watermarks require a true TimestampType event-time column
    return _normalize_event_ts(df)


def run_stream_to_table(sdf: DataFrame, output_mode: str) -> DataFrame:
    """Drain the stream with ``availableNow`` into a memory sink; returns the
    finished result as a batch DataFrame. ``complete`` mode for aggregations
    (every window emitted), ``append`` for row streams."""
    name = f"stream_result_{next(_counter)}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = sdf.sparkSession
    # snapshot: memory-sink table contents as of stream completion
    return spark.table(name)


def run_stream_foreach_batch(sdf: DataFrame, write_batch, output_mode: str = "update") -> None:
    """Drain the stream through a ``foreachBatch`` sink.

    ``write_batch(batch_df, batch_id)`` receives each micro-batch as a BATCH
    DataFrame, so arbitrary batch sinks (jdbc, merge-into, multi-table
    fan-out) work unchanged. Exactly-once discipline is the callback's job:
    Spark re-runs a batch with the SAME batch_id after failure, so the write
    must be idempotent per (checkpoint, batch_id) — overwrite-by-batch-id
    partitions, or a transactional merge keyed on batch_id. This is the
    scale path for sinks Structured Streaming lacks natively.
    """
    q = (
        sdf.writeStream.foreachBatch(write_batch)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
