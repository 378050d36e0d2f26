"""Sources and sinks: CSV / JSONL / binary-file / object-store.

Reference surface (SURVEY.md §2.2 scans table):

- CSV scan with header — ``ray.data.read_csv`` (reference
  ``pipeline/video_extract_frame.py:416`` et al.); here
  ``spark.read.option("header", True).csv`` with an explicit schema (never
  inferSchema at scale — schema inference is a full extra pass over 100 TB).
- JSONL scan — ``read_json`` (``for_high_bg_all_morelittler.py:286``).
- CSV / JSON sinks, one file per partition — ``predictions.write_csv``
  (``video_extract_frame.py:422``); Spark's directory-of-parts output is
  the same layout made safe: the reference appends to ONE jsonl from many
  workers (``save_output_op.py:25-26``), a documented race; partitioned
  writes + atomic commit protocol fix it for free.
- Object-store upload per partition — ``minio_upload_op.py:27-41``; here a
  ``foreachPartition`` sink with an injectable uploader (stubbed in tests,
  boto3/minio client in production) that opens ONE client per partition,
  not per row.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql.types import StructType


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Header CSV scan with explicit schema; utf-8 with BOM tolerated (the
    reference reads utf-8-sig manifests)."""
    return (
        spark.read.option("header", True)
        .option("encoding", "UTF-8")
        .schema(schema)
        .csv(path)
    )


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV sink, one file per partition (the reference's write_csv layout)."""
    df.write.mode(mode).option("header", True).csv(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """JSONL scan with explicit schema (one JSON object per line)."""
    return spark.read.schema(schema).json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSONL sink: directory of part files, atomically committed — replaces
    the reference's concurrent single-file appends (``save_output_op.py:
    25-26``) which lose/interleave lines under parallel writers."""
    df.write.mode(mode).json(path)


Uploader = Callable[[str], bool]


def upload_partitioned(
    df: DataFrame,
    path_col: str,
    make_uploader: Callable[[], Uploader],
) -> None:
    """Object-store sink (``minio_upload_op.py:27-41`` analog): for each
    partition, build ONE uploader (client connect is the expensive part) and
    push every path through it. Failures must be recorded by the uploader
    itself (error-as-data) — this sink never raises per-row."""

    def run(rows: Iterable[Row]) -> None:
        upload = make_uploader()
        for row in rows:
            upload(row[path_col])

    df.select(path_col).foreachPartition(run)
