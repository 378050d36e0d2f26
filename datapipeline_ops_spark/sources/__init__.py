from datapipeline_ops_spark.sources.io import (  # noqa: F401
    read_csv,
    read_jsonl,
    upload_partitioned,
    write_csv,
    write_jsonl,
)
