"""Structured Streaming surface.

The reference is pure batch (SURVEY.md §2.2 — every pipeline is a finite
CSV/JSONL scan), so this module is beyond-reference capability: the same
event tables, processed as unbounded streams with event-time semantics.
"""

from datapipeline_ops_spark.streaming.ops import (  # noqa: F401
    events_stream,
    run_stream_to_table,
)
