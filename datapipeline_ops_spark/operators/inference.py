"""Model-inference operators: `Iterator[pd.Series]` pandas UDFs backed by
the per-executor model registry.

This is the Spark shape of every GPU op in the reference (I1–I5, T1–T6 in
SURVEY.md §2.1): Arrow streams columnar batches into the Python worker, the
model is fetched ONCE per task from the registry (and built once per worker
process), and each batch is scored vectorized. Swapping the deterministic
stub for mmdet/RetinaFace/CLIB-FIQA is a registry re-registration — query
code does not change (the same injection seam as the reference:
``person_detect_op.py:26-33``, ``face_quality_op.py:23-37``).

UDF objects are built lazily (a ``pandas_udf`` needs an active
SparkSession, and this module imports before any session exists) and cached
per process.
"""

from __future__ import annotations

import functools
from collections.abc import Iterator

import pandas as pd
from pyspark.sql.functions import pandas_udf

import datapipeline_ops_spark.models.stubs  # noqa: F401 - registers stubs on import


@functools.lru_cache(maxsize=None)
def quality_score_udf():
    """Quality score per key (CLIB-FIQA analog). Registry hit amortized to
    once per task; model build to once per python worker process."""

    @pandas_udf("double")
    def score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import datapipeline_ops_spark.models.stubs  # noqa: F401 - executor-side registration
        from datapipeline_ops_spark.models.registry import get_model

        model = get_model("quality")
        for keys in batches:
            yield model.predict(keys)

    return score


@functools.lru_cache(maxsize=None)
def detect_boxes_udf():
    """Bounding boxes per key (mmdet person-detector analog): 0..3 boxes of
    [x1, y1, x2, y2]."""

    @pandas_udf("array<array<int>>")
    def detect(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import datapipeline_ops_spark.models.stubs  # noqa: F401 - executor-side registration
        from datapipeline_ops_spark.models.registry import get_model

        model = get_model("detector")
        for keys in batches:
            yield model.predict(keys)

    return detect


@functools.lru_cache(maxsize=None)
def pair_similarity_udf():
    """Symmetric pairwise similarity (AdaFace analog) over two key columns."""

    @pandas_udf("double")
    def sim(batches: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        import datapipeline_ops_spark.models.stubs  # noqa: F401 - executor-side registration
        from datapipeline_ops_spark.models.registry import get_model

        model = get_model("similarity")
        for a, b in batches:
            yield model.score(a, b)

    return sim
