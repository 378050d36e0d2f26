"""Similarity join: broadcast nested-loop theta-join + per-candidate argmax.

Reference semantics (``video_extract_frame.py:294-304``): every candidate
face is scored against every kept reference face; the max-similarity match
wins (argmax), then band filters apply.

Spark-first shape: the reference set is tiny (2-3 refs per video; here a
small dim table), so the cross product is a **broadcast** nested-loop join —
zero shuffle on the big side; the argmax is a window top-1 with a
deterministic tie-break. The scorer is injectable: production would plug an
embedding-distance column or a pandas-UDF model; tests use the deterministic
hash stub (the same injection seam the reference exposes,
``similarity_op.py:8-10``).
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from datapipeline_ops_spark.functions.hashing import hash64


def stub_similarity(cand_key: Column, ref_key: Column) -> Column:
    """Deterministic integer pseudo-similarity in [0, 1000) — the test stub."""
    return hash64(F.concat(cand_key.cast("string"), F.lit("_"), ref_key.cast("string"))) % 1000


def similarity_argmax_join(
    candidates: DataFrame,
    refs: DataFrame,
    cand_key: str,
    ref_key: str,
    scorer: Callable[[Column, Column], Column] = stub_similarity,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Score candidates × broadcast(refs); keep the best ref per candidate.

    Output: candidate key (+ keep_cols) + ``best_ref`` + ``best_sim``.
    """
    scored = candidates.crossJoin(F.broadcast(refs)).withColumn(
        "sim", scorer(F.col(cand_key), F.col(ref_key))
    )
    w = Window.partitionBy(cand_key).orderBy(F.desc("sim"), F.asc(ref_key))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            cand_key,
            *keep_cols,
            F.col(ref_key).alias("best_ref"),
            F.col("sim").alias("best_sim"),
        )
    )
