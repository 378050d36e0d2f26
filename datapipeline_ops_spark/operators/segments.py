"""Segment planning: the relational heart of the cut pipelines.

Reference semantics (``scene_segmenter_op.py:102-111``, defaults ``:66-67``;
driver variants ``cut_30min.py:124-125`` 900/300 s, ``cut_ruidi.py:26,96-100``
600/150 s): divide ``[0, total_duration)`` into fixed-length segments;
the final partial segment is kept iff its duration >= ``min_tail``.

The reference computes this per row in a Python loop inside a Ray worker.
Here it is a generate-and-explode: ``F.sequence`` builds the per-row index
array JVM-side, `explode` fans it out, and everything stays in whole-stage
codegen. At 100 TB the fan-out happens executor-local (no shuffle at all —
narrow dependency), which is exactly what you want for a row-count-amplifying
operator: never shuffle *after* amplification when you can avoid it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from datapipeline_ops_spark.functions.scalar import basename_no_ext, segment_out_path


def plan_segments(
    df: DataFrame,
    duration_col: str,
    key_col: str,
    seg_len: float,
    min_tail: float,
    out_dir: str = "/out",
    path_col: str | None = None,
) -> DataFrame:
    """Explode each row into its planned segments.

    Output columns: all input columns + ``seg_idx, start_time, end_time,
    duration`` (+ ``out_path`` when ``path_col`` given).
    """
    total = F.col(duration_col)
    n_full = F.floor(total / seg_len)
    tail = total - n_full * seg_len
    n_seg = (n_full + F.when(tail >= min_tail, 1).otherwise(0)).cast("int")
    out = (
        df.withColumn("_n_seg", n_seg)
        .filter(F.col("_n_seg") >= 1)  # sequence(0, n-1) needs n >= 1
        .withColumn("seg_idx", F.explode(F.sequence(F.lit(0), F.col("_n_seg") - 1)))
        .drop("_n_seg")
        .withColumn("start_time", F.col("seg_idx") * seg_len)
        .withColumn("end_time", F.least(total, (F.col("seg_idx") + 1) * F.lit(seg_len)))
        .withColumn("duration", F.col("end_time") - F.col("start_time"))
    )
    if path_col is not None:
        out = out.withColumn(
            "out_path",
            segment_out_path(
                out_dir,
                basename_no_ext(F.col(path_col)),
                F.col("seg_idx"),
                F.col("start_time"),
                F.col("duration"),
            ),
        )
    return out


def summarize_segments(planned: DataFrame, key_col: str) -> DataFrame:
    """Per-input summary (``cut_ruidi.py:146-156``: file → #segments, status)."""
    # durations are 2-dp exact (grid length or a 2-dp tail), so the rollup
    # runs in exact integer centiseconds — round(sum(double), 2) is the
    # partition-order / shortest-decimal divergence class (functions/money.py)
    return planned.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_segments"),
        (
            F.sum(F.round(F.col("duration") * 100, 0).cast("long")).cast("double")
            / 100.0
        ).alias("planned_duration"),
    )


def sample_indices(
    df: DataFrame,
    count_col: str,
    step: int,
    start_frac: float = 0.0,
    end_frac: float = 1.0,
    index_name: str = "sample_idx",
) -> DataFrame:
    """Strided index sampling (``decord_reader_op.py:43-57``: one frame per N
    seconds / last-N-seconds refs; strides at ``video_extract_frame.py:159-161,
    247-250``: step 20 over first 10%, step 50 over last 90%).

    Emits one row per sampled index in ``[ceil(count*start_frac),
    count*end_frac)`` with stride ``step`` — pure sequence+explode, no UDF,
    no shuffle.
    """
    n = F.col(count_col).cast("long")
    lo = F.ceil(n * start_frac).cast("long")
    # floor, not cast: DuckDB CAST(double AS BIGINT) rounds while Spark
    # truncates — floor() agrees everywhere for non-negative values.
    hi = F.floor(n * end_frac).cast("long")  # exclusive
    return (
        df.filter(hi > lo)
        .withColumn(index_name, F.explode(F.sequence(lo, hi - 1, F.lit(step))))
    )


def split_scenes_recursive(
    df: DataFrame,
    start_col: str,
    end_col: str,
    max_duration: int,
    min_duration: int,
    max_depth: int = 12,
) -> DataFrame:
    """Recursive halving segment planner (``scene_segmenter_op.py:22-41``,
    ``split_scene_recursively``): a scene longer than ``max_duration``
    splits at ``mid = (s + e) // 2`` into ``(s, mid)`` and ``(mid + 1, e)``,
    recursively; a scene with duration in ``[min_duration, max_duration]``
    is kept; shorter leaves are dropped (the reference returns ``[]``).

    The recursion is data-independent in depth bound: durations halve per
    level, so ``max_depth`` levels cover scenes up to
    ``max_duration * 2**max_depth``. It unrolls as ``max_depth`` per-row
    array-rewrite rounds (transform + flatten — executor-local, zero
    shuffles, whole-stage codegen) followed by ONE posexplode. Leaf order
    is the reference's left-to-right recursion order == ascending start,
    so ``seg_idx`` is the posexplode position.

    Output: input columns + ``seg_idx, start_frame, end_frame, duration``.
    """
    seg0 = F.array(
        F.struct(
            F.col(start_col).cast("long").alias("s"), F.col(end_col).cast("long").alias("e")
        )
    )
    out = df.withColumn("_segs", seg0)
    for _ in range(max_depth):
        out = out.withColumn(
            "_segs",
            F.flatten(
                F.transform(
                    "_segs",
                    lambda g: F.when(
                        (g["e"] - g["s"]) > max_duration,
                        F.array(
                            F.struct(
                                g["s"].alias("s"),
                                F.floor((g["s"] + g["e"]) / 2).cast("long").alias("e"),
                            ),
                            F.struct(
                                (F.floor((g["s"] + g["e"]) / 2) + 1).cast("long").alias("s"),
                                g["e"].alias("e"),
                            ),
                        ),
                    ).otherwise(F.array(g)),
                )
            ),
        )
    kept = F.filter(
        F.col("_segs"),
        lambda g: ((g["e"] - g["s"]) >= min_duration) & ((g["e"] - g["s"]) <= max_duration),
    )
    return (
        out.withColumn("_kept", kept)
        .drop("_segs")
        .select("*", F.posexplode("_kept").alias("seg_idx", "_g"))
        .drop("_kept")
        .withColumn("start_frame", F.col("_g.s"))
        .withColumn("end_frame", F.col("_g.e"))
        .withColumn("duration", F.col("end_frame") - F.col("start_frame"))
        .drop("_g")
    )
