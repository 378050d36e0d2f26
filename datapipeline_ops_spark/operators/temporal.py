"""Temporal join operators Spark lacks natively: as-of join and
(non-uniform) range join, built as compositions of existing DataFrame ops.

Both follow the brief's custom-operator ladder: expressible as compositions
of built-in ops (union + window; bucket + equi-join) — no UDF, no
mapPartitions, fully inside Catalyst.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    time_col: str,
    tiebreak_col: str,
    right_payload: list[str],
) -> DataFrame:
    """For each left row, the latest right row with ``right.time <=
    left.time`` within the same ``on`` key (ties on time broken by the
    highest ``tiebreak_col``).

    The scalable construction is the union trick: tag both sides, sort each
    key's timeline once, and carry the most recent right payload forward
    with ``last(..., ignorenulls)`` over an unbounded-preceding frame. ONE
    shuffle on the key — never a per-row subquery, never a range
    cross-product. (A sort-merge 'ASOF JOIN' physical operator, as DuckDB
    has, is the single-node analog; the union+window form is how the same
    semantics distribute.)
    """
    payload = F.struct(*[F.col(c) for c in right_payload])
    r = right.select(
        F.col(on),
        F.col(time_col),
        F.col(tiebreak_col).alias("_tb"),
        payload.alias("_payload"),
        F.lit(1).alias("_is_right"),
    )
    l_cols = left.columns
    l = left.select(
        *l_cols,
        F.lit(None).cast(r.schema["_tb"].dataType).alias("_tb"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        F.lit(0).alias("_is_right"),
    )
    unioned = l.select(
        *[F.col(c) for c in l_cols], "_tb", "_payload", "_is_right"
    ).unionByName(
        r.select(
            F.col(on),
            F.col(time_col),
            *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols if c not in (on, time_col)],
            "_tb",
            "_payload",
            "_is_right",
        ),
        allowMissingColumns=False,
    )
    from pyspark.sql import Window

    # rights sort before lefts at equal time (is_right DESC) so a same-time
    # right row IS visible (<= semantics); among rights, ascending tiebreak
    # makes `last` pick the highest.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(time_col).asc(), F.col("_is_right").desc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
    return matched.filter(F.col("_is_right") == 0).select(*l_cols, F.col("_match"))


def range_join_buckets(
    fact: DataFrame,
    value_col: str,
    ranges: DataFrame,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Join fact rows to [lo, hi) ranges — including NON-uniform ranges —
    without a theta-join cross product: each range explodes to the uniform
    buckets it overlaps, facts compute their bucket, candidates come from
    the bucket equi-join, and the exact predicate filters residuals.

    Shuffle keys are bucket ints; work scales with (#facts + Σ range
    widths/bucket_width), not #facts × #ranges. Buckets wider than the
    median range waste residual filtering; narrower waste explode rows —
    pick ~median range width.
    """
    r = ranges.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                F.floor((F.col(hi_col) - 1e-9) / bucket_width).cast("long"),
            )
        ),
    )
    f = fact.withColumn("_bucket", F.floor(F.col(value_col) / bucket_width).cast("long"))
    return (
        f.join(r, "_bucket")
        .filter((F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col)))
        .drop("_bucket")
    )
