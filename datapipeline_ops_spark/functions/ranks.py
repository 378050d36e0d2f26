"""Distributed midranks: two-level bucketed prefix sums.

An unpartitioned running sum over a distinct-value spine works at test
scale but serializes the whole spine into ONE window partition — fatal when
the spine is value-domain-sized (per-customer spends are nearly all
distinct). Instead: coarse buckets of the value carry cumulative offsets
(the only unpartitioned window runs over the BUCKET spine, bounded by
domain/2^20), and the per-value running sum is windowed WITHIN its bucket.
Classic distributed prefix-sum; pinned by the check_plans assert that every
windowspecdefinition in the rank queries is bucket-led.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

RANK_BUCKET = 1 << 20


def rank_spine(by_val: DataFrame, col: str, cnt: str, out: str) -> DataFrame:
    """(value, count) -> (value, 2x-midrank) with integer midrank doubling.

    ``out`` = ``2*midrank(value)`` where midrank is the average rank of the
    tie group — doubled so .5 midpoints stay exact BIGINTs in both engines.
    """
    b = by_val.withColumn("_bkt", F.expr(f"{col} div {RANK_BUCKET}"))
    wb = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        b.groupBy("_bkt")
        .agg(F.sum(cnt).alias("_bc"))
        .select("_bkt", F.coalesce(F.sum("_bc").over(wb), F.lit(0)).alias("_off"))
    )
    wloc = Window.partitionBy("_bkt").orderBy(col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return b.join(F.broadcast(offs), "_bkt").select(
        col,
        (
            2 * (F.col("_off") + F.sum(cnt).over(wloc) - F.col(cnt))
            + F.col(cnt)
            + 1
        ).alias(out),
    )


def cum_before_spine(by_val: DataFrame, col: str, cnt: str, out: str) -> DataFrame:
    """(value, count) -> (value, number of rows strictly below value).

    Same two-level bucketed prefix sum; ``out`` is the exclusive cumulative
    count, the building block for CDF quartiles (RFM codes) and midranks.
    """
    b = by_val.withColumn("_bkt", F.expr(f"{col} div {RANK_BUCKET}"))
    wb = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = (
        b.groupBy("_bkt")
        .agg(F.sum(cnt).alias("_bc"))
        .select("_bkt", F.coalesce(F.sum("_bc").over(wb), F.lit(0)).alias("_off"))
    )
    wloc = Window.partitionBy("_bkt").orderBy(col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return b.join(F.broadcast(offs), "_bkt").select(
        col,
        (F.col("_off") + F.sum(cnt).over(wloc) - F.col(cnt)).alias(out),
    )
