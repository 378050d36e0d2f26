"""Property tests for the two-level bucketed prefix-sum rank helpers
(functions/ranks.py): the distributed midrank/CDF must equal the naive
single-pass definition on arbitrary integer multisets — including values
that straddle the RANK_BUCKET boundary, where the bucket-offset join is the
only thing keeping ranks global."""

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from datapipeline_ops_spark.functions.ranks import RANK_BUCKET, cum_before_spine, rank_spine


def _naive_midrank2(vals):
    """2x midrank per distinct value, from first principles."""
    s = sorted(vals)
    out = {}
    for v in set(vals):
        lo = s.index(v)  # rank of first occurrence (0-based)
        cnt = vals.count(v)
        # midrank = average of 1-based ranks lo+1 .. lo+cnt
        out[v] = 2 * lo + cnt + 1
    return out


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=5 * RANK_BUCKET),
        min_size=1,
        max_size=40,
    )
)
def test_rank_spine_matches_naive(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    by_val = df.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("c"))
    got = {
        r.v: r.mr2 for r in rank_spine(by_val, "v", "c", "mr2").collect()
    }
    assert got == _naive_midrank2(vals)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=5 * RANK_BUCKET),
        min_size=1,
        max_size=40,
    )
)
def test_cum_before_spine_matches_naive(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    by_val = df.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("c"))
    got = {
        r.v: r.cb for r in cum_before_spine(by_val, "v", "c", "cb").collect()
    }
    want = {v: sum(1 for x in vals if x < v) for v in set(vals)}
    assert got == want


def test_bucket_boundary_exactness(spark):
    # Values in distinct buckets including exact bucket-edge values.
    vals = [0, 1, RANK_BUCKET - 1, RANK_BUCKET, RANK_BUCKET,
            RANK_BUCKET + 1, 3 * RANK_BUCKET, 3 * RANK_BUCKET]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    by_val = df.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("c"))
    got = {r.v: r.mr2 for r in rank_spine(by_val, "v", "c", "mr2").collect()}
    assert got == _naive_midrank2(vals)
