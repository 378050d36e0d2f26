"""Unit tests for pipeline-analog operators on tiny inline DataFrames —
verifying the reference semantics directly (grid + tail rule, stride bounds,
argmax determinism), independent of the oracle harness."""

import pyspark.sql.functions as F

from datapipeline_ops_spark.operators.segments import plan_segments, sample_indices
from datapipeline_ops_spark.operators.simjoin import similarity_argmax_join


def test_segment_tail_rule(spark):
    # scene_segmenter_op.py:102-111 — 900s grid, tail kept iff >= 300s
    df = spark.createDataFrame(
        [("a", 1800.0), ("b", 2100.0), ("c", 2200.0), ("d", 250.0), ("e", 900.0)],
        ["file_path", "total_duration"],
    )
    out = plan_segments(df, "total_duration", "file_path", 900.0, 300.0)
    got = {r.file_path: r.n for r in out.groupBy("file_path").agg(F.count("*").alias("n")).collect()}
    assert got == {"a": 2, "b": 3, "c": 3, "e": 1}  # d dropped (250 < 300); b tail 300 kept
    rows = {(r.file_path, r.seg_idx): (r.start_time, r.end_time, r.duration) for r in out.collect()}
    assert rows[("c", 2)] == (1800.0, 2200.0, 400.0)  # tail clipped to total


def test_segment_boundary_tail_exact_min(spark):
    # tail exactly == min_tail is KEPT (>= comparison)
    df = spark.createDataFrame([("x", 1200.0)], ["file_path", "total_duration"])
    out = plan_segments(df, "total_duration", "file_path", 900.0, 300.0).collect()
    assert len(out) == 2 and out[1].duration == 300.0


def test_sample_indices_strides(spark):
    # video_extract_frame.py:159-161 — first 10% step 20; :247-250 last 90% step 50
    df = spark.createDataFrame([("v", 1000)], ["file_path", "total_frame"])
    ref = sample_indices(df, "total_frame", 20, 0.0, 0.1).select("sample_idx").collect()
    assert [r.sample_idx for r in ref] == [0, 20, 40, 60, 80]
    scan = sample_indices(df, "total_frame", 50, 0.1, 1.0).select("sample_idx").collect()
    idxs = [r.sample_idx for r in scan]
    assert idxs[0] == 100 and idxs[-1] == 950 and all(b - a == 50 for a, b in zip(idxs, idxs[1:]))


def test_sample_indices_empty_when_range_empty(spark):
    df = spark.createDataFrame([("v", 5)], ["file_path", "total_frame"])
    assert sample_indices(df, "total_frame", 20, 0.0, 0.1).count() == 0


def test_similarity_argmax_deterministic(spark):
    cands = spark.createDataFrame([(i,) for i in range(20)], ["cand"])
    refs = spark.createDataFrame([(j,) for j in range(5)], ["ref"])
    a = similarity_argmax_join(cands, refs, "cand", "ref").collect()
    b = similarity_argmax_join(cands.repartition(7), refs, "cand", "ref").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 20  # exactly one best ref per candidate


def test_parse_fraction_malformed_is_null(spark):
    from datapipeline_ops_spark.functions.scalar import parse_fraction

    df = spark.createDataFrame(
        [("30000/1001",), ("25/0",), ("garbage",), ("42",)], ["frac"]
    ).select(F.round(parse_fraction(F.col("frac")), 3).alias("fps"))
    vals = [r.fps for r in df.collect()]
    assert vals[0] == 29.97 and vals[1] is None and vals[3] == 42.0
    # 'garbage' has no '/' → numerator try_cast fails → NULL, no exception
    assert vals[2] is None


def test_sec_to_label_format(spark):
    from datapipeline_ops_spark.functions.scalar import sec_to_label

    df = spark.createDataFrame([(3725,), (59,), (86399,)], ["s"]).select(
        sec_to_label(F.col("s")).alias("label")
    )
    assert [r.label for r in df.collect()] == ["1-02-05", "0-00-59", "23-59-59"]


def test_split_scenes_recursive_matches_reference_recursion(spark):
    """Exact parity with the reference recursion (scene_segmenter_op.py:22-41):
    split at (s+e)//2 into (s,mid)/(mid+1,e); keep min<=d<=max; drop short."""
    from datapipeline_ops_spark.operators.segments import split_scenes_recursive

    def rec(s, e, mx, mn):
        d = e - s
        if mn <= d <= mx:
            return [(s, e)]
        if d > mx:
            m = (s + e) // 2
            return rec(s, m, mx, mn) + rec(m + 1, e, mx, mn)
        return []

    cases = [(i, 0, n) for i, n in enumerate([0, 5, 10, 99, 100, 101, 1000, 12345, 65536, 7])]
    df = spark.createDataFrame(cases, ["k", "s", "e"])
    out = split_scenes_recursive(df, "s", "e", max_duration=100, min_duration=10)
    got = {}
    for r in out.collect():
        got.setdefault(r.k, []).append((r.seg_idx, r.start_frame, r.end_frame))
    for k, s, e in cases:
        expected = [(i, a, b) for i, (a, b) in enumerate(rec(s, e, 100, 10))]
        assert sorted(got.get(k, [])) == expected, (k, s, e)
