"""Property-based tests (hypothesis) for engine invariants that unit
examples can't sweep: cross-engine hash agreement on arbitrary strings,
shingle/fingerprint structural laws, segment-plan conservation, and the
as-of join's defining property."""

import hashlib
import math

import duckdb
import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from datapipeline_ops_spark.functions.hashing import sql_hash64, sql_hash_unit

TEXTS = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="'\\\x00"),
    min_size=0,
    max_size=60,
)


@settings(max_examples=50, deadline=None)
@given(TEXTS, st.integers(min_value=0, max_value=99))
def test_hash64_cross_engine_agreement(s, seed):
    """DuckDB sql_hash64 == python md5 model for arbitrary ascii strings
    (the Spark side equals the python model — test_dedup covers it; this
    closes the triangle)."""
    con = duckdb.connect()
    got = con.execute(f"SELECT {sql_hash64('?', seed=seed)}", [s]).fetchone()[0]
    expected = int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)
    assert got == expected
    unit = con.execute(f"SELECT {sql_hash_unit('?', seed=seed)}", [s]).fetchone()[0]
    assert unit == (expected % 1_000_000) / 1_000_000.0 and 0 <= unit < 1


@settings(max_examples=25, deadline=None)
@given(st.lists(st.floats(min_value=1.0, max_value=1e6, allow_nan=False), min_size=1, max_size=8))
def test_segment_plan_conserves_duration(spark_session, durations):
    """Σ planned segment durations == total_duration when the tail is kept,
    or total − dropped_tail when dropped; never overlapping, never past the
    end (scene_segmenter_op.py:102-111 grid law)."""
    from datapipeline_ops_spark.operators.segments import plan_segments

    spark = spark_session
    seg, tail = 900.0, 300.0
    df = spark.createDataFrame(
        [(str(i), float(d)) for i, d in enumerate(durations)], ["k", "dur"]
    )
    rows = plan_segments(df, "dur", "k", seg, tail).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.k, []).append(r)
    for i, d in enumerate(durations):
        segs = sorted(by_key.get(str(i), []), key=lambda r: r.seg_idx)
        n_full = int(d // seg)
        rem = d - n_full * seg
        expect_n = n_full + (1 if rem >= tail else 0)
        assert len(segs) == expect_n
        if segs:
            assert segs[-1].end_time <= d + 1e-6
            total = sum(r.duration for r in segs)
            expect_total = d if rem >= tail else n_full * seg
            assert math.isclose(total, expect_total, rel_tol=1e-9, abs_tol=1e-6)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 50), st.integers(0, 3)), min_size=1, max_size=30),
    st.lists(st.tuples(st.integers(0, 50), st.integers(0, 3)), min_size=0, max_size=30),
)
def test_asof_join_defining_property(spark_session, left_rows, right_rows):
    """For every left row the match is exactly max{right.t <= left.t} within
    the key (tie → max tiebreak), or null when no such right exists."""
    from datapipeline_ops_spark.operators.temporal import asof_join

    spark = spark_session
    left = spark.createDataFrame(
        [(k, t, i) for i, (t, k) in enumerate(left_rows)], ["k", "t", "lid"]
    )
    right = spark.createDataFrame(
        [(k, t, 1000 + i, float(t)) for i, (t, k) in enumerate(right_rows)],
        ["k", "t", "rid", "val"],
    ) if right_rows else spark.createDataFrame([], "k int, t int, rid int, val double")
    out = asof_join(left, right, on="k", time_col="t", tiebreak_col="rid", right_payload=["rid", "val"])
    got = {r.lid: (r._match.rid if r._match else None) for r in out.collect()}
    for i, (t, k) in enumerate(left_rows):
        cands = [(rt, 1000 + j) for j, (rt, rk) in enumerate(right_rows) if rk == k and rt <= t]
        expect = max(cands)[1] if cands else None
        assert got[i] == expect, (i, t, k, cands)


# session-scoped fixture alias (hypothesis needs a non-function-scoped fixture)
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def spark_session(spark):
    return spark
