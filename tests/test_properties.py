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


@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 8) - 1), min_size=2, max_size=2
    ),
    st.lists(
        st.integers(min_value=0, max_value=(1 << 8) - 1), min_size=2, max_size=2
    ),
)
@settings(max_examples=50, deadline=None)
def test_morton_preserves_per_dimension_order_on_shared_prefix(a, b):
    """If two points agree on one dimension, their Morton order follows the
    other dimension — the interleaving never inverts a single-axis range."""
    from datapipeline_ops_spark.queries.layout_queries import _sql_morton2

    con = duckdb.connect()

    def z(x, y):
        return con.execute(
            f"SELECT {_sql_morton2('x', 'y')} FROM (SELECT {x} AS x, {y} AS y)"
        ).fetchone()[0]

    (xa, ya), (xb, yb) = a, b
    if xa == xb and ya < yb:
        assert z(xa, ya) < z(xb, yb)
    if ya == yb and xa < xb:
        assert z(xa, ya) < z(xb, yb)


@given(st.integers(min_value=0, max_value=10**9), st.integers(min_value=1, max_value=10**6))
@settings(max_examples=50, deadline=None)
def test_efraimidis_key_finite_positive(doc_id, weight):
    """The weighted-sampling key -ln(u)/w must be finite and non-negative
    for every doc id: u is shifted into (0, 1], so ln never sees 0."""
    h = int(hashlib.md5(f"4242:{doc_id}".encode()).hexdigest()[:15], 16)
    u = (h % 1_000_000 + 1) / 1_000_001.0
    k = -math.log(u) / weight
    assert k >= 0.0 and math.isfinite(k)


@given(st.integers(min_value=0, max_value=10**9))
@settings(max_examples=50, deadline=None)
def test_split_assign_partitions_and_is_stable(doc_id):
    """Every doc lands in exactly one of train/val/test, identically on
    both engines (the DuckDB expression IS the oracle's)."""
    from datapipeline_ops_spark.queries.sampling_sketch import (
        SPLIT_SEED,
        SPLIT_TRAIN,
        SPLIT_VAL,
    )

    con = duckdb.connect()
    u = con.execute(
        f"SELECT {sql_hash_unit('d', SPLIT_SEED)} FROM (SELECT {doc_id} AS d)"
    ).fetchone()[0]
    h = int(hashlib.md5(f"{SPLIT_SEED}:{doc_id}".encode()).hexdigest()[:15], 16)
    assert u == (h % 1_000_000) / 1_000_000.0
    split = "train" if u < SPLIT_TRAIN else ("val" if u < SPLIT_VAL else "test")
    assert split in ("train", "val", "test")
