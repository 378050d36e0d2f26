"""Tests for the retrying side-effect runner (ffmpeg_cut_op retry semantics:
3 attempts, exponential backoff) and the salted aggregation equivalence."""

import pyspark.sql.functions as F

from datapipeline_ops_spark.operators.sideeffects import RetryPolicy, run_with_status
from datapipeline_ops_spark.operators.skew import salted_agg


def test_retry_succeeds_after_transient_failures():
    attempts = []
    sleeps = []

    def flaky():
        attempts.append(1)
        if len(attempts) < 3:
            raise RuntimeError("transient")

    policy = RetryPolicy(max_attempts=3, jitter=lambda: 0.5, sleeper=sleeps.append)
    status, err = policy.run(flaky)
    assert status == 1 and err is None and len(attempts) == 3
    # backoff schedule: 2**0 + 0.5, 2**1 + 0.5 (ffmpeg_cut_op.py:50-56)
    assert sleeps == [1.5, 2.5]


def test_retry_exhausts_budget_with_error_as_data():
    def always_fails():
        raise ValueError("ffmpeg exited 1")

    policy = RetryPolicy(max_attempts=3, jitter=lambda: 0.0, sleeper=lambda s: None)
    status, err = policy.run(always_fails)
    assert status == 0 and "ffmpeg exited 1" in err


def test_run_with_status_mixed_outcomes(spark):
    df = spark.createDataFrame([(f"p{i}",) for i in range(10)], ["path"])

    def action(path: str) -> None:
        if path in ("p3", "p7"):
            raise RuntimeError("bad input")

    out = run_with_status(
        df, "path", action, policy=RetryPolicy(max_attempts=2, jitter=lambda: 0.0, sleeper=lambda s: None)
    )
    rows = {r.path: (r.status, r.error) for r in out.collect()}
    assert rows["p3"][0] == 0 and "bad input" in rows["p3"][1]
    assert rows["p0"] == (1, None)
    assert sum(s for s, _ in rows.values()) == 8


def test_salted_agg_equals_direct(spark):
    df = spark.createDataFrame(
        [(i % 3, float(i), i) for i in range(1000)], ["k", "v", "n"]
    )
    salted = {
        (r.k): (r.total, r.cnt, r.mx)
        for r in salted_agg(
            df, ["k"], {"total": ("v", "sum"), "cnt": ("v", "count"), "mx": ("n", "max")}
        ).collect()
    }
    direct = {
        (r.k): (r.total, r.cnt, r.mx)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count("v").alias("cnt"), F.max("n").alias("mx"))
        .collect()
    }
    assert salted == direct
