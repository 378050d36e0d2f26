"""Micro-input robustness: every registered batch query must run (not
necessarily return rows) on 1-3-row tables. This is the guard for the
empty-group / shortlist-underflow crash class (e.g. an MMR greedy step
with fewer candidates than k, a percentile over an empty group, a
power-iteration factor with one label) — degradation must be graceful,
never a worker exception."""

import duckdb
import pytest

from datapipeline_ops_spark.queries import QUERIES

_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def micro_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sfmicro")
    con = duckdb.connect()
    for t in _TABLES:
        lim = 3 if t in ("documents", "embeddings", "events", "lineitem", "orders") else 100
        con.execute(
            f"COPY (SELECT * FROM '/root/testdata/sf0.001/{t}.parquet' LIMIT {lim}) "
            f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(d)


def test_all_batch_queries_survive_micro_inputs(spark, micro_dir):
    failures = {}
    for name, spec in QUERIES.items():
        if name.startswith("stream_") or name.startswith("manifest_stream"):
            continue  # streaming drains have their own harness tests
        try:
            spec.fn(spark, micro_dir).count()
        except Exception as exc:  # noqa: BLE001 — we want the full census
            failures[name] = f"{type(exc).__name__}: {exc}"[:200]
    assert not failures, failures
