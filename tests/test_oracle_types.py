"""Guard against oracle-output types the driver's hasher normalizes
differently from Spark's.

Round-3 postmortem: the only 4 driver hash-mismatches were exactly the 4
queries whose DuckDB oracle emitted a HUGEINT column (integer ``sum()``
returns INT128 in DuckDB; fetched through pandas/Arrow it degrades to
float64, while the Spark side stays int64 — same values, different hash).
Every integer aggregate in an oracle must therefore be cast to BIGINT.

This scans the ENTIRE registry, not just driver-recorded queries, so a new
query can't reintroduce the class.
"""

import duckdb
import pytest

from datapipeline_ops_spark.queries import QUERIES

# Types whose Python / Arrow representation is identical for DuckDB and
# Spark under any reasonable normalization.
_SAFE = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "FLOAT",
    "VARCHAR",
    "BOOLEAN",
    "DATE",
    "TIMESTAMP",
    "TIMESTAMP_NS",
    "TIMESTAMP WITH TIME ZONE",
    # JSON fetches as str on both paths; driver-green since r01
    # (jsonl_records, pipeline_caption_e2e).
    "JSON",
}

SF_DIR = "/root/testdata/sf0.001"
_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in _TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_no_exotic_oracle_output_types(con):
    offenders = {}
    for name, q in QUERIES.items():
        if q.oracle is None:
            continue
        rows = con.execute(
            f"DESCRIBE SELECT * FROM ({q.oracle}) LIMIT 0"
        ).fetchall()
        weird = [(c, typ) for c, typ, *_ in rows if typ not in _SAFE]
        if weird:
            offenders[name] = weird
    assert not offenders, (
        "oracle output columns with driver-hash-unsafe types (cast integer "
        f"sums to BIGINT): {offenders}"
    )
