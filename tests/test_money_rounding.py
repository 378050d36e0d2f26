"""Property tests for functions/money.py — the integer half-up rounding
convention that replaced round(double, 2) on money outputs.

Pins three things per helper:
- the Spark SQL expression and the DuckDB SQL produce IDENTICAL values
  (the cross-engine contract the oracle gate relies on);
- both match a pure-Python rational half-up reference (the semantic
  definition: round(units/scale, 2) with ties away from zero);
- the Spark output type is DOUBLE (a DECIMAL literal would silently
  change published schemas — the round-9 regression).
"""

from __future__ import annotations

from fractions import Fraction

import duckdb
from hypothesis import given, settings, strategies as st

from datapipeline_ops_spark.functions.money import (
    spark_avg_units,
    spark_units_to_dollars,
    sql_avg_units,
    sql_units_to_dollars,
)


def _py_round_half_up(num: int, den: int) -> Fraction:
    """round(num/den) to the nearest integer, halves AWAY FROM ZERO
    (den > 0; num may be negative — the helpers' sign-symmetric CASE)."""
    if num < 0:
        return -Fraction((2 * -num + den) // (2 * den))
    return Fraction((2 * num + den) // (2 * den))


@settings(max_examples=200, deadline=None)
@given(units=st.integers(min_value=-(10**17), max_value=10**17))
def test_units_to_dollars_matches_reference(units):
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {sql_units_to_dollars(str(units), 10000)}"
    ).fetchone()[0]
    cents = _py_round_half_up(units, 100)
    assert got == float(cents) / 100.0


@settings(max_examples=200, deadline=None)
@given(
    k=st.integers(min_value=-(10**15), max_value=10**15),
    n=st.integers(min_value=1, max_value=10**9),
)
def test_avg_units_matches_reference(k, n):
    con = duckdb.connect()
    got = con.execute(f"SELECT {sql_avg_units(str(k), str(n), 100, 4)}").fetchone()[0]
    scaled = _py_round_half_up(10**4 * k, 100 * n)
    assert got == float(scaled) / 10**4


def test_spark_and_duckdb_agree(spark):
    """Same expressions evaluated by BOTH engines over a value grid that
    includes the half-cent boundaries round(double,2) used to lose."""
    rows = [
        (u,)
        for u in [
            0, 50, 150, 12_345_550, 10**15 + 50, 999_999_999_950,
            -50, -150, -12_345_550, -(10**15) - 50,
        ]
    ]
    df = spark.createDataFrame(rows, "u long")
    s_vals = [
        r[0]
        for r in df.selectExpr(spark_units_to_dollars("u", 10000)).collect()
    ]
    con = duckdb.connect()
    d_vals = [
        con.execute(f"SELECT {sql_units_to_dollars(str(u), 10000)}").fetchone()[0]
        for (u,) in rows
    ]
    assert s_vals == d_vals
    # boundary case: 150 units = 1.5 cents -> half-up to 2 cents = $0.02
    assert s_vals[2] == 0.02
    # the published type stays DOUBLE
    (dtype,) = [t for _, t in df.selectExpr(
        spark_units_to_dollars("u", 10000) + " AS d"
    ).dtypes]
    assert dtype == "double"


def test_spark_avg_units_agrees(spark):
    rows = [
        (k, n)
        for k in (0, 1, 3, 10**13 + 7, -1, -3, -(10**13) - 7)
        for n in (1, 2, 3, 7, 10**6)
    ]
    df = spark.createDataFrame(rows, "k long, n long")
    s_vals = [
        r[0] for r in df.selectExpr(spark_avg_units("k", "n", 100, 4)).collect()
    ]
    con = duckdb.connect()
    d_vals = [
        con.execute(f"SELECT {sql_avg_units(str(k), str(n), 100, 4)}").fetchone()[0]
        for k, n in rows
    ]
    assert s_vals == d_vals
