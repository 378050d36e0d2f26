"""Cross-engine boundary pins for the two float/integer seams flagged in
round 6: the Bradley-Terry threshold's integer halving (Spark `div` vs
DuckDB `//` — BOTH truncate toward zero; `floor()` would not) and the Q17
shape's `0.2 * avg_qty` comparison (both engines must land the SAME side
of the strict `<` when a quantity sits exactly on the threshold)."""

import duckdb
import pyspark.sql.functions as F

from datapipeline_ops_spark.queries.relational_extra import (
    small_quantity_order_revenue,
)
from datapipeline_ops_spark.queries import QUERIES


def test_truncating_halving_matches_duckdb(spark):
    # Negative odd deltas are where floor and truncate diverge:
    # -7/2 -> trunc -3 (both engines' integer div), floor -4.
    deltas = list(range(-9, 10)) + [-399, -301, 301, 399]
    duck = {
        d: duckdb.sql(f"SELECT {d} // 2").fetchone()[0] for d in deltas
    }
    rows = (
        spark.range(1)
        .select(
            *[
                F.expr(f"CAST({d} AS BIGINT) div 2").alias(f"d{i}")
                for i, d in enumerate(deltas)
            ]
        )
        .first()
    )
    got = {d: rows[i] for i, d in enumerate(deltas)}
    assert got == duck


def test_bradley_terry_thr_boundary(spark):
    # Full thr expression (clamp(500 + (li-lj) div 2, 50, 950)) on a grid
    # that includes every negative odd residue mod 2 — pinned against the
    # oracle SQL fragment verbatim.
    pairs = [(-7, 0), (-1, 0), (-399, 0), (399, 0), (-1000, 0), (1000, 0),
             (3, -4), (-3, 4), (-5, -2), (5, 2)]
    duck = [
        duckdb.sql(
            f"SELECT greatest(50, least(950, 500 + ({li} - {lj}) // 2))"
        ).fetchone()[0]
        for li, lj in pairs
    ]
    df = spark.createDataFrame(pairs, "li long, lj long").select(
        F.greatest(
            F.lit(50),
            F.least(F.lit(950), F.lit(500) + F.expr("(li - lj) div 2").cast("long")),
        ).alias("thr")
    )
    got = [r.thr for r in df.collect()]
    assert got == duck


def test_bradley_terry_spark_matches_oracle_on_negative_odd_diffs(spark, sf_dir):
    # End-to-end gate on the real tables: the sf0.001 latent grid contains
    # negative odd diffs (hash64 % 400 over 20 sources), so a floor/trunc
    # mismatch shifts thr by 1 for ~25% of pairs. The mimic harness hashes
    # values, so running the registered query against its oracle here pins
    # the semantics forever.
    spec = QUERIES["bradley_terry_strengths"]
    sf = sf_dir
    got = {
        r.source: (r.wins, r.n_matches, r.rank)
        for r in spec.fn(spark, sf).collect()
    }
    con = duckdb.connect()
    for t in ("documents",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )
    want = {
        s: (w, n, rk)
        for s, _lat, w, n, _st, rk in con.execute(spec.oracle).fetchall()
    }
    assert got == want


def _q17_micro(tmp_path, quantities):
    """Write a 1-part lineitem where 0.2*avg(qty) can sit exactly on a row."""
    con = duckdb.connect()
    vals = ", ".join(
        f"(1, CAST({q} AS DOUBLE), CAST(100.0 AS DOUBLE))" for q in quantities
    )
    con.execute(
        f"COPY (SELECT * FROM (VALUES {vals}) "
        "AS t(l_partkey, l_quantity, l_extendedprice)) "
        f"TO '{tmp_path}/lineitem.parquet' (FORMAT PARQUET)"
    )
    return str(tmp_path)


def _oracle_on(d):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{d}/lineitem.parquet'"
    )
    return con.execute(
        QUERIES["small_quantity_order_revenue"].oracle
    ).fetchone()


def test_q17_exact_threshold_boundary(spark, tmp_path):
    # avg of (1, 4, 5, 5, 10) = 5.0 exactly -> threshold 0.2*5.0 = 1.0.
    # The row with quantity exactly 1.0 must be EXCLUDED (strict <) by both
    # engines; only sub-threshold rows would count, and there are none.
    d = _q17_micro(tmp_path, [1, 4, 5, 5, 10])
    got = small_quantity_order_revenue(spark, d).first()
    duck = _oracle_on(d)
    assert (got.n_small_lineitems, got.avg_yearly) == duck
    assert got.n_small_lineitems == 0


def test_q17_adversarial_float_average(spark, tmp_path):
    # All 9 rows share l_partkey=1, so avg_qty is the 9-row average
    # (1+1+1+3+7+8.3+0.71+0.70999999999999996+0.711)/9 — a non-terminating
    # binary fraction with the three probe quantities sitting within an
    # ulp-ish of 0.2*avg. Both engines compute avg as sum/count over
    # identical doubles, so the boundary decision must agree bit-for-bit.
    qs = [1, 1, 1, 3, 7, 8.3, 0.71, 0.70999999999999996, 0.711]
    d = _q17_micro(tmp_path, qs)
    got = small_quantity_order_revenue(spark, d).first()
    duck = _oracle_on(d)
    assert (got.n_small_lineitems, got.avg_yearly) == duck
