"""Cross-engine boundary pins for the round-8 seams, in the
test_boundary_semantics style: build adversarial micro-tables, run the
registered Spark query AND its DuckDB oracle on the same parquet, and
assert exact agreement on the degenerate paths the full-size gates never
exercise — exhausted Kaplan-Meier risk sets, all-tied Mann-Whitney samples,
single-value RFM quartiles, and tie-revenue Elo quarters."""

import duckdb
import pytest

from datapipeline_ops_spark.queries import QUERIES


def _write(tmp_path, table, select_sql):
    con = duckdb.connect()
    con.execute(
        f"COPY ({select_sql}) TO '{tmp_path}/{table}.parquet' (FORMAT PARQUET)"
    )


def _oracle(tmp_path, name, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{tmp_path}/{t}.parquet'")
    return con.execute(QUERIES[name].oracle).fetchall()


def test_km_exhausted_risk_set(spark, tmp_path):
    # Every user converts on the same day -> at the last spine step
    # at_risk == d_t, factor == 0, survival must be EXACTLY 0.0 in both
    # engines (the ln-argument guard path), never -inf/NaN.
    _write(
        tmp_path,
        "events",
        """
        SELECT CAST(u AS BIGINT) AS event_id,
               TIMESTAMP '2024-01-01' + INTERVAL (CASE WHEN k = 0 THEN 0
                                                  ELSE 3 END) DAY AS ts,
               CAST(u AS BIGINT) AS user_id,
               CASE WHEN k = 0 THEN 'view' ELSE 'purchase' END AS event_type,
               CAST(1.0 AS DOUBLE) AS value, '{}' AS props
        FROM range(4) t(u), range(2) s(k)
        """,
    )
    got = sorted(
        (r.t, r.at_risk, r.n_events, r.survival)
        for r in QUERIES["kaplan_meier_conversion"].fn(spark, str(tmp_path)).collect()
    )
    want = sorted(
        (t, ar, ev, sv)
        for t, ar, ev, _c, sv in _oracle(tmp_path, "kaplan_meier_conversion", ["events"])
    )
    assert got == want
    assert got[-1][3] == 0.0  # everyone converted at t=3: survival hits zero


def test_mann_whitney_all_ties(spark, tmp_path):
    # All values identical across both groups -> one tie group, variance 0,
    # z must be NULL (not a crash, not +-inf) in BOTH engines.
    _write(
        tmp_path,
        "events",
        """
        SELECT CAST(i AS BIGINT) AS event_id,
               TIMESTAMP '2024-01-01' AS ts, CAST(i AS BIGINT) AS user_id,
               CASE WHEN i % 2 = 0 THEN 'purchase' ELSE 'view' END
                   AS event_type,
               CAST(7.25 AS DOUBLE) AS value, '{}' AS props
        FROM range(10) t(i)
        """,
    )
    row = QUERIES["mann_whitney_value_shift"].fn(spark, str(tmp_path)).first()
    (o_n1, o_n2, o_u1, o_z), = _oracle(
        tmp_path, "mann_whitney_value_shift", ["events"]
    )
    assert (row.n1, row.n2, row.u1, row.z_score) == (o_n1, o_n2, o_u1, o_z)
    assert row.z_score is None
    assert row.u1 == pytest.approx(row.n1 * row.n2 / 2.0)  # all-tie midpoint


def test_rfm_single_value_per_dimension(spark, tmp_path):
    # Every customer identical on R, F, and M -> cum_before is 0 for all,
    # so every customer lands in quartile 1 on every axis: ONE code, 111.
    _write(
        tmp_path,
        "orders",
        """
        SELECT CAST(i AS BIGINT) AS o_orderkey, CAST(i AS BIGINT) AS o_custkey,
               'O' AS o_orderstatus, CAST(100.00 AS DOUBLE) AS o_totalprice,
               TIMESTAMP '2000-06-01' AS o_orderdate,
               '1-URGENT' AS o_orderpriority
        FROM range(8) t(i)
        """,
    )
    rows = QUERIES["rfm_segmentation"].fn(spark, str(tmp_path)).collect()
    want = _oracle(tmp_path, "rfm_segmentation", ["orders"])
    assert [(r.rfm_code, r.n_customers, r.avg_spend) for r in rows] == want
    assert len(rows) == 1 and rows[0].rfm_code == 111 and rows[0].n_customers == 8


def test_elo_tie_revenue_quarters_produce_no_matches(spark, tmp_path):
    # Two nations with IDENTICAL quarterly revenue -> every pairing is a
    # tie, ties are excluded, so both keep the start rating and rank by
    # name. Pins the rev_a <> rev_b exclusion in both engines.
    _write(
        tmp_path,
        "lineitem",
        """
        SELECT CAST(i AS BIGINT) AS l_orderkey, CAST(1 AS BIGINT) AS l_partkey,
               CAST(i % 2 + 1 AS BIGINT) AS l_suppkey, 1 AS l_linenumber,
               CAST(5 AS DOUBLE) AS l_quantity,
               CAST(100.00 AS DOUBLE) AS l_extendedprice,
               CAST(0.00 AS DOUBLE) AS l_discount, CAST(0.0 AS DOUBLE) AS l_tax,
               'N' AS l_returnflag, 'O' AS l_linestatus,
               TIMESTAMP '1996-02-01' AS l_shipdate
        FROM range(4) t(i)
        """,
    )
    _write(
        tmp_path,
        "supplier",
        """
        SELECT CAST(i + 1 AS BIGINT) AS s_suppkey,
               'Supplier#' || i AS s_name,
               CAST(i AS INT) AS s_nationkey, CAST(0.0 AS DOUBLE) AS s_acctbal
        FROM range(2) t(i)
        """,
    )
    _write(
        tmp_path,
        "nation",
        """
        SELECT CAST(i AS INT) AS n_nationkey,
               CASE WHEN i = 0 THEN 'ALPHA' ELSE 'BETA' END AS n_name,
               CAST(0 AS INT) AS n_regionkey
        FROM range(2) t(i)
        """,
    )
    rows = QUERIES["elo_rating_periods"].fn(spark, str(tmp_path)).collect()
    want = _oracle(
        tmp_path, "elo_rating_periods", ["lineitem", "supplier", "nation"]
    )
    got = [tuple(r) for r in rows]
    assert got == [tuple(w) for w in want]
    assert all(r.rating_mpts == 1_500_000 and r.n_matches == 0 for r in rows)
    assert [r.nation for r in rows] == ["ALPHA", "BETA"]  # name tiebreak
