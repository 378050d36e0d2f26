"""Elo ratings over quarterly rating periods — the ORDER-DEPENDENT rating
fold (like FIDE's rating periods), complementing the order-independent
Bradley-Terry fit in search_rank.py.

Players are supplier nations; each quarter every nation pair with unequal
quarterly revenue plays one 'match' (higher exact-integer revenue wins).
Ratings update once per period from the period-START ratings (simultaneous
update), so the result depends on period ORDER — the property that makes
this the canonical iterative-state query shape alongside greedy dedup.

Cross-engine determinism:
- Match outcomes compare exact BIGINT revenue units — no float boundary.
- Ratings live in integer MILLIPOINTS; each match's delta is
  ``floor(32*(S - E)*1000 + 0.5)`` — floor (never round) so no
  half-to-even ambiguity — and per-period deltas are INTEGER sums, so
  state never accumulates float error.
- E = 1/(1+10^((Rb-Ra)/400000)) is evaluated by Python on the Spark side
  (the fold runs on the driver over the bounded match list) and by DuckDB
  pow() in the oracle; both bind the platform's correctly-rounded libm pow
  (verified bit-equal over 20k samples).
- The oracle UNROLLS the 28 quarters as MATERIALIZED CTE stages (the
  greedy-dedup discipline — DuckDB inlines non-materialized multi-ref CTEs
  exponentially).

Scale: the per-(nation, quarter) revenue table is |nations| x 28; the match
list is <= |nations|^2/2 x 28 (8.4k rows for 25 nations) — bounded by the
arm vocabulary and the FIXED calendar, never by fact size, so the driver
fold is a constant-size action no matter how many lineitems feed it (the
same bounded-collect contract as the union-find CC driver step).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.tables import load_table, local_frame

ELO_K = 32.0
ELO_START_MPTS = 1_500_000  # 1500.000 points in millipoints
_N_QUARTERS = 28  # 1995Q1 .. 2001Q4 — fixed by the testdata calendar

_SQL_REV_UNITS = (
    "CAST(round(l_extendedprice*100) AS BIGINT)"
    " * (100 - CAST(round(l_discount*100) AS BIGINT))"
)


def _oracle() -> str:
    head = f"""
    WITH qrev AS MATERIALIZED (
        SELECT n.n_name AS nation,
               (year(l.l_shipdate) - 1995) * 4 + quarter(l.l_shipdate) - 1
                   AS qi,
               CAST(sum({_SQL_REV_UNITS}) AS BIGINT) AS rev
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE (year(l.l_shipdate) - 1995) * 4 + quarter(l.l_shipdate) - 1
              BETWEEN 0 AND {_N_QUARTERS - 1}
        GROUP BY n.n_name, (year(l.l_shipdate) - 1995) * 4
                           + quarter(l.l_shipdate) - 1
    ),
    matches AS MATERIALIZED (
        SELECT a.qi, a.nation AS na, b.nation AS nb,
               CASE WHEN a.rev > b.rev THEN 1 ELSE 0 END AS a_wins
        FROM qrev a JOIN qrev b
          ON b.qi = a.qi AND a.nation < b.nation AND a.rev <> b.rev
    ),
    wstats AS MATERIALIZED (
        SELECT nation, CAST(sum(win) AS BIGINT) AS wins,
               CAST(count(*) AS BIGINT) AS n_matches
        FROM (
            SELECT na AS nation, a_wins AS win FROM matches
            UNION ALL SELECT nb, 1 - a_wins FROM matches
        ) GROUP BY nation
    ),
    s0 AS MATERIALIZED (
        SELECT DISTINCT nation, CAST({ELO_START_MPTS} AS BIGINT) AS r
        FROM qrev
    )"""
    stages = []
    for k in range(1, _N_QUARTERS + 1):
        qi = k - 1
        e = (
            "1.0/(1.0 + pow(10.0,"
            f" CAST(rb.r - ra.r AS DOUBLE)/400000.0))"
        )
        stages.append(f"""
    d{k} AS MATERIALIZED (
        SELECT nation, CAST(sum(dm) AS BIGINT) AS delta FROM (
            SELECT m.na AS nation,
                   CAST(floor({ELO_K}*(CAST(m.a_wins AS DOUBLE) - {e})*1000.0
                              + 0.5) AS BIGINT) AS dm
            FROM matches m
            JOIN s{k-1} ra ON ra.nation = m.na
            JOIN s{k-1} rb ON rb.nation = m.nb
            WHERE m.qi = {qi}
            UNION ALL
            SELECT m.nb,
                   CAST(floor({ELO_K}*((1.0 - CAST(m.a_wins AS DOUBLE))
                                       - (1.0 - {e}))*1000.0
                              + 0.5) AS BIGINT)
            FROM matches m
            JOIN s{k-1} ra ON ra.nation = m.na
            JOIN s{k-1} rb ON rb.nation = m.nb
            WHERE m.qi = {qi}
        ) GROUP BY nation
    ),
    s{k} AS MATERIALIZED (
        SELECT s.nation, s.r + coalesce(d.delta, 0) AS r
        FROM s{k-1} s LEFT JOIN d{k} d ON d.nation = s.nation
    )""")
    tail = f"""
    SELECT s.nation, s.r AS rating_mpts,
           CAST(s.r AS DOUBLE) / 1000.0 AS rating,
           coalesce(w.wins, 0) AS wins,
           coalesce(w.n_matches, 0) AS n_matches,
           CAST(row_number() OVER (ORDER BY s.r DESC, s.nation) AS INT) AS rank
    FROM s{_N_QUARTERS} s
    LEFT JOIN wstats w ON w.nation = s.nation
    """
    return head + "," + ",".join(stages) + tail


_SCHEMA = StructType(
    [
        StructField("nation", StringType()),
        StructField("rating_mpts", LongType()),
        StructField("rating", DoubleType()),
        StructField("wins", LongType()),
        StructField("n_matches", LongType()),
        StructField("rank", IntegerType()),
    ]
)


@query("elo_rating_periods", oracle=_oracle())
def elo_rating_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarterly Elo ratings of supplier nations by revenue matches — see
    module docstring for the determinism and scale contract. The Spark
    side aggregates the bounded match list distributively, collects it
    (|nations|^2/2 x 28 rows max), and folds the rating periods in driver
    Python — iterative 25-row state is driver work, exactly like the CC
    union-find step; the oracle unrolls the same 28 periods as
    MATERIALIZED CTE stages."""
    # Out-of-calendar ship dates are excluded identically in both engines
    # (the oracle's qrev CTE carries the same BETWEEN) — otherwise the
    # driver fold would iterate a qi the oracle's 28 unrolled stages never
    # see, silently diverging instead of failing loudly.
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_suppkey",
            "l_extendedprice",
            "l_discount",
            (
                (F.year("l_shipdate") - 1995) * 4 + F.quarter("l_shipdate") - 1
            ).alias("qi"),
        )
        .filter(F.col("qi").between(0, _N_QUARTERS - 1))
    )
    li = li.select(
        "l_suppkey",
        "qi",
        (
            F.round(F.col("l_extendedprice") * 100, 0).cast("long")
            * (F.lit(100) - F.round(F.col("l_discount") * 100, 0).cast("long"))
        ).alias("units"),
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    qrev = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"), "qi")
        .agg(F.sum("units").alias("rev"))
    )
    a = qrev.select(
        "qi", F.col("nation").alias("na"), F.col("rev").alias("rev_a")
    )
    b = qrev.select(
        F.col("qi").alias("qi_b"),
        F.col("nation").alias("nb"),
        F.col("rev").alias("rev_b"),
    )
    matches = (
        a.join(
            b,
            (F.col("qi") == F.col("qi_b"))
            & (F.col("na") < F.col("nb"))
            & (F.col("rev_a") != F.col("rev_b")),
        )
        .select(
            "qi",
            "na",
            "nb",
            F.when(F.col("rev_a") > F.col("rev_b"), 1).otherwise(0).alias("a_wins"),
        )
        .collect()  # bounded: |nations|^2/2 x 28 quarters
    )
    nations = sorted(
        {r.na for r in matches}
        | {r.nb for r in matches}
        | {r.nation for r in qrev.select("nation").distinct().collect()}
    )
    ratings = {x: ELO_START_MPTS for x in nations}
    wins: dict[str, int] = {x: 0 for x in nations}
    games: dict[str, int] = {x: 0 for x in nations}
    by_q: dict[int, list] = {}
    for m in matches:
        by_q.setdefault(m.qi, []).append(m)
        wins[m.na] += m.a_wins
        wins[m.nb] += 1 - m.a_wins
        games[m.na] += 1
        games[m.nb] += 1
    for qi in sorted(by_q):
        deltas: dict[str, int] = {}
        for m in by_q[qi]:
            ra, rb = ratings[m.na], ratings[m.nb]
            e_a = 1.0 / (1.0 + 10.0 ** (float(rb - ra) / 400000.0))
            d_a = ELO_K * (float(m.a_wins) - e_a)
            d_b = ELO_K * ((1.0 - float(m.a_wins)) - (1.0 - e_a))
            deltas[m.na] = deltas.get(m.na, 0) + math.floor(d_a * 1000.0 + 0.5)
            deltas[m.nb] = deltas.get(m.nb, 0) + math.floor(d_b * 1000.0 + 0.5)
        for nation, d in deltas.items():
            ratings[nation] += d
    ranked = sorted(nations, key=lambda x: (-ratings[x], x))
    rows = [
        (
            x,
            ratings[x],
            ratings[x] / 1000.0,
            wins[x],
            games[x],
            i + 1,
        )
        for i, x in enumerate(ranked)
    ]
    return local_frame(spark, rows, _SCHEMA)
