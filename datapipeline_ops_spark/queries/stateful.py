"""Order-dependent (stateful) operators, oracle-checked via recursive SQL.

The greedy dedup scan is the reference's one op whose result depends on row
*order* within a group (``video_extract_frame.py:202-230``). Most engines
would settle for a rows-only check here; instead the DuckDB oracle replays
the exact sequential scan as a recursive CTE — the kept-set is the CTE
state, one recursion step per row — so even this op is value-verified.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.functions.hashing import sql_hash_unit
from datapipeline_ops_spark.operators.greedy import OV_T, SIM_T, greedy_keep
from datapipeline_ops_spark.tables import load_table

_POS = sql_hash_unit("x.event_id", seed=11)
_Q = sql_hash_unit("x.event_id", seed=12)
_OV = sql_hash_unit("x.event_id", seed=13)

_GREEDY_ORACLE = f"""
WITH RECURSIVE
r AS (SELECT user_id, event_id,
        {sql_hash_unit("event_id", seed=11)} AS pos,
        {sql_hash_unit("event_id", seed=12)} AS q,
        {sql_hash_unit("event_id", seed=13)} AS ov,
        row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      FROM events),
n AS (SELECT user_id, max(rn) AS maxrn FROM r GROUP BY user_id),
st AS (
  SELECT user_id, 0 AS rn,
         CAST([] AS STRUCT(event_id BIGINT, pos DOUBLE, q DOUBLE, ov DOUBLE)[]) AS kept
  FROM n
  UNION ALL
  SELECT s.user_id, x.rn,
    CASE
      WHEN len(s.kept) = 0
        THEN [{{'event_id': x.event_id, 'pos': x.pos, 'q': x.q, 'ov': x.ov}}]
      WHEN list_max(list_transform(s.kept, k -> 1 - abs(k.pos - x.pos))) >= {SIM_T} THEN
        CASE WHEN x.q > list_filter(s.kept, k -> 1 - abs(k.pos - x.pos) =
                  list_max(list_transform(s.kept, k2 -> 1 - abs(k2.pos - x.pos))))[1].q
             THEN list_transform(s.kept, k -> CASE WHEN k.event_id =
                    list_filter(s.kept, k3 -> 1 - abs(k3.pos - x.pos) =
                      list_max(list_transform(s.kept, k2 -> 1 - abs(k2.pos - x.pos))))[1].event_id
                  THEN {{'event_id': x.event_id, 'pos': x.pos, 'q': x.q, 'ov': x.ov}}
                  ELSE k END)
             ELSE s.kept END
      WHEN list_max(list_transform(s.kept, k -> 1 - abs(k.ov - x.ov))) >= {OV_T}
        THEN s.kept
      ELSE list_append(s.kept, {{'event_id': x.event_id, 'pos': x.pos, 'q': x.q, 'ov': x.ov}})
    END
  FROM st s JOIN r x ON x.user_id = s.user_id AND x.rn = s.rn + 1
)
SELECT st.user_id AS user_id, u.event_id AS event_id
FROM st JOIN n ON st.user_id = n.user_id AND st.rn = n.maxrn,
     LATERAL (SELECT unnest(kept, recursive:=true)) AS u
"""


_COGROUP_ORACLE = """
WITH c AS (SELECT user_id, epoch_us(ts) AS t FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, epoch_us(ts) AS t, value FROM events WHERE event_type = 'purchase'),
cu AS (SELECT user_id, count(*) AS n_clicks, min(t) AS first_t FROM c GROUP BY user_id),
pu AS (SELECT user_id, count(*) AS n_purchases FROM p GROUP BY user_id),
attr AS (
    SELECT p.user_id,
           sum(CASE WHEN cu.first_t IS NOT NULL AND p.t >= cu.first_t
                    THEN 1 ELSE 0 END) AS n_attributed,
           sum(CASE WHEN cu.first_t IS NOT NULL AND p.t >= cu.first_t
                    THEN p.value ELSE 0 END) AS av
    FROM p LEFT JOIN cu ON p.user_id = cu.user_id GROUP BY p.user_id
)
SELECT coalesce(cu.user_id, pu.user_id) AS user_id,
       CAST(coalesce(n_clicks, 0) AS BIGINT) AS n_clicks,
       CAST(coalesce(n_purchases, 0) AS BIGINT) AS n_purchases,
       CAST(coalesce(n_attributed, 0) AS BIGINT) AS n_attributed,
       round(coalesce(av, 0), 4) AS attributed_value
FROM cu FULL JOIN pu ON cu.user_id = pu.user_id
LEFT JOIN attr ON coalesce(cu.user_id, pu.user_id) = attr.user_id
"""


@query("cogroup_click_purchase_stats", oracle=_COGROUP_ORACLE)
def cogroup_click_purchase_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user alignment of two event streams via COGROUPED Arrow UDF
    (``groupBy().cogroup().applyInPandas``): each user's clicks and
    purchases arrive as two pandas frames in one call — the natural shape
    for merge-scan logic (attribution, funnel alignment, session stitching)
    that would otherwise need a join + re-group. Here: purchase counts as
    attributed if the user clicked at or before its timestamp.

    Scale shape — the COARSE-KEY cogroup pattern: grouping by raw user_id
    pays the per-call Python/Arrow overhead (~ms) once per KEY, which is
    the real cost at 1e9 users (measured 6.4s for 1.5k users at sf0.1 —
    all overhead, no compute). Instead both sides cogroup on a HASH BUCKET
    of the key and the per-user logic runs VECTORIZED inside pandas
    (groupby/merge over the whole bucket), so the per-call overhead
    amortizes across bucket_size users and each call does real columnar
    work. One co-partitioned shuffle on the bucket for both sides. The
    oracle replays the semantics relationally (first-click join), proving
    the vectorized form equals the declarative one."""
    import pandas as pd

    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32")) * 4
    e = load_table(spark, sf_dir, "events")
    # input columns are named uid/t/value, DISJOINT from the output schema:
    # when a cogroup input column shares a name with an output-schema column
    # (here: user_id), FlatMapCoGroupsInPandas' attribute dedup drops it
    # from one side's pandas frame (observed on the right side) — renaming
    # the inputs sidesteps the collision entirely.
    bkt = (F.col("user_id") % n_buckets).alias("bkt")
    clicks = e.filter(F.col("event_type") == "click").select(
        bkt, F.col("user_id").alias("uid"), F.unix_micros("ts").alias("t")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        bkt, F.col("user_id").alias("uid"), F.unix_micros("ts").alias("t"), "value"
    )

    def stats(key: tuple, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        cl = left.groupby("uid")["t"].agg(["size", "min"])
        cl.columns = ["n_clicks", "first_t"]
        if len(right):
            pr = right.merge(cl["first_t"], left_on="uid", right_index=True, how="left")
            attr = pr["t"] >= pr["first_t"]  # NaN first_t compares False
            pr["av"] = pr["value"].where(attr, 0.0)
            pu = pd.DataFrame(
                {
                    "n_purchases": pr.groupby("uid")["t"].size(),
                    "n_attributed": attr.groupby(pr["uid"]).sum(),
                    "attributed_value": pr.groupby("uid")["av"].sum(),
                }
            )
        else:
            pu = pd.DataFrame(
                columns=["n_purchases", "n_attributed", "attributed_value"]
            )
        out = cl[["n_clicks"]].join(pu, how="outer").fillna(0).reset_index()
        return pd.DataFrame(
            {
                "user_id": out["uid"].astype("int64"),
                "n_clicks": out["n_clicks"].astype("int64"),
                "n_purchases": out["n_purchases"].astype("int64"),
                "n_attributed": out["n_attributed"].astype("int64"),
                "attributed_value": out["attributed_value"].astype("float64"),
            }
        )

    out = (
        clicks.groupBy("bkt")
        .cogroup(purchases.groupBy("bkt"))
        .applyInPandas(
            stats,
            schema="user_id bigint, n_clicks bigint, n_purchases bigint, "
            "n_attributed bigint, attributed_value double",
        )
    )
    return out.withColumn("attributed_value", F.round("attributed_value", 4))


@query("greedy_dedup_keep", oracle=_GREEDY_ORACLE)
def greedy_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy keep/replace/drop dedup scan per user over events, in
    event_id order — `applyInPandas`: sequential within a group (the
    reference's exact semantics), parallel across the millions of groups a
    real corpus has. Stub md5 scores stand in for the GPU models at the
    same injection seam the reference uses."""
    events = load_table(spark, sf_dir, "events")
    return greedy_keep(events, group_col="user_id", order_col="event_id")
