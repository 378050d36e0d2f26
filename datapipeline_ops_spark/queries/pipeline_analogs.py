"""Pipeline-analog queries: the reference's dataflow semantics (SURVEY.md
§2.1/§2.2) exercised relationally on the synthetic catalog.

Naming convention for the mapping:
- video manifest   → ``orders``    (o_totalprice plays total_duration /
  frame_count; o_orderkey plays file identity)
- per-frame detections → ``lineitem`` rows grouped per order
- reference faces  → ``nation`` (tiny broadcast side)
- documents/events → text / JSON surfaces

Everything is native Catalyst expressions — the only Python anywhere is the
query *builder* itself.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.functions.hashing import sql_hash64
from datapipeline_ops_spark.functions.scalar import (
    clipped_area_ratio,
    iou,
    parse_fraction,
    sec_to_label,
)
from datapipeline_ops_spark.operators.segments import plan_segments, sample_indices, summarize_segments
from datapipeline_ops_spark.operators.simjoin import similarity_argmax_join
from datapipeline_ops_spark.tables import load_table

SEG_LEN = 90000.0  # o_totalprice plays "seconds"; 900s grid scaled ×100
MIN_TAIL = 30000.0

_SEGMENT_CTE = f"""
    WITH base AS (
        SELECT o_orderkey, o_totalprice AS total,
               CAST(floor(o_totalprice / {SEG_LEN}) +
                    CASE WHEN o_totalprice - floor(o_totalprice / {SEG_LEN}) * {SEG_LEN} >= {MIN_TAIL}
                         THEN 1 ELSE 0 END AS INT) AS n_seg
        FROM orders
    ),
    seg AS (
        SELECT o_orderkey, total, CAST(t.i AS INT) AS seg_idx,
               t.i * CAST({SEG_LEN} AS DOUBLE) AS start_time,
               least(total, (t.i + 1) * CAST({SEG_LEN} AS DOUBLE)) AS end_time,
               least(total, (t.i + 1) * CAST({SEG_LEN} AS DOUBLE)) - t.i * CAST({SEG_LEN} AS DOUBLE) AS duration
        FROM base, LATERAL unnest(generate_series(0, n_seg - 1)) AS t(i)
        WHERE n_seg >= 1
    )
"""


@query(
    "segment_plan",
    oracle=_SEGMENT_CTE
    + """
    SELECT o_orderkey, seg_idx, start_time, end_time, duration,
           printf('/out/order_%d_seg%03d_%d_%d.mp4', o_orderkey, seg_idx,
                  CAST(floor(start_time) AS BIGINT), CAST(floor(duration) AS BIGINT)) AS out_path
    FROM seg
    """,
)
def segment_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-grid segment planning with kept-tail rule + path templating
    (``scene_segmenter_op.py:102-111,121-128``, ``generate_save_path_op.py:29``).

    Pure sequence+explode: row-count amplification happens executor-local
    with no shuffle — the narrow-dependency shape you want before writing
    100 TB of planned cut jobs.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.format_string("/videos/order_%d.mp4", F.col("o_orderkey")).alias("file_path"),
        F.col("o_totalprice").alias("total_duration"),
    )
    planned = plan_segments(
        o, "total_duration", "o_orderkey", SEG_LEN, MIN_TAIL, out_dir="/out", path_col="file_path"
    )
    return planned.select("o_orderkey", "seg_idx", "start_time", "end_time", "duration", "out_path")


@query(
    "segment_summary",
    oracle=_SEGMENT_CTE
    + """
    SELECT o_orderkey, count(*) AS n_segments,
           CAST(sum(CAST(round(duration*100) AS BIGINT)) AS BIGINT) / 100.0
               AS planned_duration
    FROM seg GROUP BY o_orderkey
    """,
)
def segment_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-input cut summary (``cut_ruidi.py:146-156``: file → #segments)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").alias("total_duration")
    )
    planned = plan_segments(o, "total_duration", "o_orderkey", SEG_LEN, MIN_TAIL)
    return summarize_segments(planned, "o_orderkey")


@query(
    "frame_sample_ref",
    oracle="""
    SELECT o_orderkey, CAST(t.i AS BIGINT) AS sample_idx
    FROM (SELECT o_orderkey, CAST(floor(o_totalprice) AS BIGINT) AS frames FROM orders),
         LATERAL unnest(generate_series(0, CAST(floor(frames * 0.1) AS BIGINT) - 1, 2000)) AS t(i)
    WHERE floor(frames * 0.1) > 0
    """,
)
def frame_sample_ref(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ref-pass strided sampling over the first 10% of frames
    (``video_extract_frame.py:159-161``; helper ``decord_reader_op.py:43-48``)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.floor("o_totalprice").cast("long").alias("frames")
    )
    return sample_indices(o, "frames", step=2000, start_frac=0.0, end_frac=0.1).select(
        "o_orderkey", "sample_idx"
    )


@query(
    "frame_sample_scan",
    oracle="""
    SELECT o_orderkey, CAST(t.i AS BIGINT) AS sample_idx
    FROM (SELECT o_orderkey, CAST(floor(o_totalprice) AS BIGINT) AS frames FROM orders),
         LATERAL unnest(generate_series(CAST(ceil(frames * 0.1) AS BIGINT), frames - 1, 20000)) AS t(i)
    WHERE frames > ceil(frames * 0.1)
    """,
)
def frame_sample_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-pass strided sampling over the last 90% of frames
    (``video_extract_frame.py:247-250``: scan_step over [10%, 100%))."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.floor("o_totalprice").cast("long").alias("frames")
    )
    return sample_indices(o, "frames", step=20000, start_frac=0.1, end_frac=1.0).select(
        "o_orderkey", "sample_idx"
    )


@query(
    "path_roundtrip",
    oracle="""
    SELECT p_partkey,
           '/data/' || p_brand || '/part_' || p_partkey || '.img' AS file_path,
           'part_' || p_partkey AS base_name,
           '/data/' || p_brand AS dir_name
    FROM part
    """,
)
def path_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path build + parse round trip (``generate_save_path_op.py:24-29``:
    basename/splitext/dirname; ``scene_segmenter_op.py:114``)."""
    from datapipeline_ops_spark.functions.scalar import basename_no_ext, dirname

    p = load_table(spark, sf_dir, "part")
    path = F.format_string("/data/%s/part_%d.img", F.col("p_brand"), F.col("p_partkey"))
    return p.select(
        "p_partkey",
        path.alias("file_path"),
        basename_no_ext(path).alias("base_name"),
        dirname(path).alias("dir_name"),
    )


@query(
    "fraction_parse",
    oracle="""
    SELECT l_orderkey, l_linenumber, frac,
           round(CASE WHEN TRY_CAST(string_split(frac, '/')[2] AS DOUBLE) IS NOT NULL
                       AND TRY_CAST(string_split(frac, '/')[2] AS DOUBLE) != 0
                      THEN TRY_CAST(string_split(frac, '/')[1] AS DOUBLE) /
                           TRY_CAST(string_split(frac, '/')[2] AS DOUBLE)
                      ELSE TRY_CAST(string_split(frac, '/')[1] AS DOUBLE) END, 4) AS fps
    FROM (
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_linenumber % 7 = 0 THEN 'not/a/number'
                    ELSE CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS VARCHAR) || '/' ||
                         CAST(l_linenumber + 1000 AS VARCHAR) END AS frac
        FROM lineitem
    )
    """,
)
def fraction_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction-string fps parse (``video_probe_op.py:29-34``: "30000/1001" →
    float), with malformed inputs yielding NULL (error-as-data, §1.1)."""
    li = load_table(spark, sf_dir, "lineitem")
    # floor(x*100 + 0.5), not cast: Spark cast(double→long) truncates while
    # DuckDB CAST rounds — make the cents→int conversion explicit both sides.
    frac = F.when(F.col("l_linenumber") % 7 == 0, F.lit("not/a/number")).otherwise(
        F.concat(
            F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long").cast("string"),
            F.lit("/"),
            (F.col("l_linenumber") + 1000).cast("string"),
        )
    )
    return (
        li.select("l_orderkey", "l_linenumber", frac.alias("frac"))
        .withColumn("fps", F.round(parse_fraction(F.col("frac")), 4))
    )


@query(
    "sec_to_label",
    oracle="""
    SELECT o_orderkey, secs,
           printf('%d-%02d-%02d', secs // 3600, (secs % 3600) // 60, secs % 60) AS label
    FROM (SELECT o_orderkey, (o_orderkey * 37 + 11) % 90000 AS secs FROM orders)
    """,
)
def sec_to_label_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seconds → "H-MM-SS" segment label (``scene_segmenter_op.py:76-78``)."""
    o = load_table(spark, sf_dir, "orders")
    secs = (F.col("o_orderkey") * 37 + 11) % 90000
    return o.select(
        "o_orderkey", secs.alias("secs"), sec_to_label(secs).alias("label")
    )


@query(
    "coalesce_fallback",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(coalesce(CASE WHEN l_linenumber % 3 = 0 THEN NULL ELSE l_quantity END,
                          floor(l_extendedprice) / 100.0), 2) AS resolved_duration
    FROM lineitem
    """,
)
def coalesce_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration-or-(end-start) resolution (``ffmpeg_cut_op.py:79-95``:
    accept ``duration`` or fall back to ``end_time - start_time``)."""
    li = load_table(spark, sf_dir, "lineitem")
    duration = F.when(F.col("l_linenumber") % 3 == 0, F.lit(None)).otherwise(F.col("l_quantity"))
    # floor/100 keeps the fallback off .xx5 half-boundaries: Spark rounds
    # doubles via their shortest decimal string (HALF_UP) while DuckDB rounds
    # the binary value — boundary-heavy expressions diverge between engines.
    fallback = F.floor(F.col("l_extendedprice")) / 100.0
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.coalesce(duration, fallback), 2).alias("resolved_duration"),
    )


@query(
    "json_props_extract",
    oracle="""
    SELECT event_id, user_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INT) >= 50
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction (stringified-payload parse analog,
    ``placeholders_op.py:22-25``; event props carry JSON blobs)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return e.select("event_id", "user_id", k.alias("k")).filter(F.col("k") >= 50)


@query(
    "placeholders_build",
    oracle="""
    SELECT doc_id, CAST(t.i AS INT) AS image_id, toks[CAST(t.i AS BIGINT)] AS image
    FROM (SELECT doc_id, list_slice(string_split(text, ' '), 1, 3) AS toks FROM documents),
         LATERAL unnest(generate_series(1, len(toks))) AS t(i)
    """,
)
def placeholders_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Placeholder construction with 1-based image ids
    (``placeholders_op.py:33-44``: enumerate ref images into
    {image, image_id} structs) — posexplode + index arithmetic."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.slice(F.split(F.col("text"), " "), 1, 3)
    return (
        d.select("doc_id", F.posexplode(toks).alias("pos", "image"))
        .select("doc_id", (F.col("pos") + 1).cast("int").alias("image_id"), "image")
    )


@query(
    "array_index_join",
    oracle="""
    WITH numbered AS (
        SELECT l_orderkey, l_partkey, l_quantity,
               row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS rn
        FROM lineitem
    ),
    per AS (
        SELECT l_orderkey AS o_orderkey,
               list('/img/' || l_partkey || '.jpg' ORDER BY rn) AS ref_paths,
               list_filter(list(CASE WHEN l_quantity > 40 THEN rn END ORDER BY rn),
                           x -> x IS NOT NULL) AS matched
        FROM numbered GROUP BY l_orderkey
    )
    SELECT o_orderkey, unnest(list_transform(matched, i -> ref_paths[i])) AS ref_path
    FROM per
    """,
)
def array_index_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-index equi-join (``save_pairs_op.py:46``: matched_refs indices →
    ref image paths) — `F.transform(matched, i -> paths[i])` then explode.

    The index arrays are built per group with an explicit linenumber sort so
    the result is deterministic under any partitioning.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per = (
        li.groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("l_linenumber").alias("ln"),
                        F.format_string("/img/%d.jpg", F.col("l_partkey")).alias("path"),
                        F.col("l_quantity").alias("qty"),
                    )
                )
            ).alias("items")
        )
        .select(
            "o_orderkey",
            F.transform(F.col("items"), lambda x: x.path).alias("ref_paths"),
            F.filter(
                F.transform(
                    F.col("items"), lambda x, i: F.when(x.qty > 40, i + 1)
                ),
                lambda v: v.isNotNull(),
            ).alias("matched"),
        )
    )
    return per.select(
        "o_orderkey",
        F.explode(
            F.transform(F.col("matched"), lambda i: F.element_at(F.col("ref_paths"), i))
        ).alias("ref_path"),
    )


@query(
    "iou_boxes",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(CASE WHEN ua > 0 THEN inter / ua ELSE 0.0 END, 4) AS iou
    FROM (
        SELECT l_orderkey, l_linenumber,
               greatest(0.0, least(ax1 + 20, bx1 + 25) - greatest(ax1, bx1)) *
               greatest(0.0, least(ay1 + 15, 30.0) - greatest(ay1, 5.0)) AS inter,
               20.0 * 15.0 + 25.0 * 25.0 -
               greatest(0.0, least(ax1 + 20, bx1 + 25) - greatest(ax1, bx1)) *
               greatest(0.0, least(ay1 + 15, 30.0) - greatest(ay1, 5.0)) AS ua
        FROM (
            SELECT l_orderkey, l_linenumber,
                   l_quantity AS ax1, l_discount * 100 AS ay1, l_tax * 200 AS bx1
            FROM lineitem
        )
    )
    """,
)
def iou_boxes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Box IoU as native column arithmetic (``video_extract_frame.py:112-120``)."""
    li = load_table(spark, sf_dir, "lineitem")
    ax1, ay1 = F.col("l_quantity"), F.col("l_discount") * 100
    bx1 = F.col("l_tax") * 200
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            iou(ax1, ay1, ax1 + 20, ay1 + 15, bx1, F.lit(5.0), bx1 + 25, F.lit(30.0)), 4
        ).alias("iou"),
    )


@query(
    "clipped_area_filter",
    oracle="""
    SELECT p_partkey, round(ratio, 4) AS area_ratio
    FROM (
        SELECT p_partkey,
               greatest(0.0, least(p_size * 30.0, 1000.0) - greatest(CAST(p_size AS DOUBLE), 0.0)) *
               greatest(0.0, least(p_size * 20.0, 800.0) - greatest(p_size / 2.0, 0.0)) /
               (1000.0 * 800.0) AS ratio
        FROM part
    )
    WHERE ratio <= 0.4
    """,
)
def clipped_area_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric predicate: clipped max-box area / image area <= 0.4
    (``for_high_bg_all_morelittler.py:160-169``)."""
    p = load_table(spark, sf_dir, "part")
    ratio = clipped_area_ratio(
        F.col("p_size").cast("double"),
        F.col("p_size") / 2.0,
        F.col("p_size") * 30.0,
        F.col("p_size") * 20.0,
        F.lit(1000.0),
        F.lit(800.0),
    )
    return (
        p.select("p_partkey", ratio.alias("ratio"))
        .filter(F.col("ratio") <= 0.4)
        .select("p_partkey", F.round("ratio", 4).alias("area_ratio"))
    )


@query(
    "similarity_argmax",
    oracle=f"""
    SELECT c_custkey, best_ref, best_sim FROM (
        SELECT c_custkey, n_nationkey AS best_ref, sim AS best_sim,
               row_number() OVER (PARTITION BY c_custkey ORDER BY sim DESC, n_nationkey) AS rn
        FROM (
            SELECT c_custkey, n_nationkey,
                   {sql_hash64("c_custkey || '_' || n_nationkey")} % 1000 AS sim
            FROM customer CROSS JOIN nation
        )
    ) WHERE rn = 1
    """,
)
def similarity_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast nested-loop similarity join + per-candidate argmax
    (``video_extract_frame.py:294-304``: every candidate × every ref face,
    keep the max-similarity match). Stub scorer = deterministic hash — the
    reference's model-injection seam (``similarity_op.py:8-10``) as a
    test double.
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey")
    return similarity_argmax_join(c, n, "c_custkey", "n_nationkey")


@query(
    "gauntlet_exactly_one",
    oracle="""
    SELECT o_orderkey, round(kept[1], 2) AS face_score
    FROM (
        SELECT l_orderkey AS o_orderkey,
               list_filter(list(l_discount), x -> x >= 0.08) AS kept
        FROM lineitem GROUP BY l_orderkey
    ) WHERE len(kept) = 1
    """,
)
def gauntlet_exactly_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-one-passing gauntlet on nested scores
    (``video_extract_frame.py:185-187``: faces with score >= t, require
    exactly 1) — `size(filter(arr, pred)) == 1` on a collected array."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.collect_list("l_discount").alias("scores"))
        .withColumn("kept", F.filter(F.col("scores"), lambda x: x >= 0.08))
        .filter(F.size("kept") == 1)
        .select("o_orderkey", F.round(F.element_at("kept", 1), 2).alias("face_score"))
    )


SCENE_MAX = 90000  # frames; o_totalprice plays frame_count (same scale as SEG_LEN)
SCENE_MIN = 10000


@query(
    "scene_split_recursive",
    oracle=f"""
    WITH RECURSIVE base AS (
        SELECT o_orderkey, CAST(0 AS BIGINT) AS s,
               CAST(floor(o_totalprice) AS BIGINT) AS e
        FROM orders
    ),
    split AS (
        SELECT o_orderkey, s, e FROM base
        UNION ALL
        SELECT o_orderkey,
               CASE WHEN c.side = 0 THEN s ELSE (s + e) // 2 + 1 END AS s,
               CASE WHEN c.side = 0 THEN (s + e) // 2 ELSE e END AS e
        FROM split, (SELECT unnest([0, 1]) AS side) AS c
        WHERE e - s > {SCENE_MAX}
    )
    SELECT o_orderkey,
           CAST(row_number() OVER (PARTITION BY o_orderkey ORDER BY s) - 1 AS INT) AS seg_idx,
           s AS start_frame, e AS end_frame, e - s AS duration
    FROM split
    WHERE e - s BETWEEN {SCENE_MIN} AND {SCENE_MAX}
    """,
)
def scene_split_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive halving segment planner over whole-video scenes
    (``scene_segmenter_op.py:22-41`` ``split_scene_recursively``: split at
    the integer midpoint until within [min, max]; drop under-min leaves).
    The engine unrolls the recursion as bounded array rewrites (zero
    shuffles); the oracle replays it as a recursive CTE, so the gate
    value-checks the full segment tree including the off-by-one
    ``mid + 1`` right-child starts and drop-short-leaf semantics."""
    from datapipeline_ops_spark.operators.segments import split_scenes_recursive

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.lit(0).alias("scene_start"),
        F.floor("o_totalprice").cast("long").alias("scene_end"),
    )
    planned = split_scenes_recursive(
        o, "scene_start", "scene_end", SCENE_MAX, SCENE_MIN, max_depth=8
    )
    return planned.select("o_orderkey", "seg_idx", "start_frame", "end_frame", "duration")


@query(
    "variant_props_stats",
    oracle="""
    SELECT CAST(floor(CAST(json_extract_string(props, '$.k') AS INT) / 10) AS BIGINT)
               AS k_decile,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users
    FROM events
    WHERE props IS NOT NULL
      AND json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY k_decile
    """,
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props through Spark 4's VARIANT type: ``parse_json``
    once into a Variant column, then typed path extraction with
    ``try_variant_get`` — the open-schema path for event properties that
    avoids both rigid from_json schemas and repeated string re-parsing
    (Variant stores a parsed binary form; N extractions parse once, not N
    times). Malformed/missing paths yield NULL via the try_ forms and are
    filtered, mirroring the oracle's json_extract_string semantics."""
    e = load_table(spark, sf_dir, "events")
    v = F.try_parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "int")
    return (
        e.select("user_id", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy(F.floor(F.col("k") / 10).cast("long").alias("k_decile"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )
