"""End-to-end pipeline compositions — the reference's three driver programs
(SURVEY.md §3) rebuilt as ``Op``/``Pipeline`` chains over the synthetic
catalog, each executing as ONE Catalyst plan.

This is the structural upgrade over the reference: its drivers call opaque
``op.predict(item)`` steps in a Python loop, so nothing can be optimized
across step boundaries; here every step is a lazy DataFrame transform, the
chain composes into a single logical plan, and Catalyst prunes/pushes/
reorders through the whole pipeline. The manifest conventions match
queries/pipeline_analogs.py (orders ≙ video manifest, o_totalprice ≙
duration seconds ×100).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from datapipeline_ops_spark.core.op import Pipeline, op
from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.functions.hashing import hash_unit, sql_hash64, sql_hash_unit
from datapipeline_ops_spark.functions.text import sql_shingles, sql_tokens
from datapipeline_ops_spark.operators.segments import plan_segments
from datapipeline_ops_spark.tables import load_table

SEG_LEN = 90000.0
MIN_TAIL = 30000.0
MIN_DURATION = 60000.0  # duration filter before cutting (cut_30min.py:99-103)
CUT_FAIL_SEED = 31
CUT_FAIL_RATE = 0.05

# ---------------------------------------------------------------------------
# cut_30min analog: probe -> duration filter -> segment plan -> cut (stub,
# error-as-data) -> per-video summary.  Reference: pipeline/cut_30min.py
# 87-110 (worker), scene_segmenter_op.py:102-151, ffmpeg_cut_op.py:92-108.
# ---------------------------------------------------------------------------


@op("probe", requires=("o_orderkey",), produces=("file_path", "total_duration"))
def probe_op(df: DataFrame) -> DataFrame:
    """VideoProbeOp analog (``video_probe_op.py:39-52``): enrich the manifest
    with media metadata (here derived from the catalog instead of ffprobe)."""
    return df.withColumn(
        "file_path", F.format_string("/videos/order_%d.mp4", F.col("o_orderkey"))
    ).withColumn("total_duration", F.col("o_totalprice"))


@op("duration_filter", requires=("total_duration",))
def duration_filter_op(df: DataFrame) -> DataFrame:
    """Cheap-first predicate (``cut_30min.py:99-103``): drop short inputs
    BEFORE any expensive per-segment work; Catalyst pushes this into the
    parquet scan."""
    return df.filter(F.col("total_duration") >= MIN_DURATION)


@op("plan_segments", requires=("total_duration", "o_orderkey"), produces=("seg_idx", "out_path"))
def plan_segments_op(df: DataFrame) -> DataFrame:
    """SceneSegmenterOp planning (``scene_segmenter_op.py:102-128``)."""
    return plan_segments(
        df, "total_duration", "o_orderkey", SEG_LEN, MIN_TAIL, out_dir="/out", path_col="file_path"
    )


@op("cut", requires=("out_path",), produces=("cut_status", "cut_error"))
def cut_op(df: DataFrame) -> DataFrame:
    """FFmpegCutOp analog (``ffmpeg_cut_op.py:92-108``): the subprocess is a
    side effect executed per partition in production; its *outcome contract*
    is what the engine models — status 0/1 plus a nullable error column
    (error-as-data, never executor exceptions). A deterministic hash plays
    the flaky-subprocess dice so the failure path is exercised."""
    fail = hash_unit(F.col("out_path"), seed=CUT_FAIL_SEED) < CUT_FAIL_RATE
    return df.withColumn("cut_status", F.when(fail, 0).otherwise(1)).withColumn(
        "cut_error", F.when(fail, F.lit("ffmpeg exited 1")).otherwise(F.lit(None).cast("string"))
    )


CUT_PIPELINE = (
    Pipeline().then(probe_op).then(duration_filter_op).then(plan_segments_op).then(cut_op)
)


@query(
    "pipeline_cut_e2e",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey, o_totalprice AS total,
               CAST(floor(o_totalprice / {SEG_LEN}) +
                    CASE WHEN o_totalprice - floor(o_totalprice / {SEG_LEN}) * {SEG_LEN} >= {MIN_TAIL}
                         THEN 1 ELSE 0 END AS INT) AS n_seg
        FROM orders WHERE o_totalprice >= {MIN_DURATION}
    ),
    seg AS (
        SELECT o_orderkey, total, CAST(t.i AS INT) AS seg_idx,
               t.i * CAST({SEG_LEN} AS DOUBLE) AS start_time,
               least(total, (t.i + 1) * CAST({SEG_LEN} AS DOUBLE))
                   - t.i * CAST({SEG_LEN} AS DOUBLE) AS duration
        FROM base, LATERAL unnest(generate_series(0, n_seg - 1)) AS t(i)
        WHERE n_seg >= 1
    ),
    cut AS (
        SELECT o_orderkey,
               printf('/out/order_%d_seg%03d_%d_%d.mp4', o_orderkey, seg_idx,
                      CAST(floor(start_time) AS BIGINT), CAST(floor(duration) AS BIGINT)) AS out_path
        FROM seg
    )
    SELECT o_orderkey, count(*) AS n_segments,
           CAST(sum(CASE WHEN {sql_hash_unit("out_path", seed=CUT_FAIL_SEED)} < {CUT_FAIL_RATE}
                         THEN 0 ELSE 1 END) AS BIGINT) AS n_ok,
           CAST(sum(CASE WHEN {sql_hash_unit("out_path", seed=CUT_FAIL_SEED)} < {CUT_FAIL_RATE}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_failed
    FROM cut GROUP BY o_orderkey
    """,
)
def pipeline_cut_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cut_30min end-to-end: probe → filter → plan → cut → summary, one
    Catalyst plan (``cut_30min.py:87-110`` + ``cut_ruidi.py:146-156``).
    The summary counts ok/failed cuts per input — the reference's
    ray-log CSV reshaped as a proper aggregate."""
    manifest = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    cut = CUT_PIPELINE.run(manifest)
    return cut.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("cut_status").cast("long").alias("n_ok"),
        F.sum(1 - F.col("cut_status")).cast("long").alias("n_failed"),
    )


# ---------------------------------------------------------------------------
# caption analog: placeholders -> prompt -> generate (stub) -> output record.
# Reference: pipeline/caption.py:58-88, placeholders_op.py:17-49,
# generate_text_op.py:22-32, save_output_op.py:18-26.
# ---------------------------------------------------------------------------

QUESTION_TEXT = "Describe the subject shown in the reference images."


@op("placeholders", requires=("doc_id",), produces=("input_images", "output_image"))
def placeholders_op(df: DataFrame) -> DataFrame:
    """PlaceholdersOp analog: ref-image list + target path per record."""
    return df.withColumn(
        "input_images",
        F.array(
            F.format_string("/imgs/%d_ref_0.jpg", F.col("doc_id")),
            F.format_string("/imgs/%d_ref_1.jpg", F.col("doc_id")),
        ),
    ).withColumn("output_image", F.format_string("/imgs/%d_gt.jpg", F.col("doc_id")))


@op("prompt", requires=("input_images",), produces=("raw_text_prompt",))
def prompt_op(df: DataFrame) -> DataFrame:
    """VisionInputsOp's text-assembly half (``vision_inputs_op.py:31-42``):
    chat-template string from placeholders + fixed question."""
    return df.withColumn(
        "raw_text_prompt",
        F.concat(
            F.lit("<|user|>"),
            F.concat_ws("", F.transform(F.col("input_images"), lambda p: F.concat(F.lit("<img:"), p, F.lit(">")))),
            F.lit(QUESTION_TEXT),
            F.lit("<|assistant|>"),
        ),
    )


@op("generate", requires=("raw_text_prompt",), produces=("output_text",))
def generate_op(df: DataFrame) -> DataFrame:
    """GenerateOp stub: deterministic 'caption' derived from the prompt hash
    (the real Qwen-VL call is a registry-model pandas UDF — see
    operators/inference.py; the stub keeps the e2e pipeline value-checkable)."""
    return df.withColumn(
        "output_text",
        F.concat(F.lit("caption-"), F.substring(F.md5(F.col("raw_text_prompt")), 1, 8)),
    )


@op("record", requires=("output_text", "input_images", "output_image"), produces=("record",))
def record_op(df: DataFrame) -> DataFrame:
    """SaveOutputOp record shape (``save_output_op.py:18-23``), as to_json."""
    return df.withColumn(
        "record",
        F.to_json(
            F.struct(
                F.lit("subject_driven").alias("task_type"),
                F.col("output_text").alias("instruction"),
                F.col("input_images").alias("input_images"),
                F.col("output_image").alias("output_image"),
            )
        ),
    )


CAPTION_PIPELINE = Pipeline().then(placeholders_op).then(prompt_op).then(generate_op).then(record_op)


@query(
    "pipeline_caption_e2e",
    oracle=f"""
    WITH ph AS (
        SELECT doc_id,
               ['/imgs/' || CAST(doc_id AS VARCHAR) || '_ref_0.jpg',
                '/imgs/' || CAST(doc_id AS VARCHAR) || '_ref_1.jpg'] AS input_images,
               '/imgs/' || CAST(doc_id AS VARCHAR) || '_gt.jpg' AS output_image
        FROM documents WHERE lang = 'en'
    ),
    pr AS (
        SELECT *, '<|user|>' ||
               list_aggregate(list_transform(input_images, p -> '<img:' || p || '>'), 'string_agg', '')
               || '{QUESTION_TEXT}' || '<|assistant|>' AS raw_text_prompt
        FROM ph
    ),
    gen AS (SELECT *, 'caption-' || substr(md5(raw_text_prompt), 1, 8) AS output_text FROM pr)
    SELECT doc_id,
           to_json(struct_pack(task_type := 'subject_driven',
                               instruction := output_text,
                               input_images := input_images,
                               output_image := output_image)) AS record
    FROM gen
    """,
)
def pipeline_caption_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """caption end-to-end: placeholders → prompt assembly → generate (stub)
    → JSONL record, one Catalyst plan; record strings are byte-identical
    across engines. The lang='en' prefilter lands in the parquet scan —
    pushdown through the whole four-op chain."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en").select("doc_id")
    return CAPTION_PIPELINE.run(docs).select("doc_id", "record")


# ---------------------------------------------------------------------------
# video_extract_frame analog: candidate scan -> gauntlet -> frame score ->
# bin argmax -> ordered selection.  Reference: video_extract_frame.py:235-321.
# ---------------------------------------------------------------------------

# strides scaled x400 like frame_sample_scan (o_totalprice plays frame count)
SCAN_STEP = 20000
BIN_SIZE = 60000
Q_SEED, S_SEED = 41, 42
Q_THRESH, SIM_LO, SIM_HI = 0.3, 0.2, 0.95


@op("frame_scan", requires=("o_orderkey", "total_frame"), produces=("frame_idx",))
def frame_scan_op(df: DataFrame) -> DataFrame:
    """Candidate scan over the last 90% of frames, reference stride 50
    (``video_extract_frame.py:247-250``).

    The manifest is spread across cores FIRST (explicit count — AQE would
    coalesce a numberless repartition): the explode amplifies each manifest
    row ~20x and the downstream gauntlet hashes every frame row, so
    whatever parallelism the scan lacks (one small parquet file = one
    partition) must be created before the amplification, not after."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    spread = df.repartition(n, F.col("o_orderkey"))
    first = F.ceil(F.col("total_frame") * 0.1).cast("long")
    return spread.withColumn(
        "frame_idx",
        F.explode(F.sequence(first, F.col("total_frame") - 1, F.lit(SCAN_STEP))),
    )


@op("gauntlet", requires=("frame_idx",), produces=("qscore", "sim"))
def gauntlet_op(df: DataFrame) -> DataFrame:
    """Per-frame gauntlet (``video_extract_frame.py:266-305``): quality
    threshold + similarity band, scores from the stub-model seam."""
    key = F.concat_ws(":", F.col("o_orderkey"), F.col("frame_idx"))
    return (
        df.withColumn("qscore", hash_unit(key, seed=Q_SEED))
        .withColumn("sim", hash_unit(key, seed=S_SEED))
        .filter((F.col("qscore") > Q_THRESH) & F.col("sim").between(SIM_LO, SIM_HI))
    )


@op("frame_score", requires=("qscore", "sim"), produces=("combined_score",))
def frame_score_op(df: DataFrame) -> DataFrame:
    """combined = (avg quality + avg sim) / 2 (``video_extract_frame.py:307-309``)."""
    return df.withColumn("combined_score", (F.col("qscore") + F.col("sim")) / 2)


@op("bin_argmax", requires=("frame_idx", "combined_score"), produces=("bin",))
def bin_argmax_op(df: DataFrame) -> DataFrame:
    """Top-1 per 150-frame bin (``video_extract_frame.py:312-320``), then
    frame-order output (``:321``)."""
    binned = df.withColumn("bin", F.floor(F.col("frame_idx") / BIN_SIZE))
    w = Window.partitionBy("o_orderkey", "bin").orderBy(
        F.desc("combined_score"), F.asc("frame_idx")
    )
    return binned.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")


MINING_PIPELINE = (
    Pipeline().then(frame_scan_op).then(gauntlet_op).then(frame_score_op).then(bin_argmax_op)
)


@query(
    "pipeline_frame_mining_e2e",
    oracle=f"""
    WITH manifest AS (
        SELECT o_orderkey, CAST(floor(o_totalprice) AS BIGINT) AS total_frame
        FROM orders WHERE o_totalprice >= {MIN_DURATION}
    ),
    frames AS (
        SELECT o_orderkey, t.f AS frame_idx
        FROM manifest,
             LATERAL unnest(generate_series(CAST(ceil(total_frame * 0.1) AS BIGINT),
                                            total_frame - 1, {SCAN_STEP})) AS t(f)
    ),
    scored AS (
        SELECT o_orderkey, frame_idx,
               {sql_hash_unit("CAST(o_orderkey AS VARCHAR) || ':' || CAST(frame_idx AS VARCHAR)", seed=Q_SEED)} AS qscore,
               {sql_hash_unit("CAST(o_orderkey AS VARCHAR) || ':' || CAST(frame_idx AS VARCHAR)", seed=S_SEED)} AS sim
        FROM frames
    ),
    passed AS (
        SELECT *, (qscore + sim) / 2 AS combined_score,
               CAST(floor(frame_idx / {BIN_SIZE}) AS BIGINT) AS bin
        FROM scored
        WHERE qscore > {Q_THRESH} AND sim BETWEEN {SIM_LO} AND {SIM_HI}
    ),
    top AS (
        SELECT *, row_number() OVER (PARTITION BY o_orderkey, bin
                                     ORDER BY combined_score DESC, frame_idx) AS rn
        FROM passed
    )
    SELECT o_orderkey, frame_idx, round(combined_score, 7) AS combined_score
    FROM top WHERE rn = 1
    """,
)
def pipeline_frame_mining_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """video_extract_frame's candidate-mining core end-to-end: stride scan →
    score gauntlet → combined frame score → per-bin argmax, one Catalyst
    plan. The explode amplifies rows executor-local (no shuffle); the only
    exchange is the window over (video, bin) — both low-cardinality compact
    keys at any corpus size."""
    manifest = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= MIN_DURATION)
        .select("o_orderkey", F.floor("o_totalprice").cast("long").alias("total_frame"))
    )
    # round to 7 decimals: scores are exact multiples of 5e-7, so 7 decimals
    # is representation-exact in both engines; 6 would hit decimal .5 ties
    # where Spark (half-up) and DuckDB (half-even) disagree.
    mined = MINING_PIPELINE.run(manifest)
    return mined.select("o_orderkey", "frame_idx", F.round("combined_score", 7).alias("combined_score"))


# ---------------------------------------------------------------------------
# for_high_bg_all_morelittler analog: resolution filter -> person count ->
# max-box-area ratio -> idempotency anti-join -> save path.
# Reference: for_high_bg_all_morelittler.py:144-194.
# ---------------------------------------------------------------------------

_D_SEED = 22  # StubDetector.SEED (models/stubs.py)


def _sql_boxes_cte(key_expr: str) -> str:
    """DuckDB mirror of StubDetector.predict: n = floor(unit(k)*4) boxes,
    box i = [x1, y1, x1+w, y1+h] from seeded unit hashes."""
    u = lambda suffix: (  # noqa: E731
        f"((('0x' || substr(md5('{_D_SEED}:' || {key_expr} || {suffix}), 1, 15))::BIGINT"
        f" % 1000000) / 1000000.0)"
    )
    n = f"CAST(floor((('0x' || substr(md5('{_D_SEED}:' || {key_expr}), 1, 15))::BIGINT % 1000000) / 1000000.0 * 4) AS INT)"
    return f"""
    boxes AS (
        SELECT p_partkey, {n} AS n_boxes,
               CASE WHEN {n} = 0 THEN [] ELSE
                 list_transform(generate_series(0, {n} - 1), i -> struct_pack(
                     x1 := CAST(floor({u("':' || CAST(i AS VARCHAR) || ':x'")} * 800) AS BIGINT),
                     y1 := CAST(floor({u("':' || CAST(i AS VARCHAR) || ':y'")} * 600) AS BIGINT),
                     w  := 1 + CAST(floor({u("':' || CAST(i AS VARCHAR) || ':w'")} * 200) AS BIGINT),
                     h  := 1 + CAST(floor({u("':' || CAST(i AS VARCHAR) || ':h'")} * 200) AS BIGINT)))
               END AS bxs
        FROM part
    )
"""


@query(
    "pipeline_bg_filter_e2e",
    oracle=f"""
    WITH {_sql_boxes_cte("CAST(p_partkey AS VARCHAR)")},
    dims AS (
        SELECT p.p_partkey, p_size * 25.0 AS w, p_size * 30.0 AS h, b.n_boxes, b.bxs
        FROM part p JOIN boxes b ON p.p_partkey = b.p_partkey
        WHERE p_size * 25.0 >= 1000 AND p_size * 30.0 >= 1000
          AND b.n_boxes BETWEEN 1 AND 3
    ),
    ratio AS (
        SELECT p_partkey, w, h,
               list_max(list_transform(bxs, bx ->
                   greatest(0.0, least(CAST(bx.x1 + bx.w AS DOUBLE), w) - greatest(CAST(bx.x1 AS DOUBLE), 0.0)) *
                   greatest(0.0, least(CAST(bx.y1 + bx.h AS DOUBLE), h) - greatest(CAST(bx.y1 AS DOUBLE), 0.0))
               )) / (w * h) AS max_ratio
        FROM dims
    )
    SELECT p_partkey, max_ratio,
           printf('/bg_out/part_%d.png', p_partkey) AS out_path
    FROM ratio
    WHERE max_ratio <= 0.4 AND p_partkey % 7 <> 0
    """,
)
def pipeline_bg_filter_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """for_high_bg_all_morelittler end-to-end: resolution gate (h,w >= 1000,
    ``:149-151``) → detector UDF person count 1..3 (``:157-158``) → max
    clipped-box-area / image-area <= 0.4 (``:160-169``) → idempotency
    anti-join against already-done outputs (``:176-179``; here: every 7th
    part is 'done') → output path. Cheap relational gates run BEFORE the
    UDF; the detector only scores rows that survive the resolution filter
    — the reference's manual cheap-first ordering, kept explicit."""
    from datapipeline_ops_spark.operators.inference import detect_boxes_udf

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        (F.col("p_size") * 25.0).alias("w"),
        (F.col("p_size") * 30.0).alias("h"),
    )
    sized = p.filter((F.col("w") >= 1000) & (F.col("h") >= 1000))
    boxed = sized.withColumn(
        "bxs", detect_boxes_udf()(F.col("p_partkey").cast("string"))
    ).filter(F.size("bxs").between(1, 3))
    area = F.array_max(
        F.transform(
            F.col("bxs"),
            lambda bx: F.greatest(
                F.lit(0.0),
                F.least(bx[2].cast("double"), F.col("w")) - F.greatest(bx[0].cast("double"), F.lit(0.0)),
            )
            * F.greatest(
                F.lit(0.0),
                F.least(bx[3].cast("double"), F.col("h")) - F.greatest(bx[1].cast("double"), F.lit(0.0)),
            ),
        )
    )
    rated = boxed.withColumn("max_ratio", area / (F.col("w") * F.col("h"))).filter(
        F.col("max_ratio") <= 0.4
    )
    done = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 7 == 0).select("p_partkey")
    fresh = rated.join(done, "p_partkey", "left_anti")
    # max_ratio ships RAW: both engines derive it through the identical IEEE
    # op sequence, so the doubles are bit-equal and the gate hasher's own
    # normalization applies consistently — an engine-side round(x, 6) is
    # UNSAFE here because exact .5e-6 boundaries round differently across
    # engines (observed at sf0.1: 0.0156825 -> 0.015683 vs 0.015682).
    return fresh.select(
        "p_partkey",
        "max_ratio",
        F.format_string("/bg_out/part_%d.png", F.col("p_partkey")).alias("out_path"),
    )


# ---------------------------------------------------------------------------
# Pretraining-data preparation, end-to-end (text-side flagship)
# ---------------------------------------------------------------------------

_PRETRAIN_BENCH_MOD = 97
_PRETRAIN_TAU = 0.5
_PRETRAIN_SEED = 777  # same split constants as dataset_split_assign


@query(
    "pretrain_data_e2e",
    oracle=f"""
    WITH q AS (
        SELECT doc_id, source, text FROM documents
        WHERE len({sql_tokens("text")}) >= 10
    ),
    shq AS (
        SELECT doc_id, source, text,
               list_distinct(list_transform({sql_shingles("text", 3)},
                                            s -> {sql_hash64("s")})) AS hs
        FROM q
    ),
    bench AS (SELECT DISTINCT unnest(hs) AS s FROM shq
              WHERE doc_id % {_PRETRAIN_BENCH_MOD} = 0),
    corpus AS (SELECT * FROM shq WHERE doc_id % {_PRETRAIN_BENCH_MOD} <> 0),
    ex AS (SELECT doc_id, len(hs) AS n_hs, unnest(hs) AS s FROM corpus),
    contam AS (
        SELECT ex.doc_id, count(bench.s) * 1e0 / any_value(ex.n_hs) AS contamination
        FROM ex LEFT JOIN bench ON ex.s = bench.s
        GROUP BY ex.doc_id
    ),
    clean AS (
        SELECT corpus.doc_id, corpus.source, corpus.text
        FROM corpus JOIN contam ON corpus.doc_id = contam.doc_id
        WHERE contam.contamination < {_PRETRAIN_TAU}
    ),
    keepers AS (
        SELECT doc_id, source, text FROM (
            SELECT doc_id, source, text,
                   row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
            FROM clean
        ) WHERE rn = 1
    ),
    assigned AS (
        SELECT source,
               CASE WHEN {sql_hash_unit("doc_id", _PRETRAIN_SEED)} < 0.8 THEN 'train'
                    WHEN {sql_hash_unit("doc_id", _PRETRAIN_SEED)} < 0.9 THEN 'val'
                    ELSE 'test' END AS split,
               len({sql_tokens("text")}) AS n_tok
        FROM keepers
    )
    SELECT split, source, count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens
    FROM assigned GROUP BY split, source
    """,
)
def pretrain_data_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The text-side pretraining-data preparation funnel as ONE composed
    Catalyst plan: quality gate (>= 10 tokens) → benchmark decontamination
    (3-gram overlap vs the broadcast benchmark set, tau 0.5) → exact dedup
    keepers (min doc_id per md5) → deterministic 80/10/10 split assignment
    → per-(split, source) document/token rollup. Companion flagship to
    ``corpus_curation_e2e`` (which owns the near-dup story): together they
    are the full corpus build a 100 TB pretraining run executes.

    Funnel discipline: each stage strictly shrinks the next stage's input;
    the benchmark set is the only broadcast; the exact-dedup window and the
    final rollup are the only exchanges over the corpus. The oracle replays
    all five stages as chained CTEs with the identical cross-engine hash."""
    from datapipeline_ops_spark.functions.text import shingles_from, tokens
    from datapipeline_ops_spark.functions.hashing import hash64, hash_unit

    from datapipeline_ops_spark.operators.dedup import persist_barrier

    docs = load_table(spark, sf_dir, "documents")
    # same defenses as with_shingle_hashes: tokenize once INTO the exchange
    # (so the shingle builder reads a materialized array, not a re-split per
    # position), spread the md5 work over all cores, and barrier the hashed
    # frame so CollapseProject can't re-evaluate the transform per branch.
    # n_tok rides along from the same array — the quality gate and the
    # final token rollup never re-split the text.
    n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    spread = docs.select(
        "doc_id", "source", "text", tokens(F.col("text")).alias("_toks")
    ).repartition(n, F.col("doc_id"))
    hs = F.array_distinct(
        F.transform(
            shingles_from(F.col("_toks"), F.col("text"), 3), lambda s: hash64(s)
        )
    )
    shq = persist_barrier(
        spread.filter(F.size("_toks") >= 10).select(
            "doc_id",
            "source",
            "text",
            F.size("_toks").alias("n_tok"),
            hs.alias("hs"),
        ),
        "pretrain_hs",
    )
    bench = (
        shq.filter(F.col("doc_id") % _PRETRAIN_BENCH_MOD == 0)
        .select(F.explode("hs").alias("s"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    corpus = shq.filter(F.col("doc_id") % _PRETRAIN_BENCH_MOD != 0)
    contam = (
        corpus.select("doc_id", F.size("hs").alias("n_hs"), F.explode("hs").alias("s"))
        .join(F.broadcast(bench), "s", "left")
        .groupBy("doc_id")
        .agg((F.count("hit") * 1.0 / F.first("n_hs")).alias("contamination"))
    )
    clean = corpus.join(contam, "doc_id").filter(
        F.col("contamination") < _PRETRAIN_TAU
    )
    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    keepers = (
        clean.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "n_tok")
    )
    assigned = keepers.select(
        "source",
        F.when(hash_unit(F.col("doc_id"), _PRETRAIN_SEED) < 0.8, "train")
        .when(hash_unit(F.col("doc_id"), _PRETRAIN_SEED) < 0.9, "val")
        .otherwise("test")
        .alias("split"),
        "n_tok",
    )
    return assigned.groupBy("split", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
    )
