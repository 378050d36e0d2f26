"""Model-inference queries: the ML-shaped pipeline stages (score, detect,
pairwise-match) run through real pandas UDFs + the executor model registry,
with deterministic stub models whose md5 scores the DuckDB oracle
recomputes — so even the Python-UDF path is value-checked, not rows-only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.functions.hashing import sql_hash_unit
from datapipeline_ops_spark.operators.inference import (
    detect_boxes_udf,
    pair_similarity_udf,
    quality_score_udf,
)
from datapipeline_ops_spark.tables import load_table

_Q_SEED = 21  # StubQualityModel.SEED
_D_SEED = 22  # StubDetector.SEED
_S_SEED = 23  # StubSimilarityModel.SEED
QUALITY_THRESH = 0.8


@query(
    "udf_quality_gate",
    oracle=f"""
    SELECT doc_id, round({sql_hash_unit("doc_id", seed=_Q_SEED)}, 6) AS qscore
    FROM documents
    WHERE {sql_hash_unit("doc_id", seed=_Q_SEED)} > {QUALITY_THRESH}
    """,
)
def udf_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-threshold gauntlet (``video_extract_frame.py:199-200``:
    `qscore > face_quality_thresh`) with the score coming from a real
    Iterator-pandas-UDF + registry model. Catalyst keeps the cheap
    relational work JVM-side; only the key column crosses to Python."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select("doc_id", quality_score_udf()(F.col("doc_id").cast("string")).alias("q"))
    return scored.filter(F.col("q") > QUALITY_THRESH).select(
        "doc_id", F.round("q", 6).alias("qscore")
    )


@query(
    "udf_detect_count_filter",
    oracle=f"""
    SELECT doc_id,
           CAST(floor({sql_hash_unit("doc_id", seed=_D_SEED)} * 4) AS INT) AS n_boxes
    FROM documents
    WHERE floor({sql_hash_unit("doc_id", seed=_D_SEED)} * 4) BETWEEN 1 AND 2
    """,
)
def udf_detect_count_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detector UDF → person-count-in-range filter (1..2 persons,
    ``video_extract_frame.py:171``). The box payload is produced by the
    UDF; the filter runs on `F.size` of the returned array, JVM-side."""
    d = load_table(spark, sf_dir, "documents")
    boxes = d.select("doc_id", detect_boxes_udf()(F.col("doc_id").cast("string")).alias("boxes"))
    return (
        boxes.withColumn("n_boxes", F.size("boxes"))
        .filter(F.col("n_boxes").between(1, 2))
        .select("doc_id", "n_boxes")
    )


_PAIR_KEY = (
    "least(CAST(a.vec_id AS VARCHAR), CAST(b.vec_id AS VARCHAR)) || '|' || "
    "greatest(CAST(a.vec_id AS VARCHAR), CAST(b.vec_id AS VARCHAR))"
)
# NB: the stub canonicalizes the pair by *string* sort ("10" < "9"), so the
# oracle must use least/greatest over VARCHAR, not the numeric a < b order.


@query(
    "udf_pair_similarity_band",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({sql_hash_unit(_PAIR_KEY, seed=_S_SEED)}, 6) AS sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.vec_id < 40 AND b.vec_id < 40
      AND {sql_hash_unit(_PAIR_KEY, seed=_S_SEED)} BETWEEN 0.85 AND 0.98
    """,
)
def udf_pair_similarity_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise-similarity band filter (``video_extract_frame.py:300-302``:
    sim_lo <= s <= sim_hi) over a broadcast self-join, scored by the
    pairwise stub through a two-column pandas UDF. Key ordering (a < b)
    makes the stub symmetric exactly like the oracle's lo|hi convention."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 40).select("vec_id")
    pairs = (
        e.alias("a")
        .join(F.broadcast(e.alias("b")), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
    )
    scored = pairs.withColumn(
        "sim",
        pair_similarity_udf()(F.col("vec_a").cast("string"), F.col("vec_b").cast("string")),
    )
    return scored.filter(F.col("sim").between(0.85, 0.98)).select(
        "vec_a", "vec_b", F.round("sim", 6).alias("sim")
    )
