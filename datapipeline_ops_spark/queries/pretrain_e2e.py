"""Composed pretrain-prep pipeline: decontaminate -> span-corruption stats
-> FIM split masses -> sequence-packing boundary audit, chained under ONE
Catalyst plan.

The experimentation counterpart is ``experiment_readout_e2e``; this is the
same proof for the pretraining-data operators: the four registered shapes
(`decontaminate_overlap`, `span_corruption_plan`, `fim_split_plan`,
`sequence_packing_plan`) compose without materialization barriers into the
per-source readout a data-mixture owner reviews before a training run.

Reference scope: the reference pipelines (``pipeline/*.py``) chain ops
imperatively stage-by-stage; here the whole prep chain is one declarative
plan Catalyst can globally optimize.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.functions.hashing import hash64, sql_hash64
from datapipeline_ops_spark.functions.money import spark_avg_units, sql_avg_units
from datapipeline_ops_spark.functions.text import tokens
from datapipeline_ops_spark.operators.dedup import persist_barrier, with_shingle_hashes
from datapipeline_ops_spark.queries.curation_extra import _BENCH_MOD, CONTAMINATION_TAU
from datapipeline_ops_spark.queries.corpus_lm_extra import (
    _FIM_SEED_A,
    _FIM_SEED_B,
    _FIM_SEED_MODE,
    _SPAN_MASK_PCT,
    _SPAN_SEED,
)
from datapipeline_ops_spark.queries.dedup import _hs_cte
from datapipeline_ops_spark.queries.lm_quality import PACK_SEQ_LEN
from datapipeline_ops_spark.tables import load_table


def _oracle() -> str:
    return (
        "WITH "
        + _hs_cte()
        + f""",
    bench AS (
        SELECT DISTINCT unnest(hs) AS s FROM hsv WHERE doc_id % {_BENCH_MOD} = 0
    ),
    ex AS (
        SELECT doc_id, unnest(hs) AS s FROM hsv WHERE doc_id % {_BENCH_MOD} <> 0
    ),
    mm AS (
        SELECT ex.doc_id, count(bench.s) AS n_matched
        FROM ex LEFT JOIN bench ON ex.s = bench.s
        GROUP BY ex.doc_id
    ),
    corpus AS MATERIALIZED (
        SELECT d.doc_id, d.source,
               len(regexp_split_to_array(d.text, '\\s+')) AS n,
               mm.n_matched * 1.0 / len(hsv.hs) >= {CONTAMINATION_TAU}
                   AS contaminated
        FROM documents d
        JOIN hsv ON hsv.doc_id = d.doc_id
        JOIN mm ON mm.doc_id = d.doc_id
        WHERE d.doc_id % {_BENCH_MOD} <> 0
    ),
    kept AS MATERIALIZED (
        SELECT doc_id, source, n FROM corpus WHERE NOT contaminated
    ),
    removed AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs_removed
        FROM corpus WHERE contaminated GROUP BY source
    ),
    pos AS (
        SELECT kept.source,
               CASE WHEN {sql_hash64("kept.doc_id || ':' || g.p",
                                     seed=_SPAN_SEED)} % 100
                         < {_SPAN_MASK_PCT} THEN 1 ELSE 0 END AS m,
               CASE WHEN g.p = 1 THEN 0
                    WHEN {sql_hash64("kept.doc_id || ':' || (g.p - 1)",
                                     seed=_SPAN_SEED)} % 100
                         < {_SPAN_MASK_PCT} THEN 1 ELSE 0 END AS m_prev
        FROM kept, unnest(generate_series(1, n)) AS g(p)
    ),
    spanstats AS (
        SELECT source,
               CAST(sum(m) AS BIGINT) AS masked_tokens,
               CAST(sum(CASE WHEN m = 1 AND m_prev = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_spans
        FROM pos GROUP BY source
    ),
    fim AS (
        SELECT source,
               CAST(sum(greatest(a, b) - least(a, b)) AS BIGINT)
                   AS middle_tokens,
               CAST(sum(spm) AS BIGINT) AS n_spm
        FROM (
            SELECT source,
                   1 + {sql_hash64("doc_id", seed=_FIM_SEED_A)} % n AS a,
                   1 + {sql_hash64("doc_id", seed=_FIM_SEED_B)} % n AS b,
                   {sql_hash64("doc_id", seed=_FIM_SEED_MODE)} % 2 AS spm
            FROM kept
        ) GROUP BY source
    ),
    pack AS (
        SELECT source, n,
               CAST(coalesce(sum(n) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS cum_before
        FROM kept
    ),
    packagg AS (
        SELECT source,
               CAST(sum(CASE WHEN (cum_before % {PACK_SEQ_LEN}) + n
                                  > {PACK_SEQ_LEN}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_docs
        FROM pack GROUP BY source
    ),
    base AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n) AS BIGINT) AS total_tokens
        FROM kept GROUP BY source
    )
    SELECT base.source, base.n_docs, base.total_tokens,
           coalesce(removed.n_docs_removed, 0) AS n_docs_removed,
           spanstats.masked_tokens, spanstats.n_spans,
           {sql_avg_units('spanstats.masked_tokens', 'base.total_tokens', 1, 6)}
               AS corruption_rate,
           fim.middle_tokens, fim.n_spm,
           packagg.n_boundary_docs
    FROM base
    LEFT JOIN removed   ON removed.source = base.source
    JOIN spanstats      ON spanstats.source = base.source
    JOIN fim            ON fim.source = base.source
    JOIN packagg        ON packagg.source = base.source
    """
    )


@query("pretrain_prep_e2e", oracle=_oracle())
def pretrain_prep_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining data prep as ONE plan, per source: (1) benchmark
    decontamination (n-gram overlap >= tau removes the doc); (2) T5
    span-corruption mask statistics over the KEPT docs; (3) FIM
    prefix/middle/suffix split masses; (4) concat-and-chunk sequence
    packing in doc_id order, counting boundary-spanning docs. One readout
    row per source — the go/no-go table reviewed before sentinel-token
    targets are written.

    Stage coupling is the point: span/FIM/packing statistics computed on
    the PRE-decontamination corpus would overstate usable token mass, so
    the three downstream stages all consume the stage-1 keeper set.

    Plan shape: the shingle hash frame is the shared ``with_shingle_hashes``
    persist barrier (documents scanned once for hashes, once for token
    counts); the benchmark's distinct-hash set broadcasts; the
    contamination verdict frame persists once and fans out to the four
    per-source aggregates, each joined back broadcast (|sources| rows).
    The packing prefix sum reuses ``sequence_packing_plan``'s two-level
    scheme — a range exchange plus a 32-row offset broadcast, never a
    single-task global window.

    Scale: the only O(total tokens) stage is the span-mask explode (same
    cost class as the registry's shingle builds); everything else is
    O(docs) arithmetic or |sources|-row joins."""
    d0 = load_table(spark, sf_dir, "documents")
    hs = with_shingle_hashes(d0, "doc_id")
    bench = (
        hs.filter(F.col("doc_id") % _BENCH_MOD == 0)
        .select(F.explode("hs").alias("s"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    corpus_hs = hs.filter(F.col("doc_id") % _BENCH_MOD != 0)
    matched = (
        corpus_hs.select("doc_id", F.explode("hs").alias("s"))
        .join(F.broadcast(bench), "s", "left")
        .groupBy("doc_id")
        .agg(F.count("hit").alias("n_matched"))
    )
    meta = d0.filter(F.col("doc_id") % _BENCH_MOD != 0).select(
        "doc_id", "source", F.size(tokens(F.col("text"))).alias("n")
    )
    corpus = (
        meta.join(corpus_hs.select("doc_id", F.size("hs").alias("n_ngrams")), "doc_id")
        .join(matched, "doc_id")
        .withColumn(
            "contaminated",
            F.col("n_matched") / F.col("n_ngrams") >= CONTAMINATION_TAU,
        )
        .select("doc_id", "source", "n", "contaminated")
    )
    corpus = persist_barrier(corpus, f"pretrain_e2e_corpus:{sf_dir}")
    removed = (
        corpus.filter(F.col("contaminated"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs_removed"))
    )
    kept = corpus.filter(~F.col("contaminated")).select("doc_id", "source", "n")

    base = kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n").cast("long").alias("total_tokens"),
    )

    # (2) span-corruption masks — identical hash scheme to span_corruption_plan
    mask_of = lambda pcol: (  # noqa: E731
        hash64(
            F.concat(F.col("doc_id").cast("string"), F.lit(":"), pcol.cast("string")),
            seed=_SPAN_SEED,
        )
        % 100
        < _SPAN_MASK_PCT
    ).cast("int")
    pos = kept.select(
        "doc_id", "source", F.explode(F.sequence(F.lit(1), F.col("n"))).alias("p")
    ).select(
        "source",
        mask_of(F.col("p")).alias("m"),
        F.when(F.col("p") == 1, F.lit(0)).otherwise(mask_of(F.col("p") - 1)).alias(
            "m_prev"
        ),
    )
    spanstats = pos.groupBy("source").agg(
        F.sum("m").cast("long").alias("masked_tokens"),
        F.sum(F.when((F.col("m") == 1) & (F.col("m_prev") == 0), 1).otherwise(0))
        .cast("long")
        .alias("n_spans"),
    )

    # (3) FIM cuts — identical hash scheme to fim_split_plan
    ca = 1 + hash64(F.col("doc_id"), seed=_FIM_SEED_A) % F.col("n")
    cb = 1 + hash64(F.col("doc_id"), seed=_FIM_SEED_B) % F.col("n")
    fim = (
        kept.select(
            "source",
            (F.greatest(ca, cb) - F.least(ca, cb)).alias("mid"),
            (hash64(F.col("doc_id"), seed=_FIM_SEED_MODE) % 2).alias("spm"),
        )
        .groupBy("source")
        .agg(
            F.sum("mid").cast("long").alias("middle_tokens"),
            F.sum("spm").cast("long").alias("n_spm"),
        )
    )

    # (4) packing prefix sum — sequence_packing_plan's two-level scheme
    ranked = persist_barrier(
        kept.repartitionByRange(32, "doc_id").withColumn(
            "_pid", F.spark_partition_id()
        ),
        f"pretrain_e2e_ranked:{sf_dir}",
    )
    part_sums = ranked.groupBy("_pid").agg(F.sum("n").alias("_s"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = part_sums.select(
        "_pid", F.coalesce(F.sum("_s").over(w_off), F.lit(0)).alias("_off")
    )
    w_pid = Window.partitionBy("_pid").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    packagg = (
        ranked.join(F.broadcast(offsets), "_pid")
        .withColumn(
            "cum_before",
            (F.coalesce(F.sum("n").over(w_pid), F.lit(0)) + F.col("_off")).cast(
                "long"
            ),
        )
        .groupBy("source")
        .agg(
            F.sum(
                F.when(
                    (F.col("cum_before") % PACK_SEQ_LEN) + F.col("n") > PACK_SEQ_LEN,
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_boundary_docs")
        )
    )

    return (
        base.join(F.broadcast(removed), "source", "left")
        .join(F.broadcast(spanstats), "source")
        .join(F.broadcast(fim), "source")
        .join(F.broadcast(packagg), "source")
        .select(
            "source",
            "n_docs",
            "total_tokens",
            F.coalesce("n_docs_removed", F.lit(0).cast("long")).alias(
                "n_docs_removed"
            ),
            "masked_tokens",
            "n_spans",
            # round(masked/total, 6) half-up in integer space — round(double,
            # 6) on a ratio of exact integers is the shortest-decimal
            # cross-engine divergence class (functions/money.py).
            F.expr(
                spark_avg_units("masked_tokens", "total_tokens", 1, 6)
            ).alias("corruption_rate"),
            "middle_tokens",
            "n_spm",
            "n_boundary_docs",
        )
    )
