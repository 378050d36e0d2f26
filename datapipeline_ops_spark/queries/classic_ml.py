"""Classical-ML training closures over the curation feature space.

Round-14 wave 2 of the in-engine training theme (after the logistic-GD /
SGD quality gate, the BPE trainer, and the k-means closure in
``lm_quality.py`` / ``kmeans_loop.py``): the remaining textbook model
families a corpus-curation team actually fits on pipeline features —

- multinomial **naive Bayes** over a capped token vocabulary (train the
  per-source token model, then classify the corpus and publish the
  confusion matrix);
- a **decision stump** (depth-1 tree) on the quality-gate feature space
  against the Gopher keep label — the one-pass histogram+cumsum split
  sweep that is the inner loop of every distributed tree learner;
- **OLS via normal equations** (linear probability model on the same
  features; one-pass Gram moments, closed-form Cramer solve);
- **isotonic (PAV) calibration** of the trained logistic gate's
  reliability bins, via the exact minimax formula over bounded bins.

The reference has no ML-training surface (its ``common/filter/`` is an
empty stub — ``Filter_README.md:1-3``); these are beyond-reference
components of the training-data suite, and they deliberately REUSE the
trained-gate feature table (``lm_quality._qct_run``) so the model family
comparisons (logistic vs stump vs OLS vs NB) are apples-to-apples.

Cross-engine determinism rules used here:

- **Integer score arithmetic.** Naive-Bayes log-likelihoods ship as
  micro-nat BIGINTs (``round(ln(p) * 1e6)``), so per-document class
  scores are exact integer sums — the argmax can never flip on float
  association order. Tie-breaks are (score DESC, class ASC) in both
  engines.
- **Counts before ratios.** Stump Gini and PAV interval means derive
  from integer counts with a fixed expression shape, so the doubles are
  bit-identical across engines; published floats round at 6 dp (+0.0).
- **Rounded moments before solve.** OLS moments round at 6 dp FIRST and
  the coefficients are defined as the exact Cramer solve of the rounded
  system — both engines walk identical arithmetic after the only
  order-sensitive step (the corpus sum) has been rounded away.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.functions.text import sql_tokens, tokens
from datapipeline_ops_spark.operators.dedup import persist_barrier
from datapipeline_ops_spark.queries.lm_quality import (
    _QCT_CAL_BIN_W,
    _QCT_CAL_HI,
    _QCT_CAL_LO,
    _QCT_ITERS,
    _QCT_Z,
    _qct_feats_sql,
    _qct_run,
    _qct_stage_ctes,
)
from datapipeline_ops_spark.tables import load_table

# ---------------------------------------------------------------------------
# Multinomial naive Bayes: train on (source -> token counts), apply as a
# source classifier, publish the confusion matrix
# ---------------------------------------------------------------------------

# Vocabulary cap: top-_NB_V tokens by corpus frequency (ties break on token
# text ASC so both engines pick the identical vocabulary). Out-of-vocabulary
# tokens are ignored at apply time and excluded from the class totals, so
# the model is self-consistent: P(t|c) = (n_tc + 1) / (n_c + V) with
# add-one smoothing over the V in-vocabulary tokens.
_NB_V = 48


def _nb_model_ctes() -> list[str]:
    """Shared CTE chain building the NB model table: vocab (top-V tokens),
    per-class priors, and the smoothed per-(class, token) micro-nat
    log-likelihood grid. Used by both the train and the apply oracle."""
    return [
        f"""tok AS MATERIALIZED (
        SELECT doc_id, source, unnest({sql_tokens('text')}) AS tok
        FROM documents)""",
        f"""vocab AS MATERIALIZED (
        SELECT tok FROM (
            SELECT tok, count(*) AS n,
                   row_number() OVER (ORDER BY count(*) DESC, tok ASC) AS rk
            FROM tok GROUP BY tok)
        WHERE rk <= {_NB_V})""",
        """vsize AS (SELECT count(*) AS v FROM vocab)""",
        """priors AS MATERIALIZED (
        SELECT source, count(*) AS n_docs,
               CAST(round(ln(CAST(count(*) AS DOUBLE)
                   / (SELECT count(*) FROM documents)) * 1e6, 0) AS BIGINT)
                   AS prior_micro
        FROM documents GROUP BY source)""",
        """ctok AS MATERIALIZED (
        SELECT t.source, t.tok, count(*) AS n
        FROM tok t JOIN vocab v USING (tok)
        GROUP BY t.source, t.tok)""",
        """ctot AS (SELECT source, sum(n) AS n_tok FROM ctok GROUP BY source)""",
        """model AS MATERIALIZED (
        SELECT p.source, v.tok,
               CAST(coalesce(c.n, 0) AS BIGINT) AS n_in_class,
               CAST(round(ln((CAST(coalesce(c.n, 0) AS DOUBLE) + 1e0)
                   / (CAST(coalesce(ct.n_tok, 0) AS DOUBLE)
                      + (SELECT v FROM vsize))) * 1e6, 0) AS BIGINT)
                   AS ll_micro,
               p.prior_micro
        FROM priors p
        CROSS JOIN vocab v
        LEFT JOIN ctok c ON c.source = p.source AND c.tok = v.tok
        LEFT JOIN ctot ct ON ct.source = p.source)""",
    ]


def _nb_frames(spark: SparkSession, sf_dir: str):
    """Spark mirror of :func:`_nb_model_ctes`: returns (priors, model)
    frames. priors: (source, n_docs, prior_micro); model: (source, tok,
    n_in_class, ll_micro, prior_micro). Both are bounded (|classes| and
    |classes| x V rows) and persist behind site-keyed barriers."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", "source", F.explode(tokens(F.col("text"))).alias("tok"))
    vocab = persist_barrier(
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.col("n").desc(), F.col("tok").asc())),
        )
        .filter(F.col("rk") <= _NB_V)
        .select("tok"),
        "nb_vocab",
    )
    # scalar spines: corpus doc total and actual vocabulary size (< _NB_V on
    # tiny corpora), carried as 1-row broadcast frames — never collected
    n_corpus = d.agg(F.count(F.lit(1)).alias("n_corpus"))
    vsize = vocab.agg(F.count(F.lit(1)).alias("v"))
    priors = persist_barrier(
        d.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(F.broadcast(n_corpus))
        .select(
            "source",
            "n_docs",
            F.round(
                F.log(
                    F.col("n_docs").cast("double") / F.col("n_corpus").cast("double")
                )
                * F.lit(1e6),
                0,
            )
            .cast("long")
            .alias("prior_micro"),
        ),
        "nb_priors",
    )
    ctok = tok.join(F.broadcast(vocab), "tok").groupBy("source", "tok").agg(
        F.count(F.lit(1)).alias("n")
    )
    ctot = ctok.groupBy("source").agg(F.sum("n").alias("n_tok"))
    model = persist_barrier(
        priors.select("source", "prior_micro")
        .crossJoin(F.broadcast(vocab))
        .join(F.broadcast(ctok), ["source", "tok"], "left")
        .join(F.broadcast(ctot), "source", "left")
        .crossJoin(F.broadcast(vsize))
        .select(
            "source",
            "tok",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_in_class"),
            F.round(
                F.log(
                    (F.coalesce("n", F.lit(0)).cast("double") + F.lit(1.0))
                    / (
                        F.coalesce("n_tok", F.lit(0)).cast("double")
                        + F.col("v").cast("double")
                    )
                )
                * F.lit(1e6),
                0,
            )
            .cast("long")
            .alias("ll_micro"),
            "prior_micro",
        ),
        "nb_model",
    )
    return priors, model


@query(
    "naive_bayes_train",
    oracle="WITH "
    + ",\n    ".join(_nb_model_ctes())
    + """
    SELECT source, tok, n_in_class, ll_micro, prior_micro FROM model""",
)
def naive_bayes_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a multinomial naive-Bayes source classifier inside the engine:
    the top-{_NB_V} corpus vocabulary (frequency DESC, token ASC — the
    deterministic cap both engines agree on), per-source doc priors, and
    the add-one-smoothed token log-likelihood grid P(tok|source) =
    (n_tc + 1) / (n_c + V). All log quantities publish as micro-nat
    BIGINTs (round(ln(p) * 1e6)) so the apply half scores documents in
    exact integer arithmetic — the float-sum association order that makes
    naive cross-engine argmaxes flaky never enters.

    Scale: one corpus scan feeds both the vocab top-K (token-key shuffle
    with map-side combine, TakeOrdered cap) and the class-token counts
    (the vocab filter broadcasts, so the count shuffle carries only
    in-vocabulary hits); the published model is a bounded
    |classes| x V grid assembled from broadcast frames — the corpus never
    shuffles on doc keys at all."""
    _, model = _nb_frames(spark, sf_dir)
    return model


@query(
    "naive_bayes_confusion",
    oracle="WITH "
    + ",\n    ".join(_nb_model_ctes())
    + """,
    contrib AS (
        SELECT t.doc_id, t.source, m.source AS cls, m.ll_micro AS val
        FROM tok t JOIN model m ON m.tok = t.tok
    ),
    spine AS (
        SELECT d.doc_id, d.source, p.source AS cls, p.prior_micro AS val
        FROM documents d CROSS JOIN priors p
    ),
    scores AS (
        SELECT doc_id, source, cls, CAST(sum(val) AS BIGINT) AS score
        FROM (SELECT * FROM contrib UNION ALL SELECT * FROM spine)
        GROUP BY doc_id, source, cls
    ),
    pred AS (
        SELECT doc_id, source,
               min(struct_pack(ns := -score, c := cls)).c AS pred_source
        FROM scores GROUP BY doc_id, source
    )
    SELECT source, pred_source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN pred_source = source THEN 1 ELSE 0 END)
               AS BIGINT) AS n_correct
    FROM pred GROUP BY source, pred_source""",
)
def naive_bayes_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the naive-Bayes model `naive_bayes_train` just fit — classify
    every document as argmax over classes of prior + sum of in-vocabulary
    token log-likelihoods (micro-nat integers, so the sum and the argmax
    are exact; ties break score DESC then class ASC) — and publish the
    per-(actual, predicted) confusion cells. The diagonal cells carry
    n_correct = n_docs; a cross-query identity pins the per-source row
    sums to `trained_gate_impact`'s per-source doc counts, tying this
    closure to the same corpus census as the logistic gate.

    Scale: token contributions build map-side (explode + broadcast-join
    against the bounded |classes| x V model grid — a |classes|-way row
    expansion bounded by the class count, never a corpus shuffle), then
    ONE partial-aggregated shuffle on (doc_id, source, class) sums the
    integer scores and a second doc-key aggregation takes the struct-min
    argmax; the confusion rollup map-side combines to <= |classes|^2
    cells. The prior rows ride a broadcast class spine unioned under the
    same aggregate, so prior-only classes (no vocab hits in a document)
    need no outer join."""
    priors, model = _nb_frames(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", "source", F.explode(tokens(F.col("text"))).alias("tok"))
    contrib = tok.join(
        F.broadcast(model.select("tok", F.col("source").alias("cls"), F.col("ll_micro").alias("val"))),
        "tok",
    ).select("doc_id", "source", "cls", "val")
    spine = d.select("doc_id", "source").crossJoin(
        F.broadcast(priors.select(F.col("source").alias("cls"), F.col("prior_micro").alias("val")))
    ).select("doc_id", "source", "cls", "val")
    scores = (
        contrib.unionByName(spine)
        .groupBy("doc_id", "source", "cls")
        .agg(F.sum("val").cast("long").alias("score"))
    )
    pred = (
        scores.groupBy("doc_id", "source")
        .agg(
            F.min(F.struct((-F.col("score")).alias("ns"), F.col("cls").alias("c")))
            .getField("c")
            .alias("pred_source")
        )
    )
    return pred.groupBy("source", "pred_source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("pred_source") == F.col("source")).cast("int"))
        .cast("long")
        .alias("n_correct"),
    )


# ---------------------------------------------------------------------------
# Decision stump (depth-1 tree) on the quality-gate feature space
# ---------------------------------------------------------------------------

# Candidate-split grid: each centered feature (x in [-0.5, 0.5]) buckets
# into _STUMP_BKTS equal-width cells; candidate thresholds sit on the cell
# boundaries, so the full Gini sweep reduces to one bounded histogram plus
# cumulative sums — the classic distributed-tree inner loop (one histogram
# shuffle per feature set, never a per-candidate corpus pass).
_STUMP_BKTS = 20
_STUMP_W = 1.0 / _STUMP_BKTS

# (feature name, Spark/DuckDB column) in the fixed sweep order; names match
# trained_gate_feature_ablation's ablated_feature labels.
_STUMP_FEATS = [("ntok", "x1"), ("wordlen", "x2"), ("stop", "x3"), ("ttr", "x4")]


def _stump_sweep_ctes() -> list[str]:
    """CTE chain from feats to the per-candidate Gini table ``gin`` and the
    1-row argmin ``best`` (shared by the train and apply oracles)."""
    unions = "\n        UNION ALL ".join(
        f"SELECT '{name}' AS feat, {col} AS x, y FROM feats"
        for name, col in _STUMP_FEATS
    )
    bkt = (
        f"CAST(least({_STUMP_BKTS - 1}, greatest(0,"
        f" CAST(floor((x + 5e-1) / {_STUMP_W}) AS INT))) AS INT)"
    )
    pl = "(CAST(kl AS DOUBLE) / CAST(nl AS DOUBLE))"
    ql = "(CAST(nl - kl AS DOUBLE) / CAST(nl AS DOUBLE))"
    pr = "(CAST(kr AS DOUBLE) / CAST(nr AS DOUBLE))"
    qr = "(CAST(nr - kr AS DOUBLE) / CAST(nr AS DOUBLE))"
    wg = (
        f"(CAST(nl AS DOUBLE) * (1e0 - {pl} * {pl} - {ql} * {ql})"
        f" + CAST(nr AS DOUBLE) * (1e0 - {pr} * {pr} - {qr} * {qr}))"
        " / CAST(nl + nr AS DOUBLE)"
    )
    return [
        _qct_feats_sql(),
        f"""lng AS ({unions})""",
        f"""hist AS MATERIALIZED (
        SELECT feat, {bkt} AS bkt, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN y = 1e0 THEN 1 ELSE 0 END) AS BIGINT) AS keep
        FROM lng GROUP BY 1, 2)""",
        """cum AS (
        SELECT feat, bkt,
               CAST(sum(n) OVER (PARTITION BY feat ORDER BY bkt) AS BIGINT) AS nl,
               CAST(sum(keep) OVER (PARTITION BY feat ORDER BY bkt) AS BIGINT) AS kl,
               CAST(sum(n) OVER (PARTITION BY feat) AS BIGINT) AS tn,
               CAST(sum(keep) OVER (PARTITION BY feat) AS BIGINT) AS tk
        FROM hist)""",
        f"""gin AS MATERIALIZED (
        SELECT feat, bkt, nl, kl, tn - nl AS nr, tk - kl AS kr, {wg} AS wg
        FROM (SELECT * FROM cum WHERE nl < tn))""",
        """best AS (
        SELECT min(struct_pack(w := wg, f := feat, b := bkt,
                               nl := nl, kl := kl, nr := nr, kr := kr)) AS m
        FROM gin)""",
    ]


def _stump_frames(spark: SparkSession, sf_dir: str):
    """Spark mirror of :func:`_stump_sweep_ctes`: returns (gin, best) —
    the per-candidate Gini frame and the 1-row argmin struct frame."""
    feats, _, _ = _qct_run(spark, sf_dir)
    lng = feats.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(name).alias("feat"), F.col(col).alias("x"))
                    for name, col in _STUMP_FEATS
                ]
            )
        ).alias("fx"),
        "y",
    ).select(F.col("fx.feat").alias("feat"), F.col("fx.x").alias("x"), "y")
    bkt = F.least(
        F.lit(_STUMP_BKTS - 1),
        F.greatest(
            F.lit(0), F.floor((F.col("x") + F.lit(0.5)) / F.lit(_STUMP_W)).cast("int")
        ),
    ).cast("int")
    hist = lng.groupBy("feat", bkt.alias("bkt")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("y") == 1.0, 1).otherwise(0)).cast("long").alias("keep"),
    )
    wo = Window.partitionBy("feat").orderBy("bkt")
    wf = Window.partitionBy("feat")
    cum = hist.select(
        "feat",
        "bkt",
        F.sum("n").over(wo).cast("long").alias("nl"),
        F.sum("keep").over(wo).cast("long").alias("kl"),
        F.sum("n").over(wf).cast("long").alias("tn"),
        F.sum("keep").over(wf).cast("long").alias("tk"),
    )
    pl = F.col("kl").cast("double") / F.col("nl").cast("double")
    ql = (F.col("nl") - F.col("kl")).cast("double") / F.col("nl").cast("double")
    pr = F.col("kr").cast("double") / F.col("nr").cast("double")
    qr = (F.col("nr") - F.col("kr")).cast("double") / F.col("nr").cast("double")
    gin = persist_barrier(
        cum.filter(F.col("nl") < F.col("tn"))
        .select(
            "feat",
            "bkt",
            "nl",
            "kl",
            (F.col("tn") - F.col("nl")).alias("nr"),
            (F.col("tk") - F.col("kl")).alias("kr"),
        )
        .select(
            "feat",
            "bkt",
            "nl",
            "kl",
            "nr",
            "kr",
            (
                (
                    F.col("nl").cast("double")
                    * (F.lit(1.0) - pl * pl - ql * ql)
                    + F.col("nr").cast("double") * (F.lit(1.0) - pr * pr - qr * qr)
                )
                / (F.col("nl") + F.col("nr")).cast("double")
            ).alias("wg"),
        ),
        "stump_gin",
    )
    best = gin.agg(
        F.min(
            F.struct(
                F.col("wg").alias("w"),
                F.col("feat").alias("f"),
                F.col("bkt").alias("b"),
                F.col("nl").alias("nl"),
                F.col("kl").alias("kl"),
                F.col("nr").alias("nr"),
                F.col("kr").alias("kr"),
            )
        ).alias("m")
    )
    return gin, best


@query(
    "decision_stump_train",
    oracle="WITH "
    + ",\n    ".join(_stump_sweep_ctes())
    + f"""
    SELECT g.feat AS feature, g.bkt + 1 AS thr_bucket,
           CAST(g.bkt + 1 AS DOUBLE) * {_STUMP_W} - 5e-1 AS threshold,
           g.nl AS n_left, g.kl AS n_keep_left,
           g.nr AS n_right, g.kr AS n_keep_right,
           round(g.wg, 6) + 0e0 AS weighted_gini,
           (g.wg = b.m.w AND g.feat = b.m.f AND g.bkt = b.m.b) AS is_best
    FROM gin g CROSS JOIN best b""",
)
def decision_stump_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a decision stump (depth-1 CART split) on the trained-gate
    feature table against the Gopher keep label: every candidate split
    "x_feature < boundary" from a fixed {_STUMP_BKTS}-cell grid publishes
    its left/right class counts and weighted Gini impurity, and the argmin
    candidate is flagged `is_best` (ties break Gini ASC, feature ASC,
    bucket ASC via a struct min — deterministic in both engines because
    the Gini doubles derive from integer counts through one fixed
    expression shape). This is the inner loop of every distributed
    tree/GBDT learner, closed as a first-class query.

    Scale: the corpus never sees a per-candidate pass — one map-side
    4x unpivot feeds ONE partial-aggregated histogram shuffle bounded by
    |features| x {_STUMP_BKTS} cells, and the whole sweep (cumulative
    sums, Gini, argmin) runs on that bounded frame. The same shape holds
    at any corpus size; deeper trees recurse on the same histogram
    primitive."""
    gin, best = _stump_frames(spark, sf_dir)
    b = F.col("m")
    return gin.crossJoin(F.broadcast(best)).select(
        F.col("feat").alias("feature"),
        (F.col("bkt") + 1).alias("thr_bucket"),
        ((F.col("bkt") + 1).cast("double") * F.lit(_STUMP_W) - F.lit(0.5)).alias(
            "threshold"
        ),
        F.col("nl").alias("n_left"),
        F.col("kl").alias("n_keep_left"),
        F.col("nr").alias("n_right"),
        F.col("kr").alias("n_keep_right"),
        (F.round("wg", 6) + F.lit(0.0)).alias("weighted_gini"),
        (
            (F.col("wg") == b.getField("w"))
            & (F.col("feat") == b.getField("f"))
            & (F.col("bkt") == b.getField("b"))
        ).alias("is_best"),
    )


@query(
    "decision_stump_apply",
    oracle="WITH "
    + ",\n    ".join(_stump_sweep_ctes())
    + f"""
    SELECT f.source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN pred THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_keep,
           CAST(sum(CASE WHEN pred = (f.y = 1e0) THEN 1 ELSE 0 END) AS BIGINT)
               AS n_correct,
           round(CAST(sum(CASE WHEN pred = (f.y = 1e0) THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) + 0e0 AS acc_rate
    FROM (
        SELECT f.source, f.y,
               CASE WHEN CAST(least({_STUMP_BKTS - 1}, greatest(0,
                        CAST(floor((CASE b.m.f
                                    WHEN 'ntok' THEN f.x1
                                    WHEN 'wordlen' THEN f.x2
                                    WHEN 'stop' THEN f.x3
                                    ELSE f.x4 END + 5e-1) / {_STUMP_W})
                             AS INT))) AS INT) <= b.m.b
                    THEN 2 * b.m.kl >= b.m.nl
                    ELSE 2 * b.m.kr >= b.m.nr END AS pred
        FROM feats f CROSS JOIN best b
        WHERE b.m IS NOT NULL) f
    GROUP BY f.source""",
)
def decision_stump_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the stump `decision_stump_train` selected: route every
    document down the best split (bucketed on the identical grid
    arithmetic) and predict each side's majority label (keep on ties), then
    publish the per-source prediction and accuracy report. A cross-query
    identity pins the corpus-wide correct count to the best sweep row's
    own counts (max(kl, nl-kl) + max(kr, nr-kr)) — the train sweep and
    the deployed stump cannot disagree.

    Scale: one more pass over the persisted feature table with the 1-row
    best-split struct broadcast on (scalar spine); the rollup map-side
    combines per source."""
    _, best = _stump_frames(spark, sf_dir)
    feats, _, _ = _qct_run(spark, sf_dir)
    b = F.col("m")
    x = (
        F.when(b.getField("f") == "ntok", F.col("x1"))
        .when(b.getField("f") == "wordlen", F.col("x2"))
        .when(b.getField("f") == "stop", F.col("x3"))
        .otherwise(F.col("x4"))
    )
    bkt = F.least(
        F.lit(_STUMP_BKTS - 1),
        F.greatest(
            F.lit(0), F.floor((x + F.lit(0.5)) / F.lit(_STUMP_W)).cast("int")
        ),
    ).cast("int")
    pred = F.when(
        bkt <= b.getField("b"), 2 * b.getField("kl") >= b.getField("nl")
    ).otherwise(2 * b.getField("kr") >= b.getField("nr"))
    ok = (pred == (F.col("y") == F.lit(1.0))).cast("int")
    # a corpus with no valid split (all rows in one grid cell) publishes an
    # EMPTY report, not NULL predictions: the argmin over an empty sweep is
    # a NULL struct, filtered identically in both engines (fuzz catch)
    return (
        feats.crossJoin(F.broadcast(best))
        .filter(F.col("m").isNotNull())
        .select("source", pred.alias("pred"), ok.alias("ok"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("pred").cast("int")).cast("long").alias("n_pred_keep"),
            F.sum("ok").cast("long").alias("n_correct"),
            (
                F.round(F.sum("ok").cast("double") / F.count(F.lit(1)), 6)
                + F.lit(0.0)
            ).alias("acc_rate"),
        )
    )


# ---------------------------------------------------------------------------
# OLS via normal equations: linear probability model y ~ 1 + x1 + x4
# ---------------------------------------------------------------------------

# 6-dp moment rounding: the corpus sums are the ONLY order-sensitive step,
# so the published model is defined as the exact Cramer solve of the
# ROUNDED moment system — both engines then walk identical IEEE arithmetic.
_OLS_MOM_DP = 6
# Singularity guard: |det| below this publishes NULL coefficients instead
# of dividing rounded near-zeros into garbage (and NaN/Inf hash mismatches).
_OLS_DET_EPS = "1e-9"


def _ols_oracle() -> str:
    dp = _OLS_MOM_DP
    mom = f"""mom AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               round(avg(x1), {dp}) + 0e0 AS m1,
               round(avg(x4), {dp}) + 0e0 AS m4,
               round(avg(x1 * x1), {dp}) + 0e0 AS m11,
               round(avg(x1 * x4), {dp}) + 0e0 AS m14,
               round(avg(x4 * x4), {dp}) + 0e0 AS m44,
               round(avg(y), {dp}) + 0e0 AS my,
               round(avg(x1 * y), {dp}) + 0e0 AS m1y,
               round(avg(x4 * y), {dp}) + 0e0 AS m4y,
               round(avg(y * y), {dp}) + 0e0 AS myy
        FROM feats)"""
    det = (
        "(1e0 * (m11 * m44 - m14 * m14)"
        " - m1 * (m1 * m44 - m14 * m4)"
        " + m4 * (m1 * m14 - m11 * m4))"
    )
    det0 = (
        "(my * (m11 * m44 - m14 * m14)"
        " - m1 * (m1y * m44 - m14 * m4y)"
        " + m4 * (m1y * m14 - m11 * m4y))"
    )
    det1 = (
        "(1e0 * (m1y * m44 - m14 * m4y)"
        " - my * (m1 * m44 - m14 * m4)"
        " + m4 * (m1 * m4y - m1y * m4))"
    )
    det4 = (
        "(1e0 * (m11 * m4y - m1y * m14)"
        " - m1 * (m1 * m4y - m1y * m4)"
        " + my * (m1 * m14 - m11 * m4))"
    )
    den = f"(CASE WHEN abs({det}) > {_OLS_DET_EPS} THEN {det} END)"
    sol = f"""sol AS (
        SELECT n, my, myy,
               {det} AS det,
               {det0} / {den} AS b0,
               {det1} / {den} AS b1,
               {det4} / {den} AS b4,
               m1, m4, m11, m14, m44, m1y, m4y
        FROM mom)"""
    sse = (
        "(myy - 2e0 * (b0 * my + b1 * m1y + b4 * m4y)"
        " + (b0 * b0 + 2e0 * (b0 * b1 * m1 + b0 * b4 * m4 + b1 * b4 * m14)"
        " + b1 * b1 * m11 + b4 * b4 * m44))"
    )
    sst = "(myy - my * my)"
    return f"""WITH {_qct_feats_sql()},
    {mom},
    {sol}
    SELECT n,
           CASE WHEN abs(det) > {_OLS_DET_EPS}
                THEN round(b0, 6) + 0e0 END AS b_intercept,
           CASE WHEN abs(det) > {_OLS_DET_EPS}
                THEN round(b1, 6) + 0e0 END AS b_ntok,
           CASE WHEN abs(det) > {_OLS_DET_EPS}
                THEN round(b4, 6) + 0e0 END AS b_ttr,
           CASE WHEN abs(det) > {_OLS_DET_EPS} AND {sst} > 0e0
                THEN round(1e0 - {sse} / {sst}, 6) + 0e0 END AS r2,
           CASE WHEN abs(det) > {_OLS_DET_EPS} AND {sse} > 0e0
                THEN round(sqrt({sse}), 6) + 0e0
                WHEN abs(det) > {_OLS_DET_EPS} THEN 0e0 END AS rmse
    FROM sol"""


@query("ols_normal_equations", oracle=_ols_oracle())
def ols_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit a linear probability model y ~ 1 + x_ntok + x_ttr on the
    trained-gate feature table by the closed-form normal equations: ONE
    pass over the corpus aggregates the 10 Gram/moment cells (each
    rounded at {_OLS_MOM_DP} dp — the only order-sensitive step), and the
    coefficients are the exact 3x3 Cramer solve of the rounded system,
    with R^2 and in-sample RMSE derived from the same moments. A
    |det| <= {_OLS_DET_EPS} system (degenerate corpus: a constant
    feature) publishes NULL coefficients rather than dividing rounded
    near-zeros into noise — mirrored exactly in the oracle.

    Scale: the textbook distributed-OLS shape — moments partial-aggregate
    map-side into one 1-row frame, the solve is driver-free scalar
    arithmetic on that frame, and nothing else touches the corpus. At any
    scale the cost is exactly one fact scan."""
    feats, _, _ = _qct_run(spark, sf_dir)
    dp = _OLS_MOM_DP
    mom = feats.agg(
        F.count(F.lit(1)).alias("n"),
        (F.round(F.avg("x1"), dp) + F.lit(0.0)).alias("m1"),
        (F.round(F.avg("x4"), dp) + F.lit(0.0)).alias("m4"),
        (F.round(F.avg(F.col("x1") * F.col("x1")), dp) + F.lit(0.0)).alias("m11"),
        (F.round(F.avg(F.col("x1") * F.col("x4")), dp) + F.lit(0.0)).alias("m14"),
        (F.round(F.avg(F.col("x4") * F.col("x4")), dp) + F.lit(0.0)).alias("m44"),
        (F.round(F.avg("y"), dp) + F.lit(0.0)).alias("my"),
        (F.round(F.avg(F.col("x1") * F.col("y")), dp) + F.lit(0.0)).alias("m1y"),
        (F.round(F.avg(F.col("x4") * F.col("y")), dp) + F.lit(0.0)).alias("m4y"),
        (F.round(F.avg(F.col("y") * F.col("y")), dp) + F.lit(0.0)).alias("myy"),
    )
    m1, m4 = F.col("m1"), F.col("m4")
    m11, m14, m44 = F.col("m11"), F.col("m14"), F.col("m44")
    my, m1y, m4y, myy = F.col("my"), F.col("m1y"), F.col("m4y"), F.col("myy")
    det = (
        F.lit(1.0) * (m11 * m44 - m14 * m14)
        - m1 * (m1 * m44 - m14 * m4)
        + m4 * (m1 * m14 - m11 * m4)
    )
    det0 = (
        my * (m11 * m44 - m14 * m14)
        - m1 * (m1y * m44 - m14 * m4y)
        + m4 * (m1y * m14 - m11 * m4y)
    )
    det1 = (
        F.lit(1.0) * (m1y * m44 - m14 * m4y)
        - my * (m1 * m44 - m14 * m4)
        + m4 * (m1 * m4y - m1y * m4)
    )
    det4 = (
        F.lit(1.0) * (m11 * m4y - m1y * m14)
        - m1 * (m1 * m4y - m1y * m4)
        + my * (m1 * m14 - m11 * m4)
    )
    # NULL-guarded denominator: a singular system (constant feature on a
    # degenerate corpus) must propagate NULL, not raise ANSI DIVIDE_BY_ZERO
    # or produce Inf — fuzz caught the unguarded form on an all-identical
    # micro-corpus (round-14 catch #22)
    eps = float(_OLS_DET_EPS)
    den = F.when(F.abs(det) > F.lit(eps), det)
    sol = mom.select(
        "n", my.alias("my"), myy.alias("myy"),
        det.alias("det"),
        (det0 / den).alias("b0"),
        (det1 / den).alias("b1"),
        (det4 / den).alias("b4"),
        "m1", "m4", "m11", "m14", "m44", "m1y", "m4y",
    )
    b0, b1, b4 = F.col("b0"), F.col("b1"), F.col("b4")
    my, m1, m4 = F.col("my"), F.col("m1"), F.col("m4")
    m11, m14, m44 = F.col("m11"), F.col("m14"), F.col("m44")
    m1y, m4y, myy = F.col("m1y"), F.col("m4y"), F.col("myy")
    sse = (
        myy
        - F.lit(2.0) * (b0 * my + b1 * m1y + b4 * m4y)
        + (
            b0 * b0
            + F.lit(2.0) * (b0 * b1 * m1 + b0 * b4 * m4 + b1 * b4 * m14)
            + b1 * b1 * m11
            + b4 * b4 * m44
        )
    )
    sst = myy - my * my
    eps = float(_OLS_DET_EPS)
    nondegen = F.abs(F.col("det")) > F.lit(eps)
    return sol.select(
        "n",
        F.when(nondegen, F.round(b0, 6) + F.lit(0.0)).alias("b_intercept"),
        F.when(nondegen, F.round(b1, 6) + F.lit(0.0)).alias("b_ntok"),
        F.when(nondegen, F.round(b4, 6) + F.lit(0.0)).alias("b_ttr"),
        F.when(
            nondegen & (sst > F.lit(0.0)),
            F.round(F.lit(1.0) - sse / sst, 6) + F.lit(0.0),
        ).alias("r2"),
        F.when(
            nondegen & (sse > F.lit(0.0)), F.round(F.sqrt(sse), 6) + F.lit(0.0)
        )
        .when(nondegen, F.lit(0.0))
        .alias("rmse"),
    )


# ---------------------------------------------------------------------------
# Isotonic (PAV) calibration of the trained gate's reliability bins
# ---------------------------------------------------------------------------


def _pav_oracle() -> str:
    parts, _ = _qct_stage_ctes()
    z = _QCT_Z
    zbin = (
        f"greatest({_QCT_CAL_LO}, least({_QCT_CAL_HI},"
        f" CAST(floor({z} / {_QCT_CAL_BIN_W}) AS INT)))"
    )
    parts.append(f"""bins AS MATERIALIZED (
        SELECT {zbin} AS zbin, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN f.y = 1e0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS keep
        FROM feats f, s{_QCT_ITERS} s
        GROUP BY 1)""")
    parts.append("""pre AS (
        SELECT zbin, n, keep,
               CAST(sum(n) OVER (ORDER BY zbin) AS BIGINT) AS cn,
               CAST(sum(keep) OVER (ORDER BY zbin) AS BIGINT) AS ck
        FROM bins)""")
    parts.append("""pairs AS (
        SELECT j.zbin AS jb, k.zbin AS kb,
               CAST(k.ck - (j.ck - j.keep) AS DOUBLE)
                   / CAST(k.cn - (j.cn - j.n) AS DOUBLE) AS m
        FROM pre j JOIN pre k ON k.zbin >= j.zbin)""")
    parts.append("""loj AS (
        SELECT i.zbin, p.jb, min(p.m) AS mn
        FROM bins i JOIN pairs p ON p.jb <= i.zbin AND p.kb >= i.zbin
        GROUP BY i.zbin, p.jb)""")
    parts.append("""fit AS (SELECT zbin, max(mn) AS g FROM loj GROUP BY zbin)""")
    return (
        "WITH " + ",\n    ".join(parts) + """
    SELECT b.zbin, b.n AS n_docs, b.keep AS n_keep,
           round(CAST(b.keep AS DOUBLE) / CAST(b.n AS DOUBLE), 6) + 0e0
               AS raw_rate,
           round(f.g, 6) + 0e0 AS iso_rate
    FROM bins b JOIN fit f ON f.zbin = b.zbin"""
    )


@query("isotonic_calibration_pav", oracle=_pav_oracle())
def isotonic_calibration_pav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (pool-adjacent-violators) calibration of the classifier
    `train_quality_classifier` fit: the reliability bins from
    `trained_gate_calibration` (cut on the exact final-stage logit) get
    the monotone-non-decreasing keep-rate fit via the exact minimax
    characterization g(i) = max_{{j<=i}} min_{{k>=i}} mean(y over bins
    j..k) — the closed form of PAV, expressed relationally so no
    sequential pooling loop is needed. Interval means divide integer
    prefix-sum counts (bit-identical doubles in both engines); `iso_rate`
    is non-decreasing in zbin (invariant-pinned) and the bin populations
    match `trained_gate_calibration` exactly (cross-query identity). This
    is the standard post-hoc step that turns the trained gate's scores
    into usable probabilities.

    Scale: the corpus contributes exactly one scalar-spine binning pass
    (map-side combined to <= {_QCT_CAL_HI - _QCT_CAL_LO + 1} bins); the
    whole minimax (pairs and two nested extrema) runs on that bounded bin
    frame — O(B^3) rows where B <= 16, independent of corpus size."""
    feats, _, w_frame = _qct_run(spark, sf_dir)
    j = feats.crossJoin(F.broadcast(w_frame))
    z = (
        F.col("b")
        + F.col("w1") * F.col("x1")
        + F.col("w2") * F.col("x2")
        + F.col("w3") * F.col("x3")
        + F.col("w4") * F.col("x4")
    )
    zbin = F.greatest(
        F.lit(_QCT_CAL_LO),
        F.least(F.lit(_QCT_CAL_HI), F.floor(z / F.lit(_QCT_CAL_BIN_W)).cast("int")),
    )
    bins = persist_barrier(
        j.select(zbin.alias("zbin"), F.col("y"))
        .groupBy("zbin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("y") == 1.0, 1).otherwise(0)).cast("long").alias("keep"),
        ),
        "pav_bins",
    )
    # bounded bin frame (<= 16 rows): the single-partition window and the
    # quadratic/cubic pair joins below are driver-scale by construction
    wo = Window.orderBy("zbin")
    pre = bins.select(
        "zbin",
        "n",
        "keep",
        F.sum("n").over(wo).cast("long").alias("cn"),
        F.sum("keep").over(wo).cast("long").alias("ck"),
    )
    jf = pre.select(
        F.col("zbin").alias("jb"),
        (F.col("ck") - F.col("keep")).alias("ck_before"),
        (F.col("cn") - F.col("n")).alias("cn_before"),
    )
    kf = pre.select(F.col("zbin").alias("kb"), "cn", "ck")
    pairs = jf.join(kf, F.col("kb") >= F.col("jb")).select(
        "jb",
        "kb",
        (
            (F.col("ck") - F.col("ck_before")).cast("double")
            / (F.col("cn") - F.col("cn_before")).cast("double")
        ).alias("m"),
    )
    loj = (
        bins.select("zbin")
        .join(pairs, (F.col("jb") <= F.col("zbin")) & (F.col("kb") >= F.col("zbin")))
        .groupBy("zbin", "jb")
        .agg(F.min("m").alias("mn"))
    )
    fit = loj.groupBy("zbin").agg(F.max("mn").alias("g"))
    return bins.join(fit, "zbin").select(
        "zbin",
        F.col("n").alias("n_docs"),
        F.col("keep").alias("n_keep"),
        (
            F.round(F.col("keep").cast("double") / F.col("n").cast("double"), 6)
            + F.lit(0.0)
        ).alias("raw_rate"),
        (F.round("g", 6) + F.lit(0.0)).alias("iso_rate"),
    )


# ---------------------------------------------------------------------------
# Gradient-boosted stumps (L2Boost): the stump primitive iterated on
# residuals — the depth-1 GBDT trainer, closed in-engine
# ---------------------------------------------------------------------------

# Boosting rounds and shrinkage. The whole trajectory runs in INTEGER
# micro-units: labels are y_micro in {0, 1_000_000}, the model F is a
# BIGINT micro score, leaf values round to integer micro-units — so
# residual sums, split gains, and the >= 0.5 gate (F >= 500_000) are exact
# in both engines; no float aggregate ever feeds a decision.
_GB_ROUNDS = 3
_GB_LR = 0.5
_GB_GATE = 500_000  # F >= 0.5 in micro-units


def _gb_bucket_sql(x: str) -> str:
    return (
        f"CAST(least({_STUMP_BKTS - 1}, greatest(0,"
        f" CAST(floor(({x} + 5e-1) / {_STUMP_W}) AS INT))) AS INT)"
    )


def _gb_f_sql(m: int) -> str:
    """F_m in micro-units as a SQL expression over feats row f and the
    1-row split frames s1..sm (joined in scope). COALESCE makes a NULL
    split (no valid candidate — degenerate corpus) a no-op round."""
    expr = "f0.f"
    for i in range(1, m + 1):
        x = (
            f"(CASE s{i}.feat WHEN 'ntok' THEN f.x1 WHEN 'wordlen' THEN f.x2"
            f" WHEN 'stop' THEN f.x3 ELSE f.x4 END)"
        )
        expr = (
            f"({expr} + COALESCE(CASE WHEN {_gb_bucket_sql(x)} <= s{i}.bkt"
            f" THEN s{i}.vl ELSE s{i}.vr END, 0))"
        )
    return expr


def _gb_ctes() -> tuple[list[str], list[str]]:
    """Unrolled L2Boost CTE chain; returns (CTE parts, per-stage SELECTs).
    Stage m's metrics (mse, gate counts at F_m) come from hist_{m+1}'s
    'ntok' slice — every doc appears exactly once per feature, so one
    bounded histogram pass per round serves both the next split search and
    the previous stage's published metrics."""
    unions = "\n            UNION ALL ".join(
        f"SELECT '{name}' AS feat, f.{col} AS x, f.y_micro AS ym,"
        f" {{F}} AS fm FROM feats2 f{{joins}}"
        for name, col in _STUMP_FEATS
    )
    parts = [
        _qct_feats_sql(),
        """feats2 AS MATERIALIZED (
        SELECT *, CAST(CASE WHEN y = 1e0 THEN 1000000 ELSE 0 END AS BIGINT)
            AS y_micro
        FROM feats)""",
        """f0 AS (SELECT CAST(round(1e6 * sum(CASE WHEN y = 1e0 THEN 1 ELSE 0 END)
            / count(*), 0) AS BIGINT) AS f FROM feats2)""",
    ]
    stage_rows = []
    for m in range(1, _GB_ROUNDS + 2):
        joins = ", f0" + "".join(f", s{i}" for i in range(1, m))
        f_expr = _gb_f_sql(m - 1)
        lng = unions.format(F=f_expr, joins=joins)
        parts.append(f"""hist{m} AS MATERIALIZED (
        SELECT feat, {_gb_bucket_sql('x')} AS bkt,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(ym - fm) AS BIGINT) AS sr,
               CAST(sum(CASE WHEN fm >= {_GB_GATE} THEN 1 ELSE 0 END) AS BIGINT)
                   AS npass,
               CAST(sum(CASE WHEN (fm >= {_GB_GATE}) = (ym = 1000000)
                             THEN 1 ELSE 0 END) AS BIGINT) AS nok,
               sum((CAST(ym - fm AS DOUBLE) / 1e6)
                   * (CAST(ym - fm AS DOUBLE) / 1e6)) AS sse
        FROM ({lng})
        GROUP BY 1, 2)""")
        # stage m-1 metrics from the 'ntok' slice (each doc exactly once)
        split_cols = (
            f"""s{m - 1}.feat AS feature, s{m - 1}.bkt + 1 AS thr_bucket,
           s{m - 1}.vl AS v_left_micro, s{m - 1}.vr AS v_right_micro"""
            if m - 1 >= 1
            else """CAST(NULL AS VARCHAR) AS feature, CAST(NULL AS INT) AS thr_bucket,
           CAST(NULL AS BIGINT) AS v_left_micro, CAST(NULL AS BIGINT) AS v_right_micro"""
        )
        stage_joins = f", s{m - 1}" if m - 1 >= 1 else ""
        stage_rows.append(f"""(SELECT {m - 1} AS stage, {split_cols},
           round(CAST(h.sse_t AS DOUBLE) / h.n_t, 6) + 0e0 AS mse,
           h.npass_t AS n_pass, h.nok_t AS n_correct
    FROM (SELECT CAST(sum(n) AS BIGINT) AS n_t, sum(sse) AS sse_t,
                 CAST(sum(npass) AS BIGINT) AS npass_t,
                 CAST(sum(nok) AS BIGINT) AS nok_t
          FROM hist{m} WHERE feat = 'ntok') h{stage_joins})""")
        if m <= _GB_ROUNDS:
            # split search on the bounded histogram: maximize
            # SL^2/nL + SR^2/nR (exact-integer sums; gain doubles derive
            # from them through one fixed expression shape)
            parts.append(f"""cum{m} AS (
        SELECT feat, bkt,
               CAST(sum(n) OVER (PARTITION BY feat ORDER BY bkt) AS BIGINT) AS nl,
               CAST(sum(sr) OVER (PARTITION BY feat ORDER BY bkt) AS BIGINT) AS sl,
               CAST(sum(n) OVER (PARTITION BY feat) AS BIGINT) AS tn,
               CAST(sum(sr) OVER (PARTITION BY feat) AS BIGINT) AS ts
        FROM hist{m})""")
            gain = (
                "(CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)"
                " + CAST(ts - sl AS DOUBLE) * CAST(ts - sl AS DOUBLE)"
                " / CAST(tn - nl AS DOUBLE))"
            )
            parts.append(f"""s{m} AS (
        SELECT mm.ms.feat AS feat, mm.ms.bkt AS bkt,
               mm.ms.vl AS vl, mm.ms.vr AS vr
        FROM (SELECT min(struct_pack(ng := -{gain}, feat := feat,
                   bkt := bkt,
                   vl := CAST(round({_GB_LR} * CAST(sl AS DOUBLE)
                              / CAST(nl AS DOUBLE), 0) AS BIGINT),
                   vr := CAST(round({_GB_LR} * CAST(ts - sl AS DOUBLE)
                              / CAST(tn - nl AS DOUBLE), 0) AS BIGINT))) AS ms
              FROM (SELECT * FROM cum{m} WHERE nl < tn)) mm)""")
    return parts, stage_rows


def _gb_oracle() -> str:
    parts, rows = _gb_ctes()
    return "WITH " + ",\n    ".join(parts) + "\n" + "\nUNION ALL\n".join(rows)


def _gb_bkt_col(x):
    return F.least(
        F.lit(_STUMP_BKTS - 1),
        F.greatest(
            F.lit(0), F.floor((x + F.lit(0.5)) / F.lit(_STUMP_W)).cast("int")
        ),
    ).cast("int")


def _gb_run(spark: SparkSession, sf_dir: str):
    """Run the unrolled L2Boost loop; returns (feats2, f0, splits, stage
    frames) where splits is the list of persisted 1-row split frames
    (columns sfeat{i}/sbkt{i}/svl{i}/svr{i}) and stage frames are the
    published per-stage rows. Shared by gbdt_stump_boost and
    gbdt_gate_apply so the apply serves the exact trained ensemble."""
    feats, _, _ = _qct_run(spark, sf_dir)
    feats2 = feats.withColumn(
        "y_micro",
        F.when(F.col("y") == 1.0, F.lit(1_000_000)).otherwise(0).cast("long"),
    )
    f0 = persist_barrier(
        feats2.agg(
            F.round(
                F.lit(1e6)
                * F.sum(F.when(F.col("y") == 1.0, 1).otherwise(0))
                / F.count(F.lit(1)),
                0,
            )
            .cast("long")
            .alias("f0f")
        ),
        "gb_f0",
    )

    def f_expr(m: int):
        """F_m in micro-units over a frame carrying f0f and sfeat{i}.."""
        expr = F.col("f0f")
        for i in range(1, m + 1):
            x = (
                F.when(F.col(f"sfeat{i}") == "ntok", F.col("x1"))
                .when(F.col(f"sfeat{i}") == "wordlen", F.col("x2"))
                .when(F.col(f"sfeat{i}") == "stop", F.col("x3"))
                .otherwise(F.col("x4"))
            )
            expr = expr + F.coalesce(
                F.when(_gb_bkt_col(x) <= F.col(f"sbkt{i}"), F.col(f"svl{i}"))
                .otherwise(F.col(f"svr{i}")),
                F.lit(0),
            )
        return expr

    splits: list[DataFrame] = []
    stage_rows: list[DataFrame] = []
    for m in range(1, _GB_ROUNDS + 2):
        j = feats2.crossJoin(F.broadcast(f0))
        for s in splits:
            j = j.crossJoin(F.broadcast(s))
        fm = f_expr(m - 1)
        lng = j.select(
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(name).alias("feat"), F.col(col).alias("x"))
                        for name, col in _STUMP_FEATS
                    ]
                )
            ).alias("fx"),
            F.col("y_micro").alias("ym"),
            fm.alias("fm"),
        ).select(F.col("fx.feat").alias("feat"), F.col("fx.x").alias("x"), "ym", "fm")
        r = F.col("ym") - F.col("fm")
        hist = persist_barrier(
            lng.groupBy("feat", _gb_bkt_col(F.col("x")).alias("bkt")).agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(r).cast("long").alias("sr"),
                F.sum(F.when(F.col("fm") >= _GB_GATE, 1).otherwise(0))
                .cast("long")
                .alias("npass"),
                F.sum(
                    F.when(
                        (F.col("fm") >= _GB_GATE) == (F.col("ym") == 1_000_000),
                        1,
                    ).otherwise(0)
                )
                .cast("long")
                .alias("nok"),
                F.sum(
                    (r.cast("double") / F.lit(1e6)) * (r.cast("double") / F.lit(1e6))
                ).alias("sse"),
            ),
            f"gb_hist{m}",
        )
        tot = hist.filter(F.col("feat") == "ntok").agg(
            F.sum("n").cast("long").alias("n_t"),
            F.sum("sse").alias("sse_t"),
            F.sum("npass").cast("long").alias("npass_t"),
            F.sum("nok").cast("long").alias("nok_t"),
        )
        i = m - 1
        if i >= 1:
            tot = tot.crossJoin(F.broadcast(splits[i - 1]))
            split_cols = [
                F.col(f"sfeat{i}").alias("feature"),
                (F.col(f"sbkt{i}") + 1).alias("thr_bucket"),
                F.col(f"svl{i}").alias("v_left_micro"),
                F.col(f"svr{i}").alias("v_right_micro"),
            ]
        else:
            split_cols = [
                F.lit(None).cast("string").alias("feature"),
                F.lit(None).cast("int").alias("thr_bucket"),
                F.lit(None).cast("long").alias("v_left_micro"),
                F.lit(None).cast("long").alias("v_right_micro"),
            ]
        stage_rows.append(
            tot.select(
                F.lit(i).alias("stage"),
                *split_cols,
                (
                    F.round(F.col("sse_t") / F.col("n_t").cast("double"), 6)
                    + F.lit(0.0)
                ).alias("mse"),
                F.col("npass_t").alias("n_pass"),
                F.col("nok_t").alias("n_correct"),
            )
        )
        if m <= _GB_ROUNDS:
            wo = Window.partitionBy("feat").orderBy("bkt")
            wf = Window.partitionBy("feat")
            cum = hist.select(
                "feat",
                "bkt",
                F.sum("n").over(wo).cast("long").alias("nl"),
                F.sum("sr").over(wo).cast("long").alias("sl"),
                F.sum("n").over(wf).cast("long").alias("tn"),
                F.sum("sr").over(wf).cast("long").alias("ts"),
            ).filter(F.col("nl") < F.col("tn"))
            gain = F.col("sl").cast("double") * F.col("sl").cast("double") / F.col(
                "nl"
            ).cast("double") + (F.col("ts") - F.col("sl")).cast("double") * (
                F.col("ts") - F.col("sl")
            ).cast("double") / (F.col("tn") - F.col("nl")).cast("double")
            vl = (
                F.round(
                    F.lit(_GB_LR) * F.col("sl").cast("double") / F.col("nl").cast("double"),
                    0,
                )
            ).cast("long")
            vr = (
                F.round(
                    F.lit(_GB_LR)
                    * (F.col("ts") - F.col("sl")).cast("double")
                    / (F.col("tn") - F.col("nl")).cast("double"),
                    0,
                )
            ).cast("long")
            s = persist_barrier(
                cum.agg(
                    F.min(
                        F.struct(
                            (-gain).alias("ng"),
                            F.col("feat").alias("feat"),
                            F.col("bkt").alias("bkt"),
                            vl.alias("vl"),
                            vr.alias("vr"),
                        )
                    ).alias("ms")
                ).select(
                    F.col("ms").getField("feat").alias(f"sfeat{m}"),
                    F.col("ms").getField("bkt").alias(f"sbkt{m}"),
                    F.col("ms").getField("vl").alias(f"svl{m}"),
                    F.col("ms").getField("vr").alias(f"svr{m}"),
                ),
                f"gb_s{m}",
            )
            splits.append(s)
    return feats2, f0, splits, stage_rows


@query("gbdt_stump_boost", oracle=_gb_oracle())
def gbdt_stump_boost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a gradient-boosted ensemble of decision stumps (L2Boost,
    {_GB_ROUNDS} rounds, shrinkage {_GB_LR}) on the trained-gate feature
    table against the Gopher keep label — the `decision_stump_train`
    histogram primitive iterated on residuals, which is depth-1 GBDT, the
    workhorse quality-classifier family at corpus scale. One row per stage
    carries the chosen split, its leaf values, and the train MSE and
    >=0.5-gate census AT that stage's model.

    The entire trajectory is INTEGER micro-unit arithmetic: labels are
    y*1e6, the model F is a BIGINT score, leaf values round to integer
    micro-units, residual sums are exact BIGINTs — so split gains
    (SL^2/nL + SR^2/nR doubles derived from integer sums through one fixed
    expression) and the gate census are bit-identical cross-engine; ties
    break (gain DESC, feature ASC, bucket ASC). A corpus with no valid
    candidate publishes a NULL no-op round (COALESCE keeps F unchanged).
    `mse` is monotone non-increasing across stages (lr < 2 on the squared
    loss; invariant-pinned).

    Scale: per round exactly ONE partial-aggregated histogram shuffle
    bounded by |features| x {_STUMP_BKTS} cells — the corpus never
    shuffles; stage metrics ride the next round's histogram ('ntok' slice
    covers every doc exactly once), so k rounds cost k+1 fact passes over
    the persisted feature table with all model state in broadcast 1-row
    frames. This is exactly the distributed-GBDT shape (histogram
    aggregation + driver-held split state) production learners use."""
    _, _, _, stage_rows = _gb_run(spark, sf_dir)
    out = stage_rows[0]
    for r in stage_rows[1:]:
        out = out.unionByName(r)
    return out


def _gb_apply_oracle() -> str:
    parts, _ = _gb_ctes()
    joins = ", f0" + "".join(f", s{i}" for i in range(1, _GB_ROUNDS + 1))
    fk = _gb_f_sql(_GB_ROUNDS)
    return (
        "WITH " + ",\n    ".join(parts) + f"""
    SELECT f.source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN {fk} >= {_GB_GATE} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pass,
           CAST(sum(CASE WHEN ({fk} >= {_GB_GATE}) = (f.y_micro = 1000000)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           round(CAST(sum(CASE WHEN ({fk} >= {_GB_GATE}) = (f.y_micro = 1000000)
                              THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) + 0e0
               AS acc_rate
    FROM feats2 f{joins}
    GROUP BY f.source"""
    )


@query("gbdt_gate_apply", oracle=_gb_apply_oracle())
def gbdt_gate_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the boosted ensemble `gbdt_stump_boost` just trained as a
    corpus quality gate (keep when the final micro-score F >= 0.5): the
    per-source pass/accuracy report, computed at the exact integer model
    the final training stage published. Cross-query identity pins the
    corpus-wide n_pass / n_correct to stage {_GB_ROUNDS}'s own census —
    the training trajectory and the deployed ensemble cannot drift.

    Scale: one more pass over the persisted feature table with the
    {_GB_ROUNDS} 1-row split frames and the base score broadcast on
    (scalar spine); the rollup map-side combines per source."""
    feats2, f0, splits, _ = _gb_run(spark, sf_dir)
    j = feats2.crossJoin(F.broadcast(f0))
    for s in splits:
        j = j.crossJoin(F.broadcast(s))
    expr = F.col("f0f")
    for i in range(1, _GB_ROUNDS + 1):
        x = (
            F.when(F.col(f"sfeat{i}") == "ntok", F.col("x1"))
            .when(F.col(f"sfeat{i}") == "wordlen", F.col("x2"))
            .when(F.col(f"sfeat{i}") == "stop", F.col("x3"))
            .otherwise(F.col("x4"))
        )
        expr = expr + F.coalesce(
            F.when(_gb_bkt_col(x) <= F.col(f"sbkt{i}"), F.col(f"svl{i}"))
            .otherwise(F.col(f"svr{i}")),
            F.lit(0),
        )
    gate = expr >= F.lit(_GB_GATE)
    ok = (gate == (F.col("y_micro") == 1_000_000)).cast("int")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(gate.cast("int")).cast("long").alias("n_pass"),
        F.sum(ok).cast("long").alias("n_correct"),
        (
            F.round(F.sum(ok).cast("double") / F.count(F.lit(1)), 6) + F.lit(0.0)
        ).alias("acc_rate"),
    )
