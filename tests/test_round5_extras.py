"""Semantic tests for the round-5 additions: winnowing fingerprints obey the
MOSS guarantee, containment is asymmetric and bounded, token-budget
selection respects the per-source budget and order, the vocab coverage
curve is monotone, anisotropy is bounded, and the distributed ntile
reproduces exact quartile sizes."""

import pyspark.sql.functions as F

from datapipeline_ops_spark.queries.curation_extra import (
    CONTAIN_TAU,
    TOKEN_BUDGET_PER_SOURCE,
    WINNOW_MIN_SHARED,
    WINNOW_W,
    _winnow_selected,
    containment_pairs,
    token_budget_select,
    winnow_match_pairs,
    winnowing_fingerprints,
)
from datapipeline_ops_spark.queries.relational_extra import ntile_price_quartiles
from datapipeline_ops_spark.queries.similarity import embedding_anisotropy
from datapipeline_ops_spark.queries.textstats import (
    VOCAB_CURVE_KS,
    vocab_coverage_curve,
)
from datapipeline_ops_spark.tables import load_table


def test_winnow_density_and_bounds(spark, sf_dir):
    # winnowing picks ~2/(w+1) of positions; it must never select MORE
    # fingerprints than windows, and every doc must have >= 1 fingerprint
    docs = load_table(spark, sf_dir, "documents").count()
    fp = winnowing_fingerprints(spark, sf_dir)
    rows = fp.collect()
    assert len(rows) == docs
    assert all(r.n_fp >= 1 and r.n_distinct_hash <= r.n_fp for r in rows)


def test_winnow_substring_guarantee(spark):
    # two docs sharing a long run of tokens MUST share a fingerprint hash
    # (guarantee: any shared substring of >= k + w - 1 tokens surfaces)
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [
            (1, shared + " tail one two three"),
            (2, "prefix words here " + shared),
            (3, "completely different tokens nothing in common at all"),
        ],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("_winnow_test")
    import datapipeline_ops_spark.queries.curation_extra as cx
    from datapipeline_ops_spark.functions.hashing import hash64
    from datapipeline_ops_spark.functions.text import shingles

    sh = df.select("doc_id", shingles(F.col("text")).alias("sh"))
    ex = sh.select(
        "doc_id", F.size("sh").alias("m"), F.posexplode("sh").alias("pos0", "s")
    ).select(
        "doc_id",
        "m",
        (F.col("pos0") + 1).alias("pos"),
        (
            (hash64(F.col("s")) % cx._WIN_HASH_MOD) * (1 << cx._WIN_POS_BITS)
            + F.col("pos0")
            + 1
        ).alias("enc"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, WINNOW_W - 1)
    sel = (
        ex.withColumn("enc", F.min("enc").over(w))
        .filter(F.col("pos") <= F.greatest(F.col("m") - (WINNOW_W - 1), F.lit(1)))
        .select("doc_id", F.shiftright("enc", cx._WIN_POS_BITS).alias("h"))
        .distinct()
    )
    h1 = {r.h for r in sel.filter("doc_id = 1").collect()}
    h2 = {r.h for r in sel.filter("doc_id = 2").collect()}
    h3 = {r.h for r in sel.filter("doc_id = 3").collect()}
    assert h1 & h2, "shared substring must share at least one fingerprint"
    assert not (h1 & h3) and not (h2 & h3)


def test_winnow_match_pairs_symmetric_dedup(spark, sf_dir):
    pairs = winnow_match_pairs(spark, sf_dir).collect()
    assert all(r.doc_a < r.doc_b for r in pairs)
    assert all(r.n_shared >= WINNOW_MIN_SHARED for r in pairs)


def test_containment_bounds_and_asymmetry(spark, sf_dir):
    rows = containment_pairs(spark, sf_dir).collect()
    assert all(CONTAIN_TAU <= r.containment <= 1.0 + 1e-12 for r in rows)
    assert all(r.doc_a != r.doc_b for r in rows)


def test_token_budget_respected_and_greedy(spark, sf_dir):
    kept = token_budget_select(spark, sf_dir)
    per_src = kept.groupBy("source").agg(F.max("cum_tokens").alias("mx")).collect()
    assert all(r.mx <= TOKEN_BUDGET_PER_SOURCE for r in per_src)
    # greedy: within a source, every kept doc is at least as long as any
    # kept doc with a later rank position (cum_tokens increases as n_tokens
    # decreases down the ranking)
    rows = kept.orderBy("source", "cum_tokens").collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r.n_tokens)
    for toks in by_src.values():
        assert toks == sorted(toks, reverse=True)


def test_vocab_coverage_monotone(spark, sf_dir):
    rows = {r.k: r for r in vocab_coverage_curve(spark, sf_dir).collect()}
    ks = sorted(VOCAB_CURVE_KS)
    for a, b in zip(ks, ks[1:]):
        assert rows[a].coverage <= rows[b].coverage + 1e-12
    assert all(0.0 < rows[k].coverage <= 1.0 + 1e-12 for k in ks)


def test_anisotropy_bounded(spark, sf_dir):
    r = embedding_anisotropy(spark, sf_dir).collect()[0]
    # ||mean of unit vectors||^2 is in [0, 1]
    assert 0.0 <= r.anisotropy <= 1.0 + 1e-12
    assert r.n_vecs > 0 and r.dim > 0


def test_ntile_exact_quartile_sizes(spark, sf_dir):
    n = load_table(spark, sf_dir, "orders").count()
    rows = {r.quartile: r for r in ntile_price_quartiles(spark, sf_dir).collect()}
    assert set(rows) == {1, 2, 3, 4}
    base, rem = divmod(n, 4)
    for q in range(1, 5):
        assert rows[q].n == base + (1 if q <= rem else 0)
    # buckets must be value-ordered: hi of q <= lo of q+1
    for q in range(1, 4):
        assert rows[q].hi <= rows[q + 1].lo


def test_bloom_admission_invariants(spark, sf_dir):
    from datapipeline_ops_spark.queries.sampling_sketch import bloom_dedup_admission

    out = bloom_dedup_admission(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        # no false negatives, ever: an exact dup must be bloom-positive
        if r.exact_dup:
            assert r.bloom_maybe
        # false_positive is exactly (maybe AND NOT dup)
        assert r.false_positive == (r.bloom_maybe and not r.exact_dup)


def test_count_min_guarantees(spark, sf_dir):
    from datapipeline_ops_spark.queries.sampling_sketch import count_min_freq_audit

    out = count_min_freq_audit(spark, sf_dir).collect()
    assert len(out) > 0
    assert all(r.never_underestimates for r in out)
    assert all(r.cms_estimate >= r.exact_n for r in out)
    assert all(r.within_eps for r in out)


def test_pareto_frontier_is_nondominated_and_complete(spark, sf_dir):
    import pyspark.sql.functions as F

    from datapipeline_ops_spark.functions.text import tokens as _tokens
    from datapipeline_ops_spark.queries.curation_extra import pareto_frontier_docs

    d = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    pts = [
        (r.doc_id, r.nd, r.nt)
        for r in d.select(
            "doc_id",
            F.size(F.array_distinct(toks)).alias("nd"),
            F.size(toks).alias("nt"),
        ).collect()
    ]
    def dominated(a, pts):
        return any(
            b[1] >= a[1] and b[2] >= a[2] and (b[1] > a[1] or b[2] > a[2])
            for b in pts
        )
    expect = {p[0] for p in pts if not dominated(p, pts)}
    got = {r.doc_id for r in pareto_frontier_docs(spark, sf_dir).collect()}
    assert got == expect


def test_kmv_sketch_properties(spark, sf_dir):
    from datapipeline_ops_spark.queries.sampling_sketch import KMV_K, kmv_set_ops_audit

    rows = kmv_set_ops_audit(spark, sf_dir).collect()
    assert len(rows) == 10  # 5 choose 2 type pairs
    for r in rows:
        assert r.n_union_sketch <= KMV_K
        assert r.within_tol
        assert r.est_union >= r.est_inter - 1e-9  # union >= intersection
        if r.n_union_sketch < KMV_K:
            # small-set branch: the sketch is the set — estimates are exact
            assert r.est_inter == r.exact_inter


def test_seasonal_decomposition_reconstructs(spark, sf_dir):
    from datapipeline_ops_spark.queries.windows_extra import seasonal_decompose_daily

    rows = seasonal_decompose_daily(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert abs((r.trend + r.seasonal + r.residual) - r.value) < 1e-6 * max(
            abs(r.value), 1.0
        )


def test_cusum_properties(spark, sf_dir):
    from datapipeline_ops_spark.queries.windows_extra import changepoint_cusum_daily

    rows = sorted(changepoint_cusum_daily(spark, sf_dir).collect(), key=lambda r: r.day)
    # the cusum closes at ~0 by construction (total - days * mean)
    assert abs(rows[-1].cusum) < 1e-6
    peaks = [r for r in rows if r.is_changepoint]
    assert len(peaks) >= 1
    peak_val = max(abs(r.cusum) for r in rows)
    assert all(abs(p.cusum) == peak_val for p in peaks)


def test_bootstrap_ci_brackets_mean(spark, sf_dir):
    from datapipeline_ops_spark.queries.sampling_sketch import bootstrap_mean_ci

    r = bootstrap_mean_ci(spark, sf_dir).collect()[0]
    assert r.ci_lo <= r.ci_hi
    # the point estimate sits inside (or at worst near) the bootstrap CI
    spread = max(r.ci_hi - r.ci_lo, 1e-9)
    assert r.ci_lo - spread <= r.mean_value <= r.ci_hi + spread
    assert r.boot_se >= 0.0 and r.n_replicates == 20


def test_html_extract_recovers_content_exactly(spark, sf_dir):
    from datapipeline_ops_spark.queries.web_curation import html_text_extract

    rows = html_text_extract(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r.matches_expected for r in rows)


def test_url_canonical_collapses_spellings(spark, sf_dir):
    from datapipeline_ops_spark.queries.web_curation import url_canonical_dedup

    rows = url_canonical_dedup(spark, sf_dir).collect()
    for r in rows:
        u = r.canonical_url
        assert u == u.lower()
        assert "#" not in u and "utm_" not in u and ":443" not in u
        assert not u.endswith("?") and not u.endswith("&")
        assert r.n_dups >= 1 and r.keeper_doc_id >= 0


def test_robots_longest_prefix_and_allow_tiebreak(spark, sf_dir):
    import re as _re

    from datapipeline_ops_spark.queries.web_curation import robots_rules_apply

    rows = robots_rules_apply(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        n = int(_re.search(r"(\d+)", r.host).group(1))
        tail = r.path[len("/p/"):]
        if n % 3 != 0:
            # host has no /p/ disallow: allowed either via the default rule
            # or the (still-present) longer /p/1 allow rule
            assert r.allowed
            assert r.matched_prefix == ("/p/1" if tail.startswith("1") else "/")
        elif tail.startswith("1"):
            # the longer /p/1 exception overrides the /p/ disallow
            assert r.allowed and r.matched_prefix == "/p/1"
        else:
            assert not r.allowed and r.matched_prefix == "/p/"
