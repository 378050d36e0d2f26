"""Semantic tests for the drift/data-quality monitoring family."""

import math

import pyspark.sql.functions as F

from datapipeline_ops_spark.queries import QUERIES
from datapipeline_ops_spark.tables import load_table


def q(name, spark, sf_dir):
    return QUERIES[name].fn(spark, sf_dir)


def test_ks_drift_binned_no_drift_on_iid_split(spark, sf_dir):
    row = q("ks_drift_binned", spark, sf_dir).collect()[0]
    assert 0.0 <= row.ks_stat <= 1.0
    assert row.n_a > 0 and row.n_b > 0
    expected_crit = 1.358 * math.sqrt((row.n_a + row.n_b) / (row.n_a * row.n_b))
    assert abs(row.ks_crit - expected_crit) < 1e-12
    # even/odd user_id halves draw from the same distribution: no drift
    assert row.ks_stat < row.ks_crit and not row.drift


def test_psi_stability_report_terms_and_total(spark, sf_dir):
    rows = q("psi_stability_report", spark, sf_dir).collect()
    assert 1 <= len(rows) <= 10
    total = sum(r.psi_term for r in rows)
    for r in rows:
        assert r.pa >= 1e-6 and r.pb >= 1e-6
        # each term of sum (pa-pb)ln(pa/pb) is non-negative
        assert r.psi_term >= 0.0
        assert abs(r.psi_total - total) < 1e-12
    # time-halves of an i.i.d. stream: PSI far below the 0.2 alarm bar
    assert total < 0.2


def test_chi2_type_by_dow_contingency(spark, sf_dir):
    rows = q("chi2_type_by_dow", spark, sf_dir).collect()
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r.n for r in rows) == n_events
    assert {r.dow for r in rows} <= set(range(7))
    total = sum(r.contrib for r in rows)
    for r in rows:
        assert r.expected > 0 and r.contrib >= 0
        assert abs(r.chi2_total - total) < 1e-9


def test_gopher_quality_flags_match_python_recompute(spark, sf_dir):
    out = {r.doc_id: r for r in q("gopher_quality_flags", spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").limit(50).collect()
    assert len(out) >= len(docs)
    for d in docs:
        words = d.text.split()
        r = out[d.doc_id]
        assert r.n_words == len(words)
        assert abs(r.mean_word_len - sum(len(w) for w in words) / len(words)) < 1e-9
        alpha = sum(1 for w in words if any(c.isalpha() for c in w)) / len(words)
        assert abs(r.alpha_frac - alpha) < 1e-9
        assert r.keep == (
            r.flag_word_count and r.flag_word_len and r.flag_alpha
        )


def test_dead_letter_split_routes_about_ten_percent(spark, sf_dir):
    rows = q("dead_letter_split", spark, sf_dir).collect()
    n_events = load_table(spark, sf_dir, "events").count()
    n_total = sum(r.n_total for r in rows)
    n_dlq = sum(r.n_dlq for r in rows)
    assert n_total == n_events
    for r in rows:
        assert r.n_ok + r.n_dlq == r.n_total
        assert r.sum_k is not None and r.sum_k > 0
    assert 0.05 < n_dlq / n_total < 0.15


def test_auc_binned_separates_length_label(spark, sf_dir):
    row = q("auc_binned_report", spark, sf_dir).collect()[0]
    assert row.n_pos > 0 and row.n_neg > 0
    # word count is near-monotone in n_chars, so AUC must be ~1
    assert 0.95 <= row.auc <= 1.0
    assert abs(row.gini - (2 * row.auc - 1)) < 1e-12


def test_info_gain_bounds_and_consistency(spark, sf_dir):
    import math

    row = q("info_gain_type_by_dow", spark, sf_dir).collect()[0]
    # entropies in nats, bounded by ln(#types); conditioning cannot raise entropy
    assert 0.0 < row.h_type <= math.log(5) + 1e-12
    assert 0.0 <= row.h_type_given_dow <= row.h_type + 1e-12
    # published columns are independently rounded to 6 dp (cross-engine
    # sign-of-epsilon fix), so derived identities hold only to ~1e-6
    assert abs(row.info_gain - (row.h_type - row.h_type_given_dow)) < 2e-6
    assert abs(row.info_gain_ratio - row.info_gain / row.h_type) < 2e-6
    # i.i.d. stream: weekday carries (almost) no information about type
    assert row.info_gain_ratio < 0.05
