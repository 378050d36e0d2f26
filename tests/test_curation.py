"""Semantic tests for the curation_extra family: decontamination flags what
it should, PII redaction removes every injected pattern, mixing is a pure
deterministic function, packing conserves tokens, incremental dedup admits
no known duplicate."""

import pyspark.sql.functions as F

from datapipeline_ops_spark.queries.curation_extra import (
    _BATCH_MOD,
    _BENCH_MOD,
    PACK_BUDGET,
    decontaminate_overlap,
    domain_mixing_sample,
    incremental_dedup,
    pii_redact,
    repetition_report,
    sequence_packing,
)
from datapipeline_ops_spark.tables import load_table


def test_decontamination_bounds_and_benchmark_exclusion(spark, sf_dir):
    rows = decontaminate_overlap(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.doc_id % _BENCH_MOD != 0  # benchmark docs never scored
        assert 0 <= r.n_matched <= r.n_ngrams
        assert r.contaminated == (r.n_matched / r.n_ngrams >= 0.5)


def test_decontamination_flags_exact_copy_of_benchmark(spark, sf_dir):
    # a corpus doc whose text equals a benchmark doc's text must be 100%
    # contaminated (same shingle set)
    docs = load_table(spark, sf_dir, "documents")
    bench_texts = {
        r.text for r in docs.filter(F.col("doc_id") % _BENCH_MOD == 0).collect()
    }
    copies = {
        r.doc_id
        for r in docs.filter(F.col("doc_id") % _BENCH_MOD != 0).collect()
        if r.text in bench_texts
    }
    if copies:  # sf-dependent; exercise when present
        out = {r.doc_id: r for r in decontaminate_overlap(spark, sf_dir).collect()}
        for doc_id in copies:
            assert out[doc_id].contaminated


def test_pii_redaction_counts_and_completeness(spark, sf_dir):
    out = pii_redact(spark, sf_dir)
    for r in out.collect():
        assert r.n_emails == (1 if r.doc_id % 3 != 0 else 0)
        assert r.n_phones == (1 if r.doc_id % 2 == 0 else 0)
    # md5 is over the redacted text; redacting an already-redacted text must
    # be a fixpoint — no pattern survives (checked via the count columns
    # being exact, and by construction the corpus itself has no PII chars)


def test_domain_mixing_deterministic_and_weighted(spark, sf_dir):
    a = {(r.doc_id, r.source, r.weight) for r in domain_mixing_sample(spark, sf_dir).collect()}
    b = {(r.doc_id, r.source, r.weight) for r in domain_mixing_sample(spark, sf_dir).collect()}
    assert a == b  # rerun-identical: decision is a pure hash of doc_id
    for _, source, weight in a:
        n = int(source.replace("src", ""))
        assert weight == (n % 4 + 1) / 4.0
    # weight-1.0 sources keep everything
    docs = load_table(spark, sf_dir, "documents")
    full = {
        r.doc_id
        for r in docs.filter(
            (F.regexp_extract("source", r"(\d+)", 1).cast("long") % 4) == 3
        ).collect()
    }
    kept = {d for d, _, w in a if w == 1.0}
    assert kept == full


def test_sequence_packing_conserves_tokens(spark, sf_dir):
    from datapipeline_ops_spark.functions.text import tokens

    out = sequence_packing(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    total = docs.select(F.sum(F.size(tokens(F.col("text"))))).first()[0]
    agg = out.agg(F.sum("total_tokens"), F.sum("n_docs")).first()
    assert agg[0] == total
    assert agg[1] == docs.count()
    # chunks are contiguous 0..max per source, and every chunk's first doc
    # starts inside it, so no chunk except possibly trailing ones is empty
    for src_rows in out.groupBy("source").agg(
        F.collect_list("chunk_id").alias("ids")
    ).collect():
        ids = sorted(src_rows.ids)
        assert ids == list(range(len(ids)))


def test_incremental_dedup_admits_no_known_duplicate(spark, sf_dir):
    kept = incremental_dedup(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    kept_ids = {r.doc_id for r in kept.collect()}
    assert all(i % _BATCH_MOD == 0 for i in kept_ids)
    corpus_texts = {
        r.text for r in docs.filter(F.col("doc_id") % _BATCH_MOD != 0).collect()
    }
    batch = docs.filter(F.col("doc_id") % _BATCH_MOD == 0).collect()
    for r in batch:
        if r.text in corpus_texts:
            assert r.doc_id not in kept_ids  # exact copies never admitted


def test_repetition_report_detects_repeats(spark, sf_dir):
    out = {r.doc_id: r for r in repetition_report(spark, sf_dir).collect()}
    docs = {r.doc_id: r.text for r in load_table(spark, sf_dir, "documents").collect()}
    assert out.keys() == docs.keys()
    for doc_id, r in out.items():
        n_tok = len(docs[doc_id].split())
        assert r.n_3grams == (n_tok - 2 if n_tok >= 3 else 1)
        assert 0.0 <= r.dup_3gram_frac <= 1.0
        assert 0.0 < r.top_bigram_frac <= 1.0


def test_repetition_flags_templated_spam(spark):
    # inline corpus: pure repetition vs natural-ish text
    df = spark.createDataFrame(
        [
            (1, " ".join(["buy now"] * 30)),
            (2, "the quick brown fox jumps over the lazy dog near the river bank"),
        ],
        ["doc_id", "text"],
    )
    from datapipeline_ops_spark.functions.text import shingles

    g3 = shingles(F.col("text"), 3)
    stats = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            (1.0 - F.size(F.array_distinct(g3)) / F.size(g3).cast("double")).alias("dup"),
        ).collect()
    }
    assert stats[1].dup > 0.9
    assert stats[2].dup < 0.1


def test_pack_budget_positive():
    assert PACK_BUDGET > 0


def test_curriculum_length_buckets_terciles(spark, sf_dir):
    from datapipeline_ops_spark.queries import QUERIES
    from datapipeline_ops_spark.tables import load_table

    rows = QUERIES["curriculum_length_buckets"].fn(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n
    sizes = {}
    for r in rows:
        sizes[r.bucket] = sizes.get(r.bucket, 0) + 1
    assert set(sizes) == {"short", "medium", "long"}
    # ordering respected: every short doc <= every long doc in word count
    max_short = max(r.n_words for r in rows if r.bucket == "short")
    min_long = min(r.n_words for r in rows if r.bucket == "long")
    assert max_short < min_long
    # terciles are balanced up to length-tie granularity
    for b, c in sizes.items():
        assert c > n // 6, (b, c, sizes)


def test_k_anonymity_audit_counts(spark, sf_dir):
    from datapipeline_ops_spark.queries import QUERIES
    from datapipeline_ops_spark.queries.curation_extra import K_ANON_THRESHOLD
    from datapipeline_ops_spark.tables import load_table

    rows = QUERIES["k_anonymity_audit"].fn(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.group_size for r in rows) == n_docs
    for r in rows:
        assert r.violates_k == (r.group_size < K_ANON_THRESHOLD)
    # tiny sf: most (lang, source, len-bucket) combos are sparse — the audit
    # must actually flag something here, or the flag logic is dead
    assert any(r.violates_k for r in rows)


def test_epoch_repeat_plan_waterfill_properties(spark, sf_dir):
    from datapipeline_ops_spark.queries.curation_extra import (
        EPOCH_BUDGET_X,
        epoch_repeat_plan,
    )

    rows = epoch_repeat_plan(spark, sf_dir).collect()
    assert rows
    budget = EPOCH_BUDGET_X * sum(r.n_tokens for r in rows)
    # budget conserved exactly while any source is uncapped (water-filling
    # redistributes what plain least() would evaporate)
    if any(not r.capped for r in rows):
        assert abs(sum(r.alloc_tokens for r in rows) - budget) < 1e-6 * budget
    for r in rows:
        # caps are powers of two, so capped epochs == cap exactly in IEEE
        assert r.epochs <= r.cap_epochs
        assert r.capped == (r.epochs == r.cap_epochs)
        assert 0.0 <= r.alloc_share <= 1.0
    # an uncapped source must sit at a shared water level: alloc/weight equal
    unc = [r for r in rows if not r.capped]
    if len(unc) >= 2:
        levels = [r.alloc_tokens / (r.n_tokens ** 0.5) for r in unc]
        assert max(levels) - min(levels) < 1e-6 * max(levels)


def test_quality_filter_sweep_monotone(spark, sf_dir):
    from datapipeline_ops_spark.queries.lm_quality import quality_filter_sweep

    rows = sorted(
        quality_filter_sweep(spark, sf_dir).collect(),
        key=lambda r: r.tau_logit_tenths,
    )
    assert rows
    # kept mass is monotone non-increasing in the threshold
    for a, b in zip(rows, rows[1:]):
        assert a.n_kept >= b.n_kept
        assert a.kept_tokens >= b.kept_tokens
    # the sweep brackets the production gate (tau=0 == `passes`)
    taus = [r.tau_logit_tenths for r in rows]
    assert min(taus) < 0 < max(taus) or 0 in taus


def test_scaling_law_subsets_nested(spark, sf_dir):
    from datapipeline_ops_spark.queries.curation_extra import (
        _SLS_PCTS,
        scaling_law_subsets,
    )

    rows = sorted(scaling_law_subsets(spark, sf_dir).collect(), key=lambda r: r.pct)
    assert [r.pct for r in rows] == sorted(_SLS_PCTS)
    # nested by construction: doc and token mass grow with the level
    for a, b in zip(rows, rows[1:]):
        assert a.n_docs <= b.n_docs
        assert a.n_tokens <= b.n_tokens
    full = rows[-1]
    assert full.pct == 100
    # the 100% level IS the corpus: zero drift from itself
    assert full.max_share_dev == 0.0 and full.tv_dist == 0.0
    for r in rows:
        assert 0.0 <= r.max_share_dev <= r.tv_dist * 2 + 1e-12
        assert 0.0 <= r.tv_dist <= 1.0


def test_epoch_shuffle_audit_coverage_and_decorrelation(spark, sf_dir):
    from datapipeline_ops_spark.queries.corpus_lm_extra import (
        _ESA_EPOCHS,
        epoch_shuffle_audit,
    )
    from datapipeline_ops_spark.tables import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    rows = sorted(epoch_shuffle_audit(spark, sf_dir).collect(), key=lambda r: r.epoch_from)
    assert [r.epoch_from for r in rows] == list(range(_ESA_EPOCHS - 1))
    for r in rows:
        assert r.epoch_to == r.epoch_from + 1
        # the successor relation covers every document exactly once
        assert r.n_pairs == n_docs - 1
        assert 0 <= r.n_repeats <= r.n_pairs
        # independent permutations repeat ~1/n adjacencies; allow slack but
        # catch a correlated (broken) shuffle outright
        assert r.repeat_rate < 0.05


def test_packing_fill_sweep_tradeoff(spark, sf_dir):
    from datapipeline_ops_spark.queries.curation_extra import (
        _PFS_CTXS,
        packing_fill_sweep,
    )

    rows = sorted(packing_fill_sweep(spark, sf_dir).collect(), key=lambda r: r.ctx_tokens)
    assert [r.ctx_tokens for r in rows] == sorted(_PFS_CTXS)
    for r in rows:
        assert r.n_chunks >= 1
        assert 0.0 < r.fill_rate <= 1.0
        assert 0.0 <= r.split_share <= 1.0
    # longer windows can only reduce chunk count and boundary splits
    for a, b in zip(rows, rows[1:]):
        assert a.n_chunks >= b.n_chunks
        assert a.split_share >= b.split_share - 1e-12
