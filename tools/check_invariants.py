#!/usr/bin/env python
"""Registry-wide semantic-invariant audit (the systematic form of the
pricing_summary avg_disc range pin).

The cross-engine parity gate cannot catch a bug BOTH engines share — the
round-9 avg_disc 100x normalization error stayed green because the Spark
expression and the DuckDB oracle mirrored the same mistake. This audit
attacks that class from the semantics side: every registered query runs at
a small SF and every output column whose NAME claims a bounded domain
(rates/shares/fractions in [0,1], percents in [0,100], correlations in
[-1,1], counts/lengths non-negative) is checked against that domain.

A violation is either a real published-value bug (the jackpot) or a
misleading column name; both are worth failing on. Known-intentional
exceptions are pinned in EXCLUDE with a justification — a new violation
means a new bug or a newly misleading name.

Beyond single-column ranges, CROSS-COLUMN invariants catch the next bug
class up: per row, ``min_x <= avg_x <= max_x`` (shared stem), percentile
families ordered by quantile (``p50_v <= p90_v``), confidence bounds
``*_lo <= *_hi``, plus per-query pinned chains (e.g. pricing_summary's
``sum_disc_price <= sum_base_price <= sum_charge``) that no column name
alone implies.

The third layer is CROSS-ROW monotone spines (``MONOTONE``): the sweep
queries publish curves over a knob (dedup tau, quality threshold, IVF
nprobe, context window, batch count, subset level) whose physics force
monotone columns — tightening a threshold cannot keep MORE data, probing
more cells cannot LOWER recall. A shared-bug curve can pass every per-row
check and still bend the wrong way; this layer fails it.

This tool is part of the pre-record gate: run it together with
``tools/check_plans.py`` and ``tools/check_correctness.py`` before staging
driver records — a clean parity gate does NOT imply a clean invariant run.

Usage: python tools/check_invariants.py [query ...]
"""

from __future__ import annotations

import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipeline_ops_spark.queries.multimodal import _PH_HAM_T  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_INV_SF_DIR", "/root/testdata/sf0.001")

# (rule, column-name regex, predicate) — first matching rule wins, so the
# more specific percent rule precedes the fraction rule (return_share_pct
# is a percent despite the "share" token).
RULES = [
    (
        "pct_0100",
        re.compile(r"(^|_)pct(_|$)|percent(_|$)"),
        lambda v: 0.0 <= v <= 100.0,
    ),
    (
        "unit_01",
        re.compile(
            r"(^|_)(rate|share|frac|fraction|recall|precision|ndcg|auc|"
            r"coverage|purity|pvalue|p_value|prob|jaccard|containment|"
            r"overlap|iou|cdf|dup_rate)(_|$)"
        ),
        lambda v: 0.0 <= v <= 1.0,
    ),
    (
        "nonneg_count",
        re.compile(r"^n_|_count$|^count_|^num_"),
        lambda v: v >= 0,
    ),
    (
        "corr_pm1",
        re.compile(r"(^|_)(cos|cosine|corr|rho|tau|r2)(_|$)"),
        lambda v: -1.0 - 1e-9 <= v <= 1.0 + 1e-9,
    ),
    (
        "nonneg_scale",
        re.compile(r"(^|_)(se|std|stddev|var|variance|wall|len|length|size|tokens?|chars?)(_|$)"),
        lambda v: v >= -1e-9,
    ),
]

# --- cross-column invariants -------------------------------------------

# Role tokens recognised at either end of a column name; stems must match
# exactly for columns to be compared (avg_qty pairs with min_qty/max_qty,
# never with max_price).
_ROLE_RX = re.compile(
    r"^(?P<pre>min|max|avg|mean|med|median|p\d{1,3})_(?P<stem_a>.+)$"
    r"|^(?P<stem_b>.+)_(?P<suf>min|max|avg|mean|med|median|p\d{1,3})$"
)

# Ordering rank inside a stem family: min <= p* (by quantile) <= max, with
# the central tendencies pinned between min and max only (avg vs median vs
# p50 are NOT mutually ordered).
_CENTRAL = {"avg", "mean", "med", "median"}


def _stem_roles(cols: list[str]) -> dict[str, dict[str, str]]:
    """Map stem -> {role: column} for columns named with min/max/avg/p* roles."""
    out: dict[str, dict[str, str]] = {}
    for c in cols:
        m = _ROLE_RX.match(c)
        if not m:
            continue
        role = (m.group("pre") or m.group("suf")).lower()
        stem = m.group("stem_a") or m.group("stem_b")
        out.setdefault(stem, {})[role] = c
    return {s: r for s, r in out.items() if len(r) >= 2}


def _comparable(v) -> bool:
    return v is not None and not isinstance(v, bool) and isinstance(v, (int, float)) and not (
        isinstance(v, float) and math.isnan(v)
    )


def _cross_violations(d: dict, roles: dict[str, dict[str, str]]) -> list[tuple[str, str]]:
    """Per-row cross-column checks; returns (rule, detail) violations."""
    bad: list[tuple[str, str]] = []
    for stem, rc in roles.items():
        vals = {r: d[c] for r, c in rc.items() if _comparable(d.get(c))}
        lo = vals.get("min")
        hi = vals.get("max")
        if lo is not None and hi is not None and lo > hi:
            bad.append(("min_le_max", f"{rc['min']}={lo} > {rc['max']}={hi}"))
        for r, v in vals.items():
            if r in _CENTRAL or r.startswith("p"):
                if lo is not None and v < lo:
                    bad.append(("min_le_mid", f"{rc[r]}={v} < {rc['min']}={lo}"))
                if hi is not None and v > hi:
                    bad.append(("mid_le_max", f"{rc[r]}={v} > {rc['max']}={hi}"))
        # percentile family ordered by quantile
        ps = sorted(
            ((int(r[1:]), rc[r]) for r in vals if r.startswith("p")),
            key=lambda t: t[0],
        )
        for (qa, ca), (qb, cb) in zip(ps, ps[1:]):
            if d[ca] > d[cb]:
                bad.append(("pctl_order", f"{ca}={d[ca]} > {cb}={d[cb]}"))
    # confidence/interval bounds: stem_lo <= stem_hi (also lower/upper)
    for c in d:
        for lo_suf, hi_suf in (("_lo", "_hi"), ("_lower", "_upper")):
            if c.endswith(lo_suf):
                other = c[: -len(lo_suf)] + hi_suf
                if other in d and _comparable(d[c]) and _comparable(d[other]) and d[c] > d[other]:
                    bad.append(("lo_le_hi", f"{c}={d[c]} > {other}={d[other]}"))
    return bad


# Per-query pinned cross-column chains the generic name rules cannot see.
# Each entry: list of (label, lambda row_dict -> bool-or-None); None = skip
# (e.g. NULL inputs).
def _chain(*cols):
    def chk(d):
        vs = [d.get(c) for c in cols]
        if any(not _comparable(v) for v in vs):
            return None
        return all(a <= b for a, b in zip(vs, vs[1:]))

    return chk


QUERY_CROSS = {
    # Greedy non-overlapping application can never merge more occurrences
    # than the overlapping pair count that selected the rule; an emitted
    # merge row always applied at least once (its freq was >= 1).
    "bpe_train_loop": [
        ("applied<=freq", _chain("n_applied", "pair_freq")),
        ("applied>=1", lambda d: d["n_applied"] >= 1),
    ],
    # every BPE symbol covers >= 1 char and every whitespace token yields
    # >= 1 symbol, so the three volumes chain
    "bpe_vocab_apply": [
        ("ws<=symbols", _chain("n_ws_tokens", "n_bpe_symbols")),
        ("symbols<=chars", _chain("n_bpe_symbols", "n_chars")),
    ],
    # gate/label/correct counts are all subsets of the source's docs
    "trained_gate_impact": [
        ("pass_t<=docs", _chain("n_pass_trained", "n_docs")),
        ("pass_f<=docs", _chain("n_pass_fixed", "n_docs")),
        ("label<=docs", _chain("n_keep_label", "n_docs")),
        ("ok_t<=docs", _chain("n_trained_correct", "n_docs")),
        ("ok_f<=docs", _chain("n_fixed_correct", "n_docs")),
    ],
    # TPC-H Q1: discount in [0,1] => disc_price <= base; tax >= 0 =>
    # disc_price <= charge (the avg_disc 100x bug would have flunked the
    # unit_01 rule; this chain would catch a sibling bug in the sums).
    "pricing_summary": [
        ("disc<=base", _chain("sum_disc_price", "sum_base_price")),
        ("disc<=charge", _chain("sum_disc_price", "sum_charge")),
    ],
    # Water-filling allocator: no source may exceed its repeat cap. Exact
    # compare is safe: caps are powers of two, so (cap*n)/n == cap in IEEE.
    "epoch_repeat_plan": [
        ("epochs<=cap", _chain("epochs", "cap_epochs")),
    ],
    # Interval-union bound: removed tokens cannot exceed the doc's tokens,
    # nor the marked-window count times the window width; a doc is touched
    # iff it has a marked window.
    "crossdoc_substring_dedup": [
        ("removed<=tokens", _chain("n_removed_tokens", "n_tokens")),
        (
            "removed<=marked*k",
            lambda d: None
            if not _comparable(d.get("n_removed_tokens"))
            else d["n_removed_tokens"] <= d["n_marked_windows"] * 8,
        ),
        (
            "marked_iff_removed",
            lambda d: None
            if not _comparable(d.get("n_removed_tokens"))
            else (d["n_marked_windows"] == 0) == (d["n_removed_tokens"] == 0),
        ),
    ],
    "dedup_savings_by_source": [
        ("affected<=docs", _chain("n_docs_affected", "n_docs")),
        (
            "removed+kept=total",
            lambda d: None
            if not _comparable(d.get("total_tokens"))
            else d["removed_tokens"] + d["kept_tokens"] == d["total_tokens"],
        ),
    ],
    # A dims mismatch publishes hamming -1 and implies the caption claimed
    # the wrong pattern key; a hash mismatch is only flagged above radius.
    "caption_image_agreement": [
        (
            "reason_shape",
            lambda d: (d["reason"] == "dims") == (d["hamming"] == -1)
            and (d["reason"] != "dims" or d["true_key"] != d["claimed_key"])
            and (d["reason"] != "hash" or d["hamming"] > _PH_HAM_T),
        ),
    ],
    # Shard layout: a same-source run cannot exceed the shard's docs; the
    # source mix cannot have more members than docs; entropy >= 0 (no name
    # rule covers "entropy", so pin it).
    "webdataset_shard_plan": [
        ("run<=docs", _chain("max_source_run", "n_docs")),
        ("sources<=docs", _chain("n_sources", "n_docs")),
        (
            "entropy>=0",
            lambda d: None
            if not _comparable(d.get("source_entropy"))
            else d["source_entropy"] >= 0.0,
        ),
    ],
    "padding_waste_report": [
        ("real<=padded", _chain("real_tokens", "padded_tokens")),
        (
            "waste=padded-real",
            lambda d: None
            if not _comparable(d.get("padded_tokens"))
            else d["waste_tokens"] == d["padded_tokens"] - d["real_tokens"],
        ),
    ],
    # Context packing: windows hold at most CTX_DOCS members; the weakest
    # member pair cannot beat the mean.
    "in_context_packing_plan": [
        (
            "ctx<=capacity",
            lambda d: None
            if not _comparable(d.get("n_docs"))
            else d["n_docs"] <= 4,
        ),
        ("min<=mean", _chain("min_pair_cos", "mean_pair_cos")),
    ],
    # Count-Min never undercounts.
    "stream_cms_frequency": [
        ("true<=est", _chain("true_count", "cms_est")),
    ],
    # Funnel attribution: every document has exactly one fate, so the four
    # fate counts must sum to the language's document count.
    "dedup_removal_impact": [
        (
            "fates_sum_to_docs",
            lambda d: None
            if any(
                not _comparable(d.get(c))
                for c in (
                    "n_quality_removed",
                    "n_exact_removed",
                    "n_neardup_removed",
                    "n_kept",
                    "n_docs",
                )
            )
            else d["n_quality_removed"] + d["n_exact_removed"]
            + d["n_neardup_removed"] + d["n_kept"] == d["n_docs"],
        ),
    ],
}

# (query, column): why the name-implied domain does not apply.
EXCLUDE = {
    ("media_wav_probe", "sample_rate"): "Hz, not a fraction",
    ("overlapping_order_windows", "overlap_s"): "seconds of overlap, not a fraction",
    ("wow_type_delta", "pct_change"): "signed percent change; unbounded",
    ("discount_quantity_elasticity", "slope_qty_per_pct"): "signed regression slope per percentage point",
    ("returned_revenue_by_nation", "returned_share"): "published as percent (0-100), matching oracle",
    ("promo_revenue_share", "promo_share"): "TPC-H Q14 promo_revenue is a percent (0-100), matching oracle",
    ("quality_filter_sweep", "tau_logit_tenths"): "gate threshold knob in logit tenths (-20..20), not a Kendall tau",
}

# --- cross-ROW monotone spines -----------------------------------------

# The sweep queries publish a curve over a knob column; the physics of each
# sweep makes certain columns monotone in the knob (tightening a threshold
# cannot keep MORE data). A bug both engines share (the avg_disc class)
# stays green in the parity gate AND in the per-row audits above — but it
# cannot fake a monotone curve. Entries: query -> (knob, [(col, dir)]),
# dir "+" = non-decreasing in the knob, "-" = non-increasing.
MONOTONE = {
    "dedup_tau_sensitivity": ("tau_pct", [("n_pairs", "-"), ("n_flagged_docs", "-"), ("flagged_share", "-")]),
    "quality_filter_sweep": ("tau_logit_tenths", [("n_kept", "-"), ("kept_tokens", "-"), ("kept_share", "-"), ("token_share", "-")]),
    "ann_probe_recall_curve": ("nprobe", [("mean_recall", "+"), ("mean_candidates", "+")]),
    # PRECONDITION (packing_fill_sweep, inbatch_negative_collisions): these
    # two entries are only monotone because their spines form DIVISIBILITY
    # chains (512|1024|2048|4096; 8|32|128) — chunk-boundary sets and
    # hash-bucket collision sets are nested only when each knob divides the
    # next. A spine edit that breaks the chain (e.g. adding 48 batches or a
    # 1536 window) makes the physics non-monotone and would turn this check
    # into a spurious gate red: drop the entry or restore divisibility.
    # _assert_divisibility_spines() pins this at import.
    "packing_fill_sweep": ("ctx_tokens", [("n_chunks", "-"), ("split_share", "-")]),
    "inbatch_negative_collisions": ("n_batches", [("n_collisions", "-")]),
    "scaling_law_subsets": ("pct", [("n_docs", "+"), ("n_tokens", "+")]),
    "vocab_coverage_curve": ("k", [("covered_tokens", "+"), ("coverage", "+")]),
    # best-of-first-n: prefixes nest for ANY ascending spine (no
    # divisibility precondition here, unlike the two entries above)
    "rejection_sampling_yield": (
        "n_candidates",
        [("mean_best_reward", "+"), ("pass_rate", "+")],
    ),
    # gradient descent with lr <= 1/L on the convex logistic objective:
    # loss at each published stage cannot increase (lr=1.5 vs 1/L=2 bound;
    # the 6-dp weight rounding perturbs loss by <<1e-5 per stage, far under
    # the observed per-stage decreases of ~1e-2)
    "train_quality_classifier": ("iter", [("log_loss", "-")]),
    # every merge strictly removes occurrences, so the weighted corpus
    # symbol total cannot increase across merge stages
    "bpe_train_loop": ("merge_idx", [("corpus_symbols_after", "-")]),
    # Lloyd: re-assignment cannot raise cost at fixed centroids, and the
    # member mean minimizes cost at fixed assignment; 6-dp centroid
    # rounding perturbs inertia by <= N*dim*(5e-7)^2 (~1e-11 here), far
    # inside the monotone tolerance
    "kmeans_train_loop": ("iter", [("inertia", "-")]),
    # isotonic regression is monotone by construction: the PAV fit cannot
    # decrease across logit bins (that is the constraint it solves under)
    "isotonic_calibration_pav": ("zbin", [("iso_rate", "+")]),
    # L2Boost with shrinkage < 2 on squared loss: each round's SSE drops by
    # (2*lr - lr^2) * gain >= 0; integer micro-unit leaf rounding perturbs
    # F by <= 0.5e-6, orders below the published decreases
    "gbdt_stump_boost": ("stage", [("mse", "-")]),
}


def _assert_divisibility_spines() -> None:
    """Startup pin for the MONOTONE divisibility precondition above."""
    from datapipeline_ops_spark.queries.curation_extra import _PFS_CTXS
    from datapipeline_ops_spark.queries.dedup import _IBN_BATCHES

    for label, spine in (("_PFS_CTXS", _PFS_CTXS), ("_IBN_BATCHES", _IBN_BATCHES)):
        for a, b in zip(spine, spine[1:]):
            assert b % a == 0, (
                f"{label} spine {spine} broke its divisibility chain at "
                f"{a}->{b}; the MONOTONE entry for it is no longer sound — "
                "drop the entry or restore divisibility"
            )


# --- cross-QUERY identities --------------------------------------------

# The fourth layer: provably-related OUTPUTS of different queries. A shared
# bug can keep one query self-consistent (every per-row and monotone check
# green) and still disagree with the sibling query that computes the same
# quantity another way; these identities fail it. Entries:
# (label, [required queries], fn(rows_by_name) -> None (ok) or str (error)).
# Each identity is exact-integer arithmetic only (no float gates).


def _cq_tau50_equals_lsh(rows):
    tau50 = [r for r in rows["dedup_tau_sensitivity"] if r["tau_pct"] == 50]
    if len(tau50) != 1:
        return f"expected one tau_pct=50 row, saw {len(tau50)}"
    n = len(rows["minhash_lsh_pairs"])
    if tau50[0]["n_pairs"] != n:
        return f"tau=50 n_pairs {tau50[0]['n_pairs']} != lsh pair count {n}"
    return None


def _cq_agreement_totals(rows):
    by = {r["found_by"]: r["n_pairs"] for r in rows["minhash_vs_simhash_agreement"]}
    mh = by.get("both", 0) + by.get("minhash_only", 0)
    sh = by.get("both", 0) + by.get("simhash_only", 0)
    n_mh = len(rows["minhash_lsh_pairs"])
    n_sh = len(rows["simhash_near_pairs"])
    if mh != n_mh:
        return f"minhash family total {mh} != minhash_lsh_pairs count {n_mh}"
    if sh != n_sh:
        return f"simhash family total {sh} != simhash_near_pairs count {n_sh}"
    return None


def _cq_fates_vs_corpus_docs(rows):
    fates = sum(r["n_docs"] for r in rows["dedup_removal_impact"])
    card = sum(r["n_docs"] for r in rows["corpus_report_card"])
    if fates != card:
        return f"removal-impact docs {fates} != report-card docs {card}"
    return None


def _cq_savings_rollup(rows):
    agg: dict[str, list[int]] = {}
    for r in rows["crossdoc_substring_dedup"]:
        a = agg.setdefault(r["source"], [0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += 1 if r["n_removed_tokens"] > 0 else 0
        a[2] += r["n_tokens"]
        a[3] += r["n_removed_tokens"]
        a[4] += r["n_kept_tokens"]
    per_src = {
        r["source"]: [
            r["n_docs"], r["n_docs_affected"], r["total_tokens"],
            r["removed_tokens"], r["kept_tokens"],
        ]
        for r in rows["dedup_savings_by_source"]
    }
    if set(agg) != set(per_src):
        return f"source sets differ: {sorted(set(agg) ^ set(per_src))}"
    for s, a in agg.items():
        if a != per_src[s]:
            return f"source {s}: per-doc rollup {a} != published {per_src[s]}"
    return None


def _cq_lang_rollup_total(rows):
    lang_total = sum(r["n_pairs"] for r in rows["crosslingual_neardup_rate"])
    n = len(rows["minhash_lsh_pairs"])
    if lang_total != n:
        return f"lang-pair rollup total {lang_total} != lsh pair count {n}"
    return None


def _cq_token_doc_totals(rows):
    corpus_tokens = sum(r["n_tokens"] for r in rows["crossdoc_substring_dedup"])
    corpus_docs = len(rows["crossdoc_substring_dedup"])
    pw_tokens = sum(r["real_tokens"] for r in rows["padding_waste_report"])
    wds_docs = sum(r["n_docs"] for r in rows["webdataset_shard_plan"])
    if pw_tokens != corpus_tokens:
        return f"padding real_tokens {pw_tokens} != corpus tokens {corpus_tokens}"
    if wds_docs != corpus_docs:
        return f"shard-plan docs {wds_docs} != corpus docs {corpus_docs}"
    return None


def _round6(x: float) -> float:
    """Spark/DuckDB ROUND half-up at 6 dp (away from zero), -0.0-normalized."""
    s = -1.0 if x < 0 else 1.0
    return s * math.floor(abs(x) * 1e6 + 0.5) / 1e6 + 0.0


def _round6_rate(num: int, den: int) -> float:
    """Spark's round(avg(ind), 6) for a 0/1 indicator: the avg is the exact
    double num/den (integer sums in double are exact), and round() HALF_UPs
    the exact binary value of that double via BigDecimal — emulated with
    Decimal(float), NOT floor(x*1e6+0.5) on a float product, which can
    differ by 1e-6 when x*1e6 float-rounds onto an exact .5 boundary."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(num / den).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP)
    ) + 0.0


def _cq_trained_gate_identity(rows):
    """Corpus-wide pass/accuracy at the deployed (final) weights equal the
    final training stage's published rates — the trained artifact and its
    application cannot drift apart."""
    stages = rows["train_quality_classifier"]
    final = max(stages, key=lambda r: r["iter"])
    n = sum(r["n_docs"] for r in rows["trained_gate_impact"])
    if n == 0:
        return "trained_gate_impact saw zero docs"
    pass_rate = _round6_rate(sum(r["n_pass_trained"] for r in rows["trained_gate_impact"]), n)
    acc_rate = _round6_rate(sum(r["n_trained_correct"] for r in rows["trained_gate_impact"]), n)
    if pass_rate != final["pass_rate"]:
        return f"apply pass rate {pass_rate} != final stage pass_rate {final['pass_rate']}"
    if acc_rate != final["acc_rate"]:
        return f"apply acc rate {acc_rate} != final stage acc_rate {final['acc_rate']}"
    return None


def _cq_bpe_apply_total(rows):
    """Corpus-wide BPE symbol total from the APPLY side equals the final
    merge's corpus_symbols_after from the TRAIN side — the trained artifact
    and its application gate each other."""
    loop = rows["bpe_train_loop"]
    if not loop:
        return None  # pair table drained before merge 1; nothing to pin
    final = max(loop, key=lambda r: r["merge_idx"])
    total = sum(r["n_bpe_symbols"] for r in rows["bpe_vocab_apply"])
    if total != final["corpus_symbols_after"]:
        return (
            f"apply total {total} != train corpus_symbols_after "
            f"{final['corpus_symbols_after']} (merge {final['merge_idx']})"
        )
    return None


def _cq_chunk_udtf_identity(rows):
    """token_chunk_udtf (Python windowed UDTF) and rag_chunk_plan
    (relational explode+slice) implement the same chunk contract; their
    full row sets must be identical."""
    key = lambda r: (r["doc_id"], r["chunk_idx"], r["start_tok"], r["chunk_len"], r["chunk_md5"])  # noqa: E731
    a = sorted(key(r) for r in rows["token_chunk_udtf"])
    b = sorted(key(r) for r in rows["rag_chunk_plan"])
    if a != b:
        extra = set(a) - set(b)
        missing = set(b) - set(a)
        return f"row sets differ: +{len(extra)} udtf-only, -{len(missing)} plan-only"
    return None


def _make_artifact_twin_check(artifact_q: str, lineage_q: str):
    """Row-set equality between an artifact-handoff apply (reads the model
    from parquet) and its in-lineage twin: doubles round-trip parquet
    bit-exactly, so ANY difference means the write/read seam drifted
    (type narrowing, duplicated rows, a stale artifact file)."""

    def chk(rows):
        a = sorted(tuple(sorted(r.items())) for r in rows[artifact_q])
        b = sorted(tuple(sorted(r.items())) for r in rows[lineage_q])
        if a != b:
            extra = len(set(a) - set(b))
            missing = len(set(b) - set(a))
            return (
                f"row sets differ across artifact seam: +{extra} "
                f"artifact-only, -{missing} lineage-only"
            )
        return None

    return chk


def _cq_sgd_epoch_partition(rows):
    """Every SGD epoch's batches partition the corpus: per-epoch n_rows
    sums must equal the apply report's corpus total (doc_id % B covers
    every document exactly once per epoch)."""
    n = sum(r["n_docs"] for r in rows["trained_gate_impact"])
    by_epoch: dict = {}
    for r in rows["minibatch_sgd_train"]:
        by_epoch[r["epoch"]] = by_epoch.get(r["epoch"], 0) + r["n_rows"]
    for e, tot in sorted(by_epoch.items()):
        if tot != n:
            return f"epoch {e} batch rows {tot} != corpus total {n}"
    return None


def _cq_gate_eval_totals(rows):
    """The model-evaluation reports must cover the whole corpus: the
    calibration bins partition it (n_docs sums to the apply report's
    total) and every ablation row re-scored all of it."""
    n = sum(r["n_docs"] for r in rows["trained_gate_impact"])
    cal = sum(r["n_docs"] for r in rows["trained_gate_calibration"])
    if cal != n:
        return f"calibration bin total {cal} != corpus total {n}"
    for r in rows["trained_gate_feature_ablation"]:
        if r["n_docs"] != n:
            return (
                f"ablation row {r['ablated_feature']} n_docs {r['n_docs']}"
                f" != corpus total {n}"
            )
    return None


def _cq_bpe_first_merge(rows):
    """bpe_train_loop's first merge IS bpe_merge_step's rank-1 pair: stage 1
    counts the identical weighted adjacent character pairs, so the argmax
    (freq DESC, pair ASC — tuple order == concat order on 1-char symbols)
    and its frequency must match exactly."""
    first = [r for r in rows["bpe_train_loop"] if r["merge_idx"] == 1]
    top = [r for r in rows["bpe_merge_step"] if r["rank"] == 1]
    if not first or not top:
        return None if not top else "bpe_train_loop emitted no merge_idx=1 row"
    if first[0]["merged"] != top[0]["pair"]:
        return f"first merge {first[0]['merged']!r} != rank-1 pair {top[0]['pair']!r}"
    if first[0]["pair_freq"] != top[0]["freq"]:
        return f"first merge freq {first[0]['pair_freq']} != rank-1 freq {top[0]['freq']}"
    return None


def _cq_kmeans_apply_identity(rows):
    """The apply-side per-cluster report must reassemble the final training
    stage: surviving-cluster count == n_active (exact), and the cluster
    inertias sum back to the stage inertia (each of the <= K+1 published
    values rounds independently at 6 dp, so the tolerance is (K+1)*5e-7)."""
    stages = rows["kmeans_train_loop"]
    if not stages:
        return "kmeans_train_loop published no stages"
    final = max(stages, key=lambda r: r["iter"])
    apply_rows = rows["kmeans_assign_apply"]
    if len(apply_rows) != final["n_active"]:
        return f"apply rows {len(apply_rows)} != final n_active {final['n_active']}"
    total = sum(r["cluster_inertia"] for r in apply_rows)
    tol = (len(apply_rows) + 1) * 5e-7 + 1e-9
    if abs(total - final["inertia"]) > tol:
        return (
            f"apply inertia sum {total} != final stage inertia "
            f"{final['inertia']} (tol {tol})"
        )
    return None


def _cq_nb_confusion_census(rows):
    """naive_bayes_confusion: diagonal cells are all-correct, off-diagonal
    all-wrong, and the per-actual-source row sums equal the per-source doc
    counts trained_gate_impact publishes from its own corpus pass."""
    per_src: dict = {}
    for r in rows["naive_bayes_confusion"]:
        want = r["n_docs"] if r["source"] == r["pred_source"] else 0
        if r["n_correct"] != want:
            return (
                f"cell ({r['source']} -> {r['pred_source']}): "
                f"n_correct {r['n_correct']} != {want}"
            )
        per_src[r["source"]] = per_src.get(r["source"], 0) + r["n_docs"]
    gate = {r["source"]: r["n_docs"] for r in rows["trained_gate_impact"]}
    if per_src != gate:
        diff = {s for s in set(per_src) | set(gate) if per_src.get(s) != gate.get(s)}
        return f"per-source doc totals disagree with trained_gate_impact: {sorted(diff)[:5]}"
    return None


def _cq_stump_apply_equals_best(rows):
    """decision_stump_apply's corpus totals are determined by the winning
    sweep row: n_docs = nl + nr and n_correct = max(kl, nl-kl) +
    max(kr, nr-kr) — the train sweep and the deployed stump cannot drift."""
    best = [r for r in rows["decision_stump_train"] if r["is_best"]]
    if not best and not rows["decision_stump_apply"]:
        return None  # no valid split -> both sides empty, by contract
    if len(best) != 1:
        return f"expected exactly one is_best sweep row, got {len(best)}"
    b = best[0]
    want_n = b["n_left"] + b["n_right"]
    want_ok = max(b["n_keep_left"], b["n_left"] - b["n_keep_left"]) + max(
        b["n_keep_right"], b["n_right"] - b["n_keep_right"]
    )
    n = sum(r["n_docs"] for r in rows["decision_stump_apply"])
    ok = sum(r["n_correct"] for r in rows["decision_stump_apply"])
    if n != want_n:
        return f"apply n_docs {n} != best-row corpus {want_n}"
    if ok != want_ok:
        return f"apply n_correct {ok} != best-row majority total {want_ok}"
    return None


def _cq_pav_bins_match_calibration(rows):
    """isotonic_calibration_pav rebins the identical logit: its per-bin
    populations must equal trained_gate_calibration's bin census exactly."""
    pav = {r["zbin"]: r["n_docs"] for r in rows["isotonic_calibration_pav"]}
    cal = {r["zbin"]: r["n_docs"] for r in rows["trained_gate_calibration"]}
    if pav != cal:
        diff = {z for z in set(pav) | set(cal) if pav.get(z) != cal.get(z)}
        return f"bin populations disagree with trained_gate_calibration: {sorted(diff)[:5]}"
    for r in rows["isotonic_calibration_pav"]:
        if r["n_keep"] > r["n_docs"]:
            return f"bin {r['zbin']}: n_keep {r['n_keep']} > n_docs {r['n_docs']}"
    return None


def _cq_gbdt_apply_equals_final_stage(rows):
    """gbdt_gate_apply serves the exact integer model the final boosting
    stage published: corpus-wide n_pass / n_correct must match stage K's
    own census (both are exact-integer gate counts at identical F)."""
    stages = rows["gbdt_stump_boost"]
    final = max(stages, key=lambda r: r["stage"])
    n_pass = sum(r["n_pass"] for r in rows["gbdt_gate_apply"])
    n_ok = sum(r["n_correct"] for r in rows["gbdt_gate_apply"])
    if n_pass != final["n_pass"]:
        return f"apply n_pass {n_pass} != final stage {final['n_pass']}"
    if n_ok != final["n_correct"]:
        return f"apply n_correct {n_ok} != final stage {final['n_correct']}"
    return None


def _cq_ols_covers_corpus(rows):
    """ols_normal_equations fits on the same feature table the gate scores:
    its published n must equal the corpus doc total."""
    n = sum(r["n_docs"] for r in rows["trained_gate_impact"])
    [ols] = rows["ols_normal_equations"]
    if ols["n"] != n:
        return f"OLS n {ols['n']} != corpus docs {n}"
    return None


CROSS_QUERY = [
    (
        "nb_confusion_covers_corpus",
        ["naive_bayes_confusion", "trained_gate_impact"],
        _cq_nb_confusion_census,
    ),
    (
        "stump_apply_equals_best_split",
        ["decision_stump_apply", "decision_stump_train"],
        _cq_stump_apply_equals_best,
    ),
    (
        "pav_bins_match_calibration",
        ["isotonic_calibration_pav", "trained_gate_calibration"],
        _cq_pav_bins_match_calibration,
    ),
    (
        "ols_covers_corpus",
        ["ols_normal_equations", "trained_gate_impact"],
        _cq_ols_covers_corpus,
    ),
    (
        "gbdt_apply_equals_final_stage",
        ["gbdt_gate_apply", "gbdt_stump_boost"],
        _cq_gbdt_apply_equals_final_stage,
    ),
    (
        "kmeans_apply_equals_final_stage",
        ["kmeans_assign_apply", "kmeans_train_loop"],
        _cq_kmeans_apply_identity,
    ),
    (
        "bpe_loop_first_merge",
        ["bpe_train_loop", "bpe_merge_step"],
        _cq_bpe_first_merge,
    ),
    (
        "gate_artifact_equals_lineage_apply",
        ["trained_gate_artifact_apply", "trained_gate_impact"],
        _make_artifact_twin_check("trained_gate_artifact_apply", "trained_gate_impact"),
    ),
    (
        "bpe_artifact_equals_lineage_apply",
        ["bpe_artifact_apply", "bpe_vocab_apply"],
        _make_artifact_twin_check("bpe_artifact_apply", "bpe_vocab_apply"),
    ),
    (
        "kmeans_artifact_equals_lineage_apply",
        ["kmeans_artifact_apply", "kmeans_assign_apply"],
        _make_artifact_twin_check("kmeans_artifact_apply", "kmeans_assign_apply"),
    ),
    (
        "sgd_epochs_partition_corpus",
        ["minibatch_sgd_train", "trained_gate_impact"],
        _cq_sgd_epoch_partition,
    ),
    (
        "gate_eval_reports_cover_corpus",
        [
            "trained_gate_calibration",
            "trained_gate_feature_ablation",
            "trained_gate_impact",
        ],
        _cq_gate_eval_totals,
    ),
    (
        "chunk_udtf_equals_rag_plan",
        ["token_chunk_udtf", "rag_chunk_plan"],
        _cq_chunk_udtf_identity,
    ),
    (
        "bpe_apply_total_equals_train_final",
        ["bpe_vocab_apply", "bpe_train_loop"],
        _cq_bpe_apply_total,
    ),
    (
        "trained_gate_equals_final_stage",
        ["trained_gate_impact", "train_quality_classifier"],
        _cq_trained_gate_identity,
    ),
    (
        "token_and_doc_totals",
        ["crossdoc_substring_dedup", "padding_waste_report", "webdataset_shard_plan"],
        _cq_token_doc_totals,
    ),
    (
        "lang_rollup_total",
        ["crosslingual_neardup_rate", "minhash_lsh_pairs"],
        _cq_lang_rollup_total,
    ),
    (
        "tau50_equals_lsh_pairs",
        ["dedup_tau_sensitivity", "minhash_lsh_pairs"],
        _cq_tau50_equals_lsh,
    ),
    (
        "agreement_family_totals",
        ["minhash_vs_simhash_agreement", "minhash_lsh_pairs", "simhash_near_pairs"],
        _cq_agreement_totals,
    ),
    (
        "fates_vs_corpus_docs",
        ["dedup_removal_impact", "corpus_report_card"],
        _cq_fates_vs_corpus_docs,
    ),
    (
        "crossdoc_savings_rollup",
        ["crossdoc_substring_dedup", "dedup_savings_by_source"],
        _cq_savings_rollup,
    ),
]


def _monotone_violations(name: str, rows: list) -> list[tuple[str, str, str, object]]:
    spec = MONOTONE.get(name)
    if not spec:
        return []
    knob, cols = spec
    try:
        ordered = sorted(rows, key=lambda r: r[knob])
    except (KeyError, TypeError):
        return [(name, knob, "monotone_knob_missing", knob)]
    out = []
    for col, direction in cols:
        vals = [r.get(col) for r in ordered]
        if any(not _comparable(v) for v in vals):
            continue  # NULL points (e.g. empty-corpus rates) void the chain
        ok = all(
            (a <= b + 1e-12) if direction == "+" else (a >= b - 1e-12)
            for a, b in zip(vals, vals[1:])
        )
        if not ok:
            out.append((name, col, f"monotone_{direction}", vals))
    return out


def main() -> int:
    from datapipeline_ops_spark.queries import QUERIES
    from datapipeline_ops_spark.session import get_spark

    spark = get_spark("check-invariants", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    _assert_divisibility_spines()
    only = set(sys.argv[1:])
    n_cols_checked = 0
    violations: list[tuple[str, str, str, object]] = []
    errors: list[tuple[str, str]] = []
    cq_needed = {q for _, reqs, _ in CROSS_QUERY for q in reqs}
    cq_rows: dict[str, list[dict]] = {}
    for name, spec in QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = spec.fn(spark, SF_DIR)
            rows = df.collect()
        except Exception as exc:  # noqa: BLE001 — a crashing query is itself a finding
            errors.append((name, str(exc).splitlines()[0][:200]))
            continue
        if name in cq_needed:
            cq_rows[name] = [r.asDict() for r in rows]
        hits = {}
        for c in df.columns:
            if (name, c) in EXCLUDE:
                continue
            for rn, rx, chk in RULES:
                if rx.search(c):
                    hits[c] = (rn, chk)
                    break
        roles = _stem_roles([c for c in df.columns if (name, c) not in EXCLUDE])
        cross_cols = {c for rc in roles.values() for c in rc.values()}
        cross_cols |= {
            c
            for c in df.columns
            if c.endswith(("_lo", "_hi", "_lower", "_upper")) and (name, c) not in EXCLUDE
        }
        pins = QUERY_CROSS.get(name, [])
        n_cols_checked += len(hits) + len(cross_cols - set(hits))
        for r in rows:
            d = r.asDict()
            bad = False
            for c, (rn, chk) in hits.items():
                v = d.get(c)
                if v is None or isinstance(v, bool) or not isinstance(v, (int, float)):
                    continue
                if isinstance(v, float) and math.isnan(v):
                    continue
                if not chk(v):
                    violations.append((name, c, rn, v))
                    bad = True
            for rn, detail in _cross_violations(d, roles):
                violations.append((name, detail.split("=")[0], rn, detail))
                bad = True
            for label, chk in pins:
                ok = chk(d)
                if ok is False:
                    violations.append((name, label, "query_pin", {k: d[k] for k in list(d)[:6]}))
                    bad = True
            if bad:
                break  # one failing row per query is enough signal
        if name in MONOTONE:
            n_cols_checked += len(MONOTONE[name][1])
            violations.extend(_monotone_violations(name, [r.asDict() for r in rows]))

    for label, reqs, chk in CROSS_QUERY:
        if any(q not in cq_rows for q in reqs):
            continue  # partial run (explicit query args) — identity not due
        n_cols_checked += 1
        err = chk(cq_rows)
        if err is not None:
            violations.append(("<cross-query>", label, "cross_query", err))

    for q, c, rn, v in violations:
        print(f"INV BAD   {q}.{c} [{rn}] = {v}")
    for q, msg in errors:
        print(f"INV ERR   {q}: {msg}")
    print(
        f"{n_cols_checked} name-bound columns checked, "
        f"{len(violations)} violations, {len(errors)} errors"
    )
    return 1 if violations or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
