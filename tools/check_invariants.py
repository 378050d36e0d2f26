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

Usage: python tools/check_invariants.py [query ...]
"""

from __future__ import annotations

import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

# (query, column): why the name-implied domain does not apply.
EXCLUDE = {
    ("media_wav_probe", "sample_rate"): "Hz, not a fraction",
    ("overlapping_order_windows", "overlap_s"): "seconds of overlap, not a fraction",
    ("wow_type_delta", "pct_change"): "signed percent change; unbounded",
    ("discount_quantity_elasticity", "slope_qty_per_pct"): "signed regression slope per percentage point",
    ("returned_revenue_by_nation", "returned_share"): "published as percent (0-100), matching oracle",
    ("promo_revenue_share", "promo_share"): "TPC-H Q14 promo_revenue is a percent (0-100), matching oracle",
}


def main() -> int:
    from datapipeline_ops_spark.queries import QUERIES
    from datapipeline_ops_spark.session import get_spark

    spark = get_spark("check-invariants", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    only = set(sys.argv[1:])
    n_cols_checked = 0
    violations: list[tuple[str, str, str, object]] = []
    errors: list[tuple[str, str]] = []
    for name, spec in QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = spec.fn(spark, SF_DIR)
            rows = df.collect()
        except Exception as exc:  # noqa: BLE001 — a crashing query is itself a finding
            errors.append((name, str(exc).splitlines()[0][:200]))
            continue
        hits = {}
        for c in df.columns:
            if (name, c) in EXCLUDE:
                continue
            for rn, rx, chk in RULES:
                if rx.search(c):
                    hits[c] = (rn, chk)
                    break
        n_cols_checked += len(hits)
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
            if bad:
                break  # one failing row per query is enough signal

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
