"""Exact cross-engine rounding of integer money units to decimal dollars.

``round(double, 2)`` is NOT cross-engine-safe when the true rational has
more than 2 decimal places: Spark rounds the SHORTEST DECIMAL
representation of the double (BigDecimal.valueOf -> HALF_UP) while
C-engine round() operates on the binary value, so a cell landing on a
half-cent boundary (units ≡ 50 mod 100 — about 1% of uniformly
distributed sums) diverges. The fuzzer caught exactly this on
cohort_ltv_matrix (cum spend / 2 customers with odd cents).

The safe form rounds in INTEGER space first — half-up via
``(x + d/2) div d`` — and divides the resulting exact integer once at the
end: both engines then convert the SAME integer to double and divide by a
power of ten, which is deterministic.

Helpers below emit matched Spark SQL expression strings and DuckDB SQL so
the two sides can never drift. The emitted expressions are SIGN-SYMMETRIC
(half-away-from-zero via a CASE, matching profit_by_nation_year's
convention): Spark's ``div`` truncates toward zero while DuckDB's ``//``
floors, so a bare ``(x + d/2) div d`` agrees across engines only for
non-negative x — the CASE removes that footgun for refund/net-revenue
style sums that can go negative.

PINNED ``round(double, N)`` EXCEPTIONS — the raw-double convention
------------------------------------------------------------------
The integer-space rule above applies to EXACT-DECIMAL data (money,
quantities, percents). A second class of outputs is genuinely irrational
and CANNOT be made exact; for these the registry keeps engine-side
``round(x, N)`` with the SAME N and the SAME IEEE op order on both
engines, and relies on the gate's 6-sig-fig normalization. A shortest-
decimal half-boundary needs the true value to sit within one double ULP
of a 10^-N half-grid point — vanishingly unlikely for irrational values
(vs ~1% for cent sums). This inventory is the complete, deliberate list;
sweeps should not re-litigate members of these families:

- **stddev / variance / covariance / correlation** (``sqrt`` of a mean of
  squares): price_stats_by_flag, winsorized_value_stats, corr-style
  queries in relational_extra/behavior_extra/experiment_stats.
- **log-domain scores** (``ln``/``log2``/entropy/perplexity):
  char_trigram_lm_score, zipf_slope_fit, entropy/burstiness families in
  textstats/behavior_extra.  (NOT an exception: ``round(log2(w & -w))``
  in the HLL register path — w&-w is a power of two, log2 is exactly an
  integer, the round is exact by construction.)
- **eval-suite error metrics** (RMSE / si-RMSE / angular error / tonemap
  means): evaluation.py — means of sqrt/acos terms.
- **means of already-irrational per-row doubles** (avg of token-length
  ratios, avg log-probs, cosine scores): textstats/similarity/search_rank
  — the per-row terms are bit-identical across engines (vectors.py dot /
  identical expressions), so the sum is bit-identical and one final
  round agrees.

Membership test for a NEW query: if the rounded value is a ratio of exact
integers (money cents, counts, whole percents), use the helpers below —
no exceptions. Only a value passed through sqrt/log/exp/acos or an
irrational constant may use engine-side round, and then both engines must
compute it with identical op order.
"""

from __future__ import annotations


def spark_units_to_dollars(units_expr: str, scale: int) -> str:
    """Spark SQL: round(units/scale, 2) in exact integer arithmetic.

    `scale` = units per dollar (10^4 for cent-percent units, 10^6 for
    cent-percent-percent charge units, 10^2 for plain cents).
    """
    d = scale // 100  # units per cent
    # CAST to DOUBLE before the decimal literal: Spark SQL parses 100.0 as
    # DECIMAL(4,1), and BIGINT/DECIMAL division yields DECIMAL output —
    # the gate normalizes it, but the published schema should stay DOUBLE
    if d == 1:
        return f"CAST({units_expr} AS DOUBLE) / 100.0"
    u = f"({units_expr})"
    return (
        f"(CASE WHEN {u} >= 0"
        f" THEN CAST(({u} + {d // 2}) div {d} AS DOUBLE)"
        f" ELSE -CAST((-{u} + {d // 2}) div {d} AS DOUBLE) END) / 100.0"
    )


def sql_units_to_dollars(units_expr: str, scale: int) -> str:
    """DuckDB SQL equivalent of :func:`spark_units_to_dollars`."""
    d = scale // 100
    if d == 1:
        return f"CAST(({units_expr}) AS BIGINT) / 100.0"
    u = f"({units_expr})"
    return (
        f"(CASE WHEN {u} >= 0"
        f" THEN CAST(({u} + {d // 2}) // {d} AS BIGINT)"
        f" ELSE -CAST((-{u} + {d // 2}) // {d} AS BIGINT) END) / 100.0"
    )


def spark_avg_units(sum_expr: str, n_expr: str, per: int, dp: int) -> str:
    """Spark SQL: round(sum/(per*n), dp) half-up in exact integers.

    round(k/(per*n), dp) == ((2*10^dp*k + per*n) div (2*per*n)) / 10^dp.
    The numerator is widened to DECIMAL(38,0) so 2*10^dp*k cannot overflow
    BIGINT at large scale (DuckDB widens sums to HUGEINT natively); the
    `div` result is back in BIGINT range because it is the mean scaled by
    10^dp.
    """
    out = 10**dp
    k = f"CAST({sum_expr} AS DECIMAL(38,0))"
    den = f"(2 * {per} * CAST({n_expr} AS BIGINT))"
    return (
        f"(CASE WHEN {k} >= 0"
        f" THEN CAST(({k} * {2 * out} + {per} * CAST({n_expr} AS BIGINT))"
        f" div {den} AS DOUBLE)"
        f" ELSE -CAST((-{k} * {2 * out} + {per} * CAST({n_expr} AS BIGINT))"
        f" div {den} AS DOUBLE) END) / {float(out)}"
    )


def sql_avg_units(sum_expr: str, n_expr: str, per: int, dp: int) -> str:
    """DuckDB SQL equivalent of :func:`spark_avg_units` (sums are already
    HUGEINT in DuckDB, so no explicit widening is needed)."""
    out = 10**dp
    k = f"CAST({sum_expr} AS HUGEINT)"
    den = f"(2 * {per} * CAST({n_expr} AS BIGINT))"
    return (
        f"(CASE WHEN {k} >= 0"
        f" THEN CAST(({2 * out} * {k} + {per} * CAST({n_expr} AS BIGINT))"
        f" // {den} AS BIGINT)"
        f" ELSE -CAST(({2 * out} * -{k} + {per} * CAST({n_expr} AS BIGINT))"
        f" // {den} AS BIGINT) END) / {float(out)}"
    )
