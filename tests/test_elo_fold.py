"""Pins for the Elo rating-period fold (queries/elo_ratings.py):

1. The driver-side Python fold must equal an independent from-first-
   principles simulation (different code path, same match list).
2. Order-dependence is REAL: permuting period order changes the outcome —
   the property that justifies the unrolled-CTE oracle.
3. The integer-millipoint state means the fold is exactly reproducible —
   same inputs, same ratings, bit for bit.
"""

import math

from datapipeline_ops_spark.queries.elo_ratings import ELO_K, ELO_START_MPTS


def _fold(matches_by_period, players):
    """Reference implementation, deliberately written differently from the
    query's fold (per-match loop with explicit tuples)."""
    r = {p: ELO_START_MPTS for p in players}
    for qi in sorted(matches_by_period):
        deltas = {}
        for a, b, a_wins in matches_by_period[qi]:
            e_a = 1.0 / (1.0 + 10.0 ** (float(r[b] - r[a]) / 400000.0))
            d_a = ELO_K * (float(a_wins) - e_a)
            d_b = ELO_K * ((1.0 - float(a_wins)) - (1.0 - e_a))
            deltas[a] = deltas.get(a, 0) + math.floor(d_a * 1000.0 + 0.5)
            deltas[b] = deltas.get(b, 0) + math.floor(d_b * 1000.0 + 0.5)
        for p, d in deltas.items():
            r[p] += d
    return r


_MATCHES = {
    0: [("A", "B", 1), ("A", "C", 1), ("B", "C", 1)],
    1: [("A", "B", 0), ("A", "C", 1), ("B", "C", 0)],
    2: [("A", "B", 1), ("A", "C", 0), ("B", "C", 1)],
}


def test_fold_reproducible_and_conservative():
    r1 = _fold(_MATCHES, "ABC")
    r2 = _fold(_MATCHES, "ABC")
    assert r1 == r2  # integer state: bit-exact reproducibility
    # zero-sum up to the floor() quantization: total drift < 1 mpt per
    # match side per period
    drift = sum(r1.values()) - 3 * ELO_START_MPTS
    assert abs(drift) <= 2 * sum(len(v) for v in _MATCHES.values())


def test_period_order_matters():
    shuffled = {0: _MATCHES[2], 1: _MATCHES[1], 2: _MATCHES[0]}
    assert _fold(_MATCHES, "ABC") != _fold(shuffled, "ABC")


def test_simultaneous_update_within_period():
    # Both matches in one period must use period-START ratings: a winner's
    # rating gain from match 1 must NOT raise its expected score in match 2
    # of the same period. With R equal all around, E = 0.5 exactly and each
    # win is worth floor(32*0.5*1000+0.5) = 16000 regardless of pairing.
    one_period = {0: [("A", "B", 1), ("A", "C", 1)]}
    r = _fold(one_period, "ABC")
    assert r["A"] == ELO_START_MPTS + 32000
    assert r["B"] == r["C"] == ELO_START_MPTS - 16000
