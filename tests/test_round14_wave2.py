"""Round-14 wave-2 property tests: the classical-ML closures against
independent pure-Python references (naive Bayes by literal counting, the
stump by exhaustive candidate enumeration, OLS by an independent Gaussian
elimination, PAV by the classic sequential pooling algorithm — each a
different algorithm than the relational form under test, so a shared
formula bug cannot hide)."""

import math

import pyspark.sql.functions as F

from datapipeline_ops_spark.queries.classic_ml import (
    _NB_V,
    _STUMP_BKTS,
    _STUMP_FEATS,
    _STUMP_W,
    decision_stump_apply,
    decision_stump_train,
    isotonic_calibration_pav,
    naive_bayes_confusion,
    naive_bayes_train,
    ols_normal_equations,
)
from datapipeline_ops_spark.queries.lm_quality import _qct_run

SF_DIR = "/root/testdata/sf0.001"


def _round_half_away(x: float, dp: int = 6) -> float:
    s = -1.0 if x < 0 else 1.0
    m = 10.0**dp
    return s * math.floor(abs(x) * m + 0.5) / m + 0.0


def _micro(x: float) -> int:
    return int(_round_half_away(x * 1e6, 0))


# ---------------------------------------------------------------------------
# naive Bayes vs literal counting
# ---------------------------------------------------------------------------


def test_naive_bayes_model_vs_pure_python(spark):
    rows = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "source", "text")
        .collect()
    )
    import re as _re

    toks = [
        (r["source"], t)
        for r in rows
        for t in _re.split(r"\s+", r["text"] if r["text"] is not None else "")
    ]
    # NOTE: Spark split('\\s+') on a string with no leading whitespace equals
    # re.split with ASCII classes; the corpus fixture is ASCII. Empty text
    # yields the single empty token in both, matching the engine contract.
    freq: dict[str, int] = {}
    for _, t in toks:
        freq[t] = freq.get(t, 0) + 1
    vocab = [t for t, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:_NB_V]]
    vset = set(vocab)
    v = len(vocab)
    n_docs: dict[str, int] = {}
    for r in rows:
        n_docs[r["source"]] = n_docs.get(r["source"], 0) + 1
    total = sum(n_docs.values())
    ctok: dict[tuple[str, str], int] = {}
    ctot: dict[str, int] = {}
    for src, t in toks:
        if t in vset:
            ctok[(src, t)] = ctok.get((src, t), 0) + 1
            ctot[src] = ctot.get(src, 0) + 1
    want = {}
    for src in n_docs:
        prior = _micro(math.log(n_docs[src] / total))
        for t in vocab:
            c = ctok.get((src, t), 0)
            ll = _micro(math.log((c + 1.0) / (ctot.get(src, 0) + v)))
            want[(src, t)] = (c, ll, prior)
    got = {
        (r["source"], r["tok"]): (r["n_in_class"], r["ll_micro"], r["prior_micro"])
        for r in naive_bayes_train(spark, SF_DIR).collect()
    }
    assert set(got) == set(want)
    mism = {k for k in want if want[k] != got[k]}
    assert not mism, sorted(mism)[:5]

    # classify by literal argmax with the same (score DESC, class ASC) rule
    model = {k: ll for k, (_, ll, _) in want.items()}
    priors = {src: _micro(math.log(n_docs[src] / total)) for src in n_docs}
    conf: dict[tuple[str, str], list[int]] = {}
    for r in rows:
        scores = {}
        ts = _re.split(r"\s+", r["text"] if r["text"] is not None else "")
        for cls in n_docs:
            s = priors[cls]
            for t in ts:
                if t in vset:
                    s += model[(cls, t)]
            scores[cls] = s
        pred = min(scores, key=lambda c: (-scores[c], c))
        cell = conf.setdefault((r["source"], pred), [0, 0])
        cell[0] += 1
        cell[1] += 1 if pred == r["source"] else 0
    got_conf = {
        (r["source"], r["pred_source"]): [r["n_docs"], r["n_correct"]]
        for r in naive_bayes_confusion(spark, SF_DIR).collect()
    }
    assert got_conf == conf


# ---------------------------------------------------------------------------
# decision stump vs exhaustive enumeration
# ---------------------------------------------------------------------------


def _feat_rows(spark):
    feats, _, _ = _qct_run(spark, SF_DIR)
    return feats.select("source", "x1", "x2", "x3", "x4", "y").collect()


def test_decision_stump_vs_exhaustive(spark):
    rows = _feat_rows(spark)
    col_of = dict(_STUMP_FEATS)

    def bkt(x: float) -> int:
        return min(_STUMP_BKTS - 1, max(0, math.floor((x + 0.5) / _STUMP_W)))

    # exhaustive: for every (feature, boundary) candidate, count by brute
    # force over rows — no histogram, no cumsum (different algorithm)
    want = {}
    for name, col in _STUMP_FEATS:
        present = sorted({bkt(r[col]) for r in rows})
        for b in present:
            nl = kl = nr = kr = 0
            for r in rows:
                if bkt(r[col]) <= b:
                    nl += 1
                    kl += 1 if r["y"] == 1.0 else 0
                else:
                    nr += 1
                    kr += 1 if r["y"] == 1.0 else 0
            if nl == 0 or nr == 0:
                continue
            pl, ql = kl / nl, (nl - kl) / nl
            pr, qr = kr / nr, (nr - kr) / nr
            wg = (nl * (1.0 - pl * pl - ql * ql) + nr * (1.0 - pr * pr - qr * qr)) / (
                nl + nr
            )
            want[(name, b + 1)] = (nl, kl, nr, kr, wg)
    best = min(want.items(), key=lambda kv: (kv[1][4], kv[0][0], kv[0][1]))
    got = {
        (r["feature"], r["thr_bucket"]): (
            r["n_left"],
            r["n_keep_left"],
            r["n_right"],
            r["n_keep_right"],
            r["weighted_gini"],
            r["is_best"],
        )
        for r in decision_stump_train(spark, SF_DIR).collect()
    }
    assert set(got) == set(want)
    for k, (nl, kl, nr, kr, wg) in want.items():
        gnl, gkl, gnr, gkr, gwg, gbest = got[k]
        assert (gnl, gkl, gnr, gkr) == (nl, kl, nr, kr), k
        assert abs(gwg - _round_half_away(wg)) < 1e-9, k
        assert gbest == (k == best[0]), k

    # apply: brute-force route every row down the winning split
    (bf, bb) = best[0]
    nl, kl, nr, kr, _ = best[1]
    pred_l, pred_r = 2 * kl >= nl, 2 * kr >= nr
    per_src: dict[str, list[int]] = {}
    for r in rows:
        left = (
            min(_STUMP_BKTS - 1, max(0, math.floor((r[col_of[bf]] + 0.5) / _STUMP_W)))
            <= bb - 1
        )
        pred = pred_l if left else pred_r
        cell = per_src.setdefault(r["source"], [0, 0, 0])
        cell[0] += 1
        cell[1] += 1 if pred else 0
        cell[2] += 1 if pred == (r["y"] == 1.0) else 0
    got_apply = {
        r["source"]: [r["n_docs"], r["n_pred_keep"], r["n_correct"]]
        for r in decision_stump_apply(spark, SF_DIR).collect()
    }
    assert got_apply == per_src


# ---------------------------------------------------------------------------
# OLS vs independent Gaussian elimination
# ---------------------------------------------------------------------------


def test_ols_vs_gaussian_elimination(spark):
    rows = _feat_rows(spark)
    n = len(rows)
    mom = {
        "m1": sum(r["x1"] for r in rows) / n,
        "m4": sum(r["x4"] for r in rows) / n,
        "m11": sum(r["x1"] * r["x1"] for r in rows) / n,
        "m14": sum(r["x1"] * r["x4"] for r in rows) / n,
        "m44": sum(r["x4"] * r["x4"] for r in rows) / n,
        "my": sum(r["y"] for r in rows) / n,
        "m1y": sum(r["x1"] * r["y"] for r in rows) / n,
        "m4y": sum(r["x4"] * r["y"] for r in rows) / n,
        "myy": sum(r["y"] * r["y"] for r in rows) / n,
    }
    m = {k: _round_half_away(v) for k, v in mom.items()}
    # Gaussian elimination with partial pivoting (not Cramer)
    a = [
        [1.0, m["m1"], m["m4"], m["my"]],
        [m["m1"], m["m11"], m["m14"], m["m1y"]],
        [m["m4"], m["m14"], m["m44"], m["m4y"]],
    ]
    for i in range(3):
        p = max(range(i, 3), key=lambda r_: abs(a[r_][i]))
        a[i], a[p] = a[p], a[i]
        for r_ in range(3):
            if r_ != i:
                f = a[r_][i] / a[i][i]
                a[r_] = [x - f * y for x, y in zip(a[r_], a[i])]
    b0, b1, b4 = (a[i][3] / a[i][i] for i in range(3))
    sse = (
        m["myy"]
        - 2.0 * (b0 * m["my"] + b1 * m["m1y"] + b4 * m["m4y"])
        + (
            b0 * b0
            + 2.0 * (b0 * b1 * m["m1"] + b0 * b4 * m["m4"] + b1 * b4 * m["m14"])
            + b1 * b1 * m["m11"]
            + b4 * b4 * m["m44"]
        )
    )
    sst = m["myy"] - m["my"] * m["my"]
    [got] = ols_normal_equations(spark, SF_DIR).collect()
    assert got["n"] == n
    # elimination vs Cramer agree to fp noise; published values round at 6dp
    assert abs(got["b_intercept"] - b0) < 1e-5
    assert abs(got["b_ntok"] - b1) < 1e-5
    assert abs(got["b_ttr"] - b4) < 1e-5
    assert abs(got["r2"] - (1.0 - sse / sst)) < 1e-5
    assert abs(got["rmse"] - math.sqrt(sse)) < 1e-5
    assert -1e-6 <= got["r2"] <= 1.0


# ---------------------------------------------------------------------------
# PAV minimax form vs the classic sequential pooling algorithm
# ---------------------------------------------------------------------------


def _sequential_pav(bins):
    """Classic stack-based pool-adjacent-violators on (n, keep) bins in
    knob order: pool any adjacent pair whose means invert, re-checking
    backwards after each merge. Returns the fitted mean per input bin."""
    stack: list[list[float]] = []  # [n, keep, span]
    for n, keep in bins:
        stack.append([n, keep, 1])
        while len(stack) >= 2 and (
            stack[-2][1] / stack[-2][0] > stack[-1][1] / stack[-1][0]
        ):
            n2, k2, s2 = stack.pop()
            stack[-1][0] += n2
            stack[-1][1] += k2
            stack[-1][2] += s2
    out = []
    for n, keep, span in stack:
        out.extend([keep / n] * span)
    return out


def test_pav_minimax_equals_sequential(spark):
    got = sorted(
        isotonic_calibration_pav(spark, SF_DIR).collect(), key=lambda r: r["zbin"]
    )
    bins = [(r["n_docs"], r["n_keep"]) for r in got]
    want = _sequential_pav(bins)
    for r, w in zip(got, want):
        assert abs(r["iso_rate"] - _round_half_away(w)) < 1e-9, (r["zbin"], w)
    # and the fit is monotone non-decreasing, the constraint PAV solves under
    vals = [r["iso_rate"] for r in got]
    assert all(a <= b + 1e-12 for a, b in zip(vals, vals[1:]))


def test_sequential_pav_reference_self_check():
    """The reference itself on a textbook violation pattern."""
    assert _sequential_pav([(1, 1), (1, 0)]) == [0.5, 0.5]
    assert _sequential_pav([(2, 0), (2, 2)]) == [0.0, 1.0]
    assert _sequential_pav([(1, 1), (1, 0), (2, 2)]) == [0.5, 0.5, 1.0]


# ---------------------------------------------------------------------------
# GBDT stumps vs a pure-Python L2Boost reference
# ---------------------------------------------------------------------------


def test_gbdt_vs_pure_python(spark):
    from datapipeline_ops_spark.queries.classic_ml import (
        _GB_GATE,
        _GB_LR,
        _GB_ROUNDS,
        gbdt_gate_apply,
        gbdt_stump_boost,
    )

    rows = _feat_rows(spark)
    cols = dict(_STUMP_FEATS)
    n = len(rows)
    ym = [1_000_000 if r["y"] == 1.0 else 0 for r in rows]

    def bkt(x: float) -> int:
        return min(_STUMP_BKTS - 1, max(0, math.floor((x + 0.5) / _STUMP_W)))

    f0 = int(_round_half_away(1e6 * sum(1 for v in ym if v == 1_000_000) / n, 0))
    fm = [f0] * n
    stages = []

    def metrics(stage, split):
        mse = _round_half_away(
            sum(((y - f) / 1e6) ** 2 for y, f in zip(ym, fm)) / n
        )
        npass = sum(1 for f in fm if f >= _GB_GATE)
        nok = sum(
            1 for y, f in zip(ym, fm) if (f >= _GB_GATE) == (y == 1_000_000)
        )
        stages.append((stage, split, mse, npass, nok))

    metrics(0, None)
    for m in range(1, _GB_ROUNDS + 1):
        # exhaustive candidate search by brute force (no histogram/cumsum)
        best = None
        for name, col in _STUMP_FEATS:
            for b in sorted({bkt(r[col]) for r in rows}):
                left = [i for i, r in enumerate(rows) if bkt(r[col]) <= b]
                right = [i for i, r in enumerate(rows) if bkt(r[col]) > b]
                if not left or not right:
                    continue
                sl = sum(ym[i] - fm[i] for i in left)
                sr_ = sum(ym[i] - fm[i] for i in right)
                gain = sl * sl / len(left) + sr_ * sr_ / len(right)
                key = (-gain, name, b)
                if best is None or key < best[0]:
                    vl = int(_round_half_away(_GB_LR * sl / len(left), 0))
                    vr = int(_round_half_away(_GB_LR * sr_ / len(right), 0))
                    best = (key, name, b, vl, vr)
        _, name, b, vl, vr = best
        col = cols[name]
        fm = [
            f + (vl if bkt(r[col]) <= b else vr) for f, r in zip(fm, rows)
        ]
        metrics(m, (name, b + 1, vl, vr))

    got = sorted(gbdt_stump_boost(spark, SF_DIR).collect(), key=lambda r: r["stage"])
    assert len(got) == len(stages)
    for g, (stage, split, mse, npass, nok) in zip(got, stages):
        assert g["stage"] == stage
        if split is None:
            assert g["feature"] is None and g["thr_bucket"] is None
        else:
            assert (
                g["feature"],
                g["thr_bucket"],
                g["v_left_micro"],
                g["v_right_micro"],
            ) == split, (g, split)
        assert abs(g["mse"] - mse) < 1e-9, (g["stage"], g["mse"], mse)
        assert (g["n_pass"], g["n_correct"]) == (npass, nok)
    # mse trajectory is monotone non-increasing
    vals = [s[2] for s in stages]
    assert all(a >= b - 1e-12 for a, b in zip(vals, vals[1:]))

    # apply equals the reference's final-model census per source
    per_src: dict[str, list[int]] = {}
    for r, f, y in zip(rows, fm, ym):
        cell = per_src.setdefault(r["source"], [0, 0, 0])
        cell[0] += 1
        cell[1] += 1 if f >= _GB_GATE else 0
        cell[2] += 1 if (f >= _GB_GATE) == (y == 1_000_000) else 0
    got_apply = {
        r["source"]: [r["n_docs"], r["n_pass"], r["n_correct"]]
        for r in gbdt_gate_apply(spark, SF_DIR).collect()
    }
    assert got_apply == per_src
