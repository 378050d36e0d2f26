"""Round-14 property tests: the in-engine k-means training loop against a
pure-Python Lloyd reference (the train_quality_classifier test pattern
applied to clustering)."""

import math

from datapipeline_ops_spark.queries.kmeans_loop import (
    _KM_ITERS,
    kmeans_assign_apply,
    kmeans_train_loop,
)
from datapipeline_ops_spark.queries.similarity import IVF_CENTROIDS

SF_DIR = "/root/testdata/sf0.001"


def _round6(x: float) -> float:
    """Spark/DuckDB ROUND half-up (away from zero), not Python banker's."""
    s = -1.0 if x < 0 else 1.0
    return s * math.floor(abs(x) * 1e6 + 0.5) / 1e6 + 0.0


def _model_lloyd(vecs: dict[int, list[float]], iters: int):
    """Pure-Python reference: same seeds, same squared-L2 argmin with
    cluster-id tie-break, same 6-dp-rounded mean update, same drained-
    cluster carry-over as the query contract. Returns per-stage dicts."""
    k0, k1 = IVF_CENTROIDS
    cents = {vid - k0: list(v) for vid, v in vecs.items() if k0 <= vid < k1}
    stages = []
    prev_assign = None
    for it in range(iters + 1):
        assign = {}
        inertia = 0.0
        for vid, v in vecs.items():
            best = None
            for cid in sorted(cents):
                c = cents[cid]
                d = 0.0
                for x, y in zip(v, c):
                    d += (x - y) * (x - y)
                if best is None or d < best[0]:
                    best = (d, cid)
            assign[vid] = best
            inertia += best[0]
        n_moved = (
            0
            if prev_assign is None
            else sum(1 for vid in assign if assign[vid][1] != prev_assign[vid][1])
        )
        stages.append(
            {
                "iter": it,
                "inertia": _round6(inertia),
                "n_active": len({a[1] for a in assign.values()}),
                "n_moved": n_moved,
            }
        )
        if it < iters:
            sums: dict[int, list[float]] = {}
            counts: dict[int, int] = {}
            for vid, v in vecs.items():
                cid = assign[vid][1]
                counts[cid] = counts.get(cid, 0) + 1
                s = sums.setdefault(cid, [0.0] * len(v))
                for d_i, x in enumerate(v):
                    s[d_i] += x
            for cid, s in sums.items():
                cents[cid] = [_round6(x / counts[cid]) for x in s]
        prev_assign = assign
    return stages


def _load_vecs(spark):
    rows = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    return {int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in rows}


def test_kmeans_loop_matches_python_reference(spark):
    ref = _model_lloyd(_load_vecs(spark), _KM_ITERS)
    got = {
        r["iter"]: r.asDict() for r in kmeans_train_loop(spark, SF_DIR).collect()
    }
    assert sorted(got) == list(range(_KM_ITERS + 1))
    for st in ref:
        g = got[st["iter"]]
        # inertia rounds at 6 dp on both sides from differently-ordered
        # float sums; 2e-6 absorbs a boundary ulp. Assignment-derived
        # integers must be exact — a single differently-assigned vector
        # would shift n_moved/n_active.
        assert abs(g["inertia"] - st["inertia"]) <= 2e-6, (st["iter"], g, st)
        assert g["n_active"] == st["n_active"], (st["iter"], g, st)
        assert g["n_moved"] == st["n_moved"], (st["iter"], g, st)


def test_kmeans_loop_contract(spark):
    rows = sorted(
        (r.asDict() for r in kmeans_train_loop(spark, SF_DIR).collect()),
        key=lambda d: d["iter"],
    )
    k = IVF_CENTROIDS[1] - IVF_CENTROIDS[0]
    # Lloyd: inertia monotone non-increasing; stage 0 publishes n_moved=0
    inertias = [r["inertia"] for r in rows]
    assert all(a >= b for a, b in zip(inertias, inertias[1:])), inertias
    assert rows[0]["n_moved"] == 0
    # training actually moves: at least one reassignment happened
    assert any(r["n_moved"] > 0 for r in rows[1:])
    for r in rows:
        assert 1 <= r["n_active"] <= k, r

    apply_rows = [r.asDict() for r in kmeans_assign_apply(spark, SF_DIR).collect()]
    n_vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    # every vector lands in exactly one surviving cluster
    assert sum(r["n_members"] for r in apply_rows) == n_vecs
    assert len(apply_rows) == rows[-1]["n_active"]
    total = sum(r["cluster_inertia"] for r in apply_rows)
    assert abs(total - rows[-1]["inertia"]) <= (len(apply_rows) + 1) * 5e-7 + 1e-9
    for r in apply_rows:
        assert r["cluster_inertia"] >= 0.0 and r["mean_dist"] >= 0.0


# ---------------------------------------------------------------------------
# minibatch_sgd_train vs a pure-Python SGD reference
# ---------------------------------------------------------------------------

import re

from datapipeline_ops_spark.queries.lm_quality import (  # noqa: E402
    _SGD_BATCHES,
    _SGD_EPOCHS,
    _SGD_LR,
    minibatch_sgd_train,
)


def _sgd_features(doc_rows):
    """Same ASCII-regex feature contract as the round-13 reference model."""
    feats = []
    for doc_id, text in doc_rows:
        t = re.split(r"\s+", text, flags=re.ASCII)
        n = len(t)
        mean_len = sum(len(x) for x in t) / n
        stop = sum(1 for x in t if x in ("the", "a")) / n
        ttr = len(set(t)) / n
        words = re.split(r"\s+", text.strip(" "), flags=re.ASCII)
        nw = len(words)
        mwl = len(re.sub(r"\s", "", text, flags=re.ASCII)) / nw
        alpha = sum(1 for w in words if re.search("[a-zA-Z]", w)) / nw
        y = 1.0 if (50 <= nw <= 100_000 and 3.0 <= mwl <= 10.0 and alpha > 0.8) else 0.0
        feats.append(
            (
                int(doc_id) % _SGD_BATCHES,
                min(n, 100) / 100 - 0.5,
                min(mean_len, 10.0) / 10.0 - 0.5,
                stop - 0.5,
                ttr - 0.5,
                y,
            )
        )
    return feats


def _model_sgd(doc_rows):
    feats = _sgd_features(doc_rows)
    w = [0.0] * 5
    out = []
    step = 0
    for epoch in range(_SGD_EPOCHS):
        for batch in range(_SGD_BATCHES):
            sub = [f for f in feats if f[0] == batch]
            m = len(sub)
            if m == 0:
                # empty residue class: no-op step, weights carry over
                out.append(
                    {
                        "step": step,
                        "epoch": epoch,
                        "batch_idx": batch,
                        "n_rows": 0,
                        "batch_loss": None,
                        "w": list(w),
                    }
                )
                step += 1
                continue
            loss = 0.0
            g = [0.0] * 5
            for _, x1, x2, x3, x4, y in sub:
                z = w[0] + w[1] * x1 + w[2] * x2 + w[3] * x3 + w[4] * x4
                p = 1.0 / (1.0 + math.exp(-z))
                loss += math.log(1.0 + math.exp(z)) - y * z
                g[0] += p - y
                g[1] += (p - y) * x1
                g[2] += (p - y) * x2
                g[3] += (p - y) * x3
                g[4] += (p - y) * x4
            out.append(
                {
                    "step": step,
                    "epoch": epoch,
                    "batch_idx": batch,
                    "n_rows": m,
                    "batch_loss": _round6(loss / m),
                    "w": list(w),
                }
            )
            w = [_round6(w[j] - _SGD_LR * g[j] / m) for j in range(5)]
            step += 1
    return out


def test_minibatch_sgd_matches_python_reference(spark):
    doc_rows = [
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ]
    ref = _model_sgd(doc_rows)
    got = {
        r["step"]: r.asDict() for r in minibatch_sgd_train(spark, SF_DIR).collect()
    }
    assert sorted(got) == list(range(_SGD_EPOCHS * _SGD_BATCHES))
    for st in ref:
        g = got[st["step"]]
        assert g["epoch"] == st["epoch"] and g["batch_idx"] == st["batch_idx"]
        assert g["n_rows"] == st["n_rows"], (st["step"], g, st)
        if st["batch_loss"] is None:
            assert g["batch_loss"] is None, (st["step"], g, st)
        else:
            assert abs(g["batch_loss"] - st["batch_loss"]) <= 2e-6, (st["step"], g, st)
        w = [g["b"], g["w_ntok"], g["w_wordlen"], g["w_stop"], g["w_ttr"]]
        for a, b in zip(w, st["w"]):
            assert abs(a - b) <= 2e-6, (st["step"], w, st["w"])


def test_minibatch_sgd_contract(spark):
    rows = sorted(
        (r.asDict() for r in minibatch_sgd_train(spark, SF_DIR).collect()),
        key=lambda d: d["step"],
    )
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    # each epoch's batches partition the corpus
    for e in range(_SGD_EPOCHS):
        assert sum(r["n_rows"] for r in rows if r["epoch"] == e) == n_docs
    # step 0 starts from the zero model; training moves the weights
    z0 = rows[0]
    assert z0["b"] == z0["w_ntok"] == z0["w_wordlen"] == z0["w_stop"] == z0["w_ttr"] == 0.0
    assert abs(z0["batch_loss"] - _round6(math.log(2.0))) <= 2e-6
    assert any(r["b"] != 0.0 for r in rows[1:])
