"""Round-15 optimization tests: the kmeans adaptive strategy (driver-local
Lloyd under the row cap, fused means+stats distributed loop above it) must
be invisible at the value level, and the driver-side Spark-round replica
must be exact."""

import random

import pyspark.sql.functions as F

from datapipeline_ops_spark.queries import kmeans_loop as km


def _rows_key(df):
    cols = sorted(df.columns)
    out = []
    for r in df.collect():
        out.append(tuple((c, r[c]) for c in cols))
    return sorted(out, key=repr)


def test_kmeans_driver_path_matches_distributed(spark, sf_dir, monkeypatch):
    """The cap-gated driver-local Lloyd loop (numpy column-order folds +
    Spark-round replica) must produce exactly the fused distributed loop's
    rows for all three kmeans queries — stats trajectory, in-lineage
    rollup, and the artifact apply."""
    from datapipeline_ops_spark.operators.dedup import clear_barriers
    from datapipeline_ops_spark.queries import QUERIES

    names = ["kmeans_train_loop", "kmeans_assign_apply", "kmeans_artifact_apply"]

    clear_barriers()
    km._km_memo_clear()
    drv = {n: _rows_key(QUERIES[n].fn(spark, sf_dir)) for n in names}

    clear_barriers()
    km._km_memo_clear()
    monkeypatch.setattr(km, "_KM_DRIVER_ROWS_CAP", 0)
    dist = {n: _rows_key(QUERIES[n].fn(spark, sf_dir)) for n in names}
    km._km_memo_clear()
    clear_barriers()

    for n in names:
        assert drv[n] == dist[n], n
    # sanity: the loop actually trained (full trajectory, live clusters)
    assert len(drv["kmeans_train_loop"]) == km._KM_ITERS + 1
    assert len(drv["kmeans_assign_apply"]) >= 1


def test_km_r6_matches_spark_round(spark):
    """_km_r6 must reproduce Spark's ``round(x, 6) + 0.0`` on DOUBLE for
    adversarial values: exact 6-dp half-way points, shortest-repr boundary
    cases, signed zeros, and random magnitudes."""
    from datapipeline_ops_spark.tables import local_frame

    random.seed(15)
    vals = [0.0, -0.0, 0.9999995, -0.9999995, 2.6749999999999998,
            1234.5678905, -1234.5678905, 1e-7, -1e-7, 123456.7890125]
    for k in range(-30, 30):
        vals.append(k / 2_000_000.0)
        vals.append(k / 1_000_000.0 + 5e-7)
    for _ in range(500):
        vals.append(random.uniform(-1e5, 1e5))
    for _ in range(200):
        vals.append(random.uniform(-5, 5))
    df = local_frame(
        spark, [(i, v) for i, v in enumerate(vals)], "i long, x double"
    )
    got = {
        r["i"]: r["y"]
        for r in df.select("i", (F.round("x", 6) + F.lit(0.0)).alias("y")).collect()
    }
    for i, v in enumerate(vals):
        assert got[i] == km._km_r6(v), (v, got[i], km._km_r6(v))
    assert km._km_r6(None) is None


def test_km_driver_lloyd_edge_cases(spark):
    """Seedless and empty corpora walk the distributed semantics exactly:
    NULL inertia, zero active clusters, stage-0 n_moved pinned to 0,
    NULL n_moved afterwards, empty rollup."""
    # empty corpus
    cents, stats, rollup = km._km_driver_lloyd([])
    assert rollup == []
    assert all(c == {} for c in cents)
    for it, inertia, n_active, n_moved in stats:
        assert inertia is None and n_active == 0
        assert n_moved == (0 if it == 0 else None)
    # seedless corpus: vec_ids entirely outside the IVF seed range
    from datapipeline_ops_spark.queries.similarity import IVF_CENTROIDS

    hi = IVF_CENTROIDS[1] + 1000
    rows = [(hi + i, [float(i + d) for d in range(64)]) for i in range(5)]
    cents, stats, rollup = km._km_driver_lloyd(rows)
    assert rollup == []
    assert all(c == {} for c in cents)
    for it, inertia, n_active, n_moved in stats:
        assert inertia is None and n_active == 0
        assert n_moved == (0 if it == 0 else None)
