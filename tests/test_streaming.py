"""Streaming semantics tests that the finite-drain oracle queries can't
cover: genuinely incremental micro-batches (maxFilesPerTrigger=1) and
watermark-driven late-data dropping in append mode."""

import os
import shutil

import pyspark.sql.functions as F
import pytest

from datapipeline_ops_spark.streaming.ops import run_stream_to_table

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def two_batch_dir(spark, tmp_path):
    """Two parquet files that arrive as two micro-batches: batch 1 carries
    on-time data up to 12:00; batch 2 carries one row at 12:30 (advances the
    watermark past 11:00 windows) and one LATE row at 09:30."""
    d = str(tmp_path / "src")
    os.makedirs(d, exist_ok=True)
    b1 = spark.createDataFrame(
        [("2024-01-01 10:10:00",), ("2024-01-01 10:40:00",), ("2024-01-01 11:50:00",)],
        ["ts_str"],
    ).select(F.to_timestamp("ts_str").alias("ts"))
    b2 = spark.createDataFrame(
        [("2024-01-01 12:30:00",), ("2024-01-01 09:30:00",)], ["ts_str"]
    ).select(F.to_timestamp("ts_str").alias("ts"))
    b1.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "b1"))
    b2.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "b2"))
    # file source lists in path order; name files so b1 sorts first
    for i, src in enumerate(["b1", "b2"]):
        part = [f for f in os.listdir(tmp_path / src) if f.endswith(".parquet")][0]
        shutil.copyfile(tmp_path / src / part, os.path.join(d, f"{i:03d}.parquet"))
    return d


def test_append_mode_emits_only_watermark_sealed_windows(spark, two_batch_dir):
    schema = spark.read.parquet(two_batch_dir).schema
    s = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(two_batch_dir)
    )
    agg = (
        s.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = run_stream_to_table(agg, output_mode="append")
    got = {r["w"]["start"].strftime("%H:%M"): r["n"] for r in out.collect()}
    # Guaranteed semantics only (the late-data guarantee is one-directional:
    # rows within the watermark are never dropped; rows beyond it MAY still
    # be aggregated — observed Spark 4 behavior aggregates the 09:30 row):
    # - on-time windows sealed by the final watermark (12:20) are emitted;
    # - the 12:00 window is NOT sealed and must not be emitted in append mode.
    assert got["10:00"] == 2 and got["11:00"] == 1
    assert "12:00" not in got


def test_incremental_batches_accumulate_state(spark, two_batch_dir):
    schema = spark.read.parquet(two_batch_dir).schema
    s = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(two_batch_dir)
    )
    agg = (
        s.withWatermark("ts", "10 hours")  # generous: nothing dropped
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = run_stream_to_table(agg, output_mode="complete")
    got = {r["w"]["start"].strftime("%H:%M"): r["n"] for r in out.collect()}
    # complete mode with a lax watermark keeps every window incl. the late row
    assert got == {"09:00": 1, "10:00": 2, "11:00": 1, "12:00": 1}


def test_foreach_batch_idempotent_sink(spark, two_batch_dir):
    """foreachBatch drains micro-batches into an arbitrary batch sink; the
    idempotency contract is keyed on batch_id (a redelivered id must not
    double-write)."""
    from datapipeline_ops_spark.streaming.ops import run_stream_foreach_batch

    schema = spark.read.parquet(two_batch_dir).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(two_batch_dir)
    )
    written: dict[int, int] = {}

    def write_batch(batch_df, batch_id):
        if batch_id in written:  # redelivery: skip (idempotent per batch_id)
            return
        written[batch_id] = batch_df.count()
        # simulate a redelivery of the same id — must be a no-op
        if batch_id in written:
            write_batch(batch_df, batch_id)

    run_stream_foreach_batch(sdf, write_batch, output_mode="append")
    assert len(written) == 2, written  # maxFilesPerTrigger=1 → one batch per file
    assert sum(written.values()) == spark.read.parquet(two_batch_dir).count()


def test_checkpoint_resume_processes_only_new_files(spark, tmp_path, two_batch_dir):
    """Restart with the same checkpointLocation resumes from the recorded
    offset: after draining both files, re-running with ONE new file appended
    processes only that file (the incremental-restart contract a 100 TB
    continuous-ingest pipeline relies on)."""
    import pyspark.sql.functions as F
    from datapipeline_ops_spark.streaming.ops import run_stream_foreach_batch

    ckpt = str(tmp_path / "ckpt")
    schema = spark.read.parquet(two_batch_dir).schema
    seen: list[int] = []

    def drain():
        sdf = spark.readStream.schema(schema).parquet(two_batch_dir)
        q = (
            sdf.writeStream.foreachBatch(lambda b, bid: seen.append(b.count()))
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    first_total = sum(seen)
    assert first_total == spark.read.parquet(two_batch_dir).count()

    # one NEW file lands; resume must process exactly its rows, nothing else
    extra = spark.createDataFrame([("2024-01-01 13:00:00",)], ["ts_str"]).select(
        F.to_timestamp("ts_str").alias("ts")
    )
    tmp_out = tmp_path / "extra"
    extra.coalesce(1).write.mode("overwrite").parquet(str(tmp_out))
    import os, shutil

    part = [f for f in os.listdir(tmp_out) if f.endswith(".parquet")][0]
    shutil.copyfile(tmp_out / part, os.path.join(two_batch_dir, "zzz_new.parquet"))

    seen.clear()
    drain()
    assert sum(seen) == 1, seen


def test_events_stream_cache_refreshes_on_source_change(spark, tmp_path):
    """A regenerated source parquet must invalidate the stream-source cache
    copy (the cache compares (mtime, size), not mere existence)."""
    import os
    import shutil

    from datapipeline_ops_spark.streaming import ops as sops

    src_dir = tmp_path / "sfX"
    src_dir.mkdir()
    shutil.copyfile("/root/testdata/sf0.001/events.parquet", src_dir / "events.parquet")
    d1 = sops._events_stream_dir(str(src_dir))
    first_stat = os.stat(os.path.join(d1, "events.parquet"))

    # regenerate the source: different content + mtime
    shutil.copyfile("/root/testdata/sf0.01/events.parquet", src_dir / "events.parquet")
    d2 = sops._events_stream_dir(str(src_dir))
    second_stat = os.stat(os.path.join(d2, "events.parquet"))
    assert d1 == d2
    assert second_stat.st_size == os.path.getsize(src_dir / "events.parquet")
    assert (first_stat.st_mtime, first_stat.st_size) != (
        second_stat.st_mtime,
        second_stat.st_size,
    )


def test_stream_psi_drift_windows_and_bounds(spark, sf_dir):
    from datapipeline_ops_spark.queries import QUERIES
    from datapipeline_ops_spark.tables import load_table

    rows = QUERIES["stream_psi_drift"].fn(spark, sf_dir).collect()
    e = load_table(spark, sf_dir, "events")
    n_days = (
        e.select((F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long").alias("d"))
        .distinct()
        .count()
    )
    assert len(rows) == n_days, "one PSI row per event-time day window"
    for r in rows:
        assert r.window_start % 86_400 == 0
        assert r.psi >= 0.0
        assert r.drift == (r.psi > 0.2)
    # i.i.d. synthetic stream: a well-sampled day must not alarm (small-
    # sample days MAY alarm — PSI noise scales ~bins/n, which is the correct
    # monitoring behavior, not a defect)
    per_day = {
        r.d: r.n
        for r in e.select(
            (F.unix_micros("ts") / F.lit(86_400_000_000)).cast("long").alias("d")
        )
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        if per_day[r.window_start // 86_400] >= 200:
            assert not r.drift, (r.window_start, r.psi)


def test_stream_topk_frequent_items_exact(spark, sf_dir):
    """The MG-in-state-store candidates must contain every event type (slot
    budget exceeds the domain), so the verified top-5 equals the exact batch
    ranking regardless of micro-batch splits."""
    import pyspark.sql.functions as F

    from datapipeline_ops_spark.queries.streaming_queries import (
        stream_topk_frequent_items,
    )
    from datapipeline_ops_spark.tables import load_table

    rows = sorted(stream_topk_frequent_items(spark, sf_dir).collect(), key=lambda r: r.rnk)
    exact = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    want = sorted(exact, key=lambda r: (-r.cnt, r.event_type))[:5]
    assert [(r.event_type, r.cnt) for r in rows] == [(r.event_type, r.cnt) for r in want]
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))


class _FakeState:
    """Minimal GroupState stub for driving _update_mg directly."""

    def __init__(self, value=None):
        self._v = value

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _mg_sequential(items, capacity):
    """The original row-at-a-time MG scan, as the reference model."""
    d, n_ev = {}, 0
    for item in items:
        if item in d:
            d[item] += 1
        elif len(d) < capacity:
            d[item] = 1
        else:
            n_ev += 1
            dead = [k for k in d if d[k] == 1]
            for k in d:
                d[k] -= 1
            for k in dead:
                del d[k]
    return d, n_ev


def _drive_mg(batches, state=None):
    import pandas as pd

    from datapipeline_ops_spark.streaming.stateful import _update_mg

    st = state or _FakeState()
    outs = []
    for b in batches:
        outs.append(
            list(_update_mg((0,), iter([pd.DataFrame({"item": b})]), st))[0]
        )
    return st, outs


def test_mg_vectorized_fold_matches_sequential_scan():
    from datapipeline_ops_spark.streaming.stateful import MG_CAPACITY

    # under-capacity batches (fast path) must be bit-identical to the scan,
    # including across batch splits
    items = (["a"] * 5 + ["b"] * 3 + ["c", "d"]) * 4
    for split in (1, 3, 7):
        batches = [items[i : i + split] for i in range(0, len(items), split)]
        st, outs = _drive_mg(batches)
        ids, counts, n_seen, n_ev = st.get
        ref, ref_ev = _mg_sequential(items, MG_CAPACITY)
        assert dict(zip(ids, counts)) == ref
        assert n_seen == len(items) and n_ev == ref_ev == 0


def test_mg_eviction_fallback_counts_and_matches_scan():
    from datapipeline_ops_spark.streaming.stateful import MG_CAPACITY

    # more distinct items than slots in one batch -> the sequential
    # fallback runs, evictions are counted, and the table stays bounded
    items = [f"t{i}" for i in range(MG_CAPACITY + 9)] + ["t0"] * 4
    st, outs = _drive_mg([items])
    ids, counts, n_seen, n_ev = st.get
    ref, ref_ev = _mg_sequential(items, MG_CAPACITY)
    assert dict(zip(ids, counts)) == ref
    assert n_ev == ref_ev > 0
    assert len(ids) <= MG_CAPACITY
    assert outs[0]["n_evictions"].iloc[0] == n_ev


def test_mg_empty_table_emits_sentinel_row():
    from datapipeline_ops_spark.streaming.stateful import MG_CAPACITY

    # a full table hit by a fresh item decrements all; engineer counts so
    # the table drains to empty, and the emission must still carry n_seen
    st = _FakeState(([f"s{i}" for i in range(MG_CAPACITY)], [1] * MG_CAPACITY, 7, 0))
    _, outs = _drive_mg([["fresh"]], state=st)
    out = outs[0]
    assert len(out) == 1 and out["item"].iloc[0] is None
    assert out["n_seen"].iloc[0] == 8 and out["n_evictions"].iloc[0] == 1
    assert st.get[0] == [] and st.get[1] == []
