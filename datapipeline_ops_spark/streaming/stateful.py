"""Custom stateful streaming: ``applyInPandasWithState`` per-key running
aggregates.

Beyond-reference capability (the reference is pure batch): arbitrary
per-key state evolved batch-by-batch — the hook for streaming analogs of
the reference's stateful logic (e.g. the greedy dedup kept-set, keyed by
video). State lives in the state store, partitioned by key; a watermark
and/or state timeout bounds its size in production.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

# State accumulates integer CENTS, not a raw double sum — the repo's
# exactness convention: a float fold's result depends on batch split
# order, while the cents fold is exact for the 2-dp `value` contract.
RUNNING_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total_cents", LongType())]
)


def _update_running(
    key: tuple[Any, ...], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch into (count, sum) state; emit the running
    totals once per batch the key appears in."""
    n, cents = state.get if state.exists else (0, 0)
    for pdf in batches:
        n += len(pdf)
        cents += int((pdf["value"] * 100).round().astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
    )


def running_totals_per_user(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) via custom streaming state. Update
    output mode: each batch emits the keys it touched with their new
    running totals."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_running,
            outputStructType=RUNNING_OUTPUT_SCHEMA,
            stateStructType=RUNNING_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- Misra-Gries frequent-items state (sketch-in-state-store) -----------

MG_CAPACITY = 16  # slots per shard; above the event_type domain, so the
                  # candidate set is lossless by construction and the final
                  # verified output is independent of micro-batch splits

MG_OUTPUT_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("item", StringType()),
        StructField("mg_count", LongType()),
        StructField("n_seen", LongType()),
        StructField("n_evictions", LongType()),
    ]
)

MG_STATE_SCHEMA = StructType(
    [
        StructField("ids", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("n_seen", LongType()),
        StructField("n_evictions", LongType()),
    ]
)


def _update_mg(
    key: tuple[Any, ...], batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch into a bounded Misra-Gries counter table held
    in the state store; emit the current summary (plus the monotone n_seen
    high-water mark that identifies the FINAL emission) once per batch.

    The fold is vectorized on the common path: ``value_counts()`` collapses
    the batch to per-item totals, and when the batch's NEW distinct items
    fit in the free slots no decrement step can fire, so merging the totals
    is bit-identical to the row-at-a-time scan. Only a batch that would
    overflow the slot budget falls back to the sequential loop (MG's
    decrement-all is order-dependent, so that path must stay per-row).

    Saturation is a carried signal, not an assumption: ``n_evictions``
    counts decrement-all events for the shard's lifetime. Any nonzero value
    means the candidate set may have lost a true heavy hitter — consumers
    (stream_topk_frequent_items) must check it instead of trusting the
    sketch. A batch that leaves the table EMPTY still emits one sentinel
    row (NULL item) so the final high-water emission is never zero-row
    (a stale earlier snapshot would otherwise win the n_seen argmax)."""
    if state.exists:
        ids, counts, n_seen, n_evictions = state.get
        d = dict(zip(ids, counts))
    else:
        d, n_seen, n_evictions = {}, 0, 0
    for pdf in batches:
        n_seen += len(pdf)
        vc = pdf["item"].astype(str).value_counts()
        new = [k for k in vc.index if k not in d]
        if len(new) <= MG_CAPACITY - len(d):
            # no eviction can fire: increments never consume slots and the
            # new items all fit, so the merged result equals the scan
            for k, c in vc.items():
                d[k] = d.get(k, 0) + int(c)
            continue
        for item in pdf["item"]:
            item = str(item)
            if item in d:
                d[item] += 1
            elif len(d) < MG_CAPACITY:
                d[item] = 1
            else:
                # decrement-all step: every counter drops by one, zeroed
                # slots free up for future items
                n_evictions += 1
                dead = []
                for k in d:
                    d[k] -= 1
                    if d[k] == 0:
                        dead.append(k)
                for k in dead:
                    del d[k]
    state.update(
        (list(d.keys()), [int(v) for v in d.values()], int(n_seen), int(n_evictions))
    )
    items = sorted(d.items()) or [(None, 0)]  # sentinel keeps the final
    # emission non-empty so the n_seen high-water mark stays honest
    yield pd.DataFrame(
        {
            "shard": [int(key[0])] * len(items),
            "item": [k for k, _ in items],
            "mg_count": [int(v) for _, v in items],
            "n_seen": [int(n_seen)] * len(items),
            "n_evictions": [int(n_evictions)] * len(items),
        }
    )


def mg_frequent_items(events: DataFrame, n_shards: int = 4) -> DataFrame:
    """Sharded Misra-Gries frequent-items over a streaming column: each
    shard's bounded counter table lives in the state store and evolves
    batch-by-batch; update mode emits the summary after every batch."""
    import pyspark.sql.functions as F

    keyed = events.select(
        F.pmod(F.xxhash64("event_type"), n_shards).alias("shard"),
        F.col("event_type").alias("item"),
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        _update_mg,
        outputStructType=MG_OUTPUT_SCHEMA,
        stateStructType=MG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
