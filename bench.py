#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Each query is executed to completion (count() forces the full plan — scans,
shuffles, joins — without driver-side row materialization). Timings are
wall-clock per query after a warm-up of the session (first Spark action pays
JVM/codegen startup; we warm with a trivial action so query times measure
the engine, not the JVM boot).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Headline set: spans scan+agg, join, window, explode, hash-dedup, and
# similarity — the shapes that dominate a 100 TB curation pipeline.
HEADLINE = [
    "pricing_summary",      # full lineitem scan + wide agg (TPC-H Q1 shape)
    "revenue_by_nation",    # 3-way join + agg (broadcast dims)
    "top_orders",           # join + group + global top-k
    "bin_argmax",           # window top-1-per-bin over events
    "segment_plan",         # sequence/explode row expansion
    "frame_sample_scan",    # stride sampling explode
    "similarity_argmax",    # broadcast theta-join + window argmax
    "dedup_exact",          # md5 group-by over documents
    "minhash_lsh_pairs",    # shingle → minhash → band join → verify
    "simhash_near_pairs",   # fingerprint + broadcast pair filter
    "anti_join_idempotency",  # anti-join vs output manifest
    "group_avg",            # partial-agg group-by
    "revenue_by_region_year",  # 5-table star join + rollup
    "asof_click_to_purchase",  # as-of join (union+window)
    "token_stats",          # text analysis scan
    "pipeline_frame_mining_e2e",  # composed pipeline, explode+window
    "sessionize_events",    # gaps-and-islands: 2 windows + agg on 1 exchange
    "customer_order_histogram",   # outer join + double aggregation
    "label_centroids",      # vector explode + partial-agg centroid matrix
    "promo_revenue_share",  # fact-dim broadcast join + conditional agg
    "corpus_curation_e2e",  # quality gate -> exact dedup -> near-dup clusters
]


def main() -> int:
    from datapipeline_ops_spark.queries import QUERIES
    from datapipeline_ops_spark.session import get_spark

    spark = get_spark("bench", cpus=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    # warm up JVM + parquet footer cache with a trivial action
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = QUERIES.get(name)
        if spec is None:
            continue
        t0 = time.time()
        spec.fn(spark, SF_DIR).count()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
