#!/usr/bin/env python
"""Plan inventory: quantified physical-plan facts for every registered query.

Walks ``__spark_entry__.queries()``, formats each plan once (no execution),
and counts the scale-critical plan features:

- exchanges (shuffles) and broadcast exchanges
- shuffle/broadcast/nested-loop join operators
- Python (Arrow) evaluation nodes (codegen ids are not visible in
  un-executed AQE plans, so they are deliberately not counted)
- parquet scans, and how many of them carry pushed filters
- global (non-partitioned) Sort nodes outside TakeOrderedAndProject — the
  classic scale smell

Output: one JSON line per query to stdout (pipe to a file), plus a summary
line. ``PLAN_INVENTORY.md`` at the repo root is the generated human table —
regenerate with ``python tools/plan_inventory.py --md > PLAN_INVENTORY.md``.

``--diff`` turns the census into a REGRESSION GATE against the committed
``PLAN_INVENTORY.md``: the named checks in check_plans.py cover ~half the
registry, so a silent plan regression elsewhere (a broadcast decaying into
a shuffle join, a new cartesian, a Python-eval node sneaking into a
relational query) would previously surface only as a bench wall. The diff
fails (exit 1) when:

- ANY query's cartesian count goes nonzero (including new queries);
- ANY query's python_eval count grows versus the committed census;
- a query with a NAMED check in check_plans.py (check title prefixed
  "<query>:") changes its exchange/broadcast/join/cartesian/python
  counts versus the committed census — those counts are load-bearing for
  the named assertion, so drift means "re-audit the query and update the
  check AND regenerate the census", never "ignore".

New queries (no committed baseline) and retired queries are reported as
info — the remediation is regenerating PLAN_INVENTORY.md, which is the
act of auditing them. ``--diff name1 name2 ...`` restricts the census to
the named queries (fast targeted re-audit after touching one file; the
retired-query scan is suppressed for subsets).

Otherwise this is measurement, not policy: `check_plans.py` asserts the
load-bearing properties per query; this inventory is the corpus-wide
census the scale story cites (e.g. "no BroadcastNestedLoopJoin outside
the documented 1-row/broadcast extents").
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# streaming queries execute a drain inside the builder; formatting their
# RETURN plan would run the stream. Inventory them by family note instead.
SKIP_PREFIXES = ("stream_",)
# these builders execute an action while building (writes, iterative
# convergence loops with localCheckpoint); plan formatting still works but
# reflects the post-action state — keep them, note the caveat in --md.
ACTION_IN_BUILDER = {
    "csv_roundtrip", "jsonl_roundtrip", "orc_roundtrip", "jsonl_records",
    "partitioned_write_prune", "bucketed_join_copartition", "manifest_source_scan",
    "neardup_clusters", "neardup_cluster_sizes", "embedding_dedup_keepers",
    "semantic_dedup_keepers", "corpus_curation_e2e", "incremental_dedup",
    "bfs_reach_3hop", "pagerank_purchase_graph", "merge_upsert_apply",
    "incremental_mv_refresh", "snapshot_diff_cdc", "pretrain_data_e2e",
}


def analyze(plan: str) -> dict:
    def count(pat: str) -> int:
        return len(re.findall(pat, plan, re.M))

    scans = count(r"Scan parquet")
    pushed = len([
        m for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan) if m.group(1).strip()
    ])
    return {
        "exchanges": count(r"^\(\d+\) Exchange"),
        "broadcasts": count(r"^\(\d+\) BroadcastExchange"),
        "smj": count(r"^\(\d+\) SortMergeJoin"),
        "shj": count(r"^\(\d+\) ShuffledHashJoin"),
        "bhj": count(r"^\(\d+\) BroadcastHashJoin"),
        "bnlj": count(r"^\(\d+\) BroadcastNestedLoopJoin"),
        "cartesian": count(r"^\(\d+\) CartesianProduct"),
        "python_eval": count(r"ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas|FlatMapCoGroupsInPandas|BatchEvalPython"),
        "parquet_scans": scans,
        "scans_with_pushdown": pushed,
        "take_ordered": count(r"TakeOrderedAndProject"),
        "sorts": count(r"^\(\d+\) Sort\b"),
        "inmemory_scans": count(r"InMemoryTableScan|Scan ExistingRDD"),
    }


_MD_ROW = re.compile(
    r"^\| (?P<q>[\w.]+?)(?:\\\*)? \| (?P<exch>\d+) \| (?P<bcast>\d+) \| "
    r"(?P<smj>\d+)/(?P<shj>\d+)/(?P<bhj>\d+) \| (?P<bnlj>\d+)/(?P<cart>\d+) \| "
    r"(?P<py>\d+) \| (?P<scans>\d+)\((?P<pushed>\d+)\) \| (?P<topk>\d+) \|$"
)


def load_committed(path: str) -> dict[str, dict]:
    out = {}
    with open(path) as fh:
        for line in fh:
            m = _MD_ROW.match(line.strip())
            if m:
                out[m.group("q")] = {k: int(v) for k, v in m.groupdict().items() if k != "q"}
    return out


def named_checked_queries() -> set[str]:
    """Queries whose check_plans.py check title follows the '<query>: ...'
    convention — their plan-shape counts are load-bearing for a named
    assertion, so the diff gate holds them to exact count stability."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import check_plans

    return {name.split(":", 1)[0].strip() for name, _ in check_plans.CHECKS if ":" in name}


def diff_against_committed(rows: list[dict], path: str, subset: bool = False) -> int:
    committed = load_committed(path)
    named = named_checked_queries()
    ok = [r for r in rows if "error" not in r]
    violations: list[str] = []
    infos: list[str] = []
    keys = ("exchanges", "broadcasts", "smj", "shj", "bhj", "bnlj", "cartesian", "python_eval")
    md_key = {
        "exchanges": "exch", "broadcasts": "bcast", "smj": "smj", "shj": "shj",
        "bhj": "bhj", "bnlj": "bnlj", "cartesian": "cart", "python_eval": "py",
    }
    for r in ok:
        q = r["query"]
        base = committed.get(q)
        if r["cartesian"]:
            violations.append(f"{q}: cartesian count {r['cartesian']} (must be 0)")
        if base is None:
            infos.append(f"{q}: new query, no committed baseline — regenerate PLAN_INVENTORY.md")
            continue
        if r["python_eval"] > base["py"]:
            violations.append(
                f"{q}: python_eval grew {base['py']} -> {r['python_eval']}"
            )
        if q in named:
            drift = [
                f"{k} {base[md_key[k]]} -> {r[k]}"
                for k in keys
                if r[k] != base[md_key[k]]
            ]
            if drift:
                violations.append(
                    f"{q}: named-checked plan shape drifted ({', '.join(drift)}) — "
                    "re-audit, update the named check, regenerate the census"
                )
    if not subset:
        current = {r["query"] for r in ok}
        for q in sorted(set(committed) - current):
            infos.append(
                f"{q}: in committed census but not analyzed now (retired/renamed/errored?)"
            )
    for line in infos:
        print(f"CENSUS INFO  {line}")
    for line in violations:
        print(f"CENSUS DRIFT {line}")
    errs = [r for r in rows if "error" in r]
    for r in errs:
        print(f"CENSUS ERR   {r['query']}: {r['error']}")
    print(
        f"census diff vs {os.path.basename(path)}: {len(ok)} analyzed, "
        f"{len(violations)} violations, {len(infos)} info, {len(errs)} errors"
    )
    return 1 if violations or errs else 0


def main() -> int:
    md = "--md" in sys.argv
    do_diff = "--diff" in sys.argv
    import contextlib
    import io

    import __spark_entry__ as entry_mod
    from datapipeline_ops_spark.session import get_spark

    only = {a for a in sys.argv[1:] if not a.startswith("--")}
    spark = get_spark("plan-inventory", cpus=4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    rows = []
    for name, fn in qs.items():
        if name.startswith(SKIP_PREFIXES):
            continue
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            stats = analyze(buf.getvalue())
        except Exception as exc:  # noqa: BLE001 — census must complete
            rows.append({"query": name, "error": f"{type(exc).__name__}: {exc}"[:160]})
            continue
        stats["query"] = name
        stats["action_in_builder"] = name in ACTION_IN_BUILDER
        rows.append(stats)

    ok = [r for r in rows if "error" not in r]
    summary = {
        "queries_analyzed": len(ok),
        "errors": len(rows) - len(ok),
        "total_exchanges": sum(r["exchanges"] for r in ok),
        "zero_shuffle_queries": sum(1 for r in ok if r["exchanges"] == 0),
        "bnlj_queries": sorted(r["query"] for r in ok if r["bnlj"]),
        "cartesian_queries": sorted(r["query"] for r in ok if r["cartesian"]),
        "python_eval_queries": sum(1 for r in ok if r["python_eval"]),
        "pushdown_scan_fraction": round(
            sum(r["scans_with_pushdown"] for r in ok)
            / max(1, sum(r["parquet_scans"] for r in ok)),
            3,
        ),
    }
    if do_diff:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "PLAN_INVENTORY.md",
        )
        return diff_against_committed(rows, path, subset=bool(only))
    if md:
        print("# PLAN INVENTORY — generated by tools/plan_inventory.py")
        print()
        print(f"Census over {len(ok)} batch query plans at {SF_DIR} "
              "(streaming drains excluded; queries marked * execute an action "
              "while building, so their final plan reads checkpointed state).")
        print()
        print("BroadcastNestedLoopJoin entries are the audited broadcast-"
              "extent pattern: a 1-row scalar frame (min/max extent, corpus "
              "stats) or a constant-size query/probe batch broadcast against "
              "the scan — never a data-sized cross product (cartesian count "
              "is the adjacent column; `check_plans.py` pins the individual "
              "cases).")
        print()
        print("| query | exch | bcast | SMJ/SHJ/BHJ | BNLJ/cart | py | scans(pushed) | topk |")
        print("| --- | --- | --- | --- | --- | --- | --- | --- |")
        for r in sorted(ok, key=lambda r: (-r["exchanges"], r["query"])):
            star = "\\*" if r["action_in_builder"] else ""
            print(
                f"| {r['query']}{star} | {r['exchanges']} | {r['broadcasts']} | "
                f"{r['smj']}/{r['shj']}/{r['bhj']} | {r['bnlj']}/{r['cartesian']} | "
                f"{r['python_eval']} | "
                f"{r['parquet_scans']}({r['scans_with_pushdown']}) | {r['take_ordered']} |"
            )
        print()
        print("## Summary")
        print()
        print("```json")
        print(json.dumps(summary, indent=2))
        print("```")
    else:
        for r in rows:
            print(json.dumps(r))
        print(json.dumps({"summary": summary}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
