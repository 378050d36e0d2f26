"""Round-12 property tests: cross-document substring removal semantics
against a pure-Python reference model, and the caption/image agreement
gate's construction invariants."""

import re

import pyarrow as pa
import pyarrow.parquet as pq

from datapipeline_ops_spark.queries.dedup import (
    CROSSDOC_K,
    crossdoc_substring_dedup,
    dedup_savings_by_source,
)
from datapipeline_ops_spark.queries.multimodal import (
    _CIA_WRONG,
    _PH_HAM_T,
    _PH_KEYS,
    _PH_PERT,
    caption_image_agreement,
)
from datapipeline_ops_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _model_crossdoc(docs):
    """Pure-Python reference: k-token windows at stride 1, keep the global
    first occurrence of each cross-doc gram, remove the rest, merge spans.
    Returns {doc_id: (n_tokens, n_marked, n_removed)}."""
    toks = {d: re.split(r"\s+", t) for d, t in docs}
    occ = {}
    for d, t in sorted(docs):
        tt = toks[d]
        for s in range(len(tt) - CROSSDOC_K + 1):
            occ.setdefault(" ".join(tt[s : s + CROSSDOC_K]), []).append((d, s + 1))
    marked = {d: [] for d, _ in docs}
    for gram, hits in occ.items():
        if len({d for d, _ in hits}) < 2:
            continue
        for d, s in sorted(hits)[1:]:
            marked[d].append(s)
    out = {}
    for d, _ in docs:
        starts = sorted(marked[d])
        removed = 0
        for i, s in enumerate(starts):
            nxt = starts[i + 1] if i + 1 < len(starts) else None
            removed += min(CROSSDOC_K, nxt - s) if nxt is not None else CROSSDOC_K
        out[d] = (len(toks[d]), len(starts), removed)
    return out


def _write_docs(tmp_path, docs):
    tbl = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array([f"s{d % 2}" for d, _ in docs], pa.string()),
            "n_chars": pa.array([len(t) for _, t in docs], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))


def test_crossdoc_matches_python_model(spark, tmp_path):
    boiler = "q w e r t y u i"  # exactly CROSSDOC_K tokens
    docs = [
        (1, f"a b c {boiler} d e"),            # first occurrence -> kept
        (2, f"z {boiler} z2 {boiler} tail"),   # two later occurrences, one doc
        (3, "a b c d e f g"),                  # shorter than the window
        (4, ""),                               # empty text
        (5, f"{boiler} {boiler}"),             # overlapping repeats
        (6, "m n o p q r s t u v w x"),        # unique content, untouched
    ]
    _write_docs(tmp_path, docs)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_marked_windows"], r["n_removed_tokens"])
        for r in crossdoc_substring_dedup(spark, str(tmp_path)).collect()
    }
    assert got == _model_crossdoc(docs)
    # doc 1 wins the keep-first race (lowest doc_id); docs 2 and 5 bleed
    assert got[1][2] == 0 and got[2][2] > 0 and got[5][2] > 0
    assert got[3] == (7, 0, 0) and got[6][2] == 0
    assert got[4] == (1, 0, 0)  # '' splits to [''] on both engines


def test_crossdoc_savings_rollup_consistent(spark, tmp_path):
    docs = [
        (i, "common tokens one two three four five six tail%d" % (i % 3))
        for i in range(1, 9)
    ]
    _write_docs(tmp_path, docs)
    per_doc = crossdoc_substring_dedup(spark, str(tmp_path)).collect()
    rolled = {}
    for r in per_doc:
        a = rolled.setdefault(r["source"], [0, 0, 0])
        a[0] += 1
        a[1] += r["n_tokens"]
        a[2] += r["n_removed_tokens"]
    got = {
        r["source"]: [r["n_docs"], r["total_tokens"], r["removed_tokens"]]
        for r in dedup_savings_by_source(spark, str(tmp_path)).collect()
    }
    assert got == rolled


def test_caption_agreement_flags_exactly_the_constructed_mislabels(spark):
    doc_ids = {
        r["doc_id"] for r in load_table(spark, SF_DIR, "documents").select("doc_id").collect()
    }
    rows = caption_image_agreement(spark, SF_DIR).collect()
    dims = {r["doc_id"] for r in rows if r["reason"] == "dims"}
    hashy = {r["doc_id"] for r in rows if r["reason"] == "hash"}
    # every mislabeled caption claims the neighbouring key, whose canvas
    # width ALWAYS differs (consecutive keys differ mod 8) -> 'dims' flags
    # are exactly the constructed wrong-caption docs
    assert dims == {d for d in doc_ids if d % _CIA_WRONG == 0}
    # a correct caption can only disagree through the pixel perturbation
    assert hashy <= {d for d in doc_ids if d % _PH_PERT == 0 and d % _CIA_WRONG != 0}
    for r in rows:
        if r["reason"] == "dims":
            assert r["hamming"] == -1
            assert r["claimed_key"] == (r["true_key"] + 1) % _PH_KEYS
        else:
            assert r["hamming"] > _PH_HAM_T and r["claimed_key"] == r["true_key"]


def _h64(v, seed=None):
    import hashlib

    s = f"{seed}:{v}" if seed is not None else str(v)
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_webdataset_shard_plan_matches_python_model(spark, tmp_path):
    import math

    from datapipeline_ops_spark.queries.layout_queries import (
        WDS_ORDER_SEED,
        WDS_SHARDS,
        webdataset_shard_plan,
    )

    docs = [(i, ("tok%d " % (i % 7)) * (1 + i % 5)) for i in range(1, 41)]
    _write_docs(tmp_path, docs)
    # model: same md5-derived hashes, runs/entropy per shard
    shards = {}
    for d, t in docs:
        sid = _h64(d) % WDS_SHARDS
        shards.setdefault(sid, []).append((_h64(d, WDS_ORDER_SEED), d, f"s{d % 2}", len(t)))
    expect = {}
    for sid, rows in shards.items():
        rows.sort()
        srcs = [s for _, _, s, _ in rows]
        runs, cur = [], 1
        for a, b in zip(srcs, srcs[1:]):
            if a == b:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        n = len(rows)
        from collections import Counter

        ent = -sum((c / n) * math.log(c / n) for c in Counter(srcs).values())
        expect[sid] = (
            n,
            sum(nc for _, _, _, nc in rows),
            len(set(srcs)),
            round(ent, 6),
            max(runs),
        )
    got = {
        r["shard_id"]: (
            r["n_docs"], r["total_chars"], r["n_sources"],
            r["source_entropy"], r["max_source_run"],
        )
        for r in webdataset_shard_plan(spark, str(tmp_path)).collect()
    }
    assert got == expect


def test_padding_waste_matches_python_model(spark, tmp_path):
    from datapipeline_ops_spark.queries.layout_queries import padding_waste_report

    docs = [(i, "t " * i) for i in range(1, 20)] + [(100, ""), (101, "x")]
    _write_docs(tmp_path, docs)
    # mirror the engines' \s+ split exactly (trailing empty token included)
    toks = {d: len(re.split(r"\s+", t)) for d, t in docs}
    exp = {}
    for d, t in docs:
        n = toks[d]
        b = next(p for p in [2 ** i for i in range(17)] if n <= p)
        e = exp.setdefault(b, [0, 0])
        e[0] += 1
        e[1] += n
    got = {
        r["bucket"]: (r["n_docs"], r["real_tokens"], r["padded_tokens"], r["waste_tokens"])
        for r in padding_waste_report(spark, str(tmp_path)).collect()
    }
    assert got == {
        b: (c, rt, c * b, c * b - rt) for b, (c, rt) in exp.items()
    }
    for r in padding_waste_report(spark, str(tmp_path)).collect():
        assert 0.0 <= r["waste_share"] < 1.0


def test_crosslingual_rate_consistent_with_pairs_and_langs(spark):
    from datapipeline_ops_spark.queries.dedup import (
        crosslingual_neardup_rate,
        minhash_lsh_pairs,
    )

    langs = {
        r["doc_id"]: r["lang"]
        for r in load_table(spark, SF_DIR, "documents").select("doc_id", "lang").collect()
    }
    from collections import Counter

    exp = Counter(
        tuple(sorted((langs[r["doc_a"]], langs[r["doc_b"]])))
        for r in minhash_lsh_pairs(spark, SF_DIR).collect()
    )
    rows = crosslingual_neardup_rate(spark, SF_DIR).collect()
    got = {(r["lang_lo"], r["lang_hi"]): r["n_pairs"] for r in rows}
    assert got == dict(exp)
    total = sum(exp.values())
    for r in rows:
        assert r["is_cross"] == (r["lang_lo"] != r["lang_hi"])
        assert abs(r["pair_share"] - r["n_pairs"] / total) < 1e-6
    assert abs(sum(r["pair_share"] for r in rows) - 1.0) < 1e-5


def test_in_context_packing_partitions_each_cluster(spark):
    from datapipeline_ops_spark.queries.similarity import (
        CTX_DOCS,
        in_context_packing_plan,
        _vectors,
    )

    n_vecs = _vectors(spark, SF_DIR).count()
    rows = in_context_packing_plan(spark, SF_DIR).collect()
    # every vector lands in exactly one context
    assert sum(r["n_docs"] for r in rows) == n_vecs
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, ctxs in by_cluster.items():
        ctxs.sort(key=lambda r: r["ctx_seq"])
        # ctx_seq is dense 0..m-1; every window but the tail is full
        assert [r["ctx_seq"] for r in ctxs] == list(range(len(ctxs)))
        for r in ctxs[:-1]:
            assert r["n_docs"] == CTX_DOCS
        assert 1 <= ctxs[-1]["n_docs"] <= CTX_DOCS
    for r in rows:
        if r["n_docs"] == 1:
            assert r["mean_pair_cos"] is None and r["min_pair_cos"] is None
        else:
            assert r["min_pair_cos"] <= r["mean_pair_cos"]
            assert -1.0 <= r["min_pair_cos"] <= 1.0


def test_stream_cms_matches_python_model(spark):
    from collections import Counter

    from datapipeline_ops_spark.queries.streaming_queries import (
        CMS_DEPTH,
        CMS_SEED,
        CMS_WIDTH,
        stream_cms_frequency,
    )

    counts = Counter(
        r["event_type"]
        for r in load_table(spark, SF_DIR, "events").select("event_type").collect()
    )
    # model: register(d, w) = sum of counts of types hashing there;
    # estimate = min over depths of the probed register
    regs = {}
    for et, c in counts.items():
        for d in range(CMS_DEPTH):
            w = _h64(et, CMS_SEED + d) % CMS_WIDTH
            regs[(d, w)] = regs.get((d, w), 0) + c
    expect = {
        et: min(regs[(d, _h64(et, CMS_SEED + d) % CMS_WIDTH)] for d in range(CMS_DEPTH))
        for et in counts
    }
    rows = stream_cms_frequency(spark, SF_DIR).collect()
    assert {r["event_type"]: r["cms_est"] for r in rows} == expect
    for r in rows:
        assert r["overcount"] >= 0
        assert r["cms_est"] == r["true_count"] + r["overcount"]
        assert r["true_count"] == counts[r["event_type"]]


def test_rejection_sampling_yield_matches_python_model(spark):
    from datapipeline_ops_spark.queries.mlops_extra import (
        RSY_NS,
        RSY_SEED,
        RSY_TAU,
        rejection_sampling_yield,
    )

    ev = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "event_id", "ts")
        .collect()
    )
    per_user = {}
    for r in ev:
        per_user.setdefault(r["user_id"], []).append((r["ts"], r["event_id"]))
    rewards = {
        u: [((_h64(e, RSY_SEED)) % 1000000) / 1000000.0 for _, e in sorted(rows)]
        for u, rows in per_user.items()
    }
    got = {r["n_candidates"]: r for r in rejection_sampling_yield(spark, SF_DIR).collect()}
    assert set(got) == set(RSY_NS)
    prev_mean, prev_pass = -1.0, -1.0
    for n in sorted(RSY_NS):
        bests = [max(rw[:n]) for rw in rewards.values()]
        r = got[n]
        assert r["n_prompts"] == len(bests)
        assert abs(r["mean_best_reward"] - sum(bests) / len(bests)) < 2e-6
        assert abs(r["pass_rate"] - sum(b >= RSY_TAU for b in bests) / len(bests)) < 2e-6
        assert r["mean_best_reward"] >= prev_mean and r["pass_rate"] >= prev_pass
        prev_mean, prev_pass = r["mean_best_reward"], r["pass_rate"]
