"""Round-13 property tests: the in-engine trained quality classifier
against a pure-Python gradient-descent reference model."""

import math
import re

from datapipeline_ops_spark.queries.lm_quality import (
    _QC_B,
    _QC_W_MEANLEN,
    _QC_W_NTOK,
    _QC_W_STOP,
    _QC_W_TTR,
    _QCT_ITERS,
    _QCT_LR,
    train_quality_classifier,
)

SF_DIR = "/root/testdata/sf0.001"


def _round6(x: float) -> float:
    """Spark/DuckDB ROUND half-up (away from zero), not Python banker's."""
    s = -1.0 if x < 0 else 1.0
    return s * math.floor(abs(x) * 1e6 + 0.5) / 1e6 + 0.0


def _model_train(docs):
    """Pure-Python reference: same features, same label, same rounded GD
    trajectory as the query contract. Returns list of per-stage dicts."""
    feats = []
    for text in docs:
        # ASCII \s + space-only strip: mirror Spark split()/trim() (Java
        # ASCII \s; trim strips ' ' only) so the reference cannot diverge
        # from the query contract on Unicode-whitespace or tab-edged text.
        t = re.split(r"\s+", text, flags=re.ASCII)
        words = re.split(r"\s+", text.strip(" "), flags=re.ASCII)
        n_nonspace = len(re.sub(r"\s", "", text, flags=re.ASCII))
        n = len(t)
        mean_len = sum(len(x) for x in t) / n
        stop = sum(1 for x in t if x in ("the", "a")) / n
        ttr = len(set(t)) / n
        nw = len(words)
        mwl = n_nonspace / nw
        alpha = sum(1 for w in words if re.search("[a-zA-Z]", w)) / nw
        y = 1.0 if (50 <= nw <= 100_000 and 3.0 <= mwl <= 10.0 and alpha > 0.8) else 0.0
        fixed = (
            _QC_B
            + _QC_W_NTOK * n
            + _QC_W_MEANLEN * mean_len
            + _QC_W_STOP * stop
            + _QC_W_TTR * ttr
        ) >= 0.0
        feats.append(
            (
                min(n, 100) / 100 - 0.5,
                min(mean_len, 10.0) / 10.0 - 0.5,
                stop - 0.5,
                ttr - 0.5,
                y,
                fixed,
            )
        )
    w = [0.0] * 5  # b, w1..w4
    stages = []
    m = len(feats)
    for it in range(_QCT_ITERS + 1):
        loss = acc = pss = agr = 0.0
        g = [0.0] * 5
        for x1, x2, x3, x4, y, fixed in feats:
            z = w[0] + w[1] * x1 + w[2] * x2 + w[3] * x3 + w[4] * x4
            p = 1.0 / (1.0 + math.exp(-z))
            loss += math.log(1.0 + math.exp(z)) - y * z
            g[0] += p - y
            g[1] += (p - y) * x1
            g[2] += (p - y) * x2
            g[3] += (p - y) * x3
            g[4] += (p - y) * x4
            gate = z >= 0.0
            acc += 1.0 if gate == (y == 1.0) else 0.0
            pss += 1.0 if gate else 0.0
            agr += 1.0 if gate == fixed else 0.0
        stages.append(
            {
                "iter": it,
                "w": list(w),
                "log_loss": _round6(loss / m),
                "acc_rate": _round6(acc / m),
                "pass_rate": _round6(pss / m),
                "agree_fixed_rate": _round6(agr / m),
            }
        )
        w = [_round6(w[j] - _QCT_LR * g[j] / m) for j in range(5)]
    return stages


def test_trained_classifier_matches_python_reference(spark):
    docs = [
        r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("text")
        .collect()
    ]
    ref = _model_train(docs)
    rows = {
        r["iter"]: r.asDict()
        for r in train_quality_classifier(spark, SF_DIR).collect()
    }
    assert sorted(rows) == list(range(_QCT_ITERS + 1))
    for st in ref:
        got = rows[st["iter"]]
        w = [got["b"], got["w_ntok"], got["w_wordlen"], got["w_stop"], got["w_ttr"]]
        # weights round to 6 dp on both sides; 2e-6 absorbs a boundary ulp
        for a, b in zip(w, st["w"]):
            assert abs(a - b) <= 2e-6, (st["iter"], w, st["w"])
        for k in ("log_loss", "acc_rate", "pass_rate", "agree_fixed_rate"):
            assert abs(got[k] - st[k]) <= 2e-6, (st["iter"], k, got[k], st[k])


def test_trained_classifier_contract(spark):
    rows = sorted(
        (r.asDict() for r in train_quality_classifier(spark, SF_DIR).collect()),
        key=lambda d: d["iter"],
    )
    # stage 0 is the zero model: loss exactly ln 2, all weights zero
    z0 = rows[0]
    assert z0["b"] == z0["w_ntok"] == z0["w_wordlen"] == z0["w_stop"] == z0["w_ttr"] == 0.0
    assert abs(z0["log_loss"] - _round6(math.log(2.0))) <= 1e-9
    # lr <= 1/L: loss is monotone non-increasing across stages
    losses = [r["log_loss"] for r in rows]
    assert all(a >= b for a, b in zip(losses, losses[1:])), losses
    # training actually moves: the final stage strictly beats the zero model
    assert losses[-1] < losses[0]
    for r in rows:
        for k in ("acc_rate", "pass_rate", "agree_fixed_rate"):
            assert 0.0 <= r[k] <= 1.0


# ---------------------------------------------------------------------------
# bpe_train_loop vs a pure-Python BPE reference
# ---------------------------------------------------------------------------

from collections import Counter

from datapipeline_ops_spark.queries.lm_quality import (  # noqa: E402
    _BPE_LOOP_MERGES,
    bpe_train_loop,
)


def _model_bpe(texts, n_merges):
    """Reference BPE trainer: word-frequency vocab, overlapping weighted
    pair counts for the argmax (freq DESC, then (a, b)), greedy
    left-to-right non-overlapping scan application."""
    vocab = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.replace("\x1f", ""), flags=re.ASCII):
            if w:
                vocab[w] += 1
    syms = {w: [c for c in w] for w in vocab}
    out = []
    for idx in range(1, n_merges + 1):
        counts = Counter()
        for w, n in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += n
        if not counts:
            break
        (a, b), freq = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        applied = changed = total_after = 0
        for w, n in vocab.items():
            s = syms[w]
            new = []
            i = 0
            hit = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    new.append(a + b)
                    i += 2
                    hit += 1
                else:
                    new.append(s[i])
                    i += 1
            syms[w] = new
            applied += n * hit
            changed += 1 if hit else 0
            total_after += n * len(new)
        out.append(
            {
                "merge_idx": idx,
                "pair_a": a,
                "pair_b": b,
                "merged": a + b,
                "pair_freq": freq,
                "n_applied": applied,
                "corpus_symbols_after": total_after,
                "vocab_words_changed": changed,
            }
        )
    return out


def test_bpe_train_loop_matches_python_reference(spark):
    texts = [
        r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("text")
        .collect()
    ]
    ref = _model_bpe(texts, _BPE_LOOP_MERGES)
    got = sorted(
        (r.asDict() for r in bpe_train_loop(spark, SF_DIR).collect()),
        key=lambda d: d["merge_idx"],
    )
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        assert g == r, (g, r)


# ---------------------------------------------------------------------------
# token_chunk_udtf: identity with rag_chunk_plan (pytest form of the
# cross-query invariant, so the suite alone catches a drift)
# ---------------------------------------------------------------------------

from datapipeline_ops_spark.queries.lm_quality import rag_chunk_plan  # noqa: E402
from datapipeline_ops_spark.queries.udtf_queries import token_chunk_udtf  # noqa: E402


def test_token_chunk_udtf_equals_rag_chunk_plan(spark):
    key = lambda r: (r["doc_id"], r["chunk_idx"], r["start_tok"], r["chunk_len"], r["chunk_md5"])  # noqa: E731
    a = sorted(key(r) for r in token_chunk_udtf(spark, SF_DIR).collect())
    b = sorted(key(r) for r in rag_chunk_plan(spark, SF_DIR).collect())
    assert len(a) > 0
    assert a == b


# ---------------------------------------------------------------------------
# bpe_vocab_apply: train->apply closure vs the same pure-Python reference
# ---------------------------------------------------------------------------

from datapipeline_ops_spark.queries.lm_quality import bpe_vocab_apply  # noqa: E402


def test_bpe_vocab_apply_matches_train_final(spark):
    rows = bpe_vocab_apply(spark, SF_DIR).collect()
    loop = sorted(
        (r.asDict() for r in bpe_train_loop(spark, SF_DIR).collect()),
        key=lambda d: d["merge_idx"],
    )
    assert rows and loop
    assert sum(r["n_bpe_symbols"] for r in rows) == loop[-1]["corpus_symbols_after"]
    for r in rows:
        assert r["n_ws_tokens"] <= r["n_bpe_symbols"] <= r["n_chars"]
        assert r["fertility"] >= 1.0
        assert r["chars_per_symbol"] >= 1.0


# ---------------------------------------------------------------------------
# trained_gate_impact: apply == final training stage (pytest form)
# ---------------------------------------------------------------------------

from datapipeline_ops_spark.queries.lm_quality import trained_gate_impact  # noqa: E402


def test_trained_gate_impact_equals_final_stage(spark):
    rows = [r.asDict() for r in trained_gate_impact(spark, SF_DIR).collect()]
    stages = sorted(
        (r.asDict() for r in train_quality_classifier(spark, SF_DIR).collect()),
        key=lambda d: d["iter"],
    )
    n = sum(r["n_docs"] for r in rows)
    assert n > 0
    assert _round6(sum(r["n_pass_trained"] for r in rows) / n) == stages[-1]["pass_rate"]
    assert _round6(sum(r["n_trained_correct"] for r in rows) / n) == stages[-1]["acc_rate"]
    for r in rows:
        for k in ("n_pass_trained", "n_pass_fixed", "n_keep_label",
                  "n_trained_correct", "n_fixed_correct"):
            assert 0 <= r[k] <= r["n_docs"]


# ---------------------------------------------------------------------------
# bpe_train_loop on ADVERSARIAL random corpora vs the pure-Python reference:
# a tiny alphabet forces overlapping pairs ([a,a,a]) and deep merge chains —
# the inputs where fold-vs-greedy-scan equivalence could break. This is the
# shared-bug net: Spark-vs-DuckDB fuzz cannot see a bug both engines share,
# but the independent Python model can.
# ---------------------------------------------------------------------------

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402
from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

_BPE_WORD = st.text(alphabet="ab", min_size=1, max_size=6)
_BPE_DOC = st.lists(_BPE_WORD, min_size=1, max_size=8).map(" ".join)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(_BPE_DOC, min_size=2, max_size=8))
def test_bpe_train_loop_adversarial_alphabet(spark, tmp_path_factory, docs):
    tmp = tmp_path_factory.mktemp("bpe_adv")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
                "lang": pa.array(["en"] * len(docs), pa.string()),
                "source": pa.array([f"s{i % 2}" for i in range(len(docs))], pa.string()),
            }
        ),
        tmp / "documents.parquet",
    )
    ref = _model_bpe(docs, _BPE_LOOP_MERGES)
    got = sorted(
        (r.asDict() for r in bpe_train_loop(spark, str(tmp)).collect()),
        key=lambda d: d["merge_idx"],
    )
    assert got == ref, (got, ref)
