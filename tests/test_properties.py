"""Property-based tests (hypothesis) for engine invariants that unit
examples can't sweep: cross-engine hash agreement on arbitrary strings,
shingle/fingerprint structural laws, segment-plan conservation, and the
as-of join's defining property."""

import hashlib
import math

import duckdb
import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from datapipeline_ops_spark.functions.hashing import sql_hash64, sql_hash_unit

TEXTS = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="'\\\x00"),
    min_size=0,
    max_size=60,
)


@settings(max_examples=50, deadline=None)
@given(TEXTS, st.integers(min_value=0, max_value=99))
def test_hash64_cross_engine_agreement(s, seed):
    """DuckDB sql_hash64 == python md5 model for arbitrary ascii strings
    (the Spark side equals the python model — test_dedup covers it; this
    closes the triangle)."""
    con = duckdb.connect()
    got = con.execute(f"SELECT {sql_hash64('?', seed=seed)}", [s]).fetchone()[0]
    expected = int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)
    assert got == expected
    unit = con.execute(f"SELECT {sql_hash_unit('?', seed=seed)}", [s]).fetchone()[0]
    assert unit == (expected % 1_000_000) / 1_000_000.0 and 0 <= unit < 1


@settings(max_examples=25, deadline=None)
@given(st.lists(st.floats(min_value=1.0, max_value=1e6, allow_nan=False), min_size=1, max_size=8))
def test_segment_plan_conserves_duration(spark_session, durations):
    """Σ planned segment durations == total_duration when the tail is kept,
    or total − dropped_tail when dropped; never overlapping, never past the
    end (scene_segmenter_op.py:102-111 grid law)."""
    from datapipeline_ops_spark.operators.segments import plan_segments

    spark = spark_session
    seg, tail = 900.0, 300.0
    df = spark.createDataFrame(
        [(str(i), float(d)) for i, d in enumerate(durations)], ["k", "dur"]
    )
    rows = plan_segments(df, "dur", "k", seg, tail).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.k, []).append(r)
    for i, d in enumerate(durations):
        segs = sorted(by_key.get(str(i), []), key=lambda r: r.seg_idx)
        n_full = int(d // seg)
        rem = d - n_full * seg
        expect_n = n_full + (1 if rem >= tail else 0)
        assert len(segs) == expect_n
        if segs:
            assert segs[-1].end_time <= d + 1e-6
            total = sum(r.duration for r in segs)
            expect_total = d if rem >= tail else n_full * seg
            assert math.isclose(total, expect_total, rel_tol=1e-9, abs_tol=1e-6)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 50), st.integers(0, 3)), min_size=1, max_size=30),
    st.lists(st.tuples(st.integers(0, 50), st.integers(0, 3)), min_size=0, max_size=30),
)
def test_asof_join_defining_property(spark_session, left_rows, right_rows):
    """For every left row the match is exactly max{right.t <= left.t} within
    the key (tie → max tiebreak), or null when no such right exists."""
    from datapipeline_ops_spark.operators.temporal import asof_join

    spark = spark_session
    left = spark.createDataFrame(
        [(k, t, i) for i, (t, k) in enumerate(left_rows)], ["k", "t", "lid"]
    )
    right = spark.createDataFrame(
        [(k, t, 1000 + i, float(t)) for i, (t, k) in enumerate(right_rows)],
        ["k", "t", "rid", "val"],
    ) if right_rows else spark.createDataFrame([], "k int, t int, rid int, val double")
    out = asof_join(left, right, on="k", time_col="t", tiebreak_col="rid", right_payload=["rid", "val"])
    got = {r.lid: (r._match.rid if r._match else None) for r in out.collect()}
    for i, (t, k) in enumerate(left_rows):
        cands = [(rt, 1000 + j) for j, (rt, rk) in enumerate(right_rows) if rk == k and rt <= t]
        expect = max(cands)[1] if cands else None
        assert got[i] == expect, (i, t, k, cands)


# session-scoped fixture alias (hypothesis needs a non-function-scoped fixture)
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def spark_session(spark):
    return spark


@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 8) - 1), min_size=2, max_size=2
    ),
    st.lists(
        st.integers(min_value=0, max_value=(1 << 8) - 1), min_size=2, max_size=2
    ),
)
@settings(max_examples=50, deadline=None)
def test_morton_preserves_per_dimension_order_on_shared_prefix(a, b):
    """If two points agree on one dimension, their Morton order follows the
    other dimension — the interleaving never inverts a single-axis range."""
    from datapipeline_ops_spark.queries.layout_queries import _sql_morton2

    con = duckdb.connect()

    def z(x, y):
        return con.execute(
            f"SELECT {_sql_morton2('x', 'y')} FROM (SELECT {x} AS x, {y} AS y)"
        ).fetchone()[0]

    (xa, ya), (xb, yb) = a, b
    if xa == xb and ya < yb:
        assert z(xa, ya) < z(xb, yb)
    if ya == yb and xa < xb:
        assert z(xa, ya) < z(xb, yb)


@given(st.integers(min_value=0, max_value=10**9), st.integers(min_value=1, max_value=10**6))
@settings(max_examples=50, deadline=None)
def test_efraimidis_key_finite_positive(doc_id, weight):
    """The weighted-sampling key -ln(u)/w must be finite and non-negative
    for every doc id: u is shifted into (0, 1], so ln never sees 0."""
    h = int(hashlib.md5(f"4242:{doc_id}".encode()).hexdigest()[:15], 16)
    u = (h % 1_000_000 + 1) / 1_000_001.0
    k = -math.log(u) / weight
    assert k >= 0.0 and math.isfinite(k)


@given(st.integers(min_value=0, max_value=10**9))
@settings(max_examples=50, deadline=None)
def test_split_assign_partitions_and_is_stable(doc_id):
    """Every doc lands in exactly one of train/val/test, identically on
    both engines (the DuckDB expression IS the oracle's)."""
    from datapipeline_ops_spark.queries.sampling_sketch import (
        SPLIT_SEED,
        SPLIT_TRAIN,
        SPLIT_VAL,
    )

    con = duckdb.connect()
    u = con.execute(
        f"SELECT {sql_hash_unit('d', SPLIT_SEED)} FROM (SELECT {doc_id} AS d)"
    ).fetchone()[0]
    h = int(hashlib.md5(f"{SPLIT_SEED}:{doc_id}".encode()).hexdigest()[:15], 16)
    assert u == (h % 1_000_000) / 1_000_000.0
    split = "train" if u < SPLIT_TRAIN else ("val" if u < SPLIT_VAL else "test")
    assert split in ("train", "val", "test")


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(codec="ascii", min_codepoint=33, exclude_characters="'\\"), min_size=1, max_size=6), min_size=0, max_size=12))
def test_shingles_sql_matches_python_model(tokens_list):
    """DuckDB sql_shingles == the python n-gram model for arbitrary token
    lists (the Spark side is shingles_from over the same array — covered
    against DuckDB by every dedup-family gate query; this pins the SQL
    mirror to the abstract definition)."""
    from datapipeline_ops_spark.functions.text import SHINGLE_N, sql_shingles

    text = " ".join(tokens_list)
    con = duckdb.connect()
    # sql_shingles references its arg twice (split + whole-text fallback)
    got = con.execute(f"SELECT {sql_shingles('?')}", [text, text]).fetchone()[0]
    # model: regexp_split on whitespace; <n tokens -> [text]
    toks = text.split(" ") if text != "" else [""]
    if len(toks) >= SHINGLE_N:
        expect = [
            " ".join(toks[i : i + SHINGLE_N])
            for i in range(len(toks) - SHINGLE_N + 1)
        ]
    else:
        expect = [text]
    assert got == expect, (text, got, expect)


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=63 * 1024 - 1))
def test_bloom_word_packing_boundaries(pos):
    """The 63-bits-per-word packing never shifts into the sign bit and
    roundtrips (word, bit) -> pos in DuckDB exactly as in the python
    model — including pos % 63 == 62, the widest shift used."""
    word, bit = pos // 63, pos % 63
    assert 0 <= bit <= 62  # 1 << 62 is safe in checked BIGINT shifts
    con = duckdb.connect()
    w, mask = con.execute(
        "SELECT ? // 63, 1::BIGINT << CAST(? % 63 AS INT)", [pos, pos]
    ).fetchone()
    assert w == word and mask == (1 << bit) > 0 and mask == 1 << bit


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=3), min_size=8, max_size=8))
def test_pq_code_pack_roundtrip(codes):
    """Packing 8 two-bit codes into one BIGINT is lossless and matches the
    SQL expression used in both engines."""
    packed = sum(k << (2 * m) for m, k in enumerate(codes))
    got = [(packed >> (2 * m)) & 3 for m in range(8)]
    assert got == codes
    con = duckdb.connect()
    sql_packed = con.execute(
        "SELECT sum(k * (1 << (2 * (m - 1))))::BIGINT FROM (SELECT unnest(?) AS k, unnest(range(1, 9)) AS m)",
        [codes],
    ).fetchone()[0]
    assert sql_packed == packed


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=10),
    st.binary(min_size=0, max_size=12 * 10 * 3),
)
def test_png_codec_roundtrips_arbitrary_pixels(w, h, seed_bytes):
    """encode -> decode is the identity for ANY pixel buffer (the codec may
    not normalize, clamp, or reorder bytes)."""
    from datapipeline_ops_spark.functions.png import decode_png_rgb, encode_png_rgb

    need = w * h * 3
    pix = (seed_bytes * (need // max(len(seed_bytes), 1) + 1))[:need] if seed_bytes else bytes(need)
    png = encode_png_rgb(w, h, pix)
    assert decode_png_rgb(png) == (w, h, pix)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=64),
       st.sampled_from([8000, 12000, 16000, 44100]))
def test_wav_codec_roundtrips_arbitrary_samples(samples, rate):
    """encode -> decode preserves every sample exactly, including the int16
    extremes, at any sample rate."""
    from datapipeline_ops_spark.functions.wav import decode_wav_pcm16, encode_wav_pcm16

    got_rate, got = decode_wav_pcm16(encode_wav_pcm16(rate, samples))
    assert got_rate == rate and got == samples


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=7),
    st.binary(min_size=1, max_size=9 * 7 * 3),
    st.lists(st.integers(min_value=0, max_value=4), min_size=7, max_size=7),
)
def test_png_defilter_recovers_any_filter_sequence(w, h, seed_bytes, ftypes):
    """The numpy defilter must invert EVERY per-row filter choice: craft an
    IDAT with a slow reference filterer (the pre-vectorization per-byte
    logic) over arbitrary pixels and arbitrary per-scanline filter types —
    decode must recover the exact pixel buffer."""
    import struct
    import zlib

    from datapipeline_ops_spark.functions.png import _chunk, _SIG, decode_png_rgb

    need = w * h * 3
    pix = (seed_bytes * (need // len(seed_bytes) + 1))[:need]
    stride = w * 3

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    def filt(ftype, line, prev):
        out = bytearray()
        for i, x in enumerate(line):
            a = line[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if ftype == 0:
                out.append(x)
            elif ftype == 1:
                out.append((x - a) & 0xFF)
            elif ftype == 2:
                out.append((x - b) & 0xFF)
            elif ftype == 3:
                out.append((x - ((a + b) >> 1)) & 0xFF)
            else:
                out.append((x - paeth(a, b, c)) & 0xFF)
        return bytes(out)

    raw = b""
    prev = bytes(stride)
    for y in range(h):
        row = pix[y * stride : (y + 1) * stride]
        raw += bytes([ftypes[y % len(ftypes)]]) + filt(ftypes[y % len(ftypes)], row, prev)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    crafted = (
        _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    assert decode_png_rgb(crafted) == (w, h, pix)


def test_monotone_audit_flags_bent_curves():
    """The cross-row monotone layer of tools/check_invariants.py must flag a
    curve bending the wrong way and accept a healthy one."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.check_invariants import MONOTONE, _monotone_violations

    rows = [
        {"nprobe": 1, "mean_recall": 0.5, "mean_candidates": 10.0},
        {"nprobe": 2, "mean_recall": 0.4, "mean_candidates": 20.0},
    ]
    bad = _monotone_violations("ann_probe_recall_curve", rows)
    assert bad and bad[0][1] == "mean_recall"
    rows[1]["mean_recall"] = 0.6
    assert not _monotone_violations("ann_probe_recall_curve", rows)
    # NULL points void a chain instead of crashing it
    rows[0]["mean_recall"] = None
    assert not _monotone_violations("ann_probe_recall_curve", rows)
    # every MONOTONE entry names its knob distinctly from its columns
    for q, (knob, cols) in MONOTONE.items():
        assert all(c != knob for c, _ in cols), q


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10_000),  # n_tokens
            st.sampled_from([1.0, 2.0, 4.0]),            # cap_epochs
        ),
        min_size=1,
        max_size=12,
    ),
    st.floats(min_value=0.1, max_value=10.0),
)
def test_waterfill_sorted_prefix_matches_iterative(sources, budget_x):
    """epoch_repeat_plan's closed form (sort by cap/weight; the capped set
    is a prefix found by one cumulative pass) must agree with the obvious
    iterative water-filling algorithm on arbitrary inputs — this guards the
    formula itself, which both engines share."""
    import math

    names = [f"s{i}" for i in range(len(sources))]
    w = {n: math.sqrt(t) for n, (t, _) in zip(names, sources)}
    cap = {n: c * t for n, (t, c) in zip(names, sources)}
    budget = budget_x * sum(t for t, _ in sources)

    # independent reference: iterate proportional fill + clamp until stable
    alloc_ref, active, b = {}, set(names), budget
    for n in names:
        alloc_ref[n] = 0.0
    while active:
        tot_w = sum(w[n] for n in active)
        over = [n for n in active if w[n] * b / tot_w >= cap[n] - 1e-9]
        if not over:
            for n in active:
                alloc_ref[n] = w[n] * b / tot_w
            break
        for n in over:
            alloc_ref[n] = cap[n]
            b -= cap[n]
            active.remove(n)

    # the query's closed form, replicated EXACTLY as the SQL computes it:
    # positional cumulative sums over every prior row in fill-rank order
    # (capped or not), then one residual split
    order = sorted(names, key=lambda n: (cap[n] / w[n], n))
    tot_w = sum(w.values())
    cum_cap = cum_w = 0.0
    capped = set()
    for n in order:
        if cap[n] * (tot_w - cum_w) <= w[n] * (budget - cum_cap):
            capped.add(n)
        cum_cap += cap[n]
        cum_w += w[n]
    b_capped = sum(cap[n] for n in capped)
    w_rem = sum(w[n] for n in names if n not in capped)
    alloc = {
        n: cap[n] if n in capped else w[n] * (budget - b_capped) / w_rem
        for n in names
    }

    for n in names:
        assert alloc[n] <= cap[n] + 1e-6 * max(cap[n], 1.0)
        assert math.isclose(alloc[n], alloc_ref[n], rel_tol=1e-6, abs_tol=1e-6), (
            n, alloc[n], alloc_ref[n], sources, budget_x
        )
