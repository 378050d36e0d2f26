"""Multimodal-column queries: binary payload manifest, Arrow-batched stub
decode, resize plumbing, and frame-sample planning.

The stub queries carry utf-8 bytes of ``documents.text`` as deterministic
payload stand-ins; the ``media_png_*`` / ``media_wav_probe`` queries carry
GENUINE containers (stdlib PNG / RIFF codecs in ``functions/png.py`` and
``functions/wav.py``) and decode them for real — dimensions, pixels and
PCM samples are value-gated against oracles that never touch the bytes.
Also real throughout: BinaryType columns, typed metadata structs,
``mapInPandas`` batch iteration, and the metadata-driven frame-sample
explode. All derived values reproduce in DuckDB, so even the UDF paths
are value-checked.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datapipeline_ops_spark.core.registry import query
from datapipeline_ops_spark.operators.multimodal import (
    attach_payload,
    decode_media,
    frame_sample_indices,
    resize_stub,
)
from datapipeline_ops_spark.tables import load_table

FRAME_STEP = 7

# DuckDB mirror of stub_decode (same md5-derived arithmetic)
_H = "('0x' || substr(md5(text), 1, 15))::BIGINT"
_DECODE_CTE = f"""
    dec AS (
        SELECT doc_id,
               CAST(320 + ({_H} % 1600) AS INT) AS width,
               CAST(240 + (({_H} // 1600) % 840) AS INT) AS height,
               CAST(1 + (({_H} // (1600 * 840)) % 300) AS INT) AS n_frames
        FROM documents
    )
"""


@query(
    "media_manifest",
    oracle="""
    SELECT doc_id, 'image' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS checksum
    FROM documents
    """,
)
def media_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed media manifest: payload + STRUCT<media_type, n_bytes, checksum>.
    Checksum and size are JVM expressions over the binary column; a scan
    that only needs metadata never reads payload bytes (column pruning)."""
    d = attach_payload(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.col("media_meta.media_type").alias("media_type"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.checksum").alias("checksum"),
    )


@query("media_decode_stub", oracle=f"WITH {_DECODE_CTE} SELECT * FROM dec")
def media_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode via ``mapInPandas``: binary payloads stream
    through the pluggable decoder in columnar batches; the md5-derived stub
    yields (width, height, n_frames) the oracle recomputes exactly."""
    d = attach_payload(load_table(spark, sf_dir, "documents"))
    return decode_media(d)


@query(
    "media_resize_stub",
    oracle="SELECT doc_id, md5(text || ':128x128') AS resize_checksum FROM documents",
)
def media_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-in/binary-out resize plumbing (128x128 target): pandas batches
    transform payloads; checksum of the fake resized bytes is oracle-checked
    (the payload column itself is bytes of that checksum)."""
    d = attach_payload(load_table(spark, sf_dir, "documents"))
    return resize_stub(d, 128, 128).select("doc_id", "resize_checksum")


@query(
    "media_frame_sample",
    oracle=f"""
    WITH {_DECODE_CTE}
    SELECT doc_id, CAST(u.f AS INT) AS frame_idx
    FROM dec, LATERAL (SELECT unnest(generate_series(0, n_frames - 1, {FRAME_STEP})) AS f) AS u
    """,
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-driven frame-sample plan (``decord_reader_op.py:43-48``
    shape): decode yields n_frames, a sequence/explode yields the stride-7
    index plan. At scale the plan is pure expression work; only the
    batch-fetch of chosen frames touches media bytes."""
    dec = media_decode_stub(spark, sf_dir)
    return dec.select(
        "doc_id",
        F.explode(frame_sample_indices(F.col("n_frames"), FRAME_STEP)).alias("frame_idx"),
    ).select("doc_id", F.col("frame_idx").cast("int").alias("frame_idx"))


# ---------------------------------------------------------------------------
# REAL PNG encode -> decode roundtrip (no stub: actual image bytes)
# ---------------------------------------------------------------------------

_PNG_REP = 9  # repeat the 32-char md5 hex enough to cover max w*h*3 bytes


@query(
    "media_png_roundtrip",
    oracle=f"""
    SELECT doc_id,
           CAST(4 + doc_id % 8 AS INT) AS width,
           CAST(3 + (doc_id // 8) % 6 AS INT) AS height,
           md5(substr(repeat(md5(CAST(doc_id AS VARCHAR)), {_PNG_REP}), 1,
                      CAST((4 + doc_id % 8) * (3 + (doc_id // 8) % 6) * 3 AS INT)))
               AS pixel_md5
    FROM documents
    """,
)
def media_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode, value-gated: per document, build deterministic
    RGB pixels (md5-hex bytes keyed by doc_id), encode them as a genuine
    PNG (``functions/png.py`` — stdlib zlib container, real IHDR/IDAT/CRC),
    decode it back through the REAL branch of the decoder seam
    (``operators/multimodal.real_image_decode``), and emit the recovered
    dimensions plus the md5 of the recovered pixel buffer. The oracle
    computes the expected dimensions and pixel md5 WITHOUT decoding — so a
    single corrupted byte anywhere in the encode -> deflate -> unfilter ->
    decode chain flips the hash and goes gate-red. This replaces the
    "decode is a stub until PIL exists" caveat: PNG needs only stdlib.

    Scale shape: one ``mapInPandas`` pass — payloads are built, decoded
    and REDUCED to (dims, hash) inside the partition; image bytes never
    shuffle (the same payloads-stay-put rule as the manifest layout)."""
    import hashlib as _hl
    from collections.abc import Iterator as _It

    import pandas as _pd

    from datapipeline_ops_spark.functions.png import decode_png_rgb, encode_png_rgb

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def run(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "pixel_md5": []}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w = 4 + doc_id % 8
                h = 3 + (doc_id // 8) % 6
                pix = (
                    _hl.md5(str(doc_id).encode()).hexdigest() * _PNG_REP
                )[: w * h * 3].encode()
                png = encode_png_rgb(w, h, pix)
                dw, dh, dpix = decode_png_rgb(png)
                out["doc_id"].append(doc_id)
                out["width"].append(dw)
                out["height"].append(dh)
                out["pixel_md5"].append(_hl.md5(dpix).hexdigest())
            yield _pd.DataFrame(out)

    return d.mapInPandas(
        run, schema="doc_id long, width int, height int, pixel_md5 string"
    )


@query(
    "media_png_resize",
    oracle=f"""
    WITH base AS MATERIALIZED (
        SELECT doc_id,
               CAST(4 + doc_id % 8 AS INT) AS w,
               CAST(3 + (doc_id // 8) % 6 AS INT) AS h,
               substr(repeat(md5(CAST(doc_id AS VARCHAR)), {_PNG_REP}), 1,
                      CAST((4 + doc_id % 8) * (3 + (doc_id // 8) % 6) * 3 AS INT))
                   AS pix
        FROM documents
    )
    SELECT doc_id,
           CAST(w // 2 AS INT) AS width,
           CAST(h // 2 AS INT) AS height,
           md5((SELECT string_agg(
                    substr(pix, ((2 * (g.i // (w // 2))) * w
                                 + 2 * (g.i % (w // 2))) * 3 + 1, 3),
                    '' ORDER BY g.i)
                FROM unnest(generate_series(0, (w // 2) * (h // 2) - 1)) AS g(i)))
               AS pixel_md5
    FROM base
    """,
)
def media_png_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize, value-gated: decode each document's genuine PNG,
    nearest-neighbor downsample to (w//2, h//2) by picking source pixel
    (2x', 2y'), re-encode the result as a PNG and decode it AGAIN, then
    emit the final dimensions + pixel md5. The oracle computes the exact
    resized byte string with substring arithmetic — so the gate verifies
    the decoder, the resample kernel, AND a second full encode/decode
    roundtrip of the resized image, byte for byte. This is the resize
    seam (`operators/multimodal.resize_stub`) with the stub replaced by a
    real kernel for PNG payloads.

    Scale: same mapInPandas shape as media_png_roundtrip — payloads are
    built, transformed and reduced inside the partition; bytes never
    shuffle."""
    import hashlib as _hl
    from collections.abc import Iterator as _It

    import pandas as _pd

    from datapipeline_ops_spark.functions.png import decode_png_rgb, encode_png_rgb

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def run(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "pixel_md5": []}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w = 4 + doc_id % 8
                h = 3 + (doc_id // 8) % 6
                pix = (
                    _hl.md5(str(doc_id).encode()).hexdigest() * _PNG_REP
                )[: w * h * 3].encode()
                dw, dh, dpix = decode_png_rgb(encode_png_rgb(w, h, pix))
                w2, h2 = dw // 2, dh // 2
                resized = b"".join(
                    dpix[((2 * yp) * dw + 2 * xp) * 3 : ((2 * yp) * dw + 2 * xp) * 3 + 3]
                    for yp in range(h2)
                    for xp in range(w2)
                )
                rw, rh, rpix = decode_png_rgb(encode_png_rgb(w2, h2, resized))
                out["doc_id"].append(doc_id)
                out["width"].append(rw)
                out["height"].append(rh)
                out["pixel_md5"].append(_hl.md5(rpix).hexdigest())
            yield _pd.DataFrame(out)

    return d.mapInPandas(
        run, schema="doc_id long, width int, height int, pixel_md5 string"
    )


# ---------------------------------------------------------------------------
# REAL WAV probe (RIFF container parse + exact sample statistics)
# ---------------------------------------------------------------------------

_WAV_REP = 6  # repeat the 32-char md5 hex to cover max 2*n sample bytes


@query(
    "media_wav_probe",
    oracle=f"""
    WITH base AS MATERIALIZED (
        SELECT doc_id,
               CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
               CAST(40 + doc_id % 50 AS BIGINT) AS n_samples,
               repeat(md5(CAST(doc_id AS VARCHAR)), {_WAV_REP}) AS hx
        FROM documents
    )
    SELECT doc_id, sample_rate, n_samples,
           n_samples * 1000 // sample_rate AS duration_ms,
           (SELECT CAST(sum(
                (ascii(substr(hx, 2 * g.i + 1, 1))
                 + 256 * ascii(substr(hx, 2 * g.i + 2, 1)))
                * (ascii(substr(hx, 2 * g.i + 1, 1))
                   + 256 * ascii(substr(hx, 2 * g.i + 2, 1)))) AS BIGINT)
            FROM unnest(generate_series(0, n_samples - 1)) AS g(i)) AS sum_sq
    FROM base
    """,
)
def media_wav_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio probe, value-gated (the audio analog of the reference's
    ffprobe-based VideoProbeOp/VideoInfoOp, ``common/video/
    video_probe_op.py``): per document, synthesize a deterministic mono
    16-bit PCM WAV (samples = little-endian pairs of md5-hex bytes keyed
    by doc_id), then PARSE the RIFF container back — magic check, chunk
    walk, fmt extraction, sample decode (``functions/wav.py``) — and emit
    the probed sample rate, sample count, integer duration, and the exact
    sum of squared samples. The oracle reconstructs every value with
    character arithmetic and never touches the container, so a single
    wrong byte in encode -> chunk walk -> PCM decode goes gate-red; all
    outputs are exact integers (no float tolerance anywhere).

    Scale: one mapInPandas pass; audio bytes are built, parsed and reduced
    inside the partition and never shuffle."""
    import hashlib as _hl
    from collections.abc import Iterator as _It

    import pandas as _pd

    from datapipeline_ops_spark.functions.wav import decode_wav_pcm16, encode_wav_pcm16

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def run(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        for pdf in batches:
            out = {
                "doc_id": [], "sample_rate": [], "n_samples": [],
                "duration_ms": [], "sum_sq": [],
            }
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                rate = 8000 + (doc_id % 3) * 4000
                n = 40 + doc_id % 50
                hx = (_hl.md5(str(doc_id).encode()).hexdigest() * _WAV_REP).encode()
                samples = [hx[2 * i] + 256 * hx[2 * i + 1] for i in range(n)]
                prate, psamples = decode_wav_pcm16(encode_wav_pcm16(rate, samples))
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(prate)
                out["n_samples"].append(len(psamples))
                out["duration_ms"].append(len(psamples) * 1000 // prate)
                out["sum_sq"].append(sum(s * s for s in psamples))
            yield _pd.DataFrame(out)

    return d.mapInPandas(
        run,
        schema="doc_id long, sample_rate int, n_samples long, "
        "duration_ms long, sum_sq long",
    )


@query(
    "media_type_sniff",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image/png'
                           WHEN 1 THEN 'audio/wav'
                           ELSE 'text/plain' END AS sniffed_type,
           doc_id % 3 <> 2 AS is_binary
    FROM documents
    """,
)
def media_type_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-type sniffing by magic bytes — the ingest gate that routes
    each payload to the right decoder (and malformed ones to the dead
    letter side) BEFORE any decode is attempted. The batch carries a mixed
    corpus of real containers: genuine PNGs (``functions/png.py``),
    genuine RIFF/WAVE files (``functions/wav.py``), and UTF-8 text; the
    sniffer inspects ONLY the leading bytes (PNG signature / RIFF+WAVE
    fourCCs / printable fallback) and the oracle predicts every label from
    the construction rule — a mislabeling anywhere goes gate-red.

    Scale: one mapInPandas pass, payloads never shuffle; at ingest scale
    sniffing is a prefix read, never a full decode."""
    from collections.abc import Iterator as _It

    import pandas as _pd

    from datapipeline_ops_spark.functions.png import encode_png_rgb
    from datapipeline_ops_spark.functions.wav import encode_wav_pcm16

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def sniff(payload: bytes) -> str:
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return "image/png"
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return "audio/wav"
        return "text/plain"

    def run(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        for pdf in batches:
            out = {"doc_id": [], "sniffed_type": [], "is_binary": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                kind = doc_id % 3
                if kind == 0:
                    payload = encode_png_rgb(2, 2, bytes(12))
                elif kind == 1:
                    payload = encode_wav_pcm16(8000, [0, 1, -1])
                else:
                    payload = str(text).encode("utf-8")
                t = sniff(payload)
                out["doc_id"].append(doc_id)
                out["sniffed_type"].append(t)
                out["is_binary"].append(t != "text/plain")
            yield _pd.DataFrame(out)

    return d.mapInPandas(
        run, schema="doc_id long, sniffed_type string, is_binary boolean"
    )


# ---------------------------------------------------------------------------
# REAL frame extraction: sprite-sheet PNG -> per-frame pixel buffers
# ---------------------------------------------------------------------------

_FRAME_W = 4   # frame width in pixels
_FRAME_H = 3   # frame height
_SPRITE_REP = 5  # md5-hex repeats covering the widest sprite (4 frames)


@query(
    "media_png_frame_extract",
    oracle=f"""
    WITH base AS MATERIALIZED (
        SELECT doc_id,
               CAST(1 + doc_id % 4 AS INT) AS n_frames,
               substr(repeat(md5(CAST(doc_id AS VARCHAR)), {_SPRITE_REP}), 1,
                      CAST((1 + doc_id % 4) * {_FRAME_W} * {_FRAME_H} * 3 AS INT))
                   AS pix
        FROM base_docs
    ),
    frames AS (
        SELECT doc_id, n_frames, g.f AS frame_idx,
               (SELECT string_agg(
                    substr(pix, (y.y * (n_frames * {_FRAME_W})
                                 + g.f * {_FRAME_W}) * 3 + 1,
                           {_FRAME_W} * 3), '' ORDER BY y.y)
                FROM unnest(generate_series(0, {_FRAME_H} - 1)) AS y(y)) AS fpix
        FROM base, unnest(generate_series(0, n_frames - 1)) AS g(f)
    )
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(n_frames AS INT) AS n_frames,
           md5(fpix) AS frame_md5
    FROM frames
    """.replace("base_docs", "documents"),
)
def media_png_frame_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL frame extraction (the reference's DecordReaderOp analog,
    ``common/video/decord_reader_op.py:43-48`` — read frames out of a
    container): each document gets a genuine sprite-sheet PNG holding
    1 + doc_id % 4 frames side by side; the UDF decodes the PNG
    (``functions/png.py``) and slices out each frame's pixel block, and
    the oracle reconstructs every frame buffer with substring arithmetic
    — frame indexing, stride math, and the codec are all value-gated per
    frame.

    Scale: mapInPandas; sprites are built, decoded and reduced to
    (frame_idx, md5) in place. Row count amplifies n_frames x AFTER the
    reduction, so the shuffle-facing output is (id, idx, hash) rows —
    the same frames-never-shuffle rule as every other media query."""
    import hashlib as _hl
    from collections.abc import Iterator as _It

    import pandas as _pd

    from datapipeline_ops_spark.functions.png import decode_png_rgb, encode_png_rgb

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def run(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "n_frames": [], "frame_md5": []}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                n = 1 + doc_id % 4
                w = n * _FRAME_W
                pix = (
                    _hl.md5(str(doc_id).encode()).hexdigest() * _SPRITE_REP
                )[: w * _FRAME_H * 3].encode()
                dw, dh, dpix = decode_png_rgb(encode_png_rgb(w, _FRAME_H, pix))
                for f in range(n):
                    fpix = b"".join(
                        dpix[(y * dw + f * _FRAME_W) * 3 : (y * dw + f * _FRAME_W) * 3
                             + _FRAME_W * 3]
                        for y in range(dh)
                    )
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(f)
                    out["n_frames"].append(n)
                    out["frame_md5"].append(_hl.md5(fpix).hexdigest())
            yield _pd.DataFrame(out)

    return d.mapInPandas(
        run,
        schema="doc_id long, frame_idx int, n_frames int, frame_md5 string",
    )


# ---------------------------------------------------------------------------
# REAL audio silence segmentation (decode + run-length VAD)
# ---------------------------------------------------------------------------

_SIL_THRESH = 20000  # sample magnitude below this is "silent"
_SIL_MIN_RUN = 3     # runs this long or longer count as segments


@query(
    "audio_silence_segments",
    oracle=f"""
    WITH base AS MATERIALIZED (
        SELECT doc_id,
               CAST(40 + doc_id % 50 AS BIGINT) AS n_samples,
               repeat(md5(CAST(doc_id AS VARCHAR)), {_WAV_REP}) AS hx
        FROM documents
    ),
    s AS MATERIALIZED (
        SELECT doc_id, g.i AS i,
               ascii(substr(hx, 2 * g.i + 1, 1))
                   + 256 * ascii(substr(hx, 2 * g.i + 2, 1)) AS v
        FROM base, unnest(generate_series(0, n_samples - 1)) AS g(i)
    ),
    sil AS (
        SELECT doc_id, i,
               i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
        FROM s WHERE v < {_SIL_THRESH}
    ),
    runs AS (SELECT doc_id, count(*) AS run_len FROM sil GROUP BY doc_id, grp),
    agg AS (
        SELECT doc_id,
               CAST(sum(run_len) AS BIGINT) AS n_silent,
               CAST(sum(CASE WHEN run_len >= {_SIL_MIN_RUN} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_segments,
               CAST(max(run_len) AS BIGINT) AS longest_run
        FROM runs GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_samples,
           CAST(coalesce(a.n_silent, 0) AS BIGINT) AS n_silent,
           CAST(coalesce(a.n_segments, 0) AS BIGINT) AS n_segments,
           CAST(coalesce(a.longest_run, 0) AS BIGINT) AS longest_run
    FROM base b LEFT JOIN agg a USING (doc_id)
    """,
)
def audio_silence_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio activity segmentation — the audio analog of the
    reference's SceneSegmenterOp (``common/video/scene_segmenter_op.py``)
    and the VAD pre-chunking stage of a speech-data pipeline: per
    document, synthesize the same deterministic PCM WAV as
    `media_wav_probe`, round-trip it through the RIFF codec
    (``functions/wav.py``), threshold the DECODED samples, and extract
    silence runs with numpy run-length encoding — reporting silent-sample
    count, the number of segments of length >= {_SIL_MIN_RUN}, and the
    longest run. The oracle recomputes every value with character
    arithmetic and gaps-and-islands SQL, never touching the container, so
    the encode -> chunk walk -> decode -> RLE chain is value-gated end to
    end in exact integers.

    Scale: one mapInPandas pass; audio bytes never shuffle — only the
    5-integer summary row leaves the partition."""
    import hashlib as _hl
    from collections.abc import Iterator as _It

    import numpy as _np
    import pandas as _pd

    from datapipeline_ops_spark.functions.wav import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def run(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        for pdf in batches:
            out = {
                "doc_id": [], "n_samples": [], "n_silent": [],
                "n_segments": [], "longest_run": [],
            }
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                rate = 8000 + (doc_id % 3) * 4000
                n = 40 + doc_id % 50
                hx = (_hl.md5(str(doc_id).encode()).hexdigest() * _WAV_REP).encode()
                samples = [hx[2 * i] + 256 * hx[2 * i + 1] for i in range(n)]
                _, decoded = decode_wav_pcm16(encode_wav_pcm16(rate, samples))
                arr = _np.asarray(decoded, dtype=_np.int32)
                silent = (arr < _SIL_THRESH).astype(_np.int8)
                edges = _np.flatnonzero(
                    _np.diff(_np.concatenate(([0], silent, [0])))
                )
                run_lens = edges[1::2] - edges[0::2]
                out["doc_id"].append(doc_id)
                out["n_samples"].append(len(decoded))
                out["n_silent"].append(int(silent.sum()))
                out["n_segments"].append(int((run_lens >= _SIL_MIN_RUN).sum()))
                out["longest_run"].append(
                    int(run_lens.max()) if run_lens.size else 0
                )
            yield _pd.DataFrame(out)

    return d.mapInPandas(
        run,
        schema="doc_id long, n_samples long, n_silent long, "
        "n_segments long, longest_run long",
    )


# ---------------------------------------------------------------------------
# REAL scene-cut detection: decoded frames -> inter-frame pixel delta
# ---------------------------------------------------------------------------

_CUT_SAD = 850  # sum-of-absolute-differences above this = scene cut


@query(
    "video_scene_cut_detect",
    oracle=f"""
    WITH base AS MATERIALIZED (
        SELECT doc_id,
               CAST(1 + doc_id % 4 AS INT) AS n_frames,
               substr(repeat(md5(CAST(doc_id AS VARCHAR)), {_SPRITE_REP}), 1,
                      CAST((1 + doc_id % 4) * {_FRAME_W} * {_FRAME_H} * 3 AS INT))
                   AS pix
        FROM documents
    ),
    frames AS MATERIALIZED (
        SELECT doc_id, n_frames, g.f AS frame_idx,
               (SELECT string_agg(
                    substr(pix, (y.y * (n_frames * {_FRAME_W})
                                 + g.f * {_FRAME_W}) * 3 + 1,
                           {_FRAME_W} * 3), '' ORDER BY y.y)
                FROM unnest(generate_series(0, {_FRAME_H} - 1)) AS y(y)) AS fpix
        FROM base, unnest(generate_series(0, n_frames - 1)) AS g(f)
    ),
    sads AS (
        SELECT a.doc_id,
               (SELECT CAST(sum(abs(ascii(substr(a.fpix, p.p, 1))
                                    - ascii(substr(b.fpix, p.p, 1)))) AS BIGINT)
                FROM unnest(generate_series(1, {_FRAME_W * _FRAME_H * 3}))
                    AS p(p)) AS sad
        FROM frames a
        JOIN frames b ON b.doc_id = a.doc_id
                     AND b.frame_idx = a.frame_idx + 1
    ),
    agg AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN sad > {_CUT_SAD} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_cuts,
               CAST(max(sad) AS BIGINT) AS max_sad
        FROM sads GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_frames,
           CAST(coalesce(a.n_cuts, 0) AS BIGINT) AS n_cuts,
           CAST(coalesce(a.n_cuts, 0) + 1 AS BIGINT) AS n_scenes,
           CAST(coalesce(a.max_sad, 0) AS BIGINT) AS max_sad
    FROM (SELECT DISTINCT doc_id, n_frames FROM base) b
    LEFT JOIN agg a USING (doc_id)
    """,
)
def video_scene_cut_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel-level scene-cut detection — the reference's
    SceneSegmenterOp (``common/video/scene_segmenter_op.py``) run on
    actual decoded frames instead of metadata: each document's
    sprite-sheet PNG (same synthesis as `media_png_frame_extract`) is
    decoded through ``functions/png.py``, consecutive frames are compared
    by sum-of-absolute-differences over every RGB byte, and transitions
    above {_CUT_SAD} are cuts — the classic pixel-delta shot-boundary
    detector. The oracle recomputes every SAD with substring/ascii
    arithmetic, so codec, frame slicing, and the delta math are all
    value-gated in exact integers.

    Scale: mapInPandas; frames live and die inside the partition — only
    the per-video (n_cuts, n_scenes, max_sad) summary ever shuffles,
    exactly the frames-never-shuffle rule."""
    import hashlib as _hl
    from collections.abc import Iterator as _It

    import numpy as _np
    import pandas as _pd

    from datapipeline_ops_spark.functions.png import decode_png_rgb, encode_png_rgb

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def run(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        for pdf in batches:
            out = {"doc_id": [], "n_frames": [], "n_cuts": [], "n_scenes": [],
                   "max_sad": []}
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                n = 1 + doc_id % 4
                w = n * _FRAME_W
                pix = (
                    _hl.md5(str(doc_id).encode()).hexdigest() * _SPRITE_REP
                )[: w * _FRAME_H * 3].encode()
                dw, dh, dpix = decode_png_rgb(encode_png_rgb(w, _FRAME_H, pix))
                arr = _np.frombuffer(dpix, dtype=_np.uint8).reshape(dh, dw, 3)
                # frame f = columns [f*W, (f+1)*W) — int16 before the diff
                fr = [
                    arr[:, f * _FRAME_W : (f + 1) * _FRAME_W, :].astype(_np.int16)
                    for f in range(n)
                ]
                sads = [
                    int(_np.abs(fr[f + 1] - fr[f]).sum()) for f in range(n - 1)
                ]
                cuts = sum(1 for s in sads if s > _CUT_SAD)
                out["doc_id"].append(doc_id)
                out["n_frames"].append(n)
                out["n_cuts"].append(cuts)
                out["n_scenes"].append(cuts + 1)
                out["max_sad"].append(max(sads) if sads else 0)
            yield _pd.DataFrame(out)

    return d.mapInPandas(
        run,
        schema="doc_id long, n_frames int, n_cuts long, n_scenes long, "
        "max_sad long",
    )


# ---------------------------------------------------------------------------
# Heterogeneous media curation e2e (sniff -> decode -> gate -> rollup)
# ---------------------------------------------------------------------------

_MEDIA_E2E_MIN_TOKENS = 20


@query(
    "media_curation_e2e",
    oracle=f"""
    WITH d AS MATERIALIZED (
        SELECT doc_id, source, text, CAST(doc_id % 3 AS INT) AS media_kind
        FROM documents
    ),
    png AS (
        SELECT doc_id, source, media_kind,
               (SELECT CAST(sum(ascii(substr(pix, p.p, 1))) AS BIGINT)
                FROM unnest(generate_series(1, length(pix))) AS p(p)) AS metric,
               (1 + doc_id % 4) >= 2 AS keep
        FROM (SELECT doc_id, source, media_kind,
                     substr(repeat(md5(CAST(doc_id AS VARCHAR)), {_SPRITE_REP}),
                            1, CAST((1 + doc_id % 4)
                                    * {_FRAME_W} * {_FRAME_H} * 3 AS INT)) AS pix
              FROM d WHERE media_kind = 0)
    ),
    wav AS (
        SELECT doc_id, source, media_kind,
               (SELECT CAST(sum(CASE WHEN
                        ascii(substr(hx, 2 * g.i + 1, 1))
                        + 256 * ascii(substr(hx, 2 * g.i + 2, 1)) < {_SIL_THRESH}
                    THEN 1 ELSE 0 END) AS BIGINT)
                FROM unnest(generate_series(0, n - 1)) AS g(i)) AS metric,
               (SELECT sum(CASE WHEN
                        ascii(substr(hx, 2 * g.i + 1, 1))
                        + 256 * ascii(substr(hx, 2 * g.i + 2, 1)) < {_SIL_THRESH}
                    THEN 1 ELSE 0 END) * 2
                FROM unnest(generate_series(0, n - 1)) AS g(i)) < n AS keep
        FROM (SELECT doc_id, source, media_kind,
                     CAST(40 + doc_id % 50 AS BIGINT) AS n,
                     repeat(md5(CAST(doc_id AS VARCHAR)), {_WAV_REP}) AS hx
              FROM d WHERE media_kind = 1)
    ),
    txt AS (
        SELECT doc_id, source, media_kind,
               CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS metric,
               len(regexp_split_to_array(text, '\\s+'))
                   >= {_MEDIA_E2E_MIN_TOKENS} AS keep
        FROM d WHERE media_kind = 2
    ),
    u AS (SELECT * FROM png UNION ALL SELECT * FROM wav
          UNION ALL SELECT * FROM txt)
    SELECT source, media_kind,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           CAST(sum(metric) AS BIGINT) AS metric_sum
    FROM u GROUP BY source, media_kind
    """,
)
def media_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heterogeneous media curation end to end — the reference's actual
    pipeline shape (mixed media in, per-modality decode + gate, one
    rollup out; ``pipeline/`` drivers in the reference) run with REAL
    codecs in one composed plan: each document synthesizes a payload by
    modality (doc_id % 3 — sprite-sheet PNG / PCM WAV / UTF-8 text),
    decodes it through the genuine stdlib codec path (``functions/png.py``
    / ``wav.py``), applies the modality's quality gate (multi-frame check,
    non-silent check, token floor), and the survivors roll up per
    (source, modality). The oracle recomputes every pixel-byte sum,
    silent-sample count, and token count with character arithmetic — the
    whole decode-and-gate funnel is value-gated in exact integers.

    Scale: ONE mapInPandas pass (payloads never shuffle — only the
    5-column per-doc summary leaves the partition) followed by one
    partial-aggregated rollup on the compact (source, kind) key."""
    import hashlib as _hl
    import re as _re
    from collections.abc import Iterator as _It

    import numpy as _np
    import pandas as _pd

    from datapipeline_ops_spark.functions.png import decode_png_rgb, encode_png_rgb
    from datapipeline_ops_spark.functions.wav import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")

    def run(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        for pdf in batches:
            out = {"doc_id": [], "source": [], "media_kind": [],
                   "metric": [], "keep": []}
            for doc_id, src, text in zip(pdf["doc_id"], pdf["source"], pdf["text"]):
                doc_id = int(doc_id)
                kind = doc_id % 3
                if kind == 0:
                    n = 1 + doc_id % 4
                    w = n * _FRAME_W
                    pix = (
                        _hl.md5(str(doc_id).encode()).hexdigest() * _SPRITE_REP
                    )[: w * _FRAME_H * 3].encode()
                    _, _, dpix = decode_png_rgb(encode_png_rgb(w, _FRAME_H, pix))
                    metric = int(_np.frombuffer(dpix, dtype=_np.uint8)
                                 .astype(_np.int64).sum())
                    keep = n >= 2
                elif kind == 1:
                    rate = 8000 + (doc_id % 3) * 4000
                    n = 40 + doc_id % 50
                    hx = (_hl.md5(str(doc_id).encode()).hexdigest()
                          * _WAV_REP).encode()
                    samples = [hx[2 * i] + 256 * hx[2 * i + 1] for i in range(n)]
                    _, decoded = decode_wav_pcm16(encode_wav_pcm16(rate, samples))
                    arr = _np.asarray(decoded, dtype=_np.int32)
                    metric = int((arr < _SIL_THRESH).sum())
                    keep = metric * 2 < len(decoded)
                else:
                    metric = len(_re.split(r"\s+", str(text)))
                    keep = metric >= _MEDIA_E2E_MIN_TOKENS
                out["doc_id"].append(doc_id)
                out["source"].append(str(src))
                out["media_kind"].append(kind)
                out["metric"].append(metric)
                out["keep"].append(bool(keep))
            yield _pd.DataFrame(out)

    per_doc = d.mapInPandas(
        run,
        schema="doc_id long, source string, media_kind int, "
        "metric long, keep boolean",
    )
    return per_doc.groupBy("source", "media_kind").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long").alias("n_keep"),
        F.sum("metric").cast("long").alias("metric_sum"),
    )


# ---------------------------------------------------------------------------
# media_phash_neardup — perceptual-hash near-dup over REAL decoded images
# ---------------------------------------------------------------------------

# Image corpus layout: doc_id % _PH_KEYS picks the base image (so duplicate
# groups exist by construction); every doc_id % _PH_PERT == 0 doc carries a
# one-pixel perturbation at a doc-specific position (so NEAR-duplicates with
# small Hamming distance exist too, not just exact copies).
_PH_KEYS = 37
_PH_PERT = 3
_PH_BANDS = 4
_PH_HAM_T = 3  # pairs with Hamming <= 3 are near-dups; with 4 disjoint
               # bands the pigeonhole principle guarantees band-join recall


def _ph_oracle() -> str:
    band_exprs = ",\n               ".join(
        f"""CAST(list_sum(list_transform(
                   generate_series(0, least(bandw, n - {k} * bandw) - 1),
                   j -> CAST(bits[{k} * bandw + j + 1] AS BIGINT) << j))
               AS BIGINT) AS b{k}"""
        for k in range(_PH_BANDS)
    )
    ham = " + ".join(f"bit_count(xor(a.b{k}, b.b{k}))" for k in range(_PH_BANDS))
    return f"""
    WITH base AS MATERIALIZED (
        SELECT doc_id,
               CAST(4 + (doc_id % {_PH_KEYS}) % 8 AS INT) AS w,
               CAST(3 + ((doc_id % {_PH_KEYS}) // 8) % 6 AS INT) AS h,
               substr(repeat(md5(CAST(doc_id % {_PH_KEYS} AS VARCHAR)), {_PNG_REP}),
                      1, CAST((4 + (doc_id % {_PH_KEYS}) % 8)
                              * (3 + ((doc_id % {_PH_KEYS}) // 8) % 6) * 3 AS INT)) AS p
        FROM documents
    ),
    pixd AS MATERIALIZED (
        SELECT doc_id, w, h, w * h AS n,
               CASE WHEN doc_id % {_PH_PERT} = 0 THEN
                   substr(p, 1, CAST((doc_id % (w * h)) * 3 AS INT)) || 'zzz'
                       || substr(p, CAST((doc_id % (w * h)) * 3 + 4 AS INT))
               ELSE p END AS pix
        FROM base
    ),
    g AS MATERIALIZED (
        SELECT doc_id, w, h, n,
               list_transform(generate_series(0, n - 1),
                   i -> (ascii(substr(pix, i * 3 + 1, 1))
                         + ascii(substr(pix, i * 3 + 2, 1))
                         + ascii(substr(pix, i * 3 + 3, 1))) // 3) AS gray
        FROM pixd
    ),
    bt AS MATERIALIZED (
        SELECT doc_id, w, h, n, (n + 3) // 4 AS bandw,
               list_transform(gray,
                   x -> CASE WHEN x >= list_sum(gray) // n THEN 1 ELSE 0 END) AS bits
        FROM g
    ),
    hv AS MATERIALIZED (
        SELECT doc_id, w, h,
               {band_exprs}
        FROM bt
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST({ham} AS INT) AS hamming
    FROM hv a JOIN hv b ON a.w = b.w AND a.h = b.h AND a.doc_id < b.doc_id
    WHERE {ham} <= {_PH_HAM_T}
    """


@query("media_phash_neardup", oracle=_ph_oracle())
def media_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup detection over REAL decoded pixels: per document,
    build its genuine PNG (base image keyed by doc_id % {_PH_KEYS}; every
    {_PH_PERT}rd doc gets a one-pixel perturbation, so the corpus contains
    exact copies AND near-misses), decode it through the real codec, and
    compute an average-hash perceptual fingerprint (per-pixel gray >= image
    mean, integer arithmetic). Near-dup pairs are found the scale-correct
    way: the bit fingerprint splits into {_PH_BANDS} disjoint bands, docs
    equi-join on (dims, band_idx, band_value) — by pigeonhole any pair
    within Hamming {_PH_HAM_T} shares at least one exact band — and
    candidates verify on full Hamming distance via bit_count(xor). The
    oracle recomputes every hash arithmetically WITHOUT decoding, so one
    corrupted byte anywhere in encode -> decode -> gray -> threshold ->
    band-pack flips a band value and goes gate-red. This is MinHash-LSH's
    multimodal sibling: dedup for image corpora where byte-level hashes
    miss re-encoded/retouched copies.

    Scale shape: hashing is one mapInPandas pass (image bytes never leave
    their partition — only the 4 band BIGINTs shuffle); the candidate
    stage is an equi-join on band buckets, never all-pairs; the verify is
    integer xor/popcount on the joined rows."""
    import hashlib as _hl
    from collections.abc import Iterator as _It

    import pandas as _pd

    from datapipeline_ops_spark.functions.png import decode_png_rgb, encode_png_rgb

    d = load_table(spark, sf_dir, "documents").select("doc_id")

    def run(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        for pdf in batches:
            out = {"doc_id": [], "w": [], "h": []}
            for k in range(_PH_BANDS):
                out[f"b{k}"] = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                bk = doc_id % _PH_KEYS
                w = 4 + bk % 8
                h = 3 + (bk // 8) % 6
                pix = (_hl.md5(str(bk).encode()).hexdigest() * _PNG_REP)[: w * h * 3]
                if doc_id % _PH_PERT == 0:
                    p = doc_id % (w * h)
                    pix = pix[: p * 3] + "zzz" + pix[p * 3 + 3 :]
                dw, dh, dpix = decode_png_rgb(encode_png_rgb(w, h, pix.encode()))
                n = dw * dh
                gray = [
                    (dpix[3 * i] + dpix[3 * i + 1] + dpix[3 * i + 2]) // 3
                    for i in range(n)
                ]
                mean = sum(gray) // n
                bits = [1 if x >= mean else 0 for x in gray]
                bandw = (n + 3) // 4
                out["doc_id"].append(doc_id)
                out["w"].append(dw)
                out["h"].append(dh)
                for k in range(_PH_BANDS):
                    seg = bits[k * bandw : min(n, (k + 1) * bandw)]
                    out[f"b{k}"].append(sum(b << j for j, b in enumerate(seg)))
            yield _pd.DataFrame(out)

    schema = "doc_id long, w int, h int, " + ", ".join(
        f"b{k} long" for k in range(_PH_BANDS)
    )
    hv = d.mapInPandas(run, schema=schema)

    bands = hv.select(
        "*",
        F.posexplode(F.array(*[f"b{k}" for k in range(_PH_BANDS)])).alias(
            "band_idx", "band_val"
        ),
    )
    la = bands.alias("la")
    rb = bands.alias("rb")
    cand = (
        la.join(
            rb,
            (F.col("la.w") == F.col("rb.w"))
            & (F.col("la.h") == F.col("rb.h"))
            & (F.col("la.band_idx") == F.col("rb.band_idx"))
            & (F.col("la.band_val") == F.col("rb.band_val"))
            & (F.col("la.doc_id") < F.col("rb.doc_id")),
        )
        .select(
            F.col("la.doc_id").alias("doc_a"),
            F.col("rb.doc_id").alias("doc_b"),
            *[F.col(f"la.b{k}").alias(f"ab{k}") for k in range(_PH_BANDS)],
            *[F.col(f"rb.b{k}").alias(f"bb{k}") for k in range(_PH_BANDS)],
        )
        .distinct()
    )
    ham = None
    for k in range(_PH_BANDS):
        term = F.bit_count(F.col(f"ab{k}").bitwiseXOR(F.col(f"bb{k}")))
        ham = term if ham is None else ham + term
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= _PH_HAM_T)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# audio_fingerprint_neardup — energy-fingerprint near-dup over REAL decoded
# audio (the WAV sibling of media_phash_neardup)
# ---------------------------------------------------------------------------

# Audio corpus layout: doc_id % _AF_KEYS picks the base signal; every
# _AF_PERT-th doc carries a one-sample amplitude bump at a doc-specific
# position. Signals frame into _AF_FRAMES windows; the fingerprint bit is
# frame-mean-energy >= signal-mean-energy (all integer arithmetic).
_AF_KEYS = 29
_AF_PERT = 3
_AF_FRAMES = 32
_AF_BANDS = 4
_AF_HAM_T = 3
_AF_REP = 24  # md5 hex repeats to cover 2*n sample bytes (n <= 384)
_AF_BUMP = 5000  # perturbation amplitude (samples stay < 32767)


def _af_oracle() -> str:
    bits_per = _AF_FRAMES // _AF_BANDS
    band_exprs = ",\n               ".join(
        f"""CAST(list_sum(list_transform(
                   generate_series(0, {bits_per - 1}),
                   j -> CAST(bits[{k} * {bits_per} + j + 1] AS BIGINT) << j))
               AS BIGINT) AS b{k}"""
        for k in range(_AF_BANDS)
    )
    ham = " + ".join(f"bit_count(xor(a.b{k}, b.b{k}))" for k in range(_AF_BANDS))
    return f"""
    WITH base AS MATERIALIZED (
        SELECT doc_id,
               CAST(160 + ((doc_id % {_AF_KEYS}) % 8) * 32 AS INT) AS n,
               repeat(md5(CAST(doc_id % {_AF_KEYS} AS VARCHAR)), {_AF_REP}) AS hx
        FROM documents
    ),
    sig AS MATERIALIZED (
        SELECT doc_id, n,
               list_transform(generate_series(0, n - 1),
                   i -> (ascii(substr(hx, 2 * i + 1, 1))
                         + 256 * ascii(substr(hx, 2 * i + 2, 1)))
                        + CASE WHEN doc_id % {_AF_PERT} = 0
                                    AND i = doc_id % n
                               THEN {_AF_BUMP} ELSE 0 END) AS s
        FROM base
    ),
    fe AS MATERIALIZED (
        SELECT doc_id, n, n // {_AF_FRAMES} AS flen,
               list_transform(generate_series(0, {_AF_FRAMES - 1}),
                   f -> list_sum(s[f * (n // {_AF_FRAMES}) + 1 :
                                   (f + 1) * (n // {_AF_FRAMES})])
                        // (n // {_AF_FRAMES})) AS e,
               list_sum(s) // n AS mean_e
        FROM sig
    ),
    bt AS MATERIALIZED (
        SELECT doc_id, n,
               list_transform(e, x -> CASE WHEN x >= mean_e THEN 1 ELSE 0 END)
                   AS bits
        FROM fe
    ),
    hv AS MATERIALIZED (
        SELECT doc_id, n,
               {band_exprs}
        FROM bt
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST({ham} AS INT) AS hamming
    FROM hv a JOIN hv b ON a.n = b.n AND a.doc_id < b.doc_id
    WHERE {ham} <= {_AF_HAM_T}
    """


@query("audio_fingerprint_neardup", oracle=_af_oracle())
def audio_fingerprint_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup detection over REAL decoded PCM: per document, build
    its deterministic mono WAV (base signal keyed by doc_id % {_AF_KEYS};
    every {_AF_PERT}rd doc gets a one-sample amplitude bump), round-trip it
    through the genuine RIFF encoder/parser, frame the decoded samples into
    {_AF_FRAMES} windows, and fingerprint each frame as mean-energy >=
    signal-mean (integer arithmetic throughout — the shape of chromaprint-
    style audio fingerprints with the DSP swapped for an exact stand-in).
    Near-dup pairs form the scale-correct way: {_AF_BANDS} disjoint bands
    equi-join on (signal length, band_idx, band_value) — pigeonhole
    guarantees recall at Hamming <= {_AF_HAM_T} — then candidates verify on
    full xor/popcount distance. The oracle recomputes every fingerprint
    arithmetically WITHOUT the container, so one wrong byte in encode ->
    chunk walk -> PCM decode -> framing flips a band and goes gate-red.

    Scale shape: fingerprinting is one mapInPandas pass (audio bytes never
    leave their partition; only band BIGINTs shuffle); candidates come
    from the band equi-join, never all-pairs."""
    import hashlib as _hl
    from collections.abc import Iterator as _It

    import pandas as _pd

    from datapipeline_ops_spark.functions.wav import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    bits_per = _AF_FRAMES // _AF_BANDS

    def run(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        for pdf in batches:
            out = {"doc_id": [], "n": []}
            for k in range(_AF_BANDS):
                out[f"b{k}"] = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                bk = doc_id % _AF_KEYS
                n = 160 + (bk % 8) * 32
                hx = (_hl.md5(str(bk).encode()).hexdigest() * _AF_REP).encode()
                samples = [hx[2 * i] + 256 * hx[2 * i + 1] for i in range(n)]
                if doc_id % _AF_PERT == 0:
                    samples[doc_id % n] += _AF_BUMP
                rate = 8000
                rw, dec = decode_wav_pcm16(encode_wav_pcm16(rate, samples))
                assert rw == rate
                flen = n // _AF_FRAMES
                mean_e = sum(dec) // n
                bits = [
                    1 if sum(dec[f * flen : (f + 1) * flen]) // flen >= mean_e else 0
                    for f in range(_AF_FRAMES)
                ]
                out["doc_id"].append(doc_id)
                out["n"].append(n)
                for k in range(_AF_BANDS):
                    seg = bits[k * bits_per : (k + 1) * bits_per]
                    out[f"b{k}"].append(sum(b << j for j, b in enumerate(seg)))
            yield _pd.DataFrame(out)

    schema = "doc_id long, n int, " + ", ".join(
        f"b{k} long" for k in range(_AF_BANDS)
    )
    hv = d.mapInPandas(run, schema=schema)
    bands = hv.select(
        "*",
        F.posexplode(F.array(*[f"b{k}" for k in range(_AF_BANDS)])).alias(
            "band_idx", "band_val"
        ),
    )
    la = bands.alias("la")
    rb = bands.alias("rb")
    cand = (
        la.join(
            rb,
            (F.col("la.n") == F.col("rb.n"))
            & (F.col("la.band_idx") == F.col("rb.band_idx"))
            & (F.col("la.band_val") == F.col("rb.band_val"))
            & (F.col("la.doc_id") < F.col("rb.doc_id")),
        )
        .select(
            F.col("la.doc_id").alias("doc_a"),
            F.col("rb.doc_id").alias("doc_b"),
            *[F.col(f"la.b{k}").alias(f"ab{k}") for k in range(_AF_BANDS)],
            *[F.col(f"rb.b{k}").alias(f"bb{k}") for k in range(_AF_BANDS)],
        )
        .distinct()
    )
    ham = None
    for k in range(_AF_BANDS):
        term = F.bit_count(F.col(f"ab{k}").bitwiseXOR(F.col(f"bb{k}")))
        ham = term if ham is None else ham + term
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= _AF_HAM_T)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# caption_image_agreement — cross-column (image bytes vs text caption) gate
# ---------------------------------------------------------------------------

# Caption corpus layout: every doc carries the phash image corpus' picture
# (base keyed by doc_id % _PH_KEYS, every _PH_PERT'th doc perturbed) plus a
# text caption describing it; every _CIA_WRONG'th doc's caption claims the
# NEXT pattern key — a mislabeled image-text pair by construction.
_CIA_WRONG = 7


def _cia_band_exprs(prefix: str, bits: str, bandw: str, n: str) -> str:
    return ",\n               ".join(
        f"""CAST(list_sum(list_transform(
                   generate_series(0, least({bandw}, {n} - {k} * {bandw}) - 1),
                   j -> CAST({bits}[{k} * {bandw} + j + 1] AS BIGINT) << j))
               AS BIGINT) AS {prefix}{k}"""
        for k in range(_PH_BANDS)
    )


def _cia_oracle() -> str:
    ham = " + ".join(f"bit_count(xor(b{k}, cb{k}))" for k in range(_PH_BANDS))
    return f"""
    WITH tk AS (
        SELECT doc_id, source,
               CAST(doc_id % {_PH_KEYS} AS INT) AS bk,
               CASE WHEN doc_id % {_CIA_WRONG} = 0
                    THEN CAST((doc_id % {_PH_KEYS} + 1) % {_PH_KEYS} AS INT)
                    ELSE CAST(doc_id % {_PH_KEYS} AS INT) END AS ck
        FROM documents
    ),
    dims AS (
        SELECT doc_id, source, bk, ck,
               CAST(4 + bk % 8 AS INT) AS w, CAST(3 + (bk // 8) % 6 AS INT) AS h,
               CAST(4 + ck % 8 AS INT) AS cw, CAST(3 + (ck // 8) % 6 AS INT) AS ch
        FROM tk
    ),
    tp AS MATERIALIZED (
        SELECT doc_id, source, bk, ck, w, h, cw, ch,
               w * h AS n, cw * ch AS cn,
               CASE WHEN doc_id % {_PH_PERT} = 0 THEN
                   substr(p, 1, CAST((doc_id % (w * h)) * 3 AS INT)) || 'zzz'
                       || substr(p, CAST((doc_id % (w * h)) * 3 + 4 AS INT))
               ELSE p END AS pix,
               substr(repeat(md5(CAST(ck AS VARCHAR)), {_PNG_REP}),
                      1, CAST(cw * ch * 3 AS INT)) AS cpix
        FROM (SELECT dims.*,
                     substr(repeat(md5(CAST(bk AS VARCHAR)), {_PNG_REP}),
                            1, CAST(w * h * 3 AS INT)) AS p
              FROM dims)
    ),
    g AS MATERIALIZED (
        SELECT doc_id, source, bk, ck, w, h, cw, ch, n, cn,
               list_transform(generate_series(0, n - 1),
                   i -> (ascii(substr(pix, i * 3 + 1, 1))
                         + ascii(substr(pix, i * 3 + 2, 1))
                         + ascii(substr(pix, i * 3 + 3, 1))) // 3) AS gray,
               list_transform(generate_series(0, cn - 1),
                   i -> (ascii(substr(cpix, i * 3 + 1, 1))
                         + ascii(substr(cpix, i * 3 + 2, 1))
                         + ascii(substr(cpix, i * 3 + 3, 1))) // 3) AS cgray
        FROM tp
    ),
    bt AS MATERIALIZED (
        SELECT doc_id, source, bk, ck, w, h, cw, ch, n, cn,
               (n + 3) // 4 AS bandw, (cn + 3) // 4 AS cbandw,
               list_transform(gray,
                   x -> CASE WHEN x >= list_sum(gray) // n THEN 1 ELSE 0 END) AS bits,
               list_transform(cgray,
                   x -> CASE WHEN x >= list_sum(cgray) // cn THEN 1 ELSE 0 END) AS cbits
        FROM g
    ),
    hv AS (
        SELECT doc_id, source, bk AS true_key, ck AS claimed_key, w, h, cw, ch,
               {_cia_band_exprs("b", "bits", "bandw", "n")},
               {_cia_band_exprs("cb", "cbits", "cbandw", "cn")}
        FROM bt
    )
    SELECT doc_id, source, true_key, claimed_key,
           CASE WHEN w <> cw OR h <> ch THEN 'dims' ELSE 'hash' END AS reason,
           CASE WHEN w <> cw OR h <> ch THEN -1
                ELSE CAST({ham} AS INT) END AS hamming
    FROM hv
    WHERE w <> cw OR h <> ch OR ({ham}) > {_PH_HAM_T}
    """


@query("caption_image_agreement", oracle=_cia_oracle())
def caption_image_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-text agreement gate, the curation step every multimodal corpus
    needs before training: per document, decode the REAL PNG through the
    codec and average-hash it (pixel side), stub-encode the text caption —
    parse the claimed pattern key and canvas out of the caption string and
    derive its expected fingerprint arithmetically (text side) — then flag
    pairs whose two embeddings disagree: canvas dims mismatch (`reason =
    'dims'`, a mislabeled caption) or Hamming distance above {_PH_HAM_T}
    (`reason = 'hash'`, the image diverged from its claimed pattern). Every
    {_CIA_WRONG}th doc's caption claims the neighbouring pattern key by
    construction, so true mismatches exist; perturbed images (every
    {_PH_PERT}rd doc) stress the hash tolerance. The oracle recomputes BOTH
    sides arithmetically without the codec, so any corruption in
    encode -> decode -> gray -> threshold -> band-pack, or in the caption
    parse, flips a flagged row and goes gate-red.

    Composes `media_phash_neardup`'s real decode with the text stubs
    (functions/hashing.py hash_unit pattern): same image corpus, same
    fingerprint, new cross-column check. Scale shape: one mapInPandas pass
    (image bytes and captions never leave their partition — only per-doc
    band integers and keys come out), then a per-row comparison; there is
    no join or shuffle at all, so the gate streams at scan speed over a
    100 TB image-text corpus."""
    import hashlib as _hl
    import re as _re
    from collections.abc import Iterator as _It

    import pandas as _pd

    from datapipeline_ops_spark.functions.png import decode_png_rgb, encode_png_rgb

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")

    def _bands(bits: list, n: int) -> list:
        bandw = (n + 3) // 4
        return [
            sum(b << j for j, b in enumerate(bits[k * bandw : min(n, (k + 1) * bandw)]))
            for k in range(_PH_BANDS)
        ]

    def _avg_hash(pix: str, n: int) -> list:
        gray = [
            (ord(pix[3 * i]) + ord(pix[3 * i + 1]) + ord(pix[3 * i + 2])) // 3
            for i in range(n)
        ]
        mean = sum(gray) // n
        return [1 if x >= mean else 0 for x in gray]

    def run(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        cap_re = _re.compile(r"pattern (\d+) canvas (\d+)x(\d+)")
        for pdf in batches:
            out = {"doc_id": [], "source": [], "true_key": [], "claimed_key": [],
                   "w": [], "h": [], "cw": [], "ch": []}
            for k in range(_PH_BANDS):
                out[f"b{k}"] = []
                out[f"cb{k}"] = []
            for doc_id, src in zip(pdf["doc_id"], pdf["source"]):
                doc_id = int(doc_id)
                bk = doc_id % _PH_KEYS
                w = 4 + bk % 8
                h = 3 + (bk // 8) % 6
                pix = (_hl.md5(str(bk).encode()).hexdigest() * _PNG_REP)[: w * h * 3]
                if doc_id % _PH_PERT == 0:
                    p = doc_id % (w * h)
                    pix = pix[: p * 3] + "zzz" + pix[p * 3 + 3 :]
                dw, dh, dpix = decode_png_rgb(encode_png_rgb(w, h, pix.encode()))
                n = dw * dh
                gray = [
                    (dpix[3 * i] + dpix[3 * i + 1] + dpix[3 * i + 2]) // 3
                    for i in range(n)
                ]
                mean = sum(gray) // n
                bits = [1 if x >= mean else 0 for x in gray]
                # the caption the corpus carries (every _CIA_WRONG'th is a
                # mislabel), then the text-encoder stub: parse it back and
                # derive the expected fingerprint from the CLAIM alone
                ck = (bk + 1) % _PH_KEYS if doc_id % _CIA_WRONG == 0 else bk
                kw, kh = 4 + ck % 8, 3 + (ck // 8) % 6
                caption = f"pattern {ck} canvas {kw}x{kh}"
                m = cap_re.fullmatch(caption)
                pk, pw, ph = int(m.group(1)), int(m.group(2)), int(m.group(3))
                cn = pw * ph
                cpix = (_hl.md5(str(pk).encode()).hexdigest() * _PNG_REP)[: cn * 3]
                cbits = _avg_hash(cpix, cn)
                out["doc_id"].append(doc_id)
                out["source"].append(str(src))
                out["true_key"].append(bk)
                out["claimed_key"].append(pk)
                out["w"].append(dw)
                out["h"].append(dh)
                out["cw"].append(pw)
                out["ch"].append(ph)
                for k, v in enumerate(_bands(bits, n)):
                    out[f"b{k}"].append(v)
                for k, v in enumerate(_bands(cbits, cn)):
                    out[f"cb{k}"].append(v)
            yield _pd.DataFrame(out)

    schema = (
        "doc_id long, source string, true_key int, claimed_key int, "
        "w int, h int, cw int, ch int, "
        + ", ".join(f"b{k} long" for k in range(_PH_BANDS))
        + ", "
        + ", ".join(f"cb{k} long" for k in range(_PH_BANDS))
    )
    hv = d.mapInPandas(run, schema=schema)
    ham = None
    for k in range(_PH_BANDS):
        term = F.bit_count(F.col(f"b{k}").bitwiseXOR(F.col(f"cb{k}")))
        ham = term if ham is None else ham + term
    dim_ok = (F.col("w") == F.col("cw")) & (F.col("h") == F.col("ch"))
    return (
        hv.withColumn("_ham", ham.cast("int"))
        .filter(~dim_ok | (F.col("_ham") > _PH_HAM_T))
        .select(
            "doc_id",
            "source",
            "true_key",
            "claimed_key",
            F.when(~dim_ok, "dims").otherwise("hash").alias("reason"),
            F.when(~dim_ok, F.lit(-1)).otherwise(F.col("_ham")).alias("hamming"),
        )
    )
