"""Tests for multimodal plumbing (payload schema, decode batching, real-
decoder gating) and IO sinks (round-trip fidelity, partition uploader)."""

import hashlib

import pytest

from datapipeline_ops_spark.operators.multimodal import (
    attach_payload,
    decode_media,
    real_image_decode,
    resize_stub,
    stub_decode,
)
from datapipeline_ops_spark.sources.io import (
    read_jsonl,
    upload_partitioned,
    write_jsonl,
)


def test_payload_schema_and_checksum(spark):
    df = spark.createDataFrame([(1, "hello world")], ["doc_id", "text"])
    row = attach_payload(df).first()
    assert bytes(row.payload) == b"hello world"
    assert row.media_meta.n_bytes == 11
    assert row.media_meta.checksum == hashlib.md5(b"hello world").hexdigest()


def test_decode_media_batches(spark):
    df = attach_payload(spark.createDataFrame([(i, f"doc {i}") for i in range(10)], ["doc_id", "text"]))
    out = {r.doc_id: (r.width, r.height, r.n_frames) for r in decode_media(df).collect()}
    assert out[3] == stub_decode(b"doc 3")
    assert all(320 <= w < 1920 and 240 <= h < 1080 and 1 <= n <= 300 for w, h, n in out.values())


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(_pil_available(), reason="PIL present; gating not in effect")
def test_real_decoder_is_gated_without_pil():
    with pytest.raises(NotImplementedError):
        real_image_decode(b"\x89PNG...")


@pytest.mark.skipif(not _pil_available(), reason="PIL not installed")
def test_real_decoder_end_to_end_with_pil(spark):
    # exercises the REAL decode seam through the same mapInPandas plumbing
    # the stub uses, so the seam cannot rot: a 3x2 PNG decoded inside Spark
    # must report its true dimensions.
    import io

    from PIL import Image

    import pyspark.sql.functions as F

    buf = io.BytesIO()
    Image.new("RGB", (3, 2)).save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame([(1, bytearray(png))], ["doc_id", "payload"]).select(
        "doc_id", F.col("payload").cast("binary").alias("payload")
    )
    row = decode_media(df, decoder=real_image_decode).first()
    assert (row.width, row.height, row.n_frames) == (3, 2, 1)


def test_resize_stub_deterministic(spark):
    df = attach_payload(spark.createDataFrame([(1, "abc")], ["doc_id", "text"]))
    row = resize_stub(df, 64, 64).first()
    assert row.resize_checksum == hashlib.md5(b"abc:64x64").hexdigest()


def test_jsonl_roundtrip_preserves_nulls(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, None)], ["k", "v"])
    path = str(tmp_path / "out")
    write_jsonl(df, path)
    back = read_jsonl(spark, path, df.schema)
    assert {(r.k, r.v) for r in back.collect()} == {(1, "a"), (2, None)}


def test_upload_partitioned_calls_uploader_per_path(spark, tmp_path):
    df = spark.createDataFrame([(f"/data/f{i}.mp4",) for i in range(5)], ["out_path"])
    log_dir = tmp_path / "uploads"
    log_dir.mkdir()

    ldir = str(log_dir)

    def make_uploader():
        import os
        import uuid

        fh = open(os.path.join(ldir, f"{uuid.uuid4().hex}.log"), "a")

        def upload(path: str) -> bool:
            fh.write(path + "\n")
            fh.flush()
            return True

        return upload

    upload_partitioned(df, "out_path", make_uploader)
    uploaded = set()
    for f in log_dir.iterdir():
        uploaded |= set(f.read_text().split())
    assert uploaded == {f"/data/f{i}.mp4" for i in range(5)}


def test_s3a_profile_lands_in_hadoop_conf(spark):
    from datapipeline_ops_spark.sources.object_store import (
        apply_s3a_profile,
        s3a_path,
        s3a_profile,
    )

    prof = s3a_profile(
        endpoint="http://minio.internal:9000",
        access_key="ak",
        secret_key="sk",
        path_style_access=True,
    )
    # the scale-critical pieces are non-optional in every profile
    assert prof["fs.s3a.committer.name"] == "magic"
    assert prof["fs.s3a.experimental.input.fadvise"] == "random"
    apply_s3a_profile(spark, prof)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.endpoint") == "http://minio.internal:9000"
    assert hconf.get("fs.s3a.path.style.access") == "true"
    assert hconf.get("fs.s3a.committer.magic.enabled") == "true"
    assert s3a_path("bucket", "/a/b.parquet") == "s3a://bucket/a/b.parquet"
    assert s3a_path("bucket") == "s3a://bucket"
    # no-credentials profile defers to the default provider chain
    bare = s3a_profile()
    assert "fs.s3a.access.key" not in bare and "fs.s3a.endpoint" not in bare


def test_png_codec_roundtrip_and_filters():
    import hashlib
    import struct
    import zlib

    from datapipeline_ops_spark.functions.png import (
        _chunk,
        _SIG,
        decode_png_rgb,
        encode_png_rgb,
    )

    # roundtrip: arbitrary pixel bytes survive encode -> decode exactly
    w, h = 7, 5
    pix = bytes(range(w * h * 3 % 256)) * ((w * h * 3) // (w * h * 3 % 256) + 1)
    pix = hashlib.md5(b"seed").hexdigest().encode() * 10
    pix = pix[: w * h * 3]
    png = encode_png_rgb(w, h, pix)
    dw, dh, dpix = decode_png_rgb(png)
    assert (dw, dh, dpix) == (w, h, pix)

    # decoder handles every scanline filter type, not just its own output:
    # craft a 3x2 image whose rows use Sub(1), Up(2), Average(3), Paeth(4)
    w2, h2 = 3, 4
    want = bytes(((x * 37 + 11) % 256) for x in range(w2 * h2 * 3))
    stride = w2 * 3

    def filt(ftype, line, prev):
        out = bytearray()
        for i, x in enumerate(line):
            a = line[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if ftype == 1:
                out.append((x - a) & 0xFF)
            elif ftype == 2:
                out.append((x - b) & 0xFF)
            elif ftype == 3:
                out.append((x - ((a + b) >> 1)) & 0xFF)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out.append((x - pred) & 0xFF)
        return bytes(out)

    rows = [want[y * stride : (y + 1) * stride] for y in range(h2)]
    raw = b""
    prev = bytes(stride)
    for y, ftype in enumerate([1, 2, 3, 4]):
        raw += bytes([ftype]) + filt(ftype, rows[y], prev)
        prev = rows[y]
    ihdr = struct.pack(">IIBBBBB", w2, h2, 8, 2, 0, 0, 0)
    crafted = (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    dw2, dh2, got = decode_png_rgb(crafted)
    assert (dw2, dh2, got) == (w2, h2, want)

    # unsupported variants fail loudly (error-as-data at the caller)
    import pytest as _pytest

    bad_ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0)  # RGBA
    bad = _SIG + _chunk(b"IHDR", bad_ihdr) + _chunk(b"IEND", b"")
    with _pytest.raises(ValueError):
        decode_png_rgb(bad)


def test_real_image_decode_png_branch_runs_without_pil(spark):
    """The REAL branch of the decode seam executes in this container via
    the stdlib PNG codec — the stub is no longer the only testable path."""
    from datapipeline_ops_spark.functions.png import encode_png_rgb
    from datapipeline_ops_spark.operators.multimodal import (
        decode_media,
        real_image_decode,
    )

    png = encode_png_rgb(6, 4, bytes(6 * 4 * 3))
    assert real_image_decode(png) == (6, 4, 1)

    df = spark.createDataFrame([(1, bytearray(png))], "doc_id long, payload binary")
    out = decode_media(df, decoder=real_image_decode).collect()
    assert [(r.doc_id, r.width, r.height, r.n_frames) for r in out] == [(1, 6, 4, 1)]


def test_wav_codec_roundtrip_and_chunk_walk():
    import struct

    import pytest as _pytest

    from datapipeline_ops_spark.functions.wav import decode_wav_pcm16, encode_wav_pcm16

    samples = [0, 1, -1, 32767, -32768, 1234, -4321]
    wav = encode_wav_pcm16(16000, samples)
    rate, got = decode_wav_pcm16(wav)
    assert rate == 16000 and got == samples

    # parser walks past extra chunks (LIST/INFO) before data
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = wav[:12] + extra + wav[12:]
    patched = b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:]
    rate2, got2 = decode_wav_pcm16(patched)
    assert rate2 == 16000 and got2 == samples

    # stereo / non-PCM fail loudly
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    bad = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    )
    with _pytest.raises(ValueError):
        decode_wav_pcm16(bad)


def test_warc_stream_framing():
    import pytest as _pytest

    from datapipeline_ops_spark.functions.warc import (
        parse_warc_stream,
        write_warc_record,
    )

    # adversarial payload: contains a header-lookalike — Content-Length
    # framing must carry the parser straight over it
    evil = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nfake"
    stream = (
        write_warc_record("https://a/1", evil)
        + write_warc_record("https://a/2", b"")
        + write_warc_record("https://a/3", b"\r\n\r\n\r\n")
    )
    recs = parse_warc_stream(stream)
    assert [r["headers"]["WARC-Target-URI"] for r in recs] == [
        "https://a/1", "https://a/2", "https://a/3",
    ]
    assert recs[0]["payload"] == evil and recs[1]["payload"] == b""
    assert recs[2]["payload"] == b"\r\n\r\n\r\n"

    # truncated payload / missing separator fail loudly
    with _pytest.raises(ValueError):
        parse_warc_stream(stream[:-6])
    with _pytest.raises(ValueError):
        parse_warc_stream(b"NOTWARC\r\n\r\n")


def test_media_phash_neardup_semantics(spark, sf_dir):
    from datapipeline_ops_spark.queries.multimodal import (
        _PH_HAM_T,
        _PH_KEYS,
        _PH_PERT,
        media_phash_neardup,
    )

    rows = media_phash_neardup(spark, sf_dir).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0 <= r.hamming <= _PH_HAM_T
        assert (r.doc_a, r.doc_b) not in seen  # band join deduped
        seen.add((r.doc_a, r.doc_b))
    # two unperturbed docs sharing a base image are EXACT dups: hamming 0
    ham = {(r.doc_a, r.doc_b): r.hamming for r in rows}
    a, b = 1, 1 + _PH_KEYS  # same base key, neither divisible by _PH_PERT
    assert a % _PH_PERT != 0 and b % _PH_PERT != 0
    assert ham.get((a, b)) == 0
    # perturbed docs produce nonzero-distance near-misses somewhere
    assert any(h > 0 for h in ham.values())


def test_audio_fingerprint_neardup_semantics(spark, sf_dir):
    from datapipeline_ops_spark.queries.multimodal import (
        _AF_HAM_T,
        _AF_KEYS,
        _AF_PERT,
        audio_fingerprint_neardup,
    )

    rows = audio_fingerprint_neardup(spark, sf_dir).collect()
    assert rows
    ham = {}
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0 <= r.hamming <= _AF_HAM_T
        assert (r.doc_a, r.doc_b) not in ham
        ham[(r.doc_a, r.doc_b)] = r.hamming
    # unperturbed docs sharing a base signal are exact dups: hamming 0
    a, b = 1, 1 + _AF_KEYS * 3  # same base key; 1 % 3 != 0 and 88 % 3 != 0
    assert a % _AF_PERT != 0 and b % _AF_PERT != 0 and a % _AF_KEYS == b % _AF_KEYS
    assert ham.get((a, b)) == 0
    assert any(h > 0 for h in ham.values())
