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
