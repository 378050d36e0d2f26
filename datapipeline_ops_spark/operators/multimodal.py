"""Multimodal column plumbing: opaque ``binary`` media payloads with typed
metadata, decoded/transformed by Arrow-batched pandas UDFs.

The reference keeps media OUT of the dataset (datasets carry paths; workers
open files from shared storage — ``video_extract_frame.py:326-336``,
``for_high_bg_all_morelittler.py:144-146``) and decodes inside GPU workers.
The Spark-native design supports both layouts:

- **path manifest** (reference-style): dataset has only paths + metadata;
  payloads are opened inside ``mapInPandas`` per partition. Right for video
  at 100 TB — payloads never shuffle.
- **inline binary column**: payload travels as ``BinaryType`` next to its
  metadata struct. Right for small images/audio clips; Arrow moves bytes
  zero-copy into pandas UDFs, and parquet stores them column-wise so scans
  that don't touch the payload never read it (column pruning does the work).

Decoders are pluggable at the same seam where the reference injects GPU
models (``person_detect_op.py:26-33``). Three tiers exist here:
- a deterministic md5-derived stub (any payload; oracle-mirrored),
- a REAL stdlib path — PNG decode/resize and WAV probe via
  ``functions/png.py`` / ``functions/wav.py`` (no PIL needed; exercised
  and value-gated by media_png_roundtrip / media_png_resize /
  media_wav_probe),
- PIL/av for arbitrary formats when installed (the ``media`` extra);
  ``real_image_decode`` prefers PIL and falls back to the PNG codec.
So the plumbing AND a real decode chain are testable in this container,
and every derived value reproduces in the DuckDB oracle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# typed metadata carried next to every payload column
MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("resize_checksum", StringType()),
    ]
)

Decoder = Callable[[bytes], tuple[int, int, int]]


def stub_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: (width, height, n_frames) derived from the
    payload's md5 — stands in for PIL/decord until those libs exist here.
    Formulas are mirrored 1:1 in the DuckDB oracle SQL."""
    h = int(hashlib.md5(payload).hexdigest()[:15], 16)
    width = 320 + (h % 1600)
    height = 240 + ((h // 1600) % 840)
    n_frames = 1 + ((h // (1600 * 840)) % 300)
    return width, height, n_frames


def real_image_decode(payload: bytes) -> tuple[int, int, int]:
    """Real decoder: PIL when present (any format), else the pure-stdlib
    PNG codec (``functions/png.py``) for PNG payloads — so the REAL branch
    of the decode seam runs even in this PIL-less container. Non-PNG
    payloads without PIL raise ``NotImplementedError`` (route to the
    dead-letter side at scale, error-as-data)."""
    try:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload))  # pragma: no cover
        return img.width, img.height, 1  # pragma: no cover
    except ImportError:
        pass
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from datapipeline_ops_spark.functions.png import decode_png_rgb

        w, h, _ = decode_png_rgb(payload)
        return w, h, 1
    raise NotImplementedError(
        "non-PNG image decode requires PIL; install pillow or use stub_decode"
    )


def attach_payload(df: DataFrame, text_col: str = "text", media_type: str = "image") -> DataFrame:
    """Inline-binary layout: payload column (utf-8 bytes of ``text_col`` —
    the deterministic test stand-in for real image bytes) plus its typed
    metadata struct. Checksum/size are JVM-side expressions."""
    payload = F.col(text_col).cast("binary")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("checksum"),
        ),
    )


def decode_media(df: DataFrame, decoder: Decoder = stub_decode) -> DataFrame:
    """Arrow-batched decode: ``mapInPandas`` streams (doc_id, payload)
    batches through the pluggable decoder. Per-partition iterator form means
    a real decoder initializes once per python worker, not once per row —
    the same lazy-init pattern the reference uses for GPU models
    (``video_extract_frame.py:122-142``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decoder(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema=DECODED_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: binary-in/binary-out pandas batches. The stub
    'resized image' is md5(payload || ':WxH') hex bytes — deterministic,
    size-changing, and oracle-reproducible; a real implementation swaps in
    PIL.thumbnail inside the same batch loop."""
    tag = f":{width}x{height}".encode()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [hashlib.md5(bytes(p) + tag).hexdigest() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": [o.encode() for o in out],
                    "resize_checksum": out,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample_indices(n_frames: Column, step: int) -> Column:
    """Frame-sampling plan as a pure array expression: indices
    0, step, 2*step, ... < n_frames (``decord_reader_op.py:43-48``
    semantics — sample then batch-fetch)."""
    return F.sequence(F.lit(0), n_frames - 1, F.lit(step))
