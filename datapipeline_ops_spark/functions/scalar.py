"""Scalar function library: the reference's inline string/math helpers as
native Column expressions (SURVEY.md §2.2 'Scalar functions').

Everything here compiles to JVM expressions inside whole-stage codegen — no
Python UDFs. Each function documents its reference site.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def basename_no_ext(path: Column) -> Column:
    """``os.path.splitext(os.path.basename(p))[0]``
    (``generate_save_path_op.py:24-26``, ``save_pairs_op.py:21``)."""
    return F.regexp_extract(path, r"([^/]+?)(\.[^./]*)?$", 1)


def dirname(path: Column) -> Column:
    """``os.path.dirname`` (``scene_segmenter_op.py:114``)."""
    return F.regexp_extract(path, r"^(.*)/[^/]*$", 1)


def segment_out_path(out_dir: Column | str, name: Column, seg_idx: Column, start_s: Column, dur_s: Column) -> Column:
    """Path template ``{name}_seg{idx:03d}_{start}_{dur}.mp4``
    (``generate_save_path_op.py:29``, ``scene_segmenter_op.py:121-128``)."""
    d = F.lit(out_dir) if isinstance(out_dir, str) else out_dir
    return F.format_string(
        "%s/%s_seg%03d_%d_%d.mp4",
        d,
        name,
        seg_idx.cast("int"),
        start_s.cast("long"),
        dur_s.cast("long"),
    )


def parse_fraction(frac: Column) -> Column:
    """``"30000/1001"`` → 29.97… float fps (``video_probe_op.py:29-34``).
    Returns NULL (not an error) on malformed input — error-as-data."""
    # F.get + try_cast, not getItem/cast: Spark 4 runs ANSI mode by default,
    # where an out-of-bounds array index or malformed cast throws instead of
    # yielding NULL. Error-as-data requires the forgiving variants.
    parts = F.split(frac, "/")
    num = F.get(parts, 0).try_cast("double")
    den = F.get(parts, 1).try_cast("double")
    # den present & nonzero → divide; den absent ("30" plain rate) → num;
    # den zero or malformed → NULL (the reference's ZeroDivisionError path).
    return F.when(den.isNotNull() & (den != 0), num / den).when(den.isNull(), num)


def sec_to_label(seconds: Column) -> Column:
    """Integer seconds → ``"H-MM-SS"`` label (``scene_segmenter_op.py:76-78``:
    str(timedelta) with ':' replaced by '-'; hours unpadded)."""
    s = seconds.cast("long")
    return F.concat_ws(
        "-",
        (s / 3600).cast("long").cast("string"),
        F.lpad(((s % 3600) / 60).cast("long").cast("string"), 2, "0"),
        F.lpad((s % 60).cast("string"), 2, "0"),
    )


def iou(x1a: Column, y1a: Column, x2a: Column, y2a: Column,
        x1b: Column, y1b: Column, x2b: Column, y2b: Column) -> Column:
    """Intersection-over-union of two boxes (``video_extract_frame.py:112-120``)."""
    ix = F.greatest(F.lit(0.0), F.least(x2a, x2b) - F.greatest(x1a, x1b))
    iy = F.greatest(F.lit(0.0), F.least(y2a, y2b) - F.greatest(y1a, y1b))
    inter = ix * iy
    area_a = (x2a - x1a) * (y2a - y1a)
    area_b = (x2b - x1b) * (y2b - y1b)
    union = area_a + area_b - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def clipped_area_ratio(x1: Column, y1: Column, x2: Column, y2: Column,
                       w: Column, h: Column) -> Column:
    """Box area clipped to the image, as a fraction of image area
    (``for_high_bg_all_morelittler.py:160-169``: max person box must cover
    <= 0.4 of the image)."""
    cw = F.greatest(F.lit(0.0), F.least(x2, w) - F.greatest(x1, F.lit(0.0)))
    ch = F.greatest(F.lit(0.0), F.least(y2, h) - F.greatest(y1, F.lit(0.0)))
    return (cw * ch) / (w * h)
