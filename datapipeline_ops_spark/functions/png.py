"""Minimal pure-stdlib PNG codec (8-bit RGB, non-interlaced).

Why this exists: the reference decodes real media inside its workers
(``common/video/decord_reader_op.py:17-24``), but this container ships no
image libraries — so the decode seam was a deterministic stub. PNG needs
nothing beyond ``zlib`` + ``struct``, both stdlib, which makes a REAL
encode → decode path possible here: `media_png_roundtrip` builds genuine
PNG bytes, decodes them through this module inside the Arrow batch UDF,
and the DuckDB oracle verifies the recovered dimensions and the md5 of
every recovered pixel — the decoder is value-gated end to end.

Scope (deliberately small): color type 2 (RGB), bit depth 8, no
interlace. The decoder implements all five scanline filters (None / Sub /
Up / Average / Paeth) so it reads PNGs from standard encoders, not just
its own output. Anything else raises ``ValueError`` — at scale you route
unsupported payloads to the dead-letter side (error-as-data), never crash
the executor.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png_rgb(width: int, height: int, pixels: bytes) -> bytes:
    """Encode raw RGB bytes (row-major, 3 bytes/pixel) as a valid PNG.

    Uses filter type 0 on every scanline — simplicity over compression;
    the point is a *correct* container, and zlib still deflates it."""
    if len(pixels) != width * height * 3:
        raise ValueError(f"need {width * height * 3} bytes, got {len(pixels)}")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * width * 3 : (y + 1) * width * 3] for y in range(height)
    )
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor over int16 channel vectors (one pixel at a time)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png_rgb(payload: bytes) -> tuple[int, int, bytes]:
    """Decode an 8-bit RGB non-interlaced PNG to (width, height, pixels).

    Handles all five scanline filter types; raises ``ValueError`` on any
    other color type / bit depth / interlacing or a corrupt stream."""
    if payload[: len(_SIG)] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = len(_SIG)
    width = height = -1
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    f"unsupported PNG variant: depth={depth} color={color} "
                    f"interlace={interlace}"
                )
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width < 0:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * 3
    if len(raw) != height * (stride + 1):
        raise ValueError("scanline data size mismatch")
    # Numpy defilter (the decode hot loop at media scale): filter bytes and
    # scanlines in one reshaped view; Up is a whole-row uint8 wrap-add, Sub
    # is a per-channel cumulative sum mod 256, and Average/Paeth — whose
    # left-neighbor dependency forces a walk along x — run per-pixel with
    # the 3 channels vectorized in int16.
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    ftypes = arr[:, 0]
    if ftypes.max(initial=0) > 4:
        raise ValueError(f"bad filter type {int(ftypes.max())}")
    data = arr[:, 1:]
    if not ftypes.any():  # all filter-0 rows (our own encoder): zero work
        return width, height, data.tobytes()
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = int(ftypes[y])
        line = data[y]
        if ftype == 0:
            cur = line.copy()
        elif ftype == 1:  # Sub: out[i] = line[i] + out[i-3] == channel cumsum
            cur = (
                line.reshape(width, 3).astype(np.int64).cumsum(axis=0) % 256
            ).astype(np.uint8).reshape(stride)
        elif ftype == 2:  # Up: uint8 addition wraps mod 256
            cur = line + prev
        elif ftype == 3:  # Average
            px = line.reshape(width, 3).astype(np.int16)
            pv = prev.reshape(width, 3).astype(np.int16)
            row = np.empty((width, 3), dtype=np.int16)
            left = np.zeros(3, dtype=np.int16)
            for x in range(width):
                left = (px[x] + ((left + pv[x]) >> 1)) & 0xFF
                row[x] = left
            cur = row.astype(np.uint8).reshape(stride)
        else:  # Paeth
            px = line.reshape(width, 3).astype(np.int16)
            pv = prev.reshape(width, 3).astype(np.int16)
            row = np.empty((width, 3), dtype=np.int16)
            left = np.zeros(3, dtype=np.int16)
            ul = np.zeros(3, dtype=np.int16)
            for x in range(width):
                left = (px[x] + _paeth_vec(left, pv[x], ul)) & 0xFF
                ul = pv[x]
                row[x] = left
            cur = row.astype(np.uint8).reshape(stride)
        out[y] = cur
        prev = cur
    return width, height, out.tobytes()
