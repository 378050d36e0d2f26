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


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


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
    out = bytearray(height * stride)
    prev = bytes(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(3, stride):
                line[i] = (line[i] + line[i - 3]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - 3] if i >= 3 else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - 3] if i >= 3 else 0
                c = prev[i - 3] if i >= 3 else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = bytes(line)
    return width, height, bytes(out)
